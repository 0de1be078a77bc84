"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

Everything here is pure built-in column expressions (whole-stage codegen,
no UDF at all) so the plans survive 100× scale-up unchanged and every
operator has an exact ANSI-SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker sets for the heuristic language ID; real
# pipelines would plug a fastText-style model in as a pandas_udf — the
# operator shape (select + when-chain / udf swap) is identical.
_LANG_MARKERS: dict[str, list[str]] = {
    "es": ["el", "la", "los", "las", "que", "de", "y", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "du", "dans", "pour"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that", "it", "for"],
}

_STOPWORDS = _LANG_MARKERS["en"]


def word_count(col: str | Column = "content") -> Column:
    """Whitespace token count (size of split on whitespace runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def bpe_ish_token_count(col: str | Column = "content") -> Column:
    """BPE-ish proxy: count of letter-runs, digit-runs and single
    punctuation marks — the standard cheap stand-in for tokenizer counts."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"\s+", "")
    runs = F.size(F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda x: x != F.lit("")))
    punct = F.length(stripped) - F.length(F.regexp_replace(stripped, r"[^a-zA-Z0-9]", ""))
    return runs + punct


def quality_features(docs: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: length, word count, avg word length,
    punctuation ratio, stopword ratio, and a composite quality score in
    [0,1] (monotone in 'looks like real prose')."""
    c = F.col(content_col)
    words = F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda x: x != F.lit(""))
    n_words = F.size(words)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", ""))
    stop_hits = F.size(F.array_intersect(words, F.array(*[F.lit(s) for s in _STOPWORDS])))
    out = docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (n_alpha / F.greatest(n_words, F.lit(1))).alias("avg_word_len"),
        (stop_hits / F.greatest(n_words, F.lit(1))).alias("stopword_ratio"),
    )
    score = (
        F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.4
        + F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0)) * 0.3
    )
    return out.withColumn("quality_score", score)


def language_id(docs: DataFrame, content_col: str = "content", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: charset detection for CJK/Cyrillic/Greek, else
    argmax of per-language marker-word hit counts (ties → 'en' < marker
    order). Pure expressions; deterministic."""
    c = F.col(content_col)
    words = F.filter(F.split(F.lower(c), r"[^\p{L}0-9]+"), lambda x: x != F.lit(""))
    hits = {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in ms])))
        for lang, ms in _LANG_MARKERS.items()
    }
    best = F.greatest(*hits.values())
    marker_lang = F.when(best <= 0, F.lit("unknown"))
    for lang in ["en", "es", "de", "fr"]:  # fixed precedence for ties
        marker_lang = marker_lang.when(hits[lang] == best, F.lit(lang))
    marker_lang = marker_lang.otherwise(F.lit("unknown"))
    # charset classes first
    lang_col = (
        F.when(c.rlike(r"[一-鿿]"), F.lit("zh"))
        .when(c.rlike(r"[぀-ヿ]"), F.lit("ja"))
        .when(c.rlike(r"[가-힯]"), F.lit("ko"))
        .when(c.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
        .when(c.rlike(r"[Ͱ-Ͽ]"), F.lit("el"))
        .otherwise(marker_lang)
    )
    return docs.select(F.col(id_col).alias("id"), lang_col.alias("lang_pred"))


def fingerprint(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    mode: str = "simple",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Order-sensitive 64-bit document fingerprint: xor-fold of
    position-mixed token hashes (a rolling-hash analogue).

    hash_fn='xxhash64' is the fast JVM path; hash_fn='md5' derives the
    token hash from the md5 hex digest, which every ANSI engine computes
    identically — that variant is the one with a DuckDB oracle twin."""
    from llm_rankers_spark.functions.tokenize import tokens_col

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens_col(content_col, mode=mode)).alias("pos", "tok"),
    )
    # token hash reduced to 31 bits so hash*(pos+1) cannot overflow a long
    # under ANSI arithmetic (positions are bounded by document length)
    if hash_fn == "md5":
        th = F.pmod(F.conv(F.substring(F.md5("tok"), 1, 7), 16, 10).cast("long"), F.lit((1 << 31) - 1))
    else:
        th = F.pmod(F.xxhash64("tok"), F.lit((1 << 31) - 1))
    mixed = toks.withColumn("h", th * (F.col("pos") + F.lit(1).cast("long")))
    return mixed.groupBy("id").agg(F.expr("bit_xor(h)").alias("fingerprint"))
