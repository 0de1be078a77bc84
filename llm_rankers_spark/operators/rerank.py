"""LLM-rerank loops as Spark jobs — the reference's second stage.

The reference runs one Python loop per query, calling an LLM comparator at
each step (llmrankers/setwise.py, pairwise.py, listwise.py). The sequential
dependency is per-query, so the scalable axis is ACROSS queries (the
reference itself only parallelizes by sharding queries across jobs,
Rank-R1/run_setwise.py:90-92). We therefore run each query's whole sort
loop inside one ``applyInPandas`` group (SURVEY.md §3 E2 chosen design):
10^6 queries → 10^6 independent groups, Arrow-batched, no driver round
trips. The comparator sees whole batches of prompts at once (analogue of
the reference's DataLoader batching, pairwise.py:176-204).

Loop semantics are preserved operation-for-operation (same compare sets,
same swaps, same early stops) from:

- Setwise heapsort: (num_child+1)-ary heapify — setwise.py:200-232;
  bubblesort with the ``last_start`` skip — setwise.py:243-273.
- Pairwise: allpair win-counting — pairwise.py:169-219 (consistency rule
  206-216); binary heapsort via two-order compare — pairwise.py:133-162,
  221-237; bubblesort with the ``last_end`` skip — pairwise.py:253-275.
- Listwise sliding window + permutation repair — listwise.py:113-144,
  178-196.
- Final assembly (top-k get score=-rank, untouched tail appended in
  original first-stage order) — setwise.py:300-313, pairwise.py:279-290.

This file contains fresh implementations written from the studied
semantics; no reference code is copied.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RERANK_SCHEMA = "qid string, docid string, rank int, score double"


# ---------------------------------------------------------------------------
# Comparators. A comparator answers "which of these passages is most
# relevant to the query" — the reference's pluggable LLM payload
# (setwise.py:79, pairwise.py:84). The engine treats it as a black box; the
# mock is deterministic + seedable so loop tests have a ground truth.
# ---------------------------------------------------------------------------


def _crc_relevance(query: str, text: str) -> int:
    """Deterministic pseudo-relevance; stable across processes/partitions."""
    return zlib.crc32(f"{query}\x1f{text}".encode())


@dataclass
class MockComparator:
    """Selects argmax of a hidden deterministic relevance (FIXTURES.md §6).

    ``calls``/``prompt_items`` mirror the reference's per-query cost
    counters (run.py:198-201; setwise.py:80).
    """

    relevance: object = None  # callable (query, text) -> number
    calls: int = 0
    prompt_items: int = 0
    trace: list = field(default_factory=list)

    def _rel(self, query: str, text: str):
        fn = self.relevance or _crc_relevance
        return fn(query, text)

    def best_of(self, query: str, texts: list[str]) -> int:
        """Setwise payload: index of the most relevant passage."""
        self.calls += 1
        self.prompt_items += len(texts)
        scores = [self._rel(query, t) for t in texts]
        win = max(range(len(texts)), key=lambda i: (scores[i], -i))
        self.trace.append(("best_of", len(texts), win))
        return win

    def pair(self, query: str, a: str, b: str) -> tuple[bool, bool]:
        """Pairwise payload: (a_wins_order1, a_wins_order2) for the two
        prompt orders of pairwise.py:84-90 (the reference's
        output1=="Passage A" and output2=="Passage B" both mean doc1 wins —
        here both booleans refer to ``a``). The mock is order-consistent;
        real LLMs often aren't, which is why the reference demands agreement.
        """
        self.calls += 1
        self.prompt_items += 2
        first = self._rel(query, a) >= self._rel(query, b)
        self.trace.append(("pair", first))
        return first, first

    def permutation(self, query: str, texts: list[str]) -> str:
        """Listwise payload: a RankGPT-style '[2] > [1] > ...' string."""
        self.calls += 1
        self.prompt_items += len(texts)
        order = sorted(range(len(texts)), key=lambda i: (-self._rel(query, texts[i]), i))
        return " > ".join(f"[{i + 1}]" for i in order)


import re as _re


@dataclass
class VotingComparator:
    """A2 (setwise.py:102-157): wrap a base comparator with
    ``num_permutation`` shuffled-prompt votes and a majority decision.

    The reference shuffles with a global seeded RNG and breaks ties with
    ``random.choice``; we derive a per-call RNG from (seed, call index) so
    results are partition-order independent, and break ties
    (count desc, first-seen asc) — documented intentional divergence
    (SURVEY.md §2.4 A2)."""

    base: object
    num_permutation: int = 3
    seed: int = 929
    calls: int = 0

    @property
    def trace(self):
        return self.base.trace

    def best_of(self, query: str, texts: list[str]) -> int:
        import random as _random

        self.calls += 1
        votes: list[int] = []
        for p in range(self.num_permutation):
            rng = _random.Random((self.seed, self.calls, p).__hash__())
            order = list(range(len(texts)))
            rng.shuffle(order)
            win_shuffled = self.base.best_of(query, [texts[i] for i in order])
            votes.append(order[win_shuffled])
        counts: dict[int, int] = {}
        first_seen: dict[int, int] = {}
        for i, v in enumerate(votes):
            counts[v] = counts.get(v, 0) + 1
            first_seen.setdefault(v, i)
        return max(counts, key=lambda c: (counts[c], -first_seen[c]))

    def pair(self, query: str, a: str, b: str):
        return self.base.pair(query, a, b)

    def permutation(self, query: str, texts: list[str]) -> str:
        return self.base.permutation(query, texts)


@dataclass
class RetryingComparator:
    """M3 (setwise.py:338-399): retry-on-error wrapper. The reference loops
    forever with sleep(5); ours is bounded (max_retries) and surfaces the
    retry count in metrics — an infinite retry inside an executor task would
    turn one bad record into a hung stage at cluster scale."""

    base: object
    max_retries: int = 3
    retries: int = 0

    def _with_retry(self, fn, *args):
        last = None
        for _ in range(self.max_retries + 1):
            try:
                return fn(*args)
            except Exception as e:  # noqa: BLE001 — comparator payloads are opaque
                last = e
                self.retries += 1
        raise last

    def best_of(self, query, texts):
        return self._with_retry(self.base.best_of, query, texts)

    def pair(self, query, a, b):
        return self._with_retry(self.base.pair, query, a, b)

    def permutation(self, query, texts):
        return self._with_retry(self.base.permutation, query, texts)


_REASONING_ANSWER_RE = _re.compile(r"<answer>.*?\[(\d+)\].*?</answer>", _re.DOTALL)


def parse_reasoning_answer(response: str, n_docs: int) -> int | None:
    """P10 (setwise.py:513-516, Rank-R1): extract the ``<answer>[i]</answer>``
    label from a reasoning trace; 1-based in the prompt → 0-based index;
    out-of-range / missing → None (caller treats as no-swap)."""
    m = _REASONING_ANSWER_RE.search(response or "")
    if not m:
        return None
    v = int(m.group(1)) - 1
    return v if 0 <= v < n_docs else None


# ---------------------------------------------------------------------------
# Pure loop implementations (run per query inside the grouped UDF).
# Items are (docid, text) tuples; loops permute a list in place.
# ---------------------------------------------------------------------------


def _setwise_heapify(arr: list, n: int, i: int, num_child: int, query: str, cmp) -> None:
    # semantics of setwise.py:200-217
    if num_child * i + 1 < n:
        inds = [i] + list(range(num_child * i + 1, min(num_child * (i + 1) + 1, n)))
        w = cmp.best_of(query, [arr[j][1] for j in inds])
        largest = inds[w] if 0 <= w < len(inds) else i
        if largest != i:
            arr[i], arr[largest] = arr[largest], arr[i]
            _setwise_heapify(arr, n, largest, num_child, query, cmp)


def setwise_heapsort(items: list, query: str, cmp, num_child: int, k: int) -> list:
    # semantics of setwise.py:219-232 + the reversed() at 240-242
    arr = list(items)
    n = len(arr)
    ranked = 0
    for i in range(n // num_child, -1, -1):
        _setwise_heapify(arr, n, i, num_child, query, cmp)
    for i in range(n - 1, 0, -1):
        arr[i], arr[0] = arr[0], arr[i]
        ranked += 1
        if ranked == k:
            break
        _setwise_heapify(arr, i, 0, num_child, query, cmp)
    return list(reversed(arr))


def setwise_bubblesort(items: list, query: str, cmp, num_child: int, k: int) -> list:
    # semantics of setwise.py:243-273 (window of num_child+1 sliding
    # bottom→top by num_child, with the last_start skip optimization)
    arr = list(items)
    last_start = len(arr) - (num_child + 1)
    for i in range(k):
        start = last_start
        end = last_start + (num_child + 1)
        changed = False
        while True:
            if start < i:
                start = i
            # the reference issues the LLM call even for ≤1-item windows and
            # relies on the invalid-label fallback (best_ind=0 → no swap,
            # setwise.py:250-253); we skip the degenerate call — same
            # ranking, marginally lower compare counter (documented divergence)
            w = cmp.best_of(query, [t for _, t in arr[start:end]]) if end - start > 1 else 0
            if not (0 <= w < max(end - start, 1)):
                w = 0
            if w != 0:
                arr[start], arr[start + w] = arr[start + w], arr[start]
                if not changed:
                    changed = True
                    if last_start != len(arr) - (num_child + 1) and w == len(arr[start:end]) - 1:
                        last_start += len(arr[start:end]) - 1
            if start == i:
                break
            if not changed:
                last_start -= num_child
            start -= num_child
            end -= num_child
    return arr


def pairwise_allpair(items: list, query: str, cmp, k: int) -> list:
    # semantics of pairwise.py:169-219: every unordered pair asked in both
    # prompt orders; +1 to the winner only when consistent, else +0.5 each;
    # final sort score desc with stable (original-order) ties.
    scores: dict[str, float] = {}
    pos = {docid: i for i, (docid, _) in enumerate(items)}
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            d1, t1 = items[i]
            d2, t2 = items[j]
            o1, o2 = cmp.pair(query, t1, t2)
            if o1 and o2:  # both orders agree doc1 wins (pairwise.py:206-211)
                scores[d1] = scores.get(d1, 0.0) + 1.0
            elif (not o1) and (not o2):
                scores[d2] = scores.get(d2, 0.0) + 1.0
            else:
                scores[d1] = scores.get(d1, 0.0) + 0.5
                scores[d2] = scores.get(d2, 0.0) + 0.5
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], pos[kv[0]]))
    text = dict(items)
    return [(d, text[d]) for d, _ in ranked]


def _pair_gt(query: str, a, b, cmp) -> bool:
    # pairwise.py:221-237: a > b iff both prompt orders agree a wins
    o1, o2 = cmp.pair(query, a[1], b[1])
    return o1 and o2


def pairwise_heapsort(items: list, query: str, cmp, k: int) -> list:
    # semantics of pairwise.py:133-162 (binary max-heap, k pops)
    arr = list(items)

    def heapify(n: int, i: int) -> None:
        largest = i
        l, r = 2 * i + 1, 2 * i + 2
        if l < n and _pair_gt(query, arr[l], arr[largest], cmp):
            largest = l
        if r < n and _pair_gt(query, arr[r], arr[largest], cmp):
            largest = r
        if largest != i:
            arr[i], arr[largest] = arr[largest], arr[i]
            heapify(n, largest)

    n = len(arr)
    ranked = 0
    for i in range(n // 2, -1, -1):
        heapify(n, i)
    for i in range(n - 1, 0, -1):
        arr[i], arr[0] = arr[0], arr[i]
        ranked += 1
        if ranked == k:
            break
        heapify(i, 0)
    return list(reversed(arr))


def pairwise_bubblesort(items: list, query: str, cmp, k: int) -> list:
    # semantics of pairwise.py:253-275 (bottom-up adjacent swaps with the
    # last_end never-swapped-tail skip)
    arr = list(items)
    k = min(k, len(arr))
    last_end = len(arr) - 1
    for i in range(k):
        cur = last_end
        changed = False
        while True:
            if cur <= i:
                break
            if _pair_gt(query, arr[cur], arr[cur - 1], cmp):
                arr[cur - 1], arr[cur] = arr[cur], arr[cur - 1]
                if not changed:
                    changed = True
                    if last_end != len(arr) - 1:
                        last_end += 1
            if not changed:
                last_end -= 1
            cur -= 1
    return arr


def clean_permutation(response: str) -> list[int]:
    """Digit-only cleaning + dedup-keep-first (listwise.py:113-129),
    returning 0-based indices."""
    cleaned = "".join(c if c.isdigit() else " " for c in response).strip()
    out: list[int] = []
    for tok in cleaned.split():
        v = int(tok) - 1
        if v not in out:
            out.append(v)
    return out


def receive_permutation(items: list, response: str, start: int, end: int) -> list:
    """Apply a (possibly malformed) permutation to items[start:end]
    (listwise.py:131-144): drop out-of-range, append missing in original
    order."""
    window = items[start:end]
    perm = [p for p in clean_permutation(response) if 0 <= p < len(window)]
    perm += [i for i in range(len(window)) if i not in perm]
    out = list(items)
    for j, p in enumerate(perm):
        out[start + j] = window[p]
    return out


def build_rank_prompt(query: str, texts: list[str]) -> str:
    """RankGPT-style 'complete' prompt (listwise.py:90-110): preamble, one
    ``[i] passage`` line per doc, ranking instruction. Only used to MEASURE
    prompt size for the budget-shrink loop; generation payloads build their
    own (the comparator is a black box)."""
    n = len(texts)
    head = (
        f"The following are {n} passages, each indicated by number identifier []. "
        f"Rank them based on their relevance to query: {query}\n\n"
    )
    body = "".join(f"[{i + 1}] {t}\n" for i, t in enumerate(texts))
    tail = (
        f"Rank the {n} passages above based on their relevance to the search query. "
        "The output format should be [] > [], e.g., [2] > [1]."
    )
    return head + body + tail


def shrink_window_words(
    query: str,
    texts: list[str],
    token_budget: int,
    start_words: int = 300,
    reserve: int = 200,
    counter=None,
) -> tuple[list[str], int]:
    """Listwise prompt-budget shrink (listwise.py:63-88): clamp every
    passage to ``max_words`` words, measure the assembled prompt, decrement
    the cap by 1 and rebuild until it fits ``token_budget - reserve``.
    The reference counts with tiktoken; ours defaults to the engine's simple
    tokenizer (documented deviation — the control loop is what's preserved).
    Returns (clamped_texts, final_word_cap)."""
    from llm_rankers_spark.functions.tokenize import tokenize

    counter = counter or (lambda s: len(tokenize(s, "simple")))
    max_words = start_words
    while True:
        clamped = [" ".join((t or "").split()[:max_words]) for t in texts]
        if counter(build_rank_prompt(query, clamped)) <= token_budget - reserve or max_words <= 1:
            return clamped, max_words
        max_words -= 1


def listwise_slide(
    items: list,
    query: str,
    cmp,
    window_size: int,
    step_size: int,
    num_repeat: int,
    token_budget: int | None = None,
    start_words: int = 300,
) -> list:
    # semantics of listwise.py:178-196: window [start, end) moves end→start
    # by step, repeated num_repeat times; with a token_budget each window's
    # passages pass through the budget-shrink loop first (listwise.py:63-88)
    arr = list(items)
    for _ in range(num_repeat):
        end = len(arr)
        start = end - window_size
        while start >= 0:
            start = max(start, 0)
            texts = [t for _, t in arr[start:end]]
            if token_budget is not None:
                texts, _ = shrink_window_words(query, texts, token_budget, start_words)
            resp = cmp.permutation(query, texts)
            arr = receive_permutation(arr, resp, start, end)
            end -= step_size
            start -= step_size
    return arr


def assemble(original: list, reordered: list, k: int) -> list[tuple[str, float]]:
    """Final ranking assembly (setwise.py:300-313, pairwise.py:279-290):
    top-k of the reordered list get score=-rank; every other doc follows in
    ORIGINAL first-stage order with continuing negative scores."""
    results: list[tuple[str, float]] = []
    top: set[str] = set()
    rank = 1
    for docid, _ in reordered[:k]:
        top.add(docid)
        results.append((docid, float(-rank)))
        rank += 1
    for docid, _ in original:
        if docid not in top:
            results.append((docid, float(-rank)))
            rank += 1
    return results


_METHODS = {
    "setwise.heapsort": lambda it, q, c, p: setwise_heapsort(it, q, c, p["num_child"], p["k"]),
    "setwise.bubblesort": lambda it, q, c, p: setwise_bubblesort(it, q, c, p["num_child"], p["k"]),
    "pairwise.allpair": lambda it, q, c, p: pairwise_allpair(it, q, c, p["k"]),
    "pairwise.heapsort": lambda it, q, c, p: pairwise_heapsort(it, q, c, p["k"]),
    "pairwise.bubblesort": lambda it, q, c, p: pairwise_bubblesort(it, q, c, p["k"]),
    "listwise.sliding": lambda it, q, c, p: listwise_slide(
        it, q, c, p["window_size"], p["step_size"], p["num_repeat"],
        p.get("token_budget"), p.get("start_words", 300),
    ),
}


def rerank_local(method: str, items: list, query: str, cmp, **params) -> list[tuple[str, float]]:
    """Run one query's rerank loop locally (used by tests and by the UDF)."""
    params.setdefault("k", 10)
    params.setdefault("num_child", 3)
    params.setdefault("window_size", 4)
    params.setdefault("step_size", 2)
    params.setdefault("num_repeat", 1)
    params.setdefault("token_budget", None)
    params.setdefault("start_words", 300)
    reordered = _METHODS[method](items, query, cmp, params)
    if method == "listwise.sliding":
        # listwise assigns score=-i to the whole list (listwise.py:194-195)
        return [(d, float(-i)) for i, (d, _) in enumerate(reordered)]
    return assemble(items, reordered, params["k"])


def rerank(
    candidates: DataFrame,
    method: str = "setwise.heapsort",
    comparator: object = None,
    k: int = 10,
    num_child: int = 3,
    window_size: int = 4,
    step_size: int = 2,
    num_repeat: int = 1,
    hits: int | None = None,
    token_budget: int | None = None,
    start_words: int = 300,
) -> DataFrame:
    """Rerank first-stage candidates.

    ``candidates``: (qid, query, docid, rank, text). Each qid group runs its
    full sort loop in one Arrow-batched task; the comparator is shipped in
    the closure (must be picklable — MockComparator is; a real-model
    comparator would hold lazy per-executor model state).
    """
    comparator = comparator or MockComparator()
    params = dict(
        k=k, num_child=num_child, window_size=window_size, step_size=step_size,
        num_repeat=num_repeat, token_budget=token_budget, start_words=start_words,
    )

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        if hits is not None:
            pdf = pdf.head(hits)  # per-query cap, run.py:163-164
        items = list(zip(pdf["docid"], pdf["text"]))
        query = pdf["query"].iloc[0]
        ranked = rerank_local(method, items, query, comparator, **params)
        return pd.DataFrame(
            {
                "qid": pdf["qid"].iloc[0],
                "docid": [d for d, _ in ranked],
                "rank": range(1, len(ranked) + 1),
                "score": [s for _, s in ranked],
            }
        )

    return candidates.groupBy("qid").applyInPandas(lambda _, pdf: run_group(pdf), schema=RERANK_SCHEMA)


def shuffle_candidates(candidates: DataFrame, how: str, seed: int = 929) -> DataFrame:
    """Pre-rerank candidate permutation (run.py:185-191): 'random' (seeded —
    we use a per-qid deterministic hash order so the result is partition-
    independent, documented divergence from random.shuffle) or 'inverse'."""
    from pyspark.sql import Window

    if how == "inverse":
        w = Window.partitionBy("qid").orderBy(F.desc("rank"))
    elif how == "random":
        w = Window.partitionBy("qid").orderBy(F.xxhash64("qid", "docid", F.lit(seed)))
    else:
        raise ValueError(f"invalid shuffle method: {how}")
    return candidates.withColumn("rank", F.row_number().over(w))
