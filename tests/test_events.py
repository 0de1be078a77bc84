"""Event analytics: tumbling windows + gap sessionization (the batch twins
of the streaming shapes; entry oracles cover the full events table, these
pin the semantics on hand-built sequences)."""

from datetime import datetime, timezone

from llm_rankers_spark.operators.events import sessionize, windowed_counts


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_windowed_counts_epoch_aligned(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 1, 0), 1, "click", 1.0),
        (2, datetime(2024, 1, 1, 0, 4, 59), 1, "click", 2.0),
        (3, datetime(2024, 1, 1, 0, 5, 0), 2, "view", 4.0),   # next bucket
        (4, datetime(2024, 1, 1, 0, 9, 59, 999999), 1, "view", 8.0),
    ]
    got = {(r["bucket"], r["event_type"]): (r["n"], r["total_value"])
           for r in windowed_counts(_ev(spark, rows), "5 minutes").collect()}
    # UTC explicitly: Spark's session tz is UTC, the machine's may not be
    b0 = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())
    assert got[(b0, "click")] == (2, 3.0)
    assert got[(b0 + 300, "view")] == (2, 12.0)


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "c", 1.0),
        (2, datetime(2024, 1, 1, 0, 29, 59), 1, "c", 2.0),   # 29:59 gap — same session
        (3, datetime(2024, 1, 1, 1, 0, 0), 1, "c", 4.0),     # 30:01 gap — new session
        (4, datetime(2024, 1, 1, 1, 30, 0), 1, "c", 8.0),    # exactly 30:00 — same (gap > is strict)
        (5, datetime(2024, 1, 1, 0, 10, 0), 2, "c", 16.0),   # other user independent
    ]
    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["total_value"])
           for r in sessionize(_ev(spark, rows), gap_minutes=30).collect()}
    assert got[(1, 1)] == (2, 3.0)
    assert got[(1, 2)] == (2, 12.0)
    assert got[(2, 1)] == (1, 16.0)


def test_sessionize_microsecond_boundary(spark):
    # 30:00.000001 gap must split; unix_timestamp truncation would miss it
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0, 500000), 1, "c", 1.0),
        (2, datetime(2024, 1, 1, 0, 30, 0, 500001), 1, "c", 2.0),
    ]
    out = sessionize(_ev(spark, rows), gap_minutes=30).collect()
    assert len(out) == 2
