"""User sessionization over the events stream table.

Web-scale pipelines sessionize clickstream/event data constantly; the
reference's event tables stop at fixed-window rollups (SURVEY.md §2.5
W3 analog — the same gap every warehouse closes with gaps-and-islands
SQL).  Spark has a NATIVE operator for it: ``F.session_window(ts,
gap)`` — a first-class group key that merges events closer than
``gap`` into one growing window.  Using it (instead of the lag/
cumsum island emulation) matters twice at scale:

- **Batch**: one hash shuffle on (user_id) and the session merge runs
  inside the aggregation — no window-function total sort per user, no
  two-pass island numbering (the lag+cumsum form costs TWO window
  sorts over the full event set before the final groupBy).
- **Streaming**: the SAME expression is incrementally maintained by
  the state store with watermark-based eviction
  (``stream_session_windows`` in streaming/incremental.py) — the
  batch and streaming definitions of "session" cannot drift.

Semantics (pinned by the DuckDB gaps-and-islands oracle, which IS the
two-window-sort formulation, and by tests/test_sessions.py boundary
cases): an event starts a new session iff it is STRICTLY more than
``gap`` after the previous event of the same user — an event landing
exactly at the previous session's end still merges; session_end =
last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events, total_value) —
    one row per (user, session), sessions split at inactivity
    STRICTLY > gap (an event exactly at the previous session's end
    still merges — the boundary the oracle and tests pin)."""
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key session rollup — the flagship-surface metrics consumer
    of ``session_windows`` (reference analog: the per-run activity
    rollups of ues_schema.sql:76-95): (user_id, n_sessions, n_events,
    avg_session_secs, max_session_events).

    Composes as ONE logical plan: the session_window groupBy already
    hash-partitions by user_id, so this second per-key aggregation
    reuses that partitioning — Catalyst plans no extra Exchange (the
    rollup is effectively free on top of sessionization; verified in
    PLANS.md).  On the crawl corpus, key it by domain over warc_ts to
    get per-domain crawl-activity sessions at bench scale."""
    sw = session_windows(
        events, gap=gap, user_col=key_col, ts_col=ts_col, value_col=value_col
    )
    # durations in exact integer MICROSECONDS, averaged by integer
    # floor division: microsecond timestamps averaged as doubles land
    # on exact .5 rounding ties (Spark HALF_UP vs DuckDB HALF_EVEN
    # diverge — observed live at round(x, 6) on this very query), and
    # micros at 1e15 exceed double's 53-bit mantissa anyway.  The
    # ntz→timestamp cast is an identity under the UTC session tz.
    dur_us = F.unix_micros(
        F.col("session_end").cast("timestamp")
    ) - F.unix_micros(F.col("session_start").cast("timestamp"))
    return (
        sw.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum(dur_us).alias("total_us"),
            F.max("n_events").alias("max_session_events"),
        )
        .select(
            "user_id",
            "n_sessions",
            "n_events",
            F.expr("total_us div n_sessions").alias("avg_session_micros"),
            "max_session_events",
        )
    )
