"""Sessionization: native session_window batch semantics + the
identical streaming expression."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from entity_resolution_engine_spark.operators.sessions import (
    session_stats,
    session_windows,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _m(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _events(spark):
    rows = [
        # user 1: two events 10 min apart, then an event at EXACTLY the
        # 30-min gap after the second — Spark MERGES the boundary event
        # (measured: a new session starts only when inactivity is
        # STRICTLY greater than the gap), so all three are one session
        (1, _m(0), 1.0),
        (1, _m(10), 2.0),
        (1, _m(40), 4.0),
        # user 2: single event (singleton session)
        (2, _m(5), 8.0),
        # user 3: second event just past the gap — two sessions
        (3, _m(0), 16.0),
        (3, _m(30.5), 32.0),
    ]
    return spark.createDataFrame(rows, ["user_id", "ts", "value"])


def test_session_windows_batch_semantics(spark):
    got = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in session_windows(_events(spark), gap="30 minutes").collect()
    }
    assert (1, _m(0), 3, 7.0) in got  # exact-gap event MERGED
    assert (2, _m(5), 1, 8.0) in got
    assert (3, _m(0), 1, 16.0) in got  # strictly-past-gap event split
    assert (3, _m(30.5), 1, 32.0) in got
    assert len(got) == 4
    # session_end = last event + gap
    ends = {
        (r.user_id, r.session_start): r.session_end
        for r in session_windows(_events(spark), gap="30 minutes").collect()
    }
    assert ends[(1, _m(0))] == _m(70)
    assert ends[(3, _m(30.5))] == _m(60.5)


def test_session_windows_property_random_vs_python(spark):
    """100 seeded random event sets vs a Python reference sessionizer
    (strictly-greater-than-gap split, end = last + gap) — batched into
    one Spark job via per-seed user namespaces."""
    import random

    GAP_MIN = 30
    rows = []
    expected: dict[tuple[int, dt.datetime], tuple[dt.datetime, int, float]] = {}
    for seed in range(100):
        rng = random.Random(seed)
        user = seed
        n = rng.randint(1, 40)
        # minute offsets with gap-boundary values over-represented
        offs = sorted(
            rng.choice([rng.uniform(0, 600), rng.randint(0, 20) * GAP_MIN])
            for _ in range(n)
        )
        evs = [(_m(o), float(i)) for i, o in enumerate(offs)]
        rows += [(user, ts, v) for ts, v in evs]
        # python reference: split when delta > gap
        sess: list[list[tuple[dt.datetime, float]]] = [[evs[0]]]
        for ts, v in evs[1:]:
            if (ts - sess[-1][-1][0]).total_seconds() > GAP_MIN * 60:
                sess.append([])
            sess[-1].append((ts, v))
        for s in sess:
            start = s[0][0]
            expected[(user, start)] = (
                s[-1][0] + dt.timedelta(minutes=GAP_MIN),
                len(s),
                sum(v for _, v in s),
            )
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.total_value)
        for r in session_windows(df, gap=f"{GAP_MIN} minutes").collect()
    }
    assert got == expected


def test_session_stats_rollup(spark):
    """Per-key rollup over session_windows: durations include the +gap
    tail on session_end, averages are exact integer-microsecond floor
    division (no float rounding in the contract path)."""
    got = {
        r.user_id: (
            r.n_sessions,
            r.n_events,
            r.avg_session_micros,
            r.max_session_events,
        )
        for r in session_stats(_events(spark), gap="30 minutes").collect()
    }
    MIN_US = 60_000_000
    assert got == {
        # user 1: one session spanning 0..70 min (40-min span + 30 gap)
        1: (1, 3, 70 * MIN_US, 3),
        # user 2: singleton session, duration == gap
        2: (1, 1, 30 * MIN_US, 1),
        # user 3: two singleton sessions, each duration == gap
        3: (2, 2, 30 * MIN_US, 1),
    }


def test_session_stats_avg_floor_division(spark):
    """Two sessions of 30 and 31 minutes -> avg floors to 30.5 min
    exactly in integer micros (would be a rounding-tie trap as float
    seconds)."""
    rows = [
        (7, _m(0), 1.0),  # session A: 0..30 (singleton)
        (7, _m(100), 1.0),  # session B: 100..131 (1-min span + gap)
        (7, _m(101), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    [r] = session_stats(df, gap="30 minutes").collect()
    assert r.n_sessions == 2
    assert r.avg_session_micros == (30 * 60 + 31 * 60) * 1_000_000 // 2


def test_session_stats_custom_key_and_value(spark):
    """The crawl-corpus keying path: domain key, warc_ts timestamps,
    byte-length values."""
    rows = [
        ("a.com", _m(0), 100),
        ("a.com", _m(5), 200),
        ("b.com", _m(0), 50),
    ]
    df = spark.createDataFrame(rows, ["domain", "warc_ts", "bytes"])
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in session_stats(
            df, gap="30 minutes", key_col="domain", ts_col="warc_ts",
            value_col="bytes",
        ).collect()
    }
    assert got == {"a.com": (1, 2), "b.com": (1, 1)}


def test_stream_session_windows_matches_batch(spark, tmp_path):
    """The streaming operator (same expression + watermark) must emit
    the same closed sessions the batch form computes."""
    from entity_resolution_engine_spark.streaming.incremental import (
        stream_session_windows,
    )

    src = str(tmp_path / "events_src")
    # a far-future sentinel event pushes the watermark past every real
    # session's end so append mode flushes them all
    sentinel = [(99, _m(24 * 60), 0.0)]
    df = _events(spark).unionByName(
        spark.createDataFrame(sentinel, ["user_id", "ts", "value"])
    )
    df.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(src)
    )
    q = (
        stream_session_windows(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in spark.sql("select * from sess_test").collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events, r.total_value)
        for r in session_windows(_events(spark), gap="30 minutes").collect()
    }
    assert want <= got  # sentinel session itself may or may not flush
    assert all(u == 99 for (u, *_rest) in (got - want))


def test_stream_sessions_late_and_duplicate_events(spark, tmp_path):
    """Watermark property test (50 seeds, one streaming run) pinning
    Spark 4.1's MEASURED late-data semantics for session windows:

    - TWO watermarks are in play (measured live — the first version of
      this test assumed one and failed both ways): late-row FILTERING
      uses the watermark as of the previous batch, state EVICTION uses
      the current batch's.  Corollary: a late row arriving in the very
      batch that first advances the watermark is NOT filtered (filter
      watermark still 0) — it emits as an immediately-evicted fragment
      session; a late row arriving any batch later IS dropped at the
      input when its potential session (ts + gap) ends before the
      filter watermark;
    - eviction is lazy (runs only when a batch executes) and
      merge-happens-before-evict within a batch;
    - once a session is evicted and emitted it is IMMUTABLE — a later
      event can never reopen or rewrite it;
    - out-of-order events inside the watermark merge normally, and
      duplicates redelivered in the same batch merge and count twice,
      exactly as in batch.

    Batches arrive as four parquet files processed oldest-first
    (maxFilesPerTrigger=1): (1) per-seed early events [0, 300] min plus
    a global clock event at 600 min that advances the watermark to
    600 - 120 = 480 min; (2) a lone tick event at 601 min — this batch
    runs with eviction watermark 480, so every era-1 per-seed session
    (ends <= 330) is evicted and emitted BEFORE any late data arrives;
    (3) late events, arriving with filter watermark 480: per seed,
    some in [481, 599] min (inside the watermark — accepted, some
    duplicated) and some in [0, 440] min (session end <= 470 < 480 —
    dropped at the input); (4) a far-future sentinel whose finalize
    batch flushes every open session.  Margins keep every event away
    from the ambiguous [450, 481) boundary band, so the expected set
    is exactly: batch sessionization of era 1, union batch
    sessionization of the ACCEPTED late band."""
    import os
    import random
    import shutil

    from entity_resolution_engine_spark.streaming.incremental import (
        stream_session_windows,
    )

    GAP_MIN, SEEDS = 30, 50
    CLOCK_USER, TICK_USER, SENTINEL_USER = 9999, 9997, 9998
    src = tmp_path / "late_src"
    src.mkdir()

    batch1, batch2_keep, batch2_drop = [], [], []
    for seed in range(SEEDS):
        rng = random.Random(1000 + seed)
        user = seed
        batch1 += [
            (user, _m(rng.uniform(0, 300)), 1.0)
            for _ in range(rng.randint(1, 8))
        ]
        late = [
            (user, _m(rng.uniform(481, 599)), 1.0)
            for _ in range(rng.randint(1, 5))
        ]
        # duplicates: re-deliver a random subset of the accepted lates
        late += [late[i] for i in range(len(late)) if rng.random() < 0.4]
        batch2_keep += late
        batch2_drop += [
            (user, _m(rng.uniform(0, 440)), 1.0)
            for _ in range(rng.randint(0, 3))
        ]
    batch1.append((CLOCK_USER, _m(600), 0.0))
    tick = [(TICK_USER, _m(601), 0.0)]
    sentinel = [(SENTINEL_USER, _m(10_000), 0.0)]

    cols = ["user_id", "ts", "value"]
    files = [batch1, tick, batch2_keep + batch2_drop, sentinel]
    for i, rows in enumerate(files):
        stage = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(stage)
        [part] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = str(src / f"batch_{i}.parquet")
        shutil.copy(os.path.join(stage, part), dst)
        # oldest-first processing order is keyed on modification time
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream_session_windows(stream, gap=f"{GAP_MIN} minutes",
                               watermark="120 minutes")
        .writeStream.format("memory")
        .queryName("late_sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.total_value)
        for r in spark.sql("select * from late_sess_test").collect()
        if r.user_id < SEEDS
    }
    want = set()
    for rows in (batch1, batch2_keep):  # drop band absent by design
        era = spark.createDataFrame(rows, cols).filter(
            F.col("user_id") < SEEDS
        )
        want |= {
            (r.user_id, r.session_start, r.session_end, r.n_events,
             r.total_value)
            for r in session_windows(
                era, gap=f"{GAP_MIN} minutes"
            ).collect()
        }
    assert got == want
    # immutability corollary: era-1 sessions appear verbatim despite
    # dropped late events having landed inside some of their time
    # ranges — nothing was reopened or rewritten
    b1 = spark.createDataFrame(batch1, cols).filter(F.col("user_id") < SEEDS)
    b1_sessions = {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         r.total_value)
        for r in session_windows(b1, gap=f"{GAP_MIN} minutes").collect()
    }
    assert b1_sessions <= got
