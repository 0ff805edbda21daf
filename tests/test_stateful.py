"""applyInPandasWithState custom stateful operator: per-domain
crawl-rate EWMA monitor (streaming/stateful.py)."""

from __future__ import annotations

import os
import shutil


def test_domain_rate_monitor_ewma_and_spike(spark, tmp_path):
    """Three ordered triggers (one parquet file each): domain 'a' runs
    4, 4, then 20 events — the third trigger must flag a spike against
    the learned EWMA of 4 and then absorb it (0.3*20 + 0.7*4 = 8.8);
    domain 'b' holds steady at 2 and never alarms."""
    from entity_resolution_engine_spark.streaming.stateful import (
        domain_rate_monitor,
    )

    src = tmp_path / "rate_src"
    src.mkdir()
    batches = [
        [("a",)] * 4 + [("b",)] * 2,
        [("a",)] * 4 + [("b",)] * 2,
        [("a",)] * 20 + [("b",)] * 2,
    ]
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage_{i}")
        spark.createDataFrame(rows, ["domain"]).coalesce(1).write.parquet(stage)
        [part] = [f for f in os.listdir(stage) if f.endswith(".parquet")]
        dst = str(src / f"batch_{i}.parquet")
        shutil.copy(os.path.join(stage, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema("domain string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    q = (
        domain_rate_monitor(stream)
        .writeStream.format("memory")
        .queryName("rate_monitor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.table("rate_monitor").collect()

    a = sorted([r for r in rows if r.domain == "a"], key=lambda r: r.n_batches)
    b = sorted([r for r in rows if r.domain == "b"], key=lambda r: r.n_batches)
    assert [r.batch_events for r in a] == [4, 4, 20]
    assert [r.is_spike for r in a] == [False, False, True]
    assert a[0].ewma_before is None and a[0].ewma == 4.0
    assert a[1].ewma_before == 4.0 and a[1].ewma == 4.0
    assert a[2].ewma_before == 4.0 and abs(a[2].ewma - 8.8) < 1e-9
    assert [r.batch_events for r in b] == [2, 2, 2]
    assert not any(r.is_spike for r in b)
    assert all(r.ewma == 2.0 for r in b)
