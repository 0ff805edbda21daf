"""Endurance run (VERDICT-r4 item 7): the full ER pipeline over a
3-4 M-page corpus at local[32], single level.

Purpose is spill-survival evidence, not scaling (that is
bench_scaling.py's job): prove the 0.8-headroom bucket splits, the
footer-based observe path, and CC checkpointing hold when shuffle
state stops fitting comfortably, and record throughput plus the
shuffle/spill footprint.

Metrics come from two sources:
- Spark's status REST API (UI enabled just for this run): per-stage
  shuffle read/write bytes and memory/disk spill totals.
- a sampler thread watching the tmpfs shuffle dir
  (SPARK_GRAFT_LOCAL_DIR): peak on-disk shuffle footprint.

Usage: python scripts/bench_endurance.py [n_rows]
Prints one JSON line; paste into BASELINE.md's ledger.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time
import urllib.request

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_engine_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_resolution_engine_spark.operators.blocking import (  # noqa: E402
    candidate_pairs,
)
from entity_resolution_engine_spark.operators.cluster import (  # noqa: E402
    connected_components,
)
from entity_resolution_engine_spark.operators.normalize_stage import (  # noqa: E402
    normalize_pages,
)
from entity_resolution_engine_spark.operators.router import route_pairs  # noqa: E402
from entity_resolution_engine_spark.operators.scoring import score_pairs  # noqa: E402
from entity_resolution_engine_spark.session import get_spark  # noqa: E402
from entity_resolution_engine_spark.sources.synth import (  # noqa: E402
    generate_web_pages,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_500_000


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


class PeakSampler(threading.Thread):
    def __init__(self, path: str, interval: float = 2.0):
        super().__init__(daemon=True)
        self.path, self.interval = path, interval
        self.peak = 0
        self._stop = threading.Event()

    def run(self) -> None:
        while not self._stop.is_set():
            if os.path.isdir(self.path):
                self.peak = max(self.peak, _dir_bytes(self.path))
            self._stop.wait(self.interval)

    def stop(self) -> None:
        self._stop.set()


def _rest_stage_metrics() -> dict:
    """Sum shuffle/spill bytes over all completed stages via the
    status REST API (best-effort — zeros if the UI is unreachable)."""
    out = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
           "memory_spilled_bytes": 0, "disk_spilled_bytes": 0,
           "max_stage_shuffle_write": 0}
    try:
        apps = json.load(urllib.request.urlopen(
            "http://localhost:4040/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app_id}/stages",
            timeout=30))
        for s in stages:
            out["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
            out["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
            out["memory_spilled_bytes"] += s.get("memoryBytesSpilled", 0)
            out["disk_spilled_bytes"] += s.get("diskBytesSpilled", 0)
            out["max_stage_shuffle_write"] = max(
                out["max_stage_shuffle_write"], s.get("shuffleWriteBytes", 0))
    except Exception as e:  # pragma: no cover - diagnostics only
        out["rest_error"] = str(e)
    return out


def main() -> None:
    spark = get_spark(app_name="endurance", master="local[32]",
                      shuffle_partitions=64,
                      extra_conf={"spark.ui.enabled": "true"})
    corpus_dir = tempfile.mkdtemp(prefix="er_endurance_corpus_")
    t_gen = time.monotonic()
    generate_web_pages(spark, N_ROWS)[0].write.mode("overwrite").parquet(
        corpus_dir)
    t_gen = time.monotonic() - t_gen

    sampler = PeakSampler(os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
    sampler.start()
    t0 = time.monotonic()
    pages = spark.read.parquet(corpus_dir)
    normalized = normalize_pages(pages).persist()
    n_pages = normalized.count()
    t_norm = time.monotonic() - t0
    pairs, _stats = candidate_pairs(normalized, DEFAULT_CONFIG.blocking)
    scored = score_pairs(pairs, normalized, DEFAULT_CONFIG.scoring).persist()
    n_pairs = scored.count()
    t_scored = time.monotonic() - t0
    routed = route_pairs(scored, DEFAULT_CONFIG.scoring, "endurance")
    edges = routed.filter(F.col("routed_status") == "approved").select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
    assignments = connected_components(edges, all_nodes=normalized.select("url"))
    n_clusters = assignments.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0
    sampler.stop()
    metrics = _rest_stage_metrics()

    shutil.rmtree(corpus_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "endurance_pipeline",
        "value": round(wall, 2),
        "unit": "sec",
        "n_rows_arg": N_ROWS,
        "pages": n_pages,
        "pairs_scored": n_pairs,
        "clusters": n_clusters,
        "gen_sec": round(t_gen, 2),
        "normalize_sec": round(t_norm, 2),
        "block_score_sec": round(t_scored - t_norm, 2),
        "cluster_sec": round(wall - t_scored, 2),
        "pages_per_sec": round(n_pages / wall, 1),
        "pairs_scored_per_sec": round(n_pairs / t_scored, 1),
        "peak_local_dir_bytes": sampler.peak,
        **metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
