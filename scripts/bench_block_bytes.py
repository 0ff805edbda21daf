"""Shuffle-byte accounting for the block+score stage (VERDICT r4 item
2: the stage is memory-bandwidth-bound — 2.1-2.3x speedup for 4x
threads with <0.5% serial share in every round-4 window — so the one
code lever left is FEWER BYTES MOVED).

Runs normalize → candidate_pairs → score_pairs on a synthetic corpus
and reports total shuffle write/read and input bytes from Spark's
status-store REST API (local mode serves it on the driver), plus
bytes/page — the before/after number for the uid-surrogate diet.

Usage: python scripts/bench_block_bytes.py [n_rows] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 250000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from entity_resolution_engine_spark.config import DEFAULT_CONFIG
    from entity_resolution_engine_spark.operators.blocking import candidate_pairs
    from entity_resolution_engine_spark.operators.normalize_stage import (
        normalize_pages,
    )
    from entity_resolution_engine_spark.operators.scoring import score_pairs
    from entity_resolution_engine_spark.session import get_spark
    from entity_resolution_engine_spark.sources.synth import generate_web_pages

    spark = get_spark(
        app_name="block_bytes",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
        # the status-store REST API is the measurement instrument here
        extra_conf={"spark.ui.enabled": "true"},
    )
    corpus_dir = tempfile.mkdtemp(prefix="er_bytes_corpus_")
    generate_web_pages(spark, N_ROWS)[0].write.mode("overwrite").parquet(corpus_dir)

    ui = spark.sparkContext.uiWebUrl

    def stage_totals() -> dict[str, int]:
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
            stages = json.load(r)
        tot = {"shuffle_write": 0, "shuffle_read": 0, "input": 0, "stages": 0}
        for s in stages:
            if s.get("status") not in ("COMPLETE", "ACTIVE"):
                continue
            tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
            tot["input"] += s.get("inputBytes", 0)
            tot["stages"] += 1
        return tot

    before = stage_totals()
    t0 = time.monotonic()
    pages = spark.read.parquet(corpus_dir)
    normalized = normalize_pages(pages).persist()
    n_pages = normalized.count()
    caches: list = []
    pairs, _stats = candidate_pairs(normalized, DEFAULT_CONFIG.blocking, caches=caches)
    scored = score_pairs(pairs, normalized, DEFAULT_CONFIG.scoring).persist()
    n_pairs = scored.count()
    wall = time.monotonic() - t0
    after = stage_totals()

    delta = {k: after[k] - before[k] for k in ("shuffle_write", "shuffle_read", "input")}
    out = {
        "metric": "block_score_shuffle_bytes",
        "n_rows": N_ROWS,
        "cpus": CPUS,
        "pages": n_pages,
        "pairs_scored": n_pairs,
        "wall_sec": round(wall, 2),
        "shuffle_write_bytes": delta["shuffle_write"],
        "shuffle_read_bytes": delta["shuffle_read"],
        "input_bytes": delta["input"],
        "shuffle_write_per_page": round(delta["shuffle_write"] / max(n_pages, 1), 1),
        "stages_run": after["stages"] - before["stages"],
    }
    print(json.dumps(out))
    scored.unpersist()
    normalized.unpersist()
    for c in caches:
        c.unpersist()
    shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
