"""Quantify the exact-clone champion UDF skip (VERDICT-r4 item 8).

score_pairs skips the Arrow transfer + Python similarity kernels for
exact-strategy pairs (byte-identical norm_text -> all features are 1.0
by construction; operators/scoring.py).  On a boilerplate-heavy web
corpus exact pairs dominate the candidate set, so the skip is claimed
load-bearing.  This script turns the claim into a number: the same
normalize -> block -> score job on the same materialized corpus, with
cfg.exact_skip_features True vs False, interleaved best-of-N in one
JVM (same plan shape either way -- only the UDF input gating differs).

Usage: python scripts/bench_champion_skip.py [n_rows] [rounds]
Prints one JSON line; paste into BASELINE.md's ledger.
"""

from __future__ import annotations

import dataclasses
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from entity_resolution_engine_spark.config import DEFAULT_CONFIG  # noqa: E402
from entity_resolution_engine_spark.operators.blocking import (  # noqa: E402
    candidate_pairs,
)
from entity_resolution_engine_spark.operators.normalize_stage import (  # noqa: E402
    normalize_pages,
)
from entity_resolution_engine_spark.operators.scoring import score_pairs  # noqa: E402
from entity_resolution_engine_spark.session import get_spark  # noqa: E402
from entity_resolution_engine_spark.sources.synth import (  # noqa: E402
    generate_web_pages,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 150000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    spark = get_spark(app_name="champion_skip", master="local[32]",
                      shuffle_partitions=32)
    results = []
    for label, clone_heavy in (("synth_default", False), ("clone_heavy", True)):
        results.append(run_corpus(spark, label, clone_heavy))
    for r in results:
        print(json.dumps(r))
    spark.stop()


def run_corpus(spark, label: str, clone_heavy: bool) -> dict:
    """clone_heavy=True doubles the corpus with byte-exact copies under
    new urls — the boilerplate-mirror composition (common-crawl-style
    corpora run 30-50% exact duplicates) where the skip is claimed
    load-bearing.  The default synth corpus has only ~3% exact pairs,
    so both compositions go in the ledger."""
    corpus_dir = tempfile.mkdtemp(prefix="er_champ_corpus_")
    pages = generate_web_pages(spark, N_ROWS)[0]
    if clone_heavy:
        clones = pages.withColumn(
            "url", F.concat(F.col("url"), F.lit("?mirror=1"))
        )
        pages = pages.unionByName(clones)
    pages.write.mode("overwrite").parquet(corpus_dir)

    cfg_on = DEFAULT_CONFIG.scoring
    cfg_off = dataclasses.replace(cfg_on, exact_skip_features=False)

    def run(cfg):
        t0 = time.monotonic()
        pages = spark.read.parquet(corpus_dir)
        normalized = normalize_pages(pages).persist()
        normalized.count()
        pairs, _stats = candidate_pairs(normalized, DEFAULT_CONFIG.blocking)
        scored = score_pairs(pairs, normalized, cfg).persist()
        n_pairs = scored.count()
        n_exact = scored.filter(F.col("strategy") == "exact").count()
        wall = time.monotonic() - t0
        normalized.unpersist()
        scored.unpersist()
        spark.catalog.clearCache()
        return wall, n_pairs, n_exact

    run(cfg_on)  # JVM/JIT/Python-worker warmup, discarded
    best = {"on": None, "off": None}
    for _ in range(ROUNDS):
        for name, cfg in (("on", cfg_on), ("off", cfg_off)):
            wall, n_pairs, n_exact = run(cfg)
            if best[name] is None or wall < best[name][0]:
                best[name] = (wall, n_pairs, n_exact)

    shutil.rmtree(corpus_dir, ignore_errors=True)
    (t_on, n_pairs, n_exact), (t_off, _, _) = best["on"], best["off"]
    return {
        "metric": "exact_champion_skip_speedup",
        "corpus": label,
        "value": round(t_off / t_on, 3),
        "unit": "x_block_score_wall",
        "n_rows": N_ROWS,
        "pairs_scored": n_pairs,
        "exact_pairs": n_exact,
        "exact_share": round(n_exact / max(n_pairs, 1), 3),
        "skip_on_sec": round(t_on, 2),
        "skip_off_sec": round(t_off, 2),
        "rounds": ROUNDS,
    }


if __name__ == "__main__":
    main()
