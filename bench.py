"""Headline benchmark — the driver runs this per round.

Runs the engine's headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "pairs_scored_per_sec": ...}

The flagship entry is the full ER resolve (normalize → MinHash-LSH
blocking → Arrow-batched scoring → routing → large-star/small-star CC)
over a deterministic synthetic web_pages corpus sized to the SF, which
also yields the BASELINE.json throughput metric
(candidate-pairs-scored/sec).  Scaling evidence (N vs 4N cores) comes
from scripts/bench_scaling.py and is recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

if os.path.isdir("/dev/shm"):
    # sandbox: /tmp is a throttled virtio disk; shuffle spills must not
    # serialize on it (session.py reads this env var — opt-in there)
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic web_pages rows for the ER throughput section (~4x the sf0.1
# documents table; clusters of 1-5 with planted mutators)
SYNTH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "20000"))
# best-of-N per query: this sandbox's hypervisor swings 2-3x between
# regimes minutes apart (BASELINE.md round 2-4 ledgers), and a
# single-shot artifact inherited a degraded window three rounds
# running.  The per-query minimum over N reps is the
# regime-independent number; `spread` in the output makes the variance
# visible instead of silently baked into the total.
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _materialize(df) -> int:
    return df.count()


def main() -> None:
    from entity_resolution_engine_spark.config import DEFAULT_CONFIG
    from entity_resolution_engine_spark.operators.blocking import candidate_pairs
    from entity_resolution_engine_spark.operators.cluster import connected_components
    from entity_resolution_engine_spark.operators.normalize_stage import (
        normalize_pages,
    )
    from entity_resolution_engine_spark.operators.router import route_pairs
    from entity_resolution_engine_spark.operators.scoring import score_pairs
    from entity_resolution_engine_spark.session import get_spark
    from entity_resolution_engine_spark.sources.synth import generate_web_pages

    import __spark_entry__ as E

    spark = get_spark(app_name="er_bench", master=f"local[{CPUS}]")
    timings: dict[str, float] = {}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # -- headline driver-contract queries over the SF tables ---------------
    qs = E.queries()
    headline = [
        "revenue_by_nation",
        "argmax_best_match",
        "zscore_anomaly",
        "windowed_event_counts",
        "doc_profile",
        "minhash_near_dup",
        "ngram_jaccard",
        "ngram_jaccard_fast",
        "ann_bruteforce",
        "ann_ivf_probe",
        "ngram_decontaminate",
        "er_resolve_documents",
    ]
    spreads: dict[str, float] = {}
    for name in headline:
        reps = []
        for _ in range(REPS):
            t0 = time.monotonic()
            _materialize(qs[name](spark, SF_DIR))
            reps.append(time.monotonic() - t0)
            # drop persisted intermediates so queries are timed in
            # isolation (no cross-query cache reuse or memory pressure)
            spark.catalog.clearCache()
        timings[name] = round(min(reps), 3)
        spreads[name] = round(max(reps) - min(reps), 3)

    # -- ER pipeline throughput on the synthetic web corpus ----------------
    # corpus materialized to parquet first: the engine under test reads a
    # table (as in production); generator cost is not the engine's
    import shutil
    import tempfile

    corpus_dir = tempfile.mkdtemp(prefix="er_bench_corpus_")
    generate_web_pages(spark, SYNTH_ROWS)[0].write.mode("overwrite").parquet(
        corpus_dir
    )
    pipe_reps = []
    best = None
    for _ in range(REPS):
        t0 = time.monotonic()
        pages = spark.read.parquet(corpus_dir)
        normalized = normalize_pages(pages).persist()
        n_pages = normalized.count()
        pairs, _stats = candidate_pairs(normalized, DEFAULT_CONFIG.blocking)
        scored = score_pairs(pairs, normalized, DEFAULT_CONFIG.scoring).persist()
        n_pairs = scored.count()
        t_scored = time.monotonic() - t0
        routed = route_pairs(scored, DEFAULT_CONFIG.scoring, "bench")
        edges = routed.filter(F.col("routed_status") == "approved").select(
            F.col("url_a").alias("src"), F.col("url_b").alias("dst")
        )
        assignments = connected_components(edges, all_nodes=normalized.select("url"))
        n_clusters = assignments.select("cluster_id").distinct().count()
        t_full = time.monotonic() - t0
        pipe_reps.append(t_full)
        if best is None or t_full < best[0]:
            best = (t_full, t_scored, n_pages, n_pairs, n_clusters)
        normalized.unpersist()
        scored.unpersist()
        spark.catalog.clearCache()
    t_full, t_scored, n_pages, n_pairs, n_clusters = best
    timings["er_pipeline_synth"] = round(t_full, 3)
    spreads["er_pipeline_synth"] = round(max(pipe_reps) - min(pipe_reps), 3)

    # -- per-domain crawl sessionization at bench scale --------------------
    # native session_window + same-partitioning rollup over the synth
    # corpus (domain key, warc_ts) — the flagship metrics surface for
    # sessions, exercised beyond the 9.5k-row contract table
    from entity_resolution_engine_spark.functions.normalize import domain_col
    from entity_resolution_engine_spark.operators.sessions import session_stats

    sess_reps = []
    for _ in range(REPS):
        t0 = time.monotonic()
        crawl = spark.read.parquet(corpus_dir).select(
            domain_col(F.col("url")).alias("domain"),
            "warc_ts",
            F.length("text").alias("bytes"),
        )
        session_stats(
            crawl, gap="1 hour", key_col="domain", ts_col="warc_ts",
            value_col="bytes",
        ).count()
        sess_reps.append(time.monotonic() - t0)
        spark.catalog.clearCache()
    timings["domain_sessions_synth"] = round(min(sess_reps), 3)
    spreads["domain_sessions_synth"] = round(max(sess_reps) - min(sess_reps), 3)
    shutil.rmtree(corpus_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": REPS,
        "spread": spreads,
        "sf": sf,
        "synth_pages": n_pages,
        "pairs_scored": n_pairs,
        "pairs_scored_per_sec": round(n_pairs / t_scored, 1) if t_scored else None,
        "pages_resolved_per_sec": round(n_pages / t_full, 1) if t_full else None,
        "clusters": n_clusters,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
