"""Connected-components micro-bench: the Amdahl ledger for the
scaling analysis (BASELINE.md).

Isolates the clustering stage: the approved edge set is produced ONCE
(normalize → block → score → route at local[32]) and materialized to
parquet; then each parallelism level runs ONLY
``connected_components`` on it in a fresh JVM, interleaved N rounds,
reporting wall, the per-sync iteration ledger (stats_out), and the
shuffle-byte economics of integer surrogates vs url strings.

Usage: python scripts/bench_cc.py [n_rows] — one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000000
LEVELS = (8, 32)
ROUNDS = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))

_GEN = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from entity_resolution_engine_spark.session import get_spark
from entity_resolution_engine_spark.config import DEFAULT_CONFIG
from entity_resolution_engine_spark.operators.blocking import candidate_pairs
from entity_resolution_engine_spark.operators.normalize_stage import normalize_pages
from entity_resolution_engine_spark.operators.router import route_pairs
from entity_resolution_engine_spark.operators.scoring import score_pairs
from entity_resolution_engine_spark.sources.synth import generate_web_pages

out_dir, n_rows = sys.argv[1], int(sys.argv[2])
spark = get_spark(app_name="cc_gen", master="local[32]", shuffle_partitions=32)
pages, _ = generate_web_pages(spark, n_rows)
normalized = normalize_pages(pages).persist()
normalized.count()
caches = []
pairs, _stats = candidate_pairs(normalized, DEFAULT_CONFIG.blocking, caches=caches)
scored = score_pairs(pairs, normalized, DEFAULT_CONFIG.scoring)
routed = route_pairs(scored, DEFAULT_CONFIG.scoring, "ccbench")
edges = routed.filter(F.col("routed_status") == "approved").select(
    F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
edges.write.mode("overwrite").parquet(out_dir + "/edges")
normalized.select("url").write.mode("overwrite").parquet(out_dir + "/nodes")
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from entity_resolution_engine_spark.session import get_spark
from entity_resolution_engine_spark.operators.cluster import connected_components

import os as _os
cpus, d = int(sys.argv[1]), sys.argv[2]
# micro-lever knob (VERDICT r3 item 2): batch more star rounds per
# convergence signature to trade no-op rounds for fewer sync points
RPC = int(_os.environ.get("SPARK_GRAFT_CC_RPC", "2"))
spark = get_spark(app_name=f"cc_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
edges = spark.read.parquet(d + "/edges")
nodes = spark.read.parquet(d + "/nodes")

# byte economics of the iteration rows: url strings vs long surrogates
row = edges.agg(
    F.count("*").alias("n"),
    F.avg(F.length("src") + F.length("dst")).alias("str_bytes_per_row"),
).collect()[0]

def run():
    stats = {}
    t0 = time.monotonic()
    out = connected_components(
        edges, all_nodes=nodes, rounds_per_check=RPC, stats_out=stats
    )
    n_clusters = out.select("cluster_id").distinct().count()
    return time.monotonic() - t0, n_clusters, stats

run()  # warmup (JIT, codegen, Python workers)
best = None
for _ in range(2):
    wall, n_clusters, stats = run()
    spark.catalog.clearCache()
    if best is None or wall < best[0]:
        best = (wall, n_clusters, stats)
wall, n_clusters, stats = best
print("CHILD_RESULT " + json.dumps({
    "cpus": cpus, "wall_sec": round(wall, 2), "clusters": n_clusters,
    "input_edges": int(row.n),
    "str_bytes_per_row": round(float(row.str_bytes_per_row), 1),
    "surrogate_bytes_per_row": 16,
    **stats,
}))
spark.stop()
"""


def main() -> None:
    d = tempfile.mkdtemp(prefix="er_cc_bench_")
    gen = subprocess.run(
        [sys.executable, "-c", _GEN, d, str(N_ROWS)],
        capture_output=True, text=True, timeout=3000,
    )
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-4000:])
        raise SystemExit("edge generation failed")
    results: dict[int, dict] = {}
    all_runs = []
    for _ in range(ROUNDS):
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, "-c", _CHILD, str(cpus), d],
                capture_output=True, text=True, timeout=3000,
                env=dict(os.environ, SPARK_GRAFT_CPUS=str(cpus)),
            )
            lines = [l for l in out.stdout.splitlines()
                     if l.startswith("CHILD_RESULT ")]
            if not lines:
                sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
                raise SystemExit(f"child at local[{cpus}] failed")
            res = json.loads(lines[-1][len("CHILD_RESULT "):])
            all_runs.append({"cpus": cpus, "wall_sec": res["wall_sec"]})
            if cpus not in results or res["wall_sec"] < results[cpus]["wall_sec"]:
                results[cpus] = res
    shutil.rmtree(d, ignore_errors=True)
    lo, hi = LEVELS
    print(json.dumps({
        "metric": "cc_stage_wall",
        "unit": "sec",
        "n_rows_arg": N_ROWS,
        "levels": results,
        "speedup": round(results[lo]["wall_sec"] / results[hi]["wall_sec"], 2),
        "all_runs": all_runs,
    }))


if __name__ == "__main__":
    main()
