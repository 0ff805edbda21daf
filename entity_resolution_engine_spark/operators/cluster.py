"""Stage 5 — transitive clustering: large-star / small-star connected
components, entirely in DataFrame joins.

The reference never needs transitive closure — its two-source argmax
guarantees 1:1 matches (SURVEY.md §7.2 step 6).  Web-scale dedup does:
approved match edges form arbitrary components.  This implements the
alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public), the
standard O(log n)-round CC for massive graphs:

- **large-star**: every node points its larger neighbors at its
  minimum neighbor (or itself) — strictly decreases large labels.
- **small-star**: every node rewires its smaller-or-equal neighbors to
  the minimum — flattens chains into stars.

Each round is two shuffles (groupBy min + self-join back).  Iteration
state is checkpointed: ``localCheckpoint`` every round truncates the
logical plan (otherwise the lineage doubles per round and Catalyst
analysis blows up), and every ``checkpoint_every`` rounds the edge set
is committed to the snapshot catalog so a killed run resumes
mid-clustering (north_rule checkpoint/resume).

Node ids are urls (strings): min() over the natural string order gives
a deterministic root per component regardless of partitioning or
cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import TableCatalog


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.unionByName(rev)


def large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m = min(u ∪ neighbors); emit (v, m) for each
    neighbor v > u.  Returns a directed edge set (src > dst invariant
    not yet guaranteed — small_star restores it)."""
    sym = _symmetrize(edges)
    m = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint, then for each node u:
    m = min(u ∪ smaller-neighbors); emit (v, m) for v in neighbors ∪ {u},
    v ≠ m."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    m = directed.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    nbrs = directed.join(m, "src").select(
        F.col("dst").alias("v"), F.col("m"), F.col("src").alias("u")
    )
    self_edges = m.select(F.col("src").alias("v"), F.col("m"), F.col("src").alias("u"))
    out = (
        nbrs.unionByName(self_edges)
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )
    return out


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components(
    edges: DataFrame,
    all_nodes: DataFrame | None = None,
    max_iterations: int = 50,
    checkpoint_every: int = 3,
    catalog: TableCatalog | None = None,
    checkpoint_table: str = "_cc_edges",
    rounds_per_check: int = 2,
) -> DataFrame:
    """edges(src, dst) → assignments(url, cluster_id).

    ``all_nodes`` (url) adds singleton components for nodes with no
    edges.  ``catalog`` persists the working edge set every
    ``checkpoint_every`` rounds; if the checkpoint table already exists
    the iteration RESUMES from it instead of the raw edges.

    ``rounds_per_check`` composes that many large+small-star rounds
    into ONE job before the convergence signature runs: each signature
    is a full pass over the edge set plus a driver round-trip — pure
    serial time under Amdahl (the round-1 scaling-efficiency miss).
    The star fixed point is stable under composition, so checking every
    k-th round costs at most k−1 no-op rounds after convergence in
    exchange for k× fewer sync points.
    """
    spark = edges.sparkSession
    cur = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    if catalog is not None and catalog.exists(checkpoint_table):
        cur = catalog.read(checkpoint_table)

    # Spark 4.1's union constraint rewrite crashes (`key not found:
    # dst#N`) when checkpointing a plan whose union branches share
    # source attribute ids (the candidate union built from one members
    # frame).  Constraints only matter for filter inference/pushdown,
    # which the tiny (src, dst) iteration plans don't benefit from —
    # disable propagation for the duration of the loop and restore it
    # after (the converged edge set is checkpoint-backed by then).
    _CONF = "spark.sql.constraintPropagation.enabled"
    prev_conf = spark.conf.get(_CONF, "true")
    spark.conf.set(_CONF, "false")
    try:
        # lazy localCheckpoint: the signature aggregation right after is
        # the materializing action, so each round costs ONE job (an
        # eager checkpoint would add a second full pass — pure serial
        # driver time multiplied by the iteration count)
        cur = cur.localCheckpoint(eager=False)
        prev_sig = _signature(cur)

        for it in range(max_iterations):
            nxt = cur
            for _ in range(max(1, rounds_per_check)):
                nxt = small_star(large_star(nxt))
            nxt = nxt.localCheckpoint(eager=False)
            sig = _signature(nxt)
            if catalog is not None and (it + 1) % checkpoint_every == 0:
                catalog.write(checkpoint_table, nxt, mode="overwrite")
            if sig == prev_sig:
                cur = nxt
                break
            prev_sig = sig
            cur = nxt
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} iterations"
            )
    finally:
        spark.conf.set(_CONF, prev_conf)

    # Converged edge set is a forest of stars (child → root).  Any root
    # appearing only as dst maps to itself.
    child = cur.select(F.col("src").alias("url"), F.col("dst").alias("cluster_id"))
    roots = cur.select(F.col("dst").alias("url")).distinct()
    root_self = roots.join(
        child.select("url"), "url", "left_anti"
    ).withColumn("cluster_id", F.col("url"))
    assign = child.unionByName(root_self)

    if all_nodes is not None:
        singletons = all_nodes.select("url").join(
            assign.select("url"), "url", "left_anti"
        ).withColumn("cluster_id", F.col("url"))
        assign = assign.unionByName(singletons)

    if catalog is not None and catalog.exists(checkpoint_table):
        catalog.drop(checkpoint_table)
    return assign
