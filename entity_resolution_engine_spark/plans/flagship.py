"""Flagship in-memory ER run over a ``documents``-shaped table.

The driver's smoke entry (``__spark_entry__.py:entry``) and the
rows-only correctness query both resolve the testdata ``documents``
table end-to-end: adapt to the web_pages schema → normalize → block
(exact + MinHash-LSH) → score (Arrow-batched features + logistic) →
route → large-star/small-star connected components → cluster
assignments.  Same operator chain as plans/pipeline.py minus the
snapshot-catalog writes (the driver wants one DataFrame back).

Reference analog: cli/run_mapping.py:37-188's match→route→merge sweep
(/root/reference), collapsed to the single-source self-resolution case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.blocking import candidate_pairs
from ..operators.cluster import connected_components
from ..operators.normalize_stage import normalize_pages
from ..operators.router import route_pairs
from ..operators.scoring import score_pairs


def documents_as_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → web_pages shape.

    url is deterministic (doc://{source}/{doc_id}); html is absent so
    the canonicalizer takes the text-column fallback path; warc_ts is a
    fixed epoch + doc_id offset (never wall-clock)."""
    return documents.select(
        F.concat(
            F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.timestamp_seconds(F.lit(1577836800) + F.col("doc_id")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def resolve_documents(
    spark: SparkSession,
    documents: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Full ER sweep; returns (url, cluster_id, n_members) assignments."""
    pages = documents_as_pages(documents)
    normalized = normalize_pages(pages)
    # tiny corpora (sf0.001) still need the UDF-bearing plan to be
    # evaluated twice (blocking + scoring) — cache the normalized side.
    # canonical_text is dropped BEFORE the cache (round 6): no stage of
    # the resolve (blocking keys, scoring match keys, CC urls) reads
    # it, and it is the widest column in the frame — the projection
    # halves the cache-fill bytes while norm_text is still computed
    # from it inside the one fused ArrowEvalPython pass
    normalized = normalized.drop("canonical_text").cache()
    # NOTE: normalized itself stays cached — the returned assignments
    # still reference it lazily (the all_nodes singleton branch)
    caches: list = []
    pairs, _split_stats = candidate_pairs(normalized, config.blocking, caches=caches)
    scored = score_pairs(pairs, normalized, config.scoring)
    routed = route_pairs(scored, config.scoring, run_id="flagship")
    edges = routed.filter(F.col("routed_status") == "approved").select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    )
    assignments = connected_components(
        edges,
        all_nodes=normalized.select("url"),
        max_iterations=config.cc_max_iterations,
        checkpoint_every=config.cc_checkpoint_every,
    )
    # CC's localCheckpoint rounds materialized the edge set, so the
    # returned assignments no longer reference the blocking plans —
    # those caches are safe to release here
    for c in caches:
        c.unpersist()
    # cluster sizes as a window count (round 6): the groupBy+join form
    # paid two exchanges plus a join for the same value; the window
    # pays one hash exchange on cluster_id (guide §2.4 — same-key agg
    # and attach share one partitioning)
    w = Window.partitionBy("cluster_id")
    return assignments.select(
        "url", "cluster_id", F.count("*").over(w).alias("n_members")
    )
