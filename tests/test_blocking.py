"""Blocking: recall against planted clusters, block-size bounding,
connectivity preservation through splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_engine_spark.config import BlockingConfig
from entity_resolution_engine_spark.operators.blocking import (
    candidate_pairs,
    exact_candidates,
    split_oversized_blocks,
)
from entity_resolution_engine_spark.operators.normalize_stage import normalize_pages


@pytest.fixture(scope="module")
def normalized(spark, synth_corpus):
    pages, _ = synth_corpus
    n = normalize_pages(pages).cache()
    n.count()
    return n


def test_exact_candidates_star_shape(spark):
    # three copies of one text → 2 star edges to the min url, no triangle
    rows = [
        ("u1", "same text", "m1"),
        ("u2", "same text", "m1"),
        ("u3", "same text", "m1"),
        ("u4", "other", "m2"),
    ]
    df = spark.createDataFrame(rows, ["url", "norm_text", "text_md5"])
    edges = exact_candidates(df).collect()
    assert sorted((e.url_a, e.url_b) for e in edges) == [("u1", "u2"), ("u1", "u3")]


def test_split_bounds_block_size(spark):
    cfg = BlockingConfig(max_block_size=8)
    members = spark.createDataFrame(
        [("hot", f"u{i:03d}") for i in range(50)] + [("cold", "x1"), ("cold", "x2")],
        ["block_key", "url"],
    )
    bounded, rep_edges, stats = split_oversized_blocks(members, cfg)
    sizes = bounded.groupBy("block_key").count().collect()
    assert max(r["count"] for r in sizes) <= 8
    st = stats.collect()
    assert len(st) == 1 and st[0].block_key == "hot" and st[0].block_size == 50
    # connectivity: a star of n_subblocks-1 edges links every sub-block
    # rep to the block minimum (NOT an all-pairs rep block — that would
    # be quadratic in n_subblocks for a mega-block)
    reps = rep_edges.collect()
    assert len(reps) == st[0].n_subblocks - 1
    assert all(e.url_a == "u000" for e in reps)  # root = global min url
    assert all(e.url_a < e.url_b for e in reps)


def test_blocking_recall_on_planted_clusters(spark, synth_corpus, normalized):
    """Candidate pairs + transitivity must cover ≥99% of intra-cluster
    pairs (BASELINE.json F1 target is downstream-capped by this)."""
    _, labels = synth_corpus
    pairs, _ = candidate_pairs(normalized, BlockingConfig())
    # transitive closure not needed for recall accounting if we measure
    # connectivity per cluster: count clusters whose members form one
    # connected component in the candidate graph.  Cheap proxy here:
    # direct-pair recall over the labeled positive pairs.
    from entity_resolution_engine_spark.sources.synth import labeled_pairs

    gold = labeled_pairs(labels).filter("is_match")
    hit = gold.join(pairs, ["url_a", "url_b"], "left_semi").count()
    total = gold.count()
    assert total > 0
    assert hit / total >= 0.97, f"direct blocking recall {hit}/{total}"


def test_candidate_pairs_unique(normalized):
    pairs, _ = candidate_pairs(normalized, BlockingConfig())
    n = pairs.count()
    nd = pairs.select("url_a", "url_b").distinct().count()
    assert n == nd
    assert pairs.filter(F.col("url_a") >= F.col("url_b")).count() == 0


def test_compose_domain_mode(spark, synth_corpus, normalized):
    """Composite (domain + band) keys confine candidates to one domain."""
    from pyspark.sql import functions as F

    cfg = BlockingConfig(compose_domain=True)
    pairs, _ = candidate_pairs(normalized, cfg)
    from entity_resolution_engine_spark.functions.normalize import domain_col

    lsh_pairs = pairs.filter(F.col("strategy") == "lsh")
    cross = lsh_pairs.filter(
        domain_col(F.col("url_a")) != domain_col(F.col("url_b"))
    ).count()
    assert cross == 0
    assert lsh_pairs.count() > 0


def test_exact_candidates_skewed_block(spark):
    # one md5 block with 500 members must produce a 499-edge star
    rows = [(f"u{i:04d}", "same", "m1") for i in range(500)] + [
        ("z1", "other", "m2")
    ]
    df = spark.createDataFrame(rows, ["url", "norm_text", "text_md5"])
    edges = exact_candidates(df).collect()
    assert len(edges) == 499
    assert all(e.url_a == "u0000" for e in edges)


def test_hot_block_bounded_and_connected(spark):
    """A 2000-copy boilerplate page (hot md5 AND hot LSH bands) must not
    explode the pair count, must log its splits, and must still come out
    as ONE connected component."""
    from entity_resolution_engine_spark.operators.cluster import (
        connected_components,
    )

    text = "identical boilerplate page body " * 8
    rows = [
        (f"https://s{i%7}.example.org/p/{i:05d}", text.lower().strip(), "hotmd5")
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, ["url", "norm_text", "text_md5"])
    cfg = BlockingConfig(max_block_size=64)
    pairs, stats = candidate_pairs(df, cfg)
    n_pairs = pairs.count()
    # unbounded all-pairs would be ~2M; bounded: exact star (1999) +
    # LSH sub-blocks (<= bands * ceil(2000/64) * C(64,2)-ish per block,
    # deduped). Assert well under the quadratic blowup.
    assert n_pairs < 300_000, n_pairs
    assert stats.count() > 0  # the split ledger recorded the hot blocks
    edges = pairs.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    )
    assign = connected_components(edges, all_nodes=df.select("url"))
    assert assign.select("cluster_id").distinct().count() == 1
