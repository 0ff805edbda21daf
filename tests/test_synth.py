"""Synthetic corpus: determinism across runs and partitionings, planted
cluster structure (reference seeded-generator analog,
generate_beta_data.py:19-29)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_engine_spark.sources.synth import (
    generate_web_pages,
    labeled_pairs,
)


def _corpus_hash(df):
    cols = ", ".join(sorted(df.columns))
    return df.agg(F.expr(f"bit_xor(xxhash64({cols}))").alias("h")).collect()[0].h


def test_deterministic_same_seed(spark):
    p1, l1 = generate_web_pages(spark, 300, seed=42)
    p2, l2 = generate_web_pages(spark, 300, seed=42)
    assert _corpus_hash(p1.drop("html")) == _corpus_hash(p2.drop("html"))
    assert _corpus_hash(l1) == _corpus_hash(l2)


def test_partitioning_invariant(spark):
    p1, _ = generate_web_pages(spark, 300, seed=42)
    p2, _ = generate_web_pages(spark, 300, seed=42)
    assert _corpus_hash(p1.repartition(13).drop("html")) == _corpus_hash(
        p2.repartition(2).drop("html")
    )


def test_different_seed_differs(spark):
    p1, _ = generate_web_pages(spark, 300, seed=42)
    p2, _ = generate_web_pages(spark, 300, seed=43)
    assert _corpus_hash(p1.drop("html")) != _corpus_hash(p2.drop("html"))


def test_cluster_structure(spark, synth_corpus):
    pages, labels = synth_corpus
    assert pages.count() == labels.count()
    sizes = labels.groupBy("true_cluster_id").count()
    mx = sizes.agg(F.max("count")).collect()[0][0]
    assert 1 <= mx <= 5
    # urls unique
    assert pages.select("url").distinct().count() == pages.count()
    # some rows carry no html (extractor fallback path must be exercised)
    assert pages.filter(F.col("html").isNull()).count() > 0


def test_labeled_pairs_shapes(spark, synth_corpus):
    _, labels = synth_corpus
    lp = labeled_pairs(labels).cache()
    assert lp.filter("url_a >= url_b").count() == 0
    pos = lp.filter("is_match").count()
    neg = lp.filter("NOT is_match").count()
    assert pos > 0 and neg > 0
    lp.unpersist()
