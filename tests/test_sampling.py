"""Deterministic hash sampling (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_engine_spark.operators.sampling import (
    hash_sample,
    hash_uniform,
    stratified_sample,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("fr"), F.lit("es"), F.lit("zh")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_hash_uniform_range_and_determinism(spark):
    df = _docs(spark, 500).select(hash_uniform(F.col("doc_id")).alias("u"))
    us = [r.u for r in df.collect()]
    assert all(0.0 <= u < 1.0 for u in us)
    assert us == [r.u for r in df.collect()]  # same plan, same values
    # roughly uniform: the mean of 500 uniforms is within 0.1 of 0.5
    assert abs(sum(us) / len(us) - 0.5) < 0.1


def test_hash_sample_fraction_and_nesting(spark):
    docs = _docs(spark)
    small = {r.doc_id for r in hash_sample(docs, 0.1).collect()}
    big = {r.doc_id for r in hash_sample(docs, 0.3).collect()}
    assert small <= big  # fraction ramp keeps prior picks
    assert 0.05 < len(small) / 2000 < 0.15
    assert 0.25 < len(big) / 2000 < 0.36


def test_hash_sample_partition_invariant(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in hash_sample(docs, 0.2).collect()}
    b = {r.doc_id for r in hash_sample(docs.repartition(13), 0.2).collect()}
    assert a == b


def test_salts_give_independent_samples(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in hash_sample(docs, 0.5, salt="train").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.5, salt="valid").collect()}
    # independent 50% samples overlap ~25% of the corpus, not ~50%
    overlap = len(a & b) / 2000
    assert 0.15 < overlap < 0.35
    assert a != b


def test_stratified_fractions_respected(spark):
    docs = _docs(spark, 4000)
    out = stratified_sample(
        docs, {"en": 0.8, "fr": 0.2}, default_fraction=0.0
    )
    counts = {
        r.lang: r.c
        for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert set(counts) <= {"en", "fr"}  # zh/es fully dropped
    assert 0.7 < counts["en"] / 1000 < 0.9
    assert 0.1 < counts["fr"] / 1000 < 0.3


def test_stratified_no_shuffle(spark):
    # the operator must stay a narrow filter: no Exchange in the plan
    docs = _docs(spark)
    plan = (
        stratified_sample(docs, {"en": 0.5}, default_fraction=0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
