"""Router: 3-way threshold partition + fallback modes (reference
tests/test_validation_router.py:13-52,159-180 analog)."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from entity_resolution_engine_spark.config import ScoringConfig
from entity_resolution_engine_spark.operators.router import (
    review_items,
    route_pairs,
    router_metrics,
)

CFG = ScoringConfig()  # low=0.45, high=0.62


def _scored(spark):
    rows = [
        # url_a, url_b, score, lang_a, lang_b
        ("a1", "b1", 0.10, "en", "en"),   # rejected
        ("a2", "b2", 0.50, "en", "en"),   # gray (between)
        ("a3", "b3", 0.90, "en", "en"),   # approved
        ("a4", "b4", 0.90, "en", "fr"),   # high score BUT conflict → gray
        ("a5", "b5", 0.449, "en", "en"),  # just below low → rejected
        ("a6", "b6", 0.62, "en", "en"),   # exactly high → approved
    ]
    df = spark.createDataFrame(rows, ["url_a", "url_b", "score", "lang_a", "lang_b"])
    return df.select(
        "*",
        F.lit(0.5).alias("jaro_winkler"),
        F.lit(0.5).alias("token_jaccard"),
        F.lit(0.5).alias("levenshtein_sim"),
        F.lit(0.5).alias("length_ratio"),
    )


def test_three_way_partition_counts(spark):
    routed = route_pairs(_scored(spark), CFG, "r1")
    by = {r.decision: r.n for r in routed.groupBy("decision").agg(F.count("*").alias("n")).collect()}
    assert by == {"rejected": 2, "gray": 2, "approved": 2}


def test_auto_approve_fallback(spark):
    routed = route_pairs(_scored(spark), CFG, "r1")
    st = {r.routed_status: r.n for r in routed.groupBy("routed_status").agg(F.count("*").alias("n")).collect()}
    assert st == {"rejected": 2, "approved": 4}  # gray folded into approved


def test_review_fallback_mode(spark):
    cfg = replace(CFG, fallback_mode="review")
    routed = route_pairs(_scored(spark), cfg, "r1")
    st = {r.routed_status: r.n for r in routed.groupBy("routed_status").agg(F.count("*").alias("n")).collect()}
    assert st == {"rejected": 2, "approved": 2, "pending": 2}
    reviews = review_items(routed, "r1")
    assert reviews.count() == 2
    assert set(reviews.columns) >= {"run_id", "url_a", "url_b", "matcher_score", "status", "signals"}


def test_router_metrics_counters(spark):
    routed = route_pairs(_scored(spark), CFG, "r1")
    m = {r.metric: r.value for r in router_metrics(routed, "r1").collect()}
    assert m["total_pairs"] == 6.0
    assert m["auto_approved"] == 2.0
    assert m["auto_rejected"] == 2.0
    assert m["gray_zone"] == 2.0
