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


def _ts(offset_days: float):
    from datetime import datetime, timedelta

    return datetime(2020, 1, 1) + timedelta(days=offset_days)


def test_conflict_flags_four_signals(spark):
    """J11 parity (reference validation/adapters.py:48-77 builds four
    mismatch signals): a high-score pair with ANY conflict routes gray."""
    rows = [
        # url_a, url_b, score, lang_a, lang_b, ts_a, ts_b, length_ratio
        ("https://a.org/1", "https://a.org/2", 0.9, "en", "en", _ts(0), _ts(1), 1.0),    # clean → approved
        ("https://a.org/3", "https://a.org/4", 0.9, "en", "fr", _ts(0), _ts(1), 1.0),    # lang
        ("https://a.org/5", "https://a.org/6", 0.9, "en", "en", _ts(0), _ts(400), 1.0),  # ts gap
        ("https://a.org/7", "https://a.org/8", 0.9, "en", "en", _ts(0), _ts(1), 0.1),    # length
    ]
    df = spark.createDataFrame(
        rows,
        "url_a string, url_b string, score double, lang_a string, "
        "lang_b string, ts_a timestamp, ts_b timestamp, length_ratio double",
    ).select(
        "*",
        F.lit(0.9).alias("jaro_winkler"),
        F.lit(0.9).alias("token_jaccard"),
        F.lit(0.9).alias("levenshtein_sim"),
    )
    routed = route_pairs(df, CFG, "r1")
    got = {r.url_a: (r.decision, sorted(r.conflicts)) for r in routed.collect()}
    assert got["https://a.org/1"] == ("approved", [])
    assert got["https://a.org/3"] == ("gray", ["lang_mismatch"])
    assert got["https://a.org/5"] == ("gray", ["warc_ts_gap"])
    assert got["https://a.org/7"] == ("gray", ["length_mismatch"])


def test_domain_mismatch_flag_opt_in(spark):
    rows = [
        ("https://a.org/1", "https://b.org/9", 0.9, "en", "en"),
    ]
    df = spark.createDataFrame(
        rows, ["url_a", "url_b", "score", "lang_a", "lang_b"]
    ).select(
        "*",
        F.lit(0.9).alias("jaro_winkler"),
        F.lit(0.9).alias("token_jaccard"),
        F.lit(0.9).alias("levenshtein_sim"),
        F.lit(1.0).alias("length_ratio"),
    )
    # default: cross-domain dup pairs are legitimate → approved
    assert route_pairs(df, CFG, "r").collect()[0].decision == "approved"
    cfg = replace(CFG, flag_domain_mismatch=True)
    row = route_pairs(df, cfg, "r").collect()[0]
    assert row.decision == "gray" and row.conflicts == ["domain_mismatch"]


def test_review_signals_carry_conflicts(spark):
    import json as _json

    cfg = replace(CFG, fallback_mode="review")
    rows = [("https://a.org/1", "https://a.org/2", 0.9, "en", "fr")]
    df = spark.createDataFrame(
        rows, ["url_a", "url_b", "score", "lang_a", "lang_b"]
    ).select(
        "*",
        F.lit(0.9).alias("jaro_winkler"),
        F.lit(0.9).alias("token_jaccard"),
        F.lit(0.9).alias("levenshtein_sim"),
        F.lit(1.0).alias("length_ratio"),
    )
    routed = route_pairs(df, cfg, "r1")
    item = review_items(routed, "r1").collect()[0]
    assert _json.loads(item.signals)["conflicts"] == ["lang_mismatch"]


def test_exact_pairs_skip_metadata_conflict_flags(spark):
    """Byte-identical clone pairs must cluster regardless of crawl-ts
    gap / lang metadata (round-2 ADVICE): conflict flags only apply to
    similarity-matched (lsh) pairs."""
    rows = [
        # exact clone crawled 400 days apart + lang metadata mismatch
        ("https://a.org/1", "https://a.org/2", 1.0, "en", "fr", _ts(0), _ts(400), 1.0, "exact"),
        # identical metadata conflicts on an lsh pair still route gray
        ("https://a.org/3", "https://a.org/4", 0.9, "en", "fr", _ts(0), _ts(400), 1.0, "lsh"),
    ]
    df = spark.createDataFrame(
        rows,
        "url_a string, url_b string, score double, lang_a string, "
        "lang_b string, ts_a timestamp, ts_b timestamp, "
        "length_ratio double, strategy string",
    ).select(
        "*",
        F.lit(0.9).alias("jaro_winkler"),
        F.lit(0.9).alias("token_jaccard"),
        F.lit(0.9).alias("levenshtein_sim"),
    )
    got = {r.url_a: (r.decision, sorted(r.conflicts)) for r in route_pairs(df, CFG, "r").collect()}
    assert got["https://a.org/1"] == ("approved", [])
    assert got["https://a.org/3"] == ("gray", ["lang_mismatch", "warc_ts_gap"])
