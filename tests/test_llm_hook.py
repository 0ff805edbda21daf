"""Optional LLM validation hook: disabled-by-default, call budget,
circuit breaker (reference tests/test_validation_router.py:73-156
analog — the breaker is sequential driver-side state by design)."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from entity_resolution_engine_spark.config import ScoringConfig
from entity_resolution_engine_spark.operators.router import (
    llm_validate_sample,
    route_pairs,
)

CFG = ScoringConfig()


def _routed(spark, n_gray=30):
    rows = [
        (f"a{i}", f"b{i}", 0.5, "en", "en") for i in range(n_gray)
    ]  # all in the gray zone (0.45 <= s < 0.62)
    df = spark.createDataFrame(rows, ["url_a", "url_b", "score", "lang_a", "lang_b"])
    df = df.select(
        "*",
        F.lit(0.5).alias("jaro_winkler"),
        F.lit(0.5).alias("token_jaccard"),
        F.lit(0.5).alias("levenshtein_sim"),
        F.lit(0.5).alias("length_ratio"),
    )
    return route_pairs(df, CFG, "r1")


def test_disabled_by_default(spark):
    routed = _routed(spark)
    assert llm_validate_sample(routed, CFG, validate_fn=lambda p: {"status": "OK"}) == []


def test_call_budget_caps_sample(spark):
    cfg = replace(CFG, llm_enabled=True, max_llm_calls_per_run=10)
    routed = _routed(spark, n_gray=30)
    calls = []

    def fn(pair):
        calls.append(pair["url_a"])
        return {"status": "APPROVE"}

    out = llm_validate_sample(routed, cfg, validate_fn=fn)
    assert len(calls) == 10  # budget, not all 30 gray pairs
    assert all(o["status"] == "APPROVE" for o in out)


def test_circuit_breaker_opens_after_full_window(spark):
    # reference parity: the breaker evaluates only once the rolling
    # window (50) is FULL (router.py:148-160) — then a >=0.2 fail rate
    # stops further calls
    cfg = replace(CFG, llm_enabled=True, max_llm_calls_per_run=100)
    routed = _routed(spark, n_gray=100)

    def fn(pair):
        raise RuntimeError("llm down")

    out = llm_validate_sample(routed, cfg, validate_fn=fn)
    assert len(out) == 50  # breaker opens exactly when the window fills
    assert all(o["status"] == "REVIEW" for o in out)


def test_circuit_breaker_stays_closed_on_low_fail_rate(spark):
    cfg = replace(CFG, llm_enabled=True, max_llm_calls_per_run=80)
    routed = _routed(spark, n_gray=80)
    n = {"i": 0}

    def fn(pair):
        n["i"] += 1
        if n["i"] % 10 == 0:  # 10% failures < 20% threshold
            raise RuntimeError("transient")
        return {"status": "APPROVE"}

    out = llm_validate_sample(routed, cfg, validate_fn=fn)
    assert len(out) == 80  # never tripped


def test_errors_become_review_rows(spark):
    cfg = replace(CFG, llm_enabled=True, max_llm_calls_per_run=5)
    routed = _routed(spark, n_gray=5)

    def fn(pair):
        if pair["url_a"].endswith("0"):
            raise ValueError("bad json")
        return {"status": "APPROVE"}

    out = llm_validate_sample(routed, cfg, validate_fn=fn)
    statuses = {o["url_a"]: o["status"] for o in out}
    assert statuses["a0"] == "REVIEW"
    assert sum(1 for s in statuses.values() if s == "APPROVE") == 4
