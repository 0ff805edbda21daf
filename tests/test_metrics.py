"""Observability: run rates, z-score anomaly detection, quality gates
(reference monitoring/anomaly_detector.py + qa/quality_gates.py analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_engine_spark.config import AnomalyConfig, QualityGateConfig
from entity_resolution_engine_spark.operators.metrics import (
    derive_run_rates,
    detect_anomalies,
    evaluate_quality_gates,
    stage_metrics,
)


def _router_metrics_row(spark, run_id, total, approved, rejected, gray, seq):
    rows = [
        (run_id, "router", "total_pairs", float(total), None, seq),
        (run_id, "router", "auto_approved", float(approved), None, seq),
        (run_id, "router", "auto_rejected", float(rejected), None, seq),
        (run_id, "router", "gray_zone", float(gray), None, seq),
    ]
    return spark.createDataFrame(
        rows,
        "run_id string, stage string, metric string, value double, "
        "partition_id int, finished_seq long",
    )


def _history(spark, gray_rates, current_gray):
    dfs = []
    for i, g in enumerate(gray_rates):
        dfs.append(_router_metrics_row(spark, f"run{i}", 100, 100 - g, 0, g, i))
    dfs.append(
        _router_metrics_row(
            spark, "current", 100, 100 - current_gray, 0, current_gray, len(gray_rates)
        )
    )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def test_stage_metrics_shapes(spark):
    df = spark.range(100)
    m = stage_metrics(df, "r", "stage1", 7)
    rows = m.collect()
    total = [r for r in rows if r.metric == "row_count"]
    parts = [r for r in rows if r.metric == "partition_row_count"]
    assert len(total) == 1 and total[0].value == 100.0
    assert sum(r.value for r in parts) == 100.0


def test_derive_run_rates(spark):
    h = _router_metrics_row(spark, "r1", 200, 120, 60, 20, 0)
    r = derive_run_rates(h).collect()[0]
    assert abs(r.gray_zone_rate - 0.1) < 1e-12
    assert abs(r.approval_rate - 0.6) < 1e-12
    assert abs(r.rejection_rate - 0.3) < 1e-12


def _run_order(spark, history):
    from pyspark.sql import Window

    return (
        history.groupBy("run_id")
        .agg(F.min("finished_seq").alias("fs"))
        .withColumn("finished_seq", F.row_number().over(Window.orderBy("fs")))
        .select("run_id", "finished_seq")
    )


def test_anomaly_detected_on_spike(spark):
    # baseline gray ≈ 10±1, current = 40 → huge z
    h = _history(spark, [9, 10, 11, 10, 9, 11], 40)
    rates = derive_run_rates(h)
    anomalies = detect_anomalies(rates, _run_order(spark, h), "current", AnomalyConfig())
    got = {r.metric: r for r in anomalies.collect()}
    assert "gray_zone_rate" in got
    assert got["gray_zone_rate"].severity == "HIGH"


def test_no_anomaly_without_baseline(spark):
    h = _history(spark, [10], 40)  # only 1 baseline run < min_baseline_runs
    rates = derive_run_rates(h)
    anomalies = detect_anomalies(rates, _run_order(spark, h), "current", AnomalyConfig())
    assert anomalies.count() == 0


def test_quality_gates_pass_and_fail(spark):
    h = _router_metrics_row(spark, "r1", 100, 60, 0, 40, 0)  # gray rate 0.4
    rates = derive_run_rates(h)
    empty_anoms = spark.createDataFrame([], "run_id string, severity string")
    gates = {g.gate: g for g in evaluate_quality_gates(rates, empty_anoms, "r1", QualityGateConfig()).collect()}
    assert gates["max_gray_zone_rate"].passed is False  # 0.4 > 0.35
    assert gates["no_high_severity_anomalies"].passed is True

    h2 = _router_metrics_row(spark, "r2", 100, 95, 0, 5, 0)
    gates2 = {g.gate: g for g in evaluate_quality_gates(derive_run_rates(h2), empty_anoms, "r2", QualityGateConfig()).collect()}
    assert gates2["max_gray_zone_rate"].passed is True
    assert gates2["max_review_rate"].passed is True


def test_triage_report_fallback(spark):
    from entity_resolution_engine_spark.operators.metrics import triage_report

    h = _history(spark, [9, 10, 11, 10, 9, 11], 40)
    rates = derive_run_rates(h)
    anomalies = detect_anomalies(rates, _run_order(spark, h), "current", AnomalyConfig())
    reviews = spark.createDataFrame(
        [("current", "a1", "b1", 0.55, "PENDING", "{}"),
         ("current", "a2", "b2", 0.61, "PENDING", "{}")],
        "run_id string, url_a string, url_b string, matcher_score double, "
        "status string, signals string",
    )
    rep = triage_report(anomalies, reviews, "current")
    assert rep["max_severity"] == "HIGH"
    assert rep["n_review_samples"] == 2
    assert "gray_zone_rate" in rep["report"]
    assert "a2 ~ b2" in rep["report"]  # highest score first


def test_triage_report_no_anomalies(spark):
    from entity_resolution_engine_spark.operators.metrics import triage_report

    empty = spark.createDataFrame(
        [], "run_id string, metric string, value double, baseline_mean double, "
        "baseline_stddev double, z_score double, severity string")
    rep = triage_report(empty, None, "r9")
    assert rep["max_severity"] == "NONE" and rep["n_anomalies"] == 0
    assert "No anomalies" in rep["report"]


def test_quality_gates_four_rows_with_llm_gate(spark):
    # reference quality_gates.yml has FOUR gates; max_llm_error_rate
    # evaluates llm_errors/llm_calls (0.0 when the LLM never ran)
    h = _router_metrics_row(spark, "r3", 100, 95, 0, 5, 0)
    rates = derive_run_rates(h)
    empty_anoms = spark.createDataFrame([], "run_id string, severity string")
    gates = {
        g.gate: g
        for g in evaluate_quality_gates(
            rates, empty_anoms, "r3", QualityGateConfig()
        ).collect()
    }
    assert len(gates) == 4
    assert gates["max_llm_error_rate"].passed is True
    assert gates["max_llm_error_rate"].value == 0.0

    failing = {
        g.gate: g
        for g in evaluate_quality_gates(
            rates, empty_anoms, "r3", QualityGateConfig(),
            llm_stats={"llm_error_rate": 0.5},
        ).collect()
    }
    assert failing["max_llm_error_rate"].passed is False  # 0.5 > 0.05
    assert failing["max_llm_error_rate"].value == 0.5
