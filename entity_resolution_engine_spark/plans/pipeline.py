"""Pipeline orchestration: the ``run_mapping.main()`` analog
(/root/reference/entity_resolution_engine/cli/run_mapping.py:37-188),
rebuilt as a checkpointed stage sequence over the snapshot catalog.

Stages (each committed as a catalog snapshot before the next starts —
the cross-node boundaries listed in SURVEY.md §3.1):

    normalize → block → score → route → cluster → merge → observe

Resume: the run-state table records completed stages; a rerun with the
same ``run_id`` skips committed stages and reads their snapshots (the
north_rule's "resumable from checkpoint").  The connected-components
stage additionally checkpoints its iteration state, so resume works
mid-clustering.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators import metrics as M
from ..operators.blocking import candidate_pairs
from ..operators.cluster import connected_components
from ..operators.merge import merge_entities, source_lineage
from ..operators.normalize_stage import normalize_pages
from ..operators.router import (
    llm_run_stats,
    llm_validate_sample,
    review_items,
    route_pairs,
    router_metrics,
)
from ..operators.scoring import score_pairs
from ..sources.catalog import ParquetSnapshotCatalog, TableCatalog

STAGES = ("normalize", "block", "score", "route", "cluster", "merge", "observe")


@dataclass
class PipelineResult:
    run_id: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    gate_passed: bool = True
    timings: dict[str, float] = field(default_factory=dict)


class RunState:
    """Completed-stage ledger, one JSON file per run under the catalog
    root (atomic replace, same guarantee as the table manifests)."""

    def __init__(self, root: str, run_id: str):
        self.path = os.path.join(root, f"_run_state_{run_id}.json")
        self.run_id = run_id

    def completed(self) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        with open(self.path) as f:
            return set(json.load(f)["completed"])

    def mark(self, stage: str) -> None:
        done = self.completed() | {stage}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"run_id": self.run_id, "completed": sorted(done)}, f)
        os.replace(tmp, self.path)


class Pipeline:
    def __init__(
        self,
        spark: SparkSession,
        catalog_root: str,
        config: PipelineConfig = DEFAULT_CONFIG,
        catalog: TableCatalog | None = None,
    ):
        self.spark = spark
        self.cfg = config
        self.catalog = catalog or ParquetSnapshotCatalog(spark, catalog_root)
        self.root = catalog_root

    # stage table names are run-scoped so concurrent runs don't collide
    def _t(self, run_id: str, name: str) -> str:
        return f"run_{run_id}_{name}"

    def run(self, web_pages: DataFrame, run_id: str) -> PipelineResult:
        cat = self.catalog
        state = RunState(self.root, run_id)
        done = state.completed()
        res = PipelineResult(run_id=run_id)
        seq = 0

        def run_stage(name: str, fn) -> None:
            nonlocal seq
            if name in done:
                res.stages_skipped.append(name)
                return
            t0 = time.monotonic()
            fn()
            res.timings[name] = time.monotonic() - t0
            state.mark(name)
            res.stages_run.append(name)
            seq += 1

        # -- normalize ------------------------------------------------------
        def _normalize():
            normalized = normalize_pages(web_pages)
            cat.write(self._t(run_id, "normalized"), normalized)

        run_stage("normalize", _normalize)
        normalized = cat.read(self._t(run_id, "normalized"))

        # -- block ------------------------------------------------------------
        def _block():
            caches: list = []
            pairs, split_stats = candidate_pairs(
                normalized, self.cfg.blocking, caches=caches
            )
            cat.write(self._t(run_id, "candidates"), pairs)
            cat.write(self._t(run_id, "block_splits"), split_stats)
            # the candidates snapshot is committed — the blocking caches
            # are dead weight from here on (ADVICE: persist hygiene)
            for c in caches:
                c.unpersist()

        run_stage("block", _block)
        candidates = cat.read(self._t(run_id, "candidates"))

        # -- score ------------------------------------------------------------
        def _score():
            scored = score_pairs(candidates, normalized, self.cfg.scoring)
            cat.write(self._t(run_id, "scored"), scored)

        run_stage("score", _score)
        scored = cat.read(self._t(run_id, "scored"))

        # -- route ------------------------------------------------------------
        def _route():
            routed = route_pairs(scored, self.cfg.scoring, run_id)
            cat.write(self._t(run_id, "routed"), routed)
            routed_r = cat.read(self._t(run_id, "routed"))
            cat.write(self._t(run_id, "reviews"), review_items(routed_r, run_id))
            # optional LLM validation of the gray zone (reference
            # validation/router.py:97-256): bounded sample, budget +
            # circuit breaker inside llm_validate_sample.  Verdicts are
            # COMMITTED as a snapshot so the observe stage (and a
            # resumed run) derives llm stats from the same rows.
            if self.cfg.scoring.llm_enabled and self.cfg.llm_transport is not None:
                results = llm_validate_sample(
                    routed_r, self.cfg.scoring, transport=self.cfg.llm_transport
                )
                rows = [
                    (
                        run_id,
                        r.get("url_a"),
                        r.get("url_b"),
                        r.get("decision") or r.get("status"),
                        float(r["confidence"]) if r.get("confidence") is not None else None,
                        list(r.get("reasons") or []),
                        list(r.get("risk_flags") or []),
                        r.get("error"),
                    )
                    for r in results
                ]
                cat.write(
                    self._t(run_id, "llm_validations"),
                    self.spark.createDataFrame(
                        rows,
                        "run_id string, url_a string, url_b string, "
                        "decision string, confidence double, "
                        "reasons array<string>, risk_flags array<string>, "
                        "error string",
                    ),
                )

        run_stage("route", _route)
        routed = cat.read(self._t(run_id, "routed"))

        # -- cluster ----------------------------------------------------------
        def _cluster():
            edges = routed.filter(F.col("routed_status") == "approved").select(
                F.col("url_a").alias("src"), F.col("url_b").alias("dst")
            )
            assignments = connected_components(
                edges,
                all_nodes=normalized.select("url"),
                max_iterations=self.cfg.cc_max_iterations,
                checkpoint_every=self.cfg.cc_checkpoint_every,
                catalog=cat,
                checkpoint_table=self._t(run_id, "cc_state"),
            )
            cat.write(self._t(run_id, "clusters"), assignments)

        run_stage("cluster", _cluster)
        clusters = cat.read(self._t(run_id, "clusters"))

        # -- merge ------------------------------------------------------------
        def _merge():
            entities = merge_entities(clusters, normalized, routed)
            cat.write(self._t(run_id, "entities"), entities)
            cat.write(self._t(run_id, "source_lineage"), source_lineage(clusters))

        run_stage("merge", _merge)

        # -- observe: metrics, anomalies, gates --------------------------------
        def _observe():
            # metrics derive from the COMMITTED snapshots (not in-flight
            # DataFrames) so a resumed run reports complete metrics.
            # Stage row counts come from SNAPSHOT FILE METADATA
            # (catalog.file_row_counts — parquet/Iceberg footers): at
            # 100 TB, re-scanning five stage outputs purely for counts
            # would double the pipeline's read I/O; footers cost O(files)
            # KB-reads and each write-side file is one task's output, so
            # the per-file counts ARE the skew profile (VERDICT r3
            # observe consolidation).
            stage_tables = [
                ("normalize", "normalized"),
                ("block", "candidates"),
                ("score", "scored"),
                ("cluster", "clusters"),
                ("merge", "entities"),
            ]
            # finished_seq is a wall-clock-derived monotone sequence so
            # anomaly detection can order run history (the reference
            # orders by finished_at, anomaly_detector.py:44-57)
            seq_base = int(time.time() * 1000)
            local_rows: list[tuple] = []
            scan_frames = []  # catalogs that can't answer from metadata
            for i, (stage, tbl) in enumerate(stage_tables):
                counts = cat.file_row_counts(self._t(run_id, tbl))
                if counts is not None:
                    local_rows += M.stage_metrics_rows(
                        counts, run_id, stage, seq_base + i
                    )
                else:
                    scan_frames.append(
                        M.stage_metrics(
                            cat.read(self._t(run_id, tbl)), run_id, stage, seq_base + i
                        )
                    )
            # router counters: ONE aggregation job over the routed
            # snapshot, collected once (5 rows) and reused for both the
            # metrics write and the quality report below
            router_rows = [
                tuple(r)
                for r in router_metrics(
                    cat.read(self._t(run_id, "routed")), run_id, seq_base + 5
                ).collect()
            ]
            all_metrics = self.spark.createDataFrame(
                local_rows + router_rows, M.RUN_METRICS_SCHEMA
            )
            for fr in scan_frames:
                all_metrics = all_metrics.unionByName(fr)
            cat.write("run_metrics", all_metrics, mode="append")

            # run history is needed for the anomaly BASELINE (past runs'
            # rates) — a small observability table; cached for the two
            # plans that read it (rates + run_order)
            history = cat.read("run_metrics").cache()
            rates = M.derive_run_rates(history)
            run_order = (
                history.groupBy("run_id")
                .agg(F.min("finished_seq").alias("fs"))
                .withColumn("finished_seq", F.row_number().over(Window.orderBy("fs")))
                .select("run_id", "finished_seq")
            )
            anomalies = M.detect_anomalies(rates, run_order, run_id, self.cfg.anomaly)
            # ≤ 3 rows by construction (one per tracked rate) — collect
            # ONCE; the event write, triage report, HIGH-severity gate,
            # and quality report all feed from these rows instead of one
            # driver action each
            anoms_rows = anomalies.collect()
            cat.write(
                "anomaly_events",
                self.spark.createDataFrame(anoms_rows, anomalies.schema),
                mode="append",
            )
            reviews_df = cat.read(self._t(run_id, "reviews")).cache()
            samples = (
                reviews_df.filter(F.col("run_id") == run_id)
                .orderBy(F.desc("matcher_score"))
                .limit(20)
                .collect()
            )
            report = M.triage_report_rows(anoms_rows, samples, run_id)
            cat.write(
                "anomaly_triage_reports",
                self.spark.createDataFrame(
                    [
                        (
                            run_id,
                            report["max_severity"],
                            report["n_anomalies"],
                            report["report"],
                        )
                    ],
                    "run_id string, max_severity string, n_anomalies int, report string",
                ),
                mode="append",
            )
            # the max_llm_error_rate gate is fed from the COMMITTED
            # validation verdicts (None when the hook never ran — the
            # gate then passes at 0.0, the reference's zero-call
            # branch).  The bounded sample (≤ max_llm_calls_per_run
            # rows) makes the driver-side stats derivation O(KB).
            llm_stats = None
            llm_tbl = self._t(run_id, "llm_validations")
            if cat.exists(llm_tbl):
                llm_stats = llm_run_stats(
                    [r.asDict() for r in cat.read(llm_tbl).collect()]
                )
            gates = M.evaluate_quality_gates(
                rates,
                None,
                run_id,
                self.cfg.gates,
                llm_stats=llm_stats,
                high_anomaly_count=sum(
                    1 for a in anoms_rows if a.severity == "HIGH"
                ),
            )
            cat.write("quality_gate_results", gates, mode="append")

            # O4: the combined quality report (metrics + anomalies +
            # review counts) persisted as one run snapshot row —
            # assembled from the rows already on the driver plus one
            # review status-count job
            metrics_totals = [
                {"stage": r[1], "metric": r[2], "value": r[3]}
                for r in local_rows + router_rows
                if r[4] is None
            ]
            for fr in scan_frames:
                metrics_totals += [
                    r.asDict()
                    for r in fr.filter(F.col("partition_id").isNull())
                    .select("stage", "metric", "value")
                    .collect()
                ]
            anomaly_dicts = [
                {
                    k: v
                    for k, v in r.asDict().items()
                    if k != "run_id"
                }
                for r in anoms_rows
            ]
            review_counts = {
                r.status: int(r.n)
                for r in reviews_df.filter(F.col("run_id") == run_id)
                .groupBy("status")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            qr = M.build_quality_report_rows(
                metrics_totals, anomaly_dicts, review_counts, run_id
            )
            cat.write(
                "quality_reports",
                self.spark.createDataFrame(
                    [(run_id, json.dumps(qr, default=str))],
                    "run_id string, report_json string",
                ),
                mode="append",
            )
            for c in (history, reviews_df):
                c.unpersist()

        run_stage("observe", _observe)

        if cat.exists("quality_gate_results"):
            failed = (
                cat.read("quality_gate_results")
                .filter((F.col("run_id") == run_id) & (~F.col("passed")))
                .count()
            )
            res.gate_passed = failed == 0
        return res

    # convenience accessors -------------------------------------------------
    def table(self, run_id: str, name: str) -> DataFrame:
        return self.catalog.read(self._t(run_id, name))
