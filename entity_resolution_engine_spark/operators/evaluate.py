"""Pairwise-F1 evaluation against planted ground truth.

Computes pairwise precision/recall/F1 WITHOUT materializing pairs:
join predicted and true assignments per url, then count co-assignment
pairs via group sizes — TP = Σ C(n_uv, 2) over (true, pred) cells,
P = Σ C(n_v, 2) over predicted clusters, T = Σ C(n_u, 2) over true
clusters.  O(n) rows shuffled, scales to any corpus (the naive
pair-join evaluator would itself be a cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sum_pairs(df: DataFrame, *keys: str) -> float:
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    row = counts.agg(
        F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("p")
    ).collect()[0]
    return float(row.p)


def pairwise_f1(pred: DataFrame, truth: DataFrame) -> dict[str, float]:
    """pred(url, cluster_id) vs truth(url, true_cluster_id)."""
    joined = pred.join(truth, "url").select("cluster_id", "true_cluster_id").cache()
    try:
        tp = _sum_pairs(joined, "cluster_id", "true_cluster_id")
        pred_pairs = _sum_pairs(joined, "cluster_id")
        true_pairs = _sum_pairs(joined, "true_cluster_id")
    finally:
        joined.unpersist()
    precision = tp / pred_pairs if pred_pairs else 1.0
    recall = tp / true_pairs if true_pairs else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp_pairs": tp,
        "pred_pairs": pred_pairs,
        "true_pairs": true_pairs,
    }
