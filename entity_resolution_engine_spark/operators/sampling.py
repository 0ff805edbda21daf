"""Deterministic sampling for training-data curation.

A 100 TB corpus is never fed to training whole: the pipeline's last
step is picking a MIX — "50 % of English, 30 % of French, 10 % of the
rest", or "every doc with quality above the P75 threshold plus a 5 %
floor sample of the remainder".  Spark's built-in ``df.sample`` is
seed-dependent-per-partition (repartition the input and membership
changes), which breaks resumability and lineage — re-running the
pipeline after a checkpoint restore must select the SAME rows.

These operators instead derive membership from a content hash of a
stable key: ``u = md5(salt | key) → uniform in [0, 1)``; a row is kept
iff ``u < fraction``.  Properties a training pipeline needs:

- **deterministic & partition-invariant**: membership is a pure
  function of (salt, key) — repartitioning, resuming, or re-running
  cannot change the sample;
- **nested**: the 10 % sample is a strict subset of the 20 % sample at
  the same salt (fraction ramps keep prior picks);
- **independent across salts**: different salts give statistically
  independent samples (train/validation splits that never leak);
- **pure JVM** (md5 + conv are codegen'd — no UDF, no shuffle: sampling
  is a narrow filter that stacks on the parquet scan).

The md5-derived uniform is the same public trick the contract oracles
use throughout (__spark_entry__.py); DuckDB reproduces it bit-for-bit,
so the sampled SET itself is value-checked, not just its size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def hash_uniform(key: Column, salt: str = "er-sample") -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex chars of
    md5(salt | key) read as a 32-bit integer, scaled.  32 bits of the
    digest are plenty for sampling granularity (resolution ~2.3e-10)."""
    h = F.md5(F.concat(F.lit(salt + "|"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_DENOM)
    )


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id",
    salt: str = "er-sample",
) -> DataFrame:
    """Keep each row iff hash_uniform(key) < fraction.  Narrow filter,
    no shuffle; membership survives repartition/resume."""
    return df.filter(hash_uniform(F.col(key_col), salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "er-sample",
) -> DataFrame:
    """Per-stratum hash sampling — the training-mix operator.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    fall back to ``default_fraction``.  The per-row threshold is a
    CASE chain on the stratum column (codegen'd; strata counts are
    config-sized, not data-sized), so the whole operator remains a
    narrow, shuffle-free filter over the scan with predicate pushdown
    intact for any upstream filters."""
    thr: Column = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(thr)
    return df.filter(hash_uniform(F.col(key_col), salt) < thr)
