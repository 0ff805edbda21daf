"""Stage 2 — blocking: candidate-pair generation without the cross join.

The reference scores every left row against every right row —
O(|A|·|B|) nested loops (/root/reference/entity_resolution_engine/
matchers/teams_matcher.py:38-49) — which is exactly what cannot exist
at 10^12 documents.  This stage replaces it with two composable
blocking strategies (SURVEY.md §4.1):

- **exact**: equality on ``md5(norm_text)``.  Within an exact block we
  do NOT emit all O(k²) pairs — a star to the block's minimum url is
  enough for the transitive-clustering stage and turns a 10^6-copy
  boilerplate page from 10^12 pairs into 10^6 edges.
- **lsh**: MinHash-LSH over word-shingles.  Shingling + base hashing
  is pure JVM (``functions/hashing.py``); signatures are one
  numpy-vectorized pandas UDF; band keys explode JVM-side; candidate
  pairs come from a self-equi-join on the band key.

Skew handling ("no silent caps"): blocks larger than
``max_block_size`` are *split* deterministically by url-hash into
sub-blocks (all-pairs within each) and re-linked through their
per-sub-block representatives — connectivity is preserved for
clustering while per-block pair count stays bounded.  The split is
logged via an accumulator-free metrics DataFrame the pipeline persists
(stage metrics, north_rule's per-partition lineage/metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BlockingConfig
from ..functions import hashing as H


def _pairs_within_blocks(members: DataFrame, strategy: str) -> DataFrame:
    """All-pairs self-join within (bounded-size) blocks.

    ``members``: (block_key: string, url: string).  Emits
    (url_a < url_b, block_key, strategy).  The join shuffles both
    sides on block_key once; AQE splits any residual skew.
    """
    a = members.select(F.col("block_key"), F.col("url").alias("url_a"))
    b = members.select(F.col("block_key"), F.col("url").alias("url_b"))
    return (
        a.join(b, "block_key")
        .filter(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b", "block_key", F.lit(strategy).alias("strategy"))
    )


def exact_candidates(normalized: DataFrame) -> DataFrame:
    """Exact-duplicate edges: star-to-min within each md5 block.

    One window pass, no self-join: every member pairs with the block's
    minimal url.  Emits nothing for singleton blocks.
    """
    w = Window.partitionBy("text_md5")
    stars = normalized.filter(
        F.col("norm_text").isNotNull() & (F.col("norm_text") != "")
    ).select("text_md5", "url")
    stars = (
        stars.withColumn("root", F.min("url").over(w))
        .filter(F.col("url") != F.col("root"))
        .select(
            F.col("root").alias("url_a"),
            F.col("url").alias("url_b"),
            F.col("text_md5").alias("block_key"),
            F.lit("exact").alias("strategy"),
        )
    )
    return stars


def lsh_blocks(normalized: DataFrame, cfg: BlockingConfig) -> DataFrame:
    """normalized_pages → (block_key, url) LSH band membership."""
    tokens = H.tokens_col(F.col("norm_text"))
    sh = H.shingle_hashes_col(tokens, cfg.shingle_size)
    sig = H.make_minhash_udf(cfg.num_hashes)(sh)
    bands = H.lsh_band_hashes_col(
        F.col("sig"), cfg.lsh_bands, cfg.num_hashes // cfg.lsh_bands
    )
    return (
        normalized.filter(F.col("norm_text").isNotNull() & (F.col("norm_text") != ""))
        .withColumn("sig", sig)
        .filter(F.col("sig").isNotNull())
        .select("url", F.explode(bands).alias("band_hash"))
        .select(F.col("band_hash").cast("string").alias("block_key"), "url")
    )


def split_oversized_blocks(
    members: DataFrame, cfg: BlockingConfig
) -> tuple[DataFrame, DataFrame]:
    """Bound block sizes: blocks ≤ max_block_size pass through; larger
    blocks are split by url-hash into ceil(size/max) sub-blocks, and
    each sub-block's representative (min url) joins a rep-level block
    so the pieces stay transitively connected.

    Returns (bounded_members, block_stats) where block_stats reports
    every split block (key, size, n_subblocks) — the no-silent-caps
    ledger.
    """
    counts = members.groupBy("block_key").agg(F.count("*").alias("block_size"))
    sized = members.join(counts, "block_key")

    small = sized.filter(F.col("block_size") <= cfg.max_block_size).select(
        "block_key", "url"
    )
    big = sized.filter(F.col("block_size") > cfg.max_block_size)

    n_sub = F.ceil(F.col("block_size") / cfg.max_block_size).cast("long")
    big_sub = big.withColumn(
        "sub", F.pmod(F.xxhash64("url"), n_sub).cast("string")
    ).withColumn("block_key", F.concat_ws("#", "block_key", "sub"))

    sub_members = big_sub.select("block_key", "url")
    reps = (
        big_sub.groupBy("block_key")
        .agg(F.min("url").alias("url"))
        .withColumn(
            "block_key",
            F.concat(F.lit("rep#"), F.element_at(F.split("block_key", "#"), 1)),
        )
        .select("block_key", "url")
    )
    stats = (
        big.groupBy("block_key")
        .agg(F.max("block_size").alias("block_size"))
        .withColumn(
            "n_subblocks",
            F.ceil(F.col("block_size") / cfg.max_block_size).cast("long"),
        )
    )
    return small.unionByName(sub_members).unionByName(reps), stats


def lsh_candidates(
    normalized: DataFrame, cfg: BlockingConfig
) -> tuple[DataFrame, DataFrame]:
    """MinHash-LSH candidate pairs + block-split stats."""
    members, stats = split_oversized_blocks(lsh_blocks(normalized, cfg), cfg)
    pairs = _pairs_within_blocks(members, "lsh")
    return pairs, stats


def candidate_pairs(
    normalized: DataFrame, cfg: BlockingConfig
) -> tuple[DataFrame, DataFrame]:
    """Union of blocking strategies, deduped on (url_a, url_b).

    The dedup is the one mandatory wide shuffle of the blocking stage
    (SURVEY.md §2.6) — UNION DISTINCT across strategies so a pair found
    by both exact and LSH scores once.  ``strategy`` keeps the
    highest-precision provenance (exact < lsh lexicographically — min
    picks 'exact' deterministically).
    """
    exact = exact_candidates(normalized)
    lsh, stats = lsh_candidates(normalized, cfg)
    pairs = (
        exact.unionByName(lsh)
        .groupBy("url_a", "url_b")
        .agg(
            F.min("strategy").alias("strategy"),
            F.min("block_key").alias("block_key"),
        )
        .select("url_a", "url_b", "block_key", "strategy")
    )
    return pairs, stats
