"""Deduplication suite for large-scale training-data pipelines.

Five dedup families over a ``documents``-shaped table
(doc_id, text, lang, source, n_chars), each usable standalone and each
exposed as a driver-contract query (__spark_entry__.py):

- **exact**        — md5-groupBy; JVM only, one shuffle.
- **MinHash+LSH**  — shingle → signature → band → bucket-join
                     (shares functions/hashing.py with the ER pipeline).
- **SimHash**      — 64-bit signature; near-dups = identical signature
                     or Hamming ≤ k via the block-permutation trick
                     (split the 64 bits into k+1 blocks; duplicates
                     agree exactly on ≥1 block — pigeonhole).
- **n-gram Jaccard** — token n-gram arrays + pure-JVM
                     array_intersect/array_union similarity within
                     length-bucketed blocks.
- **embedding cosine** — near-dup pairs by cosine ≥ τ, bucketed by
                     random-hyperplane signs (the scale path; the
                     brute-force baseline lives in operators/ann.py).

All blocking follows the same scale discipline as the ER pipeline:
never an unblocked self-join; pairs always satisfy id_a < id_b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from ..functions import hashing as H

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_duplicate_groups(documents: DataFrame) -> DataFrame:
    """md5(text) groups with >1 member: (text_md5, n_copies, keep_id).

    keep_id is the minimal doc_id — the deterministic survivor."""
    return (
        documents.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """One survivor (min doc_id) per distinct text — a window argmin,
    no join."""
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        documents.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_near_duplicates(
    documents: DataFrame,
    shingle_size: int = 2,
    num_hashes: int = 192,
    bands: int = 48,
    min_jaccard: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, est_jaccard) for near-duplicate pairs.

    est_jaccard is the MinHash estimate (fraction of agreeing signature
    positions) — unbiased, cheap, already materialized.  Candidates
    come from LSH band buckets; the estimate then filters to
    ≥ min_jaccard."""
    rows = num_hashes // bands
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    th = H.token_hashes_col(tokens)
    sig = (
        documents.select(F.col(id_col).alias("id"), th.alias("th"))
        .withColumn(
            "sig", H.make_minhash_udf(num_hashes, shingle_size)(F.col("th"))
        )
        .filter(F.col("sig").isNotNull())
        .select("id", "sig")
    )
    # Band join carries ONLY ids — deduping (id_a, id_b) before
    # re-attaching signatures keeps the wide signature arrays out of
    # the band-duplicate shuffle (a pair found by many bands would
    # otherwise ship its 2×num_hashes longs once per band).
    sig = sig.persist()
    bands_df = sig.select(
        "id",
        F.explode(H.lsh_band_hashes_col(F.col("sig"), bands, rows)).alias("band"),
    )
    a = bands_df.select(F.col("band"), F.col("id").alias("id_a"))
    b = bands_df.select(F.col("band"), F.col("id").alias("id_b"))
    pair_ids = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = pair_ids.join(
        sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(
        sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b"
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.size("sig_a")
    )
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    token_hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    return documents.select(
        F.col(id_col).alias("id"), token_hashes.alias("th")
    ).withColumn("simhash", H.simhash_udf(F.col("th"))).drop("th")


def simhash_near_duplicates(
    documents: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Blocking by the pigeonhole/block-permutation scheme (Manku et al.,
    WWW'07 — public): split 64 bits into (max_hamming+1) blocks; any
    pair within distance max_hamming agrees exactly on at least one
    block, so candidates = equi-join per block.  Hamming distance is
    then verified with bit_count(xor) — pure JVM."""
    sigs = simhash_signatures(documents, id_col, text_col)
    nblocks = max_hamming + 1
    width = 64 // nblocks
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                    F.lit((1 << width) - 1)
                ).alias("block_val"),
            )
            for i in range(nblocks)
        ]
    )
    exploded = sigs.select(
        "id", "simhash", F.explode(blocks).alias("b")
    ).select("id", "simhash", "b.block_idx", "b.block_val")
    a = exploded.select(
        "block_idx",
        "block_val",
        F.col("id").alias("id_a"),
        F.col("simhash").alias("sim_a"),
    )
    b = exploded.select(
        "block_idx",
        "block_val",
        F.col("id").alias("id_b"),
        F.col("simhash").alias("sim_b"),
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (pure JVM — DuckDB-oracle-parity path)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.4,
    num_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-n-gram Jaccard within min-gram-hash blocks.

    Blocking: ``num_bands`` single-row MinHash bands over the gram set,
    computed as min(md5(salt || gram)) — md5 so the DuckDB oracle can
    reproduce the exact same buckets (SQL-parity path).  A pair with
    Jaccard J shares ≥1 band with probability 1-(1-J)^num_bands
    (≥ 0.98 at J = 0.4, num_bands = 8), and the buckets are
    content-selective — unlike length bucketing, unrelated documents
    almost never collide, so the block self-join stays near-linear.
    Similarity is array_intersect/array_union — fully JVM codegen."""
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    docs = documents.select(F.col(id_col).alias("id"), tokens.alias("toks"))
    ngrams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size("toks") - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
        )
    )
    docs = docs.withColumn("grams", ngrams)
    bands = F.array(
        *[
            F.concat(
                F.lit(f"{b}|"),
                F.array_min(
                    F.transform(
                        F.col("grams"), lambda g, _b=b: F.md5(F.concat(F.lit(f"s{_b}|"), g))
                    )
                ),
            )
            for b in range(num_bands)
        ]
    )
    exploded = docs.select("id", "grams", F.explode(bands).alias("bucket"))
    docs = docs.persist()
    a = exploded.select("bucket", F.col("id").alias("id_a"))
    b = exploded.select("bucket", F.col("id").alias("id_b"))
    pair_ids = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = pair_ids.join(
        docs.select(F.col("id").alias("id_a"), F.col("grams").alias("grams_a")),
        "id_a",
    ).join(
        docs.select(F.col("id").alias("id_b"), F.col("grams").alias("grams_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        pairs.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH-bucketed scale path)
# ---------------------------------------------------------------------------

_HYPERPLANE_SEED = 0xA11CE


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def make_srp_udf(dim: int, n_planes: int = 12):
    """Signed-random-projection bucket id (Charikar, STOC'02 — public):
    sign pattern of n_planes dot products → integer bucket."""

    planes = _hyperplanes(dim, n_planes)

    @F.pandas_udf(T.LongType())
    def srp_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(
            [
                np.asarray(e, dtype=np.float64)
                if e is not None
                else np.zeros(dim)
                for e in emb
            ]
        )
        signs = (mat @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs @ weights).astype(np.int64))

    return srp_udf


def cosine_sim_col(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity over two array<double> columns — pure JVM
    (aggregate + zip_with), no Python."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    min_cosine: float = 0.95,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ min_cosine, candidates
    bucketed by SRP sign pattern.  n_planes trades recall (hyperplane
    cuts between near-identical vectors are rare: P(cut) = θ/π per
    plane) against bucket size."""
    srp = make_srp_udf(dim, n_planes)
    vecs = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("bucket", srp(F.col("v")))
    a = vecs.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = vecs.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_sim_col(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
