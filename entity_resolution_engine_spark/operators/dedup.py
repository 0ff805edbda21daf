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
from ..sources.readers import fan_out

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
# bounded bucket self-join (shared by the LSH-style candidate paths)
# ---------------------------------------------------------------------------

def bounded_bucket_pairs(
    members: DataFrame,
    max_bucket_size: int = 2000,
    stats_out: list | None = None,
    count_matches: bool = False,
    caches: list | None = None,
    dedup_pairs: bool = True,
) -> DataFrame:
    """(bucket, id) membership → deduped candidate (id_a < id_b) pairs,
    with hot buckets split into bounded sub-buckets.

    Same scale discipline as blocking.split_oversized_blocks: a hot
    bucket (e.g. thousands of identical boilerplate docs sharing every
    band, or a degenerate shingle) would otherwise produce O(k²) pairs.
    Buckets ≤ max_bucket_size self-join directly; larger buckets are
    split by an id-GLOBAL hash (``xxhash64(id) % n_sub``) into
    ceil(k/(0.8·max)) sub-buckets (all-pairs within each) and the
    sub-bucket minima are star-linked so downstream clustering still
    sees cross-sub-bucket connectivity.  The hash assignment (vs the
    earlier per-bucket rank round-robin) means a pair co-occurring in
    MANY hot buckets lands in the same sub-index everywhere —
    cross-bucket pair unions dedup to ~one bucket's worth, and
    band-agreement counts (``count_matches``) aren't downward-biased
    by re-slicing.  The bound is PROBABILISTIC, not hard (ADVICE r3):
    hash assignment makes sub-bucket sizes binomial around k/n_sub, so
    n_sub is sized with 0.8 headroom — the mean sits at 0.8·max and an
    overshoot past max is a ≥4σ event for max ≥ 500 (σ = √(k/n_sub)),
    negligible versus the old round-robin's exact-but-resliced cut.
    No sort anywhere: the long tail passes untouched, hot buckets pay
    two aggregations.  ``stats_out`` (a list, when given) receives the
    split ledger DataFrame (bucket, bucket_size, n_subbuckets) — the
    no-silent-caps record for callers that materialize it.

    ``count_matches`` returns (id_a, id_b, n_buckets) where n_buckets
    counts GENUINE shared buckets only — artificial rep-star links are
    attached with ``n_buckets = NULL`` (a sentinel: connectivity-only
    pairs with no measurable agreement), never mixed into the count.

    ``caches`` (when given) collects every frame persisted here so the
    caller can unpersist after materializing; without it the persist
    still happens (the membership is referenced by 3+ plan branches)
    but lives until the caller clears the cache."""
    members = members.persist()
    if caches is not None:
        caches.append(members)
    hot = F.broadcast(
        members.groupBy("bucket")
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )
    tagged = members.join(hot, "bucket", "left")
    small = tagged.filter(F.col("bucket_size").isNull()).select(
        F.col("bucket").cast("string").alias("bucket"), "id"
    )
    big = tagged.filter(F.col("bucket_size").isNotNull())
    # 0.8 headroom: see the probabilistic-bound note in the docstring
    n_sub = F.ceil(F.col("bucket_size") / (0.8 * max_bucket_size)).cast("long")
    sub_tagged = big.select(
        F.col("bucket").cast("string").alias("base"),
        F.concat_ws(
            "#",
            F.col("bucket").cast("string"),
            F.pmod(F.xxhash64(F.col("id")), n_sub),
        ).alias("bucket"),
        "id",
    )
    sub = sub_tagged.select("bucket", "id")
    # star links: each sub-bucket's min id points at the base bucket's
    # global min (min of sub-mins) — n_sub−1 edges per hot bucket
    reps = sub_tagged.groupBy("base", "bucket").agg(F.min("id").alias("rep"))
    roots = big.groupBy(
        F.col("bucket").cast("string").alias("base")
    ).agg(F.min("id").alias("root"))
    rep_pairs = (
        reps.join(roots, "base")
        .filter(F.col("rep") != F.col("root"))
        .select(F.col("root").alias("id_a"), F.col("rep").alias("id_b"))
    )
    if stats_out is not None:
        stats_out.append(
            hot.select(
                F.col("bucket").cast("string").alias("bucket"),
                "bucket_size",
                F.ceil(F.col("bucket_size") / (0.8 * max_bucket_size))
                .cast("long")
                .alias("n_subbuckets"),
            )
        )
    bounded = small.unionByName(sub)
    a = bounded.select("bucket", F.col("id").alias("id_a"))
    b = bounded.select("bucket", F.col("id").alias("id_b"))
    raw = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    if count_matches:
        # (id_a, id_b, n_buckets): how many buckets the pair GENUINELY
        # shares — the count falls out of the dedup shuffle the
        # candidates already pay.  Rep-star links join anti against the
        # counted set (reusing its (id_a, id_b) exchange) and attach
        # with a NULL sentinel count.
        counted = raw.groupBy("id_a", "id_b").agg(
            F.count("*").cast("int").alias("n_buckets")
        )
        rep_only = rep_pairs.join(
            counted.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
        ).withColumn("n_buckets", F.lit(None).cast("int"))
        return counted.unionByName(rep_only)
    if not dedup_pairs:
        # round 6: callers that verify-filter the candidates down by
        # orders of magnitude (the ngram paths: 8.2M candidates → 2.5k
        # survivors at sf1.0) skip the full-width pair-dedup exchange
        # here and dedup AFTER their filter instead — a pair surfacing
        # from k shared buckets costs k cheap verify evaluations in
        # place of one corpus-scale (id_a, id_b) shuffle.  Callers MUST
        # dedup downstream; k is bounded by the band count.
        return raw.unionByName(rep_pairs)
    return raw.unionByName(rep_pairs).dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_signatures(
    documents: DataFrame,
    shingle_size: int,
    num_hashes: int,
    id_col: str,
    text_col: str,
    caches: list | None,
) -> DataFrame:
    """(id, sig) MinHash signatures, persisted (the band explode and
    any signature re-join both reference this frame)."""
    # single-row-group inputs otherwise run the signature UDF on one
    # core (round 6; see readers.fan_out)
    documents = fan_out(documents)
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    th = H.token_hashes_col(tokens)
    sig = (
        documents.select(F.col(id_col).alias("id"), th.alias("th"))
        .withColumn(
            "sig", H.make_minhash_udf(num_hashes, shingle_size)(F.col("th"))
        )
        .filter(F.col("sig").isNotNull())
        .select("id", "sig")
        .persist()
    )
    if caches is not None:
        caches.append(sig)
    return sig


def minhash_near_duplicates(
    documents: DataFrame,
    shingle_size: int = 2,
    num_hashes: int = 192,
    bands: int = 48,
    min_jaccard: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 2000,
    estimator: str = "bands",
    caches: list | None = None,
) -> DataFrame:
    """(id_a, id_b, est_jaccard) for near-duplicate pairs.

    Two estimators:

    - ``"bands"`` (default — the 100 TB path): est_jaccard derives from
      the number of agreeing LSH bands, k of b, via the band-collision
      model P(band agrees) = J^rows ⇒ Ĵ = (k/b)^(1/rows).  The count
      falls out of the dedup shuffle the candidates already pay, so NO
      payload ever re-joins — round 1 shipped 2×num_hashes-long
      signature arrays per pair here.  At J=0.8 with 48×4 banding the
      estimate's σ ≈ 0.035, comparable to a 96-position signature
      prefix.  Rep-star links from hot-bucket splitting surface with
      ``est_jaccard = NULL`` (connectivity-only sentinel — they carry
      no band-agreement signal and are deliberately NOT filtered, so
      downstream clustering keeps cross-sub-bucket connectivity).
    - ``"signature"``: the classic unbiased fraction-of-agreeing-
      positions estimate (σ ≈ 0.029 at J=0.8, 192 hashes); costs two
      joins shipping the signature arrays per pair.  Use when estimate
      precision matters more than shuffle volume.

    For an exact (oracle-checkable) similarity per pair, use
    ``minhash_verified_near_duplicates``."""
    rows = num_hashes // bands
    sig = _minhash_signatures(
        documents, shingle_size, num_hashes, id_col, text_col, caches
    )
    # Band join carries ONLY ids — the wide signature arrays stay out
    # of the band-duplicate shuffle in both estimator modes.
    bands_df = sig.select(
        "id",
        F.explode(H.lsh_band_hashes_col(F.col("sig"), bands, rows)).alias("bucket"),
    )
    if estimator == "bands":
        pairs = bounded_bucket_pairs(
            bands_df,
            max_bucket_size=max_bucket_size,
            count_matches=True,
            caches=caches,
        )
        est = F.pow(
            F.least(F.col("n_buckets"), F.lit(bands)).cast("double") / bands,
            1.0 / rows,
        )
        return (
            pairs.withColumn("est_jaccard", est)
            .filter(
                (F.col("est_jaccard") >= min_jaccard)
                | F.col("n_buckets").isNull()
            )
            .select("id_a", "id_b", "est_jaccard")
        )
    if estimator != "signature":
        raise ValueError(f"unknown estimator {estimator!r}")
    pair_ids = bounded_bucket_pairs(
        bands_df, max_bucket_size=max_bucket_size, caches=caches
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


def minhash_verified_near_duplicates(
    documents: DataFrame,
    shingle_size: int = 2,
    num_hashes: int = 192,
    bands: int = 48,
    min_jaccard: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 2000,
    caches: list | None = None,
    champion_expansion: bool | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) near-duplicate pairs with EXACT shingle
    Jaccard: MinHash-LSH generates the candidates (ids only through the
    band shuffle), then the distinct word-shingle sets join back and
    ``array_intersect``/``array_union`` compute the true Jaccard — pure
    JVM, no estimate.

    Precision is 1.0 by construction (every emitted pair is exactly
    verified); recall is the LSH band recall — at min_jaccard 0.8 with
    48 bands × 4 rows, P(miss) = (1 − J⁴)⁴⁸ ≈ 1e-11, i.e. ≈ 1.  This
    makes the output equal to the full all-pairs Jaccard join with
    near-certainty, which is what lets a DuckDB all-pairs oracle
    value-check the whole signature→band→bucket-join pipeline
    (__spark_entry__.py ``minhash_near_dup``); any gap *measures* LSH
    recall rather than hiding it.  At scale the verify join ships one
    distinct-gram array per doc side — bounded by doc length, and only
    for candidate pairs (linear-ish), never all pairs.

    Round-6 shape (same output): ONE fused Arrow kernel
    (``make_minhash_band_gram_udf``) shingles each doc once and emits
    both the 48 LSH band keys and the DISTINCT shingle-hash set, so
    the corpus is tokenized/shingled once instead of twice (the verify
    side previously rebuilt STRING shingles through interpreted
    slice/concat HOFs) and no 192-long signature column ever
    materializes.  Band keys are the FNV fold the blocking stage uses
    (``make_minhash_band_udf`` semantics — minima over the distinct
    stream equal minima over the raw stream); band-hash family changes
    only move LSH recall within the same 1-(1-J^rows)^bands bound the
    docstring above pins (≈1e-11 miss at τ=0.8), exactly like the
    fast-ngram path's documented equivalence.  The verify join ships
    int64 shingle hashes and applies the _verified_jaccard_pairs
    economies (size-ratio prefilter, union-by-sizes); hashed-shingle
    jaccard equals string-shingle jaccard absent 64-bit fold
    collisions.

    Champion-per-distinct-text factoring (round 6, exact-duplicate-
    heavy corpora — the common-crawl mirror shape the planted bench
    corpus models): docs sharing ``lower(text)`` have IDENTICAL gram
    sets and band arrays, so one champion per distinct text carries the
    group through the UDF, the band self-join, and the verify, and the
    group's members re-expand afterwards — intra-group pairs at exact
    jaccard 1.0 (i = |A| = |B| ⇒ 1.0, the same double the verify
    computes), cross-group pairs inherit the champion pair's jaccard
    (identical gram sets ⇒ identical value).  On a 50%-clone corpus
    this halves UDF and membership volume and collapses the 2×2
    candidate variants per cross pair to one.  Because equal texts have
    equal band ARRAYS, the expanded output is exactly the per-doc
    banding's output whenever no group is large enough to trip the
    hot-bucket splitter; the expansion therefore only runs when
    max group size ≤ max_bucket_size/2 (driver-checked on the tiny
    group ledger) — oversized-clone corpora keep the per-doc banding
    whose bounded-bucket star semantics are the documented cap.
    ``champion_expansion`` overrides the gate (True/False) — test hook
    pinning branch equality (tests/test_dedup.py)."""
    documents = fan_out(documents)  # round 6: see readers.fan_out
    bg_udf = H.make_minhash_band_gram_udf(num_hashes, bands, shingle_size)

    d0 = documents.select(
        F.col(id_col).alias("id"), F.lower(F.col(text_col)).alias("lt")
    )
    groups = (
        d0.groupBy(F.md5("lt").alias("gk"))
        .agg(
            F.min("id").alias("cid"),
            F.first("lt").alias("lt"),  # identical within the group
            F.array_sort(F.collect_list("id")).alias("ids"),
            F.count("*").alias("gsz"),
        )
        .persist()
    )
    if caches is not None:
        caches.append(groups)
    if champion_expansion is None:
        gmax = groups.agg(F.max("gsz")).collect()[0][0] or 0
        champion_expansion = gmax <= max_bucket_size // 2

    if not champion_expansion:
        # clone groups big enough to interact with the hot-bucket
        # splitter: keep per-doc banding (bounded-bucket semantics)
        side = d0
    else:
        side = groups.select(F.col("cid").alias("id"), "lt")

    tokens = H.tokens_col(F.col("lt"))
    docs = side.select("id", H.token_hashes_col(tokens).alias("th")).filter(
        F.size("th") > 0
    )
    docs = docs.select("id", bg_udf("th").alias("bg")).select(
        "id",
        F.col("bg.bands").alias("bands"),
        F.col("bg.grams").alias("grams"),
        F.size("bg.grams").alias("ng"),
    )
    # referenced 3x (band explode + both verify joins) — persist or the
    # Python UDF re-evaluates per reference
    docs = docs.persist()
    if caches is not None:
        caches.append(docs)
    bands_df = docs.select("id", F.explode("bands").alias("bucket"))
    pair_ids = bounded_bucket_pairs(
        bands_df, max_bucket_size=max_bucket_size, caches=caches
    )
    verified = _verified_jaccard_pairs(pair_ids, docs, min_jaccard)
    if not champion_expansion:
        return verified

    # --- expand champion-level pairs back to member pairs ---------------
    # non-empty groups: those whose champion survived the th filter
    gne = groups.join(
        docs.select(F.col("id").alias("cid")), "cid"
    )
    # intra-group: all (i < j) member pairs at exact jaccard 1.0; ids
    # are sorted, so slicing after each position keeps id_a < id_b —
    # a narrow array expression, no join
    pairs_arr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    intra = (
        gne.filter(F.col("gsz") > 1)
        .select(F.explode(pairs_arr).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # cross-group: each champion pair expands over both member lists;
    # member ids interleave across groups, so re-orient with
    # least/greatest (groups are disjoint — no x == y)
    ga = groups.select(F.col("cid").alias("id_a"), F.col("ids").alias("ids_a"))
    gb = groups.select(F.col("cid").alias("id_b"), F.col("ids").alias("ids_b"))
    cross = (
        verified.join(ga, "id_a")
        .join(gb, "id_b")
        .select(F.explode("ids_a").alias("xa"), "ids_b", "jaccard")
        .select("xa", F.explode("ids_b").alias("xb"), "jaccard")
        .select(
            F.least("xa", "xb").alias("id_a"),
            F.greatest("xa", "xb").alias("id_b"),
            "jaccard",
        )
    )
    return intra.unionByName(cross)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-doc SimHash over token hashes.

    ``hash_mode``: ``xxhash64`` (production — full 64-bit signatures)
    or ``md5_60`` (SQL-parity twin: token hash = first 15 hex chars of
    md5, a 60-bit value DuckDB reproduces exactly, so the signature —
    sign-of-sum per bit — is reproducible as 60 SQL aggregates and the
    whole near-dup query becomes oracle-checkable; bits 60–63 of the
    signature are structurally 0).  Same aggregation either way —
    the md5 twin value-checks the sign-sum/bit-pack machinery the
    production path shares."""
    if hash_mode not in ("xxhash64", "md5_60"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    documents = fan_out(documents)  # round 6: see readers.fan_out
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    sigs = documents.select(F.col(id_col).alias("id"), tokens.alias("tk"))
    # empty docs all share the zero signature and would pair off at
    # hamming 0 — keep them out of the near-dup universe (mirrored in
    # the DuckDB oracle's len(toks) > 0 filter)
    sigs = sigs.filter(F.size("tk") > 0)
    if hash_mode == "xxhash64":
        th = F.transform(F.col("tk"), lambda t: F.xxhash64(t))
    else:
        th = F.transform(
            F.col("tk"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        )
    return sigs.withColumn("simhash", H.simhash_udf(th)).drop("tk")


def simhash_near_duplicates(
    documents: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 2000,
    caches: list | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with Hamming(simhash) ≤ max_hamming.

    Blocking by the pigeonhole/block-permutation scheme (Manku et al.,
    WWW'07 — public): split the signature bits into (max_hamming+1)
    blocks; any pair within distance max_hamming agrees exactly on at
    least one block, so candidates = equi-join per block.  Hamming
    distance is then verified with bit_count(xor) — pure JVM.  Empty
    docs are excluded (they would all collide at hamming 0).

    ``hash_mode='md5_60'`` is the SQL-parity twin (60-bit signatures,
    4×15-bit blocks at the default max_hamming) — the driver's DuckDB
    oracle reproduces it bit-for-bit; ``xxhash64`` stays the
    production path."""
    # the block self-join references the signature frame on BOTH sides —
    # without persist Catalyst evaluates the simhash pandas UDF twice
    # (same pitfall as lsh_blocks; caller/bench clears the cache)
    sigs = simhash_signatures(documents, id_col, text_col, hash_mode).persist()
    if caches is not None:
        caches.append(sigs)
    nblocks = max_hamming + 1
    nbits = 60 if hash_mode == "md5_60" else 64
    width = nbits // nblocks
    # the LAST block absorbs the remainder bits when nblocks does not
    # divide nbits — otherwise nbits % nblocks high bits would be
    # covered by no block and a pair differing only there would break
    # the <= max_hamming pigeonhole recall guarantee (ADVICE r4; both
    # shipped configs 64/4 and 60/4 divide exactly, so this is purely
    # defensive for other max_hamming values)
    def _block_width(i: int) -> int:
        return width if i < nblocks - 1 else nbits - (nblocks - 1) * width
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(
                    F.lit((1 << _block_width(i)) - 1)
                ).alias("block_val"),
            )
            for i in range(nblocks)
        ]
    )
    # ids-only through the candidate shuffle (bounded buckets), then
    # re-attach the two 64-bit signatures for the Hamming verify
    exploded = sigs.select(
        "id", F.explode(blocks).alias("b")
    ).select(
        F.concat_ws(
            "|", F.col("b.block_idx").cast("string"), F.col("b.block_val").cast("string")
        ).alias("bucket"),
        "id",
    )
    pair_ids = bounded_bucket_pairs(
        exploded, max_bucket_size=max_bucket_size, caches=caches
    )
    pairs = pair_ids.join(
        sigs.select(F.col("id").alias("id_a"), F.col("simhash").alias("sim_a")), "id_a"
    ).join(
        sigs.select(F.col("id").alias("id_b"), F.col("simhash").alias("sim_b")), "id_b"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# shared exact-Jaccard verify over distinct gram-hash sets
# ---------------------------------------------------------------------------

def _verified_jaccard_pairs(
    pair_ids: DataFrame,
    docs: DataFrame,
    min_jaccard: float,
    dedup_out: bool = False,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs → (id_a, id_b, jaccard ≥ τ), exact.

    ``docs`` carries (id, grams: array<long> DISTINCT gram hashes,
    ng: |grams| ≥ 1).  Three round-6 verify economies, all
    value-preserving:

    - size-ratio prefilter: i ≤ min(|A|,|B|) and u ≥ max(|A|,|B|), so
      J ≤ min/max — pairs failing min ≥ τ·max can never reach τ and
      skip the intersect entirely (the dominant verify cost when LSH
      candidates outnumber survivors 1000:1).  The threshold carries a
      1e-9 relative slack so double rounding can only ADMIT borderline
      pairs (the exact filter below still decides them), never drop
      one.
    - union by sizes: |A∪B| = |A|+|B|−|A∩B| for distinct-element
      arrays — no array_union build per pair.
    - int64 gram hashes instead of gram strings: integer set intersect,
      and the pair join ships 8 B per gram."""
    pairs = pair_ids.join(
        docs.select(
            F.col("id").alias("id_a"),
            F.col("grams").alias("grams_a"),
            F.col("ng").alias("na"),
        ),
        "id_a",
    ).join(
        docs.select(
            F.col("id").alias("id_b"),
            F.col("grams").alias("grams_b"),
            F.col("ng").alias("nb"),
        ),
        "id_b",
    )
    ratio_ok = F.least("na", "nb").cast("double") >= (
        F.lit(min_jaccard) * F.greatest("na", "nb").cast("double") * (1.0 - 1e-9)
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    scored = pairs.filter(ratio_ok).select(
        "id_a", "id_b", inter.alias("i"), "na", "nb"
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    out = (
        scored.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )
    if dedup_out:
        # partner of bounded_bucket_pairs(dedup_pairs=False): the
        # candidate stream carries one row per shared bucket, and
        # jaccard is a pure function of the pair, so deduping the
        # (tiny) SURVIVOR set here yields exactly the pair-deduped
        # result at a fraction of the shuffle width
        out = out.dropDuplicates(["id_a", "id_b"])
    return out


# ---------------------------------------------------------------------------
# n-gram Jaccard (md5 DuckDB-oracle-parity path)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.4,
    num_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 2000,
    caches: list | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard within min-gram-hash blocks.

    Blocking: ``num_bands`` single-row MinHash bands over the gram set,
    computed as min(md5(salt || gram)) — md5 so the DuckDB oracle can
    reproduce the exact same buckets (SQL-parity path).  A pair with
    Jaccard J shares ≥1 band with probability 1-(1-J)^num_bands
    (≥ 0.98 at J = 0.4, num_bands = 8).

    Round-6 shape (same output): gram construction + the md5 banding
    run in ONE Arrow-batched UDF (``make_md5_gram_bands_udf`` — the
    interpreted per-gram HOF md5 chain measured ~11.5s of the query at
    sf1.0, hashlib is sub-second for the identical bytes; band buckets
    byte-identical, so the candidate set is unchanged).  The verify
    join ships DISTINCT gram md5-prefix int64s instead of gram
    strings; jaccard = i / (|A| + |B| − i) over them — equal to the
    string-gram jaccard absent 64-bit md5-prefix collisions (the
    documented fast-path equivalence standard), with |A|+|B|−i
    replacing the array_union build and an exact size-ratio prefilter
    (J ≤ min/max) skipping the intersect for pairs that cannot reach
    min_jaccard — at sf1.0 the bands produce 8.2M candidates of which
    2.5k survive, so the prefilter is where the verify time goes."""
    documents = fan_out(documents)  # round 6: see readers.fan_out
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    # empty/whitespace-only docs would all share the '' gram and pair
    # off at jaccard 1.0 — drop them before banding (mirrored in the
    # DuckDB oracle; the UDF returns null for them, matching)
    docs = documents.select(F.col(id_col).alias("id"), tokens.alias("toks")).filter(
        F.size("toks") > 0
    )
    gb_udf = H.make_md5_gram_bands_udf(n, num_bands)
    docs = docs.select("id", gb_udf("toks").alias("gb")).select(
        "id",
        F.col("gb.grams").alias("grams"),
        F.size("gb.grams").alias("ng"),
        F.col("gb.bands").alias("bands"),
    )
    # referenced 3x (band explode + both pair joins) — persist or
    # Catalyst re-evaluates the Python UDF per reference
    docs = docs.persist()
    if caches is not None:
        caches.append(docs)
    # bucket byte diet: the band STRING ("b|<32 hex>", ~35 B) only needs
    # its equality classes for the self-join — xxhash64 folds it to an
    # 8 B long (a 2^-64 bucket-string collision merely merges two
    # buckets' candidate lists, which the exact verify then filters; an
    # output change additionally needs the spurious pair to clear the
    # jaccard threshold — the same negligible-collision standard as the
    # gram hashes).  Pair dedup is deferred past the verify filter
    # (dedup_pairs=False / dedup_out=True): candidates outnumber
    # survivors ~3000:1 here, so the wide (id_a, id_b) exchange moves
    # to the 2.5k-row survivor set.
    exploded = docs.select(
        "id",
        F.explode(
            F.transform("bands", lambda b: F.xxhash64(b))
        ).alias("bucket"),
    )
    pair_ids = bounded_bucket_pairs(
        exploded, max_bucket_size=max_bucket_size, caches=caches,
        dedup_pairs=False,
    )
    return _verified_jaccard_pairs(pair_ids, docs, min_jaccard, dedup_out=True)


def ngram_jaccard_pairs_fast(
    documents: DataFrame,
    n: int = 3,
    min_jaccard: float = 0.4,
    num_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int = 2000,
    caches: list | None = None,
) -> DataFrame:
    """Production variant of ``ngram_jaccard_pairs`` — identical
    semantics (exact token-n-gram Jaccard within min-gram-hash blocks),
    with all per-gram hashing fused into ONE Arrow-batched pandas UDF
    (``make_gram_bands_udf``): token xxhash64 stays a flat JVM pass,
    then gram folding + per-row dedup + ``num_bands`` salted band
    minima run vectorized in numpy.  The SQL-parity path's interpreted
    md5-per-gram HOF expressions (num_bands salts × every gram, hex
    strings) are the cost this removes; blocking recall is the same
    1-(1-J)^num_bands and the final Jaccard filter is exact either way
    (array_intersect/array_union over the distinct gram-hash sets —
    equal to string-gram Jaccard absent 64-bit collisions), so both
    variants return the same pairs UP TO LSH BLOCKING RECALL: the two
    paths use different band hash functions, so a borderline pair
    (J barely above min_jaccard) can be blocked by one and missed by
    the other with probability up to (1-J)^num_bands (~1.7% at J=0.4,
    8 bands); on pairs well above the S-curve knee the outputs are
    identical.  Pytest (and the `ngram_fast_parity_diff` contract
    query) pin sf-scale equality on the test corpus, whose near-dup
    pairs sit far above the knee; the md5 path remains the
    DuckDB-oracle query."""
    documents = fan_out(documents)  # round 6: see readers.fan_out
    tokens = H.tokens_col(F.lower(F.col(text_col)))
    docs = documents.select(
        F.col(id_col).alias("id"), H.token_hashes_col(tokens).alias("th")
    ).filter(F.size("th") > 0)
    gb_udf = H.make_gram_bands_udf(n, num_bands)
    docs = docs.select("id", gb_udf("th").alias("gb")).select(
        "id",
        F.col("gb.grams").alias("grams"),
        F.size("gb.grams").alias("ng"),
        F.col("gb.bands").alias("bands"),
    )
    # the UDF output is referenced 3x (band explode + both pair joins)
    # — persist or Catalyst re-evaluates the Python UDF per reference
    docs = docs.persist()
    if caches is not None:
        caches.append(docs)
    exploded = docs.select("id", F.explode("bands").alias("bucket"))
    # round-6 verify economies (size-ratio prefilter, union-by-sizes,
    # deferred pair dedup past the verify filter): see
    # _verified_jaccard_pairs — grams here are already distinct int64
    # hashes, so jaccard values are unchanged
    pair_ids = bounded_bucket_pairs(
        exploded, max_bucket_size=max_bucket_size, caches=caches,
        dedup_pairs=False,
    )
    return _verified_jaccard_pairs(pair_ids, docs, min_jaccard, dedup_out=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup (LSH-bucketed scale path)
# ---------------------------------------------------------------------------

_HYPERPLANE_SEED = 0xA11CE


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def srp_band_params(
    min_cosine: float,
    target_recall: float = 0.95,
    max_bands: int = 32,
    max_planes: int = 16,
) -> tuple[int, int]:
    """(planes_per_band, n_bands) for OR-amplified SRP LSH.

    Per Charikar (STOC'02), two vectors at angle θ agree on one
    hyperplane sign with p = 1 − θ/π.  An AND-only bucket of r planes
    has recall p^r — at min_cosine 0.35 and r = 8 that is ~2%, which is
    the round-1 recall bug.  OR-amplification over b band tables gives
    recall 1 − (1 − p^r)^b at the threshold; this picks the LARGEST r
    (most selective buckets → smallest candidate blocks) whose required
    b = ln(1−target)/ln(1−p^r) still fits max_bands."""
    p = 1.0 - float(np.arccos(np.clip(min_cosine, -1.0, 1.0))) / np.pi
    for r in range(max_planes, 0, -1):
        miss = 1.0 - p**r
        if miss <= 0.0:
            return r, 1
        b = int(np.ceil(np.log(1.0 - target_recall) / np.log(miss)))
        if b <= max_bands:
            return r, max(b, 1)
    return 1, max_bands


def make_srp_bands_udf(dim: int, planes_per_band: int, n_bands: int):
    """embedding → array of n_bands bucket ids: ONE matmul against all
    n_bands·planes_per_band hyperplanes per Arrow batch, sign bits
    packed per band, band index mixed in so buckets never collide
    across bands."""
    planes = _hyperplanes(dim, n_bands * planes_per_band)
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)
    band_offsets = np.arange(n_bands, dtype=np.int64) << np.int64(planes_per_band)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def srp_bands_udf(emb: pd.Series) -> pd.Series:
        mat = np.stack(
            [
                np.asarray(e, dtype=np.float64) if e is not None else np.zeros(dim)
                for e in emb
            ]
        )
        signs = (mat @ planes.T) > 0  # (n, b*r)
        bits = signs.reshape(len(mat), n_bands, planes_per_band) @ weights
        buckets = bits.astype(np.int64) + band_offsets
        return pd.Series(list(buckets))

    return srp_bands_udf


def cosine_sim_col(a: F.Column, b: F.Column, dim: int | None = None) -> F.Column:
    """Cosine similarity over two array<double> columns — pure JVM, no
    Python.

    With ``dim`` given (round 6), the fold is UNROLLED into a flat
    left-associated chain of element_at multiply-adds — whole-stage
    codegen'd, unlike the interpreted higher-order ``aggregate`` /
    ``zip_with`` lambdas (measured ~18µs per 64-dim cosine interpreted;
    the unrolled form is ~an order cheaper).  The chain adds terms in
    the same index order with the same 0.0 seed, so results are
    BIT-IDENTICAL to the fold (IEEE-754 addition in identical order) —
    pinned by the ann_bruteforce/ann_ivf/embedding_near_dup oracle hash
    matches.  Callers must guarantee arrays have exactly ``dim``
    elements (element_at past the end yields NULL → NULL cosine).
    Without ``dim`` the original fold form is used."""
    if dim is None:
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
        return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
    dot = F.lit(0.0)
    sa = F.lit(0.0)
    sb = F.lit(0.0)
    for i in range(1, dim + 1):
        ai = F.element_at(a, i)
        bi = F.element_at(b, i)
        dot = dot + ai * bi
        sa = sa + ai * ai
        sb = sb + bi * bi
    na = F.sqrt(sa)
    nb = F.sqrt(sb)
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def embedding_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    min_cosine: float = 0.95,
    planes_per_band: int | None = None,
    n_bands: int | None = None,
    target_recall: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 2000,
    caches: list | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ min_cosine.

    Candidates come from OR-amplified SRP LSH: b band tables of r
    hyperplane-sign bits each (auto-sized from min_cosine via
    ``srp_band_params`` for ≥ target_recall at the threshold, unless
    given explicitly); a pair qualifies as a candidate if it shares ANY
    band bucket, mirroring ``minhash_near_duplicates``.  Every
    candidate is then verified with the exact JVM cosine, so precision
    is 1.0 — the LSH only bounds recall, and the (r, b) choice bounds
    that at target_recall.  Candidate generation ships ids only; the
    dim-sized vectors join back for the verify step."""
    if planes_per_band is None or n_bands is None:
        planes_per_band, n_bands = srp_band_params(min_cosine, target_recall)
    srp = make_srp_bands_udf(dim, planes_per_band, n_bands)
    embeddings = fan_out(embeddings)  # round 6: see readers.fan_out
    vecs = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("buckets", srp(F.col("v"))).persist()
    if caches is not None:
        caches.append(vecs)
    members = vecs.select("id", F.explode("buckets").alias("bucket")).select(
        "bucket", "id"
    )
    pair_ids = bounded_bucket_pairs(
        members, max_bucket_size=max_bucket_size, caches=caches
    )
    pairs = pair_ids.join(
        vecs.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a"
    ).join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b")
    return (
        pairs.withColumn("cosine", cosine_sim_col(F.col("v_a"), F.col("v_b"), dim=dim))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
