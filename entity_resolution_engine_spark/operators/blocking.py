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
- **lsh**: MinHash-LSH over word-shingles.  Token base-hashing is one
  flat JVM pass (``functions/hashing.py``); shingle folding, the
  signature, and band keys are ONE numpy-vectorized pandas UDF;
  candidate pairs come from a self-equi-join on the band key.

Skew handling ("no silent caps"): blocks larger than
``max_block_size`` are *split* deterministically by url-hash into
sub-blocks (all-pairs within each) and re-linked through their
per-sub-block representatives — connectivity is preserved for
clustering while per-block pair count stays bounded.  The split is
logged via an accumulator-free metrics DataFrame the pipeline persists
(stage metrics, north_rule's per-partition lineage/metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
        # every output re-aliased: the downstream union with
        # rep_star_edges (built from the SAME members frame) must not
        # share attribute ids across branches — Spark 4.1's union
        # constraint rewrite fails with `key not found` otherwise
        .select(
            F.col("url_a").alias("url_a"),
            F.col("url_b").alias("url_b"),
            F.col("block_key").alias("block_key"),
            F.lit(strategy).alias("strategy"),
        )
    )


def exact_candidates(normalized: DataFrame) -> DataFrame:
    """Exact-duplicate edges: star-to-min within each md5 block.

    Skew-safe shape: block minima come from a groupBy (partial
    aggregation combines map-side, so a 10^6-copy boilerplate page
    costs each task only one row) and members re-join on text_md5 with
    AQE skew-join splitting the hot key's shuffle partition.  The
    earlier window formulation sorted each md5 block inside ONE task —
    exactly the hot-key failure mode the north_rule calls out.  Emits
    nothing for singleton blocks.
    """
    members = normalized.filter(
        F.col("norm_text").isNotNull() & (F.col("norm_text") != "")
    ).select("text_md5", "url")
    roots = members.groupBy("text_md5").agg(
        F.min("url").alias("root"), F.count("*").alias("n")
    ).filter(F.col("n") > 1)
    return (
        members.join(roots, "text_md5")
        .filter(F.col("url") != F.col("root"))
        .select(
            F.col("root").alias("url_a"),
            F.col("url").alias("url_b"),
            F.col("text_md5").alias("block_key"),
            F.lit("exact").alias("strategy"),
        )
    )


def lsh_blocks(
    normalized: DataFrame,
    cfg: BlockingConfig,
    caches: list | None = None,
    champions: bool = True,
) -> DataFrame:
    """normalized_pages → (block_key, url) LSH band membership.

    Shingling/base-hashing is JVM; signature + banding is ONE fused
    pandas-UDF call (hashing.make_minhash_band_udf).  The band-array
    frame is persisted BEFORE the explode: ``explode(udf(...))`` makes
    Catalyst evaluate the Python UDF twice (one ArrowEvalPython per
    reference under the Generate — measured 2.5x on this stage), while
    exploding from the cache runs it exactly once.  ``explode`` of a
    null band array (empty doc) emits nothing, subsuming the null
    filter.

    Exact-duplicate texts enter the band join through ONE champion per
    text_md5: clones are already star-connected by exact_candidates,
    so banding each clone would re-find every intra-clone pair once per
    agreeing band — quadratic waste on a boilerplate-heavy web corpus
    (a 10^6-copy page would otherwise contribute 10^6 members to all
    48 of its band buckets).  The dedup groupBy runs on the POST-UDF
    doc-level rows (url, md5, 48-band array ≈ 0.4 KB) — identical
    texts have identical band arrays, the UDF runs once map-side, and
    neither document text nor the 48x-larger exploded membership is
    ever shuffled.  Clusters still form transitively: clone → champion
    (exact star) → near-dup neighbors (LSH).

    ``champions=False`` bands EVERY document instead: the champion
    dedup is only sound when exact_candidates supplies the
    clone→champion star alongside — in an lsh-ONLY strategy config the
    non-champion clones would otherwise get no candidate edges at all
    and silently become singletons (round-2 ADVICE).  candidate_pairs
    sets this from the strategy set."""
    tokens = H.tokens_col(F.col("norm_text"))
    th = H.token_hashes_col(tokens)
    band_udf = H.make_minhash_band_udf(
        cfg.num_hashes, cfg.lsh_bands, cfg.shingle_size
    )
    raw = normalized.filter(
        F.col("norm_text").isNotNull() & (F.col("norm_text") != "")
    ).select("url", "text_md5", *(["domain"] if cfg.compose_domain else []),
             band_udf(th).alias("band_arr"))
    cols = ["url"] + (["domain"] if cfg.compose_domain else [])
    if champions:
        champ_aggs = [
            F.min("url").alias("url"),
            F.first("band_arr").alias("band_arr"),  # identical across the md5 group
        ]
        if cfg.compose_domain:
            champ_aggs.append(F.min_by("domain", "url").alias("domain"))
        banded = raw.groupBy("text_md5").agg(*champ_aggs).select(
            *cols, "band_arr"
        ).persist()
    else:
        banded = raw.select(*cols, "band_arr").persist()
    if caches is not None:
        caches.append(banded)
    exploded = banded.select(*cols, F.explode("band_arr").alias("band_hash"))
    if cfg.compose_domain:
        # composite blocking key (north_star): domain + LSH band
        key = F.concat_ws("|", F.col("domain"), F.col("band_hash").cast("string"))
    else:
        key = F.col("band_hash").cast("string")
    return exploded.select(key.alias("block_key"), "url")


def split_oversized_blocks(
    members: DataFrame, cfg: BlockingConfig
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bound block sizes: blocks ≤ max_block_size pass through; larger
    blocks are split by url-rank round-robin into ceil(size/max)
    sub-blocks (named ``<base>#<i>`` — '#' never occurs in band or md5
    keys).  Connectivity across the pieces is restored by
    ``rep_star_edges`` over the bounded membership: a star (not an
    all-pairs rep block) keeps the bound — a 10^6-copy page with max=64
    yields ~15 625 reps; all-pairs over them would be ~1.2e8 pairs from
    ONE block, while the star adds exactly n_subblocks-1 edges
    (connectivity is all the clustering stage needs, mirroring
    exact_candidates).

    Returns (bounded_members, block_stats):
    - bounded_members: (block_key, url), every block ≤ max_block_size
    - block_stats reports every split block (key, size, n_subblocks) —
      the no-silent-caps ledger.

    Skew-aware plan: block sizes come from a partial-aggregated
    groupBy; only OVERSIZED keys (a tiny set — the Zipf head) are
    broadcast back, so the overwhelming singleton/small majority of
    members passes through with NO sort and NO wide join.  Sub-block
    assignment is ``xxhash64(url) % n_sub`` — url-global, windowless:
    a pair of urls that co-occurs in MANY oversized buckets (48 LSH
    bands all hot for the same page family) lands in the same sub-index
    everywhere, so the cross-band pair union dedups to ~one band's
    worth instead of re-slicing per band (the earlier rank round-robin
    emitted ~88% of all-pairs across bands for a 600-doc family).  The
    per-sub-block size bound is probabilistic (Poisson around
    max_block_size) — AQE's skew split absorbs the tail.
    """
    hot = F.broadcast(
        members.groupBy("block_key")
        .agg(F.count("*").alias("block_size"))
        .filter(F.col("block_size") > cfg.max_block_size)
    )
    tagged = members.join(hot, "block_key", "left")

    small = tagged.filter(F.col("block_size").isNull()).select(
        F.col("block_key").cast("string").alias("block_key"), "url"
    )
    n_sub = F.ceil(F.col("block_size") / cfg.max_block_size).cast("long")
    sub_members = tagged.filter(F.col("block_size").isNotNull()).select(
        F.concat_ws(
            "#",
            F.col("block_key").cast("string"),
            F.pmod(F.xxhash64("url"), n_sub),
        ).alias("block_key"),
        "url",
    )
    stats = hot.select(
        F.col("block_key").cast("string").alias("block_key"),
        "block_size",
        F.ceil(F.col("block_size") / cfg.max_block_size).cast("long").alias(
            "n_subblocks"
        ),
    )
    return small.unionByName(sub_members), stats


def rep_star_edges(bounded_members: DataFrame) -> DataFrame:
    """Star edges re-linking a split block's sub-blocks through their
    representatives: for each base key, every sub-block's min url points
    at the global min.  Computed FROM the bounded membership (which the
    caller has persisted) — sub-block keys are ``<base>#<i>``, so two
    small aggregations over the (rare) split rows suffice.  An earlier
    formulation derived these from the pre-split frame and recomputed
    the whole 10M-row explode + hot-count shuffle twice per action —
    measured 30s for zero output rows at 250k pages."""
    split = bounded_members.filter(F.col("block_key").contains("#")).select(
        F.regexp_replace("block_key", r"#\d+$", "").alias("base_key"),
        "block_key",
        "url",
    )
    reps = split.groupBy("base_key", "block_key").agg(F.min("url").alias("rep"))
    # roots from the membership directly (min of sub-mins == block min);
    # deriving them from `reps` makes the join self-referencing, which
    # trips Spark 4.1's union constraint rewrite (key not found: dst#N)
    roots = split.groupBy("base_key").agg(F.min("url").alias("root"))
    return (
        reps.join(roots, "base_key")
        .filter(F.col("rep") != F.col("root"))
        .select(
            F.col("root").alias("url_a"),  # root is the min rep: a < b holds
            F.col("rep").alias("url_b"),
            F.concat(F.lit("rep#"), F.col("base_key")).alias("block_key"),
            F.lit("lsh").alias("strategy"),
        )
    )


def lsh_candidates(
    normalized: DataFrame,
    cfg: BlockingConfig,
    caches: list | None = None,
    champions: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """MinHash-LSH candidate pairs + block-split stats.

    Both the size-count join and the pair self-join reference their
    input twice; without materialization Catalyst would re-run the
    whole signature UDF once per branch (4x the Python cost).  The band
    membership is tiny relative to the corpus (url + band hash), so
    persisting it is the cheap side of that trade — the cluster-scale
    pipeline additionally snapshots candidates to the catalog between
    stages.  ``caches`` (when given) collects every frame persisted
    here so the caller can unpersist once candidates are materialized —
    otherwise the caches outlive the blocking stage and pressure
    executor storage across pipeline runs."""
    blocks = lsh_blocks(
        normalized, cfg, caches, champions=champions
    )  # persists pre-explode internally
    members, stats = split_oversized_blocks(blocks, cfg)
    members = members.persist()
    if caches is not None:
        caches.append(members)
    pairs = _pairs_within_blocks(members, "lsh").unionByName(
        rep_star_edges(members)  # reads the cache — tiny split-only aggs
    )
    return pairs, stats


def candidate_pairs(
    normalized: DataFrame, cfg: BlockingConfig, caches: list | None = None
) -> tuple[DataFrame, DataFrame]:
    """Union of blocking strategies, deduped on (url_a, url_b).

    The dedup is the one mandatory wide shuffle of the blocking stage
    (SURVEY.md §2.6) — UNION DISTINCT across strategies so a pair found
    by both exact and LSH scores once.  ``strategy`` keeps the
    highest-precision provenance (exact < lsh lexicographically — min
    picks 'exact' deterministically).
    """
    parts = []
    stats = None
    if "exact" in cfg.strategies:
        parts.append(exact_candidates(normalized))
    if "lsh" in cfg.strategies:
        # champion-per-md5 banding is only sound when the exact star
        # edges accompany it; lsh-only configs must band every doc
        lsh, stats = lsh_candidates(
            normalized, cfg, caches, champions="exact" in cfg.strategies
        )
        parts.append(lsh)
    if not parts:
        raise ValueError(f"no known blocking strategies in {cfg.strategies!r}")
    if stats is None:  # exact-only: empty split ledger, same schema
        stats = normalized.sparkSession.createDataFrame(
            [], "block_key string, block_size long, n_subblocks long"
        )
    if len(parts) == 1:
        if "lsh" in cfg.strategies:
            # a pair can surface from several band buckets — dedup it
            return parts[0].dropDuplicates(["url_a", "url_b"]), stats
        # exact star edges are unique by construction — no shuffle
        return parts[0], stats
    pairs = (
        parts[0].unionByName(parts[1])
        .groupBy("url_a", "url_b")
        .agg(
            F.min("strategy").alias("strategy"),
            F.min("block_key").alias("block_key"),
        )
        .select("url_a", "url_b", "block_key", "strategy")
    )
    return pairs, stats
