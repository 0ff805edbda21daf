"""Stage 3 — pairwise scoring.

Analog of the reference's weighted matcher score
(/root/reference/entity_resolution_engine/matchers/players_matcher.py:19-23,65-69),
re-expressed as: candidate pairs ⨝ normalized pages (twice, to fetch
both sides' match keys) → ONE Arrow-batched feature UDF producing all
four similarity features → logistic match score as a pure-JVM column
expression.  No per-row Python anywhere: the UDF is numpy-vectorized
over each Arrow batch (functions/similarity.py).

Scale notes: the two enrichment joins shuffle on the 8-byte uid
surrogate — the same key the blocking stage already grouped by, so
AQE coalesces well — and they are where the url strings re-attach to
the pairs (blocking ships integer ids only; see operators/blocking.py
round-5 byte-diet note).  The feature UDF sees only (norm_a, norm_b)
— Catalyst prunes every other column off the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ScoringConfig
from ..functions.similarity import pair_features_udf


def logistic_score(raw: F.Column, cfg: ScoringConfig) -> F.Column:
    """1 / (1 + e^(−scale·(raw − midpoint))) — the logistic squash the
    north_star requires, as a codegen'd JVM expression."""
    return 1.0 / (1.0 + F.exp(-cfg.logistic_scale * (raw - F.lit(cfg.logistic_midpoint))))


def score_pairs(
    candidates: DataFrame, normalized: DataFrame, cfg: ScoringConfig
) -> DataFrame:
    """(uid_a, uid_b, …) → schemas.SCORED_PAIRS (+ lang_a/lang_b
    carried for the router's conflict flags).  Output carries url_a/
    url_b (re-attached here from ``normalized`` via the uid join —
    the first point in the pipeline where pair rows pay string
    bytes)."""
    # The pairwise features run on a BOUNDED match key, not the full
    # document: the reference scores normalized NAMES (short keys —
    # players_matcher.py:19-23), and full-document similarity is
    # already the blocking stage's job (MinHash).  Truncating here (a)
    # keeps the character-quadratic Jaro-Winkler/Levenshtein batch
    # kernels O(key²) instead of O(doc²) per pair, and (b) cuts the
    # enrichment-join shuffle from ~KBs of text per pair side to
    # ≤ match_key_chars bytes — at 100 TB the join's byte volume, not
    # the Python, is the bill.
    key = F.substring(F.col("norm_text"), 1, cfg.match_key_chars)
    # full-document length travels as a cheap JVM long next to the
    # truncated key: length_ratio computed inside the UDF from the
    # truncated inputs saturates at 1.0 whenever both docs exceed
    # match_key_chars — exactly the long-document cases the
    # length_mismatch conflict flag exists for (round-2 ADVICE)
    side = normalized.select(
        F.xxhash64("url").alias("uid"), "url", key.alias("mk"),
        F.length("norm_text").alias("nlen"), "lang", "warc_ts"
    )
    a = side.select(
        F.col("uid").alias("uid_a"),
        F.col("url").alias("url_a"),
        F.col("mk").alias("norm_a"),
        F.col("nlen").alias("len_a"),
        F.col("lang").alias("lang_a"),
        F.col("warc_ts").alias("ts_a"),
    )
    b = side.select(
        F.col("uid").alias("uid_b"),
        F.col("url").alias("url_b"),
        F.col("mk").alias("norm_b"),
        F.col("nlen").alias("len_b"),
        F.col("lang").alias("lang_b"),
        F.col("warc_ts").alias("ts_b"),
    )
    enriched = candidates.join(a, "uid_a").join(b, "uid_b")
    # exact-strategy pairs are byte-identical on norm_text by
    # construction, so every feature is 1.0 — don't pay the Arrow
    # transfer + Python compute for a known answer.  Measured magnitude
    # (scripts/bench_champion_skip.py, BASELINE.md round 5): ~1.15x
    # block+score at 50%-exact-dup composition (common-crawl-style
    # mirrors), a no-op at the default synth corpus's 3% share — free
    # and semantics-free either way (pytest-pinned).  Nulling the UDF
    # inputs keeps the plan single-pass (no candidates re-scan per
    # strategy branch); the UDF sees "" for those rows and the features
    # are overridden by the constant below.
    # cfg.exact_skip_features=False routes exact pairs through the UDF
    # anyway (measurement mode — scripts/bench_champion_skip.py); the
    # final exact-pair score stays a forced 1.0 in both modes.
    is_exact = (F.col("strategy") == "exact") & F.lit(cfg.exact_skip_features)
    norm_a_in = F.when(~is_exact, F.col("norm_a"))
    norm_b_in = F.when(~is_exact, F.col("norm_b"))

    def _feat(name: str) -> F.Column:
        return F.when(is_exact, F.lit(1.0)).otherwise(F.col(f"f.{name}")).alias(name)

    # length_ratio comes from the FULL norm_text lengths (JVM columns),
    # not the UDF's truncated inputs — same min/max semantics as
    # similarity.length_ratio (0.0 when either side is empty)
    full_length_ratio = F.when(
        (F.col("len_a") > 0) & (F.col("len_b") > 0),
        F.least("len_a", "len_b").cast("double") / F.greatest("len_a", "len_b"),
    ).otherwise(F.lit(0.0))

    feats = enriched.withColumn(
        "f", pair_features_udf(norm_a_in, norm_b_in)
    ).select(
        "url_a",
        "url_b",
        "strategy",
        "lang_a",
        "lang_b",
        "ts_a",
        "ts_b",
        _feat("jaro_winkler"),
        _feat("token_jaccard"),
        _feat("levenshtein_sim"),
        F.when(is_exact, F.lit(1.0)).otherwise(full_length_ratio).alias(
            "length_ratio"
        ),
    )
    raw = (
        cfg.w_jaro_winkler * F.col("jaro_winkler")
        + cfg.w_token_jaccard * F.col("token_jaccard")
        + cfg.w_levenshtein * F.col("levenshtein_sim")
        + cfg.w_length_ratio * F.col("length_ratio")
    )
    scored = feats.withColumn(
        "score",
        F.when(F.col("strategy") == "exact", F.lit(1.0)).otherwise(
            logistic_score(raw, cfg)
        ),
    )
    return scored
