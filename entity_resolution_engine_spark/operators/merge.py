"""Stage 6 — survivorship merge + lineage.

Analog of the reference's merger layer
(/root/reference/entity_resolution_engine/merger/teams_merge.py:9-48 —
coalesce-based survivorship; ues_writer/writer.py:13-16 — deterministic
md5 entity ids; lineage/lineage_builder.py:4-19 — fixed lineage shape;
writer.py:39-43 — lineage explosion into source_lineage rows).

Survivorship rule for web pages: the canonical record is the member
with the earliest warc_ts (ties broken by url) — "first crawl wins",
the analog of the reference's alpha-preferred coalesce.  One window
pass computes the canonical pick, member stats, and confidence.

Lineage stays a typed struct column through the plan and serializes
with ``to_json`` only at the sink boundary (SURVEY.md §1.2 JSONB rule);
member lists inside the JSON are capped with an explicit
``n_sources_total`` so huge clusters can't blow a row (no silent caps —
the count says what was dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LINEAGE_SAMPLE = 32  # max source urls embedded per entity's lineage JSON


def ues_id(cluster_id_col: F.Column, prefix: str = "page") -> F.Column:
    """Deterministic entity key — same construction as the reference's
    generate_ues_id (writer.py:13-16): '{prefix}-{md5(seedstr)[:8]}'."""
    return F.concat(
        F.lit(prefix),
        F.lit("-"),
        F.substring(F.md5(F.concat_ws("-", F.lit(prefix), cluster_id_col)), 1, 8),
    )


def merge_entities(
    clusters: DataFrame, normalized: DataFrame, routed: DataFrame
) -> DataFrame:
    """(url, cluster_id) ⨝ normalized pages → one canonical entity row
    per cluster (schemas.ENTITIES)."""
    members = clusters.join(
        normalized.select("url", "canonical_text", "lang", "warc_ts"), "url"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.asc("warc_ts"), F.asc("url"))
    ranked = members.withColumn("rk", F.row_number().over(w))

    # mean approved-edge score per cluster = merge confidence
    conf = (
        routed.filter(F.col("routed_status") == "approved")
        .join(
            clusters.select(
                F.col("url").alias("url_a"), F.col("cluster_id")
            ),
            "url_a",
        )
        .groupBy("cluster_id")
        .agg(F.avg("score").alias("merge_confidence"))
    )

    stats = ranked.groupBy("cluster_id").agg(
        F.count("*").cast("int").alias("member_count"),
        F.min("warc_ts").alias("first_seen_ts"),
        F.max("warc_ts").alias("last_seen_ts"),
        F.slice(F.sort_array(F.collect_list("url")), 1, _LINEAGE_SAMPLE).alias(
            "source_urls"
        ),
    )
    canonical = ranked.filter(F.col("rk") == 1).select(
        "cluster_id",
        F.col("url").alias("canonical_url"),
        "canonical_text",
        "lang",
    )
    entities = (
        canonical.join(stats, "cluster_id")
        .join(conf, "cluster_id", "left")
        .withColumn("merge_confidence", F.coalesce("merge_confidence", F.lit(1.0)))
        .withColumn("ues_entity_id", ues_id(F.col("cluster_id")))
        .withColumn(
            "lineage",
            F.to_json(
                F.struct(
                    F.transform(
                        F.col("source_urls"),
                        lambda u: F.struct(
                            F.lit("web").alias("source"), u.alias("id")
                        ),
                    ).alias("sources"),
                    F.col("member_count").alias("n_sources_total"),
                    F.col("merge_confidence").alias("confidence"),
                    F.lit("web_page").alias("entity_type"),
                )
            ),
        )
        .select(
            "ues_entity_id",
            "cluster_id",
            "canonical_url",
            "canonical_text",
            "lang",
            "first_seen_ts",
            "last_seen_ts",
            "member_count",
            "merge_confidence",
            "lineage",
        )
    )
    return entities


def source_lineage(clusters: DataFrame) -> DataFrame:
    """One row per (entity, source url) — the reference's
    source_lineage explosion (writer.py:39-43) without the JSON
    round-trip: derived straight from the assignment table, so it is
    complete even when the embedded lineage JSON is sampled."""
    return clusters.select(
        ues_id(F.col("cluster_id")).alias("ues_entity_id"),
        F.lit("web").alias("source_system"),
        F.col("url").alias("source_id"),
    )
