"""Survivorship merge + deterministic UES ids + lineage."""

from __future__ import annotations

import datetime as dt
import hashlib
import json

from pyspark.sql import functions as F

from entity_resolution_engine_spark.operators.merge import (
    merge_entities,
    source_lineage,
    ues_id,
)


def _ts(h):
    return dt.datetime(2020, 1, 1, h)


def _fixtures(spark):
    clusters = spark.createDataFrame(
        [("u1", "c1"), ("u2", "c1"), ("u3", "c1"), ("u9", "u9")],
        ["url", "cluster_id"],
    )
    normalized = spark.createDataFrame(
        [
            ("u1", "text one", "en", _ts(3)),
            ("u2", "text two", "en", _ts(1)),  # earliest → canonical
            ("u3", "text three", "en", _ts(2)),
            ("u9", "solo", "fr", _ts(5)),
        ],
        ["url", "canonical_text", "lang", "warc_ts"],
    )
    routed = spark.createDataFrame(
        [
            ("u1", "u2", 0.9, "approved"),
            ("u2", "u3", 0.7, "approved"),
            ("u1", "u3", 0.2, "rejected"),
        ],
        ["url_a", "url_b", "score", "routed_status"],
    )
    return clusters, normalized, routed


def test_survivorship_first_crawl_wins(spark):
    clusters, normalized, routed = _fixtures(spark)
    ents = {r.cluster_id: r for r in merge_entities(clusters, normalized, routed).collect()}
    assert len(ents) == 2
    c1 = ents["c1"]
    assert c1.canonical_url == "u2"
    assert c1.canonical_text == "text two"
    assert c1.member_count == 3
    assert c1.first_seen_ts == _ts(1) and c1.last_seen_ts == _ts(3)
    assert abs(c1.merge_confidence - 0.8) < 1e-9  # mean of approved 0.9, 0.7
    solo = ents["u9"]
    assert solo.member_count == 1 and solo.merge_confidence == 1.0


def test_ues_id_reference_construction(spark):
    # byte-parity with the reference's generate_ues_id (writer.py:13-16)
    df = spark.range(1).select(ues_id(F.lit("clusterX"), "page").alias("id"))
    want = "page-" + hashlib.md5(b"page-clusterX").hexdigest()[:8]
    assert df.collect()[0].id == want


def test_lineage_json_shape(spark):
    clusters, normalized, routed = _fixtures(spark)
    ents = merge_entities(clusters, normalized, routed).collect()
    lin = json.loads(next(e.lineage for e in ents if e.cluster_id == "c1"))
    assert lin["entity_type"] == "web_page"
    assert lin["n_sources_total"] == 3
    assert [s["id"] for s in lin["sources"]] == ["u1", "u2", "u3"]


def test_source_lineage_explosion(spark):
    clusters, _, _ = _fixtures(spark)
    rows = source_lineage(clusters).collect()
    assert len(rows) == 4
    assert {r.source_id for r in rows} == {"u1", "u2", "u3", "u9"}
    assert all(r.source_system == "web" for r in rows)
