"""URL canonicalization (functions/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_engine_spark.functions.urls import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [
        r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]


def test_canonicalize_url_rules(spark):
    got = _canon(
        spark,
        [
            # fragment + default port + case + tracking + param order
            "HTTPS://Ex1.EXAMPLE.com:443/a/b/?utm_source=x&b=2&a=1#frag",
            "https://ex1.example.com/a/b?a=1&b=2",
            "http://Host.COM:80/",
            "http://host.com:8080/x",          # non-default port kept
            "https://h.com/p?fbclid=abc&gclid=g&ref=r&z=9",
            "https://h.com/p?",                 # empty query
            "not a url at all",                 # passthrough
            "ftp://Files.EXAMPLE.com:21/pub/",  # non-http scheme: port kept
        ],
    )
    assert got[0] == got[1] == "https://ex1.example.com/a/b?a=1&b=2"
    assert got[2] == "http://host.com"
    assert got[3] == "http://host.com:8080/x"
    assert got[4] == "https://h.com/p?z=9"
    assert got[5] == "https://h.com/p"
    assert got[6] == "not a url at all"
    assert got[7] == "ftp://files.example.com:21/pub"


def test_canonicalize_idempotent(spark):
    urls = [
        "HTTPS://A.B.com:443/x/?utm_medium=m&k=v#z",
        "http://plain.org/path?b=1&a=2",
    ]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice
