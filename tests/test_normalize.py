"""The per-row invariant (BASELINE.json input_hint): canonical text from
the distributed pandas-UDF path must be byte-identical to the pure-Python
reference implementation run driver-side on the same rows.

Mirrors the reference's normalizer unit tests
(/root/reference/tests/test_basic_mapping.py:20-23) plus the byte-parity
sweep SURVEY.md §5.2 requires."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_engine_spark.functions.normalize import (
    apply_aliases,
    canonical_text,
    canonical_text_udf,
    domain_col,
    extract_text,
    normalize_text,
    normalize_text_udf,
    url_domain,
)


def test_normalize_text_golden():
    # NFKD + combining strip + punct + collapse (reference name_normalizer.py:14-26)
    assert normalize_text("  Café—Nœud!!  ") == "cafe nœud"
    assert normalize_text("Álpha") == "alpha"  # combining acute
    assert normalize_text("ＦＵＬＬｗｉｄｔｈ") == "fullwidth"  # NFKD compat
    assert normalize_text("a,b;c.d") == "a b c d"
    assert normalize_text(None) == ""
    assert normalize_text("") == ""


def test_apply_aliases_reference_rule():
    # the reference's single alias rule (name_normalizer.py:9-11)
    assert apply_aliases("city fc") == "city football club"
    assert apply_aliases("fcx") == "fcx"  # word boundary respected


def test_extract_text_strips_markup():
    html = (
        b"<html><head><title>t</title><style>x{}</style></head>"
        b"<body><p>Hello &amp; goodbye</p><script>var a=1;</script></body></html>"
    )
    assert extract_text(html) == "Hello & goodbye"
    assert extract_text(None) == ""


def test_canonical_text_fallback_order():
    assert canonical_text(b"<p>from html</p>", "from text") == "from html"
    assert canonical_text(None, "  from   text ") == "from text"
    assert canonical_text(None, None) == ""


def test_url_domain_cases():
    assert url_domain("https://Sub.Example.org:8443/p/1?q=2") == "sub.example.org"
    assert url_domain("http://user@host.net/path") == "host.net"
    assert url_domain(None) == ""


def test_byte_identity_udf_vs_python(spark, synth_corpus):
    """Executor (pandas UDF) output == driver (pure Python) output,
    byte-for-byte, on every synthetic row — including null-html rows."""
    pages, _ = synth_corpus
    rows = (
        pages.select(
            "url",
            "html",
            "text",
            canonical_text_udf(F.col("html"), F.col("text")).alias("canon_udf"),
            normalize_text_udf(
                canonical_text_udf(F.col("html"), F.col("text"))
            ).alias("norm_udf"),
            domain_col(F.col("url")).alias("domain_jvm"),
        )
        .collect()
    )
    assert len(rows) == pages.count() > 0
    for r in rows:
        py_canon = canonical_text(bytes(r.html) if r.html is not None else None, r.text)
        assert r.canon_udf == py_canon, r.url
        assert r.norm_udf == normalize_text(py_canon), r.url
        assert r.domain_jvm == url_domain(r.url), r.url
