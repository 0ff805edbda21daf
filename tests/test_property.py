"""Property-based tests (hypothesis) over the pure-Python single-source
implementations — the same code the executors run inside pandas UDFs."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_engine_spark.functions.normalize import (
    canonical_text,
    extract_text,
    normalize_text,
    url_domain,
)
from entity_resolution_engine_spark.functions.similarity import (
    JW_PREFIX_CHARS,
    batch_jaro_winkler,
    jaro_winkler,
    levenshtein,
    levenshtein_similarity,
    token_jaccard,
    token_sort_ratio,
)

TEXT = st.text(max_size=200)
SMALL_TEXT = st.text(max_size=40)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_normalize_output_charset(s):
    out = normalize_text(s)
    # no leading/trailing/double spaces; never uppercase ASCII
    assert out == " ".join(out.split())
    assert not any("A" <= c <= "Z" for c in out)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_extract_text_total_on_arbitrary_bytes(b):
    out = extract_text(b)
    assert isinstance(out, str)
    assert out == " ".join(out.split())


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200) | st.none(), TEXT | st.none())
def test_canonical_text_total(h, t):
    assert isinstance(canonical_text(h, t), str)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_url_domain_total_and_lower(u):
    d = url_domain(u)
    assert d == d.lower()


@settings(max_examples=150, deadline=None)
@given(SMALL_TEXT, SMALL_TEXT)
def test_jw_symmetric_bounds(a, b):
    x = jaro_winkler(a, b)
    assert 0.0 <= x <= 1.0
    assert math.isclose(x, jaro_winkler(b, a), abs_tol=1e-12)
    if a and a == b:
        assert x == 1.0


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(SMALL_TEXT, SMALL_TEXT), min_size=1, max_size=20))
def test_batch_jw_matches_scalar_property(pairs):
    got = batch_jaro_winkler([a for a, _ in pairs], [b for _, b in pairs])
    for (a, b), g in zip(pairs, got):
        want = jaro_winkler(a[:JW_PREFIX_CHARS], b[:JW_PREFIX_CHARS])
        assert math.isclose(g, want, abs_tol=1e-12), (a, b)


TOKS = st.lists(st.text(alphabet="abcd", min_size=1, max_size=4), max_size=15)


@settings(max_examples=150, deadline=None)
@given(TOKS, TOKS)
def test_levenshtein_metric_properties(ta, tb):
    d = levenshtein(ta, tb)
    assert d == levenshtein(tb, ta)
    assert d >= abs(len(ta) - len(tb))
    assert d <= max(len(ta), len(tb))
    s = levenshtein_similarity(ta, tb)
    assert 0.0 <= s <= 1.0


@settings(max_examples=150, deadline=None)
@given(TOKS, TOKS)
def test_jaccard_bounds_symmetry(ta, tb):
    j = token_jaccard(ta, tb)
    assert 0.0 <= j <= 1.0
    assert j == token_jaccard(tb, ta)
    if ta:
        assert token_jaccard(ta, ta) == 1.0


@settings(max_examples=100, deadline=None)
@given(SMALL_TEXT, SMALL_TEXT)
def test_token_sort_ratio_order_invariant(a, b):
    ab = f"{a} {b}".strip()
    ba = f"{b} {a}".strip()
    if ab and ba:
        assert math.isclose(
            token_sort_ratio(ab, ba), token_sort_ratio(ba, ab), abs_tol=1e-12
        )
        assert token_sort_ratio(ab, ba) == 1.0


def test_flagship_invariant_to_partitioning(spark, synth_corpus):
    """Cluster assignments must be a pure function of the DATA, not of
    physical layout: same corpus resolved with the test session's
    default layout vs a hostile repartition (13 input partitions,
    7 shuffle partitions) must produce identical (url, cluster_id,
    n_members) rows.  This is the single-box stand-in for 'the answer
    does not change when the cluster topology does' — every operator in
    the chain (normalize, exact+LSH blocking, scoring, routing,
    large/small-star CC) must be deterministic under reshuffling."""
    from entity_resolution_engine_spark.plans.flagship import resolve_documents

    pages, _ = synth_corpus
    # doc_id must stay documents-table-sized (timestamp_seconds in
    # documents_as_pages overflows on xxhash64-scale longs) and must
    # NOT come from monotonically_increasing_id (partition-dependent —
    # exactly what this test forbids)
    docs = pages.selectExpr(
        "pmod(xxhash64(url), 1000000007L) as doc_id",
        "text",
        "lang",
        "'prop' as source",
        "length(text) as n_chars",
    )
    baseline = resolve_documents(spark, docs).orderBy("url").collect()

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        hostile = resolve_documents(
            spark, docs.repartition(13)
        ).orderBy("url").collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    assert baseline == hostile
