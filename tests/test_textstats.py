"""Text analysis operators: token counting, quality, language ID,
fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_engine_spark.operators import textstats as TS


def _profile(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return {r.doc_id: r for r in TS.document_profile(df).collect()}


def test_token_counts(spark):
    p = _profile(spark, ["one two  three", "hello, world! (x=1)"])
    assert p[0].n_ws_tokens == 3
    # BPE-ish: hello , world ! ( x = 1 ) → 9
    assert p[1].n_bpe_tokens == 9


def test_quality_score_bounds_and_ordering(spark):
    clean = "the quick brown fox jumps over the lazy dog " * 8
    noisy = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    p = _profile(spark, [clean, noisy])
    assert 0.0 <= p[1].quality_score < p[0].quality_score <= 1.0
    assert p[0].stopword_ratio > 0
    assert p[1].punct_ratio > p[0].punct_ratio


def test_language_prediction(spark):
    p = _profile(
        spark,
        [
            "the cat and the dog sat in the house of the king",
            "le chat et les chiens est pour la maison du roi",
            "el perro y el gato que vive en la casa por un rey",
            "der hund und die katze ist von den haus mit für auf",
            "xyzzy plugh qwerty",  # no markers anywhere
        ],
    )
    assert p[0].pred_lang == "en"
    assert p[1].pred_lang == "fr"
    assert p[2].pred_lang == "es"
    assert p[3].pred_lang == "de"
    assert p[4].pred_lang == "und"


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "some reasonably long text for fingerprinting " * 3), (2, "x")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in TS.document_fingerprints(df).collect()}
    assert rows[1].fingerprints and len(rows[1].fingerprints) > 0
    assert rows[2].fingerprints is None  # shorter than k


def test_quality_quantiles_exact_and_sketch(spark):
    """exact mode returns actual observed quality scores at the
    SQL-standard percentile_disc positions; sketch mode
    (approx_percentile, the 100 TB single-pass path) must agree within
    t-digest tolerance and share the output shape."""
    texts = [f"{'word ' * (5 + 3 * i)}the and is" for i in range(40)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    exact = TS.quality_quantiles(df).collect()
    approx = TS.quality_quantiles(df, exact=False).collect()
    assert len(exact) == len(approx) > 0
    scores = {
        r.doc_id: r.quality_score for r in TS.document_profile(df).collect()
    }
    observed = set(scores.values())
    ex = {(r.lang, r.p): r.quantile for r in exact}
    ap = {(r.lang, r.p): r.quantile for r in approx}
    for key, q in ex.items():
        assert q in observed          # discrete quantile is a real value
        assert abs(ap[key] - q) <= 0.1
    # monotone in p within each lang
    for lang in {r.lang for r in exact}:
        qs = [q for (lg, p), q in sorted(ex.items()) if lg == lang]
        assert qs == sorted(qs)
