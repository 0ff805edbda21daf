"""Benchmark decontamination + cross-corpus dedup + term stats.

Oracle strategy: tiny hand-computable corpora pin exact semantics
(gram clamping, hash-mode parity, normalization keying, tie-breaks);
the sf0.01 contract rows (ngram_decontaminate, exact_dedup_against,
corpus_term_stats, tfidf_top_terms) value-check at scale vs DuckDB.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from entity_resolution_engine_spark.operators.decontam import (
    exact_dedup_against,
    ngram_decontaminate,
)
from entity_resolution_engine_spark.operators.terms import (
    corpus_term_stats,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox sat still"),  # shares 'the quick brown fox'
        (3, "entirely different words here now"),
        (4, "short"),  # < n tokens: one clamped gram
        (5, "   "),  # empty after tokenize: excluded
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench_set(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox is a benchmark sentence")],
        ["doc_id", "text"],
    )


class TestNgramDecontaminate:
    def test_flags_shared_grams_only(self, corpus, bench_set):
        out = ngram_decontaminate(corpus, bench_set, n=4).collect()
        by_id = {r.doc_id: r for r in out}
        assert set(by_id) == {1, 2, 3, 4}  # doc 5 tokenizes empty
        # docs 1,2 share the 4-gram 'the quick brown fox'
        assert by_id[1].is_contaminated and by_id[1].n_contaminated >= 1
        assert by_id[2].is_contaminated
        assert not by_id[3].is_contaminated and by_id[3].n_contaminated == 0
        # doc 4 has one clamped gram ('short'), not in the benchmark
        assert by_id[4].n_grams == 1 and not by_id[4].is_contaminated

    def test_gram_counts_and_ratio(self, corpus, bench_set):
        out = {r.doc_id: r for r in ngram_decontaminate(corpus, bench_set, n=4).collect()}
        # doc 1: 9 tokens -> 6 grams, all distinct
        assert out[1].n_grams == 6
        assert out[1].contamination == round(out[1].n_contaminated / 6, 6)

    def test_hash_mode_parity(self, corpus, bench_set):
        """xxhash64 byte-diet mode returns the identical frame."""
        a = ngram_decontaminate(corpus, bench_set, n=4, gram_hash="none")
        b = ngram_decontaminate(corpus, bench_set, n=4, gram_hash="xxhash64")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_threshold(self, corpus, bench_set):
        out = {
            r.doc_id: r
            for r in ngram_decontaminate(corpus, bench_set, n=4, threshold=0.9).collect()
        }
        # contamination ratios are well below 0.9 -> nothing flagged
        assert not any(r.is_contaminated for r in out.values())
        # but the counts are unchanged
        assert out[1].n_contaminated >= 1

    def test_bad_hash_mode(self, corpus, bench_set):
        with pytest.raises(ValueError):
            ngram_decontaminate(corpus, bench_set, gram_hash="sha999")


class TestExactDedupAgainst:
    def test_normalized_anti_join(self, spark):
        corpus = spark.createDataFrame(
            [(1, "Hello World"), (2, "  hello world  "), (3, "unique text")],
            ["doc_id", "text"],
        )
        ref = spark.createDataFrame([(9, "HELLO WORLD")], ["doc_id", "text"])
        out = exact_dedup_against(corpus, ref)
        assert [r.doc_id for r in out.collect()] == [3]
        # corpus schema preserved, no helper column leaks
        assert out.columns == ["doc_id", "text"]

    def test_disjoint_reference_is_identity(self, spark):
        corpus = spark.createDataFrame([(1, "a b c"), (2, "d e f")], ["doc_id", "text"])
        ref = spark.createDataFrame([(9, "zz")], ["doc_id", "text"])
        assert exact_dedup_against(corpus, ref).count() == 2


class TestTermStats:
    def test_df_cf_and_order(self, spark):
        docs = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "apple cherry"), (3, "banana banana")],
            ["doc_id", "text"],
        )
        rows = corpus_term_stats(docs, top_k=10).collect()
        assert [(r.token, r.df, r.cf) for r in rows] == [
            ("apple", 2, 3),
            ("banana", 2, 3),
            ("cherry", 1, 1),
        ]

    def test_top_k_limit(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f")], ["doc_id", "text"]
        )
        assert corpus_term_stats(docs, top_k=3).count() == 3


class TestTfidf:
    def test_scores_and_ranks(self, spark):
        docs = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "banana cherry")],
            ["doc_id", "text"],
        )
        out = {(r.doc_id, r.token): r for r in tfidf_top_terms(docs, k=2).collect()}
        n = 2
        idf = lambda df_: math.log((n + 1) / (df_ + 1)) + 1.0
        # doc 1: apple tf=2 df=1, banana tf=1 df=2
        assert out[(1, "apple")].tfidf == pytest.approx(round(2 * idf(1), 6))
        assert out[(1, "apple")].rank == 1
        assert out[(1, "banana")].rank == 2
        # doc 2: cherry (df=1) outscores banana (df=2) despite equal tf
        assert out[(2, "cherry")].rank == 1
        assert out[(2, "banana")].rank == 2

    def test_token_tie_break(self, spark):
        docs = spark.createDataFrame([(1, "zed alpha")], ["doc_id", "text"])
        rows = sorted(tfidf_top_terms(docs, k=2).collect(), key=lambda r: r.rank)
        # equal tf and df -> equal tfidf -> token asc breaks the tie
        assert [r.token for r in rows] == ["alpha", "zed"]
