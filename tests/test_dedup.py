"""Dedup suite: exact, MinHash, SimHash, n-gram Jaccard, embedding
cosine — planted duplicates must be found."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_engine_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("lazy", "sleepy")  # 1-token change
    rows = [
        (1, base),
        (2, base),                       # exact dup of 1
        (3, near),                       # near dup of 1
        (4, "completely different text about spark dataframes and shuffles here"),
        (5, base),                       # exact dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicate_groups(docs):
    groups = DD.exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_copies == 3 and groups[0].keep_id == 1


def test_exact_dedup_survivors(docs):
    kept = sorted(r.doc_id for r in DD.exact_dedup(docs).collect())
    assert kept == [1, 3, 4]


def test_minhash_finds_planted_near_dups(docs):
    pairs = DD.minhash_near_duplicates(
        docs, shingle_size=2, num_hashes=128, bands=32, min_jaccard=0.5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got  # exacts
    assert (1, 3) in got  # near dup
    assert not any(4 in p for p in got)  # unrelated doc never pairs


def test_simhash_identical_zero_hamming(docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in DD.simhash_near_duplicates(docs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 5)] == 0


def test_ngram_jaccard_exact_is_one(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in DD.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_embedding_near_duplicates(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [
        (1, (base + 0.001 * rng.standard_normal(16)).tolist()),
        (2, (base + 0.001 * rng.standard_normal(16)).tolist()),
        (3, rng.standard_normal(16).tolist()),
        (4, (-base).tolist()),  # anti-correlated — never a near-dup
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = {(r.id_a, r.id_b): r.cosine for r in DD.embedding_near_duplicates(emb, dim=16, min_cosine=0.95, n_planes=6).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert all(p == (1, 2) for p in pairs)
