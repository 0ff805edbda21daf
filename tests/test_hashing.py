"""MinHash / SimHash / winnowing determinism and statistical sanity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from entity_resolution_engine_spark.functions.hashing import (
    minhash_signatures,
    simhash64,
    winnow_fingerprint,
)


def _hashes(tokens: list[str]) -> list[int]:
    # any deterministic int64 per token works for these unit tests
    return [hash_stable(t) for t in tokens]


def hash_stable(t: str) -> int:
    import zlib

    return zlib.crc32(t.encode()) * 2654435761 % (2**63)


def test_minhash_estimates_jaccard():
    a = [f"tok{i}" for i in range(100)]
    b = [f"tok{i}" for i in range(20, 120)]  # true J = 80/120 ≈ 0.667
    sigs = minhash_signatures(
        pd.Series([_hashes(a), _hashes(b)], dtype="object"), num_hashes=256
    )
    sa, sb = np.array(sigs[0]), np.array(sigs[1])
    est = (sa == sb).mean()
    assert abs(est - 80 / 120) < 0.12


def test_minhash_empty_is_null():
    sigs = minhash_signatures(pd.Series([[], _hashes(["a"])], dtype="object"), 16)
    assert sigs[0] is None and sigs[1] is not None


def test_minhash_deterministic():
    s1 = minhash_signatures(pd.Series([_hashes(["x", "y"])], dtype="object"), 64)
    s2 = minhash_signatures(pd.Series([_hashes(["x", "y"])], dtype="object"), 64)
    assert s1 == s2


def test_simhash_similar_docs_close():
    base = [f"w{i}" for i in range(200)]
    mutated = base[:195] + ["zz1", "zz2", "zz3", "zz4", "zz5"]
    other = [f"v{i}" for i in range(200)]
    sigs = simhash64(
        pd.Series(
            [_hashes(base), _hashes(mutated), _hashes(other)], dtype="object"
        )
    )
    d_sim = bin(int(sigs[0]) ^ int(sigs[1]) & 0xFFFFFFFFFFFFFFFF).count("1")
    d_diff = bin((int(sigs[0]) ^ int(sigs[2])) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert d_sim < d_diff


def test_winnow_deterministic_and_shift_invariant_overlap():
    t = "the quick brown fox jumps over the lazy dog " * 4
    f1 = winnow_fingerprint(t)
    f2 = winnow_fingerprint(t)
    assert f1 == f2 and len(f1) > 0
    # a document containing the same long substring shares fingerprints
    f3 = winnow_fingerprint("PREFIX " + t + " SUFFIX")
    assert len(set(f1) & set(f3)) > 0
    assert winnow_fingerprint("") is None
    assert winnow_fingerprint("short", k=8) is None
