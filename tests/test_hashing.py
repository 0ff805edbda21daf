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


def test_chunked_kernels_bit_identical_to_dense():
    """The round-5 cache-blocked inner loops (minhash + simhash) must
    reproduce the un-blocked DRAM-streaming forms bit for bit, across
    ragged batches that straddle chunk boundaries (rows longer than the
    chunk, empty rows, singleton rows)."""
    from entity_resolution_engine_spark.functions import hashing as H

    rng = np.random.default_rng(42)
    lengths = np.concatenate(
        [
            rng.poisson(50, 300),
            [0, 1, 0],
            [int(H._CHUNK_ELEMS + 1000)],  # one row longer than a chunk
            rng.poisson(5, 50),
        ]
    ).astype(np.int64)
    flat = rng.integers(0, 2**63, size=int(lengths.sum()), dtype=np.uint64)

    # dense reference (the pre-round-5 form, verbatim)
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    a, b = H._minhash_params(24)
    ref = np.full((n, 24), H._EMPTY_SENTINEL, dtype=np.uint64)
    nonempty = lengths > 0
    starts = offsets[:-1][nonempty]
    for k in range(24):
        imgs = flat * a[k] + b[k]
        ref[nonempty, k] = np.minimum.reduceat(imgs, starts)
    assert np.array_equal(ref, H._minhash_matrix_flat(flat, lengths, 24))

    # simhash dense reference
    sig_ref = np.zeros(n, dtype=np.uint64)
    for bit in range(64):
        contrib = ((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
        sums = np.add.reduceat(contrib, starts)
        sig_ref[nonempty] |= (sums > 0).astype(np.uint64) << np.uint64(bit)
    arrays = pd.Series(
        [flat[offsets[i] : offsets[i + 1]].view(np.int64) for i in range(n)],
        dtype="object",
    )
    assert np.array_equal(
        sig_ref.view(np.int64), np.asarray(simhash64(arrays))
    )


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
