"""MinHash / SimHash / winnowing fingerprints, Arrow-batched.

The blocking design (SURVEY.md §2.3, §4.1): shingling and base-hashing
run **JVM-side** (``F.transform`` + ``xxhash64`` — codegen, no Python),
and only the signature math crosses into numpy via pandas UDFs, where
it is fully vectorized with ``np.minimum.reduceat`` segment reductions
over the flattened ragged batch — no per-row Python loops.

All hash parameters derive from fixed seeds so signatures are
deterministic across executors, runs, and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MINHASH_SEED = 0x5EED_CAFE
_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _minhash_params(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-shift parameters (odd a, any b), uint64
    wrap-around arithmetic."""
    rng = np.random.default_rng(_MINHASH_SEED)
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def _flatten_ragged(arrays: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """list-of-int64-arrays column → (flat uint64, start offsets, lengths)."""
    lengths = np.fromiter(
        (0 if x is None else len(x) for x in arrays), dtype=np.int64, count=len(arrays)
    )
    offsets = np.zeros(len(arrays) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    flat = np.empty(total, dtype=np.int64)
    pos = 0
    for x in arrays:
        if x is None or len(x) == 0:
            continue
        n = len(x)
        flat[pos : pos + n] = np.asarray(x, dtype=np.int64)
        pos += n
    return flat.view(np.uint64), offsets, lengths


def minhash_signatures(
    hash_arrays: pd.Series, num_hashes: int
) -> list[list[int] | None]:
    """Batch MinHash: for every row's set of base hashes, the
    elementwise min of ``num_hashes`` universal-hash images.

    Vectorized per hash function over the whole flattened batch with a
    single ``np.minimum.reduceat`` — cost O(num_hashes · total_shingles)
    in C, independent of row count."""
    flat, offsets, lengths = _flatten_ragged(hash_arrays)
    n = len(lengths)
    a, b = _minhash_params(num_hashes)
    out = np.empty((n, num_hashes), dtype=np.uint64)
    nonempty = lengths > 0
    starts = offsets[:-1][nonempty]
    if flat.size:
        for k in range(num_hashes):
            imgs = flat * a[k] + b[k]  # uint64 wrap-around (multiply-shift)
            out[nonempty, k] = np.minimum.reduceat(imgs, starts)
    out_i64 = out.view(np.int64)
    result: list[list[int] | None] = []
    for i in range(n):
        if lengths[i] == 0:
            result.append(None)
        else:
            result.append(out_i64[i].tolist())
    return result


def make_minhash_udf(num_hashes: int):
    """array<bigint> base shingle hashes → array<bigint> signature."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(hashes: pd.Series) -> pd.Series:
        return pd.Series(minhash_signatures(hashes, num_hashes), dtype="object")

    return minhash_udf


def simhash64(hash_arrays: pd.Series) -> np.ndarray:
    """Batch 64-bit SimHash over per-row token-hash arrays: per bit
    position, sum ±1 contributions per row (``np.add.reduceat``), sign
    gives the bit."""
    flat, offsets, lengths = _flatten_ragged(hash_arrays)
    n = len(lengths)
    sig = np.zeros(n, dtype=np.uint64)
    nonempty = lengths > 0
    starts = offsets[:-1][nonempty]
    if flat.size:
        for bit in range(64):
            contrib = (((flat >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1)
            sums = np.add.reduceat(contrib, starts)
            bits = (sums > 0).astype(np.uint64)
            sig[nonempty] |= bits << np.uint64(bit)
    return sig.view(np.int64)


@F.pandas_udf(T.LongType())
def simhash_udf(hashes: pd.Series) -> pd.Series:
    return pd.Series(simhash64(hashes))


def winnow_fingerprint(
    text: str | None, k: int = 8, window: int = 16
) -> list[int] | None:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03 —
    public algorithm): rolling hashes of char k-grams, keep the min of
    every sliding window, dedupe consecutive picks."""
    if not text or len(text) < k:
        return None
    data = np.frombuffer(text.encode("utf-8", errors="replace"), dtype=np.uint8)
    m = len(data) - k + 1
    if m <= 0:
        return None
    base = np.uint64(1099511628211)
    h = np.zeros(m, dtype=np.uint64)
    # polynomial hash of each k-gram, vectorized across positions
    for j in range(k):
        h = h * base + data[j : j + m].astype(np.uint64)
    if m <= window:
        return [int(h.min().view(np.int64))]
    w = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = w.min(axis=1)
    picks = np.unique(mins)
    return picks.view(np.int64).tolist()


@F.pandas_udf(T.ArrayType(T.LongType()))
def winnow_fingerprint_udf(text: pd.Series) -> pd.Series:
    return pd.Series([winnow_fingerprint(t) for t in text], dtype="object")


# ---------------------------------------------------------------------------
# JVM-side shingling / banding helpers (no Python in these paths)
# ---------------------------------------------------------------------------

def tokens_col(norm_text: Column) -> Column:
    """normalized text → token array (JVM split)."""
    return F.filter(F.split(norm_text, " "), lambda t: t != "")


def shingle_hashes_col(tokens: Column, shingle_size: int) -> Column:
    """token array → array<bigint> of xxhash64(word-k-shingle).

    Pure JVM: sequence over start positions, slice+concat_ws per
    shingle, xxhash64 per shingle. Documents shorter than one shingle
    hash the whole token string (so tiny docs still block)."""
    n = F.size(tokens)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(shingle_size - 1), F.lit(1)))
    shingles = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(tokens, i, shingle_size))
    )
    return F.transform(shingles, lambda s: F.xxhash64(s))


def lsh_band_hashes_col(signature: Column, bands: int, rows: int) -> Column:
    """MinHash signature → array of ``bands`` band keys, each
    xxhash64 over its row-slice (JVM). Band index is mixed into the
    hash so identical slices in different bands don't collide."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            b, F.concat_ws(",", F.transform(F.slice(signature, b * rows + 1, rows), lambda x: x.cast("string")))
        ),
    )
