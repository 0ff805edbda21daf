"""MinHash / SimHash / winnowing fingerprints, Arrow-batched.

The blocking design (SURVEY.md §2.3, §4.1): token base-hashing runs
JVM-side (ONE flat ``F.transform`` + ``xxhash64`` pass — per-shingle
string slicing in interpreted higher-order expressions was the
dominant CPU cost of the blocking stage and is gone), while shingle
folding, the MinHash signature, and LSH banding are fused into one
pandas UDF, fully vectorized in numpy (``shingle_flat`` +
``np.minimum.reduceat`` segment reductions) — no per-row Python loops.

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


_SHINGLE_PRIME = np.uint64(0x100000001B3)


def shingle_flat(
    flat: np.ndarray, lengths: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Ragged token-hash arrays → ragged word-k-shingle hashes, fully
    vectorized: shingle hash = polynomial fold of k consecutive token
    hashes (uint64 wrap-around).  Rows shorter than k (but non-empty)
    yield ONE shingle folding all their tokens — same semantics as the
    earlier string-shingle form (tiny docs still block).

    Replaces JVM-side string shingling (slice+concat_ws per shingle is
    an interpreted higher-order expression — measured ~15ms CPU per
    document; this path is ~50x cheaper)."""
    n = len(lengths)
    out_lengths = np.where(
        lengths >= k, lengths - k + 1, np.where(lengths > 0, 1, 0)
    ).astype(np.int64)
    if k <= 1 or flat.size == 0:
        return flat, (lengths if k <= 1 else out_lengths)
    N = flat.size
    in_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=in_off[1:])
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lengths, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint64)

    rid = np.repeat(np.arange(n, dtype=np.int64), lengths)
    m_len = N - k + 1
    if m_len > 0:
        m = flat[:m_len].copy()
        for i in range(1, k):
            m = m * _SHINGLE_PRIME ^ flat[i : m_len + i]
        valid = rid[:m_len] == rid[k - 1 :]
        pos = np.nonzero(valid)[0]
        r = rid[pos]
        dest = out_off[r] + (pos - in_off[r])
        out[dest] = m[pos]
    # non-empty rows shorter than k: one fold over all their tokens
    for r in np.nonzero((lengths > 0) & (lengths < k))[0]:
        seg = flat[in_off[r] : in_off[r + 1]]
        acc = seg[0]
        for v in seg[1:]:
            acc = acc * _SHINGLE_PRIME ^ v
        out[out_off[r]] = acc
    return out, out_lengths


# Cache-block size for the signature inner loops, in uint64 elements
# (256 KB — the measured sweet spot on this host's L2; 64 KB-1 MB are
# all within ~10%).  The un-blocked form streams num_hashes full passes
# over the batch's flat shingle array (~16 MB at Arrow batch size)
# through DRAM; under local[32] every worker contends for the same
# memory bus — the measured block+score saturation at 2.1-2.3x for 4x
# threads.  Blocking keeps each pass's working set resident on-core:
# measured (scripts/bench_minhash_kernel.py) 2.0x single-process and
# 5.2x under 32-process contention, with BIT-IDENTICAL output.
_CHUNK_ELEMS = 1 << 15


def _chunked_min_fold(
    flat: np.ndarray,
    offsets: np.ndarray,
    ne_rows: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    out: np.ndarray,
) -> None:
    """Fill ``out[row, k] = min over row's segment of flat*a[k]+b[k]``
    for the non-empty rows ``ne_rows``, cache-blocked: rows are taken
    in runs whose flat segments fit ``_CHUNK_ELEMS``, and all
    ``len(a)`` hash functions run over each resident chunk before
    moving on.  One preallocated scratch buffer; no per-iteration
    allocation beyond reduceat's (n_chunk_rows,) result."""
    if not flat.size or not ne_rows.size:
        return
    num_hashes = len(a)
    seg_lens = offsets[ne_rows + 1] - offsets[ne_rows]
    buf = np.empty(
        min(int(_CHUNK_ELEMS + seg_lens.max()), int(flat.size)), dtype=np.uint64
    )
    row_lo = 0
    while row_lo < ne_rows.size:
        start_elem = int(offsets[ne_rows[row_lo]])
        # grow the run while it still fits the scratch buffer (always
        # admit at least one row — buf is sized for the longest)
        row_hi = row_lo + 1
        while (
            row_hi < ne_rows.size
            and offsets[ne_rows[row_hi] + 1] - start_elem <= buf.size
        ):
            row_hi += 1
        rows = ne_rows[row_lo:row_hi]
        seg = flat[start_elem : int(offsets[rows[-1] + 1])]
        starts = (offsets[rows] - start_elem).astype(np.int64)
        w = buf[: seg.size]
        for k in range(num_hashes):
            np.multiply(seg, a[k], out=w)  # uint64 wrap-around
            w += b[k]
            out[rows, k] = np.minimum.reduceat(w, starts)
        row_lo = row_hi


def _minhash_matrix_flat(
    flat: np.ndarray, lengths: np.ndarray, num_hashes: int
) -> np.ndarray:
    """Batch MinHash core over a pre-flattened ragged batch:
    (n, num_hashes) uint64 signature matrix (sentinel rows where
    length == 0).

    Cost O(num_hashes · total_shingles) in C, cache-blocked via
    ``_chunked_min_fold`` so the per-hash passes stay L2-resident
    instead of streaming DRAM (bit-identical to the un-blocked form —
    asserted in scripts/bench_minhash_kernel.py and
    tests/test_hashing.py)."""
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    a, b = _minhash_params(num_hashes)
    out = np.full((n, num_hashes), _EMPTY_SENTINEL, dtype=np.uint64)
    ne_rows = np.nonzero(lengths > 0)[0]
    _chunked_min_fold(flat, offsets, ne_rows, a, b, out)
    return out


def _minhash_matrix(
    hash_arrays: pd.Series, num_hashes: int, shingle_size: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """list-of-token-hashes column form of ``_minhash_matrix_flat``;
    ``shingle_size`` > 1 folds consecutive token hashes into word-
    shingle hashes first (``shingle_flat``)."""
    flat, _offsets, lengths = _flatten_ragged(hash_arrays)
    if shingle_size > 1:
        flat, lengths = shingle_flat(flat, lengths, shingle_size)
    return _minhash_matrix_flat(flat, lengths, num_hashes), lengths


def minhash_signatures(
    hash_arrays: pd.Series, num_hashes: int, shingle_size: int = 1
) -> list[list[int] | None]:
    """Row-wise list form of ``_minhash_matrix`` (None for empty rows)."""
    out, lengths = _minhash_matrix(hash_arrays, num_hashes, shingle_size)
    out_i64 = out.view(np.int64)
    return [
        out_i64[i].tolist() if lengths[i] > 0 else None for i in range(len(lengths))
    ]


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)
_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def minhash_band_keys(
    hash_arrays: pd.Series, num_hashes: int, bands: int, shingle_size: int = 1
) -> list[list[int] | None]:
    """Fused signature + LSH banding: per row, ``bands`` int64 band keys
    (FNV-1a fold over each band's signature rows, band index mixed in).

    Fusing keeps the whole blocking computation in ONE pandas-UDF
    evaluation — banding JVM-side would reference the signature column
    ``bands`` times and Catalyst re-evaluates Python UDFs per reference
    (measured 4-5x slowdown on the blocking stage)."""
    sig, lengths = _minhash_matrix(hash_arrays, num_hashes, shingle_size)
    n, rows = len(lengths), num_hashes // bands
    h = _band_fold(sig, lengths, bands, rows)
    h_i64 = h.view(np.int64)
    return [
        h_i64[i].tolist() if lengths[i] > 0 else None for i in range(n)
    ]


def make_minhash_band_udf(num_hashes: int, bands: int, shingle_size: int = 1):
    """array<bigint> token hashes → array<bigint> of LSH band keys
    (vectorized shingling + signature + banding fused in one UDF)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_udf(hashes: pd.Series) -> pd.Series:
        return pd.Series(
            minhash_band_keys(hashes, num_hashes, bands, shingle_size),
            dtype="object",
        )

    return band_udf


def make_minhash_udf(num_hashes: int, shingle_size: int = 1):
    """array<bigint> token hashes → array<bigint> signature (with
    optional in-UDF vectorized shingling)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(hashes: pd.Series) -> pd.Series:
        return pd.Series(
            minhash_signatures(hashes, num_hashes, shingle_size), dtype="object"
        )

    return minhash_udf


def make_gram_bands_udf(n: int, num_bands: int):
    """array<bigint> token hashes → struct(grams: array<bigint>,
    bands: array<bigint>): the fused production kernel behind
    ``ngram_jaccard_pairs_fast``.

    Per Arrow batch, entirely in numpy: word-n-gram hashes via the
    ``shingle_flat`` polynomial fold, per-row DEDUP of the gram set
    (one lexsort over the flattened batch — no per-row loops), and
    ``num_bands`` single-row MinHash band keys (one multiply-shift salt
    per band, min over the distinct gram set, band index mixed in).  A
    pair with Jaccard J agrees on one band with probability J — the
    same blocking recall 1-(1-J)^num_bands as the md5-per-gram SQL-
    parity path this replaces, whose interpreted per-gram HOF
    expressions (md5 hex + concat_ws × num_bands salts) were the
    dominant CPU cost of the parity query."""
    a, b = _minhash_params(num_bands)
    band_mix = np.arange(num_bands, dtype=np.uint64) * _BAND_MIX

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("grams", T.ArrayType(T.LongType())),
                T.StructField("bands", T.ArrayType(T.LongType())),
            ]
        )
    )
    def gram_bands_udf(hashes: pd.Series) -> pd.DataFrame:
        flat, _off, lengths = _flatten_ragged(hashes)
        gflat, glens = shingle_flat(flat, lengths, n)
        # distinct gram hashes per row: one lexsort over the flat batch
        # (_dedup_ragged), vectorized across rows
        dh, dlens, offs = _dedup_ragged(gflat, glens)
        nrows = len(glens)
        nonempty = glens > 0
        bands_mat = np.zeros((nrows, num_bands), dtype=np.uint64)
        _chunked_min_fold(
            dh, offs, np.nonzero(nonempty)[0], a, b, bands_mat
        )  # cache-blocked, bit-identical to the per-band full passes
        bands_mat ^= band_mix
        dh_i64 = dh.view(np.int64)
        bm_i64 = bands_mat.view(np.int64)
        grams_out: list[list[int] | None] = []
        bands_out: list[list[int] | None] = []
        for i in range(nrows):
            if nonempty[i]:
                grams_out.append(dh_i64[offs[i] : offs[i + 1]].tolist())
                bands_out.append(bm_i64[i].tolist())
            else:
                grams_out.append(None)
                bands_out.append(None)
        return pd.DataFrame({"grams": grams_out, "bands": bands_out})

    return gram_bands_udf


def _band_fold(sig: np.ndarray, lengths: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n, bands·rows) signature matrix → (n, bands) FNV-1a band keys
    with the band index mixed in — the shared fold behind
    ``minhash_band_keys`` and ``make_minhash_band_gram_udf``."""
    n = len(lengths)
    m = sig.reshape(n, bands, rows)
    h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
    for r in range(rows):
        h = (h ^ m[:, :, r]) * _FNV_PRIME
    h ^= np.arange(bands, dtype=np.uint64) * _BAND_MIX
    return h


def _dedup_ragged(gflat: np.ndarray, glens: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ragged gram-hash stream → per-row DISTINCT hashes: one lexsort by
    (row, hash) over the flat batch, keep first of each run (the
    make_gram_bands_udf kernel, factored for reuse).  Returns
    (distinct_flat, distinct_lengths, offsets)."""
    nrows = len(glens)
    if gflat.size:
        rid = np.repeat(np.arange(nrows, dtype=np.int64), glens)
        order = np.lexsort((gflat, rid))
        sr, sh = rid[order], gflat[order]
        keep = np.ones(sh.size, dtype=bool)
        keep[1:] = (sr[1:] != sr[:-1]) | (sh[1:] != sh[:-1])
        dh = sh[keep]
        dlens = np.bincount(sr[keep], minlength=nrows).astype(np.int64)
    else:
        dh = np.empty(0, dtype=np.uint64)
        dlens = np.zeros(nrows, dtype=np.int64)
    offs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(dlens, out=offs[1:])
    return dh, dlens, offs


def make_minhash_band_gram_udf(num_hashes: int, bands: int, shingle_size: int):
    """array<bigint> token hashes → struct(bands: array<bigint>,
    grams: array<bigint>): ONE fused kernel producing both the LSH band
    keys (shingle fold → distinct → MinHash minima → FNV band fold) and
    the row's DISTINCT shingle-hash set for an exact verify join
    (round 6).

    The verify path previously re-tokenized the corpus and built
    STRING word-shingles through interpreted slice/concat_ws HOF
    expressions — the exact per-shingle string cost ``shingle_flat``
    was written to kill — and the band path ran a second Python pass
    plus a 48-way interpreted slice/concat over the signature column.
    Shingling once and deriving both outputs makes the whole
    candidates+verify pipeline one Arrow pass.  MinHash minima over the
    DISTINCT stream equal minima over the raw stream (min ignores
    multiplicity), so band keys are identical to
    ``make_minhash_band_udf``'s."""
    a, b = _minhash_params(num_hashes)
    rows = num_hashes // bands

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("bands", T.ArrayType(T.LongType())),
                T.StructField("grams", T.ArrayType(T.LongType())),
            ]
        )
    )
    def band_gram_udf(hashes: pd.Series) -> pd.DataFrame:
        flat, _off, lengths = _flatten_ragged(hashes)
        gflat, glens = shingle_flat(flat, lengths, shingle_size)
        dh, dlens, offs = _dedup_ragged(gflat, glens)
        nrows = len(glens)
        nonempty = dlens > 0
        sig = np.full((nrows, num_hashes), _EMPTY_SENTINEL, dtype=np.uint64)
        _chunked_min_fold(dh, offs, np.nonzero(nonempty)[0], a, b, sig)
        bk = _band_fold(sig, dlens, bands, rows)
        dh_i64 = dh.view(np.int64)
        bk_i64 = bk.view(np.int64)
        bands_out: list[list[int] | None] = []
        grams_out: list[list[int] | None] = []
        for i in range(nrows):
            if nonempty[i]:
                bands_out.append(bk_i64[i].tolist())
                grams_out.append(dh_i64[offs[i] : offs[i + 1]].tolist())
            else:
                bands_out.append(None)
                grams_out.append(None)
        return pd.DataFrame({"bands": bands_out, "grams": grams_out})

    return band_gram_udf


def make_md5_gram_bands_udf(n: int, num_bands: int):
    """array<string> tokens → struct(grams: array<bigint>,
    bands: array<string>): the md5 SQL-parity banding of
    ``ngram_jaccard_pairs``, computed in one Arrow batch pass
    (round 6).

    Byte-identical band buckets to the HOF formulation it replaces:
    band b = ``f"{b}|" + min over grams of md5(f"s{b}|{gram}")`` —
    min is taken over raw 16-byte digests, which orders exactly like
    the lowercase-hex strings (hex encoding is byte-order-preserving),
    then hex-encoded once.  The interpreted per-gram HOF md5 chain
    (num_bands salts × every gram, built via slice/concat_ws) measured
    ~11.5s at sf1.0; hashlib over the same bytes is sub-second.
    ``grams`` carries the first 8 md5 bytes of each DISTINCT gram as a
    big-endian int64 — the verify join's stand-in for the gram string
    (same absent-64-bit-collisions equivalence the fast path documents)."""
    import hashlib

    salts = [f"s{b}|".encode() for b in range(num_bands)]
    prefixes = [f"{b}|" for b in range(num_bands)]

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("grams", T.ArrayType(T.LongType())),
                T.StructField("bands", T.ArrayType(T.StringType())),
            ]
        )
    )
    def md5_gram_bands_udf(tokens: pd.Series) -> pd.DataFrame:
        md5 = hashlib.md5
        grams_out: list[list[int] | None] = []
        bands_out: list[list[str] | None] = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                grams_out.append(None)
                bands_out.append(None)
                continue
            if len(toks) >= n:
                grams = {
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                }
            else:
                grams = {" ".join(toks)}
            genc = [g.encode("utf-8") for g in grams]
            digs = [md5(ge).digest() for ge in genc]
            grams_out.append(
                [int.from_bytes(d[:8], "big", signed=True) for d in digs]
            )
            bands_out.append(
                [
                    prefixes[bi] + min(md5(s + ge).digest() for ge in genc).hex()
                    for bi, s in enumerate(salts)
                ]
            )
        return pd.DataFrame({"grams": grams_out, "bands": bands_out})

    return md5_gram_bands_udf


def simhash64(hash_arrays: pd.Series) -> np.ndarray:
    """Batch 64-bit SimHash over per-row token-hash arrays: per bit
    position, sum ±1 contributions per row (``np.add.reduceat``), sign
    gives the bit.  Cache-blocked like ``_chunked_min_fold`` — the
    64 per-bit passes otherwise stream the whole flat batch through
    DRAM (same contention pathology as the MinHash loop; same
    bit-identical fix)."""
    flat, offsets, lengths = _flatten_ragged(hash_arrays)
    n = len(lengths)
    sig = np.zeros(n, dtype=np.uint64)
    ne_rows = np.nonzero(lengths > 0)[0]
    if flat.size and ne_rows.size:
        seg_lens = offsets[ne_rows + 1] - offsets[ne_rows]
        cap = min(int(_CHUNK_ELEMS + seg_lens.max()), int(flat.size))
        buf = np.empty(cap, dtype=np.int64)
        row_lo = 0
        while row_lo < ne_rows.size:
            start_elem = int(offsets[ne_rows[row_lo]])
            row_hi = row_lo + 1
            while (
                row_hi < ne_rows.size
                and offsets[ne_rows[row_hi] + 1] - start_elem <= cap
            ):
                row_hi += 1
            rows = ne_rows[row_lo:row_hi]
            seg = flat[start_elem : int(offsets[rows[-1] + 1])]
            starts = (offsets[rows] - start_elem).astype(np.int64)
            w = buf[: seg.size]
            for bit in range(64):
                np.right_shift(seg, np.uint64(bit), out=w.view(np.uint64))
                wv = w.view(np.uint64)
                wv &= np.uint64(1)
                w *= 2
                w -= 1
                sums = np.add.reduceat(w, starts)
                sig[rows] |= ((sums > 0).astype(np.uint64)) << np.uint64(bit)
            row_lo = row_hi
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


def token_hashes_col(tokens: Column) -> Column:
    """token array → array<bigint> of xxhash64(token) — ONE flat
    higher-order pass (no per-shingle string slicing: interpreted HOF
    string work measured ~15ms CPU/doc; shingle combination happens
    vectorized inside the MinHash UDF, see ``shingle_flat``)."""
    return F.transform(tokens, lambda t: F.xxhash64(t))


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
