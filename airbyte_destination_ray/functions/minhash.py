"""Vectorized MinHash signatures over token shingles.

MinHash (Broder 1997) as used for web-scale near-dup detection (the
SlimPajama / RefinedWeb recipe): k-token shingles → per-permutation minimum
hash → LSH banding.  All numpy over flat token arrays — the per-permutation
row minimum uses ``np.minimum.reduceat`` over the (sorted) row segments, no
Python loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .simhash import _mix64, token_hashes

_SEED_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def _shingle_hashes(
    hashes: np.ndarray, row_id: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Combine k consecutive token hashes within each row into shingle
    hashes.  A shingle at position i is valid iff tokens i..i+k-1 belong to
    the same row; rows shorter than k contribute their (single) partial
    shingle so short docs still get a signature."""
    n = len(hashes)
    if n == 0:
        return hashes, row_id
    if k <= 1:
        return hashes, row_id
    sh = hashes.copy()
    for j in range(1, k):
        rolled = np.empty_like(hashes)
        rolled[: n - j] = hashes[j:]
        rolled[n - j :] = 0
        sh = sh * np.uint64(1099511628211) + rolled  # FNV-ish combine
    valid = np.zeros(n, dtype=bool)
    if n >= k:
        valid[: n - k + 1] = row_id[: n - k + 1] == row_id[k - 1 :]
    # keep one partial shingle for rows with < k tokens (their first token)
    counts = np.bincount(row_id, minlength=(row_id.max() + 1) if n else 0)
    short_rows = np.nonzero(counts[: row_id.max() + 1] < k)[0] if n else []
    if len(short_rows):
        firsts = np.searchsorted(row_id, short_rows, side="left")
        valid[firsts[counts[short_rows] > 0]] = True
    return _mix64(sh[valid]), row_id[valid]


def minhash_signatures(
    texts, *, num_perm: int = 64, shingle_k: int = 5
) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signature matrix.

    Empty/null docs get all-``0xFF..`` sentinel signatures (match nothing).
    """
    hashes, row_id, n_rows = token_hashes(texts)
    sh, srow = _shingle_hashes(hashes, row_id, shingle_k)
    sig = np.full((n_rows, num_perm), _EMPTY_SENTINEL, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    row_starts = np.searchsorted(srow, np.arange(n_rows), side="left")
    present = np.bincount(srow, minlength=n_rows) > 0
    clamped = np.minimum(row_starts, len(sh) - 1)
    for p in range(num_perm):
        seed = np.uint64(((p + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        vals = _mix64(sh ^ seed)
        mins = np.minimum.reduceat(vals, clamped)
        sig[present, p] = mins[present]
    return sig


def band_keys(
    sig: np.ndarray, *, bands: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """LSH banding: hash each signature band to one uint64 bucket key.

    Returns (band_idx, key) arrays of shape (n_rows * bands,), row-major —
    caller pairs them with ``np.repeat(ids, bands)``.  Two docs agreeing on
    any band key are near-dup candidates.
    """
    n_rows, num_perm = sig.shape
    assert num_perm % bands == 0, "num_perm must divide evenly into bands"
    r = num_perm // bands
    banded = sig.reshape(n_rows, bands, r)
    key = np.zeros((n_rows, bands), dtype=np.uint64)
    for j in range(r):
        key = key * np.uint64(1099511628211) + banded[:, :, j]
    key = _mix64(key.ravel())
    band_idx = np.tile(np.arange(bands, dtype=np.int64), n_rows)
    return band_idx, key


def jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> np.ndarray:
    """Estimated Jaccard similarity from signature agreement (row-wise)."""
    return (sig_a == sig_b).mean(axis=-1)
