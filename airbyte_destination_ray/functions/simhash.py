"""Vectorized SimHash + token-hash kernels (near-duplicate fingerprints).

SimHash (Charikar 2002, as used in Manku et al., WWW'07 for web-scale
near-dup detection): hash every token to 64 bits; for each bit position sum
+1/-1 across the document's tokens; the sign vector packed into a uint64 is
the fingerprint.  Documents differing by a few tokens land within a small
Hamming distance.

Everything here is numpy over the raw UTF-8 buffer — token extraction reuses
the byte-mask machinery of :mod:`.text`; per-token hashing packs the first 8
bytes of each token into a uint64 and applies a splitmix64-style mixer (8
vectorized gathers, no Python loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _apply_null_mask, _run_starts, _utf8_view

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — cheap, well-distributed 64-bit mixer."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _token_spans(texts):
    """Flat token (start, length, row_id) arrays for a string array.

    A token is a maximal run of non-space bytes (matches the ``n_words``
    feature).  Returns (data, tok_start, tok_len, row_id, n_rows).
    """
    data, starts, ends = _utf8_view(texts)
    is_space = (data == 0x20) | ((data >= 0x09) & (data <= 0x0D))
    nonspace = ~is_space
    tok_start_mask = _run_starts(nonspace, starts)
    tok_start = np.nonzero(tok_start_mask)[0]
    # token end = next space or row end; compute via run starts of the space
    # mask shifted: a run of non-space ends where the next byte is space/row end
    run_end_mask = nonspace.copy()
    run_end_mask[:-1] &= is_space[1:]
    # also end at row boundaries
    last_bytes = ends[ends > starts] - 1
    run_end_mask[last_bytes] = nonspace[last_bytes]
    tok_end = np.nonzero(run_end_mask)[0] + 1
    tok_len = tok_end - tok_start
    row_id = np.searchsorted(starts, tok_start, side="right") - 1
    return data, tok_start, tok_len, row_id, len(starts)


def token_hashes(texts) -> tuple[np.ndarray, np.ndarray, int]:
    """(hashes uint64, row_id, n_rows) for every whitespace token.

    The hash covers the first 8 bytes of the token plus its length — tokens
    longer than 8 bytes that share a prefix collide, which is harmless for
    near-dup fingerprints.
    """
    data, tok_start, tok_len, row_id, n_rows = _token_spans(texts)
    h = tok_len.astype(np.uint64) * _GOLDEN
    limit = len(data)
    for k in range(8):
        idx = tok_start + k
        np.clip(idx, 0, limit - 1, out=idx)
        byte_k = data[idx].astype(np.uint64)
        byte_k[k >= tok_len] = 0
        h ^= byte_k << np.uint64(8 * k)
    return _mix64(h), row_id, n_rows


def simhash64(texts, *, sample_mod: int = 1) -> pa.Array:
    """64-bit SimHash fingerprint per document (null text → null).

    ``sample_mod > 1`` keeps only tokens with ``hash % sample_mod == 0`` —
    consistent (hash-based) sampling, so similar documents sample the same
    tokens and similarity estimates are preserved while the accumulation
    cost drops by ~``sample_mod``.
    """
    hashes, row_id, n_rows = token_hashes(texts)
    if sample_mod > 1 and len(hashes):
        keep = hashes % np.uint64(sample_mod) == 0
        hashes, row_id = hashes[keep], row_id[keep]
    if len(hashes) == 0:
        return _apply_null_mask(
            pa.array(np.zeros(n_rows, dtype=np.uint64)), texts
        )
    # bit matrix: one row per token, 64 columns in [0, 1]
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    # per-document sums of each bit column; row_id is sorted, so reduceat
    # over the first-token index of each document segments the matrix.
    # Docs starting at/after the end (trailing empties) must be EXCLUDED,
    # not clamped — a clamped index would truncate the previous doc's
    # segment (fingerprints would then depend on batch composition).
    row_starts = np.searchsorted(row_id, np.arange(n_rows), side="left")
    valid = row_starts < len(hashes)
    sums = np.zeros((n_rows, 64), dtype=np.int32)
    if valid.any():
        sums[valid] = np.add.reduceat(
            bits.astype(np.int32), row_starts[valid], axis=0
        )
    tok_counts = np.bincount(row_id, minlength=n_rows).astype(np.int32)
    empty = tok_counts == 0
    sums[empty] = 0
    # majority per bit → fingerprint bit
    maj = (sums * 2 > tok_counts[:, None]).astype(np.uint8)
    fp = np.packbits(maj, axis=1, bitorder="little").view(np.uint64).ravel()
    fp[empty] = 0
    return _apply_null_mask(pa.array(fp, type=pa.uint64()), texts)


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR between two uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64)).view(
        np.uint8
    )
    return np.unpackbits(x.reshape(len(a), 8), axis=1).sum(axis=1)
