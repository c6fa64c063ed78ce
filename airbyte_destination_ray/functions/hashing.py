"""Stable vectorized hashes for partitioning and dedup.

Partition assignment must be stable across processes and library versions
(partition files persist on disk and resume depends on re-deriving the same
``hash(url) % P``), so we use ``pandas.util.hash_array`` — a documented,
deterministic SipHash with a fixed default key — rather than Python's
randomized ``hash`` or version-dependent hashers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# nulls in integer key columns hash as these sentinels — they co-partition
# deterministically, and partitioning only routes (exact key comparison
# downstream never consults the hash), so a real-value collision is benign
_INT_NULL_SENTINEL = -0x8000000000000000
_UINT_NULL_SENTINEL = 0xFFFFFFFFFFFFFFFF


def stable_hash_array(values) -> np.ndarray:
    """uint64 stable hash of a key array (numpy, pandas or Arrow).

    The hash must be BATCH-COMPOSITION-INDEPENDENT: an int64 Arrow block
    with nulls converts to float64 (NaN) while a null-free block stays
    int64, and pandas hashes 4 and 4.0 differently — so integer inputs are
    canonicalized to a fixed width (signed → int64, unsigned → uint64,
    Arrow nulls → sentinel) before hashing, on BOTH the Arrow and numpy
    paths.  (Found as a real co-location miss in the shuffle join.)
    NOTE: pass NULLABLE integer keys as Arrow — a pandas nullable-int block
    reaches numpy as float64 before this function can see the intent.
    Hash values for integer keys changed when this canonicalization landed;
    integer-pk lakes persisted by earlier builds must be rebuilt (string
    keys — the north-rule `url` pk — are unaffected).
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if pa.types.is_unsigned_integer(values.type):
            filled = pc.fill_null(
                values.cast(pa.uint64()), _UINT_NULL_SENTINEL
            )
            return pd.util.hash_array(filled.to_numpy(zero_copy_only=False))
        if pa.types.is_integer(values.type):
            filled = pc.fill_null(values.cast(pa.int64()), _INT_NULL_SENTINEL)
            return pd.util.hash_array(filled.to_numpy(zero_copy_only=False))
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype.kind == "i":
        return pd.util.hash_array(arr.astype(np.int64, copy=False))
    if arr.dtype.kind == "u":
        return pd.util.hash_array(arr.astype(np.uint64, copy=False))
    if arr.dtype.kind == "f":
        # native numeric path (deterministic, and 10× the object path)
        return pd.util.hash_array(arr.astype(np.float64, copy=False))
    return pd.util.hash_array(
        np.asarray(arr, dtype=object), categorize=False
    )


def composite_partition_ids(
    table, columns: list[str], num_partitions: int
) -> np.ndarray:
    """``stable_hash(col1) ⊕ mix(stable_hash(col2)) … % P`` for composite
    keys — hashes combined with a multiplier so column order matters."""
    h = np.zeros(table.num_rows, dtype=np.uint64)
    for c in columns:
        h = h * np.uint64(0x100000001B3) ^ stable_hash_array(table.column(c))
    return (h % np.uint64(num_partitions)).astype(np.int64)


def partition_ids(keys, num_partitions: int, *, salt: np.ndarray | None = None) -> np.ndarray:
    """``stable_hash(key) % P`` (optionally salted for hot-key splitting).

    With ``salt`` (a per-row uint64), the effective key is perturbed so one
    hot key spreads over several sub-partitions; the caller must follow with
    a final per-key reduce (safe because LWW max-by-(ver, seq) is
    associative/commutative — SURVEY.md §4 skew row).
    """
    h = stable_hash_array(keys)
    if salt is not None:
        h = h ^ (salt * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_partitions)).astype(np.int64)
