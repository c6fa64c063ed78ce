"""Query-form relational operators over Datasets (no lake write).

These are the same semantics as the sync pipeline's merge stage (A1/A2), in
pure-Dataset form so they can run over any table — used by the driver's
correctness gate against DuckDB oracles, and reusable as library operators.

All of them follow the pre-aggregate-then-shuffle pattern: a vectorized
per-batch combiner inside ``map_batches`` first (LWW compact / hash-first
dedup are associative), then the hash-partition ``groupby`` over the much
smaller partials, so the all-to-all exchange moves one row per (key, batch)
instead of every input row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import partition_ids, stable_hash_array
from ..stages.lww import lww_compact

DEFAULT_NUM_PARTITIONS = 64


def _first_per_key(table: pa.Table, key: str, order: str) -> pa.Table:
    """Keep the min-``order`` row per key (vectorized sort + boundary mask)."""
    if table.num_rows == 0:
        return table
    idx = pc.sort_indices(
        table, sort_keys=[(key, "ascending"), (order, "ascending")]
    )
    t = table.take(idx)
    keys = t.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    first = np.empty(len(keys), dtype=bool)
    first[0] = True
    if len(keys) > 1:
        first[1:] = keys[1:] != keys[:-1]
    return t.filter(pa.array(first))


def lww_latest(
    ds,
    *,
    pk: str,
    ver: str,
    seq: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Latest row per key: max ``(ver, seq)`` — A1 as a query.

    DuckDB oracle shape::

        SELECT * FROM t QUALIFY
        row_number() OVER (PARTITION BY pk ORDER BY ver DESC, seq DESC) = 1
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = lww_compact(batch, pk, ver, seq)
        parts = partition_ids(batch.column(pk), num_partitions)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return lww_compact(group.drop_columns(["_part"]), pk, ver, seq)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )


def dedup_exact(
    ds,
    *,
    on: str,
    keep_by: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    hash_based: bool = True,
):
    """Exact dedup: keep the min-``keep_by`` row per distinct ``on`` value.

    The shuffle key is ``stable_hash(on)`` (64-bit), so wide payload strings
    are compared once per batch and the exchange routes by a fixed-width
    column — the hash-partition + per-group-first pattern.  Hash collisions
    are resolved inside the group by comparing the actual column.
    """
    hash_col = "_h"

    def partial(batch: pa.Table) -> pa.Table:
        h = stable_hash_array(batch.column(on))
        batch = batch.append_column(hash_col, pa.array(h, type=pa.uint64()))
        batch = _first_per_key(batch, hash_col if hash_based else on, keep_by)
        keys = batch.column(hash_col).to_numpy(zero_copy_only=False)
        parts = (keys % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_part"])
        # dedup by actual value (collision-safe), then drop the hash column
        g = _first_per_key(g, on, keep_by)
        return g.drop_columns([hash_col])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )
