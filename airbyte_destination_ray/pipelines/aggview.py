"""Incrementally-maintained aggregate view (materialized-view maintenance).

The CDC tier's other half: instead of upserting ROWS, maintain a per-key
AGGREGATE table across binlog epochs — each epoch folds its partials into
the previous committed state, under the same per-(generation, epoch,
partition) manifest CAS as the row lake, so replay / retry / resume have
exactly the row-lake guarantees (re-running a committed epoch is a no-op;
resume skips checkpointed epochs; final state is independent of batch
composition because the fold is an integer sum).

Cost shape: per epoch, ONE narrow hash exchange of per-(key, batch)
partials (never event rows), then O(touched partition) snapshot rewrite —
the same write amplification as the row lake's snapshot strategy; a delta
variant is unnecessary because the aggregate state IS the compaction.

All sums are integer cents (``floor(value·100)``), so the maintained view
is bit-identical to the one-shot SQL ``GROUP BY`` at any epoch split —
which is what the oracle checks.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import partition_ids
from ..sources.synth import list_epochs, list_segments
from ..stages.lww import _atomic_write_parquet, _stats_row
from ..state.manifest import ManifestStore, PartitionManifest

AGG_SCHEMA_COLS = ("n", "sum_cents")


def run_incremental_agg(
    lake_root: str,
    binlog_dir: str,
    *,
    table: str = "agg",
    key: str = "url",
    value_col: str = "warc_ts",
    num_partitions: int = 32,
    epochs: list[int] | None = None,
    resume: bool = True,
) -> dict:
    """Maintain ``key → (n, sum_cents)`` over every change event in the
    binlog, epoch by epoch, exactly-once.  Events with a null key are
    excluded (SQL ``WHERE key IS NOT NULL`` parity); null values count
    toward ``n`` but not ``sum_cents`` (SQL ``count(*)`` / ``sum``)."""
    store = ManifestStore(lake_root, table)
    store.root.mkdir(parents=True, exist_ok=True)
    meta = store.init_table(
        num_partitions=num_partitions,
        mode="append_dedup",  # read view: latest manifest per partition
        pk=[key],
        cursor=value_col,
        view="incremental_agg",
    )
    num_partitions = meta["num_partitions"]
    generation = meta["generation"]

    all_epochs = epochs if epochs is not None else list_epochs(binlog_dir)
    ckpt = store.last_checkpoint(generation) if resume else None
    start_after = ckpt["epoch"] if ckpt else -1

    summaries = []
    for e in all_epochs:
        if e <= start_after:
            summaries.append({"epoch": e, "skipped": True})
            continue
        segments = list_segments(binlog_dir, e)
        if not segments:
            continue
        ds = ray.data.read_parquet(
            segments, override_num_blocks=len(segments)
        )

        def partial(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {"k": batch.column(key), "v": batch.column(value_col)}
            )
            t = t.filter(t.column("k").combine_chunks().is_valid())
            v = t.column("v").combine_chunks()
            if pa.types.is_timestamp(v.type):
                v = v.cast(pa.int64())  # µs since epoch as the numeric value
            cents = pc.cast(
                pc.floor(pc.multiply(pc.cast(v, pa.float64()), 100.0)),
                pa.int64(),
            )
            g = pa.table(
                {
                    "k": t.column("k"),
                    "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
                    "sum_cents": pc.fill_null(cents, 0),
                }
            ).group_by("k", use_threads=False).aggregate(
                [("n", "sum"), ("sum_cents", "sum")]
            )
            g = pa.table(
                {
                    "k": g.column("k"),
                    "n": g.column("n_sum"),
                    "sum_cents": g.column("sum_cents_sum"),
                }
            )
            parts = partition_ids(g.column("k"), num_partitions)
            return g.append_column("_part", pa.array(parts, type=pa.int64()))

        def fold(group: pa.Table) -> pa.Table:
            part = int(group.column("_part")[0].as_py())
            st = ManifestStore(lake_root, table)
            existing = st.get(generation, e, part)
            if existing is not None:
                return _stats_row(
                    table, e, part,
                    rows=existing.row_count, nbytes=existing.byte_count,
                    files=len(existing.files), changes_in=group.num_rows,
                    skipped=True, digest=existing.digest,
                )
            changes = group.drop_columns(["_part"])
            prev = st.latest_snapshot(generation, part, max_epoch=e - 1)
            pieces = [changes]
            if prev is not None and prev.files:
                import pyarrow.parquet as pq

                pieces.append(
                    pa.concat_tables(
                        pq.read_table(Path(lake_root) / f) for f in prev.files
                    )
                )
            combined = pa.concat_tables(pieces, promote_options="permissive")
            merged = combined.group_by("k", use_threads=False).aggregate(
                [("n", "sum"), ("sum_cents", "sum")]
            )
            merged = pa.table(
                {
                    "k": merged.column("k"),
                    "n": merged.column("n_sum"),
                    "sum_cents": merged.column("sum_cents_sum"),
                }
            )
            # deterministic file bytes: sort by key so replays are
            # byte-identical regardless of batch arrival order
            merged = merged.take(
                pc.sort_indices(merged, sort_keys=[("k", "ascending")])
            )
            rel = (
                f"{table}/gen={generation:04d}/parts/p={part:05d}/"
                f"e{e:06d}.parquet"
            )
            nbytes = _atomic_write_parquet(merged, Path(lake_root) / rel)
            m = PartitionManifest(
                table=table,
                generation=generation,
                epoch=e,
                partition=part,
                files=[rel],
                row_count=merged.num_rows,
                byte_count=nbytes,
                max_seq=-1,
                digest="",
                mode="append_dedup",
                schema_version=0,
            )
            st.commit(m)
            return _stats_row(
                table, e, part,
                rows=merged.num_rows, nbytes=nbytes, files=1,
                changes_in=group.num_rows, skipped=False, digest="",
            )

        stats = (
            ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("_part")
            .map_groups(fold, batch_format="pyarrow")
        )
        n_parts = stats.count()
        store.write_checkpoint(generation, e, {"epoch": e})
        summaries.append({"epoch": e, "partitions": n_parts, "skipped": False})
    return {"table": table, "epochs": summaries}


def read_agg(lake_root: str, table: str = "agg", *, key_name: str = "k"):
    """Dataset over the maintained aggregate state (latest snapshot per
    partition via the ordinary manifest listing); ``key_name`` renames the
    key column for downstream consumers."""
    from .cdc import read_table

    ds = read_table(lake_root, table)
    if key_name == "k":
        return ds

    def rename(b: pa.Table) -> pa.Table:
        names = [key_name if c == "k" else c for c in b.column_names]
        return b.rename_columns(names)

    return ds.map_batches(rename, batch_format="pyarrow", batch_size=None)
