"""Last-writer-wins merge operators (reference semantics A1/A2/A3).

The reference *declares* LWW upsert via ClickHouse table settings —
``ReplacingMergeTree(ver=cursor)`` with ``ORDER BY pk``
(internal/connector/destination.go:337-351) — and its e2e suite pins the
semantics: per PK keep the row with the greatest version, later arrival wins
ties (e2e/main_test.go:86-105).  Here those semantics are explicit Ray Data
operators:

- :func:`lww_compact` — vectorized Arrow kernel: sort by ``(pk, ver, seq)``,
  keep the last row per key.  Associative + commutative, so it doubles as the
  per-batch **pre-reduce** (combiner) that shrinks shuffle volume before the
  hash partition, and as the hot-key salted sub-partition reducer.
- :func:`make_partitioner` — ``map_batches`` stage assigning
  ``_part = stable_hash(pk) % P`` (+ optional in-batch pre-reduce).
- :func:`make_partition_merger` — the per-partition ``map_groups`` task:
  merge (previous snapshot ∪ incoming changes), write the new snapshot
  atomically, commit the manifest (CAS → exactly-once), return a stats row.

Tombstones: a delete is a row that *wins* LWW at its ``(ver, seq)`` and
suppresses the key from the read view.  Snapshots **retain** tombstone rows
(``_deleted = true``) so a late-arriving older update cannot resurrect a
deleted key; readers filter them out (``read_table``).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.hashing import partition_ids
from ..state.manifest import ManifestStore, PartitionManifest

SEQ_COLUMN = "_seq"
DELETED_COLUMN = "_deleted"

STATS_SCHEMA = pa.schema(
    [
        pa.field("table", pa.string()),
        pa.field("epoch", pa.int64()),
        pa.field("partition", pa.int64()),
        pa.field("rows", pa.int64()),
        pa.field("bytes", pa.int64()),
        pa.field("files", pa.int64()),
        pa.field("changes_in", pa.int64()),
        pa.field("skipped", pa.bool_()),
        pa.field("digest", pa.string()),
    ]
)


def _pk_list(pk: str | list[str]) -> list[str]:
    return [pk] if isinstance(pk, str) else list(pk)


_PACKED_SCHEMA = pa.schema(
    [pa.field("_part", pa.int64()), pa.field("_ipc", pa.binary())]
)


def ipc_bytes(t: pa.Table) -> bytes:
    """Arrow-IPC wire format for packed exchanges — the single writer half
    of the partitioner↔merger (and dataset-write route↔merge) contract."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def ipc_table(b) -> pa.Table:
    """Reader half of :func:`ipc_bytes`."""
    return pa.ipc.open_stream(pa.BufferReader(b)).read_all()


def pack_by_part(batch: pa.Table, parts: "np.ndarray") -> pa.Table:
    """Cluster ``batch`` by partition id and serialize one IPC envelope per
    partition: ONE take + zero-copy slices (a filter per partition would be
    O(rows × partitions) — the groupby-per-bucket anti-pattern).  Empty
    batches yield the empty packed table."""
    if batch.num_rows == 0:
        return _PACKED_SCHEMA.empty_table()
    order = np.argsort(parts, kind="stable")
    clustered = batch.take(pa.array(order, type=pa.int64()))
    sp = parts[order]
    starts = np.nonzero(np.concatenate(([True], sp[1:] != sp[:-1])))[0]
    ends = np.append(starts[1:], len(sp))
    out_p: list[int] = []
    out_b: list[bytes] = []
    for s, e in zip(starts, ends):
        out_p.append(int(sp[s]))
        out_b.append(ipc_bytes(clustered.slice(int(s), int(e - s))))
    return pa.table(
        {
            "_part": pa.array(out_p, type=pa.int64()),
            "_ipc": pa.array(out_b, type=pa.binary()),
        }
    )


def lww_compact(
    table: pa.Table,
    pk: str | list[str],
    ver: str,
    seq: str = SEQ_COLUMN,
    *,
    drop_tombstones: bool = False,
    tombstone_col: str = DELETED_COLUMN,
) -> pa.Table:
    """Keep the winning row per key (single or composite): max ``(ver, seq)``.

    Pure vectorized Arrow/numpy — one multi-key sort + a boundary mask; no
    Python per-row work.  Output is sorted by ``pk`` (deterministic layout,
    required for byte-identical replay).
    """
    if table.num_rows == 0:
        return table
    pks = _pk_list(pk)
    # null versions must LOSE to any real version (nulls sort first, and the
    # winner is the last row per key) — default null_placement would put
    # null-ver rows last, making them win LWW
    idx = pc.sort_indices(
        table,
        sort_keys=[(c, "ascending") for c in pks]
        + [(ver, "ascending"), (seq, "ascending")],
        null_placement="at_start",
    )
    t = table.take(idx)
    last = np.zeros(t.num_rows, dtype=bool)
    last[-1] = True
    if t.num_rows > 1:
        boundary = np.zeros(t.num_rows - 1, dtype=bool)
        for c in pks:
            keys = t.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            boundary |= keys[:-1] != keys[1:]
        last[:-1] = boundary
    t = t.filter(pa.array(last))
    if drop_tombstones and tombstone_col in t.column_names:
        t = t.filter(pc.fill_null(pc.invert(t.column(tombstone_col)), True))
    return t


def changes_to_lake_rows(changes: pa.Table, payload_columns: list[str]) -> pa.Table:
    """Normalize the change envelope ``(seq, epoch, op, payload…)`` to the
    lake row shape ``(payload…, _seq, _deleted)``."""
    cols = {name: changes.column(name) for name in payload_columns}
    cols[SEQ_COLUMN] = changes.column("seq").cast(pa.int64())
    if "op" in changes.column_names:
        cols[DELETED_COLUMN] = pc.equal(changes.column("op"), "D")
    else:
        cols[DELETED_COLUMN] = pa.array(np.zeros(changes.num_rows, dtype=bool))
    return pa.table(cols)


def make_envelope_aligner(
    lake_root: str, table_name: str, src_ver: int, dst_ver: int
) -> Callable[[pa.Table], pa.Table] | None:
    """Batch transform upgrading an epoch's envelope batches written under an
    older schema version to the current one (preserves seq/epoch/op)."""
    if src_ver == dst_ver:
        return None

    def align(batch: pa.Table) -> pa.Table:
        from ..state.registry import SchemaStore

        meta_cols = [c for c in ("seq", "epoch", "op") if c in batch.column_names]
        payload = batch.drop_columns(meta_cols)
        aligned = SchemaStore(lake_root, table_name).align(
            payload, source_version=src_ver, target_version=dst_ver
        )
        for c in meta_cols:
            aligned = aligned.append_column(c, batch.column(c))
        return aligned

    return align


def make_partitioner(
    pk: str | list[str],
    num_partitions: int,
    *,
    ver: str | None = None,
    pre_reduce: bool = True,
    payload_columns: list[str] | None = None,
    enrich: bool = False,
    text_column: str = "text",
    extract_text: bool = False,
    html_column: str = "html",
    pre_transform: Callable[[pa.Table], pa.Table] | None = None,
    pack: bool = False,
) -> Callable[[pa.Table], pa.Table]:
    """``map_batches`` stage: envelope → lake rows + ``_part`` routing column.

    With ``pre_reduce`` (merge tables), each batch is LWW-compacted before
    the shuffle — the combiner that collapses hot-key update bursts so the
    all-to-all exchange moves one row per (key, batch) instead of every
    change (SURVEY.md §4 skew/pre-aggregation row).

    With ``enrich``, each surviving row is annotated in-flight with the
    text-analysis columns (``lang_id, quality, n_tokens, fingerprint``) —
    after the pre-reduce, so superseded versions are never annotated.

    With ``pack``, the batch is grouped by ``_part`` and serialized into
    ONE Arrow-IPC envelope row per partition: the sort exchange then moves
    ~(blocks × partitions) opaque binary rows instead of millions of wide
    rows, skipping the per-row take/copy cost of sorting string-heavy
    payloads (the data bytes still move — once, as contiguous buffers).
    The merger unpacks transparently.
    """

    def fn(batch: pa.Table) -> pa.Table:
        if pre_transform is not None:
            batch = pre_transform(batch)
        if payload_columns is not None:
            batch = changes_to_lake_rows(batch, payload_columns)
        if pre_reduce and ver is not None:
            batch = lww_compact(batch, pk, ver, SEQ_COLUMN)
        if extract_text:
            # derive the text column from the raw html payload in-flight
            # (north-star invariant: byte-identical extracted text per url;
            # null html — tombstones — stays null text).  After the
            # pre-reduce so superseded versions are never extracted.
            from ..functions.html import extract_text_html

            arr = extract_text_html(batch.column(html_column))
            idx = batch.schema.get_field_index(text_column)
            if idx >= 0:
                batch = batch.set_column(idx, text_column, arr)
            else:
                batch = batch.append_column(text_column, arr)
        if enrich:
            from ..functions.text import enrich_text_columns

            batch = enrich_text_columns(batch, text_column)
        pks = _pk_list(pk)
        if len(pks) == 1:
            parts = partition_ids(batch.column(pks[0]), num_partitions)
        else:
            from ..functions.hashing import composite_partition_ids

            parts = composite_partition_ids(batch, pks, num_partitions)
        if not pack:
            return batch.append_column("_part", pa.array(parts, type=pa.int64()))
        return pack_by_part(batch, np.asarray(parts))

    return fn


def _table_digest(t: pa.Table) -> str:
    """Deterministic content digest for replay-equivalence checks."""
    h = hashlib.sha256()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    h.update(sink.getvalue())
    return h.hexdigest()


def stat_encode(v) -> int | float | str | None:
    """Canonical JSON encoding for one zone-map bound: ints/floats/strings
    pass through, temporal values become their STORAGE-UNIT integer (us for
    the lake's timestamp[us] columns, days for date32), bools become 0/1.
    Both the manifest writer and ``read_table(range_filter=…)`` bounds go
    through this, so comparisons happen in one consistent domain."""
    if isinstance(v, pa.Scalar):
        if pa.types.is_timestamp(v.type) or pa.types.is_date(v.type):
            return None if v.as_py() is None else v.value
        v = v.as_py()
    if isinstance(v, bool):
        return int(v)
    if v is None or isinstance(v, (int, float, str)):
        return v
    import datetime

    if isinstance(v, datetime.datetime):
        return pa.scalar(v, type=pa.timestamp("us")).value
    if isinstance(v, datetime.date):
        return pa.scalar(v, type=pa.date32()).value
    raise TypeError(f"unsupported zone-map bound type: {type(v).__name__}")


_STAT_TYPES = (
    pa.types.is_integer, pa.types.is_floating, pa.types.is_timestamp,
    pa.types.is_date, pa.types.is_string, pa.types.is_large_string,
    pa.types.is_boolean,
)


# Long string columns (html/text payloads) are poor zone-map candidates:
# nobody range-filters on them, pc.min_max pays full-column bandwidth, and
# the stored bounds would put multi-KB strings in every manifest.  Skip
# string columns whose average value exceeds this many bytes (cheap O(1)
# check via Arrow buffer sizes); short keys like url/event_type stay.
_STRING_STAT_MAX_AVG_BYTES = 64
# Hard cap on a stored string bound — a column whose min/max exceeds this
# is dropped from the zone map entirely (omitted = unprunable; truncating
# a max bound without incrementing it would be UNSAFE).
_STRING_STAT_MAX_BOUND = 256


def _file_column_stats(t: pa.Table) -> dict:
    """Zone-map entry for one committed file: ``{col: [min, max]}`` over
    primitive columns (nulls skipped; an all-null column records
    ``[None, None]``, which readers may prune for any range predicate).
    Nested/binary columns — and string columns with long payloads, see
    ``_STRING_STAT_MAX_AVG_BYTES`` — are omitted; readers treat missing
    as unprunable."""
    out: dict = {}
    for name in t.column_names:
        typ = t.schema.field(name).type
        if not any(check(typ) for check in _STAT_TYPES):
            continue
        if t.num_rows == 0:
            out[name] = [None, None]
            continue
        col = t.column(name)
        is_str = pa.types.is_string(typ) or pa.types.is_large_string(typ)
        if is_str:
            # value-buffer bytes only (exclude offsets/validity): sum of
            # the last buffer of each chunk — O(chunks), no data pass.
            data_bytes = sum(
                b.size for c in col.chunks for b in (c.buffers()[-1],) if b
            )
            if data_bytes / t.num_rows > _STRING_STAT_MAX_AVG_BYTES:
                continue
        mm = pc.min_max(col)
        lo, hi = stat_encode(mm["min"]), stat_encode(mm["max"])
        if is_str and any(
            isinstance(b, str) and len(b) > _STRING_STAT_MAX_BOUND
            for b in (lo, hi)
        ):
            continue
        out[name] = [lo, hi]
    return out


def _atomic_write_parquet(t: pa.Table, path: Path) -> int:
    """Deterministic parquet bytes via fixed writer settings; tmp + rename so
    a crashed/retried task never leaves a partial file visible."""
    path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    os.close(fd)
    pq.write_table(t, tmp, compression="zstd", write_statistics=True)
    size = os.path.getsize(tmp)
    os.replace(tmp, path)
    return size


def _stats_row(
    table: str,
    epoch: int,
    partition: int,
    *,
    rows: int,
    nbytes: int,
    files: int,
    changes_in: int,
    skipped: bool,
    digest: str,
) -> pa.Table:
    return pa.table(
        {
            "table": [table],
            "epoch": [epoch],
            "partition": [partition],
            "rows": [rows],
            "bytes": [nbytes],
            "files": [files],
            "changes_in": [changes_in],
            "skipped": [skipped],
            "digest": [digest],
        },
        schema=STATS_SCHEMA,
    )


def _align_lake_table(
    t: pa.Table, lake_root: str, table_name: str, src_ver: int, dst_ver: int
) -> pa.Table:
    """Rewrite a snapshot table from schema version src → dst, preserving
    the engine meta columns (they are outside the registered schema)."""
    if src_ver == dst_ver:
        return t
    from ..state.registry import SchemaStore

    meta_cols = [c for c in (SEQ_COLUMN, DELETED_COLUMN) if c in t.column_names]
    payload = t.drop_columns(meta_cols)
    store = SchemaStore(lake_root, table_name)
    aligned = store.align(payload, source_version=src_ver, target_version=dst_ver)
    for c in meta_cols:
        aligned = aligned.append_column(c, t.column(c))
    return aligned


def make_partition_merger(
    lake_root: str,
    table_name: str,
    *,
    generation: int,
    epoch: int,
    mode: str,
    pk: str | list[str],
    ver: str,
    compute_digest: bool = True,
    schema_version: int = 0,
    strategy: str = "snapshot",
    compact_every: int = 8,
    include_prev: bool = True,
    covers_epoch: int = -1,
) -> Callable[[pa.Table], pa.Table]:
    """Per-partition merge/commit task for ``groupby('_part').map_groups``.

    ``strategy``:

    - ``"snapshot"`` (default): each epoch rewrites the touched partition's
      full compacted snapshot — reads stay trivial, write amplification is
      O(partition size) per touched epoch.
    - ``"delta"`` (LSM-style): each epoch writes ONLY the compacted incoming
      changes as a delta file stacked on the previous file set; when a
      partition accumulates ``compact_every`` files, the task compacts them
      into one snapshot.  Write amplification drops to O(changes) per epoch
      (amortized O(partition/compact_every)); readers LWW-compact the file
      stack per partition (see ``read_table``).  The correct choice at
      10^10-event scale where epochs touch a small fraction of each
      partition's keys.

    Exactly-once: if the (generation, epoch, partition) manifest already
    exists (resume, Ray task retry, speculative re-execution) the task is a
    no-op that reports the committed stats.  Otherwise it writes the new
    snapshot file atomically and commits the manifest via CAS; losing the CAS
    (a concurrent duplicate task) is also a no-op.

    The task's input is fully determined by (partition id, epoch changes,
    previous committed snapshot), so re-running it yields byte-identical
    output — the replay-equivalence invariant.
    """

    def merge(group: pa.Table, *, partition: int | None = None) -> pa.Table:
        # partition override: maintenance rewrites (delete_rows) may hand in
        # a 0-row group (every row of the partition removed) where the
        # usual first-row _part probe has nothing to read
        part = (
            partition
            if partition is not None
            else int(group.column("_part")[0].as_py())
        )
        if "_ipc" in group.column_names:
            # packed exchange (make_partitioner(pack=True)): unpack the
            # per-batch IPC envelopes back into lake rows.  Envelope schemas
            # are expected to be identical within a partition group (callers
            # route schema-evolution epochs through the envelope aligner);
            # check before concat so a future mis-packing caller fails with
            # a diagnosable message, not an opaque concat error.
            tables = [ipc_table(b) for b in group.column("_ipc").to_pylist()]
            first_schema = tables[0].schema
            for t in tables[1:]:
                if not t.schema.equals(first_schema):
                    raise ValueError(
                        f"packed IPC envelopes for table {table_name!r} "
                        f"partition {part} epoch {epoch} carry mismatched "
                        f"schemas ({first_schema.names} vs {t.schema.names}); "
                        "align envelope schemas (run the schema aligner) "
                        "before packing a schema-evolution epoch"
                    )
            unpacked = pa.concat_tables(tables)
            group = unpacked.append_column(
                "_part",
                pa.array(np.full(unpacked.num_rows, part, dtype=np.int64)),
            )
        store = ManifestStore(lake_root, table_name)
        existing = store.get(generation, epoch, part)
        if existing is not None:
            return _stats_row(
                table_name, epoch, part,
                rows=existing.row_count, nbytes=existing.byte_count,
                files=len(existing.files), changes_in=group.num_rows,
                skipped=True, digest=existing.digest,
            )

        changes = group.drop_columns(["_part"])
        prev = store.latest_snapshot(generation, part, max_epoch=epoch - 1)
        prev_max_seq = prev.max_seq if prev is not None else -1

        # single source of truth for the delta-commit decision (the write
        # path and the manifest path below must agree or manifests would
        # disagree with the written file set)
        is_delta_commit = bool(
            mode == "append_dedup"
            and strategy == "delta"
            and prev is not None
            and prev.files
            and len(prev.files) + 1 < compact_every
            and prev.schema_version == schema_version  # evolution forces compaction
        )

        keys_changed = -1
        if mode in ("append", "overwrite"):
            # A2: keep every event; idempotence on re-delivery via the
            # per-partition seq watermark + in-epoch seq dedup (the raw-id
            # dedup role of destination.go:329-335, keyed by the replay-
            # deterministic seq instead of rescanning committed data).
            changes = changes.filter(
                pc.greater(changes.column(SEQ_COLUMN), pa.scalar(prev_max_seq))
            )
            idx = pc.sort_indices(changes, sort_keys=[(SEQ_COLUMN, "ascending")])
            changes = changes.take(idx)
            seqs = changes.column(SEQ_COLUMN).to_numpy(zero_copy_only=False)
            if len(seqs) > 1:
                keep = np.empty(len(seqs), dtype=bool)
                keep[0] = True
                keep[1:] = seqs[1:] != seqs[:-1]
                changes = changes.filter(pa.array(keep))
            merged = changes
            keys_changed = merged.num_rows  # post-seq-dedup event count
        elif is_delta_commit:
            # delta commit: persist only this epoch's compacted changes; the
            # logical partition state is the LWW fold over the file stack
            merged = lww_compact(changes, pk, ver, SEQ_COLUMN)
            keys_changed = merged.num_rows
        else:  # append_dedup → full LWW merge (snapshot, or delta compaction)
            # pre-compact this epoch's changes before folding in prev (LWW
            # is associative — hypothesis-pinned — so the merge result is
            # identical) to get the deterministic keys_changed count free
            changes = lww_compact(changes, pk, ver, SEQ_COLUMN)
            keys_changed = changes.num_rows
            pieces = [changes]
            if include_prev and prev is not None and prev.files:
                prev_t = pa.concat_tables(
                    pq.read_table(Path(lake_root) / f) for f in prev.files
                )
                # in-flight schema upgrade: snapshots written under an older
                # registry version are rewritten (add→null-fill, widen→cast,
                # rename-by-id) before the merge
                prev_t = _align_lake_table(
                    prev_t, lake_root, table_name, prev.schema_version, schema_version
                )
                # permissive union by name: prev may lack columns the changes
                # carry (e.g. enrichment enabled later) and vice versa —
                # missing columns null-fill instead of raising
                pieces.append(prev_t)
            combined = pa.concat_tables(pieces, promote_options="permissive")
            merged = lww_compact(combined, pk, ver, SEQ_COLUMN)
        files: list[str] = []
        nbytes = 0
        max_seq = prev_max_seq
        # zone map: delta commits retain prev files, so carry their stats
        file_stats: dict = (
            dict(prev.stats) if is_delta_commit and prev is not None else {}
        )
        if merged.num_rows or mode == "append_dedup":
            rel = (
                f"{table_name}/gen={generation:04d}/parts/p={part:05d}/"
                f"e{epoch:06d}.parquet"
            )
            nbytes = _atomic_write_parquet(merged, Path(lake_root) / rel)
            file_stats[rel] = _file_column_stats(merged)
            if is_delta_commit:
                files = list(prev.files) + [rel]
            else:
                files.append(rel)
        if merged.num_rows:
            max_seq = max(
                prev_max_seq, int(pc.max(merged.column(SEQ_COLUMN)).as_py())
            )
        if mode == "append_dedup":
            if is_delta_commit:
                # physical rows in the stack (logical count materializes at
                # compaction); delta stacks skip the digest for the same reason
                row_count = (prev.row_count if prev is not None else 0) + merged.num_rows
            else:
                row_count = merged.num_rows
        else:
            row_count = (prev.row_count if prev is not None else 0) + merged.num_rows
            # append manifests are additive: files = only the new file
        digest = _table_digest(merged) if compute_digest and not is_delta_commit else ""

        m = PartitionManifest(
            table=table_name,
            generation=generation,
            epoch=epoch,
            partition=part,
            files=files,
            row_count=row_count,
            byte_count=nbytes,
            max_seq=max_seq,
            digest=digest,
            mode=mode,
            schema_version=schema_version,
            covers_epoch=covers_epoch,
            stats=file_stats,
            keys_changed=keys_changed,
        )
        store.commit(m)  # CAS: losing to a concurrent duplicate is fine
        return _stats_row(
            table_name, epoch, part,
            rows=row_count, nbytes=nbytes, files=len(files),
            changes_in=group.num_rows, skipped=False, digest=digest,
        )

    return merge
