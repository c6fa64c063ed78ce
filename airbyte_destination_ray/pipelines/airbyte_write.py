"""The Airbyte-protocol ``write`` command — reference flagship (§3.1).

Reproduces the reference's write path (internal/connector/destination.go:
161-470) on the Ray lake engine:

    load config + catalog → per-stream validation/setup →
    scan NDJSON messages in arrival order →
        RECORD: enrich (_airbyte_raw_id via the golden sha256 formula M4,
                _airbyte_extracted_at = emitted_at) → route by
                namespace_stream (M5) → buffer per table (T1)
        buffer full (500 records — maxRecordsBatchSize parity): flush
        STATE: flush ALL buffers → echo state with destinationStats (S6)
    EOF: final flush; all-overwrite sync with 0 records → full reset (A4)

A *flush* runs the stream's buffered records through the same Ray Data
partition+merge machinery as the CDC pipeline (hash-partition by PK →
per-partition LWW merge/append → manifest CAS), so Airbyte sync modes map to
engine semantics exactly:

    append_dedup → LWW upsert, ver = cursor field, seq = record index (A1)
    append       → LWW keyed on _airbyte_raw_id: every distinct event kept
                   (re-sent records get new indices → new raw ids, so exact
                   duplicates in the stream survive, matching the reference
                   e2e golden), while REPLAYED records (same index → same raw
                   id) dedup — exactly A2's "unique id = _airbyte_raw_id"
                   table declaration (destination.go:329-335)
    overwrite    → generation bump at sync start + append semantics (A3)

The global record index (replay-critical, M4) orders flushes too: each flush
commits under a monotonically increasing *flush epoch* that RESUMES from the
lake's committed maximum across syncs (a restarted counter would collide
with prior manifests and silently no-op); checkpoints at STATE barriers
record the last committed flush epoch.
"""

from __future__ import annotations

import json
import sys
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, TextIO

import pyarrow as pa
import pyarrow.compute as pc

from ..catalog import Catalog, Config, ConfiguredStream, SyncMode
from ..functions.ids import raw_ids_for_batch
from ..protocol import MESSAGE_TYPE_RECORD, MESSAGE_TYPE_STATE, iter_messages
from ..schema import EXTRACTED_AT_COLUMN, RAW_ID_COLUMN, is_json_property, property_spec_from_json
from ..stages.lww import make_partition_merger, make_partitioner
from ..state.manifest import ManifestStore

import numpy as np

MAX_RECORDS_PER_FLUSH = 500  # reference maxRecordsBatchSize (destination.go:30)


def emit(out: TextIO, payload: dict) -> None:
    """S5: protocol messages as NDJSON on stdout (logger.go:37-101)."""
    out.write(json.dumps(payload, separators=(",", ":")) + "\n")
    out.flush()


def log(out: TextIO, level: str, message: str) -> None:
    emit(out, {"type": "LOG", "log": {"level": level, "message": message}})


def _convert_column(values: list, prop: dict, name: str) -> pa.Array:
    """One JSON-decoded column → Arrow array per the M7 type mapping."""
    spec = property_spec_from_json(prop)
    if is_json_property(spec):
        return pa.array(
            [None if v is None else json.dumps(v, sort_keys=True) for v in values],
            type=pa.string(),
        )
    from ..schema import arrow_type_for_property

    at = arrow_type_for_property(spec)
    if pa.types.is_timestamp(at) or pa.types.is_date(at):
        return pc.cast(
            pa.array([None if v is None else str(v) for v in values], pa.string()),
            at,
        )
    return pa.array(values, type=at)


def records_to_arrow(
    records: list, stream: ConfiguredStream, record_indices: list[int]
) -> pa.Table:
    """Buffered records → Arrow batch in the stream's schema + metadata
    columns (M3/M4: raw id from the golden formula, extracted_at from
    emitted_at millis)."""
    props = stream.json_schema.get("properties", {})
    cols: dict[str, pa.Array] = {}
    for name, prop in props.items():
        vals = [r.data.get(name) for r in records]
        cols[name] = _convert_column(vals, prop, name)
    idx = np.asarray(record_indices, dtype=np.int64)
    emitted = np.asarray([r.emitted_at for r in records], dtype=np.int64)
    cols[RAW_ID_COLUMN] = pa.array(
        raw_ids_for_batch(stream.namespace, stream.name, idx, emitted),
        type=pa.string(),
    )
    cols[EXTRACTED_AT_COLUMN] = pa.array(
        emitted * 1000, type=pa.timestamp("us", tz="UTC")
    )
    return pa.table(cols)


@dataclass
class _StreamBuffer:
    records: list = field(default_factory=list)
    indices: list[int] = field(default_factory=list)


@dataclass
class WriteResult:
    records_written: int = 0
    flushes: int = 0
    states_echoed: int = 0
    tables: list[str] = field(default_factory=list)


class AirbyteWriter:
    """One sync: stream setup, buffering, flush/merge, state echo."""

    def __init__(
        self,
        config: Config,
        catalog: Catalog,
        *,
        out: TextIO = sys.stdout,
        num_partitions: int = 8,
        max_records_per_flush: int = MAX_RECORDS_PER_FLUSH,
    ):
        self.config = config
        self.catalog = catalog
        self.out = out
        self.num_partitions = num_partitions
        self.max_records = max_records_per_flush
        self.buffers: dict[str, _StreamBuffer] = {}
        self.flush_epoch = 0
        self.generations: dict[str, int] = {}
        self.table_meta: dict[str, dict] = {}
        self.result = WriteResult()

    # -- setup (destination.go:183-255) ------------------------------------
    def setup_streams(self) -> None:
        from ..state.manifest import COMPACTION_EPOCH_BASE

        max_committed_epoch = -1
        for s in self.catalog.streams:
            table = s.table_name
            store = ManifestStore(self.config.lake_root, table)
            if store.exists():
                meta = store.table_meta()
                # M12 compatibility checks against the existing table shape
                pk = meta.get("pk") or []
                pk_ordered = bool(pk) and pk != [RAW_ID_COLUMN]
                unique_id = pk[0] if pk else RAW_ID_COLUMN
                s.validate_against_table(unique_id, pk_ordered)
            store.root.mkdir(parents=True, exist_ok=True)
            is_dedup = s.destination_sync_mode == SyncMode.APPEND_DEDUP
            # every Airbyte table is an LWW table: user PK for append_dedup,
            # the synthetic raw id for append/overwrite (A2) — with the
            # delta strategy so per-flush write cost is O(flush), not
            # O(partition)
            meta = store.init_table(
                num_partitions=self.num_partitions,
                mode="append_dedup",
                pk=s.pk_columns if is_dedup else [RAW_ID_COLUMN],
                cursor=s.cursor if is_dedup else EXTRACTED_AT_COLUMN,
                merge_strategy="delta",
                compact_every=16,
            )
            gen = meta["generation"]
            if s.destination_sync_mode == SyncMode.OVERWRITE:
                # A3: overwrite = metadata flip to a fresh generation
                gen = store.bump_generation()
                log(
                    self.out,
                    "INFO",
                    f"overwrite: table {table} starts generation {gen}",
                )
            self.generations[table] = gen
            self.table_meta[table] = meta
            self.result.tables.append(table)
            # resume the flush-epoch counter past every committed manifest
            for m in store._iter_manifests(gen):
                if m.epoch < COMPACTION_EPOCH_BASE:
                    max_committed_epoch = max(max_committed_epoch, m.epoch)
        self.flush_epoch = max_committed_epoch + 1

    # -- record path (destination.go:421-453) ------------------------------
    def add_record(self, record_index: int, record) -> None:
        from ..functions.ids import table_unique_name

        table = table_unique_name(record.namespace, record.stream)
        if table not in self.generations:
            raise KeyError(
                f"record for unknown stream {table!r} (not in catalog)"
            )
        buf = self.buffers.setdefault(table, _StreamBuffer())
        buf.records.append(record)
        buf.indices.append(record_index)
        self.result.records_written += 1
        if len(buf.records) >= self.max_records:
            log(self.out, "INFO", f"Max batch size reached for {table}, flushing")
            self._flush_table(table)

    # -- flush = Ray Data partition+merge (publishBatch analog) ------------
    def _flush_table(self, table: str) -> None:
        buf = self.buffers.pop(table, None)
        if not buf or not buf.records:
            return
        import ray.data

        stream = self.catalog.stream_by_table()[table]
        batch = records_to_arrow(buf.records, stream, buf.indices)
        # envelope columns for the merge machinery: seq = record index
        batch = batch.append_column(
            "seq", pa.array(buf.indices, type=pa.int64())
        )
        is_dedup = stream.destination_sync_mode == SyncMode.APPEND_DEDUP
        # composite PKs supported end-to-end; append tables key on the raw id
        pk = stream.pk_columns if is_dedup else RAW_ID_COLUMN
        ver = stream.cursor if is_dedup else EXTRACTED_AT_COLUMN
        payload_columns = [c for c in batch.column_names if c != "seq"]
        # the table's persisted partition count is authoritative — routing
        # with a different count would split a PK across partitions
        table_partitions = self.table_meta[table]["num_partitions"]

        ds = ray.data.from_arrow(batch)
        partitioner = make_partitioner(
            pk,
            table_partitions,
            ver=ver,
            pre_reduce=is_dedup,
            payload_columns=payload_columns,
        )
        merger = make_partition_merger(
            self.config.lake_root,
            table,
            generation=self.generations[table],
            epoch=self.flush_epoch,
            mode="append_dedup",
            pk=pk,
            ver=ver,
            compute_digest=False,
            strategy="delta",
            compact_every=16,
        )
        stats = (
            ds.map_batches(partitioner, batch_format="pyarrow", batch_size=None)
            .groupby("_part")
            .map_groups(merger, batch_format="pyarrow")
        )
        stats.count()  # execute
        self.flush_epoch += 1
        self.result.flushes += 1

    def flush_all(self) -> None:
        for table in list(self.buffers):
            self._flush_table(table)

    # -- state barrier (destination.go:402-420) ----------------------------
    def on_state(self, state) -> None:
        self.flush_all()
        # checkpoint the last COMMITTED flush epoch (flush_epoch points one
        # past it); no flush yet → nothing durable to checkpoint
        if self.flush_epoch > 0:
            for table, gen in self.generations.items():
                store = ManifestStore(self.config.lake_root, table)
                store.write_checkpoint(
                    gen,
                    self.flush_epoch - 1,
                    {"records_written": self.result.records_written},
                )
        emit(
            self.out,
            {
                "type": "STATE",
                "state": state.with_destination_stats(
                    float(self.result.records_written)
                ),
            },
        )
        self.result.states_echoed += 1

    # -- full reset (A4, destination.go:262-268, 516-574) ------------------
    def maybe_full_reset(self) -> None:
        if self.catalog.is_full_reset and self.result.records_written == 0:
            for s in self.catalog.streams:
                ManifestStore(self.config.lake_root, s.table_name).drop_table()
                log(self.out, "INFO", f"full reset: dropped {s.table_name}")


def _record_batch_to_stream_table(
    batch: pa.Table, stream: ConfiguredStream
) -> pa.Table:
    """A batch of parsed protocol records (``RECORDS_SCHEMA`` from
    ``sources.ndjson``) → the stream's typed Arrow shape + metadata columns
    + ``seq``.  JSON decode of ``data_json`` is the per-row parse boundary
    (same boundary the reference pays per line); everything after is
    columnar."""
    datas = [json.loads(s) for s in batch.column("data_json").to_pylist()]
    props = stream.json_schema.get("properties", {})
    cols: dict[str, pa.Array] = {}
    for name, prop in props.items():
        cols[name] = _convert_column([d.get(name) for d in datas], prop, name)
    idx = batch.column("record_index").to_numpy(zero_copy_only=False)
    emitted = batch.column("emitted_at").to_numpy(zero_copy_only=False)
    cols[RAW_ID_COLUMN] = pa.array(
        raw_ids_for_batch(stream.namespace, stream.name, idx, emitted),
        type=pa.string(),
    )
    cols[EXTRACTED_AT_COLUMN] = pa.array(
        emitted * 1000, type=pa.timestamp("us", tz="UTC")
    )
    cols["seq"] = pa.array(idx, type=pa.int64())
    return pa.table(cols)


def run_write_dataset(
    config: Config,
    catalog: Catalog,
    paths: list[str],
    *,
    num_partitions: int = 32,
    epoch: int = 0,
) -> dict:
    """The write command as a fully-distributed Ray Data pipeline (S1 at
    scale): NDJSON part-files → parallel parse with global record indices →
    per-stream typed conversion → hash-partition → per-partition merge with
    manifest CAS.  One call = one epoch (idempotent; re-running a committed
    epoch is a no-op).

    Use this for bulk/backfill loads; the sequential :func:`run_write` is the
    protocol-faithful stdin path (STATE barriers, stdout echo).
    """
    from ..functions.ids import table_unique_name
    from ..sources.ndjson import read_records_dataset

    catalog.validate()
    # materialize the parsed records once — per-stream pipelines below would
    # otherwise re-execute the full parse per stream (object store holds the
    # parsed columns, spilling to disk as needed)
    records = read_records_dataset(paths).materialize()

    # fail fast on records for unconfigured streams — parity with the
    # sequential path's KeyError (a silent filter would lose data)
    seen = set()
    for b in records.map_batches(
        lambda t: t.select(["stream", "namespace"]),
        batch_format="pyarrow",
        batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        seen.update(
            zip(b.column("namespace").to_pylist(), b.column("stream").to_pylist())
        )
    configured = {s.table_name for s in catalog.streams}
    unknown = {
        table_unique_name(ns or "", st)
        for ns, st in seen
        if table_unique_name(ns or "", st) not in configured
    }
    if unknown:
        raise KeyError(
            f"records for unconfigured streams: {sorted(unknown)}"
        )

    summary: dict[str, int] = {}
    for stream in catalog.streams:
        table = stream.table_name
        store = ManifestStore(config.lake_root, table)
        store.root.mkdir(parents=True, exist_ok=True)
        is_dedup = stream.destination_sync_mode == SyncMode.APPEND_DEDUP
        meta = store.init_table(
            num_partitions=num_partitions,
            mode="append_dedup",
            pk=stream.pk_columns if is_dedup else [RAW_ID_COLUMN],
            cursor=stream.cursor if is_dedup else EXTRACTED_AT_COLUMN,
            merge_strategy="delta",
            compact_every=16,
        )
        pk = stream.pk_columns if is_dedup else RAW_ID_COLUMN
        ver = stream.cursor if is_dedup else EXTRACTED_AT_COLUMN

        name, ns = stream.name, stream.namespace

        def to_stream(batch: pa.Table, s=stream, nm=name, nsp=ns) -> pa.Table:
            import pyarrow.compute as _pc

            mask = _pc.and_(
                _pc.equal(batch.column("stream"), nm),
                _pc.equal(_pc.fill_null(batch.column("namespace"), ""), nsp),
            )
            return _record_batch_to_stream_table(batch.filter(mask), s)

        converted = records.map_batches(to_stream, batch_format="pyarrow")
        payload_columns = (
            list(stream.json_schema.get("properties", {}))
            + [RAW_ID_COLUMN, EXTRACTED_AT_COLUMN]
        )
        partitioner = make_partitioner(
            pk,
            meta["num_partitions"],
            ver=ver,
            pre_reduce=is_dedup,
            payload_columns=payload_columns,
        )
        merger = make_partition_merger(
            config.lake_root,
            table,
            generation=meta["generation"],
            epoch=epoch,
            mode="append_dedup",
            pk=pk,
            ver=ver,
            compute_digest=False,
            strategy="delta",
            compact_every=16,
        )
        stats = (
            converted.map_batches(partitioner, batch_format="pyarrow", batch_size=None)
            .groupby("_part")
            .map_groups(merger, batch_format="pyarrow")
        )
        summary[table] = stats.count()
        store.write_checkpoint(meta["generation"], epoch, {"streams": [table]})
    return summary


def run_write(
    config: Config,
    catalog: Catalog,
    lines: Iterable[str],
    *,
    out: TextIO = sys.stdout,
    num_partitions: int = 8,
    max_records_per_flush: int = MAX_RECORDS_PER_FLUSH,
) -> WriteResult:
    """Full write command over an NDJSON message stream."""
    catalog.validate()
    writer = AirbyteWriter(
        config,
        catalog,
        out=out,
        num_partitions=num_partitions,
        max_records_per_flush=max_records_per_flush,
    )
    writer.setup_streams()
    for record_index, msg in iter_messages(iter(lines)):
        if msg.type == MESSAGE_TYPE_RECORD:
            writer.add_record(record_index, msg.record)
        elif msg.type == MESSAGE_TYPE_STATE:
            writer.on_state(msg.state)
        # other message types ignored (M2)
    writer.flush_all()
    writer.maybe_full_reset()
    return writer.result
