"""Parallel NDJSON record source (S1 at scale).

The reference consumes one stdin stream sequentially (destination.go:394).
At 100 TB the input is a directory of NDJSON part-files; this source
parallelizes per file while preserving the reference's replay-critical
GLOBAL record numbering (M4) with a SINGLE parse pass: each file is parsed
once into an Arrow table (with file-local indices) held in the object store;
the driver fetches only the per-file record counts, prefix-sums them, and a
vectorized offset-add rewrites the local indices to global ones.

STATE barriers are a stream-order concept; this Dataset source targets
record ingestion (epochs come from the binlog/segment layout instead).  The
sequential `run_write` path remains the protocol-faithful stdin consumer.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

RECORDS_SCHEMA = pa.schema(
    [
        pa.field("record_index", pa.int64(), nullable=False),
        pa.field("namespace", pa.string()),
        pa.field("stream", pa.string(), nullable=False),
        pa.field("emitted_at", pa.int64(), nullable=False),
        pa.field("data_json", pa.string(), nullable=False),
    ]
)


@ray.remote(num_returns=2)
def _parse_file(path: str):
    """One file → (record_count, Arrow table with FILE-LOCAL indices).

    The driver ray.gets only the count; the table stays in the object store.
    """
    from ..protocol import MESSAGE_TYPE_RECORD, parse_message

    out = {k: [] for k in ("record_index", "namespace", "stream", "emitted_at", "data_json")}
    idx = 0
    with open(path, encoding="utf-8") as f:
        for lineno, line in enumerate(f):
            msg = parse_message(line, lineno)
            if msg is None or msg.type != MESSAGE_TYPE_RECORD:
                continue
            r = msg.record
            out["record_index"].append(idx)
            out["namespace"].append(r.namespace)
            out["stream"].append(r.stream)
            out["emitted_at"].append(r.emitted_at)
            out["data_json"].append(json.dumps(r.data, sort_keys=True))
            idx += 1
    return idx, pa.Table.from_pydict(out, schema=RECORDS_SCHEMA)


def read_records_dataset(paths: list[str | Path]) -> "ray.data.Dataset":
    """RECORD messages from NDJSON part-files as a Dataset, with the global
    record index assigned per the file order of ``paths``.

    One parse task per file (single parse pass); the driver pulls only one
    integer per file for the prefix sum; a vectorized per-block add shifts
    the file-local indices to global ones.
    """
    paths = [str(p) for p in paths]
    count_refs, table_refs = [], []
    for p in paths:
        c, t = _parse_file.remote(p)
        count_refs.append(c)
        table_refs.append(t)
    counts = ray.get(count_refs)
    offsets = []
    acc = 0
    for c in counts:
        offsets.append(acc)
        acc += c

    shifted = []
    for off, tref in zip(offsets, table_refs):
        ds = ray.data.from_arrow_refs([tref])
        if off:
            ds = ds.map_batches(
                lambda b, o=off: b.set_column(
                    b.column_names.index("record_index"),
                    RECORDS_SCHEMA.field("record_index"),
                    pc.add(b.column("record_index"), o),
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        shifted.append(ds)
    out = shifted[0]
    for ds in shifted[1:]:
        out = out.union(ds)
    return out
