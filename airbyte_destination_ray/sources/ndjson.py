"""Parallel NDJSON record source (S1 at scale).

The reference consumes one stdin stream sequentially (destination.go:394).
At 100 TB the input is a directory of NDJSON part-files; this source
parallelizes per file while preserving the reference's replay-critical
GLOBAL record numbering (M4): a cheap first pass counts records per file
(newline scan, no JSON parse), a prefix sum assigns each file its index
offset, then one Ray task per file parses lines into Arrow columns.

STATE barriers are a stream-order concept; this Dataset source targets
record ingestion (epochs come from the binlog/segment layout instead).  The
sequential `run_write` path remains the protocol-faithful stdin consumer.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa

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


@ray.remote
def _count_records(path: str) -> int:
    """RECORD messages in one file.  A RECORD message's JSON necessarily
    contains the substring ``"RECORD"``, so the scan only JSON-parses the
    (few) candidate lines — exact counts at near-newline-scan cost."""
    n = 0
    with open(path, "rb") as f:
        for line in f:
            if b'"RECORD"' not in line:
                continue
            try:
                if json.loads(line).get("type") == "RECORD":
                    n += 1
            except json.JSONDecodeError:
                continue  # the parse pass reports the bad line with its index
    return n


def _parse_file(row: dict) -> pa.Table:
    """One file → one Arrow table of records with global indices."""
    from ..protocol import MESSAGE_TYPE_RECORD, parse_message

    idx = row["index_offset"]
    out = {k: [] for k in ("record_index", "namespace", "stream", "emitted_at", "data_json")}
    with open(row["path"], encoding="utf-8") as f:
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
    return pa.Table.from_pydict(out, schema=RECORDS_SCHEMA)


def read_records_dataset(paths: list[str | Path]) -> "ray.data.Dataset":
    """RECORD messages from NDJSON part-files as a Dataset, with the global
    record index assigned per the file order of ``paths``.

    Two passes: (1) parallel per-file record counts → prefix-sum offsets
    (driver holds one int per file); (2) one parse task per file.
    """
    paths = [str(p) for p in paths]
    counts = ray.get([_count_records.remote(p) for p in paths])
    offsets = []
    acc = 0
    for c in counts:
        offsets.append(acc)
        acc += c
    items = [
        {"path": p, "index_offset": off} for p, off in zip(paths, offsets)
    ]
    files_ds = ray.data.from_items(items)
    return files_ds.map_batches(
        lambda batch: pa.concat_tables(
            [_parse_file(r) for r in batch.to_pylist()]
        ),
        batch_format="pyarrow",
        batch_size=1,
    )
