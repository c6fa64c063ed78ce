"""Airbyte-protocol write path tests — golden behaviors from the reference
e2e suite (e2e/main_test.go:47-106) and unit suite (destination_test.go).

Fixture mirrors sample_files/: an overwrite stream (append semantics after
the generation flip, duplicates kept — 8 rows incl. the re-sent id=7) and an
append_dedup stream (pk=id, cursor=updated_at, LWW resolves id=1 to the later
'aeromexico' version — 2 rows)."""

import io
import json

import pyarrow as pa
import pytest

from airbyte_destination_ray.catalog import Catalog, Config, catalog_from_json
from airbyte_destination_ray.pipelines.airbyte_write import run_write
from airbyte_destination_ray.pipelines.cdc import read_table_arrow

CATALOG = {
    "streams": [
        {
            "stream": {
                "name": "airlines",
                "json_schema": {
                    "properties": {
                        "id": {"type": "integer"},
                        "name": {"type": ["null", "string"]},
                    }
                },
            },
            "sync_mode": "full_refresh",
            "destination_sync_mode": "overwrite",
        },
        {
            "stream": {
                "name": "deduped_stream",
                "json_schema": {
                    "properties": {
                        "id": {"type": "integer"},
                        "name": {"type": ["null", "string"]},
                        "updated_at": {"type": "string", "format": "date-time"},
                    }
                },
            },
            "sync_mode": "incremental",
            "destination_sync_mode": "append_dedup",
            "cursor_field": ["updated_at"],
            "primary_key": [["id"]],
        },
    ]
}


def rec(stream, data, emitted_at=1700000000000):
    return json.dumps(
        {
            "type": "RECORD",
            "record": {"stream": stream, "data": data, "emitted_at": emitted_at},
        }
    )


def state(n):
    return json.dumps(
        {
            "type": "STATE",
            "state": {
                "state_type": "STREAM",
                "sourceStats": {"recordCount": float(n)},
            },
        }
    )


def airline(i, name):
    return rec("airlines", {"id": i, "name": name})


def _lines():
    return [
        airline(1, "alpha"),
        airline(2, "beta"),
        airline(3, "gamma"),
        state(3),
        airline(5, "delta"),
        airline(6, "epsilon"),
        airline(7, "zeta"),
        state(3),
        airline(7, "zeta"),  # re-sent duplicate (new record index → kept)
        airline(8, "eta"),
        # LWW pair: id=1, later updated_at must win
        rec(
            "deduped_stream",
            {"id": 1, "name": "oldname", "updated_at": "2024-01-01T00:00:00Z"},
        ),
        rec(
            "deduped_stream",
            {"id": 1, "name": "aeromexico", "updated_at": "2024-02-01T00:00:00Z"},
        ),
        rec(
            "deduped_stream",
            {"id": 2, "name": "other", "updated_at": "2024-01-15T00:00:00Z"},
        ),
        state(5),
    ]


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake")


def run(lake, lines, **kw):
    out = io.StringIO()
    cfg = Config(lake_root=lake)
    catalog = catalog_from_json(CATALOG)
    result = run_write(cfg, catalog, lines, out=out, **kw)
    return result, out.getvalue()


def test_write_goldens(ray_session, lake):
    result, output = run(lake, _lines())
    assert result.records_written == 11
    assert result.states_echoed == 3

    airlines = read_table_arrow(lake, "airlines")
    # e2e golden (main_test.go:70-71): 8 rows, duplicate id=7 kept twice
    assert airlines.num_rows == 8
    ids = sorted(airlines.column("id").to_pylist())
    assert ids == [1, 2, 3, 5, 6, 7, 7, 8]
    # every row has a raw id and the two metadata columns
    assert "_airbyte_raw_id" in airlines.column_names
    assert "_airbyte_extracted_at" in airlines.column_names
    assert airlines.column("_airbyte_raw_id").null_count == 0

    dedup = read_table_arrow(lake, "deduped_stream")
    # e2e golden (main_test.go:86-105): 2 rows; id=1 → later version
    assert dedup.num_rows == 2
    by_id = {
        r["id"]: r for r in dedup.to_pylist()
    }
    assert by_id[1]["name"] == "aeromexico"
    assert by_id[2]["name"] == "other"


def test_state_echo_carries_destination_stats(ray_session, lake):
    _, output = run(lake, _lines())
    states = [
        json.loads(l) for l in output.splitlines() if '"type": "STATE"' in l
        or '"type":"STATE"' in l
    ]
    assert len(states) == 3
    assert states[-1]["state"]["destinationStats"] == {"recordCount": 5.0}


def test_small_flush_boundary(ray_session, lake):
    """destination_test.go:154-182 analog: shrink the flush threshold and
    check 'Max batch size reached' fires and results are unchanged."""
    result, output = run(lake, _lines(), max_records_per_flush=2)
    assert "Max batch size reached" in output
    airlines = read_table_arrow(lake, "airlines")
    assert airlines.num_rows == 8
    dedup = read_table_arrow(lake, "deduped_stream")
    assert dedup.num_rows == 2


def test_dataset_write_rerun_same_epoch_is_noop(ray_session, tmp_path):
    """Re-running the single-pass dataset write for a committed epoch must
    be a no-op (manifest CAS): identical lake state, no duplicates."""
    from airbyte_destination_ray.pipelines.airbyte_write import run_write_dataset

    lines = [l for l in _lines() if '"STATE"' not in l]
    f = tmp_path / "in.ndjson"
    f.write_text("\n".join(lines) + "\n")
    lake = str(tmp_path / "lake")
    cfg = Config(lake_root=lake)
    run_write_dataset(cfg, catalog_from_json(CATALOG), [str(f)], num_partitions=4)
    before_a = read_table_arrow(lake, "airlines").sort_by("id")
    before_d = read_table_arrow(lake, "deduped_stream").sort_by("id")
    run_write_dataset(cfg, catalog_from_json(CATALOG), [str(f)], num_partitions=4)
    assert read_table_arrow(lake, "airlines").sort_by("id").equals(before_a)
    assert read_table_arrow(lake, "deduped_stream").sort_by("id").equals(before_d)


def test_byte_flush_boundary(ray_session, lake):
    """destination_test.go:171-182 analog: shrink the byte budget (the
    reference shrinks maxBytesPerBatch to 2,500) and check the byte side of
    the dual trigger fires, all three state echoes still arrive, and the
    lake goldens are unchanged."""
    result, output = run(lake, _lines(), max_bytes_per_flush=150)
    assert "Max batch size reached" in output
    assert result.states_echoed == 3
    assert read_table_arrow(lake, "airlines").num_rows == 8
    assert read_table_arrow(lake, "deduped_stream").num_rows == 2


def test_byte_budget_smaller_than_one_record_still_writes(ray_session, lake):
    """A single record larger than the byte budget is still buffered and
    flushed (the reference flushes the — empty — current batch and then
    appends; nothing is dropped)."""
    result, output = run(lake, _lines(), max_bytes_per_flush=10)
    assert result.records_written == 11
    assert read_table_arrow(lake, "airlines").num_rows == 8
    assert read_table_arrow(lake, "deduped_stream").num_rows == 2


def test_record_error_policy_raise_and_log(ray_session, lake):
    """destination.go:485-489 analog: per-event errors are logged and
    swallowed under on_record_error='log'; the default stays fail-fast."""
    bad = rec("airlines", {"id": "not-an-int", "name": "broken"})
    lines = [airline(1, "alpha"), bad, airline(2, "beta"), state(1)]
    with pytest.raises(Exception):
        run(lake + "_raise", lines)
    result, output = run(lake, lines, on_record_error="log")
    assert "failed to store event" in output
    t = read_table_arrow(lake, "airlines")
    assert sorted(t.column("id").to_pylist()) == [1, 2]


def test_overwrite_clears_previous_sync(ray_session, lake):
    run(lake, _lines())
    # second sync with only one airline: overwrite keeps just the new rows
    result, _ = run(lake, [airline(99, "omega"), state(1)])
    airlines = read_table_arrow(lake, "airlines")
    assert airlines.column("id").to_pylist() == [99]
    # dedup stream (not overwrite) keeps its rows
    assert read_table_arrow(lake, "deduped_stream").num_rows == 2


def test_replay_same_input_is_idempotent_for_dedup(ray_session, lake):
    run(lake, _lines())
    before = read_table_arrow(lake, "deduped_stream")
    run(lake, _lines())
    after = read_table_arrow(lake, "deduped_stream")
    assert after.num_rows == before.num_rows == 2


def test_unknown_stream_fails(ray_session, lake):
    with pytest.raises(KeyError):
        run(lake, [rec("nope", {"id": 1})])


def test_full_reset_drops_tables(ray_session, tmp_path):
    lake = str(tmp_path / "lake2")
    overwrite_only = {
        "streams": [
            {
                "stream": {
                    "name": "airlines",
                    "json_schema": {"properties": {"id": {"type": "integer"}}},
                },
                "destination_sync_mode": "overwrite",
            }
        ]
    }
    out = io.StringIO()
    cfg = Config(lake_root=lake)
    run_write(cfg, catalog_from_json(overwrite_only), [airline(1, "x"), state(1)], out=out)
    from pathlib import Path

    assert (Path(lake) / "airlines" / "_meta.json").exists()
    # zero-record all-overwrite sync → A4 full reset
    run_write(cfg, catalog_from_json(overwrite_only), [], out=out)
    assert not (Path(lake) / "airlines").exists()


def test_dataset_write_matches_sequential(ray_session, tmp_path):
    """The distributed Dataset write path produces the same lake state as
    the protocol-faithful sequential path for the dedup stream."""
    import json as _json

    # NDJSON part-files (records only — Dataset path is the bulk loader)
    lines = [l for l in _lines() if '"STATE"' not in l]
    f1 = tmp_path / "part-0.ndjson"
    f1.write_text("\n".join(lines[:6]) + "\n")
    f2 = tmp_path / "part-1.ndjson"
    f2.write_text("\n".join(lines[6:]) + "\n")

    from airbyte_destination_ray.pipelines.airbyte_write import run_write_dataset

    lake_seq = str(tmp_path / "lake_seq")
    run(lake_seq, lines)
    lake_ds = str(tmp_path / "lake_ds")
    cfg = Config(lake_root=lake_ds)
    summary = run_write_dataset(
        cfg, catalog_from_json(CATALOG), [str(f1), str(f2)], num_partitions=4
    )
    assert set(summary) == {"airlines", "deduped_stream"}

    for table in ("airlines", "deduped_stream"):
        a = read_table_arrow(lake_seq, table)
        b = read_table_arrow(lake_ds, table)
        cols = [c for c in a.column_names if not c.startswith("_airbyte")]
        assert a.select(cols).sort_by("id").equals(
            b.select(cols).sort_by("id").cast(a.select(cols).schema)
        )
    # raw ids identical too (same global record numbering)
    a = read_table_arrow(lake_seq, "deduped_stream").sort_by("id")
    b = read_table_arrow(lake_ds, "deduped_stream").sort_by("id")
    assert a.column("_airbyte_raw_id").equals(b.column("_airbyte_raw_id"))


def test_go_json_size_matches_go_marshal():
    """Flush byte accounting parity with Go's json.Marshal
    (destination.go:428-433): HTML-safe escaping of < > & to 6-byte
    \\u00XX sequences, raw UTF-8 for non-ASCII (never \\uXXXX-escaped)."""
    from airbyte_destination_ray.pipelines.airbyte_write import go_json_size

    # plain ASCII: same as compact json.dumps
    assert go_json_size({"a": 1}) == len('{"a":1}')
    # '<b>&' -> Go emits <b>& (6+1+6+6 = 19 bytes in-string)
    assert go_json_size({"a": "<b>&"}) == len('{"a":"') + 19 + len('"}')
    # non-ASCII: Go emits raw UTF-8 ('é' = 2 bytes), not é
    assert go_json_size({"a": "é"}) == len('{"a":"') + 2 + len('"}')
    # U+2028 (3 bytes raw) is HTML-escaped by Go to 6 bytes
    assert go_json_size({"a": " "}) == len('{"a":"') + 6 + len('"}')


def test_emit_records_round_trip(ray_session, lake, tmp_path):
    """Destination-as-source: emit the committed lake state back as
    RECORD NDJSON, re-ingest it into a FRESH lake, and the visible DATA
    state matches (raw ids regenerate — they encode sync position)."""
    from airbyte_destination_ray.pipelines.airbyte_write import emit_records

    run(lake, _lines())
    catalog = catalog_from_json(CATALOG)
    out = io.StringIO()
    total = 0
    for stream in catalog.streams:
        total += emit_records(lake, stream, out)
    assert total == 10  # 8 airlines + 2 deduped rows survive the merges

    lake2 = str(tmp_path / "lake2")
    emitted_lines = [l for l in out.getvalue().splitlines() if l.strip()]
    # every emitted line parses as a protocol RECORD
    for l in emitted_lines:
        msg = json.loads(l)
        assert msg["type"] == "RECORD" and "data" in msg["record"]
    run(lake2, emitted_lines + [json.dumps(
        {"type": "STATE", "state": {"data": {"cursor": 99}}}
    )])

    for stream in catalog.streams:
        a = read_table_arrow(lake, stream.table_name)
        b = read_table_arrow(lake2, stream.table_name)
        data_cols = sorted(
            c for c in a.column_names if not c.startswith("_airbyte")
        )
        aa = a.select(data_cols).sort_by([(c, "ascending")
                                          for c in data_cols])
        bb = b.select(data_cols).sort_by([(c, "ascending")
                                          for c in data_cols])
        assert aa.equals(bb), stream.name
