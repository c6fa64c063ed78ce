"""Catalog validation tests (M11, M12) + protocol parsing (M1, M2, M9)."""

import json

import pytest

from airbyte_destination_ray.catalog import (
    Catalog,
    CatalogError,
    ConfiguredStream,
    SyncMode,
    catalog_from_json,
    check,
    load_config,
    spec,
)
from airbyte_destination_ray.protocol import ProtocolError, iter_messages, parse_message
from airbyte_destination_ray.schema import EXTRACTED_AT_COLUMN, RAW_ID_COLUMN


def make_stream(**kw):
    defaults = dict(
        name="s",
        json_schema={"properties": {"id": {"type": "integer"}}},
        destination_sync_mode=SyncMode.APPEND,
    )
    defaults.update(kw)
    return ConfiguredStream(**defaults)


def test_pk_shape_validation():
    s = make_stream(primary_key=[["a", "b"]])
    with pytest.raises(CatalogError, match="exactly one element"):
        s.validate()


def test_append_dedup_requires_pk():
    s = make_stream(destination_sync_mode=SyncMode.APPEND_DEDUP, primary_key=[])
    with pytest.raises(CatalogError, match="requires at least one primary key"):
        s.validate()


def test_mode_vs_table_compat():
    dedup = make_stream(destination_sync_mode=SyncMode.APPEND_DEDUP, primary_key=[["id"]])
    with pytest.raises(CatalogError):
        dedup.validate_against_table(unique_id=RAW_ID_COLUMN, pk_ordered=False)
    append = make_stream(destination_sync_mode=SyncMode.APPEND)
    with pytest.raises(CatalogError):
        append.validate_against_table(unique_id="id", pk_ordered=True)
    # compatible combinations pass
    dedup.validate_against_table(unique_id="id", pk_ordered=True)
    append.validate_against_table(unique_id=RAW_ID_COLUMN, pk_ordered=False)


def test_cursor_defaults_to_extracted_at():
    assert make_stream().cursor == EXTRACTED_AT_COLUMN
    assert make_stream(cursor_field=["updated_at"]).cursor == "updated_at"


def test_full_reset_flag():
    ow = make_stream(destination_sync_mode=SyncMode.OVERWRITE)
    ap = make_stream(destination_sync_mode=SyncMode.APPEND)
    assert Catalog([ow, ow]).is_full_reset
    assert not Catalog([ow, ap]).is_full_reset
    assert not Catalog([]).is_full_reset


def test_catalog_from_json_roundtrip():
    raw = {
        "streams": [
            {
                "stream": {
                    "name": "deduped stream",
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
            }
        ]
    }
    cat = catalog_from_json(raw)
    s = cat.streams[0]
    assert s.table_name == "deduped stream"
    assert s.pk_columns == ["id"]
    schema = s.arrow_schema()
    assert schema.field("id").nullable is False


def test_spec_and_check(tmp_path):
    sp = spec()
    assert sp["supported_destination_sync_modes"] == ["overwrite", "append", "append_dedup"]
    assert sp["supportsIncremental"] is True
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps({"lake_root": str(tmp_path / "lake")}))
    cfg = load_config(cfg_path)
    ok, msg = check(cfg)
    assert ok, msg


def test_parse_message_types():
    rec = parse_message(
        '{"type":"RECORD","record":{"stream":"tacos","emitted_at":123,"data":{"id":1}}}', 0
    )
    assert rec.record.stream == "tacos" and rec.record.emitted_at == 123
    st = parse_message('{"type":"STATE","state":{"sourceStats":{"recordCount":2}}}', 1)
    assert st.state.with_destination_stats(None)["destinationStats"] == {"recordCount": 2}
    ignored = parse_message('{"type":"LOG","log":{"level":"INFO","message":"x"}}', 2)
    assert ignored.record is None and ignored.state is None
    with pytest.raises(ProtocolError, match="index 3"):
        parse_message("{not json", 3)


def test_record_index_is_global_across_streams():
    lines = [
        '{"type":"RECORD","record":{"stream":"a","emitted_at":1,"data":{}}}',
        '{"type":"STATE","state":{}}',
        '{"type":"RECORD","record":{"stream":"b","emitted_at":2,"data":{}}}',
    ]
    seen = [(i, m.type) for i, m in iter_messages(iter(lines))]
    assert seen == [(0, "RECORD"), (1, "STATE"), (1, "RECORD")]


def test_read_records_dataset_global_indices(ray_session, tmp_path):
    """S1 at scale: parallel per-file NDJSON parse preserves the global
    record numbering (prefix-sum offsets in file order)."""
    import json as _json

    import pyarrow as pa

    from airbyte_destination_ray.sources.ndjson import read_records_dataset

    def rec(stream, i):
        return _json.dumps(
            {
                "type": "RECORD",
                "record": {"stream": stream, "data": {"i": i}, "emitted_at": 1000 + i},
            }
        )

    f1 = tmp_path / "part-0.ndjson"
    f1.write_text(
        "\n".join([rec("a", 0), '{"type":"LOG","log":{}}', rec("a", 1)]) + "\n"
    )
    f2 = tmp_path / "part-1.ndjson"
    f2.write_text("\n".join([rec("b", 2), rec("a", 3), rec("b", 4)]) + "\n")

    ds = read_records_dataset([f1, f2])
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    t = t.sort_by("record_index")
    assert t.column("record_index").to_pylist() == [0, 1, 2, 3, 4]
    assert t.column("stream").to_pylist() == ["a", "a", "b", "a", "b"]
    assert t.column("emitted_at").to_pylist() == [1000, 1001, 1002, 1003, 1004]
