"""Type-conversion matrix tests, mirroring reference types_test.go:12-70."""

import pyarrow as pa
import pytest

from airbyte_destination_ray.schema import (
    EXTRACTED_AT_COLUMN,
    RAW_ID_COLUMN,
    PropertySpec,
    UnsupportedTypeError,
    VersionedSchema,
    align_table,
    arrow_type_for_property,
    build_table_schema,
    property_spec_from_json,
    strip_null_types,
)


@pytest.mark.parametrize(
    "types,fmt,expected",
    [
        ((), "", pa.string()),                      # no types → string default
        (("null",), "", pa.string()),               # only null → string default
        (("string", "integer"), "", pa.string()),   # multiple types → string
        (("null", "string", "integer"), "", pa.string()),
        (("string",), "", pa.string()),
        (("string",), "date", pa.date32()),
        (("string",), "date-time", pa.timestamp("us", tz="UTC")),
        (("string",), "time", pa.string()),
        (("null", "string"), "date-time", pa.timestamp("us", tz="UTC")),
        (("boolean",), "", pa.bool_()),
        (("number",), "", pa.float64()),
        (("integer",), "", pa.int64()),
        (("object",), "", pa.string()),             # JSON column
        (("array",), "", pa.string()),              # JSON column
    ],
)
def test_type_matrix(types, fmt, expected):
    assert arrow_type_for_property(PropertySpec(types=types, format=fmt)) == expected


def test_unknown_type_is_hard_error():
    with pytest.raises(UnsupportedTypeError):
        arrow_type_for_property(PropertySpec(types=("geometry",)))


def test_strip_null():
    assert strip_null_types(("null", "string", "null")) == ("string",)


def test_property_normalization_single_and_list():
    # PropTypes.UnmarshalJSON parity (protocol.go:171-188)
    assert property_spec_from_json({"type": "string"}).types == ("string",)
    assert property_spec_from_json({"type": ["null", "string"]}).types == ("null", "string")
    assert property_spec_from_json({}).types == ()


def test_build_table_schema_nullability_and_airbyte_columns():
    props = {
        "id": {"type": "integer"},
        "name": {"type": ["null", "string"]},
        "updated_at": {"type": "string", "format": "date-time"},
    }
    schema = build_table_schema(props, primary_key=["id"], cursor_field="updated_at")
    assert schema.field("id").nullable is False          # PK → non-null
    assert schema.field("updated_at").nullable is False  # cursor → non-null
    assert schema.field("name").nullable is True
    assert schema.field(RAW_ID_COLUMN).nullable is False
    assert schema.field(EXTRACTED_AT_COLUMN).type == pa.timestamp("us", tz="UTC")


def test_schema_evolution_add_widen_rename():
    base = VersionedSchema(
        1,
        pa.schema(
            [
                pa.field("url", pa.string(), nullable=False),
                pa.field("lang", pa.string()),
            ]
        ),
    )
    v2 = base.evolve_add("fetch_status", pa.int32())
    v3 = v2.evolve_widen("fetch_status", pa.int64())
    v4 = v3.evolve_rename("lang", "language")
    assert v4.version == 4
    assert v4.schema.field("fetch_status").type == pa.int64()
    assert "language" in v4.schema.names and "lang" not in v4.schema.names
    assert v4.column_ids["language"] == base.column_ids["lang"]

    # an old-version batch rewritten to the new schema
    old_batch = pa.table({"url": ["a"], "lang": ["en"]})
    aligned = align_table(old_batch, v4, base)
    # physical schema is all-nullable (merge-compat); names+types match
    assert aligned.schema.names == v4.schema.names
    assert [f.type for f in aligned.schema] == [f.type for f in v4.schema]
    assert aligned.column("language").to_pylist() == ["en"]
    assert aligned.column("fetch_status").to_pylist() == [None]


def test_widen_rejects_narrowing():
    base = VersionedSchema(1, pa.schema([pa.field("n", pa.int64())]))
    with pytest.raises(ValueError):
        base.evolve_widen("n", pa.int32())
