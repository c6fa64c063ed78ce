"""Mechanical guard over every oracle_sql() output type.

The driver hashes query/oracle results through pandas; DuckDB types that
pandas maps to float64/object (HUGEINT, UHUGEINT, DECIMAL) silently break
the value-hash even when the values are identical.  This trap has bitten
twice (r3 ``list_sum`` → HUGEINT, r4 ``pack_documents_2048`` windowed
``SUM(BIGINT)`` → HUGEINT), so instead of eyeballing SQL we execute every
oracle at sf0.001 and assert the materialized Arrow schema contains no
decimal/extension-width integer columns.

Pure DuckDB — no Ray needed (queries() is not run here; the engine side
is covered by tools/check_oracles.py and the driver gate).
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pyarrow as pa
import pytest

SF_DIR = Path("/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _oracles():
    import __ray_entry__ as e

    return e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    if not SF_DIR.exists():
        pytest.skip("testdata not present")
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _is_hash_unsafe(typ: pa.DataType) -> bool:
    if pa.types.is_decimal(typ):
        return True
    # Arrow has no 128-bit int; DuckDB HUGEINT arrives as decimal128(38, 0)
    # (caught above) — but guard any future widening too.
    if isinstance(typ, pa.lib.BaseExtensionType):  # pragma: no cover
        return True
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return _is_hash_unsafe(typ.value_type)
    if pa.types.is_struct(typ):
        return any(_is_hash_unsafe(f.type) for f in typ)
    return False


def test_every_oracle_output_type_is_pandas_hash_safe(con):
    bad = []
    for name, sql in _oracles().items():
        t = con.sql(sql).arrow()
        for field in t.schema:
            if _is_hash_unsafe(field.type):
                bad.append(f"{name}.{field.name}: {field.type}")
    assert not bad, (
        "oracle columns that pandas hashes lossily (CAST them to "
        "BIGINT/DOUBLE in the SQL): " + "; ".join(bad)
    )
