#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf dir, compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive value hash)."""

from __future__ import annotations

import hashlib
import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

import duckdb
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def to_arrow(res) -> pa.Table:
    import pandas as pd

    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res)
    batches = list(res.iter_batches(batch_format="pyarrow"))
    return (
        pa.concat_tables(batches) if batches else pa.table({})
    )


def canonical_hash(t: pa.Table) -> str:
    cols = sorted(t.column_names)
    t = t.select(cols)
    rows = sorted(
        tuple(str(v) for v in row) for row in zip(*[t.column(c).to_pylist() for c in cols])
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir: str, only: list[str]) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = to_arrow(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({ours.num_rows} rows)")
            continue
        theirs = con.sql(oracles[name]).arrow()
        ours_cols = sorted(ours.column_names)
        theirs_cols = sorted(theirs.column_names)
        if ours_cols != theirs_cols:
            print(f"FAIL {name}: columns {ours_cols} vs {theirs_cols}")
            failures += 1
            continue
        if ours.num_rows != theirs.num_rows:
            print(f"FAIL {name}: rows {ours.num_rows} vs {theirs.num_rows}")
            failures += 1
            continue
        ha, hb = canonical_hash(ours), canonical_hash(theirs)
        if ha != hb:
            print(f"FAIL {name}: value hash mismatch ({ours.num_rows} rows)")
            failures += 1
            continue
        print(f"PASS {name}: {ours.num_rows} rows")
    ray.shutdown()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(main(sf, sys.argv[2:]))
