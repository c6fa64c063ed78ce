#!/usr/bin/env python
"""Scale-stress the round-3 operator families (DuckDB-verified at small n
first, same generator):

- lww_partial_merge: 100M partial-update events over 10M keys, 2 patch
  columns with independent null patterns — the per-column LWW candidate
  pre-reduce at scale.
- running_distinct_by_key: 100M events over 1M keys — two sorts per
  partition group, one key exchange.
- profile_columns: 100M rows × 3 columns — the hash(col,val) distinct
  exchange (one column near-unique, one low-cardinality, one nullable).
- pack_documents: 10M synthetic documents (~20 tokens each) — the
  two-phase prefix sum + single-pass tokenize.
- run_incremental_agg: the cached 20M-event CDC binlog folded epoch by
  epoch into a maintained per-key aggregate.

Each stage prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa

import ray
import ray.data

N = int(os.environ.get("GRAFT_R3OPS_ROWS", 100_000_000))
N_DOCS = int(os.environ.get("GRAFT_R3OPS_DOCS", 10_000_000))
VERIFY_N = 1_000_000

GOLD = np.uint64(0x9E3779B97F4A7C15)


def _patch_batch(batch: pa.Table) -> pa.Table:
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = i * GOLD
    k = (h % np.uint64(10_000_000)).astype(np.int64)
    ver = ((h >> np.uint64(13)) % np.uint64(1_000_000)).astype(np.int64)
    a = ((h >> np.uint64(7)) % np.uint64(1000)).astype(np.float64)
    b_idx = ((h >> np.uint64(23)) % np.uint64(50)).astype(np.int64)
    a_null = (h >> np.uint64(3)) % np.uint64(3) == 0   # ~1/3 null
    b_null = (h >> np.uint64(5)) % np.uint64(2) == 0   # ~1/2 null
    return pa.table(
        {
            "k": pa.array(k),
            "ver": pa.array(ver),
            "seq": batch.column("id"),
            "a": pa.array(np.where(a_null, np.nan, a)).cast(pa.float64()),
            "a_null": pa.array(a_null),
            "b": pa.array(b_idx),
            "b_null": pa.array(b_null),
        }
    )


def _mask_nulls(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    a = pc.if_else(
        t.column("a_null").combine_chunks(),
        pa.scalar(None, pa.float64()),
        t.column("a").combine_chunks(),
    )
    b = pc.if_else(
        t.column("b_null").combine_chunks(),
        pa.scalar(None, pa.int64()),
        t.column("b").combine_chunks(),
    )
    return pa.table(
        {
            "k": t.column("k"),
            "ver": t.column("ver"),
            "seq": t.column("seq"),
            "a": a,
            "b": b,
        }
    )


def synth_patches(n: int):
    import ray.data

    return (
        ray.data.range(n)
        .map_batches(_patch_batch, batch_format="pyarrow")
        .map_batches(_mask_nulls, batch_format="pyarrow")
    )


def verify_small() -> None:
    import duckdb
    import pandas as pd

    from airbyte_destination_ray.pipelines.ops import lww_partial_merge
    from airbyte_destination_ray.pipelines.relational import (
        running_distinct_by_key,
    )

    ds = synth_patches(VERIFY_N)
    small = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    con = duckdb.connect()
    con.register("t", small)

    out = (
        lww_partial_merge(
            ray.data.from_arrow(small).repartition(8),
            pk="k", ver="ver", seq="seq", patch_cols=["a", "b"],
        )
        .to_pandas()
    )
    want = con.sql(
        """
        SELECT DISTINCT k,
            last_value(a IGNORE NULLS) OVER w AS a,
            last_value(b IGNORE NULLS) OVER w AS b,
            last_value(ver) OVER w AS ver,
            last_value(seq) OVER w AS seq
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ver, seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        """
    ).df()
    cols = sorted(out.columns)
    pd.testing.assert_frame_equal(
        out[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )

    rd = (
        running_distinct_by_key(
            ray.data.from_arrow(small).repartition(8),
            key="k", value_col="b", ts_col="ver", seq="seq",
        )
        .to_pandas()
    )
    want2 = con.sql(
        """
        SELECT k, b, ver, seq,
            CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
                PARTITION BY k ORDER BY ver, seq ROWS UNBOUNDED PRECEDING
            ) AS BIGINT) AS n_distinct_so_far
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY k, b ORDER BY ver, seq) AS rn FROM t)
        """
    ).df()
    cols2 = sorted(rd.columns)
    pd.testing.assert_frame_equal(
        rd[cols2].sort_values(cols2).reset_index(drop=True),
        want2[cols2].sort_values(cols2).reset_index(drop=True),
        check_dtype=False,
    )
    print(json.dumps({"stage": "verify", "rows": VERIFY_N, "ok": True}))


def main() -> int:
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    verify_small()

    from airbyte_destination_ray.pipelines.ops import (
        lww_partial_merge,
        profile_columns,
    )
    from airbyte_destination_ray.pipelines.relational import (
        running_distinct_by_key,
    )

    # 1. partial-update merge
    t0 = time.perf_counter()
    n_keys = lww_partial_merge(
        synth_patches(N), pk="k", ver="ver", seq="seq",
        patch_cols=["a", "b"], num_partitions=128,
    ).count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "lww_partial_merge", "rows": N, "keys": n_keys,
        "sec": round(dt, 2), "rows_per_sec": round(N / dt, 1),
    }))

    # 2. running distinct
    t0 = time.perf_counter()

    def remap_keys(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False) % 1_000_000
        return b.set_column(0, "k", pa.array(k))

    cnt = running_distinct_by_key(
        synth_patches(N).map_batches(remap_keys, batch_format="pyarrow"),
        key="k", value_col="b", ts_col="ver", seq="seq",
        num_partitions=128,
    ).count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "running_distinct_by_key", "rows": N, "out_rows": cnt,
        "sec": round(dt, 2), "rows_per_sec": round(N / dt, 1),
    }))

    # 3. per-column profile
    t0 = time.perf_counter()
    prof = profile_columns(
        synth_patches(N), cols=["k", "b", "a"], num_partitions=128
    ).to_pandas()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "profile_columns", "rows": N,
        "profile": prof.sort_values("col_name").to_dict("records"),
        "sec": round(dt, 2), "rows_per_sec": round(N / dt, 1),
    }))

    # 4. sequence packing over synthetic docs
    from airbyte_destination_ray.pipelines.corpus import pack_documents

    def doc_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        n_tok = (5 + ((i * GOLD) >> np.uint64(9)) % np.uint64(30)).astype(
            np.int64
        )
        total = int(n_tok.sum())
        values = pa.array(["tok"]).take(
            pa.array(np.zeros(total, dtype=np.int64))
        )
        offsets = pa.array(
            np.r_[0, np.cumsum(n_tok)].astype(np.int32)
        )
        texts = pc.binary_join(
            pa.ListArray.from_arrays(offsets, values), " "
        )
        return pa.table({"doc_id": batch.column("id"), "text": texts})

    # materialize the corpus first so generation cost isn't billed to the
    # measured operator
    docs = ray.data.range(N_DOCS).map_batches(
        doc_batch, batch_format="pyarrow"
    ).materialize()
    t0 = time.perf_counter()
    packed = pack_documents(docs, budget=2048, num_partitions=128)
    n_packed = packed.count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "pack_documents", "docs": N_DOCS, "out_rows": n_packed,
        "sec": round(dt, 2), "docs_per_sec": round(N_DOCS / dt, 1),
    }))

    # 5. incremental aggregate view over the cached CDC binlog
    import shutil

    from airbyte_destination_ray.pipelines.aggview import run_incremental_agg
    from airbyte_destination_ray.sources.synth import ensure_binlog

    bench_tmp = Path(os.environ.get("GRAFT_BENCH_TMP", "/tmp/adr_bench"))
    binlog = bench_tmp / "binlog_20000000_2000000_1"
    ensure_binlog(binlog, n_events=20_000_000, n_keys=2_000_000, n_epochs=1,
                  seed=42)
    lake = Path("/tmp/adr_r3ops_agg_lake")
    shutil.rmtree(lake, ignore_errors=True)
    t0 = time.perf_counter()
    run_incremental_agg(str(lake), str(binlog), num_partitions=128)
    dt = time.perf_counter() - t0
    shutil.rmtree(lake, ignore_errors=True)
    print(json.dumps({
        "stage": "run_incremental_agg", "events": 20_000_000,
        "sec": round(dt, 2), "events_per_sec": round(20_000_000 / dt, 1),
    }))

    # 6. streaming sessionization with cross-epoch state (same binlog)
    from airbyte_destination_ray.pipelines.aggview import (
        run_incremental_sessions,
    )

    lake2 = Path("/tmp/adr_r3ops_sess_lake")
    shutil.rmtree(lake2, ignore_errors=True)
    t0 = time.perf_counter()
    run_incremental_sessions(
        str(lake2), str(binlog), key="url", ts_col="warc_ts", seq="seq",
        gap_minutes=30, num_partitions=128,
    )
    dt = time.perf_counter() - t0
    shutil.rmtree(lake2, ignore_errors=True)
    print(json.dumps({
        "stage": "run_incremental_sessions", "events": 20_000_000,
        "sec": round(dt, 2), "events_per_sec": round(20_000_000 / dt, 1),
    }))

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
