#!/usr/bin/env python
"""Scale-stress the round-3 ops VERDICT flagged as unstressed, on
synthetic 100M-row inputs (DuckDB-verified at small n first, same
generator):

- window_join: 100M left × 10M right over 1M keys, ±50ms band —
  one co-locating exchange, searchsorted pair expansion (~10M pairs).
- temporal_join: 100M facts against a 5M-row SCD2 dimension
  (1M keys × 5 versions) — asof-on-valid_from + expiry mask.
- change_feed fast path: 10M-key lake, 2 epochs — co-partitioned
  per-partition local diffs with changed-partition pruning (no
  exchange).

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

N = int(os.environ.get("GRAFT_R4OPS_ROWS", 100_000_000))
N_RIGHT = N // 10
VERIFY_N = 1_000_000
KEYS = 1_000_000
TS_RANGE = 10_000_000_000  # 10^10 us ≈ 2.8h of stream
BAND = 50_000  # ±50ms

GOLD = np.uint64(0x9E3779B97F4A7C15)


def _make_left(keys: int):
    def _left_batch(batch: pa.Table, keys=keys) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = i * GOLD
        k = ((h >> np.uint64(5)) % np.uint64(keys)).astype(np.int64)
        ts = ((h >> np.uint64(13)) % np.uint64(TS_RANGE)).astype(np.int64)
        v = (i & np.uint64(1023)).astype(np.int64)
        return pa.table(
            {
                "seq": pa.array(i.astype(np.int64)),
                "k": pa.array(k),
                "lts": pa.array(ts),
                "v": pa.array(v),
            }
        )

    return _left_batch


def _make_right(keys: int):
    def _right_batch(batch: pa.Table, keys=keys) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (i + np.uint64(777)) * GOLD
        k = ((h >> np.uint64(7)) % np.uint64(keys)).astype(np.int64)
        ts = ((h >> np.uint64(17)) % np.uint64(TS_RANGE)).astype(np.int64)
        w = (i & np.uint64(255)).astype(np.int64)
        return pa.table(
            {
                "rid": pa.array(i.astype(np.int64)),
                "k": pa.array(k),
                "rts": pa.array(ts),
                "w": pa.array(w),
            }
        )

    return _right_batch


def _dim_batch(batch: pa.Table) -> pa.Table:
    """SCD2 dimension: 5 versions per key tiling [0, TS_RANGE); the last
    version is open (valid_to null)."""
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    k = i // 5
    ver = i % 5
    step = TS_RANGE // 5
    vf = ver * step
    vt = np.where(ver == 4, -1, (ver + 1) * step)
    return pa.table(
        {
            "k": pa.array(k),
            "valid_from": pa.array(vf),
            "valid_to": pa.array(vt).cast(pa.int64()),
            "attr": pa.array(k * 10 + ver),
        }
    )


def synth_left(n, keys=KEYS):
    return ray.data.range(n).map_batches(
        _make_left(keys), batch_format="pyarrow", batch_size=None
    )


def synth_right(n, keys=KEYS):
    return ray.data.range(n).map_batches(
        _make_right(keys), batch_format="pyarrow", batch_size=None
    )


def synth_dim(keys):
    def fix_nulls(batch: pa.Table) -> pa.Table:
        vt = batch.column("valid_to").to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("valid_to"),
            "valid_to",
            pa.array(np.where(vt < 0, None, vt), type=pa.int64()),
        )

    return (
        ray.data.range(keys * 5)
        .map_batches(_dim_batch, batch_format="pyarrow", batch_size=None)
        .map_batches(fix_nulls, batch_format="pyarrow", batch_size=None)
    )


def verify_small():
    import duckdb

    from airbyte_destination_ray.pipelines.relational import (
        temporal_join,
        window_join,
    )

    nl, nr, nk = VERIFY_N, VERIFY_N // 10, 10_000
    left = pa.concat_tables(
        list(synth_left(nl, nk).iter_batches(batch_format="pyarrow"))
    )
    right = pa.concat_tables(
        list(synth_right(nr, nk).iter_batches(batch_format="pyarrow"))
    )
    dim = pa.concat_tables(
        list(synth_dim(nk).iter_batches(batch_format="pyarrow"))
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    con.register("d", dim)

    wj = window_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        on="k",
        left_ts="lts",
        right_ts="rts",
        before_us=BAND,
        after_us=BAND,
        right_keep=["rid", "w"],
    )
    got = (
        wj.to_pandas()
        .sort_values(["seq", "rid_right"])
        .reset_index(drop=True)
    )
    exp = con.execute(
        f"""
        SELECT l.seq, r.rid AS rid_right
        FROM l JOIN r ON l.k = r.k
         AND r.rts BETWEEN l.lts - {BAND} AND l.lts + {BAND}
        ORDER BY 1, 2
        """
    ).df()
    assert len(got) == len(exp), (len(got), len(exp))
    assert (got["seq"].to_numpy() == exp["seq"].to_numpy()).all()
    assert (
        got["rid_right"].to_numpy() == exp["rid_right"].to_numpy()
    ).all()
    print(
        json.dumps(
            {"stage": "verify_window_join", "pairs": int(len(got))}
        )
    )

    tj = temporal_join(
        ray.data.from_arrow(left),
        ray.data.from_arrow(dim),
        on="k",
        left_ts="lts",
        right_keep=["attr"],
    )
    gsum = int(
        tj.to_pandas()["attr_dim"].fillna(-1).astype(np.int64).sum()
    )
    esum = int(
        con.execute(
            """
            SELECT sum(COALESCE(d.attr, -1)) FROM l LEFT JOIN d
              ON l.k = d.k AND l.lts >= d.valid_from
             AND (d.valid_to IS NULL OR l.lts < d.valid_to)
            """
        ).fetchone()[0]
    )
    assert gsum == esum, (gsum, esum)
    print(json.dumps({"stage": "verify_temporal_join", "sum": gsum}))


def run_big():
    from airbyte_destination_ray.pipelines.relational import (
        temporal_join,
        window_join,
    )

    i64 = pa.int64()
    lschema = pa.schema(
        [("seq", i64), ("k", i64), ("lts", i64), ("v", i64)]
    )
    rschema = pa.schema(
        [("rid", i64), ("k", i64), ("rts", i64), ("w", i64)]
    )
    t0 = time.perf_counter()
    # pass schemas: a derived join input with unknown schema is otherwise
    # materialized ONCE and stays pinned in the object store for the whole
    # run — at 100M rows that pinned 3.5 GB tips the exchange into spill
    # (measured 266 s -> see BASELINE.md for the streaming number)
    wj = window_join(
        synth_left(N),
        synth_right(N_RIGHT),
        on="k",
        left_ts="lts",
        right_ts="rts",
        before_us=BAND,
        after_us=BAND,
        right_keep=["rid", "w"],
        left_schema=lschema,
        right_schema=rschema,
    )
    pairs = wj.count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "window_join",
                "rows_left": N,
                "rows_right": N_RIGHT,
                "pairs": int(pairs),
                "sec": round(dt, 2),
                "rows_per_sec": int((N + N_RIGHT) / dt),
            }
        )
    )

    t0 = time.perf_counter()
    dschema = pa.schema(
        [("k", i64), ("valid_from", i64), ("valid_to", i64), ("attr", i64)]
    )
    tj = temporal_join(
        synth_left(N),
        synth_dim(KEYS),
        on="k",
        left_ts="lts",
        right_keep=["attr"],
        left_schema=lschema,
        right_schema=dschema,
    )
    rows = tj.count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "temporal_join",
                "rows": int(rows),
                "dim_rows": KEYS * 5,
                "sec": round(dt, 2),
                "rows_per_sec": int(N / dt),
            }
        )
    )


def run_change_feed():
    import shutil

    from airbyte_destination_ray.pipelines.cdc import change_feed, run_cdc_sync
    from airbyte_destination_ray.sources.synth import synthesize_binlog

    base = Path("/tmp/adr_bench_r4_cdf")
    shutil.rmtree(base, ignore_errors=True)
    binlog, lake = base / "binlog", base / "lake"
    n_keys = int(os.environ.get("GRAFT_R4OPS_CDF_KEYS", 10_000_000))
    synthesize_binlog(
        binlog, n_events=2 * n_keys, n_keys=n_keys, n_epochs=2, seed=11
    )
    t0 = time.perf_counter()
    run_cdc_sync(str(lake), str(binlog), num_partitions=64)
    sync_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    feed = change_feed(
        str(lake), "pages", epoch=1, compare_cols=["warc_ts"]
    )
    rows = feed.count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "change_feed_fastpath",
                "keys": n_keys,
                "feed_rows": int(rows),
                "sync_sec": round(sync_dt, 2),
                "feed_sec": round(dt, 2),
                "keys_per_sec": int(n_keys / dt),
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    verify_small()
    run_big()
    run_change_feed()
    ray.shutdown()
