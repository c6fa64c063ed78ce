#!/usr/bin/env python
"""Scale-stress the round-4 session-D ops on synthetic 100M-row inputs,
DuckDB/numpy-verified at small n first (same generators):

- session_size_histogram: 100M events over 1M users (~100 events/user,
  hashed timestamps) — one keyed exchange + vectorized boundary kernel.
- cume_dist_by_key: 100M rows over 1M keys — one keyed exchange +
  segmented sort + tie-boundary gather.
- reciprocal_edges: 100M directed edges over 3M nodes — per-batch
  distinct triples, one lo-keyed exchange.
- radius_search: 20M x 64-d float embeddings vs 8 broadcast queries —
  per-batch matmul mask, zero shuffle (bounded by memory, not the op).

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

N = int(os.environ.get("GRAFT_R4C_ROWS", 100_000_000))
VERIFY_N = 500_000
USERS = 1_000_000
NODES = 3_000_000
EMB_N = int(os.environ.get("GRAFT_R4C_EMB_ROWS", 20_000_000))
EMB_D = 64
TS_RANGE = 2 * 86_400_000_000  # 2 days in us -> ~29 min mean gap at 100 ev/user

GOLD = np.uint64(0x9E3779B97F4A7C15)


def _hash(i: np.ndarray) -> np.ndarray:
    return i.astype(np.uint64) * GOLD


def _events_batch(batch: pa.Table) -> pa.Table:
    i = batch.column("id").to_numpy(zero_copy_only=False)
    h = _hash(i)
    user = ((h >> np.uint64(5)) % np.uint64(USERS)).astype(np.int64)
    ts = ((h >> np.uint64(13)) % np.uint64(TS_RANGE)).astype(np.int64)
    val = (h & np.uint64(1023)).astype(np.int64)
    return pa.table(
        {
            "event_id": pa.array(i.astype(np.int64)),
            "user_id": pa.array(user),
            "_ts_us": pa.array(ts),
            "value": pa.array(val),
        }
    )


def _events_ds(n: int):
    import ray.data

    ds = ray.data.range(n)
    ds = ds.map_batches(_events_batch, batch_format="pyarrow", batch_size=None)
    # session op takes a timestamp column
    def to_ts(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("_ts_us"),
            "ts",
            b.column("_ts_us").cast(pa.timestamp("us")),
        )

    return ds.map_batches(to_ts, batch_format="pyarrow", batch_size=None)


def _edges_batch_fn(nodes: int):
    def fn(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False)
        h = _hash(i)
        s = ((h >> np.uint64(3)) % np.uint64(nodes)).astype(np.int64)
        d = ((h >> np.uint64(23)) % np.uint64(nodes)).astype(np.int64)
        return pa.table({"src": pa.array(s), "dst": pa.array(d)})

    return fn


def _emb_batch(batch: pa.Table) -> pa.Table:
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    # deterministic pseudo-random embeddings: one hash per (row, lane),
    # splitmix64-finalized (a bare Weyl XOR leaves rows on a 1-D manifold
    # and cosine>=0.5 catches half of all pairs)
    lanes = np.arange(EMB_D, dtype=np.uint64)
    z = (i[:, None].astype(np.uint64) * GOLD) + (
        lanes * np.uint64(0xD1B54A32D192ED03)
    )
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = z ^ (z >> np.uint64(31))
    vals = ((h >> np.uint64(11)).astype(np.float32) / np.float32(2**53)) - np.float32(0.5)
    flat = pa.array(vals.ravel(), type=pa.float32())
    emb = pa.FixedSizeListArray.from_arrays(flat, EMB_D).cast(
        pa.list_(pa.float32())
    )
    return pa.table({"vec_id": pa.array(i), "embedding": emb})


def verify_small():
    import duckdb

    import ray.data

    from airbyte_destination_ray.pipelines.graph import reciprocal_edges
    from airbyte_destination_ray.pipelines.relational import (
        cume_dist_by_key,
        session_size_histogram,
    )
    from airbyte_destination_ray.pipelines.similarity import radius_search

    con = duckdb.connect()

    ev = _events_ds(VERIFY_N).materialize()
    evt = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in ev.iter_batches(batch_format="pyarrow")
        ]
    )
    con.register("ev", evt)

    got = session_size_histogram(ev).sort_by("session_events").to_pydict()
    want = con.sql(
        """
        WITH s AS (
            SELECT event_id, user_id,
                   sum(CASE WHEN prev IS NULL
                              OR ts - prev > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS sid
            FROM (SELECT event_id, user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
                  FROM ev)),
        sz AS (SELECT user_id, sid, count(*) AS session_events
               FROM s GROUP BY 1, 2)
        SELECT CAST(session_events AS BIGINT) AS session_events,
               CAST(count(*) AS BIGINT) AS n_sessions
        FROM sz GROUP BY 1 ORDER BY 1
        """
    ).arrow().to_pydict()
    assert got == want, "session_size_histogram small-n mismatch"

    cd = cume_dist_by_key(ev, key="user_id", value_col="value", seq="event_id")
    gt = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in cd.iter_batches(batch_format="pyarrow")
        ]
    ).sort_by("event_id")
    wt = con.sql(
        """
        SELECT event_id, cume_dist() OVER (
            PARTITION BY user_id ORDER BY value) AS cd
        FROM ev ORDER BY event_id
        """
    ).arrow()
    assert gt.column("cd").to_pylist() == wt.column("cd").to_pylist(), (
        "cume_dist small-n mismatch"
    )

    eg = ray.data.range(VERIFY_N).map_batches(
        _edges_batch_fn(1000), batch_format="pyarrow", batch_size=None
    )
    egt = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in eg.iter_batches(batch_format="pyarrow")
        ]
    )
    con.register("eg", egt)
    got = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in reciprocal_edges(eg).iter_batches(batch_format="pyarrow")
        ]
    )
    gp = sorted(zip(got.column("a").to_pylist(), got.column("b").to_pylist()))
    wp = [
        tuple(r)
        for r in con.sql(
            """
            WITH e AS (SELECT DISTINCT src, dst FROM eg WHERE src != dst)
            SELECT e1.src, e1.dst FROM e e1
            JOIN e e2 ON e1.src = e2.dst AND e1.dst = e2.src
            WHERE e1.src < e1.dst ORDER BY 1, 2
            """
        ).fetchall()
    ]
    assert gp == wp, "reciprocal_edges small-n mismatch"

    emb = ray.data.range(VERIFY_N // 10).map_batches(
        _emb_batch, batch_format="pyarrow", batch_size=None
    )
    et = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in emb.iter_batches(batch_format="pyarrow")
        ]
    )
    m = np.array(et.column("embedding").to_pylist(), dtype=np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    q = m[:8]
    qn = mn[:8]
    thr = 0.5
    want_pairs = sorted(zip(*np.nonzero(qn @ mn.T >= thr)))
    got = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in radius_search(
                emb, q, np.arange(8, dtype=np.int64), threshold=thr
            ).iter_batches(batch_format="pyarrow")
        ]
    )
    got_pairs = sorted(
        zip(got.column("query_id").to_pylist(), got.column("vec_id").to_pylist())
    )
    assert [tuple(map(int, p)) for p in want_pairs] == got_pairs, (
        "radius_search small-n mismatch"
    )
    print(json.dumps({"stage": "verify_small", "n": VERIFY_N, "ok": True}))


def run_big():
    import ray.data

    from airbyte_destination_ray.pipelines.graph import reciprocal_edges
    from airbyte_destination_ray.pipelines.relational import (
        cume_dist_by_key,
        session_size_histogram,
    )
    from airbyte_destination_ray.pipelines.similarity import radius_search

    t0 = time.perf_counter()
    hist = session_size_histogram(_events_ds(N))
    n_sessions = int(
        pa.compute.sum(hist.column("n_sessions")).as_py() or 0
    )
    w = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "session_size_histogram",
                "rows": N,
                "sessions": n_sessions,
                "wall_s": round(w, 2),
                "rows_per_s": round(N / w),
            }
        )
    )

    t0 = time.perf_counter()
    cd = cume_dist_by_key(
        _events_ds(N), key="user_id", value_col="value", seq="event_id"
    )
    out_rows = cd.count()  # executes fully; blocks stay in the store
    w = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "cume_dist_by_key",
                "rows": N,
                "out_rows": out_rows,
                "wall_s": round(w, 2),
                "rows_per_s": round(N / w),
            }
        )
    )

    t0 = time.perf_counter()
    eg = ray.data.range(N).map_batches(
        _edges_batch_fn(NODES), batch_format="pyarrow", batch_size=None
    )
    pairs = reciprocal_edges(eg).count()
    w = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "reciprocal_edges",
                "edges": N,
                "mutual_pairs": pairs,
                "wall_s": round(w, 2),
                "edges_per_s": round(N / w),
            }
        )
    )

    t0 = time.perf_counter()
    emb = ray.data.range(EMB_N).map_batches(
        _emb_batch, batch_format="pyarrow", batch_size=None
    )
    # corpus vectors as queries -> guaranteed self-hits at scale
    qt = _emb_batch(pa.table({"id": pa.array(np.arange(8, dtype=np.int64))}))
    q = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    hits = radius_search(
        emb, q, np.arange(8, dtype=np.int64), threshold=0.5
    ).count()
    w = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "radius_search",
                "vectors": EMB_N,
                "dim": EMB_D,
                "queries": 8,
                "hits": hits,
                "wall_s": round(w, 2),
                "vectors_per_s": round(EMB_N / w),
            }
        )
    )


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
    ray.shutdown()
