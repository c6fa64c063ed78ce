#!/usr/bin/env python
"""Scale-stress the late round-5 ops:

- dedup_minhash_incremental: 1M docs arriving as 3 increments (10k
  near-copies of increment-1 docs planted in increment 3) against
  persistent signature state on /dev/shm — the crawl-refresh shape;
  equality with one-shot dedup_minhash_lsh verified at 20k docs first
  (also pinned by tests/test_incremental_dedup.py).
- k_hop_reachable: 100M directed edges over 3M nodes, 10 seeds, 3 hops
  (frontier-broadcast scans; DuckDB-verified at 1M edges first).

Each stage prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

N_DOCS = int(os.environ.get("GRAFT_R5C_DOCS", 1_000_000))
COPY_EVERY = 100
WORDS = 30
VOCAB = 50_000
N_EDGES = int(os.environ.get("GRAFT_R5C_EDGES", 100_000_000))
N_NODES = 3_000_000

GOLD = np.uint64(0x9E3779B97F4A7C15)
GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(h):
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= GOLD2
    h ^= h >> np.uint64(29)
    return h


def _doc_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """ids < n_docs: originals; ids >= n_docs: near-copy of
    (id - n_docs) * COPY_EVERY with one extra word, at id+10M."""
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    is_copy = i >= n_docs
    base = np.where(is_copy, (i - n_docs) * COPY_EVERY, i).astype(np.uint64)
    lens = np.where(is_copy, WORDS + 1, WORDS).astype(np.int64)
    total = int(lens.sum())
    rows = np.repeat(np.arange(len(i)), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    j = (np.arange(total) - starts[rows]).astype(np.uint64)
    h = _mix(base[rows] * GOLD + (j + np.uint64(1)) * GOLD2)
    w = (h >> np.uint64(13)) % np.uint64(VOCAB)
    flat = pc.cast(pa.array(w.astype(np.int64)), pa.string())
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    words = pa.ListArray.from_arrays(pa.array(offs), flat)
    doc_id = np.where(is_copy, 10_000_000 + (i - n_docs) * COPY_EVERY, i)
    return pa.table({
        "doc_id": pa.array(doc_id.astype(np.int64)),
        "text": pc.binary_join(words, " "),
    })


def _docs_range(lo, hi, n_docs):
    return ray.data.range(hi - lo).map_batches(
        lambda b: _doc_batch(
            pa.table({"id": pc.add(b.column("id"), lo)}), n_docs
        ),
        batch_format="pyarrow", batch_size=None,
    )


PARAMS = dict(num_perm=64, bands=16, shingle_k=5, verify_threshold=0.8)


def verify_incremental_small() -> None:
    from airbyte_destination_ray.pipelines.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    n = 20_000
    total = n + n // COPY_EVERY
    one = sorted(
        r["doc_id"]
        for r in dedup_minhash_lsh(
            _docs_range(0, total, n), **PARAMS
        ).take_all()
    )
    state = "/tmp/adr_r5c_state_verify"
    shutil.rmtree(state, ignore_errors=True)
    got = []
    # id-ordered increments; the copy block (ids >= 10M) arrives last
    for lo, hi in ((0, n // 2), (n // 2, n), (n, total)):
        got += [
            r["doc_id"]
            for r in dedup_minhash_incremental(
                _docs_range(lo, hi, n), state, num_partitions=16,
                **PARAMS,
            ).take_all()
        ]
    shutil.rmtree(state, ignore_errors=True)
    assert sorted(got) == one, (len(got), len(one))
    print(json.dumps({"verify": "minhash_incremental", "docs": total,
                      "survivors": len(one), "ok": True}))


def bench_incremental() -> None:
    from airbyte_destination_ray.pipelines.dedup import (
        dedup_minhash_incremental,
    )

    n = N_DOCS
    total = n + n // COPY_EVERY
    state = "/dev/shm/adr_r5c_state"
    shutil.rmtree(state, ignore_errors=True)
    walls = []
    survivors = 0
    for lo, hi in ((0, n // 2), (n // 2, n), (n, total)):
        t0 = time.time()
        survivors += dedup_minhash_incremental(
            _docs_range(lo, hi, n), state, num_partitions=64, **PARAMS
        ).count()
        walls.append(round(time.time() - t0, 2))
    state_bytes = sum(
        p.stat().st_size for p in Path(state).glob("part-*.parquet")
    )
    shutil.rmtree(state, ignore_errors=True)
    print(json.dumps({
        "op": "dedup_minhash_incremental", "docs": total,
        "increments": 3, "survivors": survivors,
        "dropped": total - survivors, "walls_sec": walls,
        "state_mb": round(state_bytes / 1e6, 1),
        "docs_per_sec": round(total / sum(walls)),
    }))


def _edge_batch(b: pa.Table) -> pa.Table:
    i = b.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = _mix(i * GOLD)
    src = (h % np.uint64(N_NODES)).astype(np.int64)
    dst = ((h >> np.uint64(23)) % np.uint64(N_NODES)).astype(np.int64)
    return pa.table({
        "src": pa.array(src), "dst": pa.array(dst),
    })


def verify_khop_small() -> None:
    import duckdb

    from airbyte_destination_ray.pipelines.graph import k_hop_reachable

    n = 1_000_000
    edges = ray.data.range(n).map_batches(
        _edge_batch, batch_format="pyarrow", batch_size=None
    )
    got = k_hop_reachable(edges, list(range(10)), hops=3)
    tbl = pa.concat_tables(
        ray.data.range(n).map_batches(
            _edge_batch, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20)
    )
    con = duckdb.connect()
    con.register("e", tbl)
    exp = con.sql(
        """
        WITH n0 AS (SELECT unnest(range(10)) AS node, 0 AS hop),
        n1 AS (SELECT DISTINCT e.dst node, 1 hop FROM e
               JOIN n0 ON e.src = n0.node),
        n2 AS (SELECT DISTINCT e.dst node, 2 hop FROM e
               JOIN n1 ON e.src = n1.node),
        n3 AS (SELECT DISTINCT e.dst node, 3 hop FROM e
               JOIN n2 ON e.src = n2.node),
        a AS (SELECT * FROM n0 UNION ALL SELECT * FROM n1
              UNION ALL SELECT * FROM n2 UNION ALL SELECT * FROM n3)
        SELECT CAST(node AS BIGINT) node, CAST(min(hop) AS BIGINT) hop
        FROM a GROUP BY node ORDER BY node
        """
    ).arrow()
    assert got.sort_by("node").equals(exp.cast(got.schema)), (
        got.num_rows, exp.num_rows)
    print(json.dumps({"verify": "k_hop", "edges": n,
                      "reached": got.num_rows, "ok": True}))


def bench_khop() -> None:
    from airbyte_destination_ray.pipelines.graph import k_hop_reachable

    edges = ray.data.range(N_EDGES).map_batches(
        _edge_batch, batch_format="pyarrow", batch_size=None
    )
    t0 = time.time()
    out = k_hop_reachable(edges, list(range(10)), hops=3)
    wall = time.time() - t0
    print(json.dumps({
        "op": "k_hop_reachable", "edges": N_EDGES, "nodes": N_NODES,
        "seeds": 10, "hops": 3, "reached": out.num_rows,
        "wall_sec": round(wall, 2),
        "edges_per_sec": round(3 * N_EDGES / wall),
    }))


if __name__ == "__main__":
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    if "--verify" in sys.argv:
        verify_incremental_small()
        verify_khop_small()
    if "--verify-only" not in sys.argv:
        bench_incremental()
        bench_khop()
    ray.shutdown()
