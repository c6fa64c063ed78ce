#!/usr/bin/env python
"""Scale-stress the trigram substring index: 1M docs sync into a lake,
the trigram index builds from the change feed and compacts, then
LIKE-'%needle%' probes resolve via posting intersection + point-lookup
verify — measured against the full-scan baseline on the same lake.
DuckDB-verified at 20k docs first.  One JSON line per stage."""

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
import pyarrow.parquet as pq

import ray

N_DOCS = int(os.environ.get("GRAFT_R5D_DOCS", 1_000_000))
WORDS = 30
VOCAB = 50_000
BASE = Path("/dev/shm/adr_r5d")

GOLD = np.uint64(0x9E3779B97F4A7C15)
GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(h):
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= GOLD2
    h ^= h >> np.uint64(29)
    return h


def _write_binlog(base: Path, n: int) -> None:
    d = base / "binlog"
    d.mkdir(parents=True, exist_ok=True)
    per = 1 << 17
    segs = []
    si = 0
    for lo in range(0, n, per):
        hi = min(lo + per, n)
        i = np.arange(lo, hi, dtype=np.int64)
        rows = np.repeat(np.arange(hi - lo), WORDS)
        j = np.tile(np.arange(WORDS, dtype=np.uint64), hi - lo)
        h = _mix(i.astype(np.uint64)[rows] * GOLD + (j + np.uint64(1)) * GOLD2)
        w = (h >> np.uint64(13)) % np.uint64(VOCAB)
        flat = pc.cast(pa.array(w.astype(np.int64)), pa.string())
        offs = (np.arange(hi - lo + 1) * WORDS).astype(np.int32)
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs), flat), " "
        )
        t = pa.table({
            "seq": pa.array(i),
            "epoch": pa.array(np.zeros(hi - lo, dtype=np.int32)),
            "op": pa.array(["U"] * (hi - lo)),
            "doc_id": pa.array(i),
            "ver": pa.array(i),
            "text": text,
        })
        name = f"segment-e00000-{si:04d}.parquet"
        pq.write_table(t, d / name)
        segs.append(name)
        si += 1
    (d / "_binlog.json").write_text(
        json.dumps({"n_epochs": 1, "segments": segs})
    )


def verify_small() -> None:
    import duckdb

    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        substring_search,
        sync_trigram_index,
    )

    base = Path("/tmp/adr_r5d_verify")
    shutil.rmtree(base, ignore_errors=True)
    _write_binlog(base, 20_000)
    run_cdc_sync(
        str(base / "lake"), str(base / "binlog"), table="docs",
        pk="doc_id", ver="ver",
        payload_columns=["doc_id", "ver", "text"], num_partitions=16,
        compute_digest=False,
    )
    sync_trigram_index(
        str(base / "lake"), "docs", base / "idx", upto_epoch=0,
        num_buckets=64,
    )
    tbl = pq.read_table(
        sorted(str(p) for p in (base / "binlog").glob("*.parquet"))
    )
    con = duckdb.connect()
    con.register("docs", tbl)
    for needle in ("111 222", "4242 4242", "31337"):
        exp = sorted(
            r[0] for r in con.sql(
                f"SELECT doc_id FROM docs WHERE lower(text) "
                f"LIKE '%{needle}%'"
            ).fetchall()
        )
        got = sorted(
            r["doc_id"]
            for r in substring_search(
                str(base / "lake"), "docs", base / "idx", needle
            ).take_all()
        )
        assert got == exp, (needle, len(got), len(exp))
        print(json.dumps({"verify": "substring", "needle": needle,
                          "matches": len(got), "ok": True}))
    shutil.rmtree(base, ignore_errors=True)


def bench() -> None:
    from airbyte_destination_ray.pipelines.cdc import read_table, run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        compact_index,
        substring_search,
        sync_trigram_index,
    )

    shutil.rmtree(BASE, ignore_errors=True)
    _write_binlog(BASE, N_DOCS)
    t0 = time.time()
    run_cdc_sync(
        str(BASE / "lake"), str(BASE / "binlog"), table="docs",
        pk="doc_id", ver="ver",
        payload_columns=["doc_id", "ver", "text"], num_partitions=64,
        compute_digest=False,
    )
    w_sync = time.time() - t0
    t0 = time.time()
    sync_trigram_index(
        str(BASE / "lake"), "docs", BASE / "idx", upto_epoch=0,
        num_buckets=256,
    )
    w_index = time.time() - t0
    t0 = time.time()
    cres = compact_index(BASE / "idx")
    w_compact = time.time() - t0
    idx_bytes = sum(
        p.stat().st_size for p in (BASE / "idx").rglob("*.parquet")
    )
    print(json.dumps({
        "op": "trigram_index_build", "docs": N_DOCS,
        "sync_sec": round(w_sync, 2), "index_sec": round(w_index, 2),
        "compact_sec": round(w_compact, 2),
        "index_mb": round(idx_bytes / 1e6, 1),
        "compacted_buckets": cres["buckets"],
    }))

    for needle in ("111 222", "4242 4242"):
        t0 = time.time()
        n = substring_search(
            str(BASE / "lake"), "docs", BASE / "idx", needle
        ).count()
        w_probe = time.time() - t0
        t0 = time.time()
        ds = read_table(
            str(BASE / "lake"), "docs", columns=["doc_id", "text"]
        )
        n_scan = ds.map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id").filter(
                pc.fill_null(pc.match_substring(
                    pc.utf8_lower(b.column("text").combine_chunks()),
                    needle), False))}),
            batch_format="pyarrow", batch_size=None,
        ).count()
        w_scan = time.time() - t0
        assert n == n_scan, (needle, n, n_scan)
        print(json.dumps({
            "op": "substring_probe", "needle": needle, "matches": n,
            "probe_sec": round(w_probe, 2),
            "full_scan_sec": round(w_scan, 2),
            "speedup": round(w_scan / max(w_probe, 1e-9), 1),
        }))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    if "--verify" in sys.argv or "--verify-only" in sys.argv:
        verify_small()
    if "--verify-only" not in sys.argv:
        bench()
    ray.shutdown()
