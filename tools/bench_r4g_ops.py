#!/usr/bin/env python
"""Scale-stress the round-4 session-G ops (DuckDB-verified small first,
same generators):

- similarity_join_words: 1M docs (~30 words each, 50k vocab) + 10k
  planted near-copies, word-5-gram Jaccard >= 0.8 — prefix-filtered
  candidate generation (AllPairs/PPJoin), exact integer verify.
- dup_window_stats: same corpus, per-doc cross-corpus duplicate-window
  profile (two hash exchanges, ~26M postings).
- run_incremental_join_view: 20M interleaved fact+dim change events over
  2M users, 3 epochs, 64 partitions — exchange-free delta-join
  maintenance (one routing groupby per epoch).

Each stage prints one JSON line; results recorded in BASELINE.md.
The join view's correctness is pinned by tests/test_joinview.py (DuckDB
one-shot join + replay + time travel); --verify here re-checks the
similarity join and dup-window profile against DuckDB at 20k docs.
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

N_DOCS = int(os.environ.get("GRAFT_R4G_DOCS", 1_000_000))
COPY_EVERY = 100
WORDS_PER_DOC = 30
VOCAB = 50_000
VERIFY_DOCS = 20_000

JV_EVENTS = int(os.environ.get("GRAFT_R4G_EVENTS", 20_000_000))
JV_USERS = 2_000_000
JV_EPOCHS = 3
JV_PARTS = 64

GOLD = np.uint64(0x9E3779B97F4A7C15)
GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _doc_batch(batch: pa.Table) -> pa.Table:
    """Deterministic corpus: doc i = 30 vocab words; ids >= N_DOCS are
    near-copies of (id - N_DOCS) * COPY_EVERY with ONE extra word."""
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    is_copy = i >= N_DOCS
    base = np.where(is_copy, (i - N_DOCS) * COPY_EVERY, i).astype(np.uint64)
    n = len(i)
    lens = np.where(is_copy, WORDS_PER_DOC + 1, WORDS_PER_DOC).astype(
        np.int64
    )
    total = int(lens.sum())
    rows = np.repeat(np.arange(n), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    j = (np.arange(total) - starts[rows]).astype(np.uint64)
    # full avalanche mix — without it the per-doc word sequence is an
    # arithmetic progression mod VOCAB and every doc shares long runs
    h = base[rows] * GOLD + (j + np.uint64(1)) * GOLD2
    h ^= h >> np.uint64(33)
    h *= GOLD2
    h ^= h >> np.uint64(29)
    w = (h >> np.uint64(13)) % np.uint64(VOCAB)
    flat = pc.cast(pa.array(w.astype(np.int64)), pa.string())
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    words = pa.ListArray.from_arrays(pa.array(offs), flat)
    text = pc.binary_join(words, " ")
    doc_id = np.where(is_copy, 10_000_000 + (i - N_DOCS) * COPY_EVERY, i)
    return pa.table(
        {
            "doc_id": pa.array(doc_id.astype(np.int64)),
            "text": text,
        }
    )


def synth_docs(n_docs: int):
    total = n_docs + n_docs // COPY_EVERY
    return ray.data.range(total).map_batches(
        _doc_batch, batch_format="pyarrow", batch_size=None
    )


def verify_small() -> None:
    import duckdb

    global N_DOCS
    saved = N_DOCS
    N_DOCS = VERIFY_DOCS
    try:
        from airbyte_destination_ray.pipelines.corpus import dup_window_stats
        from airbyte_destination_ray.pipelines.linkage import (
            similarity_join_words,
        )

        tbl = pa.concat_tables(
            synth_docs(VERIFY_DOCS).iter_batches(
                batch_format="pyarrow", batch_size=65536
            )
        )
        con = duckdb.connect()
        con.register("docs", tbl)
        exp_pairs = con.sql(
            """
            WITH w AS (SELECT doc_id,
                       string_split_regex(trim(text), '\\s+') AS ws
                       FROM docs),
            s AS (SELECT DISTINCT doc_id, unnest(list_transform(
                      generate_series(1, greatest(len(ws) - 4, 0)),
                      i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                  )) AS sh FROM w),
            sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
            inter AS (SELECT a.doc_id ia, b.doc_id ib, count(*) c
                      FROM s a JOIN s b
                      ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT ia, ib, c,
                   za.n + zb.n - c AS u
            FROM inter JOIN sz za ON za.doc_id = ia
            JOIN sz zb ON zb.doc_id = ib
            WHERE 9 * c >= 4 * (za.n + zb.n) ORDER BY ia, ib
            """
        ).fetchall()
        got = sorted(
            (r["doc_a"], r["doc_b"], r["inter_words"], r["union_words"])
            for r in similarity_join_words(
                synth_docs(VERIFY_DOCS), threshold=0.8, shingle_k=5,
                num_partitions=16,
            ).take_all()
        )
        assert got == [tuple(r) for r in exp_pairs], (
            len(got), len(exp_pairs))
        print(json.dumps({"verify": "similarity_join",
                          "pairs": len(got), "ok": True}))

        exp_dup = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                """
                WITH w AS (SELECT doc_id,
                           string_split_regex(trim(text), '\\s+') AS ws
                           FROM docs),
                s AS (SELECT DISTINCT doc_id, unnest(list_transform(
                          generate_series(1, greatest(len(ws) - 4, 0)),
                          i -> array_to_string(list_slice(ws, i, i + 4), ' ')
                      )) AS sh FROM w),
                df AS (SELECT sh, count(*) cnt FROM s GROUP BY sh)
                SELECT s.doc_id, count(*),
                       sum(CASE WHEN df.cnt >= 2 THEN 1 ELSE 0 END)
                FROM s JOIN df USING (sh) GROUP BY s.doc_id
                """
            ).fetchall()
        }
        got_dup = {
            r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
            for r in dup_window_stats(
                synth_docs(VERIFY_DOCS), window_k=5, num_partitions=16
            ).take_all()
        }
        assert got_dup == exp_dup, (len(got_dup), len(exp_dup))
        print(json.dumps({"verify": "dup_window_stats",
                          "docs": len(got_dup), "ok": True}))
    finally:
        N_DOCS = saved


def bench_similarity_join() -> None:
    from airbyte_destination_ray.pipelines.linkage import (
        similarity_join_words,
    )

    n_total = N_DOCS + N_DOCS // COPY_EVERY
    t0 = time.time()
    n_pairs = similarity_join_words(
        synth_docs(N_DOCS), threshold=0.8, shingle_k=5,
        num_partitions=256,
    ).count()
    wall = time.time() - t0
    print(json.dumps({
        "op": "similarity_join_words", "docs": n_total,
        "pairs": n_pairs, "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_total / wall),
    }))


def bench_dup_windows() -> None:
    from airbyte_destination_ray.pipelines.corpus import dup_window_stats

    n_total = N_DOCS + N_DOCS // COPY_EVERY
    t0 = time.time()
    out = dup_window_stats(
        synth_docs(N_DOCS), window_k=5, num_partitions=256
    )
    agg = out.map_batches(
        lambda b: pa.table({
            "docs": [b.num_rows],
            "dup_docs": [int(
                pc.sum(pc.greater(b.column("n_dup_windows"), 0)).as_py()
                or 0)],
        }),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    wall = time.time() - t0
    docs = sum(r["docs"] for r in agg)
    dup_docs = sum(r["dup_docs"] for r in agg)
    print(json.dumps({
        "op": "dup_window_stats", "docs": n_total,
        "profiled": docs, "docs_with_dup_windows": dup_docs,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_total / wall),
    }))


def _write_jv_binlogs(base: Path) -> None:
    import pyarrow.parquet as pq

    for name in ("fact", "dim"):
        (base / name).mkdir(parents=True, exist_ok=True)
    per_epoch = JV_EVENTS // JV_EPOCHS
    for e in range(JV_EPOCHS):
        lo = e * per_epoch
        hi = JV_EVENTS if e == JV_EPOCHS - 1 else lo + per_epoch
        i = np.arange(lo, hi, dtype=np.int64)
        h = i.astype(np.uint64) * GOLD
        uid = ((h >> np.uint64(7)) % np.uint64(JV_USERS)).astype(np.int64)
        ts = (i * 1000).astype("datetime64[us]")
        val = ((h >> np.uint64(23)) & np.uint64(1023)).astype(
            np.float64) / 10.0
        fact = pa.table({
            "seq": pa.array(i), "epoch": pa.array(
                np.full(len(i), e, dtype=np.int32)),
            "op": pa.array(
                np.where(i % 50 == 0, "D", "U")),
            "event_id": pa.array(i),
            "ts": pa.array(ts),
            "user_id": pa.array(uid),
            "value": pa.array(val),
        })
        pq.write_table(fact, base / "fact" /
                       f"segment-e{e:05d}-0000.parquet")
        dim = pa.table({
            "seq": pa.array(i), "epoch": pa.array(
                np.full(len(i), e, dtype=np.int32)),
            "op": pa.array(["U"] * len(i)),
            "user_id": pa.array(uid),
            "ver": pa.array(i * 1000),
            "last_event_type": pc.cast(
                pa.array((i % 7).astype(np.int64)), pa.string()),
            "last_value_cents": pa.array(
                np.floor(val * 100).astype(np.int64)),
        })
        pq.write_table(dim, base / "dim" /
                       f"segment-e{e:05d}-0000.parquet")
    for name in ("fact", "dim"):
        (base / name / "_binlog.json").write_text(json.dumps({
            "n_epochs": JV_EPOCHS,
            "segments": [f"segment-e{e:05d}-0000.parquet"
                         for e in range(JV_EPOCHS)],
        }))


def bench_join_view() -> None:
    from airbyte_destination_ray.pipelines.joinview import (
        read_join_view,
        run_incremental_join_view,
    )

    base = Path("/dev/shm/adr_r4g_jv")
    shutil.rmtree(base, ignore_errors=True)
    _write_jv_binlogs(base / "binlog")
    t0 = time.time()
    run_incremental_join_view(
        str(base / "lake"), str(base / "binlog/fact"),
        str(base / "binlog/dim"), num_partitions=JV_PARTS,
    )
    wall = time.time() - t0
    rows = read_join_view(str(base / "lake")).count()
    print(json.dumps({
        "op": "incremental_join_view",
        "change_events": 2 * JV_EVENTS, "epochs": JV_EPOCHS,
        "users": JV_USERS, "view_rows": rows,
        "wall_sec": round(wall, 2),
        "changes_per_sec": round(2 * JV_EVENTS / wall),
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    if "--verify" in sys.argv:
        verify_small()
    bench_similarity_join()
    bench_dup_windows()
    bench_join_view()
    ray.shutdown()
