#!/usr/bin/env python
"""Scale-stress the round-4/5 mutation ops (VERDICT r4 item 5).

- apply_changes (MERGE INTO analog): 100M-row initial load over 10M keys
  (64 partitions), then a 20M-row incremental merge with 2% deletes —
  the binlog-free mutation path end to end (pre-reduce → one hash
  exchange → per-partition LWW merge + manifest CAS).
- repartition_table 64 → 128 over the resulting 10M-key lake, THEN a
  real crash-resume demo: re-run the rebuild in a subprocess, SIGKILL it
  mid-exchange, and resume — committed (generation, epoch, partition)
  manifests make re-merged partitions CAS no-ops, so the resumed run
  only pays for the tail.  Visible state is asserted byte-equal to the
  pre-repartition snapshot digest both times.
- similarity_join_words over a SKEWED (Zipf-ish) vocabulary: the PPJoin
  prefix filter orders postings by global document frequency, so hot
  words land at the END of each prefix and candidate volume stays
  bounded even when the top word appears in ~half the corpus — the
  behavior this leg measures.

`--verify` first re-checks apply_changes (initial + incremental w/
deletes) against a DuckDB LWW oracle at 200k rows / 50k keys, and the
skewed similarity join against the exact DuckDB pair join at 20k docs.
Each stage prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
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

N_INIT = int(os.environ.get("GRAFT_R5_INIT", 100_000_000))
N_KEYS = int(os.environ.get("GRAFT_R5_KEYS", 10_000_000))
N_INCR = int(os.environ.get("GRAFT_R5_INCR", 20_000_000))
PARTS = 64
LAKE = os.environ.get("GRAFT_R5_LAKE", "/dev/shm/adr_r5_lake")

SJ_DOCS = int(os.environ.get("GRAFT_R5_SJ_DOCS", 1_000_000))
SJ_VOCAB = 50_000
SJ_WORDS = 30
SJ_COPY_EVERY = 100

GOLD = np.uint64(0x9E3779B97F4A7C15)
GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= GOLD2
    h ^= h >> np.uint64(29)
    return h


# -- apply_changes generators ------------------------------------------------


def _change_batch(batch: pa.Table, *, n_keys: int, ver_base: int,
                  with_deletes: bool) -> pa.Table:
    """Deterministic change stream: row i touches key hash(i)%n_keys with
    version ver_base+i; ~2% deletes when with_deletes."""
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    h = _mix(i.astype(np.uint64) * GOLD)
    key = (h % np.uint64(n_keys)).astype(np.int64)
    url = pc.binary_join_element_wise(
        pa.scalar("u"),
        pc.cast(pa.array(key), pa.string()),
        pa.scalar(""),
    )
    ver = ver_base + i
    text = pc.binary_join_element_wise(
        pa.scalar("payload-"),
        pc.cast(pa.array((h >> np.uint64(17)).astype(np.int64)), pa.string()),
        pa.scalar("-"),
        pc.cast(pa.array(i), pa.string()),
        pa.scalar(""),
    )
    cols = {
        "url": url,
        "warc_ts": pa.array(ver, type=pa.int64()),
        "text": text,
        "lang": pc.binary_join_element_wise(
            pa.scalar("l"),
            pc.cast(pa.array((key % 20)), pa.string()),
            pa.scalar(""),
        ),
    }
    if with_deletes:
        cols["op"] = pc.if_else(
            pa.array(((h >> np.uint64(9)) % np.uint64(50)) == 0),
            pa.scalar("D"),
            pa.scalar("U"),
        )
    return pa.table(cols)


def _changes_ds(n_rows: int, *, n_keys: int, ver_base: int,
                with_deletes: bool):
    return ray.data.range(n_rows).map_batches(
        lambda b: _change_batch(
            b, n_keys=n_keys, ver_base=ver_base, with_deletes=with_deletes
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def _visible_digest(lake: str, table: str) -> tuple[int, int]:
    """(row_count, order-insensitive value fold) over the visible state."""
    from airbyte_destination_ray.pipelines.cdc import read_table

    def fold(b: pa.Table) -> pa.Table:
        from airbyte_destination_ray.functions.hashing import (
            stable_hash_array,
        )

        h = stable_hash_array(b.column("url")).astype(np.uint64)
        h ^= stable_hash_array(b.column("warc_ts")).astype(np.uint64)
        h ^= stable_hash_array(b.column("text")).astype(np.uint64)
        return pa.table({
            "n": pa.array([b.num_rows], type=pa.int64()),
            "x": pa.array([int(np.bitwise_xor.reduce(_mix(h), initial=0))],
                          type=pa.uint64()),
        })

    parts = read_table(lake, table).map_batches(
        fold, batch_format="pyarrow", batch_size=None
    ).take_all()
    return (sum(r["n"] for r in parts),
            int(np.bitwise_xor.reduce(
                np.array([r["x"] for r in parts], dtype=np.uint64),
                initial=np.uint64(0))))


def verify_apply_small() -> None:
    import duckdb

    from airbyte_destination_ray.pipelines.cdc import (
        apply_changes,
        read_table_arrow,
    )

    lake = "/tmp/adr_r5_verify_lake"
    shutil.rmtree(lake, ignore_errors=True)
    n0, n1, keys = 200_000, 50_000, 50_000
    apply_changes(
        lake, "pages",
        _changes_ds(n0, n_keys=keys, ver_base=0, with_deletes=False),
        pk="url", ver="warc_ts", op_col=None,
        payload_columns=["url", "warc_ts", "text", "lang"],
        num_partitions=16, epoch=0,
    )
    apply_changes(
        lake, "pages",
        _changes_ds(n1, n_keys=keys, ver_base=n0, with_deletes=True),
        pk="url", ver="warc_ts",
        payload_columns=["url", "warc_ts", "text", "lang"],
        num_partitions=16, epoch=1,
    )
    got = read_table_arrow(lake, "pages").select(
        ["url", "warc_ts", "text", "lang"]).sort_by("url")

    both = pa.concat_tables([
        pa.concat_tables(_changes_ds(
            n0, n_keys=keys, ver_base=0, with_deletes=False
        ).iter_batches(batch_format="pyarrow", batch_size=65536)
        ).append_column("op", pa.array(["U"] * n0)),
        pa.concat_tables(_changes_ds(
            n1, n_keys=keys, ver_base=n0, with_deletes=True
        ).iter_batches(batch_format="pyarrow", batch_size=65536)),
    ])
    con = duckdb.connect()
    con.register("ch", both)
    exp = con.sql(
        """
        SELECT url, warc_ts, text, lang FROM (
            SELECT *, row_number() OVER (
                PARTITION BY url ORDER BY warc_ts DESC) AS rn
            FROM ch)
        WHERE rn = 1 AND op = 'U' ORDER BY url
        """
    ).arrow().cast(got.schema)
    assert got.equals(exp), (got.num_rows, exp.num_rows)
    shutil.rmtree(lake, ignore_errors=True)
    print(json.dumps({"verify": "apply_changes", "rows": got.num_rows,
                      "ok": True}))


# -- skewed-vocab similarity join -------------------------------------------


def _skew_doc_batch(batch: pa.Table) -> pa.Table:
    """Zipf-ish corpus: word id = floor(V * u^3) (u uniform) — the top
    word covers ~2.7% of ALL tokens (~55% of docs contain it), the top
    10 words ~6%.  ids >= SJ_DOCS are near-copies of
    (id - SJ_DOCS) * SJ_COPY_EVERY with one extra word."""
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    is_copy = i >= SJ_DOCS
    base = np.where(is_copy, (i - SJ_DOCS) * SJ_COPY_EVERY, i).astype(
        np.uint64)
    n = len(i)
    lens = np.where(is_copy, SJ_WORDS + 1, SJ_WORDS).astype(np.int64)
    total = int(lens.sum())
    rows = np.repeat(np.arange(n), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    j = (np.arange(total) - starts[rows]).astype(np.uint64)
    h = _mix(base[rows] * GOLD + (j + np.uint64(1)) * GOLD2)
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    w = np.minimum((u ** 3 * SJ_VOCAB).astype(np.int64), SJ_VOCAB - 1)
    flat = pc.cast(pa.array(w), pa.string())
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    words = pa.ListArray.from_arrays(pa.array(offs), flat)
    text = pc.binary_join(words, " ")
    doc_id = np.where(is_copy, 10_000_000 + (i - SJ_DOCS) * SJ_COPY_EVERY, i)
    return pa.table({
        "doc_id": pa.array(doc_id.astype(np.int64)),
        "text": text,
    })


def _skew_docs(n_docs: int):
    total = n_docs + n_docs // SJ_COPY_EVERY
    return ray.data.range(total).map_batches(
        _skew_doc_batch, batch_format="pyarrow", batch_size=None
    )


def verify_skew_join_small() -> None:
    import duckdb

    from airbyte_destination_ray.pipelines.linkage import (
        similarity_join_words,
    )

    global SJ_DOCS
    saved = SJ_DOCS
    SJ_DOCS = 20_000
    try:
        tbl = pa.concat_tables(_skew_docs(SJ_DOCS).iter_batches(
            batch_format="pyarrow", batch_size=65536))
        con = duckdb.connect()
        con.register("docs", tbl)
        exp = con.sql(
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
            SELECT ia, ib, c, za.n + zb.n - c AS u
            FROM inter JOIN sz za ON za.doc_id = ia
            JOIN sz zb ON zb.doc_id = ib
            WHERE 9 * c >= 4 * (za.n + zb.n) ORDER BY ia, ib
            """
        ).fetchall()
        got = sorted(
            (r["doc_a"], r["doc_b"], r["inter_words"], r["union_words"])
            for r in similarity_join_words(
                _skew_docs(SJ_DOCS), threshold=0.8, shingle_k=5,
                num_partitions=16,
            ).take_all()
        )
        assert got == [tuple(r) for r in exp], (len(got), len(exp))
        print(json.dumps({"verify": "skew_similarity_join",
                          "pairs": len(got), "ok": True}))
    finally:
        SJ_DOCS = saved


def bench_skew_join() -> None:
    from airbyte_destination_ray.pipelines.linkage import (
        similarity_join_words,
    )

    n_total = SJ_DOCS + SJ_DOCS // SJ_COPY_EVERY
    t0 = time.time()
    n_pairs = similarity_join_words(
        _skew_docs(SJ_DOCS), threshold=0.8, shingle_k=5,
        num_partitions=256,
    ).count()
    wall = time.time() - t0
    print(json.dumps({
        "op": "similarity_join_words_skewed", "docs": n_total,
        "pairs": n_pairs, "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_total / wall),
    }))


# -- stress legs -------------------------------------------------------------


def bench_apply_changes() -> None:
    from airbyte_destination_ray.pipelines.cdc import apply_changes

    shutil.rmtree(LAKE, ignore_errors=True)
    t0 = time.time()
    apply_changes(
        LAKE, "pages",
        _changes_ds(N_INIT, n_keys=N_KEYS, ver_base=0, with_deletes=False),
        pk="url", ver="warc_ts", op_col=None,
        payload_columns=["url", "warc_ts", "text", "lang"],
        num_partitions=PARTS, epoch=0, compute_digest=False,
    )
    w0 = time.time() - t0
    print(json.dumps({
        "op": "apply_changes_initial", "rows": N_INIT, "keys": N_KEYS,
        "partitions": PARTS, "wall_sec": round(w0, 2),
        "rows_per_sec": round(N_INIT / w0),
    }))
    t0 = time.time()
    apply_changes(
        LAKE, "pages",
        _changes_ds(N_INCR, n_keys=N_KEYS, ver_base=N_INIT,
                    with_deletes=True),
        pk="url", ver="warc_ts",
        payload_columns=["url", "warc_ts", "text", "lang"],
        num_partitions=PARTS, epoch=1, compute_digest=False,
    )
    w1 = time.time() - t0
    n, x = _visible_digest(LAKE, "pages")
    print(json.dumps({
        "op": "apply_changes_incremental", "rows": N_INCR,
        "deletes_pct": 2, "wall_sec": round(w1, 2),
        "rows_per_sec": round(N_INCR / w1),
        "visible_rows": n, "digest": x,
    }))


def bench_repartition(kill_after_frac: float = 0.5) -> None:
    from airbyte_destination_ray.pipelines.cdc import repartition_table
    from airbyte_destination_ray.state.manifest import ManifestStore

    pre_n, pre_x = _visible_digest(LAKE, "pages")
    t0 = time.time()
    repartition_table(LAKE, "pages", PARTS * 2, compute_digest=False)
    w_fresh = time.time() - t0
    n, x = _visible_digest(LAKE, "pages")
    assert (n, x) == (pre_n, pre_x), "repartition changed visible state"
    print(json.dumps({
        "op": "repartition_table", "keys": n,
        "from_partitions": PARTS, "to_partitions": PARTS * 2,
        "wall_sec": round(w_fresh, 2), "keys_per_sec": round(n / w_fresh),
    }))

    # crash-resume demo: child rebuild back to PARTS, SIGKILLed once it
    # has committed about half the staged partitions (polled — a fixed
    # sleep races the child's own ray.init and can kill before any work)
    child = subprocess.Popen(
        [sys.executable, __file__, "--child-repartition", LAKE,
         str(PARTS)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    store = ManifestStore(LAKE, "pages")
    deadline = time.time() + 180
    committed_before = 0
    while time.time() < deadline and child.poll() is None:
        meta = store.table_meta()
        if meta.get("repartition_target"):
            committed_before = len(
                store._iter_manifests(int(meta["generation"]))
            )
            if committed_before >= PARTS // 2:
                break
        time.sleep(0.1)
    child_finished = child.poll() is not None
    try:
        os.killpg(child.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    child.wait()
    t0 = time.time()
    repartition_table(LAKE, "pages", PARTS, compute_digest=False)
    w_resume = time.time() - t0
    n2, x2 = _visible_digest(LAKE, "pages")
    assert (n2, x2) == (pre_n, pre_x), "resume changed visible state"
    print(json.dumps({
        "op": "repartition_resume_after_kill",
        "committed_partitions_at_kill": committed_before,
        "of_partitions": PARTS,
        "child_finished_before_kill": child_finished,
        "resume_wall_sec": round(w_resume, 2),
        "state_equal": True,
    }))


def _child_repartition(lake: str, parts: int) -> None:
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from airbyte_destination_ray.pipelines.cdc import repartition_table

    repartition_table(lake, "pages", parts, compute_digest=False)


if __name__ == "__main__":
    if "--child-repartition" in sys.argv:
        i = sys.argv.index("--child-repartition")
        _child_repartition(sys.argv[i + 1], int(sys.argv[i + 2]))
        sys.exit(0)
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    if "--verify" in sys.argv:
        verify_apply_small()
        verify_skew_join_small()
    if "--verify-only" not in sys.argv:
        bench_apply_changes()
        bench_repartition()
        if "--no-skew" not in sys.argv:
            bench_skew_join()
        shutil.rmtree(LAKE, ignore_errors=True)
    ray.shutdown()
