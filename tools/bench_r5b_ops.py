#!/usr/bin/env python
"""Scale-stress the round-5 ops (DuckDB-verified small first):

- doc_lm_score: 10M docs × 30 words (50k vocab) — corpus bigram-LM build
  (top-50k model) + zero-exchange scoring.
- cooccurrence_pmi: same corpus, window 3, vocab 2k — vocab-filtered
  pair exchange + integer PMI top-k.
- run_incremental_state_agg: 20M change events (2% deletes) over 2M keys
  × 3 epochs, 20 groups — change-feed retraction folds into persistent
  aggregate state; verified vs one-shot DuckDB GROUP BY over the final
  snapshot at 1M rows first.

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

N_DOCS = int(os.environ.get("GRAFT_R5B_DOCS", 10_000_000))
WORDS_PER_DOC = 30
VOCAB = 50_000
SA_EVENTS = int(os.environ.get("GRAFT_R5B_EVENTS", 20_000_000))
SA_KEYS = 2_000_000
SA_EPOCHS = 3
LAKE = "/dev/shm/adr_r5b_lake"

GOLD = np.uint64(0x9E3779B97F4A7C15)
GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix(h):
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= GOLD2
    h ^= h >> np.uint64(29)
    return h


def _doc_batch(batch: pa.Table, vocab: int) -> pa.Table:
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(i)
    rows = np.repeat(np.arange(n), WORDS_PER_DOC)
    j = np.tile(np.arange(WORDS_PER_DOC, dtype=np.uint64), n)
    h = _mix(i.astype(np.uint64)[rows] * GOLD + (j + np.uint64(1)) * GOLD2)
    w = (h >> np.uint64(13)) % np.uint64(vocab)
    flat = pc.cast(pa.array(w.astype(np.int64)), pa.string())
    offs = (np.arange(n + 1) * WORDS_PER_DOC).astype(np.int32)
    words = pa.ListArray.from_arrays(pa.array(offs), flat)
    return pa.table(
        {"doc_id": pa.array(i), "text": pc.binary_join(words, " ")}
    )


def docs(n, vocab=VOCAB):
    return ray.data.range(n).map_batches(
        lambda b: _doc_batch(b, vocab),
        batch_format="pyarrow", batch_size=None,
    )


def verify_small() -> None:
    import duckdb

    from airbyte_destination_ray.pipelines.corpus import (
        cooccurrence_pmi,
        doc_lm_score,
    )

    n = 20_000
    tbl = pa.concat_tables(
        docs(n).iter_batches(batch_format="pyarrow", batch_size=65536)
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    K = 5_000
    exp = con.sql(
        """
        WITH l AS (
            SELECT doc_id, list_filter(string_split_regex(
                lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
            FROM documents WHERE text IS NOT NULL
        ), tokocc AS (SELECT unnest(toks) AS tok FROM l),
        c1 AS (SELECT tok, CAST(count(*) AS BIGINT) c1 FROM tokocc
               GROUP BY tok),
        g AS (SELECT doc_id, unnest(list_transform(
                  generate_series(1, len(toks)-1),
                  i -> toks[i] || ' ' || toks[i+1])) AS gram FROM l),
        c2 AS (SELECT gram, CAST(count(*) AS BIGINT) c2 FROM g
               GROUP BY gram),
        topk AS (SELECT gram, c2, split_part(gram,' ',1) lt FROM c2
                 QUALIFY row_number() OVER (ORDER BY c2 DESC, gram)
                     <= 5000),
        sc AS (SELECT t.gram, (1000000*t.c2)//u.c1 s
               FROM topk t JOIN c1 u ON u.tok = t.lt)
        SELECT g.doc_id, CAST(count(*) AS BIGINT) n_bigrams,
               CAST(count(sc.s) AS BIGINT) n_matched,
               CAST(COALESCE(sum(sc.s),0) AS BIGINT) lm_score
        FROM g LEFT JOIN sc ON sc.gram = g.gram
        GROUP BY g.doc_id ORDER BY g.doc_id
        """
    ).arrow()
    got = (
        pa.concat_tables(
            doc_lm_score(docs(n), top_k=K, num_partitions=16).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        .sort_by("doc_id")
        .cast(exp.schema)
    )
    assert got.equals(exp), (got.num_rows, exp.num_rows)
    print(json.dumps({"verify": "doc_lm_score", "docs": n, "ok": True}))

    tbl2 = pa.concat_tables(
        docs(n, vocab=200).iter_batches(
            batch_format="pyarrow", batch_size=65536
        )
    )
    con.register("documents2", tbl2)
    exp2 = con.sql(
        """
        WITH l AS (
            SELECT doc_id, list_filter(string_split_regex(
                lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
            FROM documents2 WHERE text IS NOT NULL
        ), tokocc AS (SELECT unnest(toks) AS tok FROM l),
        tot AS (SELECT CAST(count(*) AS BIGINT) n FROM tokocc),
        c1 AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM tokocc
               GROUP BY tok),
        vocab AS (SELECT tok, c FROM c1
                  QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= 150),
        pr AS (SELECT unnest(flatten(list_transform(
                   generate_series(1, len(toks)-1),
                   i -> list_transform(
                       generate_series(i+1, least(i+3, len(toks))),
                       j -> [toks[i], toks[j]])))) AS p FROM l),
        pw AS (SELECT p[1] w1, p[2] w2 FROM pr
               WHERE p[1] IN (SELECT tok FROM vocab)
                 AND p[2] IN (SELECT tok FROM vocab)),
        c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) c_ab FROM pw
               GROUP BY w1, w2 HAVING count(*) >= 3)
        SELECT w1, w2, c_ab,
               CAST((1000000 * c_ab * (SELECT n FROM tot))
                    // (va.c * vb.c) AS BIGINT) pmi_scaled
        FROM c2 JOIN vocab va ON va.tok = w1 JOIN vocab vb ON vb.tok = w2
        QUALIFY row_number() OVER (ORDER BY pmi_scaled DESC, w1, w2)
            <= 200
        """
    ).arrow()
    got2_batches = list(
        cooccurrence_pmi(
            docs(n, vocab=200), window=3, vocab_k=150, min_count=3,
            top_k=200, num_partitions=16,
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    got2 = pa.concat_tables(got2_batches).cast(exp2.schema)
    assert got2.equals(exp2), (got2.num_rows, exp2.num_rows)
    print(json.dumps({"verify": "cooccurrence_pmi", "docs": n, "ok": True}))


def bench_lm() -> None:
    from airbyte_destination_ray.pipelines.corpus import doc_lm_score

    t0 = time.time()
    n_out = doc_lm_score(
        docs(N_DOCS), top_k=50_000, num_partitions=64
    ).count()
    wall = time.time() - t0
    print(json.dumps({
        "op": "doc_lm_score", "docs": N_DOCS, "scored": n_out,
        "wall_sec": round(wall, 2), "docs_per_sec": round(N_DOCS / wall),
    }))


def bench_pmi() -> None:
    from airbyte_destination_ray.pipelines.corpus import cooccurrence_pmi

    t0 = time.time()
    out = cooccurrence_pmi(
        docs(N_DOCS, vocab=5000), window=3, vocab_k=2000, min_count=5,
        top_k=1000, num_partitions=64,
    ).take_all()
    wall = time.time() - t0
    print(json.dumps({
        "op": "cooccurrence_pmi", "docs": N_DOCS, "pairs_out": len(out),
        "wall_sec": round(wall, 2), "docs_per_sec": round(N_DOCS / wall),
    }))




def bench_excise() -> None:
    """1M docs + 10k exact copies (every 100th doc re-emitted at
    id+10M): copies share every 20-token window with their original, so
    ~ the whole copy body must excise; originals keep-first survive."""
    from airbyte_destination_ray.pipelines.corpus import (
        excise_duplicate_spans,
    )

    n = 1_000_000

    def with_copies(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        copies = batch.filter(pa.array(ids % 100 == 0))
        copies = copies.set_column(
            copies.schema.get_field_index("doc_id"), "doc_id",
            pc.add(copies.column("doc_id"), pa.scalar(10_000_000)),
        )
        return pa.concat_tables([batch, copies])

    ds = docs(n).map_batches(
        with_copies, batch_format="pyarrow", batch_size=None
    )
    t0 = time.time()
    agg = excise_duplicate_spans(
        ds, window_k=20, num_partitions=64
    ).map_batches(
        lambda b: pa.table({
            "docs": pa.array([b.num_rows], type=pa.int64()),
            "removed": pa.array(
                [int(pc.sum(b.column("n_removed")).as_py() or 0)],
                type=pa.int64()),
            "excised_docs": pa.array(
                [int(pc.sum(pc.cast(pc.greater(
                    b.column("n_removed"), 0), pa.int64())).as_py() or 0)],
                type=pa.int64()),
        }),
        batch_format="pyarrow", batch_size=None,
    ).take_all()
    wall = time.time() - t0
    total = n + n // 100
    print(json.dumps({
        "op": "excise_duplicate_spans", "docs": total,
        "docs_out": sum(r["docs"] for r in agg),
        "tokens_removed": sum(r["removed"] for r in agg),
        "docs_excised": sum(r["excised_docs"] for r in agg),
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(total / wall),
    }))


# -- state agg ---------------------------------------------------------------


def _sa_batch(batch, *, epoch, n_keys):
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
    h = _mix(i.astype(np.uint64) * GOLD + np.uint64(epoch + 1) * GOLD2)
    key = (h % np.uint64(n_keys)).astype(np.int64)
    return pa.table({
        "seq": pa.array(i),
        "epoch": pa.array(np.full(len(i), epoch, dtype=np.int32)),
        "op": pc.if_else(
            pa.array(((h >> np.uint64(9)) % np.uint64(50)) == 0),
            pa.scalar("D"), pa.scalar("U")),
        "url": pc.binary_join_element_wise(
            pa.scalar("u"), pc.cast(pa.array(key), pa.string()),
            pa.scalar("")),
        "warc_ts": pa.array(i, type=pa.int64()),
        "text": pa.array(np.full(len(i), "x"), type=pa.string()),
        "lang": pc.binary_join_element_wise(
            pa.scalar("g"), pc.cast(pa.array(key % 20), pa.string()),
            pa.scalar("")),
    })


def _write_sa_binlog(base: Path, n_events: int, n_keys: int) -> None:
    import pyarrow.parquet as pq

    base.mkdir(parents=True, exist_ok=True)
    per = n_events // SA_EPOCHS
    segs = []
    for e in range(SA_EPOCHS):
        lo = e * per
        hi = n_events if e == SA_EPOCHS - 1 else lo + per
        t = _sa_batch(
            pa.table({"id": pa.array(np.arange(lo, hi, dtype=np.int64))}),
            epoch=e, n_keys=n_keys,
        )
        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(t, base / name)
        segs.append(name)
    (base / "_binlog.json").write_text(
        json.dumps({"n_epochs": SA_EPOCHS, "segments": segs})
    )


def _run_sa(base: Path, n_events: int, n_keys: int, parts: int):
    from airbyte_destination_ray.pipelines.aggview import (
        run_incremental_state_agg,
    )
    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync

    _write_sa_binlog(base / "binlog", n_events, n_keys)
    run_cdc_sync(
        str(base / "lake"), str(base / "binlog"),
        num_partitions=parts, compute_digest=False,
        payload_columns=["url", "warc_ts", "text", "lang"],
    )
    t0 = time.time()
    run_incremental_state_agg(
        str(base / "lake"), row_table="pages", table="state_agg",
        group_col="lang", value_col="warc_ts", num_partitions=8,
    )
    return time.time() - t0


def verify_sa_small() -> None:
    import duckdb

    from airbyte_destination_ray.pipelines.aggview import read_agg
    from airbyte_destination_ray.pipelines.cdc import read_table_arrow

    base = Path("/tmp/adr_r5b_sa_verify")
    shutil.rmtree(base, ignore_errors=True)
    _run_sa(base, 1_000_000, 100_000, 16)
    got = {
        (r["k"], r["n"], r["sum_cents"])
        for r in read_agg(str(base / "lake"), "state_agg").take_all()
    }
    snap = read_table_arrow(str(base / "lake"), "pages")
    con = duckdb.connect()
    con.register("snap", snap)
    exp = {
        tuple(r) for r in con.sql(
            """
            SELECT lang, CAST(count(*) AS BIGINT),
                   CAST(sum(warc_ts * 100) AS BIGINT)
            FROM snap WHERE lang IS NOT NULL GROUP BY lang
            """
        ).fetchall()
    }
    assert got == exp, (len(got), len(exp))
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"verify": "state_agg", "rows": 1_000_000,
                      "groups": len(got), "ok": True}))


def bench_sa() -> None:
    base = Path(LAKE)
    shutil.rmtree(base, ignore_errors=True)
    wall = _run_sa(base, SA_EVENTS, SA_KEYS, 64)
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({
        "op": "incremental_state_agg", "change_events": SA_EVENTS,
        "keys": SA_KEYS, "epochs": SA_EPOCHS, "groups": 20,
        "wall_sec": round(wall, 2),
        "changes_per_sec": round(SA_EVENTS / wall),
    }))


if __name__ == "__main__":
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    if "--verify" in sys.argv:
        verify_small()
        verify_sa_small()
    if "--verify-only" not in sys.argv:
        if "--excise-only" in sys.argv:
            bench_excise()
        else:
            bench_lm()
            bench_pmi()
            bench_sa()
            bench_excise()
    ray.shutdown()
