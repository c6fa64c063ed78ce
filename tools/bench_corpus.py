#!/usr/bin/env python
"""Scale-stress + equality check for the segment-granularity corpus tier.

Synthesizes a deterministic multi-line web-ish corpus (a configurable mix
of high-DF boilerplate lines and unique content lines), then:

1. (--verify) checks remove_frequent_segments and dedup_segments_first
   byte-for-byte against DuckDB at a small scale;
2. times both operators at full scale (default 1M docs x 8 lines,
   ~300 MB of text) and prints one JSON line.

Usage:  python tools/bench_corpus.py [--docs N] [--verify]
Knobs:  RAY_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

LINES_PER_DOC = 8
BOILER_POOL = 100  # distinct boilerplate lines
BOILER_PCT = 30  # % of lines drawn from the pool


def synth_corpus(out_dir: Path, n_docs: int, *, files: int = 32) -> None:
    """Deterministic corpus: docs of LINES_PER_DOC lines, ~30% drawn from a
    100-line boilerplate pool (appears in ~every doc), rest unique."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if (out_dir / "_done").exists():
        return
    out_dir.mkdir(parents=True, exist_ok=True)
    pool = pa.array(
        [f"boilerplate line number {i} all rights reserved" for i in range(BOILER_POOL)]
    )
    per_file = n_docs // files

    def _mix(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        return x ^ (x >> np.uint64(33))

    for f in range(files):
        doc0 = f * per_file
        ids = np.arange(
            doc0 * LINES_PER_DOC, (doc0 + per_file) * LINES_PER_DOC, dtype=np.int64
        )
        h = _mix(ids)
        is_boiler = (h % np.uint64(100)) < BOILER_PCT
        boiler = pool.take(pa.array((h % np.uint64(BOILER_POOL)).astype(np.int64)))
        uid = pc.cast(pa.array(ids), pa.string())
        unique = pc.binary_join_element_wise(
            "unique content line ", uid, " with some trailing words", ""
        )
        lines = pc.if_else(pa.array(is_boiler), boiler, unique)
        offsets = np.arange(0, (per_file + 1) * LINES_PER_DOC, LINES_PER_DOC)
        lst = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), lines
        )
        text = pc.binary_join(lst, "\n")
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(doc0, doc0 + per_file, dtype=np.int64)
                ),
                "text": text,
            }
        )
        pq.write_table(t, out_dir / f"part-{f:04d}.parquet")
    (out_dir / "_done").touch()


def verify(corpus: Path) -> None:
    import duckdb
    import pandas as pd

    from airbyte_destination_ray.pipelines.corpus import (
        dedup_segments_first,
        remove_frequent_segments,
    )
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{corpus}/part-*.parquet')"
    )
    nl = "chr(10)"
    common = f"""
        WITH segs AS (
            SELECT doc_id, unnest(string_split(text, {nl})) AS seg,
                   generate_subscripts(string_split(text, {nl}), 1) AS idx
            FROM documents)
    """
    oracles = {
        "remove": common
        + f"""
        , freq AS (SELECT seg, count(DISTINCT doc_id) df FROM segs GROUP BY seg),
        kept AS (SELECT s.doc_id, s.seg, s.idx FROM segs s
                 JOIN freq f USING (seg) WHERE f.df < 1000)
        SELECT d.doc_id, COALESCE(k.t2, '') AS text FROM documents d
        LEFT JOIN (SELECT doc_id, string_agg(seg, {nl} ORDER BY idx) t2
                   FROM kept GROUP BY doc_id) k USING (doc_id)
        """,
        "first": common
        + f"""
        , w AS (SELECT doc_id, idx, seg, row_number() OVER (
                    PARTITION BY seg ORDER BY doc_id, idx) rn FROM segs)
        SELECT d.doc_id, COALESCE(k.t2, '') AS text FROM documents d
        LEFT JOIN (SELECT doc_id, string_agg(seg, {nl} ORDER BY idx) t2
                   FROM w WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)
        """,
    }
    ds = read_parquet_sized(sorted(str(f) for f in corpus.glob("part-*.parquet")))
    outs = {
        "remove": remove_frequent_segments(ds, min_df=1000, num_partitions=32),
        "first": dedup_segments_first(ds, num_partitions=32),
    }
    for name, out in outs.items():
        got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = con.execute(oracles[name]).df().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        print(f"verify {name}: OK ({len(got)} docs)", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--verify-docs", type=int, default=50_000)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )

    base = Path("/dev/shm/adr_corpus_bench")
    if args.verify:
        vc = base / f"verify_{args.verify_docs}"
        synth_corpus(vc, args.verify_docs, files=8)
        verify(vc)

    corpus = base / f"docs_{args.docs}"
    synth_corpus(corpus, args.docs)

    from airbyte_destination_ray.pipelines.corpus import (
        dedup_segments_first,
        remove_frequent_segments,
        top_terms,
    )
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    total_bytes = sum(
        p.stat().st_size for p in corpus.glob("part-*.parquet")
    )
    timings = {}
    for name, make in {
        "remove_frequent_segments": lambda ds: remove_frequent_segments(
            ds, min_df=args.docs // 100, num_partitions=128
        ),
        "dedup_segments_first": lambda ds: dedup_segments_first(
            ds, num_partitions=128
        ),
        "top_terms": lambda ds: top_terms(ds, k=50, num_partitions=64),
    }.items():
        ds = read_parquet_sized(sorted(str(f) for f in corpus.glob("part-*.parquet")))
        t0 = time.perf_counter()
        n = 0
        for b in make(ds).iter_batches(batch_format="pyarrow"):
            n += b.num_rows
        timings[name] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows_out": n,
        }
    print(
        json.dumps(
            {
                "metric": "corpus_segment_ops",
                "docs": args.docs,
                "lines_per_doc": LINES_PER_DOC,
                "parquet_bytes": total_bytes,
                "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                "timings": timings,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
