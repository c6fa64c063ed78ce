#!/usr/bin/env python
"""Scale-stress the incrementally-maintained inverted index: a 2M-event /
1M-key / 3-epoch synthetic page binlog syncs into a lake, the index
advances ONE epoch at a time from the change feed, and a probe lookup
resolves against the bucket-pruned posting deltas.  Each stage prints one
JSON line; results recorded in BASELINE.md."""

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

import ray

N_EVENTS = int(os.environ.get("GRAFT_IDX_EVENTS", 2_000_000))
N_KEYS = int(os.environ.get("GRAFT_IDX_KEYS", 1_000_000))
BASE = Path(os.environ.get("GRAFT_IDX_TMP", "/tmp/adr_idx_bench"))


def main() -> int:
    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        lookup_term_docs,
        probed_files,
        sync_text_index,
    )
    from airbyte_destination_ray.sources.synth import ensure_binlog

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    binlog = BASE / "binlog"
    lake = BASE / "lake"
    idx = BASE / "index"
    shutil.rmtree(lake, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)
    ensure_binlog(
        binlog, n_events=N_EVENTS, n_keys=N_KEYS, n_epochs=3, seed=7
    )

    t0 = time.monotonic()
    run_cdc_sync(str(lake), str(binlog), num_partitions=64)
    sync_wall = round(time.monotonic() - t0, 2)
    print(
        json.dumps(
            {"stage": "lake_sync", "events": N_EVENTS, "wall_sec": sync_wall}
        )
    )

    for epoch in range(3):
        t0 = time.monotonic()
        stats = sync_text_index(
            str(lake), "pages", idx, upto_epoch=epoch, num_buckets=64
        )
        wall = round(time.monotonic() - t0, 2)
        postings = stats.get(str(epoch), 0)
        print(
            json.dumps(
                {
                    "stage": f"index_epoch_{epoch}",
                    "wall_sec": wall,
                    "postings": postings,
                    "postings_per_sec": (
                        round(postings / wall) if wall > 0 else None
                    ),
                }
            )
        )

    probes = ["extracted", "text", "of"]
    t0 = time.monotonic()
    n = lookup_term_docs(idx, probes).count()
    wall = round(time.monotonic() - t0, 2)
    files = probed_files(idx, probes)
    total_files = sum(
        1 for _ in idx.glob("bucket=*/epoch-*.parquet")
    )
    print(
        json.dumps(
            {
                "stage": "lookup",
                "terms": probes,
                "rows": n,
                "wall_sec": wall,
                "files_read": len(files),
                "files_total": total_files,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
