"""Web-corpus operators: per-domain/host analytics over URL columns.

The canonical Common-Crawl-shaped rollup: parse every page URL, group by
host, report pages (distinct URLs) and fetch/event counts per host.  At
100 TB the design constraints are:

- the URL string itself must NOT ride the exchange (pages average >70 B of
  URL; a 64-bit content hash is enough for a distinct count) — the shuffle
  carries ``(host, url_hash, n)`` pairs, pre-reduced per batch, so exchange
  volume is O(distinct (host, url) pairs per batch), not O(events);
- one hash exchange total, partitioned by host so the final per-host
  aggregate is partition-local (the same partition-key-reuse rule as the
  CDC merge).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import stable_hash_array
from ..functions.urls import parse_urls

__all__ = ["domain_stats"]


def domain_stats(ds, *, url_col: str = "url", num_partitions: int = 32):
    """Per-host page/event rollup: ``(host, domain, n_pages, n_events)``.

    ``n_pages`` is the exact count of distinct URLs per host (64-bit-hash
    identity — collision odds ~n²/2⁶⁵), ``n_events`` the total row count.
    Rows whose URL fails to parse group under a null host (SQL-compatible:
    they still count).
    """

    def partial(batch: pa.Table) -> pa.Table:
        parts = parse_urls(batch.column(url_col))
        uh = stable_hash_array(batch.column(url_col))
        t = pa.table(
            {
                "host": parts["host"],
                "domain": parts["domain"],
                "_uh": pa.array(uh, type=pa.uint64()),
            }
        )
        # pre-reduce: one row per (host, url) per batch, events counted
        g = t.group_by(["host", "_uh"], use_threads=False).aggregate(
            [([], "count_all"), ("domain", "min")]
        )
        hh = stable_hash_array(g.column("host"))
        part = (hh % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "host": g.column("host"),
                "domain": g.column("domain_min"),
                "_uh": g.column("_uh"),
                "n": g.column("count_all"),
                "_part": pa.array(part, type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        g = group.group_by("host", use_threads=False).aggregate(
            [("_uh", "count_distinct"), ("n", "sum"), ("domain", "min")]
        )
        return pa.table(
            {
                "host": g.column("host"),
                "domain": g.column("domain_min"),
                "n_pages": g.column("_uh_count_distinct").cast(pa.int64()),
                "n_events": g.column("n_sum").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )
