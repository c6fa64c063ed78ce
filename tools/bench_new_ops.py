#!/usr/bin/env python
"""Scale-stress the session-7 operator families on synthetic 100M-row
inputs (DuckDB-verified at small n first, same generator):

- heavy_hitters: 100M rows, ~1M distinct long-tail values + planted
  hitters — the bounded-memory two-pass design at 4 orders of magnitude
  more distincts than the sketch capacity.
- exact_quantile_disc: 100M doubles — iterative histogram selection, the
  whole corpus never collected.
- windowed_counts_late: 100M events in scrambled arrival order — the
  two-phase distributed prefix max.
- fuzzy_pairs: 200k distinct terms (deletion-neighborhood blocking; an
  all-pairs join would be 2·10^10 comparisons).

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

N = int(os.environ.get("GRAFT_NEWOPS_ROWS", 100_000_000))
VERIFY_N = 2_000_000

GOLD = np.uint64(0x9E3779B97F4A7C15)


def _vals_batch(batch: pa.Table) -> pa.Table:
    """Deterministic synthetic column set from the row id: a long-tail
    value column with planted heavy hitters, a double column, and a
    scrambled-arrival event stream."""
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = i * GOLD
    # ~2% of rows hit one of 8 planted hitters; the rest spread over ~1M
    hot = (h >> np.uint64(8)) % np.uint64(50) == 0
    v = np.where(
        hot,
        (h >> np.uint64(16)) % np.uint64(8),
        np.uint64(1000) + (h >> np.uint64(20)) % np.uint64(1_000_000),
    ).astype(np.int64)
    dbl = ((h >> np.uint64(11)).astype(np.float64) / 2**53) * 1000.0 - 500.0
    arrival = (i * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    ts = (i.astype(np.int64) * 1000) + (
        (h % np.uint64(7_000_000)).astype(np.int64) - 3_500_000
    )
    return pa.table(
        {
            "id": pa.array(i.astype(np.int64)),
            "v": pa.array(v),
            "x": pa.array(dbl),
            "arrival": pa.array(arrival.astype(np.int64)),
            "ts_us": pa.array(ts),
        }
    )


def synth(n: int):
    return ray.data.range(n).map_batches(
        _vals_batch, batch_format="pyarrow", batch_size=None
    )


def verify_small():
    import duckdb

    from airbyte_destination_ray.pipelines.ops import (
        exact_quantile_disc,
        heavy_hitters,
    )

    ds = synth(VERIFY_N)
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    con = duckdb.connect()
    con.register("t", t)

    hh = (
        heavy_hitters(ds, col="v", phi_num=1, phi_den=1000)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    exp = con.execute(
        """
        SELECT v, CAST(count(*) AS BIGINT) AS n FROM t
        GROUP BY v HAVING count(*) * 1000 > (SELECT count(*) FROM t)
        ORDER BY v
        """
    ).df()
    assert hh["v"].tolist() == exp["v"].tolist(), "heavy_hitters mismatch"
    assert hh["n"].tolist() == exp["n"].tolist()

    med = exact_quantile_disc(ds, value_col="x", q=0.5)
    exp_med = con.execute("SELECT quantile_disc(x, 0.5) FROM t").fetchone()[0]
    assert med == exp_med, (med, exp_med)
    print(
        json.dumps(
            {"stage": "verify", "rows": VERIFY_N, "hitters": len(hh), "ok": True}
        )
    )


def main() -> int:
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
        log_to_driver=False,
    )
    verify_small()

    from airbyte_destination_ray.pipelines.ops import (
        exact_quantile_disc,
        heavy_hitters,
    )
    from airbyte_destination_ray.pipelines.relational import (
        windowed_counts_late,
    )

    ds = synth(N)

    t0 = time.perf_counter()
    hh = heavy_hitters(ds, col="v", phi_num=1, phi_den=1000).to_pandas()
    t_hh = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "heavy_hitters",
                "rows": N,
                "hitters": len(hh),
                "sec": round(t_hh, 2),
                "rows_per_sec": round(N / t_hh, 0),
            }
        )
    )

    t0 = time.perf_counter()
    med = exact_quantile_disc(ds, value_col="x", q=0.5)
    t_q = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "exact_quantile_disc",
                "rows": N,
                "median": med,
                "sec": round(t_q, 2),
                "rows_per_sec": round(N / t_q, 0),
            }
        )
    )

    def ts_col(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "arrival": batch.column("arrival"),
                "ts": batch.column("ts_us").cast(pa.timestamp("us")),
            }
        )

    late_in = ds.map_batches(ts_col, batch_format="pyarrow", batch_size=None)
    t0 = time.perf_counter()
    late = windowed_counts_late(
        late_in,
        ts_col="ts",
        seq="arrival",
        window="hour",
        lateness_us=3_600_000_000,
        span=1 << 22,
    ).to_pandas()
    t_l = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "windowed_counts_late",
                "rows": N,
                "windows": len(late),
                "late_rows": int(late["n_late"].sum()),
                "sec": round(t_l, 2),
                "rows_per_sec": round(N / t_l, 0),
            }
        )
    )

    # fuzzy matching over a 200k-term vocabulary
    from airbyte_destination_ray.pipelines.linkage import fuzzy_pairs

    from airbyte_destination_ray.pipelines.ops import budget_sample_by_key
    from airbyte_destination_ray.pipelines.relational import global_rank

    # exact global ROW_NUMBER over 100M doubles: range-histogram offsets
    # (one pruned pass) + one keyed exchange with per-bin local sorts
    t0 = time.perf_counter()
    n_ranked = global_rank(
        ds, by="x", tie_break="arrival", bin_width=1.0
    ).count()
    t_r = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "global_rank",
                "rows": N,
                "ranked": int(n_ranked),
                "sec": round(t_r, 2),
                "rows_per_sec": round(N / t_r, 0),
            }
        )
    )

    # token-budget mixture packing: 20 sources, winner set bounded by the
    # budgets (~2.4M ids) — pruned keyed exchange + broadcast filter
    def mix_cols(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        a = batch.column("arrival").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array((v % 20).astype(np.int64)),
                "id": batch.column("id"),
                "units": pa.array((a % 500 + 1).astype(np.int64)),
            }
        )

    mix = ds.map_batches(mix_cols, batch_format="pyarrow", batch_size=None)
    budgets = {k: 50_000_000 for k in range(10)}
    t0 = time.perf_counter()
    n_kept = budget_sample_by_key(
        mix, key="src", id_col="id", units_col="units",
        budgets=budgets, default_budget=10_000_000,
    ).count()
    t_b = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "budget_sample",
                "rows": N,
                "kept": int(n_kept),
                "sec": round(t_b, 2),
                "rows_per_sec": round(N / t_b, 0),
            }
        )
    )

    def words_batch(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = i * GOLD
        # 8-char base-26 words over a constrained alphabet → real collisions
        chars = []
        x = h
        for _ in range(8):
            chars.append((x % np.uint64(6)).astype(np.uint8) + ord("a"))
            x = x >> np.uint64(5)
        mat = np.stack(chars, axis=1)
        n = len(i)
        offs = np.arange(n + 1, dtype=np.int32) * 8
        arr = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(mat).tobytes())],
        )
        return pa.table({"w": arr.cast(pa.string())})

    vocab = ray.data.range(200_000).map_batches(
        words_batch, batch_format="pyarrow", batch_size=None
    )
    t0 = time.perf_counter()
    np_pairs = fuzzy_pairs(vocab, word_col="w", max_dist=1).count()
    t_f = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "stage": "fuzzy_pairs_d1",
                "terms": 200_000,
                "pairs": int(np_pairs),
                "sec": round(t_f, 2),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
