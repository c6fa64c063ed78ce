#!/usr/bin/env python
"""Scale-stress the session-E operator families on synthetic 100M-row
inputs (DuckDB-verified at small n first, same generator):

- gini_by_key: 100M rows over 1M keys — rank-weighted segmented sums.
- spearman_by_key: 100M rows over 1M keys — TWO segmented sorts + rank
  moments per partition group.
- ks_two_sample: 100M rows, ~6k distinct fixed-point values — the
  aggregate-sized ECDF final.
- moving_max_by_key (w=8): 100M rows over 1M keys — segment-guarded
  shift-and-maximum passes.
- first_digit_counts: 100M rows — the ≤9-row Benford exchange.

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

N = int(os.environ.get("GRAFT_EOPS_ROWS", 100_000_000))
VERIFY_N = 2_000_000
KEYS = 1_000_000

GOLD = np.uint64(0x9E3779B97F4A7C15)


def _vals_batch(batch: pa.Table) -> pa.Table:
    i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
    h = i * GOLD
    k = ((h >> np.uint64(5)) % np.uint64(KEYS)).astype(np.int64)
    v = ((h >> np.uint64(11)).astype(np.float64) / 2**53) * 60.0 - 10.0
    grp = (i & np.uint64(1)) == 0
    ts = (h >> np.uint64(23)).astype(np.int64) % 10_000_000
    return pa.table(
        {
            "seq": pa.array(i.astype(np.int64)),
            "k": pa.array(k),
            "v": pa.array(v),
            "grp": pa.array(grp),
            "ts": pa.array(ts),
        }
    )


def synth(n: int):
    return ray.data.range(n).map_batches(
        _vals_batch, batch_format="pyarrow", batch_size=None
    )


def verify_small():
    import duckdb

    from airbyte_destination_ray.pipelines.ops import (
        first_digit_counts,
        gini_by_key,
        ks_two_sample,
        spearman_by_key,
    )

    ds = synth(VERIFY_N)
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    con = duckdb.connect()
    con.register("t", t)

    # KS — exact scalar check
    ks = ks_two_sample(ds, value_col="v", group_mask_col="grp").to_pandas()
    exp = con.execute(
        """
        WITH v AS (SELECT CAST(floor(v*100.0) AS BIGINT) c, grp FROM t),
        d AS (SELECT c, sum(CASE WHEN grp THEN 1 ELSE 0 END) a,
                     sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) b
              FROM v GROUP BY 1),
        cum AS (SELECT c, sum(a) OVER (ORDER BY c) ca,
                       sum(b) OVER (ORDER BY c) cb FROM d),
        tot AS (SELECT sum(a) na, sum(b) nb FROM d)
        SELECT CAST(max(abs(nb*ca - na*cb)) AS BIGINT) FROM cum, tot
        """
    ).fetchone()[0]
    assert int(ks["d_num"].iloc[0]) == int(exp), (ks, exp)

    # Gini — sample 5 keys exactly
    g = (
        gini_by_key(ds, key="k", seq="seq", value_col="v")
        .to_pandas()
        .set_index("k")
    )
    expg = con.execute(
        """
        WITH b AS (SELECT k, seq, CAST(floor(v*100.0) AS BIGINT) c FROM t),
        p AS (SELECT * FROM b WHERE c > 0),
        r AS (SELECT k, c, row_number() OVER (
                  PARTITION BY k ORDER BY c, seq) rn FROM p),
        s AS (SELECT k, count(*) n, sum(c) sx, sum(rn*c) srx
              FROM r GROUP BY 1)
        SELECT k, CAST(2*srx - (n+1)*sx AS DOUBLE)
               / (CAST(n AS DOUBLE)*CAST(sx AS DOUBLE)) gini
        FROM s WHERE k < 50 AND n > 1 AND sx > 0 ORDER BY k
        """
    ).df()
    for _, row in expg.iterrows():
        assert g.loc[int(row["k"]), "gini"] == row["gini"]

    # Spearman — sample 5 keys exactly
    sp = (
        spearman_by_key(ds, key="k", x_col="v", y_col="ts", seq="seq")
        .to_pandas()
        .set_index("k")
    )
    exps = con.execute(
        """
        WITH r AS (SELECT k,
               row_number() OVER (PARTITION BY k ORDER BY v, seq) x,
               row_number() OVER (PARTITION BY k ORDER BY ts, seq) y
            FROM t),
        s AS (SELECT k, count(*) n, sum(x) sx, sum(y) sy,
                     sum(x*x) sxx, sum(y*y) syy, sum(x*y) sxy
              FROM r GROUP BY 1)
        SELECT k, (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) rho
        FROM s
        WHERE k < 50
          AND CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0
          AND CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) > 0
        ORDER BY k
        """
    ).df()
    for _, row in exps.iterrows():
        assert sp.loc[int(row["k"]), "spearman"] == row["rho"]

    # Benford — full table check
    fd = (
        first_digit_counts(ds, value_col="v")
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    expd = con.execute(
        """
        WITH u AS (SELECT CAST(floor(abs(v)*100.0) AS BIGINT) x FROM t),
        f AS (SELECT CAST(substr(CAST(x AS VARCHAR),1,1) AS BIGINT) digit
              FROM u WHERE x > 0)
        SELECT digit, CAST(count(*) AS BIGINT) n FROM f
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert fd["n"].tolist() == expd["n"].tolist()
    print(json.dumps({"stage": "verify", "rows": VERIFY_N, "ok": True}))


def timed(stage: str, fn) -> None:
    t0 = time.monotonic()
    out = fn()
    wall = round(time.monotonic() - t0, 2)
    print(
        json.dumps(
            {
                "stage": stage,
                "rows": N,
                "wall_sec": wall,
                "rows_per_sec": round(N / wall),
                "out": out,
            }
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
        first_digit_counts,
        gini_by_key,
        ks_two_sample,
        spearman_by_key,
    )
    from airbyte_destination_ray.pipelines.relational import moving_max_by_key

    timed(
        "ks_two_sample",
        lambda: ks_two_sample(
            synth(N), value_col="v", group_mask_col="grp"
        ).to_pandas()["ks"].round(6).tolist(),
    )
    timed(
        "first_digit_counts",
        lambda: int(
            first_digit_counts(synth(N), value_col="v").to_pandas()["n"].sum()
        ),
    )
    timed(
        "gini_by_key",
        lambda: int(
            gini_by_key(synth(N), key="k", seq="seq", value_col="v").count()
        ),
    )
    timed(
        "spearman_by_key",
        lambda: int(
            spearman_by_key(
                synth(N), key="k", x_col="v", y_col="ts", seq="seq"
            ).count()
        ),
    )
    timed(
        "moving_max_w8",
        lambda: int(
            moving_max_by_key(
                synth(N), key="k", ts_col="ts", seq="seq", value_col="v",
                window_rows=8,
            ).count()
        ),
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
