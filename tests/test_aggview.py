"""Incremental aggregate view (pipelines/aggview.py): epoch folding,
replay idempotence, resume, epoch-split invariance vs one-shot SQL."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from airbyte_destination_ray.pipelines.aggview import (
    read_agg,
    run_incremental_agg,
)
from airbyte_destination_ray.sources.synth import write_custom_binlog


def _mk_binlog(d, n=600, keys=40, epochs=3, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        dict(
            seq=i,
            epoch=int(i * epochs // n),
            op="U",
            url=f"k{rng.integers(0, keys)}",
            warc_ts=int(rng.integers(0, 1000)),
            text="t",
            lang="en",
        )
        for i in range(n)
    ]
    write_custom_binlog(d, rows)
    return rows


def _state(lake, table="agg"):
    t = pa.concat_tables(
        list(read_agg(lake, table).iter_batches(batch_format="pyarrow"))
    )
    return t.sort_by("k")


def test_incremental_agg_matches_one_shot_and_replays(tmp_path, ray_session):
    blog = tmp_path / "blog"
    rows = _mk_binlog(blog)
    lake = str(tmp_path / "lake")
    run_incremental_agg(lake, str(blog), num_partitions=4)
    got = _state(lake)
    con = duckdb.connect()
    t = pa.table(
        {
            "k": pa.array([r["url"] for r in rows]),
            "v": pa.array([r["warc_ts"] for r in rows], type=pa.int64()),
        }
    )
    con.register("t", t)
    want = con.sql(
        """SELECT k, CAST(count(*) AS BIGINT) n,
               CAST(sum(CAST(floor(v * 100) AS BIGINT)) AS BIGINT) sum_cents
           FROM t GROUP BY k ORDER BY k"""
    ).arrow()
    assert got.equals(want.cast(got.schema))
    # replay: re-running the whole binlog is a no-op (manifests + checkpoint)
    run_incremental_agg(lake, str(blog), num_partitions=4)
    assert _state(lake).equals(got)
    # resume from a partial run equals the full run
    lake2 = str(tmp_path / "lake2")
    run_incremental_agg(lake2, str(blog), num_partitions=4, epochs=[0])
    run_incremental_agg(lake2, str(blog), num_partitions=4)
    assert _state(lake2).equals(got)


def test_incremental_agg_epoch_split_invariance(tmp_path, ray_session):
    """1-epoch and 3-epoch splits of the same events produce identical
    maintained state."""
    rng = np.random.default_rng(3)
    base = [
        dict(seq=i, epoch=0, op="U", url=f"k{rng.integers(0, 10)}",
             warc_ts=int(rng.integers(0, 100)), text="t", lang="en")
        for i in range(200)
    ]
    split = [dict(r, epoch=int(r["seq"] * 3 // 200)) for r in base]
    b1, b3 = tmp_path / "b1", tmp_path / "b3"
    write_custom_binlog(b1, base)
    write_custom_binlog(b3, split)
    l1, l3 = str(tmp_path / "l1"), str(tmp_path / "l3")
    run_incremental_agg(l1, str(b1), num_partitions=3)
    run_incremental_agg(l3, str(b3), num_partitions=3)
    assert _state(l1).equals(_state(l3))
