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


# ---------------------------------------------------------------------------
# run_incremental_sessions (streaming sessionization with cross-epoch state)
# ---------------------------------------------------------------------------


def _sessions_state(lake, table="sessions"):
    from airbyte_destination_ray.pipelines.cdc import read_table

    t = pa.concat_tables(
        list(read_table(lake, table).iter_batches(batch_format="pyarrow"))
    )
    return t.sort_by([("k", "ascending"), ("session_id", "ascending")])


def _session_binlog(tmp_path, name, rows):
    d = tmp_path / name
    write_custom_binlog(d, rows)
    return str(d)


def test_incremental_sessions_match_batch_oracle(tmp_path, ray_session):
    """3-epoch incremental fold == one-shot batch sessionize (the SQL
    oracle), == the same stream in a single epoch; replay is a no-op.
    Covers sessions spanning epoch boundaries, keys idle for a whole
    epoch, and single-event sessions."""
    from airbyte_destination_ray.pipelines.aggview import (
        run_incremental_sessions,
    )

    rng = np.random.default_rng(7)
    n = 2000
    ts = np.cumsum(rng.integers(0, 20 * 60 * 1_000_000, n))
    keys = rng.integers(0, 30, n)
    rows = [
        dict(seq=int(i), epoch=int(i * 3 // n), op="U", url=f"u{keys[i]}",
             warc_ts=int(ts[i]), text="t", lang="en")
        for i in range(n)
    ]
    b3 = _session_binlog(tmp_path, "b3", rows)
    b1 = _session_binlog(tmp_path, "b1", [dict(r, epoch=0) for r in rows])
    l3, l1 = str(tmp_path / "l3"), str(tmp_path / "l1")
    run_incremental_sessions(l3, b3, gap_minutes=30, num_partitions=4)
    run_incremental_sessions(l1, b1, gap_minutes=30, num_partitions=4)
    got = _sessions_state(l3)
    assert got.equals(_sessions_state(l1))

    t = pa.table(
        {
            "u": pa.array([r["url"] for r in rows]),
            "ts": pa.array([r["warc_ts"] for r in rows], type=pa.int64()),
            "s": pa.array([r["seq"] for r in rows], type=pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("t", t)
    oracle = con.sql(
        """
        WITH x AS (SELECT u, ts, s, lag(ts) OVER (
                       PARTITION BY u ORDER BY ts, s) prev FROM t),
        y AS (SELECT u, ts, CAST(sum(CASE WHEN prev IS NULL
                  OR ts - prev > 1800000000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY u ORDER BY ts, s
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) sid FROM x)
        SELECT u AS k, sid AS session_id, min(ts) AS session_start,
               max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events
        FROM y GROUP BY u, sid ORDER BY k, session_id
        """
    ).arrow()
    assert got.equals(oracle.cast(got.schema))
    # replay: no-op
    run_incremental_sessions(l3, b3, gap_minutes=30, num_partitions=4)
    assert _sessions_state(l3).equals(got)


def test_incremental_sessions_boundary_cases(tmp_path, ray_session):
    """A session spanning the epoch boundary exactly at the gap limit
    (gap == limit continues; gap > limit splits), and a key absent from a
    later epoch keeps its session unchanged."""
    from airbyte_destination_ray.pipelines.aggview import (
        run_incremental_sessions,
    )

    G = 30 * 60 * 1_000_000
    rows = [
        dict(seq=1, epoch=0, op="U", url="a", warc_ts=0, text="t", lang="en"),
        dict(seq=2, epoch=0, op="U", url="b", warc_ts=0, text="t", lang="en"),
        # epoch 1: 'a' continues exactly AT the gap (ts - prev == G -> same
        # session), then splits at G+1; 'b' idle
        dict(seq=3, epoch=1, op="U", url="a", warc_ts=G, text="t", lang="en"),
        dict(seq=4, epoch=1, op="U", url="a", warc_ts=2 * G + 1, text="t",
             lang="en"),
    ]
    b = _session_binlog(tmp_path, "b", rows)
    lake = str(tmp_path / "lake")
    run_incremental_sessions(lake, b, gap_minutes=30, num_partitions=2)
    st = _sessions_state(lake)
    recs = st.to_pylist()
    a = [r for r in recs if r["k"] == "a"]
    b_rows = [r for r in recs if r["k"] == "b"]
    assert [(r["session_id"], r["session_start"], r["session_end"],
             r["n_events"]) for r in a] == [(1, 0, G, 2), (2, 2 * G + 1, 2 * G + 1, 1)]
    assert [(r["session_id"], r["n_events"]) for r in b_rows] == [(1, 1)]


def test_state_agg_retracts_per_epoch_and_resumes(tmp_path, ray_session):
    """Retractable state aggregate: after EVERY epoch the maintained
    view equals the one-shot GROUP BY over the row table's as-of LWW
    snapshot (updates retract old contributions; deletes subtract), and
    a re-run is a committed no-op."""
    from airbyte_destination_ray.pipelines.aggview import (
        run_incremental_state_agg,
    )
    from airbyte_destination_ray.pipelines.cdc import (
        read_table_arrow,
        run_cdc_sync,
    )
    from airbyte_destination_ray.sources.synth import write_custom_binlog

    rng = np.random.default_rng(5)
    rows = []
    for i in range(900):
        op = "D" if rng.random() < 0.12 else "U"
        rows.append(
            dict(
                seq=i,
                epoch=int(i * 3 // 900),
                op=op,
                url=f"k{rng.integers(0, 60)}",   # pk: 60 keys -> updates
                warc_ts=1000 + i,                # ver strictly increasing
                text="x",
                lang=f"g{rng.integers(0, 5)}",   # the GROUP column
            )
        )
    blog = tmp_path / "blog"
    write_custom_binlog(blog, rows)
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, str(blog), num_partitions=4)

    def run(epochs=None):
        return run_incremental_state_agg(
            lake,
            row_table="pages",
            table="state_agg",
            group_col="lang",
            value_col="warc_ts",
            num_partitions=4,
            epochs=epochs,
        )

    for e in (0, 1, 2):
        run(epochs=[e])
        got = {
            (r["k"], r["n"], r["sum_cents"])
            for r in read_agg(lake, "state_agg").take_all()
        }
        snap = read_table_arrow(lake, "pages", as_of_epoch=e)
        con = duckdb.connect()
        con.register("snap", snap)
        exp = {
            tuple(r)
            for r in con.sql(
                """
                SELECT lang, CAST(count(*) AS BIGINT),
                       CAST(sum(epoch_us(warc_ts) * 100) AS BIGINT)
                FROM snap WHERE lang IS NOT NULL GROUP BY lang
                """
            ).fetchall()
        }
        assert got == exp, f"epoch {e}"

    # full re-run (all epochs committed) is a pure no-op
    summary = run()
    assert all(s["skipped"] for s in summary["epochs"])


def test_state_agg_int_group_column(tmp_path, ray_session):
    """Non-string group columns must survive the delta exchange (the
    empty-contribution path derives the key type from the batch schema
    instead of hardcoding string)."""
    from airbyte_destination_ray.pipelines.aggview import (
        read_agg,
        run_incremental_state_agg,
    )
    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.sources.synth import write_custom_binlog

    import json

    import pyarrow.parquet as pq

    blog = tmp_path / "blog"
    blog.mkdir()
    segs = []
    for e in range(3):
        lo, hi = e * 100, (e + 1) * 100
        t = pa.table({
            "seq": pa.array(range(lo, hi), pa.int64()),
            "epoch": pa.array([e] * 100, pa.int32()),
            "op": pa.array(["U"] * 100),
            "url": pa.array([f"k{i % 37}" for i in range(lo, hi)]),
            "warc_ts": pa.array([1000 + i for i in range(lo, hi)],
                                pa.int64()),
            "n_words": pa.array([i % 4 for i in range(lo, hi)],
                                pa.int64()),  # int64 group column
        })
        name = f"segment-e{e:05d}-0000.parquet"
        pq.write_table(t, blog / name)
        segs.append(name)
    (blog / "_binlog.json").write_text(
        json.dumps({"n_epochs": 3, "segments": segs})
    )
    lake = str(tmp_path / "lake")
    run_cdc_sync(
        lake, str(blog), num_partitions=4,
        payload_columns=["url", "warc_ts", "n_words"],
    )
    run_incremental_state_agg(
        lake, row_table="pages", table="sa_int",
        group_col="n_words", value_col="warc_ts", num_partitions=4,
    )
    got = {r["k"]: r["n"] for r in read_agg(lake, "sa_int").take_all()}
    # 37 live keys (LWW winners), grouped by winner id % 4
    import collections

    winners = {}
    for i in range(300):
        winners[f"k{i % 37}"] = i % 4
    exp = collections.Counter(winners.values())
    assert got == dict(exp)


def test_quantile_view_epoch_invariant_and_resumes(tmp_path, ray_session):
    """Maintained quantile digest: 3-epoch fold == 1-epoch fold == exact
    quantile_cont while uncompressed; replay is a committed no-op."""
    from airbyte_destination_ray.pipelines.aggview import (
        read_quantile_view,
        run_incremental_quantile_view,
    )
    from airbyte_destination_ray.sources.synth import write_custom_binlog

    rng = np.random.default_rng(9)
    rows = [
        dict(seq=i, epoch=int(i * 3 // 900), op="U",
             url=f"k{i % 50}", warc_ts=int(rng.integers(0, 100000)),
             text="t", lang=f"g{i % 4}")
        for i in range(900)
    ]
    b3, b1 = tmp_path / "b3", tmp_path / "b1"
    write_custom_binlog(b3, rows)
    write_custom_binlog(b1, [dict(r, epoch=0) for r in rows])

    def state(lake):
        return sorted(
            (r["k"], r["p50"], r["p90"])
            for r in read_quantile_view(
                lake, "qv", quantiles=(0.5, 0.9)
            ).take_all()
        )

    l3, l1 = str(tmp_path / "l3"), str(tmp_path / "l1")
    for lake, blog in ((l3, b3), (l1, b1)):
        run_incremental_quantile_view(
            lake, str(blog), table="qv", key="lang",
            value_col="warc_ts", delta=4096, num_partitions=3,
        )
    got = state(l3)
    assert got == state(l1)

    con = duckdb.connect()
    t = pa.table({
        "lang": pa.array([r["lang"] for r in rows]),
        # write_custom_binlog types warc_ts as timestamp[us]; the view
        # folds the int64 µs values
        "v": pa.array([r["warc_ts"] for r in rows], type=pa.float64()),
    })
    con.register("t", t)
    exp = sorted(
        tuple(r) for r in con.sql(
            "SELECT lang, quantile_cont(v, 0.5), quantile_cont(v, 0.9) "
            "FROM t GROUP BY lang"
        ).fetchall()
    )
    assert got == exp

    # replay: committed no-op
    s = run_incremental_quantile_view(
        l3, str(b3), table="qv", key="lang", value_col="warc_ts",
        delta=4096, num_partitions=3,
    )
    assert all(x["skipped"] for x in s["epochs"])
    assert state(l3) == got
