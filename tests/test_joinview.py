"""Incrementally-maintained JOIN view (pipelines/joinview.py): final state
vs a one-shot DuckDB join, exactly-once replay, and epoch time travel."""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_FINAL_SQL = """
WITH f AS (SELECT event_id, ts, user_id, value FROM events
           WHERE event_type <> 'error' OR event_type IS NULL),
d AS (SELECT user_id, event_type AS last_event_type,
             CAST(floor(value*100) AS BIGINT) AS last_value_cents
      FROM events QUALIFY row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1)
SELECT f.event_id, f.ts, f.user_id, f.value,
       d.last_event_type, d.last_value_cents
FROM f LEFT JOIN d USING (user_id)
"""


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _build(tmp_path, n_epochs=3):
    from airbyte_destination_ray.pipelines.joinview import (
        build_fact_dim_binlogs,
        run_incremental_join_view,
    )

    build_fact_dim_binlogs(
        f"{SF}/events.parquet", tmp_path / "binlog", n_epochs=n_epochs
    )
    summary = run_incremental_join_view(
        str(tmp_path / "lake"),
        str(tmp_path / "binlog/fact"),
        str(tmp_path / "binlog/dim"),
        num_partitions=8,
    )
    return summary


def test_join_view_final_state_matches_sql(ray_session, tmp_path):
    from airbyte_destination_ray.pipelines.joinview import read_join_view

    _build(tmp_path)
    got = pd.DataFrame(read_join_view(str(tmp_path / "lake")).take_all())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.sql(_FINAL_SQL).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_join_view_replay_is_noop(ray_session, tmp_path):
    from airbyte_destination_ray.pipelines.joinview import (
        read_join_view,
        run_incremental_join_view,
    )

    _build(tmp_path)
    before = pd.DataFrame(read_join_view(str(tmp_path / "lake")).take_all())
    again = run_incremental_join_view(
        str(tmp_path / "lake"),
        str(tmp_path / "binlog/fact"),
        str(tmp_path / "binlog/dim"),
        num_partitions=8,
    )
    assert all(s.get("skipped") for s in again["epochs"])
    after = pd.DataFrame(read_join_view(str(tmp_path / "lake")).take_all())
    pd.testing.assert_frame_equal(_norm(before), _norm(after))


def test_join_view_time_travel_epoch0(ray_session, tmp_path):
    """View as of epoch 0 == the one-shot join over the epoch-0 binlog
    slice (epoch = (event_id * 3) // (max+1))."""
    from airbyte_destination_ray.pipelines.joinview import read_join_view

    _build(tmp_path)
    got = pd.DataFrame(
        read_join_view(str(tmp_path / "lake"), as_of_epoch=0).take_all()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW all_events AS SELECT * "
        f"FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.sql(
        """
        WITH lim AS (SELECT CAST(max(event_id)+1 AS BIGINT) AS upper
                     FROM all_events),
        events AS (SELECT all_events.* FROM all_events, lim
                   WHERE (event_id * 3) // upper = 0)
        """
        + _FINAL_SQL.replace("WITH ", ", ", 1)
    ).df()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


import pytest


@pytest.mark.parametrize("num_partitions", [4, 8])
def test_join_view_dim_update_rewrites_existing_facts(
    ray_session, tmp_path, num_partitions
):
    """The delta-join property: a later-epoch dim update must retroactively
    change the attrs of facts ingested in EARLIER epochs (partition-local
    re-join, no scatter).  num_partitions=8 splits users 7 and 8 into
    different partitions, so one partition holds live fact rows with an
    EMPTY dim state — the ADVICE r4 IndexError repro (_join_states must
    short-circuit, not index the empty dim key array)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from airbyte_destination_ray.pipelines.joinview import (
        read_join_view,
        run_incremental_join_view,
    )

    base = tmp_path
    for name, rows in (
        (
            "fact",
            [
                {"seq": 1, "epoch": 0, "op": "U", "event_id": 1,
                 "ts": 1000, "user_id": 7, "value": 1.0},
                {"seq": 2, "epoch": 1, "op": "U", "event_id": 2,
                 "ts": 2000, "user_id": 8, "value": 2.0},
            ],
        ),
        (
            "dim",
            [
                {"seq": 1, "epoch": 0, "op": "U", "user_id": 7,
                 "ver": 1, "last_event_type": "old",
                 "last_value_cents": 100},
                {"seq": 2, "epoch": 1, "op": "U", "user_id": 7,
                 "ver": 2, "last_event_type": "new",
                 "last_value_cents": 200},
            ],
        ),
    ):
        d = base / "binlog" / name
        d.mkdir(parents=True)
        t = pa.Table.from_pylist(rows)
        if name == "fact":
            t = t.set_column(
                t.schema.get_field_index("ts"), "ts",
                t.column("ts").cast(pa.timestamp("us")),
            )
        segs = []
        for e in (0, 1):
            import pyarrow.compute as pc

            fn = f"segment-e{e:05d}-0000.parquet"
            pq.write_table(
                t.filter(pc.equal(t.column("epoch"), e)), d / fn
            )
            segs.append(fn)
        (d / "_binlog.json").write_text(
            json.dumps({"n_epochs": 2, "segments": segs})
        )
    run_incremental_join_view(
        str(base / "lake"), str(base / "binlog/fact"),
        str(base / "binlog/dim"), num_partitions=num_partitions,
    )
    rows = {
        r["event_id"]: r
        for r in read_join_view(str(base / "lake")).take_all()
    }
    assert rows[1]["last_event_type"] == "new"  # retroactively updated
    assert rows[1]["last_value_cents"] == 200
    assert rows[2]["last_event_type"] is None  # user 8 never in dim
    e0 = {
        r["event_id"]: r
        for r in read_join_view(
            str(base / "lake"), as_of_epoch=0
        ).take_all()
    }
    assert e0[1]["last_event_type"] == "old"  # epoch-0 state preserved
