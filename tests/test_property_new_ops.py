"""Property tests for the session-7 kernels: hypothesis-generated inputs
against brute-force/SQL references — the randomized complement to the
fixed-seed oracle tests (batch layout, ties, nulls, empties)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_lev(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="abcXYZ01", max_size=12),
            st.text(alphabet="abcXYZ01", max_size=12),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_levenshtein_pairs_property(pairs):
    from airbyte_destination_ray.pipelines.linkage import levenshtein_pairs

    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    got = list(levenshtein_pairs(a, b))
    exp = [_py_lev(x.encode(), y.encode()) for x, y in pairs]
    assert got == exp


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    old_vals=st.lists(
        st.one_of(st.none(), st.integers(-3, 3)), min_size=0, max_size=12
    ),
    new_vals=st.lists(
        st.one_of(st.none(), st.integers(-3, 3)), min_size=0, max_size=12
    ),
)
def test_table_diff_property(ray_session, old_vals, new_vals):
    """Random snapshots (distinct keys per side, nullable values) vs the
    SQL FULL OUTER JOIN + IS DISTINCT FROM formulation."""
    import ray.data
    from airbyte_destination_ray.pipelines.relational import table_diff

    old = pa.table(
        {
            "k": pa.array(range(len(old_vals)), type=pa.int64()),
            "v": pa.array(old_vals, type=pa.int64()),
        }
    )
    # offset new keys so I/U/D all occur
    new = pa.table(
        {
            "k": pa.array(
                [i + len(new_vals) // 2 for i in range(len(new_vals))],
                type=pa.int64(),
            ),
            "v": pa.array(new_vals, type=pa.int64()),
        }
    )
    got = table_diff(
        ray.data.from_arrow(old).repartition(2),
        ray.data.from_arrow(new).repartition(3),
        key="k",
        compare_cols=["v"],
        num_partitions=4,
    ).to_pandas()
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    exp = con.execute(
        """
        SELECT COALESCE(o.k, n.k) AS k,
               CASE WHEN o.k IS NULL THEN 'I'
                    WHEN n.k IS NULL THEN 'D' ELSE 'U' END AS op,
               o.v AS v_old, n.v AS v_new
        FROM o FULL OUTER JOIN n ON o.k = n.k
        WHERE o.k IS NULL OR n.k IS NULL OR o.v IS DISTINCT FROM n.v
        """
    ).df()

    def norm(df):
        cols = sorted(df.columns)
        return (
            df.reindex(cols, axis=1)
            .sort_values(cols)
            .reset_index(drop=True)
        )

    if len(exp) == 0:
        # a zero-group Ray result has no blocks, hence no schema — rows
        # (the semantic content) must still agree
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(
            norm(got), norm(exp), check_dtype=False
        )


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_funnel_property_random_seeds(ray_session, seed):
    import datetime as dt

    import ray.data
    from airbyte_destination_ray.pipelines.relational import funnel_counts

    rng = np.random.default_rng(seed)
    n = 800
    base = int(dt.datetime(2024, 2, 1).timestamp() * 1_000_000)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(
                base + rng.integers(0, 1_000_000, n), type=pa.int64()
            ).cast(pa.timestamp("us")),  # heavy ts ties
            "user_id": pa.array(rng.integers(0, 25, n), type=pa.int64()),
            "event_type": pa.array(rng.choice(["a", "b", "c", "x"], n)),
        }
    )
    out = (
        funnel_counts(
            ray.data.from_arrow(t).repartition(4),
            key="user_id",
            ts_col="ts",
            seq="event_id",
            step_col="event_type",
            steps=["a", "b", "c"],
        )
        .to_pandas()
        .sort_values("level")
    )
    con = duckdb.connect()
    con.register("events", t)
    exp = con.execute(
        """
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id AS s,
                          event_type FROM events),
        l1 AS (SELECT user_id, t, s FROM e WHERE event_type = 'a'
               QUALIFY row_number() OVER (
                   PARTITION BY user_id ORDER BY t, s) = 1),
        l2 AS (SELECT e.user_id, e.t, e.s FROM e JOIN l1 USING (user_id)
               WHERE e.event_type = 'b'
                 AND (e.t > l1.t OR (e.t = l1.t AND e.s > l1.s))
               QUALIFY row_number() OVER (
                   PARTITION BY e.user_id ORDER BY e.t, e.s) = 1),
        l3 AS (SELECT e.user_id, e.t, e.s FROM e JOIN l2 USING (user_id)
               WHERE e.event_type = 'c'
                 AND (e.t > l2.t OR (e.t = l2.t AND e.s > l2.s))
               QUALIFY row_number() OVER (
                   PARTITION BY e.user_id ORDER BY e.t, e.s) = 1)
        SELECT (SELECT count(*) FROM l1) AS n1,
               (SELECT count(*) FROM l2) AS n2,
               (SELECT count(*) FROM l3) AS n3
        """
    ).fetchone()
    assert list(out["n_keys"]) == list(exp)


@pytest.mark.parametrize("seed", [1, 7])
def test_exact_quantile_disc_random(ray_session, seed):
    import duckdb

    from airbyte_destination_ray.pipelines.ops import exact_quantile_disc

    rng = np.random.default_rng(seed)
    # mix of scales + exact-tie plateau + negatives
    vals = np.concatenate(
        [
            rng.normal(-1e6, 10, 2000),
            np.full(1500, -17.0),
            rng.uniform(0, 1, 2000),
        ]
    )
    t = pa.table({"v": pa.array(vals, type=pa.float64())})
    con = duckdb.connect()
    con.register("t", t)
    import ray.data

    ds = ray.data.from_arrow(t).repartition(4)
    for q in (0.3, 0.5, 0.61):
        got = exact_quantile_disc(ds, value_col="v", q=q, collect_cap=256)
        exp = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t"
        ).fetchone()[0]
        assert got == exp


# ---------------------------------------------------------------------------
# round-3 ops: partial-update merge, running distinct, window join
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [5, 23, 77])
def test_lww_partial_merge_random_seeds(ray_session, seed):
    """Random patch streams (heavy null patterns, duplicate (ver,seq)-free)
    vs a sequential per-column replay reference, across batch layouts."""
    import ray.data

    from airbyte_destination_ray.pipelines.ops import lww_partial_merge

    rng = np.random.default_rng(seed)
    n = 1200
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 60, n), type=pa.int64()),
            "ver": pa.array(rng.integers(0, 40, n), type=pa.int64()),
            "seq": pa.array(rng.permutation(n), type=pa.int64()),
            "a": pa.array(
                [None if rng.random() < 0.6 else float(i) for i in range(n)]
            ),
            "b": pa.array(
                [None if rng.random() < 0.3 else f"s{rng.integers(0, 9)}"
                 for _ in range(n)]
            ),
        }
    )
    got = (
        lww_partial_merge(
            ray.data.from_arrow(t).repartition(int(rng.integers(2, 9))),
            pk="k", ver="ver", seq="seq", patch_cols=["a", "b"],
            num_partitions=int(rng.integers(2, 7)),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # sequential replay in (ver, seq) order
    rows = sorted(
        zip(*[t.column(c).to_pylist() for c in ("k", "ver", "seq", "a", "b")]),
        key=lambda r: (r[1], r[2]),
    )
    state: dict = {}
    for k, ver, seq, a, b in rows:
        cur = state.setdefault(k, {"a": None, "b": None})
        if a is not None:
            cur["a"] = a
        if b is not None:
            cur["b"] = b
        cur["ver"], cur["seq"] = ver, seq
    exp = pd.DataFrame(
        [
            {"k": k, "a": v["a"], "b": v["b"], "ver": v["ver"],
             "seq": v["seq"]}
            for k, v in sorted(state.items())
        ]
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)],
        check_dtype=False,
    )


@pytest.mark.parametrize("seed", [11, 42])
def test_window_join_random_seeds(ray_session, seed):
    import ray.data

    from airbyte_destination_ray.pipelines.relational import window_join

    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(50, 600)), int(rng.integers(50, 600))
    before, after = int(rng.integers(0, 40)), int(rng.integers(0, 40))
    left = pa.table(
        {
            "u": pa.array(rng.integers(0, 12, nl), type=pa.int64()),
            "lts": pa.array(rng.integers(0, 500, nl), type=pa.int64()),
            "lid": pa.array(np.arange(nl), type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "u": pa.array(rng.integers(0, 12, nr), type=pa.int64()),
            "rts": pa.array(rng.integers(0, 500, nr), type=pa.int64()),
            "rid": pa.array(np.arange(nr), type=pa.int64()),
        }
    )
    got = window_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(3),
        on="u", left_ts="lts", right_ts="rts",
        before_us=before, after_us=after, right_keep=["rid"],
        left_schema=left.schema, right_schema=right.schema,
        num_partitions=5,
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql(
        f"""SELECT l.u, l.lts, l.lid, r.rid AS rid_right
            FROM l JOIN r ON l.u = r.u
             AND r.rts BETWEEN l.lts - {before} AND l.lts + {after}"""
    ).df()
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        exp[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )
