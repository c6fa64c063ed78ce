"""Property tests for the session-E kernels: hypothesis-generated inputs
against SQL/brute-force references — randomized batch layouts, ties,
nulls, degenerate groups."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),  # key (nullable)
        st.one_of(
            st.none(),
            st.floats(
                min_value=-40.0,
                max_value=40.0,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
    ),
    min_size=1,
    max_size=40,
)


def _tbl(rows):
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], type=pa.int64()),
            "seq": pa.array(range(len(rows)), type=pa.int64()),
            "v": pa.array([r[1] for r in rows], type=pa.float64()),
        }
    )


def _ds(tbl, blocks=3):
    return ray.data.from_arrow(tbl).repartition(blocks)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_rows)
def test_minmax_scale_property(rows):
    from airbyte_destination_ray.pipelines.ops import minmax_scale_by_key

    tbl = _tbl(rows)
    got = minmax_scale_by_key(
        _ds(tbl), key="k", seq="seq", value_col="v"
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(
        """
        WITH b AS (SELECT seq, k, CAST(floor(v*100.0) AS BIGINT) c
                   FROM t WHERE k IS NOT NULL),
        m AS (SELECT k, min(c) mn, max(c) mx FROM b
              WHERE c IS NOT NULL GROUP BY 1)
        SELECT b.seq, b.k,
               CASE WHEN b.c IS NOT NULL AND m.mx > m.mn
                    THEN CAST(b.c - m.mn AS DOUBLE)
                         / CAST(m.mx - m.mn AS DOUBLE) END scaled
        FROM b LEFT JOIN m USING (k) ORDER BY seq
        """
    ).df().reset_index(drop=True)
    if len(exp) == 0:
        # an empty Ray result loses its schema — emptiness is the check
        assert len(got) == 0
        return
    got = got.sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["seq", "k", "scaled"]], exp, check_dtype=False
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_rows)
def test_gini_property(rows):
    from airbyte_destination_ray.pipelines.ops import gini_by_key

    tbl = _tbl(rows)
    got = gini_by_key(
        _ds(tbl), key="k", seq="seq", value_col="v"
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.sql(
        """
        WITH b AS (SELECT k, seq, CAST(floor(v*100.0) AS BIGINT) c
                   FROM t WHERE k IS NOT NULL),
        p AS (SELECT * FROM b WHERE c > 0),
        r AS (SELECT k, c, row_number() OVER (
                  PARTITION BY k ORDER BY c, seq) rn FROM p),
        s AS (SELECT k, count(*) n, sum(c) sx, sum(rn*c) srx
              FROM r GROUP BY 1)
        SELECT k, CAST(n AS BIGINT) n_values,
               CASE WHEN n > 1 AND sx > 0
                    THEN CAST(2*srx - (n+1)*sx AS DOUBLE)
                         / (CAST(n AS DOUBLE)*CAST(sx AS DOUBLE)) END gini
        FROM s ORDER BY k
        """
    ).df().reset_index(drop=True)
    if len(exp) == 0:
        assert len(got) == 0
        return
    got = got.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-20.0,
                    max_value=20.0,
                    allow_nan=False,
                    allow_infinity=False,
                ),
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ks_and_mannwhitney_property(rows):
    from airbyte_destination_ray.pipelines.ops import (
        ks_two_sample,
        mannwhitney_two_sample,
    )

    tbl = pa.table(
        {
            "grp": pa.array([r[0] for r in rows]),
            "v": pa.array([r[1] for r in rows], type=pa.float64()),
        }
    )
    cents = np.array(
        [int(np.floor(r[1] * 100.0)) for r in rows if r[1] is not None],
        dtype=np.int64,
    )
    grp = np.array(
        [r[0] for r in rows if r[1] is not None], dtype=bool
    )
    ca, cb = np.sort(cents[grp]), np.sort(cents[~grp])
    got_ks = ks_two_sample(
        _ds(tbl), value_col="v", group_mask_col="grp"
    ).to_pandas()
    got_mw = mannwhitney_two_sample(
        _ds(tbl), value_col="v", group_mask_col="grp"
    ).to_pandas()
    if len(ca) == 0 or len(cb) == 0:
        # one-sided or fully-filtered input: the statistic is undefined —
        # either no row at all (nothing reached the final) or null ks/auc
        assert len(got_ks) == 0 or got_ks["ks"].isna().all()
        assert len(got_mw) == 0 or got_mw["auc"].isna().all()
        return
    xs = np.unique(np.concatenate([ca, cb]))
    f1 = np.searchsorted(ca, xs, side="right") / len(ca)
    f2 = np.searchsorted(cb, xs, side="right") / len(cb)
    assert abs(got_ks["ks"].iloc[0] - np.abs(f1 - f2).max()) < 1e-12
    lt = np.searchsorted(cb, ca, side="left")
    eq = np.searchsorted(cb, ca, side="right") - lt
    u = lt.sum() + 0.5 * eq.sum()
    assert got_mw["u2"].iloc[0] == int(2 * u)
