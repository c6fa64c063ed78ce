"""Unit tests for the session-E kernels: first_digit_counts (Benford),
minmax_scale_by_key, fk_violations — null/degenerate edge cases plus
batch-composition invariance against DuckDB references."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


@pytest.fixture(autouse=True)
def _ray(ray_session):
    yield


def _ds(tbl: pa.Table, blocks: int = 3):
    return ray.data.from_arrow(tbl).repartition(blocks)


def _sorted_df(obj, by):
    if isinstance(obj, ray.data.Dataset):
        obj = obj.to_pandas()
    return obj.sort_values(by).reset_index(drop=True)


# --- first_digit_counts -----------------------------------------------------


def test_first_digit_matches_sql():
    from airbyte_destination_ray.pipelines.ops import first_digit_counts

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [
            rng.uniform(0.005, 9.99, 200),  # small: digit from cents
            rng.uniform(10, 99999, 300),
            np.zeros(10),  # floor(0*100)=0 → excluded
        ]
    )
    tbl = pa.table({"v": pa.array(vals, type=pa.float64())})
    got = _sorted_df(
        first_digit_counts(_ds(tbl, 4), value_col="v"), ["digit"]
    )
    exp = (
        duckdb.sql(
            """
        WITH u AS (SELECT CAST(floor(abs(v) * 100.0) AS BIGINT) AS x
                   FROM tbl),
        f AS (SELECT CAST(substr(CAST(x AS VARCHAR), 1, 1) AS BIGINT)
                  AS digit FROM u WHERE x > 0),
        c AS (SELECT digit, count(*) AS n FROM f GROUP BY 1),
        t AS (SELECT sum(n) AS total FROM c)
        SELECT digit, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS frac
        FROM c, t ORDER BY digit
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_first_digit_nulls_and_batch_invariance():
    from airbyte_destination_ray.pipelines.ops import first_digit_counts

    tbl = pa.table(
        {"v": pa.array([None, 0.001, 1.0, 19.0, 190.5, None, 0.42, 903.0])}
    )
    a = _sorted_df(first_digit_counts(_ds(tbl, 1), value_col="v"), ["digit"])
    b = _sorted_df(first_digit_counts(_ds(tbl, 5), value_col="v"), ["digit"])
    pd.testing.assert_frame_equal(a, b)
    # 0.001 → floor(0.1)=0 excluded; digits: 1.0→1, 19.0→1, 190.5→1,
    # 0.42→4, 903.0→9
    assert dict(zip(a["digit"], a["n"])) == {1: 3, 4: 1, 9: 1}


# --- minmax_scale_by_key ----------------------------------------------------


def test_minmax_scale_matches_sql():
    from airbyte_destination_ray.pipelines.ops import minmax_scale_by_key

    rng = np.random.default_rng(5)
    n = 600
    keys = [["a", "b", "c", None][i] for i in rng.integers(0, 4, n)]
    vals = rng.uniform(-50, 50, n)
    null_mask = rng.random(n) < 0.1
    tbl = pa.table(
        {
            "k": pa.array(keys),
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(vals, type=pa.float64(), mask=null_mask),
        }
    )
    got = _sorted_df(
        minmax_scale_by_key(
            _ds(tbl, 4), key="k", seq="seq", value_col="v", out_col="scaled"
        ),
        ["seq"],
    )
    exp = (
        duckdb.sql(
            """
        WITH b AS (
            SELECT seq, k, CAST(floor(v * 100.0) AS BIGINT) AS c
            FROM tbl WHERE k IS NOT NULL),
        m AS (SELECT k, min(c) AS mn, max(c) AS mx
              FROM b WHERE c IS NOT NULL GROUP BY 1)
        SELECT b.seq, b.k,
               CASE WHEN b.c IS NOT NULL AND m.mx > m.mn
                    THEN CAST(b.c - m.mn AS DOUBLE)
                         / CAST(m.mx - m.mn AS DOUBLE)
               END AS scaled
        FROM b LEFT JOIN m USING (k) ORDER BY seq
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["seq", "k", "scaled"]], exp)


def test_minmax_scale_degenerate_key_yields_null():
    from airbyte_destination_ray.pipelines.ops import minmax_scale_by_key

    tbl = pa.table(
        {
            "k": pa.array(["x", "x", "y"]),
            "seq": pa.array([0, 1, 2], type=pa.int64()),
            "v": pa.array([3.0, 3.0, 7.0], type=pa.float64()),
        }
    )
    got = _sorted_df(
        minmax_scale_by_key(
            _ds(tbl, 1), key="k", seq="seq", value_col="v"
        ),
        ["seq"],
    )
    assert got["scaled"].isna().all()


# --- fk_violations ----------------------------------------------------------


def test_fk_violations_matches_not_exists():
    from airbyte_destination_ray.pipelines.relational import fk_violations

    rng = np.random.default_rng(3)
    n = 800
    fk = rng.integers(0, 120, n).astype(object)
    fk[rng.random(n) < 0.05] = None  # null FK = violation
    child = pa.table(
        {
            "fk": pa.array(list(fk), type=pa.int64()),
            "grp": pa.array(
                [["r", "s", "t"][i] for i in rng.integers(0, 3, n)]
            ),
        }
    )
    parent = pa.table(
        {"pk": pa.array(rng.choice(120, 60, replace=False), type=pa.int64())}
    )
    got = _sorted_df(
        fk_violations(
            _ds(child, 4),
            _ds(parent, 2),
            fk="fk",
            pk="pk",
            report_col="grp",
            child_schema=child.schema,
            parent_schema=parent.schema,
        ),
        ["grp"],
    )
    exp = (
        duckdb.sql(
            """
        SELECT grp, CAST(count(*) AS BIGINT) AS n_violations
        FROM child c
        WHERE NOT EXISTS (SELECT 1 FROM parent p WHERE p.pk = c.fk)
        GROUP BY 1 ORDER BY 1
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_fk_violations_empty_parent_counts_everything():
    from airbyte_destination_ray.pipelines.relational import fk_violations

    child = pa.table(
        {
            "fk": pa.array([1, 2, 3], type=pa.int64()),
            "grp": pa.array(["a", "a", "b"]),
        }
    )
    parent = pa.table({"pk": pa.array([], type=pa.int64())})
    got = _sorted_df(
        fk_violations(
            _ds(child, 1),
            _ds(parent, 1),
            fk="fk",
            pk="pk",
            report_col="grp",
            child_schema=child.schema,
            parent_schema=parent.schema,
        ),
        ["grp"],
    )
    assert dict(zip(got["grp"], got["n_violations"])) == {"a": 2, "b": 1}


def test_fk_violations_type_mismatch_raises():
    from airbyte_destination_ray.pipelines.relational import fk_violations

    child = pa.table(
        {"fk": pa.array([1], type=pa.int64()), "grp": pa.array(["a"])}
    )
    parent = pa.table({"pk": pa.array(["1"], type=pa.string())})
    with pytest.raises(ValueError, match="type mismatch"):
        fk_violations(
            _ds(child, 1),
            _ds(parent, 1),
            fk="fk",
            pk="pk",
            report_col="grp",
            child_schema=child.schema,
            parent_schema=parent.schema,
        )
