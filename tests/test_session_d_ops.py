"""Unit tests for the session-D kernels: transition_counts,
interval_coverage_by_key, resample_ffill, weighted_median_by_key,
explode_segments — edge cases (nulls, ties, empty segments, zero-length
intervals) plus batch-composition invariance against DuckDB references."""

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


# --- transition_counts ------------------------------------------------------


def test_transition_counts_matches_sql_lag():
    from airbyte_destination_ray.pipelines.relational import transition_counts

    rng = np.random.default_rng(7)
    n = 500
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 9, n), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 400, n), type=pa.int64()),
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "state": pa.array(
                [["a", "b", "c", None][i] for i in rng.integers(0, 4, n)]
            ),
        }
    )
    got = _sorted_df(
        transition_counts(
            _ds(tbl, 5), key="k", ts_col="ts", seq="seq", state_col="state"
        ),
        ["from_state", "to_state"],
    )
    exp = (
        duckdb.sql(
            """
        WITH s AS (
            SELECT k, state, lag(state) OVER (
                PARTITION BY k ORDER BY ts, seq) AS prev
            FROM tbl)
        SELECT prev AS from_state, state AS to_state,
               count(*) AS n
        FROM s WHERE prev IS NOT NULL AND state IS NOT NULL
        GROUP BY 1, 2
    """
        )
        .df()
        .pipe(_sorted_df, ["from_state", "to_state"])
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_transition_counts_single_row_key_emits_nothing():
    from airbyte_destination_ray.pipelines.relational import transition_counts

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 2], type=pa.int64()),
            "ts": pa.array([0, 0, 1], type=pa.int64()),
            "seq": pa.array([0, 1, 2], type=pa.int64()),
            "state": pa.array(["x", "y", "z"]),
        }
    )
    out = transition_counts(
        _ds(tbl, 2), key="k", ts_col="ts", seq="seq", state_col="state"
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].to_dict() == {
        "from_state": "y",
        "to_state": "z",
        "n": 1,
    }


# --- interval_coverage_by_key -----------------------------------------------


def _brute_coverage(iv: list[tuple[int, int]]) -> int:
    covered = 0
    cur_s, cur_e = None, None
    for s, e in sorted((s, max(e, s)) for s, e in iv):
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    return covered


def test_interval_coverage_overlap_merge_and_zero_length():
    from airbyte_destination_ray.pipelines.relational import (
        interval_coverage_by_key,
    )

    rng = np.random.default_rng(3)
    rows = []
    for k in range(6):
        for _ in range(rng.integers(1, 40)):
            s = int(rng.integers(0, 1000))
            rows.append((k, s, s + int(rng.integers(0, 80))))
    rows.append((7, 10, 10))  # zero-length only -> covered 0
    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in rows], type=pa.int64()),
            "s": pa.array([r[1] for r in rows], type=pa.int64()),
            "e": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    got = _sorted_df(
        interval_coverage_by_key(
            _ds(tbl, 4), key="k", start_col="s", end_col="e"
        ),
        ["k"],
    )
    per_key: dict[int, list[tuple[int, int]]] = {}
    for k, s, e in rows:
        per_key.setdefault(k, []).append((s, e))
    exp = pd.DataFrame(
        [
            {"k": k, "covered_us": _brute_coverage(v)}
            for k, v in sorted(per_key.items())
        ]
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.loc[got["k"] == 7, "covered_us"].item() == 0


def test_interval_coverage_batch_invariance():
    from airbyte_destination_ray.pipelines.relational import (
        interval_coverage_by_key,
    )

    tbl = pa.table(
        {
            "k": pa.array([1] * 4, type=pa.int64()),
            "s": pa.array([0, 5, 20, 22], type=pa.int64()),
            "e": pa.array([10, 7, 25, 30], type=pa.int64()),
        }
    )
    for blocks in (1, 2, 4):
        out = interval_coverage_by_key(
            _ds(tbl, blocks), key="k", start_col="s", end_col="e"
        ).to_pandas()
        assert out["covered_us"].item() == 10 + 10  # [0,10) + [20,30)


# --- resample_ffill ---------------------------------------------------------


def test_resample_ffill_matches_duckdb_asof():
    from airbyte_destination_ray.pipelines.relational import resample_ffill

    rng = np.random.default_rng(11)
    n = 300
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 5, n), type=pa.int64()),
            "ts": pa.array(
                rng.integers(0, 50_000, n) * 1000, type=pa.timestamp("us")
            ),
            "seq": pa.array(rng.permutation(n), type=pa.int64()),
            "v": pa.array(rng.normal(size=n), type=pa.float64()),
        }
    )
    step = 7_000_000  # 7 s grid
    got = _sorted_df(
        resample_ffill(
            _ds(tbl, 4),
            key="k",
            ts_col="ts",
            value_col="v",
            seq="seq",
            step_us=step,
        ),
        ["k", "gts"],
    )
    exp = (
        duckdb.sql(
            f"""
        WITH ev AS (
            SELECT k, ts, max_by(v, seq) AS v FROM tbl GROUP BY k, ts),
        b AS (
            SELECT k,
                   to_timestamp((epoch_us(min(ts)) // {step}) * {step}
                       / 1000000.0)::TIMESTAMP AS lo,
                   to_timestamp((epoch_us(max(ts)) // {step}) * {step}
                       / 1000000.0)::TIMESTAMP AS hi
            FROM tbl GROUP BY k),
        grid AS (
            SELECT k, unnest(generate_series(
                lo, hi, INTERVAL {step} MICROSECONDS)) AS gts
            FROM b)
        SELECT g.k, g.gts, e.v
        FROM grid g ASOF LEFT JOIN ev e ON g.k = e.k AND g.gts >= e.ts
    """
        )
        .df()
        .pipe(_sorted_df, ["k", "gts"])
    )
    got["gts"] = pd.to_datetime(got["gts"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_resample_ffill_first_tick_null_and_tie_break():
    from airbyte_destination_ray.pipelines.relational import resample_ffill

    # two events at the SAME ts: max-seq row must win; first grid tick
    # precedes the first event (floor) -> null.
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([1_500_000, 1_500_000, 2_600_000],
                           type=pa.timestamp("us")),
            "seq": pa.array([5, 9, 1], type=pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0], type=pa.float64()),
        }
    )
    out = (
        resample_ffill(
            _ds(tbl, 1),
            key="k",
            ts_col="ts",
            value_col="v",
            seq="seq",
            step_us=1_000_000,
        )
        .to_pandas()
        .sort_values("gts")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert pd.isna(out.loc[0, "v"])  # tick at 1.0s precedes 1.5s event
    assert out.loc[1, "v"] == 20.0  # seq 9 beats seq 5 at equal ts


# --- weighted_median_by_key -------------------------------------------------


def test_weighted_median_matches_sql_window():
    from airbyte_destination_ray.pipelines.ops import weighted_median_by_key

    rng = np.random.default_rng(5)
    n = 400
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 7, n), type=pa.int64()),
            "v": pa.array(
                np.round(rng.normal(size=n) * 50, 2), type=pa.float64()
            ),
            "w": pa.array(rng.integers(1, 9, n), type=pa.int64()),
        }
    )
    got = _sorted_df(
        weighted_median_by_key(
            _ds(tbl, 5), key="k", value_col="v", weight_col="w"
        ),
        ["k"],
    )
    exp = (
        duckdb.sql(
            """
        WITH c AS (
            SELECT k, v,
                   SUM(w) OVER (PARTITION BY k ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cw,
                   SUM(w) OVER (PARTITION BY k) AS total
            FROM tbl)
        SELECT k, MIN(v) AS wmedian FROM c
        WHERE 2 * cw >= total GROUP BY k
    """
        )
        .df()
        .pipe(_sorted_df, ["k"])
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_weighted_median_equals_plain_median_at_unit_weight():
    from airbyte_destination_ray.pipelines.ops import weighted_median_by_key

    tbl = pa.table(
        {
            "k": pa.array([1] * 5, type=pa.int64()),
            "v": pa.array([5.0, 1.0, 3.0, 2.0, 4.0], type=pa.float64()),
            "w": pa.array([1] * 5, type=pa.int64()),
        }
    )
    out = weighted_median_by_key(
        _ds(tbl, 2), key="k", value_col="v", weight_col="w"
    ).to_pandas()
    assert out["wmedian"].item() == 3.0


# --- explode_segments -------------------------------------------------------


def test_explode_segments_edge_cases():
    from airbyte_destination_ray.pipelines.corpus import explode_segments

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["a b  c", "", None, "x"]),
        }
    )
    out = _sorted_df(
        explode_segments(_ds(tbl, 2), id_col="doc_id", text_col="text"),
        ["doc_id", "seg_idx"],
    )
    exp = (
        duckdb.sql(
            """
        WITH p AS (
            SELECT doc_id, string_split(text, ' ') AS parts
            FROM tbl WHERE text IS NOT NULL)
        SELECT doc_id, unnest(range(1, len(parts) + 1)) AS seg_idx,
               unnest(parts) AS segment
        FROM p
    """
        )
        .df()
        .pipe(_sorted_df, ["doc_id", "seg_idx"])
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # doubled separator yields an empty middle segment; '' -> one empty seg
    assert list(out[out.doc_id == 1]["segment"]) == ["a", "b", "", "c"]
    assert list(out[out.doc_id == 2]["segment"]) == [""]
    assert 3 not in set(out["doc_id"])
