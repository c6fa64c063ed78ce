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


# --- grouped_max ------------------------------------------------------------


def test_grouped_max_timestamps_and_nulls():
    from airbyte_destination_ray.pipelines.ops import grouped_max

    ts = pd.to_datetime(
        ["2024-01-01", "2024-03-05", None, "2024-02-02", None, None]
    )
    tbl = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "t": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    got = _sorted_df(
        grouped_max(_ds(tbl, 3), key="k", value_col="t", out_col="mx"),
        ["k"],
    )
    exp = (
        duckdb.sql("SELECT k, max(t) AS mx FROM tbl GROUP BY 1 ORDER BY 1")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- series_autocorr --------------------------------------------------------


def test_series_autocorr_matches_sql():
    from airbyte_destination_ray.pipelines.relational import series_autocorr

    rng = np.random.default_rng(9)
    n = 4000
    base = pd.Timestamp("2024-01-01").value // 1000
    us = base + rng.integers(0, 200 * 3_600_000_000, n)
    null_mask = rng.random(n) < 0.02
    tbl = pa.table(
        {"ts": pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))}
    )
    tbl = pa.table(
        {"ts": pa.array(tbl.column("ts").to_pandas(), type=pa.timestamp("us"), mask=null_mask)}
    )
    got = series_autocorr(_ds(tbl, 5), ts_col="ts").to_pandas()
    exp = duckdb.sql(
        """
        WITH c AS (
            SELECT epoch_us(ts) // 3600000000 AS b, count(*) AS n
            FROM tbl WHERE ts IS NOT NULL GROUP BY 1),
        p AS (SELECT n AS y, lag(n) OVER (ORDER BY b) AS x FROM c),
        s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              FROM p WHERE x IS NOT NULL)
        SELECT CAST(n AS BIGINT) AS n_pairs,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   AS autocorr
        FROM s
        """
    ).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_series_autocorr_single_bucket_null():
    from airbyte_destination_ray.pipelines.relational import series_autocorr

    tbl = pa.table(
        {
            "ts": pa.array(
                [1_700_000_000_000_000, 1_700_000_000_500_000],
                type=pa.int64(),
            ).cast(pa.timestamp("us"))
        }
    )
    got = series_autocorr(_ds(tbl, 1), ts_col="ts").to_pandas()
    assert got["n_pairs"].iloc[0] == 0
    assert got["autocorr"].isna().all()


# --- source_vocab_overlap ---------------------------------------------------


def _vocab_corpus():
    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(200)]
    rows_text, rows_src = [], []
    for src, lo, hi in [("a", 0, 120), ("b", 60, 180), ("c", 100, 200)]:
        for _ in range(40):
            words = rng.choice(vocab[lo:hi], size=12)
            rows_text.append(" ".join(words))
            rows_src.append(src)
    rows_text.append(None)
    rows_src.append("a")
    rows_text.append("orphan words")
    rows_src.append(None)
    return pa.table({"source": rows_src, "text": rows_text})


def test_source_vocab_overlap_matches_sql():
    from airbyte_destination_ray.pipelines.corpus import source_vocab_overlap

    tbl = _vocab_corpus()
    got = _sorted_df(
        source_vocab_overlap(_ds(tbl, 4), group_col="source"),
        ["group_a", "group_b"],
    )
    exp = (
        duckdb.sql(
            """
        WITH raw AS (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM tbl WHERE text IS NOT NULL AND source IS NOT NULL),
        w AS (SELECT DISTINCT source, term FROM raw WHERE term <> ''),
        sizes AS (SELECT source, count(*) AS n FROM w GROUP BY 1),
        inter AS (
            SELECT a.source AS group_a, b.source AS group_b,
                   count(*) AS n_common
            FROM w a JOIN w b ON a.term = b.term AND a.source < b.source
            GROUP BY 1, 2)
        SELECT group_a, group_b, CAST(n_common AS BIGINT) AS n_common,
               CAST(sa.n + sb.n - n_common AS BIGINT) AS n_union,
               CAST(n_common AS DOUBLE)
                   / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.source = inter.group_a
        JOIN sizes sb ON sb.source = inter.group_b
        ORDER BY 1, 2
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_source_vocab_overlap_explicit_groups_and_batch_invariance():
    from airbyte_destination_ray.pipelines.corpus import source_vocab_overlap

    tbl = _vocab_corpus()
    a = _sorted_df(
        source_vocab_overlap(_ds(tbl, 1), group_col="source"),
        ["group_a", "group_b"],
    )
    b = _sorted_df(
        source_vocab_overlap(
            _ds(tbl, 7), group_col="source", groups=["c", "a", "b"]
        ),
        ["group_a", "group_b"],
    )
    pd.testing.assert_frame_equal(a, b)


# --- spearman_by_key --------------------------------------------------------


def test_spearman_by_key_matches_sql():
    from airbyte_destination_ray.pipelines.ops import spearman_by_key

    rng = np.random.default_rng(13)
    n = 900
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n), type=pa.int64()),
            "x": pa.array(
                np.round(rng.uniform(-5, 5, n), 1), type=pa.float64()
            ),  # coarse → real ties exercise the seq tie-break
            "y": pa.array(rng.integers(0, 50, n), type=pa.int64()),
            "seq": pa.array(np.arange(n), type=pa.int64()),
        }
    )
    got = _sorted_df(
        spearman_by_key(
            _ds(tbl, 5), key="k", x_col="x", y_col="y", seq="seq"
        ),
        ["k"],
    )
    exp = (
        duckdb.sql(
            """
        WITH r AS (
            SELECT k,
                row_number() OVER (PARTITION BY k ORDER BY x, seq) AS rx,
                row_number() OVER (PARTITION BY k ORDER BY y, seq) AS ry
            FROM tbl),
        s AS (SELECT k, count(*) AS n, sum(rx) sx, sum(ry) sy,
                     sum(rx*rx) sxx, sum(ry*ry) syy, sum(rx*ry) sxy
              FROM r GROUP BY 1)
        SELECT k, CAST(n AS BIGINT) AS n_pairs,
               CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                     AND (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) > 0
               THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
               ELSE NULL END AS spearman
        FROM s ORDER BY k
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_spearman_single_row_key_null():
    from airbyte_destination_ray.pipelines.ops import spearman_by_key

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 2], type=pa.int64()),
            "x": pa.array([1.0, 2.0, 3.0]),
            "y": pa.array([5, 6, 4], type=pa.int64()),
            "seq": pa.array([0, 1, 2], type=pa.int64()),
        }
    )
    got = _sorted_df(
        spearman_by_key(_ds(tbl, 1), key="k", x_col="x", y_col="y", seq="seq"),
        ["k"],
    )
    assert got.loc[got["k"] == 1, "spearman"].isna().all()  # dx == 0
    assert got.loc[got["k"] == 2, "spearman"].iloc[0] == -1.0


# --- period_delta -----------------------------------------------------------


def test_period_delta_matches_sql():
    from airbyte_destination_ray.pipelines.relational import period_delta

    rng = np.random.default_rng(17)
    n = 3000
    base = pd.Timestamp("2024-01-01").value // 1000
    us = base + rng.integers(0, 45 * 86_400_000_000, n)
    tbl = pa.table({"ts": pa.array(us, type=pa.int64()).cast(pa.timestamp("us"))})
    got = (
        period_delta(_ds(tbl, 5), ts_col="ts")
        .to_pandas()
        .sort_values("bucket_ts")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            """
        WITH c AS (
            SELECT epoch_us(ts) // 86400000000 AS b, count(*) AS n
            FROM tbl WHERE ts IS NOT NULL GROUP BY 1)
        SELECT make_timestamp(b * 86400000000) AS bucket_ts,
               CAST(n AS BIGINT) AS n,
               CAST(n - lag(n) OVER (ORDER BY b) AS BIGINT) AS delta,
               CASE WHEN lag(n) OVER (ORDER BY b) <> 0
                    THEN CAST(n AS DOUBLE)
                         / CAST(lag(n) OVER (ORDER BY b) AS DOUBLE)
               END AS ratio
        FROM c ORDER BY bucket_ts
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- moving_max_by_key ------------------------------------------------------


def test_moving_max_matches_sql():
    from airbyte_destination_ray.pipelines.relational import moving_max_by_key

    rng = np.random.default_rng(23)
    n = 700
    vals = rng.uniform(-30, 30, n)
    null_mask = rng.random(n) < 0.15
    tbl = pa.table(
        {
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "k": pa.array(rng.integers(0, 25, n), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 500, n), type=pa.int64()),
            "v": pa.array(vals, type=pa.float64(), mask=null_mask),
        }
    )
    got = _sorted_df(
        moving_max_by_key(
            _ds(tbl, 4), key="k", ts_col="ts", seq="seq", value_col="v",
            window_rows=4,
        ),
        ["seq"],
    )
    exp = (
        duckdb.sql(
            """
        SELECT seq, k,
               max(CAST(floor(v * 100) AS BIGINT)) OVER (
                   PARTITION BY k ORDER BY ts, seq
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                   AS win_max_cents
        FROM tbl ORDER BY seq
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["seq", "k", "win_max_cents"]], exp)


def test_moving_max_window_one_is_identity():
    from airbyte_destination_ray.pipelines.relational import moving_max_by_key

    tbl = pa.table(
        {
            "seq": pa.array([0, 1, 2], type=pa.int64()),
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([0, 1, 2], type=pa.int64()),
            "v": pa.array([5.0, None, 1.0], type=pa.float64()),
        }
    )
    got = _sorted_df(
        moving_max_by_key(
            _ds(tbl, 1), key="k", ts_col="ts", seq="seq", value_col="v",
            window_rows=1,
        ),
        ["seq"],
    )
    assert got["win_max_cents"].tolist()[0] == 500
    assert pd.isna(got["win_max_cents"].tolist()[1])
    assert got["win_max_cents"].tolist()[2] == 100


# --- degree_assortativity ---------------------------------------------------


def test_degree_assortativity_matches_sql():
    from airbyte_destination_ray.pipelines.graph import degree_assortativity

    rng = np.random.default_rng(29)
    n = 1500
    src = rng.integers(0, 200, n)
    dst = (src * 3 + rng.integers(1, 60, n)) % 200
    src[:10] = dst[:10]  # self-loops dropped
    tbl = pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
        }
    )
    got = degree_assortativity(_ds(tbl, 4)).to_pandas()
    exp = duckdb.sql(
        """
        WITH und AS (SELECT src AS a, dst AS b FROM tbl
                     UNION SELECT dst, src FROM tbl),
        e0 AS (SELECT a, b FROM und WHERE a <> b),
        deg AS (SELECT a AS node, count(*) AS d FROM e0 GROUP BY 1),
        j AS (SELECT da.d AS x, db.d AS y FROM e0 e
              JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node),
        s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
              FROM j)
        SELECT CAST(n AS BIGINT) AS n_half_edges,
               (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
                   AS assortativity
        FROM s
        """
    ).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


# --- review regressions (session E) -----------------------------------------


def test_fk_violations_null_report_group():
    from airbyte_destination_ray.pipelines.relational import fk_violations

    child = pa.table(
        {
            "fk": pa.array([1, 2, 3, 4], type=pa.int64()),
            "grp": pa.array(["A", None, "B", None]),
        }
    )
    parent = pa.table({"pk": pa.array([1], type=pa.int64())})
    got = (
        fk_violations(
            _ds(child, 2),
            _ds(parent, 1),
            fk="fk",
            pk="pk",
            report_col="grp",
            child_schema=child.schema,
            parent_schema=parent.schema,
        )
        .to_pandas()
        .sort_values("grp", na_position="last")
        .reset_index(drop=True)
    )
    # SQL: fk 2,3,4 violate; groups B->1, A->0(absent), NULL->2
    as_map = {
        (None if pd.isna(k) else k): v
        for k, v in zip(got["grp"], got["n_violations"])
    }
    assert as_map == {"B": 1, None: 2}


def test_moving_windows_null_key_partition():
    from airbyte_destination_ray.pipelines.relational import (
        moving_max_by_key,
        moving_window_sum,
    )

    tbl = pa.table(
        {
            "seq": pa.array([0, 1, 2, 3], type=pa.int64()),
            "k": pa.array([None, None, None, 7], type=pa.int64()),
            "ts": pa.array([0, 1, 2, 3], type=pa.int64()),
            "v": pa.array([5.0, 2.0, 1.0, 9.0], type=pa.float64()),
        }
    )
    mx = _sorted_df(
        moving_max_by_key(
            _ds(tbl, 2), key="k", ts_col="ts", seq="seq", value_col="v",
            window_rows=3,
        ),
        ["seq"],
    )
    # nulls form ONE SQL partition: maxima 500, 500, 500; key 7 alone: 900
    assert mx["win_max_cents"].tolist() == [500, 500, 500, 900]
    ms = _sorted_df(
        moving_window_sum(
            _ds(tbl, 2), key="k", ts_col="ts", seq="seq", value_col="v",
            window_rows=3,
        ),
        ["seq"],
    )
    assert ms["win_sum_cents"].tolist() == [500, 700, 800, 900]


def test_fast_word_count_matches_re2():
    import pyarrow as pa
    import pyarrow.compute as pc

    from airbyte_destination_ray.functions.text import fast_word_count

    texts = pa.array(
        [
            "plain words here",
            "  leading and trailing  ",
            "tabs\tand\nnewlines\rand\fform",
            "vertical\x0btab is NOT a separator in RE2",
            "unicode héllo wörld  nbsp-is-not-space",
            "",
            None,
            "one",
        ]
    )
    got = fast_word_count(texts)
    exp = pc.cast(pc.count_substring_regex(texts, r"\S+"), pa.int64())
    assert got.equals(exp)


def test_txn_query_heals_crashed_transaction(tmp_path, ray_session):
    """A crash between txn_begin and txn_publish must not pin the stale
    state for later same-process calls."""
    from airbyte_destination_ray.pipelines.events_cdc import (
        txn_sync_events_tables,
    )
    from airbyte_destination_ray.pipelines import events_cdc as ec
    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync, txn_begin

    sf = "/root/testdata/sf0.001"
    base = tmp_path / "txnheal"
    # manual "crashed" first attempt: published epoch-0 state + begun txn,
    # no publish
    binlog = base / "binlog"
    lake = base / "lake"
    ec.build_binlog_from_events(f"{sf}/events.parquet", binlog)
    for t in ["events_txn_full", "events_txn_v1"]:
        run_cdc_sync(
            str(lake), str(binlog), table=t, pk="user_id", ver="ts",
            payload_columns=ec.EVENT_PAYLOAD, num_partitions=4,
            compute_digest=False, epochs=[0],
        )
    txn_begin(str(lake), ["events_txn_full", "events_txn_v1"])
    # crashed here.  The query must heal: abort pins, restage, publish.
    healed = txn_sync_events_tables(sf, workdir=base).to_pandas()
    fresh = txn_sync_events_tables(
        sf, workdir=tmp_path / "txnfresh"
    ).to_pandas()
    pd.testing.assert_frame_equal(
        healed.sort_values("table_name").reset_index(drop=True),
        fresh.sort_values("table_name").reset_index(drop=True),
    )


def test_txn_recover_skips_bad_record(tmp_path, ray_session):
    import json

    from airbyte_destination_ray.pipelines.cdc import (
        run_cdc_sync,
        txn_begin,
        txn_publish,
        txn_recover,
        _txn_dir,
    )
    from airbyte_destination_ray.sources.synth import write_custom_binlog

    b = str(tmp_path / "b")
    write_custom_binlog(b, [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=1, text="v1",
             lang="en", html=b""),
    ])
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, b, table="t1", num_partitions=2)
    d = _txn_dir(lake)
    d.mkdir(parents=True, exist_ok=True)
    # a corrupt record and a record naming a dropped table
    (d / "txn-aaa.json").write_text("{not json")
    (d / "txn-bbb.json").write_text(json.dumps({"tables": {"ghost": 1}}))
    # plus a real committed-but-unapplied transaction
    txn = txn_begin(lake, ["t1"])
    run_cdc_sync(lake, b, table="t1", num_partitions=2)
    from airbyte_destination_ray.state.manifest import _atomic_write_json

    _atomic_write_json(d / f"{txn['txn_id']}.json", {"tables": txn["tables"]})
    out = txn_recover(lake)
    assert str(out["txn-aaa"]).startswith("error:")
    assert out[txn["txn_id"]] == 1  # the real one applied despite bad peers


# --- gini_by_key ------------------------------------------------------------


def test_gini_by_key_matches_sql():
    from airbyte_destination_ray.pipelines.ops import gini_by_key

    rng = np.random.default_rng(37)
    n = 800
    keys = [["a", "b", "c", None][i] for i in rng.integers(0, 4, n)]
    vals = rng.uniform(-10, 90, n)  # negatives/zeros excluded by the op
    null_mask = rng.random(n) < 0.05
    tbl = pa.table(
        {
            "k": pa.array(keys),
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(vals, type=pa.float64(), mask=null_mask),
        }
    )
    got = _sorted_df(
        gini_by_key(_ds(tbl, 4), key="k", seq="seq", value_col="v"),
        ["k"],
    )
    exp = (
        duckdb.sql(
            """
        WITH b AS (SELECT k, seq, CAST(floor(v * 100.0) AS BIGINT) AS c
                   FROM tbl WHERE k IS NOT NULL),
        p AS (SELECT * FROM b WHERE c > 0),
        r AS (SELECT k, c, row_number() OVER (
                  PARTITION BY k ORDER BY c, seq) AS rn FROM p),
        s AS (SELECT k, count(*) AS n, sum(c) AS sx, sum(rn*c) AS srx
              FROM r GROUP BY 1)
        SELECT k, CAST(n AS BIGINT) AS n_values,
               CASE WHEN n > 1 AND sx > 0
                    THEN CAST(2*srx - (n+1)*sx AS DOUBLE)
                         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
               END AS gini
        FROM s ORDER BY k
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_gini_known_values():
    from airbyte_destination_ray.pipelines.ops import gini_by_key

    tbl = pa.table(
        {
            "k": pa.array(["eq"] * 4 + ["uneq"] * 4),
            "seq": pa.array(np.arange(8), type=pa.int64()),
            "v": pa.array([5.0, 5.0, 5.0, 5.0, 0.01, 0.01, 0.01, 20.0]),
        }
    )
    got = _sorted_df(
        gini_by_key(_ds(tbl, 1), key="k", seq="seq", value_col="v"), ["k"]
    )
    by = dict(zip(got["k"], got["gini"]))
    assert by["eq"] == 0.0  # perfect equality
    assert by["uneq"] > 0.7  # one value holds nearly all mass


# --- frequency_spectrum -----------------------------------------------------


def test_frequency_spectrum_matches_sql():
    from airbyte_destination_ray.pipelines.corpus import frequency_spectrum

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(80)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for _ in range(120)
    ] + [None, "", "W0 w0 W0"]
    tbl = pa.table({"text": pa.array(texts)})
    got = _sorted_df(frequency_spectrum(_ds(tbl, 5)), ["frequency"])
    exp = (
        duckdb.sql(
            """
        WITH w AS (SELECT unnest(
                string_split_regex(lower(text), '[^a-z0-9]+')) AS term
            FROM tbl WHERE text IS NOT NULL),
        t AS (SELECT term, count(*) AS n FROM w
              WHERE term <> '' GROUP BY 1)
        SELECT n AS frequency, CAST(count(*) AS BIGINT) AS n_terms
        FROM t GROUP BY 1 ORDER BY 1
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- contingency_cells ------------------------------------------------------


def test_contingency_cells_matches_sql():
    from airbyte_destination_ray.pipelines.ops import contingency_cells

    rng = np.random.default_rng(43)
    n = 1200
    base = pd.Timestamp("2024-01-01").value // 1000
    us = base + rng.integers(0, 60 * 86_400_000_000, n)
    keys = [["x", "y", "z", None][i] for i in rng.integers(0, 4, n)]
    null_ts = rng.random(n) < 0.03
    tbl = pa.table(
        {
            "k": pa.array(keys),
            "ts": pa.array(us, type=pa.int64()).cast(pa.timestamp("us")),
        }
    )
    tbl = tbl.set_column(
        1, "ts", pa.array(tbl.column("ts").to_pandas(), type=pa.timestamp("us"), mask=null_ts)
    )
    got = _sorted_df(
        contingency_cells(_ds(tbl, 4), key_col="k", ts_col="ts"),
        ["k", "dow"],
    )
    exp = (
        duckdb.sql(
            """
        WITH c AS (
            SELECT k, CAST(dayofweek(ts) AS BIGINT) AS dow, count(*) AS o
            FROM tbl WHERE k IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
        m AS (SELECT *, sum(o) OVER (PARTITION BY k) AS rt,
                     sum(o) OVER (PARTITION BY dow) AS ct,
                     sum(o) OVER () AS tot FROM c)
        SELECT k, dow, CAST(o AS BIGINT) AS observed,
               CAST(rt*ct AS DOUBLE)/CAST(tot AS DOUBLE) AS expected,
               ((CAST(o AS DOUBLE) - CAST(rt*ct AS DOUBLE)/CAST(tot AS DOUBLE))
                * (CAST(o AS DOUBLE) - CAST(rt*ct AS DOUBLE)/CAST(tot AS DOUBLE)))
               / (CAST(rt*ct AS DOUBLE)/CAST(tot AS DOUBLE)) AS cell_chi2
        FROM m ORDER BY k, dow
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- ks_two_sample ----------------------------------------------------------


def test_ks_two_sample_matches_scipy_style_reference():
    from airbyte_destination_ray.pipelines.ops import ks_two_sample

    rng = np.random.default_rng(47)
    n = 3000
    vals = np.where(
        rng.random(n) < 0.5, rng.normal(0, 5, n), rng.normal(2, 5, n)
    )
    grp = rng.random(n) < 0.5
    null_mask = rng.random(n) < 0.02
    tbl = pa.table(
        {
            "v": pa.array(vals, type=pa.float64(), mask=null_mask),
            "grp": pa.array(grp),
        }
    )
    got = ks_two_sample(
        _ds(tbl, 5), value_col="v", group_mask_col="grp"
    ).to_pandas()
    exp = duckdb.sql(
        """
        WITH v AS (SELECT CAST(floor(v * 100.0) AS BIGINT) AS c, grp
                   FROM tbl WHERE v IS NOT NULL),
        d AS (SELECT c, sum(CASE WHEN grp THEN 1 ELSE 0 END) AS a,
                     sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) AS b
              FROM v GROUP BY 1),
        cum AS (SELECT c, sum(a) OVER (ORDER BY c) ca,
                       sum(b) OVER (ORDER BY c) cb FROM d),
        tot AS (SELECT sum(a) na, sum(b) nb FROM d),
        m AS (SELECT max(abs(nb*ca - na*cb)) dnum FROM cum, tot)
        SELECT CAST(na AS BIGINT) n_a, CAST(nb AS BIGINT) n_b,
               CAST(dnum AS BIGINT) d_num,
               CAST(dnum AS DOUBLE)/CAST(na*nb AS DOUBLE) ks
        FROM m, tot
        """
    ).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # cross-check the statistic against the classic ECDF definition
    cents = np.floor(vals * 100.0).astype(np.int64)
    keep = ~null_mask
    ca, cb = cents[keep & grp], cents[keep & ~grp]
    xs = np.unique(np.concatenate([ca, cb]))
    f1 = np.searchsorted(np.sort(ca), xs, side="right") / len(ca)
    f2 = np.searchsorted(np.sort(cb), xs, side="right") / len(cb)
    assert abs(got["ks"].iloc[0] - np.abs(f1 - f2).max()) < 1e-12


def test_ks_identical_samples_zero():
    from airbyte_destination_ray.pipelines.ops import ks_two_sample

    v = np.tile(np.arange(50, dtype=np.float64), 2)
    grp = np.repeat([True, False], 50)
    tbl = pa.table({"v": pa.array(v), "grp": pa.array(grp)})
    got = ks_two_sample(
        _ds(tbl, 3), value_col="v", group_mask_col="grp"
    ).to_pandas()
    assert got["ks"].iloc[0] == 0.0


# --- range_window_sum_by_key ------------------------------------------------


def test_range_window_sum_matches_sql():
    from airbyte_destination_ray.pipelines.relational import (
        range_window_sum_by_key,
    )

    rng = np.random.default_rng(53)
    n = 900
    keys = rng.integers(0, 20, n).astype(object)
    keys[rng.random(n) < 0.05] = None  # null keys = one SQL partition
    ts = rng.integers(0, 5000, n)  # dense → plenty of RANGE peers/ties
    vals = rng.uniform(-40, 40, n)
    null_v = rng.random(n) < 0.1
    tbl = pa.table(
        {
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "k": pa.array(list(keys), type=pa.int64()),
            "ts": pa.array(ts, type=pa.int64()),
            "v": pa.array(vals, type=pa.float64(), mask=null_v),
        }
    )
    got = _sorted_df(
        range_window_sum_by_key(
            _ds(tbl, 4), key="k", ts_col="ts", seq="seq", value_col="v",
            window_us=500,
        ),
        ["seq"],
    )
    exp = (
        duckdb.sql(
            """
        WITH e AS (SELECT seq, k, ts,
                          COALESCE(CAST(floor(v*100) AS BIGINT), 0) AS cents
                   FROM tbl)
        SELECT seq, k,
               CAST(sum(cents) OVER w AS BIGINT) AS win_sum_cents,
               CAST(count(*) OVER w AS BIGINT) AS win_n
        FROM e
        WINDOW w AS (PARTITION BY k ORDER BY ts
                     RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
        ORDER BY seq
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["seq", "k", "win_sum_cents", "win_n"]], exp
    )


def test_range_window_peers_share_frame():
    from airbyte_destination_ray.pipelines.relational import (
        range_window_sum_by_key,
    )

    # three rows at the SAME ts: every one sees all three (RANGE peers)
    tbl = pa.table(
        {
            "seq": pa.array([0, 1, 2], type=pa.int64()),
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "ts": pa.array([100, 100, 100], type=pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
        }
    )
    got = _sorted_df(
        range_window_sum_by_key(
            _ds(tbl, 1), key="k", ts_col="ts", seq="seq", value_col="v",
            window_us=10,
        ),
        ["seq"],
    )
    assert got["win_sum_cents"].tolist() == [600, 600, 600]
    assert got["win_n"].tolist() == [3, 3, 3]


# --- mannwhitney_two_sample -------------------------------------------------


def test_mannwhitney_matches_scipy_definition():
    from airbyte_destination_ray.pipelines.ops import mannwhitney_two_sample

    rng = np.random.default_rng(59)
    n = 2500
    vals = np.where(
        rng.random(n) < 0.5, rng.normal(0, 4, n), rng.normal(1, 4, n)
    )
    grp = rng.random(n) < 0.5
    tbl = pa.table({"v": pa.array(vals), "grp": pa.array(grp)})
    got = mannwhitney_two_sample(
        _ds(tbl, 4), value_col="v", group_mask_col="grp"
    ).to_pandas()
    # classic U via midranks over the fixed-point values
    cents = np.floor(vals * 100.0).astype(np.int64)
    ca, cb = np.sort(cents[grp]), np.sort(cents[~grp])
    u = 0.0
    # U_A = sum over a of (# b < a) + 0.5*(# b == a)
    lt = np.searchsorted(cb, ca, side="left")
    eq = np.searchsorted(cb, ca, side="right") - lt
    u = lt.sum() + 0.5 * eq.sum()
    assert got["u2"].iloc[0] == int(2 * u)
    assert abs(
        got["auc"].iloc[0] - u / (len(ca) * len(cb))
    ) < 1e-12


def test_mannwhitney_identical_distributions_auc_half():
    from airbyte_destination_ray.pipelines.ops import mannwhitney_two_sample

    v = np.tile(np.arange(40, dtype=np.float64), 2)
    grp = np.repeat([True, False], 40)
    tbl = pa.table({"v": pa.array(v), "grp": pa.array(grp)})
    got = mannwhitney_two_sample(
        _ds(tbl, 2), value_col="v", group_mask_col="grp"
    ).to_pandas()
    assert got["auc"].iloc[0] == 0.5


# --- dwell_time_by_attr -----------------------------------------------------


def test_dwell_time_matches_sql():
    from airbyte_destination_ray.pipelines.relational import dwell_time_by_attr

    rng = np.random.default_rng(61)
    n = 700
    keys = rng.integers(0, 30, n).astype(object)
    keys[rng.random(n) < 0.05] = None
    attrs = [["x", "y", None][i] for i in rng.integers(0, 3, n)]
    tbl = pa.table(
        {
            "k": pa.array(list(keys), type=pa.int64()),
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(rng.integers(0, 100000, n), type=pa.int64()),
            "attr": pa.array(attrs),
        }
    )
    got = (
        dwell_time_by_attr(
            _ds(tbl, 4), key="k", ts_col="ts", seq="seq", attr_col="attr"
        )
        .to_pandas()
        .sort_values("attr", na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            """
        WITH s AS (
            SELECT attr, ts,
                   lead(ts) OVER (PARTITION BY k ORDER BY ts, seq) AS nxt
            FROM tbl WHERE ts IS NOT NULL),
        g AS (SELECT attr, nxt - ts AS gap FROM s WHERE nxt IS NOT NULL)
        SELECT attr, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(gap) AS BIGINT) AS total_us,
               CAST(max(gap) AS BIGINT) AS max_us
        FROM g GROUP BY 1 ORDER BY attr NULLS LAST
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- dup_rate_by_group ------------------------------------------------------


def test_dup_rate_matches_sql_with_real_dups():
    from airbyte_destination_ray.pipelines.dedup import dup_rate_by_group

    rng = np.random.default_rng(67)
    n = 500
    srcs = [["a", "b", None][i] for i in rng.integers(0, 3, n)]
    # heavy duplication: only 40 distinct contents + some null texts
    texts = [
        None if rng.random() < 0.05 else f"content-{rng.integers(0, 40)}"
        for _ in range(n)
    ]
    tbl = pa.table({"source": pa.array(srcs), "text": pa.array(texts)})
    got = (
        dup_rate_by_group(_ds(tbl, 4), group_col="source", text_col="text")
        .to_pandas()
        .sort_values("source", na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
               CASE WHEN count(*) > 0
                    THEN CAST(count(*) - count(DISTINCT text) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE) END AS dup_fraction
        FROM tbl GROUP BY source ORDER BY source NULLS LAST
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


# --- grouped_min ------------------------------------------------------------


def test_grouped_min_matches_sql():
    from airbyte_destination_ray.pipelines.ops import grouped_min

    tbl = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
            "v": pa.array([5, None, 7, 2, None], type=pa.int64()),
        }
    )
    got = _sorted_df(
        grouped_min(_ds(tbl, 2), key="k", value_col="v", out_col="mn"),
        ["k"],
    )
    exp = (
        duckdb.sql("SELECT k, min(v) AS mn FROM tbl GROUP BY 1 ORDER BY 1")
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
