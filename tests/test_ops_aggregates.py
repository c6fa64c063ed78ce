"""grouped_corr / rollup_counts / pivot_counts / grouped_count
(pipelines/ops.py) vs DuckDB oracles on small deterministic tables —
edge cases the sf-scale gate can't isolate: null pairs, zero variance,
rollup null levels, pivot values outside the closed column list."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: pa.Table, blocks=4):
    import ray.data

    return ray.data.from_arrow(table).repartition(blocks)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)


def _assert_matches(ds, sql: str, views: dict[str, pa.Table]):
    con = duckdb.connect()
    for name, tbl in views.items():
        con.register(name, tbl)
    exp = con.execute(sql).fetchdf()
    got = ds.to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(exp), check_dtype=False
    )


def test_grouped_corr_matches_fixed_formula(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_corr

    rng = np.random.default_rng(11)
    n = 500
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 5, n), type=pa.int64()),
            "x": pa.array(rng.integers(-100, 100, n), type=pa.int64()),
            "y": pa.array(rng.integers(0, 24, n), type=pa.int64()),
        }
    )
    out = grouped_corr(_ds(t), key="k", x_col="x", y_col="y").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT k, count(*) AS n_pairs, "
        "corr(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS corr_xy "
        "FROM t GROUP BY k"
    ).fetchdf()
    got = out.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert list(got["n_pairs"]) == list(exp["n_pairs"])
    # statistical agreement with the native corr (different but exact
    # formula) — bit-exactness vs the spelled-out SQL is the oracle gate
    np.testing.assert_allclose(got["corr_xy"], exp["corr_xy"], atol=1e-9)


def test_grouped_corr_null_pairs_and_zero_variance(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_corr

    t = pa.table(
        {
            "k": pa.array(["a"] * 4 + ["b"] * 3 + ["c"] * 2),
            "x": pa.array([1, 2, None, 4, 5, 5, 5, 1, 2], type=pa.int64()),
            "y": pa.array([2, 4, 6, None, 1, 2, 3, 7, 9], type=pa.int64()),
        }
    )
    out = (
        grouped_corr(_ds(t, blocks=3), key="k", x_col="x", y_col="y")
        .to_pandas()
        .set_index("k")
    )
    # 'a': rows with a null on either side excluded pairwise → n=2
    assert out.loc["a", "n_pairs"] == 2
    assert abs(out.loc["a", "corr_xy"] - 1.0) < 1e-12
    # 'b': x constant → zero variance → null (SQL corr semantics)
    assert out.loc["b", "n_pairs"] == 3
    assert pd.isna(out.loc["b", "corr_xy"])
    assert abs(out.loc["c", "corr_xy"] - 1.0) < 1e-12


def test_grouped_corr_parallelism_invariant(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_corr

    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 3, 300), type=pa.int64()),
            "x": pa.array(rng.integers(0, 1000, 300), type=pa.int64()),
            "y": pa.array(rng.integers(0, 50, 300), type=pa.int64()),
        }
    )
    a = (
        grouped_corr(_ds(t, blocks=1), key="k", x_col="x", y_col="y")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    b = (
        grouped_corr(_ds(t, blocks=7), key="k", x_col="x", y_col="y")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # integer partials + fixed-order float formula → bit-identical
    pd.testing.assert_frame_equal(a, b)


def test_rollup_counts_matches_sql_rollup(ray_session):
    from airbyte_destination_ray.pipelines.ops import rollup_counts

    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "a": pa.array(rng.choice(["x", "y", "z"], 400)),
            "b": pa.array(rng.integers(0, 7, 400), type=pa.int64()),
        }
    )
    out = rollup_counts(_ds(t), keys=["a", "b"], num_partitions=8)
    _assert_matches(
        out,
        "SELECT a, b, CAST(count(*) AS BIGINT) AS n "
        "FROM t GROUP BY ROLLUP(a, b)",
        {"t": t},
    )


def test_rollup_counts_level_invariants(ray_session):
    from airbyte_destination_ray.pipelines.ops import rollup_counts

    t = pa.table(
        {
            "a": pa.array(["p", "p", "q"]),
            "b": pa.array([1, 2, 1], type=pa.int64()),
        }
    )
    df = rollup_counts(_ds(t, blocks=2), keys=["a", "b"]).to_pandas()
    grand = df[df["a"].isna() & df["b"].isna()]
    assert len(grand) == 1 and grand["n"].iloc[0] == 3
    lvl1 = df[df["a"].notna() & df["b"].isna()]
    assert lvl1["n"].sum() == 3
    lvl2 = df[df["a"].notna() & df["b"].notna()]
    assert len(lvl2) == 3 and lvl2["n"].sum() == 3


def test_pivot_counts_closed_columns(ray_session):
    from airbyte_destination_ray.pipelines.ops import pivot_counts

    t = pa.table(
        {
            "day": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "kind": pa.array(["a", "a", "b", "b", "zzz"]),
        }
    )
    df = (
        pivot_counts(
            _ds(t, blocks=2),
            row_key="day",
            col_key="kind",
            col_values=["a", "b"],
        )
        .to_pandas()
        .set_index("day")
        .sort_index()
    )
    # 'zzz' outside the closed list is dropped; missing combos are 0
    assert list(df.columns) == ["n_a", "n_b"]
    assert df.loc[1, "n_a"] == 2 and df.loc[1, "n_b"] == 1
    assert df.loc[2, "n_a"] == 0 and df.loc[2, "n_b"] == 1


def test_grouped_count_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_count

    rng = np.random.default_rng(9)
    t = pa.table({"k": pa.array(rng.integers(0, 11, 500), type=pa.int64())})
    _assert_matches(
        grouped_count(_ds(t, blocks=5), key="k", out_col="n"),
        "SELECT k, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY k",
        {"t": t},
    )


def test_grouped_sum_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_sum

    rng = np.random.default_rng(21)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 9, 400), type=pa.int64()),
            "v": pa.array(rng.integers(-50, 50, 400), type=pa.int64()),
        }
    )
    _assert_matches(
        grouped_sum(_ds(t, blocks=5), key="k", value_col="v", out_col="s"),
        "SELECT k, CAST(sum(v) AS BIGINT) AS s FROM t GROUP BY k",
        {"t": t},
    )


def test_cube_counts_matches_sql_cube(ray_session):
    from airbyte_destination_ray.pipelines.ops import cube_counts

    rng = np.random.default_rng(6)
    t = pa.table(
        {
            "a": pa.array(rng.choice(["x", "y"], 300)),
            "b": pa.array(rng.integers(0, 5, 300), type=pa.int64()),
        }
    )
    _assert_matches(
        cube_counts(_ds(t), keys=["a", "b"], num_partitions=8),
        "SELECT a, b, CAST(count(*) AS BIGINT) AS n "
        "FROM t GROUP BY CUBE(a, b)",
        {"t": t},
    )


def test_grouping_sets_validation(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouping_sets_counts

    t = pa.table({"a": pa.array(["x"]), "b": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError):
        grouping_sets_counts(_ds(t, blocks=1), keys=[], sets=[])
    with pytest.raises(ValueError):
        grouping_sets_counts(
            _ds(t, blocks=1), keys=["a", "b"], sets=[(True,)]
        )
    with pytest.raises(ValueError):
        grouping_sets_counts(
            _ds(t, blocks=1),
            keys=["a", "b"],
            sets=[(True, True), (True, True)],
        )


def test_extract_json_int_envelope(ray_session):
    from airbyte_destination_ray.pipelines.ops import extract_json_int

    t = pa.table(
        {
            "props": pa.array(
                [
                    '{"k": 69}',
                    '{"k":-3, "j": 1}',
                    '{"j": 5}',        # key absent -> null
                    '{"k": "str"}',    # non-integer -> null
                    None,              # null json -> null
                    '{ "k" : 12 }',    # whitespace tolerated
                ]
            )
        }
    )
    out = (
        extract_json_int(_ds(t, blocks=2), col="props", key="k", out_col="k")
        .to_pandas()
    )
    got = [None if pd.isna(v) else int(v) for v in out["k"]]
    assert sorted(
        (str(v) for v in got)
    ) == sorted(str(v) for v in [69, -3, None, None, None, 12])


def test_grouped_int_stats_null_semantics(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_int_stats

    t = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([5, None, -2, None, None], type=pa.int64()),
        }
    )
    out = (
        grouped_int_stats(_ds(t, blocks=2), key="k", value_col="v")
        .to_pandas()
        .set_index("k")
    )
    assert out.loc["a", "n_values"] == 2
    assert out.loc["a", "sum_value"] == 3
    assert out.loc["a", "min_value"] == -2
    assert out.loc["a", "max_value"] == 5
    # all-null key: count 0, null aggregates (SQL semantics)
    assert out.loc["b", "n_values"] == 0
    assert pd.isna(out.loc["b", "sum_value"])
    assert pd.isna(out.loc["b", "min_value"])
    assert pd.isna(out.loc["b", "max_value"])


def test_standardize_column_bit_exact_and_null_propagation(ray_session):
    """z-scores must be bit-identical across parallelism (fixed IEEE order
    from exact integer moments) and null values must yield null z."""
    import math

    import ray.data
    from airbyte_destination_ray.pipelines.ops import standardize_column

    vals = [1.25, None, 3.5, -2.0, 10.0, 0.0, 7.75, None, 4.0, 5.5]
    t = pa.table(
        {
            "event_id": pa.array(range(len(vals)), type=pa.int64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )

    def run(nblocks):
        out = standardize_column(
            ray.data.from_arrow(t).repartition(nblocks),
            value_col="value",
            keep_cols=("event_id",),
        )
        res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
        return res.sort_by("event_id").column("z").to_pylist()

    z1, z4 = run(1), run(4)
    assert z1 == z4  # bit-identical, not approximately
    assert z1[1] is None and z1[7] is None
    cents = [math.floor(v * 100) if v is not None else None for v in vals]
    cs = [c for c in cents if c is not None]
    n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
    mean = float(s1) / n
    std = math.sqrt((float(s2) - float(s1) * float(s1) / n) / (n - 1))
    want = [
        None if c is None else (float(c) - mean) / std for c in cents
    ]
    assert z1 == want


def test_heavy_hitters_exact_with_tiny_k(ray_session):
    """The MG candidate pass runs with k far below the distinct count;
    the exact verify pass must still return precisely the SQL answer —
    the two-pass guarantee, not exact-until-compression."""
    from airbyte_destination_ray.pipelines.ops import heavy_hitters

    rng = np.random.default_rng(5)
    # 2000 rows: ~1500 singletons (long tail) + planted hitters
    tail = rng.integers(10_000, 100_000, size=1400)
    hot = np.concatenate(
        [np.full(300, 1), np.full(200, 2), np.full(60, 3), np.full(40, 4)]
    )
    vals = np.concatenate([tail, hot])
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, type=pa.int64())})
    # phi = 1/40 -> threshold 50 rows; k=16 (<< ~1404 distinct)
    out = heavy_hitters(
        _ds(t, blocks=7), col="v", phi_num=1, phi_den=40, k=16
    )
    _assert_matches(
        out,
        """
        SELECT v, CAST(count(*) AS BIGINT) AS n FROM t
        WHERE v IS NOT NULL
        GROUP BY v
        HAVING count(*) * 40 > 1 * (SELECT count(*) FROM t WHERE v IS NOT NULL)
        """,
        {"t": t},
    )


def test_heavy_hitters_strings_nulls_and_empty(ray_session):
    from airbyte_destination_ray.pipelines.ops import heavy_hitters

    t = pa.table(
        {
            "s": pa.array(
                ["a"] * 6 + ["b"] * 3 + ["c"] * 1 + [None] * 4,
                type=pa.string(),
            )
        }
    )
    out = heavy_hitters(_ds(t, blocks=3), col="s", phi_num=1, phi_den=4)
    got = out.to_pandas().sort_values("s").reset_index(drop=True)
    # n_valid = 10; threshold > 2.5 -> a (6) and b (3)
    assert list(got["s"]) == ["a", "b"]
    assert list(got["n"]) == [6, 3]

    # nothing frequent enough -> typed empty result
    out2 = heavy_hitters(_ds(t, blocks=3), col="s", phi_num=9, phi_den=10)
    assert out2.count() == 0


def test_standardize_by_key_matches_sql(ray_session):
    """Per-key z vs the spelled-out SQL: exact int moments, fixed IEEE
    final; single-row keys -> null z; null values keep a null-z row and
    don't pollute the moments; zero-variance keys -> NaN on both sides."""
    from airbyte_destination_ray.pipelines.ops import standardize_by_key

    rng = np.random.default_rng(17)
    n = 600
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "user_id": pa.array(rng.integers(0, 12, n), type=pa.int64()),
            "value": pa.array(rng.uniform(0, 100, n)),
        }
    )
    # hard cases: single-row key 50, zero-variance key 51, null values
    extra = pa.table(
        {
            "event_id": pa.array([1000, 1001, 1002, 1003, 1004], type=pa.int64()),
            "user_id": pa.array([50, 51, 51, 0, 51], type=pa.int64()),
            "value": pa.array([7.0, 3.0, 3.0, None, 3.0]),
        }
    )
    t = pa.concat_tables([t, extra])
    out = standardize_by_key(
        _ds(t, blocks=5),
        key="user_id",
        seq="event_id",
        value_col="value",
    )
    _assert_matches(
        out,
        """
        WITH e AS (SELECT event_id, user_id,
                          CAST(floor(value * 100) AS BIGINT) AS cents
                   FROM t),
        s AS (SELECT user_id,
                     CAST(count(cents) AS BIGINT) AS n,
                     CAST(sum(cents) AS DOUBLE) AS s1,
                     CAST(sum(cents * cents) AS DOUBLE) AS s2
              FROM e GROUP BY user_id)
        SELECT e.event_id, e.user_id,
               CASE WHEN e.cents IS NULL OR s.n <= 1 THEN NULL
                    ELSE (CAST(e.cents AS DOUBLE) - s.s1 / s.n)
                         / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))
               END AS z
        FROM e JOIN s USING (user_id)
        """,
        {"t": t},
    )


def test_exact_quantile_disc_matches_duckdb(ray_session):
    """Iterative histogram selection == quantile_disc at several q,
    including q=0/1, a 30%-duplicate spike, and an all-identical column
    (terminates via distinct-count terminal, never a row collect)."""
    import duckdb

    from airbyte_destination_ray.pipelines.ops import exact_quantile_disc

    rng = np.random.default_rng(41)
    vals = np.concatenate(
        [rng.normal(0, 100, 6000), np.full(4000, 3.25), rng.normal(500, 1, 2000)]
    )
    t = pa.table({"v": pa.array(list(vals) + [None] * 9, type=pa.float64())})
    con = duckdb.connect()
    con.register("t", t)
    ds = _ds(t, blocks=5)
    for q in (0.0, 0.25, 0.5, 0.93, 1.0):
        got = exact_quantile_disc(ds, value_col="v", q=q, collect_cap=512)
        exp = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert got == exp, (q, got, exp)

    same = pa.table({"v": pa.array([7.5] * 20000)})
    assert (
        exact_quantile_disc(_ds(same), value_col="v", q=0.5, collect_cap=16)
        == 7.5
    )


def test_extract_json_int_fractional_is_null(ray_session):
    """Fractional/scientific JSON numbers are NOT integers: extract null,
    never the integer prefix (review regression)."""
    import ray.data

    from airbyte_destination_ray.pipelines.ops import extract_json_int

    t = pa.table(
        {
            "props": pa.array(
                [
                    '{"k": 5}',
                    '{"k": 5.7}',
                    '{"k": -3}',
                    '{"k": 2e3}',
                    '{"x": 1}',
                    None,
                ]
            )
        }
    )
    out = extract_json_int(
        ray.data.from_arrow(t), col="props", key="k", out_col="v"
    ).to_pandas()
    vals = [None if pd.isna(v) else int(v) for v in out["v"]]
    assert vals == [5, None, -3, None, None, None]


def test_mode_by_key_deterministic_ties(ray_session):
    """Grouped mode == SQL row_number over (count DESC, value ASC); ties
    resolve to the smallest value; null keys/values ignored."""
    from airbyte_destination_ray.pipelines.ops import mode_by_key

    rng = np.random.default_rng(29)
    n = 900
    t = pa.table(
        {
            "k": pa.array(
                list(rng.integers(0, 15, n - 2)) + [None, 3],
                type=pa.int64(),
            ),
            "v": pa.array(
                list(rng.integers(0, 6, n - 1)) + [None], type=pa.int64()
            ),
        }
    )
    out = mode_by_key(_ds(t, blocks=5), key="k", value_col="v")
    _assert_matches(
        out,
        """
        WITH c AS (
            SELECT k, v, CAST(count(*) AS BIGINT) AS n
            FROM t WHERE k IS NOT NULL AND v IS NOT NULL
            GROUP BY k, v)
        SELECT k, v AS mode_value, n FROM c
        QUALIFY row_number() OVER (
            PARTITION BY k ORDER BY n DESC, v ASC) = 1
        """,
        {"t": t},
    )


def test_grouped_mad_matches_sql(ray_session):
    """Exact per-key MAD == SQL quantile_cont∘abs∘quantile_cont, including
    even/odd segment interpolation and single-row keys (mad 0)."""
    from airbyte_destination_ray.pipelines.ops import grouped_mad

    rng = np.random.default_rng(43)
    n = 800
    t = pa.table(
        {
            "k": pa.array(
                list(rng.integers(0, 11, n - 2)) + [None, 50],
                type=pa.int64(),
            ),
            "v": pa.array(
                list(rng.uniform(-50, 50, n - 1)) + [None]
            ),
        }
    )
    out = grouped_mad(_ds(t, blocks=5), key="k", value_col="v")
    _assert_matches(
        out,
        """
        WITH e AS (SELECT k, v FROM t
                   WHERE k IS NOT NULL AND v IS NOT NULL),
        m AS (SELECT k, quantile_cont(v, 0.5) AS med FROM e GROUP BY k),
        d AS (SELECT e.k, abs(e.v - m.med) AS dev
              FROM e JOIN m USING (k))
        SELECT k, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY k
        """,
        {"t": t},
    )


# ---------------------------------------------------------------------------
# lww_partial_merge (column-level partial-update CDC merge)
# ---------------------------------------------------------------------------


def test_lww_partial_merge_column_level(ray_session):
    """Each column independently takes its latest non-null value; row-level
    LWW would lose column a's value when the newest event only sets b."""
    from airbyte_destination_ray.pipelines.ops import lww_partial_merge

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, None], type=pa.int64()),
            "ver": pa.array([10, 20, 30, 10, 20, 10], type=pa.int64()),
            "seq": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "a": pa.array([5.0, None, None, None, None, 1.0]),
            "b": pa.array(["x", "y", None, None, None, "z"]),
        }
    )
    out = (
        lww_partial_merge(
            _ds(t, 3), pk="k", ver="ver", seq="seq", patch_cols=["a", "b"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # key 1: a survives from ver 10, b from ver 20, (ver,seq) overall (30,3)
    assert out.loc[0, ["k", "a", "b", "ver", "seq"]].tolist() == [1, 5.0, "y", 30, 3]
    # key 2: never set either column -> both null, latest (20,5)
    assert out.loc[1, "k"] == 2
    assert pd.isna(out.loc[1, "a"]) and pd.isna(out.loc[1, "b"])
    assert out.loc[1, ["ver", "seq"]].tolist() == [20, 5]
    # null keys dropped
    assert len(out) == 2


def test_lww_partial_merge_order_invariant(ray_session):
    """Result is independent of event arrival order / batch composition."""
    from airbyte_destination_ray.pipelines.ops import lww_partial_merge

    rng = np.random.default_rng(11)
    n = 2000
    base = pa.table(
        {
            "k": pa.array(rng.integers(0, 97, n), type=pa.int64()),
            "ver": pa.array(rng.integers(0, 500, n), type=pa.int64()),
            "seq": pa.array(np.arange(n), type=pa.int64()),
            "a": pa.array(
                [None if rng.random() < 0.5 else float(i) for i in range(n)]
            ),
        }
    )
    perm = rng.permutation(n)
    shuffled = base.take(pa.array(perm, type=pa.int64()))
    outs = []
    for tbl, blocks in ((base, 3), (shuffled, 7)):
        outs.append(
            _sorted(
                lww_partial_merge(
                    _ds(tbl, blocks), pk="k", ver="ver", seq="seq",
                    patch_cols=["a"], num_partitions=5,
                ).to_pandas()
            )
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# grouped_moments (exact skewness / kurtosis)
# ---------------------------------------------------------------------------


def test_grouped_moments_matches_sql_bit_exact(ray_session):
    from airbyte_destination_ray.pipelines.ops import grouped_moments

    rng = np.random.default_rng(5)
    n = 4000
    t = pa.table(
        {
            "g": pa.array(rng.choice(["a", "b", "c"], n)),
            "v": pa.array(
                np.where(rng.random(n) < 0.1, np.nan, rng.gamma(2.0, 50.0, n))
            ),
        }
    )
    # inject nulls (NaN != null; mask them properly)
    v = t.column("v").to_pandas()
    t = t.set_column(1, "v", pa.array(v.where(~np.isnan(v), None)))
    out = grouped_moments(_ds(t, 5), key="g", value_col="v", num_partitions=4)
    con = duckdb.connect()
    con.register("t", t)
    oracle = con.sql(
        """
        WITH c AS (SELECT g AS k, CAST(floor(v) AS BIGINT) AS v FROM t
                   WHERE v IS NOT NULL AND g IS NOT NULL),
        a AS (SELECT k, CAST(count(*) AS BIGINT) n, CAST(sum(v) AS BIGINT) s1,
                     CAST(sum(v*v) AS BIGINT) s2, CAST(sum(v*v*v) AS BIGINT) s3,
                     CAST(sum(v*v*v*v) AS BIGINT) s4 FROM c GROUP BY k),
        m AS (SELECT k, n, CAST(s1 AS DOUBLE)/n AS mean, CAST(s2 AS DOUBLE)/n AS e2,
                     CAST(s3 AS DOUBLE)/n AS e3, CAST(s4 AS DOUBLE)/n AS e4 FROM a)
        SELECT k AS g, n, mean, e2 - mean*mean AS var_pop,
          (e3 - 3.0*mean*e2 + 2.0*mean*mean*mean)
              / ((e2 - mean*mean) * sqrt(e2 - mean*mean)) AS skew_pop,
          (e4 - 4.0*mean*e3 + 6.0*mean*mean*e2 - 3.0*mean*mean*mean*mean)
              / ((e2 - mean*mean)*(e2 - mean*mean)) AS kurt_pop
        FROM m
        """
    ).df()
    a = _sorted(out.to_pandas())
    b = _sorted(oracle)
    # dtype-strict equality: the whole point is bit-exact float parity
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# agg_strings_by_key (string_agg ORDER BY)
# ---------------------------------------------------------------------------


def test_agg_strings_by_key_matches_string_agg(ray_session):
    from airbyte_destination_ray.pipelines.ops import agg_strings_by_key

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 3, None], type=pa.int64()),
            "o": pa.array([3, 1, 2, 1, 2, 1, 1], type=pa.int64()),
            "v": pa.array(["c", "a", None, "x", "y", None, "q"]),
        }
    )
    out = (
        agg_strings_by_key(
            _ds(t, 3), key="k", value_col="v", order_cols=["o"],
            sep="|", out_col="s", num_partitions=4,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    oracle = (
        con.sql(
            """SELECT k, string_agg(v, '|' ORDER BY o) AS s
               FROM t WHERE k IS NOT NULL GROUP BY k"""
        )
        .df()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    # all-null key aggregates to null, not empty string
    assert pd.isna(out.loc[out["k"] == 3, "s"]).all()


# ---------------------------------------------------------------------------
# profile_columns (per-column data-quality profile)
# ---------------------------------------------------------------------------


def test_profile_columns_counts(ray_session):
    from airbyte_destination_ray.pipelines.ops import profile_columns

    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 3, 3, 3], type=pa.int64()),
            "b": pa.array(["x", None, "x", None, "y", "x", "z"]),
            "c": pa.array([1.5, 1.5, 1.5, 1.5, 1.5, 1.5, 1.5]),
        }
    )
    out = (
        profile_columns(_ds(t, 4), cols=["a", "b", "c"], num_partitions=3)
        .to_pandas()
        .sort_values("col_name")
        .reset_index(drop=True)
    )
    assert out["col_name"].tolist() == ["a", "b", "c"]
    assert out["n_rows"].tolist() == [7, 7, 7]
    assert out["n_nulls"].tolist() == [1, 2, 0]
    # distinct NON-NULL values, deduplicated across batches
    assert out["n_distinct"].tolist() == [3, 3, 1]


def test_grouped_moments_zero_variance_yields_null(ray_session):
    """Singleton / constant groups: SQL x/0.0 is NULL in DuckDB — skew and
    kurtosis must be null, never nan/inf."""
    from airbyte_destination_ray.pipelines.ops import grouped_moments

    t = pa.table(
        {
            "g": pa.array(["solo", "const", "const", "varied", "varied",
                           "varied"]),
            "v": pa.array([5.0, 2.0, 2.0, 1.0, 4.0, 9.0]),
        }
    )
    out = (
        grouped_moments(_ds(t, 2), key="g", value_col="v", num_partitions=3)
        .to_pandas()
        .set_index("g")
    )
    assert out.loc["solo", "var_pop"] == 0.0
    assert pd.isna(out.loc["solo", "skew_pop"])
    assert pd.isna(out.loc["solo", "kurt_pop"])
    assert pd.isna(out.loc["const", "skew_pop"])
    assert not pd.isna(out.loc["varied", "skew_pop"])


def test_unpivot_matches_union_all(ray_session):
    from airbyte_destination_ray.pipelines.ops import unpivot

    t = pa.table(
        {
            "id": pa.array([1, 2], type=pa.int64()),
            "x": pa.array([1.5, None]),
            "y": pa.array([10, 20], type=pa.int64()),
        }
    )
    out = (
        unpivot(_ds(t, 2), id_cols=["id"], value_cols=["x", "y"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    assert out["variable"].tolist() == ["x", "y", "x", "y"]
    assert out["value"].tolist()[0] == 1.5 and out["value"].tolist()[1] == 10.0
    assert pd.isna(out["value"][2]) and out["value"][3] == 20.0


def test_grouped_trend_matches_lstsq(ray_session):
    """OLS slope/intercept from integer power sums equals numpy polyfit on
    exact data; constant-x keys get NULL slope."""
    import numpy as np
    import ray.data

    from airbyte_destination_ray.pipelines.ops import grouped_trend

    x = np.arange(50, dtype=np.int64)
    rows = {
        "k": ["lin"] * 50 + ["flat"] * 50 + ["const_x"] * 3,
        "x": np.concatenate([x, x, [7, 7, 7]]),
        "y": np.concatenate([3 * x + 11, np.full(50, 42), [1, 2, 3]]),
    }
    t = pa.table(
        {
            "k": pa.array(rows["k"]),
            "x": pa.array(rows["x"], type=pa.int64()),
            "y": pa.array(rows["y"], type=pa.int64()),
        }
    )
    out = (
        grouped_trend(
            ray.data.from_arrow(t).repartition(4), key="k", x_col="x", y_col="y"
        )
        .to_pandas()
        .set_index("k")
    )
    assert out.loc["lin", "slope"] == 3.0
    assert out.loc["lin", "intercept"] == 11.0
    assert out.loc["flat", "slope"] == 0.0
    assert out.loc["flat", "intercept"] == 42.0
    assert np.isnan(out.loc["const_x", "slope"])  # den = 0 → NULL
    assert out.n.to_dict() == {"lin": 50, "flat": 50, "const_x": 3}


# --- trimmed mean ---------------------------------------------------------


def test_trimmed_mean_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.ops import trimmed_mean_by_key

    rng = np.random.default_rng(23)
    n = 700
    t = pa.table(
        {
            "k": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
            ),
            "v": pa.array(
                np.where(
                    rng.uniform(size=n) < 0.05,
                    None,
                    np.round(rng.uniform(0, 50, n), 3),
                ),
                type=pa.float64(),
                from_pandas=True,
            ),
        }
    )
    out = trimmed_mean_by_key(_ds(t), key="k", value_col="v", lo=0.1, hi=0.9)
    _assert_matches(
        out,
        """
        WITH b AS (
            SELECT k, quantile_disc(v, 0.1) AS lo,
                   quantile_disc(v, 0.9) AS hi
            FROM t WHERE v IS NOT NULL GROUP BY k)
        SELECT t.k,
               CAST(count(*) FILTER (WHERE v BETWEEN lo AND hi) AS BIGINT)
                   AS n_kept,
               CAST(sum(CAST(floor(v * 100) AS BIGINT))
                   FILTER (WHERE v BETWEEN lo AND hi) AS BIGINT)
                   AS kept_cents,
               CAST(sum(CAST(floor(v * 100) AS BIGINT))
                   FILTER (WHERE v BETWEEN lo AND hi) AS DOUBLE)
                   / count(*) FILTER (WHERE v BETWEEN lo AND hi)
                   AS trimmed_mean_cents
        FROM t JOIN b USING (k) WHERE v IS NOT NULL GROUP BY t.k
        """,
        {"t": t},
    )


def test_trimmed_mean_single_value_key(ray_session):
    """A one-row key: both bounds equal the value, the row is kept."""
    from airbyte_destination_ray.pipelines.ops import trimmed_mean_by_key

    t = pa.table(
        {"k": pa.array(["x"]), "v": pa.array([7.25])}
    )
    out = trimmed_mean_by_key(
        _ds(t, blocks=1), key="k", value_col="v"
    ).take_all()
    assert out == [
        {
            "k": "x",
            "n_kept": 1,
            "kept_cents": 725,
            "trimmed_mean_cents": 725.0,
        }
    ]


# --- skyline ---------------------------------------------------------------


def test_skyline_vs_bruteforce(ray_session):
    from airbyte_destination_ray.pipelines.ops import skyline

    rng = np.random.default_rng(3)
    n = 900
    v = np.round(rng.uniform(0, 100, n), 2)
    ts = rng.integers(0, 10_000, n).astype(np.int64)
    t = pa.table(
        {
            "id": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(v),
            "ts": pa.array(ts),
        }
    )
    out = skyline(_ds(t), x="v", y="ts", columns=["id", "v", "ts"])
    keep = []
    for i in range(n):
        dominated = np.any(
            (v >= v[i])
            & (ts >= ts[i])
            & ((v > v[i]) | (ts > ts[i]))
        )
        if not dominated:
            keep.append(i)
    assert sorted(out.column("id").to_pylist()) == keep


def test_skyline_duplicate_points_all_kept(ray_session):
    """Identical points never dominate each other; dominated duplicates
    all drop; null coordinates are excluded."""
    from airbyte_destination_ray.pipelines.ops import skyline

    t = pa.table(
        {
            "id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
            "v": pa.array([5.0, 5.0, 1.0, 1.0, 9.0, None]),
            "ts": pa.array([10, 10, 3, 3, 10, 99], type=pa.int64()),
        }
    )
    out = skyline(_ds(t, blocks=2), x="v", y="ts", columns=["id", "v", "ts"])
    assert sorted(out.column("id").to_pylist()) == [4]

    t2 = pa.table(
        {
            "id": pa.array([0, 1, 2], type=pa.int64()),
            "v": pa.array([5.0, 5.0, 1.0]),
            "ts": pa.array([10, 10, 3], type=pa.int64()),
        }
    )
    out2 = skyline(_ds(t2, blocks=2), x="v", y="ts", columns=["id", "v", "ts"])
    assert sorted(out2.column("id").to_pylist()) == [0, 1]


def test_skyline_candidate_cap_raises(ray_session):
    from airbyte_destination_ray.pipelines.ops import skyline

    # anti-correlated dims: every point is on the frontier
    n = 50
    t = pa.table(
        {
            "id": pa.array(np.arange(n), type=pa.int64()),
            "v": pa.array(np.arange(n, dtype=np.float64)),
            "ts": pa.array(np.arange(n)[::-1].copy(), type=pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="candidate set"):
        skyline(
            _ds(t, blocks=2),
            x="v",
            y="ts",
            columns=["id", "v", "ts"],
            max_candidates=10,
        )


HHI_SQL = """
    WITH c AS (
        SELECT k, m, CAST(count(*) AS BIGINT) AS n FROM t
        WHERE k IS NOT NULL AND m IS NOT NULL
        GROUP BY k, m
    )
    SELECT k, CAST(sum(n * n) AS BIGINT) AS sum_sq,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE)
               / (CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)
                  * CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)) AS hhi
    FROM c GROUP BY k
"""


def test_hhi_by_key_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.ops import hhi_by_key

    t = pa.table(
        {
            "k": pa.array(
                ["a", "a", "a", "b", "b", "b", "c", "c", "c", None, "d"],
                type=pa.string(),
            ),
            "m": pa.array(
                [1, 1, 1, 1, 2, 3, 1, 1, 2, 1, None], type=pa.int64()
            ),
        }
    )
    out = hhi_by_key(_ds(t, blocks=4), key="k", member_col="m",
                     num_partitions=3)
    _assert_matches(out, HHI_SQL, {"t": t})
    got = {
        r["k"]: r["hhi"]
        for r in out.to_pandas().to_dict("records")
    }
    assert got["a"] == 1.0  # one member owns the group
    assert abs(got["b"] - 3.0 / 9.0) < 1e-15  # uniform over 3 members
    assert abs(got["c"] - 5.0 / 9.0) < 1e-15
    assert "d" not in got  # null member was its only row


def test_hhi_by_key_random_vs_sql(ray_session):
    from airbyte_destination_ray.pipelines.ops import hhi_by_key

    rng = np.random.default_rng(7)
    n = 2000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 8, n), type=pa.int64()),
            "m": pa.array(rng.zipf(1.5, n) % 20, type=pa.int64()),
        }
    )
    out = hhi_by_key(_ds(t, blocks=5), key="k", member_col="m",
                     num_partitions=4)
    _assert_matches(out, HHI_SQL, {"t": t})


SOURCE_GATE_SQL = r"""
    WITH s AS (
        SELECT source,
               CAST(length(text) AS BIGINT) AS c,
               CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS a
        FROM documents
    ), per AS (
        SELECT source, sum(c) AS sc, sum(a) AS sa, count(c) AS v
        FROM s GROUP BY source
    ), tot AS (SELECT sum(c) AS tc, sum(a) AS ta FROM s),
    ok AS (
        SELECT source FROM per, tot
        WHERE source IS NOT NULL AND v > 0 AND sa * tc >= ta * sc
    )
    SELECT d.* FROM documents d JOIN ok USING (source)
"""


def test_source_quality_gate_matches_sql(ray_session):
    from airbyte_destination_ray.pipelines.ops import source_quality_gate

    t = pa.table(
        {
            "doc_id": pa.array(list(range(10)), type=pa.int64()),
            "source": pa.array(
                ["good", "good", "bad", "bad", "mid", "mid",
                 None, "nulls", "nulls", "good"],
                type=pa.string(),
            ),
            "text": pa.array(
                ["clean prose here", "more words", "12345 67890",
                 "999 000 111", "half 12345 clean", "words 99",
                 "orphan text", None, None, "all alphabetic text"],
                type=pa.string(),
            ),
        }
    )
    out = source_quality_gate(
        _ds(t, blocks=4), source_col="source", text_col="text"
    )
    _assert_matches(out, SOURCE_GATE_SQL, {"documents": t})
    kept = set(out.to_pandas()["source"])
    assert "good" in kept and "bad" not in kept
    assert "nulls" not in kept  # zero non-null texts -> rejected
