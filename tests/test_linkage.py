"""Fuzzy string matching (pipelines/linkage.py): the vectorized
Levenshtein kernel vs DuckDB's levenshtein(), and deletion-neighborhood
blocking completeness vs an all-pairs brute-force oracle on a dense
random vocabulary (where any missed candidate bucket would show up)."""

from __future__ import annotations

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rand_words(seed: int, n: int, alpha: str, lo: int, hi: int) -> list[str]:
    random.seed(seed)
    return list(
        {
            "".join(random.choices(alpha, k=random.randint(lo, hi)))
            for _ in range(n)
        }
    )


def test_levenshtein_kernel_matches_duckdb(ray_session):
    from airbyte_destination_ray.pipelines.linkage import levenshtein_pairs

    random.seed(11)
    pairs = [
        (
            "".join(random.choices("abcd", k=random.randint(0, 9))),
            "".join(random.choices("abcd", k=random.randint(0, 9))),
        )
        for _ in range(300)
    ]
    a = pa.array([p[0] for p in pairs])
    b = pa.array([p[1] for p in pairs])
    got = list(levenshtein_pairs(a, b))
    con = duckdb.connect()
    exp = [
        con.execute("SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
        for x, y in pairs
    ]
    assert got == exp


def _brute(words: list[str], max_dist: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("w", pa.table({"w": pa.array(words)}))
    return con.execute(
        f"""
        WITH wf AS (SELECT w FROM w
                    WHERE length(w) >= {max_dist + 1} AND length(w) <= 32)
        SELECT a.w AS word_a, b.w AS word_b,
               CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
        FROM wf a JOIN wf b ON a.w < b.w
        WHERE levenshtein(a.w, b.w) <= {max_dist}
        """
    ).df()


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["word_a", "word_b"]).reset_index(drop=True)[
        ["word_a", "word_b", "dist"]
    ]


@pytest.mark.parametrize("max_dist", [1, 2])
def test_fuzzy_pairs_complete_vs_brute_force(ray_session, max_dist):
    """Dense small-alphabet vocabulary: every within-distance pair must
    surface (blocking completeness) and none beyond (exact verify);
    duplicates in the input collapse (internal DISTINCT)."""
    import ray.data
    from airbyte_destination_ray.pipelines.linkage import fuzzy_pairs

    words = _rand_words(5 + max_dist, 250, "abc", 1, 6)
    vals = words * 2
    random.shuffle(vals)
    ds = ray.data.from_arrow(
        pa.table({"w": pa.array(vals, type=pa.string())})
    ).repartition(4)
    got = fuzzy_pairs(ds, word_col="w", max_dist=max_dist).to_pandas()
    exp = _brute(words, max_dist)
    assert len(exp) > 20  # the corpus must actually exercise the join
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(exp), check_dtype=False
    )


def test_fuzzy_pairs_envelope_and_repeats(ray_session):
    """Repeated characters reach the same variant via different deletion
    ordinals (local dedup must absorb that); words at the short/long
    envelope bounds are excluded exactly as documented."""
    import ray.data
    from airbyte_destination_ray.pipelines.linkage import fuzzy_pairs

    words = ["aaaa", "aaab", "ab", "a", "", "x" * 33, "aabb", None]
    ds = ray.data.from_arrow(pa.table({"w": pa.array(words)}))
    got = fuzzy_pairs(ds, word_col="w", max_dist=2).to_pandas()
    exp = _brute([w for w in words if w is not None], 2)
    pd.testing.assert_frame_equal(
        _sorted(got), _sorted(exp), check_dtype=False
    )
    # the distance-2 triangle among the length-4 words survives whole
    assert {"aaaa", "aaab", "aabb"} <= set(got["word_a"]) | set(
        got["word_b"]
    )
