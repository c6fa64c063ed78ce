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


def _shingle_set(text: str, k: int):
    import re

    ws = re.split(r"\s+", text.strip())
    if k == 1:
        return set(ws)
    return {tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)}


@pytest.mark.parametrize(
    "threshold,tp,tq,k", [(0.8, 4, 5, 1), (0.8, 4, 5, 3), (0.5, 1, 2, 3)]
)
def test_similarity_join_words_vs_brute_force(
    ray_session, threshold, tp, tq, k
):
    """Prefix filtering is COMPLETE (no missed pair) and verification is
    exact (integer inter/union match set arithmetic) — all-pairs brute
    force over a dense small-vocab corpus where any pruning bug shows."""
    import itertools

    import ray

    from airbyte_destination_ray.pipelines.linkage import (
        similarity_join_words,
    )

    random.seed(23)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        n = random.randint(1, 12)
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(
                    random.choice(vocab) for _ in range(n)
                ),
            }
        )
    for i in range(0, 120, 11):  # planted near-copies
        rows.append(
            {
                "doc_id": 1000 + i,
                "text": rows[i]["text"] + " " + random.choice(vocab),
            }
        )
    rows.append({"doc_id": 5000, "text": None})
    rows.append({"doc_id": 5001, "text": "   "})
    rows.append({"doc_id": 5002, "text": ""})

    expected = {}
    valid = [
        (r["doc_id"], _shingle_set(r["text"], k))
        for r in rows
        if r["text"] is not None
    ]
    valid = [(i, s) for i, s in valid if s]
    for (ia, sa), (ib, sb) in itertools.combinations(sorted(valid), 2):
        c = len(sa & sb)
        if c * (tp + tq) >= tp * (len(sa) + len(sb)):
            expected[(ia, ib)] = (c, len(sa | sb))

    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter_words"], r["union_words"])
        for r in similarity_join_words(
            ds, threshold=threshold, shingle_k=k, num_partitions=8
        ).take_all()
    }
    assert got == expected


def test_similarity_join_empty_and_no_pairs(ray_session):
    import ray

    from airbyte_destination_ray.pipelines.linkage import (
        similarity_join_words,
    )

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["completely different alpha", "nothing shared beta"],
            }
        )
    )
    out = similarity_join_words(ds, threshold=0.9, num_partitions=4)
    assert out.take_all() == []
