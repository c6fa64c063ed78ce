"""dedup_exact_incremental: stream-ordered exact dedup against persistent
per-partition fingerprint state (the CDC × dedup crossover)."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

import ray

from airbyte_destination_ray.pipelines.dedup import dedup_exact_incremental
from airbyte_destination_ray.pipelines.ops import dedup_exact


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    ).repartition(2)


def _df(ds):
    return (
        ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


EPOCH1 = [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma")]
EPOCH2 = [(5, "beta"), (6, "delta"), (7, "delta"), (8, "epsilon")]


def _state_digest(state: Path) -> str:
    h = hashlib.sha256()
    for p in sorted(state.glob("part-*.parquet")):
        h.update(p.name.encode())
        h.update(p.read_bytes())
    return h.hexdigest()


def test_two_increments_equal_one_shot(ray_session, tmp_path):
    """Id-ordered increments reproduce the one-shot min-id dedup."""
    state = tmp_path / "state"
    s1 = _df(dedup_exact_incremental(_docs(EPOCH1), str(state)))
    s2 = _df(dedup_exact_incremental(_docs(EPOCH2), str(state)))
    got = (
        pd.concat([s1, s2]).sort_values("doc_id").reset_index(drop=True)
    )
    want = _df(
        dedup_exact(_docs(EPOCH1 + EPOCH2), on="text", keep_by="doc_id")
    )
    pd.testing.assert_frame_equal(got, want)


def test_replay_is_idempotent(ray_session, tmp_path):
    """Re-running an already-committed increment emits the same survivors
    and leaves the state files byte-identical."""
    state = tmp_path / "state"
    _df(dedup_exact_incremental(_docs(EPOCH1), str(state)))
    s2a = _df(dedup_exact_incremental(_docs(EPOCH2), str(state)))
    d_before = _state_digest(state)
    s2b = _df(dedup_exact_incremental(_docs(EPOCH2), str(state)))
    pd.testing.assert_frame_equal(s2a, s2b)
    assert _state_digest(state) == d_before


def test_earlier_increment_wins_over_smaller_id(ray_session, tmp_path):
    """Stream-order semantics: a LATER increment's duplicate is dropped
    even when its id is smaller than the state winner's."""
    state = tmp_path / "state"
    s1 = _df(
        dedup_exact_incremental(_docs([(100, "seen"), (101, "kept1")]), str(state))
    )
    s2 = _df(
        dedup_exact_incremental(_docs([(1, "seen"), (2, "fresh")]), str(state))
    )
    assert s1.doc_id.tolist() == [100, 101]
    assert s2.doc_id.tolist() == [2]


def test_shuffle_filter_mode_matches_broadcast(ray_session, tmp_path):
    """filter_mode="shuffle" (distributed anti-join) gives the same
    survivors; each increment is materialized before the next so the
    deferred state commit is ordered."""
    out = {}
    for mode in ("broadcast", "shuffle"):
        state = tmp_path / f"state_{mode}"
        s1 = dedup_exact_incremental(
            _docs(EPOCH1), str(state), filter_mode=mode
        ).materialize()
        s2 = dedup_exact_incremental(
            _docs(EPOCH2), str(state), filter_mode=mode
        ).materialize()
        out[mode] = pd.concat([_df(s1), _df(s2)]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out["broadcast"], out["shuffle"])


def test_partitioning_mismatch_refused(ray_session, tmp_path):
    state = tmp_path / "state"
    _df(dedup_exact_incremental(_docs(EPOCH1), str(state), num_partitions=8))
    with pytest.raises(ValueError, match="refusing to resume"):
        dedup_exact_incremental(_docs(EPOCH2), str(state), num_partitions=16)


# ---------------------------------------------------------------------------
# dedup_minhash_incremental: near-dup dedup vs persistent signature state
# ---------------------------------------------------------------------------


def _mk_corpus(n, seed=13):
    import numpy as np

    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    docs = []
    for d in range(n):
        toks = [words[rng.integers(0, 50)] for _ in range(25)]
        docs.append((d, " ".join(toks)))
    return docs


def test_minhash_incremental_matches_one_shot(ray_session, tmp_path):
    """id-ordered increments == one-shot dedup_minhash_lsh over the full
    corpus (same params), including near-dups planted ACROSS increments;
    replaying the last increment is byte-identical and leaves the state
    unchanged."""
    from airbyte_destination_ray.pipelines.dedup import (
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    base = _mk_corpus(90)
    # near-copies across increment boundaries: docs 100..104 copy docs
    # 5..9 with one word changed (Jaccard high); exact copies 110..112
    # of docs 10..12
    def tweak(t):
        ws = t.split()
        ws[0] = "zzz"
        return " ".join(ws)

    extra = [(100 + i, tweak(base[5 + i][1])) for i in range(5)]
    extra += [(110 + i, base[10 + i][1]) for i in range(3)]
    full = base + extra
    full.sort()
    params = dict(num_perm=64, bands=16, shingle_k=3,
                  verify_threshold=0.5)

    one_shot = sorted(
        r["doc_id"]
        for r in dedup_minhash_lsh(_docs(full), **params).take_all()
    )

    state = str(tmp_path / "state")
    incs = [full[:40], full[40:80], full[80:]]
    got = []
    for inc in incs:
        got += [
            r["doc_id"]
            for r in dedup_minhash_incremental(
                _docs(inc), state, num_partitions=8, **params
            ).take_all()
        ]
    assert sorted(got) == one_shot

    # replay of the last increment: identical survivors, unchanged state
    import hashlib
    from pathlib import Path

    def state_digest():
        h = hashlib.sha256()
        for p in sorted(Path(state).glob("part-*.parquet")):
            h.update(p.read_bytes())
        return h.hexdigest()

    before = state_digest()
    replay = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(
            _docs(incs[-1]), state, num_partitions=8, **params
        ).take_all()
    )
    assert replay == sorted(r for r in got if r in
                            {d for d, _ in incs[-1]})
    assert state_digest() == before

    # param-mismatch resume refused
    with pytest.raises(ValueError):
        dedup_minhash_incremental(
            _docs(incs[-1]), state, num_partitions=8, num_perm=32,
            bands=16, shingle_k=3, verify_threshold=0.5,
        )


def test_minhash_incremental_replay_with_internal_dups(
    ray_session, tmp_path
):
    """The review-confirmed repro: an increment containing IDENTICAL docs
    must keep the min id on BOTH the first run and a full replay — the
    state probe must not let replayed docs match their own increment's
    committed partners (that dropped the whole duplicate class)."""
    from airbyte_destination_ray.pipelines.dedup import (
        dedup_minhash_incremental,
    )

    text = " ".join(f"t{i}" for i in range(20))
    inc = [(1, text), (2, text)]
    state = str(tmp_path / "state")
    params = dict(num_perm=32, bands=8, shingle_k=3,
                  verify_threshold=1.0, num_partitions=4)

    first = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(
            _docs(inc), state, **params
        ).take_all()
    )
    assert first == [1]
    replay = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(
            _docs(inc), state, **params
        ).take_all()
    )
    assert replay == [1]

    # a LATER increment near-identical to the kept doc still drops
    later = sorted(
        r["doc_id"]
        for r in dedup_minhash_incremental(
            _docs([(7, text)]), state, **params
        ).take_all()
    )
    assert later == []
