"""Property-based tests (hypothesis) for the LWW merge kernel — the
algebraic properties the engine's correctness depends on:

- equivalence to a brute-force per-key argmax reference,
- associativity/commutativity (what makes the pre-reduce and the salted
  two-stage reduce safe),
- idempotence (what makes replay/compaction safe).
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from airbyte_destination_ray.stages.lww import lww_compact

events = st.lists(
    st.tuples(
        st.integers(0, 5),     # key
        st.integers(0, 10),    # version
    ),
    min_size=0,
    max_size=40,
)


def to_table(rows):
    """rows = [(key, ver)], seq = list index (arrival order, unique)."""
    return pa.table(
        {
            "url": pa.array([f"k{k}" for k, _ in rows], type=pa.string()),
            "warc_ts": pa.array([v for _, v in rows], type=pa.int64()),
            "_seq": pa.array(range(len(rows)), type=pa.int64()),
        }
    )


def brute_force(rows):
    """Reference semantics: per key, keep max (ver, seq)."""
    best = {}
    for seq, (k, v) in enumerate(rows):
        if k not in best or (v, seq) > (best[k][0], best[k][1]):
            best[k] = (v, seq)
    return {f"k{k}": (v, s) for k, (v, s) in best.items()}


def compact_to_dict(t):
    out = {}
    for r in t.to_pylist():
        out[r["url"]] = (r["warc_ts"], r["_seq"])
    return out


@settings(max_examples=200, deadline=None)
@given(events)
def test_matches_brute_force(rows):
    got = compact_to_dict(lww_compact(to_table(rows), "url", "warc_ts"))
    assert got == brute_force(rows)


@settings(max_examples=200, deadline=None)
@given(events, st.integers(0, 40))
def test_split_merge_associativity(rows, split):
    """compact(compact(A) ∪ compact(B)) == compact(A ∪ B) for any split —
    the property that makes per-batch pre-reduce and salted sub-partition
    reduce correct."""
    split = min(split, len(rows))
    t = to_table(rows)
    a, b = t.slice(0, split), t.slice(split)
    two_stage = lww_compact(
        pa.concat_tables(
            [lww_compact(a, "url", "warc_ts"), lww_compact(b, "url", "warc_ts")]
        ),
        "url",
        "warc_ts",
    )
    one_stage = lww_compact(t, "url", "warc_ts")
    assert compact_to_dict(two_stage) == compact_to_dict(one_stage)


@settings(max_examples=100, deadline=None)
@given(events)
def test_idempotent(rows):
    once = lww_compact(to_table(rows), "url", "warc_ts")
    twice = lww_compact(once, "url", "warc_ts")
    assert once.equals(twice)


@settings(max_examples=100, deadline=None)
@given(events)
def test_order_invariant(rows):
    """Shuffling arrival blocks does not change the result (seq carries
    arrival order explicitly, so physical row order is irrelevant)."""
    t = to_table(rows)
    if t.num_rows > 1:
        perm = np.random.default_rng(0).permutation(t.num_rows)
        shuffled = t.take(pa.array(perm))
        assert compact_to_dict(
            lww_compact(shuffled, "url", "warc_ts")
        ) == compact_to_dict(lww_compact(t, "url", "warc_ts"))
