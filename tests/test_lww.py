"""LWW compact kernel tests (no Ray needed) — reference semantics A1.

Golden behaviors pinned by the reference e2e suite (e2e/main_test.go:86-105):
per PK keep the max-version row; later arrival (higher seq) wins version
ties; out-of-order arrival is tolerated because LWW picks max version, not
last-seen.
"""

import pyarrow as pa

from airbyte_destination_ray.stages.lww import changes_to_lake_rows, lww_compact


def t(rows):
    return pa.table(
        {
            "url": [r[0] for r in rows],
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "_seq": pa.array([r[2] for r in rows], pa.int64()),
            "_deleted": pa.array([r[3] if len(r) > 3 else False for r in rows]),
            "text": [r[4] if len(r) > 4 else f"{r[0]}@{r[1]}" for r in rows],
        }
    )


def test_max_version_wins_regardless_of_arrival_order():
    # the reference fixture has non-monotonic emitted_at; LWW must pick max
    # version, not last-seen (SURVEY §2.7 ordering assumptions)
    inp = t([("a", 200, 0), ("a", 100, 1), ("a", 150, 2)])
    out = lww_compact(inp, "url", "warc_ts")
    assert out.num_rows == 1
    assert out.column("warc_ts")[0].value == 200


def test_seq_breaks_version_ties():
    inp = t([("a", 100, 5, False, "later"), ("a", 100, 3, False, "earlier")])
    out = lww_compact(inp, "url", "warc_ts")
    assert out.column("text").to_pylist() == ["later"]


def test_tombstone_wins_and_is_droppable():
    inp = t([("a", 100, 0), ("a", 200, 1, True), ("b", 50, 2)])
    kept = lww_compact(inp, "url", "warc_ts")
    assert kept.num_rows == 2  # tombstone row retained in snapshot
    visible = lww_compact(inp, "url", "warc_ts", drop_tombstones=True)
    assert visible.column("url").to_pylist() == ["b"]


def test_late_older_update_cannot_resurrect_deleted_key():
    # D at ts=200 then a late U at ts=150: tombstone still wins
    inp = t([("a", 100, 0), ("a", 200, 1, True), ("a", 150, 2)])
    out = lww_compact(inp, "url", "warc_ts", drop_tombstones=True)
    assert out.num_rows == 0


def test_compact_is_associative():
    rows = [("a", 100, 0), ("a", 300, 1), ("b", 10, 2), ("a", 200, 3), ("b", 20, 4)]
    whole = lww_compact(t(rows), "url", "warc_ts")
    left = lww_compact(t(rows[:2]), "url", "warc_ts")
    right = lww_compact(t(rows[2:]), "url", "warc_ts")
    recombined = lww_compact(pa.concat_tables([left, right]), "url", "warc_ts")
    assert whole.sort_by("url").equals(recombined.sort_by("url"))


def test_output_sorted_by_pk():
    rows = [("z", 1, 0), ("a", 1, 1), ("m", 1, 2)]
    out = lww_compact(t(rows), "url", "warc_ts")
    assert out.column("url").to_pylist() == ["a", "m", "z"]


def test_changes_to_lake_rows():
    changes = pa.table(
        {
            "seq": pa.array([7, 8], pa.int64()),
            "epoch": pa.array([0, 0], pa.int32()),
            "op": ["I", "D"],
            "url": ["a", "b"],
            "warc_ts": pa.array([1, 2], pa.timestamp("us")),
        }
    )
    lake = changes_to_lake_rows(changes, ["url", "warc_ts"])
    assert lake.column_names == ["url", "warc_ts", "_seq", "_deleted"]
    assert lake.column("_deleted").to_pylist() == [False, True]
    assert lake.column("_seq").to_pylist() == [7, 8]
