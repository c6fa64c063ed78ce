"""Exactly-once under failures: partial writes, duplicate concurrent tasks,
crashed-and-retried epochs (SURVEY §4 retry row — sink idempotence comes
from the manifest CAS, never from in-flight dedup)."""

from __future__ import annotations

import threading
from pathlib import Path

import pyarrow as pa
import pytest

from airbyte_destination_ray.pipelines.cdc import (
    read_table_arrow,
    run_cdc_sync,
)
from airbyte_destination_ray.sources.synth import synthesize_binlog
from airbyte_destination_ray.stages.lww import make_partition_merger
from airbyte_destination_ray.state.manifest import ManifestStore


@pytest.fixture(scope="module")
def binlog(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("ft_binlog")
    synthesize_binlog(d, n_events=1200, n_keys=300, n_epochs=2, seed=9)
    return str(d)


def test_stray_partial_files_are_invisible(binlog, tmp_path):
    """A crashed task's leftover .tmp file (atomic write = tmp + rename)
    must never be read back or break a resume."""
    lake = tmp_path / "lake"
    run_cdc_sync(str(lake), binlog, num_partitions=4, epochs=[0])
    before = read_table_arrow(str(lake), "pages")
    # simulate a crash mid-write: stray tmp files in a partition directory
    part_dir = next((lake / "pages").glob("gen=*/parts/p=*"))
    (part_dir / "garbage.tmp").write_bytes(b"\x00" * 128)
    run_cdc_sync(str(lake), binlog, num_partitions=4)  # resume epoch 1
    after = read_table_arrow(str(lake), "pages")
    assert after.num_rows >= before.num_rows
    # stray file still there, never parsed (only manifest-listed files load)
    assert (part_dir / "garbage.tmp").exists()


def test_concurrent_duplicate_merge_tasks_commit_once(binlog, tmp_path):
    """Two copies of the same (epoch, partition) merge task racing (Ray
    speculative retry shape): exactly one manifest commit; both report the
    same final state; the lake equals a clean single-task run."""
    lake_a = tmp_path / "race"
    lake_b = tmp_path / "clean"
    run_cdc_sync(str(lake_b), binlog, num_partitions=2, epochs=[0])

    # build the same group input a merge task would receive
    import duckdb

    from airbyte_destination_ray.functions.hashing import partition_ids
    from airbyte_destination_ray.stages.lww import changes_to_lake_rows

    env = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{binlog}/segment-e00000-*.parquet') ORDER BY seq"
    ).arrow()
    rows = changes_to_lake_rows(env, ["url", "warc_ts", "html", "text", "lang"])
    parts = partition_ids(rows.column("url"), 2)
    store = ManifestStore(str(lake_a), "pages")
    store.root.mkdir(parents=True, exist_ok=True)
    store.init_table(num_partitions=2, mode="append_dedup", pk=["url"], cursor="warc_ts")

    merger = make_partition_merger(
        str(lake_a), "pages", generation=0, epoch=0, mode="append_dedup",
        pk="url", ver="warc_ts",
    )
    results = {}

    def run(tag, group):
        results[tag] = merger(group)

    for p in (0, 1):
        group = rows.filter(pa.array(parts == p)).append_column(
            "_part", pa.array([p] * int((parts == p).sum()), type=pa.int64())
        )
        t1 = threading.Thread(target=run, args=(f"{p}a", group))
        t2 = threading.Thread(target=run, args=(f"{p}b", group))
        t1.start(); t2.start(); t1.join(); t2.join()
        ra, rb = results[f"{p}a"], results[f"{p}b"]
        # both tasks converge on the same committed state
        assert ra.column("rows").to_pylist() == rb.column("rows").to_pylist()
        assert ra.column("digest").to_pylist() == rb.column("digest").to_pylist()
        # exactly one manifest for (gen 0, epoch 0, partition p)
        ms = [m for m in store._iter_manifests(0) if m.partition == p]
        assert len(ms) == 1

    # lake content equals the clean run (deletes retained as tombstones
    # internally; compare the read view)
    a = read_table_arrow(str(lake_a), "pages").sort_by("url")
    b = read_table_arrow(str(lake_b), "pages").sort_by("url")
    assert a.equals(b)


def test_fsck_clean_then_detects_missing_and_orphans(binlog, tmp_path):
    """fsck on a healthy lake: ok, no findings.  After deleting one
    referenced file: missing + ok=False.  After dropping an unreferenced
    parquet into the generation dir: reported as orphan (still ok)."""
    import pathlib

    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.state.manifest import ManifestStore

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=4)
    store = ManifestStore(lake, "pages")
    rep = store.fsck()
    assert rep["ok"] and not rep["missing"] and not rep["rowcount_mismatches"]

    # orphan: an unreferenced parquet in the current generation dir
    meta = store.table_meta()
    gen_dir = (
        pathlib.Path(lake) / "pages" / f"gen={meta['generation']:04d}" / "parts" / "p=00000"
    )
    orphan = gen_dir / "stray.parquet"
    orphan.write_bytes(b"not really parquet")
    rep2 = store.fsck()
    # orphans = the stray file PLUS superseded epoch-0 snapshot files
    # (exactly what vacuum would reclaim); a healthy lake stays ok
    rel = str(orphan.relative_to(pathlib.Path(lake)))
    assert rep2["ok"] and rel in rep2["orphans"]

    # missing: delete one referenced file
    ref = store.committed_files_versioned(
        meta["generation"], mode=meta["mode"]
    )[0][0]
    (pathlib.Path(lake) / ref).unlink()
    rep3 = store.fsck()
    assert not rep3["ok"] and ref in rep3["missing"]
