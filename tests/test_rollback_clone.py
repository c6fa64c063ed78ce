"""rollback_table (RESTORE analog) and clone_table (shallow clone):
metadata-only rewind / branch, pinned against time-travel reads, a fresh
replay, and divergence-after-clone."""

import pyarrow as pa
import pytest

PARTS = 8


@pytest.fixture(scope="module")
def binlog(tmp_path_factory, ray_session):
    from airbyte_destination_ray.sources.synth import synthesize_binlog

    d = tmp_path_factory.mktemp("binlog_rb")
    synthesize_binlog(d, n_events=2000, n_keys=300, n_epochs=3, seed=11)
    return str(d)


def _state(lake, **kw):
    from airbyte_destination_ray.pipelines.cdc import read_table_arrow

    return read_table_arrow(lake, "pages", **kw).sort_by("url")


def test_rollback_equals_time_travel_then_replays(binlog, tmp_path):
    """rollback(to_epoch=1) == read(as_of_epoch=1); the rewound epochs
    REPLAY on the next sync and land identical to a never-rolled-back
    lake (manifest CAS slots freed)."""
    from airbyte_destination_ray.pipelines.cdc import (
        rollback_table,
        run_cdc_sync,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    full = _state(lake)
    asof1 = _state(lake, as_of_epoch=1)

    res = rollback_table(lake, "pages", 1)
    assert not res["skipped"] and res["removed_manifests"] > 0
    assert _state(lake).equals(asof1)

    # replay: resume from the checkpoint (epoch 1) through the binlog tail
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    assert _state(lake).equals(full)


def test_rollback_to_empty_and_guards(binlog, tmp_path):
    from airbyte_destination_ray.pipelines.cdc import (
        rollback_table,
        run_cdc_sync,
        wap_begin,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)

    # no-op at/after the head
    assert rollback_table(lake, "pages", 2)["skipped"]

    # not-a-checkpoint epoch refused (simulate a missing barrier)
    from airbyte_destination_ray.state.manifest import ManifestStore

    store = ManifestStore(lake, "pages")
    ck1 = store.checkpoint_dir / "g0000-e000001.json"
    payload = ck1.read_bytes()
    ck1.unlink()
    with pytest.raises(ValueError):
        rollback_table(lake, "pages", 1)
    ck1.write_bytes(payload)

    # refused under an open WAP window
    wap_begin(lake, "pages")
    with pytest.raises(RuntimeError):
        rollback_table(lake, "pages", 0)
    from airbyte_destination_ray.pipelines.cdc import wap_abort

    wap_abort(lake, "pages")

    # rewind to empty (schema-less empty table — don't sort)
    from airbyte_destination_ray.pipelines.cdc import read_table_arrow

    res = rollback_table(lake, "pages", -1)
    assert not res["skipped"]
    assert read_table_arrow(lake, "pages").num_rows == 0
    # dry_run reports nothing left to remove
    assert rollback_table(lake, "pages", -1)["skipped"]


def test_clone_reads_equal_then_diverge(binlog, tmp_path):
    """A shallow clone serves the source's exact state (zero data copy),
    keeps its own time travel, and diverges once the clone syncs further
    while the source stays put."""
    from airbyte_destination_ray.pipelines.cdc import (
        clone_table,
        run_cdc_sync,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS, epochs=[0, 1])
    src_state = _state(lake)

    res = clone_table(lake, "pages", "pages_branch")
    assert res["manifests"] > 0

    from airbyte_destination_ray.pipelines.cdc import read_table_arrow

    clone_state = read_table_arrow(lake, "pages_branch").sort_by("url")
    assert clone_state.equals(src_state)
    assert read_table_arrow(lake, "pages_branch", as_of_epoch=0).sort_by(
        "url"
    ).equals(_state(lake, as_of_epoch=0))

    # clone target collision refused
    with pytest.raises(FileExistsError):
        clone_table(lake, "pages", "pages_branch")

    # diverge: sync epoch 2 into the CLONE only; source unchanged
    run_cdc_sync(
        lake, binlog, table="pages_branch", num_partitions=PARTS
    )
    lake2 = str(tmp_path / "lake2")
    run_cdc_sync(lake2, binlog, num_partitions=PARTS)
    full = read_table_arrow(lake2, "pages").sort_by("url")
    branched = read_table_arrow(lake, "pages_branch").sort_by("url")
    assert branched.equals(full)
    assert _state(lake).equals(src_state)


def test_rollback_refuses_after_vacuum_reclaimed_history(binlog, tmp_path):
    """vacuum() keeps manifests but reclaims superseded snapshot files:
    rollback past it must REFUSE (not 'succeed' into an unreadable
    table)."""
    from airbyte_destination_ray.pipelines.cdc import (
        rollback_table,
        run_cdc_sync,
    )
    from airbyte_destination_ray.state.manifest import ManifestStore

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    ManifestStore(lake, "pages").vacuum()
    with pytest.raises(RuntimeError, match="no longer restorable"):
        rollback_table(lake, "pages", 1)
    # the refused rollback mutated nothing: current state still reads
    assert _state(lake).num_rows > 0


def test_clone_is_atomic_and_ignores_stale_tmp(binlog, tmp_path):
    """A stale scratch dir from a crashed clone never blocks a retry,
    and the published clone always has its _meta.json."""
    import os
    from pathlib import Path

    from airbyte_destination_ray.pipelines.cdc import (
        clone_table,
        run_cdc_sync,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS, epochs=[0])
    stale = Path(lake) / f"pages_b.clone-tmp-{os.getpid()}"
    stale.mkdir(parents=True)
    (stale / "junk").write_text("x")
    clone_table(lake, "pages", "pages_b")
    assert (Path(lake) / "pages_b" / "_meta.json").exists()
    assert not stale.exists()
