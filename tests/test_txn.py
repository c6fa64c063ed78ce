"""Multi-table atomic transactions (cross-table WAP): both tables flip at
one commit point; a crash between the commit record and the pin drops is
healed by txn_recover; pre-commit abort reverts everything; post-commit
abort is refused; a failed begin leaves no table staged."""

import json

import pytest

from airbyte_destination_ray.pipelines.cdc import (
    read_table_arrow,
    run_cdc_sync,
    txn_abort,
    txn_begin,
    txn_publish,
    txn_recover,
    wap_begin,
)
from airbyte_destination_ray.sources.synth import write_custom_binlog
from airbyte_destination_ray.state.manifest import ManifestStore


def _rows(lake, table, **kw):
    t = read_table_arrow(lake, table, **kw)
    return sorted(
        zip(t.column("url").to_pylist(), t.column("text").to_pylist())
    )


TABLES = ["alpha", "beta"]


@pytest.fixture()
def two_table_lake(tmp_path, ray_session):
    b1 = str(tmp_path / "b1")
    write_custom_binlog(b1, [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=1, text="v1",
             lang="en", html=b""),
    ])
    b2 = str(tmp_path / "b2")
    write_custom_binlog(b2, [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=2, text="v2",
             lang="en", html=b""),
        dict(seq=1, epoch=0, op="I", url="b", warc_ts=2, text="v2",
             lang="en", html=b""),
    ])
    lake = str(tmp_path / "lake")
    for t in TABLES:
        run_cdc_sync(lake, b1, table=t, num_partitions=2)
    return lake, b2


def _stage_both(lake, b2):
    txn = txn_begin(lake, TABLES)
    for t in TABLES:
        run_cdc_sync(lake, b2, table=t, num_partitions=2)
    return txn


def test_txn_atomic_publish(two_table_lake):
    lake, b2 = two_table_lake
    old = [("a", "v1")]
    new = [("a", "v2"), ("b", "v2")]
    txn = _stage_both(lake, b2)
    # mid-stage: BOTH readers still see the old state; audit sees staged
    for t in TABLES:
        assert _rows(lake, t) == old
        assert _rows(lake, t, staging=True) == new
    txn_publish(lake, txn)
    for t in TABLES:
        assert _rows(lake, t) == new
        assert "published_generation" not in ManifestStore(
            lake, t
        ).table_meta()
    # re-publish is an idempotent no-op
    assert txn_publish(lake, txn)["applied"] == 0


def test_txn_recover_heals_partial_publish(two_table_lake):
    lake, b2 = two_table_lake
    new = [("a", "v2"), ("b", "v2")]
    txn = _stage_both(lake, b2)
    # simulate the crash: write the commit record but drop only ONE pin
    from airbyte_destination_ray.pipelines.cdc import _txn_apply, _txn_dir
    from airbyte_destination_ray.state.manifest import _atomic_write_json

    rec = _txn_dir(lake) / f"{txn['txn_id']}.json"
    _atomic_write_json(rec, {"tables": txn["tables"]})
    _txn_apply(lake, {"alpha": txn["tables"]["alpha"]})
    assert _rows(lake, "alpha") == new  # alpha visible
    assert _rows(lake, "beta") == [("a", "v1")]  # beta still pinned

    healed = txn_recover(lake)
    assert healed[txn["txn_id"]] == 1  # beta applied
    for t in TABLES:
        assert _rows(lake, t) == new
    # record retired; a second recover is a no-op
    assert not rec.exists()
    assert txn_recover(lake) == {}


def test_txn_abort_pre_commit_reverts_both(two_table_lake):
    lake, b2 = two_table_lake
    old = [("a", "v1")]
    txn = _stage_both(lake, b2)
    txn_abort(lake, txn)
    for t in TABLES:
        assert _rows(lake, t) == old
        assert "published_generation" not in ManifestStore(
            lake, t
        ).table_meta()
    # a fresh transaction over the same tables works after the abort
    txn2 = _stage_both(lake, b2)
    txn_publish(lake, txn2)
    for t in TABLES:
        assert _rows(lake, t) == [("a", "v2"), ("b", "v2")]


def test_txn_abort_post_commit_refused(two_table_lake):
    lake, b2 = two_table_lake
    txn = _stage_both(lake, b2)
    txn_publish(lake, txn)
    with pytest.raises(RuntimeError, match="already committed"):
        txn_abort(lake, txn)


def test_txn_begin_all_or_nothing(two_table_lake):
    lake, b2 = two_table_lake
    # beta already mid-WAP → begin over [alpha, beta] must fail AND leave
    # alpha unstaged
    wap_begin(lake, "beta")
    with pytest.raises(RuntimeError):
        txn_begin(lake, TABLES)
    assert "published_generation" not in ManifestStore(
        lake, "alpha"
    ).table_meta()
