"""Write-audit-publish (WAP): staged generations are invisible to readers
until the atomic publish flip; abort cleans up fully; vacuum never reclaims
the pinned published generation."""

import pyarrow as pa
import pytest

from airbyte_destination_ray.pipelines.cdc import (
    read_table_arrow,
    run_cdc_sync,
    wap_abort,
    wap_begin,
    wap_publish,
)
from airbyte_destination_ray.sources.synth import write_custom_binlog
from airbyte_destination_ray.state.manifest import ManifestStore


def _rows(lake, **kw):
    t = read_table_arrow(lake, "pages", **kw)
    if t.num_rows == 0:
        return []
    return sorted(
        zip(t.column("url").to_pylist(), t.column("text").to_pylist())
    )


@pytest.fixture()
def staged_lake(tmp_path, ray_session):
    b1 = str(tmp_path / "b1")
    write_custom_binlog(b1, [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=1, text="v1", lang="en", html=b""),
        dict(seq=1, epoch=0, op="I", url="b", warc_ts=1, text="v1", lang="en", html=b""),
    ])
    b2 = str(tmp_path / "b2")
    write_custom_binlog(b2, [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=2, text="v2", lang="en", html=b""),
        dict(seq=1, epoch=0, op="I", url="c", warc_ts=2, text="v2", lang="en", html=b""),
    ])
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, b1, num_partitions=2)
    return lake, b2


def test_staged_sync_invisible_until_publish(staged_lake):
    lake, b2 = staged_lake
    published = _rows(lake)
    assert published == [("a", "v1"), ("b", "v1")]

    info = wap_begin(lake, "pages")
    assert info["staged"] == info["published"] + 1
    # the staged rebuild runs while readers keep seeing the published state
    run_cdc_sync(lake, b2, num_partitions=2)
    assert _rows(lake) == published
    # the audit view sees the staged state
    assert _rows(lake, staging=True) == [("a", "v2"), ("c", "v2")]
    # double-begin refuses
    with pytest.raises(RuntimeError):
        wap_begin(lake, "pages")

    wap_publish(lake, "pages")
    assert _rows(lake) == [("a", "v2"), ("c", "v2")]
    meta = ManifestStore(lake, "pages").table_meta()
    assert "published_generation" not in meta


def test_abort_reverts_and_cleans_staging(staged_lake):
    lake, b2 = staged_lake
    published = _rows(lake)
    staged_gen = wap_begin(lake, "pages")["staged"]
    run_cdc_sync(lake, b2, num_partitions=2)
    report = wap_abort(lake, "pages")
    assert report["aborted_generation"] == staged_gen
    assert _rows(lake) == published

    store = ManifestStore(lake, "pages")
    assert not (store.root / f"gen={staged_gen:04d}").exists()
    assert not any(
        p.name.startswith(f"g{staged_gen:04d}-")
        for p in store.manifest_dir.iterdir()
    )
    # re-staging starts clean: the aborted generation's checkpoints are gone,
    # so a new staged sync re-runs its epochs instead of "resuming" past them
    wap_begin(lake, "pages")
    run_cdc_sync(lake, b2, num_partitions=2)
    wap_publish(lake, "pages")
    assert _rows(lake) == [("a", "v2"), ("c", "v2")]
    # abort with nothing staged refuses
    with pytest.raises(RuntimeError):
        wap_abort(lake, "pages")


def test_vacuum_keeps_pinned_published_generation(staged_lake):
    lake, b2 = staged_lake
    published = _rows(lake)
    wap_begin(lake, "pages")
    run_cdc_sync(lake, b2, num_partitions=2)
    store = ManifestStore(lake, "pages")
    # a vacuum during the WAP window must NOT reclaim the published gen
    report = store.vacuum(keep_generations=0)
    assert report["removed_generation_dirs"] == 0
    assert _rows(lake) == published
    wap_publish(lake, "pages")
    # after publish the superseded generation is reclaimable again
    report = store.vacuum(keep_generations=0)
    assert report["removed_generation_dirs"] == 1
    assert _rows(lake) == [("a", "v2"), ("c", "v2")]
