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


def test_copartitioned_join_matches_oracle(tmp_path, ray_session):
    """Zero-exchange bucket join: two lake tables under the same key-hash
    layout join per-partition; inner + left match DuckDB; layout mismatch
    refuses."""
    import duckdb

    from airbyte_destination_ray.pipelines.cdc import copartitioned_join

    rows_a = [
        dict(seq=i, epoch=0, op="I", url=f"u{i}", warc_ts=1,
             text=f"a{i}", lang="en", html=b"")
        for i in range(20)
    ] + [  # tombstone u3 + newer version of u4
        dict(seq=100, epoch=0, op="D", url="u3", warc_ts=5, text="", lang="en", html=b""),
        dict(seq=101, epoch=0, op="U", url="u4", warc_ts=9, text="A4", lang="en", html=b""),
    ]
    rows_b = [
        dict(seq=i, epoch=0, op="I", url=f"u{i}", warc_ts=1,
             text=f"b{i}", lang="de", html=b"")
        for i in range(0, 30, 2)  # only even keys + extras past 20
    ]
    ba, bb = str(tmp_path / "ba"), str(tmp_path / "bb")
    write_custom_binlog(ba, rows_a)
    write_custom_binlog(bb, rows_b)
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, ba, table="ta", num_partitions=4)
    run_cdc_sync(lake, bb, table="tb", num_partitions=4)

    con = duckdb.connect()
    for tname, bdir in (("ea", ba), ("eb", bb)):
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{bdir}/segment-*.parquet')"
        )
    oracle = """
        WITH sa AS (SELECT url, text, lang FROM ea QUALIFY row_number()
             OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) = 1
             AND op <> 'D'),
        sb AS (SELECT url, text, lang FROM eb QUALIFY row_number()
             OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) = 1
             AND op <> 'D')
        SELECT sa.url, sa.text, sa.lang,
               sb.text AS text_r, sb.lang AS lang_r
        FROM sa {JOIN} sb USING (url)
    """
    for how, sqlj in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        got = (
            copartitioned_join(
                lake, "ta", "tb",
                left_cols=["text", "lang"], right_cols=["text", "lang"],
                how=how,
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        exp = (
            con.execute(oracle.replace("{JOIN}", sqlj))
            .df()
            .sort_values("url")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got[exp.columns], exp)
        assert "u3" not in set(got.url)  # tombstone excluded
        if how == "inner":
            assert got.loc[got.url == "u4", "text"].item() == "A4"

    # layout mismatch refuses
    bc = str(tmp_path / "bc")
    write_custom_binlog(bc, rows_b[:2])
    run_cdc_sync(lake, bc, table="tc", num_partitions=8)
    with pytest.raises(ValueError, match="partition-count"):
        copartitioned_join(lake, "ta", "tc")


def test_sync_expectations_quarantine_lane(tmp_path, ray_session):
    """Expectations in the CDC sync: rule-failing upserts are excluded from
    the merge (older valid version keeps winning), land in the
    co-partitioned `<table>__quarantine` append table tagged with the first
    failed rule, tombstones bypass rules, and replays are exactly-once."""
    import duckdb
    import pandas as pd

    from airbyte_destination_ray.pipelines.cdc import read_table_arrow

    rows = [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=1, text="ok", lang="en", html=b""),
        dict(seq=1, epoch=0, op="I", url="b", warc_ts=1, text="ok", lang="en", html=b""),
        # newer version of a with unknown lang → quarantined; a keeps v1
        dict(seq=2, epoch=1, op="U", url="a", warc_ts=2, text="bad", lang="xx", html=b""),
        # null text → quarantined
        dict(seq=3, epoch=1, op="I", url="c", warc_ts=2, text=None, lang="en", html=b""),
        # tombstone with null payload must BYPASS rules and delete b
        dict(seq=4, epoch=1, op="D", url="b", warc_ts=3, text=None, lang=None, html=b""),
        dict(seq=5, epoch=1, op="I", url="d", warc_ts=3, text="ok", lang="de", html=b""),
    ]
    blog = str(tmp_path / "b")
    write_custom_binlog(blog, rows)
    lake = str(tmp_path / "lake")
    rules = [
        ("text_not_null", "not_null", "text"),
        ("lang_known", "in_set", "lang", ["en", "de"]),
    ]
    summary = run_cdc_sync(lake, blog, num_partitions=2, expectations=rules)
    assert sum(e.get("quarantined", 0) for e in summary["epochs"]) == 2

    main = read_table_arrow(lake, "pages")
    state = dict(zip(main.column("url").to_pylist(), main.column("text").to_pylist()))
    assert state == {"a": "ok", "d": "ok"}  # a kept v1, b deleted, c never landed

    q = read_table_arrow(lake, "pages__quarantine")
    qd = dict(zip(q.column("url").to_pylist(), q.column("_rule").to_pylist()))
    assert qd == {"a": "lang_known", "c": "text_not_null"}

    # replay: re-running the sync is a no-op on BOTH lanes
    run_cdc_sync(lake, blog, num_partitions=2, expectations=rules, resume=False)
    assert read_table_arrow(lake, "pages__quarantine").num_rows == 2
    pd.testing.assert_frame_equal(
        read_table_arrow(lake, "pages").to_pandas().sort_values("url").reset_index(drop=True),
        main.to_pandas().sort_values("url").reset_index(drop=True),
    )

    # oracle: LWW over rows passing the rules, tombstones bypass
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH ev AS (SELECT * FROM read_parquet('{blog}/segment-*.parquet')),
        valid AS (SELECT * FROM ev WHERE op = 'D'
                  OR (text IS NOT NULL AND COALESCE(lang IN ('en','de'), FALSE)))
        SELECT url, text FROM valid
        QUALIFY row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) = 1
            AND op <> 'D'
        ORDER BY url
    """).df()
    got = main.to_pandas()[["url", "text"]].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_consistent_read_pins_to_common_epoch(tmp_path, ray_session):
    """Cross-table snapshot isolation: reads pin to the highest epoch BOTH
    tables committed; a table with no checkpoint refuses."""
    from airbyte_destination_ray.pipelines.cdc import (
        consistent_read,
        consistent_snapshot_epoch,
        read_table_arrow,
    )

    rows = [
        dict(seq=0, epoch=0, op="I", url="a", warc_ts=1, text="e0", lang="en", html=b""),
        dict(seq=1, epoch=1, op="U", url="a", warc_ts=2, text="e1", lang="en", html=b""),
        dict(seq=2, epoch=2, op="U", url="a", warc_ts=3, text="e2", lang="en", html=b""),
    ]
    blog = str(tmp_path / "b")
    write_custom_binlog(blog, rows)
    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, blog, table="full", num_partitions=2)
    run_cdc_sync(lake, blog, table="lagging", num_partitions=2, epochs=[0, 1])

    assert consistent_snapshot_epoch(lake, ["full", "lagging"]) == 1
    views = consistent_read(lake, ["full", "lagging"])
    full = pa.concat_tables(list(views["full"].iter_batches(batch_format="pyarrow")))
    # 'full' is synced through epoch 2 but the consistent view pins to e1
    assert full.column("text").to_pylist() == ["e1"]
    assert read_table_arrow(lake, "full").column("text").to_pylist() == ["e2"]

    # no common epoch: a table that never checkpointed
    from airbyte_destination_ray.state.manifest import ManifestStore

    ManifestStore(lake, "empty").init_table(
        num_partitions=2, mode="append_dedup", pk=["url"], cursor="warc_ts"
    )
    with pytest.raises(RuntimeError, match="no common committed epoch"):
        consistent_read(lake, ["full", "empty"])
