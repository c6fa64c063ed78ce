"""Regression tests for the round-4 session-F code-review findings:
crash-resume for repartition_table, typed-empty results (reciprocal
edges, value-index lookup, TPC-H Q22), SQL-parity null handling
(cume_dist denominator, session-histogram null timestamps), and the
kmeans empty-corpus guard."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from airbyte_destination_ray.sources.synth import synthesize_binlog
from airbyte_destination_ray.state.manifest import ManifestStore

PARTS = 4
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def binlog(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("binlog_r4f")
    synthesize_binlog(d, n_events=800, n_keys=200, n_epochs=2, seed=7)
    return str(d)


# -- repartition_table crash-resume ----------------------------------------


def test_repartition_resumes_after_hard_crash(binlog, tmp_path):
    """A SIGKILL after wap_begin + marker leaves the WAP window open with
    ``repartition_target`` set; a re-run with the same count must RESUME
    into the same staged generation and publish, not raise."""
    from airbyte_destination_ray.pipelines.cdc import (
        read_table_arrow,
        repartition_table,
        run_cdc_sync,
        wap_begin,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    before = read_table_arrow(lake, "pages").sort_by("url")

    # reproduce the exact post-crash state: window open + marker written
    wap_begin(lake, "pages")
    store = ManifestStore(lake, "pages")
    store.update_meta(repartition_target=3)

    res = repartition_table(lake, "pages", new_num_partitions=3)
    assert res["repartitioned"] and res["num_partitions"] == 3
    meta = store.table_meta()
    assert meta["num_partitions"] == 3
    assert meta.get("published_generation") is None
    assert meta.get("repartition_target") is None
    after = read_table_arrow(lake, "pages").sort_by("url")
    assert after.equals(before)


def test_repartition_refuses_foreign_wap_window(binlog, tmp_path):
    """A staged generation WITHOUT the repartition marker belongs to some
    other writer's WAP — repartition must refuse, not hijack it."""
    from airbyte_destination_ray.pipelines.cdc import (
        repartition_table,
        run_cdc_sync,
        wap_begin,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    wap_begin(lake, "pages")
    with pytest.raises(RuntimeError, match="publish or abort"):
        repartition_table(lake, "pages", new_num_partitions=3)


def test_repartition_refuses_mismatched_resume_count(binlog, tmp_path):
    from airbyte_destination_ray.pipelines.cdc import (
        repartition_table,
        run_cdc_sync,
        wap_begin,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    wap_begin(lake, "pages")
    ManifestStore(lake, "pages").update_meta(repartition_target=5)
    with pytest.raises(RuntimeError, match="staged at 5 partitions"):
        repartition_table(lake, "pages", new_num_partitions=3)


# -- typed-empty results ----------------------------------------------------


def test_reciprocal_edges_empty_keeps_schema(ray_session):
    """Zero mutual pairs (sf0.001's sparse graph) must still return the
    (a, b) column set — the driver gate compares columns."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_r4f", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.queries()["events_reciprocal_edges"](SF_DIR)
    t = out if isinstance(out, pa.Table) else pa.table(out)
    assert t.column_names == ["a", "b"]


def test_lookup_value_rows_miss_keeps_schema(binlog, tmp_path, ray_session):
    from airbyte_destination_ray.pipelines.cdc import run_cdc_sync
    from airbyte_destination_ray.pipelines.index import (
        lookup_value_rows,
        sync_value_index,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    idx = str(tmp_path / "idx")
    sync_value_index(
        lake, "pages", idx, upto_epoch=10, column="lang", num_buckets=4
    )
    miss = lookup_value_rows(lake, "pages", idx, ["no-such-lang"])
    sch = miss.schema()
    assert "url" in sch.names and "lang" in sch.names
    assert miss.count() == 0


def test_q22_all_customers_idle_no_crash(ray_session):
    """max_orders above every customer's count empties the exclusion set:
    pa.concat_tables([]) must not be reached."""
    from airbyte_destination_ray.pipelines.tpch import (
        q22_idle_customer_balance,
    )

    out = q22_idle_customer_balance(SF_DIR, max_orders=10_000)
    t = (
        out
        if isinstance(out, pa.Table)
        else pa.concat_tables(
            [
                pa.Table.from_batches([b])
                if isinstance(b, pa.RecordBatch)
                else b
                for b in out.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    # every above-prior-balance customer is now "idle": non-empty result
    assert t.num_rows > 0


# -- SQL-parity null handling ------------------------------------------------


def test_cume_dist_counts_null_rows_in_denominator(ray_session):
    """SQL cume_dist divides by the FULL partition size (NULLS LAST rows
    included); null-value rows get a null cd."""
    import ray.data

    from airbyte_destination_ray.pipelines.relational import cume_dist_by_key

    t = pa.table(
        {
            "seq": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "u": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([1.0, 2.0, None, 5.0, None]),
        }
    )
    out = (
        pa.concat_tables(
            [
                pa.Table.from_batches([b])
                if isinstance(b, pa.RecordBatch)
                else b
                for b in cume_dist_by_key(
                    ray.data.from_arrow(t),
                    key="u",
                    value_col="v",
                    seq="seq",
                    num_partitions=2,
                ).iter_batches(batch_format="pyarrow")
            ]
        )
        .sort_by("seq")
        .to_pydict()
    )
    oracle = duckdb.connect().execute(
        """
        SELECT seq, CASE WHEN v IS NULL THEN NULL ELSE
               cume_dist() OVER (PARTITION BY u ORDER BY v NULLS LAST) END cd
        FROM t ORDER BY seq
        """
    ).fetchall()
    want = [r[1] for r in oracle]
    got = out["cd"]
    assert got == want  # identical single IEEE divisions both sides
    assert got[:2] == [1 / 3, 2 / 3]  # denominator 3, not 2
    assert got[2] is None and got[4] is None
    assert got[3] == 0.5  # b: 5.0 is 1 of 2 rows


def test_session_histogram_null_ts_stays_in_session(ray_session):
    """SQL `ts - prev_ts > gap` on NULL is NULL -> false -> SAME session;
    the kernel must not split on a null timestamp."""
    import ray.data

    from airbyte_destination_ray.pipelines.relational import (
        session_size_histogram,
    )

    ts = pa.array(
        [1_000_000_000, None, 1_000_060_000], type=pa.timestamp("us")
    )
    t = pa.table(
        {
            "seq": pa.array([1, 2, 3], type=pa.int64()),
            "u": pa.array(["a", "a", "a"]),
            "ts": ts,
        }
    )
    out = session_size_histogram(
        ray.data.from_arrow(t),
        key="u",
        ts_col="ts",
        seq="seq",
        gap_minutes=30,
        num_partitions=2,
    )
    d = dict(
        zip(
            out.column("session_events").to_pylist(),
            out.column("n_sessions").to_pylist(),
        )
    )
    # NULLS LAST ordering: [1e9us, 1.00006e9us, NULL] -> one 3-row session
    assert d == {3: 1}


def test_kmeans_sizes_exact_empty_corpus_message(ray_session):
    import ray.data

    from airbyte_destination_ray.pipelines.similarity import (
        kmeans_sizes_exact,
    )

    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="corpus is empty"):
        kmeans_sizes_exact(ray.data.from_arrow(empty))
