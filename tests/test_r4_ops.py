"""Round-4 additions: manifest keys_changed accounting, fixed-point
integer k-means, integer-subscore annotation, signature-exact dedup modes.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

PARTS = 8


def _collect(ds) -> pa.Table:
    if isinstance(ds, pa.Table):
        return ds
    batches = [
        pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
        for b in ds.iter_batches(batch_format="pyarrow")
    ]
    batches = [b for b in batches if b.num_rows]
    return (
        pa.concat_tables(batches, promote_options="permissive")
        if batches
        else pa.table({})
    )


@pytest.fixture(scope="module")
def binlog(tmp_path_factory, ray_session):
    from airbyte_destination_ray.sources.synth import synthesize_binlog

    d = tmp_path_factory.mktemp("binlog_r4")
    synthesize_binlog(d, n_events=2000, n_keys=300, n_epochs=3, seed=7)
    return str(d)


def test_keys_changed_per_epoch_matches_distinct_keys(binlog, tmp_path):
    """Manifest keys_changed summed per epoch == COUNT(DISTINCT url) of
    that epoch's binlog slice — deterministic change accounting (A5)."""
    from airbyte_destination_ray.pipelines.cdc import lineage_dataset, run_cdc_sync

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    lin = pa.Table.from_pylist(lineage_dataset(lake, "pages").take_all())
    got = {}
    for r in lin.to_pylist():
        assert r["keys_changed"] >= 0, "merge commit must record keys_changed"
        got[r["epoch"]] = got.get(r["epoch"], 0) + r["keys_changed"]
    # keys touched per epoch, REPLAYS INCLUDED: a seq re-delivered in a
    # later epoch still flows through that epoch's merge (idempotently),
    # so its key counts as changed there too
    want = dict(
        duckdb.connect()
        .execute(
            f"""
            SELECT epoch, count(DISTINCT url)
            FROM read_parquet('{binlog}/segment-*.parquet') GROUP BY epoch
            """
        )
        .fetchall()
    )
    assert got == want


def test_keys_changed_shuffle_strategy_invariant(binlog, tmp_path):
    """keys_changed must not depend on batch composition or shuffle mode."""
    from airbyte_destination_ray.pipelines.cdc import lineage_dataset, run_cdc_sync

    sums = []
    for i, kw in enumerate(
        [
            {"shuffle": "payload"},
            {"shuffle": "key_only"},
            {"merge_strategy": "delta"},
        ]
    ):
        lake = str(tmp_path / f"lake{i}")
        run_cdc_sync(lake, binlog, num_partitions=PARTS, **kw)
        lin = pa.Table.from_pylist(lineage_dataset(lake, "pages").take_all())
        agg = {}
        for r in lin.to_pylist():
            agg[r["epoch"]] = agg.get(r["epoch"], 0) + r["keys_changed"]
        sums.append(agg)
    assert sums[0] == sums[1] == sums[2]


def test_kmeans_sizes_exact_parallelism_invariant(ray_session):
    """Fixed-point k-means sizes are identical under different block
    layouts (the combiner is exact integer arithmetic)."""
    import ray.data

    from airbyte_destination_ray.pipelines.similarity import kmeans_sizes_exact

    rng = np.random.default_rng(3)
    n, d = 400, 16
    emb = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        }
    )
    a = kmeans_sizes_exact(ray.data.from_arrow(t), n_clusters=5, iters=2)
    b = kmeans_sizes_exact(
        ray.data.from_arrow(t).repartition(7), n_clusters=5, iters=2
    )
    assert a.sort_by("cluster").equals(b.sort_by("cluster"))
    assert int(pa.compute.sum(a.column("n")).as_py()) == n


def test_kmeans_sizes_exact_tiny_corpus(ray_session):
    """Corpus smaller than n_clusters → one cluster per vector."""
    import ray.data

    from airbyte_destination_ray.pipelines.similarity import kmeans_sizes_exact

    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    out = kmeans_sizes_exact(ray.data.from_arrow(t), n_clusters=8, iters=2)
    assert int(pa.compute.sum(out.column("n")).as_py()) == 3


def test_annotate_exact_null_and_classes(ray_session):
    import ray.data

    from airbyte_destination_ray.pipelines.ops import annotate_documents_exact

    good = "the quick brown fox jumps over the lazy dog and runs on"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([good, None, "1 2 3 4 5 6"]),
        }
    )
    out = (
        annotate_documents_exact(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[0, "quality_pass"]) is True
    assert out.loc[0, "quality_class"] == 1  # passes, < 50 words
    assert bool(out.loc[1, "quality_pass"]) is False
    assert out.loc[1, "quality_class"] == 0
    # all-digit doc: fails the 60%-alpha rule
    assert bool(out.loc[2, "quality_pass"]) is False


def test_signature_exact_dedup_drops_only_identical_sets(ray_session):
    """bands=1 + verify 1.0 = keep min id per identical shingle SET;
    near-dups (one word changed) must survive."""
    import ray.data

    from airbyte_destination_ray.pipelines.dedup import dedup_minhash_lsh

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    perm = "beta alpha gamma delta epsilon zeta eta theta iota kappa"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array([base, base, near, perm]),
        }
    )
    out = dedup_minhash_lsh(
        ray.data.from_arrow(t), bands=1, verify_threshold=1.0
    ).to_pandas()
    # 1 is an exact copy of 0 → dropped; 2 (near) and 3 (permuted 5-gram
    # sets differ) survive
    assert sorted(out.doc_id) == [0, 2, 3]


def test_apply_changes_merge_semantics(binlog, tmp_path):
    """MERGE INTO analog: upserts overwrite at equal version (synthetic
    seq wins), deletes tombstone, explicit-epoch replay is a no-op."""
    import pyarrow.compute as pc
    import ray.data

    from airbyte_destination_ray.pipelines.cdc import (
        apply_changes,
        read_table_arrow,
        run_cdc_sync,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    before = read_table_arrow(lake, "pages")
    urls = before.column("url").to_pylist()
    up_url, del_url = urls[0], urls[1]
    up_row = before.filter(pc.equal(before.column("url"), up_url))
    del_row = before.filter(pc.equal(before.column("url"), del_url))

    changes = pa.concat_tables(
        [
            up_row.append_column("op", pa.array(["U"])),
            del_row.append_column("op", pa.array(["D"])),
        ]
    )
    # upsert with the SAME version (warc_ts) but new text: must win on seq
    idx = changes.schema.get_field_index("text")
    changes = changes.set_column(
        idx, "text", pa.array(["MERGED", del_row.column("text")[0].as_py()])
    )
    payload = [c for c in before.column_names]
    res = apply_changes(
        lake, "pages", ray.data.from_arrow(changes),
        pk="url", ver="warc_ts", payload_columns=payload, epoch=100,
    )
    assert res["epoch"] == 100 and res["changes_in"] == 2

    after = read_table_arrow(lake, "pages")
    assert after.num_rows == before.num_rows - 1  # delete applied
    got = after.filter(pc.equal(after.column("url"), up_url))
    assert got.column("text")[0].as_py() == "MERGED"  # equal-ver overwrite
    assert del_url not in after.column("url").to_pylist()

    # replay with the same epoch: CAS no-op, state unchanged
    res2 = apply_changes(
        lake, "pages", ray.data.from_arrow(changes),
        pk="url", ver="warc_ts", payload_columns=payload, epoch=100,
    )
    again = read_table_arrow(lake, "pages")
    assert again.sort_by("url").equals(after.sort_by("url"))

    # auto-epoch: next call lands at 101
    res3 = apply_changes(
        lake, "pages", ray.data.from_arrow(changes.slice(0, 1)),
        pk="url", ver="warc_ts", payload_columns=payload,
    )
    assert res3["epoch"] == 101


def test_common_neighbors_link_prediction_planted(ray_session):
    """Star 0-{1,2,3} plus edge 1-2: non-edge pairs sharing the hub are
    predicted; the existing edge (1,2) is excluded."""
    import ray.data

    from airbyte_destination_ray.pipelines.graph import (
        common_neighbors_link_prediction,
    )

    t = pa.table(
        {
            "src": pa.array([0, 0, 0, 1], type=pa.int64()),
            "dst": pa.array([1, 2, 3, 2], type=pa.int64()),
        }
    )
    out = (
        common_neighbors_link_prediction(
            ray.data.from_arrow(t), min_common=1
        )
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    got = set(map(tuple, out[["u", "v", "common_neighbors"]].to_numpy()))
    # (1,3) and (2,3) share hub 0; (1,2) is an edge -> excluded;
    # (0,?) pairs: 0-1,0-2,0-3 all edges; non-edge (0,x) none.
    assert got == {(1, 3, 1), (2, 3, 1)}


def test_target_encode_smoothing_pull(ray_session):
    """A single-row key is pulled toward the global mean by m=10."""
    import ray.data

    from airbyte_destination_ray.pipelines.ops import target_encode_by_key

    t = pa.table(
        {
            "k": pa.array(["a"] * 98 + ["b", "b"]),
            "v": pa.array([1.0] * 98 + [100.0, None]),
        }
    )
    out = (
        target_encode_by_key(ray.data.from_arrow(t), key="k", target_col="v")
        .to_pandas()
        .set_index("k")
    )
    # global: 99 values, sum = 98*100 + 10000 cents = 19800c
    # a: (9800*99 + 10*19800) / (99*(98+10))
    assert out.loc["a", "te_value"] == (9800 * 99 + 10 * 19800) / (99 * 108)
    assert out.loc["b", "n"] == 1  # null target excluded


def test_repartition_table_preserves_state_and_resumes(binlog, tmp_path):
    """Repartition 8 -> 16: byte-equal visible state (tombstones + seq
    watermarks carried), meta flips, point lookups route with the new
    hash, and a later epoch sync resumes cleanly on the new layout."""
    import pyarrow.compute as pc

    from airbyte_destination_ray.pipelines.cdc import (
        lookup_rows,
        read_table_arrow,
        repartition_table,
        run_cdc_sync,
    )
    from airbyte_destination_ray.state.manifest import ManifestStore

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS, epochs=[0, 1])
    before = read_table_arrow(lake, "pages").sort_by("url")

    res = repartition_table(lake, "pages", 16)
    assert res["num_partitions"] == 16 and not res["skipped"]
    store = ManifestStore(lake, "pages")
    assert store.table_meta()["num_partitions"] == 16
    after = read_table_arrow(lake, "pages").sort_by("url")
    assert after.equals(before)

    # same-count call is a no-op
    assert repartition_table(lake, "pages", 16)["skipped"]

    # point lookup routes with the NEW hash layout
    url0 = before.column("url")[0].as_py()
    hit = lookup_rows(lake, "pages", [url0])
    got = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in hit.iter_batches(batch_format="pyarrow")
        ]
    )
    assert got.num_rows == 1 and got.column("url")[0].as_py() == url0

    # the remaining binlog epoch applies on the new layout and matches a
    # fresh full sync at 16 partitions
    run_cdc_sync(lake, binlog, num_partitions=16)
    lake2 = str(tmp_path / "lake2")
    run_cdc_sync(lake2, binlog, num_partitions=16)
    a = read_table_arrow(lake, "pages").sort_by("url")
    b = read_table_arrow(lake2, "pages").sort_by("url")
    assert a.equals(b)


def test_value_index_tracks_updates(binlog, tmp_path):
    """Secondary value index: an update tombstones the OLD value's
    posting, so lookups never return stale matches."""
    import pyarrow.compute as pc
    import ray.data

    from airbyte_destination_ray.pipelines.cdc import (
        apply_changes,
        read_table_arrow,
        run_cdc_sync,
    )
    from airbyte_destination_ray.pipelines.index import (
        lookup_value_rows,
        sync_value_index,
    )

    lake = str(tmp_path / "lake")
    run_cdc_sync(lake, binlog, num_partitions=PARTS)
    state = read_table_arrow(lake, "pages")
    # flip one row's lang via MERGE, then index lang through the new epoch
    row = state.slice(0, 1)
    old_lang = row.column("lang")[0].as_py()
    row = row.set_column(
        row.schema.get_field_index("lang"), "lang", pa.array(["zz"])
    )
    res = apply_changes(
        lake, "pages", ray.data.from_arrow(row),
        pk="url", ver="warc_ts",
        payload_columns=state.column_names, epoch=50,
    )
    idx = str(tmp_path / "idx")
    sync_value_index(
        lake, "pages", idx, upto_epoch=50, column="lang", num_buckets=8
    )
    url0 = row.column("url")[0].as_py()

    hit = pa.concat_tables(
        [
            pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in lookup_value_rows(lake, "pages", idx, ["zz"])
            .iter_batches(batch_format="pyarrow")
        ]
    )
    assert hit.num_rows == 1 and hit.column("url")[0].as_py() == url0
    # the OLD value no longer returns this url (tombstoned posting)
    stale = lookup_value_rows(lake, "pages", idx, [old_lang])
    urls = [
        r["url"]
        for b in stale.iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    assert url0 not in urls


def test_tpch_q2_q21_composites_sf0001(ray_session):
    """Q2-analog argmin tie order + Q21-analog unique-latest-shipper
    kernel vs DuckDB at sf0.001 (the sf0.01 oracle gate re-pins both)."""
    import pandas as pd

    from airbyte_destination_ray.pipelines.tpch import (
        q2_min_cost_supplier,
        q21_waiting_suppliers,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["supplier", "part", "orders", "lineitem", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )

    got = (
        q2_min_cost_supplier(sf)
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    want = con.execute(
        """
        WITH cost AS (
            SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                   CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cost_cents
            FROM lineitem JOIN part ON p_partkey = l_partkey AND p_size = 15
            GROUP BY 1, 2)
        SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, cost_cents
        FROM cost JOIN supplier USING (s_suppkey)
        JOIN nation ON s_nationkey = n_nationkey
        QUALIFY row_number() OVER (
            PARTITION BY p_partkey
            ORDER BY cost_cents, s_acctbal DESC, s_suppkey) = 1
        ORDER BY p_partkey
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )

    got21 = q21_waiting_suppliers(sf).to_pandas().reset_index(drop=True)
    want21 = con.execute(
        """
        WITH f AS (
            SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'),
        agg AS (
            SELECT l_orderkey, max(l_shipdate) AS ms,
                   count(DISTINCT l_suppkey) AS ns
            FROM f GROUP BY 1),
        winners AS (
            SELECT f.l_orderkey, f.l_suppkey FROM f
            JOIN agg ON f.l_orderkey = agg.l_orderkey
               AND f.l_shipdate = agg.ms
            WHERE agg.ns >= 2 GROUP BY 1, 2),
        solo AS (
            SELECT l_orderkey, min(l_suppkey) AS w FROM winners
            GROUP BY 1 HAVING count(*) = 1)
        SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM solo JOIN supplier ON s_suppkey = w GROUP BY 1, 2
        ORDER BY numwait DESC, s_suppkey LIMIT 20
        """
    ).df()
    pd.testing.assert_frame_equal(
        got21[sorted(got21.columns)], want21[sorted(want21.columns)],
        check_dtype=False,
    )


def test_moving_median_by_key_nulls_and_window_edges(ray_session):
    """ROWS-frame median vs DuckDB quantile_cont on a corpus with null
    keys (one SQL NULL partition), null values (slot occupied, value
    ignored), and an all-null window."""
    import pandas as pd
    import ray.data

    from airbyte_destination_ray.pipelines.relational import (
        moving_median_by_key,
    )

    rows = []
    vals = [3.0, None, 1.0, None, None, 7.5, 2.25, None, 4.0, 0.5]
    for i in range(40):
        rows.append(
            {
                "seq": i,
                "k": None if i % 7 == 3 else f"u{i % 3}",
                "ts": 1_000_000 * (i // 2),  # duplicate ts → seq tie-break
                "v": vals[i % len(vals)],
            }
        )
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("seq", pa.int64()),
                ("k", pa.string()),
                ("ts", pa.timestamp("us")),
                ("v", pa.float64()),
            ]
        ),
    )
    got = (
        moving_median_by_key(
            ray.data.from_arrow(t),
            key="k",
            ts_col="ts",
            seq="seq",
            value_col="v",
            window_rows=3,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("seq")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """
        SELECT seq, k,
               quantile_cont(v, 0.5) OVER (
                   PARTITION BY k ORDER BY ts, seq
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win_median
        FROM t ORDER BY seq
        """
    ).df()
    assert list(got["seq"]) == list(want["seq"])
    for a, b in zip(got["win_median"], want["win_median"]):
        if pd.isna(a) or pd.isna(b):
            assert pd.isna(a) and pd.isna(b)
        else:
            assert a == b, (a, b)  # EXACT, not approx — the driver hashes


def test_tpch_q20_excess_suppliers_sf0001(ray_session):
    """Q20-analog correlated-threshold kernel (2*qty > part total) vs
    DuckDB at sf0.001 (the sf0.01 oracle gate re-pins it)."""
    import pandas as pd

    from airbyte_destination_ray.pipelines.tpch import q20_excess_suppliers

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ["supplier", "part", "lineitem", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    got = (
        q20_excess_suppliers(sf)
        .to_pandas()
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    want = con.execute(
        """
        WITH pq AS (
            SELECT l_partkey, l_suppkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem
            WHERE year(l_shipdate) = 1996
              AND l_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
            GROUP BY 1, 2),
        tot AS (SELECT l_partkey, sum(qty) AS total FROM pq GROUP BY 1)
        SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
        FROM pq JOIN tot USING (l_partkey)
        JOIN supplier s ON s.s_suppkey = pq.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE 2 * pq.qty > tot.total
        ORDER BY s_suppkey
        """
    ).df()
    assert len(got) > 0
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_cume_dist_by_key_sf0001(ray_session):
    """cume_dist (tie-group LAST position / n) vs DuckDB window fn,
    including null-value rows keeping a null cd."""
    import pandas as pd

    from airbyte_destination_ray.pipelines.relational import cume_dist_by_key
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    sf = "/root/testdata/sf0.001"
    ev = read_parquet_sized(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    got = (
        _collect(cume_dist_by_key(ev, key="user_id", value_col="value", seq="event_id"))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
            SELECT event_id, user_id,
                   CASE WHEN value IS NULL THEN NULL ELSE
                       cume_dist() OVER (
                           PARTITION BY user_id ORDER BY value) END AS cd
            FROM read_parquet('{sf}/events.parquet')
            WHERE user_id IS NOT NULL ORDER BY event_id
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_radius_search_threshold_set_sf0001(ray_session):
    """Cosine range query pair set vs DuckDB list_cosine_similarity."""
    import numpy as np

    from airbyte_destination_ray.pipelines.similarity import radius_search
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    sf = "/root/testdata/sf0.001"
    qt = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet') "
        "WHERE vec_id < 4 ORDER BY vec_id"
    ).arrow()
    qm = np.array(qt.column("embedding").to_pylist(), dtype=np.float64)
    qids = np.array(qt.column("vec_id").to_pylist(), dtype=np.int64)
    got = _collect(
        radius_search(
            read_parquet_sized(f"{sf}/embeddings.parquet"), qm, qids,
            threshold=0.3,
        )
    )
    want = duckdb.sql(
        f"""
        WITH q AS (SELECT vec_id AS query_id, embedding qe
                   FROM read_parquet('{sf}/embeddings.parquet')
                   WHERE vec_id < 4)
        SELECT q.query_id, e.vec_id
        FROM read_parquet('{sf}/embeddings.parquet') e, q
        WHERE list_cosine_similarity(q.qe, e.embedding) >= 0.3
        """
    ).arrow()
    a = sorted(zip(got.column("query_id").to_pylist(), got.column("vec_id").to_pylist()))
    b = sorted(zip(want.column("query_id").to_pylist(), want.column("vec_id").to_pylist()))
    assert a == b and len(a) >= 4  # at least the self-pairs


def test_reciprocal_edges_handles_dups_selfloops_nulls(ray_session):
    """Reciprocity kernel on a hand-built directed edge list: duplicate
    edges, self-loops, null endpoints, and one-directional pairs must all
    be excluded; batch composition must not matter."""
    import ray.data

    import pyarrow as pa

    from airbyte_destination_ray.pipelines.graph import reciprocal_edges

    rows = [
        {"src": 1, "dst": 2}, {"src": 2, "dst": 1},   # mutual
        {"src": 1, "dst": 2},                          # dup of fwd
        {"src": 3, "dst": 4},                          # one-way
        {"src": 5, "dst": 5},                          # self-loop
        {"src": None, "dst": 7}, {"src": 7, "dst": None},
        {"src": 8, "dst": 9}, {"src": 9, "dst": 8},   # mutual
    ]
    for nblocks in (1, 4):
        ds = ray.data.from_items(rows, override_num_blocks=nblocks)
        got = _collect(reciprocal_edges(ds, num_partitions=4))
        pairs = sorted(zip(got.column("a").to_pylist(), got.column("b").to_pylist()))
        assert pairs == [(1, 2), (8, 9)], (nblocks, pairs)


def test_type_token_ratio_by_group_sf0001(ray_session):
    import pandas as pd

    from airbyte_destination_ray.pipelines.corpus import (
        type_token_ratio_by_group,
    )
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    sf = "/root/testdata/sf0.001"
    got = (
        type_token_ratio_by_group(
            read_parquet_sized(f"{sf}/documents.parquet", columns=["source", "text"])
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
            WITH w AS (
                SELECT source, unnest(string_split_regex(
                    lower(text), '[^a-z0-9]+')) AS term
                FROM read_parquet('{sf}/documents.parquet'))
            SELECT source, CAST(count(DISTINCT term) AS BIGINT) AS n_types,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(DISTINCT term) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS ttr
            FROM w WHERE term != '' GROUP BY 1 ORDER BY source
            """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )


def test_session_size_histogram_sf0001(ray_session):
    """Events-per-session distribution vs DuckDB gaps-and-islands,
    including the null-user SQL partition."""
    import pandas as pd

    from airbyte_destination_ray.pipelines.relational import (
        session_size_histogram,
    )
    from airbyte_destination_ray.sources.parquet import read_parquet_sized

    sf = "/root/testdata/sf0.001"
    got = (
        session_size_histogram(
            read_parquet_sized(
                f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
            )
        )
        .to_pandas()
        .sort_values("session_events")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            f"""
            WITH s AS (
                SELECT event_id, user_id,
                       sum(CASE WHEN prev_ts IS NULL
                                  OR ts - prev_ts > INTERVAL 30 MINUTE
                                THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
                FROM (SELECT event_id, user_id, ts,
                             lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev_ts
                      FROM read_parquet('{sf}/events.parquet'))),
            sz AS (SELECT user_id, session_id, count(*) AS session_events
                   FROM s GROUP BY 1, 2)
            SELECT CAST(session_events AS BIGINT) AS session_events,
                   CAST(count(*) AS BIGINT) AS n_sessions
            FROM sz GROUP BY 1 ORDER BY 1
            """
        )
        .df()
        .reset_index(drop=True)
    )
    assert got["n_sessions"].sum() > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_page_change_rate_query_batch_invariance(ray_session):
    """The host change-rate query's totals must equal the plain snapshot
    diff's op counts (same machinery, bucketed by host)."""
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    hosts = E.queries()["page_change_rate_by_host"](sf)
    diff = _collect(E.queries()["users_snapshot_diff"](sf))
    import pyarrow.compute as pc

    ops = diff.column("op")
    assert (
        int(pc.sum(hosts.column("n_insert")).as_py() or 0)
        == pc.sum(pc.cast(pc.equal(ops, "I"), pa.int64())).as_py()
    )
    assert (
        int(pc.sum(hosts.column("n_update")).as_py() or 0)
        == pc.sum(pc.cast(pc.equal(ops, "U"), pa.int64())).as_py()
    )
    assert (
        int(pc.sum(hosts.column("n_delete")).as_py() or 0)
        == pc.sum(pc.cast(pc.equal(ops, "D"), pa.int64())).as_py()
    )
