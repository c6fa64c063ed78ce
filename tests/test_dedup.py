"""Distributed dedup + similarity operator tests (Ray session required)."""

import numpy as np
import pyarrow as pa
import pytest


BASE = (
    "the quick brown fox jumps over the lazy dog it was a sunny day in the "
    "park and everyone was happy because the weather was very nice indeed"
)


def _docs_table():
    docs = [
        BASE,                                   # 0: original
        BASE.replace("sunny", "rainy"),         # 1: near-dup of 0
        BASE,                                   # 2: exact dup of 0
        "completely different content about machine learning and neural "
        "networks training on very large datasets with many parameters",  # 3
        "short unique doc",                     # 4
    ]
    return pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
        }
    )


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(_docs_table())


def _ids(ds, col="doc_id"):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return sorted(t.column(col).to_pylist())


def test_dedup_exact_hash_removes_exact_only(docs_ds):
    from airbyte_destination_ray.pipelines.dedup import dedup_exact_hash

    assert _ids(dedup_exact_hash(docs_ds)) == [0, 1, 3, 4]


def test_dedup_minhash_removes_near_dups(docs_ds):
    from airbyte_destination_ray.pipelines.dedup import dedup_minhash_lsh

    kept = _ids(dedup_minhash_lsh(docs_ds))
    assert 0 in kept and 3 in kept and 4 in kept
    assert 2 not in kept  # exact dup gone
    assert 1 not in kept  # near dup gone


def test_dedup_simhash_removes_near_dups(docs_ds):
    from airbyte_destination_ray.pipelines.dedup import dedup_simhash

    kept = _ids(dedup_simhash(docs_ds))
    assert 2 not in kept and 1 not in kept
    assert {0, 3, 4} <= set(kept)


def test_dedup_ngram_jaccard_verifies_threshold(docs_ds):
    from airbyte_destination_ray.pipelines.dedup import dedup_ngram_jaccard

    # at a high threshold only the exact duplicate goes
    kept = _ids(dedup_ngram_jaccard(docs_ds, threshold=0.99))
    assert 2 not in kept and {0, 1, 3, 4} <= set(kept)


def test_dedup_embedding_cosine(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_embedding_cosine

    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    near = base + rng.standard_normal(16) * 0.01
    far = rng.standard_normal(16)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], type=pa.int64()),
            "embedding": pa.array(
                [base.tolist(), near.tolist(), far.tolist()],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    kept = _ids(
        dedup_embedding_cosine(ray.data.from_arrow(t), threshold=0.99),
        col="vec_id",
    )
    assert kept == [0, 2]


def test_knn_brute_force_self_top1(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import knn_brute_force

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((50, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    out = knn_brute_force(ds, emb[:3], np.arange(3), k=5)
    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert res.num_rows == 15
    top1 = res.filter(pa.compute.equal(res.column("rank"), 1))
    by_query = dict(
        zip(top1.column("query_id").to_pylist(), top1.column("vec_id").to_pylist())
    )
    assert by_query == {0: 0, 1: 1, 2: 2}  # self-similarity = 1.0


def test_knn_lsh_finds_self(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import knn_lsh

    rng = np.random.default_rng(2)
    emb = rng.standard_normal((80, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(80), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    out = knn_lsh(ds, emb[:3], np.arange(3), k=5)
    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    top1 = res.filter(pa.compute.equal(res.column("rank"), 1))
    by_query = dict(
        zip(top1.column("query_id").to_pylist(), top1.column("vec_id").to_pylist())
    )
    # a query's own bucket always contains itself
    assert by_query == {0: 0, 1: 1, 2: 2}


def test_knn_ivf_self_and_recall(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import (
        knn_brute_force,
        knn_ivf,
    )

    rng = np.random.default_rng(5)
    # clustered corpus (IVF's favorable regime, but also realistic for
    # embedding spaces): 4 gaussian clusters in 16d
    centers = rng.standard_normal((4, 16)) * 4
    emb = np.concatenate(
        [c + rng.standard_normal((100, 16)) for c in centers]
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(emb)), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    q = emb[:5]
    qids = np.arange(5)
    ivf = pa.concat_tables(
        list(
            knn_ivf(ds, q, qids, k=5, n_centroids=8, nprobe=3).iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    top1 = ivf.filter(pa.compute.equal(ivf.column("rank"), 1))
    by_query = dict(
        zip(top1.column("query_id").to_pylist(), top1.column("vec_id").to_pylist())
    )
    # the query's own vector is always in its nearest list
    assert by_query == {i: i for i in range(5)}
    # recall@5 vs brute force ≥ 0.8 in the clustered regime
    bf = pa.concat_tables(
        list(knn_brute_force(ds, q, qids, k=5).iter_batches(batch_format="pyarrow"))
    )
    def pairs(tbl):
        return set(zip(tbl.column("query_id").to_pylist(), tbl.column("vec_id").to_pylist()))
    recall = len(pairs(ivf) & pairs(bf)) / len(pairs(bf))
    assert recall >= 0.8, recall


def test_ivf_indexed_matches_streaming_and_prunes_lists(ray_session, tmp_path):
    """build_ivf_index + knn_ivf_indexed must return exactly what the
    streaming knn_ivf returns for the same params, and only the probed
    list directories may be read."""
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import (
        build_ivf_index,
        knn_ivf,
        knn_ivf_indexed,
    )

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((4, 16)) * 4
    emb = np.concatenate(
        [c + rng.standard_normal((80, 16)) for c in centers]
    ).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(len(emb)), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    mk = lambda: ray.data.from_arrow(t).repartition(4)
    idx = str(tmp_path / "ivf")
    build_ivf_index(mk(), idx, n_centroids=8)
    q, qids = emb[:3], np.arange(3)
    a = (
        knn_ivf_indexed(idx, q, qids, k=5, nprobe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        knn_ivf(mk(), q, qids, k=5, n_centroids=8, nprobe=3)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # pruning: the index has 8 list dirs; 3 queries × nprobe=3 probe ≤ 8
    from pathlib import Path

    n_lists = len(list(Path(idx).glob("list_p=*")))
    assert n_lists >= 4  # clustered corpus spreads over several lists


def test_exact_hash_shuffle_filter_matches_broadcast(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_exact_hash

    docs = pa.table(
        {
            "doc_id": pa.array(range(40), type=pa.int64()),
            "text": pa.array(
                [f"doc {i % 15}" for i in range(40)]  # 15 distinct texts
            ),
            "lang": pa.array(["en"] * 40),
        }
    )
    ds = lambda: ray.data.from_arrow(docs).repartition(4)
    a = dedup_exact_hash(ds()).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        dedup_exact_hash(ds(), filter_mode="shuffle")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == 15
    assert a.equals(b)


def _sorted_df(ds, col="doc_id"):
    return ds.to_pandas().sort_values(col).reset_index(drop=True)


def test_minhash_shuffle_filter_matches_broadcast(docs_ds, ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_minhash_lsh

    mk = lambda: ray.data.from_arrow(_docs_table()).repartition(3)
    a = _sorted_df(dedup_minhash_lsh(mk()))
    b = _sorted_df(dedup_minhash_lsh(mk(), filter_mode="shuffle"))
    assert len(a) > 0 and a.equals(b)


def test_simhash_shuffle_filter_matches_broadcast(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_simhash

    mk = lambda: ray.data.from_arrow(_docs_table()).repartition(3)
    a = _sorted_df(dedup_simhash(mk()))
    b = _sorted_df(dedup_simhash(mk(), filter_mode="shuffle"))
    assert len(a) > 0 and a.equals(b)


def test_ngram_shuffle_filter_matches_broadcast(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_ngram_jaccard

    mk = lambda: ray.data.from_arrow(_docs_table()).repartition(3)
    a = _sorted_df(dedup_ngram_jaccard(mk(), threshold=0.99))
    b = _sorted_df(dedup_ngram_jaccard(mk(), threshold=0.99, filter_mode="shuffle"))
    assert len(a) > 0 and a.equals(b)


def _emb_table(n=60, d=16, seed=7, dups=10):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d))
    for i in range(dups):
        # make rows n-dups+i near-dups of rows i
        emb[n - dups + i] = emb[i] + rng.standard_normal(d) * 0.001
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_embedding_shuffle_filter_matches_broadcast(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_embedding_cosine

    t = _emb_table()
    mk = lambda: ray.data.from_arrow(t).repartition(3)
    a = _sorted_df(dedup_embedding_cosine(mk(), threshold=0.98), col="vec_id")
    b = _sorted_df(
        dedup_embedding_cosine(mk(), threshold=0.98, filter_mode="shuffle"),
        col="vec_id",
    )
    assert 0 < len(a) < 60 and a.equals(b)


def test_embedding_int8_transit_matches_float(ray_session):
    """int8-quantized transit must make the same keep/drop decisions as the
    exact float path when pairs sit away from the threshold (the cosine
    margin here is ≫ quantization error ~0.006)."""
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_embedding_cosine

    t = _emb_table(seed=11)
    mk = lambda: ray.data.from_arrow(t).repartition(3)
    a = _sorted_df(dedup_embedding_cosine(mk(), threshold=0.95), col="vec_id")
    b = _sorted_df(
        dedup_embedding_cosine(mk(), threshold=0.95, transit="float"),
        col="vec_id",
    )
    assert 0 < len(a) < 60 and a.equals(b)


def test_dedup_jaccard_exact_semantics(ray_session):
    """True word-5-gram Jaccard at the boundary: J=0.8 drops, J=0.6 keeps;
    <5-word, empty, and null docs have no shingles and are always kept."""
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_jaccard_exact

    docs = [
        "a b c d e f g h",        # 0: 4 shingles
        "a b c d e f g h",        # 1: J=1 with 0 -> dropped
        "a b c d e f g X",        # 2: inter 3 / union 5 = 0.6 -> kept
        "a b c d e f g h i",      # 3: inter 4 / union 5 = 0.8 -> dropped
        "short words only",       # 4: <5 words -> kept
        None,                     # 5: kept
        "",                       # 6: kept
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    kept = _ids(dedup_jaccard_exact(ray.data.from_arrow(t).repartition(3)))
    assert kept == [0, 2, 4, 5, 6]


def test_dedup_jaccard_exact_shuffle_filter_matches_broadcast(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_jaccard_exact

    mk = lambda: ray.data.from_arrow(_docs_table()).repartition(3)
    a = _sorted_df(dedup_jaccard_exact(mk(), threshold=0.5))
    b = _sorted_df(dedup_jaccard_exact(mk(), threshold=0.5, filter_mode="shuffle"))
    assert len(a) > 0 and a.equals(b)


def test_dedup_jaccard_exact_max_shingle_freq_prunes(ray_session):
    """Stopword-shingle pruning cap: with every shingle shared by all three
    docs (identical texts), cap=2 drops every shingle group, so no pairs
    form and all docs survive — the documented approximation path."""
    import ray.data
    from airbyte_destination_ray.pipelines.dedup import dedup_jaccard_exact

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["a b c d e f"] * 3),
        }
    )
    kept_exact = _ids(dedup_jaccard_exact(ray.data.from_arrow(t)))
    assert kept_exact == [0]
    kept_capped = _ids(
        dedup_jaccard_exact(ray.data.from_arrow(t), max_shingle_freq=2)
    )
    assert kept_capped == [0, 1, 2]


def test_cluster_assign_quantized_matches_numpy(ray_session):
    """Quantized assignment is exact int64 math: the (cluster, dot) pair
    must equal the brute-force numpy oracle bit-for-bit, and ties must
    break to the lowest cluster index."""
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import cluster_assign

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((40, 16)).astype(np.float32)
    cents = rng.integers(-128, 128, size=(4, 16)).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(range(40), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    out = cluster_assign(
        ray.data.from_arrow(t), cents, quantize_scale=64.0
    )
    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    res = res.sort_by("vec_id")

    q = np.floor(emb.astype(np.float64) * 64.0 + 0.5).astype(np.int64)
    dots = q @ cents.T
    best = np.argmax(dots, axis=1)
    assert res.column("cluster").to_pylist() == best.tolist()
    assert (
        res.column("dot").to_pylist()
        == dots[np.arange(40), best].tolist()
    )


def test_cluster_assign_tie_breaks_low_index(ray_session):
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import cluster_assign

    # two identical centroids -> every dot ties -> argmax picks index 0
    cents = np.array([[1, 1], [1, 1]], dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float32())
            ),
        }
    )
    out = cluster_assign(ray.data.from_arrow(t), cents, quantize_scale=1.0)
    res = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert set(res.column("cluster").to_pylist()) == {0}


def test_kmeans_cluster_sizes_partitions_corpus(ray_session):
    """Two well-separated blobs, k=2: the size profile must be the blob
    sizes, and must be identical across parallelism (combiner pattern +
    deterministic hash-sampled training)."""
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import (
        kmeans_cluster_sizes,
    )

    rng = np.random.default_rng(9)
    a = rng.standard_normal((30, 8)).astype(np.float32) + 10.0
    b = rng.standard_normal((20, 8)).astype(np.float32) - 10.0
    emb = np.vstack([a, b])
    t = pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )

    def sizes(nblocks):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = kmeans_cluster_sizes(ds, n_clusters=2)
        res = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow"))
        )
        return sorted(res.column("n").to_pylist())

    assert sizes(1) == [20, 30]
    assert sizes(7) == [20, 30]


def test_semdedup_within_cluster_only(ray_session):
    """Identical vectors in the SAME cluster dedup (keep-first); identical
    vectors forced into DIFFERENT clusters survive (the documented
    cross-cluster miss of SemDeDup); shuffle filter mode equals broadcast."""
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import semdedup

    # two orthogonal centroids; e1-aligned and e2-aligned vectors separate
    cents = np.array([[127, 0, 0, 0], [0, 127, 0, 0]], dtype=np.int64)
    vecs = [
        [1.0, 0.0, 0.0, 0.0],   # 0: cluster 0
        [1.0, 0.0, 0.0, 0.0],   # 1: exact dup of 0, same cluster -> drop
        [0.9, 0.1, 0.0, 0.0],   # 2: cluster 0, cos vs 0 high -> drop
        [0.0, 1.0, 0.0, 0.0],   # 3: cluster 1 survives
        [0.1, 0.0, 0.9, 0.0],   # 4: cluster 0 but near-orthogonal to 0
    ]
    t = pa.table(
        {
            "vec_id": pa.array(range(5), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }
    )

    def run(mode):
        out = semdedup(
            ray.data.from_arrow(t).repartition(3),
            cents,
            quantize_scale=64.0,
            cos2_num=9025,
            cos2_den=10000,
            filter_mode=mode,
        )
        return _ids(out, col="vec_id")

    assert run("broadcast") == [0, 3, 4]
    assert run("shuffle") == [0, 3, 4]


def test_semdedup_matches_numpy_oracle(ray_session):
    """Random corpus: survivors must equal the brute-force integer-math
    oracle bit-for-bit, independent of block layout."""
    import ray.data
    from airbyte_destination_ray.pipelines.similarity import semdedup

    rng = np.random.default_rng(11)
    emb = (rng.standard_normal((80, 8)) * 0.3).astype(np.float32)
    # plant near-dups: rows 50..54 are jittered copies of rows 0..4
    emb[50:55] = emb[0:5] + 0.01
    cents = rng.integers(-128, 128, size=(3, 8)).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(range(80), type=pa.int64()),
            "embedding": pa.array(
                [e.tolist() for e in emb], type=pa.list_(pa.float32())
            ),
        }
    )
    num, den = 8100, 10000  # cos >= 0.9

    q = np.floor(emb.astype(np.float64) * 64.0 + 0.5).astype(np.int64)
    cl = np.argmax(q @ cents.T, axis=1)
    n2 = (q * q).sum(1)
    dup = set()
    for c in np.unique(cl):
        idx = np.where(cl == c)[0]
        G = q[idx] @ q[idx].T
        for j in range(len(idx)):
            for i in range(j):
                g = int(G[i, j])
                if g > 0 and den * g * g >= num * int(n2[idx[i]]) * int(n2[idx[j]]):
                    dup.add(int(idx[j]))
                    break
    want = [i for i in range(80) if i not in dup]
    assert dup  # the planted copies must actually collide

    out = semdedup(
        ray.data.from_arrow(t).repartition(5),
        cents,
        cos2_num=num,
        cos2_den=den,
    )
    assert _ids(out, col="vec_id") == want


def test_auto_filter_mode_switches_on_threshold(docs_ds, monkeypatch):
    """filter_mode="auto" broadcasts small dup sets and switches to the
    distributed anti-join once the candidate count crosses
    DEDUP_BROADCAST_MAX_IDS — same surviving set either way."""
    from airbyte_destination_ray.pipelines import dedup as dd

    calls = {"shuffle": 0, "broadcast": 0}
    real_shuffle = dd._distributed_filter_out
    real_broadcast = dd._broadcast_filter_out

    def spy_shuffle(*a, **k):
        calls["shuffle"] += 1
        return real_shuffle(*a, **k)

    def spy_broadcast(*a, **k):
        calls["broadcast"] += 1
        return real_broadcast(*a, **k)

    monkeypatch.setattr(dd, "_distributed_filter_out", spy_shuffle)
    monkeypatch.setattr(dd, "_broadcast_filter_out", spy_broadcast)

    # small dup set (1 candidate) -> broadcast path
    kept_small = _ids(dd.dedup_exact_hash(docs_ds, filter_mode="auto"))
    assert kept_small == [0, 1, 3, 4]
    assert calls == {"shuffle": 0, "broadcast": 1}

    # force the threshold to zero -> every non-empty dup set takes shuffle
    monkeypatch.setattr(dd, "DEDUP_BROADCAST_MAX_IDS", 0)
    kept_big = _ids(dd.dedup_exact_hash(docs_ds, filter_mode="auto"))
    assert kept_big == kept_small
    assert calls == {"shuffle": 1, "broadcast": 1}


def test_dedup_exact_hash_rank_col_keeps_best(ray_session):
    """rank_col retention policy: the HIGHEST-rank duplicate survives (ties
    -> min id), instead of the min-id default."""
    import ray.data

    from airbyte_destination_ray.pipelines.dedup import dedup_exact_hash

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["dup", "dup", "dup", "uniq", "tie"]),
            "quality": pa.array([5, 9, 7, 1, 3], type=pa.int64()),
        }
    )
    kept = _ids(
        dedup_exact_hash(
            ray.data.from_arrow(t).repartition(3), rank_col="quality"
        )
    )
    assert kept == [1, 3, 4]  # doc 1 wins the dup bucket on quality 9
    # default still keeps min id
    kept_default = _ids(
        dedup_exact_hash(ray.data.from_arrow(t).repartition(3))
    )
    assert kept_default == [0, 3, 4]


def test_embedding_covariance_exact_int_sums(ray_session):
    """Fixed-point covariance: integer power sums match numpy exactly and
    the cov float equals the same IEEE sequence over the quantized data."""
    import numpy as np
    import ray.data

    from airbyte_destination_ray.pipelines.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(7)
    x = rng.randn(40, 3).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(40), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in x], type=pa.list_(pa.float32())
            ),
        }
    )
    out = embedding_covariance(
        ray.data.from_arrow(t).repartition(4), scale=10_000
    ).to_pandas().set_index(["i", "j"]).sort_index()

    q = np.floor(x.astype(np.float64) * 10_000).astype(np.int64)
    g = q.T @ q
    s = q.sum(axis=0)
    n = np.float64(40)
    assert len(out) == 6  # upper triangle of 3×3
    for (i, j), row in out.iterrows():
        assert row.sum_ij == g[i, j]
        assert row.sum_i == s[i] and row.sum_j == s[j]
        expect = (np.float64(g[i, j]) - np.float64(s[i]) * np.float64(s[j]) / n) / n
        # row["cov"], not row.cov — .cov is the pandas Series METHOD
        assert row["cov"] == expect  # bit-exact, not approx
