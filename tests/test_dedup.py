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
