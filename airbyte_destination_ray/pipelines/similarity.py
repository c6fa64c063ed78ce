"""Approximate-nearest-neighbor search over an embedding column.

Three paths, per the build brief:

- :func:`knn_brute_force` — the exact baseline: the (small) query matrix is
  broadcast via ``ray.put`` once and every ``map_batches`` task computes a
  cosine top-k against its batch with one numpy matmul; per-batch partial
  top-ks are reduced by a final per-query ``groupby``.  Work scales linearly
  in corpus size, queries never re-ship per batch.
- :func:`knn_lsh` — data-independent scale path: corpus and queries are
  bucketed by random-hyperplane LSH (multi-probe over the query's
  ``probes`` nearest buckets); only same-bucket pairs are scored, so
  per-query cost drops from O(corpus) to O(bucket).  Recall is tunable via
  ``num_planes``/``probes``.
- :func:`knn_ivf` — data-adaptive scale path (IVF-Flat): a coarse k-means
  quantizer is trained on a deterministic hash-sample of the corpus, the
  centroid matrix is broadcast, and each query is scored only against
  vectors whose nearest centroid is among the query's ``nprobe`` closest
  lists.  Adapts to the data distribution where LSH's random planes don't.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _topk_table(
    query_ids: np.ndarray,
    cand_ids: np.ndarray,
    scores: np.ndarray,
    k: int,
) -> pa.Table:
    """Per-query top-k from flat (query_id, cand_id, score) rows.

    Deterministic tie-break: (-score, cand_id) — matches the SQL oracle's
    ``ORDER BY score DESC, vec_id``.
    """
    order = np.lexsort((cand_ids, -scores, query_ids))
    q_sorted = query_ids[order]
    starts = np.searchsorted(q_sorted, np.unique(q_sorted), side="left")
    rank = np.arange(len(q_sorted)) - np.repeat(
        starts, np.diff(np.append(starts, len(q_sorted)))
    )
    keep = rank < k
    sel = order[keep]
    return pa.table(
        {
            "query_id": pa.array(query_ids[sel], type=pa.int64()),
            "vec_id": pa.array(cand_ids[sel], type=pa.int64()),
            "score": pa.array(np.round(scores[sel], 6)),
            "rank": pa.array((rank[keep] + 1).astype(np.int64)),
        }
    )


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(arr), -1)


def _empty_topk() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "score": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )


def _pack_bucket_bits(proj: np.ndarray) -> np.ndarray:
    """Sign bits of (n, planes) projections → int64 bucket ids (≤ 63 planes)."""
    bits = np.packbits(proj > 0, axis=1, bitorder="little")
    padded = np.zeros((bits.shape[0], 8), dtype=np.uint8)
    padded[:, : bits.shape[1]] = bits
    return padded.view(np.int64).ravel()


def knn_brute_force(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Exact cosine top-k of every query against the corpus Dataset.

    ``queries``: (q, d) float matrix; broadcast once via ``ray.put``.
    Returns a Dataset of (query_id, vec_id, score, rank).
    """
    q_norm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((q_norm, np.asarray(query_ids, dtype=np.int64)))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        qm, qids = ray.get(qref)
        emb = _normalize(_embedding_matrix(batch, embedding_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        scores = qm @ emb.T  # (q, n)
        n = scores.shape[1]
        kk = min(k, n)
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        flat_q = np.repeat(qids, kk)
        flat_c = ids[top.ravel()]
        flat_s = np.take_along_axis(scores, top, axis=1).ravel().astype(np.float64)
        return _topk_table(flat_q, flat_c, flat_s, kk)

    def final(group: pa.Table) -> pa.Table:
        return _topk_table(
            group.column("query_id").to_numpy(zero_copy_only=False),
            group.column("vec_id").to_numpy(zero_copy_only=False),
            group.column("score").to_numpy(zero_copy_only=False),
            k,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("query_id")
        .map_groups(final, batch_format="pyarrow")
    )


def _train_centroids(
    ds,
    *,
    embedding_col: str,
    id_col: str,
    n_centroids: int,
    max_train: int,
    iters: int,
    seed: int,
) -> np.ndarray:
    """Coarse quantizer: deterministic hash-sample of the corpus (replay-
    stable, parallelism-invariant — same trick as ``ops.hash_sample``),
    then a few Lloyd iterations in numpy on the driver.  The sample and the
    centroid matrix are both small (``max_train × d``); the corpus itself
    is never materialized."""
    from .ops import hash_sample

    sampled = hash_sample(ds, key=id_col, percent=25).map_batches(
        lambda b: b.select([embedding_col]),
        batch_format="pyarrow",
        batch_size=None,
    )
    rows = []
    taken = 0
    for b in sampled.iter_batches(batch_format="pyarrow"):
        rows.append(_embedding_matrix(b, embedding_col))
        taken += b.num_rows
        if taken >= max_train:
            break
    if taken == 0:
        # hash sample kept nothing (tiny/adversarial id set): fall back to
        # the first max_train rows rather than crashing
        for b in ds.iter_batches(batch_format="pyarrow"):
            rows.append(_embedding_matrix(b, embedding_col))
            taken += b.num_rows
            if taken >= max_train:
                break
    if taken == 0:
        raise ValueError("knn_ivf: corpus is empty — cannot train centroids")
    train = _normalize(np.concatenate([r for r in rows if len(r)])[:max_train])
    n_centroids = min(n_centroids, len(train))
    rng = np.random.default_rng(seed)
    cent = train[rng.choice(len(train), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(n_centroids):
            members = train[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    nprobe: int = 4,
    train_iters: int = 5,
    max_train: int = 50_000,
    seed: int = 42,
):
    """IVF-Flat ANN: score each query only against corpus vectors assigned
    to its ``nprobe`` nearest centroids.

    At 100 TB use :func:`build_ivf_index` + :func:`knn_ivf_indexed` —
    materialized inverted lists (one Parquet dir per centroid), so
    non-probed lists are never read on repeat-query workloads.
    Here lists are realized per batch, which keeps the pipeline a single
    streaming pass and still cuts the matmul work to ``nprobe/n_centroids``
    of brute force.
    """
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    cent = _train_centroids(
        ds,
        embedding_col=embedding_col,
        id_col=id_col,
        n_centroids=n_centroids,
        max_train=max_train,
        iters=train_iters,
        seed=seed,
    )
    nprobe = min(nprobe, len(cent))
    # list id -> query rows probing it
    qsim = q @ cent.T
    probe_lists = np.argsort(-qsim, axis=1)[:, :nprobe]
    list_queries: dict[int, list[int]] = {}
    for qi, lists in enumerate(probe_lists):
        for l in lists:
            list_queries.setdefault(int(l), []).append(qi)
    ref = ray.put((q, qids, cent, list_queries))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        qm, qid_arr, cm, lq = ray.get(ref)
        emb = _normalize(_embedding_matrix(batch, embedding_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        assign = np.argmax(emb @ cm.T, axis=1)
        out_q, out_c, out_s = [], [], []
        for l in np.unique(assign):
            qrows = lq.get(int(l))
            if not qrows:
                continue
            mask = assign == l
            sub, sub_ids = emb[mask], ids[mask]
            scores = qm[qrows] @ sub.T
            kk = min(k, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qid_arr[qrows], kk))
            out_c.append(sub_ids[top.ravel()])
            out_s.append(
                np.take_along_axis(scores, top, axis=1).ravel().astype(np.float64)
            )
        if not out_q:
            return _empty_topk()
        return _topk_table(
            np.concatenate(out_q),
            np.concatenate(out_c),
            np.concatenate(out_s),
            k,
        )

    def final(group: pa.Table) -> pa.Table:
        return _topk_table(
            group.column("query_id").to_numpy(zero_copy_only=False),
            group.column("vec_id").to_numpy(zero_copy_only=False),
            group.column("score").to_numpy(zero_copy_only=False),
            k,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("query_id")
        .map_groups(final, batch_format="pyarrow")
    )


def build_ivf_index(
    ds,
    index_dir: str,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    train_iters: int = 5,
    max_train: int = 50_000,
    seed: int = 42,
) -> np.ndarray:
    """Materialize IVF inverted lists: train the coarse quantizer, then
    repartition the corpus into one Parquet directory per centroid
    (``list=<id>/``) in a single streaming pass.  Repeat-query workloads
    then read ONLY the probed lists from storage (:func:`knn_ivf_indexed`) —
    the 100 TB refinement noted on :func:`knn_ivf`, which re-scans the whole
    corpus per query batch.  Returns the centroid matrix (also persisted
    next to the lists for query-time reuse)."""
    cent = _train_centroids(
        ds,
        embedding_col=embedding_col,
        id_col=id_col,
        n_centroids=n_centroids,
        max_train=max_train,
        iters=train_iters,
        seed=seed,
    )
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            t = batch.append_column("list", pa.array([], type=pa.int64()))
            return t.append_column("list_p", pa.array([], type=pa.int64()))
        cm = ray.get(cref)
        emb = _normalize(_embedding_matrix(batch, embedding_col))
        lists = np.argmax(emb @ cm.T, axis=1).astype(np.int64)
        # `list` stays physical in the files (hive partition columns are
        # path-only); `list_p` is the partitioning twin that becomes the
        # directory name
        t = batch.append_column("list", pa.array(lists))
        return t.append_column("list_p", pa.array(lists))

    ds.map_batches(assign, batch_format="pyarrow", batch_size=None).write_parquet(
        index_dir, partition_cols=["list_p"]
    )
    from pathlib import Path as _P

    np.save(str(_P(index_dir) / "centroids.npy"), cent)
    return cent


def knn_ivf_indexed(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    nprobe: int = 4,
):
    """ANN over a materialized IVF index (:func:`build_ivf_index`): only the
    union of the queries' ``nprobe`` nearest lists is READ from storage —
    non-probed lists never leave disk, the property the streaming
    :func:`knn_ivf` cannot offer."""
    from pathlib import Path as _P

    cent = np.load(str(_P(index_dir) / "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    nprobe = min(nprobe, len(cent))
    probe_lists = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    list_queries: dict[int, list[int]] = {}
    for qi, lists in enumerate(probe_lists):
        for l in lists:
            list_queries.setdefault(int(l), []).append(qi)
    paths = [
        str(f)
        for l in sorted(list_queries)
        for f in sorted((_P(index_dir) / f"list_p={l}").glob("*.parquet"))
    ]
    if not paths:
        return ray.data.from_arrow(_empty_topk())
    ref = ray.put((q, qids, list_queries))
    corpus = ray.data.read_parquet(paths, columns=[id_col, embedding_col, "list"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        qm, qid_arr, lq = ray.get(ref)
        emb = _normalize(_embedding_matrix(batch, embedding_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        lists = batch.column("list").to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_c, out_s = [], [], []
        for l in np.unique(lists):
            qrows = lq.get(int(l))
            if not qrows:
                continue
            mask = lists == l
            sub, sub_ids = emb[mask], ids[mask]
            scores = qm[qrows] @ sub.T
            kk = min(k, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qid_arr[qrows], kk))
            out_c.append(sub_ids[top.ravel()])
            out_s.append(
                np.take_along_axis(scores, top, axis=1).ravel().astype(np.float64)
            )
        if not out_q:
            return _empty_topk()
        return _topk_table(
            np.concatenate(out_q),
            np.concatenate(out_c),
            np.concatenate(out_s),
            k,
        )

    def final(group: pa.Table) -> pa.Table:
        return _topk_table(
            group.column("query_id").to_numpy(zero_copy_only=False),
            group.column("vec_id").to_numpy(zero_copy_only=False),
            group.column("score").to_numpy(zero_copy_only=False),
            k,
        )

    return (
        corpus.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("query_id")
        .map_groups(final, batch_format="pyarrow")
    )


def knn_lsh(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probes: int | str = 4,
    seed: int = 42,
):
    """LSH-bucketed ANN: score each query only against corpus vectors in its
    ``probes`` most promising hyperplane buckets (the query's own bucket
    plus single-bit flips of its least-confident planes).

    ``probes="all"`` enumerates every bucket per query — exhaustive probing
    degenerates to exact brute force through the same bucketing machinery
    (bucket assignment, per-bucket scoring, per-query reduce), which makes
    the full pipeline hash-verifiable against the exact SQL oracle; partial
    probing (the scale configuration) keeps its recall bound pinned by unit
    tests."""
    if not 1 <= num_planes <= 63:
        raise ValueError("num_planes must be in [1, 63] (int64 bucket ids)")
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    planes_by_dim: dict[int, np.ndarray] = {}

    def planes_for(d: int) -> np.ndarray:
        if d not in planes_by_dim:
            planes_by_dim[d] = (
                np.random.default_rng(seed).standard_normal((d, num_planes))
            ).astype(np.float64)
        return planes_by_dim[d]

    # bucket -> list of query rows that probe it; probes="all" ships a
    # SENTINEL instead of a 2^num_planes dict (at num_planes=20 that dict
    # would be a million-key broadcast of pure overhead — review finding)
    bucket_queries: dict[int, list[int]] | str = {}
    if probes == "all":
        bucket_queries = "__all__"
    else:
        # query bucket set: own bucket + flips of the lowest-|margin| planes
        qproj = q @ planes_for(q.shape[1])
        qbucket = _pack_bucket_bits(qproj)
        flip_order = np.argsort(np.abs(qproj), axis=1)
        probe_buckets = [qbucket]
        for p in range(min(probes - 1, num_planes)):
            probe_buckets.append(qbucket ^ (1 << flip_order[:, p]))
        for buckets in probe_buckets:
            for qi, b in enumerate(buckets):
                bucket_queries.setdefault(int(b), []).append(qi)
    qref = ray.put((q, qids, bucket_queries))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        qm, qid_arr, bq = ray.get(qref)
        emb = _normalize(_embedding_matrix(batch, embedding_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        proj = emb @ planes_for(emb.shape[1])
        cbucket = _pack_bucket_bits(proj)
        out_q, out_c, out_s = [], [], []
        all_rows = list(range(len(qm))) if bq == "__all__" else None
        for b in np.unique(cbucket):
            qrows = all_rows if all_rows is not None else bq.get(int(b))
            if not qrows:
                continue
            mask = cbucket == b
            sub = emb[mask]
            sub_ids = ids[mask]
            scores = qm[qrows] @ sub.T
            kk = min(k, scores.shape[1])
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qid_arr[qrows], kk))
            out_c.append(sub_ids[top.ravel()])
            out_s.append(
                np.take_along_axis(scores, top, axis=1).ravel().astype(np.float64)
            )
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        return _topk_table(
            np.concatenate(out_q),
            np.concatenate(out_c),
            np.concatenate(out_s),
            k,
        )

    def final(group: pa.Table) -> pa.Table:
        return _topk_table(
            group.column("query_id").to_numpy(zero_copy_only=False),
            group.column("vec_id").to_numpy(zero_copy_only=False),
            group.column("score").to_numpy(zero_copy_only=False),
            k,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("query_id")
        .map_groups(final, batch_format="pyarrow")
    )


def cluster_assign(
    ds,
    centroids: np.ndarray,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = False,
    quantize_scale: float | None = None,
):
    """Assign every embedding to its argmax-dot centroid — the cluster
    step of SemDeDup-style corpus curation and of IVF list building, as a
    standalone operator returning ``(id, cluster, dot)``.

    Pure per-batch matmul against the broadcast centroid matrix (small:
    k×d; it rides the task closure — use ``ray.put`` if k×d grows to MBs).
    One streaming pass, no shuffle.  Ties break to the LOWEST cluster
    index (np.argmax first-max), matching the SQL tie-break.

    With ``quantize_scale`` both the embeddings (``floor(x·s + 0.5)``) and
    the supplied INTEGER centroids are exact int64, so the dot products —
    and therefore the assignment — are bit-reproducible and SQL-oracle
    comparable (``list_dot_product`` over the same quantized lists).
    ``normalize`` (float path) L2-normalizes embeddings for cosine argmax
    against unit centroids (k-means on the sphere).
    """
    if quantize_scale is not None and normalize:
        raise ValueError("quantize_scale and normalize are exclusive")
    if quantize_scale is not None:
        cent = centroids.astype(np.int64)
    else:
        cent = centroids.astype(np.float64)
        if normalize:
            cent = _normalize(cent)

    def assign(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, embedding_col)
        if quantize_scale is not None:
            q = np.floor(m.astype(np.float64) * quantize_scale + 0.5).astype(
                np.int64
            )
            dots = q @ cent.T
        else:
            e = m.astype(np.float64)
            if normalize:
                e = _normalize(e)
            dots = e @ cent.T
        best = np.argmax(dots, axis=1)
        score = dots[np.arange(len(best)), best]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(best.astype(np.int64)),
                "dot": pa.array(
                    score.astype(np.int64)
                    if quantize_scale is not None
                    else score
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def kmeans_cluster_sizes(
    ds,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    train_iters: int = 5,
    max_train: int = 50_000,
    seed: int = 42,
):
    """Learned-centroid corpus clustering profile: deterministic
    hash-sampled k-means (same quantizer as IVF — replay-stable,
    parallelism-invariant), then a streaming assignment pass reduced to
    ``(cluster, n)`` sizes via the combiner pattern."""
    from .ops import grouped_count

    cent = _train_centroids(
        ds,
        embedding_col=embedding_col,
        id_col=id_col,
        n_centroids=n_clusters,
        max_train=max_train,
        iters=train_iters,
        seed=seed,
    )
    assigned = cluster_assign(
        ds,
        cent,
        embedding_col=embedding_col,
        id_col=id_col,
        normalize=True,
    )
    return grouped_count(assigned, key="cluster", out_col="n")


def kmeans_sizes_exact(
    ds,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    iters: int = 2,
    quantize_scale: float = 64.0,
):
    """Fixed-point integer Lloyd k-means over the FULL corpus, reduced to
    per-cluster sizes ``(cluster, n)`` — every step is exact int64
    arithmetic under deterministic rules, so an unrolled SQL CTE
    reproduces the result bit-for-bit (the same trick as the fixed-point
    PageRank oracle):

    - quantize ``q = floor(x·scale + 0.5)`` (int64);
    - init centroids = the ``k`` vectors with the SMALLEST ids
      (``ORDER BY id LIMIT k`` — replay-stable and SQL-expressible,
      unlike a hash sample);
    - assign = argmin integer squared distance, ties to the LOWEST
      cluster index;
    - update = per-dimension ``floor(sum / n)`` (exact: |sum| ≪ 2⁵³ so
      the SQL ``floor(sum·1.0/n)`` and the int64 floor-division agree);
      an empty cluster keeps its previous centroid.

    Distribution shape: the seed pass collects per-batch bottom-k
    partials (k rows per block); each Lloyd iteration is one streaming
    pass emitting a k×(d+1) partial per batch (cluster sums + counts),
    reduced driver-side — the classic distributed-k-means combiner, no
    shuffle, centroid matrix (k×d int64, a few KB) rides the closure.
    ``iters`` passes + 1 seed pass + 1 final sizes pass over the corpus.
    """
    k = n_clusters

    def _quant(m: np.ndarray) -> np.ndarray:
        return np.floor(m * quantize_scale + 0.5).astype(np.int64)

    # --- seed pass: k smallest ids (per-batch bottom-k, tiny partials) ---
    def bottom_k(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        m = _embedding_matrix(batch, embedding_col)[take]
        return pa.table(
            {
                id_col: pa.array(ids[take].astype(np.int64)),
                "_q": pa.array(list(_quant(m)), type=pa.list_(pa.int64())),
            }
        )

    parts = ds.map_batches(
        bottom_k, batch_format="pyarrow", batch_size=None
    ).take_all()
    if not parts:  # np.stack([]) would raise an opaque ValueError below
        raise ValueError("kmeans_sizes_exact: corpus is empty")
    seed_ids = np.asarray([r[id_col] for r in parts], dtype=np.int64)
    seed_vecs = np.stack([np.asarray(r["_q"], dtype=np.int64) for r in parts])
    order = np.argsort(seed_ids, kind="stable")[:k]
    cent = seed_vecs[order]  # (k, d) int64, cluster index = id rank
    k = len(cent)  # corpus smaller than n_clusters → fewer centroids

    def _assign(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin ||q - c||² = argmin (-2 q·c + |c|²); np.argmin takes the
        # FIRST minimum → ties break to the lowest cluster index.
        d2 = -2 * (q @ c.T) + (c * c).sum(axis=1)[None, :]
        return np.argmin(d2, axis=1)

    for _ in range(iters):
        c_now = cent  # bind by value: the closure must not see updates

        def partial(batch: pa.Table, c=c_now) -> pa.Table:
            q = _quant(_embedding_matrix(batch, embedding_col))
            a = _assign(q, c)
            sums = np.zeros((len(c), q.shape[1]), dtype=np.int64)
            counts = np.zeros(len(c), dtype=np.int64)
            for j in range(len(c)):  # k iterations, vectorized inside
                m = a == j
                counts[j] = int(m.sum())
                if counts[j]:
                    sums[j] = q[m].sum(axis=0)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                    "_n": pa.array(counts),
                    "_sums": pa.array(list(sums), type=pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ).take_all()
        tot_n = np.zeros(k, dtype=np.int64)
        tot_s = np.zeros_like(cent)
        for r in rows:
            tot_n[r["cluster"]] += r["_n"]
            tot_s[r["cluster"]] += np.asarray(r["_sums"], dtype=np.int64)
        new = cent.copy()  # empty cluster keeps its previous centroid
        nz = tot_n > 0
        new[nz] = np.floor_divide(tot_s[nz], tot_n[nz][:, None])
        cent = new

    # --- final sizes pass (per-batch bincount partials) ---
    c_fin = cent

    def size_partial(batch: pa.Table, c=c_fin) -> pa.Table:
        q = _quant(_embedding_matrix(batch, embedding_col))
        counts = np.bincount(_assign(q, c), minlength=len(c))
        return pa.table(
            {
                "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                "_n": pa.array(counts.astype(np.int64)),
            }
        )

    rows = ds.map_batches(
        size_partial, batch_format="pyarrow", batch_size=None
    ).take_all()
    sizes = np.zeros(k, dtype=np.int64)
    for r in rows:
        sizes[r["cluster"]] += r["_n"]
    keep = sizes > 0  # SQL GROUP BY emits no row for an empty cluster
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int64)[keep]),
            "n": pa.array(sizes[keep]),
        }
    )


def semdedup(
    ds,
    centroids: np.ndarray,
    *,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    quantize_scale: float = 64.0,
    cos2_num: int = 9025,
    cos2_den: int = 10000,
    filter_mode: str = "auto",
):
    """SemDeDup (Abbas et al. 2023): assign every embedding to a centroid,
    then remove within-cluster semantic duplicates — the pairwise check
    never crosses cluster boundaries, which is what makes the quadratic
    verify affordable (Σ c² over cluster sizes, not n²).

    All math is EXACT integer arithmetic so the result is SQL-oracle
    comparable: embeddings quantize as ``floor(x·scale + 0.5)`` (int64),
    cluster = argmax integer dot against the supplied integer centroids
    (lowest index wins ties), and ``cos(a,b) ≥ t`` is evaluated as
    ``dot > 0 AND cos2_den·dot² ≥ cos2_num·|a|²·|b|²`` with
    ``cos2_num/cos2_den = t²`` rational — no sqrt, no float rounding.
    A doc is dropped iff an EARLIER (smaller id) doc in the same cluster
    passes the test (keep-first, same rule as every dedup family).

    Envelope: |q| ≤ scale·|x|; ``cos2_den·dot²`` must fit int64 — at
    d=64, |x|≤1, scale=64 the worst case is ~10¹³·10⁴, three orders under
    2⁶³.  The per-cluster kernel builds the c×c Gram matrix; balanced
    k-means clusters bound c, and at 100 TB an oversized cluster is
    re-sharded by an inner LSH pass before the quadratic step.
    """
    from .dedup import _apply_dup_filter  # circular-safe: function-level

    cent = centroids.astype(np.int64)

    def route(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch, embedding_col)
        q = np.floor(m.astype(np.float64) * quantize_scale + 0.5).astype(
            np.int64
        )
        cluster = np.argmax(q @ cent.T, axis=1).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        qq = q.astype(np.int32)
        n, dim = qq.shape
        offsets = np.arange(n + 1, dtype=np.int32) * (dim * 4)
        qbin = pa.Array.from_buffers(
            pa.binary(),
            n,
            [
                None,
                pa.py_buffer(offsets.tobytes()),
                pa.py_buffer(np.ascontiguousarray(qq).tobytes()),
            ],
        )
        return pa.table(
            {
                "id": batch.column(id_col).cast(pa.int64()),
                "cluster": pa.array(cluster),
                "n2": pa.array(n2, type=pa.int64()),
                "q": qbin,
            }
        )

    def resolve(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table({"dup_id": pa.array([], type=pa.int64())})
        order = pc.sort_indices(group.column("id").combine_chunks())
        g = group.take(order)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        n2 = g.column("n2").to_numpy(zero_copy_only=False)
        arr = g.column("q").combine_chunks()
        buf = np.frombuffer(arr.buffers()[2], dtype=np.int32)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ]
        dim = (offs[1] - offs[0]) // 4
        q = (
            buf[offs[0] // 4 : offs[-1] // 4]
            .reshape(n, dim)
            .astype(np.int64)
        )
        gram = q @ q.T
        cond = (gram > 0) & (
            cos2_den * gram * gram >= cos2_num * np.outer(n2, n2)
        )
        # strictly-lower triangle: does any EARLIER row match?
        dup_mask = np.tril(cond, k=-1).any(axis=1)
        return pa.table(
            {"dup_id": pa.array(ids[dup_mask], type=pa.int64())}
        )

    candidates = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=None)
        .groupby("cluster")
        .map_groups(resolve, batch_format="pyarrow")
    )
    return _apply_dup_filter(ds, id_col, candidates, filter_mode)


def embedding_covariance(
    ds,
    *,
    col: str = "embedding",
    scale: int = 10_000,
    upper_only: bool = True,
):
    """Distributed covariance of an embedding column in FIXED POINT:
    each batch quantizes to ``floor(x·scale)`` int64 and contributes exact
    integer power sums (n, Σxᵢ, Σxᵢxⱼ via one d×d matmul per batch);
    the driver folds the aggregate-sized partials (O(d²) ints) and emits
    one row per (i ≤ j) pair with the integer sums AND the covariance as a
    FIXED IEEE sequence ``(sxy − sx·sy/n)/n`` over float64 — the same
    operand order the SQL oracle writes, so the float column hashes
    identically.  No shuffle at all: the exchange is the partial rows.

    Population covariance of the QUANTIZED values (divide by ``scale²``
    for the approximate raw-scale covariance); exactness of the sums is
    what makes a 100-TB run reproducible bit-for-bit.
    """
    d_holder: dict = {}

    def partial(batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch, col)
        q = np.floor(x.astype(np.float64) * scale).astype(np.int64)
        g = q.T @ q  # d×d int64
        s = q.sum(axis=0)
        d = q.shape[1]
        return pa.table(
            {
                "n": pa.array([q.shape[0]], type=pa.int64()),
                "d": pa.array([d], type=pa.int64()),
                "s": pa.array([s.tolist()], type=pa.list_(pa.int64())),
                "g": pa.array([g.ravel().tolist()], type=pa.list_(pa.int64())),
            }
        )

    n_total = 0
    s_total = None
    g_total = None
    for t in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for r in range(t.num_rows):
            n_total += int(t.column("n")[r].as_py())
            d = int(t.column("d")[r].as_py())
            s = np.array(t.column("s")[r].as_py(), dtype=np.int64)
            g = np.array(t.column("g")[r].as_py(), dtype=np.int64).reshape(d, d)
            s_total = s if s_total is None else s_total + s
            g_total = g if g_total is None else g_total + g
    if g_total is None:
        return pa.table(
            {
                "i": pa.array([], type=pa.int64()),
                "j": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "sum_i": pa.array([], type=pa.int64()),
                "sum_j": pa.array([], type=pa.int64()),
                "sum_ij": pa.array([], type=pa.int64()),
                "cov": pa.array([], type=pa.float64()),
            }
        )
    d = len(s_total)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()
    if upper_only:
        keep = ii <= jj
        ii, jj = ii[keep], jj[keep]
    sx = s_total[ii].astype(np.float64)
    sy = s_total[jj].astype(np.float64)
    sxy = g_total[ii, jj].astype(np.float64)
    nf = np.float64(n_total)
    cov = (sxy - sx * sy / nf) / nf
    return pa.table(
        {
            "i": pa.array(ii.astype(np.int64)),
            "j": pa.array(jj.astype(np.int64)),
            "n": pa.array(np.full(len(ii), n_total, dtype=np.int64)),
            "sum_i": pa.array(s_total[ii]),
            "sum_j": pa.array(s_total[jj]),
            "sum_ij": pa.array(g_total[ii, jj]),
            "cov": pa.array(cov, type=pa.float64()),
        }
    )


def radius_search(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    threshold: float = 0.3,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Cosine range query: every (query, vector) pair with similarity
    ≥ ``threshold`` (the radius/range-search dual of ``knn_brute_force``
    — fixed similarity bound instead of fixed k).

    Shape: the query matrix broadcasts once via ``ray.put``; each batch
    is one matmul + one boolean mask — per-pair, embarrassingly
    parallel, ZERO shuffle (no per-query reduce exists: the predicate is
    local).  Returns (query_id, vec_id) pairs only; scores are withheld
    because cross-engine fp rounding makes them hash-unsafe while the
    ≥-threshold set is stable whenever the corpus has margin around the
    bound (pick thresholds away from realized scores).
    """
    q_norm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((q_norm, np.asarray(query_ids, dtype=np.int64)))

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        qm, qids = ray.get(qref)
        emb = _normalize(_embedding_matrix(batch, embedding_col))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        scores = qm @ emb.T  # (q, n)
        qi, ci = np.nonzero(scores >= threshold)
        if len(qi) == 0:
            return empty
        return pa.table(
            {
                "query_id": pa.array(qids[qi], type=pa.int64()),
                "vec_id": pa.array(ids[ci], type=pa.int64()),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
