"""Distributed graph connectivity — the clustering step of near-duplicate
grouping (MinHash/Jaccard pipelines keep ONE doc per connected component of
the similarity graph, not per pair: A~B and B~C must collapse A,B,C even
when A!~C).

Ray Data has no iterative graph primitive; this is the build brief's
custom-operator tier (a): min-label propagation where every iteration is
one keyed shuffle-join (labels onto the symmetrized edge list) plus one
aggregate-sized min-reduce.  Labels only decrease, so Σlabels is a cheap
monotone convergence metric; rounds = graph diameter (near-dup graphs are
small cliques and short chains — 2–4 rounds in practice).  Per-iteration
label materialization is O(nodes), the iterative-algorithm standard; the
edge list streams unmaterialized each round.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .relational import DEFAULT_NUM_PARTITIONS, shuffle_join


def _grouped_min(ds, *, key: str, value_col: str, num_partitions: int = 64):
    """MIN(value) per key with the per-batch combiner — exchange carries
    one row per (key, batch).  PARTITION-LEVEL final reduce (hash route +
    one vectorized Arrow group_by per partition): keys here are NODES, so
    a per-key ``map_groups`` would cost one Python call per document in a
    near-dup graph — and this runs every propagation round."""
    from ..functions.hashing import partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select([key, value_col])
            .group_by(key)
            .aggregate([(value_col, "min")])
            .rename_columns([key, value_col])
        )
        parts = partition_ids(t.column(key), num_partitions)
        return t.append_column("_gpart", pa.array(parts, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_gpart"])
            .group_by(key)
            .aggregate([(value_col, "min")])
            .rename_columns([key, value_col])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_gpart")
        .map_groups(final, batch_format="pyarrow")
    )


def connected_components(
    edges_ds,
    *,
    src: str = "ia",
    dst: str = "ib",
    nodes_ds=None,
    node_col: str | None = None,
    max_iters: int = 50,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Connected components by iterative min-label propagation: returns a
    Dataset ``(node, component)`` where ``component`` is the minimum node
    id reachable from ``node``.

    ``edges_ds`` supplies undirected edges (one direction is enough — they
    are symmetrized here); ``nodes_ds``/``node_col`` optionally adds the
    node universe so isolated nodes appear as their own singleton
    component.  Self-loops and null endpoints are dropped.

    Per iteration: labels shuffle-join onto the edges (ONE exchange of the
    edge list), each edge forwards its endpoint's current label to the
    other endpoint, and a combiner-style min-reduce folds messages with the
    previous labels.  Convergence = Σlabels unchanged (labels are monotone
    non-increasing).  The labels dataset is materialized once per round —
    O(nodes), never the payload.
    """
    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        t = pa.table({"a": a, "b": b})
        keep = pc.and_(
            pc.and_(a.is_valid() if isinstance(a, pa.Array) else pc.is_valid(a),
                    pc.is_valid(b)),
            pc.not_equal(a, b),
        )
        t = t.filter(keep)
        rev = pa.table({"a": t.column("b"), "b": t.column("a")})
        return pa.concat_tables([t, rev])

    edges = edges_ds.map_batches(sym, batch_format="pyarrow", batch_size=None)

    def endpoints(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays(
            [
                batch.column("a").combine_chunks(),
                batch.column("b").combine_chunks(),
            ]
        ).unique()
        return pa.table({"node": vals})

    node_sources = [
        edges.map_batches(endpoints, batch_format="pyarrow", batch_size=None)
    ]
    if nodes_ds is not None:
        if node_col is None:
            raise ValueError("node_col required with nodes_ds")
        node_sources.append(
            nodes_ds.map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column(node_col)
                        .cast(pa.int64())
                        .combine_chunks()
                        .drop_null()
                        .unique()
                    }
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        )
    nodes = node_sources[0]
    for extra in node_sources[1:]:
        nodes = nodes.union(extra)

    # Materialize the symmetrized edge list ONCE (it is re-scanned every
    # round) and re-materialize labels each round.  Both are compacted to a
    # bounded block count: groupby output otherwise fans out into hundreds
    # of tiny blocks, and the NEXT round's exchange pays a task per block —
    # the iteration cost becomes O(blocks), not O(data) (the same
    # small-input oversplit read_parquet_sized exists for).
    label_blocks = max(4, num_partitions // 4)
    edges = edges.repartition(label_blocks).materialize()
    labels = (
        _grouped_min(
            nodes.map_batches(
                lambda b: b.append_column("comp", b.column("node")),
                batch_format="pyarrow",
                batch_size=None,
            ),
            key="node",
            value_col="comp",
        )
        .repartition(label_blocks)
        .materialize()
    )
    prev_sum = labels.sum("comp")

    for _ in range(max_iters):
        msgs = shuffle_join(
            edges,
            labels,
            left_on="a",
            right_on="node",
            select=["b", "comp"],
            hot_keys=None,
            num_partitions=num_partitions,
        ).map_batches(
            lambda t: t.rename_columns(["node", "comp"]),
            batch_format="pyarrow",
            batch_size=None,
        )
        new_labels = (
            _grouped_min(labels.union(msgs), key="node", value_col="comp")
            .repartition(label_blocks)
            .materialize()
        )
        new_sum = new_labels.sum("comp")
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        # exhausting max_iters without the Σ-labels fixpoint means some
        # component is still split — refuse to hand back wrong clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters"
        )
    return labels


def pagerank_fixed_point(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000_000,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """PageRank in EXACT fixed-point arithmetic — link analysis for crawl
    prioritization / host authority, with every iteration bit-reproducible
    in SQL (which is what makes an iterative graph algorithm
    oracle-checkable: float power iteration would drift by summation
    order)::

        r_0(v)     = scale
        contrib(u) = (r_k(u) · damping_num) // (damping_den · outdeg(u))
        r_{k+1}(v) = ((damping_den − damping_num) · scale) // damping_den
                     + Σ_{u→v} contrib(u)

    Integer floor division and integer sums are order-independent, so the
    distributed fold equals the unrolled SQL CTE chain exactly.  Dangling
    nodes keep receiving the base term but leak their own mass (the
    standard simple variant; the reweighted variant adds a global scalar
    per round).  Parallel edges contribute once each (multigraph
    semantics, matched by the oracle).

    Per iteration: one shuffle join (ranks onto edges by ``src`` — hot
    sources replicate via the join's skew split if asked) and one
    aggregate-sized sum exchange by ``dst``; the edge list is repartitioned
    + materialized ONCE and re-streamed each round; ranks are O(nodes).
    Envelope: ``r·damping_num`` must stay under 2⁶³ — with ``scale=10⁹``
    that allows a node to concentrate ~10⁸× the average mass before
    overflow, far past any real web graph; lower ``scale`` to widen it.
    """
    import numpy as np

    from ..functions.hashing import partition_ids

    def edge_env(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "src": batch.column(src),
                "dst": batch.column(dst),
            }
        )
        t = t.filter(
            pc.and_(
                t.column("src").combine_chunks().is_valid(),
                t.column("dst").combine_chunks().is_valid(),
            )
        )
        parts = partition_ids(t.column("src"), num_partitions)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    edges = edges_ds.map_batches(
        edge_env, batch_format="pyarrow", batch_size=None
    ).materialize()

    # out-degree per source (one aggregate exchange, reused every round)
    def deg_partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select(["src", "_part"])
            .group_by(["src", "_part"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "src": g.column("src"),
                "d": g.column("count_all").cast(pa.int64()),
                "_part": g.column("_part"),
            }
        )

    def deg_final(group: pa.Table) -> pa.Table:
        g = group.group_by(["src", "_part"], use_threads=False).aggregate(
            [("d", "sum")]
        )
        return pa.table(
            {
                "src": g.column("src"),
                "d": g.column("d_sum"),
                "_part": g.column("_part"),
            }
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(deg_final, batch_format="pyarrow")
        .materialize()
    )

    # node set = distinct src ∪ dst, partitioned by node hash
    def node_env(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays(
            [
                batch.column("src").combine_chunks(),
                batch.column("dst").combine_chunks(),
            ]
        ).unique()
        parts = partition_ids(vals, num_partitions)
        return pa.table(
            {
                "node": vals,
                "_npart": pa.array(parts, type=pa.int64()),
            }
        )

    def node_dedup(group: pa.Table) -> pa.Table:
        vals = group.column("node").combine_chunks().unique()
        return pa.table(
            {
                "node": vals,
                "_npart": pa.array(
                    np.full(len(vals), group.column("_npart")[0].as_py()),
                    type=pa.int64(),
                ),
            }
        )

    nodes = (
        edges.map_batches(node_env, batch_format="pyarrow", batch_size=None)
        .groupby("_npart")
        .map_groups(node_dedup, batch_format="pyarrow")
        .materialize()
    )

    base = ((damping_den - damping_num) * scale) // damping_den

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "r": pa.array(
                    np.full(batch.num_rows, scale, dtype=np.int64)
                ),
                "_npart": batch.column("_npart"),
            }
        )

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow", batch_size=None
    ).materialize()

    # capture the TYPE, never the Dataset handle, in worker closures
    _es = edges.schema()
    dst_type = dict(zip(_es.names, _es.types))["dst"]

    for _ in range(iters):
        # 1. join ranks+deg onto edges by src (all three share _part on
        #    hash(src) / hash(node) — one co-locating exchange)
        def rank_env(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("node"),
                    "dst": pa.nulls(batch.num_rows, dst_type),
                    "r": batch.column("r"),
                    "d": pa.nulls(batch.num_rows, pa.int64()),
                    "_part": batch.column("_npart"),
                    "_tag": pa.array(
                        np.full(batch.num_rows, 1, dtype=np.int8)
                    ),
                }
            )

        def edge_tag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("src"),
                    "dst": batch.column("dst"),
                    "r": pa.nulls(batch.num_rows, pa.int64()),
                    "d": pa.nulls(batch.num_rows, pa.int64()),
                    "_part": batch.column("_part"),
                    "_tag": pa.array(
                        np.full(batch.num_rows, 0, dtype=np.int8)
                    ),
                }
            )

        def deg_tag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("src"),
                    "dst": pa.nulls(batch.num_rows, dst_type),
                    "r": pa.nulls(batch.num_rows, pa.int64()),
                    "d": batch.column("d"),
                    "_part": batch.column("_part"),
                    "_tag": pa.array(
                        np.full(batch.num_rows, 2, dtype=np.int8)
                    ),
                }
            )

        env = (
            edges.map_batches(edge_tag, batch_format="pyarrow", batch_size=None)
            .union(
                ranks.map_batches(
                    rank_env, batch_format="pyarrow", batch_size=None
                )
            )
            .union(
                deg.map_batches(deg_tag, batch_format="pyarrow", batch_size=None)
            )
        )

        def contribs(group: pa.Table) -> pa.Table:
            tag = group.column("_tag").to_numpy(zero_copy_only=False)
            e = group.filter(pa.array(tag == 0))
            rk = group.filter(pa.array(tag == 1))
            dg = group.filter(pa.array(tag == 2))
            if e.num_rows == 0:
                return pa.table(
                    {
                        "dst": pa.array([], e.schema.field("dst").type),
                        "c": pa.array([], pa.int64()),
                    }
                )
            # per-source contribution via sorted lookup
            r_src = rk.column("src").combine_chunks()
            r_ord = pc.sort_indices(r_src)
            r_src_s = r_src.take(r_ord)
            r_val = rk.column("r").combine_chunks().take(r_ord).to_numpy(
                zero_copy_only=False
            )
            d_src = dg.column("src").combine_chunks()
            d_ord = pc.sort_indices(d_src)
            d_src_s = d_src.take(d_ord)
            d_val = dg.column("d").combine_chunks().take(d_ord).to_numpy(
                zero_copy_only=False
            )
            # ranks and degrees cover exactly the sources present (deg by
            # construction; ranks cover all nodes) — index both
            es = e.column("src").combine_chunks()
            ei = pc.index_in(es, value_set=r_src_s).to_numpy(
                zero_copy_only=False
            )
            di = pc.index_in(es, value_set=d_src_s).to_numpy(
                zero_copy_only=False
            )
            r_e = r_val[ei]
            d_e = d_val[di]
            c = (r_e * np.int64(damping_num)) // (
                np.int64(damping_den) * d_e
            )
            return pa.table(
                {"dst": e.column("dst"), "c": pa.array(c, type=pa.int64())}
            )

        contrib_ds = env.groupby("_part").map_groups(
            contribs, batch_format="pyarrow"
        )

        # 2. sum contributions per dst + base term over ALL nodes
        def contrib_env(batch: pa.Table) -> pa.Table:
            g = batch.group_by("dst", use_threads=False).aggregate(
                [("c", "sum")]
            )
            parts = partition_ids(g.column("dst"), num_partitions)
            return pa.table(
                {
                    "node": g.column("dst"),
                    "c": g.column("c_sum"),
                    "_npart": pa.array(parts, type=pa.int64()),
                }
            )

        def zero_env(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch.column("node"),
                    "c": pa.array(
                        np.zeros(batch.num_rows, dtype=np.int64)
                    ),
                    "_npart": batch.column("_npart"),
                }
            )

        env2 = contrib_ds.map_batches(
            contrib_env, batch_format="pyarrow", batch_size=None
        ).union(
            nodes.map_batches(zero_env, batch_format="pyarrow", batch_size=None)
        )

        def fold(group: pa.Table) -> pa.Table:
            g = group.group_by(["node", "_npart"], use_threads=False).aggregate(
                [("c", "sum")]
            )
            r = g.column("c_sum").to_numpy(zero_copy_only=False) + np.int64(
                base
            )
            return pa.table(
                {
                    "node": g.column("node"),
                    "r": pa.array(r, type=pa.int64()),
                    "_npart": g.column("_npart"),
                }
            )

        ranks = (
            env2.groupby("_npart")
            .map_groups(fold, batch_format="pyarrow")
            .materialize()
        )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "r"])

    return ranks.map_batches(project, batch_format="pyarrow", batch_size=None)


def canonical_edges(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Canonical distinct undirected edge set ``(a=min, b=max)`` — drops
    nulls and self-loops, per-batch dedup first, then ONE composite-hash
    exchange so each edge lands exactly once.  Shared front end of every
    simple-graph operator (triangles, degree distribution)."""
    import numpy as np

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src)
        d = batch.column(dst)
        valid = pc.and_(s.is_valid(), d.is_valid())
        t = pa.table({"s": s, "d": d}).filter(valid)
        sn = t.column("s").combine_chunks().to_numpy(zero_copy_only=False)
        dn = t.column("d").combine_chunks().to_numpy(zero_copy_only=False)
        keep = sn != dn
        sn, dn = sn[keep], dn[keep]
        a = np.minimum(sn, dn).astype(np.int64)
        b = np.maximum(sn, dn).astype(np.int64)
        t = pa.table({"a": a, "b": b}).group_by(["a", "b"]).aggregate([])
        an = t.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        bn = t.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = an ^ (bn * np.uint64(0x9E3779B97F4A7C15))
        parts = (mixed % np.uint64(num_partitions)).astype(np.int64)
        return t.append_column("_part", pa.array(parts, type=pa.int64()))

    def dedup_part(group: pa.Table) -> pa.Table:
        return group.group_by(["a", "b"]).aggregate(
            [("_part", "min")]
        ).rename_columns(["a", "b", "_part"])

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(dedup_part, batch_format="pyarrow")
    )


def degree_histogram(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Degree distribution of the simple undirected graph: how many nodes
    have degree d, for every observed d.

    Pipeline: canonical distinct edges (one composite-hash exchange) →
    per-batch endpoint-count partials → exact per-node degree via the
    partition-level ``grouped_sum`` reduce (O(nodes) rows on the exchange,
    never edges) → a second aggregate-sized ``grouped_sum`` folding degrees
    into the histogram.  Output: ``(degree, n_nodes)``."""
    import numpy as np

    from .ops import grouped_sum

    edges = canonical_edges(
        edges_ds, src=src, dst=dst, num_partitions=num_partitions
    )

    def endpoint_counts(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        nodes, counts = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "_n": pa.array(counts.astype(np.int64)),
            }
        )

    degrees = grouped_sum(
        edges.map_batches(
            endpoint_counts, batch_format="pyarrow", batch_size=None
        ),
        key="node",
        value_col="_n",
        out_col="degree",
        num_partitions=num_partitions,
    )

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "degree": batch.column("degree"),
                "_one": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )

    return grouped_sum(
        degrees.map_batches(ones, batch_format="pyarrow", batch_size=None),
        key="degree",
        value_col="_one",
        out_col="n_nodes",
        num_partitions=num_partitions,
    )


def triangle_counts(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Per-node triangle counts via the classic degree-oriented wedge
    enumeration (Cohen / MapReduce triangle counting; Suri–Vassilvitskii):

    1. canonicalize edges (drop self-loops / nulls, ``a=min, b=max``,
       distinct) — ONE hash exchange, materialized once and reused for all
       three downstream passes;
    2. degrees per node (per-batch combiner, aggregate-sized) — broadcast
       as the orientation key.  The degree map is O(nodes) ints; for
       billion-node graphs swap the broadcast for a shuffle join of
       degrees onto edges (same orientation rule, one more exchange);
    3. orient each edge from its lower-(degree, id) endpoint — every
       wedge is then generated at its lowest-degree apex, bounding
       out-degree by O(√m) and total wedges by O(m^1.5) regardless of
       skew (a hub of degree d generates 0 wedges as apex once oriented
       away from it);
    4. wedge pairs per apex (keyed exchange on apex, vectorized per-apex
       ``triu_indices`` expansion) union'd with the canonical edge set,
       co-partitioned by the closing pair ``(a, b)`` — a structured-dtype
       ``searchsorted`` marks closed wedges = triangles;
    5. each triangle credits all three corners; a final per-node sum
       (per-batch combiner) emits ``(node, n_triangles)``.

    Exact (no sampling), SQL-oracle-checkable with the 3-way self-join on
    the canonical edge list.
    """
    import numpy as np

    import ray

    from ..functions.hashing import stable_hash_array
    from .ops import grouped_sum

    edges = canonical_edges(
        edges_ds, src=src, dst=dst, num_partitions=num_partitions
    ).materialize()  # reused 3×: degrees, wedges, closing-edge side

    # --- degrees (aggregate-sized driver reduce, broadcast) ---
    def deg_partial(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        nodes, counts = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    parts = list(
        edges.map_batches(
            deg_partial, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    )
    if parts:
        # vectorized fold (a per-row Python dict loop here is the O(nodes)
        # driver cost the partition-level reduces elsewhere exist to avoid)
        folded = (
            pa.concat_tables(parts)
            .group_by("node")
            .aggregate([("n", "sum")])
            .rename_columns(["node", "n"])
            .sort_by("node")
        )
        nodes_arr = folded.column("node").to_numpy(zero_copy_only=False)
        deg_arr = folded.column("n").to_numpy(zero_copy_only=False)
    else:
        nodes_arr = np.array([], dtype=np.int64)
        deg_arr = np.array([], dtype=np.int64)
    deg_ref = ray.put((nodes_arr, deg_arr))

    # --- orient + wedge expansion, keyed on the apex ---
    def orient(batch: pa.Table) -> pa.Table:
        nodes_b, deg_b = ray.get(deg_ref)
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        da = deg_b[np.searchsorted(nodes_b, a)]
        db = deg_b[np.searchsorted(nodes_b, b)]
        # u = lower (deg, id) endpoint → apex side
        a_first = (da < db) | ((da == db) & (a < b))
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        t = pa.table(
            {
                "u": pa.array(u, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
            }
        )
        parts = (stable_hash_array(u) % np.uint64(num_partitions)).astype(
            np.int64
        )
        return t.append_column("_apart", pa.array(parts, type=pa.int64()))

    def wedges(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("u", "ascending"), ("v", "ascending")])
        t = group.take(idx)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "apex": pa.array([], type=pa.int64()),
                }
            )
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]])
        )
        ends = np.append(starts[1:], n)
        wa, wb, wapex = [], [], []
        for s0, e0 in zip(starts, ends):
            m = e0 - s0
            if m < 2:
                continue
            i, j = np.triu_indices(m, 1)
            vs = v[s0:e0]
            wa.append(vs[i])  # v sorted asc per apex → vs[i] < vs[j]
            wb.append(vs[j])
            wapex.append(np.full(len(i), u[s0], dtype=np.int64))
        if not wa:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "apex": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(wa), type=pa.int64()),
                "b": pa.array(np.concatenate(wb), type=pa.int64()),
                "apex": pa.array(np.concatenate(wapex), type=pa.int64()),
            }
        )

    wedge_ds = (
        edges.map_batches(orient, batch_format="pyarrow", batch_size=None)
        .groupby("_apart")
        .map_groups(wedges, batch_format="pyarrow")
    )

    # --- co-partition wedges + edges by the closing pair, close wedges ---
    def env_wedge(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = a ^ (b * np.uint64(0x9E3779B97F4A7C15))
        parts = (mixed % np.uint64(num_partitions)).astype(np.int64)
        return batch.append_column("_cpart", pa.array(parts, type=pa.int64()))

    def env_edge(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "apex": pa.nulls(batch.num_rows, pa.int64()),
            }
        )
        return env_wedge(t)

    pair_dtype = [("a", np.int64), ("b", np.int64)]

    def close(group: pa.Table) -> pa.Table:
        apex_arr = group.column("apex")
        is_edge = pc.is_null(apex_arr).to_numpy(zero_copy_only=False)
        ga = group.column("a").to_numpy(zero_copy_only=False)
        gb = group.column("b").to_numpy(zero_copy_only=False)
        ev = np.ascontiguousarray(
            np.stack([ga[is_edge], gb[is_edge]], 1)
        ).view(pair_dtype).ravel()
        wmask = ~is_edge
        if not wmask.any() or len(ev) == 0:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        wv = np.ascontiguousarray(
            np.stack([ga[wmask], gb[wmask]], 1)
        ).view(pair_dtype).ravel()
        ev.sort()
        pos = np.minimum(np.searchsorted(ev, wv), len(ev) - 1)
        closed = ev[pos] == wv
        apex = pc.fill_null(apex_arr, 0).to_numpy(zero_copy_only=False)[
            wmask
        ][closed]
        ta = ga[wmask][closed]
        tb = gb[wmask][closed]
        corners = np.concatenate([apex, ta, tb])
        nodes_u, counts = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes_u, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    env = wedge_ds.map_batches(
        env_wedge, batch_format="pyarrow", batch_size=None
    ).union(edges.map_batches(env_edge, batch_format="pyarrow", batch_size=None))
    partials = env.groupby("_cpart").map_groups(close, batch_format="pyarrow")
    return grouped_sum(partials, key="node", value_col="n", out_col="n_triangles")


def common_neighbors_link_prediction(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    max_center_degree: int | None = None,
):
    """Link prediction by common-neighbor count: every non-edge pair
    ``(u, v)`` sharing at least ``min_common`` neighbors, with its exact
    integer score — the classic graph-completion candidate generator.
    (Adamic–Adar's ``1/ln(deg)`` weighting is deliberately NOT applied:
    libm ``ln`` differs across engines, while the raw count is
    hash-exact against a SQL oracle; rank by the count and weight
    downstream if needed.)

    Shape: canonical edges (one exchange, materialized once, reused for
    adjacency and the exclusion side) → adjacency keyed on the wedge
    CENTER (one exchange; per-center sorted-neighbor ``triu`` expansion
    — Σ deg(w)² candidate pairs, the exact-algorithm cost) → pair-keyed
    co-partition with the edge set (one exchange) where multiplicities
    fold per pair and existing edges are excluded via structured-dtype
    ``searchsorted``.  ``max_center_degree`` skips hub centers above the
    cap (a documented approximation for power-law graphs where exact
    Σ deg² is not affordable; None = exact).
    """
    import numpy as np

    from ..functions.hashing import stable_hash_array

    edges = canonical_edges(
        edges_ds, src=src, dst=dst, num_partitions=num_partitions
    ).materialize()

    def adj(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        w = np.concatenate([a, b])
        n = np.concatenate([b, a])
        parts = (stable_hash_array(w) % np.uint64(num_partitions)).astype(
            np.int64
        )
        return pa.table(
            {
                "w": pa.array(w, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "_apart": pa.array(parts, type=pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        w = group.column("w").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, w))
        w, n = w[order], n[order]
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
            }
        )
        if len(w) == 0:
            return empty
        starts = np.flatnonzero(np.concatenate([[True], w[1:] != w[:-1]]))
        ends = np.append(starts[1:], len(w))
        pa_, pb_ = [], []
        for s0, e0 in zip(starts, ends):
            m = e0 - s0
            if m < 2 or (max_center_degree and m > max_center_degree):
                continue
            i, j = np.triu_indices(m, 1)
            vs = n[s0:e0]  # sorted asc → vs[i] < vs[j]: canonical pairs
            pa_.append(vs[i])
            pb_.append(vs[j])
        if not pa_:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(pa_), type=pa.int64()),
                "b": pa.array(np.concatenate(pb_), type=pa.int64()),
            }
        )

    wedge_ds = (
        edges.map_batches(adj, batch_format="pyarrow", batch_size=None)
        .groupby("_apart")
        .map_groups(pairs, batch_format="pyarrow")
    )

    def env_pair(batch: pa.Table, is_edge: bool) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = a ^ (b * np.uint64(0x9E3779B97F4A7C15))
        parts = (mixed % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "_s": pa.array(
                    np.full(batch.num_rows, 1 if is_edge else 0, np.int8)
                ),
                "_cpart": pa.array(parts, type=pa.int64()),
            }
        )

    pair_dtype = [("a", np.int64), ("b", np.int64)]

    def resolve(group: pa.Table) -> pa.Table:
        s = group.column("_s").to_numpy(zero_copy_only=False)
        ga = group.column("a").to_numpy(zero_copy_only=False)
        gb = group.column("b").to_numpy(zero_copy_only=False)
        wmask = s == 0
        empty = pa.table(
            {
                "u": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
                "common_neighbors": pa.array([], type=pa.int64()),
            }
        )
        if not wmask.any():
            return empty
        wv = np.ascontiguousarray(
            np.stack([ga[wmask], gb[wmask]], 1)
        ).view(pair_dtype).ravel()
        uniq, counts = np.unique(wv, return_counts=True)
        keep = counts >= min_common
        uniq, counts = uniq[keep], counts[keep]
        if len(uniq) == 0:
            return empty
        emask = ~wmask
        if emask.any():
            ev = np.sort(
                np.ascontiguousarray(np.stack([ga[emask], gb[emask]], 1))
                .view(pair_dtype)
                .ravel()
            )
            pos = np.minimum(np.searchsorted(ev, uniq), len(ev) - 1)
            existing = ev[pos] == uniq
            uniq, counts = uniq[~existing], counts[~existing]
        return pa.table(
            {
                "u": pa.array(uniq["a"], type=pa.int64()),
                "v": pa.array(uniq["b"], type=pa.int64()),
                "common_neighbors": pa.array(counts.astype(np.int64)),
            }
        )

    env = wedge_ds.map_batches(
        lambda b: env_pair(b, False), batch_format="pyarrow", batch_size=None
    ).union(
        edges.map_batches(
            lambda b: env_pair(b, True), batch_format="pyarrow", batch_size=None
        )
    )
    return env.groupby("_cpart").map_groups(resolve, batch_format="pyarrow")


def _canonical_edges(
    edges_ds,
    *,
    src: str,
    dst: str,
    num_partitions: int,
    blocks: int,
):
    """Symmetrized simple half-edge list ``(a, b)``: self-loops and null
    endpoints dropped, per-batch pre-dedup, global distinct per hash(a)
    partition (one exchange), materialized at a bounded block count."""

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        t = pa.table({"a": a, "b": b})
        keep = pc.and_(
            pc.and_(pc.is_valid(a), pc.is_valid(b)),
            pc.not_equal(a, b),
        )
        t = t.filter(keep)
        rev = pa.table({"a": t.column("b"), "b": t.column("a")})
        both = pa.concat_tables([t, rev])
        both = both.group_by(["a", "b"]).aggregate([])
        from ..functions.hashing import partition_ids

        parts = partition_ids(both.column("a"), num_partitions)
        return both.append_column("_part", pa.array(parts, type=pa.int64()))

    def distinct(group: pa.Table) -> pa.Table:
        return (
            group.drop_columns(["_part"])
            .group_by(["a", "b"])
            .aggregate([])
        )

    return (
        edges_ds.map_batches(sym, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(distinct, batch_format="pyarrow")
        .repartition(blocks)
        .materialize()
    )


def _degree_counts(eds, *, num_partitions: int):
    """Per-node degree over canonical half-edges — per-batch combiner +
    partition-level fold, returns ``(node, n)``."""

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["a"]).group_by("a").aggregate([([], "count_all")])
        return pa.table(
            {
                "node": g.column("a"),
                "n": g.column("count_all").cast(pa.int64()),
            }
        )

    def deg_route(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import partition_ids

        parts = partition_ids(batch.column("node"), num_partitions)
        return batch.append_column("_part", pa.array(parts, type=pa.int64()))

    def deg_fold(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by("node")
            .aggregate([("n", "sum")])
        )
        return pa.table(
            {
                "node": g.column("node"),
                "n": g.column("n_sum").cast(pa.int64()),
            }
        )

    return (
        eds.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .map_batches(deg_route, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(deg_fold, batch_format="pyarrow")
    )


def k_core(
    edges_ds,
    *,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 100,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """k-core membership: iteratively peel nodes of degree < ``k`` from
    the undirected simple graph until the remaining subgraph has minimum
    degree ≥ k; returns ``(node, degree)`` for the surviving core (empty
    when the graph has no k-core) — the community/spam-ring density
    primitive.

    Canonical half-edges (symmetrized, self-loops dropped, distinct per
    hash(a) partition — one exchange) are materialized once.  Per round:
    degrees from a partition-level grouped count, the alive set (deg ≥ k,
    O(nodes), materialized like the components labels), and TWO unique-key
    shuffle joins that keep only edges with both endpoints alive —
    O(edges) work per round, no node set ever on the driver.  Peeling is
    monotone, so an unchanged edge count is the fixpoint; exhausting
    ``max_iters`` raises rather than returning a half-peeled graph.
    """
    blocks = max(4, num_partitions // 4)
    edges = _canonical_edges(
        edges_ds, src=src, dst=dst,
        num_partitions=num_partitions, blocks=blocks,
    )

    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    node_schema = pa.schema([("node", pa.int64())])

    prev_m = edges.count()
    for _ in range(max_iters):
        deg = _degree_counts(edges, num_partitions=num_partitions)
        alive = (
            deg.map_batches(
                lambda b: b.filter(
                    pc.greater_equal(b.column("n"), k)
                ).select(["node"]),
                batch_format="pyarrow",
                batch_size=None,
            )
            .repartition(blocks)
            .materialize()
        )
        e1 = shuffle_join(
            edges,
            alive,
            left_on="a",
            right_on="node",
            select=["a", "b"],
            hot_keys=None,
            num_partitions=num_partitions,
            left_schema=edge_schema,
            right_schema=node_schema,
        )
        edges_new = (
            shuffle_join(
                e1,
                alive,
                left_on="b",
                right_on="node",
                select=["a", "b"],
                hot_keys=None,
                num_partitions=num_partitions,
                left_schema=edge_schema,
                right_schema=node_schema,
            )
            .repartition(blocks)
            .materialize()
        )
        m = edges_new.count()
        edges = edges_new
        if m == prev_m:
            break
        prev_m = m
        if m == 0:
            break
    else:
        raise RuntimeError(
            f"k_core did not converge in {max_iters} rounds; raise max_iters"
        )

    return _degree_counts(
        edges, num_partitions=num_partitions
    ).map_batches(
        lambda b: b.rename_columns(["node", "degree"]),
        batch_format="pyarrow",
        batch_size=None,
    )


def degree_assortativity(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
):
    """Pearson degree assortativity of the undirected simple graph —
    corr(deg(a), deg(b)) over all directed half-edges (the Newman mixing
    coefficient): do hubs link to hubs (>0) or to leaves (<0)?  Returns a
    single ``(n_half_edges, assortativity)`` row.

    Canonical half-edges + partition-level degrees (shared kernels), then
    degrees join back onto the edges by each endpoint (two unique-key
    shuffle joins), exact int64 moment partials per batch, and one
    aggregate-sized fold with the same fixed-IEEE corr finalization as
    ``ops.grouped_corr`` — hash-exact vs the spelled-out SQL.  Envelope:
    Σd(a)·d(b) over edges must fit int64 (max degree ~3·10⁶ at 10⁹
    half-edges).
    """
    import math

    blocks = max(4, num_partitions // 4)
    edges = _canonical_edges(
        edges_ds, src=src, dst=dst,
        num_partitions=num_partitions, blocks=blocks,
    )
    deg = (
        _degree_counts(edges, num_partitions=num_partitions)
        .repartition(blocks)
        .materialize()
    )
    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    deg_schema = pa.schema([("node", pa.int64()), ("n", pa.int64())])

    with_da = shuffle_join(
        edges,
        deg.map_batches(
            lambda b: b.rename_columns(["node", "da"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        left_on="a",
        right_on="node",
        select=["b", "da"],
        hot_keys=None,
        num_partitions=num_partitions,
        left_schema=edge_schema,
        right_schema=pa.schema([("node", pa.int64()), ("da", pa.int64())]),
    )
    pairs = shuffle_join(
        with_da,
        deg.map_batches(
            lambda b: b.rename_columns(["node", "db"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        left_on="b",
        right_on="node",
        select=["da", "db"],
        hot_keys=None,
        num_partitions=num_partitions,
        left_schema=pa.schema([("b", pa.int64()), ("da", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("db", pa.int64())]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        x = batch.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "_k": pa.array([0], type=pa.int64()),
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([int(x.sum())], type=pa.int64()),
                "sy": pa.array([int(y.sum())], type=pa.int64()),
                "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                "syy": pa.array([int((y * y).sum())], type=pa.int64()),
                "sxy": pa.array([int((x * y).sum())], type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        def tot(col: str) -> int:
            return int(pc.sum(group.column(col)).as_py() or 0)

        n = tot("n")
        sx, sy = tot("sx"), tot("sy")
        sxx, syy, sxy = tot("sxx"), tot("syy"), tot("sxy")
        fn = float(n)
        num = fn * float(sxy) - float(sx) * float(sy)
        dx = fn * float(sxx) - float(sx) * float(sx)
        dy = fn * float(syy) - float(sy) * float(sy)
        corr = (
            num / (math.sqrt(dx) * math.sqrt(dy))
            if dx > 0.0 and dy > 0.0
            else None
        )
        return pa.table(
            {
                "n_half_edges": pa.array([n], type=pa.int64()),
                "assortativity": pa.array([corr], type=pa.float64()),
            }
        )

    return (
        pairs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("_k")
        .map_groups(final, batch_format="pyarrow")
        .map_batches(
            lambda b: b.select(["n_half_edges", "assortativity"]),
            batch_format="pyarrow",
            batch_size=None,
        )
    )


def reciprocal_edges(
    edges_ds,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 64,
):
    """Mutual-edge detection on a DIRECTED edge stream: every unordered
    pair {a, b} (a < b) where BOTH a→b and b→a appear (self-loops and
    null endpoints dropped) — the reciprocity kernel of follower-graph
    analysis.

    Shape: per batch, directed edges collapse to distinct
    (lo, hi, dir) triples (dir = "was the edge oriented low→high"), so
    duplicate edges never ride the exchange; ONE hash exchange keyed on
    ``lo`` co-locates both orientations of a pair; the partition-level
    final is a vectorized group-by — pairs whose dir set contains both
    orientations win.  No driver-side state, pair output streams."""

    def triples(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        t = pa.table({"a": a, "b": b})
        keep = pc.and_(
            pc.and_(pc.is_valid(a), pc.is_valid(b)), pc.not_equal(a, b)
        )
        t = t.filter(keep)
        lo = pc.min_element_wise(t.column("a"), t.column("b"))
        hi = pc.max_element_wise(t.column("a"), t.column("b"))
        fwd = pc.cast(pc.equal(t.column("a"), lo), pa.int64())
        tri = (
            pa.table({"lo": lo, "hi": hi, "dir": fwd})
            .group_by(["lo", "hi", "dir"])
            .aggregate([])
        )
        from ..functions.hashing import partition_ids

        parts = partition_ids(tri.column("lo"), num_partitions)
        return tri.append_column("_part", pa.array(parts, type=pa.int64()))

    def mutual(group: pa.Table) -> pa.Table:
        g = (
            group.drop_columns(["_part"])
            .group_by(["lo", "hi"])
            .aggregate([("dir", "min"), ("dir", "max")])
            .rename_columns(["lo", "hi", "dmin", "dmax"])
        )
        both = pc.and_(
            pc.equal(g.column("dmin"), 0), pc.equal(g.column("dmax"), 1)
        )
        g = g.filter(both)
        return pa.table({"a": g.column("lo"), "b": g.column("hi")})

    return (
        edges_ds.map_batches(triples, batch_format="pyarrow", batch_size=None)
        .groupby("_part")
        .map_groups(mutual, batch_format="pyarrow")
    )


def k_hop_reachable(edges, seeds, *, hops: int = 3):
    """Min-hop BFS closure from a seed set over a DIRECTED edge Dataset
    (``src``/``dst`` int64 columns): returns ``(node, hop)`` for every
    node whose shortest distance from any seed is ≤ ``hops`` (seeds at
    hop 0) — the bounded-depth reachability / blast-radius query.

    Per hop: the frontier broadcasts via ``ray.put`` (sorted array +
    searchsorted membership — ``np.isin`` re-sorts its test set every
    batch) and ONE zero-exchange edge scan emits per-block matched
    destinations (≤ |V| rows per block after the per-block unique).  The
    node set lives on the driver, so this is for |V|-bounded closures
    (entity graphs, service maps); for unbounded transitive closure use
    :func:`connected_components`' exchange-based propagation.  A derived
    ``edges`` input is materialized ONCE internally when scanning more
    than one hop (the sibling iterative ops' convention — re-executing
    an upstream pipeline per hop is the CLAUDE.md measured perf trap).
    """
    import numpy as np

    import ray

    if hops > 1:
        edges = edges.materialize()
    visited: dict[int, int] = {int(s): 0 for s in seeds}
    frontier = np.array(sorted(visited), dtype=np.int64)
    for h in range(1, hops + 1):
        if len(frontier) == 0:
            break
        ref = ray.put(frontier)

        def hit(b: pa.Table, _ref=ref) -> pa.Table:
            import ray as _r

            fr = _r.get(_ref)
            s = b.column("src").to_numpy(zero_copy_only=False)
            d = b.column("dst").to_numpy(zero_copy_only=False)
            idx = np.searchsorted(fr, s)
            idx_c = np.minimum(idx, len(fr) - 1)
            m = fr[idx_c] == s
            return pa.table(
                {"n": pa.array(np.unique(d[m]), type=pa.int64())}
            )

        parts = edges.map_batches(
            hit, batch_format="pyarrow", batch_size=None
        ).take_all()
        new = sorted(
            {int(r["n"]) for r in parts} - set(visited)
        )
        if not new:
            break
        for n in new:
            visited[n] = h
        frontier = np.array(new, dtype=np.int64)
    nodes = sorted(visited)
    return pa.table(
        {
            "node": pa.array(nodes, type=pa.int64()),
            "hop": pa.array(
                [visited[n] for n in nodes], type=pa.int64()
            ),
        }
    )
