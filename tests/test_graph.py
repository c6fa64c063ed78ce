"""Connected components (min-label propagation) tests."""

import numpy as np
import pyarrow as pa
import pytest


def _labels(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    return dict(
        zip(t.column("node").to_pylist(), t.column("comp").to_pylist())
    )


def test_connected_components_chain_and_isolates(ray_session):
    """Path graph (needs >1 propagation round), a separate clique, an
    isolated node from the node universe, self-loops and null endpoints."""
    import ray.data
    from airbyte_destination_ray.pipelines.graph import connected_components

    edges = pa.table(
        {
            "ia": pa.array([10, 11, 12, 13, 50, 51, 7, None], type=pa.int64()),
            "ib": pa.array([11, 12, 13, 14, 51, 52, 7, 99], type=pa.int64()),
        }
    )
    nodes = pa.table({"doc_id": pa.array([10, 11, 12, 13, 14, 50, 51, 52, 7, 100], type=pa.int64())})
    out = connected_components(
        ray.data.from_arrow(edges).repartition(3),
        nodes_ds=ray.data.from_arrow(nodes),
        node_col="doc_id",
    )
    got = _labels(out)
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        50: 50, 51: 50, 52: 50,
        7: 7,      # self-loop only -> singleton
        100: 100,  # isolated via node universe
    }


def test_connected_components_merge_order_invariance(ray_session):
    """Components must come out identical regardless of edge direction or
    block layout (reversed chain stresses the propagation direction)."""
    import ray.data
    from airbyte_destination_ray.pipelines.graph import connected_components

    # chain written high->low: 5<-4<-...<-1 so labels must flow "uphill"
    edges = pa.table(
        {
            "ia": pa.array(list(range(5, 0, -1)), type=pa.int64()),
            "ib": pa.array(list(range(4, -1, -1)), type=pa.int64()),
        }
    )
    for nblocks in (1, 4):
        out = connected_components(
            ray.data.from_arrow(edges).repartition(nblocks)
        )
        got = _labels(out)
        assert got == {i: 0 for i in range(6)}


def test_connected_components_raises_when_unconverged(ray_session):
    """A chain longer than max_iters rounds must raise, never silently
    return split components (review regression)."""
    import ray.data
    from airbyte_destination_ray.pipelines.graph import connected_components

    n = 12
    edges = pa.table(
        {
            "ia": pa.array(range(n - 1), type=pa.int64()),
            "ib": pa.array(range(1, n), type=pa.int64()),
        }
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(
            ray.data.from_arrow(edges), src="ia", dst="ib", max_iters=2
        )
    # and with enough rounds the same chain resolves to one component
    out = connected_components(
        ray.data.from_arrow(edges), src="ia", dst="ib", max_iters=30
    ).to_pandas()
    assert set(out["comp"]) == {0}


def test_pagerank_fixed_point_matches_reference(ray_session):
    """Exact fixed-point PageRank equals the sequential integer reference
    on a graph with a hub, a chain, parallel edges, and a dangling node."""
    import ray.data

    from airbyte_destination_ray.pipelines.graph import pagerank_fixed_point

    src = [1, 2, 3, 4, 1, 1, 5, 6]   # 1->2 twice (parallel), 6 dangling src
    dst = [2, 3, 4, 1, 2, 5, 9, 1]   # 9 has no out-edges (dangling sink)
    edges = pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
        }
    )
    ITERS, DN, DD, SCALE = 4, 85, 100, 10**9
    out = (
        pagerank_fixed_point(
            ray.data.from_arrow(edges).repartition(3),
            iters=ITERS, num_partitions=4,
        )
        .to_pandas()
        .set_index("node")["r"]
        .to_dict()
    )
    from collections import defaultdict

    deg = defaultdict(int)
    for s in src:
        deg[s] += 1
    nodes = set(src) | set(dst)
    r = {v: SCALE for v in nodes}
    base = ((DD - DN) * SCALE) // DD
    for _ in range(ITERS):
        acc = {v: 0 for v in nodes}
        for s, d in zip(src, dst):
            acc[d] += (r[s] * DN) // (DD * deg[s])
        r = {v: base + acc[v] for v in nodes}
    assert out == r
    # dangling sink 9 accumulates but never emits; hub 2 outranks leaf 5
    assert out[2] > out[5]


def test_triangle_counts_exact_vs_bruteforce(ray_session):
    """Degree-oriented wedge enumeration equals the brute-force triangle
    count on a mixed graph: K4, a disjoint triangle, a chain (0 triangles),
    duplicate + reversed + self-loop edges."""
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from airbyte_destination_ray.pipelines.graph import triangle_counts

    edges = (
        # K4 on {0,1,2,3} → every node in 3 triangles
        list(itertools.combinations([0, 1, 2, 3], 2))
        # disjoint triangle {10,11,12}
        + [(10, 11), (11, 12), (12, 10)]
        # chain 20-21-22-23: no triangles
        + [(20, 21), (21, 22), (22, 23)]
        # noise: duplicates, reversed, self-loop
        + [(1, 0), (0, 1), (5, 5), (10, 11)]
    )
    src = pa.array([e[0] for e in edges], type=pa.int64())
    dst = pa.array([e[1] for e in edges], type=pa.int64())
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    out = (
        triangle_counts(ds, num_partitions=8)
        .to_pandas()
        .set_index("node")
        .n_triangles.to_dict()
    )

    # brute force over the canonical simple graph
    canon = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    nodes = sorted({n for e in canon for n in e})
    expected = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in canon and (y, z) in canon and (x, z) in canon
        ):
            for n in (x, y, z):
                expected[n] = expected.get(n, 0) + 1
    assert out == expected
    assert expected[0] == 3 and expected[10] == 1  # sanity on the fixture


def test_degree_histogram_vs_bruteforce(ray_session):
    """Dedup + self-loop/null handling + exact degrees: random multigraph
    with planted duplicate and reversed edges."""
    import ray.data

    from airbyte_destination_ray.pipelines.graph import degree_histogram

    rng = np.random.default_rng(11)
    src = rng.integers(0, 40, 500)
    dst = rng.integers(0, 40, 500)
    edges = pa.table(
        {
            "src": pa.array(
                np.concatenate([src, dst, [5, None]]), type=pa.int64()
            ),
            "dst": pa.array(
                np.concatenate([dst, src, [5, 3]]), type=pa.int64()
            ),
        }
    )
    out = degree_histogram(ray.data.from_arrow(edges).repartition(5))
    got = {
        r["degree"]: r["n_nodes"]
        for r in out.take_all()
    }
    canon = {
        (min(a, b), max(a, b))
        for a, b in zip(src.tolist(), dst.tolist())
        if a != b
    }
    deg: dict[int, int] = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    exp: dict[int, int] = {}
    for d in deg.values():
        exp[d] = exp.get(d, 0) + 1
    assert got == exp


# --- k_core -----------------------------------------------------------------


def _peel_reference(edges, k):
    """Driver-side reference peel over a list of (a, b) tuples."""
    import collections

    es = set()
    for a, b in edges:
        if a is None or b is None or a == b:
            continue
        es.add((a, b))
        es.add((b, a))
    while True:
        deg = collections.Counter(a for a, _ in es)
        alive = {n for n, d in deg.items() if d >= k}
        ne = {(a, b) for a, b in es if a in alive and b in alive}
        if ne == es:
            break
        es = ne
    return collections.Counter(a for a, _ in es)


def test_k_core_matches_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from airbyte_destination_ray.pipelines.graph import k_core

    rng = np.random.default_rng(31)
    n = 2000
    src = rng.integers(0, 300, n)
    dst = (src + 1 + rng.integers(0, 40, n)) % 300
    # a few self-loops and dup edges to exercise canonicalization
    src[:20] = dst[:20]
    tbl = pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
        }
    )
    got = (
        k_core(ray.data.from_arrow(tbl).repartition(4), k=6)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    ref = _peel_reference(list(zip(src.tolist(), dst.tolist())), 6)
    assert dict(zip(got["node"], got["degree"])) == dict(ref)
    assert (got["degree"] >= 6).all()


def test_k_core_empty_when_k_too_high(ray_session):
    import pyarrow as pa
    import ray

    from airbyte_destination_ray.pipelines.graph import k_core

    tbl = pa.table(
        {
            "src": pa.array([0, 1, 2], type=pa.int64()),
            "dst": pa.array([1, 2, 0], type=pa.int64()),
        }
    )
    # triangle: every node has degree 2 → 3-core is empty
    got = k_core(ray.data.from_arrow(tbl), k=3).to_pandas()
    assert len(got) == 0
    # 2-core is the whole triangle
    got2 = k_core(ray.data.from_arrow(tbl), k=2).to_pandas()
    assert sorted(got2["node"]) == [0, 1, 2]
    assert (got2["degree"] == 2).all()
