"""Tests for stages/graph.py — integer-quantized PageRank: distributed
result must be BIT-identical to a sequential Python-int reference."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fashion_knowledge_graph_ray.stages.graph import pagerank

SCALE = 10 ** 12


def _seq_pagerank(edges, iters=10, d=85, scale=SCALE):
    ids = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(ids)
    deg: dict = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {i: scale // n for i in ids}
    for _ in range(iters):
        dangling = sum(rank[i] for i in ids if deg.get(i, 0) == 0)
        base = (scale * (100 - d)) // (100 * n) + (dangling * d) // (100 * n)
        acc = {i: 0 for i in ids}
        for u, v in edges:
            acc[v] += (rank[u] * d) // (100 * deg[u])
        rank = {i: base + acc[i] for i in ids}
    return rank


def _edges_ds(edges, parts=3):
    tbl = pa.table({"src": pa.array([a for a, _ in edges], type=pa.int64()),
                    "dst": pa.array([b for _, b in edges], type=pa.int64())})
    return rd.from_arrow(tbl).repartition(parts)


def test_pagerank_matches_sequential_ints(ray_session):
    # parallel edge, a dangling node (7), a cycle
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2), (3, 7)]
    out = pagerank(_edges_ds(edges), iters=10, num_buckets=4).to_pandas()
    exp = _seq_pagerank(edges)
    assert dict(zip(out["id"], out["rank"])) == exp
    # conservation: total mass stays within floor-leak of scale
    assert 0 <= SCALE - out["rank"].sum() < SCALE // 10**6


def test_pagerank_partition_invariance_random_graph(ray_session):
    rng = np.random.default_rng(5)
    edges = [(int(rng.integers(0, 40)), int(rng.integers(0, 40)))
             for _ in range(300)]
    exp = _seq_pagerank(edges, iters=6)
    for parts in (1, 8):
        # broadcast-ranks regime (default gate) and the forced shuffle-join
        # regime must both reproduce the sequential ints exactly
        for gate in (2_000_000, 0):
            out = pagerank(_edges_ds(edges, parts), iters=6,
                           num_buckets=4,
                           max_broadcast_nodes=gate).to_pandas()
            assert dict(zip(out["id"], out["rank"])) == exp


def test_pagerank_empty(ray_session):
    out = pagerank(_edges_ds([], 1), iters=3, num_buckets=2).to_pandas()
    assert len(out) == 0


def test_pagerank_weighted_matches_sequential(ray_session):
    # weighted edges == replicating each edge `w` times in the classic
    # formulation (exact integer identity: w scales both numerator and
    # out-mass)
    edges_w = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5)]
    tbl = pa.table({
        "src": pa.array([a for a, _, _ in edges_w], type=pa.int64()),
        "dst": pa.array([b for _, b, _ in edges_w], type=pa.int64()),
        "weight": pa.array([w for _, _, w in edges_w], type=pa.int64()),
    })
    outs = [pagerank(rd.from_arrow(tbl).repartition(2),
                     weight_col="weight", iters=8, num_buckets=4,
                     max_broadcast_nodes=gate).to_pandas()
            for gate in (2_000_000, 0)]
    out = outs[0]

    ids = [1, 2, 3]
    n = len(ids)
    W = {1: 4, 2: 2, 3: 5}
    d = 85
    rank = {i: SCALE // n for i in ids}
    for _ in range(8):
        dangling = sum(rank[i] for i in ids if W.get(i, 0) == 0)
        base = (SCALE * 15) // (100 * n) + (dangling * d) // (100 * n)
        acc = {i: 0 for i in ids}
        for u, v, w in edges_w:
            acc[v] += (rank[u] * d * w) // (100 * W[u])
        rank = {i: base + acc[i] for i in ids}
    for o in outs:
        assert dict(zip(o["id"], o["rank"])) == rank


def _seq_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            for node in (a, b, c):
                counts[node] = counts.get(node, 0) + 1
    # each triangle seen via 3 edges -> corner counted 3x
    return {k: v // 3 for k, v in counts.items() if v // 3 > 0}


def test_triangle_counts_random_vs_bruteforce(ray_session):
    from fashion_knowledge_graph_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(17)
    # skewed degrees: a few hubs force wedge pairs whose value order
    # disagrees with the (deg, id) orientation order — the case the
    # closing-edge join must still match
    edges = [(int(rng.integers(0, 12)), int(rng.integers(0, 60)))
             for _ in range(250)]
    exp = _seq_triangles(edges)
    for gate in (2_000_000, 0):  # broadcast-deg and shuffle-orient regimes
        out = triangle_counts(_edges_ds(edges, 5), num_buckets=4,
                              max_broadcast_nodes=gate).to_pandas()
        assert dict(zip(out["id"], out["triangles"])) == exp


def test_triangle_counts_string_ids(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fashion_knowledge_graph_ray.stages.graph import triangle_counts

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    tbl = pa.table({"src": [e[0] for e in edges],
                    "dst": [e[1] for e in edges]})
    out = triangle_counts(rd.from_arrow(tbl).repartition(2),
                          num_buckets=2).to_pandas()
    assert dict(zip(out["id"], out["triangles"])) == \
        {"a": 1, "b": 1, "c": 1}


def test_pagerank_zero_weight_source_no_divide(ray_session):
    # a src whose weights sum to 0 must contribute nothing (and must not
    # floor-divide by zero in the vectorized broadcast kernel)
    import warnings

    tbl = pa.table({
        "src": pa.array([1, 1, 2], type=pa.int64()),
        "dst": pa.array([2, 3, 3], type=pa.int64()),
        "weight": pa.array([0, 0, 5], type=pa.int64()),
    })
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # RuntimeWarning -> failure
        out = pagerank(rd.from_arrow(tbl), weight_col="weight", iters=4,
                       num_buckets=2).to_pandas()
    ranks = dict(zip(out["id"], out["rank"]))
    # node 1 has zero out-mass -> dangling; sequential reference
    edges = [(2, 3, 5)]
    ids = [1, 2, 3]
    W = {2: 5}
    rank = {i: SCALE // 3 for i in ids}
    for _ in range(4):
        dangling = sum(rank[i] for i in ids if W.get(i, 0) == 0)
        base = (SCALE * 15) // 300 + (dangling * 85) // 300
        acc = {i: 0 for i in ids}
        for u, v, w in edges:
            acc[v] += (rank[u] * 85 * w) // (100 * W[u])
        rank = {i: base + acc[i] for i in ids}
    assert ranks == rank


def test_pagerank_partitioned_single_bucket(ray_session):
    # advisor finding: num_buckets=1 in the partitioned regime used to
    # hand 1-tuples of tables through num_returns=1 remotes — concat and
    # _apply then received tuples instead of tables. The B==1 unwrap in
    # _split_by must keep the regime exact.
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2), (3, 7)]
    exp = _seq_pagerank(edges)
    out = pagerank(_edges_ds(edges), iters=10, num_buckets=1,
                   max_broadcast_nodes=0).to_pandas()
    assert dict(zip(out["id"], out["rank"])) == exp
