"""Graph analytics over the materialized KG edge table.

The reference's only graph computation is the 1-hop weighted-neighbor
query (`/root/reference/src/database/graph_database.py:206-355`); node
IMPORTANCE is implicit in Neo4j edge weights. A batch KG engine wants a
global importance measure — PageRank — as a first-class operator (rank
entities for retrieval cutoffs, crawl prioritization, display order).

``pagerank`` here is **integer-quantized**: ranks live in fixed-point
``scale`` units (default 1e12) and every per-edge contribution is an
integer floor division. Rationale (same as the tf-idf integer idf in
stages/corpus.py): integer addition is associative/commutative in every
engine, so the result is BIT-IDENTICAL regardless of partitioning, sum
order, or the engine computing it — a float PageRank differs in final
ulps between any two execution orders and can never be hash-compared.
The floor quantization leaks ≤1 unit of mass per edge per iteration
(bounded, deterministic); at scale=1e12 the relative error per iteration
is ≤ E/1e12 of total mass — noise.

Scale shape (per iteration, all tables narrow int64 columns):
1. dangling mass = one filtered integer sum (aggregate, driver scalar);
2. contributions = one hash-shuffle join of edges (src,dst) with the
   rank state on src — per-batch pre-aggregation of (dst, contrib)
   partials bounds hot destinations to one row per block;
3. new state = one bucketed sum of partials left-joined onto the node
   table (nodes with no in-edges keep the base mass).

The edge table re-shuffles each iteration; on a real cluster a
hash-partitioned edge layout reused across iterations would remove that
exchange (the state table alone would move). Multigraph semantics:
parallel (src,dst) duplicates each contribute; out-degree counts edges.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_group_apply


def _distinct_ids(edges_ds, src_col: str, dst_col: str, num_buckets: int):
    def explode(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([t[src_col].combine_chunks().cast(pa.int64()),
                                t[dst_col].combine_chunks().cast(pa.int64())])
        return pa.table({"id": pc.unique(ids)})

    def distinct(t: pa.Table) -> pa.Table:
        return pa.table({"id": pc.unique(t["id"].combine_chunks())})

    return bucketed_group_apply(
        edges_ds.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["id"], distinct, num_buckets=num_buckets)


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             damping_pct: int = 85, iters: int = 10,
             scale: int = 10 ** 12, num_buckets: int = 64):
    """Integer-quantized PageRank over a directed edge Dataset.

    Returns ``(id, rank)`` with ``rank`` in ``scale`` fixed-point units
    (sum over nodes ≈ scale, minus deterministic floor leakage).
    ``damping_pct`` is the damping factor in integer percent (85 = 0.85).

    Per iteration, for every node v::

        rank'[v] = floor(scale * (100-d) / (100 * n))          # teleport
                 + floor(dangling * d / (100 * n))             # dangling
                 + Σ_{u→v} floor(rank[u] * d / (100 * deg[u])) # links

    with n = node count, dangling = Σ rank of out-degree-0 nodes —
    every term an integer, so the fixpoint trajectory is exact.
    """
    from ray.data.aggregate import Sum

    edges = edges_ds.map_batches(
        lambda t: pa.table({"src": t[src_col].cast(pa.int64()),
                            "dst": t[dst_col].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    nodes = _distinct_ids(edges, "src", "dst", num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: t.append_column("rank", pa.array([], type=pa.int64())),
            batch_format="pyarrow")

    # out-degree per src: per-batch partial counts, bucketed sum
    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([("dst", "count")])
        return pa.table({"id": g["src"], "deg": g["dst_count"]})

    def deg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["id"]).aggregate([("deg", "sum")])
        return pa.table({"id": g["id"], "deg": g["deg_sum"]})

    degs = bucketed_group_apply(
        edges.map_batches(deg_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["id"], deg_merge, num_buckets=num_buckets)

    # state = (id, deg, rank); nodes absent from degs have deg 0
    def seed_bucket(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        node_t = t.filter(pa.array(side == 0))
        deg_t = t.filter(pa.array(side == 1))
        dm = dict(zip(deg_t["id"].to_pylist(), deg_t["deg"].to_pylist()))
        ids = node_t["id"].to_pylist()
        return pa.table({
            "id": pa.array(ids, type=pa.int64()),
            "deg": pa.array([dm.get(i, 0) for i in ids], type=pa.int64()),
            "rank": pa.array([scale // n] * len(ids), type=pa.int64()),
        })

    def _tag(ds, side: int, cols: dict):
        def f(t: pa.Table) -> pa.Table:
            out = {k: (t[v] if v in t.column_names
                       else pa.nulls(t.num_rows, type=pa.int64()))
                   for k, v in cols.items()}
            out["__side"] = pa.array([side] * t.num_rows, type=pa.int64())
            return pa.table(out)
        return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

    state = bucketed_group_apply(
        _tag(nodes, 0, {"id": "id", "deg": "deg"}).union(
            _tag(degs, 1, {"id": "id", "deg": "deg"})),
        ["id"], seed_bucket, num_buckets=num_buckets).materialize()

    d = damping_pct
    for _ in range(iters):
        agg = state.filter(expr="deg == 0").aggregate(Sum("rank"))
        dangling = int(agg["sum(rank)"] or 0) if agg else 0
        base = (scale * (100 - d)) // (100 * n) + (dangling * d) // (100 * n)

        # contributions: edges ⋈ state on src (one exchange), partials
        # pre-aggregated per bucket by dst
        def contrib_bucket(t: pa.Table) -> pa.Table:
            side = t["__side"].to_numpy(zero_copy_only=False)
            e = t.filter(pa.array(side == 0))
            s = t.filter(pa.array(side == 1))
            per_src = {}
            for i, dg, rk in zip(s["id"].to_pylist(), s["deg"].to_pylist(),
                                 s["rank"].to_pylist()):
                if dg:
                    per_src[i] = (rk * d) // (100 * dg)
            acc: dict[int, int] = {}
            for u, v in zip(e["id"].to_pylist(), e["dst"].to_pylist()):
                c = per_src.get(u, 0)
                if c:
                    acc[v] = acc.get(v, 0) + c
            items = sorted(acc.items())
            return pa.table({
                "dst": pa.array([k for k, _ in items], type=pa.int64()),
                "contrib": pa.array([v for _, v in items], type=pa.int64()),
            })

        partials = bucketed_group_apply(
            _tag(edges, 0, {"id": "src", "dst": "dst"}).union(
                _tag(state, 1, {"id": "id", "deg": "deg", "rank": "rank"})),
            ["id"], contrib_bucket, num_buckets=num_buckets)

        # new state: node table ⋈ contrib partials on id (one exchange)
        def apply_bucket(t: pa.Table) -> pa.Table:
            side = t["__side"].to_numpy(zero_copy_only=False)
            s = t.filter(pa.array(side == 0))
            p = t.filter(pa.array(side == 1))
            acc: dict[int, int] = {}
            for i, c in zip(p["id"].to_pylist(), p["deg"].to_pylist()):
                acc[i] = acc.get(i, 0) + c
            ids = s["id"].to_pylist()
            return pa.table({
                "id": pa.array(ids, type=pa.int64()),
                "deg": s["deg"],
                "rank": pa.array([base + acc.get(i, 0) for i in ids],
                                 type=pa.int64()),
            })

        state = bucketed_group_apply(
            _tag(state, 0, {"id": "id", "deg": "deg"}).union(
                _tag(partials, 1, {"id": "dst", "deg": "contrib"})),
            ["id"], apply_bucket, num_buckets=num_buckets).materialize()

    return state.map_batches(lambda t: t.select(["id", "rank"]),
                             batch_format="pyarrow", zero_copy_batch=True)
