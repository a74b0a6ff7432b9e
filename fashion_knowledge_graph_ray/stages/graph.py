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

Above the broadcast gate the edge table is hash-partitioned by src ONCE
into object-store shards that persist across iterations
(``_pagerank_partitioned``); only the narrow (id, rank) state and
(dst, contrib) partials move per iteration. Multigraph semantics:
parallel (src,dst) duplicates each contribute; out-degree counts edges.
"""

from __future__ import annotations

import numpy as np
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
             weight_col: str | None = None, damping_pct: int = 85,
             iters: int = 10, scale: int = 10 ** 12,
             num_buckets: int = 64, max_broadcast_nodes: int = 2_000_000):
    """Integer-quantized PageRank over a directed edge Dataset.

    Returns ``(id, rank)`` with ``rank`` in ``scale`` fixed-point units
    (sum over nodes ≈ scale, minus deterministic floor leakage).
    ``damping_pct`` is the damping factor in integer percent (85 = 0.85).

    Per iteration, for every node v::

        rank'[v] = floor(scale * (100-d) / (100 * n))          # teleport
                 + floor(dangling * d / (100 * n))             # dangling
                 + Σ_{u→v} floor(rank[u] * d * w(u,v)
                                 / (100 * W[u]))               # links

    with n = node count, dangling = Σ rank of out-mass-0 nodes, w = the
    integer edge weight (1 when ``weight_col`` is None — then W[u] is the
    out-degree and this is classic PageRank) and W[u] = Σ out-weights —
    every term an integer, so the fixpoint trajectory is exact. With
    ``weight_col`` this ranks the engine's own KG edge table (weighted
    co-occurrence edges, stages/aggregate.py) directly.

    Two regimes, identical results (same integer formula, switched on the
    node count — the usual two-regime design of this engine):

    - **broadcast ranks** (n ≤ ``max_broadcast_nodes``): the rank vector
      (8 B/node — 16 MB at the 2M default) broadcasts via ``ray.put``
      each iteration; the STATIC materialized edge table streams through
      a vectorized batch-local contribution kernel and ONE bucketed sum
      per iteration collects per-dst totals (≤ n tiny rows) back to the
      driver. Edges never re-shuffle.
    - **persistent partitions** (above the gate): edges hash-partition
      by src ONCE into object-store shards; per iteration only the
      narrow (id, rank) state and (dst, contrib) partials move
      (``_pagerank_partitioned``) — nothing driver-resident beyond B
      refs.
    """

    def narrow(t: pa.Table) -> pa.Table:
        w = (t[weight_col].cast(pa.int64()) if weight_col
             else pa.array([1] * t.num_rows, type=pa.int64()))
        return pa.table({"src": t[src_col].cast(pa.int64()),
                         "dst": t[dst_col].cast(pa.int64()),
                         "w": w})

    edges = edges_ds.map_batches(narrow, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    nodes = _distinct_ids(edges, "src", "dst", num_buckets).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: t.append_column("rank", pa.array([], type=pa.int64())),
            batch_format="pyarrow")

    # out-mass per src (Σ weights; = out-degree when unweighted):
    # per-batch partials, bucketed sum
    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["src"]).aggregate([("w", "sum")])
        return pa.table({"id": g["src"], "deg": g["w_sum"]})

    def deg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["id"]).aggregate([("deg", "sum")])
        return pa.table({"id": g["id"], "deg": g["deg_sum"]})

    degs = bucketed_group_apply(
        edges.map_batches(deg_partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["id"], deg_merge, num_buckets=num_buckets)

    if n <= max_broadcast_nodes:
        return _pagerank_broadcast(edges, nodes, degs, n, damping_pct,
                                   iters, scale, num_buckets)
    return _pagerank_partitioned(edges, nodes, degs, n, damping_pct,
                                 iters, scale, num_buckets)


def _pagerank_partitioned(edges, nodes, degs, n, d, iters, scale,
                          num_buckets):
    """Iteration-persistent hash-partitioned PageRank regime (above the
    broadcast gate).

    The Dataset API cannot express "partition once, iterate in place" —
    a ``groupby`` re-exchanges its whole input every call — so this
    regime drops to raw Ray tasks (the engine's documented last-resort
    tier) to pin the partitioning:

    - **setup, once**: the static narrow edge table is hash-partitioned
      by ``bucket(src)`` into ``num_buckets`` object-store shards that
      NEVER move again; the state table (id, deg, rank) is partitioned
      by ``bucket(id)`` with the SAME hash, so every edge source is
      co-located with its rank.
    - **per iteration**: shard-local contribution kernels (vectorized
      searchsorted join + the integer floor formula) emit per-bucket
      ``(dst, contrib)`` partials via ``num_returns=B`` multi-returns —
      the ONLY bytes that move are those narrow partials plus the new
      state shards; dangling mass rides back as one int per shard.

    Bit-identical to the broadcast regime (integer sums are
    order-independent); bounded driver state (B refs + B ints)."""
    import ray
    import ray.data as rd

    from .bucketed import BUCKET_COL, _polars_hash_ok, add_bucket_column

    B = num_buckets
    up = _polars_hash_ok()

    _empty_contrib = pa.table({"dst": pa.array([], type=pa.int64()),
                               "contrib": pa.array([], type=pa.int64())})

    def _split_by(tbl: pa.Table, key: str):
        # B == 1: return the bare table — with num_returns=1 Ray hands the
        # remote fn's single return value through unchanged, so a 1-tuple
        # here would reach concat/_apply as a tuple instead of a table
        if B == 1:
            return tbl
        t = add_bucket_column(tbl, [key], B, use_polars=up)
        bc = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        t = t.drop_columns([BUCKET_COL])
        return tuple(t.filter(pa.array(bc == j)) for j in range(B))

    def _multi(remote_fn, *args):
        refs = remote_fn.options(num_returns=B).remote(*args)
        return refs if isinstance(refs, list) else [refs]

    split_src = ray.remote(lambda tb: _split_by(tb, "src"))
    split_id = ray.remote(lambda tb: _split_by(tb, "id"))
    concat = ray.remote(lambda *ts: pa.concat_tables(ts))

    # edges: partition ONCE; shards stay in the object store across all
    # iterations
    epieces = [_multi(split_src, rb) for rb in edges.to_arrow_refs()]
    edge_shards = [concat.remote(*[p[j] for p in epieces])
                   for j in range(B)]

    npieces = [_multi(split_id, rb) for rb in nodes.to_arrow_refs()]
    dpieces = [_multi(split_id, rb) for rb in degs.materialize()
               .to_arrow_refs()]

    def _seed(node_t: pa.Table, deg_t: pa.Table):
        ids = np.sort(node_t["id"].to_numpy(zero_copy_only=False))
        deg = np.zeros(len(ids), dtype=np.int64)
        if deg_t.num_rows:
            idx = np.searchsorted(ids,
                                  deg_t["id"].to_numpy(zero_copy_only=False))
            deg[idx] = deg_t["deg"].to_numpy(zero_copy_only=False)
        state = pa.table({
            "id": pa.array(ids, type=pa.int64()),
            "deg": pa.array(deg, type=pa.int64()),
            "rank": pa.array(np.full(len(ids), scale // n, dtype=np.int64),
                             type=pa.int64())})
        return state, int((scale // n) * int((deg == 0).sum()))

    seed = ray.remote(num_returns=2)(_seed)
    seeded = [seed.remote(concat.remote(*[p[j] for p in npieces]),
                          concat.remote(*[p[j] for p in dpieces]))
              for j in range(B)]
    state = [s for s, _ in seeded]
    dangle_refs = [g for _, g in seeded]

    def _contrib(edge_t: pa.Table, state_t: pa.Table) -> tuple:
        import pandas as pd

        if edge_t.num_rows == 0 or state_t.num_rows == 0:
            return _empty_contrib if B == 1 \
                else tuple(_empty_contrib for _ in range(B))
        sid = state_t["id"].to_numpy(zero_copy_only=False)  # sorted
        sdeg = state_t["deg"].to_numpy(zero_copy_only=False)
        srank = state_t["rank"].to_numpy(zero_copy_only=False)
        src = edge_t["src"].to_numpy(zero_copy_only=False)
        dst = edge_t["dst"].to_numpy(zero_copy_only=False)
        w = edge_t["w"].to_numpy(zero_copy_only=False)
        si = np.searchsorted(sid, src)  # every src co-located by hash
        sd, sr = sdeg[si], srank[si]
        valid = sd > 0
        w_max = int(w.max()) if len(w) else 0
        c = np.zeros(len(sd), dtype=np.int64)
        if w_max and int(sr.max()) * d * w_max < (1 << 62):
            # mask BEFORE the divide: zero out-mass sources would
            # floor-divide by zero
            c[valid] = (sr[valid] * d * w[valid]) // (100 * sd[valid])
        else:  # exact big-int fallback, identical floor expression
            c = np.array([(int(r) * d * int(ww)) // (100 * int(gg))
                          if gg else 0
                          for r, ww, gg in zip(sr, w, sd)], dtype=np.int64)
        mask = valid & (c > 0)
        df = pd.DataFrame({"dst": dst[mask], "contrib": c[mask]})
        g = df.groupby("dst", sort=True)["contrib"].sum().reset_index()
        out = pa.table({"dst": pa.array(g["dst"], type=pa.int64()),
                        "contrib": pa.array(g["contrib"], type=pa.int64())})
        return _split_by(out, "dst")

    def _apply(state_t: pa.Table, base: int, *pieces: pa.Table):
        ids = state_t["id"].to_numpy(zero_copy_only=False)
        deg = state_t["deg"].to_numpy(zero_copy_only=False)
        acc = np.zeros(len(ids), dtype=np.int64)
        for p in pieces:
            if p.num_rows:
                idx = np.searchsorted(
                    ids, p["dst"].to_numpy(zero_copy_only=False))
                np.add.at(acc, idx,
                          p["contrib"].to_numpy(zero_copy_only=False))
        rank = acc + base
        new_state = pa.table({
            "id": state_t["id"], "deg": state_t["deg"],
            "rank": pa.array(rank, type=pa.int64())})
        return new_state, int(rank[deg == 0].sum())

    contrib = ray.remote(_contrib)
    apply_ = ray.remote(num_returns=2)(_apply)

    for _ in range(iters):
        dangling = sum(ray.get(dangle_refs))
        base = (scale * (100 - d)) // (100 * n) + (dangling * d) // (100 * n)
        cons = [_multi(contrib, edge_shards[j], state[j]) for j in range(B)]
        stepped = [apply_.remote(state[j], base,
                                 *[cons[i][j] for i in range(B)])
                   for j in range(B)]
        state = [s for s, _ in stepped]
        dangle_refs = [g for _, g in stepped]

    return rd.from_arrow_refs(state).map_batches(
        lambda t: t.select(["id", "rank"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _pagerank_broadcast(edges, nodes, degs, n, d, iters, scale,
                        num_buckets):
    """Broadcast-ranks PageRank regime (see ``pagerank`` docstring).

    Driver state: the sorted node-id array and one int64 rank vector
    (8 B/node). Per iteration: ranks ``ray.put`` once; the static edge
    table runs a vectorized contribution kernel (searchsorted src->index,
    int64 multiply/divide, pandas groupby-sum partial per batch); one
    bucketed sum of the partials streams ≤ n (dst, contrib) rows back.
    Contributions use int64 vector math when ``rank*d*w`` provably fits
    (max edge weight checked per batch) and fall back to exact Python
    ints otherwise — both paths compute the identical floor expression.
    """
    import ray
    import ray.data as rd

    ids_sorted = np.sort(np.concatenate(
        [b["id"].to_numpy(zero_copy_only=False) for b in
         nodes.iter_batches(batch_format="pyarrow")] or
        [np.array([], dtype=np.int64)]))
    deg_arr = np.zeros(n, dtype=np.int64)
    for b in degs.iter_batches(batch_format="pyarrow"):
        idx = np.searchsorted(ids_sorted,
                              b["id"].to_numpy(zero_copy_only=False))
        deg_arr[idx] = b["deg"].to_numpy(zero_copy_only=False)
    ids_ref = ray.put((ids_sorted, deg_arr)) if ray.is_initialized() \
        else (ids_sorted, deg_arr)

    rank = np.full(n, scale // n, dtype=np.int64)
    dangling_mask = deg_arr == 0

    def sum_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["dst"]).aggregate([("contrib", "sum")])
        return pa.table({"dst": g["dst"], "contrib": g["contrib_sum"]})

    for _ in range(iters):
        dangling = int(rank[dangling_mask].sum())
        base = (scale * (100 - d)) // (100 * n) + (dangling * d) // (100 * n)
        rank_ref = ray.put(rank) if ray.is_initialized() else rank

        def contrib_batch(t: pa.Table) -> pa.Table:
            import pandas as pd

            ids_s, degs_s = (ray.get(ids_ref)
                             if not isinstance(ids_ref, tuple) else ids_ref)
            rk = rank_ref if isinstance(rank_ref, np.ndarray) \
                else ray.get(rank_ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            w = t["w"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(ids_s, src)
            sd, sr = degs_s[si], rk[si]
            valid = sd > 0
            w_max = int(w.max()) if len(w) else 0
            c = np.zeros(len(sd), dtype=np.int64)
            if w_max and int(sr.max()) * d * w_max < (1 << 62):
                # mask BEFORE the divide: zero out-mass sources would
                # floor-divide by zero
                c[valid] = (sr[valid] * d * w[valid]) // (100 * sd[valid])
            else:  # exact big-int fallback (identical floor expression)
                c = np.array([(int(r) * d * int(ww)) // (100 * int(dd))
                              if dd else 0
                              for r, ww, dd in zip(sr, w, sd)],
                             dtype=np.int64)
            mask = valid & (c > 0)
            df = pd.DataFrame({"dst": dst[mask], "contrib": c[mask]})
            g = df.groupby("dst", sort=True)["contrib"].sum().reset_index()
            return pa.table({
                "dst": pa.array(g["dst"], type=pa.int64()),
                "contrib": pa.array(g["contrib"], type=pa.int64()),
            })

        partials = edges.map_batches(contrib_batch, batch_format="pyarrow",
                                     zero_copy_batch=True)
        sums = bucketed_group_apply(partials, ["dst"], sum_bucket,
                                    num_buckets=num_buckets)
        acc = np.zeros(n, dtype=np.int64)
        for b in sums.iter_batches(batch_format="pyarrow"):
            idx = np.searchsorted(ids_sorted,
                                  b["dst"].to_numpy(zero_copy_only=False))
            acc[idx] = b["contrib"].to_numpy(zero_copy_only=False)
        rank = base + acc

    return rd.from_arrow(pa.table({
        "id": pa.array(ids_sorted, type=pa.int64()),
        "rank": pa.array(rank, type=pa.int64()),
    }))


def triangle_counts(edges_ds, *, src_col: str = "src",
                    dst_col: str = "dst", num_buckets: int = 64,
                    max_broadcast_nodes: int = 2_000_000):
    """Per-node triangle counts of the UNDIRECTED simple graph underlying
    a directed edge Dataset (direction and parallel edges collapse).
    Output: ``(id, triangles)`` for nodes in ≥1 triangle.

    The degree-ordered wedge-join algorithm (the MapReduce-classic
    node-iterator++):

    1. distinct undirected pairs ``(a<b)`` — one bucketed distinct;
    2. degrees over those pairs — one bucketed sum;
    3. orient every edge from its lower-``(deg, id)`` endpoint to the
       higher — out-degrees are then O(sqrt(m)), the standard bound that
       keeps the wedge set near-linear in m on power-law graphs;
    4. wedges: group oriented edges by source, emit each out-neighbor
       pair — a bucketed groupby;
    5. close: hash-join wedge endpoint pairs against the oriented edge
       set on the pair key — one more bucketed exchange; every match is
       one triangle, credited to all three corners via a final bucketed
       sum.

    The degree map broadcasts via ``ray.put`` under
    ``max_broadcast_nodes`` (8–30 B/node); above the gate step 3 becomes
    two ``shuffle_join``s against the degree table (same orientation
    rule, nothing driver-resident). Ids may be any hashable Arrow type
    (the KG's string entity ids included).
    """
    import ray

    from .relational import shuffle_join

    id_type = None

    def und_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        a = t[src_col].to_pandas()
        b = t[dst_col].to_pandas()
        lo = a.where(a < b, b)
        hi = b.where(a < b, a)
        df = pd.DataFrame({"a": lo, "b": hi})
        df = df[df["a"] != df["b"]].drop_duplicates()
        return pa.table({"a": pa.Array.from_pandas(df["a"]),
                         "b": pa.Array.from_pandas(df["b"])})

    def und_distinct(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"a": t["a"].to_pandas(),
                           "b": t["b"].to_pandas()}).drop_duplicates()
        return pa.table({"a": pa.Array.from_pandas(df["a"]),
                         "b": pa.Array.from_pandas(df["b"])})

    und = bucketed_group_apply(
        edges_ds.map_batches(und_partial, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["a", "b"], und_distinct, num_buckets=num_buckets).materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.concat([t["a"].to_pandas(), t["b"].to_pandas()])
        g = s.value_counts().reset_index()
        g.columns = ["id", "deg"]
        return pa.table({"id": pa.Array.from_pandas(g["id"]),
                         "deg": pa.array(g["deg"], type=pa.int64())})

    def deg_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["id"]).aggregate([("deg", "sum")])
        return pa.table({"id": g["id"], "deg": g["deg_sum"]})

    degs = bucketed_group_apply(
        und.map_batches(deg_partial, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["id"], deg_merge, num_buckets=num_buckets)

    n = degs.count()
    if n <= max_broadcast_nodes:
        dm: dict = {}
        for b in degs.iter_batches(batch_format="pyarrow"):
            dm.update(zip(b["id"].to_pylist(), b["deg"].to_pylist()))
        dref = ray.put(dm) if ray.is_initialized() else dm

        def orient(t: pa.Table) -> pa.Table:
            d = dref if isinstance(dref, dict) else ray.get(dref)
            a = t["a"].to_pylist()
            b = t["b"].to_pylist()
            lo, hi, dv = [], [], []
            for x, y in zip(a, b):
                # orient from lower (deg, id) to higher; carry the head's
                # degree so wedge pairs can be ordered by the SAME total
                # order the closing edge was stored under
                if (d[x], x) <= (d[y], y):
                    lo.append(x)
                    hi.append(y)
                    dv.append(d[y])
                else:
                    lo.append(y)
                    hi.append(x)
                    dv.append(d[x])
            return pa.table({"u": pa.array(lo, type=t["a"].type),
                             "v": pa.array(hi, type=t["b"].type),
                             "dv": pa.array(dv, type=pa.int64())})

        oriented = und.map_batches(orient, batch_format="pyarrow",
                                   zero_copy_batch=True)
    else:
        j1 = shuffle_join(und, degs, "a", "id", suffix="_da",
                          num_buckets=num_buckets)
        j1 = j1.map_batches(
            lambda t: t.rename_columns(
                [{"deg": "deg_a"}.get(c, c) for c in t.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)
        j2 = shuffle_join(j1, degs, "b", "id", suffix="_db",
                          num_buckets=num_buckets)

        def orient_j(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame({
                "a": t["a"].to_pandas(), "b": t["b"].to_pandas(),
                "da": t["deg_a"].to_pandas(), "db": t["deg"].to_pandas()})
            fwd = (df["da"] < df["db"]) | ((df["da"] == df["db"])
                                           & (df["a"] <= df["b"]))
            u = df["a"].where(fwd, df["b"])
            v = df["b"].where(fwd, df["a"])
            dv = df["db"].where(fwd, df["da"])
            return pa.table({"u": pa.Array.from_pandas(u),
                             "v": pa.Array.from_pandas(v),
                             "dv": pa.array(dv, type=pa.int64())})

        oriented = j2.map_batches(orient_j, batch_format="pyarrow",
                                  zero_copy_batch=True)

    oriented = oriented.materialize()

    def wedges_of(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"u": t["u"].to_pandas(),
                           "v": t["v"].to_pandas(),
                           "dv": t["dv"].to_pandas()})
        out_u, out_v, out_w = [], [], []
        for u, grp in df.groupby("u", sort=True):
            # neighbor pairs ordered by the orientation total order
            # (deg, id) — the closing edge between them is stored under
            # exactly this order, so the join key matches
            nbrs = sorted(zip(grp["dv"], grp["v"]))
            for i in range(len(nbrs)):
                for j in range(i + 1, len(nbrs)):
                    out_u.append(u)
                    out_v.append(nbrs[i][1])
                    out_w.append(nbrs[j][1])
        return pa.table({"cu": pa.array(out_u, type=t["u"].type),
                         "v": pa.array(out_v, type=t["v"].type),
                         "w": pa.array(out_w, type=t["v"].type)})

    wedges = bucketed_group_apply(oriented, ["u"], wedges_of,
                                  num_buckets=num_buckets)

    # close wedges against oriented edges on the (v, w) pair key
    def tag_wedge(t: pa.Table) -> pa.Table:
        return pa.table({"v": t["v"], "w": t["w"], "cu": t["cu"],
                         "__side": pa.array([0] * t.num_rows,
                                            type=pa.int64())})

    def tag_edge(t: pa.Table) -> pa.Table:
        nulls = pa.nulls(t.num_rows, type=t["u"].type)
        return pa.table({"v": t["u"], "w": t["v"], "cu": nulls,
                         "__side": pa.array([1] * t.num_rows,
                                            type=pa.int64())})

    both = wedges.map_batches(tag_wedge, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        oriented.map_batches(tag_edge, batch_format="pyarrow",
                             zero_copy_batch=True))

    def close_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        side = t["__side"].to_numpy(zero_copy_only=False)
        wt = t.filter(pa.array(side == 0))
        et = t.filter(pa.array(side == 1))
        wdf = pd.DataFrame({"v": wt["v"].to_pandas(),
                            "w": wt["w"].to_pandas(),
                            "cu": wt["cu"].to_pandas()})
        edf = pd.DataFrame({"v": et["v"].to_pandas(),
                            "w": et["w"].to_pandas()})
        m = wdf.merge(edf.drop_duplicates(), on=["v", "w"], how="inner")
        # per-corner partial counts within the bucket
        s = pd.concat([m["cu"], m["v"], m["w"]])
        g = s.value_counts().reset_index()
        g.columns = ["id", "triangles"]
        return pa.table({"id": pa.Array.from_pandas(g["id"]),
                         "triangles": pa.array(g["triangles"],
                                               type=pa.int64())})

    partials = bucketed_group_apply(both, ["v", "w"], close_bucket,
                                    num_buckets=num_buckets)

    def count_merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["id"]).aggregate([("triangles", "sum")])
        return pa.table({"id": g["id"], "triangles": g["triangles_sum"]})

    return bucketed_group_apply(partials, ["id"], count_merge,
                                num_buckets=num_buckets)
