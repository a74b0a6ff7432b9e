"""Similarity search over an embedding column (task brief requirement).

- ``brute_force_topk`` — the exact baseline: broadcast the (few) query
  vectors via ``ray.put``; each batch computes one (batch x queries)
  matmul and emits its LOCAL top-k per query (partial combine!); one small
  bucketed reduce per query merges partials into the global top-k. The
  full corpus streams; nothing is materialized.
- ``lsh_bucketed_topk`` — the scale path: seeded random-hyperplane signs
  give every vector a ``nbits``-bit bucket; a query only scans its own
  bucket (plus Hamming-1 probes), so each probe touches ~``n / 2^nbits``
  of the corpus. Approximate; recall grows with probes.

Reference analog: the Pinecone ANN query (J1,
`/root/reference/src/database/vector_database.py:127-191`), generalized to
a batch operator over ``embeddings``-style tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bucketed import bucketed_group_apply


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def brute_force_topk(ds, queries: np.ndarray, k: int, *,
                     emb_col: str = "embedding", id_col: str = "vec_id",
                     query_ids: list | None = None, num_buckets: int = 16):
    """Exact cosine top-k of each query against the whole corpus.

    Returns Dataset (query_id, vec_id, score, rank) with rank 1..k per
    query, ties broken by vec_id ASC (deterministic)."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(qm)))
    ref = ray.put((qids, qm)) if ray.is_initialized() else (qids, qm)

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(ref) if not isinstance(ref, tuple) else ref
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                   for v in batch[emb_col].to_pylist()]))
        sims = qm_ @ mat.T  # (q, n)
        kk = min(k, sims.shape[1])
        order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)
        top = order[:, :kk]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            out_q.extend([qids_[qi]] * kk)
            out_v.extend(ids[top[qi]].tolist())
            out_s.extend(sims[qi, top[qi]].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=4096, zero_copy_batch=True)

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"query_id": t["query_id"].to_pandas(),
                           "vec_id": t["vec_id"].to_pandas(),
                           "score": t["score"].to_pandas()})
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True])
        df = df.groupby("query_id", sort=True).head(k)
        df["rank"] = df.groupby("query_id", sort=True).cumcount() + 1
        return pa.table({"query_id": pa.array(df["query_id"], type=pa.int64()),
                         "vec_id": pa.array(df["vec_id"], type=pa.int64()),
                         "score": pa.array(df["score"], type=pa.float64()),
                         "rank": pa.array(df["rank"], type=pa.int64())})

    return bucketed_group_apply(partials, ["query_id"], merge,
                                num_buckets=num_buckets)


def _spherical_kmeans(sample: np.ndarray, ncentroids: int, *,
                      iters: int = 10, seed: int = 42) -> np.ndarray:
    """Seeded spherical k-means over L2-normalized vectors (cosine
    assignment). Deterministic: seeded init, fixed iteration count, empty
    clusters re-seeded from the worst-assigned points in index order."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n = sample.shape[0]
    k = min(ncentroids, n)
    cent = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        sims = sample @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members) == 0:
                worst = int(np.argmin(np.max(sims, axis=1)))
                cent[c] = sample[worst]
                continue
            m = members.sum(axis=0)
            nrm = np.linalg.norm(m)
            cent[c] = m / nrm if nrm > 0 else cent[c]
    return cent


def ivf_topk(ds, queries: np.ndarray, k: int, *,
             emb_col: str = "embedding", id_col: str = "vec_id",
             query_ids: list | None = None, ncentroids: int = 16,
             nprobe: int = 4, train_sample: int = 4096,
             num_buckets: int = 16, seed: int = 42):
    """Approximate cosine top-k via an IVF (inverted-file) index: centroids
    trained once on a driver-side sample with seeded spherical k-means,
    broadcast to every task; a vector is a candidate iff its nearest
    centroid is among the query's ``nprobe`` closest centroids. Scan
    fraction ≈ nprobe/ncentroids per query — the clustered-corpus scale
    path alongside the hyperplane LSH variant. Same output schema as
    ``brute_force_topk``."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(qm)))
    sample_rows = ds.limit(train_sample).take_all()
    sample = _normalize(np.stack([np.asarray(r[emb_col], dtype=np.float64)
                                  for r in sample_rows]))
    cent = _spherical_kmeans(sample, ncentroids, seed=seed)
    q_probe = np.argsort(-(qm @ cent.T), axis=1)[:, :min(nprobe, len(cent))]
    probe_sets = [set(row.tolist()) for row in q_probe]
    ref = ray.put((qids, qm, cent, probe_sets)) if ray.is_initialized() \
        else (qids, qm, cent, probe_sets)

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qm_, cent_, probes_ = (ray.get(ref)
                                      if not isinstance(ref, tuple) else ref)
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                   for v in batch[emb_col].to_pylist()]))
        vc = np.argmax(mat @ cent_.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            mask = np.isin(vc, list(probes_[qi]))
            if not mask.any():
                continue
            cand_ids = ids[mask]
            sims = mat[mask] @ qm_[qi]
            kk = min(k, len(cand_ids))
            order = np.lexsort((cand_ids, -sims))[:kk]
            out_q.extend([qids_[qi]] * kk)
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=4096, zero_copy_batch=True)
    return bucketed_group_apply(partials, ["query_id"], _merge_topk(k),
                                num_buckets=num_buckets)


def _merge_topk(k: int):
    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"query_id": t["query_id"].to_pandas(),
                           "vec_id": t["vec_id"].to_pandas(),
                           "score": t["score"].to_pandas()})
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True])
        df = df.groupby("query_id", sort=True).head(k)
        df["rank"] = df.groupby("query_id", sort=True).cumcount() + 1
        return pa.table({"query_id": pa.array(df["query_id"], type=pa.int64()),
                         "vec_id": pa.array(df["vec_id"], type=pa.int64()),
                         "score": pa.array(df["score"], type=pa.float64()),
                         "rank": pa.array(df["rank"], type=pa.int64())})
    return merge


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((nbits, dim))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0  # (n, nbits)
    return (bits @ (1 << np.arange(planes.shape[0]))).astype(np.int64)


def lsh_bucketed_topk(ds, queries: np.ndarray, k: int, *,
                      emb_col: str = "embedding", id_col: str = "vec_id",
                      query_ids: list | None = None, nbits: int = 6,
                      probes: int = 1, num_buckets: int = 16, seed: int = 42):
    """Approximate cosine top-k: candidates limited to vectors whose
    hyperplane bucket matches the query's (plus ``probes-1`` extra buckets
    by flipping the lowest bits). Same output schema as brute_force_topk."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qids = list(query_ids) if query_ids is not None else list(range(len(qm)))
    planes = _hyperplanes(qm.shape[1], nbits, seed)
    qb = _bucket_of(qm, planes)
    # margin-ordered multiprobe: a neighbor most likely differs on the
    # bits whose hyperplane margin |q . plane| is smallest, so probe the
    # buckets reached by flipping the most UNCERTAIN bits first (subsets
    # ordered by total flipped margin) — far better recall per probe than
    # flipping fixed low bits.
    margins = qm @ planes.T  # (q, nbits)
    probe_sets = []
    t = min(nbits, max(1, (max(probes - 1, 1)).bit_length() + 1))
    for qi, b in enumerate(qb):
        order = np.argsort(np.abs(margins[qi]))[:t]
        subsets = []
        for mask in range(1 << t):
            flip = 0
            loss = 0.0
            for j in range(t):
                if mask >> j & 1:
                    flip |= 1 << int(order[j])
                    loss += abs(float(margins[qi, order[j]]))
            subsets.append((loss, int(b) ^ flip))
        subsets.sort()
        probe_sets.append({code for _, code in subsets[:probes]})
    ref = ray.put((qids, qm, probe_sets)) if ray.is_initialized() \
        else (qids, qm, probe_sets)

    def local_topk(batch: pa.Table) -> pa.Table:
        qids_, qm_, probes_ = ray.get(ref) if not isinstance(ref, tuple) else ref
        ids = np.asarray(batch[id_col].to_pylist())
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                   for v in batch[emb_col].to_pylist()]))
        vb = _bucket_of(mat, planes)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            mask = np.isin(vb, list(probes_[qi]))
            if not mask.any():
                continue
            cand_ids = ids[mask]
            sims = mat[mask] @ qm_[qi]
            kk = min(k, len(cand_ids))
            order = np.lexsort((cand_ids, -sims))[:kk]
            out_q.extend([qids_[qi]] * kk)
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table({"query_id": pa.array(out_q, type=pa.int64()),
                         "vec_id": pa.array(out_v, type=pa.int64()),
                         "score": pa.array(out_s, type=pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow",
                              batch_size=4096, zero_copy_batch=True)

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({"query_id": t["query_id"].to_pandas(),
                           "vec_id": t["vec_id"].to_pandas(),
                           "score": t["score"].to_pandas()})
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True])
        df = df.groupby("query_id", sort=True).head(k)
        df["rank"] = df.groupby("query_id", sort=True).cumcount() + 1
        return pa.table({"query_id": pa.array(df["query_id"], type=pa.int64()),
                         "vec_id": pa.array(df["vec_id"], type=pa.int64()),
                         "score": pa.array(df["score"], type=pa.float64()),
                         "rank": pa.array(df["rank"], type=pa.int64())})

    return bucketed_group_apply(partials, ["query_id"], merge,
                                num_buckets=num_buckets)


def kmeans_assign(ds, ncentroids: int, *, emb_col: str = "embedding",
                  id_col: str = "vec_id", train_sample: int = 4096,
                  seed: int = 42):
    """Corpus clustering: assign every vector to its nearest spherical
    k-means centroid (cosine). The standard corpus-organization step for
    cluster-balanced training mixes and cluster-local dedup.

    Scale shape mirrors ``ivf_topk``'s index build: centroids train ONCE
    on a driver-side sample (seeded, deterministic), broadcast via
    ``ray.put``, and assignment is a stateless batch-local matmul+argmax
    over the streaming corpus — no shuffle, no driver materialization of
    vectors beyond the fixed sample. Output rows: ``(id_col, cluster)``.
    """
    import ray

    sample_rows = ds.limit(train_sample).take_all()
    sample = _normalize(np.stack([np.asarray(r[emb_col], dtype=np.float64)
                                  for r in sample_rows]))
    cent = _spherical_kmeans(sample, ncentroids, seed=seed)
    ref = ray.put(cent) if ray.is_initialized() else cent

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array([], type=pa.int64())})
        c = ref if isinstance(ref, np.ndarray) else ray.get(ref)
        mat = _normalize(np.stack(
            [np.asarray(v, dtype=np.float64)
             for v in batch[emb_col].to_pylist()]))
        cl = np.argmax(mat @ c.T, axis=1)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(cl, type=pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
