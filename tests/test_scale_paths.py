"""The dense-regime (shuffle) variants must equal their broadcast twins:
candidate-pair verification, anti-join, embedding near-dup routing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog!",   # near-dup of 0
        "a completely different document about sailing boats",
        "the quick brown fox jumped over a lazy dog",     # near-dup-ish
        "yet another unrelated text concerning gardening tips",
        "",                                                # empty text
    ]
    return pa.table({"id": [f"d{i}" for i in range(len(texts))],
                     "text": texts})


def test_candidate_pairs_shuffle_equals_broadcast(ray_session):
    import ray.data as rd

    from fashion_knowledge_graph_ray.stages.canonicalize import (
        candidate_pairs,
        lsh_band_rows,
    )

    docs = rd.from_arrow(_docs_table())
    bands = lsh_band_rows(docs, "text", "id").materialize()

    def pairs(max_broadcast_pairs):
        out = candidate_pairs(bands, rd.from_arrow(_docs_table()),
                              threshold=0.5, num_buckets=4,
                              max_broadcast_pairs=max_broadcast_pairs)
        return sorted((r["a"], r["b"]) for r in out.take_all())

    broadcast = pairs(10**9)
    shuffle = pairs(0)  # force the bucketed semi-join path
    assert broadcast == shuffle
    assert ("d0", "d1") in broadcast  # the near-dups actually verify


def test_anti_join_shuffle_equals_broadcast(ray_session):
    import ray.data as rd

    from fashion_knowledge_graph_ray.stages.relational import (
        anti_join_auto,
        anti_join_keys,
        anti_join_shuffle,
    )

    left = pa.table({"k": list(range(20)),
                     "v": [f"v{i}" for i in range(20)]})
    right = pa.table({"rk": [1, 3, 3, 5, 7, 9, 11, 13, 15, 17, 19, 99]})

    bcast = sorted(r["k"] for r in anti_join_keys(
        rd.from_arrow(left), "k", right["rk"].to_pylist()).take_all())
    shuf = sorted(r["k"] for r in anti_join_shuffle(
        rd.from_arrow(left), "k", rd.from_arrow(right), "rk",
        num_buckets=4).take_all())
    assert bcast == shuf == sorted(set(range(20)) - {1, 3, 5, 7, 9, 11,
                                                     13, 15, 17, 19})
    # routed: tiny key side -> broadcast; max_broadcast_keys=0 -> shuffle
    auto = sorted(r["k"] for r in anti_join_auto(
        rd.from_arrow(left), "k", rd.from_arrow(right), "rk",
        max_broadcast_keys=0, num_buckets=4).take_all())
    assert auto == bcast
    # shuffle path preserves the full row payload
    rows = anti_join_shuffle(rd.from_arrow(left), "k",
                             rd.from_arrow(right), "rk",
                             num_buckets=4).take_all()
    assert all(r["v"] == f"v{r['k']}" for r in rows)


def test_embedding_neardup_routes_to_lsh(ray_session):
    import ray.data as rd

    from fashion_knowledge_graph_ray.stages.dedup import (
        embedding_neardup_pairs,
        lsh_neardup_pairs,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((40, 16))
    # rows 50..54 duplicate rows 0..4 -> cosine 1.0 pairs (i, i+50)
    vecs = np.concatenate([base, base[:5]])
    ids = list(range(40)) + [50 + i for i in range(5)]
    t = pa.table({"vec_id": ids,
                  "embedding": [v.tolist() for v in vecs]})

    exact = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.95,
                                    max_driver_vecs=10**6)
    exact_pairs = sorted((r["a"], r["b"]) for r in exact.take_all())
    assert exact_pairs == [(i, 50 + i) for i in range(5)]

    # max_driver_vecs=0 forces the LSH route; identical vectors share every
    # hyperplane sign, so recall on exact duplicates is 1.0
    lsh = embedding_neardup_pairs(rd.from_arrow(t), threshold=0.95,
                                  max_driver_vecs=0)
    lsh_pairs = sorted((r["a"], r["b"]) for r in lsh.take_all())
    assert lsh_pairs == exact_pairs

    direct = lsh_neardup_pairs(rd.from_arrow(t), threshold=0.95,
                               num_buckets=4)
    assert sorted((r["a"], r["b"]) for r in direct.take_all()) == exact_pairs
