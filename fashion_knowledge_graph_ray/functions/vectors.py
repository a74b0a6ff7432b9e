"""Deterministic text featurization + vector kernels.

The reference embeds with CLIP / SBERT models loaded per process
(`/root/reference/src/models/embedding_model.py:46-291`) and computes
cosine similarity scalar-at-a-time (`/root/reference/src/utils/tools.py:3-23`).
This engine needs embeddings that are (a) deterministic across workers and
runs with no model downloads, and (b) cheap enough to vectorize — a char
n-gram feature-hashing encoder (the classic hashing trick). Swapping in a
real sentence-transformer is a one-line change at the actor ``__init__``
(extension point; see stages/linker.py).

All kernels are numpy-batched: never call these per row in a hot stage.
"""

from __future__ import annotations

import zlib

import numpy as np

DEFAULT_DIM = 256
_NGRAM = 3


def _ngrams(s: str, n: int = _NGRAM):
    s = f" {s.lower()} "
    return (s[i: i + n] for i in range(max(1, len(s) - n + 1)))


def hash_embed(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """(k,) strings -> (k, dim) float32, L2-normalized feature-hashed
    char-trigram vectors. crc32 is used for bucketing because it is stable
    across processes (Python's builtin ``hash`` is salted per process and
    must never be used for partitioning or features)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        row = out[i]
        for g in _ngrams(t):
            h = zlib.crc32(g.encode("utf-8"))
            sign = 1.0 if h & 0x80000000 else -1.0
            row[h % dim] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def cosine_topk(queries: np.ndarray, index: np.ndarray, k: int,
                mask: np.ndarray | None = None):
    """Batched cosine top-k: queries (q, d) x index (n, d) -> (scores,
    indices) each (q, k). Rows are assumed L2-normalized so cosine is a
    matmul. ``mask`` (q, n) bool marks allowed candidates (metadata
    filters); disallowed candidates score -inf. Ties break on the lower
    index (deterministic).

    Fast path: ``argpartition`` selects the k candidates in O(n) and only
    they are sorted — an exact replacement for the full (q, n) lexsort
    UNLESS a score tie straddles the k boundary (the partition set is then
    arbitrary), so rows where the boundary score is tied (or -inf from
    all-masked candidates) fall back to the full deterministic lexsort.
    Measured: the full lexsort was the single hottest numpy kernel in the
    entity linker at bench scale."""
    sims = queries @ index.T  # (q, n)
    if mask is not None:
        sims = np.where(mask, sims, -np.inf)
    q, n = sims.shape
    k = min(k, n)

    def full_sort(rows: np.ndarray) -> np.ndarray:
        order = np.lexsort(
            (np.broadcast_to(np.arange(n), rows.shape), -rows), axis=1)
        return order[:, :k]

    if k >= n or n <= 64 or q == 0:
        idx = full_sort(sims)
        return np.take_along_axis(sims, idx, axis=1), idx

    part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    part_scores = np.take_along_axis(sims, part, axis=1)
    kth = part_scores.min(axis=1)
    # exact iff exactly k candidates score >= the boundary AND the
    # boundary is finite (an -inf boundary means <k real candidates)
    exact = ((sims >= kth[:, None]).sum(axis=1) == k) & np.isfinite(kth)
    # order each partition set by (-score, index)
    order = np.lexsort((part, -part_scores), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    if not exact.all():
        bad = ~exact
        idx[bad] = full_sort(sims[bad])
    return np.take_along_axis(sims, idx, axis=1), idx


def cosine_sim_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two equal-shape (k, d) matrices (both normalized)."""
    return np.einsum("ij,ij->i", a, b)


def euclidean_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise L2 distance of two equal-shape (k, d) matrices (F2,
    `/root/reference/src/utils/tools.py:25-26` — scalar there, batched
    here; never call per row in a hot stage)."""
    d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
    return np.sqrt(np.einsum("ij,ij->i", d, d))


STYLE_DIM = 384
_STYLE_SEED = np.uint32(0x5EED)


def style_embed(texts, dim: int = STYLE_DIM) -> np.ndarray:
    """Second embedding profile (T3): the analog of the reference's 384-d
    SBERT style encoder (`/root/reference/src/models/embedding_model.py:200-291`),
    kept deliberately DIFFERENT from ``hash_embed``: word-level unigrams +
    bigrams (style sentences are word-structured), a distinct hash seed,
    and 384 dims — so the two retrieval paths of the dual-profile search
    rank differently, as the reference's CLIP-vs-SBERT paths do."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        ws = t.lower().split()
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        row = out[i]
        for g in feats:
            h = zlib.crc32(g.encode("utf-8"), int(_STYLE_SEED))
            sign = 1.0 if h & 0x80000000 else -1.0
            row[h % dim] += sign
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out
