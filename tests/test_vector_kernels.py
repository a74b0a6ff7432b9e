"""Equivalence tests for the round-4 vectorized kernels: every fast path
must be BIT-identical to the straightforward per-row spec it replaced
(the specs are re-implemented inline here, so a regression in the fast
path cannot hide behind a matching change in the library)."""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pytest

from fashion_knowledge_graph_ray.functions.vectors import (
    DEFAULT_DIM,
    STYLE_DIM,
    _CRC_TABLE,  # noqa: F401  (import sanity)
    _crc32_rows,
    _STYLE_SEED,
    cosine_top1,
    cosine_topk,
    hash_embed,
    list_to_matrix,
    style_embed,
)
from fashion_knowledge_graph_ray.stages.linker import matrix_to_list_array

MIXED_TEXTS = [
    "slim fit jeans",
    "",                       # empty -> zero row
    "a",                      # shorter than the n-gram after padding
    "  double  spaced\ttabs\nand newlines  ",
    "UPPER Case MiXeD",
    "café au lait",           # non-ASCII -> slow path
    "İstanbul dress",         # one-to-many lowercase expansion
    "x" * 500,                # long single token
    "the same the same the same",
    "punct,uation;here.",
]


def ref_hash_embed(texts, dim=DEFAULT_DIM):
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        s = f" {t.lower()} "
        for j in range(max(1, len(s) - 2)):
            h = zlib.crc32(s[j:j + 3].encode("utf-8"))
            out[i, h % dim] += 1.0 if h & 0x80000000 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def ref_style_embed(texts, dim=STYLE_DIM):
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        if not t:
            continue
        ws = t.lower().split()
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        for g in feats:
            h = zlib.crc32(g.encode("utf-8"), int(_STYLE_SEED))
            out[i, h % dim] += 1.0 if h & 0x80000000 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    np.divide(out, norms, out=out, where=norms > 0)
    return out


def test_hash_embed_matches_per_gram_spec():
    got = hash_embed(MIXED_TEXTS)
    want = ref_hash_embed(MIXED_TEXTS)
    assert got.dtype == want.dtype
    assert np.array_equal(got, want)  # bit-identical, not allclose


def test_style_embed_matches_per_feature_spec():
    got = style_embed(MIXED_TEXTS)
    want = ref_style_embed(MIXED_TEXTS)
    assert got.dtype == want.dtype
    assert np.array_equal(got, want)


def test_crc32_rows_matches_zlib():
    rng = np.random.default_rng(7)
    win = rng.integers(0, 256, size=(50, 9), dtype=np.uint8)
    got = _crc32_rows(win)
    want = np.array([zlib.crc32(bytes(r)) for r in win], dtype=np.uint32)
    assert np.array_equal(got, want)
    # variable-length + seed
    lens = rng.integers(1, 10, size=50)
    got = _crc32_rows(win, lens=lens, seed=1234)
    want = np.array([zlib.crc32(bytes(r[:n]), 1234)
                     for r, n in zip(win, lens)], dtype=np.uint32)
    assert np.array_equal(got, want)


def test_list_to_matrix_matches_stack():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((40, 16)).astype(np.float32)
    col = pa.chunked_array([
        pa.array(m[:13].tolist(), type=pa.list_(pa.float32())),
        pa.array(m[13:].tolist(), type=pa.list_(pa.float32())),
    ])
    want64 = np.stack([np.asarray(v, dtype=np.float64)
                       for v in col.to_pylist()])
    assert np.array_equal(list_to_matrix(col), want64)
    assert list_to_matrix(col).dtype == np.float64
    want32 = np.stack([np.asarray(v, dtype=np.float32)
                       for v in col.to_pylist()])
    got32 = list_to_matrix(col, dtype=np.float32)
    assert got32.dtype == np.float32 and np.array_equal(got32, want32)
    # sliced array keeps offsets straight
    sl = col.combine_chunks().slice(5, 20)
    assert np.array_equal(list_to_matrix(sl), want64[5:25])
    # degenerate / invalid inputs fail loudly, never mis-shape
    assert list_to_matrix(pa.array([], type=pa.list_(pa.float32()))) \
        .shape == (0, 0)
    with pytest.raises(ValueError):
        list_to_matrix(pa.array([[1.0], [1.0, 2.0]],
                                type=pa.list_(pa.float64())))
    with pytest.raises(ValueError):
        list_to_matrix(pa.array([[1.0], None],
                                type=pa.list_(pa.float64())))


def test_matrix_to_list_array_roundtrip():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((7, 5)).astype(np.float32)
    arr = matrix_to_list_array(m, pa.float64())
    assert arr.type == pa.list_(pa.float64())
    assert np.array_equal(list_to_matrix(arr), m.astype(np.float64))
    # d == 0: n empty lists, not an error
    arr0 = matrix_to_list_array(np.zeros((3, 0)), pa.float64())
    assert len(arr0) == 3 and arr0.to_pylist() == [[], [], []]


def test_link_many_matches_full_matrix_spec():
    """The category-partitioned, query-deduped _link_many must equal the
    naive dense spec: full (q, n) mask + cosine top-k + head."""
    from fashion_knowledge_graph_ray.datagen import gen_taxonomy
    from fashion_knowledge_graph_ray.stages.linker import EmbeddingLinker

    lk = EmbeddingLinker(gen_taxonomy(42))
    cats = sorted(lk._cat_code)
    gens = sorted(lk._gen_code)
    cols = sorted(lk._col_code)
    surfaces, labels, genders, colors = [], [], [], []
    rng = np.random.default_rng(3)
    pool = ["slim jeans", "floral dress", "leather boots", "zz unknown",
            "silk scarf", "denim jacket", "slim jeans"]  # repeats on purpose
    for i in range(60):
        surfaces.append(pool[int(rng.integers(len(pool)))])
        labels.append([None, "not-a-category",
                       cats[int(rng.integers(len(cats)))]][
                      int(rng.integers(3))])
        genders.append([None, gens[int(rng.integers(len(gens)))]][
                       int(rng.integers(2))])
        colors.append(["", "unknown", "no-such-color",
                       cols[int(rng.integers(len(cols)))]][
                      int(rng.integers(4))])
    # exact taxonomy rows with their own metadata: score 1.0 -> accepted,
    # so the accept branch is exercised, not only the reject one
    tax = gen_taxonomy(42)
    for j in (0, 50, 200):
        surfaces.append(tax["surface"][j].as_py())
        labels.append(tax["category"][j].as_py())
        genders.append(tax["gender"][j].as_py())
        colors.append(tax["color"][j].as_py())

    ok, scores, ents = lk._link_many(surfaces, labels, genders, colors)

    # dense reference spec (pre-round-4 shape)
    q = hash_embed(surfaces, dim=lk.dim)
    lab = lk._codes(labels, lk._cat_code, missing=-1)
    g = lk._codes(genders, lk._gen_code, missing=-2)
    from fashion_knowledge_graph_ray.vocab import UNKNOWN
    c = np.asarray([-1 if (not v or v == UNKNOWN)
                    else lk._col_code.get(v, -2) for v in colors],
                   dtype=np.int32)
    mask = (lab[:, None] == -1) | (lk.cat[None, :] == lab[:, None])
    mask &= (lk.gen[None, :] == lk._unisex) | (lk.gen[None, :] == g[:, None])
    mask &= (c[:, None] == -1) | (lk.col[None, :] == c[:, None])
    sk, ik = cosine_topk(q, lk.index, lk.top_k, mask=mask)
    ref_ok = np.isfinite(sk[:, 0]) & (sk[:, 0] >= lk.threshold)
    assert np.array_equal(ok, ref_ok)
    assert np.array_equal(ents[ok], lk.entity_id[ik[:, 0]][ref_ok])
    assert np.allclose(scores[ok], sk[:, 0][ref_ok])
    assert ok.any()  # the fixture must actually accept some links


def test_band_key_packing_matches_string_spec():
    """The int64 band keys must group EXACTLY like the former string keys:
    minhash (band << 32) | crc32(segment bytes), simhash
    (band << 16) | 16-bit chunk."""
    from fashion_knowledge_graph_ray.stages.canonicalize import (
        _BANDS,
        _NUM_PERM,
        _SHINGLE_K,
        minhash_signature,
    )
    from fashion_knowledge_graph_ray.functions.textstats import simhash64

    texts = ["the quick brown fox jumps", "", "aaaa bbbb cccc",
             "the quick brown fox jumped", "x", "café déjà vu"]
    r = _NUM_PERM // _BANDS
    old, new = [], []
    for t in texts:
        sig = minhash_signature(t or "", _NUM_PERM, _SHINGLE_K)
        for b in range(_BANDS):
            old.append((b, zlib.crc32(sig[b * r:(b + 1) * r].tobytes())))
    sigs = np.stack([minhash_signature(t or "", _NUM_PERM, _SHINGLE_K)
                     for t in texts])
    win = np.ascontiguousarray(sigs).view(np.uint8) \
        .reshape(len(texts) * _BANDS, r * 8)
    h = _crc32_rows(win).astype(np.int64)
    bi = np.tile(np.arange(_BANDS, dtype=np.int64), len(texts))
    for b, k in zip(bi, (bi << np.int64(32)) | h):
        new.append((int(b), int(k & 0xFFFFFFFF)))
    assert old == new

    for t in texts:
        sh = simhash64(t or "")
        for b in range(4):
            chunk = (sh >> (16 * b)) & 0xFFFF
            packed = (b << 16) | chunk
            assert packed >> 16 == b and packed & 0xFFFF == chunk


def test_cosine_top1_matches_topk_head():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((20, 8))
    idx = rng.standard_normal((30, 8))
    # force score ties so the lower-index tie-break is exercised
    idx[7] = idx[3]
    idx[19] = idx[3]
    mask = rng.random((20, 30)) > 0.3
    mask[5] = False  # fully-masked row
    s1, i1 = cosine_top1(q, idx, mask=mask)
    sk, ik = cosine_topk(q, idx, 1, mask=mask)
    assert np.array_equal(i1, ik[:, 0])
    assert np.array_equal(s1, sk[:, 0])


def test_simhash64_batch_matches_per_doc_reference():
    # the vectorized batch kernel (unique-token dedup + unpackbits +
    # reduceat accumulate) must be BIT-identical to the per-doc simhash64
    # it replaced in the fingerprint and simhash-band hot paths
    import random
    import string

    from fashion_knowledge_graph_ray.functions.textstats import (
        simhash64,
        simhash64_batch,
    )

    rng = random.Random(7)
    texts = ["", " ", "the the the", "Hello WORLD", "a b c",
             "İstanbul shawl", None]
    for _ in range(150):
        n = rng.randint(0, 30)
        texts.append(" ".join(
            "".join(rng.choices(string.ascii_letters + "äöü-., ",
                                k=rng.randint(1, 10)))
            for _ in range(n)))
    got = simhash64_batch(texts)
    ref = np.array([simhash64(t or "") for t in texts], dtype=np.uint64)
    assert got.dtype == np.uint64
    assert np.array_equal(got, ref)
