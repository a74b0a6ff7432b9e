"""Decontamination + stratified rate sampling (stages/decontam.py)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from fashion_knowledge_graph_ray.stages.decontam import (
    benchmark_gram_set,
    decontaminate,
    rate_sample,
    text_ngrams,
)


def test_text_ngrams_basics():
    assert text_ngrams("a b c d", 3) == {"a b c", "b c d"}
    assert text_ngrams("A  B\nC", 3) == {"a b c"}  # lowercase + any ws
    assert text_ngrams("a b", 3) == set()  # shorter than n
    assert text_ngrams("", 3) == set()
    assert text_ngrams(None, 3) == set()


def test_benchmark_gram_set_union():
    s = benchmark_gram_set(["a b c", "b c d", None], 2)
    assert s == frozenset({"a b", "b c", "c d"})


@pytest.fixture
def docs_ds(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "quick brown fox jumps over something else ok"},
        {"doc_id": 3, "text": "completely different words appear right here"},
        {"doc_id": 4, "text": "too short"},
        {"doc_id": 5, "text": None},
    ]
    return rd.from_items(rows)


def test_decontaminate_flags_overlap(ray_session, docs_ds):
    bench = benchmark_gram_set(
        ["the quick brown fox jumps over the lazy dog"], 5)
    out = {r["doc_id"]: r for r in
           decontaminate(docs_ds, bench, n=5, threshold_pct=10).take_all()}
    # doc 1 IS the benchmark: full overlap
    assert out[1]["ngrams_hit"] == out[1]["ngrams_total"] > 0
    assert out[1]["contaminated"]
    # doc 2 shares the 5-gram "quick brown fox jumps over" (1 of 4)
    assert out[2]["ngrams_total"] == 4 and out[2]["ngrams_hit"] == 1
    assert out[2]["contaminated"]  # 1*100 >= 4*10
    # doc 3 shares nothing
    assert out[3]["ngrams_hit"] == 0 and not out[3]["contaminated"]
    # docs with no n-grams are never contaminated
    assert out[4]["ngrams_total"] == 0 and not out[4]["contaminated"]
    assert out[5]["ngrams_total"] == 0 and not out[5]["contaminated"]


def test_decontaminate_threshold_integer_rule(ray_session, docs_ds):
    bench = benchmark_gram_set(
        ["the quick brown fox jumps over the lazy dog"], 5)
    strict = {r["doc_id"]: r for r in
              decontaminate(docs_ds, bench, n=5,
                            threshold_pct=30).take_all()}
    # doc 2: 1/4 = 25% < 30% -> clean under the stricter threshold
    assert not strict[2]["contaminated"] and strict[1]["contaminated"]


def _md5cut(i) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()[:8]


def test_rate_sample_exact_membership(ray_session):
    import ray.data as rd

    rows = [{"id": i, "k": "a" if i % 2 == 0 else "b"} for i in range(200)]
    ds = rd.from_items(rows)
    out = rate_sample(ds, {"a": 0.5, "b": 0.1}, key_col="k", id_col="id")
    got = sorted(r["id"] for r in out.take_all())
    exp = sorted(i for i in range(200)
                 if _md5cut(i) < ("80000000" if i % 2 == 0 else "19999999"))
    assert got == exp and 0 < len(got) < 200


def test_rate_sample_monotone_and_default(ray_session):
    import ray.data as rd

    rows = [{"id": i, "k": "zzz"} for i in range(300)]
    ds = rd.from_items(rows)
    lo = {r["id"] for r in rate_sample(
        ds, {}, key_col="k", id_col="id", default_rate=0.2).take_all()}
    hi = {r["id"] for r in rate_sample(
        ds, {}, key_col="k", id_col="id", default_rate=0.6).take_all()}
    assert lo < hi  # deterministic nesting: raising the rate only adds rows
    none = rate_sample(ds, {}, key_col="k", id_col="id").take_all()
    assert none == []  # default_rate=0 drops unknown strata entirely


def test_rate_sample_keeps_schema(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"id": [1, 2], "k": ["a", "a"],
                                 "x": [1.5, 2.5]}))
    out = rate_sample(ds, {"a": 1.0}, key_col="k", id_col="id")
    tbl = pa.Table.from_pylist(out.take_all())
    assert set(tbl.column_names) == {"id", "k", "x"} and tbl.num_rows == 2
