"""Query layer: traversal predicates, tie-breaks, RRF arithmetic (§3.3)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from fashion_knowledge_graph_ray.pipelines.query import (
    RRF_K0,
    complete_the_look,
    node_properties,
    related_entities,
    rrf_fusion_ds,
    rrf_scores,
    text_vector_search,
)


def _edges_table():
    rows = [
        # src, dst, rel, weight
        ("e1", "e2", "worn_with", 5),
        ("e1", "e3", "worn_with", 5),      # tie with e2 -> dst ASC breaks
        ("e1", "e4", "worn_with", 9),
        ("e1", "e5", "worn_with", 1),
        ("e1", "e6", "complemented_by", 4),
        ("e2", "e1", "worn_with", 5),
    ]
    return pa.table(
        {
            "src": [r[0] for r in rows],
            "dst": [r[1] for r in rows],
            "rel": [r[2] for r in rows],
            "weight": pa.array([r[3] for r in rows], type=pa.int64()),
            "pages": pa.array([["u"]] * len(rows), type=pa.list_(pa.string())),
        }
    )


TYPE_OF = {"e1": "top", "e2": "shoes", "e3": "bag", "e4": "top",
           "e5": "hat", "e6": "top"}


def test_related_entities_topk_and_tiebreak(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(_edges_table())
    out = related_entities(edges, "e1", "worn_with", weight_threshold=2,
                           top_k=2)
    assert out["dst"].to_pylist() == ["e4", "e2"]  # 9 first; tie 5/5 -> e2<e3
    assert out["weight"].to_pylist() == [9, 5]


def test_related_entities_type_predicate(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(_edges_table())
    # worn_with: exclude same-type neighbors (e4 is 'top' like e1)
    out = related_entities(edges, "e1", "worn_with", top_k=10,
                           entity_type="top", same_type=False,
                           type_of=TYPE_OF)
    assert "e4" not in out["dst"].to_pylist()
    # complemented_by: only same-type
    out2 = related_entities(edges, "e1", "complemented_by", top_k=10,
                            entity_type="top", same_type=True,
                            type_of=TYPE_OF)
    assert out2["dst"].to_pylist() == ["e6"]


def test_complete_the_look(ray_session):
    import ray.data as rd

    edges = rd.from_arrow(_edges_table())
    rec = complete_the_look(edges, "e1", "top", TYPE_OF, top_k=3)
    assert rec["worn_with"]["dst"].to_pylist() == ["e2", "e3", "e5"]
    assert rec["complemented_by"]["dst"].to_pylist() == ["e6"]


def test_rrf_arithmetic_hand_computed():
    # FIXTURES.md §4: RRF score = sum 1/(60+rank)
    got = rrf_scores([["a", "b", "c"], ["b", "a"]])
    exp_a = 1 / 61 + 1 / 62
    exp_b = 1 / 62 + 1 / 61
    exp_c = 1 / 63
    d = dict(got)
    assert d["a"] == pytest.approx(exp_a)
    assert d["b"] == pytest.approx(exp_b)
    assert d["c"] == pytest.approx(exp_c)
    # a == b exactly -> id ASC tie-break
    assert [k for k, _ in got] == ["a", "b", "c"]


def test_rrf_fusion_ds_matches_pure(ray_session):
    import ray.data as rd

    ranked = pa.table(
        {
            "id": ["a", "b", "c", "b", "a"],
            "rank": pa.array([1, 2, 3, 1, 2], type=pa.int64()),
        }
    )
    out = rrf_fusion_ds(rd.from_arrow(ranked), top_k=3).take_all()
    pure = rrf_scores([["a", "b", "c"], ["b", "a"]])
    assert [(r["id"], pytest.approx(r["rrf_score"])) for r in out] == \
        [(k, pytest.approx(v)) for k, v in pure]
    assert RRF_K0 == 60


def test_text_vector_search(ray_session):
    from fashion_knowledge_graph_ray.datagen import gen_taxonomy

    tax = gen_taxonomy(42)
    out = text_vector_search("black blouse", tax, top_k=5, threshold=0.2)
    assert out["entity_id"].to_pylist()[0] == "prod-000000"
    assert out["score"].to_pylist()[0] == pytest.approx(1.0, abs=1e-6)


def test_node_properties_point_lookup(ray_session, tmp_path):
    import ray.data as rd

    nodes = pa.table(
        {
            "entity_id": ["e1", "e2"],
            "attrs": [{"type": "top"}, {"type": "bag"}],
            "surface_forms": [["black blouse"], ["teal tote"]],
        }
    )
    got = node_properties(rd.from_arrow(nodes), "e2")
    assert got["attrs"]["type"] == "bag"
    assert node_properties(rd.from_arrow(nodes), "missing") is None
