"""CLI — the reference's four entry points as one command surface.

Reference analogs (SURVEY.md §3):
- ``build``    ↔ ``python src/engine/process_social_media_images.py`` +
  ``process_catalog.py`` (edge + node construction in one DAG)
- ``resume``   ↔ same, checkpoint-resumable partitioned variant
- ``curate``   ↔ the training-data curation composition (engine addition)
- ``query``    ↔ the recommender query surface
  (`/root/reference/src/inference/recommender.py`)
- ``datagen``  ↔ deterministic synthetic corpus generator (fixtures)

This module OWNS a Ray session (init guarded / shutdown on exit) — the
library itself never does (driver contract, ``__ray_entry__.py``).

Examples::

    python -m fashion_knowledge_graph_ray datagen --pages 10000 \
        --out /tmp/pages
    python -m fashion_knowledge_graph_ray build --pages /tmp/pages \
        --out /tmp/kg --canonicalize
    python -m fashion_knowledge_graph_ray query related \
        --kg /tmp/kg --entity prod-000001 --rel worn_with
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": num_cpus} if num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def _cmd_datagen(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .datagen import pages_dataset

    pages_dataset(seed=args.seed, n_pages=args.pages) \
        .write_parquet(args.out)
    print(json.dumps({"out": args.out, "pages": args.pages}))
    ray.shutdown()
    return 0


def _cmd_build(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .datagen import gen_taxonomy
    from .pipelines.build_graph import build_graph

    pages = rd.read_parquet(args.pages)
    res = build_graph(pages, gen_taxonomy(args.seed), args.out,
                      link_mode=args.link_mode,
                      canonicalize=args.canonicalize)
    print(json.dumps({"out": args.out,
                      "tables": ["triples", "nodes", "edges", "linked",
                                 "pairs", "embeddings"],
                      "triples_path": res.triples_path}))
    ray.shutdown()
    return 0


def _cmd_resume(args) -> int:
    ray = _ray_session(args.num_cpus)
    from .datagen import gen_taxonomy
    from .pipelines.resumable import build_graph_resumable

    build_graph_resumable(args.pages, gen_taxonomy(args.seed),
                          args.out, link_mode=args.link_mode,
                          canonicalize=args.canonicalize)
    import os

    print(json.dumps({"out": args.out,
                      "metrics": os.path.join(args.out, "metrics.json")}))
    ray.shutdown()
    return 0


def _cmd_curate(args) -> int:
    ray = _ray_session(args.num_cpus)
    import ray.data as rd

    from .pipelines.curate import curate_corpus

    docs = rd.read_parquet(args.docs)
    out = curate_corpus(docs, near_dedup=args.near_dedup)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    ray.shutdown()
    return 0


def _cmd_query(args) -> int:
    ray = _ray_session(args.num_cpus)
    import os

    import ray.data as rd

    edges = rd.read_parquet(os.path.join(args.kg, "edges"))
    if args.what == "related":
        from .pipelines.query import related_entities

        out = related_entities(edges, args.entity, args.rel,
                               weight_threshold=args.min_weight,
                               top_k=args.top_k)
        print(json.dumps(out.to_pylist(), default=str))
    elif args.what == "look":
        import pyarrow as pa
        import pyarrow.compute as pc

        from .pipelines.query import complete_the_look

        nodes = rd.read_parquet(os.path.join(args.kg, "nodes"))
        # type lookup only for the queried entity + its 1-hop neighbors
        # (bounded by one node's degree) — never the whole node table on
        # the driver
        ent = args.entity
        nbrs = edges.map_batches(
            lambda t: t.filter(pc.equal(t["src"], ent)).select(["dst"]),
            batch_format="pyarrow", zero_copy_batch=True)
        cand = pa.array(sorted({ent} | {r["dst"] for r in nbrs.take_all()}),
                        type=pa.string())
        sel = nodes.map_batches(
            lambda t: t.filter(pc.is_in(t["entity_id"], value_set=cand))
            .select(["entity_id", "attrs"]),
            batch_format="pyarrow", zero_copy_batch=True)
        type_of = {r["entity_id"]: (r["attrs"] or {}).get("type")
                   for r in sel.take_all()}
        out = complete_the_look(edges, args.entity,
                                type_of.get(args.entity), type_of,
                                top_k=args.top_k)
        print(json.dumps({k: v.to_pylist() for k, v in out.items()},
                         default=str))
    elif args.what == "outfit":
        # style-match-by-text over the PERSISTED dual-profile embeddings
        # table (reference recommender.py:327-510) — no taxonomy reload,
        # no re-embedding
        import pyarrow.parquet as pq

        from .pipelines.query import outfit_from_text

        tbl = pq.read_table(os.path.join(args.kg, "embeddings"))
        out = outfit_from_text(args.text, tbl, top_k=args.top_k)
        print(json.dumps(out.to_pylist(), default=str))
    else:  # pagerank over the built KG
        import pyarrow.compute as pc

        from .stages.graph import pagerank

        def to_int(t):
            import pyarrow as pa

            return pa.table({
                "src": pc.utf8_slice_codeunits(t["src"], 5)
                .cast("int64"),
                "dst": pc.utf8_slice_codeunits(t["dst"], 5)
                .cast("int64"),
                "weight": t["weight"]})

        pr = pagerank(edges.map_batches(to_int, batch_format="pyarrow"),
                      weight_col="weight", iters=3)
        top = pr.sort(["rank", "id"],
                      descending=[True, False]).limit(args.top_k)
        print(json.dumps([
            {"entity_id": f"prod-{r['id']:06d}", "rank": r["rank"]}
            for r in top.take_all()]))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fashion_knowledge_graph_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("datagen")
    g.add_argument("--pages", type=int, default=10_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=_cmd_datagen)

    b = sub.add_parser("build")
    b.add_argument("--pages", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--seed", type=int, default=42)
    b.add_argument("--link-mode", choices=["embedding", "gazetteer"],
                   default="embedding")
    b.add_argument("--canonicalize", action="store_true")
    b.set_defaults(fn=_cmd_build)

    r = sub.add_parser("resume")
    r.add_argument("--pages", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--seed", type=int, default=42)
    r.add_argument("--link-mode", choices=["embedding", "gazetteer"],
                   default="embedding")
    r.add_argument("--canonicalize", action="store_true")
    r.set_defaults(fn=_cmd_resume)

    c = sub.add_parser("curate")
    c.add_argument("--docs", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--near-dedup", action="store_true")
    c.set_defaults(fn=_cmd_curate)

    q = sub.add_parser("query")
    q.add_argument("what", choices=["related", "look", "outfit", "pagerank"])
    q.add_argument("--kg", required=True)
    q.add_argument("--entity", default="")
    q.add_argument("--text", default="", help="outfit: free-text style query")
    q.add_argument("--rel", default="worn_with")
    q.add_argument("--min-weight", type=int, default=1)
    q.add_argument("--top-k", type=int, default=10)
    q.set_defaults(fn=_cmd_query)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
