"""The flagship pipeline: pages -> mentions -> attrs -> links -> pairs ->
triples/nodes/edges (the KG-build core; reference entry point
`/root/reference/src/engine/process_social_media_images.py:13-149` +
`process_catalog.py:15-84`, re-expressed per SURVEY.md §3.2).

Shape:

    pages = read_parquet(...)                 # S4
      -> extract_text map_batches            # M13 (byte-identity invariant)
      -> dedup by url                        # G7
      -> MentionDetector actor pool          # M6/T1
      -> attrs map_batches                   # M8/M9
      -> Linker actor pool                   # J1/T8
      -> write linked/ parquet               # lineage cut point
    pairs  = linked -> pair flat-map          # G1  -> write pairs/
    edges  = pairs groupby(src,dst,rel)       # G2/G3 (partial-combined)
    nodes  = linked explode -> groupby(eid)   # G4
    triples= dedup(attr ∪ rel triples)

The ``linked/`` and ``pairs/`` Parquet directories are deliberate
materialization cut points: they are (a) the fan-out inputs consumed by
multiple downstream branches (so the expensive extraction/link pass runs
ONCE), and (b) the per-partition resume artifacts — final aggregations are
always recomputed from them, never incrementally updated, so a resumed run
can never double-count (fixes the reference's re-run weight inflation,
SURVEY.md §4.4).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

import pyarrow as pa

from ..stages.aggregate import aggregate_edges, merge_nodes
from ..stages.attributes import extract_attributes
from ..stages.extract import dedup_pages, extract_pages
from ..stages.linker import link_mentions
from ..stages.mentions import detect_mentions
from ..stages.pairs import explode_mentions, generate_pairs
from ..stages.triples import dedup_triples, emit_attr_triples, emit_rel_triples


def _ensure_nonempty(path: str, schema: pa.Schema) -> None:
    """An empty Dataset writes no files; leave a valid empty-parquet marker
    so downstream ``read_parquet`` of the directory always works."""
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        pq.write_table(schema.empty_table(), os.path.join(path, "empty.parquet"))


from ..schemas import ATTRS_STRUCT, NODES_SCHEMA, TRIPLES_SCHEMA  # noqa: E402
from ..stages.mentions import MENTION_STRUCT  # noqa: E402
from ..stages.pairs import PAIRS_SCHEMA as _PAIRS_EMPTY  # noqa: E402

_LINKED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("lang", pa.string()),
        ("mentions", pa.list_(pa.struct(
            list(MENTION_STRUCT)
            + [pa.field("attrs", ATTRS_STRUCT),
               pa.field("style_description", pa.string()),
               pa.field("entity_id", pa.string()),
               pa.field("link_score", pa.float64())]))),
    ]
)

_EDGES_OUT_SCHEMA = pa.schema(
    [
        ("src", pa.string()), ("dst", pa.string()), ("rel", pa.string()),
        ("weight", pa.int64()), ("pages", pa.list_(pa.string())),
        ("evidence_truncated", pa.bool_()),
    ]
)


@dataclass
class GraphBuildResult:
    out_dir: str
    linked_path: str
    pairs_path: str
    triples_path: str
    nodes_path: str
    edges_path: str

    def dataset(self, which: str):
        import ray.data as rd

        # partitioning=None: resumable builds lay tables out as
        # part=i subdirs; lineage must not hive-inject a `part` column.
        return rd.read_parquet(getattr(self, f"{which}_path"),
                               partitioning=None)


def build_linked(pages_ds, taxonomy_ref, *, link_mode: str = "embedding",
                 single_product_mode: bool = False, dedup: bool = True,
                 concurrency=(1, 8)):
    """pages -> linked page-mentions Dataset (the narrow one-pass chain)."""
    ds = extract_pages(pages_ds)
    if dedup:
        ds = dedup_pages(ds)
    ds = detect_mentions(ds, taxonomy_ref,
                         single_product_mode=single_product_mode,
                         concurrency=concurrency)
    ds = extract_attributes(ds)
    ds = link_mentions(ds, taxonomy_ref, mode=link_mode,
                       concurrency=concurrency)
    return ds


def build_graph(pages_ds, taxonomy: pa.Table, out_dir: str, *,
                link_mode: str = "embedding",
                single_product_mode: bool = False,
                dedup: bool = True,
                concurrency=(1, 8)) -> GraphBuildResult:
    """Run the full KG build, writing Parquet tables under ``out_dir``."""
    import ray
    import ray.data as rd

    tax_ref = ray.put(taxonomy) if ray.is_initialized() else taxonomy

    paths = {k: os.path.join(out_dir, k)
             for k in ("linked", "pairs", "triples", "nodes", "edges")}
    # Outputs must be overwrite-semantics: Ray's write_parquet APPENDS part
    # files into an existing directory, which would double-count on re-run —
    # the exact reference bug (SURVEY.md §4.4) this pipeline exists to fix.
    for p in paths.values():
        shutil.rmtree(p, ignore_errors=True)

    linked = build_linked(pages_ds, tax_ref, link_mode=link_mode,
                          single_product_mode=single_product_mode,
                          dedup=dedup, concurrency=concurrency)
    linked.write_parquet(paths["linked"])
    _ensure_nonempty(paths["linked"], _LINKED_SCHEMA)
    linked = rd.read_parquet(paths["linked"])

    pairs = generate_pairs(linked, tax_ref)
    pairs.write_parquet(paths["pairs"])
    _ensure_nonempty(paths["pairs"], _PAIRS_EMPTY)
    pairs = rd.read_parquet(paths["pairs"])

    edges = aggregate_edges(pairs)
    edges.write_parquet(paths["edges"])
    _ensure_nonempty(paths["edges"], _EDGES_OUT_SCHEMA)

    flat = explode_mentions(linked)
    nodes = merge_nodes(flat)
    nodes.write_parquet(paths["nodes"])
    _ensure_nonempty(paths["nodes"], NODES_SCHEMA)

    triples = dedup_triples(
        emit_attr_triples(explode_mentions(linked)).union(emit_rel_triples(pairs))
    )
    triples.write_parquet(paths["triples"])
    _ensure_nonempty(paths["triples"], TRIPLES_SCHEMA)

    return GraphBuildResult(out_dir=out_dir, linked_path=paths["linked"],
                            pairs_path=paths["pairs"],
                            triples_path=paths["triples"],
                            nodes_path=paths["nodes"],
                            edges_path=paths["edges"])
