"""Fixed pyarrow schemas for every logical table in the engine.

The reference keeps its record shapes as dicts-by-convention (pydantic
models at `/root/reference/src/utils/models.py:4-25` exist but are never
enforced). Here every table has one frozen Arrow schema; stages validate
against these in tests.
"""

from __future__ import annotations

import pyarrow as pa

from .vocab import ATTRIBUTE_FIELDS

# Primary input (BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Link-target inventory — analog of the reference catalog table
# (`/root/reference/output/data/catalog_combined.csv:1`) enriched with the
# closed attribute schema (`/root/reference/src/utils/prompts.py:4-13`).
TAXONOMY_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("surface", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("category", pa.string()),
        ("gender", pa.string()),
        ("color", pa.string()),
        ("material", pa.list_(pa.string())),
        ("style", pa.list_(pa.string())),
    ]
)


def _attrs_struct() -> pa.StructType:
    fields = []
    for name, _vocab, is_list in ATTRIBUTE_FIELDS:
        fields.append((name, pa.list_(pa.string()) if is_list else pa.string()))
    return pa.struct(fields)


ATTRS_STRUCT = _attrs_struct()

# One row per (page, entity) detection — the "extracted item" analog
# (`/root/reference/src/engine/image_processor.py:113-127`). `salience` is
# the area analog (chars matched); `n_hits` counts raw occurrences folded
# into this row.
MENTIONS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("mention_id", pa.string()),
        ("surface", pa.string()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("salience", pa.int64()),
        ("n_hits", pa.int64()),
        ("context", pa.string()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("attrs", ATTRS_STRUCT),
        ("surface_forms", pa.list_(pa.string())),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("rel", pa.string()),
        ("weight", pa.int64()),
        ("pages", pa.list_(pa.string())),
    ]
)
