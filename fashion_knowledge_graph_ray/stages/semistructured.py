"""Semi-structured (JSON) column flattening — schema-on-read extraction
of typed fields from a JSON string column, the web-data ETL step for
event payloads, crawl metadata and API dumps.

The reference parses free-form LLM JSON per record with a default-on-
error rule (`/root/reference/src/models/attribute_extraction_model.py:96-114`);
this generalizes that into a batch operator: declared fields, dotted-path
extraction, typed output columns, null (never an exception) for missing
paths, malformed JSON, or type-incompatible values. Stateless
``map_batches`` — no shuffle, streams at any scale. Parsing is a per-row
``json.loads`` (JSON grammar is not vectorizable with stock Arrow
kernels; the per-batch loop is the standard shape, same as the hash
featurizers)."""

from __future__ import annotations

import json

import pyarrow as pa

_CASTS = {
    pa.int64(): int,
    pa.float64(): float,
    pa.string(): str,
    pa.bool_(): bool,
}


def json_flatten(ds, json_col: str, fields: dict[str, tuple[str, pa.DataType]],
                 *, keep: list[str] | None = None):
    """Extract typed fields from ``json_col``.

    ``fields``: output-column → (dotted path, arrow type). Paths descend
    nested objects (``"a.b.c"``); a missing path, non-dict intermediate,
    malformed document, or value that fails the Python cast yields null.
    ``keep``: passthrough columns (default: all except ``json_col``).
    """
    specs = {out: (path.split("."), typ) for out, (path, typ) in
             fields.items()}
    for out, (_, typ) in specs.items():
        if typ not in _CASTS:
            raise ValueError(f"unsupported type for {out}: {typ}")

    def flatten(t: pa.Table) -> pa.Table:
        keep_cols = keep if keep is not None else [
            c for c in t.column_names if c != json_col]
        docs = []
        for raw in t[json_col].to_pylist():
            try:
                docs.append(json.loads(raw) if raw is not None else None)
            except (ValueError, TypeError):
                docs.append(None)
        cols = {c: t[c] for c in keep_cols}
        for out, (path, typ) in specs.items():
            cast = _CASTS[typ]
            vals = []
            for doc in docs:
                v = doc
                for part in path:
                    v = v.get(part) if isinstance(v, dict) else None
                if v is None or isinstance(v, (dict, list)):
                    vals.append(None)
                    continue
                try:
                    # bool is not silently int (JSON true -> int64 null)
                    if typ == pa.int64() and isinstance(v, bool):
                        vals.append(None)
                    elif typ == pa.bool_() and not isinstance(v, bool):
                        vals.append(None)
                    else:
                        vals.append(cast(v))
                except (ValueError, TypeError):
                    vals.append(None)
            cols[out] = pa.array(vals, type=typ)
        return pa.table(cols)

    return ds.map_batches(flatten, batch_format="pyarrow",
                          zero_copy_batch=True)
