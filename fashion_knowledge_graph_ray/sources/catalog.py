"""Minor source readers from the reference's ETL surface.

- S2: dict-of-records JSON metadata reader — the reference does
  ``pd.read_json(...).transpose().reset_index()`` over a ``{id: {field:
  value}}`` JSON file (`/root/reference/src/engine/data_preprocessing.py:30-32`),
  i.e. record keys become an ``index`` column;
- S3: line-delimited path-list reader with per-line ``strip()``
  (`/root/reference/src/engine/process_social_media_images.py:48-51`);
- S5: directory lister + suffix filter + head-N
  (`/root/reference/src/engine/data_preprocessing.py:91-104`).

All three return ``ray.data.Dataset``. The JSON transpose runs on the
driver — the reference's metadata files are catalog-sized config inputs,
not data-plane tables (the data plane is parquet)."""

from __future__ import annotations

import json
import os

import pyarrow as pa


def read_json_metadata(path: str, *, index_col: str = "index"):
    """S2: ``{id: {field: value}, ...}`` JSON -> Dataset with ``index_col``
    holding the record keys (the transpose semantics), keys sorted for
    determinism. Field set = union over records; missing fields are null.
    """
    import ray.data as rd

    with open(path) as fh:
        data = json.load(fh)
    if not isinstance(data, dict):
        raise ValueError("expected a dict-of-records JSON object")
    keys = sorted(data)
    fields: list[str] = []
    for k in keys:
        for f in data[k]:
            if f not in fields:
                fields.append(f)
    cols: dict[str, list] = {index_col: keys}
    for f in fields:
        cols[f] = [data[k].get(f) for k in keys]
    return rd.from_arrow(pa.table(cols))


def read_path_list(path: str):
    """S3: text file of paths, one per line, stripped; blank lines dropped.
    ``read_text`` keeps this a streaming read at any file size. Row order
    follows Ray block completion order, NOT file order — callers that
    need a deterministic order should sort (the reference consumes the
    list as an unordered work queue)."""
    import ray.data as rd

    ds = rd.read_text(path)

    def clean(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        stripped = pc.utf8_trim_whitespace(t["text"])
        keep = pc.invert(pc.equal(stripped, ""))
        return pa.table({"path": stripped}).filter(keep)

    return ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def list_dir_filtered(dir_path: str, *, suffix: str = "",
                      limit: int | None = None):
    """S5: sorted directory listing filtered by suffix, head-``limit``.
    Listing happens on the driver (one metadata call — the reference's
    ``os.listdir``); the result is a Dataset of paths for downstream
    distributed reads."""
    import ray.data as rd

    names = sorted(f for f in os.listdir(dir_path) if f.endswith(suffix))
    if limit is not None:
        names = names[:limit]
    return rd.from_arrow(pa.table(
        {"path": [os.path.join(dir_path, f) for f in names]}))
