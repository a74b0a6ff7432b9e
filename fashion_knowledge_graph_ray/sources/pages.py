"""Page-table sources.

``read_pages`` — the production reader: Parquet with column pruning (S4;
the reference loads whole documents one at a time,
`/root/reference/src/engine/image_processor.py:63-87`).

``pages_from_documents`` — derives a deterministic `pages` table from the
driver-provided ``documents`` testdata table, planting taxonomy mentions by
pure doc_id arithmetic:

    mentions(d) = { (d*7) % 500, (d*13) % 500 }   if d % 3 != 0, else {}

Because the rule is arithmetic, the whole KG pipeline over these pages is
expressible in ANSI SQL — the DuckDB oracle recomputes mentions/pairs/edges
without string matching while the Ray path does the REAL work
(extract_text -> gazetteer detection -> linking -> pairs -> aggregation).
The base document vocabulary shares no bigram with any taxonomy surface,
so detection can find exactly the planted mentions and nothing else.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..datagen import EPOCH_2025, gen_taxonomy
from ..schemas import PAGES_SCHEMA

N_ENTITIES = 500
_SURFACES: list[str] | None = None


def _surfaces() -> list[str]:
    global _SURFACES
    if _SURFACES is None:
        _SURFACES = gen_taxonomy(42, N_ENTITIES)["surface"].to_pylist()
    return _SURFACES


def mention_entity_ids(doc_id: int) -> list[int]:
    if doc_id % 3 == 0:
        return []
    return sorted({(doc_id * 7) % N_ENTITIES, (doc_id * 13) % N_ENTITIES})


def _page_row(doc_id: int, text: str, lang: str) -> dict:
    surfaces = _surfaces()
    ents = mention_entity_ids(doc_id)
    title = f"Doc {doc_id}"
    paras = [text]
    if len(ents) == 2:
        paras.append(f"Featuring the {surfaces[ents[0]]} and the "
                     f"{surfaces[ents[1]]} today.")
    elif len(ents) == 1:
        paras.append(f"Featuring the {surfaces[ents[0]]} today.")
    golden = "\n".join([title] + paras)
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = ("<html><head><title>d</title></head><body>"
            f"<article><h1>{title}</h1>{body}</article></body></html>")
    return {
        "url": f"https://docs.example/{doc_id:08d}",
        "warc_ts": EPOCH_2025 + doc_id,
        "html": html.encode("utf-8"),
        "text": golden,
        "lang": lang,
    }


def pages_from_documents(sf_dir: str, *, null_text: bool = True):
    """documents.parquet -> pages Dataset (PAGES_SCHEMA).

    ``null_text=True`` nulls the text column so the extract stage must
    recompute it from html (exercising the byte-identity path end-to-end).
    """
    import ray.data as rd

    # override_num_blocks: the single-file testdata table would otherwise
    # be ONE block under the default 128 MiB target and serialize the whole
    # CPU-bound extract/detect chain into one task.
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text", "lang"],
                           override_num_blocks=64)

    def to_pages(batch: pa.Table) -> pa.Table:
        rows = [
            _page_row(int(d), t or "", lg or "und")
            for d, t, lg in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist(),
                                batch["lang"].to_pylist())
        ]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], type=pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows],
                                    type=pa.timestamp("us", tz="UTC")),
                "html": pa.array([r["html"] for r in rows], type=pa.binary()),
                "text": pa.array([None] * len(rows) if null_text
                                 else [r["text"] for r in rows],
                                 type=pa.string()),
                "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    return docs.map_batches(to_pages, batch_format="pyarrow",
                            batch_size=2048, zero_copy_batch=True)


def read_pages(path: str, *, columns=None, filter_expr=None):
    """Column-pruned, predicate-pushed Parquet read of a pages table."""
    import ray.data as rd

    kw = {}
    if columns:
        kw["columns"] = list(columns)
    if filter_expr is not None:
        kw["filter"] = filter_expr
    return rd.read_parquet(path, **kw)
