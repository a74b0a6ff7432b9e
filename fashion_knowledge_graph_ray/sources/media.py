"""Media table derived deterministically from the ``documents`` table.

The container ships no real image/audio payloads, so the media fixture is
derived from the driver's documents table: payload = zlib(text bytes) —
deterministic, content-dependent, incompressible enough to exercise the
binary plumbing. Kind rotates image/audio/video on ``doc_id % 3`` with
typed meta (the schema contract of stages/multimodal.py).
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa

from ..stages.multimodal import MEDIA_SCHEMA, META_STRUCT

_METAS = {
    "image": {"width": 64, "height": 48, "channels": 3,
              "sample_rate": 0, "n_frames": 1, "format": "fake-img"},
    "audio": {"width": 0, "height": 0, "channels": 1,
              "sample_rate": 8000, "n_frames": 2, "format": "fake-pcm"},
    "video": {"width": 16, "height": 16, "channels": 3,
              "sample_rate": 0, "n_frames": 24, "format": "fake-vid"},
}
_KINDS = ("image", "audio", "video")


def media_batch_from_documents(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    kinds = [_KINDS[i % 3] for i in ids]
    return pa.table({
        "media_id": pa.array([f"doc-{i}" for i in ids], type=pa.string()),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(
            [zlib.compress((t or "").encode("utf-8")) for t in texts],
            type=pa.binary()),
        "meta": pa.array([_METAS[k] for k in kinds], type=META_STRUCT),
    }, schema=MEDIA_SCHEMA)


def media_from_documents(sf_dir: str):
    """documents.parquet -> media Dataset (column-pruned read)."""
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return docs.map_batches(media_batch_from_documents,
                            batch_format="pyarrow", zero_copy_batch=True)
