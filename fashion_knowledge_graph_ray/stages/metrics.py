"""G9: value-counts metrics stage.

The reference computes per-class mask statistics (pixel counts / label
histograms) as build-side metrics
(`/root/reference/src/models/segmentation_model.py:173-206`). The engine
analog counts mention labels (and any other categorical column) with the
standard partial-combine + bucketed-merge shape, and feeds the per-partition
label histogram into the lineage manifests / metrics.json
(pipelines/resumable.py)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_group_apply


def value_counts(ds, col: str, *, num_buckets: int = 16):
    """Dataset -> (value, n) counts of ``col``. Per-batch ``pc.value_counts``
    partials (a hot value ships one int row per block), one bucketed merge.
    Nulls are counted under the value NULL, matching ``pc.value_counts``."""

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[col].combine_chunks())
        return pa.table({"value": vc.field("values"),
                         "n": vc.field("counts").cast(pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["value"]).aggregate([("n", "sum")])
        return pa.table({"value": g["value"], "n": g["n_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_group_apply(partials, ["value"], merge,
                                num_buckets=num_buckets)


def mention_label_counts(linked_dir: str) -> dict[str, int]:
    """Per-partition label histogram of a written ``linked/part=i`` dir —
    the manifest-side G9 metric. Vectorized: flatten the mentions list
    column, value-count the label subfield. Cost is bounded by one
    partition's output (the same unit the resume model already re-reads
    for fingerprints)."""
    import os

    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for f in sorted(os.listdir(linked_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(linked_dir, f), columns=["mentions"])
        col = t["mentions"].combine_chunks()
        if len(col) == 0:
            continue
        labels = pc.list_flatten(col).field("label")
        vc = pc.value_counts(labels)
        for v, n in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            key = v if v is not None else "<null>"
            counts[key] = counts.get(key, 0) + n
    return dict(sorted(counts.items()))
