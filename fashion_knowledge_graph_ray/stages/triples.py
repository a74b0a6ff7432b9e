"""Stage 7: triple emission — the north-rule currency (subj, pred, obj).

Attribute triples come from linked mentions: ``(entity_id, has_<field>,
value, url, warc_ts)`` for every non-unknown scalar and every list element
(closed vocabulary -> bounded predicate set). Relation triples mirror the
pair observations: ``(src, rel, dst, url, warc_ts)``.

Triples are deduplicated on all five columns (the same entity mentioned
twice on a page — e.g. via alias + primary surface — must not double-emit)
with the same partial-combine-then-groupby shape as the edge aggregation.
"""

from __future__ import annotations

import pyarrow as pa

from ..schemas import TRIPLES_SCHEMA
from ..vocab import LIST_FIELDS, SCALAR_FIELDS, UNKNOWN

TRIPLE_KEYS = ["subj", "pred", "obj", "url"]


def attr_triples_batch(batch: pa.Table) -> pa.Table:
    """flat linked mentions -> attribute triple rows."""
    subs, preds, objs, urls, tss = [], [], [], [], []
    attrs_list = batch["attrs"].to_pylist()
    eids = batch["entity_id"].to_pylist()
    urls_in = batch["url"].to_pylist()
    tss_in = batch["warc_ts"].to_pylist()
    for eid, attrs, url, ts in zip(eids, attrs_list, urls_in, tss_in):
        if not eid or not attrs:
            continue
        for f in SCALAR_FIELDS:
            v = attrs.get(f)
            if v and v != UNKNOWN:
                subs.append(eid); preds.append(f"has_{f}"); objs.append(v)
                urls.append(url); tss.append(ts)
        for f in LIST_FIELDS:
            for v in attrs.get(f) or []:
                subs.append(eid); preds.append(f"has_{f}"); objs.append(v)
                urls.append(url); tss.append(ts)
    return pa.table(
        {
            "subj": pa.array(subs, type=pa.string()),
            "pred": pa.array(preds, type=pa.string()),
            "obj": pa.array(objs, type=pa.string()),
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us", tz="UTC")),
        },
        schema=TRIPLES_SCHEMA,
    )


def rel_triples_batch(pairs_batch: pa.Table) -> pa.Table:
    """pair observations -> relation triple rows (rename src/rel/dst)."""
    return pa.table(
        {
            "subj": pairs_batch["src"],
            "pred": pairs_batch["rel"],
            "obj": pairs_batch["dst"],
            "url": pairs_batch["url"],
            "warc_ts": pairs_batch["warc_ts"],
        },
        schema=TRIPLES_SCHEMA,
    )


def _dedup_vectorized(batch: pa.Table) -> pa.Table:
    g = batch.group_by(TRIPLE_KEYS).aggregate([("warc_ts", "min")])
    cols = {k: g[k] for k in TRIPLE_KEYS}
    cols["warc_ts"] = g["warc_ts_min"]
    return pa.table(cols).cast(TRIPLES_SCHEMA)


def dedup_triples(triples_ds, *, batch_size: int = 16384, num_buckets: int = 64):
    """Distinct (subj,pred,obj,url), keeping min warc_ts. In-batch partial
    dedup first, then one bucketed shuffle with a vectorized per-bucket
    dedup (see stages/bucketed.py for why not per-group map_groups)."""
    from .bucketed import bucketed_group_apply

    partials = triples_ds.map_batches(
        _dedup_vectorized, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    return bucketed_group_apply(partials, TRIPLE_KEYS, _dedup_vectorized,
                                num_buckets=num_buckets)


def emit_attr_triples(linked_flat_ds, *, batch_size: int = 4096):
    return linked_flat_ds.map_batches(
        attr_triples_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def emit_rel_triples(pairs_ds, *, batch_size: int = 16384):
    return pairs_ds.map_batches(
        rel_triples_batch, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
