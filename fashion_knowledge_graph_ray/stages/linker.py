"""Stage 4: entity linking (J1/T8) — the ANN-lookup join, actor-pool hosted.

Reference semantics being re-expressed (call site
`/root/reference/src/engine/process_social_media_images.py:67-111`, query
impl `/root/reference/src/database/vector_database.py:127-191`):

- skip the mention if it has no ``type`` (line 74-76);
- candidate metadata filters: ``type == t``, ``gender IN (unisex, g)``,
  ``color == c`` (c skipped when empty — Pinecone treats an empty filter
  value as no constraint);
- query top_k=5 against the catalog index, take ``matches[0]``;
- accept iff ``score >= similarity_threshold`` (0.75 default, line 97).

Two interchangeable linkers:

- ``GazetteerLinker`` — exact surface-form lookup (form -> entity). The
  deterministic fast path; SQL-expressible, used by the oracle-checked
  queries.
- ``EmbeddingLinker`` — the reference-shaped path: a **stateful actor
  pool**. Each actor builds, ONCE in ``__init__`` from a broadcast
  ``ray.put`` taxonomy handle, a matrix of hash-embedded PRIMARY surfaces
  (aliases are deliberately not indexed: alias mentions must link through
  vector similarity, exercising the threshold). Per batch it embeds all
  mention surfaces at once and does one masked matmul top-k. Swap point
  for a real sentence-transformer: replace ``hash_embed`` here and in
  ``__init__`` (extension surface per SURVEY.md §2.11).

Both operate on the page-mentions list column, adding ``entity_id``
(nullable) and ``link_score`` to every mention struct.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.vectors import DEFAULT_DIM, cosine_topk, hash_embed
from ..vocab import LINK_SIMILARITY_THRESHOLD, UNKNOWN
from .attributes import attrs_batch  # noqa: F401  (pipeline composes these)


def _linked_struct(mention_struct: pa.StructType) -> pa.StructType:
    return pa.struct(
        list(mention_struct)
        + [pa.field("entity_id", pa.string()), pa.field("link_score", pa.float64())]
    )


class GazetteerLinker:
    """Exact form -> entity link; score 1.0. Broadcast-small-side join
    (taxonomy << pages), no shuffle (SURVEY.md §2.5 J1)."""

    def __init__(self, taxonomy_ref):
        tax = taxonomy_ref
        if not isinstance(tax, pa.Table):
            import ray

            tax = ray.get(taxonomy_ref)
        from .mentions import build_gazetteer

        self.gaz = build_gazetteer(tax)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch["mentions"].to_pylist()
        out = []
        for recs in rows:
            new = []
            for r in recs or []:
                r = dict(r)
                hit = self.gaz.get(r["form"])
                r["entity_id"] = hit[0] if hit else None
                r["link_score"] = 1.0 if hit else None
                new.append(r)
            out.append(new)
        return _rebuild(batch, out)


class EmbeddingLinker:
    """ANN linking actor: hash-embed index over primary taxonomy surfaces,
    metadata-filtered cosine top-k, threshold accept."""

    def __init__(self, taxonomy_ref, *, dim: int = DEFAULT_DIM, top_k: int = 5,
                 threshold: float = LINK_SIMILARITY_THRESHOLD):
        tax = taxonomy_ref
        if not isinstance(tax, pa.Table):
            import ray

            tax = ray.get(taxonomy_ref)
        self.entity_id = np.asarray(tax["entity_id"].to_pylist())
        self.category = np.asarray(tax["category"].to_pylist())
        self.gender = np.asarray(tax["gender"].to_pylist())
        self.color = np.asarray(tax["color"].to_pylist())
        self.index = hash_embed(tax["surface"].to_pylist(), dim=dim)
        self.dim = dim
        self.top_k = top_k
        self.threshold = threshold

    def _link_many(self, surfaces, labels, genders, colors):
        """Vectorized top-1-of-top-k with reference filter semantics."""
        q = hash_embed(surfaces, dim=self.dim)
        n = self.index.shape[0]
        mask = np.ones((len(surfaces), n), dtype=bool)
        for i, (lab, g, c) in enumerate(zip(labels, genders, colors)):
            if lab:
                mask[i] &= self.category == lab
            allowed = {"unisex"}
            if g:
                allowed.add(g)
            mask[i] &= np.isin(self.gender, sorted(allowed))
            if c and c != UNKNOWN:
                mask[i] &= self.color == c
        scores, idx = cosine_topk(q, self.index, self.top_k, mask=mask)
        top_scores, top_idx = scores[:, 0], idx[:, 0]
        ok = np.isfinite(top_scores) & (top_scores >= self.threshold)
        return ok, top_scores, self.entity_id[top_idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch["mentions"].to_pylist()
        # flatten all mentions of the batch into one embed+matmul call
        flat, where = [], []
        for pi, recs in enumerate(rows):
            for mi, r in enumerate(recs or []):
                attrs = r.get("attrs") or {}
                if attrs.get("type", UNKNOWN) == UNKNOWN:
                    continue  # reference line 74-76: no type -> skip
                flat.append(r)
                where.append((pi, mi))
        out = [[dict(r, entity_id=None, link_score=None) for r in (recs or [])]
               for recs in rows]
        if flat:
            attrs_of = [r.get("attrs") or {} for r in flat]
            ok, scores, eids = self._link_many(
                [r["surface"] for r in flat],
                [a.get("type") for a in attrs_of],
                [a.get("gender") for a in attrs_of],
                [a.get("color") for a in attrs_of],
            )
            for (pi, mi), good, s, e in zip(where, ok, scores, eids):
                if good:
                    out[pi][mi]["entity_id"] = str(e)
                    out[pi][mi]["link_score"] = float(s)
        return _rebuild(batch, out)


def _rebuild(batch: pa.Table, rows: list[list[dict]]) -> pa.Table:
    mention_type = batch.schema.field("mentions").type.value_type
    has_link = any(f.name == "entity_id" for f in mention_type)
    typ = mention_type if has_link else _linked_struct(mention_type)
    arr = pa.array(rows, type=pa.list_(typ))
    return batch.set_column(batch.schema.get_field_index("mentions"),
                            "mentions", arr)


def link_mentions(page_mentions_ds, taxonomy_ref, *, mode: str = "embedding",
                  concurrency=(1, 8), batch_size: int = 512, **kw):
    """page_mentions (with attrs) -> linked page_mentions.

    ``mode="embedding"`` is the reference-shaped ANN actor pool;
    ``mode="gazetteer"`` is the exact fast path.
    """
    cls = EmbeddingLinker if mode == "embedding" else GazetteerLinker
    return page_mentions_ds.map_batches(
        cls,
        fn_constructor_args=(taxonomy_ref,),
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
