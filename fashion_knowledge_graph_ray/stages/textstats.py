"""Batch wrappers for text analysis over a documents table.

Vectorized ``map_batches`` stages; the per-row kernels live in
functions/textstats.py and are mirrored 1:1 by the oracle SQL. Reference
analog: these are the training-data-pipeline additions the task brief
requires beyond the reference's own operators (language-ID, quality
scoring, token counting, fingerprinting).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    fingerprint_md5,
    lang_scores,
    line_dup_stats,
    predict_lang,
    simhash64,
    simhash64_batch,
    stopword_count,
    token_count,
    top_bigram_frac,
    ws_free_len,
)


def quality_batch(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    n_tok = [token_count(t) for t in texts]
    n_chr = [ws_free_len(t) for t in texts]
    n_stop = [stopword_count(t) for t in texts]
    stop_ratio = [
        (s / n) if n else 0.0 for s, n in zip(n_stop, n_tok)
    ]
    mean_tok_len = [
        (c / n) if n else 0.0 for c, n in zip(n_chr, n_tok)
    ]
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_chars_nows": pa.array(n_chr, type=pa.int64()),
            "n_stopwords": pa.array(n_stop, type=pa.int64()),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
            "mean_token_len": pa.array(mean_tok_len, type=pa.float64()),
        }
    )


def quality_scores(ds, *, text_col: str = "text", id_col: str = "doc_id",
                   batch_size: int = 4096):
    return ds.map_batches(
        lambda b: quality_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def fingerprint_batch(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    return pa.table(
        {
            id_col: batch[id_col],
            "md5": pa.array([fingerprint_md5(t) for t in texts],
                            type=pa.string()),
            "simhash": pa.array(simhash64_batch(texts),
                                type=pa.uint64()),
        }
    )


def fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 batch_size: int = 4096):
    return ds.map_batches(
        lambda b: fingerprint_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def repetition_batch(batch: pa.Table, *, text_col: str,
                     id_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    stats = [line_dup_stats(t) for t in texts]
    return pa.table(
        {
            id_col: batch[id_col],
            "n_lines": pa.array([s[0] for s in stats], type=pa.int64()),
            "dup_line_frac": pa.array([s[1] for s in stats],
                                      type=pa.float64()),
            "top_bigram_frac": pa.array([top_bigram_frac(t) for t in texts],
                                        type=pa.float64()),
        }
    )


def repetition_stats(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     batch_size: int = 4096):
    """Gopher-style repetition quality signals per document: duplicate-line
    fraction and top-bigram fraction — the filters a web-crawl curation
    pipeline applies before training-data export. Stateless vectorized
    map_batches, same scale shape as the other text-analysis stages."""
    return ds.map_batches(
        lambda b: repetition_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def langid_batch(batch: pa.Table, *, text_col: str, id_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    preds = [predict_lang(t) for t in texts]
    best = [max(lang_scores(t).values(), default=0) for t in texts]
    return pa.table(
        {
            id_col: batch[id_col],
            "pred_lang": pa.array(preds, type=pa.string()),
            "marker_hits": pa.array(best, type=pa.int64()),
        }
    )


def lang_id(ds, *, text_col: str = "text", id_col: str = "doc_id",
            batch_size: int = 4096):
    return ds.map_batches(
        lambda b: langid_batch(b, text_col=text_col, id_col=id_col),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
