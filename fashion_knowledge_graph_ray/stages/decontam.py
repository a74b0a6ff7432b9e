"""Benchmark decontamination: flag corpus documents that overlap an
evaluation/benchmark set by word-n-gram membership.

The standard training-data hygiene step for LLM corpora (the reference
repo has no analog — this is part of the engine's training-data-pipeline
suite, like dedup/textstats): a document is contaminated when too many of
its distinct word n-grams also occur in the benchmark set.

Scale shape: the benchmark side is an EVAL set — thousands of documents
against a 100 TB corpus — so its distinct-gram set is built once on the
driver and broadcast via ``ray.put`` (read-only in every task, never
re-shipped per batch); the corpus side is one stateless ``map_batches``
pass, no shuffle. If a benchmark ever outgrew driver memory the same
check runs as a bucketed semi-join on gram hash (the
``jaccard_ngram_pairs`` machinery), but that regime does not occur for
eval sets and is deliberately not the default.

Grams are compared as STRINGS, not hashes: the benchmark set is small
enough that the 8x payload saving of hashing (see ``_word_ngram_hashes``)
buys nothing, and string equality keeps the operator exactly
SQL-expressible (the oracle re-derives the same grams in DuckDB).
Tokenization = ``text.lower().split()`` — identical to the dedup stages'
word tokenizer.
"""

from __future__ import annotations

import pyarrow as pa


def text_ngrams(text: str, n: int) -> set[str]:
    """Distinct word-n-grams of ``text`` (lowercased, whitespace-split)."""
    ws = (text or "").lower().split()
    if len(ws) < n:
        return set()
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def benchmark_gram_set(texts, n: int) -> frozenset:
    """Driver-side distinct-gram set over the benchmark texts."""
    out: set[str] = set()
    for t in texts:
        out |= text_ngrams(t, n)
    return frozenset(out)


def decontaminate(docs_ds, benchmark_grams: frozenset, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 5, threshold_pct: int = 10,
                  passthrough: bool = False):
    """Per-document benchmark-overlap stats.

    Output rows: ``(id_col, ngrams_total, ngrams_hit, contaminated)``
    where the counts are over DISTINCT n-grams and ``contaminated`` is
    ``hit * 100 >= total * threshold_pct`` (integer arithmetic so the
    decision is bit-exactly portable across engines; a document with no
    n-grams — fewer than ``n`` words — is never contaminated).
    ``passthrough=True`` appends the three stat columns to the input
    rows instead (for in-pipeline filtering compositions).
    """
    import ray

    ref = ray.put(benchmark_grams) if ray.is_initialized() \
        else benchmark_grams

    def score(t: pa.Table) -> pa.Table:
        bench = ref if isinstance(ref, frozenset) else ray.get(ref)
        ids, tot, hit, flag = [], [], [], []
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            grams = text_ngrams(txt, n)
            h = sum(1 for g in grams if g in bench)
            ids.append(i)
            tot.append(len(grams))
            hit.append(h)
            flag.append(len(grams) > 0
                        and h * 100 >= len(grams) * threshold_pct)
        stats = {
            "ngrams_total": pa.array(tot, type=pa.int64()),
            "ngrams_hit": pa.array(hit, type=pa.int64()),
            "contaminated": pa.array(flag, type=pa.bool_()),
        }
        if passthrough:
            out = t
            for name, arr in stats.items():
                out = out.append_column(name, arr)
            return out
        return pa.table({
            id_col: pa.array(ids, type=t[id_col].type), **stats})

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def rate_sample(ds, rates: dict, *, key_col: str, id_col: str,
                default_rate: float = 0.0):
    """Stratified deterministic Bernoulli downsampling — the standard
    corpus-mixing tool (keep 50%% of source A, 10%% of source B, ...).

    A row survives iff the first 8 hex digits of ``md5(str(id))`` compare
    below ``rate * 2^32`` — a pure stateless filter (no shuffle, no state,
    seed-free reproducibility across engines and runs; md5 because every
    engine agrees on it, same reasoning as the md5-ordered
    ``grouped_sample``). Strata whose key is missing from ``rates`` use
    ``default_rate``.
    """
    import hashlib

    cut = {k: format(min(int(r * (1 << 32)), (1 << 32) - 1), "08x")
           for k, r in rates.items()}
    dflt = format(min(int(default_rate * (1 << 32)), (1 << 32) - 1), "08x")

    def keep(t: pa.Table) -> pa.Table:
        mask = []
        for k, i in zip(t[key_col].to_pylist(), t[id_col].to_pylist()):
            h = hashlib.md5(str(i).encode("utf-8")).hexdigest()[:8]
            mask.append(h < cut.get(k, dflt))
        return t.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
