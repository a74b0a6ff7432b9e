"""Corpus-level two-pass operators for LLM training-data preparation:
sequence packing (distributed prefix sum) and corpus-frequency scoring.

Neither exists in the reference (its pipelines are per-record,
`/root/reference/src/engine/process_catalog.py`); both are standard
large-corpus preparation steps and exercise a distributed pattern the
rest of the engine doesn't: a GLOBAL ordered scan (prefix sum) and a
corpus-wide statistic re-joined against every row.

Scale shapes
------------
``pack_bins`` is the GPT-style "concatenate all documents in a fixed
order, split every ``budget`` tokens" packing. The global prefix sum
runs as the classic three-step distributed scan:

1. one narrow pass computes per-doc token counts (id + int per row);
2. range-partition on the order key, aggregate ONE partial sum per
   range (R rows total — tiny), exclusive-prefix those R sums on the
   driver and broadcast the offsets;
3. a per-range ``map_groups`` sorts its slice locally and adds its
   range's offset to the local cumulative sum.

Only step 3 shuffles, and only the (id, n_tokens) projection — never
text. Range boundaries are uniform over [min,max] of the key, which is
balanced for dense ids (the common "doc_id assigned at ingest" case);
for skewed keys pass explicit ``boundaries`` (e.g. sampled quantiles).

``token_freq_scores`` is the CCNet-style corpus-statistics scorer: pass
1 is the distributed word count (per-batch Counter partials, bucketed
merge); the resulting vocabulary is broadcast once via ``ray.put`` and
pass 2 scores every document against it batch-locally — no join
shuffle. A web-scale vocabulary of ``\\S+`` tokens can exceed driver
memory only because of singleton junk tokens; ``min_count`` drops
singletons from the broadcast (misses default to count 1, which is
EXACT for true singletons and a documented lower-bound approximation
only for counts in (1, min_count)). The default ``min_count=1`` keeps
the operator exactly SQL-equivalent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textstats import tokens
from .bucketed import bucketed_group_apply

_RANGE_COL = "__range"


def _token_count_batch(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    n = [len(tokens(x)) for x in t[text_col].to_pylist()]
    return pa.table({
        id_col: t[id_col],
        "n_tokens": pa.array(n, type=pa.int64()),
    })


def pack_bins(docs_ds, budget: int, *, text_col: str = "text",
              id_col: str = "doc_id", num_ranges: int = 64,
              boundaries: list[int] | None = None):
    """Assign each document to a fixed-token-budget training bin.

    Documents are laid out in ascending ``id_col`` order and the
    concatenated token stream is cut every ``budget`` tokens; a document
    belongs to the bin containing its FIRST token (GPT-style pack-and-
    split, where a document may straddle the cut). Output rows:
    ``(id_col, n_tokens, start_offset, bin_id)`` with
    ``start_offset`` = total tokens of all earlier documents and
    ``bin_id = start_offset // budget``.

    The prefix sum is computed with range partials + driver exclusive
    prefix + broadcast offsets (see module docstring); the driver holds
    ``num_ranges`` integers, never row data.
    """
    import ray
    from ray.data.aggregate import Max, Min

    if budget <= 0:
        raise ValueError("budget must be positive")

    narrow = docs_ds.map_batches(
        lambda t: _token_count_batch(t, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True)

    # Materialize once: reused for range stats AND the final scan. Rows
    # are (int64, int64) — ~16 B/doc, object-store resident, not driver.
    narrow = narrow.materialize()

    if boundaries is None:
        lohi = narrow.aggregate(Min(id_col), Max(id_col))
        lo, hi = lohi[f"min({id_col})"], lohi[f"max({id_col})"]
        if lo is None:  # empty input
            return narrow.map_batches(
                lambda t: t.append_column(
                    "start_offset", pa.array([], type=pa.int64()))
                .append_column("bin_id", pa.array([], type=pa.int64())),
                batch_format="pyarrow")
        span = max(1, (int(hi) - int(lo) + num_ranges) // num_ranges)
        bounds = [int(lo) + span * i for i in range(1, num_ranges)]
    else:
        bounds = sorted(boundaries)

    bounds_arr = np.asarray(bounds, dtype=np.int64)

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        r = np.searchsorted(bounds_arr, ids, side="right")
        return t.append_column(_RANGE_COL, pa.array(r, type=pa.int64()))

    tagged = narrow.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)

    # one int64 partial per range -> driver exclusive prefix
    sums = tagged.groupby(_RANGE_COL).sum("n_tokens").take_all()
    per_range = {int(r[_RANGE_COL]): int(r["sum(n_tokens)"]) for r in sums}
    offsets = {}
    acc = 0
    for rid in sorted(per_range):
        offsets[rid] = acc
        acc += per_range[rid]
    off_ref = ray.put(offsets) if ray.is_initialized() else offsets

    out_schema = pa.schema([
        pa.field(id_col, pa.int64()), pa.field("n_tokens", pa.int64()),
        pa.field("start_offset", pa.int64()), pa.field("bin_id", pa.int64()),
    ])

    def scan(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:  # empty sort partition: keep schema stable
            return out_schema.empty_table()
        offs = off_ref if isinstance(off_ref, dict) else ray.get(off_ref)
        rid = int(group[_RANGE_COL][0].as_py())
        idx = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        g = group.take(idx)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        start = offs[rid] + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table({
            id_col: g[id_col],
            "n_tokens": g["n_tokens"],
            "start_offset": pa.array(start, type=pa.int64()),
            "bin_id": pa.array(start // budget, type=pa.int64()),
        })

    return tagged.groupby(_RANGE_COL).map_groups(
        scan, batch_format="pyarrow")


def corpus_token_counts(docs_ds, *, text_col: str = "text",
                        num_buckets: int = 16):
    """Distributed word count → Dataset of ``(token, n)`` rows."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for x in t[text_col].to_pylist():
            c.update(tokens(x))
        items = sorted(c.items())
        return pa.table({
            "token": pa.array([k for k, _ in items], type=pa.string()),
            "n": pa.array([v for _, v in items], type=pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["token"]).aggregate([("n", "sum")])
        return pa.table({"token": g["token"], "n": g["n_sum"]})

    return bucketed_group_apply(
        docs_ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["token"], merge, num_buckets=num_buckets)


def token_freq_scores(docs_ds, stats_ds=None, *, text_col: str = "text",
                      id_col: str = "doc_id", rare_threshold: int = 2,
                      min_count: int = 1):
    """Score each document against corpus-wide token frequencies.

    Output per document (all integer-exact except one final division, so
    results are bit-identical across engines regardless of sum order):

    - ``n_tokens``     total tokens,
    - ``tf_sum``       Σ corpus-count(token)  (boilerplate mass),
    - ``sum_log2_floor`` Σ floor(log2 corpus-count) — an integer
      unigram-LM log-probability proxy (up to the corpus-size constant),
      computed with ``int.bit_length`` (exactly floor(log2 n)),
    - ``rare_count``   tokens whose corpus count ≤ ``rare_threshold``
      (gibberish / unique-id mass),
    - ``mean_token_freq`` = tf_sum / n_tokens (0.0 for empty docs).

    ``stats_ds``: optional precomputed ``corpus_token_counts`` output;
    recomputed from ``docs_ds`` when omitted. The vocabulary is pulled
    once and broadcast via ``ray.put`` — see module docstring for the
    ``min_count`` scale valve.
    """
    import ray

    if stats_ds is None:
        stats_ds = corpus_token_counts(docs_ds, text_col=text_col)
    if min_count > 1:
        stats_ds = stats_ds.filter(
            expr=f"n >= {int(min_count)}")
    vocab: dict = {}
    for b in stats_ds.iter_batches(batch_format="pyarrow"):
        vocab.update(zip(b["token"].to_pylist(),
                         b["n"].to_numpy(zero_copy_only=False).tolist()))
    ref = ray.put(vocab) if ray.is_initialized() else vocab

    def score(t: pa.Table) -> pa.Table:
        v = ref if isinstance(ref, dict) else ray.get(ref)
        ids, ntk, tfs, slf, rare, mean = [], [], [], [], [], []
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            tks = tokens(txt)
            cs = [v.get(tok, 1) for tok in tks]
            ids.append(i)
            ntk.append(len(tks))
            tfs.append(sum(cs))
            slf.append(sum(c.bit_length() - 1 for c in cs))
            rare.append(sum(1 for c in cs if c <= rare_threshold))
            mean.append(sum(cs) / len(cs) if cs else 0.0)
        return pa.table({
            id_col: pa.array(ids, type=t[id_col].type),
            "n_tokens": pa.array(ntk, type=pa.int64()),
            "tf_sum": pa.array(tfs, type=pa.int64()),
            "sum_log2_floor": pa.array(slf, type=pa.int64()),
            "rare_count": pa.array(rare, type=pa.int64()),
            "mean_token_freq": pa.array(mean, type=pa.float64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def exact_quantiles(ds, col: str, qs_permille: list[int], *,
                    num_ranges: int = 64):
    """EXACT distributed quantiles by rank selection — no full sort, no
    driver materialization of values.

    For each ``p`` in ``qs_permille`` the result row is the value at
    1-based rank ``max(1, ceil(p*n/1000))`` of the column sorted
    ascending (n = row count). Quantiles are specified in integer
    per-mille so the rank computation is pure integer arithmetic —
    bit-identical across engines (``0.1*n`` in binary floating point is
    not, and DuckDB would evaluate it in decimal).

    Shape: one narrow pass projects the column; values range-partition on
    uniform [min,max] cuts; per-range COUNTS (``num_ranges`` ints) come
    to the driver, which locates each target rank's range and local rank;
    only the ranges that hold a target sort locally and pick their
    element. The driver never holds values, and the exchange is one
    groupby of the single-column projection. Uniform cuts assume a
    roughly uniform value distribution (fine for scores/measures); for
    heavy skew the same machinery accepts more ranges.

    Returns a tiny Dataset: ``(q_permille, rank, value)``.
    """
    import math

    import ray

    narrow = ds.select_columns([col]).materialize()
    out_schema = pa.schema([
        pa.field("q_permille", pa.int64()), pa.field("rank", pa.int64()),
        pa.field("value", ds.schema().types[ds.schema().names.index(col)]),
    ])

    from ray.data.aggregate import Max, Min

    lohi = narrow.aggregate(Min(col), Max(col))
    if lohi is None or lohi[f"min({col})"] is None:  # empty input
        import ray.data as rd

        return rd.from_arrow(out_schema.empty_table())
    lo, hi = float(lohi[f"min({col})"]), float(lohi[f"max({col})"])
    if math.isfinite(lo) and math.isfinite(hi) and hi > lo:
        step = (hi - lo) / num_ranges
        bounds = np.array([lo + step * i for i in range(1, num_ranges)])
    else:
        bounds = np.array([])  # constant/degenerate column: one range

    def tag(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        r = np.searchsorted(bounds, v, side="right")
        return t.append_column(_RANGE_COL, pa.array(r, type=pa.int64()))

    tagged = narrow.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
    counts = {int(r[_RANGE_COL]): int(r["count()"])
              for r in tagged.groupby(_RANGE_COL).count().take_all()}
    n = sum(counts.values())  # total rows, free from the range counts

    targets: dict[int, list[tuple[int, int]]] = {}
    cum = 0
    ranks = {p: max(1, -(-p * n // 1000)) for p in qs_permille}
    for rid in sorted(counts):
        cnt = counts[rid]
        for p, k in ranks.items():
            if cum < k <= cum + cnt:
                targets.setdefault(rid, []).append((p, k - cum))
        cum += cnt
    t_ref = ray.put(targets) if ray.is_initialized() else targets

    def pick(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        tg = t_ref if isinstance(t_ref, dict) else ray.get(t_ref)
        rid = int(group[_RANGE_COL][0].as_py())
        want = tg.get(rid)
        if not want:
            return out_schema.empty_table()
        v = np.sort(group[col].to_numpy(zero_copy_only=False))
        return pa.table({
            "q_permille": pa.array([p for p, _ in want], type=pa.int64()),
            "rank": pa.array([ranks[p] for p, _ in want], type=pa.int64()),
            "value": pa.array([v[lk - 1] for _, lk in want],
                              type=out_schema.field("value").type),
        })

    return tagged.groupby(_RANGE_COL).map_groups(
        pick, batch_format="pyarrow")


def with_global_index(ds, order_col: str, *, index_col: str = "index",
                      num_ranges: int = 64, samples_per_block: int = 8):
    """Attach a contiguous 0-based global rank by ascending ``order_col``
    (the zipWithIndex / row_number primitive Ray Data lacks) — used for
    deterministic corpus shuffling (rank by ``md5(id)``) and training
    shard assignment (``rank // shard_size``).

    ``order_col`` must be duplicate-free (an id or a cryptographic hash
    of one) so the total order — and therefore every rank — is unique
    and partitioning-independent.

    Scale shape: range boundaries come from a per-block sample (up to
    ``samples_per_block`` evenly spaced sorted keys per block — the
    TeraSort partitioner; sampling skew only affects load balance, never
    ranks); per-range COUNTS roll up to the driver (``num_ranges`` ints)
    for an exclusive prefix, and each range sorts locally and adds its
    offset. One bucketed exchange of the full rows; the driver never
    holds row data.
    """
    import ray

    def sample_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], type=t[order_col].type)})
        arr = t[order_col]
        idx = pc.sort_indices(arr)
        take = np.linspace(0, t.num_rows - 1,
                           min(samples_per_block, t.num_rows)).astype(int)
        return pa.table({"k": arr.take(idx.take(pa.array(take)))})

    sample = [r["k"] for r in
              ds.map_batches(sample_keys, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()]
    sample.sort()
    if len(sample) > 1:
        cut_idx = np.linspace(0, len(sample) - 1, num_ranges + 1)[1:-1]
        bounds = sorted({sample[int(i)] for i in cut_idx})
    else:
        bounds = []

    def tag(t: pa.Table) -> pa.Table:
        if not bounds:
            r = np.zeros(t.num_rows, dtype=np.int64)
        else:
            keys = np.asarray(t[order_col].to_pylist())
            r = np.searchsorted(np.asarray(bounds), keys, side="right")
        return t.append_column(_RANGE_COL, pa.array(r, type=pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    counts = {int(r[_RANGE_COL]): int(r["count()"])
              for r in tagged.groupby(_RANGE_COL).count().take_all()}
    offsets, acc = {}, 0
    for rid in sorted(counts):
        offsets[rid] = acc
        acc += counts[rid]
    off_ref = ray.put(offsets) if ray.is_initialized() else offsets

    def assign(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns([_RANGE_COL]).append_column(
                index_col, pa.array([], type=pa.int64()))
        offs = off_ref if isinstance(off_ref, dict) else ray.get(off_ref)
        rid = int(group[_RANGE_COL][0].as_py())
        idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
        g = group.take(idx).drop_columns([_RANGE_COL])
        return g.append_column(index_col, pa.array(
            offs[rid] + np.arange(g.num_rows), type=pa.int64()))

    return tagged.groupby(_RANGE_COL).map_groups(
        assign, batch_format="pyarrow")


def doc_frequencies(docs_ds, *, text_col: str = "text",
                    num_buckets: int = 16):
    """Distributed DOCUMENT frequency: ``(token, df)`` with df = number
    of documents containing the token (per-batch distinct-per-doc
    partials, bucketed merge — same exchange shape as the word count)."""

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for x in t[text_col].to_pylist():
            c.update(set(tokens(x)))
        items = sorted(c.items())
        return pa.table({
            "token": pa.array([k for k, _ in items], type=pa.string()),
            "df": pa.array([v for _, v in items], type=pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["token"]).aggregate([("df", "sum")])
        return pa.table({"token": g["token"], "df": g["df_sum"]})

    return bucketed_group_apply(
        docs_ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["token"], merge, num_buckets=num_buckets)


def ngram_counts(docs_ds, n: int, *, text_col: str = "text",
                 num_buckets: int = 16):
    """Corpus n-gram counts: ``(gram, count)`` with gram = the
    space-joined window of ``n`` consecutive ``\\S+`` tokens (documents
    shorter than ``n`` tokens contribute nothing). ``n=1`` degenerates
    to the word count; ``n=2,3`` are the n-gram-LM / collocation tables.
    Same exchange shape as ``corpus_token_counts``: per-batch Counter
    partials (a hot gram ships one int row per block), bucketed merge."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for x in t[text_col].to_pylist():
            w = tokens(x)
            c.update(" ".join(w[i:i + n]) for i in range(len(w) - n + 1))
        items = sorted(c.items())
        return pa.table({
            "gram": pa.array([k for k, _ in items], type=pa.string()),
            "n": pa.array([v for _, v in items], type=pa.int64()),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["gram"]).aggregate([("n", "sum")])
        return pa.table({"gram": g["gram"], "n": g["n_sum"]})

    return bucketed_group_apply(
        docs_ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True),
        ["gram"], merge, num_buckets=num_buckets)


def bm25_topk(docs_ds, query_tokens: list[str], k: int, *,
              text_col: str = "text", id_col: str = "doc_id",
              k1_milli: int = 1200, b_milli: int = 750):
    """Top-``k`` documents for a bag-of-tokens query by integer-quantized
    BM25 (k1/b in integer per-mille; defaults 1.2 / 0.75).

    Per (doc, term), with dl = doc token count and avgdl = corpus mean
    (integer floor)::

        norm  = (1000 - b) + (b * dl) // avgdl
        s_t   = idf * (tf * (k1 + 1000)) // (tf*1000 + (k1 * norm)//1000)
        idf   = (1000 * N) // df_t

    score = Σ s_t over query terms with tf > 0; rank (score DESC, id
    ASC). Every operation is integer, so the ranking is bit-identical
    across engines and partitionings (same rationale as ``tfidf_topk``).

    Scale shape: pass 1 is ONE narrow scan emitting per-batch (term, df)
    partials plus a (Σdl, n_docs) meta row — the driver folds a
    query-terms-sized table, never documents; the per-term idf table and
    avgdl broadcast in the scoring closure; pass 2 scores batch-locally
    and only the global (score, id) top-k sort moves rows, pre-cut to
    score > 0."""
    import ray

    terms = sorted(set(query_tokens))
    if not terms or k <= 0:
        raise ValueError("need at least one query token and k > 0")

    # BOTH passes (df/avgdl stats, then scoring) consume docs_ds; without
    # a materialize a derived upstream pipeline would re-execute per
    # consumer (the multi-consumer rule of prepare_training_set /
    # knn_graph). Pin only the narrow (id, text) projection.
    docs_ds = docs_ds.select_columns([id_col, text_col]).materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        dfs = {w: 0 for w in terms}
        dl_sum = 0
        n_docs = 0
        for x in t[text_col].to_pylist():
            tks = tokens(x)
            dl_sum += len(tks)
            n_docs += 1
            ts = set(tks)
            for w in terms:
                if w in ts:
                    dfs[w] += 1
        return pa.table({
            "term": pa.array(terms + ["\x00meta"], type=pa.string()),
            "df": pa.array([dfs[w] for w in terms] + [0], type=pa.int64()),
            "dl_sum": pa.array([0] * len(terms) + [dl_sum],
                               type=pa.int64()),
            "n_docs": pa.array([0] * len(terms) + [n_docs],
                               type=pa.int64()),
        })

    df_tot = {w: 0 for w in terms}
    sdl = 0
    n = 0
    for b in docs_ds.select_columns([text_col]).map_batches(
            stats_partial, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        for term, df, dls, nd in zip(b["term"].to_pylist(),
                                     b["df"].to_pylist(),
                                     b["dl_sum"].to_pylist(),
                                     b["n_docs"].to_pylist()):
            if term == "\x00meta":
                sdl += dls
                n += nd
            else:
                df_tot[term] += df
    if n == 0:
        return docs_ds.map_batches(
            lambda t: pa.table({id_col: pa.array([], type=pa.int64()),
                                "score": pa.array([], type=pa.int64())}),
            batch_format="pyarrow")
    avgdl = max(1, sdl // n)
    idf = {w: (1000 * n) // df_tot[w] for w in terms if df_tot[w] > 0}
    ref = ray.put((idf, avgdl)) if ray.is_initialized() else (idf, avgdl)

    def score_batch(t: pa.Table) -> pa.Table:
        idf_, avgdl_ = ref if isinstance(ref, tuple) else ray.get(ref)
        ids, scores = [], []
        for i, x in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            tks = tokens(x)
            dl = len(tks)
            norm = (1000 - b_milli) + (b_milli * dl) // avgdl_
            s = 0
            for w, widf in idf_.items():
                tf = tks.count(w)
                if tf:
                    s += widf * (tf * (k1_milli + 1000)) // (
                        tf * 1000 + (k1_milli * norm) // 1000)
            if s > 0:
                ids.append(i)
                scores.append(s)
        return pa.table({id_col: pa.array(ids, type=t[id_col].type),
                         "score": pa.array(scores, type=pa.int64())})

    scored = docs_ds.map_batches(score_batch, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return scored.sort(["score", id_col],
                       descending=[True, False]).limit(k)


def inverted_index(docs_ds, *, text_col: str = "text",
                   id_col: str = "doc_id", num_buckets: int = 16,
                   postings_cap: int = 100_000, salt: int = 0):
    """Distributed inverted-index construction: one row per distinct
    token with its document frequency and a sorted postings string.

    Output: ``(token, df, postings, postings_truncated)`` where ``df``
    counts ALL documents containing the token, ``postings`` is the
    ascending comma-joined list of the first ``postings_cap`` doc ids
    and ``postings_truncated`` flags a capped list (never a silent cut —
    the C4-style evidence-cap rule of stages/aggregate.py).

    Scale shape: the per-batch partial emits each (token, sorted-id-run)
    ONCE per batch — the shuffle carries one row per distinct token per
    block, not one per occurrence. Token frequencies are Zipfian; a stop
    word's merge (concat + sort of its FULL postings) is the heaviest
    per-key reduction in this engine, so this operator is where
    ``salted_group_apply`` plugs in: with ``salt > 0`` phase 1 splits
    each token's runs across ``salt`` tasks, each sorting/capping its
    slice, and phase 2 merges the (pre-capped, pre-sorted) slices.
    Output is IDENTICAL to the unsalted path (equivalence-tested): every
    id in the global first-``postings_cap`` prefix is by construction in
    its slice's first-``postings_cap`` prefix, and ``df``/truncation
    derive from summed counts, not list lengths.

    ``salt=0`` is the DEFAULT on measured evidence, not assumption:
    hash-bucketing already spreads distinct hot tokens across buckets,
    and per-batch partials bound any token to one row per block, so
    salting paid in none of three skew benches (120k docs x 5 universal
    stop words: 1.6 vs 2.4 s; 400k docs x 16 universal tokens: 1.7 vs
    2.9 s; ONE 12M-posting mega-token: 3.4 vs 3.9 s) — the extra
    exchange always cost more than the spread saved. Flip ``salt>0``
    when a single token's postings exceed one task's MEMORY budget
    (df ≳ 10^8 at web scale): phase 1 bounds per-task postings to
    ``df/salt``, which is a safety valve, not a speedup.

    Postings ride as comma-joined strings (Arrow large-binary friendly,
    and the driver never sees them). The hottest token's FINAL postings
    are bounded by ``postings_cap``; pair with an upstream stop-word
    drop when the corpus is 100 TB (documented valve, same reasoning as
    ``token_freq_scores.min_count``)."""

    def partial(t: pa.Table) -> pa.Table:
        per_tok: dict[str, list[int]] = {}
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for tok in set(tokens(txt)):
                per_tok.setdefault(tok, []).append(i)
        items = sorted(per_tok.items())
        return pa.table({
            "token": pa.array([k for k, _ in items], type=pa.string()),
            "df": pa.array([len(v) for _, v in items], type=pa.int64()),
            "postings": pa.array(
                [",".join(map(str, sorted(v))) for _, v in items],
                type=pa.string()),
        })

    def _sorted_cap(runs: list[str]) -> list:
        flat = [x for r in runs for x in r.split(",") if x]
        # id_col may be any stringable type (triangle_counts-style
        # string ids included): sort numerically when every id parses
        # as an int, lexically otherwise — deterministic either way
        try:
            ids: list = sorted(int(x) for x in flat)
        except ValueError:
            ids = sorted(flat)
        return ids[:postings_cap]

    def _fold(t: pa.Table) -> dict[str, tuple[int, list[str]]]:
        per_tok: dict[str, tuple[int, list[str]]] = {}
        for tok, df, run in zip(t["token"].to_pylist(),
                                t["df"].to_pylist(),
                                t["postings"].to_pylist()):
            n, runs = per_tok.get(tok, (0, []))
            per_tok[tok] = (n + df, runs + [run])
        return per_tok

    def mid_merge(t: pa.Table) -> pa.Table:
        per_tok = _fold(t)
        keys = sorted(per_tok)
        return pa.table({
            "token": pa.array(keys, type=pa.string()),
            "df": pa.array([per_tok[k][0] for k in keys], type=pa.int64()),
            "postings": pa.array(
                [",".join(map(str, _sorted_cap(per_tok[k][1])))
                 for k in keys], type=pa.string()),
        })

    def merge(t: pa.Table) -> pa.Table:
        per_tok = _fold(t)
        keys = sorted(per_tok)
        return pa.table({
            "token": pa.array(keys, type=pa.string()),
            "df": pa.array([per_tok[k][0] for k in keys], type=pa.int64()),
            "postings": pa.array(
                [",".join(map(str, _sorted_cap(per_tok[k][1])))
                 for k in keys], type=pa.string()),
            "postings_truncated": pa.array(
                [per_tok[k][0] > postings_cap for k in keys],
                type=pa.bool_()),
        })

    partials = docs_ds.map_batches(partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
    if salt > 0:
        from .bucketed import salted_group_apply

        return salted_group_apply(partials, ["token"], mid_merge, merge,
                                  salt=salt, num_buckets=num_buckets)
    return bucketed_group_apply(partials, ["token"], merge,
                                num_buckets=num_buckets)


def tfidf_topk(docs_ds, k: int, *, text_col: str = "text",
               id_col: str = "doc_id", num_buckets: int = 16):
    """Top-``k`` keywords per document by a quantized tf-idf.

    ``score = tf * ((1000 * N) // df)`` — term frequency times a
    per-mille integer inverse document frequency. The quantization is
    deliberate: a float ``tf * ln(N/df)`` ranks identically in practice
    but transcendental kernels differ across engines in the last ulp,
    while integer arithmetic is bit-exact everywhere (same reasoning as
    ``token_freq_scores``). Ties break on ascending token.

    Scale shape: ``doc_frequencies`` is one bucketed word-count exchange;
    the df table is broadcast once via ``ray.put`` (same singleton-mass
    caveat and ``min_count`` valve as the vocabulary broadcast — see
    module docstring); scoring is batch-local. Output:
    ``(id_col, token, score, rank)``, rows with rank <= k.
    """
    import ray

    n_docs = docs_ds.count()
    dfs: dict = {}
    for b in doc_frequencies(docs_ds, text_col=text_col,
                             num_buckets=num_buckets) \
            .iter_batches(batch_format="pyarrow"):
        dfs.update(zip(b["token"].to_pylist(),
                       b["df"].to_numpy(zero_copy_only=False).tolist()))
    ref = ray.put(dfs) if ray.is_initialized() else dfs

    def score(t: pa.Table) -> pa.Table:
        from collections import Counter

        dfm = ref if isinstance(ref, dict) else ray.get(ref)
        ids, toks, scores, ranks = [], [], [], []
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            tf = Counter(tokens(txt))
            scored = sorted(
                ((-c * ((1000 * n_docs) // dfm[tok]), tok)
                 for tok, c in tf.items()),
            )[:k]
            for r, (neg, tok) in enumerate(scored, start=1):
                ids.append(i)
                toks.append(tok)
                scores.append(-neg)
                ranks.append(r)
        return pa.table({
            id_col: pa.array(ids, type=t[id_col].type),
            "token": pa.array(toks, type=pa.string()),
            "score": pa.array(scores, type=pa.int64()),
            "rank": pa.array(ranks, type=pa.int64()),
        })

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)
