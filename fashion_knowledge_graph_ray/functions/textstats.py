"""Text analysis kernels for the training-data pipeline operators.

Each function here has EXACT, frozen semantics that the DuckDB oracle SQL
in ``__ray_entry__.oracle_sql`` mirrors expression-for-expression (the
driver hash-compares values, so Python and SQL must agree bit-for-bit):

- ``token_count``:   number of maximal ``\\S+`` runs;
- ``ws_free_len``:   characters excluding all ``\\s``;
- ``stopword_count``: tokens (lowercased) contained in ``STOPWORDS``;
- ``fingerprint_md5``: hex md5 of the raw text (DuckDB ``md5(text)``);
- ``lang_scores``/``predict_lang``: marker-word counts per language,
  argmax with lexicographic tie-break (deterministic);
- ``simhash64``: 64-bit SimHash over token features (blake2b-based,
  process-stable) — no SQL analog (rows-only check).

All are used inside vectorized ``map_batches`` wrappers in
stages/textstats.py; never call per-row on the driver.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_TOKEN_RE = re.compile(r"\S+")
_WS_RE = re.compile(r"\s")

STOPWORDS = ("the", "a", "and", "of", "is", "to", "in")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "en": ("the", "and", "of", "is", "to", "a"),
    "es": ("el", "la", "los", "que", "y", "de"),
    "fr": ("le", "les", "des", "et", "une", "est"),
}


def tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text or "")


def token_count(text: str) -> int:
    return len(tokens(text))


def ws_free_len(text: str) -> int:
    return len(_WS_RE.sub("", text or ""))


def stopword_count(text: str) -> int:
    sw = set(STOPWORDS)
    return sum(1 for t in tokens(text) if t.lower() in sw)


def fingerprint_md5(text: str) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def lang_scores(text: str) -> dict[str, int]:
    toks = [t.lower() for t in tokens(text)]
    return {
        lang: sum(1 for t in toks if t in set(markers))
        for lang, markers in LANG_MARKERS.items()
    }


def predict_lang(text: str) -> str:
    """argmax marker count; ties break to the lexicographically first
    language; all-zero scores -> 'und' (undetermined)."""
    scores = lang_scores(text)
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


def line_dup_stats(text: str) -> tuple[int, float]:
    """(n_lines, dup_line_frac): Gopher-style repetition signal — the
    fraction of ``\\n``-split lines that are repeats of another line in
    the same document. Empty text is one (empty) line, frac 0.0. The
    oracle mirrors this as ``1.0 - len(list_distinct(lines))/len(lines)``
    (same operation order, so the doubles agree bit-for-bit)."""
    lines = (text or "").split("\n")
    n = len(lines)
    return n, 1.0 - (len(set(lines)) / n)


def top_bigram_frac(text: str) -> float:
    """Fraction of word-bigram slots occupied by the single most frequent
    bigram (Gopher 'top n-gram fraction', n=2): high values mean boilerplate
    or generated repetition. 0.0 for texts with fewer than two tokens."""
    from collections import Counter

    toks = tokens(text)
    if len(toks) < 2:
        return 0.0
    counts = Counter(zip(toks, toks[1:]))
    return max(counts.values()) / (len(toks) - 1)


def _hash64(token: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over whitespace tokens (term frequency
    weighted). Deterministic across processes (blake2b, not builtin hash)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in tokens(text):
        h = np.uint64(_hash64(t.lower()))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized ``simhash64`` over a batch — bit-identical output
    (pinned by test against the per-doc reference).

    The per-doc kernel pays one blake2b call + one 64-lane numpy pass
    per token OCCURRENCE; this one hashes each DISTINCT lowercased token
    of the batch once (token frequency is Zipfian, so the dedup factor
    is large), expands hashes to a bit matrix with a single
    ``np.unpackbits``, and accumulates per-doc bit counts with one
    ``np.add.reduceat``. Sign rule: bit i set iff
    2*count_of_ones - n_tokens > 0 — exactly the reference's
    +-1 accumulate."""
    toks_per_doc = [[t.lower() for t in tokens(x or "")] for x in texts]
    n_tok = np.array([len(ts) for ts in toks_per_doc], dtype=np.int64)
    total = int(n_tok.sum())
    if total == 0:
        return np.zeros(len(texts), dtype=np.uint64)
    flat = np.array([t for ts in toks_per_doc for t in ts], dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    hashes = np.fromiter((_hash64(t) for t in uniq), dtype=np.uint64,
                         count=len(uniq))
    # (U, 64) bit matrix, bit j of row = (h >> j) & 1
    bits_u = np.unpackbits(hashes[:, None].view(np.uint8), axis=1,
                           bitorder="little")
    bits_all = bits_u[inv]  # (total_tokens, 64), doc-contiguous
    S = np.zeros((len(texts), 64), dtype=np.int64)
    nz = n_tok > 0
    starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    S[nz] = np.add.reduceat(bits_all, starts[nz], axis=0)
    out_bits = (2 * S - n_tok[:, None]) > 0
    return np.packbits(out_bits, axis=1,
                       bitorder="little").view(np.uint64).ravel()
