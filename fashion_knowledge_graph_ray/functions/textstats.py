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
