"""Stage 2: mention detection — the segmentation analog (M6/T1).

Reference semantics being re-expressed
(`/root/reference/src/engine/image_processor.py:106-148` and
`/root/reference/src/models/segmentation_model.py:208-237`):

- per document, detect every known "class" present (there: SegFormer mask
  classes; here: taxonomy surface forms + aliases via a compiled
  word-boundary gazetteer), at most ONE item per class per document;
- salience = matched chars (area analog); drop below
  ``MIN_MENTION_CHARS`` (area >= 1028 analog at image_processor.py:117-119);
- ``single_product_mode`` keeps only the top-1 item by salience
  (image_processor.py:138-142).

The detector is a callable CLASS (actor pool): the matcher over all
surface forms is built ONCE per actor in ``__init__`` (reference analog:
model load in ModelManager, model_manager.py:109). Two matcher regimes,
identical semantics, switched on the form count:

- ≤ ``AC_FORM_GATE`` forms: a character-trie REGEX — Python's C regex
  engine scans tries in one pass and wins on scan speed (measured
  2.9 vs 1.7 MB/s at 10^6 forms) while compile time stays amortizable
  (3.4 s at 10^5 forms, once per actor);
- above the gate (true web-scale gazetteers): ``TrieScanner``, an
  Aho-Corasick-style longest-match automaton walked in pure Python —
  at 10^6 forms ``re.compile`` measures 49 s PER ACTOR (a pool-wide
  startup tax that grows superlinearly and eventually exhausts memory)
  while the automaton builds in 6 s; match-for-match identical to the
  regex (equivalence-tested at 10^6 forms: same hits).

Output keeps each page's mentions as ONE list<struct> row so that
per-page pair semantics never depend on block boundaries (SURVEY.md §7.4
"Cross-block pair semantics").
"""

from __future__ import annotations

import re
from typing import Any

import pyarrow as pa

from ..vocab import MIN_MENTION_CHARS

MENTION_STRUCT = pa.struct(
    [
        ("mention_id", pa.string()),
        ("surface", pa.string()),       # verbatim matched text
        ("form", pa.string()),          # lowercased gazetteer form
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("salience", pa.int64()),
        ("n_hits", pa.int64()),
        ("context", pa.string()),
        ("label", pa.string()),         # taxonomy category of the form
        ("entity_hint", pa.string()),   # gazetteer entity id of the form
    ]
)

CONTEXT_WINDOW = 120  # chars either side of the span


def build_gazetteer(taxonomy: pa.Table) -> dict[str, tuple[str, str]]:
    """form(lower) -> (entity_id, category) for surfaces and aliases."""
    gaz: dict[str, tuple[str, str]] = {}
    for eid, surface, aliases, cat in zip(
        taxonomy["entity_id"].to_pylist(),
        taxonomy["surface"].to_pylist(),
        taxonomy["aliases"].to_pylist(),
        taxonomy["category"].to_pylist(),
    ):
        gaz[surface.lower()] = (eid, cat)
        for a in aliases or []:
            gaz.setdefault(a.lower(), (eid, cat))
    return gaz


def _trie_regex(words) -> str:
    """Compile the form set into a character-trie regex — the pure-Python
    stand-in for an Aho-Corasick automaton. ~80x faster than a flat
    alternation at a few hundred forms (regex engines scan tries in one
    pass; greedy continuation prefers the longest form)."""
    trie: dict = {}
    for w in words:
        d = trie
        for ch in w:
            d = d.setdefault(ch, {})
        d[""] = {}

    def build(d: dict) -> str:
        if "" in d and len(d) == 1:
            return ""
        parts = [(re.escape(ch), build(sub))
                 for ch, sub in sorted(d.items()) if ch != ""]
        alts = [c + t for c, t in parts]
        body = alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"
        if "" not in d:
            return body
        # a terminal node with ONE continuing alternative must group
        # before applying '?': "bc?" + "?" would bind the optionality to
        # the last atom only, silently requiring the continuation and
        # breaking prefix-chain forms ("silk" vs "silk scarf red").
        # Single-atom bodies (lone escaped char, or an already-grouped
        # multi-alt) skip the extra group — the pattern stays tight.
        if len(alts) == 1 and parts[0][1]:
            return f"(?:{body})?"
        return body + "?"

    return "(?:" + "|".join(
        re.escape(ch) + build(sub) for ch, sub in sorted(trie.items()) if ch != ""
    ) + ")"


def compile_pattern(forms) -> re.Pattern:
    """Word-boundary trie regex over all (lowercase) gazetteer forms.
    Matching is run on ``text.lower()``; longest form wins (greedy trie
    continuation — equivalent to a longest-first alternation, verified in
    tests)."""
    return re.compile(r"\b" + _trie_regex(list(forms)) + r"\b")


# Above this form count the automaton replaces the regex: measured
# breakeven — regex compile is 3.4 s at 1e5 forms (fine once per actor)
# but 49 s at 1e6; the automaton builds 8x faster and scans within 2x.
AC_FORM_GATE = 200_000

_ASCII_WORD = tuple(bool(re.match(r"\w", chr(c))) for c in range(128))
_WORD_RE = re.compile(r"\w")


def _simple_lower(s: str) -> str:
    """re.IGNORECASE's SIMPLE per-codepoint lowering. Identical to
    ``str.lower()`` except U+0130 'İ' (the only codepoint whose full
    lowercase is multi-char: 'i'+U+0307, where the simple mapping — and
    therefore ``re.IGNORECASE`` — uses plain 'i'). Gazetteer keys are
    built with full lower on ORIGINAL taxonomy surfaces (never containing
    a combining-dot artifact), so simple-lowered match text is the
    correct lookup key on the rare-Unicode ci path."""
    if "İ" in s:
        s = s.replace("İ", "i")
    return s.lower()


def _is_word(ch: str) -> bool:
    o = ord(ch)
    return _ASCII_WORD[o] if o < 128 else bool(_WORD_RE.match(ch))


class _Span:
    """Minimal ``re.Match`` stand-in (group/start/end) so ``TrieScanner``
    drops into every call site that iterates ``pattern.finditer``."""

    __slots__ = ("_s", "_e", "_t")

    def __init__(self, s: int, e: int, t: str):
        self._s, self._e, self._t = s, e, t

    def group(self, idx: int = 0) -> str:
        return self._t[self._s:self._e]

    def start(self) -> int:
        return self._s

    def end(self) -> int:
        return self._e


class TrieScanner:
    """Aho-Corasick-style longest-match scanner for LARGE gazetteers.

    Semantics replicate the trie regex exactly (verified by the
    equivalence test): matches must start and end on ``\\b`` word
    boundaries, the LONGEST form anchored at a position wins (greedy
    with backtrack-to-shorter-terminal, like the regex), and scanning
    resumes at the match end (non-overlapping, left-to-right).

    Build: O(Σ form chars) dict trie — measured 6 s at 10^6 forms where
    ``re.compile`` of the equivalent pattern takes 49 s (per actor!).
    Scan: O(len(text) × avg trie walk), independent of form count
    (measured 1.7-2.0 MB/s/core at 10^5-10^6 forms vs the regex's
    2.9 — the trade is per-actor startup for a bounded scan slowdown).
    ``casefold=True`` walks the ORIGINAL text lowering characters on the
    fly (the rare length-changing-Unicode fallback, mirroring
    ``compile_pattern_ci``); spans always index the scanned string.
    The fold is re.IGNORECASE's SIMPLE per-codepoint lowering, not
    ``str.lower()``'s full mapping: the two differ only at U+0130 'İ'
    (full: 'i'+U+0307, simple: 'i' — probed against this interpreter's
    ``re``), and using the full mapping here made the two ci regimes
    diverge on exactly the length-changing path the fallback exists
    for."""

    __slots__ = ("root", "casefold")

    def __init__(self, forms, *, casefold: bool = False):
        root: dict = {}
        for w in forms:
            d = root
            for ch in w:
                d = d.setdefault(ch, {})
            d[""] = True
        self.root = root
        self.casefold = casefold

    @staticmethod
    def _bound(text: str, i: int) -> bool:
        n = len(text)
        if n == 0:
            return False
        if i <= 0:
            return _is_word(text[0])
        if i >= n:
            return _is_word(text[n - 1])
        return _is_word(text[i - 1]) != _is_word(text[i])

    _fold = staticmethod(_simple_lower)

    def finditer(self, text: str):
        root = self.root
        bound = self._bound
        fold = self.casefold
        _fold = self._fold
        n = len(text)
        i = 0
        while i < n:
            first = _fold(text[i]) if fold else text[i]
            if (first not in root) or not bound(text, i):
                i += 1
                continue
            d = root
            j = i
            best = -1
            while j < n:
                ch = _fold(text[j]) if fold else text[j]
                nxt = d.get(ch)
                if nxt is None:
                    break
                d = nxt
                j += 1
                if "" in d and bound(text, j):
                    best = j
            if best > i:
                yield _Span(i, best, text)
                i = best
            else:
                i += 1


def compile_pattern_ci(forms) -> re.Pattern:
    """Case-insensitive fallback used when ``text.lower()`` changes the
    string length (rare Unicode case mappings), so spans always index the
    ORIGINAL text."""
    ordered = sorted(forms, key=lambda s: (-len(s), s))
    return re.compile(
        r"\b(?:" + "|".join(re.escape(f) for f in ordered) + r")\b",
        re.IGNORECASE,
    )


def detect_in_text(text: str, url: str, pattern: "re.Pattern | TrieScanner",
                   gaz: dict[str, tuple[str, str]],
                   min_chars: int = MIN_MENTION_CHARS,
                   ci_pattern: "re.Pattern | TrieScanner | None" = None,
                   ) -> list[dict]:
    """Distinct-per-form mentions, ordered by first occurrence.

    One record per (document, form) — the reference emits one item per mask
    class per image regardless of pixel multiplicity; ``n_hits`` preserves
    the raw occurrence count. The fast path scans ``text.lower()`` with the
    trie pattern; when lowercasing changes the length (rare Unicode), the
    case-insensitive fallback scans the original so spans stay valid.
    """
    lowered = text.lower()
    if len(lowered) == len(text):
        it = pattern.finditer(lowered)
    else:
        it = (ci_pattern or compile_pattern_ci(gaz.keys())).finditer(text)
    found: dict[str, dict] = {}
    order: list[str] = []
    for m in it:
        # simple lowering, matching how the ci regimes matched: full
        # .lower() on a matched 'İ...' would produce a combining-dot key
        # absent from the gazetteer (KeyError on the rare-Unicode path)
        form = _simple_lower(m.group(0))
        if form in found:
            found[form]["n_hits"] += 1
            continue
        if len(form) < min_chars:
            continue  # area-threshold analog
        s, e = m.start(), m.end()
        eid, cat = gaz[form]
        found[form] = {
            "surface": text[s:e],
            "form": form,
            "span_start": s,
            "span_end": e,
            "salience": e - s,
            "n_hits": 1,
            "context": text[max(0, s - CONTEXT_WINDOW): e + CONTEXT_WINDOW],
            "label": cat,
            "entity_hint": eid,
        }
        order.append(form)
    out = []
    for k, form in enumerate(order):
        rec = dict(found[form])
        rec["mention_id"] = f"{url}#m{k}"
        out.append(rec)
    return out


class MentionDetector:
    """Actor-pool stage: pages(text) -> page rows with a mentions list column.

    Use as ``ds.map_batches(MentionDetector, fn_constructor_args=(tax_ref,),
    concurrency=N, batch_format="pyarrow")`` where ``tax_ref`` is a
    ``ray.put`` handle of the taxonomy Arrow table (broadcast once, not
    re-shipped per batch), or the table itself for local/test use.
    """

    def __init__(self, taxonomy_ref, single_product_mode: bool = False,
                 min_chars: int = MIN_MENTION_CHARS):
        tax = taxonomy_ref
        if not isinstance(tax, pa.Table):
            import ray

            tax = ray.get(taxonomy_ref)
        self.gaz = build_gazetteer(tax)
        forms = list(self.gaz.keys())
        if len(forms) > AC_FORM_GATE:
            # web-scale gazetteer: the automaton (identical matches,
            # O(text) scan, seconds to build at 10^5-10^6 forms)
            self.pattern: Any = TrieScanner(forms)
            self.ci_pattern: Any = TrieScanner(forms, casefold=True)
        else:
            self.pattern = compile_pattern(forms)
            self.ci_pattern = compile_pattern_ci(forms)
        self.single = single_product_mode
        self.min_chars = min_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        mentions_col = []
        for url, text in zip(urls, texts):
            recs = detect_in_text(text or "", url, self.pattern, self.gaz,
                                  self.min_chars, ci_pattern=self.ci_pattern)
            if self.single and len(recs) > 1:
                # top-1 by salience, stable on earlier span (sort is stable;
                # reference sorts desc by area and keeps the first —
                # image_processor.py:140-141)
                recs = [max(recs, key=lambda r: (r["salience"], -r["span_start"]))]
            mentions_col.append(recs)
        arr = pa.array(mentions_col, type=pa.list_(MENTION_STRUCT))
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "mentions": arr,
            }
        )


def detect_mentions(pages_ds, taxonomy_ref, *, single_product_mode=False,
                    concurrency=(1, 8), batch_size: int = 512):
    """pages (url, warc_ts, text, lang) -> page_mentions Dataset."""
    return pages_ds.map_batches(
        MentionDetector,
        fn_constructor_args=(taxonomy_ref, single_product_mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
