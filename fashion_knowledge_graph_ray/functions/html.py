"""Pure, dependency-free HTML -> text extraction (trafilatura-style subset).

This is the engine's analog of the reference's document-load normalization
(`/root/reference/src/engine/image_processor.py:63-87` — load + RGB
convert): the one pure function every page passes through first. The
north-rule conformance invariant is that the extracted text is
byte-identical per url across workers, partitionings and runs, so the
extractor is implemented from scratch here (no external HTML lib whose
version could drift) and its rules are frozen:

1. bytes are decoded as UTF-8 with ``errors="replace"``; None/empty -> "".
2. ``<script>``/``<style>`` elements and ``<!-- -->`` comments are removed.
3. Scope selection: the inner HTML of the *first* ``<article>`` element if
   present, else the first ``<body>``, else the whole document.
4. Every remaining tag is replaced by a newline if its tag name is
   block-level (see ``_BLOCK_TAGS``), else by a single space.
5. HTML entities are unescaped.
6. Whitespace normalization: lines are split on "\\n", runs of whitespace
   inside a line collapse to one space, lines are stripped, empty lines are
   dropped, and the result is joined with "\\n".

Any change to these rules is a version bump of the whole pipeline (goldens
regenerate).
"""

from __future__ import annotations

import html as _htmlmod
import re

_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_ARTICLE_RE = re.compile(r"<article\b[^>]*>(.*?)</article\s*>", re.IGNORECASE | re.DOTALL)
_BODY_RE = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"</?([a-zA-Z][a-zA-Z0-9:-]*)[^>]*>")
_WS_RE = re.compile("[ \\t\\r\\f\\v\\u00a0]+")

_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "br", "caption", "dd",
        "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
        "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
        "main", "nav", "ol", "p", "pre", "section", "table", "tbody", "td",
        "tfoot", "th", "thead", "tr", "ul",
    }
)


def _tag_repl(m: re.Match) -> str:
    return "\n" if m.group(1).lower() in _BLOCK_TAGS else " "


def extract_text(html: bytes | str | None) -> str:
    """Extract normalized text from raw HTML. Pure; byte-stable per input."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if not html:
        return ""
    html = _COMMENT_RE.sub(" ", html)
    html = _SCRIPT_RE.sub(" ", html)
    m = _ARTICLE_RE.search(html)
    if m is None:
        m = _BODY_RE.search(html)
    scope = m.group(1) if m is not None else html
    scope = _TAG_RE.sub(_tag_repl, scope)
    scope = _htmlmod.unescape(scope)
    lines = []
    for line in scope.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
