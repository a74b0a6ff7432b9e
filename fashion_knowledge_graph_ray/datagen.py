"""Deterministic synthetic `pages` + `taxonomy` generators (FIXTURES.md §1-2).

Everything is a pure function of ``(seed, i)`` — per-row RNG streams, no
global state — so the same row is produced regardless of chunking,
partitioning or parallelism. The page generator and
``functions.html.extract_text`` are co-designed: the ``text`` column holds
the golden extraction output and ``extract_text(html) == text`` must hold
byte-for-byte per url (north-rule invariant; reference analog:
load+RGB-normalize at `/root/reference/src/engine/image_processor.py:79-83`).

Edge-case rows (FIXTURES.md §1) are planted at fixed indices:
- ``i % 101 == 3`` → empty html (text "");
- ``i % 101 == 5`` → malformed html (unclosed tags; extractor best-effort);
- ``i % 101 == 7`` and ``i > 0`` → duplicate of url ``i-1`` (dedup test;
  later ``warc_ts``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .schemas import PAGES_SCHEMA, TAXONOMY_SCHEMA
from .vocab import (
    AGE_GROUPS,
    COLORS,
    FITS,
    GENDERS,
    MATERIALS,
    OCCASIONS,
    PRICES,
    PRODUCT_NOUNS,
    SEASONS,
    STYLES,
)

EPOCH_2025 = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

MAX_ENTITIES = len(COLORS) * len(PRODUCT_NOUNS)  # 20 * 25 = 500

_FILLER = {
    "en": (
        "the editors reviewed this week's runway looks and shared their "
        "favourite picks from the new collection"
    ).split(),
    "de": "die redaktion zeigte diese woche neue looks aus der kollektion und teilte ihre favoriten".split(),
    "fr": "la redaction a montre cette semaine des nouveaux looks de la collection et ses favoris".split(),
    "es": "la redaccion mostro esta semana nuevos looks de la coleccion y sus favoritos".split(),
}
_LANGS = ("en", "de", "fr", "es")


def _swap_typo(word: str) -> str:
    """Deterministic typo: swap chars 1 and 2 ('blazer' -> 'balzer')."""
    if len(word) < 3:
        return word
    return word[0] + word[2] + word[1] + word[3:]


def gen_taxonomy(seed: int = 42, n_entities: int = 500) -> pa.Table:
    """Build the link-target taxonomy table (pure function of args).

    Surfaces are unique two-word forms ``"{color} {noun}"`` (20 colors x 25
    nouns); no surface is a word-boundary substring of another, which keeps
    gazetteer matching unambiguous. Every 5th entity carries two alias
    surface forms (a typo and an abbreviation) to exercise MinHash-LSH
    canonicalization with known golden clusters (FIXTURES.md §2).
    """
    if not 1 <= n_entities <= MAX_ENTITIES:
        raise ValueError(f"n_entities must be in [1, {MAX_ENTITIES}]")
    ids, surfaces, aliases, cats, genders, colors, mats, styles = (
        [], [], [], [], [], [], [], [])
    for idx in range(n_entities):
        color = COLORS[idx % len(COLORS)]
        noun, category = PRODUCT_NOUNS[(idx // len(COLORS)) % len(PRODUCT_NOUNS)]
        rng = np.random.Generator(np.random.PCG64(seed * 7_919 + idx))
        surface = f"{color} {noun}"
        alias_list: list[str] = []
        if idx % 5 == 0:
            alias_list = [f"{color} {_swap_typo(noun)}", f"{color[:4]} {noun}"]
            alias_list = sorted({a for a in alias_list if a != surface})
        ids.append(f"prod-{idx:06d}")
        surfaces.append(surface)
        aliases.append(alias_list)
        cats.append(category)
        genders.append(GENDERS[int(rng.integers(0, len(GENDERS)))])
        colors.append(color)
        mats.append(sorted(rng.choice(MATERIALS, size=int(rng.integers(1, 3)),
                                      replace=False).tolist()))
        styles.append(sorted(rng.choice(STYLES, size=int(rng.integers(1, 3)),
                                        replace=False).tolist()))
    return pa.table(
        {
            "entity_id": ids, "surface": surfaces, "aliases": aliases,
            "category": cats, "gender": genders, "color": colors,
            "material": mats, "style": styles,
        },
        schema=TAXONOMY_SCHEMA,
    )


class _TaxInfo:
    """Plain-tuple view of the taxonomy used inside page generation
    (cheap to pickle into Ray tasks; built once per call site)."""

    def __init__(self, tax: pa.Table):
        self.entity_id = tax["entity_id"].to_pylist()
        self.surface = tax["surface"].to_pylist()
        self.aliases = tax["aliases"].to_pylist()
        self.category = tax["category"].to_pylist()
        self.gender = tax["gender"].to_pylist()
        self.color = tax["color"].to_pylist()
        self.material = tax["material"].to_pylist()
        self.style = tax["style"].to_pylist()
        self.n = len(self.entity_id)


_MENTION_COUNTS = np.array([0, 1, 2, 3, 4, 5, 6])
_MENTION_P = np.array([0.15, 0.15, 0.25, 0.2, 0.12, 0.08, 0.05])


def _mention_sentence(rng: np.random.Generator, info: _TaxInfo, eid: int) -> str:
    """One sentence embedding the entity surface (or an alias, 15% of the
    time) plus attribute words from the closed vocabularies, so the lexicon
    extractor (stages/attributes.py) recovers a known attrs record."""
    forms = [info.surface[eid]] + list(info.aliases[eid])
    use_alias = len(forms) > 1 and rng.random() < 0.15
    form = forms[int(rng.integers(1, len(forms)))] if use_alias else forms[0]
    mat = info.material[eid][int(rng.integers(0, len(info.material[eid])))]
    style = info.style[eid][int(rng.integers(0, len(info.style[eid])))]
    fit = FITS[int(rng.integers(0, len(FITS)))]
    season = SEASONS[int(rng.integers(0, len(SEASONS)))]
    occasion = OCCASIONS[int(rng.integers(0, len(OCCASIONS)))]
    price = PRICES[int(rng.integers(0, len(PRICES)))]
    age = AGE_GROUPS[int(rng.integers(0, len(AGE_GROUPS)))]
    return (
        f"The {form} is a {fit} {mat} piece for {info.gender[eid]} in "
        f"{info.color[eid]}, styled {style} for {occasion} wear during "
        f"{season} at a {price} price point for {age} shoppers."
    )


def _filler_paragraph(rng: np.random.Generator, lang: str) -> str:
    words = _FILLER[lang]
    k = int(rng.integers(6, 14))
    picks = [words[int(rng.integers(0, len(words)))] for _ in range(k)]
    return " ".join(picks) + "."


def gen_page(i: int, seed: int, info: _TaxInfo, skew: bool = False) -> dict:
    """Generate page ``i`` (pure function of ``(seed, i, taxonomy, skew)``)."""
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
    case = i % 101
    url = f"https://site-{i % 97:02d}.example/p/{i:08d}"
    warc_us = EPOCH_2025 + (i * 37_000_003) % 94_608_000_000_000  # ~3y spread
    lang = _LANGS[int(rng.integers(0, 4))] if rng.random() > 0.7 else "en"

    if case == 3:
        return {"url": url, "warc_ts": warc_us, "html": b"", "text": "", "lang": lang}
    if case == 7 and i > 0:
        prev = gen_page(i - 1, seed, info, skew)
        if prev["url"] != url:  # i-1 may itself be an edge case; keep its url
            return {**prev, "url": prev["url"], "warc_ts": warc_us}

    k = int(rng.choice(_MENTION_COUNTS, p=_MENTION_P))
    eids = rng.choice(info.n, size=min(k, info.n), replace=False).tolist()
    if skew and rng.random() < 0.5 and 0 not in eids:
        eids = [0] + eids[: max(0, len(eids) - 1)]

    title = f"Edition {i}: style notes"
    paragraphs = [_filler_paragraph(rng, lang)]
    for eid in eids:
        paragraphs.append(_mention_sentence(rng, info, int(eid)))
        if rng.random() < 0.4:
            paragraphs.append(_filler_paragraph(rng, lang))
    text = "\n".join([title] + paragraphs)

    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    if case == 5:
        article = f"<article><h1>{title}</h1>{body}"  # unclosed article/p soup
        html = (
            "<html><head><title>x</title><script>var a=1;</script></head>"
            f"<body><nav>home</nav>{article}"
        )
        # malformed: no </article>, no </body>; body-scope regex fails ->
        # whole-doc scope; nav/title become extra lines. Recompute golden
        # through the frozen extractor rules:
        text = "\n".join(["x", "home", title] + paragraphs)
    else:
        html = (
            "<html><head><title>site</title><style>.a{color:red}</style>"
            "<script>trackPage();</script></head><body>"
            '<header><nav><a href="/">home</a> <a href="/looks">looks</a>'
            f"</nav></header><article><h1>{title}</h1>{body}</article>"
            "<footer>contact &amp; imprint</footer></body></html>"
        )
    return {
        "url": url,
        "warc_ts": warc_us,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def _pages_from_indices(indices, seed: int, info: _TaxInfo, skew: bool) -> pa.Table:
    rows = [gen_page(int(i), seed, info, skew) for i in indices]
    ts = pa.array([r["warc_ts"] for r in rows], type=pa.timestamp("us", tz="UTC"))
    return pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": ts,
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
            "text": pa.array([r["text"] for r in rows], type=pa.string()),
            "lang": pa.array([r["lang"] for r in rows], type=pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def gen_pages_table(seed: int = 42, n_pages: int = 1000,
                    taxonomy: pa.Table | None = None,
                    skew: bool = False) -> pa.Table:
    """Driver-side pages table (tests / small fixtures)."""
    tax = taxonomy if taxonomy is not None else gen_taxonomy(seed)
    return _pages_from_indices(range(n_pages), seed, _TaxInfo(tax), skew)


def pages_dataset(seed: int = 42, n_pages: int = 100_000,
                  taxonomy: pa.Table | None = None, skew: bool = False):
    """Distributed pages generation for bench scale: ``ray.data.range`` ->
    ``map_batches`` keyed on the row id, so output is identical for any
    partitioning. The taxonomy rides into each task once via ``ray.put``."""
    import ray
    import ray.data as rd

    tax = taxonomy if taxonomy is not None else gen_taxonomy(seed)
    info_ref = ray.put(_TaxInfo(tax))

    def gen_batch(batch: pa.Table) -> pa.Table:
        info = ray.get(info_ref)
        return _pages_from_indices(batch["id"].to_pylist(), seed, info, skew)

    return rd.range(n_pages).map_batches(
        gen_batch, batch_format="pyarrow", batch_size=2048
    )


def ensure_fixture_dir(root: str, seed: int = 42, n_pages: int = 1000,
                       n_entities: int = 500, skew: bool = False) -> str:
    """Write (once, cached) ``pages.parquet`` + ``taxonomy.parquet`` under
    ``root/pages_s{seed}_n{n_pages}_e{n_entities}[_skew]`` and return the dir."""
    import os
    import pyarrow.parquet as pq

    tag = f"pages_s{seed}_n{n_pages}_e{n_entities}" + ("_skew" if skew else "")
    out = os.path.join(root, tag)
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        tmp = out + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        tax = gen_taxonomy(seed, n_entities)
        pq.write_table(tax, os.path.join(tmp, "taxonomy.parquet"))
        pq.write_table(gen_pages_table(seed, n_pages, tax, skew),
                       os.path.join(tmp, "pages.parquet"))
        os.makedirs(out, exist_ok=True)
        for f in os.listdir(tmp):
            os.replace(os.path.join(tmp, f), os.path.join(out, f))
        os.rmdir(tmp)
        with open(done, "w") as fh:
            fh.write("ok")
    return out
