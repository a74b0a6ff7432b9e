"""Controlled vocabularies — the closed attribute schema of the reference.

Mirrors the extraction vocabulary the reference bakes into its LLM prompt
(`/root/reference/src/utils/prompts.py:1-32`) and its segmentation class
space (`/root/reference/src/config/settings.py:116-127`). In this engine the
vocabulary is *data*, consumed by the deterministic lexicon attribute
extractor (stages/attributes.py) and the synthetic page generator
(datagen.py). Tuples are ordered and frozen so every derived artifact is
reproducible byte-for-byte.
"""

from __future__ import annotations

# ── attribute schema (reference prompts.py:4-13) ──────────────────────────
# scalar fields: first vocabulary hit in the mention context window wins;
# list fields: all distinct hits, sorted. No hit → UNKNOWN / empty list
# (fallback-default semantics of attribute_extraction_model.py:100-114).

UNKNOWN = "unknown"

TYPES = (
    "top", "bottom", "dress", "jacket", "shoes",
    "sunglasses", "bag", "hat", "scarf", "belt",
)

# The reference's color vocabulary is OPEN ("e.g. ..." in the prompt,
# prompts.py:5). This engine needs a CLOSED list for deterministic
# extraction, so: all 13 example colors from the prompt verbatim, extended
# with 7 common colors to 20 entries. The length-20 is ALSO load-bearing:
# entity ids are laid out as idx = color*1 + noun*20 (datagen.py:74-75)
# and the DuckDB oracles recompute categories as `idx // 20`.
COLORS = (
    "black", "white", "red", "blue", "green", "yellow", "pink", "purple",
    "orange", "brown", "gray", "beige", "multi-color", "navy", "olive",
    "teal", "maroon", "crimson", "ivory", "charcoal",
)

STYLES = ("casual", "formal", "sporty", "business", "party", "beach")

SEASONS = ("spring", "summer", "autumn", "winter", "all-season")

# verbatim from the reference prompt (prompts.py:8)
OCCASIONS = (
    "casual", "business", "party", "wedding", "sports", "travel",
    "work", "school", "evening", "holiday",
)

PRICES = ("low", "medium", "high")

# verbatim from the reference prompt (prompts.py:10)
MATERIALS = (
    "cotton", "denim", "leather", "silk", "wool", "linen", "polyester",
    "nylon", "cashmere", "satin", "lace", "fur", "suede", "velvet",
    "canvas",
)

FITS = ("slim", "regular", "loose", "oversized", "skinny", "relaxed")

GENDERS = ("men", "women", "unisex")

AGE_GROUPS = ("adult", "teen", "child")

# field name -> (vocabulary, is_list). Order matters: it is the column order
# of the attrs struct and the extraction order in stages/attributes.py.
ATTRIBUTE_FIELDS: tuple[tuple[str, tuple[str, ...], bool], ...] = (
    ("type", TYPES, False),
    ("color", COLORS, False),
    ("style", STYLES, True),
    ("season", SEASONS, True),
    ("occasion", OCCASIONS, True),
    ("price", PRICES, False),
    ("material", MATERIALS, True),
    ("fit", FITS, False),
    ("gender", GENDERS, False),
    ("age_group", AGE_GROUPS, True),
)
# NOTE: age_group is scalar in the reference; kept scalar here:
ATTRIBUTE_FIELDS = tuple(
    (n, v, (False if n == "age_group" else is_list))
    for (n, v, is_list) in ATTRIBUTE_FIELDS
)

SCALAR_FIELDS = tuple(n for n, _, is_list in ATTRIBUTE_FIELDS if not is_list)
LIST_FIELDS = tuple(n for n, _, is_list in ATTRIBUTE_FIELDS if is_list)

# ── product-noun inventory for taxonomy surfaces ──────────────────────────
# Maps each noun to its category (the segmentation "class space" analog —
# reference settings.py:116-127 maps mask class ids to clothing labels).
PRODUCT_NOUNS: tuple[tuple[str, str], ...] = (
    ("blouse", "top"), ("tshirt", "top"), ("sweater", "top"),
    ("jeans", "bottom"), ("trousers", "bottom"), ("skirt", "bottom"),
    ("gown", "dress"), ("sundress", "dress"),
    ("blazer", "jacket"), ("parka", "jacket"), ("windbreaker", "jacket"),
    ("sneakers", "shoes"), ("loafers", "shoes"), ("boots", "shoes"),
    ("aviators", "sunglasses"), ("wayfarers", "sunglasses"),
    ("tote", "bag"), ("satchel", "bag"), ("clutch", "bag"),
    ("fedora", "hat"), ("beanie", "hat"),
    ("pashmina", "scarf"), ("bandana", "scarf"),
    ("waistbelt", "belt"), ("cummerbund", "belt"),
)

# Relation types (reference process_social_media_images.py:121-131):
# same category -> COMPLEMENTED_BY, different or missing -> WORN_WITH.
REL_COMPLEMENTED_BY = "complemented_by"
REL_WORN_WITH = "worn_with"

# Edge-evidence collect-list cap (G3 analog, graph_database.py:172-176):
# capped "evidence sample", never silent — aggregator logs when truncating.
EVIDENCE_CAP = 20

# Entity-linking acceptance threshold (process_social_media_images.py:97).
LINK_SIMILARITY_THRESHOLD = 0.75

# Mention salience threshold — analog of the `area >= 1028` pixel filter at
# image_processor.py:117-119: drop mentions whose surface form is shorter
# than this many characters.
MIN_MENTION_CHARS = 4


# Spec-sheet attribute vocabulary (M11) — the reference's SECOND closed
# vocabulary, used by its standalone spec-sheet extractor
# (`/root/reference/src/utils/prompts.py:149-178`, consumed at
# `/root/reference/src/inference/product_attributes.py:27-88`). Values are
# multi-word PHRASES, so the deterministic analog matches phrases by
# position in the text (see stages/attributes.extract_spec_attrs).
SPEC_ATTRIBUTE_FIELDS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("sleeve_length", ("full sleeve", "short sleeve", "sleeveless")),
    ("activity", ("leisure", "sports", "yoga", "formal")),
    ("back_exposure", ("partial coverage", "full coverage")),
    ("spec_fit", ("tight", "unstructured", "oversize", "structured",
                  "classic", "loose", "slim")),
    ("sleeve_fit", ("fitted sleeve", "oversized sleeve", "relaxed sleeve",
                    "tight sleeve")),
    ("closure", ("front button", "pullover")),
    ("pocket_details", ("patch pocket", "kangaroo pocket", "seam pocket",
                        "slant pocket")),
    ("hem_details", ("curved hem", "asymmetric hem", "elastic hem")),
    ("length", ("at knee", "at waist", "at hips")),
    ("pattern", ("striped", "plain", "logo", "floral", "abstract")),
)
