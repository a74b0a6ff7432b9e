"""TrieScanner (Aho-Corasick regime) equivalence with the trie regex.

The scanner replaces the compiled regex above ``AC_FORM_GATE`` forms;
these tests pin match-for-match identity on adversarial fixtures and
exercise the gate switch plus large-gazetteer build/scan viability."""
import random
import string

import pyarrow as pa

from fashion_knowledge_graph_ray.stages.mentions import (
    AC_FORM_GATE,
    MentionDetector,
    TrieScanner,
    build_gazetteer,
    compile_pattern,
    detect_in_text,
)


def _spans(it):
    return [(m.start(), m.end(), m.group(0)) for m in it]


def test_scanner_matches_regex_on_adversarial_forms():
    forms = ["silk", "silk scarf", "silk scarf red", "scarf", "red",
             "a", "ab", "abc", "x_y", "x", "1984", "19", "belt"]
    pat = compile_pattern(forms)
    sc = TrieScanner(forms)
    texts = [
        "silk scarf red and a silk scarf, red belt",
        "xsilk scarfx silk  scarf",          # boundary rejects + longest
        "ab abc a b x_y x _y",               # prefix chains, underscore \w
        "1984 19 x1984 1984x",               # digit boundaries
        "silk scarf redder",                 # longest fails end-\b, backtrack
        "",
        "silk",
        "scarf.silk,red;belt",               # punctuation boundaries
        "SILK was lowered upstream",         # scanner sees lowered text
        "a a a a a",
        "abcabc abc",
    ]
    for t in texts:
        t = t.lower()
        assert _spans(sc.finditer(t)) == _spans(pat.finditer(t)), t


def test_scanner_matches_regex_randomized():
    rng = random.Random(42)
    words = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 6)))
             for _ in range(200)]
    forms = sorted({w for w in words})
    # multi-word forms too
    forms += [f"{a} {b}" for a, b in zip(forms[:30], forms[30:60])]
    pat = compile_pattern(forms)
    sc = TrieScanner(forms)
    vocab = forms + ["zzz", "q", "-", ",", "  "]
    for _ in range(50):
        t = " ".join(rng.choices(vocab, k=rng.randint(0, 40)))
        assert _spans(sc.finditer(t)) == _spans(pat.finditer(t)), t


def test_scanner_casefold_spans_index_original():
    sc = TrieScanner(["straße", "belt"], casefold=True)
    # 'STRASSE'.lower() == 'strasse' (no ß) so the form with ß is NOT a
    # match; the uppercase ẞ lowers to ß and must match in-place
    text = "STRAẞE and BELT"
    got = _spans(sc.finditer(text))
    assert got == [(0, 6, "STRAẞE"), (11, 15, "BELT")]


def test_detector_gate_switch_identical_mentions():
    # same taxonomy through both regimes (gate forced by monkeypatching
    # the form count is intrusive; instead compare detect_in_text over
    # scanner vs regex directly on the gazetteer)
    tax = pa.table({
        "entity_id": ["e1", "e2", "e3"],
        "surface": ["black blouse", "denim jacket", "scarf"],
        "aliases": [["blouse"], [], ["silk scarf"]],
        "category": ["top", "jacket", "scarf"],
    })
    gaz = build_gazetteer(tax)
    pat = compile_pattern(gaz.keys())
    sc = TrieScanner(gaz.keys())
    for text in ["A Black Blouse with a silk scarf and denim jacket.",
                 "blouse scarf blouse", "no mentions here"]:
        a = detect_in_text(text, "u", pat, gaz)
        b = detect_in_text(text, "u", sc, gaz)
        assert a == b


def test_large_gazetteer_uses_scanner_and_detects():
    # 10^5-form synthetic taxonomy: MentionDetector must pick the
    # automaton (regex compile at this size is prohibitive) and still
    # detect planted forms
    n = AC_FORM_GATE * 2
    forms = [f"brandword{i:06d}" for i in range(n)]
    tax = pa.table({
        "entity_id": [f"e{i}" for i in range(n)],
        "surface": forms,
        "aliases": [[] for _ in range(n)],
        "category": ["top"] * n,
    })
    det = MentionDetector(tax)
    assert isinstance(det.pattern, TrieScanner)
    batch = pa.table({
        "url": ["u1"],
        "warc_ts": [0],
        "lang": ["en"],
        "text": ["x brandword000123 y brandword009999 brandword000123"],
    })
    out = det(batch)
    recs = out["mentions"].to_pylist()[0]
    assert [r["form"] for r in recs] == ["brandword000123",
                                        "brandword009999"]
    assert recs[0]["n_hits"] == 2
