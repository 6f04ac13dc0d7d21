"""Property-based tests (hypothesis) for the pure-Python kernels —
the randomized layer the reference's suite lacks (SURVEY §5: 'no
property-based testing'), guarding the invariants the distributed
operators rely on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from t_res_spark.functions.similarity import (
    damlev_similarity,
    dl_distance,
    jaro_winkler_similarity,
    osa_distance,
)
from t_res_spark.operators.extraction import extract_mentions_from_text

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2014),
    max_size=200,
)
WORD = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu")), max_size=24
)


@settings(max_examples=300, deadline=None)
@given(TEXT)
def test_extraction_text_equality_invariant(text):
    """Every extracted mention must be reconstructible from the turn
    text by char offsets (BASELINE.json input_hint invariant;
    tests/test_ner.py:147-153 analog) — for ARBITRARY input."""
    for mention, s, e in extract_mentions_from_text(text):
        assert e - s == len(mention)
        # offsets index the n-dash-normalized text; — and , are both
        # one char so offsets align with the original
        norm = text[0] + text[1:].replace("—", ",") if len(text) > 1 else text
        assert norm[s:e] == mention
        assert len(mention) > 1
        assert mention != mention.lower()


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_dl_metric_properties(a, b):
    d = dl_distance(a, b)
    assert d == dl_distance(b, a)  # symmetry
    assert 0 <= d <= max(len(a), len(b))
    assert (d == 0) == (a == b)  # identity of indiscernibles


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_osa_upper_bounds_dl(a, b):
    # unrestricted DL can only be <= the restricted OSA distance
    assert dl_distance(a, b) <= osa_distance(a, b)


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_similarity_ranges(a, b):
    s = damlev_similarity(a, b)
    assert 0.0 <= s <= 1.0
    jw = jaro_winkler_similarity(a, b)
    assert 0.0 <= jw <= 1.0
    if a and a == b:
        assert s == 1.0 and jw == 1.0


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_fuzz_ratio_properties(a, b):
    """F4 invariants: bounded [0,100], symmetric, 100 iff equal."""
    from t_res_spark.functions.similarity import fuzz_ratio

    r = fuzz_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == fuzz_ratio(b, a)
    if a == b:
        assert r == 100.0
    elif r == 100.0:
        raise AssertionError(f"ratio 100 for unequal {a!r} {b!r}")


@settings(max_examples=200, deadline=None)
@given(WORD, WORD)
def test_distance_variant_ordering(a, b):
    """Unrestricted DL <= OSA (transpositions can only help), both
    bounded by max(len) for nonempty strings."""
    assert dl_distance(a, b) <= osa_distance(a, b)
    assert osa_distance(a, b) <= max(len(a), len(b)) or (a == "" and b == "")


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_ner_score_bounds(text):
    """A3: every mention's score is a round-3dp mean in [0.85, 0.99]."""
    from t_res_spark.operators.extraction import (
        extract_mentions_from_text,
        mention_ner_score,
    )

    for mention, _s, _e in extract_mentions_from_text(text):
        sc = mention_ner_score(mention)
        assert 0.85 <= sc <= 0.99
        assert sc == round(sc, 3)
