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
