"""Property-based robustness (hypothesis) for the pure-Python cores that
every Arrow batch runs through — crash-freedom and invariants on arbitrary
unicode, not just fixtures."""

import re

from hypothesis import given, settings, strategies as st

from harvesttext_spark.functions.cleaning import clean_text_py, make_cleaner
from harvesttext_spark.functions.sentences import cut_sentences_py
from harvesttext_spark.functions.tokenize import seg_py
from harvesttext_spark.operators.linking import EntityKB
from harvesttext_spark.operators.texttile import depth_scores

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=400,
)

KB = EntityKB.from_triples([("武磊", "武磊", "球员"), ("ab", "ab", "x")])
_CLEANER = make_cleaner()


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_clean_never_crashes_and_is_idempotent_on_whitespace(text):
    out = _CLEANER(text)
    assert isinstance(out, str)
    assert out == out.strip()
    # whitespace runs are collapsed: no two consecutive identical ws chars
    assert not re.search(r"(\s)\1", out) or True  # runs collapse to FIRST char:
    # the invariant is no run of 2+ of any ws pair; check directly:
    assert not re.search(r"\s\s", out)


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_cut_sentences_preserves_content(text):
    sents = cut_sentences_py(text)
    # joined sentences == original minus whitespace-only segments and
    # trailing/leading strip per sentence
    joined = "".join(sents)
    squeezed_src = re.sub(r"\s", "", text)
    squeezed_out = re.sub(r"\s", "", joined)
    assert squeezed_out == squeezed_src


@settings(max_examples=150, deadline=None)
@given(TEXT)
def test_seg_roundtrip_without_stopwords(text):
    toks = seg_py(text, KB)
    # concatenation of tokens preserves all non-whitespace characters
    assert re.sub(r"\s", "", "".join(toks)) == re.sub(r"\s", "", text)


@settings(max_examples=100, deadline=None)
@given(TEXT)
def test_kb_link_spans_are_sane(text):
    for l, r, entity, type0 in KB.link(text):
        assert 0 <= l < r <= len(text)
        assert type0.startswith("#") and type0.endswith("#")


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=1, allow_nan=False), min_size=2, max_size=30))
def test_depth_scores_bounds(sims):
    d = depth_scores(sims)
    assert len(d) == len(sims) - 1
    # depths are peak-sum minus 2*valley: bounded by 2*max range
    assert all(-1e-9 <= x <= 2.0 + 1e-9 for x in d)
