"""Property-based tests (SURVEY.md §5.6) for the two semantic reductions
the Spark plans rely on. Pure Python — no Spark session needed."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_extractor_spark.functions.lattice import TransitionError, fold_observation

TAGS = st.sampled_from(["PFAS", "NO_PFAS", "PENDING", None])
SOURCES = st.sampled_from(["NONE", "MANUAL", "OECD", "OPENAI", "VAI", "ECHA", "weird src", None])
OBS = st.tuples(TAGS, SOURCES)


def _fold(seq, state=None):
    dropped = 0
    for tag, src in seq:
        try:
            state = fold_observation(state, tag, src)
        except TransitionError:
            dropped += 1
    return state, dropped


@given(st.lists(OBS, min_size=1, max_size=30), st.integers(min_value=0, max_value=30))
@settings(max_examples=300)
def test_fold_sequence_splitting_is_exact(seq, k):
    """fold(seq) == fold(seq[k:]) started from fold(seq[:k]) — the property
    that makes (a) the streaming cross-batch re-fold and (b) the associative
    per-doc transition-table fold exact."""
    k = min(k, len(seq))
    whole_state, whole_drop = _fold(seq)
    head_state, head_drop = _fold(seq[:k])
    tail_state, tail_drop = _fold(seq[k:], state=head_state)
    assert tail_state == whole_state
    assert head_drop + tail_drop == whole_drop


@given(
    st.text(alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]), min_size=1, max_size=12),
    st.text(alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]), min_size=1, max_size=20),
)
@settings(max_examples=500)
def test_f2_regex_branch_implies_substring_branch(keyword, word):
    """The reference's word predicate (file_analysis_service.py:83-87) is
      re.search((r'\\b'+re.escape(k)+r'\\b').lower(), word.lower()) OR
      k.lower() in word.lower()
    The first branch matching implies the second, so the whole predicate
    equals the substring test — the reduction used by the JVM mention scan
    (operators/mentions.py) and the f2 contract query."""
    pattern = (r"\b" + re.escape(keyword) + r"\b").lower()
    try:
        regex_hit = re.search(pattern, word.lower()) is not None
    except re.error:
        return  # lowercasing an escape (e.g. \B) can break the pattern; the
        # reference would raise identically — out of scope
    substring_hit = keyword.lower() in word.lower()
    if regex_hit:
        assert substring_hit


@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6), min_size=1, max_size=12
    ),
    st.text(alphabet="abcdef", min_size=0, max_size=30),
)
@settings(max_examples=500)
def test_aho_corasick_equals_substring_set(keywords, word):
    """Property: for ANY keyword set (duplicates, prefixes, nested
    substrings) AC.match(word) == {k : k in word} — the invariant the
    adaptive mention-scan dispatch relies on for path equivalence
    (operators/mentions.py AC_KEYWORDS_MIN)."""
    from entity_extractor_spark.operators.mentions import AhoCorasick

    ac = AhoCorasick(sorted(set(keywords)))
    assert ac.match(word) == {k for k in set(keywords) if k in word}
