"""Property-based tests (hypothesis) for the pure parity-critical kernels —
SURVEY.md §7 names naming/URI/date/similarity bit-parity as the top P/R
risk, so these run hundreds of generated cases per property."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraphs_spark.functions.dates import fix_date_format
from knowledgegraphs_spark.functions.naming import normalise, valid_name
from knowledgegraphs_spark.functions.similarity import (
    char_jaccard,
    edit_similarity,
    is_near_duplicate,
    levenshtein,
    partial_ratio,
    pj_score,
)
from knowledgegraphs_spark.operators.dedup import simhash64_python
from knowledgegraphs_spark.operators.po_extraction import common_stem
from knowledgegraphs_spark.sources.tabular import decide_type, repair_headers

text = st.text(max_size=60)
word = st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=20)


@settings(max_examples=200)
@given(text)
def test_valid_name_is_iri_safe_and_idempotent(s):
    out = valid_name(s)
    assert not re.search(r"[/\\%# ]", out)
    assert valid_name(out) == out


@settings(max_examples=200)
@given(text)
def test_normalise_invariants(s):
    # NOT idempotent by design: the reference's left-to-right substring
    # removal of "p " can leave a new adjacency a second pass would strip
    # (hypothesis found 'pp  ' → 'p ' → ''). The true invariants:
    out = normalise(s)
    assert out == normalise(s)  # deterministic
    assert not re.search(r"[\[\],_]", out)  # strip chars + '_' gone
    assert out == out.lower()


@settings(max_examples=300)
@given(text)
def test_fix_date_format_shape(s):
    out = fix_date_format(s)
    assert out is None or re.fullmatch(r"\d{4}-\d{2}-\d{2}", out)


@settings(max_examples=200)
@given(st.integers(1900, 2500), st.integers(1, 12), st.integers(1, 28))
def test_fix_date_format_roundtrip(y, m, d):
    assert fix_date_format(f"{y:04d}-{m}-{d}") == f"{y:04d}-{m:02d}-{d:02d}"


@settings(max_examples=200)
@given(text, text)
def test_char_jaccard_bounds_and_symmetry(a, b):
    v = char_jaccard(a, b)
    assert 0.0 <= v <= 1.0
    assert v == char_jaccard(b, a)
    if set(a) == set(b):
        assert v == 1.0 or (not a and not b)


@settings(max_examples=200)
@given(text, text)
def test_edit_similarity_bounds_symmetry_identity(a, b):
    v = edit_similarity(a, b)
    assert 0.0 <= v <= 1.0
    assert v == edit_similarity(b, a)
    assert edit_similarity(a, a) == 1.0


@settings(max_examples=200)
@given(text, text)
def test_levenshtein_triangle_and_bounds(a, b):
    d = levenshtein(a, b)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))
    assert d == levenshtein(b, a)
    assert levenshtein(a, a) == 0


@settings(max_examples=200)
@given(text, text)
def test_partial_ratio_bounds(a, b):
    v = partial_ratio(a, b)
    assert 0 <= v <= 100
    if a and a in b:
        assert v == 100


@settings(max_examples=150)
@given(word, word)
def test_pj_score_bounds(a, b):
    pj, pj_perc, c_len = pj_score(a, b)
    assert 0.0 <= pj <= 1.0
    assert 0.0 <= pj_perc <= 1.0 + 1e-9
    assert c_len >= 0


@settings(max_examples=150)
@given(text)
def test_near_duplicate_reflexive(s):
    if s.strip():
        assert is_near_duplicate(s, s)


@settings(max_examples=100)
@given(text)
def test_simhash_deterministic_int64(s):
    v = simhash64_python(s)
    assert v == simhash64_python(s)
    assert -(1 << 63) <= v < (1 << 63)


@settings(max_examples=150)
@given(st.lists(word, min_size=1, max_size=5))
def test_common_stem_contained_or_fallback(names):
    stem = common_stem(names)
    assert (all(stem in n for n in names)) or stem == "_".join(names)


@settings(max_examples=150)
@given(st.lists(st.one_of(st.just(""), word), max_size=8), st.integers(0, 4))
def test_repair_headers_unique_and_padded(headers, extra):
    max_cells = len(headers) + extra
    out = repair_headers(list(headers), max_cells)
    assert len(out) == max_cells
    assert len(set(out)) == len(out)  # no duplicates after repair
    assert all(h for h in out)  # no empties


@settings(max_examples=300)
@given(
    st.integers(0, 50), st.integers(0, 50), st.integers(0, 50), st.integers(0, 50),
    st.integers(0, 50), st.integers(0, 50), st.integers(0, 50), st.integers(0, 50),
    st.integers(0, 4), st.booleans(), st.booleans(),
)
def test_decide_type_total_function(n, n_sent, n_fmt, n_int, n_dbl, n_bad_int, n_bad_dbl, n_not_bool, n_distinct, zf, ot):
    out = decide_type(n, n_sent, n_fmt, n_int, n_dbl, n_bad_int, n_bad_dbl, n_not_bool, n_distinct, zf, ot)
    assert out in {"boolean", "timestamp", "varchar", "double", "int"}


@settings(max_examples=300)
@given(text, text)
def test_near_dup_batch_equals_scalar(a, b):
    """The memoized batch twin must be bit-identical to the scalar
    predicate (both modes), and the predicate symmetric."""
    from knowledgegraphs_spark.functions.similarity import _near_dup_batch

    for strict in (False, True):
        scalar = is_near_duplicate(a, b, strict=strict)
        assert _near_dup_batch([a], [b], strict=strict) == [scalar]
        assert is_near_duplicate(b, a, strict=strict) == scalar


@settings(max_examples=200)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40))
def test_nd_process_invariants(s):
    """concat is the token join; noPunct preserves length; tokens contain
    no punctuation."""
    import string as _string

    from knowledgegraphs_spark.functions.similarity import nd_process

    no_punct, toks, concat = nd_process(s)
    assert len(no_punct) == len(s)
    assert concat == "".join(toks)
    assert not any(c in _string.punctuation for c in concat)
