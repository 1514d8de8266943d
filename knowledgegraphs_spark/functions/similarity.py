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
    longer (the published fuzzywuzzy partial-match algorithm)."""
    if not s1 or not s2:
        return 0
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    sm = SequenceMatcher(None, shorter, longer, autojunk=False)
    best = 0.0
    for i, j, _n in sm.get_matching_blocks():
        start = max(j - i, 0)
        window = longer[start : start + len(shorter)]
        r = SequenceMatcher(None, shorter, window, autojunk=False).ratio()
        if r > 0.995:
            return 100
        best = max(best, r)
    return int(round(100 * best))


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


def is_near_duplicate(a: str, b: str, strict: bool = True) -> bool:
    """Composite near-duplicate predicate (operator X10).

    same concat-of-tokens, or same token set, or
    (length diff < 15% and full ratio ≥ 95); non-strict additionally accepts
    partial token-sort ratio ≥ 85.
    """
    ta, tb = re.findall(r"\w+", a.lower()), re.findall(r"\w+", b.lower())
    if "".join(ta) == "".join(tb):
        return True
    if set(ta) == set(tb):
        return True
    ratio = int(round(100 * SequenceMatcher(None, a.lower(), b.lower(), autojunk=False).ratio()))
    if length_diff_pct(a, b) < 15 and ratio >= 95:
        return True
    if not strict and partial_ratio(token_sort(a), token_sort(b)) >= 85:
        return True
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


@F.pandas_udf(T.BooleanType())
def near_duplicate_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [is_near_duplicate(x or "", y or "", strict=False) for x, y in zip(a, b)]
    )
