"""PJ/BES scoring semantics — the FIXTURES.md §4 worked example
(reference ``mapping_prediction.py:343-356``) plus near-dup predicate cases."""

import pytest

from knowledgegraphs_spark.functions.similarity import (
    char_jaccard,
    edit_similarity,
    is_near_duplicate,
    length_diff_pct,
    partial_ratio,
    pj_score,
)

SRC = "contribution interest rate"
# (tgt, expected_pj, expected_clen, expected_dense_rank)
WORKED = [
    ("rate", 1.0, 1, 2),
    ("base rate", 0.5, 2, 3),
    ("interest rate", 1.0, 2, 1),
    ("some other with interest rate", 2 / 5, 5, 4),
    ("unsuitable candidate", 0.0, 2, None),
]


@pytest.mark.parametrize("tgt,exp_pj,exp_clen,_rank", WORKED)
def test_pj_worked_example(tgt, exp_pj, exp_clen, _rank):
    pj, pj_perc, c_len = pj_score(SRC, tgt)
    assert pj == pytest.approx(exp_pj)
    assert c_len == exp_clen
    assert 0.0 <= pj_perc <= 1.0
    if exp_pj == 1.0:
        assert pj_perc == pytest.approx(1.0)


def test_pj_dense_rank_semantics(spark):
    """W2: dense_rank over (PJ desc, cLen desc); zero-PJ → NULL (∞)."""
    from pyspark.sql import functions as F

    from knowledgegraphs_spark.operators.matching import rank_candidates

    rows = [(SRC, t) for t, *_ in WORKED]
    df = spark.createDataFrame(rows, "src string, tgt string")
    from knowledgegraphs_spark.functions.similarity import pj_score_udf

    scored = df.withColumn("p", pj_score_udf("src", "tgt")).select(
        "src", "tgt", F.lit(50.0).alias("bes"),
        F.col("p.pj").alias("pj"), F.col("p.pj_perc").alias("pj_perc"), F.col("p.c_len").alias("c_len"),
    )
    got = {r.tgt: r.pj_rank for r in rank_candidates(scored).collect()}
    for tgt, _pj, _cl, exp_rank in WORKED:
        assert got[tgt] == exp_rank, (tgt, got)


def test_partial_ratio_containment():
    assert partial_ratio("rate", SRC) == 100
    assert partial_ratio("interest", SRC) == 100
    assert partial_ratio("base", SRC) < 100


def test_edit_similarity():
    assert edit_similarity("abc", "abc") == 1.0
    assert edit_similarity("abc", "abd") == pytest.approx(2 / 3)


def test_char_jaccard_and_lendiff():
    assert char_jaccard("abc", "bcd") == pytest.approx(2 / 4)
    assert length_diff_pct("ab", "abcd") == pytest.approx(2 / 3 * 100)


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("John Smith", "J. Smith", True),        # partial token-sort ≥ 85
        ("Maria  Garcia", "Maria Garcia", True),  # same token concat
        ("john smith", "John Smith", True),       # case-insensitive concat
        ("ACME Corp.", "Acme Corp", True),        # same token set
        ("Acme Corporation", "Globex Industries", False),
        ("CAD", "KYC", False),
    ],
)
def test_near_duplicate_predicate(a, b, expected):
    assert is_near_duplicate(a, b, strict=False) is expected


# --- golden cases hand-derived from the reference's NearDuplicates.py -------
# process(): punctuation→spaces, lowercased \w+ tokens, concat; predicate and
# lenDiff/ratio run over concats, NOT raw strings (NearDuplicates.py:33-46).


def test_near_duplicate_reference_golden():
    # identical token concat through punctuation
    assert is_near_duplicate("U.S. Dollar", "USDollar", strict=False)
    assert is_near_duplicate("U.S. Dollar", "US Dollar", strict=False)
    # identical token SET, different order/concat
    assert is_near_duplicate("pressure blood", "blood pressure", strict=False)
    # ratio over CONCATS: 2·10/21 → 95 ≥ 95, although the raw strings differ
    # by 53 % in length (round-1 semantics returned False here)
    assert is_near_duplicate("a b c d e f g h i j", "abcdefghijk", strict=False)
    # strict: lenDiff over concats (9.5 < 15) and the same concat ratio
    assert is_near_duplicate("a b c d e f g h i j", "abcdefghijk", strict=True)
    # strict: concat lenDiff 50 ≥ 15 rejects before any ratio
    assert not is_near_duplicate("abcdef", "abcdefghij", strict=True)
    assert not is_near_duplicate("alpha beta", "gamma delta", strict=False)


def test_canonical_pick_reference_golden():
    from knowledgegraphs_spark.operators.canonicalize import canonical_pick

    # cLen ties at 8; noPunct whitespace counts 3/1/0 → the noPunct form of
    # "U.S. Dollar" ("U S  Dollar") wins on max whitespace
    assert canonical_pick(["US Dollar", "USDollar", "U.S. Dollar"]) == "U S  Dollar"
    # equal cLen → more whitespace wins ("ab cd" over "abcd")
    assert canonical_pick(["abcd", "ab cd"]) == "ab cd"
    # shorter CONCAT wins regardless of raw length; returned value is the
    # punctuation-stripped form
    assert canonical_pick(["a-b-c-d-e", "abcdEF"]) == "a b c d e"


# ---------------------------------------------------------------------------
# Jaro-Winkler: parity with DuckDB's independent native implementation
# ---------------------------------------------------------------------------


def test_jaro_winkler_matches_duckdb():
    import random

    import duckdb

    from knowledgegraphs_spark.functions.similarity import jaro, jaro_winkler

    rng = random.Random(7)
    alpha = "abcdef"
    cases = [
        ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
        ("duane", "dwayne"), ("abc", ""), ("", ""), ("a", "a"), ("abcd", "dcba"),
        ("crate", "trace"), ("xy", "yx"), ("aaa", "aaaa"), ("prefix", "prefixation"),
    ] + [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9))),
        )
        for _ in range(300)
    ]
    con = duckdb.connect()
    for a, b in cases:
        dj, djw = con.execute(
            "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)", [a, b, a, b]
        ).fetchone()
        assert abs(jaro(a, b) - dj) < 1e-9, (a, b, jaro(a, b), dj)
        assert abs(jaro_winkler(a, b) - djw) < 1e-9, (a, b, jaro_winkler(a, b), djw)
    con.close()


def test_jaro_winkler_udf_nulls_and_batch(spark):
    from pyspark.sql import functions as F

    from knowledgegraphs_spark.functions.similarity import jaro_winkler_udf

    df = spark.createDataFrame(
        [("martha", "marhta"), (None, "x"), ("x", None), ("same", "same")],
        "a string, b string",
    )
    got = [r[0] for r in df.select(F.round(jaro_winkler_udf("a", "b"), 6)).collect()]
    assert got == [0.961111, 0.0, 0.0, 1.0]
