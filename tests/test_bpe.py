"""BPE merge learning: greedy application semantics, Sennrich counting,
determinism under partitioning, and the vocab-scale segmentation path."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.bpe import (
    apply_merge,
    learn_bpe_merges,
    segment_vocab,
    word_vocab,
)


def test_apply_merge_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a", "a"],), (["a", "b", "a"],), (["x"],), ([],)],
        "syms array<string>",
    )
    out = [r[0] for r in df.select(apply_merge(F.col("syms"), "a", "a")).collect()]
    # overlapping pairs resolve greedily: aaaa -> [aa, aa], not [aa, a, a]
    assert out == [["aa", "aa"], ["a", "b", "a"], ["x"], []]


def test_apply_merge_fused_symbol_joins_next_comparison(spark):
    # after (a,b) fuses, "ab" is one symbol; a later (ab,c) merge sees it
    df = spark.createDataFrame([(["a", "b", "c"],)], "syms array<string>")
    step1 = df.select(apply_merge(F.col("syms"), "a", "b").alias("syms"))
    step2 = step1.select(apply_merge(F.col("syms"), "ab", "c").alias("syms"))
    assert step2.collect()[0][0] == ["abc"]


def test_learn_merges_small_corpus(spark):
    # classic Sennrich toy: 'low' x5, 'lowest' x2 -> first merges are l+o, lo+w
    docs = spark.createDataFrame(
        [("low low low low low",), ("lowest lowest",)], "text string"
    )
    merges = learn_bpe_merges(docs, n_merges=3).collect()
    assert [(m["lhs"], m["rhs"]) for m in merges[:2]] == [("l", "o"), ("lo", "w")]
    assert merges[0]["pair_count"] == 7  # every 'low'/'lowest' occurrence
    assert [m["rank"] for m in merges] == [0, 1, 2]


def test_learn_merges_exhausts_gracefully(spark):
    # single repeated 2-char word: only one merge is learnable
    docs = spark.createDataFrame([("ab ab ab",)], "text string")
    merges = learn_bpe_merges(docs, n_merges=10).collect()
    assert len(merges) == 1
    assert (merges[0]["lhs"], merges[0]["rhs"], merges[0]["pair_count"]) == ("a", "b", 3)


def test_learn_merges_partitioning_invariant(spark):
    rows = [(f"banana bandana {w}",) for w in ["anaconda", "banana", "cabana"] * 4]
    docs = spark.createDataFrame(rows, "text string")
    a = learn_bpe_merges(docs.coalesce(1), n_merges=5).collect()
    b = learn_bpe_merges(docs.repartition(7), n_merges=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_segment_vocab_token_counts(spark):
    docs = spark.createDataFrame([("low lower lowest",)], "text string")
    vocab = word_vocab(docs)
    seg = segment_vocab(vocab, [("l", "o"), ("lo", "w"), ("e", "r")])
    got = {r["word"]: (r["syms"], r["n_subtokens"]) for r in seg.collect()}
    assert got["low"] == (["low"], 1)
    assert got["lower"] == (["low", "er"], 2)
    assert got["lowest"] == (["low", "e", "s", "t"], 4)


def test_n_merges_validated(spark):
    docs = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe_merges(docs, n_merges=0)
