"""BPE merge learning: greedy application semantics, Sennrich counting,
determinism under partitioning, and the vocab-scale segmentation path."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.bpe import (
    apply_merge,
    learn_bpe_merges,
    segment_vocab,
    train_bpe,
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
    with pytest.raises(ValueError, match="batch_size"):
        learn_bpe_merges(docs, n_merges=1, batch_size=0)


def _disjoint_corpus(spark):
    """12 two-char words over 24 distinct letters, strictly decreasing
    counts. Every word fully fuses in one merge, so no merge ever
    creates a new adjacency: batched disjoint greedy is PROVABLY equal
    to sequential greedy here (the guarantee the batching docstring
    states)."""
    letters = "abcdefghijklmnopqrstuvwx"
    words = [letters[2 * i] + letters[2 * i + 1] for i in range(12)]
    rows = [(" ".join([w] * (40 - 3 * i)),) for i, w in enumerate(words)]
    return spark.createDataFrame(rows, "text string")


def test_batched_equals_sequential_on_disjoint_corpus(spark):
    docs = _disjoint_corpus(spark)
    seq_df, _, seq_rounds = train_bpe(docs, n_merges=12, batch_size=1)
    bat_df, _, bat_rounds = train_bpe(docs, n_merges=12, batch_size=12)
    seq = [tuple(r) for r in seq_df.orderBy("rank").collect()]
    bat = [tuple(r) for r in bat_df.orderBy("rank").collect()]
    assert seq == bat and len(seq) == 12
    assert seq_rounds == 12 and bat_rounds == 1  # 12x fewer driver rounds
    # counts strictly decreasing by construction -> learning order pinned
    counts = [m[3] for m in seq]
    assert counts == sorted(counts, reverse=True)


def test_batched_round_reduction_at_vocabulary_scale(spark):
    """The perf contract: a vocabulary-scale merge run commits >= 10x
    fewer count->argmax->fold rounds when batched. Corpus is a
    deterministic pseudo-random word soup rich enough for 300 merges."""
    import hashlib

    def w(i):
        h = hashlib.md5(f"word{i}".encode()).hexdigest()
        return "".join(chr(ord("a") + int(c, 16) % 26) for c in h[:10])

    rows = [(" ".join(w(i * 37 + j) for j in range(20)),) for i in range(200)]
    docs = spark.createDataFrame(rows, "text string")
    merges_df, vocab, rounds = train_bpe(docs, n_merges=400, batch_size=64)
    merges = merges_df.orderBy("rank").collect()
    assert len(merges) == 400
    # >= 10x fewer rounds than the 400 sequential ones (early rounds are
    # disjointness-limited by the 26-char initial alphabet, later rounds
    # commit up to the full batch)
    assert rounds <= 40
    assert [m["rank"] for m in merges] == list(range(400))
    # the returned vocab IS the segmented table under exactly these merges
    reseg = segment_vocab(word_vocab(docs), [(m["lhs"], m["rhs"]) for m in merges])
    a = {r["word"]: r["syms"] for r in vocab.collect()}
    b = {r["word"]: r["syms"] for r in reseg.collect()}
    assert a == b


def test_train_bpe_vocab_matches_segment_vocab(spark):
    docs = spark.createDataFrame(
        [("low low low low low",), ("lowest lowest",)], "text string"
    )
    merges_df, vocab, _ = train_bpe(docs, n_merges=3, batch_size=1)
    merges = [(m["lhs"], m["rhs"]) for m in merges_df.orderBy("rank").collect()]
    reseg = segment_vocab(word_vocab(docs), merges)
    assert {tuple(r) for r in vocab.select("word", "n_subtokens").collect()} == {
        tuple(r) for r in reseg.select("word", "n_subtokens").collect()
    }
