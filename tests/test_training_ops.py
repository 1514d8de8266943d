"""Training-data pipeline operators: the non-SQL-checkable paths —
SimHash vs pure-Python twin, LSH recall vs brute force, multimodal
plumbing, shingle/fingerprint sanity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_simhash_matches_python_twin(spark):
    from knowledgegraphs_spark.operators.dedup import simhash64_python, simhash64_udf

    texts = ["hello world foo", "hello world bar", "", "one two three four"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.sh for r in df.select(simhash64_udf("text").alias("sh")).collect()]
    assert got == [simhash64_python(t) for t in texts]


def test_simhash_similar_texts_close():
    from knowledgegraphs_spark.operators.dedup import simhash64_python

    a = simhash64_python("the quick brown fox jumps over the lazy dog")
    b = simhash64_python("the quick brown fox jumps over the lazy cat")
    c = simhash64_python("completely unrelated text about databases and spark")
    ham_ab = bin((a ^ b) & (2**64 - 1)).count("1")
    ham_ac = bin((a ^ c) & (2**64 - 1)).count("1")
    assert ham_ab < ham_ac


def test_lsh_recall_vs_brute_force(spark):
    from knowledgegraphs_spark.operators.simsearch import brute_force_topk, lsh_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, queries, k=5, n_bits=4, rotations=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall {recall:.2f} too low"


def test_embedding_near_duplicates_blocked_subset_of_exact(spark):
    from knowledgegraphs_spark.operators.simsearch import (
        brute_force_topk,
        embedding_near_duplicates,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    got = embedding_near_duplicates(emb, threshold=0.5, n_bits=4, rotations=3)
    rows = got.collect()
    for r in rows:
        assert r.cosine >= 0.5
        assert r.id_a < r.id_b


def test_multimodal_plumbing(spark):
    from knowledgegraphs_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_payload,
        extract_features,
        resize_stub,
        synthesize_media,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    media = synthesize_media(docs)
    assert media.schema["payload"].dataType.simpleString() == "binary"

    feats = extract_features(media, use_fake_codec=True).collect()
    assert len(feats) == 50
    for r in feats:
        assert len(r.features) == FEATURE_DIM
    # deterministic across runs
    feats2 = extract_features(media, use_fake_codec=True).collect()
    assert {r.media_id: r.features for r in feats} == {r.media_id: r.features for r in feats2}

    resized = resize_stub(media, 64, 64).select("meta.width", "meta.height").first()
    assert (resized.width, resized.height) == (64, 64)

    # the real codec path is an explicit stub
    with pytest.raises(NotImplementedError):
        decode_payload(b"xx", "image", use_fake_codec=False)


def test_text_analysis_sanity(spark):
    from knowledgegraphs_spark.operators.text_analysis import text_profile

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox is on the run"),
            (2, "der hund und die katze ist das"),
            (3, "!!! ??? ### $$$"),
            (4, ""),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in text_profile(df).collect()}
    assert rows[1].lang_id == "en"
    assert rows[2].lang_id == "de"
    assert rows[3].lang_id == "und"
    assert rows[3].punct_ratio > 0.5
    assert rows[1].quality > rows[3].quality
    assert rows[4].n_tokens == 0


def test_minhash_lsh_finds_planted_near_dups(spark):
    from knowledgegraphs_spark.operators.dedup import minhash_lsh_candidates, ngram_jaccard_pairs

    # 30 distinct words, one changed → shingle Jaccard ≈ 0.81; collision
    # verified deterministic for this fixture (md5 hash family is fixed)
    base = " ".join(f"w{i:02d}" for i in range(30))
    near = base.replace("w15", "w15x")
    far = " ".join(f"z{i:02d}" for i in range(30))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    lsh = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(df, k=16, bands=4).collect()}
    assert (1, 2) in lsh
    assert (1, 3) not in lsh
    jac = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(df, threshold=0.2).collect()}
    assert (1, 2) in jac and jac[(1, 2)] > 0.7
