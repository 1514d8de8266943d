"""X5 exact mapper, G6/J7 mapping extension, F9 veto filtering, M4 context
score, S15 message framing."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.refinement import (
    context_scores,
    exact_match_scores,
    filter_mappings,
    first_round_filter,
    mapping_extension,
    second_round_filter,
)
from knowledgegraphs_spark.sinks.kafka import kafka_messages


def test_exact_match_scores(spark):
    src = spark.createDataFrame(
        [("s1", "Patient Age"), ("s1", "age"), ("s2", "weight")],
        "element: string, annotation: string",
    )
    tgt = spark.createDataFrame(
        [("t1", "AGE"), ("t2", "Age"), ("t3", "height")],
        "element: string, annotation: string",
    )
    nd = spark.createDataFrame([("t1",)], "element: string")
    out = {r.src: (r.tgt, r.score) for r in exact_match_scores(src, tgt, nd).collect()}
    # t2 scores 1.0 (full dom+ran), t1 only 0.5 → best is t2
    assert out["s1"] == ("t2", 1.0)
    assert "s2" not in out  # no shared annotation


def test_exact_match_demotion(spark):
    src = spark.createDataFrame([("s1", "age")], "element: string, annotation: string")
    tgt = spark.createDataFrame([("t1", "age")], "element: string, annotation: string")
    nd = spark.createDataFrame([("t1",)], "element: string")
    out = exact_match_scores(src, tgt, nd).collect()
    assert out[0].score == 0.5


@pytest.fixture(scope="module")
def tree_edges(spark):
    # binary tree over 2..15: parent(n) = n // 2
    return spark.createDataFrame(
        [(str(n), str(n // 2)) for n in range(2, 16)], "child: string, parent: string"
    )


def test_mapping_extension(spark, tree_edges):
    score = lambda s, t: F.when(s == t, 1.0).otherwise(0.0)  # noqa: E731
    seeds = spark.createDataFrame([("4", "4")], "src: string, tgt: string")
    out = {(r.src, r.tgt) for r in
           mapping_extension(seeds, tree_edges, tree_edges, score, kappa=0.9).collect()}
    # identity pairs propagate up (2, 1) and down (8,9) from (4,4)
    assert ("2", "2") in out and ("1", "1") in out
    assert ("8", "8") in out and ("9", "9") in out
    # cross pairs all score 0 < κ → excluded
    assert not any(s != t for s, t in out)


def test_mapping_extension_max_iter(spark, tree_edges):
    score = lambda s, t: F.when(s == t, 1.0).otherwise(0.0)  # noqa: E731
    seeds = spark.createDataFrame([("8", "8")], "src: string, tgt: string")
    out = {(r.src, r.tgt) for r in
           mapping_extension(seeds, tree_edges, tree_edges, score, kappa=0.9, max_iter=1).collect()}
    assert ("4", "4") in out
    assert ("2", "2") not in out  # needs a second hop


def test_filter_mappings(spark):
    df = spark.createDataFrame([("a", "b", 0.9996), ("c", "d", 0.99)], "src: string, tgt: string, score: double")
    assert [r.src for r in filter_mappings(df).collect()] == ["a"]


@pytest.fixture(scope="module")
def veto_cands(spark):
    rows = [
        # header, abbrev, ff, score, global, single?
        ("h1", "LAD", "left anterior descending", 0.95, 0.9, True),
        ("h1", "LAD", "language acquisition device", 0.84, 0.84, True),  # survives r1, vetoed in r2
        ("h2", "LAD", "language acquisition device", 0.9, 0.84, False),  # removed via shared veto
        ("h3", "BP", "blood pressure", 0.84, 0.83, True),                # vetoed in r2
        ("h4", "XX", "bad both", 0.5, 0.5, True),                        # dropped in r1
    ]
    return spark.createDataFrame(
        rows,
        "header: string, abbrev: string, ff: string, score: double, global_score: double, is_single_abbrev: boolean",
    )


def test_first_round_filter(spark, veto_cands):
    out = first_round_filter(veto_cands, thrs=0.82)
    kept = {(r.header, r.ff) for r in out.collect()}
    assert ("h4", "bad both") not in kept
    # low score but high global survives round 1
    assert ("h1", "language acquisition device") in kept


def test_second_round_filter_propagates_veto(spark, veto_cands):
    out = second_round_filter(first_round_filter(veto_cands, 0.82), thrs=0.85)
    kept = {(r.header, r.ff) for r in out.collect()}
    assert ("h1", "left anterior descending") in kept
    # vetoed pair removed for BOTH h1 (single) and h2 (sharing the abbrev)
    assert ("h1", "language acquisition device") not in kept
    assert ("h2", "language acquisition device") not in kept
    # blood pressure: score<thrs but global 0.6<thrs → vetoed too
    assert ("h3", "blood pressure") not in kept


def test_context_scores(spark):
    rows = [
        ("c1", "a", [1.0, 0.0]),
        ("c1", "b", [1.0, 0.0]),
        ("c1", "c", [0.0, 1.0]),
        ("c2", "d", [1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "ctx: string, element: string, embedding: array<double>")
    out = {r.element: r.mean_ctx_score for r in context_scores(df).collect()}
    assert out["a"] == pytest.approx(0.5)  # cos(b)=1, cos(c)=0
    assert out["c"] == pytest.approx(0.0)
    assert "d" not in out  # no peers in its context


def test_kafka_messages(spark):
    df = spark.createDataFrame([(1, "x")], "id: int, v: string")
    msg = kafka_messages(df, key_col="id").collect()[0]
    assert msg.key == "1" and '"v":"x"' in msg.value
