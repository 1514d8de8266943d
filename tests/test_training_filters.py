"""Corpus-curation operators: quality filter, exact stratified sampling
(including the prune-shortfall retry path), benchmark decontamination.

Value-level parity with DuckDB is pinned by test_entry.py (t4/t5/t6);
these tests pin the semantics the oracle can't see: rule attribution
order, the prune-validation loop actually repairing an under-selecting
threshold, and the plan shapes (filter is shuffle-free, benchmark side
broadcasts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.training_filters import (
    QUALITY_RULES,
    decontaminate,
    quality_filter,
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = "the quick brown fox jumps over the lazy dog and runs to the hills again"


def test_quality_filter_rule_attribution(spark):
    rows = [
        (0, GOOD),                                   # passes everything
        (1, "too short"),                            # len (2 tokens)
        (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((()))"),  # len ok? 8 toks≥5 → symbol
        (3, "the of to " + "supercalifragilisticexpialidocious " * 10),  # word_len
        (4, "wordone wordtwo wordthree wordfour wordfive wordsix"),      # stopword
        (5, "the cat the cat the cat the cat the cat the cat"),          # repetition
    ]
    out = {r["doc_id"]: r for r in quality_filter(_docs(spark, rows)).collect()}
    assert out[0]["keep"] and out[0]["reject_reason"] is None
    assert not out[1]["keep"] and out[1]["reject_reason"] == "len"
    assert out[2]["reject_reason"] == "symbol"
    assert out[3]["reject_reason"] == "word_len"
    assert out[4]["reject_reason"] == "stopword"
    # doc 5: stopword passes ('the' x6), bigrams are 2 distinct of 11
    assert out[5]["reject_reason"] == "repetition"
    # reason is always the FIRST failing rule in declared order
    for r in out.values():
        failing = [n for n in QUALITY_RULES if not r[f"r_{n}"]]
        assert r["reject_reason"] == (failing[0] if failing else None)


def test_quality_filter_is_shuffle_free(spark):
    df = quality_filter(_docs(spark, [(0, GOOD)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def _naive_sample(spark, docs, quotas):
    """The textbook form: full rank window, no prune."""
    from pyspark.sql import Window as W

    base = docs.select(
        F.col("doc_id").alias("id"),
        F.col("stratum"),
        F.md5(F.col("doc_id").cast("string")).alias("u"),
    ).filter(F.col("stratum").isin(list(quotas)))
    w = W.partitionBy("stratum").orderBy("u", "id")
    ranked = base.withColumn("sample_rank", F.row_number().over(w))
    qc = F.lit(None).cast("long")
    for s, q in quotas.items():
        qc = F.when(F.col("stratum") == s, F.lit(q)).otherwise(qc)
    return ranked.filter(F.col("sample_rank") <= qc).select("id", "stratum", "sample_rank")


def test_stratified_sample_matches_naive_window(spark):
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("stratum"),
    )
    quotas = {"s0": 10, "s1": 3, "s2": 100, "s3": 250}  # s2/s3 over-count (100 rows each)
    got = sorted(map(tuple, stratified_sample(docs, quotas, stratum_col="stratum").collect()))
    want = sorted(map(tuple, _naive_sample(spark, docs, quotas).collect()))
    assert got == want
    per = {}
    for _, s, _r in got:
        per[s] = per.get(s, 0) + 1
    assert per == {"s0": 10, "s1": 3, "s2": 100, "s3": 100}


def test_stratified_sample_prune_shortfall_retries_to_exact(spark):
    """A deliberately starved margin under-selects on the first prune;
    the validation loop must double it until the result is exact."""
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("stratum")
    )
    quotas = {"only": 50}
    got = sorted(map(tuple, stratified_sample(docs, quotas, stratum_col="stratum", margin=0.01).collect()))
    want = sorted(map(tuple, _naive_sample(spark, docs, quotas).collect()))
    assert got == want and len(got) == 50


def test_decontaminate_counts_distinct_shared_shingles(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            # contains the benchmark 5-gram "alpha beta gamma delta epsilon"
            (0, "intro words alpha beta gamma delta epsilon zeta closing"),
            (1, "completely different text with no overlap at all here"),
            (2, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon"),  # repeats → still distinct count
        ],
    )
    out = {r["id"]: r for r in decontaminate(train, bench, n=5).collect()}
    assert out[0]["contaminated"] and out[0]["n_overlap"] >= 2  # two eval shingles hit
    assert not out[1]["contaminated"] and out[1]["n_overlap"] == 0
    # doc 2 repeats the same shingles — array_distinct keeps the count at
    # the number of DISTINCT shared shingles, not occurrences
    assert out[2]["n_overlap"] == len(
        {
            "alpha beta gamma delta epsilon",
            "beta gamma delta epsilon alpha",
            "gamma delta epsilon alpha beta",
            "delta epsilon alpha beta gamma",
            "epsilon alpha beta gamma delta",
        }
        & {
            "alpha beta gamma delta epsilon",
            "beta gamma delta epsilon zeta",
        }
    )


def test_decontaminate_broadcasts_benchmark_side(spark):
    bench = _docs(spark, [(100, GOOD)])
    train = _docs(spark, [(0, GOOD), (1, "nothing shared")])
    plan = decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# mixture upsampling
# ---------------------------------------------------------------------------


def _mix_docs(spark, n_per=40, sources=("a", "b", "c")):
    rows = [(i * len(sources) + j, s) for i in range(n_per) for j, s in enumerate(sources)]
    rows = [(i, s) for (i, s) in rows]
    return spark.createDataFrame(
        [(int(i), s) for i, s in rows], "doc_id long, source string"
    )


def test_mixture_multiplicity_floor_or_ceil_and_expectation(spark):
    from knowledgegraphs_spark.operators.training_filters import mixture_upsample

    docs = _mix_docs(spark, n_per=64)
    out = mixture_upsample(docs, {"a": 2.5, "b": 1.0, "c": 0.25}).collect()
    per_id = {}
    for r in out:
        per_id.setdefault((r.id, r.stratum), []).append(r.epoch)
    # every materialized id's copy count is floor(w) or ceil(w), epochs 0..n-1
    for (i, s), eps in per_id.items():
        w = {"a": 2.5, "b": 1.0, "c": 0.25}[s]
        assert len(eps) in (int(w), int(w) + (1 if w != int(w) else 0))
        assert sorted(eps) == list(range(len(eps)))
    # integer weight: exactly w copies for EVERY row of the stratum
    b_ids = [k for k in per_id if k[1] == "b"]
    assert len(b_ids) == 64 and all(len(per_id[k]) == 1 for k in b_ids)
    # fractional strata land near the expectation (md5 is uniform; 64 rows,
    # generous tolerance — determinism is pinned by the repeat-run test)
    n_a = sum(len(v) for k, v in per_id.items() if k[1] == "a")
    n_c = sum(len(v) for k, v in per_id.items() if k[1] == "c")
    assert 64 * 2 <= n_a <= 64 * 3
    assert 0 < n_c < 64


def test_mixture_deterministic_and_stratum_independent(spark):
    from knowledgegraphs_spark.operators.training_filters import mixture_upsample

    docs = _mix_docs(spark, n_per=32)
    a = sorted(map(tuple, mixture_upsample(docs, {"a": 1.5, "b": 0.5}).collect()))
    b = sorted(map(tuple, mixture_upsample(docs.repartition(13), {"a": 1.5, "b": 0.5}).collect()))
    assert a == b  # partitioning-independent
    # the extra-epoch choice depends on the id only: the same ids moved to
    # another stratum with the same weight get the same verdicts
    b_rows = docs.filter(F.col("source") == "b")
    moved = b_rows.withColumn("source", F.lit("a"))
    am = {r.id for r in mixture_upsample(moved, {"a": 1.5}).collect() if r.epoch == 1}
    bw = {r.id for r in mixture_upsample(b_rows, {"b": 1.5}).collect() if r.epoch == 1}
    assert am == bw


def test_mixture_drops_unlisted_strata_and_zero_weight_rows(spark):
    from knowledgegraphs_spark.operators.training_filters import mixture_upsample

    docs = _mix_docs(spark, n_per=16)
    out = mixture_upsample(docs, {"a": 0.5}).collect()
    assert {r.stratum for r in out} == {"a"}
    # weight 0.5 → SOME rows absent entirely (n=0 guard exercised), the
    # rest exactly once
    assert 0 < len(out) < 16
    assert all(r.epoch == 0 for r in out)


def test_mixture_rejects_negative_weight(spark):
    import pytest as _pytest

    from knowledgegraphs_spark.operators.training_filters import mixture_upsample

    docs = _mix_docs(spark, n_per=4)
    with _pytest.raises(ValueError):
        mixture_upsample(docs, {"a": -0.5})


def test_mixture_is_shuffle_free(spark):
    from knowledgegraphs_spark.operators.training_filters import mixture_upsample

    docs = _mix_docs(spark, n_per=8)
    plan = mixture_upsample(docs, {"a": 2.5, "b": 1.0})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
