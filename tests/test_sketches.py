"""HyperLogLog sketch (operators/sketches.py): registers equal the
independent XXH64-twin bit-for-bit, sketches merge as a semilattice
(partition-and-merge == global — THE property that makes it a sketch),
and the estimator lands within the published error bound."""

import math
import random

from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.sketches import (
    hll_estimate,
    hll_estimate_py,
    hll_merge,
    hll_registers,
    hll_registers_py,
)


def _values(n: int, seed: int = 3) -> list[str]:
    rng = random.Random(seed)
    return [f"v{rng.randrange(10 ** 9)}_{i}" for i in range(n)]


def test_registers_equal_python_twin(spark):
    vals = _values(500) + ["dup"] * 50 + [None]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.bucket: r.max_rank for r in hll_registers(df, "s", p=6).collect()}
    assert got == hll_registers_py([v for v in vals if v is not None], p=6)


def test_merge_of_partition_sketches_equals_global(spark):
    vals = _values(2000, seed=9)
    half = len(vals) // 2
    a = spark.createDataFrame([(v,) for v in vals[:half]], "s string")
    b = spark.createDataFrame([(v,) for v in vals[half:]], "s string")
    both = spark.createDataFrame([(v,) for v in vals], "s string")
    merged = {
        r.bucket: r.max_rank
        for r in hll_merge(hll_registers(a, "s", 8), hll_registers(b, "s", 8)).collect()
    }
    direct = {r.bucket: r.max_rank for r in hll_registers(both, "s", 8).collect()}
    assert merged == direct


def test_estimate_within_error_bound_and_equals_twin(spark):
    vals = _values(8000, seed=1)
    exact = len(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    p = 10
    regs = hll_registers(df, "s", p)
    est = hll_estimate(regs, p).first()["estimate"]
    # stderr = 1.04/sqrt(m) ≈ 3.25% at p=10; 4 sigma is a stable gate
    assert abs(est - exact) / exact < 4 * 1.04 / math.sqrt(1 << p)
    assert est == hll_estimate_py(hll_registers_py(vals, p), p)


def test_small_range_linear_counting(spark):
    # 20 distincts at p=8: most registers empty -> linear-counting branch
    df = spark.createDataFrame([(f"x{i}",) for i in range(20)], "s string")
    est = hll_estimate(hll_registers(df, "s", 8), 8).first()["estimate"]
    assert abs(est - 20) < 3


def test_duplicate_insensitive(spark):
    ones = spark.createDataFrame([("a",), ("b",)], "s string")
    manys = spark.createDataFrame([("a",)] * 500 + [("b",)] * 300, "s string")
    r1 = {r.bucket: r.max_rank for r in hll_registers(ones, "s", 6).collect()}
    r2 = {r.bucket: r.max_rank for r in hll_registers(manys, "s", 6).collect()}
    assert r1 == r2


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cm_never_underestimates_both_families(spark):
    """The Count-Min contract: est >= true for EVERY queried value, in
    both hash families, and exact (overcount 0) when width >> distincts."""
    from knowledgegraphs_spark.operators.sketches import cm_estimate, cm_registers
    from pyspark.sql import functions as F

    rows = [(f"tok{i % 37}",) for i in range(2000)]  # Zipf-free but skewed mod
    df = spark.createDataFrame(rows, "tok string")
    true = {r.tok: r.c for r in df.groupBy("tok").agg(F.count("*").alias("c")).collect()}
    probes = df.select("tok").distinct()
    for family in ("md5", "xxhash64"):
        # narrow sketch: collisions expected, never an underestimate
        regs = cm_registers(df, "tok", depth=4, width=16, family=family)
        est = {r.tok: r.est_cnt for r in cm_estimate(regs, probes, depth=4, width=16, family=family).collect()}
        assert all(est[t] >= c for t, c in true.items()), family
        # wide sketch: 37 distincts in 4x2048 counters -> exact w.h.p.
        regs2 = cm_registers(df, "tok", depth=4, width=2048, family=family)
        est2 = {r.tok: r.est_cnt for r in cm_estimate(regs2, probes, depth=4, width=2048, family=family).collect()}
        assert est2 == true, family


def test_cm_merge_equals_build_on_union(spark):
    """Mergeability — the property that makes the sketch shippable
    across jobs: summing two partial register relations must equal the
    registers built over the concatenated input."""
    from knowledgegraphs_spark.operators.sketches import cm_merge, cm_registers

    a = spark.createDataFrame([(f"a{i % 11}",) for i in range(500)], "tok string")
    b = spark.createDataFrame([(f"a{i % 7}",) for i in range(300)], "tok string")
    merged = {
        (r.d, r.bucket): r.cnt
        for r in cm_merge(
            cm_registers(a, "tok", 4, 64), cm_registers(b, "tok", 4, 64)
        ).collect()
    }
    whole = {
        (r.d, r.bucket): r.cnt
        for r in cm_registers(a.unionByName(b), "tok", 4, 64).collect()
    }
    assert merged == whole


def test_cm_xxhash64_family_matches_python_twin(spark):
    """The production family's bucket placement equals the independent
    pure-Python XXH64 twin (same salt convention as MinHash: the depth
    literal is hashed ahead of the value)."""
    from knowledgegraphs_spark.functions.xxh64_twin import spark_xxhash64_twin
    from knowledgegraphs_spark.operators.sketches import _cm_bucket
    from pyspark.sql import functions as F

    texts = ["alpha", "beta", "unicode café", "x" * 40, ""]
    df = spark.createDataFrame([(t,) for t in texts], "tok string")
    width = 512
    for d in range(3):
        got = {
            r.tok: r.b
            for r in df.select(
                "tok",
                _cm_bucket(F.lit(d), F.col("tok"), width, "xxhash64").alias("b"),
            ).collect()
        }
        for t in texts:
            h = spark_xxhash64_twin(d, t)
            # F.pmod on the SIGNED 64-bit value; twin returns unsigned
            signed = h - (1 << 64) if h >= (1 << 63) else h
            assert got[t] == signed % width, (d, t)


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hist_quantiles_bounded_rank_error_and_merge(spark):
    """a11: estimates land within one bucket-width of the exact
    quantiles on a known distribution; merge == build-on-union; the
    clamp bucket absorbs overflow values."""
    from knowledgegraphs_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_registers,
    )

    # values 0..999 uniformly: exact p50=499.5, p90=899.1
    df = spark.createDataFrame([(i,) for i in range(1000)], "v long")
    regs = hist_registers(df, "v", step=50, nbuckets=32)
    est = {r.q: r.est for r in hist_quantiles(regs, qs=(0.5, 0.9), step=50).collect()}
    assert abs(est[0.5] - 500.0) <= 50 and abs(est[0.9] - 900.0) <= 50, est

    a = spark.createDataFrame([(i,) for i in range(0, 500)], "v long")
    b = spark.createDataFrame([(i,) for i in range(500, 1000)], "v long")
    merged = {
        (r.bucket, r.cnt)
        for r in hist_merge(
            hist_registers(a, "v", 50, 32), hist_registers(b, "v", 50, 32)
        ).collect()
    }
    whole = {(r.bucket, r.cnt) for r in regs.collect()}
    assert merged == whole

    # clamp: values beyond step*nbuckets all land in the last bucket
    big = spark.createDataFrame([(10_000,), (99_999,)], "v long")
    clamped = hist_registers(big, "v", step=50, nbuckets=32).collect()
    assert [(r.bucket, r.cnt) for r in clamped] == [(31, 2)]
