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
