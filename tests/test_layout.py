"""Z-order layout: Morton code arithmetic and the range-partitioned
curve-segment property the file pruning story rests on."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.layout import zorder_code, zorder_layout


def test_zorder_code_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 5)], "x int, y int"
    )
    got = [
        r[0]
        for r in df.select(zorder_code([F.col("x"), F.col("y")], bits=4)).collect()
    ]
    # interleave: x bits at even positions, y bits at odd
    def morton(x, y):
        out = 0
        for i in range(4):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    assert got == [morton(x, y) for x, y in [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 5)]]
    assert got[1] == 1 and got[2] == 2 and got[3] == 3 and got[4] == 4


def test_zorder_code_validation(spark):
    with pytest.raises(ValueError, match="overflows"):
        zorder_code([F.lit(1), F.lit(2), F.lit(3)], bits=21)
    with pytest.raises(ValueError, match="at least one"):
        zorder_code([])


def test_zorder_layout_partitions_cover_disjoint_code_ranges(spark):
    rows = [(i % 50, (i * 7) % 50) for i in range(400)]
    df = spark.createDataFrame(rows, "x int, y int")
    laid = zorder_layout(df, ["x", "y"], n_files=4, bits=6)
    # re-derive the code per physical partition; ranges must not overlap
    with_pid = laid.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__z", zorder_code([F.col("x"), F.col("y")], bits=6)
    )
    bounds = {
        r["__pid"]: (r["lo"], r["hi"])
        for r in with_pid.groupBy("__pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .collect()
    }
    spans = sorted(bounds.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint, ordered curve segments
    # nothing lost
    assert laid.count() == 400
