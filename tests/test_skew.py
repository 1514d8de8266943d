"""Skew-defusing joins: salted join == plain join on skewed data; salt
actually spreads the hot key; strategy switch in join_small_dim."""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.skew import join_small_dim, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of big-side rows hit one hot key
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("key"),
        F.col("id").alias("row_id"),
    )
    dim = spark.createDataFrame(
        [("hot", "HOT")] + [(f"k{i}", f"V{i}") for i in range(50)], "key: string, val: string"
    )
    return big, dim


def test_salted_join_equals_plain_join(spark, skewed):
    big, dim = skewed
    plain = {(r.row_id, r.val) for r in big.join(dim, "key").collect()}
    salted = {
        (r.row_id, r.val)
        for r in salted_join(big, dim, "key", salt_buckets=8, salt_from=["row_id"]).collect()
    }
    assert salted == plain and len(plain) == 2000


def test_salt_spreads_hot_key(spark, skewed):
    big, _ = skewed
    salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64("row_id"), F.lit(8))
    )
    per_bucket = (
        salted.filter(F.col("key") == "hot").groupBy("__salt").count().collect()
    )
    # the 1800 hot rows land in all 8 salt buckets, none dominating
    assert len(per_bucket) == 8
    assert max(r["count"] for r in per_bucket) < 1800 * 0.5


def test_salted_join_deterministic(spark, skewed):
    big, dim = skewed
    a = salted_join(big, dim, "key", salt_from=["row_id"]).orderBy("row_id").collect()
    b = salted_join(big.repartition(7), dim, "key", salt_from=["row_id"]).orderBy("row_id").collect()
    assert a == b  # salt from row identity, not partition/rand


def test_join_small_dim_strategy_switch(spark, skewed):
    big, dim = skewed
    # tiny dim → broadcast plan
    bplan = join_small_dim(big, dim, "key")._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in bplan
    # force the salted path with a 0 row limit; results still identical
    forced = join_small_dim(big, dim, "key", broadcast_row_limit=0, salt_from=["row_id"])
    assert forced.count() == 2000


# ---------------------------------------------------------------------------
# interval_point_join: bucketized non-equi range join
# ---------------------------------------------------------------------------


def test_interval_point_join_matches_naive(spark):
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from knowledgegraphs_spark.operators.ranges import interval_point_join

    d = dt.date
    ivals = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), d(2024, 1, 10)),
            (2, d(2024, 1, 5), d(2024, 2, 20)),   # spans many buckets
            (3, d(2024, 3, 1), d(2024, 3, 1)),    # single-day interval
            (4, d(2024, 4, 2), d(2024, 4, 1)),    # empty (end < start) -> dropped
        ],
        "iid int, t_start date, t_end date",
    )
    pts = spark.createDataFrame(
        [(10, d(2024, 1, 1)), (11, d(2024, 1, 10)), (12, d(2024, 2, 20)),
         (13, d(2024, 3, 1)), (14, d(2024, 4, 1)), (15, d(2023, 12, 31))],
        "pid int, t date",
    )
    for bucket_days in (1, 7, 30):
        got = sorted(
            (r["iid"], r["pid"])
            for r in interval_point_join(ivals, pts, "t_start", "t_end", "t", bucket_days).collect()
        )
        # naive reference: inclusive containment, empty interval excluded
        assert got == sorted([
            (1, 10), (1, 11), (2, 11), (2, 12), (3, 13),
        ]), bucket_days
    # no dedup needed: each matched pair appears exactly once even when
    # the interval spans many buckets (checked implicitly by equality)
    with pytest.raises(ValueError, match="bucket_days"):
        interval_point_join(ivals, pts, "t_start", "t_end", "t", 0)


def test_interval_point_join_plans_hash_join(spark):
    """The whole point: the bucketized form must plan as an equi hash
    join, never a nested loop or cartesian."""
    import datetime as dt

    from knowledgegraphs_spark.operators.ranges import interval_point_join

    d = dt.date
    ivals = spark.createDataFrame(
        [(i, d(2024, 1, 1 + i % 20), d(2024, 2, 1)) for i in range(100)],
        "iid int, t_start date, t_end date",
    )
    pts = spark.createDataFrame(
        [(i, d(2024, 1, 1 + i % 28)) for i in range(200)], "pid int, t date"
    )
    plan = (
        interval_point_join(ivals, pts, "t_start", "t_end", "t")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
