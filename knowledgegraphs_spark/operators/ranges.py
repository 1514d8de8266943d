"""Non-equi range joins, bucketized: the scalable point-in-interval join.

Spark executes a bare ``point BETWEEN start AND end`` join with no equi
key as a broadcast-nested-loop (small side) or cartesian (neither side
small) — both banned shapes at corpus scale. The standard fix is
BUCKETIZATION: quantize time into fixed-width buckets, explode each
interval into the buckets it overlaps, map each point to its single
bucket, hash-join on the bucket id, and re-check the exact predicate.
The join becomes an equi-join whose cost is ``Σ interval_width/bucket``
rows — tunable, partitionable, AQE-skew-splittable.

Point-in-interval has a property worth pinning: a (interval, point)
pair can match in exactly ONE bucket (the point's), so the bucketized
join needs NO post-dedup — unlike interval-interval overlap joins,
where a pair can co-occur in many buckets.

Granularity trade: small buckets → more explode rows per interval;
large buckets → more false candidates filtered by the exact predicate.
Pick bucket width ≈ median interval width (the classic rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["interval_point_join"]


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Inner-join every ``points`` row to every ``intervals`` row whose
    ``[start_col, end_col]`` (dates, inclusive) contains ``point_col``.
    Returns the combined columns. Shape: one explode of
    ``width/bucket_days`` buckets per interval, one hash join on the
    bucket id, one exact ``BETWEEN`` filter — no nested loop, no
    cartesian, no dedup (see module docstring)."""
    if bucket_days < 1:
        raise ValueError(f"interval_point_join: bucket_days must be >= 1, got {bucket_days}")
    epoch = F.lit("1970-01-01").cast("date")
    # end < start is an empty interval and is dropped — also guards the
    # Spark sequence(a, b) trap where b < a generates a DESCENDING list
    intervals = intervals.where(F.col(end_col) >= F.col(start_col))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.datediff(F.col(start_col), epoch) / bucket_days),
                F.floor(F.datediff(F.col(end_col), epoch) / bucket_days),
            )
        ),
    )
    pb = points.withColumn(
        "__bucket", F.floor(F.datediff(F.col(point_col), epoch) / bucket_days)
    )
    return (
        ib.join(pb, "__bucket")
        .where(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bucket")
    )
