"""Skew-defusing join helpers (SURVEY.md §4: head-entity skew).

Frequent mentions ("user", popular tools) make hot keys in the
mention→canonical and match joins. Strategy ladder:

1. broadcast the small side when it fits (vocabulary-sized dims);
2. otherwise salted join: the big side gets a deterministic salt from its
   row identity, the small side is exploded ×S — hot keys spread over S
   reducers; AQE skew-join splitting stays on as the backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the small side exploded
    across ``salt_buckets`` salts. ``salt_from`` are big-side columns whose
    hash spreads rows (deterministic — never rand(), which breaks retries
    and resume)."""
    salt_cols = salt_from or [key]
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    )
    s = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt_buckets)]))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def join_small_dim(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    broadcast_row_limit: int = 2_000_000,
    salt_buckets: int = 8,
    salt_from: list[str] | None = None,
    dim_count: int | None = None,
) -> DataFrame:
    """Broadcast when the dim is small, salted shuffle join otherwise."""
    n = dim_count if dim_count is not None else dim.count()
    if n <= broadcast_row_limit:
        return big.join(F.broadcast(dim), key, how)
    return salted_join(big, dim, key, salt_buckets, salt_from, how)
