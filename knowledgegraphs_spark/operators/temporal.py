"""Temporal KG: point-in-time snapshots and validity intervals.

The reference emits a static KG from a static database snapshot
(``KnowledgeGraphsJava`` ``RTC``/``Triples`` write the store once). A
transcript corpus is not static — assertions about an entity change turn
by turn — so the engine extends the triple model with assertion time:
``(subj, pred, obj, asserted_ts)``. Two derived views make that stream a
queryable temporal KG:

- ``asof_snapshot(triples, at)``: graph state at time ``at`` — for every
  ``(subj, pred)`` the most recent assertion with ``asserted_ts <= at``
  (latest-assertion-wins, the SCD-2 reconstruction). Deterministic ties:
  assertion order is ``(asserted_ts, tie_break)`` with an explicit
  tie-break column so two engines agree on simultaneous assertions.
- ``validity_intervals(triples)``: each assertion annotated with
  ``valid_from``/``valid_to`` (``valid_to`` = next assertion's timestamp
  for the same ``(subj, pred)``, NULL while still current) — the interval
  form range joins and audits consume.

Scale shape: both are ONE shuffle on ``(subj, pred)`` — a window
``row_number``/``lead`` partitioned by the key, no self-join, no
iteration. At 100 TB the key space is entity x predicate (bounded by the
catalog, far smaller than the assertion stream), AQE splits skewed hot
entities, and a store bucketed by ``subj`` makes the window
exchange-free. The snapshot filter ``asserted_ts <= at`` is pushed to
the scan (plain comparison on a parquet column, min/max pruned), so a
point-in-time query over years of history reads only files whose range
overlaps the cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_snapshot(
    triples: DataFrame,
    at,
    ts_col: str = "asserted_ts",
    tie_break: str | None = None,
) -> DataFrame:
    """Latest assertion per ``(subj, pred)`` at or before ``at``.

    ``at`` is a timestamp literal (string or datetime); ``tie_break``
    names a column that totally orders simultaneous assertions (defaults
    to ``obj`` so the result is deterministic even without an id).
    """
    tb = tie_break or "obj"
    w = (
        Window.partitionBy("subj", "pred")
        .orderBy(F.col(ts_col).desc(), F.col(tb).desc())
    )
    return (
        triples.filter(F.col(ts_col) <= F.lit(at))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def validity_intervals(
    triples: DataFrame,
    ts_col: str = "asserted_ts",
    tie_break: str | None = None,
) -> DataFrame:
    """Annotate each assertion with its validity interval.

    ``valid_from`` = its own timestamp; ``valid_to`` = the next
    assertion's timestamp for the same ``(subj, pred)`` (NULL = still
    current at end of stream). One window pass, same key as the
    snapshot."""
    tb = tie_break or "obj"
    w = (
        Window.partitionBy("subj", "pred")
        .orderBy(F.col(ts_col).asc(), F.col(tb).asc())
    )
    return triples.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )


def asof_join(
    facts: DataFrame,
    snapshot_times: DataFrame,
    ts_col: str = "asserted_ts",
    tie_break: str | None = None,
) -> DataFrame:
    """Many-timestamp as-of: for every row in ``snapshot_times``
    (columns ``snap_id``, ``at``) the graph state at that time — the
    interval form joined on containment, so N snapshots cost one range
    join over the interval table instead of N window passes."""
    iv = validity_intervals(facts, ts_col=ts_col, tie_break=tie_break)
    cond = (F.col("at") >= F.col("valid_from")) & (
        F.col("valid_to").isNull() | (F.col("at") < F.col("valid_to"))
    )
    return snapshot_times.join(iv, cond)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2 MERGE: apply a batch of updates
    to a versioned dimension, producing the new version history — the
    lakehouse ``MERGE INTO`` pattern ``validity_intervals`` reads back.

    ``dim`` carries ``(key_col, *attr_cols, valid_from, valid_to)`` with
    ``valid_to IS NULL`` marking current rows; ``updates`` carries
    ``(key_col, *attr_cols, ts_col)`` with AT MOST ONE row per key (the
    caller pre-reduces a batch to latest-per-key — a map-side-combinable
    ``max_by``; enforced here, not silently resolved). Semantics per
    update row:

    - key absent from the dimension → INSERT, ``valid_from = ts``;
    - current attrs differ → CLOSE the current row (``valid_to = ts``)
      and open a new version;
    - current attrs identical → no-op (no empty versions — re-asserting
      the same state must not grow history);
    - an update at ``ts <= valid_from`` of the current row is an
      out-of-order arrival and raises (SCD-2 is an append-only history;
      late data belongs in a reprocessing pass, not a silent rewrite).

    History rows (``valid_to IS NOT NULL``) pass through untouched.
    Scale shape: one latest-per-key validation aggregate and one
    key-keyed full-outer join — no windows over the dimension, no
    iteration; everything map-side combines before the single shuffle.
    """
    attrs = list(attr_cols)
    cur = dim.where(F.col("valid_to").isNull())
    hist = dim.where(F.col("valid_to").isNotNull())

    dup = updates.groupBy(key_col).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    if not dup.isEmpty():
        raise ValueError("scd2_merge: updates must have at most one row per key")

    u = updates.select(
        key_col,
        *[F.col(a).alias(f"__u_{a}") for a in attrs],
        F.col(ts_col).alias("__u_ts"),
    )
    j = cur.join(u, key_col, "full_outer")
    changed = F.col("__u_ts").isNotNull() & (
        F.col("valid_from").isNull()  # brand-new key
        | ~F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"__u_{a}") for a in attrs])
        )
    )
    late = j.where(
        F.col("__u_ts").isNotNull()
        & F.col("valid_from").isNotNull()
        & (F.col("__u_ts") <= F.col("valid_from"))
        & changed
    )
    if not late.isEmpty():
        raise ValueError("scd2_merge: out-of-order update at or before current valid_from")

    untouched_cur = j.where(~changed & F.col("valid_from").isNotNull()).select(
        key_col, *attrs, "valid_from", F.lit(None).cast("timestamp").alias("valid_to")
    )
    closed = j.where(changed & F.col("valid_from").isNotNull()).select(
        key_col, *attrs, "valid_from", F.col("__u_ts").alias("valid_to")
    )
    opened = j.where(changed).select(
        key_col,
        *[F.col(f"__u_{a}").alias(a) for a in attrs],
        F.col("__u_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return hist.select(key_col, *attrs, "valid_from", "valid_to").unionByName(
        untouched_cur
    ).unionByName(closed).unionByName(opened)
