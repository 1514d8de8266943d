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
