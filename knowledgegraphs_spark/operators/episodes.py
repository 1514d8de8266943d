"""Per-conversation episode segmentation (time-gap sessionization).

The input-hint API surface calls for ``applyInPandas`` per-conversation
grouped extraction. This operator exists in BOTH forms with identical
semantics (tests assert equality):

* :func:`episode_ids` — the production path: ``lag`` + cumulative sum over
  a ``(conv_id)`` window. Pure JVM, one shuffle on conv_id, whole-stage
  codegen; this is what runs at 10^12 turns.
* :func:`episode_ids_pandas` — the same computation as an
  ``applyInPandas`` grouped UDF, demonstrating the slot where genuinely
  non-SQL per-conversation logic (model-based segmenters, learned
  boundaries) plugs in without changing the plan shape: repartition by
  conv_id → whole conversation per pandas frame → Arrow batch out.

Episode rule: a new episode starts at turn 0 and whenever the gap to the
previous turn exceeds ``gap_seconds``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EPISODE_SCHEMA = "conv_id string, turn_idx int, episode int"


def episode_ids(turns: DataFrame, gap_seconds: int = 300) -> DataFrame:
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_ep = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return turns.select(
        "conv_id",
        "turn_idx",
        F.sum(new_ep).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int").alias("episode"),
    )


def episode_ids_pandas(turns: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """applyInPandas twin — whole conversation per frame, vectorized pandas
    inside (no per-row Python)."""

    def segment(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx")
        secs = pdf["ts"].astype("int64") // 1_000_000_000
        gaps = secs.diff()
        new_ep = gaps.isna() | (gaps > gap_seconds)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "episode": new_ep.cumsum().astype("int32"),
            }
        )

    return turns.select("conv_id", "turn_idx", "ts").groupBy("conv_id").applyInPandas(
        segment, EPISODE_SCHEMA
    )
