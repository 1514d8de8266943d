"""Link-prediction ranking metrics (MRR / Hits@k) for KG-embedding
evaluation — the measurement step that closes the training loop opened
by the negative-sampling generator (m7): given a candidate table of
(query, candidate, score, is_true) rows produced under the filtered
protocol, compute the rank of each query's true candidate and aggregate
mean reciprocal rank and Hits@k.

Reference parity: the reference repo trains/evaluates its BERT synonym
classifier offline (bertmap pipeline, `extractBertMapMappings.py`) and
never ships a ranking evaluator; this is the engine-extension twin of
that evaluation step for the KG-embedding (TransE/DistMult) data path,
expressed Spark-first.

Scale shape: one window over the query column — partitions are
candidate-set sized (k_neg + 1 rows), never corpus-sized, so the single
shuffle is by query key and each group is O(k). No driver collection,
no Python in the plan (pure Catalyst: rank + conditional aggregates).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ranked_candidates", "link_prediction_metrics"]


def ranked_candidates(
    candidates: DataFrame,
    query_col: str,
    cand_col: str,
    score_col: str,
    descending: bool = True,
) -> DataFrame:
    """Attach a dense, deterministic ``rank`` to every candidate within
    its query group: higher score = better (by default), ties broken by
    the candidate key so reruns are bit-stable. Input must be distinct
    on (query, candidate) — callers dedupe first (a duplicate candidate
    would make row-order — and thus the metric — nondeterministic)."""
    score: Column = F.col(score_col).desc() if descending else F.col(score_col).asc()
    w = Window.partitionBy(query_col).orderBy(score, F.col(cand_col).asc())
    return candidates.withColumn("rank", F.rank().over(w))


def link_prediction_metrics(
    candidates: DataFrame,
    query_col: str,
    cand_col: str,
    score_col: str,
    is_true_col: str,
    ks: Sequence[int] = (1, 3, 10),
    group_cols: Iterable[str] = (),
) -> DataFrame:
    """MRR and Hits@k over a filtered-protocol candidate table.

    ``candidates`` holds, per query, the true candidate plus its
    negatives with a model score; exactly one row per query has
    ``is_true_col`` true. Returns one row (or one per ``group_cols``
    value) with ``n_queries``, ``mrr`` and ``hits_at_<k>`` columns, all
    float metrics rounded to 6 decimals for cross-engine comparison.
    """
    ranked = ranked_candidates(candidates, query_col, cand_col, score_col)
    true_rows = ranked.where(F.col(is_true_col))
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 6).alias("mrr"),
    ]
    for k in ks:
        aggs.append(
            F.round(F.avg((F.col("rank") <= k).cast("double")), 6).alias(f"hits_at_{k}")
        )
    gcols = list(group_cols)
    if gcols:
        return true_rows.groupBy(*gcols).agg(*aggs)
    return true_rows.agg(*aggs)
