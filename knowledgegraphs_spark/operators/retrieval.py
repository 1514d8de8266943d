"""Sparse and hybrid retrieval: BM25 scoring and reciprocal-rank fusion.

Dense ANN (``simsearch``) finds semantic neighbors; production retrieval
stacks pair it with a lexical scorer (BM25 — exact-term evidence, rare
tokens, out-of-embedding-vocabulary strings) and fuse the two rankings.
This module is that other half, Spark-first:

- :func:`bm25_scores` — the Okapi/Lucene BM25 formula over the corpus's
  token statistics: tf per (doc, term) and df per term are map-side-
  combined aggregates; ``avgdl`` is one broadcast scalar; scoring a
  query is one semi-join of the posting rows for the query's terms
  (term-keyed — the inverted-index access path, never a corpus scan per
  term) and one doc-keyed sum.
- :func:`rrf_fuse` — reciprocal-rank fusion (Cormack et al. 2009):
  ``score(d) = Σ_r 1/(k + rank_r(d))`` over the input rankings — the
  standard score-free fusion that needs no calibration between BM25's
  unbounded scores and cosine's [-1, 1].

The reference has no retrieval stage (it queries the finished KG via
SPARQL); this extends the engine's training/RAG-pipeline surface next to
``simsearch`` and ``text_analysis``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F

from .text_analysis import alpha_tokens

__all__ = ["bm25_scores", "rrf_fuse"]


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 with the Lucene non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``: returns the ``top_n``
    ``(id_col, score, rank)`` for the (lowercased, deduplicated) query
    terms. Ties break on the id. Token unit = ``alpha_tokens`` (the
    engine's corpus vocabulary contract)."""
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_scores: empty query")
    toks = docs.select(
        F.col(id_col), F.explode(alpha_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    n_stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avg_stats = dl.agg(F.avg("dl").alias("avgdl"))
    df_ = (
        tf.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    posting = (
        tf.where(F.col("term").isin(terms))
        .join(df_, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(n_stats))
        .crossJoin(F.broadcast(avg_stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = F.col("tf") / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = posting.select(id_col, (idf * tf_part).alias("s")).groupBy(id_col).agg(
        F.round(F.sum("s"), 6).alias("score")
    )
    w = W.orderBy(F.col("score").desc(), F.col(id_col))
    # top_n is a constant; the global window runs over at most the
    # matching docs and is cut to top_n — at corpus scale replace with
    # orderBy().limit(top_n), which Spark executes as a TakeOrdered
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w))
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 60, id_col: str = "doc_id", top_n: int = 10
) -> DataFrame:
    """Reciprocal-rank fusion: each input carries ``(id_col, rank)``;
    output is the ``top_n`` ``(id_col, rrf_score, rank)`` by
    ``Σ 1/(k + rank)``. Union + one id-keyed sum — no scores cross
    ranking systems, only ranks."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    u = rankings[0].select(id_col, "rank")
    for r in rankings[1:]:
        u = u.unionByName(r.select(id_col, "rank"))
    fused = u.groupBy(id_col).agg(
        F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))), 6).alias("rrf_score")
    )
    w = W.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w))
    )
