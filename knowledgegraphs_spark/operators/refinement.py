"""Match refinement: exact-match short-circuit (X5), iterative mapping
extension (J7/G6), two-round veto filtering (F9), context score (M4).

Reference semantics:

* **X5 exact mapper** (``D_MappingGeneration/ExactMapper.java:67-83``):
  any shared (lowercased) annotation scores 1.0; a data-property target
  without both domain and range scores 0.5; per source keep the best.
* **J7/G6 mapping extension** (``align/bertmap/mapping_refinement.py:
  100-178``): starting from scored class pairs, iteratively propose
  parent×parent and child×child pairs, keep those scoring ≥ κ, re-seed the
  frontier with the new pairs, stop when the frontier empties or after
  ``max_iter``; a final filter keeps score ≥ λ.
* **F9 candidate veto filtering** (``AAExpansion/source/InterpretHeaders.py:
  302-352``): round 1 drops candidates whose own score AND global
  abbreviation score fall at/below the threshold; round 2 collects vetoed
  (abbrev, full-form) pairs from single-abbreviation headers and removes
  them for EVERY header sharing that abbreviation — a distinct+anti-join.
* **M4 context score** (``InterpretHeaders.py:223-233,241-242``): mean
  cosine of an element's embedding vs the other elements of its context.

Spark-first shape: X5 is an equi-join on normalized annotations (never a
pairwise scan); G6 is a driver loop of joins with lineage cuts — the
frontier is vocabulary-scale; F9 round 2 broadcasts the veto set; M4 is a
self-join within context groups, vectorized cosine, one aggregation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.embeddings import cosine_col


# ---------------------------------------------------------------------------
# X5: exact-match scores
# ---------------------------------------------------------------------------


def exact_match_scores(
    src_annotations: DataFrame,
    tgt_annotations: DataFrame,
    tgt_missing_domran: DataFrame | None = None,
) -> DataFrame:
    """``(element, annotation)`` on both sides → ``(src, tgt, score)``.

    Join on the lowercased annotation; score 1.0, demoted to 0.5 when the
    target is a data property lacking domain+range (``tgt_missing_domran``:
    one ``element`` column). Per src keep the max score and, among ties,
    the lexicographically first tgt — the reference's addMatch keeps the
    best seen (ExactMapper.java:76-79); the tie-break makes ours
    deterministic under any partitioning."""
    s = src_annotations.select(
        F.col("element").alias("src"), F.lower(F.col("annotation")).alias("a")
    )
    t = tgt_annotations.select(
        F.col("element").alias("tgt"), F.lower(F.col("annotation")).alias("a")
    )
    hits = s.join(t, "a").select("src", "tgt").distinct()
    if tgt_missing_domran is not None:
        nd = F.broadcast(tgt_missing_domran.select(F.col("element").alias("tgt"), F.lit(True).alias("__nd")))
        hits = hits.join(nd, "tgt", "left").withColumn(
            "score", F.when(F.col("__nd"), F.lit(0.5)).otherwise(F.lit(1.0))
        ).drop("__nd")
    else:
        hits = hits.withColumn("score", F.lit(1.0))
    best = hits.groupBy("src").agg(F.max("score").alias("best"))
    return (
        hits.join(best, "src")
        .filter(F.col("score") >= F.col("best"))
        .groupBy("src", "score")
        .agg(F.min("tgt").alias("tgt"))
        .select("src", "tgt", "score")
    )


# ---------------------------------------------------------------------------
# J7/G6: iterative mapping extension
# ---------------------------------------------------------------------------


def mapping_extension(
    seeds: DataFrame,
    src_edges: DataFrame,
    tgt_edges: DataFrame,
    score_fn: Callable[[Column, Column], Column],
    kappa: float = 0.9,
    max_iter: int = 10,
) -> DataFrame:
    """Frontier BFS over both hierarchies. ``seeds(src, tgt)``;
    ``*_edges(child, parent)``; ``score_fn(src_col, tgt_col) -> Column``.
    Returns the expansion set ``(src, tgt, score)`` (seeds included,
    scored by the same function)."""
    sp = src_edges.select(F.col("child").alias("s_from"), F.col("parent").alias("s_to"))
    sc = src_edges.select(F.col("parent").alias("s_from"), F.col("child").alias("s_to"))
    tp = tgt_edges.select(F.col("child").alias("t_from"), F.col("parent").alias("t_to"))
    tc = tgt_edges.select(F.col("parent").alias("t_from"), F.col("child").alias("t_to"))

    # every round materializes (localCheckpoint) — the new frontier is used
    # twice (emptiness probe + union) and feeds the next round's joins, so
    # an unmaterialized plan would re-execute the whole chain each round.
    expansion = seeds.select("src", "tgt").distinct().localCheckpoint(eager=True)
    frontier = expansion
    for _ in range(max_iter):
        up = (
            frontier.join(sp, frontier["src"] == sp["s_from"])
            .join(tp, frontier["tgt"] == tp["t_from"])
            .select(F.col("s_to").alias("src"), F.col("t_to").alias("tgt"))
        )
        down = (
            frontier.join(sc, frontier["src"] == sc["s_from"])
            .join(tc, frontier["tgt"] == tc["t_from"])
            .select(F.col("s_to").alias("src"), F.col("t_to").alias("tgt"))
        )
        cands = (
            up.unionByName(down)
            .distinct()
            .join(expansion, ["src", "tgt"], "left_anti")
            .filter(score_fn(F.col("src"), F.col("tgt")) >= kappa)
            .localCheckpoint(eager=True)
        )
        if cands.isEmpty():
            break
        expansion = expansion.unionByName(cands).localCheckpoint(eager=True)
        frontier = cands
    return expansion.withColumn("score", score_fn(F.col("src"), F.col("tgt")))


def filter_mappings(expansion: DataFrame, lam: float = 0.9995) -> DataFrame:
    """The post-extension λ filter (mapping_refinement.py:180-190)."""
    return expansion.filter(F.col("score") >= lam)


# ---------------------------------------------------------------------------
# F9: two-round veto filtering
# ---------------------------------------------------------------------------


def first_round_filter(cands: DataFrame, thrs: float = 0.82) -> DataFrame:
    """Drop candidates whose own score AND global abbrev score are both at
    or below the threshold (InterpretHeaders.py:302-321)."""
    return cands.filter(~((F.col("score") <= thrs) & (F.col("global_score") <= thrs)))


def second_round_filter(cands: DataFrame, thrs: float = 0.85) -> DataFrame:
    """Collect vetoed (abbrev, ff) pairs from single-abbrev headers, then
    anti-join them away for every header sharing the abbrev
    (InterpretHeaders.py:325-352)."""
    veto = (
        cands.filter(
            F.col("is_single_abbrev")
            & (F.col("score") < thrs)
            & (F.col("global_score") < thrs)
        )
        .select("abbrev", "ff")
        .distinct()
    )
    return cands.join(F.broadcast(veto), ["abbrev", "ff"], "left_anti")


# ---------------------------------------------------------------------------
# M4: context score
# ---------------------------------------------------------------------------


def context_scores(elements: DataFrame) -> DataFrame:
    """``(ctx, element, embedding)`` → mean cosine vs the other elements of
    the same context. Self-join on ctx (contexts are header-window sized),
    vectorized cosine, one aggregation — replaces the reference's per-header
    torch loop (InterpretHeaders.py:223-242)."""
    a = elements.select("ctx", F.col("element").alias("e1"), F.col("embedding").alias("v1"))
    b = elements.select("ctx", F.col("element").alias("e2"), F.col("embedding").alias("v2"))
    pairs = a.join(b, "ctx").filter(F.col("e1") != F.col("e2"))
    return (
        pairs.withColumn("cos", cosine_col(F.col("v1"), F.col("v2")))
        .groupBy("ctx", F.col("e1").alias("element"))
        .agg(F.avg("cos").alias("mean_ctx_score"))
    )
