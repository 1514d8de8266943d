"""Canonicalization (pipeline stage 5): iterative connected components over
match edges + canonical-representative pick.

The reference canonicalizes with an in-memory union-find over O(n²) pairwise
near-duplicate edges (``AAExpansion/source/util/UnionFind.py:30-71``,
``NearDuplicates.py:53-104``). At 10^12-turn scale the equivalent is the
alternating large-star / small-star connected-components algorithm (Kiveris
et al., "Connected Components in MapReduce and Beyond", SoCC 2014): each
round is two shuffles, convergence in O(log n) rounds, with
``localCheckpoint`` every few rounds to truncate lineage. Component id =
min node id — deterministic under any partitioning.

Canonical representative per component: shortest surface, then most
whitespace, then lexicographic (reference tie-break
``NearDuplicates.py:91-102``; lexicographic added for full determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..config import EngineConfig


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
    mins = mins.select("a", F.least("a", "mn").alias("m"))
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    oriented = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    )
    mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
    edges = (
        oriented.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .union(mins.select(F.col("a"), F.col("m").alias("b")))
    )
    return edges.where(F.col("a") != F.col("b")).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, cfg: EngineConfig | None = None
) -> DataFrame:
    """edges(a bigint, b bigint) → (node bigint, component bigint).

    Component id is the minimum node id. Isolated handling is the caller's
    job (nodes absent from ``edges`` are their own component).
    """
    cfg = cfg or EngineConfig()
    e = edges.select(F.col("a").cast("long"), F.col("b").cast("long")).where(
        F.col("a") != F.col("b")
    ).distinct()
    e = e.localCheckpoint(eager=True)
    sig = _signature(e)
    for _i in range(cfg.cc_max_iterations):
        # checkpoint EVERY round: without it the plan doubles per iteration
        # and each signature action recomputes the whole history.
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sig = _signature(e2)
        e = e2
        if new_sig == sig:
            break
        sig = new_sig
    # converged: star forest (child, root). Roots map to themselves.
    stars = e.select(F.greatest("a", "b").alias("node"), F.least("a", "b").alias("component"))
    roots = stars.select(F.col("component").alias("node"), F.col("component")).distinct()
    return stars.union(roots).groupBy("node").agg(F.min("component").alias("component"))


def canonical_mapping(
    surfaces: DataFrame, edges: DataFrame, cfg: EngineConfig | None = None
) -> DataFrame:
    """surfaces(mention) + edges(src, tgt) →
    (mention, canonical, component) — every surface mapped to its component's
    canonical representative (itself if unmatched).

    Node ids are ``xxhash64(mention)`` — a pure function of the surface, so
    the mapping is reproducible under any partitioning (no
    monotonically_increasing_id).
    """
    cfg = cfg or EngineConfig()
    ids = surfaces.select("mention").dropDuplicates().withColumn(
        "node", F.xxhash64("mention")
    )
    edge_ids = (
        edges.select(F.xxhash64("src").alias("a"), F.xxhash64("tgt").alias("b"))
    )
    comp = connected_components(edge_ids, cfg)
    labeled = ids.join(comp, "node", "left").withColumn(
        "component", F.coalesce("component", "node")
    )
    whitespace = F.length("mention") - F.length(F.regexp_replace(F.col("mention"), " ", ""))
    w = W.partitionBy("component").orderBy(
        F.length("mention").asc(), whitespace.desc(), F.col("mention").asc()
    )
    canon = labeled.withColumn(
        "canonical",
        F.first("mention").over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)),
    )
    return canon.select("mention", "canonical", "component")
