"""Iterative graph analytics over the KG — PageRank on the entity graph.

The reference stops at emitting the KG; ranking what the graph contains
is the downstream need a large-scale training-data pipeline hits first
(which entities dominate a corpus, which conversations are hubs — the
weighting/selection signal for sampling and dedup decisions). This is
the second iterative-graph operator next to connected components
(``canonicalize.py``): CC is the alternating-frontier pattern, PageRank
is the power-iteration pattern.

Semantics (deliberately the textbook fixed-iteration form, so an exact
relational twin exists): ``iters`` rounds of

    rank'(n) = (1 − d)/N + d · Σ_{src→n} rank(src) / outdeg(src)

No convergence test (fixed iterations = deterministic, oracle-checkable);
no dangling-mass redistribution (a node with no out-edges leaks its mass
— callers that need stochastic-matrix semantics add reverse edges, as the
entity-graph contract query does by construction). Ranks are plain
doubles; round before comparing across engines.

Scale shape: per iteration, ONE join of the edge relation (pre-joined
with out-degrees, checkpointed once) against the current rank vector on
``src``, then ONE ``groupBy(dst)`` partial-aggregated sum — two shuffles
of rank-vector size, not edge size, since the contribution sum combines
map-side. ``localCheckpoint`` per round keeps the self-referential plan
from growing (same discipline as ``ancestor_closure_df``). On a cluster,
pre-partitioning edges by ``src`` makes the per-iteration join exchange
the (much smaller) rank vector only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame, damping: float = 0.85, iters: int = 10
) -> DataFrame:
    """Fixed-iteration PageRank over ``edges(src, dst)`` (directed, bag
    duplicates count as parallel edges). Returns ``(node, rank)`` for
    every node appearing as src or dst."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def pagerank_py(
    edges: list[tuple[str, str]], damping: float = 0.85, iters: int = 10
) -> dict[str, float]:
    """Pure-Python power-iteration twin for tests — same fixed-iteration
    semantics, same no-dangling-redistribution rule."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    if n == 0:
        return {}
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iters):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += damping * ranks[s] / deg[s]
        ranks = nxt
    return ranks
