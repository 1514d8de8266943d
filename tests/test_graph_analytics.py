"""PageRank (operators/graph_analytics.py): the distributed power
iteration must equal the pure-Python twin exactly (same fixed-iteration
semantics), and both must show the textbook behaviors — hub accumulation,
rank conservation on dangling-free graphs, damping sensitivity."""

import random

import pytest

from knowledgegraphs_spark.operators.graph_analytics import pagerank, pagerank_py


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_distributed_equals_python_twin(spark):
    rng = random.Random(11)
    nodes = [f"n{i}" for i in range(12)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(40)})
    got = {r.node: r.rank for r in pagerank(_df(spark, edges), iters=8).collect()}
    want = pagerank_py(edges, iters=8)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_parallel_edges_count_twice(spark):
    edges = [("a", "b"), ("a", "b"), ("a", "c")]
    got = {r.node: r.rank for r in pagerank(_df(spark, edges), iters=4).collect()}
    want = pagerank_py(edges, iters=4)
    assert got == pytest.approx(want)
    assert got["b"] > got["c"]  # 2/3 of a's mass flows to b


def test_hub_gets_highest_rank_and_mass_conserved(spark):
    # star: everyone links to h, h links back to one node → no dangling
    edges = [(f"s{i}", "h") for i in range(5)] + [("h", "s0")]
    got = {r.node: r.rank for r in pagerank(_df(spark, edges), iters=20).collect()}
    assert max(got, key=got.get) == "h"
    # s0 receives h's back-link: second highest
    assert sorted(got, key=got.get, reverse=True)[1] == "s0"
    # dangling-free graph conserves total mass
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_leaks_mass_as_documented(spark):
    edges = [("a", "b")]  # b has no out-edges
    got = {r.node: r.rank for r in pagerank(_df(spark, edges), iters=3).collect()}
    want = pagerank_py(edges, iters=3)
    assert got == pytest.approx(want)
    assert sum(got.values()) < 1.0


def test_symmetric_bipartite_is_stochastic(spark):
    # the entity-graph construction: conv↔entity edges in both directions
    pairs = [("c1", "e1"), ("c1", "e2"), ("c2", "e1")]
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    got = {r.node: r.rank for r in pagerank(_df(spark, edges), iters=12).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["e1"] > got["e2"]  # e1 is mentioned by two conversations
