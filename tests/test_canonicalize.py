"""Connected components + canonical pick vs the union-find oracle
(FIXTURES.md §5: chains needing ≥3 iterations, a high-degree hub, ties)."""

import pytest

from knowledgegraphs_spark.config import EngineConfig
from knowledgegraphs_spark.operators.canonicalize import canonical_mapping, connected_components

from tests.oracle_kg import expected_components

# threshold 0 forces the distributed large-star/small-star path; the default
# takes the driver union-find fast path — results must be identical.
DRIVER_CFG = EngineConfig()
DISTRIBUTED_CFG = EngineConfig(cc_driver_threshold=0, vocab_driver_threshold=0)


def _groups(mapping: dict[str, str]) -> set[frozenset]:
    inv: dict[str, set] = {}
    for k, v in mapping.items():
        inv.setdefault(v, set()).add(k)
    return {frozenset(g) for g in inv.values()}


@pytest.mark.parametrize("cfg", [DRIVER_CFG, DISTRIBUTED_CFG], ids=["driver", "distributed"])
def test_cc_long_chain_and_hub(spark, cfg):
    # chain of 12 (forces multiple star rounds), hub with 30 spokes, and an
    # isolated pair
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(12)]
    hub = [("hub", f"spoke{i:02d}") for i in range(30)]
    pair = [("x1", "x2")]
    edges = chain + hub + pair
    surfaces = sorted({n for e in edges for n in e})

    sdf = spark.createDataFrame([(s,) for s in surfaces], "mention string")
    edf = spark.createDataFrame(edges, "src string, tgt string")
    got = {r.mention: r.canonical for r in canonical_mapping(sdf, edf, cfg).collect()}

    oracle = expected_components(edges)
    assert _groups(got) == _groups(oracle)
    assert got == oracle  # canonical pick matches tie-break too


def test_cc_isolated_nodes_self_map(spark):
    sdf = spark.createDataFrame([("alone",), ("a",), ("b",)], "mention string")
    edf = spark.createDataFrame([("a", "b")], "src string, tgt string")
    got = {r.mention: r.canonical for r in canonical_mapping(sdf, edf).collect()}
    assert got["alone"] == "alone"
    assert got["a"] == got["b"] == "a"


@pytest.mark.parametrize("cfg", [DRIVER_CFG, DISTRIBUTED_CFG], ids=["driver", "distributed"])
def test_cc_numeric_component_ids(spark, cfg):
    e = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "a long, b long")
    got = {r.node: r.component for r in connected_components(e, cfg).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_canonical_pick_mega_component_no_window(spark):
    """Planted mega-component (one near-dup group ≫ all others): the
    distributed canonical pick must (a) match the in-memory twin exactly and
    (b) contain NO whole-partition Window in the physical plan — the
    scale-safe shape is groupBy + min_by (map-side partial agg) + join-back,
    so a pathological component never lands on a single task."""
    mega = [f"boilerplate header {i:04d}" for i in range(500)]
    small = ["alpha one", "alpha  one", "beta two"]
    surfaces = mega + small
    edges = [(mega[0], m) for m in mega[1:]] + [("alpha one", "alpha  one")]

    sdf = spark.createDataFrame([(s,) for s in surfaces], "mention string").repartition(8)
    edf = spark.createDataFrame(edges, "src string, tgt string").repartition(8)

    dist = canonical_mapping(sdf, edf, DISTRIBUTED_CFG)
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan

    got = {r.mention: r.canonical for r in dist.collect()}
    oracle = {
        r.mention: r.canonical
        for r in canonical_mapping(sdf, edf, DRIVER_CFG).collect()
    }
    assert got == oracle
    # the mega component resolved to one canonical for all 500 members
    assert len({got[m] for m in mega}) == 1


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_canonical_mapping_paths_agree_on_random_graphs(spark, seed):
    """Randomized (seeded) graph shapes through BOTH physical strategies:
    driver union-find vs distributed CC + min_by pick must emit the
    identical mention→canonical map — chains, stars, cliques, isolated
    nodes, punctuation-bearing surfaces, whitespace ties."""
    import random

    rng = random.Random(seed)
    pool = [
        f"{w}{p}{rng.randint(0, 9)}"
        for w in ("alpha", "beta gamma", "x_y", "Acme Corp.", "né e")
        for p in ("", " ", "!", "  ", ", Inc")
    ]
    surfaces = sorted(set(rng.sample(pool, k=min(len(pool), 18))))
    n_edges = rng.randint(0, 14)
    edges = [
        (rng.choice(surfaces), rng.choice(surfaces)) for _ in range(n_edges)
    ]
    sdf = spark.createDataFrame([(s,) for s in surfaces], "mention string").repartition(4)
    edf = (
        spark.createDataFrame(edges, "src string, tgt string")
        if edges
        else spark.createDataFrame([], "src string, tgt string")
    )
    dist = {
        r.mention: r.canonical
        for r in canonical_mapping(sdf, edf, DISTRIBUTED_CFG).collect()
    }
    driver = {
        r.mention: r.canonical
        for r in canonical_mapping(sdf, edf, DRIVER_CFG).collect()
    }
    assert dist == driver
