#!/usr/bin/env python
"""OWL 2 RL property rules at scale (round-4 twelfth wave).

Claims under test, at two instance rungs on the same constant TBox:

1. **Linear derivation throughput** — every owl-rl rule is either a
   broadcast join against the instance scan (prp-inv, prp-spo1 via
   equivalence, prp-dom/rng, cax-sco), an isin-filtered projection
   (prp-symp), a map-side-combinable groupBy over the functional
   predicates' triples only (prp-fp/ifp), or a pointer-doubling closure
   bounded by the transitive predicates' edges (prp-trp). Doubling the
   instances must ~double derived triples at ~constant derived/sec.
2. **prp-trp rounds are depth-bound, not size-bound** — the containment
   hierarchy here is depth 3, so the closure must converge in 2
   pointer-doubling rounds at BOTH rungs (log₂ depth, independent of
   edge count).
3. **Smush throughput is store-bound, not cluster-bound** — identity
   clusters from the fp identities are rewritten with two broadcast
   hash joins over the store scan; doubling the store ~doubles wall.

Fixture (deterministic, Spark range, no external data): per rung of
``n`` orders — each order asserts its customer ref under TWO alias
schemes (owl:FunctionalProperty → n/5 distinct identity links over
n/5 customers), n/100 agents in a depth-3 kg:partOf chain
(agent → group → region → kg:World; TransitiveProperty), n/10
symmetric peer edges, n/10 kg:serves edges crossing an owl:inverseOf
bridge, and suppliers asserting kg:suppliesTo across an
owl:equivalentProperty bridge with domain/range + equivalentClass +
subClassOf typing on the far side.

Results → BENCH/BASELINE.md. Env:
  SPARK_GRAFT_OWLRL_N  orders at the big rung (default 10_000_000;
                       the small rung is half)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BIG = int(os.environ.get("SPARK_GRAFT_OWLRL_N", "10000000"))

TBOX = [
    ("kg:partOf", "rdf:type", "owl:TransitiveProperty"),
    ("kg:peerOf", "rdf:type", "owl:SymmetricProperty"),
    ("kg:custRef", "rdf:type", "owl:FunctionalProperty"),
    ("kg:serves", "owl:inverseOf", "kg:servedBy"),
    ("kg:suppliesTo", "owl:equivalentProperty", "kg:provides"),
    ("kg:provides", "rdfs:domain", "kg:Vendor"),
    ("kg:provides", "rdfs:range", "kg:Product"),
    ("kg:Vendor", "owl:equivalentClass", "kg:Seller"),
    ("kg:Seller", "rdfs:subClassOf", "kg:Party"),
]


def build_instances(spark, n: int):
    from pyspark.sql import functions as F

    o = spark.range(n).select(F.col("id"))
    orders = o.select(
        F.concat(F.lit("kg:Order_"), F.col("id").cast("string")).alias("subj"),
        F.lit("kg:custRef").alias("pred"),
        F.concat(F.lit("u:"), ((F.col("id") % (n // 5)) * 2).cast("string")).alias("obj"),
    ).unionByName(
        o.select(
            F.concat(F.lit("kg:Order_"), F.col("id").cast("string")).alias("subj"),
            F.lit("kg:custRef").alias("pred"),
            F.concat(F.lit("kg:Customer_"), (F.col("id") % (n // 5)).cast("string")).alias("obj"),
        )
    )
    a = spark.range(n // 100).select(F.col("id"))
    chain = (
        a.select(
            F.concat(F.lit("kg:Agent_"), F.col("id").cast("string")).alias("subj"),
            F.lit("kg:partOf").alias("pred"),
            F.concat(F.lit("kg:Group_"), (F.col("id") % 1000).cast("string")).alias("obj"),
        )
        .unionByName(
            spark.range(1000).select(
                F.concat(F.lit("kg:Group_"), F.col("id").cast("string")).alias("subj"),
                F.lit("kg:partOf").alias("pred"),
                F.concat(F.lit("kg:Region_"), (F.col("id") % 20).cast("string")).alias("obj"),
            )
        )
        .unionByName(
            spark.range(20).select(
                F.concat(F.lit("kg:Region_"), F.col("id").cast("string")).alias("subj"),
                F.lit("kg:partOf").alias("pred"),
                F.lit("kg:World").alias("obj"),
            )
        )
    )
    m = spark.range(n // 10).select(F.col("id"))
    peers = m.select(
        F.concat(F.lit("kg:Agent_"), F.col("id").cast("string")).alias("subj"),
        F.lit("kg:peerOf").alias("pred"),
        F.concat(F.lit("kg:Agent_"), (F.col("id") + 1).cast("string")).alias("obj"),
    )
    serves = m.select(
        F.concat(F.lit("kg:Supplier_"), F.col("id").cast("string")).alias("subj"),
        F.lit("kg:serves").alias("pred"),
        F.concat(F.lit("kg:Nation_"), (F.col("id") % 25).cast("string")).alias("obj"),
    )
    sells = m.select(
        F.concat(F.lit("kg:Supplier_"), F.col("id").cast("string")).alias("subj"),
        F.lit("kg:suppliesTo").alias("pred"),
        F.concat(F.lit("kg:Part_"), (F.col("id") % 200).cast("string")).alias("obj"),
    )
    tbox = spark.createDataFrame(TBOX, "subj string, pred string, obj string")
    return (
        orders.unionByName(chain)
        .unionByName(peers)
        .unionByName(serves)
        .unionByName(sells)
        .unionByName(tbox)
    )


def main() -> None:
    from knowledgegraphs_spark.operators.entailment import (
        owl_rl_materialize,
        owl_sameas_smush,
    )
    from knowledgegraphs_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    spark = get_spark("owl-rl-probe", master="local[32]", shuffle_partitions=64)
    out: dict = {"n_big": N_BIG}
    for label, n in (("small", N_BIG // 2), ("big", N_BIG)):
        base = build_instances(spark, n).localCheckpoint(eager=True)
        n_base = base.count()
        t0 = time.perf_counter()
        derived = owl_rl_materialize(base, include_base=False)
        n_derived = derived.count()
        wall = round(time.perf_counter() - t0, 1)
        t1 = time.perf_counter()
        smushed = owl_sameas_smush(base.unionByName(derived))
        n_smushed = smushed.count()
        smush_wall = round(time.perf_counter() - t1, 1)
        out[label] = {
            "asserted": n_base,
            "derived": n_derived,
            "materialize_s": wall,
            "derived_per_sec": round(n_derived / wall),
            "smushed": n_smushed,
            "smush_s": smush_wall,
            "smush_rows_per_sec": round((n_base + n_derived) / smush_wall),
        }
        print(json.dumps({label: out[label]}), flush=True)
    big, small = out["big"], out["small"]
    out["derived_ratio"] = round(big["derived"] / small["derived"], 2)
    out["rate_ratio"] = round(big["derived_per_sec"] / small["derived_per_sec"], 2)
    out["smush_wall_ratio"] = round(big["smush_s"] / small["smush_s"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
