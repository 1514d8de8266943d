#!/usr/bin/env python
"""RDFS materialization at scale (round-4 eleventh wave).

Claims under test, at two instance rungs on the same TBox:

1. **Schema cost is instance-independent** — the two pointer-doubling
   closures run over vocabulary-sized relations (here 8 009 classes /
   1 285 properties), so their wall time must not move when the
   instance side doubles.
2. **Derivation throughput is linear in output** — every rule is a
   broadcast join against the instance scan; doubling the instances
   must ~double derived triples at ~constant derived-triples/sec.

Fixture (deterministic, no external data): a class FOREST of 1 000
chains, depth 8 (leaf_i < mid7_i < ... < root_i), a property forest of
256 chains, depth 4, domain/range declared on each chain's TOP property
only (so prp-dom/prp-rng must fire through prp-spo1 derivations —
the stratum interplay, not just the easy rules). Agents are typed a
leaf class and linked through a leaf property, giving per agent:
7 cax-sco + 3 prp-spo1 + 1 prp-dom + its 1 cax + 1 prp-rng + its 1 cax
≈ 14 derived per 2 asserted.

Results → BENCH/BASELINE.md. Env:
  SPARK_GRAFT_ENT_AGENTS  agents at the big rung (default 20_000_000;
                          the small rung is half)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BIG = int(os.environ.get("SPARK_GRAFT_ENT_AGENTS", "20000000"))

N_CLS_CHAINS, CLS_DEPTH = 1000, 8
N_PRP_CHAINS, PRP_DEPTH = 256, 4


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 1)
    print(json.dumps({"step": label, "sec": dt}), flush=True)
    return out, dt


def tbox_rows():
    rows = []
    for i in range(N_CLS_CHAINS):
        for d in range(CLS_DEPTH - 1):
            rows.append((f"kg:C{i}_d{d}", "rdfs:subClassOf", f"kg:C{i}_d{d + 1}"))
    for i in range(N_PRP_CHAINS):
        for d in range(PRP_DEPTH - 1):
            rows.append((f"kg:p{i}_d{d}", "rdfs:subPropertyOf", f"kg:p{i}_d{d + 1}"))
        top = f"kg:p{i}_d{PRP_DEPTH - 1}"
        rows.append((top, "rdfs:domain", f"kg:C{i % N_CLS_CHAINS}_d{CLS_DEPTH - 2}"))
        rows.append((top, "rdfs:range", f"kg:C{(i * 7 + 3) % N_CLS_CHAINS}_d{CLS_DEPTH - 2}"))
    return rows


def instances(spark, n_agents: int):
    from pyspark.sql import functions as F

    ids = spark.range(n_agents, numPartitions=256)
    subj = F.concat(F.lit("kg:A"), F.col("id").cast("string"))
    leaf_cls = F.concat(F.lit("kg:C"), (F.col("id") % N_CLS_CHAINS).cast("string"), F.lit("_d0"))
    leaf_prp = F.concat(F.lit("kg:p"), (F.col("id") % N_PRP_CHAINS).cast("string"), F.lit("_d0"))
    tgt = F.concat(F.lit("kg:A"), ((F.col("id") * 48271 + 1) % n_agents).cast("string"))
    return (
        ids.select(subj.alias("subj"), F.lit("rdf:type").alias("pred"), leaf_cls.alias("obj"))
        .unionByName(ids.select(subj.alias("subj"), leaf_prp.alias("pred"), tgt.alias("obj")))
    )


def main() -> None:
    os.environ["SPARK_GRAFT_PRETOUCH"] = "1"
    from knowledgegraphs_spark.operators import entailment
    from knowledgegraphs_spark.operators.entailment import rdfs_materialize
    from knowledgegraphs_spark.operators.ontology import ancestor_closure_df
    from knowledgegraphs_spark.session import get_spark

    spark = get_spark(
        "kg-entailment-probe",
        master="local[32]",
        shuffle_partitions=256,
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    schema_df = spark.createDataFrame(tbox_rows(), "subj string, pred string, obj string")
    print(json.dumps({"tbox_triples": schema_df.count()}), flush=True)

    # isolate claim 1: closure wall time on the TBox alone
    from pyspark.sql import functions as F

    sco = schema_df.filter(F.col("pred") == "rdfs:subClassOf").select(
        F.col("subj").alias("child"), F.col("obj").alias("parent")
    )
    (_, closure_s) = timed("sco closure (TBox only)", lambda: ancestor_closure_df(sco).count())

    results = {"closure_s": closure_s}
    for label, n_agents in (("small", N_BIG // 2), ("big", N_BIG)):
        inst = instances(spark, n_agents).localCheckpoint(eager=True)
        n_base = inst.count()
        base = inst.unionByName(schema_df)
        derived, wall = timed(
            f"materialize {label} ({n_agents} agents)",
            lambda b=base: rdfs_materialize(b, include_base=False).count(),
        )
        results[label] = {
            "agents": n_agents,
            "base_instance_triples": n_base,
            "derived_triples": derived,
            "wall_s": wall,
            "derived_per_sec": round(derived / wall, 1),
        }
        print(json.dumps({label: results[label]}), flush=True)

    results["linearity"] = round(
        results["big"]["derived_per_sec"] / results["small"]["derived_per_sec"], 3
    )
    print(json.dumps({"entailment_probe": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
