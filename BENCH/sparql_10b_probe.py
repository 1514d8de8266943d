#!/usr/bin/env python
"""SPARQL over the 10-billion-triple rung (round-4 VERDICT item #6).

Round 3 measured BGP/SPARQL latency at the 200 M-triple rung and left the
500 M-turn / 10.14 B-triple store unqueried. This probe rebuilds that
store (same protocol: synthetic turns on /dev/shm, full pipeline,
``write_triples`` zstd bucketed layout) and runs three SPARQL shapes
over it:

1. constant-subject point star (bucket-pruned partition read),
2. a million-binding user-turn chain (4 patterns),
3. a GROUP BY aggregate over the whole store.

The claim under test: ``subj_bucket`` pruning bounds the point lookup's
I/O to one bucket REGARDLESS of store size — point ≪ scan must hold at
10 B the way it held at 200 M.

Results recorded in BENCH/BASELINE.md. Env:
  SPARK_GRAFT_10B_CONV   conversations to synthesize (default 50_000_000)
  SPARK_GRAFT_10B_DIR    scratch dir (default /dev/shm/kg10b)
  SPARK_GRAFT_10B_KEEP   1 = keep the store after the run
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONV = int(os.environ.get("SPARK_GRAFT_10B_CONV", "50000000"))
BASE = os.environ.get("SPARK_GRAFT_10B_DIR", "/dev/shm/kg10b")
KEEP = os.environ.get("SPARK_GRAFT_10B_KEEP", "0") == "1"


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 1)
    print(json.dumps({"step": label, "sec": dt}), flush=True)
    return out, dt


def main() -> None:
    os.environ["SPARK_GRAFT_PRETOUCH"] = "1"
    from pyspark.sql import functions as F

    from knowledgegraphs_spark.operators.sparql import sparql_select
    from knowledgegraphs_spark.operators.triples import read_triples, write_triples
    from knowledgegraphs_spark.plans.pipeline import build_kg_triples
    from knowledgegraphs_spark.session import get_spark
    from knowledgegraphs_spark.sources.transcripts import synthesize_transcripts_distributed

    os.makedirs(BASE, exist_ok=True)
    input_path = os.path.join(BASE, "turns")
    store = os.path.join(BASE, "store")
    # zstd for shuffle/spill blocks, not just parquet: the bucketing
    # repartition of 10 B triples shuffles the whole dataset once, and
    # lz4 blocks of long repetitive URI strings measured ~66 GB — more
    # scratch than this box's disk. zstd halves it at equal wall time;
    # on a real cluster this is the same executor conf.
    spark = get_spark(
        "kg-10b-probe",
        master="local[32]",
        shuffle_partitions=256,
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    results: dict[str, float] = {}
    try:
        if not os.path.exists(os.path.join(store, "_SUCCESS")):
            if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
                _, results["synth_write_s"] = timed(
                    "synthesize+write input",
                    lambda: synthesize_transcripts_distributed(
                        spark, N_CONV, n_partitions=512
                    ).write.mode("overwrite").parquet(input_path),
                )
            turns = spark.read.parquet(input_path)
            n_turns = turns.count()
            print(json.dumps({"n_turns": n_turns}), flush=True)
            # coalesce_buckets=False: the one-file-per-bucket exchange
            # would stage all 10 B triples through shuffle scratch
            # (measured 115 GB — exceeds this box's disk); the map-side
            # write keeps pruning and needs no exchange at all.
            _, results["build_write_s"] = timed(
                "build+write_triples",
                lambda: write_triples(
                    build_kg_triples(spark, turns), store,
                    n_buckets=32, coalesce_buckets=False,
                ),
            )
            results["turns_per_sec"] = round(n_turns / results["build_write_s"], 1)
            # input no longer needed; free the tmpfs before the query phase
            shutil.rmtree(input_path, ignore_errors=True)

        triples = read_triples(spark, store)
        n_triples, results["count_s"] = timed("count store", triples.count)
        print(json.dumps({"n_triples": n_triples}), flush=True)

        # 1) point star — constant subject, partition-pruned to 1/32 of files
        point_q = "SELECT ?p ?o WHERE { kg:Turn_2_conv_00000007_0 ?p ?o . }"

        def point():
            return sparql_select(triples, point_q).collect()

        rows, cold = timed("point star (cold)", point)
        _, warm = timed("point star (warm)", point)
        results["point_star_cold_s"], results["point_star_warm_s"] = cold, warm
        results["point_star_bindings"] = len(rows)

        # 2) million-binding chain: every user turn with its conversation
        chain_q = """
            SELECT ?conv ?turn ?role WHERE {
                ?turn rdf:type kg:Turn ;
                      p_Turn_Conversation ?conv ;
                      has_role ?rattr .
                ?rattr has_role_VALUE ?role .
                FILTER (?role = 'user')
            }
        """
        n_chain, results["chain_s"] = timed(
            "user-turn chain", lambda: sparql_select(triples, chain_q).count()
        )
        results["chain_bindings"] = n_chain

        # 3) aggregate over the whole store
        agg_q = """
            SELECT ?role (COUNT(DISTINCT ?conv) AS ?n_convs) (COUNT(*) AS ?n_turns)
            WHERE {
                ?turn rdf:type kg:Turn ;
                      p_Turn_Conversation ?conv ;
                      has_role ?rattr .
                ?rattr has_role_VALUE ?role .
            } GROUP BY ?role
        """
        agg_rows, results["aggregate_s"] = timed(
            "GROUP BY aggregate", lambda: sparql_select(triples, agg_q).collect()
        )
        results["aggregate_groups"] = len(agg_rows)
        results["n_triples"] = n_triples
        results["n_conversations"] = N_CONV
        print(json.dumps({"results": results}), flush=True)
    finally:
        spark.stop()
        if not KEEP:
            shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
