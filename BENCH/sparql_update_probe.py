#!/usr/bin/env python
"""SPARQL Update bucket-locality at scale.

The claim under test: ``sparql_update`` cost is proportional to the
buckets an operation touches, never to the store. Three shapes over a
multi-hundred-million-triple ``write_triples`` store (32 buckets):

1. ``INSERT DATA`` (one new subject) — append path, NO bucket rewrite:
   should cost seconds regardless of store size;
2. ``DELETE WHERE`` with a constant subject — exactly ONE bucket
   rewritten: should cost ~1/n_buckets of a full rewrite;
3. a full predicate migration (``DELETE {..} INSERT {..} WHERE {..}``
   over every turn's role attribute) — every bucket rewritten: the
   honest upper bound, comparable to the original store write.

Results recorded in BENCH/BASELINE.md. Env:
  SPARK_GRAFT_UPD_CONV   conversations to synthesize (default 2_000_000)
  SPARK_GRAFT_UPD_DIR    scratch dir (default /dev/shm/kgupd)
  SPARK_GRAFT_UPD_KEEP   1 = keep the store after the run
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONV = int(os.environ.get("SPARK_GRAFT_UPD_CONV", "2000000"))
BASE = os.environ.get("SPARK_GRAFT_UPD_DIR", "/dev/shm/kgupd")
KEEP = os.environ.get("SPARK_GRAFT_UPD_KEEP", "0") == "1"


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 1)
    print(json.dumps({"step": label, "sec": dt}), flush=True)
    return out, dt


def du_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    os.environ["SPARK_GRAFT_PRETOUCH"] = "1"
    from knowledgegraphs_spark.operators.sparql_update import sparql_update
    from knowledgegraphs_spark.operators.triples import read_triples, write_triples
    from knowledgegraphs_spark.plans.pipeline import build_kg_triples
    from knowledgegraphs_spark.session import get_spark
    from knowledgegraphs_spark.sources.transcripts import synthesize_transcripts_distributed

    os.makedirs(BASE, exist_ok=True)
    input_path = os.path.join(BASE, "turns")
    store = os.path.join(BASE, "store")
    spark = get_spark(
        "kg-update-probe",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    results: dict[str, float] = {}
    try:
        if not os.path.exists(os.path.join(store, "_SUCCESS")):
            synthesize_transcripts_distributed(spark, N_CONV, n_partitions=128).write.mode(
                "overwrite"
            ).parquet(input_path)
            turns = spark.read.parquet(input_path)
            n_turns = turns.count()
            print(json.dumps({"n_turns": n_turns}), flush=True)
            _, results["build_write_s"] = timed(
                "build+write_triples",
                lambda: write_triples(
                    build_kg_triples(spark, turns), store, n_buckets=32, coalesce_buckets=False
                ),
            )
            shutil.rmtree(input_path, ignore_errors=True)

        triples = read_triples(spark, store)
        n_triples, results["count_s"] = timed("count store", triples.count)
        results["n_triples"] = n_triples
        results["store_gb"] = round(du_bytes(store) / 1e9, 2)
        print(json.dumps({"n_triples": n_triples, "store_gb": results["store_gb"]}), flush=True)

        # 1) append-only insert: no rewrite at all
        stats, results["insert_data_s"] = timed(
            "INSERT DATA (append path)",
            lambda: sparql_update(
                spark,
                store,
                'INSERT DATA { kg:Probe_1 rdf:type kg:Probe . kg:Probe_1 note "inserted" . }',
            ),
        )
        print(json.dumps({"insert_stats": stats}), flush=True)

        # 2) constant-subject delete: exactly one bucket rewritten
        stats, results["delete_one_bucket_s"] = timed(
            "DELETE WHERE constant subject (1-bucket rewrite)",
            lambda: sparql_update(
                spark, store, "DELETE WHERE { kg:Turn_2_conv_00000007_0 ?p ?o . }"
            ),
        )
        print(json.dumps({"delete_stats": stats}), flush=True)

        # 3) full migration: every role attribute re-predicated — the
        # all-bucket upper bound (deletes + inserts across the store)
        stats, results["migrate_all_buckets_s"] = timed(
            "DELETE/INSERT WHERE migration (all-bucket rewrite)",
            lambda: sparql_update(
                spark,
                store,
                "DELETE { ?a has_role_VALUE ?r } INSERT { ?a role_VALUE ?r } "
                "WHERE { ?a has_role_VALUE ?r . }",
            ),
        )
        print(json.dumps({"migrate_stats": stats}), flush=True)

        results["locality_ratio"] = round(
            results["migrate_all_buckets_s"] / max(results["delete_one_bucket_s"], 0.1), 1
        )
        print(json.dumps({"metric": "sparql_update_probe", **results}), flush=True)
    finally:
        spark.stop()
        if not KEEP:
            shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
