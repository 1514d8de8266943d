#!/usr/bin/env python
"""Training-data family at a large rung (round-4 VERDICT item #8).

Dedup / semantic-dedup / packing / BPE are oracle-checked at sf0.01 and
benchmarked at sf0.1 (~6 k documents) — three orders of magnitude below
the corpora they exist for. This probe synthesizes a deterministic
50 M-document corpus (plus 16-dim embeddings) and runs the four shapes
whose scale behavior the round-4 audit called out:

  d2   MinHash+LSH candidate pairs (xxhash64 family, banding inside the
       aggregate, bucket groupBy — the claim: no quadratic blow-up)
  t3   sequence packing (distributed global prefix sum, no global window)
  t16  BPE merge learning, batch_size=32 (the round-5 batched rounds)
  d8   SemDeDup in its own k ~ sqrt(N) regime (1 M vectors, 1024 trained
       centroids) — deliberately ABOVE CENTROID_LITERAL_MAX, so this
       exercises the round-5 broadcast-join assignment path at corpus
       scale; runs last as the most memory-sensitive phase

Corpus shape: every 10th document is a near-duplicate (same 25-token
body, one extra tail token) of the document 9 ids below it, so LSH has
real recall work; token ids are drawn zipf-ishly from a 50 k vocabulary
so BPE/pair statistics are natural-ish, all via xxhash64 — zero Python
in synthesis. Shuffle volumes come from the Spark UI REST endpoint
(sum of shuffle read/write bytes over all stages).

Results land in BENCH/BASELINE.md. Env:
  SPARK_GRAFT_TSP_DOCS  documents to synthesize (default 50_000_000)
  SPARK_GRAFT_TSP_CPUS  cores (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knowledgegraphs_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("SPARK_GRAFT_TSP_DOCS", "50000000"))
CPUS = int(os.environ.get("SPARK_GRAFT_TSP_CPUS", "32"))
RESULTS: dict[str, dict] = {}


def _shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    stages so far, from the UI REST API."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages", timeout=10) as r:
            stages = json.load(r)
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:
        return (-1, -1)


def timed(spark, label: str, fn) -> None:
    r0, w0 = _shuffle_totals(spark)
    t0 = time.perf_counter()
    out = fn()
    secs = round(time.perf_counter() - t0, 1)
    r1, w1 = _shuffle_totals(spark)
    RESULTS[label] = {
        "seconds": secs,
        "result": out,
        "shuffle_read_gb": round((r1 - r0) / 2**30, 2) if r0 >= 0 else None,
        "shuffle_write_gb": round((w1 - w0) / 2**30, 2) if w0 >= 0 else None,
    }
    print(json.dumps({label: RESULTS[label]}), flush=True)


def synth_docs(spark, n: int):
    """Deterministic corpus: 25 zipf-ish tokens per doc from a 50k vocab;
    every 10th doc repeats the body of doc (id-9) plus one tail token."""
    base = spark.range(0, n, 1, CPUS * 8).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 9, F.col("id") - 9).otherwise(F.col("id")).alias("body_of"),
    )
    # zipf-ish: uniform rank r in [0, 50k), emitted token id r*r/50k —
    # squared decay concentrates mass on a dense low-id head; digits are
    # transliterated to letters so the engine's a-z tokenizer
    # (text_analysis.alpha_tokens, the BPE vocabulary unit) sees distinct
    # words rather than one "w" run per token
    def tok(j):
        r = F.pmod(F.xxhash64(F.col("body_of"), F.lit(j)), F.lit(50000))
        tid = (r * r / F.lit(50000)).cast("long").cast("string")
        return F.concat(F.lit("w"), F.translate(tid, "0123456789", "abcdefghij"))

    body = F.concat_ws(" ", F.array(*[tok(j) for j in range(25)]))
    tail = F.translate((F.col("doc_id") % 97).cast("string"), "0123456789", "abcdefghij")
    text = F.when(
        F.col("doc_id") % 10 == 9, F.concat(body, F.lit(" tail"), tail)
    ).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def synth_embeddings(spark, n: int, dim: int = 16):
    vec = F.array(
        *[
            (F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2001)) - 1000) / 1000.0
            for d in range(dim)
        ]
    )
    return spark.range(0, n, 1, CPUS * 8).select(
        F.col("id").alias("vec_id"), vec.cast("array<float>").alias("embedding")
    )


def main() -> None:
    spark = get_spark(
        "training-scale-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 4,
        extra_conf={"spark.ui.enabled": "true"},
    )
    # default the corpus to DISK, not /dev/shm: this sandbox's memory is
    # host-shared (two same-commit runs were global-oom-killed at 53 GB
    # and 27 GB JVM rss), and tmpfs data + tmpfs shuffle all bill against
    # the same fluctuating allowance. Pair with SPARK_GRAFT_LOCAL_DIR for
    # disk shuffle scratch.
    tmp = os.environ.get("SPARK_GRAFT_TSP_DIR", "/tmp/kg_tsp")
    docs_path = os.path.join(tmp, "docs")
    emb_path = os.path.join(tmp, "emb")

    timed(
        spark,
        "synthesize",
        lambda: (
            synth_docs(spark, N_DOCS).write.mode("overwrite").parquet(docs_path),
            synth_embeddings(spark, N_DOCS // 10).write.mode("overwrite").parquet(emb_path),
            {"n_docs": N_DOCS, "n_vectors": N_DOCS // 10},
        )[-1],
    )
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)

    from knowledgegraphs_spark.operators.dedup import minhash_lsh_candidates
    from knowledgegraphs_spark.operators.packing import pack_documents
    from knowledgegraphs_spark.operators.bpe import train_bpe
    from knowledgegraphs_spark.operators.simsearch import (
        CENTROID_LITERAL_MAX,
        semantic_dedup,
        train_ivf_centroids,
    )

    timed(
        spark,
        "d2_minhash_lsh_xxhash64",
        lambda: {"candidate_pairs": minhash_lsh_candidates(docs, k=16, bands=4, n=3, family="xxhash64").count()},
    )


    timed(
        spark,
        "t3_sequence_packing",
        lambda: {
            "bins": pack_documents(docs, budget=2048)
            .agg(F.max("bin_id").alias("m"))
            .collect()[0]["m"]
        },
    )

    def run_t16():
        merges, _vocab, rounds = train_bpe(docs, n_merges=200, batch_size=32)
        return {"merges": merges.count(), "rounds": rounds}

    timed(spark, "t16_bpe_batched", run_t16)

    def run_d8():
        # SemDeDup's own k ~ sqrt(N) regime: 1 M vectors, 1024 trained
        # centroids — far above CENTROID_LITERAL_MAX, so this exercises
        # the broadcast-join assignment path (keyed struct-max aggregate;
        # the all-columns grouping it replaced was kernel-OOM here) and
        # keeps the in-cluster quadratic scan at ~(N/k)^2 * k pairs.
        sub = emb.filter(F.col("vec_id") < 1_000_000)
        cents = train_ivf_centroids(sub, n_centroids=1024, n_iters=1)
        assert len(cents) > CENTROID_LITERAL_MAX  # broadcast-join path
        out = semantic_dedup(sub, threshold=0.9, centroids=cents)
        agg = out.agg(
            F.count(F.lit(1)).alias("rows"), F.sum(F.col("kept").cast("long")).alias("kept")
        ).collect()[0]
        return {"rows": agg["rows"], "kept": agg["kept"], "n_centroids": 1024}

    timed(spark, "d8_semantic_dedup_sqrtN", run_d8)

    print(json.dumps({"probe": "training_scale", "n_docs": N_DOCS, "results": RESULTS}))
    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
