"""SPARQL 1.1 Update applied to a ``write_triples`` store.

The reference mutates its knowledge graph by re-uploading whole graphs to
GraphDB and letting the endpoint's transaction log sort it out
(``E_CreateKG/GraphDB.java:150-163``); rdflib-side edits are full-graph
``add()``/``remove()`` loops. On this engine the store is subject-hash
bucketed parquet (``triples.py:write_triples``), so an update compiles to
BUCKET-LOCAL work — the 100-TB property is that cost scales with the
buckets the update touches, never with the store:

- the WHERE clause evaluates through the ordinary SPARQL machinery
  (bucket-pruned BGPs, hash joins);
- delete/insert templates instantiate exactly like CONSTRUCT templates
  (``sparql._template_graph``);
- buckets containing deletions are rewritten via dynamic partition
  overwrite (kept = per-bucket left-anti join against the delete set);
  buckets that only gain rows take parquet APPENDS — no rewrite at all;
- inserts follow RDF set semantics (a triple already present is a no-op)
  through a bucket-pruned anti join, while the base content keeps its
  bag identity row-for-row (the KG emission owns its own dedup);
- spec §3.1.3 operation order holds: deletes and the WHERE evaluation see
  the ORIGINAL store, inserts land after — ``DELETE {t} INSERT {t}
  WHERE {p}`` round-trips a triple.

Scope (documented, not silently wrong): single graph (GRAPH/WITH/USING
raise), one operation per request (``;`` raises), and on stores carrying
typed-literal metadata columns (``obj_dtype``, ``is_literal``) inserted
rows hold NULL metadata — the update language speaks plain
``(subj, pred, obj)``; typed literals come from the emission path.

Atomicity matches the store's contract elsewhere (``sinks/graphdb.py``
divergence note): each rewritten bucket commits atomically via the
parquet committer, but a mid-update crash can leave some buckets updated
and others not; re-running the same request is idempotent (deletes of
absent rows are no-ops, inserts are set-semantic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sparql import UpdateRequest, _eval_group, _template_graph, parse_update
from .triples import read_triples, subj_bucket_of

__all__ = ["sparql_update"]


def _bucket_dirs_delete(spark: SparkSession, store_path: str, buckets: list[int]) -> None:
    """Remove bucket directories that became EMPTY after deletion —
    dynamic partition overwrite only replaces partitions present in the
    written frame, so an emptied bucket's old files would otherwise
    survive. JVM Hadoop FileSystem: works for file://, hdfs://, s3a://."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for b in buckets:
        p = jvm.org.apache.hadoop.fs.Path(store_path, f"subj_bucket={b}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)


def sparql_update(spark: SparkSession, store_path: str, update: str | UpdateRequest) -> dict:
    """Apply one SPARQL Update operation to the store at ``store_path``.

    Returns lineage counters: ``{"deleted": n, "inserted": n,
    "buckets_rewritten": [..], "buckets_appended": [..]}`` — the
    per-operation metrics record the north rule's resumability story
    expects from every mutating stage.
    """
    req = parse_update(update) if isinstance(update, str) else update
    store = read_triples(spark, store_path)
    n_buckets = getattr(store, "_kg_subj_buckets", None)
    if n_buckets is None:
        raise ValueError(
            "sparql_update: not a write_triples store (missing _kg_meta) — "
            "updates need the bucket layout to stay bucket-local"
        )
    meta_cols = [c for c in store.columns if c not in ("subj", "pred", "obj", "subj_bucket")]

    graph = store.select("subj", "pred", "obj")
    graph._kg_subj_buckets = n_buckets  # keep constant-subject pruning through the select
    sol = _eval_group(graph, req.where) if req.where is not None else None
    if sol is not None and req.delete_template and req.insert_template:
        # modify form: one WHERE evaluation feeds BOTH templates (measured
        # on the 405 M-triple probe rung, where re-evaluating the solution
        # per template was the migration's single largest cost)
        sol = sol.localCheckpoint(eager=True)

    def instantiate(template):
        if template is None:
            return None
        g = _template_graph(spark, sol, template)
        g = g.withColumn("subj_bucket", subj_bucket_of(F.col("subj"), n_buckets))
        # materialize BEFORE any write: both frames derive from the store
        # scan being rewritten, and a lazy re-read after the overwrite
        # would hit replaced files; size = the update's match set
        return g.localCheckpoint(eager=True)

    deletes = instantiate(req.delete_template)
    inserts = instantiate(req.insert_template)

    # the touched-bucket sets are ≤ n_buckets values — driver-scale by
    # construction, same contract as the CC/vocab driver twins
    del_buckets: list[int] = (
        sorted(r[0] for r in deletes.select("subj_bucket").distinct().collect())
        if deletes is not None
        else []
    )
    stats = {"deleted": 0, "inserted": 0, "buckets_rewritten": [], "buckets_appended": []}
    spo = ["subj", "pred", "obj"]

    if del_buckets:
        affected = store.filter(F.col("subj_bucket").isin(del_buckets))
        kept = affected.join(deletes.select(*spo), on=spo, how="left_anti")
        new_parts = [kept]
        if inserts is not None:
            ins_r = inserts.filter(F.col("subj_bucket").isin(del_buckets))
            # set semantics against the POST-delete content (§3.1.3 order):
            # a triple deleted and re-inserted by the same request survives
            ins_r_new = ins_r.join(kept, on=spo, how="left_anti")
            for c in meta_cols:
                ins_r_new = ins_r_new.withColumn(c, F.lit(None).cast(store.schema[c].dataType))
            new_parts.append(ins_r_new.select(*kept.columns))
        content = new_parts[0]
        for p in new_parts[1:]:
            content = content.unionByName(p)
        # cut lineage from the files being overwritten — the rewrite's
        # working set is the touched buckets only, never the store
        content = content.localCheckpoint(eager=True)
        # deleted = rows that left the affected buckets; inserted-there =
        # rows the rewrite added beyond the kept ones
        n_before = affected.count()
        n_content = content.count()
        n_kept = kept.count()
        stats["deleted"] = n_before - n_kept
        stats["inserted"] += n_content - n_kept
        non_empty = {r[0] for r in content.select("subj_bucket").distinct().collect()}
        mode_saved = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                content.sortWithinPartitions("subj_bucket", "subj")
                .write.mode("overwrite")
                .partitionBy("subj_bucket")
                .parquet(store_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode_saved)
        emptied = [b for b in del_buckets if b not in non_empty]
        _bucket_dirs_delete(spark, store_path, emptied)
        stats["buckets_rewritten"] = del_buckets

    if inserts is not None:
        ins_a = inserts if not del_buckets else inserts.filter(
            ~F.col("subj_bucket").isin(del_buckets)
        )
        ins_buckets = sorted(r[0] for r in ins_a.select("subj_bucket").distinct().collect())
        if ins_buckets:
            existing = store.filter(F.col("subj_bucket").isin(ins_buckets))
            ins_new = ins_a.join(existing, on=spo, how="left_anti")
            for c in meta_cols:
                ins_new = ins_new.withColumn(c, F.lit(None).cast(store.schema[c].dataType))
            ins_new = ins_new.select(*store.columns).localCheckpoint(eager=True)
            n_new = ins_new.count()
            if n_new:
                (
                    ins_new.sortWithinPartitions("subj_bucket", "subj")
                    .write.mode("append")
                    .partitionBy("subj_bucket")
                    .parquet(store_path)
                )
                stats["inserted"] += n_new
                stats["buckets_appended"] = sorted(
                    r[0] for r in ins_new.select("subj_bucket").distinct().collect()
                )
    return stats
