"""Continuous KG maintenance: Structured Streaming over the incremental plan.

``plans/incremental.incremental_update`` merges ONE batch of new turns into
an existing entity catalog (attach novel surfaces, mint genuinely new
entities, emit only delta triples). This module lifts that into the job a
cluster actually schedules: a ``foreachBatch`` streaming sink where every
micro-batch of arriving turns extends a persisted catalog + triple store.

Store layout (all parquet, under ``store_path``)::

    catalog_base/             optional bootstrap (mention, canonical) map
    catalog_delta/batch_id=N/ novel-surface rows minted/attached by batch N
    triples/batch_id=N/       triple delta emitted by batch N

Exactly-once without a transactional table format: the streaming checkpoint
pins each source file to one ``batch_id`` forever; every per-batch write is
keyed by that ``batch_id`` and overwritten whole on replay; and
``incremental_update`` is deterministic given (batch, prior catalog). On
replay of batch N the prior catalog is reconstructed as base ∪ deltas with
``batch_id < N`` — deltas N and above are EXCLUDED — so the rewrite is
byte-identical to the first attempt (asserted in
``tests/test_streaming_maintenance.py``). On a cluster the same closure
lands on Iceberg tables and the dir-per-batch idempotency becomes a real
``MERGE``; the plan inside is unchanged.

URI-stability contract is inherited from the incremental plan: an entity
URI, once minted by any earlier batch, never changes (see
``plans/incremental.py`` module docstring for the one documented divergence
from full recompute).

Reference parity: the reference has no streaming mode at all — it rebuilds
the store per run (``Pipeline.java`` stage order). This is the Spark-first
extension of its resume machinery (S17) to continuous ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from ..config import EngineConfig
from .incremental import TRANSCRIPT_SCHEMA

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("mention", T.StringType()),
        T.StructField("canonical", T.StringType()),
    ]
)
TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("obj_dtype", T.StringType()),
        T.StructField("is_literal", T.BooleanType()),
    ]
)


def _read_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read a parquet dir that may not exist yet (first batch) — an empty
    store is an empty DataFrame, not an error."""
    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def read_catalog(
    spark: SparkSession, store_path: str, before_batch: int | None = None
) -> DataFrame:
    """The maintained (mention, canonical) map: bootstrap ∪ per-batch deltas.

    ``before_batch=N`` reconstructs the catalog as it stood BEFORE batch N —
    the replay-idempotency read (hive partition discovery turns the
    ``batch_id=N`` dir names into a filterable column, so the filter is
    partition pruning, not a scan)."""
    base = _read_or_empty(spark, f"{store_path}/catalog_base", CATALOG_SCHEMA)
    delta_schema = T.StructType(
        list(CATALOG_SCHEMA.fields) + [T.StructField("batch_id", T.IntegerType())]
    )
    deltas = _read_or_empty(spark, f"{store_path}/catalog_delta", delta_schema)
    if before_batch is not None:
        deltas = deltas.filter(F.col("batch_id") < F.lit(before_batch))
    return base.unionByName(deltas.select("mention", "canonical"))


def read_maintained_triples(spark: SparkSession, store_path: str) -> DataFrame:
    """The maintained triple store: union of every batch's delta."""
    schema = T.StructType(
        list(TRIPLE_SCHEMA.fields) + [T.StructField("batch_id", T.IntegerType())]
    )
    return _read_or_empty(spark, f"{store_path}/triples", schema).select(
        "subj", "pred", "obj", "obj_dtype", "is_literal"
    )


def maintenance_batch_fn(store_path: str, cfg: EngineConfig | None = None):
    """The ``foreachBatch`` closure. Exposed for direct testing: calling it
    twice with the same ``(batch_df, batch_id)`` must leave the store
    identical (replay idempotency)."""
    cfg = cfg or EngineConfig()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from ..plans.incremental import incremental_update

        spark = batch_df.sparkSession
        prior = read_catalog(spark, store_path, before_batch=int(batch_id))
        # vocabulary-scale; pin it so the attach plan doesn't re-read the
        # store mid-write (we overwrite delta dirs below)
        prior = prior.localCheckpoint(eager=True)
        res = incremental_update(spark, batch_df, prior, cfg)
        res.triples.write.mode("overwrite").parquet(
            f"{store_path}/triples/batch_id={int(batch_id)}"
        )
        res.canonical_delta.write.mode("overwrite").parquet(
            f"{store_path}/catalog_delta/batch_id={int(batch_id)}"
        )

    return process


def stream_kg_maintenance(
    spark: SparkSession,
    input_path: str,
    store_path: str,
    checkpoint_path: str,
    cfg: EngineConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """File-source turns → continuous catalog + triple-store maintenance.

    ``available_now=True`` drains the backlog and stops — the scheduled
    incremental-batch deployment; otherwise the query runs continuously.
    Returns the StreamingQuery; caller owns ``awaitTermination``."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    writer = (
        stream.writeStream.foreachBatch(maintenance_batch_fn(store_path, cfg))
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
