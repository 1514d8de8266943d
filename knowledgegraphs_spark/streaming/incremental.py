"""Streaming structural-triple emission.

One logical plan shared with the batch path: ``emit_transcript_triples``
is a pure projection (single ``explode`` of a packed ``array<struct>``,
zero shuffle — see ``operators/triples.py``), so it lifts to a streaming
DataFrame unchanged. Exactly-once lands on the sink via the streaming
checkpoint; ``Trigger.AvailableNow`` turns the same job into an
incremental batch (process everything new, then stop) — the deployment
mode a 1000-executor cluster would run on a schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def streaming_triples(stream: DataFrame) -> DataFrame:
    """Apply the SAME normalization + emission plan the batch path uses.

    Conversation-row triples ride the ``turn_idx == 0`` marker row
    (``emit_transcript_triples`` default), which lands in exactly one
    micro-batch — so the streaming plan is fully STATELESS and still
    exactly-once: no dedup state store, no watermark, nothing to size.
    (With ``first_turn_marker=False`` the dropDuplicates fallback would
    become a stateful streaming dedup growing with distinct conv_ids.)"""
    from ..operators.po_extraction import transcript_po
    from ..operators.triples import emit_transcript_triples
    from ..sources.transcripts import ingest

    return emit_transcript_triples(ingest(stream, n_partitions=0), transcript_po())


def stream_transcript_triples(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """File-source → structural triples → parquet sink, exactly-once.

    ``available_now=True`` drains the backlog and stops (incremental batch);
    otherwise the query runs continuously. Returns the StreamingQuery —
    caller owns ``awaitTermination``."""
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    triples = streaming_triples(stream)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
