"""Kafka sink (operator S15).

The reference publishes the final PII result to Kafka with ≤3 retries and
fire-and-forget semantics (``A_Coordinator/Kafka/KafkaProducerService.java:
28-55``). Spark-first: rows become JSON messages through the built-in
``kafka`` batch sink (`df.write.format("kafka")`), which needs the
``spark-sql-kafka-0-10`` package on the cluster classpath — this sandbox
has no broker or connector jar, so the call is import-gated and unit tests
only cover the message-framing projection."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_messages(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Frame rows as (key, value) JSON messages — the serializable part of
    the sink, testable without a broker."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col is not None:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = None,
    retries: int = 3,
    retry_wait_s: float = 1.0,
) -> None:
    """Publish with the reference's ≤3-retry loop. Raises RuntimeError with
    a clear message when the Kafka connector is not on the classpath."""
    msgs = kafka_messages(df, key_col)
    last: Exception | None = None
    for _ in range(max(retries, 1)):
        try:
            (
                msgs.write.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("topic", topic)
                .save()
            )
            return
        except Exception as ex:  # connector missing or broker down
            last = ex
            time.sleep(retry_wait_s)
    raise RuntimeError(
        "Kafka sink failed after retries — is spark-sql-kafka-0-10 on the "
        f"classpath and the broker reachable? Last error: {last}"
    )
