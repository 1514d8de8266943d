"""Kafka sink (operator S15).

The reference publishes the final PII result to Kafka with ≤3 retries and
fire-and-forget semantics (``A_Coordinator/Kafka/KafkaProducerService.java:
28-55``). Spark-first: rows become JSON messages through the built-in
``kafka`` batch sink (``df.write.format("kafka")``), which needs the
``spark-sql-kafka-0-10`` package on the cluster classpath.

This sandbox has neither the connector jar nor a broker, so the sink also
ships a **stdlib wire-protocol producer** (Kafka Produce API v0 — the
legacy MessageSet format, stable since 0.8): each partition opens one
socket to the bootstrap broker and sends one length-prefixed produce
request, applying the reference's ≤3-retry loop per partition. That path
is exercised in tests against a local TCP stub broker that fully parses
the request (CRC-checked) — the same socket-level-evidence approach as
the GraphDB sink's local HTTP server (S14).

Scale shape: ``foreachPartition`` keeps the producing distributed (one
connection per partition, no driver collect); the connector path remains
the production default because it adds batching/acks/idempotence the
80-line stdlib producer intentionally does not reimplement.
"""

from __future__ import annotations

import io
import struct
import time
import zlib
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_messages(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Frame rows as (key, value) JSON messages — the serializable part of
    the sink, testable without a broker."""
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")
    if key_col is not None:
        return df.select(F.col(key_col).cast("string").alias("key"), value)
    return df.select(value)


# --- Produce API v0 wire encoding (stdlib only) ------------------------------


def _bytes_field(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _message(key: bytes | None, value: bytes) -> bytes:
    """One legacy Message: crc32(magic..value) + magic=0 + attributes=0."""
    body = struct.pack(">bb", 0, 0) + _bytes_field(key) + _bytes_field(value)
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def encode_produce_request_v0(
    topic: str,
    messages: Iterable[tuple[bytes | None, bytes]],
    correlation_id: int = 1,
    client_id: str = "kg-spark",
    acks: int = 1,
    timeout_ms: int = 10_000,
    partition: int = 0,
) -> bytes:
    """Length-prefixed ProduceRequest v0 for one topic-partition."""
    message_set = b"".join(
        struct.pack(">q", 0) + struct.pack(">i", len(m)) + m
        for m in (_message(k, v) for k, v in messages)
    )
    cid = client_id.encode("utf-8")
    tp = topic.encode("utf-8")
    payload = (
        struct.pack(">hhih", 0, 0, correlation_id, len(cid)) + cid
        + struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1)  # one topic
        + struct.pack(">h", len(tp)) + tp
        + struct.pack(">i", 1)  # one partition
        + struct.pack(">i", partition)
        + struct.pack(">i", len(message_set)) + message_set
    )
    return struct.pack(">i", len(payload)) + payload


def parse_produce_response_v0(data: bytes) -> tuple[int, int, int]:
    """(correlation_id, error_code, base_offset) of the first partition."""
    buf = io.BytesIO(data)
    (corr,) = struct.unpack(">i", buf.read(4))
    (n_topics,) = struct.unpack(">i", buf.read(4))
    assert n_topics >= 1
    (tlen,) = struct.unpack(">h", buf.read(2))
    buf.read(tlen)
    (n_parts,) = struct.unpack(">i", buf.read(4))
    assert n_parts >= 1
    _partition, error_code, offset = struct.unpack(">ihq", buf.read(14))
    return corr, error_code, offset


def _recv_exact(sock, n: int) -> bytes:
    chunks = []
    while n > 0:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("broker closed connection mid-response")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def produce_via_socket(
    bootstrap: str,
    topic: str,
    messages: list[tuple[bytes | None, bytes]],
    retries: int = 3,
    retry_wait_s: float = 0.2,
    timeout_s: float = 10.0,
) -> int:
    """Send one produce request over a raw socket, ≤``retries`` attempts
    (the reference's retry contract). Returns the broker-assigned base
    offset. Raises RuntimeError after the final failed attempt."""
    import socket

    if not messages:
        return 0
    host, _, port = bootstrap.partition(":")
    last: Exception | None = None
    for attempt in range(max(retries, 1)):
        try:
            with socket.create_connection((host, int(port or 9092)), timeout=timeout_s) as s:
                s.sendall(encode_produce_request_v0(topic, messages, correlation_id=attempt + 1))
                (size,) = struct.unpack(">i", _recv_exact(s, 4))
                corr, error_code, offset = parse_produce_response_v0(_recv_exact(s, size))
                if corr != attempt + 1:
                    raise RuntimeError(f"correlation mismatch: {corr} != {attempt + 1}")
                if error_code != 0:
                    raise RuntimeError(f"broker error_code={error_code}")
                return offset
        except Exception as ex:  # noqa: BLE001 — retry any transport/broker error
            last = ex
            time.sleep(retry_wait_s)
    raise RuntimeError(f"Kafka produce failed after {retries} attempts: {last}")


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = None,
    retries: int = 3,
    retry_wait_s: float = 1.0,
    transport: str = "connector",
) -> None:
    """Publish with the reference's ≤3-retry loop.

    ``transport="connector"``: the production path via
    ``df.write.format("kafka")`` (needs spark-sql-kafka-0-10 on the
    classpath) — raises RuntimeError with a clear message otherwise.
    ``transport="socket"``: the stdlib Produce-v0 path, one connection and
    one request per partition inside ``foreachPartition`` — no jar, no
    driver collect; retry runs per partition."""
    msgs = kafka_messages(df, key_col)
    if transport == "socket":
        has_key = key_col is not None

        def _send(rows) -> None:
            batch = [
                (
                    (r["key"].encode("utf-8") if has_key and r["key"] is not None else None),
                    r["value"].encode("utf-8"),
                )
                for r in rows
            ]
            produce_via_socket(
                bootstrap_servers, topic, batch, retries=retries, retry_wait_s=retry_wait_s
            )

        msgs.foreachPartition(_send)
        return
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
