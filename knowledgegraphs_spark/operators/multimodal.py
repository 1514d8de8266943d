"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow batch
shape, feature schema) is real and tested. The actual codec work is STUBBED:
the container ships no image/audio libraries, so ``decode_payload`` raises
``NotImplementedError`` unless the deterministic fake codec is requested —
swap ``_fake_decode`` for a PIL/libav call shipped via ``--py-files`` and
nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents table: payload =
    md5-chained bytes of the text (opaque, binary, reproducible)."""
    payload = F.unhex(
        F.concat(F.md5(F.col(text_col)), F.md5(F.concat(F.lit("2|"), F.col(text_col))))
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            (F.col(id_col) % 10000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real codec: expands the payload into a
    fixed-size float array via an md5 chain over hex strings (hex, not raw
    bytes, so the DuckDB oracle — whose md5 only takes VARCHAR — computes
    the identical features). Replace with the real decoder."""
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    h = (payload or b"").hex()
    for i in range(FEATURE_DIM):
        h = hashlib.md5(h.encode("utf-8")).hexdigest()
        out[i] = np.float32(int(h[:8], 16) / 2**32)
    return out


def decode_payload(payload: bytes, kind: str, use_fake_codec: bool = False) -> np.ndarray:
    if use_fake_codec:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real media decoding requires codec libraries (PIL/libav) shipped via "
        "--py-files; pass use_fake_codec=True for the deterministic test codec"
    )


def extract_features(
    media: DataFrame, use_fake_codec: bool = False, batch_hint: int = 1024
) -> DataFrame:
    """media → (media_id, kind, features array<float>): Arrow-batched
    mapInPandas, one model/codec init per partition (not per row)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init hook: a real implementation loads the codec /
        # feature model HERE, once, then streams Arrow batches through it.
        for pdf in batches:
            feats = [
                decode_payload(p, k, use_fake_codec).tolist() if p is not None else None
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(_map, out_schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: updates metadata and passes the payload through the
    (stubbed) transcode hook — schema and partitioning are preserved."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )
