"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow batch
shape, feature schema) is real and tested. Codec coverage:

- **Real, stdlib-decodable formats** go all the way through: uncompressed
  24/32-bit BMP (``struct`` header parse + numpy pixel stats) and PCM WAV
  (stdlib ``wave``) decode into the same FEATURE_DIM vector through the
  production ``mapInPandas`` path — no fake, no external library.
- Everything else (JPEG/PNG/MP4/...) still raises ``NotImplementedError``
  unless the deterministic fake codec is requested — swap in a PIL/libav
  call shipped via ``--py-files`` and nothing else changes.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER) → feature vector:
    [modality=1, width, height, channels, mean/std per BGR channel,
    global min/max, 0-pad]. Pure struct + numpy; rows are 4-byte padded,
    bottom-up when height > 0 (orientation doesn't change the stats)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={compression} bpp={bpp} unsupported")
    n_ch = bpp // 8
    h = abs(height)
    row_bytes = (width * n_ch + 3) & ~3
    px = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    px = px.reshape(h, row_bytes)[:, : width * n_ch].reshape(h, width, n_ch)
    chans = px.reshape(-1, n_ch).astype(np.float64)
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[0] = 1.0
    out[1], out[2], out[3] = float(width), float(h), float(n_ch)
    means, stds = chans.mean(axis=0), chans.std(axis=0)
    out[4 : 4 + min(n_ch, 4)] = means[:4]
    out[8 : 8 + min(n_ch, 4)] = stds[:4]
    out[12], out[13] = float(chans.min()), float(chans.max())
    return out


def _decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV (stdlib ``wave``) → feature vector: [modality=2, channels,
    framerate, n_frames, duration_s, mean, std, rms, min, max, zero-
    crossing rate, 0-pad]."""
    with wave.open(io.BytesIO(payload)) as w:
        n_ch, sampwidth, framerate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sampwidth} unsupported")
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    out[0] = 2.0
    out[1], out[2], out[3] = float(n_ch), float(framerate), float(n_frames)
    out[4] = n_frames / framerate if framerate else 0.0
    if samples.size:
        out[5], out[6] = float(samples.mean()), float(samples.std())
        out[7] = float(np.sqrt((samples**2).mean()))
        out[8], out[9] = float(samples.min()), float(samples.max())
        out[10] = float((np.diff(np.signbit(samples)) != 0).mean()) if samples.size > 1 else 0.0
    return out


def decode_payload(payload: bytes, kind: str, use_fake_codec: bool = False) -> np.ndarray:
    if use_fake_codec:
        return _fake_decode(payload)
    # real, stdlib-decodable containers take the production path end-to-end
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"no stdlib decoder for this {kind} payload (BMP and PCM WAV decode "
        "natively); ship a PIL/libav decoder via --py-files, or pass "
        "use_fake_codec=True for the deterministic test codec"
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
