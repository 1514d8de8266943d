"""Deterministic text embeddings + cosine kernels (operators M1-M3 analog).

The north rule replaces the reference's BERT cross-encoder
(``bert_classifier.py:153-160``) with a broadcast-embedding + blocked-cosine
scorer. In this container no transformer weights are available, so the
default encoder is a **deterministic feature-hashing (hashing-trick) char
n-gram encoder** — a real, seedless, vectorized encoder whose geometry makes
near-identical surface forms score high cosine. The Spark-side plumbing
(distinct-string dedup → mapInPandas batch encode → broadcast join) is
exactly what a BERT encoder shipped via ``--py-files`` would use; swap
``encode_batch`` for a model forward pass and nothing else changes.

Reference parity notes: the reference embeds only DISTINCT strings and caches
(``InterpretHeaders.py:120-131``); we reproduce that as dropDuplicates →
encode → re-join. Determinism mirrors the reference's fixed seeding
(``bert_classifier.py:218-227``) — hashing needs no seed at all.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import MatchConfig


def _char_ngrams(text: str, n_lo: int, n_hi: int) -> list[str]:
    t = f" {text.lower().strip()} "
    out: list[str] = []
    for n in range(n_lo, n_hi + 1):
        out.extend(t[i : i + n] for i in range(len(t) - n + 1))
    return out


def encode_batch(
    texts: list[str], dim: int = 256, ngram_range: tuple[int, int] = (2, 3)
) -> np.ndarray:
    """L2-normalized hashing-trick embeddings, float32, shape (len, dim)."""
    vecs = np.zeros((len(texts), dim), dtype=np.float32)
    for i, text in enumerate(texts):
        for g in _char_ngrams(text or "", *ngram_range):
            h = zlib.crc32(g.encode("utf-8"))
            idx = (h >> 1) % dim
            sign = 1.0 if (h & 1) else -1.0
            vecs[i, idx] += sign
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vecs / norms


def encode_strings(
    df: DataFrame, text_col: str, out_col: str = "embedding", cfg: MatchConfig | None = None
) -> DataFrame:
    """Append an embedding column; one Arrow batch per ~10k rows.

    Callers should pass DISTINCT strings (dedup-then-enrich) — embedding the
    same surface twice is wasted compute at any scale.
    """
    from pyspark.sql import types as T

    cfg = cfg or MatchConfig()
    dim, ngr = cfg.embedding_dim, cfg.ngram_range
    # fresh StructType: .add() would mutate df's cached schema in place
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    cols = df.columns

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = encode_batch(pdf[text_col].fillna("").tolist(), dim, ngr)
            pdf = pdf[cols].copy()
            pdf[out_col] = list(vecs)
            yield pdf

    return df.mapInPandas(_map, schema=schema)


def cosine_col(a: Column, b: Column) -> Column:
    """JVM-side cosine over two array<float|double> columns.

    Sequential fold in index order (deterministic); inputs from
    ``encode_batch`` are already unit-norm so this is a plain dot product —
    but we normalize anyway so the kernel is safe for arbitrary vectors.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_py(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))
