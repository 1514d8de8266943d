"""M5 analog: deterministic encoder fine-tuning on synonym pairs.

The reference fine-tunes its BERT synonym classifier offline on labeled
synonym/non-synonym pairs (``bert_classifier.py:194-227``, epochs/batches
``bertmap_main.py:134-135``) and the pipeline then loads the checkpoint.
Under the north rule the encoder is the hashing-trick model, so the
trainable object is the linear projection the M1 weight-loading seam
already consumes: fit ``W`` minimizing

    Σ_pairs ||enc(a)·W − enc(b)||²  +  reg·||W||²

over the labeled synonym pairs — plain ridge regression, solved in closed
form. Spark-first shape: the normal-equation moments ``XᵀX`` and ``XᵀY``
are partial-aggregated per partition inside ONE ``mapInPandas`` pass
(each partition emits a single flattened (d², 2) moment row — Arrow
batches in, d×d numpy out), summed driver-side, and the d×d solve is a
trivial driver step (d=256 → 0.5 MB matrices). No SGD, no seed, no
epochs: the global optimum, bit-reproducible anywhere — the determinism
contract the reference approximates with fixed seeding
(``bert_classifier.py:218-227``).

The result round-trips through :func:`save`/``np.savez`` into
``MatchConfig.weights_path``, i.e. the exact artifact the matcher's
load-once-per-worker seam ships via ``--py-files``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..config import MatchConfig
from .embeddings import encode_batch


def _moments(pairs: DataFrame, cfg: MatchConfig) -> tuple[np.ndarray, np.ndarray, int]:
    """(XᵀX, XᵀY, n) over pairs(a, b) — one distributed pass, one tiny
    driver collect (one row of 2·d² doubles per partition)."""
    dim, ngr = cfg.embedding_dim, cfg.ngram_range

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        xtx = np.zeros((dim, dim), dtype=np.float64)
        xty = np.zeros((dim, dim), dtype=np.float64)
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            xa = encode_batch(pdf["a"].fillna("").tolist(), dim, ngr).astype(np.float64)
            xb = encode_batch(pdf["b"].fillna("").tolist(), dim, ngr).astype(np.float64)
            xtx += xa.T @ xa
            xty += xa.T @ xb
            n += len(pdf)
        yield pd.DataFrame(
            {"xtx": [xtx.ravel().tolist()], "xty": [xty.ravel().tolist()], "n": [n]}
        )

    rows = (
        pairs.select("a", "b")
        .mapInPandas(part, "xtx array<double>, xty array<double>, n long")
        .collect()
    )
    xtx = np.zeros((dim, dim), dtype=np.float64)
    xty = np.zeros((dim, dim), dtype=np.float64)
    n = 0
    for r in rows:
        xtx += np.array(r["xtx"], dtype=np.float64).reshape(dim, dim)
        xty += np.array(r["xty"], dtype=np.float64).reshape(dim, dim)
        n += r["n"]
    return xtx, xty, n


def fit_projection(
    pairs: DataFrame, cfg: MatchConfig | None = None, reg: float = 1e-3
) -> np.ndarray:
    """Closed-form ridge fit of the (dim, dim) float32 projection on
    synonym pairs ``(a, b)``. ``reg`` > 0 keeps the solve well-posed when
    the pair set spans fewer than dim directions."""
    cfg = cfg or MatchConfig()
    xtx, xty, n = _moments(pairs, cfg)
    if n == 0:
        return np.eye(cfg.embedding_dim, dtype=np.float32)
    w = np.linalg.solve(xtx + reg * np.eye(cfg.embedding_dim), xty)
    return w.astype(np.float32)


def objective(pairs: DataFrame, w: np.ndarray, cfg: MatchConfig | None = None) -> float:
    """Mean ||enc(a)·W − enc(b)||² over the pairs — the trained loss,
    usable as a held-out metric. Same one-pass moment shape."""
    cfg = cfg or MatchConfig()
    xtx, xty, n = _moments(pairs, cfg)
    if n == 0:
        return 0.0
    # Σ||xW − y||² = tr(Wᵀ XᵀX W) − 2 tr(Wᵀ XᵀY) + Σ||y||²; for unit-norm
    # rows Σ||y||² = n
    w64 = w.astype(np.float64)
    val = float(np.trace(w64.T @ xtx @ w64) - 2.0 * np.trace(w64.T @ xty) + n)
    return val / n


def save_projection(path: str, w: np.ndarray) -> str:
    np.savez(path, weights=w.astype(np.float32))
    return path
