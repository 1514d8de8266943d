"""Space-filling-curve file layout: Z-order (Morton) interleaving.

At 100 TB the dominant read cost is how many files a multi-predicate
query must open. Sorting by a single column clusters only that column;
interleaving the bits of several keys (the Morton / Z-order curve —
what Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's sort-order rewrite
implement) gives every interleaved column locality at once, so min/max
row-group statistics prune files for predicates on ANY of them.

The code is a pure codegen'd projection (bit shifts and ors — no UDF,
no shuffle); the layout step is one ``repartitionByRange`` on the code
plus an intra-partition sort, i.e. exactly one range-exchange pass over
the corpus, the same cost as any global sort.

The reference has no storage-layout stage (single-machine, GraphDB-
resident); this belongs to the engine's lakehouse surface next to
``write_triples``'s bucketed store layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_code", "zorder_layout"]


def zorder_code(cols: list[Column], bits: int = 21) -> Column:
    """Morton code: interleave the low ``bits`` bits of each column
    (non-negative integers) into one long — bit ``i`` of column ``j``
    lands at position ``i * k + j``. ``k * bits`` must fit a signed
    long; values ≥ 2**bits alias into the same high cells (callers pick
    ``bits`` to cover their key range — 21 covers 2M keys for 2
    columns). Pure integer arithmetic: identical in any engine."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_code: need at least one column")
    if k * bits > 62:
        raise ValueError(f"zorder_code: {k} cols x {bits} bits overflows a long")
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1).cast("long"))
            out = out.bitwiseOR(F.shiftleft(bit, i * k + j))
    return out


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 21
) -> DataFrame:
    """Lay ``df`` out in Z-order across ``n_files`` range partitions:
    one range exchange on the Morton code + an intra-partition sort.
    Write the result with a plain ``.write.parquet`` — every file then
    covers a compact Z-curve segment, so parquet min/max stats prune on
    every interleaved column."""
    coded = df.withColumn("__z", zorder_code([F.col(c) for c in cols], bits))
    return (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
