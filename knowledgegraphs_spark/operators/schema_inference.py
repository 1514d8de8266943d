"""Candidate-key and foreign-key inference (operators J2 + J3).

Reference semantics (``D_MappingGeneration/FormatSpecific/
TabularSpecificRules.java:57-144``):

* a column is a **candidate key** of its table when its unique-value set is
  as large as the table (``determineCandidateKeys``, ``:135-144``; nulls
  count as one value, mirroring Tablesaw's ``unique().asSet()``);
* for every other table owning a **same-named column**, that column is an
  FK iff all of its values appear in the candidate key column
  (``isCandFK`` → ``db.isJoin``, ``:117-130``; containment = anti-join,
  ``Connectors/SQLConnector.java:101-125``);
* when several tables expose a same-named candidate key, the reference's
  ``HashMap.put`` in table order means the **last table wins**
  (``:66-92``) — we keep that tie-break explicit and deterministic.

Spark-first shape: candidate-key detection is ONE aggregate pass per table
(conditional counters, partial+final hash agg — a single full scan at any
scale); containment is a ``left_anti`` join on distinct keys, with the
candidate-key side broadcast when small. No per-row loops, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ForeignKey:
    src_table: str
    src_column: str
    ref_table: str
    ref_column: str


def candidate_keys(df: DataFrame, columns: list[str] | None = None) -> set[str]:
    """Columns whose distinct-value count (counting NULL as one value)
    equals the row count — one aggregate pass over all columns at once."""
    cols = columns or df.columns
    row = (
        df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.countDistinct(F.col(c)).alias(f"d__{c}") for c in cols],
            *[
                F.max(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"hn__{c}")
                for c in cols
            ],
        )
        .collect()[0]
        .asDict()
    )
    n = row["__n"]
    return {c for c in cols if row[f"d__{c}"] + (row[f"hn__{c}"] or 0) == n}


def contains_all(src: DataFrame, src_col: str, ref: DataFrame, ref_col: str) -> bool:
    """J2: every non-null value of ``src.src_col`` appears in
    ``ref.ref_col``. Distinct-then-anti-join keeps the shuffle at
    vocabulary size; ``isEmpty`` stops at the first counterexample."""
    s = src.select(F.col(src_col).alias("__v")).filter(F.col("__v").isNotNull()).distinct()
    r = ref.select(F.col(ref_col).alias("__v")).distinct()
    return s.join(r, "__v", "left_anti").isEmpty()


def infer_foreign_keys(
    tables: dict[str, DataFrame], columns: dict[str, list[str]] | None = None
) -> list[ForeignKey]:
    """J3 over an *ordered* table dict (insertion order = the reference's
    ``tablesList`` order; last same-named candidate key wins).

    ``columns`` optionally restricts the candidate/FK search per table —
    at 100 TB you point this at key-like columns instead of free text.
    """
    # 1. candidate keys per table; later tables overwrite earlier picks
    pick: dict[str, str] = {}
    for t, df in tables.items():
        cols = (columns or {}).get(t, df.columns)
        for c in candidate_keys(df, cols):
            pick[c] = t

    fks: list[ForeignKey] = []
    if len(tables) < 2:
        return fks

    # 2. same-named columns elsewhere: containment test against the pick
    for t, df in tables.items():
        cols = (columns or {}).get(t, df.columns)
        for c in cols:
            ref_t = pick.get(c)
            if ref_t is None or ref_t == t:
                continue
            if contains_all(df, c, tables[ref_t], c):
                fks.append(ForeignKey(t, c, ref_t, c))
    return fks
