"""Mention detection (pipeline stage 3 — SURVEY.md §7).

The scaled analog of the reference's per-value parsing (S5/X-ops): each
turn's text yields entity mentions. Fully JVM-side — ``regexp_extract_all``
+ ``posexplode``; no Python in this stage. The patterns are deliberately
simple and deterministic (proper-name spans, ALL-CAPS abbreviations,
snake_case identifiers) so the pure-Python oracle reproduces them exactly;
a model-based detector would slot in as a ``mapInPandas`` over the same
(conv_id-partitioned) frame without changing the plan shape.

Output: mentions(conv_id, turn_idx, mention, kind, pos) where pos is the
occurrence ordinal within (turn, kind) — part of the deterministic mention
URI, so no global counters (reference uses per-record counters,
``InsertDataJSON.java:231-245``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# proper-name spans: ≥2 capitalized words / initials ("John Smith", "J. Smith",
# "Acme Corporation"); ALL-CAPS abbreviations ("CAD", "SSN"); snake_case
# identifiers ("acct_no", "search_web").
MENTION_PATTERNS: dict[str, str] = {
    "name": r"(?:[A-Z][a-z]+|[A-Z]\.)(?:\s+(?:[A-Z][a-z]+|[A-Z]\.))+",
    "abbrev": r"\b[A-Z]{2,5}\b",
    "ident": r"\b[a-z]+_[a-z]+\b",
}

_COMPILED = {k: re.compile(v) for k, v in MENTION_PATTERNS.items()}


def extract_mentions_python(text: str) -> list[tuple[str, str, int]]:
    """Pure-Python twin for the oracle: [(mention, kind, pos)]."""
    out = []
    for kind, rx in _COMPILED.items():
        for pos, m in enumerate(rx.findall(text or "")):
            out.append((m, kind, pos))
    return out


def extract_mentions(turns: DataFrame) -> DataFrame:
    """mentions(conv_id, turn_idx, mention, kind, pos) — single scan: all
    pattern kinds are collected into one array of structs per row, then
    exploded once (a per-kind union would rescan the input per pattern)."""
    nonnull = turns.filter(F.col("text").isNotNull()).select("conv_id", "turn_idx", "text")
    kind_arrays = [
        F.transform(
            F.regexp_extract_all("text", F.lit(pattern), 0),
            lambda m, i: F.struct(
                m.alias("mention"), F.lit(kind).alias("kind"), i.cast("int").alias("pos")
            ),
        )
        for kind, pattern in MENTION_PATTERNS.items()
    ]
    return nonnull.select(
        "conv_id", "turn_idx", F.explode(F.concat(*kind_arrays)).alias("m")
    ).select("conv_id", "turn_idx", "m.mention", "m.kind", "m.pos")


def distinct_surfaces(mentions: DataFrame) -> DataFrame:
    """Distinct mention strings with frequency — the dedup-then-enrich input
    to embedding/matching (reference caches distinct strings,
    ``InterpretHeaders.py:120-131``). Cardinality is vocabulary-sized, orders
    of magnitude below the mention count at 10^12-turn scale."""
    return mentions.groupBy("mention").agg(F.count(F.lit(1)).alias("freq"))
