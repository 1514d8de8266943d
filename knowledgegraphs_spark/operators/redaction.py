"""Text-level PII detection and redaction for training corpora.

The reference flags PII at the SCHEMA level — DO→DPV column mappings
(``j9``, ``ontology.py``) say "this column is personal data". A training
pipeline additionally needs the VALUE level: transcripts quote emails,
phone numbers, card and social-security numbers, IP addresses inline,
and those must be found and masked before text reaches a training run.
This module is the value-level complement: pattern-class detection and
replacement over the text column itself.

Design constraints, in order:

* **Pure Catalyst, shuffle-free.** Detection and redaction are one
  codegen'd projection over the scan (``regexp_count`` /
  ``regexp_replace`` — JVM regex, no Python in the row path). At 100 TB
  this runs at scan speed and pipelines into whatever follows.
* **Engine-portable patterns.** Every pattern stays in the common
  subset of Java regex (Spark) and RE2 (DuckDB/Go/Rust tooling): no
  lookaround, no backreferences — so the DuckDB value gate can run the
  IDENTICAL pattern text, and a corpus scrubbed here re-validates
  anywhere.
* **Sequential, order-pinned semantics.** Patterns apply in
  ``PII_PATTERNS`` order, each against the text as already redacted by
  the previous classes. Counts are measured the same way, so
  ``sum(counts) == number of replacements made`` holds exactly (an
  email is never double-counted as a phone number hiding inside it).

Pattern classes are deliberately high-precision/dumb-recall (the
C4/CCNet practice): a digit-boundary SSN/card/phone shape, an RFC-lite
email, a dotted-quad IP. Recall-heavy NER-style detection belongs in a
model pass; this operator is the cheap scan-level floor every corpus
gets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) — applied IN ORDER, each over the output
#: of the previous redaction. Patterns are Java-regex ∩ RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IPV4]"),
)


def _redacted_chain(text: Column) -> list[tuple[str, Column, Column]]:
    """``[(kind, count_on_current, text_after_kind), ...]`` — the shared
    progressive form detection and redaction both read from."""
    out = []
    cur = text
    for kind, pat, repl in PII_PATTERNS:
        cnt = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
        out.append((kind, cnt, cur))
    return out


def detect_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_<kind>`` (int) per pattern class, ``pii_total`` and
    ``has_pii``. Counts follow the sequential semantics above. NULL text
    → zero counts (nothing to leak)."""
    chain = _redacted_chain(F.coalesce(F.col(text_col), F.lit("")))
    out = docs
    total = F.lit(0)
    for kind, cnt, _ in chain:
        out = out.withColumn(f"n_{kind}", cnt.cast("int"))
        total = total + F.col(f"n_{kind}")
    return out.withColumn("pii_total", total.cast("int")).withColumn(
        "has_pii", F.col("pii_total") > 0
    )


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Add ``<text_col>_redacted`` (or ``out_col``): the text with every
    pattern class replaced by its mask, in ``PII_PATTERNS`` order. NULL
    text stays NULL."""
    chain = _redacted_chain(F.col(text_col))
    return docs.withColumn(out_col or f"{text_col}_redacted", chain[-1][2])


def scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detection counts + redacted text in one projection (one pass over
    the scan; Catalyst CSEs the shared prefix of the chain)."""
    return redact_pii(detect_pii(docs, text_col), text_col)
