"""N-Triples sink — the line-splittable RDF interchange format.

``sinks/turtle.py`` writes the engine's compact store form, but Turtle
is NOT line-splittable (statements span lines, prefixes are file-scoped
via the ``_prefixes.ttl`` sidecar), so the read-side unit of parallelism
is the file. N-Triples is the format built for bulk exchange: one
self-contained statement per line, absolute IRIs, no document state —
a single 10-TB ``.nt`` file splits into scan tasks by
``spark.sql.files.maxPartitionBytes`` with zero coordination. This sink
is the export half of that path (``sources/ntriples_source.py`` is the
import half); the reference's equivalent surface is the same Jena model
serialization family as its TTL writer (``InsertDataBase.java:226-260``).

Everything is a column expression (escape, quote, IRI expansion — all
codegen'd), so serialization is distributed text output with no shuffle.

Term expansion (total — no data-dependent failures): a term that already
looks like an absolute IRI passes through; a ``prefix:local`` with a
known prefix expands against the map; EVERYTHING else (the engine's bare
local names like ``has_name``, or an unknown ``weird:thing``) goes under
``VOCAB_BASE`` verbatim, which the source compacts back by stripping the
base — so arbitrary store content round-trips exactly while the output
stays valid, absolute-IRI N-Triples for external tools. Lang-tagged
literals (``obj_dtype = '@tag'``) serialize as ``"lit"@tag`` — the
asymmetry documented in the Turtle sink does not exist here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .turtle import DEFAULT_PREFIXES, _escape

#: namespace for the engine's bare local names (and any term that is
#: neither an absolute IRI nor a known-prefix qname)
VOCAB_BASE = "http://example.org/kg/vocab#"

#: absolute-IRI detector (RFC 3986 scheme followed by '//')
_ABS_IRI_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def expand_term(term: Column, prefixes: dict[str, str] | None = None) -> Column:
    """Compact store term → absolute IRI string (no angle brackets)."""
    p = prefixes or DEFAULT_PREFIXES
    pre = F.substring_index(term, ":", 1)
    rest = F.substr(term, F.length(pre) + F.lit(2))
    out = F.when(term.rlike(_ABS_IRI_RE), term)
    for k in sorted(p):
        out = out.when(pre == F.lit(k), F.concat(F.lit(p[k]), rest))
    return out.otherwise(F.concat(F.lit(VOCAB_BASE), term))


def _obj_term(obj: Column, is_literal: Column, dtype: Column, prefixes) -> Column:
    lit = F.concat(F.lit('"'), _escape(obj), F.lit('"'))
    typed = (
        F.when(dtype.startswith("@"), F.concat(lit, dtype))
        .when(
            dtype.isNotNull() & (dtype != "xsd:string"),
            F.concat(lit, F.lit("^^<"), expand_term(dtype, prefixes), F.lit(">")),
        )
        .otherwise(lit)
    )
    iri = F.concat(F.lit("<"), expand_term(obj, prefixes), F.lit(">"))
    return F.when(is_literal, typed).otherwise(iri)


def nt_lines(triples: DataFrame, prefixes: dict[str, str] | None = None) -> DataFrame:
    """``triples(subj, pred, obj, obj_dtype, is_literal)`` → one-column
    DF of N-Triples statements (absolute IRIs, one per line)."""
    return triples.select(
        F.concat(
            F.lit("<"), expand_term(F.col("subj"), prefixes), F.lit("> <"),
            expand_term(F.col("pred"), prefixes), F.lit("> "),
            _obj_term(F.col("obj"), F.col("is_literal"), F.col("obj_dtype"), prefixes),
            F.lit(" ."),
        ).alias("value")
    )


def write_ntriples(
    triples: DataFrame, path: str, prefixes: dict[str, str] | None = None
) -> None:
    """Distributed NT write: plain text part files, no sidecar needed —
    every line is self-contained (that's the point of the format)."""
    nt_lines(triples, prefixes).write.mode("overwrite").text(path)
