"""N-Triples source — line-splittable RDF ingestion, pure Catalyst.

The import half of the bulk-interchange path (`sinks/ntriples.py` is the
export half; the reference reads serialized graphs through Jena/rdflib —
``util/Ontology.java``, ``extractBertMapMappings.py:54-56``). Where the
Turtle source must parse whole documents inside ``mapInPandas`` (Turtle
statements span lines), N-Triples is one self-contained statement per
line, so:

* **splitting**: ``spark.read.text`` chunks even a single multi-TB
  ``.nt`` file into scan tasks by ``maxPartitionBytes`` — parallelism is
  data size, not file count;
* **parsing**: one anchored regex + a fixed replace chain, all codegen'd
  column expressions — NO Python in the row path at all (the Turtle
  source cannot make that claim).

Literal unescaping decodes the five string escapes (``\\\\ \\" \\n \\r
\\t``) with a sentinel two-phase replace: first ``\\\\`` → NUL (N-Triples
forbids raw control characters, so NUL cannot occur in wire data), then
the four single-character escapes, then NUL → backslash — left-to-right
non-overlapping replacement makes this exact. Numeric escapes
(``\\uXXXX``/``\\UXXXXXXXX``) and any other backslash use fail strict
mode rather than decode silently wrong (``strict=False`` drops those
lines; a corpus that needs full ``\\u`` fidelity re-serializes through
the Turtle path, whose Python parser decodes them).

Compaction mirrors the sink's total expansion: strip ``VOCAB_BASE`` back
to the bare term, compact known prefix bases to qnames, keep unknown
absolute IRIs verbatim; ``xsd:string`` is the implicit dtype of plain
literals, lang tags come back as ``@tag`` in ``obj_dtype``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.ntriples import VOCAB_BASE, _ABS_IRI_RE
from ..sinks.turtle import DEFAULT_PREFIXES

#: anchored statement grammar. groups: 1 subj IRI, 2 pred IRI, 3 obj IRI,
#: 4 raw literal body, 5 dtype IRI, 6 lang tag, 7 blank-node label (subj
#: position disallowed here: the engine's stores are skolemized — the
#: sink never emits blanks; strict mode surfaces them instead of guessing)
_STMT = (
    r'^\s*<([^>]*)>\s+<([^>]*)>\s+'
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([A-Za-z][A-Za-z0-9\-]*))?|(_:\S+))'
    r"\s*\.\s*$"
)
_SKIP = r"^\s*(#.*)?$"  # blank lines and comments
_NUL = "\x00"


def _unescape(c: Column) -> Column:
    out = F.replace(c, F.lit("\\\\"), F.lit(_NUL))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit("\\t"), F.lit("\t"))
    return F.replace(out, F.lit(_NUL), F.lit("\\"))


def compact_term(iri: Column, prefixes: dict[str, str] | None = None) -> Column:
    """Absolute IRI → the engine's compact store term (sink inverse)."""
    p = prefixes or DEFAULT_PREFIXES
    out = F.when(iri.startswith(VOCAB_BASE), F.substr(iri, F.lit(len(VOCAB_BASE) + 1)))
    # longest base first so nested namespaces compact to the tighter qname
    for k, base in sorted(p.items(), key=lambda kv: -len(kv[1])):
        out = out.when(
            iri.startswith(base), F.concat(F.lit(k + ":"), F.substr(iri, F.lit(len(base) + 1)))
        )
    return out.otherwise(iri)


def read_ntriples(
    spark: SparkSession,
    path: str,
    compact: bool = True,
    prefixes: dict[str, str] | None = None,
    strict: bool = True,
) -> DataFrame:
    """Parse ``.nt`` text into ``(subj, pred, obj, obj_dtype, is_literal)``.

    ``strict=True`` raises (executor-side ``assert_true``, fails fast on
    the first bad split) on unparseable statements, blank-node subjects,
    or unsupported escapes; ``strict=False`` silently drops those lines
    — the bulk-salvage mode for third-party dumps."""
    lines = spark.read.text(path).where(~F.col("value").rlike(_SKIP))
    v = F.col("value")
    g = lambda i: F.regexp_extract(v, _STMT, i)  # noqa: E731
    parsed = lines.select(
        v,
        g(1).alias("s_iri"),
        g(2).alias("p_iri"),
        g(3).alias("o_iri"),
        g(4).alias("o_lit"),
        g(5).alias("dt_iri"),
        g(6).alias("lang"),
        v.rlike(_STMT).alias("ok"),
        # a matched line is a literal iff the object wasn't an IRI;
        # regexp_extract returns '' for non-participating groups, so the
        # literal/IRI split needs the raw text shape, not group emptiness
        v.rlike(r'>\s+"').alias("is_lit_shape"),
    )
    is_literal = F.col("ok") & F.col("is_lit_shape")
    # pair-scanning validity: every backslash must start one of the five
    # decodable escapes (a char-at-a-time check would misread the 'n' in
    # '\\\\n' — escaped backslash then letter n — as an escape)
    good_escapes = F.col("o_lit").rlike(r'^(?:[^\\]|\\[tnr"\\])*$')
    bad_escape = is_literal & ~good_escapes
    has_blank = F.col("ok") & (g(7) != "")  # skolemized stores only
    supported = F.col("ok") & ~bad_escape & ~has_blank
    if strict:
        chk = F.assert_true(supported, F.concat(F.lit("N-Triples: bad statement: "), v))
        # fold the assertion into a kept column so Catalyst can't prune it
        subj = F.when(chk.isNull(), F.col("s_iri"))
    else:
        parsed = parsed.where(supported)
        subj = F.col("s_iri")
    dtype = (
        F.when(F.col("lang") != "", F.concat(F.lit("@"), F.col("lang")))
        .when(F.col("dt_iri") != "", F.col("dt_iri"))
        .otherwise(F.lit("http://www.w3.org/2001/XMLSchema#string"))
    )
    out = parsed.select(
        subj.alias("subj"),
        F.col("p_iri").alias("pred"),
        F.when(is_literal, _unescape(F.col("o_lit"))).otherwise(F.col("o_iri")).alias("obj"),
        F.when(is_literal, dtype).otherwise(F.lit(None).cast("string")).alias("obj_dtype"),
        is_literal.alias("is_literal"),
    )
    if not compact:
        return out
    cp = lambda c: compact_term(c, prefixes)  # noqa: E731
    dt_compact = F.when(
        F.col("obj_dtype").startswith("@") | F.col("obj_dtype").isNull(), F.col("obj_dtype")
    ).otherwise(cp(F.col("obj_dtype")))
    return out.select(
        cp(F.col("subj")).alias("subj"),
        cp(F.col("pred")).alias("pred"),
        F.when(F.col("is_literal"), F.col("obj")).otherwise(cp(F.col("obj"))).alias("obj"),
        dt_compact.alias("obj_dtype"),
        "is_literal",
    )
