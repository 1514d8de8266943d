"""RDFS forward-chaining entailment materialization over the triple table.

The reference delegates inference to GraphDB — its repository config asks
for an RDFS ruleset and every uploaded graph is implicitly closed under
it (E_CreateKG/GraphDB.java creates the repo, queries then see entailed
triples). This engine makes that explicit and distributed: one stratified
pass over the standard rho-df rule set materializes the entailment so
downstream SPARQL/BGP queries (operators/sparql.py) read inferred triples
at scan speed instead of paying inference per query.

Rules (names from the W3C RDFS entailment rules / OWL 2 RL tables):

- ``scm-spo``  subPropertyOf transitivity   (closure, pointer doubling)
- ``scm-sco``  subClassOf transitivity      (closure, pointer doubling)
- ``prp-spo1`` (s p o), (p sub+ q) -> (s q o)
- ``prp-dom``  (s p o), (p domain c) -> (s rdf:type c)
- ``prp-rng``  (s p o), (p range  c) -> (o rdf:type c)
- ``cax-sco``  (x rdf:type c), (c sub+ d) -> (x rdf:type d)

Stratification makes one pass complete: property-closure first, then
``prp-spo1`` (so a subproperty of ``rdfs:subClassOf``/``domain``/``range``
contributes schema triples before those are read), then domain/range,
then class closure, then ``cax-sco`` over every type triple base or
derived. The only derivations a single pass cannot reach are the
pathological meta-loops (a *derived* ``rdfs:subPropertyOf`` triple, i.e.
a subproperty OF ``rdfs:subPropertyOf`` itself) — the same finite
fragment every production materializer (GraphDB's rdfs ruleset included)
evaluates; documented here rather than hidden behind a fixpoint loop
that would re-scan the instance data for a case real ontologies don't
contain.

Scale shape (the part that matters at 100 TB): the schema side of every
rule — the two closures plus the domain/range maps — is TBox-sized
(thousands of rows when the instance side is billions), so each rule is
a **broadcast hash join against the instance scan**: zero instance-side
shuffle, no iteration over instance data (the only loops are the
pointer-doubling closures over schema edges, O(log depth) rounds on a
vocabulary-sized relation). The one full-width shuffle is the final
set-semantics dedup, and the store-side entry point avoids even that by
handing the derived triples to the bucket-pruned anti-join/append used
by SPARQL Update (``_append_new``): untouched buckets are never read or
written.

Reference parity anchors: GraphDB-side inference E_CreateKG/GraphDB.java
(repo config ruleset), the ancestor walk util/Ontology.java:174-209
(the ``rdfs:subClassOf*`` closure this materializes), predicate
vocabulary Resources of the POextractor package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ontology import ancestor_closure_df

__all__ = ["rdfs_materialize", "materialize_store", "owl_sameas_smush"]

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"

# each vocabulary term in both surface forms the triple table uses:
# compact (the engine's kg-emission convention) and full IRI (Turtle /
# RDF/XML sources with expand_prefixes=True)
_FORMS = {
    "type": ("rdf:type", _RDF + "type"),
    "subClassOf": ("rdfs:subClassOf", _RDFS + "subClassOf"),
    "subPropertyOf": ("rdfs:subPropertyOf", _RDFS + "subPropertyOf"),
    "domain": ("rdfs:domain", _RDFS + "domain"),
    "range": ("rdfs:range", _RDFS + "range"),
}
_VOCAB_PREDS = [v for forms in _FORMS.values() for v in forms]


def _emit_form(triples: DataFrame) -> int:
    """0 = compact (``rdf:type``), 1 = full IRI — whichever convention
    the input's own vocabulary triples use (majority vote over the
    vocabulary predicates actually present; vocabulary-sized collect).
    Derived triples are emitted in the same convention so they join and
    dedupe against the base graph instead of forking a parallel
    vocabulary."""
    counts = (
        triples.filter(F.col("pred").isin(_VOCAB_PREDS))
        .groupBy("pred")
        .count()
        .collect()
    )
    full = sum(r["count"] for r in counts if r["pred"].startswith("http"))
    compact = sum(r["count"] for r in counts if not r["pred"].startswith("http"))
    return 1 if full > compact else 0


def _edges(triples: DataFrame, term: str) -> DataFrame:
    """(child, parent) pairs under either surface form of ``term``."""
    return triples.filter(F.col("pred").isin(list(_FORMS[term]))).select(
        F.col("subj").alias("child"), F.col("obj").alias("parent")
    )


def rdfs_materialize(
    triples: DataFrame,
    include_base: bool = True,
    broadcast_schema: bool = True,
) -> DataFrame:
    """The RDFS closure of ``triples`` as ``(subj, pred, obj)``.

    ``include_base=False`` returns only the *derived* triples not already
    asserted (the store-side append path wants exactly these).
    ``broadcast_schema`` gates the broadcast hint on the schema-side
    relations — on by default (they are TBox-sized); turn off only for a
    degenerate graph whose schema rivals its instance data, where the
    shuffle join is the safe plan.
    """
    spo = ["subj", "pred", "obj"]
    base = triples.select(*spo)
    form = _emit_form(base)
    t_type, t_sco, t_spo = (_FORMS[k][form] for k in ("type", "subClassOf", "subPropertyOf"))

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_schema else df

    # -- stratum 1: property hierarchy, then prp-spo1 ---------------------
    spo_cl = ancestor_closure_df(_edges(base, "subPropertyOf")).localCheckpoint(eager=True)
    derived_spo1 = (
        base.join(_b(spo_cl), base["pred"] == spo_cl["node"])
        .select("subj", F.col("anc").alias("pred"), "obj")
    )
    # schema statements derived through a subproperty of a vocabulary term
    # (e.g. ex:narrowerThan <= rdfs:subClassOf) must feed later strata,
    # so the graph the remaining rules read is base + spo1 derivations
    g1 = base.unionByName(derived_spo1)

    # -- stratum 2: domain / range ---------------------------------------
    dom = _edges(g1, "domain").select(F.col("child").alias("p"), F.col("parent").alias("c"))
    rng = _edges(g1, "range").select(F.col("child").alias("p"), F.col("parent").alias("c"))
    derived_dom = g1.join(_b(dom), g1["pred"] == dom["p"]).select(
        "subj", F.lit(t_type).alias("pred"), F.col("c").alias("obj")
    )
    derived_rng = g1.join(_b(rng), g1["pred"] == rng["p"]).select(
        F.col("obj").alias("subj"), F.lit(t_type).alias("pred"), F.col("c").alias("obj")
    )

    # -- stratum 3: class hierarchy, then cax-sco ------------------------
    sco_cl = ancestor_closure_df(_edges(g1, "subClassOf")).localCheckpoint(eager=True)
    types0 = (
        g1.filter(F.col("pred").isin(list(_FORMS["type"])))
        .select(*spo)
        .unionByName(derived_dom)
        .unionByName(derived_rng)
    )
    derived_cax = (
        types0.join(_b(sco_cl), types0["obj"] == sco_cl["node"])
        .select("subj", F.lit(t_type).alias("pred"), F.col("anc").alias("obj"))
    )

    # -- schema transitivity output (scm-sco / scm-spo) ------------------
    derived_scm = (
        sco_cl.select(
            F.col("node").alias("subj"), F.lit(t_sco).alias("pred"), F.col("anc").alias("obj")
        )
        .unionByName(
            spo_cl.select(
                F.col("node").alias("subj"), F.lit(t_spo).alias("pred"), F.col("anc").alias("obj")
            )
        )
    )

    derived = (
        derived_spo1.unionByName(derived_dom)
        .unionByName(derived_rng)
        .unionByName(derived_cax)
        .unionByName(derived_scm)
    )
    if include_base:
        return base.unionByName(derived).dropDuplicates(spo)
    return derived.dropDuplicates(spo).join(base, on=spo, how="left_anti")


_SAMEAS = ("owl:sameAs", "http://www.w3.org/2002/07/owl#sameAs")


def owl_sameas_smush(
    triples: DataFrame,
    keep_links: bool = True,
    broadcast_mapping: bool = True,
    cfg=None,
) -> DataFrame:
    """OWL identity "smushing": the eq-* fragment of OWL 2 RL
    (eq-sym, eq-trans, eq-rep-s, eq-rep-o) applied as canonicalization
    rather than materialization.

    Materializing sameAs entailment literally (every triple copied onto
    every member of every identity cluster) multiplies the store by the
    cluster size — the classic sameAs blow-up. The equivalent queryable
    form is to pick ONE representative per identity cluster and rewrite:
    symmetry+transitivity collapse into connected components over the
    ``owl:sameAs`` edges (the engine's large-star/small-star machinery,
    canonicalize.py — vocabulary-scale clusters take the driver
    union-find twin automatically), eq-rep-s / eq-rep-o become two joins
    of the store against the (alias → canonical) mapping. The canonical
    member is the lexicographic minimum IRI of the cluster —
    deterministic under any partitioning.

    Scale shape: the mapping is sameAs-graph-sized (aliases only, not
    store-sized), broadcast by default (``broadcast_mapping=False``
    falls back to shuffle joins for degenerate identity graphs); the
    rewrite itself is two hash joins over the store scan plus the final
    set-semantics dedup (rewrites can collapse asserted duplicates).

    ``keep_links=True`` keeps one provenance triple
    ``alias sameAs canonical`` per non-canonical alias (the cluster is
    recoverable); ``False`` drops identity triples entirely. Literal
    objects are untouched unless a literal lexically equals an alias
    IRI — RDF strings don't carry a node/literal bit in the 3-column
    projection; callers with the typed store can pre-filter on
    ``is_literal``.

    The reference has no sameAs handling (single-source KG; GraphDB
    would apply owl-rules server-side if configured) — this is the
    engine-side equivalent for the multi-source case its canonicalize
    stage (M_Canonicalize) already solves for SURFACE forms.
    """
    from .canonicalize import connected_components

    spo = ["subj", "pred", "obj"]
    base = triples.select(*spo)
    same = base.filter(F.col("pred").isin(list(_SAMEAS))).localCheckpoint(eager=True)
    rest = base.filter(~F.col("pred").isin(list(_SAMEAS)))
    if same.isEmpty():
        return base

    # majority surface form among the asserted sameAs triples, for the
    # provenance links
    n_full = same.filter(F.col("pred") == _SAMEAS[1]).count()
    link_term = _SAMEAS[1] if n_full * 2 > same.count() else _SAMEAS[0]

    # eq-sym + eq-trans: identity clusters = connected components over
    # xxhash64 node ids (pure function of the IRI — reproducible)
    edge_ids = same.select(F.xxhash64("subj").alias("a"), F.xxhash64("obj").alias("b"))
    comp = connected_components(edge_ids, cfg)
    members = (
        same.select(F.col("subj").alias("iri"))
        .unionByName(same.select(F.col("obj").alias("iri")))
        .dropDuplicates()
        .withColumn("node", F.xxhash64("iri"))
        .join(comp, "node", "left")
        .withColumn("component", F.coalesce("component", "node"))
    )
    canon = members.groupBy("component").agg(F.min("iri").alias("canonical"))
    mapping = (
        members.join(canon, "component")
        .select("iri", "canonical")
        .localCheckpoint(eager=True)
    )
    m = F.broadcast(mapping) if broadcast_mapping else mapping

    # eq-rep-s / eq-rep-o: rewrite both positions through the mapping
    out = (
        rest.join(m.withColumnRenamed("iri", "subj"), "subj", "left")
        .select(
            F.coalesce("canonical", "subj").alias("subj"), "pred", "obj"
        )
        .join(m.withColumnRenamed("iri", "obj"), "obj", "left")
        .select("subj", "pred", F.coalesce("canonical", "obj").alias("obj"))
    )
    if keep_links:
        links = mapping.filter(F.col("iri") != F.col("canonical")).select(
            F.col("iri").alias("subj"),
            F.lit(link_term).alias("pred"),
            F.col("canonical").alias("obj"),
        )
        out = out.unionByName(links)
    return out.dropDuplicates(spo)


def materialize_store(spark, store_path: str) -> dict:
    """Materialize the RDFS closure **into** a ``write_triples`` store:
    derived triples are appended through the same bucket-pruned
    set-semantics path SPARQL Update inserts use — only buckets that
    gain rows are compared against or written, nothing rewrites, and the
    full-width dedup shuffle of ``rdfs_materialize(include_base=True)``
    is replaced by per-bucket anti-joins. Idempotent: a second call
    appends nothing. Returns the SPARQL-Update-shaped lineage counters.
    """
    from .sparql_update import _append_new, _open_store
    from .triples import subj_bucket_of

    store, n_buckets = _open_store(spark, store_path)
    derived = rdfs_materialize(
        store.select("subj", "pred", "obj"), include_base=False
    ).withColumn("subj_bucket", subj_bucket_of(F.col("subj"), n_buckets))
    stats = {"deleted": 0, "inserted": 0, "buckets_rewritten": [], "buckets_appended": []}
    return _append_new(spark, store_path, store, derived, stats)
