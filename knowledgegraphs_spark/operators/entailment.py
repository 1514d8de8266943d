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

__all__ = [
    "rdfs_materialize",
    "owl_rl_materialize",
    "rdfs_materialize_delta",
    "owl_rl_materialize_delta",
    "materialize_store",
    "materialize_store_delta",
    "owl_sameas_smush",
]

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


def _emit_form(triples: DataFrame, extra_preds: tuple = ()) -> int:
    """0 = compact (``rdf:type``), 1 = full IRI — whichever convention
    the input's own vocabulary triples use (majority vote over the
    vocabulary predicates actually present; vocabulary-sized collect).
    Derived triples are emitted in the same convention so they join and
    dedupe against the base graph instead of forking a parallel
    vocabulary. ``extra_preds`` widens the vote (the OWL 2 RL path adds
    its predicate-position vocabulary: inverseOf, equivalent*, sameAs)."""
    counts = (
        triples.filter(F.col("pred").isin(_VOCAB_PREDS + list(extra_preds)))
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
    anti_join_base: bool = True,
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
    out = derived.dropDuplicates(spo)
    # anti_join_base=False skips the full-input anti-join for callers that
    # enforce set semantics themselves (materialize_store's bucket-pruned
    # append anti-joins per touched bucket — the store-wide shuffle here
    # would be paid twice)
    return out.join(base, on=spo, how="left_anti") if anti_join_base else out


_OWL = "http://www.w3.org/2002/07/owl#"

# OWL 2 RL property-axiom vocabulary, both surface forms (compact engine
# convention / full IRI from ontology-file sources) like _FORMS above
_OWL_FORMS = {
    "inverseOf": ("owl:inverseOf", _OWL + "inverseOf"),
    "equivalentProperty": ("owl:equivalentProperty", _OWL + "equivalentProperty"),
    "equivalentClass": ("owl:equivalentClass", _OWL + "equivalentClass"),
    "SymmetricProperty": ("owl:SymmetricProperty", _OWL + "SymmetricProperty"),
    "TransitiveProperty": ("owl:TransitiveProperty", _OWL + "TransitiveProperty"),
    "FunctionalProperty": ("owl:FunctionalProperty", _OWL + "FunctionalProperty"),
    "InverseFunctionalProperty": (
        "owl:InverseFunctionalProperty",
        _OWL + "InverseFunctionalProperty",
    ),
}

# separator for predicate-scoped closure node keys (prp-trp): control char
# that cannot appear in an IRI per RFC 3987, so closures of different
# transitive predicates can share one pointer-doubling pass without mixing
_TRP_SEP = "\x1f"


def _owl_pairs(triples: DataFrame, term: str) -> DataFrame:
    """(p, q) pairs asserted under either surface form of the OWL term."""
    return triples.filter(F.col("pred").isin(list(_OWL_FORMS[term]))).select(
        F.col("subj").alias("p"), F.col("obj").alias("q")
    )


def _typed_props(triples: DataFrame, cls: str) -> list[str]:
    """Properties declared ``rdf:type owl:<cls>`` — TBox-sized, collected
    to the driver (same scale judgment as ``_emit_form``: thousands of
    schema rows against billions of instance rows) so membership tests
    compile to an ``isin`` literal filter instead of a join."""
    return [
        r[0]
        for r in triples.filter(
            F.col("pred").isin(list(_FORMS["type"]))
            & F.col("obj").isin(list(_OWL_FORMS[cls]))
        )
        .select("subj")
        .distinct()
        .collect()
    ]


def owl_rl_materialize(
    triples: DataFrame,
    include_base: bool = True,
    broadcast_schema: bool = True,
    max_trans_iters: int = 50,
    anti_join_base: bool = True,
) -> DataFrame:
    """OWL 2 RL property-rule closure of ``triples`` — the rho-df rules of
    :func:`rdfs_materialize` plus the property-axiom fragment GraphDB's
    ``owl-horst``/``owl2-rl`` rulesets add over plain ``rdfs``:

    - ``scm-eqp1/2`` / ``scm-eqc1/2``: ``owl:equivalentProperty`` /
      ``owl:equivalentClass`` feed the sub-property / sub-class closures
      in BOTH directions (and the closure edges are emitted, so an
      equivalence is queryable as two ``rdfs:sub*Of`` triples).
    - ``prp-inv``  (p inverseOf q), (s p o) → (o q s) — and the mirror.
    - ``prp-symp`` (p type SymmetricProperty), (s p o) → (o p s).
    - ``prp-trp``  (p type TransitiveProperty): per-predicate transitive
      closure over the *instance* edges of p.
    - ``prp-fp``   (p type FunctionalProperty), (x p y1), (x p y2)
      → y1 sameAs y2; ``prp-ifp`` the subject-side mirror. Emitted as the
      **generating set** — each group member links to the group minimum —
      whose eq-sym/eq-trans closure equals the full pairwise entailment;
      materializing all pairs is the sameAs blow-up
      :func:`owl_sameas_smush` exists to avoid. Feed the result to the
      smusher to apply the identities.

    Stratification (single documented pass, same philosophy as the RDFS
    core): property closure → ``prp-spo1`` → direction rules (inverse /
    symmetric) → ``prp-trp`` → domain / range → class closure →
    ``cax-sco`` → functional identities. Each stratum reads every earlier
    stratum's output, so e.g. an inverse-derived edge of a transitive
    property closes transitively, and a triple derived through
    ``equivalentProperty`` picks up the domain typing. The derivations a
    single pass cannot reach are the meta-loops (rules re-deriving
    *schema* from instance output) — the same finite fragment noted on
    :func:`rdfs_materialize`.

    Scale shape: every schema relation (inverse map, equivalence maps,
    property/class closures) is TBox-sized and broadcast; symmetric /
    transitive / functional membership compiles to ``isin`` literal
    filters. The instance-scale work is ``prp-trp`` (pointer doubling
    over the transitive predicates' edges only — O(log depth) rounds,
    edges keyed by predicate so one pass closes all transitive
    predicates) and the functional groupBys (map-side combinable, keyed
    by (subj, pred) / (pred, obj) over the functional predicates only).

    Reference parity: GraphDB repository rulesets beyond ``rdfs``
    (E_CreateKG/GraphDB.java creates the repo; the ruleset is repo
    config), made explicit and distributed.
    """
    spo = ["subj", "pred", "obj"]
    base = triples.select(*spo)
    owl_pred_vocab = tuple(
        v
        for k in ("inverseOf", "equivalentProperty", "equivalentClass")
        for v in _OWL_FORMS[k]
    ) + _SAMEAS
    form = _emit_form(base, extra_preds=owl_pred_vocab)
    t_type, t_sco, t_spo = (_FORMS[k][form] for k in ("type", "subClassOf", "subPropertyOf"))
    t_same = _SAMEAS[form]

    def _b(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if broadcast_schema else df

    # ONE TBox collect instead of seven per-term scans: the pair axioms
    # (inverseOf / equivalent*) and the four property-class declarations
    # are all TBox-sized, so a single filtered pass pulls them together
    # (the type-row side stays bounded because it is filtered on the OWL
    # class vocabulary in the object position, never all rdf:type rows).
    # At instance scale this is one scan of the input where the previous
    # shape re-scanned it per schema relation.
    spark = base.sparkSession
    pair_preds = [
        v for k in ("inverseOf", "equivalentProperty", "equivalentClass") for v in _OWL_FORMS[k]
    ]
    prop_classes = (
        "SymmetricProperty",
        "TransitiveProperty",
        "FunctionalProperty",
        "InverseFunctionalProperty",
    )
    class_forms = [v for k in prop_classes for v in _OWL_FORMS[k]]
    type_forms = list(_FORMS["type"])
    tbox_rows = (
        base.filter(
            F.col("pred").isin(pair_preds)
            | (F.col("pred").isin(type_forms) & F.col("obj").isin(class_forms))
        )
        .select(*spo)
        .distinct()
        .collect()
    )

    def _pairs_of(term: str) -> DataFrame:
        forms = set(_OWL_FORMS[term])
        rows = [(r["subj"], r["obj"]) for r in tbox_rows if r["pred"] in forms]
        return spark.createDataFrame(rows, "p string, q string")

    def _props_of(cls: str) -> list[str]:
        forms = set(_OWL_FORMS[cls])
        return sorted({r["subj"] for r in tbox_rows if r["pred"] in type_forms and r["obj"] in forms})

    eqp = _pairs_of("equivalentProperty")
    eqc = _pairs_of("equivalentClass")
    inv = _pairs_of("inverseOf")
    sym_props = _props_of("SymmetricProperty")
    trans_props = _props_of("TransitiveProperty")
    fp_props = _props_of("FunctionalProperty")
    ifp_props = _props_of("InverseFunctionalProperty")

    def _both_dirs(pairs: DataFrame) -> DataFrame:
        return pairs.select(F.col("p").alias("child"), F.col("q").alias("parent")).unionByName(
            pairs.select(F.col("q").alias("child"), F.col("p").alias("parent"))
        )

    # -- stratum 1: property hierarchy (sub ∪ equivalence), then prp-spo1 --
    spo_edges = _edges(base, "subPropertyOf").unionByName(_both_dirs(eqp))
    spo_cl = ancestor_closure_df(spo_edges).localCheckpoint(eager=True)
    derived_spo1 = base.join(_b(spo_cl), base["pred"] == spo_cl["node"]).select(
        "subj", F.col("anc").alias("pred"), "obj"
    )
    # g1 is read by every later stratum (direction rules, transitive
    # edges, domain/range, class typing, functional groupings) and its
    # lineage embeds the full input scan; pinning it once keeps the final
    # plan from replicating that scan per branch (~6x) and keeps the
    # analyzed plan driver-tractable when the input is itself a deep
    # union.  One instance-sized copy on executor storage, spill-backed.
    g1 = base.unionByName(derived_spo1).localCheckpoint(eager=True)

    # -- stratum 2: direction rules (prp-inv both mirrors, prp-symp) ------
    inv_map = inv.unionByName(inv.select(F.col("q").alias("p"), F.col("p").alias("q")))
    derived_inv = g1.join(_b(inv_map), g1["pred"] == inv_map["p"]).select(
        F.col("obj").alias("subj"), F.col("q").alias("pred"), F.col("subj").alias("obj")
    )
    derived_sym = (
        g1.filter(F.col("pred").isin(sym_props)).select(
            F.col("obj").alias("subj"), "pred", F.col("subj").alias("obj")
        )
        if sym_props
        else None
    )
    g2 = g1.unionByName(derived_inv)
    if derived_sym is not None:
        g2 = g2.unionByName(derived_sym)

    # -- stratum 3: prp-trp — one pointer-doubling pass over ALL transitive
    # predicates' instance edges, node keys scoped by predicate ----------
    derived_trp = None
    if trans_props:
        t_edges = g2.filter(F.col("pred").isin(trans_props)).select(
            F.concat("pred", F.lit(_TRP_SEP), "subj").alias("child"),
            F.concat("pred", F.lit(_TRP_SEP), "obj").alias("parent"),
        )
        t_cl = ancestor_closure_df(t_edges, max_iters=max_trans_iters)
        # split on the FIRST separator only: the predicate (an IRI) cannot
        # contain it, while an object-position literal theoretically could
        _node_rest = "substring({c}, length(substring_index({c}, chr(31), 1)) + 2)"
        derived_trp = t_cl.select(
            F.expr(_node_rest.format(c="node")).alias("subj"),
            F.substring_index("node", _TRP_SEP, 1).alias("pred"),
            F.expr(_node_rest.format(c="anc")).alias("obj"),
        )
        # Strata 4-6 and the final union each re-reference this relation;
        # without a checkpoint the whole O(log depth) pointer-doubling job
        # DAG re-executes once per consumer (~5x).  The closure is already
        # materialized round-by-round inside ancestor_closure_df, so
        # pinning the final result adds no asymptotic memory.
        derived_trp = derived_trp.localCheckpoint(eager=True)
    g3 = g2.unionByName(derived_trp) if derived_trp is not None else g2

    # -- stratum 4: domain / range over every derived edge so far --------
    dom = _edges(g1, "domain").select(F.col("child").alias("p"), F.col("parent").alias("c"))
    rng = _edges(g1, "range").select(F.col("child").alias("p"), F.col("parent").alias("c"))
    derived_dom = g3.join(_b(dom), g3["pred"] == dom["p"]).select(
        "subj", F.lit(t_type).alias("pred"), F.col("c").alias("obj")
    )
    derived_rng = g3.join(_b(rng), g3["pred"] == rng["p"]).select(
        F.col("obj").alias("subj"), F.lit(t_type).alias("pred"), F.col("c").alias("obj")
    )

    # -- stratum 5: class hierarchy (sub ∪ equivalence), then cax-sco ----
    sco_edges = _edges(g1, "subClassOf").unionByName(_both_dirs(eqc))
    sco_cl = ancestor_closure_df(sco_edges).localCheckpoint(eager=True)
    types0 = (
        g3.filter(F.col("pred").isin(list(_FORMS["type"])))
        .select(*spo)
        .unionByName(derived_dom)
        .unionByName(derived_rng)
    )
    derived_cax = types0.join(_b(sco_cl), types0["obj"] == sco_cl["node"]).select(
        "subj", F.lit(t_type).alias("pred"), F.col("anc").alias("obj")
    )

    # -- stratum 6: functional identities (prp-fp / prp-ifp) -------------
    def _group_min_links(df: DataFrame, keys: list[str], member: str) -> DataFrame:
        canon = df.groupBy(*keys).agg(F.min(member).alias("canonical"))
        return (
            df.join(canon, keys)
            .filter(F.col(member) != F.col("canonical"))
            .select(
                F.col(member).alias("subj"),
                F.lit(t_same).alias("pred"),
                F.col("canonical").alias("obj"),
            )
        )

    identity_parts = []
    if fp_props:
        identity_parts.append(
            _group_min_links(g3.filter(F.col("pred").isin(fp_props)), ["subj", "pred"], "obj")
        )
    if ifp_props:
        identity_parts.append(
            _group_min_links(g3.filter(F.col("pred").isin(ifp_props)), ["pred", "obj"], "subj")
        )

    # -- schema transitivity output (scm-*) -------------------------------
    derived_scm = sco_cl.select(
        F.col("node").alias("subj"), F.lit(t_sco).alias("pred"), F.col("anc").alias("obj")
    ).unionByName(
        spo_cl.select(
            F.col("node").alias("subj"), F.lit(t_spo).alias("pred"), F.col("anc").alias("obj")
        )
    )

    derived = derived_spo1.unionByName(derived_inv)
    if derived_sym is not None:
        derived = derived.unionByName(derived_sym)
    if derived_trp is not None:
        derived = derived.unionByName(derived_trp)
    derived = (
        derived.unionByName(derived_dom)
        .unionByName(derived_rng)
        .unionByName(derived_cax)
        .unionByName(derived_scm)
    )
    for part in identity_parts:
        derived = derived.unionByName(part)
    if include_base:
        return base.unionByName(derived).dropDuplicates(spo)
    out = derived.dropDuplicates(spo)
    # anti_join_base=False skips the full-input anti-join for callers that
    # enforce set semantics themselves (materialize_store's bucket-pruned
    # append anti-joins per touched bucket — the store-wide shuffle here
    # would be paid twice)
    return out.join(base, on=spo, how="left_anti") if anti_join_base else out


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


# ---------------------------------------------------------------------------
# incremental (semi-naive) entailment: close a DELTA against a closed store
# ---------------------------------------------------------------------------

# predicate-position schema vocabulary per ruleset — a delta containing any
# of these (or an owl property-class type declaration) can entail new
# conclusions over OLD instance data, which only a full re-materialization
# reaches; the delta paths refuse and the store wrapper falls back.
_RDFS_SCHEMA_PREDS = [
    v for k in ("subClassOf", "subPropertyOf", "domain", "range") for v in _FORMS[k]
]


def _owl_schema_preds() -> list[str]:
    return _RDFS_SCHEMA_PREDS + [
        v
        for k in ("inverseOf", "equivalentProperty", "equivalentClass")
        for v in _OWL_FORMS[k]
    ]


def _owl_class_objs() -> list[str]:
    return [
        v
        for k in (
            "SymmetricProperty",
            "TransitiveProperty",
            "FunctionalProperty",
            "InverseFunctionalProperty",
        )
        for v in _OWL_FORMS[k]
    ]


def _is_schema(triples: DataFrame, owl: bool) -> "DataFrame":
    """The schema-bearing rows of ``triples`` under the given ruleset."""
    preds = _owl_schema_preds() if owl else _RDFS_SCHEMA_PREDS
    cond = F.col("pred").isin(preds)
    if owl:
        cond = cond | (
            F.col("pred").isin(list(_FORMS["type"])) & F.col("obj").isin(_owl_class_objs())
        )
    return triples.filter(cond)


def _require_instance_only(delta: DataFrame, owl: bool, caller: str) -> None:
    if not _is_schema(delta.select("subj", "pred", "obj"), owl).isEmpty():
        raise ValueError(
            f"{caller}: the delta contains schema triples — new schema can "
            "entail conclusions over OLD instance data, which only a full "
            "re-materialization reaches (materialize_store falls back "
            "automatically)"
        )


def rdfs_materialize_delta(
    store: DataFrame, delta: DataFrame, broadcast_schema: bool = True
) -> DataFrame:
    """Conclusions entailed by ``delta`` against a ``store`` already closed
    under :func:`rdfs_materialize` — the semi-naive increment.

    Every rho-df rule has exactly ONE instance antecedent (the other
    antecedents are schema), so the increment is the full rule pipeline
    applied to ``delta`` plus the store's TBox-sized schema slice: cost is
    O(delta), never O(store). ``delta`` must be instance-only (raises
    otherwise — see :func:`materialize_store_delta` for the fallback).
    Output may repeat triples the store already holds (pure-old
    conclusions are closed by assumption and never re-derived; delta
    conclusions already asserted are the caller's anti-join, which the
    store path does per-bucket).
    """
    _require_instance_only(delta, owl=False, caller="rdfs_materialize_delta")
    spo = ["subj", "pred", "obj"]
    tbox = _is_schema(store.select(*spo), owl=False)
    return rdfs_materialize(
        delta.select(*spo).unionByName(tbox),
        include_base=False,
        broadcast_schema=broadcast_schema,
    )


def owl_rl_materialize_delta(
    store: DataFrame, delta: DataFrame, broadcast_schema: bool = True
) -> DataFrame:
    """Conclusions entailed by ``delta`` against a ``store`` already closed
    under :func:`owl_rl_materialize`.

    Unlike rho-df, two owl-rl rule families have MULTIPLE instance
    antecedents — a new edge of a transitive predicate can close through
    OLD edges (prp-trp), and a new functional assertion can identify
    against an OLD one sharing its (subject, predicate) group (prp-fp /
    prp-ifp). The increment therefore runs over ``delta`` + the store's
    schema slice + the store's **rule-relevant instance slices**: the
    triples of transitive / functional / inverse-functional predicates
    only. Cost is O(delta + those predicate families), never O(store) —
    the bounded price of the multi-antecedent rules. Pure-old
    combinations re-derive triples the store already holds; the store
    path's per-bucket anti-join drops them (and prp-fp's group minimum
    may shift to a new member — the old links plus the new ones still
    generate the same identity clusters, the documented generating-set
    semantics).
    """
    _require_instance_only(delta, owl=True, caller="owl_rl_materialize_delta")
    spo = ["subj", "pred", "obj"]
    store_spo = store.select(*spo)
    tbox = _is_schema(store_spo, owl=True).localCheckpoint(eager=True)
    multi = (
        _typed_props(tbox, "TransitiveProperty")
        + _typed_props(tbox, "FunctionalProperty")
        + _typed_props(tbox, "InverseFunctionalProperty")
    )
    relevant = store_spo.filter(F.col("pred").isin(multi)) if multi else None
    inc = delta.select(*spo).unionByName(tbox)
    if relevant is not None:
        inc = inc.unionByName(relevant)
    return owl_rl_materialize(
        inc, include_base=False, broadcast_schema=broadcast_schema
    )


def materialize_store_delta(
    spark, store_path: str, delta: DataFrame, ruleset: str = "rdfs"
) -> dict:
    """Insert ``delta`` into a ``write_triples`` store AND close the store
    over the new triples' entailments, both through the bucket-pruned
    set-semantics append — the maintenance-batch shape (O(batch + rule-
    relevant slices), untouched buckets never read or written). A delta
    carrying schema triples falls back to a full
    :func:`materialize_store` pass after the insert (recorded as
    ``full_fallback`` in the counters). Idempotent like the full path.
    """
    from .sparql_update import _append_new, _open_store
    from .triples import subj_bucket_of

    deltas = {"rdfs": rdfs_materialize_delta, "owl-rl": owl_rl_materialize_delta}
    if ruleset not in deltas:
        raise ValueError(f"materialize_store_delta: unknown ruleset {ruleset!r} (rdfs | owl-rl)")
    store, n_buckets = _open_store(spark, store_path)
    spo = ["subj", "pred", "obj"]
    delta = delta.select(*spo).localCheckpoint(eager=True)

    stats = {"deleted": 0, "inserted": 0, "buckets_rewritten": [], "buckets_appended": []}
    ins = delta.withColumn("subj_bucket", subj_bucket_of(F.col("subj"), n_buckets))
    stats = _append_new(spark, store_path, store, ins, stats)
    stats["inserted_delta"] = stats["inserted"]

    owl = ruleset == "owl-rl"
    if not _is_schema(delta, owl).isEmpty():
        full = materialize_store(spark, store_path, ruleset=ruleset)
        return {
            **full,
            "inserted": stats["inserted"] + full["inserted"],
            "inserted_delta": stats["inserted_delta"],
            "buckets_appended": sorted(
                set(stats["buckets_appended"]) | set(full["buckets_appended"])
            ),
            "full_fallback": True,
        }

    store2, _ = _open_store(spark, store_path)
    fn = rdfs_materialize_delta if ruleset == "rdfs" else owl_rl_materialize_delta
    derived = fn(store2.select(*spo), delta).withColumn(
        "subj_bucket", subj_bucket_of(F.col("subj"), n_buckets)
    )
    appended_before = set(stats["buckets_appended"])
    stats = _append_new(spark, store_path, store2, derived, stats)
    stats["buckets_appended"] = sorted(appended_before | set(stats["buckets_appended"]))
    stats["full_fallback"] = False
    return stats


def materialize_store(spark, store_path: str, ruleset: str = "rdfs") -> dict:
    """Materialize an entailment closure **into** a ``write_triples``
    store: derived triples are appended through the same bucket-pruned
    set-semantics path SPARQL Update inserts use — only buckets that
    gain rows are compared against or written, nothing rewrites, and the
    full-width dedup shuffle of ``rdfs_materialize(include_base=True)``
    is replaced by per-bucket anti-joins. Idempotent: a second call
    appends nothing. ``ruleset`` picks the closure — ``"rdfs"`` (rho-df)
    or ``"owl-rl"`` (adds the OWL 2 RL property rules; the GraphDB repo-
    config choice made explicit). Returns the SPARQL-Update-shaped
    lineage counters.
    """
    from .sparql_update import _append_new, _open_store
    from .triples import subj_bucket_of

    closures = {"rdfs": rdfs_materialize, "owl-rl": owl_rl_materialize}
    if ruleset not in closures:
        raise ValueError(f"materialize_store: unknown ruleset {ruleset!r} (rdfs | owl-rl)")
    store, n_buckets = _open_store(spark, store_path)
    derived = closures[ruleset](
        store.select("subj", "pred", "obj"), include_base=False, anti_join_base=False
    ).withColumn("subj_bucket", subj_bucket_of(F.col("subj"), n_buckets))
    stats = {"deleted": 0, "inserted": 0, "buckets_rewritten": [], "buckets_appended": []}
    return _append_new(spark, store_path, store, derived, stats)
