"""SPARQL SELECT evaluation (operators/sparql.py).

The centerpiece tests run the reference's own query TEXT — copied
verbatim from where the reference sends it to rdflib/Jena/GraphDB — over
a triple-table rendering of the same ontology, and check hand-derived
expected bindings:

- annotation fetch with ``FILTER (?predicate IN (...))``
  (extractBertMapMappings.py:110-114)
- the three-branch union with blank-node restriction patterns
  (extractBertMapMappings.py:119-143)
- ``?ns a owl:Ontology`` (extractBertMapMappings.py:63)
- table-class listing ``?tableURI a owl:Class ; rdfs:subClassOf <...>``
  (ExactMapper.java:88-91)
- ``FILTER (str(?label) = '...')`` (DICOM2SediJSON.java:251-255)
- domain/range object-property lookup (DSON2OWL.java:57-59)
"""

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.sparql import parse_query, sparql_select

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
SKOS = "http://www.w3.org/2004/02/skos/core#"
PO = "http://example.org/po#"

SW_PREFIXES = f"""
PREFIX rdf: <{RDF}>
PREFIX rdfs: <{RDFS}>
PREFIX owl: <{OWL}>
PREFIX skos: <{SKOS}>
PREFIX PO: <{PO}>
"""

# A miniature ontology graph in the store's term representation (full
# IRIs as plain strings, literals as their lexical forms). Blank nodes
# are skolemized to b1..b4 URIs — exactly what a triple-table rendering
# of an RDF graph does.
TBOX = [
    (PO + "onto", RDF + "type", OWL + "Ontology"),
    # table classes
    (PO + "Person", RDF + "type", OWL + "Class"),
    (PO + "Person", RDFS + "subClassOf", PO + "TableClass"),
    (PO + "Person", RDFS + "label", "Person"),
    (PO + "Address", RDF + "type", OWL + "Class"),
    (PO + "Address", RDFS + "subClassOf", PO + "TableClass"),
    (PO + "Address", RDFS + "label", "Address"),
    # attribute class
    (PO + "name_attr", RDFS + "subClassOf", PO + "AttributeClass"),
    # branch 1: Person subClassOf [ a Restriction ; onProperty hasName ]
    (PO + "b1", RDF + "type", OWL + "Restriction"),
    (PO + "b1", OWL + "onProperty", PO + "hasName"),
    (PO + "Person", RDFS + "subClassOf", PO + "b1"),
    # branch 2: Person subClassOf [ a Restriction ; someValuesFrom name_attr ]
    (PO + "b2", RDF + "type", OWL + "Restriction"),
    (PO + "b2", OWL + "someValuesFrom", PO + "name_attr"),
    (PO + "Person", RDFS + "subClassOf", PO + "b2"),
    # branch 3: street_attr subClassOf [ a Restriction ; onProperty hasStreet ],
    #           Address subClassOf [ a Restriction ; someValuesFrom street_attr ]
    (PO + "street_attr", RDFS + "subClassOf", PO + "AttributeClass"),
    (PO + "b3", RDF + "type", OWL + "Restriction"),
    (PO + "b3", OWL + "onProperty", PO + "hasStreet"),
    (PO + "street_attr", RDFS + "subClassOf", PO + "b3"),
    (PO + "b4", RDF + "type", OWL + "Restriction"),
    (PO + "b4", OWL + "someValuesFrom", PO + "street_attr"),
    (PO + "Address", RDFS + "subClassOf", PO + "b4"),
    # annotations on hasName
    (PO + "hasName", RDFS + "label", "has name"),
    (PO + "hasName", SKOS + "altLabel", "name"),
    (PO + "hasName", SKOS + "prefLabel", "name-pref"),
    # object property with domain/range (DSON2OWL.java:57-59)
    (PO + "livesAt", RDFS + "domain", PO + "Person"),
    (PO + "livesAt", RDFS + "range", PO + "Address"),
    # labelled resources for the str()-filter query
    (PO + "tag_00100010", RDFS + "label", "(0010,0010)"),
    (PO + "tag_00100020", RDFS + "label", "(0010,0020)"),
    # subclass chain for property-path closure: C3 < C2 < C1 < TableClass
    (PO + "C1", RDFS + "subClassOf", PO + "TableClass"),
    (PO + "C2", RDFS + "subClassOf", PO + "C1"),
    (PO + "C3", RDFS + "subClassOf", PO + "C2"),
]


@pytest.fixture(scope="module")
def tbox(spark):
    return spark.createDataFrame(TBOX, "subj string, pred string, obj string")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# -------------------------------------------------------------------------
# reference queries, verbatim
# -------------------------------------------------------------------------


def test_reference_annotation_filter_in(tbox):
    # extractBertMapMappings.py:110-114 — _getSourceOntologyAnnotations
    resource = PO + "hasName"
    props = ", ".join(f"<{p}>" for p in (RDFS + "label", SKOS + "altLabel"))
    query = f"""
            SELECT ?annot
            WHERE {{
                <{resource}> ?predicate ?annot .
                 FILTER (?predicate IN ({props}))
            }}
            """
    assert rows(sparql_select(tbox, query)) == [("has name",), ("name",)]


def test_reference_three_branch_union(tbox):
    # extractBertMapMappings.py:119-143 — verbatim, including the `a`
    # keyword inside blank-node property lists and lowercase `union`.
    def q(resource):
        return f"""{SW_PREFIXES}
                SELECT ?tableClassLabel WHERE {{
                    ?tableClass rdfs:subClassOf PO:TableClass ;
                                rdfs:label ?tableClassLabel .
                    {{
                        ?tableClass rdfs:subClassOf
                            [ a owl:Restriction ; owl:onProperty <{resource}> ] .
                    }}
                    union
                    {{
                        ?tableClass rdfs:subClassOf
                            [ a owl:Restriction ; owl:someValuesFrom <{resource}>] .
                    }}
                    union
                    {{
                        ?attributeClass rdfs:subClassOf PO:AttributeClass ,
                                        [a owl:Restriction; owl:onProperty <{resource}> ] .
                        ?tableClass rdfs:subClassOf [ a owl:Restriction ; owl:someValuesFrom ?attributeClass] .
                    }}
                }}
            """

    # branch 1: Person owns hasName through an onProperty restriction
    assert rows(sparql_select(tbox, q(PO + "hasName"))) == [("Person",)]
    # branch 2: Person someValuesFrom name_attr
    assert rows(sparql_select(tbox, q(PO + "name_attr"))) == [("Person",)]
    # branch 3: hasStreet hangs off name_attr, owned by Address
    assert rows(sparql_select(tbox, q(PO + "hasStreet"))) == [("Address",)]
    # unrelated resource: no owner
    assert rows(sparql_select(tbox, q(PO + "nothing"))) == []


def test_reference_onto_ns(tbox):
    # extractBertMapMappings.py:63 — _ontoNs
    query = SW_PREFIXES + "select ?ns where {\n?ns a owl:Ontology .}"
    assert rows(sparql_select(tbox, query)) == [(PO + "onto",)]


def test_reference_exact_mapper_table_classes(tbox):
    # ExactMapper.java:88-91 — getTableOntoEl
    query = (
        SW_PREFIXES
        + "SELECT ?tableURI WHERE {\n"
        + "     ?tableURI a owl:Class ; \n"
        + f"               rdfs:subClassOf <{PO}TableClass> . \n"
        + "}"
    )
    assert rows(sparql_select(tbox, query)) == [(PO + "Address",), (PO + "Person",)]


def test_reference_dicom_str_filter(tbox):
    # DICOM2SediJSON.java:334-338 — getFromCode via rdfs:label
    query = (
        SW_PREFIXES
        + "\nSELECT ?resource"
        + "\n where {"
        + "\n?resource rdfs:label ?label . "
        + "\nFILTER (str(?label) = '(0010,0020)')"
        + "\n}"
    )
    assert rows(sparql_select(tbox, query)) == [(PO + "tag_00100020",)]


def test_reference_domain_range_lookup(tbox):
    # DSON2OWL.java:57-59 — object property connecting two superclasses
    query = (
        SW_PREFIXES
        + "select ?objProp where { \n"
        + f"?objProp rdfs:domain <{PO}Person> .\n"
        + f"?objProp rdfs:range <{PO}Address> .\n}}"
    )
    assert rows(sparql_select(tbox, query)) == [(PO + "livesAt",)]


# -------------------------------------------------------------------------
# engine features beyond the reference's verbatim set
# -------------------------------------------------------------------------


def test_undeclared_prefix_matches_compact_terms(spark):
    # the engine's own triple tables store compact terms (rdf:type, kg:...)
    t = spark.createDataFrame(
        [("kg:T1", "rdf:type", "kg:Turn"), ("kg:T1", "has_role", "user")],
        "subj string, pred string, obj string",
    )
    got = sparql_select(t, "SELECT ?t WHERE { ?t rdf:type kg:Turn ; has_role 'user' . }")
    assert rows(got) == [("kg:T1",)]


def test_optional_left_join_and_bound(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?lbl WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            OPTIONAL {{ ?cls rdfs:label ?lbl . }}
        }}"""
    got = rows(sparql_select(tbox, query))
    assert (PO + "C1", None) in got
    assert (PO + "Person", "Person") in got
    # !BOUND keeps only the label-less classes
    q2 = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            OPTIONAL {{ ?cls rdfs:label ?lbl . }}
            FILTER (!(BOUND(?lbl)))
        }}"""
    assert rows(sparql_select(tbox, q2)) == [(PO + "C1",)]


def test_not_exists_anti_join(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            FILTER NOT EXISTS {{ ?cls rdfs:label ?lbl . }}
        }}"""
    assert rows(sparql_select(tbox, query)) == [(PO + "C1",)]
    q2 = query.replace("NOT EXISTS", "EXISTS")
    assert rows(sparql_select(tbox, q2)) == [(PO + "Address",), (PO + "Person",)]


def test_property_path_plus_closure(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?anc WHERE {{ PO:C3 rdfs:subClassOf+ ?anc . }}"""
    assert rows(sparql_select(tbox, query)) == [
        (PO + "C1",),
        (PO + "C2",),
        (PO + "TableClass",),
    ]


def test_property_path_sequence_alt_inverse(tbox):
    # sequence: property -> its domain class -> that class's label
    q_seq = f"""{SW_PREFIXES}
        SELECT ?lbl WHERE {{ PO:livesAt rdfs:domain/rdfs:label ?lbl . }}"""
    assert rows(sparql_select(tbox, q_seq)) == [("Person",)]
    # alternative: both ends of livesAt
    q_alt = f"""{SW_PREFIXES}
        SELECT ?c WHERE {{ PO:livesAt rdfs:domain|rdfs:range ?c . }}"""
    assert rows(sparql_select(tbox, q_alt)) == [(PO + "Address",), (PO + "Person",)]
    # inverse: who has Person as domain
    q_inv = f"""{SW_PREFIXES}
        SELECT ?p WHERE {{ PO:Person ^rdfs:domain ?p . }}"""
    assert rows(sparql_select(tbox, q_inv)) == [(PO + "livesAt",)]


def test_negated_property_set_forward(tbox):
    # every edge out of hasName except its rdfs:label
    q = f"""{SW_PREFIXES}
        SELECT ?o WHERE {{ PO:hasName !rdfs:label ?o . }}"""
    assert rows(sparql_select(tbox, q)) == [("name",), ("name-pref",)]
    # excluding every property it has → empty
    q2 = f"""{SW_PREFIXES}
        SELECT ?o WHERE {{ PO:livesAt !(rdfs:domain|rdfs:range) ?o . }}"""
    assert rows(sparql_select(tbox, q2)) == []


def test_negated_property_set_inverse_and_mixed(tbox):
    # inverse-only members: who points AT TableClass via anything but label
    q = f"""{SW_PREFIXES}
        SELECT ?x WHERE {{ PO:TableClass !(^rdfs:label) ?x . }}"""
    assert rows(sparql_select(tbox, q)) == [
        (PO + "Address",),
        (PO + "C1",),
        (PO + "Person",),
    ]
    # mixed: forward minus label ∪ inverse minus subClassOf (spec §18.4:
    # !(p|^q) ≡ !p ∪ ^!q — each direction excludes only its own members)
    q2 = f"""{SW_PREFIXES}
        SELECT ?x WHERE {{ PO:Person !(rdfs:label|^rdfs:subClassOf) ?x . }}"""
    assert rows(sparql_select(tbox, q2)) == [
        (PO + "TableClass",),
        (PO + "b1",),
        (PO + "b2",),
        (PO + "livesAt",),
        (OWL + "Class",),
    ]


def test_negated_property_set_member_must_be_iri(tbox):
    with pytest.raises(SyntaxError, match="negated property set"):
        parse_query(f"{SW_PREFIXES} SELECT ?o WHERE {{ PO:x !(?v) ?o . }}")


def test_star_modifier_zero_or_more(tbox):
    # subClassOf* from C3: zero-length (C3 itself) + the full chain —
    # the reference's own ancestor walk (util/Ontology.java:174-209) is
    # exactly this closure, and `rdfs:subClassOf*` is the first idiom a
    # SPARQL user types
    query = f"""{SW_PREFIXES}
        SELECT ?anc WHERE {{ PO:C3 rdfs:subClassOf* ?anc . }}"""
    assert rows(sparql_select(tbox, query)) == [
        (PO + "C1",),
        (PO + "C2",),
        (PO + "C3",),
        (PO + "TableClass",),
    ]


def test_star_unbound_subject_includes_identity(tbox):
    # ?x sub* C2 — one-step-up closure plus the zero-length binding of C2
    query = f"""{SW_PREFIXES}
        SELECT ?x WHERE {{ ?x rdfs:subClassOf* PO:C2 . }}"""
    assert rows(sparql_select(tbox, query)) == [(PO + "C2",), (PO + "C3",)]


def test_opt_modifier_zero_or_one(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?anc WHERE {{ PO:C3 rdfs:subClassOf? ?anc . }}"""
    assert rows(sparql_select(tbox, query)) == [(PO + "C2",), (PO + "C3",)]


def test_bind_strlen_and_arithmetic(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?lbl ?n WHERE {{
            PO:Person rdfs:label ?lbl .
            BIND (STRLEN(?lbl) * 2 + 1 AS ?n)
        }}"""
    assert rows(sparql_select(tbox, query)) == [("Person", 13.0)]


def test_bind_concat(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?tagged WHERE {{
            PO:Person rdfs:label ?lbl .
            BIND (CONCAT('cls:', ?lbl) AS ?tagged)
        }}"""
    assert rows(sparql_select(tbox, query)) == [("cls:Person",)]


def test_bind_rebind_raises(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?lbl WHERE {{
            PO:Person rdfs:label ?lbl .
            BIND (UCASE(?lbl) AS ?lbl)
        }}"""
    with pytest.raises(ValueError, match="re-binds"):
        sparql_select(tbox, query).collect()


def test_filter_arithmetic_comparison(tbox):
    # labels longer than 6 chars: 'Address' (7) but not 'Person' (6)
    query = f"""{SW_PREFIXES}
        SELECT ?lbl WHERE {{
            ?cls rdfs:subClassOf PO:TableClass ; rdfs:label ?lbl .
            FILTER (STRLEN(?lbl) - 1 >= 6)
        }}"""
    assert rows(sparql_select(tbox, query)) == [("Address",)]


def test_values_undef_on_shared_variable_raises(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?lbl WHERE {{
            ?cls rdfs:label ?lbl .
            VALUES (?cls ?lbl) {{ (PO:Person UNDEF) }}
        }}"""
    with pytest.raises(ValueError, match="UNDEF"):
        sparql_select(tbox, query).collect()


def test_string_escape_matches_control_chars(spark):
    # the store holds a real newline; the query writes it as '\n' — the
    # escape map must produce the control char, not the letter 'n'
    df = spark.createDataFrame(
        [("s1", "note", "line1\nline2"), ("s2", "note", "line1nline2")],
        "subj string, pred string, obj string",
    )
    query = 'SELECT ?s WHERE { ?s note "line1\\nline2" . }'
    assert rows(sparql_select(df, query)) == [("s1",)]


def test_aggregate_projection_declared_order_only(tbox):
    # SELECT declares the aggregate FIRST and omits nothing; column order
    # must follow the declaration, not GROUP BY order
    query = f"""{SW_PREFIXES}
        SELECT (COUNT(?sup) AS ?n) ?cls WHERE {{
            ?cls rdfs:subClassOf ?sup .
        }} GROUP BY ?cls ORDER BY DESC(?n) ?cls LIMIT 1"""
    got = sparql_select(tbox, query)
    assert got.columns == ["n", "cls"]
    assert [tuple(r) for r in got.collect()] == [(3, PO + "Person")]


def test_optional_disconnected_is_left_product(tbox):
    # OPTIONAL sharing no variables = the spec's LeftJoin over the product:
    # each left row extends with every right row
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?prop WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            OPTIONAL {{ ?prop rdfs:domain PO:Person . }}
        }}"""
    assert rows(sparql_select(tbox, query)) == [
        (PO + "Address", PO + "livesAt"),
        (PO + "C1", PO + "livesAt"),
        (PO + "Person", PO + "livesAt"),
    ]
    # empty right side: left rows kept, optional variable NULL
    query_empty = f"""{SW_PREFIXES}
        SELECT ?cls ?prop WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            OPTIONAL {{ ?prop rdfs:domain PO:NoSuchClass . }}
        }}"""
    assert rows(sparql_select(tbox, query_empty)) == [
        (PO + "Address", None), (PO + "C1", None), (PO + "Person", None),
    ]


def test_uncorrelated_exists_is_emptiness_probe(tbox):
    # FILTER EXISTS with no shared variables: keep all iff the pattern
    # matches anywhere in the graph; NOT EXISTS the inverse
    hit = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            FILTER EXISTS {{ ?x rdf:type owl:Ontology . }}
        }}"""
    assert len(rows(sparql_select(tbox, hit))) == 3
    miss = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            FILTER EXISTS {{ ?x rdf:type PO:NoSuchClass . }}
        }}"""
    assert rows(sparql_select(tbox, miss)) == []
    not_miss = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            FILTER NOT EXISTS {{ ?x rdf:type PO:NoSuchClass . }}
        }}"""
    assert len(rows(sparql_select(tbox, not_miss))) == 3


def test_minus_removes_compatible_solutions(tbox):
    # table classes MINUS labelled ones: Person/Address have rdfs:label,
    # C1 does not
    query = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            MINUS {{ ?cls rdfs:label ?lbl . }}
        }}"""
    assert rows(sparql_select(tbox, query)) == [(PO + "C1",)]


def test_minus_no_shared_vars_removes_nothing(tbox):
    # spec: dom-disjoint solutions are never removed — MINUS over
    # variables the outer group doesn't bind is a no-op, NOT a wipe
    query = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            ?cls rdfs:subClassOf PO:TableClass .
            MINUS {{ ?x rdfs:label ?y . }}
        }}"""
    assert rows(sparql_select(tbox, query)) == [
        (PO + "Address",), (PO + "C1",), (PO + "Person",),
    ]


def test_minus_mid_group_applies_to_prefix(tbox):
    # MINUS applies to the group accumulated so far; a later pattern
    # still joins afterwards
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?sup WHERE {{
            ?cls rdfs:subClassOf ?sup .
            MINUS {{ ?cls rdf:type owl:Class . }}
            ?sup rdfs:subClassOf PO:TableClass .
        }}"""
    # subclass-of-a-table-class rows whose subject is NOT an owl:Class:
    # C2 < C1 only (C3 < C2 fails the ?sup pattern; Person/Address removed)
    assert rows(sparql_select(tbox, query)) == [(PO + "C2", PO + "C1")]


def test_subquery_aggregate_joined_with_outer(tbox):
    # classic SPARQL 1.1 subquery shape: aggregate inside, join the
    # aggregate result back to per-row bindings outside
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?lbl ?n WHERE {{
            ?cls rdfs:label ?lbl .
            {{ SELECT ?cls (COUNT(?sup) AS ?n) WHERE {{
                ?cls rdfs:subClassOf ?sup .
            }} GROUP BY ?cls }}
            FILTER (?n >= 2)
        }}"""
    assert rows(sparql_select(tbox, query)) == [
        (PO + "Address", "Address", 2),
        (PO + "Person", "Person", 3),
    ]


def test_subquery_projection_scoping(tbox):
    # variables NOT projected by the subquery are invisible outside —
    # ?sup inside must not join with the outer ?sup pattern
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?sup WHERE {{
            ?cls rdfs:subClassOf ?sup .
            {{ SELECT ?cls WHERE {{ ?cls rdfs:subClassOf PO:C1 . }} }}
        }}"""
    assert rows(sparql_select(tbox, query)) == [(PO + "C2", PO + "C1")]


def test_subquery_limit_inside(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?cls WHERE {{
            {{ SELECT ?cls WHERE {{ ?cls rdfs:subClassOf PO:TableClass . }}
               ORDER BY ?cls LIMIT 2 }}
        }}"""
    assert rows(sparql_select(tbox, query)) == [(PO + "Address",), (PO + "C1",)]


def test_aggregate_unprojected_group_var_dropped(tbox):
    query = f"""{SW_PREFIXES}
        SELECT (COUNT(*) AS ?n) WHERE {{
            ?cls rdfs:subClassOf ?sup .
        }} GROUP BY ?cls"""
    got = sparql_select(tbox, query)
    assert got.columns == ["n"]
    assert sorted(r.n for r in got.collect()) == [1, 1, 1, 1, 2, 2, 3]


def test_aggregates_group_by_order_limit(tbox):
    query = f"""{SW_PREFIXES}
        SELECT ?cls (COUNT(?sup) AS ?n) WHERE {{
            ?cls rdfs:subClassOf ?sup .
        }} GROUP BY ?cls ORDER BY DESC(?n) ?cls LIMIT 2"""
    got = sparql_select(tbox, query)
    assert got.columns == ["cls", "n"]
    assert [tuple(r) for r in got.collect()] == [(PO + "Person", 3), (PO + "Address", 2)]


def test_count_distinct_global(tbox):
    query = f"""{SW_PREFIXES}
        SELECT (COUNT(DISTINCT ?cls) AS ?n) WHERE {{
            ?cls rdfs:subClassOf ?sup .
        }}"""
    # Person, Address, name_attr, street_attr, C1, C2, C3
    assert rows(sparql_select(tbox, query)) == [(7,)]


def test_distinct_regex_contains(tbox):
    query = f"""{SW_PREFIXES}
        SELECT DISTINCT ?s WHERE {{
            ?s rdfs:label ?l .
            FILTER (REGEX(?l, '^\\\\(0010', ''))
        }}"""
    assert rows(sparql_select(tbox, query)) == [
        (PO + "tag_00100010",),
        (PO + "tag_00100020",),
    ]
    q2 = f"""{SW_PREFIXES}
        SELECT ?s WHERE {{
            ?s rdfs:label ?l . FILTER (CONTAINS(?l, '0020') && STRSTARTS(?l, '('))
        }}"""
    assert rows(sparql_select(tbox, q2)) == [(PO + "tag_00100020",)]


def test_numeric_comparison_and_in_not_in(spark):
    t = spark.createDataFrame(
        [("a", "score", "10"), ("b", "score", "9.5"), ("c", "score", "2")],
        "subj string, pred string, obj string",
    )
    got = sparql_select(t, "SELECT ?s WHERE { ?s score ?v . FILTER (?v >= 9.5) }")
    assert rows(got) == [("a",), ("b",)]
    got2 = sparql_select(t, "SELECT ?s WHERE { ?s score ?v . FILTER (?s NOT IN ('a', 'c')) }")
    assert rows(got2) == [("b",)]


def test_offset_and_order(spark):
    t = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i}") for i in range(5)],
        "subj string, pred string, obj string",
    )
    got = sparql_select(t, "SELECT ?s WHERE { ?s p ?o . } ORDER BY ?s LIMIT 2 OFFSET 1")
    assert [r[0] for r in got.collect()] == ["s1", "s2"]


def test_select_star_excludes_internal_vars(tbox):
    query = f"""{SW_PREFIXES}
        SELECT * WHERE {{
            ?cls rdfs:subClassOf [ a owl:Restriction ; owl:onProperty PO:hasName ] .
        }}"""
    got = sparql_select(tbox, query)
    assert got.columns == ["cls"]
    assert rows(got) == [(PO + "Person",)]


def test_parse_errors():
    with pytest.raises(SyntaxError):
        parse_query("SELECT ?x WHERE { ?x p ?y ")  # unclosed group
    with pytest.raises(SyntaxError):
        parse_query("WHERE { ?x p ?y }")  # missing SELECT
    with pytest.raises(SyntaxError):
        parse_query("SELECT ?x WHERE { ?x p ?y . } TRAILING")


def test_ungrouped_select_var_with_aggregate_raises(tbox):
    q = parse_query("SELECT ?cls (COUNT(*) AS ?n) WHERE { ?cls p ?y . }")
    with pytest.raises(ValueError, match="GROUP BY"):
        sparql_select(tbox, q)


def test_sparql_text_agrees_with_match_bgp_on_random_patterns(spark):
    """The text path (parse → compile) and the programmatic BGP API must
    produce identical bindings on random connected patterns over random
    graphs — same bag semantics, same variable handling, including
    variable predicates and constants in any position."""
    import random

    from knowledgegraphs_spark.operators.bgp import match_bgp

    rng = random.Random(7)
    for _ in range(6):
        nodes = [f"n{i}" for i in range(6)]
        preds = [f"p{i}" for i in range(3)]
        data = [(rng.choice(nodes), rng.choice(preds), rng.choice(nodes)) for _ in range(30)]
        t = spark.createDataFrame(data, "subj string, pred string, obj string")
        all_vars = ["?x", "?y", "?z", "?w"]
        pats, used = [], ["?x"]
        for k in range(rng.randint(1, 3)):
            s = rng.choice(used)  # stay connected: subject is a bound var
            p = rng.choice(preds + (["?p"] if k == 0 else []))
            o = rng.choice(all_vars + nodes)
            pats.append((s, p, o))
            for term in (s, p, o):
                if term.startswith("?") and term not in used:
                    used.append(term)
        text = "SELECT * WHERE { " + " . ".join(f"{s} {p} {o}" for s, p, o in pats) + " . }"
        got_text = rows(sparql_select(t, text))
        got_api = rows(match_bgp(t, pats))
        assert got_text == got_api, (pats, text)


def test_values_collapses_per_resource_loop(tbox):
    """The reference fetches annotations in a PER-RESOURCE loop (one
    onto.query() per schema element — extractBertMapMappings.py:108-127,
    PIIidentification.java:276). VALUES binds all resources in ONE
    query: same bindings, one job, no driver round-trips."""
    q = f"""{SW_PREFIXES}
        SELECT ?res ?annot WHERE {{
            VALUES ?res {{ <{PO}hasName> <{PO}tag_00100010> }}
            ?res rdfs:label ?annot .
        }}"""
    got = rows(sparql_select(tbox, q))
    assert got == [
        (PO + "hasName", "has name"),
        (PO + "tag_00100010", "(0010,0010)"),
    ]


def test_values_multi_var_with_undef(tbox):
    q = f"""{SW_PREFIXES}
        SELECT ?cls ?lbl ?tag WHERE {{
            VALUES (?cls ?tag) {{ (PO:Person 'p-tag') (PO:Address UNDEF) }}
            ?cls rdfs:label ?lbl .
        }}"""
    got = rows(sparql_select(tbox, q))
    assert got == [
        (PO + "Address", "Address", None),
        (PO + "Person", "Person", "p-tag"),
    ]


def test_join_ordering_puts_selective_patterns_first():
    """Greedy BGP ordering: constant-subject point lookups lead, pred-only
    patterns trail, and every later pattern connects to the bound set —
    query-text order must not dictate the join tree (Spark won't reorder
    these joins without CBO statistics)."""
    from knowledgegraphs_spark.operators.sparql import (
        PathIri,
        Term,
        Var,
        _order_patterns,
    )

    chain = (Var("t"), PathIri("has_role"), Var("r"))  # pred-only, t—r
    point = (Term("kg:T1"), PathIri("has_role"), Var("r"))  # subj const
    byobj = (Var("t"), PathIri("rdf:type"), Term("kg:Turn"))  # obj const
    hop = (Var("r"), PathIri("role_value"), Var("v"))  # pred-only, via ?r
    got = _order_patterns([chain, hop, byobj, point])
    assert got[0] == point  # most selective leads
    # every subsequent pattern shares a variable with what's already bound
    bound = {"r"}
    for s, p, o in got[1:]:
        pv = {t.name for t in (s, p, o) if isinstance(t, Var)}
        assert pv & bound, got
        bound |= pv
    # a pre-bound accumulator steers the first pick to a connected pattern
    got2 = _order_patterns([chain, byobj], {"t"})
    assert got2[0] == byobj  # obj-constant beats pred-only among connected


def test_point_lookup_prunes_store_partitions(spark, tmp_path):
    """Over a write_triples store, a constant-subject pattern must become
    a PARTITION filter (subj_bucket), not just a row filter — the file
    index drops the other buckets before any row group is read. Results
    must equal the unpruned path."""
    from knowledgegraphs_spark.operators.bgp import match_bgp
    from knowledgegraphs_spark.operators.triples import read_triples, write_triples

    data = [(f"s{i}", "p", f"o{i}") for i in range(50)] + [("s7", "q", "extra")]
    t = spark.createDataFrame(data, "subj string, pred string, obj string")
    path = str(tmp_path / "store")
    write_triples(
        t.select("subj", "pred", "obj", F.lit("xsd:string").alias("obj_dtype"),
                 F.lit(True).alias("is_literal")),
        path,
        n_buckets=8,
    )
    store = read_triples(spark, path)
    assert getattr(store, "_kg_subj_buckets", None) == 8

    for df in (
        sparql_select(store, "SELECT ?p ?o WHERE { s7 ?p ?o . }"),
        match_bgp(store, [("s7", "?p", "?o")]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "subj_bucket" in plan.split("PartitionFilters:")[1].split("]")[0], plan
        got = sorted(tuple(r) for r in df.select("p", "o").collect())
        assert got == [("p", "o7"), ("q", "extra")]

    # plain parquet read (no meta attribute): same results, no rewrite
    bare = spark.read.parquet(path)
    got = sparql_select(bare, "SELECT ?p ?o WHERE { s7 ?p ?o . }")
    assert sorted(tuple(r) for r in got.collect()) == [("p", "o7"), ("q", "extra")]


def test_mapside_write_same_store_semantics(spark, tmp_path):
    """coalesce_buckets=False (the no-exchange write for huge stores)
    must produce a store with identical contents, identical bucket
    assignment, and the same constant-subject partition pruning — only
    the files-per-bucket layout differs."""
    from knowledgegraphs_spark.operators.triples import read_triples, write_triples

    data = [(f"s{i}", "p", f"o{i}") for i in range(50)] + [("s7", "q", "extra")]
    t = spark.createDataFrame(
        data, "subj string, pred string, obj string"
    ).select("subj", "pred", "obj", F.lit("xsd:string").alias("obj_dtype"),
             F.lit(True).alias("is_literal")).repartition(4)
    shuffled, mapside = str(tmp_path / "a"), str(tmp_path / "b")
    write_triples(t, shuffled, n_buckets=8)
    write_triples(t, mapside, n_buckets=8, coalesce_buckets=False)

    a, b = read_triples(spark, shuffled), read_triples(spark, mapside)
    cols = ["subj_bucket", "subj", "pred", "obj"]
    assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )
    df = sparql_select(b, "SELECT ?p ?o WHERE { s7 ?p ?o . }")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "subj_bucket" in plan.split("PartitionFilters:")[1].split("]")[0], plan
    # layout: map-side write keeps upstream parallelism — one file per
    # (input task × bucket it saw), never collapsed to n_buckets files
    import glob as _glob

    n_files_a = len(_glob.glob(shuffled + "/subj_bucket=*/*.parquet"))
    n_files_b = len(_glob.glob(mapside + "/subj_bucket=*/*.parquet"))
    assert n_files_b >= n_files_a


def test_plan_has_pushed_filters_and_no_python(tbox):
    # constant-predicate patterns must compile to plain filters + joins —
    # BatchEvalPython / CartesianProduct must not appear for connected BGPs
    query = f"""{SW_PREFIXES}
        SELECT ?cls ?lbl WHERE {{
            ?cls rdfs:subClassOf PO:TableClass ; rdfs:label ?lbl .
        }}"""
    plan = sparql_select(tbox, query)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# -------------------------------------------------------------------------
# ASK / CONSTRUCT query forms, HAVING, GROUP_CONCAT / SAMPLE aggregates
# -------------------------------------------------------------------------


def test_ask_true_and_false(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_ask

    q_hit = f"{SW_PREFIXES} ASK {{ ?c rdfs:subClassOf PO:TableClass . }}"
    q_miss = f"{SW_PREFIXES} ASK WHERE {{ ?c rdfs:subClassOf PO:NoSuchClass . }}"
    assert rows(sparql_ask(tbox, q_hit)) == [(True,)]
    assert rows(sparql_ask(tbox, q_miss)) == [(False,)]
    # distributed emptiness probe: single boolean column named 'ask'
    assert sparql_ask(tbox, q_hit).columns == ["ask"]


def test_ask_respects_filters(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_ask

    q = f"""{SW_PREFIXES} ASK {{
        ?c rdfs:label ?l . FILTER (STRLEN(?l) > 100)
    }}"""
    assert rows(sparql_ask(tbox, q)) == [(False,)]


def test_construct_basic_template(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_construct

    q = f"""{SW_PREFIXES}
        CONSTRUCT {{ ?c <{PO}isTable> 'yes' . }}
        WHERE {{ ?c rdfs:subClassOf PO:TableClass ; rdfs:label ?l . }}"""
    got = rows(sparql_construct(tbox, q))
    assert got == [
        (PO + "Address", PO + "isTable", "yes"),
        (PO + "Person", PO + "isTable", "yes"),
    ]


def test_construct_multi_template_and_set_semantics(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_construct

    # two template triples per solution; Person has several subClassOf
    # solutions → duplicates that the set semantics must fold
    q = f"""{SW_PREFIXES}
        CONSTRUCT {{
            ?c a <{PO}Table> .
            ?c <{PO}label_copy> ?l .
        }}
        WHERE {{ ?c rdfs:subClassOf ?super ; rdfs:label ?l . }}"""
    got = rows(sparql_construct(tbox, q))
    assert (PO + "Person", "rdf:type", PO + "Table") in [
        (s, p, o) for (s, p, o) in got
    ] or (PO + "Person", RDF + "type", PO + "Table") in got
    # exactly one rdf:type row per class and one label_copy per class
    person_rows = [r for r in got if r[0] == PO + "Person"]
    assert len(person_rows) == 2


def test_construct_null_bound_template_var_skipped(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_construct

    # ?lbl is OPTIONAL — classes without labels must not emit a triple
    # with a NULL object (spec: invalid instantiations are skipped)
    q = f"""{SW_PREFIXES}
        CONSTRUCT {{ ?c <{PO}hasLabel> ?lbl . }}
        WHERE {{
            ?c rdfs:subClassOf PO:TableClass .
            OPTIONAL {{ ?c rdfs:label ?lbl . }}
        }}"""
    got = rows(sparql_construct(tbox, q))
    assert got == [
        (PO + "Address", PO + "hasLabel", "Address"),
        (PO + "Person", PO + "hasLabel", "Person"),
    ]
    # C1 matches the direct subClassOf pattern but has no label → its
    # instantiation is skipped entirely, never emitted with a NULL object
    assert all(o is not None for (_, _, o) in got)


def test_construct_unbound_template_var_drops_pattern(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_construct

    q = f"""{SW_PREFIXES}
        CONSTRUCT {{ ?c <{PO}p1> 'k' . ?c <{PO}p2> ?never . }}
        WHERE {{ ?c rdfs:subClassOf PO:TableClass ; rdfs:label ?l . }}"""
    got = rows(sparql_construct(tbox, q))
    assert {p for (_, p, _) in got} == {PO + "p1"}


def test_group_concat_sorted_and_separator(tbox):
    q = f"""{SW_PREFIXES}
        SELECT (GROUP_CONCAT(?l; SEPARATOR=",") AS ?all_labels)
        WHERE {{ ?c rdfs:subClassOf PO:TableClass ; rdfs:label ?l . }}"""
    assert rows(sparql_select(tbox, q)) == [("Address,Person",)]


def test_group_concat_default_separator_is_space(tbox):
    q = f"""{SW_PREFIXES}
        SELECT (GROUP_CONCAT(?l) AS ?all_labels)
        WHERE {{ ?c rdfs:subClassOf PO:TableClass ; rdfs:label ?l . }}"""
    assert rows(sparql_select(tbox, q)) == [("Address Person",)]


def test_group_concat_distinct(spark):
    t = spark.createDataFrame(
        [("s1", "p", "a"), ("s1", "p", "a"), ("s1", "p", "b")],
        "subj string, pred string, obj string",
    )
    q = """SELECT ?s (GROUP_CONCAT(DISTINCT ?o; SEPARATOR="|") AS ?os)
           WHERE { ?s p ?o . } GROUP BY ?s"""
    assert rows(sparql_select(t, q)) == [("s1", "a|b")]


def test_sample_is_deterministic_min(tbox):
    q = f"""{SW_PREFIXES}
        SELECT (SAMPLE(?l) AS ?one)
        WHERE {{ ?c rdfs:label ?l . }}"""
    # SAMPLE = min: '(' sorts before any letter in the TBOX labels
    assert rows(sparql_select(tbox, q)) == [("(0010,0010)",)]


def test_having_with_aggregate_not_in_select(tbox):
    # HAVING over COUNT(*) while SELECT carries only the group var
    q = f"""{SW_PREFIXES}
        SELECT ?c WHERE {{ ?c rdfs:subClassOf ?s . }}
        GROUP BY ?c HAVING (COUNT(*) >= 3)"""
    assert rows(sparql_select(tbox, q)) == [(PO + "Person",)]


def test_having_over_select_alias_and_combined(tbox):
    q = f"""{SW_PREFIXES}
        SELECT ?c (COUNT(*) AS ?n) WHERE {{ ?c rdfs:subClassOf ?s . }}
        GROUP BY ?c HAVING (?n >= 2 && COUNT(*) < 3)"""
    assert rows(sparql_select(tbox, q)) == [
        (PO + "Address", 2),
        (PO + "street_attr", 2),
    ]


def test_having_without_group_raises(tbox):
    import pytest as _pytest

    q = f"{SW_PREFIXES} SELECT ?c WHERE {{ ?c rdfs:label ?l . }} HAVING (COUNT(*) > 1)"
    with _pytest.raises(ValueError, match="HAVING requires aggregation"):
        sparql_select(tbox, q).collect()


def test_aggregate_in_filter_raises(tbox):
    import pytest as _pytest

    q = f"{SW_PREFIXES} SELECT ?c WHERE {{ ?c rdfs:label ?l . FILTER (COUNT(*) > 1) }}"
    with _pytest.raises(ValueError, match="aggregate calls"):
        sparql_select(tbox, q).collect()


def test_form_dispatch_and_wrong_form_raises(tbox):
    import pytest as _pytest

    from knowledgegraphs_spark.operators.sparql import (
        sparql_ask,
        sparql_construct,
        sparql_query,
    )

    ask_text = f"{SW_PREFIXES} ASK {{ ?c rdfs:label ?l . }}"
    sel_text = f"{SW_PREFIXES} SELECT ?c WHERE {{ ?c rdfs:label ?l . }}"
    with _pytest.raises(TypeError, match="not a SELECT"):
        sparql_select(tbox, ask_text)
    with _pytest.raises(TypeError, match="not an ASK"):
        sparql_ask(tbox, sel_text)
    with _pytest.raises(TypeError, match="not a CONSTRUCT"):
        sparql_construct(tbox, sel_text)
    assert rows(sparql_query(tbox, ask_text)) == [(True,)]
    assert len(rows(sparql_query(tbox, sel_text))) > 0


def test_ask_and_construct_plans_stay_jvm_side(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_ask, sparql_construct

    ask_plan = (
        sparql_ask(tbox, f"{SW_PREFIXES} ASK {{ ?c rdfs:label ?l . }}")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    con_plan = (
        sparql_construct(
            tbox,
            f"{SW_PREFIXES} CONSTRUCT {{ ?c <{PO}p> ?l . }} WHERE {{ ?c rdfs:label ?l . }}",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for plan in (ask_plan, con_plan):
        assert "BatchEvalPython" not in plan


# -------------------------------------------------------------------------
# DESCRIBE
# -------------------------------------------------------------------------


def test_describe_constant_resource(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_describe

    got = rows(sparql_describe(tbox, f"{SW_PREFIXES} DESCRIBE PO:hasName"))
    assert got == [
        (PO + "hasName", RDFS + "label", "has name"),
        (PO + "hasName", SKOS + "altLabel", "name"),
        (PO + "hasName", SKOS + "prefLabel", "name-pref"),
    ]


def test_describe_variable_with_where(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_describe

    q = f"""{SW_PREFIXES}
        DESCRIBE ?p WHERE {{ ?p rdfs:domain PO:Person . }}"""
    assert rows(sparql_describe(tbox, q)) == [
        (PO + "livesAt", RDFS + "domain", PO + "Person"),
        (PO + "livesAt", RDFS + "range", PO + "Address"),
    ]


def test_describe_mixed_constants_vars_and_star(tbox):
    from knowledgegraphs_spark.operators.sparql import sparql_describe

    # constant ∪ variable bindings, set-deduplicated
    q = f"""{SW_PREFIXES}
        DESCRIBE PO:livesAt ?p WHERE {{ ?p rdfs:domain PO:Person . }}"""
    assert rows(sparql_describe(tbox, q)) == [
        (PO + "livesAt", RDFS + "domain", PO + "Person"),
        (PO + "livesAt", RDFS + "range", PO + "Address"),
    ]
    # * = every projected variable of the WHERE clause
    q_star = f"""{SW_PREFIXES}
        DESCRIBE * WHERE {{ ?p rdfs:domain ?cls . }}"""
    got = rows(sparql_describe(tbox, q_star))
    subjects = {s for (s, _, _) in got}
    assert subjects == {PO + "livesAt", PO + "Person"}


def test_describe_unbound_and_star_without_where(tbox):
    import pytest as _pytest

    from knowledgegraphs_spark.operators.sparql import parse_query, sparql_describe

    # a DESCRIBE variable with no WHERE clause never binds → empty graph
    assert rows(sparql_describe(tbox, "DESCRIBE ?x")) == []
    with _pytest.raises(SyntaxError, match="DESCRIBE"):
        parse_query("DESCRIBE * ")
    with _pytest.raises(SyntaxError, match="DESCRIBE"):
        parse_query("DESCRIBE WHERE { ?s ?p ?o }")


def test_describe_dispatch_and_wrong_form(tbox):
    import pytest as _pytest

    from knowledgegraphs_spark.operators.sparql import sparql_describe, sparql_query

    with _pytest.raises(TypeError, match="not a DESCRIBE"):
        sparql_describe(tbox, f"{SW_PREFIXES} SELECT ?c WHERE {{ ?c rdfs:label ?l . }}")
    got = rows(sparql_query(tbox, f"{SW_PREFIXES} DESCRIBE PO:C3"))
    assert got == [(PO + "C3", RDFS + "subClassOf", PO + "C2")]
