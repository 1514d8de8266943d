"""Turtle source (sources/turtle_source.py): parse RDF Turtle into the
triple-table schema. Reference parity: the reference loads ontology files
with rdflib/Jena (extractBertMapMappings.py:54-56, util/Ontology.java)
and queries the in-memory graph; here the file lands in the triple table
and operators/sparql.py answers the same queries."""

import pytest

from knowledgegraphs_spark.sources.turtle_source import (
    parse_turtle,
    read_turtle,
    tbox_from_triples,
)

ONTO = """
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix po: <http://example.org/po#> .

po:onto a owl:Ontology .

po:Person a owl:Class ;
    rdfs:subClassOf po:TableClass ,
        [ a owl:Restriction ; owl:onProperty po:hasName ] ;
    rdfs:label "Person"@en ;
    rdfs:comment '''A person,
spanning lines with "quotes".''' .

po:age a owl:DatatypeProperty ;
    rdfs:domain po:Person ;
    rdfs:range xsd:integer .

po:Mixed a owl:Class ;
    owl:unionOf ( po:Person po:TableClass ) .

po:weights po:vals 1 , 2.5 , 3e4 , true ;
    po:note "plain" ;
    po:typed "42"^^xsd:int .
"""

PO = "http://example.org/po#"
OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def by_pred(trips, pred):
    return [t for t in trips if t[1] == pred]


def test_parse_expands_prefixes_and_types_literals():
    trips = parse_turtle(ONTO)
    assert (PO + "onto", RDF + "type", OWL + "Ontology", None, False) in trips
    # label carries its lang tag in obj_dtype; comment is a long string
    labels = by_pred(trips, RDFS + "label")
    assert labels == [(PO + "Person", RDFS + "label", "Person", "@en", True)]
    comment = by_pred(trips, RDFS + "comment")[0]
    assert 'spanning lines with "quotes".' in comment[2]
    # numeric / boolean / explicitly-typed literals
    vals = {(t[2], t[3]) for t in by_pred(trips, PO + "vals")}
    assert vals == {("1", "xsd:integer"), ("2.5", "xsd:decimal"),
                    ("3e4", "xsd:double"), ("true", "xsd:boolean")}
    assert by_pred(trips, PO + "typed")[0][2:] == ("42", "xsd:int", True)


def test_parse_blank_restriction_and_collection():
    trips = parse_turtle(ONTO)
    # Person subClassOf [ a Restriction ; onProperty hasName ]
    sub = [t for t in by_pred(trips, RDFS + "subClassOf") if t[0] == PO + "Person"]
    blanks = [t[2] for t in sub if t[2].startswith("_:")]
    assert len(blanks) == 1 and (PO + "TableClass") in [t[2] for t in sub]
    b = blanks[0]
    assert (b, RDF + "type", OWL + "Restriction", None, False) in trips
    assert (b, OWL + "onProperty", PO + "hasName", None, False) in trips
    # unionOf collection → rdf:first/rest/nil chain
    head = by_pred(trips, OWL + "unionOf")[0][2]
    firsts, node, seen = [], head, set()
    while node != RDF + "nil":
        assert node not in seen
        seen.add(node)
        firsts.append(next(t[2] for t in trips if t[0] == node and t[1] == RDF + "first"))
        node = next(t[2] for t in trips if t[0] == node and t[1] == RDF + "rest")
    assert firsts == [PO + "Person", PO + "TableClass"]


def test_parse_compact_mode_keeps_pnames():
    trips = parse_turtle(ONTO, expand_prefixes=False)
    assert ("po:onto", "rdf:type", "owl:Ontology", None, False) in trips
    assert ("po:age", "rdfs:range", "xsd:integer", None, False) in trips


def test_parse_is_deterministic_and_doc_scoped():
    assert parse_turtle(ONTO) == parse_turtle(ONTO)
    # different documents never share skolem labels
    other = ONTO.replace("po:onto", "po:onto2")
    b1 = {t[0] for t in parse_turtle(ONTO) if t[0].startswith("_:")}
    b2 = {t[0] for t in parse_turtle(other) if t[0].startswith("_:")}
    assert b1 and b2 and not (b1 & b2)


def test_parse_errors():
    with pytest.raises(SyntaxError, match="undeclared prefix"):
        parse_turtle("nope:x a nope:Y .")
    with pytest.raises(SyntaxError):
        parse_turtle("po:x po:y")  # missing final dot
    with pytest.raises(SyntaxError, match="bad escape"):
        parse_turtle('@prefix po: <http://x/> . po:a po:b "bad \\q esc" .')


def test_sink_round_trip(spark, tmp_path):
    """write_turtle output parses back to the exact triple set (compact
    mode — the sink writes engine-native qnames and a _prefixes.ttl
    sidecar the file index hides from the data read)."""
    from knowledgegraphs_spark.sinks.turtle import write_turtle

    rows = [
        ("kg:T1", "rdf:type", "kg:Turn", None, False),
        ("kg:T1", "has_text", 'line\nwith "quote" and \\slash', "xsd:string", True),
        ("kg:T1", "has_n", "7", "xsd:integer", True),
        ("kg:C1", "p_Conversation_Turn", "kg:T1", None, False),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_dtype string, is_literal boolean"
    )
    path = str(tmp_path / "ttl_out")
    write_turtle(df, path)
    back = read_turtle(spark, path, expand_prefixes=False)
    got = {tuple(r) for r in back.collect()}
    want = {(s, p, o, dt if lit else None, lit) for s, p, o, dt, lit in rows}
    # integers round-trip as typed literals; strings keep xsd:string
    assert {(s, p, o) for s, p, o, *_ in got} == {(s, p, o) for s, p, o, *_ in want}
    assert dict(((s, p), (dt, lit)) for s, p, o, dt, lit in got) == dict(
        ((s, p), (dt if lit else None, lit)) for s, p, o, dt, lit in want
    )


def test_file_to_sparql_replaces_rdflib(spark, tmp_path):
    """The reference's _getSourceOntologyAnnotations flow end-to-end with
    no RDF library: Turtle file → triple table → verbatim SPARQL text."""
    from knowledgegraphs_spark.operators.sparql import sparql_select

    f = tmp_path / "onto.ttl"
    f.write_text(ONTO + f'\n<{PO}hasName> rdfs:label "has name" ; '
                 f'<http://www.w3.org/2004/02/skos/core#altLabel> "name" .\n')
    triples = read_turtle(spark, str(f))
    props = ", ".join(
        f"<{p}>" for p in (RDFS + "label", "http://www.w3.org/2004/02/skos/core#altLabel")
    )
    q = f"""
        SELECT ?annot WHERE {{
            <{PO}hasName> ?predicate ?annot .
            FILTER (?predicate IN ({props}))
        }}"""
    got = sorted(r[0] for r in sparql_select(triples, q).collect())
    assert got == ["has name", "name"]
    # and the ontology-namespace probe (extractBertMapMappings.py:63) —
    # the reference prepends swNamespaces, which declares rdf: (so `a`
    # expands to the full rdf:type IRI the expanded store holds)
    q2 = (f"PREFIX rdf: <{RDF}> PREFIX owl: <{OWL}> "
          f"select ?ns where {{?ns a owl:Ontology .}}")
    assert [r[0] for r in sparql_select(triples, q2).collect()] == [PO + "onto"]


def test_tbox_from_triples_ancestors():
    ttl = """
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    @prefix po: <http://example.org/po#> .
    po:C rdfs:subClassOf po:B . po:B rdfs:subClassOf po:A .
    po:p rdfs:domain po:C ; rdfs:range po:A .
    """
    tb = tbox_from_triples(parse_turtle(ttl))
    anc = tb.ancestors(PO + "C")
    assert anc == {PO + "B": 1, PO + "A": 2}
    assert tb.prop_domain[PO + "p"] == PO + "C"
    assert tb.prop_range[PO + "p"] == PO + "A"


def test_base_and_relative_iris():
    ttl = """
    @base <http://example.net/onto/doc.owl> .
    @prefix po: <http://example.org/po#> .
    <#Thing> po:note "x" ; po:next <other> .
    """
    trips = parse_turtle(ttl)
    assert ("http://example.net/onto/doc.owl#Thing", PO + "note", "x", "xsd:string", True) in trips
    assert ("http://example.net/onto/doc.owl#Thing", PO + "next",
            "http://example.net/onto/other", None, False) in trips
    with pytest.raises(SyntaxError, match="without @base"):
        parse_turtle("<#X> <#p> <#Y> .")


def test_reference_mapping_ttl_parses_verbatim():
    """The one real Turtle document in the reference tree (RML mapping,
    temp/rml/mapping.ttl): @base + relative <#...> IRIs, nested blank
    property lists, long-string SQL literal, dangling semicolons. Parsed
    without an RDF library; structure spot-checked."""
    import os

    path = ("/root/reference/KnowledgeGraphsJava/src/main/java/org/example/"
            "temp/rml/mapping.ttl")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    with open(path) as f:
        trips = parse_turtle(f.read())
    rr = "http://www.w3.org/ns/r2rml#"
    rml = "http://semweb.mmlab.be/ns/rml#"
    base = "http://www.example.net/ontologies/test_efs.owl/"
    maps = [s for (s, p, o, *_ ) in trips
            if p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" and o == rr + "TriplesMap"]
    assert maps == [base + "#ProductCategoryMapping"]
    q = [o for (s, p, o, dt, lit) in trips if p == rml + "query"]
    assert q == ["SELECT * FROM payment;"]
    # the logical source is a blank node carrying the SQL bits
    src = next(o for (s, p, o, *_ ) in trips if p == rml + "logicalSource")
    assert src.startswith("_:")
    assert (src, rr + "sqlVersion", rr + "SQL2008", None, False) in trips


def test_literal_escape_roundtrip_property():
    """Any text survives sink-style escaping → tokenizer → _unescape.
    The escape twin mirrors sinks/turtle.py _escape exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=60))
    def check(s):
        esc = (s.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
        ttl = f'@prefix po: <http://x#> .\npo:a po:b "{esc}" .'
        assert parse_turtle(ttl) == [("http://x#a", "http://x#b", s, "xsd:string", True)]

    check()


def test_ntriples_documents_parse_as_is():
    """N-Triples is the line-oriented Turtle subset (the canonical dump
    format of triple stores, incl. GraphDB exports) — the parser takes it
    with no separate code path."""
    nt = (
        '<http://x/a> <http://x/p> <http://x/b> .\n'
        '<http://x/a> <http://www.w3.org/2000/01/rdf-schema#label> "A label" .\n'
        '<http://x/b> <http://x/n> "3.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .\n'
        '_:g1 <http://x/p> _:g2 .\n'
    )
    trips = parse_turtle(nt, doc_id="nt")
    assert ("http://x/a", "http://x/p", "http://x/b", None, False) in trips
    assert ("http://x/a", "http://www.w3.org/2000/01/rdf-schema#label",
            "A label", "xsd:string", True) in trips
    assert ("http://x/b", "http://x/n", "3.5", "xsd:decimal", True) in trips
    assert ("_:nt_g1", "http://x/p", "_:nt_g2", None, False) in trips
