"""RDF/XML source (sources/rdfxml_source.py). Centerpiece: the SAME graph
written in RDF/XML and in Turtle must parse to the identical triple set
modulo blank-node labels — two independent parsers, one semantics."""

import pytest

from knowledgegraphs_spark.sources.rdfxml_source import parse_rdfxml, read_ontology
from knowledgegraphs_spark.sources.turtle_source import parse_turtle

PO = "http://example.org/po#"
OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

ONTO_XML = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="{RDF}" xmlns:rdfs="{RDFS}"
         xmlns:owl="{OWL}" xmlns:po="{PO}"
         xmlns:xsd="http://www.w3.org/2001/XMLSchema#">
  <owl:Ontology rdf:about="{PO}onto"/>
  <owl:Class rdf:about="{PO}Person">
    <rdfs:subClassOf rdf:resource="{PO}TableClass"/>
    <rdfs:subClassOf>
      <owl:Restriction>
        <owl:onProperty rdf:resource="{PO}hasName"/>
      </owl:Restriction>
    </rdfs:subClassOf>
    <rdfs:label xml:lang="en">Person</rdfs:label>
  </owl:Class>
  <owl:DatatypeProperty rdf:about="{PO}age">
    <rdfs:domain rdf:resource="{PO}Person"/>
    <rdfs:range rdf:resource="http://www.w3.org/2001/XMLSchema#integer"/>
  </owl:DatatypeProperty>
  <owl:Class rdf:about="{PO}Mixed">
    <owl:unionOf rdf:parseType="Collection">
      <rdf:Description rdf:about="{PO}Person"/>
      <rdf:Description rdf:about="{PO}TableClass"/>
    </owl:unionOf>
  </owl:Class>
  <rdf:Description rdf:about="{PO}weights">
    <po:typed rdf:datatype="http://www.w3.org/2001/XMLSchema#int">42</po:typed>
    <po:note>plain</po:note>
  </rdf:Description>
</rdf:RDF>
"""

# the same graph in Turtle
ONTO_TTL = f"""
@prefix rdf: <{RDF}> .
@prefix rdfs: <{RDFS}> .
@prefix owl: <{OWL}> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix po: <{PO}> .

po:onto a owl:Ontology .
po:Person a owl:Class ;
    rdfs:subClassOf po:TableClass ,
        [ a owl:Restriction ; owl:onProperty po:hasName ] ;
    rdfs:label "Person"@en .
po:age a owl:DatatypeProperty ;
    rdfs:domain po:Person ;
    rdfs:range xsd:integer .
po:Mixed a owl:Class ;
    owl:unionOf ( po:Person po:TableClass ) .
po:weights po:typed "42"^^xsd:int ;
    po:note "plain" .
"""


def canon(trips):
    """Triple set with blank labels canonicalized by one-hop signature —
    enough to compare graphs whose blanks differ only in label."""
    names = {}

    def n(t):
        if not str(t).startswith("_:"):
            return t
        if t not in names:
            sig = tuple(sorted((p, o if not str(o).startswith("_:") else "_") for (s, p, o, *_ ) in trips if s == t))
            names[t] = f"_:{hash(sig) & 0xFFFFFFFF:x}"
        return names[t]

    return {(n(s), p, n(o), dt, lit) for (s, p, o, dt, lit) in trips}


def test_rdfxml_equals_turtle_for_same_graph():
    assert canon(parse_rdfxml(ONTO_XML)) == canon(parse_turtle(ONTO_TTL))


def test_typed_node_emits_rdf_type_and_literals():
    trips = parse_rdfxml(ONTO_XML)
    assert (PO + "onto", RDF + "type", OWL + "Ontology", None, False) in trips
    assert (PO + "weights", PO + "typed", "42", "xsd:int", True) in trips
    assert (PO + "weights", PO + "note", "plain", "xsd:string", True) in trips
    assert (PO + "Person", RDFS + "label", "Person", "@en", True) in trips


def test_rdf_id_and_base_resolution():
    xml = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:po="{PO}"
        xml:base="http://example.org/doc">
      <rdf:Description rdf:ID="thing"><po:note>x</po:note></rdf:Description>
      <rdf:Description rdf:about="rel"><po:note>y</po:note></rdf:Description>
    </rdf:RDF>"""
    trips = parse_rdfxml(xml)
    assert ("http://example.org/doc#thing", PO + "note", "x", "xsd:string", True) in trips
    # RFC 3986: "rel" resolves against the base's last segment
    assert ("http://example.org/rel", PO + "note", "y", "xsd:string", True) in trips
    with pytest.raises(SyntaxError, match="xml:base"):
        parse_rdfxml(f'<rdf:RDF xmlns:rdf="{RDF}"><rdf:Description rdf:about="rel"/></rdf:RDF>')


def test_parse_type_resource_and_node_ids():
    xml = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:po="{PO}">
      <rdf:Description rdf:about="{PO}a">
        <po:p rdf:parseType="Resource"><po:q rdf:resource="{PO}b"/></po:p>
        <po:r rdf:nodeID="n1"/>
      </rdf:Description>
      <rdf:Description rdf:nodeID="n1"><po:note>shared</po:note></rdf:Description>
    </rdf:RDF>"""
    trips = parse_rdfxml(xml)
    mid = next(o for (s, p, o, *_ ) in trips if p == PO + "p")
    assert (mid, PO + "q", PO + "b", None, False) in trips
    ref = next(o for (s, p, o, *_ ) in trips if p == PO + "r")
    assert (ref, PO + "note", "shared", "xsd:string", True) in trips


def test_read_ontology_dispatch_and_spark_path(spark, tmp_path):
    from knowledgegraphs_spark.operators.sparql import sparql_select

    owl_f = tmp_path / "onto.owl"
    owl_f.write_text(ONTO_XML)
    ttl_f = tmp_path / "onto.ttl"
    ttl_f.write_text(ONTO_TTL)
    x = read_ontology(spark, str(owl_f))
    t = read_ontology(spark, str(ttl_f))
    q = f"""PREFIX rdfs: <{RDFS}>
        SELECT ?d ?r WHERE {{ <{PO}age> rdfs:domain ?d ; rdfs:range ?r . }}"""
    for df in (x, t):
        got = [tuple(r) for r in sparql_select(df, q).collect()]
        assert got == [(PO + "Person", "http://www.w3.org/2001/XMLSchema#integer")]
