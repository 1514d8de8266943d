"""SPARQL 1.1 expression builtins (operators/sparql.py).

The round-3 surface covered the builtins the reference's own query texts
use (STR/CONTAINS/REGEX/...); this file covers the rest of the §17.4
function library a real SPARQL user types next — IF, COALESCE, SUBSTR,
REPLACE, STRBEFORE/STRAFTER, ABS/ROUND/CEIL/FLOOR — plus ORDER BY over
expressions and general (non-aggregate) SELECT expressions, all compiled
to Catalyst expressions (no Python in the row path).
"""

import pytest

from knowledgegraphs_spark.operators.sparql import sparql_select

EX = "http://example.org/x#"

RDFS = "http://www.w3.org/2000/01/rdf-schema#"

PFX = f"PREFIX ex: <{EX}>\nPREFIX rdfs: <{RDFS}>\n"

TRIPLES = [
    (EX + "a", RDFS + "label", "alpha-item"),
    (EX + "b", RDFS + "label", "beta"),
    (EX + "c", RDFS + "label", "gamma-thing"),
    (EX + "a", EX + "score", "2.5"),
    (EX + "b", EX + "score", "-2.5"),
    (EX + "c", EX + "score", "1.2"),
    (EX + "a", EX + "note", "has note"),
]


@pytest.fixture(scope="module")
def store(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_if_builtin(store):
    q = PFX + """
        SELECT ?s ?tag WHERE {
            ?s ex:score ?v .
            BIND (IF(?v >= 0, 'pos', 'neg') AS ?tag)
        }"""
    assert rows(sparql_select(store, q)) == [
        (EX + "a", "pos"),
        (EX + "b", "neg"),
        (EX + "c", "pos"),
    ]


def test_coalesce_over_optional(store):
    q = PFX + """
        SELECT ?s ?note WHERE {
            ?s ex:score ?v .
            OPTIONAL { ?s ex:note ?n . }
            BIND (COALESCE(?n, 'none') AS ?note)
        }"""
    assert rows(sparql_select(store, q)) == [
        (EX + "a", "has note"),
        (EX + "b", "none"),
        (EX + "c", "none"),
    ]


def test_substr_two_and_three_arg(store):
    q = PFX + """
        SELECT ?l2 ?l3 WHERE {
            ex:a rdfs:label ?l .
            BIND (SUBSTR(?l, 7) AS ?l2)
            BIND (SUBSTR(?l, 1, 5) AS ?l3)
        }"""
    assert rows(sparql_select(store, q)) == [("item", "alpha")]


def test_replace_with_flags(store):
    q = PFX + """
        SELECT ?r WHERE {
            ex:a rdfs:label ?l .
            BIND (REPLACE(?l, 'ALPHA', 'A', 'i') AS ?r)
        }"""
    assert rows(sparql_select(store, q)) == [("A-item",)]


def test_replace_pattern_must_be_literal(store):
    q = PFX + """
        SELECT ?r WHERE {
            ex:a rdfs:label ?l .
            BIND (REPLACE(?l, ?l, 'x') AS ?r)
        }"""
    with pytest.raises(ValueError, match="REPLACE pattern"):
        sparql_select(store, q).collect()


def test_strbefore_strafter_hit_and_miss(store):
    # spec §17.4.3: no-match yields "", not the whole string
    q = PFX + """
        SELECT ?s ?pre ?post WHERE {
            ?s rdfs:label ?l .
            BIND (STRBEFORE(?l, '-') AS ?pre)
            BIND (STRAFTER(?l, '-') AS ?post)
        }"""
    assert rows(sparql_select(store, q)) == [
        (EX + "a", "alpha", "item"),
        (EX + "b", "", ""),
        (EX + "c", "gamma", "thing"),
    ]


def test_numeric_builtins(store):
    # ROUND ties go toward +inf per the spec: -2.5 -> -2 (not -3)
    q = PFX + """
        SELECT ?s ?abs ?rnd ?ceil ?floor WHERE {
            ?s ex:score ?v .
            BIND (ABS(?v) AS ?abs)
            BIND (ROUND(?v) AS ?rnd)
            BIND (CEIL(?v) AS ?ceil)
            BIND (FLOOR(?v) AS ?floor)
        }"""
    assert rows(sparql_select(store, q)) == [
        (EX + "a", 2.5, 3.0, 3.0, 2.0),
        (EX + "b", 2.5, -2.0, -2.0, -3.0),
        (EX + "c", 1.2, 1.0, 2.0, 1.0),
    ]


def test_order_by_expression(store):
    q = PFX + """
        SELECT ?s WHERE { ?s rdfs:label ?l . }
        ORDER BY DESC(STRLEN(?l)) ?s"""
    got = [r[0] for r in sparql_select(store, q).collect()]
    # label lengths: gamma-thing=11, alpha-item=10, beta=4
    assert got == [EX + "c", EX + "a", EX + "b"]


def test_order_by_bare_builtin(store):
    q = PFX + """
        SELECT ?l WHERE { ?s rdfs:label ?l . }
        ORDER BY STRLEN(?l)"""
    got = [r[0] for r in sparql_select(store, q).collect()]
    assert got == ["beta", "alpha-item", "gamma-thing"]


def test_select_expression(store):
    q = PFX + """
        SELECT ?s (UCASE(STRBEFORE(?l, '-')) AS ?u) WHERE {
            ?s rdfs:label ?l . FILTER (CONTAINS(?l, '-'))
        }"""
    df = sparql_select(store, q)
    assert df.columns == ["s", "u"]
    assert rows(df) == [(EX + "a", "ALPHA"), (EX + "c", "GAMMA")]


def test_select_expression_with_aggregation_raises(store):
    q = PFX + """
        SELECT (STRLEN(?l) AS ?n) (COUNT(*) AS ?c) WHERE { ?s rdfs:label ?l . }
        GROUP BY ?l"""
    with pytest.raises(ValueError, match="SELECT expressions"):
        sparql_select(store, q)


def test_select_expression_rebind_raises(store):
    q = PFX + """
        SELECT (UCASE(?l) AS ?l) WHERE { ?s rdfs:label ?l . }"""
    with pytest.raises(ValueError, match="re-binds"):
        sparql_select(store, q)
