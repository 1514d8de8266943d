"""Basic-graph-pattern matching (operators/bgp.py): SPARQL BGP semantics
over the (subj, pred, obj) table — constants filter, shared variables
join, repeated variables within a pattern filter by equality, bag
semantics throughout. Reference parity: the reference runs these queries
as SPARQL in GraphDB after upload (GraphDBService.java); this is the
on-the-table equivalent."""

import pytest

from knowledgegraphs_spark.operators.bgp import match_bgp

TRIPLES = [
    # two conversations, three turns, role attrs
    ("conv1", "rdf:type", "Conversation"),
    ("conv2", "rdf:type", "Conversation"),
    ("turn1", "rdf:type", "Turn"),
    ("turn2", "rdf:type", "Turn"),
    ("turn3", "rdf:type", "Turn"),
    ("turn1", "in_conv", "conv1"),
    ("turn2", "in_conv", "conv1"),
    ("turn3", "in_conv", "conv2"),
    ("turn1", "has_role", "user"),
    ("turn2", "has_role", "assistant"),
    ("turn3", "has_role", "user"),
    ("self", "points_to", "self"),  # repeated-variable target
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chain_join_binds_shared_variables(triples):
    got = match_bgp(
        triples,
        [
            ("?t", "rdf:type", "Turn"),
            ("?t", "in_conv", "?c"),
            ("?t", "has_role", "user"),
        ],
    )
    assert got.columns == ["c", "t"]  # sorted variable names
    assert _rows(got) == [("conv1", "turn1"), ("conv2", "turn3")]


def test_variable_predicate(triples):
    got = match_bgp(triples, [("turn2", "?p", "?o")])
    assert got.columns == ["o", "p"]  # variables sorted by name
    assert _rows(got) == sorted(
        [("Turn", "rdf:type"), ("conv1", "in_conv"), ("assistant", "has_role")]
    )


def test_repeated_variable_within_pattern_is_equality(triples):
    got = match_bgp(triples, [("?x", "points_to", "?x")])
    assert _rows(got) == [("self",)]


def test_constant_pattern_multiplies_bag(triples):
    # SPARQL bag semantics: a constant pattern matching k triples joins in
    # k empty mappings — multiplicity k on every other binding
    got = match_bgp(
        triples,
        [("?c", "rdf:type", "Conversation"), ("turn1", "has_role", "user")],
    )
    assert _rows(got) == [("conv1",), ("conv2",)]
    got0 = match_bgp(
        triples,
        [("?c", "rdf:type", "Conversation"), ("turn1", "has_role", "nosuch")],
    )
    assert got0.count() == 0


def test_disconnected_patterns_cross_product(triples):
    got = match_bgp(
        triples, [("?c", "rdf:type", "Conversation"), ("?t", "rdf:type", "Turn")]
    )
    assert got.count() == 6  # 2 conversations x 3 turns


def test_empty_pattern_raises(triples):
    with pytest.raises(ValueError):
        match_bgp(triples, [])


def test_no_duplicate_elimination(spark):
    # bag semantics: duplicate triples produce duplicate bindings
    dup = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "b")], "subj string, pred string, obj string"
    )
    assert match_bgp(dup, [("?x", "p", "?y")]).count() == 2
