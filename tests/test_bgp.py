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


def test_comention_pattern_over_full_kg(spark):
    """The flagship KG consumer query — pairs of conversations that mention
    the same canonical entity — expressed as a 6-pattern BGP over the FULL
    build (mentions + canonicalized entities), checked against the same
    answer derived relationally from the pipeline's canonical map."""
    import datetime

    from pyspark.sql import functions as F

    from knowledgegraphs_spark.plans.pipeline import build_kg

    ts = datetime.datetime(2026, 1, 5, 12, 0, 0)
    rows = [
        ("c1", 0, "we met Acme Corp about the plan"),
        ("c1", 1, "note on Widget Works too"),
        ("c2", 0, "talked to Widget Works yesterday"),
        ("c3", 0, "call with Acme Corporation again"),  # near-dup of c1's Acme
        ("c4", 0, "Gizmo Industries only here"),
    ]
    turns = spark.createDataFrame(
        [(c, i, "user", t, None, ts) for (c, i, t) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    triples, canonical = build_kg(spark, turns)
    got_df = match_bgp(
        triples,
        [
            ("?t1", "has_mention", "?m1"),
            ("?m1", "p_Mention_Entity", "?e"),
            ("?t1", "p_Turn_Conversation", "?c1"),
            ("?t2", "has_mention", "?m2"),
            ("?m2", "p_Mention_Entity", "?e"),
            ("?t2", "p_Turn_Conversation", "?c2"),
        ],
    )
    got = {
        (r.c1, r.c2, r.e)
        for r in got_df.filter(F.col("c1") < F.col("c2"))
        .select("c1", "c2", "e")
        .dropDuplicates()
        .collect()
    }
    # expected: conv pairs sharing a canonical entity, straight off the
    # pipeline's own mention->canonical map (relational path, no BGP)
    ment = triples.filter(F.col("pred") == "has_surface_VALUE").select(
        F.col("subj").alias("m_uri"), F.col("obj").alias("mention")
    )
    ent = triples.filter(F.col("pred") == "p_Mention_Entity").select(
        F.col("subj").alias("m_uri"), F.col("obj").alias("e_uri")
    )
    conv_of = triples.filter(F.col("pred") == "has_mention").select(
        F.col("obj").alias("m_uri"),
        F.regexp_extract("subj", r"^kg:Turn_2_(c\d+)_", 1).alias("conv"),
    )
    ce = ent.join(conv_of, "m_uri").select(
        F.concat(F.lit("kg:Conversation_1_"), F.col("conv")).alias("c"), "e_uri"
    ).dropDuplicates()
    a, b = ce.alias("a"), ce.alias("b")
    want = {
        (r["ac"], r["bc"], r["e"])
        for r in a.join(b, F.col("a.e_uri") == F.col("b.e_uri"))
        .filter(F.col("a.c") < F.col("b.c"))
        .select(F.col("a.c").alias("ac"), F.col("b.c").alias("bc"), F.col("a.e_uri").alias("e"))
        .dropDuplicates()
        .collect()
    }
    assert got == want
    # semantic spot-checks: c1-c2 share Widget Works, c1-c3 share the
    # canonicalized Acme entity, c4 shares with nobody
    pairs = {(x, y) for (x, y, _) in got}
    assert ("kg:Conversation_1_c1", "kg:Conversation_1_c2") in pairs
    assert ("kg:Conversation_1_c1", "kg:Conversation_1_c3") in pairs
    assert not any("c4" in x or "c4" in y for (x, y) in pairs)


def test_no_duplicate_elimination(spark):
    # bag semantics: duplicate triples produce duplicate bindings
    dup = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "b")], "subj string, pred string, obj string"
    )
    assert match_bgp(dup, [("?x", "p", "?y")]).count() == 2
