"""G3/G5/F6/F7/W5/J6/J9: ancestor closure, hierarchy collapse, compatibility
filters, argmin-rank selection, PII flagging."""

import pytest

from knowledgegraphs_spark.operators.ontology import (
    TBox,
    ancestor_closure_bfs,
    ancestor_closure_df,
    are_compatible,
    consider_hierarchies,
    data_range_compatible,
    filter_by_family,
    find_hierarchical_relations,
    flag_pii,
    reject_low_scores,
    select_optimal_df,
)

EDGES = {
    "DemandDepositAccount": {"Account"},
    "Account": {"Thing"},
    "FloatingRateNoteDate": {"Date"},
    "Date": {"Thing"},
    "hasDateOfRegistration": {"hasDate"},
    "hasDate": {"relatesTo"},
    "isLinkedToAccount": {"relatesTo"},
    "hasCorrespondingAccount": {"relatesTo"},
    "appliesToAccount": set(),
}


def test_ancestor_closure_bfs():
    anc = ancestor_closure_bfs(EDGES, "DemandDepositAccount")
    assert anc == {"Account": 1, "Thing": 2}
    assert ancestor_closure_bfs(EDGES, "Thing") == {}
    with_self = ancestor_closure_bfs(EDGES, "Account", include_self=True)
    assert with_self["Account"] == 0 and with_self["Thing"] == 1


def test_ancestor_closure_cycle_guard():
    cyc = {"a": {"b"}, "b": {"a"}}
    assert ancestor_closure_bfs(cyc, "a") == {"b": 1}


def test_are_compatible():
    tb = TBox(subclass_of=EDGES)
    assert are_compatible(tb, "Account", "Account", False)
    assert are_compatible(tb, "DemandDepositAccount", "Account", False)  # descendant
    assert are_compatible(tb, "Account", "DemandDepositAccount", False)  # ancestor
    assert not are_compatible(tb, "Account", "Date", False)
    assert are_compatible(tb, None, "Date", True) and not are_compatible(tb, None, "Date", False)
    # union domain: any operand compatible suffices
    assert are_compatible(tb, frozenset({"Date", "Account"}), "DemandDepositAccount", False)


def test_data_range_compatible():
    assert data_range_compatible(None, "xsd:integer")
    assert data_range_compatible("xsd:string", "xsd:date")
    assert data_range_compatible("xsd:decimal", "xsd:integer")      # decimal DO accepts int PO
    assert not data_range_compatible("xsd:integer", "xsd:decimal")  # not the reverse
    assert data_range_compatible("xsd:dateTimeStamp", "xsd:date")
    assert not data_range_compatible("xsd:date", "xsd:integer")
    # exact reference families (XSDmappers.java:16-18): xsd:int and
    # xsd:gYear are NOT family members
    assert not data_range_compatible("xsd:decimal", "xsd:int")
    assert not data_range_compatible("xsd:gYear", "xsd:date")
    # non-XSD (class-valued) DO range: equivalent-union membership only
    # (MappingSelection.java:326-329) — equality alone does not qualify
    assert data_range_compatible(
        "MonetaryAmount", "xsd:decimal", {"MonetaryAmount": {"xsd:decimal"}}
    )
    assert not data_range_compatible("MonetaryAmount", "xsd:decimal")
    assert not data_range_compatible("MonetaryAmount", "MonetaryAmount")


def test_find_hierarchical_relations_reference_example():
    """The worked FIBO example from MappingSelection.java:507-528."""
    tb = TBox(subclass_of=EDGES)
    groups = find_hierarchical_relations(
        tb, {"hasCorrespondingAccount", "isLinkedToAccount", "appliesToAccount"}, depth_thrs=2
    )
    by_set = {grp: v for grp, v in groups.items()}
    sib = frozenset({"hasCorrespondingAccount", "isLinkedToAccount"})
    assert sib in by_set and by_set[sib][0] == "relatesTo" and by_set[sib][1] == 1
    solo = frozenset({"appliesToAccount"})
    assert solo in by_set and by_set[solo][1] == 0


def test_consider_hierarchies_isa_specialize():
    """ISA group {Date, FloatingRateNoteDate}: descendant wins when at least
    as good as the ancestor."""
    tb = TBox(subclass_of=EDGES)
    cands = [
        {"tgt": "Date", "pj": 0.5, "bes": 0.8, "pj_rank": 2},
        {"tgt": "FloatingRateNoteDate", "pj": 0.7, "bes": 0.9, "pj_rank": 1},
    ]
    out = consider_hierarchies(tb, cands)
    assert len(out) == 1
    assert out[0]["tgt"] == "FloatingRateNoteDate"
    # scores = group max, rank = group min
    assert out[0]["bes"] == 0.9 and out[0]["pj_rank"] == 1


def test_consider_hierarchies_generalize_to_ancestor():
    """Sibling group with no unique best → collapse to common ancestor."""
    tb = TBox(subclass_of=EDGES)
    cands = [
        {"tgt": "isLinkedToAccount", "pj": 0.6, "bes": 0.7, "pj_rank": 1},
        {"tgt": "hasCorrespondingAccount", "pj": 0.6, "bes": 0.7, "pj_rank": 1},
    ]
    out = consider_hierarchies(tb, cands)
    assert [r["tgt"] for r in out] == ["relatesTo"]


def test_reject_and_family_filters(spark):
    df = spark.createDataFrame(
        [
            ("a", "t1", 0.9, 0.9, "xsd:integer", "xsd:unsignedInt"),
            ("a", "t2", 0.9, 0.1, "xsd:integer", "xsd:unsignedInt"),  # F3: pj too low
            ("a", "t3", 0.9, 0.9, "xsd:decimal", "xsd:dateTimeStamp"),  # F7: family clash
            ("a", "t4", 0.9, 0.9, "xsd:decimal", "Money"),  # non-XSD DO range
        ],
        "src: string, tgt: string, bes: double, pj: double, po_range: string, do_range: string",
    )
    out = filter_by_family(reject_low_scores(df))
    assert sorted(r.tgt for r in out.collect()) == ["t1"]
    # the union branch admits the class-valued range when its equivalent
    # union contains the PO range
    out2 = filter_by_family(
        reject_low_scores(df), equivalent_unions={"Money": {"xsd:decimal"}}
    )
    assert sorted(r.tgt for r in out2.collect()) == ["t1", "t4"]


def test_select_optimal_df(spark):
    df = spark.createDataFrame(
        [
            ("a", "t1", 0.9, 0.8, 1),
            ("a", "t2", 0.7, 0.8, 1),  # same rank, lower bes → dropped
            ("a", "t3", 0.99, 0.9, 2),  # worse rank → dropped
            ("b", "t4", 0.5, 0.5, 3),
        ],
        "src: string, tgt: string, bes: double, pj: double, pj_rank: int",
    )
    out = {(r.src, r.tgt) for r in select_optimal_df(df, ["src"]).collect()}
    assert out == {("a", "t1"), ("b", "t4")}
    union = {(r.src, r.tgt) for r in select_optimal_df(df, ["src"], allow_union=True).collect()}
    assert union == {("a", "t1"), ("a", "t2"), ("b", "t4")}


@pytest.fixture(scope="module")
def closure_df(spark):
    edges = spark.createDataFrame(
        [(c, p) for c, ps in EDGES.items() for p in ps], "child: string, parent: string"
    )
    return ancestor_closure_df(edges)


def test_ancestor_closure_df(spark, closure_df):
    rows = {(r.node, r.anc): r.depth for r in closure_df.collect()}
    assert rows[("DemandDepositAccount", "Account")] == 1
    assert rows[("DemandDepositAccount", "Thing")] == 2
    assert rows[("hasDateOfRegistration", "relatesTo")] == 2
    assert ("Thing", "Thing") not in rows


def test_flag_pii(spark, closure_df):
    matches = spark.createDataFrame(
        [("col_acct", "DemandDepositAccount"), ("col_note", "FloatingRateNoteDate"), ("col_x", "Thing")],
        "element: string, do_class: string",
    )
    dpv = {"Account": "dpv:FinancialAccount", "Date": "dpv:Date", "DemandDepositAccount": "dpv:DDA"}
    out = {r.element: list(r.pii_classes) for r in flag_pii(matches, closure_df, dpv, spark).collect()}
    # direct match + ancestor match, deduped and sorted
    assert out["col_acct"] == ["dpv:DDA", "dpv:FinancialAccount"]
    assert out["col_note"] == ["dpv:Date"]
    assert "col_x" not in out  # no DPV hit → not flagged


def test_x13_compose_table_class_annotations(spark):
    """Reference prepended-label output (extractBertMapMappings.py:119-143)
    for each ownership branch: direct onProperty, someValuesFrom, and the
    attribute-class path."""
    from knowledgegraphs_spark.operators.ontology import compose_table_class_annotations

    annots = spark.createDataFrame(
        [("p_amount", "amount"), ("p_amount", "value"), ("p_other", "other")],
        "element string, annotation string",
    )
    subclass = spark.createDataFrame(
        [("LoanTable", "TableClass"), ("OtherTable", "TableClass"),
         ("AmountAttr", "AttributeClass")],
        "child string, parent string",
    )
    restrictions = spark.createDataFrame(
        [
            ("LoanTable", "onProperty", "p_amount"),        # branch (a)
            ("OtherTable", "someValuesFrom", "p_other"),    # branch (b)
            ("AmountAttr", "onProperty", "p_amount"),       # branch (c).1
            ("LoanTable", "someValuesFrom", "AmountAttr"),  # branch (c).2 → same owner, dedup'd
        ],
        "cls string, kind string, target string",
    )
    labels = spark.createDataFrame(
        [("LoanTable", "Loan"), ("OtherTable", "Other")], "cls string, label string"
    )
    rows = compose_table_class_annotations(annots, subclass, restrictions, labels).collect()
    got = {(r.element, r.annotation) for r in rows}
    assert ("p_amount", "loan amount") in got
    assert ("p_amount", "loan value") in got
    assert ("p_other", "other other") in got
    assert ("p_amount", "amount") in got and ("p_other", "other") in got
    # duplicate ownership via branches (a)+(c) must not duplicate rows
    assert len(rows) == len(got)


def test_j6_df_twin_accepts_hierarchical_domains(spark):
    """The DataFrame find_nary_paths must agree with find_nary_paths_py when
    the data property's domain is hierarchically related (not equal) to the
    class candidate — the round-1 DF/driver divergence from ADVICE.md."""
    from knowledgegraphs_spark.operators.ontology import (
        TBox,
        find_nary_paths,
        find_nary_paths_py,
    )

    edges = {"DemandDepositAccount": {"Account"}}
    tb = TBox(
        subclass_of=edges,
        prop_range={"holdsAccount": "Account"},
        prop_domain={"dpBalance": "Account"},
    )
    obj = [{"tgt": "holdsAccount", "pj_rank": 1, "pj": 0.9, "bes": 0.9}]
    cls = [{"tgt": "DemandDepositAccount", "pj_rank": 1, "pj": 0.9, "bes": 0.9}]
    data = [{"tgt": "dpBalance", "pj_rank": 1, "pj": 0.9, "bes": 0.9}]
    py_paths = set(find_nary_paths_py(tb, obj, cls, data))
    assert py_paths == {("holdsAccount", "DemandDepositAccount", "dpBalance")}

    closure_df = spark.createDataFrame(
        [("DemandDepositAccount", "Account", 1)], "node string, anc string, depth int"
    )
    obj_df = spark.createDataFrame(
        [("e", "holdsAccount", "Account")], "src string, tgt string, range string"
    )
    cls_df = spark.createDataFrame([("e", "DemandDepositAccount")], "src string, tgt string")
    data_df = spark.createDataFrame(
        [("e", "dpBalance", "Account")], "src string, tgt string, domain string"
    )
    df = find_nary_paths(obj_df, cls_df, data_df, closure_df, ["src"])
    got = {(r.obj_cand, r.cls_cand, r.data_cand) for r in df.collect()}
    assert got == py_paths


def test_transitive_reduction_removes_only_implied_edges(spark):
    """g33: the asserted shortcut a->c vanishes (implied via a->b->c),
    diamond edges all survive (no single alternative PATH implies them),
    and the reduced graph's closure equals the original's."""
    from knowledgegraphs_spark.operators.ontology import (
        ancestor_closure_df,
        transitive_reduction,
    )

    # chain a->b->c with shortcut a->c; diamond d->e, d->f, e->g, f->g
    edges = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("d", "e"), ("d", "f"), ("e", "g"), ("f", "g"),
    ]
    df = spark.createDataFrame(edges, "child string, parent string")
    kept = {(r.child, r.parent) for r in transitive_reduction(df).collect()}
    assert kept == {("a", "b"), ("b", "c"), ("d", "e"), ("d", "f"), ("e", "g"), ("f", "g")}
    before = {
        (r.node, r.anc) for r in ancestor_closure_df(df).select("node", "anc").collect()
    }
    reduced_df = spark.createDataFrame(sorted(kept), "child string, parent string")
    after = {
        (r.node, r.anc)
        for r in ancestor_closure_df(reduced_df).select("node", "anc").collect()
    }
    assert before == after
