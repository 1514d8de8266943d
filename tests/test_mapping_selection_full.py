"""The complete D-stage per-column decision procedure
(MappingSelection.java:175-470) — hand-computed branch coverage."""

from knowledgegraphs_spark.operators.ontology import (
    TBox,
    find_nary_paths_py,
    select_from_incompatible_paths,
    select_optimal,
    select_table_column_optimal,
    select_table_optimal,
)

TBOX = TBox(
    subclass_of={"DemandAccount": {"Account"}, "Account": {"Thing"}},
    prop_domain={"hasAccount": "Thing", "dpBalance": "Account", "dpName": "Thing"},
    prop_range={"hasAccount": "Account", "dpBalance": "xsd:decimal", "dpName": "xsd:string"},
)


def cand(tgt, bes, pj, rank, perc=0.0):
    return {"tgt": tgt, "bes": bes, "pj": pj, "pj_rank": rank, "pj_perc": perc}


def test_select_table_optimal_thresholds_and_tiebreaks():
    cands = [
        cand("A", 0.9, 0.1, 2, perc=0.5),
        cand("B", 0.7, 0.6, 1, perc=0.4),   # passes via (low, pj_high)
        cand("C", 0.65, 0.6, 1, perc=0.9),  # same rank, higher perc → wins
        cand("D", 0.1, 0.9, 1, perc=1.0),   # fails both thresholds
    ]
    assert select_table_optimal(cands) == "C"
    assert select_table_optimal([cand("X", 0.5, 0.1, 1)]) is None


def test_select_optimal_union_vs_tiebreak():
    cands = [cand("A", 0.9, 0.5, 1), cand("B", 0.8, 0.5, 1), cand("C", 0.99, 0.9, 2)]
    assert select_optimal(cands) == "A"                      # BES tie-break
    assert select_optimal(cands, allow_union=True) == frozenset({"A", "B"})
    assert select_optimal(cands, filter_set={"C"}) == "C"


def test_nary_path_formation_and_selection():
    obj = [cand("hasAccount", 0.9, 0.8, 1)]
    cls = [cand("Account", 0.85, 0.7, 1), cand("Thing", 0.5, 0.4, 2)]
    data = [cand("dpBalance", 0.9, 0.9, 1), cand("dpName", 0.6, 0.5, 2)]
    paths = find_nary_paths_py(TBOX, obj, cls, data)
    # range(hasAccount)=Account ~ Account (equal) and ~ Thing (ancestor);
    # dpBalance's domain Account fits Account; dpName's Thing fits both
    assert ("hasAccount", "Account", "dpBalance") in paths
    # numeric PO column: decimal DO range compatible, string always passes
    o, c, d = select_table_column_optimal(
        TBOX, "Thing", obj, cls, data, po_data_range="xsd:decimal"
    )
    assert (o, c) == ("hasAccount", "Account")
    assert d == "dpBalance"  # min-rank data cand on the optimal path


def test_datatype_filter_prunes_incompatible_data_cands():
    data = [cand("dpBalance", 0.9, 0.9, 1), cand("dpName", 0.8, 0.8, 2)]
    # PO range xsd:date: decimal range incompatible, string always ok
    o, c, d = select_table_column_optimal(
        TBOX, "Account", None, None, data, po_data_range="xsd:date"
    )
    assert (o, c) == (None, None) and d == "dpName"


def test_incompatible_paths_voting_drops_loser():
    # no n-ary path: class candidate unrelated to obj range
    tb = TBox(
        subclass_of={},
        prop_domain={"pX": "D"},
        prop_range={"pX": "R"},
    )
    obj = [cand("pX", 0.9, 0.9, 1)]
    cls = [cand("Unrelated", 0.5, 0.4, 1)]
    o, c, d = select_from_incompatible_paths(tb, None, obj, cls, None)
    # obj wins both BES and PJ votes; range R !~ Unrelated → class dropped
    assert o == "pX" and c is None and d is None


def test_incompatible_paths_class_wins_votes():
    # (a Set-valued initial winner would NPE in the reference's String cast,
    # MappingSelection.java:245-246 — unique winners are its precondition)
    tb = TBox(subclass_of={}, prop_domain={"pX": "D"}, prop_range={"pX": "R"})
    obj = [cand("pX", 0.5, 0.4, 1)]
    cls = [cand("Unrelated", 0.9, 0.9, 1), cand("Other", 0.7, 0.8, 2)]
    o, c, d = select_from_incompatible_paths(tb, None, obj, cls, None)
    assert o is None
    # class re-selected with a union allowed → unique min-rank survivor
    assert c == "Unrelated"


def test_reject_property_maps_flag():
    obj = [cand("hasAccount", 0.9, 0.8, 1)]
    cls = [cand("Account", 0.85, 0.7, 1)]
    data = [cand("dpBalance", 0.9, 0.9, 1)]
    o, c, d = select_table_column_optimal(
        TBOX, "Thing", obj, cls, data, reject_property_maps=True
    )
    assert o is None and d is None and c == "Account"
