"""Temporal KG (as-of snapshot / validity intervals) and SHACL-lite
validation — unit coverage; the data-scale oracle twins are
``g24_kg_asof`` / ``g25_shacl_validation`` in ``tests/test_entry.py``."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.operators.shacl import Shape, validate
from knowledgegraphs_spark.operators.temporal import (
    asof_join,
    asof_snapshot,
    validity_intervals,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def assertions(spark):
    rows = [
        # e1's state changes twice before the cutoff, once after
        ("e1", "p", "v1", _ts("2024-01-01T00:00:00"), 1),
        ("e1", "p", "v2", _ts("2024-01-02T00:00:00"), 2),
        ("e1", "p", "v3", _ts("2024-01-09T00:00:00"), 3),
        # simultaneous assertions: tie broken by id (higher wins)
        ("e2", "p", "a", _ts("2024-01-03T00:00:00"), 4),
        ("e2", "p", "b", _ts("2024-01-03T00:00:00"), 5),
        # e3 only asserted after the cutoff — absent from the snapshot
        ("e3", "p", "late", _ts("2024-02-01T00:00:00"), 6),
        # second predicate on e1, untouched by the p churn
        ("e1", "q", "q1", _ts("2024-01-01T00:00:00"), 7),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, asserted_ts timestamp, event_id long"
    )


def test_asof_snapshot_latest_wins(assertions):
    snap = asof_snapshot(assertions, "2024-01-05 00:00:00", tie_break="event_id")
    state = {(r.subj, r.pred): r.obj for r in snap.collect()}
    assert state == {("e1", "p"): "v2", ("e2", "p"): "b", ("e1", "q"): "q1"}


def test_asof_snapshot_cutoff_inclusive(assertions):
    snap = asof_snapshot(assertions, "2024-01-02 00:00:00", tie_break="event_id")
    state = {(r.subj, r.pred): r.obj for r in snap.collect()}
    assert state[("e1", "p")] == "v2"  # assertion AT the cutoff counts


def test_validity_intervals_chain(assertions):
    iv = validity_intervals(assertions, tie_break="event_id")
    e1p = {r.obj: (r.valid_from, r.valid_to) for r in iv.filter("subj='e1' AND pred='p'").collect()}
    assert e1p["v1"] == (_ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"))
    assert e1p["v2"] == (_ts("2024-01-02T00:00:00"), _ts("2024-01-09T00:00:00"))
    assert e1p["v3"][1] is None  # still current


def test_asof_join_matches_snapshot(spark, assertions):
    """The interval-join form answers a single snapshot time identically
    to the window form — the equivalence that licenses using it for
    many-timestamp batches."""
    at = "2024-01-05 00:00:00"
    times = spark.createDataFrame([("s0", _ts("2024-01-05T00:00:00"))], "snap_id string, at timestamp")
    joined = {
        (r.subj, r.pred): r.obj
        for r in asof_join(assertions, times, ts_col="asserted_ts").collect()
    }
    window = {
        (r.subj, r.pred): r.obj
        for r in asof_snapshot(assertions, at, tie_break="event_id").collect()
    }
    # ties at identical timestamps are interval-degenerate (zero-width
    # interval never matches): drop the tied key from the window side too
    assert {k: v for k, v in window.items() if k != ("e2", "p")} == {
        k: v for k, v in joined.items() if k != ("e2", "p")
    }


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        ("c1", "rdf:type", "kg:Customer"),
        ("c2", "rdf:type", "kg:Customer"),
        ("c3", "rdf:type", "kg:Customer"),
        ("c1", "kg:placedOrder", "o1"),
        ("c1", "kg:placedOrder", "o2"),
        ("c2", "kg:placedOrder", "o3"),
        # c3 has no orders -> MinCount violation
        ("c1", "kg:bal", "10.5"),
        ("c2", "kg:bal", "-3.0"),  # Range violation
        ("c3", "kg:bal", "oops"),  # non-numeric -> Range violation
        ("o1", "rdf:type", "kg:Order"),
        # o2/o3 untyped -> Class violations
        ("x1", "kg:placedOrder", "o9"),  # non-target node: never reported
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_shacl_min_max_count(kg):
    shapes = [Shape("s", "kg:Customer", "kg:placedOrder", min_count=1, max_count=1)]
    rep = {(r.focus_node, r.component): r.detail for r in validate(kg, shapes).collect()}
    assert rep == {("c3", "MinCount"): "0", ("c1", "MaxCount"): "2"}


def test_shacl_range_flags_negatives_and_nonnumeric(kg):
    shapes = [Shape("s", "kg:Customer", "kg:bal", min_inclusive=0.0)]
    rep = {r.focus_node: r.detail for r in validate(kg, shapes).collect()}
    assert rep == {"c2": "-3.0", "c3": "oops"}


def test_shacl_class_constraint(kg):
    shapes = [Shape("s", "kg:Customer", "kg:placedOrder", class_constraint="kg:Order")]
    rep = sorted((r.focus_node, r.detail) for r in validate(kg, shapes).collect())
    assert rep == [("c1", "o2"), ("c2", "o3")]  # x1's dangling o9 is out of target


def test_shacl_conformant_graph_empty_report(kg):
    shapes = [Shape("s", "kg:Customer", "kg:bal", min_count=1)]
    assert validate(kg, shapes).count() == 0


def test_shacl_no_shapes(kg):
    assert validate(kg, []).count() == 0


def test_shacl_plan_has_no_python_udfs(kg):
    shapes = [
        Shape("a", "kg:Customer", "kg:placedOrder", min_count=1, max_count=2),
        Shape("b", "kg:Customer", "kg:bal", min_inclusive=0.0),
        Shape("c", "kg:Customer", "kg:placedOrder", class_constraint="kg:Order"),
    ]
    plan = validate(kg, shapes)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# scd2_merge: versioned dimension maintenance
# ---------------------------------------------------------------------------


def _ts(s):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_scd2_merge_all_three_paths(spark):
    import pytest

    from knowledgegraphs_spark.operators.temporal import scd2_merge

    dim = spark.createDataFrame(
        [
            ("u1", "view", _ts("2024-01-01T00:00:00"), None),       # will change
            ("u2", "click", _ts("2024-01-02T00:00:00"), None),      # unchanged
            ("u3", "view", _ts("2024-01-01T00:00:00"),
             _ts("2024-01-03T00:00:00")),                            # history row
            ("u3", "error", _ts("2024-01-03T00:00:00"), None),      # current after history
        ],
        "user_id string, etype string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [
            ("u1", "purchase", _ts("2024-01-10T00:00:00")),
            ("u2", "click", _ts("2024-01-11T00:00:00")),  # same attrs -> no-op
            ("u4", "signup", _ts("2024-01-12T00:00:00")),  # new key
        ],
        "user_id string, etype string, ts timestamp",
    )
    out = scd2_merge(dim, upd, "user_id", ["etype"], "ts")
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == sorted([
        ("u1", "view", _ts("2024-01-01T00:00:00"), _ts("2024-01-10T00:00:00")),
        ("u1", "purchase", _ts("2024-01-10T00:00:00"), None),
        ("u2", "click", _ts("2024-01-02T00:00:00"), None),
        ("u3", "view", _ts("2024-01-01T00:00:00"), _ts("2024-01-03T00:00:00")),
        ("u3", "error", _ts("2024-01-03T00:00:00"), None),
        ("u4", "signup", _ts("2024-01-12T00:00:00"), None),
    ])

    # duplicate update keys refuse rather than resolve silently
    dup = spark.createDataFrame(
        [("u1", "a", _ts("2024-02-01T00:00:00")), ("u1", "b", _ts("2024-02-02T00:00:00"))],
        "user_id string, etype string, ts timestamp",
    )
    with pytest.raises(ValueError, match="one row per key"):
        scd2_merge(dim, dup, "user_id", ["etype"], "ts")

    # out-of-order update (at/before current valid_from) refuses
    late = spark.createDataFrame(
        [("u1", "zzz", _ts("2023-12-31T00:00:00"))],
        "user_id string, etype string, ts timestamp",
    )
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_merge(dim, late, "user_id", ["etype"], "ts")
