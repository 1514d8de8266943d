"""J2 + J3: candidate keys, containment, FK inference
(TabularSpecificRules.java:57-144 semantics)."""

import pytest

from knowledgegraphs_spark.operators.schema_inference import (
    ForeignKey,
    candidate_keys,
    contains_all,
    infer_foreign_keys,
)


@pytest.fixture(scope="module")
def tables(spark):
    region = spark.createDataFrame([(0, "r0"), (1, "r1")], ["regionkey", "rname"])
    nation = spark.createDataFrame(
        [(0, "a", 0), (1, "b", 1), (2, "c", 0)], ["nationkey", "nname", "regionkey"]
    )
    customer = spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2), (13, 0)], ["custkey", "nationkey"]
    )
    return {"region": region, "nation": nation, "customer": customer}


def test_candidate_keys(spark, tables):
    assert candidate_keys(tables["nation"]) == {"nationkey", "nname"}
    # non-unique column is not a key
    assert "regionkey" not in candidate_keys(tables["nation"])


def test_candidate_keys_null_counts_once(spark):
    # Tablesaw unique().asSet() counts null as one value
    df = spark.createDataFrame([(1,), (None,), (2,)], "a: int")
    assert candidate_keys(df) == {"a"}
    df2 = spark.createDataFrame([(1,), (None,), (None,)], "a: int")
    assert candidate_keys(df2) == set()


def test_contains_all(spark, tables):
    assert contains_all(tables["customer"], "nationkey", tables["nation"], "nationkey")
    assert not contains_all(tables["customer"], "custkey", tables["nation"], "nationkey")


def test_infer_foreign_keys(tables):
    fks = set(infer_foreign_keys(tables))
    assert ForeignKey("nation", "regionkey", "region", "regionkey") in fks
    assert ForeignKey("customer", "nationkey", "nation", "nationkey") in fks
    # no FK invented toward non-candidate-key columns
    assert not any(fk.ref_table == "customer" for fk in fks)


def test_last_table_wins_pick(spark):
    # two tables both expose a unique column named "k"; the later table in
    # dict order is the referenced one (reference HashMap.put overwrite)
    a = spark.createDataFrame([(1,), (2,)], "k: int")
    b = spark.createDataFrame([(1,), (2,), (3,)], "k: int")
    c = spark.createDataFrame([(1,), (1,), (2,)], "k: int")
    fks = infer_foreign_keys({"a": a, "b": b, "c": c})
    # pick for k = b (last candidate-key table); a.k ⊆ b.k and c.k ⊆ b.k
    assert set(fks) == {
        ForeignKey("a", "k", "b", "k"),
        ForeignKey("c", "k", "b", "k"),
    }


def test_single_table_no_fks(spark, tables):
    assert infer_foreign_keys({"nation": tables["nation"]}) == []
