"""S9 + §1.2 + A6 + G7-JSON: repair, root detection, single-expression
hierarchical triple emission with record-scoped class counters."""

import json

import pytest
from pyspark.sql import types as T

from knowledgegraphs_spark.sources.json_source import (
    detect_root,
    emit_json_triples,
    repair_json,
)


def test_repair_json_concatenated_objects():
    fixed = repair_json('{"a": 1}\n{"a": 2}\n{"a": 3}')
    parsed = json.loads(fixed)
    assert [d["a"] for d in parsed] == [1, 2, 3]


def test_detect_root():
    single = T.StructType(
        [T.StructField("person", T.StructType([T.StructField("name", T.StringType())]))]
    )
    root, node = detect_root(single)
    assert root == "person" and node.fieldNames() == ["name"]

    multi = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("b", T.IntegerType())]
    )
    root, node = detect_root(multi)
    assert root == "record" and node is multi


PERSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "person",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("age", T.IntegerType()),
                    T.StructField("languages", T.ArrayType(T.StringType())),
                    T.StructField(
                        "address",
                        T.StructType(
                            [
                                T.StructField("street", T.StringType()),
                                T.StructField("city", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "friends",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("name", T.StringType()),
                                    T.StructField(
                                        "pets",
                                        T.ArrayType(
                                            T.StructType([T.StructField("pname", T.StringType())])
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)

DOC = {
    "person": {
        "name": "John Doe",
        "age": 30,
        "languages": ["English", "Spanish"],
        "address": {"street": "123 Main St", "city": "New York"},
        "friends": [
            {"name": "Jane", "pets": [{"pname": "Rex"}, {"pname": "Tom"}]},
            {"name": "Bob", "pets": [{"pname": "Ace"}]},
        ],
    }
}


@pytest.fixture(scope="module")
def person_triples(spark):
    df = spark.createDataFrame([(0, json.dumps(DOC))], ["rid", "j"])
    out = emit_json_triples(df, "rid", "j", PERSON_SCHEMA)
    return {(r.subj, r.pred, r.obj) for r in out.collect()}


def test_json2owl_example_triples(person_triples):
    """The worked example from JSON2OWL.java:14-68."""
    t = person_triples
    assert ("person0", "rdf:type", "kg:person") in t
    assert ("person0", "has_name", "John Doe") in t
    assert ("person0", "has_age", "30") in t
    # repeated data property per array-of-scalars element
    assert ("person0", "has_languages", "English") in t
    assert ("person0", "has_languages", "Spanish") in t
    # nested dict → object property + child class
    assert ("person0", "has_address", "person0_address0") in t
    assert ("person0_address0", "rdf:type", "kg:address") in t
    assert ("person0_address0", "has_street", "123 Main St") in t
    # array of dicts → one individual per element, record-scoped counters
    assert ("person0", "has_friends", "person0_friends0") in t
    assert ("person0", "has_friends", "person0_friends1") in t
    assert ("person0_friends0", "has_name", "Jane") in t
    assert ("person0_friends1", "has_name", "Bob") in t


def test_record_scoped_cumulative_counters(person_triples):
    """A6: nested-nested counters accumulate across parents within the
    record (InsertDataJSON.java:225-233 — pets of friend1 continue after
    pets of friend0)."""
    t = person_triples
    assert ("person0_friends0", "has_pets", "person0_friends0_pets0") in t
    assert ("person0_friends0", "has_pets", "person0_friends0_pets1") in t
    # Ace is the THIRD pet in the record → counter 2, not 0
    assert ("person0_friends1", "has_pets", "person0_friends1_pets2") in t
    assert ("person0_friends1_pets2", "has_pname", "Ace") in t


def test_sentinel_leaves_dropped(spark):
    doc = {"person": {"name": "none", "age": 1, "languages": ["-", "ok"],
                      "address": None, "friends": []}}
    df = spark.createDataFrame([(5, json.dumps(doc))], ["rid", "j"])
    t = {(r.subj, r.pred, r.obj) for r in emit_json_triples(df, "rid", "j", PERSON_SCHEMA).collect()}
    assert ("person5", "has_name", "none") not in t
    assert ("person5", "has_languages", "ok") in t
    assert ("person5", "has_languages", "-") not in t
    # null nested dict → no individual, no edge
    assert not any(p == "has_address" for _, p, _ in t)


def test_no_shuffle_in_plan(spark):
    """The whole emission must stay exchange-free (single projection)."""
    df = spark.createDataFrame([(0, json.dumps(DOC))], ["rid", "j"])
    plan = emit_json_triples(df, "rid", "j", PERSON_SCHEMA)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
