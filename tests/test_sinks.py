"""S12/S13 Turtle sink + S16 mappings-file IR."""

import os

import pytest

from knowledgegraphs_spark.sinks.mappings_file import (
    ColumnMappings,
    ElementMapping,
    MappingsFile,
    TableMappings,
)
from knowledgegraphs_spark.sinks.turtle import turtle_string, ttl_lines, write_turtle


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        [
            ("kg:Turn_2_c1_0", "rdf:type", "kg:Turn", None, False),
            ("kg:Turn_2_c1_0", "has_text_VALUE", 'he said "hi"\nthen left', "xsd:string", True),
            ("kg:Turn_2_c1_0", "has_n_VALUE", "42", "xsd:integer", True),
        ],
        "subj: string, pred: string, obj: string, obj_dtype: string, is_literal: boolean",
    )


def test_ttl_lines(spark, triples):
    lines = {r.value for r in ttl_lines(triples).collect()}
    assert "kg:Turn_2_c1_0 rdf:type kg:Turn ." in lines
    # escaped quote + newline, typed literal
    assert 'kg:Turn_2_c1_0 has_text_VALUE "he said \\"hi\\"\\nthen left" .' in lines
    assert 'kg:Turn_2_c1_0 has_n_VALUE "42"^^xsd:integer .' in lines


def test_turtle_string_deterministic(spark, triples):
    s1 = turtle_string(triples)
    s2 = turtle_string(triples.repartition(3))
    assert s1 == s2
    assert s1.startswith("@prefix kg:")


def test_write_turtle(spark, triples, tmp_path):
    out = str(tmp_path / "g.ttl")
    write_turtle(triples, out)
    assert os.path.exists(os.path.join(out, "_prefixes.ttl"))
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_mappings_file_roundtrip(tmp_path):
    mf = MappingsFile(
        tables=[
            TableMappings(
                table="turns",
                mapping=ElementMapping(type="Class", ontoEl="kg:Turn"),
                columns=[
                    ColumnMappings(
                        column="role",
                        mappings=[
                            ElementMapping(type="Class", ontoEl="kg:role_ATTR"),
                            ElementMapping(type="ObjectProperty", ontoEl="kg:has_role"),
                            ElementMapping(
                                type="DataProperty",
                                ontoEl="kg:has_role_VALUE",
                                match=["do:Role"],
                            ),
                        ],
                    ),
                    ColumnMappings(column="text"),
                ],
            )
        ]
    )
    path = str(tmp_path / "mappings.json")
    mf.save(path)
    back = MappingsFile.load(path)
    t = back.table("turns")
    assert t is not None and t.mapping.ontoEl == "kg:Turn"
    # fixed 3-slot order per column: classMap, objMap, dataMap
    role = t.columns[0]
    assert role.class_map.ontoEl == "kg:role_ATTR"
    assert role.obj_map.ontoEl == "kg:has_role"
    assert role.data_map.match == ["do:Role"]
    # auto-padded empty slots
    assert len(t.columns[1].mappings) == 3
    # deterministic bytes
    assert mf.to_json() == back.to_json()


def test_set_as_initial_match():
    m = ElementMapping(type="ObjectProperty", ontoEl="kg:p", match=["do:x"])
    m.set_as_initial_match()
    assert m.match == [] and m.initialMatch == ["do:x"]
