"""N-Triples sink + source (sinks/ntriples.py, sources/ntriples_source.py):
exact round-trip of arbitrary store content (qnames, bare names, unknown
prefixes, escapes, typed + lang-tagged literals), correct parsing of
externally-authored NT, strict-vs-salvage modes, and the two claims the
format is here for — pure-Catalyst row path and intra-file splittability."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from knowledgegraphs_spark.sinks.ntriples import VOCAB_BASE, nt_lines, write_ntriples
from knowledgegraphs_spark.sources.ntriples_source import read_ntriples

SCHEMA = "subj string, pred string, obj string, obj_dtype string, is_literal boolean"

ROWS = [
    # qname subject/object, IRI object
    ("kg:Nation_1", "rdf:type", "kg:Nation", None, False),
    # bare engine-local predicate + plain literal
    ("kg:Nation_1", "has_name", "FRANCE", "xsd:string", True),
    # typed literal
    ("kg:Nation_1", "has_pop", "67", "xsd:integer", True),
    # lang-tagged literal (the Turtle sink cannot round-trip these)
    ("kg:Nation_1", "has_label", "Frankreich", "@de", True),
    # every decodable escape, incl. the backslash-then-n trap
    ("kg:Doc_1", "has_text", 'a\\b "q" \n\t\r c\\nd', "xsd:string", True),
    # unknown prefix and a raw absolute IRI
    ("weird:thing", "rdfs:seeAlso", "https://example.com/x?y=1", None, False),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def test_roundtrip_exact(spark, tmp_path):
    path = str(tmp_path / "out_nt")
    write_ntriples(_df(spark), path)
    back = read_ntriples(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(ROWS)


def test_lines_are_valid_absolute_nt(spark):
    lines = [r.value for r in nt_lines(_df(spark)).collect()]
    for ln in lines:
        assert ln.startswith("<http"), ln
        assert ln.endswith(" .")
    # bare name went under the vocab namespace; qname expanded to its base
    assert any(f"<{VOCAB_BASE}has_name>" in ln for ln in lines)
    assert any("<http://example.org/kg/Nation_1>" in ln for ln in lines)
    assert any('"Frankreich"@de' in ln for ln in lines)
    assert any('"67"^^<http://www.w3.org/2001/XMLSchema#integer>' in ln for ln in lines)
    # xsd:string stays untagged (canonical NT)
    assert any(ln.endswith('"FRANCE" .') for ln in lines)


def test_reads_external_nt_with_comments_and_whitespace(spark, tmp_path):
    p = tmp_path / "ext.nt"
    p.write_text(
        "# a comment\n"
        "\n"
        "  <http://a/s>   <http://a/p>   <http://a/o>  .  \n"
        '<http://a/s> <http://a/p2> "lit with \\"q\\" and \\\\n" .\n'
        '<http://a/s> <http://a/p3> "x"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
    )
    got = sorted(map(tuple, read_ntriples(spark, str(p), compact=False).collect()))
    assert got == [
        ("http://a/s", "http://a/p", "http://a/o", None, False),
        ("http://a/s", "http://a/p2", 'lit with "q" and \\n', "http://www.w3.org/2001/XMLSchema#string", True),
        ("http://a/s", "http://a/p3", "x", "http://www.w3.org/2001/XMLSchema#int", True),
    ]


@pytest.mark.parametrize(
    "bad",
    [
        '<http://a/s> <http://a/p> "u-escape \\u0041" .',  # undecodable escape
        "<http://a/s> <http://a/p> _:blank .",  # blank-node object
        "<http://a/s> <http://a/p> missing-brackets .",  # not NT at all
    ],
)
def test_strict_raises_salvage_drops(spark, tmp_path, bad):
    p = tmp_path / "bad.nt"
    p.write_text("<http://a/s> <http://a/p> <http://a/o> .\n" + bad + "\n")
    with pytest.raises(Exception, match="bad statement|ASSERT"):
        read_ntriples(spark, str(p), strict=True).collect()
    got = read_ntriples(spark, str(p), strict=False, compact=False).collect()
    assert [tuple(r) for r in got] == [("http://a/s", "http://a/p", "http://a/o", None, False)]


def test_row_path_is_pure_catalyst(spark, tmp_path):
    path = str(tmp_path / "plan_nt")
    write_ntriples(_df(spark), path)
    plan = read_ntriples(spark, path)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_single_file_splits_into_multiple_tasks(spark, tmp_path):
    # the format claim: ONE .nt file → many scan partitions when the
    # split size is forced below the file size
    p = tmp_path / "big.nt"
    with open(p, "w") as f:
        for i in range(5000):
            f.write(f'<http://a/s{i}> <http://a/p> "v{i}" .\n')
    size = os.path.getsize(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max(size // 8, 1024)))
        df = read_ntriples(spark, str(p), compact=False)
        assert df.rdd.getNumPartitions() >= 4
        assert df.count() == 5000
        # splits land mid-line; the text source must still parse every row
        assert df.agg(F.count_distinct("subj")).collect()[0][0] == 5000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
