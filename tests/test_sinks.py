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


# --- S14: GraphDB (RDF4J-protocol) sink vs a local stdlib HTTP server -------


def test_graphdb_sink_protocol_and_parallel_upload(spark, triples):
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from knowledgegraphs_spark.sinks.graphdb import create_repository, upload_triples

    received = {"puts": [], "posts": [], "deletes": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n).decode("utf-8")

        def do_PUT(self):
            with lock:
                received["puts"].append((self.path, self._body()))
            self.send_response(204)
            self.end_headers()

        def do_POST(self):
            with lock:
                received["posts"].append((self.path, self._body()))
            self.send_response(204)
            self.end_headers()

        def do_DELETE(self):
            with lock:
                received["deletes"] += 1
            self.send_response(204)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    endpoint = f"http://127.0.0.1:{srv.server_port}"
    try:
        create_repository(endpoint, "kgtest", rewrite=True)
        upload_triples(triples.repartition(3), endpoint, "kgtest")
    finally:
        srv.shutdown()

    assert received["deletes"] == 1                       # rewrite clears first
    assert received["puts"] and 'repositoryID "kgtest"' in received["puts"][0][1]
    stmt_posts = [b for p, b in received["posts"] if p.endswith("/repositories/kgtest/statements")]
    assert 1 <= len(stmt_posts) <= 3                      # one append per non-empty partition
    all_ttl = "\n".join(stmt_posts)
    assert "@prefix kg:" in all_ttl
    n_lines = sum(
        1 for body in stmt_posts for line in body.splitlines()
        if line.endswith(" .") and not line.startswith("@prefix")
    )
    assert n_lines == triples.count()
