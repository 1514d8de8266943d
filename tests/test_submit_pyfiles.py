"""The production submit path, end-to-end: ``spark-submit --py-files``.

The north rule ships the job via ``spark-submit --py-files`` — this test
proves it for real, not by grep: the package is zipped, a SEPARATE
spark-submit process runs ``jobs/build_kg.py`` from a neutral working
directory (the repo is NOT on the driver's import path — the zip is the
only place ``knowledgegraphs_spark`` can come from), and the triples it
writes are compared value-for-value against the in-process build on the
same input. A second submit against the same workdir must resume from
the checkpoint manifest (all stages skipped) — crash/resubmit recovery
through a genuinely separate process, not a same-session re-call.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(tmp: Path) -> Path:
    zpath = tmp / "kg_spark.zip"
    pkg = REPO / "knowledgegraphs_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    return zpath


def _submit(tmp: Path, zpath: Path, *job_args: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zpath),
            str(REPO / "jobs" / "build_kg.py"),
            *job_args,
        ],
        cwd=tmp,  # neutral cwd: '' on sys.path must not resolve the repo
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary in stdout:\n{proc.stdout[-2000:]}"
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def turns_input(spark, tmp_path_factory):
    from knowledgegraphs_spark.sources.transcripts import synthesize_transcripts

    tmp = tmp_path_factory.mktemp("submit")
    path = tmp / "turns.parquet"
    synthesize_transcripts(spark, n_conversations=120, seed=11).write.parquet(str(path))
    return tmp, str(path)


def test_submit_pyfiles_full_build_matches_inprocess(spark, turns_input):
    from knowledgegraphs_spark.plans.pipeline import build_kg_triples

    tmp, input_path = turns_input
    zpath = _zip_package(tmp)
    workdir = tmp / "kg_out"

    summary = _submit(
        tmp, zpath,
        "--input", input_path, "--workdir", str(workdir), "--mode", "full",
    )
    assert summary["stages_ran"], summary
    assert not summary["stages_skipped"], summary

    expected = build_kg_triples(spark, spark.read.parquet(input_path))
    exp_rows = sorted(
        (r.subj, r.pred, r.obj) for r in expected.select("subj", "pred", "obj").collect()
    )
    got = spark.read.parquet(str(workdir / "triples"))
    got_rows = sorted(
        (r.subj, r.pred, r.obj) for r in got.select("subj", "pred", "obj").collect()
    )
    assert summary["triples"] == len(exp_rows)
    assert got_rows == exp_rows

    # resubmit against the same workdir: every stage must resume from the
    # manifest — a separate-process proof of crash/resubmit recovery
    summary2 = _submit(
        tmp, zpath,
        "--input", input_path, "--workdir", str(workdir), "--mode", "full",
    )
    assert not summary2["stages_ran"], summary2
    assert set(summary2["stages_skipped"]) >= {"turns", "mentions", "canonical", "triples"}
    assert summary2["triples"] == summary["triples"]


@pytest.fixture(scope="module")
def structural_store(turns_input):
    """A bucketed store built by the submit path itself (shared by the
    structural-mode assertion and the query-job test)."""
    tmp, input_path = turns_input
    zpath = _zip_package(tmp)
    workdir = tmp / "kg_structural"
    summary = _submit(
        tmp, zpath,
        "--input", input_path, "--workdir", str(workdir),
        "--mode", "structural", "--store-buckets", "4",
    )
    return tmp, zpath, summary


def test_submit_pyfiles_structural_store(spark, structural_store):
    from knowledgegraphs_spark.operators.triples import read_triples

    _tmp, _zpath, summary = structural_store
    store = read_triples(spark, summary["store"])
    assert store.count() == summary["triples"] > 0
    # the store keeps its bucket metadata → point lookups stay prunable
    assert getattr(store, "_kg_subj_buckets", None) == 4


def _submit_query(tmp: Path, zpath: Path, *job_args: str) -> tuple[dict, list[str]]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zpath),
            str(REPO / "jobs" / "query_kg.py"),
            *job_args,
        ],
        cwd=tmp, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON in stdout:\n{proc.stdout[-2000:]}"
    return json.loads(lines[-1]), lines[:-1]


def test_submit_query_job_select_to_parquet(spark, structural_store):
    """The query job answers SPARQL against the submitted store, writing
    bindings to parquet; values match the in-process compiler on the
    same store (what's under test is the submit plumbing: zip import,
    bucket-metadata sidecar, output path, summary line)."""
    from knowledgegraphs_spark.operators.sparql import sparql_query
    from knowledgegraphs_spark.operators.triples import read_triples

    tmp, zpath, summary = structural_store
    # the store reifies attributes (has_role → attr node → has_role_VALUE),
    # so the role filter is a path sequence — through the submit surface
    query = "SELECT ?t WHERE { ?t rdf:type kg:Turn ; has_role/has_role_VALUE 'user' . }"
    out = tmp / "bindings.parquet"

    qsum, _printed = _submit_query(
        tmp, zpath,
        "--store", summary["store"], "--query", query, "--output", str(out),
    )
    got = sorted(r.t for r in spark.read.parquet(str(out)).collect())
    expected = sorted(
        r.t for r in sparql_query(read_triples(spark, summary["store"]), query).collect()
    )
    assert qsum["rows"] == len(expected) > 0
    assert got == expected


def _submit_job(tmp: Path, zpath: Path, job: str, *job_args: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zpath),
            str(REPO / "jobs" / job),
            *job_args,
        ],
        cwd=tmp, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary in stdout:\n{proc.stdout[-2000:]}"
    return json.loads(lines[-1])


def test_submit_update_job_maintains_across_processes(spark, tmp_path):
    """The scheduled-maintenance deployment: files land, a fresh
    spark-submit process drains them, a LATER process picks up only the
    new arrivals from the shared checkpoint (exactly-once across process
    boundaries, not just across same-session restarts), ``--compact``
    folds the committed deltas, and the final store equals an in-process
    twin maintained on the same arrival order."""
    import datetime

    from knowledgegraphs_spark.streaming.maintenance import (
        read_maintained_triples,
        stream_kg_maintenance,
    )

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ts = datetime.datetime(2026, 1, 5, 12, 0, 0)

    def turns(rows):
        return spark.createDataFrame(
            [(c, i, "user", t, None, ts) for (c, i, t) in rows], schema
        )

    b1 = [("c1", 0, "we met Acme Corp about the plan"),
          ("c2", 0, "talked to Widget Works yesterday")]
    b2 = [("c3", 0, "call with Acme Corp again"),
          ("c1", 1, "closing note on Widget Works")]

    zpath = _zip_package(tmp_path)
    landing = tmp_path / "landing"
    landing.mkdir()
    store, ckpt = tmp_path / "store", tmp_path / "ckpt"

    turns(b1).coalesce(1).write.parquet(str(landing / "arrival=1"))
    s1 = _submit_job(
        tmp_path, zpath, "update_kg.py",
        "--input", str(landing), "--store", str(store), "--checkpoint", str(ckpt),
    )
    assert s1["triples"] > 0 and s1["entities"] > 0

    turns(b2).coalesce(1).write.parquet(str(landing / "arrival=2"))
    s2 = _submit_job(
        tmp_path, zpath, "update_kg.py",
        "--input", str(landing), "--store", str(store), "--checkpoint", str(ckpt),
        "--compact",
    )
    assert s2["triples"] > s1["triples"]
    assert s2["folded_batches"], s2  # the drain's deltas were folded

    # twin maintained in-process on the same arrivals
    twin_in, twin_store, twin_ckpt = tmp_path / "t_in", tmp_path / "t_store", tmp_path / "t_ckpt"
    twin_in.mkdir()
    turns(b1).coalesce(1).write.parquet(str(twin_in / "arrival=1"))
    stream_kg_maintenance(spark, str(twin_in), str(twin_store), str(twin_ckpt)).awaitTermination(180)
    turns(b2).coalesce(1).write.parquet(str(twin_in / "arrival=2"))
    stream_kg_maintenance(spark, str(twin_in), str(twin_store), str(twin_ckpt)).awaitTermination(180)

    def trips(path):
        return {
            (r.subj, r.pred, r.obj)
            for r in read_maintained_triples(spark, str(path)).collect()
        }

    assert trips(store) == trips(twin_store)


def test_submit_query_job_ask_prints(structural_store):
    tmp, zpath, summary = structural_store
    qsum, printed = _submit_query(
        tmp, zpath,
        "--store", summary["store"],
        "--query", "ASK { ?t rdf:type kg:Turn }",
    )
    assert qsum["rows"] == 1
    assert json.loads(printed[-1]) == {"ask": True}


def test_submit_query_job_update(spark, turns_input, tmp_path):
    """The query job detects a SPARQL Update, applies it to the store in
    place from a separate spark-submit process, and reports the
    operation's lineage counters; the mutated store is then verified
    in-process. Uses its own store — the shared structural_store must
    stay immutable for the other query tests."""
    from knowledgegraphs_spark.operators.triples import read_triples, write_triples

    tmp, _ = turns_input
    zpath = _zip_package(tmp)
    rows = [
        ("kg:A", "kg:status", "old"),
        ("kg:B", "kg:status", "old"),
        ("kg:C", "kg:other", "x"),
    ]
    store = str(tmp_path / "upd_store")
    write_triples(
        spark.createDataFrame(rows, "subj string, pred string, obj string"),
        store, n_buckets=4,
    )
    qsum, _printed = _submit_query(
        tmp, zpath,
        "--store", store,
        "--query",
        'DELETE { ?s kg:status "old" } INSERT { ?s kg:status "migrated" } '
        'WHERE { ?s kg:status "old" . }',
    )
    assert qsum["form"] == "update"
    assert qsum["deleted"] == 2 and qsum["inserted"] == 2
    got = sorted(
        tuple(r)
        for r in read_triples(spark, store).select("subj", "pred", "obj").collect()
    )
    assert got == [
        ("kg:A", "kg:status", "migrated"),
        ("kg:B", "kg:status", "migrated"),
        ("kg:C", "kg:other", "x"),
    ]


def test_submit_query_job_entail(spark, turns_input, tmp_path):
    """``--entail owl-rl`` closes a store under the OWL 2 RL rules from a
    separate spark-submit process (the scheduler's post-build step), and
    a second submit proves idempotence through a genuinely new JVM."""
    from knowledgegraphs_spark.operators.triples import read_triples, write_triples

    tmp, _ = turns_input
    zpath = _zip_package(tmp)
    rows = [
        ("kg:peerOf", "rdf:type", "owl:SymmetricProperty"),
        ("kg:Vendor", "rdfs:subClassOf", "kg:Party"),
        ("kg:acme", "rdf:type", "kg:Vendor"),
        ("kg:acme", "kg:peerOf", "kg:bolt_co"),
    ]
    store = str(tmp_path / "entail_store")
    write_triples(
        spark.createDataFrame(rows, "subj string, pred string, obj string"),
        store, n_buckets=4,
    )
    qsum, _printed = _submit_query(
        tmp, zpath, "--store", store, "--entail", "owl-rl",
    )
    assert qsum["form"] == "entail" and qsum["ruleset"] == "owl-rl"
    # exactly two NEW triples: prp-symp reverse + cax-sco type lift (the
    # scm-sco closure edge Vendor⊑Party is already asserted → set semantics)
    assert qsum["inserted"] == 2 and qsum["buckets_rewritten"] == []
    got = {
        tuple(r)
        for r in read_triples(spark, store).select("subj", "pred", "obj").collect()
    }
    assert ("kg:bolt_co", "kg:peerOf", "kg:acme") in got
    assert ("kg:acme", "rdf:type", "kg:Party") in got
    assert len(got) == len(rows) + 2

    qsum2, _ = _submit_query(tmp, zpath, "--store", store, "--entail", "owl-rl")
    assert qsum2["inserted"] == 0
