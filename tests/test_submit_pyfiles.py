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


def test_submit_pyfiles_structural_store(spark, turns_input):
    from knowledgegraphs_spark.operators.triples import read_triples

    tmp, input_path = turns_input
    zpath = _zip_package(tmp)
    workdir = tmp / "kg_structural"

    summary = _submit(
        tmp, zpath,
        "--input", input_path, "--workdir", str(workdir),
        "--mode", "structural", "--store-buckets", "4",
    )
    store = read_triples(spark, summary["store"])
    assert store.count() == summary["triples"] > 0
    # the store keeps its bucket metadata → point lookups stay prunable
    assert getattr(store, "_kg_subj_buckets", None) == 4
