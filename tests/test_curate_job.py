"""The corpus-curation production job, end-to-end via spark-submit
--py-files (the build_kg submit discipline): a separate process, the
zip as the only package source, JSON summary asserted, and the written
corpus re-read in-process to check the no-straddling invariant the
cluster-keyed split guarantees."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
SF = "/root/testdata/sf0.001"


def test_curate_corpus_job_end_to_end(spark, tmp_path):
    zpath = tmp_path / "kg_spark.zip"
    pkg = REPO / "knowledgegraphs_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))

    workdir = tmp_path / "out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zpath),
            str(REPO / "jobs" / "curate_corpus.py"),
            "--input", f"{SF}/documents.parquet",
            "--workdir", str(workdir),
            "--val-frac", "0.3",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    summary = json.loads(lines[-1])

    assert summary["n_input"] > 0
    assert summary["n_kept"] <= summary["n_input"]
    sizes = summary["split_sizes"]
    assert set(sizes) <= {"train", "val"} and sum(sizes.values()) == summary["n_kept"]

    out = spark.read.parquet(summary["curated"])
    rows = out.select("doc_id", "cluster_id", "split").collect()
    assert len(rows) == summary["n_kept"]
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())  # no straddling
