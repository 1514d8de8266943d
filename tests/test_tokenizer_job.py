"""The tokenizer-training production job, end-to-end via spark-submit
--py-files (the build_kg submit discipline): a separate process, the zip
as the only package source, JSON summary asserted, and the written
artifacts re-read in-process to check the Sennrich invariants (ordered
merge ranks, segmentation consistent with the merge table, compression
monotonicity)."""

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


def test_train_tokenizer_job_end_to_end(spark, tmp_path):
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
            str(REPO / "jobs" / "train_tokenizer.py"),
            "--input", f"{SF}/documents.parquet",
            "--workdir", str(workdir),
            "--n-merges", "12",
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

    assert summary["n_merges_learned"] == 12
    assert summary["n_words"] > 0
    # every merge strictly reduces the subtoken stream, so the learned
    # tokenizer must compress: > 1 char per subtoken
    assert summary["chars_per_subtoken"] > 1.0
    assert summary["corpus_subtokens"] < summary["corpus_chars"]

    merges = spark.read.parquet(summary["merges"]).orderBy("rank").collect()
    assert [m["rank"] for m in merges] == list(range(12))
    assert all(m["pair_count"] > 0 for m in merges)

    vocab = spark.read.parquet(summary["vocab"]).collect()
    merged_syms = {m["lhs"] + m["rhs"] for m in merges}
    for r in vocab:
        assert "".join(r["syms"]) == r["word"]  # segmentation is a partition
        assert r["n_subtokens"] == len(r["syms"])
        # every multi-char symbol must be a product of the merge table
        for s in r["syms"]:
            assert len(s) == 1 or s in merged_syms
