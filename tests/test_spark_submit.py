"""Launch-mode evidence for the north rule: the construct job runs
end-to-end under the REAL `spark-submit --py-files` binary (its own
JVM, not the test session), materializes a checkpointed triple table,
and a second identical invocation resumes to the identical result."""

from __future__ import annotations

import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(SUBMIT is None,
                                reason="spark-submit not on PATH")


def _zip_package(tmp: Path) -> Path:
    pkg = REPO / "cspirit_ontology_information_extraction_opus4plan_spark"
    zpath = tmp / "cspirit_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in pkg.rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    return zpath

def _run(out: Path, zpath: Path) -> None:
    cmd = [SUBMIT, "--master", "local[4]",
           "--py-files", str(zpath),
           "--conf", "spark.sql.shuffle.partitions=4",
           "--conf", "spark.ui.enabled=false",
           str(REPO / "jobs" / "kg_construct_job.py"),
           "--sf-dir", "/root/testdata/sf0.001",
           "--out", str(out), "--parts", "2"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]

def test_spark_submit_job_end_to_end_and_resume(spark, tmp_path):
    zpath = _zip_package(tmp_path)
    out = tmp_path / "triples"
    _run(out, zpath)
    first = (spark.read.parquet(str(out))
             .orderBy("triple_id", "doc_id").toPandas())
    assert len(first) > 0
    # one lineage+metrics marker per completed partition
    markers = sorted((out / "_checkpoints").glob("part_*.json"))
    assert len(markers) == 2, markers
    import json
    m = json.loads(markers[0].read_text())
    assert m["metrics"]["n_rows"] >= 0 and "lineage" in m
    # second run resumes idempotently to the identical table
    _run(out, zpath)
    second = (spark.read.parquet(str(out))
              .orderBy("triple_id", "doc_id").toPandas())
    assert first.equals(second)
