"""The actual deployment path, end-to-end: zip the package, launch the
extraction job through ``spark-submit --py-files`` in a FRESH process
from a neutral cwd (so imports resolve only through --py-files), and
assert committed outputs + resume semantics."""

import json
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH")


def _submit(zip_path, out_dir, extra):
    cmd = [
        "spark-submit", "--master", "local[8]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        str(REPO / "jobs" / "extract_job.py"),
        "--output", str(out_dir),
    ] + extra
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                         cwd="/tmp")
    assert res.returncode == 0, res.stderr[-3000:]
    # the job prints ONE json line on stdout
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = tmp_path / "pdf_parser_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles.py"),
         str(zip_path)],
        check=True, capture_output=True)
    assert zip_path.exists()

    out = tmp_path / "out"
    first = _submit(zip_path, out, ["--demo-corpus", "2", "--run-id", "s1"])
    assert first["docs"] == 72 and first["txs"] > 0

    # committed atomically: one manifest covering both tables
    snaps = sorted((out / "_snapshots").glob("snapshot-*.json"))
    assert len(snaps) == 1
    manifest = json.loads(snaps[0].read_text())
    assert set(manifest["tables"]) == {"transactions", "doc_metrics"}
    assert manifest["run_id"] == "s1"

    # resume in a SECOND fresh process: nothing reprocessed, no commit
    second = _submit(zip_path, out, ["--demo-corpus", "2", "--run-id", "s2"])
    assert second["docs"] == 0 and second["txs"] == 0
    assert len(sorted((out / "_snapshots").glob("snapshot-*.json"))) == 1
