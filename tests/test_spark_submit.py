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


def test_shard_export_job_matches_oracle(tmp_path):
    """The deployment form of epoch_shard_plan: submit the shard
    export through --py-files, then verify the WRITTEN parquet
    dataset row-for-row against the DuckDB oracle."""
    import duckdb

    zip_path = tmp_path / "pdf_parser_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "make_pyfiles.py"),
         str(zip_path)],
        check=True, capture_output=True)
    out = tmp_path / "shards"
    cmd = [
        "spark-submit", "--master", "local[8]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", str(zip_path),
        str(REPO / "jobs" / "shard_export_job.py"),
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", str(out),
    ]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                         cwd="/tmp")
    assert res.returncode == 0, res.stderr[-3000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["docs"] == 500 and stats["shards"] == 16

    # partitioned layout on disk: one directory per shard
    shard_dirs = sorted(p.name for p in out.glob("shard=*"))
    assert len(shard_dirs) == 16

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "se", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'")
    want = sorted(con.sql(
        mod.all_oracles()["epoch_shard_plan"]).fetchall())
    got = sorted(con.sql(
        "SELECT doc_id, shard, pos, n_tokens, token_offset FROM "
        "read_parquet('%s/shard=*/*.parquet', hive_partitioning=true)"
        % out).fetchall())
    assert got == want
