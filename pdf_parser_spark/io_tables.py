"""Table layer: snapshot-committed append tables.

On a real cluster this is Iceberg (``df.writeTo(tbl).append()`` with
snapshot isolation and ``snapshot-property run_id`` lineage —
SURVEY.md §4).  This sandbox has no Iceberg jars (verified), so the
same interface is backed by parquet plus an explicit JSON snapshot
manifest per commit: readers only trust data reachable from a
manifest, which emulates Iceberg's commit point (a crashed writer
leaves parquet part-files but no manifest → invisible to readers →
kill-and-rerun is safe).

Switch ``fmt="iceberg"`` on a cluster: append/read delegate to the
catalog and the manifest bookkeeping disappears.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, root: str, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(fmt)
        self.root = root
        self.fmt = fmt

    # ---------------- paths / manifests (parquet emulation)
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snap_dir(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "_snapshots")

    def _manifests(self, table: str) -> List[str]:
        d = self._snap_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.startswith("snapshot-") and f.endswith(".json")
        )

    def committed_files(self, table: str) -> List[str]:
        files: List[str] = []
        for m in self._manifests(table):
            with open(m) as fh:
                files.extend(json.load(fh)["files"])
        return files

    # ---------------- API
    def append(self, df: DataFrame, table: str,
               run_id: Optional[str] = None) -> dict:
        """Write a new commit; the snapshot manifest IS the commit."""
        if self.fmt == "iceberg":
            df.writeTo(table).append()
            return {"table": table, "run_id": run_id}
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self._table_dir(table),
                                "commit-%s" % commit_id)
        df.write.mode("error").parquet(data_dir)
        files = [
            os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        ]
        snap_dir = self._snap_dir(table)
        os.makedirs(snap_dir, exist_ok=True)
        seq = len(self._manifests(table))
        manifest = {
            "table": table, "sequence": seq, "commit_id": commit_id,
            "run_id": run_id, "files": files,
        }
        tmp = os.path.join(snap_dir, ".tmp-%s.json" % commit_id)
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(
            snap_dir, "snapshot-%05d.json" % seq))  # atomic commit point
        return manifest

    def read(self, spark: SparkSession, table: str) -> Optional[DataFrame]:
        """Committed rows only (None if no snapshot exists)."""
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(table)
        files = self.committed_files(table)
        if not files:
            return None
        return spark.read.parquet(*files)

    def committed_keys(self, spark: SparkSession, table: str,
                       key: str = "url") -> Optional[DataFrame]:
        df = self.read(spark, table)
        return None if df is None else df.select(key).distinct()

    def snapshots(self, table: str) -> List[dict]:
        out = []
        for m in self._manifests(table):
            with open(m) as fh:
                out.append(json.load(fh))
        return out
