"""Table layer: snapshot-committed append tables with CROSS-TABLE
atomic commits.

On a real cluster this is Iceberg (``df.writeTo(tbl).append()`` with
snapshot isolation and ``snapshot-property run_id`` lineage —
SURVEY.md §4).  This sandbox has no Iceberg jars (verified), so the
same interface is backed by parquet plus an explicit JSON snapshot
manifest per commit: readers only trust data reachable from a
manifest, which emulates Iceberg's commit point (a crashed writer
leaves parquet part-files but no manifest → invisible to readers →
kill-and-rerun is safe).

Atomicity across tables: one extraction run appends BOTH
``transactions`` and ``doc_metrics``.  If those were two independent
commits, a crash between them would leave committed transactions whose
urls the resume anti-join (keyed on doc_metrics) would reprocess —
duplicating transaction rows.  ``append_many`` therefore writes every
table's parquet first and then publishes ONE manifest covering all of
them; the single ``os.rename`` is the commit point, so either all
tables of a run become visible or none do.

Iceberg path: per-table appends are stamped with the same ``run_id``
snapshot property; a catalog-level multi-table transaction (or a
resume-time cherry-pick of tx snapshots lacking a doc_metrics
counterpart) provides the same guarantee on a cluster.  The sequential
appends here are the plan-shape placeholder, unit-tested with stub
writers (no jars in the sandbox).

Format selection is config-driven: ``TableIO.from_conf(spark, root)``
reads ``spark.pdf_parser.table_format`` (default ``parquet``), so
cluster deployment is a one-line spark-submit ``--conf`` switch.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

FORMAT_CONF = "spark.pdf_parser.table_format"

# Iceberg DDL for the three tables at 10^12-document scale.  Design:
# * pages/transactions bucket on url (1024 buckets) — co-locates the
#   resume anti-join and any url-keyed validation join WITHOUT a
#   shuffle (storage-partitioned join), and bounds per-file row counts
#   under heavy skew;
# * doc_metrics is small per row and read by rollups — bucket coarser;
# * snapshot-property run_id rides every commit (append path below).
ICEBERG_DDL = {
    "pages": (
        "CREATE TABLE IF NOT EXISTS {t} (url STRING, warc_ts TIMESTAMP,"
        " html BINARY, text STRING, lang STRING) USING iceberg"
        " PARTITIONED BY (bucket(1024, url))"
    ),
    "transactions": (
        "CREATE TABLE IF NOT EXISTS {t} (url STRING, tx_index INT,"
        " bank STRING, date STRING, description STRING, amount DOUBLE,"
        " direction STRING) USING iceberg"
        " PARTITIONED BY (bucket(1024, url))"
    ),
    "doc_metrics": (
        "CREATE TABLE IF NOT EXISTS {t} (url STRING, bank STRING,"
        " kind STRING, pages INT, n_lines INT, n_chars BIGINT,"
        " blocks_total INT, blocks_kept INT, tx_count INT,"
        " text_sha256 STRING, error STRING, part_id INT) USING iceberg"
        " PARTITIONED BY (bucket(64, url))"
    ),
}


def create_iceberg_tables(spark: SparkSession, catalog_ns: str) -> None:
    """Issue the DDL above under ``catalog.namespace`` (cluster-only;
    the sandbox has no Iceberg jars — the DDL strings are unit-tested
    for shape)."""
    for name, ddl in ICEBERG_DDL.items():
        spark.sql(ddl.format(t="%s.%s" % (catalog_ns, name)))


class TableIO:
    def __init__(self, root: str, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(fmt)
        self.root = root
        self.fmt = fmt

    @classmethod
    def from_conf(cls, spark: SparkSession, root: str) -> "TableIO":
        """Format chosen by ``spark.pdf_parser.table_format`` conf."""
        return cls(root, fmt=spark.conf.get(FORMAT_CONF, "parquet"))

    # ---------------- paths / manifests (parquet emulation)
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snap_dir(self) -> str:
        # ONE shared snapshot log for the whole table root: a manifest
        # may commit several tables at once (the atomicity unit)
        return os.path.join(self.root, "_snapshots")

    def _manifests(self) -> List[str]:
        d = self._snap_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.startswith("snapshot-") and f.endswith(".json")
        )

    def committed_files(self, table: str,
                        as_of: Optional[int] = None) -> List[str]:
        """Files visible for ``table``; ``as_of`` = time travel to a
        snapshot sequence (inclusive).  A ``rewrite`` commit REPLACES
        the table's file list (Iceberg's rewrite_data_files shape, used
        by compaction); an ``append`` adds to it."""
        files: List[str] = []
        for m in self._manifests():
            with open(m) as fh:
                snap = json.load(fh)
            if as_of is not None and snap["sequence"] > as_of:
                break
            if table not in snap["tables"]:
                continue
            if snap.get("op") == "rewrite":
                files = list(snap["tables"][table])
            else:
                files.extend(snap["tables"][table])
        return files

    # ---------------- API
    def append_many(self, dfs: Dict[str, DataFrame],
                    run_id: Optional[str] = None,
                    op: str = "append") -> dict:
        """Write several tables as ONE commit; the single snapshot
        manifest rename IS the commit point for all of them."""
        if self.fmt == "iceberg":
            for table, df in dfs.items():
                (df.writeTo(table)
                   .option("snapshot-property.run_id", run_id or "")
                   .append())
            return {"tables": {t: [] for t in dfs}, "run_id": run_id}
        commit_id = uuid.uuid4().hex[:12]
        table_files: Dict[str, List[str]] = {}
        for table, df in dfs.items():
            data_dir = os.path.join(self._table_dir(table),
                                    "commit-%s" % commit_id)
            df.write.mode("error").parquet(data_dir)
            table_files[table] = [
                os.path.join(data_dir, f) for f in os.listdir(data_dir)
                if f.endswith(".parquet")
            ]
        snap_dir = self._snap_dir()
        os.makedirs(snap_dir, exist_ok=True)
        seq = len(self._manifests())
        manifest = {
            "sequence": seq, "commit_id": commit_id, "run_id": run_id,
            "op": op, "tables": table_files,
        }
        tmp = os.path.join(snap_dir, ".tmp-%s.json" % commit_id)
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(
            snap_dir, "snapshot-%05d.json" % seq))  # atomic commit point
        return manifest

    def compact(self, spark: SparkSession, table: str,
                target_partitions: int = 1,
                run_id: Optional[str] = None) -> Optional[dict]:
        """Small-file compaction (Iceberg's rewrite_data_files): every
        incremental commit leaves its own parquet dir, and at
        micro-batch cadence a table accumulates thousands of small
        files — a first-order 10^12-scale problem.  Reads the current
        committed state, rewrites it as ``target_partitions`` files,
        and publishes ONE ``rewrite`` manifest; readers atomically
        switch, old files stay on disk for time travel (``as_of``
        before the rewrite still resolves the pre-compaction state).
        Safe against concurrent kill: no manifest → nothing changed."""
        df = self.read(spark, table)
        if df is None:
            return None
        return self.append_many(
            {table: df.coalesce(target_partitions)},
            run_id=run_id, op="rewrite")

    def append(self, df: DataFrame, table: str,
               run_id: Optional[str] = None) -> dict:
        return self.append_many({table: df}, run_id=run_id)

    def read(self, spark: SparkSession, table: str,
             as_of: Optional[int] = None) -> Optional[DataFrame]:
        """Committed rows only (None if no snapshot exists);
        ``as_of`` time-travels to a snapshot sequence."""
        if self.fmt == "iceberg":
            return spark.read.format("iceberg").load(table)
        files = self.committed_files(table, as_of=as_of)
        if not files:
            return None
        return spark.read.parquet(*files)

    def committed_keys(self, spark: SparkSession, table: str,
                       key: str = "url") -> Optional[DataFrame]:
        df = self.read(spark, table)
        return None if df is None else df.select(key).distinct()

    def snapshots(self, table: Optional[str] = None) -> List[dict]:
        """Commit log; with ``table``, only commits touching it."""
        out = []
        for m in self._manifests():
            with open(m) as fh:
                snap = json.load(fh)
            if table is None or table in snap["tables"]:
                out.append(snap)
        return out
