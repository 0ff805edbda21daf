"""Snapshot-capable table catalog.

The north_rule requires Iceberg tables with snapshot checkpoints and
resume.  This sandbox has no Iceberg jars (verified — SURVEY.md env
facts), so the catalog is an interface with two implementations:

- ``ParquetSnapshotCatalog`` — parquet files + a JSON manifest per
  table (``manifest.json`` holding current snapshot id + history).
  Every write is a new immutable snapshot directory; "commit" is an
  atomic manifest rename.  This gives the same contract Iceberg does
  at the granularity the pipeline needs: atomic overwrite, time-travel
  by snapshot id, rollback, and stage-level resume.
- ``IcebergCatalog`` — the same interface over ``writeTo(...)`` /
  ``spark.read.table(...)``; selected automatically when a Spark
  Iceberg catalog is configured (``spark.sql.catalog.<name>`` conf),
  raising a clear error otherwise.

Replaces the reference's Postgres DDL init + FK-ordered reset
(/root/reference/entity_resolution_engine/db/connections.py:21-29,
ues_writer/writer.py:25-37): with snapshots, "reset" is just a new
snapshot and rollback is free (SURVEY.md §2.1 S9).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class TableCatalog(ABC):
    @abstractmethod
    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> None: ...

    @abstractmethod
    def read(self, name: str) -> DataFrame: ...

    @abstractmethod
    def exists(self, name: str) -> bool: ...

    @abstractmethod
    def snapshots(self, name: str) -> list[dict]: ...

    @abstractmethod
    def rollback(self, name: str, snapshot_id: str) -> None: ...

    @abstractmethod
    def drop(self, name: str) -> None: ...

    def file_row_counts(self, name: str) -> list[int] | None:
        """Per-data-file row counts of the CURRENT snapshot, from file
        metadata only — no data scan.  This is the 100 TB-friendly
        source for per-partition stage metrics: each write-side file is
        one task's output, so the counts ARE the stage's output-skew
        profile, at O(files) footer reads instead of a full re-scan of
        the snapshot (the observe stage's former cost, VERDICT r3).
        Returns None when the backend can't answer from metadata —
        callers fall back to a scan."""
        return None


class ParquetSnapshotCatalog(TableCatalog):
    """parquet + JSON-manifest snapshots.

    Layout::

        root/<table>/snap-<id>/part-*.parquet
        root/<table>/manifest.json   {"current": "<id>", "history": [...]}

    The manifest write is staged to a temp file then ``os.replace``d —
    atomic on POSIX — so a crash mid-write never corrupts the table:
    readers keep seeing the previous snapshot (this is the property
    resume relies on).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "manifest.json")

    def _load_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _commit_manifest(self, name: str, manifest: dict) -> None:
        p = self._manifest_path(name)
        tmp = p + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, p)

    # -- TableCatalog -------------------------------------------------------
    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> None:
        if mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode {mode!r}")
        snap_id = uuid.uuid4().hex[:12]
        snap_dir = os.path.join(self._tdir(name), f"snap-{snap_id}")
        manifest = self._load_manifest(name) or {"current": None, "history": []}
        if mode == "append" and manifest["current"] is not None:
            # append = union of previous snapshot and new data into a
            # fresh immutable snapshot (copy-on-write, Iceberg-style)
            prev = self.read(name)
            df = prev.unionByName(df)
        df.write.mode("overwrite").parquet(snap_dir)
        manifest["history"].append(
            {"id": snap_id, "ts": time.time(), "mode": mode}
        )
        manifest["current"] = snap_id
        self._commit_manifest(name, manifest)

    def read(self, name: str) -> DataFrame:
        manifest = self._load_manifest(name)
        if manifest is None or manifest["current"] is None:
            raise FileNotFoundError(f"table {name!r} not in catalog {self.root}")
        return self.spark.read.parquet(
            os.path.join(self._tdir(name), f"snap-{manifest['current']}")
        )

    def read_snapshot(self, name: str, snapshot_id: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._tdir(name), f"snap-{snapshot_id}")
        )

    def exists(self, name: str) -> bool:
        m = self._load_manifest(name)
        return m is not None and m["current"] is not None

    def snapshots(self, name: str) -> list[dict]:
        m = self._load_manifest(name)
        return list(m["history"]) if m else []

    def rollback(self, name: str, snapshot_id: str) -> None:
        m = self._load_manifest(name)
        if m is None or all(s["id"] != snapshot_id for s in m["history"]):
            raise KeyError(f"snapshot {snapshot_id} not found for {name}")
        m["current"] = snapshot_id
        self._commit_manifest(name, m)

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)

    def file_row_counts(self, name: str) -> list[int]:
        """Parquet-footer row counts per part file (sorted by file name
        so the partition ordinals are deterministic).  Footers are a
        few KB regardless of file size — O(files) metadata I/O."""
        m = self._load_manifest(name)
        if m is None or m["current"] is None:
            raise FileNotFoundError(f"table {name!r} not in catalog {self.root}")
        import pyarrow.parquet as pq

        snap = os.path.join(self._tdir(name), f"snap-{m['current']}")
        return [
            pq.read_metadata(os.path.join(snap, fn)).num_rows
            for fn in sorted(os.listdir(snap))
            if fn.startswith("part-") and fn.endswith(".parquet")
        ]


class IcebergCatalog(TableCatalog):
    """Iceberg-backed implementation (requires the Iceberg runtime jar
    and a configured ``spark.sql.catalog.<catalog>``).  Not exercisable
    in this sandbox — kept thin and real so a cluster deployment only
    swaps the catalog object."""

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "er"):
        conf_key = f"spark.sql.catalog.{catalog}"
        if spark.conf.get(conf_key, None) is None:
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} not configured ({conf_key} unset); "
                "add the iceberg-spark-runtime jar and catalog conf, or use "
                "ParquetSnapshotCatalog"
            )
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")

    def _fqn(self, name: str) -> str:
        return f"{self.prefix}.{name}"

    def write(self, name: str, df: DataFrame, mode: str = "overwrite") -> None:
        if mode == "overwrite":
            df.writeTo(self._fqn(name)).createOrReplace()
        else:
            df.writeTo(self._fqn(name)).append()

    def read(self, name: str) -> DataFrame:
        return self.spark.read.table(self._fqn(name))

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._fqn(name))

    def snapshots(self, name: str) -> list[dict]:
        rows = self.spark.sql(
            f"SELECT snapshot_id, committed_at FROM {self._fqn(name)}.snapshots"
        ).collect()
        return [
            {"id": str(r.snapshot_id), "ts": str(r.committed_at)} for r in rows
        ]

    def rollback(self, name: str, snapshot_id: str) -> None:
        self.spark.sql(
            f"CALL {self.prefix.split('.')[0]}.system.rollback_to_snapshot"
            f"('{self._fqn(name)}', {snapshot_id})"
        )

    def drop(self, name: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self._fqn(name)}")

    def file_row_counts(self, name: str) -> list[int]:
        """Iceberg answers this from its own metadata: the ``.files``
        table carries record_count per data file — no data scan."""
        rows = self.spark.sql(
            f"SELECT record_count FROM {self._fqn(name)}.files ORDER BY file_path"
        ).collect()
        return [int(r.record_count) for r in rows]


def get_catalog(spark: SparkSession, root: str, iceberg_catalog: str | None = None) -> TableCatalog:
    """Factory: Iceberg when configured, parquet+manifest otherwise."""
    if iceberg_catalog and spark.conf.get(f"spark.sql.catalog.{iceberg_catalog}", None):
        return IcebergCatalog(spark, iceberg_catalog)
    return ParquetSnapshotCatalog(spark, root)
