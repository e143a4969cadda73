"""Partitioned-table storage layer with snapshot log.

Locally this is parquet + dynamic partition overwrite + a JSONL
snapshot log per table.  The interface is deliberately the subset of
Iceberg we rely on in production — `overwritePartitions`, snapshot ids,
snapshot summary properties — so swapping the implementation for
`df.writeTo("cat.db.t").overwritePartitions()` is a one-file change
(no Iceberg runtime jar ships in this sandbox).

Semantics mirrored from the reference:
- per-source artifact replace, never append-duplicate
  (run_key idempotence, /root/reference/userCode/defs.py:91-98)
- snapshot log ≈ lakeFS commits (/root/reference/userCode/lib/lakefs.py:60-111)
- summary properties carry per-partition lineage counters
  (≈ the `prov/` graph, /root/reference/docs/hdt.md:13)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Catalog:
    root: str
    spark: SparkSession

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _snapshot_log(self, name: str) -> str:
        return os.path.join(self.root, f"{name}._snapshots.jsonl")

    # -- writes -----------------------------------------------------------
    def overwrite_partitions(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str],
        properties: dict[str, Any] | None = None,
    ) -> int:
        """Replace exactly the partitions present in `df`
        (partitionOverwriteMode=dynamic), then commit a snapshot entry.
        Returns the new snapshot id.

        The mode is set as a per-write option, not inherited from the
        session: under the default STATIC mode this write would silently
        delete every untouched partition, destroying the resume/
        idempotence contract for any caller outside session.get_spark.
        """
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(self.table_path(name))
        )
        return self._commit(name, "overwrite_partitions", properties or {})

    def overwrite(self, df: DataFrame, name: str, properties: dict[str, Any] | None = None) -> int:
        df.write.mode("overwrite").parquet(self.table_path(name))
        return self._commit(name, "overwrite", properties or {})

    def append(self, df: DataFrame, name: str, properties: dict[str, Any] | None = None) -> int:
        df.write.mode("append").parquet(self.table_path(name))
        return self._commit(name, "append", properties or {})

    def delete_partitions(
        self,
        name: str,
        partition_col: str,
        keys: list[str],
        properties: dict[str, Any] | None = None,
    ) -> int:
        """Drop whole partitions by key — metadata-only, no row scan
        (≈ Iceberg `DELETE FROM t WHERE part IN (…)` / the reference's
        stale-partition prune, /root/reference/userCode/lib/dagster.py:19-30).
        Missing partitions are ignored (idempotent)."""
        import shutil
        from urllib.parse import quote

        root = self.table_path(name)
        dropped = []
        for key in keys:
            # Spark writes partition dirs with URL-encoded values
            for enc in {str(key), quote(str(key), safe="")}:
                p = os.path.join(root, f"{partition_col}={enc}")
                if os.path.isdir(p):
                    shutil.rmtree(p)
                    dropped.append(str(key))
                    break
        props = dict(properties or {})
        props["dropped_partitions"] = sorted(set(dropped))
        return self._commit(name, "delete_partitions", props)

    # -- reads ------------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.table_path(name))

    def exists(self, name: str) -> bool:
        p = self.table_path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith("src_partition=") or "=" in f
            for f in os.listdir(p)
        )

    # -- snapshots ---------------------------------------------------------
    def _commit(self, name: str, operation: str, properties: dict[str, Any]) -> int:
        os.makedirs(self.root, exist_ok=True)
        snapshot_id = self.current_snapshot_id(name) + 1
        entry = {
            "snapshot_id": snapshot_id,
            "table": name,
            "operation": operation,
            "committed_at": time.time(),
            "properties": properties,
        }
        with open(self._snapshot_log(name), "a") as f:
            f.write(json.dumps(entry) + "\n")
        return snapshot_id

    def current_snapshot_id(self, name: str) -> int:
        return self.snapshots(name)[-1]["snapshot_id"] if self.snapshots(name) else 0

    def snapshots(self, name: str) -> list[dict[str, Any]]:
        path = self._snapshot_log(name)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def prune_snapshots(self, name: str, keep_last: int = 100, batch: int = 1000) -> int:
        """Oldest-first batched snapshot-log cleanup (≈ the reference's
        ascending limit-100k run-record purge,
        /root/reference/userCode/instance.py:41-51).  Returns the number
        of entries removed; ids keep monotonically increasing."""
        snaps = self.snapshots(name)
        if len(snaps) <= keep_last:
            return 0
        removed = 0
        while len(snaps) > keep_last:
            drop = min(batch, len(snaps) - keep_last)
            snaps = snaps[drop:]  # oldest first
            removed += drop
        with open(self._snapshot_log(name), "w") as f:
            for entry in snaps:
                f.write(json.dumps(entry) + "\n")
        return removed
