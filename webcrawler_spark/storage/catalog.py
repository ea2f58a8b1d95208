"""Snapshot-versioned table catalog — Iceberg semantics over plain Parquet.

The north rule requires Iceberg/Parquet snapshot checkpoints with
per-partition lineage + counters, resumable per epoch. The Iceberg runtime
jar is not available offline in this sandbox, so this module provides the
same *semantics* on plain Parquet with an atomic JSON manifest:

- each epoch commit writes table data under ``{root}/{table}/epoch={E}/``
  (delta tables append a partition; snapshot tables replace state);
- a single ``manifest.json`` is the commit point: a crash between data write
  and manifest rename leaves the previous epoch fully readable (write-temp +
  os.replace = atomic on POSIX);
- the manifest records per-epoch, per-table row counts and the observed
  pipeline counters (A1/A2 processing stats) — the per-partition lineage;
- ``load_state(epoch)`` reconstructs exactly the state as of that epoch, so
  resume-from-checkpoint is a manifest read.

On a real cluster the same call sites map 1:1 onto Iceberg:
snapshot tables -> ``writeTo(t).overwritePartitions()``, delta tables ->
``writeTo(t).append()``, manifest -> Iceberg snapshot metadata, and
``load_state`` -> time travel (``VERSION AS OF``). The engine only talks to
this interface, so swapping backends is a one-file change.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"

# tables whose epoch partition is a *delta* (union across epochs = state)
DELTA_TABLES = {"seen", "links", "web_content", "schedule"}
# tables whose epoch partition is a full *snapshot* (latest wins)
SNAPSHOT_TABLES = {"frontier", "deferred", "host_stats", "seen_bloom", "seen_cuckoo"}


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- manifest ------------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def read_manifest(self) -> dict:
        path = self._manifest_path()
        if not os.path.exists(path):
            return {"epochs": []}
        with open(path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic commit point

    def last_committed_epoch(self) -> int | None:
        epochs = self.read_manifest()["epochs"]
        return epochs[-1]["epoch"] if epochs else None

    # ---- write / commit --------------------------------------------------------
    def _epoch_dir(self, table: str, epoch: int) -> str:
        return os.path.join(self.root, table, f"epoch={epoch}")

    def stage(self, table: str, epoch: int, df: DataFrame, partition_by: str | None = None) -> int:
        """Write one table's epoch partition; returns row count (lineage)."""
        path = self._epoch_dir(table, epoch)
        if os.path.exists(path):
            shutil.rmtree(path)  # idempotent re-run of an uncommitted epoch
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)
        # cheap count from parquet footer metadata, no second job over data
        return self.spark.read.parquet(path).count()

    def commit_epoch(self, epoch: int, table_counts: dict[str, int], counters: dict) -> None:
        """Atomic commit: epoch becomes visible only after manifest replace."""
        manifest = self.read_manifest()
        manifest["epochs"] = [e for e in manifest["epochs"] if e["epoch"] < epoch]
        manifest["epochs"].append(
            {"epoch": epoch, "tables": table_counts, "counters": counters}
        )
        self._write_manifest(manifest)

    # ---- read ------------------------------------------------------------------
    def read_delta_union(self, table: str, as_of_epoch: int) -> DataFrame | None:
        """State of a delta table = union of committed partitions <= epoch.
        Only manifest-committed epoch dirs are read (uncommitted data is
        invisible — snapshot isolation); each delta row carries its own epoch
        column for lineage, so no partition inference is needed."""
        base = os.path.join(self.root, table)
        committed = [
            e["epoch"]
            for e in self.read_manifest()["epochs"]
            if e["epoch"] <= as_of_epoch and table in e["tables"]
        ]
        if not committed or not os.path.exists(base):
            return None
        return self.spark.read.parquet(*[self._epoch_dir(table, e) for e in committed])

    def read_snapshot(self, table: str, as_of_epoch: int) -> DataFrame | None:
        """Latest committed snapshot partition <= epoch."""
        committed = [
            e["epoch"]
            for e in self.read_manifest()["epochs"]
            if e["epoch"] <= as_of_epoch and table in e["tables"]
        ]
        if not committed:
            return None
        path = self._epoch_dir(table, max(committed))
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def counters(self, epoch: int) -> dict | None:
        for e in self.read_manifest()["epochs"]:
            if e["epoch"] == epoch:
                return e["counters"]
        return None
