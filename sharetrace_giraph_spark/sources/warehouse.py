"""Warehouse abstraction: Iceberg-preferred, parquet-manifest fallback.

The north rule stores transcripts and checkpoints in Iceberg. This
container has no Iceberg runtime jar, so the same API is served by a
parquet directory layout with an atomic JSON manifest that mimics the two
Iceberg features the engine actually depends on:

- **snapshots**: every append creates a new numbered snapshot; readers can
  read "as of" a snapshot id;
- **incremental reads**: read only the files added after a given snapshot
  (the Iceberg ``incremental read`` used by the ingestion cursor).

When an Iceberg catalog is configured (``spark.sql.catalog.*`` present and
the runtime jar on the classpath), :func:`open_warehouse` returns the
Iceberg-backed implementation with the same API; all engine code goes
through this module, so swapping backends changes no call sites.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class ParquetWarehouse:
    """Directory-per-table parquet warehouse with an atomic snapshot
    manifest (`_manifest.json`, rewritten via rename)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest -------------------------------------------------------------

    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def _read_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"snapshots": []}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, table: str, manifest: dict) -> None:
        os.makedirs(self._tdir(table), exist_ok=True)
        p = self._manifest_path(table)
        tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, p)  # atomic commit — the Iceberg swap analog

    # -- API ------------------------------------------------------------------

    def _next_snap_id(self, table: str) -> int:
        """Monotonic across truncations (tracked in the manifest), so a new
        snapshot NEVER reuses an old path — a replace can therefore read
        the table it is replacing (lazy Spark plans) without the write
        clobbering its own input, exactly like Iceberg's immutable files +
        metadata swap.

        Manifests written before ``next_snap_id`` existed lack the key but
        may already hold snapshots — fall back to ``last id + 1`` there, so
        the next write never reuses (and overwrites) a live snapshot path."""
        manifest = self._read_manifest(table)
        snaps = manifest.get("snapshots", [])
        legacy_next = (snaps[-1]["id"] + 1) if snaps else 0
        return int(manifest.get("next_snap_id", legacy_next))

    def append(self, df: DataFrame, table: str) -> int:
        """Append rows as a new snapshot; returns the snapshot id."""
        snap_id = self._next_snap_id(table)
        part = os.path.join(self._tdir(table), f"snap-{snap_id:06d}")
        df.write.mode("overwrite").parquet(part)
        manifest = self._read_manifest(table)
        manifest["snapshots"].append(
            {"id": snap_id, "path": part, "committed_at": time.time()}
        )
        manifest["next_snap_id"] = snap_id + 1
        self._write_manifest(table, manifest)
        return snap_id

    def write_table(self, df: DataFrame, table: str) -> int:
        """Replace the table: materialize the new snapshot to a FRESH path
        first, then atomically swap the manifest to reference only it (the
        old snapshots' files are left in place, exactly as Iceberg retains
        files of expired snapshots until GC)."""
        snap_id = self._next_snap_id(table)
        part = os.path.join(self._tdir(table), f"snap-{snap_id:06d}")
        df.write.mode("overwrite").parquet(part)
        manifest = self._read_manifest(table)
        manifest["snapshots"] = [
            {"id": snap_id, "path": part, "committed_at": time.time()}
        ]
        manifest["next_snap_id"] = snap_id + 1
        self._write_manifest(table, manifest)
        return snap_id

    def snapshot_ids(self, table: str) -> list[int]:
        return [s["id"] for s in self._read_manifest(table)["snapshots"]]

    def read_table(self, table: str, as_of: int | None = None) -> DataFrame:
        snaps = self._read_manifest(table)["snapshots"]
        if as_of is not None:
            snaps = [s for s in snaps if s["id"] <= as_of]
        if not snaps:
            raise ValueError(f"table {table} has no snapshots (as_of={as_of})")
        return self.spark.read.parquet(*[s["path"] for s in snaps])

    def read_incremental(self, table: str, after: int | None) -> tuple[DataFrame | None, int | None]:
        """Rows added strictly after snapshot ``after`` (None = everything).
        Returns (df_or_None, latest_snapshot_id)."""
        snaps = self._read_manifest(table)["snapshots"]
        if not snaps:
            return None, after
        latest = snaps[-1]["id"]
        new = [s for s in snaps if after is None or s["id"] > after]
        if not new:
            return None, latest
        return self.spark.read.parquet(*[s["path"] for s in new]), latest


def _iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime class is actually loadable. NOTE:
    ``spark._jvm.org.apache.iceberg.Table`` is NOT a valid probe — py4j
    returns a truthy JavaPackage for missing classes instead of raising —
    so we ask the JVM classloader directly."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")  # noqa: SLF001
        return True
    except Exception:
        return False


def open_warehouse(spark: SparkSession, root: str):
    """Return the best available warehouse implementation for ``root``.
    Iceberg if the runtime is on the classpath; parquet-manifest otherwise
    (this container). Both expose the same API, so call sites never care."""
    if _iceberg_available(spark):
        from .iceberg import IcebergWarehouse

        return IcebergWarehouse(spark, root)
    return ParquetWarehouse(spark, root)
