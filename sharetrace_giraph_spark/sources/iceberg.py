"""Iceberg-backed warehouse — same API as :class:`ParquetWarehouse`.

Used when the Iceberg Spark runtime is on the classpath (the north rule's
actual storage target); :func:`warehouse.open_warehouse` probes for it and
falls back to the parquet-manifest implementation otherwise (this
container has no Iceberg jar, so this module is exercised by unit tests
with a recording stub session — see ``tests/test_warehouse.py``).

Everything here is the public Iceberg-Spark integration surface
(https://iceberg.apache.org/docs/latest/spark-queries/):

- ``df.writeTo(ident).append()`` / ``.createOrReplace()`` for commits,
- the ``<table>.snapshots`` metadata table for snapshot listing,
- ``VERSION AS OF`` (via DataFrameReader ``snapshot-id``) for time travel,
- ``start-snapshot-id`` / ``end-snapshot-id`` read options for the
  incremental (cursor) read — start is exclusive, matching the
  "strictly after" contract of ``read_incremental``.

Unlike the parquet fallback's dense integer snapshot ids, Iceberg
snapshot ids are opaque longs; callers must treat them as tokens (the
engine's ingestion cursor already does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class IcebergWarehouse:
    """Warehouse over an Iceberg catalog namespace.

    ``namespace`` is the catalog-qualified namespace the tables live in
    (e.g. ``"spark_catalog.sharetrace"``); a filesystem-looking root is
    normalized by replacing path separators with dots.
    """

    def __init__(self, spark: SparkSession, namespace: str) -> None:
        self.spark = spark
        self.namespace = namespace.replace("/", ".").strip(".")

    # -- identifiers ----------------------------------------------------------

    def _ident(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def _ensure_namespace(self) -> None:
        self.spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.namespace}")

    def _exists(self, table: str) -> bool:
        return bool(self.spark.catalog.tableExists(self._ident(table)))

    def _latest_snapshot_id(self, table: str) -> int | None:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._ident(table)}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(rows[0][0]) if rows else None

    # -- API (mirrors ParquetWarehouse) ---------------------------------------

    def append(self, df: DataFrame, table: str) -> int:
        """Append rows as a new snapshot; returns its snapshot id."""
        if self._exists(table):
            df.writeTo(self._ident(table)).append()
        else:
            self._ensure_namespace()
            df.writeTo(self._ident(table)).using("iceberg").create()
        return self._latest_snapshot_id(table)

    def write_table(self, df: DataFrame, table: str) -> int:
        """Replace the table contents atomically (Iceberg metadata swap;
        prior snapshots stay readable until expired — the exact semantics
        the parquet fallback emulates with fresh snap paths)."""
        self._ensure_namespace()
        df.writeTo(self._ident(table)).using("iceberg").createOrReplace()
        return self._latest_snapshot_id(table)

    def snapshot_ids(self, table: str) -> list[int]:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self._ident(table)}.snapshots "
            "ORDER BY committed_at"
        ).collect()
        return [int(r[0]) for r in rows]

    def read_table(self, table: str, as_of: int | None = None) -> DataFrame:
        if not self._exists(table):
            # API parity with ParquetWarehouse: callers (incremental
            # pipeline, streaming sink) catch ValueError for "no table yet"
            raise ValueError(f"table {table} has no snapshots (as_of={as_of})")
        reader = self.spark.read.format("iceberg")
        if as_of is not None:
            reader = reader.option("snapshot-id", str(as_of))
        return reader.load(self._ident(table))

    def read_incremental(
        self, table: str, after: int | None
    ) -> tuple[DataFrame | None, int | None]:
        """Rows committed strictly after snapshot ``after`` (None = full
        table). Returns (df_or_None, latest_snapshot_id) — the cursor
        contract shared with ParquetWarehouse."""
        latest = self._latest_snapshot_id(table)
        if latest is None:
            return None, after
        if after is None:
            return self.read_table(table), latest
        if after == latest:
            return None, latest
        df = (
            self.spark.read.format("iceberg")
            .option("start-snapshot-id", str(after))
            .option("end-snapshot-id", str(latest))
            .load(self._ident(table))
        )
        return df, latest
