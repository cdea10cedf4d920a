"""Warehouse backend selection + manifest hardening.

- the Iceberg probe must be REAL (py4j returns a truthy JavaPackage for
  missing classes, so attribute access is not a probe);
- legacy manifests (pre-``next_snap_id``) must never reuse a live
  snapshot path;
- the Iceberg branch is exercised with a recording stub session (the
  container has no Iceberg jar).
"""

from __future__ import annotations

import json

from sharetrace_giraph_spark.sources import warehouse as W
from sharetrace_giraph_spark.sources.iceberg import IcebergWarehouse


def test_probe_false_in_this_container(spark):
    assert W._iceberg_available(spark) is False


def test_open_warehouse_falls_back_to_parquet(spark, tmp_path):
    wh = W.open_warehouse(spark, str(tmp_path / "wh"))
    assert isinstance(wh, W.ParquetWarehouse)


def test_open_warehouse_iceberg_branch(monkeypatch):
    monkeypatch.setattr(W, "_iceberg_available", lambda s: True)
    wh = W.open_warehouse(object(), "catalog.db")
    assert isinstance(wh, IcebergWarehouse)
    assert wh.namespace == "catalog.db"


def test_legacy_manifest_never_reuses_snapshot_path(spark, tmp_path):
    """A manifest written before 'next_snap_id' existed (snapshots but no
    counter) must yield last_id+1, not 0 — id 0's files would otherwise be
    clobbered by the next append."""
    wh = W.ParquetWarehouse(spark, str(tmp_path / "wh"))
    s0 = wh.append(spark.range(3), "t")
    s1 = wh.append(spark.range(3, 5), "t")
    assert (s0, s1) == (0, 1)

    # simulate the legacy manifest: drop the counter key
    mpath = wh._manifest_path("t")
    with open(mpath) as f:
        manifest = json.load(f)
    del manifest["next_snap_id"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    assert wh._next_snap_id("t") == 2
    s2 = wh.append(spark.range(5, 9), "t")
    assert s2 == 2
    assert wh.read_table("t").count() == 9  # nothing clobbered
    assert wh.snapshot_ids("t") == [0, 1, 2]


# -- IcebergWarehouse unit surface (recording stubs) -------------------------


class _Rows(list):
    def collect(self):
        return self


class _Reader:
    def __init__(self, log):
        self.log = log
        self.opts = {}

    def format(self, fmt):
        self.log.append(("format", fmt))
        return self

    def option(self, k, v):
        self.opts[k] = v
        self.log.append(("option", k, v))
        return self

    def load(self, ident):
        self.log.append(("load", ident))
        return f"df::{ident}"


class _Catalog:
    def __init__(self, existing):
        self.existing = existing

    def tableExists(self, ident):
        return ident in self.existing


class _StubSpark:
    def __init__(self, snapshots=(), existing=()):
        self.snapshots = list(snapshots)
        self.log = []
        self.catalog = _Catalog(set(existing))

    def sql(self, q):
        self.log.append(("sql", " ".join(q.split())))
        if ".snapshots" in q:
            rows = _Rows([(s,) for s in self.snapshots])
            if "DESC" in q:
                rows = _Rows(list(reversed(rows))[:1])
            return rows
        return _Rows()

    @property
    def read(self):
        return _Reader(self.log)


class _WriteTo:
    def __init__(self, log, ident):
        self.log = log
        self.ident = ident

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def append(self):
        self.log.append(("append", self.ident))

    def create(self):
        self.log.append(("create", self.ident))

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ident))


class _StubDF:
    def __init__(self, log):
        self.log = log

    def writeTo(self, ident):
        return _WriteTo(self.log, ident)


def test_iceberg_append_existing_vs_create():
    s = _StubSpark(snapshots=[11, 22], existing={"ns.t"})
    wh = IcebergWarehouse(s, "ns")
    assert wh.append(_StubDF(s.log), "t") == 22
    assert ("append", "ns.t") in s.log

    s2 = _StubSpark(snapshots=[7])
    wh2 = IcebergWarehouse(s2, "ns")
    assert wh2.append(_StubDF(s2.log), "t") == 7
    assert ("create", "ns.t") in s2.log
    assert any(op[0] == "sql" and "CREATE NAMESPACE" in op[1] for op in s2.log)


def test_iceberg_read_incremental_options():
    s = _StubSpark(snapshots=[5, 9])
    wh = IcebergWarehouse(s, "cat.ns")

    df, latest = wh.read_incremental("t", after=5)
    assert latest == 9
    assert df == "df::cat.ns.t"
    assert ("option", "start-snapshot-id", "5") in s.log
    assert ("option", "end-snapshot-id", "9") in s.log

    df2, latest2 = wh.read_incremental("t", after=9)
    assert df2 is None and latest2 == 9

    empty = IcebergWarehouse(_StubSpark(), "cat.ns")
    df3, latest3 = empty.read_incremental("t", after=None)
    assert df3 is None and latest3 is None


def test_iceberg_read_table_as_of():
    s = _StubSpark(snapshots=[5], existing={"ns.t"})
    wh = IcebergWarehouse(s, "ns")
    assert wh.read_table("t", as_of=5) == "df::ns.t"
    assert ("option", "snapshot-id", "5") in s.log


def test_iceberg_read_table_missing_raises_valueerror():
    """API parity with ParquetWarehouse: 'no table yet' must be a
    ValueError (the incremental pipeline and streaming sink catch it)."""
    import pytest as _pytest

    wh = IcebergWarehouse(_StubSpark(), "ns")
    with _pytest.raises(ValueError):
        wh.read_table("t")
