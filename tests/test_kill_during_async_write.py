"""A REAL SIGKILL landing inside the async-snapshot window (round 5).

The round-4 torn-snapshot test fabricates the artifact (a state dir
whose ``_SUCCESS`` was deleted); this test produces it with an actual
``SIGKILL`` delivered while superstep k's durable write is still in
flight AND superstep k+1 is mid-compute — the exact timing window the
pipelined-snapshot design opens. The child process widens that window
deterministically by wrapping ``DataFrameWriter.parquet`` with a sleep
(driver-side, before the write job starts) and touches a marker file
when the post-write superstep begins; the parent kills on the marker.

Contract under test: whatever partial artifacts the kill leaves,
``latest_committed`` ignores them and a fresh driver resumes one
cadence back, finishing with exactly the uninterrupted run's state.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

_CHILD = r"""
import os, sys, time

import pyspark.sql.functions as F
from pyspark.sql.readwriter import DataFrameWriter

from sharetrace_giraph_spark.session import get_spark
from sharetrace_giraph_spark.plans.superstep import SuperstepDriver

ckpt, marker = sys.argv[1], sys.argv[2]

# widen the kill window: every driver-side parquet write stalls 20 s
# BEFORE launching the write job, so _SUCCESS cannot land until long
# after the parent's SIGKILL
_orig_parquet = DataFrameWriter.parquet

def slow_parquet(self, path, **kw):
    if "superstep=3" in path:  # only the target snapshot stalls
        time.sleep(20)
    return _orig_parquet(self, path, **kw)

DataFrameWriter.parquet = slow_parquet

spark = get_spark(app_name="kill-child", master="local[4]", shuffle_partitions=4)
init = (
    spark.range(64)
    .select(
        F.col("id").alias("vertex_id"),
        F.lit(1.0).alias("value"),
        F.lit(1.0).alias("delta"),
    )
    .repartition(4, "vertex_id")
)

def halve(state, k):
    if k == 4:  # superstep AFTER the stalled write has begun
        open(marker, "w").write("k4")
    return state.select(
        "vertex_id",
        (F.col("value") / 2).alias("value"),
        (F.col("value") / 2).alias("delta"),
    )

drv = SuperstepDriver(spark, ckpt, "k", "halve", num_partitions=4)
drv.run(init, halve, max_supersteps=6, tolerance=0.0, checkpoint_every=2)
print("UNEXPECTED: run completed")
"""


def test_sigkill_mid_async_write_resumes_one_cadence_back(spark, tmp_path):
    ckpt = str(tmp_path / "ck")
    marker = str(tmp_path / "marker")
    child = subprocess.Popen(
        [sys.executable, "-c", _CHILD, ckpt, marker],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        deadline = time.time() + 180
        while not os.path.exists(marker) and time.time() < deadline:
            if child.poll() is not None:
                pytest.fail(f"child exited early (rc={child.returncode})")
            time.sleep(0.1)
        assert os.path.exists(marker), "child never reached superstep 4"
        # superstep 3's write thread is inside the 20 s stall (no
        # _SUCCESS yet) and superstep 4 is computing: kill NOW
        child.send_signal(signal.SIGKILL)
        child.wait(timeout=30)
    finally:
        if child.poll() is None:
            child.kill()
            child.wait(timeout=30)

    from sharetrace_giraph_spark.plans.superstep import (
        SuperstepDriver,
        latest_committed,
    )

    # the stalled superstep=3 snapshot must NOT count as committed
    committed = latest_committed(ckpt, "k", "halve")
    assert committed == 1, committed
    sdir = os.path.join(ckpt, "k", "halve", "state")
    assert not os.path.exists(os.path.join(sdir, "superstep=3", "_SUCCESS"))

    # resume in-process: re-runs 2..5 and matches the uninterrupted run
    import pyspark.sql.functions as F

    def init_state():
        return (
            spark.range(64)
            .select(
                F.col("id").alias("vertex_id"),
                F.lit(1.0).alias("value"),
                F.lit(1.0).alias("delta"),
            )
            .repartition(4, "vertex_id")
        )

    def halve(state, k):
        return state.select(
            "vertex_id",
            (F.col("value") / 2).alias("value"),
            (F.col("value") / 2).alias("delta"),
        )

    drv = SuperstepDriver(spark, ckpt, "k", "halve", num_partitions=4)
    res = drv.run(init_state(), halve, max_supersteps=6, tolerance=0.0,
                  checkpoint_every=2)
    assert res.resumed_from == 1
    got = sorted((r.vertex_id, round(r.value, 12)) for r in res.state.collect())
    assert got == [(i, round(2.0 ** -6, 12)) for i in range(64)]
    # and the lineage presents one row per superstep despite the re-run
    steps = sorted(r.superstep for r in drv.metrics().collect())
    assert steps == [0, 1, 2, 3, 4, 5], steps
