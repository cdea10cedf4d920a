"""Round-5 superstep-engine contracts.

Pins the four behaviors added/fixed this round:

- ``durable_continuation=True`` (cluster task-level recovery mode):
  identical results to the default carry, durable steps continue from
  parquet (executor loss between durable steps recomputes from files),
  resume still works at the same granularity;
- the convergence aggregates ride the checkpoint action itself
  (``observe`` piggyback) — a NON-durable superstep costs exactly ONE
  Spark job;
- a teardown join failure must not MASK a primary in-flight exception;
- ``metrics()`` returns one row per superstep even after a resume
  re-ran supersteps whose rows had already landed;
- superseded carried supersteps release their checkpoint blocks eagerly
  (``Dataset.unpersist`` alone cannot — localCheckpoint persists the
  underlying RDD directly).
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from sharetrace_giraph_spark.plans.superstep import SuperstepDriver, latest_committed


def _init_state(spark, n=64):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vertex_id"),
            F.lit(1.0).alias("value"),
            F.lit(1.0).alias("delta"),
        )
        .repartition(4, "vertex_id")
    )


def _halve_step(state, k):
    return state.select(
        "vertex_id",
        (F.col("value") / 2).alias("value"),
        (F.col("value") / 2).alias("delta"),
    )


def _rows(df):
    return sorted((r.vertex_id, round(r.value, 12)) for r in df.collect())


def test_durable_continuation_matches_carry(spark, tmp_path):
    """Both continuation modes must produce identical state, snapshots,
    and halt behavior — the mode only changes WHERE the next superstep
    reads its input from (parquet files vs carried local blocks)."""
    a = SuperstepDriver(spark, str(tmp_path), "a", "halve", num_partitions=4)
    ra = a.run(_init_state(spark), _halve_step, max_supersteps=5,
               tolerance=0.0, checkpoint_every=2)
    b = SuperstepDriver(spark, str(tmp_path), "b", "halve", num_partitions=4)
    rb = b.run(_init_state(spark), _halve_step, max_supersteps=5,
               tolerance=0.0, checkpoint_every=2, durable_continuation=True)
    assert _rows(ra.state) == _rows(rb.state)
    assert ra.supersteps_run == rb.supersteps_run
    assert ra.final_superstep == rb.final_superstep
    # identical durable cadence: init(-1), steps 1, 3, final 4
    for run_id in ("a", "b"):
        assert latest_committed(str(tmp_path), run_id, "halve") == 4
        sdir = os.path.join(str(tmp_path), run_id, "halve", "state")
        steps = sorted(
            int(d.split("=")[1])
            for d in os.listdir(sdir)
            if d.startswith("superstep=")
        )
        assert steps == [-1, 1, 3, 4]
    # continuation mode leaves no async write in flight (all writes sync)
    assert b._pending_write is None and b._write_exc is None


def test_durable_continuation_resumes(spark, tmp_path):
    """Kill-and-resume keeps working in continuation mode: fall back to
    the last committed snapshot and produce the synchronous history."""
    drv = SuperstepDriver(spark, str(tmp_path), "r", "halve", num_partitions=4)
    drv.run(_init_state(spark), _halve_step, max_supersteps=6,
            tolerance=0.0, checkpoint_every=2, durable_continuation=True)
    sdir = os.path.join(str(tmp_path), "r", "halve", "state")
    # simulate a kill after superstep 3 committed: drop 5 and the final
    import shutil

    shutil.rmtree(os.path.join(sdir, "superstep=5"))
    assert latest_committed(str(tmp_path), "r", "halve") == 3
    drv2 = SuperstepDriver(spark, str(tmp_path), "r", "halve", num_partitions=4)
    res = drv2.run(_init_state(spark), _halve_step, max_supersteps=6,
                   tolerance=0.0, checkpoint_every=2, durable_continuation=True)
    assert res.resumed_from == 3
    # 64 vertices halved 6 times: value = 2^-6
    assert _rows(res.state) == [(i, round(2.0 ** -6, 12)) for i in range(64)]


def test_nondurable_superstep_costs_one_job(spark, tmp_path):
    """The piggybacked convergence agg (observe on the checkpoint
    action) means a non-durable superstep launches exactly ONE Spark
    job — the round-5 serial-floor cut. Count jobs across a cadence
    where supersteps 0-2 are non-durable (checkpoint_every=4,
    resume=False so there is no init snapshot)."""
    sc = spark.sparkContext
    drv = SuperstepDriver(spark, str(tmp_path), "j", "halve", num_partitions=4)
    init = _init_state(spark).localCheckpoint(eager=True)  # settle init lineage

    jobs_before = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
    drv.run(init, _halve_step, max_supersteps=3, tolerance=0.0,
            checkpoint_every=4, resume=False)
    jobs_after = len(sc._jsc.sc().statusTracker().getJobIdsForGroup(None))
    # 3 supersteps x 1 checkpoint action + the final durable write of the
    # capped state (_write_state): 4 jobs. A regression to the separate
    # per-superstep agg job would read 7.
    assert jobs_after - jobs_before == 4, f"{jobs_after - jobs_before} jobs"


def test_teardown_join_failure_does_not_mask_primary(spark, tmp_path):
    """If step() raises while the in-flight async snapshot write ALSO
    fails, the step's exception must propagate (the write failure is a
    warning), not be replaced by the join's RuntimeError."""
    drv = SuperstepDriver(spark, str(tmp_path), "m", "halve", num_partitions=4)

    def _fail_harvest(*a, **kw):
        raise RuntimeError("injected: background write failure")

    drv._append_partition_metrics = _fail_harvest
    primary = ValueError("injected: primary step failure")

    def step(state, k):
        if k == 2:
            # superstep 1 was durable (checkpoint_every=2): its failing
            # background write is in flight / already failed by now
            raise primary
        return _halve_step(state, k)

    with pytest.warns(RuntimeWarning, match="suppressed in favor"):
        with pytest.raises(ValueError, match="primary step failure"):
            drv.run(_init_state(spark), step, max_supersteps=5,
                    tolerance=0.0, checkpoint_every=2, resume=False)
    assert drv._pending_write is None and drv._write_exc is None


def test_metrics_dedupes_reran_supersteps(spark, tmp_path):
    """A kill between a superstep's metrics row landing and its async
    snapshot committing makes resume re-run that superstep and append a
    second row; metrics() must present ONE row per superstep (the
    latest attempt)."""
    drv = SuperstepDriver(spark, str(tmp_path), "d", "halve", num_partitions=4)
    drv.run(_init_state(spark), _halve_step, max_supersteps=4,
            tolerance=0.0, checkpoint_every=2)
    # simulate the torn window: superstep 3's snapshot never committed,
    # but its metrics row (and superstep 2's) did
    sdir = os.path.join(str(tmp_path), "d", "halve", "state")
    os.remove(os.path.join(sdir, "superstep=3", "_SUCCESS"))
    drv2 = SuperstepDriver(spark, str(tmp_path), "d", "halve", num_partitions=4)
    drv2.run(_init_state(spark), _halve_step, max_supersteps=4,
             tolerance=0.0, checkpoint_every=2)
    m = drv2.metrics().collect()
    per_step = sorted(r.superstep for r in m)
    assert per_step == [0, 1, 2, 3], per_step  # one row each, no dupes


def test_superseded_carries_release_blocks(spark, tmp_path):
    """Old supersteps' localCheckpoint blocks are freed eagerly, not
    left to driver GC + ContextCleaner."""
    sc = spark.sparkContext

    def persisted_rdds():
        return len(sc._jsc.sc().getRDDStorageInfo())

    base = persisted_rdds()
    drv = SuperstepDriver(spark, str(tmp_path), "g", "halve", num_partitions=4)
    drv.run(_init_state(spark), _halve_step, max_supersteps=6,
            tolerance=0.0, checkpoint_every=2, resume=False)
    # unpersist(blocking=False) removes blocks asynchronously — bounded wait
    deadline = time.monotonic() + 10.0
    while persisted_rdds() > base and time.monotonic() < deadline:
        time.sleep(0.1)
    assert persisted_rdds() <= base, sc._jsc.sc().getRDDStorageInfo()


def test_metrics_reads_legacy_files_without_written_at(spark, tmp_path):
    """Metrics dirs written before the written_at column existed (or a
    resumed run mixing old and new files) must read without dropping the
    legacy rows: an unguarded max/semi-join on a null written_at would
    silently lose them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    drv = SuperstepDriver(spark, str(tmp_path), "d", "halve", num_partitions=4)
    drv.run(_init_state(spark), _halve_step, max_supersteps=2,
            tolerance=0.0, checkpoint_every=1)
    mdir = os.path.join(str(tmp_path), "d", "halve", "metrics")
    # a pre-upgrade row for a superstep the new files don't have
    legacy = pa.table({
        "run_id": pa.array(["d"], pa.string()),
        "algorithm": pa.array(["halve"], pa.string()),
        "superstep": pa.array([7], pa.int32()),
        "active_vertices": pa.array([1], pa.int64()),
        "messages": pa.array([1], pa.int64()),
        "l1_delta": pa.array([0.5], pa.float64()),
        "wall_ms": pa.array([10], pa.int64()),
        "num_partitions": pa.array([4], pa.int32()),
    })
    pq.write_table(legacy, os.path.join(mdir, "superstep-7-legacy.parquet"))
    rows = {r.superstep: r for r in drv.metrics().collect()}
    assert sorted(rows) == [0, 1, 7], sorted(rows)  # legacy row survives
    # and a legacy duplicate of a re-run superstep loses the tie
    legacy0 = legacy.set_column(
        2, "superstep", pa.array([0], pa.int32())
    ).set_column(4, "messages", pa.array([999], pa.int64()))
    pq.write_table(legacy0, os.path.join(mdir, "superstep-0-legacy.parquet"))
    rows = {r.superstep: r for r in drv.metrics().collect()}
    assert rows[0].messages != 999  # the new attempt's row wins


def test_initial_checkpoint_is_resumable(spark, tmp_path):
    """A job killed DURING superstep 0 must resume from the committed
    ``superstep=-1`` init snapshot — not silently re-derive the initial
    state (regression: the checkpoint-dir regex rejected the minus sign,
    so ``latest_committed`` never saw the -1 snapshot and the documented
    'killed in superstep 0 still resumes deterministically' guarantee
    was dead code)."""
    drv = SuperstepDriver(spark, str(tmp_path), "i", "halve", num_partitions=4)

    def dying_step(state, k):
        raise RuntimeError("injected: killed during superstep 0")

    with pytest.raises(RuntimeError, match="superstep 0"):
        drv.run(_init_state(spark), dying_step, max_supersteps=3, tolerance=0.0)
    assert latest_committed(str(tmp_path), "i", "halve") == -1
    # resume must read the committed init — a DIFFERENT init frame passed
    # on re-invoke (think: re-sampled seeds, a moved now() cutoff) must
    # not leak into the result
    drv2 = SuperstepDriver(spark, str(tmp_path), "i", "halve", num_partitions=4)
    poisoned = _init_state(spark).select(
        "vertex_id", (F.col("value") * 100).alias("value"), "delta"
    )
    res = drv2.run(poisoned, _halve_step, max_supersteps=3, tolerance=0.0)
    assert res.resumed_from == -1
    assert _rows(res.state) == [(i, round(2.0 ** -3, 12)) for i in range(64)]


def test_durable_continuation_init_snapshot_is_synchronous(spark, tmp_path):
    """In continuation mode the -1 init snapshot must take the sync
    parquet path like every other durable step: carrying it as
    localCheckpoint blocks would leave superstep 0 exposed to exactly
    the executor loss the mode exists to survive."""
    drv = SuperstepDriver(spark, str(tmp_path), "s", "halve", num_partitions=4)
    carried = []
    orig = drv._checkpoint_carry

    def spy(state, superstep, durable):
        carried.append(superstep)
        return orig(state, superstep, durable)

    drv._checkpoint_carry = spy
    res = drv.run(_init_state(spark), _halve_step, max_supersteps=2,
                  tolerance=0.0, checkpoint_every=1, durable_continuation=True)
    assert carried == []  # every snapshot, including -1, went sync
    assert os.path.exists(os.path.join(
        str(tmp_path), "s", "halve", "state", "superstep=-1", "_SUCCESS"
    ))
    assert res.supersteps_run == 2
    assert drv._pending_write is None


def test_durable_continuation_convergence_agg_is_bounded(spark, tmp_path, monkeypatch):
    """durable_continuation's convergence aggregates must survive a
    dropped Observation event (async listener bus under pressure): the
    bounded wait falls back to a direct agg over the durable files
    instead of hanging forever on obs.get."""
    import sharetrace_giraph_spark.plans.superstep as ss

    monkeypatch.setattr(ss, "_OBSERVE_TIMEOUT_S", 0.0)  # force the fallback
    drv = SuperstepDriver(spark, str(tmp_path), "d", "halve", num_partitions=4)
    res = drv.run(_init_state(spark), _halve_step, max_supersteps=3,
                  tolerance=0.0, checkpoint_every=1, resume=False,
                  durable_continuation=True)
    m = {r.superstep: r for r in drv.metrics().collect()}
    assert res.supersteps_run == 3
    assert all(m[k].messages > 0 for k in (0, 1, 2))  # real aggregates
