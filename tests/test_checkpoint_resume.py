"""Kill-and-resume: a run interrupted after superstep k continues from the
max committed checkpoint and produces the identical result (north rule;
reference analog: retained Giraph checkpoints, giraph-site.xml:10-15)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sharetrace_giraph_spark import datagen
from sharetrace_giraph_spark.algorithms import pagerank
from sharetrace_giraph_spark.operators import edges as E
from sharetrace_giraph_spark.plans.superstep import SuperstepDriver, latest_committed


@pytest.fixture(scope="module")
def graph(spark):
    # turns_per_conv must be >= 16 so even 4-participant conversations
    # produce >= 15-min pairwise co-presence (120 s turn spacing)
    t = datagen.generate_transcripts(
        spark, n_convs=200, turns_per_conv=16, n_actors=50, n_communities=5, seed=5
    )
    contacts = E.derive_contacts(t)
    verts = E.vertex_ids(contacts).persist()
    enc = E.undirect(E.encode_edges(contacts, verts)).persist()
    enc.count()
    return verts, enc


class _Killed(Exception):
    pass


def test_resume_same_result(spark, tmp_path, graph):
    verts, enc = graph
    ckpt_a = str(tmp_path / "a")
    ckpt_b = str(tmp_path / "b")

    # uninterrupted run
    full = pagerank(spark, enc, verts, ckpt_a, run_id="full", tolerance=1e-10, max_supersteps=30)

    # interrupted run: kill inside superstep 3 by wrapping the step
    import sharetrace_giraph_spark.algorithms.pagerank as pr_mod

    orig_run = SuperstepDriver.run

    def killing_run(self, init_state, step, **kw):
        def killing_step(state, k):
            if k == 3:
                raise _Killed()
            return step(state, k)

        return orig_run(self, init_state, killing_step, **kw)

    SuperstepDriver.run = killing_run
    try:
        with pytest.raises(_Killed):
            pagerank(spark, enc, verts, ckpt_b, run_id="res", tolerance=1e-10, max_supersteps=30)
    finally:
        SuperstepDriver.run = orig_run

    # supersteps 0..2 committed
    assert latest_committed(ckpt_b, "res", "pagerank") == 2

    # resume: same call again, picks up from superstep 3
    resumed = pagerank(spark, enc, verts, ckpt_b, run_id="res", tolerance=1e-10, max_supersteps=30)
    assert resumed.resumed_from == 2
    assert resumed.supersteps_run < full.supersteps_run

    a = {r.vertex_id: r.rank for r in full.state.collect()}
    b = {r.vertex_id: r.rank for r in resumed.state.collect()}
    assert a.keys() == b.keys()
    assert max(abs(a[v] - b[v]) for v in a) < 1e-12

    # lineage metrics recorded per superstep
    drv = SuperstepDriver(spark, ckpt_b, "res", "pagerank")
    m = drv.metrics()
    steps = sorted(r.superstep for r in m.select("superstep").collect())
    assert steps == list(range(resumed.final_superstep + 1))
    assert m.filter(F.col("l1_delta").isNull()).count() == 0

    # per-partition lineage (north rule): every durable superstep has one
    # row per state file, and their row counts sum to V
    pm = drv.partition_metrics()
    n_verts = verts.count()
    per_step = {
        r.superstep: r.total
        for r in pm.groupBy("superstep").agg(F.sum("rows").alias("total")).collect()
    }
    for k in range(resumed.final_superstep + 1):
        assert per_step.get(k) == n_verts, (k, per_step.get(k))
    assert pm.filter(F.col("bytes") <= 0).count() == 0


def test_resume_personalized_weighted_pagerank(spark, tmp_path, graph):
    """The personalization vector rides IN the checkpointed state (pref
    column) — resume must restore it bit-exactly, or post-resume restarts
    would silently fall back to a wrong distribution. Also covers weighted
    transitions across the resume boundary."""
    verts, enc = graph
    w = enc.withColumn(
        "w", (F.pmod(F.xxhash64("src", "dst"), F.lit(5)) + 1).cast("double")
    )
    seeds = verts.orderBy("vertex_id").limit(2).select("vertex_id")

    full = pagerank(spark, w, verts, str(tmp_path / "pa"), run_id="pw",
                    tolerance=0.0, max_supersteps=6, weight_col="w",
                    teleport=seeds, checkpoint_every=2)

    orig_run = SuperstepDriver.run

    def killing_run(self, init_state, step, **kw):
        def killing_step(state, k):
            if k == 4:
                raise _Killed()
            return step(state, k)
        return orig_run(self, init_state, killing_step, **kw)

    SuperstepDriver.run = killing_run
    try:
        with pytest.raises(_Killed):
            pagerank(spark, w, verts, str(tmp_path / "pb"), run_id="pwr",
                     tolerance=0.0, max_supersteps=6, weight_col="w",
                     teleport=seeds, checkpoint_every=2)
    finally:
        SuperstepDriver.run = orig_run

    resumed = pagerank(spark, w, verts, str(tmp_path / "pb"), run_id="pwr",
                       tolerance=0.0, max_supersteps=6, weight_col="w",
                       teleport=seeds, checkpoint_every=2)
    assert resumed.resumed_from is not None
    a = {r.vertex_id: (r.rank, r.pref) for r in full.state.collect()}
    b = {r.vertex_id: (r.rank, r.pref) for r in resumed.state.collect()}
    assert a.keys() == b.keys()
    for v in a:
        assert a[v][1] == b[v][1], f"pref mismatch at {v}"   # exact
        assert abs(a[v][0] - b[v][0]) < 1e-12, f"rank mismatch at {v}"


def test_resume_bfs_sentinel(spark, tmp_path, graph):
    """BFS's UNREACHED sentinel (2^62) must round-trip through the parquet
    checkpoint on resume — a lossy cast would corrupt distances."""
    from sharetrace_giraph_spark.algorithms import UNREACHED, bfs

    verts, enc = graph
    seed = verts.orderBy("vertex_id").limit(1).select("vertex_id")
    full = bfs(spark, enc, verts, seed, str(tmp_path / "ba"), run_id="bf",
               max_supersteps=30, checkpoint_every=2)

    orig_run = SuperstepDriver.run

    def killing_run(self, init_state, step, **kw):
        def killing_step(state, k):
            if k == 2:
                raise _Killed()
            return step(state, k)
        return orig_run(self, init_state, killing_step, **kw)

    SuperstepDriver.run = killing_run
    try:
        with pytest.raises(_Killed):
            bfs(spark, enc, verts, seed, str(tmp_path / "bb"), run_id="bfr",
                max_supersteps=30, checkpoint_every=2)
    finally:
        SuperstepDriver.run = orig_run

    resumed = bfs(spark, enc, verts, seed, str(tmp_path / "bb"), run_id="bfr",
                  max_supersteps=30, checkpoint_every=2)
    assert resumed.resumed_from is not None
    a = {r.vertex_id: r.dist for r in full.state.collect()}
    b = {r.vertex_id: r.dist for r in resumed.state.collect()}
    assert a == b
    assert all(d == UNREACHED or d < 100 for d in b.values())
