"""checkpoint_every > 1 (Giraph checkpointFrequency analog): identical
results to per-superstep durable checkpoints, durable snapshots only at
the cadence, final state always durable."""

from __future__ import annotations

import os

import pytest

from sharetrace_giraph_spark import datagen
from sharetrace_giraph_spark.algorithms import pagerank
from sharetrace_giraph_spark.operators import edges as E
from sharetrace_giraph_spark.plans.superstep import latest_committed


@pytest.fixture(scope="module")
def graph(spark):
    t = datagen.generate_transcripts(
        spark, n_convs=150, turns_per_conv=16, n_actors=40, n_communities=4, seed=9
    )
    contacts = E.derive_contacts(t)
    verts = E.vertex_ids(contacts).persist()
    enc = E.undirect(E.encode_edges(contacts, verts)).persist()
    enc.count()
    return verts, enc


def test_checkpoint_every_same_result(spark, tmp_path, graph):
    verts, enc = graph
    a = pagerank(spark, enc, verts, str(tmp_path / "a"), run_id="r",
                 tolerance=0.0, max_supersteps=9, checkpoint_every=1)
    b = pagerank(spark, enc, verts, str(tmp_path / "b"), run_id="r",
                 tolerance=0.0, max_supersteps=9, checkpoint_every=4)
    ra = {r.vertex_id: r.rank for r in a.state.collect()}
    rb = {r.vertex_id: r.rank for r in b.state.collect()}
    assert ra.keys() == rb.keys()
    assert max(abs(ra[v] - rb[v]) for v in ra) < 1e-15

    # durable snapshots: cadence steps (3, 7) + final (8) + init (-1)
    sdir = os.path.join(str(tmp_path / "b"), "r", "pagerank", "state")
    steps = sorted(
        int(d.split("=")[1]) for d in os.listdir(sdir) if d.startswith("superstep=")
    )
    assert steps == [-1, 3, 7, 8]
    assert latest_committed(str(tmp_path / "b"), "r", "pagerank") == 8

    # metrics still recorded for EVERY superstep
    assert [m["superstep"] for m in b.metrics] == list(range(9))
