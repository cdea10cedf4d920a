"""Multi-source BFS hop distance over the contact graph.

Same checkpointed gather-scatter skeleton as connected components
(J1 join + min aggregate + I3 active frontier): every source starts at
distance 0, every other vertex at an "unreached" sentinel; each superstep
the frontier (vertices whose distance improved last superstep) sends
``dist + 1`` to its out-neighbors and each receiver keeps the minimum.
A distance can only improve through a neighbor that itself improved, so
frontier-only messaging is exact, and the frontier IS the classic BFS
wavefront — superstep k settles exactly the vertices at hop distance k.
Halts when no distance changes (L1 of the 0/1 change indicator < 0.5),
i.e. after eccentricity(sources)+1 supersteps.

The reference has no reachability query; this is the natural extension of
its propagation loop (``compute/VariableVertexComputation.java`` relays
values along contact edges the same way) to hop-distance analytics —
"how many hops from the seed set is each actor" is the link-graph
question its risk scores approximate with decaying weights.

Determinism: min over longs — order- and tie-safe. Skew: ``salt_threshold``
mirrors ``connected_components``; the per-dst min is split via two-level
salted min (``operators/skew.salted_min``).

Edges must be directed (pass ``operators.edges.undirect`` output for the
undirected contact graph).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.skew import hub_vertices, salted_min
from ..plans.superstep import SuperstepDriver, SuperstepResult, prepare_edges

#: "not reached yet" — far above any real hop count, far below long
#: overflow even after repeated +1
UNREACHED = 1 << 62


def bfs(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    sources: DataFrame,
    checkpoint_dir: str,
    run_id: str = "bfs",
    max_supersteps: int = 50,
    num_partitions: int | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
    salt_threshold: int | None = None,
    salts: int = 16,
) -> SuperstepResult:
    """Returns state (vertex_id, dist, delta); ``dist`` is the minimum hop
    count from any source, or :data:`UNREACHED`. Filter
    ``dist < UNREACHED`` for the reachable set."""
    e, num_partitions = prepare_edges(
        spark, edges.select("src", "dst"), "src", num_partitions
    )
    # hash-partition + materialize the vertex universe before the loop
    # (parity with pagerank._prepare — see connected_components.py)
    verts = (
        vertices.select("vertex_id")
        .repartition(num_partitions, "vertex_id")
        .persist()
    )
    verts.count()

    hubs = None
    if salt_threshold is not None:
        hubs = hub_vertices(e, salt_threshold, "in").persist()
        hubs.count()

    src_set = sources.select("vertex_id").distinct()
    # guard the same failure pagerank's personalized path guards: a seed
    # set disjoint from the vertex universe (typo / id-encoding mismatch)
    # would otherwise produce an empty first frontier and an instantly
    # "converged" run with every vertex UNREACHED — plausible-looking,
    # silently wrong output. Probe direction matters at scale: verts as
    # the LEFT side puts the SOURCE set on the semi-join's build side,
    # so for the typical handful of seeds AQE broadcasts it and the
    # check is a probe over the already-cached verts with isEmpty's
    # early exit — while an unbounded source cohort (nothing in the API
    # caps `sources`) degrades to a shuffle join instead of a forced
    # driver-OOM broadcast. The flipped orientation could never
    # broadcast its O(V) build side at all.
    if verts.join(src_set, "vertex_id", "left_semi").isEmpty():
        raise ValueError("source set has no vertex in the graph")
    init = verts.join(src_set.withColumn("_is_src", F.lit(True)), "vertex_id", "left").select(
        "vertex_id",
        F.when(F.col("_is_src"), F.lit(0)).otherwise(F.lit(UNREACHED))
        .cast("long").alias("dist"),
        # only sources are in the first frontier — everyone else has
        # nothing to say until a wavefront reaches them
        F.when(F.col("_is_src"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("delta"),
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        frontier = state.where(F.col("delta") > 0.5)
        # shuffle_hash: the frontier is O(V) early on — never broadcast a
        # side that grows with the graph (see connected_components.py)
        msgs = e.join(frontier.hint("shuffle_hash"), e.src == frontier.vertex_id).select(
            e.dst.alias("mdst"), (F.col("dist") + 1).alias("nd")
        )
        if hubs is not None:
            inc = salted_min(
                msgs.select(F.col("mdst").alias("dst"), F.col("nd").alias("min_nd")),
                key="dst", value="min_nd", hubs=hubs, salts=salts,
                salt_source=None,
            ).select(F.col("dst").alias("mdst"), "min_nd")
        else:
            inc = msgs.groupBy("mdst").agg(F.min("nd").alias("min_nd"))
        new_dist = F.least("dist", F.coalesce("min_nd", "dist"))
        return state.join(inc.hint("shuffle_hash"), state.vertex_id == F.col("mdst"), "left").select(
            "vertex_id",
            new_dist.alias("dist"),
            F.when(new_dist != F.col("dist"), 1.0).otherwise(0.0).alias("delta"),
        )

    driver = SuperstepDriver(spark, checkpoint_dir, run_id, "bfs", num_partitions)
    res = driver.run(init, step, max_supersteps=max_supersteps, tolerance=0.5,
                     resume=resume, checkpoint_every=checkpoint_every)
    e.unpersist()
    verts.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return res
