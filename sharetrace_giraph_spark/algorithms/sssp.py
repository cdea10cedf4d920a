"""Weighted single-source shortest paths over the contact graph.

SSSP is THE canonical Pregel computation (the example in Malewicz et
al.'s Pregel paper, which Giraph implements — the reference engine's
``compute/VariableVertexComputation.java`` relays values along contact
edges with exactly this skeleton: receive, fold with min/max, re-send on
improvement). The reference has no shortest-path query; this is its
propagation loop applied to additive costs instead of multiplicative
risk decay.

Same checkpointed gather-scatter skeleton as :mod:`.bfs` (J1 join + min
aggregate + I3 active frontier), generalized to per-edge costs: each
superstep the frontier (vertices whose distance improved last superstep)
sends ``dist + w`` along out-edges and each receiver keeps the minimum.
Synchronous frontier relaxation computes the same per-round values as
full Bellman-Ford relaxation (a non-improved vertex's contribution was
already folded in an earlier round; min is idempotent), so after k
supersteps ``dist`` is the min-cost path using <= k edges — which lets a
SQL oracle replay the loop as k unrolled relaxation CTEs.

Determinism: weights are LONGS (the driver queries use total co-presence
duration_ms + 1), so min-plus arithmetic is exact — no float summation
order issues. Skew: ``salt_threshold`` mirrors :mod:`.bfs` (two-level
salted min via ``operators/skew.salted_min``).

Edges must be directed (pass ``operators.edges.undirect`` output for the
undirected contact graph) with a positive long ``weight_col``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.skew import hub_vertices, salted_min
from ..plans.superstep import SuperstepDriver, SuperstepResult, prepare_edges
from .bfs import UNREACHED


def shortest_paths(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    sources: DataFrame,
    checkpoint_dir: str,
    run_id: str = "sssp",
    weight_col: str = "w",
    max_supersteps: int = 50,
    num_partitions: int | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
    salt_threshold: int | None = None,
    salts: int = 16,
) -> SuperstepResult:
    """Returns state (vertex_id, dist, delta); ``dist`` is the minimum
    path cost (sum of long weights) from any source, or
    :data:`~sharetrace_giraph_spark.algorithms.bfs.UNREACHED`. Filter
    ``dist < UNREACHED`` for the reachable set."""
    e, num_partitions = prepare_edges(
        spark, edges.select("src", "dst", F.col(weight_col).cast("long").alias("w")),
        "src", num_partitions
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
    # silently wrong output. verts LEFT puts the source set on the
    # build side: AQE broadcasts the typical tiny seed set (probe over
    # cached verts, early exit) and shuffle-degrades an unbounded
    # cohort instead of force-broadcasting it (see bfs.py)
    if verts.join(src_set, "vertex_id", "left_semi").isEmpty():
        raise ValueError("source set has no vertex in the graph")
    init = verts.join(src_set.withColumn("_is_src", F.lit(True)), "vertex_id", "left").select(
        "vertex_id",
        F.when(F.col("_is_src"), F.lit(0)).otherwise(F.lit(UNREACHED))
        .cast("long").alias("dist"),
        F.when(F.col("_is_src"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("delta"),
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        frontier = state.where(F.col("delta") > 0.5)
        # shuffle_hash: the frontier is O(V) early on — never broadcast a
        # side that grows with the graph (see connected_components.py)
        msgs = e.join(frontier.hint("shuffle_hash"), e.src == frontier.vertex_id).select(
            e.dst.alias("mdst"), (F.col("dist") + F.col("w")).alias("nd")
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

    driver = SuperstepDriver(spark, checkpoint_dir, run_id, "sssp", num_partitions)
    res = driver.run(init, step, max_supersteps=max_supersteps, tolerance=0.5,
                     resume=resume, checkpoint_every=checkpoint_every)
    e.unpersist()
    verts.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return res
