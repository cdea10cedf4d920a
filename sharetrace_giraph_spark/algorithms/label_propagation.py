"""Label propagation (community detection), synchronous + deterministic.

Each superstep every vertex adopts the **mode** of its neighbors' labels
with a deterministic (count desc, label asc) tie-break — SURVEY §7's
requirement for exact-match reproducibility (the classic async/randomized
LPA is not reproducible and is therefore not what we build). The neighbor
mode is a two-stage aggregate: ``groupBy(dst, label).count`` then
``max_by(label, (count, -label))`` — both Catalyst hash aggs with map-side
partial combine, no window needed.

Synchronous LPA can two-cycle on bipartite structures; the driver's
superstep cap bounds that, and the change-count delta reports
non-convergence honestly instead of spinning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..plans.superstep import SuperstepDriver, SuperstepResult, prepare_edges


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    checkpoint_dir: str,
    run_id: str = "lpa",
    max_supersteps: int = 5,
    num_partitions: int | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
    salt_threshold: int | None = None,
    salts: int = 16,
    weight_col: str | None = None,
) -> SuperstepResult:
    """Returns state (vertex_id, label, delta). Labels init to vertex_id.

    ``salt_threshold`` mirrors ``pagerank(salt_threshold=...)``: a hub
    dst whose neighbors share one label makes the (dst, label) count key
    hot; two-level salting counts per (dst, label, salt) first, then sums
    the partials — count is decomposable, results identical.

    ``weight_col``: optional edge-weight column — each neighbor's vote
    counts its weight instead of 1 (weighted-mode adoption). Prefer
    INTEGER weights: the label argmax compares vote sums, and float sums
    are summation-order-sensitive, which would make near-ties
    nondeterministic; integer sums are exact."""
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    e, num_partitions = prepare_edges(
        spark, edges.select(*cols), "src", num_partitions
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
        from ..operators.skew import hub_vertices

        hubs = hub_vertices(e, salt_threshold, "in").persist()
        hubs.count()

    init = verts.select("vertex_id", F.col("vertex_id").alias("label"), F.lit(1.0).alias("delta"))

    vote = F.col(weight_col) if weight_col else F.lit(1)

    def step(state: DataFrame, k: int) -> DataFrame:
        # shuffle_hash: the state is O(V) — never broadcast a side that
        # grows with the graph (see connected_components.py)
        msgs = e.join(state.hint("shuffle_hash"), e.src == state.vertex_id).select(
            e.dst.alias("mdst"), F.col("label").alias("nbr_label"),
            vote.alias("_vote"),
        )
        if hubs is not None:
            salted = msgs.join(
                F.broadcast(hubs.withColumn("_is_hub", F.lit(True))),
                msgs.mdst == hubs.vertex_id,
                "left",
            ).withColumn(
                "_salt",
                F.when(
                    F.col("_is_hub"),
                    F.pmod(F.monotonically_increasing_id(), F.lit(salts)),
                ).otherwise(F.lit(0)),
            )
            partial = salted.groupBy("mdst", "nbr_label", "_salt").agg(
                F.sum("_vote").alias("cnt")
            )
            label_counts = partial.groupBy("mdst", "nbr_label").agg(
                F.sum("cnt").alias("cnt")
            )
        else:
            label_counts = msgs.groupBy("mdst", "nbr_label").agg(
                F.sum("_vote").alias("cnt")
            )
        # mode with (count desc, label asc) tie-break: max_by over (cnt, -label)
        mode = label_counts.groupBy("mdst").agg(
            F.max_by("nbr_label", F.struct(F.col("cnt"), (-F.col("nbr_label")).alias("neg"))).alias("mode_label")
        )
        new_label = F.coalesce("mode_label", "label")
        return state.join(mode.hint("shuffle_hash"), state.vertex_id == F.col("mdst"), "left").select(
            "vertex_id",
            new_label.alias("label"),
            F.when(new_label != F.col("label"), 1.0).otherwise(0.0).alias("delta"),
        )

    driver = SuperstepDriver(spark, checkpoint_dir, run_id, "label_propagation", num_partitions)
    res = driver.run(init, step, max_supersteps=max_supersteps, tolerance=0.5, resume=resume, checkpoint_every=checkpoint_every)
    e.unpersist()
    verts.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return res
