"""Connected components: iterative min-label propagation.

Same gather-scatter skeleton as PageRank (J1 join + A1-style aggregate)
with ``min`` in place of ``sum`` — labels are vertex ids, every vertex
starts labeled with itself, each superstep every vertex adopts
``min(own, min(neighbor labels))``. Deterministic by construction (min is
order- and tie-safe), which the north rule's "component ids exact"
requires. Converges in O(component diameter) supersteps; the checkpointed
driver halts when no label changes (L1 delta of the 0/1 change indicator
< 0.5). Messages come from the ACTIVE FRONTIER only (vertices whose label
changed last superstep — the I3 voteToHalt/re-activation analog): a min
label can only improve through a neighbor that itself improved, so
non-frontier senders are provably redundant and the join shrinks
geometrically as components settle.

Edges must be directed both ways (``operators.edges.undirect``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..plans.superstep import SuperstepDriver, SuperstepResult


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    checkpoint_dir: str,
    run_id: str = "cc",
    max_supersteps: int = 50,
    num_partitions: int | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
) -> SuperstepResult:
    """Returns state (vertex_id, comp, delta); comp = min vertex id in the
    component (exact, deterministic)."""
    num_partitions = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst").repartition(num_partitions, "src").persist()
    verts = vertices.select("vertex_id").persist()
    e.count()

    init = verts.select("vertex_id", F.col("vertex_id").alias("comp"), F.lit(1.0).alias("delta"))

    def step(state: DataFrame, k: int) -> DataFrame:
        # I3 frontier (voteToHalt analog, FactorVertexComputation.java:86):
        # only vertices whose label changed last superstep send — a min-label
        # can only improve via a neighbor that itself improved. The frontier
        # collapses geometrically, so late supersteps join a small fraction
        # of V instead of all of it.
        frontier = state.where(F.col("delta") > 0.5)
        inc = (
            e.join(frontier, e.src == frontier.vertex_id)
            .groupBy(e.dst.alias("mdst"))
            .agg(F.min("comp").alias("min_nbr"))
        )
        new_comp = F.least("comp", F.coalesce("min_nbr", "comp"))
        return state.join(inc, state.vertex_id == F.col("mdst"), "left").select(
            "vertex_id",
            new_comp.alias("comp"),
            F.when(new_comp != F.col("comp"), 1.0).otherwise(0.0).alias("delta"),
        )

    driver = SuperstepDriver(spark, checkpoint_dir, run_id, "connected_components", num_partitions)
    res = driver.run(init, step, max_supersteps=max_supersteps, tolerance=0.5, resume=resume, checkpoint_every=checkpoint_every)
    e.unpersist()
    verts.unpersist()
    return res
