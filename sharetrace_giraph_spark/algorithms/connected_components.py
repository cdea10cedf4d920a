"""Connected components: iterative min-label propagation, two methods.

``method="frontier"`` (default): same gather-scatter skeleton as PageRank
(J1 join + A1-style aggregate) with ``min`` in place of ``sum`` — labels
are vertex ids, every vertex starts labeled with itself, each superstep
every vertex adopts ``min(own, min(neighbor labels))``. Deterministic by
construction (min is order- and tie-safe), which the north rule's
"component ids exact" requires. Converges in O(component diameter)
supersteps; the checkpointed driver halts when no label changes (L1 delta
of the 0/1 change indicator < 0.5). Messages come from the ACTIVE
FRONTIER only (vertices whose label changed last superstep — the I3
voteToHalt/re-activation analog): a min label can only improve through a
neighbor that itself improved, so non-frontier senders are provably
redundant and the join shrinks geometrically as components settle.

``method="doubling"``: min-label + POINTER JUMPING (the large-star /
small-star family, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): each superstep additionally shortcuts
``comp ← comp(comp)`` via a state⋈state join on the label, so known-min
information propagates 2^k hops in k supersteps — O(log V) supersteps on
high-diameter graphs (a path of V vertices needs V-1 frontier supersteps
but only ~log2 V doubling ones) at the cost of one extra join per
superstep. Same labels, same determinism; pick per graph shape. The
frontier optimization is unsound here (a settled vertex's comp can still
shortcut), so every vertex participates each superstep.

``salt_threshold`` mirrors ``pagerank(salt_threshold=...)``: per-dst
neighbor-min aggregation over hub fan-in is split via two-level salted
min (``operators/skew.salted_min`` — min is decomposable, results
identical).

Edges must be directed both ways (``operators.edges.undirect``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.skew import hub_vertices, salted_min
from ..plans.superstep import SuperstepDriver, SuperstepResult, prepare_edges


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
    method: str = "frontier",
    salt_threshold: int | None = None,
    salts: int = 16,
) -> SuperstepResult:
    """Returns state (vertex_id, comp, delta); comp = min vertex id in the
    component (exact, deterministic, identical across both methods)."""
    if method not in ("frontier", "doubling"):
        raise ValueError(f"unknown method {method!r}")
    e, num_partitions = prepare_edges(
        spark, edges.select("src", "dst"), "src", num_partitions
    )
    # materialize the vertex universe BEFORE the loop, hash-partitioned
    # at the iteration width (parity with pagerank._prepare): the init
    # state enters superstep 0 already co-partitioned on vertex_id, and
    # a possibly-expensive vertex derivation (e.g. a distinct over the
    # edge table) is paid once here instead of riding superstep 0's
    # critical path twice (both state references)
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

    init = verts.select("vertex_id", F.col("vertex_id").alias("comp"), F.lit(1.0).alias("delta"))

    def neighbor_min(senders: DataFrame) -> DataFrame:
        # shuffle_hash hint: the senders side is the (filtered) frontier —
        # O(V) rows. Catalyst's static size estimate routinely puts it
        # under the broadcast threshold, but broadcasting a frontier is
        # wrong at scale (it grows with the graph) and measurably harmful
        # here: at 80M edges the per-superstep ~2M-row broadcast churns
        # the driver/executor heap until non-durable supersteps stall at
        # 3-8x their clean wall (BENCH.md round-3 analysis). The edge side
        # is already hash-partitioned on src, so SHJ is exchange-reusing.
        msgs = e.join(senders.hint("shuffle_hash"), e.src == senders.vertex_id).select(
            e.dst.alias("mdst"), F.col("comp")
        )
        if hubs is not None:
            return salted_min(
                msgs.select(F.col("mdst").alias("dst"), F.col("comp").alias("min_nbr")),
                key="dst", value="min_nbr", hubs=hubs, salts=salts,
                salt_source=None,
            ).select(F.col("dst").alias("mdst"), "min_nbr")
        return msgs.groupBy("mdst").agg(F.min("comp").alias("min_nbr"))

    def step_frontier(state: DataFrame, k: int) -> DataFrame:
        # I3 frontier (voteToHalt analog, FactorVertexComputation.java:86):
        # only vertices whose label changed last superstep send — a min-label
        # can only improve via a neighbor that itself improved. The frontier
        # collapses geometrically, so late supersteps join a small fraction
        # of V instead of all of it.
        inc = neighbor_min(state.where(F.col("delta") > 0.5))
        new_comp = F.least("comp", F.coalesce("min_nbr", "comp"))
        return state.join(inc.hint("shuffle_hash"), state.vertex_id == F.col("mdst"), "left").select(
            "vertex_id",
            new_comp.alias("comp"),
            F.when(new_comp != F.col("comp"), 1.0).otherwise(0.0).alias("delta"),
        )

    def step_doubling(state: DataFrame, k: int) -> DataFrame:
        inc = neighbor_min(state)
        # pointer jump: my label's own current label (comp is always a live
        # vertex id, so the lookup join always matches; left join for safety)
        ptr = state.select(F.col("vertex_id").alias("p_id"), F.col("comp").alias("p_comp"))
        joined = (
            state.join(inc.hint("shuffle_hash"), state.vertex_id == F.col("mdst"), "left")
            .join(ptr.hint("shuffle_hash"), F.col("comp") == F.col("p_id"), "left")
        )
        new_comp = F.least(
            "comp", F.coalesce("min_nbr", "comp"), F.coalesce("p_comp", "comp")
        )
        return joined.select(
            "vertex_id",
            new_comp.alias("comp"),
            F.when(new_comp != F.col("comp"), 1.0).otherwise(0.0).alias("delta"),
        )

    step = step_frontier if method == "frontier" else step_doubling
    driver = SuperstepDriver(spark, checkpoint_dir, run_id, "connected_components", num_partitions)
    res = driver.run(init, step, max_supersteps=max_supersteps, tolerance=0.5, resume=resume, checkpoint_every=checkpoint_every)
    e.unpersist()
    verts.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return res
