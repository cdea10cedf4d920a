"""k-truss decomposition (fixed k): iterative edge peeling under the
checkpointed superstep driver.

The k-truss is the maximal subgraph in which every EDGE participates in
at least k-2 triangles (its *support*); it is reached by repeatedly
deleting edges below that support (each deletion can break neighbors'
triangles, hence the iteration). The edge-level sibling of
:mod:`.kcore`: where k-core denoises tree-like fringe vertices, k-truss
keeps only cohesively-embedded edges — the standard community-core
primitive over link graphs.

Superstep shape — state is per EDGE, demonstrating that the driver's
checkpoint/resume/metrics contract is state-schema-agnostic:

    support(e)  = #triangles of the alive edge set containing e
                  (degree-oriented wedge join — triangle_count.triangle_list,
                  the skew-surviving formulation, re-run per superstep on
                  the shrinking survivor set)
    alive'(e)   = alive(e) AND support(e) >= k-2

Halts when no edge flips (L1 of the 0/1 change indicator < 0.5), at most
``max_supersteps`` synchronous peels — a DuckDB oracle therefore replays
it bit-exactly by unrolling the same number of rounds (idempotent past
the fixed point), the _kcore_oracle protocol.

Reference anchor: the reference has no truss/cohesion operator; this
extends its contact graph (``contactmatching/ContactMatchingComputation
.java`` candidate pairs) with the standard cohesion denoiser its
risk-propagation outputs would want at production scale.

``edges`` must be CANONICAL undirected (src < dst, one row per pair).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.skew import hub_vertices
from ..plans.superstep import SuperstepDriver, SuperstepResult, prepare_edges
from .triangle_count import release_cached, triangle_list


def k_truss(
    spark: SparkSession,
    edges: DataFrame,
    k: int,
    checkpoint_dir: str,
    run_id: str = "ktruss",
    max_supersteps: int = 30,
    num_partitions: int | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
    salt_threshold: int | None = None,
    salts: int = 16,
) -> SuperstepResult:
    """Returns state (src, dst, alive, delta); ``alive`` = 1 iff the edge
    survives in the k-truss. Triangle support is recomputed per superstep
    over the survivor set only, so each round's wedge join shrinks with
    the peeling front.

    ``salt_threshold`` extends the engine-wide skew hook (operators/skew)
    to the per-EDGE support count: an edge between two hubs can collect
    up to min(deg) triangle-support rows on one reducer. Edges whose BOTH
    endpoints exceed the degree threshold (computed once, on the initial
    edge set — degrees only shrink while peeling, so initial hubs ⊇
    later hubs and over-salting is merely harmless) count support in two
    levels: per (edge, salt-of-third-corner) partials, then a sum of at
    most ``salts`` rows per edge. COUNT decomposes as SUM of partials, so
    the result is bit-identical (test: salted ≡ unsalted)."""
    e, num_partitions = prepare_edges(
        spark, edges.select("src", "dst"), "src", num_partitions
    )

    hubs = None
    if salt_threshold is not None:
        und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        hubs = hub_vertices(und, salt_threshold, "in").persist()
        hubs.count()

    init = e.select(
        "src", "dst", F.lit(1).cast("int").alias("alive"), F.lit(1.0).alias("delta")
    )
    min_support = k - 2

    def step(state: DataFrame, _k: int) -> DataFrame:
        alive = state.where(F.col("alive") == 1).select("src", "dst")
        tri = triangle_list(alive)
        # each triangle supports its three edges; canonicalize the oriented
        # (degree-ordered) corners back to id order before counting. The
        # struct carries the third corner as the salt source.
        corners = tri.select(
            F.explode(
                F.array(
                    F.struct(F.least("a", "b").alias("s"), F.greatest("a", "b").alias("d"), F.col("c").alias("o")),
                    F.struct(F.least("a", "c").alias("s"), F.greatest("a", "c").alias("d"), F.col("b").alias("o")),
                    F.struct(F.least("b", "c").alias("s"), F.greatest("b", "c").alias("d"), F.col("a").alias("o")),
                )
            ).alias("e")
        ).select(F.col("e.s").alias("s"), F.col("e.d").alias("d"), F.col("e.o").alias("o"))
        if hubs is not None:
            hs = F.broadcast(hubs.select(F.col("vertex_id").alias("s")).withColumn("_hs", F.lit(True)))
            hd = F.broadcast(hubs.select(F.col("vertex_id").alias("d")).withColumn("_hd", F.lit(True)))
            tagged = corners.join(hs, "s", "left").join(hd, "d", "left").withColumn(
                "_salt",
                F.when(
                    F.col("_hs") & F.col("_hd"),
                    F.pmod(F.xxhash64(F.col("o")), F.lit(salts)),
                ).otherwise(F.lit(0)),
            )
            partial = tagged.groupBy("s", "d", "_salt").agg(
                F.count(F.lit(1)).alias("sup")
            )
            sup = partial.groupBy("s", "d").agg(F.sum("sup").alias("sup"))
        else:
            sup = corners.groupBy("s", "d").agg(F.count(F.lit(1)).alias("sup"))
        survives = (F.col("alive") == 1) & (F.coalesce("sup", F.lit(0)) >= min_support)
        new_alive = F.when(survives, 1).otherwise(0).cast("int")
        # shuffle_hash: per-edge support is O(E) — never broadcast a
        # side that grows with the graph (see connected_components.py)
        return state.join(
            sup.hint("shuffle_hash"), (state.src == sup.s) & (state.dst == sup.d), "left"
        ).select(
            state.src,
            state.dst,
            new_alive.alias("alive"),
            F.abs(new_alive - F.col("alive")).cast("double").alias("delta"),
        )

    driver = SuperstepDriver(spark, checkpoint_dir, run_id, f"ktruss{k}", num_partitions)
    res = driver.run(init, step, max_supersteps=max_supersteps, tolerance=0.5,
                     resume=resume, checkpoint_every=checkpoint_every)
    release_cached()
    e.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return res
