"""Risk propagation — the reference's belief-propagation semantics,
re-expressed as DataFrame transforms (the fidelity anchor).

Reference kernel, per BP iteration (= Giraph's even+odd superstep pair,
``compute/MasterComputer.java:31-37``, fused into one step here):

variable half (``compute/VariableVertexComputation.java``):
  - F5  a variable u sends to factor {u,v} its scores EXCLUDING those that
        originated at v (`:128-138`, no echo),
factor half (``compute/FactorVertexComputation.java``):
  - F3  the factor keeps only scores with update_time < the contact's
        latest occurrence time (`:99-120` — no post-contact information),
  - F4  empty message sets are dropped (`:107`),
  - A1  it relays the max surviving score under the RiskScore natural
        order (update_time, value, id) (`:140-158`) to the other endpoint,
        scaled by a deterministic ``transmission_rate`` — replacing the
        reference's stochastic gate (`:160-163`; note its probability
        inversion bug, BPContext.java:11) with an injected damping so runs
        are reproducible,
variable update:
  - A2  u unions incoming scores into its set, dedup by
        (update_time, value, origin) (`:86-106`),
  - A3  per-vertex delta = |max(incoming).value - max(local).value|
        (`:112-117`); vertices with no incoming have delta 0 (the
        reference injects a 0.0 default score instead, A1 defaults at
        `:56-58` — divergence documented AND proven output-neutral:
        tests/test_risk_propagation.py::
        test_no_incoming_default_divergence_is_output_neutral replays the
        default-injecting variant side-by-side on both no-incoming shapes
        — an isolated vertex and a late-score-only neighbor — and the
        final max matches the engine's exactly).

Convergence: sum of deltas < 1e-5 or 5 iterations
(``MasterComputer.java:24``, ``BPContext.java:13``) via the checkpointed
SuperstepDriver.

Score struct field order is (update_time, value, origin_id) so Spark's
lexicographic struct comparison IS the RiskScore natural order
(``score/AbstractRiskScore.java:57-67``) — array_max/max on the struct
replace Collections.max.

State: ``(vertex_id string, scores array<struct<update_time timestamp,
value double, origin_id string>>, delta double)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..plans.superstep import (
    DEFAULT_MAX_SUPERSTEPS,
    DEFAULT_TOLERANCE,
    SuperstepDriver,
    SuperstepResult,
    prepare_edges,
)


def _directed_contact_edges(contacts: DataFrame) -> DataFrame:
    """contacts(src,dst,occurrences) → both directions with the F3 cutoff:
    (u, v, cutoff_ts = max occurrence time of the contact)."""
    base = contacts.select(
        "src", "dst", F.array_max("occurrences.time").alias("cutoff_ts")
    )
    return base.select(F.col("src").alias("u"), F.col("dst").alias("v"), "cutoff_ts").unionByName(
        base.select(F.col("dst").alias("u"), F.col("src").alias("v"), "cutoff_ts")
    )


def init_state(scores: DataFrame) -> DataFrame:
    """scores(id, update_time, value) → initial per-vertex state. The
    initial origin of every score is its owner (the reference's
    SendableRiskScores sender == score id at load,
    ``format/input/FactorGraphVertexInputFormat.java:60-79``)."""
    return scores.groupBy(F.col("id").alias("vertex_id")).agg(
        F.array_sort(
            F.collect_set(
                F.struct(
                    F.col("update_time"),
                    F.col("value"),
                    F.col("id").alias("origin_id"),
                )
            )
        ).alias("scores"),
        F.lit(1.0).alias("delta"),
    )


def risk_propagation(
    spark: SparkSession,
    contacts: DataFrame,
    scores: DataFrame,
    checkpoint_dir: str,
    run_id: str = "rp",
    transmission_rate: float = 1.0,
    max_supersteps: int = DEFAULT_MAX_SUPERSTEPS,
    tolerance: float = DEFAULT_TOLERANCE,
    num_partitions: int | None = None,
    resume: bool = True,
    checkpoint_every: int = 1,
) -> SuperstepResult:
    edges, num_partitions = prepare_edges(
        spark, _directed_contact_edges(contacts), "u", num_partitions
    )

    def step(state: DataFrame, k: int) -> DataFrame:
        ex = state.select("vertex_id", F.explode("scores").alias("s"))
        # variable→factor scatter (J1) with F5 no-echo + F3 recency, then
        # A1 max-relay to the other endpoint (J2). max(struct) = natural order.
        relayed = (
            # shuffle_hash on BOTH sides: the exploded score-set side is
            # O(V·scores) and edges O(E) — neither is broadcast-safe and
            # either may be the larger one, so hint both and let the
            # planner build the hash map on the smaller relation
            ex.hint("shuffle_hash")
            .join(edges.hint("shuffle_hash"), ex.vertex_id == edges.u)
            .where(
                (F.col("s.origin_id") != F.col("v"))
                & (F.col("s.update_time") < F.col("cutoff_ts"))
            )
            .groupBy("u", "v")
            .agg(F.max("s").alias("m"))
            .select(
                F.col("v").alias("vertex_id"),
                F.struct(
                    F.col("m.update_time").alias("update_time"),
                    (F.col("m.value") * transmission_rate).alias("value"),
                    F.col("m.origin_id").alias("origin_id"),
                ).alias("msg"),
            )
        )
        inc = relayed.groupBy("vertex_id").agg(
            F.array_sort(F.collect_set("msg")).alias("incoming"),
            F.max("msg").alias("max_incoming"),
        )
        return (
            state.join(inc.hint("shuffle_hash"), "vertex_id", "left")
            .select(
                "vertex_id",
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            "scores",
                            F.coalesce("incoming", F.array().cast("array<struct<update_time:timestamp,value:double,origin_id:string>>")),
                        )
                    )
                ).alias("scores"),
                F.when(
                    F.col("max_incoming").isNotNull(),
                    F.abs(F.col("max_incoming.value") - F.array_max("scores")["value"]),
                )
                .otherwise(F.lit(0.0))
                .alias("delta"),
            )
        )

    driver = SuperstepDriver(spark, checkpoint_dir, run_id, "risk_propagation", num_partitions)
    res = driver.run(
        init_state(scores), step,
        max_supersteps=max_supersteps, tolerance=tolerance, resume=resume,
        checkpoint_every=checkpoint_every,
    )
    edges.unpersist()
    return res


def final_scores(state: DataFrame) -> DataFrame:
    """The S2/W1 output sink analog: one row per vertex, the max score
    under the OUTPUT comparator (value, update_time, id) —
    ``format/output/FactorGraphVertexOutputFormat.java:29-32,51-56`` (note
    it differs from the natural order used in-flight).
    Returns (vertex_id, value, update_time)."""
    ex = state.select("vertex_id", F.explode("scores").alias("s"))
    top = ex.groupBy("vertex_id").agg(
        F.max_by(
            "s", F.struct(F.col("s.value"), F.col("s.update_time"), F.col("s.origin_id"))
        ).alias("top")
    )
    return top.select(
        "vertex_id", F.col("top.value").alias("value"), F.col("top.update_time").alias("update_time")
    )
