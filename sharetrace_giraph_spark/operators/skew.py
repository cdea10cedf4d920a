"""Explicit hub-vertex skew handling (north-rule requirement).

The reference's only balance mechanism is round-robin payload chopping at
PARTITION_SIZE=50 (``pda-common/.../ContractedPdaVentilator.java:101-117``)
— irrelevant to shuffle skew. In a power-law contact graph the hub
vertices' in-edges all hash to one reducer; Spark's map-side partial
aggregation absorbs most of it, and AQE skew-join splits oversized join
partitions, but the canonical belt-and-braces is **salted two-level
aggregation**: spread each hub key over ``salts`` sub-keys, partially
aggregate per (key, salt), then finish per key. rows-per-reducer drops from
deg(hub) to deg(hub)/salts at the cost of one extra (tiny) shuffle over
the pre-aggregated rows.

When to turn it on (measured tradeoff, see BENCH.md): partial aggregation
already caps a hub reducer's input at (#map partitions) rows, so on
local[32] salting only adds a join and a shuffle (~3x slower per
superstep at 4M edges). It pays on real clusters where #map partitions is
in the thousands AND partial aggregation is ineffective (very wide
partial-agg key space forcing hash-map fallback), or for aggregates that
don't combine map-side. The engine exposes it per-run
(``pagerank(salt_threshold=...)``) rather than defaulting it on.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def degree_census(edges: DataFrame, direction: str = "in") -> DataFrame:
    """Per-vertex degree: ``(vertex_id, degree)``. ``edges`` is directed."""
    key = "dst" if direction == "in" else "src"
    return edges.groupBy(F.col(key).alias("vertex_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def hub_vertices(edges: DataFrame, threshold: int, direction: str = "in") -> DataFrame:
    """Vertices with degree > threshold — the salting candidates. Small by
    construction (power-law tail), safe to broadcast."""
    return degree_census(edges, direction).where(F.col("degree") > threshold).select("vertex_id")


#: decomposable aggregates safe for two-level salting (level-2 re-applies
#: the same function over the level-1 partials)
_SALTABLE = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    messages: DataFrame,
    key: str,
    value: str,
    hubs: DataFrame,
    agg: str = "sum",
    salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-level decomposable aggregate (sum/min/max) of ``value`` by
    ``key`` with hub keys salted.

    ``messages`` rows whose ``key`` appears in ``hubs`` (broadcast) get a
    salt derived from ``salt_source`` (any well-distributed column, e.g.
    the message's src vertex); non-hub rows keep salt 0. Level 1 aggregates
    by (key, salt) — hub fan-in split across ``salts`` reducers; level 2
    finishes by key over at most ``salts`` rows per hub.

    Returns ``(key, value)`` with the same column names.
    """
    fn = _SALTABLE[agg]
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salts))
        if salt_source
        else F.pmod(F.monotonically_increasing_id(), F.lit(salts))
    )
    tagged = messages.join(
        F.broadcast(hubs.withColumn("_is_hub", F.lit(True))),
        messages[key] == hubs["vertex_id"],
        "left",
    ).withColumn("_salt", F.when(F.col("_is_hub"), salt_col).otherwise(F.lit(0)))
    partial = tagged.groupBy(F.col(key), F.col("_salt")).agg(fn(value).alias(value))
    return partial.groupBy(key).agg(fn(value).alias(value))


def salted_sum(
    messages: DataFrame,
    key: str,
    value: str,
    hubs: DataFrame,
    salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-level SUM — see :func:`salted_agg`."""
    return salted_agg(messages, key, value, hubs, "sum", salts, salt_source)


def salted_min(
    messages: DataFrame,
    key: str,
    value: str,
    hubs: DataFrame,
    salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-level MIN — see :func:`salted_agg` (min is decomposable:
    min(min(parts)) == min(all), so salting never changes the result)."""
    return salted_agg(messages, key, value, hubs, "min", salts, salt_source)


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One-row degree-mixing statistic over an UNDIRECTED edge list given
    as its both-ways union (every {u,v} present as BOTH (u,v) and (v,u) —
    ``operators.edges.undirect`` output): Pearson correlation of
    (deg(src), deg(dst)) across directed rows — Newman's assortativity
    coefficient, the standard "do hubs link to hubs?" skew diagnostic
    that informs the salting threshold.

    CONTRACT: both-ways input only. The census counts out-degree, which
    equals the undirected degree exactly when every edge appears in both
    directions; on a one-way directed list, sink vertices (out-degree 0)
    would be silently dropped by the inner joins and ``dy`` would need
    in-degree for the standard directed coefficient — use a dedicated
    directed variant for that, not this function.

    Two degree joins + one global aggregate. All moment sums are exact
    BIGINT arithmetic over integer degrees; the only float ops are the
    final correlation expression, written in a fixed order so an oracle
    replaying it gets bit-identical doubles. Returns
    (n_edges, n_vertices, avg_deg, assortativity); assortativity is null
    when degrees are constant (zero variance).
    """
    deg = degree_census(edges, "out")
    x = deg.select(F.col("vertex_id").alias("src"), F.col("degree").alias("dx"))
    y = deg.select(F.col("vertex_id").alias("dy_id"), F.col("degree").alias("dy"))
    pairs = edges.join(x, "src").join(y, edges.dst == F.col("dy_id"))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = (n * F.col("sxy") - sx * sy).cast("double")
    vx = (n * F.col("sxx") - sx * sx).cast("double")
    vy = (n * F.col("syy") - sy * sy).cast("double")
    nv = deg.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    return agg.crossJoin(F.broadcast(nv)).select(
        n.cast("long").alias("n_edges"),
        "n_vertices",
        F.round(n.cast("double") / F.col("n_vertices"), 6).alias("avg_deg"),
        F.round(
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), 6
        ).alias("assortativity"),
    )
