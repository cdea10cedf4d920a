"""Triangle counting — non-iterative, degree-oriented wedge join.

Classic distributed formulation (the only one that survives power-law
skew): orient every undirected edge from the (degree, id)-smaller endpoint
to the larger, so each vertex's *oriented* out-degree is O(sqrt(E)); then
triangles = wedges (oriented ⋈ oriented on the apex) semi-joined against
the oriented edge set. The naive per-vertex neighborhood-intersection the
reference's all-pairs style would suggest explodes on hubs; orientation
caps the wedge count, and the closing-edge check is a broadcast-able/SMJ
equi join Catalyst plans from stats.

Returns both the global count and per-vertex triangle counts (vertices in
no triangle get 0), matching FIXTURES.md §2's expected values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def triangles(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame,
    num_partitions: int | None = None,
) -> tuple[int, DataFrame]:
    """``edges``: canonical undirected (src < dst, one row per pair).

    Returns (global_triangle_count, per_vertex DataFrame(vertex_id, n_triangles)).
    """
    e = edges.select("src", "dst").distinct()

    # total degree per vertex (undirected)
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # orientation order = lexicographic (deg, id) compared directly as a
    # struct — no global rank/sort needed (a row_number() OVER (ORDER BY ...)
    # here would funnel all V rows through one task)
    er = (
        e.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("src_deg")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dst_deg")), "dst")
    )
    src_lt = F.struct(F.col("src_deg"), F.col("src")) < F.struct(F.col("dst_deg"), F.col("dst"))
    oriented = er.select(
        F.when(src_lt, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_lt, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(src_lt, F.col("dst_deg")).otherwise(F.col("src_deg")).alias("hi_deg"),
    ).persist()

    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.lo") == F.col("e2.lo"))
        & (
            F.struct(F.col("e1.hi_deg"), F.col("e1.hi"))
            < F.struct(F.col("e2.hi_deg"), F.col("e2.hi"))
        ),
    ).select(
        F.col("e1.lo").alias("a"), F.col("e1.hi").alias("b"), F.col("e2.hi").alias("c")
    )

    closing = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["b", "c"], "inner").persist()

    total = tri.count()

    per_vertex = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("vertex_id"))
        .groupBy("vertex_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    per_vertex = (
        vertices.select("vertex_id")
        .join(per_vertex, "vertex_id", "left")
        .select("vertex_id", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"))
    )
    return total, per_vertex
