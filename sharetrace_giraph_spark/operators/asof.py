"""As-of (nearest-prior) join — a time-series operator Spark's built-in
join surface lacks, expressed as a composition of existing DataFrame ops
(union + single keyed window), NOT a row-at-a-time UDF or a range
cross-join.

For each left ("probe") row, find the latest right ("quote") row of the
same key whose timestamp is at-or-before the probe's. The naive spelling
is a non-equi range join (``l.key = r.key AND r.ts <= l.ts`` + top-1),
which Catalyst executes as a per-key cartesian — quadratic in rows per
key. The scale shape used here:

1. tag both inputs and union them on (key, ts)       — no join at all
2. one window ``partitionBy(key).orderBy(ts, side)`` with
   ``last(value, ignorenulls=True)`` carrying the most recent quote
   forward past each probe                            — exactly 1 shuffle
   on the key, linear work, AQE-coalesced
3. keep the probe rows                                — the joined result

Ordering rules make the result a pure function of the input: at equal
(key, ts) quotes sort BEFORE probes (inclusive as-of, ``r.ts <= l.ts``),
and duplicate quotes at the same (key, ts) are pre-reduced with ``max``
over the value struct, so "the" latest quote is well defined.

The same pattern is the standard streaming-ETL "enrich fact with latest
dimension state" primitive; the reference engine's W2 latest-occurrence
lookup (``compute/FactorVertexComputation.java``) is its per-vertex
special case.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Inclusive backward as-of join.

    Returns ``left``'s columns plus, for each ``c`` in ``value_cols``, a
    ``{prefix}{c}`` column holding the matched quote's value (null when
    the key has no quote at-or-before the probe time), plus
    ``{prefix}ts`` with the matched quote's timestamp.

    The internal union/window plumbing reserves the column names ``_ts``,
    ``_quote``, ``_side``, ``_q``, ``_qts``, ``_qv``, ``_m``; inputs that
    already contain one are rejected (ValueError) rather than silently
    corrupted.
    """
    keys = [on] if isinstance(on, str) else list(on)
    vals = list(value_cols)

    reserved = {"_ts", "_quote", "_side", "_q", "_qts", "_qv", "_m"}
    for side, df in (("left", left), ("right", right)):
        clash = reserved.intersection(df.columns)
        if clash:
            raise ValueError(
                f"asof_join: {side} frame uses reserved internal column "
                f"name(s) {sorted(clash)}; rename them before joining"
            )

    # one quote per (key, ts): max over the value struct — deterministic
    # regardless of input order/partitioning
    q = (
        right.groupBy(*keys, F.col(right_ts).alias("_ts"))
        .agg(F.max(F.struct(*vals)).alias("_q"))
        .select(*keys, "_ts", F.struct(F.col("_ts").alias("_qts"), F.col("_q").alias("_qv")).alias("_quote"))
        .withColumn("_side", F.lit(0))
    )
    p = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(q.schema["_quote"].dataType).alias("_quote"),
        F.lit(1).alias("_side"),
    )
    # quotes carry only key/_ts/_quote/_side; probes carry the full left row
    q_full = q.select(
        *[
            F.col(c) if c in (*keys, "_ts", "_quote", "_side")
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in p.columns
        ]
    )
    u = p.unionByName(q_full)

    # quotes (side 0) sort before probes (side 1) at equal ts → inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_quote", ignorenulls=True).over(w)
    out_cols = [c for c in left.columns]
    return (
        u.withColumn("_m", carried)
        .where(F.col("_side") == 1)
        .select(
            *out_cols,
            F.col("_m._qts").alias(f"{prefix}ts"),
            *[F.col(f"_m._qv.{c}").alias(f"{prefix}{c}") for c in vals],
        )
    )
