"""Scalar / array function surface (SURVEY.md §2.8, §2.2 F3-F5, §2.4 A1).

The reference's scalar vocabulary is tiny and these are its members,
re-expressed as reusable Column builders over built-in
``pyspark.sql.functions`` (JVM-side, codegen-friendly — never Python UDFs):

- geohash coarsening (``pda-read/.../ReadRequestWorker.java:198-201``)
- epoch-milli <-> timestamp (``format/writable/FactorVertexValue.java:56-58,70-71``)
- Duration.between + threshold (``contactmatching/ContactMatchingComputation.java:163-170``)
- superstep phase parity Math.floorMod (``compute/MasterComputer.java:35-37``)
- RiskScore natural order (updateTime, value, id) and Collections.max
  under it (``score/AbstractRiskScore.java:57-67``,
  ``compute/FactorVertexComputation.java:140-158``)
- the transmission gate (``FactorVertexComputation.java:160-163``,
  constant ``param/BPContext.java:11``): the reference draws
  ``nextDouble`` per message — nondeterministic, and the comparison is
  inverted so it transmits with p≈0.3 instead of the intended 0.7. Ours
  is a pure function of a key column: keep iff ``pmod(key, 10) < rate*10``
  — reproducible, and the rate means what it says.
- F3 recency filter / F4 empty-drop / F5 sender exclusion as higher-order
  array functions (``FactorVertexComputation.java:99-120``,
  ``VariableVertexComputation.java:128-138``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def coarsen(col, drop: int = 3) -> Column:
    """P1: drop the last ``drop`` chars (privacy coarsening)."""
    c = _c(col)
    return c.substr(F.lit(1), F.greatest(F.length(c) - drop, F.lit(0)))


def epoch_millis(ts) -> Column:
    """Timestamp → epoch millis (FactorVertexValue write path)."""
    return F.unix_millis(_c(ts).cast("timestamp"))


def from_epoch_millis(ms) -> Column:
    """Epoch millis → timestamp (FactorVertexValue read path)."""
    return F.timestamp_millis(_c(ms).cast("long"))


def duration_between_s(start, end) -> Column:
    """Duration.between in whole seconds."""
    return _c(end).cast("timestamp").cast("long") - _c(start).cast("timestamp").cast("long")


def superstep_phase(superstep) -> Column:
    """Math.floorMod(superstep, 2): 0 = variable half-step, 1 = factor."""
    return F.pmod(_c(superstep), F.lit(2))


def score_order(update_time, value, id_col) -> Column:
    """RiskScore natural-order sort key: (updateTime, value, id). Struct
    comparison in Spark is lexicographic by field position, which matches
    the reference comparator chain exactly."""
    return F.struct(_c(update_time).alias("update_time"),
                    _c(value).alias("value"), _c(id_col).alias("id"))


def max_score(update_time, value, id_col) -> Column:
    """A1 Collections.max under the natural order — aggregate Column."""
    return F.max(score_order(update_time, value, id_col))


def transmission_gate(value, key, rate: float = 0.7, buckets: int = 10) -> Column:
    """Deterministic transmission gate: ``value`` iff the key's bucket is
    below ``rate``, else 0.0. Replaces the reference's per-message RNG with
    a pure function of ``key`` (reproducibility; and fixes the inverted
    comparison noted in the module docstring)."""
    keep = F.pmod(_c(key).cast("long"), F.lit(buckets)) < int(rate * buckets)
    return F.when(keep, _c(value)).otherwise(F.lit(0.0))


def recency_filter(scores, cutoff) -> Column:
    """F3: retain array elements (structs with a ``ts`` field) strictly
    older than ``cutoff`` — no post-contact information may flow."""
    cut = _c(cutoff)
    return F.filter(_c(scores), lambda s: s["ts"] < cut)


def sender_exclusion(scores, sender_id) -> Column:
    """F5: drop array elements whose ``id`` equals the receiver (no echo)."""
    sid = _c(sender_id)
    return F.filter(_c(scores), lambda s: s["id"] != sid)


def drop_if_empty(df, array_col: str):
    """F4: drop rows whose message array filtered down to empty."""
    return df.where(F.size(array_col) > 0)
