"""Structured Streaming operators: watermarked windowed aggregation and a
custom stateful sessionizer (``applyInPandasWithState``).

The reference has no streaming at all (its "streaming" is scheduled
re-ingestion — SURVEY §2.9); ``stream_ingest.py`` covers that shape. This
module adds the two genuinely-streaming operator families a production
deployment of this engine needs:

- :func:`windowed_turn_counts` — event-time tumbling-window aggregation
  with a watermark: per (window, role) turn counts that tolerate
  out-of-order arrival up to the watermark delay. In append mode a window
  is emitted exactly once, when the watermark passes its end — so with a
  finite drain the trailing windows (those the watermark never passed)
  are intentionally withheld; the equivalence test asserts exactly that
  boundary.
- :func:`stateful_sessionize` — the engine's gaps-and-islands
  sessionizer (operators/edges.sessionize, W4) re-expressed as an
  explicitly-stateful streaming operator via ``applyInPandasWithState``:
  per conv_id the state carries (last_ts, next_session_id) across
  micro-batches, so a conversation's session numbering continues
  seamlessly as new turns stream in. With in-order arrival per
  conversation it is bit-equal to the batch sessionizer (tested by
  draining the same data in two time-ordered chunks).

Both run on the file source with ``trigger(availableNow=True)`` in tests
(drain-then-stop); swapping the trigger/source turns them continuous
without touching the operator code.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..datagen import TRANSCRIPTS_SCHEMA


def windowed_counts(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark_delay: str | None = None,
    count_name: str = "n",
) -> DataFrame:
    """Event-time tumbling-window counts per (window, ``key_col``).

    With a ``watermark_delay`` it runs in append mode (a window emits once,
    when the watermark passes its end — late data tolerated up to the
    delay). Without one it is the complete-mode shape: every window is live
    until the sink snapshots it, which on a finite drain
    (``trigger(availableNow=True)``) makes the result bit-equal to the
    batch ``GROUP BY`` — the property the driver oracle checks.
    """
    src = stream.withWatermark(ts_col, watermark_delay) if watermark_delay else stream
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias(count_name))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            count_name,
        )
    )


def windowed_turn_counts(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling windows over a transcripts stream: per
    (window, role) turn count, late data tolerated up to the watermark."""
    return windowed_counts(
        stream, "role", "ts", window_duration, watermark_delay, "n_turns"
    )


#: output of the stateful sessionizer
SESSION_OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, ts timestamp, session_id long"
)
#: carried state per conv_id: epoch-seconds of the last seen turn and the
#: session counter to assign next when the gap rule fires
SESSION_STATE_SCHEMA = "last_ts long, next_sid long"


def _session_kernel(session_gap_s: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            last_ts, next_sid = state.get
        else:
            last_ts, next_sid = None, 0
        # concat the group's Arrow chunks BEFORE sorting: within one
        # micro-batch the chunk order follows shuffle order, not event
        # time, so per-chunk sorting would be order-dependent once a
        # conversation spans multiple record batches. Memory is bounded
        # by turns-per-conversation-per-micro-batch.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="stable")
            epochs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
            sids = []
            for ep in epochs:
                if last_ts is not None and ep - last_ts > session_gap_s:
                    next_sid += 1
                sids.append(next_sid)
                last_ts = ep
            out = pdf[["conv_id", "turn_idx", "role", "ts"]].copy()
            out["session_id"] = sids
            yield out
        state.update((last_ts if last_ts is not None else 0, next_sid))

    return fn


def stateful_sessionize(stream: DataFrame, session_gap_s: int = 30 * 60) -> DataFrame:
    """W4 sessionization as an explicitly-stateful streaming operator:
    ``groupBy(conv_id).applyInPandasWithState`` with (last_ts, next_sid)
    state — Arrow-batched, one state row per conversation, no timeout
    (state lives as long as the conversation; a TTL would be
    ``GroupStateTimeout.EventTimeTimeout`` + a watermark)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _session_kernel(session_gap_s),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_transcript_stream(spark, transcripts_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source transcript stream with the strict S1-style schema."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(transcripts_dir)


def stream_distinct(
    stream: DataFrame,
    cols: list[str],
    ts_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Stateful streaming dedup: emit each distinct key once, the first
    time it is seen, across all micro-batches (``dropDuplicates`` keeps a
    state-store entry per key).

    Unbounded streams MUST pass (``ts_col``, ``watermark_delay``): keys
    older than the watermark are evicted via
    ``dropDuplicatesWithinWatermark``, bounding state to the delay
    horizon. Without a watermark (finite drains / small key domains) the
    state is one entry per distinct key — the exact-dedup analog of
    operators/dedup.exact_duplicates, streaming-side.
    """
    if watermark_delay is not None:
        if ts_col is None:
            raise ValueError("watermark_delay requires ts_col")
        return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(cols)
    return stream.dropDuplicates(cols)


def enrich_with_dim(stream: DataFrame, dim: DataFrame, cond, how: str = "left") -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a (small)
    static dimension with an explicit broadcast hint — the standard
    "decorate facts with latest dimension state" pattern. The static side
    is re-read per micro-batch by Structured Streaming, so a warehouse-
    backed dimension picks up slowly-changing updates between batches;
    for per-row time-travel semantics use operators/asof.asof_join in
    the batch layer instead."""
    return stream.join(F.broadcast(dim), cond, how)
