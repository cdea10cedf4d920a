"""Structured Streaming ingestion: transcripts stream → contacts table.

SURVEY §2.9: the reference's only "streaming" is scheduled re-ingestion
with a persisted skip cursor (``pda-read/.../ReadRequestWorker.java:
150-172,214-226``). The cursor-file implementation of that idea lives in
``incremental.py``; this module is the same pipeline expressed on Spark's
own streaming runtime, where the file-source + checkpointLocation replace
the hand-rolled cursor:

- ``readStream`` over a transcripts directory (strict schema, S1-style —
  never inferred) discovers newly landed files exactly once, tracked in
  the stream checkpoint (the HatContext analog, maintained by Spark);
- each micro-batch derives its contact edges with the SAME
  ``derive_contacts`` operator the batch path uses, then merges them into
  the warehouse contacts table inside ``foreachBatch`` (A5 union + F6
  expiry via ``merge_contacts``) — merge-into semantics on the batch side
  of the boundary, where they belong;
- ``trigger(availableNow=True)`` gives the reference's scheduled-batch
  cadence (drain everything that has landed, then stop); a processing-time
  trigger turns the same code into a continuous pipeline.

The expiry cutoff stays an injected parameter (reproducibility — the
reference's ``Instant.now()`` cutoff is the bug SURVEY §7 flags); with a
wall-clock cutoff it is exactly a 14-day watermark TTL.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with sibling modules)

from ..datagen import TRANSCRIPTS_SCHEMA
from ..operators import edges as E
from ..sources.warehouse import ParquetWarehouse
from .incremental import merge_contacts


def stream_contacts(
    spark: SparkSession,
    transcripts_dir: str,
    warehouse: ParquetWarehouse,
    stream_checkpoint: str,
    contacts_table: str = "contacts",
    duration_threshold_s: int = E.DEFAULT_DURATION_THRESHOLD_S,
    session_gap_s: int = E.DEFAULT_SESSION_GAP_S,
    expiry_cutoff: dt.datetime | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming ingestion; returns the StreamingQuery.

    With ``available_now=True`` (default) the query drains all files
    currently in ``transcripts_dir`` and terminates — call
    ``q.awaitTermination()``; re-running later picks up only files that
    landed since (exactly-once via ``stream_checkpoint``).
    """
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(transcripts_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        new_contacts = E.derive_contacts(
            batch_df,
            duration_threshold_s=duration_threshold_s,
            session_gap_s=session_gap_s,
            expiry_cutoff=expiry_cutoff,
        )
        try:
            existing = warehouse.read_table(contacts_table)
        except ValueError:
            existing = None
        merged = merge_contacts(existing, new_contacts, expiry_cutoff)
        warehouse.write_table(merged, contacts_table)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", stream_checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
