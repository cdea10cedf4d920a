"""Structured Streaming ingestion: two availableNow drains over a growing
transcripts directory produce exactly the contacts a full batch recompute
produces (exactly-once file tracking via the stream checkpoint)."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharetrace_giraph_spark import datagen
from sharetrace_giraph_spark.operators import edges as E
from sharetrace_giraph_spark.sources.warehouse import ParquetWarehouse
from sharetrace_giraph_spark.streaming.stream_ingest import stream_contacts


def _contacts_dict(df):
    return {
        (r.src, r.dst): sorted((int(o.time.timestamp()), o.duration_ms) for o in r.occurrences)
        for r in df.collect()
    }


def test_stream_matches_batch_recompute(spark, tmp_path):
    tdir = str(tmp_path / "transcripts")
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    sckpt = str(tmp_path / "stream-ckpt")

    t1 = datagen.generate_transcripts(spark, n_convs=80, turns_per_conv=16,
                                      n_actors=30, n_communities=3, seed=11)
    t1.write.mode("append").parquet(tdir)

    q = stream_contacts(spark, tdir, wh, sckpt)
    q.awaitTermination()
    got1 = _contacts_dict(wh.read_table("contacts"))
    exp1 = _contacts_dict(E.derive_contacts(spark.read.parquet(tdir)))
    assert got1 == exp1 and len(got1) > 0

    # second wave of files: only the delta is processed, merge result must
    # equal a from-scratch recompute over everything
    t2 = datagen.generate_transcripts(spark, n_convs=80, turns_per_conv=16,
                                      n_actors=30, n_communities=3, seed=12,
                                      start_epoch_s=datagen.FIXTURE_DAY0 + 40 * 86400)
    t2.write.mode("append").parquet(tdir)

    q2 = stream_contacts(spark, tdir, wh, sckpt)
    q2.awaitTermination()
    got2 = _contacts_dict(wh.read_table("contacts"))
    exp2 = _contacts_dict(E.derive_contacts(spark.read.parquet(tdir)))
    assert got2 == exp2
    assert len(got2) >= len(got1)

    # replace-style merges: one live snapshot, monotonically advancing id
    # (never reusing a path the merge read from)
    assert wh.snapshot_ids("contacts") == [1]
