"""Incremental ingestion (warehouse snapshots + cursor) — the S7
HatContext-resume-cursor analog: ticking over appended transcripts yields
byte-identical contacts to a full recompute over everything."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharetrace_giraph_spark import datagen
from sharetrace_giraph_spark.operators import edges as E
from sharetrace_giraph_spark.sources.warehouse import ParquetWarehouse
from sharetrace_giraph_spark.streaming.incremental import IncrementalEdgePipeline


def _contacts_dict(df):
    return {
        (r.src, r.dst): [(int(o.time.timestamp()), o.duration_ms) for o in r.occurrences]
        for r in df.collect()
    }


def test_warehouse_snapshots_and_incremental(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    a = datagen.generate_transcripts(spark, n_convs=20, turns_per_conv=16, seed=1)
    b = datagen.generate_transcripts(spark, n_convs=20, turns_per_conv=16, seed=2)
    s0 = wh.append(a, "t")
    s1 = wh.append(b, "t")
    assert wh.snapshot_ids("t") == [0, 1]
    assert wh.read_table("t").count() == a.count() + b.count()
    assert wh.read_table("t", as_of=s0).count() == a.count()
    inc, latest = wh.read_incremental("t", after=s0)
    assert latest == s1 and inc.count() == b.count()
    none_df, latest2 = wh.read_incremental("t", after=s1)
    assert none_df is None and latest2 == s1


def test_incremental_ticks_equal_full_recompute(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    # three disjoint batches of conversations (distinct conv ranges via
    # different start offsets so merges really exercise the A5 union)
    batches = [
        datagen.generate_transcripts(
            spark, n_convs=60, turns_per_conv=16, n_actors=30,
            n_communities=3, seed=7, start_epoch_s=datagen.FIXTURE_DAY0 + i * 10_000_000,
        ).withColumn("conv_id", F.concat(F.lit(f"b{i}-"), F.col("conv_id")))
        for i in range(3)
    ]

    pipe = IncrementalEdgePipeline(spark, wh)
    for i, b in enumerate(batches):
        wh.append(b, "transcripts")
        stats = pipe.tick()
        assert stats["cursor"] == i
        assert stats["new_turns"] == b.count()

    # idempotent tick with nothing new
    assert pipe.tick()["new_turns"] == 0

    incremental = _contacts_dict(wh.read_table("contacts"))
    full = _contacts_dict(
        E.derive_contacts(batches[0].unionByName(batches[1]).unionByName(batches[2]))
    )
    assert incremental == full
