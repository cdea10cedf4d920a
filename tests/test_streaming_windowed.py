"""Streaming operator semantics: watermarked windowed aggregation and the
applyInPandasWithState sessionizer, verified by batch equivalence across
two time-ordered drains of the same data."""

from __future__ import annotations

import pyspark.sql.functions as F

from sharetrace_giraph_spark import datagen
from sharetrace_giraph_spark.operators import edges as E
from sharetrace_giraph_spark.streaming import windowed as W


def _write_chunks(spark, pdf, tmp_path):
    """Split at the median timestamp into two time-ordered parquet files
    (every conv's chunk-1 turns precede its chunk-2 turns)."""
    cut = pdf["ts"].quantile(0.5)
    d = tmp_path / "stream-in"
    d.mkdir()
    c1, c2 = pdf[pdf["ts"] <= cut], pdf[pdf["ts"] > cut]
    f1, f2 = str(tmp_path / "c1.parquet"), str(tmp_path / "c2.parquet")
    spark.createDataFrame(c1, schema=datagen.TRANSCRIPTS_SCHEMA).coalesce(1).write.parquet(f1)
    spark.createDataFrame(c2, schema=datagen.TRANSCRIPTS_SCHEMA).coalesce(1).write.parquet(f2)
    return d, f1, f2, c1


def _drain(spark, stream_df, ckpt: str, sink: list) -> None:
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, _id: sink.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _land(spark, src_file: str, dest_dir, name: str) -> None:
    """Copy the single part-file of a Spark-written parquet dir into the
    stream source dir as a flat file (the file source does not recurse)."""
    import glob
    import shutil

    (part,) = glob.glob(f"{src_file}/part-*.parquet")
    shutil.copy(part, str(dest_dir / f"{name}.parquet"))


def test_stateful_sessionize_equals_batch_across_chunks(spark, tmp_path):
    t = datagen.generate_transcripts(
        spark, n_convs=60, turns_per_conv=10, n_actors=20,
        n_communities=4, n_hubs=2, seed=7,
    )
    pdf = t.toPandas().sort_values(["ts", "conv_id", "turn_idx"], ignore_index=True)
    d, f1, f2, _ = _write_chunks(spark, pdf, tmp_path)
    ckpt = str(tmp_path / "ckpt-sess")
    gap = 30 * 60

    rows: list = []
    _land(spark, f1, d, "c1")
    _drain(spark, W.stateful_sessionize(
        W.read_transcript_stream(spark, str(d)), session_gap_s=gap), ckpt, rows)
    n_first = len(rows)
    _land(spark, f2, d, "c2")
    _drain(spark, W.stateful_sessionize(
        W.read_transcript_stream(spark, str(d)), session_gap_s=gap), ckpt, rows)

    assert 0 < n_first < len(rows)  # both drains emitted
    got = {(r.conv_id, r.turn_idx): r.session_id for r in rows}

    batch = E.sessionize(t, session_gap_s=gap).collect()
    exp = {(r.conv_id, r.turn_idx): r.session_id for r in batch}
    assert got == exp  # state carried across drains == one-shot batch


def test_windowed_counts_emit_at_watermark_boundary(spark, tmp_path):
    t = datagen.generate_transcripts(
        spark, n_convs=60, turns_per_conv=10, n_actors=20,
        n_communities=4, n_hubs=2, seed=7,
    )
    pdf = t.toPandas().sort_values(["ts", "conv_id", "turn_idx"], ignore_index=True)
    d, f1, f2, c1 = _write_chunks(spark, pdf, tmp_path)
    ckpt = str(tmp_path / "ckpt-win")
    delay_s = 30 * 60

    rows: list = []
    _land(spark, f1, d, "c1")
    _drain(spark, W.windowed_turn_counts(
        W.read_transcript_stream(spark, str(d)),
        window_duration="1 hour", watermark_delay="30 minutes"), ckpt, rows)
    _land(spark, f2, d, "c2")
    _drain(spark, W.windowed_turn_counts(
        W.read_transcript_stream(spark, str(d)),
        window_duration="1 hour", watermark_delay="30 minutes"), ckpt, rows)

    # append mode: a window is emitted once, when the watermark passes it.
    # availableNow runs a final commit batch after the last data batch, so
    # the final watermark derives from the GLOBAL max event time; only the
    # trailing windows inside the delay stay withheld.
    wm = pdf["ts"].max().timestamp() - delay_s

    batch = {
        (r.win_start, r.role): r.n_turns
        for r in t.groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "role", "n_turns")
        .collect()
    }
    emitted = {(r.win_start, r.role): r.n_turns for r in rows}

    assert emitted  # something closed
    for k, n in emitted.items():
        assert batch[k] == n, k  # every emitted row is batch-exact
    for r in rows:
        assert r.win_end.timestamp() <= wm + 1, "window past the watermark emitted"
    # every window strictly inside the watermark must have been emitted
    interior = {
        k for k, _ in batch.items() if k[0].timestamp() + 3600 <= wm - 3600
    }
    assert interior <= set(emitted)


def test_stream_distinct_state_carries_across_drains(spark, tmp_path):
    """Keys seen in drain 1 must NOT re-emit in drain 2 (the dedup state
    store persists via the checkpoint), and the union of both drains is
    exactly the batch DISTINCT."""
    d = tmp_path / "dedup-in"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt-dedup")

    def land(name, words):
        f = str(tmp_path / f"{name}-tmp.parquet")
        spark.createDataFrame([(w,) for w in words], "word string") \
            .coalesce(1).write.parquet(f)
        _land(spark, f, d, name)

    def drain():
        rows: list = []
        stream = spark.readStream.schema("word string").parquet(str(d))
        _drain(spark, W.stream_distinct(stream, ["word"]), ckpt, rows)
        return sorted(r.word for r in rows)

    land("c1", ["a", "b", "a", "c"])
    first = drain()
    assert first == ["a", "b", "c"]
    land("c2", ["b", "c", "d", "d", "e"])
    second = drain()
    assert second == ["d", "e"]  # a/b/c suppressed by carried state


def test_enrich_with_dim_broadcasts_and_matches_batch(spark, tmp_path):
    """Stream-static enrichment drains to exactly the batch join result."""
    d = tmp_path / "enrich-in"
    d.mkdir()
    f = str(tmp_path / "facts-tmp.parquet")
    spark.createDataFrame(
        [(i, i % 3) for i in range(20)], "fact_id long, dim_id long"
    ).coalesce(1).write.parquet(f)
    _land(spark, f, d, "facts")
    dim = spark.createDataFrame(
        [(0, "x"), (1, "y")], "dim_id long, label string"
    )
    rows: list = []
    stream = spark.readStream.schema("fact_id long, dim_id long").parquet(str(d))
    _drain(spark, W.enrich_with_dim(stream, dim, "dim_id"),
           str(tmp_path / "ckpt-enrich"), rows)
    got = sorted((r.fact_id, r.label) for r in rows)
    exp = sorted((i, {0: "x", 1: "y"}.get(i % 3)) for i in range(20))
    assert got == exp
