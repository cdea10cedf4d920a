"""Unit tests for the scalar/array function surface (SURVEY.md §2.8,
F3-F5, A1) — sharetrace_giraph_spark/functions/scalars.py."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from sharetrace_giraph_spark import functions as fn


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_coarsen_and_epoch_roundtrip(spark):
    df = spark.createDataFrame(
        [("9q8yyk8ytpxr", _ts("2021-01-02T03:04:05"))], "h string, ts timestamp"
    )
    row = df.select(
        fn.coarsen("h").alias("c"),
        fn.coarsen("h", drop=20).alias("all_dropped"),
        fn.epoch_millis("ts").alias("ms"),
        fn.from_epoch_millis(fn.epoch_millis("ts")).alias("rt"),
    ).first()
    assert row.c == "9q8yyk8yt"  # last 3 chars dropped (P1)
    assert row.all_dropped == ""
    assert row.ms == 1609556645000
    assert row.rt == _ts("2021-01-02T03:04:05")


def test_duration_and_phase(spark):
    df = spark.createDataFrame(
        [(_ts("2021-01-01T00:00:00"), _ts("2021-01-01T00:20:00"), 4)],
        "a timestamp, b timestamp, k int",
    )
    row = df.select(
        fn.duration_between_s("a", "b").alias("d"),
        fn.superstep_phase("k").alias("p"),
        fn.superstep_phase(F.col("k") + 1).alias("p1"),
    ).first()
    assert row.d == 1200
    assert (row.p, row.p1) == (0, 1)


def test_max_score_natural_order(spark):
    # RiskScore order = (updateTime, value, id): later time wins over
    # larger value (AbstractRiskScore.java:57-67)
    rows = [
        ("u1", _ts("2021-01-01"), 0.9, "a"),
        ("u1", _ts("2021-01-02"), 0.1, "b"),
        ("u2", _ts("2021-01-01"), 0.5, "a"),
        ("u2", _ts("2021-01-01"), 0.5, "z"),
    ]
    df = spark.createDataFrame(rows, "uid string, t timestamp, v double, id string")
    got = {
        r.uid: (r.m.value, r.m.id)
        for r in df.groupBy("uid").agg(fn.max_score("t", "v", "id").alias("m")).collect()
    }
    assert got["u1"] == (0.1, "b")  # recency beats value
    assert got["u2"] == (0.5, "z")  # id breaks the tie


def test_transmission_gate_deterministic(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(20)], "id long, v double")
    out = df.select("id", fn.transmission_gate("v", "id", rate=0.7).alias("g")).collect()
    for r in out:
        assert r.g == (1.0 if r.id % 10 < 7 else 0.0)


def test_recency_sender_exclusion_and_empty_drop(spark):
    df = spark.createDataFrame(
        [
            (
                "r1",
                [
                    {"ts": _ts("2021-01-01"), "id": "a", "v": 0.3},
                    {"ts": _ts("2021-01-05"), "id": "r1", "v": 0.9},
                    {"ts": _ts("2021-01-09"), "id": "b", "v": 0.7},
                ],
                _ts("2021-01-06"),
            )
        ],
        "receiver string, scores array<struct<ts timestamp, id string, v double>>, cutoff timestamp",
    )
    out = df.select(
        "receiver",
        fn.sender_exclusion(
            fn.recency_filter("scores", "cutoff"), F.col("receiver")
        ).alias("live"),
    )
    row = out.first()
    # F3 drops the post-cutoff score (b); F5 drops the receiver's own (r1)
    assert [s.id for s in row.live] == ["a"]
    emptied = out.select(
        "receiver", fn.recency_filter("live", F.lit(_ts("2020-01-01"))).alias("live")
    )
    assert fn.drop_if_empty(emptied, "live").count() == 0  # F4
