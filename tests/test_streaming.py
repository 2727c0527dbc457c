"""Streaming twins must agree with their batch counterparts."""

import pytest
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.queries import REGISTRY
from hpctoolkit_dataframe_spark.streaming import events as se

from .conftest import SF_DIR


def test_hourly_counts_matches_batch(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    assert stream.isStreaming
    got = se.run_available_now(se.hourly_counts(stream), "hourly_t",
                               output_mode="complete")
    batch = REGISTRY["events_hourly"].fn(spark, SF_DIR).collect()
    key = lambda r: (r["hour_epoch_s"], r["event_type"])  # noqa: E731
    got_m = {key(r): (r["n"], r["value_c"]) for r in got}
    batch_m = {key(r): (r["n"], r["value_c"]) for r in batch}
    assert got_m == batch_m


def test_sliding_counts_matches_batch(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    got = se.run_available_now(se.sliding_counts(stream), "sliding_t",
                               output_mode="complete")
    batch = REGISTRY["events_sliding"].fn(spark, SF_DIR).collect()
    key = lambda r: (r["window_start_s"], r["event_type"])  # noqa: E731
    got_m = {key(r): (r["n"], r["value_c"]) for r in got}
    batch_m = {key(r): (r["n"], r["value_c"]) for r in batch}
    assert got_m == batch_m


def test_salted_join_equals_plain_join(spark):
    from hpctoolkit_dataframe_spark.operators import skew

    left = spark.range(5000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(7)], "k long, name string")
    plain = {(r["k"], r["v"], r["name"])
             for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["v"], r["name"])
              for r in skew.salted_join(left, right, ["k"]).collect()}
    assert salted == plain
    agg = {r["k"]: r["sum_v"] for r in skew.two_stage_agg_sum(
        left, ["k"], "v").collect()}
    expected = {r["k"]: r["s"] for r in left.groupBy("k")
                .agg(F.sum("v").alias("s")).collect()}
    assert agg == expected


def test_session_window_aggregate(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    rows = se.run_available_now(se.session_aggregate(stream), "sessions_t",
                                output_mode="complete")
    assert rows
    # session totals must partition the event count
    assert sum(r["n_events"] for r in rows) == \
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    # every session respects the 30-minute gap bound on its span per event
    for r in rows[:50]:
        assert r["end_epoch_s"] >= r["start_epoch_s"]


def test_running_user_totals_stateful(spark):
    stream = se.read_events_stream(spark, SF_DIR)
    rows = se.run_available_now(se.running_user_totals(stream), "totals_t",
                                output_mode="update")
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = ev.groupBy("user_id").count().collect()
    expected_m = {r["user_id"]: r["count"] for r in expected}
    # final state per user equals the batch count (availableNow drains all)
    final = {}
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0),
                                  r["events_so_far"])
    assert final == expected_m
