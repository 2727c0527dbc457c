"""Structured Streaming operators over the ``events`` table.

The reference has NO streaming surface (SURVEY.md §2.9) — this module
is the engine's scale extension: the same event-time aggregations that
``queries/relational.py`` runs in batch, expressed as incremental
streaming queries with watermarks, plus a custom stateful operator via
``applyInPandasWithState``.

Design notes for 100 TB / continuous ingestion:
- file-source streams here (the test harness reads the parquet table as
  a stream with ``availableNow``); swap the source for Kafka/queue in
  production — the transformation graph is identical.
- watermark bounds state: hourly windows keep ~(watermark/1h) buckets
  per key; session state is per-user and evicted on timeout.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanoseconds (see queries/__init__)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    from .._pickle import register_module_by_value

    register_module_by_value(__name__)  # stateful fn runs worker-side
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(sf_dir)


def with_event_time(df: DataFrame) -> DataFrame:
    """Nanosecond LONG -> TIMESTAMP event-time column (microsecond prec)."""
    return df.withColumn("ts_t", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling hourly aggregation — streaming twin of ``events_hourly``."""
    return (
        with_event_time(events)
        .withWatermark("ts_t", watermark)
        .groupBy(F.window("ts_t", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
             .alias("value_c"))
        .select(F.unix_timestamp(F.col("w.start")).alias("hour_epoch_s"),
                "event_type", "n", "value_c")
    )


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding 1-hour windows every 15 minutes — streaming twin of the
    batch ``events_sliding`` query."""
    return (
        with_event_time(events)
        .withWatermark("ts_t", watermark)
        .groupBy(F.window("ts_t", "1 hour", "15 minutes").alias("w"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
             .alias("value_c"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
                "event_type", "n", "value_c")
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-based) — streaming twin of
    ``events_sessions``'s grouping."""
    return (
        with_event_time(events)
        .withWatermark("ts_t", watermark)
        .groupBy(F.session_window("ts_t", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.round(F.col("value") * 100).cast("long")).cast("long")
             .alias("value_c"))
        .select("user_id",
                F.unix_timestamp(F.col("w.start")).alias("start_epoch_s"),
                F.unix_timestamp(F.col("w.end")).alias("end_epoch_s"),
                "n_events", "value_c")
    )


# ---------------------------------------------------------------------------
# custom stateful operator: running per-user counters with timeout
# ---------------------------------------------------------------------------
_STATE_SCHEMA = "total BIGINT, value_c BIGINT"
_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("events_so_far", T.LongType()),
    T.StructField("value_c_so_far", T.LongType()),
])


def _update_user_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    total, value_c = state.get if state.exists else (0, 0)
    for batch in batches:
        total += len(batch)
        # HALF_UP to match Spark F.round in every batch twin — pandas
        # .round() is half-to-even and diverges on exact .5 cents; NaN
        # values count as 0 instead of crashing the int cast (ADVICE r1).
        # floor(x+0.5) == HALF_UP for the non-negative values here.
        cents = np.floor(batch["value"].fillna(0.0) * 100 + 0.5)
        value_c += int(cents.astype("int64").sum())
    state.update((total, value_c))
    yield pd.DataFrame({"user_id": [key[0]], "events_so_far": [total],
                        "value_c_so_far": [value_c]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary stateful processing (applyInPandasWithState): emits the
    running per-user event count and value total after each micro-batch.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str,
                      output_mode: str = "complete") -> list[Any]:
    """Drain a stream with availableNow into a memory sink; return rows."""
    q = (
        stream_df.writeStream.format("memory").queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    return spark.sql(f"SELECT * FROM {query_name}").collect()
