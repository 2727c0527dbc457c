"""Sketch-based approximate aggregates — the 100 TB substitutes for
exact distinct counts and exact percentiles.

At scale, COUNT(DISTINCT) is a full shuffle of every distinct value and
exact percentiles buffer whole partitions; the sketch versions
(HyperLogLog++, Greenwald-Khanna) are single-pass, mergeable,
fixed-memory map-side aggregates.  Spark's sketches are deterministic
for a given input but NOT bit-compatible with DuckDB's (different HLL
variants/seeds), so these two queries intentionally register no oracle
SQL — the driver records a rows-only check, and
tests/test_sketches.py pins the accuracy contract instead: relative
error vs the exact answer within the sketch's configured bound, plus
exact-twin row parity.

Exact twins in the suite: ``distinct_types_per_brand`` (exact distinct
agg) and ``price_quantiles`` (exact percentile_cont).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import load_table, register

HLL_RSD = 0.02  # ~2% relative standard deviation
PCTL_ACC = 10_000  # approx_percentile accuracy knob: err <= 1/acc


@register("approx_daily_uniques", sql=None, doc="""
Per-day unique users via HyperLogLog++ (rsd=2%) plus exact event
counts.  Map-side HLL registers merge through the shuffle — per-group
state is ~1.5KB regardless of cardinality, vs. an exact distinct's
full value shuffle.""")
def approx_daily_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ts is LONG nanoseconds (nanosAsLong contract, CLAUDE.md).  Exact
    # integer div — a double division has ~256ns ULP at epoch-nanos
    # magnitude, enough to mis-bucket boundary timestamps.
    day = F.expr("ts div 86400000000000")
    return (ev.groupBy(day.alias("day"))
            .agg(F.approx_count_distinct("user_id", rsd=HLL_RSD)
                 .cast("long").alias("approx_users"),
                 F.count(F.lit(1)).cast("long").alias("n_events"))
            .orderBy("day"))


@register("approx_value_percentiles", sql=None, doc="""
Per-event-type p50/p90/p99 of `value` via a single Greenwald-Khanna
buffer per group (array form — one pass, three outputs), quantized to
cents so downstream comparisons are stable.""")
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pct = F.percentile_approx(
        F.col("cents"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(PCTL_ACC))
    return (ev.select("event_type", cents.alias("cents"))
            .groupBy("event_type")
            .agg(pct.alias("p"))
            .select("event_type",
                    F.col("p")[0].cast("long").alias("p50_cents"),
                    F.col("p")[1].cast("long").alias("p90_cents"),
                    F.col("p")[2].cast("long").alias("p99_cents"))
            .orderBy("event_type"))


@register("approx_weekly_from_daily", sql=None, doc="""
Two-level mergeable rollup — THE 100 TB pre-aggregation pattern: each
day keeps a reusable HLL binary sketch (not a number), and coarser
windows union sketches instead of re-reading events.  At scale the
daily layer is a materialized table a few KB per (day) group; weekly /
monthly / all-time uniques then cost a scan of sketches, never a
second pass over raw history.  The merge is lossless: unioning daily
registers yields the SAME registers as sketching the week directly
(pinned by test_sketches.py).""")
def approx_weekly_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("ts div 86400000000000")
    daily = (ev.groupBy(day.alias("day"))
             .agg(F.hll_sketch_agg("user_id").alias("sk"),
                  F.count(F.lit(1)).cast("long").alias("n_events")))
    return (daily.groupBy(F.expr("day div 7").alias("week"))
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .cast("long").alias("approx_users"),
                 F.sum("n_events").cast("long").alias("n_events"))
            .orderBy("week"))
