"""Accuracy contracts for the sketch queries (they register no DuckDB
oracle — approximate sketches are not cross-engine bit-comparable, so
the bound itself is the test)."""

import duckdb

from hpctoolkit_dataframe_spark.queries import REGISTRY
from hpctoolkit_dataframe_spark.queries.sketches import HLL_RSD, PCTL_ACC

SF_DIR = "/root/testdata/sf0.001"


def test_approx_daily_uniques_error_bound(spark):
    rows = REGISTRY["approx_daily_uniques"].fn(spark, SF_DIR).collect()
    exact = dict(duckdb.sql(f"""
        SELECT CAST(epoch_ns(ts) AS BIGINT) // 86400000000000 AS day,
               COUNT(DISTINCT user_id)
        FROM '{SF_DIR}/events.parquet' GROUP BY 1""").fetchall())
    assert len(rows) == len(exact)
    for r in rows:
        e = exact[r["day"]]
        # 5 sigma of the configured rsd, floor of 2 for tiny groups
        assert abs(r["approx_users"] - e) <= max(2, 5 * HLL_RSD * e)


def test_approx_value_percentiles_error_bound(spark):
    rows = REGISTRY["approx_value_percentiles"].fn(spark, SF_DIR).collect()
    con = duckdb.connect()
    sorted_vals = {}
    for et, vals in con.execute(f"""
        SELECT event_type,
               list_sort(list(CAST(ROUND(value*100) AS BIGINT)))
        FROM '{SF_DIR}/events.parquet' GROUP BY 1""").fetchall():
        sorted_vals[et] = vals
    assert len(rows) == len(sorted_vals)
    for r in rows:
        vals = sorted_vals[r["event_type"]]
        n = len(vals)
        # the GK guarantee is on RANK: |rank(returned) - p*n| <= n/acc
        tol = max(1.0, 2.0 * n / PCTL_ACC)
        for got, p in zip(
                (r["p50_cents"], r["p90_cents"], r["p99_cents"]),
                (0.5, 0.9, 0.99)):
            lo = sum(1 for v in vals if v < got)   # lowest rank of got
            hi = sum(1 for v in vals if v <= got)  # highest rank of got
            target = p * (n - 1)
            assert lo - tol <= target <= hi + tol, (
                r["event_type"], p, got, lo, hi, target)


def test_weekly_merge_is_lossless_and_bounded(spark):
    """Unioning the daily sketches must equal sketching each week
    directly (register-max merge is exact), and the estimate must sit
    within the HLL error bound of the true weekly distinct."""
    from pyspark.sql import functions as F

    from hpctoolkit_dataframe_spark.queries import load_table

    rows = {r["week"]: r for r in
            REGISTRY["approx_weekly_from_daily"].fn(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    week = F.expr("(ts div 86400000000000) div 7")
    direct = {r["week"]: r["direct"] for r in
              ev.groupBy(week.alias("week"))
              .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
                   .cast("long").alias("direct")).collect()}
    exact = {r["week"]: r["e"] for r in
             ev.groupBy(week.alias("week"))
             .agg(F.countDistinct("user_id").cast("long").alias("e"))
             .collect()}
    assert rows.keys() == direct.keys() == exact.keys()
    for w, r in rows.items():
        assert r["approx_users"] == direct[w]          # lossless merge
        e = exact[w]
        assert abs(r["approx_users"] - e) <= max(2, 0.15 * e)
