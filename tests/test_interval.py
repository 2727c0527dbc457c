"""Bucketed interval join: equivalence with the naive inequality join
(the semantics oracle), plus the guard and left-join contracts.  The
operator is also oracle-checked end-to-end by purchase_view_windows."""

import pytest
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def sides(spark):
    import random

    rnd = random.Random(41)
    pts = [(rnd.choice(["a", "b", "c"]), i, rnd.randrange(0, 10_000))
           for i in range(300)]
    itv = []
    for j in range(80):
        lo = rnd.randrange(-500, 10_000)
        itv.append((rnd.choice(["a", "b", "c"]), 1000 + j,
                    lo, lo + rnd.randrange(0, 800)))
    points = spark.createDataFrame(pts, "k string, pid long, t long")
    intervals = spark.createDataFrame(itv, "k string, iid long, "
                                           "lo long, hi long")
    return points, intervals


def _naive(points, intervals, keyed=True):
    cond = (points["t"] >= intervals["lo"]) & (points["t"] <= intervals["hi"])
    if keyed:
        cond = (points["k"] == intervals["k"]) & cond
    cols = [points["k"], points["pid"], points["t"],
            intervals["iid"], intervals["lo"], intervals["hi"]]
    return points.join(intervals, cond).select(*cols)


@pytest.mark.parametrize("width", [64, 300, 5000])
def test_matches_naive_inequality_join(spark, sides, width):
    points, intervals = sides
    got = interval_join(points, intervals, point_ts="t", lo="lo", hi="hi",
                        on="k", bucket_width=width)
    want = _naive(points, intervals)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_unkeyed_matches_naive(spark, sides):
    points, intervals = sides
    got = interval_join(points, intervals.drop("k"), point_ts="t",
                        lo="lo", hi="hi", bucket_width=512)
    want = (points.join(
        intervals.drop("k"),
        (points["t"] >= F.col("lo")) & (points["t"] <= F.col("hi")))
        .select("k", "pid", "t", "iid", "lo", "hi"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))


def test_left_keeps_unmatched_points(spark, sides):
    points, intervals = sides
    got = interval_join(points, intervals, point_ts="t", lo="lo", hi="hi",
                        on="k", bucket_width=300, how="left")
    matched_pids = {r["pid"] for r in
                    _naive(points, intervals).select("pid").collect()}
    rows = got.collect()
    # every point appears; unmatched ones exactly once with NULL interval
    assert {r["pid"] for r in rows} == {r["pid"] for r in points.collect()}
    for r in rows:
        if r["pid"] not in matched_pids:
            assert r["iid"] is None and r["lo"] is None and r["hi"] is None


def test_null_timestamps_never_match(spark):
    points = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 50)], "k string, pid long, t long")
    intervals = spark.createDataFrame(
        [("a", 10, 0, 100), ("a", 11, None, 100)],
        "k string, iid long, lo long, hi long")
    got = interval_join(points, intervals, point_ts="t", lo="lo", hi="hi",
                        on="k", bucket_width=64).collect()
    assert [(r["pid"], r["iid"]) for r in got] == [(2, 10)]


def test_oversized_interval_raises(spark):
    points = spark.createDataFrame([("a", 1, 5)], "k string, pid long, t long")
    intervals = spark.createDataFrame([("a", 9, 0, 10_000_000)],
                                      "k string, iid long, lo long, hi long")
    df = interval_join(points, intervals, point_ts="t", lo="lo", hi="hi",
                       on="k", bucket_width=10, max_span_buckets=100)
    with pytest.raises(Exception, match="spans more than"):
        df.collect()


def test_colliding_columns_rejected(spark, sides):
    points, intervals = sides
    with pytest.raises(AssertionError, match="colliding"):
        interval_join(points, points, point_ts="t", lo="t", hi="t",
                      on="k", bucket_width=10)
