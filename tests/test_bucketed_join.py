"""write_bucketed_table's contract, proven on the plan: a join between
two tables bucketed on the same key with the same bucket count runs
with ZERO shuffle exchanges — the co-located-join pattern that turns a
100 TB fact-fact join from a full network shuffle into local reads."""

import contextlib

import pytest
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.plans import explain
from hpctoolkit_dataframe_spark.sources.sinks import write_bucketed_table


@contextlib.contextmanager
def _no_broadcast(spark):
    keys = ["spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold"]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        # restore EXACT prior state: a key that was unset must be unset
        # again (leaving adaptive.autoBroadcastJoinThreshold=-1 would
        # disable AQE broadcasts for every later test in the session)
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture()
def bucketed_pair(spark):
    names = ("bkt_orders_t", "bkt_lines_t")
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v1"))
    b = spark.range(30_000).select(
        (F.col("id") % 10_000).alias("k"), (F.col("id") % 13).alias("v2"))
    write_bucketed_table(a, names[0], bucket_cols=("k",), n_buckets=8,
                         sort_cols=("k",))
    write_bucketed_table(b, names[1], bucket_cols=("k",), n_buckets=8,
                         sort_cols=("k",))
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    ta, tb = bucketed_pair
    with _no_broadcast(spark):
        joined = (spark.table(ta).join(spark.table(tb), "k")
                  .groupBy("v1").agg(F.sum("v2").alias("s")))
        plan = explain.executed_plan(joined)
        # no "Exchange hashpartitioning" anywhere: the join consumes
        # bucket layout directly, and even the groupBy's exchange is the
        # only permitted one (it keys on v1, not k)
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning" not in join_part, join_part
        assert "SortMergeJoin" in plan


def test_bucketed_join_values(spark, bucketed_pair):
    ta, tb = bucketed_pair
    with _no_broadcast(spark):
        got = (spark.table(ta).join(spark.table(tb), "k")
               .agg(F.count(F.lit(1)), F.sum("v2")).collect()[0])
    assert tuple(got) == (30_000, sum(i % 13 for i in range(30_000)))
