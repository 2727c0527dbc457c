"""The hpctoolkit Python Data Source must be row-identical to the
driver-side parser it wraps (same parse function, official scan API)."""

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.sources import datasource
from hpctoolkit_dataframe_spark.sources.hpctoolkit_xml import (
    parse_experiment_rows)

XML1 = "/root/reference/test/data/experiment1.xml"
GLOB = "/root/reference/test/data/experiment*.xml"


def _expected(max_depth=None):
    with open(XML1, "rb") as f:
        _, rows = parse_experiment_rows(f.read(), XML1,
                                        max_depth=max_depth)
    return rows


def test_datasource_matches_parser(spark):
    datasource.register(spark)
    got = (spark.read.format("hpctoolkit").load(XML1)
           .orderBy("id").collect())
    want = sorted(_expected(), key=lambda r: r["id"])
    assert len(got) == len(want) == 3454
    raw_cols = [c for c in got[0].__fields__ if c.startswith("__raw_")]
    assert raw_cols
    for g, w in zip(got, want):
        assert g["id"] == w["id"]
        assert list(g["callpath"]) == list(w["callpath"])
        assert g["procedure"] == w.get("procedure")
        # every raw metric column round-trips exactly
        for c in raw_cols:
            assert g[c] == w.get(c)


def test_datasource_depth_pushdown(spark):
    datasource.register(spark)
    got = (spark.read.format("hpctoolkit").option("max_depth", 5)
           .load(XML1).select(F.size("callpath").alias("d")).collect())
    want = _expected(max_depth=5)
    assert sorted(r["d"] for r in got) == \
        sorted(len(r["callpath"]) for r in want)


def test_datasource_glob_partitions(spark):
    datasource.register(spark)
    df = spark.read.format("hpctoolkit").load(GLOB)
    assert df.rdd.getNumPartitions() == 2  # one partition per file
    assert df.count() == 6308              # 3454 + 2854 (FIXTURES §3)
    assert df.select("profile_id").distinct().count() == 2
