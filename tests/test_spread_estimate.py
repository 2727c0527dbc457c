"""r13 load_table spread probe: the local-file scan-partition estimate
must equal Spark's own FilePartition packing (the old
df.rdd.getNumPartitions probe) — on every testdata table and on a
multi-file directory table."""

import pyspark.sql.functions as F
import pytest

from hpctoolkit_dataframe_spark.queries import _scan_partitions, session_key


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_estimate_matches_rdd_probe_on_testdata(spark, sf_dir):
    for name in ("lineitem", "orders", "documents", "embeddings",
                 "customer", "nation"):
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        est = _scan_partitions(spark, sf_dir + "#test", name, df)
        assert est == df.rdd.getNumPartitions(), (sf_dir, name)


def test_estimate_matches_rdd_probe_multifile(spark, tmp_path):
    out = str(tmp_path / "multi")
    spark.range(200_000).withColumn("pad", F.md5(F.col("id").cast("string"))) \
        .repartition(7).write.parquet(out)
    df = spark.read.parquet(out)
    est = _scan_partitions(spark, out, "multi", df)
    assert est == df.rdd.getNumPartitions()


def test_estimate_is_memoized(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    key = (session_key(spark), "/root/testdata/sf0.001#memo", "nation")
    _scan_partitions(spark, key[1], "nation", df)
    from hpctoolkit_dataframe_spark.queries import _SPREAD_CACHE
    assert key in _SPREAD_CACHE
