#!/usr/bin/env python
"""Scale smoke: key operators at 10-50x the bench volume, synthetic.

Driver-table queries stay on /root/testdata (TESTDATA.md contract);
this tool stresses OUR operators' plan shapes at volumes the sf0.1
tables cannot reach locally — the point is to catch accidental
O(n^2)/single-partition regressions before they ship, not to produce a
benchmark number.

Usage: python tools/scale_smoke.py [scale, default 1]
  scale=1: ~10M-row as-of probe, 5M-row skewed join, 100k-doc winnow
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from hpctoolkit_dataframe_spark.operators.asof import asof_join  # noqa: E402
from hpctoolkit_dataframe_spark.operators.skew import salted_join  # noqa: E402


def mat(df) -> int:
    return df.count()


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    # 1) as-of join: 10M probes vs 2M reference rows over 100k keys —
    #    one key shuffle, no explosion
    n_l, n_r, keys = 10_000_000 * scale, 2_000_000 * scale, 100_000
    left = spark.range(n_l, numPartitions=par).select(
        (F.col("id") % keys).alias("k"), F.col("id").alias("pid"),
        (F.xxhash64("id") % 1_000_000).alias("t"))
    right = spark.range(n_r, numPartitions=par).select(
        (F.col("id") % keys).alias("k"), F.col("id").alias("rid"),
        (F.xxhash64("id", F.lit(1)) % 1_000_000).alias("t"))
    t0 = time.time()
    rows = mat(asof_join(left, right, on="k", left_ts="t",
                         right_cols=["rid"]))
    print(f"asof_join {n_l:,}x{n_r:,} over {keys:,} keys: "
          f"{rows:,} rows in {time.time()-t0:.1f}s")

    # 2) salted join under 90% single-key skew, 5M x 100k
    n = 5_000_000 * scale
    skew_l = spark.range(n, numPartitions=par).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100_000)
        .alias("k"), F.col("id").alias("v"))
    dim = spark.range(100_000).select(F.col("id").alias("k"),
                                      (F.col("id") * 3).alias("w"))
    t0 = time.time()
    rows = mat(salted_join(skew_l, dim, on=["k"], salt=32))
    print(f"salted_join {n:,} rows, 90% hot key: "
          f"{rows:,} rows in {time.time()-t0:.1f}s")

    # 3) winnowing on 100k synthetic docs (~300 chars each)
    n_docs = 100_000 * scale
    from hpctoolkit_dataframe_spark.queries.textops import (
        winnow_fingerprints,
    )
    import tempfile

    docs = spark.range(n_docs, numPartitions=par).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[F.md5(F.concat(F.col("id").cast("string"),
                                          F.lit(f":{i}")))
                           for i in range(9)]).alias("text"),
        F.lit("en").alias("lang"), F.lit("synthetic").alias("source"))
    with tempfile.TemporaryDirectory(prefix="scale_docs_") as tmp:
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        t0 = time.time()
        rows = mat(winnow_fingerprints(spark, tmp))
        print(f"winnow_fingerprints {n_docs:,} docs: "
              f"{rows:,} rows in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
