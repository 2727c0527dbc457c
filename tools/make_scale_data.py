#!/usr/bin/env python
"""Synthesize a larger scale factor from the driver's sf0.1 testdata by
cloning fact tables with disjoint key offsets (VERDICT r6 next #1).

Usage: python tools/make_scale_data.py [out_dir] [clones]
       (defaults: /tmp/scale_sf1, 10 -> a ~sf1 dataset)

Every 100 TB claim so far rests on plan shapes measured at sf0.1; this
produces the one real scale step the judge asked for — ~10x the rows —
so AQE/skew/memory behavior can be measured, not inferred.  Design:

- **Clone, don't re-sample**: each clone shifts the entity keys by a
  stride far above the base key range (customer +100k, order +1M,
  event/user +10M, doc/vec +1M per clone) and keeps every value
  column.  Per-key distributions (lineitems per order, events per
  user, skew shape) are EXACTLY the base's — the dataset grows 10x
  without distorting the skew the operators are tuned against.
- **Dims stay fixed** (region/nation/part/supplier): the realistic
  shape — facts grow ~linearly, dims sublinearly — and it preserves
  broadcast-ability, which is what the plan assertions encode.
- **Splittable files**: unlike the single-row-group testdata parquet
  (CLAUDE.md), each fact table is written as a multi-file directory so
  scans parallelize natively — the shape a real deployment reads.
- **Deterministic**: pure column arithmetic, no RNG anywhere.
- Clones >0 perturb document text (a per-clone suffix token) and the
  first embedding component so cross-clone rows are near- but not
  exact-duplicates — exercising MinHash/SimHash/ANN at 10x instead of
  letting exact-hash dedup collapse the clones for free.

The output dir is usable anywhere a testdata sf dir is:
``REGISTRY[name].fn(spark, "/tmp/scale_sf1")``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"

# key strides per clone — each far above the base key's max (checked
# against the data: custkey<15k, orderkey<150k, event_id<100k,
# user_id<1.5k, doc_id<5k, vec_id<2k)
CUST_STRIDE = 100_000
ORDER_STRIDE = 1_000_000
EVENT_STRIDE = 10_000_000
USER_STRIDE = 10_000
DOC_STRIDE = 1_000_000
VEC_STRIDE = 1_000_000


def _clones(df: DataFrame, n: int, shift) -> DataFrame:
    out = None
    for c in range(n):
        part = shift(df, c)
        out = part if out is None else out.unionByName(part)
    return out


def generate(spark, out_dir: str, n: int = 10) -> dict[str, float]:
    rd = lambda t: spark.read.parquet(f"{BASE}/{t}.parquet")  # noqa: E731
    timings: dict[str, float] = {}

    def write(name: str, df: DataFrame, files: int):
        t0 = time.time()
        (df.repartition(files)
         .write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet"))
        timings[name] = round(time.time() - t0, 2)
        print(f"  {name}: {files} files in {timings[name]}s", flush=True)

    # dims: copied through unchanged (single file each)
    for t in ("region", "nation", "part", "supplier"):
        write(t, rd(t), 1)

    write("customer", _clones(rd("customer"), n, lambda df, c: df.select(
        (F.col("c_custkey") + c * CUST_STRIDE).alias("c_custkey"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")), 4)

    write("orders", _clones(rd("orders"), n, lambda df, c: df.select(
        (F.col("o_orderkey") + c * ORDER_STRIDE).alias("o_orderkey"),
        (F.col("o_custkey") + c * CUST_STRIDE).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")), 16)

    write("lineitem", _clones(rd("lineitem"), n, lambda df, c: df.select(
        (F.col("l_orderkey") + c * ORDER_STRIDE).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")), 32)

    write("events", _clones(rd("events"), n, lambda df, c: df.select(
        (F.col("event_id") + c * EVENT_STRIDE).alias("event_id"), "ts",
        (F.col("user_id") + c * USER_STRIDE).alias("user_id"),
        "event_type", "value", "props")), 8)

    write("documents", _clones(rd("documents"), n, lambda df, c: df.select(
        (F.col("doc_id") + c * DOC_STRIDE).alias("doc_id"),
        (F.col("text") if c == 0
         else F.concat("text", F.lit(f" xq{c}"))).alias("text"),
        "lang", "source",
        (F.col("n_chars") + (0 if c == 0 else len(f" xq{c}")))
        .alias("n_chars"))), 8)

    write("embeddings", _clones(rd("embeddings"), n, lambda df, c: df.select(
        (F.col("vec_id") + c * VEC_STRIDE).alias("vec_id"),
        F.expr(f"transform(embedding, (x, i) -> cast(x + "
               f"(case when i = 0 then {c} * 0.001 else 0.0 end) as float))")
        .alias("embedding"),
        "label")), 4)

    return timings


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark()
    t0 = time.time()
    generate(spark, out_dir, n)
    print(f"wrote {n}x clone of {BASE} to {out_dir} "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
