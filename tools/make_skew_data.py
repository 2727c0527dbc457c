#!/usr/bin/env python
"""Synthesize a SKEWED ~10x clone of sf0.1: same volume step as
tools/make_scale_data.py, but the growth CONCENTRATES on a handful of
hot keys instead of spreading uniformly.

Why this exists: the uniform clones (SCALE_r07*.json) prove the plans
survive 10-100x VOLUME, but they preserve the base's per-key
distributions by construction — and the thing that actually kills
100 TB jobs is key skew (one bot user, one mega-order, one boilerplate
page duplicated across half a crawl).  This generator builds that
adversarial dataset so AQE skew handling, window-partition hot keys,
hot dedup buckets, and giant ANN cells are MEASURED, not assumed.

Skew axes (all deterministic column arithmetic, no RNG; clone 0 is the
unmodified base so every hot target key exists):

- lineitem: in clones >0, every row with (l_orderkey+l_linenumber)%2=0
  is remapped to hot order l_orderkey%8 (base orderkeys 0-7).  At 10x
  that lands ~2.7M of 6M rows on 8 join keys (~340k lineitems per hot
  order vs ~4 normal) — the lineitem|><|orders join and the CCT build
  see real join-key skew.
- orders: in clones >0, keys with o_orderkey%10<3 belong to hot
  customer 0 (~405k of 1.5M orders) — group-by-customer and
  order|><|customer skew.
- events: in clones >0, rows with event_id%2=0 belong to hot user 0
  (~450k of 1M events, one "bot" user) — sessionization and every
  PARTITION BY user_id window gets a mega-partition.
- documents: in clones >0, doc_id%10<3 docs carry the base min-doc
  text verbatim (~13.5k identical docs, one mega duplicate cluster) —
  exact/canonical dedup hot hash key, MinHash/SimHash hot buckets,
  star-contraction giant component, hot span grams.  Other docs get
  the uniform generator's near-dup suffix.
- embeddings: in clones >0, vec_id%10<3 vectors are byte-identical
  copies of the base min-vec embedding (~5.4k of 20k) — one giant
  IVF/k-means cell (semdedup's quadratic-inside-cell worst case).

Key strides match make_scale_data.py, so oracle SQL and stores work
unchanged: ``REGISTRY[name].fn(spark, "/tmp/skew_sf1")``.

Usage: python tools/make_skew_data.py [out_dir] [clones]
       (defaults: /tmp/skew_sf1, 10)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from tools.make_scale_data import (  # noqa: E402
    BASE, CUST_STRIDE, DOC_STRIDE, EVENT_STRIDE, ORDER_STRIDE, USER_STRIDE,
    VEC_STRIDE, _clones)

HOT_ORDERS = 8        # lineitem hot-join fan-in target keys (0..7)
HOT_FRAC_MOD = 10     # doc/vec/order hot selector: key % 10 < 3 => 30%


def generate(spark, out_dir: str, n: int = 10) -> dict[str, float]:
    rd = lambda t: spark.read.parquet(f"{BASE}/{t}.parquet")  # noqa: E731
    timings: dict[str, float] = {}

    def write(name: str, df: DataFrame, files: int):
        t0 = time.time()
        (df.repartition(files)
         .write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet"))
        timings[name] = round(time.time() - t0, 2)
        print(f"  {name}: {files} files in {timings[name]}s", flush=True)

    # hot payloads, fetched once driver-side (1-row lookups, deterministic)
    hot_doc = (rd("documents").orderBy("doc_id")
               .select("text").limit(1).collect()[0][0])
    hot_vec = (rd("embeddings").orderBy("vec_id")
               .select("embedding").limit(1).collect()[0][0])

    for t in ("region", "nation", "part", "supplier"):
        write(t, rd(t), 1)

    write("customer", _clones(rd("customer"), n, lambda df, c: df.select(
        (F.col("c_custkey") + c * CUST_STRIDE).alias("c_custkey"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")), 4)

    def orders_clone(df, c):
        hot = (F.lit(c > 0)
               & (F.col("o_orderkey") % HOT_FRAC_MOD < 3))
        return df.select(
            (F.col("o_orderkey") + c * ORDER_STRIDE).alias("o_orderkey"),
            F.when(hot, F.lit(0).cast("long"))
            .otherwise(F.col("o_custkey") + c * CUST_STRIDE)
            .alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority")

    write("orders", _clones(rd("orders"), n, orders_clone), 16)

    def lineitem_clone(df, c):
        hot = (F.lit(c > 0)
               & ((F.col("l_orderkey") + F.col("l_linenumber")) % 2 == 0))
        return df.select(
            F.when(hot, F.col("l_orderkey") % HOT_ORDERS)
            .otherwise(F.col("l_orderkey") + c * ORDER_STRIDE)
            .alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate")

    write("lineitem", _clones(rd("lineitem"), n, lineitem_clone), 32)

    def events_clone(df, c):
        hot = F.lit(c > 0) & (F.col("event_id") % 2 == 0)
        return df.select(
            (F.col("event_id") + c * EVENT_STRIDE).alias("event_id"), "ts",
            F.when(hot, F.lit(0).cast("long"))
            .otherwise(F.col("user_id") + c * USER_STRIDE).alias("user_id"),
            "event_type", "value", "props")

    write("events", _clones(rd("events"), n, events_clone), 8)

    def documents_clone(df, c):
        hot = F.lit(c > 0) & (F.col("doc_id") % HOT_FRAC_MOD < 3)
        near = (F.col("text") if c == 0
                else F.concat("text", F.lit(f" xq{c}")))
        near_chars = (F.col("n_chars")
                      + (0 if c == 0 else len(f" xq{c}")))
        return df.select(
            (F.col("doc_id") + c * DOC_STRIDE).alias("doc_id"),
            F.when(hot, F.lit(hot_doc)).otherwise(near).alias("text"),
            "lang", "source",
            F.when(hot, F.lit(len(hot_doc)).cast("long"))
            .otherwise(near_chars).alias("n_chars"))

    write("documents", _clones(rd("documents"), n, documents_clone), 8)

    hot_vec_col = F.array(*[F.lit(float(v)).cast("float") for v in hot_vec])

    def embeddings_clone(df, c):
        hot = F.lit(c > 0) & (F.col("vec_id") % HOT_FRAC_MOD < 3)
        near = F.expr(
            f"transform(embedding, (x, i) -> cast(x + (case when i = 0 "
            f"then {c} * 0.001 else 0.0 end) as float))")
        return df.select(
            (F.col("vec_id") + c * VEC_STRIDE).alias("vec_id"),
            F.when(hot, hot_vec_col).otherwise(near).alias("embedding"),
            "label")

    write("embeddings", _clones(rd("embeddings"), n, embeddings_clone), 4)

    return timings


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark()
    t0 = time.time()
    generate(spark, out_dir, n)
    print(f"wrote {n}x SKEWED clone of {BASE} to {out_dir} "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
