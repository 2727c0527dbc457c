#!/usr/bin/env python
"""Combined-axis clone: SKEW x ADVERSARIAL (VERDICT r7 next #7).

Each probe axis found real bugs alone (the skew clone: a x17 funnel
blow-up, the forced-SHJ OOM; the adversarial clone: seven one-bad-row
ANSI job-killers).  Their PRODUCT is where state machines break: a hot
key whose payload is also degenerate exercises the hot-path handling
AND the degenerate-content handling in the same task.  This generator
post-processes a skew clone (tools/make_skew_data.py output) so the
hot keys carry adversarial content:

- **documents**: the 13.5k-member mega-dup cluster becomes 13.5k
  byte-identical copies of a UNICODE-whitespace document (NBSP + thin
  space + CJK — the r7 tokenizer-divergence class), and ~1% of
  clone docs get NULL text — a NULL-text population at volume.
- **embeddings**: the giant IVF/k-means cell becomes near-zero
  vectors (1e-8 components — zero after int quantization, nonzero in
  float: the two norm conventions must still agree), and ~1% of
  clone vectors are exact zero-norm at volume.
- **events**: the bot user keeps ~45% of all events but now ~10% of
  its rows carry malformed/empty JSON props, ~2% NULL values, and a
  sprinkle of $3e7 values (the 128-bit-moment magnitude); separately
  ~2.7% of ALL clone events get a NULL user_id — making NULL itself a
  hot window-partition key, with full view->click->purchase chains
  that must never convert (equi-join NULL semantics, ADVICE r7).

Other tables copy through unchanged.  All mutations are deterministic
column arithmetic keyed off the skew clone's id layout
(make_skew_data.py strides), no RNG.

Usage: python tools/make_skewadv_data.py [skew_dir] [out_dir]
       (defaults: /tmp/skew_sf1, /tmp/skewadv_sf1)

BPE entries need the corpus-keyed golden regenerated for the new
corpus: ``python tools/make_bpe_fixture.py ... <out_dir>``.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from tools.make_scale_data import (  # noqa: E402
    DOC_STRIDE, EVENT_STRIDE, VEC_STRIDE)
from tools.make_skew_data import HOT_FRAC_MOD  # noqa: E402

# the mega-dup payload: unicode whitespace (NBSP U+00A0, thin space
# U+2009), CJK, and ASCII mixed — every tokenizer-divergence trigger
# the r7 adversarial docs carried, now at 13.5k copies
HOT_ADV_TEXT = ("boilerplate\xa0header and navigation menu "
                "日本語 mixed ascii footer terms "
                "privacy contact about")


def generate(spark, skew_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rd = lambda t: spark.read.parquet(f"{skew_dir}/{t}.parquet")  # noqa: E731

    def write(name, df, files):
        t0 = time.time()
        (df.repartition(files)
         .write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet"))
        print(f"  {name}: {files} files in {time.time() - t0:.2f}s",
              flush=True)

    for t in ("region", "nation", "part", "supplier", "customer",
              "orders", "lineitem"):
        src, dst = f"{skew_dir}/{t}.parquet", f"{out_dir}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy(src, dst)

    clone_doc = F.col("doc_id") >= DOC_STRIDE
    hot_doc = clone_doc & (F.col("doc_id") % HOT_FRAC_MOD < 3)
    null_doc = clone_doc & (F.col("doc_id") % 100 == 37)
    write("documents", rd("documents").select(
        "doc_id",
        F.when(null_doc, F.lit(None).cast("string"))
        .when(hot_doc, F.lit(HOT_ADV_TEXT))
        .otherwise(F.col("text")).alias("text"),
        "lang", "source",
        F.when(null_doc, F.lit(None).cast("long"))
        .when(hot_doc, F.lit(len(HOT_ADV_TEXT)).cast("long"))
        .otherwise(F.col("n_chars")).alias("n_chars")), 8)

    clone_vec = F.col("vec_id") >= VEC_STRIDE
    hot_vec = clone_vec & (F.col("vec_id") % HOT_FRAC_MOD < 3)
    zero_vec = clone_vec & (F.col("vec_id") % 100 == 37)
    write("embeddings", rd("embeddings").select(
        "vec_id",
        F.when(zero_vec, F.expr(
            "transform(embedding, x -> cast(0.0 as float))"))
        .when(hot_vec, F.expr(
            "transform(embedding, x -> cast(1.0e-8 as float))"))
        .otherwise(F.col("embedding")).alias("embedding"),
        "label"), 4)

    clone_ev = F.col("event_id") >= EVENT_STRIDE
    bot = clone_ev & (F.col("user_id") == 0)
    null_user = clone_ev & (F.col("event_id") % 37 == 0)
    write("events", rd("events").select(
        "event_id", "ts",
        F.when(null_user, F.lit(None).cast("long"))
        .otherwise(F.col("user_id")).alias("user_id"),
        "event_type",
        F.when(bot & (F.col("event_id") % 50 == 12),
               F.lit(None).cast("double"))
        .when(bot & (F.col("event_id") % 1000 == 124), F.lit(3.0e7))
        .otherwise(F.col("value")).alias("value"),
        F.when(bot & (F.col("event_id") % 20 == 6),
               F.lit("not json at all"))
        .when(bot & (F.col("event_id") % 20 == 16), F.lit(""))
        .otherwise(F.col("props")).alias("props")), 8)


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew_sf1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewadv_sf1"
    spark = get_spark()
    t0 = time.time()
    generate(spark, skew_dir, out_dir)
    print(f"wrote SKEW x ADVERSARIAL clone of {skew_dir} to {out_dir} "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
