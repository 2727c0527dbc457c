#!/usr/bin/env python
"""Continuous curation demo: the composed document topology
(streaming/curation.py — fingerprint + gram + CMS + DSIR stores and
the curated sink, all per-batch-idempotent) running alongside the
events-side funnel store (streaming/events.run_funnel_stream), both
from file streams under one base directory with checkpointed resume.

The streaming shape of tools/curation_run.py: invoke once to bootstrap
the stores, drop more parquet files into <base>/incoming_docs or
/incoming_events, invoke again — only the NEW files process (offsets
live in the checkpoints), the stores grow in place, and the final
report composes every store driver-side.

Usage: python tools/curation_stream_run.py [sf_dir] [base_dir]
                                           [doc_chunks] [event_chunks]
Prints a one-line JSON report.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from hpctoolkit_dataframe_spark.queries import load_table  # noqa: E402
from hpctoolkit_dataframe_spark.streaming import curation as sc  # noqa: E402
from hpctoolkit_dataframe_spark.streaming import events as se  # noqa: E402


def _chunked_copy(df, key, n_chunks, out_dir, tmp_root):
    """Split ``df`` into n single-file chunks by key range (hash-free:
    deterministic, resumable) unless the dir already has files."""
    os.makedirs(out_dir, exist_ok=True)
    if any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return
    bounds = df.agg(F.min(key), F.max(key)).collect()[0]
    lo, hi = bounds[0], bounds[1] + 1
    step = (hi - lo + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        chunk = df.filter((F.col(key) >= lo + i * step)
                          & (F.col(key) < lo + (i + 1) * step))
        tmp = f"{tmp_root}/chunk{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(f"{tmp}/{part}", f"{out_dir}/b{i:03d}.parquet")


def main() -> None:
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # default to a FRESH base per run: reusing a base whose checkpoint
    # survived but whose warehouse tables were cleaned makes the drain
    # a silent no-op (every file "already processed") and the report
    # reads empty — pass an explicit base to exercise resume instead
    base = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curation_stream_")
    doc_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    ev_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    spark = get_spark()
    t0 = time.time()

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    _chunked_copy(docs, "doc_id", doc_chunks,
                  f"{base}/incoming_docs", f"{base}/_tmp_docs")
    ev = load_table(spark, sf_dir, "events")
    _chunked_copy(ev, "ts", ev_chunks,
                  f"{base}/incoming_events", f"{base}/_tmp_events")

    doc_stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(f"{base}/incoming_docs"))
    sc.run_curation_stream(doc_stream, f"{base}/stores",
                           f"{base}/ckpt_docs")

    ev_stream = (spark.readStream.schema(ev.schema)
                 .option("maxFilesPerTrigger", 1)
                 .parquet(f"{base}/incoming_events"))
    funnel_out = se.run_funnel_stream(
        ev_stream, "curation_demo_funnel",
        checkpoint_dir=f"{base}/ckpt_events")

    report = sc.curation_stream_report(spark, f"{base}/stores")
    stages = {r["stage"]: r["n"] for r in funnel_out.groupBy("stage")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    report["funnel"] = {
        "stages": stages,
        "batches": sorted(r["batch_id"] for r in funnel_out
                          .select("batch_id").distinct().collect()),
    }
    report["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
