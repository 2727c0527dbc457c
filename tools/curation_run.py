#!/usr/bin/env python
"""End-to-end training-data curation run: chain the engine's tested
stages over a documents table and materialize the final shards.

  span dedup (keep-first-owner excision)
    -> PII scrub (typed placeholders)
    -> exact dedup of the CLEANED text (cleaning can converge docs)
    -> quality gate (word-count floor after cleaning)
    -> deterministic mixture upsampling (source weights)
    -> hash-sharded JSONL export + dataset card

Every stage is the same code the oracle-gated registry queries run
(spans.cleaned_corpus, pii.redact, shaping's hash-fraction idiom);
this tool is the composition a pipeline owner would schedule.

Usage: python tools/curation_run.py [sf_dir] [out_dir]
Prints a one-line JSON dataset card; writes shard=N/*.json under
out_dir plus a per-source card parquet.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from hpctoolkit_dataframe_spark import get_spark  # noqa: E402
from hpctoolkit_dataframe_spark.queries import load_table  # noqa: E402
from hpctoolkit_dataframe_spark.queries.pii import redact  # noqa: E402
from hpctoolkit_dataframe_spark.queries.spans import cleaned_corpus  # noqa: E402

MIN_WORDS = 20  # quality floor applied AFTER span excision
N_SHARDS = 8


def curate(spark, sf_dir: str, out_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source")

    # 1) span-level dedup: foreign duplicated spans excised
    cleaned = cleaned_corpus(spark, sf_dir).join(docs, "doc_id")
    n_input = cleaned.count()

    # 2) PII scrub on the cleaned text
    scrubbed = cleaned.select(
        "doc_id", "lang", "source", "n_before", "n_after",
        redact(F.col("ctext")).alias("text"))

    # 3) exact dedup of the CLEANED+SCRUBBED bytes (excision and
    #    scrubbing can make previously-distinct docs identical);
    #    canonical = min doc_id per content hash
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (scrubbed
               .withColumn("rk", F.row_number().over(w))
               .filter(F.col("rk") == 1).drop("rk"))

    # 4) quality floor: enough words survive the cleaning
    passed = deduped.filter(F.col("n_after") >= MIN_WORDS)

    # 4b) semantic dedup: drop docs whose embedding has a kept
    #     lower-id near-twin in its k-means cell (oracle-gated
    #     semdedup_prune; vec_id == doc_id in the testdata); docs
    #     without an embedding pass through
    from hpctoolkit_dataframe_spark.queries.curation import semdedup_prune

    sem = semdedup_prune(spark, sf_dir).filter(
        F.col("is_semdup") == 1).select(F.col("vec_id").alias("doc_id"))
    passed = passed.join(sem, "doc_id", "left_anti")

    # 5) mixture: the SAME rule as the oracle-gated mixture_plan
    from hpctoolkit_dataframe_spark.queries.shaping import \
        mixture_weight_cols

    w_e2, frac_h, copies = mixture_weight_cols()
    planned = (passed.withColumn("w_e2", w_e2.cast("long"))
               .withColumn("frac_h", frac_h)
               .withColumn("copies", copies)
               .withColumn("copy_id",
                           F.explode(F.sequence(F.lit(1), F.col("copies")))))

    # 6) shard + export (epoch-level sample id keeps copies distinct)
    shard = (F.conv(F.substring(F.md5(F.concat(
        F.col("doc_id").cast("string"), F.lit("#"),
        F.col("copy_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % N_SHARDS).cast("int")
    final = planned.select(
        "doc_id", "copy_id", "lang", "source", "text",
        shard.alias("shard"))
    (final.repartition("shard").write.partitionBy("shard")
     .mode("overwrite").json(out_dir))

    card_rows = (final.groupBy("source")
                 .agg(F.count_distinct("doc_id").alias("docs"),
                      F.count(F.lit(1)).alias("samples"))
                 .collect())
    card = {
        "input_docs": n_input,
        "after_exact_dedup": deduped.count(),
        "after_quality_and_semdedup": passed.count(),
        "exported_samples": final.count(),
        "shards": N_SHARDS,
        "per_source": {r.source: {"docs": r.docs, "samples": r.samples}
                       for r in sorted(card_rows, key=lambda r: r.source)},
    }
    return card


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_")
    spark = get_spark("curation-run")
    spark.sparkContext.setLogLevel("ERROR")
    card = curate(spark, sf_dir, out_dir)
    card["out_dir"] = out_dir
    print(json.dumps(card))


if __name__ == "__main__":
    main()
