"""The composed streaming curation topology (streaming/curation.py):
stream == batch equality of every merged store, and the mid-stream
kill/resume proof — a batch killed after two of its five store writes
must, after resume from the same checkpoint, leave every store
IDENTICAL to an uninterrupted run (exactly-once across the composed
stores, VERDICT r6 next #5)."""

import pyspark.sql.functions as F
import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

import hpctoolkit_dataframe_spark.streaming.curation as sc
from hpctoolkit_dataframe_spark.queries import load_table

from .conftest import SF_DIR

N_CHUNKS = 3


def _make_stream(spark, tmp_path, name):
    """sf0.001 documents split into N_CHUNKS single-file chunks by
    doc_id range — a deterministic 3-batch availableNow stream."""
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text", "lang", "source")
    n = docs.count()
    step = (n + N_CHUNKS - 1) // N_CHUNKS
    stream_dir = tmp_path / name
    stream_dir.mkdir()
    for i in range(N_CHUNKS):
        chunk = docs.filter((F.col("doc_id") >= i * step)
                            & (F.col("doc_id") < (i + 1) * step))
        chunk.coalesce(1).write.mode("overwrite") \
            .parquet(str(tmp_path / f"{name}_tmp{i}"))
        part = next((tmp_path / f"{name}_tmp{i}").glob("*.parquet"))
        part.rename(stream_dir / f"b{i}.parquet")
    return (spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(str(stream_dir)))


def _run(spark, tmp_path, label, fail_after=None):
    base = str(tmp_path / f"{label}_stores")
    ckpt = str(tmp_path / f"{label}_ckpt")
    stream = _make_stream(spark, tmp_path, f"{label}_src")
    if fail_after is not None:
        with pytest.raises(StreamingQueryException):
            sc.run_curation_stream(stream, base, ckpt,
                                   query_name=f"cur_{label}",
                                   fail_after=fail_after)
        # resume: same base + checkpoint, fault removed
        stream = (spark.readStream.schema(stream.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(tmp_path / f"{label}_src")))
    sc.run_curation_stream(stream, base, ckpt,
                           query_name=f"cur_{label}_resume")
    return base, sc.curation_stream_report(spark, base)


def test_kill_resume_equals_uninterrupted(spark, tmp_path):
    base_a, report_a = _run(spark, tmp_path, "a")
    # kill batch 1 after its 2nd store write (cms + dsir committed,
    # fingerprints/grams/curated not yet)
    base_b, report_b = _run(spark, tmp_path, "b", fail_after=(1, 2))

    assert report_a == report_b, (report_a, report_b)
    # every store saw each batch exactly once
    for store in sc.DOC_STORES:
        assert report_a[store]["batches"] == list(range(N_CHUNKS)), store

    # merged stores equal their batch-built equivalents
    docs = load_table(spark, SF_DIR, "documents") \
        .filter(F.col("text").isNotNull())
    n_th = docs.select(F.md5("text")).distinct().count()
    assert report_a["fingerprints"]["distinct_th"] == n_th

    toks = docs.select(F.explode(F.split("text", r"\s+")).alias("tok")) \
        .filter(F.col("tok") != "")
    n_tok = toks.count()
    from hpctoolkit_dataframe_spark.queries.sketches import CMS_D
    assert report_a["cms"]["total_c"] == n_tok * CMS_D
    assert report_a["dsir"]["total_rc"] == n_tok

    # the merged CMS equals a batch-built CMS over the whole corpus
    from hpctoolkit_dataframe_spark.queries.sketches import cms_counters
    merged = (spark.read.parquet(f"{base_a}/cms")
              .groupBy("i", "b").agg(F.sum("c").cast("long").alias("c")))
    ref = cms_counters(toks)
    assert merged.exceptAll(ref).count() == 0
    assert ref.exceptAll(merged).count() == 0

    # curated: no doc survives twice, and no kept text is an exact dup
    cur = spark.read.parquet(f"{base_a}/curated")
    assert cur.count() == cur.select("doc_id").distinct().count()
    assert cur.count() == cur.select(F.md5("text")).distinct().count()

    # stream == batch twin on the kept set: chunks are doc_id ranges in
    # ascending order, so the stream's keep-first rule (prior store,
    # then min doc_id within batch) equals the global min-doc_id
    # canonical; kept iff that canonical doc clears the word floor
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    batch_kept = (docs
                  .withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") == 1)
                  .filter(F.size(F.split("text", r"\s+")) >= sc.MIN_WORDS)
                  .select("doc_id"))
    stream_ids = {r["doc_id"] for r in cur.select("doc_id").collect()}
    batch_ids = {r["doc_id"] for r in batch_kept.collect()}
    assert stream_ids == batch_ids


def test_new_files_resume_without_replay(spark, tmp_path):
    """Adding a file to a drained stream and re-invoking with the same
    checkpoint processes ONLY the new file (the incremental-operation
    contract): prior batch partitions are untouched."""
    base = str(tmp_path / "stores")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text", "lang", "source")
    stream_dir = tmp_path / "src"
    stream_dir.mkdir()

    def add_chunk(lo, hi, fname):
        chunk = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        tmp = tmp_path / f"tmp_{fname}"
        chunk.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        next(tmp.glob("*.parquet")).rename(stream_dir / fname)

    def drain(qn):
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(stream_dir)))
        sc.run_curation_stream(stream, base, ckpt, query_name=qn)

    add_chunk(0, 250, "b0.parquet")
    drain("inc0")
    r1 = sc.curation_stream_report(spark, base)
    assert r1["curated"]["batches"] == [0]

    add_chunk(250, 500, "b1.parquet")
    drain("inc1")
    r2 = sc.curation_stream_report(spark, base)
    assert r2["curated"]["batches"] == [0, 1]
    # batch 0's merged contribution unchanged — no replay happened
    b0 = (spark.read.parquet(f"{base}/curated")
          .filter(F.col("batch_id") == 0).count())
    pre = (spark.read.parquet(f"{base}/curated")
           .filter(F.col("batch_id") == 0)
           .agg(F.min("doc_id"), F.max("doc_id")).collect()[0])
    assert b0 > 0 and pre[1] < 250


def test_compaction_preserves_stores_and_dedup(spark, tmp_path):
    """compact_curation_stores folds committed batch partitions into a
    consolidated batch_id=-1 partition: merged metrics must be
    unchanged, file counts must drop, and — the load-bearing part — a
    LATER batch's as-of-start reads must still see the consolidated
    history (-1 < any real batch id), so re-sent content is still
    flagged as a store duplicate."""
    base = str(tmp_path / "stores")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, SF_DIR, "documents") \
        .select("doc_id", "text", "lang", "source")
    stream_dir = tmp_path / "src"
    stream_dir.mkdir()

    def stage(df, fname):
        tmp = tmp_path / f"tmp_{fname}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        next(tmp.glob("*.parquet")).rename(stream_dir / fname)

    def drain(qn):
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(stream_dir)))
        sc.run_curation_stream(stream, base, ckpt, query_name=qn)

    stage(docs.filter(F.col("doc_id") < 250), "b0.parquet")
    drain("cmp0")
    before = sc.curation_stream_report(spark, base)

    files = sc.compact_curation_stores(spark, base)
    for store, (b, a) in files.items():
        assert a <= b, (store, files)
    after = sc.curation_stream_report(spark, base)
    for store in ("fingerprints", "grams", "cms", "dsir"):
        b = {k: v for k, v in before[store].items() if k != "batches"}
        a = {k: v for k, v in after[store].items() if k != "batches"}
        assert a == b, (store, b, a)
        assert after[store]["batches"] == [-1], store

    # a later batch re-sending batch-0 content under NEW ids must be
    # fully deduped against the compacted store
    resend = docs.filter(F.col("doc_id") < 250).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        "text", "lang", "source")
    stage(resend, "b1.parquet")
    drain("cmp1")
    cur1 = (spark.read.parquet(f"{base}/curated")
            .filter(F.col("batch_id") == 1))
    assert cur1.count() == 0  # every text already known to the store
    final = sc.curation_stream_report(spark, base)
    assert final["fingerprints"]["distinct_th"] == \
        before["fingerprints"]["distinct_th"]
