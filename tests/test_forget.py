"""Delete propagation (right to be forgotten): hashes unique to the
forgotten docs leave every store; hashes shared with survivors MUST
stay, or dedup state for the surviving corpus is corrupted."""

import uuid

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.queries.dedup import (
    check_batch_against_store, drop_fingerprint_store, fingerprint_split,
    write_fingerprint_store)
from hpctoolkit_dataframe_spark.queries.forget import (
    forget_documents, forget_in_shards)
from hpctoolkit_dataframe_spark.queries.spans import (
    _positions, write_gram_store)

BOILER = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words


def _corpus(spark, tmp_path):
    """4 docs: 1 and 2 are byte-identical; 3 shares the 8-word
    boilerplate span with 1; 4 is fully unique."""
    rows = [
        (1, f"{BOILER} india juliet kilo lima", "en", "s", 0),
        (2, f"{BOILER} india juliet kilo lima", "en", "s", 0),
        (3, f"{BOILER} mike november oscar papa", "en", "s", 0),
        (4, "unique words only here nothing shared at all ever x", "en",
         "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    sf_dir = str(tmp_path / "corpus")
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_forget_preserves_shared_hashes(spark, tmp_path):
    sf_dir = _corpus(spark, tmp_path)
    fp_table = f"fp_forget_{uuid.uuid4().hex[:8]}"
    gram_table = f"gram_forget_{uuid.uuid4().hex[:8]}"
    try:
        fps = fingerprint_split(spark, sf_dir)
        write_fingerprint_store(fps, fp_table)
        write_gram_store(
            _positions(spark.read.parquet(f"{sf_dir}/documents.parquet")),
            gram_table)
        grams_before = {r["h"] for r in spark.table(gram_table).collect()}

        audit = {r["store"]: r for r in forget_documents(
            spark, sf_dir, [1], fp_table=fp_table,
            gram_table=gram_table).collect()}

        # doc 2 is byte-identical to the forgotten doc 1: its th and
        # simhash survive, so the store still flags doc-2 content
        flags = check_batch_against_store(
            spark, fps.filter(F.col("doc_id") == 2), fp_table).head()
        assert flags["exact_dup"] == 1 and flags["near_dup"] == 1
        assert audit[fp_table]["rows_removed"] == 0  # all shared

        # gram store: the boilerplate gram (shared with doc 3) stays,
        # doc-1-only grams are gone
        grams_after = {r["h"] for r in spark.table(gram_table).collect()}
        doc_pos = _positions(
            spark.read.parquet(f"{sf_dir}/documents.parquet"))
        boiler_h = {r["h"] for r in doc_pos.filter(
            F.col("doc_id") == 3).collect()}
        doc1_h = {r["h"] for r in doc_pos.filter(
            F.col("doc_id") == 1).collect()}
        assert (boiler_h & doc1_h) <= grams_after  # shared grams kept
        # doc 1 == doc 2 byte-wise, so ALL its grams are shared: none
        # removed; forget doc 2 as well and the unique tail goes
        forget_documents(spark, sf_dir, [1, 2], fp_table=fp_table,
                         gram_table=gram_table)
        grams_final = {r["h"] for r in spark.table(gram_table).collect()}
        assert grams_final < grams_after <= grams_before
        assert not (doc1_h - boiler_h) & grams_final
        # the genuinely shared boilerplate grams STILL survive via doc 3
        assert (boiler_h & doc1_h) <= grams_final
    finally:
        drop_fingerprint_store(spark, fp_table)
        drop_fingerprint_store(spark, gram_table)


def test_forget_unique_doc_removes_fingerprints(spark, tmp_path):
    sf_dir = _corpus(spark, tmp_path)
    fp_table = f"fp_forget_{uuid.uuid4().hex[:8]}"
    try:
        fps = fingerprint_split(spark, sf_dir)
        write_fingerprint_store(fps, fp_table)
        audit = {r["store"]: r for r in forget_documents(
            spark, sf_dir, [4], fp_table=fp_table,
            gram_table="nonexistent_gram_tbl").collect()}
        assert audit[fp_table]["rows_removed"] == 1  # doc 4 is unique
        assert audit["nonexistent_gram_tbl"]["rows_before"] == -1
        flags = check_batch_against_store(
            spark, fps.filter(F.col("doc_id") == 4), fp_table).head()
        assert flags["exact_dup"] == 0 and flags["near_dup"] == 0
        # bucketed layout preserved across the rewrite
        desc = spark.sql(f"DESCRIBE EXTENDED {fp_table}").collect()
        text = "\n".join(f"{r['col_name']} {r['data_type']}" for r in desc)
        assert "Num Buckets" in text
    finally:
        drop_fingerprint_store(spark, fp_table)


def test_forget_in_shards_partition_surgery(spark, tmp_path):
    out = str(tmp_path / "shards")
    rows = [(d, 1, "en", "s", f"text {d}", d % 3) for d in range(30)]
    df = spark.createDataFrame(
        rows, "doc_id long, copy_id long, lang string, source string, "
              "text string, shard int")
    df.repartition("shard").write.partitionBy("shard") \
        .mode("overwrite").json(out)
    res = forget_in_shards(spark, out, [0, 1])  # shards 0 and 1 dirty
    assert res == {"shards_rewritten": 2, "samples_removed": 2}
    back = spark.read.json(out)
    assert back.count() == 28
    assert back.filter(F.col("doc_id").isin([0, 1])).count() == 0
    # untouched shard still intact
    assert back.filter("doc_id = 2").count() == 1
