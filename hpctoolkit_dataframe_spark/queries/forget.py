"""Right-to-be-forgotten delete propagation: remove a set of documents
from every persisted derived store WITHOUT corrupting dedup state for
the surviving corpus.

The subtlety the naive implementation gets wrong: the fingerprint and
gram stores keep DISTINCT content hashes with no doc ids, and a hash
can be SHARED (boilerplate paragraphs, exact-dup documents).  Deleting
every hash a forgotten doc ever produced would un-mark duplicates that
other documents still legitimately carry — so each store removes only
the hashes UNIQUE to the forgotten set (anti-join against the
survivors' recomputed hashes).  That requires one pass over the corpus
per store key — forgetting is rare and audit-grade, so that cost is
the contract; the rewrite itself preserves each store's bucketing so
subsequent incremental checks still join bucket-aligned.

100 TB shape: victims are a broadcast-able id list; the survivor
hash sets are the same exchanges the store builds used; the store
rewrite is anti-join + bucketed write (at warehouse scale, a
partition-overwrite MERGE on the bucket key).

Reference parity note: no equivalent in mbdevpl/hpctoolkit_dataframe —
this is LLM-pipeline data governance (SURVEY.md §6), the operational
complement of dq_report and the PII scrub.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import load_table
from .dedup import (
    FP_STORE_BUCKETS, FP_STORE_TABLE, drop_fingerprint_store,
    fingerprint_split)
from .spans import GRAM_STORE_BUCKETS, GRAM_STORE_TABLE, _positions


def _unique_to_victims(all_rows: DataFrame, key: str,
                       victim_ids: Sequence[int]) -> DataFrame:
    """DISTINCT `key` values produced by the victim docs and by NO
    surviving doc — the only hashes that are safe to delete."""
    is_victim = F.col("doc_id").isin(list(victim_ids))
    victims = all_rows.filter(is_victim).select(key).distinct()
    survivors = all_rows.filter(~is_victim).select(key).distinct()
    return victims.join(survivors, key, "left_anti")


def forget_documents(spark: SparkSession, sf_dir: str,
                     doc_ids: Sequence[int],
                     fp_table: str = FP_STORE_TABLE,
                     gram_table: str = GRAM_STORE_TABLE) -> DataFrame:
    """Propagate deletion of ``doc_ids`` through the fingerprint store
    (exact-dup th + near-dup simhash) and the K-gram store, returning
    an audit frame (store, key, rows_before, rows_removed, rows_after).
    Stores that do not exist are skipped (audited as rows_before=-1)."""
    from ..sources.sinks import write_bucketed_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    audit = []

    if spark.catalog.tableExists(fp_table):
        fps = fingerprint_split(spark, sf_dir)
        store = spark.table(fp_table).localCheckpoint(eager=True)
        before = store.count()
        rm_th = _unique_to_victims(fps, "th", doc_ids)
        rm_sim = _unique_to_victims(fps, "simhash", doc_ids)
        kept = (store.join(rm_th, "th", "left_anti")
                .join(rm_sim, "simhash", "left_anti")
                .select(*store.columns)
                .localCheckpoint(eager=True))
        after = kept.count()
        drop_fingerprint_store(spark, fp_table)
        write_bucketed_table(kept, fp_table, bucket_cols=("th",),
                             n_buckets=FP_STORE_BUCKETS,
                             sort_cols=("th",))
        spark.catalog.refreshTable(fp_table)
        audit.append((fp_table, "th/simhash", before, before - after,
                      after))
    else:
        audit.append((fp_table, "th/simhash", -1, 0, -1))

    if spark.catalog.tableExists(gram_table):
        pos = _positions(docs).select("doc_id", "h")
        store = spark.table(gram_table).localCheckpoint(eager=True)
        before = store.count()
        rm_h = _unique_to_victims(pos, "h", doc_ids)
        kept = (store.join(rm_h, "h", "left_anti")
                .select(*store.columns).localCheckpoint(eager=True))
        after = kept.count()
        drop_fingerprint_store(spark, gram_table)  # drop + orphan clean
        write_bucketed_table(kept, gram_table, bucket_cols=("h",),
                             n_buckets=GRAM_STORE_BUCKETS,
                             sort_cols=("h",))
        spark.catalog.refreshTable(gram_table)
        audit.append((gram_table, "h", before, before - after, after))
    else:
        audit.append((gram_table, "h", -1, 0, -1))

    return spark.createDataFrame(
        audit, "store string, key string, rows_before long, "
               "rows_removed long, rows_after long")


def forget_in_shards(spark: SparkSession, shard_dir: str,
                     doc_ids: Sequence[int]) -> dict:
    """Rewrite exported JSONL training shards without the forgotten
    docs.  Only shards that actually contain a victim row are
    rewritten (partition-level surgery, not a full-corpus rewrite)."""
    back = spark.read.json(shard_dir)
    is_victim = F.col("doc_id").isin(list(doc_ids))
    dirty = [r["shard"] for r in
             back.filter(is_victim).select("shard").distinct().collect()]
    removed = 0
    for shard in dirty:
        part = spark.read.json(f"{shard_dir}/shard={shard}")
        kept = part.filter(~is_victim)
        n_before = part.count()
        kept_rows = kept.localCheckpoint(eager=True)
        n_after = kept_rows.count()
        kept_rows.drop("shard").write.mode("overwrite").json(
            f"{shard_dir}/shard={shard}")
        removed += n_before - n_after
    return {"shards_rewritten": len(dirty), "samples_removed": removed}
