"""Streaming SCD2 maintenance: the CDC/upsert twin of the batch
``scd2_customer_history`` query (queries/curation.py).

Dimension snapshots arrive as micro-batches (one snapshot file per
trigger); a persisted interval table is MERGED incrementally instead of
re-deriving history from all snapshots:

- new key                -> open a fresh interval [snap, snap]
- same attribute value   -> extend the open interval's eff_to to snap
- changed value          -> leave the old interval closed, open a new one
- key absent from batch  -> untouched (its interval simply stops
                            extending; currency is derived at read time)

The open interval per key is the one with MAX eff_from — no flag
column, so the merge is: rank-1 window over the store, one join with
the batch, an anti-join to swap the replaced open rows, and a union.
Per batch that is ONE (custkey) shuffle over store+delta, the same
cost shape as the batch query's single window — history length never
re-enters the computation.  At 100 TB the store is a bucketed table on
custkey (cf. the incremental-dedup fingerprint store) and the swap is
a partition-overwrite MERGE.

Twin contract (test-pinned): after streaming the same snapshots the
result table is row-identical to the batch gaps-and-islands query, and
a third snapshot keeps merging correctly (the batch query is fixed at
two snapshots; the stream is generic in snap count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

SNAP_SCHEMA = "c_custkey long, snap long, seg string"
_TABLES = {"hist": "c_custkey long, seg string, eff_from long, eff_to long",
           "wm": "latest_snap long"}


def _delete_orphan_location(spark: SparkSession, table: str) -> None:
    """A session that died mid-write leaves the managed location behind
    with no catalog entry; the next saveAsTable then fails
    LOCATION_ALREADY_EXISTS (CLAUDE.md rule; cf.
    queries/dedup.py drop_fingerprint_store)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.lower())
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def _ensure_tables(spark: SparkSession, prefix: str) -> None:
    for suffix, schema in _TABLES.items():
        table = f"{prefix}_{suffix}"
        if not spark.catalog.tableExists(table):
            _delete_orphan_location(spark, table)
            spark.createDataFrame([], schema).write.saveAsTable(table)


def drop_scd2_store(spark: SparkSession, prefix: str) -> None:
    """DROP the store tables AND their managed locations."""
    for suffix in _TABLES:
        table = f"{prefix}_{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        _delete_orphan_location(spark, table)


def _merge_one_snapshot(spark: SparkSession, prefix: str,
                        snap_rows: DataFrame, snap: int) -> None:
    hist = spark.table(f"{prefix}_hist")
    rk = Window.partitionBy("c_custkey").orderBy(F.col("eff_from").desc())
    opened = (hist.withColumn("rk", F.row_number().over(rk))
              .filter(F.col("rk") == 1).drop("rk"))
    bs = snap_rows.select("c_custkey", F.col("seg").alias("seg_new"))
    # has_open disambiguates "no open interval" from "open interval
    # whose seg is NULL"; the value compare is null-safe (<=>), the
    # exact twin of the batch query's IS DISTINCT FROM — a NULL
    # attribute value extends a NULL island and closes a non-NULL one
    j = (bs.join(opened.withColumn("has_open", F.lit(1)),
                 "c_custkey", "left")
         .localCheckpoint(eager=True))
    extended = (j.filter(F.col("has_open").isNotNull()
                         & F.col("seg").eqNullSafe(F.col("seg_new")))
                .select("c_custkey", "seg", "eff_from",
                        F.lit(snap).cast("long").alias("eff_to")))
    inserted = (j.filter(F.col("has_open").isNull()
                         | ~F.col("seg").eqNullSafe(F.col("seg_new")))
                .select("c_custkey", F.col("seg_new").alias("seg"),
                        F.lit(snap).cast("long").alias("eff_from"),
                        F.lit(snap).cast("long").alias("eff_to")))
    next_hist = (hist.join(extended.select("c_custkey", "eff_from"),
                           ["c_custkey", "eff_from"], "left_anti")
                 .unionByName(extended)
                 .unionByName(inserted)
                 .localCheckpoint(eager=True))
    next_hist.write.mode("overwrite").saveAsTable(f"{prefix}_hist")
    spark.createDataFrame([(snap,)], "latest_snap long") \
        .write.mode("overwrite").saveAsTable(f"{prefix}_wm")
    for t in ("hist", "wm"):
        spark.catalog.refreshTable(f"{prefix}_{t}")


def run_scd2_stream(snap_stream: DataFrame, prefix: str,
                    checkpoint_dir: str | None = None,
                    query_name: str = "scd2_stream") -> DataFrame:
    """Drain the snapshot stream (availableNow) into the persisted
    interval store.  A batch holding several snapshots merges them in
    ascending snap order, so correctness needs only CROSS-batch
    ordering (the file source's mtime order — same in-order contract
    as the funnel/as-of twins)."""
    spark = snap_stream.sparkSession
    _ensure_tables(spark, prefix)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.localCheckpoint(eager=True)
        snaps = [r["snap"] for r in
                 b.select("snap").distinct().orderBy("snap").collect()]
        for s in snaps:
            _merge_one_snapshot(
                spark, prefix, b.filter(F.col("snap") == s), int(s))

    writer = snap_stream.writeStream.foreachBatch(process)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.queryName(query_name).trigger(availableNow=True).start()
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(
            "scd2 stream drain did not finish within 600s; the store "
            "would be partial — not returning a result")
    return scd2_stream_result(spark, prefix)


def scd2_stream_result(spark: SparkSession, prefix: str) -> DataFrame:
    """Interval table + derived currency — same schema as the batch
    ``scd2_customer_history`` output."""
    latest = spark.table(f"{prefix}_wm")
    return (spark.table(f"{prefix}_hist")
            .crossJoin(F.broadcast(latest))
            .select("c_custkey", "seg", "eff_from", "eff_to",
                    (F.col("eff_to") == F.col("latest_snap"))
                    .cast("int").alias("is_current")))
