"""Streaming SCD2 maintenance twin: merging snapshots incrementally
must reproduce the batch gaps-and-islands query exactly, and keep
merging correctly past the batch query's two-snapshot horizon."""

import os
import shutil
import uuid

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.queries import REGISTRY, load_table
from hpctoolkit_dataframe_spark.streaming.scd2 import (
    SNAP_SCHEMA, run_scd2_stream, scd2_stream_result)

SF_DIR = "/root/testdata/sf0.001"


def _snapshots(spark):
    # s1/s2 come from the SAME builder the batch query runs — the
    # simulation cannot drift between the query and this twin test
    from hpctoolkit_dataframe_spark.queries.curation import scd2_snapshots

    cust = load_table(spark, SF_DIR, "customer")
    s1, s2 = scd2_snapshots(spark, SF_DIR)
    # snapshot 3 extends past the batch query's horizon: more deletes
    # (%5) and a second re-segmentation wave (%3)
    s3 = (cust.filter((F.col("c_custkey") % 17 != 0)
                      & (F.col("c_custkey") % 5 != 0))
          .select("c_custkey", F.lit(3).cast("long").alias("snap"),
                  F.when(F.col("c_custkey") % 3 == 0, "SEGMENT-Y")
                  .when(F.col("c_custkey") % 7 == 0, "SEGMENT-X")
                  .otherwise(F.col("c_mktsegment")).alias("seg")))
    return s1, s2, s3


def _drop_file(df, stage_dir: str, watch_dir: str, name: str,
               mtime: int) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(stage_dir)
    part = next(p for p in os.listdir(stage_dir)
                if p.endswith(".parquet"))
    dest = os.path.join(watch_dir, name)
    shutil.copy(os.path.join(stage_dir, part), dest)
    os.utime(dest, (mtime, mtime))


def _expected_islands(rows_by_snap):
    """Python gaps-and-islands reference over any number of snapshots."""
    latest = max(rows_by_snap)
    per_key = {}
    for snap in sorted(rows_by_snap):
        for key, seg in rows_by_snap[snap]:
            per_key.setdefault(key, []).append((snap, seg))
    out = set()
    _unset = object()  # None is a legitimate attribute value (NULL)
    for key, seq in per_key.items():
        start_snap, cur_seg, last_snap = None, _unset, None
        for snap, seg in seq:
            if cur_seg is _unset or seg != cur_seg:
                if cur_seg is not _unset:
                    out.add((key, cur_seg, start_snap, last_snap,
                             int(last_snap == latest)))
                start_snap, cur_seg = snap, seg
            last_snap = snap
        out.add((key, cur_seg, start_snap, last_snap,
                 int(last_snap == latest)))
    return out


def test_scd2_stream_matches_batch_then_extends(spark, tmp_path):
    s1, s2, s3 = _snapshots(spark)
    watch = tmp_path / "snaps"
    watch.mkdir()
    ckpt = str(tmp_path / "ckpt")
    prefix = f"scd2s_{uuid.uuid4().hex[:8]}"
    _drop_file(s1, str(tmp_path / "st1"), str(watch), "s1.parquet", 1000)
    _drop_file(s2, str(tmp_path / "st2"), str(watch), "s2.parquet", 2000)

    def _stream():
        sdf = (spark.readStream.schema(SNAP_SCHEMA)
               .option("maxFilesPerTrigger", 1)
               .parquet(str(watch)))
        return run_scd2_stream(sdf, prefix, checkpoint_dir=ckpt)

    got = {tuple(r) for r in _stream().collect()}
    want = {tuple(r) for r in
            REGISTRY["scd2_customer_history"].fn(spark, SF_DIR).collect()}
    assert got == want  # stream == batch on the two-snapshot history

    # snapshot 3 arrives later; the checkpoint resumes with ONLY the
    # new file, merging into the persisted intervals
    _drop_file(s3, str(tmp_path / "st3"), str(watch), "s3.parquet", 3000)
    got3 = {tuple(r) for r in _stream().collect()}
    rows_by_snap = {
        i + 1: {(r["c_custkey"], r["seg"]) for r in s.collect()}
        for i, s in enumerate((s1, s2, s3))}
    assert got3 == _expected_islands(rows_by_snap)
    # re-draining with no new files changes nothing (exact replay)
    assert {tuple(r) for r in _stream().collect()} == got3
    for t in ("hist", "wm"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_scd2_stream_result_schema_matches_batch(spark, tmp_path):
    s1, _, _ = _snapshots(spark)
    watch = tmp_path / "snaps"
    watch.mkdir()
    prefix = f"scd2s_{uuid.uuid4().hex[:8]}"
    _drop_file(s1, str(tmp_path / "st1"), str(watch), "s1.parquet", 1000)
    sdf = (spark.readStream.schema(SNAP_SCHEMA)
           .option("maxFilesPerTrigger", 1).parquet(str(watch)))
    run_scd2_stream(sdf, prefix, checkpoint_dir=str(tmp_path / "ck"))
    got = scd2_stream_result(spark, prefix)
    want = REGISTRY["scd2_customer_history"].fn(spark, SF_DIR)
    assert got.schema == want.schema
    # one open interval per key, all current after a single snapshot
    rows = got.collect()
    assert rows and all(r["is_current"] == 1 for r in rows)
    assert len({r["c_custkey"] for r in rows}) == len(rows)
    for t in ("hist", "wm"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_scd2_merge_null_attribute_values(spark):
    """NULL attribute semantics must mirror the batch query's
    IS DISTINCT FROM: NULL extends a NULL island, closes a non-NULL
    one, and a NULL->value change opens a new interval (a plain
    equality merge silently drops these rows)."""
    from hpctoolkit_dataframe_spark.streaming.scd2 import (
        _ensure_tables, _merge_one_snapshot, drop_scd2_store,
        scd2_stream_result)

    prefix = f"scd2n_{uuid.uuid4().hex[:8]}"
    _ensure_tables(spark, prefix)
    try:
        snap1 = spark.createDataFrame(
            [(1, 1, "A"), (2, 1, None), (3, 1, "C")],
            "c_custkey long, snap long, seg string")
        snap2 = spark.createDataFrame(
            [(1, 2, None),   # value -> NULL: close A, open NULL island
             (2, 2, None),   # NULL -> NULL: extend, no duplicate island
             (3, 2, "C")],   # unchanged
            "c_custkey long, snap long, seg string")
        _merge_one_snapshot(spark, prefix, snap1, 1)
        _merge_one_snapshot(spark, prefix, snap2, 2)
        got = {(r["c_custkey"], r["seg"], r["eff_from"], r["eff_to"],
                r["is_current"])
               for r in scd2_stream_result(spark, prefix).collect()}
        assert got == {
            (1, "A", 1, 1, 0), (1, None, 2, 2, 1),
            (2, None, 1, 2, 1),
            (3, "C", 1, 2, 1),
        }
    finally:
        drop_scd2_store(spark, prefix)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(history=st.lists(  # per snapshot: {key: seg-or-None}, absent=delete
    st.dictionaries(st.integers(1, 6),
                    st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),
                    max_size=6),
    min_size=1, max_size=4))
def test_scd2_merge_property_random_histories(spark, history):
    """Merging ANY random snapshot sequence (random keys, values,
    NULLs, deletions) must equal the Python gaps-and-islands reference
    — the generic guarantee behind the two fixture tests."""
    from hpctoolkit_dataframe_spark.streaming.scd2 import (
        _ensure_tables, _merge_one_snapshot, drop_scd2_store,
        scd2_stream_result)

    prefix = f"scd2p_{uuid.uuid4().hex[:8]}"
    _ensure_tables(spark, prefix)
    try:
        for i, snap in enumerate(history, start=1):
            rows = [(k, i, seg) for k, seg in snap.items()]
            df = spark.createDataFrame(
                rows, "c_custkey long, snap long, seg string") \
                if rows else spark.createDataFrame(
                    [], "c_custkey long, snap long, seg string")
            _merge_one_snapshot(spark, prefix, df, i)
        got = {tuple(r) for r in
               scd2_stream_result(spark, prefix).collect()}
        rows_by_snap = {i: set(snap.items())
                        for i, snap in enumerate(history, start=1)}
        # the reference treats None like any other value (IS DISTINCT
        # FROM semantics), which _expected_islands' == already does
        assert got == _expected_islands(rows_by_snap)
    finally:
        drop_scd2_store(spark, prefix)
