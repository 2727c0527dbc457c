"""Curation-query invariants beyond the DuckDB oracle: determinism,
per-group caps, and posting-list bounds."""

from collections import Counter

from hpctoolkit_dataframe_spark.queries import REGISTRY
from hpctoolkit_dataframe_spark.queries.pipeline import (
    POSTING_CAP, SAMPLE_PER_GROUP, TOP_TERMS_K)

SF_DIR = "/root/testdata/sf0.001"


def test_stratified_sample_caps_and_determinism(spark):
    fn = REGISTRY["stratified_sample"].fn
    rows = fn(spark, SF_DIR).collect()
    per_group = Counter((r["lang"], r["source"]) for r in rows)
    assert max(per_group.values()) <= SAMPLE_PER_GROUP
    again = {(r["doc_id"], r["rk"]) for r in fn(spark, SF_DIR).collect()}
    assert again == {(r["doc_id"], r["rk"]) for r in rows}


def test_quality_top_decile_is_a_decile(spark):
    rows = REGISTRY["quality_top_decile"].fn(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # >= 10% by definition of P90 (ties can only add rows)
    assert n_docs // 10 <= len(rows) <= n_docs // 5
    scores = [r["density_milli"] for r in rows]
    assert min(scores) >= 1  # integer score, strictly positive


def test_posting_lists_bounded_and_sorted(spark):
    rows = REGISTRY["posting_lists"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        ids = [int(x) for x in r["postings"].split("/")]
        assert ids == sorted(ids)
        assert len(ids) == min(r["df"], POSTING_CAP)


def test_top_terms_per_doc_k_rows_each(spark):
    rows = REGISTRY["top_terms_per_doc"].fn(spark, SF_DIR).collect()
    per_doc = Counter(r["doc_id"] for r in rows)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(per_doc) == n_docs
    assert set(per_doc.values()) == {TOP_TERMS_K}
    for r in rows:
        assert r["score"] == r["tf"] / r["df"]


def test_training_shard_manifest_invariants(spark):
    from hpctoolkit_dataframe_spark.queries.pipeline import N_SHARDS

    rows = REGISTRY["training_shard_manifest"].fn(spark, SF_DIR).collect()
    clusters = REGISTRY["dedup_clusters"].fn(spark, SF_DIR).collect()
    canonical = {r["doc_id"] for r in clusters if r["is_canonical"] == 1}
    assert {r["doc_id"] for r in rows} == canonical
    assert all(0 <= r["shard"] < N_SHARDS for r in rows)
    assert all(r["quality_pass"] in (0, 1) for r in rows)
    # every shard populated (474 docs over 8 hash shards)
    assert len({r["shard"] for r in rows}) == N_SHARDS


def test_curation_run_end_to_end(spark, tmp_path):
    """tools/curation_run.py composition contract: stages only shrink
    the doc set (dedup, quality) until mixture expands it; exported
    shards exist, every sample's text is PII-free, and the realized
    per-source factor respects the integer weight floor."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import curation_run

    out = str(tmp_path / "curated")
    card = curation_run.curate(spark, "/root/testdata/sf0.001", out)
    assert (card["input_docs"] >= card["after_exact_dedup"]
            >= card["after_quality_and_semdedup"])
    assert card["exported_samples"] >= card["after_quality_and_semdedup"]
    shard_dirs = [p for p in (tmp_path / "curated").iterdir()
                  if p.name.startswith("shard=")]
    assert len(shard_dirs) >= 2
    back = spark.read.json(out)
    assert back.count() == card["exported_samples"]
    # every copy is distinct as a sample; no doc exceeds ceil(weight)
    from pyspark.sql import functions as F
    per_doc = back.groupBy("doc_id").count().agg(F.max("count")).head()[0]
    assert per_doc <= 3  # max weight 2.50 -> at most 3 copies
    # scrub idempotence: redacting again changes nothing
    from hpctoolkit_dataframe_spark.queries.pii import redact
    changed = back.filter(
        redact(F.col("text")) != F.col("text")).count()
    assert changed == 0
