"""Corpus-shaping queries (chunking / packing / decontamination) are
recomputed in plain Python over the collected table and compared
exactly; decontaminate's broadcast shape is plan-asserted."""

import hashlib
import re

from hpctoolkit_dataframe_spark.plans import explain
from hpctoolkit_dataframe_spark.queries import REGISTRY, load_table
from hpctoolkit_dataframe_spark.queries.shaping import (
    CHUNK_CHARS, CHUNK_STRIDE, EVAL_MOD, MAX_SEQ, N_PACK_SHARDS, NGRAM)

from .conftest import SF_DIR


def _docs(spark):
    return {r["doc_id"]: r["text"]
            for r in load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").collect()
            if r["text"] is not None}


def _hash(doc_id):
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


def _tokens(text):
    return re.split(r"\s+", text)


def test_doc_chunks_match_python(spark):
    out = REGISTRY["doc_chunks"].fn(spark, SF_DIR).collect()
    expected = {}
    for doc_id, text in _docs(spark).items():
        extra = max(len(text) - CHUNK_CHARS, 0)
        n_extra = (extra + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        for i in range(n_extra + 1):
            chunk = text[i * CHUNK_STRIDE:i * CHUNK_STRIDE + CHUNK_CHARS]
            expected[(doc_id, i)] = (
                1 + i * CHUNK_STRIDE, len(chunk),
                hashlib.md5(chunk.encode()).hexdigest())
    got = {(r["doc_id"], r["chunk_idx"]):
           (r["chunk_start"], r["chunk_len"], r["chunk_digest"])
           for r in out}
    assert got == expected
    # overlap invariant: consecutive chunks share CHUNK-STRIDE chars
    assert any(i > 0 for _, i in got)  # multi-chunk docs exist


def test_pack_sequences_match_python(spark):
    out = {r["doc_id"]: r for r in
           REGISTRY["pack_sequences"].fn(spark, SF_DIR).collect()}
    docs = _docs(spark)
    assert set(out) == set(docs)
    by_shard = {}
    for doc_id in sorted(docs):
        by_shard.setdefault(_hash(doc_id) % N_PACK_SHARDS, []).append(doc_id)
    for shard, ids in by_shard.items():
        cum = 0
        for doc_id in ids:  # ascending doc_id = the packing order
            n_tok = len(_tokens(docs[doc_id]))
            r = out[doc_id]
            assert (r["shard"], r["n_tokens"]) == (shard, n_tok)
            assert r["seq_id"] == cum // MAX_SEQ
            assert r["seq_offset"] == cum % MAX_SEQ
            cum += n_tok
    assert max(r["seq_id"] for r in out.values()) >= 1  # multi-seq shards


def test_decontaminate_matches_python(spark):
    out = {r["doc_id"]: r for r in
           REGISTRY["decontaminate"].fn(spark, SF_DIR).collect()}
    grams = {}
    for doc_id, text in _docs(spark).items():
        toks = _tokens(text)
        n = max(len(toks) - (NGRAM - 1), 1)
        grams[doc_id] = {" ".join(toks[j:j + NGRAM]) for j in range(n)}
    bench = set().union(*(g for d, g in grams.items()
                          if _hash(d) % EVAL_MOD == 0))
    expected = {}
    for doc_id, g in grams.items():
        if _hash(doc_id) % EVAL_MOD == 0:
            continue
        hits = len(g & bench)
        if hits:
            expected[doc_id] = (len(g), hits)
    assert {d: (r["n_shingles"], r["n_hits"])
            for d, r in out.items()} == expected
    for r in out.values():
        assert r["contam_ratio"] == r["n_hits"] / r["n_shingles"]


def test_decontaminate_broadcasts_benchmark(spark):
    df = REGISTRY["decontaminate"].fn(spark, SF_DIR)
    strategies = explain.join_strategies(df)
    assert strategies["broadcast_hash"] >= 1
    assert strategies["sort_merge"] == 0
    assert strategies["cartesian"] == 0
    assert explain.python_udf_count(df) == 0


def test_doc_chunks_is_narrow(spark):
    # pure map stage: zero shuffle exchanges anywhere in the plan
    df = REGISTRY["doc_chunks"].fn(spark, SF_DIR)
    assert explain.exchange_count(df) == 0
    assert explain.python_udf_count(df) == 0


def test_mixture_plan_converges_to_target_weights(spark):
    """Deterministic fractional upsampling: the realized per-source
    factor must sit within the hash-fraction convergence band of the
    target weight, and planned_docs must be reproducible (no RNG)."""
    rows = REGISTRY["mixture_plan"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        target = r.weight_e2 / 100.0
        # binomial-ish band: +-3/sqrt(n) around the target fraction
        assert abs(r.realized_factor - target) <= 3.0 / (r.n_docs ** 0.5), r
        assert r.planned_chars >= r.planned_docs  # every doc has chars
    again = {r.source: r.planned_docs
             for r in REGISTRY["mixture_plan"].fn(spark, SF_DIR).collect()}
    assert again == {r.source: r.planned_docs for r in rows}


def test_priority_sample_favors_heavy_docs(spark):
    """Weighted-sampling property: the bottom-k winners' mean weight
    must exceed the corpus mean (heavier docs draw proportionally
    smaller priorities), and the sample is rerun-identical."""
    rows = REGISTRY["priority_weighted_sample"].fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    sample_mean = sum(r.weight for r in rows) / len(rows)
    corpus = load_table(spark, SF_DIR, "documents").filter(
        "text IS NOT NULL AND n_chars > 0")
    from pyspark.sql import functions as F
    corpus_mean = corpus.agg(F.avg("n_chars")).head()[0]
    assert sample_mean > corpus_mean
    again = {r.doc_id for r in
             REGISTRY["priority_weighted_sample"].fn(spark, SF_DIR)
             .collect()}
    assert again == {r.doc_id for r in rows}


def test_temperature_mixture_flattens_toward_small_sources(spark):
    """alpha<1 contract: shares sum to ~1e6 ppm, every source keeps a
    positive share, and relative to the proportional (alpha=1) share
    the smallest source GAINS while the largest LOSES."""
    rows = REGISTRY["temperature_mixture_plan"].fn(spark, SF_DIR).collect()
    assert rows
    total = sum(r["share_ppm"] for r in rows)
    assert abs(total - 1_000_000) <= len(rows)  # per-source rounding
    assert all(r["share_ppm"] > 0 for r in rows)
    smallest = min(rows, key=lambda r: r["n_tokens"])
    largest = max(rows, key=lambda r: r["n_tokens"])
    assert smallest["share_ppm"] > smallest["proportional_ppm"]
    assert largest["share_ppm"] < largest["proportional_ppm"]
    budget = sum(r["planned_docs"] for r in rows)
    assert budget <= 10_000  # floor rounding never overshoots
