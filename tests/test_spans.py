"""Substring-level duplicate spans (queries/spans.py): semantics on
constructed corpora + plan shape.  Cross-engine values are pinned by
the DuckDB oracles; these tests pin the SEMANTICS (offsets, merging,
boundary cases) independent of the testdata."""

from pyspark.sql import functions as F

from hpctoolkit_dataframe_spark.plans import explain
from hpctoolkit_dataframe_spark.queries import REGISTRY
from hpctoolkit_dataframe_spark.queries.spans import SPAN_K, _positions

from .conftest import SF_DIR


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _spans_of(spark, texts):
    """Run the duplicate_spans pipeline over an in-memory corpus."""
    from pyspark.sql import Window

    pos = _positions(_docs(spark, texts))
    dup = (pos.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("h"))
    hits = pos.join(dup, "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    out = (isl.groupBy("doc_id", "grp")
           .agg(F.min("pos").alias("span_start"),
                (F.count(F.lit(1)) + SPAN_K - 1).alias("span_words")))
    return {(r.doc_id, r.span_start, r.span_words)
            for r in out.collect()}


def test_exact_copy_yields_full_span(spark):
    words = " ".join(f"w{i}" for i in range(20))
    spans = _spans_of(spark, [words, words, "totally different " * 10])
    # both copies: one maximal span covering all 20 words from pos 1
    assert spans == {(0, 1, 20), (1, 1, 20)}


def test_shared_infix_localized(spark):
    shared = " ".join(f"s{i}" for i in range(SPAN_K))  # exactly K words
    a = "a1 a2 a3 " + shared + " a4 a5"
    b = "b1 " + shared + " b2 b3 b4 b5 b6"
    spans = _spans_of(spark, [a, b])
    # K-word shared infix -> exactly one K-gram position per doc
    assert spans == {(0, 4, SPAN_K), (1, 2, SPAN_K)}


def test_two_disjoint_spans_do_not_merge(spark):
    s1 = " ".join(f"x{i}" for i in range(SPAN_K))
    s2 = " ".join(f"y{i}" for i in range(SPAN_K))
    gap = " ".join(f"g{i}" for i in range(5))   # unique separator
    gap2 = " ".join(f"h{i}" for i in range(5))
    a = s1 + " " + gap + " " + s2
    b = s1 + " " + gap2 + " " + s2
    spans = _spans_of(spark, [a, b])
    assert {(d, st) for d, st, _ in spans} == {
        (0, 1), (0, SPAN_K + 6), (1, 1), (1, SPAN_K + 6)}
    assert all(ln == SPAN_K for _, _, ln in spans)


def test_short_and_null_docs_are_silent(spark):
    docs = spark.createDataFrame(
        [(0, "too short"), (1, None),
         (2, " ".join(["x"] * (SPAN_K - 1)))],
        "doc_id long, text string")
    assert _positions(docs).count() == 0


def test_within_doc_repeat_is_not_cross_doc_dup(spark):
    rep = " ".join(f"r{i}" for i in range(SPAN_K))
    spans = _spans_of(spark, [rep + " mid1 mid2 " + rep,
                              "unrelated words " * SPAN_K])
    # same K-gram twice in ONE doc only -> count_distinct(doc)=1 -> no span
    assert spans == set()


def test_span_plan_no_python_no_cartesian(spark):
    for name in ("duplicate_spans", "duplicate_span_stats"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        strategies = explain.join_strategies(df)
        assert strategies["cartesian"] == 0, name
        assert strategies["broadcast_nested_loop"] == 0, name
        assert explain.python_udf_count(df) == 0, name


def test_cleaner_keeps_owners_and_strips_foreign_copies(spark):
    """corpus_without_dup_spans invariants against the sibling span
    queries: docs without any dup span survive verbatim; something is
    actually removed; and the total removal is bounded by (strictly
    less than) the total duplicated-word coverage, because each span's
    canonical owner keeps its copy."""
    from pyspark.sql import functions as F

    rows = {r.doc_id: r for r in
            REGISTRY["corpus_without_dup_spans"].fn(spark, SF_DIR)
            .collect()}
    span_docs = {r.doc_id for r in
                 REGISTRY["duplicate_spans"].fn(spark, SF_DIR).collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.n_after <= r.n_before
        if r.doc_id not in span_docs:
            assert r.n_after == r.n_before, r
    removed_total = sum(r.n_before - r.n_after for r in rows.values())
    assert removed_total > 0
    covered_total = (REGISTRY["duplicate_word_coverage"]
                     .fn(spark, SF_DIR)
                     .agg(F.sum("covered_words")).head()[0])
    assert removed_total < covered_total
    # a doc whose duplicated span has a smaller-id twin loses words
    assert any(r.n_after < r.n_before and r.doc_id in span_docs
               for r in rows.values())


def _py_spans(texts):
    """Pure-Python reference for the whole duplicate-spans pipeline."""
    from collections import defaultdict

    grams = defaultdict(set)   # gram -> docs containing it
    pos_lists = {}
    for d, t in enumerate(texts):
        ws = t.split(" ") if t else [""]
        pos_lists[d] = [tuple(ws[i:i + SPAN_K])
                        for i in range(len(ws) - SPAN_K + 1)]
        for g in pos_lists[d]:
            grams[g].add(d)
    out = set()
    for d, gl in pos_lists.items():
        run_start = None
        for i, g in enumerate(gl):
            dup = len(grams[g]) >= 2
            if dup and run_start is None:
                run_start = i
            if (not dup or i == len(gl) - 1) and run_start is not None:
                end = i if dup else i - 1
                out.add((d, run_start + 1, end - run_start + SPAN_K))
                run_start = None
    return out


def test_spans_match_python_reference_property(spark):
    """Property test: random small-vocab corpora (forced collisions)
    — the distributed pipeline must equal the brute-force reference
    on every example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "c", "d", "e"])
    text = st.lists(word, min_size=0, max_size=3 * SPAN_K).map(" ".join)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(texts=st.lists(text, min_size=2, max_size=5))
    def run(texts):
        assert _spans_of(spark, texts) == _py_spans(texts)

    run()
