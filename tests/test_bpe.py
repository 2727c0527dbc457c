"""BPE trainer: Sennrich golden, independent twin, and driver-path ==
distributed-path equality (the registry entry is rows-only at the
driver, so these tests ARE its correctness gate)."""

from collections import Counter

from hpctoolkit_dataframe_spark.queries import REGISTRY
from hpctoolkit_dataframe_spark.queries.bpe import (
    END_OF_WORD, train_bpe, word_counts)

SF_DIR = "/root/testdata/sf0.001"


def test_sennrich_golden():
    """The classic low/lower/newest/widest example: the first merges
    are forced by the counts (ties broken lexicographically)."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(counts, n_merges=6)
    assert [(m[1], m[2], m[4]) for m in merges] == [
        ("e", "s", 9),            # newest+widest
        ("es", "t", 9),
        ("est", END_OF_WORD, 9),
        ("l", "o", 7),            # low+lower
        ("lo", "w", 7),
        ("e", "w", 6),            # tie at 6 -> lexicographic minimum
    ]
    for rank, left, right, merged, n in merges:
        assert merged == left + right
    assert [m[0] for m in merges] == list(range(6))


def _twin_bpe(counts, n_merges):
    """Independently-coded reference (Counter-based, different
    structure from the operator's dict loop)."""
    words = {tuple(w) + (END_OF_WORD,): c for w, c in counts}
    out = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, c in words.items():
            for pair in zip(syms, syms[1:]):
                pc[pair] += c
        if not pc:
            break
        top = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == top)[0]
        out.append((rank, a, b, a + b, top))
        nxt = Counter()
        for syms, c in words.items():
            s, i = [], 0
            while i < len(syms):
                if syms[i:i + 2] == (a, b):
                    s.append(a + b)
                    i += 2
                else:
                    s.append(syms[i])
                    i += 1
            nxt[tuple(s)] += c
        words = dict(nxt)
    return out


def test_registry_query_matches_twin(spark):
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in REGISTRY["bpe_train_merges"].fn(spark, SF_DIR).collect()]
    counts = [(r["w"], r["c"]) for r in
              word_counts(spark, SF_DIR)
              .orderBy("c", ascending=False).collect()]
    # the query's top-50k cap is a no-op at this scale; twin on all
    want = _twin_bpe(counts, len(got))
    assert got == want
    assert len(got) == 48


def test_distributed_path_matches_driver_path(spark):
    from hpctoolkit_dataframe_spark.queries.bpe import bpe_train_distributed

    dist = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in bpe_train_distributed(spark, SF_DIR,
                                           n_merges=8).collect()]
    counts = [(r["w"], r["c"]) for r in word_counts(spark, SF_DIR).collect()]
    want = train_bpe(counts, n_merges=8)
    assert dist == want


def test_encode_stats_matches_python_twin(spark):
    """bpe_encode_stats is rows-only at the driver; this twin IS its
    value gate: every doc's token count and digest must equal a pure-
    Python encode with the same trained merges, and the tokens must
    reconstruct the original words (lossless segmentation)."""
    import hashlib

    from hpctoolkit_dataframe_spark.queries import load_table
    from hpctoolkit_dataframe_spark.queries.bpe import encode_word

    out = {r["doc_id"]: (r["n_tokens"], r["tok_digest"]) for r in
           REGISTRY["bpe_encode_stats"].fn(spark, SF_DIR).collect()}
    counts = [(r["w"], r["c"]) for r in word_counts(spark, SF_DIR).collect()]
    ranks = {(m[1], m[2]): m[0] for m in train_bpe(counts)}
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, SF_DIR, "documents").collect()
            if r["text"] is not None}
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        toks = [t for w in text.split() for t in encode_word(w, ranks)]
        digest = hashlib.md5("|".join(toks).encode()).hexdigest()
        assert out[doc_id] == (len(toks), digest), doc_id
        # lossless: stripping the merge structure recovers the words
        assert "".join(toks).split(END_OF_WORD)[:-1] == text.split()
