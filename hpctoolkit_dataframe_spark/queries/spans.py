"""Substring-level duplicate detection (Lee et al., "Deduplicating
Training Data Makes Language Models Better"): find maximal word spans
that recur VERBATIM across distinct documents — the granularity
document-level MinHash/SimHash cannot see (a boilerplate paragraph
pasted into thousands of otherwise-unique pages).

Method (the distributed analog of the paper's suffix-array scan):
tokenize, slide a K-word window, mark every position whose K-gram
occurs in >= 2 distinct docs, then merge consecutive marked positions
into maximal spans with the pos - row_number() island trick.  The
whole pipeline is shuffles on k-gram keys — no suffix sort, no
driver-side state — so it scales with cluster width.

Spark groups on ``xxhash64(gram)`` (8 bytes shuffled per position
instead of the ~40-byte gram text); the oracle groups on the gram
string itself.  Only positions survive to the output, so the two agree
unless xxhash64 collides — negligible below ~2^32 distinct grams; for
a 100 TB corpus widen to the (hash, length) pair or two independent
hashes before trusting a dup mark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import (evict_dead_sessions, hash8_sql, load_table, register,
               session_key)

SPAN_K = 8  # words per window; spans shorter than this are invisible

_HITS_CACHE: dict = {}


def _positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): one row per K-gram position.  ANSI guard: an
    empty sequence bound would generate a DESCENDING sequence(1, 0) =
    [1, 0], so short docs must map to an empty array explicitly."""
    ws = F.split(F.col("text"), r"\s+")
    n = F.size(ws) - SPAN_K + 1
    grams = F.when(n >= 1, F.transform(
        F.sequence(F.lit(1), n),
        lambda j: F.struct(
            j.alias("pos"),
            F.xxhash64(F.array_join(F.slice(ws, j, SPAN_K), " "))
            .alias("h")))).otherwise(F.array())
    return (docs.filter(F.col("text").isNotNull())
            .select("doc_id", F.explode(grams).alias("g"))
            .select("doc_id", F.col("g.pos").alias("pos"),
                    F.col("g.h").alias("h")))


def _dup_hits(spark: SparkSession,
              sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(hits, pos): positions whose K-gram recurs in >= 2 distinct
    docs, plus the full position table both stats queries also need.  The
    position table feeds both the dup-key aggregate and the join side —
    checkpoint so tokenize+slide+hash runs once.  Memoized per
    (session, sf_dir) like the LSH bucketed table: three registry
    queries consume the same hits."""
    cache_key = (session_key(spark), sf_dir)
    hit = _HITS_CACHE.get(cache_key)
    if hit is not None:
        return hit
    docs = load_table(spark, sf_dir, "documents", spread=True)
    pos = _positions(docs).localCheckpoint(eager=True)
    dup = (pos.groupBy("h")
           .agg(F.count_distinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2)
           .select("h"))
    # shuffle semi-join on the 8-byte key: the dup set is unbounded at
    # corpus scale, so it must NOT need to broadcast
    hits = pos.join(dup, "h", "left_semi").localCheckpoint(eager=True)
    # one entry per SESSION: tests/tools cycle through temp fixture
    # dirs, and a no-eviction cache would pin every dir's checkpoint
    # blocks for the session's lifetime (ADVICE r5).  The three
    # registry consumers all hit the same sf_dir back-to-back, so
    # most-recent-per-session keeps the reuse that matters.
    sess = cache_key[0]
    for k in [k for k in _HITS_CACHE if k[0] == sess]:
        del _HITS_CACHE[k]
    evict_dead_sessions(_HITS_CACHE, cache_key[0])
    _HITS_CACHE[cache_key] = (hits, pos)
    return hits, pos


def clear_hits_cache() -> None:
    """Explicit eviction hook (fixture-cycling tests/tools)."""
    _HITS_CACHE.clear()


_POS_SQL = f"""
words AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS ws
  FROM documents WHERE text IS NOT NULL
),
pos AS (
  SELECT doc_id, j AS pos,
         array_to_string(list_slice(ws, j, j + {SPAN_K - 1}), ' ') AS h
  FROM words, UNNEST(range(1, greatest(len(ws) - {SPAN_K} + 2, 1))) AS t(j)
),
dup AS (SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
hits AS (SELECT p.doc_id, p.pos FROM pos p JOIN dup d ON d.h = p.h)"""


@register("duplicate_spans", sql=f"""
WITH {_POS_SQL},
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(COUNT(*) + {SPAN_K} - 1 AS BIGINT) AS span_words
FROM isl GROUP BY doc_id, grp""")
def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-doc duplicated spans per document: word offset +
    length of every verbatim region shared with at least one other
    doc.  Consecutive duplicated positions collapse via the
    pos - row_number() island id — one window + one groupBy, both
    partitioned by doc_id (a single doc-key shuffle)."""
    hits, _ = _dup_hits(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
    return (isl.groupBy("doc_id", "grp")
            .agg(F.min("pos").cast("long").alias("span_start"),
                 (F.count(F.lit(1)) + SPAN_K - 1).cast("long")
                 .alias("span_words"))
            .select("doc_id", "span_start", "span_words"))


@register("duplicate_span_stats", sql=f"""
WITH {_POS_SQL},
per_doc AS (
  SELECT p.doc_id, COUNT(*) AS n_pos FROM pos p GROUP BY p.doc_id),
hit_doc AS (
  SELECT doc_id, COUNT(*) AS n_hit FROM hits GROUP BY doc_id)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(h.doc_id) AS BIGINT) AS docs_with_dup,
       CAST(SUM(COALESCE(h.n_hit, 0)) AS BIGINT) AS dup_positions,
       CAST(SUM(p.n_pos) AS BIGINT) AS total_positions,
       CAST(SUM(COALESCE(h.n_hit, 0)) AS DOUBLE)
         / CAST(SUM(p.n_pos) AS DOUBLE) AS dup_frac
FROM per_doc p
JOIN documents d ON d.doc_id = p.doc_id
LEFT JOIN hit_doc h ON h.doc_id = p.doc_id
GROUP BY d.source""")
def duplicate_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health rollup: per source, how much of the text is
    verbatim-duplicated elsewhere (the number a pretraining-data owner
    tracks per crawl/source).  Fraction is ONE long->double division
    of exact integer position counts."""
    hits, pos = _dup_hits(spark, sf_dir)
    per_doc = pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_pos"))
    hit_doc = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit"))
    # doc_id -> source is corpus-sized: a plain doc-key shuffle join,
    # NOT a broadcast (AQE may still pick broadcast at toy scale)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (per_doc
            .join(docs, "doc_id")
            .join(hit_doc, "doc_id", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.count("n_hit").cast("long").alias("docs_with_dup"),
                 F.sum(F.coalesce("n_hit", F.lit(0))).cast("long")
                 .alias("dup_positions"),
                 F.sum("n_pos").cast("long").alias("total_positions"),
                 (F.sum(F.coalesce("n_hit", F.lit(0))).cast("double")
                  / F.sum("n_pos").cast("double")).alias("dup_frac")))


@register("duplicate_word_coverage", sql=f"""
WITH {_POS_SQL},
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {SPAN_K} - 1 AS e
  FROM isl GROUP BY doc_id, grp),
-- word-coverage intervals of nearby spans can OVERLAP (two islands
-- separated by < K positions): classic interval union via cummax
marked AS (
  SELECT doc_id, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_grp
  FROM spans),
merged AS (
  SELECT doc_id, s, e,
         SUM(new_grp) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS grp
  FROM marked),
cov AS (
  SELECT doc_id, CAST(SUM(ln) AS BIGINT) AS covered FROM (
    SELECT doc_id, MAX(e) - MIN(s) + 1 AS ln
    FROM merged GROUP BY doc_id, grp) GROUP BY doc_id),
nw AS (SELECT doc_id, source, len(ws) AS n_words FROM words
       JOIN documents USING (doc_id))
SELECT nw.source,
       CAST(SUM(nw.n_words) AS BIGINT) AS total_words,
       CAST(SUM(COALESCE(cov.covered, 0)) AS BIGINT) AS covered_words,
       CAST(SUM(COALESCE(cov.covered, 0)) AS DOUBLE)
         / CAST(SUM(nw.n_words) AS DOUBLE) AS covered_frac
FROM nw LEFT JOIN cov ON cov.doc_id = nw.doc_id
GROUP BY nw.source""")
def duplicate_word_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-WORD fraction per source (the deletion budget
    of a span-level dedup pass): span word-intervals [start, start+len)
    can overlap when two islands sit closer than K positions, so they
    merge first — the cummax interval-union window (new group whenever
    this start clears every previous end) — and only then sum."""
    from pyspark.sql import Window

    hits, pos = _dup_hits(spark, sf_dir)
    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    spans = (hits
             .withColumn("grp", F.col("pos") - F.row_number().over(w_isl))
             .groupBy("doc_id", "grp")
             .agg(F.min("pos").alias("s"),
                  (F.max("pos") + SPAN_K - 1).alias("e")))
    w_prev = (Window.partitionBy("doc_id").orderBy("s")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("doc_id").orderBy("s")
             .rowsBetween(Window.unboundedPreceding, 0))
    merged = (spans
              .withColumn("new_grp",
                          (F.col("s") > F.coalesce(F.max("e").over(w_prev),
                                                   F.lit(-1)))
                          .cast("int"))
              .withColumn("mgrp", F.sum("new_grp").over(w_run)))
    cov = (merged.groupBy("doc_id", "mgrp")
           .agg((F.max("e") - F.min("s") + 1).alias("ln"))
           .groupBy("doc_id")
           .agg(F.sum("ln").cast("long").alias("covered")))
    docs = load_table(spark, sf_dir, "documents")
    nw = (docs.filter(F.col("text").isNotNull())
          .select("doc_id", "source",
                  F.size(F.split(F.col("text"), r"\s+")).alias("n_words")))
    return (nw.join(cov, "doc_id", "left")
            .groupBy("source")
            .agg(F.sum("n_words").cast("long").alias("total_words"),
                 F.sum(F.coalesce("covered", F.lit(0))).cast("long")
                 .alias("covered_words"),
                 (F.sum(F.coalesce("covered", F.lit(0))).cast("double")
                  / F.sum("n_words").cast("double"))
                 .alias("covered_frac")))


# ---------------------------------------------------------------------------
# Snapshot-resumable SUBSTRING dedup: the gram-store analog of the
# document-fingerprint store (queries/dedup.py).  The persisted state
# is the set of K-gram hashes ever seen; a new batch flags positions
# whose gram is already in the store, then appends only its genuinely
# new grams — run N+1 reads the store and the batch, never the corpus.
# ---------------------------------------------------------------------------
GRAM_STORE_TABLE = "gram_store"
GRAM_STORE_BUCKETS = 16


def span_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic batch bucket (doc_id % 4): bucket >= 2
    plays the historical corpus, 1 and 0 the two incoming batches."""
    return (load_table(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .withColumn("bucket", (F.col("doc_id") % 4).cast("int")))


def write_gram_store(pos: DataFrame, table: str = GRAM_STORE_TABLE,
                     n_buckets: int = GRAM_STORE_BUCKETS) -> None:
    """Initialize the store: DISTINCT gram hashes, bucketed+sorted on h
    so batch checks join bucket-aligned (zero store-side shuffle)."""
    from ..sources.sinks import write_bucketed_table

    write_bucketed_table(pos.select("h").distinct(), table,
                         bucket_cols=("h",), n_buckets=n_buckets,
                         sort_cols=("h",))


def check_spans_against_store(spark: SparkSession, batch_pos: DataFrame,
                              table: str = GRAM_STORE_TABLE) -> DataFrame:
    """Per batch doc: total K-gram positions and how many are already
    known to the store — the corpus' bytes are never read."""
    store = spark.table(table).select("h").distinct() \
        .withColumn("known", F.lit(1))
    return (batch_pos.join(store, "h", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pos"),
                 F.sum(F.coalesce("known", F.lit(0))).cast("long")
                 .alias("dup_pos")))


def append_new_grams(spark: SparkSession, batch_pos: DataFrame,
                     table: str = GRAM_STORE_TABLE,
                     n_buckets: int = GRAM_STORE_BUCKETS) -> None:
    """Grow the snapshot by the batch's unseen gram hashes only."""
    from ..sources.sinks import write_bucketed_table

    store = spark.table(table)
    new = (batch_pos.select("h").distinct()
           .join(store.select("h"), "h", "left_anti"))
    write_bucketed_table(new, table, bucket_cols=("h",),
                         n_buckets=n_buckets, sort_cols=("h",),
                         mode="append")
    spark.catalog.refreshTable(table)


def incremental_span_frames(
        spark: SparkSession, sf_dir: str,
        table: str = "gram_store_ref") -> tuple[DataFrame, DataFrame]:
    """Batch reference for the streaming twin: corpus -> store, then
    batch 1 (check -> append) then batch 2 (check).  Returns both flag
    frames; batch 1's is materialized against the pre-append snapshot."""
    from .dedup import drop_fingerprint_store as _drop

    split = span_split(spark, sf_dir)
    _drop(spark, table)  # same orphaned-location hygiene as fp store
    write_gram_store(_positions(split.filter(F.col("bucket") >= 2)), table)
    p1 = _positions(split.filter(F.col("bucket") == 1))
    out1 = check_spans_against_store(spark, p1, table) \
        .localCheckpoint(eager=True)
    append_new_grams(spark, p1, table)
    p2 = _positions(split.filter(F.col("bucket") == 0))
    return out1, check_spans_against_store(spark, p2, table)


@register("corpus_without_dup_spans", sql=f"""
WITH {_POS_SQL},
own AS (
  SELECT h, MIN(doc_id) AS owner, COUNT(DISTINCT doc_id) AS nd
  FROM pos GROUP BY h),
foreign_pos AS (
  SELECT p.doc_id, p.pos FROM pos p JOIN own o ON o.h = p.h
  WHERE o.nd >= 2 AND p.doc_id <> o.owner),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM foreign_pos),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {SPAN_K} - 1 AS e
  FROM isl GROUP BY doc_id, grp),
removed AS (
  SELECT DISTINCT doc_id, CAST(j AS BIGINT) AS idx
  FROM spans, UNNEST(range(s, e + 1)) AS t(j)),
w AS (
  SELECT doc_id, CAST(j AS BIGINT) AS idx, ws[CAST(j AS BIGINT)] AS word
  FROM words, UNNEST(range(1, len(ws) + 1)) AS t(j)),
kept AS (
  SELECT w.doc_id, w.idx, w.word FROM w
  LEFT JOIN removed r ON r.doc_id = w.doc_id AND r.idx = w.idx
  WHERE r.idx IS NULL),
cleaned AS (
  SELECT doc_id,
         COALESCE(string_agg(word, ' ' ORDER BY idx), '') AS ctext,
         COUNT(*) AS n_after
  FROM kept GROUP BY doc_id),
base AS (SELECT doc_id, len(ws) AS n_before FROM words)
SELECT b.doc_id,
       CAST(b.n_before AS BIGINT) AS n_before,
       CAST(COALESCE(c.n_after, 0) AS BIGINT) AS n_after,
       CAST({hash8_sql("COALESCE(c.ctext, '')")} AS BIGINT) AS cleaned_h
FROM base b LEFT JOIN cleaned c ON c.doc_id = b.doc_id""")
def corpus_without_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE dedup pass (Lee et al. §4: delete all but one
    occurrence of each duplicated span): every duplicated K-gram's
    canonical owner is the MIN doc_id containing it; every other doc
    removes the words covered by its foreign duplicated positions.
    Output per doc: word counts before/after and an md5-derived hash
    of the cleaned text, so the oracle pins the exact surviving bytes
    without shipping corpus-sized strings through the compare.

    Scale shape: ownership is one gram-key aggregate over the position
    table; removal indexes explode only from FOREIGN-dup intervals
    (bounded by total duplicated volume); the rebuild is one doc-key
    shuffle.  Zero Python anywhere."""
    out = cleaned_corpus(spark, sf_dir)
    cleaned_h = F.conv(F.substring(F.md5(
        F.coalesce("ctext", F.lit(""))), 1, 8), 16, 10).cast("long")
    return out.select("doc_id", "n_before", "n_after",
                      cleaned_h.alias("cleaned_h"))


def cleaned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_before, n_after, ctext): every document with its
    foreign duplicated spans excised (keep-first-owner policy) — the
    reusable stage behind corpus_without_dup_spans and the curation
    pipeline tool.  ``ctext`` is '' for a fully-removed doc.

    r12 (guide §2.2 shuffle fewer bytes): the word explode, the
    (doc_id, idx) anti-join and the collect_list rebuild run ONLY for
    docs that actually contain a foreign duplicated span — every other
    doc's output is a pure projection (n_after = n_before, ctext = its
    own words re-joined).  The former shape exploded and shuffled the
    ENTIRE corpus word-by-word twice to rebuild mostly-unchanged text;
    now that cost is proportional to the duplicated-span volume, not
    the corpus."""
    docs = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull())
    _, pos = _dup_hits(spark, sf_dir)
    own = pos.groupBy("h").agg(
        F.min("doc_id").alias("owner"),
        F.count_distinct("doc_id").alias("nd"))
    foreign = (pos.join(own, "h")
               .filter((F.col("nd") >= 2)
                       & (F.col("doc_id") != F.col("owner")))
               .select("doc_id", "pos"))
    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    # tiny (one row per foreign-dup island); checkpointed because
    # three consumers reference it (removed, the touched-doc semi-join
    # and, through them, both sides of the rebuild) and relation dedup
    # would re-run the pos->own->foreign window per reference
    spans = (foreign
             .withColumn("grp", F.col("pos") - F.row_number().over(w_isl))
             .groupBy("doc_id", "grp")
             .agg(F.min("pos").alias("s"),
                  (F.max("pos") + SPAN_K - 1).alias("e"))
             .localCheckpoint(eager=True))
    removed = (spans
               .select("doc_id", F.explode(
                   F.sequence(F.col("s"), F.col("e"))).alias("idx"))
               .distinct())
    # r13 (VERDICT r12 #6): three consumers (rebuild semi-join,
    # untouched anti-join, and tbase through tdocs) each re-ran the
    # distinct + its Exchange over the spans checkpoint — checkpoint the
    # tiny key set once so the plan drops two duplicated aggregate
    # subtrees (26 -> 22 Exchanges) and both branch broadcasts build
    # from the same scan
    touched = (spans.select("doc_id").distinct()
               .localCheckpoint(eager=True))
    ws = F.split(F.col("text"), r"\s+")
    # rebuild path — touched docs only (explode + anti-join + regroup)
    tdocs = docs.join(touched, "doc_id", "left_semi")
    words = tdocs.select(
        "doc_id", F.posexplode(ws).alias("idx0", "word")
    ).select("doc_id", (F.col("idx0") + 1).cast("long").alias("idx"),
             "word")
    kept = words.join(removed, ["doc_id", "idx"], "left_anti")
    cleaned = (kept.groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("long").alias("n_after"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("idx", "word"))),
                            lambda x: x["word"]), " ").alias("ctext")))
    tbase = tdocs.select("doc_id",
                         F.size(ws).cast("long").alias("n_before"))
    rebuilt = (tbase.join(cleaned, "doc_id", "left")
               .select("doc_id", "n_before",
                       F.coalesce("n_after", F.lit(0)).cast("long")
                       .alias("n_after"),
                       F.coalesce("ctext", F.lit("")).alias("ctext")))
    # untouched docs: nothing was removed, so the rebuild is the
    # identity on the word sequence (same split, same ' ' join —
    # byte-identical to the explode/regroup round trip, empty-token
    # edge cases included).  The anti-join broadcasts the slim touched
    # key set, so this branch never shuffles the corpus text (a
    # delta-outer-join formulation was tried first and SMJ-shuffled
    # the full text at the dup-heavy 10x clone where 90% of docs are
    # touched).
    untouched = (docs.join(touched, "doc_id", "left_anti")
                 .select("doc_id",
                         F.size(ws).cast("long").alias("n_before"),
                         F.size(ws).cast("long").alias("n_after"),
                         F.array_join(ws, " ").alias("ctext")))
    return rebuilt.unionByName(untouched)
