"""Corpus-shaping queries: chunking, sequence packing, decontamination.

The last mile of a training-data pipeline (after dedup/curation decide
WHICH documents survive): split long documents into overlapping
fixed-size windows (`doc_chunks`), pack token streams into fixed-length
training sequences (`pack_sequences`), and strip benchmark
contamination via n-gram overlap against a held-out eval set
(`decontaminate`).  No reference counterpart — the reference
(hpctoolkit_dataframe.py) stops at analysis; these extend the engine
per the task brief's LLM-pipeline requirements.

Determinism follows queries/__init__.py rules: integer window sums
(order-independent), integer div/mod on non-negatives (DuckDB ``//``
floors, Spark ``div`` truncates — equal above zero), the shared
md5-prefix hash for shard assignment, and at most one long->double
division at the end of a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import hash8_sql, load_table, register
from .textops import _TOKENS_SQL, _tokens

# chunking: window of CHUNK_CHARS every CHUNK_STRIDE chars (overlap =
# CHUNK_CHARS - CHUNK_STRIDE).  The final window may be shorter —
# substr clamps identically in both engines.
CHUNK_CHARS = 200
CHUNK_STRIDE = 160

# packing: concat-and-split at MAX_SEQ tokens; documents straddle
# sequence boundaries exactly as pretraining packing does.  The shard
# count is the parallelism knob: each shard's running sum is inherently
# sequential (ONE task), so at 100 TB you raise N_PACK_SHARDS to
# O(cluster cores) and every shard still packs independently.
MAX_SEQ = 256
N_PACK_SHARDS = 4

# decontamination: a doc is an eval/benchmark doc if its id-hash lands
# in 1/EVAL_MOD (content-independent split, stable under reruns).
# NGRAM=8 tokens, the low end of the 8-13 range published pipelines use
# (GPT-3 13-gram, Llama 8-gram): long enough that a hit means copied
# text, not shared phrasing — textops' 3-token shingles flag 87% of
# this corpus, 8-grams flag only genuine near-dups of eval docs.
EVAL_MOD = 20
NGRAM = 8

_DOC_HASH_SQL = hash8_sql("CAST(doc_id AS VARCHAR)")


def _doc_hash():
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long")


# ---------------------------------------------------------------------------
# doc_chunks: overlapping fixed-size character windows.  Entirely
# narrow — per-row sequence + substring, no shuffle anywhere; the
# explode fan-out is bounded by ceil(len/stride).  At 100 TB this is a
# pure map stage that pipelines into whatever consumes the chunks.
# ---------------------------------------------------------------------------
@register("doc_chunks", sql=f"""
WITH d AS (
  SELECT doc_id, text,
         (greatest(length(text) - {CHUNK_CHARS}, 0)
          + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} AS n_extra
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(1 + i * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
       CAST(length(substr(text, 1 + i * {CHUNK_STRIDE}, {CHUNK_CHARS}))
            AS BIGINT) AS chunk_len,
       md5(substr(text, 1 + i * {CHUNK_STRIDE}, {CHUNK_CHARS}))
         AS chunk_digest
FROM d, unnest(range(0, n_extra + 1)) AS t(i)""",
          doc="overlapping fixed-size character windows per document")
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    n_extra = F.expr(
        f"(greatest(length(text) - {CHUNK_CHARS}, 0)"
        f" + {CHUNK_STRIDE} - 1) div {CHUNK_STRIDE}")
    chunk = F.substring(
        F.col("text"), F.lit(1) + F.col("i") * CHUNK_STRIDE, CHUNK_CHARS)
    return (docs
            .select("doc_id", "text",
                    F.explode(F.sequence(F.lit(0), n_extra)).alias("i"))
            .select("doc_id",
                    F.col("i").cast("long").alias("chunk_idx"),
                    (F.lit(1) + F.col("i") * CHUNK_STRIDE).cast("long")
                    .alias("chunk_start"),
                    F.length(chunk).cast("long").alias("chunk_len"),
                    F.md5(chunk).alias("chunk_digest")))


# ---------------------------------------------------------------------------
# pack_sequences: assign every document a (shard, seq_id, seq_offset)
# in the concatenated fixed-length-sequence layout.  One shuffle (the
# shard window partition); the running token sum is an exact BIGINT
# window aggregate, so seq boundaries are engine-identical.
# ---------------------------------------------------------------------------
@register("pack_sequences", sql=f"""
WITH t AS (
  SELECT doc_id,
         CAST({_DOC_HASH_SQL} % {N_PACK_SHARDS} AS INTEGER) AS shard,
         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens,
       cum_before // {MAX_SEQ} AS seq_id,
       cum_before % {MAX_SEQ} AS seq_offset
FROM c""",
          doc="concat-and-split packing of token streams into "
              f"{MAX_SEQ}-token training sequences")
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull())
    t = docs.select(
        "doc_id",
        (_doc_hash() % N_PACK_SHARDS).cast("int").alias("shard"),
        F.size(_tokens()).cast("long").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = t.select(
        "doc_id", "shard", "n_tokens",
        (F.sum("n_tokens").over(w).cast("long") - F.col("n_tokens"))
        .alias("cum_before"))
    return c.select(
        "doc_id", "shard", "n_tokens",
        F.expr(f"cum_before div {MAX_SEQ}").alias("seq_id"),
        (F.col("cum_before") % MAX_SEQ).alias("seq_offset"))


# ---------------------------------------------------------------------------
# decontaminate: flag training documents sharing any NGRAM-token
# n-gram with the (hash-held-out) benchmark set.  Scale shape: real
# eval sets are megabytes, so the benchmark n-gram set BROADCASTS —
# the 100 TB training side is flagged map-side with no pre-join
# shuffle, and only the (rare) matching rows reach the per-doc
# aggregate.
# ---------------------------------------------------------------------------
_NGRAMS_SQL = f"""list_distinct(list_transform(
  range(1, greatest(len({_TOKENS_SQL}) - {NGRAM - 1}, 1) + 1),
  j -> array_to_string(list_slice({_TOKENS_SQL}, j, j + {NGRAM - 1}), ' ')))"""


def _ngrams(tokens):
    """Distinct NGRAM-token n-grams, computed per-row (no explode)."""
    n = F.greatest(F.size(tokens) - (NGRAM - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n),
                    lambda j: F.array_join(F.slice(tokens, j, NGRAM), " ")))


@register("decontaminate", sql=f"""
WITH base AS (
  SELECT doc_id, {_NGRAMS_SQL} AS sh,
         {_DOC_HASH_SQL} % {EVAL_MOD} AS bucket
  FROM documents WHERE text IS NOT NULL
),
bench AS (
  SELECT DISTINCT unnest(sh) AS sh FROM base WHERE bucket = 0
),
train AS (
  SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS sh
  FROM base WHERE bucket != 0
)
SELECT t.doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(*) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE)
         AS contam_ratio
FROM train t JOIN bench b ON t.sh = b.sh
GROUP BY t.doc_id, t.n_shingles""",
          doc=f"training docs sharing {NGRAM}-gram spans with the "
              "held-out benchmark split (broadcast semi-structure)")
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the single-row-group scan would otherwise compute every
    # doc's n-grams (interpreted column-lambdas, the CPU hot spot) on
    # ONE core; checkpoint: both the bench and train branches read
    # `base`, and relation dedup does not merge them (CLAUDE.md).
    docs = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull())
    base = docs.select(
        "doc_id", _ngrams(_tokens()).alias("sh"),
        (_doc_hash() % EVAL_MOD).alias("bucket")).localCheckpoint(eager=True)
    bench = (base.filter(F.col("bucket") == 0)
             .select(F.explode("sh").alias("sh")).distinct())
    train = (base.filter(F.col("bucket") != 0)
             .select("doc_id", F.size("sh").alias("n_shingles"),
                     F.explode("sh").alias("sh")))
    # _ngrams is per-doc distinct, so COUNT(*) after the inner join
    # IS the count of distinct overlapping shingles
    return (train.join(F.broadcast(bench), "sh")
            .groupBy("doc_id", "n_shingles")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select("doc_id",
                    F.col("n_shingles").cast("long").alias("n_shingles"),
                    "n_hits",
                    (F.col("n_hits").cast("double")
                     / F.col("n_shingles").cast("double"))
                    .alias("contam_ratio")))


# ---------------------------------------------------------------------------
# mixture_plan: source-weighted data mixing — the epoch plan that
# decides how many copies of each document a training run will see
# (upweight scarce high-quality sources, downweight bulk crawl).
# Weights are scaled-integer cents; the fractional part becomes an
# extra copy for the deterministic hash fraction of docs, so the
# REALIZED per-source factor converges to the target weight with zero
# randomness (reruns are byte-identical).  Pure per-row arithmetic +
# one source rollup — a map stage at any scale.
# ---------------------------------------------------------------------------
# NULLIF guard: BOTH engines return '' (not NULL) for a no-match
# regexp_extract, and ANSI CAST('') throws — a digit-less source name
# must default to weight 100, not crash (code-review finding).
_W_SQL = ("(100 + (COALESCE(CAST(NULLIF(regexp_extract(source,"
          " '[0-9]+', 0), '') AS BIGINT), 0) % 3) * 75)")


def mixture_weight_cols():
    """(w_e2, frac_h, copies-builder) — the deterministic fractional
    upsampling rule, shared by mixture_plan and tools/curation_run so
    the tool can never diverge from the oracle-gated query."""
    w_e2 = (100 + (F.coalesce(
        F.nullif(F.regexp_extract("source", "[0-9]+", 0), F.lit(""))
        .cast("long"), F.lit(0)) % 3) * 75)
    frac_h = F.conv(F.substring(F.md5(
        F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 100
    copies = (F.expr("w_e2 div 100")
              + F.when(F.col("frac_h") < F.col("w_e2") % 100, 1)
              .otherwise(0))
    return w_e2, frac_h, copies


@register("mixture_plan", sql=f"""
WITH d AS (
  SELECT doc_id, source, n_chars, {_W_SQL} AS w_e2,
         {hash8_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 100 AS frac_h
  FROM documents WHERE text IS NOT NULL),
planned AS (
  SELECT source, n_chars, w_e2,
         w_e2 // 100 + CASE WHEN frac_h < w_e2 % 100 THEN 1 ELSE 0 END
           AS copies
  FROM d)
SELECT source,
       CAST(MAX(w_e2) AS BIGINT) AS weight_e2,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(copies) AS BIGINT) AS planned_docs,
       CAST(SUM(copies * n_chars) AS BIGINT) AS planned_chars,
       CAST(SUM(copies) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS realized_factor
FROM planned GROUP BY source""")
def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch plan under deterministic fractional
    upsampling: target weight (integer cents, derived from the source
    id here; a config table in production), planned doc/char volumes,
    and the realized factor — which the test pins to within 1/sqrt(n)
    of the target (hash-fraction convergence, no RNG)."""
    docs = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull())
    w_e2, frac_h, copies = mixture_weight_cols()
    return (docs.select("source", "n_chars",
                        w_e2.cast("long").alias("w_e2"),
                        frac_h.alias("frac_h"))
            .withColumn("copies", copies)
            .groupBy("source")
            .agg(F.max("w_e2").cast("long").alias("weight_e2"),
                 F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("copies").cast("long").alias("planned_docs"),
                 F.sum(F.col("copies") * F.col("n_chars")).cast("long")
                 .alias("planned_chars"),
                 (F.sum("copies").cast("double")
                  / F.count(F.lit(1)).cast("double"))
                 .alias("realized_factor")))


# ---------------------------------------------------------------------------
# priority sampling (Duffield/Cohen bottom-k with priority u/w): the
# deterministic weighted sample — every doc draws a fixed pseudo-random
# u from its id hash, competes with priority u/weight, and the global
# bottom-k wins.  Heavier docs get proportionally smaller priorities,
# so inclusion probability scales with weight; zero RNG, so the sample
# is identical on every run and on both engines.  Spark executes the
# bottom-k as TakeOrdered (per-partition heaps + merge), never a full
# sort.
# ---------------------------------------------------------------------------
SAMPLE_K = 100


@register("priority_weighted_sample", sql=f"""
WITH d AS (
  SELECT doc_id, source, n_chars,
         {hash8_sql("'ws:' || CAST(doc_id AS VARCHAR)")} AS u
  FROM documents WHERE text IS NOT NULL AND n_chars > 0),
pri AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
         CAST(u * 1000000 // n_chars AS BIGINT) AS priority
  FROM d)
SELECT doc_id, source, weight, priority FROM pri
ORDER BY priority ASC, doc_id ASC LIMIT {SAMPLE_K}""")
def priority_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-{SAMPLE_K} by integer priority u * SCALE div weight —
    character count as the weight here (quality score or token count
    in production).  The (priority, doc_id) total order makes the
    cutoff deterministic; exact integer division keeps both engines
    bit-identical."""
    docs = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull() & (F.col("n_chars") > 0))
    u = F.conv(F.substring(F.md5(
        F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long")
    return (docs.select(
        "doc_id", "source",
        F.col("n_chars").cast("long").alias("weight"),
        (u * 1_000_000).cast("long").alias("u_scaled"))
        .select("doc_id", "source", "weight",
                F.expr("u_scaled div weight").alias("priority"))
        .orderBy(F.col("priority").asc(), F.col("doc_id").asc())
        .limit(SAMPLE_K))


# ---------------------------------------------------------------------------
# Temperature-based mixture planning (the multilingual / multi-source
# sampling staple: XLM-R's p_i ~ n_i^alpha, alpha<1 upweights small
# sources; UNIMAX and modern data-mixing recipes are variants).
# mixture_plan above EXECUTES a given weight table; this derives the
# weights FROM the observed per-source token mass.  Determinism: pow
# with a fractional exponent is libm territory (the JIT-bistability
# hazard class), so each source's temperatured mass is micro-quantized
# to an exact BIGINT immediately, and every downstream share/count is
# integer arithmetic with single divisions.  Scale shape: ONE map-side
# combined aggregation to |sources| rows; everything after is
# constant-size.
# ---------------------------------------------------------------------------
MIX_ALPHA = 0.7
MIX_BUDGET_DOCS = 10_000
_POW_MICRO = 1_000_000


@register("temperature_mixture_plan", sql=f"""
WITH s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source),
p AS (
  SELECT source, n_docs, n_tokens,
         CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA})
                    * {_POW_MICRO}, 0) AS BIGINT) AS p_u
  FROM s),
t AS (SELECT CAST(SUM(p_u) AS BIGINT) AS sum_u,
             CAST(SUM(n_tokens) AS BIGINT) AS tok_total FROM p)
SELECT p.source, p.n_docs, p.n_tokens,
       CAST(ROUND(CAST(p.p_u * 1000000 AS DOUBLE)
                  / CAST(t.sum_u AS DOUBLE), 0) AS BIGINT) AS share_ppm,
       CAST(ROUND(CAST(p.n_tokens * 1000000 AS DOUBLE)
                  / CAST(t.tok_total AS DOUBLE), 0) AS BIGINT)
         AS proportional_ppm,
       CAST({MIX_BUDGET_DOCS} * p.p_u // t.sum_u AS BIGINT)
         AS planned_docs
FROM p CROSS JOIN t""", doc="""
Per-source sampling shares under temperature alpha=0.7 over observed
token mass, next to the proportional (alpha=1) share — small sources
gain, large sources shrink — plus planned doc counts for a fixed
budget.  pow is micro-quantized to BIGINT immediately; shares are
single exact-integer divisions.""")
def temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull())
    s = (docs.select("source", F.size(_tokens()).alias("nt"))
         .groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum("nt").cast("long").alias("n_tokens")))
    p = s.withColumn("p_u", F.expr(
        f"cast(round(power(cast(n_tokens as double), {MIX_ALPHA})"
        f" * {_POW_MICRO}, 0) as bigint)"))
    t = p.agg(F.sum("p_u").cast("long").alias("sum_u"),
              F.sum("n_tokens").cast("long").alias("tok_total"))
    return (p.crossJoin(F.broadcast(t))
            .select(
                "source", "n_docs", "n_tokens",
                F.expr("cast(round(cast(p_u * 1000000 as double)"
                       " / cast(sum_u as double), 0) as bigint)")
                .alias("share_ppm"),
                F.expr("cast(round(cast(n_tokens * 1000000 as double)"
                       " / cast(tok_total as double), 0) as bigint)")
                .alias("proportional_ppm"),
                F.expr(f"cast({MIX_BUDGET_DOCS} * p_u div sum_u"
                       " as bigint)").alias("planned_docs")))
