"""Similarity search over the ``embeddings`` table (scale extension).

Brute-force cosine top-k as the correctness baseline, plus a
random-hyperplane LSH-bucketed near-duplicate variant as the scale
path.  All dot products and norms use quantized integer arithmetic
(round(x*10000) per element) so sums are order-independent and the
final cosine is a single exact-integer -> double expression — bit-
identical between Spark and DuckDB.

The hyperplane signs are derived driver-side from hashlib.md5 (pure
Python, engine-independent) and embedded as literals in BOTH the Spark
plan and the oracle SQL.

Spark-side compute stays JVM-native: ``transform``/``zip_with``/
``aggregate`` higher-order functions per row — no Python UDF, no
explode.  At scale: queries are broadcast (small side), the corpus
scan is embarrassingly parallel; the LSH variant turns the quadratic
all-pairs problem into a per-bucket self-join keyed by an 8-bit
signature.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import load_table, register

QUANT = 10_000
N_QUERIES = 5
TOP_K = 3
N_PLANES = 8
DIM = 64
NEAR_DUP_COSINE = 0.35
# Max vectors per hyperplane bucket before the bucket is excluded from
# pair generation (zero-ish/duplicate embeddings collapse into one
# bucket; a 10^6-member bucket would emit ~10^12 candidate pairs).
# Measured max frequency: 7 at sf0.01, 23 at sf0.1 — 64 leaves the
# fixtures untouched while bounding any bucket's pair count at 64^2/2.
BUCKET_CAP = 64


def _plane(k: int) -> list[int]:
    """Deterministic pseudo-random +-1 hyperplane from md5 (k, i)."""
    return [1 if hashlib.md5(f"{k}:{i}".encode()).digest()[0] % 2 == 0 else -1
            for i in range(DIM)]


PLANES = [_plane(k) for k in range(N_PLANES)]


def _qint(col):
    """Quantized integer embedding: exact, order-independent sums."""
    return F.transform(col, lambda x: F.round(x.cast("double") * QUANT)
                       .cast("long"))


_QINT_SQL = ("list_transform({col}, x -> "
             f"CAST(ROUND(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _norm2(col):
    return F.aggregate(
        _qint(col), F.lit(0).cast("long"), lambda acc, v: acc + v * v)


_NORM2_SQL = ("list_sum(list_transform(" + _QINT_SQL + ", v -> v * v))")


# ---------------------------------------------------------------------------
# brute-force cosine top-k (correctness baseline)
# ---------------------------------------------------------------------------
@register("knn_cosine", sql=f"""
WITH e AS (
  SELECT vec_id, {_QINT_SQL.format(col='embedding')} AS qe,
         CAST({_NORM2_SQL.format(col='embedding')} AS BIGINT) AS n2
  FROM embeddings
),
q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {DIM} + 1),
              i -> q.qe[i] * c.qe[i])) AS BIGINT) AS dot,
         q.n2 AS qn2, c.n2 AS cn2
  FROM q JOIN e c ON c.vec_id != q.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(dot AS DOUBLE)
             / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(cn2 AS DOUBLE))) DESC,
           neighbor_id ASC) AS BIGINT) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, rk, cos FROM scored WHERE rk <= {TOP_K}""")
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _qint(F.col("embedding")).alias("qe"),
        _norm2(F.col("embedding")).alias("n2"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_qe"),
        F.col("n2").alias("q_n2"))
    pairs = F.broadcast(q).join(emb, F.col("vec_id") != F.col("query_id"))
    cos = (_dot(F.col("q_qe"), F.col("qe")).cast("double")
           / (F.sqrt(F.col("q_n2").cast("double"))
              * F.sqrt(F.col("n2").cast("double"))))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"),
                     cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rk", "cos")
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse-quantize into cells, probe the nearest cells only.
# Centroids are the first N_CELLS corpus vectors (deterministic — real
# k-means iteration would converge engine-dependently); assignment is
# exact integer L2.  The scale story: the corpus scan partitions by cell,
# a query touches N_PROBE cells instead of everything.
# ---------------------------------------------------------------------------
N_CELLS = 8
N_PROBE = 2

_L2_SQL = (f"CAST(list_sum(list_transform(range(1, {DIM} + 1), "
           "i -> (a.qe[i] - c.qe[i]) * (a.qe[i] - c.qe[i]))) AS BIGINT)")


@register("ivf_ann", sql=f"""
WITH e AS (
  SELECT vec_id, {_QINT_SQL.format(col='embedding')} AS qe,
         CAST({_NORM2_SQL.format(col='embedding')} AS BIGINT) AS n2
  FROM embeddings
),
cent AS (SELECT vec_id AS cell, qe FROM e WHERE vec_id < {N_CELLS}),
assigned AS (
  SELECT a.vec_id, a.qe, a.n2, c.cell,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_L2_SQL} ASC, c.cell ASC) AS crk
  FROM e a CROSS JOIN cent c
),
cells AS (SELECT vec_id, qe, n2, cell FROM assigned WHERE crk = 1),
probes AS (
  SELECT a.vec_id AS query_id, a.qe AS qqe, a.n2 AS qn2, c.cell,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {_L2_SQL} ASC, c.cell ASC) AS prk
  FROM e a CROSS JOIN cent c
  WHERE a.vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.query_id, v.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, {DIM} + 1),
              i -> p.qqe[i] * v.qe[i])) AS BIGINT) AS dot,
         p.qn2, v.n2
  FROM probes p JOIN cells v ON v.cell = p.cell
  WHERE p.prk <= {N_PROBE} AND v.vec_id != p.query_id
)
SELECT query_id, neighbor_id, rk, cos FROM (
  SELECT query_id, neighbor_id,
         CAST(dot AS DOUBLE)
           / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY CAST(dot AS DOUBLE)
             / (sqrt(CAST(qn2 AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE))) DESC,
           neighbor_id ASC) AS BIGINT) AS rk
  FROM cand
) WHERE rk <= {TOP_K}""")
def ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _qint(F.col("embedding")).alias("qe"),
        _norm2(F.col("embedding")).alias("n2"))
    emb = emb.localCheckpoint(eager=True)  # feeds centroid + corpus branches
    cent = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("qe").alias("ce"))

    l2 = F.aggregate(
        F.zip_with(F.col("qe"), F.col("ce"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("__d").asc(), F.col("cell").asc())
    cells = (
        emb.crossJoin(F.broadcast(cent))
        .withColumn("__d", l2)
        .withColumn("crk", F.row_number().over(w_assign))
        .filter(F.col("crk") == 1)
        .select("vec_id", "qe", "n2", "cell")
    )
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .withColumn("__d", l2)
        .withColumn("prk", F.row_number().over(w_assign))
        .filter(F.col("prk") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"),
                F.col("qe").alias("qqe"), F.col("n2").alias("qn2"), "cell")
    )
    cand = (
        probes.join(cells.withColumnRenamed("cell", "vcell"),
                    (F.col("vcell") == F.col("cell"))
                    & (F.col("vec_id") != F.col("query_id")))
    )
    cos = (_dot(F.col("qqe"), F.col("qe")).cast("double")
           / (F.sqrt(F.col("qn2").cast("double"))
              * F.sqrt(F.col("n2").cast("double"))))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                    cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id", "rk", "cos")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed near-duplicate pairs (the scale path for all-pairs)
# ---------------------------------------------------------------------------
def _bucket_sql() -> str:
    parts = []
    for k, plane in enumerate(PLANES):
        lit = "[" + ", ".join(str(s) for s in plane) + "]"
        parts.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {DIM} + 1), "
            f"i -> qe[i] * ({lit}::BIGINT[])[i])) >= 0 "
            f"THEN {1 << k} ELSE 0 END)")
    return " + ".join(parts)


@register("lsh_near_dup_pairs", sql=f"""
WITH e AS (
  SELECT vec_id, {_QINT_SQL.format(col='embedding')} AS qe,
         CAST({_NORM2_SQL.format(col='embedding')} AS BIGINT) AS n2
  FROM embeddings
),
bucketed AS (
  SELECT vec_id, qe, n2, CAST({_bucket_sql()} AS BIGINT) AS bucket FROM e
),
rare AS (
  SELECT bucket FROM bucketed GROUP BY bucket HAVING COUNT(*) <= {BUCKET_CAP}
),
pruned AS (
  SELECT b.* FROM bucketed b SEMI JOIN rare r ON r.bucket = b.bucket
),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_sum(list_transform(range(1, {DIM} + 1),
              i -> a.qe[i] * b.qe[i])) AS BIGINT) AS dot,
         a.n2 AS an2, b.n2 AS bn2
  FROM pruned a JOIN pruned b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CAST(dot AS DOUBLE)
         / (sqrt(CAST(an2 AS DOUBLE)) * sqrt(CAST(bn2 AS DOUBLE))) AS cos
FROM cand
WHERE CAST(dot AS DOUBLE)
        / (sqrt(CAST(an2 AS DOUBLE)) * sqrt(CAST(bn2 AS DOUBLE)))
      >= {NEAR_DUP_COSINE}""")
def lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _qint(F.col("embedding")).alias("qe"),
        _norm2(F.col("embedding")).alias("n2"))
    bucket = None
    for k, plane in enumerate(PLANES):
        lits = F.array(*[F.lit(s).cast("long") for s in plane])
        sign = F.when(_dot(F.col("qe"), lits) >= 0, 1 << k).otherwise(0)
        bucket = sign if bucket is None else bucket + sign
    # spread the single input split, then materialize: quantization + 8
    # plane dots per vector would otherwise run once PER SELF-JOIN SIDE
    bucketed = (
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .withColumn("bucket", bucket.cast("long"))
        .localCheckpoint(eager=True))
    # Exclude hot buckets BEFORE the self-join: degenerate embeddings
    # (zeros, duplicates) collapse into one bucket, and a 10^6-member
    # bucket would emit ~10^12 candidate pairs.  Same recipe as the
    # shingle/band-key caps in textops.py; plan shape asserted in
    # tests/test_plans.py::test_lsh_near_dup_prunes_before_selfjoin.
    rare = (bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= BUCKET_CAP)
            .select("bucket"))
    bucketed = bucketed.join(rare, "bucket", "left_semi")
    a = bucketed.select(F.col("vec_id").alias("vec_a"),
                        F.col("qe").alias("qe_a"),
                        F.col("n2").alias("n2_a"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("vec_b"),
                        F.col("qe").alias("qe_b"),
                        F.col("n2").alias("n2_b"),
                        F.col("bucket").alias("bucket_b"))
    cos = (_dot(F.col("qe_a"), F.col("qe_b")).cast("double")
           / (F.sqrt(F.col("n2_a").cast("double"))
              * F.sqrt(F.col("n2_b").cast("double"))))
    return (
        a.join(b, (F.col("bucket") == F.col("bucket_b"))
               & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= NEAR_DUP_COSINE)
        .select("vec_a", "vec_b", "cos")
    )


# ---------------------------------------------------------------------------
# element-wise centroids per label — the aggregation that IVF training
# runs at scale: posexplode -> (label, position) partial sums (map-side
# combined), exact quantized-int arithmetic so the oracle hashes match.
# ---------------------------------------------------------------------------
@register("embedding_centroids", sql=f"""
WITH q AS (
  SELECT label, {_QINT_SQL.format(col='embedding')} AS qe FROM embeddings
),
pos AS (
  SELECT label, i, CAST(SUM(qe[CAST(i AS BIGINT)]) AS BIGINT) AS s
  FROM q CROSS JOIN (SELECT unnest(range(1, {DIM} + 1)) AS i)
  GROUP BY label, i
),
cnt AS (SELECT label, COUNT(*) AS n FROM q GROUP BY label)
SELECT p.label,
       CAST(c.n AS BIGINT) AS n_vecs,
       string_agg(CAST(p.s AS VARCHAR), '/' ORDER BY p.i) AS centroid_q
FROM pos p JOIN cnt c ON c.label = p.label
GROUP BY p.label, c.n""")
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select("label", _qint(F.col("embedding")).alias("qe"))
    pos = (
        q.select("label", F.posexplode("qe").alias("i", "v"))
        .groupBy("label", "i")
        .agg(F.sum("v").alias("s"))
    )
    cnt = q.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    agg = pos.groupBy("label").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("i", "s"))),
                        lambda x: x["s"].cast("string")), "/")
        .alias("centroid_q"))
    return (
        agg.join(F.broadcast(cnt), "label")
        .select("label", F.col("n_vecs").cast("long").alias("n_vecs"),
                "centroid_q")
    )
