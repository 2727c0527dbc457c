"""Driver-gate query for the multimodal plumbing (VERDICT r1 #5).

The codecs are honestly stubbed (no media libraries in this container),
but the deterministic fake feature extractor is engine-independent —
``_fake_features`` emits md5-derived bytes — so the Arrow mapInPandas
plumbing (binary columns, batch iteration, worker-side module pickling,
schema contract) gets a real CORRECTNESS row: the oracle recomputes the
same md5 byte stream in pure DuckDB SQL and the features are compared
byte-for-byte after exact float32 -> byte reconstruction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import load_table, register

DIM = 64  # 4 md5 blocks of 16 bytes


def _le4_sql(i: int) -> str:
    """'|| chr(b0) || chr(b1)...' for i.to_bytes(4, 'little')."""
    return "".join(f" || chr({b})" for b in i.to_bytes(4, "little"))


def _byte_sql(h: str, k: int) -> str:
    c1 = f"substr({h}, {2 * k + 1}, 1)"
    c2 = f"substr({h}, {2 * k + 2}, 1)"
    return (f"CAST((instr('0123456789abcdef', {c1}) - 1) * 16"
            f" + instr('0123456789abcdef', {c2}) - 1 AS VARCHAR)")


_FEAT_BYTES = ", ".join(
    _byte_sql(f"h{i}", k) for i in range(DIM // 16) for k in range(16))

_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id, text,
         {", ".join(f"md5(text{_le4_sql(i)}) AS h{i}"
                    for i in range(DIM // 16))}
  FROM documents WHERE doc_id % 5 = 0
)
SELECT media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       concat_ws('/', {_FEAT_BYTES}) AS feat_bytes
FROM m"""


CHUNK = 64   # 'frame' size for the sampling gate (docs are 48-553 B)
EVERY_NTH = 2


@register("media_frame_sample", sql=f"""
-- octet_length = length: this gate builds its fake blobs FROM text, so
-- the char-sliced oracle only equals the byte-sliced operator for
-- ASCII payloads (DuckDB has no BLOB substring) — the contract is now
-- an explicit filter on both engines instead of a corpus assumption
-- (a CJK doc in the adversarial clone broke the implicit version)
WITH f AS (
  SELECT doc_id AS media_id, text,
         unnest(range(0, CAST(ceil(length(text) / {CHUNK}.0) AS BIGINT)))
           AS frame_idx
  FROM documents
  WHERE doc_id % 5 = 0 AND octet_length(encode(text)) = length(text)
)
SELECT media_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       md5(substr(text, CAST(frame_idx * {CHUNK} + 1 AS BIGINT), {CHUNK}))
         AS frame_md5,
       CAST(length(substr(text, CAST(frame_idx * {CHUNK} + 1 AS BIGINT),
                          {CHUNK})) AS BIGINT) AS frame_bytes
FROM f WHERE frame_idx % {EVERY_NTH} = 0""")
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing gate: every-2nd 64-byte 'frame' of each
    blob through the REAL sample_frames mapInPandas stage.  The oracle
    re-chunks in SQL — documents.text is ASCII, so char slices equal
    byte slices and the frame md5s compare exactly."""
    from ..operators.multimodal import sample_frames

    media = (
        load_table(spark, sf_dir, "documents")
        # ASCII-payload contract made explicit (see the oracle SQL
        # comment): the operator slices BYTES, the oracle slices CHARS
        .filter((F.col("doc_id") % 5 == 0)
                & (F.octet_length("text") == F.length("text")))
        # one input file -> one split; spread before the Python stage
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(F.col("doc_id").alias("media_id"),
                F.encode("text", "UTF-8").alias("content"))
    )
    frames = sample_frames(media, every_nth=EVERY_NTH, fake=True,
                           chunk_size=CHUNK)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5("frame").alias("frame_md5"),
        F.octet_length("frame").cast("long").alias("frame_bytes"))


@register("media_fake_features", sql=_SQL)
def media_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text bytes stand in for media blobs; the features flow
    through the REAL extract_features mapInPandas stage (fake codec)."""
    from ..operators.multimodal import extract_features

    media = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(F.col("doc_id").alias("media_id"),
                F.encode("text", "UTF-8").alias("content"))
    )
    feats = extract_features(media, fake=True, dim=DIM)
    # feature f = byte/255 - 0.5 (stored float32); (f+0.5)*255 recovers
    # the byte to within ~1.5e-5, so floor(x+0.5) is exact
    return feats.select(
        "media_id",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.array_join(
            F.transform(
                "features",
                lambda f: F.floor((f + F.lit(0.5)) * 255 + F.lit(0.5))
                .cast("long").cast("string")), "/").alias("feat_bytes"),
    )
