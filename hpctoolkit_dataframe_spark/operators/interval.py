"""Bucketed interval (range) join: points matched to containing
[lo, hi] intervals.

Spark has no native interval-join strategy: an inequality-only join
falls back to BroadcastNestedLoop (quadratic work at scale), and even a
keyed sort-merge join re-filters every same-key pair when keys are hot.
The classic scalable plan (used by range-join hints and spatial-join
engines) is BUCKETING: quantize time into fixed-width buckets, explode
each interval into the buckets it covers, map each point to its single
bucket, and equi-join on (key..., bucket).  Each candidate pair meets
in EXACTLY ONE bucket (the point's), so no dedup pass is needed; the
exact containment predicate filters locally after the hash join.

Cost model: the shuffle carries |points| + sum(interval spans / width)
rows through one hash equi-join — no nested loop, no row explosion
beyond the bounded per-interval bucket fan-out.  Pick ``bucket_width``
near the TYPICAL interval length: width >> spans wastes bucket
selectivity, width << spans inflates the explode factor (guarded by
``max_span_buckets``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    lo: str,
    hi: str,
    on: str | Sequence[str] | None = None,
    bucket_width: int,
    max_span_buckets: int = 4096,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with ``lo <= point_ts <= hi`` (and
    equal join keys, if ``on`` is given), via bucketed equi-join.

    Timestamps are integer-comparable (repo convention: epoch
    microseconds as LONG).  ``how`` may be ``inner`` or ``left`` (left
    = keep unmatched points with NULL interval columns).  Rows with
    NULL ``point_ts``/``lo``/``hi`` never match.  An interval spanning
    more than ``max_span_buckets`` buckets raises at execution — widen
    the bucket or split the interval upstream.  Non-key column names
    must not collide between the two sides (the output carries both).
    """
    assert how in ("inner", "left"), how
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    w = int(bucket_width)
    assert w > 0
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    assert not overlap, f"colliding non-key columns: {sorted(overlap)}"

    pb = points.withColumn("__pb", F.expr(f"`{point_ts}` div {w}")) \
        .alias("__p")
    # the span guard folds INTO the sequence bound so Catalyst cannot
    # prune it away: an oversized interval raises when enumerated
    span = F.expr(f"`{hi}` div {w} - `{lo}` div {w}")
    end = F.when(
        span >= max_span_buckets,
        F.raise_error(F.concat(
            F.lit(f"interval spans more than {max_span_buckets} "
                  f"buckets of width {w}: "),
            F.col(lo).cast("string"), F.lit(".."),
            F.col(hi).cast("string")))
    ).otherwise(F.expr(f"`{hi}` div {w}"))
    ib = (intervals
          .withColumn("__ib", F.explode(
              F.sequence(F.expr(f"`{lo}` div {w}"), end)))
          .alias("__i"))

    cond = F.col("__p.__pb") == F.col("__i.__ib")
    for k in keys:
        cond = cond & (F.col(f"__p.`{k}`") == F.col(f"__i.`{k}`"))
    cond = (cond
            & (F.col(f"__p.`{point_ts}`") >= F.col(f"__i.`{lo}`"))
            & (F.col(f"__p.`{point_ts}`") <= F.col(f"__i.`{hi}`")))

    icols = [c for c in intervals.columns if c not in keys]
    matched = (pb.join(ib, cond, "inner")
               .select(*[F.col(f"__p.`{c}`") for c in points.columns],
                       *[F.col(f"__i.`{c}`") for c in icols]))
    if how == "inner":
        return matched
    unmatched = (
        pb.join(ib, cond, "left_anti")
        .select(*[F.col(f"__p.`{c}`") for c in points.columns],
                *[F.lit(None).cast(intervals.schema[c].dataType).alias(c)
                  for c in icols]))
    return matched.unionByName(unmatched)
