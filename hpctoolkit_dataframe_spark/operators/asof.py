"""As-of (merge-asof) join: for each left row, the nearest right row at
or before (backward) / at or after (forward) its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB and pandas ``merge_asof`` do);
the naive emulation — inequality join + aggregate — explodes to
|left| x |right per key| intermediate rows.  This implementation is the
scalable union+window form: tag both sides, union, and carry the most
recent right payload forward with ``last(ignorenulls)`` over a
(key)-partitioned window.  Cost: ONE shuffle of |left|+|right| rows on
the key, no row explosion, monotonic memory per partition — the shape
that survives a 100x scale-up.  Hot keys are a window (not join) skew;
``time_buckets=N`` pre-splits every key's timeline into N fixed-width
ranges and stitches across them (carry-in rows), turning one dominant
key's single sorted partition into N parallel ones.

Determinism: ties on the right timestamp are broken by the payload
struct's column order (ascending — the LAST one wins), so results are
stable across partitionings and match the oracle's
``max_by(x, [ts, tiebreak...])``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: int | None = None,
    suffix: str = "_right",
    time_buckets: int | None = None,
) -> DataFrame:
    """Returns ``left``'s columns plus the matched right row's
    ``right_ts`` (suffixed) and ``right_cols`` (suffixed on collision),
    NULL where no right row qualifies.

    Timestamps must be integer-comparable (the repo convention is epoch
    microseconds as LONG); ``tolerance`` is in the same units.  A left
    row with a NULL timestamp yields NULL match columns (pandas
    merge_asof would raise instead); NULL right timestamps never match.

    ``time_buckets=N`` (hot-key pre-split): partitions the window by
    (key, time-range bucket) instead of (key), after injecting one
    synthetic "carry-in" row per probe bucket holding the last right
    payload from all earlier buckets.  Results are IDENTICAL to the
    default path (property-tested); cost is one bounded min/max driver
    job plus two small aggregations, in exchange for a dominant key's
    window sort spreading over N partitions.  Use when one key holds an
    unbounded share of rows; leave None for the single-shuffle path.
    """
    assert direction in ("backward", "forward"), direction
    right_ts = right_ts or left_ts
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    right_cols = list(right_cols)

    sign = 1 if direction == "backward" else -1
    # exact matches: the probe must sort AFTER right rows with equal t
    probe_tag, ref_tag = (1, 0) if allow_exact_matches else (0, 1)

    payload_type = T.StructType(
        [T.StructField("__rts", T.LongType())]
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols])
    payload = F.struct(
        (F.col(right_ts).cast("long") * sign).alias("__rts"),
        *[F.col(c) for c in right_cols])

    lcols = list(left.columns)
    l2 = left.select(
        *lcols,
        (F.col(left_ts).cast("long") * sign).alias("__t"),
        F.lit(probe_tag).alias("__tag"),
        F.lit(None).cast(payload_type).alias("__payload"))
    r2 = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c).alias(c) if c in keys
          else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        (F.col(right_ts).cast("long") * sign).alias("__t"),
        F.lit(ref_tag).alias("__tag"),
        payload.alias("__payload"))

    part_keys = list(keys)
    both = l2.unionByName(r2)
    if time_buckets and time_buckets > 1:
        both = _split_time_buckets(both, keys, time_buckets, payload_type)
        part_keys = keys + ["__bucket"]

    w = (Window.partitionBy(*part_keys)
         .orderBy(F.col("__t").asc(), F.col("__tag").asc(),
                  F.col("__payload").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("__payload", ignorenulls=True).over(w)

    out = (
        both
        .withColumn("__m", matched)
        .filter(F.col("__tag") == probe_tag)
    )
    # equi-join semantics: a NULL key never matches anything, but the
    # window groups all NULL-key rows into one partition where a
    # NULL-key probe would see NULL-key right rows — mask it (r8)
    keys_ok = F.lit(True)
    for k in keys:
        keys_ok = keys_ok & F.col(k).isNotNull()
    out = out.withColumn("__m", F.when(keys_ok, F.col("__m")))
    if tolerance is not None:
        out = out.withColumn(
            "__m",
            F.when(F.col("__t") - F.col("__m.__rts") <= int(tolerance),
                   F.col("__m")))

    ts_out = right_ts if right_ts not in lcols else f"{right_ts}{suffix}"
    sel = [*lcols, (F.col("__m.__rts") * sign).cast("long").alias(ts_out)]
    for c in right_cols:
        name = c if c not in lcols else f"{c}{suffix}"
        sel.append(F.col(f"__m.{c}").alias(name))
    return out.select(*sel)


def _split_time_buckets(both: DataFrame, keys: list[str],
                        n_buckets: int, payload_type) -> DataFrame:
    """Hot-key pre-split: assign every row a fixed-width time bucket and
    inject, per (key, probe bucket), one synthetic right row carrying
    the best payload from all EARLIER buckets, so a window partitioned
    by (key, bucket) matches the (key)-only window exactly.

    Probe rows are ``__payload IS NULL``; right rows carry a payload.
    The carry-in sorts first in its bucket (``__t`` = bucket start,
    ``__tag`` = -1 < both real tags) and loses to any later real right
    row under ``last(ignorenulls)`` — exactly the stitched semantics.
    """
    # bounded driver step: two scalars decide the bucket boundaries
    lo, hi = both.agg(F.min("__t"), F.max("__t")).collect()[0]
    if lo is None or hi <= lo:
        return both.withColumn("__bucket", F.lit(0).cast("long"))
    span = (hi - lo) // n_buckets + 1
    b = both.withColumn("__bucket", F.expr(f"(__t - {lo}) div {span}"))
    # NULL __t probes land in bucket NULL: their own partition with no
    # right rows, so the match stays NULL — correct by construction.

    best_t = T.StructType([T.StructField("__t", T.LongType()),
                           T.StructField("__tag", T.IntegerType()),
                           T.StructField("__payload", payload_type)])
    rb = (b.filter(F.col("__payload").isNotNull())
          .groupBy(*keys, "__bucket")
          .agg(F.max(F.struct("__t", "__tag", "__payload")).alias("__best"))
          .withColumn("__probe_marker", F.lit(False)))
    pb = (b.filter(F.col("__payload").isNull()
                   & F.col("__bucket").isNotNull())
          .select(*keys, "__bucket").distinct()
          .withColumn("__best", F.lit(None).cast(best_t))
          .withColumn("__probe_marker", F.lit(True)))
    # per key: the best right payload of any STRICTLY earlier bucket
    wc = (Window.partitionBy(*keys).orderBy("__bucket")
          .rangeBetween(Window.unboundedPreceding, -1))
    carry = (rb.unionByName(pb)
             .withColumn("__carry", F.max("__best").over(wc))
             .filter(F.col("__probe_marker")
                     & F.col("__carry").isNotNull()))
    synth = carry.select(
        *[(F.col(f.name) if f.name in keys
           else F.lit(None).cast(f.dataType).alias(f.name))
          for f in b.schema.fields
          if f.name not in ("__t", "__tag", "__payload", "__bucket")],
        (F.lit(lo) + F.col("__bucket") * F.lit(span))
        .cast("long").alias("__t"),
        F.lit(-1).alias("__tag"),
        F.col("__carry.__payload").alias("__payload"),
        F.col("__bucket"))
    return b.unionByName(synth)
