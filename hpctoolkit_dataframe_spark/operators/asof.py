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
if one key dominates, pre-split it by time range and stitch.

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
) -> DataFrame:
    """Returns ``left``'s columns plus the matched right row's
    ``right_ts`` (suffixed) and ``right_cols`` (suffixed on collision),
    NULL where no right row qualifies.

    Timestamps must be integer-comparable (the repo convention is epoch
    microseconds as LONG); ``tolerance`` is in the same units.  A left
    row with a NULL timestamp yields NULL match columns (pandas
    merge_asof would raise instead); NULL right timestamps never match.
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

    w = (Window.partitionBy(*keys)
         .orderBy(F.col("__t").asc(), F.col("__tag").asc(),
                  F.col("__payload").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("__payload", ignorenulls=True).over(w)

    out = (
        l2.unionByName(r2)
        .withColumn("__m", matched)
        .filter(F.col("__tag") == probe_tag)
    )
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
