"""Product-analytics patterns over the events stream: multi-step
funnel conversion and cohort retention — the two queries every
event-warehouse team runs daily, expressed in the repo's exact-integer
event-time convention (LONG nanoseconds in Spark, epoch_us in the
oracle, all bucketing by integer division).

The funnel's step matching is a single per-user ordered window scan
(suffix-min of the next purchase, then suffix-min of the (next click,
its next purchase) struct) — O(n log n) per user with NO join between
steps.  The bucketed-interval-join formulation it replaced was hash
equi-join safe, but its (user, bucket) key still emitted
views-per-bucket x clicks-per-bucket candidate pairs, which the
skewed-clone probe (tools/make_skew_data.py) measured at x17 wall time
when one bot user held 45% of events; the window scan is linear in the
hot user's row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import load_table, register

FUNNEL_H_US = 86_400_000_000  # step-to-step horizon: 24h in microseconds
_US_PER_DAY = 86_400_000_000
_US_PER_WEEK = 7 * _US_PER_DAY


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", spread=True)
    return ev.select("event_id", "user_id", "event_type",
                     F.expr("ts div 1000").alias("ts_us"))


@register("funnel_view_click_purchase", sql=f"""
WITH e AS (SELECT event_id, user_id, event_type,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events),
v AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'view'),
c AS (SELECT user_id, ts_us FROM e WHERE event_type = 'click'),
p AS (SELECT user_id, ts_us FROM e WHERE event_type = 'purchase'),
-- earliest-next-step via ASOF (nearest-match) joins: the former
-- banded v x c equi-join emitted quadratic per-user candidate pairs
-- and spilled the r9 skew-100x sweep to ENOSPC (one bot user = 45%
-- of events); ASOF picks each view's first later click directly —
-- linear in the hot user, values identical (verified old==new at
-- sf0.001/0.01/0.1 + both skew clones).  MATERIALIZED fences keep
-- the horizon filter OUT of the ASOF ON clause (DuckDB rejects a
-- second pushed inequality), and the first-later-click is in the
-- 24h window iff it is <= v_ts + H, so filter-after == min-within.
vc0 AS MATERIALIZED (
  SELECT v.event_id, v.user_id, v.ts_us AS v_ts, c.ts_us AS c_ts
  FROM v ASOF LEFT JOIN c ON c.user_id = v.user_id AND c.ts_us > v.ts_us
),
vc AS (
  SELECT event_id, user_id, v_ts, CAST(c_ts AS BIGINT) AS c_ts FROM vc0
  WHERE c_ts IS NOT NULL AND c_ts <= v_ts + {FUNNEL_H_US}
),
vcp0 AS MATERIALIZED (
  SELECT vc.event_id, vc.v_ts, vc.c_ts, p.ts_us AS p_ts
  FROM vc ASOF LEFT JOIN p ON p.user_id = vc.user_id AND p.ts_us > vc.c_ts
),
vcp AS (
  SELECT event_id, v_ts FROM vcp0
  WHERE p_ts IS NOT NULL AND p_ts <= c_ts + {FUNNEL_H_US}
),
per_day_v AS (
  SELECT ts_us // {_US_PER_DAY} AS day, CAST(COUNT(*) AS BIGINT) AS n_views
  FROM v GROUP BY 1),
per_day_c AS (
  SELECT v_ts // {_US_PER_DAY} AS day, CAST(COUNT(*) AS BIGINT) AS n_clicked
  FROM vc GROUP BY 1),
per_day_p AS (
  SELECT v_ts // {_US_PER_DAY} AS day,
         CAST(COUNT(*) AS BIGINT) AS n_purchased
  FROM vcp GROUP BY 1)
SELECT a.day, a.n_views,
       CAST(COALESCE(b.n_clicked, 0) AS BIGINT) AS n_clicked,
       CAST(COALESCE(p.n_purchased, 0) AS BIGINT) AS n_purchased,
       CAST(COALESCE(b.n_clicked, 0) AS DOUBLE)
         / CAST(a.n_views AS DOUBLE) AS click_rate,
       CAST(COALESCE(p.n_purchased, 0) AS DOUBLE)
         / CAST(a.n_views AS DOUBLE) AS purchase_rate
FROM per_day_v a
LEFT JOIN per_day_c b ON b.day = a.day
LEFT JOIN per_day_p p ON p.day = a.day""")
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step funnel (view -> first click within 24h -> purchase within
    24h of THAT click), reported per view-day.  Funnel attribution is
    earliest-next-step, computed by ONE per-user ordered scan:

    - sort each user's events by (ts, tie-rank, event_id), where the
      tie-rank orders purchase < click < view at EQUAL timestamps so a
      "rows following" frame contains exactly the events with STRICTLY
      later ts of the step being probed;
    - pass 1: nxt_p = suffix-min of purchase ts (for a click row this
      is the earliest purchase with ts > click ts);
    - pass 2: nxt_c = suffix-min of struct(click ts, that click's
      nxt_p) — struct min orders by ts first, and equal-ts clicks
      share one nxt_p (only clicks can sort between them), so the
      struct is well-defined and carries the step-2 answer along;
    - a view row converts at step 1 iff nxt_c.c <= v_ts + H, and at
      step 2 iff additionally nxt_c.p <= nxt_c.c + H.

    Both windows share partition+order, so the plan is one user-key
    shuffle + one sort — linear in any one user's activity.  The
    previous bucketed-interval-join version emitted quadratic
    per-(user, bucket) candidate pairs under user skew (x17 on the
    skewed clone)."""
    e = (_events_us(spark, sf_dir)
         .filter(F.col("event_type").isin("view", "click", "purchase")))
    rk = (F.when(F.col("event_type") == "purchase", 0)
          .when(F.col("event_type") == "click", 1).otherwise(2))
    # DESCENDING time + running min over (unboundedPreceding, current):
    # Spark's UnboundedPreceding frame accumulates incrementally (O(n)
    # per partition), while a (1, unboundedFollowing) frame re-scans
    # the suffix PER ROW — O(n^2), measured as a multi-minute hang on
    # the skewed clone's 450k-event user.  "Preceding in descending
    # order" = strictly-later events, because at equal ts the rank
    # sorts purchase < click < view ascending (so descending puts
    # same-ts clicks/purchases BEHIND the rows that must not see
    # them); the current row's own contribution to each min is NULL
    # everywhere it is consumed (a view is never a click; a click is
    # never a purchase), so no frame exclusion is needed.
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("rk").desc(), F.col("event_id").desc())
    later = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sent = (1 << 62)  # orderable "no purchase follows" sentinel
    e1 = (e.withColumn("rk", rk)
          .withColumn("nxt_p", F.min(F.when(
              F.col("event_type") == "purchase", F.col("ts_us")))
              .over(later)))
    e2 = e1.withColumn("nxt_c", F.min(F.when(
        F.col("event_type") == "click",
        F.struct(F.col("ts_us").alias("c"),
                 F.coalesce("nxt_p", F.lit(sent)).alias("p"))))
        .over(later))
    v = (e2.filter(F.col("event_type") == "view")
         .select("event_id", "user_id",
                 F.col("ts_us").alias("v_ts"), "nxt_c"))
    # NULL-user views count in n_views (the SQL's per_day_v keeps
    # them) but can never convert: the oracle's equi-join never
    # matches NULL keys, while partitionBy("user_id") groups NULL
    # users into ONE partition where the scan would happily pair a
    # NULL-user view with a NULL-user click (ADVICE r7).
    clicked = (F.col("user_id").isNotNull()
               & (F.col("nxt_c.c") <= F.col("v_ts") + FUNNEL_H_US))
    purchased = clicked & (F.col("nxt_c.p") <= F.col("nxt_c.c")
                           + FUNNEL_H_US)
    day = F.expr(f"v_ts div {_US_PER_DAY}").alias("day")
    # one aggregate replaces the old per-step frames + day joins: a
    # day's step counts are plain conditional sums over its view rows
    # (a day with zero conversions is a 0, exactly what the old
    # left-join + COALESCE produced)
    return (v.groupBy(day).agg(
        F.count(F.lit(1)).cast("long").alias("n_views"),
        # when/otherwise, not cast: a NULL nxt_c (no click ever
        # follows) must count as 0, and an all-unconverted day must
        # sum to 0, not NULL
        F.sum(F.when(clicked, 1).otherwise(0)).cast("long")
        .alias("n_clicked"),
        F.sum(F.when(purchased, 1).otherwise(0)).cast("long")
        .alias("n_purchased"))
        .select(
            "day", "n_views", "n_clicked", "n_purchased",
            (F.col("n_clicked").cast("double")
             / F.col("n_views").cast("double")).alias("click_rate"),
            (F.col("n_purchased").cast("double")
             / F.col("n_views").cast("double")).alias("purchase_rate")))


@register("cohort_retention", sql=f"""
WITH e AS (SELECT user_id,
                  CAST(epoch_us(ts) AS BIGINT) // {_US_PER_WEEK} AS week
           FROM events),
first_w AS (SELECT user_id, CAST(MIN(week) AS BIGINT) AS cohort_w
            FROM e GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM e),
cohort_size AS (SELECT cohort_w, COUNT(*) AS n0 FROM first_w GROUP BY 1)
SELECT f.cohort_w,
       CAST(a.week - f.cohort_w AS BIGINT) AS offset_w,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS DOUBLE) / CAST(s.n0 AS DOUBLE) AS retention
FROM active a
JOIN first_w f ON f.user_id = a.user_id
JOIN cohort_size s ON s.cohort_w = f.cohort_w
GROUP BY f.cohort_w, offset_w, s.n0""")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by their first
    active week; each later week's survivors as a count + fraction of
    the cohort.  Week ids are exact integer division of epoch_us —
    the repo's standard cross-engine time bucketing."""
    e = (_events_us(spark, sf_dir)
         .select("user_id",
                 F.expr(f"ts_us div {_US_PER_WEEK}").alias("week")))
    active = e.distinct()  # one row per (user, active week)
    first_w = active.groupBy("user_id").agg(
        F.min("week").cast("long").alias("cohort_w"))
    size = first_w.groupBy("cohort_w").agg(
        F.count(F.lit(1)).alias("n0"))
    return (active.join(first_w, "user_id")
            .groupBy("cohort_w",
                     (F.col("week") - F.col("cohort_w")).cast("long")
                     .alias("offset_w"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .join(F.broadcast(size), "cohort_w")
            .select("cohort_w", "offset_w", "n_users",
                    (F.col("n_users").cast("double")
                     / F.col("n0").cast("double")).alias("retention")))


@register("event_sequence_matches", sql="""
WITH seq AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(event_type, ' '
                    ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS s
  FROM events GROUP BY user_id)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(s, 'view click purchase')) AS BIGINT)
         AS n_vcp,
       CAST(len(regexp_extract_all(s, 'error error')) AS BIGINT)
         AS n_error_bursts,
       CAST(len(regexp_extract_all(s, 'signup')) AS BIGINT) AS n_signups
FROM seq""")
def event_sequence_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: each user's event stream as an ordered
    type sequence, patterns counted by non-overlapping regex scan
    (leftmost, advance-past-match — identical in Java regex and RE2).
    Contiguous-triple conversions, repeated-error bursts, signups.
    The per-user collect is bounded by one user's activity (the same
    contract as sessionization); ordering ties break on event_id so
    the sequence is deterministic."""
    e = _events_us(spark, sf_dir)
    seq = (e.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("ts_us", "event_id", "event_type"))),
                        lambda x: x["event_type"]), " ").alias("s")))
    return seq.select(
        "user_id", "n_events",
        F.regexp_count("s", F.lit("view click purchase")).cast("long")
        .alias("n_vcp"),
        F.regexp_count("s", F.lit("error error")).cast("long")
        .alias("n_error_bursts"),
        F.regexp_count("s", F.lit("signup")).cast("long").alias("n_signups"))


@register("ab_test_purchase_value", sql=f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN {{h}} % 2 = 0 THEN 'A' ELSE 'B' END AS grp
  FROM (SELECT DISTINCT user_id FROM events)),
p AS (
  SELECT e.user_id, CAST(ROUND(e.value * 100) AS BIGINT) AS v_c
  FROM events e WHERE e.event_type = 'purchase'),
g AS (
  -- HUGEINT sums: a single $3e7 purchase makes v_c^2 overflow BIGINT
  -- (ANSI throw on the Spark side — adversarial-events probe); the
  -- Spark twin sums DECIMAL(38,0)
  SELECT u.grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(p.v_c AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(CAST(p.v_c AS HUGEINT) * p.v_c) AS HUGEINT) AS ss
  FROM p JOIN u ON u.user_id = p.user_id GROUP BY u.grp)
SELECT a.n AS n_a, b.n AS n_b,
       CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_a_c,
       CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean_b_c,
       (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
        - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
       / sqrt(
           (CAST(a.ss AS DOUBLE) / CAST(a.n AS DOUBLE)
            - (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
              * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)))
             / CAST(a.n AS DOUBLE)
           + (CAST(b.ss AS DOUBLE) / CAST(b.n AS DOUBLE)
              - (CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
                * (CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)))
             / CAST(b.n AS DOUBLE)) AS welch_t
FROM (SELECT * FROM g WHERE grp = 'A') a
CROSS JOIN (SELECT * FROM g WHERE grp = 'B') b""".format(
    h="(" + " + ".join(
        f"(instr('0123456789abcdef', substr(md5('ab:' || CAST(user_id AS "
        f"VARCHAR)), {k + 1}, 1)) - 1) * {16 ** (7 - k)}"
        for k in range(8)) + ")"))
def ab_test_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split A/B comparison of purchase value: users split by a
    deterministic md5 coin (rerun-stable, no RNG), per-arm mean and a
    Welch t statistic computed from EXACT integer (sum, sum-of-squares)
    aggregates — every double derives from identical BIGINTs on both
    engines, so even sqrt-of-variance hashes exactly.  The aggregate
    is one purchase-row shuffle; the final stats are a 2-row join."""
    ev = load_table(spark, sf_dir, "events", spread=True)
    coin = F.conv(F.substring(F.md5(
        F.concat(F.lit("ab:"), F.col("user_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 2
    u = (ev.select("user_id").distinct()
         .select("user_id",
                 F.when(coin == 0, "A").otherwise("B").alias("grp")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("user_id",
                 F.round(F.col("value") * 100).cast("long").alias("v_c")))
    # DECIMAL(19,0) operands -> DECIMAL(38,0) products/sums: v_c^2 of a
    # $3e7 purchase overflows INT64 and ANSI throws (adversarial-events
    # probe); 128-bit keeps the moments exact, and the final
    # cast-to-double of the same exact integer rounds identically on
    # both engines (DuckDB side sums HUGEINT)
    vc_d = F.col("v_c").cast("decimal(19,0)")
    g = (p.join(u, "user_id").groupBy("grp")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(vc_d).alias("s"),
              F.sum(vc_d * F.col("v_c")).alias("ss")))
    a = g.filter(F.col("grp") == "A").select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("ss").alias("ss_a"))
    b = g.filter(F.col("grp") == "B").select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("ss").alias("ss_b"))
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    var_over_n = lambda s, ss, n: (  # noqa: E731
        (F.col(ss).cast("double") / F.col(n).cast("double")
         - mean(s, n) * mean(s, n)) / F.col(n).cast("double"))
    return (a.crossJoin(b)
            .select("n_a", "n_b",
                    mean("s_a", "n_a").alias("mean_a_c"),
                    mean("s_b", "n_b").alias("mean_b_c"),
                    ((mean("s_a", "n_a") - mean("s_b", "n_b"))
                     / F.sqrt(var_over_n("s_a", "ss_a", "n_a")
                              + var_over_n("s_b", "ss_b", "n_b")))
                    .alias("welch_t")))


@register("stickiness_dau_wau", sql=f"""
WITH a AS (
  SELECT DISTINCT user_id,
         CAST(epoch_us(ts) AS BIGINT) // {_US_PER_DAY} AS day
  FROM events),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM a GROUP BY day),
contrib AS (
  SELECT user_id, CAST(j AS BIGINT) AS report_day
  FROM a, UNNEST(range(day, day + 7)) AS t(j)),
wau AS (
  SELECT report_day AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY report_day)
SELECT d.day, d.dau, w.wau,
       CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
FROM dau d JOIN wau w ON w.day = d.day""")
def stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-WAU stickiness per day.  The trailing
    distinct is computed WITHOUT a window-over-sets: each (user,
    active-day) row contributes to the 7 report days it stays "weekly
    active" for (a bounded explode), then one distinct count per
    report day — the shape that scales, since per-day user sets never
    materialize as arrays.  Days with events always have a WAU row, so
    the join never drops observed days."""
    a = (_events_us(spark, sf_dir)
         .select("user_id",
                 F.expr(f"ts_us div {_US_PER_DAY}").alias("day"))
         .distinct()
         .localCheckpoint(eager=True))  # feeds dau + contrib branches
    dau = a.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    contrib = a.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6))
        .alias("report_day"))
    wau = (contrib.groupBy(F.col("report_day").alias("day"))
           .agg(F.count_distinct("user_id").cast("long").alias("wau")))
    return (dau.join(wau, "day")
            .select("day", "dau", "wau",
                    (F.col("dau").cast("double")
                     / F.col("wau").cast("double")).alias("stickiness")))
