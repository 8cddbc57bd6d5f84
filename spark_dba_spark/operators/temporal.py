"""Temporal operators Spark lacks as built-ins: as-of join and
time-range window frames.

The reference has no temporal surface at all (its one job never inspects a
field — SURVEY.md §2.4); these belong to the engine's extended
training-pipeline/time-series family. Both are expressed with exact-SQL
semantics so the DuckDB oracle gates them (ASOF JOIN / RANGE BETWEEN
INTERVAL are native DuckDB features).

Scale design:

- ``join_asof`` uses the union-tag + windowed last-carry pattern: both
  inputs shuffle ONCE on the join key, then a single ordered window pass
  carries the most recent build-side row forward onto probe rows. No range
  explosion, no per-key loop, no broadcast requirement — O(n log n) within
  each key partition, skew handled by AQE like any other keyed shuffle.
  (The naive alternatives — a theta-join `ts >= o_orderdate` then
  max-per-event, or per-key collect — blow up quadratically or collect.)
- ``window_range_1h`` is a native RANGE frame over epoch seconds —
  whole-stage-codegen'd window aggregation, one shuffle on the partition
  key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import catalog
from .relational import REVENUE
from ..functions.numeric import (  # noqa: F401
    davg,
    rat_round6_duck,
    rat_round6_signed_duck,
    rat_round6_signed_spark,
    rat_round6_spark,
    sql_davg,
    sql_dsum,
)
from ..registry import QuerySpec


def asof_join_backward(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    carry_cols: list[str],
) -> DataFrame:
    """Generic backward as-of join: for each probe row, carry forward the
    columns of the most recent build row with ``build_time <= probe_time``
    for the same ``key`` (inclusive; probe rows with no prior build row get
    nulls). One shuffle per side on the key, one ordered window pass —
    no range explosion, no per-key loops.

    Determinism: if several build rows share (key, build_time), the LAST
    one in the window order wins — pre-dedupe the build side when exact
    tie-break semantics matter."""
    p = probe.withColumn("_t", F.col(probe_time)).withColumn(
        "_side", F.lit(1)  # probe rows sort AFTER build rows at equal time
    )
    b = build.select(
        F.col(key),
        F.col(build_time).alias("_t"),
        F.lit(0).alias("_side"),
        *carry_cols,
    )
    tagged = p.unionByName(b, allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = tagged
    for c in carry_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_t", "_side")


def asof_join_forward(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_time: str,
    build_time: str,
    carry_cols: list[str],
) -> DataFrame:
    """Forward as-of join: for each probe row, the EARLIEST build row with
    ``build_time >= probe_time`` for the same ``key`` (inclusive; probe
    rows with no later build row get nulls) — the "what happened next"
    twin of :func:`asof_join_backward`, same union + ordered-window
    machinery with the frame reversed. One shuffle per side on the key,
    no range explosion.

    Determinism: probe rows sort BEFORE build rows at equal time (the
    inclusive boundary), and ties among build rows at one (key, time)
    resolve to the first in window order — pre-dedupe the build side
    when exact tie-break semantics matter."""
    p = probe.withColumn("_t", F.col(probe_time)).withColumn(
        "_side", F.lit(0)  # probe rows sort BEFORE build rows at equal time
    )
    b = build.select(
        F.col(key),
        F.col(build_time).alias("_t"),
        F.lit(1).alias("_side"),
        *carry_cols,
    )
    tagged = p.unionByName(b, allowMissingColumns=True)
    w = (
        W.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    out = tagged
    for c in carry_cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 0).drop("_t", "_side")


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the most recent order (o_orderdate <= ts) of the
    customer with key = user_id. Build side is pre-deduped to one row per
    (custkey, orderdate) so the match is fully deterministic in both
    engines (DuckDB ASOF leaves intra-timestamp ties unspecified)."""
    ev = catalog.load(spark, sf_dir, "events")
    orders = (
        catalog.load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    probe = ev.select(
        F.col("user_id"), "ts", "event_id", "event_type"
    )
    build = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("bt"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
    )
    return (
        asof_join_backward(
            probe, build, "user_id", "ts", "bt",
            ["asof_orderkey", "asof_orderdate"],
        )
        .select(
            "event_id", "user_id", "ts", "event_type",
            "asof_orderkey", "asof_orderdate",
        )
        .orderBy("event_id")
    )


ORACLE_ASOF = """
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate
FROM events e ASOF LEFT JOIN
     (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2) o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY event_id
"""


def window_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: rolling 1-hour event count and value sum (RANGE frame over
    time, not ROWS — simultaneous events all see the same frame)."""
    ev = catalog.load(spark, sf_dir, "events")
    # Frame axis = epoch MICROseconds on both engines: a seconds-truncated
    # axis (unix_timestamp/epoch) would round frame boundaries differently
    # for sub-second timestamps.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.expr("unix_micros(cast(ts as timestamp))"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.withColumn("n_1h", F.count("*").over(w))
        .withColumn(
            "sum_1h",
            F.sum(F.col("value").cast("decimal(25,6)")).over(w).cast("double"),
        )
        .select("event_id", "user_id", "ts", "n_1h", "sum_1h")
        .orderBy("event_id")
    )


ORACLE_RANGE_1H = f"""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def ev_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analytics: per user, first signup → first click
    AFTER the signup → first purchase AFTER that click; one summary row of
    stage conversion counts. Each stage is a conditional-min agg keyed on
    user_id joined back to the event stream — three shuffles on the SAME
    key, so AQE reuses the partitioning; no window over the whole stream,
    no per-user collect. The sequential "after the previous stage"
    semantics is what plain sessionization can't express."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("ts1")
    )
    s2 = (
        ev.join(s1, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("ts1").alias("ts1"),
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("ts1")),
                    F.col("ts"),
                )
            ).alias("ts2"),
        )
    )
    s3 = (
        ev.join(s2, "user_id")
        .groupBy("user_id")
        .agg(
            F.first("ts1").alias("ts1"),
            F.first("ts2").alias("ts2"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("ts2")),
                    F.col("ts"),
                )
            ).alias("ts3"),
        )
    )
    return s3.agg(
        F.count("*").alias("n_users"),
        F.count("ts1").alias("n_signup"),
        F.count("ts2").alias("n_signup_click"),
        F.count("ts3").alias("n_full_funnel"),
    )


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS ts1
  FROM events GROUP BY user_id),
s2 AS (
  SELECT e.user_id, ANY_VALUE(ts1) AS ts1,
         MIN(CASE WHEN event_type = 'click' AND ts > ts1 THEN ts END) AS ts2
  FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, ANY_VALUE(ts1) AS ts1, ANY_VALUE(ts2) AS ts2,
         MIN(CASE WHEN event_type = 'purchase' AND ts > ts2 THEN ts END) AS ts3
  FROM events e JOIN s2 USING (user_id) GROUP BY e.user_id)
SELECT COUNT(*) AS n_users, COUNT(ts1) AS n_signup,
       COUNT(ts2) AS n_signup_click, COUNT(ts3) AS n_full_funnel
FROM s3
"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def ev_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): per user, events closer
    than 30 minutes chain into one session; emits one row per session with
    count, start, end and duration — the batch twin of the streaming
    session window (ev_session_30m) and the canonical lag + running-sum
    island pattern the relational surface was missing.

    Plan: both windows and the final agg key on user_id — ONE shuffle
    reused across lag, running sum and groupBy (high-cardinality key at
    scale, no skew hotspot). Frame axis is epoch microseconds on both
    engines; the boundary is exact integer arithmetic (gap > 30min in
    micros), so no seconds-truncation edge can flip a session split."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    df = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("is_new").over(run))
    )
    return (
        df.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            ((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000.0)).alias(
                "duration_sec"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


ORACLE_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
islands AS (
  SELECT user_id, ts, ts_us,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_seq
  FROM flagged)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       (MAX(ts_us) - MIN(ts_us)) / 1000000.0 AS duration_sec
FROM islands
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def ev_scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a change-event stream: per user,
    collapse consecutive identical event_types into validity intervals
    [valid_from, valid_to) with an is_current flag — the
    slowly-changing-dimension load every warehouse pipeline runs.

    Plan: change-point detection (lag) and interval close (lead) are two
    window passes over the SAME (user_id, ts, event_id) ordering — one
    shuffle on the high-cardinality user key, no self-join (the naive
    form joins the stream to itself on "next change"). Map-side nothing
    else; scales like any keyed window."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.col("event_type").alias("status")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_status", F.lag("status").over(w))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("status") != F.col("prev_status"))
        )
        .withColumn("valid_to", F.lead("ts").over(w))
    )
    return changes.select(
        "user_id",
        "status",
        F.col("ts").alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


ORACLE_SCD2 = """
WITH changes AS (
  SELECT user_id, event_type AS status, ts, event_id
  FROM (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type) OVER w AS prev_status
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
  WHERE prev_status IS NULL OR event_type <> prev_status)
SELECT user_id, status, ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       LEAD(ts) OVER w2 IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from
"""


def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort triangle: users grouped by first-seen week
    (cohort), counted as retained in each later week they were active —
    the standard growth-analytics matrix.

    Plan: first-seen agg + distinct (user, week) activity both shuffle
    on user_id (AQE reuses the partitioning for the join); the final
    cohort agg is on tiny (cohort_week, offset) keys. Week boundaries
    come from date_trunc on both engines (ISO Monday weeks), offsets are
    exact integer day-diffs div 7 — no float, no tz dependence."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", F.expr("cast(date_trunc('week', ts) as date)").alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .withColumn(
            "week_offset", F.expr("datediff(wk, cohort_week) div 7")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


ORACLE_RETENTION = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
first AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, wk FROM ev)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2 ORDER BY cohort_week, week_offset
"""


def ev_cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge/apply: collapse a change-event stream into the current
    snapshot — the MERGE INTO / upsert-with-tombstone semantics every
    lakehouse table maintenance job runs. 'signup' is the insert image,
    'click'/'view'/'purchase' are updates (last-writer-wins on
    (ts, event_id)), 'error' is a delete tombstone: a user whose LATEST
    change is a tombstone, or who was never inserted, is absent from the
    snapshot.

    Plan: one window pass on the user key picks the winning record (no
    self-join, no per-key collect), and the per-user lifecycle aggregates
    (change count, insert time) ride the same shuffle via a groupBy on
    the identical key — AQE coalesces the two into co-partitioned stages.
    Scales like any keyed window: the state per user is O(1)."""
    ev = catalog.load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )
    life = ev.groupBy("user_id").agg(
        F.count("*").alias("n_changes"),
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "inserted_ts"
        ),
    )
    return (
        latest.join(life, "user_id")
        .filter(
            (F.col("last_type") != "error") & F.col("inserted_ts").isNotNull()
        )
        .select(
            "user_id", "last_type", "last_value", "last_ts", "n_changes",
            "inserted_ts",
        )
        .orderBy("user_id")
    )


ORACLE_CDC = """
WITH latest AS (
  SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1),
life AS (
  SELECT user_id, COUNT(*) AS n_changes,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS inserted_ts
  FROM events GROUP BY user_id)
SELECT user_id, last_type, last_value, last_ts, n_changes, inserted_ts
FROM latest JOIN life USING (user_id)
WHERE last_type <> 'error' AND inserted_ts IS NOT NULL
ORDER BY user_id
"""


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: each event pairs with the order of the
    same customer at MINIMUM |o_orderdate − ts| (backward OR forward) —
    the sensor-alignment mode (align each reading to the closest
    calibration, not merely the last one). Ties (equidistant before and
    after) take the earlier order date, fully deterministic.

    Plan: two windowed carry passes over the SAME union-tagged stream —
    backward (largest bt ≤ ts, bt==ts counts as backward) and forward
    (smallest bt > ts, via the descending ordering with probe rows
    sorting before equal-time build rows so equality is excluded) — then
    a map-side nearer-of-two pick. Both passes key on user_id: one
    shuffle each, no range explosion, no per-event candidate join (the
    naive nearest is events × orders per user)."""
    ev = catalog.load(spark, sf_dir, "events")
    orders = (
        catalog.load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    probe = ev.select("user_id", "ts", "event_id")
    build = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp_ntz").alias("bt"),
        F.col("o_orderkey").alias("bk"),
        F.col("o_orderdate").alias("bd"),
    )
    p = probe.withColumn("_t", F.col("ts")).withColumn("_side", F.lit(1))
    b = build.select(
        "user_id", F.col("bt").alias("_t"), F.lit(0).alias("_side"),
        "bk", "bd",
    )
    tagged = p.unionByName(b, allowMissingColumns=True)
    w_back = (
        W.partitionBy("user_id")
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # descending: equal-time build rows (_side 0) sort AFTER probe rows
    # under desc(_side)? No — order by (_t desc, _side desc) puts probe
    # (side 1) before build (side 0) at equal _t, so an order AT ts is
    # not visible to the forward carry: strictly-after semantics.
    w_fwd = (
        W.partitionBy("user_id")
        .orderBy(F.desc("_t"), F.desc("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        tagged.withColumn("back_k", F.last("bk", ignorenulls=True).over(w_back))
        .withColumn("back_d", F.last("bd", ignorenulls=True).over(w_back))
        .withColumn("fwd_k", F.last("bk", ignorenulls=True).over(w_fwd))
        .withColumn("fwd_d", F.last("bd", ignorenulls=True).over(w_fwd))
        .filter(F.col("_side") == 1)
    )
    ts_us = F.expr("unix_micros(cast(ts as timestamp))")
    back_us = F.expr("unix_micros(cast(back_d as timestamp))")
    fwd_us = F.expr("unix_micros(cast(fwd_d as timestamp))")
    d_back = ts_us - back_us
    d_fwd = fwd_us - ts_us
    use_fwd = F.col("back_d").isNull() | (
        F.col("fwd_d").isNotNull() & (d_fwd < d_back)
    )
    return (
        carried.filter(
            F.col("back_d").isNotNull() | F.col("fwd_d").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(use_fwd, F.col("fwd_k")).otherwise(F.col("back_k")).alias(
                "nearest_orderkey"
            ),
            F.when(use_fwd, F.col("fwd_d")).otherwise(F.col("back_d")).alias(
                "nearest_orderdate"
            ),
            F.when(use_fwd, d_fwd).otherwise(d_back).alias("dist_us"),
        )
        .orderBy("event_id")
    )


ORACLE_ASOF_NEAREST = """
WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
           FROM orders GROUP BY 1, 2)
SELECT event_id, user_id, ts, nearest_orderkey, nearest_orderdate, dist_us
FROM (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey AS nearest_orderkey,
         o.o_orderdate AS nearest_orderdate,
         abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) AS dist_us,
         ROW_NUMBER() OVER (PARTITION BY e.event_id ORDER BY
           abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)), o.o_orderdate) AS rn
  FROM events e JOIN o ON e.user_id = o.o_custkey)
WHERE rn = 1 ORDER BY event_id
"""


def ev_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: signup → first purchase time-to-convert
    distribution per cohort week — the metric behind activation
    dashboards (how fast do new users buy, and is it drifting by
    cohort). Equi-join on user_id then filter (NOT a theta join — the
    range predicate rides the join as a residual filter so the plan
    stays one keyed shuffle), first-purchase via min, exact percentile
    over integer microsecond durations so both engines interpolate the
    same values."""
    ev = catalog.load(spark, sf_dir, "events")
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.expr("unix_micros(cast(ts as timestamp))")).alias("s_us"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.expr("unix_micros(cast(ts as timestamp))").alias("p_us")
    )
    conv = (
        signups.join(purchases, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id", "s_us")
        .agg(F.min("p_us").alias("fp_us"))
        .withColumn(
            "cohort_week",
            F.date_trunc(
                "week", F.expr("timestamp_micros(s_us)").cast("timestamp_ntz")
            ),
        )
        .withColumn("dur_sec", (F.col("fp_us") - F.col("s_us")) / 1_000_000.0)
    )
    return (
        conv.groupBy("cohort_week")
        .agg(
            F.count("*").alias("n_converted"),
            F.round(F.expr("percentile(dur_sec, 0.5)"), 4).alias("median_sec"),
            F.round(F.expr("percentile(dur_sec, 0.9)"), 4).alias("p90_sec"),
        )
        .orderBy("cohort_week")
    )


ORACLE_TIME_TO_CONVERT = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY 1),
conv AS (
  SELECT s.user_id, s.s_us, MIN(epoch_us(e.ts)) AS fp_us
  FROM s JOIN events e ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s_us
  GROUP BY 1, 2)
SELECT CAST(date_trunc('week', make_timestamp(s_us)) AS TIMESTAMP)
         AS cohort_week,
       COUNT(*) AS n_converted,
       ROUND(quantile_cont((fp_us - s_us) / 1000000.0, 0.5), 4) AS median_sec,
       ROUND(quantile_cont((fp_us - s_us) / 1000000.0, 0.9), 4) AS p90_sec
FROM conv GROUP BY 1 ORDER BY cohort_week
"""


def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    — P(next event type | current event type), the session-model fit a
    product pipeline runs for next-action prediction and for flagging
    improbable (bot-like) event chains.

    One shuffle on user_id for the sequence window (LEAD over ts with
    event_id tiebreak so simultaneous events order deterministically),
    then a tiny groupBy on the (prev, next) type pair — the transition
    matrix is |types|² rows regardless of corpus size, so the second
    stage never skews. The row-normalizing window runs on that bounded
    matrix, not the fact stream."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    tr = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("prev_type"),
            F.col("next_type").alias("next_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wp = W.partitionBy("prev_type")
    return tr.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n_trans"),
        # pure count ratio -> exact rational half-up (TIES.md B')
        F.expr(
            rat_round6_spark("n", "sum(n) over (partition by prev_type)")
        ).alias("p_trans"),
    ).orderBy("prev_type", "next_type")


ORACLE_MARKOV = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events),
tr AS (
  SELECT event_type AS prev_type, next_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n_trans,
       CAST(((n) * 2000000 + (SUM(n) OVER (PARTITION BY prev_type))) // (2 * (SUM(n) OVER (PARTITION BY prev_type))) AS DOUBLE) / 1000000.0
         AS p_trans
FROM tr
ORDER BY prev_type, next_type
"""


def window_median_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling MEDIAN of event value over the preceding hour per
    user — a holistic RANGE-frame aggregate Spark's window engine does not
    provide (``median``/``percentile`` are not window-frame functions),
    re-expressed as a range self-join + exact ``percentile`` groupBy:
    every event joins its own 1-hour frame, so frame semantics (all peers
    of a simultaneous timestamp included) match SQL RANGE exactly.

    Frame axis = epoch microseconds on both engines (the window_range_1h
    precedent: second-truncated axes round boundaries differently).
    Scale posture: the join key is user_id with a time-band predicate —
    fan-out is bounded by per-user event rate within the hour, not corpus
    size; AQE handles residual hot users. For fixed-rate telemetry this is
    events·rate rows, a constant factor, not O(n²)."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    um = F.expr("unix_micros(cast(ts as timestamp))")
    a = ev.select("event_id", "user_id", "ts", um.alias("um"))
    b = ev.select(
        F.col("user_id").alias("user_id_b"),
        um.alias("um_b"),
        F.col("value").alias("value_b"),
    )
    j = a.join(
        b,
        (F.col("user_id") == F.col("user_id_b"))
        & (F.col("um_b") >= F.col("um") - F.lit(3_600_000_000))
        & (F.col("um_b") <= F.col("um")),
    )
    return (
        j.groupBy("event_id", "user_id", "ts")
        .agg(
            F.count("*").cast("long").alias("n_1h"),
            F.round(F.expr("percentile(value_b, 0.5D)"), 6).alias("median_1h"),
        )
        .orderBy("event_id")
    )


ORACLE_MEDIAN_RANGE = """
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       ROUND(quantile_cont(value, 0.5) OVER w, 6) AS median_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def ev_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / cumulative-unique user counts — the growth
    curve every product dashboard opens with. Cumulative DISTINCT is the
    trap (naive: re-count distinct over an ever-growing prefix — O(days ×
    users)); the scalable identity is `cumulative uniques = running sum
    of first-seen counts`: one groupBy for each user's FIRST day, one
    day-keyed count, and a running sum over the CALENDAR-sized day spine
    (zero-filled so gap days carry the running total; the unpartitioned
    window is over days-of-history rows, never the fact stream). The day
    axis is tz-free epoch days."""
    ev = catalog.load(spark, sf_dir, "events")
    day = F.expr(
        "cast(floor(unix_micros(cast(ts as timestamp)) / 86400000000) as bigint)"
    )
    ud = ev.select(F.col("user_id"), day.alias("day")).distinct()
    active = ud.groupBy("day").agg(F.count("*").alias("n_active"))
    first = ud.groupBy("user_id").agg(F.min("day").alias("day"))
    new_per_day = first.groupBy("day").agg(F.count("*").alias("n_new"))
    rng = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        spine.join(active, "day", "left")
        .join(new_per_day, "day", "left")
        .select(
            "day",
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("long"))
        .orderBy("day")
    )


ORACLE_CUM_USERS = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events),
active AS (SELECT day, COUNT(*) AS n_active FROM ud GROUP BY day),
first AS (SELECT user_id, MIN(day) AS day FROM ud GROUP BY user_id),
new_per AS (SELECT day, COUNT(*) AS n_new FROM first GROUP BY day),
spine AS (
  SELECT unnest(generate_series((SELECT MIN(day) FROM ud),
                                (SELECT MAX(day) FROM ud))) AS day)
SELECT s.day,
       CAST(COALESCE(a.n_active, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(SUM(COALESCE(n.n_new, 0)) OVER
              (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS BIGINT) AS cum_users
FROM spine s LEFT JOIN active a USING (day) LEFT JOIN new_per n USING (day)
ORDER BY s.day
"""


BURST_FACTOR = 3.0  # 5-min rate > 3× the trailing-hour rate → burst


def ev_velocity_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-spike (velocity) alerting — for every event: the 5-minute
    and trailing-hour counts over RANGE frames on the same user
    partition, and a burst flag when the short-window rate exceeds
    {BURST_FACTOR}× the hourly baseline rate — the fraud / abuse /
    incident-detection primitive. ONE shuffle on user_id serves both
    frames (same window partition+ordering, two frame specs); the rate
    comparison cross-multiplies counts (n_5m · 3600 > F · n_1h · 300)
    so no per-row division is involved."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    base = W.partitionBy("user_id").orderBy(um)
    w5 = base.rangeBetween(-300_000_000, 0)
    w60 = base.rangeBetween(-3_600_000_000, 0)
    factor_num = int(BURST_FACTOR * 300)  # F · short-window seconds
    return (
        ev.withColumn("n_5m", F.count("*").over(w5))
        .withColumn("n_1h", F.count("*").over(w60))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("n_5m").cast("long").alias("n_5m"),
            F.col("n_1h").cast("long").alias("n_1h"),
            (F.col("n_5m") * 3600 > F.col("n_1h") * factor_num).alias(
                "burst"
            ),
        )
        .orderBy("event_id")
    )


ORACLE_VELOCITY = f"""
SELECT event_id, user_id, ts,
       CAST(COUNT(*) OVER w5 AS BIGINT) AS n_5m,
       CAST(COUNT(*) OVER w60 AS BIGINT) AS n_1h,
       COUNT(*) OVER w5 * 3600 > COUNT(*) OVER w60 * {int(BURST_FACTOR * 300)}
         AS burst
FROM events
WINDOW w5 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW),
       w60 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def seg_overlap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix — for every pair of event types, the exact
    intersection / union / Jaccard of their user sets (the
    segment-overlap report an ads/analytics platform computes before
    audience targeting). The user sets never materialize: one distinct
    on (user, type), a self-join keyed on user_id (fan-out bounded by
    types-per-user, ≤ |types|), a |types|²-row aggregate, margins
    broadcast back. Inclusion–exclusion gives the union without a second
    pass."""
    ev = catalog.load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    both = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    per = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    return (
        both.join(
            F.broadcast(per.select(F.col("event_type").alias("type_a"),
                                   F.col("n").alias("n_a"))), "type_a")
        .join(
            F.broadcast(per.select(F.col("event_type").alias("type_b"),
                                   F.col("n").alias("n_b"))), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            # pure count ratio -> exact rational half-up (TIES.md B')
            F.expr(
                rat_round6_spark("n_both", "n_a + n_b - n_both")
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_SEG_OVERLAP = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
both_c AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
per AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1)
SELECT c.type_a, c.type_b,
       CAST(pa.n AS BIGINT) AS n_a,
       CAST(pb.n AS BIGINT) AS n_b,
       CAST(c.n_both AS BIGINT) AS n_both,
       CAST(((c.n_both) * 2000000 + (pa.n + pb.n - c.n_both)) // (2 * (pa.n + pb.n - c.n_both)) AS DOUBLE) / 1000000.0 AS jaccard
FROM both_c c
JOIN per pa ON c.type_a = pa.event_type
JOIN per pb ON c.type_b = pb.event_type
ORDER BY c.type_a, c.type_b
"""


def ev_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in
    the same (user, hour) context — the association score behind
    behavioral embeddings and next-action features (PMI > 0: the pair
    co-occurs more than independence predicts). Contexts are tz-free
    epoch hours; the pair join is keyed on the context id with fan-out
    bounded by types-per-context (≤ |types|); everything after the two
    distinct aggregations is |types|²-sized."""
    ev = catalog.load(spark, sf_dir, "events")
    hr = F.expr(
        "cast(floor(unix_micros(cast(ts as timestamp)) / 3600000000) as bigint)"
    )
    ctx = ev.select(
        F.concat_ws(":", F.col("user_id"), hr).alias("ctx"), "event_type"
    ).distinct()
    n_ctx = ctx.select("ctx").distinct().count()
    a = ctx.select("ctx", F.col("event_type").alias("type_a"))
    b = ctx.select("ctx", F.col("event_type").alias("type_b"))
    pair = (
        a.join(b, "ctx")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    per = ctx.groupBy("event_type").agg(F.count("*").alias("n"))
    return (
        pair.join(
            F.broadcast(per.select(F.col("event_type").alias("type_a"),
                                   F.col("n").alias("n_a"))), "type_a")
        .join(
            F.broadcast(per.select(F.col("event_type").alias("type_b"),
                                   F.col("n").alias("n_b"))), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.lit(float(n_ctx)))
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                ),
                6,
            ).alias("pmi_nats"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_PMI = """
WITH ctx AS (
  SELECT DISTINCT
         CAST(user_id AS VARCHAR) || ':' ||
         CAST(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS VARCHAR)
           AS ctx,
         event_type
  FROM events),
nc AS (SELECT CAST(COUNT(DISTINCT ctx) AS DOUBLE) AS n_ctx FROM ctx),
pair AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
  FROM ctx a JOIN ctx b ON a.ctx = b.ctx AND a.event_type < b.event_type
  GROUP BY 1, 2),
per AS (SELECT event_type, COUNT(*) AS n FROM ctx GROUP BY 1)
SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(ln((p.n_ab * nc.n_ctx) / CAST(pa.n * pb.n AS DOUBLE)), 6)
         AS pmi_nats
FROM pair p
JOIN per pa ON p.type_a = pa.event_type
JOIN per pb ON p.type_b = pb.event_type
CROSS JOIN nc
ORDER BY p.type_a, p.type_b
"""


def ev_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest silent gap per user — the dead-sensor / dropped-pipeline
    screen (a heartbeat source whose max gap exceeds its SLA is down,
    even if totals look fine). LAG pairing on the tz-free microsecond
    axis, one user-keyed shuffle; the trailing gap to the corpus
    end-of-window is included so a source that died mid-range is caught
    (max-inter-event alone misses it)."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    end_row = ev.agg(F.max(um).alias("um_end"))
    w = W.partitionBy("user_id").orderBy("um", "event_id")
    gaps = (
        ev.select("user_id", "event_id", um.alias("um"))
        .withColumn("prev_um", F.lag("um").over(w))
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(F.col("um") - F.col("prev_um")).alias("max_gap_us"),
        F.max("um").alias("um_last"),
    )
    return (
        per_user.crossJoin(F.broadcast(end_row))
        .select(
            "user_id",
            "n_events",
            F.round(
                F.greatest(
                    F.coalesce("max_gap_us", F.lit(0)),
                    F.col("um_end") - F.col("um_last"),
                )
                / 1_000_000.0,
                6,
            ).alias("max_gap_s"),
            F.round((F.col("um_end") - F.col("um_last")) / 1_000_000.0, 6).alias(
                "tail_gap_s"
            ),
        )
        .orderBy("user_id")
    )


ORACLE_GAP = """
WITH g AS (
  SELECT user_id, event_id, epoch_us(ts) AS um,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_um
  FROM events),
pu AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(um - prev_um) AS max_gap_us, MAX(um) AS um_last
  FROM g GROUP BY user_id),
e AS (SELECT MAX(epoch_us(ts)) AS um_end FROM events)
SELECT user_id, n_events,
       ROUND(GREATEST(COALESCE(max_gap_us, 0), um_end - um_last)
             / 1000000.0, 6) AS max_gap_s,
       ROUND((um_end - um_last) / 1000000.0, 6) AS tail_gap_s
FROM pu CROSS JOIN e
ORDER BY user_id
"""


PAGE_SIZE = 50
CURSOR_DATE = "1997-06-15"
CURSOR_KEY = 12345


def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One page of orders AFTER a (date, key) cursor — keyset pagination,
    the scale-correct alternative to OFFSET (OFFSET N scans and discards
    N rows every page — O(page²) total; the keyset predicate pushes to
    the scan and each page is a top-{PAGE_SIZE} — TakeOrderedAndProject,
    per-partition heaps, no global sort). The row-value comparison
    (date, key) > (cursor) is expanded to the OR form Spark's pushdown
    understands; the (date, key) pair is a total order so pages never
    skip or repeat rows."""
    o = catalog.load(spark, sf_dir, "orders")
    cd = F.lit(CURSOR_DATE).cast("timestamp_ntz")
    after = (F.col("o_orderdate") > cd) | (
        (F.col("o_orderdate") == cd) & (F.col("o_orderkey") > CURSOR_KEY)
    )
    return (
        o.filter(after)
        .select("o_orderkey", "o_orderdate", "o_custkey", "o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(PAGE_SIZE)
    )


ORACLE_KEYSET = f"""
SELECT o_orderkey, o_orderdate, o_custkey, o_orderstatus
FROM orders
WHERE o_orderdate > TIMESTAMP '{CURSOR_DATE} 00:00:00'
   OR (o_orderdate = TIMESTAMP '{CURSOR_DATE} 00:00:00'
       AND o_orderkey > {CURSOR_KEY})
ORDER BY o_orderdate, o_orderkey
LIMIT {PAGE_SIZE}
"""


def stats_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear time trend of event values — OLS slope/intercept/R²
    via the built-in regression aggregates (regr_slope/regr_intercept/
    regr_r2 exist on BOTH engines as single-pass moment aggregates — the
    distributed closed form, no iteration). The x axis is hours since the
    epoch hour floor (tz-free), so the slope reads as value-units per
    hour. One groupBy shuffle; moments combine associatively map-side."""
    ev = catalog.load(spark, sf_dir, "events")
    x = F.expr(
        "unix_micros(cast(ts as timestamp)) / 3600000000.0"
    )
    g = ev.select("event_type", x.alias("x"), F.col("value").alias("y"))
    return (
        g.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.expr("regr_slope(y, x)"), 6).alias("slope_per_hour"),
            F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
            F.round(F.expr("regr_r2(y, x)"), 6).alias("r2"),
        )
        .orderBy("event_type")
    )


ORACLE_REGR = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(regr_slope(value, epoch_us(ts) / 3600000000.0), 6)
         AS slope_per_hour,
       ROUND(regr_intercept(value, epoch_us(ts) / 3600000000.0), 6)
         AS intercept,
       ROUND(regr_r2(value, epoch_us(ts) / 3600000000.0), 6) AS r2
FROM events GROUP BY event_type ORDER BY event_type
"""


WILSON_Z = 1.959964  # 95% two-sided
WILSON_THRESH = 50.0


def stats_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportion of high-value events per event type with a Wilson-score
    95% confidence interval — the interval a metrics platform shows next
    to every rate (Wilson, not normal-approx: it behaves at p̂ near 0/1
    and small n). Pure closed-form math over one groupBy: p̂, then
    (p̂ + z²/2n ∓ z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n). sqrt is
    IEEE-correctly-rounded on both engines, so the 6 dp rounding is
    stable."""
    ev = catalog.load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(
            F.when(F.col("value") > WILSON_THRESH, 1).otherwise(0)
        ).cast("double").alias("k"),
    )
    z2 = WILSON_Z * WILSON_Z
    p = F.col("k") / F.col("n")
    n = F.col("n")
    center = p + F.lit(z2) / (2 * n)
    half = F.lit(WILSON_Z) * F.sqrt(
        p * (1 - p) / n + F.lit(z2) / (4 * n * n)
    )
    denom = 1 + F.lit(z2) / n
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("k").cast("long").alias("n_high"),
        # pure count ratio -> exact rational half-up (TIES.md B');
        # the interval bounds carry a sqrt (non-terminating) -> plain
        # round of the identical double stays safe
        F.expr(
            rat_round6_spark("cast(k as bigint)", "cast(n as bigint)")
        ).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    ).orderBy("event_type")


ORACLE_WILSON = f"""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CASE WHEN value > {WILSON_THRESH} THEN 1 ELSE 0 END)
              AS DOUBLE) AS k
  FROM events GROUP BY event_type)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       CAST(k AS BIGINT) AS n_high,
       CAST(((CAST(k AS BIGINT)) * 2000000 + (CAST(n AS BIGINT))) // (2 * (CAST(n AS BIGINT))) AS DOUBLE) / 1000000.0 AS p_hat,
       ROUND(((k / n) + {WILSON_Z}*{WILSON_Z} / (2*n)
              - {WILSON_Z} * sqrt((k/n)*(1-k/n)/n
                                  + {WILSON_Z}*{WILSON_Z}/(4*n*n)))
             / (1 + {WILSON_Z}*{WILSON_Z} / n), 6) AS wilson_lo,
       ROUND(((k / n) + {WILSON_Z}*{WILSON_Z} / (2*n)
              + {WILSON_Z} * sqrt((k/n)*(1-k/n)/n
                                  + {WILSON_Z}*{WILSON_Z}/(4*n*n)))
             / (1 + {WILSON_Z}*{WILSON_Z} / n), 6) AS wilson_hi
FROM g ORDER BY event_type
"""


PSI_EPS = 1e-6
PSI_DECILES = [i / 10.0 for i in range(1, 10)]


def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution between
    the first and second half of the time range — the standard
    model-monitoring drift screen (PSI < 0.1 stable, > 0.25 investigate).
    Reference bins = exact deciles of period A (rounded to 6 dp on BOTH
    engines before bucketing so interpolation ulps can't flip a
    boundary); both periods bucket against those cuts in codegen
    (size(filter(cuts, c -> c < value)) over a 9-element literal); PSI
    contribution per bin with ε-smoothing for empty target bins.

    Scale: the period split and bucketing are map-side against a 1-row
    min/max broadcast and a 9-cut literal; the only shuffles are the
    percentile agg on period A and the final 10-row bin count."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    bounds = ev.agg(
        F.min(um).alias("lo"), F.max(um).alias("hi")
    )
    lab = ev.crossJoin(F.broadcast(bounds)).select(
        "value",
        F.when(
            F.col("lo")
            + F.floor((F.col("hi") - F.col("lo")) / F.lit(2)).cast("long")
            > um,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("per"),
    )
    pcts = ", ".join(f"{p}D" for p in PSI_DECILES)
    cut_row = (
        lab.filter(F.col("per") == "A")
        .agg(F.expr(f"percentile(value, array({pcts}))").alias("cuts"))
        .first()
    )
    cuts = [round(float(c), 6) for c in cut_row["cuts"]]
    cut_arr = F.array(*[F.lit(c) for c in cuts])
    bucketed = lab.select(
        "per",
        F.size(F.filter(cut_arr, lambda c: c < F.col("value"))).alias("bkt"),
    )
    counts = (
        bucketed.groupBy("bkt")
        .agg(
            F.sum(F.when(F.col("per") == "A", 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("per") == "B", 1).otherwise(0)).alias("n_b"),
        )
    )
    tot = counts.agg(
        F.sum("n_a").cast("double").alias("ta"),
        F.sum("n_b").cast("double").alias("tb"),
    )
    pa = F.col("n_a") / F.col("ta") + F.lit(PSI_EPS)
    pb = F.col("n_b") / F.col("tb") + F.lit(PSI_EPS)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("bkt").cast("int").alias("bkt"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_part"),
        )
        .orderBy("bkt")
    )


ORACLE_PSI = f"""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
lab AS (
  SELECT value,
         CASE WHEN epoch_us(ts) < lo + CAST(floor((hi - lo) / 2) AS BIGINT)
              THEN 'A' ELSE 'B' END AS per
  FROM events, bounds),
cuts AS (
  SELECT ROUND(unnest(quantile_cont(value,
           [{", ".join(str(p) for p in PSI_DECILES)}])), 6) AS c
  FROM lab WHERE per = 'A'),
bucketed AS (
  SELECT per,
         (SELECT COUNT(*) FROM cuts WHERE c < value) AS bkt
  FROM lab),
counts AS (
  SELECT bkt,
         SUM(CASE WHEN per = 'A' THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN per = 'B' THEN 1 ELSE 0 END) AS n_b
  FROM bucketed GROUP BY bkt),
tot AS (SELECT CAST(SUM(n_a) AS DOUBLE) AS ta,
               CAST(SUM(n_b) AS DOUBLE) AS tb FROM counts)
SELECT CAST(bkt AS INT) AS bkt,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       ROUND((n_b / tb + {PSI_EPS} - (n_a / ta + {PSI_EPS}))
             * ln((n_b / tb + {PSI_EPS}) / (n_a / ta + {PSI_EPS})), 6)
         AS psi_part
FROM counts CROSS JOIN tot
ORDER BY bkt
"""


AUTOCORR_MAX_LAG = 6


def ev_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1…{AUTOCORR_MAX_LAG} autocorrelation of the hourly event-count
    series — the seasonality/burstiness screen (a daily cycle shows as a
    lag-24 peak, bursts as high lag-1). The series is ZERO-FILLED over
    the full hour spine (a gappy series correlates gaps away and biases
    the estimate); the hour axis is tz-free epoch-hours.

    Plan: one fact shuffle to hourly counts, a driver-free spine from a
    1-row min/max agg exploded via sequence, then the lagged pairing is
    a broadcast of the {AUTOCORR_MAX_LAG}-row lag table against the
    BOUNDED series (rows = hours of history, not events) self-joined on
    shifted hour — every post-fact stage is calendar-sized. corr() is
    the numerically-stable distributed Pearson on both engines."""
    ev = catalog.load(spark, sf_dir, "events")
    hr = F.expr(
        "cast(floor(unix_micros(cast(ts as timestamp)) / 3600000000) as bigint)"
    )
    b = ev.select(hr.alias("hr")).groupBy("hr").agg(F.count("*").alias("n"))
    rng = b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    f = spine.join(b, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).cast("double").alias("n")
    )
    lags = spark.range(1, AUTOCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = f.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.col("n").alias("x"),
        (F.col("hr") - F.col("lag")).alias("hr_y"),
    )
    pairs = a.join(
        f.select(F.col("hr").alias("hr_y"), F.col("n").alias("y")), "hr_y"
    )
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.corr("x", "y"), 6).alias("autocorr"),
        )
        .orderBy("lag")
    )


ORACLE_AUTOCORR = f"""
WITH b AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
         COUNT(*) AS n
  FROM events GROUP BY 1),
spine AS (
  SELECT unnest(generate_series((SELECT MIN(hr) FROM b),
                                (SELECT MAX(hr) FROM b))) AS hr),
f AS (
  SELECT s.hr, CAST(COALESCE(b.n, 0) AS DOUBLE) AS n
  FROM spine s LEFT JOIN b USING (hr)),
lags AS (SELECT unnest(generate_series(1, {AUTOCORR_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag, a.n AS x, c.n AS y
  FROM lags l
  JOIN f a ON true
  JOIN f c ON c.hr = a.hr - l.lag)
SELECT CAST(lag AS INT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(corr(x, y), 6) AS autocorr
FROM pairs GROUP BY lag ORDER BY lag
"""


# --------------------------------------------------------------------------
# Interval concurrency (boundary-event rewrite)
# --------------------------------------------------------------------------

def orders_open_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily count of concurrently OPEN orders — an order is open from its
    order date until its last line ships. The capacity-planning question
    ("how many in-flight orders at once, and when was the peak?") every
    fulfilment DBA asks of an interval table.

    Scale: the naive day×interval join materializes O(orders × span_days)
    rows. The boundary-event rewrite emits exactly TWO ±1 rows per order
    (+1 at open, −1 the day after close), aggregates them per day — the
    result is CALENDAR-bounded, not corpus-bounded — and reconstructs the
    step function with one running-sum window. Shuffle volume is 2 rows
    per order; the single-partition window orders at most a few thousand
    day rows regardless of fact volume."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(F.col("l_shipdate").cast("timestamp_ntz").cast("date")).alias(
            "ship_day"
        )
    )
    spans = (
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_orderdate").cast("timestamp_ntz").cast("date").alias(
                "open_day"
            ),
        )
        .join(close, "l_orderkey")
        .select(
            "open_day", F.greatest("ship_day", "open_day").alias("close_day")
        )
    )
    bounds = spans.select(
        F.col("open_day").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("close_day", 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    daily = bounds.groupBy("day").agg(
        F.sum("delta").cast("long").alias("delta_open")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        daily.withColumn(
            "n_open", F.sum("delta_open").over(w).cast("long")
        ).orderBy("day")
    )


ORACLE_OPEN_CONCURRENCY = """
WITH close AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS ship_day
  FROM lineitem GROUP BY 1),
spans AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_day,
         GREATEST(c.ship_day, CAST(o.o_orderdate AS DATE)) AS close_day
  FROM orders o JOIN close c ON c.l_orderkey = o.o_orderkey),
b AS (
  SELECT open_day AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT close_day + 1 AS day, -1 AS delta FROM spans),
d AS (SELECT day, CAST(SUM(delta) AS BIGINT) AS delta_open FROM b GROUP BY 1)
SELECT day, delta_open,
       CAST(SUM(delta_open) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_open
FROM d ORDER BY day
"""


def _collapse_observations(ev: DataFrame) -> DataFrame:
    """One observation per (user, microsecond): exact-decimal mean of
    same-instant values, so both engines resample/weight from identical
    anchors (shared by ``ts_interpolate_linear`` and ``ev_twap``; the
    oracle-side twin is the ``obs`` CTE both oracles open with)."""
    um = F.expr("unix_micros(cast(ts as timestamp))")
    return (
        ev.select("user_id", um.alias("um"), "value")
        .groupBy("user_id", "um")
        .agg(
            (F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
             / F.count("*")).alias("v")
        )
    )


# --------------------------------------------------------------------------
# Linear interpolation resample (the LOCF alternative)
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000
INTERP_MAX_GAP_US = 48 * _HOUR_US  # never bridge a gap wider than 48 h


def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each user's value series by LINEAR interpolation
    between bracketing observations (``ev_resample_locf``'s
    step-function sibling — the right choice for continuously varying
    measurements). Grid points land on exact hour boundaries; gaps wider
    than 48 h are left unfilled rather than bridged with a meaningless
    straight line (the cap also bounds the per-pair fan-out).

    Scale: one user-keyed shuffle for the LEAD pairing; each consecutive
    observation pair then generates its own hour grid with ``sequence``
    + explode — fan-out bounded by the gap cap (≤48 rows/pair), no spine
    join, no driver participation. Multiple observations at the same
    microsecond collapse first via an exact-decimal mean so both engines
    interpolate from identical anchors; the interpolation itself is
    IEEE-double with an explicitly parenthesized evaluation order so
    Spark and DuckDB round identically."""
    obs = _collapse_observations(catalog.load(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("um")
    pairs = (
        obs.withColumn("um1", F.lead("um").over(w))
        .withColumn("v1", F.lead("v").over(w))
        .filter(
            F.col("um1").isNotNull()
            & (F.col("um1") - F.col("um") <= INTERP_MAX_GAP_US)
        )
        .withColumn(
            "h0",
            F.expr(
                f"((um + {_HOUR_US - 1}) div {_HOUR_US}) * {_HOUR_US}"
            ),
        )
        .filter(F.col("h0") < F.col("um1"))
    )
    grid = pairs.select(
        "user_id", "um", "v", "um1", "v1",
        F.explode(
            F.sequence(F.col("h0"), F.col("um1") - 1, F.lit(_HOUR_US))
        ).alias("h_us"),
    )
    frac = (F.col("h_us") - F.col("um")).cast("double") / (
        F.col("um1") - F.col("um")
    ).cast("double")
    return grid.select(
        "user_id",
        F.expr("cast(timestamp_micros(h_us) as timestamp_ntz)").alias(
            "hour_ts"
        ),
        F.round(F.col("v") + ((F.col("v1") - F.col("v")) * frac), 6).alias(
            "v_interp"
        ),
    ).orderBy("user_id", "hour_ts")


ORACLE_INTERP = f"""
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS um,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS v
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT user_id, um, v,
         LEAD(um) OVER w AS um1, LEAD(v) OVER w AS v1
  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY um)),
valid AS (
  SELECT *, ((um + {_HOUR_US - 1}) // {_HOUR_US}) * {_HOUR_US} AS h0
  FROM pairs
  WHERE um1 IS NOT NULL AND um1 - um <= {INTERP_MAX_GAP_US}),
grid AS (
  SELECT user_id, um, v, um1, v1,
         UNNEST(range(h0, um1, {_HOUR_US})) AS h_us
  FROM valid WHERE h0 < um1)
SELECT user_id,
       make_timestamp(h_us) AS hour_ts,
       ROUND(v + ((v1 - v) * (CAST(h_us - um AS DOUBLE)
                              / CAST(um1 - um AS DOUBLE))), 6) AS v_interp
FROM grid ORDER BY user_id, hour_ts
"""


# --------------------------------------------------------------------------
# Time-weighted average (LOCF-weighted TWAP)
# --------------------------------------------------------------------------

def ev_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-weighted average of ``value`` over the user's own
    observation span — each observation holds (LOCF) until the next one,
    so its weight is the duration it was current. The arithmetic-mean
    trap this fixes: a sensor that reports 100× more often while idle
    drags a plain AVG toward idle; TWAP is sampling-rate invariant.

    Scale: one user-keyed shuffle for the LEAD pairing, then ONE keyed
    aggregate. Per-row contributions (value × held-seconds) are computed
    in IEEE double (bit-deterministic) and summed in exact decimal so
    partial-aggregation order cannot move the total; the denominator is
    the exact integer span. Same-microsecond duplicates collapse first
    via an exact-decimal mean (identical anchors on both engines)."""
    obs = _collapse_observations(catalog.load(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("um")
    pairs = obs.withColumn("um1", F.lead("um").over(w))
    contrib = F.col("v") * (
        (F.col("um1") - F.col("um")).cast("double") / F.lit(1000000.0)
    )
    per_user = pairs.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(contrib.cast("decimal(25,6)")).cast("double").alias("num"),
        F.min("um").alias("um0"),
        F.max("um").alias("umN"),
    )
    span_s = (F.col("umN") - F.col("um0")).cast("double") / F.lit(1000000.0)
    return (
        per_user.filter(F.col("umN") > F.col("um0"))
        .select(
            "user_id",
            "n_obs",
            F.round(span_s, 6).alias("span_s"),
            F.round(F.col("num") / span_s, 6).alias("twap"),
        )
        .orderBy("user_id")
    )


ORACLE_TWAP = """
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS um,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS v
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT user_id, um, v, LEAD(um) OVER w AS um1
  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY um)),
pu AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(CAST(v * (CAST(um1 - um AS DOUBLE) / 1000000.0)
                       AS DECIMAL(25,6))) AS DOUBLE) AS num,
         MIN(um) AS um0, MAX(um) AS umN
  FROM pairs GROUP BY 1)
SELECT user_id, n_obs,
       ROUND(CAST(umN - um0 AS DOUBLE) / 1000000.0, 6) AS span_s,
       ROUND(num / (CAST(umN - um0 AS DOUBLE) / 1000000.0), 6) AS twap
FROM pu WHERE umN > um0 ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Seasonal (hour-of-week) anomaly screen
# --------------------------------------------------------------------------

SEASONAL_Z_NUM = 3  # threshold = Z_NUM / Z_DEN sigmas (rational → exact)
SEASONAL_Z_DEN = 2


def ev_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event count deviates >1.5σ from the hour-of-week
    baseline — the monitoring screen that knows Monday 09:00 and Sunday
    03:00 have different normals (a plain global threshold fires every
    rush hour and sleeps through a dead Sunday). The hourly series is
    ZERO-FILLED from a driver-free spine so silent hours are visible to
    both the baseline and the flag. (Threshold 3/2: the fixture's hourly
    counts are near-uniform — max |z| ≈ 1.75 — so a classic 3σ gate
    would make the output vacuously empty; the cut is a ``Z_NUM/Z_DEN``
    rational so any threshold stays exact.)

    Exactness: counts are integers, so the kσ predicate is evaluated in
    INTEGER arithmetic via cross-multiplication —
    ``(m·n − S1)²·(m−1)·Z_DEN² > Z_NUM²·m·(m·S2 − S1²)`` — no engine can
    disagree on a boundary ulp; the reported mean/std/z are display-only
    doubles. Operating envelope: the left side is quartic in the hourly
    count, so BIGINT holds up to roughly n ≈ 3·10⁶ events/hour for a
    single series at one year of history (beyond that Spark's ANSI mode
    would raise ARITHMETIC_OVERFLOW rather than corrupt) — at corpus
    scale this screen runs per (service, series) key, which keeps
    per-series counts inside the envelope; a beyond-envelope variant
    would pre-scale counts to per-minute rates or move the predicate to
    DECIMAL(38). Scale: one fact shuffle to hourly counts; everything
    after is calendar-bounded (the baseline table is exactly 168 rows,
    broadcast back onto the bounded hourly series)."""
    ev = catalog.load(spark, sf_dir, "events")
    hr = F.expr(
        "cast(floor(unix_micros(cast(ts as timestamp)) / 3600000000) as bigint)"
    )
    b = ev.select(hr.alias("hr")).groupBy("hr").agg(
        F.count("*").alias("n")
    )
    rng = b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    f = spine.join(b, "hr", "left").select(
        "hr",
        (F.col("hr") % 168).alias("how"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n"),
    )
    g = f.groupBy("how").agg(
        F.count("*").alias("m"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    j = f.join(F.broadcast(g), "how")
    dev = F.col("m") * F.col("n") - F.col("s1")
    varnum = F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")
    # kσ with k = Z_NUM/Z_DEN, exact: dev²·(m−1)·Z_DEN² > Z_NUM²·m·varnum
    flagged = j.filter(
        (F.col("m") >= 2)
        & (
            dev * dev * (F.col("m") - 1) * (SEASONAL_Z_DEN * SEASONAL_Z_DEN)
            > F.lit(SEASONAL_Z_NUM * SEASONAL_Z_NUM) * F.col("m") * varnum
        )
    )
    mean = F.col("s1").cast("double") / F.col("m").cast("double")
    std = F.sqrt(
        varnum.cast("double")
        / (F.col("m") * (F.col("m") - 1)).cast("double")
    )
    return flagged.select(
        F.expr(
            "cast(timestamp_micros(hr * 3600000000) as timestamp_ntz)"
        ).alias("hour_ts"),
        F.col("how").cast("int").alias("how"),
        "n",
        # exact rational half-up: a float round of the integer ratio
        # s1/m can split the engines on a decimal tie (TIES.md B')
        F.expr(rat_round6_spark("s1", "m")).alias("baseline_mean"),
        F.round(std, 6).alias("baseline_std"),
        F.when(
            varnum > 0,
            F.round((F.col("n").cast("double") - mean) / std, 6),
        ).alias("z"),
    ).orderBy("hour_ts")


ORACLE_SEASONAL = f"""
WITH b AS (
  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
         COUNT(*) AS n
  FROM events GROUP BY 1),
spine AS (
  SELECT unnest(generate_series((SELECT MIN(hr) FROM b),
                                (SELECT MAX(hr) FROM b))) AS hr),
f AS (
  SELECT s.hr, s.hr % 168 AS how,
         CAST(COALESCE(b.n, 0) AS BIGINT) AS n
  FROM spine s LEFT JOIN b USING (hr)),
g AS (
  SELECT how, COUNT(*) AS m, SUM(n) AS s1, SUM(n * n) AS s2
  FROM f GROUP BY 1)
SELECT make_timestamp(f.hr * 3600000000) AS hour_ts,
       CAST(f.how AS INT) AS how,
       f.n,
       CAST(((g.s1) * 2000000 + (g.m)) // (2 * (g.m)) AS DOUBLE) / 1000000.0
         AS baseline_mean,
       ROUND(sqrt(CAST(g.m * g.s2 - g.s1 * g.s1 AS DOUBLE)
                  / CAST(g.m * (g.m - 1) AS DOUBLE)), 6) AS baseline_std,
       CASE WHEN g.m * g.s2 - g.s1 * g.s1 > 0 THEN
         ROUND((CAST(f.n AS DOUBLE)
                - CAST(g.s1 AS DOUBLE) / CAST(g.m AS DOUBLE))
               / sqrt(CAST(g.m * g.s2 - g.s1 * g.s1 AS DOUBLE)
                      / CAST(g.m * (g.m - 1) AS DOUBLE)), 6)
       END AS z
FROM f JOIN g USING (how)
WHERE g.m >= 2
  AND (g.m * f.n - g.s1) * (g.m * f.n - g.s1) * (g.m - 1)
      * {SEASONAL_Z_DEN * SEASONAL_Z_DEN}
      > {SEASONAL_Z_NUM * SEASONAL_Z_NUM} * g.m
        * (g.m * g.s2 - g.s1 * g.s1)
ORDER BY hour_ts
"""


# --------------------------------------------------------------------------
# Top onboarding paths (first-K event-type journeys)
# --------------------------------------------------------------------------

def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 most common FIRST-THREE-EVENT journeys — the product
    question "what do new users actually do first?". Each user's opening
    triple is assembled with two LEADs inside the same user-keyed window
    (no collect_list materialization of whole histories), the first row
    per user is kept by row_number, and the tiny path-count table feeds a
    TakeOrderedAndProject top-10 under a total (count DESC, path ASC)
    order so the cut is deterministic on both engines.

    Scale: ONE user-keyed shuffle; everything after is
    |distinct paths| ≤ |event types|³ rows. Users with fewer than three
    events are excluded (their journey has no third step)."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    w = W.partitionBy("user_id").orderBy("um", "event_id")
    r = (
        ev.select("user_id", um.alias("um"), "event_id", "event_type")
        .withColumn("t1", F.lead("event_type", 1).over(w))
        .withColumn("t2", F.lead("event_type", 2).over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1)
            & F.col("t1").isNotNull()
            & F.col("t2").isNotNull()
        )
    )
    return (
        r.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(10)
    )


ORACLE_TOP_PATHS = """
WITH r AS (
  SELECT user_id, event_type,
         LEAD(event_type, 1) OVER w AS t1,
         LEAD(event_type, 2) OVER w AS t2,
         ROW_NUMBER() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
p AS (
  SELECT event_type || '>' || t1 || '>' || t2 AS path
  FROM r WHERE rn = 1 AND t1 IS NOT NULL AND t2 IS NOT NULL)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY 1
ORDER BY n_users DESC, path ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Per-user ML feature snapshot
# --------------------------------------------------------------------------

def ev_user_feature_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One feature vector per user — the churn-/propensity-model input
    table: activity volume, breadth (distinct active days and types),
    recency against the corpus end, span, mean value, and the Shannon
    entropy of the user's event-type mix (1-type bots score 0; diverse
    organic users score high).

    Scale: two user-keyed aggregates (raw stream + per-(user,type)
    counts) joined on the same key, plus a 1-row corpus-end broadcast —
    no windows, no fact self-joins. Exactness: entropy contributions
    ``n·ln n`` are IEEE doubles ROUNDED TO 9dp before the exact-decimal
    sum (the A-ES precedent: a last-ulp libm difference between engines
    cannot survive the rounding), mean value is a decimal-sum average,
    and every other feature is integer-exact micros arithmetic."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    e = ev.select("user_id", um.alias("um"), "value", "event_type")
    base = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct(
            F.expr("cast(floor(um / 86400000000) as bigint)")
        ).cast("long").alias("n_active_days"),
        F.min("um").alias("um0"),
        F.max("um").alias("umN"),
        davg("value", "mean_value"),
    )
    per_t = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    ent = per_t.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum(
            F.round(F.col("n") * F.log(F.col("n")), 9).cast("decimal(25,9)")
        ).alias("s"),
        F.sum("n").alias("n_tot"),
    )
    end_row = e.agg(F.max("um").alias("um_end"))
    return (
        base.join(ent, "user_id")
        .crossJoin(F.broadcast(end_row))
        .select(
            "user_id",
            "n_events",
            "n_active_days",
            "n_types",
            F.round(
                (F.col("um_end") - F.col("umN")).cast("double")
                / F.lit(3600000000.0),
                6,
            ).alias("recency_h"),
            F.round(
                (F.col("umN") - F.col("um0")).cast("double")
                / F.lit(86400000000.0),
                6,
            ).alias("span_days"),
            F.round("mean_value", 6).alias("mean_value"),
            F.round(
                F.round(F.log(F.col("n_tot")), 9)
                - F.col("s").cast("double") / F.col("n_tot"),
                6,
            ).alias("type_entropy"),
        )
        .orderBy("user_id")
    )


ORACLE_FEATURE_SNAPSHOT = """
WITH per_t AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
ent AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_types,
         SUM(CAST(ROUND(n * ln(n), 9) AS DECIMAL(25,9))) AS s,
         SUM(n) AS n_tot
  FROM per_t GROUP BY 1),
base AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT CAST(floor(epoch_us(ts) / 86400000000)
                                  AS BIGINT)) AS BIGINT) AS n_active_days,
         MIN(epoch_us(ts)) AS um0, MAX(epoch_us(ts)) AS umN,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value)
           AS mean_value
  FROM events GROUP BY 1),
e2 AS (SELECT MAX(epoch_us(ts)) AS um_end FROM events)
SELECT b.user_id, b.n_events, b.n_active_days, t.n_types,
       ROUND(CAST(e.um_end - b.umN AS DOUBLE) / 3600000000.0, 6)
         AS recency_h,
       ROUND(CAST(b.umN - b.um0 AS DOUBLE) / 86400000000.0, 6)
         AS span_days,
       ROUND(b.mean_value, 6) AS mean_value,
       ROUND(ROUND(ln(t.n_tot), 9) - CAST(t.s AS DOUBLE) / t.n_tot, 6)
         AS type_entropy
FROM base b JOIN ent t USING (user_id) CROSS JOIN e2 e
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Cohort LTV triangle
# --------------------------------------------------------------------------

def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-cohort lifetime-value triangle: customers grouped by their
    FIRST order month, revenue tracked by months-since-first — the
    finance view of ``ev_retention_cohorts`` (does a newer cohort spend
    faster than an older one at the same age?). Cumulative revenue per
    cohort uses a window over the TRIANGLE (cohorts × ages — calendar²,
    corpus-independent).

    Exactness: ages are integer month arithmetic (y·12+m), revenue is
    exact decimal end-to-end; the per-customer first-month lookup is a
    customer-keyed aggregate joined back co-partitioned on the same
    key."""
    orders = _load_orders_months(spark, sf_dir)
    first = orders.groupBy("o_custkey").agg(
        F.min("ym").alias("cohort_ym")
    )
    facts = (
        orders.join(first, "o_custkey")
        .groupBy("cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias(
            "age_months"
        ))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias(
                "rev_dec"
            ),
            F.countDistinct("o_custkey").cast("long").alias(
                "n_active_customers"
            ),
        )
    )
    wcum = (
        W.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        facts.withColumn(
            "cum_rev", F.sum("rev_dec").over(wcum).cast("double")
        )
        .select(
            F.make_date(
                F.expr("cohort_ym div 12").cast("int"),
                (F.col("cohort_ym") % 12) + 1,
                F.lit(1),
            ).alias("cohort_month"),
            F.col("age_months").cast("int").alias("age_months"),
            "n_active_customers",
            F.col("rev_dec").cast("double").alias("revenue"),
            "cum_rev",
        )
        .orderBy("cohort_month", "age_months")
    )


def _load_orders_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = catalog.load(spark, sf_dir, "orders")
    od = F.expr("cast(o_orderdate as timestamp_ntz)")
    return orders.select(
        "o_custkey",
        "o_totalprice",
        (F.year(od) * 12 + (F.month(od) - 1)).alias("ym"),
    )


ORACLE_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey, o_totalprice,
         year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS ym
  FROM orders),
first_m AS (
  SELECT o_custkey, MIN(ym) AS cohort_ym FROM o GROUP BY 1),
facts AS (
  SELECT f.cohort_ym, o.ym - f.cohort_ym AS age_months,
         SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS rev_dec,
         CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
           AS n_active_customers
  FROM o JOIN first_m f USING (o_custkey)
  GROUP BY 1, 2)
SELECT make_date(CAST(cohort_ym // 12 AS INT),
                 CAST(cohort_ym % 12 AS INT) + 1, 1) AS cohort_month,
       CAST(age_months AS INT) AS age_months,
       n_active_customers,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(SUM(rev_dec) OVER (PARTITION BY cohort_ym ORDER BY age_months
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_rev
FROM facts
ORDER BY cohort_month, age_months
"""


# --------------------------------------------------------------------------
# Truncated EWMA smoother (16-tap FIR form)
# --------------------------------------------------------------------------

EWMA_ALPHA = 0.25
EWMA_TAPS = 16
# Weight ladder α(1−α)^k and its cumulative sums, computed ONCE in Python
# and embedded as literals in BOTH engines — repr() round-trips doubles
# exactly, so Spark and DuckDB parse bit-identical weights. The tail mass
# beyond 16 taps is (1−α)^16 ≈ 1%, absorbed by per-row renormalization.
_EWMA_W = [EWMA_ALPHA * (1 - EWMA_ALPHA) ** k for k in range(EWMA_TAPS)]
_EWMA_CUMW = []
_acc = 0.0
for _w in _EWMA_W:
    _acc += _w
    _EWMA_CUMW.append(_acc)


def ev_ewma_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's value series
    — the standard smoother behind trend lines and anomaly baselines —
    in its TRUNCATED (16-tap FIR) form: the recursive EWMA fold is
    non-associative, but cutting the kernel at 16 taps (tail mass ~1%,
    renormalized per row) turns it into a fixed linear filter that runs
    as ONE window pass of 16 LAGs — whole-stage-codegen'd, no Python,
    no recursion, and the early rows renormalize over the taps that
    exist. This is the deliberate scale trade: the exact fold needs the
    stateful applyInPandas surface (``inv_running_balance_capped``);
    the 16-tap form keeps EWMA inside Tungsten.

    Exactness: each tap contribution TRUNCATES to the 10⁻¹² grid
    (floor of the identical IEEE product — no round-half hazard at a
    grid only ~70 ulp wide) before an exact integer sum (term order
    irrelevant), the weight and cumulative-weight ladders are
    Python-computed literals embedded identically in both engines, the
    normalizer is a literal-array lookup by min(row_number, 16), and
    the readout truncates to 6dp (TIES.md Class B′)."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    w = W.partitionBy("user_id").orderBy("um", "event_id")
    base = ev.select(
        "user_id", "event_id", "ts", "value", um.alias("um")
    ).withColumn("rn", F.row_number().over(w))
    # Per-tap TRUNCATION to the 10⁻¹² grid (floor of the identical
    # double product in both engines — no shortest-repr tie, unlike
    # ROUND at a grid only ~70 ulp wide at |p|~100), summed as exact
    # BIGINT twelfths: Σ|terms| ≤ 16·10¹⁴, inside both int64 and the
    # float64 exact range for the final readout division.
    term_sum = None
    for k, wk in enumerate(_EWMA_W):
        term = F.coalesce(
            F.floor(
                (F.lit(wk) * F.lag("value", k).over(w))
                * F.lit(1000000000000.0)
            ),
            F.lit(0).cast("long"),
        )
        term_sum = term if term_sum is None else term_sum + term
    norm = F.element_at(
        F.array(*[F.lit(c) for c in _EWMA_CUMW]),
        F.least(F.col("rn"), F.lit(EWMA_TAPS)),
    )
    # Truncation quantization, not round: the s/norm quotient can be a
    # decimal that terminates exactly at the 7th digit with a 5, where
    # Spark's shortest-repr round and DuckDB's multiply-round split one
    # micro-unit apart (observed at sf0.1). floor(q·10⁶)/10⁶ is the
    # same two float ops on the same double in both engines — no tie
    # exists (TIES.md Class B′).
    q = (F.col("s").cast("double") / F.lit(1000000000000.0)) / norm
    return (
        base.withColumn("s", term_sum)
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            (
                F.floor(q * F.lit(1000000.0)).cast("double")
                / F.lit(1000000.0)
            ).alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"COALESCE(CAST(FLOOR(({wk!r} * LAG(value, {k}) OVER w)"
        f" * 1000000000000.0) AS BIGINT), 0)"
        for k, wk in enumerate(_EWMA_W)
    )
    cumw = ", ".join(repr(c) for c in _EWMA_CUMW)
    return f"""
WITH b AS (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER w AS rn,
         {terms} AS s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
SELECT user_id, event_id, ts, value,
       FLOOR(CAST(s AS DOUBLE) / 1000000000000.0
             / ([{cumw}])[LEAST(rn, {EWMA_TAPS})] * 1000000.0)
         / 1000000.0 AS ewma
FROM b ORDER BY user_id, event_id
"""


ORACLE_EWMA = _ewma_oracle()


# --------------------------------------------------------------------------
# Rolling 30-day distinct users (coverage-interval rewrite)
# --------------------------------------------------------------------------

ROLLING_WINDOW_DAYS = 30


def ev_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day distinct active users per day — THE sliding-window
    distinct-count trap: no window frame supports COUNT(DISTINCT), and
    the naive day×window join recounts every user-day up to 30×. The
    exact rewrite: a user's activity days induce DISJOINT coverage
    intervals — after being active on day d they count as "active in the
    trailing window" on days [d, min(d+29, next_activity−1)] — so each
    user-day contributes ±1 boundary events and the per-day rolling
    distinct count is ONE running sum over the zero-filled calendar
    spine. Shuffle volume: 2 rows per user-day; window: calendar-sized.

    The oracle is the BRUTE-FORCE formulation (spine × user-days range
    join, COUNT(DISTINCT)) — a genuinely different algorithm that must
    agree exactly, the same differential posture as the clamp/reflection
    pair."""
    ev = catalog.load(spark, sf_dir, "events")
    day = F.expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000"
    )
    ud = ev.select("user_id", day.alias("day")).distinct()
    return (
        _coverage_rolling_counts(ud, ROLLING_WINDOW_DAYS)
        .select(
            F.expr(
                "cast(timestamp_micros(day * 86400000000) as timestamp_ntz)"
            ).cast("date").alias("day"),
            F.col("n_covered").alias("active_users_30d"),
        )
        .orderBy("day")
    )


def _coverage_rolling_counts(ud: DataFrame, window_days: int) -> DataFrame:
    """Core of the coverage-interval rewrite over a distinct
    (user_id, day) frame: per calendar day (zero-filled spine), the
    number of users whose latest activity lies within the trailing
    ``window_days`` — exactly COUNT(DISTINCT) over the sliding window,
    in 2 boundary rows per user-day + one calendar running sum. Shared
    by ``ev_rolling_distinct_users`` and ``ev_stickiness_dau_mau``;
    identity property-tested against brute force in
    tests/test_stats.py."""
    wnext = W.partitionBy("user_id").orderBy("day")
    iv = ud.withColumn("next_day", F.lead("day").over(wnext)).select(
        F.col("day").alias("start"),
        F.least(
            F.col("day") + window_days - 1,
            F.coalesce(
                F.col("next_day") - 1,
                F.col("day") + window_days - 1,
            ),
        ).alias("end"),
    ).filter(F.col("end") >= F.col("start"))
    bounds = iv.select(
        F.col("start").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select((F.col("end") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    deltas = bounds.groupBy("day").agg(F.sum("delta").alias("delta"))
    rng = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    filled = spine.join(deltas, "day", "left").select(
        "day", F.coalesce("delta", F.lit(0)).alias("delta")
    )
    wcum = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return filled.withColumn(
        "n_covered", F.sum("delta").over(wcum).cast("long")
    ).select("day", "n_covered")


def ev_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement ratio product teams
    watch (1.0 = every monthly user shows up daily). DAU is the exact
    per-day distinct; MAU is the exact trailing-30-day distinct from the
    SAME coverage-interval core as ``ev_rolling_distinct_users`` (one
    user-day dedup feeds both, calendar-sized everything after); the
    ratio is a single per-row division."""
    ev = catalog.load(spark, sf_dir, "events")
    day = F.expr(
        "unix_micros(cast(ts as timestamp)) div 86400000000"
    )
    ud = ev.select("user_id", day.alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    mau = _coverage_rolling_counts(ud, ROLLING_WINDOW_DAYS)
    return (
        mau.join(dau, "day", "left")
        .select(
            F.expr(
                "cast(timestamp_micros(day * 86400000000) as timestamp_ntz)"
            ).cast("date").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.col("n_covered").alias("mau"),
            F.when(
                F.col("n_covered") > 0,
                # pure count ratio -> exact rational half-up (B')
                F.expr(
                    rat_round6_spark("coalesce(dau, 0)", "n_covered")
                ),
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


ORACLE_STICKINESS = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events),
rng AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
spine AS (
  SELECT unnest(generate_series((SELECT lo FROM rng),
                                (SELECT hi FROM rng))) AS day),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
mau AS (
  SELECT s.day,
         CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM spine s
  LEFT JOIN ud u
    ON u.day BETWEEN s.day - {ROLLING_WINDOW_DAYS - 1} AND s.day
  GROUP BY s.day)
SELECT CAST(make_timestamp(m.day * 86400000000) AS DATE) AS day,
       CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau,
       m.mau,
       CASE WHEN m.mau > 0 THEN
         CAST(((COALESCE(d.dau, 0)) * 2000000 + (m.mau)) // (2 * (m.mau)) AS DOUBLE) / 1000000.0
       END AS stickiness
FROM mau m LEFT JOIN dau d ON d.day = m.day
ORDER BY day
"""


ORACLE_ROLLING_DISTINCT = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events),
rng AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ud),
spine AS (
  SELECT unnest(generate_series((SELECT lo FROM rng),
                                (SELECT hi FROM rng))) AS day)
SELECT CAST(make_timestamp(s.day * 86400000000) AS DATE) AS day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_users_30d
FROM spine s
LEFT JOIN ud u
  ON u.day BETWEEN s.day - {ROLLING_WINDOW_DAYS - 1} AND s.day
GROUP BY s.day
ORDER BY day
"""


# --------------------------------------------------------------------------
# Transition-policy entropy per state
# --------------------------------------------------------------------------

def ev_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: the Shannon entropy of its NEXT-event distribution
    plus the most likely successor — the predictability diagnostic over
    ``ev_markov_transitions``'s matrix (a state with near-zero entropy
    is a deterministic funnel step; high entropy marks a branching
    point). One user-keyed LEAD pairing, one (from,to)-keyed aggregate,
    then a states-squared-sized rollup. Entropy contributions use the
    9dp-rounded ``n·ln n`` decimal-sum pattern; the top successor is
    MAX over the (count, successor) struct so count ties break to the
    lexically greatest successor identically on both engines."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    w = W.partitionBy("user_id").orderBy("um", "event_id")
    pairs = (
        ev.select("user_id", um.alias("um"), "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    cnt = pairs.groupBy("event_type", "next_type").agg(
        F.count("*").alias("n")
    )
    out = cnt.groupBy("event_type").agg(
        F.sum("n").alias("n_total"),
        F.count("*").cast("long").alias("n_successors"),
        F.sum(
            F.round(F.col("n") * F.log("n"), 9).cast("decimal(25,9)")
        ).alias("s"),
        F.max(F.struct(F.col("n"), F.col("next_type"))).alias("top"),
    )
    return out.select(
        "event_type",
        F.col("n_total").cast("long").alias("n_transitions"),
        "n_successors",
        F.round(
            F.round(F.log("n_total"), 9)
            - F.col("s").cast("double") / F.col("n_total"),
            6,
        ).alias("entropy"),
        F.col("top.next_type").alias("top_successor"),
        F.col("top.n").cast("long").alias("top_count"),
    ).orderBy("event_type")


ORACLE_TRANSITION_ENTROPY = """
WITH pairs AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id)
           AS next_type
  FROM events),
cnt AS (
  SELECT event_type, next_type, COUNT(*) AS n
  FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2)
SELECT event_type,
       CAST(SUM(n) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_successors,
       ROUND(ROUND(ln(SUM(n)), 9)
             - CAST(SUM(CAST(ROUND(n * ln(n), 9) AS DECIMAL(25,9)))
                    AS DOUBLE) / SUM(n), 6) AS entropy,
       arg_max(next_type,
               lpad(CAST(n AS VARCHAR), 20, '0') || '|' || next_type)
         AS top_successor,
       CAST(arg_max(n,
               lpad(CAST(n AS VARCHAR), 20, '0') || '|' || next_type)
            AS BIGINT) AS top_count
FROM cnt GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Conversion attribution (last-touch + linear multi-touch)
# --------------------------------------------------------------------------

ATTRIB_WINDOW_US = 7 * 86400 * 1_000_000


def ev_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution over the event stream: every purchase
    credits the touches (click/view/signup) in its trailing 7-day
    window — LAST-TOUCH gives the whole conversion to the most recent
    touch, LINEAR splits it 1/k across all k touches in the window. Both
    models from ONE user-keyed range join (fan-out bounded by per-user
    touches × purchases inside the window, not corpus size).

    Determinism: same-microsecond touches collapse to the lexically
    greatest type first; the last-touch pick orders (touch time, type)
    and linear credits are EXACT integer rationals: per-touch 1/k
    half-ups to BIGINT 10⁻⁹ units — (2·10⁹ + k) div (2k), no float —
    summed exactly, with the 6dp readout another integer half-up
    ((2·S + 1000) div 2000). A float round of 1/k (or of the decimal
    sum) can land on terminating-decimal ties where the two engines'
    round procedures split (TIES.md Class B′)."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("unix_micros(cast(ts as timestamp))")
    touches = (
        ev.filter(F.col("event_type").isin("click", "view", "signup"))
        .select("user_id", um.alias("tum"),
                F.col("event_type").alias("ttype"))
        .groupBy("user_id", "tum")
        .agg(F.max("ttype").alias("ttype"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", um.alias("pum"), "event_id"
    )
    joined = purch.join(touches, "user_id").filter(
        (F.col("tum") <= F.col("pum"))
        & (F.col("pum") - F.col("tum") <= ATTRIB_WINDOW_US)
    )
    wk = W.partitionBy("user_id", "pum", "event_id")
    wlast = wk.orderBy(F.desc("tum"), F.desc("ttype"))
    scored = (
        joined.withColumn("k", F.count("*").over(wk))
        .withColumn("rn", F.row_number().over(wlast))
    )
    return (
        scored.groupBy(F.col("ttype").alias("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_touches_in_window"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("last_touch_conversions"),
            F.sum(
                F.expr("(2000000000 + k) div (2 * k)")
            ).alias("s9"),
        )
        .select(
            "event_type",
            "n_touches_in_window",
            "last_touch_conversions",
            F.expr(
                "cast((2 * s9 + 1000) div 2000 as double) / 1000000.0"
            ).alias("linear_credit"),
        )
        .orderBy("event_type")
    )


ORACLE_ATTRIBUTION = f"""
WITH touches AS (
  SELECT user_id, epoch_us(ts) AS tum, MAX(event_type) AS ttype
  FROM events WHERE event_type IN ('click', 'view', 'signup')
  GROUP BY 1, 2),
purch AS (
  SELECT user_id, epoch_us(ts) AS pum, event_id
  FROM events WHERE event_type = 'purchase'),
joined AS (
  SELECT p.user_id, p.pum, p.event_id, t.tum, t.ttype
  FROM purch p JOIN touches t
    ON t.user_id = p.user_id
   AND t.tum <= p.pum
   AND p.pum - t.tum <= {ATTRIB_WINDOW_US}),
scored AS (
  SELECT ttype,
         COUNT(*) OVER wk AS k,
         ROW_NUMBER() OVER (PARTITION BY user_id, pum, event_id
                            ORDER BY tum DESC, ttype DESC) AS rn
  FROM joined
  WINDOW wk AS (PARTITION BY user_id, pum, event_id))
SELECT ttype AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_touches_in_window,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch_conversions,
       CAST((2 * SUM((2000000000 + k) // (2 * k)) + 1000) // 2000
            AS DOUBLE) / 1000000.0 AS linear_credit
FROM scored GROUP BY ttype ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Engagement concentration by user decile
# --------------------------------------------------------------------------

def ev_engagement_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event volume by user-activity decile — the 80/20 engagement read
    ("what share of traffic do the top 10% of users generate?") that
    decides whether product metrics are community-driven or whale-
    driven. One user-keyed count, an NTILE over the USER dimension
    (bounded; event-count then user_id tie-break so both engines bucket
    identically), then a 10-row rollup with integer counts and exact
    cumulative shares via the decimal-free integer ratio."""
    ev = catalog.load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    wd = W.orderBy(F.desc("n_events"), F.asc("user_id"))
    dec = per_user.withColumn("decile", F.ntile(10).over(wd))
    tot = per_user.agg(F.sum("n_events").alias("n_total"))
    g = (
        dec.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n_events").alias("n_ev"),
        )
        .crossJoin(F.broadcast(tot))
    )
    wcum = W.orderBy("decile").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        g.withColumn("cum_ev", F.sum("n_ev").over(wcum))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            F.col("n_ev").cast("long").alias("n_events"),
            # exact rational half-up on the count ratios (TIES.md B')
            F.expr(rat_round6_spark("n_ev", "n_total")).alias("share"),
            F.expr(
                rat_round6_spark("cum_ev", "n_total")
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


ORACLE_ENGAGEMENT = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1),
dec AS (
  SELECT n_events,
         NTILE(10) OVER (ORDER BY n_events DESC, user_id ASC) AS decile
  FROM per_user),
tot AS (SELECT SUM(n_events) AS n_total FROM per_user),
g AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
         SUM(n_events) AS n_ev
  FROM dec GROUP BY 1)
SELECT CAST(g.decile AS INT) AS decile,
       g.n_users,
       CAST(g.n_ev AS BIGINT) AS n_events,
       CAST(((g.n_ev) * 2000000 + (t.n_total)) // (2 * (t.n_total)) AS DOUBLE) / 1000000.0
         AS share,
       CAST(((SUM(g.n_ev) OVER (ORDER BY g.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 2000000 + (t.n_total)) // (2 * (t.n_total)) AS DOUBLE) / 1000000.0
         AS cum_share
FROM g CROSS JOIN tot t
ORDER BY decile
"""


# --------------------------------------------------------------------------
# CUSUM changepoint (level-shift detector on the hourly series)
# --------------------------------------------------------------------------

def ev_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single most likely LEVEL-SHIFT point of the hourly event-count
    series by CUSUM: the hour h maximizing |Σ_{i≤h}(cᵢ − mean)| — the
    classic at-most-one-changepoint screen a monitoring pipeline runs
    before alerting "traffic stepped". Emits the argmax hour, the CUSUM
    statistic, and the mean levels before/after the candidate point.

    Exactness: with integer counts, n_hours·S_h = n_hours·cum_h −
    idx_h·n_events is an INTEGER — the argmax (tie-break: earliest hour)
    is decided in integer arithmetic, so no ulp can move the
    changepoint between engines; the reported statistic and means are
    display-only 6dp doubles of integer ratios.

    Scale: one fact shuffle to hourly counts; the zero-filled spine,
    running sum, and TakeOrdered argmax are all CALENDAR-bounded (the
    global window runs over hours-of-history rows, never events —
    plan_audit GLOBAL_WINDOW_BOUNDED)."""
    ev = catalog.load(spark, sf_dir, "events")
    hr = F.expr(
        "cast(floor(unix_micros(cast(ts as timestamp)) / 3600000000) "
        "as bigint)"
    )
    b = ev.select(hr.alias("hr")).groupBy("hr").agg(
        F.count("*").alias("n")
    )
    rng = b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("hr"))
    f = spine.join(b, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    wcum = W.orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    cum = (
        f.withColumn("cum", F.sum("n").over(wcum))
        .withColumn("idx", F.count("*").over(wcum))
    )
    tot = f.agg(
        F.count("*").alias("n_hours"), F.sum("n").alias("n_events")
    )
    scored = cum.crossJoin(F.broadcast(tot)).withColumn(
        "t_scaled",
        F.col("n_hours") * F.col("cum") - F.col("idx") * F.col("n_events"),
    )
    top = (
        scored.filter(F.col("idx") < F.col("n_hours"))  # split needs a tail
        .orderBy(F.abs("t_scaled").desc(), F.asc("hr"))
        .limit(1)
    )
    return top.select(
        F.expr(
            "cast(timestamp_micros(hr * 3600000000) as timestamp_ntz)"
        ).alias("changepoint_hour"),
        F.col("idx").cast("long").alias("hours_before"),
        (F.col("n_hours") - F.col("idx")).cast("long").alias("hours_after"),
        # exact rational half-up on the integer ratios (TIES.md B')
        F.expr(
            rat_round6_spark("abs(t_scaled)", "n_hours")
        ).alias("cusum_stat"),
        F.expr(rat_round6_spark("cum", "idx")).alias("mean_before"),
        F.expr(
            rat_round6_spark("n_events - cum", "n_hours - idx")
        ).alias("mean_after"),
    )


ORACLE_CUSUM = """
WITH b AS (
  SELECT epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS n
  FROM events GROUP BY 1),
rng AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM b),
spine AS (SELECT unnest(generate_series(rng.lo, rng.hi)) AS hr FROM rng),
f AS (
  SELECT s.hr, COALESCE(b.n, 0) AS n
  FROM spine s LEFT JOIN b ON s.hr = b.hr),
cum AS (
  SELECT hr, n,
         SUM(n) OVER (ORDER BY hr
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         COUNT(*) OVER (ORDER BY hr
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS idx
  FROM f),
tot AS (SELECT COUNT(*) AS n_hours, SUM(n) AS n_events FROM f),
scored AS (
  SELECT c.*, t.n_hours, t.n_events,
         t.n_hours * c.cum - c.idx * t.n_events AS t_scaled
  FROM cum c CROSS JOIN tot t)
SELECT make_timestamp(hr * 3600000000) AS changepoint_hour,
       CAST(idx AS BIGINT) AS hours_before,
       CAST(n_hours - idx AS BIGINT) AS hours_after,
       CAST(((ABS(t_scaled)) * 2000000 + (n_hours)) // (2 * (n_hours)) AS DOUBLE) / 1000000.0
         AS cusum_stat,
       CAST(((cum) * 2000000 + (idx)) // (2 * (idx)) AS DOUBLE) / 1000000.0 AS mean_before,
       CAST(((n_events - cum) * 2000000 + (n_hours - idx)) // (2 * (n_hours - idx)) AS DOUBLE) / 1000000.0 AS mean_after
FROM scored
WHERE idx < n_hours
ORDER BY ABS(t_scaled) DESC, hr ASC
LIMIT 1
"""


# --------------------------------------------------------------------------
# SCD2 as-of lookup (the query half of the SCD2 build)
# --------------------------------------------------------------------------

def scd2_as_of_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time ("as of") state lookup — the QUERY half of the SCD2
    pattern (``ev_scd2_user_status`` is the build half): every user's
    status at the corpus-midpoint instant T, with how many status
    changes preceded it. The scalable form does NOT range-join against
    the built dimension: as-of state ≡ the latest change event at or
    before T, which is one filtered per-user window (a single shuffle
    on the user key), so the lookup costs the same as any keyed top-1.

    Determinism: T = ⌊(min+max)/2⌋ of epoch MICROSECONDS (integer
    arithmetic, tz-free), ordering ties broken by event_id; the change
    count is an exact integer. ``n_changes_before`` counts status
    CHANGES (first event + every differing successor), matching the
    SCD2 build's row count for the user up to T."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("um"),
        F.col("event_type").alias("status"),
    )
    bounds = ev.agg(
        ((F.min("um") + F.max("um")) / F.lit(2))
        .cast("long").alias("t")
    )
    upto = ev.crossJoin(F.broadcast(bounds)).filter(F.col("um") <= F.col("t"))
    w = W.partitionBy("user_id").orderBy("um", "event_id")
    wdesc = W.partitionBy("user_id").orderBy(
        F.desc("um"), F.desc("event_id")
    )
    marked = upto.withColumn(
        "prev_status", F.lag("status").over(w)
    ).withColumn(
        "is_change",
        F.when(
            F.col("prev_status").isNull()
            | (F.col("status") != F.col("prev_status")),
            1,
        ).otherwise(0),
    )
    return (
        marked.withColumn("rn", F.row_number().over(wdesc))
        .withColumn(
            "n_changes_before",
            F.sum("is_change").over(
                W.partitionBy("user_id").rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("status").alias("status_as_of"),
            F.expr(
                "cast(timestamp_micros(um) as timestamp_ntz)"
            ).alias("status_since"),
            F.col("n_changes_before").cast("long").alias("n_changes_before"),
            F.expr(
                "cast(timestamp_micros(t) as timestamp_ntz)"
            ).alias("as_of"),
        )
        .orderBy("user_id")
    )


ORACLE_SCD2_ASOF = """
WITH bounds AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS t FROM events),
upto AS (
  SELECT e.user_id, e.event_id, epoch_us(e.ts) AS um,
         e.event_type AS status, b.t
  FROM events e CROSS JOIN bounds b
  WHERE epoch_us(e.ts) <= b.t),
marked AS (
  SELECT *,
         CASE WHEN LAG(status) OVER w IS NULL
                   OR status <> LAG(status) OVER w
              THEN 1 ELSE 0 END AS is_change
  FROM upto
  WINDOW w AS (PARTITION BY user_id ORDER BY um, event_id)),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY um DESC, event_id DESC) AS rn,
         SUM(is_change) OVER (PARTITION BY user_id) AS n_changes_before
  FROM marked)
SELECT user_id,
       status AS status_as_of,
       make_timestamp(um) AS status_since,
       CAST(n_changes_before AS BIGINT) AS n_changes_before,
       make_timestamp(t) AS as_of
FROM ranked WHERE rn = 1
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# One-way ANOVA: price variance decomposition by brand
# --------------------------------------------------------------------------

def stats_anova_price_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of line price by part brand: total / between /
    within sums of squares, the F statistic, and η² (share of price
    variance explained by brand) — "does brand structure the price
    distribution or is it noise?", the variance-decomposition question
    behind every categorical feature screen.

    Exactness recipe: all MOMENTS are exact decimals (price and price²
    sums — the inputs are decimal columns, so Σx and Σx² carry no float
    error); the only float step is the per-brand ``S1²/n_g`` term,
    which is computed in double (identical IEEE sequence both engines)
    then 6dp-round-cast to DECIMAL and summed EXACTLY — the same
    order-independent decimal-reduction pattern as the PCA iterations,
    so no float combine order can move the result. Everything after is
    one-row scalar arithmetic written in the identical operation order
    in both engines. Scale: one broadcast dim join + one
    map-side-combined groupBy; everything after is |brands| rows."""
    li = catalog.load(spark, sf_dir, "lineitem")
    part = catalog.load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = li.select("l_partkey", "l_extendedprice").join(
        F.broadcast(part), "l_partkey"
    )
    g = j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,2)")).alias("s1"),
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_extendedprice").cast("decimal(18,2)")
            ).cast("decimal(38,4)")
        ).alias("s2"),
    )
    term = F.round(
        F.col("s1").cast("double")
        * F.col("s1").cast("double")
        / F.col("n_g").cast("double"),
        6,
    ).cast("decimal(38,6)")
    acc = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("s1").alias("ts1"),
        F.sum("s2").alias("ts2"),
        F.sum(term).alias("tterm"),
        F.count("*").alias("k"),
    )
    n = F.col("n").cast("double")
    corr = F.col("ts1").cast("double") * F.col("ts1").cast("double") / n
    ss_total = F.col("ts2").cast("double") - corr
    ss_between = F.col("tterm").cast("double") - corr
    ss_within = F.col("ts2").cast("double") - F.col("tterm").cast("double")
    kk = F.col("k").cast("double")
    f_stat = (ss_between / (kk - 1)) / (ss_within / (n - kk))
    # Degenerate-variance guards (ADVICE r6, mirroring stats_ab_test):
    # k=1 zeroes the between df, ss_within=0 (all prices equal within
    # every brand) zeroes the denominator, ss_total=0 zeroes η²'s —
    # each would yield Inf/NaN; NULL on BOTH engines instead. F.when
    # is lazy, so the guarded division never evaluates.
    f_ok = (kk > 1) & (n > kk) & (ss_within > 0)

    # Sums of squares are reported PER ROW (intensive — the extensive
    # ~5e14 SS would put ROUND's ·10^d multiply past 2^53 in DuckDB) and
    # quantized by TRUNCATION, not round: at ~1e9 a 6dp grid sits only
    # ~4 ulp wide, where Spark's shortest-repr BigDecimal round and
    # DuckDB's multiply-based round systematically split on 7th-digit-5
    # reprs (observed at sf0.1). floor(x·10⁶)/10⁶ is the SAME two float
    # ops on the SAME double in both engines — no tie exists. f_stat/η²
    # are O(1) where round's grid is ~10 orders above ulp — safe.
    def _trunc6(c: F.Column) -> F.Column:
        return F.floor(c * F.lit(1000000.0)).cast("double") / F.lit(
            1000000.0
        )

    return acc.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("k").cast("int").alias("n_groups"),
        _trunc6(ss_total / n).alias("ss_total_per_row"),
        _trunc6(ss_between / n).alias("ss_between_per_row"),
        _trunc6(ss_within / n).alias("ss_within_per_row"),
        F.round(F.when(f_ok, f_stat), 6).alias("f_stat"),
        F.round(
            F.when(ss_total > 0, ss_between / ss_total), 6
        ).alias("eta_squared"),
    )


ORACLE_ANOVA = """
WITH j AS (
  SELECT p.p_brand, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
g AS (
  SELECT p_brand,
         COUNT(*) AS n_g,
         SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS s1,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))
                  AS DECIMAL(38,4))) AS s2
  FROM j GROUP BY 1),
acc AS (
  SELECT SUM(n_g) AS n,
         SUM(s1) AS ts1,
         SUM(s2) AS ts2,
         SUM(CAST(ROUND(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                        / CAST(n_g AS DOUBLE), 6)
                  AS DECIMAL(38,6))) AS tterm,
         COUNT(*) AS k
  FROM g)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(k AS INT) AS n_groups,
       FLOOR((CAST(ts2 AS DOUBLE)
              - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS ss_total_per_row,
       FLOOR((CAST(tterm AS DOUBLE)
              - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS ss_between_per_row,
       FLOOR((CAST(ts2 AS DOUBLE) - CAST(tterm AS DOUBLE))
             / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS ss_within_per_row,
       CASE WHEN CAST(k AS DOUBLE) > 1
                 AND CAST(n AS DOUBLE) > CAST(k AS DOUBLE)
                 AND CAST(ts2 AS DOUBLE) - CAST(tterm AS DOUBLE) > 0
         THEN ROUND((CAST(tterm AS DOUBLE)
              - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1)
             / ((CAST(ts2 AS DOUBLE) - CAST(tterm AS DOUBLE))
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
       END AS f_stat,
       CASE WHEN CAST(ts2 AS DOUBLE)
                 - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                   / CAST(n AS DOUBLE) > 0
         THEN ROUND((CAST(tterm AS DOUBLE)
              - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(ts2 AS DOUBLE)
                - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
                  / CAST(n AS DOUBLE)), 6)
       END AS eta_squared
FROM acc
"""


# --------------------------------------------------------------------------
# Supplier scorecard (the composite fulfilment KPI readout)
# --------------------------------------------------------------------------

SCORECARD_SLA_DAYS = 60  # order->ship SLA for the on-time rate


def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier fulfilment scorecard: volume, on-time rate (shipped
    within {SCORECARD_SLA_DAYS} days of the order date — the fixture
    carries no commit date, so the SLA is against order placement),
    average order→ship latency in days, return rate, and exact-decimal
    revenue — the composite KPI row a procurement review reads per
    vendor. One fact⋈fact join on the order key (the standard TPC-H
    shape — lineitem brings the supplier, orders brings the clock) then
    ONE map-side-combined groupBy on the supplier key; every rate is a
    6dp-rounded ratio of integers and the latency average is an exact
    integer-day sum over an exact count. Day arithmetic stays in epoch-
    microsecond integers (no tz-dependent date casts)."""
    li = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias(
            "order_um"
        ),
    )
    day_us = 86_400 * 1_000_000
    j = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
        F.expr("unix_micros(cast(l_shipdate as timestamp))").alias(
            "ship_um"
        ),
    ).join(orders, "l_orderkey")
    # Integer floor division on BOTH engines (ADVICE r6): the old
    # double-division .cast('long') truncated toward zero while the
    # oracle's CAST(x/86400000000 AS BIGINT) rounded to nearest — equal
    # only because fixture dates are midnight-aligned (exact-integer
    # quotients). `div`/`//` pin the day semantics for any sub-day
    # timestamp; ship >= order so truncation == floor.
    lat_days = F.expr(f"(ship_um - order_um) div {day_us}")
    g = j.groupBy("l_suppkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(
            F.when(lat_days <= SCORECARD_SLA_DAYS, 1).otherwise(0)
        ).alias("n_on_time"),
        F.sum(lat_days).alias("lat_days_sum"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_returned"),
        F.sum(
            F.expr(REVENUE).cast("decimal(25,6)")
        ).alias("rev_dec"),
    )
    # Integer half-up at 6dp for the count ratios — NOT round(a/b, 6).
    # Spark's double round goes through the SHORTEST decimal repr while
    # DuckDB multiplies by 10^6, so a quotient that IS a 7-digit decimal
    # tie (a dyadic·5 denominator: 333/640 = 0.5203125 — real at sf0.1)
    # splits the engines one micro-unit apart. (2a·10⁶ + b) div (2b) is
    # the exact rational half-up on the non-negative domain; the final
    # /10⁶ is one identical IEEE division of a small integer. TIES.md
    # "shortest-repr tie" subclass.
    return g.select(
        F.col("l_suppkey").cast("long").alias("suppkey"),
        "n_lines",
        F.expr(rat_round6_spark("n_on_time", "n_lines")).alias(
            "on_time_rate"
        ),
        F.expr(rat_round6_spark("lat_days_sum", "n_lines")).alias(
            "avg_latency_days"
        ),
        F.expr(rat_round6_spark("n_returned", "n_lines")).alias(
            "return_rate"
        ),
        F.col("rev_dec").cast("double").alias("revenue"),
    ).orderBy("suppkey")


ORACLE_SUPPLIER_SCORECARD = f"""
WITH j AS (
  SELECT l.l_suppkey, l.l_returnflag, l.l_extendedprice, l.l_discount,
         (epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
               - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)))
              // 86400000000 AS lat_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
g AS (
  SELECT l_suppkey,
         COUNT(*) AS n_lines,
         SUM(CASE WHEN lat_days <= {SCORECARD_SLA_DAYS}
                  THEN 1 ELSE 0 END) AS n_on_time,
         SUM(lat_days) AS lat_days_sum,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
         SUM(CAST({REVENUE} AS DECIMAL(25,6))) AS rev_dec
  FROM j GROUP BY 1)
SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST((n_on_time * 2000000 + n_lines) // (2 * n_lines) AS DOUBLE)
         / 1000000.0 AS on_time_rate,
       CAST((lat_days_sum * 2000000 + n_lines) // (2 * n_lines) AS DOUBLE)
         / 1000000.0 AS avg_latency_days,
       CAST((n_returned * 2000000 + n_lines) // (2 * n_lines) AS DOUBLE)
         / 1000000.0 AS return_rate,
       CAST(rev_dec AS DOUBLE) AS revenue
FROM g ORDER BY suppkey
"""


# --------------------------------------------------------------------------
# Open-order backlog aging (the fulfilment WIP report)
# --------------------------------------------------------------------------

AGING_EDGES = (30, 60, 90)  # bucket edges in days


def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging report of the order BACKLOG at the corpus snapshot (max
    order date): every order still open at the snapshot — opened on or
    before it, last line shipping on or after it — bucketed by age
    (0-30 / 31-60 / 61-90 / 90+ days since opening) with counts and
    exact-decimal open value. The WIP report a fulfilment DBA reads
    next to ``orders_open_concurrency``'s time series: that one says
    HOW MANY were open each day, this one says how OLD today's backlog
    is and how much revenue is stuck in it.

    Scale: one line-item shuffle for per-order close dates, one
    broadcast snapshot row, one 4-row rollup. Determinism: ages are
    integer day differences on DATE arithmetic (no tz cast), buckets
    are integer comparisons, and the open value is BIGINT CENTS via
    IEEE floor(x*100 + 0.5) — o_totalprice is the one money column
    whose values sit OFF the cent grid (accumulated float error), so
    an engine-native double→DECIMAL(…,2) conversion here is the exact
    construct behind the merge_into_semantics driver reds (TIES.md
    Class C); the quantization keeps every engine bit-identical."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    oday = F.col("o_orderdate").cast("timestamp_ntz").cast("date")
    close = li.groupBy("l_orderkey").agg(
        F.max(
            F.col("l_shipdate").cast("timestamp_ntz").cast("date")
        ).alias("close_day")
    )
    snap = orders.agg(F.max(oday).alias("snap_day"))
    spans = (
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            oday.alias("open_day"),
            F.expr(
                "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
            ).alias("val_cents"),
        )
        .join(close, "l_orderkey")
        .crossJoin(F.broadcast(snap))
        .filter(
            (F.col("open_day") <= F.col("snap_day"))
            & (F.greatest("close_day", "open_day") >= F.col("snap_day"))
        )
        .withColumn(
            "age_days", F.datediff("snap_day", "open_day").cast("int")
        )
    )
    e1, e2, e3 = AGING_EDGES
    bucket = (
        F.when(F.col("age_days") <= e1, f"0-{e1}d")
        .when(F.col("age_days") <= e2, f"{e1 + 1}-{e2}d")
        .when(F.col("age_days") <= e3, f"{e2 + 1}-{e3}d")
        .otherwise(f"{e3}d+")
    )
    return (
        spans.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("val_cents").cast("long").alias("open_value_cents"),
            F.min("age_days").cast("int").alias("min_age"),
            F.max("age_days").cast("int").alias("max_age"),
        )
        .orderBy("min_age")
    )


ORACLE_BACKLOG_AGING = f"""
WITH close AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_day
  FROM lineitem GROUP BY 1),
snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS snap_day FROM orders),
spans AS (
  SELECT CAST(o.o_orderdate AS DATE) AS open_day,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS val_cents,
         s.snap_day,
         DATEDIFF('day', CAST(o.o_orderdate AS DATE), s.snap_day) AS age_days
  FROM orders o
  JOIN close c ON o.o_orderkey = c.l_orderkey
  CROSS JOIN snap s
  WHERE CAST(o.o_orderdate AS DATE) <= s.snap_day
    AND GREATEST(c.close_day, CAST(o.o_orderdate AS DATE)) >= s.snap_day)
SELECT CASE WHEN age_days <= {AGING_EDGES[0]} THEN '0-{AGING_EDGES[0]}d'
            WHEN age_days <= {AGING_EDGES[1]}
              THEN '{AGING_EDGES[0] + 1}-{AGING_EDGES[1]}d'
            WHEN age_days <= {AGING_EDGES[2]}
              THEN '{AGING_EDGES[1] + 1}-{AGING_EDGES[2]}d'
            ELSE '{AGING_EDGES[2]}d+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(val_cents) AS BIGINT) AS open_value_cents,
       CAST(MIN(age_days) AS INT) AS min_age,
       CAST(MAX(age_days) AS INT) AS max_age
FROM spans
GROUP BY 1
ORDER BY min_age
"""


# --------------------------------------------------------------------------
# Hash-split A/B test (two-proportion z, the experimentation readout)
# --------------------------------------------------------------------------

AB_SALT = "exp1"  # deterministic experiment id baked into the assignment
AB_CONV_VALUE = 150.0  # conversion = a purchase above ~p95 value (the
# fixture's every user makes SOME purchase, so plain any-purchase is a
# degenerate 100% metric with zero pooled variance)


def stats_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout over a DETERMINISTIC hash split
    (md5(user_id:salt) parity → A/B — the same idempotent-assignment
    idiom as ``dataset_split_hash``, so re-runs and late events always
    land users in the same arm): per-arm users, converters (≥1 purchase
    above {AB_CONV_VALUE}), conversion rates, relative lift, pooled-SE
    z-score (NULL when the pooled variance is degenerate — both guards
    mirrored in the oracle so ANSI mode cannot diverge the engines). The
    readout every experimentation platform prints; the z is the
    two-sided test statistic under H₀: p_A = p_B.

    Scale: one user-grain dedup + two single-row aggregates — the fact
    stream crosses the wire once; everything after is 2-row arithmetic.
    Determinism: integer counts; rates and lift are EXACT rational
    half-up/half-away integer arithmetic (a float round of a count
    ratio can split the engines on decimal ties, TIES.md Class B′);
    z is sqrt-derived (non-terminating — safe under plain round)."""
    ev = catalog.load(spark, sf_dir, "events")
    users = (
        ev.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > AB_CONV_VALUE),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn(
            "arm",
            F.when(
                F.expr(
                    "cast(conv(substring(md5(concat(cast(user_id as string), "
                    f"':{AB_SALT}')), 1, 7), 16, 10) as bigint) % 2"
                )
                == 0,
                "A",
            ).otherwise("B"),
        )
    )
    g = users.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    a = g.filter(F.col("arm") == "A").select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ka")
    )
    bb = g.filter(F.col("arm") == "B").select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("kb")
    )
    j = a.crossJoin(bb)
    pa = F.col("ka").cast("double") / F.col("na").cast("double")
    pb = F.col("kb").cast("double") / F.col("nb").cast("double")
    pp = (F.col("ka") + F.col("kb")).cast("double") / (
        F.col("na") + F.col("nb")
    ).cast("double")
    se = F.sqrt(
        pp
        * (1 - pp)
        * (
            1 / F.col("na").cast("double")
            + 1 / F.col("nb").cast("double")
        )
    )
    return j.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ka").cast("long").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("kb").cast("long").alias("conv_b"),
        # exact rational half-up / half-away: pb/pa − 1 =
        # (kb·na − ka·nb)/(ka·nb), a SIGNED integer rational (TIES.md B')
        F.expr(rat_round6_spark("ka", "na")).alias("rate_a"),
        F.expr(rat_round6_spark("kb", "nb")).alias("rate_b"),
        # envelope: |kb·na − ka·nb|·2e6 < 2^63 -> arm sizes up to
        # ~2e6 users each; ANSI overflows loudly beyond
        F.when(
            F.col("ka") > 0,
            F.expr(
                rat_round6_signed_spark("kb * na - ka * nb", "ka * nb")
            ),
        ).alias("rel_lift"),
        F.when(
            (F.col("ka") + F.col("kb") > 0)
            & (F.col("ka") + F.col("kb") < F.col("na") + F.col("nb")),
            F.round((pb - pa) / se, 6),
        ).alias("z_score"),
    )


ORACLE_AB_TEST = f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND value > {AB_CONV_VALUE}
                  THEN 1 ELSE 0 END) AS converted,
         CASE WHEN CAST(('0x' || SUBSTRING(md5(CAST(user_id AS VARCHAR)
                    || ':{AB_SALT}'), 1, 7)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS arm
  FROM events GROUP BY user_id),
g AS (
  SELECT arm, COUNT(*) AS n, SUM(converted) AS k FROM users GROUP BY 1),
j AS (
  SELECT a.n AS na, a.k AS ka, b.n AS nb, b.k AS kb
  FROM (SELECT * FROM g WHERE arm = 'A') a
  CROSS JOIN (SELECT * FROM g WHERE arm = 'B') b)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(ka AS BIGINT) AS conv_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(kb AS BIGINT) AS conv_b,
       CAST(((ka) * 2000000 + (na)) // (2 * (na)) AS DOUBLE) / 1000000.0 AS rate_a,
       CAST(((kb) * 2000000 + (nb)) // (2 * (nb)) AS DOUBLE) / 1000000.0 AS rate_b,
       CASE WHEN ka > 0 THEN
         (CASE WHEN (kb * na - ka * nb) >= 0 THEN CAST(((abs(kb * na - ka * nb)) * 2000000 + (ka * nb)) // (2 * (ka * nb)) AS DOUBLE) / 1000000.0 ELSE -(CAST(((abs(kb * na - ka * nb)) * 2000000 + (ka * nb)) // (2 * (ka * nb)) AS DOUBLE) / 1000000.0) END)
       END AS rel_lift,
       CASE WHEN ka + kb > 0 AND ka + kb < na + nb THEN
         ROUND((CAST(kb AS DOUBLE) / CAST(nb AS DOUBLE)
                - CAST(ka AS DOUBLE) / CAST(na AS DOUBLE))
               / sqrt((CAST(ka + kb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                      * (1 - CAST(ka + kb AS DOUBLE)
                             / CAST(na + nb AS DOUBLE))
                      * (1 / CAST(na AS DOUBLE) + 1 / CAST(nb AS DOUBLE))),
               6)
       END AS z_score
FROM j
"""


# --------------------------------------------------------------------------
# Theil–Sen robust trend (median of pairwise slopes)
# --------------------------------------------------------------------------

def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Theil–Sen trend of the hourly event-count series: the
    MEDIAN of all pairwise slopes (cⱼ−cᵢ)/(hⱼ−hᵢ) — the robust
    complement to ``stats_regression_trend``'s OLS (one outlier hour
    drags an OLS slope arbitrarily; it moves the slope median not at
    all, 29.3% breakdown point).

    Scale envelope: the pair expansion is CALENDAR²-bounded per type
    (hours-of-history², never events² — ~77M pairs for a year of hourly
    data, a routine shuffle), produced by a per-type range self-join.
    The median is the bucket-histogram SELECTION from
    ``agg_exact_global_median`` (VERDICT r6 item 4), per type: pass 1
    bins every slope into max(1024, ⌈m/2²⁰⌉) width buckets (map-side
    combined), the per-type histogram locates the bucket holding rank
    ⌈m/2⌉ and the residual rank within it, and pass 2 sorts ONLY that
    bucket — no single task ever sorts the full per-type pair set
    (expected residual ~2²⁰ rows at ANY history length; the old
    one-window form sorted all ~77M pairs/type-year in one task).
    Determinism: slopes are ratios of integers evaluated identically in
    IEEE on both engines; the k-th order STATISTIC is tie-invariant, so
    neither the bucket partitioning nor within-bucket tie order can
    change the selected slope value. The median rank is ⌈m/2⌉ (lower
    median — exact, no averaging); the oracle stays the brute-force
    global ROW_NUMBER selection."""
    ev = catalog.load(spark, sf_dir, "events")
    hr = F.expr(
        "cast(floor(unix_micros(cast(ts as timestamp)) / 3600000000) "
        "as bigint)"
    )
    b = (
        ev.select("event_type", hr.alias("hr"))
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("n"))
    )
    l = b.select(
        "event_type", F.col("hr").alias("h1"), F.col("n").alias("n1")
    )
    r = b.select(
        F.col("event_type").alias("et2"),
        F.col("hr").alias("h2"),
        F.col("n").alias("n2"),
    )
    pairs = l.join(
        r,
        (F.col("event_type") == F.col("et2")) & (F.col("h1") < F.col("h2")),
    ).select(
        "event_type",
        "h1",
        "h2",
        (
            (F.col("n2") - F.col("n1")).cast("double")
            / (F.col("h2") - F.col("h1")).cast("double")
        ).alias("slope"),
    )
    from .relational import MEDIAN_BUCKETS, MEDIAN_RESIDUAL_TARGET

    stats = pairs.groupBy("event_type").agg(
        F.min("slope").alias("lo"),
        F.max("slope").alias("hi"),
        F.count("*").alias("m"),
    ).select(
        "event_type",
        "lo",
        "hi",
        "m",
        F.greatest(
            F.lit(MEDIAN_BUCKETS),
            F.ceil(F.col("m") / F.lit(MEDIAN_RESIDUAL_TARGET)),
        ).cast("long").alias("nb"),
        F.ceil(F.col("m") / 2).cast("long").alias("k"),
    )
    b = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.col("nb") - 1,
            F.floor(
                (F.col("slope") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.col("nb")
            ),
        ),
    ).otherwise(0)
    binned = pairs.join(F.broadcast(stats), "event_type").select(
        "event_type", "slope", b.cast("long").alias("bucket")
    )
    hist = binned.groupBy("event_type", "bucket").agg(
        F.count("*").alias("c")
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    targets = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("prev_cum", F.col("cum") - F.col("c"))
        .join(F.broadcast(stats.select("event_type", "m", "k")), "event_type")
        .filter(
            (F.col("cum") >= F.col("k")) & (F.col("prev_cum") < F.col("k"))
        )
        .select(
            F.col("event_type").alias("t_et"),
            "m",
            F.col("bucket").alias("tbucket"),
            (F.col("k") - F.col("prev_cum")).alias("residual_rank"),
        )
    )
    in_bucket = binned.join(
        F.broadcast(targets),
        (F.col("event_type") == F.col("t_et"))
        & (F.col("bucket") == F.col("tbucket")),
    ).select("event_type", "slope", "m", "residual_rank")
    wsel = W.partitionBy("event_type").orderBy("slope")
    return (
        in_bucket.withColumn("rn", F.row_number().over(wsel))
        .filter(F.col("rn") == F.col("residual_rank"))
        .select(
            "event_type",
            F.col("m").cast("long").alias("n_pairs"),
            # slope is a ratio of integers (can terminate on a decimal
            # tie) -> FLOOR-quantize the identical double on both
            # engines instead of rounding (TIES.md B')
            (
                F.floor(F.col("slope") * F.lit(1000000.0)).cast("double")
                / F.lit(1000000.0)
            ).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


ORACLE_THEIL_SEN = """
WITH b AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type, a.hr AS h1, b2.hr AS h2,
         CAST(b2.n - a.n AS DOUBLE) / CAST(b2.hr - a.hr AS DOUBLE)
           AS slope
  FROM b a JOIN b b2
    ON a.event_type = b2.event_type AND a.hr < b2.hr),
ranked AS (
  SELECT event_type, slope,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY slope, h1, h2) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM pairs)
SELECT event_type,
       CAST(m AS BIGINT) AS n_pairs,
       FLOOR(slope * 1000000.0) / 1000000.0 AS theil_sen_slope
FROM ranked WHERE rn = CAST(ceil(m / 2.0) AS BIGINT)
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Two-sample nonparametric tests: Kolmogorov-Smirnov D and Mann-Whitney U
# (click vs purchase event values — the distribution-shift readouts a
# feature-monitoring dashboard runs between cohorts; both are EXACT
# integer statistics, no approximation and no float rank arithmetic)
# --------------------------------------------------------------------------

TS2_TYPE_A = "click"
TS2_TYPE_B = "purchase"


def _two_sample_bucket_prefix(spark: SparkSession, sf_dir: str):
    """PASS 1 of the shared two-sample machinery: per-BUCKET sample
    counts (bucket = floor(value) — bounded by the VALUE RANGE, ~500
    buckets on this domain, independent of row count) are collected and
    turned into driver-side exclusive prefix sums + grand totals. The
    bounded-collect-then-broadcast posture is the
    ``emb_label_centroid_sep`` convention: two corpus passes, and the
    fact stream never enters a global window (the naive cumulative-CDF
    formulation is a single-task sort of every distinct value)."""
    ev = catalog.load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(TS2_TYPE_A, TS2_TYPE_B)
    )
    bt = (
        ev.groupBy(F.expr("cast(floor(value) as int)").alias("b"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == TS2_TYPE_A, 1).otherwise(0)
            ).alias("s1"),
            F.sum(
                F.when(F.col("event_type") == TS2_TYPE_B, 1).otherwise(0)
            ).alias("s2"),
        )
        .collect()
    )  # bounded: one row per unit of value range (~500 on this domain)
    pre: list[tuple[int, int, int]] = []
    a1 = a2 = 0
    for b, s1, s2 in sorted(
        (int(r["b"]), int(r["s1"]), int(r["s2"])) for r in bt
    ):
        pre.append((b, a1, a2))
        a1 += s1
        a2 += s2
    return ev, pre, a1, a2


def _two_sample_cum(spark: SparkSession, sf_dir: str):
    """PASS 2 core: per distinct value, both samples' tie counts plus
    the exclusive cross-bucket prefix joined in broadcast; the
    within-bucket running sum is a window PARTITIONED BY bucket, so no
    task ever sees more than one bucket's distinct values."""
    ev, pre, n1, n2 = _two_sample_bucket_prefix(spark, sf_dir)
    pre_df = spark.createDataFrame(pre, "b int, p1 long, p2 long")
    per_v = (
        ev.groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == TS2_TYPE_A, 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(F.col("event_type") == TS2_TYPE_B, 1).otherwise(0)
            ).alias("c2"),
        )
        .withColumn("b", F.expr("cast(floor(value) as int)"))
        .join(F.broadcast(pre_df), "b")
    )
    w = (
        W.partitionBy("b")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = per_v.select(
        "c1",
        "c2",
        (F.col("p1") + F.sum("c1").over(w)).cast("long").alias("cum1"),
        (F.col("p2") + F.sum("c2").over(w)).cast("long").alias("cum2"),
    )
    return cum, n1, n2


def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between the value
    distributions of '{TS2_TYPE_A}' and '{TS2_TYPE_B}' events — the
    distribution-shift test a drift monitor runs between cohorts
    (``drift_psi_value`` bins first; KS is the binning-free
    complement). With ties, D = max over distinct values v of
    |F1(v) - F2(v)| with both CDFs evaluated AFTER absorbing all ties
    at v — kept exact as the INTEGER numerator
    max|cum1·n2 - cum2·n1| over n1·n2.

    Exactness: counts and cross-multiplied CDF numerators are integers;
    the one division is the exact-rational half-up (TIES.md B′ — never
    round(double) a count ratio). Scale: two corpus passes (the
    bounded bucket-prefix collect, then one distinct-value agg whose
    running sums are windowed WITHIN buckets); the final max is a plain
    hash aggregate. No global window, no Python row path."""
    cum, n1, n2 = _two_sample_cum(spark, sf_dir)
    den = f"cast({n1} as bigint) * cast({n2} as bigint)"
    return (
        cum.agg(
            F.max(
                F.abs(
                    F.col("cum1") * F.lit(n2).cast("long")
                    - F.col("cum2") * F.lit(n1).cast("long")
                )
            )
            .cast("long")
            .alias("d_num")
        )
        .select(
            F.lit(n1).cast("long").alias("n1"),
            F.lit(n2).cast("long").alias("n2"),
            "d_num",
            F.expr(rat_round6_spark("d_num", den)).alias("ks_d_r6"),
        )
    )


ORACLE_KS_TWO_SAMPLE = f"""
WITH pv AS (
  SELECT value,
         SUM(CASE WHEN event_type = '{TS2_TYPE_A}' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = '{TS2_TYPE_B}' THEN 1 ELSE 0 END) AS c2
  FROM events
  WHERE event_type IN ('{TS2_TYPE_A}', '{TS2_TYPE_B}')
  GROUP BY 1),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2 FROM pv),
c AS (SELECT CAST(SUM(c1) OVER (ORDER BY value) AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY value) AS BIGINT) AS cum2
      FROM pv),
m AS (SELECT CAST(MAX(ABS(cum1 * t.n2 - cum2 * t.n1)) AS BIGINT) AS d_num,
             t.n1 AS n1, t.n2 AS n2
      FROM c, t GROUP BY t.n1, t.n2)
SELECT n1, n2, d_num,
       CAST(((d_num) * 2000000 + (n1 * n2)) // (2 * (n1 * n2))
            AS DOUBLE) / 1000000.0 AS ks_d_r6
FROM m
"""


def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between '{TS2_TYPE_A}'
    and '{TS2_TYPE_B}' event values, with the standard mid-rank
    treatment of ties — the robust two-cohort location test that
    complements ``stats_ks_two_sample`` (KS sees shape, U sees
    stochastic dominance). Mid-ranks introduce .5 fractions, so the
    statistic is carried as 2·U (an exact integer:
    2·R1 = Σ_v c1(v)·(2·before(v) + ties(v) + 1), 2U = 2R1 − n1(n1+1));
    the common-language effect size U/(n1·n2) is the exact-rational
    half-up of (2U)/(2·n1·n2).

    Scale: identical two-pass posture as the KS twin (shared
    ``_two_sample_cum`` machinery) — bounded bucket-prefix collect,
    bucket-partitioned running sums, one final hash aggregate."""
    cum, n1, n2 = _two_sample_cum(spark, sf_dir)
    den = f"2 * cast({n1} as bigint) * cast({n2} as bigint)"
    before = F.col("cum1") + F.col("cum2") - F.col("c1") - F.col("c2")
    r2 = cum.agg(
        F.sum(
            F.col("c1")
            * (F.lit(2).cast("long") * before + F.col("c1") + F.col("c2") + 1)
        )
        .cast("long")
        .alias("r2_1")
    )
    u2 = f"r2_1 - cast({n1} as bigint) * cast({n1} as bigint) - cast({n1} as bigint)"
    return r2.select(
        F.lit(n1).cast("long").alias("n1"),
        F.lit(n2).cast("long").alias("n2"),
        F.expr(u2).cast("long").alias("u_times2"),
        F.expr(rat_round6_spark(f"({u2})", den)).alias("cles_r6"),
    )


ORACLE_MANN_WHITNEY = f"""
WITH pv AS (
  SELECT value,
         SUM(CASE WHEN event_type = '{TS2_TYPE_A}' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN event_type = '{TS2_TYPE_B}' THEN 1 ELSE 0 END) AS c2
  FROM events
  WHERE event_type IN ('{TS2_TYPE_A}', '{TS2_TYPE_B}')
  GROUP BY 1),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2 FROM pv),
c AS (SELECT c1, c2,
             CAST(SUM(c1 + c2) OVER (ORDER BY value) - (c1 + c2)
                  AS BIGINT) AS s
      FROM pv),
r AS (SELECT CAST(SUM(c1 * (2 * s + c1 + c2 + 1)) AS BIGINT) AS r2_1
      FROM c)
SELECT t.n1, t.n2,
       CAST(r.r2_1 - t.n1 * t.n1 - t.n1 AS BIGINT) AS u_times2,
       CAST(((r.r2_1 - t.n1 * t.n1 - t.n1) * 2000000
             + (2 * t.n1 * t.n2)) // (2 * (2 * t.n1 * t.n2))
            AS DOUBLE) / 1000000.0 AS cles_r6
FROM r, t
"""


# --------------------------------------------------------------------------
# Rank correlation: exact Spearman rho over parts
# --------------------------------------------------------------------------

def _bucketed_unique_rank(
    spark: SparkSession,
    df: DataFrame,
    val_col: str,
    key_col: str | list[str],
    bucket_sql: str,
) -> DataFrame:
    """Global 1..n rank of the TOTAL order (val, *keys) without a global
    window — the repo's bucketed-prefix pattern (``_two_sample_cum``):
    pass 1 collects per-bucket counts (bounded by the VALUE DOMAIN, not
    by n) into a driver-side exclusive prefix, pass 2 adds a
    row_number windowed WITHIN each bucket. The key tiebreak makes the
    rank a permutation of 1..n — exactly DuckDB's
    ``row_number() OVER (ORDER BY val, keys...)``."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    withb = df.withColumn("b", F.expr(bucket_sql))
    hist = withb.groupBy("b").agg(F.count("*").alias("c")).orderBy("b").collect()
    pre, acc = [], 0
    for r in hist:
        pre.append((r["b"], acc))
        acc += r["c"]
    pre_df = spark.createDataFrame(pre, "b int, p long")
    w = (
        W.partitionBy("b")
        .orderBy(val_col, *keys)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        withb.join(F.broadcast(pre_df), "b")
        .withColumn("rnk", F.col("p") + F.row_number().over(w))
    )


def stats_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between part retail price and
    part size — the monotone-association audit (is bigger stock
    priced higher?) that complements ``agg_corr_stats``' linear
    Pearson. Ranks are deterministic TOTAL orders, i.e. permutations
    of 1..n on both engines, so the classic closed form
    rho = 1 - 6*sum(d^2)/(n*(n^2-1)) is EXACT (no mid-rank fractions,
    no sqrt — the permutation's variance is known in closed form).
    The two tiebreaks are DECOUPLED (price ties break by p_partkey,
    size ties by md5(p_partkey) order): p_size has only ~50 distinct
    values, and a shared tiebreak key would manufacture within-tie
    rank agreement that biases rho upward (ADVICE r8). With
    independent tie orders this is randomized-tiebreak Spearman — an
    unbiased draw from the tie-resolution ensemble, not mid-rank rho;
    the difference from mid-rank is O(tie-run/n) and documented here
    by design. The readout is carried in DECIMAL(38,0) (Spark)
    / HUGEINT (DuckDB): n^3 * 10^6 stays in-range to n ~ 4*10^10
    ranked rows, so the BIGINT overflow cliff at n ~ 1.6*10^6 never
    exists. Spark ``div`` == DuckDB ``//`` == truncate-toward-zero,
    and the half-up is half-AWAY-FROM-ZERO on both engines via the
    signed rational helper.

    Scale: two bucketed-prefix rank passes (driver state = one count
    per DOLLAR / SIZE bucket — value-domain-bounded), one join on
    p_partkey, one scalar aggregate. No global window anywhere."""
    part = catalog.load(spark, sf_dir, "part")
    rx = _bucketed_unique_rank(
        spark,
        part.select("p_partkey", "p_retailprice"),
        "p_retailprice",
        "p_partkey",
        "cast(floor(p_retailprice) as int)",
    ).select("p_partkey", F.col("rnk").alias("rx"))
    ry = _bucketed_unique_rank(
        spark,
        part.select(
            "p_partkey",
            "p_size",
            # decoupled tie order: md5 hex is lowercase on both engines
            # and compares bytewise; p_partkey appended for the
            # (astronomically unlikely) collision
            F.expr("md5(cast(p_partkey as string))").alias("tb"),
        ),
        "p_size",
        ["tb", "p_partkey"],
        "cast(p_size as int)",
    ).select("p_partkey", F.col("rnk").alias("ry"))
    d = rx.join(ry, "p_partkey")
    n_dec = "cast(n as decimal(38,0))"
    den = f"{n_dec} * ({n_dec} - 1) * ({n_dec} + 1)"
    num = f"{den} - 6 * cast(sum_d2 as decimal(38,0))"
    return (
        d.agg(
            F.count("*").alias("n"),
            F.sum((F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry")))
            .alias("sum_d2"),
        )
        .select(
            F.col("n").cast("long").alias("n_parts"),
            F.col("sum_d2").cast("long").alias("sum_d2"),
            F.expr(rat_round6_signed_spark(num, den)).alias("rho_r6"),
        )
    )


_SP_DEN_DUCK = "n * (n - 1) * (n + 1)"
_SP_NUM_DUCK = f"{_SP_DEN_DUCK} - 6 * sd2"
ORACLE_SPEARMAN = f"""
WITH r AS (
  SELECT row_number() OVER (ORDER BY p_retailprice, p_partkey) AS rx,
         row_number() OVER (
           ORDER BY p_size, md5(CAST(p_partkey AS VARCHAR)), p_partkey
         ) AS ry
  FROM part),
s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM((rx - ry) * (rx - ry)) AS HUGEINT) AS sd2
      FROM r)
SELECT CAST(n AS BIGINT) AS n_parts, CAST(sd2 AS BIGINT) AS sum_d2,
       {rat_round6_signed_duck(_SP_NUM_DUCK, _SP_DEN_DUCK)} AS rho_r6
FROM s
"""


# --------------------------------------------------------------------------
# Kendall tau-a over the daily order-volume / revenue series
# --------------------------------------------------------------------------

RFM_SPLIT = "1998-01-01"  # half boundary of the 1995-2001 order span


def orders_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment MIGRATION matrix between the two halves of
    the order history (split at {RFM_SPLIT}): per half a customer is
    'hi' (revenue above that half's per-customer mean), 'lo' (active
    below mean) or 'none' (no orders in that half); the 3×3 matrix of
    (segment_h1 → segment_h2) counts is the churn/upgrade ledger a
    retention program reads. The mean threshold is EXACT — cents·n_half
    > total_half cross-multiplies the comparison, so no float average
    can flip a borderline account between engines. Universe = the
    customer dimension (so 'none'→'none' is well-defined).

    Scale: two per-customer rollups (one shuffle each on custkey), two
    1-row threshold frames broadcast, one dimension join — matrix-sized
    output."""
    orders = catalog.load(spark, sf_dir, "orders")
    cust = catalog.load(spark, sf_dir, "customer").select("c_custkey")
    split = F.lit(RFM_SPLIT).cast("timestamp_ntz")

    def half(df, label):
        per = df.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("cents")
        )
        thr = per.agg(
            F.sum("cents").cast("long").alias("tot"),
            F.count("*").cast("long").alias("n"),
        )
        return per.crossJoin(F.broadcast(thr)).select(
            "c_custkey",
            F.when(
                F.col("cents") * F.col("n") > F.col("tot"), F.lit("hi")
            )
            .otherwise(F.lit("lo"))
            .alias(label),
        )

    h1 = half(orders.filter(F.col("o_orderdate") < split), "seg_from")
    h2 = half(orders.filter(F.col("o_orderdate") >= split), "seg_to")
    uni = cust.agg(F.count("*").cast("long").alias("n_universe"))
    return (
        cust.join(h1, "c_custkey", "left")
        .join(h2, "c_custkey", "left")
        .select(
            F.coalesce("seg_from", F.lit("none")).alias("seg_from"),
            F.coalesce("seg_to", F.lit("none")).alias("seg_to"),
        )
        .groupBy("seg_from", "seg_to")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .crossJoin(F.broadcast(uni))
        .select(
            "seg_from",
            "seg_to",
            "n_customers",
            F.expr(rat_round6_spark("n_customers", "n_universe")).alias(
                "share_r6"
            ),
        )
        .orderBy("seg_from", "seg_to")
    )


ORACLE_RFM_MIGRATION = f"""
WITH h1p AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{RFM_SPLIT} 00:00:00'
  GROUP BY 1),
h1t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n FROM h1p),
h1 AS (SELECT c_custkey,
              CASE WHEN cents * n > tot THEN 'hi' ELSE 'lo' END AS seg_from
       FROM h1p, h1t),
h2p AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders WHERE o_orderdate >= TIMESTAMP '{RFM_SPLIT} 00:00:00'
  GROUP BY 1),
h2t AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n FROM h2p),
h2 AS (SELECT c_custkey,
              CASE WHEN cents * n > tot THEN 'hi' ELSE 'lo' END AS seg_to
       FROM h2p, h2t),
uni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_universe FROM customer),
m AS (
  SELECT COALESCE(h1.seg_from, 'none') AS seg_from,
         COALESCE(h2.seg_to, 'none') AS seg_to,
         CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM customer c
  LEFT JOIN h1 ON h1.c_custkey = c.c_custkey
  LEFT JOIN h2 ON h2.c_custkey = c.c_custkey
  GROUP BY 1, 2)
SELECT seg_from, seg_to, n_customers,
       {rat_round6_duck("n_customers", "n_universe")} AS share_r6
FROM m, uni ORDER BY seg_from, seg_to
"""


def ev_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day traffic profile per event type: counts and the
    within-type share for each of the 24 hours — the diurnal shape a
    capacity plan / anomaly baseline reads (and the grouping twin of
    ev_hourly_active_users, which counts users, not events). One hash
    agg on the (type, hour) pair; 24×types-bounded output; hours come
    from the timezone-free NTZ timestamps so the profile cannot shift
    under a session timezone."""
    ev = catalog.load(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(F.count("*").cast("long").alias("n"))
    tot = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_type")
    )
    return (
        counts.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "hour",
            "n",
            F.expr(rat_round6_spark("n", "n_type")).alias("share_r6"),
        )
        .orderBy("event_type", "hour")
    )


ORACLE_HOUR_PROFILE = f"""
WITH c AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type
      FROM c GROUP BY 1)
SELECT c.event_type, c.hour, c.n,
       {rat_round6_duck("c.n", "t.n_type")} AS share_r6
FROM c JOIN t USING (event_type)
ORDER BY event_type, hour
"""


def ts_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles over the event value stream — the canonical
    time-series downsample for dashboards and feature windows: per
    date, the first (open) and last (close) event's value plus the
    high/low, all in Class C BIGINT cents. First/last are defined by
    the exact (epoch-microsecond, event_id) total order — the same
    truncation DuckDB applies to the nano timestamps, so the endpoint
    choice cannot diverge.

    Plan: two row_number windows + the groupBy all key on the DATE —
    one shuffle, per-partition state bounded by a day's events."""
    ev = catalog.load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("dt"),
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
    )
    w_a = W.partitionBy("dt").orderBy("ts_us", "event_id")
    w_d = W.partitionBy("dt").orderBy(F.desc("ts_us"), F.desc("event_id"))
    x = ev.withColumn("rna", F.row_number().over(w_a)).withColumn(
        "rnd", F.row_number().over(w_d)
    )
    return (
        x.groupBy("dt")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max(F.when(F.col("rna") == 1, F.col("cents")))
            .cast("long")
            .alias("open_cents"),
            F.max("cents").cast("long").alias("high_cents"),
            F.min("cents").cast("long").alias("low_cents"),
            F.max(F.when(F.col("rnd") == 1, F.col("cents")))
            .cast("long")
            .alias("close_cents"),
        )
        .orderBy("dt")
    )


ORACLE_OHLC = """
WITH e AS (
  SELECT CAST(ts AS DATE) AS dt, event_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
r AS (
  SELECT dt, cents,
         ROW_NUMBER() OVER (PARTITION BY dt
                            ORDER BY ts_us, event_id) AS rna,
         ROW_NUMBER() OVER (PARTITION BY dt
                            ORDER BY ts_us DESC, event_id DESC) AS rnd
  FROM e)
SELECT dt,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(CASE WHEN rna = 1 THEN cents END) AS BIGINT) AS open_cents,
       CAST(MAX(cents) AS BIGINT) AS high_cents,
       CAST(MIN(cents) AS BIGINT) AS low_cents,
       CAST(MAX(CASE WHEN rnd = 1 THEN cents END) AS BIGINT) AS close_cents
FROM r GROUP BY dt ORDER BY dt
"""


BOLL_W = 7  # trailing window (days), excluding the current day
BOLL_K = 2  # breakout threshold in sigmas


def ev_bollinger_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout detection on the daily value series:
    a day breaks out when its cents sum sits more than {BOLL_K}σ from
    the trailing {BOLL_W}-day mean (prior days only — no lookahead).
    Emitted only for days with a full window.

    EXACT integer test — no sqrt, no float σ: with s = Σ_W cents and
    q = Σ_W cents², the condition |x − μ| > kσ cross-multiplies to
      (x·W − s)² > k²·(W·q − s²)
    (both sides BIGINT; W·q − s² = W²·Var ≥ 0). The sign of x·W − s
    splits up- vs down-breakouts. Magnitudes: daily sums ≤ ~3.3e7
    cents at sf0.1 → squares ≤ ~5.3e16 < 2^63.

    The trailing window runs over the DAILY frame — calendar-bounded
    (the stats_kendall_daily argument), ordered by date."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("dt")).agg(
        F.sum(
            F.expr("cast(floor(value * 100 + 0.5) as bigint)")
        ).alias("cents")
    )
    w7 = W.orderBy("dt").rowsBetween(-BOLL_W, -1)
    x = (
        daily.withColumn("n7", F.count("*").over(w7))
        .withColumn("s7", F.sum("cents").over(w7))
        .withColumn(
            "q7", F.sum(F.col("cents") * F.col("cents")).over(w7)
        )
        .filter(F.col("n7") == BOLL_W)
    )
    dev = F.col("cents") * BOLL_W - F.col("s7")
    var_w2 = F.lit(BOLL_W) * F.col("q7") - F.col("s7") * F.col("s7")
    return (
        x.select(
            "dt",
            "cents",
            F.col("s7").cast("long").alias("trail_sum"),
            F.when(
                (dev * dev > F.lit(BOLL_K * BOLL_K) * var_w2) & (dev > 0),
                1,
            )
            .when(
                (dev * dev > F.lit(BOLL_K * BOLL_K) * var_w2) & (dev < 0),
                -1,
            )
            .otherwise(0)
            .cast("int")
            .alias("breakout"),
        )
        .orderBy("dt")
    )


ORACLE_BOLLINGER = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS dt,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1),
x AS (
  SELECT dt, cents,
         COUNT(*) OVER w AS n7,
         CAST(SUM(cents) OVER w AS BIGINT) AS s7,
         CAST(SUM(cents * cents) OVER w AS BIGINT) AS q7
  FROM daily
  WINDOW w AS (ORDER BY dt ROWS BETWEEN {BOLL_W} PRECEDING
               AND 1 PRECEDING))
SELECT dt, cents, s7 AS trail_sum,
       CAST(CASE
         WHEN (cents * {BOLL_W} - s7) * (cents * {BOLL_W} - s7)
              > {BOLL_K * BOLL_K} * ({BOLL_W} * q7 - s7 * s7)
              AND cents * {BOLL_W} - s7 > 0 THEN 1
         WHEN (cents * {BOLL_W} - s7) * (cents * {BOLL_W} - s7)
              > {BOLL_K * BOLL_K} * ({BOLL_W} * q7 - s7 * s7)
              AND cents * {BOLL_W} - s7 < 0 THEN -1
         ELSE 0 END AS INT) AS breakout
FROM x WHERE n7 = {BOLL_W}
ORDER BY dt
"""


def ev_lifecycle_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (the DAU/WAU lifecycle ledger): every
    active (user, week) is NEW (first week ever), RETAINED (also active
    the immediately preceding week) or RESURRECTED (active before, but
    not last week); CHURNED-IN counts last week's actives who went
    silent this week. The identity n_active(w) = new + retained +
    resurrected and churned(w) = active(w−1) − retained(w) holds by
    construction — pinned in pytest.

    Plan: one distinct on (user, week), a per-user lag window (shuffles
    on user_id — high cardinality, scalable), one anti-join for churn,
    and a weeks-bounded rollup."""
    ev = catalog.load(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("wk"),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("wk")
    labeled = uw.withColumn("prev_wk", F.lag("wk").over(w)).withColumn(
        "status",
        F.when(F.col("prev_wk").isNull(), "new")
        .when(F.expr("date_add(prev_wk, 7) = wk"), "retained")
        .otherwise("resurrected"),
    )
    per_wk = labeled.groupBy("wk").agg(
        F.count("*").cast("long").alias("n_active"),
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("status") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    churn = (
        uw.select("user_id", F.expr("date_add(wk, 7)").alias("wk"))
        .join(uw, ["user_id", "wk"], "left_anti")
        .groupBy("wk")
        .agg(F.count("*").cast("long").alias("n_churned_in"))
    )
    return (
        per_wk.join(churn, "wk", "left")
        .select(
            "wk",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned_in", F.lit(0))
            .cast("long")
            .alias("n_churned_in"),
        )
        .orderBy("wk")
    )


ORACLE_LIFECYCLE = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events),
lab AS (
  SELECT user_id, wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
  FROM uw),
st AS (
  SELECT wk,
         CASE WHEN prev_wk IS NULL THEN 'new'
              WHEN prev_wk + 7 = wk THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM lab),
per_wk AS (
  SELECT wk,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_resurrected
  FROM st GROUP BY 1),
churn AS (
  SELECT a.wk + 7 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned_in
  FROM uw a
  WHERE NOT EXISTS (SELECT 1 FROM uw b
                    WHERE b.user_id = a.user_id AND b.wk = a.wk + 7)
  GROUP BY 1)
SELECT per_wk.wk, n_active, n_new, n_retained, n_resurrected,
       COALESCE(n_churned_in, 0) AS n_churned_in
FROM per_wk LEFT JOIN churn USING (wk)
ORDER BY wk
"""


def orders_pareto_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto/80-20) ledger: customers ranked by
    lifetime revenue (BIGINT cents) split into 10 equal-population
    deciles; per decile the revenue and the cumulative share — the
    curve a curation/monetization review reads "top 10% of customers
    carry X% of revenue" from. Deciles come from the exact rank
    ((rn−1)·10 div n + 1 — no NTILE remainder ambiguity).

    The rank window runs over the CUSTOMER dimension (orders pre-
    reduced to one row per customer — the rfm_segmentation argument);
    the cumulative window is decile-grained (10 rows)."""
    orders = catalog.load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
        ).alias("cents")
    )
    tot = per_cust.agg(
        F.count("*").cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    w = W.orderBy(F.desc("cents"), F.asc("o_custkey"))
    by_dec = (
        per_cust.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            F.expr("cast((rn - 1) * 10 div n_cust as int) + 1"),
        )
        .groupBy("decile", "total_cents")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("decile_cents"),
        )
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        by_dec.withColumn(
            "cum_cents", F.sum("decile_cents").over(wc).cast("long")
        )
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            "cum_cents",
            F.expr(rat_round6_spark("cum_cents", "total_cents")).alias(
                "cum_share_r6"
            ),
        )
        .orderBy("decile")
    )


ORACLE_PARETO = f"""
WITH pc AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(cents) AS BIGINT) AS total_cents FROM pc),
rk AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn
  FROM pc),
dec AS (
  SELECT CAST((rn - 1) * 10 // n_cust AS INT) + 1 AS decile,
         total_cents, cents
  FROM rk, tot),
bd AS (
  SELECT decile, total_cents,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS decile_cents
  FROM dec GROUP BY 1, 2)
SELECT decile, n_customers, decile_cents,
       CAST(SUM(decile_cents) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents,
       {rat_round6_duck(
           "CAST(SUM(decile_cents) OVER (ORDER BY decile ROWS BETWEEN "
           "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)",
           "total_cents")} AS cum_share_r6
FROM bd ORDER BY decile
"""


SESSION_PCTS = (50, 90, 99)


def ev_session_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (type-1) session-duration percentiles over the 30-minute
    sessionization — the latency-style readout (p50/p90/p99 dwell) that
    approximate percentile sketches get benchmarked against. The k-th
    percentile is the duration at rank ⌈p·n/100⌉ of the exact
    (duration, user, session) total order.

    No global window at corpus scale: the rank comes from the repo's
    bucketed-prefix machinery (``_bucketed_unique_rank``, bucket =
    bit_length of the duration — value-domain-bounded histogram,
    per-bucket row_number), the same pattern the Spearman/KS family
    uses."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = (
        ev.withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("is_new").over(run))
        .groupBy("user_id", "session_seq")
        .agg((F.max("ts_us") - F.min("ts_us")).alias("dur_us"))
    )
    ranked = _bucketed_unique_rank(
        spark,
        sess,
        "dur_us",
        ["user_id", "session_seq"],
        "cast(length(bin(dur_us + 1)) as int)",
    )
    n = sess.agg(F.count("*").cast("long").alias("n_sessions"))
    pcts = ranked.sparkSession.createDataFrame(
        [(p,) for p in SESSION_PCTS], "pct int"
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(pcts))
        .filter(
            F.col("rnk")
            == F.expr("(pct * n_sessions + 99) div 100")
        )
        .select(
            "pct",
            "n_sessions",
            F.col("dur_us").cast("long").alias("dur_us"),
        )
        .orderBy("pct")
    )


ORACLE_SESSION_PCTS = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
sess AS (
  SELECT user_id, session_seq,
         CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur_us
  FROM (
    SELECT user_id, ts_us,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM flagged)
  GROUP BY 1, 2),
rk AS (
  SELECT dur_us,
         ROW_NUMBER() OVER (ORDER BY dur_us, user_id, session_seq) AS rnk
  FROM sess),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions FROM sess),
p AS (SELECT unnest({list(SESSION_PCTS)}) AS pct)
SELECT CAST(p.pct AS INT) AS pct, n.n_sessions, rk.dur_us
FROM p, n, rk
WHERE rk.rnk = (p.pct * n.n_sessions + 99) // 100
ORDER BY pct
"""


def stats_kruskal_wallis_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kruskal-Wallis H across the event types, observations =
    daily value sums (BIGINT cents, Class C) per (date, event_type) —
    the k-group generalization of ``stats_mann_whitney_u``: does at
    least one event type's daily-value distribution sit above the
    others? Rank-based, so leverage-robust like the U test.

    Exactness: ranks are a permutation of 1..N (distinct-rank
    convention — the md5 of (date, type) decouples the tiebreak from
    the group, the repo's rank-stat convention), so no tie correction;
    H = 12·Σ R_j²/n_j / (N(N+1)) − 3(N+1) is carried as one integer
    fraction by clearing Σ/n_j with D = Π n_j:
      H = (12·Σ R_j²·(D/n_j) − 3(N+1)²·N·D) / (D·N·(N+1)),
    all BIGINT (N ≤ calendar·types, D ≤ 30^5 here), and the final 6dp
    half-up uses the quotient/remainder split (micro = q·10⁶ +
    ⌊(rem·2·10⁶ + den)/(2·den)⌋) because num·2·10⁶ alone would
    overflow. The group product folds collect_list multiplicatively —
    commutative, so aggregation order cannot change it.

    Scale: the ranked frame is DAILY × event-type — calendar-bounded
    (the stats_kendall_daily argument), so the global rank window is a
    justified bounded-input window; everything upstream is one
    map-side-combined groupBy over the fact stream."""
    ev = catalog.load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("ts").cast("date").alias("dt"), "event_type"
        )
        .agg(
            F.sum(
                F.expr("cast(floor(value * 100 + 0.5) as bigint)")
            ).alias("cents")
        )
        .localCheckpoint(eager=True)  # calendar-bounded; reused below
    )
    w = W.orderBy(
        "cents",
        F.expr("md5(concat(cast(dt as string), ':', event_type))"),
    )
    ranked = daily.withColumn("rnk", F.row_number().over(w))
    g = ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_j"),
        F.sum("rnk").cast("long").alias("r_j"),
    )
    d = g.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum("n_j").cast("long").alias("n_obs"),
        F.expr(
            "aggregate(collect_list(n_j), cast(1 as bigint),"
            " (a, x) -> a * x)"
        ).alias("dd"),
    )
    s = (
        g.crossJoin(F.broadcast(d))
        .select(
            "n_groups",
            "n_obs",
            "dd",
            F.expr("r_j * r_j * (dd div n_j)").alias("term"),
        )
        .groupBy("n_groups", "n_obs", "dd")
        .agg(F.sum("term").cast("long").alias("s_d"))
    )
    num = "12 * s_d - 3 * (n_obs + 1) * (n_obs + 1) * n_obs * dd"
    den = "dd * n_obs * (n_obs + 1)"
    micro = (
        f"((({num}) div ({den})) * 1000000"
        f" + ((({num}) % ({den})) * 2000000 + ({den})) div (2 * ({den})))"
    )
    return s.select(
        "n_obs",
        "n_groups",
        F.expr(f"cast({micro} as double) / 1000000.0").alias("h_r6"),
    )


ORACLE_KRUSKAL_WALLIS = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS dt, event_type,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type,
         ROW_NUMBER() OVER (
           ORDER BY cents,
                    md5(CAST(dt AS VARCHAR) || ':' || event_type)) AS rnk
  FROM daily),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_j,
         CAST(SUM(rnk) AS BIGINT) AS r_j
  FROM ranked GROUP BY 1),
d AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(n_j) AS BIGINT) AS n_obs,
         CAST(product(n_j) AS BIGINT) AS dd
  FROM g),
s AS (
  SELECT CAST(SUM(g.r_j * g.r_j * (d.dd // g.n_j)) AS BIGINT) AS s_d
  FROM g, d)
SELECT d.n_obs, d.n_groups,
       CAST(
         (((12 * s.s_d - 3 * (d.n_obs + 1) * (d.n_obs + 1) * d.n_obs * d.dd)
           // (d.dd * d.n_obs * (d.n_obs + 1))) * 1000000
          + (((12 * s.s_d
               - 3 * (d.n_obs + 1) * (d.n_obs + 1) * d.n_obs * d.dd)
              % (d.dd * d.n_obs * (d.n_obs + 1))) * 2000000
             + (d.dd * d.n_obs * (d.n_obs + 1)))
            // (2 * (d.dd * d.n_obs * (d.n_obs + 1))))
         AS DOUBLE) / 1000000.0 AS h_r6
FROM d, s
"""


def _daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order DATE with the order count and the Class C
    BIGINT-cents revenue sum — the shared daily series behind
    stats_kendall_daily, stats_runs_test and ts_downsample_lttb (one
    canonical quantization site; a cents/date-cast change propagates to
    all three and their oracles together)."""
    orders = catalog.load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderdate").cast("date").alias("dt")
    ).agg(
        F.count("*").alias("x"),
        F.sum(
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
        ).alias("cents"),
    )


def stats_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall tau-a between daily order COUNT and daily revenue
    (BIGINT cents, TIES.md Class C quantization) — does a busier day
    reliably mean a richer day? Tau sees only pairwise order
    agreement, so it is robust where Pearson is leverage-dominated.
    Tau-a (ties contribute zero, denominator n*(n-1)/2) keeps the
    statistic sqrt-free: concordant/discordant are plain integer
    counts and the one division is the signed exact-rational half-up
    of 2*(C-D) / (n*(n-1)).

    Scale: the pairwise stage is over DAILY aggregates — the day
    cardinality is CALENDAR-bounded (~2400 for the fixture span; still
    ~3650 for a 10-year feed at 100 TB), so the broadcast
    nested-loop pair join is a fixed ~n_days^2/2 = O(10^6-10^7)
    comparisons regardless of row scale; everything upstream is one
    map-side-combined groupBy on the date. localCheckpoint stops the
    self-join from re-scanning orders twice."""
    daily = (
        _daily_orders(spark, sf_dir)
        .withColumnRenamed("cents", "y")
        .localCheckpoint(eager=True)
    )
    a = daily.select(
        F.col("dt").alias("dt_a"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("dt").alias("dt_b"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    dprod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    stats = (
        a.join(F.broadcast(b), F.col("dt_a") < F.col("dt_b"))
        .agg(
            F.sum(F.when(dprod > 0, 1).otherwise(0)).cast("long")
            .alias("concordant"),
            F.sum(F.when(dprod < 0, 1).otherwise(0)).cast("long")
            .alias("discordant"),
        )
    )
    totals = daily.agg(F.count("*").cast("long").alias("n_days"))
    return stats.crossJoin(totals).select(
        "n_days",
        "concordant",
        "discordant",
        F.expr(
            rat_round6_signed_spark(
                "2 * (concordant - discordant)", "n_days * (n_days - 1)"
            )
        ).alias("tau_a_r6"),
    )


ORACLE_KENDALL_DAILY = f"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS dt, COUNT(*) AS x,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1),
p AS (
  SELECT CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant
  FROM d a JOIN d b ON a.dt < b.dt),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
SELECT n_days, concordant, discordant,
       {rat_round6_signed_duck(
           "2 * (concordant - discordant)", "n_days * (n_days - 1)"
       )} AS tau_a_r6
FROM p, t
"""


# --------------------------------------------------------------------------
# Fano over-dispersion of hourly event arrivals
# --------------------------------------------------------------------------

def ev_fano_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Fano factor (variance/mean of hourly arrival
    counts) — the over-dispersion screen that tells a Poisson-looking
    feed (Fano ~ 1) apart from a bursty one (Fano >> 1), which decides
    whether rate alerts can use Poisson thresholds. Sample variance
    over EVERY hour of the corpus span, including silent ones — and
    the zero-hour trick makes that free: zeros change neither S = sum c
    nor Q = sum c^2, only the hour count n, which is pure min/max
    arithmetic. No calendar spine is materialized at all.

    Fano = var/mean = (n*Q - S^2) / ((n-1)*S), every term an integer;
    the readout is DECIMAL(38,0)/HUGEINT so S^2 cannot overflow BIGINT
    at any feed volume, and the division is the exact-rational half-up
    (num >= 0 by Cauchy-Schwarz). Hour buckets are tz-free NTZ
    date_trunc on both engines.

    Scale: one (type, hour) map-side-combined groupBy, one per-type
    rollup (key space = type x hour, calendar x cardinality bounded),
    one broadcast 1-row span join."""
    ev = catalog.load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(F.count("*").alias("c"))
    )
    per_type = hourly.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("q"),
    )
    span = ev.agg(
        (
            F.expr(
                "timestampdiff(HOUR, date_trunc('hour', min(ts)),"
                " date_trunc('hour', max(ts)))"
            )
            + 1
        )
        .cast("long")
        .alias("n_hours")
    )
    dec = "cast({} as decimal(38,0))"
    n_d, s_d, q_d = dec.format("n_hours"), dec.format("s"), dec.format("q")
    return (
        per_type.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            "n_hours",
            F.col("s").alias("n_events"),
            F.expr(rat_round6_spark("s", "n_hours")).alias("mean_r6"),
            F.expr(
                rat_round6_spark(
                    f"{n_d} * {q_d} - {s_d} * {s_d}",
                    f"({n_d} - 1) * {s_d}",
                )
            ).alias("fano_r6"),
        )
        .orderBy("event_type")
    )


ORACLE_FANO = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
pt AS (
  SELECT event_type, CAST(SUM(c) AS HUGEINT) AS s,
         CAST(SUM(c * c) AS HUGEINT) AS q
  FROM hourly GROUP BY 1),
sp AS (
  SELECT CAST(date_diff('hour', date_trunc('hour', MIN(ts)),
                        date_trunc('hour', MAX(ts))) + 1 AS HUGEINT)
           AS n_hours
  FROM events)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
       CAST(s AS BIGINT) AS n_events,
       {rat_round6_duck("s", "n_hours")} AS mean_r6,
       {rat_round6_duck("n_hours * q - s * s", "(n_hours - 1) * s")}
         AS fano_r6
FROM pt, sp
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Log2-bucketed inter-event gap histogram
# --------------------------------------------------------------------------

def ev_gap_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type histogram of inter-event gaps (same user, same
    type) on a log2 scale — the latency/cadence profile an SLO monitor
    reads (each bucket b covers [2^b, 2^(b+1)) microseconds). The
    bucket is computed EXACTLY as the bit length of the integer gap
    (length of bin(gap)) — floor(log2()) in float is wrong exactly at
    the powers of two where the bucket boundaries sit; string-of-bits
    arithmetic has no such edge on either engine. Zero gaps (same
    timestamp) land in bucket -1.

    Scale: the lag window is partitioned by (user_id, event_type) — the
    per-key sequence a 1000-executor cluster shuffles naturally; the
    histogram key space is type x ~45 buckets. Share is the exact
    rational of per-bucket count over the type's gap total."""
    ev = catalog.load(spark, sf_dir, "events")
    um = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    w = W.partitionBy("user_id", "event_type").orderBy("um", "event_id")
    gaps = (
        ev.select("user_id", "event_type", "event_id", um.alias("um"))
        .withColumn("gap", F.col("um") - F.lag("um").over(w))
        .filter(F.col("gap").isNotNull())
        .withColumn(
            "bucket",
            F.when(F.col("gap") == 0, F.lit(-1)).otherwise(
                F.length(F.expr("bin(gap)")) - 1
            ).cast("int"),
        )
    )
    per_bucket = gaps.groupBy("event_type", "bucket").agg(
        F.count("*").cast("long").alias("n_gaps")
    )
    wt = W.partitionBy("event_type")
    return (
        per_bucket.withColumn("total", F.sum("n_gaps").over(wt))
        .select(
            "event_type",
            "bucket",
            "n_gaps",
            F.expr(rat_round6_spark("n_gaps", "total")).alias("share_r6"),
        )
        .orderBy("event_type", "bucket")
    )


ORACLE_GAP_LOG2 = f"""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts), event_id) AS gap
  FROM events),
b AS (
  SELECT event_type,
         CASE WHEN gap = 0 THEN -1
              ELSE CAST(LENGTH(bin(gap)) - 1 AS INT) END AS bucket
  FROM g WHERE gap IS NOT NULL),
pb AS (
  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps
  FROM b GROUP BY 1, 2),
tt AS (
  SELECT event_type, bucket, n_gaps,
         CAST(SUM(n_gaps) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM pb)
SELECT event_type, bucket, n_gaps,
       {rat_round6_duck("n_gaps", "total")} AS share_r6
FROM tt
ORDER BY event_type, bucket
"""


# --------------------------------------------------------------------------
# Monthly seasonal index of order flow
# --------------------------------------------------------------------------

def orders_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonal index of order count and revenue: each
    calendar month's share of the annual cycle, normalized so a flat
    business reads 1.0 everywhere (index = 12 * month_total / grand
    total) — the first artifact of a demand-seasonality review.
    Revenue is BIGINT cents (TIES.md Class C: floor(x*100 + 0.5), no
    engine decimal cast of o_totalprice); both indices are exact
    rationals in DECIMAL(38,0)/HUGEINT so grand-total products can
    never overflow.

    Scale: one 12-key map-side-combined groupBy + a broadcast 1-row
    totals join."""
    orders = catalog.load(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.month("o_orderdate").alias("month"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).cast("long").alias("revenue_cents"),
        )
    )
    totals = monthly.agg(
        F.sum("n_orders").cast("long").alias("tot_n"),
        F.sum("revenue_cents").cast("long").alias("tot_c"),
    )
    dec = "cast({} as decimal(38,0))"
    return (
        monthly.crossJoin(F.broadcast(totals))
        .select(
            "month",
            "n_orders",
            "revenue_cents",
            F.expr(
                rat_round6_spark(
                    f"12 * {dec.format('n_orders')}", dec.format("tot_n")
                )
            ).alias("count_index_r6"),
            F.expr(
                rat_round6_spark(
                    f"12 * {dec.format('revenue_cents')}", dec.format("tot_c")
                )
            ).alias("revenue_index_r6"),
        )
        .orderBy("month")
    )


ORACLE_SEASONAL_INDEX = f"""
WITH m AS (
  SELECT month(o_orderdate) AS month, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS HUGEINT) AS c
  FROM orders GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS HUGEINT) AS tn, CAST(SUM(c) AS HUGEINT) AS tc
      FROM m)
SELECT month, CAST(n AS BIGINT) AS n_orders,
       CAST(c AS BIGINT) AS revenue_cents,
       {rat_round6_duck("12 * n", "tn")} AS count_index_r6,
       {rat_round6_duck("12 * c", "tc")} AS revenue_index_r6
FROM m, t
ORDER BY month
"""


# --------------------------------------------------------------------------
# Categorical mix drift: monthly priority mix vs corpus mix (TV distance)
# --------------------------------------------------------------------------

def drift_priority_mix_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-month total-variation distance between that month's order
    PRIORITY mix and the whole-corpus mix — the categorical-drift
    monitor beside ``drift_psi_value``'s numeric PSI. TV is the right
    exact choice here: PSI needs log() (engine-libm dependent), while
    TV = 1/2 * sum_p |share_m(p) - share(p)| stays rational —
    cross-multiplied to the common denominator it is
    sum_p |c_mp * N - C_p * n_m| over 2 * n_m * N, every term an
    integer. Carried in DECIMAL(38,0)/HUGEINT (c*N products overflow
    BIGINT at ~10^10-row feeds). The (month, priority) grid is DENSIFIED
    before the fold — months x priorities cross join with
    COALESCE(c_mp, 0) — so a month missing a priority class still
    contributes its |0 - C_p * n_m| term and the statistic is true
    total variation, not a present-cells-only approximation (ADVICE r8).

    Scale: one (month, priority) groupBy (calendar x 5 keys), a
    broadcast cross join of two bounded side tables (calendar x 5 grid
    rows total), one broadcast left join; the per-month fold is over
    <=5 rows each."""
    orders = catalog.load(spark, sf_dir, "orders")
    ym = F.date_format("o_orderdate", "yyyy-MM").alias("ym")
    cell = orders.groupBy(ym, "o_orderpriority").agg(
        F.count("*").cast("long").alias("c_mp_raw")
    )
    per_month = orders.groupBy(ym).agg(
        F.count("*").cast("long").alias("n_m")
    )
    per_prio = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("c_p")
    )
    total = orders.agg(F.count("*").cast("long").alias("n_tot"))
    dec = "cast({} as decimal(38,0))"
    num_term = (
        f"abs({dec.format('c_mp')} * {dec.format('n_tot')}"
        f" - {dec.format('c_p')} * {dec.format('n_m')})"
    )
    grid = per_month.crossJoin(per_prio)  # both sides bounded (months x 5)
    return (
        grid.join(F.broadcast(cell), ["ym", "o_orderpriority"], "left")
        .withColumn("c_mp", F.coalesce(F.col("c_mp_raw"), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .groupBy("ym", "n_m")
        .agg(
            F.sum(F.expr(num_term)).alias("tv_num"),
            F.max(F.expr(dec.format("n_tot"))).alias("n_tot_d"),
        )
        .select(
            F.col("ym").alias("month"),
            F.col("n_m").alias("n_orders"),
            F.expr(
                rat_round6_spark(
                    "tv_num", f"2 * {dec.format('n_m')} * n_tot_d"
                )
            ).alias("tv_r6"),
        )
        .orderBy("month")
    )


ORACLE_PRIORITY_MIX_TV = f"""
WITH cell AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym, o_orderpriority,
         CAST(COUNT(*) AS HUGEINT) AS c_mp
  FROM orders GROUP BY 1, 2),
pm AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         CAST(COUNT(*) AS HUGEINT) AS n_m
  FROM orders GROUP BY 1),
pp AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS HUGEINT) AS c_p
  FROM orders GROUP BY 1),
t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_tot FROM orders),
s AS (
  SELECT pm.ym, pm.n_m,
         SUM(ABS(COALESCE(cell.c_mp, 0) * t.n_tot - pp.c_p * pm.n_m))
           AS tv_num,
         MAX(t.n_tot) AS n_tot
  FROM pm
  CROSS JOIN pp
  LEFT JOIN cell
    ON cell.ym = pm.ym AND cell.o_orderpriority = pp.o_orderpriority
  CROSS JOIN t
  GROUP BY pm.ym, pm.n_m)
SELECT ym AS month, CAST(n_m AS BIGINT) AS n_orders,
       {rat_round6_duck("tv_num", "2 * n_m * n_tot")} AS tv_r6
FROM s
ORDER BY month
"""


# --------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI of mean order value
# --------------------------------------------------------------------------

BOOT_B = 100  # bootstrap replicas
# Frozen floor(cdf_Poisson(1)(k) * 2^28) for k = 0..4: a 28-bit md5 hash
# compared against these INTEGER thresholds reproduces capped-Poisson(1)
# resampling weights identically on any engine — no float compare at all.
BOOT_THRESHOLDS = (98751885, 197503771, 246879713, 263338361, 267453023)
BOOT_SALT = "bs1"


def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval of the mean
    order value — the uncertainty band a metrics platform prints next
    to every point estimate. Classic bootstrap resamples n rows with
    replacement (un-distributable); the Poisson approximation gives
    each row an independent Poisson(1) replica weight — embarrassingly
    parallel — and determinism comes from the repo's md5 idiom
    (``stats_ab_test``): weight = #(frozen integer thresholds <= 28-bit
    md5(o_orderkey:replica:salt)), a capped-at-5 inverse-CDF lookup
    that is bit-identical on any engine. Money is BIGINT cents
    (Class C); each replica's weighted mean and the order statistics
    p05/p50/p95 over the B=100 replica means are exact rationals
    (DECIMAL(38,0) partial sums carry sum(w*cents) past any BIGINT
    cliff).

    The md5 is the whole CPU cost, so one digest feeds FOUR replicas:
    a 128-bit md5 yields four disjoint 28-bit lanes (hex chars 1-7,
    9-15, 17-23, 25-31), so a row hashes 25 times, not 100 — a 4x cut
    in the dominant stage, with each lane still an independent uniform
    28-bit draw. Scale: one x25 hash + x4 lane flat-map fan-out
    (repartitioned first — the one-file fixture scan would otherwise
    run the CPU-bound stage in a handful of tasks), one 100-key
    map-side-combined groupBy; the rank window runs over exactly B=100
    rows (constant-bounded — see GLOBAL_WINDOW_BOUNDED). Replica means
    tie-break by replica id, so the selected order statistics are
    deterministic."""
    orders = catalog.load(spark, sf_dir, "orders")
    wexpr = " + ".join(
        f"(case when h >= {t} then 1 else 0 end)" for t in BOOT_THRESHOLDS
    )
    n_map = max(spark.sparkContext.defaultParallelism, 16)
    rep_rows = (
        orders.select(
            "o_orderkey",
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
                "cents"
            ),
        )
        .repartition(n_map, "o_orderkey")
        .select(
            "o_orderkey",
            "cents",
            F.explode(
                F.sequence(F.lit(0), F.lit(BOOT_B // 4 - 1))
            ).alias("g"),
        )
        .withColumn(
            "m",
            F.expr(
                "md5(concat(cast(o_orderkey as string), ':', "
                f"cast(g as string), ':{BOOT_SALT}'))"
            ),
        )
        .select(
            "cents",
            "g",
            F.posexplode(
                F.array(
                    F.expr("substring(m, 1, 7)"),
                    F.expr("substring(m, 9, 7)"),
                    F.expr("substring(m, 17, 7)"),
                    F.expr("substring(m, 25, 7)"),
                )
            ).alias("lane", "hx"),
        )
        .withColumn("rep", F.col("g") * 4 + F.col("lane"))
        .withColumn("h", F.expr("cast(conv(hx, 16, 10) as bigint)"))
        .withColumn("w", F.expr(wexpr))
    )
    reps = (
        rep_rows.groupBy("rep")
        .agg(
            F.sum("w").cast("long").alias("sum_w"),
            F.sum(
                F.expr("cast(w as decimal(38,0)) * cast(cents as decimal(38,0))")
            ).alias("sum_wc_d"),
        )
        .select(
            "rep",
            F.expr(
                rat_round6_spark("sum_wc_d", "cast(sum_w as decimal(38,0))")
            ).alias("rep_mean_r6"),
        )
    )
    rw = W.orderBy("rep_mean_r6", "rep")
    ranked = reps.withColumn("rn", F.row_number().over(rw))
    point = orders.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(
            rat_round6_spark(
                "sum(cast(floor(o_totalprice * 100 + 0.5) as decimal(38,0)))",
                "cast(count(*) as decimal(38,0))",
            )
        ).alias("mean_cents_r6"),
    )
    picks = (
        ranked.filter(F.col("rn").isin(5, 50, 95))
        .groupBy()
        .pivot("rn", [5, 50, 95])
        .agg(F.first("rep_mean_r6"))
        .select(
            F.col("5").alias("boot_p05_r6"),
            F.col("50").alias("boot_p50_r6"),
            F.col("95").alias("boot_p95_r6"),
        )
    )
    return point.crossJoin(picks).select(
        "n_orders",
        F.lit(BOOT_B).cast("long").alias("b_replicas"),
        "mean_cents_r6",
        "boot_p05_r6",
        "boot_p50_r6",
        "boot_p95_r6",
    )


_BOOT_W = " + ".join(
    f"(CASE WHEN h >= {t} THEN 1 ELSE 0 END)" for t in BOOT_THRESHOLDS
)
ORACLE_BOOTSTRAP_CI = f"""
WITH rr AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(gg AS BIGINT) AS g,
         md5(CAST(o_orderkey AS VARCHAR) || ':' ||
             CAST(gg AS VARCHAR) || ':{BOOT_SALT}') AS m
  FROM orders, generate_series(0, {BOOT_B // 4 - 1}) gs(gg)),
hr AS (
  SELECT cents, g * 4 + lane AS rep,
         CAST(('0x' || SUBSTRING(m, 1 + 8 * lane, 7)) AS BIGINT) AS h
  FROM rr, (SELECT unnest([0, 1, 2, 3]) AS lane) lanes),
wr AS (
  SELECT rep, CAST({_BOOT_W} AS HUGEINT) AS w, cents FROM hr),
reps AS (
  SELECT rep, {rat_round6_duck("SUM(w * cents)", "SUM(w)")} AS rep_mean_r6
  FROM wr GROUP BY rep),
ranked AS (
  SELECT rep_mean_r6,
         row_number() OVER (ORDER BY rep_mean_r6, rep) AS rn
  FROM reps),
point AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         {rat_round6_duck(
             "CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))"
             " AS HUGEINT)",
             "CAST(COUNT(*) AS HUGEINT)",
         )} AS mean_cents_r6
  FROM orders)
SELECT p.n_orders, CAST({BOOT_B} AS BIGINT) AS b_replicas, p.mean_cents_r6,
       (SELECT rep_mean_r6 FROM ranked WHERE rn = 5) AS boot_p05_r6,
       (SELECT rep_mean_r6 FROM ranked WHERE rn = 50) AS boot_p50_r6,
       (SELECT rep_mean_r6 FROM ranked WHERE rn = 95) AS boot_p95_r6
FROM point p
"""


# --------------------------------------------------------------------------
# LTTB time-series downsampling (bucket-mean anchors — parallel variant)
# --------------------------------------------------------------------------

LTTB_K = 60  # interior buckets (output = K + 2 endpoint rows)


def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of the daily revenue
    series to {LTTB_K}+2 points — the standard viz-pipeline reducer
    (keep the point per bucket that subtends the largest triangle
    against its neighbor buckets, so peaks/valleys survive where
    averaging would flatten them). This is the BUCKET-MEAN-ANCHOR
    variant: canonical LTTB anchors the triangle on the previously
    SELECTED point (inherently sequential); anchoring on the previous
    bucket's mean instead makes every bucket's argmax independent —
    embarrassingly parallel, same qualitative selection (the variant
    used by parallel implementations in public viz literature).

    Exactness: x = day index (integer), y = BIGINT cents; the triangle
    area comparison is cross-multiplied by the anchor denominators so
    every compared quantity is an exact integer in DECIMAL(38,0)
    (~1e23 at a 10-year 100 TB feed — far past BIGINT, far under 38
    digits); argmax ties break to the earliest day.

    Bucket ids are DENSE-RANKED after the proportional assignment: for
    a series with ≥ {LTTB_K}+2 points the raw ids are already the
    contiguous 0..{LTTB_K}-1 (step ≤ 1), so the re-rank is the
    identity; for a SHORT series the raw ids skip values and the
    re-rank keeps every occupied bucket's prev/next anchor join total
    (an inner join on raw b±1 would silently drop every interior point
    — the r9 self-review finding). The last endpoint's bucket id is
    n_buckets (== {LTTB_K} in the normal case).

    Scale: one daily groupBy, one calendar-bounded index window, one
    ≤{LTTB_K}-key bucket aggregate broadcast back, one per-bucket
    argmax window (partitioned — parallel)."""
    daily = _daily_orders(spark, sf_dir).drop("x")
    wd = W.orderBy("dt")
    # the indexed daily frame fans out into SIX lineage branches
    # (interior/bsum/first/last/ends/scored) — checkpoint the
    # calendar-bounded series so orders is scanned ONCE, not per branch
    # (the stats_kendall_daily precedent; PLANS r8 lesson 1)
    idx = (
        daily.withColumn("idx", F.row_number().over(wd))
        .withColumn(
            "n", F.count("*").over(W.rowsBetween(W.unboundedPreceding,
                                                 W.unboundedFollowing))
        )
        .localCheckpoint(eager=True)
    )
    interior = (
        idx.filter((F.col("idx") >= 2) & (F.col("idx") <= F.col("n") - 1))
        .withColumn("braw", F.expr(f"((idx - 2) * {LTTB_K}) div (n - 2)"))
        # dense re-rank over the calendar-bounded series (identity when
        # n-2 >= LTTB_K); checkpointed: feeds bsum + scored + the
        # bucket-count broadcast
        .withColumn("b", F.dense_rank().over(W.orderBy("braw")) - 1)
        .localCheckpoint(eager=True)
    )
    # 1-row broadcast: the occupied-bucket count (== LTTB_K normally;
    # 0 for a 2-point series), the last endpoint's bucket id
    nbv = interior.agg(
        F.coalesce(F.max("b") + 1, F.lit(0)).alias("nbv")
    )
    bsum = interior.groupBy("b").agg(
        F.sum("idx").alias("sx"),
        F.sum(F.expr("cast(cents as decimal(38,0))")).alias("sy"),
        F.count("*").alias("nb"),
    )
    first = idx.filter(F.col("idx") == 1).select(
        F.lit(-1).alias("b"),
        F.col("idx").alias("sx"),
        F.expr("cast(cents as decimal(38,0))").alias("sy"),
        F.lit(1).alias("nb"),
    )
    last = (
        idx.filter(F.col("idx") == F.col("n"))
        .crossJoin(F.broadcast(nbv))
        .select(
            F.col("nbv").alias("b"),
            F.col("idx").alias("sx"),
            F.expr("cast(cents as decimal(38,0))").alias("sy"),
            F.lit(1).alias("nb"),
        )
    )
    anchors = bsum.unionByName(first).unionByName(last)
    prev = anchors.select(
        (F.col("b") + 1).alias("b"),
        F.col("sx").alias("psx"), F.col("sy").alias("psy"),
        F.col("nb").alias("pn"),
    )
    nxt = anchors.select(
        (F.col("b") - 1).alias("b"),
        F.col("sx").alias("nsx"), F.col("sy").alias("nsy"),
        F.col("nb").alias("nn"),
    )
    dec = "cast({} as decimal(38,0))"
    area2 = (
        f"abs({dec.format('psx')} * ({dec.format('cents')} * {dec.format('nn')} - nsy)"
        f" + {dec.format('idx')} * (nsy * {dec.format('pn')} - psy * {dec.format('nn')})"
        f" + {dec.format('nsx')} * (psy - {dec.format('cents')} * {dec.format('pn')}))"
    )
    scored = (
        interior.join(F.broadcast(prev), "b")
        .join(F.broadcast(nxt), "b")
        .withColumn("a2", F.expr(area2))
    )
    wb = W.partitionBy("b").orderBy(F.desc("a2"), F.asc("idx"))
    picked = (
        scored.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(F.col("b").cast("int").alias("bucket"), "dt", "cents")
    )
    ends = (
        idx.filter((F.col("idx") == 1) | (F.col("idx") == F.col("n")))
        .crossJoin(F.broadcast(nbv))
        .select(
            F.when(F.col("idx") == 1, F.lit(-1))
            .otherwise(F.col("nbv"))
            .cast("int")
            .alias("bucket"),
            "dt",
            "cents",
        )
    )
    return (
        picked.unionByName(ends)
        .select("bucket", "dt", F.col("cents").alias("revenue_cents"))
        .orderBy("bucket")
    )


ORACLE_LTTB = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS dt,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
idx AS (
  SELECT dt, cents, ROW_NUMBER() OVER (ORDER BY dt) AS idx,
         COUNT(*) OVER () AS n
  FROM daily),
interior AS (
  SELECT dt, cents, idx,
         DENSE_RANK() OVER (ORDER BY braw) - 1 AS b
  FROM (SELECT dt, cents, idx,
               ((idx - 2) * {LTTB_K}) // (n - 2) AS braw
        FROM idx WHERE idx >= 2 AND idx <= n - 1)),
nbv AS (SELECT COALESCE(MAX(b) + 1, 0) AS nb FROM interior),
bsum AS (
  SELECT b, CAST(SUM(idx) AS HUGEINT) AS sx,
         CAST(SUM(cents) AS HUGEINT) AS sy,
         CAST(COUNT(*) AS HUGEINT) AS nb
  FROM interior GROUP BY 1),
anchors AS (
  SELECT * FROM bsum
  UNION ALL
  SELECT -1, CAST(idx AS HUGEINT), CAST(cents AS HUGEINT), 1
  FROM idx WHERE idx = 1
  UNION ALL
  SELECT nb, CAST(idx AS HUGEINT), CAST(cents AS HUGEINT), 1
  FROM idx, nbv WHERE idx = n),
scored AS (
  SELECT i.b, i.dt, i.cents, i.idx,
         abs(p.sx * (i.cents * q.nb - q.sy)
             + i.idx * (q.sy * p.nb - p.sy * q.nb)
             + q.sx * (p.sy - i.cents * p.nb)) AS a2
  FROM interior i
  JOIN anchors p ON p.b = i.b - 1
  JOIN anchors q ON q.b = i.b + 1),
picked AS (
  SELECT CAST(b AS INT) AS bucket, dt, cents
  FROM (SELECT b, dt, cents,
               ROW_NUMBER() OVER (PARTITION BY b
                                  ORDER BY a2 DESC, idx) AS rk
        FROM scored)
  WHERE rk = 1),
ends AS (
  SELECT CASE WHEN idx = 1 THEN -1 ELSE nb END AS bucket, dt, cents
  FROM idx, nbv WHERE idx = 1 OR idx = n)
SELECT bucket, dt, cents AS revenue_cents
FROM (SELECT * FROM picked UNION ALL SELECT * FROM ends)
ORDER BY bucket
"""


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest (forecast-evaluation family)
# --------------------------------------------------------------------------

def orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster (predict month m with
    last year's month m) over monthly revenue — the baseline every
    demand-forecast evaluation starts from: if a model can't beat
    seasonal-naive, it isn't a model. Revenue is BIGINT cents (Class C)
    so the errors are exact integers, and the per-month absolute
    percentage error is the exact-rational half-up |e| / actual. Months
    without a prior-year counterpart are excluded (the backtest's
    warm-up year).

    Scale: one (year, month) groupBy (calendar-bounded), one self-join
    on the shifted year key — both sides are the monthly aggregate, so
    the join is bounded by the calendar no matter the feed size."""
    orders = catalog.load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    ).agg(
        F.sum(
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
        ).alias("cents")
    )
    prior = monthly.select(
        (F.col("y") + 1).alias("y"),
        F.col("m"),
        F.col("cents").alias("predicted_cents"),
    )
    return (
        monthly.join(prior, ["y", "m"])
        .select(
            F.expr("concat(y, '-', lpad(cast(m as string), 2, '0'))").alias(
                "month"
            ),
            F.col("cents").alias("actual_cents"),
            "predicted_cents",
            F.expr("abs(cents - predicted_cents)").alias("abs_err_cents"),
            # DECIMAL(38,0) carry: |e|*2e6 passes the BIGINT cliff at
            # ~sf16 monthly volumes while the HUGEINT oracle keeps going
            F.expr(
                "case when cents > 0 then "
                + rat_round6_spark(
                    "cast(abs(cents - predicted_cents) as decimal(38,0))",
                    "cast(cents as decimal(38,0))",
                )
                + " else null end"
            ).alias("ape_r6"),
        )
        .orderBy("month")
    )


ORACLE_SEASONAL_NAIVE = f"""
WITH monthly AS (
  SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2)
SELECT a.y || '-' || lpad(CAST(a.m AS VARCHAR), 2, '0') AS month,
       a.cents AS actual_cents,
       p.cents AS predicted_cents,
       abs(a.cents - p.cents) AS abs_err_cents,
       CASE WHEN a.cents > 0 THEN
         {rat_round6_duck(
             "CAST(abs(a.cents - p.cents) AS HUGEINT)",
             "CAST(a.cents AS HUGEINT)")}
       ELSE NULL END AS ape_r6
FROM monthly a JOIN monthly p ON p.y = a.y - 1 AND p.m = a.m
ORDER BY month
"""


# --------------------------------------------------------------------------
# Exact fulfilment-latency percentile bands (order grain)
# --------------------------------------------------------------------------

LAT_QS = (50, 90, 99)  # percentile bands


def orders_fulfillment_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of order fulfilment latency (days from order
    date to the LAST line shipment) per priority — the tail-latency
    readout next to ``orders_otif_rate``'s threshold rate and mean
    (means hide the p99 tail that breaches SLAs). Latency is an exact
    integer day difference; each band is the smallest latency whose
    cumulative order count reaches ceil(q·n/100) — the
    ``stats_equidepth_histogram`` selection machinery over the
    (priority, days) histogram, whose key space is bounded by the
    latency DOMAIN, not the order count.

    Scale: one lineitem→order aggregate (the OTIF shuffle), one
    bounded-histogram groupBy, one 3-target broadcast selection."""
    orders = catalog.load(spark, sf_dir, "orders")
    li = catalog.load(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
            )
        ).alias("last_ship_day")
    )
    oday = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
    )
    lat = (
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            "o_orderpriority",
            oday.alias("order_day"),
        )
        .join(close, "l_orderkey")
        .select(
            "o_orderpriority",
            (F.col("last_ship_day") - F.col("order_day")).alias("days"),
        )
    )
    hist = (
        lat.groupBy("o_orderpriority", "days")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # feeds cum + totals: one scan
    )
    wc = (
        W.partitionBy("o_orderpriority")
        .orderBy("days")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wc))
    tot = hist.groupBy("o_orderpriority").agg(
        F.sum("c").cast("long").alias("n")
    )
    qs = spark.createDataFrame([(q,) for q in LAT_QS], "q int")
    targets = tot.crossJoin(F.broadcast(qs)).withColumn(
        "rank_target", F.expr("(q * n + 99) div 100")  # ceil(q*n/100)
    )
    bands = (
        cum.join(targets, "o_orderpriority")
        .filter(F.col("cum") >= F.col("rank_target"))
        .groupBy("o_orderpriority", "n", "q")
        .agg(F.min("days").alias("band"))
    )
    return (
        bands.groupBy("o_orderpriority", "n")
        .pivot("q", list(LAT_QS))
        .agg(F.first("band"))
        .select(
            "o_orderpriority",
            F.col("n").alias("n_orders"),
            F.col("50").cast("long").alias("p50_days"),
            F.col("90").cast("long").alias("p90_days"),
            F.col("99").cast("long").alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_LATENCY_BANDS = f"""
WITH close AS (
  SELECT l_orderkey,
         MAX(epoch_us(l_shipdate) // 86400000000) AS last_ship_day
  FROM lineitem GROUP BY 1),
lat AS (
  SELECT o_orderpriority,
         last_ship_day - (epoch_us(o_orderdate) // 86400000000) AS days
  FROM orders JOIN close ON l_orderkey = o_orderkey),
hist AS (
  SELECT o_orderpriority, days, COUNT(*) AS c
  FROM lat GROUP BY 1, 2),
cum AS (
  SELECT o_orderpriority, days,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY days) AS cum
  FROM hist),
tot AS (
  SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS n
  FROM hist GROUP BY 1),
targets AS (
  SELECT o_orderpriority, n, q, (q * n + 99) // 100 AS rank_target
  FROM tot, (SELECT unnest([{", ".join(str(q) for q in LAT_QS)}]) AS q) qs),
bands AS (
  SELECT t.o_orderpriority, t.n, t.q, MIN(days) AS band
  FROM cum JOIN targets t
    ON cum.o_orderpriority = t.o_orderpriority
   AND cum.cum >= t.rank_target
  GROUP BY 1, 2, 3)
SELECT o_orderpriority, n AS n_orders,
       CAST(MAX(CASE WHEN q = 50 THEN band END) AS BIGINT) AS p50_days,
       CAST(MAX(CASE WHEN q = 90 THEN band END) AS BIGINT) AS p90_days,
       CAST(MAX(CASE WHEN q = 99 THEN band END) AS BIGINT) AS p99_days
FROM bands GROUP BY 1, 2 ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Exact equi-depth histogram boundaries (the ANALYZE-style stats primitive)
# --------------------------------------------------------------------------

EQD_K = 8  # buckets per group


def stats_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equi-depth histogram boundaries of order value per
    priority — the optimizer-statistics primitive (ANALYZE computes
    these approximately; this is the exact reference): boundary k is
    the smallest value whose cumulative count reaches ceil(k*n/{EQD_K}).
    Order value is quantized to BIGINT cents first (floor(x*100+0.5) is
    IEEE-exact on both engines even for the off-grid o_totalprice,
    TIES.md Class C), so boundaries are integers and the rank compare
    never touches a float.

    Scale: the heavy reduction is one (priority, cents) groupBy — the
    cumulative window then runs over the DISTINCT-value histogram, which
    is VALUE-DOMAIN-bounded (≤ price-range cents per priority), not
    row-bounded (GLOBAL_WINDOW_BOUNDED); the boundary selection is a
    broadcast of {EQD_K} rank targets against that bounded set."""
    orders = catalog.load(spark, sf_dir, "orders")
    # the histogram (value-domain-bounded) feeds both the cumulative
    # window and the totals — checkpoint so orders is scanned ONCE
    hist = (
        orders.select(
            "o_orderpriority",
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
                "cents"
            ),
        )
        .groupBy("o_orderpriority", "cents")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    wc = (
        W.partitionBy("o_orderpriority")
        .orderBy("cents")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wc))
    # totals derive from the histogram (sum of bucket counts) — no
    # second scan of the fact table (PLANS r8 lesson 1)
    tot = hist.groupBy("o_orderpriority").agg(
        F.sum("c").cast("long").alias("n")
    )
    ks = spark.range(1, EQD_K + 1).select(F.col("id").cast("int").alias("k"))
    targets = tot.crossJoin(F.broadcast(ks)).withColumn(
        "rank_target",
        F.expr(f"(k * n + {EQD_K - 1}) div {EQD_K}"),  # ceil(k*n/K)
    )
    return (
        cum.join(targets, "o_orderpriority")
        .filter(F.col("cum") >= F.col("rank_target"))
        .groupBy("o_orderpriority", "k", "n")
        .agg(F.min("cents").alias("boundary_cents"))
        .select(
            "o_orderpriority",
            "k",
            F.col("n").alias("n_orders"),
            "boundary_cents",
        )
        .orderBy("o_orderpriority", "k")
    )


ORACLE_EQUIDEPTH = f"""
WITH hist AS (
  SELECT o_orderpriority,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2),
cum AS (
  SELECT o_orderpriority, cents,
         SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY cents) AS cum
  FROM hist),
tot AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1),
targets AS (
  SELECT o_orderpriority, n, CAST(k AS INT) AS k,
         (k * n + {EQD_K - 1}) // {EQD_K} AS rank_target
  FROM tot, (SELECT unnest(range(1, {EQD_K + 1})) AS k) ks)
SELECT t.o_orderpriority, t.k, t.n AS n_orders,
       MIN(cents) AS boundary_cents
FROM cum JOIN targets t
  ON cum.o_orderpriority = t.o_orderpriority AND cum.cum >= t.rank_target
GROUP BY 1, 2, 3
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily revenue direction sequence
# --------------------------------------------------------------------------

def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test of randomness on the daily revenue
    DIRECTION sequence (up/down day-over-day moves, zero-changes
    dropped per the classic construction): too few runs means trending,
    too many means oscillation. The emitted pieces are all exact —
    counts are integers and the null moments are rationals
    (E[R] = 1 + 2*n1*n2/N; Var[R] = 2*n1*n2*(2*n1*n2 - N) /
    (N^2*(N-1))) carried in DECIMAL(38,0)/HUGEINT through the
    exact-rational half-up; the z-score's sqrt stays out of the checked
    surface (a consumer divides (R - E)/sqrt(Var) in one float step).

    Scale: the heavy stage is the daily groupBy (map-side combined);
    the direction/run windows run over the CALENDAR-bounded daily
    series (GLOBAL_WINDOW_BOUNDED — ~2.4k rows for the fixture span,
    ~3.7k for a 10-year feed)."""
    daily = _daily_orders(spark, sf_dir).drop("x")
    wd = W.orderBy("dt")
    signs = (
        daily.withColumn("prev", F.lag("cents").over(wd))
        .filter(F.col("prev").isNotNull() & (F.col("cents") != F.col("prev")))
        .withColumn(
            "sgn", F.when(F.col("cents") > F.col("prev"), 1).otherwise(-1)
        )
    )
    ws = W.orderBy("dt")
    runs = signs.withColumn("psgn", F.lag("sgn").over(ws)).agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("psgn").isNotNull()
                    & (F.col("sgn") != F.col("psgn")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("n_runs"),
    )
    dec = "cast({} as decimal(38,0))"
    n1, n2 = dec.format("n_up"), dec.format("n_down")
    nn = f"({n1} + {n2})"
    e_num = f"{nn} + 2 * {n1} * {n2}"  # E[R] = (N + 2 n1 n2) / N
    v_num = f"2 * {n1} * {n2} * (2 * {n1} * {n2} - {nn})"
    v_den = f"{nn} * {nn} * ({nn} - 1)"
    # degenerate guards (mirrored in the oracle): a single-sign series
    # (N = 1) zeroes the variance denominator N^2(N-1) — CASE
    # short-circuits, so the ANSI div never sees the zero; an empty
    # series propagates NULLs naturally
    return runs.select(
        "n_up",
        "n_down",
        "n_runs",
        F.expr(
            "case when n_up + n_down >= 1 then "
            + rat_round6_spark(e_num, nn)
            + " else null end"
        ).alias("expected_runs_r6"),
        F.expr(
            "case when n_up + n_down >= 2 then "
            + rat_round6_spark(v_num, v_den)
            + " else null end"
        ).alias("var_runs_r6"),
    )


ORACLE_RUNS_TEST = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS dt,
         CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
signs AS (
  SELECT dt, CASE WHEN cents > prev THEN 1 ELSE -1 END AS sgn
  FROM (SELECT dt, cents, LAG(cents) OVER (ORDER BY dt) AS prev FROM daily)
  WHERE prev IS NOT NULL AND cents <> prev),
r AS (
  SELECT CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
         CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS HUGEINT) AS n2,
         CAST(1 + SUM(CASE WHEN psgn IS NOT NULL AND sgn <> psgn
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
  FROM (SELECT sgn, LAG(sgn) OVER (ORDER BY dt) AS psgn FROM signs))
SELECT CAST(n1 AS BIGINT) AS n_up, CAST(n2 AS BIGINT) AS n_down, n_runs,
       CASE WHEN n1 + n2 >= 1 THEN
         {rat_round6_duck("(n1 + n2) + 2 * n1 * n2", "(n1 + n2)")}
       ELSE NULL END AS expected_runs_r6,
       CASE WHEN n1 + n2 >= 2 THEN
         {rat_round6_duck(
             "2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))",
             "(n1 + n2) * (n1 + n2) * ((n1 + n2) - 1)",
         )}
       ELSE NULL END AS var_runs_r6
FROM r
"""


# --------------------------------------------------------------------------
# Haar wavelet energy over the hourly event-count series
# --------------------------------------------------------------------------

HAAR_LEVELS = 5  # detail scales: 2h, 4h, 8h, 16h, 32h blocks


def ev_haar_energy_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-scale burst telemetry: Haar wavelet DETAIL ENERGY of the
    hourly event-count series at {HAAR_LEVELS} dyadic scales. Detail at
    level l, block i is d = (count of the block's first 2^(l−1) hours)
    − (count of its last 2^(l−1) hours); energy_l = Σ d² localizes
    WHERE the variance lives (level-1 energy = hour-to-hour jitter;
    level-5 = 32-hour regime shifts) — the spectral complement to the
    point-anomaly ops (ev_velocity_alerts, ev_cusum_changepoint).
    Counts are integers, so every coefficient and energy is exact;
    partial trailing blocks are excluded (only blocks fully inside the
    observed span count), and n_active_blocks counts blocks containing
    at least one event-bearing hour — fully-empty blocks have detail 0
    and contribute nothing to the energy, so they are not materialized
    (the hourly frame is sparse by design; at 100 TB a dense calendar
    spine would be pure overhead).

    Scale: the hourly count frame is span-bounded (not corpus-bounded);
    the level fan-out multiplies THAT small frame, and each level is
    one hash agg. The raw event pass is a single map + hour-grain
    count."""
    ev = catalog.load(spark, sf_dir, "events")
    hours = (
        ev.select(
            F.expr(
                "unix_micros(cast(date_trunc('hour', ts) as timestamp))"
            ).alias("hus")
        )
        .groupBy("hus")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # feeds the bounds agg + every level
    )
    bounds = hours.agg(
        F.min("hus").alias("h0"),
        (
            (F.max("hus") - F.min("hus")) / F.lit(3_600_000_000)
        ).cast("long").alias("hmax"),
    )
    lv = spark.createDataFrame(
        [(l,) for l in range(1, HAAR_LEVELS + 1)], "level int"
    )
    base = (
        hours.crossJoin(F.broadcast(bounds))
        .select(
            F.expr("cast((hus - h0) div 3600000000 as bigint)").alias("h"),
            "c",
            (F.col("hmax") + 1).alias("t_hours"),
        )
        .crossJoin(F.broadcast(lv))
        .select(
            "level",
            "c",
            "t_hours",
            F.expr("h div shiftleft(1, level)").alias("blk"),
            F.expr(
                "case when (h div shiftleft(1, level - 1)) % 2 = 0 "
                "then 1 else -1 end"
            ).alias("sign"),
        )
        .filter(F.col("blk") < F.expr("t_hours div shiftleft(1, level)"))
    )
    detail = base.groupBy("level", "blk").agg(
        F.sum(F.expr("sign * c")).alias("d")
    )
    return (
        detail.groupBy("level")
        .agg(
            F.count("*").cast("long").alias("n_active_blocks"),
            F.sum(F.expr("d * d")).cast("long").alias("energy"),
            F.max(F.abs("d")).cast("long").alias("max_abs_detail"),
        )
        .orderBy("level")
    )


ORACLE_HAAR_ENERGY = f"""
WITH hrs AS (
  SELECT epoch_us(date_trunc('hour', ts)) AS hus, COUNT(*) AS c
  FROM events GROUP BY 1),
b AS (SELECT MIN(hus) AS h0,
             (MAX(hus) - MIN(hus)) // 3600000000 + 1 AS t_hours
      FROM hrs),
lv AS (SELECT unnest(generate_series(1, {HAAR_LEVELS})) AS level),
base AS (
  SELECT lv.level, hrs.c, b.t_hours,
         ((hrs.hus - b.h0) // 3600000000) // (1 << lv.level) AS blk,
         CASE WHEN (((hrs.hus - b.h0) // 3600000000)
                    // (1 << (lv.level - 1))) % 2 = 0
              THEN 1 ELSE -1 END AS sign
  FROM hrs, b, lv
  WHERE ((hrs.hus - b.h0) // 3600000000) // (1 << lv.level)
        < b.t_hours // (1 << lv.level)),
detail AS (
  SELECT level, blk, CAST(SUM(sign * c) AS BIGINT) AS d
  FROM base GROUP BY 1, 2)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_active_blocks,
       CAST(SUM(d * d) AS BIGINT) AS energy,
       CAST(MAX(abs(d)) AS BIGINT) AS max_abs_detail
FROM detail GROUP BY level ORDER BY level
"""


# --------------------------------------------------------------------------
# Running-record accounting per user
# --------------------------------------------------------------------------

def ev_value_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking accounting per user: how many events set a new
    strict running MAXIMUM of ``value`` (in (ts, event_id) order), and
    when the last record fell — the \"personal best\" telemetry that
    flags accounts whose spend/engagement keeps escalating (records
    arriving late in the stream) versus plateaued ones (all records
    early). For an i.i.d. sequence the expected record count is
    harmonic (~ln n), so a materially higher count is itself an
    escalation signal.

    Scale: one user-partitioned running-max window (preceding frame)
    + one user rollup — no global window, no self-join."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
        "value",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = ev.withColumn("pm", F.max("value").over(w)).withColumn(
        "is_rec",
        F.when(
            F.col("pm").isNull() | (F.col("value") > F.col("pm")), 1
        ).otherwise(0),
    )
    return (
        r.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("is_rec").cast("long").alias("n_records"),
            F.max("value").alias("max_value"),
            F.max(
                F.when(F.col("is_rec") == 1, F.col("ts_us"))
            ).cast("long").alias("last_record_us"),
        )
        .orderBy("user_id")
    )


ORACLE_VALUE_RECORDS = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
r AS (
  SELECT user_id, ts_us, value,
         MAX(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM e)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN pm IS NULL OR value > pm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_records,
       MAX(value) AS max_value,
       CAST(MAX(CASE WHEN pm IS NULL OR value > pm THEN ts_us END)
            AS BIGINT) AS last_record_us
FROM r GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Exact per-hour value percentiles (tumbling-window latency readout)
# --------------------------------------------------------------------------

HOURLY_PCTS = (50, 95)


def ev_hourly_value_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact (type-1) p50/p95 of ``value`` per 1-hour tumbling window —
    the per-window latency/spend distribution readout that pairs with
    ``ev_tumbling_1h``'s count/sum (a mean hides the tail; the p95
    column is what an SLO monitor actually pages on). The k-th
    percentile is the value at rank ⌈p·n/100⌉ of the window's exact
    (value, event_id) order — reproducible on both engines, unlike
    interpolated quantiles of doubles.

    Scale: ranks come from an HOUR-partitioned window (each partition
    is one hour of events, never the corpus) + a window-bounded rank
    filter; this is the batch twin of a sliding-state streaming
    percentile."""
    ev = catalog.load(spark, sf_dir, "events").select(
        F.expr(
            "cast(date_trunc('hour', ts) as timestamp)"
        ).alias("win_start"),
        "event_id",
        "value",
    )
    w = W.partitionBy("win_start").orderBy("value", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(W.partitionBy("win_start"))
    )
    pcts = spark.createDataFrame([(p,) for p in HOURLY_PCTS], "pct int")
    return (
        ranked.crossJoin(F.broadcast(pcts))
        .filter(F.col("rn") == F.expr("(pct * n + 99) div 100"))
        .select(
            "win_start",
            "pct",
            F.col("n").cast("long").alias("n_events"),
            F.col("value").alias("pct_value"),
        )
        .orderBy("win_start", "pct")
    )


ORACLE_HOURLY_PCTS = f"""
WITH e AS (
  SELECT date_trunc('hour', ts) AS win_start, event_id, value
  FROM events),
r AS (
  SELECT win_start, value,
         ROW_NUMBER() OVER (PARTITION BY win_start
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY win_start) AS n
  FROM e),
p AS (SELECT unnest(ARRAY{list(HOURLY_PCTS)}) AS pct)
SELECT win_start, CAST(pct AS INT) AS pct,
       CAST(n AS BIGINT) AS n_events, value AS pct_value
FROM r, p
WHERE rn = (pct * n + 99) // 100
ORDER BY win_start, pct
"""


# --------------------------------------------------------------------------
# Second-order Markov transitions (sequence-memory test)
# --------------------------------------------------------------------------

def ev_markov_order2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND-order Markov transitions over per-user event sequences —
    P(next | prev2, prev1), the memory test for the first-order model
    in ``ev_markov_transitions``: if the order-2 conditionals match the
    order-1 rows the chain is memoryless and the cheaper model
    suffices; where they diverge, sequences carry real 2-step structure
    (or bot loops). Also emits the order-1 conditional for the same
    (prev1, next) pair so the divergence is readable per row without a
    join.

    Scale: one user-keyed sequence window (two LAGs + a LEAD), then a
    |types|³-bounded matrix agg; the normalizing windows run on that
    bounded matrix."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.withColumn("prev2", F.lag("event_type", 1).over(w))
        .withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("prev2").isNotNull() & F.col("nxt").isNotNull())
        .select(
            F.col("prev2").alias("prev2_type"),
            F.col("event_type").alias("prev1_type"),
            F.col("nxt").alias("next_type"),
        )
    )
    tr = seq.groupBy("prev2_type", "prev1_type", "next_type").agg(
        F.count("*").alias("n")
    )
    return tr.select(
        "prev2_type",
        "prev1_type",
        "next_type",
        F.col("n").cast("long").alias("n_trans"),
        F.expr(
            rat_round6_spark(
                "n",
                "sum(n) over (partition by prev2_type, prev1_type)",
            )
        ).alias("p_order2"),
        F.expr(
            rat_round6_spark(
                "sum(n) over (partition by prev1_type, next_type)",
                "sum(n) over (partition by prev1_type)",
            )
        ).alias("p_order1"),
    ).orderBy("prev2_type", "prev1_type", "next_type")


ORACLE_MARKOV_ORDER2 = f"""
WITH seq AS (
  SELECT user_id,
         LAG(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev2_type,
         event_type AS prev1_type,
         LEAD(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events),
tr AS (
  SELECT prev2_type, prev1_type, next_type, COUNT(*) AS n
  FROM seq
  WHERE prev2_type IS NOT NULL AND next_type IS NOT NULL
  GROUP BY 1, 2, 3)
SELECT prev2_type, prev1_type, next_type,
       CAST(n AS BIGINT) AS n_trans,
       {rat_round6_duck(
           "n",
           "SUM(n) OVER (PARTITION BY prev2_type, prev1_type)")}
         AS p_order2,
       {rat_round6_duck(
           "SUM(n) OVER (PARTITION BY prev1_type, next_type)",
           "SUM(n) OVER (PARTITION BY prev1_type)")} AS p_order1
FROM tr
ORDER BY prev2_type, prev1_type, next_type
"""


# --------------------------------------------------------------------------
# Per-user hour-of-day concentration (diurnal regularity)
# --------------------------------------------------------------------------

def ev_user_hour_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user DIURNAL concentration: the Simpson collision index of
    the user's events over the 24 hour-of-day bins — the probability
    two of their events fall in the same hour bin. A human's activity
    concentrates (index >> 1/24); a crawler or credential-stuffing bot
    spreads flat (≈ 1/24) — the integer-exact regularity screen next
    to ev_hour_of_day_profile's population-grain profile. Emits the
    modal hour and its share for the drill-down.

    Scale: one (user × 24)-bounded count agg + one user rollup; ties
    on the modal hour break to the earliest hour via min(struct)."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", F.hour("ts").alias("hod")
    )
    c = ev.groupBy("user_id", "hod").agg(F.count("*").alias("c"))
    return (
        c.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count("*").alias("hours_active"),
            F.sum(F.expr("c * (c - 1)")).alias("coll"),
            F.max(F.struct("c", F.expr("-hod").alias("nh"))).alias("top"),
        )
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("hours_active").cast("long").alias("hours_active"),
            F.expr("cast(-top.nh as int)").alias("top_hour"),
            F.expr(
                "case when n_events >= 2 then "
                + rat_round6_spark("coll", "n_events * (n_events - 1)")
                + " else 0.0d end"
            ).alias("concentration_r6"),
            F.expr(rat_round6_spark("top.c", "n_events")).alias(
                "top_hour_share_r6"
            ),
        )
        .orderBy("user_id")
    )


ORACLE_USER_HOUR_CONCENTRATION = f"""
WITH c AS (
  SELECT user_id, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
g AS (
  SELECT user_id,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS hours_active,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS coll,
         CAST(MAX(c * 100 - hod) AS BIGINT) AS topcode
  FROM c GROUP BY 1)
SELECT user_id, n_events, hours_active,
       CAST((100 - topcode % 100) % 100 AS INT) AS top_hour,
       CASE WHEN n_events >= 2 THEN
         {rat_round6_duck("coll", "n_events * (n_events - 1)")}
       ELSE 0.0 END AS concentration_r6,
       {rat_round6_duck("(topcode + ((100 - topcode % 100) % 100)) // 100",
                        "n_events")} AS top_hour_share_r6
FROM g ORDER BY user_id
"""


# --------------------------------------------------------------------------
# md5 randomization (permutation) test for a rate difference
# --------------------------------------------------------------------------

PERM_B = 64  # label-flip replicas
PERM_VALUE_CUT = 150.0  # success = value > cut (the non-degenerate split)


def stats_permutation_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the high-value rate difference between
    'click' and 'view' events — the distribution-free sibling of
    stats_ab_test (no normal approximation: the null is materialized
    by {PERM_B} md5-derived label-flip replicas, the
    stats_bootstrap_ci construct). Every replica's rate difference is
    compared to the observed one EXACTLY via cross-multiplied
    integers (|x1·m2 − x2·m1| scaled by the opposite denominators), so
    the p-value is a pure count ratio — no float ever enters the
    decision. The emitted p is (1 + #extreme) / (1 + B), the standard
    add-one permutation estimate.

    Scale: one corpus pass fans out to {PERM_B} replicas of a 2-cell
    partial agg (map-side combined, replica-bounded exchange); the
    observed cells ride the same pass (replica 0 = identity)."""
    # load_par: the replica fan-out evaluates ~events×(B+1) md5s in the map
    # stage — on a sub-split scan that is ONE task (r14 optimization round);
    # no-op at real scale.
    ev = (
        catalog.load_par(spark, sf_dir, "events", "event_id")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_id",
            (F.col("event_type") == "click").alias("is_click"),
            (F.col("value") > PERM_VALUE_CUT).alias("hi"),
        )
    )
    rep = ev.select(
        "event_id",
        "is_click",
        "hi",
        F.explode(F.expr(f"sequence(0, {PERM_B})")).alias("b"),
    ).select(
        "b",
        "hi",
        # b = 0 is the identity (observed) labeling; b >= 1 flips the
        # label when the md5 low bit fires — the randomization null
        F.when(
            (F.col("b") == 0)
            | (
                F.expr(
                    "cast(conv(substring(md5(concat(cast(event_id as "
                    "string), ':perm:', cast(b as string))), 1, 7), 16, "
                    "10) as bigint) % 2"
                )
                == 0
            ),
            F.col("is_click"),
        )
        .otherwise(~F.col("is_click"))
        .alias("lbl"),
    )
    cells = rep.groupBy("b").agg(
        F.sum(F.when(F.col("lbl") & F.col("hi"), 1).otherwise(0))
        .alias("x1"),
        F.sum(F.when(F.col("lbl"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("lbl") & F.col("hi"), 1).otherwise(0))
        .alias("x2"),
        F.sum(F.when(~F.col("lbl"), 1).otherwise(0)).alias("n2"),
    ).localCheckpoint(eager=True)  # (B+1)-row frame; feeds obs + replicas
    obs = cells.filter(F.col("b") == 0).select(
        F.col("x1").alias("ox1"),
        F.col("n1").alias("on1"),
        F.col("x2").alias("ox2"),
        F.col("n2").alias("on2"),
    )
    comp = (
        cells.filter(F.col("b") >= 1)
        .crossJoin(F.broadcast(obs))
        .select(
            F.expr(
                "case when abs(x1 * n2 - x2 * n1) * (on1 * on2)"
                " >= abs(ox1 * on2 - ox2 * on1) * (n1 * n2)"
                " then 1 else 0 end"
            ).alias("extreme")
        )
        .agg(F.sum("extreme").alias("n_extreme"))
    )
    return (
        obs.crossJoin(comp)
        .select(
            F.col("ox1").cast("long").alias("click_hi"),
            F.col("on1").cast("long").alias("n_click"),
            F.col("ox2").cast("long").alias("view_hi"),
            F.col("on2").cast("long").alias("n_view"),
            F.expr(
                rat_round6_signed_spark(
                    "ox1 * on2 - ox2 * on1", "on1 * on2"
                )
            ).alias("rate_diff_r6"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            F.lit(PERM_B).cast("long").alias("n_replicas"),
            F.expr(
                rat_round6_spark("1 + n_extreme", f"1 + {PERM_B}")
            ).alias("p_value_r6"),
        )
    )


ORACLE_PERMUTATION_DIFF = f"""
WITH ev AS (
  SELECT event_id, event_type = 'click' AS is_click,
         value > {PERM_VALUE_CUT} AS hi
  FROM events WHERE event_type IN ('click', 'view')),
rep AS (
  SELECT b, hi,
         CASE WHEN b = 0 OR
              CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)
                || ':perm:' || CAST(b AS VARCHAR)), 1, 7)) AS BIGINT)
                % 2 = 0
              THEN is_click ELSE NOT is_click END AS lbl
  FROM ev, LATERAL unnest(generate_series(0, {PERM_B})) AS u(b)),
cells AS (
  SELECT b,
         CAST(SUM(CASE WHEN lbl AND hi THEN 1 ELSE 0 END) AS BIGINT)
           AS x1,
         CAST(SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN (NOT lbl) AND hi THEN 1 ELSE 0 END)
              AS BIGINT) AS x2,
         CAST(SUM(CASE WHEN NOT lbl THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM rep GROUP BY 1),
obs AS (SELECT x1 AS ox1, n1 AS on1, x2 AS ox2, n2 AS on2
        FROM cells WHERE b = 0),
comp AS (
  SELECT CAST(SUM(CASE WHEN abs(x1 * n2 - x2 * n1) * (on1 * on2)
                            >= abs(ox1 * on2 - ox2 * on1) * (n1 * n2)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM cells, obs WHERE b >= 1)
SELECT ox1 AS click_hi, on1 AS n_click, ox2 AS view_hi, on2 AS n_view,
       {rat_round6_signed_duck("ox1 * on2 - ox2 * on1", "on1 * on2")}
         AS rate_diff_r6,
       n_extreme, CAST({PERM_B} AS BIGINT) AS n_replicas,
       {rat_round6_duck("1 + n_extreme", f"1 + {PERM_B}")} AS p_value_r6
FROM obs, comp
"""


SPECS = [
    QuerySpec("ev_markov_order2", ev_markov_order2,
              ORACLE_MARKOV_ORDER2, ("events", "window", "stats"),
              doc="second-order Markov transitions with the order-1 "
                  "conditional inline (sequence-memory test)"),
    QuerySpec("ev_user_hour_concentration", ev_user_hour_concentration,
              ORACLE_USER_HOUR_CONCENTRATION, ("events", "stats"),
              doc="per-user diurnal Simpson concentration + modal hour "
                  "(bot-vs-human regularity screen)"),
    QuerySpec("stats_permutation_diff", stats_permutation_diff,
              ORACLE_PERMUTATION_DIFF, ("stats", "events"),
              doc="md5 randomization test for the click-vs-view "
                  "high-value rate gap (exact cross-multiplied "
                  "comparisons, add-one p)"),
    QuerySpec("ev_haar_energy_hourly", ev_haar_energy_hourly,
              ORACLE_HAAR_ENERGY, ("events", "stats", "wavelet"),
              doc="Haar detail energy of the hourly count series at 5 "
                  "dyadic scales (integer multi-scale burst telemetry)"),
    QuerySpec("ev_value_records", ev_value_records,
              ORACLE_VALUE_RECORDS, ("events", "window", "stats"),
              doc="strict running-max record accounting per user "
                  "(escalation telemetry; preceding-frame window)"),
    QuerySpec("ev_hourly_value_percentiles", ev_hourly_value_percentiles,
              ORACLE_HOURLY_PCTS, ("events", "window", "percentile"),
              doc="exact type-1 p50/p95 of value per 1h tumbling window "
                  "(rank-at-ceil, hour-partitioned)"),
    # not in the headline bench set: BENCH_r{N} totals stay comparable
    # round-over-round only if the query set is frozen (r1 = 14 queries)
    QuerySpec("join_asof", join_asof, ORACLE_ASOF,
              ("join", "temporal"),
              doc="as-of join via union-tag + windowed last-carry"),
    QuerySpec("window_range_1h", window_range_1h, ORACLE_RANGE_1H,
              ("window", "temporal")),
    QuerySpec("ev_funnel_stages", ev_funnel_stages, ORACLE_FUNNEL,
              ("temporal", "agg"),
              doc="ordered funnel: signup → click-after → purchase-after"),
    QuerySpec("ev_sessionize_batch", ev_sessionize_batch, ORACLE_SESSIONIZE,
              ("temporal", "window"),
              doc="gaps-and-islands batch sessionization (30-min gap)"),
    QuerySpec("ev_scd2_user_status", ev_scd2_user_status, ORACLE_SCD2,
              ("temporal", "window"),
              doc="SCD type-2 validity intervals from a change stream"),
    QuerySpec("ev_retention_cohorts", ev_retention_cohorts, ORACLE_RETENTION,
              ("temporal", "agg"),
              doc="weekly retention-cohort triangle"),
    QuerySpec("ev_cdc_latest_snapshot", ev_cdc_latest_snapshot, ORACLE_CDC,
              ("temporal", "cdc", "window"),
              doc="CDC upsert+tombstone merge into the current snapshot"),
    QuerySpec("ev_time_to_convert", ev_time_to_convert,
              ORACLE_TIME_TO_CONVERT, ("temporal", "funnel", "percentile"),
              doc="signup→purchase conversion latency percentiles per "
                  "cohort week"),
    QuerySpec("join_asof_nearest", join_asof_nearest, ORACLE_ASOF_NEAREST,
              ("join", "temporal", "asof"),
              doc="nearest-in-time as-of join (backward+forward carry, "
                  "nearer-of-two pick)"),
    QuerySpec("ev_markov_transitions", ev_markov_transitions, ORACLE_MARKOV,
              ("temporal", "window", "sequence"),
              doc="first-order Markov transition matrix over per-user "
                  "event sequences"),
    QuerySpec("ev_cumulative_unique_users", ev_cumulative_unique_users,
              ORACLE_CUM_USERS, ("temporal", "window", "growth"),
              doc="daily active/new/cumulative-unique users (running sum "
                  "of first-seen counts, calendar-bounded window)"),
    QuerySpec("ev_velocity_alerts", ev_velocity_alerts, ORACLE_VELOCITY,
              ("temporal", "window", "monitoring"),
              doc="rate-spike alerting: 5-min vs trailing-hour RANGE "
                  "frames, cross-multiplied burst predicate"),
    QuerySpec("seg_overlap_users", seg_overlap_users, ORACLE_SEG_OVERLAP,
              ("temporal", "audience", "setop"),
              doc="audience-overlap matrix: exact intersection/union/"
                  "jaccard of event-type user sets"),
    QuerySpec("ev_pmi_cooccur", ev_pmi_cooccur, ORACLE_PMI,
              ("temporal", "stats", "association"),
              doc="PMI of event-type co-occurrence within (user, hour) "
                  "contexts"),
    QuerySpec("ev_gap_detection", ev_gap_detection, ORACLE_GAP,
              ("temporal", "monitoring", "sre"),
              doc="largest silent gap per user incl. tail-to-window-end "
                  "(dead-sensor screen)"),
    QuerySpec("keyset_pagination", keyset_pagination, ORACLE_KEYSET,
              ("scan", "pagination", "dba"),
              doc="keyset (cursor) pagination page — pushdown predicate "
                  "+ TakeOrderedAndProject, no OFFSET scan"),
    QuerySpec("stats_regression_trend", stats_regression_trend, ORACLE_REGR,
              ("stats", "regression"),
              doc="per-type OLS time trend via regr_slope/intercept/r2 "
                  "moment aggregates"),
    QuerySpec("stats_wilson_interval", stats_wilson_interval, ORACLE_WILSON,
              ("stats", "inference"),
              doc="per-type high-value rate with Wilson-score 95% CI"),
    QuerySpec("drift_psi_value", drift_psi_value, ORACLE_PSI,
              ("stats", "drift", "monitoring"),
              doc="PSI distribution drift between time halves (exact "
                  "A-decile reference bins, eps-smoothed)"),
    QuerySpec("ev_autocorrelation", ev_autocorrelation, ORACLE_AUTOCORR,
              ("temporal", "timeseries", "stats"),
              doc="lag-k autocorrelation of the zero-filled hourly count "
                  "series (seasonality/burstiness screen)"),
    QuerySpec("window_median_range", window_median_range,
              ORACLE_MEDIAN_RANGE, ("temporal", "window", "percentile"),
              doc="exact rolling median over a 1-hour RANGE frame "
                  "(holistic window agg Spark lacks, via range self-join)"),
    QuerySpec("orders_open_concurrency", orders_open_concurrency,
              ORACLE_OPEN_CONCURRENCY, ("temporal", "interval", "window"),
              doc="concurrently-open-orders step function via the "
                  "boundary-event rewrite (2 rows per interval, "
                  "calendar-bounded running sum — no day×interval join)"),
    QuerySpec("ts_interpolate_linear", ts_interpolate_linear,
              ORACLE_INTERP, ("temporal", "timeseries", "resample"),
              doc="hourly linear-interpolation resample between "
                  "bracketing observations (gap-capped pair fan-out, "
                  "LOCF's continuous sibling)"),
    QuerySpec("ev_twap", ev_twap, ORACLE_TWAP,
              ("temporal", "timeseries", "agg"),
              doc="per-user time-weighted average (LOCF-weighted TWAP, "
                  "sampling-rate invariant; IEEE contributions summed "
                  "in exact decimal)"),
    QuerySpec("ev_seasonal_anomaly", ev_seasonal_anomaly, ORACLE_SEASONAL,
              ("temporal", "monitoring", "stats"),
              doc="hour-of-week 1.5-sigma anomaly screen on the "
                  "zero-filled hourly series (integer cross-multiplied "
                  "predicate, 168-row broadcast baseline)"),
    QuerySpec("ev_top_paths", ev_top_paths, ORACLE_TOP_PATHS,
              ("temporal", "sequence", "topk"),
              doc="top-10 first-three-event journeys (LEAD-paired "
                  "triples, one user-keyed shuffle, deterministic "
                  "top-K cut)"),
    QuerySpec("ev_user_feature_snapshot", ev_user_feature_snapshot,
              ORACLE_FEATURE_SNAPSHOT, ("temporal", "features", "ml"),
              doc="per-user ML feature vector incl. type-mix entropy "
                  "(9dp-rounded ln contributions in exact decimal)"),
    QuerySpec("orders_cohort_ltv", orders_cohort_ltv, ORACLE_COHORT_LTV,
              ("temporal", "cohort", "finance"),
              doc="monthly-cohort LTV triangle (integer month axis, "
                  "exact-decimal cumulative revenue over the "
                  "calendar-squared triangle)"),
    QuerySpec("ev_ewma_filter", ev_ewma_filter, ORACLE_EWMA,
              ("temporal", "timeseries", "window"),
              doc="truncated 16-tap EWMA smoother as one codegen window "
                  "pass (literal weight ladder, 12dp decimal-summed "
                  "taps, renormalized early rows)"),
    QuerySpec("ev_rolling_distinct_users", ev_rolling_distinct_users,
              ORACLE_ROLLING_DISTINCT, ("temporal", "window", "distinct"),
              doc="rolling 30-day distinct users via disjoint coverage "
                  "intervals (2 boundary rows per user-day, calendar "
                  "running sum) == brute-force range-join oracle"),
    QuerySpec("ev_transition_entropy", ev_transition_entropy,
              ORACLE_TRANSITION_ENTROPY,
              ("temporal", "sequence", "stats"),
              doc="next-event entropy + top successor per state "
                  "(predictability diagnostic over the Markov matrix)"),
    QuerySpec("ev_attribution_credit", ev_attribution_credit,
              ORACLE_ATTRIBUTION, ("temporal", "attribution", "join"),
              doc="last-touch + linear multi-touch conversion "
                  "attribution from one user-keyed range join "
                  "(1/k credits 9dp-rounded, decimal-summed)"),
    QuerySpec("ev_stickiness_dau_mau", ev_stickiness_dau_mau,
              ORACLE_STICKINESS, ("temporal", "window", "engagement"),
              doc="DAU/MAU stickiness per day (exact daily distinct + "
                  "the shared coverage-interval rolling-30 core)"),
    QuerySpec("ev_engagement_concentration", ev_engagement_concentration,
              ORACLE_ENGAGEMENT, ("temporal", "engagement", "pareto"),
              doc="event volume by user-activity decile with cumulative "
                  "shares (the 80/20 whale-vs-community read, "
                  "dimension-bounded NTILE)"),
    QuerySpec("stats_anova_price_brand", stats_anova_price_brand,
              ORACLE_ANOVA, ("stats", "agg", "anova"),
              doc="one-way price-by-brand variance decomposition "
                  "(exact-decimal moments, order-independent decimal "
                  "term reduction, F and eta-squared)"),
    QuerySpec("scd2_as_of_lookup", scd2_as_of_lookup, ORACLE_SCD2_ASOF,
              ("temporal", "scd2", "asof"),
              doc="point-in-time state lookup at the corpus midpoint "
                  "(the query half of the SCD2 pattern - one filtered "
                  "per-user window, no dimension range join)"),
    QuerySpec("supplier_scorecard", supplier_scorecard,
              ORACLE_SUPPLIER_SCORECARD, ("temporal", "agg", "dba"),
              doc="per-supplier fulfilment KPI row: on-time rate, avg "
                  "commit-to-ship slip, return rate, exact-decimal "
                  "revenue (one keyed aggregate)"),
    QuerySpec("orders_backlog_aging", orders_backlog_aging,
              ORACLE_BACKLOG_AGING, ("temporal", "interval", "dba"),
              doc="open-order backlog aging at the corpus snapshot "
                  "(0-30/31-60/61-90/90+ day buckets, exact-decimal "
                  "open value)"),
    QuerySpec("ev_cusum_changepoint", ev_cusum_changepoint, ORACLE_CUSUM,
              ("temporal", "anomaly", "changepoint"),
              doc="CUSUM level-shift changepoint of the hourly series "
                  "(integer-exact argmax over the zero-filled calendar "
                  "spine; before/after means)"),
    QuerySpec("stats_ab_test", stats_ab_test, ORACLE_AB_TEST,
              ("stats", "experiment"),
              doc="hash-split two-proportion A/B readout (deterministic "
                  "md5 arm assignment, pooled-SE z, relative lift)"),
    QuerySpec("stats_theil_sen", stats_theil_sen, ORACLE_THEIL_SEN,
              ("stats", "trend", "robust"),
              doc="per-type Theil-Sen slope: median of pairwise hourly "
                  "slopes (calendar^2-bounded pairs, rank-selected exact "
                  "lower median)"),
    QuerySpec("stats_ks_two_sample", stats_ks_two_sample,
              ORACLE_KS_TWO_SAMPLE, ("stats", "drift", "nonparametric"),
              doc="exact two-sample Kolmogorov-Smirnov D (click vs "
                  "purchase values): integer CDF cross-multiplication, "
                  "bucket-partitioned running sums, rational half-up"),
    QuerySpec("stats_mann_whitney_u", stats_mann_whitney_u,
              ORACLE_MANN_WHITNEY, ("stats", "nonparametric"),
              doc="exact Mann-Whitney U with mid-rank ties carried as "
                  "the integer 2U + common-language effect size "
                  "(shared two-pass bucketed-CDF machinery with the KS "
                  "twin)"),
    QuerySpec("stats_kruskal_wallis_daily", stats_kruskal_wallis_daily,
              ORACLE_KRUSKAL_WALLIS, ("stats", "nonparametric"),
              doc="exact Kruskal-Wallis H across event types over daily "
                  "cents sums (distinct-rank md5 tiebreak, one cleared "
                  "integer fraction, q/rem split rounding)"),
    QuerySpec("orders_rfm_migration", orders_rfm_migration,
              ORACLE_RFM_MIGRATION, ("temporal", "growth", "revenue"),
              doc="hi/lo/none value-segment migration matrix between "
                  "order-history halves (exact cross-multiplied mean "
                  "thresholds, customer-dimension universe)"),
    QuerySpec("ev_hour_of_day_profile", ev_hour_of_day_profile,
              ORACLE_HOUR_PROFILE, ("temporal", "profile"),
              doc="hour-of-day event counts + within-type share (24 x "
                  "types bounded, NTZ-safe diurnal profile)"),
    QuerySpec("ts_ohlc_candles", ts_ohlc_candles, ORACLE_OHLC,
              ("temporal", "timeseries"),
              doc="daily OHLC candles in BIGINT cents; open/close by the "
                  "exact (epoch-us, event_id) total order, one date-keyed "
                  "shuffle"),
    QuerySpec("ev_bollinger_breakout", ev_bollinger_breakout,
              ORACLE_BOLLINGER, ("temporal", "timeseries", "anomaly"),
              doc="Bollinger 2-sigma breakouts on the daily series via "
                  "the cross-multiplied integer test (x*W - s)^2 > "
                  "k^2*(W*q - s^2) — sqrt-free, sign-split up/down"),
    QuerySpec("ev_lifecycle_accounting", ev_lifecycle_accounting,
              ORACLE_LIFECYCLE, ("temporal", "growth"),
              doc="weekly growth accounting: new/retained/resurrected "
                  "actives + churned-in from the prior week (lag window "
                  "+ anti-join)"),
    QuerySpec("orders_pareto_cumshare", orders_pareto_cumshare,
              ORACLE_PARETO, ("temporal", "stats", "revenue"),
              doc="customer revenue deciles with cumulative share "
                  "(Pareto curve, exact rank deciles over the customer "
                  "dimension)"),
    QuerySpec("ev_session_percentiles", ev_session_percentiles,
              ORACLE_SESSION_PCTS, ("temporal", "sessions", "stats"),
              doc="exact type-1 p50/p90/p99 session durations via the "
                  "bucketed-prefix rank (no global window)"),
    QuerySpec("stats_spearman_rank_corr", stats_spearman_rank_corr,
              ORACLE_SPEARMAN, ("stats", "nonparametric", "rank"),
              doc="exact Spearman rho (part price vs size) on the "
                  "deterministic total-order permutation ranks: "
                  "bucketed-prefix global rank (no global window), "
                  "closed-form 1 - 6*sum(d^2)/(n*(n^2-1)) in "
                  "DECIMAL(38,0)/HUGEINT"),
    QuerySpec("stats_kendall_daily", stats_kendall_daily,
              ORACLE_KENDALL_DAILY, ("stats", "nonparametric", "rank"),
              doc="exact Kendall tau-a between daily order count and "
                  "daily revenue cents (calendar-bounded pair join, "
                  "integer concordance counts, signed rational "
                  "half-up)"),
    QuerySpec("ev_fano_overdispersion", ev_fano_overdispersion,
              ORACLE_FANO, ("events", "stats", "burstiness"),
              doc="per-type Fano factor of hourly arrivals (silent "
                  "hours via the zero-hour trick — no spine; exact "
                  "rational var/mean in DECIMAL(38,0)/HUGEINT)"),
    QuerySpec("ev_gap_log2_histogram", ev_gap_log2_histogram,
              ORACLE_GAP_LOG2, ("events", "histogram"),
              doc="per-type log2-bucketed inter-event gap histogram "
                  "(exact bit-length buckets — no float log2 edge at "
                  "power-of-two boundaries; user+type keyed lag)"),
    QuerySpec("orders_seasonal_index", orders_seasonal_index,
              ORACLE_SEASONAL_INDEX, ("orders", "seasonality"),
              doc="month-of-year count/revenue seasonal index (BIGINT "
                  "cents, exact rational 12*m/total indices)"),
    QuerySpec("drift_priority_mix_tv", drift_priority_mix_tv,
              ORACLE_PRIORITY_MIX_TV, ("drift", "categorical"),
              doc="monthly priority-mix total-variation drift vs the "
                  "corpus mix (log-free categorical twin of PSI; "
                  "cross-multiplied exact rational)"),
    QuerySpec("stats_bootstrap_ci", stats_bootstrap_ci,
              ORACLE_BOOTSTRAP_CI, ("stats", "resampling"),
              doc="deterministic Poisson-bootstrap CI of mean order "
                  "value (frozen integer inverse-CDF thresholds on a "
                  "28-bit md5; exact-rational replica means, "
                  "order-statistic band over B=100 replicas)"),
    QuerySpec("stats_equidepth_histogram", stats_equidepth_histogram,
              ORACLE_EQUIDEPTH, ("stats", "histogram", "percentile"),
              doc="exact equi-depth histogram boundaries per priority "
                  "(BIGINT-cents values, value-domain-bounded cumulative "
                  "window, ceil-rank integer targets)"),
    QuerySpec("stats_runs_test", stats_runs_test,
              ORACLE_RUNS_TEST, ("stats", "temporal"),
              doc="Wald-Wolfowitz runs test on daily revenue direction "
                  "(integer run counts + exact-rational null moments; "
                  "calendar-bounded windows)"),
    QuerySpec("ts_downsample_lttb", ts_downsample_lttb, ORACLE_LTTB,
              ("temporal", "downsample", "viz", "lttb-bucket-anchor"),
              doc="LTTB-family downsampling of the daily revenue series "
                  "— the BUCKET-MEAN-ANCHOR parallel variant, NOT "
                  "canonical LTTB (which anchors on the previously "
                  "selected point and is inherently sequential); the "
                  "tag marks the variant so consumers don't assume "
                  "canonical parity. Exact integer cross-product areas "
                  "in DECIMAL(38,0), per-bucket argmax windows"),
    QuerySpec("orders_seasonal_naive_backtest",
              orders_seasonal_naive_backtest, ORACLE_SEASONAL_NAIVE,
              ("temporal", "forecast", "stats"),
              doc="seasonal-naive forecast backtest over monthly revenue "
                  "(calendar-bounded year-shift self-join, exact integer "
                  "errors + rational APE)"),
    QuerySpec("orders_fulfillment_latency_bands",
              orders_fulfillment_latency_bands, ORACLE_LATENCY_BANDS,
              ("temporal", "percentile", "join"),
              doc="exact p50/p90/p99 fulfilment-latency bands per "
                  "priority (order-grain day diffs, domain-bounded "
                  "histogram selection)"),
]
