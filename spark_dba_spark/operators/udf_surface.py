"""User-defined-function surface: pandas UDAF (grouped aggregate) and
grouped-map ``applyInPandas``.

The engine's operators deliberately stay in JVM expressions; these two
exist to prove the extension surface a user would plug custom logic into
(SURVEY.md §2.4 "UDF/UDAF/UDTF → pandas_udf / applyInPandas"), wired the
fast way: Arrow-batched, vectorized numpy inside, and oracle-checked
because both semantics have exact SQL twins.

Scale: a grouped-aggregate pandas UDF executes as a real partial-free
hash aggregation over Arrow batches per group; applyInPandas shuffles
once on the group key and holds ONE group per call in memory — both are
the documented contracts, no driver involvement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import catalog
from ..registry import QuerySpec
from .similarity import _pin_columns


def udaf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of order totals per priority — a numeric UDAF Spark
    lacks as a built-in, via @pandas_udf grouped-agg (one Arrow batch
    stream per group, numpy log/exp inside)."""

    @F.pandas_udf("double")
    def gmean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(gmean("o_totalprice"), 4).alias("gmean_price"))
        .orderBy("o_orderpriority")
    )


ORACLE_GMEAN = """
SELECT o_orderpriority,
       ROUND(exp(avg(ln(o_totalprice))), 4) AS gmean_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation z-score of customer balances via grouped-map
    ``applyInPandas`` — the custom-transform extension point (each call
    sees one whole group as a pandas frame). Sample stddev, 4 dp."""
    out_schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("z_r4", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["c_acctbal"].to_numpy(dtype=np.float64)
        sd = v.std(ddof=1) if len(v) > 1 else 0.0
        z = (v - v.mean()) / sd if sd > 0 else np.zeros_like(v)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "z_r4": np.round(z, 4),
            }
        )

    cust = catalog.load(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(zscore, out_schema)
        .orderBy("c_custkey")
    )


ORACLE_ZSCORE = """
SELECT c_custkey, c_nationkey,
       ROUND(CASE WHEN cnt > 1 AND sd > 0
                  THEN (c_acctbal - mu) / sd ELSE 0.0 END, 4) AS z_r4
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         AVG(c_acctbal) OVER w AS mu,
         STDDEV_SAMP(c_acctbal) OVER w AS sd,
         COUNT(*) OVER w AS cnt
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey))
ORDER BY c_custkey
"""


def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface — one input row fans out to N
    output rows from arbitrary Python, consumed via LATERAL join. Splits
    each document into '. '-delimited sentences and emits per-sentence
    word counts; the report aggregates back to per-doc sentence stats so
    the checked output is scalar.

    UDTFs are row-at-a-time Python — the SLOW extension path, kept off
    the bench set deliberately (the engine's own operators use JVM
    expressions or Arrow-batched pandas; this exists to prove the
    extension point, mirroring how lateral_posexplode proves the built-in
    generator path)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words int")
    class SentenceStats:
        def eval(self, text: str):
            if text is None:
                return
            for i, sent in enumerate(text.split(". ")):
                yield i, len(sent.split(" ")) if sent else 0

    spark.udtf.register("sentence_stats", SentenceStats)
    docs = catalog.load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, COUNT(*) AS n_sents,
               CAST(SUM(n_words) AS BIGINT) AS total_words,
               MAX(n_words) AS max_sent_words
        FROM _udtf_docs, LATERAL sentence_stats(text)
        GROUP BY doc_id ORDER BY doc_id
        """
    )


ORACLE_SENTENCE_STATS = """
SELECT doc_id, COUNT(*) AS n_sents,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       MAX(n_words) AS max_sent_words
FROM (
  SELECT doc_id,
         CASE WHEN sent = '' THEN 0
              ELSE len(string_split(sent, ' ')) END AS n_words
  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS sent
        FROM documents))
GROUP BY doc_id ORDER BY doc_id
"""


def inv_running_balance_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running inventory balance per supplier — shipments
    deplete, returns restock, and stock can never go negative:
    ``b_i = max(0, b_{i-1} + delta_i)`` over each day's net flow. The
    clamp makes the recurrence non-associative, so the engine implements
    it as the custom-stateful-operator surface: one ``applyInPandas``
    per supplier over the Arrow-shuffled group, exact integer state
    inside — the GENERAL pattern, which also covers the two-sided
    capacity clamp ``min(C, max(0, …))`` for which no closed form
    exists.

    Scale: state-machine operators parallelize ACROSS keys, never within
    one — one shuffle on the supplier key, each task folds its groups
    sequentially in O(rows); the same execution contract as
    ``applyInPandasWithState`` in the streaming twin world. All deltas
    are integral (quantity casts exactly to long), zero drift.

    Oracle: the ONE-sided clamp does have a closed form — the reflection
    identity ``b_i = S_i − min(0, min_{k≤i} S_k)`` (the clamped walk is
    the walk minus its running minimum), and a reset happens exactly
    when the running minimum strictly decreases. The DuckDB oracle
    computes that window form, so the sequential fold is DIFFERENTIALLY
    verified against the algebraic identity — two independent
    formulations agreeing per supplier."""
    out_schema = T.StructType(
        [
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("n_moves", T.LongType()),
            T.StructField("final_bal", T.LongType()),
            T.StructField("max_bal", T.LongType()),
            T.StructField("n_resets", T.LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        bal = 0
        mx = 0
        resets = 0
        for d in pdf["delta"].to_numpy(dtype=np.int64):
            bal += int(d)
            if bal < 0:
                bal = 0
                resets += 1
            if bal > mx:
                mx = bal
        return pd.DataFrame(
            [
                {
                    "l_suppkey": int(pdf["l_suppkey"].iloc[0]),
                    "n_moves": len(pdf),
                    "final_bal": bal,
                    "max_bal": mx,
                    "n_resets": resets,
                }
            ]
        )

    li = catalog.load(spark, sf_dir, "lineitem")
    moves = (
        li.select(
            "l_suppkey",
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
            ).alias("day"),
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
            .otherwise(-F.col("l_quantity"))
            .cast("long")
            .alias("delta"),
        )
        .groupBy("l_suppkey", "day")
        .agg(F.sum("delta").alias("delta"))
    )
    out = moves.groupBy("l_suppkey").applyInPandas(fold, out_schema)
    # Same pruning hazard as the cogrouped operators: a consumer that
    # drops output columns lets Catalyst prune the UDF's INPUT columns
    # out from under it — pin the references (shared helper).
    return _pin_columns(out).orderBy("l_suppkey")


ORACLE_BALANCE = """
WITH daily AS (
  SELECT l_suppkey,
         epoch_us(l_shipdate) // 86400000000 AS day,
         SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                       ELSE -l_quantity END AS BIGINT)) AS delta
  FROM lineitem GROUP BY 1, 2),
s AS (
  SELECT l_suppkey, day,
         SUM(delta) OVER w AS ps,
         ROW_NUMBER() OVER w AS rn
  FROM daily
  WINDOW w AS (PARTITION BY l_suppkey ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
m AS (
  SELECT l_suppkey, rn, ps,
         LEAST(MIN(ps) OVER (PARTITION BY l_suppkey ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
           AS runmin,
         LEAST(COALESCE(MIN(ps) OVER (PARTITION BY l_suppkey ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 0)
           AS prevmin
  FROM s),
b AS (
  SELECT l_suppkey, rn, ps - runmin AS bal,
         CASE WHEN ps < prevmin THEN 1 ELSE 0 END AS reset
  FROM m)
SELECT l_suppkey,
       CAST(MAX(rn) AS BIGINT) AS n_moves,
       CAST(arg_max(bal, rn) AS BIGINT) AS final_bal,
       CAST(MAX(bal) AS BIGINT) AS max_bal,
       CAST(SUM(reset) AS BIGINT) AS n_resets
FROM b GROUP BY l_suppkey ORDER BY l_suppkey
"""


CLAMP_CAP = 150  # warehouse capacity for the two-sided clamp


def inv_capacity_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided capacity-clamped balance per (supplier, quarter) —
    ``b_i = min(CAP, max(0, b_{i-1} + delta_i))`` over daily net flows,
    state reset each quarter. Unlike the one-sided floor
    (``inv_running_balance_capped``), the two-sided clamp has NO
    reflection closed form — once the walk touches either bound its
    history is erased — so the oracle cannot be rewritten into windows:
    it steps the genuine RECURSIVE CTE, kept tractable because recursion
    depth is quarter-bounded (≤92 days) regardless of corpus size.

    Engine side: the same applyInPandas key-parallel integer fold as the
    floor-only op, shuffled on the supplier key with the quarterly state
    reset applied INSIDE the fold — logically the state key is
    (supplier, quarter), but batching a supplier's quarters into one
    Arrow call avoids per-tiny-group pandas overhead (measured 23s →
    ~2s at 2800 quarter-groups) while each sequential segment stays
    calendar-bounded. The pairing demonstrates the design rule: pick the
    state key so per-key work is bounded, then the non-associative
    operator scales exactly like a keyed aggregate."""
    out_schema = T.StructType(
        [
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("qtr", T.DateType()),
            T.StructField("n_days", T.LongType()),
            T.StructField("final_bal", T.LongType()),
            T.StructField("n_floor", T.LongType()),
            T.StructField("n_ceil", T.LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # One call per SUPPLIER (not per (supplier, quarter)): the state
        # legitimately resets at each quarter boundary, so folding all of
        # a supplier's quarters in one Arrow batch is semantically
        # identical while avoiding a per-tiny-group pandas call (2800
        # single-row calls measured 23s; ~100 supplier calls take ~2s).
        pdf = pdf.sort_values(["qtr", "day"])
        suppkey = int(pdf["l_suppkey"].iloc[0])
        rows = []
        for qtr, g in pdf.groupby("qtr", sort=True):
            bal = 0
            nf = nc = 0
            for d in g["delta"].to_numpy(dtype=np.int64):
                bal += int(d)
                if bal < 0:
                    bal = 0
                    nf += 1
                elif bal > CLAMP_CAP:
                    bal = CLAMP_CAP
                    nc += 1
            rows.append(
                {
                    "l_suppkey": suppkey,
                    "qtr": qtr,
                    "n_days": len(g),
                    "final_bal": bal,
                    "n_floor": nf,
                    "n_ceil": nc,
                }
            )
        return pd.DataFrame(
            rows,
            columns=[
                "l_suppkey", "qtr", "n_days", "final_bal", "n_floor",
                "n_ceil",
            ],
        )

    li = catalog.load(spark, sf_dir, "lineitem")
    sd = F.expr("cast(l_shipdate as timestamp_ntz)")
    daily = (
        li.select(
            "l_suppkey",
            F.make_date(
                F.year(sd),
                ((F.month(sd) - 1) - (F.month(sd) - 1) % 3) + 1,
                F.lit(1),
            ).alias("qtr"),
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
            ).alias("day"),
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
            .otherwise(-F.col("l_quantity"))
            .cast("long")
            .alias("delta"),
        )
        .groupBy("l_suppkey", "qtr", "day")
        .agg(F.sum("delta").alias("delta"))
    )
    out = daily.groupBy("l_suppkey").applyInPandas(fold, out_schema)
    return _pin_columns(out).orderBy("l_suppkey", "qtr")


ORACLE_CLAMP = f"""
WITH RECURSIVE daily AS (
  SELECT l_suppkey,
         make_date(year(l_shipdate),
                   ((month(l_shipdate) - 1) // 3) * 3 + 1, 1) AS qtr,
         epoch_us(l_shipdate) // 86400000000 AS day,
         SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                       ELSE -l_quantity END AS BIGINT)) AS delta
  FROM lineitem GROUP BY 1, 2, 3),
seq AS (
  SELECT l_suppkey, qtr,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey, qtr ORDER BY day)
           AS rn,
         delta
  FROM daily),
r AS (
  SELECT l_suppkey, qtr, rn,
         LEAST({CLAMP_CAP}, GREATEST(delta, 0)) AS bal,
         CASE WHEN delta < 0 THEN 1 ELSE 0 END AS nf,
         CASE WHEN delta > {CLAMP_CAP} THEN 1 ELSE 0 END AS nc
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.l_suppkey, s.qtr, s.rn,
         LEAST({CLAMP_CAP}, GREATEST(r.bal + s.delta, 0)),
         r.nf + CASE WHEN r.bal + s.delta < 0 THEN 1 ELSE 0 END,
         r.nc + CASE WHEN r.bal + s.delta > {CLAMP_CAP} THEN 1 ELSE 0 END
  FROM r JOIN seq s ON s.l_suppkey = r.l_suppkey
                   AND s.qtr = r.qtr AND s.rn = r.rn + 1)
SELECT l_suppkey, qtr,
       CAST(MAX(rn) AS BIGINT) AS n_days,
       CAST(arg_max(bal, rn) AS BIGINT) AS final_bal,
       CAST(MAX(nf) AS BIGINT) AS n_floor,
       CAST(MAX(nc) AS BIGINT) AS n_ceil
FROM r GROUP BY l_suppkey, qtr ORDER BY l_suppkey, qtr
"""


ALERT_THRESHOLD = 150.0  # candidate predicate: value above ~p95
ALERT_COOLDOWN_US = 7 * 86400 * 1_000_000  # one alert per user per week


def ev_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert debouncing with a cooldown — emit a candidate alert only if
    at least {cooldown} has passed since the last EMITTED alert for that
    user (the anti-alert-fatigue operator every monitoring pipeline
    needs). The emitted chain depends on itself — candidate k is emitted
    iff no emitted alert lies in its trailing cooldown — so, like the
    capacity clamp, no window rewrite exists; the engine folds per user
    in applyInPandas.

    Oracle: recursion WITHOUT aggregates — the next emitted alert after
    r is the candidate c ≥ r.ts+cooldown such that NO candidate sits
    between the cooldown expiry and c (NOT EXISTS, join-only recursive
    term — the form recursive CTE restrictions allow). Candidates are
    the >p95-value events, so the chain is short but real."""
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("alert_um", T.LongType()),
            T.StructField("n_suppressed_before", T.LongType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("um")
        uid = int(pdf["user_id"].iloc[0])
        rows = []
        last = None
        suppressed = 0
        for um in pdf["um"].to_numpy(dtype=np.int64):
            if last is None or um - last >= ALERT_COOLDOWN_US:
                rows.append(
                    {
                        "user_id": uid,
                        "alert_um": int(um),
                        "n_suppressed_before": suppressed,
                    }
                )
                last = int(um)
                suppressed = 0
            else:
                suppressed += 1
        return pd.DataFrame(
            rows,
            columns=["user_id", "alert_um", "n_suppressed_before"],
        )

    ev = catalog.load(spark, sf_dir, "events")
    # distinct (user, um): same-microsecond duplicate candidates must not
    # count as suppressed copies of the emitted alert in either engine
    cand = (
        ev.filter(F.col("value") > ALERT_THRESHOLD)
        .select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp))").alias("um"),
        )
        .distinct()
    )
    out = cand.groupBy("user_id").applyInPandas(fold, out_schema)
    return (
        _pin_columns(out)
        .select(
            "user_id",
            F.expr(
                "cast(timestamp_micros(alert_um) as timestamp_ntz)"
            ).alias("alert_ts"),
            "n_suppressed_before",
        )
        .orderBy("user_id", "alert_ts")
    )


ORACLE_DEBOUNCE = f"""
WITH RECURSIVE cand AS (
  SELECT DISTINCT user_id, epoch_us(ts) AS um
  FROM events WHERE value > {ALERT_THRESHOLD}),
first_c AS (
  SELECT user_id, MIN(um) AS um FROM cand GROUP BY 1),
r AS (
  SELECT user_id, um FROM first_c
  UNION ALL
  SELECT c.user_id, c.um
  FROM r JOIN cand c
    ON c.user_id = r.user_id
   AND c.um >= r.um + {ALERT_COOLDOWN_US}
   AND NOT EXISTS (
     SELECT 1 FROM cand c2
     WHERE c2.user_id = r.user_id
       AND c2.um >= r.um + {ALERT_COOLDOWN_US}
       AND c2.um < c.um)),
numbered AS (
  SELECT user_id, um,
         LAG(um) OVER (PARTITION BY user_id ORDER BY um) AS prev_um
  FROM r)
SELECT n.user_id,
       make_timestamp(n.um) AS alert_ts,
       CAST((SELECT COUNT(*) FROM cand c
             WHERE c.user_id = n.user_id
               AND c.um > COALESCE(n.prev_um, -1)
               AND c.um < n.um) AS BIGINT) AS n_suppressed_before
FROM numbered n
ORDER BY user_id, alert_ts
"""


SPECS = [
    QuerySpec("udaf_geometric_mean", udaf_geometric_mean, ORACLE_GMEAN,
              ("udf", "agg"), doc="pandas grouped-agg UDAF"),
    QuerySpec("grouped_zscore", grouped_zscore, ORACLE_ZSCORE,
              ("udf", "grouped-map"), doc="applyInPandas grouped transform"),
    QuerySpec("udtf_sentence_stats", udtf_sentence_stats,
              ORACLE_SENTENCE_STATS, ("udf", "udtf", "lateral"),
              doc="Python UDTF + LATERAL join (table-function extension "
                  "surface)"),
    QuerySpec("inv_running_balance_capped", inv_running_balance_capped,
              ORACLE_BALANCE, ("udf", "grouped-map", "stateful"),
              doc="floor-at-zero running balance (non-associative clamp "
                  "recurrence — applyInPandas key-parallel fold; "
                  "recursive-CTE oracle)"),
    QuerySpec("inv_capacity_clamp", inv_capacity_clamp, ORACLE_CLAMP,
              ("udf", "grouped-map", "stateful"),
              doc="two-sided capacity clamp per (supplier, quarter) — "
                  "no closed form exists; genuine recursive-CTE oracle, "
                  "quarter-bounded depth"),
    QuerySpec("ev_alert_debounce", ev_alert_debounce, ORACLE_DEBOUNCE,
              ("udf", "grouped-map", "stateful", "monitoring"),
              doc="cooldown alert debouncing (self-referential emitted "
                  "chain — applyInPandas fold; aggregate-free recursive "
                  "oracle via NOT EXISTS)"),
]
