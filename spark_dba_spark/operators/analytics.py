"""Round-14 continuation (second window) — batch S analytics operators.

Six new oracle-checked operators extending the engine surface beyond the
reference compactor (reference parity is complete; these are §2.4-family
additions following the standing four-evidence protocol: full DuckDB
oracle + 3-SF hostile sweep + planted pytest twin + plan-audit row):

- ``orders_littles_law_audit`` — Little's law L = λ·W reconciliation on
  the order lifecycle, with an independent day-spine expansion cross-
  checking the moment arithmetic (the merge_diag pattern applied to
  queueing theory).
- ``stats_nelson_aalen_interarrival`` — Nelson–Aalen cumulative hazard
  of next-event arrival over per-user inter-event gaps, final gaps
  right-censored at the feed end, every hazard term an exact ppb
  integer.
- ``text_readability_grid`` — LIX / RIX / sentence-length readability
  per (source, lang), micro-averaged exact rationals.
- ``emb_triplet_margin_rate`` — deterministic md5-seeded triplets over
  the label structure; integer-grid margin satisfaction per label.
- ``sketch_ams_f2_error`` — AMS/Tug-of-War second-moment sketch vs the
  exact F2, with a Chebyshev error-band certificate (the
  sketch_linear_counting_error pattern for F2).
- ``corpus_dedup_quality_shift`` — per-source mix shift (total-variation
  over (lang × length-band) cells) induced by global exact dedup.

Exactness follows the house TIES.md catalogue: integer/rational lanes
with half-up rounding via rat/qrem, md5 integer hashing, the 2^-20
embedding grid, truncation (not ROUND) wherever a double is divided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import catalog
from ..functions.hashing import sql_md5_long_duck, sql_md5_long_spark
from ..functions.numeric import (
    qrem_round6_duck,
    qrem_round6_spark,
    rat_round6_duck,
    rat_round6_spark,
)
from ..registry import QuerySpec

_DAY_US = 86_400_000_000
_US = "unix_micros(cast(ts as timestamp))"
_US_DUCK = "epoch_us(ts)"


# --------------------------------------------------------------------------
# Little's law audit on the order lifecycle
# --------------------------------------------------------------------------

LL_BUCKET_DAYS = 30  # spine grain: the day-spine would amplify each order
# by its open duration (mean ~725 days in the fixture feed); 30-day
# buckets keep the reconciliation explode at ≤ ~85× per order (horizon
# ~2.5k days) while the identity it checks is exactly as strong.


def orders_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law (L = λ·W) reconciliation per order priority class.

    An order is OPEN from its order date to the last ship date of its
    line items (inclusive). The moment path computes, per class, the
    arrival rate λ (orders per 30-day bucket), the mean time-in-system
    W (buckets), and the time-averaged WIP L = Σ dur / span — which
    satisfies L = λ·W as an algebraic identity. The audit teeth come
    from the second path: an independent bucket-spine EXPANSION
    (explode the open interval, count rows) whose total must equal the
    moment path's Σ dur exactly — the merge_diag-style cross-plan
    reconciliation that catches any off-by-one in interval semantics.
    ``w_days_r6`` is also emitted at day grain for interpretability.

    Exact: epoch-day integers, bucket = day div 30, all readouts
    half-up rationals on BIGINT lanes.

    Scale: one orders⋈lineitem shuffle keyed on orderkey; the explode
    amplification is bounded by the fulfillment horizon (≤ ~85 bucket
    rows per order), then collapses into a 5-class aggregate. Orders
    with a ship date before the order date (none in the fixture) are
    excluded on both sides — Spark's descending ``sequence`` vs
    DuckDB's empty ``generate_series`` would otherwise diverge."""
    day_o = f"unix_micros(cast(o_orderdate as timestamp)) div {_DAY_US}"
    day_s = f"unix_micros(cast(l_shipdate as timestamp)) div {_DAY_US}"
    orders = catalog.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.expr(day_o).alias("sd"),
    )
    ends = (
        catalog.load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.expr(day_s)).alias("ed"))
    )
    o = (
        orders.join(ends, orders["o_orderkey"] == ends["l_orderkey"])
        .filter(F.col("ed") >= F.col("sd"))
        .select(
            "priority",
            "sd",
            "ed",
            F.expr(f"sd div {LL_BUCKET_DAYS}").alias("sb"),
            F.expr(f"ed div {LL_BUCKET_DAYS}").alias("eb"),
        )
        .localCheckpoint(eager=True)  # feeds the moment AND spine paths
    )
    base = o.groupBy("priority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.min("sb").alias("b0"),
        F.max("eb").alias("b1"),
        F.sum(F.expr("eb - sb + 1")).cast("long").alias("sum_dur_buckets"),
        F.sum(F.expr("ed - sd + 1")).cast("long").alias("sum_dur_days"),
    )
    spine = (
        o.select("priority", F.explode(F.expr("sequence(sb, eb)")).alias("b"))
        .groupBy("priority")
        .agg(F.count("*").cast("long").alias("spine_open_buckets"))
    )
    span = "b1 - b0 + 1"
    return (
        base.join(spine, "priority")
        .select(
            "priority",
            "n_orders",
            F.expr(span).cast("long").alias("span_buckets"),
            "sum_dur_buckets",
            "spine_open_buckets",
            F.expr(rat_round6_spark("n_orders", span)).alias(
                "lambda_per_bucket_r6"
            ),
            F.expr(rat_round6_spark("sum_dur_buckets", "n_orders")).alias(
                "w_buckets_r6"
            ),
            F.expr(rat_round6_spark("sum_dur_days", "n_orders")).alias(
                "w_days_r6"
            ),
            F.expr(qrem_round6_spark("sum_dur_buckets", span)).alias(
                "l_avg_open_r6"
            ),
            (F.col("spine_open_buckets") == F.col("sum_dur_buckets")).alias(
                "littles_law_holds"
            ),
        )
        .orderBy("priority")
    )


ORACLE_LITTLES_LAW = f"""
WITH o AS (
  SELECT o.o_orderpriority AS priority,
         (epoch_us(o.o_orderdate) // {_DAY_US}) AS sd, e.ed,
         ((epoch_us(o.o_orderdate) // {_DAY_US}) // {LL_BUCKET_DAYS}) AS sb,
         (e.ed // {LL_BUCKET_DAYS}) AS eb
  FROM orders o
  JOIN (SELECT l_orderkey,
               MAX(epoch_us(l_shipdate) // {_DAY_US}) AS ed
        FROM lineitem GROUP BY 1) e
    ON o.o_orderkey = e.l_orderkey
  WHERE e.ed >= (epoch_us(o.o_orderdate) // {_DAY_US})),
base AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
         MIN(sb) AS b0, MAX(eb) AS b1,
         CAST(SUM(eb - sb + 1) AS BIGINT) AS sum_dur_buckets,
         CAST(SUM(ed - sd + 1) AS BIGINT) AS sum_dur_days
  FROM o GROUP BY 1),
spine AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS spine_open_buckets
  FROM (SELECT priority, unnest(generate_series(sb, eb)) AS b FROM o)
  GROUP BY 1)
SELECT b.priority, b.n_orders,
       CAST(b.b1 - b.b0 + 1 AS BIGINT) AS span_buckets,
       b.sum_dur_buckets, s.spine_open_buckets,
       {rat_round6_duck('b.n_orders', 'b.b1 - b.b0 + 1')}
         AS lambda_per_bucket_r6,
       {rat_round6_duck('b.sum_dur_buckets', 'b.n_orders')} AS w_buckets_r6,
       {rat_round6_duck('b.sum_dur_days', 'b.n_orders')} AS w_days_r6,
       {qrem_round6_duck('b.sum_dur_buckets', 'b.b1 - b.b0 + 1')}
         AS l_avg_open_r6,
       (s.spine_open_buckets = b.sum_dur_buckets) AS littles_law_holds
FROM base b JOIN spine s ON b.priority = s.priority
ORDER BY b.priority
"""


# --------------------------------------------------------------------------
# Nelson–Aalen cumulative churn hazard
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


def stats_nelson_aalen_interarrival(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nelson–Aalen cumulative hazard of "the next event arrives",
    over per-user inter-event gaps at hour grain — renewal-process
    survival with proper right-censoring: every consecutive event pair
    contributes a COMPLETED gap, and each user's final open gap (last
    event → feed end) is CENSORED (it is known to be at least that
    long). At every gap length t (hours) with ≥1 completion: the risk
    set n_t (gaps, completed or censored, of duration ≥ t), the
    completion count d_t, the hazard increment d_t/n_t, and the
    cumulative hazard Σ_{u≤t} d_u/n_u. A flat hazard ⇒ memoryless
    (Poisson) arrivals; a falling hazard ⇒ burstiness (the survival-
    curve view of ev_interarrival_burstiness's index).

    Exactness: each hazard term is quantized HALF-UP to an integer
    part-per-billion lane — (d·2e9 + n) div (2n) — and the cumulative
    sum runs on those integers, so the readout is an exact decimal
    both engines hash identically (the KM product form would need a
    cross-engine ``ln``; Nelson–Aalen's sum form needs none).

    Scale: one user-keyed window pass over the fact stream builds the
    gaps; everything after is gap-hour grain — the cumulative-sum
    windows order ≤ feed-span-hours rows (calendar-bounded), so the
    single-partition windows are safe at any corpus size."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr(_US).alias("us")
    )
    endrow = ev.agg(F.max("us").alias("feed_end"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("nxt", F.lead("us").over(w))
        .crossJoin(F.broadcast(endrow))
        .select(
            F.expr(
                f"coalesce((nxt - us) div {_HOUR_US},"
                f" (feed_end - us) div {_HOUR_US})"
            ).alias("dur_h"),
            F.isnotnull("nxt").cast("long").alias("is_complete"),
        )
    )
    t = gaps.groupBy("dur_h").agg(
        F.count("*").cast("long").alias("c_all"),
        F.sum("is_complete").cast("long").alias("c_done"),
    )
    w_rev = W.orderBy(F.desc("dur_h")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = t.withColumn("n_risk", F.sum("c_all").over(w_rev).cast("long"))
    deaths = risk.filter(F.col("c_done") >= 1).withColumn(
        "hz_ppb",
        F.expr("(c_done * 2000000000 + n_risk) div (2 * n_risk)"),
    )
    w_cum = W.orderBy("dur_h").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        deaths.withColumn(
            "cum_ppb", F.sum("hz_ppb").over(w_cum).cast("long")
        )
        .select(
            F.col("dur_h").cast("long").alias("gap_hours"),
            "n_risk",
            F.col("c_done").alias("n_completed"),
            (F.col("hz_ppb").cast("double") / F.lit(1000000000.0)).alias(
                "hazard_r9"
            ),
            (F.col("cum_ppb").cast("double") / F.lit(1000000000.0)).alias(
                "cum_hazard_r9"
            ),
        )
        .orderBy("gap_hours")
    )


ORACLE_NELSON_AALEN = f"""
WITH ev AS (
  SELECT user_id, event_id, ({_US_DUCK}) AS us FROM events),
fe AS (SELECT MAX(us) AS feed_end FROM ev),
gaps AS (
  SELECT COALESCE((nxt - us) // {_HOUR_US},
                  (fe.feed_end - us) // {_HOUR_US}) AS dur_h,
         CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS is_complete
  FROM (SELECT user_id, us,
               LEAD(us) OVER (PARTITION BY user_id
                              ORDER BY us, event_id) AS nxt
        FROM ev), fe),
t AS (
  SELECT dur_h, CAST(COUNT(*) AS BIGINT) AS c_all,
         CAST(SUM(is_complete) AS BIGINT) AS c_done
  FROM gaps GROUP BY 1),
risk AS (
  SELECT dur_h, c_done,
         CAST(SUM(c_all) OVER (ORDER BY dur_h DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n_risk
  FROM t),
d AS (
  SELECT dur_h, n_risk, c_done,
         (c_done * 2000000000 + n_risk) // (2 * n_risk) AS hz_ppb
  FROM risk WHERE c_done >= 1),
c AS (
  SELECT dur_h, n_risk, c_done, hz_ppb,
         CAST(SUM(hz_ppb) OVER (ORDER BY dur_h
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_ppb
  FROM d)
SELECT CAST(dur_h AS BIGINT) AS gap_hours, n_risk,
       c_done AS n_completed,
       CAST(hz_ppb AS DOUBLE) / 1000000000.0 AS hazard_r9,
       CAST(cum_ppb AS DOUBLE) / 1000000000.0 AS cum_hazard_r9
FROM c ORDER BY gap_hours
"""


# --------------------------------------------------------------------------
# Readability grid
# --------------------------------------------------------------------------

LIX_LONG_LEN = 7  # LIX's "long word": ≥ 7 characters


def text_readability_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIX / RIX readability per (source, lang) — the curation-side
    complexity screen next to the quality gates: LIX = words/sentences
    + 100·longwords/words (micro-averaged over the group: the three
    count sums are pooled before the ratio, so big docs weigh more),
    RIX = longwords/sentences, plus average sentence length and the
    long-word share. Sentences are [.!?] occurrences clamped to ≥1 per
    doc (the fixture corpus has no terminal punctuation — every doc
    counts as one sentence there; real corpora exercise the full
    formula, as the planted twin does).

    Exact: integer token/char counts; LIX's pooled form
    (W² + 100·LW·S) / (S·W) runs through the qrem split (numerator ×
    2e6 would overflow at corpus scale); the rest are rat half-up
    rationals.

    Scale: map-only per-doc counting (split + filter HOFs, no
    explode), then a (source × lang)-bounded aggregate — one shuffle
    of pre-aggregated partials."""
    d = catalog.load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        F.expr("size(split(text, ' '))").cast("long").alias("w"),
        F.expr(
            f"size(filter(split(text, ' '), t -> length(t) >= {LIX_LONG_LEN}))"
        )
        .cast("long")
        .alias("lw"),
        F.expr(
            "greatest(1, length(text)"
            " - length(regexp_replace(text, '[.!?]', '')))"
        )
        .cast("long")
        .alias("s"),
    )
    g = d.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("ws"),
        F.sum("lw").cast("long").alias("lws"),
        F.sum("s").cast("long").alias("ss"),
    )
    return g.select(
        "source",
        "lang",
        "n_docs",
        F.expr(
            qrem_round6_spark("ws * ws + 100 * lws * ss", "ss * ws")
        ).alias("lix_r6"),
        F.expr(rat_round6_spark("lws", "ss")).alias("rix_r6"),
        F.expr(rat_round6_spark("ws", "ss")).alias("asl_r6"),
        F.expr(rat_round6_spark("lws", "ws")).alias("long_share_r6"),
    ).orderBy("source", "lang")


ORACLE_READABILITY = f"""
WITH d AS (
  SELECT source, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> length(t) >= {LIX_LONG_LEN}))
              AS BIGINT) AS lw,
         CAST(greatest(1, length(text)
              - length(regexp_replace(text, '[.!?]', '', 'g')))
              AS BIGINT) AS s
  FROM documents),
g AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS ws, CAST(SUM(lw) AS BIGINT) AS lws,
         CAST(SUM(s) AS BIGINT) AS ss
  FROM d GROUP BY 1, 2)
SELECT source, lang, n_docs,
       {qrem_round6_duck('ws * ws + 100 * lws * ss', 'ss * ws')} AS lix_r6,
       {rat_round6_duck('lws', 'ss')} AS rix_r6,
       {rat_round6_duck('ws', 'ss')} AS asl_r6,
       {rat_round6_duck('lws', 'ws')} AS long_share_r6
FROM g ORDER BY source, lang
"""


# --------------------------------------------------------------------------
# Deterministic triplet margin audit
# --------------------------------------------------------------------------

_EMB_Q_SQL = (
    "transform(embedding, x -> "
    "cast(cast(x as double) * 1048576.0 as bigint))"
)  # the canonical 2^-20 grid (similarity._KM_QUANT_SQL)


def emb_triplet_margin_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-margin audit of the embedding space: for every anchor,
    a deterministic positive (the md5-cyclic successor within its
    label) and a deterministic negative (the positionally-matched
    vector in the cyclically-next label), and the per-label rate at
    which d²(anchor, neg) > d²(anchor, pos) strictly — the metric-
    learning sanity readout "do labels induce a margin" without any
    RNG (triplet choice is a pure function of md5(vec_id), so both
    engines and every rerun see the same triplets).

    Singleton labels have no positive and are excluded as anchors
    (they still serve as negatives). Distances are exact BIGINT on the
    2^-20 grid; margin extremes are emitted raw (grid² units).

    Scale: two keyed self-joins on (label, rank) — rank is dense
    within label, so both joins are shuffle-bounded by the corpus with
    no quadratic term; the label directory is a broadcast."""
    h = sql_md5_long_spark("cast(vec_id as string)")
    e = catalog.load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr(_EMB_Q_SQL).alias("qv"), F.expr(h).alias("h")
    )
    rk = (
        e.withColumn(
            "rk",
            F.row_number().over(W.partitionBy("label").orderBy("h", "vec_id"))
            - 1,
        )
        .select("vec_id", "label", "qv", "rk")
        .localCheckpoint(eager=True)  # anchor + positive + negative sides
    )
    lbl = (
        rk.groupBy("label")
        .agg(F.count("*").cast("long").alias("sz"))
        .withColumn("li", F.row_number().over(W.orderBy("label")) - 1)
    )
    lcnt = lbl.agg(F.count("*").cast("long").alias("nl"))
    lbl2 = lbl.crossJoin(F.broadcast(lcnt))
    a = (
        rk.join(F.broadcast(lbl2), "label")
        .filter(F.col("sz") > 1)
        .select("vec_id", "label", "qv", "rk", "sz", "li", "nl")
    )
    pos = rk.select(
        F.col("label").alias("p_label"),
        F.col("rk").alias("p_rk"),
        F.col("qv").alias("p_qv"),
    )
    ap = a.join(
        pos,
        (F.col("label") == F.col("p_label"))
        & (F.col("p_rk") == F.expr("(rk + 1) % sz")),
    )
    nmap = lbl2.select(
        F.col("li").alias("n_li"),
        F.col("label").alias("n_label"),
        F.col("sz").alias("n_sz"),
    )
    an = ap.join(F.broadcast(nmap), F.expr("n_li = (li + 1) % nl"))
    neg = rk.select(
        F.col("label").alias("g_label"),
        F.col("rk").alias("g_rk"),
        F.col("qv").alias("g_qv"),
    )
    at = an.join(
        neg,
        (F.col("g_label") == F.col("n_label"))
        & (F.col("g_rk") == F.expr("rk % n_sz")),
    )

    def d2(x: str, y: str) -> str:
        return (
            f"aggregate(zip_with({x}, {y}, (a, b) -> (a - b) * (a - b)),"
            f" cast(0 as bigint), (acc, v) -> acc + v)"
        )

    tri = at.select(
        "label",
        F.expr(d2("qv", "p_qv")).alias("d2_pos"),
        F.expr(d2("qv", "g_qv")).alias("d2_neg"),
    )
    return (
        tri.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_triplets"),
            F.sum((F.col("d2_neg") > F.col("d2_pos")).cast("long"))
            .cast("long")
            .alias("n_strict"),
            F.sum((F.col("d2_neg") == F.col("d2_pos")).cast("long"))
            .cast("long")
            .alias("n_ties"),
            F.min(F.expr("d2_neg - d2_pos")).alias("margin_min"),
            F.max(F.expr("d2_neg - d2_pos")).alias("margin_max"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            "n_triplets",
            "n_strict",
            "n_ties",
            F.expr(rat_round6_spark("n_strict", "n_triplets")).alias(
                "strict_rate_r6"
            ),
            "margin_min",
            "margin_max",
        )
        .orderBy("label")
    )


ORACLE_TRIPLET_MARGIN = f"""
WITH q AS (
  SELECT vec_id, label,
         {sql_md5_long_duck("CAST(vec_id AS VARCHAR)")} AS h
  FROM embeddings),
vals AS MATERIALIZED (
  SELECT vec_id, d.dim,
         CAST(TRUNC(CAST(embedding[d.dim + 1] AS DOUBLE) * 1048576.0)
              AS BIGINT) AS qv
  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS dim) d),
r AS (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY h, vec_id) - 1 AS rk
  FROM q),
lbl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz FROM q GROUP BY 1),
lbl2 AS (
  SELECT label, sz, ROW_NUMBER() OVER (ORDER BY label) - 1 AS li,
         (SELECT COUNT(*) FROM lbl) AS nl
  FROM lbl),
a AS (
  SELECT r.vec_id, r.label, r.rk, l.sz, l.li, l.nl
  FROM r JOIN lbl2 l USING (label) WHERE l.sz > 1),
ap AS (
  SELECT a.*, p.vec_id AS pos_id
  FROM a JOIN r p ON p.label = a.label AND p.rk = (a.rk + 1) % a.sz),
an AS (
  SELECT ap.*, nm.label AS n_label, nm.sz AS n_sz
  FROM ap JOIN lbl2 nm ON nm.li = (ap.li + 1) % ap.nl),
trip AS (
  SELECT an.vec_id, an.label, an.pos_id, g.vec_id AS neg_id
  FROM an JOIN r g ON g.label = an.n_label AND g.rk = an.rk % an.n_sz),
dp AS (
  SELECT t.vec_id, t.label,
         CAST(SUM((va.qv - vp.qv) * (va.qv - vp.qv)) AS BIGINT) AS d2_pos,
         CAST(SUM((va.qv - vn.qv) * (va.qv - vn.qv)) AS BIGINT) AS d2_neg
  FROM trip t
  JOIN vals va ON va.vec_id = t.vec_id
  JOIN vals vp ON vp.vec_id = t.pos_id AND vp.dim = va.dim
  JOIN vals vn ON vn.vec_id = t.neg_id AND vn.dim = va.dim
  GROUP BY 1, 2),
g AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_triplets,
         CAST(SUM(CASE WHEN d2_neg > d2_pos THEN 1 ELSE 0 END) AS BIGINT)
           AS n_strict,
         CAST(SUM(CASE WHEN d2_neg = d2_pos THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ties,
         CAST(MIN(d2_neg - d2_pos) AS BIGINT) AS margin_min,
         CAST(MAX(d2_neg - d2_pos) AS BIGINT) AS margin_max
  FROM dp GROUP BY 1)
SELECT CAST(label AS INT) AS label, n_triplets, n_strict, n_ties,
       {rat_round6_duck('n_strict', 'n_triplets')} AS strict_rate_r6,
       margin_min, margin_max
FROM g ORDER BY label
"""


# --------------------------------------------------------------------------
# AMS F2 sketch with error certificate
# --------------------------------------------------------------------------

AMS_LANES = 16
AMS_CHEB_5SIGMA_BP = 17678  # 5·sqrt(2/AMS_LANES) = 1.76776…, rounded UP
# to basis points: the Chebyshev 5σ band of the 16-lane mean estimator
# (Var(mean) ≤ 2·F2²/L for 4-wise-independent signs; md5 bits stand in
# for the 4-wise family — the same idealization every md5 lane op makes).


def sketch_ams_f2_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS / Tug-of-War second-moment sketch over the user_id frequency
    vector, with the exact F2 and a Chebyshev error-band certificate —
    the F2 member of the sketch-certificate family
    (sketch_linear_counting_error / sketch_grid_quantile_error): the
    sketch is the live single-pass estimator a 100 TB feed would keep,
    the exact path is the verifier, and the band verdict is an
    integer-exact comparison both engines hash identically.

    Each of the {AMS_LANES} lanes draws its ±1 sign for a key from one
    md5 bit; the lane sketch is the signed event count Σ_k c_k·s_k
    (one map-side pass, no pre-grouping), the lane estimate its
    square. The mean and median of the 16 lane estimates divide by
    powers of two, so even the double readouts are EXACT.

    Scale: the sketch path is a single aggregate with 16 conditional
    sums — map-side partials, one 1-row exchange; the exact-F2 path
    (the verifier, not the production estimator) is one groupBy(key)."""
    h = sql_md5_long_spark("cast(user_id as string)")
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", F.expr(h).alias("h")
    )
    lanes = ev.agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_keys"),
        *[
            F.sum(F.expr(f"((h >> {j}) & 1) * 2 - 1"))
            .cast("long")
            .alias(f"s{j}")
            for j in range(AMS_LANES)
        ],
    )
    f2 = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
        .agg(F.sum(F.expr("c * c")).cast("long").alias("f2_exact"))
    )
    ests = "array(" + ", ".join(
        f"s{j} * s{j}" for j in range(AMS_LANES)
    ) + ")"
    row = lanes.crossJoin(f2).select(
        "n_events",
        "n_keys",
        "f2_exact",
        F.expr(
            f"aggregate({ests}, cast(0 as bigint), (acc, v) -> acc + v)"
        ).alias("sum_est"),
        F.expr(f"array_sort({ests})").alias("se"),
    )
    return row.select(
        "n_events",
        "n_keys",
        "f2_exact",
        (F.col("sum_est").cast("double") / F.lit(float(AMS_LANES))).alias(
            "est_mean16"
        ),
        F.expr("cast(se[7] + se[8] as double) / 2").alias("est_median16"),
        F.expr(
            f"cast(floor(abs(cast(sum_est as double) / {AMS_LANES}"
            " - cast(f2_exact as double)) / cast(f2_exact as double)"
            " * cast(1000000 as double)) as double)"
            " / cast(1000000 as double)"
        ).alias("rel_err_t6"),
        F.expr(
            f"abs(sum_est - {AMS_LANES} * f2_exact) * 10000"
            f" <= {AMS_CHEB_5SIGMA_BP} * {AMS_LANES} * f2_exact"
        ).alias("within_5sigma"),
    )


def _ams_lane_sums_duck() -> str:
    return ",\n         ".join(
        f"CAST(SUM(((h >> {j}) & 1) * 2 - 1) AS BIGINT) AS s{j}"
        for j in range(AMS_LANES)
    )


_AMS_SQ = ", ".join(f"s{j} * s{j}" for j in range(AMS_LANES))

ORACLE_AMS_F2 = f"""
WITH ev AS (
  SELECT user_id,
         {sql_md5_long_duck("CAST(user_id AS VARCHAR)")} AS h
  FROM events),
lanes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
         {_ams_lane_sums_duck()}
  FROM ev),
f2 AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY user_id)),
row0 AS (
  SELECT *, ({" + ".join(f"s{j} * s{j}" for j in range(AMS_LANES))})
           AS sum_est,
         list_sort([{_AMS_SQ}]) AS se
  FROM lanes, f2)
SELECT n_events, n_keys, f2_exact,
       CAST(sum_est AS DOUBLE) / {AMS_LANES} AS est_mean16,
       CAST(se[8] + se[9] AS DOUBLE) / 2 AS est_median16,
       floor(abs(CAST(sum_est AS DOUBLE) / {AMS_LANES}
             - CAST(f2_exact AS DOUBLE)) / CAST(f2_exact AS DOUBLE)
             * 1000000.0) / 1000000.0 AS rel_err_t6,
       (abs(sum_est - {AMS_LANES} * f2_exact) * 10000
        <= {AMS_CHEB_5SIGMA_BP} * {AMS_LANES} * f2_exact) AS within_5sigma
FROM row0
"""


# --------------------------------------------------------------------------
# Dedup-induced quality-mix shift
# --------------------------------------------------------------------------

QS_WB_DIV = 20  # length band: words div 20, capped
QS_WB_CAP = 7


def corpus_dedup_quality_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does exact dedup do to each source's mix? Global exact
    dedup (md5(text), keep the lowest doc_id) is applied corpus-wide;
    per source, the total-variation distance between the PRE and POST
    distributions over (lang × length-band) cells, the survivor share,
    and the cell that moved most — the survivorship-bias audit a
    curation run keeps next to the dedup step (text_length_dup_bias
    answers "where do duplicates live" at corpus grain; this measures
    the induced per-source mix distortion).

    TV is the exact rational Σ|x·n_post − y·n_pre| / (2·n_pre·n_post)
    on BIGINT lanes (the ev_type_mix_drift_weekly construct); the
    top-mover tie-break is (|num| desc, lang asc, band asc). A source
    whose every doc loses the global keep-rule has no post
    distribution: n_post = 0 is guarded to an explicit NULL TV on both
    engines (Spark's ANSI ``div`` throws on a zero divisor; DuckDB's
    ``//`` returns NULL — the CASE makes the "mix shift undefined"
    readout engine-independent; pinned by the twin).

    Scale: one md5 groupBy for the winners, a semi join back on
    doc_id, then everything is (source × lang × band)-bounded."""
    d = (
        catalog.load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            "lang",
            F.expr(
                f"least(size(split(text, ' ')) div {QS_WB_DIV}, {QS_WB_CAP})"
            )
            .cast("long")
            .alias("wb"),
            F.md5("text").alias("sig"),
        )
        .localCheckpoint(eager=True)  # pre counts + winner semi join
    )
    winners = d.groupBy("sig").agg(F.min("doc_id").alias("doc_id"))
    post = d.join(winners.select("doc_id"), "doc_id", "semi")
    pre_c = d.groupBy("source", "lang", "wb").agg(
        F.count("*").cast("long").alias("x")
    )
    post_c = post.groupBy("source", "lang", "wb").agg(
        F.count("*").cast("long").alias("y")
    )
    cells = pre_c.join(post_c, ["source", "lang", "wb"], "left").select(
        "source",
        "lang",
        "wb",
        "x",
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    tot = cells.groupBy("source").agg(
        F.sum("x").cast("long").alias("n_pre"),
        F.sum("y").cast("long").alias("n_post"),
    )
    terms = cells.join(tot, "source").select(
        "source",
        "lang",
        "wb",
        "n_pre",
        "n_post",
        F.expr("abs(x * n_post - y * n_pre)").alias("num"),
    )
    agg = terms.groupBy("source").agg(
        F.sum("num").cast("long").alias("snum"),
        F.min("n_pre").alias("n_pre"),
        F.min("n_post").alias("n_post"),
    )
    wmv = W.partitionBy("source").orderBy(
        F.desc("num"), F.asc("lang"), F.asc("wb")
    )
    mover = (
        terms.withColumn("rn", F.row_number().over(wmv))
        .filter("rn = 1")
        .select(
            "source",
            F.expr("concat(lang, ':', cast(wb as string))").alias(
                "top_shift_cell"
            ),
        )
    )
    return (
        agg.join(mover, "source")
        .select(
            "source",
            "n_pre",
            "n_post",
            F.expr(rat_round6_spark("n_post", "n_pre")).alias(
                "kept_share_r6"
            ),
            F.expr(
                "case when n_post = 0 then cast(null as double) else "
                + rat_round6_spark("snum", "2 * n_pre * n_post")
                + " end"
            ).alias("mix_tv_r6"),
            "top_shift_cell",
        )
        .orderBy("source")
    )


ORACLE_DEDUP_QUALITY_SHIFT = f"""
WITH d AS (
  SELECT doc_id, source, lang,
         CAST(least(len(string_split(text, ' ')) // {QS_WB_DIV},
                    {QS_WB_CAP}) AS BIGINT) AS wb,
         md5(text) AS sig
  FROM documents),
winners AS (SELECT MIN(doc_id) AS doc_id FROM d GROUP BY sig),
post AS (SELECT d.* FROM d WHERE d.doc_id IN (SELECT doc_id FROM winners)),
pre_c AS (
  SELECT source, lang, wb, CAST(COUNT(*) AS BIGINT) AS x
  FROM d GROUP BY 1, 2, 3),
post_c AS (
  SELECT source, lang, wb, CAST(COUNT(*) AS BIGINT) AS y
  FROM post GROUP BY 1, 2, 3),
cells AS (
  SELECT p.source, p.lang, p.wb, p.x,
         CAST(COALESCE(q.y, 0) AS BIGINT) AS y
  FROM pre_c p LEFT JOIN post_c q
    ON p.source = q.source AND p.lang = q.lang AND p.wb = q.wb),
tot AS (
  SELECT source, CAST(SUM(x) AS BIGINT) AS n_pre,
         CAST(SUM(y) AS BIGINT) AS n_post
  FROM cells GROUP BY 1),
terms AS (
  SELECT c.source, c.lang, c.wb, t.n_pre, t.n_post,
         abs(c.x * t.n_post - c.y * t.n_pre) AS num
  FROM cells c JOIN tot t ON c.source = t.source),
agg AS (
  SELECT source, CAST(SUM(num) AS BIGINT) AS snum,
         CAST(MIN(n_pre) AS BIGINT) AS n_pre,
         CAST(MIN(n_post) AS BIGINT) AS n_post
  FROM terms GROUP BY 1),
mover AS (
  SELECT source, lang || ':' || CAST(wb AS VARCHAR) AS top_shift_cell
  FROM (SELECT source, lang, wb,
               ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY num DESC, lang, wb) AS rn
        FROM terms) WHERE rn = 1)
SELECT a.source, a.n_pre, a.n_post,
       {rat_round6_duck('a.n_post', 'a.n_pre')} AS kept_share_r6,
       CASE WHEN a.n_post = 0 THEN CAST(NULL AS DOUBLE)
            ELSE {rat_round6_duck('a.snum', '2 * a.n_pre * a.n_post')}
       END AS mix_tv_r6,
       m.top_shift_cell
FROM agg a JOIN mover m ON a.source = m.source
ORDER BY a.source
"""


SPECS = [
    QuerySpec(
        "orders_littles_law_audit",
        orders_littles_law_audit,
        ORACLE_LITTLES_LAW,
        ("orders", "queueing", "audit"),
        doc="Little's law L = lambda*W per priority class with an "
            "independent bucket-spine expansion reconciling the moment "
            "arithmetic (exact epoch-day integers)",
    ),
    QuerySpec(
        "stats_nelson_aalen_interarrival",
        stats_nelson_aalen_interarrival,
        ORACLE_NELSON_AALEN,
        ("stats", "survival", "events"),
        doc="Nelson-Aalen cumulative hazard of next-event arrival over "
            "per-user inter-event gaps with right-censored final gaps; "
            "every hazard term an exact ppb integer",
    ),
    QuerySpec(
        "text_readability_grid",
        text_readability_grid,
        ORACLE_READABILITY,
        ("text", "quality", "readability"),
        doc="LIX/RIX readability grid per (source, lang), micro-averaged "
            "exact rationals via the qrem split",
    ),
    QuerySpec(
        "emb_triplet_margin_rate",
        emb_triplet_margin_rate,
        ORACLE_TRIPLET_MARGIN,
        ("embedding", "audit", "metric"),
        doc="md5-deterministic triplet margin satisfaction per label on "
            "the 2^-20 integer grid (do labels induce a metric margin?)",
    ),
    QuerySpec(
        "sketch_ams_f2_error",
        sketch_ams_f2_error,
        ORACLE_AMS_F2,
        ("sketch", "agg"),
        doc="AMS/Tug-of-War F2 sketch (16 md5 sign lanes) vs exact second "
            "moment with a Chebyshev 5-sigma band certificate",
    ),
    QuerySpec(
        "corpus_dedup_quality_shift",
        corpus_dedup_quality_shift,
        ORACLE_DEDUP_QUALITY_SHIFT,
        ("text", "dedup", "audit"),
        doc="per-source (lang x length-band) mix TV shift induced by "
            "global exact dedup, with survivor share and top-moving cell",
    ),
]
