"""Order-balanced A/B: dedup_lsh_band_planner (and siblings) with the
eager localCheckpoint chain vs letting AQE exchange reuse dedupe the
branches inside the one final plan.

The checkpointed form pays 4 sequential job barriers (sig -> buckets ->
pairs -> truth -> final); every checkpointed frame feeds >=2 branches, so
the question is whether ReusedExchange covers the branches as well as the
materialized checkpoint does, without the barrier latency.

    python tools/exp_planner_nockpt.py [--reps 5]

Prints per-variant min/median wall (noop-sink action) and verifies both
variants produce IDENTICAL sorted rows before timing.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spark_dba_spark.session import get_spark  # noqa: E402
from spark_dba_spark.operators import curation  # noqa: E402
from spark_dba_spark.operators.curation import (  # noqa: E402
    PLANNER_CONFIGS,
    rat_round6_spark,
)


def planner_nockpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_lsh_band_planner with every eager localCheckpoint removed."""
    from spark_dba_spark.operators.dedup import MINHASH_TAU, _minhash_stages

    docs, sig, _ = _minhash_stages(spark, sf_dir)
    sigc = sig  # << no checkpoint
    per_cfg = []
    for bn, r in PLANNER_CONFIGS:
        per_cfg.append(
            sigc.select(
                "doc_id",
                "sig",
                F.lit(bn).alias("bands"),
                F.lit(r).alias("rpb"),
                F.explode(F.sequence(F.lit(0), F.lit(bn - 1))).alias("b"),
            ).select(
                "doc_id",
                "bands",
                "rpb",
                F.expr(
                    f"concat(b, ':', concat_ws(',', transform("
                    f"slice(sig, b * {r} + 1, {r}), "
                    f"x -> cast(x as string))))"
                ).alias("band_key"),
            )
        )
    allb = per_cfg[0]
    for c in per_cfg[1:]:
        allb = allb.unionByName(c)
    buckets = (
        allb.groupBy("bands", "rpb", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    totals = buckets.groupBy("bands", "rpb").agg(
        F.count("*").cast("long").alias("n_buckets_multi"),
        F.sum(F.expr("size(ids) * (size(ids) - 1) div 2")).cast("long")
        .alias("cand_pairs_total"),
    )
    pairs = (
        buckets.select(
            "bands",
            "rpb",
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x as doc_a, y as doc_b))))"
                )
            ).alias("p"),
        )
        .select("bands", "rpb", "p.doc_a", "p.doc_b")
        .distinct()
    )
    pcnt = pairs.groupBy("bands", "rpb").agg(
        F.count("*").cast("long").alias("cand_pairs_distinct")
    )
    up = pairs.select("doc_a", "doc_b").distinct()
    x = docs.select(F.col("doc_id").alias("doc_a"),
                    F.col("shingles").alias("sha"))
    y = docs.select(F.col("doc_id").alias("doc_b"),
                    F.col("shingles").alias("shb"))
    truth = (
        up.join(x, "doc_a")
        .join(y, "doc_b")
        .filter(
            F.size(F.array_intersect("sha", "shb")) * 1.0
            / F.size(F.array_union("sha", "shb"))
            >= MINHASH_TAU
        )
        .select("doc_a", "doc_b")
    )
    tr = truth.agg(F.count("*").cast("long").alias("n_true_ref"))
    cap = (
        pairs.join(truth, ["doc_a", "doc_b"])
        .groupBy("bands", "rpb")
        .agg(F.count("*").cast("long").alias("n_true_captured"))
    )
    spine = spark.createDataFrame(
        list(PLANNER_CONFIGS), "bands int, rpb int"
    )
    return (
        spine.join(totals, ["bands", "rpb"], "left")
        .join(pcnt, ["bands", "rpb"], "left")
        .join(cap, ["bands", "rpb"], "left")
        .crossJoin(F.broadcast(tr))
        .select(
            "bands",
            "rpb",
            F.coalesce("n_buckets_multi", F.lit(0)).cast("long")
            .alias("n_buckets_multi"),
            F.coalesce("cand_pairs_total", F.lit(0)).cast("long")
            .alias("cand_pairs_total"),
            F.coalesce("cand_pairs_distinct", F.lit(0)).cast("long")
            .alias("cand_pairs_distinct"),
            "n_true_ref",
            F.coalesce("n_true_captured", F.lit(0)).cast("long")
            .alias("n_true_captured"),
            F.expr(
                "case when n_true_ref > 0 then "
                + rat_round6_spark(
                    "coalesce(n_true_captured, 0)", "n_true_ref"
                )
                + " end"
            ).alias("recall_r6"),
        )
        .orderBy("rpb")
    )


def wall(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def load1() -> float:
    return float(Path("/proc/loadavg").read_text().split()[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--gate", type=float, default=2.5)
    args = ap.parse_args()

    spark = get_spark("exp_planner_nockpt")
    base = curation.dedup_lsh_band_planner

    rows_a = sorted(map(tuple, base(spark, args.sf).collect()))
    rows_b = sorted(map(tuple, planner_nockpt(spark, args.sf).collect()))
    assert rows_a == rows_b, "variant output differs!"
    print(f"outputs identical ({len(rows_a)} rows)")

    a_t, b_t = [], []
    for i in range(args.reps):
        while load1() > args.gate:
            time.sleep(5)
        first, second = (base, planner_nockpt) if i % 2 == 0 else (
            planner_nockpt, base)
        t1 = wall(first, spark, args.sf)
        while load1() > args.gate:
            time.sleep(5)
        t2 = wall(second, spark, args.sf)
        fa, fb = (t1, t2) if i % 2 == 0 else (t2, t1)
        a_t.append(fa)
        b_t.append(fb)
        print(f"rep {i}: ckpt={fa:.3f}s nockpt={fb:.3f}s (load {load1():.1f})")

    def stats(xs):
        ys = sorted(xs)
        return min(ys), ys[len(ys) // 2]

    print("ckpt   min/med: %.3f / %.3f" % stats(a_t))
    print("nockpt min/med: %.3f / %.3f" % stats(b_t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
