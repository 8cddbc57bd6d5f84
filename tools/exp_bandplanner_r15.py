"""r15 VERDICT item 3: dedup_lsh_band_planner stage profile + A/B.

Profile: time each eager barrier of the shipped op (sig checkpoint,
buckets checkpoint, pairs checkpoint, truth checkpoint, final assemble).

Variant: (a) expand all four (bands, rpb) configs in ONE pass over the
checkpointed signatures via an exploded config literal array instead of a
4-branch union; (b) bucket on the raw (b, slice(sig,...)) struct instead
of a concat_ws string band key. Both are internal representation changes:
two docs share a string band key iff they share (b, slice) — the grouped
sets, and hence every output number, are identical by construction.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_dba_spark.operators.curation import PLANNER_CONFIGS
from spark_dba_spark.functions.numeric import rat_round6_spark
from spark_dba_spark.operators.dedup import MINHASH_TAU, _minhash_stages
from spark_dba_spark.registry import all_specs
from spark_dba_spark.session import get_spark


def planner_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, sig, _ = _minhash_stages(spark, sf_dir)
    sigc = sig.localCheckpoint(eager=True)
    cfg_lit = F.array(
        *[
            F.struct(F.lit(b).alias("bands"), F.lit(r).alias("rpb"))
            for b, r in PLANNER_CONFIGS
        ]
    )
    allb = (
        sigc.select("doc_id", "sig", F.explode(cfg_lit).alias("c"))
        .select(
            "doc_id",
            F.col("c.bands").alias("bands"),
            F.col("c.rpb").alias("rpb"),
            "sig",
            F.explode(F.expr("sequence(0, c.bands - 1)")).alias("b"),
        )
        .select(
            "doc_id",
            "bands",
            "rpb",
            F.struct(
                F.col("b"), F.expr("slice(sig, b * rpb + 1, rpb)").alias("k")
            ).alias("band_key"),
        )
    )
    buckets = (
        allb.groupBy("bands", "rpb", "band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .localCheckpoint(eager=True)
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
        .localCheckpoint(eager=True)
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
        .localCheckpoint(eager=True)
    )
    tr = truth.agg(F.count("*").cast("long").alias("n_true_ref"))
    cap = (
        pairs.join(truth, ["doc_a", "doc_b"])
        .groupBy("bands", "rpb")
        .agg(F.count("*").cast("long").alias("n_true_captured"))
    )
    spine = spark.createDataFrame(list(PLANNER_CONFIGS), "bands int, rpb int")
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


def profile_shipped(spark: SparkSession, sf_dir: str) -> None:
    """Re-run the shipped op's body with a timer after each barrier."""
    from spark_dba_spark.operators import curation as C
    from spark_dba_spark.operators.dedup import _minhash_stages as MS

    t = time.time()

    def lap(label: str) -> None:
        nonlocal t
        now = time.time()
        print(f"  {label}: {now - t:.3f}s", flush=True)
        t = now

    docs, sig, _ = MS(spark, sf_dir)
    sigc = sig.localCheckpoint(eager=True)
    lap("sig checkpoint")
    per_cfg = []
    for bn, r in PLANNER_CONFIGS:
        per_cfg.append(
            sigc.select(
                "doc_id", "sig",
                F.lit(bn).alias("bands"), F.lit(r).alias("rpb"),
                F.explode(F.sequence(F.lit(0), F.lit(bn - 1))).alias("b"),
            ).select(
                "doc_id", "bands", "rpb",
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
        .localCheckpoint(eager=True)
    )
    lap("buckets checkpoint")
    pairs = (
        buckets.select(
            "bands", "rpb",
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
        .localCheckpoint(eager=True)
    )
    lap("pairs checkpoint")
    up = pairs.select("doc_a", "doc_b").distinct()
    x = docs.select(F.col("doc_id").alias("doc_a"),
                    F.col("shingles").alias("sha"))
    y = docs.select(F.col("doc_id").alias("doc_b"),
                    F.col("shingles").alias("shb"))
    truth = (
        up.join(x, "doc_a").join(y, "doc_b")
        .filter(
            F.size(F.array_intersect("sha", "shb")) * 1.0
            / F.size(F.array_union("sha", "shb")) >= MINHASH_TAU
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    lap("truth checkpoint")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "4"))
    spark = get_spark("exp-bandplanner", driver_memory="16g")
    shipped = all_specs()["dedup_lsh_band_planner"].builder

    # Warm both shapes, compare outputs.
    rows_a = shipped(spark, sf_dir).collect()
    rows_b = planner_one_pass(spark, sf_dir).collect()
    same = [tuple(r) for r in rows_a] == [tuple(r) for r in rows_b]
    print(f"output identical: {same}  rows={len(rows_a)}", flush=True)
    if not same:
        print("A:", rows_a)
        print("B:", rows_b)
        spark.stop()
        return

    print("profile of shipped op (warm):", flush=True)
    profile_shipped(spark, sf_dir)

    a, b = [], []
    for i in range(runs):
        order = [("ship", shipped), ("onep", planner_one_pass)]
        if i % 2:
            order.reverse()
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"planner {name} pass {i}")
            t0 = time.time()
            fn(spark, sf_dir).collect()
            (a if name == "ship" else b).append(time.time() - t0)
    a.sort(), b.sort()
    print(f"shipped  min={a[0]:.3f} med={a[len(a)//2]:.3f} all={[round(x,3) for x in a]}")
    print(f"one-pass min={b[0]:.3f} med={b[len(b)//2]:.3f} all={[round(x,3) for x in b]}")
    spark.stop()


if __name__ == "__main__":
    main()
