"""Order-balanced A/B: pin the reduce-side parallelism of the postings /
banding groupBy (the CPU-dense pair-expansion stages that AQE coalesces
to ~6 tasks at local fixture sizes) by repartitioning on the grouping key
with an explicit count before the groupBy. The explicit keyed repartition
satisfies the aggregation's required distribution (no extra exchange) and
AQE does not coalesce user-specified partition counts, so the expansion
runs at defaultParallelism.

    python tools/exp_pin_expansion.py [--reps 5]

Verifies identical outputs before timing.
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
from spark_dba_spark.operators import dedup as D  # noqa: E402
from spark_dba_spark.operators.dedup import (  # noqa: E402
    JACCARD_TAU,
    MAX_DF,
    MINHASH_BANDS,
    MINHASH_PERMS,
    MINHASH_R,
    MINHASH_TAU,
    NGRAM,
    _docs_par,
    _minhash_stages,
)
from spark_dba_spark.functions.texts import word_ngrams  # noqa: E402


def _pair_sims_pinned(sh: DataFrame, pin: int) -> DataFrame:
    postings = (
        sh.repartition(pin, "sh")
        .groupBy("sh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") <= MAX_DF)
    )
    sizes = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    pairs = (
        postings.filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x as doc_a, y as doc_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sx = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sy = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return pairs.join(sx, "doc_a").join(sy, "doc_b")


def ngram_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_par(spark, sf_dir)
    sh = docs.select(
        "doc_id", F.explode(word_ngrams("text", NGRAM)).alias("sh")
    )
    pin = spark.sparkContext.defaultParallelism
    return (
        _pair_sims_pinned(sh, pin)
        .withColumn(
            "jaccard",
            F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def minhash_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _docs_par(spark, sf_dir)
        .select("doc_id", word_ngrams("text", NGRAM).alias("shingles"))
    )
    sig = docs.select(
        "doc_id",
        F.expr(
            "transform(array("
            "  transform(transform(shingles, x -> md5(x)), m -> array("
            "    cast(conv(substring(m, 1, 7), 16, 10) as bigint), "
            "    1 + cast(conv(substring(m, 9, 7), 16, 10) as bigint)))"
            f"), hpv -> transform(sequence(0, {MINHASH_PERMS - 1}), s -> "
            f"array_min(transform(hpv, h -> (h[0] + s * h[1]) % {D.MERSENNE31}))"
            "))[0]"
        ).alias("sig"),
    )
    bands = (
        sig.select(
            "doc_id",
            "sig",
            F.explode(F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1))).alias("b"),
        )
        .withColumn(
            "band_key",
            F.expr(
                f"concat(b, ':', concat_ws(',', transform("
                f"slice(sig, b * {MINHASH_R} + 1, {MINHASH_R}), "
                f"x -> cast(x as string))))"
            ),
        )
        .select("doc_id", "band_key")
    )
    pin = spark.sparkContext.defaultParallelism
    cand = (
        bands.repartition(pin, "band_key")
        .groupBy("band_key")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x as doc_a, y as doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    x = docs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sha"))
    y = docs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shb"))
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .filter(
            (F.size("sha") * 1.0 >= MINHASH_TAU * F.size("shb"))
            & (F.size("shb") * 1.0 >= MINHASH_TAU * F.size("sha"))
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sha", "shb"))
            * 1.0
            / F.size(F.array_union("sha", "shb")),
        )
        .filter(F.col("jaccard") >= MINHASH_TAU)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
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

    spark = get_spark("exp_pin_expansion")

    for label, base, var in (
        ("ngram", D.dedup_ngram_jaccard, ngram_pinned),
        ("minhash", D.dedup_minhash_lsh, minhash_pinned),
    ):
        ra = sorted(map(tuple, base(spark, args.sf).collect()))
        rb = sorted(map(tuple, var(spark, args.sf).collect()))
        assert ra == rb, f"{label}: variant output differs!"
        print(f"{label}: outputs identical ({len(ra)} rows)")

        a_t, b_t = [], []
        for i in range(args.reps):
            while load1() > args.gate:
                time.sleep(5)
            first, second = (base, var) if i % 2 == 0 else (var, base)
            t1 = wall(first, spark, args.sf)
            while load1() > args.gate:
                time.sleep(5)
            t2 = wall(second, spark, args.sf)
            fa, fb = (t1, t2) if i % 2 == 0 else (t2, t1)
            a_t.append(fa)
            b_t.append(fb)
            print(f"  rep {i}: base={fa:.3f}s pinned={fb:.3f}s "
                  f"(load {load1():.1f})")

        def stats(xs):
            ys = sorted(xs)
            return min(ys), ys[len(ys) // 2]

        print(f"{label} base   min/med: %.3f / %.3f" % stats(a_t))
        print(f"{label} pinned min/med: %.3f / %.3f" % stats(b_t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
