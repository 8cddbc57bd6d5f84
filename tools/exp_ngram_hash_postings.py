"""r15 VERDICT item 1b experiment: hash-keyed inverted index for
dedup_ngram_jaccard.

The proposal (r14 verdict "Next round" #1b): key the postings index by a
fixed-width hash of the shingle instead of the shingle string, so the
groupBy("sh") exchange moves 8 bytes/row instead of a ~25-byte string,
with "collisions only ever ADDING candidates that the exact verify tail
then rejects".

The premise does not hold for this operator — dedup_ngram_jaccard HAS no
exact-verify tail. Its output (inter, na, nb, and the MAX_DF pruning set)
is computed FROM the index itself:

  * a collision between distinct shingles s1 != s2 merges their postings
    lists, so `inter` for any pair sharing the merged bucket is inflated;
  * `na`/`nb` count postings per doc AFTER pruning, so a collision that
    pushes a merged bucket over MAX_DF silently deletes a legitimate
    shingle (df <= MAX_DF on its own) from every doc's size — a FALSE
    NEGATIVE, not just a rejectable extra candidate;
  * the declared query's semantics (and its DuckDB oracle) are defined
    over exact string shingles, so output-identity would require zero
    collisions among the corpus's distinct shingles — unprovable at
    100 TB (billions of distinct shingles vs a 64-bit space is well past
    the birthday bound for "provably zero").

This harness still MEASURES the variant (on the fixture there happen to
be no collisions, so the numbers are comparable) to quantify the forgone
speedup, interleaved and load-gated per the round's A/B discipline.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F

from spark_dba_spark import catalog
from spark_dba_spark.functions.texts import word_ngrams
from spark_dba_spark.operators.dedup import (
    JACCARD_TAU,
    MAX_DF,
    NGRAM,
    dedup_ngram_jaccard,
)
from spark_dba_spark.session import get_spark


def ngram_jaccard_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-keyed variant: identical to dedup_ngram_jaccard except the
    postings groupBy key is xxhash64(sh). NOT output-identical in general
    (see module docstring); built only to measure the forgone win."""
    docs = catalog.load_par(spark, sf_dir, "documents", "doc_id")
    sh = docs.select(
        "doc_id", F.explode(word_ngrams("text", NGRAM)).alias("sh")
    ).select("doc_id", F.xxhash64("sh").alias("sh"))
    postings = (
        sh.groupBy("sh")
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
    return (
        pairs.join(sx, "doc_a")
        .join(sy, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("RUNS", "6"))
    spark = get_spark("exp-ngram-hash", driver_memory="16g")

    # Warm both shapes once (codegen/JIT), discard.
    dedup_ngram_jaccard(spark, sf_dir).collect()
    rows_h = ngram_jaccard_hashed(spark, sf_dir).collect()
    rows_b = dedup_ngram_jaccard(spark, sf_dir).collect()
    same = [tuple(r) for r in rows_b] == [tuple(r) for r in rows_h]
    print(f"fixture-identical output: {same}  ({len(rows_b)} rows)")

    def load1() -> float:
        return float(Path("/proc/loadavg").read_text().split()[0])

    a, b = [], []
    for i in range(runs):
        # order-balanced: alternate which variant goes first
        order = [("base", dedup_ngram_jaccard), ("hash", ngram_jaccard_hashed)]
        if i % 2:
            order.reverse()
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"ngram {name} pass {i}")
            t0 = time.time()
            fn(spark, sf_dir).collect()
            (a if name == "base" else b).append(time.time() - t0)
    a.sort(), b.sort()
    print(f"load1={load1():.2f}")
    print(f"base   min={a[0]:.3f} med={a[len(a)//2]:.3f} all={[round(x,3) for x in a]}")
    print(f"hashed min={b[0]:.3f} med={b[len(b)//2]:.3f} all={[round(x,3) for x in b]}")
    spark.stop()


if __name__ == "__main__":
    main()
