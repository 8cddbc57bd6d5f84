"""Skew-mitigation helpers: salted plans must be result-identical to the
direct plans (pure rewrites), and the salt must actually split hot keys."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from conftest import SF_DIR

from spark_dba_spark import catalog
from spark_dba_spark.functions.skew import salted_agg, salted_join, with_salt


def test_salted_agg_equals_direct(spark):
    li = catalog.load(spark, SF_DIR, "lineitem")
    direct = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"], r["mx"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"], r["l_linestatus"]): (r["n"], r["qty"], r["mx"])
        for r in salted_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            {
                "n": ("sum", F.count("*")),
                "qty": ("sum", F.sum(F.col("l_quantity").cast("decimal(25,6)"))),
                "mx": ("max", F.max("l_extendedprice")),
            },
            salt_from="l_orderkey",
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_equals_direct(spark):
    li = catalog.load(spark, SF_DIR, "lineitem")
    sup = catalog.load(spark, SF_DIR, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    direct = collections.Counter(
        (r["l_orderkey"], r["l_linenumber"], r["s_name"])
        for r in li.join(sup, "l_suppkey").select(
            "l_orderkey", "l_linenumber", "s_name"
        ).collect()
    )
    salted = collections.Counter(
        (r["l_orderkey"], r["l_linenumber"], r["s_name"])
        for r in salted_join(li, sup, "l_suppkey", n_salts=8)
        .select("l_orderkey", "l_linenumber", "s_name")
        .collect()
    )
    assert salted == direct


def test_salt_splits_hot_keys(spark):
    li = catalog.load(spark, SF_DIR, "lineitem")
    per_salt = (
        with_salt(li, "l_orderkey", n_salts=8)
        .groupBy("l_returnflag", "_salt")
        .count()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_salts_used"))
        .collect()
    )
    # each (hot) group must fan out over essentially all salt buckets
    assert all(r["n_salts_used"] >= 7 for r in per_salt)


def test_salted_join_rejects_outer(spark):
    import pytest as _pytest

    li = catalog.load(spark, SF_DIR, "lineitem")
    sup = catalog.load(spark, SF_DIR, "supplier")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(li, sup, "l_suppkey", how="full")


# ---------------------------------------------------------------------------
# Per-source window de-skew: sample_per_source (salt-and-re-rank) and
# pack_context_bins (two-pass sharded prefix sum). `source` is a power-law
# key at corpus scale, so the heavy window must NOT partition by source
# alone — and the rewrite must stay result-identical to the naive plan.
# ---------------------------------------------------------------------------

from pyspark.sql import Window as W  # noqa: E402

from spark_dba_spark.operators.text import (  # noqa: E402
    PACK_BIN_TOKENS,
    SAMPLE_PER_SOURCE_K,
    pack_context_bins,
    sample_per_source,
)


def _window_partition_specs(df):
    """Partition-key column name tuples of every Window in the optimized
    logical plan, parsed from windowspecdefinition(...)."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = []
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = [a.strip() for a in m.group(1).split(",")]
        # partition cols precede the "<col> ASC/DESC ..." ordering args
        cols = []
        for a in args:
            if " ASC" in a or " DESC" in a or a.startswith("specifiedwindowframe"):
                break
            cols.append(a.split("#")[0])
        specs.append(tuple(cols))
    return specs


def _naive_sample(docs):
    rank_key = F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("source").orderBy(rank_key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_SOURCE_K)
        .select("source", "doc_id")
    )


def _naive_pack(docs):
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    run_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        toks.withColumn("run_excl", run_excl)
        .withColumn("bin_id", F.expr(f"run_excl div {PACK_BIN_TOKENS}"))
        .groupBy("source", "bin_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
    )


def test_sample_per_source_plan_partitions_by_source_salt(spark):
    df = sample_per_source(spark, SF_DIR)
    specs = _window_partition_specs(df)
    # heavy stage-1 window keys on (source, salt); the re-rank window may
    # key on source alone — it only ever sees <= S*K rows per source.
    assert ("source", "salt") in specs, specs


def test_pack_context_bins_plan_partitions_by_source_shard(spark):
    df = pack_context_bins(spark, SF_DIR)
    specs = _window_partition_specs(df)
    assert ("source", "shard") in specs, specs
    # the only per-source window runs on the shard-totals side (tiny);
    # the per-doc running sum must key on (source, shard).


def _skewed_docs_dir(spark, tmp_path):
    """2000 docs, one 'big' source holding 90% of rows — the power-law
    shape that funnels a source-partitioned window into one task."""
    rows = []
    for i in range(2000):
        src = "big" if i % 10 != 0 else f"s{i % 5}"
        n_words = 1 + (i * 7) % 40
        text = " ".join(f"w{(i * 31 + j) % 97}" for j in range(n_words))
        rows.append((i, text, "en", src, len(text)))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_sample_per_source_skew_equals_naive(spark, tmp_path):
    d = _skewed_docs_dir(spark, tmp_path)
    docs = catalog.load(spark, d, "documents")
    got = {(r["source"], r["doc_id"]) for r in sample_per_source(spark, d).collect()}
    want = {(r["source"], r["doc_id"]) for r in _naive_sample(docs).collect()}
    assert got == want
    # the cap binds on the dominant source
    assert sum(1 for s, _ in got if s == "big") == SAMPLE_PER_SOURCE_K


def test_pack_context_bins_skew_equals_naive(spark, tmp_path):
    d = _skewed_docs_dir(spark, tmp_path)
    docs = catalog.load(spark, d, "documents")
    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in pack_context_bins(spark, d).collect()
    }
    want = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in _naive_pack(docs).collect()
    }
    assert got == want
    # skew actually exercised: the dominant source spans multiple shards
    # and multiple bins
    assert sum(1 for s, _ in got if s == "big") > 1
