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
