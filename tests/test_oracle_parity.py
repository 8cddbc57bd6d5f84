"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver's own gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from spark_dba_spark import registry

from conftest import SF_DIR, assert_matches_oracle

SPECS = registry.all_specs()


@pytest.mark.parametrize(
    "name", [n for n, s in SPECS.items() if s.oracle is not None]
)
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    assert_matches_oracle(spark, duck, spec.builder, spec.oracle)


@pytest.mark.parametrize(
    "name", [n for n, s in SPECS.items() if s.oracle is None]
)
def test_rows_only_queries_run(spark, name):
    df = SPECS[name].builder(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_approx_distinct_close_to_exact(spark):
    from pyspark.sql import functions as F

    from spark_dba_spark import catalog

    li = catalog.load(spark, SF_DIR, "lineitem")
    approx = SPECS["agg_approx_distinct"].builder(spark, SF_DIR).collect()
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    for row in approx:
        rel_err = abs(row["approx_orders"] - exact[row["l_returnflag"]]) / exact[
            row["l_returnflag"]
        ]
        assert rel_err < 0.1


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_sketch_top_k_close_to_exact(spark):
    from pyspark.sql import functions as F

    from spark_dba_spark import catalog
    from spark_dba_spark.operators.relational import SKETCH_TOP_K

    got = {
        r["l_suppkey"]: r["est_count"]
        for r in SPECS["sketch_top_k_heavy_hitters"].builder(spark, SF_DIR).collect()
    }
    assert len(got) == SKETCH_TOP_K
    li = catalog.load(spark, SF_DIR, "lineitem")
    exact = {
        r["l_suppkey"]: r["n"]
        for r in li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "l_suppkey")
        .limit(SKETCH_TOP_K * 2)  # tolerate rank swaps near the cut
        .collect()
    }
    # every sketched heavy hitter is a genuine near-top key with a count
    # estimate within 2% of its exact count
    for k, est in got.items():
        assert k in exact, (k, exact)
        assert abs(est - exact[k]) <= max(1, 0.02 * exact[k])


def test_approx_percentiles_close_to_exact(spark):
    from pyspark.sql import functions as F

    from spark_dba_spark import catalog

    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in SPECS["agg_approx_percentiles"].builder(spark, SF_DIR).collect()
    }
    li = catalog.load(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r["p"]
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("p"))
        .collect()
    }
    for flag, (a50, a90, a99) in approx.items():
        e50, e90, e99 = exact[flag]
        for a, e in ((a50, e50), (a90, e90), (a99, e99)):
            assert abs(a - e) / e < 0.02, (flag, a, e)
