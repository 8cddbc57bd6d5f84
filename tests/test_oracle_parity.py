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
    from spark_dba_spark.operators.relational import HLL_RSD

    li = catalog.load(spark, SF_DIR, "lineitem")
    # raw-estimate closeness (the op itself now emits the band
    # certificate, so the raw sketch is re-run here)
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", HLL_RSD).alias("est"),
            F.countDistinct("l_orderkey").alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["est"] - r["n"]) / r["n"] < 0.1
    # and the certificate surface itself must be all-green
    certs = SPECS["agg_approx_distinct"].builder(spark, SF_DIR).collect()
    assert certs and all(r["hll_band_ok"] for r in certs)


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

    from spark_dba_spark.operators.relational import APPROX_PCT_ACCURACY

    li = catalog.load(spark, SF_DIR, "lineitem")
    # raw-estimate closeness (the op itself now emits the GK rank
    # certificate, so the raw sketch is re-run here)
    approx = {
        r["l_returnflag"]: (r["p"][0], r["p"][1], r["p"][2])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], APPROX_PCT_ACCURACY
            ).alias("p")
        )
        .collect()
    }
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
    # and the certificate surface itself must be all-green
    certs = SPECS["agg_approx_percentiles"].builder(spark, SF_DIR).collect()
    assert certs
    for r in certs:
        assert r["p50_rank_ok"] and r["p90_rank_ok"] and r["p99_rank_ok"], r


def test_merge_delta_half_cent_tie(spark, tmp_path):
    """The r6/r7 driver red: any engine-native double→DECIMAL conversion
    in the money path is version- and path-dependent (TIES.md Class C),
    and ``round(revenue*0.001, 2)`` additionally hits an exact half-cent
    tie (revenue 1,741,255.00 → delta 1741.25500). The r8 rewrite is
    decimal-free — IEEE floor(x*100+0.5) quantization to BIGINT cents on
    BOTH engines — and this test PLANTS exact ties (update and insert
    paths) and asserts cell-level agreement, so the class can't
    regress."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.relational import (
        ORACLE_MERGE,
        merge_into_semantics,
    )

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([7, 8], pa.int64()),
                "c_name": ["a", "b"],
                "c_nationkey": pa.array([1, 1], pa.int32()),
                "c_acctbal": [100.00, 40.00],
                "c_mktsegment": ["BUILDING", "AUTOMOBILE"],
            }
        ),
        tmp_path / "customer.parquet",
    )
    d = datetime.datetime(1997, 6, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
                # 7: update path, revenue 1,741,255.00 → tie → 1741.26
                # 9: insert path, revenue 12,345.00 → tie → 12.35
                "o_custkey": pa.array([7, 7, 9, 9], pa.int64()),
                "o_orderstatus": ["F"] * 4,
                "o_totalprice": [1741000.00, 255.00, 12000.00, 345.00],
                "o_orderdate": pa.array([d] * 4, pa.timestamp("us")),
            }
        ),
        tmp_path / "orders.parquet",
    )
    got = {
        r["c_custkey"]: (r["balance_cents"], r["action"])
        for r in merge_into_semantics(spark, str(tmp_path)).collect()
    }
    # 10000 cents + half-up(174125.500) = 10000 + 174126
    assert got[7] == (184126, "update")
    assert got[8] == (4000, "carry")
    assert got[9] == (1235, "insert")  # half-up(1234.500)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    oracle = {
        r[0]: (r[2], r[3]) for r in con.execute(ORACLE_MERGE).fetchall()
    }
    con.close()
    assert oracle == got
