"""The comparator itself is under test: local green must imply driver green.

The r4 incident class — DuckDB ``SUM(int)``/``count_if`` arriving through
Arrow as ``decimal128(38,0)`` while Spark emits ``bigint`` — passed the old
value-level comparator (``Decimal(5) == 5``) and hash-failed in the external
driver, which canonicalizes representations. These tests pin the strict
comparator's contract: representation drift FAILS locally, the cast-fixed
shape PASSES, and non-scalar (array/map) output columns FAIL because the
driver's pandas canonicalizer cannot sort them.
"""

from __future__ import annotations

import sys
from pathlib import Path
from types import SimpleNamespace

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import compare  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def duck_local():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    yield con
    con.close()


def _spec(builder, oracle):
    return SimpleNamespace(builder=builder, oracle=oracle)


def _count_by_flag(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(F.col("l_quantity") > 10, 1).otherwise(0)).alias("n"))
        .orderBy("l_returnflag")
    )


def test_uncast_hugeint_sum_fails_strict(spark, duck_local):
    """The exact r4 mechanism: an uncast SUM(CASE...) is HUGEINT →
    decimal128 via Arrow, and must fail the local gate even though every
    value compares equal."""
    spec = _spec(
        _count_by_flag,
        "SELECT l_returnflag, SUM(CASE WHEN l_quantity > 10 THEN 1 ELSE 0 END)"
        " AS n FROM lineitem GROUP BY 1 ORDER BY 1",
    )
    ok, msg, _ = compare("uncast", spark, duck_local, spec, SF_DIR)
    assert not ok
    assert "type representation" in msg
    assert "decimal" in msg


def test_cast_bigint_sum_passes_strict(spark, duck_local):
    spec = _spec(
        _count_by_flag,
        "SELECT l_returnflag, CAST(SUM(CASE WHEN l_quantity > 10 THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n FROM lineitem GROUP BY 1 ORDER BY 1",
    )
    ok, msg, _ = compare("cast", spark, duck_local, spec, SF_DIR)
    assert ok, msg


def test_uncast_count_if_fails_strict(spark, duck_local):
    def builder(spark, sf_dir):
        return (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.expr("count_if(l_quantity > 10)").alias("n"))
        )

    spec = _spec(
        builder, "SELECT count_if(l_quantity > 10) AS n FROM lineitem"
    )
    ok, msg, _ = compare("count_if", spark, duck_local, spec, SF_DIR)
    assert not ok
    assert "type representation" in msg


def test_array_output_column_fails_strict(spark, duck_local):
    """Top-level array columns break the driver's canonicalizer (r4
    emb_quantize_int8: 'unhashable type: numpy.ndarray') — the strict gate
    refuses them up front even when both engines agree."""

    def builder(spark, sf_dir):
        return (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(F.array_sort(F.collect_set("l_linestatus")).alias("vals"))
            .orderBy("l_returnflag")
        )

    spec = _spec(
        builder,
        "SELECT l_returnflag, list_sort(list_distinct(list(l_linestatus)))"
        " AS vals FROM lineitem GROUP BY 1 ORDER BY 1",
    )
    ok, msg, _ = compare("arraycol", spark, duck_local, spec, SF_DIR)
    assert not ok
    assert "non-scalar" in msg


def test_int_vs_float_representation_fails(spark, duck_local):
    """A float64 oracle against an int Spark column is representation
    drift even when the float values are whole numbers."""

    def builder(spark, sf_dir):
        return (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.count("*").alias("n"))
        )

    spec = _spec(
        builder, "SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lineitem"
    )
    ok, msg, _ = compare("intfloat", spark, duck_local, spec, SF_DIR)
    assert not ok
    assert "type representation" in msg
