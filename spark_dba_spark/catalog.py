"""Fixture-table catalog: schema-stable loaders over the driver parquet.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file (or directory) per table under
``{sf_dir}/{name}.parquet``.

Loaders return plain DataFrames so Catalyst keeps full pushdown/pruning
freedom — no caching, no materialization here. The only normalization is the
``events.ts`` column: the fixture stores parquet TIMESTAMP(NANOS) which Spark
reads (under ``nanosAsLong``) as a raw long; we convert to TIMESTAMP_NTZ
(microsecond truncation) which is exactly what DuckDB's reader does, keeping
the oracle comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_session_invariants

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (lazy scan, pushdown-friendly)."""
    ensure_session_invariants(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events(df)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    # Under spark.sql.legacy.parquet.nanosAsLong the ts column arrives as
    # long nanoseconds. `div` keeps the arithmetic integral (a double round
    # trip would lose precision past 2^53), truncating to microseconds just
    # like DuckDB's TIMESTAMP_NS -> TIMESTAMP coercion; cast through the
    # UTC session to TIMESTAMP_NTZ so the value is timezone-independent.
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL front door)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
