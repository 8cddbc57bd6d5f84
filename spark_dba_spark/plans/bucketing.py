"""Bucketed-table materialization: co-located, shuffle-free fact⋈fact joins.

At 100 TB the dominant cost of orders⋈lineitem-class joins is the shuffle
of both fact tables. Bucketing both sides by the join key with the same
bucket count ships that shuffle ONCE at write time; every subsequent join
reads co-located buckets and the planner drops the Exchange (and with
``sortBy``, the Sort) from the join — the plan audit asserts this.

This is the batch analogue of the reference's "write fewer, larger,
better-organized files" mission (its compactor controls file count; this
controls file *placement* by key). Tables are written as EXTERNAL parquet
tables (explicit ``path``) so the warehouse location is caller-owned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import catalog

DEFAULT_BUCKETS = 8

# table → bucket key for the TPC-H-ish fixture joins
BUCKET_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}


def materialize_bucketed(
    spark: SparkSession,
    sf_dir: str,
    base_path: str,
    tables: dict[str, str] | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    suffix: str = "bkt",
) -> dict[str, str]:
    """Write each table bucketed+sorted by its join key; returns the
    table names registered in the session catalog."""
    tables = tables or BUCKET_KEYS
    names = {}
    for tbl, key in tables.items():
        name = f"{tbl}_{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            catalog.load(spark, sf_dir, tbl)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", f"{base_path.rstrip('/')}/{name}")
            .mode("overwrite")
            .saveAsTable(name)
        )
        names[tbl] = name
    return names


def bucketed_orders_lineitem_join(
    spark: SparkSession, names: dict[str, str]
) -> DataFrame:
    """orders⋈lineitem on the bucket key — planner should produce a
    SortMergeJoin with NO Exchange on either side (bucketed scans are
    already hash-distributed by the join key)."""
    # merge hint: at fixture scale the planner would broadcast the small
    # side (also fine, also exchange-light), but the property under test is
    # the 100 TB shape — SortMergeJoin over co-bucketed scans, no Exchange.
    o = spark.table(names["orders"]).hint("merge")
    li = spark.table(names["lineitem"])
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "o_custkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
