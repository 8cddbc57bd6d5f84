"""Bucketed co-located joins: result-identical to the direct join, and the
physical plan must contain NO Exchange (the whole point of bucketing)."""

from __future__ import annotations

import collections
import contextlib
import io

from conftest import SF_DIR

from spark_dba_spark import catalog
from spark_dba_spark.plans.bucketing import (
    bucketed_orders_lineitem_join,
    materialize_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_no_exchange_and_correct(spark, tmp_path):
    names = materialize_bucketed(spark, SF_DIR, str(tmp_path), suffix="t1bkt")
    try:
        joined = bucketed_orders_lineitem_join(spark, names)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        o = catalog.load(spark, SF_DIR, "orders")
        li = catalog.load(spark, SF_DIR, "lineitem")
        direct = collections.Counter(
            map(
                tuple,
                o.join(li, o.o_orderkey == li.l_orderkey)
                .select(
                    "o_orderkey", "o_custkey", "l_linenumber",
                    "l_quantity", "l_extendedprice",
                )
                .collect(),
            )
        )
        assert collections.Counter(map(tuple, joined.collect())) == direct
    finally:
        for name in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_agg_no_exchange(spark, tmp_path):
    """Aggregation on the bucket key also skips its shuffle."""
    from pyspark.sql import functions as F

    names = materialize_bucketed(
        spark, SF_DIR, str(tmp_path), {"lineitem": "l_orderkey"}, suffix="t2bkt"
    )
    try:
        agg = (
            spark.table(names["lineitem"])
            .groupBy("l_orderkey")
            .agg(F.count("*").alias("n"))
        )
        assert "Exchange" not in _plan(agg)
        assert agg.count() > 0
    finally:
        for name in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
