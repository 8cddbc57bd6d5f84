"""User-defined-function surface: pandas UDAF (grouped aggregate) and
grouped-map ``applyInPandas``.

The engine's operators deliberately stay in JVM expressions; these two
exist to prove the extension surface a user would plug custom logic into
(SURVEY.md §2.4 "UDF/UDAF/UDTF → pandas_udf / applyInPandas"), wired the
fast way: Arrow-batched, vectorized numpy inside, and oracle-checked
because both semantics have exact SQL twins.

Scale: a grouped-aggregate pandas UDF executes as a real partial-free
hash aggregation over Arrow batches per group; applyInPandas shuffles
once on the group key and holds ONE group per call in memory — both are
the documented contracts, no driver involvement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import catalog
from ..registry import QuerySpec


def udaf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of order totals per priority — a numeric UDAF Spark
    lacks as a built-in, via @pandas_udf grouped-agg (one Arrow batch
    stream per group, numpy log/exp inside)."""

    @F.pandas_udf("double")
    def gmean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    orders = catalog.load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(gmean("o_totalprice"), 4).alias("gmean_price"))
        .orderBy("o_orderpriority")
    )


ORACLE_GMEAN = """
SELECT o_orderpriority,
       ROUND(exp(avg(ln(o_totalprice))), 4) AS gmean_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation z-score of customer balances via grouped-map
    ``applyInPandas`` — the custom-transform extension point (each call
    sees one whole group as a pandas frame). Sample stddev, 4 dp."""
    out_schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("z_r4", T.DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["c_acctbal"].to_numpy(dtype=np.float64)
        sd = v.std(ddof=1) if len(v) > 1 else 0.0
        z = (v - v.mean()) / sd if sd > 0 else np.zeros_like(v)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "z_r4": np.round(z, 4),
            }
        )

    cust = catalog.load(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_nationkey", "c_acctbal")
        .groupBy("c_nationkey")
        .applyInPandas(zscore, out_schema)
        .orderBy("c_custkey")
    )


ORACLE_ZSCORE = """
SELECT c_custkey, c_nationkey,
       ROUND(CASE WHEN cnt > 1 AND sd > 0
                  THEN (c_acctbal - mu) / sd ELSE 0.0 END, 4) AS z_r4
FROM (
  SELECT c_custkey, c_nationkey, c_acctbal,
         AVG(c_acctbal) OVER w AS mu,
         STDDEV_SAMP(c_acctbal) OVER w AS sd,
         COUNT(*) OVER w AS cnt
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey))
ORDER BY c_custkey
"""


def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface — one input row fans out to N
    output rows from arbitrary Python, consumed via LATERAL join. Splits
    each document into '. '-delimited sentences and emits per-sentence
    word counts; the report aggregates back to per-doc sentence stats so
    the checked output is scalar.

    UDTFs are row-at-a-time Python — the SLOW extension path, kept off
    the bench set deliberately (the engine's own operators use JVM
    expressions or Arrow-batched pandas; this exists to prove the
    extension point, mirroring how lateral_posexplode proves the built-in
    generator path)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, n_words int")
    class SentenceStats:
        def eval(self, text: str):
            if text is None:
                return
            for i, sent in enumerate(text.split(". ")):
                yield i, len(sent.split(" ")) if sent else 0

    spark.udtf.register("sentence_stats", SentenceStats)
    docs = catalog.load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, COUNT(*) AS n_sents,
               CAST(SUM(n_words) AS BIGINT) AS total_words,
               MAX(n_words) AS max_sent_words
        FROM _udtf_docs, LATERAL sentence_stats(text)
        GROUP BY doc_id ORDER BY doc_id
        """
    )


ORACLE_SENTENCE_STATS = """
SELECT doc_id, COUNT(*) AS n_sents,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       MAX(n_words) AS max_sent_words
FROM (
  SELECT doc_id,
         CASE WHEN sent = '' THEN 0
              ELSE len(string_split(sent, ' ')) END AS n_words
  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS sent
        FROM documents))
GROUP BY doc_id ORDER BY doc_id
"""


SPECS = [
    QuerySpec("udaf_geometric_mean", udaf_geometric_mean, ORACLE_GMEAN,
              ("udf", "agg"), doc="pandas grouped-agg UDAF"),
    QuerySpec("grouped_zscore", grouped_zscore, ORACLE_ZSCORE,
              ("udf", "grouped-map"), doc="applyInPandas grouped transform"),
    QuerySpec("udtf_sentence_stats", udtf_sentence_stats,
              ORACLE_SENTENCE_STATS, ("udf", "udtf", "lateral"),
              doc="Python UDTF + LATERAL join (table-function extension "
                  "surface)"),
]
