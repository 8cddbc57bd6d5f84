"""End-to-end: streaming ingest → many small files → compaction.

This is the reference tool's reason to exist (small-files problem from
continuous ingest, README.md:8-10) reproduced with the engine's own
layers: a Structured Streaming job writes micro-batch parquet files into a
landing folder; the compactor then merges them with count verification and
an audit log. Closes the loop between the streaming and data-management
layers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_DIR

from spark_dba_spark import catalog
from spark_dba_spark.plans.compact import CompactionParams, compact
from spark_dba_spark.streaming.jobs import stream_events


def test_stream_ingest_then_compact(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    tgt = str(tmp_path / "compacted")

    # Ingest: repartition each micro-batch so the sink produces MANY small
    # files (the pathology the compactor exists for).
    q = (
        stream_events(spark, SF_DIR)
        .select("event_id", "user_id", "event_type", "value")
        .repartition(8)
        .writeStream.format("parquet")
        .option("path", landing)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    small_files = [
        f for f in os.listdir(landing)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert len(small_files) >= 8, small_files

    res = compact(
        spark, CompactionParams(source=landing, target=tgt, file_count=2)
    )
    assert res.success, res.errors
    out_files = [
        f for f in os.listdir(tgt)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert len(out_files) == 2
    assert os.path.exists(f"{tgt}/.defraglog")

    # record preservation across the whole chain
    n_src = catalog.load(spark, SF_DIR, "events").count()
    assert spark.read.parquet(tgt).count() == n_src
    # and the data is intact, not just counted: checksum a column
    src_sum = (
        catalog.load(spark, SF_DIR, "events")
        .agg(F.sum("event_id").alias("s"))
        .collect()[0]["s"]
    )
    assert (
        spark.read.parquet(tgt).agg(F.sum("event_id").alias("s")).collect()[0]["s"]
        == src_sum
    )
