"""Auto-compacting ingest: threshold-triggered compaction inside a
foreachBatch sink, landing append-only, curated snapshot refreshed."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_dba_spark.streaming.maintenance import run_autocompacting_ingest

from test_compact import parquet_files, write_small_files


def test_autocompacting_ingest(spark, tmp_path):
    src = str(tmp_path / "src")
    write_small_files(src, n_files=4, rows_per_file=30, decoys=False)

    landing = str(tmp_path / "landing")
    curated = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    tmpf, trash = str(tmp_path / "tmpf"), str(tmp_path / "trash")
    os.makedirs(tmpf), os.makedirs(trash), os.makedirs(curated)

    stream = (
        spark.readStream.schema("id bigint, name string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    report = run_autocompacting_ingest(
        stream, landing, curated, ckpt, tmpf, trash,
        min_files=3, check_every=1, file_count=1,
    )
    assert report.batches == 4
    assert report.compactions, "threshold never fired"
    assert all(r.success for r in report.compactions), [
        r.errors for r in report.compactions
    ]
    # curated = one compacted snapshot of the full landing content
    assert len(parquet_files(curated)) == 1
    assert (
        spark.read.parquet(curated).count()
        == spark.read.parquet(landing).count()
        == 120
    )
    assert sorted(
        r["id"] for r in spark.read.parquet(curated).collect()
    ) == list(range(120))
    # landing untouched by compaction (append-only source preservation)
    assert len(parquet_files(landing)) >= 4
