"""Auto-compacting ingest: the reference's reason-to-exist, automated.

The reference tool exists because continuous ingest produces many small
files that are later merged by a manually-invoked job (README.md:8-10).
This module closes that loop: a ``foreachBatch`` sink appends micro-batch
output to a landing folder and, every ``check_every`` batches, consults
:func:`spark_dba_spark.plans.stats.needs_compaction`; when the landing
folder crosses the small-files threshold it runs the transactional
compactor into a curated folder (trash-then-swap, count-verified).

Concurrency note: compaction runs BETWEEN micro-batches inside the
foreachBatch callback — Structured Streaming serializes the callback, so
the landing snapshot is stable during the merge. If an external writer
raced us anyway, C4 (source-unchanged recheck) aborts the swap — the same
protection the reference relies on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..plans.compact import CompactionParams, CompactionResult, compact
from ..plans.stats import folder_stats, needs_compaction
from ..sources.fsops import FsOps


@dataclass
class MaintenanceReport:
    batches: int = 0
    compactions: list[CompactionResult] = field(default_factory=list)


def run_autocompacting_ingest(
    stream_df: DataFrame,
    landing: str,
    curated: str,
    checkpoint: str,
    tmp_folder: str,
    trash_folder: str,
    min_files: int = 4,
    small_ratio: float = 0.5,
    check_every: int = 1,
    file_count: int | None = None,
    small_threshold_bytes: int = 32 * 1024 * 1024,
) -> MaintenanceReport:
    """availableNow ingest of ``stream_df`` into ``landing`` with
    threshold-triggered compaction into ``curated``. Returns per-run
    report (batch count + every compaction result).

    Lifecycle: ``landing`` stays append-only (the compactor never mutates
    its source, same as the reference); ``curated`` holds the latest
    compacted snapshot, with the previous snapshot recoverable from
    ``trash_folder`` after every refresh (C5)."""
    report = MaintenanceReport()
    spark = stream_df.sparkSession

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(landing)
        report.batches += 1
        if report.batches % check_every != 0:
            return
        fs = FsOps(spark)
        stats = folder_stats(
            fs, landing, "parquet", small_threshold_bytes=small_threshold_bytes
        )
        if not needs_compaction(stats, min_files=min_files, small_ratio=small_ratio):
            return
        res = compact(
            spark,
            CompactionParams(
                source=landing,
                target=curated,
                file_count=file_count,
                overwrite=True,
                tmp_folder=tmp_folder,
                trash_folder=trash_folder,
            ),
        )
        report.compactions.append(res)

    q = (
        stream_df.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return report
