"""Z-order layout: Morton-key correctness, per-file locality on every
clustered column, and compaction integration."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from spark_dba_spark.functions.layout import (
    interleave_bits,
    quantize_minmax,
    zorder_key,
    zorder_sort_within_partitions,
)
from spark_dba_spark.plans.compact import CompactionParams, compact


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_reference_morton(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.withColumn(
        "z", interleave_bits([F.col("x"), F.col("y")], bits=3)
    ).collect()
    for r in got:
        assert r["z"] == _morton2(r["x"], r["y"], 3)


def test_quantize_minmax_edges(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    got = [
        r[0]
        for r in df.select(
            quantize_minmax(F.col("v"), 0.0, 100.0, bits=4)
        ).collect()
    ]
    assert got[0] == 0
    assert got[-1] == 15  # top edge clamps into the last bucket
    assert 0 < got[1] < 15


def test_zorder_locality_beats_single_sort(spark, tmp_path):
    """Split a 2-D grid into 4 runs of rows: under a z-order sort each
    quarter spans about half of EACH dimension; under a single-column sort
    the second column spans its full range in every quarter."""
    rows = [(float(x), float(y)) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "a double, b double").coalesce(1)

    def quarter_spans(sorted_df, col):
        data = [(r["a"], r["b"]) for r in sorted_df.collect()]
        n = len(data) // 4
        spans = []
        for k in range(4):
            chunk = data[k * n:(k + 1) * n]
            vals = [c[1] if col == "b" else c[0] for c in chunk]
            spans.append(max(vals) - min(vals))
        return sum(spans) / 4

    z_sorted = zorder_sort_within_partitions(df, ["a", "b"])
    a_sorted = df.sortWithinPartitions("a")
    # single-column sort: every quarter spans (nearly) all of b
    assert quarter_spans(a_sorted, "b") >= 30
    # z-order: each quarter covers about half of b's range
    assert quarter_spans(z_sorted, "b") <= 20
    assert quarter_spans(z_sorted, "a") <= 20


def test_compact_with_zorder_preserves_rows(spark, tmp_path):
    src = tmp_path / "src"
    rows = [(i % 50, (i * 7) % 50, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "a long, b long, payload long")
    df.repartition(8).write.parquet(str(src))
    assert len(glob.glob(str(src / "*.parquet"))) >= 8

    target = tmp_path / "out"
    res = compact(
        spark,
        CompactionParams(
            source=str(src),
            target=str(target),
            file_count=2,
            zorder_by=("a", "b"),
        ),
    )
    assert res.success, res.errors
    back = spark.read.parquet(str(target))
    assert back.count() == 2000
    assert back.agg(F.sum("payload")).first()[0] == sum(r[2] for r in rows)
    # Layout really clustered: within each output file the row sequence is
    # non-decreasing in the Morton key (recomputed here over the leaf's
    # known 0-49 domain). A compactor that skipped the z-sort would leave
    # the repartition-shuffled order and fail this.
    files = glob.glob(str(target / "*.parquet"))
    assert len(files) == 2
    for f in files:
        one = spark.read.parquet(f).coalesce(1)
        keys = [
            r["z"]
            for r in one.select(
                interleave_bits(
                    [
                        quantize_minmax(F.col("a"), 0.0, 49.0),
                        quantize_minmax(F.col("b"), 0.0, 49.0),
                    ]
                ).alias("z")
            ).collect()
        ]
        assert keys == sorted(keys), f"{f} is not z-ordered"


def test_zorder_sortby_mutually_exclusive(spark, tmp_path):
    src = tmp_path / "s2"
    spark.range(100).withColumn("b", F.col("id") % 5).write.parquet(str(src))
    res = compact(
        spark,
        CompactionParams(
            source=str(src),
            target=str(tmp_path / "t2"),
            sort_by=("id",),
            zorder_by=("id", "b"),
        ),
    )
    assert not res.success
    assert any("mutually exclusive" in e for e in res.errors)


def test_zorder_degenerate_and_wide_columns(spark):
    """All-NULL / non-numeric columns degrade to a constant bucket (no
    crash); 4 columns auto-scale bits so the key fits a signed long."""
    df = spark.createDataFrame(
        [(i, None) for i in range(20)], "a long, b string"
    ).coalesce(1)
    assert zorder_sort_within_partitions(df, ["a", "b"]).count() == 20

    df4 = spark.createDataFrame(
        [(i, i * 2, i * 3, i * 5) for i in range(10)],
        "a long, b long, c long, d long",
    ).coalesce(1)
    assert (
        zorder_sort_within_partitions(df4, ["a", "b", "c", "d"]).count() == 10
    )

    empty = spark.createDataFrame([], "a long, b long").coalesce(1)
    assert zorder_sort_within_partitions(empty, ["a", "b"]).count() == 0
