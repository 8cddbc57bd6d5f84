"""Source/sink layer: recursive scans, schema ladder, JSON-infer roundtrip
(TemplateApp parity), partitioned writes, property-based record preservation."""

from __future__ import annotations

import collections
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spark_dba_spark.plans.compact import CompactionParams, compact
from spark_dba_spark.sources import readers
from test_compact import parquet_files, write_small_files


def test_recursive_read(spark, tmp_path):
    write_small_files(f"{tmp_path}/a/b", n_files=2)
    write_small_files(f"{tmp_path}/a/c", n_files=3, start=500)
    df = readers.read_folder(spark, str(tmp_path / "a"))
    assert df.count() == 125


def test_read_with_ddl_schema(spark, tmp_path):
    write_small_files(str(tmp_path / "d"), n_files=2, decoys=False)
    df = readers.read_folder(
        spark, str(tmp_path / "d"), schema="id BIGINT, name STRING, extra DOUBLE"
    )
    assert [f.name for f in df.schema] == ["id", "name", "extra"]
    assert df.filter(F.col("extra").isNull()).count() == 50


def test_json_infer_roundtrip(spark, tmp_path):
    write_small_files(str(tmp_path / "j"), n_files=2, decoys=False)
    df = readers.read_folder(spark, str(tmp_path / "j"))
    round_tripped = readers.json_infer_roundtrip(spark, df)
    assert round_tripped.count() == df.count()
    assert set(round_tripped.columns) == set(df.columns)


def test_csv_roundtrip(spark, tmp_path):
    src = str(tmp_path / "csvsrc")
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    df.coalesce(1).write.option("header", "true").csv(src)
    back = readers.read_csv(spark, src, schema="id BIGINT, v BIGINT")
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == 9900


def test_partitioned_write(spark, tmp_path):
    out = str(tmp_path / "partout")
    df = spark.range(100).withColumn("bucket", F.col("id") % 4)
    readers.write_folder(df, out, partition_by=["bucket"], file_count=1)
    assert {f"bucket={i}" for i in range(4)} <= set(os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == 100


def test_max_records_per_file(spark, tmp_path):
    out = str(tmp_path / "mrpf")
    readers.write_folder(
        spark.range(100).coalesce(1), out, max_records_per_file=30
    )
    assert len(parquet_files(out)) == 4  # ceil(100/30)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    file_sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=2,
                        max_size=5),
    file_count=st.integers(min_value=1, max_value=3),
)
def test_compaction_preserves_any_multiset(spark, tmp_path_factory, file_sizes,
                                           file_count):
    """Property (SURVEY.md §5.2.4): rows in == rows out for arbitrary
    generated frames, any requested file count."""
    base = tmp_path_factory.mktemp("prop")
    src, tgt = str(base / "src"), str(base / "tgt")
    expected = []
    start = 0
    for i, n in enumerate(file_sizes):
        expected += write_small_files(
            src, n_files=1, rows_per_file=n, start=start, prefix=f"f{i}",
            decoys=False,
        )
        start += n
    res = compact(
        spark, CompactionParams(source=src, target=tgt, file_count=file_count)
    )
    assert res.success, res.errors
    got = [
        (r["id"], r["name"], None)
        for r in spark.read.parquet(tgt).collect()
    ]
    assert collections.Counter(got) == collections.Counter(expected)
    assert len(parquet_files(tgt)) == min(file_count, len(file_sizes))
