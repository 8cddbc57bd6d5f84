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


def test_orc_roundtrip(spark, tmp_path):
    # read_folder/write_folder are format-generic: ORC goes through the
    # same native columnar path as parquet (pushdown + vectorized read).
    out = str(tmp_path / "orcout")
    df = spark.range(100).withColumn("v", F.col("id") * 3)
    readers.write_folder(df, out, fmt="orc", file_count=1)
    back = readers.read_folder(spark, out, fmt="orc")
    assert back.count() == 100
    assert back.agg(F.sum("v")).first()[0] == 14850
    assert back.filter(F.col("id") < 10).count() == 10


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


def test_m4_directory_predicate_semantics(spark, tmp_path):
    """Exact reference M4: files-only OK, dirs-only OK (partitioned root),
    mixed or foreign content rejected (HDFSAvroOperations.scala:56-75)."""
    from spark_dba_spark.sources.fsops import FsOps

    fs = FsOps(spark)
    files_only = tmp_path / "files"
    files_only.mkdir()
    (files_only / "a.parquet").write_bytes(b"x")
    (files_only / "_SUCCESS").write_bytes(b"")
    assert fs.is_valid_data_directory(str(files_only), "parquet")

    dirs_only = tmp_path / "root"
    (dirs_only / "dt=a").mkdir(parents=True)
    (dirs_only / "dt=b").mkdir()
    assert fs.is_valid_data_directory(str(dirs_only), "parquet")

    mixed = tmp_path / "mixed"
    (mixed / "dt=a").mkdir(parents=True)
    (mixed / "stray.parquet").write_bytes(b"x")
    assert not fs.is_valid_data_directory(str(mixed), "parquet")

    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "a.parquet").write_bytes(b"x")
    (foreign / "notes.txt").write_bytes(b"x")
    assert not fs.is_valid_data_directory(str(foreign), "parquet")

    empty = tmp_path / "empty"
    empty.mkdir()
    assert not fs.is_valid_data_directory(str(empty), "parquet")


def test_m5_strict_root_predicate(spark, tmp_path):
    """M5 (HDFSAvroOperations.scala:78-98): only data files allowed — any
    subdirectory disqualifies."""
    from spark_dba_spark.sources.fsops import FsOps

    fs = FsOps(spark)
    ok = tmp_path / "ok"
    ok.mkdir()
    (ok / "a.parquet").write_bytes(b"x")
    assert fs.is_valid_data_root_directory(str(ok), "parquet")

    with_dir = tmp_path / "wd"
    (with_dir / "sub").mkdir(parents=True)
    (with_dir / "a.parquet").write_bytes(b"x")
    assert not fs.is_valid_data_root_directory(str(with_dir), "parquet")


def test_m15_copy_from_local(spark, tmp_path):
    from spark_dba_spark.sources.fsops import FsOps

    fs = FsOps(spark)
    src = tmp_path / "local.txt"
    src.write_text("hello")
    dest_dir = tmp_path / "remote"
    dest = fs.copy_from_local(str(src), str(dest_dir))
    assert dest.endswith("/local.txt")
    assert (dest_dir / "local.txt").read_text() == "hello"
    assert src.exists()  # source kept
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        fs.copy_from_local(str(src), str(dest_dir))
    fs.copy_from_local(str(src), str(dest_dir), overwrite=True)


def test_qualified_uri_partition_paths(spark, tmp_path):
    """M22: file://-qualified root resolves to the same partition-relative
    paths as the bare path."""
    from spark_dba_spark.sources.fsops import FsOps

    fs = FsOps(spark)
    leaf = tmp_path / "src" / "dt=a"
    leaf.mkdir(parents=True)
    (leaf / "x.parquet").write_bytes(b"x")
    rel = fs.relative_partition(f"file://{tmp_path}/src", str(leaf))
    assert rel == "/dt=a"
    assert fs.relative_partition(str(tmp_path / "src"), f"file://{leaf}") == "/dt=a"
