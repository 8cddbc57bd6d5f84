from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import catalog  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"  # pytest runs at the smallest scale: fast


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def assert_matches_oracle(spark, duck, builder, oracle_sql, sf_dir=SF_DIR):
    sdf = builder(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    # Fetch through arrow (not fetchall): the driver's comparator sees arrow
    # types, so e.g. DuckDB HUGEINT→float64 drift must be visible locally too.
    atbl = res.fetch_arrow_table()
    drows = [tuple(d.values()) for d in atbl.to_pylist()]
    assert sorted(scols) == sorted(dcols), f"columns: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rows: {len(srows)} vs {len(drows)}"
    sn, dn = normalize_rows(srows, scols), normalize_rows(drows, dcols)
    for i, (a, b) in enumerate(zip(sn, dn)):
        assert a == b, f"row {i}: spark={a} duck={b}"
