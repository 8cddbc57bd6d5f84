"""Local DuckDB-oracle parity checker — mirrors the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row count, column names, **output type
representation**, and values (order-insensitive, exact for non-floats, tiny
epsilon for floats). Use while iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]

The type check is the part that makes local green imply driver green: the
external driver canonicalizes both sides through Arrow/pandas and hashes the
*representation*, so a DuckDB ``SUM(int)`` arriving as ``decimal128(38,0)``
against Spark's ``bigint`` hash-mismatches even though every value is equal
(the r4 incident: q12/bool-agg/mix/pack-bins). Here both sides are mapped to
an arrow type-class (int / float / decimal / string / bool / date /
timestamp / list<...>) — Spark's from its DataFrame schema (the Spark→Arrow
mapping is deterministic, no second execution needed), DuckDB's from
``fetch_arrow_table().schema`` — and any class mismatch fails the query.
Top-level list/map/struct columns in an oracle-checked result also fail:
the driver's pandas canonicalizer cannot sort/factorize ndarray cells (the
r4 ``emb_quantize_int8`` error), so checked surfaces must be scalar.
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from spark_dba_spark import catalog, registry  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in catalog.TABLES:
        # Directory-based tables (e.g. the tools/gen_scale_fixtures.py sf1
        # substrate) hold part files; DuckDB needs the glob form for those.
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    def norm_cell(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, Decimal):
            # scale-insensitive but representation-class-preserving:
            # Decimal('5.00') and Decimal('5') normalize together, but a
            # plain int 5 stays distinct (repr sort keeps the tag visible)
            return ("dec", str(v.normalize()))
        if isinstance(v, list):
            return tuple(norm_cell(x) for x in v)
        return v

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _arrow_class(t: pa.DataType) -> str:
    """Collapse an arrow type to the class the driver's hash is sensitive
    to. Width within a class (int32 vs int64, float32 vs float64,
    decimal scale) canonicalizes identically through pandas; class
    crossings (int vs decimal128 vs float64) do not."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_class(t.value_type)}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def _spark_class(t: T.DataType) -> str:
    """Same classes, derived from the Spark schema (the Spark→Arrow type
    mapping is deterministic, so no second job run is needed)."""
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, (T.StringType, T.VarcharType, T.CharType)):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.ArrayType):
        return f"list<{_spark_class(t.elementType)}>"
    if isinstance(t, T.NullType):
        return "null"
    return t.simpleString()


_SCALAR_OK = {
    "bool", "int", "float", "decimal", "string", "binary", "date",
    "timestamp", "null",
}


def _class_compat(s: str, d: str) -> bool:
    # an all-NULL column can surface as null-typed on either side
    return s == d or "null" in (s, d)


def check_types(sdf, atbl: pa.Table) -> list[str]:
    """Return type-representation findings (empty == driver-safe)."""
    sclasses = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
    dclasses = {f.name: _arrow_class(f.type) for f in atbl.schema}
    problems = []
    for col in sclasses:
        sc, dc = sclasses[col], dclasses.get(col)
        if dc is None:
            continue  # column-name mismatch is reported separately
        if not _class_compat(sc, dc):
            problems.append(f"{col}: spark={sc} vs oracle={dc}")
        elif sc not in _SCALAR_OK:
            problems.append(
                f"{col}: non-scalar output class {sc} — the driver's "
                "pandas canonicalizer cannot sort complex cells"
            )
    return problems


def compare(
    name: str, spark, con, spec, sf_dir: str
) -> tuple[bool, str, int]:
    t0 = time.time()
    sdf = spec.builder(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    t_spark = time.time() - t0

    t0 = time.time()
    res = con.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    # Arrow path, matching the driver's comparator: type-representation
    # drift (e.g. HUGEINT→decimal128) must fail here before it fails there.
    atbl = res.fetch_arrow_table()
    drows = [tuple(d.values()) for d in atbl.to_pylist()]
    t_duck = time.time() - t0

    n_rows = len(srows)
    if sorted(scols) != sorted(dcols):
        return (
            False,
            f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}",
            n_rows,
        )
    type_problems = check_types(sdf, atbl)
    if type_problems:
        return (
            False,
            "type representation differs: " + "; ".join(type_problems),
            n_rows,
        )
    if len(srows) != len(drows):
        return (
            False,
            f"row count differs: spark={len(srows)} duck={len(drows)}",
            n_rows,
        )
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    if mism:
        i = mism[0]
        return False, (
            f"{len(mism)}/{len(sn)} rows differ; first at {i}:\n"
            f"  spark: {sn[i]}\n  duck : {dn[i]}"
        ), n_rows
    return (
        True,
        f"OK rows={n_rows} spark={t_spark:.2f}s duck={t_duck:.2f}s",
        n_rows,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json",
        default=None,
        help="write a driver-shaped correctness artifact (all queries) here",
    )
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="run under a vanilla foreign session (non-UTC timezone, 200 "
        "shuffle partitions, none of the engine's session defaults) — the "
        "shape the external driver uses; queries must self-establish any "
        "invariant they need",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = registry.all_specs()
    names = args.names or list(specs)
    if args.hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check_oracle_hostile")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.shuffle.partitions", "200")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark("check_oracle")
    con = duck_connection(args.sf)

    failures = []
    report: dict[str, dict] = {}
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"{name:35s} UNKNOWN")
            failures.append(name)
            continue
        if spec.oracle is None:
            n = spec.builder(spark, args.sf).count()
            print(f"{name:35s} rows-only rows={n}")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": n, "oracle_rows": None, "err": "no_oracle",
                "n_rows": n,
            }
            continue
        try:
            ok, msg, n_rows = compare(name, spark, con, spec, args.sf)
            err = None
        except Exception as exc:
            ok, msg, n_rows = False, f"EXCEPTION {type(exc).__name__}: {exc}", -1
            err = f"{type(exc).__name__}: {exc}"
        print(f"{name:35s} {'PASS' if ok else 'FAIL'} {msg}")
        report[name] = {
            # one comparator locally: rows/schema/values all checked inside
            # compare(); a single False marks every axis unconfirmed
            "rows_match": ok, "schema_match": ok, "hash_match": ok,
            "err": err,
            # fixture row count, consumed by tools/audit_zero_rows.py
            # (VERDICT r12 "Next round" #5): a 0 at every SF is a vacuous
            # green unless a planted-data pytest twin exists
            "n_rows": n_rows,
        }
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if args.json:
        import json

        Path(args.json).write_text(json.dumps(report, indent=2))
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
