"""Per-query phase profiler for the headline bench set (guide §1).

For each bench-flagged query, after the same warm-up protocol as bench.py:

- ``build``   — wall seconds to CALL the builder (plan construction: py4j
  traffic, parquet footer reads, any driver-side jobs the builder runs);
- ``collect`` — wall seconds for ``.collect()`` on a freshly built plan
  (the driver bench's timed action);
- ``noop``    — wall seconds for the noop sink on a freshly built plan
  (computes every column, excludes result pickling to Python — guide §1.4).

Optionally (--plans DIR) writes ``DIR/<name>_<tag>.txt`` with
``.explain('formatted')`` for every bench query.

Usage: python tools/bench_profile.py [--plans plans/r14 --tag before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import registry  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench_profile", driver_memory="16g")
    specs = registry.bench_specs()
    if args.only:
        keep = set(args.only.split(","))
        specs = {k: v for k, v in specs.items() if k in keep}

    # warm-up identical in spirit to bench.py
    from pyspark.sql import functions as F

    warm = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    warm.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")), F.count("*")
    ).collect()
    spark.range(256).repartition(8).mapInPandas(lambda it: it, "id bigint").count()
    for spec in specs.values():
        try:
            spec.builder(spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

    if args.plans:
        Path(args.plans).mkdir(parents=True, exist_ok=True)
        for name, spec in specs.items():
            df = spec.builder(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            Path(args.plans, f"{name}_{args.tag}.txt").write_text(txt)

    out: dict[str, dict[str, float]] = {}
    for name, spec in specs.items():
        spark.sparkContext.setJobDescription(f"profile:{name}")
        builds, collects, noops = [], [], []
        for _ in range(args.runs):
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            t1 = time.time()
            df.collect()
            t2 = time.time()
            df2 = spec.builder(spark, sf_dir)
            t3 = time.time()
            df2.write.format("noop").mode("overwrite").save()
            t4 = time.time()
            builds.append(t1 - t0)
            collects.append(t2 - t1)
            noops.append(t4 - t3)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "build": round(min(builds), 3),
            "collect": round(min(collects), 3),
            "noop": round(min(noops), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"profile": out, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
