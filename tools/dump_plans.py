"""Dump `.explain("formatted")` for the named registered queries to
<outdir>/<name>_<suffix>.txt — the plans/rNN before/after evidence files.

    python tools/dump_plans.py --out plans/r15 --suffix after [names...]
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import registry  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans", driver_memory="8g")
    specs = registry.all_specs()
    for name in args.names:
        df = specs[name].builder(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{args.suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
