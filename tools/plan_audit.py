"""Physical-plan audit: captures `.explain("formatted")` for the headline
queries and checks the plan properties the 100 TB posture depends on —
filters pushed to the parquet scan, pruned read schemas, broadcast joins on
dimension tables, whole-stage codegen coverage, no cartesian products.

    python tools/plan_audit.py [--out PLANS.md] [names...]

Writes a markdown artifact with a per-query property table and the full
formatted plans, so plan regressions are visible in review diffs.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import registry  # noqa: E402
from spark_dba_spark.session import get_spark  # noqa: E402

# Queries where a pushed filter / pruned schema is structurally expected.
EXPECT_PUSHED = {
    "q01_pricing_summary", "q02_scan_filter_project", "q03_shipping_priority",
    "q05_local_supplier_volume", "q10_returned_item", "q06_forecast_revenue",
    "q14_promo_revenue",
}
EXPECT_BROADCAST = {
    "q03_shipping_priority", "q05_local_supplier_volume", "q10_returned_item",
    "join_broadcast_dim", "q07_volume_shipping", "q14_promo_revenue",
}


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, plan: str) -> dict:
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "pushed_filters": sum(1 for p in pushed if p.strip()),
        "scans": plan.count("Scan parquet") + plan.count("Scan binaryFile"),
        "read_cols": (
            max((len(s.split(",")) for s in read_schemas), default=0)
        ),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        # AQE formatted plans annotate operators with [codegen id : n]
        # instead of WholeStageCodegen(n) wrappers — count distinct spans
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\[codegen id : (\d+)\]", plan))
        ),
        "cartesian": plan.count("CartesianProduct"),
        "python_eval": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapCoGroupsInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("AggregateInPandas"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PLANS.md")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="audit every registered query")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("plan_audit")
    specs = registry.all_specs()
    if args.all:
        names = list(specs)
    else:
        names = args.names or list(registry.bench_specs()) + [
            "join_asof", "window_range_1h", "sim_ivf", "ev_user_state",
            "q06_forecast_revenue", "q07_volume_shipping", "q14_promo_revenue",
            "pipeline_clean_corpus", "dataset_split_hash", "dedup_keep_best",
            "udaf_geometric_mean", "grouped_zscore", "sim_dup_pairs",
        ]

    rows = []
    sections = []
    problems = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            continue
        df = spec.builder(spark, args.sf)
        try:
            df.collect()  # AQE: codegen ids + final plan appear post-execution
        except Exception:
            pass
        plan = formatted_plan(df)
        a = audit_one(name, plan)
        rows.append((name, a))
        # full plan text only for the headline set — the property table
        # covers everything; dumping 79 formatted plans buries the signal
        if name in registry.bench_specs() or name in EXPECT_BROADCAST:
            sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
        if a["cartesian"]:
            problems.append(f"{name}: CartesianProduct in plan")
        if name in EXPECT_PUSHED and not a["pushed_filters"]:
            problems.append(f"{name}: expected pushed filters, found none")
        if name in EXPECT_BROADCAST and not a["broadcast_joins"]:
            problems.append(f"{name}: expected a broadcast join, found none")

    lines = [
        "# Physical-plan audit",
        "",
        "Captured with `df.explain('formatted')` at sf0.01 "
        "(plan shape is SF-independent; AQE may re-plan at runtime).",
        "",
        "| query | scans | pushed filters | max read cols | bcast joins |"
        " SMJ | codegen spans | python stages | cartesian |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        lines.append(
            f"| {name} | {a['scans']} | {a['pushed_filters']} | "
            f"{a['read_cols']} | {a['broadcast_joins']} | {a['smj']} | "
            f"{a['codegen_spans']} | {a['python_eval']} | {a['cartesian']} |"
        )
    lines.append("")
    if problems:
        lines.append("## Findings")
        lines += [f"- **{p}**" for p in problems]
        lines.append("")
    lines += sections
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}; {len(problems)} finding(s)")
    for p in problems:
        print(" -", p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
