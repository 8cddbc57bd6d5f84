"""Vacuous-green audit (VERDICT r12 "Next round" #5).

An operator whose result is 0 rows at EVERY fixture SF passes its oracle
check vacuously — both engines agree on the empty set no matter what the
code does (the ``dedup_cluster_pareto`` precedent: no exact-dup clusters
exist at sf0.001–0.1, so its fixture green proved nothing until a
planted-dups pytest twin pinned the actual curve). This tool makes that
coverage auditable:

    python tools/audit_zero_rows.py --round 13

reads the current round's three local sweep artifacts
(CORRECTNESS_LOCAL_r{N}.json / _sf0001 / _sf01 — which record ``n_rows``
per query since r13), lists every query with 0 rows at all SFs, and
requires each to name a PLANTED-DATA pytest twin in ``PLANTED_TWINS``
below. Exit 1 if any all-zero query is uncovered, or if a named twin
doesn't exist in tests/. Writes ZEROROWS_r{N}.md with the full table.

NULL-heavy-but-nonzero-rows outputs (e.g. join_asof_tolerance before its
r13 micro-fixture) are a different vacuity class this tool cannot see;
those are covered case-by-case by ADVICE-driven fixtures.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# every all-zero-rows query must name the pytest function(s) that feed it
# planted data and assert non-trivial behaviour
PLANTED_TWINS: dict[str, str] = {
    "dedup_cluster_pareto": "tests/test_r12_ops.py::test_cluster_pareto_planted_dups",
    # ZEROROWS_r13 finding: the fixture near-dup graph has no open
    # wedge at any SF, so every fixture run returns 0 predicted links
    "graph_common_neighbors": "tests/test_r13_ops.py::test_common_neighbors_planted_wedge",
    # same fixture fact (no open wedge in the dup graph at any SF),
    # same discipline: the r14 Adamic-Adar upgrade ships with its own
    # planted-wedge twin
    "graph_adamic_adar": "tests/test_r14_ops.py::test_adamic_adar_planted_wedge",
}

# Standing decisions on all-zero rows (VERDICT r13 #8: "decide and
# document in the audit"), rendered inline into ZEROROWS_r{N}.md:
DECISIONS: dict[str, str] = {
    "graph_common_neighbors": (
        "DECIDED r14: keep the planted twin; do NOT densify. The op "
        "predicts links over the PRODUCTION near-dup graph — the "
        "fixtures' dup graph genuinely has no open wedge at any SF, so "
        "an empty result is the correct answer, and loosening the "
        "near-dup threshold just to mint fixture wedges would change "
        "production semantics to flatter the test. The planted-wedge "
        "twin pins the non-trivial behaviour; the 3-SF zero rows stay "
        "as the honest fixture fact."
    ),
    "graph_adamic_adar": (
        "DECIDED r14 (same class as graph_common_neighbors): keep the "
        "planted twin, do not densify — the fixture dup graph has no "
        "open wedge, so the empty prediction set is correct; "
        "test_r14_ops.py::test_adamic_adar_planted_wedge pins the "
        "hub-discounting arithmetic on a planted wedge."
    ),
}


def _artifacts(rnd: int) -> list[Path]:
    stems = [
        f"CORRECTNESS_LOCAL_r{rnd:02d}.json",
        f"CORRECTNESS_LOCAL_r{rnd:02d}_sf0001.json",
        f"CORRECTNESS_LOCAL_r{rnd:02d}_sf01.json",
    ]
    return [REPO / s for s in stems]


def _twin_exists(ref: str) -> bool:
    if "::" not in ref:
        return False
    path, func = ref.split("::", 1)
    f = REPO / path
    if not f.exists():
        return False
    return re.search(rf"^def {re.escape(func)}\(", f.read_text(), re.M) is not None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()

    arts = _artifacts(args.round)
    missing = [a.name for a in arts if not a.exists()]
    if missing:
        print(f"missing sweep artifacts: {missing}", file=sys.stderr)
        return 2
    sweeps = [json.loads(a.read_text()) for a in arts]
    names = sorted(set().union(*[set(s) for s in sweeps]))

    rows = []
    problems = []
    for n in names:
        counts = [s.get(n, {}).get("n_rows") for s in sweeps]
        if any(c is None for c in counts):
            problems.append(f"{n}: n_rows missing from a sweep artifact")
            continue
        if all(c == 0 for c in counts):
            twin = PLANTED_TWINS.get(n)
            if twin is None:
                problems.append(f"{n}: 0 rows at every SF and NO planted twin")
            elif not _twin_exists(twin):
                problems.append(f"{n}: named twin {twin} does not exist")
            rows.append((n, counts, twin or "MISSING"))

    out = REPO / f"ZEROROWS_r{args.round:02d}.md"
    lines = [
        f"# Zero-row-fixture audit — round {args.round}",
        "",
        f"Queries audited: {len(names)} (three sweep SFs: 0.01 / 0.001 / 0.1).",
        f"All-zero-rows queries: {len(rows)}.",
        "",
        "| query | rows @sf0.01/0.001/0.1 | planted twin |",
        "|---|---|---|",
    ]
    for n, counts, twin in rows:
        lines.append(f"| {n} | {counts[0]}/{counts[1]}/{counts[2]} | `{twin}` |")
    if not rows:
        lines.append("| (none) | — | — |")
    lines += [
        "",
        "Every all-zero query must carry a planted-data pytest twin that",
        "feeds it synthetic rows and asserts the non-trivial behaviour the",
        "fixtures cannot exercise (VERDICT r12 #5; the dedup_cluster_pareto",
        "precedent).",
        "",
    ]
    decided = [n for n, _, _ in rows if n in DECISIONS]
    if decided:
        lines += ["## Decisions", ""]
        lines += [f"- `{n}`: {DECISIONS[n]}" for n in decided]
        lines.append("")
    if problems:
        lines += ["## PROBLEMS", ""] + [f"- {p}" for p in problems] + [""]
    out.write_text("\n".join(lines))
    print(f"wrote {out.name}: {len(rows)} all-zero queries, "
          f"{len(problems)} problems")
    for p in problems:
        print(f"  PROBLEM: {p}")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
