"""Deterministic local scale-up of the driver fixtures (perf substrate only).

The driver ships sf0.001/0.01/0.1 (max 17 MB total) — too small to measure
core-count scaling: at sf0.1 every bench query is sub-second and fixed
per-query overhead caps the observable 8→32-core ratio at ~1.4 (VERDICT r14
"What's wrong" #5). This tool synthesizes a ~10× set (sf≈1) by replicating
sf0.1 R times with consistent key remapping, WITHOUT touching /root/testdata
or the driver contract (bench.py defaults are unchanged; point
$SPARK_GRAFT_SF_DIR at the output to use it).

Design (all deterministic, no RNG outside seeded per-row generators):

- Dimension tables ``region``/``nation`` are copied as-is (bounded in TPC-H).
- Keyed tables get replica i's primary keys shifted by i × (max_key+1) and
  every foreign key shifted by the SAME stride as its target, so the join
  graph, fan-outs and selectivities are preserved exactly.
- ``documents``: replica 0 keeps the original text; replicas ≥ 1 permute each
  doc's word list with ``random.Random((i << 33) ^ doc_id)``. Permutation
  preserves length/token statistics (n_chars stays valid: ``' '.join(
  text.split(' '))`` is length-identical) but destroys word-3-gram shingles,
  so the distinct-shingle population grows ~R× — the honest inverted-index
  scaling behavior. Replicating texts verbatim instead would create R-sized
  near-dup cliques and turn the dedup ops into a different workload.
- ``embeddings``: replica i rotates each vector left by i dimensions —
  norm-preserving, direction-changing, so replicas are not exact duplicates
  in vector space and top-k structure stays non-degenerate.
- Each table is written as a DIRECTORY ``<name>.parquet/`` with one part file
  per replica, so Spark's scan gets R real splits (file-level parallelism,
  like a production table) instead of one oversized row group.

Usage:
    python tools/gen_scale_fixtures.py [--src /root/testdata/sf0.1]
        [--factor 10] [--out tools/fixtures/sf1]
"""

from __future__ import annotations

import argparse
import random
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: stride_source_table} ; stride = max(primary key)+1 of the
# stride-source table in the SOURCE data, so FK remapping matches PK remapping.
PK = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "__events_user__"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ("region", "nation")


def _strides(src: Path) -> dict[str, int]:
    s: dict[str, int] = {}
    for tbl, col in PK.items():
        t = pq.read_table(src / f"{tbl}.parquet", columns=[col])
        s[tbl] = int(pc.max(t.column(0)).as_py()) + 1
    ev = pq.read_table(src / "events.parquet", columns=["user_id"])
    s["__events_user__"] = int(pc.max(ev.column(0)).as_py()) + 1
    return s


def _shift_table(t: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    for col, stride in shifts.items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(t.column(idx), pa.scalar(i * stride, t.schema.field(idx).type))
        t = t.set_column(idx, t.schema.field(idx), shifted)
    return t


def _permute_documents(t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out = []
    for did, txt in zip(doc_ids, texts):
        ws = txt.split(" ")
        random.Random((i << 33) ^ did).shuffle(ws)
        out.append(" ".join(ws))
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, t.schema.field(idx), pa.array(out, pa.string()))


def _rotate_embeddings(t: pa.Table, i: int) -> pa.Table:
    if i == 0:
        return t
    vecs = t.column("embedding").to_pylist()
    rot = []
    for v in vecs:
        k = i % len(v) if v else 0
        rot.append(v[k:] + v[:k])
    idx = t.schema.get_field_index("embedding")
    return t.set_column(
        idx, t.schema.field(idx), pa.array(rot, t.schema.field(idx).type)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--out", default=str(Path(__file__).resolve().parent / "fixtures" / "sf1")
    )
    args = ap.parse_args()
    src, out = Path(args.src), Path(args.out)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)

    strides = _strides(src)
    for tbl in COPY_AS_IS:
        d = out / f"{tbl}.parquet"
        d.mkdir()
        pq.write_table(pq.read_table(src / f"{tbl}.parquet"), d / "part-r00.parquet")
        print(f"{tbl}: copied (dimension)")

    for tbl, shifts in SHIFTS.items():
        base = pq.read_table(src / f"{tbl}.parquet")
        resolved = {c: strides[s] for c, s in shifts.items()}
        d = out / f"{tbl}.parquet"
        d.mkdir()
        for i in range(args.factor):
            rep = _shift_table(base, resolved, i)
            if tbl == "documents":
                rep = _permute_documents(rep, i)
            elif tbl == "embeddings":
                rep = _rotate_embeddings(rep, i)
            pq.write_table(rep, d / f"part-r{i:02d}.parquet")
        print(f"{tbl}: {args.factor} replicas, {base.num_rows * args.factor} rows")


if __name__ == "__main__":
    main()
