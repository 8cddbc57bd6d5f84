"""r15 measurement: wall times for the slowest honest non-bench walls the
r14 verdict flagged (items 3/4/6): the band-planner family,
decontaminate_bloom, and sim_lsh_recall_by_corpus_scale. Two passes each
(first includes codegen warm), job-labelled."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from spark_dba_spark import registry
from spark_dba_spark.session import get_spark


OPS = [
    "dedup_lsh_band_planner",
    "dedup_band_precision_profile",
    "dedup_method_confusion",
    "dedup_minhash_perm_sweep",
    "decontaminate_bloom",
    "sim_lsh_recall_by_corpus_scale",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-family", driver_memory="16g")
    specs = registry.all_specs()
    names = sys.argv[1:] or OPS
    for name in names:
        spec = specs[name]
        for i in range(2):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.time()
            spec.builder(spark, sf_dir).collect()
            print(f"{name} pass{i} {time.time() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
