"""Semantic tests for the LLM-pipeline operators (beyond oracle parity):
recall of the approximate ANN path, dedup invariants, multimodal plumbing."""

from __future__ import annotations

import os

from conftest import SF_DIR

from spark_dba_spark import catalog


def test_ann_recall_vs_brute(spark):
    from spark_dba_spark.operators.similarity import (
        TOP_K,
        sim_ann_lsh,
        sim_cosine_topk,
    )

    brute = {
        (r["qid"], r["vec_id"])
        for r in sim_cosine_topk(spark, SF_DIR).collect()
    }
    ann = {(r["qid"], r["vec_id"]) for r in sim_ann_lsh(spark, SF_DIR).collect()}
    assert ann, "ANN returned nothing"
    recall = len(brute & ann) / len(brute)
    # Random fixture embeddings are the structure-free WORST case for LSH;
    # even there the committed 16-table default must clear a real floor
    # (RECALL artifact: 0.725 at 16 tables on sf0.01).
    assert recall > 0.5, f"ANN recall {recall:.2f} vs brute top-{TOP_K}"


def test_ann_recall_clustered_at_default(spark, tmp_path):
    """The committed LSH default must be DEFENSIBLE on realistic data:
    recall@10 >= 0.9 on the clustered fixture (real embedding corpora are
    clustered; the uniform fixture above is the adversarial floor).
    VERDICT r5 item 4."""
    from spark_dba_spark.operators.similarity import (
        sim_ann_lsh,
        sim_cosine_topk,
        sim_ivf,
    )
    from tools.recall_report import write_clustered_fixture

    cdir = write_clustered_fixture(str(tmp_path))
    brute = {
        (r["qid"], r["vec_id"]) for r in sim_cosine_topk(spark, cdir).collect()
    }
    ann = {(r["qid"], r["vec_id"]) for r in sim_ann_lsh(spark, cdir).collect()}
    recall = len(brute & ann) / len(brute)
    assert recall >= 0.9, f"clustered LSH recall {recall:.2f} at default"
    ivf = {(r["qid"], r["vec_id"]) for r in sim_ivf(spark, cdir).collect()}
    ivf_recall = len(brute & ivf) / len(brute)
    assert ivf_recall >= 0.9, f"clustered IVF recall {ivf_recall:.2f}"


def test_ivf_recall_vs_brute(spark):
    from spark_dba_spark.operators.similarity import (
        IVF_CENTROIDS,
        IVF_NPROBE,
        TOP_K,
        sim_cosine_topk,
        sim_ivf,
    )

    brute = {
        (r["qid"], r["vec_id"])
        for r in sim_cosine_topk(spark, SF_DIR).collect()
    }
    ivf = {(r["qid"], r["vec_id"]) for r in sim_ivf(spark, SF_DIR).collect()}
    assert ivf, "IVF returned nothing"
    recall = len(brute & ivf) / len(brute)
    # probing NPROBE/CENTROIDS of the corpus should recover well above that
    # fraction of true neighbors (neighbors concentrate in nearby lists)
    assert recall > IVF_NPROBE / IVF_CENTROIDS, (
        f"IVF recall {recall:.2f} vs brute top-{TOP_K}"
    )


def _exact_l2_topk(spark, sf_dir):
    """Exact L2 top-k ground truth for the PQ path (PQ approximates
    Euclidean distance, so cosine brute force is the wrong baseline).
    Test-scale only: collects the fixture corpus into numpy."""
    import numpy as np

    from spark_dba_spark.operators.similarity import N_QUERIES, TOP_K

    rows = (
        catalog.load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    truth = set()
    for q in range(N_QUERIES):
        d2 = ((m - m[q]) ** 2).sum(axis=1)
        d2[q] = np.inf
        for i in np.lexsort((ids, d2))[:TOP_K]:
            truth.add((q, int(ids[i])))
    return truth


def test_pq_recall_vs_exact_l2(spark, tmp_path):
    """The committed PQ operating point (PQ_M=16, PQ_K=16) must be
    defensible the same way the LSH default is: recall@10 >= 0.9 against
    exact L2 top-k on the clustered fixture (realistic corpora), with an
    honest floor on the uniform fixture (i.i.d. dims are PQ's
    structure-free worst case — measured 0.38 at sf0.01)."""
    from spark_dba_spark.operators.similarity import sim_pq_adc
    from tools.recall_report import write_clustered_fixture

    brute = _exact_l2_topk(spark, SF_DIR)
    pq = {(r["qid"], r["vec_id"]) for r in sim_pq_adc(spark, SF_DIR).collect()}
    assert pq, "PQ returned nothing"
    recall = len(brute & pq) / len(brute)
    assert recall >= 0.25, f"uniform PQ recall {recall:.2f} vs exact L2"

    cdir = write_clustered_fixture(str(tmp_path))
    cbrute = _exact_l2_topk(spark, cdir)
    cpq = {(r["qid"], r["vec_id"]) for r in sim_pq_adc(spark, cdir).collect()}
    crecall = len(cbrute & cpq) / len(cbrute)
    assert crecall >= 0.9, f"clustered PQ recall {crecall:.2f} vs exact L2"


def test_winnow_guarantee_and_density(spark, tmp_path):
    """Winnowing semantic invariants (Schleimer–Wilkerson–Aiken):
    (1) the detection guarantee — two docs sharing a substring of
    length ≥ W+K−1 select at least one common fingerprint HASH (the
    fully-shared window picks the same winner gram in both docs);
    (2) density bounds — each (pos, hash) selection can win at most W
    windows, so n_win/W ≤ n_fp ≤ n_win; (3) position gaps between
    consecutive selections never exceed W."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        text_winnow_fingerprint,
    )

    shared = "the quick brown fox jumps over the lazy dog near the bank"
    texts = [
        "alpha beta gamma delta " + shared + " epsilon zeta",
        "one two three " + shared + " four five six seven",
        "completely unrelated filler content about data engines",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    assert len(shared) >= WINNOW_W + WINNOW_K - 1
    rows = text_winnow_fingerprint(spark, str(tmp_path)).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    # (1) detection guarantee across the shared substring
    h0 = {h for _, h in by_doc[0]}
    h1 = {h for _, h in by_doc[1]}
    assert h0 & h1, "docs sharing a long substring must share a fingerprint"
    # (2)+(3) density and gap bounds per doc
    for doc_id, sels in by_doc.items():
        text = texts[doc_id]  # fixture text is already normalized form
        n_g = max(len(text) - WINNOW_K + 1, 1)
        n_win = max(n_g - WINNOW_W + 1, 1)
        assert math.ceil(n_win / WINNOW_W) <= len(sels) <= n_win
        ps = sorted(p for p, _ in sels)
        assert all(b - a <= WINNOW_W for a, b in zip(ps, ps[1:])), (
            f"doc {doc_id}: selection gap exceeds the window"
        )


def test_ngram_jaccard_pairs_valid(spark):
    from spark_dba_spark.operators.dedup import JACCARD_TAU, dedup_ngram_jaccard

    rows = dedup_ngram_jaccard(spark, SF_DIR).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert JACCARD_TAU <= r["jaccard"] <= 1.0


def test_minhash_is_superset_quality(spark):
    """Every very-high-jaccard pair found by the exact inverted-index join
    must also be found by MinHash-LSH (recall at j≈1 is ~certain)."""
    from spark_dba_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
        if r["jaccard"] >= 0.95
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    assert exact <= lsh, f"LSH missed near-certain pairs: {exact - lsh}"


def test_containment_dominates_jaccard(spark):
    """Mathematical invariant: for any pair, containment = inter/min(n)
    ≥ jaccard = inter/union — and every Jaccard-dup pair (τ=0.8) must
    also be a containment-dup pair (the asymmetric detector is a strict
    superset at equal τ)."""
    from spark_dba_spark.operators.dedup import (
        dedup_containment,
        dedup_ngram_jaccard,
    )

    cont = {
        (r["doc_a"], r["doc_b"]): (r["containment"], r["jaccard"])
        for r in dedup_containment(spark, SF_DIR).collect()
    }
    assert cont, "containment found nothing at fixture scale"
    for (a, b), (c, j) in cont.items():
        assert c >= j - 1e-12, (a, b, c, j)
    jac = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    assert jac <= set(cont), "jaccard pair missing from containment output"


def test_shard_pack_conserves_bytes(spark):
    """Packing invariants: every asset lands in exactly one shard (byte
    and count totals conserved per media type), and every shard except
    possibly the last stays under SHARD_BYTES + the largest asset (a doc
    can straddle a boundary, never skip one)."""
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.multimodal import (
        SHARD_BYTES,
        _assets,
        mm_shard_pack,
    )

    shards = mm_shard_pack(spark, SF_DIR).collect()
    per_media_bytes: dict[str, int] = {}
    per_media_count: dict[str, int] = {}
    for r in shards:
        per_media_bytes[r["media_type"]] = (
            per_media_bytes.get(r["media_type"], 0) + r["shard_payload_bytes"]
        )
        per_media_count[r["media_type"]] = (
            per_media_count.get(r["media_type"], 0) + r["n_assets"]
        )
    truth = {
        r["media_type"]: (r["b"], r["n"])
        for r in _assets(spark, SF_DIR)
        .groupBy("media_type")
        .agg(
            F.sum(F.octet_length("payload")).alias("b"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert {m: (per_media_bytes[m], per_media_count[m]) for m in truth} == truth
    max_asset = (
        _assets(spark, SF_DIR)
        .agg(F.max(F.octet_length("payload")).alias("m"))
        .collect()[0]["m"]
    )
    for r in shards:
        assert r["shard_payload_bytes"] <= SHARD_BYTES + max_asset


def test_cdc_snapshot_excludes_tombstoned_and_uninserted(spark):
    """CDC semantics: nobody whose LATEST change is the 'error' tombstone
    appears in the snapshot, nobody without a 'signup' insert appears,
    and every emitted last_ts really is that user's max event time."""
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.temporal import ev_cdc_latest_snapshot

    ev = catalog.load(spark, SF_DIR, "events")
    latest = {
        r["user_id"]: r["event_type"]
        for r in ev.withColumn(
            "rn",
            F.expr(
                "row_number() over (partition by user_id"
                " order by ts desc, event_id desc)"
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    signup_users = {
        r["user_id"]
        for r in ev.filter("event_type = 'signup'")
        .select("user_id")
        .distinct()
        .collect()
    }
    out = ev_cdc_latest_snapshot(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert latest[r["user_id"]] != "error"
        assert r["user_id"] in signup_users
        assert r["last_type"] == latest[r["user_id"]]


def test_hll_reaggregate_matches_exact(spark):
    """The engine-native DataSketches HLL surface stays pinned (it was
    this op's original rows-only body before the VERDICT r10 #4
    full-oracle upgrade): per-source sketch estimates within 5% of
    exact distincts, and the union-of-sketches global inside the same
    envelope as a direct whole-corpus sketch (lossless merge)."""
    from pyspark.sql import functions as F

    docs = catalog.load(spark, SF_DIR, "documents")
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    exact["__ALL__"] = docs.agg(
        F.countDistinct(F.md5("text")).alias("n")
    ).collect()[0]["n"]

    per_src = docs.groupBy("source").agg(
        F.hll_sketch_agg(F.md5("text")).alias("sk")
    )
    est = {
        r["source"]: r["est"]
        for r in per_src.select(
            "source", F.hll_sketch_estimate("sk").alias("est")
        ).collect()
    }
    est["__ALL__"] = per_src.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    assert set(est) == set(exact)
    for src, n in exact.items():
        assert abs(est[src] - n) <= max(1, 0.05 * n), (src, est[src], n)

    direct = docs.agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.md5("text"))
        ).alias("e")
    ).collect()[0]["e"]
    # The union path re-estimates through an HLL_8 union gadget, so it is
    # close to — not bit-equal with — the direct sketch (DataSketches
    # documents this); both must sit inside the same exact-count envelope.
    assert abs(est["__ALL__"] - direct) <= max(2, 0.02 * exact["__ALL__"])


def test_hll_reaggregate_matches_python_brute(spark):
    """The deterministic reaggregation ladder replayed literally in
    Python from the raw md5s: per-(source,lang) registers, max-merged
    to source and global, clamped harmonic sums, integer micro
    estimates — EXACT equality; plus the accuracy gate (raw estimator
    with linear-counting correction within 25% of exact distincts,
    the sketch_hll_registers envelope)."""
    import hashlib
    import math

    import duckdb

    from spark_dba_spark.operators.relational import (
        HLL_EST_NUM,
        HLL_M,
        HLL_RCAP,
        HLL_WBITS,
        sketch_hll_reaggregate,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, lang, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    regs: dict = {}
    exact: dict = {}
    for source, lang, text in rows:
        h = int(hashlib.md5(text.encode("utf-8")).hexdigest()[:15], 16)
        bucket, w = h % HLL_M, h // HLL_M
        rho = (HLL_WBITS + 1) if w == 0 else (HLL_WBITS + 1 - w.bit_length())
        for grain, key in (
            ("source_lang", f"{source}|{lang}"),
            ("source", source),
            ("__ALL__", "__ALL__"),
        ):
            g = regs.setdefault((grain, key), {})
            g[bucket] = max(g.get(bucket, 0), rho)
            exact.setdefault((grain, key), set()).add(
                hashlib.md5(text.encode("utf-8")).hexdigest()
            )
    got = {
        (r["grain"], r["grp_key"]): r
        for r in sketch_hll_reaggregate(spark, SF_DIR).collect()
    }
    assert set(got) == set(regs)
    for gk, g in regs.items():
        s = sum(
            1 << (HLL_RCAP - min(reg, HLL_RCAP)) for reg in g.values()
        ) + (HLL_M - len(g)) * (1 << HLL_RCAP)
        r = got[gk]
        assert r["n_empty"] == HLL_M - len(g), gk
        assert r["harmonic_sum"] == s, gk
        assert r["est_micro"] == HLL_EST_NUM // s, gk
        est = r["est_micro"] / 1e6
        v = r["n_empty"]
        if est <= 2.5 * HLL_M and v > 0:
            est = HLL_M * math.log(HLL_M / v)
        n = len(exact[gk])
        assert abs(est - n) <= max(3, 0.25 * n), (gk, est, n)
    # the ladder must actually have three grains and a real merge
    assert {g for g, _ in regs} == {"source_lang", "source", "__ALL__"}
    assert any(
        regs[("__ALL__", "__ALL__")][b]
        > max(
            g.get(b, 0)
            for (gr, _), g in regs.items()
            if gr == "source_lang"
        ) - 1
        for b in regs[("__ALL__", "__ALL__")]
    )


def test_hll_registers_estimate_accuracy(spark):
    """The deterministic-register HLL (sketch_hll_registers): applying
    the textbook estimator (alpha_m * m^2 / sum(2^-M_j), with the
    small-range linear-counting correction) to the emitted registers
    lands within 25% of the exact distinct count per source and
    globally (m=64 -> sigma ~ 1.04/8 = 13%; 25% is a ~2-sigma gate),
    and the '__ALL__' registers equal the per-bucket max over sources
    (the merge property, checked value-by-value)."""
    import math

    from pyspark.sql import functions as F

    from spark_dba_spark.operators.relational import (
        HLL_M,
        HLL_WBITS,
        sketch_hll_registers,
    )

    rows = sketch_hll_registers(spark, SF_DIR).collect()
    regs: dict = {}
    for r in rows:
        regs.setdefault(r["source"], {})[r["bucket"]] = r["register"]
        # harmonic_term is exactly 2^(WBITS+1-register)
        assert r["harmonic_term"] == 1 << (HLL_WBITS + 1 - r["register"])
    assert all(len(b) == HLL_M for b in regs.values())

    # merge property: __ALL__ = per-bucket max over the sources
    for b in range(HLL_M):
        assert regs["__ALL__"][b] == max(
            regs[s][b] for s in regs if s != "__ALL__"
        )

    docs = catalog.load(spark, SF_DIR, "documents")
    exact = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.countDistinct(F.md5("text")).alias("n"))
        .collect()
    }
    exact["__ALL__"] = docs.agg(
        F.countDistinct(F.md5("text")).alias("n")
    ).collect()[0]["n"]

    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    for src, m_regs in regs.items():
        harm = sum(2.0 ** (-v) for v in m_regs.values())
        est = alpha * HLL_M * HLL_M / harm
        zeros = sum(1 for v in m_regs.values() if v == 0)
        if est <= 2.5 * HLL_M and zeros > 0:
            est = HLL_M * math.log(HLL_M / zeros)
        n = exact[src]
        assert abs(est - n) <= max(2, 0.25 * n), (src, est, n)


def test_kmeans_matches_numpy_twin(spark):
    """The distributed fixed-point Lloyd iterations must reproduce a
    same-seed pure-Python-integer reference EXACTLY (counts AND the
    integer inertia — r7: the op is exact on the 2^-20 grid, so the
    twin is equality, not tolerance); quantized inertia must not
    increase across rounds."""
    import numpy as np

    from spark_dba_spark.operators.similarity import (
        KM_ITERS,
        KM_K,
        KM_QUANT,
        emb_kmeans_lloyd,
    )

    emb_rows = (
        catalog.load(spark, SF_DIR, "embeddings")
        .orderBy("vec_id")
        .collect()
    )
    X = np.trunc(
        np.array([r["embedding"] for r in emb_rows], dtype=np.float64)
        * KM_QUANT
    ).astype(np.int64)
    cent = X[:KM_K].copy()
    inertias = []
    for it in range(KM_ITERS):
        # exact integer distances (object math avoided: values < 2^53)
        d2 = (
            (X * X).sum(axis=1, keepdims=True)
            - 2 * (X @ cent.T)
            + (cent * cent).sum(axis=1)
        )
        cid = np.argmin(d2, axis=1)
        inertias.append(int(d2[np.arange(len(cid)), cid].sum()))
        if it == KM_ITERS - 1:
            break
        for k in range(KM_K):
            m = cid == k
            if m.any():
                s = X[m].sum(axis=0)
                n = int(m.sum())
                # truncation-toward-zero division (DuckDB `//`)
                cent[k] = np.where(
                    s >= 0, s // n, -((-s) // n)
                )
    ref = {}
    for k in set(cid.tolist()):
        m = cid == k
        ref[int(k)] = (
            int(m.sum()),
            int(d2[np.arange(len(cid)), cid][m].sum()),
        )
    assert inertias == sorted(inertias, reverse=True), "inertia increased"

    out = {
        r["cid"]: (r["n_assigned"], int(r["inertia_q2"]))
        for r in emb_kmeans_lloyd(spark, SF_DIR).collect()
    }
    assert out == ref


def test_probe_chunking_matches_single_chunk(spark, monkeypatch):
    """A probe set larger than one driver chunk (simulated by shrinking
    PROBE_CHUNK below N_QUERIES) must produce bit-identical top-k and
    range results — the chunked scorer is how a corpus-scaled probe set
    survives without a driver OOM, and it must not change semantics."""
    from spark_dba_spark.operators import similarity as S

    base_topk = [tuple(r) for r in S.sim_cosine_topk(spark, SF_DIR).collect()]
    base_range = [tuple(r) for r in S.sim_range_search(spark, SF_DIR).collect()]
    assert len(base_topk) > 0

    monkeypatch.setattr(S, "PROBE_CHUNK", 7)  # N_QUERIES=20 → 3 chunks
    chunked_topk = [tuple(r) for r in S.sim_cosine_topk(spark, SF_DIR).collect()]
    chunked_range = [tuple(r) for r in S.sim_range_search(spark, SF_DIR).collect()]
    assert chunked_topk == base_topk
    assert chunked_range == base_range


def test_minhash_plan_single_md5_single_barrier(spark):
    """The signature stage must hash each shingle exactly once. The
    lambda-binding form (transform(array(hp), hpv -> ...)[0]) is what
    blocks Catalyst's projection collapse from inlining the MD5 expression
    into the 100 permutation lambdas; if a refactor breaks it, md5( shows
    up multiple times in the plan (≈100× recompute). Exactly one
    repartition("doc_id") per docs branch is expected (parallelism for
    low-split scans: sig path + x + y = 3); the old second barrier between
    hp and sig (an extra cluster-wide shuffle of the hp arrays) must not
    reappear."""
    import contextlib
    import io

    from spark_dba_spark.operators.dedup import dedup_minhash_lsh

    df = dedup_minhash_lsh(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("md5(") == 1, "MD5 inlined into permutation lambdas"
    assert plan.count("hashpartitioning(doc_id") <= 3, (
        "second wide-row barrier reappeared in the signature pipeline"
    )


def test_simhash_hamming_bounds(spark):
    from spark_dba_spark.operators.dedup import SIMHASH_MAXHAM, dedup_simhash

    for r in dedup_simhash(spark, SF_DIR).collect():
        assert 0 <= r["hamming"] <= SIMHASH_MAXHAM


def test_quality_score_bounds(spark):
    from spark_dba_spark.operators.text import text_quality

    for r in text_quality(spark, SF_DIR).collect():
        assert 0.0 <= r["uniq_ratio"] <= 1.0
        assert 0.0 <= r["stop_ratio"] <= 1.0
        assert 0.0 < r["quality_score"] <= 1.0


def test_multimodal_binary_roundtrip(spark):
    """Payload bytes survive the Arrow → pandas → Arrow round trip."""
    from spark_dba_spark.operators.multimodal import mm_binary_meta, mm_image_features

    meta = {r["doc_id"]: r["byte_len"] for r in mm_binary_meta(spark, SF_DIR).collect()}
    feats = mm_image_features(spark, SF_DIR).collect()
    assert feats
    for r in feats:
        assert r["byte_len"] == meta[r["doc_id"]]
        assert 64 <= r["width"] < 640 and 64 <= r["height"] < 480


def test_decode_image_features_real_and_fallback():
    """decode_image_features: PIL path decodes a real 1x1 PNG when PIL is
    importable; non-image bytes always take the deterministic stub (the
    contract that keeps the mm_* oracles valid in every environment)."""
    import struct
    import zlib

    from spark_dba_spark.operators.multimodal import (
        _HAVE_PIL,
        _fake_decode,
        decode_image_features,
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # minimal valid 1x1 grayscale PNG, built from the spec with stdlib only
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x80")  # filter byte + one gray pixel
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )

    if _HAVE_PIL:
        assert decode_image_features(png) == (1, 1, 1)
    else:
        assert decode_image_features(png) == _fake_decode(png)

    # forced-PIL=False and non-image bytes both hit the stub
    text = b"not an image"
    assert decode_image_features(text) == _fake_decode(text)
    assert decode_image_features(png, use_pil=False) == _fake_decode(png)


def test_cc_clusters_consistent_with_pairs(spark):
    """Every near-dup pair's endpoints share a component; every component
    id is the minimum doc_id of its members (canonical labeling)."""
    from spark_dba_spark.operators.dedup import (
        dedup_cc_clusters,
        dedup_ngram_jaccard,
    )

    comp = {
        r["doc_id"]: r["component_id"]
        for r in dedup_cc_clusters(spark, SF_DIR).collect()
    }
    pairs = dedup_ngram_jaccard(spark, SF_DIR).collect()
    assert pairs, "fixture should contain near-dup pairs"
    for r in pairs:
        assert comp[r["doc_a"]] == comp[r["doc_b"]]
    members: dict[int, list[int]] = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_pack_context_bins_conserves_tokens(spark):
    """Packing is a partition of the corpus: per source, bin token counts
    sum to the source's total token count and every doc lands in a bin."""
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.text import pack_context_bins

    bins = pack_context_bins(spark, SF_DIR).collect()
    docs = catalog.load(spark, SF_DIR, "documents").select(
        "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    totals = {
        r["source"]: (r["toks"], r["n"])
        for r in docs.groupBy("source")
        .agg(F.sum("n_tokens").alias("toks"), F.count("*").alias("n"))
        .collect()
    }
    by_source: dict[str, tuple[int, int]] = {}
    for r in bins:
        t, n = by_source.get(r["source"], (0, 0))
        by_source[r["source"]] = (t + r["bin_tokens"], n + r["n_docs"])
    assert by_source == totals


def test_quantize_int8_reconstruction_bound(spark):
    """Dequantized values are within scale/2 of the original (the bound of
    round-to-nearest), and every quantized level fits in int8 range."""
    from spark_dba_spark.operators.similarity import emb_quantize_int8

    emb = {
        r["vec_id"]: r["embedding"]
        for r in catalog.load(spark, SF_DIR, "embeddings").collect()
    }
    for r in emb_quantize_int8(spark, SF_DIR).collect():
        scale = r["scale"]
        q = [int(s) for s in r["qvec"].split(",")]
        orig = emb[r["vec_id"]]
        assert len(q) == len(orig)
        for qi, xi in zip(q, orig):
            assert -128 <= qi <= 127
            assert abs(qi * scale - xi) <= scale / 2 + 1e-9


def test_mix_sample_hits_target_rates(spark):
    """Kept fraction per source lands near its configured bucket-threshold
    rate (exact at threshold 10000; binomial-loose for the rest)."""
    from spark_dba_spark.operators.text import (
        MIX_BUCKETS,
        MIX_DEFAULT_THRESHOLD,
        MIX_THRESHOLDS,
        corpus_mix_sample,
    )

    for r in corpus_mix_sample(spark, SF_DIR).collect():
        thr = MIX_THRESHOLDS.get(r["source"], MIX_DEFAULT_THRESHOLD)
        rate = thr / MIX_BUCKETS
        if rate == 1.0:
            assert r["n_kept"] == r["n_total"]
        else:
            assert 0 <= r["n_kept"] <= r["n_total"]
            # md5 buckets ≈ uniform: allow wide binomial slack on tiny n
            assert abs(r["n_kept"] / r["n_total"] - rate) < 0.5


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for a, b in edges:
        for x in (a, b):
            comp[x] = find(x)
    # canonicalize: component id = min member
    roots = {}
    for x, r in comp.items():
        roots.setdefault(find(r), []).append(x)
    out = {}
    for members in roots.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_cc_components_matches_union_find(spark):
    """cc_components (alternating star contraction) agrees with a plain
    union-find on random graphs AND on a chain far longer than any
    propagation-style round cap — the O(log n) convergence claim."""
    import random

    from spark_dba_spark.operators.dedup import cc_components

    cases = []
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(2, 60)
        m = rng.randint(1, 120)
        cases.append(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        )
    # 80-node chain: diameter 79 >> CC_MAX_ITERS rounds needed (~log n)
    cases.append([(i, i + 1) for i in range(79)])
    # two cliques bridged by one edge + isolated pair
    cases.append(
        [(a, b) for a in range(5) for b in range(a)]
        + [(a, b) for a in range(10, 15) for b in range(10, a)]
        + [(4, 10), (90, 91)]
    )
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["comp"] for r in cc_components(df).collect()
        }
        want = _uf_components(1 + max(max(e) for e in edges), edges)
        assert got == want, f"mismatch on {edges[:10]}..."


def test_bloom_decontaminate_equals_exact_and_prunes(spark):
    """The bloom path's correctness theorem (no false negatives + exact
    verify) directly: bit-identical output vs decontaminate_ngram, AND the
    prefilter actually rejects a nontrivial share of the exploded train
    shingle stream (it isn't a pass-everything no-op)."""
    import pyspark.sql.functions as F

    from spark_dba_spark.operators.text import (
        BLOOM_K,
        DECON_EVAL_MOD,
        DECON_NGRAM,
        _bloom_hit_sql,
        _docs,
        _shingle_expr,
        decontaminate_bloom,
        decontaminate_ngram,
    )

    exact = sorted(map(tuple, decontaminate_ngram(spark, SF_DIR).collect()))
    bloom = sorted(map(tuple, decontaminate_bloom(spark, SF_DIR).collect()))
    assert bloom == exact

    # Prune measurement: rebuild the bitset exactly as the operator does,
    # then count exploded train shingles vs bloom survivors.
    docs = _docs(spark, SF_DIR)
    sh = docs.select(
        "doc_id", F.array_distinct(_shingle_expr(DECON_NGRAM)).alias("shingles")
    )
    ev = (
        sh.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    n_eval = ev.count()
    exploded = (
        sh.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .select("doc_id", F.explode("shingles").alias("s"))
    )
    n_total = exploded.count()
    # Reuse the operator's own bitset by re-running its build path via the
    # public function is awkward; instead assert via the candidate stream
    # implied by matched counts: survivors ≥ matches (no false negatives)
    # and the measured FPR of a 128Ki-bit / k=5 filter at this fill level
    # keeps survivors well under the total.
    from spark_dba_spark.operators.text import BLOOM_BITS, _bloom_pos_sql

    pos = ev.select(
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql(i)) for i in range(BLOOM_K)])
        ).alias("pos")
    ).distinct()
    words = (
        pos.select(
            F.shiftright("pos", 6).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitset = [0] * (BLOOM_BITS // 64)
    for r in words:
        bitset[r["w"]] = r["bits"]
    bloom_df = spark.createDataFrame([(bitset,)], "bloom_bits array<long> not null")
    passed = " AND ".join(_bloom_hit_sql(i) for i in range(BLOOM_K))
    n_surv = exploded.join(F.broadcast(bloom_df)).filter(F.expr(passed)).count()
    n_true = (
        exploded.join(ev, "s", "left_semi").count()
    )
    assert n_surv >= n_true  # no false negatives
    assert n_surv < n_total, (
        f"bloom rejected nothing ({n_surv}/{n_total}, eval={n_eval})"
    )


def test_embedding_cosine_dedup_invariants(spark):
    """Labels cover the whole corpus exactly once; representatives are the
    component minimum; every exact near-dup pair lands in one component."""
    from spark_dba_spark.operators.dedup import dedup_embedding_cosine
    from spark_dba_spark.operators.similarity import sim_dup_pairs

    rows = dedup_embedding_cosine(spark, SF_DIR).collect()
    comp = {r["doc_id"]: r["component_id"] for r in rows}
    n = catalog.load(spark, SF_DIR, "embeddings").count()
    assert len(rows) == n  # total cover, no dup labels
    sizes = {}
    for r in rows:
        sizes.setdefault(r["component_id"], []).append(r["doc_id"])
    for cid, members in sizes.items():
        assert cid == min(members)  # min-id representative
    for r in rows:
        assert r["keep"] == (r["doc_id"] == r["component_id"])
        assert r["n_members"] == len(sizes[r["component_id"]])
    for p in sim_dup_pairs(spark, SF_DIR).collect():
        assert comp[p["vec_id_a"]] == comp[p["vec_id_b"]]


def test_triangle_clustering_invariants(spark):
    """Triangle participation needs degree ≥ 2; total participation is a
    multiple of 3 (each triangle counted at its 3 corners); clustering is
    a ratio in [0, 1]."""
    from spark_dba_spark.operators.dedup import graph_triangles_neardup

    rows = graph_triangles_neardup(spark, SF_DIR).collect()
    assert rows, "dup graph empty at test scale"
    total = 0
    for r in rows:
        total += r["n_triangles"]
        if r["n_triangles"] > 0:
            assert r["degree"] >= 2
        assert 0.0 <= r["clustering"] <= 1.0
    assert total % 3 == 0


def test_markov_rows_are_distributions(spark):
    """Per prev_type the transition probabilities sum to 1; total
    transition count equals (events − users-with-events): each user's
    final event has no successor."""
    import pyspark.sql.functions as F

    from spark_dba_spark.operators.temporal import ev_markov_transitions

    rows = ev_markov_transitions(spark, SF_DIR).collect()
    by_prev = {}
    n_total = 0
    for r in rows:
        by_prev.setdefault(r["prev_type"], 0.0)
        by_prev[r["prev_type"]] += r["p_trans"]
        n_total += r["n_trans"]
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, f"{prev} rows sum to {s}"
    ev = catalog.load(spark, SF_DIR, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert n_total == n_events - n_users


def test_window_median_range_singletons_and_bounds(spark):
    """Frames of size 1 have median == their own value; every median lies
    within the user's global [min, max]."""
    import pyspark.sql.functions as F

    from spark_dba_spark.operators.temporal import window_median_range

    med = window_median_range(spark, SF_DIR)
    ev = catalog.load(spark, SF_DIR, "events").select(
        "event_id", F.col("value").alias("v")
    )
    joined = med.join(ev, "event_id").collect()
    assert joined
    import collections

    user_minmax = collections.defaultdict(lambda: (float("inf"), float("-inf")))
    for r in joined:
        lo, hi = user_minmax[r["user_id"]]
        user_minmax[r["user_id"]] = (min(lo, r["v"]), max(hi, r["v"]))
    for r in joined:
        if r["n_1h"] == 1:
            assert abs(r["median_1h"] - round(r["v"], 6)) < 1e-9
        lo, hi = user_minmax[r["user_id"]]
        assert lo - 1e-9 <= r["median_1h"] <= hi + 1e-9


def test_chunk_overlap_covers_and_bounds(spark):
    """Chunks tile each document: first starts at token 1, strides are
    exactly CHUNK_STRIDE, the last chunk reaches the final token, and no
    chunk exceeds CHUNK_TOKENS."""
    import collections

    import pyspark.sql.functions as F

    from spark_dba_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_overlap,
    )

    rows = text_chunk_overlap(spark, SF_DIR).collect()
    ntok = {
        r["doc_id"]: r["n"]
        for r in catalog.load(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    per_doc = collections.defaultdict(list)
    for r in rows:
        per_doc[r["doc_id"]].append(r)
        assert 1 <= r["n_tok"] <= CHUNK_TOKENS
    assert set(per_doc) == set(ntok)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert chunks[0]["start_tok"] == 1
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_tok"] - a["start_tok"] == CHUNK_STRIDE
        last = chunks[-1]
        assert last["start_tok"] + last["n_tok"] - 1 == ntok[doc_id]


def test_redact_denylist_conserves_and_hits(spark):
    """Redacted + kept == total tokens per doc, and the data-derived deny
    list actually fires somewhere in the corpus."""
    import pyspark.sql.functions as F

    from spark_dba_spark.operators.text import text_redact_denylist

    rows = text_redact_denylist(spark, SF_DIR).collect()
    ntok = {
        r["doc_id"]: r["n"]
        for r in catalog.load(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert sum(r["n_redacted"] for r in rows) > 0
    for r in rows:
        assert r["n_redacted"] + r["n_tokens_after"] == ntok[r["doc_id"]]


def test_source_kl_nonnegative(spark):
    """Σ p ln(p/q) with q sub-normalized over the restricted support is
    ≥ 0 (Gibbs + ln(1/Σq) ≥ 0) — a negative value means a broken
    normalization on one side."""
    from spark_dba_spark.operators.text import text_source_kl

    rows = text_source_kl(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["kl_nats"] >= -1e-9, r


def test_ri_branch_detects_synthetic_orphans(spark):
    """The fixture star schema is orphan-free, so the audit's zero rows
    don't by themselves prove the detector — drive the branch with
    synthetic orphans (incl. a NULL FK, which can reference nothing)."""
    from spark_dba_spark.operators.relational import _ri_branch

    fact = spark.createDataFrame(
        [(1,), (2,), (2,), (99,), (None,)], "fk long"
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], "fk long")
    r = _ri_branch(fact, dim, "t.fk -> d.pk").collect()[0]
    assert r["n_fact_rows"] == 5
    assert r["n_orphan_rows"] == 2  # 99 and NULL
    assert r["n_orphan_keys"] == 1  # countDistinct skips NULL


def test_chi2_margins_consistent(spark):
    """Expected counts under independence reproduce both margins and the
    grand total; contributions are nonnegative."""
    import collections

    from spark_dba_spark.operators.relational import stats_chi2_lang_source

    rows = stats_chi2_lang_source(spark, SF_DIR).collect()
    obs_by_lang = collections.defaultdict(int)
    exp_by_lang = collections.defaultdict(float)
    for r in rows:
        obs_by_lang[r["lang"]] += r["n_obs"]
        exp_by_lang[r["lang"]] += r["n_exp"]
        assert r["chi2_part"] >= 0
    for lang in obs_by_lang:
        assert abs(obs_by_lang[lang] - exp_by_lang[lang]) < 1e-2, lang


def test_benford_shares_sum_to_one(spark):
    from spark_dba_spark.operators.relational import audit_benford_amounts

    rows = audit_benford_amounts(spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4


def test_streaks_vs_python_twin(spark):
    """Per-user longest increasing run recomputed in plain Python over the
    same (ts, event_id)-ordered sequence."""
    import collections

    from spark_dba_spark.operators.relational import ev_monotonic_streaks

    got = {
        r["user_id"]: (r["longest_streak"], r["n_runs"])
        for r in ev_monotonic_streaks(spark, SF_DIR).collect()
    }
    ev = collections.defaultdict(list)
    for r in (
        catalog.load(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    ):
        ev[r["user_id"]].append((r["ts"], r["event_id"], r["value"]))
    for uid, seq in ev.items():
        seq.sort(key=lambda t: (t[0], t[1]))
        runs, cur = [], 1
        for a, b in zip(seq, seq[1:]):
            if b[2] > a[2]:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[uid] == (max(runs), len(runs)), uid


def test_skyline_property_random_points(spark):
    """Distributed skyline (per-size min + monotone window) == brute-force
    dominance filter on random point sets, including duplicate
    (size, price) points and price ties."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from spark_dba_spark.operators.relational import skyline_core

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=8),     # size
                st.integers(min_value=1, max_value=20),    # price (int → exact)
            ),
            min_size=1,
            max_size=30,
        )
    )
    def run(pts):
        rows = [(i, s, float(p)) for i, (s, p) in enumerate(pts)]
        df = spark.createDataFrame(
            rows, "p_partkey long, p_size int, p_retailprice double"
        )
        got = {r["p_partkey"] for r in skyline_core(df).collect()}
        want = set()
        for i, si, pi in rows:
            dominated = any(
                pj <= pi and sj >= si and (pj < pi or sj > si)
                for j, sj, pj in rows
                if j != i
            )
            if not dominated:
                want.add(i)
        assert got == want, (sorted(got), sorted(want), rows)

    run()


def test_bloom_no_false_negatives_property(spark):
    """Any string set inserted into the bitset passes its own membership
    probe — the theorem decontaminate_bloom's oracle equality rests on."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as F

    from spark_dba_spark.operators.text import (
        BLOOM_BITS,
        BLOOM_K,
        _bloom_hit_sql,
        _bloom_pos_sql,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        words=st.lists(
            st.text(
                alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FA),
                min_size=0,
                max_size=12,
            ),
            min_size=1,
            max_size=40,
            unique=True,
        )
    )
    def run(words):
        ev = spark.createDataFrame([(w,) for w in words], "s string")
        pos = ev.select(
            F.explode(
                F.array(*[F.expr(_bloom_pos_sql(i)) for i in range(BLOOM_K)])
            ).alias("pos")
        ).distinct()
        built = (
            pos.select(
                F.shiftright("pos", 6).cast("int").alias("w"),
                F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
            )
            .groupBy("w")
            .agg(F.bit_or("m").alias("bits"))
            .collect()
        )
        bitset = [0] * (BLOOM_BITS // 64)
        for r in built:
            bitset[r["w"]] = r["bits"]
        bloom_df = spark.createDataFrame(
            [(bitset,)], "bloom_bits array<long> not null"
        )
        passed = " AND ".join(_bloom_hit_sql(i) for i in range(BLOOM_K))
        n = ev.join(F.broadcast(bloom_df)).filter(F.expr(passed)).count()
        assert n == len(words)

    run()


def test_algorithmic_cores_empty_safe(spark):
    """Degenerate inputs must produce empty results, not crashes: the CC
    contraction on an empty edge set and the skyline on an empty frame."""
    from spark_dba_spark.operators.dedup import cc_components
    from spark_dba_spark.operators.relational import skyline_core

    assert (
        cc_components(spark.createDataFrame([], "doc_a long, doc_b long")).count()
        == 0
    )
    assert (
        skyline_core(
            spark.createDataFrame(
                [], "p_partkey long, p_size int, p_retailprice double"
            )
        ).count()
        == 0
    )


def test_autocorrelation_bounds_and_lag0_sanity(spark):
    """|r| ≤ 1 for every lag, and n_pairs decreases by exactly one per
    extra lag step on a contiguous spine."""
    from spark_dba_spark.operators.temporal import ev_autocorrelation

    rows = ev_autocorrelation(spark, SF_DIR).collect()
    assert rows
    by_lag = {r["lag"]: r for r in rows}
    for r in rows:
        assert -1.0 - 1e-9 <= r["autocorr"] <= 1.0 + 1e-9
    lags = sorted(by_lag)
    for a, b in zip(lags, lags[1:]):
        assert by_lag[a]["n_pairs"] - by_lag[b]["n_pairs"] == b - a


def test_cogroup_outputs_survive_partial_consumption(spark):
    """Regression for the Spark 4 cogroup column-pruning hazard: count()
    and single-column selects over the block-grid operators must not
    strip the UDF's input columns (was: KeyError 'embedding')."""
    from spark_dba_spark.operators.dedup import dedup_embedding_cosine
    from spark_dba_spark.operators.similarity import (
        emb_sim_histogram,
        sim_dup_pairs,
    )

    assert emb_sim_histogram(spark, SF_DIR).count() > 0
    pairs = sim_dup_pairs(spark, SF_DIR)
    n = pairs.count()
    assert pairs.select("vec_id_a").count() == n
    assert dedup_embedding_cosine(spark, SF_DIR).select("doc_id").count() > 0


def test_chunk_dedup_conserves(spark):
    """One keeper per distinct chunk content; keepers' copy counts sum to
    the total chunk count."""
    from spark_dba_spark.operators.text import dedup_chunks_exact

    rows = dedup_chunks_exact(spark, SF_DIR).collect()
    keepers = [r for r in rows if r["keep"]]
    assert len(keepers) == len({r["chunk_md5"] for r in rows})
    assert sum(r["n_copies"] for r in keepers) == len(rows)


def test_pca_power_converges_on_anisotropic(spark):
    """On a cloud with a real spectral gap the distributed power
    iteration must align with numpy's top eigenvector (|cos| >= 0.99)
    and the eigenvalue estimate must respect the Rayleigh bound
    lam_est <= lam_1 (which holds on ANY input)."""
    import numpy as np

    from spark_dba_spark.operators.similarity import _pca_power_pipeline

    rng = np.random.RandomState(7)
    d, n = 16, 400
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    # strong 1-D signal + isotropic noise -> big gap, fast convergence
    X = (
        np.outer(rng.randn(n) * 3.0, direction)
        + rng.randn(n, d) * 0.3
        + rng.randn(d) * 0.5  # nonzero mean: exercises the centering
    ).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    rows = _pca_power_pipeline(emb, iters=8).collect()
    v = np.array(
        [r["loading"] for r in sorted(rows, key=lambda r: r["dim_idx"])]
    )
    lam_est = rows[0]["eigval"]
    C = np.cov(X.astype(np.float64).T, bias=True)
    evals, evecs = np.linalg.eigh(C)
    cos = abs(float(v @ evecs[:, -1])) / np.linalg.norm(v)
    assert cos >= 0.99, f"power iteration misaligned: |cos|={cos:.4f}"
    assert lam_est <= evals[-1] + 1e-6, (lam_est, evals[-1])
    # fixture run (isotropic): Rayleigh bound must still hold
    from conftest import SF_DIR
    from spark_dba_spark.operators.similarity import emb_pca_power

    from spark_dba_spark.operators.similarity import EMB_DIM

    fx = emb_pca_power(spark, SF_DIR).collect()
    assert len(fx) == EMB_DIM, len(fx)  # one row per embedding dimension
    assert set(fx[0].asDict()) == {"dim_idx", "loading", "eigval"}
    assert fx[0]["eigval"] > 0


def test_pca_power_rejects_zero_iters(spark):
    """The documented test surface (any iteration count) must fail loud,
    not with an unresolved-column error: the output columns are defined
    by the unrolled loop, so iters must be >= 1 (ADVICE r5)."""
    import pytest as _pytest

    from spark_dba_spark.operators.similarity import _pca_power_pipeline

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="iters >= 1"):
        _pca_power_pipeline(emb, iters=0)


def test_pca_gram_partials_exact_vs_bigint():
    """The chunked-gemm partial Gram must equal the exact python-int
    Gram of the truncation-quantized matrix — including across the
    int64-flush path (driven by a tiny synthetic accumulator bound)."""
    import numpy as np
    import pandas as pd

    from spark_dba_spark.operators.similarity import (
        PCA_QUANT,
        _pca_gram_partials,
    )

    rng = np.random.RandomState(11)
    m = (rng.randn(257, 5) * 3.0).astype(np.float32).astype(np.float64)
    batches = [
        pd.DataFrame({"embedding": [list(r) for r in m[:100]]}),
        pd.DataFrame({"embedding": []}),
        pd.DataFrame({"embedding": [list(r) for r in m[100:]]}),
    ]
    (out,) = list(_pca_gram_partials(iter(batches)))
    k = np.hstack(
        [np.trunc(m * PCA_QUANT), np.full((m.shape[0], 1), PCA_QUANT)]
    )
    expect = {
        (a, b): int(
            sum(int(k[r, a]) * int(k[r, b]) for r in range(k.shape[0]))
        )
        for a in range(6)
        for b in range(6)
    }
    got = {
        (int(r.i), int(r.j)): int(r.s) for r in out.itertuples(index=False)
    }
    assert got == expect


def test_ntile_assign_bounded_equals_spark_ntile(spark):
    """_ntile_assign_bounded must equal Spark's own NTILE on adversarial
    frames — heavy ties (hi==lo degenerate histogram), n < k, and mixed
    duplicates — not just the fixture distribution the oracle covers."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.text import GRID_BINS, _ntile_assign_bounded

    cases = [
        [7.0] * 9,                      # all equal: hi == lo branch
        [1.0, 2.0, 3.0],                # n < k
        [5.0, 5.0, 1.0, 1.0, 1.0, 9.0, 9.0, 2.0, 2.0, 2.0, 2.0, 8.0],
        [float(x) for x in range(23)],  # distinct, n % k != 0
    ]
    for vals in cases:
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "doc_id long, val double"
        )
        got = {
            (r["doc_id"], r["nq"])
            for r in _ntile_assign_bounded(
                spark, df, "val", GRID_BINS, "nq"
            ).collect()
        }
        want = {
            (r["doc_id"], r["nq"])
            for r in df.withColumn(
                "nq",
                F.ntile(GRID_BINS).over(
                    W.orderBy(F.asc("val"), F.asc("doc_id"))
                ),
            ).collect()
        }
        assert got == want, vals


def test_canonical_corpus_invariants(spark):
    """Canonical-corpus materialization: every doc labeled exactly once,
    exactly ONE keeper per component, the keeper is the component's
    kept_doc_id for every member, keepers carry the component's max
    quality score, and the component labeling agrees with
    dedup_cc_clusters on every graph doc."""
    from spark_dba_spark.operators.dedup import (
        dedup_canonical_corpus,
        dedup_cc_clusters,
    )
    from spark_dba_spark.operators.text import text_quality

    rows = dedup_canonical_corpus(spark, SF_DIR).collect()
    assert len(rows) == len({r["doc_id"] for r in rows})
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r["component_id"], []).append(r)
    q = {
        r["doc_id"]: r["quality_score"]
        for r in text_quality(spark, SF_DIR).collect()
    }
    for comp, members in by_comp.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1, comp
        k = keepers[0]
        assert all(m["kept_doc_id"] == k["doc_id"] for m in members)
        assert all(m["n_members"] == len(members) for m in members)
        best = max(q[m["doc_id"]] for m in members)
        assert q[k["doc_id"]] == best
    cc = {
        r["doc_id"]: r["component_id"]
        for r in dedup_cc_clusters(spark, SF_DIR).collect()
    }
    got = {r["doc_id"]: r["component_id"] for r in rows}
    for d, c in cc.items():
        assert got[d] == c, (d, got[d], c)


def test_block_neardup_superset_of_exact_prefix_dups(spark):
    """Any two assets with IDENTICAL 256-byte heads share all 4 blocks,
    so every such pair must be found by mm_neardup_hamming (pigeonhole
    completeness at Hamming distance 0), provided no shared block is
    hot-pruned — the fixture's blocks are well under MAX_BLOCK_DF."""
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.multimodal import (
        BLOCK_LEN,
        N_BLOCKS,
        _assets,
        mm_neardup_hamming,
    )

    head = F.expr(
        f"substring(cast(payload as string), 1, {BLOCK_LEN * N_BLOCKS})"
    )
    a = _assets(spark, SF_DIR).select("doc_id", head.alias("head"))
    # only heads long enough to fill all 4 blocks qualify for 4 matches
    full = a.filter(F.length("head") >= BLOCK_LEN * N_BLOCKS)
    dup_heads = [
        r["head"]
        for r in full.groupBy("head")
        .agg(F.count("*").alias("c"))
        .filter("c > 1")
        .collect()
    ]
    expected = set()
    for h in dup_heads:
        ids = sorted(
            r["doc_id"] for r in full.filter(F.col("head") == h).collect()
        )
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in mm_neardup_hamming(spark, SF_DIR).collect()
    }
    assert expected <= got, expected - got


def test_block_neardup_non_ascii_no_vacuous_pairs(spark, tmp_path):
    """Regression (ADVICE r6): filtering blocks by BYTE length while
    slicing by CHARACTER position admitted past-the-end blocks for
    multi-byte text — those hashed md5('') and could vacuously pair
    unrelated short docs. Plant short non-ASCII docs (char length < one
    block, byte length > one block) plus one genuine near-dup pair and
    assert the Spark result matches the char-semantics oracle exactly.
    """
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.multimodal import (
        BLOCK_LEN,
        N_BLOCKS,
        ORACLE_MM_NEARDUP,
        mm_neardup_hamming,
    )

    # 40 chars of 3-byte CJK → 120 bytes: byte length clears blocks 0-1,
    # char length only block 0. Two unrelated such docs must NOT pair.
    cjk_a = "世界" * 20
    cjk_b = "数据" * 20
    base = "x" * (BLOCK_LEN * N_BLOCKS)
    near = base[:-1] + "y"  # differs only in the last block → 3-of-4
    texts = [cjk_a, cjk_b, base, near]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": ["zh", "zh", "en", "en"],
                "source": ["t"] * len(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["n_matching_blocks"])
        for r in mm_neardup_hamming(spark, str(tmp_path)).collect()
    )
    assert got == [(2, 3, 3)], got  # only the planted near-dup pair
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = sorted(tuple(r) for r in con.execute(ORACLE_MM_NEARDUP).fetchall())
    con.close()
    assert oracle == got


def test_clip_joint_align_cosine_invariants(spark):
    """Cosine bounds and positivity: the stub towers' +1 floor makes
    both norms strictly positive, so every alignment is a finite value
    in [-1, 1] (here all components positive -> (0, 1])."""
    from spark_dba_spark.operators.multimodal import mm_clip_joint_align

    rows = mm_clip_joint_align(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["t_norm2"] > 0 and r["i_norm2"] > 0
        assert 0.0 < r["align_r6"] <= 1.0
        assert r["dot"] > 0


def test_video_keyframe_dedup_clusters_planted_dups(spark, tmp_path):
    """Two videos sharing every keyframe block must land in one
    component with the min doc_id canonical; an unrelated video stays a
    singleton. doc_id % 3 == 2 selects the video modality."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.multimodal import (
        mm_video_keyframe_dedup,
    )

    # 325 chars -> n_frames = 1 + 325 % 10 = 6 -> keyframes 0, 2, 4
    base = "".join(chr(65 + (i * 7) % 26) for i in range(325))
    other = "".join(chr(97 + (i * 11) % 26) for i in range(325))
    # doc_ids 2, 5 (dups), 8 (unrelated) are all % 3 == 2; 0/1 are
    # other modalities and must not appear in the output.
    texts = {0: "img", 1: "aud", 2: base, 5: base, 8: other}
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": pa.array(
                    [len(texts[k]) for k in sorted(texts)], pa.int64()
                ),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = {
        r["doc_id"]: (r["component_id"], r["n_members"], r["is_canonical"])
        for r in mm_video_keyframe_dedup(spark, str(tmp_path)).collect()
    }
    assert set(got) == {2, 5, 8}
    assert got[2] == (2, 2, True)
    assert got[5] == (2, 2, False)
    assert got[8] == (8, 1, True)


def test_audio_fingerprint_pairs_share_landmarks(spark):
    """Every emitted pair is ordered, meets the landmark threshold, and
    genuinely shares that many (window, band) landmarks (recomputed
    independently from the RMS stage)."""
    from spark_dba_spark.operators.multimodal import (
        FP_QUANT,
        MIN_LANDMARKS,
        mm_audio_energy,
        mm_audio_fingerprint_match,
    )

    lm = {}
    for r in mm_audio_energy(spark, SF_DIR).collect():
        lm.setdefault(r["doc_id"], set()).add(
            (r["win"], int(r["rms_r4"] * FP_QUANT // 1))
        )
    pairs = mm_audio_fingerprint_match(spark, SF_DIR).collect()
    assert pairs
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert r["n_shared_landmarks"] >= MIN_LANDMARKS
        shared = lm[r["doc_a"]] & lm[r["doc_b"]]
        # the op prunes hot landmarks, so emitted count <= raw overlap
        assert r["n_shared_landmarks"] <= len(shared)


def test_audio_modality_fixture_is_ascii(spark, tmp_path):
    """The audio oracles (ORACLE_MM_AUDIO / ORACLE_MM_AUDIO_FP) re-derive
    the sample stream from text CODE POINTS while the Spark stage consumes
    payload BYTES — the units agree iff audio docs are pure ASCII (ADVICE
    r7). Part 1 asserts that assumption on every fixture SF; part 2 plants
    a non-ASCII audio doc and proves the units genuinely diverge (different
    window COUNTS), so a fixture-generator change can't silently rot the
    oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.multimodal import AUDIO_WIN, mm_audio_energy

    # derive the three SF paths from conftest's SF_DIR so the gate
    # travels with the fixture root instead of a hardcoded machine
    # layout (ADVICE r8)
    testdata_root = os.path.dirname(SF_DIR.rstrip("/"))
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        bad = con.execute(
            "SELECT count(*) FROM read_parquet(?) WHERE doc_id % 3 = 1 "
            "AND octet_length(CAST(text AS BLOB)) <> length(text)",
            [os.path.join(testdata_root, sf, "documents.parquet")],
        ).fetchone()[0]
        assert bad == 0, f"{sf}: non-ASCII audio docs break the byte==char unit"
    con.close()

    txt = "é" * 300  # 300 code points, 600 UTF-8 bytes
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),  # % 3 == 1 → audio
                "text": [txt],
                "lang": ["xx"],
                "source": ["planted"],
                "n_chars": pa.array([len(txt)], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    byte_wins = mm_audio_energy(spark, str(tmp_path)).count()
    char_wins = -(-len(txt) // AUDIO_WIN)  # what the code-point oracle sees
    assert byte_wins == 3 and char_wins == 2
    assert byte_wins != char_wins


def test_caption_retrieval_topk_shape_and_monotonic(spark):
    """Per query: exactly ranks 1..K, similarity non-increasing with
    rank, and the rank-1 candidate matches an independent brute-force
    argmax over the tower embeddings for a sample of queries."""
    from spark_dba_spark.operators.multimodal import (
        MM_RETR_K,
        MM_RETR_QMAX,
        _clip_towers,
        mm_caption_retrieval,
    )

    rows = mm_caption_retrieval(spark, SF_DIR).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["qid"], []).append(r)
    assert all(q < MM_RETR_QMAX for q in per_q)
    for q, rs in per_q.items():
        assert [r["rank"] for r in rs] == list(range(1, MM_RETR_K + 1))
        sims = [r["sim_r6"] for r in rs]
        assert sims == sorted(sims, reverse=True)
    towers = {
        r["doc_id"]: (r["t_emb"], r["i_emb"])
        for r in _clip_towers(spark, SF_DIR).collect()
    }
    import math

    for q in sorted(per_q)[:5]:
        t = towers[q][0]
        best = max(
            (
                (
                    round(
                        sum(a * b for a, b in zip(t, i))
                        / (
                            math.sqrt(sum(a * a for a in t))
                            * math.sqrt(sum(b * b for b in i))
                        ),
                        6,
                    ),
                    -cand,
                )
                for cand, (_, i) in towers.items()
            ),
        )
        assert per_q[q][0]["cand_id"] == -best[1]


def test_modality_quota_pack_matches_greedy_per_modality(spark):
    """The bucket-decomposed selection must equal a brute-force greedy
    pack per modality (sort by quality desc / doc_id, take while
    bytes_before < budget), and every kept asset respects the budget."""
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.multimodal import (
        MM_QUOTA_BYTES,
        _assets,
        mm_modality_quota_pack,
    )
    from spark_dba_spark.operators.text import text_quality

    tq = {
        r["doc_id"]: r["quality_score"]
        for r in text_quality(spark, SF_DIR).collect()
    }
    assets = (
        _assets(spark, SF_DIR)
        .select("doc_id", "media_type", F.octet_length("payload").alias("b"))
        .collect()
    )
    expected = {}
    by_mt = {}
    for r in assets:
        by_mt.setdefault(r["media_type"], []).append(r)
    for mt, rows in by_mt.items():
        rows.sort(key=lambda r: (-tq[r["doc_id"]], r["doc_id"]))
        acc = 0
        for r in rows:
            if acc < MM_QUOTA_BYTES:
                expected[r["doc_id"]] = (mt, r["b"], acc)
            acc += r["b"]
    got = {
        r["doc_id"]: (r["media_type"], r["byte_len"], r["bytes_before"])
        for r in mm_modality_quota_pack(spark, SF_DIR).collect()
    }
    assert got == expected
    assert all(v[2] < MM_QUOTA_BYTES for v in got.values())


def test_bpe_first_merge_equals_brute(spark):
    """The vocabulary-contraction BPE pair count equals the per-
    occurrence brute force (the contraction is count-weighting, not an
    approximation), and the cut is the (freq DESC, pair) total order."""
    import duckdb

    from spark_dba_spark.operators.text import (
        BPE_TOP_K,
        text_bpe_first_merge,
    )

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
        ).fetchall()
    ]
    con.close()
    from collections import Counter

    freq: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                freq[w[i : i + 2]] += 1
    expect = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    got = [
        (r["pair"], r["freq"])
        for r in text_bpe_first_merge(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_heaps_growth_equals_brute_and_is_monotone(spark):
    """The windowed first-occurrence curve equals a sequential-set brute
    force per source, and the quartile samples are monotone
    non-decreasing up to the total distinct-type count."""
    import duckdb

    from spark_dba_spark.operators.text import text_heaps_vocab_growth

    con = duckdb.connect()
    rows = con.execute(
        "SELECT source, doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY source, doc_id"
    ).fetchall()
    con.close()

    def bigrams(t):
        ws = t.split(" ")
        if len(ws) >= 2:
            return [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        return [t]

    per: dict[str, list] = {}
    for src, did, t in rows:
        per.setdefault(src, []).append((did, t))
    expect = {}
    for src, docs in per.items():
        seen: set = set()
        curve = []
        for _, t in docs:
            seen.update(bigrams(t))
            curve.append(len(seen))
        n = len(curve)
        expect[src] = (
            n,
            curve[(n + 3) // 4 - 1],
            curve[(n + 1) // 2 - 1],
            curve[(3 * n + 3) // 4 - 1],
            curve[-1],
        )
    got = {
        r["source"]: (
            r["n_docs"],
            r["types_q25"],
            r["types_q50"],
            r["types_q75"],
            r["types_total"],
        )
        for r in text_heaps_vocab_growth(spark, SF_DIR).collect()
    }
    assert got == expect
    for n, q25, q50, q75, tot in got.values():
        assert 0 <= q25 <= q50 <= q75 <= tot


def test_energy_prefix_and_confusion_equal_numpy(spark):
    """Both fixed-point embedding audits equal a NumPy re-derivation
    under the shared conventions (trunc-toward-zero grid quantization,
    truncating centroid division, (d2, label) argmin tie-break), and
    the confusion row sums give back the per-label populations."""
    import numpy as np
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.similarity import (
        KM_QUANT,
        emb_energy_prefix,
        emb_nearest_centroid_confusion,
    )

    tb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    labels = np.asarray(tb["label"])
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tb["embedding"].to_pylist()]
    )
    q = np.trunc(vecs * KM_QUANT).astype(np.int64)

    # energy prefixes
    got_e = {
        r["label"]: (
            r["n_vecs"],
            r["energy_q2"],
            r["e8_ratio"],
            r["e16_ratio"],
            r["e32_ratio"],
        )
        for r in emb_energy_prefix(spark, SF_DIR).collect()
    }

    def half_up(num, den):
        return float((int(num) * 2_000_000 + int(den)) // (2 * int(den))) / 1e6

    for lab in np.unique(labels):
        ql = q[labels == lab]
        sq = ql * ql
        e_all = int(sq.sum())
        e8, e16, e32 = (int(sq[:, :m].sum()) for m in (8, 16, 32))
        assert got_e[int(lab)] == (
            ql.shape[0],
            e_all,
            half_up(e8, e_all),
            half_up(e16, e_all),
            half_up(e32, e_all),
        )

    # nearest-centroid confusion
    def tdiv(a, b):
        return int(a) // int(b) if a >= 0 else -((-int(a)) // int(b))

    ulabs = sorted(int(x) for x in np.unique(labels))
    cents = np.stack(
        [
            np.array(
                [
                    tdiv(s, (labels == lab).sum())
                    for s in q[labels == lab].sum(axis=0)
                ],
                dtype=np.int64,
            )
            for lab in ulabs
        ]
    )
    from collections import Counter

    expect: Counter = Counter()
    for i in range(q.shape[0]):
        d2 = ((q[i][None, :] - cents) ** 2).sum(axis=1)
        pred = ulabs[int(np.lexsort((np.array(ulabs), d2))[0])]
        expect[(int(labels[i]), pred)] += 1
    got_c = {
        (r["true_label"], r["pred_label"]): r["n"]
        for r in emb_nearest_centroid_confusion(spark, SF_DIR).collect()
    }
    assert got_c == dict(expect)
    row_sums: dict = {}
    for (t, _), n in got_c.items():
        row_sums[t] = row_sums.get(t, 0) + n
    assert row_sums == {
        int(lab): int((labels == lab).sum()) for lab in ulabs
    }


def test_count_min_overestimates_and_matches_brute(spark):
    """CMS guarantee: estimate >= true count for every probed key; and
    the fixed-md5 sketch equals a Python re-derivation of the counter
    matrix (pins the bucket-function parity both engines rely on)."""
    import duckdb
    import hashlib
    from collections import Counter

    from spark_dba_spark.operators.relational import (
        CMS_D,
        CMS_TOP,
        CMS_W,
        sketch_count_min_deterministic,
    )

    con = duckdb.connect()
    keys = [
        r[0]
        for r in con.execute(
            f"SELECT l_partkey FROM read_parquet('{SF_DIR}/lineitem.parquet')"
        ).fetchall()
    ]
    con.close()
    true = Counter(keys)

    def bucket(k, j):
        h = hashlib.md5(f"{k}:cms:{j}".encode()).hexdigest()
        return int(h[:7], 16) % CMS_W

    counters = [[0] * CMS_W for _ in range(CMS_D)]
    for k, n in true.items():
        for j in range(CMS_D):
            counters[j][bucket(k, j)] += n
    top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP]
    expect = {}
    for k, n in top:
        est = min(counters[j][bucket(k, j)] for j in range(CMS_D))
        expect[k] = (n, est, est - n)
    got = {
        r["l_partkey"]: (r["true_n"], r["cms_est"], r["over_n"])
        for r in sketch_count_min_deterministic(spark, SF_DIR).collect()
    }
    assert got == expect
    for n, est, over in got.values():
        assert est >= n and over >= 0


def test_khop_reach_equals_python_bfs(spark):
    """The unrolled frontier-join BFS equals a textbook queue BFS over
    the same near-dup edge set, capped at KHOP_HOPS."""
    from spark_dba_spark.operators.dedup import (
        KHOP_HOPS,
        KHOP_MOD,
        dedup_ngram_jaccard,
        graph_khop_reach,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    ]
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {n: 0 for n in adj if n % KHOP_MOD == 0}
    frontier = set(dist)
    for h in range(1, KHOP_HOPS + 1):
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        frontier = nxt
    got = {
        r["doc_id"]: r["dist"]
        for r in graph_khop_reach(spark, SF_DIR).collect()
    }
    assert got == dist
    assert any(d > 0 for d in got.values())  # non-vacuous propagation


def test_pq_distortion_equals_numpy(spark):
    """The SQL-side PQ distortion audit equals a NumPy re-derivation
    against the same seed codebook (argmin ties to lowest codeword)."""
    import numpy as np
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.similarity import (
        KM_QUANT,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        emb_pq_distortion,
    )

    tb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.asarray(tb["vec_id"])
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tb["embedding"].to_pylist()]
    )
    q = np.trunc(vecs * KM_QUANT).astype(np.int64)
    order = np.argsort(ids)
    q = q[order]
    cb = q[:PQ_K].reshape(PQ_K, PQ_M, PQ_SUBDIM)
    qs = q.reshape(-1, PQ_M, PQ_SUBDIM)
    expect = {}
    for m in range(PQ_M):
        d = ((qs[:, None, m, :] - cb[None, :, m, :]) ** 2).sum(axis=2)
        codes = d.argmin(axis=1)  # first min -> lowest codeword id
        min_d2 = d[np.arange(d.shape[0]), codes]
        n = qs.shape[0]
        tot = int(min_d2.sum())
        expect[m] = (
            n,
            tot,
            float((tot * 2_000_000 + n) // (2 * n)) / 1e6,
            len(set(codes.tolist())),
        )
    got = {
        r["subspace"]: (
            r["n_vecs"],
            r["total_q2"],
            r["mean_q2_r6"],
            r["codes_used"],
        )
        for r in emb_pq_distortion(spark, SF_DIR).collect()
    }
    assert got == expect


def test_random_projection_audit_equals_numpy(spark):
    """The md5-parity sign matrix and integer projection equal a NumPy
    re-derivation, and the JL ratio sits near 1 (norm preservation in
    expectation) for every label on the fixture."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.similarity import (
        EMB_DIM,
        JL_K,
        KM_QUANT,
        emb_random_projection_audit,
    )

    tb = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    labels = np.asarray(tb["label"])
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tb["embedding"].to_pylist()]
    )
    q = np.trunc(vecs * KM_QUANT).astype(np.int64)
    signs = np.array(
        [
            [
                1
                if int(hashlib.md5(f"{d}:jl:{j}".encode()).hexdigest()[:7], 16)
                % 2
                == 0
                else -1
                for j in range(JL_K)
            ]
            for d in range(EMB_DIM)
        ],
        dtype=np.int64,
    )
    proj = q @ signs  # exact integer dot products
    got = {
        r["label"]: (r["n_vecs"], r["orig_q2"], r["proj_q2"], r["jl_ratio_r6"])
        for r in emb_random_projection_audit(spark, SF_DIR).collect()
    }
    for lab in np.unique(labels):
        sel = labels == lab
        orig = int((q[sel] ** 2).sum())
        pq2 = int((proj[sel] ** 2).sum())
        den = JL_K * orig
        ratio = float((pq2 * 2_000_000 + den) // (2 * den)) / 1e6
        assert got[int(lab)] == (int(sel.sum()), orig, pq2, ratio)
        assert 0.5 < ratio < 2.0  # JL expectation: ~1


def _brute_pair_sims(sf_dir):
    """Python twin of dedup._pair_sims: distinct word-3-gram shingles
    (whole-text fallback for <3-token docs), MAX_DF prune, all
    nonzero-overlap pairs -> {(a, b): (inter, na, nb)}."""
    from collections import Counter

    import duckdb

    from spark_dba_spark.operators.dedup import MAX_DF

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    con.close()
    sets = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        if len(ws) >= 3:
            sh = {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        else:
            sh = {text}
        sets[doc_id] = sh
    df = Counter(s for sh in sets.values() for s in sh)
    sets = {d: {s for s in sh if df[s] <= MAX_DF} for d, sh in sets.items()}
    pairs = {}
    inv = {}
    for d, sh in sets.items():
        for s in sh:
            inv.setdefault(s, []).append(d)
    seen = set()
    for ids in inv.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                inter = len(sets[a] & sets[b])
                pairs[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return sets, pairs


def test_threshold_sweep_matches_brute(spark):
    """The one-pass threshold grid equals the Python brute force at
    every tenth, and the t=0.8 row agrees with dedup_ngram_jaccard's
    own pair count (same machinery, so the curve describes the real
    production candidate set)."""
    from spark_dba_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_threshold_sweep,
    )

    _, pairs = _brute_pair_sims(SF_DIR)
    rows = dedup_threshold_sweep(spark, SF_DIR).collect()
    assert [r["threshold_tenths"] for r in rows] == list(range(1, 11))
    for r in rows:
        t = r["threshold_tenths"]
        hit = [(a, b) for (a, b), (i, na, nb) in pairs.items()
               if 10 * i >= t * (na + nb - i)]
        docs = {d for p in hit for d in p}
        assert (r["pairs_ge"], r["docs_ge"]) == (len(hit), len(docs)), t
    n_prod = len(dedup_ngram_jaccard(spark, SF_DIR).collect())
    assert rows[7]["pairs_ge"] == n_prod  # t = 0.8 row == production tau


def test_assortativity_matches_fraction_brute(spark):
    """Degree assortativity equals the exact-Fraction Pearson computed
    from the brute-force edge set (symmetric double-counted edges make
    the marginals equal, so the sqrt-free collapse is exact)."""
    from fractions import Fraction

    from spark_dba_spark.operators.dedup import graph_degree_assortativity

    _, pairs = _brute_pair_sims(SF_DIR)
    edges = [(a, b) for (a, b), (i, na, nb) in pairs.items()
             if Fraction(i, na + nb - i) >= Fraction(4, 5)]
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    m = len(sym)
    sxy = sum(deg[a] * deg[b] for a, b in sym)
    sx = sum(deg[a] for a, _ in sym)
    sxx = sum(deg[a] ** 2 for a, _ in sym)
    row = graph_degree_assortativity(spark, SF_DIR).collect()[0]
    assert (row["n_edges"], row["sum_xy"], row["sum_x"], row["sum_x2"]) == (
        len(edges), sxy, sx, sxx)
    num, den = m * sxy - sx * sx, m * sxx - sx * sx
    if den == 0:
        assert row["assortativity_r6"] is None
    else:
        sgn = 1 if num >= 0 else -1
        expect = sgn * float(
            (abs(num) * 2_000_000 + den) // (2 * den)) / 1e6
        assert row["assortativity_r6"] == expect


def test_mattr_matches_sliding_set_brute(spark):
    """The interval-contribution closed form equals the literal
    sliding-window set count for every document — guards the
    lo/hi interval algebra and the lag-window first-occurrence
    attribution."""
    import duckdb

    from spark_dba_spark.operators.text import MATTR_W, text_mattr_diversity

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    expect = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        length = len(ws)
        if length < MATTR_W:
            continue
        dsum = sum(
            len(set(ws[i:i + MATTR_W]))
            for i in range(length - MATTR_W + 1)
        )
        expect[doc_id] = (length, length - MATTR_W + 1, dsum)
    rows = text_mattr_diversity(spark, SF_DIR).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["n_windows"], r["distinct_sum"])
           for r in rows}
    assert got == expect
    for r in rows:
        den = r["n_windows"] * MATTR_W
        assert r["mattr_r6"] == float(
            (r["distinct_sum"] * 2_000_000 + den) // (2 * den)) / 1e6
        assert 0 < r["mattr_r6"] <= 1.0
