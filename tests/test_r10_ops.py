"""Brute-force Python twins for the round-10 operators: each op's full
pipeline replayed with exact integer arithmetic on plain Python/numpy
data structures, plus the invariants the oracle-parity check can't see
(fixture non-degeneracy, candidate-set containment, band coverage)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np

from conftest import SF_DIR


def _r6(num: int, den: int) -> float:
    return float((num * 2_000_000 + den) // (2 * den)) / 1e6


def _docs_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _emb_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    return rows


def test_longest_dup_span_matches_python_brute(spark):
    """Interval-union region readout equals a literal position-set
    replay: mark every token position covered by a duplicated window,
    then measure maximal runs."""
    from spark_dba_spark.operators.text import SPAN_W, dedup_longest_dup_span

    rows = _docs_rows()
    owner: dict = {}
    spans_per_doc: dict = {}
    toks: dict = {}
    for doc_id, text, _ in rows:
        ws = text.split(" ")
        toks[doc_id] = len(ws)
        spans = [
            " ".join(ws[i:i + SPAN_W])
            for i in range(0, max(len(ws) - SPAN_W + 1, 0))
        ]
        spans_per_doc[doc_id] = spans
        for s in spans:
            owner.setdefault(s, set()).add(doc_id)
    got = {
        r["doc_id"]: r
        for r in dedup_longest_dup_span(spark, SF_DIR).collect()
    }
    assert set(got) == set(toks)
    any_region = False
    for doc_id, spans in spans_per_doc.items():
        covered: set = set()
        for i, s in enumerate(spans):
            if len(owner[s]) >= 2:
                covered.update(range(i, i + SPAN_W))
        regions: list = []
        cur = None
        for p in sorted(covered):
            if cur is None or p > cur[1] + 1:
                cur = [p, p]
                regions.append(cur)
            else:
                cur[1] = p
        lens = [b - a + 1 for a, b in regions]
        r = got[doc_id]
        assert r["n_dup_regions"] == len(regions)
        assert r["max_dup_span"] == (max(lens) if lens else 0)
        assert r["dup_tokens"] == sum(lens)
        assert r["dup_token_share_r6"] == _r6(sum(lens), toks[doc_id])
        assert r["dup_tokens"] <= toks[doc_id]  # union can't exceed doc
        if regions:
            any_region = True
    assert any_region, "fixture must exercise ≥1 duplicated region"


def test_boilerplate_heads_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        HEAD_TOKS,
        text_boilerplate_heads,
    )

    rows = _docs_rows()
    head_owners: dict = {}
    per_doc: dict = {}
    for doc_id, text, source in rows:
        head = " ".join(text.split(" ")[:HEAD_TOKS])
        per_doc[doc_id] = (source, head)
        head_owners.setdefault(head, set()).add(doc_id)
    agg: dict = {}
    for doc_id, (source, head) in per_doc.items():
        n_docs, boiler, heads = agg.setdefault(source, [0, 0, set()])
        agg[source][0] += 1
        if len(head_owners[head]) >= 2:
            agg[source][1] += 1
            agg[source][2].add(head)
    got = {r["source"]: r for r in
           text_boilerplate_heads(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for source, (n_docs, n_boiler, heads) in agg.items():
        r = got[source]
        assert (r["n_docs"], r["n_boiler_docs"], r["n_boiler_heads"]) == (
            n_docs, n_boiler, len(heads),
        )
        assert r["boiler_share_r6"] == _r6(n_boiler, n_docs)
    assert sum(v[1] for v in agg.values()) > 0, (
        "fixture must exercise ≥1 shared head"
    )


def test_span_decon_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        SPAN_EVAL_MOD,
        SPAN_W,
        doc_span_decontamination,
    )

    rows = _docs_rows()
    eval_fps: set = set()
    for doc_id, text, _ in rows:
        if doc_id % SPAN_EVAL_MOD == 0:
            ws = text.split(" ")
            for i in range(0, max(len(ws) - SPAN_W + 1, 0)):
                eval_fps.add(" ".join(ws[i:i + SPAN_W]))
    got = {r["doc_id"]: r for r in
           doc_span_decontamination(spark, SF_DIR).collect()}
    train = [(d, t) for d, t, _ in rows if d % SPAN_EVAL_MOD != 0]
    assert set(got) == {d for d, _ in train}
    for doc_id, text in train:
        ws = text.split(" ")
        spans = [
            " ".join(ws[i:i + SPAN_W])
            for i in range(0, max(len(ws) - SPAN_W + 1, 0))
        ]
        hits = sum(1 for s in spans if s in eval_fps)
        r = got[doc_id]
        assert (r["n_windows"], r["n_eval_hits"]) == (len(spans), hits)
        if spans:
            assert r["eval_hit_share_r6"] == _r6(hits, len(spans))
        else:
            assert r["eval_hit_share_r6"] == 0.0


def _mp_candidates_brute():
    from spark_dba_spark.operators.similarity import (
        EMB_DIM,
        LSH_PLANES,
        MP_TABLES,
        N_QUERIES,
    )

    rows = _emb_rows()
    ids = [r[0] for r in rows]
    M = np.array([r[1] for r in rows], dtype=np.float64)
    planes = np.empty((MP_TABLES, LSH_PLANES, EMB_DIM))
    for t in range(MP_TABLES):
        for p in range(LSH_PLANES):
            for d in range(EMB_DIM):
                h = hashlib.md5(f"plane:{t}:{p}:{d}".encode()).hexdigest()
                planes[t, p, d] = (int(h[:15], 16) / float(1 << 60)) * 2 - 1
    weights = 1 << np.arange(LSH_PLANES, dtype=np.int64)
    buckets: dict = {}
    bucket_of: dict = {}
    for t in range(MP_TABLES):
        bk = ((M @ planes[t].T) > 0) @ weights
        for vid, b in zip(ids, bk):
            buckets.setdefault((t, int(b)), set()).add(vid)
            bucket_of[(t, vid)] = int(b)
    cands: dict = {q: set() for q in ids if q < N_QUERIES}
    for q in cands:
        for t in range(MP_TABLES):
            b = bucket_of[(t, q)]
            for pb in [b] + [b ^ (1 << i) for i in range(LSH_PLANES)]:
                cands[q] |= buckets.get((t, pb), set())
        cands[q].discard(q)
    return cands


def test_lsh_multiprobe_matches_numpy_brute(spark):
    """Candidate counts equal the numpy replay exactly; the ranked
    output draws only from the brute candidate set, ranks are
    contiguous from 1, and sims are non-increasing per query."""
    from spark_dba_spark.operators.similarity import (
        TOP_K,
        sim_lsh_multiprobe,
        sim_lsh_multiprobe_candidates,
    )

    cands = _mp_candidates_brute()
    got_counts = {
        r["qid"]: r["n_candidates"]
        for r in sim_lsh_multiprobe_candidates(spark, SF_DIR).collect()
    }
    want_counts = {q: len(v) for q, v in cands.items() if v}
    assert got_counts == want_counts
    ranked = sim_lsh_multiprobe(spark, SF_DIR).collect()
    per_q: dict = {}
    for r in ranked:
        per_q.setdefault(r["qid"], []).append(r)
        assert r["vec_id"] in cands[r["qid"]]
    for qid, rs in per_q.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["sim_r4"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert len(rs) == min(TOP_K, len(cands[qid]))


def test_multiprobe_widens_single_table_candidates(spark):
    """Probing Hamming-1 buckets must produce at least as many
    candidates per query as the SAME tables probed once — the recall
    direction multi-probe exists for."""
    from pyspark.sql import functions as F

    from spark_dba_spark.operators.similarity import (
        MP_TABLES,
        N_QUERIES,
        _lsh_bucketed,
        sim_lsh_multiprobe_candidates,
    )

    bucketed = _lsh_bucketed(spark, SF_DIR).filter(F.col("tbl") < MP_TABLES)
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "tbl", "bucket"
    )
    single = (
        q.join(bucketed.select("vec_id", "tbl", "bucket"), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
        .groupBy("qid")
        .count()
    )
    single_counts = {r["qid"]: r["count"] for r in single.collect()}
    multi_counts = {
        r["qid"]: r["n_candidates"]
        for r in sim_lsh_multiprobe_candidates(spark, SF_DIR).collect()
    }
    assert set(single_counts) <= set(multi_counts)
    for qid, n in single_counts.items():
        assert multi_counts[qid] >= n
    assert sum(multi_counts.values()) > sum(single_counts.values()), (
        "probes must add at least one candidate somewhere"
    )


def test_sign_sketch_matches_numpy_brute(spark):
    from spark_dba_spark.operators.similarity import (
        KM_QUANT,
        SKETCH_OFFSETS,
        emb_sign_sketch_agreement,
    )

    rows = _emb_rows()
    ids = [r[0] for r in rows]
    M = np.array([r[1] for r in rows], dtype=np.float64)
    Q = np.trunc(M * KM_QUANT).astype(np.int64)
    sk = (Q > 0).astype(np.int64)
    idx = {v: i for i, v in enumerate(ids)}
    bands: dict = {}
    for a in ids:
        for off in range(1, SKETCH_OFFSETS + 1):
            b = a + off
            if b not in idx:
                continue
            qa, qb = Q[idx[a]], Q[idx[b]]
            dot = int((qa * qb).sum())
            ham = int((sk[idx[a]] != sk[idx[b]]).sum())
            band = ham // 8
            n, pos, neg = bands.setdefault(band, [0, 0, 0])
            bands[band][0] += 1
            if dot > 0:
                bands[band][1] += 1
            elif dot < 0:
                bands[band][2] += 1
    got = {r["band"]: r for r in
           emb_sign_sketch_agreement(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for band, (n, pos, neg) in bands.items():
        r = got[band]
        assert (r["n_pairs"], r["n_pos"], r["n_neg"]) == (n, pos, neg)
        assert r["pos_share_r6"] == _r6(pos, n)
    assert len(bands) >= 2, "fixture must spread over ≥2 Hamming bands"


def _neardup_graph_brute(spark):
    """Edge set bootstrapped from dedup_ngram_jaccard (itself
    independently brute-tested in test_llm_ops) + adjacency sets."""
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard

    edges = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def test_kcore_peel_matches_python_brute(spark):
    """Synchronous peeling replayed on adjacency sets: same removal
    rounds, same surviving-core degrees; peeling is monotone (a node
    removed in round r had degree < K_CORE at the START of round r)."""
    from spark_dba_spark.operators.dedup import (
        K_CORE,
        PEEL_ROUNDS,
        graph_kcore_peel,
    )

    _, adj = _neardup_graph_brute(spark)
    alive = {n: set(nbrs) for n, nbrs in adj.items()}
    removed_round: dict = {}
    for rnd in range(1, PEEL_ROUNDS + 1):
        victims = [n for n, nbrs in alive.items() if len(nbrs) < K_CORE]
        for n in victims:
            removed_round[n] = rnd
        for n in victims:
            for m in alive[n]:
                if m in alive and m not in victims:
                    alive[m].discard(n)
            del alive[n]
    got = {r["doc_id"]: r for r in graph_kcore_peel(spark, SF_DIR).collect()}
    assert set(got) == set(adj)
    for n in adj:
        r = got[n]
        assert r["removed_round"] == removed_round.get(n, 0)
        assert r["core_degree"] == (len(alive[n]) if n in alive else 0)
    assert removed_round, "fixture graph must peel at least one node"
    assert alive, "fixture graph must keep a non-empty 2-core"


def test_label_propagation_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.dedup import (
        LPA_ROUNDS,
        graph_label_propagation,
    )

    _, adj = _neardup_graph_brute(spark)
    lbl = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for n, nbrs in adj.items():
            votes = Counter(lbl[m] for m in nbrs)
            top = max(votes.values())
            nxt[n] = min(l for l, c in votes.items() if c == top)
        lbl = nxt
    got = {r["doc_id"]: r["community"]
           for r in graph_label_propagation(spark, SF_DIR).collect()}
    assert got == lbl
    assert len(set(lbl.values())) < len(lbl), (
        "fixture must merge at least one community"
    )


def test_global_transitivity_matches_python_brute(spark):
    from spark_dba_spark.operators.dedup import graph_global_transitivity

    edges, adj = _neardup_graph_brute(spark)
    tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if a < b < c:
                tri += 1
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    r = graph_global_transitivity(spark, SF_DIR).collect()[0]
    assert r["n_nodes"] == len(adj)
    assert r["n_edges"] == len(edges)
    assert r["n_wedges"] == wedges
    assert r["n_closed"] == 3 * tri
    assert r["transitivity_r6"] == (
        _r6(3 * tri, wedges) if wedges else 0.0
    )


def test_degree_histogram_matches_python_brute(spark):
    from spark_dba_spark.operators.dedup import graph_degree_histogram

    _, adj = _neardup_graph_brute(spark)
    bands: dict = {}
    for nbrs in adj.values():
        d = len(nbrs)
        band = d.bit_length()  # == length(bin(d)) for d >= 1
        n, lo, hi = bands.setdefault(band, [0, d, d])
        bands[band][0] += 1
        bands[band][1] = min(bands[band][1], d)
        bands[band][2] = max(bands[band][2], d)
    got = {r["band"]: r for r in
           graph_degree_histogram(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    total = len(adj)
    for band, (n, lo, hi) in bands.items():
        r = got[band]
        assert (r["n_nodes"], r["min_degree"], r["max_degree"]) == (n, lo, hi)
        assert r["node_share_r6"] == _r6(n, total)


def test_char_class_profile_matches_python_brute(spark):
    from spark_dba_spark.operators.text import text_char_class_profile

    rows = _docs_rows()
    agg: dict = {}
    for _, text, source in rows:
        nc = len(text)
        nv = sum(1 for ch in text if ch in "aeiou")
        nsp = text.count(" ")
        a = agg.setdefault(source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += nc
        a[2] += nv
        a[3] += nsp
    got = {r["source"]: r for r in
           text_char_class_profile(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for source, (nd, nc, nv, nsp) in agg.items():
        r = got[source]
        assert (r["n_docs"], r["n_chars"], r["n_vowels"],
                r["n_consonants"], r["n_spaces"]) == (
            nd, nc, nv, nc - nv - nsp, nsp)
        assert r["vowel_share_r6"] == _r6(nv, nc)
        assert r["letters_per_word_r6"] == _r6(nc - nsp, nsp + nd)


def test_consonant_runs_matches_python_brute(spark):
    import re

    from spark_dba_spark.operators.text import (
        RUN_LONG,
        text_consonant_runs,
    )

    rows = _docs_rows()
    got = {r["doc_id"]: r for r in
           text_consonant_runs(spark, SF_DIR).collect()}
    assert set(got) == {d for d, _, _ in rows}
    saw_long = False
    for doc_id, text, _ in rows:
        frags = [f for f in re.split(r"[aeiou ]+", text) if f]
        r = got[doc_id]
        assert r["n_runs"] == len(frags)
        assert r["max_run"] == (max(map(len, frags)) if frags else 0)
        n_long = sum(1 for f in frags if len(f) >= RUN_LONG)
        assert r["n_long_runs"] == n_long
        saw_long = saw_long or n_long > 0
    assert saw_long, "fixture must exercise >=1 long consonant run"


def test_bpe_merge_sequence_matches_python_brute(spark):
    """Full 4-round BPE replay on (symbols, count) lists with greedy
    left-to-right merging; step 1 must equal text_bpe_first_merge's
    top pair (same counting, chars == round-1 symbols)."""
    from collections import Counter

    from spark_dba_spark.operators.text import (
        BPE_MERGE_ROUNDS,
        text_bpe_first_merge,
        text_bpe_merge_sequence,
    )

    rows = _docs_rows()
    wc = Counter()
    for _, text, _ in rows:
        for w in text.split(" "):
            if len(w) >= 2:
                wc[w] += 1
    vocab = [(list(w), c) for w, c in wc.items()]
    expect = []
    for _ in range(BPE_MERGE_ROUNDS):
        pc: Counter = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        (x, z), freq = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((x, z, freq))
        merged = []
        for syms, c in vocab:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == x
                    and syms[i + 1] == z
                ):
                    out.append(x + z)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged.append((out, c))
        vocab = merged
    got = [
        (r["pair_x"], r["pair_y"], r["freq"])
        for r in text_bpe_merge_sequence(spark, SF_DIR)
        .orderBy("merge_step")
        .collect()
    ]
    assert got == expect
    first = text_bpe_first_merge(spark, SF_DIR).collect()[0]
    assert (got[0][0] + got[0][1], got[0][2]) == (
        first["pair"], first["freq"],
    )


def test_cohens_kappa_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        stats_cohens_kappa_langid,
        text_lang_id,
    )

    preds = [
        (r["lang"], r["pred_lang"])
        for r in text_lang_id(spark, SF_DIR).collect()
    ]
    n = len(preds)
    agree = sum(1 for a, b in preds if a == b)
    cats = {c for p in preds for c in p}
    sum_rc = sum(
        sum(1 for a, _ in preds if a == c)
        * sum(1 for _, b in preds if b == c)
        for c in cats
    )
    r = stats_cohens_kappa_langid(spark, SF_DIR).collect()[0]
    assert (r["n_docs"], r["n_agree"], r["sum_rc"]) == (n, agree, sum_rc)
    num, den = n * agree - sum_rc, n * n - sum_rc
    assert den > 0, "fixture must not be single-category"
    sign = 1 if num >= 0 else -1
    assert r["kappa_r6"] == sign * _r6(abs(num), den)


def test_bloom_fpr_matches_python_brute(spark):
    import duckdb as _dd

    from spark_dba_spark.operators.text import (
        FPR_BLOOM_K,
        FPR_BLOOM_M,
        sketch_bloom_fpr_audit,
    )

    con = _dd.connect()
    mkeys = {
        f"ord:{k}" for (k,) in con.execute(
            f"SELECT DISTINCT o_custkey FROM "
            f"read_parquet('{SF_DIR}/orders.parquet')").fetchall()
    }
    pkeys = {
        f"cust:{k}" for (k,) in con.execute(
            f"SELECT DISTINCT c_custkey FROM "
            f"read_parquet('{SF_DIR}/customer.parquet')").fetchall()
    }
    con.close()

    def positions(s):
        h = hashlib.md5(s.encode()).hexdigest()
        h1 = int(h[0:15], 16) % FPR_BLOOM_M
        h2 = 1 + int(h[15:30], 16) % FPR_BLOOM_M
        return [(h1 + i * h2) % FPR_BLOOM_M for i in range(FPR_BLOOM_K)]

    bits: set = set()
    for s in mkeys:
        bits.update(positions(s))
    n_pass = sum(
        1 for s in pkeys if all(p in bits for p in positions(s))
    )
    r = sketch_bloom_fpr_audit(spark, SF_DIR).collect()[0]
    assert (r["n_members"], r["n_probes"], r["n_pass"], r["n_bits_set"]) \
        == (len(mkeys), len(pkeys), n_pass, len(bits))
    assert r["fpr_r6"] == _r6(n_pass, len(pkeys))
    assert r["fill_r6"] == _r6(len(bits), FPR_BLOOM_M)
    assert n_pass > 0, "fixture must measure a nonzero FPR"


def test_kruskal_wallis_matches_python_brute(spark):
    import math
    from fractions import Fraction

    import duckdb as _dd

    from spark_dba_spark.operators.temporal import (
        stats_kruskal_wallis_daily,
    )

    con = _dd.connect()
    ev = con.execute(
        f"SELECT CAST(ts AS DATE), event_type, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    con.close()
    daily: dict = {}
    for dt, et, v in ev:
        daily[(dt, et)] = daily.get((dt, et), 0) + math.floor(
            v * 100 + 0.5
        )
    obs = [
        (cents, hashlib.md5(f"{dt}:{et}".encode()).hexdigest(), et)
        for (dt, et), cents in daily.items()
    ]
    obs.sort()
    groups: dict = {}
    for rnk, (_, _, et) in enumerate(obs, start=1):
        n, r = groups.setdefault(et, [0, 0])
        groups[et][0] += 1
        groups[et][1] += rnk
    n_obs = len(obs)
    h = Fraction(12) * sum(
        Fraction(rj * rj, nj) for nj, rj in groups.values()
    ) / Fraction(n_obs * (n_obs + 1)) - Fraction(3 * (n_obs + 1))
    micro = (2 * h.numerator * 10**6 + h.denominator) // (
        2 * h.denominator
    )
    r = stats_kruskal_wallis_daily(spark, SF_DIR).collect()[0]
    assert (r["n_obs"], r["n_groups"]) == (n_obs, len(groups))
    assert r["h_r6"] == float(micro) / 1e6
    assert h > 0, "fixture H must be nonzero"


def _events_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, epoch_us(ts), CAST(ts AS DATE), user_id, "
        f"event_type, value FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_ohlc_candles_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.temporal import ts_ohlc_candles

    days: dict = {}
    for eid, us, dt, _, _, v in _events_rows():
        days.setdefault(dt, []).append(
            (us, eid, math.floor(v * 100 + 0.5))
        )
    got = {r["dt"]: r for r in ts_ohlc_candles(spark, SF_DIR).collect()}
    assert set(got) == set(days)
    for dt, evs in days.items():
        evs.sort()
        cents = [c for _, _, c in evs]
        r = got[dt]
        assert (r["n_events"], r["open_cents"], r["high_cents"],
                r["low_cents"], r["close_cents"]) == (
            len(evs), evs[0][2], max(cents), min(cents), evs[-1][2])


def test_bollinger_breakout_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.temporal import (
        BOLL_K,
        BOLL_W,
        ev_bollinger_breakout,
    )

    daily: dict = {}
    for _, _, dt, _, _, v in _events_rows():
        daily[dt] = daily.get(dt, 0) + math.floor(v * 100 + 0.5)
    days = sorted(daily)
    got = {r["dt"]: r for r in
           ev_bollinger_breakout(spark, SF_DIR).collect()}
    assert set(got) == set(days[BOLL_W:])
    n_break = 0
    for i in range(BOLL_W, len(days)):
        window = [daily[d] for d in days[i - BOLL_W:i]]
        x, s, q = daily[days[i]], sum(window), sum(c * c for c in window)
        dev = x * BOLL_W - s
        hot = dev * dev > BOLL_K * BOLL_K * (BOLL_W * q - s * s)
        want = (1 if dev > 0 else -1) if hot and dev != 0 else 0
        r = got[days[i]]
        assert (r["cents"], r["trail_sum"], r["breakout"]) == (x, s, want)
        n_break += want != 0
    # the identity churn(w) = active(w-1) - retained(w) is exercised in
    # the lifecycle test; here just pin that the series isn't trivial
    assert len(got) == len(days) - BOLL_W


def test_lifecycle_accounting_matches_python_brute(spark):
    import datetime

    from spark_dba_spark.operators.temporal import ev_lifecycle_accounting

    uw: set = set()
    for _, _, dt, uid, _, _ in _events_rows():
        wk = dt - datetime.timedelta(days=dt.weekday())
        uw.add((uid, wk))
    weeks = sorted({w for _, w in uw})
    per_user: dict = {}
    for uid, wk in uw:
        per_user.setdefault(uid, set()).add(wk)
    got = {r["wk"]: r for r in
           ev_lifecycle_accounting(spark, SF_DIR).collect()}
    assert set(got) == set(weeks)
    for wk in weeks:
        new = ret = res = 0
        for uid, wks in per_user.items():
            if wk not in wks:
                continue
            prior = [w for w in wks if w < wk]
            if not prior:
                new += 1
            elif wk - datetime.timedelta(days=7) in wks:
                ret += 1
            else:
                res += 1
        churned = sum(
            1 for uid, wks in per_user.items()
            if wk - datetime.timedelta(days=7) in wks and wk not in wks
        )
        r = got[wk]
        assert (r["n_active"], r["n_new"], r["n_retained"],
                r["n_resurrected"], r["n_churned_in"]) == (
            new + ret + res, new, ret, res, churned)
        # growth-accounting identity
        prev_active = sum(
            1 for wks in per_user.values()
            if wk - datetime.timedelta(days=7) in wks
        )
        assert prev_active == r["n_retained"] + r["n_churned_in"]


def test_pareto_cumshare_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.temporal import orders_pareto_cumshare

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust: dict = {}
    for ck, tp in rows:
        per_cust[ck] = per_cust.get(ck, 0) + math.floor(tp * 100 + 0.5)
    ranked = sorted(per_cust.items(), key=lambda kv: (-kv[1], kv[0]))
    n, total = len(ranked), sum(per_cust.values())
    dec: dict = {}
    for i, (_, cents) in enumerate(ranked):
        d = (i * 10) // n + 1
        cnt, s = dec.setdefault(d, [0, 0])
        dec[d][0] += 1
        dec[d][1] += cents
    got = {r["decile"]: r for r in
           orders_pareto_cumshare(spark, SF_DIR).collect()}
    assert set(got) == set(dec)
    cum = 0
    for d in sorted(dec):
        cnt, s = dec[d]
        cum += s
        r = got[d]
        assert (r["n_customers"], r["decile_cents"], r["cum_cents"]) == (
            cnt, s, cum)
        assert r["cum_share_r6"] == _r6(cum, total)
    assert got[1]["decile_cents"] > got[10]["decile_cents"], (
        "top decile must out-earn the bottom")


def test_session_percentiles_matches_python_brute(spark):
    from spark_dba_spark.operators.temporal import (
        SESSION_GAP_US,
        SESSION_PCTS,
        ev_session_percentiles,
    )

    per_user: dict = {}
    for eid, us, _, uid, _, _ in _events_rows():
        per_user.setdefault(uid, []).append((us, eid))
    durs = []
    for uid, evs in per_user.items():
        evs.sort()
        seq, start, last = 0, evs[0][0], evs[0][0]
        for us, _ in evs[1:]:
            if us - last > SESSION_GAP_US:
                durs.append((last - start, uid, seq))
                seq += 1
                start = us
            last = us
        durs.append((last - start, uid, seq))
    durs.sort()
    n = len(durs)
    got = {r["pct"]: r for r in
           ev_session_percentiles(spark, SF_DIR).collect()}
    assert set(got) == set(SESSION_PCTS)
    for p in SESSION_PCTS:
        idx = (p * n + 99) // 100
        r = got[p]
        assert r["n_sessions"] == n
        assert r["dur_us"] == durs[idx - 1][0]
    assert got[99]["dur_us"] >= got[50]["dur_us"]


def test_topk_with_ties_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.relational import window_topk_with_ties

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT c_nationkey, c_custkey, c_acctbal FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()
    con.close()

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    by_nation: dict = {}
    for nk, ck, bal in rows:
        band = trunc_div(math.floor(bal * 100 + 0.5), 100000)
        by_nation.setdefault(nk, []).append((band, ck))
    expect = set()
    saw_tie = False
    for nk, vals in by_nation.items():
        bands = sorted({b for b, _ in vals}, reverse=True)
        rank_of = {}
        seen = 0
        for b in bands:
            rank_of[b] = seen + 1
            seen += sum(1 for x, _ in vals if x == b)
        for b, ck in vals:
            if rank_of[b] <= 3:
                expect.add((nk, rank_of[b], b, ck))
        top = [1 for x, _ in vals if rank_of[x] == 1]
        saw_tie = saw_tie or len(top) > 1
    got = {
        (r["c_nationkey"], r["rnk"], r["bal_band"], r["c_custkey"])
        for r in window_topk_with_ties(spark, SF_DIR).collect()
    }
    assert got == expect
    assert saw_tie, "fixture must exercise at least one tie"


def _media_type(doc_id):
    return ("image", "audio", "video")[doc_id % 3]


def test_payload_byte_histogram_matches_python_brute(spark):
    from spark_dba_spark.operators.multimodal import (
        mm_payload_byte_histogram,
    )

    agg: dict = {}
    totals: dict = {}
    for doc_id, text, _ in _docs_rows():
        mt = _media_type(doc_id)
        for b in text.encode("utf-8"):
            agg[(mt, b // 16)] = agg.get((mt, b // 16), 0) + 1
            totals[mt] = totals.get(mt, 0) + 1
    got = {(r["media_type"], r["band"]): r for r in
           mm_payload_byte_histogram(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for (mt, band), n in agg.items():
        r = got[(mt, band)]
        assert r["n_bytes"] == n
        assert r["byte_share_r6"] == _r6(n, totals[mt])


def test_payload_rle_matches_python_brute(spark):
    from spark_dba_spark.operators.multimodal import (
        mm_payload_rle_compress,
    )

    got = {r["doc_id"]: r for r in
           mm_payload_rle_compress(spark, SF_DIR).collect()}
    rows = _docs_rows()
    assert set(got) == {d for d, _, _ in rows}
    for doc_id, text, _ in rows:
        bs = text.encode("utf-8")
        runs = 1 + sum(
            1 for i in range(1, len(bs)) if bs[i] != bs[i - 1]
        )
        r = got[doc_id]
        assert (r["media_type"], r["n_bytes"], r["n_runs"]) == (
            _media_type(doc_id), len(bs), runs)
        assert r["rle_ratio_r6"] == _r6(2 * runs, len(bs))


def test_chunk_manifest_matches_python_brute(spark):
    from spark_dba_spark.operators.multimodal import (
        CHUNK_BYTES,
        mm_chunk_manifest,
    )

    got: dict = {}
    for r in mm_chunk_manifest(spark, SF_DIR).collect():
        got[(r["doc_id"], r["chunk_idx"])] = r
    rows = _docs_rows()
    expect_keys = set()
    for doc_id, text, _ in rows:
        bs = text.encode("utf-8")
        n_chunks = (len(bs) - 1) // CHUNK_BYTES + 1
        for ci in range(n_chunks):
            expect_keys.add((doc_id, ci))
            # chunk_md5 = md5 of the HEX encoding of the BYTE range
            # (ADVICE r10: byte-grid slicing, correct on non-ASCII too)
            chunk = bs[ci * CHUNK_BYTES:(ci + 1) * CHUNK_BYTES]
            r = got[(doc_id, ci)]
            assert r["media_type"] == _media_type(doc_id)
            assert r["offset"] == ci * CHUNK_BYTES
            assert r["nbytes"] == min(
                CHUNK_BYTES, len(bs) - ci * CHUNK_BYTES)
            assert r["chunk_md5"] == hashlib.md5(
                chunk.hex().upper().encode("ascii")).hexdigest()
    assert set(got) == expect_keys
    assert any(ci > 0 for _, ci in expect_keys), (
        "fixture must exercise multi-chunk assets")


def test_multiprobe_recall_floor_clustered(spark, tmp_path):
    """Committed multiprobe defaults must clear recall@10 >= 0.9 on the
    clustered (realistic) fixture — the same gate the single-probe LSH
    and IVF defaults carry."""
    import sys

    sys.path.insert(0, "tools")
    from recall_report import pairs, write_clustered_fixture

    from spark_dba_spark.operators import similarity as S

    cdir = write_clustered_fixture(str(tmp_path))
    brute = pairs(S.sim_cosine_topk(spark, cdir))
    got = pairs(S.sim_lsh_multiprobe(spark, cdir))
    assert len(brute & got) / len(brute) >= 0.9


def test_q21_adapted_matches_python_brute(spark):
    from spark_dba_spark.operators.relational import (
        q21_waiting_supplier_adapted,
    )

    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_orderkey, l_suppkey, l_shipdate FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    fin = {k for (k,) in con.execute(
        f"SELECT o_orderkey FROM read_parquet('{SF_DIR}/orders.parquet') "
        f"WHERE o_orderstatus = 'F'").fetchall()}
    snames = dict(con.execute(
        f"SELECT s_suppkey, s_name FROM "
        f"read_parquet('{SF_DIR}/supplier.parquet')").fetchall())
    con.close()
    per_order: dict = {}
    for ok, sk, sd in li:
        per_order.setdefault(ok, []).append((sk, sd))
    from collections import Counter

    numwait: Counter = Counter()
    for ok, lines in per_order.items():
        if ok not in fin:
            continue
        supps = {sk for sk, _ in lines}
        if len(supps) < 2:
            continue
        mx = max(sd for _, sd in lines)
        latest = {sk for sk, sd in lines if sd == mx}
        if len(latest) == 1:
            numwait[snames[next(iter(latest))]] += 1
    expect = sorted(
        numwait.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    got = [(r["s_name"], r["numwait"]) for r in
           q21_waiting_supplier_adapted(spark, SF_DIR).collect()]
    assert got == expect
    assert len(got) == min(20, len(numwait))
    assert got, "fixture must produce at least one waiting supplier"


def test_q22_adapted_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.relational import (
        q22_dormant_value_adapted,
    )

    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')").fetchall()
    recent = {k for (k,) in con.execute(
        f"SELECT DISTINCT o_custkey FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') "
        f"WHERE o_orderdate >= TIMESTAMP '2000-01-01'").fetchall()}
    nnames = dict(con.execute(
        f"SELECT n_nationkey, n_name FROM "
        f"read_parquet('{SF_DIR}/nation.parquet')").fetchall())
    con.close()
    cents = {ck: math.floor(b * 100 + 0.5) for ck, _, b in cust}
    pos = [c for c in cents.values() if c > 0]
    tot, n = sum(pos), len(pos)
    agg: dict = {}
    for ck, nk, _ in cust:
        if cents[ck] * n > tot and ck not in recent:
            cnt, s = agg.setdefault(nnames[nk], [0, 0])
            agg[nnames[nk]][0] += 1
            agg[nnames[nk]][1] += cents[ck]
    got = {r["n_name"]: (r["numcust"], r["totacctbal_cents"])
           for r in q22_dormant_value_adapted(spark, SF_DIR).collect()}
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert got, "fixture must select at least one dormant account"


def test_vocab_coverage_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.text import (
        COVERAGE_KS,
        text_vocab_coverage_curve,
    )

    wc: Counter = Counter()
    for _, text, _ in _docs_rows():
        for w in text.split(" "):
            if w:
                wc[w] += 1
    ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(wc.values())
    got = {r["k"]: r for r in
           text_vocab_coverage_curve(spark, SF_DIR).collect()}
    expect_ks = [k for k in COVERAGE_KS if k <= len(ranked)]
    assert sorted(got) == expect_ks
    for k in expect_ks:
        cov = sum(c for _, c in ranked[:k])
        r = got[k]
        assert (r["covered_occurrences"], r["total_occurrences"]) == (
            cov, total)
        assert r["coverage_r6"] == _r6(cov, total)
    covs = [got[k]["covered_occurrences"] for k in expect_ks]
    assert covs == sorted(covs), "coverage must be monotone in k"


def test_shingle_df_profile_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.dedup import (
        MAX_DF,
        NGRAM,
        dedup_shingle_df_profile,
    )

    df: Counter = Counter()
    for doc_id, text, _ in _docs_rows():
        ws = text.split(" ")
        if len(ws) >= NGRAM:
            sh = {" ".join(ws[i:i + NGRAM])
                  for i in range(len(ws) - NGRAM + 1)}
        else:
            sh = {text}
        for s in sh:
            df[s] += 1
    bands: dict = {}
    total_postings = sum(df.values())
    for d in df.values():
        b = d.bit_length()
        n, p, pr = bands.setdefault(b, [0, 0, 0])
        bands[b][0] += 1
        bands[b][1] += d
        bands[b][2] += 1 if d > MAX_DF else 0
    got = {r["band"]: r for r in
           dedup_shingle_df_profile(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for b, (n, p, pr) in bands.items():
        r = got[b]
        assert (r["n_shingles"], r["n_postings"], r["n_pruned"]) == (
            n, p, pr)
        assert r["posting_share_r6"] == _r6(p, total_postings)


def test_cluster_size_histogram_matches_python_brute(spark):
    from spark_dba_spark.operators.dedup import (
        dedup_cluster_size_histogram,
    )

    edges, adj = _neardup_graph_brute(spark)
    all_docs = {d for d, _, _ in _docs_rows()}
    seen: set = set()
    comp_sizes = []
    for start in adj:
        if start in seen:
            continue
        stack, comp = [start], set()
        while stack:
            n = stack.pop()
            if n in comp:
                continue
            comp.add(n)
            stack.extend(adj[n] - comp)
        seen |= comp
        comp_sizes.append(len(comp))
    comp_sizes.extend([1] * len(all_docs - set(adj)))
    bands: dict = {}
    for sz in comp_sizes:
        b = sz.bit_length()
        e = bands.setdefault(b, [0, 0, sz, sz])
        bands[b][0] += 1
        bands[b][1] += sz
        bands[b][2] = min(bands[b][2], sz)
        bands[b][3] = max(bands[b][3], sz)
    got = {r["band"]: r for r in
           dedup_cluster_size_histogram(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for b, (nc, nd, lo, hi) in bands.items():
        r = got[b]
        assert (r["n_clusters"], r["n_docs"], r["min_size"],
                r["max_size"]) == (nc, nd, lo, hi)
        assert r["doc_share_r6"] == _r6(nd, len(all_docs))
    assert sum(v[1] for v in bands.values()) == len(all_docs)


def test_rfm_migration_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.temporal import (
        RFM_SPLIT,
        orders_rfm_migration,
    )

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, o_totalprice, "
        f"o_orderdate < TIMESTAMP '{RFM_SPLIT}' FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')").fetchall()
    custs = [k for (k,) in con.execute(
        f"SELECT c_custkey FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')").fetchall()]
    con.close()

    def seg(half):
        per: dict = {}
        for ck, tp, is_h1 in orders:
            if is_h1 == half:
                per[ck] = per.get(ck, 0) + math.floor(tp * 100 + 0.5)
        tot, n = sum(per.values()), len(per)
        return {ck: ("hi" if c * n > tot else "lo")
                for ck, c in per.items()}

    s1, s2 = seg(True), seg(False)
    mat: dict = {}
    for ck in custs:
        key = (s1.get(ck, "none"), s2.get(ck, "none"))
        mat[key] = mat.get(key, 0) + 1
    got = {(r["seg_from"], r["seg_to"]): r for r in
           orders_rfm_migration(spark, SF_DIR).collect()}
    assert {k: v["n_customers"] for k, v in got.items()} == mat
    for k, r in got.items():
        assert r["share_r6"] == _r6(mat[k], len(custs))
    assert sum(mat.values()) == len(custs)


def test_hour_profile_matches_python_brute(spark):
    from spark_dba_spark.operators.temporal import ev_hour_of_day_profile

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')").fetchall()
    con.close()
    agg: dict = {}
    tot: dict = {}
    for et, h in rows:
        agg[(et, h)] = agg.get((et, h), 0) + 1
        tot[et] = tot.get(et, 0) + 1
    got = {(r["event_type"], r["hour"]): r for r in
           ev_hour_of_day_profile(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for (et, h), n in agg.items():
        r = got[(et, h)]
        assert r["n"] == n
        assert r["share_r6"] == _r6(n, tot[et])


def test_doc_family_parity_on_synthetic_corpus(spark, tmp_path):
    """Oracle↔builder parity on NON-FIXTURE data (the r9 kmeans-family
    precedent): a seeded synthetic documents table with DELIBERATE
    structure the fixture only has by accident — a 10-doc shared
    15-token span, an 8-doc shared opening block, two near-dup clusters
    (tail-edit copies), train docs contaminated with eval spans, and
    short (<SPAN_W tokens) docs — run through the full check_oracle
    comparator for the r10 document-family operators. Guards against
    fixture-shape overfit in either side of each pair."""
    import random
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(40)]

    def words(n):
        return [rng.choice(vocab) for _ in range(n)]

    texts = []
    shared_span = words(15)
    base_a = words(25)
    base_b = words(30)
    head = ["open", "block"]
    for i in range(80):
        if i % 10 == 0:
            # eval slice: half carry spans that also land in train docs
            t = words(8) + (shared_span if i % 20 == 0 else words(14))
        elif i < 12:
            t = words(5) + shared_span + words(rng.randint(3, 10))
        elif i < 20:
            t = head + words(rng.randint(12, 20))
        elif i < 26:
            t = base_a + [rng.choice(vocab)]  # near-dup cluster A
        elif i < 29:
            t = base_b + [rng.choice(vocab)]  # near-dup cluster B
        elif i < 34:
            t = words(rng.randint(3, 9))  # short docs: 0-window path
        else:
            t = words(rng.randint(15, 60))
        texts.append(" ".join(t))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(80), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 80),
            "source": pa.array([f"s{i % 5}" for i in range(80)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    specs = registry.all_specs()
    for name in (
        "dedup_longest_dup_span",
        "text_boilerplate_heads",
        "doc_span_decontamination",
        "dedup_shingle_df_profile",
        "dedup_cluster_size_histogram",
        "graph_kcore_peel",
        "graph_label_propagation",
        "graph_global_transitivity",
        "graph_degree_histogram",
        "text_bpe_merge_sequence",
        "text_vocab_coverage_curve",
        "text_char_class_profile",
        "text_consonant_runs",
    ):
        ok, msg, _n = compare(name, spark, con, specs[name], str(tmp_path))
        assert ok, f"{name}: {msg}"
    con.close()
    # the synthetic structure must actually fire the interesting paths
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard
    from spark_dba_spark.operators.text import dedup_longest_dup_span

    spans = {r["doc_id"]: r["max_dup_span"]
             for r in dedup_longest_dup_span(spark, str(tmp_path)).collect()}
    assert max(spans.values()) >= 15, "shared span must be detected"
    assert dedup_ngram_jaccard(spark, str(tmp_path)).count() >= 10, (
        "near-dup clusters must produce edges"
    )


def test_temporal_family_parity_on_synthetic_events(spark, tmp_path):
    """Oracle↔builder parity on NON-FIXTURE events: a seeded synthetic
    stream with deliberate temporal structure the fixture lacks —
    engineered churn/resurrection (users active in disjoint week sets),
    a 40x value-spike day (a guaranteed Bollinger breakout), heavy
    same-microsecond timestamp ties (endpoint-order stress), and a
    skewed diurnal profile — through the full oracle comparator for the
    r10 temporal operators."""
    import datetime
    import random
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry

    rng = random.Random(73)
    base = datetime.datetime(2024, 3, 4)  # a Monday
    rows = []
    eid = 0
    types = ["click", "view", "purchase", "error", "signup"]
    for day in range(28):
        spike = 40.0 if day == 20 else 1.0
        for _ in range(120):
            uid = rng.randint(0, 39)
            # engineered lifecycle: users 30-39 only in weeks 0 and 3
            # (churn then resurrect); users 20-29 only weeks 1-2
            wk = day // 7
            if 30 <= uid <= 39 and wk in (1, 2):
                uid -= 30
            if 20 <= uid <= 29 and wk in (0, 3):
                uid -= 20
            # skewed diurnal shape + same-microsecond tie pockets
            hour = rng.choice([9, 9, 9, 13, 13, 20, rng.randint(0, 23)])
            us = rng.randint(0, 59) if rng.random() < 0.3 else (
                rng.randint(0, 59_999_999)
            )
            ts = base + datetime.timedelta(
                days=day, hours=hour, minutes=rng.randint(0, 59),
                microseconds=us,
            )
            rows.append(
                (eid, ts, uid, rng.choice(types),
                 round(rng.uniform(0, 200) * spike, 3), "{}")
            )
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    specs = registry.all_specs()
    for name in (
        "ts_ohlc_candles",
        "ev_bollinger_breakout",
        "ev_lifecycle_accounting",
        "ev_session_percentiles",
        "stats_kruskal_wallis_daily",
        "ev_hour_of_day_profile",
    ):
        ok, msg, _n = compare(name, spark, con, specs[name], str(tmp_path))
        assert ok, f"{name}: {msg}"
    con.close()
    # the engineered structure must actually fire the interesting paths
    from spark_dba_spark.operators.temporal import (
        ev_bollinger_breakout,
        ev_lifecycle_accounting,
    )

    breaks = [r["breakout"] for r in
              ev_bollinger_breakout(spark, str(tmp_path)).collect()]
    assert 1 in breaks, "the spike day must register an up-breakout"
    life = ev_lifecycle_accounting(spark, str(tmp_path)).collect()
    assert any(r["n_resurrected"] > 0 for r in life), (
        "engineered resurrection must appear"
    )
    assert any(r["n_churned_in"] > 0 for r in life), (
        "engineered churn must appear"
    )
