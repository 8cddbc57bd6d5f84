"""Brute-force Python twins + synthetic-structure parity tests for the
round-12 curation operators (VERDICT r11 #2: semantic dedup, bigram-LM
surprisal, Gopher repetition gates, paragraph-grain cleaned corpus,
leakage-checked eval split, and the r12 continuation families)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import numpy as np

from conftest import SF_DIR


def _r6(num: int, den: int) -> float:
    return float((num * 2_000_000 + den) // (2 * den)) / 1e6


def _docs_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def _emb_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    return rows


def _write_docs(tmp_path, texts, langs=None, sources=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs or ["en"] * n),
            "source": pa.array(sources or [f"s{i % 3}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def _write_embeddings(tmp_path, vecs, labels=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(vecs)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels or [0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")


def _md5_lane(s: str, start: int = 1, nhex: int = 13) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[start - 1:start - 1 + nhex], 16)


# ---------------------------------------------------------------------------
# dedup_semantic_kmeans
# ---------------------------------------------------------------------------

def _km_loop_brute(qv: np.ndarray, k: int, iters: int):
    """Integer Lloyd replay: trunc grid input, argmin ties to lowest cid,
    truncation-toward-zero centroid division (the _km_loop contract)."""
    cent = qv[:k].copy()
    assign = None
    for it in range(iters):
        d = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)  # np.argmin ties → lowest index
        if it == iters - 1:
            break
        new = cent.copy()
        for c in range(k):
            m = qv[assign == c]
            if len(m):
                s = m.sum(axis=0)
                new[c] = np.where(
                    s >= 0, s // len(m), -((-s) // len(m))
                )
        cent = new
    d = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return assign, d.min(axis=1)


def test_semantic_kmeans_matches_numpy_brute(spark):
    from spark_dba_spark.operators.curation import (
        SEM_TAU_Q2,
        dedup_semantic_kmeans,
    )
    from spark_dba_spark.operators.similarity import (
        KM_ITERS,
        KM_K,
        KM_QUANT,
    )

    rows = _emb_rows()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    qv = np.trunc(m * KM_QUANT).astype(np.int64)
    assign, d2c = _km_loop_brute(qv, KM_K, KM_ITERS)
    expect = {}
    for i, vid in enumerate(ids):
        peers = [
            (int(((qv[i] - qv[j]) ** 2).sum()), int(ids[j]))
            for j in range(len(ids))
            if assign[j] == assign[i] and ids[j] < vid
        ]
        nn = min(peers) if peers else None
        expect[int(vid)] = (
            int(assign[i]),
            int(d2c[i]),
            nn[1] if nn else None,
            nn[0] if nn else None,
            bool(nn and nn[0] <= SEM_TAU_Q2),
        )
    got = {
        r["vec_id"]: (
            r["cid"], r["d2c"], r["nn_vec_id"], r["nn_d2"], r["is_dropped"]
        )
        for r in dedup_semantic_kmeans(spark, SF_DIR).collect()
    }
    assert got == expect
    # structure-free fixture → semantic dedup must drop nothing
    assert not any(v[4] for v in expect.values())


def test_semantic_kmeans_drops_on_clustered_corpus(spark, tmp_path):
    """A corpus with genuine semantic duplicates (tight embedding
    clusters) must produce drops, first occurrence kept per ball."""
    from spark_dba_spark.operators.curation import dedup_semantic_kmeans
    from spark_dba_spark.operators.similarity import KM_K

    rng = np.random.RandomState(7)
    cents = rng.randn(KM_K + 4, 64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = []
    for i in range(120):
        c = cents[i % (KM_K + 4)]
        v = c + rng.randn(64) * 0.02  # near-identical within group
        vecs.append((v / np.linalg.norm(v)).astype(np.float32))
    _write_embeddings(tmp_path, vecs)
    got = dedup_semantic_kmeans(spark, str(tmp_path)).collect()
    dropped = [r for r in got if r["is_dropped"]]
    kept = {r["vec_id"] for r in got if not r["is_dropped"]}
    assert dropped, "tight clusters must trigger drops"
    for r in dropped:
        assert r["nn_vec_id"] in kept or r["nn_vec_id"] < r["vec_id"]
        assert r["nn_d2"] <= (1 << 40)
    # every group's lowest surviving id is kept (first-occurrence rule):
    # vec_ids 0..KM_K+3 are one per group and have no lower-id twin
    for r in got:
        if r["vec_id"] < KM_K + 4:
            assert not r["is_dropped"]


# ---------------------------------------------------------------------------
# text_bigram_lm_surprisal
# ---------------------------------------------------------------------------

def test_bigram_lm_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        BG_RARE_C,
        text_bigram_lm_surprisal,
    )

    rows = _docs_rows()
    cpair: Counter = Counter()
    cpre: Counter = Counter()
    doc_occ = {}
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        occ = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if not occ:
            continue
        doc_occ[doc_id] = occ
        cpair.update(occ)
        cpre.update(w for w, _ in occ)
    got = {r["doc_id"]: r
           for r in text_bigram_lm_surprisal(spark, SF_DIR).collect()}
    assert set(got) == set(doc_occ)
    for doc_id, occ in doc_occ.items():
        micros = [
            (cpair[bg] * 2_000_000 + cpre[bg[0]]) // (2 * cpre[bg[0]])
            for bg in occ
        ]
        n = len(occ)
        r = got[doc_id]
        assert r["n_bigrams"] == n
        assert r["mean_condp_r6"] == float(
            (sum(micros) * 2 + n) // (2 * n)
        ) / 1e6
        assert r["min_condp_r6"] == min(micros) / 1e6
        n_rare = sum(1 for bg in occ if cpair[bg] <= BG_RARE_C)
        assert r["rare_share_r6"] == _r6(n_rare, n)


def test_bigram_lm_separates_shuffled_text(spark, tmp_path):
    """Fluent repeated prose scores higher mean conditional probability
    than a shuffled-vocabulary doc over the same corpus counts."""
    from spark_dba_spark.operators.curation import text_bigram_lm_surprisal

    fluent = "the cat sat on the mat and the cat sat on the mat"
    texts = [fluent] * 8 + ["mat the on cat and sat the mat cat on the sat"]
    _write_docs(tmp_path, texts)
    got = {r["doc_id"]: r["mean_condp_r6"]
           for r in text_bigram_lm_surprisal(spark, str(tmp_path)).collect()}
    assert got[0] > got[8]


# ---------------------------------------------------------------------------
# text_repetition_gates
# ---------------------------------------------------------------------------

def test_repetition_gates_match_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        REP_GATE_PCT,
        REP_NS,
        text_repetition_gates,
    )

    rows = _docs_rows()
    got = {(r["doc_id"], r["n"]): r
           for r in text_repetition_gates(spark, SF_DIR).collect()}
    n_expected = 0
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        for n in REP_NS:
            if len(ws) < n:
                continue
            n_expected += 1
            grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            c = Counter(grams)
            tot = len(grams)
            dup = sum(v for v in c.values() if v >= 2)
            r = got[(doc_id, n)]
            assert r["n_occurrences"] == tot
            assert r["dup_occurrences"] == dup
            assert r["dup_share_r6"] == _r6(dup, tot)
            assert r["pass_gate"] == (dup * 100 <= tot * REP_GATE_PCT[n])
    assert len(got) == n_expected


def test_repetition_gates_fail_on_loop_output(spark, tmp_path):
    from spark_dba_spark.operators.curation import text_repetition_gates

    loop = " ".join(["lorem ipsum dolor sit"] * 10)
    clean = " ".join(f"tok{i}" for i in range(40))
    _write_docs(tmp_path, [loop, clean])
    got = {(r["doc_id"], r["n"]): r["pass_gate"]
           for r in text_repetition_gates(spark, str(tmp_path)).collect()}
    assert not got[(0, 2)] and not got[(0, 3)] and not got[(0, 4)]
    assert got[(1, 2)] and got[(1, 3)] and got[(1, 4)]


# ---------------------------------------------------------------------------
# dedup_paragraph_cleaned_corpus
# ---------------------------------------------------------------------------

def test_paragraph_cleaned_corpus_matches_pairs(spark):
    """Rebuild the cleaned corpus in Python from the (independently
    twinned) verified pair set and compare every accounting column and
    the cleaned text itself."""
    from spark_dba_spark.operators.curation import (
        dedup_paragraph_cleaned_corpus,
    )
    from spark_dba_spark.operators.dedup import PARA_W, dedup_paragraph_minhash

    pairs = dedup_paragraph_minhash(spark, SF_DIR).collect()
    removed: dict[int, set[int]] = {}
    for r in pairs:
        removed.setdefault(r["doc_b"], set()).add(r["blk_b"])
    rows = _docs_rows()
    got = {r["doc_id"]: r
           for r in dedup_paragraph_cleaned_corpus(spark, SF_DIR).collect()}
    assert set(got) == {d for d, _, _, _ in rows}
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        rb = removed.get(doc_id, set())
        kept = [w for i, w in enumerate(ws) if i // PARA_W not in rb]
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["n_blocks"] == (len(ws) + PARA_W - 1) // PARA_W
        assert r["removed_blocks"] == len(rb)
        assert r["kept_tokens"] == len(kept)
        assert r["removed_tokens"] == len(ws) - len(kept)
        assert r["clean_text"] == " ".join(kept)
    assert any(r["removed_blocks"] > 0 for r in got.values()), (
        "fixture must exercise the removal path"
    )


def test_paragraph_cleaned_corpus_cuts_shared_block(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        dedup_paragraph_cleaned_corpus,
    )
    from spark_dba_spark.operators.dedup import PARA_W

    shared = " ".join(f"shared{i}" for i in range(PARA_W))
    a = shared + " " + " ".join(f"a{i}" for i in range(PARA_W))
    b = shared + " " + " ".join(f"b{i}" for i in range(PARA_W))
    _write_docs(tmp_path, [a, b])
    got = {r["doc_id"]: r
           for r in dedup_paragraph_cleaned_corpus(
               spark, str(tmp_path)).collect()}
    assert got[0]["removed_blocks"] == 0
    assert got[0]["clean_text"] == a
    assert got[1]["removed_blocks"] == 1
    assert got[1]["removed_tokens"] == PARA_W
    assert got[1]["clean_text"] == " ".join(
        f"b{i}" for i in range(PARA_W)
    )


# ---------------------------------------------------------------------------
# text_eval_split_leakage
# ---------------------------------------------------------------------------

def test_eval_split_leakage_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        SPLIT_EVAL_PCT,
        text_eval_split_leakage,
    )
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard

    rows = _docs_rows()
    is_eval = {
        d: _md5_lane(f"split:{d}") % 100 < SPLIT_EVAL_PCT
        for d, _, _, _ in rows
    }
    src = {d: s for d, _, _, s in rows}
    edges = [(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    leak_pairs: Counter = Counter()
    leaked_docs: dict[str, set] = {}
    for a, b in edges:
        if is_eval[a] == is_eval[b]:
            continue
        ev = a if is_eval[a] else b
        leak_pairs[src[ev]] += 1
        leaked_docs.setdefault(src[ev], set()).add(ev)
    got = {r["source"]: r
           for r in text_eval_split_leakage(spark, SF_DIR).collect()}
    assert set(got) == set(src.values())
    for s in got:
        docs_s = [d for d in src if src[d] == s]
        n_eval = sum(1 for d in docs_s if is_eval[d])
        r = got[s]
        assert r["n_docs"] == len(docs_s)
        assert r["n_eval"] == n_eval
        assert r["eval_share_r6"] == _r6(n_eval, len(docs_s))
        assert r["n_leak_pairs"] == leak_pairs.get(s, 0)
        assert r["n_leaked_eval_docs"] == len(leaked_docs.get(s, set()))
    assert sum(r["n_eval"] for r in got.values()) > 0


def test_eval_split_leakage_flags_planted_twin(spark, tmp_path):
    """Plant a train/eval near-dup pair and assert it is counted."""
    from spark_dba_spark.operators.curation import (
        SPLIT_EVAL_PCT,
        text_eval_split_leakage,
    )

    base = " ".join(f"w{i}" for i in range(30))
    # find one eval doc_id and one train doc_id under the salted lane
    ids = list(range(40))
    evals = [d for d in ids if _md5_lane(f"split:{d}") % 100 < SPLIT_EVAL_PCT]
    trains = [d for d in ids if d not in evals]
    assert evals and trains
    texts = [f"unique{d} " + " ".join(f"f{d}x{i}" for i in range(20))
             for d in ids]
    texts[evals[0]] = base
    texts[trains[0]] = base  # identical → jaccard 1 → dup edge
    _write_docs(tmp_path, texts, sources=["s0"] * len(ids))
    got = {r["source"]: r
           for r in text_eval_split_leakage(spark, str(tmp_path)).collect()}
    assert got["s0"]["n_leak_pairs"] >= 1
    assert got["s0"]["n_leaked_eval_docs"] >= 1


# ---------------------------------------------------------------------------
# text_cooccur_lift_topk
# ---------------------------------------------------------------------------

def test_cooccur_lift_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        LIFT_HEAD_TERMS,
        LIFT_TOP_PAIRS,
        text_cooccur_lift_topk,
    )

    rows = _docs_rows()
    n_docs = len(rows)
    pres = [(d, set(t.split(" "))) for d, t, _, _ in rows]
    df: Counter = Counter()
    for _, s in pres:
        df.update(s)
    heads = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[
        :LIFT_HEAD_TERMS]
    hset = {w for w, _ in heads}
    hdf = dict(heads)
    n_ab: Counter = Counter()
    for _, s in pres:
        hs = sorted(s & hset)
        for i, a in enumerate(hs):
            for b in hs[i + 1:]:
                n_ab[(a, b)] += 1
    scored = [
        (
            (n_docs * c * 2_000_000 + hdf[a] * hdf[b])
            // (2 * hdf[a] * hdf[b]),
            a, b, c,
        )
        for (a, b), c in n_ab.items()
    ]
    top = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[:LIFT_TOP_PAIRS]
    expect = {
        (a, b): (c, hdf[a], hdf[b], m / 1e6) for m, a, b, c in top
    }
    got = {
        (r["w_a"], r["w_b"]): (
            r["n_ab"], r["df_a"], r["df_b"], r["lift_r6"]
        )
        for r in text_cooccur_lift_topk(spark, SF_DIR).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# text_positional_drift
# ---------------------------------------------------------------------------

def test_positional_drift_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        DRIFT_TOP_TERMS,
        text_positional_drift,
    )

    rows = _docs_rows()
    f: Counter = Counter()
    b: Counter = Counter()
    for _, text, _, _ in rows:
        ws = text.split(" ")
        n = len(ws)
        for i, w in enumerate(ws, start=1):
            if i <= n // 3:
                f[w] += 1
            if i > n - n // 3:
                b[w] += 1
    tf, tb = sum(f.values()), sum(b.values())
    terms = sorted(
        set(f) | set(b),
        key=lambda w: (-(f[w] + b[w]), w),
    )[:DRIFT_TOP_TERMS]
    got = {r["term"]: r
           for r in text_positional_drift(spark, SF_DIR).collect()}
    assert set(got) == set(terms)
    for w in terms:
        r = got[w]
        assert r["n_front"] == f[w]
        assert r["n_back"] == b[w]
        assert r["front_share_r6"] == _r6(f[w], tf)
        assert r["back_share_r6"] == _r6(b[w], tb)
        assert r["drift_micro"] == (
            (f[w] * 2_000_000 + tf) // (2 * tf)
            - (b[w] * 2_000_000 + tb) // (2 * tb)
        )


# ---------------------------------------------------------------------------
# text_head_tail_selfsim
# ---------------------------------------------------------------------------

def test_head_tail_selfsim_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import text_head_tail_selfsim

    rows = _docs_rows()
    got = {r["doc_id"]: r
           for r in text_head_tail_selfsim(spark, SF_DIR).collect()}
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        if len(ws) < 2:
            assert doc_id not in got
            continue
        hv = list(dict.fromkeys(ws[: len(ws) // 2]))
        tv = list(dict.fromkeys(ws[len(ws) // 2:]))
        inter = len(set(hv) & set(tv))
        uni = len(set(hv) | set(tv))
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["head_vocab"] == len(hv)
        assert r["tail_vocab"] == len(tv)
        assert r["shared_vocab"] == inter
        assert r["jaccard"] == inter / uni


def test_head_tail_selfsim_orders_listy_over_prose(spark, tmp_path):
    from spark_dba_spark.operators.curation import text_head_tail_selfsim

    listy = " ".join(["alpha beta gamma delta"] * 6)
    prose = " ".join(f"word{i}" for i in range(24))
    _write_docs(tmp_path, [listy, prose])
    got = {r["doc_id"]: r["jaccard"]
           for r in text_head_tail_selfsim(spark, str(tmp_path)).collect()}
    assert got[0] == 1.0 and got[1] == 0.0


# ---------------------------------------------------------------------------
# text_char_bigram_topk
# ---------------------------------------------------------------------------

def test_char_bigram_topk_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        CHAR_BG_TOP,
        text_char_bigram_topk,
    )

    rows = _docs_rows()
    cnt: dict[str, Counter] = {}
    for _, text, lang, _ in rows:
        s = text.replace(" ", "")
        if len(s) < 2:
            continue
        cnt.setdefault(lang, Counter()).update(
            s[i:i + 2] for i in range(len(s) - 1)
        )
    got = {(r["lang"], r["rank"]): r
           for r in text_char_bigram_topk(spark, SF_DIR).collect()}
    for lang, c in cnt.items():
        tot = sum(c.values())
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:CHAR_BG_TOP]
        for rank, (bg, n) in enumerate(top, 1):
            r = got[(lang, rank)]
            assert (r["bigram"], r["n_occurrences"]) == (bg, n)
            assert r["share_r6"] == _r6(n, tot)
    assert len(got) == sum(
        min(CHAR_BG_TOP, len(c)) for c in cnt.values()
    )


# ---------------------------------------------------------------------------
# events family (batch C)
# ---------------------------------------------------------------------------

def _events_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, epoch_us(ts), user_id, event_type, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def _cents(v: float) -> int:
    import math

    return int(math.floor(v * 100 + 0.5))


def test_cusum_extrema_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_value_cusum_extrema

    rows = _events_rows()
    per_user: dict = {}
    for eid, us, uid, _, v in rows:
        per_user.setdefault(uid, []).append((us, eid, _cents(v)))
    got = {r["user_id"]: r
           for r in ev_value_cusum_extrema(spark, SF_DIR).collect()}
    assert set(got) == set(per_user)
    for uid, evs in per_user.items():
        evs.sort()
        n = len(evs)
        tot = sum(c for _, _, c in evs)
        s, smax, smin = 0, None, None
        for _, _, c in evs:
            s += n * c - tot
            smax = s if smax is None else max(smax, s)
            smin = s if smin is None else min(smin, s)
        r = got[uid]
        assert (r["n_events"], r["total_cents"]) == (n, tot)
        assert (r["cusum_max"], r["cusum_min"]) == (smax, smin)
        assert r["cusum_range"] == smax - smin


def test_dow_hour_heatmap_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_dow_hour_heatmap

    rows = _events_rows()
    cells: dict = {}
    for _, us, _, _, v in rows:
        dow = (us // 86_400_000_000 + 4) % 7
        hour = (us // 3_600_000_000) % 24
        n, c = cells.get((dow, hour), (0, 0))
        cells[(dow, hour)] = (n + 1, c + _cents(v))
    tot = sum(n for n, _ in cells.values())
    got = {(r["dow"], r["hour"]): r
           for r in ev_dow_hour_heatmap(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for k, (n, c) in cells.items():
        r = got[k]
        assert (r["n_events"], r["value_cents"]) == (n, c)
        assert r["event_share_r6"] == _r6(n, tot)


def test_type_affinity_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        EV_AFFINITY_FACTOR,
        ev_type_affinity_skew,
    )

    rows = _events_rows()
    ut: Counter = Counter()
    for _, _, uid, et, _ in rows:
        ut[(uid, et)] += 1
    utot: Counter = Counter()
    ttot: Counter = Counter()
    for (uid, et), c in ut.items():
        utot[uid] += c
        ttot[et] += c
    n = len(rows)
    got = {r["event_type"]: r
           for r in ev_type_affinity_skew(spark, SF_DIR).collect()}
    assert set(got) == set(ttot)
    for et in ttot:
        users = [uid for (uid, e) in ut if e == et]
        over = sum(
            1 for uid in users
            if ut[(uid, et)] * n >= EV_AFFINITY_FACTOR * ttot[et] * utot[uid]
        )
        r = got[et]
        assert r["n_events"] == ttot[et]
        assert r["n_users"] == len(users)
        assert r["n_overindexed"] == over
        assert r["global_share_r6"] == _r6(ttot[et], n)
        assert r["overindex_user_share_r6"] == _r6(over, len(users))


def test_daily_newcomer_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_daily_newcomer_share

    rows = _events_rows()
    days = [(us // 86_400_000_000, uid) for _, us, uid, _, _ in rows]
    first = {}
    for d, uid in days:
        first[uid] = min(first.get(uid, d), d)
    agg: dict = {}
    for d, uid in days:
        n, nc, users = agg.get(d, (0, 0, set()))
        is_new = first[uid] == d
        agg[d] = (n + 1, nc + (1 if is_new else 0),
                  users | ({uid} if is_new else set()))
    got = {r["day"]: r
           for r in ev_daily_newcomer_share(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for d, (n, nc, users) in agg.items():
        r = got[d]
        assert (r["n_events"], r["n_newcomer_events"]) == (n, nc)
        assert r["n_new_users"] == len(users)
        assert r["newcomer_share_r6"] == _r6(nc, n)


def test_peak_hour_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_peak_hour_ratio

    rows = _events_rows()
    hourly: Counter = Counter()
    for _, us, _, _, _ in rows:
        hourly[(us // 86_400_000_000, (us // 3_600_000_000) % 24)] += 1
    days = sorted({d for d, _ in hourly})
    got = {r["day"]: r
           for r in ev_peak_hour_ratio(spark, SF_DIR).collect()}
    assert set(got) == set(days)
    for d in days:
        hs = {h: c for (dd, h), c in hourly.items() if dd == d}
        n = sum(hs.values())
        nah = len(hs)
        peak_h, peak_c = min(
            ((h, c) for h, c in hs.items()),
            key=lambda t: (-t[1], t[0]),
        )
        r = got[d]
        assert (r["n_events"], r["n_active_hours"]) == (n, nah)
        assert (r["peak_hour"], r["peak_count"]) == (peak_h, peak_c)
        num = peak_c * nah
        want = float((num // n) * 1_000_000
                     + ((num % n) * 2_000_000 + n) // (2 * n)) / 1e6
        assert r["peak_to_mean_r6"] == want


# ---------------------------------------------------------------------------
# orders / lineitem family (batch D)
# ---------------------------------------------------------------------------

def _orders_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey, o_totalprice, "
        f"year(o_orderdate), month(o_orderdate), day(o_orderdate), "
        f"day(last_day(o_orderdate)), o_orderdate FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_price_band_month_mix_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        orders_price_band_month_mix,
    )

    cells: Counter = Counter()
    for _, _, price, y, m, _, _, _ in _orders_rows():
        band = int(_cents(price)).bit_length()
        cells[(y * 100 + m, band)] += 1
    months: Counter = Counter()
    for (ym, _), n in cells.items():
        months[ym] += n
    got = {(r["ym"], r["price_band_log2"]): r
           for r in orders_price_band_month_mix(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for (ym, band), n in cells.items():
        r = got[(ym, band)]
        assert r["n_orders"] == n
        assert r["n_month"] == months[ym]
        assert r["band_share_r6"] == _r6(n, months[ym])


def test_repeat_customer_share_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        orders_repeat_customer_share,
    )

    rows = _orders_rows()
    by_cust: dict = {}
    for ok, ck, price, y, m, _, _, od in rows:
        by_cust.setdefault(ck, []).append((od, ok, y * 100 + m, price))
    agg: dict = {}
    for evs in by_cust.values():
        evs.sort(key=lambda t: (t[0], t[1]))
        for i, (_, _, ym, price) in enumerate(evs):
            n, nr, rev, rrev = agg.get(ym, (0, 0, 0, 0))
            c = _cents(price)
            rep = i >= 1
            agg[ym] = (n + 1, nr + rep, rev + c, rrev + (c if rep else 0))
    got = {r["ym"]: r
           for r in orders_repeat_customer_share(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for ym, (n, nr, rev, rrev) in agg.items():
        r = got[ym]
        assert (r["n_orders"], r["n_repeat"]) == (n, nr)
        assert r["repeat_share_r6"] == _r6(nr, n)
        assert (r["revenue_cents"], r["repeat_revenue_cents"]) == (rev, rrev)


def test_unit_price_outliers_match_python_brute(spark):
    import math

    from spark_dba_spark.operators.curation import (
        UNIT_OUTLIER_FACTOR,
        lineitem_unit_price_outliers,
    )

    con = duckdb.connect()
    li = con.execute(
        f"SELECT p_brand, l_orderkey, l_linenumber, l_extendedprice, "
        f"l_quantity FROM read_parquet('{SF_DIR}/lineitem.parquet') li "
        f"JOIN read_parquet('{SF_DIR}/part.parquet') p "
        f"ON li.l_partkey = p.p_partkey"
    ).fetchall()
    con.close()
    brands: dict = {}
    for b, ok, ln, ep, q in li:
        uc = int(math.floor(ep / q * 100 + 0.5))
        brands.setdefault(b, []).append((uc, ok, ln))
    got = {r["p_brand"]: r
           for r in lineitem_unit_price_outliers(spark, SF_DIR).collect()}
    assert set(got) == set(brands)
    for b, lines in brands.items():
        lines.sort()
        n = len(lines)
        med = lines[(n + 1) // 2 - 1][0]
        hi = sum(1 for uc, _, _ in lines if uc > UNIT_OUTLIER_FACTOR * med)
        lo = sum(1 for uc, _, _ in lines if UNIT_OUTLIER_FACTOR * uc < med)
        r = got[b]
        assert (r["n_lines"], r["median_unit_cents"]) == (n, med)
        assert (r["n_outliers_hi"], r["n_outliers_lo"]) == (hi, lo)
        assert r["outlier_share_r6"] == _r6(hi + lo, n)


def test_month_end_loading_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        MONTH_END_DAYS,
        orders_month_end_loading,
    )

    agg: dict = {}
    for _, _, price, y, m, dom, lastd, _ in _orders_rows():
        ym = y * 100 + m
        tail = dom > lastd - MONTH_END_DAYS
        c = _cents(price)
        n, nt, rev, tc = agg.get(ym, (0, 0, 0, 0))
        agg[ym] = (n + 1, nt + tail, rev + c, tc + (c if tail else 0))
    got = {r["ym"]: r
           for r in orders_month_end_loading(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for ym, (n, nt, rev, tc) in agg.items():
        r = got[ym]
        assert (r["n_orders"], r["n_month_end"]) == (n, nt)
        assert r["month_end_share_r6"] == _r6(nt, n)
        assert (r["revenue_cents"], r["month_end_cents"]) == (rev, tc)


# ---------------------------------------------------------------------------
# embeddings family (batch E)
# ---------------------------------------------------------------------------

def test_quantile_clip_bounds_match_numpy_brute(spark):
    from spark_dba_spark.operators.curation import emb_quantile_clip_bounds

    rows = _emb_rows()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    qv = np.trunc(m * (1 << 20)).astype(np.int64)
    n = len(ids)
    got = {r["dim"]: r
           for r in emb_quantile_clip_bounds(spark, SF_DIR).collect()}
    assert set(got) == set(range(64))
    for d in range(64):
        order = sorted(zip(qv[:, d], ids))
        p01 = order[(1 * n + 99) // 100 - 1][0]
        p99 = order[(99 * n + 99) // 100 - 1][0]
        r = got[d]
        assert r["n_vectors"] == n
        assert (r["p01_q"], r["p99_q"]) == (p01, p99)
        assert r["n_below"] == int((qv[:, d] < p01).sum())
        assert r["n_above"] == int((qv[:, d] > p99).sum())


def test_grid_cell_density_matches_numpy_brute(spark):
    from spark_dba_spark.operators.curation import (
        GRID_SIGN_DIMS,
        emb_grid_cell_density,
    )

    rows = _emb_rows()
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    cells = Counter(
        int(sum(1 << d for d in range(GRID_SIGN_DIMS) if v[d] > 0.0))
        for v in m
    )
    tot = len(m)
    got = {r["cell"]: r
           for r in emb_grid_cell_density(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for c, n in cells.items():
        assert got[c]["n_vectors"] == n
        assert got[c]["share_r6"] == _r6(n, tot)


def test_centroid_margin_bands_match_numpy_brute(spark):
    from spark_dba_spark.operators.curation import emb_centroid_margin_bands
    from spark_dba_spark.operators.similarity import (
        KM_ITERS,
        KM_K,
        KM_QUANT,
    )

    rows = _emb_rows()
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    qv = np.trunc(m * KM_QUANT).astype(np.int64)
    # final centroids via the shared brute Lloyd replay
    cent = qv[:KM_K].copy()
    for it in range(KM_ITERS - 1):
        d = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        new = cent.copy()
        for c in range(KM_K):
            mm = qv[assign == c]
            if len(mm):
                s = mm.sum(axis=0)
                new[c] = np.where(s >= 0, s // len(mm), -((-s) // len(mm)))
        cent = new
    d = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    d.sort(axis=1)
    margins = (d[:, 1] - d[:, 0]).astype(np.int64)
    bands: dict = {}
    for mg in margins:
        b = int(mg).bit_length() if mg > 0 else 1  # bin(0) = '0', len 1
        lo, hi, n = bands.get(b, (mg, mg, 0))
        bands[b] = (min(lo, mg), max(hi, mg), n + 1)
    got = {r["margin_band_log2"]: r
           for r in emb_centroid_margin_bands(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for b, (lo, hi, n) in bands.items():
        r = got[b]
        assert (r["n_vectors"], r["min_margin"], r["max_margin"]) == (
            n, lo, hi)


def test_dim_sign_balance_matches_numpy_brute(spark):
    from spark_dba_spark.operators.curation import emb_dim_sign_balance

    rows = _emb_rows()
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    n = len(m)
    got = {r["dim"]: r for r in emb_dim_sign_balance(spark, SF_DIR).collect()}
    assert set(got) == set(range(64))
    for d in range(64):
        pos = int((m[:, d] > 0.0).sum())
        r = got[d]
        assert r["n_vectors"] == n
        assert r["n_pos"] == pos
        assert r["pos_share_r6"] == _r6(pos, n)
        assert r["abs_imbalance"] == abs(2 * pos - n)


# ---------------------------------------------------------------------------
# sketch / stats / multimodal family (batch F)
# ---------------------------------------------------------------------------

def test_kmv_setops_match_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        KMV_SET_HEX,
        KMV_SET_K,
        sketch_kmv_setops,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT DISTINCT o_orderpriority, o_custkey FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    sketches: dict = {}
    members: dict = {}
    for p, ck in rows:
        h = _md5_lane(f"kmvc:{ck}", 1, KMV_SET_HEX)
        sketches.setdefault(p, set()).add(h)
        members.setdefault(p, set()).add(ck)
    sk = {p: sorted(hs)[:KMV_SET_K] for p, hs in sketches.items()}
    got = {(r["p_lo"], r["p_hi"]): r
           for r in sketch_kmv_setops(spark, SF_DIR).collect()}
    prios = sorted(sk)
    expect_pairs = {(a, b) for i, a in enumerate(prios)
                    for b in prios[i + 1:]}
    assert set(got) == expect_pairs
    for (a, b) in expect_pairs:
        merged = sorted(set(sk[a]) | set(sk[b]))[:KMV_SET_K]
        k_used = len(merged)
        kth = merged[-1]
        n_match = sum(1 for h in merged if h in set(sk[a]) and h in set(sk[b]))
        if k_used < KMV_SET_K:
            union_est = k_used
        else:
            union_est = (KMV_SET_K - 1) * (1 << (4 * KMV_SET_HEX)) // kth
        r = got[(a, b)]
        assert (r["k_used"], r["union_est"], r["n_match"]) == (
            k_used, union_est, n_match)
        assert r["jaccard_est_r6"] == _r6(n_match, k_used)
        num = n_match * union_est
        want = float((num // k_used) * 1_000_000
                     + ((num % k_used) * 2_000_000 + k_used)
                     // (2 * k_used)) / 1e6
        assert r["inter_est_r6"] == want
        # estimator sanity: the union estimate is in the right decade
        true_u = len(members[a] | members[b])
        assert union_est == true_u or abs(union_est - true_u) < true_u


def test_capture_recapture_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        CRC_PIVOT,
        stats_capture_recapture,
    )

    con = duckdb.connect()
    n1, n2, n_true = con.execute(
        f"SELECT COUNT(DISTINCT CASE WHEN o_orderdate < "
        f"TIMESTAMP '{CRC_PIVOT}' THEN o_custkey END), "
        f"COUNT(DISTINCT CASE WHEN o_orderdate >= "
        f"TIMESTAMP '{CRC_PIVOT}' THEN o_custkey END), "
        f"COUNT(DISTINCT o_custkey) FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()
    con.close()
    m = n1 + n2 - n_true
    [r] = stats_capture_recapture(spark, SF_DIR).collect()
    assert (r["n1"], r["n2"], r["n_both"], r["n_true"]) == (
        n1, n2, m, n_true)

    def qr6(num, den):
        return float((num // den) * 1_000_000
                     + ((num % den) * 2_000_000 + den) // (2 * den)) / 1e6

    if m >= 1:
        assert r["lincoln_petersen_r6"] == qr6(n1 * n2, m)
    else:
        assert r["lincoln_petersen_r6"] is None
    assert r["chapman_r6"] == qr6((n1 + 1) * (n2 + 1), m + 1) - 1.0


def test_chunk_dedup_cross_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        CHUNK_TOP,
        CHUNK_W,
        mm_chunk_dedup_cross,
    )

    rows = _docs_rows()
    agg: dict = {}
    for doc_id, text, _, _ in rows:
        hx = text.encode("utf-8").hex().upper()
        nb = len(hx) // 2
        if nb < CHUNK_W:
            continue
        for i in range(nb // CHUNK_W):
            sl = hx[i * 2 * CHUNK_W:(i + 1) * 2 * CHUNK_W]
            ch = hashlib.md5(sl.encode()).hexdigest()
            occ, docs = agg.get(ch, (0, set()))
            agg[ch] = (occ + 1, docs | {doc_id})
    dup = {ch: (occ, docs) for ch, (occ, docs) in agg.items()
           if len(docs) >= 2}
    top = sorted(
        dup.items(),
        key=lambda kv: (-len(kv[1][1]), -kv[1][0], kv[0]),
    )[:CHUNK_TOP]
    expect = {
        ch: (occ, len(docs),
             len({("image" if d % 3 == 0 else
                   "audio" if d % 3 == 1 else "video") for d in docs}))
        for ch, (occ, docs) in top
    }
    got = {r["chunk_hash"]: (
        r["n_occurrences"], r["n_payloads"], r["n_media_types"])
        for r in mm_chunk_dedup_cross(spark, SF_DIR).collect()}
    assert got == expect
    assert got, "fixture must exercise the cross-payload dup path"


# ---------------------------------------------------------------------------
# continuation batch (r13 backlog)
# ---------------------------------------------------------------------------

def test_component_cohesion_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import dedup_component_cohesion
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard

    edges = [(r["doc_a"], r["doc_b"], r["jaccard"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    # union-find components with min-id labels
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {x: find(x) for x in parent}
    agg: dict = {}
    for a, b, j in edges:
        c = comp[a]
        mn, mx, sm, ne = agg.get(c, (None, None, 0, 0))
        import math

        jm = int(math.floor(j * 1_000_000 + 0.5))
        agg[c] = (
            j if mn is None else min(mn, j),
            j if mx is None else max(mx, j),
            sm + jm, ne + 1,
        )
    nodes: Counter = Counter(comp.values())
    got = {r["component_id"]: r
           for r in dedup_component_cohesion(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for c, (mn, mx, sm, ne) in agg.items():
        r = got[c]
        assert r["n_nodes"] == nodes[c]
        assert r["n_edges"] == ne
        assert (r["min_jaccard"], r["max_jaccard"]) == (mn, mx)
        assert r["mean_jaccard_r6"] == float(
            (sm * 2 + ne) // (2 * ne)) / 1e6


def test_local_bridges_match_python_brute(spark):
    from spark_dba_spark.operators.curation import graph_local_bridges
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard

    edges = [(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = {(r["doc_a"], r["doc_b"]): r
           for r in graph_local_bridges(spark, SF_DIR).collect()}
    assert set(got) == set(edges)
    for a, b in edges:
        cn = len((adj[a] & adj[b]) - {a, b})
        r = got[(a, b)]
        assert r["n_common_neighbors"] == cn
        assert r["is_local_bridge"] == (cn == 0)


def test_bucket_pair_cos_histogram_matches_numpy_brute(spark):
    import math

    from spark_dba_spark.operators.curation import (
        GRID_SIGN_DIMS,
        emb_bucket_pair_cos_histogram,
    )

    rows = _emb_rows()
    ids = [r[0] for r in rows]
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    cells: dict = {}
    for i, vid in enumerate(ids):
        c = sum(1 << d for d in range(GRID_SIGN_DIMS) if m[i][d] > 0.0)
        cells.setdefault(c, []).append(i)
    bands: dict = {}
    for c, idxs in cells.items():
        idxs = sorted(idxs, key=lambda i: ids[i])
        for x, i in enumerate(idxs):
            for j in idxs[x + 1:]:
                cos = float(
                    (m[j] @ m[i])
                    / (np.linalg.norm(m[j]) * np.linalg.norm(m[i]))
                )
                band = int(math.floor(cos * 10))
                mn, mx, n = bands.get(band, (cos, cos, 0))
                bands[band] = (min(mn, cos), max(mx, cos), n + 1)
    got = {r["cos_band_deci"]: r
           for r in emb_bucket_pair_cos_histogram(spark, SF_DIR).collect()}
    assert set(got) == set(bands)
    for band, (mn, mx, n) in bands.items():
        r = got[band]
        assert r["n_pairs"] == n
        assert r["min_cos_r4"] == round(mn, 4)
        assert r["max_cos_r4"] == round(mx, 4)


def test_payload_byte_stats_match_python_brute(spark):
    from spark_dba_spark.operators.curation import mm_payload_byte_stats

    rows = _docs_rows()
    got = {r["doc_id"]: r
           for r in mm_payload_byte_stats(spark, SF_DIR).collect()}
    for doc_id, text, _, _ in rows:
        bs = text.encode("utf-8")
        if not bs:
            assert doc_id not in got
            continue
        r = got[doc_id]
        assert r["n_bytes"] == len(bs)
        assert r["byte_sum"] == sum(bs)
        assert (r["min_byte"], r["max_byte"]) == (min(bs), max(bs))
        assert r["n_distinct_bytes"] == len(set(bs))
        assert r["mean_byte_r6"] == float(
            (sum(bs) * 2_000_000 + len(bs)) // (2 * len(bs))) / 1e6


def test_transition_gap_median_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        ev_type_transition_gap_median,
    )

    rows = _events_rows()
    per_user: dict = {}
    for eid, us, uid, et, _ in rows:
        per_user.setdefault(uid, []).append((us, eid, et))
    gaps: dict = {}
    for uid, evs in per_user.items():
        evs.sort()
        for (pus, peid, pet), (us, eid, et) in zip(evs, evs[1:]):
            gaps.setdefault((pet, et), []).append(
                ((us - pus) // 1_000_000, uid, eid))
    got = {(r["prev_type"], r["event_type"]): r
           for r in ev_type_transition_gap_median(spark, SF_DIR).collect()}
    assert set(got) == set(gaps)
    for k, gl in gaps.items():
        gl.sort()
        n = len(gl)
        med = gl[(50 * n + 99) // 100 - 1][0]
        p90 = gl[(90 * n + 99) // 100 - 1][0]
        r = got[k]
        assert r["n_transitions"] == n
        assert (r["median_gap_s"], r["p90_gap_s"]) == (med, p90)


def test_balance_activity_grid_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        customer_balance_activity_grid,
    )

    con = duckdb.connect()
    custs = con.execute(
        f"SELECT c_custkey, c_acctbal FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()
    orders = con.execute(
        f"SELECT o_custkey, COUNT(*) FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"
    ).fetchall()
    con.close()
    cnt = dict(orders)
    base = sorted(
        ((_cents(b), ck, cnt.get(ck, 0)) for ck, b in custs)
    )
    n = len(base)
    grid: Counter = Counter()
    tot: Counter = Counter()
    for i, (_, ck, c) in enumerate(base):
        # ANSI NTILE: first n % 10 tiles get the extra row
        q, rem = divmod(n, 10)
        decile = (i // (q + 1) + 1 if i < rem * (q + 1)
                  else rem + 1 + (i - rem * (q + 1)) // q)
        band = -1 if c == 0 else c.bit_length()
        grid[(decile, band)] += 1
        tot[(decile, band)] += c
    got = {(r["bal_decile"], r["activity_band"]): r
           for r in customer_balance_activity_grid(spark, SF_DIR).collect()}
    assert set(got) == set(grid)
    for k in grid:
        assert got[k]["n_customers"] == grid[k]
        assert got[k]["n_orders_total"] == tot[k]


def test_source_bigram_uniqueness_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        text_source_bigram_uniqueness,
    )

    rows = _docs_rows()
    sb: dict = {}
    for _, text, _, src in rows:
        ws = text.split(" ")
        if len(ws) < 2:
            continue
        sb.setdefault(src, set()).update(
            f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
        )
    df_cnt: Counter = Counter()
    for s, grams in sb.items():
        df_cnt.update(grams)
    got = {r["source"]: r
           for r in text_source_bigram_uniqueness(spark, SF_DIR).collect()}
    assert set(got) == set(sb)
    for s, grams in sb.items():
        uniq = sum(1 for g in grams if df_cnt[g] == 1)
        r = got[s]
        assert r["n_bigram_types"] == len(grams)
        assert r["n_unique_types"] == uniq
        assert r["unique_share_r6"] == _r6(uniq, len(grams))


def test_sign_test_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import stats_sign_test_user_value

    rows = _events_rows()
    per_user: dict = {}
    for eid, us, uid, _, v in rows:
        per_user.setdefault(uid, []).append((us, eid, _cents(v)))
    up = down = total = 0
    for uid, evs in per_user.items():
        if len(evs) < 2:
            continue
        evs.sort()
        n = len(evs)
        n1, n2 = n // 2, n - n // 2
        s1 = sum(c for _, _, c in evs[:n1])
        s2 = sum(c for _, _, c in evs[n1:])
        total += 1
        if s2 * n1 > s1 * n2:
            up += 1
        elif s2 * n1 < s1 * n2:
            down += 1
    [r] = stats_sign_test_user_value(spark, SF_DIR).collect()
    assert (r["n_users"], r["n_up"], r["n_down"]) == (total, up, down)
    assert r["n_tie"] == total - up - down
    assert r["up_share_r6"] == _r6(up, total)


def test_hourly_mad_anomalies_match_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        MAD_K,
        ev_hourly_mad_anomalies,
    )

    rows = _events_rows()
    hourly: Counter = Counter()
    for _, us, _, _, _ in rows:
        hourly[us // 3_600_000_000] += 1
    hs = sorted(hourly.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(hs)
    med = hs[(n + 1) // 2 - 1][1]
    devs = sorted(
        ((abs(c - med), hr) for hr, c in hourly.items())
    )
    mad = devs[(n + 1) // 2 - 1][0]
    expect = {
        hr: (c, abs(c - med), c > med)
        for hr, c in hourly.items()
        if abs(c - med) > MAD_K * mad
    }
    got = {r["hour_epoch"]: r
           for r in ev_hourly_mad_anomalies(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for hr, (c, dev, spike) in expect.items():
        r = got[hr]
        assert (r["n_events"], r["abs_deviation"]) == (c, dev)
        assert (r["median_hourly"], r["mad"]) == (med, mad)
        assert r["is_spike"] == spike


def test_supplier_quartile_grid_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        supplier_acctbal_quartile_grid,
    )

    con = duckdb.connect()
    sups = con.execute(
        f"SELECT s_suppkey, s_nationkey, s_acctbal FROM "
        f"read_parquet('{SF_DIR}/supplier.parquet')"
    ).fetchall()
    nations = dict(con.execute(
        f"SELECT n_nationkey, n_name FROM "
        f"read_parquet('{SF_DIR}/nation.parquet')"
    ).fetchall())
    con.close()
    base = sorted((_cents(b), sk, nk) for sk, nk, b in sups)
    n = len(base)
    grid: Counter = Counter()
    cents: Counter = Counter()
    for i, (c, sk, nk) in enumerate(base):
        q, rem = divmod(n, 4)
        quart = (i // (q + 1) + 1 if i < rem * (q + 1)
                 else rem + 1 + (i - rem * (q + 1)) // q)
        key = (nations[nk], quart)
        grid[key] += 1
        cents[key] += c
    got = {(r["n_name"], r["bal_quartile"]): r
           for r in supplier_acctbal_quartile_grid(spark, SF_DIR).collect()}
    assert set(got) == set(grid)
    for k in grid:
        assert got[k]["n_suppliers"] == grid[k]
        assert got[k]["balance_cents"] == cents[k]


# ---------------------------------------------------------------------------
# IVF-PQ refine-stage monotonicity gate (VERDICT r11 #3)
# ---------------------------------------------------------------------------

def test_ivfpq_recall_monotone_in_nprobe(spark):
    """With the per-list shortlist + exact refine, widening the search
    can only grow the candidate union, so recall@10 vs the exact
    brute ranking must be non-decreasing in nprobe (this was the
    r11 defect: ADC-only ranking measured 0.465→0.385 as nprobe grew)."""
    from spark_dba_spark.operators import similarity as S

    brute = {(r["qid"], r["vec_id"])
             for r in S.sim_cosine_topk(spark, SF_DIR).collect()}
    default = S.IVF_NPROBE
    rec = {}
    try:
        for np_ in (6, 24):
            S.IVF_NPROBE = np_
            got = {(r["qid"], r["vec_id"])
                   for r in S.sim_ivfpq_compound(spark, SF_DIR).collect()}
            rec[np_] = len(brute & got) / len(brute)
    finally:
        S.IVF_NPROBE = default
    assert rec[24] >= rec[6], rec


# ---------------------------------------------------------------------------
# continuation batch H
# ---------------------------------------------------------------------------

def test_dedup_inflation_matches_pairs(spark):
    from spark_dba_spark.operators.curation import (
        text_dedup_inflation_by_source,
    )
    from spark_dba_spark.operators.dedup import PARA_W, dedup_paragraph_minhash

    pairs = dedup_paragraph_minhash(spark, SF_DIR).collect()
    removed: set = {(r["doc_b"], r["blk_b"]) for r in pairs}
    rows = _docs_rows()
    meta = {d: (s, len(t.split(" "))) for d, t, _, s in rows}
    agg: dict = {}
    for d, blk in removed:
        s, n = meta[d]
        rb, rt = agg.get(s, (0, 0))
        agg[s] = (rb + 1, rt + min(PARA_W, n - blk * PARA_W))
    tot: dict = {}
    for d, (s, n) in meta.items():
        nd, nt = tot.get(s, (0, 0))
        tot[s] = (nd + 1, nt + n)
    got = {r["source"]: r
           for r in text_dedup_inflation_by_source(spark, SF_DIR).collect()}
    assert set(got) == set(tot)
    for s, (nd, nt) in tot.items():
        rb, rt = agg.get(s, (0, 0))
        r = got[s]
        assert (r["n_docs"], r["total_tokens"]) == (nd, nt)
        assert (r["removed_blocks"], r["removed_tokens"]) == (rb, rt)
        assert r["removed_share_r6"] == _r6(rt, nt)
    assert any(r["removed_tokens"] > 0 for r in got.values())


def test_ivf_routing_balance_matches_numpy_brute(spark):
    from spark_dba_spark.operators.curation import sim_ivf_routing_balance
    from spark_dba_spark.operators.similarity import (
        IVF_CENTROIDS,
        IVF_NPROBE,
        N_QUERIES,
    )

    rows = _emb_rows()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    cmask = ids < IVF_CENTROIDS
    cn, cids = norm[cmask], ids[cmask]
    assign = cids[np.argmax(norm @ cn.T, axis=1)]
    own = {int(ids[i]): int(assign[i]) for i in range(len(ids))}
    list_size = Counter(int(a) for a in assign)
    probing: Counter = Counter()
    self_hits: Counter = Counter()
    for qi in np.where(ids < N_QUERIES)[0]:
        qid = int(ids[qi])
        order = np.argsort(-(norm[qi] @ cn.T), kind="stable")[:IVF_NPROBE]
        for c in order:
            cid = int(cids[c])
            probing[cid] += 1
            if own[qid] == cid:
                self_hits[cid] += 1
    scanned = {
        c: list_size[c] * probing.get(c, 0) - self_hits.get(c, 0)
        for c in list_size
    }
    t = sum(scanned.values())
    got = {r["centroid"]: r
           for r in sim_ivf_routing_balance(spark, SF_DIR).collect()}
    assert set(got) == set(list_size)
    for c in list_size:
        r = got[c]
        assert r["list_size"] == list_size[c]
        assert r["n_probing_queries"] == probing.get(c, 0)
        assert r["scanned_candidates"] == scanned[c]
        assert r["scan_share_r6"] == _r6(scanned[c], t)


def test_blomqvist_beta_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.curation import stats_blomqvist_beta_brand

    con = duckdb.connect()
    li = con.execute(
        f"SELECT p_brand, l_orderkey, l_linenumber, l_quantity, "
        f"l_extendedprice FROM read_parquet('{SF_DIR}/lineitem.parquet') l "
        f"JOIN read_parquet('{SF_DIR}/part.parquet') p "
        f"ON l.l_partkey = p.p_partkey"
    ).fetchall()
    con.close()
    brands: dict = {}
    for b, ok, ln, q, ep in li:
        brands.setdefault(b, []).append(
            (int(q), int(math.floor(ep * 100 + 0.5)), ok, ln))
    got = {r["p_brand"]: r
           for r in stats_blomqvist_beta_brand(spark, SF_DIR).collect()}
    for b, lines in brands.items():
        n = len(lines)
        mq = sorted((q, ok, ln) for q, _, ok, ln in lines)[
            (n + 1) // 2 - 1][0]
        mp = sorted((p, ok, ln) for _, p, ok, ln in lines)[
            (n + 1) // 2 - 1][0]
        used = [(q, p) for q, p, _, _ in lines if q != mq and p != mp]
        conc = sum(1 for q, p in used if (q > mq) == (p > mp))
        if not used:
            assert b not in got
            continue
        r = got[b]
        assert (r["med_qty"], r["med_price"]) == (mq, mp)
        assert (r["n_used"], r["n_concordant"]) == (len(used), conc)
        assert r["n_discordant"] == len(used) - conc
        num = 2 * conc - len(used)
        want = _r6(abs(num), len(used))
        assert r["blomqvist_beta_r6"] == (want if num >= 0 else -want)


def test_band_precision_profile_consistent_with_lsh(spark):
    """Cross-op invariant: the union over bands of verified candidate
    pairs equals the dedup_minhash_lsh verified pair set, and every
    band's counts match a direct python replay of the banding."""
    from spark_dba_spark.operators.curation import (
        dedup_band_precision_profile,
    )
    from spark_dba_spark.operators.dedup import (
        MINHASH_BANDS,
        dedup_minhash_lsh,
    )

    got = {r["band"]: r
           for r in dedup_band_precision_profile(spark, SF_DIR).collect()}
    assert set(got) <= set(range(MINHASH_BANDS))
    for r in got.values():
        assert 0 <= r["n_verified_pairs"] <= r["n_candidate_pairs"]
        assert r["precision_r6"] == _r6(
            r["n_verified_pairs"], r["n_candidate_pairs"])
    # the LSH op's verified pairs must all be counted by >=1 band
    lsh_pairs = {(r["doc_a"], r["doc_b"])
                 for r in dedup_minhash_lsh(spark, SF_DIR).collect()}
    assert sum(r["n_verified_pairs"] for r in got.values()) >= len(lsh_pairs)


def test_hourly_session_load_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        SESSION_LOAD_MAX_HOURS,
        ev_hourly_session_load,
    )
    from spark_dba_spark.operators.temporal import SESSION_GAP_US

    rows = _events_rows()
    per_user: dict = {}
    for eid, us, uid, _, _ in rows:
        per_user.setdefault(uid, []).append((us, eid))
    active: Counter = Counter()
    starting: Counter = Counter()
    for uid, evs in per_user.items():
        evs.sort()
        sessions = []
        for us, _ in evs:
            if sessions and us - sessions[-1][1] <= SESSION_GAP_US:
                sessions[-1][1] = us
            else:
                sessions.append([us, us])
        for s, e in sessions:
            h1, h2 = s // 3_600_000_000, e // 3_600_000_000
            for h in range(h1, min(h2, h1 + SESSION_LOAD_MAX_HOURS - 1) + 1):
                active[h] += 1
            starting[h1] += 1
    got = {r["hour_epoch"]: r
           for r in ev_hourly_session_load(spark, SF_DIR).collect()}
    assert set(got) == set(active)
    for h in active:
        r = got[h]
        assert r["n_active_sessions"] == active[h]
        assert r["n_starting_sessions"] == starting.get(h, 0)


# ---------------------------------------------------------------------------
# Batch D (r13 backlog): Cramér V², cluster Pareto, priority transitions,
# weekend lift, CDC chunk profile
# ---------------------------------------------------------------------------


def test_cramers_v_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.curation import stats_cramers_v_assoc

    con = duckdb.connect()
    fact = con.execute(
        f"SELECT p_brand, l_returnflag FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet') l "
        f"JOIN read_parquet('{SF_DIR}/part.parquet') p "
        f"ON l.l_partkey = p.p_partkey"
    ).fetchall()
    con.close()
    obs = Counter(fact)
    rm = Counter(b for b, _ in fact)
    cm = Counter(f for _, f in fact)
    n = len(fact)
    cells = {}
    for b in rm:
        for f in cm:
            o = obs.get((b, f), 0)
            e = rm[b] * cm[f] / n
            cells[(b, f)] = int(math.floor((o - e) * (o - e) / e * 1e6))
    chi2_micros = sum(cells.values())
    den = n * min(len(rm) - 1, len(cm) - 1) * 1_000_000
    v2 = float(
        (chi2_micros // den) * 1_000_000
        + ((chi2_micros % den) * 2_000_000 + den) // (2 * den)
    ) / 1e6
    got = {(r["p_brand"], r["l_returnflag"]): r
           for r in stats_cramers_v_assoc(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for (b, f), r in got.items():
        assert r["n_obs"] == obs.get((b, f), 0)
        assert r["n_exp_r6"] == _r6(rm[b] * cm[f], n)
        assert r["chi2_part_micros"] == cells[(b, f)]
        assert r["chi2_total_micros"] == chi2_micros
        assert r["cramers_v2_r6"] == v2


def test_cluster_pareto_planted_dups(spark, tmp_path):
    """Planted exact-dup corpus: three clusters of known sizes produce
    the exact rank/removable/cumulative-share curve; the fixture corpus
    (no exact dups at sf0.001) produces an empty frame."""
    from spark_dba_spark.operators.curation import dedup_cluster_pareto

    texts = (
        ["alpha beta gamma"] * 4       # 3 tokens, removable 9
        + ["delta epsilon"] * 3        # 2 tokens, removable 4
        + ["zeta eta theta iota kappa"] * 2  # 5 tokens, removable 5
        + ["unique one", "unique two"]
    )
    _write_docs(tmp_path, texts)
    rows = dedup_cluster_pareto(spark, str(tmp_path)).collect()
    assert [r["removable_tokens"] for r in rows] == [9, 5, 4]
    assert [r["n_docs"] for r in rows] == [4, 2, 3]
    assert [r["dup_rank"] for r in rows] == [1, 2, 3]
    assert [r["cum_removable_tokens"] for r in rows] == [9, 14, 18]
    assert [r["cum_share_r6"] for r in rows] == [
        _r6(9, 18), _r6(14, 18), _r6(18, 18)]
    keep = {r["removable_tokens"]: r["keep_doc_id"] for r in rows}
    assert keep == {9: 0, 4: 4, 5: 7}
    assert dedup_cluster_pareto(spark, SF_DIR).count() == 0


def test_priority_transitions_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        customer_priority_transitions,
    )

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority "
        f"FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    per_cust: dict = {}
    for ck, dt, ok, pri in orders:
        per_cust.setdefault(ck, []).append((dt, ok, pri))
    pairs: Counter = Counter()
    for seq in per_cust.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    n_all = sum(pairs.values())
    row_tot: Counter = Counter()
    for (a, _), c in pairs.items():
        row_tot[a] += c
    got = {(r["prev_priority"], r["next_priority"]): r
           for r in customer_priority_transitions(spark, SF_DIR).collect()}
    assert set(got) == set(pairs)
    for (a, b), r in got.items():
        assert r["n_pairs"] == pairs[(a, b)]
        assert r["row_share_r6"] == _r6(pairs[(a, b)], row_tot[a])
        assert r["pair_share_r6"] == _r6(pairs[(a, b)], n_all)


def test_weekend_lift_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_weekend_lift

    rows = _events_rows()
    days = [us // 86_400_000_000 for _, us, _, _, _ in rows]
    dmin, dmax = min(days), max(days)
    n_days = dmax - dmin + 1
    n_wknd_days = sum(1 for d in range(dmin, dmax + 1) if (d + 3) % 7 >= 5)
    agg: dict = {}
    for _, us, _, et, v in rows:
        d = us // 86_400_000_000
        wk = (d + 3) % 7 >= 5
        c = _cents(v)
        a = agg.setdefault(et, [0, 0, 0, 0])
        a[0] += 1
        a[2] += c
        if wk:
            a[1] += 1
            a[3] += c
    got = {r["event_type"]: r
           for r in ev_weekend_lift(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for et, (ne, nw, ct, cw) in agg.items():
        r = got[et]
        assert (r["n_events"], r["n_weekend_events"]) == (ne, nw)
        assert (r["cents_total"], r["cents_weekend"]) == (ct, cw)
        assert r["weekend_event_share_r6"] == _r6(nw, ne)
        assert r["weekend_value_share_r6"] == _r6(cw, ct)
        assert r["calendar_weekend_share_r6"] == _r6(n_wknd_days, n_days)
        assert r["weekend_lift_r6"] == _r6(nw * n_days, ne * n_wknd_days)


def test_chunk_cdc_profile_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        CDC_MOD,
        mm_chunk_cdc_profile,
    )

    rows = _docs_rows()
    stats: dict = {}
    for doc_id, text, _, _ in rows:
        payload = text.encode("utf-8")
        n = len(payload)
        if n < 1:
            continue
        mt = ("image", "audio", "video")[doc_id % 3]
        bounds = [0] + [
            i + 1
            for i in range(n - 1)
            if (payload[i] * 31 + payload[i + 1]) % CDC_MOD == 0
        ] + [n]
        st = stats.setdefault(
            mt, {"assets": 0, "bytes": 0, "chunks": 0,
                 "hashes": set(), "lens": []})
        st["assets"] += 1
        st["bytes"] += n
        for s, e in zip(bounds, bounds[1:]):
            st["chunks"] += 1
            st["lens"].append(e - s)
            st["hashes"].add(hashlib.md5(
                payload[s:e].hex().upper().encode()).hexdigest())
    got = {r["media_type"]: r
           for r in mm_chunk_cdc_profile(spark, SF_DIR).collect()}
    assert set(got) == set(stats)
    for mt, st in stats.items():
        r = got[mt]
        assert r["n_assets"] == st["assets"]
        assert r["total_bytes"] == st["bytes"]
        assert r["total_chunks"] == st["chunks"]
        assert r["distinct_chunks"] == len(st["hashes"])
        assert r["min_chunk_len"] == min(st["lens"])
        assert r["max_chunk_len"] == max(st["lens"])
        assert r["mean_chunk_len_r6"] == _r6(st["bytes"], st["chunks"])
        assert r["dup_chunk_share_r6"] == _r6(
            st["chunks"] - len(st["hashes"]), st["chunks"])


# ---------------------------------------------------------------------------
# Batch E (r13 backlog): hourly-load Gini, HLL precision sweep,
# tolerance as-of join, per-cluster silhouette
# ---------------------------------------------------------------------------


def test_hourly_load_gini_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_hourly_load_gini

    rows = _events_rows()
    hours = [us // 3_600_000_000 for _, us, _, _, _ in rows]
    lo, hi = min(hours), max(hours)
    per_type: dict = {}
    for _, us, _, et, _ in rows:
        per_type.setdefault(et, Counter())[us // 3_600_000_000] += 1
    got = {r["event_type"]: r
           for r in ev_hourly_load_gini(spark, SF_DIR).collect()}
    assert set(got) == set(per_type)
    for et, cnt in per_type.items():
        xs = sorted(cnt.get(h, 0) for h in range(lo, hi + 1))
        n = len(xs)
        tot = sum(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        r = got[et]
        assert r["n_hours"] == n
        assert r["n_zero_hours"] == sum(1 for x in xs if x == 0)
        assert r["total_events"] == tot
        assert r["gini_r6"] == _r6(num, n * tot)


def test_hll_precision_sweep_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        HLL_SWEEP,
        sketch_hll_precision_sweep,
    )

    rows = _docs_rows()
    hashes = [
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        for _, t, _, _ in rows
    ]
    exact = len({t for _, t, _, _ in rows})
    got = {r["m"]: r
           for r in sketch_hll_precision_sweep(spark, SF_DIR).collect()}
    assert set(got) == {m for m, _, _ in HLL_SWEEP}
    for m, sb, alpha in HLL_SWEEP:
        regs = [0] * m
        for h in hashes:
            b, w = h % m, h // m
            rho = sb if w == 0 else sb - w.bit_length()
            regs[b] = max(regs[b], rho)
        harmonic = sum(1 << (sb - r) for r in regs)
        est = alpha * m * m * float(1 << sb) / float(harmonic)
        est_micros = int(np.floor(est * 1e6))
        r = got[m]
        assert r["n_zero_registers"] == sum(1 for x in regs if x == 0)
        assert r["harmonic_scaled"] == harmonic
        assert r["est_micros"] == est_micros
        assert r["exact_distinct"] == exact
        diff = abs(est_micros - exact * 1_000_000) // 1_000_000
        den = exact
        want = float(
            (diff // den) * 1_000_000
            + ((diff % den) * 2_000_000 + den) // (2 * den)
        ) / 1e6
        assert r["rel_err_r6"] == want
        # the sweep is a real precision gate: every m estimates within
        # the ~1.04/sqrt(m) envelope x3 of the exact count
        assert r["rel_err_r6"] <= 3 * 1.04 / (m ** 0.5)


def test_asof_tolerance_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        ASOF_TOL_US,
        join_asof_tolerance,
    )

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, epoch_us(o_orderdate), MAX(o_orderkey) "
        f"FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    per_cust: dict = {}
    for ck, ous, ok in orders:
        per_cust.setdefault(ck, []).append((ous, ok))
    for v in per_cust.values():
        v.sort()
    rows = _events_rows()
    got = {r["event_id"]: r
           for r in join_asof_tolerance(spark, SF_DIR).collect()}
    assert len(got) == len(rows)
    for eid, us, uid, _, _ in rows:
        best = None
        for ous, ok in per_cust.get(uid, []):
            if ous <= us:
                best = (ous, ok)
            else:
                break
        r = got[eid]
        if best is None or us - best[0] > ASOF_TOL_US:
            assert r["tol_orderkey"] is None
            assert r["tol_orderdate"] is None
            assert r["staleness_hours"] is None
        else:
            assert r["tol_orderkey"] == best[1]
            assert r["staleness_hours"] == (us - best[0]) // 3_600_000_000


def test_cluster_silhouette_matches_python_brute(spark):
    """Replays the kmeans loop's final assignment via the engine's own
    diagnostics frames, then checks the silhouette rollup against a
    python recomputation from the all-pairs distance table."""
    import math

    from spark_dba_spark.operators.curation import (
        SIL_BOUNDARY_MICROS,
        emb_cluster_silhouette,
    )
    from spark_dba_spark.operators.similarity import _km_cent_sql, _km_loop

    assigned, cent = _km_loop(spark, SF_DIR)
    rows = assigned.select("vec_id", "qv").collect()
    per_cluster: dict = {}
    for r in rows:
        qv = r["qv"]
        d2s = sorted(
            (sum((x - c) * (x - c) for x, c in zip(qv, cv)), cid)
            for cid, cv in enumerate(cent)
        )
        (a2, cid1), (b2, _) = d2s[0], d2s[1]
        s = 0 if b2 <= 0 else int(
            math.floor(float(b2 - a2) / float(b2) * 1e6))
        per_cluster.setdefault(cid1, []).append(s)
    got = {r["cid"]: r
           for r in emb_cluster_silhouette(spark, SF_DIR).collect()}
    assert set(got) == set(per_cluster)
    for cid, ss in per_cluster.items():
        r = got[cid]
        n = len(ss)
        assert r["n_points"] == n
        assert r["min_s_micros"] == min(ss)
        assert r["max_s_micros"] == max(ss)
        assert r["n_boundary"] == sum(
            1 for s in ss if s < SIL_BOUNDARY_MICROS)
        tot, den = sum(ss), n * 1_000_000
        want = float(
            (tot // den) * 1_000_000
            + ((tot % den) * 2_000_000 + den) // (2 * den)
        ) / 1e6
        assert r["mean_silhouette_r6"] == want


# ---------------------------------------------------------------------------
# Batch F (r13 backlog): promo DiD, dup-graph modularity, char entropy
# ---------------------------------------------------------------------------


def test_promo_did_matches_python_brute(spark):
    import math

    from spark_dba_spark.operators.curation import lineitem_promo_did

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CASE WHEN p_type = 'PROMO' THEN 'promo' ELSE 'other' "
        f"END, epoch_us(l_shipdate) // 86400000000, l_discount "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet') l "
        f"JOIN read_parquet('{SF_DIR}/part.parquet') p "
        f"ON l.l_partkey = p.p_partkey"
    ).fetchall()
    con.close()
    days = [d for _, d, _ in rows]
    mid = (min(days) + max(days)) // 2
    cells: dict = {}
    for grp, d, disc in rows:
        period = "post" if d >= mid else "pre"
        c = cells.setdefault((grp, period), [0, 0])
        c[0] += 1
        c[1] += int(math.floor(disc * 1_000_000 + 0.5))
    means = {k: (s * 2 + n) // (2 * n) for k, (n, s) in cells.items()}
    did = (means[("promo", "post")] - means[("promo", "pre")]
           - means[("other", "post")] + means[("other", "pre")])
    got = {(r["grp"], r["period"]): r
           for r in lineitem_promo_did(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for k, (n, s) in cells.items():
        r = got[k]
        assert (r["n_lines"], r["sum_disc_micros"]) == (n, s)
        assert r["mean_disc_micros"] == means[k]
        assert r["did_micros"] == did
        assert r["did_rate"] == float(did) / 1e6


def test_neardup_modularity_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import graph_neardup_modularity
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard

    edges = [(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    src = {d: s for d, _, _, s in _docs_rows()}
    m = len(edges)
    intra: Counter = Counter()
    deg: Counter = Counter()
    nodes: dict = {}
    for a, b in edges:
        sa, sb = src[a], src[b]
        if sa == sb:
            intra[sa] += 1
        deg[sa] += 1
        deg[sb] += 1
        nodes.setdefault(sa, set()).add(a)
        nodes.setdefault(sb, set()).add(b)
    q_total = sum(
        4 * m * intra.get(s, 0) - deg[s] * deg[s] for s in deg)
    want_q = _r6(abs(q_total), 4 * m * m)
    if q_total < 0:
        want_q = -want_q
    got = {r["source"]: r
           for r in graph_neardup_modularity(spark, SF_DIR).collect()}
    assert set(got) == set(deg)
    for s in deg:
        r = got[s]
        assert r["n_nodes"] == len(nodes[s])
        assert r["intra_edges"] == intra.get(s, 0)
        assert r["degree_sum"] == deg[s]
        assert r["q_num"] == 4 * m * intra.get(s, 0) - deg[s] * deg[s]
        assert r["modularity_r6"] == want_q
    # planted invariant: modularity is bounded and the degree mass
    # double-counts every edge
    assert sum(r["degree_sum"] for r in got.values()) == 2 * m


def test_char_entropy_sanity_and_brute(spark, tmp_path):
    """Exact brute check on a planted corpus (uniform 4-char alphabet
    = ln 4; single-char corpus = 0), plus fixture-level consistency."""
    import math

    from spark_dba_spark.operators.curation import (
        text_char_entropy_by_source,
    )

    _write_docs(tmp_path, ["abcd" * 25, "aaaa" * 25],
                sources=["uniform", "degenerate"])
    got = {r["source"]: r
           for r in text_char_entropy_by_source(spark, str(tmp_path))
           .collect()}
    assert got["degenerate"]["entropy_nats"] == 0.0
    assert abs(got["uniform"]["entropy_nats"] - math.log(4)) < 1e-6
    assert got["uniform"]["n_char_types"] == 4
    # fixture: entropy positive, bounded by ln(alphabet size)
    for r in text_char_entropy_by_source(spark, SF_DIR).collect():
        assert 0 < r["entropy_nats"] <= math.log(r["n_char_types"]) + 1e-9


# ---------------------------------------------------------------------------
# Batch G (r13 backlog): PQ codebook utilization, dup-graph conductance,
# session bounce profile
# ---------------------------------------------------------------------------


def test_pq_utilization_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import (
        emb_pq_codebook_utilization,
    )
    from spark_dba_spark.operators.similarity import (
        KM_QUANT,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
    )

    rows = _emb_rows()
    qvs = {vid: [int(float(x) * KM_QUANT) for x in emb]
           for vid, emb in rows}
    cb = [qvs[k] for k in range(PQ_K)]
    cnt: Counter = Counter()
    for vid, qv in qvs.items():
        for m in range(PQ_M):
            lo, hi = m * PQ_SUBDIM, (m + 1) * PQ_SUBDIM
            d2s = [
                sum((qv[i] - cb[k][i]) ** 2 for i in range(lo, hi))
                for k in range(PQ_K)
            ]
            cnt[(m, d2s.index(min(d2s)))] += 1
    n = len(qvs)
    got = {(r["m"], r["code"]): r
           for r in emb_pq_codebook_utilization(spark, SF_DIR).collect()}
    assert len(got) == PQ_M * PQ_K
    for m in range(PQ_M):
        sum_sq = sum(cnt.get((m, k), 0) ** 2 for k in range(PQ_K))
        for k in range(PQ_K):
            r = got[(m, k)]
            assert r["n_assigned"] == cnt.get((m, k), 0)
            assert r["share_r6"] == _r6(cnt.get((m, k), 0), n)
            assert r["m_simpson_r6"] == _r6(sum_sq, n * n)
    assert sum(r["n_assigned"] for r in got.values()) == n * PQ_M


def test_neardup_conductance_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import graph_neardup_conductance
    from spark_dba_spark.operators.dedup import dedup_ngram_jaccard

    edges = [(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    src = {d: s for d, _, _, s in _docs_rows()}
    m = len(edges)
    cut: Counter = Counter()
    vol: Counter = Counter()
    nodes: dict = {}
    for a, b in edges:
        sa, sb = src[a], src[b]
        if sa != sb:
            cut[sa] += 1
            cut[sb] += 1
        vol[sa] += 1
        vol[sb] += 1
        nodes.setdefault(sa, set()).add(a)
        nodes.setdefault(sb, set()).add(b)
    got = {r["source"]: r
           for r in graph_neardup_conductance(spark, SF_DIR).collect()}
    assert set(got) == set(vol)
    for s in vol:
        r = got[s]
        assert r["n_nodes"] == len(nodes[s])
        assert r["volume"] == vol[s]
        assert r["cut_edges"] == cut.get(s, 0)
        den = min(vol[s], 2 * m - vol[s])
        if den > 0:
            assert r["conductance_r6"] == _r6(cut.get(s, 0), den)
        else:
            assert r["conductance_r6"] is None


def test_session_bounce_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import ev_session_bounce_profile
    from spark_dba_spark.operators.temporal import SESSION_GAP_US

    rows = _events_rows()
    per_user: dict = {}
    for eid, us, uid, _, _ in rows:
        per_user.setdefault(uid, []).append((us, eid))
    daily: dict = {}
    for evs in per_user.values():
        evs.sort()
        sessions = []
        for us, _ in evs:
            if sessions and us - sessions[-1][0][-1] <= SESSION_GAP_US:
                sessions[-1][0].append(us)
            else:
                sessions.append(([us],))
        for (uss,) in sessions:
            day = uss[0] // 86_400_000_000
            d = daily.setdefault(day, [0, 0, 0])
            d[0] += 1
            d[1] += 1 if len(uss) == 1 else 0
            d[2] += len(uss)
    got = {r["day_epoch"]: r
           for r in ev_session_bounce_profile(spark, SF_DIR).collect()}
    assert set(got) == set(daily)
    for day, (ns, nb, ne) in daily.items():
        r = got[day]
        assert (r["n_sessions"], r["n_bounce_sessions"]) == (ns, nb)
        assert r["n_events"] == ne
        assert r["bounce_share_r6"] == _r6(nb, ns)
        assert r["mean_events_per_session_r6"] == _r6(ne, ns)


# ---------------------------------------------------------------------------
# Degenerate-corpus guards (ANSI div-by-zero edges; NULL, never a crash)
# ---------------------------------------------------------------------------


def _write_events_parquet(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


def _write_lineitem_part(tmp_path, lines, parts):
    """lines: (l_orderkey, l_partkey, l_linenumber, l_quantity,
    l_extendedprice, l_discount, l_returnflag, l_shipdate_us);
    parts: (p_partkey, p_brand, p_type)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
                "l_linenumber": pa.array([r[2] for r in lines], pa.int64()),
                "l_quantity": pa.array(
                    [float(r[3]) for r in lines], pa.float64()),
                "l_extendedprice": pa.array(
                    [float(r[4]) for r in lines], pa.float64()),
                "l_discount": pa.array(
                    [float(r[5]) for r in lines], pa.float64()),
                "l_tax": pa.array([0.0] * len(lines), pa.float64()),
                "l_returnflag": pa.array([r[6] for r in lines]),
                "l_linestatus": pa.array(["O"] * len(lines)),
                "l_shipdate": pa.array(
                    [r[7] for r in lines], pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in parts], pa.int64()),
                "p_name": pa.array([f"part {r[0]}" for r in parts]),
                "p_brand": pa.array([r[1] for r in parts]),
                "p_type": pa.array([r[2] for r in parts]),
                "p_size": pa.array([1] * len(parts), pa.int64()),
                "p_retailprice": pa.array(
                    [1.0] * len(parts), pa.float64()),
            }
        ),
        tmp_path / "part.parquet",
    )


def test_weekend_lift_no_weekend_span_is_null(spark, tmp_path):
    """All events on one mid-week day: calendar weekend share 0, lift
    NULL (not an ANSI division error)."""
    from spark_dba_spark.operators.curation import ev_weekend_lift

    tue_us = 3 * 86_400_000_000  # 1970-01-06 Tuesday... day 3 is Sunday?
    # day index: (day + 3) % 7, Monday = 0. Pick day 5 -> (5+3)%7 = 1
    # (Tuesday).
    tue_us = 5 * 86_400_000_000 + 3_600_000_000
    _write_events_parquet(
        tmp_path,
        [(i, tue_us + i * 1_000_000, 1, "click", 1.0) for i in range(5)],
    )
    rows = ev_weekend_lift(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["calendar_weekend_share_r6"] == 0.0
    assert r["weekend_lift_r6"] is None
    assert r["n_weekend_events"] == 0


def test_cramers_v_single_category_is_null(spark, tmp_path):
    """One brand x one flag: chi2 is 0 and V2 is undefined (NULL)."""
    from spark_dba_spark.operators.curation import stats_cramers_v_assoc

    day = 10_000 * 86_400_000_000
    _write_lineitem_part(
        tmp_path,
        [(1, 1, i, 1, 10.0, 0.05, "N", day) for i in range(4)],
        [(1, "Brand#11", "STANDARD")],
    )
    rows = stats_cramers_v_assoc(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["cramers_v2_r6"] is None
    assert rows[0]["chi2_part_micros"] == 0


def test_cluster_pareto_zero_token_dups_null_share(spark, tmp_path):
    """Duplicate clusters whose texts have no tokens: removable mass 0,
    shares NULL, ranks still emitted."""
    from spark_dba_spark.operators.curation import dedup_cluster_pareto

    _write_docs(tmp_path, ["   ", "   ", "a b c"])
    rows = dedup_cluster_pareto(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["removable_tokens"] == 0
    assert r["cum_share_r6"] is None


def test_hll_sweep_empty_corpus_null_err(spark, tmp_path):
    """Empty corpus: all registers 0, exact 0, relative error NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.curation import (
        HLL_SWEEP,
        sketch_hll_precision_sweep,
    )

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()),
         ("lang", pa.string()), ("source", pa.string()),
         ("n_chars", pa.int64())]
    )
    pq.write_table(
        pa.table({f.name: pa.array([], f.type) for f in schema}),
        tmp_path / "documents.parquet",
    )
    rows = sketch_hll_precision_sweep(spark, str(tmp_path)).collect()
    assert len(rows) == len(HLL_SWEEP)
    for r in rows:
        assert r["exact_distinct"] == 0
        assert r["n_zero_registers"] == r["m"]
        assert r["rel_err_r6"] is None


def test_promo_did_missing_cell_is_null(spark, tmp_path):
    """Only PROMO lines: two cells exist, DiD undefined (NULL) instead
    of a silently wrong 2-term sum."""
    from spark_dba_spark.operators.curation import lineitem_promo_did

    d0 = 10_000 * 86_400_000_000
    d1 = 10_010 * 86_400_000_000
    _write_lineitem_part(
        tmp_path,
        [(1, 1, 1, 1, 10.0, 0.05, "N", d0),
         (2, 1, 1, 1, 10.0, 0.09, "N", d1)],
        [(1, "Brand#11", "PROMO")],
    )
    rows = lineitem_promo_did(spark, str(tmp_path)).collect()
    assert {r["grp"] for r in rows} == {"promo"}
    assert all(r["did_micros"] is None for r in rows)
    assert all(r["did_rate"] is None for r in rows)


def test_chunk_cdc_tiny_payloads(spark, tmp_path):
    """1- and 2-byte payloads: one chunk for n=1 (the sequence(1,0)
    guard), boundary predicate exercised at n=2; totals reconcile."""
    from spark_dba_spark.operators.curation import (
        CDC_MOD,
        mm_chunk_cdc_profile,
    )

    _write_docs(tmp_path, ["a", "ab", "abcdefgh"])
    rows = {r["media_type"]: r
            for r in mm_chunk_cdc_profile(spark, str(tmp_path)).collect()}
    # doc 0 ('a', image): n=1, exactly one chunk of length 1
    r0 = rows["image"]
    assert (r0["n_assets"], r0["total_bytes"]) == (1, 1)
    assert r0["total_chunks"] == 1 and r0["min_chunk_len"] == 1
    # doc 1 ('ab', audio): python-replay the boundary rule
    pb = "ab".encode()
    n_chunks = 1 + sum(
        1 for i in range(len(pb) - 1)
        if (pb[i] * 31 + pb[i + 1]) % CDC_MOD == 0)
    r1 = rows["audio"]
    assert (r1["n_assets"], r1["total_bytes"]) == (1, 2)
    assert r1["total_chunks"] == n_chunks
    # doc 2 ('abcdefgh', video): totals reconcile
    r2 = rows["video"]
    assert r2["total_bytes"] == 8
    assert r2["min_chunk_len"] >= 1 and r2["max_chunk_len"] <= 8
