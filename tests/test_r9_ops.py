"""Brute-force Python twins for the round-9 operators: each op's full
pipeline replayed with exact integer arithmetic on plain Python data
structures, plus the algebraic invariants the oracle-parity check can't
see (completeness proofs, monotonicity, endpoint conventions)."""

from __future__ import annotations

import math

import duckdb

from conftest import SF_DIR


def _r6(num: int, den: int) -> float:
    return float((num * 2_000_000 + den) // (2 * den)) / 1e6


def _docs_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_substring_spans_matches_python_brute(spark):
    """Stride-1 span fingerprints: per-doc window/dup counts equal a
    dict-based Python replay, and a doc shorter than the window emits
    zero windows with share 0."""
    from spark_dba_spark.operators.text import SPAN_W, dedup_substring_spans

    rows = _docs_rows()
    owner: dict = {}
    per_doc: dict = {}
    for doc_id, text, _ in rows:
        ws = text.split(" ")
        spans = [
            " ".join(ws[i:i + SPAN_W])
            for i in range(0, max(len(ws) - SPAN_W + 1, 0))
        ]
        per_doc[doc_id] = spans
        for s in spans:
            owner.setdefault(s, set()).add(doc_id)
    got = {r["doc_id"]: r for r in
           dedup_substring_spans(spark, SF_DIR).collect()}
    assert set(got) == {d for d, _, _ in rows}
    for doc_id, spans in per_doc.items():
        n_dup = sum(1 for s in spans if len(owner[s]) >= 2)
        r = got[doc_id]
        assert (r["n_windows"], r["n_dup_windows"]) == (len(spans), n_dup)
        if spans:
            assert r["dup_share_r6"] == _r6(n_dup, len(spans))
        else:
            assert r["dup_share_r6"] == 0.0


def test_boundary_overlap_matches_python_brute(spark):
    """Edge-fingerprint pairs equal the literal suffix==prefix scan."""
    from spark_dba_spark.operators.text import BOUNDARY_W, text_boundary_overlap

    rows = _docs_rows()
    edges = {}
    for doc_id, text, _ in rows:
        ws = text.split(" ")
        if len(ws) >= BOUNDARY_W:
            edges[doc_id] = (
                " ".join(ws[:BOUNDARY_W]), " ".join(ws[-BOUNDARY_W:])
            )
    expect = {
        (a, b)
        for a, (_, suf) in edges.items()
        for b, (pre, _) in edges.items()
        if a != b and suf == pre
    }
    got = {(r["suffix_doc_id"], r["prefix_doc_id"])
           for r in text_boundary_overlap(spark, SF_DIR).collect()}
    assert got == expect


def test_source_vocab_jaccard_matches_python_brute(spark):
    """Pairwise vocabulary Jaccard equals Python set arithmetic."""
    from spark_dba_spark.operators.text import text_source_vocab_jaccard

    rows = _docs_rows()
    vocab: dict = {}
    for _, text, source in rows:
        vocab.setdefault(source, set()).update(
            w for w in text.lower().split(" ") if w
        )
    got = {(r["src_a"], r["src_b"]): r for r in
           text_source_vocab_jaccard(spark, SF_DIR).collect()}
    sources = sorted(vocab)
    pairs = [(a, b) for i, a in enumerate(sources) for b in sources[i + 1:]]
    assert set(got) == set(pairs)
    for a, b in pairs:
        inter = len(vocab[a] & vocab[b])
        union = len(vocab[a] | vocab[b])
        r = got[(a, b)]
        assert (r["vocab_a"], r["vocab_b"], r["n_inter"]) == (
            len(vocab[a]), len(vocab[b]), inter)
        assert r["jaccard_r6"] == _r6(inter, union)


def test_rake_keywords_matches_python_brute(spark):
    """RAKE scores equal a full Python replay: same corpus-calibrated
    stopwords, same phrase islands, same degree/frequency integers."""
    from collections import Counter

    from spark_dba_spark.operators.text import (
        RAKE_STOP_K,
        RAKE_TOP,
        text_rake_keywords,
    )

    rows = _docs_rows()
    freq_all: Counter = Counter()
    docs_words = []
    for _, text, _ in rows:
        ws = [w for w in text.lower().split(" ") if w]
        docs_words.append(ws)
        freq_all.update(ws)
    stop = {
        w for w, _ in sorted(freq_all.items(), key=lambda kv: (-kv[1], kv[0]))
        [:RAKE_STOP_K]
    }
    freq: Counter = Counter()
    degree: Counter = Counter()
    for ws in docs_words:
        phrase: list = []
        for w in ws + [None]:
            if w is None or w in stop:
                for pw in phrase:
                    freq[pw] += 1
                    degree[pw] += len(phrase)
                phrase = []
            else:
                phrase.append(w)
    # canonical RAKE order (r10): score = degree/freq as the IEEE double
    # quotient (exact division of <2^53 ints — the engines' sort key),
    # then degree DESC, word ASC on collisions
    expect = sorted(
        ((w, freq[w], degree[w]) for w in freq),
        key=lambda t: (-(t[2] / t[1]), -t[2], t[0]),
    )[:RAKE_TOP]
    got = [(r["word"], r["freq"], r["degree"], r["score_r6"])
           for r in text_rake_keywords(spark, SF_DIR).collect()]
    assert [(w, f, d) for w, f, d, _ in got] == expect
    for w, f, d, s in got:
        assert s == _r6(d, f)
        assert s >= 1.0  # degree >= freq by construction


def test_equidepth_histogram_matches_python_brute(spark):
    """Boundary k is the smallest cents value whose cumulative count
    reaches ceil(k*n/K) — checked against a sorted-list index."""
    from spark_dba_spark.operators.temporal import (
        EQD_K,
        stats_equidepth_histogram,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT o_orderpriority, o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    per: dict = {}
    for p, tp in rows:
        per.setdefault(p, []).append(math.floor(tp * 100 + 0.5))
    got = {(r["o_orderpriority"], r["k"]): r for r in
           stats_equidepth_histogram(spark, SF_DIR).collect()}
    for p, vals in per.items():
        vals.sort()
        n = len(vals)
        for k in range(1, EQD_K + 1):
            rank = -(-k * n // EQD_K)  # ceil
            r = got[(p, k)]
            assert r["n_orders"] == n
            assert r["boundary_cents"] == vals[rank - 1]
    # k = K boundary is the group max
    for p, vals in per.items():
        assert got[(p, EQD_K)]["boundary_cents"] == max(vals)


def test_runs_test_matches_python_brute(spark):
    """Run counts and null moments equal the sequential Python fold."""
    from spark_dba_spark.operators.temporal import stats_runs_test

    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE) AS dt, "
        "SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    con.close()
    signs = []
    for (d0, c0), (d1, c1) in zip(rows, rows[1:]):
        if c1 != c0:
            signs.append(1 if c1 > c0 else -1)
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    r = stats_runs_test(spark, SF_DIR).collect()[0]
    assert (r["n_up"], r["n_down"], r["n_runs"]) == (n1, n2, runs)
    nn = n1 + n2
    assert r["expected_runs_r6"] == _r6(nn + 2 * n1 * n2, nn)
    assert r["var_runs_r6"] == _r6(
        2 * n1 * n2 * (2 * n1 * n2 - nn), nn * nn * (nn - 1))
    # the observed run count is inside the valid range [1, N]
    assert 1 <= runs <= nn


def test_lttb_matches_python_brute(spark):
    """LTTB (bucket-mean-anchor variant) equals a sequential Python
    replay with exact integer cross products; endpoints are always kept
    and every interior bucket emits exactly one of its own points."""
    from fractions import Fraction

    from spark_dba_spark.operators.temporal import LTTB_K, ts_downsample_lttb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE) AS dt, "
        "SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    con.close()
    n = len(rows)
    pts = [(i + 1, int(c)) for i, (_, c) in enumerate(rows)]  # (idx, cents)
    raw: dict = {}
    for idx, y in pts[1:-1]:
        b = ((idx - 2) * LTTB_K) // (n - 2)
        raw.setdefault(b, []).append((idx, y))
    # dense re-rank (identity when n-2 >= LTTB_K)
    buckets = {d: raw[b] for d, b in enumerate(sorted(raw))}
    anchors = {
        b: (Fraction(sum(x for x, _ in v), len(v)),
            Fraction(sum(y for _, y in v), len(v)))
        for b, v in buckets.items()
    }
    anchors[-1] = (Fraction(pts[0][0]), Fraction(pts[0][1]))
    anchors[LTTB_K] = (Fraction(pts[-1][0]), Fraction(pts[-1][1]))
    expect = {}
    for b, v in buckets.items():
        px, py = anchors[b - 1]
        nx, ny = anchors[b + 1]
        best = max(
            v,
            key=lambda p: (
                abs(px * (p[1] - ny) + p[0] * (ny - py) + nx * (py - p[1])),
                -p[0],
            ),
        )
        expect[b] = best[0]
    got = {r["bucket"]: r for r in ts_downsample_lttb(spark, SF_DIR).collect()}
    assert got[-1]["revenue_cents"] == pts[0][1]  # first endpoint
    assert got[LTTB_K]["revenue_cents"] == pts[-1][1]  # last endpoint
    dts = [d for d, _ in rows]
    for b, idx in expect.items():
        assert got[b]["dt"] == dts[idx - 1]
        assert got[b]["revenue_cents"] == pts[idx - 1][1]
    assert set(got) == set(expect) | {-1, LTTB_K}


def test_vad_segments_matches_python_brute(spark):
    """VAD islands equal a sequential Python fold over the byte-as-PCM
    stub; segment totals are consistent (sum of segment lengths ==
    active count)."""
    from spark_dba_spark.operators.multimodal import (
        VAD_THRESH,
        VAD_WIN,
        mm_audio_vad_segments,
    )

    rows = _docs_rows()
    got = {r["doc_id"]: r for r in
           mm_audio_vad_segments(spark, SF_DIR).collect()}
    audio = [(d, t) for d, t, _ in rows if d % 3 == 1]
    assert set(got) == {d for d, _ in audio}
    for doc_id, text in audio:
        bs = text.encode()
        acts = []
        for w in range(0, len(bs), VAD_WIN):
            chunk = bs[w:w + VAD_WIN]
            ss = sum((b - 128) ** 2 for b in chunk)
            acts.append(ss > VAD_THRESH * len(chunk))
        segs = []
        run = 0
        for a in acts + [False]:
            if a:
                run += 1
            elif run:
                segs.append(run)
                run = 0
        r = got[doc_id]
        assert r["n_windows"] == len(acts)
        assert r["n_active"] == sum(acts)
        assert r["n_segments"] == len(segs)
        assert r["longest_segment"] == (max(segs) if segs else 0)
        assert sum(segs) == r["n_active"]


def test_scene_cuts_matches_python_brute(spark):
    """Scene segmentation equals the sequential Python fold over the
    frame-feature stub; n_scenes == n_cuts + 1 for every video."""
    from spark_dba_spark.operators.multimodal import (
        SCENE_CHARS,
        SCENE_CUT_THRESH,
        mm_video_scene_cuts,
    )

    rows = _docs_rows()
    got = {r["doc_id"]: r for r in
           mm_video_scene_cuts(spark, SF_DIR).collect()}
    videos = [(d, t) for d, t, _ in rows if d % 3 == 2]
    assert set(got) == {d for d, _ in videos}
    for doc_id, text in videos:
        n_frames = 1 + len(text.encode()) % 10
        feats = []
        for f in range(n_frames):
            if f * SCENE_CHARS >= len(text):
                break
            block = text[f * SCENE_CHARS:(f + 1) * SCENE_CHARS]
            feats.append(sum(ord(c) for c in block))
        cuts = sum(
            1 for a, b in zip(feats, feats[1:])
            if abs(b - a) > SCENE_CUT_THRESH
        )
        scene_lens = []
        run = 1
        for a, b in zip(feats, feats[1:]):
            if abs(b - a) > SCENE_CUT_THRESH:
                scene_lens.append(run)
                run = 1
            else:
                run += 1
        scene_lens.append(run)
        r = got[doc_id]
        assert r["n_sampled_frames"] == len(feats)
        assert r["n_scenes"] == cuts + 1 == len(scene_lens)
        assert r["longest_scene"] == max(scene_lens)


def _quantized_embeddings():
    from spark_dba_spark.operators.similarity import KM_QUANT

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    return {
        vid: (label, [int(math.trunc(float(x) * KM_QUANT)) for x in emb])
        for vid, label, emb in rows
    }


def test_mmr_matches_python_greedy(spark):
    """The distributed MMR selection equals a plain Python greedy over
    exact integer dots; rank 1 is the pure-relevance argmax and the
    selections are distinct."""
    from spark_dba_spark.operators.similarity import (
        MMR_C,
        MMR_K,
        MMR_Q,
        emb_mmr_diversified_topk,
    )

    q = _quantized_embeddings()

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    got: dict = {}
    for r in emb_mmr_diversified_topk(spark, SF_DIR).collect():
        got.setdefault(r["qid"], []).append(
            (r["mmr_rank"], r["vec_id"], r["rel"]))
    assert set(got) == set(range(MMR_Q))
    for qid in range(MMR_Q):
        qv = q[qid][1]
        rel = {v: dot(qv, q[v][1]) for v in q if v >= MMR_Q}
        cand = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_C]
        selected: list = []
        for _ in range(MMR_K):
            rest = [v for v in cand if v not in selected]
            best = min(
                rest,
                key=lambda v: (
                    -(rel[v] - max(
                        (dot(q[v][1], q[s][1]) for s in selected),
                        default=0)),
                    v,
                ),
            )
            selected.append(best)
        rows = sorted(got[qid])
        assert [v for _, v, _ in rows] == selected
        assert rows[0][1] == cand[0]  # rank 1 = relevance argmax
        for _, v, rr in rows:
            assert rr == rel[v]
        assert len({v for _, v, _ in rows}) == MMR_K


def test_prefix_filter_complete_vs_brute(spark):
    """COMPLETENESS proof of the prefix-filter candidate scheme: the
    emitted pairs equal the unpruned brute-force Jaccard >= 0.8 pairs —
    no qualifying pair escapes the prefix join."""
    from spark_dba_spark.operators.dedup import NGRAM, dedup_prefix_filter_join

    rows = _docs_rows()
    sets: dict = {}
    for doc_id, text, _ in rows:
        ws = text.split(" ")
        if len(ws) >= NGRAM:
            sh = {" ".join(ws[i:i + NGRAM]) for i in range(len(ws) - NGRAM + 1)}
        else:
            sh = {text}
        sets[doc_id] = sh
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter and 5 * inter >= 4 * len(sets[a] | sets[b]):
                expect[(a, b)] = (inter, len(sets[a] | sets[b]))
    got = {(r["doc_a"], r["doc_b"]): (r["n_inter"], r["union_sz"])
           for r in dedup_prefix_filter_join(spark, SF_DIR).collect()}
    assert got == expect


def test_common_neighbors_matches_python_brute(spark):
    """Link-prediction scores equal adjacency-set arithmetic over the
    same near-dup edge list; predicted pairs are never existing edges."""
    from spark_dba_spark.operators.dedup import (
        dedup_ngram_jaccard,
        graph_common_neighbors,
    )

    edges = {(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for c in nodes[i + 1:]:
            if (a, c) in edges:
                continue
            cn = len(adj[a] & adj[c])
            if cn:
                expect[(a, c)] = cn
    got = {(r["doc_a"], r["doc_b"]): r
           for r in graph_common_neighbors(spark, SF_DIR).collect()}
    assert {k: v["cn"] for k, v in got.items()} == expect
    for (a, c), r in got.items():
        assert (a, c) not in edges
        assert r["deg_a"] == len(adj[a]) and r["deg_c"] == len(adj[c])
        assert r["nbr_jaccard_r6"] == _r6(
            r["cn"], r["deg_a"] + r["deg_c"] - r["cn"])


def test_margin_audit_matches_python_brute(spark):
    """Per-label margin rollups equal the O(n^2) Python scan; violation
    counts are bounded by the evaluated population."""
    from spark_dba_spark.operators.similarity import emb_margin_audit

    q = _quantized_embeddings()

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    per_label: dict = {}
    for v, (lab, qv) in q.items():
        d_same = d_other = None
        for u, (lu, qu) in q.items():
            if u == v:
                continue
            d = d2(qv, qu)
            if lu == lab:
                d_same = d if d_same is None else min(d_same, d)
            else:
                d_other = d if d_other is None else min(d_other, d)
        st = per_label.setdefault(lab, [0, 0, 0, None])
        st[0] += 1
        if d_same is None:
            st[1] += 1
        else:
            if d_other <= d_same:
                st[2] += 1
            m = d_other - d_same
            st[3] = m if st[3] is None else min(st[3], m)
    got = {r["label"]: r for r in emb_margin_audit(spark, SF_DIR).collect()}
    assert set(got) == set(per_label)
    for lab, (n, single, viol, mmin) in per_label.items():
        r = got[lab]
        assert (r["n_vecs"], r["n_singletons"],
                r["n_margin_violations"], r["min_margin_q2"]) == (
            n, single, viol, mmin)
        assert r["n_margin_violations"] <= r["n_vecs"] - r["n_singletons"]


def test_lttb_short_series_keeps_every_bucket(spark, tmp_path):
    """Regression (r9 self-review): a daily series SHORTER than
    LTTB_K+2 points makes the raw proportional bucket ids sparse; the
    dense re-rank must keep every occupied bucket's anchor join total,
    so the output is one point per occupied bucket + both endpoints —
    never just the endpoints."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.temporal import ts_downsample_lttb

    n_days = 20  # << LTTB_K + 2
    base = dt.datetime(2024, 1, 1)
    dates, prices = [], []
    for d in range(n_days):
        for j in range(2):  # two orders per day
            dates.append(base + dt.timedelta(days=d))
            prices.append(100.0 * (d + 1) + j * ((-1) ** d) * 7.5)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(dates)), pa.int64()),
                "o_custkey": pa.array([1] * len(dates), pa.int64()),
                "o_orderstatus": ["O"] * len(dates),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
                "o_orderpriority": ["3-MEDIUM"] * len(dates),
            }
        ),
        tmp_path / "orders.parquet",
    )
    rows = ts_downsample_lttb(spark, str(tmp_path)).collect()
    n_interior = n_days - 2  # every interior point occupies its own bucket
    assert len(rows) == n_interior + 2
    buckets = sorted(r["bucket"] for r in rows)
    assert buckets == [-1] + list(range(n_interior + 1))
    # endpoints carry the true first/last daily sums
    by_bucket = {r["bucket"]: r for r in rows}
    assert by_bucket[-1]["dt"] == base.date()
    assert by_bucket[n_interior]["dt"] == (
        base + dt.timedelta(days=n_days - 1)).date()


def test_seasonal_naive_backtest_matches_python_brute(spark):
    """Backtest rows equal dict arithmetic over (year, month) cents;
    only months with a prior-year counterpart appear."""
    from spark_dba_spark.operators.temporal import (
        orders_seasonal_naive_backtest,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT year(o_orderdate), month(o_orderdate), o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    monthly: dict = {}
    for y, m, tp in rows:
        monthly[(y, m)] = monthly.get((y, m), 0) + math.floor(tp * 100 + 0.5)
    got = {r["month"]: r for r in
           orders_seasonal_naive_backtest(spark, SF_DIR).collect()}
    expect_keys = {
        f"{y}-{m:02d}" for (y, m) in monthly if (y - 1, m) in monthly
    }
    assert set(got) == expect_keys
    for (y, m), actual in monthly.items():
        if (y - 1, m) not in monthly:
            continue
        pred = monthly[(y - 1, m)]
        r = got[f"{y}-{m:02d}"]
        assert (r["actual_cents"], r["predicted_cents"]) == (actual, pred)
        assert r["abs_err_cents"] == abs(actual - pred)
        assert r["ape_r6"] == _r6(abs(actual - pred), actual)


def test_fulfillment_latency_bands_match_python_brute(spark):
    """p50/p90/p99 equal sorted-list order statistics over per-order
    day latencies, and the bands are monotone."""
    from spark_dba_spark.operators.temporal import (
        orders_fulfillment_latency_bands,
    )

    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT o.o_orderpriority,
               MAX(epoch_us(l.l_shipdate) // 86400000000)
                 - (epoch_us(o.o_orderdate) // 86400000000)
        FROM read_parquet('{SF_DIR}/orders.parquet') o
        JOIN read_parquet('{SF_DIR}/lineitem.parquet') l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    """).fetchall()
    con.close()
    per: dict = {}
    for p, d in rows:
        per.setdefault(p, []).append(int(d))
    got = {r["o_orderpriority"]: r for r in
           orders_fulfillment_latency_bands(spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for p, lats in per.items():
        lats.sort()
        n = len(lats)
        r = got[p]
        assert r["n_orders"] == n
        for q, col in ((50, "p50_days"), (90, "p90_days"), (99, "p99_days")):
            rank = -(-q * n // 100)
            assert r[col] == lats[rank - 1]
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]


def test_prefix_filter_lemma_property():
    """The completeness lemma itself, property-tested on random set
    families: for ANY two sets with Jaccard >= 4/5, the canonical-order
    prefixes of length n - ceil(0.8*n) + 1 must intersect."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.sets(st.integers(0, 40), min_size=1, max_size=30),
        st.sets(st.integers(0, 40), min_size=1, max_size=30),
        st.randoms(use_true_random=False),
    )
    def check(a, b, rng):
        # random-but-shared canonical token order (stands in for the
        # df-then-token order; the lemma holds for ANY total order)
        order = sorted(a | b, key=lambda t: (rng.random(), t))
        pos = {t: i for i, t in enumerate(order)}

        def prefix(s):
            n = len(s)
            p = n - (4 * n + 4) // 5 + 1  # n - ceil(4n/5) + 1
            return set(sorted(s, key=lambda t: pos[t])[:p])

        inter = len(a & b)
        union = len(a | b)
        if 5 * inter >= 4 * union:  # J >= 0.8
            assert prefix(a) & prefix(b), (a, b, order)

    check()


def test_km_assign_matches_numpy_argmin_random(spark):
    """The JVM integer-HOF assignment fold (the r9 kmeans rewrite)
    equals numpy's argmin with lowest-index tie-break on a seeded
    random integer grid — including planted exact-tie vectors."""
    import numpy as np

    from spark_dba_spark.operators.similarity import _km_assign

    rng = np.random.default_rng(20260815)
    d, k, n = 16, 6, 80
    cents = rng.integers(-1000, 1000, size=(k, d)).tolist()
    # force an exact integer midpoint between centroids 0 and 1 so a
    # GUARANTEED tie vector exists (c1 = c0 + 2 per dim -> midpoint is
    # c0 + 1, equidistant with d2 = d on both sides)
    cents[1] = [c + 2 for c in cents[0]]
    vecs = rng.integers(-1000, 1000, size=(n, d))
    vecs[0] = np.array(cents[0]) + 1  # exact tie: must resolve to cid 0
    rows = [(i, [int(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, qv array<bigint>")
    got = {
        r["vec_id"]: (r["cid"], r["sqdist"])
        for r in _km_assign(df, [[int(v) for v in c] for c in cents])
        .collect()
    }
    c = np.array(cents, dtype=np.int64)
    for i in range(n):
        d2 = ((vecs[i][None, :] - c) ** 2).sum(axis=1)
        assert got[i] == (int(d2.argmin()), int(d2.min()))


def test_lttb_dense_rank_is_identity_when_series_long_enough():
    """For n - 2 >= LTTB_K the proportional bucket ids are already the
    contiguous 0..K-1 (consecutive ids step by at most 1 and the range
    is exactly covered), so the dense re-rank is the identity — the
    normal-case semantics are unchanged by the short-series fix."""
    from spark_dba_spark.operators.temporal import LTTB_K

    for n in (LTTB_K + 2, LTTB_K + 3, 2 * LTTB_K, 997, 2400):
        raw = [((idx - 2) * LTTB_K) // (n - 2) for idx in range(2, n)]
        assert raw[0] == 0 and raw[-1] == LTTB_K - 1
        assert all(0 <= b2 - b1 <= 1 for b1, b2 in zip(raw, raw[1:]))
        dense = {b: i for i, b in enumerate(sorted(set(raw)))}
        assert all(dense[b] == b for b in raw)


def test_kmeans_family_parity_on_synthetic_embeddings(spark, tmp_path):
    """Oracle↔builder parity on NON-FIXTURE data: a seeded synthetic
    embeddings table (different size, different distribution, clustered
    structure) run through the full check_oracle comparator for the
    kmeans family — guards against any fixture-shape overfit in either
    side of the pair."""
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry

    rng = np.random.default_rng(97)
    n, d, k_lab = 64, 64, 4
    centers = rng.uniform(-0.5, 0.5, size=(k_lab, d))
    labels = rng.integers(0, k_lab, size=n)
    emb = (centers[labels] + rng.normal(0, 0.05, size=(n, d))).clip(-0.6, 0.6)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in emb],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.tolist(), pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    specs = registry.all_specs()
    for name in (
        "emb_kmeans_lloyd",
        "emb_km_diag_assign",
        "emb_km_diag_sizes",
        "emb_km_diag_seed_inertia",
        "emb_km_diag_inertia_q2",
        "emb_km_diag_inertia_r6",
        "emb_km_diag_centroids",
        "emb_margin_audit",
        "emb_mmr_diversified_topk",
    ):
        ok, msg, _n = compare(name, spark, con, specs[name], str(tmp_path))
        assert ok, f"{name}: {msg}"
    con.close()
