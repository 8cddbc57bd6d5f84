"""Brute-force Python twins + synthetic-structure parity tests for the
round-11 operators and the ADVICE-r10 semantic fixes (isolated-mid-peel
k-core, byte-grid chunk hashing, empty-payload fan-out guards)."""

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
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
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
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    return con


def test_kcore_peels_isolated_mid_peel_nodes(spark, tmp_path):
    """ADVICE r10: a 5-chain's middle node is NOT in the 2-core — after
    the endpoints (round 1) and their neighbors (round 2) peel, it is
    isolated (absent from the degree table entirely) and must peel in
    round 3, not survive with removed_round=0 / core_degree=0. The
    chain is built as 12-token sliding windows (stride 1) over a
    unique-token base: consecutive docs share 9 of 11 3-grams
    (Jaccard 9/13... >= 0.8 via 9/11+2 = 0.818) while stride-2 pairs
    fall to 8/12 = 0.667 < tau. A separate 3-clique (identical triple)
    keeps a genuine 2-core alive for contrast. Both the Spark builder
    and the DuckDB oracle are checked (full comparator), plus a literal
    Python peel replay."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry
    from spark_dba_spark.operators.dedup import (
        K_CORE,
        PEEL_ROUNDS,
        dedup_ngram_jaccard,
        graph_kcore_peel,
    )

    base = [f"c{i}" for i in range(16)]
    texts = [" ".join(base[i:i + 12]) for i in range(5)]  # the 5-chain
    clique = " ".join(f"k{i}" for i in range(12))
    texts += [clique, clique, clique]  # 3-clique: a real 2-core
    texts += [" ".join(f"z{i}_{j}" for j in range(10)) for i in range(4)]
    con = _write_docs(tmp_path, texts)

    specs = registry.all_specs()
    ok, msg, _n = compare(
        "graph_kcore_peel", spark, con, specs["graph_kcore_peel"],
        str(tmp_path),
    )
    con.close()
    assert ok, f"graph_kcore_peel synthetic parity: {msg}"

    # literal replay of synchronous peeling on adjacency sets
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    ]
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(adj) >= {0, 1, 2, 3, 4}, "chain edges must exist"
    assert adj[2] == {1, 3}, "stride-2 pairs must NOT be edges"
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
    got = {
        r["doc_id"]: r
        for r in graph_kcore_peel(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(adj)
    for n in adj:
        assert got[n]["removed_round"] == removed_round.get(n, 0), n
        assert got[n]["core_degree"] == (
            len(alive[n]) if n in alive else 0
        ), n
    # the regression this test exists for: the chain middle peels LATE
    # (isolated-by-peeling), and the clique survives as the 2-core
    assert got[2]["removed_round"] == 3
    assert got[2]["core_degree"] == 0
    assert {got[5]["removed_round"], got[6]["removed_round"],
            got[7]["removed_round"]} == {0}
    assert got[5]["core_degree"] == 2
    # the same chain exercises the sparse-density regime the fixture's
    # all-clique components can't (graph_component_density twin note)
    from spark_dba_spark.operators.dedup import graph_component_density

    dens = {r["component_id"]: r["density_r6"]
            for r in graph_component_density(spark, str(tmp_path)).collect()}
    assert min(dens.values()) < 1.0 <= max(dens.values()) + 1e-9


def test_mm_family_parity_on_non_ascii_corpus(spark, tmp_path):
    """ADVICE r10: the chunk manifest now hashes hex(payload) pairs, so
    multi-byte codepoints keep the hashed slice on the declared byte
    grid. Run the full comparator for the byte-plumbing family on a
    corpus with non-ASCII text (2- and 3-byte UTF-8), byte-exact."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry
    from spark_dba_spark.operators.multimodal import (
        CHUNK_BYTES,
        mm_chunk_manifest,
    )

    texts = [
        "héllo wörld ünïcode " * 12,          # 2-byte codepoints
        "数据 管道 去重 质量 " * 20,            # 3-byte codepoints
        "plain ascii filler text " * 10,
        "mixed ascii → später 混合 content " * 9,
        "tiny",
    ]
    con = _write_docs(tmp_path, texts)
    specs = registry.all_specs()
    for name in (
        "mm_chunk_manifest",
        "mm_payload_byte_histogram",
        "mm_payload_rle_compress",
    ):
        ok, msg, _n = compare(name, spark, con, specs[name], str(tmp_path))
        assert ok, f"{name} non-ascii parity: {msg}"
    con.close()

    # byte-grid replay: chunk_md5 == md5(hex of the BYTE slice)
    got = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in mm_chunk_manifest(spark, str(tmp_path)).collect()
    }
    for doc_id, text in enumerate(texts):
        bs = text.encode("utf-8")
        n_chunks = (len(bs) - 1) // CHUNK_BYTES + 1
        for ci in range(n_chunks):
            r = got[(doc_id, ci)]
            assert r["nbytes"] == min(CHUNK_BYTES,
                                      len(bs) - ci * CHUNK_BYTES)
            chunk = bs[ci * CHUNK_BYTES:(ci + 1) * CHUNK_BYTES]
            assert r["chunk_md5"] == hashlib.md5(
                chunk.hex().upper().encode("ascii")).hexdigest()
    assert len(texts[1].encode("utf-8")) != len(texts[1]), (
        "fixture must actually contain multi-byte codepoints"
    )


def test_empty_payload_fanouts_emit_no_rows(spark, tmp_path):
    """ADVICE r10: Spark sequence(1, 0) descends [1, 0] and
    (0-1) div 128 truncates to 0, so an EMPTY payload used to emit two
    bogus band rows and one bogus chunk where DuckDB emits none. Both
    fan-outs are now n >= 1-guarded: an empty doc contributes zero
    rows to the byte bands and zero manifest chunks, in BOTH engines."""
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry
    from spark_dba_spark.operators.multimodal import (
        _assets,
        mm_chunk_manifest,
        payload_byte_bands,
    )

    sub = tmp_path / "empty"
    sub.mkdir()
    texts = ["", "abc def ghi " * 16, "", "xyz " * 40]
    con = _write_docs(sub, texts)
    specs = registry.all_specs()
    ok, msg, _n = compare(
        "mm_chunk_manifest", spark, con, specs["mm_chunk_manifest"],
        str(sub),
    )
    con.close()
    assert ok, f"mm_chunk_manifest empty-payload parity: {msg}"
    chunks = mm_chunk_manifest(spark, str(sub)).collect()
    assert {r["doc_id"] for r in chunks} == {1, 3}
    bands = payload_byte_bands(_assets(spark, str(sub)))
    n_nonempty_bytes = sum(len(t.encode("utf-8")) for t in texts)
    assert bands.count() == n_nonempty_bytes


# ---------------------------------------------------------------------------
# r11 text-family brute twins
# ---------------------------------------------------------------------------

def _qrem_r6(num: int, den: int) -> float:
    return float((num // den) * 1_000_000
                 + ((num % den) * 2_000_000 + den) // (2 * den)) / 1e6


def test_dup_region_removal_matches_python_brute(spark):
    """Literal replay: covered-position set -> runs -> cut; the cleaned
    text must equal the op's output verbatim, and removed_tokens must
    equal dedup_longest_dup_span's dup_tokens row-for-row (shared
    region frame)."""
    from spark_dba_spark.operators.text import (
        SPAN_W,
        dedup_longest_dup_span,
        text_dup_region_removal,
    )

    rows = _docs_rows()
    owner: dict = {}
    toks: dict = {}
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        toks[doc_id] = ws
        for i in range(max(len(ws) - SPAN_W + 1, 0)):
            owner.setdefault(" ".join(ws[i:i + SPAN_W]), set()).add(doc_id)
    got = {r["doc_id"]: r
           for r in text_dup_region_removal(spark, SF_DIR).collect()}
    spans = {r["doc_id"]: r["dup_tokens"]
             for r in dedup_longest_dup_span(spark, SF_DIR).collect()}
    assert set(got) == set(toks)
    any_cut = False
    for doc_id, ws in toks.items():
        covered: set = set()
        for i in range(max(len(ws) - SPAN_W + 1, 0)):
            if len(owner[" ".join(ws[i:i + SPAN_W])]) >= 2:
                covered.update(range(i, i + SPAN_W))
        kept = [w for i, w in enumerate(ws) if i not in covered]
        r = got[doc_id]
        assert r["n_tokens"] == len(ws)
        assert r["kept_tokens"] == len(kept)
        assert r["removed_tokens"] == len(covered)
        assert r["clean_text"] == " ".join(kept)
        assert r["removed_tokens"] == spans[doc_id], doc_id
        any_cut = any_cut or bool(covered)
    assert any_cut, "fixture must actually remove at least one region"


def test_dsir_importance_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        DSIR_BUCKETS,
        DSIR_TARGET_LANG,
        text_dsir_importance,
    )

    rows = _docs_rows()
    raw: dict = {}
    tgt: dict = {}
    feats_per_doc: dict = {}
    for doc_id, text, lang, _ in rows:
        ws = text.split(" ")
        feats = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        bks = [
            int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS
            for f in feats
        ]
        feats_per_doc[doc_id] = bks
        for b in bks:
            raw[b] = raw.get(b, 0) + 1
            if lang == DSIR_TARGET_LANG:
                tgt[b] = tgt.get(b, 0) + 1
    got = {r["doc_id"]: r
           for r in text_dsir_importance(spark, SF_DIR).collect()}
    assert set(got) == set(feats_per_doc)
    seen_zero = seen_pos = False
    for doc_id, bks in feats_per_doc.items():
        tm = sum(tgt.get(b, 0) for b in bks)
        rm = sum(raw[b] for b in bks)
        r = got[doc_id]
        assert (r["n_feats"], r["tgt_mass"], r["raw_mass"]) == (
            len(bks), tm, rm)
        assert r["w_ratio_r6"] == _qrem_r6(tm, rm)
        seen_zero = seen_zero or r["w_ratio_r6"] > 0
        seen_pos = seen_pos or r["w_ratio_r6"] < 1
    assert seen_zero and seen_pos
    ratios = [r["w_ratio_r6"] for r in got.values()]
    assert min(ratios) < max(ratios), "weights must vary across docs"


def test_dsir_importance_separates_synthetic_domains(spark, tmp_path):
    """On a corpus where the target-domain docs actually use a distinct
    vocabulary (the fixture's langs share one vocab, so mass ratios
    there sit in a narrow band by construction), DSIR weights must
    cleanly separate: every in-domain doc outweighs every out-of-domain
    doc, and the comparator passes on the synthetic table too."""
    import random
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry
    from spark_dba_spark.operators.text import text_dsir_importance

    rng = random.Random(7)
    med = [f"med{i}" for i in range(30)]   # target-domain vocabulary
    web = [f"web{i}" for i in range(30)]
    texts, langs = [], []
    for i in range(60):
        if i % 3 == 0:
            texts.append(" ".join(rng.choice(med) for _ in range(30)))
            langs.append("en")             # target slice: medical English
        else:
            texts.append(" ".join(rng.choice(web) for _ in range(30)))
            langs.append("de")
    con = _write_docs(tmp_path, texts, langs=langs)
    specs = registry.all_specs()
    ok, msg, _n = compare(
        "text_dsir_importance", spark, con,
        specs["text_dsir_importance"], str(tmp_path),
    )
    con.close()
    assert ok, f"dsir synthetic parity: {msg}"
    got = {r["doc_id"]: r["w_ratio_r6"]
           for r in text_dsir_importance(spark, str(tmp_path)).collect()}
    in_dom = [got[i] for i in range(60) if i % 3 == 0]
    out_dom = [got[i] for i in range(60) if i % 3 != 0]
    # hashed buckets collide (512 buckets, 2 vocabularies), so the gap
    # is a multiple, not infinite: measured ~4.5x on this seed
    assert min(in_dom) > max(out_dom) * 3, (
        "in-domain docs must dominate out-of-domain weights"
    )


def test_tokenizer_fertility_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        SUBWORD_W,
        text_tokenizer_fertility,
    )

    rows = _docs_rows()
    agg: dict = {}
    for _, text, _, source in rows:
        ws = text.split(" ")
        a = agg.setdefault(source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(ws)
        a[2] += sum((len(w) + SUBWORD_W - 1) // SUBWORD_W for w in ws)
        a[3] += len(text.encode("utf-8"))
    got = {r["source"]: r
           for r in text_tokenizer_fertility(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for src, (nd, nw, nsw, nb) in agg.items():
        r = got[src]
        assert (r["n_docs"], r["n_words"], r["n_subwords"],
                r["n_bytes"]) == (nd, nw, nsw, nb)
        assert r["fertility_r6"] == _r6(nsw, nw)
        assert r["bytes_per_token_r6"] == _r6(nb, nsw)
        assert nsw > nw, "subword proxy must actually split words"


def test_gopher_gates_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        GOPHER_MEAN_LEN_HI,
        GOPHER_MEAN_LEN_LO,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORDS,
        GOPHER_MAX_WORDS,
        GOPHER_REP_DEN,
        STOPWORDS,
        text_gopher_gates,
    )

    rows = _docs_rows()
    got = {r["doc_id"]: r for r in text_gopher_gates(spark, SF_DIR).collect()}
    outcomes = set()
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        n = len(ws)
        chars = sum(len(w) for w in ws)
        stops = len(set(ws) & set(STOPWORDS))
        maxc = max(ws.count(d) for d in set(ws))
        r1 = GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
        r2 = GOPHER_MEAN_LEN_LO * n <= chars <= GOPHER_MEAN_LEN_HI * n
        r3 = stops >= GOPHER_MIN_STOPWORDS
        r4 = GOPHER_REP_DEN * maxc <= n
        r = got[doc_id]
        assert (r["r1_wordcount"], r["r2_meanlen"], r["r3_stopwords"],
                r["r4_repetition"]) == (r1, r2, r3, r4), doc_id
        assert r["pass_all"] == (r1 and r2 and r3 and r4)
        outcomes.add((r1, r2, r3, r4))
    assert len(outcomes) > 2, "fixture must exercise mixed rule outcomes"


def test_rarity_outliers_matches_python_brute(spark):
    from spark_dba_spark.operators.text import RARE_DF, text_rarity_outliers

    rows = _docs_rows()
    df: dict = {}
    for doc_id, text, _, _ in rows:
        for w in set(text.split(" ")):
            df[w] = df.get(w, 0) + 1
    got = {r["doc_id"]: r
           for r in text_rarity_outliers(spark, SF_DIR).collect()}
    any_rare = False
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        rare = sum(1 for w in ws if df[w] <= RARE_DF)
        bits = sum(df[w].bit_length() for w in ws)
        r = got[doc_id]
        assert (r["n_tokens"], r["rare_tokens"]) == (len(ws), rare)
        assert r["rare_share_r6"] == _r6(rare, len(ws))
        assert r["mean_df_bits_r6"] == _r6(bits, len(ws))
        any_rare = any_rare or rare > 0
    # the fixture vocab is small and shared, so min df can exceed
    # RARE_DF at the tiny SF — the rarity signal must still VARY
    bit_means = {r["mean_df_bits_r6"] for r in got.values()}
    assert len(bit_means) > 1, "df-bit profile must vary across docs"


def test_rarity_outliers_fires_on_synthetic_rare_tokens(spark, tmp_path):
    """A corpus with genuinely rare tokens (typos/OCR noise appearing in
    one doc each) must light up rare_share for exactly those docs."""
    from spark_dba_spark.operators.text import text_rarity_outliers

    common = " ".join(f"w{i % 8}" for i in range(20))
    texts = [common] * 10 + [common + f" zq{i}x glitch{i}" for i in range(3)]
    con = _write_docs(tmp_path, texts)
    con.close()
    got = {r["doc_id"]: r
           for r in text_rarity_outliers(spark, str(tmp_path)).collect()}
    for doc_id in range(10):
        assert got[doc_id]["rare_tokens"] == 0
    for doc_id in range(10, 13):
        assert got[doc_id]["rare_tokens"] == 2, doc_id


def test_simpson_concentration_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.text import text_simpson_concentration

    rows = _docs_rows()
    per_src: dict = {}
    for _, text, _, source in rows:
        per_src.setdefault(source, Counter()).update(text.split(" "))
    got = {r["source"]: r
           for r in text_simpson_concentration(spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for src, c in per_src.items():
        n = sum(c.values())
        coll = sum(v * (v - 1) for v in c.values())
        r = got[src]
        assert (r["n_tokens"], r["vocab"], r["top_count"]) == (
            n, len(c), max(c.values()))
        assert r["simpson_r6"] == _r6(coll, n * (n - 1))
        assert r["top_share_r6"] == _r6(max(c.values()), n)
        assert 0 < coll < n * (n - 1), "non-degenerate concentration"


def test_chi_square_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.text import (
        stats_chi_square_source_length,
    )

    rows = _docs_rows()
    cells = Counter()
    for _, text, _, source in rows:
        band = len(text.split(" ")).bit_length()
        cells[(source, band)] += 1
    rs = Counter()
    cs = Counter()
    for (s, b), n in cells.items():
        rs[s] += n
        cs[b] += n
    big_n = sum(cells.values())
    got = {(r["source"], r["band"]): r
           for r in stats_chi_square_source_length(spark, SF_DIR).collect()}
    assert set(got) == {(s, b) for s in rs for b in cs}, "dense spine"
    saw_zero_cell = False
    for (s, b), r in got.items():
        o = cells.get((s, b), 0)
        assert (r["n_obs"], r["row_total"], r["col_total"]) == (
            o, rs[s], cs[b])
        assert r["exp_r6"] == _qrem_r6(rs[s] * cs[b], big_n)
        num = (o * big_n - rs[s] * cs[b]) ** 2
        assert r["chi2_cell_r6"] == _qrem_r6(num, rs[s] * cs[b] * big_n)
        saw_zero_cell = saw_zero_cell or o == 0
    assert saw_zero_cell, "dense spine must include zero-observed cells"


def test_contamination_by_source_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        SPAN_EVAL_MOD,
        SPAN_W,
        doc_span_decontamination,
        text_contamination_by_source,
    )

    rows = _docs_rows()
    ev_fps: set = set()
    for doc_id, text, _, _ in rows:
        if doc_id % SPAN_EVAL_MOD == 0:
            ws = text.split(" ")
            for i in range(max(len(ws) - SPAN_W + 1, 0)):
                ev_fps.add(" ".join(ws[i:i + SPAN_W]))
    per_src: dict = {}
    for doc_id, text, _, source in rows:
        if doc_id % SPAN_EVAL_MOD == 0:
            continue
        a = per_src.setdefault(source, [0, 0, 0, 0])  # docs, wins, hits, cdocs
        a[0] += 1
        ws = text.split(" ")
        hits = 0
        wins = max(len(ws) - SPAN_W + 1, 0)
        for i in range(wins):
            if " ".join(ws[i:i + SPAN_W]) in ev_fps:
                hits += 1
        a[1] += wins
        a[2] += hits
        a[3] += 1 if hits else 0
    got = {r["source"]: r
           for r in text_contamination_by_source(spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for src, (nd, nw, nh, nc) in per_src.items():
        r = got[src]
        assert (r["n_train_docs"], r["n_windows"], r["n_eval_hits"],
                r["n_contaminated_docs"]) == (nd, nw, nh, nc)
        assert r["hit_share_r6"] == _r6(nh, max(nw, 1))
    # grain consistency: source-rollup hits == doc-rollup hits
    doc_hits = sum(r["n_eval_hits"]
                   for r in doc_span_decontamination(spark, SF_DIR).collect())
    assert doc_hits == sum(a[2] for a in per_src.values())
    assert doc_hits > 0, "fixture must contain actual contamination"


# ---------------------------------------------------------------------------
# r11 dedup/graph brute twins
# ---------------------------------------------------------------------------

MERSENNE31 = 2_147_483_647


def _minhash_sig(shingles, perms):
    hp = [
        (
            int(hashlib.md5(s.encode()).hexdigest()[0:7], 16),
            1 + int(hashlib.md5(s.encode()).hexdigest()[8:15], 16),
        )
        for s in shingles
    ]
    return [
        min((h0 + s * h1) % MERSENNE31 for h0, h1 in hp)
        for s in range(perms)
    ]


def test_paragraph_minhash_matches_python_brute(spark):
    """Full pipeline replay: block grid, 3-gram shingles, 16-perm
    signatures, 4x4 banding, cross-doc candidates, exact-Jaccard
    verify — pair-for-pair equality, plus band-coverage containment
    (every emitted pair must share at least one band key)."""
    from spark_dba_spark.operators.dedup import (
        NGRAM,
        PARA_BANDS,
        PARA_PERMS,
        PARA_R,
        PARA_TAU,
        PARA_W,
        dedup_paragraph_minhash,
    )

    rows = _docs_rows()
    blocks: dict = {}
    for doc_id, text, _, _ in rows:
        ws = text.split(" ")
        n_blk = (len(ws) + PARA_W - 1) // PARA_W
        for b in range(n_blk):
            bt = ws[b * PARA_W:(b + 1) * PARA_W]
            if len(bt) >= NGRAM:
                sh = list(dict.fromkeys(
                    " ".join(bt[i:i + NGRAM])
                    for i in range(len(bt) - NGRAM + 1)
                ))
                blocks[(doc_id, b)] = sh
    sigs = {k: _minhash_sig(sh, PARA_PERMS) for k, sh in blocks.items()}
    buckets: dict = {}
    for k, sig in sigs.items():
        for b in range(PARA_BANDS):
            key = (b, tuple(sig[b * PARA_R:(b + 1) * PARA_R]))
            buckets.setdefault(key, []).append(k)
    expect = {}
    for key, members in buckets.items():
        for i, ka in enumerate(members):
            for kb in members[i + 1:]:
                a, b = (ka, kb) if ka[0] < kb[0] else (kb, ka)
                if a[0] == b[0]:
                    continue
                sa, sb = set(blocks[a]), set(blocks[b])
                j = len(sa & sb) / len(sa | sb)
                if j >= PARA_TAU:
                    expect[(a[0], a[1], b[0], b[1])] = j
    got = {
        (r["doc_a"], r["blk_a"], r["doc_b"], r["blk_b"]): r["jaccard"]
        for r in dedup_paragraph_minhash(spark, SF_DIR).collect()
    }
    assert got == {k: v for k, v in expect.items()} or all(
        abs(got[k] - expect[k]) < 1e-12 for k in set(got) | set(expect)
    )
    assert len(got) > 0, "fixture must contain paragraph-level dups"


def test_cross_source_matrix_matches_python_brute(spark):
    from spark_dba_spark.operators.dedup import (
        dedup_cross_source_matrix,
        dedup_ngram_jaccard,
    )

    src = {d: s for d, _, _, s in _docs_rows()}
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    ]
    cells: dict = {}
    for a, b in edges:
        lo, hi = sorted((src[a], src[b]))
        cells[(lo, hi)] = cells.get((lo, hi), 0) + 1
    tot = sum(cells.values())
    got = {
        (r["src_lo"], r["src_hi"]): r
        for r in dedup_cross_source_matrix(spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for k, n in cells.items():
        r = got[k]
        assert r["n_pairs"] == n
        assert r["within_source"] == (k[0] == k[1])
        assert r["pair_share_r6"] == _r6(n, tot)
    assert any(k[0] != k[1] for k in cells), "cross-source cells exist"


def test_component_density_matches_python_brute(spark):
    from spark_dba_spark.operators.dedup import (
        dedup_ngram_jaccard,
        graph_component_density,
    )

    edges = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_nodes: dict = {}
    for n in parent:
        comp_nodes.setdefault(find(n), set()).add(n)
    comp_edges: dict = {}
    for a, b in edges:
        comp_edges[find(a)] = comp_edges.get(find(a), 0) + 1
    got = {r["component_id"]: r
           for r in graph_component_density(spark, SF_DIR).collect()}
    assert set(got) == set(comp_nodes)
    densities = set()
    for cid, nodes in comp_nodes.items():
        n, e = len(nodes), comp_edges[cid]
        r = got[cid]
        assert (r["n_nodes"], r["n_edges"]) == (n, e)
        assert r["density_r6"] == _r6(2 * e, n * (n - 1))
        densities.add(r["density_r6"])
    # the tiny SF's components are all cliques (density 1.0); the
    # sparse/chain regime is exercised by the synthetic 5-chain test
    assert densities and max(densities) <= 1.0
    assert any(r["n_nodes"] >= 3 for r in got.values()), (
        "fixture must contain a multi-node component"
    )


# ---------------------------------------------------------------------------
# r11 similarity brute twins
# ---------------------------------------------------------------------------

def _emb_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]), label FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    return rows


def test_ivfpq_compound_matches_numpy_brute(spark):
    """Integer replay of the whole compound path: grid quantization,
    per-subspace codes (argmin to lowest id), query LUTs, IVF probe
    routing, ADC sums, the per-(query, list) (adc_d2, vec_id)
    shortlist cut, and the exact-cosine refine ranking (VERDICT r11
    #3) — exact equality."""
    from spark_dba_spark.operators.similarity import (
        EMB_DIM,
        IVF_CENTROIDS,
        IVF_NPROBE,
        IVFPQ_RERANK_PER_LIST,
        KM_QUANT,
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        TOP_K,
        sim_ivfpq_compound,
    )

    rows = _emb_rows()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    qv = np.trunc(m * KM_QUANT).astype(np.int64)
    # IVF routing on raw float cosines (the _ivf_structures convention)
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    cmask = ids < IVF_CENTROIDS
    cn, cids = norm[cmask], ids[cmask]
    assign = cids[np.argmax(norm @ cn.T, axis=1)]
    qmask = ids < N_QUERIES
    probe_lists = {}
    for qi, qid in zip(np.where(qmask)[0], ids[qmask]):
        order = np.argsort(-(norm[qi] @ cn.T), kind="stable")[:IVF_NPROBE]
        probe_lists[int(qid)] = set(int(cids[c]) for c in order)
    # PQ codes + LUT
    cb = qv[ids < PQ_K].reshape(PQ_K, PQ_M, PQ_SUBDIM)
    vq = qv.reshape(len(ids), PQ_M, PQ_SUBDIM)
    codes = np.empty((len(ids), PQ_M), dtype=np.int64)
    for sub in range(PQ_M):
        d = ((vq[:, None, sub, :] - cb[None, :, sub, :]) ** 2).sum(axis=2)
        codes[:, sub] = np.argmin(d, axis=1)
    expect = {}
    for qid, plists in probe_lists.items():
        qi = int(np.where(ids == qid)[0][0])
        lut = ((vq[qi][None, :, :] - cb) ** 2).sum(axis=2)  # (PQ_K, PQ_M)
        per_list: dict[int, list] = {c: [] for c in plists}
        for vi, vid in enumerate(ids):
            if vid == qid or int(assign[vi]) not in plists:
                continue
            adc = int(sum(lut[codes[vi, s], s] for s in range(PQ_M)))
            per_list[int(assign[vi])].append((adc, int(vid)))
        shortlist = []
        for c, cand in per_list.items():
            cand.sort()
            shortlist.extend(cand[:IVFPQ_RERANK_PER_LIST])
        # exact-cosine refine over the shortlist (float64, same
        # evaluation as the JVM fold / DuckDB list_cosine_similarity)
        refined = []
        for adc, vid in shortlist:
            vi = int(np.where(ids == vid)[0][0])
            sim = float(
                (m[qi] @ m[vi])
                / (np.linalg.norm(m[qi]) * np.linalg.norm(m[vi]))
            )
            refined.append((-sim, vid, adc))
        refined.sort()
        for rank, (negsim, vid, adc) in enumerate(refined[:TOP_K], 1):
            expect[(qid, rank)] = (vid, adc, round(-negsim, 4))
    got = {
        (r["qid"], r["rank"]): (r["vec_id"], r["adc_d2"], r["sim_r4"])
        for r in sim_ivfpq_compound(spark, SF_DIR).collect()
    }
    assert got == expect
    assert len(got) == N_QUERIES * TOP_K


def test_binary_hamming_matches_python_brute(spark):
    from spark_dba_spark.operators.similarity import (
        EMB_DIM,
        N_QUERIES,
        TOP_K,
        emb_binary_hamming_topk,
    )

    rows = _emb_rows()
    sk = {}
    for vid, emb, _ in rows:
        w0 = sum(1 << d for d in range(32) if emb[d] > 0)
        w1 = sum(1 << d for d in range(32) if emb[32 + d] > 0)
        sk[vid] = (w0, w1)
    expect = {}
    for qid in [v for v in sk if v < N_QUERIES]:
        qw0, qw1 = sk[qid]
        cand = sorted(
            (bin((qw0 ^ w0)).count("1") + bin((qw1 ^ w1)).count("1"), vid)
            for vid, (w0, w1) in sk.items() if vid != qid
        )
        for rank, (h, vid) in enumerate(cand[:TOP_K], 1):
            expect[(qid, rank)] = (vid, h)
    got = {
        (r["qid"], r["rank"]): (r["vec_id"], r["hamming"])
        for r in emb_binary_hamming_topk(spark, SF_DIR).collect()
    }
    assert got == expect
    hams = [h for _, h in expect.values()]
    assert min(hams) < max(hams), "hamming distances must vary"


def test_knn_homophily_matches_numpy_brute(spark):
    from spark_dba_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        emb_knn_label_homophily,
    )

    rows = _emb_rows()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    lab = {r[0]: r[2] for r in rows}
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    agg: dict = {}
    for qi in np.where(ids < N_QUERIES)[0]:
        qid = int(ids[qi])
        sims = norm @ norm[qi]
        order = sorted(
            (float(-sims[vi]), int(ids[vi]))
            for vi in range(len(ids)) if ids[vi] != qid
        )[:TOP_K]
        a = agg.setdefault(lab[qid], [set(), 0, 0])
        a[0].add(qid)
        for _, vid in order:
            a[1] += 1
            a[2] += 1 if lab[vid] == lab[qid] else 0
    got = {r["label"]: r
           for r in emb_knn_label_homophily(spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for lb, (qs, nn, ns) in agg.items():
        r = got[lb]
        assert (r["n_queries"], r["n_neighbors"], r["n_same_label"]) == (
            len(qs), nn, ns)
        assert r["homophily_r6"] == _r6(ns, nn)


def test_norm_profile_and_centroid_shift_match_python_brute(spark):
    from spark_dba_spark.operators.similarity import (
        KM_QUANT,
        emb_centroid_shift_ab,
        emb_norm_profile_by_label,
    )

    rows = _emb_rows()
    prof: dict = {}
    sums: dict = {}
    for vid, emb, lb in rows:
        q = [int(np.trunc(x * KM_QUANT)) for x in emb]
        n2 = sum(v * v for v in q)
        p = prof.setdefault(lb, [])
        p.append(n2)
        h = vid % 2
        s = sums.setdefault((lb, h), [np.zeros(len(q), dtype=object), 0])
        s[0] += np.array(q, dtype=object)
        s[1] += 1
    got = {r["label"]: r
           for r in emb_norm_profile_by_label(spark, SF_DIR).collect()}
    for lb, n2s in prof.items():
        r = got[lb]
        assert (r["n_vecs"], r["min_q2"], r["max_q2"], r["total_q2"]) == (
            len(n2s), min(n2s), max(n2s), sum(n2s))
        assert r["mean_q2_r6"] == _qrem_r6(sum(n2s), len(n2s))

    def micro(s, n):
        return (s * 2_000_000 + n) // (2 * n) if s >= 0 else -(
            (-s * 2_000_000 + n) // (2 * n))

    gshift = {r["label"]: r
              for r in emb_centroid_shift_ab(spark, SF_DIR).collect()}
    for lb in prof:
        sa, na = sums[(lb, 0)]
        sb, nb = sums[(lb, 1)]
        diffs = [abs(micro(int(a), na) - micro(int(b), nb))
                 for a, b in zip(sa, sb)]
        r = gshift[lb]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["l1_shift_micro"] == sum(diffs)
        assert r["max_dim_shift_micro"] == max(diffs)
        assert r["l1_shift_micro"] > 0, "halves differ on a real fixture"


# ---------------------------------------------------------------------------
# r11 temporal brute twins
# ---------------------------------------------------------------------------

def _events_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, epoch_us(ts), user_id, event_type, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet') ORDER BY 2, 1"
    ).fetchall()
    con.close()
    return rows


def test_haar_energy_matches_python_brute(spark):
    from spark_dba_spark.operators.temporal import (
        HAAR_LEVELS,
        ev_haar_energy_hourly,
    )

    rows = _events_rows()
    hour_us = 3_600_000_000
    counts: dict = {}
    for _, ts_us, _, _, _ in rows:
        counts[ts_us // hour_us] = counts.get(ts_us // hour_us, 0) + 1
    h0 = min(counts)
    t_hours = max(counts) - h0 + 1
    series = [counts.get(h0 + i, 0) for i in range(t_hours)]
    got = {r["level"]: r
           for r in ev_haar_energy_hourly(spark, SF_DIR).collect()}
    assert set(got) == set(range(1, HAAR_LEVELS + 1))
    energies = []
    for lv in range(1, HAAR_LEVELS + 1):
        blk_w = 1 << lv
        n_blocks = t_hours // blk_w
        details = []
        active = 0
        for b in range(n_blocks):
            seg = series[b * blk_w:(b + 1) * blk_w]
            details.append(sum(seg[: blk_w // 2]) - sum(seg[blk_w // 2:]))
            active += 1 if any(seg) else 0
        r = got[lv]
        # n_active_blocks counts event-bearing blocks; empty blocks have
        # detail 0 and are not materialized (sparse hourly frame)
        assert r["n_active_blocks"] == active
        assert r["energy"] == sum(d * d for d in details)
        assert r["max_abs_detail"] == max(abs(d) for d in details)
        energies.append(r["energy"])
    assert any(e > 0 for e in energies), "series must carry structure"


def test_value_records_matches_python_brute(spark):
    from spark_dba_spark.operators.temporal import ev_value_records

    rows = _events_rows()
    per_user: dict = {}
    for eid, ts_us, uid, _, v in rows:
        per_user.setdefault(uid, []).append((ts_us, eid, v))
    got = {r["user_id"]: r
           for r in ev_value_records(spark, SF_DIR).collect()}
    assert set(got) == set(per_user)
    for uid, evs in per_user.items():
        evs.sort()
        best = None
        n_rec, last_rec = 0, None
        for ts_us, _, v in evs:
            if best is None or v > best:
                best, n_rec, last_rec = v, n_rec + 1, ts_us
        r = got[uid]
        assert (r["n_events"], r["n_records"]) == (len(evs), n_rec)
        assert r["max_value"] == best
        assert r["last_record_us"] == last_rec
        assert 1 <= n_rec < len(evs), "records strictly between 1 and n"


def test_hourly_percentiles_match_python_brute(spark):
    from spark_dba_spark.operators.temporal import (
        HOURLY_PCTS,
        ev_hourly_value_percentiles,
    )

    rows = _events_rows()
    hour_us = 3_600_000_000
    per_hour: dict = {}
    for eid, ts_us, _, _, v in rows:
        per_hour.setdefault(ts_us // hour_us, []).append((v, eid))
    got = {(r["win_start"], r["pct"]): r
           for r in ev_hourly_value_percentiles(spark, SF_DIR).collect()}
    assert len(got) == len(per_hour) * len(HOURLY_PCTS)
    for key, vals in per_hour.items():
        vals.sort()
        n = len(vals)
        for pct in HOURLY_PCTS:
            rank = (pct * n + 99) // 100
            want = vals[rank - 1][0]
            match = [r for (ws, p), r in got.items()
                     if p == pct and int(ws.timestamp() * 1e6) // hour_us
                     == key]
            assert len(match) == 1
            assert match[0]["n_events"] == n
            assert match[0]["pct_value"] == want


# ---------------------------------------------------------------------------
# r11 relational brute twins
# ---------------------------------------------------------------------------

def test_value_deciles_match_python_brute(spark):
    from spark_dba_spark.operators.relational import customer_value_deciles

    con = duckdb.connect()
    custs = [r[0] for r in con.execute(
        f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()]
    orders = con.execute(
        f"SELECT o_custkey, o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    import math

    spend = {c: 0 for c in custs}
    for ck, tp in orders:
        if ck in spend:
            spend[ck] += int(math.floor(tp * 100 + 0.5))
    ordered = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ordered)
    # ANSI NTILE fill: first (n % 10) tiles get ceil(n/10) rows
    sizes = [n // 10 + (1 if i < n % 10 else 0) for i in range(10)]
    deciles: dict = {}
    idx = 0
    for d, sz in enumerate(sizes, 1):
        chunk = ordered[idx:idx + sz]
        idx += sz
        deciles[d] = (len(chunk), sum(c for _, c in chunk))
    total = sum(v for _, v in deciles.values())
    got = {r["decile"]: r
           for r in customer_value_deciles(spark, SF_DIR).collect()}
    cum = 0
    for d in range(1, 11):
        nc, cents = deciles[d]
        cum += cents
        r = got[d]
        assert (r["n_customers"], r["rev_cents"]) == (nc, cents)
        assert r["rev_share_r6"] == _r6(cents, total)
        assert r["cum_share_r6"] == _r6(cum, total)
    assert got[10]["rev_cents"] > got[1]["rev_cents"], "Lorenz must bend"


def test_levene_matches_python_brute(spark):
    from spark_dba_spark.operators.relational import stats_levene_brand_price

    con = duckdb.connect()
    parts = con.execute(
        f"SELECT p_partkey, p_brand, p_retailprice FROM "
        f"read_parquet('{SF_DIR}/part.parquet')"
    ).fetchall()
    con.close()
    import math

    grp: dict = {}
    for pk, br, pr in parts:
        grp.setdefault(br, []).append((int(math.floor(pr + 0.5)), pk))
    z_by_brand: dict = {}
    for br, xs in grp.items():
        xs.sort()
        med = xs[(len(xs) + 1) // 2 - 1][0]
        z_by_brand[br] = [abs(x - med) for x, _ in xs]
    k = len(z_by_brand)
    n_total = sum(len(z) for z in z_by_brand.values())
    z_total = sum(sum(z) for z in z_by_brand.values())
    m_c2 = (z_total * 200 + n_total) // (2 * n_total)
    b_c4 = w_c4 = 0
    for br, zs in z_by_brand.items():
        zi, ni = sum(zs), len(zs)
        mi = (zi * 200 + ni) // (2 * ni)
        b_c4 += ni * (mi - m_c2) ** 2
        w_c4 += sum((z * 100 - mi) ** 2 for z in zs)
    [r] = stats_levene_brand_price(spark, SF_DIR).collect()
    assert (r["k_groups"], r["n_total"]) == (k, n_total)
    assert (r["between_ss_c4"], r["within_ss_c4"]) == (b_c4, w_c4)
    assert r["f_stat_r6"] == _qrem_r6(b_c4 * (n_total - k), w_c4 * (k - 1))
    assert w_c4 > 0 and b_c4 > 0, "both variance components non-trivial"


def test_yoy_growth_matches_python_brute(spark):
    from spark_dba_spark.operators.relational import orders_yoy_growth

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT EXTRACT(year FROM o_orderdate), "
        f"EXTRACT(month FROM o_orderdate), o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    import math

    monthly: dict = {}
    for yr, mon, tp in orders:
        k = (int(yr), int(mon))
        monthly[k] = monthly.get(k, 0) + int(math.floor(tp * 100 + 0.5))
    got = {(r["yr"], r["mon"]): r
           for r in orders_yoy_growth(spark, SF_DIR).collect()}
    expect_keys = {(y, m) for (y, m) in monthly if (y - 1, m) in monthly}
    assert set(got) == expect_keys
    saw_neg = saw_pos = False
    for (y, m), r in got.items():
        cur, prev = monthly[(y, m)], monthly[(y - 1, m)]
        assert (r["rev_cents"], r["prev_rev_cents"]) == (cur, prev)
        d = cur - prev
        sgn = 1 if d >= 0 else -1
        want = sgn * float((abs(d) * 2_000_000 + prev) // (2 * prev)) / 1e6
        assert r["yoy_growth_r6"] == want
        saw_neg, saw_pos = saw_neg or d < 0, saw_pos or d > 0
    assert saw_neg and saw_pos, "growth must exercise both signs"


def test_cms_heavy_change_matches_python_brute(spark):
    from spark_dba_spark.operators.relational import (
        CMS_D,
        CMS_SPLIT_DATE,
        CMS_TOP,
        CMS_W,
        sketch_cms_heavy_change,
    )

    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_partkey, l_shipdate < TIMESTAMP '{CMS_SPLIT_DATE}' FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()
    con.close()
    true_a: dict = {}
    true_b: dict = {}
    for pk, in_a in li:
        (true_a if in_a else true_b)[pk] = (
            (true_a if in_a else true_b).get(pk, 0) + 1
        )
    keys = set(true_a) | set(true_b)

    def bkt(pk, j):
        return int(hashlib.md5(f"{pk}:cms:{j}".encode()
                               ).hexdigest()[:7], 16) % CMS_W

    counters_a: dict = {}
    counters_b: dict = {}
    for pk in keys:
        for j in range(CMS_D):
            kk = (j, bkt(pk, j))
            counters_a[kk] = counters_a.get(kk, 0) + true_a.get(pk, 0)
            counters_b[kk] = counters_b.get(kk, 0) + true_b.get(pk, 0)
    probe = sorted(
        keys,
        key=lambda pk: (-abs(true_a.get(pk, 0) - true_b.get(pk, 0)), pk),
    )[:CMS_TOP]
    got = {r["l_partkey"]: r
           for r in sketch_cms_heavy_change(spark, SF_DIR).collect()}
    assert set(got) == set(probe)
    any_over = False
    for pk in probe:
        ta, tb = true_a.get(pk, 0), true_b.get(pk, 0)
        ca = min(counters_a[(j, bkt(pk, j))] for j in range(CMS_D))
        cb = min(counters_b[(j, bkt(pk, j))] for j in range(CMS_D))
        r = got[pk]
        assert (r["true_a"], r["true_b"], r["cms_a"], r["cms_b"]) == (
            ta, tb, ca, cb)
        assert r["est_change"] == abs(ca - cb)
        assert r["true_change"] == abs(ta - tb)
        assert ca >= ta and cb >= tb, "CMS never underestimates"
        any_over = any_over or ca > ta or cb > tb
    assert any_over, "collisions must actually occur at this width"


def test_kmv_distinct_matches_python_brute(spark):
    from spark_dba_spark.operators.relational import (
        KMV_HEX,
        KMV_K,
        sketch_kmv_distinct,
    )

    rows = _docs_rows()
    per_src: dict = {}
    for _, text, _, source in rows:
        h = int(hashlib.md5(text.encode()).hexdigest()[:KMV_HEX], 16)
        per_src.setdefault(source, set()).add(h)
    got = {r["source"]: r
           for r in sketch_kmv_distinct(spark, SF_DIR).collect()}
    scale = 1 << (4 * KMV_HEX)

    def expected(hashes):
        pool = sorted(hashes)[:KMV_K]
        k_used, kth = len(pool), max(pool)
        est = k_used if k_used < KMV_K else (KMV_K - 1) * scale // kth
        return k_used, kth, est

    all_hashes = set()
    for src, hs in per_src.items():
        all_hashes |= hs
        k_used, kth, est = expected(hs)
        r = got[src]
        assert (r["k_used"], r["kth_hash"], r["est_distinct"]) == (
            k_used, kth, est), src
    k_used, kth, est = expected(all_hashes)
    r = got["__ALL__"]
    assert (r["k_used"], r["kth_hash"], r["est_distinct"]) == (
        k_used, kth, est)
    assert k_used == KMV_K, "the union row must engage the estimator"
    n_true = len(all_hashes)
    assert abs(est - n_true) <= 0.6 * n_true, (est, n_true)


# ---------------------------------------------------------------------------
# r11 multimodal brute twins
# ---------------------------------------------------------------------------

def _media_type(doc_id):
    return ("image", "audio", "video")[doc_id % 3]


def test_entropy_proxy_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.multimodal import mm_payload_entropy_proxy

    rows = _docs_rows()
    got = {r["doc_id"]: r
           for r in mm_payload_entropy_proxy(spark, SF_DIR).collect()}
    assert set(got) == {d for d, _, _, _ in rows}
    for doc_id, text, _, _ in rows:
        bs = text.encode("utf-8")
        c = Counter(bs)
        n = len(bs)
        coll = sum(v * (v - 1) for v in c.values())
        r = got[doc_id]
        assert (r["n_bytes"], r["distinct_bytes"], r["top_byte_count"]) == (
            n, len(c), max(c.values()))
        assert r["collision_r6"] == _r6(coll, n * (n - 1))
        # text payloads sit far above the 1/256 uniform floor
        assert r["collision_r6"] > 1.0 / 256


def test_magic_profile_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.multimodal import mm_payload_magic_profile

    rows = _docs_rows()
    cells: dict = {}
    for doc_id, text, _, _ in rows:
        bs = text.encode("utf-8")
        if len(bs) < 2:
            continue
        k = (_media_type(doc_id), bs[:2].hex().upper())
        a = cells.setdefault(k, [0, None, None])
        a[0] += 1
        a[1] = len(bs) if a[1] is None else min(a[1], len(bs))
        a[2] = len(bs) if a[2] is None else max(a[2], len(bs))
    tot = Counter()
    for (mt, _), (n, _, _) in cells.items():
        tot[mt] += n
    got = {(r["media_type"], r["magic_hex"]): r
           for r in mm_payload_magic_profile(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for k, (n, lo, hi) in cells.items():
        r = got[k]
        assert (r["n_assets"], r["min_bytes"], r["max_bytes"]) == (n, lo, hi)
        assert r["type_share_r6"] == _r6(n, tot[k[0]])
    assert len({k[1] for k in cells}) > 1, "multiple magic signatures"


def test_byte_bigram_topk_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.multimodal import (
        BIGRAM_TOP,
        mm_byte_bigram_topk,
    )

    rows = _docs_rows()
    cnt: dict = {}
    tot = Counter()
    for doc_id, text, _, _ in rows:
        bs = text.encode("utf-8")
        mt = _media_type(doc_id)
        for i in range(len(bs) - 1):
            bg = bs[i:i + 2].hex().upper()
            cnt.setdefault(mt, Counter())[bg] += 1
            tot[mt] += 1
    got = {(r["media_type"], r["rank"]): r
           for r in mm_byte_bigram_topk(spark, SF_DIR).collect()}
    for mt, c in cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:BIGRAM_TOP]
        for rank, (bg, n) in enumerate(top, 1):
            r = got[(mt, rank)]
            assert (r["bigram_hex"], r["n_occurrences"]) == (bg, n)
            assert r["bigram_share_r6"] == _r6(n, tot[mt])
    assert len(got) == 3 * BIGRAM_TOP


def test_ivfpq_recall_floor_clustered(spark, tmp_path):
    """Committed IVF-PQ defaults must clear recall@10 >= 0.9 on the
    clustered (realistic) fixture — the same gate the LSH / IVF /
    multiprobe defaults carry (on the structure-free random fixture PQ
    code error dominates and recall is a documented worst-case lower
    bound, recorded in RECALL_r11.json)."""
    import sys

    sys.path.insert(0, "tools")
    from recall_report import pairs, write_clustered_fixture

    from spark_dba_spark.operators import similarity as S

    cdir = write_clustered_fixture(str(tmp_path))
    brute = pairs(S.sim_cosine_topk(spark, cdir))
    got = pairs(S.sim_ivfpq_compound(spark, cdir))
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"ivfpq clustered recall {recall:.3f} < 0.9"


# ---------------------------------------------------------------------------
# r11 continuation-batch brute twins (the r12 window backlog)
# ---------------------------------------------------------------------------

def test_vocab_rank_drift_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.text import (
        DRIFT_TOP_K,
        text_vocab_rank_drift,
    )

    rows = _docs_rows()
    ca, cb = Counter(), Counter()
    for doc_id, text, _, _ in rows:
        (ca if doc_id % 2 == 0 else cb).update(text.split(" "))
    top_a = [w for w, _ in sorted(ca.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:DRIFT_TOP_K]]
    top_b = [w for w, _ in sorted(cb.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:DRIFT_TOP_K]]
    union = sorted(set(top_a) | set(top_b))
    ra = {w: i + 1 for i, w in enumerate(
        sorted(union, key=lambda w: (-ca.get(w, 0), w)))}
    rb = {w: i + 1 for i, w in enumerate(
        sorted(union, key=lambda w: (-cb.get(w, 0), w)))}
    got = {r["term"]: r
           for r in text_vocab_rank_drift(spark, SF_DIR).collect()}
    assert set(got) == set(union)
    for w in union:
        r = got[w]
        assert (r["cnt_a"], r["cnt_b"]) == (ca.get(w, 0), cb.get(w, 0))
        assert (r["rank_a"], r["rank_b"]) == (ra[w], rb[w])
        assert r["abs_shift"] == abs(ra[w] - rb[w])
    assert any(r["abs_shift"] > 0 for r in got.values()), (
        "halves must actually reorder some head terms"
    )


def test_term_burstiness_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.text import (
        BURST_TOP_K,
        text_term_burstiness,
    )

    rows = _docs_rows()
    per_term: dict = {}
    for doc_id, text, _, _ in rows:
        for w, x in Counter(text.split(" ")).items():
            per_term.setdefault(w, []).append(x)
    n_docs = len(rows)
    stats = {
        w: (sum(xs), sum(x * x for x in xs), len(xs))
        for w, xs in per_term.items()
    }
    top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[
        :BURST_TOP_K]
    got = {r["term"]: r
           for r in text_term_burstiness(spark, SF_DIR).collect()}
    assert set(got) == {w for w, _ in top}
    fanos = []
    for w, (tf, sq, df) in top:
        r = got[w]
        assert (r["tf"], r["df"], r["n_docs"]) == (tf, df, n_docs)
        assert r["fano_r6"] == _qrem_r6(n_docs * sq - tf * tf, n_docs * tf)
        fanos.append(r["fano_r6"])
    assert max(fanos) > min(fanos), "burstiness must vary across terms"


def test_local_clustering_matches_python_brute(spark):
    from spark_dba_spark.operators.dedup import (
        dedup_ngram_jaccard,
        graph_local_clustering,
    )

    edges = [(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, SF_DIR).collect()]
    adj: dict = {}
    eset = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        eset.add((min(a, b), max(a, b)))
    from spark_dba_spark.operators.dedup import LCC_DEG_CAP

    got = {r["doc_id"]: r
           for r in graph_local_clustering(spark, SF_DIR).collect()}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        ns = sorted(nbrs)
        t = sum(
            1
            for i, a in enumerate(ns)
            for b in ns[i + 1:]
            if (min(a, b), max(a, b)) in eset
        )
        r = got[v]
        d = len(nbrs)
        assert r["degree"] == d
        if d > LCC_DEG_CAP:
            assert r["capped"] is True
            assert r["n_closed_wedges"] is None
            assert r["lcc_r6"] is None
            continue
        assert r["capped"] is False
        assert r["n_closed_wedges"] == t
        want = _r6(2 * t, d * (d - 1)) if d >= 2 else 0.0
        assert r["lcc_r6"] == want
    assert any(
        r["lcc_r6"] is not None and r["lcc_r6"] > 0 for r in got.values()
    )


def test_local_clustering_degree_cap_on_star_graph(spark, tmp_path):
    """VERDICT r11 #5: a hub node above LCC_DEG_CAP must be reported
    with capped=true and NULL wedge/lcc columns — never wedge-expanded.
    Build a star: one hub doc whose 12-token sliding windows overlap
    every spoke (identical docs trivially form a clique, so instead
    make hub+spokes all IDENTICAL — a (cap+2)-clique where every node's
    degree = cap+1 > cap) plus one isolated pair for an uncapped row."""
    from spark_dba_spark.operators.dedup import (
        LCC_DEG_CAP,
        graph_local_clustering,
    )

    n_clique = LCC_DEG_CAP + 2
    clique_text = " ".join(f"cliquetok{i}" for i in range(24))
    pair_text = " ".join(f"pairtok{i}" for i in range(24))
    texts = [clique_text] * n_clique + [pair_text] * 2
    con = _write_docs(tmp_path, texts)
    con.close()
    got = {r["doc_id"]: r
           for r in graph_local_clustering(spark, str(tmp_path)).collect()}
    assert len(got) == n_clique + 2
    for did in range(n_clique):
        r = got[did]
        assert r["degree"] == n_clique - 1
        assert r["capped"] is True
        assert r["n_closed_wedges"] is None
        assert r["lcc_r6"] is None
    for did in (n_clique, n_clique + 1):
        r = got[did]
        assert r["degree"] == 1
        assert r["capped"] is False
        assert r["n_closed_wedges"] == 0
        assert r["lcc_r6"] == 0.0


def test_dim_redundancy_matches_numpy_brute(spark):
    from spark_dba_spark.operators.similarity import (
        DIM_RED_QUANT,
        DIM_RED_TOP,
        emb_dim_redundancy_topk,
    )

    rows = _emb_rows()
    m = np.array([r[1] for r in rows], dtype=np.float64)
    q = np.trunc(m * DIM_RED_QUANT).astype(object)  # exact big ints
    n = q.shape[0]
    scored = []
    for d1 in range(q.shape[1]):
        for d2 in range(d1 + 1, q.shape[1]):
            x, y = q[:, d1], q[:, d2]
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx, syy = int((x * x).sum()), int((y * y).sum())
            scored.append((
                -(abs(n * sxy - sx * sy)), d1, d2,
                n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy,
            ))
    scored.sort()
    got = {r["rank"]: r
           for r in emb_dim_redundancy_topk(spark, SF_DIR).collect()}
    assert len(got) == DIM_RED_TOP
    for rank in range(1, DIM_RED_TOP + 1):
        _, d1, d2, cov, vx, vy = scored[rank - 1]
        r = got[rank]
        assert (r["d1"], r["d2"], r["n_vecs"]) == (d1, d2, n)
        assert (r["cov_num"], r["vx_num"], r["vy_num"]) == (cov, vx, vy)


def test_markov_order2_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.temporal import ev_markov_order2

    rows = _events_rows()
    per_user: dict = {}
    for eid, ts_us, uid, et, _ in rows:
        per_user.setdefault(uid, []).append((ts_us, eid, et))
    tri = Counter()
    for evs in per_user.values():
        evs.sort()
        types = [t for _, _, t in evs]
        for i in range(1, len(types) - 1):
            tri[(types[i - 1], types[i], types[i + 1])] += 1
    got = {(r["prev2_type"], r["prev1_type"], r["next_type"]): r
           for r in ev_markov_order2(spark, SF_DIR).collect()}
    assert set(got) == set(tri)
    pair12 = Counter()
    pair23 = Counter()
    tot1 = Counter()
    for (a, b, c), n in tri.items():
        pair12[(a, b)] += n
        pair23[(b, c)] += n
        tot1[b] += n
    for k, n in tri.items():
        r = got[k]
        assert r["n_trans"] == n
        assert r["p_order2"] == _r6(n, pair12[(k[0], k[1])])
        assert r["p_order1"] == _r6(pair23[(k[1], k[2])], tot1[k[1]])


def test_user_hour_concentration_matches_python_brute(spark):
    import datetime
    from collections import Counter

    from spark_dba_spark.operators.temporal import (
        ev_user_hour_concentration,
    )

    rows = _events_rows()
    per_user: dict = {}
    for _, ts_us, uid, _, _ in rows:
        hod = datetime.datetime.utcfromtimestamp(ts_us / 1e6).hour
        per_user.setdefault(uid, Counter())[hod] += 1
    got = {r["user_id"]: r
           for r in ev_user_hour_concentration(spark, SF_DIR).collect()}
    assert set(got) == set(per_user)
    for uid, c in per_user.items():
        n = sum(c.values())
        coll = sum(v * (v - 1) for v in c.values())
        top_hour = min(h for h, v in c.items() if v == max(c.values()))
        r = got[uid]
        assert (r["n_events"], r["hours_active"]) == (n, len(c))
        assert r["top_hour"] == top_hour
        assert r["concentration_r6"] == _r6(coll, n * (n - 1))
        assert r["top_hour_share_r6"] == _r6(max(c.values()), n)


def test_permutation_diff_matches_python_brute(spark):
    from spark_dba_spark.operators.temporal import (
        PERM_B,
        PERM_VALUE_CUT,
        stats_permutation_diff,
    )

    rows = _events_rows()
    base = [(eid, et == "click", v > PERM_VALUE_CUT)
            for eid, _, _, et, v in rows if et in ("click", "view")]

    def cells(b):
        x1 = n1 = x2 = n2 = 0
        for eid, is_click, hi in base:
            if b == 0:
                lbl = is_click
            else:
                flip = int(hashlib.md5(
                    f"{eid}:perm:{b}".encode()).hexdigest()[:7], 16) % 2
                lbl = is_click if flip == 0 else not is_click
            if lbl:
                n1 += 1
                x1 += hi
            else:
                n2 += 1
                x2 += hi
        return x1, n1, x2, n2

    ox1, on1, ox2, on2 = cells(0)
    n_ext = 0
    for b in range(1, PERM_B + 1):
        x1, n1, x2, n2 = cells(b)
        if (abs(x1 * n2 - x2 * n1) * (on1 * on2)
                >= abs(ox1 * on2 - ox2 * on1) * (n1 * n2)):
            n_ext += 1
    [r] = stats_permutation_diff(spark, SF_DIR).collect()
    assert (r["click_hi"], r["n_click"], r["view_hi"], r["n_view"]) == (
        ox1, on1, ox2, on2)
    assert r["n_extreme"] == n_ext
    assert r["p_value_r6"] == _r6(1 + n_ext, 1 + PERM_B)
    d = ox1 * on2 - ox2 * on1
    sgn = 1 if d >= 0 else -1
    assert r["rate_diff_r6"] == sgn * _r6(abs(d), on1 * on2)
    assert 0 < r["p_value_r6"] <= 1.0


def test_bloom_capacity_matches_python_brute(spark):
    from spark_dba_spark.operators.text import (
        CAP_BLOOM_K,
        CAP_BLOOM_MS,
        sketch_bloom_capacity_sweep,
    )

    con = duckdb.connect()
    members = {f"ord:{r[0]}" for r in con.execute(
        f"SELECT DISTINCT o_custkey FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')").fetchall()}
    probes = {f"cust:{r[0]}" for r in con.execute(
        f"SELECT DISTINCT c_custkey FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')").fetchall()}
    con.close()

    def positions(s, m):
        hx = hashlib.md5(s.encode()).hexdigest()
        h1 = int(hx[:7], 16)
        h2 = 1 + int(hx[8:15], 16)
        return {(h1 + i * h2) % m for i in range(CAP_BLOOM_K)}

    got = {r["m_bits"]: r
           for r in sketch_bloom_capacity_sweep(spark, SF_DIR).collect()}
    assert set(got) == set(CAP_BLOOM_MS)
    fprs = []
    for m in CAP_BLOOM_MS:
        inserted = set()
        for s in members:
            inserted |= positions(s, m)
        fp = sum(1 for s in probes if positions(s, m) <= inserted)
        r = got[m]
        assert r["n_members"] == len(members)
        assert r["n_bits_set"] == len(inserted)
        assert r["n_probes"] == len(probes)
        assert r["n_false_pos"] == fp
        assert r["fill_r6"] == _r6(len(inserted), m)
        assert r["fpr_r6"] == _r6(fp, len(probes))
        fprs.append(fp / len(probes))
    assert fprs[0] > fprs[-1], "wider filters must measure lower FPR"


def test_weekday_index_matches_python_brute(spark):
    from spark_dba_spark.operators.relational import orders_weekday_index

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT isodow(o_orderdate), o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')").fetchall()
    con.close()
    import math

    agg: dict = {}
    for dow, tp in orders:
        a = agg.setdefault(int(dow), [0, 0])
        a[0] += 1
        a[1] += int(math.floor(tp * 100 + 0.5))
    n_tot = sum(a[0] for a in agg.values())
    rev_tot = sum(a[1] for a in agg.values())
    got = {r["dow_iso"]: r
           for r in orders_weekday_index(spark, SF_DIR).collect()}
    assert set(got) == set(agg) == set(range(1, 8))
    for dow, (n, cents) in agg.items():
        r = got[dow]
        assert (r["n_orders"], r["rev_cents"]) == (n, cents)
        assert r["rev_share_r6"] == _r6(cents, rev_tot)
        assert r["rev_index_r6"] == _r6(7 * cents, rev_tot)
        assert r["count_index_r6"] == _r6(7 * n, n_tot)


def test_byte_delta_profile_matches_python_brute(spark):
    from collections import Counter

    from spark_dba_spark.operators.multimodal import mm_byte_delta_profile

    rows = _docs_rows()
    cnt: dict = {}
    tot = Counter()
    for doc_id, text, _, _ in rows:
        bs = text.encode("utf-8")
        mt = _media_type(doc_id)
        for i in range(len(bs) - 1):
            delta = abs(bs[i] - bs[i + 1])
            band = 0 if delta == 0 else delta.bit_length()
            cnt.setdefault(mt, Counter())[band] += 1
            tot[mt] += 1
    got = {(r["media_type"], r["band"]): r
           for r in mm_byte_delta_profile(spark, SF_DIR).collect()}
    assert set(got) == {(mt, b) for mt, c in cnt.items() for b in c}
    for (mt, b), r in got.items():
        assert r["n_deltas"] == cnt[mt][b]
        assert r["delta_share_r6"] == _r6(cnt[mt][b], tot[mt])
    assert all(0 in c for c in cnt.values()), (
        "repeated bytes must appear in every media type"
    )


def test_r11_temporal_family_parity_on_synthetic_events(spark, tmp_path):
    """Oracle↔builder parity on NON-FIXTURE events for the r11 temporal
    family: a seeded synthetic stream with deliberate structure —
    long dead-hour stretches (empty Haar blocks at every scale, the
    n_active_blocks path), heavy same-microsecond ties (record/
    percentile endpoint-order stress), duplicate VALUES within hours
    (type-1 percentile tie path), monotone-increasing users (every
    event a record) next to constant-value users (one record), and a
    bot user pinned to a single hour (concentration = 1 path) — through
    the full comparator for the five r11 event operators."""
    import datetime
    import random
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry

    rng = random.Random(97)
    base = datetime.datetime(2024, 5, 6)
    rows = []
    eid = 0
    types = ["click", "view", "purchase", "error", "signup"]
    for day in range(14):
        # dead stretch: days 5-7 carry almost nothing (empty blocks)
        n_ev = 8 if day in (5, 6, 7) else 150
        for _ in range(n_ev):
            uid = rng.randint(0, 24)
            if uid == 0:
                hour = 3  # the single-hour bot: concentration == 1
            else:
                hour = rng.choice([9, 13, 20, rng.randint(0, 23)])
            us = rng.randint(0, 9) if rng.random() < 0.4 else (
                rng.randint(0, 59_999_999)
            )
            ts = base + datetime.timedelta(
                days=day, hours=hour, minutes=rng.randint(0, 59),
                microseconds=us,
            )
            if uid == 1:
                value = float(eid)       # strictly increasing: all records
            elif uid == 2:
                value = 42.0             # constant: exactly one record
            else:
                value = float(rng.choice(
                    [25.0, 50.0, 50.0, 100.0, round(rng.uniform(0, 300), 2)]
                ))                       # duplicate values: percentile ties
            rows.append(
                (eid, ts, uid, rng.choice(types), value, "{}")
            )
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
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
        "ev_haar_energy_hourly",
        "ev_value_records",
        "ev_hourly_value_percentiles",
        "ev_markov_order2",
        "ev_user_hour_concentration",
        "stats_permutation_diff",
    ):
        ok, msg, _n = compare(name, spark, con, specs[name], str(tmp_path))
        assert ok, f"{name} synthetic parity: {msg}"
    con.close()
    # the engineered paths must actually fire
    from spark_dba_spark.operators.temporal import (
        ev_user_hour_concentration,
        ev_value_records,
    )

    recs = {r["user_id"]: r
            for r in ev_value_records(spark, str(tmp_path)).collect()}
    # literal replay for user 1 (value = eid is monotone in ARRIVAL, not
    # in event time — the record count follows the (ts, event_id) order)
    u1 = sorted((r[1], r[0], r[4]) for r in rows if r[2] == 1)
    best, want = None, 0
    for _, _, v in u1:
        if best is None or v > best:
            best, want = v, want + 1
    assert recs[1]["n_records"] == want and want > 1
    assert recs[2]["n_records"] == 1, "constant user"
    conc = {r["user_id"]: r["concentration_r6"]
            for r in ev_user_hour_concentration(
                spark, str(tmp_path)).collect()}
    assert conc[0] == 1.0, "single-hour bot must hit concentration 1"
    assert min(conc.values()) < 0.3, "spread users must sit far below"


def test_r11_doc_family_parity_on_synthetic_corpus(spark, tmp_path):
    """Oracle↔builder parity on NON-FIXTURE documents for the r11 doc
    family: a seeded corpus with DELIBERATE structure — a copied
    24-token paragraph planted mid-document in six docs (the
    paragraph-minhash payoff case), two ABUTTING shared 12-token spans
    (the interval-union merge path the removal op cuts as ONE region),
    all-duplicated docs (clean_text = ''), cross-source copying
    concentrated on one source pair, and a rare-token tail — through
    the full comparator for nine r11 document operators."""
    import random
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from spark_dba_spark import registry

    rng = random.Random(19)
    vocab = [f"v{i}" for i in range(60)]

    def words(n):
        return [rng.choice(vocab) for _ in range(n)]

    para = [f"p{i}" for i in range(24)]       # the copied paragraph
    span2 = [f"s{i}" for i in range(24)]      # two abutting 12-token spans
    texts, sources = [], []
    for i in range(70):
        if i < 6:
            # paragraph planted at block boundary 24 (doc = 24 filler +
            # 24 copied + tail) — block 1 is the identical paragraph
            t = words(24) + para + words(rng.randint(4, 12))
            src = "srcA" if i % 2 == 0 else "srcB"
        elif i < 10:
            t = words(6) + span2 + words(6)   # abutting spans carriers
            src = "srcC"
        elif i < 13:
            t = para + para[:12]              # near-fully-duplicated docs
            src = "srcA"
        elif i < 20:
            t = words(5) + [f"rare{i}_{j}" for j in range(3)] + words(10)
            src = "srcD"                      # rare-token tail
        else:
            t = words(rng.randint(12, 50))
            src = f"src{i % 4}"
        texts.append(" ".join(t))
        sources.append(src)
    con = _write_docs(tmp_path, texts, sources=sources)
    specs = registry.all_specs()
    for name in (
        "text_dup_region_removal",
        "dedup_paragraph_minhash",
        "text_dsir_importance",
        "text_tokenizer_fertility",
        "text_gopher_gates",
        "text_rarity_outliers",
        "text_simpson_concentration",
        "dedup_cross_source_matrix",
        "text_vocab_rank_drift",
        "text_term_burstiness",
        "sketch_kmv_distinct",
    ):
        ok, msg, _n = compare(name, spark, con, specs[name], str(tmp_path))
        assert ok, f"{name} synthetic parity: {msg}"
    con.close()
    # the engineered structure must actually fire the interesting paths
    from spark_dba_spark.operators.dedup import dedup_paragraph_minhash
    from spark_dba_spark.operators.text import text_dup_region_removal

    pm = dedup_paragraph_minhash(spark, str(tmp_path)).collect()
    para_pairs = [r for r in pm if r["jaccard"] == 1.0]
    assert len(para_pairs) >= 10, (
        "the planted paragraph must pair up across its six carriers"
    )
    rr = {r["doc_id"]: r
          for r in text_dup_region_removal(spark, str(tmp_path)).collect()}
    # abutting spans merge into ONE removed region spanning both
    for i in range(6, 10):
        assert rr[i]["removed_tokens"] >= 24, i
    # near-fully-duplicated docs lose (almost) everything
    assert any(rr[i]["kept_tokens"] == 0 for i in range(10, 13)), (
        "an all-duplicated doc must clean to the empty string"
    )
