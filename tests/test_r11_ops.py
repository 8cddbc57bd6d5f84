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
    ok, msg = compare(
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
        ok, msg = compare(name, spark, con, specs[name], str(tmp_path))
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
    ok, msg = compare(
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
