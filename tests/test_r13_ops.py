"""Round-13 tests.

Part 1 — ADVICE r12 regression fixtures: the three flagged defects
(`join_asof_tolerance` truncation-vs-round divergence on fractional
hours, `ev_weekend_lift` zero-cents division, `text_char_entropy_by_source`
non-BMP code-unit split) each get a planted micro-fixture that fails on
the pre-fix code and pins the cross-engine contract on the fixed code.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from conftest import normalize_rows

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
T0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(['{"k": 1}'] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )


def _write_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderdate_us)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([100.0] * len(rows), pa.float64()),
                "o_orderdate": pa.array(
                    [r[2] for r in rows], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        tmp_path / "orders.parquet",
    )


def _write_docs(tmp_path, texts, sources):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(sources),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )


def _oracle_rows(tmp_path, sql, tables):
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp_path}/{t}.parquet')"
            )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = [tuple(d.values()) for d in res.fetch_arrow_table().to_pylist()]
        return cols, rows
    finally:
        con.close()


def _assert_spark_matches_oracle(df, tmp_path, sql, tables):
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    dcols, drows = _oracle_rows(tmp_path, sql, tables)
    assert sorted(scols) == sorted(dcols), f"columns: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"rows: {len(srows)} vs {len(drows)}"
    for a, b in zip(
        normalize_rows(srows, scols), normalize_rows(drows, dcols)
    ):
        assert a == b


# ---------------------------------------------------------------------------
# join_asof_tolerance: the 7-day window must actually fire, and fractional
# staleness hours must FLOOR identically on both engines (ADVICE r12 high +
# medium: the production fixtures keep every match ~23y stale, so the
# tolerance path and the div semantics were never exercised cross-engine)
# ---------------------------------------------------------------------------


def test_asof_tolerance_window_fires_and_hours_floor(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_ASOF_TOLERANCE,
        join_asof_tolerance,
    )

    _write_orders(
        tmp_path,
        [
            (10, 1, T0_US),
            (20, 3, T0_US),
            (21, 3, T0_US + 3 * US_PER_DAY),
        ],
    )
    _write_events(
        tmp_path,
        [
            # 1.5h stale: floor -> 1 (a round-half-away CAST gives 2 —
            # the exact divergence ADVICE flagged)
            (1, T0_US + US_PER_HOUR + US_PER_HOUR // 2, 1, "click", 1.0),
            # 0.4h stale: floor -> 0 (round gives 0 too; the sub-.5 case)
            (2, T0_US + 24 * 60 * 1_000_000, 1, "click", 1.0),
            # 6d23.9h stale: inside tolerance, floor -> 167
            (3, T0_US + 7 * US_PER_DAY - 6 * 60 * 1_000_000, 1, "view", 1.0),
            # exactly 7d: age == TOL, still fresh (<=), floor -> 168
            (4, T0_US + 7 * US_PER_DAY, 1, "view", 1.0),
            # 7d + 1us: stale -> NULLs
            (5, T0_US + 7 * US_PER_DAY + 1, 1, "view", 1.0),
            # user with no orders at all -> NULLs
            (6, T0_US, 2, "click", 1.0),
            # second order supersedes the first: 30min after order 21
            (7, T0_US + 3 * US_PER_DAY + 30 * 60 * 1_000_000, 3, "buy", 9.0),
        ],
    )
    got = {
        r["event_id"]: r
        for r in join_asof_tolerance(spark, str(tmp_path)).collect()
    }
    assert len(got) == 7
    # the tolerance path fires: non-NULL matches with exact floor hours
    assert got[1]["tol_orderkey"] == 10 and got[1]["staleness_hours"] == 1
    assert got[2]["tol_orderkey"] == 10 and got[2]["staleness_hours"] == 0
    assert got[3]["tol_orderkey"] == 10 and got[3]["staleness_hours"] == 167
    assert got[4]["tol_orderkey"] == 10 and got[4]["staleness_hours"] == 168
    for eid in (5, 6):
        assert got[eid]["tol_orderkey"] is None
        assert got[eid]["tol_orderdate"] is None
        assert got[eid]["staleness_hours"] is None
    assert got[7]["tol_orderkey"] == 21 and got[7]["staleness_hours"] == 0
    # and the DuckDB oracle agrees cell-for-cell on the same fixture
    _assert_spark_matches_oracle(
        join_asof_tolerance(spark, str(tmp_path)),
        tmp_path,
        ORACLE_ASOF_TOLERANCE,
        ("events", "orders"),
    )


# ---------------------------------------------------------------------------
# ev_weekend_lift: a type whose values all round to zero cents must yield
# NULL value share, not an ANSI division error (ADVICE r12 low)
# ---------------------------------------------------------------------------


def test_weekend_lift_zero_cents_value_share_null(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_WEEKEND_LIFT,
        ev_weekend_lift,
    )

    # span Mon..Sun so the calendar baseline is well-defined; all values
    # 0.001 -> 0 cents after the house rounding
    rows = [
        (i, T0_US + i * US_PER_DAY, 1, "ping", 0.001) for i in range(7)
    ]
    _write_events(tmp_path, rows)
    out = ev_weekend_lift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["cents_total"] == 0
    assert r["weekend_value_share_r6"] is None
    assert r["weekend_lift_r6"] is not None  # events exist, lift defined
    _assert_spark_matches_oracle(
        ev_weekend_lift(spark, str(tmp_path)),
        tmp_path,
        ORACLE_WEEKEND_LIFT,
        ("events",),
    )


# ---------------------------------------------------------------------------
# text_char_entropy_by_source: non-BMP characters must count as ONE code
# point on both engines (ADVICE r12 low: F.split('', text) cut surrogate
# pairs in half while DuckDB split code points)
# ---------------------------------------------------------------------------


def test_char_entropy_non_bmp_code_points(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_CHAR_ENTROPY,
        text_char_entropy_by_source,
    )

    _write_docs(
        tmp_path,
        ["\U0001f600\U0001f600aa", "ab\U00020000cd", ""],
        ["emoji", "astral", "empty"],
    )
    got = {
        r["source"]: r
        for r in text_char_entropy_by_source(spark, str(tmp_path)).collect()
    }
    # 4 code points, 2 types (not 6 UTF-16 units / 3 split-units)
    assert got["emoji"]["n_chars"] == 4
    assert got["emoji"]["n_char_types"] == 2
    assert got["astral"]["n_chars"] == 5
    assert got["astral"]["n_char_types"] == 5
    assert "empty" not in got  # zero chars -> no histogram row
    _assert_spark_matches_oracle(
        text_char_entropy_by_source(spark, str(tmp_path)),
        tmp_path,
        ORACLE_CHAR_ENTROPY,
        ("documents",),
    )


# ---------------------------------------------------------------------------
# Part 2 — round-13 batch (window slots 31-36): brute / planted twins
# ---------------------------------------------------------------------------

from conftest import SF_DIR  # noqa: E402


def _events_rows(sf_dir=SF_DIR):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_id, epoch_us(ts), user_id, event_type, value FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_pii_pattern_audit_planted(spark, tmp_path):
    """The fixture corpus is clean word soup (all-zero counts are the
    correct answer there) — this planted twin is the behavioural gate:
    one doc per pattern class, one multi-hit doc, one clean doc."""
    from spark_dba_spark.operators.curation import (
        ORACLE_PII_AUDIT,
        text_pii_pattern_audit,
    )

    _write_docs(
        tmp_path,
        [
            "contact me at alice@example.com or bob.smith+x@sub.org today",
            "server 10.0.0.1 and 192.168.255.254 are up",
            "call +4915112345678 or 030-555-0199 now",
            "case number 123456789 and account 98765432101",
            "mixed: eve@corp.io from 172.16.0.9 ref 555123456789",
            "a perfectly clean sentence with no identifiers at all",
        ],
        ["s_email", "s_ip", "s_phone", "s_id", "s_mixed", "s_clean"],
    )
    got = {
        r["source"]: r
        for r in text_pii_pattern_audit(spark, str(tmp_path)).collect()
    }
    assert got["s_email"]["email_matches"] == 2
    assert got["s_email"]["email_docs"] == 1
    assert got["s_ip"]["ipv4_matches"] == 2
    assert got["s_phone"]["phone_matches"] == 2
    assert got["s_id"]["idnum_matches"] == 2
    m = got["s_mixed"]
    assert (m["email_matches"], m["ipv4_matches"], m["idnum_matches"]) == (
        1, 1, 1,
    )
    c = got["s_clean"]
    assert c["pii_docs"] == 0 and c["pii_doc_share_r6"] == 0.0
    for s in ("s_email", "s_ip", "s_phone", "s_id", "s_mixed"):
        assert got[s]["pii_docs"] == 1
        assert got[s]["pii_doc_share_r6"] == 1.0
    _assert_spark_matches_oracle(
        text_pii_pattern_audit(spark, str(tmp_path)),
        tmp_path, ORACLE_PII_AUDIT, ("documents",),
    )


def test_pii_audit_fixture_is_clean(spark):
    """Documents fixtures carry no PII-shaped tokens — the all-zero
    result is asserted (not assumed), so a fixture regen that starts
    emitting digits would surface here, not as a silent hash drift."""
    from spark_dba_spark.operators.curation import text_pii_pattern_audit

    rows = text_pii_pattern_audit(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["pii_docs"] == 0 for r in rows)


def test_composite_quality_score_brute(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_COMPOSITE_QUALITY,
        QUALITY_STOPWORDS,
        text_composite_quality_score,
    )

    texts = [
        # all five gates pass -> 100
        "the quick brown fox jumps over a lazy dog and then it runs "
        "far away into the deep green forest tonight",
        # repetition kills type-token ratio (gate 2)
        "spam " * 40,
        # no stopwords (gate 3)
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        # one monster token kills gates 4+5
        "the " * 9 + "x" * 50,
        # too short (gate 1)
        "the end",
        "",
    ]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])

    def brute(text: str) -> int:
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        if n == 0:
            return 0
        sum_len = sum(len(t) for t in toks)
        gates = [
            10 <= n <= 1000,
            2 * len(set(toks)) >= n,
            100 * sum(t in QUALITY_STOPWORDS for t in toks) >= 2 * n,
            3 * n <= sum_len <= 12 * n,
            max(len(t) for t in toks) <= 20,
        ]
        return 20 * sum(gates)

    got = {
        (r["source"], r["score"]): r["n_docs"]
        for r in text_composite_quality_score(spark, str(tmp_path)).collect()
    }
    for i, t in enumerate(texts):
        assert got[(f"s{i}", brute(t))] == 1, (i, brute(t))
    assert brute(texts[0]) == 100 and brute(texts[-1]) == 0
    _assert_spark_matches_oracle(
        text_composite_quality_score(spark, str(tmp_path)),
        tmp_path, ORACLE_COMPOSITE_QUALITY, ("documents",),
    )


def _brute_cdc_chunks(payload: bytes, mod: int):
    bs = list(payload)
    bounds = [0] + [
        i for i in range(1, len(bs))
        if (bs[i - 1] * 31 + bs[i]) % mod == 0
    ] + [len(bs)]
    return [
        payload[bounds[i]: bounds[i + 1]]
        for i in range(len(bounds) - 1)
        if bounds[i + 1] > bounds[i]
    ]


def test_cdc_snapshot_delta_brute(spark, tmp_path):
    """Two snapshots where doc 0 (snap A) and doc 3 (snap B) carry
    byte-identical text of the same media type: the shared chunk set
    must be exactly the brute CDC chunk intersection, and the savings
    ratio the exact byte ratio."""
    import hashlib

    from spark_dba_spark.operators.curation import (
        CDC_MOD,
        ORACLE_CDC_SNAPSHOT_DELTA,
        mm_cdc_snapshot_delta,
    )

    shared = "the fast key order sort table scan merge part window " * 4
    texts = [
        shared,                     # doc 0: image, snap A
        "only in snapshot b once " * 6,   # doc 1: audio, snap B
        "removed content stream " * 5,    # doc 2: video, snap A
        shared,                     # doc 3: image, snap B (dup of 0)
        "audio snap a payload here " * 3,  # doc 4: audio, snap A
        "video snap b payload there " * 3,  # doc 5: video, snap B
    ]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])

    def chunkset(doc_ids):
        out = {}
        for d in doc_ids:
            for ck in _brute_cdc_chunks(texts[d].encode(), CDC_MOD):
                out[hashlib.md5(
                    ck.hex().upper().encode()).hexdigest()] = len(ck)
        return out

    # media image = doc_id % 3 == 0 -> docs 0 (snap A) and 3 (snap B)
    a, b = chunkset([0]), chunkset([3])
    rows = {r["media_type"]: r
            for r in mm_cdc_snapshot_delta(spark, str(tmp_path)).collect()}
    img = rows["image"]
    assert img["chunks_a"] == len(a) and img["chunks_b"] == len(b)
    assert img["shared_chunks"] == len(set(a) & set(b)) == len(a)
    assert img["added_chunks"] == 0 and img["removed_chunks"] == 0
    assert img["shared_bytes"] == sum(a.values())
    assert img["transfer_savings_r6"] == 1.0
    # audio: doc 1 (B) and doc 4 (A) are disjoint content
    aud = rows["audio"]
    assert aud["shared_chunks"] == 0
    assert aud["added_chunks"] == aud["chunks_b"]
    assert aud["transfer_savings_r6"] == 0.0
    _assert_spark_matches_oracle(
        mm_cdc_snapshot_delta(spark, str(tmp_path)),
        tmp_path, ORACLE_CDC_SNAPSHOT_DELTA, ("documents",),
    )


def test_interarrival_burstiness_brute(spark):
    import math

    from spark_dba_spark.operators.curation import ev_interarrival_burstiness

    per_user: dict = {}
    for eid, us, uid, et, _ in _events_rows():
        per_user.setdefault(uid, []).append((us, eid, et))
    gaps: dict = {}
    for tl in per_user.values():
        tl.sort()
        for (p_us, _, _), (us, _, et) in zip(tl, tl[1:]):
            gaps.setdefault(et, []).append((us - p_us) // 1_000_000)
    got = {r["event_type"]: r
           for r in ev_interarrival_burstiness(spark, SF_DIR).collect()}
    assert set(got) == set(gaps)
    for et, gs in gaps.items():
        r = got[et]
        n, s, s2 = len(gs), sum(gs), sum(g * g for g in gs)
        assert r["n_gaps"] == n and r["sum_s"] == s
        mean = s / n
        sigma = math.sqrt((n * s2 - s * s) / (n * n))
        assert abs(r["cv_r6"] - sigma / mean) < 1e-6
        assert abs(r["burstiness_r6"] - (sigma - mean) / (sigma + mean)) \
            < 1e-6
        # metronome floor / heavy-tail ceiling
        assert -1.0 <= r["burstiness_r6"] < 1.0


def test_interval_coverage_join_brute(spark):
    from spark_dba_spark.operators.curation import (
        ATTR_WINDOW_US,
        ev_interval_coverage_join,
    )

    rows = _events_rows()
    clicks: dict = {}
    for eid, us, uid, et, _ in rows:
        if et == "click":
            clicks.setdefault(uid, []).append((us, eid))
    got = {r["event_id"]: r
           for r in ev_interval_coverage_join(spark, SF_DIR).collect()}
    assert len(got) == len(rows)
    n_covered = 0
    for eid, us, uid, et, _ in rows:
        cov = [
            weid for w_us, weid in clicks.get(uid, ())
            if w_us <= us < w_us + ATTR_WINDOW_US
        ]
        r = got[eid]
        assert r["n_covering"] == len(cov)
        if cov:
            n_covered += 1
            assert r["first_window_event"] == min(cov)
            assert r["last_window_event"] == max(cov)
        else:
            assert r["first_window_event"] is None
    # the attribution window must actually fire on the fixture
    assert n_covered > 0


def test_grid_quantile_error_brute(spark):
    from spark_dba_spark.operators.curation import (
        GRIDQ_BINS,
        sketch_grid_quantile_error,
    )

    def cents(v):
        import math
        return int(math.floor(v * 100 + 0.5))

    rows = _events_rows()
    gmax = max(cents(v) for _, _, _, _, v in rows)
    by_type: dict = {}
    for eid, _, _, et, v in rows:
        by_type.setdefault(et, []).append((cents(v), eid))
    got = {r["event_type"]: r
           for r in sketch_grid_quantile_error(spark, SF_DIR).collect()}
    assert set(got) == set(by_type)
    binw = (gmax + 1 + GRIDQ_BINS - 1) // GRIDQ_BINS
    for et, vs in by_type.items():
        vs.sort()
        n, r = len(vs), got[et]
        assert r["n"] == n and r["gmax"] == gmax
        for q in (50, 90, 99):
            exact = vs[(q * n + 99) // 100 - 1][0]
            assert r[f"p{q}_exact"] == exact
            b = (exact * GRIDQ_BINS) // (gmax + 1)
            est = ((b + 1) * (gmax + 1)) // GRIDQ_BINS
            assert r[f"p{q}_est"] == est
            assert r[f"p{q}_err"] == est - exact
            # the sketch never under-reports and errs at most one bin
            assert 0 <= r[f"p{q}_err"] <= binw


# ---------------------------------------------------------------------------
# Part 3 — ratchet hygiene (VERDICT r12 "Next round" #7): the RECALL
# artifact's random-fixture floor becomes a pytest, so a regression of the
# IVF-PQ exact-refine stage trips a test, not a judge
# ---------------------------------------------------------------------------


def test_ivfpq_random_fixture_recall_floor(spark):
    """recall@10 >= 0.8 at nprobe=24 on the RANDOM fixture (RECALL_r12
    measured 0.950 there; the clustered >= 0.9 floor lives in
    test_r11_ops). Uniform-random embeddings are ANN's worst case, so
    this is the floor that catches a refine-stage regression."""
    from spark_dba_spark.operators import similarity as S

    brute = {(r["qid"], r["vec_id"])
             for r in S.sim_cosine_topk(spark, SF_DIR).collect()}
    default = S.IVF_NPROBE
    try:
        S.IVF_NPROBE = 24
        got = {(r["qid"], r["vec_id"])
               for r in S.sim_ivfpq_compound(spark, SF_DIR).collect()}
    finally:
        S.IVF_NPROBE = default
    recall = len(brute & got) / len(brute)
    assert recall >= 0.8, f"random-fixture ivfpq recall {recall:.3f} < 0.8"


# ---------------------------------------------------------------------------
# Part 4 — continuation batch H (r14 backlog): brute / planted twins
# ---------------------------------------------------------------------------


def test_pii_redaction_corpus_planted(spark, tmp_path):
    import hashlib
    import re

    from spark_dba_spark.operators.curation import (
        ORACLE_PII_REDACTION,
        PII_EMAIL,
        PII_IDNUM,
        PII_IPV4,
        PII_PHONE,
        text_pii_redaction_corpus,
    )

    texts = [
        "mail alice@example.com from 10.0.0.1 ref 123456789 now",
        "call +4915112345678 then 030-555-0199 twice",
        "a clean line with nothing to hide",
    ]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])

    def brute(t: str) -> tuple[str, int]:
        n = 0
        for pat, rep in ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"),
                         (PII_PHONE, "<PHONE>"), (PII_IDNUM, "<ID>")):
            n += len(re.findall(pat, t))
            t = re.sub(pat, rep, t)
        return t, n

    got = {r["doc_id"]: r
           for r in text_pii_redaction_corpus(spark, str(tmp_path)).collect()}
    for i, t in enumerate(texts):
        want, n = brute(t)
        assert got[i]["n_redactions"] == n
        assert got[i]["redacted_len"] == len(want)
        assert got[i]["redacted_md5"] == hashlib.md5(want.encode()).hexdigest()
    assert brute(texts[0])[0] == "mail <EMAIL> from <IP> ref <ID> now"
    assert got[2]["n_redactions"] == 0
    _assert_spark_matches_oracle(
        text_pii_redaction_corpus(spark, str(tmp_path)),
        tmp_path, ORACLE_PII_REDACTION, ("documents",),
    )


def test_chunk_size_quantiles_brute(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        CDC_MOD,
        mm_chunk_size_quantiles,
    )

    texts = [f"chunky payload number {chr(97 + i)} " * (3 + i)
             for i in range(9)]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])
    by_media: dict = {}
    for i, t in enumerate(texts):
        media = ("image", "audio", "video")[i % 3]
        for ck in _brute_cdc_chunks(t.encode(), CDC_MOD):
            by_media.setdefault(media, []).append((len(ck), i))
    got = {r["media_type"]: r
           for r in mm_chunk_size_quantiles(spark, str(tmp_path)).collect()}
    assert set(got) == set(by_media)
    for m, lens in by_media.items():
        lens.sort()
        n, r = len(lens), got[m]
        assert r["n_chunks"] == n
        for q in (50, 90, 99):
            assert r[f"p{q}_len"] == lens[(q * n + 99) // 100 - 1][0]


def test_bigram_entropy_rate_brute_and_ordering(spark, tmp_path):
    import math

    from spark_dba_spark.operators.curation import text_bigram_entropy_rate

    loop = "spam ham " * 30                     # H(next|prev) = 0
    prose = ("the quick brown fox jumps over a lazy dog and then runs "
             "far into the deep green forest while birds sing above")
    _write_docs(tmp_path, [loop, prose], ["loop", "prose"])
    got = {r["source"]: r
           for r in text_bigram_entropy_rate(spark, str(tmp_path)).collect()}
    assert got["loop"]["entropy_rate_nats"] == 0.0
    # singleton prefixes contribute zero empirical entropy, so a short
    # diverse doc scores small-but-positive; the separation from the
    # loop's exact 0 is the gate
    assert got["prose"]["entropy_rate_nats"] > 0.0

    def brute(text: str) -> float:
        ws = [t for t in text.split(" ") if t]
        pairs: dict = {}
        pre: dict = {}
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
            pre[a] = pre.get(a, 0) + 1
        n = sum(pairs.values())
        s1 = sum(round(c * math.log(c), 9) for c in pre.values())
        s2 = sum(round(c * math.log(c), 9) for c in pairs.values())
        return round((s1 - s2) / n, 6)

    for src, text in (("loop", loop), ("prose", prose)):
        assert abs(got[src]["entropy_rate_nats"] - brute(text)) < 2e-6


def test_asof_forward_matches_python_brute(spark):
    from spark_dba_spark.operators.curation import join_asof_forward

    con = duckdb.connect()
    orders = con.execute(
        f"SELECT o_custkey, epoch_us(o_orderdate), MAX(o_orderkey) FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2"
    ).fetchall()
    con.close()
    per_cust: dict = {}
    for ck, ous, ok in orders:
        per_cust.setdefault(ck, []).append((ous, ok))
    for v in per_cust.values():
        v.sort()
    rows = _events_rows()
    got = {r["event_id"]: r
           for r in join_asof_forward(spark, SF_DIR).collect()}
    assert len(got) == len(rows)
    for eid, us, uid, _, _ in rows:
        nxt = next(
            ((ous, ok) for ous, ok in per_cust.get(uid, ()) if ous >= us),
            None,
        )
        r = got[eid]
        if nxt is None:
            assert r["nx_orderkey"] is None and r["lead_hours"] is None
        else:
            assert r["nx_orderkey"] == nxt[1]
            assert r["lead_hours"] == (nxt[0] - us) // 3_600_000_000


def test_asof_forward_equal_time_is_inclusive(spark, tmp_path):
    """An order at exactly the event timestamp IS the next order
    (lead 0) — the inclusive boundary, same as the backward family."""
    from spark_dba_spark.operators.curation import (
        ORACLE_ASOF_FORWARD,
        join_asof_forward,
    )

    _write_orders(tmp_path, [(10, 1, T0_US), (11, 1, T0_US + US_PER_DAY)])
    _write_events(
        tmp_path,
        [
            (1, T0_US, 1, "click", 1.0),              # equal time -> 10
            (2, T0_US + 1, 1, "click", 1.0),          # 1us later -> 11
            (3, T0_US + 2 * US_PER_DAY, 1, "view", 1.0),  # nothing ahead
        ],
    )
    got = {r["event_id"]: r
           for r in join_asof_forward(spark, str(tmp_path)).collect()}
    assert got[1]["nx_orderkey"] == 10 and got[1]["lead_hours"] == 0
    assert got[2]["nx_orderkey"] == 11 and got[2]["lead_hours"] == 23
    assert got[3]["nx_orderkey"] is None
    _assert_spark_matches_oracle(
        join_asof_forward(spark, str(tmp_path)),
        tmp_path, ORACLE_ASOF_FORWARD, ("events", "orders"),
    )


def test_tenure_churn_hazard_brute(spark):
    from spark_dba_spark.operators.curation import (
        CHURN_SILENCE_DAYS,
        ev_tenure_churn_hazard,
    )

    per_user: dict = {}
    for _, us, uid, _, _ in _events_rows():
        d = us // 86_400_000_000
        lo, hi = per_user.get(uid, (d, d))
        per_user[uid] = (min(lo, d), max(hi, d))
    feed_end = max(hi for _, hi in per_user.values())
    tbl: dict = {}
    for lo, hi in per_user.values():
        w = (hi - lo) // 7
        cens = hi > feed_end - CHURN_SILENCE_DAYS
        e, c = tbl.get(w, (0, 0))
        tbl[w] = (e + (not cens), c + cens)
    got = {r["tenure_weeks"]: r
           for r in ev_tenure_churn_hazard(spark, SF_DIR).collect()}
    assert set(got) == set(tbl)
    for w, (e, c) in tbl.items():
        at_risk = sum(ee + cc for ww, (ee, cc) in tbl.items() if ww >= w)
        r = got[w]
        assert (r["n_ending"], r["n_censored"], r["n_at_risk"]) == (
            e, c, at_risk,
        )


def test_cell_purity_brute(spark):
    from spark_dba_spark.operators.curation import (
        GRID_SIGN_DIMS,
        emb_cell_purity_by_label,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding, label FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    con.close()
    cells: dict = {}
    for emb, label in rows:
        cell = sum(
            1 << d for d in range(GRID_SIGN_DIMS) if float(emb[d]) > 0.0
        )
        cells.setdefault(cell, {}).setdefault(label, [0])[0] += 1
    got = {r["cell"]: r
           for r in emb_cell_purity_by_label(spark, SF_DIR).collect()}
    assert set(got) == set(cells)
    for cell, by_label in cells.items():
        counts = {lb: c[0] for lb, c in by_label.items()}
        maj = min(counts, key=lambda lb: (-counts[lb], lb))
        r = got[cell]
        assert r["n_vectors"] == sum(counts.values())
        assert r["n_labels"] == len(counts)
        assert r["majority_label"] == maj
        assert r["majority_count"] == counts[maj]


def test_magic_mismatch_planted(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_MAGIC_MISMATCH,
        mm_magic_mismatch_audit,
    )

    texts = [
        "GIF87a-not-really-an-image but sniffs gif",   # doc 0: image/gif
        "%PDF-1.4 pretend document body",              # doc 1: audio/pdf!
        "RIFF....WAVEfmt pretend audio",               # doc 2: video/riff!
        "PK zip central directory pretend",            # doc 3: image/zip!
        "plain text payload with no magic",            # doc 4: audio/other
        "another plain payload",                       # doc 5: video/other
    ]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])
    got = {(r["media_type"], r["sniffed_class"]): r
           for r in mm_magic_mismatch_audit(spark, str(tmp_path)).collect()}
    assert got[("image", "gif")]["n_assets"] == 1
    assert got[("audio", "pdf")]["n_assets"] == 1
    assert got[("video", "riff")]["n_assets"] == 1
    assert got[("image", "zip")]["n_assets"] == 1
    assert got[("audio", "other")]["n_assets"] == 1
    assert got[("image", "gif")]["is_container_hit"] is True
    assert got[("audio", "other")]["is_container_hit"] is False
    assert got[("image", "gif")]["share_r6"] == 0.5
    _assert_spark_matches_oracle(
        mm_magic_mismatch_audit(spark, str(tmp_path)),
        tmp_path, ORACLE_MAGIC_MISMATCH, ("documents",),
    )


# ---------------------------------------------------------------------------
# Part 5 — continuation batch I (r14 backlog): brute twins
# ---------------------------------------------------------------------------


def _emb_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding, label FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_anisotropy_matches_numpy_brute(spark):
    import math

    import numpy as np

    from spark_dba_spark.operators.curation import emb_anisotropy_mean_vector

    q = np.array(
        [[int(float(x) * 1048576.0) for x in emb]
         for emb, _ in _emb_rows()],
        dtype=np.int64,
    )
    n = len(q)
    s = q.sum(axis=0)
    mu_norm = math.sqrt(float((s.astype(object) ** 2).sum())) / n
    norm_sum = sum(
        round(math.sqrt(float((row.astype(object) ** 2).sum())), 9)
        for row in q
    )
    mean_norm = norm_sum / n
    r = emb_anisotropy_mean_vector(spark, SF_DIR).collect()[0]
    assert r["n_vectors"] == n
    assert abs(r["mu_norm_q_r6"] - mu_norm) < 1e-5
    assert abs(r["mean_norm_q_r6"] - mean_norm) < 1e-5
    assert abs(r["anisotropy_r6"] - mu_norm / mean_norm) < 1e-6
    # a uniform-random cloud is near-isotropic; the ratio must be small
    assert r["anisotropy_r6"] < 0.2


def test_anisotropy_detects_common_direction(spark, tmp_path):
    """A cloud with a shared dominant direction must score near 1."""
    import numpy as np

    from spark_dba_spark.operators.curation import emb_anisotropy_mean_vector

    rng = np.random.RandomState(7)
    base = np.ones(64) * 0.5
    vecs = [base + rng.normal(0, 0.01, 64) for _ in range(50)]
    _write_embeddings(tmp_path, vecs)
    r = emb_anisotropy_mean_vector(spark, str(tmp_path)).collect()[0]
    assert r["anisotropy_r6"] > 0.99


def _write_embeddings(tmp_path, vecs, labels=None):
    n = len(vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels or [0] * n, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )


def test_source_tf_cosine_brute(spark):
    import math

    from spark_dba_spark.operators.curation import (
        text_source_tf_cosine_matrix,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT source, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    tf: dict = {}
    for src, text in rows:
        d = tf.setdefault(src, {})
        for t in text.split(" "):
            if t:
                d[t] = d.get(t, 0) + 1
    got = {(r["source_a"], r["source_b"]): r
           for r in text_source_tf_cosine_matrix(spark, SF_DIR).collect()}
    srcs = sorted(tf)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    import itertools
    for a, b in itertools.combinations(srcs, 2):
        dot = sum(c * tf[b].get(w, 0) for w, c in tf[a].items())
        na = math.sqrt(sum(c * c for c in tf[a].values()))
        nb = math.sqrt(sum(c * c for c in tf[b].values()))
        r = got[(a, b)]
        assert r["dot"] == dot
        assert abs(r["cos_r6"] - dot / (na * nb)) < 1e-6
        # same-generator sources should look alike: sanity ordering
        assert r["cos_r6"] > 0.5


def test_linear_counting_brute(spark):
    import hashlib
    import math

    from spark_dba_spark.operators.curation import (
        LC_M,
        sketch_linear_counting_error,
    )

    per_type: dict = {}
    for _, _, uid, et, _ in _events_rows():
        users, bits = per_type.setdefault(et, (set(), set()))
        users.add(uid)
        lane = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
        bits.add(lane % LC_M)
    got = {r["event_type"]: r
           for r in sketch_linear_counting_error(spark, SF_DIR).collect()}
    assert set(got) == set(per_type)
    for et, (users, bits) in per_type.items():
        r = got[et]
        assert r["exact_distinct"] == len(users)
        assert r["occupied_bits"] == len(bits)
        v = LC_M - len(bits)
        est = int(math.floor(-LC_M * math.log(v / LC_M) + 0.5))
        assert r["est_distinct"] == est
        assert r["abs_err"] == abs(est - len(users))
        # LC in its sweet spot (load factor < 1) stays within ~5%
        assert r["abs_err"] <= max(0.05 * len(users), 10)


def test_error_rate_by_load_brute(spark):
    from spark_dba_spark.operators.curation import ev_error_rate_by_load

    hours: dict = {}
    for _, us, _, et, _ in _events_rows():
        hr = us // 3_600_000_000
        n, e = hours.get(hr, (0, 0))
        hours[hr] = (n + 1, e + (et == "error"))
    ranked = sorted(hours.items(), key=lambda kv: (kv[1][0], kv[0]))
    nh = len(ranked)
    dec: dict = {}
    for i, (hr, (n, e)) in enumerate(ranked):
        d = (i * 10) // nh
        c = dec.setdefault(d, [0, 0, 0])
        c[0] += 1
        c[1] += n
        c[2] += e
    got = {r["load_decile"]: r
           for r in ev_error_rate_by_load(spark, SF_DIR).collect()}
    assert set(got) == set(dec)
    for d, (h, n, e) in dec.items():
        r = got[d]
        assert (r["n_hours"], r["n_events"], r["n_errors"]) == (h, n, e)


def test_theil_decomposition_identity(spark):
    """T_total computed flat over all positive balances must equal
    sum(share_g * T_g) + sum(between_g) — the decomposability that
    justifies the op's existence."""
    import math

    from spark_dba_spark.operators.curation import stats_theil_index_by_nation

    con = duckdb.connect()
    xs = [x for (x,) in con.execute(
        f"SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) FROM "
        f"read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall() if x > 0]
    con.close()
    n, xt = len(xs), sum(xs)
    t_total = sum((x / xt) * math.log((x / xt) * n) for x in xs)
    rows = stats_theil_index_by_nation(spark, SF_DIR).collect()
    assert sum(r["n_customers"] for r in rows) == n
    assert sum(r["cents_sum"] for r in rows) == xt
    recon = sum(
        r["value_share_r6"] * r["theil_within_r6"]
        + r["theil_between_term_r6"]
        for r in rows
    )
    assert abs(recon - t_total) < 1e-4, (recon, t_total)
    for r in rows:
        assert r["theil_within_r6"] >= 0.0  # within-group T is >= 0


# ---------------------------------------------------------------------------
# Part 6 — continuation batch J (r14 backlog): brute twins
# ---------------------------------------------------------------------------


def test_type_hourly_corr_brute(spark):
    import itertools
    import math

    from spark_dba_spark.operators.curation import ev_type_hourly_corr_matrix

    counts: dict = {}
    hrs = set()
    for _, us, _, et, _ in _events_rows():
        hr = us // 3_600_000_000
        hrs.add(hr)
        counts[(hr, et)] = counts.get((hr, et), 0) + 1
    h0, h1 = min(hrs), max(hrs)
    types = sorted({et for _, et in counts})
    grid = {t: [counts.get((h, t), 0) for h in range(h0, h1 + 1)]
            for t in types}
    got = {(r["type_a"], r["type_b"]): r
           for r in ev_type_hourly_corr_matrix(spark, SF_DIR).collect()}
    n = h1 - h0 + 1
    for a, b in itertools.combinations(types, 2):
        xa, xb = grid[a], grid[b]
        sa, sb = sum(xa), sum(xb)
        saa = sum(x * x for x in xa)
        sbb = sum(x * x for x in xb)
        sab = sum(x * y for x, y in zip(xa, xb))
        r = got[(a, b)]
        assert r["n_hours"] == n
        want = (n * sab - sa * sb) / (
            math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        )
        assert abs(r["pearson_r6"] - want) < 1e-6
        # same-load-driven synthetic types co-move positively
        assert -1.0 <= r["pearson_r6"] <= 1.0


def test_gumbel_daily_max_brute(spark):
    import math

    from spark_dba_spark.operators.curation import stats_evt_gumbel_daily_max

    dmax: dict = {}
    for _, us, _, et, v in _events_rows():
        day = us // 86_400_000_000
        c = int(math.floor(v * 100 + 0.5))
        k = (et, day)
        dmax[k] = max(dmax.get(k, 0), c)
    by_type: dict = {}
    for (et, _), mx in dmax.items():
        by_type.setdefault(et, []).append(mx)
    got = {r["event_type"]: r
           for r in stats_evt_gumbel_daily_max(spark, SF_DIR).collect()}
    for et, xs in by_type.items():
        n, s, s2 = len(xs), sum(xs), sum(x * x for x in xs)
        mean = s / n
        sigma = math.sqrt((n * s2 - s * s) / (n * n))
        beta = sigma * 0.7796968012336761
        mu = mean - 0.5772156649015329 * beta
        rl = mu - beta * math.log(-math.log(1 - 1 / 30))
        r = got[et]
        assert r["n_days"] == n and r["observed_max"] == max(xs)
        assert abs(r["gumbel_loc_r6"] - mu) < 1e-5
        assert abs(r["gumbel_scale_r6"] - beta) < 1e-5
        assert abs(r["return_level_30d_r6"] - rl) < 1e-5
        # the 30-day return level must sit above the fitted location
        assert r["return_level_30d_r6"] > r["gumbel_loc_r6"]


def test_chunk_boundary_stability_brute(spark, tmp_path):
    """Brute-verify the survival set on a planted corpus, and pin the
    qualitative claim: CDC survives a 1-byte prepend with most chunk
    hashes intact, while the first chunk (the only one whose content
    actually changes) is lost."""
    import hashlib

    from spark_dba_spark.operators.curation import (
        CDC_MOD,
        mm_chunk_boundary_stability,
    )

    texts = [f"stable payload body {chr(97 + i)} " * 8 for i in range(6)]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])

    def hashes(payload: bytes):
        return {
            hashlib.md5(ck.hex().upper().encode()).hexdigest()
            for ck in _brute_cdc_chunks(payload, CDC_MOD)
        }

    by_media: dict = {}
    for i, t in enumerate(texts):
        m = ("image", "audio", "video")[i % 3]
        o, s = by_media.setdefault(m, (set(), set()))
        o |= hashes(t.encode())
        s |= hashes(b"A" + t.encode())
    got = {r["media_type"]: r
           for r in mm_chunk_boundary_stability(spark, str(tmp_path))
           .collect()}
    for m, (o, s) in by_media.items():
        r = got[m]
        assert r["orig_chunks"] == len(o)
        assert r["shifted_chunks"] == len(s)
        assert r["surviving_chunks"] == len(o & s)
        # content-defined boundaries re-synchronize after the insertion
        assert r["survival_share_r6"] >= 0.5, r


def test_chunk_boundary_stability_fixture_high(spark):
    from spark_dba_spark.operators.curation import mm_chunk_boundary_stability

    rows = mm_chunk_boundary_stability(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        # the whole point of CDC: a 1-byte shift keeps the bulk of chunks
        assert r["survival_share_r6"] > 0.8, r


def test_token_budget_consistency_with_score(spark):
    """The budget curve must reproduce the composite score op's bands
    and be monotone in both cumulative columns."""
    from spark_dba_spark.operators.curation import (
        corpus_token_budget_by_quality,
        text_composite_quality_score,
    )

    per_band = {}
    for r in text_composite_quality_score(spark, SF_DIR).collect():
        per_band[r["score"]] = per_band.get(r["score"], 0) + r["n_docs"]
    rows = corpus_token_budget_by_quality(spark, SF_DIR).collect()
    assert {r["min_score"]: r["n_docs"] for r in rows} == per_band
    assert [r["min_score"] for r in rows] == sorted(
        per_band, reverse=True
    )
    cum_d = cum_t = 0
    for r in rows:  # descending score: cums must accumulate exactly
        cum_d += r["n_docs"]
        cum_t += r["n_tokens"]
        assert r["cum_docs"] == cum_d and r["cum_tokens"] == cum_t
    assert rows[-1]["token_share_kept_r6"] == 1.0


# ---------------------------------------------------------------------------
# Part 7 — continuation batch K (r14 backlog): brute twins
# ---------------------------------------------------------------------------


def test_lang_rebalance_brute(spark):
    from spark_dba_spark.operators.curation import corpus_lang_rebalance_plan

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    per_lang: dict = {}
    for lang, text in rows:
        d, t = per_lang.get(lang, (0, 0))
        per_lang[lang] = (d + 1, t + len([w for w in text.split(" ") if w]))
    tt = sum(t for _, t in per_lang.values())
    nl = len(per_lang)
    got = {r["lang"]: r
           for r in corpus_lang_rebalance_plan(spark, SF_DIR).collect()}
    assert set(got) == set(per_lang)
    for lang, (d, t) in per_lang.items():
        r = got[lang]
        assert (r["n_docs"], r["n_tokens"]) == (d, t)
        assert r["target_tokens"] == tt // nl
        want = "downsample" if t * nl > tt else (
            "upsample" if t * nl < tt else "keep")
        assert r["action"] == want
    # the dominant language must be marked for downsampling
    top = max(per_lang, key=lambda k: per_lang[k][1])
    assert got[top]["action"] == "downsample"
    assert got[top]["sample_factor_r6"] < 1.0


def test_hhi_monthly_brute(spark):
    import math

    from spark_dba_spark.operators.curation import orders_hhi_monthly_trend

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(date_trunc('month', o_orderdate) AS DATE), o_custkey,"
        f" CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
        f" FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    per: dict = {}
    for m, ck, c in rows:
        per.setdefault(m, {})
        per[m][ck] = per[m].get(ck, 0) + c
    got = {r["month"]: r
           for r in orders_hhi_monthly_trend(spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for m, cust in per.items():
        xt = sum(cust.values())
        hhi = sum(x * x for x in cust.values()) / (xt * xt)
        r = got[m]
        assert r["n_customers"] == len(cust)
        assert r["cents_total"] == xt
        assert abs(r["hhi_r6"] - hhi) < 1e-6
        assert abs(r["eff_customers_r6"] - 1 / hhi) < 1e-3
        # HHI is bounded by [1/n, 1]
        assert 1 / len(cust) - 1e-9 <= r["hhi_r6"] <= 1.0


# ---------------------------------------------------------------------------
# Part 8 — zero-row audit remediation: graph_common_neighbors planted twin
# (ZEROROWS_r13: the fixture near-dup graph has no open wedge, so the op's
# fixture green was vacuous; this corpus plants one)
# ---------------------------------------------------------------------------


def test_common_neighbors_planted_wedge(spark, tmp_path):
    """A~B and B~C are word-3-gram near-dups (J = 16/20 = 0.8 = tau)
    but A~C is not (J = 14/22) — the open wedge must surface exactly
    one predicted link (A, C) with cn = 1 through their shared
    neighbor B."""
    from spark_dba_spark.operators.dedup import (
        dedup_ngram_jaccard,
        graph_common_neighbors,
    )

    base = [f"w{i}" for i in range(20)]
    b = " ".join(base)
    a = " ".join(base[:-2] + ["xa1", "xa2"])      # last 2 tokens differ
    c = " ".join(["xc1", "xc2"] + base[2:])       # first 2 tokens differ
    _write_docs(tmp_path, [a, b, c], ["s0", "s1", "s2"])
    edges = {(r["doc_a"], r["doc_b"])
             for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()}
    assert edges == {(0, 1), (1, 2)}  # the wedge, no A-C edge
    got = graph_common_neighbors(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 2)
    assert r["cn"] == 1
    assert r["deg_a"] == 1 and r["deg_c"] == 1
    # jaccard = cn / (deg_a + deg_c - cn) = 1/1
    assert r["nbr_jaccard_r6"] == 1.0


# ---------------------------------------------------------------------------
# Part 9 — continuation batch L (r14 backlog): brute / planted twins
# ---------------------------------------------------------------------------


def test_order_event_recon_fixture_unmatched_and_planted(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_ORDER_EVENT_RECON,
        ev_order_event_reconciliation,
    )

    # fixture feeds are ~23y apart: every purchase legitimately
    # unmatched (the asof_tolerance vacuity lesson — assert it)
    rows = ev_order_event_reconciliation(spark, SF_DIR).collect()
    assert len(rows) > 0
    assert all(r["n_matched"] == 0 for r in rows)
    assert all(r["n_unmatched"] == r["n_purchases"] for r in rows)

    # planted: order inside / outside the 7-day window + no-order user
    _write_orders(
        tmp_path,
        [(10, 1, T0_US + 3 * US_PER_DAY), (11, 2, T0_US + 20 * US_PER_DAY)],
    )
    _write_events(
        tmp_path,
        [
            (1, T0_US, 1, "purchase", 5.0),                 # matched (3d)
            (2, T0_US, 2, "purchase", 5.0),                 # order at 20d: no
            (3, T0_US + US_PER_DAY, 3, "purchase", 5.0),    # no orders
            (4, T0_US, 1, "click", 1.0),                    # not a purchase
        ],
    )
    got = {r["day"]: r
           for r in ev_order_event_reconciliation(
               spark, str(tmp_path)).collect()}
    d0 = T0_US // US_PER_DAY
    assert got[d0]["n_purchases"] == 2
    assert got[d0]["n_matched"] == 1
    assert got[d0]["matched_share_r6"] == 0.5
    assert got[d0 + 1]["n_matched"] == 0
    _assert_spark_matches_oracle(
        ev_order_event_reconciliation(spark, str(tmp_path)),
        tmp_path, ORACLE_ORDER_EVENT_RECON, ("events", "orders"),
    )


def test_attribution_window_sweep_brute(spark):
    from spark_dba_spark.operators.curation import (
        ATTR_SWEEP_US,
        ev_attribution_window_sweep,
    )

    clicks: dict = {}
    purchases = []
    for eid, us, uid, et, _ in _events_rows():
        if et == "click":
            clicks.setdefault(uid, []).append(us)
        elif et == "purchase":
            purchases.append((uid, us))
    for v in clicks.values():
        v.sort()
    import bisect
    ages = []
    for uid, us in purchases:
        cs = clicks.get(uid, ())
        i = bisect.bisect_right(cs, us)
        ages.append(us - cs[i - 1] if i else None)
    got = {r["window_label"]: r
           for r in ev_attribution_window_sweep(spark, SF_DIR).collect()}
    assert set(got) == {lb for lb, _ in ATTR_SWEEP_US}
    prev = -1
    for lb, us in ATTR_SWEEP_US:
        want = sum(1 for a in ages if a is not None and a <= us)
        r = got[lb]
        assert r["n_purchases"] == len(purchases)
        assert r["n_attributed"] == want
        # monotone in the window length
        assert r["n_attributed"] >= prev
        prev = r["n_attributed"]
    assert got["7d"]["n_attributed"] > 0  # the sweep fires on fixtures


def test_dup_quality_crosstab_planted(spark, tmp_path):
    from spark_dba_spark.operators.curation import (
        ORACLE_DUP_QUALITY_CROSSTAB,
        corpus_dup_quality_crosstab,
    )

    good = ("the quick brown fox jumps over a lazy dog and then it runs "
            "far away into the deep green forest tonight")
    junk = "spam " * 40
    texts = [good, good, junk, junk, junk,
             "alpha beta gamma delta epsilon zeta eta theta iota kappa"]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])
    got = {(r["score"], r["is_dup"]): r
           for r in corpus_dup_quality_crosstab(
               spark, str(tmp_path)).collect()}
    # the two 'good' copies are dups at score 100; the three junk
    # copies are dups at their (low) band; the singleton is not a dup
    assert got[(100, True)]["n_docs"] == 2
    assert got[(100, True)]["band_share_r6"] == 1.0
    dup_low = [k for k in got if k[1] and k[0] < 100]
    assert len(dup_low) == 1 and got[dup_low[0]]["n_docs"] == 3
    singles = [k for k in got if not k[1]]
    assert sum(got[k]["n_docs"] for k in singles) == 1
    _assert_spark_matches_oracle(
        corpus_dup_quality_crosstab(spark, str(tmp_path)),
        tmp_path, ORACLE_DUP_QUALITY_CROSSTAB, ("documents",),
    )


def test_zipf_user_activity_brute(spark):
    import math

    from spark_dba_spark.operators.curation import (
        ZIPF_USER_HEAD,
        ev_zipf_user_activity,
    )

    counts: dict = {}
    for _, _, uid, et, _ in _events_rows():
        counts[(et, uid)] = counts.get((et, uid), 0) + 1
    by_type: dict = {}
    for (et, uid), c in counts.items():
        by_type.setdefault(et, []).append((c, uid))
    got = {r["event_type"]: r
           for r in ev_zipf_user_activity(spark, SF_DIR).collect()}
    for et, cu in by_type.items():
        cu.sort(key=lambda t: (-t[0], t[1]))
        head = cu[:ZIPF_USER_HEAD]
        xs = [math.log(i + 1) for i in range(len(head))]
        ys = [math.log(c) for c, _ in head]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        r = got[et]
        assert r["n_users_fitted"] == n
        assert r["top_user_events"] == head[0][0]
        assert abs(r["zipf_slope"] - slope) < 1e-3


# ---------------------------------------------------------------------------
# Part 10 — continuation batch M (r14 backlog): brute / planted twins
# ---------------------------------------------------------------------------


def test_pack_efficiency_brute(spark):
    from spark_dba_spark.operators.curation import (
        PACK_WINDOWS,
        corpus_pack_efficiency_by_window,
    )

    con = duckdb.connect()
    toks = [len([w for w in t.split(" ") if w]) for (t,) in con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()]
    con.close()
    toks = [t for t in toks if t > 0]
    got = {r["window_tokens"]: r
           for r in corpus_pack_efficiency_by_window(
               spark, SF_DIR).collect()}
    assert set(got) == set(PACK_WINDOWS)
    prev_waste = -1.0
    for w in PACK_WINDOWS:
        need = sum((t + w - 1) // w for t in toks)
        r = got[w]
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == sum(toks)
        assert r["windows_needed"] == need
        want = (need * w - sum(toks)) / (need * w)
        assert abs(r["padding_waste_r6"] - want) < 1e-6
        # bigger windows waste more padding on short docs: monotone here
        assert r["padding_waste_r6"] >= prev_waste
        prev_waste = r["padding_waste_r6"]


def test_periodicity_planted_stride(spark, tmp_path):
    """A payload with a strict 4-byte record structure must light up at
    lag 4 (and its multiples 8, 16) and stay low at lag 2."""
    import math

    from spark_dba_spark.operators.curation import (
        PERIOD_LAGS,
        mm_payload_periodicity_probe,
    )

    rec = "ab3Z"  # 4-byte record repeated: perfect lag-4 correlation
    structured = rec * 50
    texts = [structured, structured, structured]  # docs 0,1,2 -> all media
    _write_docs(tmp_path, texts, ["s0", "s1", "s2"])
    got = {(r["media_type"], r["lag"]): r["autocorr_r6"]
           for r in mm_payload_periodicity_probe(
               spark, str(tmp_path)).collect()}
    for m in ("image", "audio", "video"):
        assert got[(m, 4)] > 0.99
        assert got[(m, 8)] > 0.99
        assert got[(m, 2)] < 0.9

    def brute(payload: bytes, lag: int) -> float:
        xs = list(payload[:-lag])
        ys = list(payload[lag:])
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        return (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )

    for lag in PERIOD_LAGS:
        assert abs(got[("image", lag)]
                   - brute(structured.encode(), lag)) < 1e-6


def test_weekend_mix_ztest_brute(spark):
    import math

    from spark_dba_spark.operators.curation import stats_weekend_mix_ztest

    per: dict = {}
    for _, us, _, et, _ in _events_rows():
        wk = ((us // 86_400_000_000) + 3) % 7 >= 5
        n, x = per.get(et, (0, 0))
        per[et] = (n + 1, x + wk)
    nt = sum(n for n, _ in per.values())
    xt = sum(x for _, x in per.values())
    got = {r["event_type"]: r
           for r in stats_weekend_mix_ztest(spark, SF_DIR).collect()}
    for et, (n1, x1) in per.items():
        p1, p2 = x1 / n1, (xt - x1) / (nt - n1)
        pp = xt / nt
        z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / (nt - n1)))
        r = got[et]
        assert (r["n_events"], r["n_weekend"]) == (n1, x1)
        assert abs(r["z_r6"] - z) < 1e-6
    # the z-stats of a complete partition roughly balance around zero
    assert min(r["z_r6"] for r in got.values()) < 0 < max(
        r["z_r6"] for r in got.values()
    ) or all(abs(r["z_r6"]) < 2 for r in got.values())


def test_twonn_matches_numpy_brute_and_planted_manifold(spark, tmp_path):
    import math

    import numpy as np

    from spark_dba_spark.operators.curation import (
        TWONN_PROBES,
        emb_intrinsic_dim_twonn,
    )

    q = np.array(
        [[int(float(x) * 1048576.0) for x in emb]
         for emb, _ in _emb_rows()],
        dtype=np.int64,
    )
    s = 0.0
    n_probes = 0
    for pid in range(min(TWONN_PROBES, len(q))):
        d2 = ((q - q[pid]) ** 2).sum(axis=1)
        d2[pid] = -1
        pos = sorted(d for d in d2 if d > 0)
        d1, d2_ = pos[0], pos[1]
        s += round(math.log(d2_ / d1) / 2.0, 9)
        n_probes += 1
    r = emb_intrinsic_dim_twonn(spark, SF_DIR).collect()[0]
    assert r["n_probes"] == n_probes
    assert abs(r["sum_log_ratio_r6"] - s) < 1e-5
    assert abs(r["intrinsic_dim_r6"] - n_probes / s) < 1e-2
    # uniform-random 64-dim: estimate must be high-dimensional
    assert r["intrinsic_dim_r6"] > 20

    # planted 2-dim manifold embedded in 64 dims: estimate near 2
    rng = np.random.RandomState(3)
    uv = rng.uniform(-1, 1, (300, 2))
    basis = np.zeros((2, 64))
    basis[0, 0] = 1.0
    basis[1, 1] = 1.0
    _write_embeddings(tmp_path, uv @ basis)
    r2 = emb_intrinsic_dim_twonn(spark, str(tmp_path)).collect()[0]
    assert 1.0 < r2["intrinsic_dim_r6"] < 4.0, r2
