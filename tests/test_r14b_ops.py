"""Round-14 continuation (second window) tests — batch S planted twins.

One micro-fixture test per operator in ``spark_dba_spark/operators/
analytics.py``: hand-computable inputs, exact expected values, plus the
DuckDB oracle run on the SAME planted tables (so the twin pins both the
Spark plan and the oracle SQL to the by-hand arithmetic).
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from conftest import normalize_rows

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
T0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC (a Monday)
T0_DAY = T0_US // US_PER_DAY


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
        rows = [tuple(d.values())
                for d in res.fetch_arrow_table().to_pylist()]
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


def _r6(num: int, den: int) -> float:
    """The house half-up 6dp rational readout, in exact int arithmetic."""
    assert num >= 0 and den > 0
    return float((num * 2_000_000 + den) // (2 * den)) / 1e6


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


def _write_docs(tmp_path, texts, sources=None, langs=None):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs or ["en"] * len(texts)),
                "source": pa.array(sources or ["s0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )


def _write_embeddings(tmp_path, vecs, labels):
    full = [list(v) + [0.0] * (64 - len(v)) for v in vecs]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(full)), pa.int64()),
                "embedding": pa.array(full, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )


def _write_orders_lineitem(tmp_path, orders, lines):
    """orders: (orderkey, priority, orderdate_day); lines: (orderkey,
    shipdate_day). Only the columns the Little's-law op touches."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_orderpriority": pa.array([r[1] for r in orders]),
                "o_orderdate": pa.array(
                    [r[2] * US_PER_DAY for r in orders], pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_shipdate": pa.array(
                    [r[1] * US_PER_DAY for r in lines], pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )


# ---------------------------------------------------------------------------
# orders_littles_law_audit
# ---------------------------------------------------------------------------


def test_littles_law_planted(spark, tmp_path):
    """Two orders, hand-set open intervals: the moment path and the
    bucket-spine expansion must agree (L = lambda * W holds) and every
    rational matches the by-hand value."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_LITTLES_LAW,
        orders_littles_law_audit,
    )

    # order 1: open day 0..59 (buckets b0..b0+1); order 2: day 30 only.
    _write_orders_lineitem(
        tmp_path,
        orders=[(1, "1-URGENT", T0_DAY), (2, "1-URGENT", T0_DAY + 30)],
        lines=[(1, T0_DAY), (1, T0_DAY + 59), (2, T0_DAY + 30)],
    )
    df = orders_littles_law_audit(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_LITTLES_LAW, ["orders", "lineitem"]
    )
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    b0 = T0_DAY // 30
    eb1 = (T0_DAY + 59) // 30
    dur1 = eb1 - b0 + 1
    sb2 = (T0_DAY + 30) // 30
    sum_dur = dur1 + 1
    span = eb1 - b0 + 1
    assert r["n_orders"] == 2
    assert r["span_buckets"] == span
    assert r["sum_dur_buckets"] == sum_dur
    assert r["spine_open_buckets"] == sum_dur  # the reconciliation
    assert r["littles_law_holds"] is True
    assert r["lambda_per_bucket_r6"] == _r6(2, span)
    assert r["w_buckets_r6"] == _r6(sum_dur, 2)
    assert r["w_days_r6"] == _r6(60 + 1, 2)  # durations 60 and 1 days
    assert r["l_avg_open_r6"] == _r6(sum_dur, span)
    assert sb2 in range(b0, eb1 + 1)  # order 2 sits inside the span


def test_littles_law_negative_latency_excluded(spark, tmp_path):
    """An order shipping BEFORE its order date must be excluded on both
    engines (Spark's descending sequence() vs DuckDB's empty
    generate_series would otherwise diverge)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_LITTLES_LAW,
        orders_littles_law_audit,
    )

    _write_orders_lineitem(
        tmp_path,
        orders=[(1, "1-URGENT", T0_DAY), (2, "1-URGENT", T0_DAY + 40)],
        lines=[(1, T0_DAY + 5), (2, T0_DAY)],  # order 2: ships 40d early
    )
    df = orders_littles_law_audit(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_LITTLES_LAW, ["orders", "lineitem"]
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["n_orders"] == 1  # the time traveler is gone


# ---------------------------------------------------------------------------
# stats_nelson_aalen_interarrival
# ---------------------------------------------------------------------------


def test_nelson_aalen_planted_gaps(spark, tmp_path):
    """u1 events at hours 0,1,3; u2 at hour 0. Completed gaps 1h, 2h;
    censored gaps 0h (u1 final) and 3h (u2 final). Risk sets and ppb
    hazards are hand-computed."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_NELSON_AALEN,
        stats_nelson_aalen_interarrival,
    )

    _write_events(
        tmp_path,
        [
            (0, T0_US, 1, "click", 1.0),
            (1, T0_US + US_PER_HOUR, 1, "click", 1.0),
            (2, T0_US + 3 * US_PER_HOUR, 1, "click", 1.0),
            (3, T0_US, 2, "view", 1.0),
        ],
    )
    df = stats_nelson_aalen_interarrival(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_NELSON_AALEN, ["events"]
    )
    rows = {r["gap_hours"]: r for r in df.collect()}
    assert set(rows) == {1, 2}
    # t=1: risk {1,2,3} -> 3; one completion -> 1/3 half-up at ppb
    assert rows[1]["n_risk"] == 3
    assert rows[1]["n_completed"] == 1
    assert rows[1]["hazard_r9"] == 0.333333333
    # t=2: risk {2,3} -> 2; one completion -> 1/2
    assert rows[2]["n_risk"] == 2
    assert rows[2]["hazard_r9"] == 0.5
    assert rows[2]["cum_hazard_r9"] == 0.833333333


# ---------------------------------------------------------------------------
# text_readability_grid
# ---------------------------------------------------------------------------


def test_readability_brute(spark, tmp_path):
    """Exact-Fraction brute recompute of the pooled LIX/RIX grid on
    punctuated, long-word text (the fixture corpus has no terminal
    punctuation, so the twin is what exercises the sentence split)."""
    from spark_dba_spark.operators.analytics import (
        LIX_LONG_LEN,
        ORACLE_READABILITY,
        text_readability_grid,
    )

    texts = [
        "the wonderful elephants marched. tiny ants followed! why?",
        "a b c d e f g h.",
        "supercalifragilistic expialidocious. brevity!",
        "no punctuation here just plain words",
    ]
    sources = ["s0", "s0", "s1", "s1"]
    _write_docs(tmp_path, texts, sources=sources)
    df = text_readability_grid(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_READABILITY, ["documents"]
    )
    got = {r["source"]: r for r in df.collect()}
    for src in ("s0", "s1"):
        ws = lws = ss = nd = 0
        for t, s in zip(texts, sources):
            if s != src:
                continue
            toks = t.split(" ")
            ws += len(toks)
            lws += sum(1 for x in toks if len(x) >= LIX_LONG_LEN)
            ss += max(1, sum(t.count(c) for c in ".!?"))
            nd += 1
        r = got[src]
        assert r["n_docs"] == nd
        lix = Fraction(ws * ws + 100 * lws * ss, ss * ws)
        # qrem == plain half-up for these magnitudes
        assert r["lix_r6"] == _r6(lix.numerator, lix.denominator)
        assert r["rix_r6"] == _r6(lws, ss)
        assert r["asl_r6"] == _r6(ws, ss)
        assert r["long_share_r6"] == _r6(lws, ws)


# ---------------------------------------------------------------------------
# emb_triplet_margin_rate
# ---------------------------------------------------------------------------


def test_triplet_margin_separated_clusters(spark, tmp_path):
    """Two tight, well-separated label clusters: every triplet must be
    strictly satisfied (d2_neg > d2_pos), with positive margins."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_TRIPLET_MARGIN,
        emb_triplet_margin_rate,
    )

    rng = np.random.default_rng(11)
    c0 = rng.normal(size=64)
    c1 = c0 + 10.0  # far-away second cluster
    vecs = [
        (c0 + 0.01 * rng.normal(size=64)).tolist(),
        (c0 + 0.01 * rng.normal(size=64)).tolist(),
        (c0 + 0.01 * rng.normal(size=64)).tolist(),
        (c1 + 0.01 * rng.normal(size=64)).tolist(),
        (c1 + 0.01 * rng.normal(size=64)).tolist(),
    ]
    _write_embeddings(tmp_path, vecs, labels=[0, 0, 0, 1, 1])
    df = emb_triplet_margin_rate(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_TRIPLET_MARGIN, ["embeddings"]
    )
    rows = {r["label"]: r for r in df.collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["n_triplets"] == 3 and rows[1]["n_triplets"] == 2
    for r in rows.values():
        assert r["n_strict"] == r["n_triplets"]
        assert r["n_ties"] == 0
        assert r["strict_rate_r6"] == 1.0
        assert r["margin_min"] > 0


def test_triplet_singleton_label_excluded(spark, tmp_path):
    """A singleton label yields no anchors (no positive exists) but
    still serves as the negative pool for its neighbor."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_TRIPLET_MARGIN,
        emb_triplet_margin_rate,
    )

    rng = np.random.default_rng(12)
    vecs = [rng.normal(size=64).tolist() for _ in range(3)]
    _write_embeddings(tmp_path, vecs, labels=[0, 0, 5])
    df = emb_triplet_margin_rate(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_TRIPLET_MARGIN, ["embeddings"]
    )
    rows = df.collect()
    assert [r["label"] for r in rows] == [0]  # label 5 emits nothing
    assert rows[0]["n_triplets"] == 2


# ---------------------------------------------------------------------------
# sketch_ams_f2_error
# ---------------------------------------------------------------------------


def test_ams_f2_brute(spark, tmp_path):
    """numpy/hashlib brute twin: 3 events for user 7, 1 for user 9 —
    F2 = 10; every lane sketch, the mean/median estimates, and the
    Chebyshev verdict recomputed from first principles."""
    from spark_dba_spark.operators.analytics import (
        AMS_CHEB_5SIGMA_BP,
        AMS_LANES,
        ORACLE_AMS_F2,
        sketch_ams_f2_error,
    )

    rows = [
        (0, T0_US, 7, "click", 1.0),
        (1, T0_US + 1, 7, "click", 1.0),
        (2, T0_US + 2, 7, "click", 1.0),
        (3, T0_US + 3, 9, "view", 1.0),
    ]
    _write_events(tmp_path, rows)
    df = sketch_ams_f2_error(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_AMS_F2, ["events"])
    r = df.collect()[0]
    assert r["n_events"] == 4 and r["n_keys"] == 2
    assert r["f2_exact"] == 10  # 3^2 + 1^2

    def h(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

    ests = []
    for j in range(AMS_LANES):
        s = sum(
            c * (((h(u) >> j) & 1) * 2 - 1) for u, c in ((7, 3), (9, 1))
        )
        ests.append(s * s)
    sum_est = sum(ests)
    assert r["est_mean16"] == sum_est / 16
    se = sorted(ests)
    assert r["est_median16"] == (se[7] + se[8]) / 2
    import math

    assert r["rel_err_t6"] == math.floor(
        abs(sum_est / 16 - 10.0) / 10.0 * 1e6
    ) / 1e6
    assert r["within_5sigma"] == (
        abs(sum_est - 16 * 10) * 10000 <= AMS_CHEB_5SIGMA_BP * 16 * 10
    )


# ---------------------------------------------------------------------------
# corpus_dedup_quality_shift
# ---------------------------------------------------------------------------


def test_dedup_quality_shift_planted(spark, tmp_path):
    """s0: duplicated short doc + unique long doc -> TV = 1/6 by hand;
    s2's only doc is a cross-source copy of s0's (global keep-lowest
    drops it) -> zero survivors, mix TV NULL on both engines."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_DEDUP_QUALITY_SHIFT,
        corpus_dedup_quality_shift,
    )

    short = "tiny doc"  # 2 words -> band 0
    long_ = " ".join(f"w{i}" for i in range(25))  # 25 words -> band 1
    texts = [short, short, long_, short]
    sources = ["s0", "s0", "s0", "s2"]
    _write_docs(tmp_path, texts, sources=sources)
    df = corpus_dedup_quality_shift(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_DEDUP_QUALITY_SHIFT, ["documents"]
    )
    rows = {r["source"]: r for r in df.collect()}
    r0 = rows["s0"]
    assert (r0["n_pre"], r0["n_post"]) == (3, 2)
    assert r0["kept_share_r6"] == _r6(2, 3)
    # cells pre (2,1), post (1,1): TV = (|2*2-1*3| + |1*2-1*3|)/(2*3*2)
    assert r0["mix_tv_r6"] == _r6(2, 12)
    assert r0["top_shift_cell"] == "en:0"  # |num| tie -> band asc
    r2 = rows["s2"]
    assert (r2["n_pre"], r2["n_post"]) == (1, 0)
    assert r2["kept_share_r6"] == 0.0
    assert r2["mix_tv_r6"] is None  # agreed div-by-zero NULL readout


# ---------------------------------------------------------------------------
# Batch T twins
# ---------------------------------------------------------------------------


def _write_orders_lines_rev(tmp_path, orders, lines):
    """orders: (orderkey, orderdate_day); lines: (orderkey, partkey,
    extendedprice, discount). Only the columns the ABC op touches."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_orderdate": pa.array(
                    [r[1] * US_PER_DAY for r in orders], pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
                "l_extendedprice": pa.array(
                    [float(r[2]) for r in lines], pa.float64()
                ),
                "l_discount": pa.array(
                    [float(r[3]) for r in lines], pa.float64()
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )


def test_abc_migration_planted(spark, tmp_path):
    """Hand-built two-year assortment: classes and all four migration
    lanes (A->B, B->A, C->OUT, NEW->C) land exactly."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_ABC_MIGRATION,
        orders_abc_migration,
    )

    d95 = 9131   # 1995-01-01 epoch day
    d96 = 9496   # 1996-01-01 epoch day
    _write_orders_lines_rev(
        tmp_path,
        orders=[(1, d95), (2, d96)],
        lines=[
            (1, 101, 70.0, 0.0),  # Y1: p101 70% -> A
            (1, 102, 20.0, 0.0),  # Y1: p102 cum 90% -> B
            (1, 103, 10.0, 0.0),  # Y1: p103 cum 100% -> C
            (2, 102, 70.0, 0.0),  # Y2: p102 -> A
            (2, 101, 20.0, 0.0),  # Y2: p101 -> B
            (2, 104, 10.0, 0.0),  # Y2: p104 -> C (new)
        ],
    )
    df = orders_abc_migration(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_ABC_MIGRATION, ["orders", "lineitem"]
    )
    got = {
        (r["year"], r["class_from"], r["class_to"]): r["n_parts"]
        for r in df.collect()
    }
    assert got == {
        (1996, "A", "B"): 1,
        (1996, "B", "A"): 1,
        (1996, "C", "OUT"): 1,
        (1996, "NEW", "C"): 1,
    }


def test_split_balance_brute(spark, tmp_path):
    """Fraction-exact brute recompute of all four balance rows from the
    md5 bucket rule applied in python."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_SPLIT_BALANCE,
        SPLIT_BAL_BUCKETS,
        split_covariate_balance,
    )

    texts = [f"tok{i} " * (i + 1) for i in range(30)]
    texts = [t.strip() for t in texts]
    langs = ["en" if i % 3 else "de" for i in range(30)]
    sources = [f"s{i % 4}" for i in range(30)]
    _write_docs(tmp_path, texts, sources=sources, langs=langs)
    df = split_covariate_balance(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_SPLIT_BALANCE, ["documents"]
    )
    is_train = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16)
        % SPLIT_BAL_BUCKETS
        < SPLIT_BAL_BUCKETS - 2
        for i in range(30)
    ]
    n1, n2 = sum(is_train), 30 - sum(is_train)
    nc = [len(t) for t in texts]
    nw = [len(t.split(" ")) for t in texts]
    got = {r["covariate"]: r for r in df.collect()}
    assert got["n_chars_mean_absdiff"]["n_train"] == n1
    assert got["n_chars_mean_absdiff"]["n_eval"] == n2
    for name, vals in (("n_chars_mean_absdiff", nc),
                       ("n_words_mean_absdiff", nw)):
        s1 = sum(v for v, t in zip(vals, is_train) if t)
        s2 = sum(v for v, t in zip(vals, is_train) if not t)
        assert got[name]["value_r6"] == _r6(
            abs(s1 * n2 - s2 * n1), n1 * n2
        )
    for name, cats in (("lang_mix_tv", langs), ("source_mix_tv", sources)):
        snum = 0
        for c in set(cats):
            x = sum(1 for v, t in zip(cats, is_train) if t and v == c)
            y = sum(1 for v, t in zip(cats, is_train) if not t and v == c)
            snum += abs(x * n2 - y * n1)
        assert got[name]["value_r6"] == _r6(snum, 2 * n1 * n2)


def test_simhash_bit_bias_brute(spark, tmp_path):
    """python md5 brute of the 60-bit SimHash per doc -> per-bit one
    counts must match exactly (pins the shared signature expression)."""
    from spark_dba_spark.operators.analytics import (
        _simhash_bias_oracle,
        dedup_simhash_bit_bias,
    )

    texts = ["alpha beta gamma", "alpha alpha delta", "x y z w"]
    _write_docs(tmp_path, texts)
    df = dedup_simhash_bit_bias(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, _simhash_bias_oracle(), ["documents"]
    )

    def sig(text):
        votes = [0] * 60
        for w in text.split(" "):
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            for i in range(60):
                votes[i] += ((h >> i) & 1) * 2 - 1
        return [1 if v > 0 else 0 for v in votes]

    sigs = [sig(t) for t in texts]
    ones = [sum(s[i] for s in sigs) for i in range(60)]
    got = {r["bit"]: r for r in df.collect()}
    assert len(got) == 60
    for i in range(60):
        assert got[i]["n_docs"] == 3
        assert got[i]["n_ones"] == ones[i]
        assert got[i]["one_rate_r6"] == _r6(ones[i], 3)
        assert got[i]["chi2_lane_r6"] == _r6((2 * ones[i] - 3) ** 2, 3)


def test_chi2_uniformity_planted(spark, tmp_path):
    """doc 0 (image): one byte in each of bands 0-7 -> chi2 = 8.0,
    passes the alpha=0.001 gate; doc 1 (audio): 4 identical bytes ->
    chi2 = 60.0, decisively non-uniform."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_CHI2_UNIFORMITY,
        mm_payload_chi2_uniformity,
    )

    even8 = "".join(chr(b) for b in range(0x02, 0x80, 0x10))  # bands 0-7
    _write_docs(tmp_path, [even8, "AAAA"])
    df = mm_payload_chi2_uniformity(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_CHI2_UNIFORMITY, ["documents"]
    )
    got = {r["media_type"]: r for r in df.collect()}
    img = got["image"]  # doc_id 0
    assert img["n_bytes"] == 8
    # 8 cells of (16*1-8)^2 + 8 cells of (0-8)^2 = 8*64+8*64 = 1024
    assert img["chi2_r6"] == _r6(1024, 16 * 8)  # = 8.0
    assert img["is_uniform_a001"] is True
    aud = got["audio"]  # doc_id 1: 'AAAA' all in band 4
    assert aud["n_bytes"] == 4
    assert aud["chi2_r6"] == 60.0
    assert aud["is_uniform_a001"] is False


def test_friedman_planted(spark, tmp_path):
    """Perfectly consistent 2x2 design -> chi2_F = n(k-1) = 2 exactly;
    a planted within-day tie exercises the average-rank lane."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_FRIEDMAN,
        stats_friedman_daily_types,
    )

    rows = [
        (0, T0_US, 1, "A", 10.0),
        (1, T0_US + 1, 1, "B", 1.0),
        (2, T0_US + US_PER_DAY, 1, "A", 10.0),
        (3, T0_US + US_PER_DAY + 1, 1, "B", 1.0),
    ]
    _write_events(tmp_path, rows)
    df = stats_friedman_daily_types(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_FRIEDMAN, ["events"])
    r = df.collect()[0]
    assert (r["n_days"], r["n_types"]) == (2, 2)
    assert r["friedman_chi2_r6"] == 2.0
    assert r["top_type"] == "A" and r["bottom_type"] == "B"

    # tie day: both types equal on day 0 -> average ranks, chi2 halves
    rows_tie = [
        (0, T0_US, 1, "A", 5.0),
        (1, T0_US + 1, 1, "B", 5.0),
        (2, T0_US + US_PER_DAY, 1, "A", 10.0),
        (3, T0_US + US_PER_DAY + 1, 1, "B", 1.0),
    ]
    _write_events(tmp_path, rows_tie)
    df2 = stats_friedman_daily_types(spark, str(tmp_path))
    _assert_spark_matches_oracle(df2, tmp_path, ORACLE_FRIEDMAN, ["events"])
    r2 = df2.collect()[0]
    # day0: r2 = 3 for both (avg rank 1.5); day1: B 2, A 4
    # rsum2: A 7, B 5 -> ss = 74; num = 3*74 - 3*4*2*9 = 6; den = 12
    assert r2["friedman_chi2_r6"] == 0.5
    assert r2["top_type"] == "A"


def test_jsd_planted(spark, tmp_path):
    """s0 = 'a a b', s1 = 'a b b' -> JSD computed by float brute;
    identical-mix pair -> JSD exactly 0."""
    import math

    from spark_dba_spark.operators.analytics import (
        ORACLE_JSD,
        text_js_divergence_sources,
    )

    _write_docs(
        tmp_path,
        ["a a b", "a b b", "a a b"],
        sources=["s0", "s1", "s2"],
    )
    df = text_js_divergence_sources(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_JSD, ["documents"])
    got = {(r["source_a"], r["source_b"]): r for r in df.collect()}
    assert set(got) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    # identical mixes -> 0
    assert got[("s0", "s2")]["jsd_nats_r6"] == 0.0
    # brute: p = (2/3, 1/3), q = (1/3, 2/3)
    def jsd(p, q):
        tot = 0.0
        for pi, qi in zip(p, q):
            m = (pi + qi) / 2
            if pi:
                tot += pi * math.log(pi / m)
            if qi:
                tot += qi * math.log(qi / m)
        return tot / 2

    exp = round(jsd([2 / 3, 1 / 3], [1 / 3, 2 / 3]), 6)
    assert got[("s0", "s1")]["jsd_nats_r6"] == exp
    assert got[("s0", "s1")]["n_shared_terms"] == 2


# ---------------------------------------------------------------------------
# Batch U twins
# ---------------------------------------------------------------------------


def _h9(counts):
    """The house n*ln(n) 9dp entropy readout, brute."""
    import math

    n = sum(counts)
    s = sum(round(c * math.log(c), 9) for c in counts)
    return round(round(math.log(n), 9) - s / n, 6)


def test_byte_cond_entropy_planted(spark, tmp_path):
    """'abab' (image): bigram counts ab:2, ba:1; prefix a:2, b:1 —
    entropies match the 9dp brute; 'aaaa' (audio) is all-zero."""
    import math

    from spark_dba_spark.operators.analytics import (
        ORACLE_BYTE_COND_ENTROPY,
        mm_byte_cond_entropy,
    )

    _write_docs(tmp_path, ["abab", "aaaa"])
    df = mm_byte_cond_entropy(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_BYTE_COND_ENTROPY, ["documents"]
    )
    got = {r["media_type"]: r for r in df.collect()}
    img = got["image"]
    assert img["n_bigrams"] == 3
    hb = _h9([2, 1])
    hp = _h9([2, 1])
    assert img["h_bigram_r6"] == hb
    assert img["h_prefix_r6"] == hp
    # identical split -> the next byte is DETERMINED by the previous
    raw = round(math.log(3), 9) - (
        round(2 * math.log(2), 9) + round(1 * math.log(1), 9)
    ) / 3
    assert img["h_cond_r6"] == round(raw - raw, 6) == 0.0
    aud = got["audio"]
    assert (aud["h_bigram_r6"], aud["h_prefix_r6"], aud["h_cond_r6"]) == (
        0.0, 0.0, 0.0,
    )


def test_burrows_delta_brute(spark, tmp_path):
    """Integer-exact brute of the ppm z-lanes: three crafted sources,
    identical pair -> delta 0, the asymmetric pair recomputed from
    first principles."""
    import math

    from spark_dba_spark.operators.analytics import (
        ORACLE_BURROWS,
        text_burrows_delta,
    )

    texts = ["the the cat", "the dog dog", "the the cat"]
    sources = ["s0", "s1", "s2"]
    _write_docs(tmp_path, texts, sources=sources)
    df = text_burrows_delta(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_BURROWS, ["documents"])
    got = {(r["source_a"], r["source_b"]): r for r in df.collect()}
    assert got[("s0", "s2")]["delta_r6"] == 0.0

    # brute: vocab = all 3 words; per-source totals 3
    words = ["cat", "dog", "the"]
    counts = {
        "s0": {"the": 2, "cat": 1, "dog": 0},
        "s1": {"the": 1, "dog": 2, "cat": 0},
        "s2": {"the": 2, "cat": 1, "dog": 0},
    }
    p = {
        (s, t): (counts[s][t] * 2_000_000 + 3) // 6
        for s in sources
        for t in words
    }
    deltas = []
    used = 0
    for t in words:
        ps = [p[(s, t)] for s in sources]
        d = 3 * sum(x * x for x in ps) - sum(ps) ** 2
        if d <= 0:
            continue
        used += 1
        za = 3 * p[("s0", t)] / math.sqrt(d)
        zb = 3 * p[("s1", t)] / math.sqrt(d)
        deltas.append(round(abs(za - zb), 9))
    r = got[("s0", "s1")]
    assert r["n_terms_used"] == used
    assert r["delta_r6"] == round(sum(deltas) / used, 6)


def test_hurst_brute(spark, tmp_path):
    """32 days of linearly-growing volume: every dyadic scale complete,
    slope/Hurst recomputed exactly from the integer block sums."""
    import math

    from spark_dba_spark.operators.analytics import (
        HURST_SCALES,
        ORACLE_HURST,
        ev_hurst_variance_plot,
    )

    xs = [d + 1 for d in range(32)]  # day d has d+1 events
    rows = []
    eid = 0
    for d, x in enumerate(xs):
        for j in range(x):
            rows.append((eid, T0_US + d * US_PER_DAY + j, 1, "e", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    df = ev_hurst_variance_plot(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_HURST, ["events"])
    r = df.collect()[0]
    assert r["n_scales"] == 4
    day0 = T0_US // US_PER_DAY
    swy = 0.0
    wmap = {1: -1.5, 2: -0.5, 4: 0.5, 8: 1.5}
    for m in HURST_SCALES:
        sums = {}
        cnts = {}
        for d, x in enumerate(xs):
            bid = (day0 + d) // m
            sums[bid] = sums.get(bid, 0) + x
            cnts[bid] = cnts.get(bid, 0) + 1
        sb = [sums[k] for k in sums if cnts[k] == m]
        bnum = len(sb)
        vnum = bnum * sum(v * v for v in sb) - sum(sb) ** 2
        vden = m * m * bnum * bnum
        swy += round(wmap[m] * (math.log(vnum) - math.log(vden)), 9)
    ln2 = 0.6931471805599453
    assert r["slope_r6"] == round(swy / (5 * ln2), 6)
    assert r["hurst_r6"] == round(1 + swy / (5 * ln2) / 2, 6)
    # a linear trend is strongly persistent: H well above the 0.5
    # independence line (0.839 with the planted 32-day grid — partial
    # head/tail blocks at the larger scales pull it below 1)
    assert r["hurst_r6"] > 0.75


def test_perm_sweep_monotone_and_planted(spark, tmp_path):
    """Near-dup planted pair must be caught at every signature length
    (identical docs collide in every band); recall is monotone
    non-decreasing in the number of permutations (more bands = more
    chances to collide); a lone unique doc produces no candidates."""
    from spark_dba_spark.operators.analytics import (
        _perm_sweep_oracle,
        dedup_minhash_perm_sweep,
    )

    base = " ".join(f"w{i}" for i in range(40))
    texts = [base, base, "completely different text entirely here"]
    _write_docs(tmp_path, texts)
    df = dedup_minhash_perm_sweep(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, _perm_sweep_oracle(), ["documents"]
    )
    rows = {r["num_perm"]: r for r in df.collect()}
    assert set(rows) == {16, 32, 64}
    for p, r in rows.items():
        assert r["bands"] == p // 4
        # the identical pair collides in every band of every config
        assert r["n_candidates"] == 1
        assert r["n_verified"] == 1
        assert r["precision_r6"] == 1.0
        assert r["recall_vs_union_r6"] == 1.0
        assert r["n_buckets_multi"] == p // 4
        assert r["cand_pairs_total"] == p // 4


def test_perm_sweep_recall_monotone_fixture(spark):
    """On the real fixture corpus: recall@union is monotone
    non-decreasing in signature length, and candidate cost is
    non-decreasing too (more bands can only add collisions)."""
    from spark_dba_spark.operators.analytics import (
        dedup_minhash_perm_sweep,
    )

    rows = sorted(
        dedup_minhash_perm_sweep(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["num_perm"],
    )
    recalls = [r["recall_vs_union_r6"] for r in rows]
    cands = [r["n_candidates"] for r in rows]
    assert recalls == sorted(recalls)
    assert cands == sorted(cands)
    assert recalls[-1] is not None and recalls[-1] > 0
