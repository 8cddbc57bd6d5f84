"""Round-14 continuation (third window) tests — batch V planted twins.

One micro-fixture test per operator in batch V of
``spark_dba_spark/operators/analytics.py``: hand-computable inputs, exact
expected values, plus the DuckDB oracle run on the SAME planted tables.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from conftest import normalize_rows

US_PER_DAY = 86_400_000_000
T0_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
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
    """House half-up 6dp rational readout (num >= 0, den > 0)."""
    assert num >= 0 and den > 0
    return float((num * 2_000_000 + den) // (2 * den)) / 1e6


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write_docs(tmp_path, texts, sources):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(sources),
            }
        ),
        tmp_path / "documents.parquet",
    )


def _write_events(tmp_path, rows):
    """rows: (event_id, ts_us, event_type, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )


def _write_embeddings(tmp_path, vecs):
    full = [list(v) + [0.0] * (64 - len(v)) for v in vecs]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(full)), pa.int64()),
                "embedding": pa.array(full, pa.list_(pa.float32())),
            }
        ),
        tmp_path / "embeddings.parquet",
    )


def _write_supply(tmp_path, lines, parts):
    """lines: (partkey, suppkey, extendedprice, discount);
    parts: (partkey, brand)."""
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_suppkey": pa.array([r[1] for r in lines], pa.int64()),
                "l_extendedprice": pa.array(
                    [r[2] for r in lines], pa.float64()
                ),
                "l_discount": pa.array([r[3] for r in lines], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in parts], pa.int64()),
                "p_brand": pa.array([r[1] for r in parts]),
            }
        ),
        tmp_path / "part.parquet",
    )


def _write_cust_orders(tmp_path, customers, orders):
    """customers: (custkey, segment); orders: (orderkey, custkey, day)."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in customers], pa.int64()),
                "c_mktsegment": pa.array([r[1] for r in customers]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_orderdate": pa.array(
                    [r[2] * US_PER_DAY for r in orders], pa.timestamp("us")
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )


# ---------------------------------------------------------------------------
# text_yules_k
# ---------------------------------------------------------------------------


def test_yules_k_planted(spark, tmp_path):
    """'a a b' -> S1=3, V=2, S2=5, K = 1e4*(5-3)/9; a repeat-free source
    reads exactly 0."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_YULES_K,
        text_yules_k,
    )

    _write_docs(tmp_path, ["a a b", "x y"], ["s0", "s1"])
    df = text_yules_k(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_YULES_K, ["documents"])
    got = {r["source"]: r for r in df.collect()}
    s0 = got["s0"]
    assert (s0["n_tokens"], s0["n_types"], s0["sum_m2"]) == (3, 2, 5)
    assert s0["yules_k_r6"] == _r6(10000 * 2, 9)
    s1 = got["s1"]
    assert (s1["n_tokens"], s1["n_types"], s1["sum_m2"]) == (2, 2, 2)
    assert s1["yules_k_r6"] == 0.0


# ---------------------------------------------------------------------------
# ev_max_drawdown_daily
# ---------------------------------------------------------------------------


def test_max_drawdown_planted(spark, tmp_path):
    """Daily totals 10,4,7,2 -> drawdowns 0,6,3,8 (max 8 at day 3);
    a monotone series reads 0 with the FIRST day as trough (tie-break);
    equal-drawdown days pick the earliest."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_MAX_DRAWDOWN,
        ev_max_drawdown_daily,
    )

    rows = []
    for i, v in enumerate([10.0, 4.0, 7.0, 2.0]):
        rows.append((i, T0_US + i * US_PER_DAY, "click", v))
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((100 + i, T0_US + i * US_PER_DAY, "view", v))
    # 'buy': totals 5, 1, 5, 1 -> dd 0,4,0,4: max 4, earliest trough day 1
    for i, v in enumerate([5.0, 1.0, 5.0, 1.0]):
        rows.append((200 + i, T0_US + i * US_PER_DAY, "buy", v))
    _write_events(tmp_path, rows)
    df = ev_max_drawdown_daily(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_MAX_DRAWDOWN, ["events"]
    )
    got = {r["event_type"]: r for r in df.collect()}
    click = got["click"]
    assert click["n_days"] == 4
    assert click["peak_daily_r6"] == 10.0
    assert click["max_drawdown_r6"] == 8.0
    assert click["dd_peak_share_r6"] == 0.8
    assert str(click["trough_day"]) == "2024-01-04"
    view = got["view"]
    assert view["max_drawdown_r6"] == 0.0
    assert str(view["trough_day"]) == "2024-01-01"
    buy = got["buy"]
    assert buy["max_drawdown_r6"] == 4.0
    assert str(buy["trough_day"]) == "2024-01-02"


# ---------------------------------------------------------------------------
# stats_ljung_box_daily
# ---------------------------------------------------------------------------


def test_ljung_box_planted(spark, tmp_path):
    """Counts [3,1,2,0,4] (zero from a missing spine day): integer c/N/D
    lanes and the Q cascade recomputed from first principles; lags with
    no overlap (k >= n) produce no row."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_LJUNG_BOX,
        stats_ljung_box_daily,
    )

    counts = [3, 1, 2, 0, 4]
    rows = []
    eid = 0
    for i, x in enumerate(counts):
        for _ in range(x):
            rows.append((eid, T0_US + i * US_PER_DAY, "e", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    df = stats_ljung_box_daily(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_LJUNG_BOX, ["events"])
    got = {r["lag"]: r for r in df.collect()}
    assert sorted(got) == [1, 2, 3, 4]  # k >= n has no overlap pairs

    n, s = 5, sum(counts)
    c = [n * x - s for x in counts]
    d = sum(v * v for v in c)
    qcum = 0.0
    for k in range(1, 5):
        nk = sum(c[t] * c[t + k] for t in range(n - k))
        r = nk / d
        qcum += round(r * r / (n - k), 9)
        assert got[k]["acf_r6"] == round(r, 6)
        assert got[k]["lb_q_r6"] == round(n * (n + 2) * qcum, 6)
        assert got[k]["n_days"] == 5
        assert got[k]["reject_05"] == (
            round(n * (n + 2) * qcum, 6) > got[k]["crit_05"]
        )


# ---------------------------------------------------------------------------
# emb_jl_projection_distortion
# ---------------------------------------------------------------------------


def test_jl_distortion_brute(spark, tmp_path):
    """Six grid-exact vectors; the full md5 machinery (pool ranks, pair
    lanes, sign lanes) re-derived with hashlib and the three k-rows
    checked value-for-value."""
    from spark_dba_spark.operators.analytics import (
        JL_K_GRID,
        JL_MAX_K,
        JL_N_PAIRS,
        ORACLE_JL_DISTORTION,
        emb_jl_projection_distortion,
    )

    vecs = [
        [0.25, -0.5],
        [0.125, 0.25],
        [-0.25, 0.5],
        [0.5, 0.125],
        [0.0, -0.125],
        [0.25, 0.25],
    ]
    _write_embeddings(tmp_path, vecs)
    df = emb_jl_projection_distortion(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_JL_DISTORTION, ["embeddings"]
    )

    # brute: pool = all 6 (pool cap 512), ranked by md5(vec_id)
    n = len(vecs)
    q = [[int(x * 1048576) for x in v] + [0] * (64 - len(v)) for v in vecs]
    order = sorted(range(n), key=lambda i: (_md5_long(str(i)), i))
    sign = {
        (j, d): 1 - 2 * (_md5_long(f"jls:{j}:{d}") % 2)
        for j in range(JL_MAX_K)
        for d in range(64)
    }
    per = {k: [] for k in JL_K_GRID}
    for i in range(JL_N_PAIRS):
        ra = _md5_long(f"jla:{i}") % n
        rb = _md5_long(f"jlb:{i}") % n
        if ra == rb:
            continue
        dv = [a - b for a, b in zip(q[order[ra]], q[order[rb]])]
        den64 = sum(x * x for x in dv)
        if den64 == 0:
            continue
        dy2 = [
            sum(sign[(j, d)] * dv[d] for d in range(64)) ** 2
            for j in range(JL_MAX_K)
        ]
        for k in JL_K_GRID:
            num = sum(dy2[:k])
            per[k].append(
                (
                    round(num / (k * den64), 6),
                    int(2 * num >= k * den64 and num <= 2 * k * den64),
                )
            )
    got = {r["k"]: r for r in df.collect()}
    for k in JL_K_GRID:
        ratios = [p[0] for p in per[k]]
        row = got[k]
        assert row["n_pairs"] == len(ratios)
        assert row["min_ratio_r6"] == min(ratios)
        assert row["max_ratio_r6"] == max(ratios)
        ssum = round(sum(int(r * 1e6 + (0.5 if r > 0 else -0.5))
                         for r in ratios) / 1e6, 6)
        assert row["mean_ratio_r6"] == round(ssum / len(ratios), 6)
        assert row["within_2x_share_r6"] == _r6(
            sum(p[1] for p in per[k]), len(ratios)
        )
    # k=32 must concentrate tighter than k=8 on the within-2x share
    assert (
        got[32]["within_2x_share_r6"] >= got[8]["within_2x_share_r6"]
    )


# ---------------------------------------------------------------------------
# supplier_single_source_exposure
# ---------------------------------------------------------------------------


def test_single_source_planted(spark, tmp_path):
    """B1: two parts, one single-sourced carrying 500 of 3500 cents;
    B2: fully single-sourced -> exposure 1."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_SINGLE_SOURCE,
        supplier_single_source_exposure,
    )

    lines = [
        (1, 10, 10.0, 0.0),
        (1, 11, 20.0, 0.0),
        (2, 10, 5.0, 0.0),
        (3, 12, 8.0, 0.5),
    ]
    parts = [(1, "B1"), (2, "B1"), (3, "B2")]
    _write_supply(tmp_path, lines, parts)
    df = supplier_single_source_exposure(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_SINGLE_SOURCE, ["lineitem", "part"]
    )
    got = {r["p_brand"]: r for r in df.collect()}
    b1 = got["B1"]
    assert (b1["n_parts"], b1["n_single"]) == (2, 1)
    assert b1["single_share_r6"] == 0.5
    assert b1["revenue_total"] == 35.0
    assert b1["revenue_exposure_r6"] == _r6(500, 3500)
    b2 = got["B2"]
    assert (b2["n_parts"], b2["n_single"]) == (1, 1)
    assert b2["revenue_total"] == 4.0
    assert b2["revenue_exposure_r6"] == 1.0


# ---------------------------------------------------------------------------
# customer_interpurchase_regularity
# ---------------------------------------------------------------------------


def test_interpurchase_planted(spark, tmp_path):
    """One customer per band (gaps [10,10] regular, [1,30] poisson,
    [0,0,30] bursty), plus two excluded customers (single order;
    same-day-only history)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_INTERPURCHASE,
        customer_interpurchase_regularity,
    )

    customers = [(1, "AUTO"), (2, "AUTO"), (3, "AUTO"), (4, "AUTO"),
                 (5, "BIKE")]
    orders = [
        (1, 1, T0_DAY), (2, 1, T0_DAY + 10), (3, 1, T0_DAY + 20),
        (4, 2, T0_DAY), (5, 2, T0_DAY + 1), (6, 2, T0_DAY + 31),
        (7, 3, T0_DAY), (8, 3, T0_DAY), (9, 3, T0_DAY), (10, 3, T0_DAY + 30),
        (11, 4, T0_DAY),                      # single order: excluded
        (12, 5, T0_DAY), (13, 5, T0_DAY),     # sg = 0: excluded
    ]
    _write_cust_orders(tmp_path, customers, orders)
    df = customer_interpurchase_regularity(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_INTERPURCHASE, ["customer", "orders"]
    )
    rows = df.collect()
    assert {r["c_mktsegment"] for r in rows} == {"AUTO"}
    got = {r["band"]: r for r in rows}
    # c1 gaps [10,10]: 2*2*200=800 <= 3*400 -> regular
    assert got["regular"]["n_customers"] == 1
    assert got["regular"]["mean_gap_days_r6"] == 10.0
    # c2 gaps [1,30]: 2*2*901=3604 in (3*961, 5*961] -> poisson
    assert got["poisson"]["n_customers"] == 1
    assert got["poisson"]["mean_gap_days_r6"] == 15.5
    # c3 gaps [0,0,30]: 2*3*900=5400 > 5*900 -> bursty
    assert got["bursty"]["n_customers"] == 1
    assert got["bursty"]["mean_gap_days_r6"] == 10.0
    for band in ("regular", "poisson", "bursty"):
        assert got[band]["seg_share_r6"] == _r6(1, 3)


# ---------------------------------------------------------------------------
# Batch W twins
# ---------------------------------------------------------------------------


def test_mann_kendall_planted(spark, tmp_path):
    """Counts [1,2,2,3]: S and the tie-corrected variance by hand; the
    monotone-ish series still reads 'no_trend' at this tiny n because
    z stays inside the normal critical band."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_MANN_KENDALL,
        stats_mann_kendall_trend,
    )

    counts = [1, 2, 2, 3]
    rows = []
    eid = 0
    for i, x in enumerate(counts):
        for _ in range(x):
            rows.append((eid, T0_US + i * US_PER_DAY, "e", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    df = stats_mann_kendall_trend(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_MANN_KENDALL, ["events"]
    )
    row = df.collect()[0]
    # pairs: (1,2)+ (1,2)+ (1,3)+ (2,2)0 (2,3)+ (2,3)+ -> S = 5
    assert row["n_days"] == 4 and row["s_stat"] == 5
    # 18Var = n(n-1)(2n+5) - ties: n=4 -> 4*3*13=156; tie group {2,2}:
    # t=2 -> 2*1*9=18; singles contribute 0 -> var18 = 138
    assert row["var18"] == 138
    import math

    z = round((5 - 1) / math.sqrt(138 / 18.0), 6)
    assert row["z_r6"] == z
    assert row["trend"] == ("increasing" if z > 1.959964 else "no_trend")


def test_mann_kendall_degenerate(spark, tmp_path):
    """A constant series: every pair ties, var18 = 0, NULL z."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_MANN_KENDALL,
        stats_mann_kendall_trend,
    )

    rows = [(i, T0_US + i * US_PER_DAY, "e", 1.0) for i in range(3)]
    _write_events(tmp_path, rows)
    df = stats_mann_kendall_trend(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_MANN_KENDALL, ["events"]
    )
    row = df.collect()[0]
    assert row["s_stat"] == 0 and row["var18"] == 0
    assert row["z_r6"] is None and row["trend"] == "degenerate"


def test_dickey_fuller_planted(spark, tmp_path):
    """Counts [4,1,3,0,2]: the five OLS sufficient statistics, rho and
    the t-statistic recomputed from the integer identity."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_DICKEY_FULLER,
        stats_dickey_fuller_daily,
    )

    counts = [4, 1, 3, 0, 2]
    rows = []
    eid = 0
    for i, x in enumerate(counts):
        for _ in range(x):
            rows.append((eid, T0_US + i * US_PER_DAY, "e", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    df = stats_dickey_fuller_daily(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_DICKEY_FULLER, ["events"]
    )
    row = df.collect()[0]
    import math

    xl = counts[:-1]
    dy = [b - a for a, b in zip(counts[:-1], counts[1:])]
    np_ = len(xl)
    sx, sy = sum(xl), sum(dy)
    sxx = sum(v * v for v in xl)
    sxy = sum(a * b for a, b in zip(xl, dy))
    syy = sum(v * v for v in dy)
    d = np_ * sxx - sx * sx
    num = np_ * sxy - sx * sy
    k = (np_ * syy - sy * sy) * d - num * num
    assert row["n_obs"] == np_
    assert row["rho_hat_r6"] == round(num / d, 6)
    t = round(
        (1 if num > 0 else -1) * math.sqrt(num * num * (np_ - 2) / k), 6
    )
    assert row["t_stat_r6"] == t
    assert row["reject_unit_root_05"] == (t < -2.86)


def test_ks_uniform_planted(spark, tmp_path):
    """'aab' (image): bytes 61,61,62 -> worst cumulative deviation at
    b=0x61: |256*2 - 3*98| = 218, D = 218/768; 'zz' (audio) by the
    same arithmetic."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_KS_UNIFORM,
        mm_payload_ks_uniform,
    )

    _write_docs(tmp_path, ["aab", "zz"], ["s0", "s1"])
    df = mm_payload_ks_uniform(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_KS_UNIFORM, ["documents"])
    got = {r["media_type"]: r for r in df.collect()}
    img = got["image"]  # doc 0: 'aab' = 0x61,0x61,0x62
    assert img["n_bytes"] == 3
    # cum at b: 0..0x60: 0; 0x61: 2; 0x62: 3 (=N from there on)
    # dev = max over b of |256*cum - 3*(b+1)|:
    dev = max(
        abs(256 * (2 if b >= 0x61 else 0) - 3 * (b + 1))
        if b < 0x62
        else abs(256 * 3 - 3 * (b + 1))
        for b in range(256)
    )
    assert img["ks_d_r6"] == _r6(dev, 768)
    import math

    assert img["crit_05_r6"] == round(1.358 / math.sqrt(3), 6)
    assert img["reject_05"] == (dev / 768 > 1.358 / math.sqrt(3))
    aud = got["audio"]  # doc 1: 'zz' = 0x7a,0x7a
    dev_a = max(
        abs(256 * (2 if b >= 0x7A else 0) - 2 * (b + 1)) for b in range(256)
    )
    assert aud["ks_d_r6"] == _r6(dev_a, 512)


def test_rich_club_planted(spark, tmp_path):
    """A 4-clique of identical docs plus an isolated dup pair: at k=1
    everything is in the club; at k=3 only the clique nodes qualify
    and phi = 1; at k=8 the club is empty (NULL phi)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_RICH_CLUB,
        graph_rich_club_coefficient,
    )

    clique = "the quick brown fox jumps over the lazy dog again and again"
    pair = "a completely different text about suppliers and parts orders"
    texts = [clique] * 4 + [pair] * 2
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])
    df = graph_rich_club_coefficient(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_RICH_CLUB, ["documents"]
    )
    got = {r["k"]: r for r in df.collect()}
    # clique nodes have degree 3, pair nodes degree 1
    assert got[1]["n_nodes"] == 6 and got[1]["n_edges"] == 7
    assert got[1]["phi_r6"] == _r6(14, 30)
    assert got[2]["n_nodes"] == 4 and got[2]["n_edges"] == 6
    assert got[2]["phi_r6"] == 1.0
    assert got[3]["n_nodes"] == 4 and got[3]["phi_r6"] == 1.0
    assert got[8]["n_nodes"] == 0 and got[8]["n_edges"] == 0
    assert got[8]["phi_r6"] is None


def test_coverage_radius_brute(spark, tmp_path):
    """Five grid-exact vectors: net swallows the whole corpus (pool cap
    512), so every probe is in-net and every quantile distance is 0 —
    the documented tiny-SF degeneracy, pinned exactly."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_COVERAGE,
        emb_coverage_radius_net,
    )

    vecs = [[0.25, -0.5], [0.125, 0.25], [-0.25, 0.5], [0.5, 0.125],
            [0.0, -0.125]]
    _write_embeddings(tmp_path, vecs)
    df = emb_coverage_radius_net(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_COVERAGE, ["embeddings"]
    )
    row = df.collect()[0]
    assert row["n_probes"] == 5
    assert row["n_in_net"] == 5
    assert row["d_p25_r6"] == 0.0 and row["d_max_r6"] == 0.0


def test_rbo_identical_rankings(spark, tmp_path):
    """Planted clustered embeddings where LSH returns the true
    neighborhood: RBO of two identical rankings is the truncated
    weight mass sum(w_d) and every agreement is 1."""
    import numpy as np

    from spark_dba_spark.operators.analytics import (
        ORACLE_RBO,
        sim_rank_biased_overlap,
    )

    # tight clusters so exact == LSH ranking on the planted corpus
    rng = np.random.RandomState(7)
    base = rng.rand(4, 64).astype("float32") - 0.5
    vecs = []
    for i in range(48):
        v = base[i % 4] + (i // 4) * 1e-4
        vecs.append([float(x) for x in v])
    _write_embeddings(tmp_path, vecs)
    df = sim_rank_biased_overlap(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_RBO, ["embeddings"]
    )
    row = df.collect()[0]
    assert row["n_queries"] >= 1
    assert 0.0 <= row["rbo_trunc_r6"] <= 0.651323  # sum of the 10 weights
    assert row["mean_agree_at1_r6"] is not None


# ---------------------------------------------------------------------------
# Batch X twins
# ---------------------------------------------------------------------------


def test_jarque_bera_planted(spark, tmp_path):
    """Counts [3,1,2,0,4]: division-free central-moment lanes and the
    skew/kurtosis/JB chain recomputed from first principles."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_JARQUE_BERA,
        stats_jarque_bera_daily,
    )

    counts = [3, 1, 2, 0, 4]
    rows = []
    eid = 0
    for i, x in enumerate(counts):
        for _ in range(x):
            rows.append((eid, T0_US + i * US_PER_DAY, "e", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    df = stats_jarque_bera_daily(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_JARQUE_BERA, ["events"]
    )
    row = df.collect()[0]
    n, s = 5, sum(counts)
    c = [n * x - s for x in counts]
    s2 = sum(v * v for v in c)
    s3 = sum(v**3 for v in c)
    s4 = sum(v**4 for v in c)
    skew = s3 * math.sqrt(n) / (s2 * math.sqrt(s2))
    kurt = n * s4 / (s2 * s2) - 3.0
    jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
    assert row["n_days"] == 5
    assert row["skew_r6"] == round(skew, 6)
    assert row["kurt_excess_r6"] == round(kurt, 6)
    assert row["jb_r6"] == round(jb, 6)
    assert row["reject_normal_05"] == (jb > 5.991465)


def test_fisher_separability_planted(spark, tmp_path):
    """Two labels x two grid-exact vectors: SB = 0.5625, SW = 0.0625,
    Fisher ratio exactly 9."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_FISHER,
        emb_fisher_separability,
    )

    full = [[0.25], [0.5], [-0.25], [-0.5]]
    vecs = [list(v) + [0.0] * 63 for v in full]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0, 0, 1, 1], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    df = emb_fisher_separability(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_FISHER, ["embeddings"]
    )
    row = df.collect()[0]
    assert (row["n_vectors"], row["n_labels"]) == (4, 2)
    assert row["sb_r6"] == 0.5625
    assert row["sw_r6"] == 0.0625
    assert row["fisher_ratio_r6"] == 9.0


def test_topk_turnover_planted(spark, tmp_path):
    """Week A top set {1,2,3}, week B {2,3,4}: Jaccard 2/4, newcomer
    share 1/3 (sets smaller than K keep true sizes)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_TOPK_TURNOVER,
        ev_topk_turnover_weekly,
    )

    rows = []
    eid = 0
    for u in (1, 2, 3):
        rows.append((eid, T0_US, "e", 1.0, u))
        eid += 1
    for u in (2, 3, 4):
        rows.append((eid, T0_US + 7 * US_PER_DAY, "e", 1.0, u))
        eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[4] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    df = ev_topk_turnover_weekly(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_TOPK_TURNOVER, ["events"]
    )
    rows_out = df.collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r["k_prev"], r["k_curr"], r["n_common"]) == (3, 3, 2)
    assert r["jaccard_r6"] == 0.5
    assert r["newcomer_share_r6"] == _r6(1, 3)


def test_byte_runs_planted(spark, tmp_path):
    """'aé' (UTF-8 61 C3 A9 -> classes L H H): runs 2, n1=2, the E/V/z
    chain recomputed with the 9dp-round semantics; an all-low doc has
    V = 0 and NULL z."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_BYTE_RUNS,
        mm_byte_runs_randomness,
    )

    _write_docs(tmp_path, ["aé", "béab"], ["s0", "s1"])
    # doc 0 (image): 61 C3 A9          -> L H H : r=2, n=3, n1=2
    # doc 1 (audio): 62 C3 A9 61 62    -> L H H L L : r=3, n=5, n1=2
    df = mm_byte_runs_randomness(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_BYTE_RUNS, ["documents"])
    got = {r["media_type"]: r for r in df.collect()}
    img = got["image"]
    assert (img["n_docs"], img["n_bytes"], img["r_total"]) == (1, 3, 2)
    e = round(1.0 + 2.0 * 2 * 1 / 3, 9)
    v = round(2.0 * 2 * 1 * (2.0 * 2 * 1 - 3) / (3.0 * 3 * 2), 9)
    assert img["e_total_r6"] == round(e, 6)
    z = (2 - e) / math.sqrt(v)
    assert img["z_r6"] == round(z, 6)
    aud = got["audio"]
    assert (aud["n_docs"], aud["n_bytes"], aud["r_total"]) == (1, 5, 3)


def test_kuiper_planted(spark, tmp_path):
    """Hours [0,0,12]: D+ = 45 (at h=0), D- = 3 (left limit at h=0),
    V = 48/72."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_KUIPER,
        stats_kuiper_hour_uniformity,
    )

    US_PER_HOUR = 3_600_000_000
    rows = [
        (0, T0_US, "e", 1.0),
        (1, T0_US + 1, "e", 1.0),
        (2, T0_US + 12 * US_PER_HOUR, "e", 1.0),
    ]
    _write_events(tmp_path, rows)
    df = stats_kuiper_hour_uniformity(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_KUIPER, ["events"])
    row = df.collect()[0]
    assert row["n_events"] == 3
    cum = [2 if h < 12 else 3 for h in range(24)]
    dplus = max(24 * cum[h] - 3 * (h + 1) for h in range(24))
    cum_prev = [0] + cum[:-1]
    cum_prev[12] = 2  # left limit at the step
    dminus = max(3 * (h + 1) - 24 * ([0] + cum[:23])[h]
                 if h != 12 else 3 * 13 - 24 * 2
                 for h in range(24))
    assert dplus == 45 and max(dminus, 0) == 3
    assert row["kuiper_v_r6"] == _r6(48, 72)
    assert row["crit_05_r6"] == round(1.747 / math.sqrt(3), 6)
    assert row["reject_05"] == (48 / 72 > 1.747 / math.sqrt(3))


def test_tukey_fence_planted(spark, tmp_path):
    """Cents [100,200,300,400,10000]: Q1=200, Q3=400, upper fence 700,
    one high outlier, no low outliers."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_TUKEY_FENCE,
        orders_tukey_fence_outliers,
    )

    prices = [1.0, 2.0, 3.0, 4.0, 100.0]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(5), pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT"] * 5),
                "o_totalprice": pa.array(prices, pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    df = orders_tukey_fence_outliers(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_TUKEY_FENCE, ["orders"])
    row = df.collect()[0]
    assert row["n_orders"] == 5
    assert row["q1_price"] == 2.0 and row["q3_price"] == 4.0
    assert (row["n_low"], row["n_high"]) == (0, 1)
    assert row["outlier_share_r6"] == 0.2


# ---------------------------------------------------------------------------
# Batch Y twins
# ---------------------------------------------------------------------------


def test_revenue_bridge_planted(spark, tmp_path):
    """Three customers over two months: one churns, one expands, one is
    new; the waterfall identity checks exactly, and a dark middle
    month churns everyone then rebooks them as new."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_REVENUE_BRIDGE,
        orders_revenue_bridge_monthly,
    )

    # month 0 = Jan 2024 (day T0_DAY), month 1 = Feb 2024
    jan, feb = T0_DAY, T0_DAY + 31
    orders = [
        # c1: 10.00 in Jan, gone in Feb (churn)
        (1, 1, jan, 10.0),
        # c2: 5.00 Jan -> 8.00 Feb (expansion +3)
        (2, 2, jan, 5.0), (3, 2, feb, 8.0),
        # c3: new in Feb with 4.00
        (4, 3, feb, 4.0),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_orderdate": pa.array(
                    [r[2] * US_PER_DAY for r in orders], pa.timestamp("us")
                ),
                "o_totalprice": pa.array(
                    [r[3] for r in orders], pa.float64()
                ),
            }
        ),
        tmp_path / "orders.parquet",
    )
    df = orders_revenue_bridge_monthly(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_REVENUE_BRIDGE, ["orders"]
    )
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_new"], r["n_churned"], r["n_expanded"],
            r["n_contracted"]) == (1, 1, 1, 0)
    assert r["prev_rev"] == 15.0 and r["curr_rev"] == 12.0
    assert r["new_rev"] == 4.0 and r["churned_rev"] == 10.0
    assert r["expansion_rev"] == 3.0 and r["contraction_rev"] == 0.0
    # waterfall identity
    assert r["curr_rev"] == r["prev_rev"] + r["new_rev"] - r[
        "churned_rev"] + r["expansion_rev"] - r["contraction_rev"]


def test_cvm_weekend_planted(spark, tmp_path):
    """Weekend values {1,3}, weekday values {2,4}: the value-grain
    D = m*cumF - n*cumG lanes recomputed by hand."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_CVM_WEEKEND,
        stats_cramer_von_mises_weekend,
    )

    # T0_DAY = 19723; (d+3)%7 >= 5 -> weekend. 19723+3=19726, %7 = 4
    # (Monday). Saturday is T0_DAY + 5.
    sat = T0_US + 5 * US_PER_DAY
    rows = [
        (0, sat, "e", 1.0), (1, sat, "e", 3.0),       # weekend
        (2, T0_US, "e", 2.0), (3, T0_US, "e", 4.0),   # weekday
    ]
    _write_events(tmp_path, rows)
    df = stats_cramer_von_mises_weekend(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_CVM_WEEKEND, ["events"])
    row = df.collect()[0]
    assert (row["n_weekend"], row["n_weekday"]) == (2, 2)
    # value grid (us): 1e6(f=1),2e6(g=1),3e6(f=1),4e6(g=1); n=m=2
    # D = 2*cf - 2*cg: 2, 0, 2, 0 -> U = sum D^2*(f+g) = 4+0+4+0 = 8
    # T = U/(n*m*(n+m)^2) = 8/(2*2*16) = 0.125
    assert row["cvm_t_r6"] == 0.125
    assert row["reject_05"] is False


def test_mood_median_planted(spark, tmp_path):
    """Weekend values {1,2}, weekday {3,4}: grand median (k=2nd of 4)
    is 2, ties at the median drop, table = [[0,1],[2,0]]."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_MOOD_MEDIAN,
        stats_mood_median_weekend,
    )

    sat = T0_US + 5 * US_PER_DAY
    rows = [
        (0, sat, "e", 1.0), (1, sat, "e", 2.0),
        (2, T0_US, "e", 3.0), (3, T0_US, "e", 4.0),
    ]
    _write_events(tmp_path, rows)
    df = stats_mood_median_weekend(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_MOOD_MEDIAN, ["events"])
    row = df.collect()[0]
    assert row["grand_median"] == 2.0
    assert (row["n_wkend_above"], row["n_wkend_below"]) == (0, 1)
    assert (row["n_wkday_above"], row["n_wkday_below"]) == (2, 0)
    n = 0 + 1 + 2 + 0
    chi = n * (0 * 0 - 1 * 2) ** 2 / (1 * 2 * 2 * 1)
    assert row["chi2_r6"] == round(chi, 6)


def test_day_islands_planted(spark, tmp_path):
    """User 1 active days {0,1,2, 5}, user 2 {0, 2,3}: islands of
    length 3,1 and 1,2."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_DAY_ISLANDS,
        ev_user_day_islands,
    )

    def ev(eid, day, user):
        return (eid, T0_US + day * US_PER_DAY, user)

    plan = [ev(0, 0, 1), ev(1, 1, 1), ev(2, 2, 1), ev(3, 5, 1),
            ev(4, 0, 2), ev(5, 2, 2), ev(6, 3, 2)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in plan], pa.int64()),
                "ts": pa.array([r[1] for r in plan], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in plan], pa.int64()),
                "event_type": pa.array(["e"] * len(plan)),
                "value": pa.array([1.0] * len(plan), pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    df = ev_user_day_islands(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_DAY_ISLANDS, ["events"])
    got = {r["island_len_days"]: r for r in df.collect()}
    # islands: u1 -> len 3 and len 1; u2 -> len 1 and len 2
    assert got[1]["n_islands"] == 2 and got[1]["n_users"] == 2
    assert got[2]["n_islands"] == 1 and got[2]["n_users"] == 1
    assert got[3]["n_islands"] == 1 and got[3]["n_users"] == 1
    assert got[1]["island_share_r6"] == 0.5


def test_abc_xyz_planted(spark, tmp_path):
    """Two parts over a two-month spine: the steady 80%-revenue part
    reads A-X, the erratic small part reads C-Z (B band empty)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_ABC_XYZ,
        orders_abc_xyz_matrix,
    )

    jan, feb = T0_DAY, T0_DAY + 31
    # part 1: qty 10+10 steady, revenue 160.00 -> cum 80% exactly -> A
    # part 2: qty 20+0 erratic, revenue 40.00 -> C (cum > 95%)
    lines = [
        (1, jan, 80.0, 10.0), (1, feb, 80.0, 10.0),
        (2, jan, 40.0, 20.0),
    ]
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([r[0] for r in lines], pa.int64()),
                "l_shipdate": pa.array(
                    [r[1] * US_PER_DAY for r in lines], pa.timestamp("us")
                ),
                "l_extendedprice": pa.array(
                    [r[2] for r in lines], pa.float64()
                ),
                "l_discount": pa.array([0.0] * len(lines), pa.float64()),
                "l_quantity": pa.array([r[3] for r in lines], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    df = orders_abc_xyz_matrix(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_ABC_XYZ, ["lineitem"])
    got = {(r["abc"], r["xyz"]): r for r in df.collect()}
    # part1: n=2 months, sq=20, sq2=200: 4*2*200=1600 <= 5*400=2000 -> X
    # part2: sq=20, sq2=400: 4*2*400=3200 > 2000; 2*400=800 > 2*400 ->
    #        n*sq2=800 > 2*sq*sq=800? 800 <= 800 -> Y boundary: ties to Y
    assert got[("A", "X")]["n_parts"] == 1
    assert got[("A", "X")]["revenue_share_r6"] == 0.8
    assert got[("C", "Y")]["n_parts"] == 1
    assert got[("C", "Y")]["revenue_share_r6"] == 0.2


def test_collocation_pmi_planted(spark, tmp_path):
    """'new york' repeated 5 times (floor) against a background of
    independent tokens: the bigram tops the PMI list with the exact
    ln(N*cxy/(cx*cy)) score."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_COLLOCATION,
        text_collocation_pmi,
    )

    texts = ["new york"] * 5 + ["a b a c a d"]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(6)])
    df = text_collocation_pmi(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_COLLOCATION, ["documents"]
    )
    rows = df.collect()
    assert rows[0]["w1"] == "new" and rows[0]["w2"] == "york"
    assert rows[0]["n_pair"] == 5
    n_tokens = 10 + 6
    pmi = round(math.log(n_tokens * 5 / (5 * 5)), 9)
    assert rows[0]["pmi_r6"] == round(pmi, 6)


# ---------------------------------------------------------------------------
# Batch Z twins
# ---------------------------------------------------------------------------

US_PER_HOUR = 3_600_000_000
US_PER_MIN = 60_000_000


def test_circular_resultant_planted(spark, tmp_path):
    """Hours {0,0,12}: C = 2cos0 + cos180 = 1, S = 0 -> Rbar = 1/3;
    a fully concentrated type reads Rbar = 1 and z = N."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_CIRCULAR_HOUR,
        stats_circular_resultant_hour,
    )

    rows = [
        (0, T0_US, "e", 1.0),
        (1, T0_US + 1, "e", 1.0),
        (2, T0_US + 12 * US_PER_HOUR, "e", 1.0),
        (3, T0_US + 6 * US_PER_HOUR, "peak", 1.0),
        (4, T0_US + 6 * US_PER_HOUR + 5, "peak", 1.0),
    ]
    _write_events(tmp_path, rows)
    df = stats_circular_resultant_hour(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_CIRCULAR_HOUR, ["events"]
    )
    got = {r["event_type"]: r for r in df.collect()}
    e = got["e"]
    assert e["n_events"] == 3
    assert e["rbar_r6"] == round(1 / 3, 6)
    assert e["rayleigh_z_r6"] == round(1 / 3, 6)
    assert e["reject_uniform_05"] is False
    pk = got["peak"]
    assert pk["rbar_r6"] == 1.0 and pk["rayleigh_z_r6"] == 2.0


def test_fiscal_445_planted(spark, tmp_path):
    """Days pinned to the literal Monday epoch: week 0 and week 3 land
    in period 1, week 4 opens period 2, week 52 opens fiscal year 1;
    a pre-epoch order is excluded."""
    from spark_dba_spark.operators.analytics import (
        FISCAL_EPOCH_DAY,
        ORACLE_FISCAL_445,
        orders_fiscal_445_calendar,
    )

    f0 = FISCAL_EPOCH_DAY
    days = [f0, f0 + 27, f0 + 28, f0 + 52 * 7, f0 - 40]
    prices = [10.0, 20.0, 30.0, 40.0, 99.0]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(5), pa.int64()),
                "o_orderdate": pa.array(
                    [d * US_PER_DAY for d in days], pa.timestamp("us")
                ),
                "o_totalprice": pa.array(prices, pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    df = orders_fiscal_445_calendar(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_FISCAL_445, ["orders"])
    got = {(r["fy"], r["period"]): r for r in df.collect()}
    assert got[(0, 1)]["n_orders"] == 2
    assert got[(0, 1)]["revenue"] == 30.0
    assert got[(0, 2)]["revenue"] == 30.0 and got[(0, 2)]["fq"] == 1
    assert got[(1, 1)]["revenue"] == 40.0
    assert sum(r["n_orders"] for r in got.values()) == 4  # pre-epoch dropped


def test_unicode_script_planted(spark, tmp_path):
    """'aé中 1!': Latin a/é, CJK one char, ascii_sym space-digit-bang
    (space dropped? no — cp 32 > 0 counts as ascii_sym)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_SCRIPT_MIX,
        text_unicode_script_mix,
    )

    _write_docs(tmp_path, ["aé中 1!"], ["s0"])
    df = text_unicode_script_mix(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_SCRIPT_MIX, ["documents"])
    got = {r["script"]: r for r in df.collect()}
    assert got["latin"]["n_chars"] == 2
    assert got["cjk"]["n_chars"] == 1
    assert got["ascii_sym"]["n_chars"] == 3  # space, '1', '!'
    assert got["latin"]["share_r6"] == _r6(2, 6)


def test_page_trend_planted(spark, tmp_path):
    """Two types with a perfectly stable daily ordering over 3 days:
    L = 15, E = 13.5, Var = nk^2(k+1)(k^2-1)/144 = 0.75 ->
    z = 1.5/sqrt(0.75), reject at the one-sided 5% bound."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_PAGE_TREND,
        stats_page_trend_test,
    )

    rows = []
    eid = 0
    for d in range(3):
        rows.append((eid, T0_US + d * US_PER_DAY, "a", 1.0)); eid += 1
        for _ in range(2):
            rows.append((eid, T0_US + d * US_PER_DAY, "b", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    df = stats_page_trend_test(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_PAGE_TREND, ["events"])
    row = df.collect()[0]
    assert (row["n_days"], row["n_types"], row["l2"]) == (3, 2, 30)
    assert row["z_r6"] == round(1.5 / math.sqrt(0.75), 6)
    assert row["reject_05"] is True


def test_peak_concurrency_planted(spark, tmp_path):
    """u1 session spans minutes 0..10, u2 a point session at minute 5:
    peak 2 at minute 5; a second day with one session peaks at 1."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_PEAK_CONCURRENCY,
        ev_session_peak_concurrency,
    )

    plan = [
        (0, T0_US, 1), (1, T0_US + 10 * US_PER_MIN, 1),
        (2, T0_US + 5 * US_PER_MIN, 2),
        (3, T0_US + US_PER_DAY, 3),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in plan], pa.int64()),
                "ts": pa.array([r[1] for r in plan], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in plan], pa.int64()),
                "event_type": pa.array(["e"] * len(plan)),
                "value": pa.array([1.0] * len(plan), pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    df = ev_session_peak_concurrency(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_PEAK_CONCURRENCY, ["events"]
    )
    got = {r["epoch_day"]: r for r in df.collect()}
    assert got[T0_DAY]["peak"] == 2
    assert got[T0_DAY]["minute_of_day"] == 5
    assert got[T0_DAY + 1]["peak"] == 1
    assert got[T0_DAY + 1]["minute_of_day"] == 0


def test_capacity_shed_planted(spark, tmp_path):
    """Ten hours of load 1 except one hour of 10 (6 'a' + 4 'b'):
    p90 cap = 1, shed = 9 split 5.4/3.6, mix 0.6/0.4."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_CAPACITY_SHED,
        ev_capacity_shed_whatif,
    )

    rows = []
    eid = 0
    for h in range(9):
        rows.append((eid, T0_US + h * US_PER_HOUR, "a", 1.0)); eid += 1
    for i in range(6):
        rows.append((eid, T0_US + 9 * US_PER_HOUR + i, "a", 1.0)); eid += 1
    for i in range(4):
        rows.append((eid, T0_US + 9 * US_PER_HOUR + 100 + i, "b", 1.0))
        eid += 1
    _write_events(tmp_path, rows)
    df = ev_capacity_shed_whatif(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_CAPACITY_SHED, ["events"]
    )
    got = {r["event_type"]: r for r in df.collect()}
    assert got["a"]["hourly_cap"] == 1
    assert got["a"]["shed_est_r6"] == 5.4
    assert got["b"]["shed_est_r6"] == 3.6
    assert got["a"]["shed_mix_r6"] == 0.6
    assert got["b"]["shed_mix_r6"] == 0.4


# ---------------------------------------------------------------------------
# Batch AA twins
# ---------------------------------------------------------------------------


def test_csv_roundtrip_planted(spark, tmp_path):
    """Texts with embedded commas, quotes and a newline survive the
    to_csv/from_csv round trip bit-exactly."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_CSV_ROUNDTRIP,
        scalar_csv_roundtrip,
    )

    texts = ['a,b "quoted" c', "plain", 'comma, and "both"', "tab\tchar"]
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])
    df = scalar_csv_roundtrip(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_CSV_ROUNDTRIP, ["documents"]
    )
    row = df.collect()[0]
    assert row["n_docs"] == 4
    assert row["n_roundtrip_exact"] == 4
    mass = sum(_md5_long(t) % 1000000007 for t in texts)
    assert row["md5_mass_d"] == float(mass)


def test_line_count_dispersion_planted(spark, tmp_path):
    """Orders with 1, 2 and 3 lines: mean 2, dispersion = Var/Mean =
    (2/3)/2 = 1/3."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_LINE_DISPERSION,
        orders_line_count_dispersion,
    )

    rows = [(1,), (2,), (2,), (3,), (3,), (3,)]
    pq.write_table(
        pa.table({"l_orderkey": pa.array([r[0] for r in rows], pa.int64())}),
        tmp_path / "lineitem.parquet",
    )
    df = orders_line_count_dispersion(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_LINE_DISPERSION, ["lineitem"]
    )
    row = df.collect()[0]
    assert (row["n_orders"], row["min_lines"], row["max_lines"]) == (3, 1, 3)
    assert row["mean_lines_r6"] == 2.0
    # n=3, s=6, s2=14: (3*14-36)/(3*6) = 6/18
    assert row["dispersion_r6"] == _r6(6, 18)


def test_dim_participation_planted(spark, tmp_path):
    """Two informative dims with variances in a 4:1 ratio (others
    zero): PR = (5)^2/(17) on the unit-variance scale."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_DIM_PARTICIPATION,
        emb_dim_variance_participation,
    )

    # dim0: values +-0.5 -> var = 0.25; dim1: +-0.25 -> var = 0.0625
    vecs = [[0.5, 0.25], [-0.5, -0.25], [0.5, 0.25], [-0.5, -0.25]]
    _write_embeddings(tmp_path, vecs)
    df = emb_dim_variance_participation(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_DIM_PARTICIPATION, ["embeddings"]
    )
    row = df.collect()[0]
    assert (row["n_vectors"], row["n_dims"]) == (4, 64)
    assert row["var_total_r6"] == 0.3125
    sl, sl2 = 0.3125, 0.25 * 0.25 + 0.0625 * 0.0625
    assert row["pr_effective_dims_r6"] == round(sl * sl / sl2, 6)
    assert row["top_dim_share_r6"] == round(0.25 / 0.3125, 6)


def test_dow_hour_independence_planted(spark, tmp_path):
    """A 2x2 support (two weekdays x two hours) with identical row
    profiles: chi2 exactly 0; a planted interaction pushes chi2 to
    the brute value."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_DOW_HOUR_INDEP,
        stats_dow_hour_independence,
    )

    rows = []
    eid = 0
    # day T0 (Monday, dw=0) and day T0+1 (dw=1), hours 0 and 1
    # independent layout: each (dw, h) cell gets the product profile
    for d, h, k in [(0, 0, 2), (0, 1, 4), (1, 0, 1), (1, 1, 2)]:
        for _ in range(k):
            rows.append(
                (eid, T0_US + d * US_PER_DAY + h * US_PER_HOUR, "e", 1.0)
            )
            eid += 1
    _write_events(tmp_path, rows)
    df = stats_dow_hour_independence(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_DOW_HOUR_INDEP, ["events"]
    )
    row = df.collect()[0]
    assert row["n_events"] == 9
    assert (row["n_dw"], row["n_h"]) == (2, 2)
    assert row["df"] == 1
    # independent table (rows proportional): chi2 ~ 0 up to the 9dp
    # cell rounding
    import math

    t = sum(
        round(o * o / (r * c), 9)
        for o, r, c in [(2, 6, 3), (4, 6, 6), (1, 3, 3), (2, 3, 6)]
    )
    assert row["chi2_r6"] == round(9 * t - 9, 6)
    assert abs(row["chi2_r6"]) < 1e-5


# ---------------------------------------------------------------------------
# Batch AB twins
# ---------------------------------------------------------------------------


def test_crk_concentration_planted(spark, tmp_path):
    """Five customers in one segment with revenues 50,20,10,10,10:
    CR4 = 90/100; a 2-customer segment reads CR4 = 1."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_CRK,
        orders_crk_concentration,
    )

    customers = [(i, "AUTO") for i in range(1, 6)] + [(6, "BIKE"), (7, "BIKE")]
    orders = [
        (1, 1, 50.0), (2, 2, 20.0), (3, 3, 10.0), (4, 4, 10.0),
        (5, 5, 10.0), (6, 6, 7.0), (7, 7, 3.0),
    ]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([r[0] for r in customers], pa.int64()),
                "c_mktsegment": pa.array([r[1] for r in customers]),
            }
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in orders], pa.int64()),
                "o_custkey": pa.array([r[1] for r in orders], pa.int64()),
                "o_totalprice": pa.array([r[2] for r in orders], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    df = orders_crk_concentration(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_CRK, ["orders", "customer"]
    )
    got = {(r["c_mktsegment"], r["k"]): r for r in df.collect()}
    assert got[("AUTO", 4)]["crk_share_r6"] == 0.9
    assert got[("AUTO", 8)]["crk_share_r6"] == 1.0
    assert got[("BIKE", 4)]["crk_share_r6"] == 1.0
    assert got[("AUTO", 4)]["n_customers"] == 5


def test_hurst_rs_planted(spark, tmp_path):
    """Eight days of counts [2,4,2,4,...]: every m=4 block has the
    same R/S, recomputed by hand; m=16 has no complete block so the
    OLS runs on two points."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_HURST_RS,
        ev_hurst_rescaled_range,
    )

    counts = [2, 4, 2, 4, 2, 4, 2, 4]
    rows = []
    eid = 0
    for i, x in enumerate(counts):
        for _ in range(x):
            rows.append((eid, T0_US + i * US_PER_DAY, "e", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    df = ev_hurst_rescaled_range(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_HURST_RS, ["events"])
    row = df.collect()[0]
    # block [2,4,2,4]: s=12, W_k = 4*cx - (k+1)*12: cx=[2,6,8,12] ->
    # W = [-4, 0, -4, 0]: range 4; m*s2 - s^2 = 4*40 - 144 = 16
    rs4 = round(4 / math.sqrt(16), 9)
    assert row["mean_rs_m4_r6"] == round(rs4, 6)
    # m=8 block: s=24, s2=80: 8*80-576 = 64; cx cumulative:
    # [2,6,8,12,14,18,20,24], W = 8*cx-(k+1)*24:
    w = [8 * c - (k + 1) * 24 for k, c in
         enumerate([2, 6, 8, 12, 14, 18, 20, 24])]
    rs8 = round((max(w) - min(w)) / math.sqrt(64), 9)
    assert row["mean_rs_m8_r6"] == round(rs8, 6)
    assert row["mean_rs_m16_r6"] is None
    import math as m_

    lx = [1.386294361120, 2.079441542148]
    ly = [round(m_.log(rs4), 9), round(m_.log(rs8), 9)]
    slope = (ly[1] - ly[0]) / (lx[1] - lx[0])
    assert abs(row["hurst_rs_r6"] - round(slope, 6)) < 2e-6


def test_rate_ratio_planted(spark, tmp_path):
    """Span Mon..Sun (5 weekday + 2 weekend days), 4 weekday vs 2
    weekend events: RR = (2/2)/(4/5) = 1.25."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_RATE_RATIO,
        stats_rate_ratio_weekend,
    )

    sat, sun = 5, 6  # offsets from the Monday T0
    rows = [
        (0, T0_US, "e", 1.0), (1, T0_US + 2 * US_PER_DAY, "e", 1.0),
        (2, T0_US + 3 * US_PER_DAY, "e", 1.0),
        (3, T0_US + 4 * US_PER_DAY, "e", 1.0),
        (4, T0_US + sat * US_PER_DAY, "e", 1.0),
        (5, T0_US + sun * US_PER_DAY, "e", 1.0),
    ]
    _write_events(tmp_path, rows)
    df = stats_rate_ratio_weekend(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_RATE_RATIO, ["events"])
    row = df.collect()[0]
    assert (row["n_weekend_events"], row["n_weekday_events"]) == (2, 4)
    assert (row["n_weekend_days"], row["n_weekday_days"]) == (2, 5)
    assert row["rate_ratio_r6"] == 1.25
    z = math.log(1.25) / math.sqrt(1 / 2 + 1 / 4)
    assert row["z_r6"] == round(z, 6)


def test_hll_intersection_brute(spark, tmp_path):
    """Weekend users {1..6}, weekday users {4..9} (exact intersection
    3): the register lanes, both estimate branches and the band flag
    recomputed with hashlib."""
    from spark_dba_spark.operators.analytics import (
        HLL_IM,
        HLL_IW,
        ORACLE_HLL_INTERSECTION,
        sketch_hll_intersection_error,
    )

    sat = 5
    rows = []
    eid = 0
    for u in range(1, 7):
        rows.append((eid, T0_US + sat * US_PER_DAY, u)); eid += 1
    for u in range(4, 10):
        rows.append((eid, T0_US, u)); eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["e"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    df = sketch_hll_intersection_error(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_HLL_INTERSECTION, ["events"]
    )
    row = df.collect()[0]
    assert row["exact_intersection"] == 3

    def est(users):
        regs = [0] * HLL_IM
        for u in users:
            h = _md5_long(str(u))
            b, w = h % HLL_IM, h // HLL_IM
            rho = HLL_IW + 1 if w == 0 else HLL_IW + 1 - w.bit_length()
            regs[b] = max(regs[b], rho)
        znum = sum(2 ** (HLL_IW + 1 - r) for r in regs)
        v = sum(1 for r in regs if r == 0)
        raw = 0.709 * HLL_IM * HLL_IM * 2 ** (HLL_IW + 1) / znum
        if raw <= 2.5 * HLL_IM and v > 0:
            return HLL_IM * math.log(HLL_IM / v)
        return raw

    ea, eb = est(range(1, 7)), est(range(4, 10))
    eu = est(range(1, 10))
    assert row["est_weekend_r6"] == round(ea, 6)
    assert row["est_union_r6"] == round(eu, 6)
    assert row["est_intersection_r6"] == round(ea + eb - eu, 6)
    band = 3 * 1.04 / math.sqrt(HLL_IM) * (ea + eb + eu)
    assert row["within_3sigma_band"] == (abs(ea + eb - eu - 3) <= band)


def test_discount_response_planted(spark, tmp_path):
    """Zero-discount lines avg qty 10, 5%-discount lines avg 15:
    lift exactly 1.5."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_DISCOUNT_RESPONSE,
        lineitem_discount_response_curve,
    )

    lines = [(0.0, 8.0), (0.0, 12.0), (0.05, 14.0), (0.05, 16.0)]
    pq.write_table(
        pa.table(
            {
                "l_discount": pa.array([r[0] for r in lines], pa.float64()),
                "l_quantity": pa.array([r[1] for r in lines], pa.float64()),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    df = lineitem_discount_response_curve(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_DISCOUNT_RESPONSE, ["lineitem"]
    )
    got = {r["discount_pct"]: r for r in df.collect()}
    assert got[0]["mean_qty_r6"] == 10.0
    assert got[0]["qty_lift_vs_zero_r6"] == 1.0
    assert got[5]["mean_qty_r6"] == 15.0
    assert got[5]["qty_lift_vs_zero_r6"] == 1.5


def test_ingestion_drift_planted(spark, tmp_path):
    """First half centered at +0.5 on dim0, second at -0.5; the parity
    split sees the same mix on both sides of dim0 -> ordered drift 1.0,
    interleaved 0."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_INGESTION_DRIFT,
        emb_ingestion_drift_halves,
    )

    # ids 0,1 (first half incl. median id 1... median of 4 = rank 2 ->
    # id 1): ids 0,1 -> +0.5; ids 2,3 -> -0.5
    vecs = [[0.5], [0.5], [-0.5], [-0.5]]
    _write_embeddings(tmp_path, vecs)
    df = emb_ingestion_drift_halves(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_INGESTION_DRIFT, ["embeddings"]
    )
    row = df.collect()[0]
    assert (row["n_first_half"], row["n_second_half"]) == (2, 2)
    assert row["drift_ordered_r6"] == 1.0
    # parity split: {0,2} mean 0 vs {1,3} mean 0 -> drift 0
    assert row["drift_interleaved_r6"] == 0.0
    assert row["drift_ratio_r6"] is None


# ---------------------------------------------------------------------------
# Batch AC twins
# ---------------------------------------------------------------------------


def test_lsh_bucket_skew_planted(spark, tmp_path):
    """A 4-clique of identical docs plus an identical pair: 25 buckets
    of size 4 and 25 of size 2 -> 175 candidate pairs, p99 bucket 4,
    no hot buckets at threshold 8."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_BUCKET_SKEW,
        dedup_lsh_bucket_skew,
    )

    clique = "the quick brown fox jumps over the lazy dog again and again"
    pair = "a completely different text about suppliers and parts orders"
    texts = [clique] * 4 + [pair] * 2
    _write_docs(tmp_path, texts, [f"s{i}" for i in range(len(texts))])
    df = dedup_lsh_bucket_skew(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_BUCKET_SKEW, ["documents"]
    )
    row = df.collect()[0]
    assert row["n_buckets"] == 50
    assert row["n_slots"] == 150
    assert row["max_bucket"] == 4
    assert row["p99_bucket"] == 4
    assert row["candidate_pairs"] == 25 * 6 + 25 * 1
    assert row["hot_pair_share_r6"] == 0.0


def test_return_drivers_planted(spark, tmp_path):
    """B1: 2 lines 1 returned (rate .5, lift 1.5 vs global 1/3);
    B2: no returns."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_RETURN_DRIVERS,
        lineitem_return_rate_drivers,
    )

    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 2], pa.int64()),
                "l_returnflag": pa.array(["R", "N", "N"]),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_brand": pa.array(["B1", "B2"]),
            }
        ),
        tmp_path / "part.parquet",
    )
    df = lineitem_return_rate_drivers(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_RETURN_DRIVERS, ["lineitem", "part"]
    )
    got = {r["p_brand"]: r for r in df.collect()}
    assert got["B1"]["return_rate_r6"] == 0.5
    assert got["B1"]["lift_vs_global_r6"] == 1.5
    assert got["B2"]["return_rate_r6"] == 0.0
    assert got["B2"]["lift_vs_global_r6"] == 0.0


def test_hill_tail_planted(spark, tmp_path):
    """Activity counts 8/4/2/1: threshold is the 4th user (x=1), the
    9dp-decimal Hill mean over ln(8), ln(4), ln(2)."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_HILL,
        ev_hill_tail_index,
    )

    rows = []
    eid = 0
    for u, k in [(1, 8), (2, 4), (3, 2), (4, 1)]:
        for _ in range(k):
            rows.append((eid, T0_US + eid, u))
            eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["e"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
            }
        ),
        tmp_path / "events.parquet",
    )
    df = ev_hill_tail_index(spark, str(tmp_path))
    _assert_spark_matches_oracle(df, tmp_path, ORACLE_HILL, ["events"])
    row = df.collect()[0]
    assert (row["k"], row["x_threshold"]) == (3, 1)
    sh = sum(round(math.log(x), 9) for x in (8, 4, 2))
    assert row["hill_mean_r6"] == round(sh / 3, 6)
    assert row["tail_alpha_r6"] == round(1 / (sh / 3), 6)


def test_header_body_entropy_planted(spark, tmp_path):
    """72 'a's (image): zero entropy in both segments; an 'ab'-mixed
    doc splits into a 64-byte header and 16-byte body with equal
    two-symbol entropy -> delta 0 in both cases."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_HEADER_BODY,
        mm_header_body_entropy,
    )

    _write_docs(tmp_path, ["a" * 72, "ab" * 40], ["s0", "s1"])
    df = mm_header_body_entropy(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_HEADER_BODY, ["documents"]
    )
    got = {r["media_type"]: r for r in df.collect()}
    img = got["image"]  # doc 0
    assert (img["n_header_bytes"], img["n_body_bytes"]) == (64, 8)
    assert img["h_header_r6"] == 0.0 and img["h_body_r6"] == 0.0
    aud = got["audio"]  # doc 1: header 32a+32b, body 8a+8b
    assert (aud["n_header_bytes"], aud["n_body_bytes"]) == (64, 16)
    assert aud["h_header_r6"] == _h9_local([32, 32])
    assert aud["h_body_r6"] == _h9_local([8, 8])
    assert aud["delta_r6"] == round(
        _h9_local([8, 8]) - _h9_local([32, 32]), 6
    )


def _h9_local(counts):
    n = sum(counts)
    s = sum(round(c * math.log(c), 9) for c in counts)
    return round(round(math.log(n), 9) - s / n, 6)


def test_median_test_nations_planted(spark, tmp_path):
    """Nation 0 cents {100,200}, nation 1 {300,400}: grand median 200
    drops its own tie, the 2x2 table reads chi2 = 3."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_MEDIAN_NATIONS,
        stats_median_test_nations,
    )

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(4), pa.int64()),
                "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
                "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            }
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], pa.int64()),
                "c_nationkey": pa.array([0, 1], pa.int32()),
            }
        ),
        tmp_path / "customer.parquet",
    )
    df = stats_median_test_nations(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_MEDIAN_NATIONS, ["orders", "customer"]
    )
    row = df.collect()[0]
    assert row["n_orders_tested"] == 3
    assert row["n_nations"] == 2 and row["df"] == 1
    assert row["chi2_r6"] == 3.0
    assert row["reject_05"] is None  # critical only for the 25-nation table


def test_lang_script_agreement_planted(spark, tmp_path):
    """Three latin docs (en, en, fr) and one cyrillic (ru): latin's
    modal lang is en with 2/3 agreement, cyrillic agrees 1/1."""
    from spark_dba_spark.operators.analytics import (
        ORACLE_LANG_SCRIPT,
        text_lang_script_agreement,
    )

    texts = ["hello world", "good day", "bonjour", "привет мир"]
    langs = ["en", "en", "fr", "ru"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(["s"] * 4),
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = text_lang_script_agreement(spark, str(tmp_path))
    _assert_spark_matches_oracle(
        df, tmp_path, ORACLE_LANG_SCRIPT, ["documents"]
    )
    got = {r["script"]: r for r in df.collect()}
    assert got["latin"]["n_docs"] == 3
    assert got["latin"]["modal_lang"] == "en"
    assert got["latin"]["agree_share_r6"] == _r6(2, 3)
    assert got["cyrillic"]["n_docs"] == 1
    assert got["cyrillic"]["agree_share_r6"] == 1.0
