"""Folder-stats reporter and trash vacuum (DBA lifecycle utilities)."""

from __future__ import annotations

import os
import time

from spark_dba_spark.plans.compact import CompactionParams, compact
from spark_dba_spark.plans.stats import folder_stats, needs_compaction, vacuum_trash
from spark_dba_spark.sources.fsops import FsOps

from test_compact import parquet_files, write_small_files


def test_folder_stats_and_need_report(spark, tmp_path):
    fs = FsOps(spark)
    src = str(tmp_path / "src")
    write_small_files(f"{src}/dt=a", n_files=5)
    write_small_files(f"{src}/dt=b", n_files=1, start=500)
    stats = {s.partition: s for s in folder_stats(fs, src)}
    assert set(stats) == {"/dt=a", "/dt=b"}
    assert stats["/dt=a"].n_files == 5
    assert stats["/dt=a"].small_files == 5  # all tiny
    assert stats["/dt=a"].total_bytes > 0
    need = needs_compaction(list(stats.values()))
    assert [s.partition for s in need] == ["/dt=a"]  # dt=b has <2 files


def test_stats_reflect_compaction(spark, tmp_path):
    fs = FsOps(spark)
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    write_small_files(src, n_files=6)
    assert folder_stats(fs, src)[0].n_files == 6
    res = compact(spark, CompactionParams(source=src, target=tgt, file_count=1))
    assert res.success
    after = folder_stats(fs, tgt)[0]
    assert after.n_files == 1
    assert after.total_bytes > 0


def test_vacuum_trash_ttl(spark, tmp_path):
    fs = FsOps(spark)
    trash = str(tmp_path / "trash")
    os.makedirs(trash)
    now = int(time.time() * 1000)
    old_session = f"tgt_{now - 10_000_000}_123_456"
    new_session = f"tgt_{now - 1_000}_123_457"
    for name in (old_session, new_session):
        os.makedirs(f"{trash}/{name}/dt=a")
        with open(f"{trash}/{name}/dt=a/f.parquet", "w") as fh:
            fh.write("x")

    # dry run deletes nothing
    would = vacuum_trash(fs, trash, older_than_ms=3_600_000, dry_run=True)
    assert [p.rsplit("/", 1)[-1] for p in would] == [old_session]
    assert os.path.exists(f"{trash}/{old_session}")

    removed = vacuum_trash(fs, trash, older_than_ms=3_600_000)
    assert [p.rsplit("/", 1)[-1] for p in removed] == [old_session]
    assert not os.path.exists(f"{trash}/{old_session}")
    assert os.path.exists(f"{trash}/{new_session}")  # recover window intact


def test_vacuum_after_real_compaction_overwrite(spark, tmp_path):
    """End-to-end: overwrite compaction trashes the old target; vacuum with
    ttl=0 clears it; vacuum respects a large ttl before that."""
    fs = FsOps(spark)
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    tmpf, trash = str(tmp_path / "tmpf"), str(tmp_path / "trash")
    os.makedirs(tmpf), os.makedirs(trash)
    write_small_files(src, n_files=3)
    write_small_files(tgt, n_files=2, start=900, decoys=False)
    res = compact(spark, CompactionParams(
        source=src, target=tgt, file_count=1, overwrite=True,
        tmp_folder=tmpf, trash_folder=trash,
    ))
    assert res.success, res.errors
    assert os.listdir(trash)
    assert vacuum_trash(fs, trash, older_than_ms=3_600_000) == []
    removed = vacuum_trash(fs, trash, older_than_ms=0)
    assert removed and os.listdir(trash) == []


def test_vacuum_ignores_implausible_numeric_names(spark, tmp_path):
    """Regression: a numeric-but-not-epoch token (e.g. 'backup_2020_01_05')
    must not make a fresh entry look ancient and get deleted."""
    fs = FsOps(spark)
    trash = str(tmp_path / "trash")
    os.makedirs(f"{trash}/backup_2020_01_05")
    removed = vacuum_trash(fs, trash, older_than_ms=3_600_000)
    assert removed == []
    assert os.path.exists(f"{trash}/backup_2020_01_05")


def test_restore_from_trash_undoes_overwrite(spark, tmp_path):
    """The recoverable half of trash-then-swap: after an overwrite
    compaction, restore brings back the previous target content, and the
    displaced (compacted) version is itself preserved in the trash."""
    from spark_dba_spark.plans.stats import restore_from_trash

    fs = FsOps(spark)
    src, tgt = str(tmp_path / "src"), str(tmp_path / "tgt")
    tmpf, trash = str(tmp_path / "tmpf"), str(tmp_path / "trash")
    os.makedirs(tmpf), os.makedirs(trash)
    write_small_files(src, n_files=3)
    original = write_small_files(tgt, n_files=2, start=900, decoys=False)

    res = compact(spark, CompactionParams(
        source=src, target=tgt, file_count=1, overwrite=True,
        tmp_folder=tmpf, trash_folder=trash,
    ))
    assert res.success, res.errors
    # target now holds the compacted source data, not the original
    assert spark.read.parquet(tgt).count() == 75

    restored = restore_from_trash(fs, trash, tgt)
    assert restored
    got = [
        (r["id"], r["name"], None) for r in spark.read.parquet(tgt).collect()
    ]
    import collections as _c

    assert _c.Counter(got) == _c.Counter(original)
    # the displaced compacted version is itself recoverable
    assert any(
        e.path.rsplit("/", 1)[-1].startswith("restored_")
        for e in fs.list_status(trash)
    )


# ---------------------------------------------------------------------------
# Algebraic identities behind the r5 stateful/rolling rewrites
# ---------------------------------------------------------------------------

def _fold_floor_zero(deltas):
    bal = mx = resets = 0
    for d in deltas:
        bal += d
        if bal < 0:
            bal = 0
            resets += 1
        if bal > mx:
            mx = bal
    return bal, mx, resets


def test_capped_fold_equals_reflection_identity():
    """The floor-at-zero fold equals the reflection closed form
    (walk minus running min; resets = strict running-min decreases) —
    the identity inv_running_balance_capped's oracle relies on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=200))
    def check(deltas):
        bal, mx, resets = _fold_floor_zero(deltas)
        ps = 0
        runmin = 0
        prevmin = 0
        r_resets = 0
        bals = []
        for d in deltas:
            ps += d
            prevmin = runmin
            runmin = min(runmin, ps)
            if ps < prevmin:
                r_resets += 1
            bals.append(ps - runmin)
        assert bals[-1] == bal
        assert max(bals) == mx
        assert r_resets == resets

    check()


def test_rolling_coverage_intervals_equal_brute():
    """The disjoint-coverage-interval rewrite of the rolling 30-day
    distinct count equals brute force on arbitrary activity sets —
    the identity ev_rolling_distinct_users' two formulations share."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    WINDOW = 7  # smaller window exercises truncation more often

    @settings(max_examples=200, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 5),  # user
            st.sets(st.integers(0, 60), min_size=1, max_size=25),
            min_size=1,
            max_size=6,
        )
    )
    def check(activity):
        lo = min(min(days) for days in activity.values())
        hi = max(max(days) for days in activity.values())
        # interval rewrite
        deltas = Counter()
        for days in activity.values():
            sdays = sorted(days)
            for d, nxt in zip(sdays, sdays[1:] + [None]):
                end = d + WINDOW - 1
                if nxt is not None:
                    end = min(end, nxt - 1)
                deltas[d] += 1
                deltas[end + 1] -= 1
        running = 0
        rewrite = {}
        for day in range(lo, hi + 1):
            running += deltas.get(day, 0)
            rewrite[day] = running
        # brute force
        for day in range(lo, hi + 1):
            brute = sum(
                1
                for days in activity.values()
                if any(day - WINDOW + 1 <= d <= day for d in days)
            )
            assert rewrite[day] == brute, (day, rewrite[day], brute)

    check()


def test_bucket_selection_equals_order_statistic():
    """The two-pass bucket-selection rewrite (histogram locates the
    k-th element's bucket + residual rank) equals the sorted order
    statistic on arbitrary float multisets — the identity
    agg_exact_global_median's two formulations share."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    B = 16  # few buckets → lots of residual-rank action

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1,
            max_size=200,
        ),
        st.floats(min_value=0.01, max_value=1.0),
    )
    def check(vals, q):
        n = len(vals)
        k = max(1, math.ceil(q * n))
        expected = sorted(vals)[k - 1]
        lo, hi = min(vals), max(vals)
        if hi > lo:
            bid = lambda v: min(B - 1, int((v - lo) / (hi - lo) * B))
        else:
            bid = lambda v: 0
        hist = {}
        for v in vals:
            hist[bid(v)] = hist.get(bid(v), 0) + 1
        cum = 0
        for b in sorted(hist):
            prev = cum
            cum += hist[b]
            if cum >= k and prev < k:
                residual = k - prev
                in_bucket = sorted(v for v in vals if bid(v) == b)
                assert in_bucket[residual - 1] == expected
                return
        raise AssertionError("no bucket located")

    check()


def test_ewma_weight_ladder_invariants():
    """The literal EWMA ladders both engines embed must satisfy the
    defining identities: w_k = alpha(1-alpha)^k, cumw is its prefix sum,
    and the truncated mass is 1-(1-alpha)^K (the documented ~1% tail)."""
    from spark_dba_spark.operators.temporal import (
        EWMA_ALPHA,
        EWMA_TAPS,
        _EWMA_CUMW,
        _EWMA_W,
    )

    assert len(_EWMA_W) == len(_EWMA_CUMW) == EWMA_TAPS
    acc = 0.0
    for k, w in enumerate(_EWMA_W):
        assert w == EWMA_ALPHA * (1 - EWMA_ALPHA) ** k
        acc += w
        assert _EWMA_CUMW[k] == acc
    assert abs(_EWMA_CUMW[-1] - (1 - (1 - EWMA_ALPHA) ** EWMA_TAPS)) < 1e-12
    # ladder literals must round-trip exactly through repr (the property
    # both engines' embedded literals rely on)
    for w in _EWMA_W + _EWMA_CUMW:
        assert float(repr(w)) == w


def test_ntile_boundary_selection_identity():
    """The boundary-row assignment rule behind _ntile_assign_bounded
    equals NTILE(k) over the (value, id) total order on arbitrary
    multisets (heavy ties, n < k, all-equal values): with boundary
    ranks R_b = b*floor(n/k) + min(b, n mod k) and boundary rows taken
    at those ranks, bucket(row) = 1 + |{b : row > boundary_b}| —
    because the id tie-break makes the order total, row > boundary_b
    iff rank(row) > R_b."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(-5, 5), min_size=1, max_size=60),
        st.integers(2, 8),
    )
    def check(vals, k):
        rows = sorted((v, i) for i, v in enumerate(vals))
        n = len(rows)
        base, rem = divmod(n, k)
        # reference NTILE: first `rem` buckets get base+1 rows
        ref = {}
        r = 0
        for b in range(1, k + 1):
            size = base + (1 if b <= rem else 0)
            for _ in range(size):
                if r < n:
                    ref[rows[r]] = b
                    r += 1
        bounds = [
            rows[b * base + min(b, rem) - 1] for b in range(1, k)
        ]  # rank R_b is 1-indexed; R_b >= 1 because n >= 1
        for row in rows:
            got = 1 + sum(1 for bd in bounds if row > bd)
            assert got == ref[row], (vals, k, row, got, ref[row])

    check()


def test_anova_degenerate_variance_yields_null(spark, tmp_path):
    """ADVICE r6: one brand + all-equal prices makes k-1 == 0 and
    ss_within == 0 — f_stat/eta_squared must be NULL on BOTH engines
    (not Inf/NaN), matching the stats_ab_test guard posture."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.temporal import (
        ORACLE_ANOVA,
        stats_anova_price_brand,
    )

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2, 3], pa.int64()),
                "l_partkey": pa.array([1, 1, 1], pa.int64()),
                "l_suppkey": pa.array([1, 1, 1], pa.int64()),
                "l_linenumber": pa.array([1, 1, 1], pa.int32()),
                "l_quantity": [1.0] * 3,
                "l_extendedprice": [100.00] * 3,  # zero variance
                "l_discount": [0.0] * 3,
                "l_tax": [0.0] * 3,
                "l_returnflag": ["N"] * 3,
                "l_linestatus": ["O"] * 3,
                "l_shipdate": pa.array(
                    [__import__("datetime").datetime(1997, 1, 1)] * 3,
                    pa.timestamp("us"),
                ),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_name": ["p"],
                "p_brand": ["Brand#11"],  # a single group -> k == 1
                "p_type": ["t"],
                "p_size": pa.array([1], pa.int32()),
                "p_retailprice": [1.0],
            }
        ),
        tmp_path / "part.parquet",
    )
    row = stats_anova_price_brand(spark, str(tmp_path)).collect()[0]
    assert row["n_groups"] == 1
    assert row["f_stat"] is None and row["eta_squared"] is None
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    orow = con.execute(ORACLE_ANOVA).fetchone()
    con.close()
    assert orow[5] is None and orow[6] is None


def test_scorecard_shortest_repr_tie(spark, tmp_path):
    """Regression (found at sf0.1): 333/640 = 0.5203125 terminates at
    the 7th decimal digit with a 5 — Spark's shortest-repr round called
    it a tie (up) while DuckDB's multiply saw the true binary value
    below it (down). The integer half-up rewrite must give the same
    cell on both engines. Plant exactly that supplier."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_dba_spark.operators.temporal import (
        ORACLE_SUPPLIER_SCORECARD,
        supplier_scorecard,
    )

    n_lines, n_on_time = 640, 333
    d0 = datetime.datetime(1997, 1, 1)
    # on-time lines ship day 0 (0 days <= SLA); late ones day 100
    ship = [d0] * n_on_time + [datetime.datetime(1997, 4, 11)] * (
        n_lines - n_on_time
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1] * n_lines, pa.int64()),
                "l_partkey": pa.array([1] * n_lines, pa.int64()),
                "l_suppkey": pa.array([7] * n_lines, pa.int64()),
                "l_linenumber": pa.array(range(1, n_lines + 1), pa.int32()),
                "l_quantity": [1.0] * n_lines,
                "l_extendedprice": [10.0] * n_lines,
                "l_discount": [0.0] * n_lines,
                "l_tax": [0.0] * n_lines,
                "l_returnflag": ["N"] * n_lines,
                "l_linestatus": ["O"] * n_lines,
                "l_shipdate": pa.array(ship, pa.timestamp("us")),
            }
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([1], pa.int64()),
                "o_orderstatus": ["F"],
                "o_totalprice": [100.0],
                "o_orderdate": pa.array([d0], pa.timestamp("us")),
                "o_orderpriority": ["1-URGENT"],
            }
        ),
        tmp_path / "orders.parquet",
    )
    row = supplier_scorecard(spark, str(tmp_path)).collect()[0]
    assert row["on_time_rate"] == 0.520313  # half-up of 0.5203125
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    orow = con.execute(ORACLE_SUPPLIER_SCORECARD).fetchone()
    con.close()
    assert orow[2] == row["on_time_rate"]


def test_ks_and_mwu_equal_brute_force(spark):
    """The bucketed two-pass KS/MWU formulations equal the textbook
    single-stream definitions computed in plain Python on the same
    sample (sf0.001) — guards the bucket-prefix plumbing (off-by-one in
    the exclusive prefix or the tie handling would shift both)."""
    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import (
        TS2_TYPE_A,
        TS2_TYPE_B,
        stats_ks_two_sample,
        stats_mann_whitney_u,
    )

    con = duckdb.connect()
    vals = con.execute(
        "SELECT event_type, value FROM "
        f"read_parquet('{SF_DIR}/events.parquet') "
        f"WHERE event_type IN ('{TS2_TYPE_A}', '{TS2_TYPE_B}')"
    ).fetchall()
    con.close()
    s1 = sorted(v for t, v in vals if t == TS2_TYPE_A)
    s2 = sorted(v for t, v in vals if t == TS2_TYPE_B)
    n1, n2 = len(s1), len(s2)
    assert n1 > 0 and n2 > 0

    # KS: max over distinct values of |cum1*n2 - cum2*n1| (ties absorbed)
    from collections import Counter

    c1, c2 = Counter(s1), Counter(s2)
    cum1 = cum2 = 0
    d_num = 0
    for v in sorted(set(s1) | set(s2)):
        cum1 += c1.get(v, 0)
        cum2 += c2.get(v, 0)
        d_num = max(d_num, abs(cum1 * n2 - cum2 * n1))
    row = stats_ks_two_sample(spark, SF_DIR).collect()[0]
    assert (row["n1"], row["n2"], row["d_num"]) == (n1, n2, d_num)

    # MWU: mid-rank rank-sum over the combined sample, carried as 2R
    allv = sorted(s1 + s2)
    # 2*midrank of a tie group spanning ranks (s+1..s+t) is 2s + t + 1
    before = 0
    r2_1 = 0
    for v in sorted(set(allv)):
        t = c1.get(v, 0) + c2.get(v, 0)
        r2_1 += c1.get(v, 0) * (2 * before + t + 1)
        before += t
    u2 = r2_1 - n1 * (n1 + 1)
    assert 0 <= u2 <= 2 * n1 * n2
    mrow = stats_mann_whitney_u(spark, SF_DIR).collect()[0]
    assert (mrow["n1"], mrow["n2"], mrow["u_times2"]) == (n1, n2, u2)
    # exact-rational half-up of the common-language effect size
    den = 2 * n1 * n2
    expect = float((u2 * 2_000_000 + den) // (2 * den)) / 1e6
    assert mrow["cles_r6"] == expect


def _r6(num: int, den: int) -> float:
    """Python twin of the exact-rational half-up (num >= 0, den > 0)."""
    return float((num * 2_000_000 + den) // (2 * den)) / 1e6


def _r6_signed(num: int, den: int) -> float:
    return _r6(num, den) if num >= 0 else -_r6(-num, den)


def test_spearman_matches_fraction_brute(spark):
    """The bucketed-prefix rank construction + DECIMAL(38,0) readout
    equal the textbook permutation-rank Spearman computed with exact
    integer arithmetic in Python — guards the prefix off-by-one and
    the decimal div semantics."""
    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import stats_spearman_rank_corr

    con = duckdb.connect()
    rows = con.execute(
        "SELECT p_partkey, p_retailprice, p_size FROM "
        f"read_parquet('{SF_DIR}/part.parquet')"
    ).fetchall()
    con.close()
    import hashlib

    rx = {k: i + 1 for i, (k, _, _) in enumerate(
        sorted(rows, key=lambda r: (r[1], r[0])))}
    # size ties break by md5(key) order — DECOUPLED from rx's key order
    # so heavy p_size ties can't manufacture rank agreement (ADVICE r8)
    ry = {k: i + 1 for i, (k, _, _) in enumerate(
        sorted(rows, key=lambda r: (
            r[2], hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])))}
    n = len(rows)
    sum_d2 = sum((rx[k] - ry[k]) ** 2 for k, _, _ in rows)
    den = n * (n - 1) * (n + 1)
    row = stats_spearman_rank_corr(spark, SF_DIR).collect()[0]
    assert (row["n_parts"], row["sum_d2"]) == (n, sum_d2)
    assert row["rho_r6"] == _r6_signed(den - 6 * sum_d2, den)


def test_kendall_matches_numpy_brute(spark):
    """Tau-a over daily (order count, revenue cents) equals the O(n^2)
    numpy pairwise count — guards the concordance sign logic and the
    Class C cents quantization."""
    import math

    import duckdb
    import numpy as np

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import stats_kendall_daily

    con = duckdb.connect()
    orows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    daily: dict = {}
    for dt, tp in orows:
        x, y = daily.get(dt, (0, 0))
        daily[dt] = (x + 1, y + math.floor(tp * 100 + 0.5))
    xs = np.array([v[0] for v in daily.values()], dtype=np.int64)
    ys = np.array([v[1] for v in daily.values()], dtype=np.int64)
    n = len(xs)
    prod = (xs[:, None] - xs[None, :]) * (ys[:, None] - ys[None, :])
    iu = np.triu_indices(n, k=1)
    conc = int((prod[iu] > 0).sum())
    disc = int((prod[iu] < 0).sum())
    row = stats_kendall_daily(spark, SF_DIR).collect()[0]
    assert (row["n_days"], row["concordant"], row["discordant"]) == (
        n, conc, disc)
    assert row["tau_a_r6"] == _r6_signed(2 * (conc - disc), n * (n - 1))


def test_q13_distribution_brute(spark):
    """The two-level Q13 aggregation equals plain Python dict counting,
    including customers whose every order is filtered away (the LEFT
    join must keep them at c_count = 0)."""
    from collections import Counter

    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.relational import q13_customer_distribution

    con = duckdb.connect()
    custs = [r[0] for r in con.execute(
        f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')"
    ).fetchall()]
    orders = con.execute(
        "SELECT o_custkey FROM "
        f"read_parquet('{SF_DIR}/orders.parquet') "
        "WHERE o_orderpriority <> '1-URGENT'"
    ).fetchall()
    con.close()
    per_cust = {c: 0 for c in custs}
    for (c,) in orders:
        if c in per_cust:
            per_cust[c] += 1
    dist = Counter(per_cust.values())
    rows = q13_customer_distribution(spark, SF_DIR).collect()
    assert {r["c_count"]: r["custdist"] for r in rows} == dict(dist)
    # deterministic presentation order: custdist desc, c_count desc
    keys = [(-r["custdist"], -r["c_count"]) for r in rows]
    assert keys == sorted(keys)


def test_fano_matches_python_brute(spark):
    """Per-type Fano over hourly counts equals the literal definition —
    sample variance over EVERY hour of the span including silent ones —
    computed with exact integers in Python. Guards the zero-hour trick
    (zeros enter only through n) and the span endpoint arithmetic."""
    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import ev_fano_overdispersion

    con = duckdb.connect()
    rows = con.execute(
        "SELECT event_type, epoch_us(date_trunc('hour', ts)), "
        "epoch_us(date_trunc('hour', ts)) // 3600000000 FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    con.close()
    hours = [h for _, _, h in rows]
    n = max(hours) - min(hours) + 1
    counts: dict = {}
    for et, _, h in rows:
        counts[(et, h)] = counts.get((et, h), 0) + 1
    got = {r["event_type"]: r for r in
           ev_fano_overdispersion(spark, SF_DIR).collect()}
    types = {et for et, _, _ in rows}
    assert set(got) == types
    for et in types:
        cs = [c for (t, _), c in counts.items() if t == et]
        s, q = sum(cs), sum(c * c for c in cs)
        r = got[et]
        assert (r["n_hours"], r["n_events"]) == (n, s)
        assert r["mean_r6"] == _r6(s, n)
        assert r["fano_r6"] == _r6(n * q - s * s, (n - 1) * s)
        # cross-check against the float definition (population-free
        # sample variance over n hours incl. zeros, tolerance 1e-6)
        import statistics

        full = cs + [0] * (n - len(cs))
        fano = statistics.variance(full) / statistics.mean(full)
        assert abs(r["fano_r6"] - fano) < 1e-6


def test_gap_log2_histogram_matches_python_brute(spark):
    """The lag-window gap buckets equal a per-(user, type) Python replay,
    with the bucket from int.bit_length() — guards the bin()-string
    bucket (exact at power-of-two boundaries) and the zero-gap class."""
    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import ev_gap_log2_histogram

    con = duckdb.connect()
    rows = con.execute(
        "SELECT user_id, event_type, event_id, epoch_us(ts) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    con.close()
    series: dict = {}
    for u, et, eid, um in rows:
        series.setdefault((u, et), []).append((um, eid))
    hist: dict = {}
    for (u, et), pts in series.items():
        pts.sort()
        for (a, _), (b, _) in zip(pts, pts[1:]):
            gap = b - a
            bucket = -1 if gap == 0 else gap.bit_length() - 1
            hist[(et, bucket)] = hist.get((et, bucket), 0) + 1
    got = {(r["event_type"], r["bucket"]): r for r in
           ev_gap_log2_histogram(spark, SF_DIR).collect()}
    assert set(got) == set(hist)
    for key, n_gaps in hist.items():
        total = sum(v for (et, _), v in hist.items() if et == key[0])
        assert got[key]["n_gaps"] == n_gaps
        assert got[key]["share_r6"] == _r6(n_gaps, total)
        # power-of-two boundary sanity: bucket b covers [2^b, 2^(b+1))
        if key[1] >= 0:
            assert 2 ** key[1] <= 2 ** (key[1] + 1) - 1


def test_seasonal_index_matches_python_brute(spark):
    """Month-of-year indices equal plain dict accumulation with Class C
    cents — a flat normalization check (sum of month shares == 12)."""
    import math

    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import orders_seasonal_index

    con = duckdb.connect()
    rows = con.execute(
        "SELECT month(o_orderdate), o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    agg: dict = {}
    for m, tp in rows:
        n, c = agg.get(m, (0, 0))
        agg[m] = (n + 1, c + math.floor(tp * 100 + 0.5))
    tot_n = sum(v[0] for v in agg.values())
    tot_c = sum(v[1] for v in agg.values())
    out = orders_seasonal_index(spark, SF_DIR).collect()
    assert [r["month"] for r in out] == sorted(agg)
    for r in out:
        n, c = agg[r["month"]]
        assert (r["n_orders"], r["revenue_cents"]) == (n, c)
        assert r["count_index_r6"] == _r6(12 * n, tot_n)
        assert r["revenue_index_r6"] == _r6(12 * c, tot_c)
    # normalization identity: the 12 month shares sum to 12/12 = 1,
    # so the indices sum to 12 (up to 6dp rounding per month)
    assert abs(sum(r["count_index_r6"] for r in out) - 12.0) < 1e-4


def test_drift_tv_matches_python_brute(spark):
    """Per-month total variation vs the corpus priority mix equals the
    densified-grid integer formula in Python — including the |0 - C_p *
    n_m| term for month x priority cells with no orders (ADVICE r8)."""
    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import drift_priority_mix_tv

    con = duckdb.connect()
    rows = con.execute(
        "SELECT strftime(o_orderdate, '%Y-%m'), o_orderpriority FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    cell: dict = {}
    n_m: dict = {}
    c_p: dict = {}
    for ym, p in rows:
        cell[(ym, p)] = cell.get((ym, p), 0) + 1
        n_m[ym] = n_m.get(ym, 0) + 1
        c_p[p] = c_p.get(p, 0) + 1
    n_tot = len(rows)
    got = {r["month"]: r for r in
           drift_priority_mix_tv(spark, SF_DIR).collect()}
    assert set(got) == set(n_m)
    for ym in n_m:
        tv_num = sum(
            abs(cell.get((ym, p), 0) * n_tot - cp * n_m[ym])
            for p, cp in c_p.items()  # densified: EVERY priority class
        )
        r = got[ym]
        assert r["n_orders"] == n_m[ym]
        assert r["tv_r6"] == _r6(tv_num, 2 * n_m[ym] * n_tot)
        assert 0.0 <= r["tv_r6"] <= 1.0


def test_bootstrap_ci_matches_python_brute(spark):
    """The 4-lane md5 Poisson-bootstrap equals a full Python replay:
    same digests, same 28-bit lanes, same frozen thresholds, same
    replica means and order statistics — guards the lane offsets and
    the (rep_mean, rep) rank tiebreak."""
    import hashlib
    import math

    import duckdb

    from conftest import SF_DIR
    from spark_dba_spark.operators.temporal import (
        BOOT_B,
        BOOT_SALT,
        BOOT_THRESHOLDS,
        stats_bootstrap_ci,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT o_orderkey, o_totalprice FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchall()
    con.close()
    sums = {rep: [0, 0] for rep in range(BOOT_B)}  # rep -> [sum_w, sum_wc]
    for key, tp in rows:
        cents = math.floor(tp * 100 + 0.5)
        for g in range(BOOT_B // 4):
            m = hashlib.md5(f"{key}:{g}:{BOOT_SALT}".encode()).hexdigest()
            for lane in range(4):
                h = int(m[8 * lane: 8 * lane + 7], 16)
                w = sum(1 for t in BOOT_THRESHOLDS if h >= t)
                rep = g * 4 + lane
                sums[rep][0] += w
                sums[rep][1] += w * cents
    means = sorted(
        (_r6(wc, w), rep) for rep, (w, wc) in sums.items()
    )
    n = len(rows)
    total_cents = sum(math.floor(tp * 100 + 0.5) for _, tp in rows)
    r = stats_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert (r["n_orders"], r["b_replicas"]) == (n, BOOT_B)
    assert r["mean_cents_r6"] == _r6(total_cents, n)
    assert r["boot_p05_r6"] == means[4][0]
    assert r["boot_p50_r6"] == means[49][0]
    assert r["boot_p95_r6"] == means[94][0]
    # the band brackets the point estimate and is ordered
    assert means[4][0] <= means[49][0] <= means[94][0]
