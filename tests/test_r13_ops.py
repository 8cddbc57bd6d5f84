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
