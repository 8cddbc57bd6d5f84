"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent, and Spark (parallel partial
aggregation) will not reproduce DuckDB's (single-stream) rounding error —
the oracle hash would flake. The fix is algebraic, not a tolerance: cast each
input to a DECIMAL before summing. Decimal addition is exact and associative,
so any partitioning/ordering produces bit-identical totals in both engines;
the final cast back to DOUBLE is a single deterministic rounding.

The SQL oracle mirrors the same shape:
    CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)
    CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(x)   -- avg

DECIMAL(25,6) holds |x| < 10^19 at 6 fractional digits — far beyond any
fixture magnitude, and the *sum* is carried at the engine's max decimal
precision (38) so overflow is not a concern until ~10^32.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Exact, order-independent SUM of a double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dsum_expr(sql_expr: str, alias: str) -> Column:
    """Same as dsum but over a SQL expression string (computed per-row in
    IEEE double — bit-deterministic — then cast to decimal before the sum)."""
    return F.sum(F.expr(sql_expr).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str) -> str:
    """Oracle-side rendering of dsum for an arbitrary SQL expression."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"
