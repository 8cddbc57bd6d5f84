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


def rat_round6_spark(num: str, den: str, dp: int = 6) -> str:
    """Exact rational half-up at 6dp of num/den as a Spark SQL fragment.

    For INTEGER-typed num ≥ 0, den > 0: ``(2·num·10⁶ + den) div (2·den)``
    is the true ⌊num/den·10⁶ + ½⌋ — no float appears until the final
    small-integer /10⁶. Use instead of ``round(num/den, 6)`` on count
    ratios: a quotient whose reduced denominator is 2^a·5^b terminates
    in decimal and can land EXACTLY on the 7th-digit-5 tie, where
    Spark's shortest-repr double round and DuckDB's ×10⁶ round split
    one micro-unit apart (TIES.md Class B′; bit at sf0.1)."""
    scale = 10 ** dp
    return (
        f"cast((({num}) * {2 * scale} + ({den})) div (2 * ({den}))"
        f" as double) / {float(scale)!r}"
    )


def rat_round6_duck(num: str, den: str, dp: int = 6) -> str:
    """DuckDB twin of :func:`rat_round6_spark` (integer ``//`` — for the
    non-negative domain truncation == floor == the same half-up).

    The committed oracle strings carry FROZEN expansions of this
    fragment (generated through it at edit time); the half-up formula
    is mathematically final, but if it ever changes, regenerate every
    inlined site (`grep -rn '2000000 +' spark_dba_spark`)."""
    scale = 10 ** dp
    return (
        f"CAST((({num}) * {2 * scale} + ({den})) // (2 * ({den}))"
        f" AS DOUBLE) / {float(scale)!r}"
    )


def qrem_round6_spark(num: str, den: str) -> str:
    """Half-up 6dp of num/den for non-negative BIGINT num whose
    ``num * 2e6`` would overflow (the rat_round6 precondition): split at
    the quotient — micro = (num div den)·10⁶ + ((num % den)·2·10⁶ + den)
    div (2·den). The remainder is < den, so the scaled term stays far
    below 2^63 for any den ≤ ~4.6e12 (TIES.md Class D; the
    kruskal-wallis construct, shared)."""
    return (
        f"(cast((({num}) div ({den})) * 1000000"
        f" + ((({num}) % ({den})) * 2000000 + ({den})) div (2 * ({den}))"
        f" as double) / 1000000.0)"
    )


def qrem_round6_duck(num: str, den: str) -> str:
    """DuckDB twin of :func:`qrem_round6_spark` (``//`` == ``div`` and
    ``%`` agree on the non-negative domain)."""
    return (
        f"(CAST((({num}) // ({den})) * 1000000"
        f" + ((({num}) % ({den})) * 2000000 + ({den})) // (2 * ({den}))"
        f" AS DOUBLE) / 1000000.0)"
    )


def rat_round6_signed_spark(num: str, den: str, dp: int = 6) -> str:
    """Half-AWAY-FROM-ZERO for integer num of EITHER sign (den > 0) —
    matches java.math HALF_UP on negatives."""
    p = rat_round6_spark(f"abs({num})", den, dp)
    return f"(case when ({num}) >= 0 then {p} else -({p}) end)"


def rat_round6_signed_duck(num: str, den: str, dp: int = 6) -> str:
    p = rat_round6_duck(f"abs({num})", den, dp)
    return f"(CASE WHEN ({num}) >= 0 THEN {p} ELSE -({p}) END)"
