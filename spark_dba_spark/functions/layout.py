"""Z-order (Morton) data layout — multi-column clustering for scan pruning.

A single-column sort gives parquet/ORC row groups tight min/max ranges on
ONE column; scans filtering on any other column still read everything.
Interleaving the bits of several columns into one sort key gives every
row group a tight range on EVERY participating column simultaneously, so
columnar min/max statistics prune scans on any of them — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, built here from plain JVM
expressions (no shuffle: the key feeds ``sortWithinPartitions``).

All pure Column arithmetic — quantization and bit-interleave run inside
WholeStageCodegen; the only action is one bounded min/max agg (a single
driver row, any scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def interleave_bits(quantized: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton-interleave ``bits``-wide non-negative integer columns into one
    BIGINT key: output bit (i*n + c) = bit i of column c. Unrolled into a
    static OR-chain (bits × n terms) that codegen compiles to straight-line
    long arithmetic."""
    n = len(quantized)
    if not 1 <= n <= 4:
        raise ValueError("interleave 1-4 columns")
    if bits * n > 62:
        raise ValueError(f"{bits} bits × {n} cols exceeds a signed long")
    key = F.lit(0).cast("long")
    for c, q in enumerate(quantized):
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + c
                ).cast("long")
            )
    return key


def quantize_minmax(
    col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS
) -> Column:
    """Map a numeric/timestamp column into [0, 2^bits) by min-max rank,
    clamped at the edges (values at hi land in the top bucket)."""
    span = float(hi) - float(lo)
    levels = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(levels)
    )
    return F.least(
        F.greatest(F.floor(scaled), F.lit(0)), F.lit(levels)
    ).cast("long")


def _effective_bits(n_cols: int, bits: int | None) -> int:
    """Per-column bit width: the default scales down so n × bits always
    fits a signed long (16/16/16 for ≤3 cols, 15 for 4). An explicit
    ``bits`` is validated by interleave_bits instead."""
    return min(DEFAULT_BITS, 62 // n_cols) if bits is None else bits


def zorder_key(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> Column:
    """Z-order sort key over ``cols``: one min/max agg (single driver row),
    then pure-expression quantize + interleave.

    Degenerate columns (all NULL, non-numeric casts, or a 0-row frame
    yield None stats; constant columns yield lo == hi) quantize to a
    constant 0 bucket — they contribute no ordering but never fail the
    job."""
    bits = _effective_bits(len(cols), bits)
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"hi_{c}"))
    stats = df.agg(*aggs).first()
    quantized = []
    for c in cols:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        if lo is None or hi is None or lo != lo or hi != hi:  # None/NaN
            quantized.append(F.lit(0).cast("long"))
        else:
            quantized.append(quantize_minmax(F.col(c), lo, hi, bits))
    return interleave_bits(quantized, bits)


def zorder_sort_within_partitions(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> DataFrame:
    """Cluster rows inside each partition by the Z-key — a narrow,
    shuffle-free per-partition sort (exactly like ``sort_by`` layout
    clustering, but locality-preserving on every column at once)."""
    return df.sortWithinPartitions(zorder_key(df, cols, bits))
