"""Engine-portable hashing for dedup/fingerprint operators.

Constraint: the DuckDB oracle must reproduce every hash bit-for-bit, so we
cannot use Spark's xxhash64/hash (no DuckDB twin). Everything derives from
MD5 — identical in both engines — parsed from hex into integers:

  Spark : cast(conv(substring(md5(s), a, n), 16, 10) as bigint)
  DuckDB: CAST('0x' || substr(md5(s), a, n) AS BIGINT)

MinHash permutations use the Kirsch-Mitzenmacher construction
(perm_i = (h1 + i*h2) mod p): one MD5 per shingle yields two independent
32-bit streams that parameterize any number of permutations — O(1) hashing
per shingle instead of O(num_perm) (Kirsch & Mitzenmacher, "Less Hashing,
Same Performance", 2006).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: perm values fit comfortably in a BIGINT even
# after h1 + i*h2 (< 2^39 for i <= 128).
MERSENNE31 = 2_147_483_647


def md5_long(col_expr: str, start: int = 1, nhex: int = 15) -> Column:
    """First `nhex` hex digits of md5 as a non-negative bigint (< 2^60)."""
    return F.expr(sql_md5_long_spark(col_expr, start, nhex))


def sql_md5_long_spark(col_expr: str, start: int = 1, nhex: int = 15) -> str:
    return f"cast(conv(substring(md5({col_expr}), {start}, {nhex}), 16, 10) as bigint)"


def sql_md5_long_duck(col_expr: str, start: int = 1, nhex: int = 15) -> str:
    return f"CAST('0x' || substr(md5({col_expr}), {start}, {nhex}) AS BIGINT)"


def minhash_signature(shingles_col: str, num_perm: int) -> Column:
    """MinHash signature (array<bigint>, length num_perm) over an
    array<string> shingle column. Pure JVM higher-order expressions.

    Stage 1 hashes each shingle once (two 28-bit lanes from one MD5);
    stage 2 derives all permutations arithmetically.
    """
    hp = (
        f"transform({shingles_col}, x -> array("
        f"cast(conv(substring(md5(x), 1, 7), 16, 10) as bigint), "
        f"1 + cast(conv(substring(md5(x), 9, 7), 16, 10) as bigint)))"
    )
    return F.expr(
        f"transform(sequence(0, {num_perm - 1}), s -> "
        f"array_min(transform({hp}, h -> (h[0] + s * h[1]) % {MERSENNE31})))"
    )


def sql_minhash_signature_duck(shingles_col: str, num_perm: int) -> str:
    """DuckDB rendering of minhash_signature (1-indexed lists)."""
    hp = (
        f"list_transform({shingles_col}, x -> ["
        f"CAST('0x' || substr(md5(x), 1, 7) AS BIGINT), "
        f"1 + CAST('0x' || substr(md5(x), 9, 7) AS BIGINT)])"
    )
    return (
        f"list_transform(range(0, {num_perm}), s -> "
        f"list_min(list_transform({hp}, h -> (h[1] + s * h[2]) % {MERSENNE31})))"
    )
