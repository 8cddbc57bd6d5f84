"""Skew-mitigation helpers: salted two-stage aggregation and salted joins.

AQE's skew-join splitting (on in the session invariants) handles most skew
at runtime, but two cases still need explicit salting at 100 TB:

1. **Skewed aggregation keys** — a single hot group key funnels into one
   reducer. ``salted_agg`` splits each group into ``n_salts`` sub-groups
   (map-side random-ish salt from a hash of a stable column), aggregates
   partially per sub-group, then re-aggregates the tiny salted result —
   turning one hot reducer into ``n_salts`` even ones. Works for any
   algebraic aggregate (sum/count/min/max; avg via sum+count).
2. **Skewed join keys** — ``salted_join`` salts the big (probe) side and
   explodes the small (build) side ``n_salts``× so every salted probe row
   still meets its build row. Build-side amplification is the price; use
   only for the skewed-key subset at real scale (split-and-union).

Both transformations are pure plan rewrites — results are provably equal
to the unsalted form (pytest asserts bit-equality against the direct
plan), so they compose with the oracle-checked operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(
    df: DataFrame, salt_from: str | None, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Salt column that splits hot keys: derived from a HIGH-CARDINALITY
    stable column (``salt_from`` — must not be the group/join key itself,
    or every row of a hot key lands in one salt and nothing splits).
    Deterministic (hash, no RNG) so retries produce identical rows. With
    ``salt_from=None`` falls back to a row-position salt — fine for joins
    (any salt assignment is correct; the build side covers all salts)."""
    if salt_from is None:
        src = F.monotonically_increasing_id()
    else:
        src = F.xxhash64(F.col(salt_from))
    return df.withColumn("_salt", F.pmod(src, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_from: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name → (combine_fn_name, partial_agg_column), e.g.
    ``{"n": ("sum", F.count("*")), "mx": ("max", F.max("x"))}``: the partial
    column aggregates within (group, salt); the combine fn re-aggregates
    across salts. Output: one row per group, exactly as a direct groupBy.
    """
    partial = (
        with_salt(df, salt_from, n_salts)
        .groupBy(*group_cols, "_salt")
        .agg(*[c.alias(f"_p_{name}") for name, (_fn, c) in aggs.items()])
    )
    combined = partial.groupBy(*group_cols).agg(
        *[
            getattr(F, fn)(F.col(f"_p_{name}")).alias(name)
            for name, (fn, _c) in aggs.items()
        ]
    )
    return combined


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    salt_from: str | None = None,
) -> DataFrame:
    """Inner/left join where ``big``'s key distribution is skewed: salt the
    big side row-wise, replicate the small side across all salts, join on
    (key, salt). Equivalent row multiset to ``big.join(small, on, how)``.

    Only inner/left are valid: right/full would surface one row per salt
    replica for unmatched build keys — rejected up front."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(right/full would duplicate unmatched build rows per salt)"
        )
    big_s = with_salt(big, salt_from, n_salts)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")
