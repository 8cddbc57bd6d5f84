"""Text-shingling column expressions (JVM-side, codegen-friendly).

All helpers return Column expressions built from Spark higher-order array
functions — no Python UDFs — so they run inside the JVM at full scale and
have exact DuckDB-SQL equivalents for the oracle (see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(col: str = "text") -> Column:
    """Whitespace tokens. Fixture text is single-space separated; on real
    corpora swap the delimiter for a regex split."""
    return F.split(F.col(col), " ")


def word_ngrams(col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>.

    Built with sequence+transform+slice. Docs shorter than n words yield a
    single shingle of the full text (never an empty set — keeps Jaccard
    well-defined).

    The split result is bound ONCE to a lambda variable via the
    single-element-array transform trick: higher-order lambdas are
    interpreted with no common-subexpression elimination, so inlining
    ``split()`` at each of its three uses re-tokenized every document 3×
    (measured 1.43s → 0.42s for the shingle stage at sf0.1).
    """
    expr = (
        f"transform(array(split({col}, ' ')), ws -> "
        f"array_distinct(CASE WHEN size(ws) >= {n} "
        f"THEN transform(sequence(1, size(ws) - {n} + 1), "
        f"i -> concat_ws(' ', slice(ws, i, {n}))) "
        f"ELSE array({col}) END))[0]"
    )
    return F.expr(expr)


def char_shingles(col: str = "text", k: int = 16) -> Column:
    """Distinct character k-gram shingles as array<string>."""
    expr = (
        f"array_distinct(CASE WHEN length({col}) >= {k} "
        f"THEN transform(sequence(1, length({col}) - {k} + 1), "
        f"i -> substring({col}, i, {k})) "
        f"ELSE array({col}) END)"
    )
    return F.expr(expr)


def sql_word_ngrams(col: str = "text", n: int = 3) -> str:
    """DuckDB rendering of word_ngrams (1-indexed list slicing)."""
    ws = f"string_split({col}, ' ')"
    gram = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))
    return (
        f"(SELECT list(DISTINCT g) FROM ("
        f"SELECT CASE WHEN len({ws}) >= {n} THEN {gram} ELSE {col} END AS g "
        f"FROM (SELECT {ws} AS ws), "
        f"LATERAL unnest(generate_series(1, greatest(len(ws) - {n} + 1, 1))) AS t(i)"
        f"))"
    )
