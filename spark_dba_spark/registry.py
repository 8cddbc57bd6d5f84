"""Central query registry.

Every operator the engine implements registers a :class:`QuerySpec` here —
one named query (builder over (spark, sf_dir)) plus, when SQL-expressible,
the DuckDB oracle SQL the driver uses as the correctness gate
(CORRECTNESS_r{N}.json). ``__spark_entry__.py``, ``bench.py`` and the pytest
parity suite all consume this registry, so there is exactly one source of
truth for "what the engine can do" (SURVEY.md §2 inventory).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None = None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # part of the headline bench set (bench.py)
    doc: str = ""


def _collect() -> dict[str, QuerySpec]:
    # Imported lazily so a bug in one operator family can't break the rest
    # of the registry at import time — but surface loudly, not silently.
    import importlib

    specs: dict[str, QuerySpec] = {}
    errors: list[str] = []
    for mod_name in (
        "spark_dba_spark.operators.relational",
        "spark_dba_spark.operators.dedup",
        "spark_dba_spark.operators.similarity",
        "spark_dba_spark.operators.text",
        "spark_dba_spark.operators.multimodal",
        "spark_dba_spark.streaming.batch_equiv",
    ):
        try:
            mod = importlib.import_module(mod_name)
        except Exception as exc:  # pragma: no cover - import-time guard
            errors.append(f"{mod_name}: {exc!r}")
            continue
        for spec in getattr(mod, "SPECS", ()):
            if spec.name in specs:
                raise ValueError(f"duplicate query name: {spec.name}")
            specs[spec.name] = spec
    if errors:
        import sys

        print(f"[spark_dba_spark.registry] module errors: {errors}", file=sys.stderr)
    return specs


_CACHE: dict[str, QuerySpec] | None = None


def all_specs(refresh: bool = False) -> dict[str, QuerySpec]:
    global _CACHE
    if _CACHE is None or refresh:
        _CACHE = _collect()
    return _CACHE


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }


def bench_specs() -> dict[str, QuerySpec]:
    return {name: s for name, s in all_specs().items() if s.bench}
