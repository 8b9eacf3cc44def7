"""Operator registry — the single source of truth for the driver
contract (``__spark_entry__.py``).

Every operator from SURVEY.md §2 registers itself here with a
``@query("name", oracle=...)`` decorator: the callable takes
``(spark, sf_dir)`` and returns a DataFrame; ``oracle`` is the
equivalent ANSI SQL that DuckDB runs over the same parquet views
(row-count + schema + order-insensitive value-hash). Ops that are
not SQL-expressible (approx sketches, seeded ML, streaming state)
register with ``oracle=None`` → the driver records a rows-only
check and our own pytest fixtures carry correctness instead.

Contract rules enforced by convention here (SURVEY.md §7 risks):
- alias every computed column identically in Spark and SQL;
- round double aggregates on BOTH sides (float summation order
  differs between engines);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT);
- cast events.ts (ns parquet) to µs in the oracle to match Spark.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally attach oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        fn.query_name = name  # type: ignore[attr-defined]
        return fn

    return deco


def _load_all_operator_modules() -> None:
    """Import every operator module so decorators run (idempotent)."""
    # Imported lazily to avoid import cycles with operator modules
    # that import `query` from here.
    import infofarmsparkml_spark.functions  # noqa: F401
    import infofarmsparkml_spark.operators  # noqa: F401
    import infofarmsparkml_spark.streaming  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all_operator_modules()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all_operator_modules()
    return dict(_ORACLES)


def get(name: str) -> tuple[QueryFn, str | None]:
    _load_all_operator_modules()
    return _QUERIES[name], _ORACLES.get(name)


def describe() -> dict[str, Any]:
    """Coverage summary: total queries, how many SQL-oracled."""
    _load_all_operator_modules()
    return {
        "n_queries": len(_QUERIES),
        "n_sql_oracled": len(_ORACLES),
        "rows_only": sorted(set(_QUERIES) - set(_ORACLES)),
    }
