"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`infofarmsparkml_spark.registry` — every
operator from SURVEY.md §2 registers a ``queries()`` callable and
(where SQL-expressible) an ``oracle_sql()`` DuckDB twin there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from infofarmsparkml_spark import registry as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-shape pricing summary on lineitem
    (scan → pushed-down filter → 8 aggregates over 2 group keys)."""
    from infofarmsparkml_spark.operators.aggregates import agg_groupby

    return agg_groupby(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
