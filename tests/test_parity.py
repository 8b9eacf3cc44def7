"""Driver-gate mirror: every SQL-oracled query must match DuckDB
(row count + schema + order-insensitive canonical values), and every
rows-only query must at least run with a stable schema.
"""

from __future__ import annotations

import pytest

from infofarmsparkml_spark import registry
from infofarmsparkml_spark.verify import check_query

ORACLED = sorted(registry.oracle_sql())
ROWS_ONLY = sorted(set(registry.queries()) - set(registry.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, sf_dir, name):
    ok, msg = check_query(spark, duck, name, sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, duck, sf_dir, name):
    fn, _ = registry.get(name)
    df = fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
