"""Local clone of the driver's correctness gate (SURVEY §5.1).

Every declared query with an oracle runs on Spark AND DuckDB at sf0.001
and must match on row count, schema, and order-insensitive values.
The driver does the same at sf0.01 — run with
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01`` to mirror it exactly.
"""

from __future__ import annotations

import pytest

from hello_flink_spark.oracle import compare, duck_connection
from hello_flink_spark.registry import all_specs

SPECS = all_specs()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, duck, name):
    spec = SPECS[name]
    result = compare(name, spec.fn(spark, sf_dir), spec.oracle, duck)
    assert result.ok, f"{name}: {result.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    """Rows-only ops must at least execute and return a stable schema."""
    df = SPECS[name].fn(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    df.collect()  # must not raise
