"""Local replica of the driver's correctness gate: every registered query
with an oracle must match DuckDB at sf0.001 (fast) — the driver runs the
same comparison at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import duckdb_connection, compare

from dend_spark_data_lake_spark.queries import REGISTRY

ORACLE_NAMES = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable schema
