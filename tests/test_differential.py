"""Differential harness: every registered query with an oracle must
match DuckDB at sf0.001 under the driver's comparison protocol
(column names + row count + order-insensitive values)."""

from __future__ import annotations

import pytest

from jsmr_spark.registry import all_specs
from tests.conftest import assert_query_matches, run_spark

_SPECS = all_specs()
_WITH_ORACLE = sorted(k for k, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY = sorted(k for k, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_oracle(spark, duck, name):
    assert_query_matches(spark, duck, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    cols, rows = run_spark(spark, name)
    assert cols, f"{name}: no columns"
    assert len(rows) >= 0
