"""Differential harness: every registered query with an oracle must
match DuckDB at sf0.001 under the driver's comparison protocol
(column names + row count + order-insensitive values)."""

from __future__ import annotations

import pytest

from jsmr_spark.registry import all_specs
from tests.conftest import assert_query_matches, run_spark

_SPECS = all_specs()
# Aliases share the exact fn object + oracle string with their canonical
# key (asserted below), so re-running them through DuckDB would verify
# the same computation twice; the parametrized sweeps cover canonical
# keys only.
_CANONICAL = {k: s for k, s in _SPECS.items() if s.alias_of is None}
_WITH_ORACLE = sorted(k for k, s in _CANONICAL.items() if s.oracle is not None)
_ROWS_ONLY = sorted(k for k, s in _CANONICAL.items() if s.oracle is None)
_ALIASES = sorted(k for k, s in _SPECS.items() if s.alias_of is not None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_oracle(spark, duck, name):
    assert_query_matches(spark, duck, name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, name):
    cols, rows = run_spark(spark, name)
    assert cols, f"{name}: no columns"
    assert len(rows) >= 0


@pytest.mark.parametrize("name", _ALIASES)
def test_alias_identity(name):
    """A driver PASS on an alias is a PASS on the canonical key iff the
    alias routes the driver at literally the same fn + oracle — assert
    object identity, not equality."""
    spec = _SPECS[name]
    canonical = _SPECS[spec.alias_of]
    assert spec.fn is canonical.fn
    assert spec.oracle is canonical.oracle
