"""Oracle type-portability regression tests (VERDICT r4/r5 item #1/#2).

Root cause of the 4 standing driver hash failures in rounds 4-5: DuckDB
widens integer ``sum()`` to HUGEINT (INT128) while Spark returns BIGINT,
and the driver's value-hash serializes the two differently even though
every value compares equal as a Python int. 39 registered oracles
carried the defect; all are now ``CAST(... AS BIGINT)``.

These tests keep the class extinct:
  * every registered oracle's DuckDB result schema must map cleanly
    through the conftest portability map (no HUGEINT/unsigned anywhere,
    including inside list types);
  * the harness itself must detect an injected bare ``sum(v)`` — i.e.
    the check would have caught the original bug pre-fix.
"""

from __future__ import annotations

import pytest

from jsmr_spark.registry import all_specs

from conftest import duck_to_spark_type


def _oracle_items():
    return [(k, s.oracle) for k, s in all_specs().items() if s.oracle is not None]


def test_no_registered_oracle_has_nonportable_type(duck):
    """Sweep EVERY oracle (aliases included) through DuckDB's binder and
    assert every result column type has a faithful Spark counterpart."""
    offenders = []
    for key, sql in _oracle_items():
        rel = duck.sql(sql)
        for col, d_type in zip(rel.columns, rel.types):
            if duck_to_spark_type(str(d_type)) is None:
                offenders.append((key, col, str(d_type)))
    assert not offenders, (
        f"{len(offenders)} non-portable oracle columns (driver hash WILL "
        f"fail on these): {offenders}"
    )


def test_harness_catches_injected_hugeint(duck):
    """Self-test: a bare integer sum() — the exact shape of the original
    bug — must be flagged as non-portable by the map the sweep uses."""
    rel = duck.sql("SELECT o_orderstatus, sum(o_orderkey) AS s FROM orders GROUP BY 1")
    types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    assert types["s"] == "HUGEINT", "fixture assumption: DuckDB widens sum(BIGINT)"
    assert duck_to_spark_type(types["s"]) is None
    # and the fixed form passes
    rel2 = duck.sql(
        "SELECT o_orderstatus, CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders GROUP BY 1"
    )
    types2 = {c: str(t) for c, t in zip(rel2.columns, rel2.types)}
    assert duck_to_spark_type(types2["s"]) == "bigint"


@pytest.mark.parametrize(
    "duck_type,expected",
    [
        ("BIGINT", "bigint"),
        ("HUGEINT", None),
        ("UBIGINT", None),
        ("UINTEGER", None),
        ("DECIMAL(18,2)", "decimal(18,2)"),
        ("BIGINT[]", "array<bigint>"),
        ("HUGEINT[]", None),
        ("UUID", None),
    ],
)
def test_portability_map(duck_type, expected):
    assert duck_to_spark_type(duck_type) == expected
