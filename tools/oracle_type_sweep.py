"""Sweep every registered oracle through DuckDB and report result column types.

The driver hashes DuckDB results with their native types; DuckDB widens
integer sum() to HUGEINT (INT128) while Spark returns BIGINT, so any
oracle whose result carries a HUGEINT column WILL hash-mismatch at the
driver even when values are identical (VERDICT r4/r5 root cause).

Usage: python tools/oracle_type_sweep.py [sf_dir]
Prints one line per oracle that carries a non-portable column type, then
a summary. Exit code 1 if any found.
"""
from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from jsmr_spark.registry import all_specs  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Types the driver's value-hasher serializes identically to Spark's output.
PORTABLE = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "VARCHAR",
    "BOOLEAN", "DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "BLOB",
}


def is_portable(t: str) -> bool:
    t = t.upper()
    if t in PORTABLE:
        return True
    # Parameterized / nested types: DECIMAL(p,s), VARCHAR(n), LIST, STRUCT, MAP
    if t.startswith("DECIMAL"):
        return True
    for inner in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        if inner in t:
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad: list[tuple[str, list[tuple[str, str]]]] = []
    checked = 0
    for key, spec in all_specs().items():
        if spec.oracle is None:
            continue
        checked += 1
        try:
            rel = con.sql(spec.oracle)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {key}: {e}")
            bad.append((key, [("<error>", str(e))]))
            continue
        flagged = [(c, t) for c, t in cols if not is_portable(t)]
        if flagged:
            bad.append((key, flagged))
            print(f"NONPORTABLE {key}: {flagged}")
    print(f"\nchecked={checked} nonportable={len(bad)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
