"""Oracle-compatibility helpers (SURVEY.md §7.1).

The driver hash-compares Spark results against DuckDB, so every
cross-engine nondeterminism needs a recipe:

* **Order-dependent float sums.** ``sum(double)`` accumulates in
  whatever partition order the engine picks; at 60k rows the rounding
  drift can exceed the round(,4) granularity. The fixture money/rate
  columns are fixed-decimal (verified: prices/discounts/taxes are exact
  2dp), so we sum *scaled integers* — exact, order-independent, and
  bit-identical across engines — then divide once at the end.
  ``cents()``/``SQL_CENTS`` implement this on both sides.
* **round() ties.** Spark rounds half-up, DuckDB half-even; scaling by
  100 lands within ~1e-9 of an integer so ties never occur on this path.
* **Final presentation.** Double-valued outputs still get round(,4) on
  both sides so any residual last-ulp drift (e.g. from a single final
  division) cannot flip the hash.

At 100 TB the cents-sum also *helps* performance: long sums use the
fixed-width hash-agg fast path and never spill wider than 8 bytes/cell.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r4(col: Column) -> Column:
    """round(col, 4) — final presentation rounding for doubles."""
    return F.round(col, 4)


def cents(col: Column) -> Column:
    """Fixed-2dp double -> exact integer hundredths (long)."""
    return F.round(col * F.lit(100), 0).cast("long")


def pct(col: Column) -> Column:
    """Fixed-2dp rate (0.00-1.00) -> exact integer percent (long)."""
    return F.round(col * F.lit(100), 0).cast("long")


def sql_cents(expr: str) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST(round(({expr})*100,0) AS BIGINT)"


# DuckDB twin of pct() — identical formula, distinct name for intent.
sql_pct = sql_cents
