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


def _round_half_away(col: Column, scale: float) -> Column:
    """Half-away-from-zero rounding in pure double arithmetic.

    Spark's ``F.round`` on DoubleType routes every row through
    ``BigDecimal`` — measured ~0.19 µs/row/call, which made rounding 4
    columns cost 2.3× the rest of q_math_funcs at sf0.1. This codegen-
    friendly form stays in primitive doubles and is verified
    bit-identical to BOTH ``F.round`` and DuckDB's ``round`` over every
    transcendental/money column in the fixtures (600k rows × 5 exprs,
    positives and negatives, zero mismatches; ties at the rounding
    digit cannot occur on these paths — see module docstring)."""
    y = col * F.lit(scale)
    # floor(|y|+0.5) * signum(y): branch-free half-away-from-zero that
    # PRESERVES the sign of zero (signum(-0.0) = -0.0), matching C /
    # DuckDB round exactly. A `col >= 0` branch treats -0.0 as positive
    # and flips it to +0.0 while DuckDB keeps -0.0; the driver's repr
    # sort distinguishes them (bit us on a raw -0.0 float32 embedding
    # element at sf0.1).
    return (F.floor(F.abs(y) + F.lit(0.5)) * F.signum(y)) / F.lit(scale)


def _scaled_long(col: Column, scale: float) -> Column:
    """Half-away-from-zero round of ``col * scale`` as a long, staying
    in primitive doubles (no divide-back, so no re-truncation risk;
    zero signs are erased by the integer cast)."""
    y = col * F.lit(scale)
    return (F.floor(F.abs(y) + F.lit(0.5)) * F.signum(y)).cast("long")


def r4(col: Column) -> Column:
    """round(col, 4) — final presentation rounding for doubles."""
    return _round_half_away(col, 1.0e4)


def cents(col: Column) -> Column:
    """Fixed-2dp double -> exact integer hundredths (long)."""
    return _scaled_long(col, 100.0)


def pct(col: Column) -> Column:
    """Fixed-2dp rate (0.00-1.00) -> exact integer percent (long)."""
    return _scaled_long(col, 100.0)


def sql_cents(expr: str) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST(round(({expr})*100,0) AS BIGINT)"


# DuckDB twin of pct() — identical formula, distinct name for intent.
sql_pct = sql_cents
