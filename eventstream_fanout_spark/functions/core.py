"""Cross-engine-deterministic numeric helpers.

The driver's correctness gate hash-compares Spark results against DuckDB
results, so every floating-point computation must be bit-identical in
both engines.  Two engine-native traps and their fixes:

* ``round(double, n)`` — Spark rounds via BigDecimal-of-shortest-repr
  (HALF_UP), DuckDB via scaled floor; they disagree on values like
  2.675.  Fix: roll our own ``floor(x * 10^n + 0.5) / 10^n`` from IEEE
  primitives, written *identically* in both engines.  (Also normalizes
  -0.0 to +0.0, which the engines print/hash differently.)

* ``SUM(double)`` — summation order differs per engine/partitioning, so
  the last ulp differs.  Worse, ``CAST(double AS DECIMAL)`` itself
  diverges: DuckDB scales by a double multiply (inexact), Spark goes
  through the shortest string repr.  Fix: quantize each value to
  integer micro-units with pure IEEE ops (``floor(x*1e6 + 0.5)`` —
  identical in both engines), sum those integers exactly as
  DECIMAL(38,0) (order-independent, no overflow even at 100 TB row
  counts), and divide back to double once at the end.

  One more trap inside the fix: when the exact integer sum exceeds
  2^53, ``CAST(decimal AS DOUBLE)`` itself diverges — Spark rounds the
  BigDecimal correctly once, DuckDB converts its HUGEINT through two
  64-bit halves (double-rounding, off by one ulp; found by the
  hypothesis property test at |sum| ~ 5.8e17 micro-units).  Fix: cast
  the decimal sum to a STRING first — decimal->string is exact digits
  in both engines, string->double is correctly rounded in both — then
  one shared IEEE division.  Exact at every magnitude.

These mirror the reference's only numeric derivation,
``ROUND(duration_ms/1000.0/length_seconds, 2)`` (reference
pipeline/app.py:71-76), while staying oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Quantization unit for deterministic double sums: 1e-6 of the input
# unit — far below any analytic significance, far above double noise.
# Domain: |x| < ~9e12 (x*_Q must stay inside the exact long range of
# floor(double)); property-tested to 1e12 in tests/.
_Q = 1_000_000.0


def round_half_up(col: Column, scale: int = 2) -> Column:
    """Half-up rounding from IEEE primitives; bit-identical to the SQL
    emitted by :func:`sql_round_half_up`.

    Negative inputs round toward +infinity (floor(x*f + 0.5) pulls
    -2.675 to -2.67), which DIFFERS from Java/Spark HALF_UP (away from
    zero, -2.68).  This is deliberate: the identical formula runs on
    both engines, so oracle parity holds for every sign; use
    ``floor(abs(x)*f + 0.5)*sign(x)/f`` on BOTH sides instead if
    away-from-zero fidelity ever matters more than formula symmetry."""
    factor = float(10**scale)
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def sql_round_half_up(expr: str, scale: int = 2) -> str:
    factor = float(10**scale)
    return f"(FLOOR(({expr}) * {factor!r} + 0.5) / {factor!r})"


def _quantized(col: Column) -> Column:
    return F.floor(col * F.lit(_Q) + F.lit(0.5)).cast("decimal(38,0)")


def dsum(col: Column, alias: str | None = None) -> Column:
    """Order-independent, cross-engine-exact double sum (micro-unit
    quantized; decimal->string->double keeps the final cast correctly
    rounded at any magnitude — see module docstring)."""
    out = (
        F.sum(_quantized(col)).cast("string").cast("double") / F.lit(_Q)
    )
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    return (
        f"(CAST(CAST(SUM(CAST(FLOOR(({expr}) * {_Q!r} + 0.5) "
        f"AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) / {_Q!r})"
    )


def davg(col: Column, alias: str | None = None) -> Column:
    """Order-independent, cross-engine-exact double mean: quantized sum,
    then two IEEE divisions written identically in SQL."""
    out = (
        F.sum(_quantized(col)).cast("string").cast("double") / F.lit(_Q)
    ) / F.count(col)
    return out.alias(alias) if alias else out


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"
