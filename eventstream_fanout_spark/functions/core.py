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
  the last ulp differs.  Fix: cast to decimal first (exact,
  order-independent), sum, cast the final scalar back to double.  The
  double->decimal cast itself is deterministic: a binary double's exact
  decimal expansion is never a tie at the rounding digit, so rounding
  mode differences can't bite.

These mirror the reference's only numeric derivation,
``ROUND(duration_ms/1000.0/length_seconds, 2)`` (reference
pipeline/app.py:71-76), while staying oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf100-scale sums of prices (~1e13) at 10 decimal places.
_DEC = "DECIMAL(30,10)"


def round_half_up(col: Column, scale: int = 2) -> Column:
    """Half-up rounding from IEEE primitives; bit-identical to the SQL
    emitted by :func:`sql_round_half_up`."""
    factor = float(10**scale)
    return F.floor(col * F.lit(factor) + F.lit(0.5)) / F.lit(factor)


def sql_round_half_up(expr: str, scale: int = 2) -> str:
    factor = float(10**scale)
    return f"(FLOOR(({expr}) * {factor!r} + 0.5) / {factor!r})"


def dsum(col: Column, alias: str | None = None) -> Column:
    """Order-independent double sum: decimal-exact accumulate, one final
    cast back to double."""
    out = F.sum(col.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS {_DEC})) AS DOUBLE)"


def davg(col: Column, alias: str | None = None) -> Column:
    """Order-independent double mean: exact decimal sum / count, divided
    as doubles (single IEEE division, deterministic)."""
    out = F.sum(col.cast(_DEC)).cast("double") / F.count(col)
    return out.alias(alias) if alias else out


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST(({expr}) AS {_DEC})) AS DOUBLE) / COUNT({expr}))"
