"""Deterministic cross-engine aggregates.

Floating-point SUM/AVG are order-dependent: Spark's partial aggregation over
32 shuffle partitions and DuckDB's single-threaded scan accumulate in
different orders, so ``SUM(double)`` can differ in the last ulp and break the
driver's value-hash comparison.  Fix: route the sum through a DECIMAL cast —
decimal addition is exact and associative, so any accumulation order yields
the same value — then cast the final result back to DOUBLE.  Both engines
round the same exact decimal to the same double.

The reference, notably, maps NUMERIC/NEWDECIMAL → Float64 *lossily*
(``src/db/conversion.rs:18,39``); we do the opposite and use decimals to make
doubles exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits is the max for both Spark and DuckDB decimals; sums of
# billions of row-level decimal(18,s) values stay in range at 100 TB scale.


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, double division."""
    return dsum(col, scale) / F.count(col)


def _floor_div(x: str, div_op: str, divisor: int) -> str:
    return (
        f"(({x}) {div_op} {divisor}) - (CASE WHEN ({x}) % {divisor} < 0 "
        f"THEN 1 ELSE 0 END)"
    )


def floor_div_sql(expr: str, divisor: int) -> str:
    """Spark SQL text for FLOOR division of an integer expression.

    ADVICE r9 flagged ``unix_micros(ts) div DAY_US`` vs the oracle's
    ``epoch_us(ts) // DAY_US`` as a trunc-vs-floor divergence.  Measured
    reality (pinned in ``test_floor_div_sql_matches_duckdb_floor_semantics``):
    BOTH engines truncate toward zero on integers — DuckDB's integer
    ``//`` is NOT Python's floor division — so the pair agreed but was
    semantically wrong for pre-1970 timestamps (1 µs before the epoch
    bucketed into day 0, not day -1).  Fix: explicit floor arithmetic on
    BOTH sides — subtract 1 from the truncated quotient when a negative
    remainder exists (both engines give ``%`` the dividend's sign).
    Positive literal divisors only.

    Use this (not ``floor(x / d)``) to bucket epoch values: the
    double-division form can mis-floor at exact bucket boundaries once
    ``x`` exceeds 2^53 / d in magnitude.
    """
    if divisor <= 0:
        raise ValueError("floor_div_sql requires a positive divisor")
    return _floor_div(expr, "div", divisor)


def floor_div_duck_sql(expr: str, divisor: int) -> str:
    """DuckDB twin of :func:`floor_div_sql` (``//`` truncates there too)."""
    if divisor <= 0:
        raise ValueError("floor_div_duck_sql requires a positive divisor")
    return _floor_div(expr, "//", divisor)


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{dsum_sql(expr, scale)} / COUNT({expr})"
