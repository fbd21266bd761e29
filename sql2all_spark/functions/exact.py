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


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`davg`."""
    return f"{dsum_sql(expr, scale)} / COUNT({expr})"
