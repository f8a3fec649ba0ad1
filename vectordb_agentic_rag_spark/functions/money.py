"""Exact money arithmetic as cheap integer-cents column expressions.

Fixture money columns (l_extendedprice, o_totalprice, l_discount) are
2-decimal values stored as double, so `x*100` is integral up to float
noise.  Summing in integer cents makes the aggregate exact — the result
is order-independent under any partitioning (critical at 100 TB where
partial-agg order is nondeterministic) and hash-matches the DuckDB
oracle bit-for-bit.

Implementation note: Spark's ``round()`` on DoubleType routes through
BigDecimal.setScale per row; for non-negative money values
``cast(x*100 + 0.5 as bigint)`` (floor of x*100+0.5) computes the same
half-up rounding ~40% faster at sf0.1 (387 vs 626 ms on the Q1-style
aggregate) because it stays in primitive long arithmetic inside
whole-stage codegen.  Only valid for non-negative inputs — all fixture
money columns are.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Non-negative 2-decimal double -> exact integer cents (bigint)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c * 100 + 0.5).cast("bigint")


def cents_to_dollars(sum_cents: Column, scale: int = 2) -> Column:
    """Integer-cent sum back to a rounded dollar double."""
    return F.round(sum_cents.cast("double") / 100, scale)
