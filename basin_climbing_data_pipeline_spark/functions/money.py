"""Money math column builders — cross-engine deterministic.

The reference keeps money as float dollars (cents/100 at ingest,
reference fetch_stripe_data.py:182; tax back-out x/1.0825,
pipeline_handler.py:87-89).  We keep DoubleType for oracle parity
(SURVEY.md §1.2) but with a strict rounding discipline, because Spark's
``round()`` (HALF_UP over the double's shortest decimal repr) and DuckDB's
``round()`` (binary-value based) disagree at half-cent ties:

- Per-row rounding is ``floor(x*100 + 0.5) / 100`` — pure IEEE double ops,
  bit-identical in any engine.
- Aggregation sums integer **cents** (BIGINT) — exact integer arithmetic,
  insensitive to partition/order, then divides by 100.0 once.

This is also the right thing at 100 TB: long-sum aggregation is cheaper than
decimal and immune to float summation-order drift across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TAX_RATE = 0.0825


def to_cents(col: Column) -> Column:
    """Deterministic round-to-cents as BIGINT: floor(x*100 + 0.5)."""
    return F.floor(col * 100.0 + 0.5).cast("long")


def to_cents_sql(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100.0 + 0.5) AS BIGINT)"


def money(col: Column) -> Column:
    """Round a raw double to exact cents (dollars double, e.g. 12.34)."""
    return to_cents(col) / 100.0


def money_sql(expr: str) -> str:
    return f"({to_cents_sql(expr)} / 100.0)"


def sum_money(col: Column) -> Column:
    """Exact order-insensitive money sum: sum of cents / 100."""
    return F.sum(to_cents(col)) / 100.0


def sum_money_sql(expr: str) -> str:
    return f"(sum({to_cents_sql(expr)}) / 100.0)"


def ratio(num: Column, den: Column, digits: int = 4) -> Column:
    """Deterministic fixed-point ratio: floor(n/d * 10^digits + 0.5)/10^digits."""
    scale = float(10**digits)
    return F.floor(num / den * scale + 0.5) / scale


def ratio_sql(num: str, den: str, digits: int = 4) -> str:
    scale = float(10**digits)
    return f"(floor(({num}) / ({den}) * {scale} + 0.5) / {scale})"


def cents_to_dollars(col: Column) -> Column:
    return col / 100.0


def backout_tax(total: Column) -> Column:
    """pre-tax = total / (1 + rate) (reference pipeline_handler.py:87-89)."""
    return money(total / (1.0 + TAX_RATE))
