"""Cross-engine deterministic numeric helpers.

The driver compares Spark results against a DuckDB oracle by value hash,
so float aggregates must be *bit-identical* across engines. Summing
doubles is order-dependent (different partitioning → different fp error),
and Spark's ROUND uses decimal-string semantics while DuckDB rounds the
scaled binary value — so ``round(sum(double))`` can diverge at half-way
boundaries.

Strategy (used by every money/rate aggregate in this package):
  * The synthetic money/rate columns are exact 2-decimal values, so
    casting to DECIMAL at the scan is lossless and unambiguous.
  * All arithmetic stays in DECIMAL (exact, associative, order-free);
    precisions are chosen so neither engine loses precision
    (Spark p1+p2+1 ≤ 38 for products; DuckDB w1+w2 ≤ 38).
  * Round once at the end (both engines round decimals half-away-from-
    zero) and cast to DOUBLE for a portable output schema.
  * Averages: exact decimal sum → double → divide by count → round;
    quotient doubles land on representation boundaries with probability
    ~0, so the final round agrees across engines.

This is a *test-oracle* concern only — at 100 TB you would simply declare
DECIMAL in the table schema and Spark's hash aggregate handles it natively
(partial aggregation is still map-side combinable for decimal sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices, balances  (fits up to 10^10)
RATE = "decimal(4,2)"  # discounts, taxes  (0.00 .. 9.99)


def money(c: str | Column) -> Column:
    """Exact decimal view of a 2-decimal money column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(MONEY)


def rate(c: str | Column) -> Column:
    """Exact decimal view of a 2-decimal rate column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(RATE)


def one_minus(c: str | Column) -> Column:
    """(1 - rate) as exact decimal."""
    return F.lit(1).cast(RATE) - rate(c)


def one_plus(c: str | Column) -> Column:
    """(1 + rate) as exact decimal."""
    return F.lit(1).cast(RATE) + rate(c)


def dsum(expr: Column, scale: int = 2) -> Column:
    """Deterministic rounded sum of an exact-decimal expression → double."""
    return F.round(F.sum(expr), scale).cast("double")


def davg(expr: Column, scale: int = 6) -> Column:
    """Deterministic average: exact decimal sum → double ÷ count → round."""
    return F.round(F.sum(expr).cast("double") / F.count(F.lit(1)), scale)


# --- SQL (DuckDB oracle) fragments mirroring the helpers above ----------

SQL_MONEY = "DECIMAL(12,2)"
SQL_RATE = "DECIMAL(4,2)"


def sql_money(c: str) -> str:
    return f"CAST({c} AS {SQL_MONEY})"


def sql_rate(c: str) -> str:
    return f"CAST({c} AS {SQL_RATE})"


def sql_one_minus(c: str) -> str:
    return f"(CAST(1 AS {SQL_RATE}) - {sql_rate(c)})"


def sql_one_plus(c: str) -> str:
    return f"(CAST(1 AS {SQL_RATE}) + {sql_rate(c)})"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(round(sum({expr}), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"round(CAST(sum({expr}) AS DOUBLE) / count(*), {scale})"


def dratio(numer: Column, denom: Column, scale: int = 6) -> Column:
    """Exact half-up rounding of a NON-NEGATIVE integer ratio → double.

    ``round(numer/denom, s)`` on the DOUBLE quotient ties at real
    boundaries whenever the reduced denominator's decimal expansion
    terminates exactly at scale s+1 (e.g. 14616/230400 = 0.0634375) —
    and the engines break the tie differently: Spark ROUND rounds the
    shortest decimal repr HALF_UP, DuckDB rounds the scaled binary
    value (caught live by the sf1.0 fingerprint sweep on
    supplier_concentration). This computes the rounding in exact
    integer arithmetic instead: half_up(a/b, s) = (2·a·10^s + b) div
    (2·b), then one exact int→double division — bit-identical on both
    engines. Magnitude contract: 2·numer·10^s + denom < 2^53 (the long
    values pass through an exact double division), i.e. numer below
    ~4.5e(15-s).
    """
    p = 10 ** scale
    a = numer.cast("long") * F.lit(2 * p) + denom.cast("long")
    b = denom.cast("long") * F.lit(2)
    q = (a - a % b) / b  # exact: a - a%b = q·b with q·b < 2^53
    return (q / F.lit(float(p))).cast("double")


def sql_dratio(numer: str, denom: str, scale: int = 6) -> str:
    """DuckDB twin of ``dratio`` (integral // then one exact division)."""
    p = 10 ** scale
    return (
        f"CAST((2 * CAST(({numer}) AS BIGINT) * {p} "
        f"+ CAST(({denom}) AS BIGINT)) "
        f"// (2 * CAST(({denom}) AS BIGINT)) AS DOUBLE) / {p}.0"
    )
