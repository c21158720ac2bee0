"""Exact / deterministic numeric helpers.

Money in the reference is double (R numeric — SURVEY.md §1.2), and Spark sums
doubles in partition order, which is nondeterministic across runs and differs
from any single-threaded oracle at the last few bits. At 100 TB that
nondeterminism also breaks retries/speculative execution reconciliation. The
engine therefore sums money through exact decimal arithmetic and casts the
*result* back to double: bit-identical on every run, on any partitioning, and
in any ANSI-SQL oracle that follows the same recipe — with no measurable cost
because the decimal aggregation still runs inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18,2 fits |amount| < 10^16 at cent precision — covers USD money columns.
_MONEY = "decimal(18,2)"
# 27,6 for per-row products like price*(1-discount): the true product has
# ≤4 decimal places, so rounding at 6 is exact and order-independent.
_PRODUCT = "decimal(27,6)"


def money_sum(col: Column | str) -> Column:
    """Deterministic SUM over a money column; returns double.

    Oracle-SQL equivalent: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_MONEY)).cast("double")


def money_avg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_MONEY)).cast("double") / F.count(c)).cast("double")


def product_sum(col: Column) -> Column:
    """Deterministic SUM over a derived product column (e.g. price*(1-disc)).

    Oracle-SQL equivalent: ``CAST(SUM(CAST(expr AS DECIMAL(27,6))) AS DOUBLE)``.
    """
    return F.sum(col.cast(_PRODUCT)).cast("double")


def round6(col: Column) -> Column:
    """Round an analytic double (exp/ln/pow chains) to 6 dp for stable hashing
    across engines whose libm may differ in the last ulp."""
    return F.round(col, 6)
