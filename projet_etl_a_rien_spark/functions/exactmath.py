"""Order-independent (exact) aggregation arithmetic.

Why this exists: a double-precision SUM's low bits depend on accumulation
order — partial aggregation, AQE coalescing, and different engines all
reorder it. For a 100 TB engine that must produce *stable, verifiable*
numbers (and for the DuckDB cross-check oracle), monetary aggregates are
computed on exact integer cents:

    per-row:  CAST(ROUND(x * 100) AS BIGINT)   -- exact, deterministic
    sum:      SUM(bigint)                      -- associative, exact
    final:    cents / 100.0 [/ n]              -- one deterministic fp op

The per-row ROUND is safe because the fixtures' monetary columns are
2-decimal values: each double sits within ~1e-12 of its cent grid point,
so both engines round identically. Sums stay far inside int64
(~1e7 cents/row × 1e9 rows ≈ 1e16 < 2^63).

These return plain Column expressions — they stay inside whole-stage
codegen with map-side partial aggregation; nothing here is a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cents(x: Column | str) -> Column:
    """Exact integer cents for a 2-decimal monetary double."""
    return F.round(_col(x) * 100).cast("long")


def sum_cents(x: Column | str) -> Column:
    """Exact SUM in cents (bigint)."""
    return F.sum(cents(x))


def sum_money(x: Column | str) -> Column:
    """Exact SUM of a monetary column, expressed back in currency units."""
    return sum_cents(x) / 100.0


def avg_money(x: Column | str) -> Column:
    """Order-independent AVG of a monetary column.

    Shape is exactly ``sum_cents / 100.0 / count`` — the oracle writes the
    same left-associative expression so the fp ops match bit-for-bit.
    """
    return sum_cents(x) / 100.0 / F.count(_col(x))


def sum_product_money(*factors: Column | str) -> Column:
    """Exact SUM of a per-row monetary product, e.g. extprice*(1-discount).

    The product is evaluated in double (deterministic per row — identical
    IEEE ops in any engine given the same operand order), rounded to cents,
    then summed exactly.
    """
    prod = _col(factors[0])
    for f in factors[1:]:
        prod = prod * _col(f)
    return F.sum(F.round(prod * 100).cast("long")) / 100.0
