"""Query registry: every SURVEY §2 operator (and each north-star extension)
exposed as a named (Spark callable, DuckDB oracle SQL) pair for the driver's
differential correctness gate (__spark_entry__.py contract).

Determinism discipline (why results hash-match the oracle bit-for-bit):
- Sums of doubles are order-dependent under parallel aggregation, so every
  money/measure sum goes through ``dsum``: cast to DECIMAL(30,6) per row
  (deterministic), sum exactly (associative), cast back to double, round.
- Timestamps are returned as epoch microseconds (bigint) or formatted
  strings — never raw timestamp objects — because both engines floor
  identically to micros (io.py notes the nanos story).
- Integer-ish outputs are cast to bigint on the Spark side (Spark's
  year()/size()/rank() return 32-bit ints; DuckDB's return BIGINT).
- Every window orderBy carries a unique tiebreaker column (SURVEY §7.4.1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clif_spark.session import configure


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Register an engine query. ``oracle`` is ANSI SQL for DuckDB over the
    driver-registered views; None marks a rows-only check (non-SQL ops)."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = QueryDef(name, wrapped, oracle, headline)
        return wrapped

    return deco


# --- deterministic numeric helpers (Spark side) -----------------------------

def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sum of a double column: exact decimal accumulation,
    rounded double out."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(col.cast("decimal(30,6)")).cast("double"), scale)


def dmean(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean (decimal sum / count)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(col.cast("decimal(30,6)")).cast("double") / F.count(col), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB mirror of dsum."""
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE), {scale})"


def sql_dmean(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of dmean."""
    return (f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"
            f" / COUNT({expr}), {scale})")


def us(col: Column | str) -> Column:
    """Timestamp -> epoch microseconds (bigint); DuckDB mirror is epoch_us()."""
    col = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(col)


def collect_registry() -> dict[str, QueryDef]:
    """Import all query modules and return the populated registry."""
    from clif_spark.queries import (  # noqa: F401
        llm,
        relational,
        scalars,
        streaming,
        temporal,
        tpch,
        windows,
    )

    return REGISTRY
