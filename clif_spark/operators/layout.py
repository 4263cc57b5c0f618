"""Physical-layout operators: multi-dimensional clustering keys for
data skipping.

Parquet scans prune row groups by min/max statistics. A single-column
sort gives perfect skipping on that column and none on any other;
Z-ORDERING (Morton interleave) sorts by a key whose bit pattern
alternates between two dimensions, so consecutive rows are close in BOTH
— every row group covers a small rectangle of the 2-D space and a range
predicate on EITHER column prunes most groups. This is the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, as a pure column expression: the
sort itself is Spark's ordinary range-partitioned sort, nothing custom
executes at write time.

Everything is integer bit arithmetic (shift/and/or) — bit-identical
across engines, so the key is oracle-checkable; the quantizer's one
float division is a fixed IEEE sequence over broadcast min/max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (two dims interleave into a 32-bit key)
MORTON_BITS = 16


def morton_key(a: Column, b: Column, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of
    ``a`` lands at position 2i, of ``b`` at 2i+1. Unrolled shift/and/or
    chain — whole-stage-codegen friendly, no HOF, no UDF."""
    # Shift in 64-bit: bit 15 of ``b`` lands at position 31, which
    # overflows a signed 32-bit shift in both engines.
    a64, b64 = a.cast("long"), b.cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a64, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(b64, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out.cast("long")


def sql_morton_key(a: str, b: str, bits: int = MORTON_BITS) -> str:
    """DuckDB mirror of morton_key (same shift/and/or chain)."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((CAST({a} AS BIGINT) >> {i} & 1) << {2 * i})")
        terms.append(
            f"((CAST({b} AS BIGINT) >> {i} & 1) << {2 * i + 1})")
    return "CAST((" + " | ".join(terms) + ") AS BIGINT)"


def morton_decode(key: Column, bits: int = MORTON_BITS) -> Column:
    """Inverse of morton_key: (a, b) struct recovered from the
    interleaved key — the debugging/repartitioning companion (e.g. route
    a z-range scan back to its rectangle). Same unrolled shift chain."""
    k = key.cast("long")
    a: Column = F.lit(0).cast("long")
    b: Column = F.lit(0).cast("long")
    for i in range(bits):
        a = a.bitwiseOR(F.shiftleft(
            F.shiftright(k, 2 * i).bitwiseAND(F.lit(1)), i))
        b = b.bitwiseOR(F.shiftleft(
            F.shiftright(k, 2 * i + 1).bitwiseAND(F.lit(1)), i))
    return F.struct(a.cast("int").alias("a"), b.cast("int").alias("b"))


def quantize16(value: Column, vmin: Column, vmax: Column) -> Column:
    """Map a double into [0, 65535] by linear rescale against broadcast
    group bounds (one IEEE divide + multiply + floor — engine-identical);
    a degenerate vmax == vmin domain maps to 0."""
    span = vmax - vmin
    q = F.floor((value - vmin) / span * F.lit(65535.0) + F.lit(0.5))
    return (F.when(span > 0, F.least(F.greatest(q, F.lit(0)),
                                     F.lit(65535)))
             .otherwise(F.lit(0))).cast("int")


def sql_quantize16(value: str, vmin: str, vmax: str) -> str:
    """DuckDB mirror of quantize16."""
    q = f"FLOOR(({value} - {vmin}) / ({vmax} - {vmin}) * 65535.0 + 0.5)"
    return (f"CAST(CASE WHEN ({vmax} - {vmin}) > 0"
            f" THEN LEAST(GREATEST({q}, 0), 65535)"
            f" ELSE 0 END AS INT)")


def zorder_by(df: DataFrame, a_col: str, b_col: str,
              key_col: str = "zkey") -> DataFrame:
    """Sort a DataFrame by the Morton key of two int columns — write the
    result with a bounded row-group size and both columns' min/max
    statistics tighten per group (tests pin the span shrink via pyarrow
    metadata). The sort is Spark's ordinary range exchange; at cluster
    scale this is exactly one extra shuffle at write time, amortized by
    every 2-D-predicated read after it."""
    return (df.withColumn(key_col, morton_key(F.col(a_col), F.col(b_col)))
              .orderBy(key_col))
