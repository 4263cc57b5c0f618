"""Skew mitigation (SURVEY §4 physical-execution notes).

Default posture: AQE's skew-join splitting (on in session.py) handles skewed
sort-merge joins at runtime, and hash aggregation already does map-side
partial aggregation — so most skew needs no user action. Salting is the
explicit tool for the residue AQE cannot rebalance: a join where one key's
rows exceed a single task's capacity on the *build* side of the chosen plan,
or a two-phase aggregation whose single hot key must be split before the
final combine (EHR encounter keys and web user keys are exactly this shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
                how: str = "inner", salt_buckets: int = 16) -> DataFrame:
    """Equi-join with the left side's hot keys split across ``salt_buckets``.

    Left rows get a salt from a row-id (spreads duplicates of the same key
    evenly); the right side is replicated once per bucket so every salted
    left row still finds its match. Row-multiplication cost: right side
    x ``salt_buckets`` — use only when the right side is small-ish but above
    the broadcast threshold, the classic salting window.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return l.join(r, keys + ["__salt"], how).drop("__salt")


def salted_count(df: DataFrame, keys: Sequence[str],
                 salt_buckets: int = 16, out_col: str = "n") -> DataFrame:
    """Two-phase count for a hot grouping key: partial count per (key, salt),
    then combine per key. The first shuffle carries at most ``salt_buckets``
    rows per hot key instead of routing every row of that key through one
    reducer."""
    keys = list(keys)
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias(out_col))
