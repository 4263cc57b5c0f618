"""Deterministic sampling / split assignment for training-data pipelines.

A training corpus needs reproducible membership decisions — the same
document must land in the same split on every run, on any engine, at any
parallelism, with no RNG state to ship. Everything here derives a uniform
[0, 1) value per KEY from md5 (engine-portable, oracle-checkable — same
trick as the MinHash/SimHash hashes) and thresholds it:

- ``u01(key, seed)``: first 16 bits of ``md5(seed || ':' || key)`` / 65536.
  Granularity 1/65536 — split fractions are honored to ±0.002%, which is
  the documented bias bound (a production variant can widen to 8 hex chars
  if finer fractions are ever needed).
- ``deterministic_split``: label each row train/val/test (any weights).
- ``hash_sample``: keep a reproducible ``fraction`` of rows.

All pure narrow column expressions: no shuffle, no RNG, trivially
distributed — and unlike ``df.sample`` the decision is a function of the
KEY, so late-arriving copies of a row land in the same split (the property
dedup + incremental pipelines need).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def u01(key: Column | str, seed: str = "split") -> Column:
    """Uniform [0, 1) per key: 16-bit slice of md5, engine-portable."""
    key = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("int")
            / F.lit(65536.0))


def sql_u01(key_expr: str, seed: str = "split") -> str:
    """DuckDB mirror of u01 (strpos nibbles stand in for conv)."""
    h = f"md5('{seed}:' || CAST({key_expr} AS VARCHAR))"
    nibble = (lambda i, w:
              f"(strpos('0123456789abcdef', substr({h}, {i}, 1)) - 1) * {w}")
    v = " + ".join(nibble(i + 1, 16 ** (3 - i)) for i in range(4))
    return f"(({v}) / 65536.0)"


def deterministic_split(df: DataFrame, key_col: str,
                        weights: dict[str, float] | None = None,
                        seed: str = "split",
                        out_col: str = "split") -> DataFrame:
    """Assign each row a split label by hashed key. ``weights`` maps label
    -> fraction (must sum to ~1); label order is the dict order, so the
    same dict reproduces the same assignment anywhere."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    u = u01(key_col, seed)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label]
        cond = u < F.lit(acc)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = (F.lit(labels[-1]) if expr is None
            else expr.otherwise(labels[-1]))
    return df.withColumn(out_col, expr)


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                seed: str = "sample") -> DataFrame:
    """Reproducible subsample: keep rows whose hashed key falls below
    ``fraction``. Same key -> same verdict across runs/engines."""
    return df.filter(u01(key_col, seed) < F.lit(fraction))


def per_key_sample(df: DataFrame, partition: list[str], key_col: str,
                   k: int, seed: str = "perkey",
                   rank_col: str = "sample_rank") -> DataFrame:
    """Deterministic k-per-group subsample — the batch form of per-stratum
    reservoir sampling (cap each stratum at k documents before mixing).

    Rank rows inside each group by the FULL md5 of the key (not u01's
    16-bit slice: at k close to the group size a 1/65536 collision would
    make the kept set depend on the tiebreaker, and the full 128-bit hex
    string is just as engine-portable — lowercase hex compares bytewise
    identically everywhere) and keep the first ``k``. The hash gives every
    row an i.i.d. uniform draw, so the kept rows are a uniform k-subset,
    reproducible across runs/engines/parallelism with no RNG state.

    One exchange on the group key; ``rank_col`` (1..k) is emitted so a
    downstream consumer can take a nested prefix (rank <= j, j < k) that is
    itself a uniform j-subset — the property that makes this a reservoir
    analog rather than a one-off filter.
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(*partition).orderBy(h, F.col(key_col))
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))
