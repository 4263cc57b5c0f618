"""Product quantization (PQ) encode — the memory side of FAISS-style ANN
(IVF partitions the corpus; PQ compresses residuals/vectors to m small
codes). Complements clif_spark.similarity's IVF + LSH candidate paths.

Exact-integer formulation (why no floats): assignment = argmin of L2
distance over a small codebook. Computed in doubles, the argmin could flip
across engines on a last-ulp tie; so coordinates are quantized to integer
micros first (floor(x*1e6 + 0.5) — the dsum trick) and every distance is
exact BIGINT arithmetic. Bound: coords are |x| < ~1e6 micros, so a
sub-distance is <= sub_dim * (2e6)^2 ~= 6.4e13 << 2^63 — no overflow at
any real embedding scale.

The codebook is md5-derived (deterministic, engine-portable, no RNG
state) — the role of a trained codebook is pluggable exactly like the
k-means quantizer in ivf_topk: training produces the same [m][ks][sub_dim]
integer table, and both the Spark plan and the oracle SQL are generated
from whatever table is passed in.

Scale shape: the encode is a pure narrow projection (codebook folded into
the expression as literals — m*ks*sub_dim ints, kilobytes), so it runs
inside the scan with zero shuffles at any corpus size; downstream ADC
search scans codes instead of raw vectors at sub_dim*8/codes-bits
compression.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_codebook(m: int = 4, ks: int = 8, sub_dim: int = 16,
                seed: str = "pq", scale: int = 500000) -> list:
    """[m][ks][sub_dim] integer-micros codebook, uniform in [-scale, scale)
    per coordinate via md5(seed:block:code:dim) — reproducible anywhere."""
    cb = []
    for b in range(m):
        codes = []
        for j in range(ks):
            row = []
            for d in range(sub_dim):
                h = hashlib.md5(f"{seed}:{b}:{j}:{d}".encode()).digest()
                (v,) = struct.unpack(">Q", h[:8])
                row.append(int(v % (2 * scale)) - scale)
            codes.append(row)
        cb.append(codes)
    return cb


def _dist_terms(cb_row: list[int], base: int, qv: str, one_based: bool) -> str:
    off = 1 if one_based else 0
    return "+".join(
        f"({qv}[{base + d + off}]-({c}))*({qv}[{base + d + off}]-({c}))"
        for d, c in enumerate(cb_row))


def pq_encode(df: DataFrame, codebook: list | None = None,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Encode each vector as m block codes + total reconstruction error
    (in micros^2). Output: (id, code0..code{m-1} bigint, err bigint).

    One narrow selectExpr: quantize to integer micros, then per block sort
    an m*ks literal array of (distance, code) structs — argmin with a
    deterministic code tiebreak, all BIGINT."""
    cb = codebook or pq_codebook()
    m, sub_dim = len(cb), len(cb[0][0])
    qv = (f"transform(CAST({vec_col} AS ARRAY<DOUBLE>),"
          " x -> CAST(floor(x * 1000000.0D + 0.5D) AS BIGINT))")
    quant = df.select(F.col(id_col), F.expr(qv).alias("__qv"))
    blocks = []
    for b in range(m):
        structs = ",".join(
            f"named_struct('d', {_dist_terms(cb[b][j], b * sub_dim, '__qv', False)},"
            f" 'j', CAST({j} AS BIGINT))"
            for j in range(len(cb[b])))
        blocks.append(F.expr(f"array_sort(array({structs}))[0]").alias(f"__b{b}"))
    sel = quant.select(id_col, *blocks)
    return sel.select(
        id_col,
        *[F.col(f"__b{b}")["j"].alias(f"code{b}") for b in range(m)],
        sum(F.col(f"__b{b}")["d"] for b in range(m)).cast("long").alias("err"))


def pq_oracle_sql(table_expr: str, codebook: list | None = None,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB mirror of pq_encode over ``table_expr`` — generated from the
    SAME codebook literals, 1-based list indexing, BIGINT throughout."""
    cb = codebook or pq_codebook()
    m, sub_dim = len(cb), len(cb[0][0])
    blocks = []
    for b in range(m):
        structs = ",".join(
            f"struct_pack(d := {_dist_terms(cb[b][j], b * sub_dim, 'qv', True)},"
            f" j := CAST({j} AS BIGINT))"
            for j in range(len(cb[b])))
        blocks.append(f"list_sort([{structs}])[1] AS blk{b}")
    codes = ", ".join(f"blk{b}.j AS code{b}" for b in range(m))
    err = " + ".join(f"blk{b}.d" for b in range(m))
    return f"""
    WITH q AS (SELECT {id_col},
                      list_transform(CAST({vec_col} AS DOUBLE[]),
                          x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv
               FROM {table_expr}),
    blk AS (SELECT {id_col}, {", ".join(blocks)} FROM q)
    SELECT {id_col}, {codes}, {err} AS err FROM blk
    """
