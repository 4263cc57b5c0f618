"""Product quantization (PQ) encode — the memory side of FAISS-style ANN
(IVF partitions the corpus; PQ compresses residuals/vectors to m small
codes). Complements clif_spark.similarity's IVF + LSH candidate paths.

Exact-integer formulation (why no floats): assignment = argmin of L2
distance over a small codebook. Computed in doubles, the argmin could flip
across engines on a last-ulp tie; so coordinates are quantized to integer
micros first (floor(x*1e6 + 0.5) — the dsum trick) and every distance is
exact BIGINT arithmetic. Bound: unit-ish coords are |x| ~ 1e6 micros, so
a sub-distance is <= sub_dim * (2e6)^2 ~= 6.4e13 << 2^63; the fail-loud
ceiling is |x| <= 189 (_PQ_MAX_ABS — 64 squared diffs of 2*189e6 micros
stay under 2^63, 190 does not), enforced by raise_error in the quantize
expressions.

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

Measured recall honesty note (sf0.001, k=10, vs the exact cosine
baseline): ~0.1-0.3 for ADC and IVFPQ on the shipped corpus, and still
~0.2 after normalizing vectors (aligning ADC's L2 with the cosine
baseline) and training the codebook. That is the EXPECTED result, not a
bug: the synthetic embeddings are structureless uniform noise, and
m=4 x ks=8 codes carry 15 bits for 64 noise dimensions — PQ's accuracy
comes from real embedding manifolds having low intrinsic dimension
(cf. the clustered-data test, where trained-residual reconstruction
error drops >2x). Production dials: raise m/ks, normalize for cosine
workloads, train on a corpus sample.
"""

from __future__ import annotations

import hashlib
import math
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: |coordinate| bound for exact BIGINT distances at the DEFAULT geometry
#: (m=4 × sub_dim=16 = 64 terms): 64 terms of (2 * MAX_ABS * 1e6)^2 must
#: stay under 2^63. 190 NARROWLY violates it (64·(380e6)² = 9.2416e18 >
#: 2^63 = 9.2234e18); 189 gives 9.1446e18. Non-default geometries derive
#: their own bound via _pq_max_abs — a hardcoded 189 would silently
#: reopen the overflow for caller-supplied codebooks with dim > 64.
_PQ_MAX_ABS = 189


def _pq_max_abs(dim: int) -> int:
    """Largest |coordinate| whose full ``dim``-term BIGINT distance sum is
    exact: dim squared diffs of (2·B·1e6) micros must stay under 2^63,
    so B = floor(sqrt(2^63 / dim) / 2e6). dim=64 → 189 (the historical
    _PQ_MAX_ABS); dim=256 → 94. Raises if the geometry is so wide no
    integer bound survives (dim > ~2.3e6 — nothing real gets there)."""
    b = math.isqrt((2 ** 63) // dim) // 2_000_000
    if b < 1:
        raise ValueError(
            f"PQ geometry dim={dim} leaves no BIGINT-exact coordinate "
            f"bound — reduce dimensionality or rescale to fewer micros")
    return b


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
              id_col: str = "vec_id", vec_col: str = "embedding",
              extra_cols: tuple = ()) -> DataFrame:
    """Encode each vector as m block codes + total reconstruction error
    (in micros^2). Output: (id, *extra_cols, code0..code{m-1} bigint,
    err bigint) — ``extra_cols`` are carried through untouched (e.g. the
    IVF cell for a combined IVFPQ index).

    One narrow selectExpr: quantize to integer micros, then per block sort
    an m*ks literal array of (distance, code) structs — argmin with a
    deterministic code tiebreak, all BIGINT.

    Magnitude precondition (fail-loud, not silent): the BIGINT-exact
    distance bound is derived from THIS codebook's geometry (_pq_max_abs
    over m·sub_dim terms — 189 at the default 64-dim layout; wider
    caller-supplied codebooks get a proportionally tighter bound). Real
    embedding models emit unit-ish coordinates, but an unnormalized
    outlier (|x| ~ 1e3) would silently wrap the distance sum and corrupt
    codes/err — so the quantize expression raises on any out-of-range
    coordinate instead of encoding garbage. Scale or normalize inputs
    first if they exceed the bound."""
    cb = codebook or pq_codebook()
    m, sub_dim = len(cb), len(cb[0][0])
    bound = _pq_max_abs(m * sub_dim)
    qv = (f"transform(CAST({vec_col} AS ARRAY<DOUBLE>), x -> "
          f"CAST(floor(IF(abs(x) > {bound}D, "
          f"raise_error('pq_encode: |coordinate| > {bound} would "
          f"overflow the BIGINT micros^2 distance — normalize or scale "
          f"embeddings first'), x) * 1000000.0D + 0.5D) AS BIGINT))")
    quant = df.select(F.col(id_col), *[F.col(c) for c in extra_cols],
                      F.expr(qv).alias("__qv"))
    blocks = []
    for b in range(m):
        structs = ",".join(
            f"named_struct('d', {_dist_terms(cb[b][j], b * sub_dim, '__qv', False)},"
            f" 'j', CAST({j} AS BIGINT))"
            for j in range(len(cb[b])))
        blocks.append(F.expr(f"array_sort(array({structs}))[0]").alias(f"__b{b}"))
    sel = quant.select(id_col, *extra_cols, *blocks)
    return sel.select(
        id_col, *extra_cols,
        *[F.col(f"__b{b}")["j"].alias(f"code{b}") for b in range(m)],
        sum(F.col(f"__b{b}")["d"] for b in range(m)).cast("long").alias("err"))


def pq_train(vectors: DataFrame, m: int = 4, ks: int = 8,
             dim: int = 64, max_iter: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: str = "pqkm") -> list:
    """Train a PQ codebook: per block, distributed k-means
    (similarity.kmeans — narrow literal-centroid assign, map-side-combined
    update) over that block's sub-vectors, then quantize the learned
    centroids to the integer-micros table pq_encode/pq_adc_topk consume.

    m sequential kmeans runs over sliced columns — at corpus scale each is
    the same one-scan-per-iteration shape as the IVF quantizer training;
    only k×sub_dim floats per block ever reach the driver. Proof of the
    pluggable-codebook contract: tests assert the trained table cuts mean
    reconstruction error vs the md5 codebook on real data."""
    from clif_spark import similarity as S

    if m <= 0 or dim % m != 0:
        raise ValueError(
            f"pq_train: dim={dim} must divide evenly into m={m} blocks — "
            f"a remainder would silently leave the trailing {dim % m} "
            f"dimensions un-encoded (and a wrong dim mis-slices every "
            f"block)")
    sub_dim = dim // m
    cb = []
    for b in range(m):
        sub = vectors.select(
            F.col(id_col),
            F.expr(f"slice(CAST({vec_col} AS ARRAY<DOUBLE>),"
                   f" {b * sub_dim + 1}, {sub_dim})").alias("__sub"))
        cents, _, _ = S.kmeans(sub, k=ks, max_iter=max_iter,
                               id_col=id_col, vec_col="__sub",
                               seed=f"{seed}:{b}")
        cb.append([[int(math.floor(c * 1e6 + 0.5)) for c in cent]
                   for cent in cents])
    return cb


def _query_dist_table(queries: DataFrame, cb: list,
                      key_cols: list[str] | str,
                      vec_col: str) -> DataFrame:
    """(*key_cols, b, j, d): exact integer distance from each key row's
    quantized vector to every (block, code) codebook entry. ``key_cols``
    is (query_id,) for flat ADC and (query_id, cell) for residual IVFPQ
    where the query vector differs per probed cell.

    HOF formulation, not m*ks unrolled structs: the unrolled explode put
    ~m*ks*sub_dim arithmetic terms into ONE codegen method and blew
    Janino's method-size limit (observed: CodeGenerator ERROR + fallback
    to interpreted). HOF lambdas are interpreted by design — fine here,
    the query side is dimension-sized."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    m, ks, sub_dim = len(cb), len(cb[0]), len(cb[0][0])
    # Same fail-loud magnitude guard as pq_encode, derived from THIS
    # codebook's geometry: a query coordinate beyond the BIGINT-exact
    # bound must raise, not wrap the ADC table.
    bound = _pq_max_abs(m * sub_dim)
    qv = (f"transform(CAST({vec_col} AS ARRAY<DOUBLE>), x -> "
          f"CAST(floor(IF(abs(x) > {bound}D, "
          f"raise_error('pq query: |coordinate| > {bound} would "
          f"overflow the BIGINT micros^2 distance — normalize or scale "
          f"embeddings first'), x) * 1000000.0D + 0.5D) AS BIGINT))")
    quant = queries.select(*[F.col(c) for c in keys],
                           F.expr(qv).alias("__qv"))
    cb_lit = ("array(" + ",".join(
        "array(" + ",".join(f"{c}L" for c in cb[b][j]) + ")"
        for b in range(m) for j in range(ks)) + ")")
    return quant.select(
        *keys,
        F.expr(f"""
        explode(transform(sequence(0, {m * ks - 1}), i -> named_struct(
            'b', CAST(i div {ks} AS BIGINT),
            'j', CAST(i % {ks} AS BIGINT),
            'd', aggregate(
                zip_with(slice(__qv, (i div {ks}) * {sub_dim} + 1, {sub_dim}),
                         element_at({cb_lit}, i + 1),
                         (x, c) -> (x - c) * (x - c)),
                CAST(0 AS BIGINT), (acc, v) -> acc + v))))
        """).alias("s")
    ).select(*keys, "s.b", "s.j", "s.d")


def pq_adc_topk(vectors: DataFrame, queries: DataFrame,
                codebook: list | None = None, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes — FAISS's search side, as pure relational algebra:

    1. encode the corpus (narrow, zero-shuffle — pq_encode);
    2. build the query-side DISTANCE TABLE in-engine: for each query,
       the exact integer distance from its quantized sub-vector to every
       (block, code) codebook entry — queries x m x ks rows, dimension-
       sized by construction, BROADCAST;
    3. unpivot each vector's codes to (block, code) rows and join the
       broadcast table: ADC distance = sum of its m block lookups.

    The join geometry is the scale story: the corpus side only ever
    touches its m-byte codes (never raw vectors), the per-query work is a
    broadcast hash lookup + keyed sum, and the final per-query top-k is a
    bounded window. All arithmetic BIGINT (micros^2), so ranking is
    engine-exact and ADC error vs brute force comes only from
    quantization — measurable via pq_encode's err column.

    Output: (query_id, neighbor_id, adc) with adc ascending = nearest.
    """
    cb = codebook or pq_codebook()
    m, ks, sub_dim = len(cb), len(cb[0]), len(cb[0][0])
    enc = pq_encode(vectors, cb, id_col=id_col, vec_col=vec_col)
    code_pairs = ", ".join(
        f"CAST({b} AS BIGINT), code{b}" for b in range(m))
    enc_long = enc.selectExpr(
        f"{id_col} AS neighbor_id",
        f"stack({m}, {code_pairs}) AS (b, j)")
    dist_table = _query_dist_table(queries, cb, query_id_col, vec_col)
    w = Window.partitionBy(query_id_col).orderBy("adc", "neighbor_id")
    return (enc_long.join(F.broadcast(dist_table), ["b", "j"])
            .filter(F.col("neighbor_id") != F.col(query_id_col))
            .groupBy(query_id_col, "neighbor_id")
            .agg(F.sum("d").alias("adc"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def _cents_lit(cents: list[list[float]]) -> str:
    """Centroid table as a SQL array-of-arrays literal (repr round-trips
    doubles exactly; one py4j trip — the _lit_vec rationale)."""
    return ("array(" + ",".join(
        "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
        for c in cents) + ")")


def _residualize(df: DataFrame, cents: list, vec_col: str) -> DataFrame:
    """Replace ``vec_col`` with (vector - centroid[cell]) — one IEEE
    subtraction per coordinate against the inlined centroid table,
    deterministic before micros quantization; the single definition all
    residual paths (corpus, probe, tests) share."""
    cl = _cents_lit(cents)
    return df.withColumn(vec_col, F.expr(
        f"zip_with(CAST({vec_col} AS ARRAY<DOUBLE>),"
        f" element_at({cl}, cell + 1), (x, c) -> x - c)"))


def ivfpq_topk(vectors: DataFrame, queries: DataFrame,
               codebook: list | None = None, k: int = 10, nprobe: int = 2,
               n_cells: int = 16, centroids: list | None = None,
               residual: bool = False,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "query_id") -> DataFrame:
    """The combined FAISS-style IVFPQ index: coarse IVF cells bound the
    candidate set (each query touches ~nprobe/n_cells of the corpus),
    PQ/ADC scores the candidates over codes instead of raw vectors.

    Composition of the two gated halves: cell assignment + code encode
    happen in ONE narrow projection over the scan (extra_cols carries the
    cell through pq_encode — no corpus self-join); the probe list and the
    distance table are both dimension-sized broadcasts. Join geometry:
    codes ⋈ probes on cell (broadcast) ⋈ distance table on (query, b, j)
    (broadcast) → keyed BIGINT sum → bounded per-query top-k window.
    Both quantizers are pluggable (kmeans centroids, trained codebook).

    Output: (query_id, neighbor_id, adc) ascending = nearest.
    """
    from clif_spark import similarity as S

    cb = codebook or pq_codebook()
    m = len(cb)
    cents = (centroids if centroids is not None
             else S.ivf_centroids(vectors, n_cells, id_col, vec_col))
    assigned = S.ivf_assign(vectors, cents, id_col, vec_col)
    if residual:
        # FAISS-faithful IVFPQ: PQ encodes (v - centroid[cell]). The
        # payoff requires clustered data AND a codebook trained on the
        # residuals (pq_train over residual vectors) — pinned by test on
        # clustered synthetic data; on structure-free corpora or with a
        # range-matched random codebook residuals cannot win. The query
        # side must then build ONE distance table per probed cell (the
        # query residual differs per cell), still dimension-sized:
        # queries x nprobe x m x ks rows.
        assigned = _residualize(assigned, cents, "__v")
    enc = pq_encode(assigned, cb, id_col=id_col, vec_col="__v",
                    extra_cols=("cell",))
    code_pairs = ", ".join(f"CAST({b} AS BIGINT), code{b}" for b in range(m))
    enc_long = enc.selectExpr(f"{id_col} AS neighbor_id", "cell",
                              f"stack({m}, {code_pairs}) AS (b, j)")
    w = Window.partitionBy(query_id_col).orderBy("adc", "neighbor_id")
    q = queries.select(query_id_col, F.col(vec_col).alias("__q"))
    probes = (q.withColumn("__cells", F.slice(
                  S._cell_ranks(F.col("__q"), cents), 1, nprobe))
               .select(query_id_col, "__q",
                       F.explode(F.col("__cells")["c"]).alias("cell")))
    if residual:
        probes = _residualize(probes, cents, "__q")
        dist_table = _query_dist_table(probes, cb,
                                       [query_id_col, "cell"], "__q")
        joined = (enc_long.join(F.broadcast(dist_table), ["cell", "b", "j"])
                  .filter(F.col("neighbor_id") != F.col(query_id_col)))
    else:
        dist_table = _query_dist_table(queries, cb, query_id_col, vec_col)
        joined = (enc_long.join(F.broadcast(probes.drop("__q")), "cell")
                  .filter(F.col("neighbor_id") != F.col(query_id_col))
                  .join(F.broadcast(dist_table), [query_id_col, "b", "j"]))
    return (joined
            .groupBy(query_id_col, "neighbor_id")
            .agg(F.sum("d").alias("adc"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def ivfpq_oracle_sql(table_expr: str, n_queries: int = 5,
                     codebook: list | None = None, k: int = 10,
                     nprobe: int = 2, n_cells: int = 16,
                     residual: bool = False,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> str:
    """DuckDB mirror of ivfpq_topk (lowest-id coarse quantizer, queries
    ``{id} < n_queries``) — cell CTEs shared with the IVF oracle shape,
    code/distance CTEs generated from the same codebook; with
    ``residual`` both sides encode/probe (vector - cell centroid)."""
    cb = codebook or pq_codebook()
    m, ks, sub_dim = len(cb), len(cb[0]), len(cb[0][0])
    if residual:
        return _ivfpq_residual_oracle_sql(table_expr, n_queries, cb, k,
                                          nprobe, n_cells, id_col, vec_col)
    enc = pq_oracle_sql(table_expr, cb, id_col=id_col, vec_col=vec_col)
    unpivot = " UNION ALL ".join(
        f"SELECT neighbor_id, cell, CAST({b} AS BIGINT) AS b,"
        f" code{b} AS j FROM encc" for b in range(m))
    structs = ",".join(
        f"struct_pack(b := CAST({b} AS BIGINT), j := CAST({j} AS BIGINT),"
        f" d := {_dist_terms(cb[b][j], b * sub_dim, 'qv', True)})"
        for b in range(m) for j in range(ks))
    return f"""
    WITH cidx AS (
      SELECT CAST({vec_col} AS DOUBLE[]) AS cv,
             row_number() OVER (ORDER BY {id_col}) - 1 AS ci
      FROM {table_expr} ORDER BY {id_col} LIMIT {n_cells}
    ),
    v AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS vv
          FROM {table_expr}),
    vass AS (
      SELECT {id_col}, ci AS cell
      FROM v CROSS JOIN cidx
      QUALIFY row_number() OVER
        (PARTITION BY {id_col} ORDER BY list_distance(vv, cv), ci) = 1
    ),
    enc AS ({enc}),
    encc AS (SELECT e.{id_col} AS neighbor_id,
                    {", ".join(f"e.code{b}" for b in range(m))}, va.cell
             FROM enc e JOIN vass va USING ({id_col})),
    enc_long AS ({unpivot}),
    qc AS (
      SELECT q.{id_col} AS query_id, ci AS cell
      FROM v q CROSS JOIN cidx
      WHERE q.{id_col} < {n_queries}
      QUALIFY row_number() OVER
        (PARTITION BY q.{id_col} ORDER BY list_distance(q.vv, cv), ci)
        <= {nprobe}
    ),
    qq AS (SELECT {id_col} AS query_id,
                  list_transform(CAST({vec_col} AS DOUBLE[]),
                      x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv
           FROM {table_expr} WHERE {id_col} < {n_queries}),
    dt AS (SELECT query_id, s.b AS b, s.j AS j, s.d AS d
           FROM (SELECT query_id, unnest([{structs}]) AS s FROM qq)),
    scored AS (SELECT el.query_id, el.neighbor_id, sum(dt.d) AS adc
               FROM (SELECT qc.query_id, e.neighbor_id, e.b, e.j
                     FROM enc_long e JOIN qc USING (cell)
                     WHERE e.neighbor_id <> qc.query_id) el
               JOIN dt USING (query_id, b, j)
               GROUP BY el.query_id, el.neighbor_id)
    SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc
    FROM scored
    QUALIFY row_number() OVER
        (PARTITION BY query_id ORDER BY adc, neighbor_id) <= {k}
    """


def pq_adc_oracle_sql(table_expr: str, n_queries: int = 3,
                      codebook: list | None = None, k: int = 10,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """DuckDB mirror of pq_adc_topk for queries ``vec_id < n_queries``,
    generated from the same codebook (1-based indexing)."""
    cb = codebook or pq_codebook()
    m, ks, sub_dim = len(cb), len(cb[0]), len(cb[0][0])
    enc = pq_oracle_sql(table_expr, cb, id_col=id_col, vec_col=vec_col)
    unpivot = " UNION ALL ".join(
        f"SELECT {id_col} AS neighbor_id, CAST({b} AS BIGINT) AS b,"
        f" code{b} AS j FROM enc" for b in range(m))
    structs = ",".join(
        f"struct_pack(b := CAST({b} AS BIGINT), j := CAST({j} AS BIGINT),"
        f" d := {_dist_terms(cb[b][j], b * sub_dim, 'qv', True)})"
        for b in range(m) for j in range(ks))
    return f"""
    WITH enc AS ({enc}),
    enc_long AS ({unpivot}),
    qq AS (SELECT {id_col} AS query_id,
                  list_transform(CAST({vec_col} AS DOUBLE[]),
                      x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv
           FROM {table_expr} WHERE {id_col} < {n_queries}),
    dt AS (SELECT query_id, s.b AS b, s.j AS j, s.d AS d
           FROM (SELECT query_id, unnest([{structs}]) AS s FROM qq)),
    scored AS (SELECT query_id, neighbor_id, sum(d) AS adc
               FROM enc_long JOIN dt USING (b, j)
               WHERE neighbor_id <> query_id
               GROUP BY query_id, neighbor_id)
    SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc
    FROM scored
    QUALIFY row_number() OVER
        (PARTITION BY query_id ORDER BY adc, neighbor_id) <= {k}
    """


def _ivfpq_residual_oracle_sql(table_expr: str, n_queries: int, cb: list,
                               k: int, nprobe: int, n_cells: int,
                               id_col: str, vec_col: str) -> str:
    """Residual-IVFPQ oracle: encode (v - centroid[cell]), probe with the
    per-cell query residual — the dt relation is keyed (query, cell)."""
    m, ks, sub_dim = len(cb), len(cb[0]), len(cb[0][0])
    dim = m * sub_dim
    enc = pq_oracle_sql("res", cb, id_col=id_col, vec_col="embedding")
    unpivot = " UNION ALL ".join(
        f"SELECT neighbor_id, cell, CAST({b} AS BIGINT) AS b,"
        f" code{b} AS j FROM encc" for b in range(m))
    structs = ",".join(
        f"struct_pack(b := CAST({b} AS BIGINT), j := CAST({j} AS BIGINT),"
        f" d := {_dist_terms(cb[b][j], b * sub_dim, 'qv', True)})"
        for b in range(m) for j in range(ks))
    return f"""
    WITH cidx AS (
      SELECT CAST({vec_col} AS DOUBLE[]) AS cv,
             row_number() OVER (ORDER BY {id_col}) - 1 AS ci
      FROM {table_expr} ORDER BY {id_col} LIMIT {n_cells}
    ),
    v AS (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS vv
          FROM {table_expr}),
    vass AS (
      SELECT {id_col}, vv, cv, ci AS cell
      FROM v CROSS JOIN cidx
      QUALIFY row_number() OVER
        (PARTITION BY {id_col} ORDER BY list_distance(vv, cv), ci) = 1
    ),
    res AS (SELECT {id_col}, cell,
                   list_transform(range(1, {dim + 1}),
                                  i -> vv[i] - cv[i]) AS embedding
            FROM vass),
    enc AS ({enc}),
    encc AS (SELECT e.{id_col} AS neighbor_id,
                    {", ".join(f"e.code{b}" for b in range(m))}, r.cell
             FROM enc e JOIN res r USING ({id_col})),
    enc_long AS ({unpivot}),
    qc AS (
      SELECT q.{id_col} AS query_id, ci AS cell,
             list_transform(range(1, {dim + 1}),
                            i -> q.vv[i] - cv[i]) AS rv
      FROM v q CROSS JOIN cidx
      WHERE q.{id_col} < {n_queries}
      QUALIFY row_number() OVER
        (PARTITION BY q.{id_col} ORDER BY list_distance(q.vv, cv), ci)
        <= {nprobe}
    ),
    qq AS (SELECT query_id, cell,
                  list_transform(rv,
                      x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS qv
           FROM qc),
    dt AS (SELECT query_id, cell, s.b AS b, s.j AS j, s.d AS d
           FROM (SELECT query_id, cell, unnest([{structs}]) AS s FROM qq)),
    scored AS (SELECT dt.query_id, el.neighbor_id, sum(dt.d) AS adc
               FROM enc_long el JOIN dt USING (cell, b, j)
               WHERE el.neighbor_id <> dt.query_id
               GROUP BY dt.query_id, el.neighbor_id)
    SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc
    FROM scored
    QUALIFY row_number() OVER
        (PARTITION BY query_id ORDER BY adc, neighbor_id) <= {k}
    """


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
