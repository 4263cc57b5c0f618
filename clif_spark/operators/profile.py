"""Data-profiling aggregations (SURVEY §2.4 A1-A6).

The reference's interactive sanity checks (SURVEY §5) as engine operators:
single-pass, map-side-combinable aggregations — each is one job over the
table regardless of width, never a per-column loop of jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, keys: Sequence[str], desc: bool = True,
                count_col: str = "n") -> DataFrame:
    """A1/A2: histogram / tally (`group_by %>% count %>% arrange(desc(n))`,
    `code/RCLIF_vitals.Rmd:223`; `tally`, `code/RCLIF_dialysis.Rmd:167-168`).
    Partial aggregation means the shuffle carries one row per (partition, key).
    """
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_col))
    order = [F.col(count_col).desc(), *keys] if desc else [*keys]
    return out.orderBy(*order)


def missingness_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A3: NULL count + fraction per column (`colSums(is.na(df))`,
    `code/RCLIF_vitals.Rmd:236-249`). One aggregate over all columns, then a
    driver-side unpivot of the single result row."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__total")]
    aggs += [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    wide = df.agg(*aggs)
    long = wide.unpivot(["__total"], cols, "column_name", "null_count")
    return long.select(
        "column_name", "null_count",
        F.round(F.col("null_count") / F.col("__total"), 6).alias("null_frac"))


def duplicate_profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A4: duplicate count per column (`sum(duplicated(.))`,
    `code/RCLIF_disposition.Rmd:103-105`) = count - count_distinct.

    Exact distinct per column in one pass; swap ``F.count_distinct`` for
    ``F.approx_count_distinct`` at the 100 TB tier where a ±2% HLL answer is
    the right trade (profiling, not accounting).
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("__total")]
    # R duplicated() counts NAs as duplicating each other too -> count rows,
    # not non-null values: total - (distinct incl. null).
    aggs += [
        (F.count(F.lit(1))
         - F.count_distinct(F.col(c))
         - F.max(F.col(c).isNull().cast("long"))).alias(c)
        for c in cols
    ]
    wide = df.agg(*aggs)
    return (wide.unpivot(["__total"], cols, "column_name", "duplicate_count")
                .select("column_name", "duplicate_count"))


def moment_corr(df: DataFrame, keys: Sequence[str], x: str, y: str,
                x_scale: float = 1.0, y_scale: float = 1.0) -> DataFrame:
    """Deterministic Pearson correlation / sample covariance / OLS slope via
    exact integer second moments (engine extension of A5; the reference's
    analyses stop at `summary()`, `code/RCLIF_vitals.Rmd:233`).

    Distributed-determinism contract: naive FLOAT moment sums are
    order-dependent under parallel partial aggregation, so the statistic is
    *defined* over quantized inputs ``round(x * x_scale)`` — the six moments
    (n, Σx, Σy, Σx², Σy², Σxy) are then exact BIGINT sums (associative,
    map-side combinable, one pass). Each moment is cast to DOUBLE *before*
    any arithmetic; from there every step is the same IEEE expression tree
    in Spark and the DuckDB oracle, so results are bit-identical.

    Bounds: each scaled value must satisfy |x·x_scale| < ~3e9 so per-term
    squares stay inside BIGINT, and per-group moment sums should stay below
    2^53 (~9e15) so the BIGINT→DOUBLE conversion is exact in any engine —
    pick x_scale/y_scale accordingly (e.g. tens of dollars, not micro-cents,
    for TPC-H price domains at SF ≥ 1).

    At 100 TB this is the *right* shape: a single hash-aggregate whose
    shuffle carries six longs per group — no second pass, no global sort,
    no float nondeterminism across retries/speculative tasks.
    """
    qx = F.floor(F.col(x) * F.lit(x_scale) + F.lit(0.5)).cast("long")
    qy = F.floor(F.col(y) * F.lit(y_scale) + F.lit(0.5)).cast("long")
    m = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(qx).cast("double").alias("_sx"),
        F.sum(qy).cast("double").alias("_sy"),
        F.sum(qx * qx).cast("double").alias("_sxx"),
        F.sum(qy * qy).cast("double").alias("_syy"),
        F.sum(qx * qy).cast("double").alias("_sxy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxx, syy, sxy = F.col("_sxx"), F.col("_syy"), F.col("_sxy")
    cov_num = n * sxy - sx * sy          # n²·cov, in scaled units
    varx_num = n * sxx - sx * sx
    vary_num = n * syy - sy * sy
    unscale = F.lit(float(x_scale) * float(y_scale))
    return m.select(
        *keys,
        n.cast("long").alias("n_rows"),
        (cov_num / F.sqrt(varx_num * vary_num)).alias("corr"),
        (cov_num / (n * (n - F.lit(1.0))) / unscale).alias("covar_samp"),
        (cov_num / varx_num * F.lit(float(x_scale) / float(y_scale))
         ).alias("beta"),
        (F.sqrt(varx_num / (n * (n - F.lit(1.0)))) / F.lit(float(x_scale))
         ).alias("sd_x"),
        (F.sqrt(vary_num / (n * (n - F.lit(1.0)))) / F.lit(float(y_scale))
         ).alias("sd_y"),
    )


def exact_percentiles(df: DataFrame, keys: Sequence[str], value: str,
                      ps: Sequence[float],
                      tiebreakers: Sequence[str] = ()) -> DataFrame:
    """Exact nearest-rank percentiles per group (engine extension of A5's
    median; `summary()` quartiles, `code/RCLIF_vitals.Rmd:233`).

    Nearest-rank definition: p-th percentile = value at row ceil(p·n) of the
    group sorted ascending — always an actual data value, no interpolation,
    hence bit-identical across engines with no float arithmetic on values.
    The selected value is deterministic even under value ties (the k-th
    element of the sorted multiset doesn't depend on tie order); the
    tiebreakers only make the physical row_number assignment reproducible
    per the engine's window policy (SURVEY §7.4.1).

    Cost: one shuffle on the group key + per-group sort — the exact-answer
    scale path. At 100 TB prefer two-pass histogram refinement or
    `percentile_approx` (documented error) when groups exceed executor
    partitions; this operator is for grouped domains where each group fits
    a partition (AQE skew-split handles stragglers).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(value, *tiebreakers)
    wn = Window.partitionBy(*keys)
    ranked = df.select(*keys, value, *tiebreakers).select(
        *keys, value,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    aggs = [
        F.max(F.when(F.col("_rn") == F.ceil(F.lit(p) * F.col("_n")),
                     F.col(value))).alias(f"p{int(round(p * 100)):02d}")
        for p in ps
    ]
    return ranked.groupBy(*keys).agg(*aggs)


def winsorize(df: DataFrame, keys: Sequence[str], value: str,
              lo: float = 0.05, hi: float = 0.95,
              tiebreakers: Sequence[str] = (),
              out_col: str | None = None) -> DataFrame:
    """Per-group winsorization: clamp ``value`` into its group's exact
    nearest-rank [lo, hi] percentile band — the outlier-clipping step a
    normalization pipeline runs BEFORE min-max/z-scaling so a single
    artifact row can't compress the whole scale (the robust sibling of
    f15's min-max).

    Bounds are actual data values (exact_percentiles semantics: value at
    ceil(p*n), no interpolation, no float arithmetic on values), so the
    clamp is bit-identical across engines. Plan: the bounds aggregate is
    dimension-sized (one row per group) and broadcast back onto the rows;
    the clamp itself is a narrow least/greatest. Cost = one shuffle +
    per-group sort for the bounds, same budget as exact_percentiles.

    NULL semantics (the pandas/scipy convention): NULL values are
    excluded from the bound computation — Spark's window would otherwise
    rank them FIRST and shift every percentile rank — and pass through
    unclamped (out = NULL). An all-NULL group has no bounds row; the
    left join keeps its rows, out stays NULL.
    """
    bounds = exact_percentiles(df.filter(F.col(value).isNotNull()),
                               keys, value, (lo, hi), tiebreakers)
    lo_c = f"p{int(round(lo * 100)):02d}"
    hi_c = f"p{int(round(hi * 100)):02d}"
    out = out_col or f"{value}_winsor"
    # Explicit isNotNull guard: least/greatest IGNORE null operands in
    # both Spark and DuckDB, so without it a NULL value would silently
    # "clamp" to the lower bound instead of passing through.
    return (df.join(F.broadcast(bounds), list(keys), "left")
              .withColumn(out, F.when(
                  F.col(value).isNotNull(),
                  F.least(F.greatest(F.col(value), F.col(lo_c)),
                          F.col(hi_c))))
              .drop(lo_c, hi_c))


def summary_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5: per-column descriptive stats (`summary(df)`,
    `code/RCLIF_vitals.Rmd:233`): count/min/max/mean/median.

    Median is exact interpolated `percentile` here (matches R/DuckDB
    quantile_cont); at the 100 TB tier use `percentile_approx` and document
    the error bound — exact percentiles require a global sort per column.
    """
    rows = []
    for c in cols:
        col = F.col(c)
        rows.append(df.agg(
            F.lit(c).alias("column_name"),
            F.count(col).alias("n"),
            F.round(F.min(col).cast("double"), 6).alias("min_value"),
            F.round(F.max(col).cast("double"), 6).alias("max_value"),
            F.round(F.sum(col.cast("decimal(30,6)")).cast("double")
                    / F.count(col), 6).alias("mean_value"),
            F.round(F.expr(f"percentile({c}, 0.5)"), 6).alias("median_value"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def numeric_histogram(df: DataFrame, value: str, keys: Sequence[str] = (),
                      n_bins: int = 30, lo: float | None = None,
                      hi: float | None = None) -> DataFrame:
    """A16 (engine ext.): equal-width histogram binning — the DATA behind
    the reference's exploratory ggplot histograms
    (`code/RCLIF_vitals.Rmd:259-278`), which the engine re-expresses as a
    relation instead of a plot: (keys..., bin, bin_start, bin_end, n).

    With ``lo``/``hi`` omitted they are computed in a first single-row
    aggregate and broadcast back over the scan (a 2-pass plan, exactly what
    ggplot's range computation does); bin index is
    ``greatest(0, least(n_bins-1, floor((v - lo) / width)))`` — the max
    value lands in the last bin rather than one past it, and with EXPLICIT
    bounds, out-of-range values clamp symmetrically into the edge bins
    (never negative bins with edges outside [lo, hi]). All arithmetic is
    IEEE-double Catalyst expressions — one shuffle carrying (keys × bins)
    partial counts, any table size."""
    col = F.col(value).cast("double")
    if lo is None or hi is None:
        bounds = df.agg(F.min(col).alias("__lo"), F.max(col).alias("__hi"))
        src = df.crossJoin(F.broadcast(bounds))
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
    else:
        src = df
        lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    width = (hi_c - lo_c) / F.lit(float(n_bins))
    idx = F.when(hi_c == lo_c, F.lit(0).cast("long")).otherwise(
        F.greatest(F.lit(0).cast("long"),
                   F.least(F.lit(n_bins - 1).cast("long"),
                           F.floor((col - lo_c) / width))))
    bin_start = lo_c + idx.cast("double") * width
    bin_end = F.when(idx == n_bins - 1, hi_c).otherwise(
        lo_c + (idx + F.lit(1)).cast("double") * width)
    return (src.filter(col.isNotNull())
               .groupBy(*keys, idx.alias("bin"),
                        bin_start.alias("bin_start"),
                        bin_end.alias("bin_end"))
               .agg(F.count(F.lit(1)).alias("n")))


def kmv_set_sketch(df: DataFrame, key, group, pair: tuple[str, str],
                   k: int = 64) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch with SET OPERATIONS — the
    capability HLL lacks: two groups' sketches support union AND
    intersection estimates (Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations"). Each group's
    sketch is the k lexicographically-smallest md5('kmv:' || key) digests
    (fixed-width lowercase hex, so string order IS numeric order); the
    estimator is (k-1) / v_k with v_k = the k-th minimum as a fraction of
    the hash space (first 48 hash bits). The union sketch is the k
    smallest of the merged sketches; the intersection estimate is the
    Jaccard-scaled union (members of the union sketch that appear in
    BOTH input sketches — a union-sketch member belonging to a set is
    necessarily in that set's own sketch, since its rank there can only
    be smaller).

    DETERMINISTIC by construction (pure md5 order statistics, no RNG), so
    the driver gate recomputes the IDENTICAL estimates in SQL — a
    stronger check than the a12-a14 error-bound contracts. Exact counts
    ride along for honesty; rel_err shows the (k-dependent) accuracy.

    Scale shape: one distinct + one groupBy(group) TOP-K per group — the
    sketch rows (k per group) are the only thing that crosses the final
    exchange; merges are sketch-sized, never data-sized. At 100 TB the
    sketch is what you ship to the driver or a metastore, not the keys.

    Output: ONE row — (type_a, type_b, exact_a, est_a, exact_b, est_b,
    exact_union, est_union, exact_inter, est_inter).
    """
    from pyspark.sql.window import Window

    a, b = pair
    key = F.col(key) if isinstance(key, str) else key
    group = F.col(group) if isinstance(group, str) else group
    t = (df.select(group.alias("g"), key.cast("string").alias("key"))
           .filter(F.col("g").isin(a, b))
           .select("g", "key").distinct())
    hashed = t.select(
        "g", "key",
        F.md5(F.concat(F.lit("kmv:"), F.col("key"))).alias("h"))
    w = Window.partitionBy("g").orderBy("h")
    sk = (hashed.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).select("g", "h"))
    # union sketch: k smallest of the merged (distinct) sketch members
    wu = Window.partitionBy(F.lit(1)).orderBy("h")
    usk = (sk.select("h").distinct()
             .withColumn("rn", F.row_number().over(wu))
             .filter(F.col("rn") <= k))

    def est(kth_h, n_rows):
        """(k-1)/v_k when the sketch is full, else the exact count (the
        standard small-set fallback: fewer than k distinct keys means the
        sketch IS the set)."""
        frac = (F.conv(F.substring(kth_h, 1, 12), 16, 10).cast("long")
                / F.lit(float(1 << 48)))
        return F.when(n_rows < k, n_rows.cast("double")).otherwise(
            F.round(F.lit(float(k - 1)) / frac, 4))

    per_g = (sk.groupBy("g")
               .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n")))
    exact = (t.groupBy("g").agg(F.count(F.lit(1)).alias("exact")))
    ga = (per_g.join(exact, "g").filter(F.col("g") == a)
          .select(F.col("exact").alias("exact_a"),
                  est(F.col("kth"), F.col("n")).alias("est_a")))
    gb = (per_g.join(exact, "g").filter(F.col("g") == b)
          .select(F.col("exact").alias("exact_b"),
                  est(F.col("kth"), F.col("n")).alias("est_b")))
    u = (usk.agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n"))
            .select(est(F.col("kth"), F.col("n")).alias("est_union"),
                    F.col("n").alias("__un")))
    # intersection members: union-sketch digests present in BOTH sketches
    inter_n = (usk.join(sk.filter(F.col("g") == a).select("h"), "h")
                  .join(sk.filter(F.col("g") == b).select("h"), "h")
                  .agg(F.count(F.lit(1)).alias("n_inter")))
    exact_u = (t.select("key").distinct()
                .agg(F.count(F.lit(1)).alias("exact_union")))
    exact_i = (t.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") == 2)
                .agg(F.count(F.lit(1)).alias("exact_inter")))
    return (ga.crossJoin(gb).crossJoin(u).crossJoin(inter_n)
              .crossJoin(exact_u).crossJoin(exact_i)
              .select(
                  F.lit(a).alias("type_a"), F.lit(b).alias("type_b"),
                  "exact_a", "est_a", "exact_b", "est_b",
                  "exact_union", "est_union", "exact_inter",
                  # Jaccard scaling by the ACTUAL union-sketch size (__un),
                  # not the nominal k: when the union holds fewer than k
                  # distinct keys the sketch IS the union, est_union == __un,
                  # and n_inter/__un * __un == n_inter — the exact
                  # intersection. Dividing by k in that regime biases low
                  # (10 shared keys, k=64: 10·10/64 ≈ 1.6, not 10).
                  F.round(F.col("n_inter") / F.col("__un")
                          * F.col("est_union"), 4).alias("est_inter")))


def chisq_association(df: DataFrame, a: str, b) -> DataFrame:
    """Chi-square test of association between two categorical columns —
    the profiling step that answers "is this dimension informative about
    that one" before a pipeline conditions on it. ``b`` may be a Column
    expression (e.g. a bucketed measure). Emits one row:
    (n, df_degrees, chi2) with chi2 computed from the contingency table
    against independence expectations.

    Determinism: observed counts are integers; expected = row_total *
    col_total / n evaluates in DOUBLE with one fixed expression order, and
    the chi2 sum accumulates in integer NANOS of each cell's contribution
    (floor(x*1e9 + 0.5)) so parallel summation order cannot change the
    result — the dsum discipline applied to a statistic.

    Scale shape: ONE groupBy(a, b) over the data (the contingency table —
    cells-sized, not data-sized), then broadcast-sized row/column margins
    joined back to cells. Nothing data-sized after the first aggregate.
    """
    bcol = F.col(b) if isinstance(b, str) else b
    cells = (df.select(F.col(a).alias("ka"), bcol.alias("kb"))
               .groupBy("ka", "kb").agg(F.count(F.lit(1)).alias("o")))
    rows_m = cells.groupBy("ka").agg(F.sum("o").alias("ra"))
    cols_m = cells.groupBy("kb").agg(F.sum("o").alias("cb"))
    tot = cells.agg(F.sum("o").alias("n"),
                    F.count_distinct("ka").alias("nr"),
                    F.count_distinct("kb").alias("nc"))
    joined = (cells.join(F.broadcast(rows_m), "ka")
                   .join(F.broadcast(cols_m), "kb")
                   .crossJoin(F.broadcast(tot)))
    # plain multiply, NOT pow(x, 2): POWER may route through exp/log in
    # some engines and drift a ULP — d*d is the same IEEE op everywhere
    dev = F.col("o") - F.col("ra") * F.col("cb") / F.col("n")
    contrib = dev * dev / (F.col("ra") * F.col("cb") / F.col("n"))
    return (joined
            .agg(F.max("n").alias("n"),
                 ((F.max("nr") - 1) * (F.max("nc") - 1)).alias("df_degrees"),
                 (F.sum(F.floor(contrib * F.lit(1e9) + F.lit(0.5))
                        .cast("long")) / F.lit(1e9)).alias("chi2")))


def equi_depth_histogram(df: DataFrame, value: str, n_buckets: int = 10,
                         keys: Sequence[str] = (),
                         tiebreakers: Sequence[str] = ()) -> DataFrame:
    """Equal-DEPTH histogram (quantile buckets): boundaries are the
    nearest-rank k/n_buckets percentiles, so every bucket holds ~the same
    row count — the complement of a16's equal-width binning and the shape
    optimizers use for selectivity estimation on skewed columns (a
    uniform-width histogram of a zipfian column wastes most buckets on
    the tail). Emits (keys..., bucket, lo, hi, n_rows): lo/hi are ACTUAL
    data values (nearest-rank — no float interpolation, bit-identical
    across engines); bucket membership is by rank, so duplicate-heavy
    boundaries resolve deterministically.

    Cost: same single shuffle + per-group sort as exact_percentiles (the
    ntile window rides the same ordering), with the same documented scale
    stance: exact answers for grouped domains; at corpus scale switch to
    percentile_approx boundaries.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(value, *tiebreakers)
    ranked = df.select(*keys, value, *tiebreakers).select(
        *keys, F.col(value),
        F.ntile(n_buckets).over(w).alias("bucket"))
    return (ranked.groupBy(*keys, "bucket")
                  .agg(F.min(value).alias("lo"),
                       F.max(value).alias("hi"),
                       F.count(F.lit(1)).alias("n_rows")))
