"""Aggregation operators (SURVEY.md §2.D).

All pure-DataFrame: partial (map-side) aggregation + a single hash shuffle on
the grouping keys, finished by whole-stage-codegen'd HashAggregate — at 100 TB
the only scale axis is the shuffle on the group keys, which AQE coalesces /
skew-splits at runtime. No Python touches the hot path.

Oracle-parity notes (SURVEY.md §5 hazard list):
* DuckDB SUM(BIGINT/INT) returns HUGEINT/BIGINT — every integer-sum oracle
  casts to the Spark result type explicitly.
* double aggregates are rounded on BOTH sides to keep the value hash
  independent of summation order.
* Spark ``skewness``/``kurtosis`` are population moments (g1, g2-3); DuckDB's
  are sample-corrected, so the oracle re-expresses Spark's definition from raw
  moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "agg_groupby",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
      ROUND(AVG(l_discount), 4)                                   AS avg_disc,
      COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query.

    Plan shape: parquet scan (ReadSchema pruned to 7 columns, shipdate filter
    pushed to row groups) -> partial HashAggregate -> shuffle(2-key) -> final
    HashAggregate -> sort. One shuffle total; cardinality after partial agg is
    ~6 rows per task regardless of input scale.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_global",
    oracle="""
    SELECT
      COUNT(*)                                  AS n_rows,
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      ROUND(SUM(l_extendedprice), 2)            AS total_price,
      ROUND(AVG(l_discount), 6)                 AS avg_discount,
      ROUND(MIN(l_quantity), 2)                 AS min_qty,
      ROUND(MAX(l_quantity), 2)                 AS max_qty
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
        )
        .filter(F.col("n_orders") >= 12)
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT
      l_returnflag,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


@register("agg_approx_distinct")  # rows-only: HLL estimate is Spark-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for distinct
    counts: one pass, fixed memory per group, no distinct-expand shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


@register(
    "agg_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             AVG(l_quantity) AS mu,
             AVG(l_quantity * l_quantity) AS m2r,
             AVG(l_quantity * l_quantity * l_quantity) AS m3r,
             AVG(l_quantity * l_quantity * l_quantity * l_quantity) AS m4r
      FROM lineitem GROUP BY l_returnflag
    ), s AS (
      SELECT l_returnflag,
             STDDEV_SAMP(l_quantity) AS sd,
             VAR_SAMP(l_quantity)    AS vr,
             CORR(l_extendedprice, l_quantity) AS pcorr,
             COVAR_SAMP(l_extendedprice, l_quantity) AS pcov
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT m.l_returnflag,
           ROUND(s.sd, 4) AS sd_qty,
           ROUND(s.vr, 4) AS var_qty,
           ROUND(s.pcorr, 6) AS corr_price_qty,
           ROUND(s.pcov, 2) AS covar_price_qty,
           ROUND((m.m3r - 3*m.mu*m.m2r + 2*m.mu*m.mu*m.mu)
                 / POW(m.m2r - m.mu*m.mu, 1.5), 6) AS skew_qty,
           ROUND((m.m4r - 4*m.mu*m.m3r + 6*m.mu*m.mu*m.m2r - 3*POW(m.mu,4))
                 / POW(m.m2r - m.mu*m.mu, 2) - 3, 6) AS kurt_qty
    FROM m JOIN s USING (l_returnflag)
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Spark's skewness/kurtosis are population
    moments (g1 and excess g2); the oracle reconstructs the same definition
    from raw moments since DuckDB's built-ins are sample-corrected."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_price_qty"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT
      l_linestatus,
      ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
      ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
      ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_linestatus
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-7 percentiles (linear interpolation, same as DuckDB
    ``quantile_cont``) via a distinct-value histogram + cumulative-count
    window instead of Spark's ``percentile()`` aggregate.

    Why not ``percentile()``: its aggregation buffer holds every distinct
    value per group in an in-memory hash map that cannot spill — an OOM at
    100 TB group sizes. This shape pre-aggregates to (group, value, cnt)
    with map-side partial aggregation (shuffle volume ∝ distinct values,
    bounded by the 2-decimal price domain, not row count), then finds the
    bracketing ranks with a cumulative sum inside a WindowExec, which sorts
    externally and spills to disk. The final groupBy reduces each group to
    one row. Scale ceiling: one window partition per group — fine for
    bounded-domain values; for unbounded doubles, pre-bucket coarsely first
    (docs/SCALE.md §5). Scale path for one-pass pipelines stays
    ``approx_percentile`` (agg_approx_percentile below)."""
    li = load(spark, sf_dir, "lineitem")
    g, v = "l_linestatus", "l_extendedprice"
    hist = li.groupBy(g, v).agg(F.count(F.lit(1)).alias("cnt"))
    w_run = Window.partitionBy(g).orderBy(v).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(g)
    d = hist.select(
        g,
        v,
        "cnt",
        F.sum("cnt").over(w_run).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    ).withColumn("prev", F.col("cum") - F.col("cnt"))

    def pct(p: float, name: str):
        # 0-based target rank h = (n-1)*p; the row holding rank k is the one
        # with prev <= k < cum. lo/hi bracket h; interpolate exactly as
        # percentile()/quantile_cont do.
        h = (F.col("n") - 1) * F.lit(p)
        k0, k1 = F.floor(h), F.ceil(h)
        lo = F.max(F.when((F.col("prev") <= k0) & (k0 < F.col("cum")), F.col(v)))
        hi = F.max(F.when((F.col("prev") <= k1) & (k1 < F.col("cum")), F.col(v)))
        hh = (F.first("n") - 1) * F.lit(p)
        return F.round(lo + (hh - F.floor(hh)) * (hi - lo), 4).alias(name)

    return d.groupBy(g).agg(
        pct(0.5, "p50_price"), pct(0.9, "p90_price"), pct(0.99, "p99_price")
    )


@register("agg_approx_percentile")  # rows-only: sketch result is Spark-specific
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the fixed-memory 100 TB path for quantiles.
    The sketch array is unpacked into scalar columns: even rows-only results
    pass through the driver's pandas canonicalizer, which cannot hash
    array-typed cells."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(F.expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").alias("p"))
        .select(
            "l_linestatus",
            F.col("p")[0].alias("ap50_price"),
            F.col("p")[1].alias("ap90_price"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(GROUPING(l_returnflag) AS BIGINT) * 2
             + CAST(GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("f2s_lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM f2s_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_collect",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS names,
           array_to_string(list_sort(list(DISTINCT n_nationkey)), '|') AS keys
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set made deterministic via sort_array, then
    rendered to a '|'-joined string: the external driver canonicalizes
    results via a pandas sort whose factorize step cannot hash
    ``numpy.ndarray`` cells, so every *registered* output column must be
    scalar. (Array-native collect stays available via ``__wrapped__``-style
    composition in pytest coverage.)"""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("names"),
        F.concat_ws(
            "|",
            F.transform(F.sort_array(F.collect_set("n_nationkey")), lambda x: x.cast("string")),
        ).alias("keys"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
      ROUND(COALESCE(SUM(CASE WHEN event_type = 'click'    THEN value END), 0), 4) AS click,
      ROUND(COALESCE(SUM(CASE WHEN event_type = 'error'    THEN value END), 0), 4) AS error,
      ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0), 4) AS purchase,
      ROUND(COALESCE(SUM(CASE WHEN event_type = 'signup'   THEN value END), 0), 4) AS signup,
      ROUND(COALESCE(SUM(CASE WHEN event_type = 'view'     THEN value END), 0), 4) AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — at scale, always pass the value
    list so Spark skips the extra distinct-values job."""
    ev = load(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    piv = ev.groupBy("user_id").pivot("event_type", kinds).agg(F.sum("value"))
    return piv.select(
        "user_id",
        *[F.round(F.coalesce(F.col(k), F.lit(0.0)), 4).alias(k) for k in kinds],
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT
      l_returnflag,
      ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS rev_highdisc,
      COUNT(*) FILTER (WHERE l_quantity >= 25)                        AS n_bulk,
      ROUND(SUM(CASE WHEN l_tax = 0 THEN l_extendedprice ELSE 0 END), 2) AS rev_notax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 2).alias(
            "rev_highdisc"
        ),
        F.count(F.when(F.col("l_quantity") >= 25, F.lit(1))).alias("n_bulk"),
        F.round(
            F.sum(F.when(F.col("l_tax") == 0, F.col("l_extendedprice")).otherwise(F.lit(0.0))), 2
        ).alias("rev_notax"),
    )


# ---------------------------------------------------------------------------
# Deterministic cross-engine HyperLogLog (round 6)
# ---------------------------------------------------------------------------
_HLL_P = 9                 # 2^9 = 512 registers
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P       # tail bits of the 60-bit md5 hash
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)  # Flajolet et al. 2007, m>=128


def _floor_log2_sql(v: str, bits: int) -> str:
    """Exact floor(log2(v)) for 0 < v < 2^bits via binary-search CASEs —
    integer comparisons only, so both engines agree bit-for-bit (a float
    log2 could misround at power-of-two boundaries)."""
    # build nested: repeatedly test the high half
    def build(lo_shift: int, width: int, prefix: str) -> str:
        if width == 1:
            return str(lo_shift)
        half = width // 2
        upper = width - half
        return (
            f"(CASE WHEN {prefix} >= {1 << (lo_shift + half)} THEN "
            + build(lo_shift + half, upper, prefix)
            + " ELSE "
            + build(lo_shift, half, prefix)
            + " END)"
        )

    return build(0, bits, v)


def _floor_log2_col(v, bits: int):
    """Spark Column twin of :func:`_floor_log2_sql` (same comparison tree)."""

    def build(lo_shift: int, width: int):
        if width == 1:
            return F.lit(lo_shift)
        half = width // 2
        upper = width - half
        return F.when(v >= (1 << (lo_shift + half)), build(lo_shift + half, upper)).otherwise(
            build(lo_shift, half)
        )

    return build(0, bits)


@register(
    "agg_hll_deterministic",
    oracle=f"""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM orders
    ),
    parts AS (
      SELECT hv >> {_HLL_W} AS bucket, hv & {(1 << _HLL_W) - 1} AS tail FROM h
    ),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN tail = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W} - {_floor_log2_sql('tail', _HLL_W)} END) AS m
      FROM parts GROUP BY bucket
    ),
    full_regs AS (
      SELECT g.bucket, COALESCE(r.m, 0) AS m
      FROM (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS bucket) g
      LEFT JOIN regs r USING (bucket)
    ),
    est AS (
      SELECT {_HLL_ALPHA!r}e0 * {_HLL_M}e0 * {_HLL_M}e0 / SUM(power(2.0, -m))
               AS e_raw,
             CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS zeros
      FROM full_regs
    )
    SELECT CAST(ROUND(CASE WHEN e_raw <= 2.5e0 * {_HLL_M} AND zeros > 0
                THEN {_HLL_M}e0 * ln({_HLL_M}e0 / zeros) ELSE e_raw END)
                AS BIGINT) AS hll_estimate,
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
             AS true_distinct
    FROM est
    """,
)
def agg_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch built AS a DataFrame with an
    engine-reproducible hash — the deterministic sibling of the rows-only
    `agg_approx_distinct` (whose Spark-native HLL++ registers cannot be
    reproduced elsewhere). Flajolet et al. 2007: bucket = top {_HLL_P}
    bits of the 60-bit md5 hash, register = max leading-zero rank of the
    {_HLL_W}-bit tail, estimate = alpha_m * m^2 / sum(2^-reg) with the
    small-range linear-counting correction. The rank uses an exact
    integer binary-search tree, NOT float log2 (which may misround at
    power-of-two boundaries), so registers are bit-identical across
    engines; the output also carries the exact distinct for direct error
    inspection (relative error bound asserted in tests, ~1.04/sqrt(512)
    ≈ 4.6% expected).

    Scale: registers are a {_HLL_M}-row groupBy (partial-agg'd map-side,
    like the CMS sketch) and the estimate is a 1-row fold — constant
    state regardless of input size, and the register table is mergeable
    across partitions/days exactly like production HLL pipelines."""
    o = load(spark, sf_dir, "orders")
    from .llm_text import _h64

    h = o.select(_h64(F.col("o_custkey").cast("string")).alias("hv"))
    parts = h.select(
        F.shiftright("hv", _HLL_W).alias("bucket"),
        F.col("hv").bitwiseAND(F.lit((1 << _HLL_W) - 1)).alias("tail"),
    )
    rank = F.when(F.col("tail") == 0, F.lit(_HLL_W + 1)).otherwise(
        _HLL_W - _floor_log2_col(F.col("tail"), _HLL_W)
    )
    regs = parts.groupBy("bucket").agg(F.max(rank).alias("m"))
    grid = spark.range(_HLL_M).select(F.col("id").alias("bucket"))
    full_regs = grid.join(regs, "bucket", "left").select(
        F.coalesce(F.col("m"), F.lit(0)).alias("m")
    )
    est = full_regs.agg(
        (
            F.lit(_HLL_ALPHA * _HLL_M * _HLL_M)
            / F.sum(F.pow(F.lit(2.0), -F.col("m")))
        ).alias("e_raw"),
        F.sum((F.col("m") == 0).cast("int")).cast("double").alias("zeros"),
    )
    corrected = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("zeros") > 0),
        _HLL_M * F.log(_HLL_M / F.col("zeros")),
    ).otherwise(F.col("e_raw"))
    truth = o.agg(F.countDistinct("o_custkey").cast("long").alias("true_distinct"))
    return (
        est.select(F.round(corrected).cast("long").alias("hll_estimate"))
        .crossJoin(F.broadcast(truth))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch set intersection (round 7)
# ---------------------------------------------------------------------------
_KMV_K = 64
_KMV_SCALE = 1152921504606846976  # 2^60: md5 60-bit hash space


@register(
    "agg_kmv_intersection",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type,
             user_id,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events
    ),
    sk AS (
      SELECT event_type, h
      FROM (SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
            FROM uh) t
      WHERE rk <= {_KMV_K}
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM uh) a
      JOIN (SELECT DISTINCT event_type FROM uh) b ON a.event_type < b.event_type
    ),
    un AS (
      SELECT type_a, type_b, h
      FROM (SELECT p.type_a, p.type_b, s.h,
                   ROW_NUMBER() OVER (PARTITION BY p.type_a, p.type_b
                                      ORDER BY s.h) AS rk
            FROM pairs p
            JOIN (SELECT DISTINCT event_type, h FROM sk) s
              ON s.event_type IN (p.type_a, p.type_b)
            -- the same hash may appear in both sketches; the union sketch
            -- is over DISTINCT hash values
            GROUP BY p.type_a, p.type_b, s.h) t
      WHERE rk <= {_KMV_K}
    ),
    stats AS (
      SELECT u.type_a, u.type_b,
             CAST(MAX(u.h) AS DOUBLE) AS hk,
             CAST(COUNT(*) AS DOUBLE) AS n_un,
             CAST(SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                           THEN 1 ELSE 0 END) AS DOUBLE) AS m
      FROM un u
      LEFT JOIN sk sa ON sa.event_type = u.type_a AND sa.h = u.h
      LEFT JOIN sk sb ON sb.event_type = u.type_b AND sb.h = u.h
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT p.type_a, p.type_b, CAST(COUNT(*) AS BIGINT) AS exact_inter
      FROM pairs p
      JOIN (SELECT DISTINCT event_type, user_id FROM uh) ua
        ON ua.event_type = p.type_a
      JOIN (SELECT DISTINCT event_type, user_id FROM uh) ub
        ON ub.event_type = p.type_b AND ub.user_id = ua.user_id
      GROUP BY 1, 2
    )
    SELECT s.type_a, s.type_b, e.exact_inter,
           ROUND(CASE WHEN s.n_un < {_KMV_K} THEN s.m / s.n_un
                      ELSE s.m / {_KMV_K} END, 4) AS est_jaccard,
           ROUND(CASE WHEN s.n_un < {_KMV_K} THEN s.m
                      ELSE (s.m / {_KMV_K})
                           * (({_KMV_K} - 1) * {_KMV_SCALE}.0 / s.hk)
                 END, 2) AS est_inter
    FROM stats s JOIN exact e
      ON e.type_a = s.type_a AND e.type_b = s.type_b
    """,
)
def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch intersection — the Theta-sketch
    audience-overlap estimate (Beyer et al. 2007; the mechanism behind
    DataSketches' set operations): each event type keeps its {_KMV_K}
    smallest md5 user hashes; the union sketch is the k smallest of the
    merged sets, the Jaccard estimate is the fraction of union-sketch
    hashes present in BOTH input sketches, and intersection cardinality
    is J x (k-1)·2^60/h_k (the KMV union estimator). The exact
    intersection rides along so the driver hash pins estimator AND error.
    When the union sketch is NOT full (fewer than k distinct hashes), the
    sketch is exhaustive and the (k-1)/h_k extrapolation is invalid
    (biased low) — both engines then return m exactly and m/|union| for
    Jaccard (r8 ADVICE fix).

    Unlike `agg_hll_deterministic` (cardinality only), KMV sketches
    compose under set operations — the reason ad-tech overlap systems
    use them. Deterministic end to end: md5 hashing, integer rank
    windows, exact integer h_k.

    Scale: the only stage that sees event volume is the first DISTINCT
    (partial-agg); everything after operates on k x |types| rows. The
    per-type sketch is a WindowGroupLimit (top-k by hash per type), i.e.
    each partition forwards at most k rows. The exact-intersection join
    is the one quadratic-ish piece and exists purely as the oracle's
    error pin — a production sketch pipeline drops it."""
    ev = load(spark, sf_dir, "events")
    uh = ev.select(
        "event_type",
        "user_id",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    sk = (
        uh.select("event_type", "h")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .select("event_type", "h")
    )
    types = uh.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    merged = (
        pairs.join(
            F.broadcast(sk).alias("s"),
            (F.col("s.event_type") == F.col("type_a"))
            | (F.col("s.event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .select("type_a", "type_b", "h")
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    un = (
        merged.withColumn("rk", F.row_number().over(wu))
        .filter(F.col("rk") <= _KMV_K)
        .select("type_a", "type_b", "h")
    )
    sa = sk.select(F.col("event_type").alias("type_a"), F.col("h").alias("ha"))
    sb = sk.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    stats = (
        un.join(F.broadcast(sa), (sa.type_a == un.type_a) & (sa.ha == un.h), "left")
        .join(F.broadcast(sb), (sb.type_b == un.type_b) & (sb.hb == un.h), "left")
        .groupBy(un.type_a, un.type_b)
        .agg(
            F.max("h").cast("double").alias("hk"),
            F.count(F.lit(1)).cast("double").alias("n_un"),
            F.sum(
                (F.col("ha").isNotNull() & F.col("hb").isNotNull()).cast("int")
            )
            .cast("double")
            .alias("m"),
        )
    )
    ua = uh.select(F.col("event_type").alias("type_a"), "user_id")
    ub = uh.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    est_union = (_KMV_K - 1) * float(_KMV_SCALE) / F.col("hk")
    small = F.col("n_un") < _KMV_K  # union sketch NOT full -> it is exhaustive,
    # so the (k-1)/h_k extrapolation is invalid (biased low); the sketch holds
    # EVERY distinct hash of the union and m is the exact common-hash count.
    return stats.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_inter",
        F.round(
            F.when(small, F.col("m") / F.col("n_un")).otherwise(
                F.col("m") / _KMV_K
            ),
            4,
        ).alias("est_jaccard"),
        F.round(
            F.when(small, F.col("m")).otherwise((F.col("m") / _KMV_K) * est_union),
            2,
        ).alias("est_inter"),
    )


# ---------------------------------------------------------------------------
# Weighted median / weighted percentiles (round 8)
# ---------------------------------------------------------------------------


@register(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS x, l_quantity AS wt
      FROM lineitem
    ),
    c AS (
      SELECT l_returnflag, x, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY x, wt ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w
    ),
    hits AS (
      SELECT l_returnflag, q.q,
             MIN(x) AS wq
      FROM c CROSS JOIN (VALUES (0.25), (0.5), (0.75)) AS q(q)
      WHERE cw >= q.q * tw
      GROUP BY 1, 2
    )
    SELECT l_returnflag,
           MAX(CASE WHEN q = 0.25 THEN wq END) AS wp25,
           MAX(CASE WHEN q = 0.5 THEN wq END) AS wmedian,
           MAX(CASE WHEN q = 0.75 THEN wq END) AS wp75
    FROM hits GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentiles (p25/p50/p75 of price weighted by quantity) —
    'the price level below which half the UNITS ship', which no unweighted
    percentile answers when order sizes vary (the inventory/GMV analog of
    income-weighted medians in economics). Neither engine has a native
    weighted quantile, so both run the defining computation: cumulative
    weight along the value order, first value whose cumulative weight
    reaches q x total (the lower weighted-quantile convention, exact —
    no interpolation, so the hash pins actual data values).

    Plan: one window per group ordered by (value, weight) — the honest
    per-group sort; group count bounds parallelism exactly like
    `agg_percentile`'s exact path, and the same escape applies at
    unbounded scale (bucket values first, cumulative-sum the O(buckets)
    histogram — the `agg_ks_test` ECDF shape). Ties in x are ordered by
    weight so both engines accumulate identically."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("x", "wt")
    wall = Window.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("wt"),
    ).select(
        "l_returnflag",
        "x",
        "wt",
        F.sum("wt").over(w).alias("cw"),
        F.sum("wt").over(wall).alias("tw"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))).alias("q")
    )
    hits = (
        c.crossJoin(F.broadcast(qs))
        .filter(F.col("cw") >= F.col("q") * F.col("tw"))
        .groupBy("l_returnflag", "q")
        .agg(F.min("x").alias("wq"))
    )
    return hits.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("q") == 0.25, F.col("wq"))).alias("wp25"),
        F.max(F.when(F.col("q") == 0.5, F.col("wq"))).alias("wmedian"),
        F.max(F.when(F.col("q") == 0.75, F.col("wq"))).alias("wp75"),
    )


# ---------------------------------------------------------------------------
# Median-of-means robust estimator (round 8)
# ---------------------------------------------------------------------------
_MOM_K = 16  # buckets (heavy-tail robustness ~ exp(-k/8) failure bound)


@register(
    "agg_median_of_means",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag,
             CAST(concat('0x', substr(md5(CAST(l_orderkey * 10 + l_linenumber
                                               AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_MOM_K} AS bucket,
             l_extendedprice AS x
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag, bucket, AVG(x) AS mu,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           ROUND(quantile_cont(mu, 0.5), 4) AS median_of_means,
           ROUND(SUM(mu * n) / SUM(n), 4) AS plain_mean
    FROM m GROUP BY l_returnflag
    """,
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means — the sub-Gaussian robust mean estimator
    (Nemirovsky-Yudin / Alon-Matias-Szegedy; the modern heavy-tail
    default in robust statistics): hash rows into k={_MOM_K} buckets, take
    each bucket's mean, report the MEDIAN of the bucket means next to the
    plain mean. A single adversarial outlier corrupts only its bucket,
    moving the estimate by at most one order statistic — while the plain
    mean moves unboundedly. The per-group robust sibling of
    `agg_bootstrap_ci` (which resamples) and `anomaly_mad` (which
    screens).

    Plan: the md5 bucket draw is the repo's deterministic hash-split
    convention (`ml_kfold_linreg`'s row key); one partial-agg groupBy to
    O(groups x k) bucket means, then an O(k)-row exact median per group —
    the heavy-tail estimator costs ONE extra tiny aggregate over the
    plain mean. Medians interpolate (quantile_cont) in both engines; the
    bucket means' accumulation-order ulps are absorbed by ROUND(·, 4)."""
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        (
            F.conv(
                F.substring(
                    F.md5(
                        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast(
                            "string"
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _MOM_K
        ).alias("bucket"),
        F.col("l_extendedprice").alias("x"),
    )
    m = b.groupBy("l_returnflag", "bucket").agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return m.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n").cast("long").alias("n_rows"),
        F.round(F.percentile("mu", F.lit(0.5)), 4).alias("median_of_means"),
        F.round(F.sum(F.col("mu") * F.col("n")) / F.sum("n"), 4).alias(
            "plain_mean"
        ),
    )


# ---------------------------------------------------------------------------
# Decimal log-bucket quantile sketch (round 8, continuation)
# ---------------------------------------------------------------------------
_LSK_QS = (0.5, 0.9, 0.99)


@register(
    "agg_logsketch_quantiles",
    oracle=f"""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c,
             l_extendedprice AS x
      FROM lineitem WHERE l_extendedprice > 0
    ),
    b AS (
      SELECT l_returnflag,
             LENGTH(CAST(c AS VARCHAR)) AS d,
             CAST(substr(CAST(c AS VARCHAR), 1, 2) AS BIGINT) AS lead2,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cents GROUP BY 1, 2, 3
    ),
    cum AS (
      SELECT l_returnflag, d, lead2, cnt,
             SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY d, lead2
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cm,
             SUM(cnt) OVER (PARTITION BY l_returnflag) AS tot,
             (lead2 + 0.5) * POW(10.0, d - 2) / 100.0 AS est
      FROM b
    ),
    sk AS (
      SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS n,
             {', '.join(f"MIN(CASE WHEN cm >= {q} * tot THEN est END) AS q{int(q * 100)}_est" for q in _LSK_QS)}
      FROM cum GROUP BY l_returnflag
    ),
    ex AS (
      SELECT l_returnflag,
             {', '.join(f"quantile_cont(x, {q}) AS q{int(q * 100)}_exact" for q in _LSK_QS)}
      FROM cents GROUP BY l_returnflag
    )
    SELECT sk.l_returnflag, sk.n,
           {', '.join(f"sk.q{int(q * 100)}_est, ROUND(ex.q{int(q * 100)}_exact, 4) AS q{int(q * 100)}_exact, ROUND(ABS(sk.q{int(q * 100)}_est - ex.q{int(q * 100)}_exact) / ex.q{int(q * 100)}_exact, 4) AS q{int(q * 100)}_relerr" for q in _LSK_QS)}
    FROM sk JOIN ex USING (l_returnflag)
    """,
)
def agg_logsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-bucketed quantile sketch with a bounded-relative-error
    guarantee — the DDSketch idea (Masson et al., VLDB 2019: quantiles
    from logarithmic buckets, mergeable, fixed memory) in an
    integer-exact decimal form: prices collapse to cents, each value
    lands in the bucket keyed by (digit count, two leading digits), and
    a quantile estimate is the midpoint of the first bucket whose
    cumulative count crosses q*n. Two leading digits bound the relative
    error at 1/(2*10) = 5% (tighter for larger leads); the measured
    per-quantile error is reported NEXT TO the exact quantile, so the
    operator certifies its own guarantee. Unlike `agg_approx_percentile`
    (Spark-native GK sketch, rows-only), this sketch is deterministic
    and engine-identical, hence fully hash-oracled.

    Why it matters at 100 TB: the bucket map is the ONLY state —
    O(decades x 90) integer cells per group, mergeable across any
    partitioning (the same reason DDSketch replaced t-digest in
    high-cardinality metrics pipelines); the exact quantile it is
    audited against costs a full sort at scale, the sketch one
    partial-agg pass. Bucket keys are pure integer/string math (ROUND
    to cents is exact for 2-decimal fixture prices), so libm never
    decides membership — the module's binning convention."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
        F.col("l_extendedprice").alias("x"),
    )
    s = F.col("c").cast("string")
    b = cents.groupBy(
        "l_returnflag",
        F.length(s).alias("d"),
        F.substring(s, 1, 2).cast("long").alias("lead2"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("d", "lead2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = b.select(
        "l_returnflag",
        F.sum("cnt").over(wcum).alias("cm"),
        F.sum("cnt").over(wall).alias("tot"),
        (
            (F.col("lead2") + 0.5) * F.pow(F.lit(10.0), F.col("d") - 2) / 100.0
        ).alias("est"),
    )
    sk = cum.groupBy("l_returnflag").agg(
        F.max("tot").cast("long").alias("n"),
        *[
            F.min(
                F.when(F.col("cm") >= F.lit(q) * F.col("tot"), F.col("est"))
            ).alias(f"q{int(q * 100)}_est")
            for q in _LSK_QS
        ],
    )
    ex = cents.groupBy("l_returnflag").agg(
        *[
            F.percentile("x", F.lit(q)).alias(f"q{int(q * 100)}_exact_raw")
            for q in _LSK_QS
        ]
    )
    out = sk.join(ex, "l_returnflag")
    cols = [F.col("l_returnflag"), F.col("n")]
    for q in _LSK_QS:
        e_, x_ = f"q{int(q * 100)}_est", f"q{int(q * 100)}_exact"
        cols += [
            F.col(e_),
            F.round(F.col(x_ + "_raw"), 4).alias(x_),
            F.round(
                F.abs(F.col(e_) - F.col(x_ + "_raw")) / F.col(x_ + "_raw"), 4
            ).alias(f"q{int(q * 100)}_relerr"),
        ]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# Trimmed and winsorized means (round 8, continuation)
# ---------------------------------------------------------------------------
_TRIM_LO, _TRIM_HI = 0.1, 0.9  # 10% two-sided trim


@register(
    "agg_trimmed_mean",
    oracle=f"""
    WITH q AS (
      SELECT l_linestatus,
             quantile_cont(l_extendedprice, {_TRIM_LO}) AS lo,
             quantile_cont(l_extendedprice, {_TRIM_HI}) AS hi
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l.l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l.l_extendedprice BETWEEN q.lo AND q.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(AVG(l.l_extendedprice), 4) AS plain_mean,
           ROUND(AVG(CASE WHEN l.l_extendedprice BETWEEN q.lo AND q.hi
                          THEN l.l_extendedprice END), 4) AS trimmed_mean,
           ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, q.lo), q.hi)), 4)
             AS winsorized_mean
    FROM lineitem l JOIN q USING (l_linestatus)
    GROUP BY l.l_linestatus
    """,
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed and winsorized means per group next to the plain mean
    — the classical robust location estimators (Tukey; trimming DROPS
    the tails, winsorizing CLAMPS them to the p10/p90 fences), closing
    the robust-location family: `agg_median_of_means` (hash buckets,
    adversary-bounded), `anomaly_mad` (median-based screening),
    `etl_winsorize` (the column TRANSFORM this op reports the moments
    of). On the fixture's uniform prices all three agree closely; on
    heavy-tailed production data they fan out — the spread IS the
    diagnostic.

    Plan: one exact-percentile aggregate to O(groups) fences (at 100 TB
    the fences come from `agg_logsketch_quantiles`' mergeable sketch
    instead — same downstream plan), broadcast back over the scan, one
    conditional aggregate. BETWEEN is inclusive in both engines;
    percentile/quantile_cont interpolate identically (the
    `agg_percentile` pairing); ROUND 1e-4."""
    li = load(spark, sf_dir, "lineitem")
    q = li.groupBy("l_linestatus").agg(
        F.percentile("l_extendedprice", F.lit(_TRIM_LO)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(_TRIM_HI)).alias("hi"),
    )
    x = F.col("l_extendedprice")
    inb = x.between(F.col("lo"), F.col("hi"))
    return (
        li.join(F.broadcast(q), "l_linestatus")
        .groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(inb, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.round(F.avg(x), 4).alias("plain_mean"),
            F.round(F.avg(F.when(inb, x)), 4).alias("trimmed_mean"),
            F.round(
                F.avg(F.least(F.greatest(x, F.col("lo")), F.col("hi"))), 4
            ).alias("winsorized_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom-filter false-positive-rate metrology (round 9)
# ---------------------------------------------------------------------------
_BF_BITS = 16384
_BF_HASHES = 4
_BF_PROBE_OFFSET = 1_000_000_000  # probe keys guaranteed disjoint from members


@register(
    "agg_bloom_fpp",
    oracle=f"""
    WITH members AS (SELECT DISTINCT o_orderkey AS key FROM orders),
    bits AS (
      SELECT DISTINCT CAST(concat('0x', substr(md5(CAST(m.key * {_BF_HASHES}
                 + h.h AS VARCHAR)), 1, 15)) AS BIGINT) % {_BF_BITS} AS pos
      FROM members m
      CROSS JOIN (SELECT unnest(generate_series(0, {_BF_HASHES - 1})) AS h) h
    ),
    probes AS (
      SELECT key + {_BF_PROBE_OFFSET} AS pkey FROM members
    ),
    ppos AS (
      SELECT p.pkey, CAST(concat('0x', substr(md5(CAST(p.pkey * {_BF_HASHES}
                 + h.h AS VARCHAR)), 1, 15)) AS BIGINT) % {_BF_BITS} AS pos
      FROM probes p
      CROSS JOIN (SELECT unnest(generate_series(0, {_BF_HASHES - 1})) AS h) h
    ),
    hits AS (
      SELECT pkey, CAST(COUNT(DISTINCT CASE WHEN b.pos IS NOT NULL
                                            THEN pp.pos END) AS BIGINT) AS nhit,
             CAST(COUNT(DISTINCT pp.pos) AS BIGINT) AS npos
      FROM ppos pp LEFT JOIN bits b ON b.pos = pp.pos
      GROUP BY pkey
    ),
    agg AS (
      SELECT CAST((SELECT COUNT(*) FROM members) AS BIGINT) AS n_members,
             CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
             CAST(COUNT(*) AS BIGINT) AS n_probes,
             CAST(SUM(CASE WHEN nhit = npos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos
      FROM hits
    )
    SELECT n_members, n_bits_set, n_probes, n_false_pos,
           ROUND(n_false_pos * 1.0 / n_probes, 6) AS measured_fpp,
           ROUND(pow(1.0 - exp(-{_BF_HASHES}.0 * n_members / {_BF_BITS}),
                     {_BF_HASHES}), 6) AS theoretical_fpp
    FROM agg
    """,
)
def agg_bloom_fpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter metrology: build an m={_BF_BITS}-bit, k={_BF_HASHES}-
    hash filter over the order keys as a RELATION of set bit positions,
    probe it with an equal-sized disjoint key set, and report the
    measured false-positive rate next to the textbook
    (1−e^(−kn/m))^k prediction — the sizing check run before shipping a
    bloom-pruned join (`join_bloom_filter` is the consumer; this is the
    calibration). A probe is a false positive iff ALL k of its positions
    are set.

    Scale: positions explode k-fold then collapse DISTINCT (the bitmap
    relation is at most m rows regardless of input); the probe check is
    one LEFT join on the integer position + a per-probe count — linear,
    and at 100 TB the m-row bit set broadcasts. md5 position streams are
    engine-identical."""
    members = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key")
    ).distinct()
    hs = spark.range(_BF_HASHES).select(F.col("id").cast("long").alias("h"))

    def positions(keycol):
        return (
            F.conv(
                F.substring(
                    F.md5((keycol * _BF_HASHES + F.col("h")).cast("string")), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % _BF_BITS
        )

    bits = (
        members.crossJoin(F.broadcast(hs))
        .select(positions(F.col("key")).alias("pos"))
        .distinct()
    )
    ppos = (
        members.select((F.col("key") + _BF_PROBE_OFFSET).alias("pkey"))
        .crossJoin(F.broadcast(hs))
        .select("pkey", positions(F.col("pkey")).alias("pos"))
    )
    hits = (
        ppos.join(F.broadcast(bits.withColumnRenamed("pos", "bpos")),
                  F.col("bpos") == F.col("pos"), "left")
        .groupBy("pkey")
        .agg(
            F.countDistinct(F.when(F.col("bpos").isNotNull(), F.col("pos")))
            .cast("long")
            .alias("nhit"),
            F.countDistinct("pos").cast("long").alias("npos"),
        )
    )
    counts = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("nhit") == F.col("npos"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )
    nm = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    nb = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    return (
        nm.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(counts))
        .select(
            "n_members",
            "n_bits_set",
            "n_probes",
            "n_false_pos",
            F.round(F.col("n_false_pos") * 1.0 / F.col("n_probes"), 6).alias(
                "measured_fpp"
            ),
            F.round(
                F.pow(
                    F.lit(1.0)
                    - F.exp(F.lit(-float(_BF_HASHES)) * F.col("n_members") / _BF_BITS),
                    F.lit(_BF_HASHES),
                ),
                6,
            ).alias("theoretical_fpp"),
        )
    )
