"""Statistical & time-series analytics operators (round 5).

Extends SURVEY.md §2's aggregate surface with the statistical queries an
analytics-engine user reaches for right after GROUP BY: grouped ordinary
least squares (``regr_*``), distribution shape (Shannon entropy + Gini),
robust outlier detection (median / MAD), and OHLC time-series downsampling
(the canonical "resample a tick stream to bars" operation).

All four are single declarative DataFrame plans built exclusively from
JVM-side aggregate expressions — every one compiles to a partial-agg
(map-side combine) followed by one hash-aggregate shuffle on a key whose
cardinality is tiny relative to the input (group count, type count,
type x window count), which is exactly the profile that scales linearly
to 100 TB: the shuffle moves O(groups) rows, not O(input).

Cross-engine notes: ``regr_slope/intercept/r2`` exist natively in both
Spark and DuckDB (same Welford-style definitions); medians interpolate
(quantile_cont semantics) in both; OHLC first/last use ``min_by/max_by``
(Spark) vs ``arg_min/arg_max`` (DuckDB) over the same scalar composite
ordering key, because DuckDB's arg_min cannot take a struct key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


# ---------------------------------------------------------------------------
# Grouped ordinary least squares
# ---------------------------------------------------------------------------
@register(
    "agg_linreg",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS avg_x,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 6) AS avg_y
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS: regression of extendedprice on quantity per returnflag
    using the SQL-standard ``regr_*`` aggregate family (Spark >= 3.4 has
    them natively, so the whole fit stays in whole-stage codegen — no
    Python, no collect). Scale: regr_* are algebraic aggregates (sums of
    x, y, x², xy), so the map side combines locally and the shuffle
    carries one 6-number state per group."""
    li = load(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("long").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
        F.round(F.regr_avgy(y, x), 6).alias("avg_y"),
    )


# ---------------------------------------------------------------------------
# Distribution shape: Shannon entropy + Gini impurity per group
# ---------------------------------------------------------------------------
@register(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS DOUBLE) AS n
      FROM documents GROUP BY source, lang
    ),
    t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY source)
    SELECT c.source,
           CAST(SUM(c.n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(-SUM((c.n / t.tot) * ln(c.n / t.tot)), 6) AS entropy_nats,
           ROUND(1 - SUM((c.n / t.tot) * (c.n / t.tot)), 6) AS gini
    FROM c JOIN t USING (source)
    GROUP BY c.source
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy (nats) and Gini impurity of the language
    distribution — the standard "how mixed is this slice" diagnostic for
    corpus curation (a source with near-zero entropy is monolingual; high
    Gini flags sources to language-balance before training).

    Plan: one groupBy(source, lang) count, then a groupBy(source) fold of
    p*ln(p) — two shuffles whose widths are |source x lang| and |source|.
    At 100 TB the first aggregate is the only one that sees data volume,
    and it partial-aggregates map-side; no window functions, so no
    single-partition sort anywhere."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("double").alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
            F.round(F.lit(1) - F.sum(p * p), 6).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outliers: median / MAD (modified z-score)
# ---------------------------------------------------------------------------
@register(
    "anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, ROUND(e.value, 2) AS value,
           ROUND(0.6745 * (e.value - m.med) / d.mad, 4) AS robust_z
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via the modified z-score
    0.6745*(x - median)/MAD > 3.5 (Iglewicz-Hoaglin) — unlike the
    mean/stddev z-score (``anomaly_zscore``), the median/MAD version does
    not let the outliers inflate their own threshold, which matters on
    heavy-tailed value distributions.

    Two exact-median aggregations (Spark ``percentile`` == DuckDB
    ``quantile_cont``: both interpolate), each producing an
    O(event_types)-row table that broadcasts back onto the fact scan.
    Exact percentile sorts within groups; at 100 TB swap stage one for
    ``approx_percentile`` (the sketch is mergeable) — the detection rule
    is already threshold-based, so sketch error only moves borderline
    points, and the broadcast-join shape is unchanged."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"))
    )
    rz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > 3.5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(rz, 4).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC downsampling (tick stream -> bars)
# ---------------------------------------------------------------------------
@register(
    "events_ohlc",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS bar_start,
           arg_min(value, CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) * 1000000
                          + event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, CAST(epoch_ms(CAST(ts AS TIMESTAMP)) AS BIGINT) * 1000000
                          + event_id) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           ROUND(SUM(value), 4) AS volume
    FROM events
    GROUP BY 1, 2
    """,
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: downsample the event stream to 15-minute
    open/high/low/close/volume bars per event type — the canonical
    time-series resample (ticks -> candles).

    Open/close use ``min_by``/``max_by`` over a composite ordering key
    (epoch-millis * 10^6 + event_id, which fits int64 and breaks
    within-millisecond ties deterministically on both engines — DuckDB's
    ``arg_min`` requires a scalar key, so the struct form is off the
    table). min_by/max_by are algebraic: the map side keeps one (key,
    value) candidate per group, so unlike the row_number-window
    formulation there is no per-partition sort and no WindowExec — one
    partial-agg shuffle of O(types x windows) rows total. That is the
    difference between "resample 100 TB of ticks" shuffling gigabytes
    versus shuffling the whole stream through a sort."""
    ev = load(spark, sf_dir, "events")
    okey = (F.unix_millis(F.col("ts")) * F.lit(1_000_000) + F.col("event_id")).alias("ok")
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", "15 minutes").start.alias("bar_start"),
        )
        .agg(
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_ticks"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA smoothing (bounded-window exponential decay)
# ---------------------------------------------------------------------------
@register(
    "events_ewma",
    oracle="""
    WITH r AS (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.event_id, a.event_type, ROUND(a.value, 2) AS value,
           ROUND(SUM(b.value * power(0.9, a.rn - b.rn))
                 / SUM(power(0.9, a.rn - b.rn)), 6) AS ewma
    FROM r a JOIN r b
      ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 19 AND a.rn
    GROUP BY a.event_id, a.event_type, a.value
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over the last 20 events per
    type (decay 0.9) — the standard smoothing pass before thresholding a
    noisy metric stream. Spark side: collect the bounded window frame as
    an ordered array and fold it with one weighted F.aggregate lambda —
    O(K) state per row, one shuffle+sort per partition key, NO self-join.
    The oracle reproduces the identical numbers with the textbook
    rn-offset self-join (a second formulation, which doubles as a
    cross-check of the window-frame semantics). At 100 TB the window form
    wins: the join form shuffles the fact table twice and its range
    predicate defeats pushdown; the frame form is one WindowExec whose
    state is K doubles."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    frame = F.collect_list("value").over(w)  # ordered oldest -> newest
    rev = F.reverse(frame)  # newest first: weight 0.9^j at offset j
    wsum = F.aggregate(
        F.zip_with(
            rev,
            F.transform(F.sequence(F.lit(0), F.size(rev) - 1), lambda j: F.pow(F.lit(0.9), j)),
            lambda x, wt: F.struct((x * wt).alias("xw"), wt.alias("w")),
        ),
        F.struct(F.lit(0.0).alias("xw"), F.lit(0.0).alias("w")),
        lambda acc, p: F.struct(
            (acc["xw"] + p["xw"]).alias("xw"), (acc["w"] + p["w"]).alias("w")
        ),
        lambda acc: acc["xw"] / acc["w"],
    )
    return ev.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.round(wsum, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# 2-D histogram (binned heatmap)
# ---------------------------------------------------------------------------
@register(
    "agg_histogram2d",
    oracle="""
    SELECT CAST(floor(l_quantity / 5) AS INT) AS bin_qty,
           CAST(floor(l_discount / 0.02) AS INT) AS bin_disc,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(l_extendedprice), 4) AS avg_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram: joint distribution of quantity x discount with a
    per-cell price average — the binned-heatmap aggregation behind every
    density plot and drill-down matrix. One partial-agg shuffle over
    O(cells) groups; bin indices are computed in the scan projection, so
    the exchange carries two ints per row."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 5).cast("int").alias("bin_qty"),
            F.floor(F.col("l_discount") / 0.02).cast("int").alias("bin_disc"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )
