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
over a (ts, event_id) STRUCT key on the Spark side, while the oracle
uses the equivalent double-row_number window formulation because
DuckDB's arg_min cannot take a struct key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import daily_value_series, load


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
    -- robust_z is floored to 1e-4 units, not ROUNDed: DuckDB's ROUND
    -- rounds 3.85224999...97 UP to 3.8523 (it evaluates the shortest
    -- decimal) where Spark/IEEE give 3.8522 — FLOOR on identical doubles
    -- is the operation both engines agree on (one such row at sf0.1)
    SELECT e.event_id, e.event_type, ROUND(e.value, 2) AS value,
           FLOOR(0.6745e0 * (e.value - m.med) / d.mad * 10000) / 10000
             AS robust_z
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE abs(0.6745e0 * (e.value - m.med) / d.mad) > 3.5
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
            # floor-to-1e-4: see the oracle comment (DuckDB ROUND diverges
            # at half boundaries; FLOOR is engine-exact)
            (F.floor(rz * 10000) / 10000).alias("robust_z"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC downsampling (tick stream -> bars)
# ---------------------------------------------------------------------------
@register(
    "events_ohlc",
    oracle="""
    WITH w AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS bar_start,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type, bar_start,
           MAX(CASE WHEN rf = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rl = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           ROUND(SUM(value), 4) AS volume
    FROM w
    GROUP BY 1, 2
    """,
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars: downsample the event stream to 15-minute
    open/high/low/close/volume bars per event type — the canonical
    time-series resample (ticks -> candles).

    Open/close use ``min_by``/``max_by`` over a STRUCT ordering key
    (ts, event_id) — lexicographic struct comparison gives exact
    first/last-by-time-with-id-tiebreak at ANY scale (an arithmetic
    composite key like millis*1e6+id would silently collide once ids
    pass 1e6 — the r5 review caught exactly that). min_by/max_by stay
    algebraic: the plan is a SortAggregate (struct ordering keys aren't
    hash-aggregable) whose map side still partial-aggregates — the
    shuffle carries ONE candidate per group, and the per-partition sort
    is by the low-cardinality grouping key, never a WindowExec over the
    raw tick stream (asserted in test_plans). (DuckDB's arg_min cannot
    take a struct key, so the ORACLE uses the equivalent
    double-row_number window formulation instead — two formulations,
    same semantics.)"""
    ev = load(spark, sf_dir, "events")
    okey = F.struct(F.col("ts"), F.col("event_id")).alias("ok")
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


# ---------------------------------------------------------------------------
# Rolling 7-day active users (sliding distinct-count)
# ---------------------------------------------------------------------------
@register(
    "events_rolling_active",
    oracle="""
    WITH days AS (
      SELECT DISTINCT event_type, user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ),
    contrib AS (
      SELECT event_type, user_id, d + CAST(o AS INTEGER) AS win_end
      FROM days, unnest(generate_series(0, 6)) AS t(o)
    )
    SELECT event_type, win_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users_7d
    FROM contrib GROUP BY event_type, win_end
    """,
)
def events_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per event type (the WAU/DAU
    family): each (type, user, day) contributes to the 7 windows ending on
    day..day+6, then one distinct-count per (type, window). Sliding
    distinct counts canNOT be window-framed (COUNT(DISTINCT) is not
    frame-able in either engine) — the contribute-then-aggregate explode
    is the standard distributed formulation, and its blow-up factor is the
    window length (7×), applied AFTER the (type,user,day) distinct
    collapses the raw event volume. At 100 TB the distinct pre-collapse
    is what keeps the explode bounded: days × users × types, independent
    of event count; beyond that, HLL sketches merge across windows."""
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "event_type",
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).distinct()
    contrib = days.select(
        "event_type",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "d",
    ).select(
        "event_type", "user_id", F.date_add(F.col("d"), F.col("o")).alias("win_end")
    )
    return contrib.groupBy("event_type", "win_end").agg(
        F.countDistinct("user_id").cast("long").alias("active_users_7d")
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation
# ---------------------------------------------------------------------------
def _rfm_label_sql(col: str, q: str, desc: bool) -> str:
    """DuckDB fragment: 1-4 quartile label from three cutoffs in list ``q``."""
    op = "<" if desc else ">"
    idx = (3, 2, 1) if desc else (1, 2, 3)
    cases = " + ".join(
        f"(CASE WHEN {col} {op} {q}[{i}] THEN 1 ELSE 0 END)" for i in idx
    )
    return f"CAST(1 + {cases} AS INT)"


@register(
    "orders_rfm",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                            DATE '2002-01-01') AS INTEGER) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    cuts AS (
      SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
             quantile_cont(frequency,    [0.25, 0.5, 0.75]) AS fq,
             quantile_cont(monetary,     [0.25, 0.5, 0.75]) AS mq
      FROM rfm
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           {_rfm_label_sql('recency_days', 'rq', False)} || '-' ||
           {_rfm_label_sql('frequency', 'fq', True)} || '-' ||
           {_rfm_label_sql('monetary', 'mq', True)} AS rfm_segment
    FROM rfm, cuts
    """,
)
def orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days before the 2002-01-01 reference) /
    frequency / monetary per customer, labeled 1-4 against exact quartile
    CUTOFFS (ties share a label) and composed into the classic 'r-f-m'
    segment — the standard customer-analytics scoring every warehouse runs.

    Scale (the r5-verdict rewrite): the r5 version ran three global
    single-partition ntile sorts over O(customers); this one computes the
    nine cutoffs with ONE exact-percentile aggregate (partial-merged
    value->count maps, no sort) and broadcasts the 1-row cutoff frame back
    — label assignment is a narrow codegen'd projection, so nothing about
    the plan degrades at billions of customers (swap F.percentile for
    F.approx_percentile at that scale if monetary cardinality bites).
    Cutoff determinism across engines: interpolation fractions are exact
    quarters and both engines evaluate lo + (hi-lo)*f on identical
    doubles, so the labels hash-match DuckDB's quantile_cont exactly."""
    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.max("o_orderdate").cast("date")
        ).cast("int").alias("recency_days"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    qs = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    cuts = rfm.agg(
        F.percentile("recency_days", qs).alias("rq"),
        F.percentile("frequency", qs).alias("fq"),
        F.percentile("monetary", qs).alias("mq"),
    )

    def label(col: str, q: str, desc: bool):
        cmp = (lambda i: F.col(col) < F.col(q)[i]) if desc else (
            lambda i: F.col(col) > F.col(q)[i]
        )
        order = (2, 1, 0) if desc else (0, 1, 2)
        lab = F.lit(1)
        for i in order:
            lab = lab + cmp(i).cast("int")
        return lab.cast("int").cast("string")

    return rfm.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.concat_ws(
            "-",
            label("recency_days", "rq", False),
            label("frequency", "fq", True),
            label("monetary", "mq", True),
        ).alias("rfm_segment"),
    )


# ---------------------------------------------------------------------------
# Market-basket pair lift
# ---------------------------------------------------------------------------
@register(
    "basket_lift",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS DOUBLE) AS n_orders FROM op),
    pc AS (SELECT p, CAST(COUNT(*) AS DOUBLE) AS c FROM op GROUP BY p),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n_both
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, n_both,
           ROUND(n_both * n.n_orders / (ca.c * cb.c), 6) AS lift
    FROM pairs
    JOIN pc ca ON ca.p = part_a
    JOIN pc cb ON cb.p = part_b
    CROSS JOIN n
    ORDER BY ROUND(n_both * n.n_orders / (ca.c * cb.c), 6) DESC,
             part_a, part_b
    LIMIT 40
    """,
)
def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: part pairs co-occurring in >= 3 orders,
    ranked by lift P(a,b)/(P(a)P(b)) — the co-purchase affinity behind
    every 'frequently bought together'. The min-support HAVING is the
    classic a-priori prune, applied where it matters: the pair explosion
    within an order is bounded by basket size (items per order), and the
    support filter runs inside the pair aggregate, before lift math.
    Order count and per-part supports are broadcast joins; rank cuts
    compare ROUNDed lift with (part_a, part_b) tie-breaks. At 100 TB a
    hub cap on promiscuous parts (the _SH_DF_CAP pattern) bounds the
    basket self-join."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    n = op.agg(F.countDistinct("o").cast("double").alias("n_orders"))
    pc = op.groupBy("p").agg(F.count(F.lit(1)).cast("double").alias("c"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("part_a"), F.col("b.p").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    lift = F.col("n_both") * F.col("n_orders") / (F.col("ca") * F.col("cb"))
    return (
        pairs.join(F.broadcast(pc.select(F.col("p").alias("part_a"), F.col("c").alias("ca"))), "part_a")
        .join(F.broadcast(pc.select(F.col("p").alias("part_b"), F.col("c").alias("cb"))), "part_b")
        .crossJoin(F.broadcast(n))
        .select("part_a", "part_b", "n_both", F.round(lift, 6).alias("lift"))
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov)
# ---------------------------------------------------------------------------
@register(
    "events_markov",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    t AS (SELECT prev_type, CAST(SUM(n) AS DOUBLE) AS tot FROM c GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, c.n,
           ROUND(c.n / t.tot, 6) AS p
    FROM c JOIN t USING (prev_type)
    """,
)
def events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next_type | prev_type) from lag pairs — the sequence-analytics
    primitive behind journey analysis, next-action prediction baselines,
    and anomalous-flow detection (a transition whose observed p collapses
    week-over-week is a broken funnel).

    Scale: one lag window per user (the same user_id exchange every
    sessionization query uses), then a types² aggregate — the matrix is
    O(|types|²) regardless of event volume, and row-normalization joins
    on the tiny prev_type margin."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").cast("double").alias("tot"))
    return c.join(F.broadcast(t), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("tot"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# Market concentration (HHI + top-k share)
# ---------------------------------------------------------------------------
@register(
    "agg_concentration",
    oracle="""
    WITH rev AS (
      SELECT l_returnflag, l_suppkey,
             SUM(l_extendedprice * (1 - l_discount)) AS r
      FROM lineitem GROUP BY l_returnflag, l_suppkey
    ),
    tot AS (SELECT l_returnflag, SUM(r) AS tr FROM rev GROUP BY l_returnflag),
    rk AS (
      SELECT rev.*, tot.tr,
             ROW_NUMBER() OVER (PARTITION BY rev.l_returnflag
                                ORDER BY rev.r DESC, rev.l_suppkey) AS rn
      FROM rev JOIN tot USING (l_returnflag)
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM((r / tr) * (r / tr)), 6) AS hhi,
           ROUND(SUM(CASE WHEN rn <= 5 THEN r / tr ELSE 0 END), 6) AS top5_share
    FROM rk GROUP BY l_returnflag
    """,
)
def agg_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration metrics per return flag: the Herfindahl index
    (sum of squared supplier revenue shares — the antitrust measure of
    how dominated a segment is) and the top-5 supplier share. Answers
    "is this revenue stream diversified or five-supplier-fragile".

    Scale: one partial-agg over (flag, supplier), a tiny per-flag total
    joined back, one window ranking over O(suppliers) rows per flag, one
    final fold — nothing touches raw lineitem twice."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_returnflag", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r")
    )
    tot = rev.groupBy("l_returnflag").agg(F.sum("r").alias("tr"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("r").desc(), "l_suppkey")
    rk = rev.join(F.broadcast(tot), "l_returnflag").withColumn(
        "rn", F.row_number().over(w)
    )
    share = F.col("r") / F.col("tr")
    return rk.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.round(F.sum(share * share), 6).alias("hhi"),
        F.round(F.sum(F.when(F.col("rn") <= 5, share).otherwise(0.0)), 6).alias(
            "top5_share"
        ),
    )


# ---------------------------------------------------------------------------
# Period-over-period growth (BI daily series)
# ---------------------------------------------------------------------------
@register(
    "events_growth",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
             ROUND(SUM(value), 4) AS revenue
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, revenue,
           ROUND(revenue - LAG(revenue) OVER (PARTITION BY event_type ORDER BY d),
                 4) AS delta,
           ROUND((revenue - LAG(revenue) OVER (PARTITION BY event_type ORDER BY d))
                 / LAG(revenue) OVER (PARTITION BY event_type ORDER BY d), 6)
             AS pct_change
    FROM daily
    """,
)
def events_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: daily revenue per event type with the
    absolute delta and percent change vs the previous day — the BI series
    every dashboard opens with (DoD/WoW/MoM are the same plan at coarser
    truncation). First day per type has NULL deltas on both engines.

    Scale: the aggregate collapses event volume to O(types x days) BEFORE
    the lag window touches anything — the window sorts a tiny series, so
    growth over 100 TB of raw events costs one partial-agg shuffle plus a
    per-type sort of day counts. LAG is computed once per alias; the
    rounded aggregate feeds both delta and ratio so engines agree."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.round(F.sum("value"), 4).alias("revenue"))
    w = Window.partitionBy("event_type").orderBy("d")
    prev = F.lag("revenue").over(w)
    return daily.select(
        "event_type",
        "d",
        "revenue",
        F.round(F.col("revenue") - prev, 4).alias("delta"),
        F.round((F.col("revenue") - prev) / prev, 6).alias("pct_change"),
    )


# ---------------------------------------------------------------------------
# CUSUM change detection
# ---------------------------------------------------------------------------
@register(
    "events_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, AVG(v) AS mu, stddev_samp(v) AS sd
      FROM daily GROUP BY event_type
    ),
    p AS (
      SELECT daily.event_type, d,
             SUM((v - mu) / sd - 0.5) OVER (
               PARTITION BY daily.event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
      FROM daily JOIN stats USING (event_type)
    )
    SELECT event_type, d,
           ROUND(pf - LEAST(MIN(pf) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6) AS cusum,
           CAST(pf - LEAST(MIN(pf) OVER (
             PARTITION BY event_type ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) > 5
             AS INTEGER) AS alarm
    FROM p
    """,
)
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detector over the daily per-type
    revenue series: standardize (z = (v-mu)/sd), accumulate drift above
    the k=0.5 allowance, alarm when the statistic exceeds h=5 — the
    textbook (k, h) = (0.5σ, 5σ) small-shift monitor.

    The CUSUM recursion s_t = max(0, s_{t-1} + z_t - k) is not a plain
    window aggregate, but it has a closed prefix form: with
    p_t = Σ(z_τ - k), s_t = p_t - min(0, running_min(p)) — so two
    stacked windows (running sum, running min over it) compute the exact
    reset recursion declaratively in both engines. Everything after the
    daily groupBy runs on O(days) rows per type; per-type stats join
    back broadcast."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    stats = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "d",
        F.sum((F.col("v") - F.col("mu")) / F.col("sd") - 0.5).over(w).alias("pf"),
    )
    s = F.col("pf") - F.least(F.min("pf").over(w), F.lit(0.0))
    return p.select(
        "event_type",
        "d",
        F.round(s, 6).alias("cusum"),
        (s > 5).cast("int").alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Weekday seasonality profile
# ---------------------------------------------------------------------------
@register(
    "events_seasonality",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    base AS (SELECT event_type, AVG(v) AS grand FROM daily GROUP BY event_type)
    SELECT daily.event_type, daily.d % 7 AS weekday,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(v) - grand, 6) AS seasonal_offset,
           ROUND(AVG(v) / grand, 6) AS seasonal_ratio
    FROM daily JOIN base USING (event_type)
    GROUP BY daily.event_type, daily.d % 7, grand
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality profile: the additive offset and multiplicative
    ratio of each weekday's average daily value vs the type's grand mean —
    the decomposition step before any deseasonalized comparison (and the
    input to seasonal-naive forecasting).

    Plan: daily groupBy (the only data-volume stage), a per-type grand
    mean re-aggregated from the DAILY rows (never the raw table), and a
    7-row-per-type final aggregate with the grand mean broadcast back.
    Day index arithmetic (d % 7) keeps weekday identical across engines
    regardless of locale/week-start conventions."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    base = daily.groupBy("event_type").agg(F.avg("v").alias("grand"))
    return (
        daily.join(F.broadcast(base), "event_type")
        .groupBy("event_type", (F.col("d") % 7).alias("weekday"), "grand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.avg("v") - F.col("grand"), 6).alias("seasonal_offset"),
            F.round(F.avg("v") / F.col("grand"), 6).alias("seasonal_ratio"),
        )
        .drop("grand")
    )


# ---------------------------------------------------------------------------
# ABC (Pareto 80/15/5) classification
# ---------------------------------------------------------------------------
@register(
    "orders_abc",
    oracle="""
    WITH rev AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT SUM(revenue) AS tot FROM rev),
    c AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) / tot AS cum_share
      FROM rev CROSS JOIN t
    )
    SELECT CASE WHEN ROUND(cum_share, 9) <= 0.8 THEN 'A'
                WHEN ROUND(cum_share, 9) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(revenue), 2) AS class_revenue,
           ROUND(SUM(revenue) / MAX(tot), 6) AS revenue_share
    FROM c CROSS JOIN t
    GROUP BY 1
    """,
)
def orders_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: rank parts by
    lineitem revenue, take the cumulative share, and bucket A (first
    80%), B (next 15%), C (tail) — the inventory-management cut that
    names the skyline's cousin (a few parts carry most revenue).

    The cumulative share is compared on ROUND(·, 9) so a part sitting
    within float-fold noise of the 0.8/0.95 boundary classifies
    identically in both engines. Plan: per-part revenue is one
    map-side-combining groupBy over the facts; the running-sum window
    then orders O(parts) dimension rows — orders of magnitude below the
    fact volume (at true dimension scale, a range-partitioned global
    sort + per-range offsets computes the same cumsum distributively)."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    t = rev.agg(F.sum("revenue").alias("tot"))
    w = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = rev.crossJoin(F.broadcast(t)).select(
        "revenue",
        "tot",
        (F.sum("revenue").over(w) / F.col("tot")).alias("cum_share"),
    )
    cls = (
        F.when(F.round(F.col("cum_share"), 9) <= 0.8, "A")
        .when(F.round(F.col("cum_share"), 9) <= 0.95, "B")
        .otherwise("C")
    )
    return c.groupBy(cls.alias("abc_class")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("revenue"), 2).alias("class_revenue"),
        F.round(F.sum("revenue") / F.max("tot"), 6).alias("revenue_share"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient (Lorenz-curve inequality)
# ---------------------------------------------------------------------------
@register(
    "agg_gini",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
             SUM(o.o_totalprice) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT seg, x,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY x, ck) AS rk
      FROM rev
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(x), 2) AS total_revenue,
           ROUND(2.0 * SUM(rk * x) / (COUNT(*) * SUM(x))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM r GROUP BY seg
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue within each market
    segment — the Lorenz-curve inequality measure (0 = revenue spread
    evenly across customers, →1 = concentrated in a few). Complements
    ``agg_concentration``'s Herfindahl/top-5 with the full-distribution
    statistic, via the rank identity G = 2·Σ(rk·x)/(n·Σx) − (n+1)/n.

    Plan: one groupBy collapsing orders to per-(segment, customer)
    revenue — the only stage that sees fact volume — then a per-segment
    rank window over O(customers) rows feeding a closed-form aggregate.
    Ties rank deterministically by (revenue, custkey), which leaves the
    Gini value unchanged (equal x under differing ranks cancel in the
    sum) but keeps both engines' intermediate frames identical."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("ck"))
        .agg(F.sum("o_totalprice").alias("x"))
    )
    w = Window.partitionBy("seg").orderBy("x", "ck")
    r = rev.withColumn("rk", F.row_number().over(w))
    n = F.count(F.lit(1))
    return r.groupBy("seg").agg(
        n.cast("long").alias("n_customers"),
        F.round(F.sum("x"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("rk") * F.col("x")) / (n * F.sum("x"))
            - (n + 1.0) / n,
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival time statistics
# ---------------------------------------------------------------------------
@register(
    "events_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP))
              - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                  PARTITION BY user_id, event_type
                  ORDER BY ts, event_id)) / 1000000.0 AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(AVG(gap_s), 6) AS avg_gap_s,
           ROUND(quantile_cont(gap_s, 0.5), 6) AS median_gap_s,
           ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: the gap in seconds
    between a user's consecutive events of the same type — mean, median
    and p90 (the latency-style profile that separates burst traffic from
    steady usage, and the input to any Poisson-rate model).

    Plan: one LAG window on the (user_id, event_type) sort — per-key
    window state is a single timestamp — then a per-type aggregate.
    Timestamps diff in integer microseconds (epoch_us / unix_micros) so
    both engines subtract exactly; medians interpolate with
    quantile_cont semantics in both. At 100 TB the window rides the same
    user-partitioned exchange as sessionization; swap the exact
    percentiles for the mergeable sketch when types are few and hot."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "event_type", ((us - F.lag(us).over(w)) / 1_000_000.0).alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").cast("long").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("avg_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 6).alias("median_gap_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 6).alias("p90_gap_s"),
    )


# ---------------------------------------------------------------------------
# Clickstream path mining: top session trigram paths
# ---------------------------------------------------------------------------
@register(
    "events_paths",
    oracle="""
    WITH o AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ),
    g AS (
      SELECT user_id, sid, list(event_type ORDER BY ts, event_id) AS types
      FROM s GROUP BY user_id, sid
    ),
    p AS (
      SELECT unnest(list_transform(generate_series(2, len(types) - 1),
                    i -> types[i-1] || '>' || types[i] || '>' || types[i+1]))
             AS path
      FROM g
    )
    SELECT path, n, rk FROM (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS rk
      FROM p GROUP BY path) t
    WHERE rk <= 10
    """,
)
def events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: sessionize each user's stream (30-minute
    gap), slide a 3-step window over every session's event-type sequence,
    and rank the 10 most-travelled paths — the navigation-flow query
    behind funnel design ('what do users actually do between view and
    purchase').

    Plan: one user-partitioned sort serves the gap-flag and running-sum
    session assignment (two stacked windows, no self-join); each session
    collapses to ONE array row, trigrams come from a JVM index-transform
    over that array (no explode of raw events against itself), and the
    final count is a partial-agg groupBy on the path string feeding a
    TakeOrdered-style top-10. Per-session state is bounded by session
    length; the heavy stream never shuffles more than twice."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = (
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 30 * 60 * 1_000_000)
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(new_sess).over(wsum).alias("sid"),
    )
    g = s.groupBy("user_id", "sid").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias(
            "evs"
        )
    )
    types = F.col("evs.event_type")
    trigrams = F.when(
        F.size(types) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(types) - 2),
            lambda i: F.concat_ws(
                ">",
                F.element_at(types, i),
                F.element_at(types, i + 1),
                F.element_at(types, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    p = g.select(F.explode(trigrams).alias("path"))
    counted = p.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wr = Window.orderBy(F.col("n").desc(), "path")
    return (
        counted.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 10)
        .select("path", "n", "rk")
    )


# ---------------------------------------------------------------------------
# Seasonally-adjusted anomaly detection
# ---------------------------------------------------------------------------
@register(
    "events_anomaly_seasonal",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    season AS (
      SELECT event_type, d % 7 AS weekday, AVG(v) AS wd_avg
      FROM daily GROUP BY 1, 2
    ),
    resid AS (
      SELECT daily.event_type, d, v, v - wd_avg AS r
      FROM daily JOIN season
        ON season.event_type = daily.event_type AND season.weekday = daily.d % 7
    ),
    stats AS (
      SELECT event_type, AVG(r) AS mu, stddev_samp(r) AS sd
      FROM resid GROUP BY event_type
    )
    SELECT resid.event_type, d,
           ROUND(v, 4) AS v,
           ROUND((r - mu) / sd, 6) AS resid_z,
           CAST(ABS((r - mu) / sd) > 2.5 AS INTEGER) AS is_anomaly
    FROM resid JOIN stats USING (event_type)
    """,
)
def events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: remove each weekday's
    average from the daily series, z-score the residual per type, and
    flag |z| > 2.5 — the deseasonalized monitor that doesn't page every
    Saturday because weekends are quiet (the raw-value z-score,
    `anomaly_zscore`, would). Composes the `events_seasonality`
    decomposition with the `anomaly_zscore` flagging rule.

    Plan: the daily groupBy is the only data-volume stage; the weekday
    profile (7 rows/type) and residual stats (1 row/type) re-aggregate
    from the DAILY rows and broadcast back. No windows at all — every
    stage after the first is O(types x days)."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    season = daily.groupBy(
        F.col("event_type").alias("s_type"), (F.col("d") % 7).alias("weekday")
    ).agg(F.avg("v").alias("wd_avg"))
    resid = (
        daily.join(
            F.broadcast(season),
            (F.col("s_type") == F.col("event_type"))
            & (F.col("weekday") == F.col("d") % 7),
        )
        .select(
            "event_type", "d", "v", (F.col("v") - F.col("wd_avg")).alias("r")
        )
    )
    stats = resid.groupBy("event_type").agg(
        F.avg("r").alias("mu"), F.stddev_samp("r").alias("sd")
    )
    z = (F.col("r") - F.col("mu")) / F.col("sd")
    return resid.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "d",
        F.round("v", 4).alias("v"),
        F.round(z, 6).alias("resid_z"),
        (F.abs(z) > 2.5).cast("int").alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival (time to repeat order, right-censored)
# ---------------------------------------------------------------------------
@register(
    "orders_survival_km",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    per_cust AS (
      SELECT o_custkey,
             MIN(CASE WHEN rn = 1 THEN o_orderdate END) AS first_o,
             MIN(CASE WHEN rn = 2 THEN o_orderdate END) AS second_o
      FROM ranked GROUP BY o_custkey
    ),
    subj AS (
      SELECT CASE WHEN second_o IS NOT NULL
                  THEN datediff('day', first_o, second_o)
                  ELSE datediff('day', first_o, TIMESTAMP '2001-08-01') END AS dur,
             CASE WHEN second_o IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_cust
    ),
    by_dur AS (
      SELECT dur, CAST(COUNT(*) AS DOUBLE) AS m, CAST(SUM(ev) AS DOUBLE) AS d
      FROM subj GROUP BY dur
    ),
    risk AS (
      SELECT dur, d,
             SUM(m) OVER (ORDER BY dur DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_risk
      FROM by_dur
    ),
    ev_times AS (SELECT dur, d, n_risk, 1 - d / n_risk AS factor
                 FROM risk WHERE d >= 1),
    km AS (
      SELECT dur, d, n_risk,
             MAX(CASE WHEN factor = 0 THEN 1 ELSE 0 END) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS zero_seen,
             SUM(CASE WHEN factor > 0 THEN ln(factor) END) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS logsum
      FROM ev_times
    )
    SELECT dur AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_events,
           ROUND(CASE WHEN zero_seen = 1 THEN 0 ELSE exp(logsum) END, 6)
             AS survival
    FROM km
    """,
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-repeat-order: each
    customer's duration runs from their first order to their second
    (event) or to the observation end 2001-08-01 (right-censored —
    one-order customers leave the risk set without an event, which is
    exactly what a naive 'average days between orders' gets wrong).
    S(t) = prod over event times <= t of (1 - d_i / n_i).

    Plan: one per-customer window finds the first two orders; everything
    after runs on O(distinct durations) rows — the risk set n_i is a
    DESCENDING cumulative count (everyone with duration >= t), and the
    product telescopes through exp(running sum of ln factors), with an
    explicit zero-factor flag because Spark's ln(0) is NULL where
    DuckDB's is -inf. No per-subject state survives the first aggregate,
    so the curve costs the same at any order volume."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 2)
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("o_orderdate"))).alias("first_o"),
        F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias("second_o"),
    )
    end = F.lit("2001-08-01").cast("timestamp")
    dur = F.when(
        F.col("second_o").isNotNull(),
        F.datediff(F.col("second_o").cast("date"), F.col("first_o").cast("date")),
    ).otherwise(F.datediff(end.cast("date"), F.col("first_o").cast("date")))
    subj = per_cust.select(
        dur.alias("dur"), F.col("second_o").isNotNull().cast("int").alias("ev")
    )
    by_dur = subj.groupBy("dur").agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("ev").cast("double").alias("d"),
    )
    w_desc = (
        Window.orderBy(F.col("dur").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = by_dur.select(
        "dur", "d", F.sum("m").over(w_desc).alias("n_risk")
    ).filter(F.col("d") >= 1)
    factor = 1 - F.col("d") / F.col("n_risk")
    w_asc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km = risk.select(
        "dur",
        "d",
        "n_risk",
        F.max((factor == 0).cast("int")).over(w_asc).alias("zero_seen"),
        F.sum(F.when(factor > 0, F.log(factor))).over(w_asc).alias("logsum"),
    )
    return km.select(
        F.col("dur").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d_events"),
        F.round(
            F.when(F.col("zero_seen") == 1, F.lit(0.0)).otherwise(F.exp("logsum")), 6
        ).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Phase-dispersion minimization (period search)
# ---------------------------------------------------------------------------
@register(
    "lightcurve_pdm",
    oracle="""
    WITH obs AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0 AS t, value AS v
      FROM events WHERE event_type = 'view'
    ),
    tot AS (SELECT var_samp(v) AS s2_tot FROM obs),
    binned AS (
      SELECT trials.p,
             LEAST(CAST(FLOOR(((t / trials.p) % 1.0) * 10) AS BIGINT), 9) AS bin,
             CAST(COUNT(*) AS DOUBLE) AS nb,
             var_samp(v) AS s2b
      FROM obs
      CROSS JOIN (VALUES (0.5e0), (1.0e0), (1.5e0), (2.0e0), (3.0e0), (7.0e0))
        AS trials(p)
      GROUP BY 1, 2
    ),
    theta AS (
      SELECT p,
             SUM(CASE WHEN nb > 1 THEN (nb - 1) * s2b ELSE 0 END)
               / SUM(CASE WHEN nb > 1 THEN nb - 1 ELSE 0 END) / MAX(tot.s2_tot)
               AS stat
      FROM binned CROSS JOIN tot
      GROUP BY p
    )
    SELECT p AS trial_period_days, ROUND(stat, 6) AS pdm_theta,
           ROW_NUMBER() OVER (ORDER BY ROUND(stat, 6), p) AS rk
    FROM theta
    """,
)
def lightcurve_pdm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase-dispersion minimization period search (Stellingwerf) over the
    'view' value series: fold the times modulo each trial period, bin the
    phase into 10 cells, and score theta = pooled within-bin variance /
    total variance — a genuinely periodic signal drops theta well below 1
    at the true period, and the best trial ranks first. The light-curve
    workhorse when Lomb-Scargle's sinusoid assumption doesn't hold
    (eclipses, transits).

    Plan: one CROSS JOIN against 6 broadcast trial rows (a 6x narrow
    expansion, not a shuffle), then ONE partial-agg groupBy(trial, bin) —
    60 cells total — and a per-trial fold; the total variance is a single
    broadcast scalar. Phase arithmetic is double fmod in both engines.
    Ranks compare on ROUND(theta, 6) with the period as tie-break."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    obs = ev.select(
        (F.unix_micros(F.col("ts")) / 86_400_000_000.0).alias("t"),
        F.col("value").alias("v"),
    )
    tot = obs.agg(F.var_samp("v").alias("s2_tot"))
    trials = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(p) for p in (0.5, 1.0, 1.5, 2.0, 3.0, 7.0)])
        ).alias("p")
    )
    binned = (
        obs.crossJoin(F.broadcast(trials))
        .groupBy(
            "p",
            F.least(
                F.floor(((F.col("t") / F.col("p")) % 1.0) * 10), F.lit(9)
            ).alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("double").alias("nb"),
            F.var_samp("v").alias("s2b"),
        )
    )
    stat = (
        F.sum(F.when(F.col("nb") > 1, (F.col("nb") - 1) * F.col("s2b")).otherwise(0.0))
        / F.sum(F.when(F.col("nb") > 1, F.col("nb") - 1).otherwise(0.0))
        / F.max("s2_tot")
    )
    theta = (
        binned.crossJoin(F.broadcast(tot))
        .groupBy("p")
        .agg(stat.alias("stat"))
    )
    w = Window.orderBy(F.round(F.col("stat"), 6), "p")
    return theta.select(
        F.col("p").alias("trial_period_days"),
        F.round("stat", 6).alias("pdm_theta"),
        F.row_number().over(w).alias("rk"),
    )


# ---------------------------------------------------------------------------
# Higher moments: skewness + excess kurtosis via raw moments
# ---------------------------------------------------------------------------
@register(
    "agg_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(l_extendedprice) AS s1,
             SUM(l_extendedprice * l_extendedprice) AS s2,
             SUM(l_extendedprice * l_extendedprice * l_extendedprice) AS s3,
             SUM(l_extendedprice * l_extendedprice * l_extendedprice
                 * l_extendedprice) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    m AS (
      SELECT l_returnflag, n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1 / n) * (s1 / n) * (s1 / n)
               AS m3,
             s4 / n - 4 * (s1 / n) * s3 / n
               + 6 * (s1 / n) * (s1 / n) * s2 / n
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND(mu, 4) AS mean,
           ROUND(m2, 2) AS variance,
           ROUND(m3 / POW(m2, 1.5), 6) AS skewness_g1,
           ROUND(m4 / (m2 * m2) - 3, 6) AS kurtosis_g2
    FROM m
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution shape per group: population skewness g1 = m3/m2^1.5
    and excess kurtosis g2 = m4/m2² − 3, computed from RAW power sums —
    deliberately NOT the engines' built-in skewness/kurtosis, whose bias
    conventions differ (Spark reports population g-statistics, DuckDB
    sample-adjusted G-statistics), making them un-oracleable against
    each other. Raw moments are plain algebraic SUMs, so both engines
    compute bit-comparable doubles and the shuffle carries five numbers
    per group.

    Note the numerical trade: the central-moment expansion from raw sums
    loses precision when |mean| >> stddev (catastrophic cancellation);
    prices here have mean/sd ~ 2, far from that regime, and the 100 TB
    alternative is Welford-style streaming central moments — the same
    single-pass shape the built-ins use internally."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * F.col("s2") / F.col("n") + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * F.col("s3") / F.col("n")
        + 6 * mu * mu * F.col("s2") / F.col("n")
        - 3 * mu * mu * mu * mu
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(mu, 4).alias("mean"),
        F.round(m2, 2).alias("variance"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness_g1"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurtosis_g2"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (round 6)
# ---------------------------------------------------------------------------


@register(
    "agg_theilsen",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_idx,
             ROUND(SUM(value), 4) AS y
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type,
             (b.y - a.y) / (b.day_idx - a.day_idx) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day_idx < b.day_idx
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(slope, 0.5), 6) AS theil_slope
    FROM slopes GROUP BY event_type
    """,
)
def agg_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event type: the MEDIAN of all
    pairwise slopes of the daily-revenue series — up to ~29% outlier
    breakdown vs OLS's zero (Sen 1968), the standard robust alternative
    to `agg_linreg`'s regression slope.

    Scale: the pair join is per-group over the PRE-AGGREGATED daily
    series (O(days^2) pairs per type, days bounded by the calendar —
    the same contraction events_acf relies on), never over raw events;
    the median is an exact percentile on the grouped frame. Daily totals
    are rounded to 4dp first so both engines difference identical
    doubles; day indexes are tz-free epoch arithmetic."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("day_idx"),
    ).agg(F.round(F.sum("value"), 4).alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day_idx") < F.col("b.day_idx")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.day_idx") - F.col("a.day_idx"))).alias(
            "slope"
        ),
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.percentile("slope", F.lit(0.5)), 6).alias("theil_slope"),
    )


# ---------------------------------------------------------------------------
# SAX symbolization (round 6)
# ---------------------------------------------------------------------------
_SAX_W = 7          # PAA bucket width in days
_SAX_BP = 0.6745    # Gaussian quartile breakpoints: -bp, 0, +bp -> a..d


@register(
    "events_sax",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_idx,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, AVG(y) AS mu,
             sqrt(AVG(y * y) - AVG(y) * AVG(y)) AS sigma,
             MIN(day_idx) AS d0
      FROM daily GROUP BY event_type
    ),
    paa AS (
      SELECT d.event_type,
             (d.day_idx - s.d0) // {_SAX_W} AS bucket_idx,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             (AVG(d.y) - ANY_VALUE(s.mu)) / ANY_VALUE(s.sigma) AS z
      FROM daily d JOIN stats s USING (event_type)
      GROUP BY 1, 2
    )
    SELECT event_type, bucket_idx, n_days, ROUND(z, 6) AS paa_z,
           CASE WHEN z < -{_SAX_BP} THEN 'a'
                WHEN z < 0 THEN 'b'
                WHEN z < {_SAX_BP} THEN 'c'
                ELSE 'd' END AS symbol
    FROM paa
    """,
)
def events_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation, Lin et al. 2003): z-normalize
    each event type's daily-count series, Piecewise-Aggregate-Approximate
    it into {_SAX_W}-day buckets, and map each bucket mean to one of four
    symbols at the Gaussian quartile breakpoints (±{_SAX_BP}, 0) — the
    classic time-series-to-string reduction that turns subsequence
    matching / motif discovery into cheap string algorithms.

    Scale: everything happens on the O(types x days) pre-aggregated
    frame; the z-normalization constants are one more grouped aggregate
    joined back (broadcast — O(types) rows). sigma uses the explicit
    sqrt(E[y^2] - E[y]^2) spelling in BOTH engines rather than their
    differing native stddev implementations."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("day_idx"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    stats = daily.groupBy("event_type").agg(
        F.avg("y").alias("mu"),
        F.sqrt(F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("sigma"),
        F.min("day_idx").alias("d0"),
    )
    paa = (
        daily.join(F.broadcast(stats), "event_type")
        .groupBy(
            "event_type",
            F.floor((F.col("day_idx") - F.col("d0")) / _SAX_W).alias("bucket_idx"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            ((F.avg("y") - F.first("mu")) / F.first("sigma")).alias("z"),
        )
    )
    sym = (
        F.when(F.col("z") < -_SAX_BP, "a")
        .when(F.col("z") < 0, "b")
        .when(F.col("z") < _SAX_BP, "c")
        .otherwise("d")
    )
    return paa.select(
        "event_type",
        "bucket_idx",
        "n_days",
        F.round("z", 6).alias("paa_z"),
        sym.alias("symbol"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI (round 6)
# ---------------------------------------------------------------------------
_BOOT_B = 200    # resamples
_BOOT_TRIALS = 4  # Binomial(4, 1/4) multiplicity ~ Poisson(1)
_BOOT_P = 2147483647  # 2^31 - 1, the minhash Mersenne modulus


def _boot_mult_sql() -> str:
    # affine-permutation multiplicity: ONE md5 per row (h31), then each
    # (resample b, trial k) draws g = (a*h31 + c) % P with a, c affine in
    # j = 4b+k — the minhash _MH_AB trick; 4 trials at p~1/4 each
    ind = " + ".join(
        f"(CASE WHEN ((1000003 + 4591 * (4 * b.b + {k})) * h31"
        f" + (998244353 % {_BOOT_P}) + 7 * (4 * b.b + {k})) % {_BOOT_P} % 4 = 0"
        f" THEN 1 ELSE 0 END)"
        for k in range(_BOOT_TRIALS)
    )
    return f"({ind})"


@register(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH b AS (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b),
    hashed AS (
      SELECT o_totalprice,
             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_BOOT_P} AS h31
      FROM orders
    ),
    weighted AS (
      SELECT b.b, {_boot_mult_sql()} AS m, o_totalprice
      FROM hashed CROSS JOIN b
    ),
    means AS (
      SELECT b, SUM(m * o_totalprice) / SUM(m) AS mean_b
      FROM weighted GROUP BY b HAVING SUM(m) > 0
    )
    SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n,
           ROUND((SELECT AVG(o_totalprice) FROM orders), 4) AS mean,
           CAST(COUNT(*) AS BIGINT) AS n_resamples,
           ROUND(quantile_cont(mean_b, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(mean_b, 0.975), 4) AS ci_hi
    FROM means
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order price via the
    POISSON bootstrap (Chamandy et al. 2012, "Estimating uncertainty for
    massive data streams" — the Google formulation): instead of drawing
    n indexed rows per resample (which needs a global row index and a
    shuffle per resample), every row independently contributes a
    Binomial({_BOOT_TRIALS}, 1/{_BOOT_TRIALS}) ~ Poisson(1) multiplicity
    to each of {_BOOT_B} resamples. Multiplicities derive from ONE
    md5 row hash through per-(resample, trial) affine permutations
    (the minhash a*h+c mod 2^31-1 family), so the 'randomness' is a pure
    row function — deterministic, engine-reproducible, reshuffle-proof —
    and the hash cost is one md5 per ROW, not per (row x resample x
    trial).

    Scale: the only data-sized operation is one explode x{_BOOT_B} +
    partial-agg groupBy(b) — embarrassingly parallel, no row indexing,
    no per-resample pass; that is exactly why Poisson bootstrap is THE
    bootstrap at 100 TB. Resample means then fold to exact percentile
    cutoffs on a {_BOOT_B}-row frame."""
    from .llm_text import _h64 as _h  # cross-engine md5 hash

    o = load(spark, sf_dir, "orders")
    # ONE md5 per row; per-(resample, trial) draws are affine permutations
    # of that hash (see _boot_mult_sql) — the r6 rewrite cut 120M md5
    # evaluations per engine at sf0.1 to 150k (149.6s -> seconds)
    hashed = o.select(
        "o_totalprice",
        (_h(F.col("o_orderkey").cast("string")) % _BOOT_P).alias("h31"),
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    rows = hashed.select("o_totalprice", "h31", b)
    mult = None
    for k in range(_BOOT_TRIALS):
        j = 4 * F.col("b") + k
        g = (
            (1000003 + 4591 * j) * F.col("h31") + (998244353 % _BOOT_P) + 7 * j
        ) % _BOOT_P
        ind = (g % 4 == 0).cast("int")
        mult = ind if mult is None else mult + ind
    weighted = rows.select("b", mult.alias("m"), "o_totalprice")
    means = (
        weighted.groupBy("b")
        .agg(
            (F.sum(F.col("m") * F.col("o_totalprice")) / F.sum("m")).alias("mean_b"),
            F.sum("m").alias("sm"),
        )
        .filter(F.col("sm") > 0)
    )
    stats = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("mean"),
    )
    ci = means.agg(
        F.count(F.lit(1)).cast("long").alias("n_resamples"),
        F.round(F.percentile("mean_b", F.lit(0.025)), 4).alias("ci_lo"),
        F.round(F.percentile("mean_b", F.lit(0.975)), 4).alias("ci_hi"),
    )
    return ci.crossJoin(F.broadcast(stats)).select(
        "n", "mean", "n_resamples", "ci_lo", "ci_hi"
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves (round 6)
# ---------------------------------------------------------------------------


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    sized AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM firsts GROUP BY cohort
    ),
    rev AS (
      -- integer-cents accumulation: double sums in engine-specific orders
      -- differed in the last cent on 9 panel rows; exact BIGINT cents +
      -- floor-cents display are order-independent
      SELECT f.cohort,
             CAST(date_diff('month', f.cohort,
                            date_trunc('month', o.o_orderdate)) AS INT) AS age,
             SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT r.cohort, r.age, s.n_customers,
           FLOOR(SUM(r.rev_cents) OVER (PARTITION BY r.cohort ORDER BY r.age
                                        ROWS UNBOUNDED PRECEDING)
                 / CAST(s.n_customers AS DOUBLE)) / 100 AS cum_ltv_per_customer
    FROM rev r JOIN sized s USING (cohort)
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, each cohort's CUMULATIVE revenue per customer by account age
    in months — the LTV panel behind payback-period and retention
    economics (the value-weighted upgrade of `retention_cohorts`' count
    matrix).

    Plan: first-order month per customer (partial-agg), revenue folded
    to the O(cohorts x ages) panel BEFORE any window runs, then the
    cumulative sum is a window over that tiny panel partitioned by
    cohort — never over raw orders. Month arithmetic is integer
    (date_trunc + month diff), so ages are engine-exact."""
    o = load(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate")), F.col("cohort")
            )
            .cast("int")
            .alias("age"),
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # integer-cents + floor-cents display: see the oracle comment
    return rev.join(F.broadcast(sized), "cohort").select(
        "cohort",
        "age",
        "n_customers",
        (
            F.floor(
                F.sum("rev_cents").over(w) / F.col("n_customers").cast("double")
            )
            / 100
        ).alias("cum_ltv_per_customer"),
    )


# ---------------------------------------------------------------------------
# Classical periodogram (round 6)
# ---------------------------------------------------------------------------
_PGRAM_PERIODS = tuple(range(2, 15))  # trial periods in days


@register(
    "events_periodogram",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    ctr AS (
      SELECT d.event_type, d.d, d.y - s.mu AS yc
      FROM daily d JOIN (SELECT event_type, AVG(y) AS mu
                         FROM daily GROUP BY event_type) s
      USING (event_type)
    ),
    grid AS (SELECT unnest(ARRAY{list(_PGRAM_PERIODS)}) AS period),
    comp AS (
      SELECT c.event_type, g.period,
             SUM(c.yc * cos(2 * pi() * c.d / g.period)) AS cr,
             SUM(c.yc * sin(2 * pi() * c.d / g.period)) AS si,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM ctr c CROSS JOIN grid g
      GROUP BY 1, 2
    )
    SELECT event_type, period,
           FLOOR((cr * cr + si * si) / n * 1000) / 1000 AS power
    FROM comp
    """,
)
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical (Schuster) periodogram of each event type's mean-centered
    daily-count series at trial periods {_PGRAM_PERIODS[0]}-{_PGRAM_PERIODS[-1]}
    days: power(p) = [(Σ y·cos(2πd/p))² + (Σ y·sin(2πd/p))²] / n — the
    Fourier-side complement of `lightcurve_pdm`'s phase-dispersion search
    and `events_seasonality`'s fixed weekly profile (a weekly rhythm
    shows as a peak at p=7). Power floors to 1e-3 units per the
    cross-engine convention; trig arguments are exact rationals 2πd/p of
    integer day indexes, evaluated by each engine's own libm on
    identical doubles.

    Scale: the series is the O(types x days) pre-aggregated frame;
    each (type, period) component is one partial-agg fold over it —
    trial periods multiply that tiny frame, never raw events."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    mu = daily.groupBy("event_type").agg(F.avg("y").alias("mu"))
    ctr = daily.join(F.broadcast(mu), "event_type").select(
        "event_type", "d", (F.col("y") - F.col("mu")).alias("yc")
    )
    grid = F.explode(F.array(*[F.lit(p) for p in _PGRAM_PERIODS])).alias("period")
    comp = (
        ctr.select("event_type", "d", "yc", grid)
        .groupBy("event_type", "period")
        .agg(
            F.sum(
                F.col("yc") * F.cos(2 * math.pi * F.col("d") / F.col("period"))
            ).alias("cr"),
            F.sum(
                F.col("yc") * F.sin(2 * math.pi * F.col("d") / F.col("period"))
            ).alias("si"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    power = (F.col("cr") * F.col("cr") + F.col("si") * F.col("si")) / F.col("n")
    return comp.select(
        "event_type", "period", (F.floor(power * 1000) / 1000).alias("power")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (round 6)
# ---------------------------------------------------------------------------
_SN_LAG = 7  # seasonal period in days


@register(
    "events_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.event_type, a.d, a.y, b.y AS yhat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d = a.d - {_SN_LAG}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(AVG(ABS(y - yhat)) * 10000) / 10000 AS mae,
           FLOOR(SUM(ABS(y - yhat)) / SUM(ABS(y)) * 1000000) / 1000000 AS wape
    FROM paired GROUP BY event_type
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's event count
    with the value {_SN_LAG} days earlier and score MAE / WAPE per type —
    the baseline every forecasting system must beat (and the honest
    yardstick M-competitions score against). Complements
    `events_seasonality` (the weekly profile this naive model exploits)
    and `events_periodogram` (which detects whether period {_SN_LAG}
    carries power at all).

    Plan: the lag pairing is a self-equi-join of the O(types x days)
    daily frame on (type, d-{_SN_LAG}) — at scale a window lag over the
    same frame works too; the join form keeps both engines' row sets
    trivially identical. Errors floor to fixed grids per the
    cross-engine convention."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    paired = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") == F.col("a.d") - _SN_LAG),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.y").alias("y"),
        F.col("b.y").alias("yhat"),
    )
    err = F.abs(F.col("y") - F.col("yhat"))
    return paired.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.floor(F.avg(err) * 10000) / 10000).alias("mae"),
        (F.floor(F.sum(err) / F.sum(F.abs("y")) * 1000000) / 1000000).alias("wape"),
    )


# ---------------------------------------------------------------------------
# Holt linear-trend exponential smoothing (round 7)
# ---------------------------------------------------------------------------
# level / trend smoothing factors a=0.5, g=0.3 — inlined as literals in both
# engines' expressions (identical text => identical doubles); the substituted
# one-step coefficients are g*a=0.15 and 1-g+g*(1-a)=0.85


@register(
    "events_holt_trend",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list(CAST(v AS DOUBLE) ORDER BY d) AS vs
      FROM daily GROUP BY 1
    ),
    -- DuckDB's list_reduce mutates a struct accumulator FIELD BY FIELD
    -- (the 'b' expression observes the already-updated 'l'), so the fold
    -- steps as a recursive CTE instead: each step's SELECT is atomic.
    hw(event_type, i, l, b) AS (
      SELECT event_type, CAST(1 AS BIGINT), vs[1], 0.0::DOUBLE FROM arr
      UNION ALL
      SELECT h.event_type, h.i + 1,
             0.5::DOUBLE * a.vs[h.i + 1] + 0.5::DOUBLE * (h.l + h.b),
             0.15::DOUBLE * a.vs[h.i + 1] - 0.15::DOUBLE * h.l
               + 0.85::DOUBLE * h.b
      FROM hw h JOIN arr a USING (event_type)
      WHERE h.i < a.n_days
    )
    SELECT a.event_type, a.n_days,
           ROUND(h.l, 6) AS level,
           ROUND(h.b, 6) AS trend,
           ROUND(h.l + 7 * h.b, 6) AS forecast_7d
    FROM arr a JOIN hw h ON h.event_type = a.event_type AND h.i = a.n_days
    """,
)
def events_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (ETS(A,A,N); Holt 1957)
    over each event type's daily revenue series: level and trend updated
    by the classic sequential recursion l_t = a*y_t + (1-a)(l+b),
    b_t = g*(l_t - l) + (1-g)*b, initialized l_1 = y_1, b_1 = 0, plus the
    7-day-ahead linear forecast. The trend-aware upgrade of
    ``events_ewma`` and the model-based sibling of the seasonal-naive
    ``events_forecast_backtest``.

    A sequential recursion cannot be a window function, but it IS an
    in-row array fold: each series collects to an ordered array (150
    doubles per type) and ``aggregate`` folds a (level, trend) struct
    through it — Catalyst-only. Both sides use the SUBSTITUTED trend
    update b' = g*a*x - g*a*l + (1-g+g*(1-a))*b (= 0.15x - 0.15l + 0.85b
    here), algebraically identical to the textbook two-step form but free
    of intra-struct dependence — necessary because DuckDB's
    ``list_reduce`` mutates struct accumulators field-by-field (its 'b'
    expression would observe the already-updated 'l'; found r7, so the
    oracle steps a recursive CTE whose per-row SELECT is atomic, with the
    IDENTICAL expression text → bit-identical doubles before the final
    ROUND). Daily sums round to 4dp first (the events_growth convention)
    so both engines fold identical inputs.

    Scale: the fold is per-group state of 2 doubles over an array whose
    length is the series length (days), not event volume — the daily
    partial-agg is the only stage that sees raw events. A 100 TB events
    table with a 10-year span folds 3,650 doubles per key: trivially
    in-row. Driver holds nothing."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    arr = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("transform(array_sort(collect_list(struct(d, v))), x -> x.v)").alias(
            "vs"
        ),
    )
    folded = arr.withColumn(
        "st",
        F.expr(
            """
            aggregate(
              slice(vs, 2, size(vs) - 1),
              named_struct('l', element_at(vs, 1), 'b', CAST(0.0 AS DOUBLE)),
              (acc, x) -> named_struct(
                'l', 0.5D * x + 0.5D * (acc.l + acc.b),
                'b', 0.15D * x - 0.15D * acc.l + 0.85D * acc.b))
            """
        ),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.b"), 6).alias("trend"),
        F.round(F.col("st.l") + 7 * F.col("st.b"), 6).alias("forecast_7d"),
    )


# ---------------------------------------------------------------------------
# Haar wavelet scale-energy decomposition (round 7)
# ---------------------------------------------------------------------------


@register(
    "events_haar_wavelet",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type, list(CAST(v AS DOUBLE) ORDER BY d) AS vs
      FROM daily GROUP BY 1
      HAVING COUNT(*) >= 8
    ),
    l1 AS (
      SELECT event_type,
        list_transform(generate_series(1, len(vs) // 2),
          i -> (vs[2*i - 1] + vs[2*i]) / 2.0) AS a1,
        list_transform(generate_series(1, len(vs) // 2),
          i -> (vs[2*i - 1] - vs[2*i]) / 2.0) AS d1
      FROM arr
    ),
    l2 AS (
      SELECT event_type, a1, d1,
        list_transform(generate_series(1, len(a1) // 2),
          i -> (a1[2*i - 1] + a1[2*i]) / 2.0) AS a2,
        list_transform(generate_series(1, len(a1) // 2),
          i -> (a1[2*i - 1] - a1[2*i]) / 2.0) AS d2
      FROM l1
    ),
    l3 AS (
      SELECT event_type, d1, d2,
        list_transform(generate_series(1, len(a2) // 2),
          i -> (a2[2*i - 1] - a2[2*i]) / 2.0) AS d3
      FROM l2
    ),
    lv AS (
      SELECT event_type, 1 AS level, d1 AS dd FROM l3
      UNION ALL SELECT event_type, 2, d2 FROM l3
      UNION ALL SELECT event_type, 3, d3 FROM l3
    )
    SELECT event_type, CAST(level AS INT) AS level,
           CAST(len(dd) AS BIGINT) AS n_coeffs,
           ROUND(list_reduce(list_prepend(0.0::DOUBLE, dd),
                             (acc, x) -> acc + abs(x)) / len(dd), 6) AS energy
    FROM lv
    """,
)
def events_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet scale-energy decomposition of each event type's daily
    series: three levels of pairwise average/difference, reporting the
    mean |detail coefficient| per level — "which timescale (2/4/8-day)
    carries the variance", the classic multi-resolution screen before
    seasonality modeling (and the compression transform behind SAX-like
    symbolic methods; complements `events_sax` and `events_periodogram`).

    All three levels are in-row array lambdas over the per-type ordered
    daily array — zero shuffles past the daily partial-agg, driver holds
    nothing. The energy fold accumulates sequentially in both engines
    (Spark ``aggregate``, DuckDB ``list_reduce`` with a SCALAR
    accumulator — immune to the struct field-mutation hazard
    events_holt_trend documents), and odd-length levels drop their
    trailing element (len//2 pairs), so the doubles agree bit-for-bit
    before ROUND.

    Series shorter than 8 points are excluded in BOTH engines (Spark
    filter + oracle HAVING): a 3-level decomposition needs >= 8 samples
    for level 3 to exist, and below 2 samples Spark's ``sequence(1, 0)``
    steps BACKWARD to [1, 0] (element_at then wraps negatively) while
    DuckDB's ``generate_series(1, 0)`` is empty — a silent cross-engine
    divergence.  The pair() builder additionally hard-guards the
    sub-2-element case so the helper stays safe under reuse."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    arr = daily.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(d, v))), x -> x.v)").alias(
            "vs"
        )
    ).filter(F.size("vs") >= 8)

    def pair(src: str, op: str) -> str:
        return (
            f"CASE WHEN size({src}) >= 2 THEN "
            f"transform(sequence(1, size({src}) div 2),"
            f" i -> (element_at({src}, CAST(2*i - 1 AS INT))"
            f" {op} element_at({src}, CAST(2*i AS INT))) / 2.0D)"
            f" ELSE CAST(array() AS array<double>) END"
        )

    lv = (
        arr.withColumn("a1", F.expr(pair("vs", "+")))
        .withColumn("d1", F.expr(pair("vs", "-")))
        .withColumn("a2", F.expr(pair("a1", "+")))
        .withColumn("d2", F.expr(pair("a1", "-")))
        .withColumn("d3", F.expr(pair("a2", "-")))
        .select(
            "event_type",
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("level"), F.col("d1").alias("dd")),
                    F.struct(F.lit(2).alias("level"), F.col("d2").alias("dd")),
                    F.struct(F.lit(3).alias("level"), F.col("d3").alias("dd")),
                )
            ).alias("s"),
        )
        .select("event_type", "s.level", "s.dd")
    )
    return lv.select(
        "event_type",
        F.col("level").cast("int").alias("level"),
        F.size("dd").cast("long").alias("n_coeffs"),
        F.round(
            F.expr("aggregate(dd, CAST(0.0 AS DOUBLE), (acc, x) -> acc + abs(x))")
            / F.size("dd"),
            6,
        ).alias("energy"),
    )


# ---------------------------------------------------------------------------
# Local-peak detection (round 7)
# ---------------------------------------------------------------------------


@register(
    "events_peak_detection",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    st AS (
      SELECT event_type, AVG(v) AS mu, STDDEV_SAMP(v) AS sd
      FROM daily GROUP BY 1
    ),
    lagged AS (
      SELECT d.event_type, d.d, d.v,
             LAG(d.v)  OVER (PARTITION BY d.event_type ORDER BY d.d) AS pv,
             LEAD(d.v) OVER (PARTITION BY d.event_type ORDER BY d.d) AS nv,
             s.mu, s.sd
      FROM daily d JOIN st s ON s.event_type = d.event_type
    )
    SELECT event_type, d, v,
           ROUND((v - mu) / sd, 6) AS z
    FROM lagged
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND v > pv AND v > nv
      AND (v - mu) / sd > 1.0
    """,
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection on each event type's daily series: a day is a
    peak when it exceeds BOTH neighbors (strict local maximum, boundary
    days excluded) and its z-score clears a prominence threshold (+1σ) —
    the alerting primitive behind spike detection dashboards, and the
    seed step of peak/valley segmentation.

    Plan: the shared daily partial-agg, a broadcast per-type (μ, σ)
    aggregate, and ONE window supplying both lag and lead (same sort
    serves both frames). Per-type window state is three rows; nothing
    scales with event volume past the first agg."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    st = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = (
        daily.join(F.broadcast(st), "event_type")
        .withColumn("pv", F.lag("v").over(w))
        .withColumn("nv", F.lead("v").over(w))
    )
    z = (F.col("v") - F.col("mu")) / F.col("sd")
    return lagged.filter(
        F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
        & (F.col("v") > F.col("pv"))
        & (F.col("v") > F.col("nv"))
        & (z > 1.0)
    ).select("event_type", "d", "v", F.round(z, 6).alias("z"))


# ---------------------------------------------------------------------------
# Changepoint detection by binary segmentation (round 8)
# ---------------------------------------------------------------------------


@register(
    "events_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    pre AS (
      SELECT event_type, d, v,
             SUM(v) OVER (PARTITION BY event_type ORDER BY d) AS sk,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS k,
             SUM(v) OVER (PARTITION BY event_type) AS s,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    cand AS (
      SELECT event_type, d, k, n, sk, s,
             CAST(FLOOR((sk * sk / k + (s - sk) * (s - sk) / (n - k)
                         - s * s / n) * 1e2) AS BIGINT) AS gain_centi
      FROM pre WHERE k < n
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY gain_centi DESC, k) AS rk
      FROM cand
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(d AS INT) AS cp_day,
           FLOOR(sk / k * 1e4) / 1e4 AS mean_before,
           FLOOR((s - sk) / (n - k) * 1e4) / 1e4 AS mean_after,
           gain_centi
    FROM best WHERE rk = 1
    """,
)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection by binary segmentation over each event
    type's daily-revenue series: the split k maximizing the SSE reduction
    R(k) = S_k^2/k + (S_n-S_k)^2/(n-k) - S_n^2/n (the between-segment term
    of the total sum of squares — identical to minimizing the two-segment
    SSE, the base step of the classic binary-segmentation / PELT family).
    Reports the last day of the left segment and the two segment means.

    Plan: the only event-volume stage is the daily partial-agg; the gain
    scan is two window passes over the O(types x days) series (running
    prefix sum + full-partition sum), then a per-type argmax via
    WindowGroupLimit. The prefix sums accumulate left-to-right in BOTH
    engines, so the doubles agree bit-for-bit; the argmax gates on a
    FLOOR-to-centi integer gain and the means FLOOR to 4dp — ROUND here
    diverged at sf0.01 (measured: 3031.9388 vs 3031.9387 — an exact
    .93875 shortest-repr half that Spark's BigDecimal HALF_UP and
    DuckDB's binary-value round resolve oppositely; the mmr_micro /
    cone_search FLOOR convention). Ties break on the earlier split.

    Scale: days are bounded by the calendar, so all post-daily stages are
    O(types x days) regardless of input volume — the 100 TB cost is the
    one map-side-combined aggregate over the event scan."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    w_ord = Window.partitionBy("event_type").orderBy("d")
    w_all = Window.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        "d",
        "v",
        F.sum("v").over(w_ord).alias("sk"),
        F.row_number().over(w_ord).alias("k"),
        F.sum("v").over(w_all).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    sk, s, k, n = F.col("sk"), F.col("s"), F.col("k"), F.col("n")
    cand = pre.filter(k < n).withColumn(
        "gain_centi",
        F.floor(
            (sk * sk / k + (s - sk) * (s - sk) / (n - k) - s * s / n) * 1e2
        ).cast("long"),
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("gain_centi"), "k")
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.col("d").cast("int").alias("cp_day"),
        (F.floor(sk / k * 1e4) / 1e4).alias("mean_before"),
        (F.floor((s - sk) / (n - k) * 1e4) / 1e4).alias("mean_after"),
        "gain_centi",
    )


# ---------------------------------------------------------------------------
# Hurst exponent by rescaled-range (R/S) analysis (round 8)
# ---------------------------------------------------------------------------


@register(
    "events_hurst",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    pos AS (
      SELECT event_type, d, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1 AS i
      FROM daily
    ),
    blocks AS (
      SELECT p.event_type, w.w, p.i // w.w AS blk, p.d, p.v
      FROM pos p CROSS JOIN (VALUES (4), (8), (16)) AS w(w)
    ),
    dev AS (
      SELECT event_type, w, blk, v,
             SUM(v) OVER (PARTITION BY event_type, w, blk ORDER BY d)
               - (ROW_NUMBER() OVER (PARTITION BY event_type, w, blk
                                     ORDER BY d))
                 * (AVG(v) OVER (PARTITION BY event_type, w, blk)) AS cumdev
      FROM blocks
    ),
    rs AS (
      SELECT event_type, w, blk,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             MAX(cumdev) - MIN(cumdev) AS r,
             stddev_pop(v) AS sd
      FROM dev GROUP BY 1, 2, 3
    ),
    scale AS (
      SELECT event_type, w, ROUND(AVG(r / sd), 6) AS rs_avg
      FROM rs WHERE cnt = w AND sd > 0
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT event_type,
             MAX(CASE WHEN w = 4 THEN rs_avg END) AS rs4,
             MAX(CASE WHEN w = 8 THEN rs_avg END) AS rs8,
             MAX(CASE WHEN w = 16 THEN rs_avg END) AS rs16
      FROM scale GROUP BY 1
    )
    SELECT event_type, rs4, rs8, rs16,
           ROUND(ln(rs16 / rs4) / (2 * ln(2)), 4) AS hurst
    FROM wide
    """,
)
def events_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
    Mandelbrot & Wallis 1969) over each type's daily series: at window
    sizes 4/8/16 split the series into complete blocks, per block compute
    R/S = (max-min of the cumulative mean-deviation) / population stddev,
    average over blocks, and fit the log2-log2 slope — H ~ 0.5 is a random
    walk, H > 0.5 persistent trending, H < 0.5 mean-reverting. The classic
    long-range-dependence screen before choosing a forecasting model
    (complements `events_acf` / `events_periodogram` / `events_hurst`'s
    sibling `events_haar_wavelet`).

    Scales are 4/8/16 because the fixture stream spans 30 calendar days
    (measured per type, all tiers) — a 32-day block would never complete
    and its rs column would be vacuously NULL. The slope uses the
    symmetric closed form over the three scales,
    (log2 rs16 - log2 rs4) / 2, computed from the ROUND(·, 6) per-scale
    averages in BOTH engines so the cross-engine hash cannot be broken by
    last-ulp libm differences in ln().

    Plan: everything past the daily partial-agg operates on O(types x
    days x 3) rows — two window passes (running block sum + block mean)
    and two tiny aggregates. Incomplete trailing blocks are excluded
    (cnt = w) in both engines."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    pos = daily.select(
        "event_type",
        "d",
        "v",
        (F.row_number().over(Window.partitionBy("event_type").orderBy("d")) - 1).alias(
            "i"
        ),
    )
    ws = spark.range(1).select(
        F.explode(F.array(F.lit(4), F.lit(8), F.lit(16))).alias("w")
    )
    blocks = pos.crossJoin(F.broadcast(ws)).select(
        "event_type", "w", (F.col("i") / F.col("w")).cast("long").alias("blk"), "d", "v"
    )
    w_blk_ord = Window.partitionBy("event_type", "w", "blk").orderBy("d")
    w_blk = Window.partitionBy("event_type", "w", "blk")
    dev = blocks.select(
        "event_type",
        "w",
        "blk",
        "v",
        (
            F.sum("v").over(w_blk_ord)
            - F.row_number().over(w_blk_ord) * F.avg("v").over(w_blk)
        ).alias("cumdev"),
    )
    rs = dev.groupBy("event_type", "w", "blk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        (F.max("cumdev") - F.min("cumdev")).alias("r"),
        F.stddev_pop("v").alias("sd"),
    )
    scale = (
        rs.filter((F.col("cnt") == F.col("w")) & (F.col("sd") > 0))
        .groupBy("event_type", "w")
        .agg(F.round(F.avg(F.col("r") / F.col("sd")), 6).alias("rs_avg"))
    )
    wide = scale.groupBy("event_type").agg(
        F.max(F.when(F.col("w") == 4, F.col("rs_avg"))).alias("rs4"),
        F.max(F.when(F.col("w") == 8, F.col("rs_avg"))).alias("rs8"),
        F.max(F.when(F.col("w") == 16, F.col("rs_avg"))).alias("rs16"),
    )
    return wide.select(
        "event_type",
        "rs4",
        "rs8",
        "rs16",
        F.round(
            F.log(F.col("rs16") / F.col("rs4")) / (2 * math.log(2.0)), 4
        ).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# Ljung-Box white-noise test (round 8)
# ---------------------------------------------------------------------------


@register(
    "events_ljungbox",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    n_tab AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1
    ),
    rho AS (
      SELECT s1.event_type, lags.lag,
             ROUND(corr(s1.v, s2.v), 6) AS acf
      FROM daily s1
      CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) AS lags(lag)
      JOIN daily s2 ON s2.event_type = s1.event_type AND s2.d = s1.d + lags.lag
      GROUP BY s1.event_type, lags.lag
    )
    SELECT r.event_type, n.n AS n_days,
           ROUND(n.n * (n.n + 2) * SUM(acf * acf / (n.n - r.lag)), 4) AS q_stat,
           CAST(7 AS INT) AS df,
           CAST(CASE WHEN n.n * (n.n + 2) * SUM(acf * acf / (n.n - r.lag))
                          > 14.0671 THEN 1 ELSE 0 END AS INT) AS reject_iid
    FROM rho r JOIN n_tab n USING (event_type)
    GROUP BY r.event_type, n.n
    """,
)
def events_ljungbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau white-noise test at lags 1..7 per event type:
    Q = n(n+2) * sum_l rho_l^2 / (n-l), compared against the chi-square
    0.95 critical value at df=7 (14.0671) — "does this series have ANY
    autocorrelation structure worth modeling", the standard pre-test
    before fitting ARMA-family models (and the residual-whiteness check
    after). Builds on the same aligned-pair ACF as `events_acf`; the
    autocorrelations enter Q after ROUND(·, 6) in both engines so the
    cross-engine hash pins the decision, not just the statistic.

    Plan: daily partial-agg (the only event-volume stage), tiny
    O(types x days x 7) self-join for the lag alignment, then two
    O(types) aggregates. Days are calendar-bounded, so the test costs
    the same at 100 TB as at 100 MB past the first scan."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    n_tab = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    s1 = daily.alias("s1").crossJoin(F.broadcast(lags))
    s2 = daily.alias("s2")
    rho = (
        s1.join(
            s2,
            (F.col("s2.event_type") == F.col("s1.event_type"))
            & (F.col("s2.d") == F.col("s1.d") + F.col("lag")),
        )
        .groupBy(F.col("s1.event_type").alias("event_type"), "lag")
        .agg(F.round(F.corr("s1.v", "s2.v"), 6).alias("acf"))
    )
    n = F.col("n")
    q_raw = n * (n + 2) * F.sum(
        F.col("acf") * F.col("acf") / (n - F.col("lag"))
    )
    return (
        rho.join(F.broadcast(n_tab), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.round(q_raw, 4).alias("q_stat"),
            F.lit(7).cast("int").alias("df"),
            F.when(q_raw > 14.0671, 1).otherwise(0).cast("int").alias("reject_iid"),
        )
        .select(
            "event_type",
            n.alias("n_days"),
            "q_stat",
            "df",
            "reject_iid",
        )
    )


# ---------------------------------------------------------------------------
# Structure function of the daily series (round 8)
# ---------------------------------------------------------------------------


@register(
    "lightcurve_structure_function",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT s1.event_type,
           CAST(FLOOR(ln(s2.d - s1.d) / ln(2.0)) AS INT) AS lag_bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG((s2.v - s1.v) * (s2.v - s1.v)), 4) AS sf
    FROM daily s1
    JOIN daily s2 ON s2.event_type = s1.event_type AND s2.d > s1.d
    GROUP BY 1, 2
    """,
)
def lightcurve_structure_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order structure function of each type's daily series:
    SF(tau) = <(v(t+tau) - v(t))^2> binned by log2 time lag — the AGN /
    variable-star variability-timescale diagnostic (Simonetti et al. 1985;
    quasar variability surveys fit SF power laws instead of periodograms
    when sampling is irregular). Rising SF = correlated variability up to
    a turnover timescale; flat SF = measurement-noise floor.

    The all-pairs self-join is over the PRE-AGGREGATED daily series —
    O(days^2) pairs per type with days bounded by the calendar (~150 in
    the fixtures), so the pair stage is O(types x days^2) regardless of
    event volume; the only stage that sees input scale is the daily
    partial-agg. log2 via ln()/ln(2) keeps the bin edges identical in
    both engines (integer day differences, exactly representable)."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    s1, s2 = daily.alias("s1"), daily.alias("s2")
    dv = F.col("s2.v") - F.col("s1.v")
    return (
        s1.join(
            s2,
            (F.col("s2.event_type") == F.col("s1.event_type"))
            & (F.col("s2.d") > F.col("s1.d")),
        )
        .groupBy(
            F.col("s1.event_type").alias("event_type"),
            F.floor(F.log(F.col("s2.d") - F.col("s1.d")) / math.log(2.0))
            .cast("int")
            .alias("lag_bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg(dv * dv), 4).alias("sf"),
        )
    )


# ---------------------------------------------------------------------------
# 1-D Kalman filter (local-level model) (round 8)
# ---------------------------------------------------------------------------
_KF_Q = 25.0  # process-noise variance
_KF_R = 400.0  # observation-noise variance


@register(
    "events_kalman_level",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(SUM(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list(CAST(v AS DOUBLE) ORDER BY d) AS vs
      FROM daily GROUP BY 1
    ),
    -- recursive CTE instead of list_reduce: the same struct-accumulator
    -- field-mutation hazard events_holt_trend documents; each step's
    -- SELECT is atomic and uses ONLY the prior (l, p)
    kf(event_type, i, l, p) AS (
      SELECT event_type, CAST(1 AS BIGINT), vs[1], {_KF_R}::DOUBLE FROM arr
      UNION ALL
      SELECT k.event_type, k.i + 1,
             k.l + ((k.p + {_KF_Q}) / (k.p + {_KF_Q} + {_KF_R}))
                   * (a.vs[k.i + 1] - k.l),
             {_KF_R} * (k.p + {_KF_Q}) / (k.p + {_KF_Q} + {_KF_R})
      FROM kf k JOIN arr a USING (event_type)
      WHERE k.i < a.n_days
    )
    SELECT a.event_type, a.n_days,
           ROUND(k.l, 6) AS level,
           ROUND(k.p, 6) AS variance,
           ROUND((k.p + {_KF_Q}) / (k.p + {_KF_Q} + {_KF_R}), 6) AS gain
    FROM arr a JOIN kf k ON k.event_type = a.event_type AND k.i = a.n_days
    """,
)
def events_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Kalman filter over each type's daily series — the local-level
    state-space model (Kalman 1960; Durbin & Koopman's simplest structural
    model): per step the state variance inflates by process noise
    q={_KF_Q}, the gain k = (p+q)/(p+q+r) blends the new observation
    against the prediction, and the posterior variance contracts to
    (1-k)(p+q). Unlike `events_ewma`'s FIXED decay, the Kalman gain
    ADAPTS: it starts high (uncertain state) and converges to the
    steady-state Riccati fixed point — reported as `gain` so the driver
    hash pins the convergence, not just the smoothed level.

    Both engines step the recursion with the same expression text, each
    update reading only the PRIOR (l, p) — the substituted no-intra-step-
    dependence form `events_holt_trend` introduced (and the same
    recursive-CTE oracle, for DuckDB's list_reduce field-mutation
    hazard). Spark folds a 2-double struct through the collected ordered
    array: per-group state is O(1), series length is calendar-bounded,
    and the only event-volume stage is the daily partial-agg."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round("v", 4).alias("v")
    )
    arr = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("transform(array_sort(collect_list(struct(d, v))), x -> x.v)").alias(
            "vs"
        ),
    )
    folded = arr.withColumn(
        "st",
        F.expr(
            f"""
            aggregate(
              slice(vs, 2, size(vs) - 1),
              named_struct('l', element_at(vs, 1), 'p', CAST({_KF_R} AS DOUBLE)),
              (acc, x) -> named_struct(
                'l', acc.l + ((acc.p + {_KF_Q}D) / (acc.p + {_KF_Q}D + {_KF_R}D))
                             * (x - acc.l),
                'p', {_KF_R}D * (acc.p + {_KF_Q}D)
                     / (acc.p + {_KF_Q}D + {_KF_R}D)))
            """
        ),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.p"), 6).alias("variance"),
        F.round(
            (F.col("st.p") + _KF_Q) / (F.col("st.p") + _KF_Q + _KF_R), 6
        ).alias("gain"),
    )


# ---------------------------------------------------------------------------
# Little's law WIP audit (round 8)
# ---------------------------------------------------------------------------


@register(
    "orders_littles_law",
    oracle="""
    WITH life AS (
      SELECT o_orderkey,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS a_d,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               + CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
                                          1, 15)) AS BIGINT) % 60 + 1 AS c_d,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS a_month
      FROM orders
    ),
    months AS (
      SELECT DISTINCT a_month AS m,
             datediff('day', DATE '1995-01-01', a_month) AS ms_d,
             datediff('day', DATE '1995-01-01',
                      CAST(a_month + INTERVAL 1 MONTH AS DATE)) AS me_d
      FROM life
    ),
    arr AS (
      SELECT a_month AS m,
             CAST(COUNT(*) AS BIGINT) AS n_arrivals,
             CAST(SUM(c_d - a_d) AS BIGINT) AS sum_w
      FROM life GROUP BY 1
    ),
    wip AS (
      SELECT mo.m,
             CAST(SUM(GREATEST(0, LEAST(l.c_d, mo.me_d)
                                  - GREATEST(l.a_d, mo.ms_d))) AS BIGINT)
               AS wip_days
      FROM months mo JOIN life l
        ON l.a_d < mo.me_d AND l.c_d > mo.ms_d
      GROUP BY 1
    )
    SELECT CAST(a.m AS DATE) AS month,
           a.n_arrivals,
           FLOOR(CAST(a.n_arrivals AS DOUBLE) / (mo.me_d - mo.ms_d) * 1e4)
             / 1e4 AS lambda_per_day,
           FLOOR(CAST(a.sum_w AS DOUBLE) / a.n_arrivals * 1e4) / 1e4
             AS avg_cycle_days,
           FLOOR(CAST(w.wip_days AS DOUBLE) / (mo.me_d - mo.ms_d) * 1e4) / 1e4
             AS avg_wip,
           FLOOR(CAST(w.wip_days AS DOUBLE) / (mo.me_d - mo.ms_d)
                 / ((CAST(a.n_arrivals AS DOUBLE) / (mo.me_d - mo.ms_d))
                    * (CAST(a.sum_w AS DOUBLE) / a.n_arrivals)) * 1e4) / 1e4
             AS littles_ratio
    FROM arr a
    JOIN months mo ON mo.m = a.m
    JOIN wip w ON w.m = a.m
    """,
)
def orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit over the order-fulfillment queue: per arrival
    month, the arrival rate lambda (orders/day), mean cycle time W
    (order date -> last line shipment, days), time-average work-in-process
    L (order-days in flight during the month / days in month), and the
    L/(lambda*W) ratio — ~1 under stationarity (Little 1961), drifting at
    the data edges and under load shifts. The queueing-theory sanity check
    ops teams run on fulfillment pipelines, and a cross-check tying three
    INDEPENDENTLY computed aggregates together (the hash pins all three
    and their consistency).

    Service times are the repo's deterministic md5 draw (1-60 days per
    order) rather than l_shipdate: the fixture's synthetic shipdates are
    UNCORRELATED with order dates (measured: shipdate - orderdate spans
    -2383..+2478 days, 1 percent below -2058), so raw "cycle times" are
    negative for a third of orders and the conservation law the operator
    exists to check would be vacuously broken by the data generator, not
    the math. With well-defined lifetimes the interior-month ratio pins
    ~1 (tests/test_stats_extra.py).

    Plan: lifetimes are a narrow projection; WIP uses the interval-overlap
    trick — a theta join against the O(months) calendar table (broadcast)
    with closed-form overlap arithmetic, NEVER a per-day explode. All
    quantities are exact integer day sums; the published rates FLOOR to
    4dp (integer ratios land exactly on .xxxx5 shortest-repr halves where
    Spark's and DuckDB's ROUND disagree — the events_changepoint class)."""
    o = load(spark, sf_dir, "orders")
    epoch = F.lit("1995-01-01").cast("date")
    a_d = F.datediff(F.col("o_orderdate").cast("date"), epoch)
    dur = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 60
        + 1
    )
    life = o.select(
        "o_orderkey",
        a_d.alias("a_d"),
        (a_d + dur).alias("c_d"),
        F.date_trunc("month", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("a_month"),
    )
    months = life.select(
        F.col("a_month").alias("m"),
        F.datediff("a_month", epoch).alias("ms_d"),
        F.datediff(F.add_months("a_month", 1), epoch).alias("me_d"),
    ).distinct()
    arr = life.groupBy(F.col("a_month").alias("m")).agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals"),
        F.sum(F.col("c_d") - F.col("a_d")).cast("long").alias("sum_w"),
    )
    wip = (
        F.broadcast(months)
        .join(life, (life.a_d < F.col("me_d")) & (life.c_d > F.col("ms_d")))
        .groupBy("m")
        .agg(
            F.sum(
                F.greatest(
                    F.lit(0),
                    F.least(F.col("c_d"), F.col("me_d"))
                    - F.greatest(F.col("a_d"), F.col("ms_d")),
                )
            )
            .cast("long")
            .alias("wip_days")
        )
    )
    dim = F.col("me_d") - F.col("ms_d")
    lam = F.col("n_arrivals").cast("double") / dim
    wbar = F.col("sum_w").cast("double") / F.col("n_arrivals")
    lbar = F.col("wip_days").cast("double") / dim

    def f4(c):
        return F.floor(c * 1e4) / 1e4

    return (
        arr.join(F.broadcast(months), "m")
        .join(wip, "m")
        .select(
            F.col("m").alias("month"),
            "n_arrivals",
            f4(lam).alias("lambda_per_day"),
            f4(wbar).alias("avg_cycle_days"),
            f4(lbar).alias("avg_wip"),
            f4(lbar / (lam * wbar)).alias("littles_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Log-log price elasticity (round 8)
# ---------------------------------------------------------------------------


@register(
    "orders_price_elasticity",
    oracle="""
    WITH per_part AS (
      SELECT l.l_partkey,
             string_split(p.p_name, ' ')[2] AS category,
             SUM(l.l_quantity) AS qty,
             AVG(l.l_extendedprice / l.l_quantity) AS unit_price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    )
    SELECT category,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(regr_slope(ln(qty), ln(unit_price)), 6) AS elasticity,
           ROUND(regr_r2(ln(qty), ln(unit_price)), 6) AS fit_r2,
           ROUND(AVG(unit_price), 4) AS avg_unit_price
    FROM per_part GROUP BY category
    """,
)
def orders_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per product category (the part
    name's noun): within a category, OLS of ln(total quantity sold) on
    ln(average unit price) across parts — the cross-sectional elasticity
    estimate pricing teams compute before a price move (slope ~ -1 means
    revenue-neutral; the fixture's synthetic independence shows up as
    slope ~ 0 with near-zero r2, and THAT is the null-result reading the
    operator's fit_r2 column exists to force: an elasticity without its
    r2 is a number, not an estimate).

    Plan: one lineitem scan with a broadcast part join partial-aggregates
    to O(parts) rows; the regression is `regr_slope`/`regr_r2` over the
    per-part frame grouped by O(categories) keys — the `agg_linreg`
    posture. ln of exact integer-derived ratios; ROUND(·, 6) gates the
    hash (text_zipf exposure class)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    per_part = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            "l_partkey",
            F.split(F.col("p_name"), " ").getItem(1).alias("category"),
        )
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            ),
        )
    )
    lq, lp = F.log("qty"), F.log("unit_price")
    return per_part.groupBy("category").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.regr_slope(lq, lp), 6).alias("elasticity"),
        F.round(F.regr_r2(lq, lp), 6).alias("fit_r2"),
        F.round(F.avg("unit_price"), 4).alias("avg_unit_price"),
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution + entropy rate (round 8)
# ---------------------------------------------------------------------------
_MKV_ROUNDS = 20  # fixed power-iteration rounds (5-state chain converges ~1e-12)


def _markov_stationary_oracle() -> str:
    it = """
    pi{b} AS MATERIALIZED (
      SELECT p.next_type AS state, SUM(pi.pi * p.p) AS pi
      FROM p JOIN pi{a} pi ON pi.state = p.prev_type
      GROUP BY p.next_type
    )"""
    rounds = ",".join(it.format(a=i, b=i + 1) for i in range(_MKV_ROUNDS))
    return f"""
    WITH seq AS MATERIALIZED (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    c AS MATERIALIZED (
      SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS DOUBLE) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    t AS (SELECT prev_type, SUM(n) AS tot FROM c GROUP BY prev_type),
    -- MATERIALIZED: without it DuckDB re-inlines the upstream (incl. the
    -- event-scan window) into every unrolled round reference — measured
    -- 226s -> 0.1s at sf0.01
    p AS MATERIALIZED (SELECT c.prev_type, c.next_type, c.n / t.tot AS p
          FROM c JOIN t USING (prev_type)),
    pi0 AS (
      SELECT prev_type AS state,
             1.0 / (SELECT COUNT(*) FROM t) AS pi
      FROM t
    ),
    {rounds},
    h AS (
      SELECT prev_type AS state, -SUM(p * ln(p)) AS row_entropy
      FROM p GROUP BY prev_type
    ),
    fin AS MATERIALIZED (
      SELECT pi{_MKV_ROUNDS}.state, pi{_MKV_ROUNDS}.pi, h.row_entropy
      FROM pi{_MKV_ROUNDS} JOIN h USING (state)
    )
    SELECT state, ROUND(pi, 6) AS pi,
           ROUND(row_entropy, 6) AS row_entropy,
           ROUND((SELECT SUM(pi * row_entropy) FROM fin), 6) AS entropy_rate
    FROM fin
    """


@register("events_markov_stationary", oracle=_markov_stationary_oracle())
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution and entropy rate of the `events_markov`
    transition chain: pi = pi*P by {_MKV_ROUNDS} fixed power-iteration
    rounds from uniform (the graph_pagerank determinism contract — the
    5-state chain converges to ~1e-12 well inside the bound, so the fixed
    count is the fixpoint, not a truncation), plus the chain's entropy
    rate H = sum_i pi_i * (-sum_j p_ij ln p_ij) — how unpredictable the
    NEXT action is in steady state (0 = deterministic funnel; ln(5) =
    uniform chaos), the single-number sequence-complexity screen next to
    `events_markov`'s full matrix.

    The transition matrix is O(|types|^2) BY CONSTRUCTION (here 5x5), so
    the iteration runs driver-side on the collected matrix — the
    vec_kmeans/sim_ann_ivf bounded-collect contract — and the per-user
    lag window is the only stage that sees event volume. Products sum in
    sorted-state order; both engines' last-ulp noise is absorbed by
    ROUND(·, 6) after 20 contraction rounds."""
    ev = load(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    p = c.join(t, "prev_type").select(
        "prev_type", "next_type", (F.col("n") / F.col("tot")).alias("p")
    )
    rows = p.collect()  # O(|types|^2) rows by construction
    states = sorted({r.prev_type for r in rows} | {r.next_type for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    mat = [[0.0] * len(states) for _ in states]
    for r in rows:
        mat[idx[r.prev_type]][idx[r.next_type]] = r.p
    pi = [1.0 / len(states)] * len(states)
    for _ in range(_MKV_ROUNDS):
        pi = [
            sum(pi[i] * mat[i][j] for i in range(len(states)))
            for j in range(len(states))
        ]
    h = [
        -sum(pij * math.log(pij) for pij in row if pij > 0.0) for row in mat
    ]
    rate = sum(pi[i] * h[i] for i in range(len(states)))
    lit = ", ".join(
        f"('{s}', {pi[idx[s]]!r}D, {h[idx[s]]!r}D)" for s in states
    )
    return spark.sql(
        f"SELECT state, ROUND(pi, 6) AS pi, ROUND(row_entropy, 6) AS row_entropy,"
        f" ROUND({rate!r}D, 6) AS entropy_rate"
        f" FROM (VALUES {lit}) AS t(state, pi, row_entropy)"
    )


# ---------------------------------------------------------------------------
# Spectral entropy of the daily series (round 8, continuation)
# ---------------------------------------------------------------------------
# Reuses the `events_periodogram` trial-period grid: spectral entropy is the
# Shannon entropy of the NORMALIZED periodogram, a single scale-free number
# per series ("how concentrated is the rhythm?") where the periodogram is the
# full curve. tsfeatures/catch22 both ship it as a headline feature.


@register(
    "events_spectral_entropy",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2
    ),
    ctr AS (
      SELECT d.event_type, d.d, d.y - s.mu AS yc
      FROM daily d JOIN (SELECT event_type, AVG(y) AS mu
                         FROM daily GROUP BY event_type) s
      USING (event_type)
    ),
    grid AS (SELECT unnest(ARRAY{list(_PGRAM_PERIODS)}) AS period),
    comp AS (
      SELECT c.event_type, g.period,
             SUM(c.yc * cos(2 * pi() * c.d / g.period)) AS cr,
             SUM(c.yc * sin(2 * pi() * c.d / g.period)) AS si
      FROM ctr c CROSS JOIN grid g
      GROUP BY 1, 2
    ),
    pw AS (
      SELECT event_type, period, cr * cr + si * si AS p
      FROM comp
    ),
    tot AS (SELECT event_type, SUM(p) AS tp FROM pw GROUP BY event_type)
    SELECT pw.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_periods,
           FLOOR(-SUM(CASE WHEN pw.p > 0
                           THEN pw.p / t.tp * ln(pw.p / t.tp) ELSE 0 END)
                 / ln(CAST(COUNT(*) AS DOUBLE)) * 10000) / 10000
             AS spectral_entropy,
           FLOOR(MAX(pw.p / t.tp) * 10000) / 10000 AS peak_share
    FROM pw JOIN tot t USING (event_type)
    GROUP BY pw.event_type
    """,
)
def events_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy per event type: Shannon entropy of the
    periodogram shares p_i / sum(p) over the `events_periodogram` trial
    grid, divided by ln(n_periods) so 1.0 = white noise (flat spectrum)
    and 0.0 = a pure tone — the tsfeatures/catch22 "forecastability"
    feature, with the dominant period's power share (`peak_share`)
    alongside as the complementary concentration readout. A weekly
    rhythm drives entropy down and peak_share up at period 7.

    Plan: identical exchange profile to `events_periodogram` (one
    partial agg over raw events to O(types x days), trial periods
    multiply that tiny frame) plus one O(types x periods) reduction —
    the entropy adds NO new data-volume stage. Cross-engine: trig on
    exact rational arguments per the module convention; shares are
    ratios of same-engine sums, entropy FLOORs at 1e-4."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    mu = daily.groupBy("event_type").agg(F.avg("y").alias("mu"))
    ctr = daily.join(F.broadcast(mu), "event_type").select(
        "event_type", "d", (F.col("y") - F.col("mu")).alias("yc")
    )
    grid = F.explode(F.array(*[F.lit(p) for p in _PGRAM_PERIODS])).alias("period")
    pw = (
        ctr.select("event_type", "d", "yc", grid)
        .groupBy("event_type", "period")
        .agg(
            F.sum(F.col("yc") * F.cos(2 * math.pi * F.col("d") / F.col("period"))).alias(
                "cr"
            ),
            F.sum(F.col("yc") * F.sin(2 * math.pi * F.col("d") / F.col("period"))).alias(
                "si"
            ),
        )
        .select(
            "event_type",
            (F.col("cr") * F.col("cr") + F.col("si") * F.col("si")).alias("p"),
        )
    )
    tot = pw.groupBy("event_type").agg(F.sum("p").alias("tp"))
    share = F.col("p") / F.col("tp")
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return (
        pw.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_periods"),
            f4(
                -F.sum(F.when(F.col("p") > 0, share * F.log(share)).otherwise(0.0))
                / F.log(F.count(F.lit(1)).cast("double"))
            ).alias("spectral_entropy"),
            f4(F.max(share)).alias("peak_share"),
        )
    )


# ---------------------------------------------------------------------------
# Stetson variability indices (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "lightcurve_stetson",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(v) AS mu, stddev_samp(v) AS sd
      FROM daily GROUP BY event_type
    ),
    delta AS (
      SELECT d.event_type, d.d,
             sqrt(m.n / (m.n - 1)) * (d.v - m.mu) / m.sd AS dl,
             m.n AS n
      FROM daily d JOIN mom m USING (event_type)
    ),
    pairs AS (
      SELECT a.event_type, a.dl * b.dl AS pk
      FROM delta a JOIN delta b
        ON a.event_type = b.event_type AND b.d = a.d + 1
    ),
    j AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             FLOOR(AVG(CASE WHEN pk >= 0 THEN sqrt(pk)
                            ELSE -sqrt(-pk) END) * 10000) / 10000 AS stetson_j
      FROM pairs GROUP BY event_type
    ),
    k AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
             FLOOR(AVG(ABS(dl)) / sqrt(AVG(dl * dl)) * 10000) / 10000
               AS stetson_k
      FROM delta GROUP BY event_type
    )
    SELECT j.event_type, k.n_days, j.n_pairs, j.stetson_j, k.stetson_k
    FROM j JOIN k USING (event_type)
    """,
)
def lightcurve_stetson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stetson variability indices (Welch & Stetson 1993, Stetson 1996 —
    the standard variable-star detection statistics): J correlates
    consecutive-night residual pairs (sgn(P)*sqrt|P| over P = delta_i *
    delta_(i+1); true variability gives positively correlated adjacent
    residuals, J > 0, while pure noise averages to ~0), and K =
    mean|delta| / sqrt(mean delta²) measures the residual SHAPE (0.798
    for a Gaussian, lower for spiky curves, higher for sinusoids).
    Completes the variability toolkit: `lightcurve_pdm` finds the
    period, `lightcurve_structure_function` the timescale, Stetson J/K
    answer the upstream question — is this source variable at all?

    Plan: the shared O(types x days) daily frame; per-type moments by
    one tiny aggregate, the residual self-pairing an equi-join on
    (type, d+1) exactly like `events_forecast_backtest`'s lag pairing;
    at scale a window lag replaces it partition-locally. sqrt is
    IEEE-exact; FLOOR 1e-4 absorbs accumulation order."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("v").alias("mu"),
        F.stddev_samp("v").alias("sd"),
    )
    delta = daily.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "d",
        (
            F.sqrt(F.col("n") / (F.col("n") - 1))
            * (F.col("v") - F.col("mu"))
            / F.col("sd")
        ).alias("dl"),
        "n",
    )
    a, b = delta.alias("a"), delta.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") == F.col("a.d") + 1),
    ).select(F.col("a.event_type").alias("event_type"), (F.col("a.dl") * F.col("b.dl")).alias("pk"))
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    j = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        f4(
            F.avg(
                F.when(F.col("pk") >= 0, F.sqrt(F.col("pk"))).otherwise(
                    -F.sqrt(-F.col("pk"))
                )
            )
        ).alias("stetson_j"),
    )
    k = delta.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        f4(F.avg(F.abs(F.col("dl"))) / F.sqrt(F.avg(F.col("dl") * F.col("dl")))).alias(
            "stetson_k"
        ),
    )
    return j.join(k, "event_type").select(
        "event_type", "n_days", "n_pairs", "stetson_j", "stetson_k"
    )


# ---------------------------------------------------------------------------
# Granger-causality F-test between event-type series (round 8, continuation)
# ---------------------------------------------------------------------------
_GRANGER_PAIRS = (("view", "purchase"), ("purchase", "view"), ("click", "signup"))


def _granger_one_sql(x: str, y: str) -> str:
    """F-test of 'does x_(t-1) help predict y_t beyond y_(t-1)?' — both
    OLS fits in closed form from centered second moments, one tiny
    aggregate per pair."""
    return f"""
    SELECT '{x}->{y}' AS pair, n,
           FLOOR(rss_r * 10000) / 10000 AS rss_restricted,
           FLOOR(rss_u * 10000) / 10000 AS rss_unrestricted,
           FLOOR((rss_r - rss_u) / (rss_u / (n - 3)) * 10000) / 10000
             AS f_stat
    FROM (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             (SUM(w * w) - SUM(w) * SUM(w) / COUNT(*))
             - (SUM(u * w) - SUM(u) * SUM(w) / COUNT(*))
               * (SUM(u * w) - SUM(u) * SUM(w) / COUNT(*))
               / (SUM(u * u) - SUM(u) * SUM(u) / COUNT(*)) AS rss_r,
             (SUM(w * w) - SUM(w) * SUM(w) / COUNT(*))
             - ((SUM(u * w) - SUM(u) * SUM(w) / COUNT(*))
                  * (SUM(v * v) - SUM(v) * SUM(v) / COUNT(*))
                - (SUM(v * w) - SUM(v) * SUM(w) / COUNT(*))
                  * (SUM(u * v) - SUM(u) * SUM(v) / COUNT(*)))
               / ((SUM(u * u) - SUM(u) * SUM(u) / COUNT(*))
                    * (SUM(v * v) - SUM(v) * SUM(v) / COUNT(*))
                  - (SUM(u * v) - SUM(u) * SUM(v) / COUNT(*))
                    * (SUM(u * v) - SUM(u) * SUM(v) / COUNT(*)))
               * (SUM(u * w) - SUM(u) * SUM(w) / COUNT(*))
             - ((SUM(v * w) - SUM(v) * SUM(w) / COUNT(*))
                  * (SUM(u * u) - SUM(u) * SUM(u) / COUNT(*))
                - (SUM(u * w) - SUM(u) * SUM(w) / COUNT(*))
                  * (SUM(u * v) - SUM(u) * SUM(v) / COUNT(*)))
               / ((SUM(u * u) - SUM(u) * SUM(u) / COUNT(*))
                    * (SUM(v * v) - SUM(v) * SUM(v) / COUNT(*))
                  - (SUM(u * v) - SUM(u) * SUM(v) / COUNT(*))
                    * (SUM(u * v) - SUM(u) * SUM(v) / COUNT(*)))
               * (SUM(v * w) - SUM(v) * SUM(w) / COUNT(*)) AS rss_u
      FROM (
        SELECT yt.cnt AS w, yl.cnt AS u, xl.cnt AS v
        FROM f2s_granger_daily yt
        JOIN f2s_granger_daily yl
          ON yl.event_type = yt.event_type AND yl.d = yt.d - 1
        JOIN f2s_granger_daily xl
          ON xl.event_type = '{x}' AND xl.d = yt.d - 1
        WHERE yt.event_type = '{y}'
      ) z
    ) s
    """


@register(
    "events_granger",
    oracle="WITH f2s_granger_daily AS MATERIALIZED (\n"
    "  SELECT event_type,\n"
    "         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,\n"
    "         CAST(COUNT(*) AS DOUBLE) AS cnt\n"
    "  FROM events GROUP BY 1, 2)\n"
    + " UNION ALL ".join(_granger_one_sql(x, y) for x, y in _GRANGER_PAIRS),
)
def events_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-causality F-test (Granger 1969) between daily event-count
    series: does yesterday's x-count improve today's y-count prediction
    beyond y's own lag? Both the restricted (y_t ~ y_(t-1)) and
    unrestricted (y_t ~ y_(t-1) + x_(t-1)) OLS fits are CLOSED-FORM from
    centered second moments — no iteration, no matrix solver — and
    F = (RSS_r - RSS_u) / (RSS_u / (n-3)) is reported per directed pair
    (view->purchase, purchase->view, click->signup), the lead-lag probe
    run on funnel metrics before anyone claims causation. The fixture's
    independent streams make this a TRUE NULL family: F stays small in
    both directions, and the asymmetry between the two view/purchase
    directions is pure noise — which is exactly what the operator
    certifies (compare `agg_fdr_bh`, the null family with a decision
    rule on top).

    Plan: ONE O(types x days) partial agg (shared via a materialized
    CTE / cached frame), then each pair is two lag equi-joins on the
    tiny frame into a single-row moment aggregate. All engine work on
    identical doubles; FLOOR 1e-4."""
    e = load(spark, sf_dir, "events")
    # materialize the O(types x days) daily frame ONCE, eagerly: a lazy
    # persist() let the three union legs race to populate the cache at
    # collect time (the events scan ran up to 3x cold — the r10 wide-tier
    # mover, 1.5 -> 2.6-3.0s under load) and re-persisted on every call
    # ("already cached" warnings). The checkpointed frame loses size stats,
    # so the lag joins below hint broadcast explicitly (playbook pitfall).
    daily = (
        e.groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    outs = []
    for x, y in _GRANGER_PAIRS:
        yt, yl, xl = daily.alias("yt"), daily.alias("yl"), daily.alias("xl")
        z = (
            yt.filter(F.col("yt.event_type") == y)
            .join(
                F.broadcast(yl),
                (F.col("yl.event_type") == F.col("yt.event_type"))
                & (F.col("yl.d") == F.col("yt.d") - 1),
            )
            .join(
                F.broadcast(xl),
                (F.col("xl.event_type") == x)
                & (F.col("xl.d") == F.col("yt.d") - 1),
            )
            .select(
                F.col("yt.cnt").alias("w"),
                F.col("yl.cnt").alias("u"),
                F.col("xl.cnt").alias("v"),
            )
        )
        n = F.count(F.lit(1)).cast("double")
        s = lambda c: F.sum(F.col(c))  # noqa: E731
        sp = lambda a, b: F.sum(F.col(a) * F.col(b))  # noqa: E731
        cuu = sp("u", "u") - s("u") * s("u") / n
        cvv = sp("v", "v") - s("v") * s("v") / n
        cuv = sp("u", "v") - s("u") * s("v") / n
        cuw = sp("u", "w") - s("u") * s("w") / n
        cvw = sp("v", "w") - s("v") * s("w") / n
        cww = sp("w", "w") - s("w") * s("w") / n
        det = cuu * cvv - cuv * cuv
        rss_r = cww - cuw * cuw / cuu
        rss_u = (
            cww
            - (cuw * cvv - cvw * cuv) / det * cuw
            - (cvw * cuu - cuw * cuv) / det * cvw
        )
        f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
        outs.append(
            z.agg(
                F.lit(f"{x}->{y}").alias("pair"),
                n.alias("n"),
                f4(rss_r).alias("rss_restricted"),
                f4(rss_u).alias("rss_unrestricted"),
                f4((rss_r - rss_u) / (rss_u / (n - 3))).alias("f_stat"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Customer value-tier migration matrix (round 8, continuation)
# ---------------------------------------------------------------------------
_SEG_SPLIT = "1997-07-01"  # period A < split <= period B
# fixed spend-tier edges (deterministic — quantile tiers would couple the
# segmentation to the other period's distribution; orders_rfm owns that)
_SEG_EDGES = (200_000.0, 600_000.0)


def _seg_tier_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} IS NULL THEN 'none'"
        f" WHEN {col} < {_SEG_EDGES[0]} THEN 'low'"
        f" WHEN {col} < {_SEG_EDGES[1]} THEN 'mid'"
        f" ELSE 'high' END"
    )


@register(
    "orders_segment_migration",
    oracle=f"""
    WITH per AS (
      SELECT o_custkey,
             SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '{_SEG_SPLIT}'
                      THEN o_totalprice END) AS spend_a,
             SUM(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '{_SEG_SPLIT}'
                      THEN o_totalprice END) AS spend_b
      FROM orders GROUP BY o_custkey
    ),
    tiers AS (
      SELECT {_seg_tier_sql('spend_a')} AS tier_a,
             {_seg_tier_sql('spend_b')} AS tier_b
      FROM per
    ),
    m AS (
      SELECT tier_a, tier_b, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM tiers GROUP BY 1, 2
    )
    SELECT tier_a, tier_b, n_customers,
           FLOOR(CAST(n_customers AS DOUBLE)
                 / SUM(n_customers) OVER (PARTITION BY tier_a)
                 * 10000) / 10000 AS row_share
    FROM m
    """,
)
def orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier migration matrix — the CRM lifecycle readout
    (upgraded / downgraded / churned / newly-acquired flows between two
    periods): each customer's spend in period A (before {_SEG_SPLIT})
    and period B lands in a fixed tier (none/low/mid/high; 'none' means
    no orders that period, so the none->x row IS acquisition and
    x->none churn), and the matrix reports counts plus row-conditional
    shares P(tier_b | tier_a). The transition complement of
    `retention_cohorts` (presence only) and `orders_rfm` (one-period
    segmentation); `events_markov` is the same shape over event
    streams.

    Plan: one conditional-aggregation scan to O(customers) rows (the
    CUPED two-period split), a narrow tier projection with FIXED edges
    (deterministic; quantile tiers would make each period's labels
    depend on a global sort — orders_rfm owns that variant), one
    O(16)-cell count, and the row shares a window over those cells.
    Integer counts; shares FLOOR 1e-4."""
    o = load(spark, sf_dir, "orders")
    is_a = F.col("o_orderdate").cast("date") < F.lit(_SEG_SPLIT).cast("date")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.when(is_a, F.col("o_totalprice"))).alias("spend_a"),
        F.sum(F.when(~is_a, F.col("o_totalprice"))).alias("spend_b"),
    )

    def tier(col):
        return (
            F.when(F.col(col).isNull(), "none")
            .when(F.col(col) < _SEG_EDGES[0], "low")
            .when(F.col(col) < _SEG_EDGES[1], "mid")
            .otherwise("high")
        )

    m = per.select(tier("spend_a").alias("tier_a"), tier("spend_b").alias("tier_b")).groupBy(
        "tier_a", "tier_b"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    w = Window.partitionBy("tier_a")
    return m.select(
        "tier_a",
        "tier_b",
        "n_customers",
        (
            F.floor(
                F.col("n_customers").cast("double")
                / F.sum("n_customers").over(w)
                * 10000
            )
            / 10000
        ).alias("row_share"),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indexes (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "orders_price_index",
    oracle=f"""
    WITH li AS (
      SELECT l.l_partkey AS pk,
             CASE WHEN CAST(o.o_orderdate AS DATE) < DATE '{_SEG_SPLIT}'
                  THEN 0 ELSE 1 END AS period,
             l.l_extendedprice / l.l_quantity AS price,
             l.l_quantity AS qty
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    per AS (
      SELECT pk, period, SUM(price * qty) / SUM(qty) AS p, SUM(qty) AS q
      FROM li GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.pk, a.p AS p0, a.q AS q0, b.p AS p1, b.q AS q1
      FROM per a JOIN per b ON a.pk = b.pk AND a.period = 0 AND b.period = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           FLOOR(SUM(p1 * q0) / SUM(p0 * q0) * 1000000) / 1000000
             AS laspeyres,
           FLOOR(SUM(p1 * q1) / SUM(p0 * q1) * 1000000) / 1000000 AS paasche,
           FLOOR(sqrt((SUM(p1 * q0) / SUM(p0 * q0))
                      * (SUM(p1 * q1) / SUM(p0 * q1))) * 1000000) / 1000000
             AS fisher
    FROM paired
    """,
)
def orders_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche, and Fisher price indexes between the two
    `_SEG_SPLIT` periods over the parts traded in BOTH — the bilateral
    index-number formulas every CPI/PPI pipeline computes (Fisher =
    the geometric mean, Diewert's "ideal" index): per part, the
    quantity-weighted average unit price and total quantity per period,
    then Σp1·q0/Σp0·q0 (base-period basket), Σp1·q1/Σp0·q1
    (current basket), and their geometric mean. On the fixture the
    unit-price process is stationary, so all three indexes sit near
    1.0 — the null a real price shock would move.

    Plan: one orders join (broadcastable dimension is the date split,
    carried through the fact scan), one partial agg to O(parts x 2),
    a self-equi-join matching the periods, and a single 1-row moment
    aggregate. Unit prices are exact ratios of fixture doubles; index
    ratios FLOOR at 1e-6; sqrt IEEE-exact."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_partkey").alias("pk"),
        F.when(
            F.col("o_orderdate").cast("date") < F.lit(_SEG_SPLIT).cast("date"), 0
        )
        .otherwise(1)
        .alias("period"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
        F.col("l_quantity").alias("qty"),
    )
    per = j.groupBy("pk", "period").agg(
        (F.sum(F.col("price") * F.col("qty")) / F.sum("qty")).alias("p"),
        F.sum("qty").alias("q"),
    )
    a, b = per.alias("a"), per.alias("b")
    both = a.join(
        b,
        (F.col("a.pk") == F.col("b.pk"))
        & (F.col("a.period") == 0)
        & (F.col("b.period") == 1),
    ).select(
        F.col("a.p").alias("p0"),
        F.col("a.q").alias("q0"),
        F.col("b.p").alias("p1"),
        F.col("b.q").alias("q1"),
    )
    f6 = lambda c: F.floor(c * 1000000) / 1000000  # noqa: E731
    lasp = F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
    paas = F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
    return both.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        f6(lasp).alias("laspeyres"),
        f6(paas).alias("paasche"),
        f6(F.sqrt(lasp * paas)).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Flux-conserving rebinning of the daily series (round 8, continuation)
# ---------------------------------------------------------------------------
_REBIN_W = 2.5  # new bin width in days (exact in binary: 5/2)


@register(
    "ts_rebin_flux",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    frag AS (
      SELECT event_type, k,
             LEAST(d + 1, CAST({_REBIN_W} AS DOUBLE) * (k + 1))
               - GREATEST(CAST(d AS DOUBLE), CAST({_REBIN_W} AS DOUBLE) * k) AS ov,
             v
      FROM (SELECT event_type, d, v,
                   unnest(generate_series((2 * d) // 5, (2 * (d + 1)) // 5))
                     AS k
            FROM daily) t
      WHERE LEAST(d + 1, CAST({_REBIN_W} AS DOUBLE) * (k + 1))
            - GREATEST(CAST(d AS DOUBLE), CAST({_REBIN_W} AS DOUBLE) * k) > 0
    )
    SELECT event_type, CAST(k AS BIGINT) AS bin_id,
           CAST({_REBIN_W} AS DOUBLE) * k AS bin_start,
           ROUND(SUM(ov * v), 4) AS flux,
           ROUND(SUM(ov), 4) AS coverage_days
    FROM frag GROUP BY event_type, k
    """,
)
def ts_rebin_flux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flux-conserving rebinning of the daily series onto a
    {_REBIN_W}-day grid — the resampling rule spectroscopy and
    light-curve pipelines must use when bin edges don't align (each
    source bin's flux is split across the destination bins it overlaps,
    IN PROPORTION to the overlap, so the total is conserved exactly —
    unlike naive averaging, which loses flux at every fractional edge).
    Each day [d, d+1) overlaps at most two destination bins; the
    per-bin `coverage_days` column (2.5 for interior bins, less at the
    series edges) is the denominator a rate readout would divide by.
    The irregular-edge complement of `gapfill_timeseries` (which
    fills) and `ts_interpolate` (which resamples points, not flux).

    Plan: the O(types x days) daily frame explodes to at most 2
    fragments per day (a bounded generator, not a join), then one
    partial agg onto the destination grid. Bin ids are pure integer
    math ((2d) // 5 — no float ever decides membership); overlap
    fractions are exact binary rationals (multiples of 0.5), so the
    only inexactness is the value sums, ROUNDed at 1e-4. Conservation
    (sum of flux = sum of daily values) is pinned in tests."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    lo = F.expr("(2 * d) div 5")
    hi = F.expr("(2 * (d + 1)) div 5")
    frag = (
        daily.select(
            "event_type",
            "d",
            "v",
            F.explode(F.sequence(lo, hi)).alias("k"),
        )
        .select(
            "event_type",
            "k",
            "v",
            (
                F.least(F.col("d") + 1, _REBIN_W * (F.col("k") + 1))
                - F.greatest(F.col("d").cast("double"), _REBIN_W * F.col("k"))
            ).alias("ov"),
        )
        .filter(F.col("ov") > 0)
    )
    return frag.groupBy("event_type", "k").agg(
        F.round(F.sum(F.col("ov") * F.col("v")), 4).alias("flux"),
        F.round(F.sum("ov"), 4).alias("coverage_days"),
    ).select(
        "event_type",
        F.col("k").cast("long").alias("bin_id"),
        (F.lit(_REBIN_W) * F.col("k")).alias("bin_start"),
        "flux",
        "coverage_days",
    )


# ---------------------------------------------------------------------------
# Box Least Squares period search (round 8, continuation)
# ---------------------------------------------------------------------------
_BLS_PERIODS = tuple(range(3, 11))  # trial periods in integer days


@register(
    "lightcurve_bls",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    ctr AS (
      SELECT d.event_type, d.d, d.v - m.mu AS yc
      FROM daily d JOIN (SELECT event_type, AVG(v) AS mu,
                                CAST(COUNT(*) AS DOUBLE) AS n
                         FROM daily GROUP BY event_type) m
      USING (event_type)
    ),
    syy AS (
      SELECT event_type, SUM(yc * yc) AS s2 FROM ctr GROUP BY event_type
    ),
    folded AS (
      SELECT c.event_type, g.p, c.d % g.p AS phase,
             CAST(COUNT(*) AS DOUBLE) AS nb, SUM(c.yc) AS sb
      FROM ctr c CROSS JOIN
           (SELECT unnest(ARRAY{list(_BLS_PERIODS)}) AS p) g
      GROUP BY 1, 2, 3
    ),
    tot AS (
      SELECT event_type, p, SUM(nb) AS n FROM folded GROUP BY 1, 2
    ),
    power AS (
      SELECT f.event_type, f.p, f.phase,
             f.sb * f.sb / (f.nb * (1 - f.nb / t.n)) / y.s2 AS pw
      FROM folded f JOIN tot t USING (event_type, p)
      JOIN syy y USING (event_type)
      WHERE f.nb < t.n
    )
    SELECT event_type, CAST(p AS BIGINT) AS period,
           CAST(phase AS BIGINT) AS best_phase,
           FLOOR(pw * 10000) / 10000 AS bls_power
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, p
                                   ORDER BY pw DESC, phase ASC) AS rk
      FROM power) t
    WHERE rk = 1
    """,
)
def lightcurve_bls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box Least Squares period search (Kovács, Zucker & Mazeh 2002 —
    THE exoplanet-transit detection algorithm): fold the mean-centered
    daily series at each trial period {_BLS_PERIODS[0]}-{_BLS_PERIODS[-1]},
    and for every 1-day phase box score s² / (n_b (1 - n_b/n) · Σyc²) —
    the box's squared flux deficit normalized by its data share AND the
    series' total variance, so the power is the dimensionless signal
    residue in [0, 1] (scale-free across tiers; the raw unnormalized
    power grows with the square of the flux and made the cross-engine
    1e-3 floor demand 13 significant digits of accumulation agreement);
    a periodic dip (a transit) maximizes it at the true period and
    phase. Returns each (type, period)'s best box so the period spectrum
    is inspectable, exactly like `lightcurve_pdm` returns its dispersion
    spectrum (PDM finds smooth periodicity, BLS box-shaped dips; the
    periodogram sinusoids — the three standard period-search lenses,
    now all present).

    Plan: the O(types x days) centered frame multiplied by the trial
    grid (never raw events), one partial agg to O(types x periods x
    phases <= 10) cells, one per-(type, period) WindowGroupLimit top-1.
    Integer phase keys (d % p, non-negative); the normalized power
    FLOORs at 1e-4."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    m = daily.groupBy("event_type").agg(
        F.avg("v").alias("mu"), F.count(F.lit(1)).cast("double").alias("n")
    )
    ctr = daily.join(F.broadcast(m), "event_type").select(
        "event_type", "d", (F.col("v") - F.col("mu")).alias("yc")
    )
    syy = ctr.groupBy("event_type").agg(
        F.sum(F.col("yc") * F.col("yc")).alias("s2")
    )
    grid = F.explode(F.array(*[F.lit(p) for p in _BLS_PERIODS])).alias("p")
    folded = (
        ctr.select("event_type", "d", "yc", grid)
        .groupBy("event_type", "p", (F.col("d") % F.col("p")).alias("phase"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("nb"),
            F.sum("yc").alias("sb"),
        )
    )
    tot = folded.groupBy("event_type", "p").agg(F.sum("nb").alias("n"))
    power = (
        folded.join(tot, ["event_type", "p"])
        .join(F.broadcast(syy), "event_type")
        .filter(F.col("nb") < F.col("n"))
        .select(
            "event_type",
            "p",
            "phase",
            (
                F.col("sb") * F.col("sb")
                / (F.col("nb") * (1 - F.col("nb") / F.col("n")))
                / F.col("s2")
            ).alias("pw"),
        )
    )
    w = Window.partitionBy("event_type", "p").orderBy(
        F.col("pw").desc(), F.col("phase").asc()
    )
    return (
        power.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("p").cast("long").alias("period"),
            F.col("phase").cast("long").alias("best_phase"),
            (F.floor(F.col("pw") * 10000) / 10000).alias("bls_power"),
        )
    )


# ---------------------------------------------------------------------------
# Circular statistics over hour-of-day (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "events_circular_stats",
    oracle="""
    WITH ang AS (
      SELECT event_type,
             2 * pi() * CAST(hour(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 24
               AS theta
      FROM events
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(cos(theta)) AS c, SUM(sin(theta)) AS sn
      FROM ang GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           FLOOR(sqrt(c * c + sn * sn) / n * 100000) / 100000 AS resultant_r,
           FLOOR(((atan2(sn, c) + 2 * pi())
                  - 2 * pi() * FLOOR((atan2(sn, c) + 2 * pi()) / (2 * pi())))
                 * 24 / (2 * pi()) * 1000) / 1000 AS mean_hour,
           FLOOR(n * (c * c + sn * sn) / (n * n) * 1000) / 1000 AS rayleigh_z
    FROM s
    """,
)
def events_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event hour-of-day (Fisher, *Statistical
    Analysis of Circular Data*): the resultant length R (0 = uniform
    around the clock, 1 = all events at one instant), the circular mean
    hour (atan2 of the summed unit vectors — the ONLY correct average
    of a periodic quantity; the arithmetic mean of 23h and 1h is the
    absurd 12h, the circular mean is midnight), and the Rayleigh
    uniformity statistic z = nR² (z > ~3 rejects uniformity at 5%).
    The time-of-day complement of `events_seasonality` (day-of-week
    profile) and `agg_fdr_bh` (weekday tests); on the fixture's
    clock-uniform stream R sits near 0 — the calibrated null.

    Plan: one scan into an O(types) aggregate of (n, sum cos, sum sin)
    — the sufficient statistics, mergeable across any partitioning.
    Hour extraction is integer in both engines; trig per the module's
    libm convention; the mean-hour modulus is spelled x - 2pi*FLOOR(
    x/2pi) in BOTH texts (atan2 can return negatives; pmod convention
    from spatial_ring). R FLOORs at 1e-5 (it sits near 0 where 1e-4
    would quantize away the signal), z and hours at 1e-3."""
    e = load(spark, sf_dir, "events")
    theta = 2 * math.pi * F.hour(F.col("ts").cast("timestamp")).cast("double") / 24
    s = e.select("event_type", theta.alias("theta")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.cos("theta")).alias("c"),
        F.sum(F.sin("theta")).alias("sn"),
    )
    r2 = F.col("c") * F.col("c") + F.col("sn") * F.col("sn")
    raw = F.atan2(F.col("sn"), F.col("c")) + 2 * math.pi
    wrapped = raw - 2 * math.pi * F.floor(raw / (2 * math.pi))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.floor(F.sqrt(r2) / F.col("n") * 100000) / 100000).alias("resultant_r"),
        (F.floor(wrapped * 24 / (2 * math.pi) * 1000) / 1000).alias("mean_hour"),
        (F.floor(F.col("n") * r2 / (F.col("n") * F.col("n")) * 1000) / 1000).alias(
            "rayleigh_z"
        ),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of the cumulative daily series (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "events_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, d,
             SUM(v) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS c
      FROM daily
    ),
    dd AS (
      SELECT event_type, d, c,
             MAX(c) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak
      FROM cum
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(peak - c), 4) AS max_drawdown,
           ROUND(MAX(CASE WHEN peak > 0 THEN (peak - c) / peak ELSE 0 END), 6)
             AS max_drawdown_frac,
           CAST(MIN(CASE WHEN peak - c = dmax THEN d END) AS BIGINT)
             AS trough_day
    FROM (SELECT *, MAX(peak - c) OVER (PARTITION BY event_type) AS dmax
          FROM dd) t
    GROUP BY event_type
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each type's cumulative value curve — the
    risk statistic every portfolio/SLA dashboard leads with (largest
    peak-to-trough fall of the running total, absolute and as a
    fraction of the peak) plus the trough day (earliest, if tied).
    The running-maximum construction is the textbook two-window form:
    cumulative sum, then its prefix maximum, then max(peak - cum).
    Complements `events_cusum` (which alarms on the way down) with the
    retrospective worst-case magnitude.

    Plan: three windows, ALL partitioned by type over the O(types x
    days) pre-aggregated frame — never raw events. The trough day uses
    a MIN-over-matching-rows instead of a rank (one fewer sort). Sums
    are the shared daily doubles; drawdowns ROUND 1e-4, fractions
    1e-6."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select("event_type", "d", F.sum("v").over(wcum).alias("c"))
    dd = cum.select(
        "event_type", "d", "c", F.max("c").over(wcum).alias("peak")
    )
    wall = Window.partitionBy("event_type")
    t = dd.select(
        "event_type",
        "d",
        "c",
        "peak",
        F.max(F.col("peak") - F.col("c")).over(wall).alias("dmax"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max(F.col("peak") - F.col("c")), 4).alias("max_drawdown"),
        F.round(
            F.max(
                F.when(
                    F.col("peak") > 0, (F.col("peak") - F.col("c")) / F.col("peak")
                ).otherwise(0.0)
            ),
            6,
        ).alias("max_drawdown_frac"),
        F.min(F.when(F.col("peak") - F.col("c") == F.col("dmax"), F.col("d")))
        .cast("long")
        .alias("trough_day"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "events_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
    ),
    s AS (
      SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY event_type
    ),
    n AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n FROM daily
          GROUP BY event_type)
    SELECT s.event_type, CAST(n.n AS BIGINT) AS n_days, s.s_stat,
           FLOOR(CAST(s.s_stat AS DOUBLE) / s.n_pairs * 10000) / 10000
             AS kendall_tau,
           FLOOR((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                       WHEN s.s_stat < 0 THEN s.s_stat + 1
                       ELSE 0 END)
                 / sqrt(n.n * (n.n - 1) * (2 * n.n + 5) / 18)
                 * 10000) / 10000 AS z_stat
    FROM s JOIN n USING (event_type)
    """,
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test — the standard non-parametric
    monotone-trend detector (hydrology/climate's default): S = sum of
    sign(v_j - v_i) over all i < j day pairs, Kendall's tau = S /
    n_pairs, and the continuity-corrected normal statistic z =
    (S -/+ 1) / sqrt(n(n-1)(2n+5)/18). `agg_theilsen` estimates the
    trend SLOPE robustly; Mann-Kendall supplies the SIGNIFICANCE the
    slope alone can't — the standard pairing in every trend-analysis
    package. Exact integer S (no distributional assumption touches the
    data side).

    Plan: the O(types x days) frame self-joins on (type, d_j > d_i) —
    ~n²/2 = 435 pairs per type on 30-day series, O(days²) generally;
    at long horizons the O(n log n) merge-sort inversion count replaces
    it (documented trade, same statistic). One integer partial agg;
    only tau and z touch doubles, FLOOR 1e-4."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    a, b = daily.alias("a"), daily.alias("b")
    sg = (
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d") > F.col("a.d")),
        )
        .select(F.col("a.event_type").alias("event_type"), sg.alias("sg"))
        .groupBy("event_type")
        .agg(
            F.sum("sg").cast("long").alias("s_stat"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    corr = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    var = F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18
    return s.join(n, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        "s_stat",
        (
            F.floor(F.col("s_stat").cast("double") / F.col("n_pairs") * 10000)
            / 10000
        ).alias("kendall_tau"),
        (F.floor(corr / F.sqrt(var) * 10000) / 10000).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Bollinger bands + breakout flags (round 8, continuation)
# ---------------------------------------------------------------------------
_BOLL_W = 7  # trailing window (days)
_BOLL_K = 2.0  # band half-width in rolling standard deviations


@register(
    "events_bollinger",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS vc
      FROM events GROUP BY 1, 2
    ),
    roll AS (
      SELECT event_type, d, CAST(vc AS DOUBLE) / 100.0 AS v,
             AVG(CAST(vc AS DOUBLE)) OVER w / 100.0 AS ma,
             stddev_samp(CAST(vc AS DOUBLE)) OVER w / 100.0 AS sd,
             COUNT(*) OVER w AS wn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN {_BOLL_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(d AS BIGINT) AS d,
           FLOOR(v * 100) / 100 AS v,
           FLOOR(ma * 10000) / 10000 AS ma,
           FLOOR((ma + {_BOLL_K} * sd) * 10000) / 10000 AS upper_band,
           FLOOR((ma - {_BOLL_K} * sd) * 10000) / 10000 AS lower_band,
           CAST(CASE WHEN v > ma + {_BOLL_K} * sd THEN 1
                     WHEN v < ma - {_BOLL_K} * sd THEN -1
                     ELSE 0 END AS BIGINT) AS breakout
    FROM roll WHERE wn = {_BOLL_W}
    """,
)
def events_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (trailing {_BOLL_W}-day mean ± {_BOLL_K:.0f}
    rolling standard deviations) with breakout flags (+1 above, -1
    below) per event type — the volatility-adaptive control chart
    monitoring dashboards standardize on: a fixed threshold fires
    constantly in volatile regimes and never in quiet ones, the
    band scales itself. Only full windows emit (the first
    {_BOLL_W - 1} days are warm-up), so every band is a {_BOLL_W}-point
    statistic. The trailing sibling of `win_moving_avg` (mean only)
    and `anomaly_zscore` (global variance); `events_cusum` accumulates
    where bands reset daily.

    Plan: one type-partitioned window pass over the O(types x days)
    frame — two window aggregates sharing one sort. Daily values
    accumulate as EXACT BIGINT cents (the `agg_paired_ttest` lesson:
    the double daily sums sit exactly on the cent grid, so a 1e-4
    FLOOR of them flips with accumulation order — measured at the
    ~sf1 tier), making v and the 7-point window inputs identical
    doubles in both engines. The breakout flag compares unfloored
    values in BOTH engines (the agg_ks_test reject-flag convention);
    bands floor at 1e-4 (off-grid after the sqrt), v at its exact
    1e-2 grain."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(_BOLL_W - 1), Window.currentRow)
    )
    roll = daily.select(
        "event_type",
        "d",
        (F.col("vc").cast("double") / 100.0).alias("v"),
        (F.avg(F.col("vc").cast("double")).over(w) / 100.0).alias("ma"),
        (F.stddev_samp(F.col("vc").cast("double")).over(w) / 100.0).alias("sd"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == _BOLL_W)
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    up = F.col("ma") + _BOLL_K * F.col("sd")
    lo = F.col("ma") - _BOLL_K * F.col("sd")
    return roll.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        (F.floor(F.col("v") * 100) / 100).alias("v"),
        f4(F.col("ma")).alias("ma"),
        f4(up).alias("upper_band"),
        f4(lo).alias("lower_band"),
        F.when(F.col("v") > up, 1)
        .when(F.col("v") < lo, -1)
        .otherwise(0)
        .cast("long")
        .alias("breakout"),
    )


# ---------------------------------------------------------------------------
# Extreme-value (Gumbel) fit on block maxima (round 8, continuation)
# ---------------------------------------------------------------------------
_EVT_BLOCK = 7  # block length in days (weekly maxima)
_EVT_RETURN_T = 52  # return period in blocks (~1 year of weeks)
_EULER_GAMMA = 0.5772156649015329
# Every constant is ONE Python double shared verbatim by both engines'
# texts, with matching parenthesization: each engine evaluating its own
# sqrt(6)/pi differed in the last ulp and flipped a FLOOR grid cell
# (measured: gumbel_mu 559.2439 vs 559.244 at sf0.001).
_SQRT6_OVER_PI = 0.779696801233676
_EVT_LOGLOG = -3.9415503865226063  # ln(-ln(1 - 1/RETURN_T))


@register(
    "events_extreme_value",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS vc
      FROM events GROUP BY 1, 2
    ),
    blocks AS (
      SELECT event_type, d // {_EVT_BLOCK} AS blk,
             CAST(MAX(vc) AS DOUBLE) AS mxc
      FROM daily GROUP BY 1, 2
    ),
    fit AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_blocks,
             AVG(mxc) / 100.0 AS m, stddev_samp(mxc) / 100.0 AS s
      FROM blocks GROUP BY event_type
    )
    SELECT event_type, n_blocks,
           FLOOR(m * 10000) / 10000 AS mean_block_max,
           FLOOR((s * {_SQRT6_OVER_PI!r}) * 10000) / 10000 AS gumbel_beta,
           FLOOR((m - {_EULER_GAMMA!r} * (s * {_SQRT6_OVER_PI!r}))
                 * 10000) / 10000 AS gumbel_mu,
           FLOOR((m - {_EULER_GAMMA!r} * (s * {_SQRT6_OVER_PI!r})
                  - (s * {_SQRT6_OVER_PI!r}) * {_EVT_LOGLOG!r})
                 * 10000) / 10000 AS return_level_{_EVT_RETURN_T}
    FROM fit
    """,
)
def events_extreme_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis via a method-of-moments Gumbel fit to
    weekly block maxima (Gumbel 1958; the Fisher-Tippett type-I limit
    for light-tailed maxima): beta = s*sqrt(6)/pi, mu = mean - gamma*
    beta, and the {_EVT_RETURN_T}-block RETURN LEVEL mu - beta*
    ln(-ln(1 - 1/T)) — "the weekly peak you should expect once a
    year", the number capacity planning and flood-style risk actually
    budget against, which no quantile of the OBSERVED data can give
    (it extrapolates beyond the sample maximum by design).
    `events_slo_burnrate` alarms on current load; this sizes for the
    load not seen yet.

    Plan: exact cent daily sums (the Bollinger/paired-ttest grid
    lesson), one O(types x blocks) MAX partial agg, one O(types)
    moment fit — method of moments keeps the fit closed-form (ML would
    iterate). Block keys are integer d // {_EVT_BLOCK}; only
    sqrt/ln/pi touch libm, FLOOR 1e-4."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"))
    blocks = daily.groupBy(
        "event_type", F.expr(f"d div {_EVT_BLOCK}").alias("blk")
    ).agg(F.max("vc").cast("double").alias("mxc"))
    # cent maxima stay INTEGER-valued through the average: integer-valued
    # double summation is exact in any order, so AVG/100 is one
    # correctly-rounded division in both engines (the pre-divided form
    # put the mean back on the 1e-4 grid with order-dependent ulps)
    fit = blocks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (F.avg("mxc") / 100.0).alias("m"),
        (F.stddev_samp("mxc") / 100.0).alias("s"),
    )
    beta = F.col("s") * _SQRT6_OVER_PI
    mu = F.col("m") - _EULER_GAMMA * beta
    rl = mu - beta * _EVT_LOGLOG
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return fit.select(
        "event_type",
        "n_blocks",
        f4(F.col("m")).alias("mean_block_max"),
        f4(beta).alias("gumbel_beta"),
        f4(mu).alias("gumbel_mu"),
        f4(rl).alias(f"return_level_{_EVT_RETURN_T}"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "events_runs_test",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS vc
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(CAST(vc AS DOUBLE), 0.5) AS md
      FROM daily GROUP BY event_type
    ),
    signs AS (
      SELECT d.event_type, d.d,
             CASE WHEN CAST(d.vc AS DOUBLE) > m.md THEN 1 ELSE 0 END AS s
      FROM daily d JOIN med m USING (event_type)
      WHERE CAST(d.vc AS DOUBLE) <> m.md
    ),
    runs AS (
      SELECT event_type, s,
             CASE WHEN LAG(s) OVER (PARTITION BY event_type ORDER BY d)
                       IS DISTINCT FROM s THEN 1 ELSE 0 END AS brk
      FROM signs
    ),
    agg AS (
      SELECT event_type,
             CAST(SUM(brk) AS DOUBLE) AS r,
             CAST(SUM(s) AS DOUBLE) AS n1,
             CAST(COUNT(*) - SUM(s) AS DOUBLE) AS n2
      FROM runs GROUP BY event_type
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           CAST(r AS BIGINT) AS n_runs,
           FLOOR((2 * n1 * n2 / (n1 + n2) + 1) * 10000) / 10000
             AS expected_runs,
           FLOOR((r - (2 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))
                 * 10000) / 10000 AS z_stat
    FROM agg
    """,
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on each type's daily series — the
    classical randomness check: code each day above/below the series
    median, count the RUNS of identical signs, and compare against the
    exact null moments E[R] = 2·n1·n2/(n1+n2) + 1 and its variance
    (too FEW runs = positive serial dependence or regime clustering,
    too MANY = oscillation). Median-equal days drop (the standard
    convention). The distribution-free complement of `events_ljungbox`
    (which assumes squared-autocorrelation structure) and `events_acf`
    (which estimates it): the runs test sees ANY serial dependence.

    Plan: one exact-percentile per type over the O(types x days) frame
    (broadcast back), run boundaries via a type-partitioned LAG (first
    row counts as a break via IS DISTINCT FROM NULL — so SUM(brk) IS
    the run count), one integer aggregate. Exact-cent daily sums per
    the module convention; runs/counts are pure integers; only the
    closed-form moments touch doubles, FLOOR 1e-4."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"))
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("vc").cast("double"), F.lit(0.5)).alias("md")
    )
    signs = (
        daily.join(F.broadcast(med), "event_type")
        .filter(F.col("vc").cast("double") != F.col("md"))
        .select(
            "event_type",
            "d",
            F.when(F.col("vc").cast("double") > F.col("md"), 1)
            .otherwise(0)
            .alias("s"),
        )
    )
    wlag = Window.partitionBy("event_type").orderBy("d")
    runs = signs.select(
        "event_type",
        "s",
        F.when(
            ~F.lag("s").over(wlag).eqNullSafe(F.col("s")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.groupBy("event_type").agg(
        F.sum("brk").cast("double").alias("r"),
        F.sum("s").cast("double").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).cast("double").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 2 * n1 * n2 / (n1 + n2) + 1
    vr = (
        2
        * n1
        * n2
        * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))
    )
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return agg.select(
        "event_type",
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        f4(er).alias("expected_runs"),
        f4((r - er) / F.sqrt(vr)).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Revenue waterfall decomposition (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "orders_revenue_waterfall",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS DOUBLE) / 100.0 AS gross,
           ROUND(SUM(l_extendedprice * l_discount), 2) AS discount_amt,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net_of_disc,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * l_tax), 2)
             AS tax_amt,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS charged,
           FLOOR(SUM(l_extendedprice * l_discount)
                 / SUM(l_extendedprice) * 1000000) / 1000000
             AS effective_discount_rate
    FROM lineitem GROUP BY l_returnflag
    """,
)
def orders_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall — the finance bridge every revenue dashboard
    opens with: gross extended price, minus the discount step, the
    net-of-discount subtotal, plus the tax step, to the charged amount
    (the exact TPC-H Q1 money algebra, here presented as the named
    waterfall steps with the effective discount rate) per return flag.
    Each step is independently meaningful and the steps RECONCILE
    (gross - discount = net, net + tax = charged) — pinned in tests,
    which is the point of a waterfall over a flat sum.

    Plan: one scan, one mergeable aggregate; gross uses exact BIGINT
    cents (the paired-ttest convention — it sits on the cent grid),
    the mixed-rate products ROUND at 1e-2 where the grid argument no
    longer applies (discount/tax are 2-decimal rates, the products are
    4-6 decimal exact and off the display grid)."""
    li = load(spark, sf_dir, "lineitem")
    px = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        (
            F.sum(F.round(px * 100, 0).cast("long")).cast("double") / 100.0
        ).alias("gross"),
        F.round(F.sum(px * F.col("l_discount")), 2).alias("discount_amt"),
        F.round(F.sum(px * (1 - F.col("l_discount"))), 2).alias("net_of_disc"),
        F.round(F.sum(px * (1 - F.col("l_discount")) * F.col("l_tax")), 2).alias(
            "tax_amt"
        ),
        F.round(
            F.sum(px * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
        ).alias("charged"),
        (
            F.floor(F.sum(px * F.col("l_discount")) / F.sum(px) * 1000000)
            / 1000000
        ).alias("effective_discount_rate"),
    )


# ---------------------------------------------------------------------------
# Hodges-Lehmann pseudo-median (round 8, continuation)
# ---------------------------------------------------------------------------
@register(
    "agg_hodges_lehmann",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS vc
      FROM events GROUP BY 1, 2
    ),
    walsh AS (
      SELECT a.event_type,
             CAST(a.vc + b.vc AS DOUBLE) / 200.0 AS w
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d <= b.d
    )
    SELECT w.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_walsh,
           FLOOR(quantile_cont(w.w, 0.5) * 10000) / 10000 AS hodges_lehmann,
           FLOOR(m.md * 10000) / 10000 AS plain_median,
           FLOOR(m.mn * 10000) / 10000 AS plain_mean
    FROM walsh w JOIN (
      SELECT event_type,
             quantile_cont(CAST(vc AS DOUBLE) / 100.0, 0.5) AS md,
             AVG(CAST(vc AS DOUBLE)) / 100.0 AS mn
      FROM daily GROUP BY event_type) m USING (event_type)
    GROUP BY w.event_type, m.md, m.mn
    """,
)
def agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median (1963): the median of all Walsh
    averages (x_i + x_j)/2 over i <= j — the location estimator behind
    the Wilcoxon test, more efficient than the median under
    near-normality (ARE 0.955 vs 0.64) while keeping a 29% breakdown
    point, shown next to the plain median and mean so the three-way
    spread diagnoses skew. Completes the robust-location family on its
    pairwise axis: `agg_theilsen` is the same Walsh construction for
    SLOPES, `events_mann_kendall` its test.

    Plan: the O(types x days) exact-cent frame self-joins on
    (type, d_i <= d_j) — ~n²/2 Walsh pairs per type on the tiny
    pre-aggregated series (like Mann-Kendall; the O(n log n) selection
    algorithm replaces it at long horizons), one exact median over
    them. Walsh averages are exact half-cents (integer sums / 200);
    medians interpolate identically; FLOOR 1e-4."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"))
    a, b = daily.alias("a"), daily.alias("b")
    walsh = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") <= F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("a.vc") + F.col("b.vc")).cast("double") / 200.0).alias("w"),
    )
    m = daily.groupBy("event_type").agg(
        F.percentile(F.col("vc").cast("double") / 100.0, F.lit(0.5)).alias("md"),
        (F.avg(F.col("vc").cast("double")) / 100.0).alias("mn"),
    )
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return (
        walsh.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "md", "mn")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_walsh"),
            f4(F.percentile("w", F.lit(0.5))).alias("hodges_lehmann"),
        )
        .select(
            "event_type",
            "n_walsh",
            "hodges_lehmann",
            f4(F.col("md")).alias("plain_median"),
            f4(F.col("mn")).alias("plain_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation between event-type daily series (round 9)
# ---------------------------------------------------------------------------
_CCF_MAX_LAG = 5


@register(
    "events_cross_correlation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(CAST(SUM(value) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT unnest(range(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG} + 1)) AS lag),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             corr(a.v, b.v) AS r, CAST(COUNT(*) AS BIGINT) AS n_overlap
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b
        ON b.event_type > a.event_type AND b.d = a.d + l.lag
      GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n_overlap,
           ROUND(r, 4) AS ccf,
           CAST(CASE WHEN ROW_NUMBER() OVER (
                  PARTITION BY type_a, type_b
                  ORDER BY ABS(ROUND(r, 4)) DESC, lag) = 1
                THEN 1 ELSE 0 END AS INT) AS is_peak
    FROM pairs
    """,
)
def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation function: for every ordered pair of
    event types, the Pearson correlation of their daily-value series at
    every lag in [-{_CCF_MAX_LAG}, +{_CCF_MAX_LAG}], with the peak-|r|
    lag flagged per pair — "does signup activity lead purchases by two
    days?", the first question a growth analyst asks of a metric pair
    (and the alignment step before any transfer-entropy / Granger
    modeling; complements `events_granger`, which fixes lag 1).

    The series reduce to O(types x 30) rows before the lag join fans
    them by 11 literal lags, so the correlation inputs are tiny; `corr`
    is a sample statistic in both engines (the module's corr_covar
    convention) and ROUND(4) absorbs fold-order ulp noise. The peak
    flag ranks the ROUNDED |r| with lag as tiebreak — deterministic.

    Scale: one partial-aggregating scan of events (the shared
    daily_value_series stage) dominates; everything downstream is
    O(types^2 x lags) rows. The lag join keys on exact integer day
    indexes."""
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round(F.col("v").cast("double"), 4).alias("v")
    )
    lags = spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b.event_type") > F.col("a.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("lag")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            "lag",
        )
        .agg(
            F.corr(F.col("a.v"), F.col("b.v")).alias("r"),
            F.count(F.lit(1)).cast("long").alias("n_overlap"),
        )
    )
    w = Window.partitionBy("type_a", "type_b").orderBy(
        F.abs(F.round("r", 4)).desc(), "lag"
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.col("lag").cast("long").alias("lag"),
        "n_overlap",
        F.round("r", 4).alias("ccf"),
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# Dynamic time warping distance between event-type daily profiles (round 9)
# ---------------------------------------------------------------------------
_DTW_LEN = 28  # first 28 days of each z-scored daily series
_DTW_INF = 1e18


def _dtw_oracle() -> str:
    # full DP table as two nested sequential list folds (outer over x rows,
    # inner building each DP row left-to-right) — identical op sequence to
    # the Spark aggregate() pair below, so the doubles match bit-for-bit.
    # xi is boxed into a 1-element list so list_reduce's accumulator (a DP
    # row) and its elements share one type.
    n = _DTW_LEN
    return f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(CAST(SUM(value) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    arr AS (
      SELECT event_type,
             list_transform(list(struct_pack(d := d, v := v) ORDER BY d),
                            s -> s.v)[1:{n}] AS vs
      FROM daily GROUP BY 1 HAVING COUNT(*) >= {n}
    ),
    zs AS (
      SELECT event_type,
             list_transform(vs, x ->
               (x - list_reduce(list_prepend(0.0, vs), (a, b) -> a + b) / {n})
               / sqrt(list_reduce(list_prepend(0.0,
                    list_transform(vs, y ->
                      (y - list_reduce(list_prepend(0.0, vs),
                                       (a, b) -> a + b) / {n})
                      * (y - list_reduce(list_prepend(0.0, vs),
                                         (a, b) -> a + b) / {n}))),
                    (a, b) -> a + b) / {n})) AS z
      FROM arr
    ),
    dtw AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             list_reduce(
               list_prepend(
                 list_prepend(0.0, list_transform(generate_series(1, {n}),
                                                  j -> {_DTW_INF})),
                 list_transform(a.z, xi -> [xi])
               ),
               (prev, xb) -> list_reduce(
                 list_prepend([{_DTW_INF}],
                   list_transform(generate_series(1, {n}),
                                  j -> [CAST(j AS DOUBLE)])),
                 (rowacc, jb) -> list_append(rowacc,
                    abs(xb[1] - b.z[CAST(jb[1] AS INT)])
                    + least(prev[CAST(jb[1] AS INT) + 1],
                            prev[CAST(jb[1] AS INT)],
                            rowacc[CAST(jb[1] AS INT)]))
               )
             )[{n} + 1] AS dist
      FROM zs a JOIN zs b ON a.event_type < b.event_type
    )
    SELECT type_a, type_b, CAST({n} AS BIGINT) AS n,
           ROUND(dist, 4) AS dtw_distance,
           ROUND(dist / {n}, 6) AS dtw_per_step
    FROM dtw
    """


@register("events_dtw_distance", oracle=_dtw_oracle())
def events_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic time warping distance between every pair of z-scored
    {_DTW_LEN}-day event-type profiles — the elastic series distance that
    matches shapes under local time shifts (Sakoe-Chiba 1978; the
    clustering metric of choice for usage curves, where Euclidean
    punishes a one-day phase offset). Neither engine has a DTW
    primitive, so BOTH run the defining O(n x m) dynamic program as two
    nested sequential array folds (outer fold carries the previous DP
    row, inner fold builds each row left-to-right) — entirely in-row
    lambda algebra on pre-aggregated arrays, the same discipline as
    `events_haar_wavelet`, with an identical operation sequence in the
    two engines so every double matches bit-for-bit before ROUND.

    z-scoring (population mean/std via in-row folds over the same
    sorted array) makes the distance scale-free, so it measures shape,
    not volume.

    Scale: the event scan partial-aggregates to O(types x 30) rows;
    the DP is O(types^2 x {_DTW_LEN}^2) scalar ops on single rows —
    embarrassingly parallel across pairs, no shuffle after the daily
    aggregate. For long series at scale, band the inner sequence
    (Sakoe-Chiba radius) — the fold structure is unchanged."""
    n = _DTW_LEN
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round(F.col("v").cast("double"), 4).alias("v")
    )
    arr = (
        daily.groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d, v))), s -> s.v)"
            ).alias("vs_full")
        )
        .filter(F.size("vs_full") >= n)
        .select("event_type", F.slice("vs_full", 1, n).alias("vs"))
    )
    mean = F.aggregate("vs", F.lit(0.0), lambda a, x: a + x) / n
    zs = arr.withColumn("mu", mean)
    var = (
        F.aggregate(
            "vs",
            F.lit(0.0),
            lambda a, y: a + (y - F.col("mu")) * (y - F.col("mu")),
        )
        / n
    )
    zs = zs.withColumn("sd", F.sqrt(var)).select(
        "event_type",
        F.transform("vs", lambda x: (x - F.col("mu")) / F.col("sd")).alias("z"),
    )
    a, b = zs.alias("a"), zs.alias("b")
    init_row = F.concat(
        F.array(F.lit(0.0)),
        F.transform(F.sequence(F.lit(1), F.lit(n)), lambda j: F.lit(_DTW_INF)),
    )

    def dp_row(prev, xi):
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(n)),
            F.array(F.lit(_DTW_INF)),
            lambda rowacc, j: F.concat(
                rowacc,
                F.array(
                    F.abs(xi - F.element_at(F.col("b.z"), j))
                    + F.least(
                        F.element_at(prev, j + 1),
                        F.element_at(prev, j),
                        F.element_at(rowacc, j),
                    )
                ),
            ),
        )

    dist = F.element_at(
        F.aggregate(F.col("a.z"), init_row, dp_row),
        n + 1,
    )
    return (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.lit(n).cast("long").alias("n"),
            F.round(dist, 4).alias("dtw_distance"),
            F.round(dist / n, 6).alias("dtw_per_step"),
        )
    )


# ---------------------------------------------------------------------------
# Accounts-receivable aging buckets (round 9)
# ---------------------------------------------------------------------------
_AR_ASOF = "2001-08-01"  # the fixture's latest order date
_AR_BUCKETS = ((90, "0-90"), (365, "91-365"), (730, "366-730"))


@register(
    "orders_ar_aging",
    oracle=f"""
    WITH open_inv AS (
      SELECT o.o_totalprice, c.c_mktsegment,
             datediff('day', CAST(o.o_orderdate AS DATE), DATE '{_AR_ASOF}')
               AS age
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderstatus <> 'F'
    ),
    bucketed AS (
      SELECT c_mktsegment,
             CASE WHEN age <= 90 THEN '0-90'
                  WHEN age <= 365 THEN '91-365'
                  WHEN age <= 730 THEN '366-730'
                  ELSE '>730' END AS bucket,
             o_totalprice
      FROM open_inv
    ),
    agg AS (
      SELECT c_mktsegment, bucket,
             CAST(COUNT(*) AS BIGINT) AS n_invoices,
             SUM(o_totalprice) AS balance
      FROM bucketed GROUP BY 1, 2
    )
    SELECT c_mktsegment, bucket, n_invoices,
           ROUND(balance, 2) AS balance,
           ROUND(balance / SUM(balance) OVER (PARTITION BY c_mktsegment), 6)
             AS segment_share
    FROM agg
    """,
)
def orders_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging report: every open order (status not yet
    'F'inalized) bucketed by days outstanding as of the fixture's latest
    order date ({_AR_ASOF}), per market segment — invoice count, open
    balance, and each bucket's share of the segment's receivables. The
    collections / cash-flow-risk view every finance warehouse refreshes
    nightly (the '>730' tail is the write-off-candidate line).

    Bucket keys are integer day arithmetic (the module's datediff
    convention); balances are exact decimal sums ROUND(2); shares divide
    a bucket's sum by its segment total via a partitioned window over
    O(segments x 4) pre-aggregated rows.

    Scale: one fact scan with the status filter pushed to parquet, a
    broadcast of the customer dimension's two columns, one mergeable
    groupBy — the canonical star-join aggregate shape (join_star_q5's
    budget)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    age = F.datediff(F.lit(_AR_ASOF).cast("date"), F.col("o_orderdate").cast("date"))
    bucket = F.lit(">730")
    for days, name in reversed(_AR_BUCKETS):
        bucket = F.when(F.col("age") <= days, name).otherwise(bucket)
    agg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_totalprice", age.alias("age"))
        .select("c_mktsegment", "o_totalprice", bucket.alias("bucket"))
        .groupBy("c_mktsegment", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_invoices"),
            F.sum("o_totalprice").alias("balance"),
        )
    )
    w = Window.partitionBy("c_mktsegment")
    return agg.select(
        "c_mktsegment",
        "bucket",
        "n_invoices",
        F.round("balance", 2).alias("balance"),
        F.round(F.col("balance") / F.sum("balance").over(w), 6).alias(
            "segment_share"
        ),
    )


# ---------------------------------------------------------------------------
# Fraud velocity rule: events per user per trailing hour (round 9)
# ---------------------------------------------------------------------------
_VEL_WINDOW_S = 3600
_VEL_FLAG_AT = 2


@register(
    "events_velocity_flags",
    oracle=f"""
    WITH e AS (
      SELECT event_type, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
      FROM events
    ),
    v AS (
      SELECT event_type,
             CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY s
                                 RANGE BETWEEN {_VEL_WINDOW_S} PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS velocity
      FROM e
    )
    SELECT event_type, velocity,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           velocity >= {_VEL_FLAG_AT} AS flagged
    FROM v GROUP BY 1, 2
    """,
)
def events_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity rule — the first screen every fraud/abuse system runs:
    for each event, how many events the SAME user produced in the
    trailing {_VEL_WINDOW_S}s (a per-user RANGE-frame window on epoch
    seconds), histogrammed per event type with the >= {_VEL_FLAG_AT}
    velocity flag. Rate-limit auditing, card-testing detection, and
    scraper screens are all this exact query with different thresholds;
    the full histogram (rather than only flagged rows) keeps the result
    non-vacuous at every fixture tier and pins the whole distribution.

    The frame keys on integer epoch seconds (both engines FLOOR the
    epoch before counting, so sub-second parts can't skew the boundary)
    and RANGE frames include all peers of the boundary second
    identically in both engines — exact integer counts end to end.

    Scale: ONE window partitioned by user_id (the natural shuffle key —
    events tables are usually already bucketed by user), then a tiny
    mergeable histogram aggregate. No global window, no join; the
    trailing-window state per user is O(events in {_VEL_WINDOW_S}s)."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "user_id",
        F.floor(F.col("ts").cast("double")).cast("long").alias("s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(-_VEL_WINDOW_S, Window.currentRow)
    )
    v = e.select("event_type", F.count(F.lit(1)).over(w).alias("velocity"))
    return v.groupBy("event_type", "velocity").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.first(F.col("velocity") >= _VEL_FLAG_AT).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Growth accounting: new / retained / resurrected / churned (round 9)
# ---------------------------------------------------------------------------


@register(
    "events_growth_accounting",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
      FROM events WHERE event_type = 'purchase'
    ),
    f AS (SELECT user_id, MIN(w) AS fw FROM act GROUP BY 1),
    states AS (
      SELECT a.user_id, a.w,
             CASE WHEN a.w = f.fw THEN 'new'
                  WHEN p.user_id IS NOT NULL THEN 'retained'
                  ELSE 'resurrected' END AS st
      FROM act a
      JOIN f USING (user_id)
      LEFT JOIN act p ON p.user_id = a.user_id AND p.w = a.w - 1
    ),
    per AS (
      SELECT w,
             CAST(SUM(CASE WHEN st = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN st = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
             CAST(SUM(CASE WHEN st = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_resurrected
      FROM states GROUP BY w
    ),
    churn AS (
      SELECT a.w + 1 AS w, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM act a
      LEFT JOIN act nx ON nx.user_id = a.user_id AND nx.w = a.w + 1
      WHERE nx.user_id IS NULL AND a.w + 1 <= (SELECT MAX(w) FROM act)
      GROUP BY a.w + 1
    )
    SELECT per.w AS week,
           per.n_new, per.n_retained, per.n_resurrected,
           COALESCE(churn.n_churned, 0) AS n_churned,
           CASE WHEN COALESCE(churn.n_churned, 0) = 0 THEN NULL
                ELSE ROUND((per.n_new + per.n_resurrected) * 1.0
                           / churn.n_churned, 4) END AS quick_ratio
    FROM per LEFT JOIN churn USING (w)
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (the Social Capital framework): weekly
    purchase-active users decomposed into NEW (first active week),
    RETAINED (active last week too), RESURRECTED (returned after a gap),
    and CHURNED (active last week, silent this week), plus the quick
    ratio (new + resurrected) / churned — the decomposition every growth
    team reports because flat DAU can hide a leaky bucket. Activity is
    purchase-scoped (all-event activity is degenerate in the fixture —
    every user fires events every week; purchases arrive ~2.7/user/week,
    so all four states are genuinely populated at every tier).

    Pure integer set algebra on the distinct (user, week) frame: first
    weeks via MIN, transitions via self-joins keyed one week apart —
    exact counts, deterministic; the quick ratio divides exact integers
    (NULL when nothing churned, week 0).

    Scale: one distinct over (user, week) — the only stage that sees
    event volume, map-side combined — then joins on a frame bounded by
    users x weeks. The same shape incremental: append a week, re-join
    two slices."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    act = ev.select(
        "user_id",
        F.expr(
            "datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7"
        ).alias("w"),
    ).distinct()
    f = act.groupBy("user_id").agg(F.min("w").alias("fw"))
    prev = act.select("user_id", (F.col("w") + 1).alias("w"), F.lit(1).alias("was"))
    states = (
        act.join(f, "user_id")
        .join(prev, ["user_id", "w"], "left")
        .select(
            "w",
            F.when(F.col("w") == F.col("fw"), "new")
            .when(F.col("was").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("st"),
        )
    )
    per = states.groupBy("w").agg(
        F.sum((F.col("st") == "new").cast("int")).cast("long").alias("n_new"),
        F.sum((F.col("st") == "retained").cast("int")).cast("long").alias("n_retained"),
        F.sum((F.col("st") == "resurrected").cast("int"))
        .cast("long")
        .alias("n_resurrected"),
    )
    maxw = act.agg(F.max("w").alias("mw"))
    nxt = act.select("user_id", (F.col("w") - 1).alias("w"), F.lit(1).alias("nx"))
    churn = (
        act.join(nxt, ["user_id", "w"], "left")
        .filter(F.col("nx").isNull())
        .crossJoin(F.broadcast(maxw))
        .filter(F.col("w") + 1 <= F.col("mw"))
        .groupBy((F.col("w") + 1).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        per.join(churn, "w", "left")
        .select(
            F.col("w").alias("week"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0).cast("long")).alias("n_churned"),
            F.when(F.coalesce(F.col("n_churned"), F.lit(0)) == 0, F.lit(None)).otherwise(
                F.round(
                    (F.col("n_new") + F.col("n_resurrected"))
                    * 1.0
                    / F.col("n_churned"),
                    4,
                )
            ).alias("quick_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# ABC-XYZ inventory matrix (round 9)
# ---------------------------------------------------------------------------


@register(
    "orders_abc_xyz",
    oracle="""
    WITH rev AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT SUM(revenue) AS tot FROM rev),
    abc AS (
      SELECT l_partkey, revenue,
             CASE WHEN ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) / tot, 9) <= 0.8 THEN 'A'
                  WHEN ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) / tot, 9) <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM rev CROSS JOIN t
    ),
    monthly AS (
      SELECT l_partkey,
             datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) // 30
               AS m,
             SUM(l_quantity) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    cv AS (
      SELECT l_partkey,
             CASE WHEN COUNT(*) < 2 THEN NULL
                  ELSE STDDEV_SAMP(q) / AVG(q) END AS cv
      FROM monthly GROUP BY 1
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN cv IS NULL THEN 'Z'
                  WHEN ROUND(cv, 9) < 0.5 THEN 'X'
                  WHEN ROUND(cv, 9) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM cv
    )
    SELECT abc.abc_class, xyz.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(abc.revenue), 2) AS class_revenue,
           ROUND(SUM(abc.revenue) / MAX(t.tot), 6) AS revenue_share
    FROM abc JOIN xyz USING (l_partkey) CROSS JOIN t
    GROUP BY 1, 2
    """,
)
def orders_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix — the two-axis classification every
    supply-chain planner starts from: ABC by cumulative revenue share
    (the `orders_abc` Pareto cut: 80 / 95%) crossed with XYZ by demand
    variability (coefficient of variation of monthly shipped quantity:
    X < 0.5 steady, Y < 1.0 variable, Z erratic or single-month). AX
    items get tight auto-replenishment, CZ items manual review — the
    matrix cell counts and revenue shares are the policy table.

    Classification compares ROUND(..., 9) values (the `orders_abc`
    boundary convention) so a 1-ulp fold difference can't flip a class;
    the per-part CV is NULL -> 'Z' for single-month parts (both engines
    via an explicit COUNT guard, sidestepping their differing
    stddev-of-1 conventions).

    Scale: two partial-aggregating scans (per-part revenue, per
    part-month quantity), one sanctioned global cumsum over the O(parts)
    revenue dimension (`orders_abc`'s allowlisted shape), and a
    broadcast-size join of the two O(parts) class tables."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    t = rev.agg(F.sum("revenue").alias("tot"))
    w = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.round(F.sum("revenue").over(w) / F.col("tot"), 9)
    abc = rev.crossJoin(F.broadcast(t)).select(
        "l_partkey",
        "revenue",
        F.when(cum <= 0.8, "A").when(cum <= 0.95, "B").otherwise("C").alias(
            "abc_class"
        ),
    )
    monthly = li.groupBy(
        "l_partkey",
        F.expr(
            "datediff(CAST(l_shipdate AS DATE), DATE '1995-01-01') div 30"
        ).alias("m"),
    ).agg(F.sum("l_quantity").alias("q"))
    cv = monthly.groupBy("l_partkey").agg(
        F.when(F.count(F.lit(1)) < 2, F.lit(None))
        .otherwise(F.stddev_samp("q") / F.avg("q"))
        .alias("cv")
    )
    xyz = cv.select(
        "l_partkey",
        F.when(F.col("cv").isNull(), "Z")
        .when(F.round("cv", 9) < 0.5, "X")
        .when(F.round("cv", 9) < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .crossJoin(F.broadcast(t))
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("revenue"), 2).alias("class_revenue"),
            F.round(F.sum("revenue") / F.max("tot"), 6).alias("revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson rate-ratio test (round 9)
# ---------------------------------------------------------------------------
_RR_CRIT = 1.95996398454  # two-sided 5% (shared bisection constant)
_RR_DROP_MOD = 5  # constructed scenario: drop 1/5 of second-half purchases


@register(
    "events_rate_ratio_test",
    oracle=f"""
    WITH e AS (
      SELECT event_type, event_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
      FROM events
    ),
    temporal AS (
      SELECT 'temporal_' || event_type AS scenario,
             CAST(SUM(CASE WHEN d < 15 THEN 1 ELSE 0 END) AS DOUBLE) AS c1,
             CAST(SUM(CASE WHEN d >= 15 THEN 1 ELSE 0 END) AS DOUBLE) AS c2
      FROM e GROUP BY event_type
    ),
    constructed AS (
      SELECT 'constructed_drop' AS scenario,
             CAST(SUM(CASE WHEN d < 15 THEN 1 ELSE 0 END) AS DOUBLE) AS c1,
             CAST(SUM(CASE WHEN d >= 15
                            AND CAST(concat('0x', substr(md5(CAST(event_id
                                     AS VARCHAR)), 1, 15)) AS BIGINT)
                                % {_RR_DROP_MOD} <> 0
                           THEN 1 ELSE 0 END) AS DOUBLE) AS c2
      FROM e WHERE event_type = 'purchase'
    ),
    allrows AS (SELECT * FROM temporal UNION ALL SELECT * FROM constructed),
    stats AS (
      SELECT scenario, c1, c2,
             ln(c1 / c2) AS lrr,
             sqrt(1 / c1 + 1 / c2) AS se
      FROM allrows
    )
    SELECT scenario,
           CAST(c1 AS BIGINT) AS n_first_half,
           CAST(c2 AS BIGINT) AS n_second_half,
           ROUND(c1 / c2, 6) AS rate_ratio,
           ROUND(lrr / se, 4) AS z,
           ROUND(exp(lrr - {_RR_CRIT} * se), 6) AS ci_lo,
           ROUND(exp(lrr + {_RR_CRIT} * se), 6) AS ci_hi,
           ABS(lrr / se) > {_RR_CRIT} AS significant
    FROM stats
    """,
)
def events_rate_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson rate-ratio test — "did the error rate change?", the ops
    on-call question: for each event type, first-half vs second-half
    month counts under equal exposure, with the log-rate-ratio Wald z
    and CI (Rothman's standard epidemiologic comparison; the same test
    monitors defect and incident rates). The per-type temporal rows are
    an honest null (the fixture stream is stationary — expect ratios
    near 1); a `constructed_drop` scenario deterministically removes
    1/{_RR_DROP_MOD} of second-half purchases (the `ml_auc_roc`
    construction convention) so the significant branch is real.

    Counts are exact integers; ln/exp apply each engine's libm to
    identical rationals (module trig convention); the z critical value
    is the baked bisection constant.

    Scale: one scan into a 2-counter-per-type mergeable aggregate —
    the incident-dashboard query at any volume."""
    ev = load(spark, sf_dir, "events")
    d = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    e = ev.select("event_type", "event_id", d.alias("d"))
    temporal = e.groupBy("event_type").agg(
        F.sum((F.col("d") < 15).cast("int")).cast("double").alias("c1"),
        F.sum((F.col("d") >= 15).cast("int")).cast("double").alias("c2"),
    ).select(
        F.concat(F.lit("temporal_"), F.col("event_type")).alias("scenario"),
        "c1",
        "c2",
    )
    keep = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % _RR_DROP_MOD
        != 0
    )
    constructed = (
        e.filter(F.col("event_type") == "purchase")
        .agg(
            F.sum((F.col("d") < 15).cast("int")).cast("double").alias("c1"),
            F.sum(((F.col("d") >= 15) & keep).cast("int")).cast("double").alias("c2"),
        )
        .select(F.lit("constructed_drop").alias("scenario"), "c1", "c2")
    )
    allrows = temporal.unionByName(constructed)
    lrr = F.log(F.col("c1") / F.col("c2"))
    se = F.sqrt(1 / F.col("c1") + 1 / F.col("c2"))
    return allrows.select(
        "scenario",
        F.col("c1").cast("long").alias("n_first_half"),
        F.col("c2").cast("long").alias("n_second_half"),
        F.round(F.col("c1") / F.col("c2"), 6).alias("rate_ratio"),
        F.round(lrr / se, 4).alias("z"),
        F.round(F.exp(lrr - _RR_CRIT * se), 6).alias("ci_lo"),
        F.round(F.exp(lrr + _RR_CRIT * se), 6).alias("ci_hi"),
        (F.abs(lrr / se) > _RR_CRIT).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Retention half-life fit (round 9)
# ---------------------------------------------------------------------------


@register(
    "events_retention_halflife",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
      FROM events WHERE event_type = 'purchase'
    ),
    f AS (SELECT user_id, MIN(w) AS fw FROM act GROUP BY 1),
    sizes AS (SELECT fw, CAST(COUNT(*) AS DOUBLE) AS cohort_n FROM f GROUP BY 1),
    offs AS (
      SELECT a.w - f.fw AS k, CAST(COUNT(*) AS DOUBLE) AS retained
      FROM act a JOIN f USING (user_id)
      WHERE a.w > f.fw GROUP BY 1
    ),
    expos AS (
      -- users whose cohort can be observed at offset k (fw + k <= max week)
      SELECT k.k, SUM(s.cohort_n) AS exposed
      FROM sizes s
      CROSS JOIN (SELECT unnest(range(1, 5)) AS k) k
      WHERE s.fw + k.k <= (SELECT MAX(w) FROM act)
      GROUP BY 1
    ),
    rate AS (
      SELECT e.k, o.retained, e.exposed,
             ln(o.retained / e.exposed) AS lr
      FROM expos e JOIN offs o USING (k)
    ),
    fit AS (
      SELECT (SUM(k * lr) - SUM(k) * SUM(lr) / COUNT(*))
             / (SUM(k * k) - SUM(k) * SUM(k) / COUNT(*)) AS slope
      FROM rate
    )
    SELECT CAST(r.k AS BIGINT) AS week_offset,
           CAST(r.retained AS BIGINT) AS n_retained,
           CAST(r.exposed AS BIGINT) AS n_exposed,
           ROUND(r.retained / r.exposed, 6) AS retention,
           ROUND(f.slope, 6) AS decay_slope,
           ROUND(-ln(2) / f.slope, 4) AS halflife_weeks
    FROM rate r CROSS JOIN fit f
    """,
)
def events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: pooled cohort retention at week offsets 1-4
    (retained / exposed, exposure-corrected so late cohorts don't bias
    the tail), a log-linear OLS fit of ln(retention) on offset, and the
    implied half-life -ln(2)/slope — the single number product teams
    quote from a retention curve (and the decay constant LTV models
    plug in; analyzes what `retention_cohorts` tabulates). Purchase-
    scoped activity like `events_growth_accounting`.

    Counts are exact set-algebra integers; retention divides exact
    integers; the 4-point OLS runs over engine-identical doubles
    (ln of exact rationals), ROUND display-only.

    Scale: one distinct (user, week) partial agg — the only stage that
    sees volume — then joins bounded by users and a 4-row fit."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    act = ev.select(
        "user_id",
        F.expr("datediff(CAST(ts AS DATE), DATE '2024-01-01') div 7").alias("w"),
    ).distinct()
    f = act.groupBy("user_id").agg(F.min("w").alias("fw"))
    sizes = f.groupBy("fw").agg(F.count(F.lit(1)).cast("double").alias("cohort_n"))
    offs = (
        act.join(f, "user_id")
        .filter(F.col("w") > F.col("fw"))
        .groupBy((F.col("w") - F.col("fw")).alias("k"))
        .agg(F.count(F.lit(1)).cast("double").alias("retained"))
    )
    maxw = act.agg(F.max("w").alias("mw"))
    ks = spark.range(1, 5).select(F.col("id").cast("int").alias("k"))
    expos = (
        sizes.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(maxw))
        .filter(F.col("fw") + F.col("k") <= F.col("mw"))
        .groupBy("k")
        .agg(F.sum("cohort_n").alias("exposed"))
    )
    rate = expos.join(offs, "k").select(
        "k",
        "retained",
        "exposed",
        F.log(F.col("retained") / F.col("exposed")).alias("lr"),
    )
    n = F.count(F.lit(1))
    fit = rate.agg(
        (
            (F.sum(F.col("k") * F.col("lr")) - F.sum("k") * F.sum("lr") / n)
            / (F.sum(F.col("k") * F.col("k")) - F.sum("k") * F.sum("k") / n)
        ).alias("slope")
    )
    import math as _m

    return rate.crossJoin(F.broadcast(fit)).select(
        F.col("k").cast("long").alias("week_offset"),
        F.col("retained").cast("long").alias("n_retained"),
        F.col("exposed").cast("long").alias("n_exposed"),
        F.round(F.col("retained") / F.col("exposed"), 6).alias("retention"),
        F.round("slope", 6).alias("decay_slope"),
        F.round(-_m.log(2) / F.col("slope"), 4).alias("halflife_weeks"),
    )


# ---------------------------------------------------------------------------
# HMM forward algorithm (2 hidden states, scaled) — round 9
# ---------------------------------------------------------------------------
# fixed literal parameters shared by both engines: transitions, Bernoulli
# emissions of the "above-median day" observable, uniform init
_HMM_T = ((0.8, 0.2), (0.3, 0.7))
_HMM_E1 = (0.7, 0.2)  # P(obs=1 | state)
_HMM_P0 = (0.5, 0.5)


def _hmm_oracle() -> str:
    t, e1, p0 = _HMM_T, _HMM_E1, _HMM_P0
    return f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(CAST(SUM(value) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS m FROM daily GROUP BY 1
    ),
    obs AS (
      SELECT d.event_type,
             list_transform(
               list(struct_pack(d := d.d,
                                o := CASE WHEN d.v > m.m THEN 1.0
                                          ELSE 0.0 END) ORDER BY d.d),
               s -> s.o) AS os
      FROM daily d JOIN med m USING (event_type)
      GROUP BY d.event_type
    ),
    fwd AS (
      SELECT event_type, len(os) AS n_days,
             list_reduce(
               list_prepend([CAST({p0[0]} AS DOUBLE), CAST({p0[1]} AS DOUBLE), CAST(0.0 AS DOUBLE)],
                            list_transform(os, o -> [CAST(o AS DOUBLE)])),
               (acc, ob) -> [
                 (acc[1] * {t[0][0]} + acc[2] * {t[1][0]})
                   * (CASE WHEN ob[1] = 1.0 THEN {e1[0]}
                           ELSE {1 - e1[0]} END)
                   / ((acc[1] * {t[0][0]} + acc[2] * {t[1][0]})
                      * (CASE WHEN ob[1] = 1.0 THEN {e1[0]}
                              ELSE {1 - e1[0]} END)
                      + (acc[1] * {t[0][1]} + acc[2] * {t[1][1]})
                        * (CASE WHEN ob[1] = 1.0 THEN {e1[1]}
                                ELSE {1 - e1[1]} END)),
                 (acc[1] * {t[0][1]} + acc[2] * {t[1][1]})
                   * (CASE WHEN ob[1] = 1.0 THEN {e1[1]}
                           ELSE {1 - e1[1]} END)
                   / ((acc[1] * {t[0][0]} + acc[2] * {t[1][0]})
                      * (CASE WHEN ob[1] = 1.0 THEN {e1[0]}
                              ELSE {1 - e1[0]} END)
                      + (acc[1] * {t[0][1]} + acc[2] * {t[1][1]})
                        * (CASE WHEN ob[1] = 1.0 THEN {e1[1]}
                                ELSE {1 - e1[1]} END)),
                 acc[3] + ln((acc[1] * {t[0][0]} + acc[2] * {t[1][0]})
                      * (CASE WHEN ob[1] = 1.0 THEN {e1[0]}
                              ELSE {1 - e1[0]} END)
                      + (acc[1] * {t[0][1]} + acc[2] * {t[1][1]})
                        * (CASE WHEN ob[1] = 1.0 THEN {e1[1]}
                                ELSE {1 - e1[1]} END))
               ]
             ) AS a
      FROM obs
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND(a[3], 4) AS loglik,
           ROUND(a[1], 6) AS p_state_high_final
    FROM fwd
    """


@register("events_hmm_forward", oracle=_hmm_oracle())
def events_hmm_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HMM forward algorithm (scaled): the log-likelihood of each event
    type's above-median-day sequence under a fixed 2-state hidden Markov
    model (busy / quiet regimes: transitions {_HMM_T}, Bernoulli
    emissions {_HMM_E1}), plus the final-day regime posterior — the
    sequence-scoring primitive under every regime-switching monitor
    (and the E-step inner loop of Baum-Welch; complements
    `events_markov_stationary`, which models the OBSERVED chain). The
    scaled recursion normalizes alpha each step and accumulates the log
    normalizer, so nothing underflows at any horizon.

    Neither engine has an HMM primitive; both run the same sequential
    fold over the day-ordered observation array (the `events_dtw_distance`
    nested-fold discipline, accumulator = [alpha_0, alpha_1, loglik]),
    with identical literal parameters — bit-identical until the final
    ROUND.

    Scale: the event scan partial-aggregates to O(types x days); the
    fold is O(days) scalar work per type with zero shuffles after the
    daily aggregate. Longer horizons only lengthen the in-row array."""
    t, e1, p0 = _HMM_T, _HMM_E1, _HMM_P0
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round(F.col("v").cast("double"), 4).alias("v")
    )
    med = daily.groupBy("event_type").agg(F.percentile("v", F.lit(0.5)).alias("m"))
    obs = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d,"
                " CASE WHEN v > m THEN 1.0D ELSE 0.0D END AS o))), s -> s.o)"
            ).alias("os")
        )
    )

    def step(acc, ob):
        em0 = F.when(ob == 1.0, F.lit(e1[0])).otherwise(F.lit(1 - e1[0]))
        em1 = F.when(ob == 1.0, F.lit(e1[1])).otherwise(F.lit(1 - e1[1]))
        u0 = (
            F.element_at(acc, 1) * t[0][0] + F.element_at(acc, 2) * t[1][0]
        ) * em0
        u1 = (
            F.element_at(acc, 1) * t[0][1] + F.element_at(acc, 2) * t[1][1]
        ) * em1
        z = u0 + u1
        return F.array(u0 / z, u1 / z, F.element_at(acc, 3) + F.log(z))

    fwd = obs.select(
        "event_type",
        F.size("os").cast("long").alias("n_days"),
        F.aggregate(
            "os", F.array(F.lit(p0[0]), F.lit(p0[1]), F.lit(0.0)), step
        ).alias("a"),
    )
    return fwd.select(
        "event_type",
        "n_days",
        F.round(F.element_at("a", 3), 4).alias("loglik"),
        F.round(F.element_at("a", 1), 6).alias("p_state_high_final"),
    )


# ---------------------------------------------------------------------------
# Viterbi decoding with bitmask path carry (round 9)
# ---------------------------------------------------------------------------
import math as _vit_math

_VIT_LT = tuple(
    tuple(_vit_math.log(x) for x in row) for row in _HMM_T
)  # log transitions, evaluated once in Python and baked as literals


def _viterbi_oracle() -> str:
    lt, e1 = _VIT_LT, _HMM_E1

    def em(s):
        return (
            f"ln(CASE WHEN ob[1] = 1.0 THEN {e1[s]} ELSE {1 - e1[s]} END)"
        )

    def best(s):
        return (
            f"CASE WHEN acc[1] + {lt[0][s]} >= acc[2] + {lt[1][s]}"
            f" THEN acc[1] + {lt[0][s]} ELSE acc[2] + {lt[1][s]} END"
        )

    def bestp(s):
        return (
            f"CASE WHEN acc[1] + {lt[0][s]} >= acc[2] + {lt[1][s]}"
            f" THEN acc[3] ELSE acc[4] END"
        )

    return f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             ROUND(CAST(SUM(value) AS DOUBLE), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS m FROM daily GROUP BY 1
    ),
    obs AS (
      SELECT d.event_type,
             list_transform(
               list(struct_pack(d := d.d,
                                o := CASE WHEN d.v > m.m THEN 1.0
                                          ELSE 0.0 END) ORDER BY d.d),
               s -> s.o) AS os
      FROM daily d JOIN med m USING (event_type)
      GROUP BY d.event_type
    ),
    vit AS (
      SELECT event_type, len(os) AS n_days,
             list_reduce(
               list_prepend([CAST(ln(0.5) AS DOUBLE), ln(0.5), 0.0, 0.0],
                            list_transform(os, o -> [CAST(o AS DOUBLE)])),
               (acc, ob) -> [
                 ({best(0)}) + {em(0)},
                 ({best(1)}) + {em(1)},
                 ({bestp(0)}) * 2.0,
                 ({bestp(1)}) * 2.0 + 1.0
               ]) AS a
      FROM obs
    ),
    path AS (
      SELECT event_type, n_days,
             CASE WHEN a[1] >= a[2] THEN a[1] ELSE a[2] END AS best_ll,
             CAST(CASE WHEN a[1] >= a[2] THEN a[3] ELSE a[4] END
                  AS BIGINT) AS mask
      FROM vit
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND(best_ll, 4) AS path_loglik,
           CAST(bit_count(CAST(mask AS BIT)) AS BIGINT) AS n_quiet_days,
           CAST(bit_count(CAST(xor(mask, mask // 2) AS BIT)
                ) AS BIGINT)
             - CASE WHEN mask % 2 = 1 THEN 0 ELSE 0 END
             - CASE WHEN mask >= (1::BIGINT << (n_days - 1))
                    THEN 1 ELSE 0 END AS n_switches
    FROM path
    """


@register("events_viterbi_path", oracle=_viterbi_oracle())
def events_viterbi_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of the same 2-state busy/quiet HMM that
    `events_hmm_forward` scores: the single most-likely regime path per
    event type, summarized as the path log-likelihood, the number of
    quiet-regime days, and the number of regime switches — the hard
    segmentation a monitoring UI draws over the timeline (forward gives
    the marginal; Viterbi gives the explanation). The dynamic program
    carries BOTH states' best paths as integer BITMASKS inside the fold
    accumulator ([delta0, delta1, path0, path1]; a 30-day path is < 2^30,
    exactly representable in a double), so the argmax backtrace needs no
    second pass and no driver state — the whole decode is one in-row
    sequential fold, bit-identical across engines (delta comparisons see
    identical doubles; ties prefer state 0 in both texts).

    Switch counting is popcount(mask XOR mask>>1) with the top-bit
    artifact subtracted when day 1 was quiet (the shifted-in zero).

    Scale: identical profile to `events_hmm_forward` — O(types x days)
    partial agg, then O(days) scalar fold per type, zero shuffles."""
    lt, e1 = _VIT_LT, _HMM_E1
    daily = daily_value_series(spark, sf_dir, agg="sum").select(
        "event_type", "d", F.round(F.col("v").cast("double"), 4).alias("v")
    )
    med = daily.groupBy("event_type").agg(F.percentile("v", F.lit(0.5)).alias("m"))
    obs = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(d,"
                " CASE WHEN v > m THEN 1.0D ELSE 0.0D END AS o))), s -> s.o)"
            ).alias("os")
        )
    )

    def step(acc, ob):
        def em(s):
            return F.log(
                F.when(ob == 1.0, F.lit(e1[s])).otherwise(F.lit(1 - e1[s]))
            )

        def pick(s, take_delta):
            c = (F.element_at(acc, 1) + lt[0][s]) >= (
                F.element_at(acc, 2) + lt[1][s]
            )
            if take_delta:
                return F.when(c, F.element_at(acc, 1) + lt[0][s]).otherwise(
                    F.element_at(acc, 2) + lt[1][s]
                )
            return F.when(c, F.element_at(acc, 3)).otherwise(F.element_at(acc, 4))

        return F.array(
            pick(0, True) + em(0),
            pick(1, True) + em(1),
            pick(0, False) * 2.0,
            pick(1, False) * 2.0 + 1.0,
        )

    init = F.array(
        F.lit(_vit_math.log(0.5)), F.lit(_vit_math.log(0.5)), F.lit(0.0), F.lit(0.0)
    )
    vit = obs.select(
        "event_type",
        F.size("os").cast("long").alias("n_days"),
        F.aggregate("os", init, step).alias("a"),
    )
    best_ll = F.when(
        F.element_at("a", 1) >= F.element_at("a", 2), F.element_at("a", 1)
    ).otherwise(F.element_at("a", 2))
    mask = (
        F.when(
            F.element_at("a", 1) >= F.element_at("a", 2), F.element_at("a", 3)
        )
        .otherwise(F.element_at("a", 4))
        .cast("long")
    )
    path = vit.select(
        "event_type", "n_days", best_ll.alias("best_ll"), mask.alias("mask")
    )
    switches = F.bit_count(
        F.col("mask").bitwiseXOR(F.expr("shiftright(mask, 1)"))
    ) - F.when(
        F.col("mask") >= F.expr("shiftleft(CAST(1 AS BIGINT), CAST(n_days - 1 AS INT))"),
        1,
    ).otherwise(0)
    return path.select(
        "event_type",
        "n_days",
        F.round("best_ll", 4).alias("path_loglik"),
        F.bit_count("mask").cast("long").alias("n_quiet_days"),
        switches.cast("long").alias("n_switches"),
    )


# ---------------------------------------------------------------------------
# Net revenue retention (round 9)
# ---------------------------------------------------------------------------
_NRR_OFFSETS = (1, 3, 6, 12)


@register(
    "orders_net_revenue_retention",
    oracle=f"""
    WITH om AS (
      SELECT o_custkey,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) // 30
               AS m,
             o_totalprice
      FROM orders
    ),
    first_m AS (SELECT o_custkey, MIN(m) AS c FROM om GROUP BY 1),
    maxm AS (SELECT MAX(m) AS mm FROM om),
    cohort_rev AS (
      SELECT f.c, SUM(o.o_totalprice) AS rev0
      FROM om o JOIN first_m f USING (o_custkey)
      WHERE o.m = f.c GROUP BY f.c
    ),
    later_rev AS (
      SELECT f.c, o.m - f.c AS k, SUM(o.o_totalprice) AS revk
      FROM om o JOIN first_m f USING (o_custkey)
      WHERE o.m > f.c GROUP BY f.c, o.m - f.c
    ),
    pooled AS (
      SELECT k.k,
             SUM(CASE WHEN cr.c + k.k <= mx.mm THEN COALESCE(lr.revk, 0)
                      ELSE 0 END) AS num,
             SUM(CASE WHEN cr.c + k.k <= mx.mm THEN cr.rev0 ELSE 0 END) AS den
      FROM cohort_rev cr
      CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in _NRR_OFFSETS)}])
                  AS k) k
      CROSS JOIN maxm mx
      LEFT JOIN later_rev lr ON lr.c = cr.c AND lr.k = k.k
      GROUP BY k.k
    )
    SELECT CAST(k AS BIGINT) AS month_offset,
           ROUND(num, 2) AS retained_revenue,
           ROUND(den, 2) AS cohort_base_revenue,
           ROUND(num / den, 6) AS nrr
    FROM pooled WHERE den > 0
    """,
)
def orders_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention: for offsets {_NRR_OFFSETS} months after a
    customer cohort's first order month, the cohort's revenue in that
    month as a share of its first-month revenue, pooled over cohorts
    with the exposure correction (a cohort only enters offsets it can be
    observed at) — THE SaaS board metric (NRR > 100% = expansion beats
    churn), and the revenue-weighted sibling of `retention_cohorts`'
    user counts / `events_retention_halflife`'s decay fit.

    Numerator and denominator are exact decimal sums keyed on integer
    month arithmetic; the ratio divides identical sums in both engines.

    Scale: one scan to per-(customer, month) rows, a per-customer MIN,
    and joins bounded by cohorts x offsets. The same plan refreshes
    incrementally month over month."""
    o = load(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') div 30"
        ).alias("m"),
        "o_totalprice",
    )
    first_m = om.groupBy("o_custkey").agg(F.min("m").alias("c"))
    maxm = om.agg(F.max("m").alias("mm"))
    withc = om.join(first_m, "o_custkey")
    cohort_rev = (
        withc.filter(F.col("m") == F.col("c"))
        .groupBy("c")
        .agg(F.sum("o_totalprice").alias("rev0"))
    )
    later_rev = (
        withc.filter(F.col("m") > F.col("c"))
        .groupBy("c", (F.col("m") - F.col("c")).alias("k"))
        .agg(F.sum("o_totalprice").alias("revk"))
    )
    ks = spark.range(0, len(_NRR_OFFSETS)).select(
        F.element_at(
            F.array(*[F.lit(k) for k in _NRR_OFFSETS]), (F.col("id") + 1).cast("int")
        ).alias("k")
    )
    pooled = (
        cohort_rev.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(maxm))
        .join(later_rev, ["c", "k"], "left")
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("c") + F.col("k") <= F.col("mm"),
                    F.coalesce(F.col("revk"), F.lit(0.0)),
                ).otherwise(0.0)
            ).alias("num"),
            F.sum(
                F.when(
                    F.col("c") + F.col("k") <= F.col("mm"), F.col("rev0")
                ).otherwise(0.0)
            ).alias("den"),
        )
    )
    return pooled.filter(F.col("den") > 0).select(
        F.col("k").cast("long").alias("month_offset"),
        F.round("num", 2).alias("retained_revenue"),
        F.round("den", 2).alias("cohort_base_revenue"),
        F.round(F.col("num") / F.col("den"), 6).alias("nrr"),
    )


# ---------------------------------------------------------------------------
# Event-mix entropy trend (round 9)
# ---------------------------------------------------------------------------


@register(
    "events_mix_entropy_trend",
    oracle="""
    WITH cells AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             event_type, CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT d, -SUM(n / dn * ln(n / dn) / ln(2)) AS h,
             CAST(MAX(dn) AS BIGINT) AS n_events
      FROM (SELECT *, SUM(n) OVER (PARTITION BY d) AS dn FROM cells)
      GROUP BY d
    ),
    halves AS (
      SELECT AVG(CASE WHEN d < 15 THEN h END) AS h1,
             AVG(CASE WHEN d >= 15 THEN h END) AS h2
      FROM daily
    )
    SELECT CAST(daily.d AS BIGINT) AS day,
           daily.n_events,
           ROUND(daily.h, 6) AS mix_entropy_bits,
           ROUND(hv.h2 - hv.h1, 6) AS half_over_half_delta
    FROM daily CROSS JOIN halves hv
    """,
)
def events_mix_entropy_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily Shannon entropy of the event-type mix (bits) with the
    second-half-minus-first-half drift delta — "is the traffic
    composition shifting?", the single-number mix monitor ops teams
    chart next to volume (a collapsing entropy means one type is taking
    over — bot floods and client bugs both look exactly like that). The
    per-day entropy is over the 5-type distribution; the delta column is
    a constant broadcast so the scalar drift verdict is hash-pinned too.

    Probabilities are ratios of exact integer counts per day; ln on
    identical rationals (module convention), ROUND(6) display-only.

    Scale: one partial-aggregating scan to O(days x types) cells, a
    window over those ~150 rows, a 1-row halves aggregate broadcast
    back. Any volume, one shuffle."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    import math as _m

    ln2 = _m.log(2)
    wd = Window.partitionBy("d")
    daily = (
        cells.withColumn("dn", F.sum("n").over(wd))
        .groupBy("d")
        .agg(
            (
                -F.sum(
                    F.col("n") / F.col("dn") * F.log(F.col("n") / F.col("dn")) / ln2
                )
            ).alias("h"),
            F.max("dn").cast("long").alias("n_events"),
        )
    )
    halves = daily.agg(
        F.avg(F.when(F.col("d") < 15, F.col("h"))).alias("h1"),
        F.avg(F.when(F.col("d") >= 15, F.col("h"))).alias("h2"),
    )
    return daily.crossJoin(F.broadcast(halves)).select(
        F.col("d").cast("long").alias("day"),
        "n_events",
        F.round("h", 6).alias("mix_entropy_bits"),
        F.round(F.col("h2") - F.col("h1"), 6).alias("half_over_half_delta"),
    )


# ---------------------------------------------------------------------------
# Partial autocorrelation via Durbin-Levinson (round 9)
# ---------------------------------------------------------------------------


@register(
    "events_pacf",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    m AS (SELECT event_type, AVG(v) AS vbar FROM daily GROUP BY 1),
    den AS (
      SELECT d.event_type, SUM((d.v - m.vbar) * (d.v - m.vbar)) AS ss
      FROM daily d JOIN m USING (event_type) GROUP BY 1
    ),
    num AS (
      SELECT a.event_type, k.k,
             SUM((a.v - m.vbar) * (b.v - m.vbar)) AS num
      FROM daily a
      JOIN m USING (event_type)
      CROSS JOIN (VALUES (1), (2), (3)) AS k(k)
      JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + k.k
      GROUP BY 1, 2
    ),
    r AS (
      SELECT n.event_type,
             MAX(CASE WHEN n.k = 1 THEN n.num / den.ss END) AS r1,
             MAX(CASE WHEN n.k = 2 THEN n.num / den.ss END) AS r2,
             MAX(CASE WHEN n.k = 3 THEN n.num / den.ss END) AS r3
      FROM num n JOIN den ON den.event_type = n.event_type
      GROUP BY 1
    )
    SELECT event_type,
           ROUND(r1, 6) AS r1, ROUND(r2, 6) AS r2, ROUND(r3, 6) AS r3,
           ROUND(r1, 6) AS pacf1,
           ROUND((r2 - r1 * r1) / (1 - r1 * r1), 6) AS pacf2,
           ROUND((r3 - (r1 * (1 - (r2 - r1 * r1) / (1 - r1 * r1))) * r2
                     - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1)
                 / (1 - (r1 * (1 - (r2 - r1 * r1) / (1 - r1 * r1))) * r1
                      - ((r2 - r1 * r1) / (1 - r1 * r1)) * r2), 6) AS pacf3
    FROM r
    """,
)
def events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily per-type revenue series at
    lags 1-3 via the Durbin-Levinson recursion unrolled in closed form —
    the AR-order identification tool (`events_acf` tails off under an AR
    process; THIS cuts off after the true order p): pacf1 = r1, pacf2 =
    (r2−r1²)/(1−r1²), pacf3 from the level-2 coefficients φ21 = r1(1−φ22).
    Autocorrelations use the classical estimator (full-series mean and
    denominator) rather than pairwise Pearson, the convention DL assumes.

    Scale: one map-side daily aggregate sees the volume; the lag joins
    align O(days) rows per type; the DL algebra runs on a one-row-per-type
    frame. Identical arithmetic expressions on identically-rounded inputs
    in both engines."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    m = daily.groupBy("event_type").agg(F.avg("v").alias("vbar"))
    dm = daily.join(F.broadcast(m), "event_type")
    den = dm.groupBy("event_type").agg(
        F.sum((F.col("v") - F.col("vbar")) * (F.col("v") - F.col("vbar"))).alias("ss")
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("k")
    )
    a = dm.alias("a").crossJoin(F.broadcast(ks))
    b = daily.alias("b")
    num = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.d") == F.col("a.d") + F.col("k")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"), "k")
        .agg(
            F.sum(
                (F.col("a.v") - F.col("a.vbar")) * (F.col("b.v") - F.col("a.vbar"))
            ).alias("num")
        )
    )
    r = (
        num.join(F.broadcast(den), "event_type")
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("k") == 1, F.col("num") / F.col("ss"))).alias("r1"),
            F.max(F.when(F.col("k") == 2, F.col("num") / F.col("ss"))).alias("r2"),
            F.max(F.when(F.col("k") == 3, F.col("num") / F.col("ss"))).alias("r3"),
        )
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 * (1 - phi22)
    pacf3 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    return r.select(
        "event_type",
        F.round(r1, 6).alias("r1"),
        F.round(r2, 6).alias("r2"),
        F.round(r3, 6).alias("r3"),
        F.round(r1, 6).alias("pacf1"),
        F.round(phi22, 6).alias("pacf2"),
        F.round(pacf3, 6).alias("pacf3"),
    )


# ---------------------------------------------------------------------------
# Generalized ESD outlier peeling (round 9)
# ---------------------------------------------------------------------------
_ESD_ROUNDS = 3


def _esd_oracle() -> str:
    parts = [
        """
    WITH daily1 AS (
      SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1
    )"""
    ]
    for k in range(1, _ESD_ROUNDS + 1):
        parts.append(f"""
    s{k} AS (SELECT AVG(v) AS m, stddev_samp(v) AS sd, COUNT(*) AS n
             FROM daily{k}),
    o{k} AS (
      SELECT d, v, ROUND(ABS(v - s{k}.m) / s{k}.sd, 6) AS r, s{k}.n AS n
      FROM daily{k} CROSS JOIN s{k}
      ORDER BY ROUND(ABS(v - s{k}.m) / s{k}.sd, 6) DESC, d
      LIMIT 1
    ),
    daily{k + 1} AS (
      SELECT d, v FROM daily{k} WHERE d NOT IN (SELECT d FROM o{k})
    )""")
    selects = [
        f"SELECT {k} AS round, d AS day, ROUND(v, 4) AS v, r AS r_stat, "
        f"CAST(n AS BIGINT) AS n_remaining FROM o{k}"
        for k in range(1, _ESD_ROUNDS + 1)
    ]
    return ",".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@register("events_anomaly_esd", oracle=_esd_oracle())
def events_anomaly_esd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD outlier peeling (Rosner 1983) on the all-types
    daily revenue series: {_ESD_ROUNDS} statically-unrolled rounds each
    recompute mean/stddev over the REMAINING days, emit the most extreme
    studentized deviate R_k = max|v−m|/sd (tie-break: earliest day), and
    peel it — the masking-resistant multi-outlier test that single-pass
    z-scores (`anomaly_zscore`) fail when one extreme inflates the scale
    estimate for the others. R_k is emitted raw; compare against the ESD
    critical-value ladder for the chosen alpha downstream.

    Scale: the only volume-touching stage is the daily partial aggregate;
    each peel round is a 1-row stats reduce + TakeOrdered(1) + anti-join
    over O(days) rows. Determinism: deviates ROUND(6) before the argmax
    ordering so both engines peel the same day."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d")
        )
        .agg(F.sum("value").alias("v"))
    )
    outs = []
    cur = daily
    for k in range(1, _ESD_ROUNDS + 1):
        st = cur.agg(
            F.avg("v").alias("m"),
            F.stddev_samp("v").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        o = (
            cur.crossJoin(F.broadcast(st))
            .select(
                "d",
                "v",
                F.round(F.abs(F.col("v") - F.col("m")) / F.col("sd"), 6).alias("r"),
                "n",
            )
            .orderBy(F.col("r").desc(), "d")
            .limit(1)
            .localCheckpoint(eager=True)  # consumed twice: output + anti-join
        )
        outs.append(
            o.select(
                F.lit(k).alias("round"),
                F.col("d").alias("day"),
                F.round("v", 4).alias("v"),
                F.col("r").alias("r_stat"),
                F.col("n").cast("long").alias("n_remaining"),
            )
        )
        cur = cur.join(o.select("d"), "d", "left_anti")
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# Day-of-week seasonal strength (round 9)
# ---------------------------------------------------------------------------


@register(
    "events_seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    dow AS (
      SELECT event_type, d % 7 AS dow, AVG(v) AS s
      FROM daily GROUP BY 1, 2
    ),
    j AS (
      SELECT daily.event_type, daily.v, daily.v - dow.s AS r
      FROM daily JOIN dow
        ON dow.event_type = daily.event_type AND dow.dow = daily.d % 7
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(var_samp(v), 4) AS var_total,
           ROUND(var_samp(r), 4) AS var_remainder,
           ROUND(GREATEST(0.0, 1.0 - var_samp(r) / var_samp(v)), 6)
             AS seasonal_strength
    FROM j GROUP BY event_type
    """,
)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal strength per event type: fit the DOW-means
    model to the daily series and report Fs = max(0, 1 − Var(remainder)/
    Var(series)) — the R² of the weekly-seasonal component, the
    STL-decomposition "strength of seasonality" statistic in its ANOVA
    form. The triage number that decides whether downstream models
    (forecast_backtest, anomaly_seasonal) should bother with a weekly
    term; `events_seasonality` reports the per-DOW profile itself, THIS
    reduces it to one comparable scalar per series.

    Scale: daily partial agg (the volume stage) -> 7-row DOW means per
    type -> one join back on integer (type, dow) keys -> per-type
    variance reduce. var_samp on identical doubles in both engines."""
    daily = daily_value_series(spark, sf_dir, agg="sum").alias("a")
    dow = (
        daily_value_series(spark, sf_dir, agg="sum")
        .groupBy(F.col("event_type").alias("et"), (F.col("d") % 7).alias("dow"))
        .agg(F.avg("v").alias("s"))
    )
    j = daily.join(
        F.broadcast(dow),
        (F.col("et") == F.col("a.event_type")) & (F.col("dow") == F.col("a.d") % 7),
    ).select(
        F.col("a.event_type").alias("event_type"),
        "v",
        (F.col("v") - F.col("s")).alias("r"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.var_samp("v"), 4).alias("var_total"),
        F.round(F.var_samp("r"), 4).alias("var_remainder"),
        F.round(
            F.greatest(F.lit(0.0), F.lit(1.0) - F.var_samp("r") / F.var_samp("v")), 6
        ).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (round 9)
# ---------------------------------------------------------------------------
_CR_ALPHA = 0.2
_CR_USER_MOD = 7  # sparsify: only users with user_id % 7 = 0 demand


@register(
    "events_croston",
    oracle=f"""
    WITH demand AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS y
      FROM events WHERE user_id % {_CR_USER_MOD} = 0
      GROUP BY 1, 2
    ),
    seq AS (
      SELECT event_type, d, y,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m,
             d - LAG(d) OVER w AS gap
      FROM demand
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    ses AS (
      SELECT event_type, MAX(m) AS m,
             SUM(CASE WHEN rn = 1 THEN pow(1 - {_CR_ALPHA}, m - 1) * y
                      ELSE {_CR_ALPHA} * pow(1 - {_CR_ALPHA}, m - rn) * y
                 END) AS s_size,
             SUM(CASE WHEN rn = 2 THEN pow(1 - {_CR_ALPHA}, m - 2) * gap
                      WHEN rn > 2 THEN
                        {_CR_ALPHA} * pow(1 - {_CR_ALPHA}, m - rn) * gap
                 END) AS s_int,
             AVG(gap) AS mean_gap
      FROM seq GROUP BY event_type
    )
    SELECT event_type, CAST(m AS BIGINT) AS n_demand_days,
           ROUND(mean_gap, 4) AS mean_interval,
           ROUND(s_size, 4) AS ses_size,
           ROUND(s_int, 4) AS ses_interval,
           ROUND(s_size / s_int, 4) AS croston_forecast,
           ROUND((1 - {_CR_ALPHA} / 2) * s_size / s_int, 4) AS sba_forecast
    FROM ses
    """,
)
def events_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) for intermittent demand, per event type:
    separate exponential smoothing of nonzero demand SIZES and of the
    INTERVALS between demand days (alpha={_CR_ALPHA}), forecast =
    size/interval, plus the Syntetos-Boylan bias correction (x(1−α/2)) —
    the spare-parts/slow-mover forecaster where Holt/EWMA on the raw
    (mostly-zero) series systematically lags. Demand is sparsified to the
    user_id % {_CR_USER_MOD} = 0 cohort so the interval process is
    non-trivial at fixture scale.

    The SES recursions are evaluated in closed form — weight
    α(1−α)^(m−i) per observation, (1−α)^(m−1) for the first — so no
    sequential state crosses rows: one daily partial agg (the volume
    stage), one O(days)-row window pass for rank/gap, one weighted-sum
    reduce per type. pow on identical integer exponents matches across
    engines; ROUND(4)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id") % _CR_USER_MOD == 0
    )
    demand = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.sum("value").alias("y"))
    w = Window.partitionBy("event_type").orderBy("d")
    wc = Window.partitionBy("event_type")
    seq = demand.select(
        "event_type",
        "d",
        "y",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("m"),
        (F.col("d") - F.lag("d").over(w)).alias("gap"),
    )
    al = _CR_ALPHA
    ses = seq.groupBy("event_type").agg(
        F.max("m").alias("m"),
        F.sum(
            F.when(
                F.col("rn") == 1,
                F.pow(F.lit(1 - al), F.col("m") - 1) * F.col("y"),
            ).otherwise(
                F.lit(al) * F.pow(F.lit(1 - al), F.col("m") - F.col("rn")) * F.col("y")
            )
        ).alias("s_size"),
        F.sum(
            F.when(
                F.col("rn") == 2,
                F.pow(F.lit(1 - al), F.col("m") - 2) * F.col("gap"),
            ).when(
                F.col("rn") > 2,
                F.lit(al) * F.pow(F.lit(1 - al), F.col("m") - F.col("rn")) * F.col("gap"),
            )
        ).alias("s_int"),
        F.avg("gap").alias("mean_gap"),
    )
    return ses.select(
        "event_type",
        F.col("m").cast("long").alias("n_demand_days"),
        F.round("mean_gap", 4).alias("mean_interval"),
        F.round("s_size", 4).alias("ses_size"),
        F.round("s_int", 4).alias("ses_interval"),
        F.round(F.col("s_size") / F.col("s_int"), 4).alias("croston_forecast"),
        F.round(F.lit(1 - al / 2) * F.col("s_size") / F.col("s_int"), 4).alias(
            "sba_forecast"
        ),
    )


# ---------------------------------------------------------------------------
# Index of dispersion (Poisson overdispersion screen) (round 9)
# ---------------------------------------------------------------------------


@register(
    "events_dispersion_index",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(c), 4) AS mean_count,
           ROUND(var_samp(c), 4) AS var_count,
           ROUND(var_samp(c) / AVG(c), 6) AS dispersion_index,
           ROUND((var_samp(c) / AVG(c) - 1.0)
                 * sqrt((COUNT(*) - 1) / 2.0), 4) AS z_stat,
           var_samp(c) / AVG(c) > 1.0 AS overdispersed
    FROM daily GROUP BY event_type
    """,
)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion on the daily arrival counts per event type:
    D = Var/Mean with the normal-approximation z = (D−1)·sqrt((n−1)/2) —
    the Poisson-ness screen (D ≈ 1 Poisson, D > 1 bursty/clumped, D < 1
    regular) that decides whether rate models (`events_rate_ratio_test`,
    the SLO burn math) can assume Poisson arrivals or need a
    negative-binomial correction. Complements `events_interarrival`
    (which looks at gaps; this looks at counts).

    Scale: one map-side daily count aggregate, one per-type variance
    reduce over O(days) rows. var_samp/avg on identical doubles."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    d_idx = F.var_samp("c") / F.avg("c")
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg("c"), 4).alias("mean_count"),
        F.round(F.var_samp("c"), 4).alias("var_count"),
        F.round(d_idx, 6).alias("dispersion_index"),
        F.round(
            (d_idx - 1.0) * F.sqrt((F.count(F.lit(1)) - 1) / F.lit(2.0)), 4
        ).alias("z_stat"),
        (d_idx > 1.0).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift detector (round 10)
# ---------------------------------------------------------------------------
_PH_DELTA = 0.5  # tolerated per-step drift in daily mean value
_PH_LAMBDA = 20.0  # alarm threshold on the PH statistic


@register(
    "events_page_hinkley",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             AVG(value) AS v
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, d, v,
             AVG(v) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mu,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily
    ),
    m AS (
      SELECT event_type, d, t,
             SUM(v - mu - {_PH_DELTA})
               OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
      FROM cum
    ),
    ph AS (
      SELECT event_type, d, t, mt,
             mt - MIN(mt) OVER (PARTITION BY event_type ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS ph_t
      FROM m
    )
    SELECT event_type,
           CAST(MAX(t) AS BIGINT) AS n_days,
           ROUND(MAX(ph_t), 6) AS max_ph,
           CAST(MIN(CASE WHEN ph_t > {_PH_LAMBDA} THEN d END) AS BIGINT)
             AS first_alarm_day,
           CAST(MAX(ph_t) > {_PH_LAMBDA} AS BOOLEAN) AS drift_detected
    FROM ph GROUP BY event_type
    """,
)
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley drift detector (Page 1954, Hinkley 1971) over each
    event type's daily mean value: the sequential statistic
    m_t = sum_i (x_i - mu_i - delta) against its running minimum, alarming
    when the gap exceeds lambda={_PH_LAMBDA} — the streaming-ML standard
    for "has this metric's level shifted upward?", complementing
    `events_cusum` (known target mean) with the self-calibrating running
    mean mu_i, and `events_changepoint` (retrospective, single split)
    with an ONLINE detector whose alarm day is the deployable signal.

    Plan: the event stream collapses to O(days x types) in the shared
    `daily_value_series` partial aggregation; every window after that
    (running mean, running sum, running min) rides ONE
    partitionBy(event_type) ORDER BY day sort over that small frame —
    the sanctioned daily-series window shape. Reports per type: series
    length, max PH statistic, first alarm day, and the drift verdict."""
    daily = daily_value_series(spark, sf_dir, agg="avg")
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "event_type",
        "d",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.row_number().over(Window.partitionBy("event_type").orderBy("d")).alias(
            "t"
        ),
    )
    m = cum.select(
        "event_type",
        "d",
        "t",
        F.sum(F.col("v") - F.col("mu") - _PH_DELTA).over(w).alias("mt"),
    )
    ph = m.select(
        "event_type", "d", "t", (F.col("mt") - F.min("mt").over(w)).alias("ph_t")
    )
    return ph.groupBy("event_type").agg(
        F.max("t").cast("long").alias("n_days"),
        F.round(F.max("ph_t"), 6).alias("max_ph"),
        F.min(F.when(F.col("ph_t") > _PH_LAMBDA, F.col("d")))
        .cast("long")
        .alias("first_alarm_day"),
        (F.max("ph_t") > _PH_LAMBDA).alias("drift_detected"),
    )


# ---------------------------------------------------------------------------
# Phase-folded lightcurve (round 10)
# ---------------------------------------------------------------------------
_PF_PERIOD = 7.0  # fold period in days (the weekly cycle planted in events)
_PF_BINS = 20


@register(
    "lightcurve_phase_fold",
    oracle=f"""
    WITH obs AS (
      SELECT epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000.0 AS t, value AS v
      FROM events WHERE event_type = 'view'
    )
    SELECT CAST(LEAST(FLOOR(((t / {_PF_PERIOD}) % 1.0) * {_PF_BINS}),
                      {_PF_BINS} - 1) AS INT) AS phase_bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(v), 6) AS mean_v,
           ROUND(STDDEV_SAMP(v) / SQRT(COUNT(*)), 6) AS sem_v
    FROM obs GROUP BY 1
    """,
)
def lightcurve_phase_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase-folded lightcurve at a KNOWN period ({_PF_PERIOD} days): fold
    observation times modulo the period, bin the phase into {_PF_BINS}
    cells, and report each cell's mean value with its standard error —
    the reduction every periodic-variable pipeline runs after a period
    search (`lightcurve_pdm`/`lightcurve_bls` FIND the period; the fold
    at that period is what a human or a classifier actually inspects).

    Plan: single pass — phase arithmetic is per-row double fmod, then one
    {_PF_BINS}-cell partial-aggregating groupBy; nothing scales with
    anything but the input scan. The same fold at 100 TB is embarrassing
    parallelism with a {_PF_BINS}-row result."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    obs = ev.select(
        (F.unix_micros(F.col("ts")) / 86_400_000_000.0).alias("t"),
        F.col("value").alias("v"),
    )
    pbin = F.least(
        F.floor(((F.col("t") / _PF_PERIOD) % 1.0) * _PF_BINS), F.lit(_PF_BINS - 1)
    ).cast("int")
    return obs.groupBy(pbin.alias("phase_bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.round(F.stddev_samp("v") / F.sqrt(F.count(F.lit(1))), 6).alias("sem_v"),
    )


# ---------------------------------------------------------------------------
# Interrupted time series / segmented regression (round 10)
# ---------------------------------------------------------------------------
_ITS_CUT = 15  # intervention day (the ml_did_estimator period convention)


@register(
    "events_intervention_its",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS d,
             AVG(value) AS v
      FROM events GROUP BY 1, 2
    ),
    seg AS (
      SELECT event_type, CASE WHEN d < {_ITS_CUT} THEN 0 ELSE 1 END AS post,
             COUNT(*) AS n, AVG(d) AS mx, AVG(v) AS my,
             SUM(d * d) AS sxx, SUM(d * v) AS sxy
      FROM daily GROUP BY 1, 2
    ),
    fit AS (
      SELECT event_type, post, n, mx, my,
             (sxy - n * mx * my) / (sxx - n * mx * mx) AS slope,
             my - (sxy - n * mx * my) / (sxx - n * mx * mx) * mx AS icept
      FROM seg
    )
    SELECT a.event_type,
           ROUND(b.icept + b.slope * {_ITS_CUT}
                 - (a.icept + a.slope * {_ITS_CUT}), 6) AS level_change,
           ROUND(b.slope - a.slope, 6) AS slope_change,
           ROUND(a.slope, 6) AS pre_slope,
           CAST(a.n AS BIGINT) AS n_pre, CAST(b.n AS BIGINT) AS n_post
    FROM fit a JOIN fit b USING (event_type)
    WHERE a.post = 0 AND b.post = 1
    """,
)
def events_intervention_its(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time series (segmented regression) per event type: OLS
    lines fitted separately before and after an intervention at day
    {_ITS_CUT}, reporting the LEVEL change (post line minus pre line,
    both evaluated at the cutoff) and the SLOPE change — the quasi-
    experimental design when there is no control group at all
    (`ml_did_estimator` needs one; `ml_regression_discontinuity` needs a
    continuous running variable; ITS needs only the before/after series).
    The fixture has no real intervention, so both changes sit near 0 —
    a true-null placebo, the same convention as the DiD null scenario.

    Plan: the event stream collapses in the shared daily partial
    aggregation; each segment's OLS is closed-form moment algebra over
    O(days x types x 2) rows, and the pre/post join is on the tiny fit
    table. Nothing after the first groupBy scales with volume."""
    daily = daily_value_series(spark, sf_dir, agg="avg").select(
        "event_type", F.col("d").cast("double").alias("d"), "v"
    )
    seg = daily.groupBy(
        "event_type",
        F.when(F.col("d") < _ITS_CUT, 0).otherwise(1).alias("post"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("d").alias("mx"),
        F.avg("v").alias("my"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
        F.sum(F.col("d") * F.col("v")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")
    )
    fit = seg.select(
        "event_type",
        "post",
        "n",
        slope.alias("slope"),
        (F.col("my") - slope * F.col("mx")).alias("icept"),
    )
    a = fit.filter(F.col("post") == 0).alias("a")
    b = fit.filter(F.col("post") == 1).alias("b")
    return a.join(b, F.col("a.event_type") == F.col("b.event_type")).select(
        F.col("a.event_type").alias("event_type"),
        F.round(
            (F.col("b.icept") + F.col("b.slope") * _ITS_CUT)
            - (F.col("a.icept") + F.col("a.slope") * _ITS_CUT),
            6,
        ).alias("level_change"),
        F.round(F.col("b.slope") - F.col("a.slope"), 6).alias("slope_change"),
        F.round(F.col("a.slope"), 6).alias("pre_slope"),
        F.col("a.n").cast("long").alias("n_pre"),
        F.col("b.n").cast("long").alias("n_post"),
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness (round 10)
# ---------------------------------------------------------------------------


@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH d AS (
      SELECT date_trunc('month', CAST(ts AS DATE)) AS month,
             CAST(ts AS DATE) AS day, user_id
      FROM events
    ),
    dau AS (
      SELECT month, day, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS dau
      FROM d GROUP BY month, day
    ),
    mau AS (
      SELECT month, CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS mau,
             CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      FROM d GROUP BY month
    )
    SELECT CAST(mau.month AS DATE) AS month,
           CAST(mau.mau AS BIGINT) AS mau,
           ROUND(AVG(dau.dau), 4) AS avg_dau,
           mau.n_days,
           ROUND(AVG(dau.dau) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau USING (month)
    GROUP BY mau.month, mau.mau, mau.n_days
    """,
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month — average daily active users over
    monthly active users, the engagement-frequency ratio every product
    dashboard tracks (1.0 = every monthly user shows up every day;
    `events_growth_accounting` classifies WHO churned, stickiness says
    how habitual the survivors are).

    Plan: two countDistinct aggregations off one projection — the daily
    one partial-aggregates per (month, day), the monthly one per month —
    joined on the O(months) key. countDistinct over user ids is the
    exact form; at 100 TB the sketch form (`agg_approx_distinct`) swaps
    in per the documented trade, shape unchanged."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("month", F.col("ts").cast("date")).cast("date").alias("month"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    dau = d.groupBy("month", "day").agg(
        F.countDistinct("user_id").cast("double").alias("dau")
    )
    mau = d.groupBy("month").agg(
        F.countDistinct("user_id").cast("double").alias("mau"),
        F.countDistinct("day").alias("n_days"),
    )
    return (
        dau.join(F.broadcast(mau), "month")
        .groupBy("month", "mau", "n_days")
        .agg(
            F.round(F.avg("dau"), 4).alias("avg_dau"),
            F.round(F.avg("dau") / F.first("mau"), 6).alias("stickiness"),
        )
        .select(
            "month",
            F.col("mau").cast("long").alias("mau"),
            "avg_dau",
            F.col("n_days").cast("long").alias("n_days"),
            "stickiness",
        )
    )


# ---------------------------------------------------------------------------
# Poisson goodness-of-fit on order size (round 10)
# ---------------------------------------------------------------------------
_GOF_CAP = 10  # categories 0..cap-1 individually, >=cap pooled


@register(
    "orders_poisson_gof",
    oracle=f"""
    WITH per AS (
      SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY 1
    ),
    hist AS (SELECT k, CAST(COUNT(*) AS DOUBLE) AS o FROM per GROUP BY k),
    s AS (
      SELECT SUM(o) AS n, SUM(k * o) / SUM(o) AS lam FROM hist
    ),
    grid AS (SELECT UNNEST(range({_GOF_CAP} + 1)) AS k),
    ex AS (
      SELECT g.k,
             CASE WHEN g.k < {_GOF_CAP}
                  THEN s.n * exp(-s.lam) * pow(s.lam, g.k) / factorial(CAST(g.k AS INT))
                  ELSE s.n * (1 - list_sum(list_transform(range({_GOF_CAP}),
                         j -> exp(-s.lam) * pow(s.lam, j) / factorial(CAST(j AS INT)))))
             END AS e,
             COALESCE((SELECT CASE WHEN g.k < {_GOF_CAP} THEN
                                (SELECT o FROM hist WHERE hist.k = g.k)
                              ELSE (SELECT SUM(o) FROM hist WHERE hist.k >= {_GOF_CAP})
                         END), 0) AS o
      FROM grid g CROSS JOIN s
    )
    SELECT CAST((SELECT n FROM s) AS BIGINT) AS n_orders,
           ROUND((SELECT lam FROM s), 6) AS lambda_hat,
           CAST(COUNT(*) - 2 AS INT) AS df,
           ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2,
           CAST(SUM((o - e) * (o - e) / e) > 16.92 AS BOOLEAN) AS reject_poisson
    FROM ex
    """,
)
def orders_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson goodness-of-fit for the lines-per-order distribution:
    lambda fitted by the ML estimator (the mean), expected category counts
    N * e^-lambda lambda^k / k! for k = 0..{_GOF_CAP}-1 with the >= {_GOF_CAP}
    tail pooled, Pearson chi-square against the observed histogram on
    k - 2 degrees of freedom (one for the total, one for the fitted
    lambda), rejecting at the 5% critical value 16.92. The fixture's
    order sizes have no 0-line orders, so the fit should REJECT — the
    honest outcome a distribution-fit monitor must be able to produce
    (`events_dispersion_index` screens Var/Mean; this tests the FULL
    shape).

    Plan: per-order counts are one partial-agg shuffle; the count
    histogram is O(distinct sizes) rows; lambda is a 1-row broadcast;
    expected counts come from an 11-row literal grid. exp/pow follow the
    module's libm convention (identical doubles in, each engine's libm),
    with ROUND(4) on the statistic."""
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("k"))
    hist = per.groupBy("k").agg(F.count(F.lit(1)).cast("double").alias("o"))
    s = hist.agg(
        F.sum("o").alias("n"),
        (F.sum(F.col("k") * F.col("o")) / F.sum("o")).alias("lam"),
    )
    grid = spark.range(_GOF_CAP + 1).select(F.col("id").cast("long").alias("k"))
    obs = (
        grid.join(
            hist.select(
                F.when(F.col("k") < _GOF_CAP, F.col("k"))
                .otherwise(F.lit(_GOF_CAP))
                .alias("k"),
                "o",
            )
            .groupBy("k")
            .agg(F.sum("o").alias("o")),
            "k",
            "left",
        )
        .select("k", F.coalesce("o", F.lit(0.0)).alias("o"))
    )
    pmf_sum = None
    for j in range(_GOF_CAP):
        term = F.exp(-F.col("lam")) * F.pow(F.col("lam"), float(j)) / float(
            __import__("math").factorial(j)
        )
        pmf_sum = term if pmf_sum is None else pmf_sum + term
    ex = obs.crossJoin(F.broadcast(s)).select(
        "k",
        "o",
        "n",
        "lam",
        F.when(
            F.col("k") < _GOF_CAP,
            F.col("n")
            * F.exp(-F.col("lam"))
            * F.pow(F.col("lam"), F.col("k").cast("double"))
            / F.factorial(F.col("k").cast("int")),
        )
        .otherwise(F.col("n") * (1 - pmf_sum))
        .alias("e"),
    )
    chi2 = F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    return ex.agg(
        F.first("n").cast("long").alias("n_orders"),
        F.round(F.first("lam"), 6).alias("lambda_hat"),
        (F.count(F.lit(1)) - 2).cast("int").alias("df"),
        F.round(chi2, 4).alias("chi2"),
        (chi2 > 16.92).alias("reject_poisson"),
    )


# ---------------------------------------------------------------------------
# Bhattacharyya / Hellinger distribution overlap (round 10)
# ---------------------------------------------------------------------------
_BH_BINW = 5.0


@register(
    "agg_bhattacharyya",
    oracle=f"""
    WITH per AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS grp,
             CAST(FLOOR(value / {_BH_BINW}) AS BIGINT) AS bucket
      FROM events WHERE event_type IN ('click', 'view')
    ),
    hist AS (
      SELECT grp, bucket, CAST(COUNT(*) AS DOUBLE) AS c FROM per GROUP BY 1, 2
    ),
    sh AS (
      SELECT grp, bucket, c / SUM(c) OVER (PARTITION BY grp) AS p FROM hist
    ),
    bc AS (
      SELECT SUM(sqrt(a.p * b.p)) AS bc
      FROM sh a JOIN sh b ON a.bucket = b.bucket AND a.grp = 1 AND b.grp = 0
    )
    SELECT ROUND(bc, 6) AS bc_coefficient,
           ROUND(-ln(bc), 6) AS bhattacharyya_dist,
           ROUND(sqrt(1 - bc), 6) AS hellinger_dist
    FROM bc
    """,
)
def agg_bhattacharyya(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient / distance and Hellinger distance between
    the click and view value distributions over a {_BH_BINW}-unit
    histogram: BC = sum over shared buckets of sqrt(p_i * q_i) (buckets
    one side lacks contribute 0, so the inner join IS the sum); the two
    derived distances are the standard bounded [0, 1]-ish overlap metrics
    for drift monitoring — `dq_psi` alarms on reweighting, Hellinger is
    a true metric, and `text_js_divergence` covers the token analogue.

    Plan: one (group, bucket) histogram shuffle, per-group share window
    over O(buckets), one O(buckets) self-join, 1-row fold. The same
    mergeable-histogram contraction as the rest of the two-sample
    family."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    per = ev.select(
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("grp"),
        F.floor(F.col("value") / _BH_BINW).cast("long").alias("bucket"),
    )
    hist = per.groupBy("grp", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    sh = hist.select(
        "grp",
        "bucket",
        (F.col("c") / F.sum("c").over(Window.partitionBy("grp"))).alias("p"),
    )
    a = sh.filter(F.col("grp") == 1).select(
        F.col("bucket").alias("bkt"), F.col("p").alias("pa")
    )
    b = sh.filter(F.col("grp") == 0).select(
        F.col("bucket").alias("bkt"), F.col("p").alias("pb")
    )
    bc = a.join(b, "bkt").agg(F.sum(F.sqrt(F.col("pa") * F.col("pb"))).alias("bc"))
    return bc.select(
        F.round("bc", 6).alias("bc_coefficient"),
        F.round(-F.log("bc"), 6).alias("bhattacharyya_dist"),
        F.round(F.sqrt(1 - F.col("bc")), 6).alias("hellinger_dist"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve (round 10)
# ---------------------------------------------------------------------------


@register(
    "agg_lorenz_curve",
    oracle="""
    WITH per AS (
      SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT rev,
             NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM per
    ),
    dec AS (
      SELECT decile, CAST(COUNT(*) AS DOUBLE) AS n, SUM(rev) AS rev
      FROM ranked GROUP BY decile
    ),
    tot AS (SELECT SUM(n) AS tn, SUM(rev) AS trev FROM dec)
    SELECT CAST(decile AS INT) AS decile,
           ROUND(SUM(n) OVER (ORDER BY decile
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / t.tn, 6) AS cum_cust_share,
           ROUND(SUM(rev) OVER (ORDER BY decile
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / t.trev, 6) AS cum_rev_share
    FROM dec CROSS JOIN tot t
    """,
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue concentration: customers sorted by
    revenue into deciles (NTILE with the customer-key tie-break), each
    point = (cumulative customer share, cumulative revenue share). The
    CURVE is what `agg_gini` integrates to a scalar — dashboards plot
    this to show WHERE the concentration lives ("the top decile carries
    X% of revenue"), and `orders_abc` is its 3-bucket business cut.

    Plan: per-customer revenue is one partial-agg shuffle; the decile
    NTILE sorts only the O(customers) revenue table (at 100 TB swap the
    exact NTILE for percentile-cutoff broadcasts, the documented
    `orders_rfm` trade); the curve itself is two cumulative windows over
    10 rows."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = per.select(
        "rev",
        F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile"),
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.sum("rev").alias("rev")
    )
    tot = dec.agg(F.sum("n").alias("tn"), F.sum("rev").alias("trev"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.round(F.sum("n").over(w) / F.col("tn"), 6).alias("cum_cust_share"),
            F.round(F.sum("rev").over(w) / F.col("trev"), 6).alias("cum_rev_share"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise source-vocabulary overlap (round 10)
# ---------------------------------------------------------------------------
_VJ_TOPK = 15  # report the most-overlapping source pairs


@register(
    "text_vocab_overlap_jaccard",
    oracle=f"""
    WITH vocab AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    sizes AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS v FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS DOUBLE) AS i
      FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT i.src_a, i.src_b,
             ROUND(i.i / (sa.v + sb.v - i.i), 6) AS jaccard,
             ROW_NUMBER() OVER (ORDER BY ROUND(i.i / (sa.v + sb.v - i.i), 6) DESC,
                                i.src_a, i.src_b) AS rk
      FROM inter i
      JOIN sizes sa ON sa.source = i.src_a
      JOIN sizes sb ON sb.source = i.src_b
    )
    SELECT src_a, src_b, jaccard, CAST(rk AS INT) AS rk
    FROM scored WHERE rk <= {_VJ_TOPK}
    """,
)
def text_vocab_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (top-{_VJ_TOPK} most
    overlapping pairs): |V_a intersect V_b| / |V_a union V_b| over DISTINCT
    terms — the source-redundancy screen a data-mix design runs before
    weighting (`text_js_divergence` compares token DISTRIBUTIONS of two
    halves; this compares vocabulary SETS across all source pairs, which
    is what predicts whether two crawls contribute distinct content).

    Plan: the corpus contracts to the (source, term) DISTINCT vocabulary
    first — everything pairwise happens on vocab rows, never documents;
    the intersection join is term-keyed (partial-agg both sides), so
    cost is sum over terms of (sources containing the term choose 2) —
    bounded by source count squared per term, the same df-cap shape the
    dedup family documents. Top-k is a WindowGroupLimit cut."""
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("term")).distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("v"))
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    scored = (
        inter.join(
            F.broadcast(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("v", "va")),
            "src_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("v", "vb")),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.round(F.col("i") / (F.col("va") + F.col("vb") - F.col("i")), 6).alias(
                "jaccard"
            ),
        )
    )
    w = Window.orderBy(F.col("jaccard").desc(), "src_a", "src_b")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _VJ_TOPK)
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend estimator (round 11)
# ---------------------------------------------------------------------------


@register(
    "events_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events GROUP BY 1, 2
    ),
    slopes AS (
      SELECT a.event_type, (b.v - a.v) / (b.d - a.d) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
      SELECT event_type, slope,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM slopes
    ),
    med AS (
      SELECT event_type, CAST(MAX(m) AS BIGINT) AS n_pairs,
             AVG(slope) AS ts_slope
      FROM ranked
      WHERE rn = CAST(FLOOR((m + 1) / 2) AS BIGINT)
         OR rn = CAST(FLOOR(m / 2) + 1 AS BIGINT)
      GROUP BY event_type
    ),
    resid AS (
      SELECT daily.event_type, daily.v - med.ts_slope * daily.d AS r
      FROM daily JOIN med USING (event_type)
    ),
    rranked AS (
      SELECT event_type, r,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM resid
    ),
    icpt AS (
      SELECT event_type, AVG(r) AS ts_intercept
      FROM rranked
      WHERE rn = CAST(FLOOR((m + 1) / 2) AS BIGINT)
         OR rn = CAST(FLOOR(m / 2) + 1 AS BIGINT)
      GROUP BY event_type
    )
    SELECT med.event_type, med.n_pairs,
           ROUND(med.ts_slope, 6) AS ts_slope,
           ROUND(icpt.ts_intercept, 6) AS ts_intercept
    FROM med JOIN icpt USING (event_type)
    """,
)
def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per event-type daily series: the
    slope is the MEDIAN of all pairwise slopes (v_j - v_i)/(d_j - d_i),
    the intercept the median residual v - slope*d (Theil 1950, Sen 1968)
    — the standard outlier-immune alternative to OLS trend (29.3%
    breakdown point) used on noisy operational metrics where one
    incident day would drag a least-squares fit. Complements
    `events_mann_kendall` (the significance test of the same monotone-
    trend family) with the actual magnitude estimate.

    Both medians are computed as EXPLICIT order statistics (rank the
    values, average the one or two middle rows) so Spark and DuckDB fold
    identical doubles — engine median()/percentile interpolation paths
    differ in last-ulp arithmetic and would flap a 6dp hash.

    Plan: events collapse to the shared O(types x days) daily frame
    first (the only stage that sees event volume, map-side partial agg);
    the pairwise self-join is O(types x days^2) on that tiny frame — at
    100 TB of events the day count, not the event count, bounds the
    quadratic term, which is the same contraction every Theil-Sen
    implementation at scale uses (or swaps for repeated-median sampling
    past ~10^4 points)."""
    daily = daily_value_series(spark, sf_dir, "sum")
    a, b = daily.alias("a"), daily.alias("b")
    # broadcast the probe side: the daily frame is O(types x days) and the
    # equi key (event_type) alone has 5 values, so Catalyst would pick a
    # sort-merge join on a ~150-row frame
    slopes = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.v") - F.col("a.v")) / (F.col("b.d") - F.col("a.d"))).alias(
            "slope"
        ),
    )

    def _median_rows(df: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col)
        wm = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wm).alias("m"),
        )
        return ranked.filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("m") / 2) + 1)
        )

    med = _median_rows(slopes, "slope").groupBy("event_type").agg(
        F.max("m").cast("long").alias("n_pairs"),
        F.avg("slope").alias("ts_slope"),
    )
    resid = daily.join(F.broadcast(med), "event_type").select(
        "event_type",
        (F.col("v") - F.col("ts_slope") * F.col("d")).alias("r"),
    )
    icpt = (
        _median_rows(resid, "r")
        .groupBy("event_type")
        .agg(F.avg("r").alias("ts_intercept"))
    )
    return med.join(F.broadcast(icpt), "event_type").select(
        "event_type",
        "n_pairs",
        F.round("ts_slope", 6).alias("ts_slope"),
        F.round("ts_intercept", 6).alias("ts_intercept"),
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator (round 11)
# ---------------------------------------------------------------------------
_HILL_K = 500  # tail order statistics used


@register(
    "orders_hill_tail",
    oracle=f"""
    WITH top AS (
      SELECT o_totalprice AS x FROM orders
      ORDER BY o_totalprice DESC LIMIT {_HILL_K + 1}
    ),
    m AS (SELECT MIN(x) AS xk FROM top)
    SELECT CAST({_HILL_K} AS BIGINT) AS k,
           ROUND(m.xk, 2) AS x_kplus1,
           ROUND(SUM(ln(t.x / m.xk)), 6) AS sum_log_excess,
           ROUND({_HILL_K} / SUM(ln(t.x / m.xk)), 6) AS hill_alpha
    FROM top t CROSS JOIN m
    GROUP BY m.xk
    """,
)
def orders_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over the top-{_HILL_K}
    order values: alpha_hat = k / sum_i ln(x_i / x_(k+1)) (Hill 1975) —
    the standard heavy-tail diagnostic behind "is revenue / latency /
    degree power-law, and how heavy": alpha <= 2 means infinite
    variance, alpha <= 1 infinite mean, so capacity planning and
    whale-customer risk both key off this number. Complements
    `graph_degree_powerlaw` (a fit over binned degree counts) with the
    order-statistics MLE on raw values. The summand for the x_(k+1) row
    itself is ln(1) = 0, so summing over all k+1 retained rows equals
    the k-term Hill sum — no boundary-row exclusion logic, and ties at
    the boundary cannot perturb the result (the multiset of top-(k+1)
    VALUES is unique even when row identities tie).

    Plan: the only distributed work is a top-(k+1) selection, which
    Spark serves as TakeOrdered (per-partition heap + driver merge of
    k+1-row spines — NO global sort shuffle); the estimator itself folds
    k+1 rows. At 100 TB this is the cheapest possible shape for any
    order-statistics tail estimator."""
    o = load(spark, sf_dir, "orders")
    top = o.select(F.col("o_totalprice").alias("x")).orderBy(
        F.col("x").desc()
    ).limit(_HILL_K + 1)
    m = top.agg(F.min("x").alias("xk"))
    return (
        top.crossJoin(F.broadcast(m))
        .groupBy("xk")
        .agg(
            F.lit(_HILL_K).cast("long").alias("k"),
            F.round(F.sum(F.log(F.col("x") / F.col("xk"))), 6).alias(
                "sum_log_excess"
            ),
            F.round(
                F.lit(float(_HILL_K)) / F.sum(F.log(F.col("x") / F.col("xk"))), 6
            ).alias("hill_alpha"),
        )
        .select(
            "k",
            F.round("xk", 2).alias("x_kplus1"),
            "sum_log_excess",
            "hill_alpha",
        )
    )


# ---------------------------------------------------------------------------
# Lomb-Scargle periodogram on unevenly sampled points (round 11)
# ---------------------------------------------------------------------------
_LS_PERIODS = (2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0, 12.0, 14.0)  # days
_LS_TYPE = "purchase"


@register(
    "lightcurve_lomb_scargle",
    oracle=f"""
    WITH pts AS (
      SELECT (epoch_us(CAST(ts AS TIMESTAMP))
              - epoch_us(TIMESTAMP '2024-01-01 00:00:00')) / 86400000000.0
               AS t,
             value AS y
      FROM events WHERE event_type = '{_LS_TYPE}'
    ),
    st AS (
      SELECT AVG(y) AS mu,
             (SUM(y * y) - SUM(y) * SUM(y) / COUNT(*)) / (COUNT(*) - 1) AS var,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM pts
    ),
    grid AS (SELECT CAST(unnest(ARRAY{list(_LS_PERIODS)}) AS DOUBLE) AS period),
    tau AS (
      SELECT g.period,
             g.period / (4 * pi())
             * atan2(SUM(sin(4 * pi() * p.t / g.period)),
                     SUM(cos(4 * pi() * p.t / g.period))) AS tau
      FROM pts p CROSS JOIN grid g GROUP BY g.period
    ),
    comp AS (
      SELECT tau.period, st.n,
             SUM((p.y - st.mu) * cos(2 * pi() * (p.t - tau.tau) / tau.period))
               AS cs,
             SUM((p.y - st.mu) * sin(2 * pi() * (p.t - tau.tau) / tau.period))
               AS ss,
             SUM(cos(2 * pi() * (p.t - tau.tau) / tau.period)
                 * cos(2 * pi() * (p.t - tau.tau) / tau.period)) AS cc,
             SUM(sin(2 * pi() * (p.t - tau.tau) / tau.period)
                 * sin(2 * pi() * (p.t - tau.tau) / tau.period)) AS s2,
             MAX(st.var) AS var
      FROM pts p CROSS JOIN tau CROSS JOIN st
      GROUP BY tau.period, st.n
    )
    SELECT period, CAST(n AS BIGINT) AS n,
           FLOOR((cs * cs / cc + ss * ss / s2) / (2 * var) * 10000) / 10000
             AS ls_power
    FROM comp
    """,
)
def lightcurve_lomb_scargle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lomb-Scargle periodogram (Lomb 1976, Scargle 1982) of the
    '{_LS_TYPE}' value series at the RAW, unevenly spaced event
    timestamps — the astronomy-standard period search when sampling is
    irregular (`events_periodogram` is the classic DFT and REQUIRES the
    regular daily grid; LS handles arbitrary t_i by solving the
    per-frequency least-squares phase tau = P/(4pi) * atan2(sum sin
    4pi*t/P, sum cos 4pi*t/P), which makes the periodogram invariant to
    time-origin shifts). Normalized power (cs^2/cc + ss^2/ss) / (2 s^2)
    per trial period; the fixture's arrivals carry no periodic value
    signal, so powers stay at the noise floor (~O(1)) — the true-null
    convention.

    Cross-engine determinism: t is DAYS SINCE THE PINNED 2024-01-01
    epoch (t in [0, ~30] — trig arguments stay small, so last-ulp libm
    divergence cannot be amplified by huge phases), mu/var come from
    explicit moment sums, and the power is FLOOR-rounded at 1e-4 (the
    events_periodogram convention for trig-sum outputs).

    Plan: two passes over the filtered points (tau needs the first
    pass's per-period sums — a {len(_LS_PERIODS)}-row broadcast joins
    back for the second), each pass a grid-crossJoin into a map-side
    partial aggregate keyed by period: the shuffle carries
    O(grid) rows per task, never the points. Linear in points x grid —
    the same cost every production LS implementation pays before FFT
    tricks (Press & Rybicki) kick in at much larger grids."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == _LS_TYPE)
    epoch0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    pts = ev.select(
        (
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(epoch0))
            / 86400000000.0
        ).alias("t"),
        F.col("value").alias("y"),
    )
    st = pts.agg(
        F.avg("y").alias("mu"),
        (
            (F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y") / F.count(F.lit(1)))
            / (F.count(F.lit(1)) - 1)
        ).alias("var"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    # CAST the literal grid to DOUBLE: a bare VALUES (2.0) types the column
    # DECIMAL(2,1) on both engines, which the no-DecimalType-in-finals
    # contract (test_contract.py) rejects — the r10 pandas-hash bug class
    grid = spark.sql(
        "SELECT CAST(col1 AS DOUBLE) AS period FROM (VALUES "
        + ", ".join(f"({p})" for p in _LS_PERIODS)
        + ")"
    )
    two_pi = 2.0 * math.pi
    tau = (
        pts.crossJoin(F.broadcast(grid))
        .groupBy("period")
        .agg(
            (
                F.col("period")
                / (2 * two_pi)
                * F.atan2(
                    F.sum(F.sin(2 * two_pi * F.col("t") / F.col("period"))),
                    F.sum(F.cos(2 * two_pi * F.col("t") / F.col("period"))),
                )
            ).alias("tau")
        )
        .select("period", "tau")
    )
    ph = two_pi * (F.col("t") - F.col("tau")) / F.col("period")
    comp = (
        pts.crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(st))
        .groupBy("period", "n")
        .agg(
            F.sum((F.col("y") - F.col("mu")) * F.cos(ph)).alias("cs"),
            F.sum((F.col("y") - F.col("mu")) * F.sin(ph)).alias("ss"),
            F.sum(F.cos(ph) * F.cos(ph)).alias("cc"),
            F.sum(F.sin(ph) * F.sin(ph)).alias("s2"),
            F.max("var").alias("var"),
        )
    )
    power = (
        F.col("cs") * F.col("cs") / F.col("cc")
        + F.col("ss") * F.col("ss") / F.col("s2")
    ) / (2 * F.col("var"))
    return comp.select(
        "period",
        F.col("n").cast("long").alias("n"),
        (F.floor(power * 10000) / 10000).alias("ls_power"),
    )


# ---------------------------------------------------------------------------
# Negative-binomial moment fit for overdispersed counts (round 11)
# ---------------------------------------------------------------------------


@register(
    "events_negbin_fit",
    oracle="""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS DOUBLE) AS c
      FROM events GROUP BY 1, 2
    ),
    full_grid AS (
      SELECT t.event_type, u.user_id, COALESCE(c.c, 0) AS c
      FROM users u CROSS JOIN types t
      LEFT JOIN cnt c ON c.user_id = u.user_id AND c.event_type = t.event_type
    ),
    mo AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             AVG(c) AS mu,
             (SUM(c * c) - SUM(c) * SUM(c) / COUNT(*)) / (COUNT(*) - 1) AS v
      FROM full_grid GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_users,
           ROUND(mu, 6) AS mean_count,
           ROUND(v, 6) AS var_count,
           ROUND(v / mu, 6) AS fano,
           CASE WHEN v > mu THEN ROUND(mu * mu / (v - mu), 6) END AS nb_r,
           CASE WHEN v > mu THEN ROUND(mu / v, 6) END AS nb_p
    FROM mo
    """,
)
def events_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial moment fit for per-user event counts by type:
    with mean mu and variance v over the FULL user grid (absent users
    count 0 — arrival models must see the zeros), the method-of-moments
    NB parameters are r = mu^2/(v - mu) and p = mu/v, defined only under
    overdispersion (v > mu; NULL otherwise — a Poisson or underdispersed
    series has no NB fit). The standard next step after
    `orders_poisson_gof` rejects (or `events_dispersion_index` flags
    Fano > 1): user activity is almost never Poisson (heterogeneous
    rates gamma-mix into NB), and the fitted r drives engagement
    segmentation and burstiness-aware capacity planning.

    Plan: events partial-aggregate to O(users x types) counts, the zero
    grid is a broadcast cross of two distinct-key frames, and the
    moment rollup is explicit centered sums (identical algebra both
    engines; per-user counts are small so no cancellation at 6dp)."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(cnt, ["user_id", "event_type"], "left")
        .select(
            "event_type", F.coalesce(F.col("c"), F.lit(0.0)).alias("c")
        )
    )
    n = F.count(F.lit(1)).cast("double")
    v = (F.sum(F.col("c") * F.col("c")) - F.sum("c") * F.sum("c") / n) / (n - 1)
    mo = grid.groupBy("event_type").agg(
        n.alias("n"), F.avg("c").alias("mu"), v.alias("v")
    )
    over = F.col("v") > F.col("mu")
    return mo.select(
        "event_type",
        F.col("n").cast("long").alias("n_users"),
        F.round("mu", 6).alias("mean_count"),
        F.round("v", 6).alias("var_count"),
        F.round(F.col("v") / F.col("mu"), 6).alias("fano"),
        F.when(over, F.round(F.col("mu") * F.col("mu") / (F.col("v") - F.col("mu")), 6)).alias("nb_r"),
        F.when(over, F.round(F.col("mu") / F.col("v"), 6)).alias("nb_p"),
    )


# ---------------------------------------------------------------------------
# Batch gap-based sessionization (round 11)
# ---------------------------------------------------------------------------
_SESS_GAP_S = 1800  # 30-minute inactivity gap


@register(
    "events_session_stats",
    oracle=f"""
    WITH ts_rows AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS t
      FROM events
    ),
    flagged AS (
      SELECT user_id, t,
             CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                       > {_SESS_GAP_S}
                    OR LAG(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM ts_rows
    ),
    sess AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, sid, CAST(COUNT(*) AS DOUBLE) AS n_ev,
             CAST(MAX(t) - MIN(t) AS DOUBLE) AS dur
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           ROUND(AVG(n_ev), 6) AS avg_events_per_session,
           ROUND(AVG(dur), 6) AS avg_session_secs,
           CAST(MAX(dur) AS BIGINT) AS max_session_secs
    FROM per_sess GROUP BY user_id
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization — the canonical web-analytics
    transform: a user's events split into sessions at every
    >{_SESS_GAP_S}-second inactivity gap (lag + cumulative-flag-sum,
    the gaps-and-islands pattern on raw epoch seconds), then per-user
    session statistics (count, events/session, mean/max duration).
    The BATCH twin of `stream_live_session` (Structured Streaming's
    session_window): identical session semantics, so a lambda-style
    backfill of the streaming metric reconciles exactly; `events_paths`
    consumes a same-shaped sessionization for journey mining.

    Plan: two per-user window passes (lag flag, running sum) on integer
    epoch seconds — exchanges once on user_id and reuses that
    partitioning for both windows, the per-session groupBy, AND the
    final per-user rollup (four stages, ONE shuffle). Ties in t within
    a user collapse into the same session regardless of intra-tie
    order, so the output is deterministic without a tiebreak column."""
    ev = load(spark, sf_dir, "events")
    t = (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    rows = ev.select("user_id", t.alias("t"))
    wl = Window.partitionBy("user_id").orderBy("t")
    lag = F.lag("t").over(wl)
    flagged = rows.select(
        "user_id",
        "t",
        F.when(lag.isNull() | ((F.col("t") - lag) > _SESS_GAP_S), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.select(
        "user_id", "t", F.sum("new_s").over(wc).alias("sid")
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).cast("double").alias("n_ev"),
        (F.max("t") - F.min("t")).cast("double").alias("dur"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_ev").cast("long").alias("n_events"),
        F.round(F.avg("n_ev"), 6).alias("avg_events_per_session"),
        F.round(F.avg("dur"), 6).alias("avg_session_secs"),
        F.max("dur").cast("long").alias("max_session_secs"),
    )


# ---------------------------------------------------------------------------
# Block-averaged cross-spectral coherence (round 11 tail)
# ---------------------------------------------------------------------------
_COH_BLOCK = 10          # days per Welch block (the events fixture spans 30 days -> 3 blocks at every SF)
_COH_FREQS = (1, 2, 3, 4)  # cycles per block
_COH_PI = 3.141592653589793


@register(
    "events_coherence",
    oracle=f"""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
             SUM(value) AS v
      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2
    ),
    xy AS (
      SELECT a.d, a.v AS x, b.v AS y,
             CAST(FLOOR(a.d / {_COH_BLOCK}) AS BIGINT) AS blk,
             a.d % {_COH_BLOCK} AS t
      FROM (SELECT d, v FROM daily WHERE event_type = 'click') a
      JOIN (SELECT d, v FROM daily WHERE event_type = 'view') b USING (d)
    ),
    demeaned AS (
      SELECT blk, t, x - AVG(x) OVER (PARTITION BY blk) AS x,
             y - AVG(y) OVER (PARTITION BY blk) AS y
      FROM xy
    ),
    terms AS (
      SELECT blk, k,
             SUM(x * COS(2 * {_COH_PI} * k * t / {_COH_BLOCK})) AS xc,
             SUM(x * SIN(2 * {_COH_PI} * k * t / {_COH_BLOCK})) AS xs,
             SUM(y * COS(2 * {_COH_PI} * k * t / {_COH_BLOCK})) AS yc,
             SUM(y * SIN(2 * {_COH_PI} * k * t / {_COH_BLOCK})) AS ys
      FROM demeaned,
           (SELECT UNNEST([{", ".join(str(k) for k in _COH_FREQS)}]) AS k)
      GROUP BY 1, 2
    )
    SELECT k AS cycles_per_block,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           ROUND((SUM(xc * yc + xs * ys) * SUM(xc * yc + xs * ys)
                  + SUM(xs * yc - xc * ys) * SUM(xs * yc - xc * ys))
                 / (SUM(xc * xc + xs * xs) * SUM(yc * yc + ys * ys)), 6)
             AS coherence2,
           ROUND(ATAN2(SUM(xs * yc - xc * ys), SUM(xc * yc + xs * ys)), 4)
             AS phase
    FROM terms GROUP BY k ORDER BY k
    """,
)
def events_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-averaged (Welch) magnitude-squared coherence between the
    click and view daily series at {_COH_FREQS} cycles per
    {_COH_BLOCK}-day block: |S_xy|^2 / (S_xx S_yy) with the cross- and
    auto-spectra averaged over blocks — WITHOUT block averaging the
    single-taper coherence is identically 1, which is the classic
    rookie mistake this operator's construction bakes out. The
    FREQUENCY-DOMAIN member of the dependence family (events_cross_
    correlation answers "at what lag", events_granger "does x forecast
    y"; coherence answers "at which timescale are they coupled"),
    plus the cross-phase at each frequency. Missing days drop from both
    series identically (inner day join), so both engines sum the same
    terms.

    Plan: the daily groupBy is the only event-volume stage; one
    self-join on day, an O(days) per-block demeaning window, a 4-way
    frequency explode to O(days x freqs) rows, and two bounded rollups.
    The trig arguments are exact rationals times a baked pi literal —
    identical text both engines; ROUND absorbs libm ulp."""
    daily = daily_value_series(spark, sf_dir, agg="sum")
    x = daily.filter(F.col("event_type") == "click").select(
        "d", F.col("v").alias("x")
    )
    y = daily.filter(F.col("event_type") == "view").select(
        "d", F.col("v").alias("y")
    )
    xy = x.join(y, "d").select(
        (F.floor(F.col("d") / _COH_BLOCK)).cast("long").alias("blk"),
        (F.col("d") % _COH_BLOCK).alias("t"),
        "x",
        "y",
    )
    wb = Window.partitionBy("blk")
    dm = xy.select(
        "blk",
        "t",
        (F.col("x") - F.avg("x").over(wb)).alias("x"),
        (F.col("y") - F.avg("y").over(wb)).alias("y"),
    )
    freqs = F.explode(F.array(*[F.lit(k) for k in _COH_FREQS])).alias("k")
    ang = 2 * _COH_PI * F.col("k") * F.col("t") / _COH_BLOCK
    terms = (
        dm.select("blk", "t", "x", "y", freqs)
        .groupBy("blk", "k")
        .agg(
            F.sum(F.col("x") * F.cos(ang)).alias("xc"),
            F.sum(F.col("x") * F.sin(ang)).alias("xs"),
            F.sum(F.col("y") * F.cos(ang)).alias("yc"),
            F.sum(F.col("y") * F.sin(ang)).alias("ys"),
        )
    )
    rxy = F.sum(F.col("xc") * F.col("yc") + F.col("xs") * F.col("ys"))
    ixy = F.sum(F.col("xs") * F.col("yc") - F.col("xc") * F.col("ys"))
    sxx = F.sum(F.col("xc") * F.col("xc") + F.col("xs") * F.col("xs"))
    syy = F.sum(F.col("yc") * F.col("yc") + F.col("ys") * F.col("ys"))
    return (
        terms.groupBy(F.col("k").alias("cycles_per_block"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.round((rxy * rxy + ixy * ixy) / (sxx * syy), 6).alias("coherence2"),
            F.round(F.atan2(ixy, rxy), 4).alias("phase"),
        )
        .orderBy("cycles_per_block")
    )
