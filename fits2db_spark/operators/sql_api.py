"""Raw-SQL API surface (round 5): the same engine through ``spark.sql``.

The reference is a SQL-facing tool — its users write SQL, not DataFrame
chains. These queries register the fixture tables as temp views and run
TEXTUAL ANSI SQL through ``spark.sql(...)``, proving the full surface
(views, joins, aggregates, windows, date arithmetic) works for a SQL-only
user and lands on the identical Catalyst plans the DataFrame API produces
(same optimizer, same physical operators — the API is syntax, not a
different engine). The oracle strings are near-verbatim the submitted SQL,
which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..tables import load


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as session temp views (idempotent; suffixed
    by nothing — the driver uses one session per run, and re-registering
    simply replaces the identical view)."""
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "sql_tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) submitted as raw SQL text —
    the filter-heavy scan+agg archetype. All four predicates reach the
    parquet scan as PushedFilters exactly as in the DataFrame variant;
    the aggregate is algebraic. One plan, zero shuffled rows beyond the
    1-row partial sums."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "sql_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority: top unshipped orders by potential
    revenue) as raw SQL — the join-then-rank archetype. Catalyst plans
    customer as a broadcast dimension, the orders-lineitem join as the one
    real shuffle, and the ORDER BY+LIMIT as TakeOrderedAndProject (no
    global sort) — identical physical shapes to the DataFrame-built
    join_star_q5. Deterministic tie-break on l_orderkey."""
    _view(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
          AND l.l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """
    )


@register(
    "sql_window_ranking",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice,
           CAST(rk AS BIGINT) AS rk,
           ROUND(cum_spend, 2) AS cum_spend
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk,
             SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS cum_spend
      FROM orders)
    WHERE rk <= 3
    """,
)
def sql_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions through raw SQL: each customer's top-3 orders by
    price with the running spend — ROW_NUMBER + framed SUM sharing one
    (partition, sort) pass, planned with WindowGroupLimit exactly like
    the DataFrame win_topk_per_group."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               o_orderkey,
               ROUND(o_totalprice, 2) AS o_totalprice,
               CAST(rk AS BIGINT) AS rk,
               ROUND(cum_spend, 2) AS cum_spend
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk,
                 SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_totalprice DESC, o_orderkey
                                         ROWS UNBOUNDED PRECEDING) AS cum_spend
          FROM orders)
        WHERE rk <= 3
        """
    )


@register(
    "sql_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) as raw SQL text — the canonical
    wide-aggregate scan: 8 algebraic aggregates over 2 grouping columns.
    Map-side partial aggregation collapses everything to O(flag x status)
    states before the single shuffle; the date predicate reaches the scan.
    The one plan difference from a hand-built DataFrame chain: none —
    identical Catalyst output (same partial/final HashAggregate pair)."""
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                 AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM orders
    WHERE o_totalprice >= 100000 AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the injection-safe API every SQL-facing service
    needs: the query text carries named parameter markers (:min_price,
    :since) and the VALUES arrive separately through ``spark.sql(...,
    args=...)``, so user input is bound as typed literals, never spliced
    into the text. Catalyst constant-folds the bound values exactly like
    inline literals — the plan (including PushedFilters from both
    predicates) is identical to the literal query the oracle runs."""
    import datetime

    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderdate >= :since
        GROUP BY o_orderpriority
        """,
        # datetime binds a true TIMESTAMP literal (a string would lean on
        # implicit string->timestamp coercion, which strict ANSI modes drop)
        args={"min_price": 100000, "since": datetime.datetime(1997, 1, 1)},
    )


@register(
    "sql_tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers) as raw SQL text — the
    IN-subquery-with-HAVING archetype: find orders whose total quantity
    exceeds 300, then report their customers ranked by order value.
    Catalyst rewrites the IN subquery to a left-semi join whose build
    side is the grouped-and-filtered aggregate (itself partial-agg'd
    map-side), so the fact table is filtered BEFORE the 3-way join — the
    decorrelation the reference's users get for free from a planner.
    Deterministic LIMIT via the (price, date, orderkey) total order."""
    _view(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               o.o_orderdate,
               ROUND(o.o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 300
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
        LIMIT 100
        """
    )


@register(
    "sql_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name, x.o_orderkey,
           ROUND(x.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) x
    WHERE c.c_custkey < 30
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join through raw SQL: each customer's top-2
    orders via a per-row ordered-LIMIT subquery — the SQL-standard
    spelling of top-k-per-group that the engine's users write directly
    (and the construct every as-of/nearest oracle in this repo leans on).
    Catalyst decorrelates it into a ranked window over the joined
    relation — the same WindowGroupLimit shape as win_topk_per_group —
    rather than executing one subquery per outer row."""
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, x.o_orderkey,
               ROUND(x.o_totalprice, 2) AS o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) x
        WHERE c.c_custkey < 30
        """
    )
