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


# ---------------------------------------------------------------------------
# Round 6: the remaining classic TPC-H archetypes, adapted where the fixture
# schema lacks a column (no l_commitdate/l_receiptdate/l_shipmode/partsupp/
# c_phone — each adaptation keeps the query's SHAPE, which is what exercises
# the planner; the docstrings note the substitution).
# ---------------------------------------------------------------------------


@register(
    "sql_tpch_q4",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM read_parquet_orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """.replace("read_parquet_orders", "orders"),
)
def sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking) — the correlated-EXISTS
    archetype. Fixture adaptation: the standard late-delivery predicate
    (l_commitdate < l_receiptdate; neither column exists here) becomes
    'shipped more than 90 days after ordering'. Catalyst rewrites the
    EXISTS into a left-semi join on l_orderkey with the correlated date
    predicate evaluated in-join, so lineitem is semi-filtered in one pass
    — no per-order subquery execution."""
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "sql_tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations, by year) — the
    bidirectional nation-pair archetype with the nation dimension joined
    TWICE under different roles. Both nation joins and the supplier and
    customer joins broadcast; the only data-sized shuffles are the
    lineitem-orders join and the final small-group aggregate. The
    nation-pair disjunction lands on the two broadcast outputs, so the
    fact rows for every other pair are dropped before the aggregate."""
    _view(spark, sf_dir, "lineitem", "supplier", "orders", "customer", "nation")
    return spark.sql(
        """
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l.l_shipdate) AS l_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                 AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """
    )


@register(
    "sql_tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'STANDARD'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share) — the share-of-aggregate
    archetype: NATION_3 suppliers' fraction of STANDARD-part revenue sold
    into ASIA, by order year. Seven-table join where everything except
    lineitem-orders broadcasts; the share is a conditional-sum /
    total-sum pair computed in ONE aggregate pass (no second scan, no
    self-join) — the planner-friendly spelling of ratio-of-sums."""
    _view(
        spark, sf_dir,
        "lineitem", "part", "supplier", "orders", "customer", "nation", "region",
    )
    return spark.sql(
        """
        SELECT o_year,
               ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                     / SUM(volume), 6) AS mkt_share
        FROM (
          SELECT year(o.o_orderdate) AS o_year,
                 l.l_extendedprice * (1 - l.l_discount) AS volume,
                 n2.n_name AS nation
          FROM lineitem l
          JOIN part p     ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
          JOIN region r   ON r.r_regionkey = n1.n_regionkey
          JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
          WHERE r.r_name = 'ASIA'
            AND p.p_type = 'STANDARD'
            AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
        """
    )


@register(
    "sql_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter. The returnflag and date predicates
    both push to the scans before the joins; ORDER BY + LIMIT plans as
    TakeOrderedAndProject with the c_custkey tie-break making the top-20
    deterministic."""
    _view(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
        """
    )


@register(
    "sql_tpch_q12",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 120
                THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority) — the
    conditional-count archetype. Fixture adaptation: l_shipmode does not
    exist, so the grouping key is a derived SLOW/FAST ship-speed bucket
    (>120 days from order to ship), preserving the CASE-inside-SUM
    pivot-style aggregation over a fact join."""
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT CASE WHEN datediff(l.l_shipdate, o.o_orderdate) > 120
                    THEN 'SLOW' ELSE 'FAST' END AS ship_speed,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1 ORDER BY 1
        """
    )


@register(
    "sql_tpch_q13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution) — the
    histogram-of-groupBy archetype: LEFT join keeps zero-order customers
    (their c_count is 0 via COUNT of a NULL column), then a second tiny
    aggregate histograms the counts. The join predicate's extra filter
    (excluding 5-LOW priority) must stay IN the join condition, not the
    WHERE clause — moving it would turn the left join inner and drop the
    zero bucket. Fixture adaptation of the o_comment NOT LIKE filter."""
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """
    )


@register(
    "sql_tpch_q14",
    oracle="""
    SELECT ROUND(CAST(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE), 6)
             AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    PROMO-type parts — ratio-of-conditional-sums in a single aggregate
    over a broadcast part join. The fixture's p_type is the plain value
    'PROMO' rather than a 'PROMO%' prefix family."""
    _view(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                                THEN l.l_extendedprice * (1 - l.l_discount)
                                ELSE 0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)), 6)
                 AS promo_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
          AND l.l_shipdate <  TIMESTAMP '1996-10-01'
        """
    )


@register(
    "sql_tpch_q17",
    oracle="""
    SELECT ROUND(CAST(SUM(l.l_extendedprice) / 7.0 AS DOUBLE), 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND p.p_size < 15
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue) — the correlated scalar
    AVG subquery archetype. Catalyst decorrelates the per-part average
    into ONE grouped aggregate over lineitem joined back on l_partkey —
    the fact table is scanned twice but never per-row. Fixture
    adaptation: p_container does not exist; the part slice filters on
    p_brand + p_size instead."""
    _view(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13' AND p.p_size < 15
          AND l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@register(
    "sql_tpch_q19",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue) — the OR-of-AND-blocks archetype
    that stresses predicate handling: three disjoint brand/size/quantity
    windows summed in one pass. Catalyst pushes the common join key
    through, evaluates the disjunction post-join, and still prunes
    lineitem columns to the four referenced. Fixture adaptation: the
    container/shipmode legs become size windows."""
    _view(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity >= 1 AND l.l_quantity <= 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity >= 10 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity >= 20 AND l.l_quantity <= 30)
        """
    )


@register(
    "sql_tpch_q22",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2
        WHERE c2.c_acctbal > 0.0
          AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity) — the NOT-EXISTS +
    uncorrelated-scalar-subquery archetype: wealthy customers in selected
    nations with no order since 1999 (every fixture customer has SOME
    order, so 'lapsed since 1999' keeps the anti-join non-vacuous). The scalar average computes once and
    broadcasts as a literal; the NOT EXISTS becomes a left-anti join
    against orders. Fixture adaptation: no c_phone column, so the
    country-code substring membership becomes c_nationkey membership."""
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          AND c.c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2
            WHERE c2.c_acctbal > 0.0
              AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


# ---------------------------------------------------------------------------
# Round 6b: the remaining eight TPC-H archetypes — completes all 22 query
# shapes through the raw-SQL surface. The fixture has no partsupp table, so
# Q2/Q9/Q11/Q20's supply-cost/availability relation is emulated from
# lineitem (cost = min unit price observed for the (supplier, part) pair;
# availability = shipped volume) — the planner-facing structure (correlated
# MIN, nested IN, HAVING-over-scalar, multi-EXISTS) is preserved exactly.
# ---------------------------------------------------------------------------


@register(
    "sql_tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_suppkey AS suppkey, l_partkey AS partkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_name, n.n_name, p.p_partkey, p.p_brand,
           ROUND(ps.supplycost, 4) AS supplycost,
           ROUND(s.s_acctbal, 2) AS s_acctbal
    FROM part p
    JOIN cost ps    ON ps.partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 20 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND ps.supplycost = (
        SELECT MIN(c2.supplycost)
        FROM cost c2
        JOIN supplier s2 ON s2.s_suppkey = c2.suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE c2.partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) — the correlated-MIN-subquery
    archetype: for each qualifying part, the European supplier(s) whose
    emulated supply cost (min observed unit price for the pair) equals
    the part's regional minimum. Catalyst decorrelates the MIN into a
    per-part aggregate joined back; the cost comparison is between
    MIN-aggregates of identical doubles, so exact equality is
    engine-stable."""
    _view(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(
        """
        WITH cost AS (
          SELECT l_suppkey AS suppkey, l_partkey AS partkey,
                 MIN(l_extendedprice / l_quantity) AS supplycost
          FROM lineitem GROUP BY 1, 2
        )
        SELECT s.s_name, n.n_name, p.p_partkey, p.p_brand,
               ROUND(ps.supplycost, 4) AS supplycost,
               ROUND(s.s_acctbal, 2) AS s_acctbal
        FROM part p
        JOIN cost ps    ON ps.partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = ps.suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size <= 20 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
          AND ps.supplycost = (
            SELECT MIN(c2.supplycost)
            FROM cost c2
            JOIN supplier s2 ON s2.s_suppkey = c2.suppkey
            JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
            JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
            WHERE c2.partkey = p.p_partkey AND r2.r_name = 'EUROPE'
          )
        ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 100
        """
    )


@register(
    "sql_tpch_q5",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper (local-supplier volume), as raw SQL — unlike the
    DataFrame `join_star_q5`, this carries the LOCAL-supplier equi-
    condition (customer and supplier share a nation) inside the supplier
    join, which is what makes Q5 a 6-table snowflake rather than a plain
    star. n_name tie-break keeps the ORDER deterministic."""
    _view(
        spark, sf_dir,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )
    return spark.sql(
        """
        SELECT n.n_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
        """
    )


@register(
    "sql_tpch_q9",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) / 100 AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             year(o.o_orderdate) AS o_year,
             CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)
                   - 0.6e0 * p.p_retailprice * l.l_quantity) * 100) AS BIGINT)
               AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%rod%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit by nation and year). The supply-cost
    term is emulated as 0.6 x retail price per unit (no partsupp table);
    the shape — a 5-table join with a LIKE part filter feeding a
    two-level grouped profit rollup — is intact, and the LIKE predicate
    still prunes part before the join. Per-row amounts are floored to
    integer cents BEFORE the sum and the group total is exact BIGINT
    arithmetic: raw double sums measurably straddled a half-cent ROUND
    boundary across engines (...306.69 vs ...306.70), and even per-row
    ROUND diverges at ties because the engines' rounding paths differ —
    FLOOR on identical doubles is the operation both engines compute
    identically."""
    _view(spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation")
    return spark.sql(
        """
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) / 100 AS sum_profit
        FROM (
          SELECT n.n_name AS nation,
                 year(o.o_orderdate) AS o_year,
                 CAST(FLOOR((l.l_extendedprice * (1 - l.l_discount)
                       - 0.6 * p.p_retailprice * l.l_quantity) * 100) AS BIGINT)
                   AS amount
          FROM lineitem l
          JOIN part p     ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN nation n   ON n.n_nationkey = s.s_nationkey
          WHERE p.p_name LIKE '%rod%'
        ) profit
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
        """
    )


@register(
    "sql_tpch_q11",
    oracle="""
    WITH inv AS (
      SELECT l.l_partkey AS partkey,
             SUM(l.l_quantity * p.p_retailprice) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE s.s_nationkey IN (5, 6)
      GROUP BY 1
    )
    SELECT partkey, ROUND(value, 2) AS value
    FROM inv
    WHERE value > (SELECT 2.0 * AVG(value) FROM inv)
    ORDER BY value DESC, partkey
    """,
)
def sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) — the
    HAVING-above-scalar-aggregate archetype: per-part inventory value for
    two nations' suppliers, kept only where it exceeds 2x the mean
    per-part value. The scalar subquery re-aggregates the SAME CTE, which
    both planners evaluate once and broadcast; value is emulated as
    shipped quantity x retail price (no partsupp).

    r7: the spec's fraction-of-SUM cut (0.005 here, 0.0001/SF in TPC-H)
    selected ZERO rows at both fixture tiers — a vacuous oracle (empty
    multisets always hash-match). TPC-H itself scales the fraction by
    1/SF for exactly this reason; a multiple of AVG is the scale-free
    equivalent (134 rows at sf0.01, 1375 at sf0.1) and keeps the same
    plan shape: CTE evaluated once, one-row broadcast, filter."""
    _view(spark, sf_dir, "lineitem", "supplier", "part")
    return spark.sql(
        """
        WITH inv AS (
          SELECT l.l_partkey AS partkey,
                 SUM(l.l_quantity * p.p_retailprice) AS value
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN part p     ON p.p_partkey = l.l_partkey
          WHERE s.s_nationkey IN (5, 6)
          GROUP BY 1
        )
        SELECT partkey, ROUND(value, 2) AS value
        FROM inv
        WHERE value > (SELECT 2.0 * AVG(value) FROM inv)
        ORDER BY value DESC, partkey
        """
    )


@register(
    "sql_tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier) — the view-plus-MAX-subquery archetype:
    quarterly revenue per supplier, returning the one(s) achieving the
    maximum. The equality compares values ROUNDed identically on both
    sides of the same CTE, so ties and float noise cannot split
    engines."""
    _view(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """
    )


@register(
    "sql_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) — the NOT-IN-subquery +
    COUNT DISTINCT archetype: distinct supplier counts per part
    attribute bucket, excluding deny-listed suppliers (negative balance
    stands in for the spec's complaints LIKE filter). The NOT IN becomes
    a null-aware anti join; the distinct count is the expand-then-
    partial-agg plan."""
    _view(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """
    )


@register(
    "sql_tpch_q20",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
      )
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 60
    )
    ORDER BY s.s_name
    """,
)
def sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) — the nested-IN archetype:
    suppliers who moved more than a volume threshold of any 'blue%' part
    in a year. Availability (partsupp.ps_availqty) is emulated by
    shipped volume; the two-level IN nesting (supplier in group-filtered
    lineitem, part in LIKE-filtered part) survives and both levels
    decorrelate to semi joins."""
    _view(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(
        """
        SELECT s.s_name, n.n_name
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
          SELECT l.l_suppkey
          FROM lineitem l
          WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'
          )
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(l.l_quantity) > 60
        )
        ORDER BY s.s_name
        """
    )


@register(
    "sql_tpch_q21",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) — the hardest
    archetype: EXISTS and NOT EXISTS against the SAME fact table under
    different correlated predicates, identifying the sole supplier that
    shipped late (>90 days after ordering, standing in for the missing
    receipt/commit dates) on a multi-supplier finished order. Both
    subqueries decorrelate to one semi and one anti join on l_orderkey,
    so lineitem is scanned three times but joined, never per-row."""
    _view(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 20
        """
    )


@register(
    "sql_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE anc(s_suppkey, node, depth, path) AS (
      SELECT s_suppkey, s_suppkey, 0,
             CAST(s_suppkey AS VARCHAR)
      FROM supplier
      UNION ALL
      SELECT s_suppkey, node // 2, depth + 1,
             path || '/' || CAST(node // 2 AS VARCHAR)
      FROM anc WHERE node > 1
    )
    SELECT s_suppkey, CAST(MAX(depth) AS INT) AS depth_to_root,
           MAX(path) AS root_path
    FROM anc GROUP BY s_suppkey
    ORDER BY s_suppkey
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through raw SQL — Spark 4's recursive CTE support,
    the construct that turns hierarchy walks (org charts, BOM explosions,
    folder trees) into declarative SQL. The fixture has no parent table,
    so each supplier's ancestry is the implicit binary tree parent(k) =
    k/2: every node has exactly ONE parent, so the recursion is strictly
    depth-bounded at log2(max key) with zero path multiplicity — the
    shape to copy at scale (the iterative-closure operators with real
    fan-out, `dedup_components`/`graph_pagerank`, use the loop-with-
    convergence-check formulation instead precisely because UNION ALL
    recursion multiplies paths). The longest ancestor path is returned
    per supplier with its depth; DuckDB runs the identical recursion."""
    _view(spark, sf_dir, "supplier")
    return spark.sql(
        """
        WITH RECURSIVE anc(s_suppkey, node, depth, path) AS (
          SELECT s_suppkey, s_suppkey, 0,
                 CAST(s_suppkey AS STRING)
          FROM supplier
          UNION ALL
          SELECT s_suppkey, CAST(node / 2 AS BIGINT), depth + 1,
                 path || '/' || CAST(CAST(node / 2 AS BIGINT) AS STRING)
          FROM anc WHERE node > 1
        )
        SELECT s_suppkey, CAST(MAX(depth) AS INT) AS depth_to_root,
               MAX(path) AS root_path
        FROM anc GROUP BY s_suppkey
        ORDER BY s_suppkey
        """
    )


@register(
    "sql_pivot",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
             AS open_total,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
             AS finished_total,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
             AS pending_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard PIVOT clause through spark.sql — the relational
    spelling of the DataFrame `agg_pivot`: order totals cross-tabulated
    by status per priority. Catalyst rewrites PIVOT into the same
    conditional-aggregate Expand plan the DataFrame API produces (the
    oracle states that rewrite explicitly — one pass, map-side partial
    aggregation, no per-status scans)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               ROUND(open_total, 2) AS open_total,
               ROUND(finished_total, 2) AS finished_total,
               ROUND(pending_total, 2) AS pending_total
        FROM (
          SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus, o_totalprice FROM orders
          )
          PIVOT (SUM(o_totalprice)
                 FOR o_orderstatus IN ('O' AS open_total, 'F' AS finished_total,
                                       'P' AS pending_total))
        )
        """
    )


@register(
    "sql_unpivot",
    oracle="""
    SELECT p_partkey, 'size_v' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part WHERE p_partkey < 500
    UNION ALL
    SELECT p_partkey, 'price_v' AS metric, ROUND(p_retailprice, 2) AS val
    FROM part WHERE p_partkey < 500
    """,
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard UNPIVOT clause through spark.sql — wide-to-long
    melting as a relational statement (the declarative twin of the
    DataFrame `unpivot_melt`): two part measures stacked into
    (metric, value) rows. Catalyst plans UNPIVOT as an Expand — one scan
    emitting k rows per input row, which is also what the UNION-ALL
    oracle states; at scale that beats k self-scans exactly as the
    PIVOT side avoids per-status scans."""
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, metric,
               CASE WHEN metric = 'price_v' THEN ROUND(val, 2) ELSE val END AS val
        FROM (
          SELECT p_partkey, CAST(p_size AS DOUBLE) AS size_v,
                 p_retailprice AS price_v
          FROM part WHERE p_partkey < 500
        ) UNPIVOT (val FOR metric IN (size_v, price_v))
        """
    )


# ---------------------------------------------------------------------------
# GROUP BY ALL (modern SQL surface) — round 9
# ---------------------------------------------------------------------------


@register(
    "sql_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(AVG(l_quantity), 4) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-06-01'
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the modern-SQL ergonomic both engines now parse
    (Spark 3.4+/4.x and DuckDB infer the grouping keys as every
    non-aggregate select item), exercised through the raw SQL surface so
    the engine's PARSER feature coverage is pinned, not just the
    DataFrame equivalent (`agg_groupby`). The oracle is the IDENTICAL
    text — the whole point is that one statement runs on both.

    Scale: same plan as any two-key aggregate — filter pushed to the
    parquet scan, map-side partial agg, O(flag x status) rows out."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("f2s_li_gba")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(AVG(l_quantity), 4) AS avg_qty
        FROM f2s_li_gba
        WHERE l_shipdate >= DATE '1995-06-01'
        GROUP BY ALL
        """
    )
