"""Bucketed co-located joins (SURVEY.md §2.C join_sortmerge scale note):
pre-bucketing both fact tables on the join key removes the per-query
shuffle entirely — THE optimization for repeated joins at 100 TB."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from fits2db_spark.tables import load

    try:
        li = load(spark, SF_SMOKE, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderpriority")
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "li_b"))  # external: keep out of the repo's warehouse
            .saveAsTable("li_b")
        )
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "o_b"))
            .saveAsTable("o_b")
        )
        j = (
            spark.table("li_b")
            .hint("merge")  # pin SMJ: at sf0.001 AQE would broadcast instead
            .join(spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # neither join input may reshuffle: bucket layout satisfies the
        # distribution requirement (the only Exchange allowed is the
        # post-join aggregation's)
        assert "SortMergeJoin" in plan
        n_exchanges_before_join = plan.split("SortMergeJoin")[-1].count("Exchange hashpartitioning(l_orderkey")
        assert n_exchanges_before_join == 0, plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        # and the result is right
        want = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")
