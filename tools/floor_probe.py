"""Per-query floor decomposition for the flat-absolute stragglers
(VERDICT r9 item 7): measure, per tier (sf0.01 / sf0.1 / synthetic sf1),
the scheduling floor, the cache-scan floor, each straggler's data-path
core, and the full query — so the "floor-bound" claim is per-query
MEASURED rather than argued from the joint scale-up table.

A query is floor-bound iff its full-query time stays flat while the data
grows 100x AND the gap between data-path core and full query matches the
scheduling + broadcast-build floors. Those are the queries whose sf0.1
ratio vs DuckDB overstates the at-scale gap: the residue is fixed local-
mode latency that amortizes at real partition counts.

Usage: python tools/floor_probe.py            # prints one JSON document
       (expects /tmp/scaleup/sf1 from tools/scaleup_bench.py; skips that
       tier if absent)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TIERS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/scaleup/sf1"),
]
STRAGGLERS = ("agg_groupby", "join_star_q5", "er_golden_record")
N_RUNS = 5


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, runs: int = N_RUNS) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _core_probes(spark, sf_dir):
    """Hand-reduced data-path cores: the query minus fixed-cost trimmings
    (round/sort on agg_groupby; dim broadcasts on q5; propagation rounds +
    survivorship on ER — pair matching is its data step)."""
    from pyspark.sql import functions as F

    from fits2db_spark.tables import load

    li = load(spark, sf_dir, "lineitem")

    def agg_core():
        _noop(
            li.groupBy("l_returnflag", "l_linestatus").agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1))
            )
        )

    def q5_core():  # fact-fact join + constant agg, no dimension chain
        o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        j = li.select("l_orderkey", "l_extendedprice", "l_discount").join(
            o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey
        )
        _noop(j.agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))))

    def er_core():  # blocked distinct-name fuzzy pair matching only
        p = load(spark, sf_dir, "part").select(
            "p_name", F.split("p_name", " ").getItem(1).alias("blk")
        )
        names = p.distinct()
        a, b = names.alias("a"), names.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.p_name") < F.col("b.p_name")),
            )
            .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).between(1, 2))
            .select(F.col("a.p_name").alias("doc_a"))
        )
        _noop(pairs)

    return {"agg_groupby": agg_core, "join_star_q5": q5_core, "er_golden_record": er_core}


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401 — session import order

    from fits2db_spark.registry import all_oracles, all_queries
    from fits2db_spark.session import get_spark
    from fits2db_spark.tables import load, warm_cache

    spark = get_spark("floor_probe", shuffle_partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = all_queries()
    oracles = all_oracles()

    out: dict = {"runs": N_RUNS, "tiers": {}}
    for tier, sf_dir in TIERS:
        if not os.path.isdir(sf_dir):
            out["tiers"][tier] = {"skipped": f"{sf_dir} absent"}
            continue
        warm_cache(spark, sf_dir, partitions=8)
        row: dict = {}
        # floors
        row["sched_floor"] = _best(lambda: _noop(spark.range(1)))
        li = load(spark, sf_dir, "lineitem")
        row["scan_floor"] = _best(lambda: _noop(li.select("l_orderkey")))
        cores = _core_probes(spark, sf_dir)
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in STRAGGLERS:
            # warm codegen once, untimed
            _noop(qs[name](spark, sf_dir))
            row[name] = {
                "core": _best(cores[name]),
                "full": _best(lambda: _noop(qs[name](spark, sf_dir))),
                "duckdb": _best(lambda: con.execute(oracles[name]).fetchall(), 3),
            }
        con.close()
        out["tiers"][tier] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
