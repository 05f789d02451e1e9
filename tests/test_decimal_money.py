"""DECIMAL money family (round 9): the decimal logical type must survive
the parquet round-trip, the arithmetic must be exact (not double-drifted),
and none of the plans may fall out of codegen into Python."""

from decimal import Decimal

from pyspark.sql.types import DecimalType

from fits2db_spark.operators.decimal_money import (
    agg_decimal_revenue,
    decimal_roundtrip,
    win_decimal_balance,
)
from fits2db_spark.tables import load

from tests.conftest import SF_SMOKE


def test_roundtrip_preserves_decimal_type(spark):
    df = decimal_roundtrip(spark, SF_SMOKE)
    types = dict(df.dtypes)
    assert types["sum_price"] == "decimal(38,2)"
    assert types["min_price"] == "decimal(15,2)"
    assert types["max_price"] == "decimal(15,2)"
    rows = {r["l_returnflag"]: r for r in df.collect()}
    # exact reconstruction from the source doubles via Python Decimal
    src = load(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_extendedprice").collect()
    expect: dict[str, Decimal] = {}
    for r in src:
        cents = Decimal(repr(r["l_extendedprice"])).quantize(Decimal("0.01"))
        expect[r["l_returnflag"]] = expect.get(r["l_returnflag"], Decimal(0)) + cents
    for flag, want in expect.items():
        assert rows[flag]["sum_price"] == want, flag


def test_revenue_scales_and_exactness(spark):
    df = agg_decimal_revenue(spark, SF_SMOKE)
    types = dict(df.dtypes)
    assert types["sum_base"] == "decimal(38,2)"
    assert types["sum_disc_price"] == "decimal(38,4)"
    assert types["sum_charge"] == "decimal(38,6)"
    out = df.collect()
    assert out
    for r in out:
        # charge applies a tax factor in [1.00, 1.08] on top of disc price
        assert r["sum_charge"] >= r["sum_disc_price"]
        assert r["sum_disc_price"] <= r["sum_base"]
        # scale-6 values are exact multiples of 10^-6 by construction
        assert r["sum_charge"] == r["sum_charge"].quantize(Decimal("0.000001"))


def test_balance_is_exact_prefix_sum(spark):
    df = win_decimal_balance(spark, SF_SMOKE)
    assert dict(df.dtypes)["balance"] == "decimal(38,2)"
    rows = df.collect()
    assert rows
    src = (
        load(spark, SF_SMOKE, "orders")
        .filter("o_custkey % 50 = 0")
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        .collect()
    )
    by_cust: dict[int, list] = {}
    for r in src:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    expect = {}
    for cust, rs in by_cust.items():
        run = Decimal(0)
        for r in sorted(rs, key=lambda r: (r["o_orderdate"], r["o_orderkey"])):
            run += Decimal(repr(r["o_totalprice"])).quantize(Decimal("0.01"))
            expect[(cust, r["o_orderkey"])] = run
    for r in rows:
        assert r["balance"] == expect[(r["o_custkey"], r["o_orderkey"])]


def test_decimal_plans_stay_jvm_side(spark):
    for fn in (decimal_roundtrip, agg_decimal_revenue, win_decimal_balance):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, fn.__name__


def test_roundtrip_storage_schema_is_decimal(spark):
    # the scratch parquet itself (not just the final agg) must carry the
    # decimal annotation — re-read the directory decimal_roundtrip wrote
    decimal_roundtrip(spark, SF_SMOKE).collect()
    import os
    import tempfile

    out = os.path.join(
        tempfile.gettempdir(), "fits2db_spark_scratch", "lineitem_decimal_sf0.001"
    )
    back = spark.read.parquet(out)
    assert isinstance(back.schema["price"].dataType, DecimalType)
    assert (back.schema["price"].dataType.precision, back.schema["price"].dataType.scale) == (15, 2)
