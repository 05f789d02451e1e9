"""DECIMAL money family (round 9; finals re-pinned round 11): the decimal
logical type must survive the parquet round-trip, the arithmetic must be
exact (not double-drifted), and none of the plans may fall out of codegen
into Python.

Round-11 change: final output columns are pinned-scale VARCHAR on both
engines (the external driver canonicalizes through pandas where DuckDB
renders DECIMAL as float64, hash-mismatching every trailing-zero scale
digit — CORRECTNESS_r10 burned agg_decimal_revenue and win_decimal_balance
on exactly this). These tests parse the strings back through
``decimal.Decimal`` so the exactness assertions are unchanged, and pin the
string format itself (fixed scale, trailing zeros preserved).
"""

import re
from decimal import Decimal

from pyspark.sql.types import DecimalType

from fits2db_spark.operators.decimal_money import (
    agg_decimal_revenue,
    decimal_roundtrip,
    win_decimal_balance,
)
from fits2db_spark.tables import load

from tests.conftest import SF_SMOKE


def _pinned(scale: int) -> re.Pattern:
    return re.compile(rf"^-?\d+\.\d{{{scale}}}$")


def test_roundtrip_preserves_decimal_type(spark):
    df = decimal_roundtrip(spark, SF_SMOKE)
    types = dict(df.dtypes)
    assert types["sum_price"] == "string"
    assert types["min_price"] == "string"
    assert types["max_price"] == "string"
    rows = {r["l_returnflag"]: r for r in df.collect()}
    for r in rows.values():
        assert _pinned(2).match(r["sum_price"]), r["sum_price"]
        assert _pinned(2).match(r["min_price"]), r["min_price"]
    # exact reconstruction from the source doubles via Python Decimal
    src = load(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_extendedprice").collect()
    expect: dict[str, Decimal] = {}
    for r in src:
        cents = Decimal(repr(r["l_extendedprice"])).quantize(Decimal("0.01"))
        expect[r["l_returnflag"]] = expect.get(r["l_returnflag"], Decimal(0)) + cents
    for flag, want in expect.items():
        assert Decimal(rows[flag]["sum_price"]) == want, flag


def test_revenue_scales_and_exactness(spark):
    df = agg_decimal_revenue(spark, SF_SMOKE)
    types = dict(df.dtypes)
    assert types["sum_base"] == "string"
    assert types["sum_disc_price"] == "string"
    assert types["sum_charge"] == "string"
    out = df.collect()
    assert out
    for r in out:
        # the string carries the full pinned scale (the whole point of the
        # VARCHAR boundary: '950112.70' stays '950112.70')
        assert _pinned(2).match(r["sum_base"]), r["sum_base"]
        assert _pinned(4).match(r["sum_disc_price"]), r["sum_disc_price"]
        assert _pinned(6).match(r["sum_charge"]), r["sum_charge"]
        base = Decimal(r["sum_base"])
        disc = Decimal(r["sum_disc_price"])
        charge = Decimal(r["sum_charge"])
        # charge applies a tax factor in [1.00, 1.08] on top of disc price
        assert charge >= disc
        assert disc <= base
        # scale-6 values are exact multiples of 10^-6 by construction
        assert charge == charge.quantize(Decimal("0.000001"))


def test_balance_is_exact_prefix_sum(spark):
    df = win_decimal_balance(spark, SF_SMOKE)
    assert dict(df.dtypes)["balance"] == "string"
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
        assert _pinned(2).match(r["balance"]), r["balance"]
        assert Decimal(r["balance"]) == expect[(r["o_custkey"], r["o_orderkey"])]


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
