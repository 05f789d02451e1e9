"""Semantic checks for the warehouse operators, re-derived with pandas."""

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE

from fits2db_spark.operators import warehouse  # noqa: F401  (registration)
from fits2db_spark.registry import all_queries


def _run(spark, name):
    return all_queries()[name](spark, SF_SMOKE).toPandas()


def test_snapshot_diff_classes_match_modular_arithmetic(spark):
    got = _run(spark, "snapshot_diff").set_index("change_type")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    k = o.o_orderkey
    in_a, in_b = (k % 97 != 0), (k % 101 != 0)
    changed = in_a & in_b & (k % 89 == 0) & (k != 0)
    assert got.loc["added", "n"] == int((~in_a & in_b).sum())
    assert got.loc["removed", "n"] == int((in_a & ~in_b).sum())
    assert got.loc["changed", "n"] == int(changed.sum())
    assert got.loc["unchanged", "n"] == int((in_a & in_b & ~changed).sum())
    # net delta on the changed class is the 10% bump
    bump = (o.o_totalprice[changed] * 0.1).sum()
    assert abs(got.loc["changed", "price_delta"] - round(bump, 2)) < 0.02


def test_zorder_files_are_16x16_tiles(spark):
    got = _run(spark, "zorder_layout")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    assert got.n_rows.sum() == len(o)
    # Morton z >> 8 keeps the top 4 bits of each dimension, so every file
    # is an axis-aligned 16x16 tile of the bin grid — spans can never
    # exceed 16 in either dimension (the data-skipping guarantee).
    assert (got.bx_span <= 16).all() and (got.by_span <= 16).all()
    assert (got.file_id >= 0).all() and (got.file_id <= 255).all()


def test_ts_interpolate_masks_and_fills(spark):
    got = _run(spark, "ts_interpolate")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.mean()
    assert set(map(tuple, got[["event_type", "d"]].values)) == set(daily.index)
    assert (got.was_missing == (got.d % 5 == 2).astype(int)).all()
    # observed days pass through untouched
    obs = got[got.was_missing == 0]
    for row in obs.sample(20, random_state=0).itertuples():
        assert abs(row.v_filled - daily.loc[(row.event_type, row.d)]) < 1e-5
    # masked interior days are the linear blend of their observed neighbors
    miss = got[got.was_missing == 1]
    for row in miss.sample(10, random_state=0).itertuples():
        s = daily.loc[row.event_type]
        prev_d = max(d for d in s.index if d < row.d and d % 5 != 2)
        next_ds = [d for d in s.index if d > row.d and d % 5 != 2]
        if not next_ds:
            expect = s.loc[prev_d]
        else:
            nd = min(next_ds)
            expect = s.loc[prev_d] + (s.loc[nd] - s.loc[prev_d]) * (
                row.d - prev_d
            ) / (nd - prev_d)
        assert abs(row.v_filled - expect) < 1e-5


def test_attribution_matches_pandas(spark):
    got = _run(spark, "events_attribution").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    first_purchase = (
        ev[ev.event_type == "purchase"].groupby("user_id").ts.min()
    )
    pre = ev.merge(first_purchase.rename("fp"), on="user_id")
    pre = pre[pre.ts < pre.fp].sort_values(["user_id", "ts", "event_id"])
    first = pre.groupby("user_id").first().event_type.value_counts()
    last = pre.groupby("user_id").last().event_type.value_counts()
    total_first = got.n_first_touch.sum()
    assert total_first == got.n_last_touch.sum() == len(first_purchase.index.intersection(pre.user_id.unique()))
    for t in got.index:
        assert got.loc[t, "n_first_touch"] == int(first.get(t, 0))
        assert got.loc[t, "n_last_touch"] == int(last.get(t, 0))


def test_merkle_buckets_flag_exactly_the_drifted_buckets(spark):
    """Every bucket holding a drifted (97-divisible) or missing
    (101-divisible) order key must be reported, and buckets with no such
    key must NOT be (no false positives)."""
    from pyspark.sql import functions as F

    from fits2db_spark.operators.llm_text import _h64
    from fits2db_spark.operators.warehouse import sync_merkle_buckets
    from fits2db_spark.tables import load
    from tests.conftest import SF_SMOKE

    got = {r["bucket"] for r in sync_merkle_buckets(spark, SF_SMOKE).collect()}
    o = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", (_h64(F.col("o_orderkey").cast("string")) % 256).alias("bucket")
    )
    want = {
        r["bucket"]
        for r in o.filter(
            (F.col("o_orderkey") % 97 == 0) | (F.col("o_orderkey") % 101 == 0)
        ).collect()
    }
    assert got == want
