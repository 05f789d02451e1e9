"""Semantic checks for the inference operators: each statistic is
re-derived independently (pandas/numpy over the same parquet) and compared,
so a green oracle can't hide a formula that is merely self-consistent."""

import math

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE

from fits2db_spark.operators import inference  # noqa: F401  (registration)
from fits2db_spark.registry import all_queries


def _run(spark, name):
    return all_queries()[name](spark, SF_SMOKE).toPandas()


def test_ks_test_matches_numpy(spark):
    got = _run(spark, "agg_ks_test").iloc[0]
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    a = o[o.o_orderstatus == "O"].o_totalprice.to_numpy()
    b = o[o.o_orderstatus == "F"].o_totalprice.to_numpy()
    buckets = np.arange(
        0, math.floor(max(a.max(), b.max()) / 5000) + 2
    )  # bin edges at 5000 * k
    ca = np.cumsum(np.bincount((a // 5000).astype(int), minlength=len(buckets))) / len(a)
    cb = np.cumsum(np.bincount((b // 5000).astype(int), minlength=len(buckets))) / len(b)
    d = np.abs(ca - cb).max()
    assert got["n_open"] == len(a) and got["n_filled"] == len(b)
    assert got["ks_d"] == pytest.approx(d, abs=1e-6)
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert got["ks_crit_05"] == pytest.approx(crit, abs=1e-6)
    assert got["reject_05"] == int(d > crit)


def test_chisq_matches_numpy(spark):
    got = _run(spark, "agg_chisq").iloc[0]
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    tab = pd.crosstab(c.c_mktsegment, c.c_nationkey % 5).to_numpy().astype(float)
    exp = tab.sum(1, keepdims=True) * tab.sum(0, keepdims=True) / tab.sum()
    chi2 = ((tab - exp) ** 2 / exp).sum()
    assert got["n_customers"] == len(c)
    assert got["dof"] == (tab.shape[0] - 1) * (tab.shape[1] - 1)
    assert got["chi2"] == pytest.approx(chi2, abs=1e-5)


def test_acf_matches_numpy_and_bounds(spark):
    got = _run(spark, "events_acf")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = ev.ts.dt.normalize()
    daily = ev.groupby(["event_type", "d"])["value"].sum()
    assert ((got.acf.dropna().abs() <= 1.0 + 1e-9)).all()
    # independent recomputation for one (type, lag) cell
    t0 = got.event_type.iloc[0]
    s = daily.loc[t0].sort_index()
    for lag in (1, 7):
        pair = got[(got.event_type == t0) & (got.lag == lag)].iloc[0]
        x = s.to_numpy()
        # align day t with day t+lag on the actual calendar (days are dense
        # in the fixture, so positional shift == calendar shift)
        expect = np.corrcoef(x[:-lag], x[lag:])[0, 1]
        assert pair["n_pairs"] == len(x) - lag
        assert pair["acf"] == pytest.approx(expect, abs=1e-6)


def test_zipf_fit_shape(spark):
    got = _run(spark, "text_zipf")
    assert set(got.columns) == {
        "lang",
        "n_terms",
        "zipf_slope",
        "zipf_intercept",
        "fit_r2",
    }
    # frequencies are non-increasing in rank, so the slope is negative; the
    # near-uniform synthetic vocabulary keeps r2 small but well-defined
    assert (got.zipf_slope < 0).all()
    assert ((got.fit_r2 > 0.0) & (got.fit_r2 <= 1.0)).all()
    assert (got.n_terms <= 200).all()
    # independent numpy refit for one language
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    lang = got.lang.iloc[0]
    toks = d[d.lang == lang].text.str.split(" ").explode()
    freq = toks.value_counts()
    order = sorted(
        zip(-freq.to_numpy(), freq.index), key=lambda t: (t[0], t[1])
    )[:200]
    n = np.array([-f for f, _ in order], dtype=float)
    rk = np.arange(1, len(n) + 1, dtype=float)
    slope = np.polyfit(np.log(rk), np.log(n), 1)[0]
    assert got[got.lang == lang].zipf_slope.iloc[0] == pytest.approx(slope, abs=1e-6)


def test_welch_ttest_matches_numpy(spark):
    got = _run(spark, "agg_welch_ttest").iloc[0]
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    a = o[o.o_orderstatus == "O"].o_totalprice.to_numpy()
    b = o[o.o_orderstatus == "F"].o_totalprice.to_numpy()
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert got["n_open"] == len(a) and got["n_filled"] == len(b)
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["welch_dof"] == pytest.approx(dof, abs=0.02)


def test_decile_histogram_is_equi_depth(spark):
    got = _run(spark, "agg_decile_stats").sort_values("decile")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    n = len(li)
    assert list(got.decile) == list(range(10))
    assert got.n.sum() == n
    # equi-depth: every bin within one row of n/10 (interpolated edges)
    assert (abs(got.n - n / 10) <= 1).all()
    # bins tile the range in order
    assert (got.max_price.to_numpy()[:-1] <= got.min_price.to_numpy()[1:]).all()


def test_skyline_is_exactly_the_undominated_set(spark):
    got = _run(spark, "skyline_pareto")
    p = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    pts = p.groupby("p_size").p_retailprice.max()
    frontier = {
        int(s)
        for s, price in pts.items()
        if not ((pts.index < s) & (pts >= price)).any()
    }
    assert set(got.p_size) == frontier
    # every exemplar really achieves its frontier point
    for row in got.itertuples():
        sub = p[(p.p_size == row.p_size)]
        assert round(sub.p_retailprice.max(), 2) == row.best_price
        assert row.exemplar_partkey in set(
            sub[sub.p_retailprice == sub.p_retailprice.max()].p_partkey
        )
