"""Semantic invariants for the round-9 operators — properties the oracle
hash check cannot express (effect recovery, bound constraints, peel
monotonicity)."""

from fits2db_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _run(spark, name):
    return all_queries()[name](spark, SF_SMOKE).collect()


def test_esd_peels_distinct_days_and_shrinks(spark):
    rows = sorted(_run(spark, "events_anomaly_esd"), key=lambda r: r["round"])
    days = [r["day"] for r in rows]
    assert len(set(days)) == len(days), "each round must peel a new day"
    ns = [r["n_remaining"] for r in rows]
    assert ns == sorted(ns, reverse=True) and ns[0] - ns[-1] == len(rows) - 1
    assert all(r["r_stat"] > 0 for r in rows)


def test_did_recovers_injected_lift(spark):
    by = {r["scenario"]: r for r in _run(spark, "ml_did_estimator")}
    # the lift scenario multiplies treated-post values by 1.10, so its DiD
    # must exceed the placebo's by exactly 0.10 x mean_treat_post(null)
    implied = 0.10 * by["null"]["mean_treat_post"]
    got = by["lift"]["did"] - by["null"]["did"]
    assert abs(got - implied) < 0.01, (got, implied)


def test_rd_recovers_injected_jump(spark):
    by = {r["scenario"]: r for r in _run(spark, "ml_regression_discontinuity")}
    # constant +2 on the right side shifts ONLY the right intercept
    assert abs((by["jump"]["rd_effect"] - by["null"]["rd_effect"]) - 2.0) < 1e-6
    assert by["jump"]["limit_left"] == by["null"]["limit_left"]


def test_croston_forecast_positive_and_sba_below(spark):
    for r in _run(spark, "events_croston"):
        assert r["n_demand_days"] >= 2
        assert r["croston_forecast"] > 0
        assert r["sba_forecast"] < r["croston_forecast"]  # (1 - a/2) < 1


def test_mergeable_stats_merge_is_exact(spark):
    (r,) = _run(spark, "warehouse_mergeable_stats")
    assert r["mean_merge_err"] == 0.0
    assert r["var_merge_relerr"] == 0.0
    assert r["n_buckets"] == 16 and r["n_rows"] > 0


def test_rouge_l_bounds_and_lcs_consistency(spark):
    rows = _run(spark, "text_rouge_l")
    assert rows
    for r in rows:
        assert 0 <= r["lcs"] <= min(r["len_a"], r["len_b"])
        assert 0.0 <= r["rouge_l_f"] <= 1.0


def test_referential_integrity_constrained_edges_hold(spark):
    rows = {r["fk_edge"]: r for r in _run(spark, "dq_referential_integrity")}
    for edge, r in rows.items():
        if edge == "supplier.s_nationkey":
            continue
        assert r["n_orphans"] == 0, edge
    # the mis-declared edge must exercise the violations branch
    bad = rows["supplier.s_nationkey"]
    assert bad["n_orphans"] > 0 and bad["orphan_share"] > 0


def test_levene_f_nonnegative(spark):
    rows = _run(spark, "agg_levene_test")
    assert len(rows) == 3
    f = {r["levene_f"] for r in rows}
    assert len(f) == 1 and f.pop() >= 0


def test_permutation_null_p_value_not_degenerate(spark):
    (r,) = _run(spark, "agg_permutation_test")
    # random labels vs random labels: p must not collapse to 0 or 1
    assert 0.0 < r["p_value"] < 1.0
    assert r["n_extreme"] == round(r["p_value"] * 200)


def test_pacf_lag1_equals_acf_lag1(spark):
    for r in _run(spark, "events_pacf"):
        assert r["pacf1"] == r["r1"]
        assert abs(r["pacf2"]) <= 1.5 and abs(r["pacf3"]) <= 1.5


def test_seasonal_strength_in_unit_interval(spark):
    for r in _run(spark, "events_seasonal_strength"):
        assert 0.0 <= r["seasonal_strength"] <= 1.0
        assert r["var_remainder"] <= r["var_total"] * 1.0001


def test_powerlaw_tail_estimator_sane(spark):
    (r,) = _run(spark, "graph_degree_powerlaw")
    assert r["n_tail"] > 0 and r["alpha_hill"] > 1.0
    assert r["n_hist_points"] > 1


def test_dim_concentration_contrast_positive(spark):
    (r,) = _run(spark, "vec_dim_concentration")
    assert r["n_pairs"] > 0
    assert r["relative_contrast"] > 0
    assert 0 < r["concentration_ratio"] < 1


def test_isotonic_pav_monotone_and_mass_conserving(spark):
    rows = sorted(_run(spark, "ml_isotonic_pav"), key=lambda r: r["pool_id"])
    probs = [r["calibrated_p"] for r in rows]
    assert probs == sorted(probs), "PAV output must be nondecreasing"
    assert len(rows) <= 10
    from fits2db_spark.tables import load

    assert sum(r["n_rows"] for r in rows) == load(spark, SF_SMOKE, "orders").count()


def test_bloom_fpp_measured_near_theory(spark):
    (r,) = _run(spark, "agg_bloom_fpp")
    assert r["n_bits_set"] <= 16384
    assert r["n_probes"] == r["n_members"]
    # with n=1500, m=16384, k=4 theory is ~0.6%; measured must be the
    # same order of magnitude (binomial noise at n_probes=1500 allows 3x)
    assert r["theoretical_fpp"] > 0
    assert r["measured_fpp"] <= 5 * r["theoretical_fpp"] + 0.01


def test_dispersion_index_fields_consistent(spark):
    for r in _run(spark, "events_dispersion_index"):
        assert r["overdispersed"] == (r["dispersion_index"] > 1.0)
        assert r["n_days"] > 1 and r["mean_count"] > 0


def test_ngram_novelty_bounds(spark):
    rows = _run(spark, "text_ngram_novelty")
    assert rows
    for r in rows:
        assert 0.0 <= r["novelty_rate"] <= 1.0
        assert r["n_novel"] <= r["n_test_grams"]
