"""Semantic invariants for the round-10 operators — properties the oracle
hash check cannot express (null behavior, bound constraints, survivorship
correctness, accounting identities)."""

import math

from fits2db_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _run(spark, name):
    return all_queries()[name](spark, SF_SMOKE).collect()


def test_kruskal_wallis_null_and_bounds(spark):
    (r,) = _run(spark, "agg_kruskal_wallis")
    assert r["df"] == 4  # 5 priorities
    assert r["h_stat"] >= 0
    # price independent of priority -> H near its chi2(4) mean; the 99.9th
    # percentile of chi2(4) is 18.5 — a generous true-null ceiling
    assert r["h_stat"] < 18.5, r["h_stat"]


def test_cramers_v_in_unit_interval_and_near_zero(spark):
    (r,) = _run(spark, "agg_cramers_v")
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0
    assert r["df"] == (5 - 1) * (3 - 1)


def test_mcnemar_counts_and_chi2_identity(spark):
    (r,) = _run(spark, "ml_mcnemar_test")
    assert 0 < r["b01"] and 0 < r["c10"]
    assert r["b01"] + r["c10"] <= r["n"]
    want = (abs(r["b01"] - r["c10"]) - 1) ** 2 / (r["b01"] + r["c10"])
    assert abs(r["chi2_mcnemar"] - want) < 1e-4
    assert 0.0 <= r["acc_a"] <= 1.0 and 0.0 <= r["acc_b"] <= 1.0


def test_tost_verdict_matches_statistics(spark):
    (r,) = _run(spark, "ml_tost_equivalence")
    assert r["se"] > 0
    assert r["equivalent"] == (r["t_lower"] > 1.6449 and r["t_upper"] < -1.6449)
    # the two one-sided statistics must bracket the margin-free t
    assert r["t_lower"] > r["t_upper"]


def test_line_dedup_shares_consistent(spark):
    rows = _run(spark, "text_line_dedup")
    assert rows, "per-source stats must be non-empty"
    for r in rows:
        assert 0 <= r["n_boiler_chunks"] <= r["n_chunks"]
        assert abs(r["boiler_share"] - r["n_boiler_chunks"] / r["n_chunks"]) < 1e-5
        assert r["n_docs_affected"] <= r["n_chunks"]


def test_prefix_truncation_keeper_is_longest(spark):
    from pyspark.sql import functions as F

    from fits2db_spark.tables import load

    rows = _run(spark, "dedup_prefix_truncation")
    assert rows, "the fixture plants prefix families"
    docs = {
        r["doc_id"]: r["n"]
        for r in load(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_docs"] > 1
        assert r["min_tokens"] <= r["max_tokens"]
        # the elected keeper is the longest member of its family
        assert docs[r["keep_doc_id"]] == r["max_tokens"]


def test_hapax_ratio_bounds(spark):
    for r in _run(spark, "text_hapax_ratio"):
        assert 0 < r["vocab"] <= r["n_tokens"]
        assert 0 <= r["hapax"] <= r["vocab"]
        assert abs(r["hapax_ratio"] - r["hapax"] / r["vocab"]) < 1e-5


def test_page_hinkley_statistic_nonnegative(spark):
    rows = _run(spark, "events_page_hinkley")
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r["max_ph"] >= 0  # PH_t = m_t - min m_s >= 0 by construction
        assert r["drift_detected"] == (r["max_ph"] > 20.0)
        if r["first_alarm_day"] is not None:
            assert r["drift_detected"]


def test_query_likelihood_ranks_and_scores(spark):
    rows = _run(spark, "text_query_likelihood")
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        # every score is a finite log-likelihood ratio sum
        assert all(math.isfinite(s) for s in scores)


def test_quality_gate_accounting_identity(spark):
    rows = _run(spark, "pipeline_quality_gate")
    assert rows
    tot = sum(r["n_docs"] for r in rows)
    passed = sum(r["n_pass"] for r in rows)
    assert 0 < passed < tot, "gate must reject some and pass some"
    for r in rows:
        assert r["n_pass"] <= r["n_docs"]
        # rules can overlap, so rejections >= docs - pass is NOT an identity;
        # but no rule can reject more than the source holds
        for k in ("rej_short", "rej_long", "rej_repeat", "rej_lang"):
            assert 0 <= r[k] <= r["n_docs"]
        assert abs(r["pass_rate"] - r["n_pass"] / r["n_docs"]) < 1e-5


def test_phase_fold_bins_cover_and_counts_sum(spark):
    from fits2db_spark.tables import load
    from pyspark.sql import functions as F

    rows = _run(spark, "lightcurve_phase_fold")
    bins = sorted(r["phase_bin"] for r in rows)
    assert bins == list(range(20))
    n_views = (
        load(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "view")
        .count()
    )
    assert sum(r["n"] for r in rows) == n_views
    assert all(r["sem_v"] >= 0 for r in rows)


def test_its_placebo_near_null(spark):
    rows = _run(spark, "events_intervention_its")
    assert len(rows) == 5
    for r in rows:
        # no intervention is planted: both changes sit near zero relative to
        # the value scale (daily means are O(50)); at the sf0.001 smoke tier
        # each segment has only ~15 noisy points, so the null band is wide
        assert abs(r["level_change"]) < 40.0, r
        assert abs(r["slope_change"]) < 6.0, r
        assert r["n_pre"] > 2 and r["n_post"] > 2


def test_youden_threshold_separates_constructed_label(spark):
    (r,) = _run(spark, "ml_youden_threshold")
    # the AUC label has real signal (AUC ~0.94), so the best J must be
    # strongly positive and the rates must be genuine probabilities
    assert r["youden_j"] > 0.5, r
    assert 0.0 <= r["fpr"] < r["tpr"] <= 1.0
    assert r["threshold_bucket"] > 0


def test_tokenizer_fertility_bounds(spark):
    rows = _run(spark, "text_tokenizer_fertility")
    assert {r["lang"] for r in rows} == {"en", "de", "fr", "es", "zh"}
    for r in rows:
        # fixture text is space-separated alnum words: every word yields
        # at least one subword, so fertility >= 1; bytes/token is positive
        assert r["fertility"] >= 1.0
        assert r["bytes_per_token"] > 0
        assert r["n_subwords"] >= r["n_words"] > 0


def test_calibration_ece_consistent_with_bins(spark):
    (r,) = _run(spark, "ml_calibration_ece")
    bins = _run(spark, "ml_calibration_bins")
    # at the smoke tier a price bin can be EMPTY — both entries must agree
    # on the occupied-bin count, which is at most the 10 fixed bins
    assert r["n_bins"] == len(bins) <= 10
    assert r["n"] == sum(b["n"] for b in bins)
    # ECE is a weighted mean of per-bin gaps -> bounded by the max gap
    assert 0.0 <= r["ece"] <= r["mce"] <= 1.0
    # MCE agrees with the bins entry's worst gap (both floor at 1e-4, but
    # the bins floor each gap first — allow that one-ulp-of-floor slack)
    assert abs(r["mce"] - max(b["calib_gap"] for b in bins)) <= 1e-4


def test_stickiness_bounds(spark):
    rows = _run(spark, "events_dau_mau_stickiness")
    assert rows
    for r in rows:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["avg_dau"] <= r["mau"]
        assert r["n_days"] >= 1


def test_sigma_clip_monotone_contraction(spark):
    rows = sorted(_run(spark, "fits_image_sigma_clip"), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    ns = [r["n_kept"] for r in rows]
    assert ns[0] <= 48 * 32
    assert ns == sorted(ns, reverse=True), "clip must only shrink"
    stds = [r["std_val"] for r in rows]
    assert stds == sorted(stds, reverse=True), "std must not increase"


def test_silhouette_bounds_and_agreement_with_kmeans(spark):
    sil = {r["cluster"]: r for r in _run(spark, "vec_kmeans_silhouette")}
    km = {r["cluster"]: r for r in _run(spark, "vec_kmeans")}
    assert set(sil) == set(km), "both must see the same final clusters"
    for c, r in sil.items():
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["n"] == km[c]["n"], "assignments must agree"


def test_qte_monotone_quantiles(spark):
    rows = sorted(_run(spark, "agg_quantile_treatment_effect"), key=lambda r: r["q"])
    assert [r["q"] for r in rows] == [0.25, 0.5, 0.75, 0.9]
    for col in ("q_treat", "q_control"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals), f"{col} must be nondecreasing in q"
    for r in rows:
        assert abs(r["qte"] - (r["q_treat"] - r["q_control"])) < 1e-9


def test_poisson_gof_rejects_zero_truncated_data(spark):
    (r,) = _run(spark, "orders_poisson_gof")
    assert r["lambda_hat"] > 1.0
    assert r["df"] == 9
    assert r["chi2"] > 0
    # no 0-line orders exist, so a plain Poisson must misfit -> reject
    assert r["reject_poisson"] is True


def test_bhattacharyya_bounds(spark):
    (r,) = _run(spark, "agg_bhattacharyya")
    assert 0.0 < r["bc_coefficient"] <= 1.0
    assert r["bhattacharyya_dist"] >= 0.0
    assert 0.0 <= r["hellinger_dist"] <= 1.0
    # click and view values are near-identically distributed -> high overlap
    assert r["bc_coefficient"] > 0.9


def test_lorenz_curve_convex_and_anchored(spark):
    rows = sorted(_run(spark, "agg_lorenz_curve"), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(rows[-1]["cum_cust_share"] - 1.0) < 1e-6
    assert abs(rows[-1]["cum_rev_share"] - 1.0) < 1e-6
    # Lorenz curve lies under the diagonal and is nondecreasing
    prev = 0.0
    for r in rows:
        assert r["cum_rev_share"] <= r["cum_cust_share"] + 1e-6
        assert r["cum_rev_share"] >= prev
        prev = r["cum_rev_share"]


def test_vocab_overlap_bounds(spark):
    rows = _run(spark, "text_vocab_overlap_jaccard")
    assert len(rows) == 15
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in rows)
    assert all(r["src_a"] < r["src_b"] for r in rows)
    js = [r["jaccard"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert js == sorted(js, reverse=True)


def test_mattr_bounds(spark):
    rows = _run(spark, "text_mattr_diversity")
    assert len(rows) == 20
    for r in rows:
        # each window's TTR is in (0, 1]; so are the per-source summaries
        assert 0.0 < r["min_mattr"] <= r["mean_mattr"] <= 1.0
        assert r["n_docs"] > 0
