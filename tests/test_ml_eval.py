"""Semantic checks for the round-8 continuation operators: ML evaluation
(AUC / calibration / NDCG), spectral entropy, entropy l-diversity, and
label-propagation communities — each re-derived independently in
numpy/pandas from the raw parquet, not from the operator's own SQL."""

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE

from fits2db_spark.operators import advanced, inference, pipeline, stats  # noqa: F401
from fits2db_spark.registry import all_queries


def _run(spark, name):
    return all_queries()[name](spark, SF_SMOKE).toPandas()


def _md5_noise(keys, mod):
    import hashlib

    return np.array(
        [int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % mod for k in keys]
    )


def _orders_labeled():
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    noise = _md5_noise(o.o_orderkey.to_numpy(), 300_000)
    o = o.assign(label=(o.o_totalprice.to_numpy() + noise > 400_000).astype(int))
    return o


def test_auc_matches_exact_mann_whitney_on_quantized_score(spark):
    got = _run(spark, "ml_auc_roc").set_index("o_orderpriority")
    o = _orders_labeled()
    o["bucket"] = np.floor(o.o_totalprice / 500).astype(int)
    for prio, g in o.groupby("o_orderpriority"):
        pos = g[g.label == 1].bucket.to_numpy()
        neg = g[g.label == 0].bucket.to_numpy()
        # brute-force pair counting (the definition the histogram identity
        # must reproduce exactly): P(pos > neg) + 0.5 P(tie)
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        row = got.loc[prio]
        assert row.n_pos == len(pos) and row.n_neg == len(neg)
        assert abs(row.auc - round(auc, 6)) < 2e-6
        assert row.auc > 0.85  # the constructed label carries real signal


def test_calibration_bins_match_numpy_and_show_miscalibration(spark):
    got = _run(spark, "ml_calibration_bins").set_index("bin").sort_index()
    o = _orders_labeled()
    o["score"] = 1.0 / (1.0 + np.exp(-(o.o_totalprice - 200000.0) / 80000.0))
    o["bin"] = np.minimum(9, np.floor(o.o_totalprice / 60000).astype(int))
    ref = o.groupby("bin").agg(
        n=("score", "size"), ms=("score", "mean"), fp=("label", "mean")
    )
    assert (got.n == ref.n).all()
    assert np.allclose(got.mean_score, np.floor(ref.ms * 10000) / 10000, atol=2e-4)
    assert np.allclose(got.frac_pos, np.floor(ref.fp * 10000) / 10000, atol=2e-4)
    # the logistic is genuinely miscalibrated vs the linear-ramp truth in
    # the mid bins (measured gaps ~0.1-0.2); a vacuous fixture would be flat
    assert got.calib_gap.max() > 0.05
    brier_ref = o.groupby("bin").apply(
        lambda g: ((g.score - g.label) ** 2).mean(), include_groups=False
    )
    assert np.allclose(got.brier, np.floor(brier_ref * 10000) / 10000, atol=2e-4)


def test_ndcg_matches_reference_implementation(spark):
    got = _run(spark, "ml_ndcg").set_index("c_mktsegment")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cnt = o.groupby("o_custkey").size()
    c["rel"] = np.minimum(4, (c.c_custkey.map(cnt).fillna(0) // 3).astype(int))
    for seg, g in c.groupby("c_mktsegment"):
        sys_order = g.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).rel.to_numpy()[:10]
        ideal_order = g.sort_values(
            ["rel", "c_custkey"], ascending=[False, True]
        ).rel.to_numpy()[:10]
        disc = 1.0 / np.log2(np.arange(2, 2 + 10))
        dcg = ((2.0**sys_order - 1) * disc[: len(sys_order)]).sum()
        idcg = ((2.0**ideal_order - 1) * disc[: len(ideal_order)]).sum()
        assert abs(got.loc[seg].dcg - np.floor(dcg * 10000) / 10000) < 2e-4
        assert abs(got.loc[seg].idcg - np.floor(idcg * 10000) / 10000) < 2e-4
        assert abs(got.loc[seg].ndcg - np.floor(dcg / idcg * 10000) / 10000) < 2e-4
        assert got.loc[seg].ndcg <= 1.0 + 1e-9


def test_spectral_entropy_matches_numpy_periodogram(spark):
    got = _run(spark, "events_spectral_entropy").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.astype("datetime64[us]").astype("int64") // 86_400_000_000)
    daily = ev.groupby(["event_type", "d"]).size().astype(float)
    periods = np.arange(2, 15)
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0)
        yc = y - y.mean()
        d = y.index.to_numpy()
        p = np.array(
            [
                np.sum(yc * np.cos(2 * np.pi * d / pp)) ** 2
                + np.sum(yc * np.sin(2 * np.pi * d / pp)) ** 2
                for pp in periods
            ]
        )
        share = p / p.sum()
        ent = -(share[share > 0] * np.log(share[share > 0])).sum() / np.log(
            len(periods)
        )
        assert abs(got.loc[t].spectral_entropy - np.floor(ent * 10000) / 10000) < 2e-4
        assert abs(got.loc[t].peak_share - np.floor(share.max() * 10000) / 10000) < 2e-4
        assert 0.0 <= got.loc[t].spectral_entropy <= 1.0


def test_entropy_ldiversity_invariants_and_numpy_agreement(spark):
    got = _run(spark, "privacy_entropy_ldiv")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    c["sens"] = np.where(
        c.c_acctbal < 0, "neg", np.where(c.c_acctbal < 5000, "low", "high")
    )
    for _, row in got.iterrows():
        g = c[(c.c_nationkey == row.c_nationkey) & (c.c_mktsegment == row.c_mktsegment)]
        counts = g.sens.value_counts().to_numpy().astype(float)
        p = counts / counts.sum()
        ent_l = np.exp(-(p * np.log(p)).sum())
        assert row.n == len(g)
        assert abs(row.entropy_l - np.floor(ent_l * 10000) / 10000) < 2e-4
        # exp(H) never exceeds the distinct count (Jensen), and the
        # recursive test must match the literal definition
        assert row.entropy_l <= len(counts) + 1e-9
        assert row.recursive_ok == (counts.max() < 2.0 * (counts.sum() - counts.max()))
        assert row.entropy_ok == (row.entropy_l >= 2.0)


def test_label_propagation_labels_are_node_ids_and_partition_the_graph(spark):
    got = _run(spark, "graph_label_propagation")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    sp = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    nodes = set((sp.l_partkey + 1_000_000).tolist()) | set(sp.l_suppkey.tolist())
    import hashlib

    keep = np.array(
        [
            int(
                hashlib.md5(str(a * 100_000 + b).encode()).hexdigest()[:15], 16
            )
            % 100
            < 10
            for a, b in zip(sp.l_partkey + 1_000_000, sp.l_suppkey)
        ]
    )
    kept = sp[keep]
    sampled_nodes = set((kept.l_partkey + 1_000_000).tolist()) | set(
        kept.l_suppkey.tolist()
    )
    # every community label is a real node id from the sampled graph
    assert set(got.community).issubset(sampled_nodes)
    # sizes are positive, ranks contiguous from 1, ordering matches contract
    assert (got["size"] > 0).all()
    assert sorted(got.rk) == list(range(1, len(got) + 1))
    srt = got.sort_values("rk")
    pairs = list(zip(-srt["size"], srt.community))
    assert pairs == sorted(pairs)
    # communities cover no more nodes than exist in the sampled graph
    assert got["size"].sum() <= len(sampled_nodes)
    # non-trivial structure: more than one community (measured: 10)
    assert len(got) >= 5


def test_jl_projection_matches_numpy_and_concentrates(spark):
    got = _run(spark, "vec_random_projection").iloc[0]
    import hashlib

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    V = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    S = np.array(
        [
            [
                1.0 if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] < "8" else -1.0
                for i in range(V.shape[1])
            ]
            for j in range(16)
        ]
    )
    Y = V @ S.T
    norm_in = np.linalg.norm(V, axis=1)
    norm_out = np.linalg.norm(Y, axis=1) / 4.0
    r = (norm_out / norm_in)[norm_in > 0]
    assert got.n_vectors == (norm_in > 0).sum()
    assert abs(got.avg_ratio - round(r.mean(), 6)) < 1e-4
    assert abs(got.min_ratio - round(r.min(), 6)) < 1e-4
    assert abs(got.max_ratio - round(r.max(), 6)) < 1e-4
    # the JL concentration promise the audit exists to certify
    assert 0.75 < got.avg_ratio < 1.25
    assert got.stddev_ratio < 0.3


def test_logsketch_quantiles_honor_the_relative_error_bound(spark):
    got = _run(spark, "agg_logsketch_quantiles")
    # the sketch's own contract: two leading digits bound rel error at 5%
    for q in (50, 90, 99):
        assert (got[f"q{q}_relerr"] <= 0.05 + 1e-9).all()
    # numpy re-derivation of the bucket walk for q50
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    li = li[li.l_extendedprice > 0]
    c = np.round(li.l_extendedprice * 100).astype(np.int64)
    df = pd.DataFrame(
        {
            "flag": li.l_returnflag.to_numpy(),
            "d": c.astype(str).str.len().to_numpy(),
            "lead2": c.astype(str).str[:2].astype(int).to_numpy(),
        }
    )
    for flag, g in df.groupby("flag"):
        b = g.groupby(["d", "lead2"]).size().sort_index()
        cum = b.cumsum()
        tot = b.sum()
        (d, lead2) = cum.index[(cum >= 0.5 * tot).argmax()]
        est = (lead2 + 0.5) * 10.0 ** (d - 2) / 100.0
        row = got[got.l_returnflag == flag].iloc[0]
        assert row.n == tot
        assert abs(row.q50_est - est) < 1e-9


def test_bfs_distances_match_pure_python_bfs(spark):
    got = _run(spark, "graph_bfs_distance").set_index("dist").n_nodes
    import hashlib
    from collections import deque

    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    sp = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    adj: dict = {}
    nodes = set()
    for a, b in zip(sp.l_partkey + 1_000_000, sp.l_suppkey):
        if int(hashlib.md5(str(a * 100_000 + b).encode()).hexdigest()[:15], 16) % 100 < 10:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
            nodes |= {a, b}
    seeds = sorted(n for n in nodes if n < 1_000_000)[:3]
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        if dist[u] >= 4:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    ref = pd.Series(list(dist.values())).value_counts().to_dict()
    ref[-1] = len(nodes) - len(dist)
    for d, n in ref.items():
        if n:
            assert got.get(d, 0) == n, (d, n, got.to_dict())
    assert got.sum() == len(nodes)


def test_lift_deciles_monotone_capture_and_real_top_lift(spark):
    got = _run(spark, "ml_lift_deciles").sort_values("bin", ascending=False)
    o = _orders_labeled()
    o["bin"] = np.minimum(9, np.floor(o.o_totalprice / 60000).astype(int))
    b = o.groupby("bin").agg(n=("label", "size"), pos=("label", "sum"))
    b = b.sort_index(ascending=False)
    cum_pos = b.pos.cumsum()
    cum_n = b.n.cumsum()
    overall = b.pos.sum() / b.n.sum()
    cap = np.floor(cum_pos / b.pos.sum() * 10000) / 10000
    lift = np.floor((cum_pos / cum_n) / overall * 10000) / 10000
    assert (got.n.to_numpy() == b.n.to_numpy()).all()
    assert np.allclose(got.capture_rate.to_numpy(), cap.to_numpy(), atol=2e-4)
    assert np.allclose(got.cum_lift.to_numpy(), lift.to_numpy(), atol=2e-4)
    # gains curve is nondecreasing and the top slice beats random by >1.5x
    assert (np.diff(got.capture_rate.to_numpy()) >= -1e-9).all()
    assert got.cum_lift.iloc[0] > 1.5


def test_ipw_removes_the_constructed_confounding_bias(spark):
    got = _run(spark, "ml_ipw_ate").iloc[0]
    import hashlib

    o = _orders_labeled()
    o["bin"] = np.minimum(9, np.floor(o.o_totalprice / 60000).astype(int))
    tdraw = np.array(
        [
            int(hashlib.md5(f"t{k}".encode()).hexdigest()[:15], 16) % 100
            for k in o.o_orderkey
        ]
    )
    t = (tdraw < 20 + 6 * o.bin.to_numpy()).astype(float)
    p = (20 + 6 * o.bin.to_numpy()) / 100.0
    y = o.label.to_numpy().astype(float)
    naive = y[t == 1].mean() - y[t == 0].mean()
    ipw = (t * y / p - (1 - t) * y / (1 - p)).mean()
    hajek = (t * y / p).sum() / (t / p).sum() - ((1 - t) * y / (1 - p)).sum() / (
        (1 - t) / (1 - p)
    ).sum()
    assert got.n == len(o) and got.n_treat == int(t.sum())
    assert abs(got.naive_diff - np.floor(naive * 10000) / 10000) < 2e-4
    assert abs(got.ipw_ate - np.floor(ipw * 10000) / 10000) < 2e-4
    assert abs(got.hajek_ate - np.floor(hajek * 10000) / 10000) < 2e-4
    # the demonstration: naive is visibly biased, IPW/Hajek recover ~0
    assert got.naive_diff > 0.1
    assert abs(got.ipw_ate) < 0.06 and abs(got.hajek_ate) < 0.06


def _norm_sf_ref(z):
    az = np.abs(z)
    t = 1.0 / (1.0 + 0.2316419 * az)
    pdf = np.exp(-az * az / 2) / 2.5066282746310002
    poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t - 0.356563782) * t
            + 0.31938153) * t
    return np.minimum(1.0, 2.0 * pdf * poly)


def test_fdr_bh_matches_numpy_step_up(spark):
    got = _run(spark, "agg_fdr_bh")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = ev.ts.astype("datetime64[us]").astype("int64") // 86_400_000_000
    daily = ev.groupby(["event_type", "d"]).size().astype(float).rename("y").reset_index()
    daily["dow"] = daily.d % 7
    rows = []
    for (typ, dow), g in daily.groupby(["event_type", "dow"]):
        rest = daily[(daily.event_type == typ) & (daily.dow != dow)]
        n1, n2 = len(g), len(rest)
        v1, v2 = g.y.var(ddof=1), rest.y.var(ddof=1)
        z = (g.y.mean() - rest.y.mean()) / np.sqrt(v1 / n1 + v2 / n2)
        rows.append((typ, dow, z, _norm_sf_ref(z)))
    ref = pd.DataFrame(rows, columns=["event_type", "dow", "z", "p"])
    ref = ref.sort_values(["p", "event_type", "dow"]).reset_index(drop=True)
    ref["rk"] = np.arange(1, len(ref) + 1)
    m = len(ref)
    passing = ref.rk[ref.p <= ref.rk * 0.1 / m]
    kmax = passing.max() if len(passing) else 0
    ref["reject"] = ref.rk <= kmax
    merged = got.merge(ref, on=["event_type", "dow"])
    assert len(merged) == m
    assert (merged.p_rank == merged.rk).all()
    assert (merged.reject_fdr10 == merged.reject).all()
    assert np.allclose(merged.p_x, np.floor(merged.p_y * 1e6) / 1e6, atol=2e-6)
    # at the smoke tier the fixture genuinely rejects some hypotheses,
    # so the step-up branch is exercised (measured: 2)
    assert merged.reject_fdr10.sum() >= 1


def test_partition_skew_layout_ordering(spark):
    got = _run(spark, "warehouse_partition_skew").set_index("layout")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    month = (
        li.l_shipdate.astype("datetime64[us]").astype("int64") // 86_400_000_000 // 30
    )
    ref = month.value_counts()
    row = got.loc["ship_month"]
    assert row.n_partitions == len(ref)
    assert row.max_rows == ref.max()
    assert row.n_rows == len(li)
    assert abs(row.skew_factor - np.floor(ref.max() / ref.mean() * 10000) / 10000) < 2e-4
    # every layout's straggler factor is >= 1; the md5 hash layout's CV is
    # within Poisson noise of uniform (cv ~ 1/sqrt(rows per bucket)) — at
    # the 6k-row smoke tier that noise floor is ~0.15, so assert the bound
    # rather than strict minimality (which only emerges at larger tiers)
    assert (got.skew_factor >= 1.0 - 1e-9).all()
    expected_cv = 1.0 / np.sqrt(len(li) / 128)
    assert got.loc["hash_128"].cv < 2.5 * expected_cv


def test_stetson_indices_match_numpy(spark):
    got = _run(spark, "lightcurve_stetson").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0).sort_index()
        n = len(y)
        dl = np.sqrt(n / (n - 1)) * (y - y.mean()) / y.std(ddof=1)
        nxt = dl.reindex(dl.index + 1)
        pk = (dl.to_numpy() * nxt.to_numpy())
        pk = pk[~np.isnan(pk)]
        j = np.mean(np.sign(pk) * np.sqrt(np.abs(pk)))
        k = np.mean(np.abs(dl)) / np.sqrt(np.mean(dl**2))
        row = got.loc[t]
        assert row.n_days == n and row.n_pairs == len(pk)
        assert abs(row.stetson_j - np.floor(j * 10000) / 10000) < 2e-4
        assert abs(row.stetson_k - np.floor(k * 10000) / 10000) < 2e-4
        # K ~ 0.798 for Gaussian residuals; the fixture series are near-iid
        assert 0.6 < row.stetson_k < 0.95


def test_granger_f_matches_numpy_two_var_ols(spark):
    got = _run(spark, "events_granger").set_index("pair")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).size().astype(float)
    for x, ycol in (("view", "purchase"), ("purchase", "view"), ("click", "signup")):
        ys = daily.loc[ycol]
        xs = daily.loc[x]
        rows = []
        for d in ys.index:
            if (d - 1) in ys.index and (d - 1) in xs.index:
                rows.append((ys[d], ys[d - 1], xs[d - 1]))
        w, u, v = (np.array(c) for c in zip(*rows))
        n = len(w)
        # restricted: w ~ u; unrestricted: w ~ u + v (centered OLS)
        X1 = np.column_stack([np.ones(n), u])
        X2 = np.column_stack([np.ones(n), u, v])
        b1, *_ = np.linalg.lstsq(X1, w, rcond=None)
        b2, *_ = np.linalg.lstsq(X2, w, rcond=None)
        rss_r = ((w - X1 @ b1) ** 2).sum()
        rss_u = ((w - X2 @ b2) ** 2).sum()
        f = (rss_r - rss_u) / (rss_u / (n - 3))
        row = got.loc[f"{x}->{ycol}"]
        assert row.n == n
        assert abs(row.rss_restricted - np.floor(rss_r * 10000) / 10000) < 2e-3
        assert abs(row.rss_unrestricted - np.floor(rss_u * 10000) / 10000) < 2e-3
        assert abs(row.f_stat - np.floor(f * 10000) / 10000) < 2e-3
        assert row.f_stat >= -1e-9  # RSS never increases with a regressor


def test_temperature_mixing_weights_and_epochs(spark):
    got = _run(spark, "domain_mix_temperature")
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    d["tok"] = d.text.str.split(" ").str.len()
    c = d.groupby("source").agg(n_docs=("tok", "size"), n_tokens=("tok", "sum"))
    tot, totw = c.n_tokens.sum(), np.sqrt(c.n_tokens).sum()
    m = got.set_index("source").join(c, rsuffix="_ref")
    assert (m.n_docs == m.n_docs_ref).all()
    assert (m.n_tokens == m.n_tokens_ref).all()
    nat = np.floor(m.n_tokens_ref / tot * 1e6) / 1e6
    tmp = np.floor(np.sqrt(m.n_tokens_ref) / totw * 1e6) / 1e6
    assert np.allclose(m.nat_share, nat, atol=2e-6)
    assert np.allclose(m.temp_share, tmp, atol=2e-6)
    # temperature mixing flattens: small domains gain share, large lose
    small, big = m.n_tokens_ref.idxmin(), m.n_tokens_ref.idxmax()
    assert m.loc[small].temp_share > m.loc[small].nat_share
    assert m.loc[big].temp_share < m.loc[big].nat_share
    # epoch accounting: sum over sources of epochs*n_tokens ~= budget
    budget = 2.0 * tot
    assert abs((m.epochs * m.n_tokens_ref).sum() - budget) / budget < 0.01


def test_segment_migration_matrix_is_consistent(spark):
    got = _run(spark, "orders_segment_migration")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    split = pd.Timestamp("1997-07-01")
    per = o.assign(a=o.o_orderdate < split).groupby(["o_custkey", "a"]).o_totalprice.sum()

    def tier(v):
        if pd.isna(v):
            return "none"
        return "low" if v < 200_000 else ("mid" if v < 600_000 else "high")

    custs = o.o_custkey.unique()
    ref: dict = {}
    for ck in custs:
        ta = tier(per.get((ck, True), np.nan))
        tb = tier(per.get((ck, False), np.nan))
        ref[(ta, tb)] = ref.get((ta, tb), 0) + 1
    for _, r in got.iterrows():
        assert ref.get((r.tier_a, r.tier_b), 0) == r.n_customers
    assert got.n_customers.sum() == len(custs)
    # row shares are conditional probabilities: sum to ~1 within tier_a
    for _, g in got.groupby("tier_a"):
        assert abs(g.row_share.sum() - 1.0) < 0.01


def test_price_index_matches_numpy_and_sits_near_null(spark):
    got = _run(spark, "orders_price_index").iloc[0]
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")[["o_orderkey", "o_orderdate"]]
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["period"] = (j.o_orderdate >= pd.Timestamp("1997-07-01")).astype(int)
    j["price"] = j.l_extendedprice / j.l_quantity
    per = j.groupby(["l_partkey", "period"]).apply(
        lambda g: pd.Series(
            {"p": (g.price * g.l_quantity).sum() / g.l_quantity.sum(), "q": g.l_quantity.sum()}
        ),
        include_groups=False,
    )
    a = per.xs(0, level="period").join(per.xs(1, level="period"), lsuffix="0", rsuffix="1", how="inner")
    lasp = (a.p1 * a.q0).sum() / (a.p0 * a.q0).sum()
    paas = (a.p1 * a.q1).sum() / (a.p0 * a.q1).sum()
    assert got.n_parts == len(a)
    assert abs(got.laspeyres - np.floor(lasp * 1e6) / 1e6) < 2e-6
    assert abs(got.paasche - np.floor(paas * 1e6) / 1e6) < 2e-6
    assert abs(got.fisher - np.floor(np.sqrt(lasp * paas) * 1e6) / 1e6) < 2e-6
    # stationary fixture prices: the index family sits near 1
    assert 0.9 < got.fisher < 1.1


def test_trimmed_and_winsorized_means_match_numpy(spark):
    got = _run(spark, "agg_trimmed_mean").set_index("l_linestatus")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    for st, g in li.groupby("l_linestatus"):
        x = g.l_extendedprice.to_numpy()
        lo, hi = np.quantile(x, 0.1), np.quantile(x, 0.9)
        row = got.loc[st]
        keep = (x >= lo) & (x <= hi)
        assert row.n == len(x) and row.n_kept == keep.sum()
        assert abs(row.plain_mean - round(x.mean(), 4)) < 2e-4
        assert abs(row.trimmed_mean - round(x[keep].mean(), 4)) < 2e-4
        assert abs(row.winsorized_mean - round(np.clip(x, lo, hi).mean(), 4)) < 2e-4
        # estimator ordering sanity: all three are interior to the data range
        assert x.min() <= row.trimmed_mean <= x.max()


def test_cluster_validity_metrics_match_sklearn_style_numpy(spark):
    got = _run(spark, "vec_cluster_purity").iloc[0]
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    V = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    seeds = emb[emb.vec_id.between(1, 10)].sort_values("vec_id")
    S = np.stack(seeds.embedding.to_numpy()).astype(np.float64)
    d2 = ((V[:, None, :] - S[None, :, :]) ** 2).sum(axis=2)
    assign = seeds.vec_id.to_numpy()[np.argmin(d2, axis=1)]  # ties: argmin = first
    cont = pd.crosstab(assign, emb.label.to_numpy()).to_numpy().astype(float)
    N = cont.sum()
    purity = cont.max(axis=1).sum() / N
    pc, pl = cont.sum(axis=1) / N, cont.sum(axis=0) / N
    pij = cont / N
    with np.errstate(divide="ignore", invalid="ignore"):
        mi = np.nansum(pij * np.log(pij / np.outer(pc, pl)))
    hc = -(pc[pc > 0] * np.log(pc[pc > 0])).sum()
    hl = -(pl[pl > 0] * np.log(pl[pl > 0])).sum()
    nmi = 2 * mi / (hc + hl)
    comb2 = lambda x: x * (x - 1) / 2  # noqa: E731
    sij = comb2(cont).sum()
    si, sj = comb2(cont.sum(axis=1)).sum(), comb2(cont.sum(axis=0)).sum()
    exp = si * sj / comb2(N)
    ari = (sij - exp) / ((si + sj) / 2 - exp)
    assert got.n_vectors == int(N)
    assert abs(got.purity - np.floor(purity * 10000) / 10000) < 2e-4
    assert abs(got.nmi - np.floor(nmi * 10000) / 10000) < 2e-4
    assert abs(got.ari - np.floor(ari * 10000) / 10000) < 2e-4
    # fixture labels are independent of geometry: ARI ~ 0 while purity > 1/k
    assert abs(got.ari) < 0.1 and got.purity > 0.1


def test_rebin_conserves_flux_and_matches_numpy(spark):
    got = _run(spark, "ts_rebin_flux")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0)
        ref: dict = {}
        for d, v in y.items():
            for k in range((2 * d) // 5, (2 * (d + 1)) // 5 + 1):
                ov = min(d + 1, 2.5 * (k + 1)) - max(d, 2.5 * k)
                if ov > 0:
                    ref[k] = ref.get(k, 0.0) + ov * v
        sub = got[got.event_type == t].set_index("bin_id")
        assert set(sub.index) == set(ref)
        for k, fx in ref.items():
            assert abs(sub.loc[k].flux - round(fx, 4)) < 2e-4
            assert sub.loc[k].bin_start == 2.5 * k
        # flux conservation: total in = total out (the operator's contract)
        assert abs(sub.flux.sum() - y.sum()) < 1e-2
        # interior bins cover exactly 2.5 days
        interior = sub.iloc[1:-1] if len(sub) > 2 else sub
        assert np.allclose(interior.coverage_days, 2.5, atol=1e-9)


def test_nprobe_sweep_recall_is_monotone_and_bounded(spark):
    got = _run(spark, "sim_ann_nprobe_sweep").sort_values("nprobe")
    assert list(got.nprobe) == [1, 2, 4]
    assert (got.n_queries == 5).all()
    # recall and scanned fraction both rise monotonically with nprobe
    assert (np.diff(got.recall_at_10.to_numpy()) >= -1e-9).all()
    assert (np.diff(got.cand_frac.to_numpy()) > 0).all()
    assert ((got.recall_at_10 >= 0) & (got.recall_at_10 <= 1)).all()
    # probing p of 10 roughly-balanced cells scans ~p/10 of the corpus
    assert np.allclose(got.cand_frac, got.nprobe / 10, atol=0.1)
    # numpy re-derivation of the nprobe=1 leg end-to-end
    import hashlib  # noqa: F401  (parity with sibling tests)

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    V = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    ids = emb.vec_id.to_numpy()
    seeds_mask = (ids >= 1) & (ids <= 10)
    S, sid = V[seeds_mask], ids[seeds_mask]
    order = np.argsort(sid)
    S, sid = S[order], sid[order]
    d2 = ((V[:, None, :] - S[None, :, :]) ** 2).sum(axis=2)
    cell = sid[np.argmin(d2, axis=1)]
    recalls = []
    for q in range(11, 16):
        qi = np.where(ids == q)[0][0]
        cosall = (V @ V[qi]) / (np.linalg.norm(V, axis=1) * np.linalg.norm(V[qi]))
        mask = ids != q
        order_t = sorted(zip(-cosall[mask], ids[mask]))[:10]
        truth = {int(i) for _, i in order_t}
        qcell = sid[np.argsort(d2[qi])[0]]
        cmask = mask & (cell == qcell)
        order_c = sorted(zip(-cosall[cmask], ids[cmask]))[:10]
        got_ids = {int(i) for _, i in order_c}
        recalls.append(len(truth & got_ids) / 10)
    ref = np.floor(np.mean(recalls) * 10000) / 10000
    assert abs(got[got.nprobe == 1].recall_at_10.iloc[0] - ref) < 2e-4


def test_bls_matches_numpy_fold_and_is_bounded(spark):
    got = _run(spark, "lightcurve_bls")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0)
        yc = (y - y.mean()).to_numpy()
        d = y.index.to_numpy()
        s2 = (yc**2).sum()
        n = len(yc)
        for p in range(3, 11):
            best = None
            for b in range(p):
                m = (d % p) == b
                nb = m.sum()
                if nb == 0 or nb == n:
                    continue
                pw = yc[m].sum() ** 2 / (nb * (1 - nb / n)) / s2
                if best is None or pw > best[0] + 1e-15:
                    best = (pw, b)
            row = got[(got.event_type == t) & (got.period == p)].iloc[0]
            assert row.best_phase == best[1]
            assert abs(row.bls_power - np.floor(best[0] * 10000) / 10000) < 2e-4
            assert 0.0 <= row.bls_power <= 1.0  # normalized signal residue


def test_circular_stats_match_numpy_and_sit_near_uniform(spark):
    got = _run(spark, "events_circular_stats").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["theta"] = 2 * np.pi * ev.ts.dt.hour / 24
    for t, g in ev.groupby("event_type"):
        c, sn = np.cos(g.theta).sum(), np.sin(g.theta).sum()
        n = len(g)
        r = np.sqrt(c * c + sn * sn) / n
        raw = np.arctan2(sn, c) + 2 * np.pi
        mean_hour = (raw - 2 * np.pi * np.floor(raw / (2 * np.pi))) * 24 / (2 * np.pi)
        z = n * r * r
        row = got.loc[t]
        assert row.n == n
        assert abs(row.resultant_r - np.floor(r * 1e5) / 1e5) < 2e-5
        assert abs(row.mean_hour - np.floor(mean_hour * 1000) / 1000) < 2e-3
        assert abs(row.rayleigh_z - np.floor(z * 1000) / 1000) < 2e-3
        assert 0 <= row.mean_hour < 24
        # the fixture stream is clock-uniform: R near 0 is the calibrated null
        assert row.resultant_r < 0.2


def test_paired_ttest_matches_numpy_within_subject_design(spark):
    got = _run(spark, "agg_paired_ttest").set_index("c_mktsegment")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j.o_totalprice * 100).astype(np.int64)
    j["pre"] = j.o_orderdate < pd.Timestamp("1997-07-01")
    per = j.groupby(["c_mktsegment", "o_custkey"]).apply(
        lambda g: pd.Series(
            {
                "a": g.cents[g.pre].sum(),
                "b": g.cents[~g.pre].sum(),
                "paired": g.pre.any() and (~g.pre).any(),
            }
        ),
        include_groups=False,
    )
    per = per[per.paired]
    for seg, g in per.groupby(level=0):
        d = (g.b - g.a).to_numpy().astype(np.float64)
        n = len(d)
        t = d.mean() / (d.std(ddof=1) / np.sqrt(n))
        row = got.loc[seg]
        assert row.n_pairs == n
        # mean_delta is exact integer-cent arithmetic back in currency units
        assert abs(row.mean_delta - np.floor(d.sum() * 100.0 / n) / 10000) < 1e-9
        assert abs(row.t_stat - np.floor(t * 10000) / 10000) < 2e-4


def test_max_drawdown_matches_numpy(spark):
    got = _run(spark, "events_max_drawdown").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0).sort_index()
        c = y.cumsum().to_numpy()
        peak = np.maximum.accumulate(c)
        dd = peak - c
        row = got.loc[t]
        assert row.n_days == len(c)
        assert abs(row.max_drawdown - round(dd.max(), 4)) < 2e-4
        frac = np.where(peak > 0, dd / peak, 0.0).max()
        assert abs(row.max_drawdown_frac - round(frac, 6)) < 2e-6
        assert row.trough_day == y.index.to_numpy()[np.argmax(dd)]
        assert row.max_drawdown >= 0


def test_mann_kendall_matches_numpy_pair_counting(spark):
    got = _run(spark, "events_mann_kendall").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0).sort_index().to_numpy()
        n = len(y)
        S = int(np.sign(y[None, :] - y[:, None])[np.triu_indices(n, 1)].sum())
        npairs = n * (n - 1) // 2
        corr = S - 1 if S > 0 else (S + 1 if S < 0 else 0)
        z = corr / np.sqrt(n * (n - 1) * (2 * n + 5) / 18)
        row = got.loc[t]
        assert row.s_stat == S and row.n_days == n
        assert abs(row.kendall_tau - np.floor(S / npairs * 10000) / 10000) < 2e-4
        assert abs(row.z_stat - np.floor(z * 10000) / 10000) < 2e-4
        assert -1 <= row.kendall_tau <= 1


def test_dup_invoices_match_brute_force_pairs(spark):
    got = _run(spark, "orders_dup_invoices")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    ref = set()
    for _, g in o.groupby("o_custkey"):
        arr = g[["o_orderkey", "o_totalprice", "o_orderdate"]].to_numpy()
        for i in range(len(arr)):
            for j in range(i + 1, len(arr)):
                ka, pa, da = arr[i]
                kb, pb, db = arr[j]
                if ka > kb:
                    ka, pa, da, kb, pb, db = kb, pb, db, ka, pa, da
                if abs(pa - pb) <= 2500.0 and abs((da - db).days) <= 90:
                    ref.add((int(ka), int(kb)))
    assert set(zip(got.okey_a, got.okey_b)) == ref
    assert (got.price_diff <= 2500.0).all()
    assert (got.day_gap <= 90).all()
    assert len(got) >= 1  # non-vacuous at the smoke tier (measured: 6)


def test_energy_distance_matches_numpy_and_sits_near_null(spark):
    got = _run(spark, "vec_energy_distance").iloc[0]
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")

    def grp(lbl):
        g = emb[emb.label == lbl].sort_values("vec_id").head(500)
        return np.stack(g.embedding.to_numpy()).astype(np.float64)

    X, Y = grp(0), grp(1)

    def pdist(A, B):
        return np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(axis=2))

    exy = pdist(X, Y).mean()
    dxx = pdist(X, X)
    exx = dxx[np.triu_indices(len(X), 1)].mean()
    dyy = pdist(Y, Y)
    eyy = dyy[np.triu_indices(len(Y), 1)].mean()
    ed = 2 * exy - exx - eyy
    assert got.n_xy == len(X) * len(Y)
    assert abs(got.mean_cross_dist - np.floor(exy * 10000) / 10000) < 2e-4
    assert abs(got.mean_within_a - np.floor(exx * 10000) / 10000) < 2e-4
    assert abs(got.mean_within_b - np.floor(eyy * 10000) / 10000) < 2e-4
    assert abs(got.energy_distance - np.floor(ed * 100000) / 100000) < 2e-5
    # same-distribution labels: E near 0 relative to the distance scale
    assert abs(got.energy_distance) < 0.05 * got.mean_cross_dist


def test_jackknife_ratio_se_matches_numpy_loo(spark):
    got = _run(spark, "agg_jackknife_ratio_se").set_index("c_mktsegment")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j.o_totalprice * 100).astype(np.int64)
    per = j.groupby(["c_mktsegment", "o_custkey"]).agg(
        a=("cents", "sum"), b=("cents", "size")
    )
    for seg, g in per.groupby(level=0):
        sa, sb, n = g.a.sum(), g.b.sum(), len(g)
        loo = (sa - g.a.to_numpy()) / (sb - g.b.to_numpy()) / 100.0
        se = np.sqrt((n - 1) / n * ((loo - loo.mean()) ** 2).sum())
        row = got.loc[seg]
        assert row.n_customers == n
        assert abs(row.revenue_per_order - np.floor(sa / sb / 100 * 10000) / 10000) < 2e-4
        assert abs(row.jackknife_se - np.floor(se * 10000) / 10000) < 2e-3
        assert row.jackknife_se > 0


def test_cohens_kappa_matches_numpy(spark):
    got = _run(spark, "agg_cohens_kappa").iloc[0]
    o = _orders_labeled()
    rule = (o.o_totalprice > 300_000).astype(int).to_numpy()
    lab = o.label.to_numpy()
    n = len(o)
    po = (rule == lab).mean()
    p1r, p1l = rule.mean(), lab.mean()
    pe = p1r * p1l + (1 - p1r) * (1 - p1l)
    kappa = (po - pe) / (1 - pe)
    assert got.n == n
    assert abs(got.observed_agreement - np.floor(po * 10000) / 10000) < 2e-4
    assert abs(got.chance_agreement - np.floor(pe * 10000) / 10000) < 2e-4
    assert abs(got.kappa - np.floor(kappa * 10000) / 10000) < 2e-4
    # far above chance, far below perfect: both raw-agreement failure
    # modes visible
    assert 0.3 < got.kappa < 0.95


def test_js_divergence_matches_numpy_and_is_small_for_same_distribution(spark):
    got = _run(spark, "text_js_divergence")
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    counts = {}
    for src in ("src0", "src1", "src2"):
        words = " ".join(d[d.source == src].text).split(" ")
        counts[src] = pd.Series(words).value_counts()
    vocab = sorted(set().union(*[set(c.index) for c in
                                 (pd.Series(" ".join(d.text).split(" ")).value_counts(),)]))
    v = len(vocab)
    for _, row in got.iterrows():
        ca = counts[row.src_a].reindex(vocab).fillna(0).to_numpy()
        cb = counts[row.src_b].reindex(vocab).fillna(0).to_numpy()
        pa = (ca + 0.5) / (ca.sum() + 0.5 * v)
        pb = (cb + 0.5) / (cb.sum() + 0.5 * v)
        m = (pa + pb) / 2
        jsd = ((pa * np.log(pa / m)).sum() + (pb * np.log(pb / m)).sum()) / 2 / np.log(2)
        assert abs(row.jsd_bits - np.floor(jsd * 1e6) / 1e6) < 2e-6
        # same underlying vocabulary: the calibrated same-distribution floor
        assert 0 <= row.jsd_bits < 0.05


def test_bollinger_bands_match_pandas_rolling(spark):
    got = _run(spark, "events_bollinger")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    daily = ev.groupby(["event_type", "d"]).cents.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0).sort_index()
        ma = y.rolling(7).mean() / 100.0
        sd = y.rolling(7).std(ddof=1) / 100.0
        v = y / 100.0
        sub = got[got.event_type == t].set_index("d").sort_index()
        full = ma.dropna().index
        assert set(sub.index) == set(full)
        for d_ in full:
            assert abs(sub.loc[d_].ma - np.floor(ma[d_] * 10000) / 10000) < 2e-4
            assert abs(
                sub.loc[d_].upper_band
                - np.floor((ma[d_] + 2 * sd[d_]) * 10000) / 10000
            ) < 2e-4
            ref_flag = (
                1 if v[d_] > ma[d_] + 2 * sd[d_]
                else (-1 if v[d_] < ma[d_] - 2 * sd[d_] else 0)
            )
            assert sub.loc[d_].breakout == ref_flag


def test_extreme_value_gumbel_fit_matches_numpy(spark):
    got = _run(spark, "events_extreme_value").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    daily = ev.groupby(["event_type", "d"]).cents.sum().reset_index()
    daily["blk"] = daily.d // 7
    for t, g in daily.groupby("event_type"):
        mx = g.groupby("blk").cents.max().to_numpy().astype(np.float64)
        m, sd = mx.mean() / 100, mx.std(ddof=1) / 100
        beta = sd * np.sqrt(6.0) / np.pi
        mu = m - 0.5772156649015329 * beta
        rl = mu - beta * np.log(-np.log(1 - 1 / 52))
        row = got.loc[t]
        assert row.n_blocks == len(mx)
        assert abs(row.mean_block_max - np.floor(m * 10000) / 10000) < 2e-4
        assert abs(row.gumbel_beta - np.floor(beta * 10000) / 10000) < 2e-4
        assert abs(row.gumbel_mu - np.floor(mu * 10000) / 10000) < 2e-4
        assert abs(row.return_level_52 - np.floor(rl * 10000) / 10000) < 2e-4
        # the return level extrapolates BEYOND the sample maximum
        assert row.return_level_52 > mx.max() / 100


def test_burrows_delta_matches_numpy_stylometry(spark):
    got = _run(spark, "text_burrows_delta")
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    tok = d.assign(w=d.text.str.split(" ")).explode("w")
    counts = tok.groupby(["source", "w"]).size().astype(float)
    overall = counts.groupby(level=1).sum().sort_values(ascending=False)
    top = sorted(overall.index[:20], key=lambda w: (-overall[w], w))
    top = pd.Series(overall[top]).sort_values(ascending=False).index.tolist()
    totals = counts.groupby(level=0).sum()
    sources = totals.index.tolist()
    F_ = pd.DataFrame(
        {
            w: [counts.get((s, w), 0.0) / totals[s] for s in sources]
            for w in top
        },
        index=sources,
    )
    Z = (F_ - F_.mean()) / F_.std(ddof=1)
    for _, row in got.iterrows():
        delta = (Z.loc[row.src_a] - Z.loc[row.src_b]).abs().mean()
        assert row.n_words == 20
        assert abs(row.burrows_delta - np.floor(delta * 10000) / 10000) < 2e-4
        # one generator wrote every source: same-style floor
        assert row.burrows_delta < 2.0


def test_runs_test_matches_pure_python_run_counting(spark):
    got = _run(spark, "events_runs_test").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    daily = ev.groupby(["event_type", "d"]).cents.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0).sort_index().astype(float)
        md = np.quantile(y, 0.5)
        signs = [1 if v > md else 0 for v in y if v != md]
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        n1, n2 = sum(signs), len(signs) - sum(signs)
        er = 2 * n1 * n2 / (n1 + n2) + 1
        vr = (
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        z = (runs - er) / np.sqrt(vr)
        row = got.loc[t]
        assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
        assert abs(row.expected_runs - np.floor(er * 10000) / 10000) < 2e-4
        assert abs(row.z_stat - np.floor(z * 10000) / 10000) < 2e-4


def test_revenue_waterfall_steps_reconcile(spark):
    got = _run(spark, "orders_revenue_waterfall")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    for _, row in got.iterrows():
        g = li[li.l_returnflag == row.l_returnflag]
        assert row.n_lines == len(g)
        assert abs(row.gross - np.round(g.l_extendedprice * 100).sum() / 100) < 1e-6
        assert abs(row.discount_amt - round((g.l_extendedprice * g.l_discount).sum(), 2)) < 2e-2
        # the waterfall reconciles: gross - discount = net, net + tax = charged
        assert abs(row.gross - row.discount_amt - row.net_of_disc) < 0.05
        assert abs(row.net_of_disc + row.tax_amt - row.charged) < 0.05
        assert 0 < row.effective_discount_rate < 0.2


def test_hodges_lehmann_matches_numpy_walsh_median(spark):
    got = _run(spark, "agg_hodges_lehmann").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    daily = ev.groupby(["event_type", "d"]).cents.sum()
    for t, s in daily.groupby(level=0):
        y = s.droplevel(0).to_numpy()
        walsh = (y[:, None] + y[None, :])[np.triu_indices(len(y))] / 200.0
        hl = np.quantile(walsh, 0.5)
        row = got.loc[t]
        assert row.n_walsh == len(y) * (len(y) + 1) // 2
        assert abs(row.hodges_lehmann - np.floor(hl * 10000) / 10000) < 2e-4
        assert abs(row.plain_median - np.floor(np.quantile(y / 100, 0.5) * 10000) / 10000) < 2e-4
        # HL lies between (or at) the classic location estimators' hull
        lo = min(row.plain_median, row.plain_mean) - 50
        hi = max(row.plain_median, row.plain_mean) + 50
        assert lo <= row.hodges_lehmann <= hi


def test_wilcoxon_matches_scipy_style_numpy(spark):
    got = _run(spark, "agg_wilcoxon_signed_rank").set_index("c_mktsegment")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j.o_totalprice * 100).astype(np.int64)
    j["pre"] = j.o_orderdate < pd.Timestamp("1997-07-01")
    for seg, g in j.groupby("c_mktsegment"):
        per = g.groupby("o_custkey").apply(
            lambda x: pd.Series(
                {
                    "a": x.cents[x.pre].sum(),
                    "b": x.cents[~x.pre].sum(),
                    "paired": x.pre.any() and (~x.pre).any(),
                }
            ),
            include_groups=False,
        )
        d = (per.b - per.a)[per.paired.astype(bool)]
        d = d[d != 0].to_numpy().astype(float)
        ad = np.abs(d)
        order = np.argsort(ad, kind="stable")
        ranks = np.empty(len(ad))
        sorted_ad = ad[order]
        i = 0
        while i < len(sorted_ad):
            jx = i
            while jx + 1 < len(sorted_ad) and sorted_ad[jx + 1] == sorted_ad[i]:
                jx += 1
            ranks[order[i : jx + 1]] = (i + jx) / 2 + 1
            i = jx + 1
        n = len(d)
        wp = ranks[d > 0].sum()
        ez = n * (n + 1) / 4
        vz = n * (n + 1) * (2 * n + 1) / 24
        z = (wp - ez) / np.sqrt(vz)
        row = got.loc[seg]
        assert row.n_nonzero == n
        assert abs(row.w_plus - np.floor(wp * 100) / 100) < 2e-2
        assert abs(row.z_stat - np.floor(z * 10000) / 10000) < 2e-4


def test_mann_whitney_matches_brute_force_on_quantized_prices(spark):
    got = _run(spark, "agg_mann_whitney").iloc[0]
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    o = o[o.o_orderstatus.isin(["O", "F"])]
    b = np.floor(o.o_totalprice / 500).astype(int)
    x = b[o.o_orderstatus == "O"].to_numpy()
    y = b[o.o_orderstatus == "F"].to_numpy()
    wins = (x[:, None] > y[None, :]).sum()
    ties = (x[:, None] == y[None, :]).sum()
    u = wins + 0.5 * ties
    n1, n2 = len(x), len(y)
    z = (u - n1 * n2 / 2) / np.sqrt(n1 * n2 * (n1 + n2 + 1) / 12)
    assert (got.n_open, got.n_filled) == (n1, n2)
    assert abs(got.u_stat - np.floor(u * 10) / 10) < 0.2
    assert abs(got.z_stat - np.floor(z * 10000) / 10000) < 2e-4
    # price independent of status: a true null
    assert abs(got.z_stat) < 3.0


def test_sprt_walk_matches_numpy_and_visits_multiple_states(spark):
    got = _run(spark, "ml_sprt_monitor").sort_values("period")
    o = _orders_labeled()
    o["t"] = (o.o_orderdate - pd.Timestamp("1995-01-01")).dt.days // 30
    g = o.groupby("t").label.agg(["sum", "count"]).sort_index()
    cs = g["sum"].cumsum().to_numpy()
    cf = (g["count"] - g["sum"]).cumsum().to_numpy()
    la, lb = np.log(0.52 / 0.48), np.log(0.48 / 0.52)
    llr = cs * la + cf * lb
    up = np.log((1 - 0.2) / 0.05)
    lo = np.log(0.2 / (1 - 0.05))
    assert (got.conversions.to_numpy() == cs).all()
    assert np.allclose(got.llr, np.floor(llr * 10000) / 10000, atol=2e-4)
    ref = np.where(llr >= up, "accept_h1", np.where(llr <= lo, "accept_h0", "continue"))
    assert (got.decision.to_numpy() == ref).all()
    # the between-hypotheses truth makes the walk genuinely wander
    assert len(set(got.decision)) >= 2


def test_confusion_matrix_matches_numpy_at_each_threshold(spark):
    got = _run(spark, "ml_confusion_matrix").set_index("threshold").sort_index()
    o = _orders_labeled()
    o["score"] = 1.0 / (1.0 + np.exp(-(o.o_totalprice - 200000.0) / 80000.0))
    for th in (0.25, 0.5, 0.75):
        pred = (o.score >= th).to_numpy()
        lab = o.label.to_numpy().astype(bool)
        tp = int((pred & lab).sum())
        fp = int((pred & ~lab).sum())
        fn = int((~pred & lab).sum())
        tn = int((~pred & ~lab).sum())
        row = got.loc[th]
        assert (row.tp, row.fp, row.fn, row.tn) == (tp, fp, fn, tn)
        assert abs(row.precision_ - tp / (tp + fp)) < 2e-6
        assert abs(row.recall_ - tp / (tp + fn)) < 2e-6
        assert abs(row.f1 - 2 * tp / (2 * tp + fp + fn)) < 2e-6
    # raising the threshold must trade recall for precision on this model
    assert got.loc[0.75].precision_ > got.loc[0.25].precision_
    assert got.loc[0.75].recall_ < got.loc[0.25].recall_


def test_decision_stump_finds_the_brute_force_best_split(spark):
    got = _run(spark, "ml_decision_stump").sort_values("threshold")
    o = _orders_labeled()
    o["bucket"] = np.floor(o.o_totalprice / 25000).astype(int)

    def gini(p, n):
        t = p + n
        return 1 - (p / t) ** 2 - (n / t) ** 2

    P, N = int(o.label.sum()), int((1 - o.label).sum())
    best, rows = None, {}
    for b in sorted(o.bucket.unique())[:-1]:
        left = o[o.bucket <= b]
        lp, ln_ = int(left.label.sum()), len(left) - int(left.label.sum())
        rp, rn = P - lp, N - ln_
        wg = (lp + ln_) / (P + N) * gini(lp, ln_) + (rp + rn) / (P + N) * gini(rp, rn)
        rows[(b + 1) * 25000] = (lp + ln_, rp + rn, lp, rp, wg)
        if best is None or wg < best[1]:
            best = ((b + 1) * 25000, wg)
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        nl, nr, lp, rp, wg = rows[r.threshold]
        assert (r.n_left, r.n_right, r.pos_left, r.pos_right) == (nl, nr, lp, rp)
        assert abs(r.gini_split - wg) < 2e-6
    assert int(got[got.is_best == 1].threshold.iloc[0]) == best[0]
    # the label ramps in price, so the best split must sit inside the ramp
    assert 100_000 < best[0] < 500_000


def test_naive_bayes_confusion_matches_pandas_reimplementation(spark):
    got = _run(spark, "ml_naive_bayes")
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    d["is_test"] = _md5_noise(d.doc_id.to_numpy(), 5) == 0
    d["toks"] = d.text.str.split(" ").map(lambda t: [x for x in t if x])
    tr = d[~d.is_test].explode("toks")
    cnt = tr.groupby(["lang", "toks"]).size()
    tot = tr.groupby("lang").size().astype(float)
    V = float(tr.toks.nunique())
    langs = ["de", "en", "es", "fr", "zh"]
    pri = np.log(d[~d.is_test].groupby("lang").size() / (~d.is_test).sum()).round(6)
    preds = {}
    for _, doc in d[d.is_test].iterrows():
        tf = pd.Series(doc.toks).value_counts().sort_index()
        scores = {}
        for c in langs:
            ll = np.array(
                [
                    round(
                        np.log(
                            (cnt.get((c, t), 0) + 1.0) / (tot[c] + V)
                        ),
                        6,
                    )
                    for t in tf.index
                ]
            )
            s = pri[c]
            for w, l in zip(tf.to_numpy(), ll):  # sequential fold, token order
                s += w * l
            scores[c] = s
        # first class (ascending) whose score >= all later classes
        pred = langs[-1]
        for i, c in enumerate(langs[:-1]):
            if all(scores[c] >= scores[o] for o in langs[i + 1 :]):
                pred = c
                break
        preds[doc.doc_id] = (doc.lang, pred)
    ref = pd.DataFrame(
        [(t, p) for t, p in preds.values()], columns=["true_lang", "pred_lang"]
    ).value_counts()
    assert int(got.n_docs.sum()) == int(d.is_test.sum())
    for _, r in got.iterrows():
        assert ref.get((r.true_lang, r.pred_lang), 0) == r.n_docs
    # true-null fixture: the majority prior must dominate the predictions
    en_share = got[got.pred_lang == "en"].n_docs.sum() / got.n_docs.sum()
    assert en_share > 0.5


SF_MID = "/root/testdata/sf0.01"


def test_hits_matches_numpy_power_iteration(spark):
    got = all_queries()["graph_hits"](spark, SF_MID).toPandas()
    li = pd.read_parquet(f"{SF_MID}/lineitem.parquet")
    edges = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    sups = np.sort(edges.l_suppkey.unique())
    pars = np.sort(edges.l_partkey.unique())
    si = {s: i for i, s in enumerate(sups)}
    pi = {p: i for i, p in enumerate(pars)}
    E = np.zeros((len(sups), len(pars)))
    for s, p in edges.itertuples(index=False):
        E[si[s], pi[p]] = 1.0
    h = np.ones(len(sups))
    for _ in range(3):
        # sum over edges of h == sum of the raw authority vector, so the
        # mean-1 rescale divides by the vector sum
        a = E.T @ h
        a = a * len(pars) / a.sum()
        h = E @ a
        h = h * len(sups) / h.sum()
    ref_h = pd.Series(h, index=sups).sort_values(ascending=False)
    ref_a = pd.Series(a, index=pars).sort_values(ascending=False)
    gh = got[got.node_type == "hub"].set_index("node_id").score
    ga = got[got.node_type == "authority"].set_index("node_id").score
    assert len(gh) == 10 and len(ga) == 10
    for nid, sc in gh.items():
        assert abs(sc - ref_h[nid]) < 1e-4
    for nid, sc in ga.items():
        assert abs(sc - ref_a[nid]) < 1e-4
    # top hub/authority by score must agree with the dense reference
    assert abs(gh.max() - ref_h.iloc[0]) < 1e-4
    assert abs(ga.max() - ref_a.iloc[0]) < 1e-4


def test_clustering_coeff_matches_brute_force(spark):
    got = all_queries()["graph_clustering_coeff"](spark, SF_MID).toPandas()
    li = pd.read_parquet(f"{SF_MID}/lineitem.parquet")
    ps = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    from collections import defaultdict

    by_part = defaultdict(set)
    for p, s in ps.itertuples(index=False):
        by_part[p].add(s)
    pair_count = defaultdict(int)
    for members in by_part.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pair_count[(ms[i], ms[j])] += 1
    thr = float(np.quantile(np.array(list(pair_count.values()), dtype=float), 0.99))
    adj = defaultdict(set)
    for (u, v), c in pair_count.items():
        if c >= thr:
            adj[u].add(v)
            adj[v].add(u)
    ref = {}
    for node, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(
            1
            for u in nbrs
            for v in nbrs
            if u < v and v in adj[u]
        )
        ref[node] = (d, tri, 2 * tri / (d * (d - 1)) if d >= 2 else 0.0)
    for _, r in got.iterrows():
        d, tri, cc = ref[r.node]
        assert (r.degree, r.n_triangles) == (d, tri)
        assert abs(r.local_cc - cc) < 2e-6
    tot_tri = sum(t for _, t, _ in ref.values()) / 3
    wedges = sum(d * (d - 1) / 2 for d, _, _ in ref.values())
    assert abs(got.transitivity.iloc[0] - 3 * tot_tri / wedges) < 2e-6


def test_t_closeness_matches_pandas_emd(spark):
    got = _run(spark, "privacy_t_closeness")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    c["tier"] = np.where(c.c_acctbal < 0, 0, np.where(c.c_acctbal < 5000, 1, 2))
    gq = np.array([(c.tier == i).mean() for i in range(3)])
    for _, r in got.iterrows():
        g = c[(c.c_nationkey == r.c_nationkey) & (c.c_mktsegment == r.c_mktsegment)]
        p = np.array([(g.tier == i).mean() for i in range(3)])
        cum = np.cumsum(p - gq)
        t = (abs(cum[0]) + abs(cum[1])) / 2
        assert r.group_size == len(g)
        assert abs(r.t_closeness - t) < 2e-6
        assert bool(r.t_violation) == (t > 0.2)
    # the fixture must exercise both flag branches
    assert got.t_violation.any() and (~got.t_violation).any()


def test_column_stats_match_numpy(spark):
    got = _run(spark, "warehouse_column_stats").set_index("col_name")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        v = li[c].to_numpy(dtype=float)
        r = got.loc[c]
        assert r.n == len(v) and r.n_null == 0
        assert r.ndv == len(np.unique(v))
        assert abs(r.min_val - v.min()) < 1e-9
        assert abs(r.max_val - v.max()) < 1e-9
        assert abs(r.avg_val - round(v.mean(), 4)) < 2e-4
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
            assert abs(r[col] - np.quantile(v, q, method="linear")) < 1e-4


def test_ar_aging_matches_pandas(spark):
    got = _run(spark, "orders_ar_aging")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    o = o[o.o_orderstatus != "F"].merge(
        c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey"
    )
    age = (pd.Timestamp("2001-08-01") - o.o_orderdate.dt.normalize()).dt.days
    o["bucket"] = np.select(
        [age <= 90, age <= 365, age <= 730], ["0-90", "91-365", "366-730"], ">730"
    )
    ref = o.groupby(["c_mktsegment", "bucket"]).agg(
        n=("o_totalprice", "size"), bal=("o_totalprice", "sum")
    )
    seg = o.groupby("c_mktsegment").o_totalprice.sum()
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        n, bal = ref.loc[(r.c_mktsegment, r.bucket)]
        assert r.n_invoices == n
        assert abs(r.balance - round(bal, 2)) < 0.02
        assert abs(r.segment_share - bal / seg[r.c_mktsegment]) < 2e-6
    shares = got.groupby("c_mktsegment").segment_share.sum()
    assert ((shares - 1).abs() < 1e-4).all()


def test_knn_classify_recovers_constructed_voronoi_label(spark):
    import hashlib

    got = _run(spark, "ml_knn_classify")
    e = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array([np.array(v) for v in e.embedding])

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    P = np.array(
        [[(h(f"{c}#{j}") % 2001 - 1000) / 1000.0 for j in range(64)] for c in range(10)]
    )
    dots = np.round(X @ P.T, 6)
    lab = np.array(
        [min(range(10), key=lambda c: (-dots[i, c], c)) for i in range(len(X))]
    )
    is_test = _md5_noise(e.vec_id.to_numpy(), 10) == 0
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn[is_test] @ Xn[~is_test].T
    train_ids = e.vec_id.to_numpy()[~is_test]
    train_lab = lab[~is_test]
    correct = total = 0
    conf = {}
    for i in range(S.shape[0]):
        order = sorted(range(S.shape[1]), key=lambda j: (-S[i, j], train_ids[j]))[:5]
        votes = {}
        for j in order:
            votes[train_lab[j]] = votes.get(train_lab[j], 0) + 1
        p = min(votes, key=lambda k: (-votes[k], k))
        t = lab[is_test][i]
        conf[(t, p)] = conf.get((t, p), 0) + 1
        correct += p == t
        total += 1
    for _, r in got.iterrows():
        assert conf.get((r.true_lab, r.pred_lab), 0) == r.n
    assert got.n.sum() == total
    # the constructed label carries real signal: well above the 10% chance
    # floor (measured 0.26 at sf0.001 — 64-dim kNN from 450 train points;
    # the fixture's RAW label scores exactly chance, 0.106)
    acc = got[got.true_lab == got.pred_lab].n.sum() / got.n.sum()
    assert acc > 0.2 and abs(acc - correct / total) < 1e-9


def test_ridge_regression_matches_numpy_closed_form(spark):
    got = _run(spark, "ml_ridge_regression").iloc[0]
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    per = li.groupby("l_orderkey").agg(
        x1=("l_quantity", "size"),
        x2=("l_quantity", "sum"),
    )
    per["y"] = li.assign(rev=li.l_extendedprice * (1 - li.l_discount)).groupby(
        "l_orderkey"
    ).rev.sum()
    X = per[["x1", "x2"]].to_numpy(dtype=float)
    y = per.y.to_numpy(dtype=float)
    n = len(y)
    mu, sd = X.mean(0), X.std(0)
    Z = (X - mu) / sd
    zy = y - y.mean()
    A = Z.T @ Z / n + np.eye(2) * (1.0 / n)
    b = Z.T @ zy / n
    bs = np.linalg.solve(A, b)
    beta = bs / sd
    pred = y.mean() + Z @ bs
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert got.n == n
    assert abs(got.beta_lines - beta[0]) < 1e-4
    assert abs(got.beta_qty - beta[1]) < 1e-4
    assert abs(got.intercept - (y.mean() - beta @ mu)) < 1e-2
    assert abs(got.r2 - r2) < 1e-4
    assert abs(got.importance_lines + got.importance_qty - 1.0) < 2e-6
    # revenue depends strongly on line count; quantity's PARTIAL effect is
    # ~0 (fixture prices are independent of quantity), so the regression
    # must attribute essentially everything to the line-count feature
    assert got.r2 > 0.5 and got.beta_lines > 0
    assert got.importance_lines > 0.9


def test_velocity_flags_match_pandas_rolling_count(spark):
    got = _run(spark, "events_velocity_flags")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    # parquet ts loads as datetime64[us] in pandas — go through total_seconds
    ev["s"] = np.floor(
        (ev.ts - pd.Timestamp("1970-01-01")).dt.total_seconds()
    ).astype(int)
    ref = {}
    for (u,), g in ev.groupby(["user_id"]):
        g = g.sort_values("s")
        ss = g.s.to_numpy()
        for i in range(len(g)):
            vel = int(((ss >= ss[i] - 3600) & (ss <= ss[i])).sum())
            key = (g.event_type.iloc[i], vel)
            ref[key] = ref.get(key, 0) + 1
    assert got.n_events.sum() == len(ev)
    for _, r in got.iterrows():
        assert ref.get((r.event_type, r.velocity), 0) == r.n_events
        assert bool(r.flagged) == (r.velocity >= 2)


def test_quadtree_leaves_partition_all_points_and_adapt(spark):
    got = _run(spark, "spatial_quadtree_index")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    x = ((li.l_quantity.to_numpy() - 1) / 50.0) ** 2
    y = (li.l_extendedprice.to_numpy() / 105000.0) ** 2
    # brute-force the leaf rule
    from collections import Counter

    cnt = Counter()
    for lv in range(5):
        ix = np.floor(x * (1 << lv)).astype(int)
        iy = np.floor(y * (1 << lv)).astype(int)
        for a, b in zip(ix, iy):
            cnt[(lv, a, b)] += 1
    leaves = {
        k: v
        for k, v in cnt.items()
        if (v <= 1000 or k[0] == 4)
        and (k[0] == 0 or cnt[(k[0] - 1, k[1] // 2, k[2] // 2)] > 1000)
    }
    assert len(got) == len(leaves)
    for _, r in got.iterrows():
        assert leaves[(r.level, r.ix, r.iy)] == r.n_points
    # leaves tile the plane exactly: every point in exactly one leaf
    assert got.n_points.sum() == len(li)
    # the squared-coordinate density must force a MIX of leaf depths
    assert got.level.nunique() >= 2


def test_freshness_flags_match_pandas(spark):
    got = _run(spark, "dq_freshness").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).size().rename("n").reset_index()
    asof = daily.d.max()
    for t, g in daily.groupby("event_type"):
        last = g.d.max()
        t7 = g[(g.d >= last - 7) & (g.d < last)].n.mean()
        n_last = int(g[g.d == last].n.iloc[0])
        r = got.loc[t]
        assert r.last_day == last and r.days_stale == asof - last
        assert r.n_last_day == n_last
        assert abs(r.trailing7_avg - round(t7, 4)) < 1e-4
        assert abs(r.completeness_ratio - n_last / t7) < 2e-6
        assert bool(r.is_stale) == (asof - last >= 2)
        assert bool(r.is_partial) == (n_last / t7 < 0.5)


def test_qq_normal_matches_numpy_and_separates_the_two_series(spark):
    import math

    got = _run(spark, "agg_qq_normal")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    rev = (
        li.assign(r=li.l_extendedprice * (1 - li.l_discount))
        .groupby("l_orderkey")
        .r.sum()
        .to_numpy()
    )
    raw = li.l_extendedprice.to_numpy(dtype=float)
    ps = [round(0.05 * i, 2) for i in range(1, 20)]

    def inv(p):
        lo, hi = -10.0, 10.0
        for _ in range(200):
            mid = (lo + hi) / 2
            if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    zs = np.array([inv(p) for p in ps])
    for name, v in (("order_revenue", rev), ("line_price", raw)):
        g = got[got.variable == name].sort_values("p")
        q = np.quantile(v, ps, method="linear")
        fitted = v.mean() + v.std(ddof=1) * zs
        assert np.allclose(g.q_observed, np.round(q, 4), atol=2e-4)
        assert np.allclose(g.fitted, fitted, atol=2e-3)
        rj = np.corrcoef(q, zs)[0, 1]
        assert abs(g.rj_stat.iloc[0] - rj) < 1e-4
    # a sum of uniforms is closer to normal than the raw uniform
    rj_rev = got[got.variable == "order_revenue"].rj_stat.iloc[0]
    rj_raw = got[got.variable == "line_price"].rj_stat.iloc[0]
    assert rj_rev > rj_raw > 0.9


def test_experiment_power_matches_closed_form(spark):
    import math

    got = _run(spark, "ml_experiment_power")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    m = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
    za, zb = 1.95996398454, 0.841621233573
    for _, r in got.iterrows():
        g = m[m.c_mktsegment == r.c_mktsegment].o_totalprice
        n, mu, v = len(g), g.mean(), g.var(ddof=1)
        mde = (za + zb) * math.sqrt(2 * v / (n / 2))
        assert r.n == n
        assert abs(r.mde_abs - mde) < 0.01
        assert abs(r.mde_rel - mde / mu) < 1e-5
        assert r.n_per_arm_for_1pct == math.ceil(
            2 * (za + zb) ** 2 * v / ((0.01 * mu) ** 2)
        )
        # a 1% lift needs far more traffic than the fixture has
        assert r.n_per_arm_for_1pct > n


def test_funnel_timing_matches_pandas(spark):
    got = _run(spark, "events_funnel_timing").set_index("step")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    s = ev[ev.event_type == "signup"].groupby("user_id").ts.min()
    c_rows = ev[ev.event_type == "click"].merge(
        s.rename("t_signup"), left_on="user_id", right_index=True
    )
    c = c_rows[c_rows.ts > c_rows.t_signup].groupby("user_id").agg(
        t_click=("ts", "min"), t_signup=("t_signup", "first")
    )
    p_rows = ev[ev.event_type == "purchase"].merge(
        c.t_click, left_on="user_id", right_index=True
    )
    p = p_rows[p_rows.ts > p_rows.t_click].groupby("user_id").agg(
        t_purchase=("ts", "min"), t_click=("t_click", "first")
    )

    def secs(b, a):
        eb = np.floor((b - pd.Timestamp("1970-01-01")).dt.total_seconds())
        ea = np.floor((a - pd.Timestamp("1970-01-01")).dt.total_seconds())
        return (eb - ea).to_numpy()

    for step, d in (
        ("signup_to_click", secs(c.t_click, c.t_signup)),
        ("click_to_purchase", secs(p.t_purchase, p.t_click)),
    ):
        r = got.loc[step]
        assert r.n_users == len(d)
        assert abs(r.median_hours - np.quantile(d, 0.5) / 3600) < 1e-3
        assert abs(r.p25_hours - np.quantile(d, 0.25) / 3600) < 1e-3
        assert abs(r.p75_hours - np.quantile(d, 0.75) / 3600) < 1e-3
        assert abs(r.mean_hours - d.mean() / 3600) < 1e-3
        assert (d >= 0).all()


def test_proportion_ztest_branches_and_formulas(spark):
    import math

    got = _run(spark, "ml_proportion_ztest").set_index("scenario")
    # the random split must NOT be significant; the constructed lift MUST be
    assert not bool(got.loc["null_split"].significant)
    assert bool(got.loc["constructed_lift"].significant)
    for _, r in got.iterrows():
        n0, n1 = r.n_control, r.n_treat
        p0, p1 = r.rate_control, r.rate_treat
        c0, c1 = p0 * n0, p1 * n1
        pp = (c0 + c1) / (n0 + n1)
        z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
        assert abs(r.z - z) < 5e-3
        se = math.sqrt(p0 * (1 - p0) / n0 + p1 * (1 - p1) / n1)
        assert abs(r.ci_lo - (p1 - p0 - 1.95996398454 * se)) < 5e-5
        assert abs(r.ci_hi - (p1 - p0 + 1.95996398454 * se)) < 5e-5
        assert 0 < p0 < 1 and 0 < p1 < 1  # the daily grain keeps rates interior


def test_growth_accounting_matches_pandas_and_balances(spark):
    got = _run(spark, "events_growth_accounting").set_index("week").sort_index()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev[ev.event_type == "purchase"]
    ev["w"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days // 7
    act = ev[["user_id", "w"]].drop_duplicates()
    weeks = sorted(act.w.unique())
    by_week = {w: set(act[act.w == w].user_id) for w in weeks}
    first = act.groupby("user_id").w.min()
    for w in weeks:
        cur = by_week[w]
        prv = by_week.get(w - 1, set())
        new = {u for u in cur if first[u] == w}
        ret = {u for u in cur if u in prv and first[u] != w}
        res = cur - new - ret
        chn = prv - cur if w - 1 in by_week and w <= max(weeks) else set()
        r = got.loc[w]
        assert (r.n_new, r.n_retained, r.n_resurrected) == (
            len(new),
            len(ret),
            len(res),
        )
        assert r.n_churned == len(chn)
        # active(w) = new + retained + resurrected, exactly
        assert len(cur) == r.n_new + r.n_retained + r.n_resurrected
        if len(chn):
            assert abs(r.quick_ratio - (len(new) + len(res)) / len(chn)) < 1e-3
        else:
            assert pd.isna(r.quick_ratio)


def test_vec_outlier_scores_match_numpy_mahalanobis(spark):
    got = _run(spark, "vec_outlier_scores")
    e = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.array([np.array(v) for v in e.embedding])
    mu = X.mean(0)
    v = X.var(0, ddof=1)
    scores = (((X - mu) ** 2) / v).sum(1)
    s = pd.Series(scores, index=e.vec_id)
    thr = 64 * (1 - 2 / (9 * 64) + 2.326347874041 * (2 / (9 * 64)) ** 0.5) ** 3
    order = sorted(s.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:20]
    assert list(got.vec_id) == [k for k, _ in order]
    for (_, ref), val in zip(order, got.maha_sq):
        assert abs(val - ref) < 1e-3
    assert got.n_outliers_total.iloc[0] == int((scores > thr).sum())
    for _, r in got.iterrows():
        assert bool(r.is_outlier) == (s[r.vec_id] > thr)


def test_abc_xyz_matrix_matches_pandas(spark):
    got = _run(spark, "orders_abc_xyz")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    li["rev"] = li.l_extendedprice * (1 - li.l_discount)
    rev = li.groupby("l_partkey").rev.sum().sort_values(ascending=False)
    rev = rev.reset_index().sort_values(
        ["rev", "l_partkey"], ascending=[False, True]
    )
    cum = rev.rev.cumsum() / rev.rev.sum()
    abc = np.where(
        cum.round(9) <= 0.8, "A", np.where(cum.round(9) <= 0.95, "B", "C")
    )
    abc_map = dict(zip(rev.l_partkey, abc))
    li["m"] = (
        (li.l_shipdate.dt.normalize() - pd.Timestamp("1995-01-01")).dt.days // 30
    )
    monthly = li.groupby(["l_partkey", "m"]).l_quantity.sum()
    xyz_map = {}
    for pk, g in monthly.groupby("l_partkey"):
        if len(g) < 2:
            xyz_map[pk] = "Z"
        else:
            cv = round(g.std(ddof=1) / g.mean(), 9)
            xyz_map[pk] = "X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")
    ref = {}
    revs = li.groupby("l_partkey").rev.sum()
    for pk in revs.index:
        key = (abc_map[pk], xyz_map[pk])
        n, r = ref.get(key, (0, 0.0))
        ref[key] = (n + 1, r + revs[pk])
    assert len(got) == len(ref)
    tot = revs.sum()
    for _, row in got.iterrows():
        n, r = ref[(row.abc_class, row.xyz_class)]
        assert row.n_parts == n
        assert abs(row.class_revenue - round(r, 2)) < 0.03
        assert abs(row.revenue_share - r / tot) < 2e-6
    assert got.n_parts.sum() == len(revs)


def test_rate_ratio_test_branches_and_wald_formulas(spark):
    import math

    got = _run(spark, "events_rate_ratio_test").set_index("scenario")
    # the constructed 20% drop must be significant; it removed ~1/5
    r = got.loc["constructed_drop"]
    assert bool(r.significant) and r.rate_ratio > 1.1
    for _, row in got.iterrows():
        c1, c2 = row.n_first_half, row.n_second_half
        lrr = math.log(c1 / c2)
        se = math.sqrt(1 / c1 + 1 / c2)
        assert abs(row.z - lrr / se) < 5e-3
        assert abs(row.ci_lo - math.exp(lrr - 1.95996398454 * se)) < 5e-5
        assert abs(row.ci_hi - math.exp(lrr + 1.95996398454 * se)) < 5e-5
        assert bool(row.significant) == (abs(lrr / se) > 1.95996398454)


def test_gaussian_mixture_em_matches_numpy_and_separates_modes(spark):
    got = _run(spark, "ml_gaussian_mixture_em").set_index("component").sort_index()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    shift = _md5_noise(o.o_orderkey.to_numpy(), 2) * 500_000
    v = o.o_totalprice.to_numpy() + shift
    x, n = np.unique(
        (np.floor(v / 10_000) + 0.5) * 10_000, return_counts=True
    )
    n = n.astype(float)
    w = np.array([0.5, 0.5])
    m = np.array([200_000.0, 800_000.0])
    s = np.array([200_000.0, 200_000.0])
    for _ in range(3):
        u = np.stack(
            [w[k] * np.exp(-((x - m[k]) ** 2) / (2 * s[k] ** 2)) / s[k] for k in range(2)]
        )
        r = u / u.sum(0)
        sw = (n * r).sum(1)
        w = np.round(sw / n.sum(), 9)
        m_new = np.round((n * r * x).sum(1) / sw, 6)
        s = np.round(
            np.sqrt((n * r * x * x).sum(1) / sw - ((n * r * x).sum(1) / sw) ** 2), 6
        )
        m = m_new
    for k in (1, 2):
        row = got.loc[k]
        assert abs(row.weight - w[k - 1]) < 1e-4
        assert abs(row.mean_value - m[k - 1]) < 1.0
        assert abs(row.stddev_value - s[k - 1]) < 1.0
    # EM genuinely recovered the constructed modes from the wrong init
    assert abs(got.loc[1].mean_value - 250_000) < 40_000
    assert abs(got.loc[2].mean_value - 750_000) < 40_000
    assert abs(got.weight.sum() - 1.0) < 1e-6


def test_retention_halflife_matches_pandas_fit(spark):
    got = _run(spark, "events_retention_halflife").set_index("week_offset")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev[ev.event_type == "purchase"]
    ev["w"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days // 7
    act = ev[["user_id", "w"]].drop_duplicates()
    first = act.groupby("user_id").w.min()
    mw = act.w.max()
    ks, lrs = [], []
    for k in range(1, 5):
        exposed = sum(
            (first == fw).sum() for fw in first.unique() if fw + k <= mw
        )
        retained = sum(
            1
            for u, fw in first.items()
            if ((act.user_id == u) & (act.w == fw + k)).any()
        )
        if k in got.index:
            r = got.loc[k]
            assert (r.n_retained, r.n_exposed) == (retained, exposed)
            assert abs(r.retention - retained / exposed) < 2e-6
            ks.append(k)
            lrs.append(np.log(retained / exposed))
    ks, lrs = np.array(ks, dtype=float), np.array(lrs)
    slope = ((ks * lrs).sum() - ks.sum() * lrs.sum() / len(ks)) / (
        (ks * ks).sum() - ks.sum() ** 2 / len(ks)
    )
    assert abs(got.decay_slope.iloc[0] - slope) < 1e-4
    assert abs(got.halflife_weeks.iloc[0] - (-np.log(2) / slope)) < 1e-2
    # retention decays, so the slope is negative and halflife positive
    assert slope < 0 and got.halflife_weeks.iloc[0] > 0


def test_asof_interpolated_matches_pandas_lerp(spark):
    got = _run(spark, "join_asof_interpolated").set_index("day")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    curve = ev[ev.event_type == "click"].groupby("d").size().astype(float)
    pr = ev[ev.event_type == "purchase"].copy()
    es = np.floor((pr.ts - pd.Timestamp("1970-01-01")).dt.total_seconds())
    ds = np.floor(
        (pr.ts.dt.normalize() - pd.Timestamp("1970-01-01")).dt.total_seconds()
    )
    pr["frac"] = (es - ds) / 86400.0
    vs = {}
    for _, row in pr.iterrows():
        lo = curve.get(row.d)
        hi = curve.get(row.d + 1)
        if lo is None:
            continue
        v = lo if hi is None or pd.isna(hi) else lo + row.frac * (hi - lo)
        vs.setdefault(row.d, []).append(v)
    assert set(got.index) == set(vs)
    for day, arr in vs.items():
        r = got.loc[day]
        a = np.array(arr)
        assert r.n_probes == len(a)
        assert abs(r.avg_interpolated_clicks - a.mean()) < 1e-3
        assert abs(r.min_interp - a.min()) < 1e-3
        assert abs(r.max_interp - a.max()) < 1e-3
    # interpolated values must lie between the bracketing curve points
    allv = np.concatenate([np.array(a) for a in vs.values()])
    assert allv.min() >= curve.min() and allv.max() <= curve.max()


def test_srm_check_branches(spark):
    # branch semantics are tier-dependent (chi2 power grows with n);
    # sf0.01 is the driver tier where both branches must be live
    got = (
        all_queries()["ml_ab_srm_check"](spark, SF_MID)
        .toPandas()
        .set_index("scenario")
    )
    assert not bool(got.loc["healthy"].srm_detected)
    assert bool(got.loc["broken_bucketing"].srm_detected)
    ev = pd.read_parquet(f"{SF_MID}/events.parquet")
    users = ev.user_id.unique()
    arm = _md5_noise(users, 2)
    import hashlib

    dropped = np.array(
        [
            int(hashlib.md5(f"{u}#srm".encode()).hexdigest()[:15], 16) % 3 == 0
            for u in users
        ]
    )
    h = got.loc["healthy"]
    assert (h.n_control, h.n_treat) == ((arm == 0).sum(), (arm == 1).sum())
    b = got.loc["broken_bucketing"]
    assert b.n_treat == ((arm == 1) & ~dropped).sum()
    n0, n1 = b.n_control, b.n_treat
    exp = (n0 + n1) / 2
    assert abs(b.chi2 - ((n0 - exp) ** 2 / exp + (n1 - exp) ** 2 / exp)) < 1e-3


def test_pr_auc_matches_sklearn_style_step_ap(spark):
    got = _run(spark, "ml_pr_auc").set_index("o_orderpriority")
    o = _orders_labeled()
    o["bucket"] = np.floor(o.o_totalprice / 500).astype(int)
    for prio, g in o.groupby("o_orderpriority"):
        hist = g.groupby("bucket").agg(
            pos=("label", "sum"), n=("label", "size")
        ).sort_index(ascending=False)
        hist["neg"] = hist.n - hist.pos
        tp = hist.pos.cumsum()
        fp = hist.neg.cumsum()
        npos = hist.pos.sum()
        ap = float((hist.pos * (tp / (tp + fp))).sum() / npos)
        r = got.loc[prio]
        assert r.n_pos == npos
        assert abs(r.pr_auc - ap) < 2e-6
        assert abs(r.baseline_prevalence - npos / hist.n.sum()) < 2e-6
        # the constructed label carries real ranking signal
        assert r.pr_auc > r.baseline_prevalence + 0.2


def test_brier_decomposition_identity_and_numpy(spark):
    got = _run(spark, "ml_brier_decomposition").iloc[0]
    o = _orders_labeled()
    o["score"] = 1.0 / (1.0 + np.exp(-(o.o_totalprice - 200000.0) / 80000.0))
    o["bin"] = np.minimum(9, np.floor(o.o_totalprice / 60000).astype(int))
    brier = float(((o.score - o.label) ** 2).mean())
    bins = o.groupby("bin").agg(nk=("label", "size"), fk=("score", "mean"), ok=("label", "mean"))
    n = bins.nk.sum()
    obar = float((bins.nk * bins.ok).sum() / n)
    rel = float((bins.nk * (bins.fk - bins.ok) ** 2).sum() / n)
    res = float((bins.nk * (bins.ok - obar) ** 2).sum() / n)
    unc = obar * (1 - obar)
    assert got.n == n
    assert abs(got.brier - brier) < 2e-6
    assert abs(got.reliability - rel) < 2e-6
    assert abs(got.resolution - res) < 2e-6
    assert abs(got.uncertainty - unc) < 2e-6
    # Murphy identity holds up to the within-bin variance of the forecast
    assert abs(got.decomposed_brier - (rel - res + unc)) < 2e-6
    assert abs(got.within_bin_residual - (brier - (rel - res + unc))) < 4e-6
    assert abs(got.within_bin_residual) < 0.02  # narrow bins -> small remainder


def test_hmm_forward_matches_numpy_scaled_recursion(spark):
    got = _run(spark, "events_hmm_forward").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum().round(4)
    T = np.array([[0.8, 0.2], [0.3, 0.7]])
    E1 = np.array([0.7, 0.2])
    for t, g in daily.groupby(level=0):
        v = g.droplevel(0).sort_index().to_numpy()
        m = np.quantile(v, 0.5, method="linear")
        obs = (v > m).astype(float)
        a = np.array([0.5, 0.5])
        ll = 0.0
        for o in obs:
            em = E1 if o == 1.0 else 1 - E1
            u = (a @ T) * em
            z = u.sum()
            a = u / z
            ll += np.log(z)
        r = got.loc[t]
        assert r.n_days == len(v)
        assert abs(r.loglik - ll) < 1e-3
        assert abs(r.p_state_high_final - a[0]) < 1e-5
        # scaled forward keeps a proper posterior
        assert 0 <= r.p_state_high_final <= 1 and r.loglik < 0


def test_mutual_information_separates_signal_from_noise(spark):
    got = _run(spark, "ml_mutual_information").set_index("feature")
    o = _orders_labeled()
    o["xbin"] = np.floor(o.o_totalprice / 50_000).astype(int)
    o["noisebin"] = _md5_noise([f"{k}#mi" for k in o.o_orderkey], 10)

    def mi_bits(x, y):
        n = len(x)
        mi = 0.0
        for xv in np.unique(x):
            for yv in (0, 1):
                nxy = ((x == xv) & (y == yv)).sum()
                if nxy == 0:
                    continue
                nx = (x == xv).sum()
                ny = (y == yv).sum()
                mi += nxy / n * np.log(nxy * n / (nx * ny))
        return mi / np.log(2)

    y = o.label.to_numpy()
    hy = -sum(
        p * np.log2(p) for p in [(y == 0).mean(), (y == 1).mean()] if p > 0
    )
    for feat, x in (("price_bin", o.xbin.to_numpy()), ("random_bin", o.noisebin.to_numpy())):
        ref = mi_bits(x, y)
        r = got.loc[feat]
        assert abs(r.mi_bits - ref) < 2e-5
        assert abs(r.mi_over_hy - ref / hy) < 2e-5
    # the informative feature clears the noise floor decisively
    assert got.loc["price_bin"].mi_bits > 10 * max(got.loc["random_bin"].mi_bits, 1e-4)


def test_viterbi_path_matches_numpy_dp(spark):
    import math

    got = _run(spark, "events_viterbi_path").set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    daily = ev.groupby(["event_type", "d"]).value.sum().round(4)
    T = [[0.8, 0.2], [0.3, 0.7]]
    E1 = [0.7, 0.2]
    lt = [[math.log(x) for x in r] for r in T]
    for t, g in daily.groupby(level=0):
        v = g.droplevel(0).sort_index().to_numpy()
        obs = (v > np.quantile(v, 0.5, method="linear")).astype(int)
        d = [math.log(0.5)] * 2
        p = [0, 0]
        for o in obs:
            em = [E1[0] if o else 1 - E1[0], E1[1] if o else 1 - E1[1]]
            nd, npth = [0, 0], [0, 0]
            for s in (0, 1):
                if d[0] + lt[0][s] >= d[1] + lt[1][s]:
                    nd[s] = d[0] + lt[0][s] + math.log(em[s])
                    npth[s] = p[0] * 2 + s
                else:
                    nd[s] = d[1] + lt[1][s] + math.log(em[s])
                    npth[s] = p[1] * 2 + s
            d, p = nd, npth
        best = 0 if d[0] >= d[1] else 1
        mask = p[best]
        bits = bin(mask)[2:].zfill(len(obs))
        switches = sum(1 for a, b in zip(bits, bits[1:]) if a != b)
        r = got.loc[t]
        assert abs(r.path_loglik - d[best]) < 1e-3
        assert r.n_quiet_days == bits.count("1")
        assert r.n_switches == switches
        assert r.n_days == len(obs)


def test_anova_matches_numpy_and_is_honest_null(spark):
    got = _run(spark, "agg_anova_oneway").iloc[0]
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    groups = [g.o_totalprice.to_numpy() for _, g in o.groupby("o_orderpriority")]
    k = len(groups)
    nt = sum(len(g) for g in groups)
    gm = o.o_totalprice.mean()
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert (got.n_groups, got.n_rows) == (k, nt)
    assert abs(got.ms_between - ssb / (k - 1)) < 1.0
    assert abs(got.ms_within - ssw / (nt - k)) < 1.0
    assert abs(got.f_stat - f) < 1e-4
    assert abs(got.eta_squared - ssb / (ssb + ssw)) < 1e-6
    # priorities are independent of price: honest null, tiny effect size
    assert got.eta_squared < 0.01


def test_logistic_gd_matches_numpy_descent(spark):
    got = _run(spark, "ml_logistic_gd").iloc[0]
    o = _orders_labeled()
    x1 = np.floor(o.o_totalprice / 5000) * 5000 / 500000.0
    d = (o.o_orderdate.dt.normalize() - pd.Timestamp("1995-01-01")).dt.days
    x2 = np.floor(d / 60) * 60 / 2500.0
    y = o.label.to_numpy(dtype=float)
    cells = pd.DataFrame({"x1": x1, "x2": x2, "y": y}).groupby(["x1", "x2"]).agg(
        n=("y", "size"), pos=("y", "sum")
    ).reset_index()
    b = np.zeros(3)
    X = np.column_stack([np.ones(len(cells)), cells.x1, cells.x2])
    for _ in range(5):
        sig = 1 / (1 + np.exp(-(X @ b)))
        resid = cells.n.to_numpy() * sig - cells.pos.to_numpy()
        grad = X.T @ resid / cells.n.sum()
        b = np.round(b - 2.0 * grad, 9)
    sig = 1 / (1 + np.exp(-(X @ b)))
    ll = -(
        cells.pos.to_numpy() * np.log(sig)
        + (cells.n - cells.pos).to_numpy() * np.log(1 - sig)
    ).sum() / cells.n.sum()
    assert abs(got.b0 - b[0]) < 1e-6
    assert abs(got.b1 - b[1]) < 1e-6
    assert abs(got.b2 - b[2]) < 1e-6
    assert abs(got.logloss - ll) < 1e-5
    # price carries the signal, date does not; loss improved from ln 2
    assert got.b1 > 5 * abs(got.b2)
    assert got.logloss < 0.69


def test_nrr_matches_pandas_pooled_cohorts(spark):
    got = _run(spark, "orders_net_revenue_retention").set_index("month_offset")
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    o["m"] = (
        (o.o_orderdate.dt.normalize() - pd.Timestamp("1995-01-01")).dt.days // 30
    )
    first = o.groupby("o_custkey").m.min().rename("c")
    o = o.merge(first, left_on="o_custkey", right_index=True)
    mm = o.m.max()
    rev0 = o[o.m == o.c].groupby("c").o_totalprice.sum()
    for k in (1, 3, 6, 12):
        num = den = 0.0
        for c, r0 in rev0.items():
            if c + k > mm:
                continue
            den += r0
            num += o[(o.c == c) & (o.m == c + k)].o_totalprice.sum()
        if den > 0:
            r = got.loc[k]
            assert abs(r.retained_revenue - round(num, 2)) < 0.03
            assert abs(r.cohort_base_revenue - round(den, 2)) < 0.03
            assert abs(r.nrr - num / den) < 2e-6
    # longer offsets observe less repeat revenue per cohort dollar
    assert got.nrr.iloc[0] > 0


def test_mix_entropy_matches_numpy(spark):
    got = _run(spark, "events_mix_entropy_trend").set_index("day").sort_index()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    hs = {}
    for d, g in ev.groupby("d"):
        p = g.event_type.value_counts(normalize=True).to_numpy()
        hs[d] = float(-(p * np.log2(p)).sum())
        assert got.loc[d].n_events == len(g)
        assert abs(got.loc[d].mix_entropy_bits - hs[d]) < 2e-6
    h1 = np.mean([h for d, h in hs.items() if d < 15])
    h2 = np.mean([h for d, h in hs.items() if d >= 15])
    assert abs(got.half_over_half_delta.iloc[0] - (h2 - h1)) < 1e-4
    # 5 near-uniform types -> entropy close to log2(5)
    assert 2.0 < got.mix_entropy_bits.mean() < np.log2(5) + 1e-6


def test_corr_matrix_matches_numpy_and_is_identity_null(spark):
    got = _run(spark, "agg_corr_matrix").set_index(["col_a", "col_b"])
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    assert len(got) == 10  # upper triangle + diagonal of a 4x4
    for i, a in enumerate(cols):
        for b in cols[i:]:
            r = got.loc[(a, b)]
            # bracket access: 'cov'/'corr' collide with pandas methods
            assert abs(r["cov"] - li[a].cov(li[b])) < max(
                1e-4, abs(li[a].cov(li[b])) * 1e-5
            )
            assert abs(r["corr"] - li[a].corr(li[b])) < 1e-4
            if a == b:
                assert abs(r["corr"] - 1.0) < 1e-9
            else:
                assert abs(r["corr"]) < 0.05  # independent fixture columns


def test_spearman_matches_scipy_style_numpy(spark):
    got = _run(spark, "agg_spearman_corr").set_index("l_returnflag")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        rx = pd.Series(g.l_quantity).rank(method="average")
        ry = pd.Series(g.l_extendedprice).rank(method="average")
        rho = np.corrcoef(rx, ry)[0, 1]
        pear = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
        r = got.loc[flag]
        assert r.n == len(g)
        assert abs(r.spearman_rho - rho) < 2e-4
        assert abs(r.pearson_r - pear) < 2e-4
        # independent fixture columns: honest null
        assert abs(r.spearman_rho) < 0.05
