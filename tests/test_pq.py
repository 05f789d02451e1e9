"""Product-quantization semantics: numpy re-derivation of the codebook
training and ADC search quality against exact distances."""

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE

from fits2db_spark.operators import llm_vectors  # noqa: F401  (registration)
from fits2db_spark.registry import all_queries


def _run(spark, name):
    return all_queries()[name](spark, SF_SMOKE).toPandas()


def _numpy_pq(emb):
    m, sub, k = 8, 8, 4
    svs = emb.reshape(len(emb), m, sub)
    cents = {}
    for s in range(m):
        c = svs[:k, s].astype("f8").copy()  # seeds: vec_id 0..3
        # round 1: assign, update
        d = ((svs[:, s, None, :] - c[None]) ** 2).sum(-1)
        a = d.argmin(1)
        c1 = {}
        for code in range(k):
            members = svs[a == code, s]
            if len(members):
                c1[code + 1] = members.mean(0)
        cents[s] = c1
    return svs, cents


def test_pq_train_matches_numpy(spark):
    got = _run(spark, "vec_pq_train")
    emb = np.array(
        list(pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").embedding), dtype="f8"
    )
    svs, cents = _numpy_pq(emb)
    for s, c1 in cents.items():
        codes = np.array(sorted(c1))
        C = np.stack([c1[c] for c in codes])
        d = ((svs[:, s, None, :] - C[None]) ** 2).sum(-1)
        a = codes[d.argmin(1)]
        sub = got[got.subspace == s]
        for code in codes:
            n = int((a == code).sum())
            if n == 0:
                continue
            row = sub[sub.code == code]
            assert len(row) == 1 and row.n.iloc[0] == n
            mse = d[a == code, list(codes).index(code)].mean()
            assert abs(row.avg_dist2.iloc[0] - mse) < 1e-4


def test_pq_ann_is_sane_and_correlates_with_exact(spark):
    got = _run(spark, "sim_ann_pq")
    emb = np.array(
        list(pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").embedding), dtype="f8"
    )
    assert set(got.query_id) == set(range(5))
    # 16-bit codes on near-random 64-d vectors are PQ's worst case, so
    # top-5 recall is weak by construction; the robust signal check is
    # that the exact distance of PQ-selected neighbors beats the corpus
    # average by a wide margin for every query
    ratios = []
    for q in range(5):
        sub = got[got.query_id == q].sort_values("rk")
        assert list(sub.rk) == [1, 2, 3, 4, 5]
        assert sub.pq_dist2.is_monotonic_increasing
        assert q not in set(sub.neighbor_id)
        exact = ((emb - emb[q]) ** 2).sum(1)
        exact[q] = np.nan
        ratios.append(exact[list(sub.neighbor_id)].mean() / np.nanmean(exact))
    # every query's picks beat the corpus average; on aggregate by a wide
    # margin (exact values measured: 0.60-0.82 on this fixture)
    assert max(ratios) < 0.95, ratios
    assert np.mean(ratios) < 0.85, ratios
