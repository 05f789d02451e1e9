"""Quality tests for the rows-only operators (the ones the DuckDB oracle
cannot hash-check): each gets a semantic invariant instead."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from fits2db_spark.registry import all_queries

    return all_queries()[name]


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.l_returnflag: r.approx_parts
        for r in _q("agg_approx_distinct")(spark, SF_SMOKE).collect()
    }
    exact = {
        r.l_returnflag: r.distinct_parts
        for r in _q("agg_count_distinct")(spark, SF_SMOKE).collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) <= 0.1 * e, (k, approx[k], e)


def test_approx_percentile_brackets_exact(spark):
    ap = {
        r.l_linestatus: (r.ap50_price, r.ap90_price)
        for r in _q("agg_approx_percentile")(spark, SF_SMOKE).collect()
    }
    ex = {
        r.l_linestatus: (r.p50_price, r.p90_price)
        for r in _q("agg_percentile")(spark, SF_SMOKE).collect()
    }
    for k, (p50, p90) in ex.items():
        assert abs(ap[k][0] - p50) / p50 < 0.05
        assert abs(ap[k][1] - p90) / p90 < 0.05


def test_random_id_seeded_and_uniform(spark):
    a = _q("add_random_id")(spark, SF_SMOKE).collect()
    b = _q("add_random_id")(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # same seed -> same stream
    vals = [r.random_id for r in a]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.3 < sum(vals) / len(vals) < 0.7  # crude uniformity


def test_sample_fraction_bounds_and_determinism(spark):
    a = _q("sample_fraction")(spark, SF_SMOKE).collect()
    b = _q("sample_fraction")(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # 10% of 6000 lineitem rows, binomial 5-sigma bounds
    assert 400 <= len(a) <= 800, len(a)


def test_rowid_unordered_is_unique(spark):
    df = _q("add_rowid_unordered")(spark, SF_SMOKE)
    n = df.count()
    assert df.select("row_id").distinct().count() == n


def test_native_hashes_deterministic_and_distinct(spark):
    a = _q("fn_hash_native")(spark, SF_SMOKE).collect()
    b = _q("fn_hash_native")(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len({r.h_xx64 for r in a}) == len(a)  # no collisions on 150 names


def test_kmeans_partitions_all_vectors(spark):
    from fits2db_spark.tables import load

    rows = _q("vec_kmeans")(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    assert sum(r.n for r in rows) == load(spark, SF_SMOKE, "embeddings").count()
    assert all(r.avg_dist2 > 0 for r in rows)


def test_matmul_topk_matches_expression_topk(spark):
    """The numpy block-GEMM path must agree with the JVM expression path on
    the overlapping query set (vec_id 0-2, k=5): same neighbors, same order."""
    bf = {
        (r.query_id, r.rk): (r.neighbor_id, round(r.cos_sim, 4))
        for r in _q("sim_topk_bruteforce")(spark, SF_SMOKE).collect()
    }
    mm = {
        (r.query_id, r.rk): (r.neighbor_id, round(r.cos_sim, 4))
        for r in _q("sim_topk_matmul")(spark, SF_SMOKE).collect()
        if r.query_id < 3
    }
    assert mm == bf, {k: (bf.get(k), mm.get(k)) for k in set(bf) ^ set(mm) | set(bf)}


def test_decode_stub_consistent_with_payload(spark):
    from fits2db_spark.operators.multimodal import decode_image
    from fits2db_spark.tables import load

    rows = {r.doc_id: r for r in _q("mm_decode_features")(spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200).collect()
    assert len(rows) == len(docs)
    for d in docs[:20]:
        payload = d.text.encode("utf-8")
        w, h, c = decode_image(payload)
        r = rows[d.doc_id]
        assert (r.width, r.height, r.channels, r.n_bytes) == (w, h, c, len(payload))


def test_soundex_shape(spark):
    for r in _q("fn_soundex")(spark, SF_SMOKE).collect():
        sx = r.sx_name
        assert len(sx) == 4 and sx[0].isalpha() and sx[0].isupper(), sx


def test_spatial_cols_pixels_in_range(spark):
    rows = _q("spatial_cols")(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0 <= r.ring256 < 12 * 256 * 256
        assert 0 <= r.nest4096 < 12 * 4096 * 4096
        assert 8 * 4**9 <= r.htm9 < 16 * 4**9
        assert 0.0 <= r.random_id < 1.0


def test_dedup_components_consistent_with_pairs(spark):
    """Every near-dup pair must land in one component; keep_doc is the min."""
    comps = _q("dedup_components")(spark, SF_SMOKE).collect()
    assert comps, "fixture has near-dup clusters"
    assert all(r.keep_doc <= r.comp or r.keep_doc == r.comp for r in comps)
    assert all(r.cluster_size >= 2 for r in comps)
    # total clustered docs == docs appearing in the pair graph
    from fits2db_spark.operators.llm_text import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    in_graph = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert sum(r.cluster_size for r in comps) == len(in_graph)
