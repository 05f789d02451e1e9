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


def test_decode_features_real_ppm_decode(spark):
    """mm_decode_features must run the REAL PPM decoder on the JVM-built
    payloads: dims, byte counts, and pixel features all match an
    independent Python decode of the same bytes."""
    from fits2db_spark.operators.multimodal import (
        decode_pnm,
        image_features,
        ppm_fixture_payload,
    )
    from fits2db_spark.tables import load

    rows = {r.doc_id: r for r in _q("mm_decode_features")(spark, SF_SMOKE).collect()}
    docs = load(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 200).collect()
    assert len(rows) == len(docs)
    for d in docs[:20]:
        payload = ppm_fixture_payload(d.text, d.doc_id, d.n_chars)
        img = decode_pnm(payload)
        feats = image_features(img)
        r = rows[d.doc_id]
        assert (r.width, r.height, r.channels) == (img.shape[1], img.shape[0], 3)
        assert r.n_bytes == len(payload)
        assert r.mean_lum == round(feats["mean_lum"], 4)
        assert r.std_lum == round(feats["std_lum"], 4)


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


def test_label_propagation_raises_on_high_diameter_graph(spark, monkeypatch):
    """A path graph of diameter > max_rounds must raise, not silently return
    (and never memoize) unconverged labels — the guard mirrored from
    dedup_components_bigstar. Cap forced to 0 so the ITERATIVE path (the
    one the guard protects) runs, not the r7 union-find fast path."""
    import pytest

    from fits2db_spark.operators import llm_text
    from fits2db_spark.operators.llm_text import _label_propagate

    monkeypatch.setattr(llm_text, "_LP_DRIVER_EDGE_CAP", 0)
    n = 12
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a BIGINT, doc_b BIGINT"
    )
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _label_propagate(chain, nodes, max_rounds=3)
    # and with enough rounds the same graph converges to a single component
    _, labels = _label_propagate(chain, nodes, max_rounds=n)
    assert {r.comp for r in labels.collect()} == {0}


def test_label_propagation_fast_and_iterative_paths_agree(spark, monkeypatch):
    """The r7 driver union-find fast path and the distributed min-label
    loop must produce identical component labels — including isolated
    nodes, multi-branch merges, and string ids (ER uses lexicographic
    MIN)."""
    from fits2db_spark.operators import llm_text
    from fits2db_spark.operators.llm_text import _label_propagate

    pairs = spark.createDataFrame(
        [("d", "b"), ("b", "z"), ("q", "m"), ("m", "a"), ("x", "y")],
        "doc_a STRING, doc_b STRING",
    )
    nodes = spark.createDataFrame(
        [(c,) for c in "abdmqxyz"] + [("lonely",)], "doc_id STRING"
    )
    _, fast = _label_propagate(pairs, nodes)
    got_fast = {r.doc_id: r.comp for r in fast.collect()}
    monkeypatch.setattr(llm_text, "_LP_DRIVER_EDGE_CAP", 0)
    _, it = _label_propagate(pairs, nodes)
    got_it = {r.doc_id: r.comp for r in it.collect()}
    assert got_fast == got_it
    assert got_fast == {
        "a": "a", "m": "a", "q": "a",
        "b": "b", "d": "b", "z": "b",
        "x": "x", "y": "x",
        "lonely": "lonely",
    }


def test_dedup_components_bigstar_matches_label_propagation(spark):
    """Large-star/small-star CC must produce the identical clustering as the
    label-propagation implementation on the same pair graph."""
    lp = sorted(tuple(r) for r in _q("dedup_components")(spark, SF_SMOKE).collect())
    bs = sorted(
        tuple(r) for r in _q("dedup_components_bigstar")(spark, SF_SMOKE).collect()
    )
    assert lp == bs
    assert lp, "fixture has near-dup clusters"


# ---------------------------------------------------------------------------
# Round-2: golden-value spatial tests. Values are hand-derived from the
# PUBLISHED algorithms (HEALPix primer ang2pix arithmetic; HTM subdivision
# rules), independently of functions/spatial.py's vectorized code — a
# transposed bit in _spread_bits or a flipped child index fails these.
# Knife-edge points (e.g. dec=0 exactly, a pixel boundary where cos(pi/2)'s
# 6e-17 residue picks the ring) are avoided except where the result is a
# published structural fact (pole pixels).
# ---------------------------------------------------------------------------

CENTROID_DEC = 35.26438968275465  # dec of (1,1,1)/sqrt(3): atan(1/sqrt(2))


def test_healpix_ring_golden_values():
    import numpy as np

    from fits2db_spark.functions.spatial import ang2pix_ring

    ra = np.array([0.0, 95.0, 185.0, 275.0, 0.0, 45.0])
    dec = np.array([90.0, 90.0, 90.0, 90.0, -90.0, CENTROID_DEC])
    got = list(ang2pix_ring(256, ra, dec))
    # published: first polar ring = pixels 0..3 (one per quadrant), last
    # ring = the final 4 pixels of the 12*nside^2 map
    assert got[:4] == [0, 1, 2, 3]
    assert got[4] == 12 * 256 * 256 - 4
    # octant centroid, hand-derived: z=1/sqrt(3), tt=0.5 -> jp=145, jm=366;
    # ir = nside+1+jp-jm = 256+1+145-366 = 36 (even -> kshift=1);
    # ip = (145+366-256+1+1)//2 = 128 -> 2*256*255 + 35*1024 + 128 = 166528
    assert got[5] == 166528


def test_healpix_nest_golden_values():
    import numpy as np

    from fits2db_spark.functions.spatial import ang2pix_nest

    n2 = 4096 * 4096
    ra = np.array([0.0, 95.0, 185.0, 275.0, 0.0, 45.0])
    dec = np.array([90.0, 90.0, 90.0, 90.0, -90.0, CENTROID_DEC])
    got = list(ang2pix_nest(4096, ra, dec))
    # published nested structure: the north pole corner of faces 0..3 is each
    # face's LAST pixel (ix=iy=nside-1 -> all z-order bits set); the south
    # pole corner of face 8 is its FIRST pixel (ix=iy=0)
    assert got[:4] == [1 * n2 - 1, 2 * n2 - 1, 3 * n2 - 1, 4 * n2 - 1]
    assert got[4] == 8 * n2
    # octant centroid, hand-derived: tt=0.5 -> jp=2322, jm=5869 -> face 0,
    # ix=iy=1773; bits of 1773 = {0,2,3,5,6,7,9,10} -> spread = sum 4^k =
    # 1332305; ix|iy<<1 = 3*1332305 = 3996915
    assert got[5] == 3996915


def test_htm_golden_values():
    import numpy as np

    from fits2db_spark.functions.spatial import radec_to_htm

    ra = np.array([45.0, 225.0, 0.0, 90.0, 180.0, 0.0])
    dec = np.array([CENTROID_DEC, -CENTROID_DEC, 0.0, 0.0, 0.0, 90.0])
    got = list(radec_to_htm(9, ra, dec))
    # (1,1,1)/sqrt(3) is the centroid of octant N3 (root 15): the center
    # child (3) at every level -> id = 15*4^9 + (4^9 - 1)
    assert got[0] == 15 * 4**9 + 4**9 - 1 == 4194303
    # (-1,-1,-1)/sqrt(3): centroid of S2 (root 10), same all-3s path
    assert got[1] == 10 * 4**9 + 4**9 - 1 == 2883583
    # (1,0,0) is corner v0 of S0 (root 8, first in scan order): child 0
    # at every level -> id = 8*4^9
    assert got[2] == 8 * 4**9 == 2097152
    # (0,1,0) is corner v2 of S0 -> child 2 once, then corner-first 0s
    assert got[3] == 8 * 4**9 + 2 * 4**8 == 2228224
    # (-1,0,0) is corner v2 of S1 (root 9)
    assert got[4] == 9 * 4**9 + 2 * 4**8 == 2490368
    # north pole is corner v1 of N0 (root 12) -> child 1 once, then 0s
    assert got[5] == 12 * 4**9 + 4**8 == 3211264


def test_ann_lsh_recall_vs_bruteforce(spark):
    """Multi-table LSH recall against exact top-3 ground truth over the same
    query set. Measured 0.97 on the fixtures with 16 tables x 4 bits; a
    one-table regression (recall ~0.17) fails loudly."""
    from pyspark.sql import Window

    from fits2db_spark.operators.llm_vectors import sim_ann_lsh
    from fits2db_spark.tables import load

    sf = SF_SMOKE
    ann = {(r.query_id, r.neighbor_id) for r in sim_ann_lsh(spark, sf).collect()}
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ce"))
    dot = F.aggregate(F.zip_with("qe", "ce", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(F.transform("qe", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform("ce", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), "nid")
    exact = {
        (r.qid, r.nid)
        for r in (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("nid") != F.col("qid"))
            .select("qid", "nid", (dot / (na * nb)).alias("s"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
        ).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(exact)} truth pairs)"


def test_cms_heavy_hitters_bounds(spark):
    """Count-min estimates must dominate exact counts (one-sided error) and
    stay within eps*N of them; the top-20 estimate set must contain the
    exact top-5 tokens (heavy hitters survive sketching)."""
    from fits2db_spark.operators.pipeline import _CMS_D, _CMS_W
    from fits2db_spark.tables import load

    est = {r.token: r.est_cnt for r in _q("cms_heavy_hitters")(spark, SF_SMOKE).collect()}
    toks = load(spark, SF_SMOKE, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    n_total = toks.count()
    exact = {
        r.token: r.cnt
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
        .collect()
    }
    eps = 2.718 / _CMS_W  # standard CMS bound with w counters per row
    for tok, e_cnt in est.items():
        if tok in exact:
            assert e_cnt >= exact[tok], (tok, e_cnt, exact[tok])
            assert e_cnt - exact[tok] <= eps * n_total, (tok, e_cnt, exact[tok])
    top5_exact = sorted(exact, key=lambda t: (-exact[t], t))[:5]
    assert set(top5_exact) <= set(est), (top5_exact, sorted(est))


def test_seq_pack_bins_conservation(spark):
    """Sequence packing must conserve tokens and documents per language, and
    every non-final bin boundary must be consistent with the context size."""
    from fits2db_spark.operators.pipeline import _CTX
    from fits2db_spark.tables import load

    bins = _q("seq_pack_bins")(spark, SF_SMOKE).collect()
    d = load(spark, SF_SMOKE, "documents").select(
        "lang", F.size(F.split("text", " ")).alias("ntok")
    )
    truth = {
        r.lang: (r.n, r.tok)
        for r in d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("ntok").alias("tok"))
        .collect()
    }
    per_lang = {}
    for r in bins:
        n, tok = per_lang.get(r.lang, (0, 0))
        per_lang[r.lang] = (n + r.n_docs, tok + r.bin_tokens)
        assert r.bin >= 0
    assert per_lang == truth
    # bins are dense 0..max per language
    for lang in truth:
        ids = sorted(r.bin for r in bins if r.lang == lang)
        assert ids == list(range(len(ids))), (lang, ids)


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF (k=8, nprobe=3) must recover >= 85% of the exact top-3 neighbor
    pairs on the smoke fixture (measured 0.93 when written)."""
    from pyspark.sql import Window

    from fits2db_spark.tables import load

    sf = SF_SMOKE
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in _q("sim_ann_ivf")(spark, sf).collect()
    }
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ce"))
    dot = F.aggregate(F.zip_with("qe", "ce", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(F.transform("qe", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform("ce", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), "nid")
    exact = {
        (r.qid, r.nid)
        for r in (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("nid") != F.col("qid"))
            .select("qid", "nid", (dot / (na * nb)).alias("s"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
        ).collect()
    }
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.85, f"IVF recall {recall:.3f} < 0.85 ({len(exact)} truth pairs)"


def test_pagerank_invariants(spark):
    """PageRank: deterministic across invocations, strictly positive ranks,
    descending order, and suppliers (the high-degree side of the bipartite
    graph) must dominate the top ranks."""
    a = _q("graph_pagerank")(spark, SF_SMOKE).collect()
    b = _q("graph_pagerank")(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 20
    ranks = [r.rank for r in a]
    assert ranks == sorted(ranks, reverse=True)
    assert all(x > 0 for x in ranks)
    assert a[0].node_type == "supplier"


def test_pca_matches_numpy(spark):
    """Distributed Gram-matrix PCA must reproduce single-node numpy PCA
    eigenvalues to 6 decimals on the smoke fixture."""
    import numpy as np

    from fits2db_spark.tables import load

    got = {r.component: r.eigenvalue for r in _q("vec_pca_evr")(spark, SF_SMOKE).collect()}
    X = np.asarray(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in load(spark, SF_SMOKE, "embeddings").select("embedding").collect()
        ]
    )
    ev = np.linalg.eigvalsh(np.cov(X.T, bias=True))[::-1]
    for k in range(8):
        assert abs(got[k + 1] - float(ev[k])) < 1e-6, (k, got[k + 1], float(ev[k]))


def test_ivf_nearest_cells_tie_safe(spark):
    """Duplicate centroid distances (Lloyd collapse) must still probe
    DISTINCT cells — the round-3 array_position bug returned the first
    matching cell for every tie, duplicating probes and potentially
    ranking one neighbor at two rk positions."""
    from fits2db_spark.operators.llm_vectors import _nearest_cells

    # distances with a tie for nearest (cells 1 and 3 both at 0.5)
    df = spark.range(1).select(
        _nearest_cells(F.array(F.lit(0.5), F.lit(2.0), F.lit(0.5), F.lit(1.0)), 3).alias("cells")
    )
    [row] = df.collect()
    assert sorted(row.cells) == [1, 3, 4], row.cells
    assert len(set(row.cells)) == 3, f"duplicate probe cells: {row.cells}"


def test_ann_ivf_no_duplicate_neighbors(spark):
    """Every (query_id, neighbor_id) appears once and rk is dense 1..k."""
    out = _q("sim_ann_ivf")(spark, SF_SMOKE).collect()
    seen = {}
    for r in out:
        key = (r.query_id, r.neighbor_id)
        assert key not in seen, f"neighbor ranked twice: {key}"
        seen[key] = r.rk
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rk)
    for qid, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), (qid, rks)


def test_pagerank_storage_flat_across_invocations(spark):
    """Repeated pagerank invocations must not accumulate executor storage
    (round-3 leak: edges.persist() was never released). Each invocation may
    leave only its tiny 20-row checkpointed result behind."""
    _q("graph_pagerank")(spark, SF_SMOKE).collect()
    base = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    _q("graph_pagerank")(spark, SF_SMOKE).collect()
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after - base <= 1, f"storage grew {base}->{after} on reinvocation"
