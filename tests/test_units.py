"""Unit tests: name normalization, NaN handling, spatial index sanity,
minhash/LSH recall vs exact Jaccard (SURVEY.md §5.2)."""

import numpy as np

from pyspark.sql import functions as F

from fits2db_spark.operators.etl import sql_safe_name, with_sql_safe_names
from tests.conftest import SF_SMOKE


def test_sql_safe_name():
    assert sql_safe_name("RA (J2000)") == "ra_j2000"
    assert sql_safe_name("2MASS_ID") == "c_2mass_id"
    assert sql_safe_name("select") == "select_"
    assert sql_safe_name("  Flux-Err  ") == "flux_err"
    assert sql_safe_name("___") == "col"


def test_with_sql_safe_names_dedup(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["A B", "a_b", "ok"])
    out = with_sql_safe_names(df)
    assert out.columns == ["a_b", "a_b_1", "ok"]


def test_nan_and_inf_to_null(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (float("inf",),)], "v double"
    )
    cleaned = df.select(
        F.when(F.isnan("v") | F.col("v").isin(float("inf"), float("-inf")), None)
        .otherwise(F.col("v"))
        .alias("v")
    )
    vals = [r.v for r in cleaned.collect()]
    assert vals.count(None) == 2 and 1.0 in vals


def test_healpix_pixel_ranges_and_uniformity():
    from fits2db_spark.functions.spatial import ang2pix_nest, ang2pix_ring

    rng = np.random.default_rng(0)
    ra = rng.uniform(0, 360, 4000)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, 4000)))
    for nside in (1, 2, 256, 4096):
        r = ang2pix_ring(nside, ra, dec)
        assert r.min() >= 0 and r.max() < 12 * nside * nside
        n = ang2pix_nest(nside, ra, dec)
        assert n.min() >= 0 and n.max() < 12 * nside * nside
    counts = np.bincount(ang2pix_ring(1, ra, dec), minlength=12)
    assert abs(counts - len(ra) / 12).max() < 5 * np.sqrt(len(ra) / 12)


def test_healpix_known_points():
    from fits2db_spark.functions.spatial import ang2pix_nest, ang2pix_ring

    # north polar cap, first ring -> ring pixels 0..3
    assert ang2pix_ring(256, np.array([0.0]), np.array([89.999]))[0] in (0, 1, 2, 3)
    # nested: polar quadrants land in faces 0-3 / 8-11
    faces = ang2pix_nest(256, np.array([45.0, 135.0, 225.0, 315.0]), np.array([89.9] * 4)) // (
        256 * 256
    )
    assert sorted(faces) == [0, 1, 2, 3]
    south = ang2pix_nest(256, np.array([45.0]), np.array([-89.9]))[0] // (256 * 256)
    assert south in (8, 9, 10, 11)


def test_htm_level_and_ranges():
    from fits2db_spark.functions.spatial import radec_to_htm

    rng = np.random.default_rng(1)
    ra = rng.uniform(0, 360, 2000)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, 2000)))
    h9 = radec_to_htm(9, ra, dec)
    assert (h9 >= 8 * 4**9).all() and (h9 < 16 * 4**9).all()
    # prefix property: level-9 id >> 2 == level-8 id
    h8 = radec_to_htm(8, ra, dec)
    assert ((h9 >> 2) == h8).all()


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidate generation must recover the high-similarity pairs the
    exact inverted-index method finds (quality, not just oracle parity)."""
    from fits2db_spark.operators.llm_text import dedup_near_minhash, dedup_ngram_jaccard

    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).filter(F.col("jaccard") >= 0.8).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup_near_minhash(spark, SF_SMOKE).collect()}
    assert exact, "fixture should contain at least one strong near-dup pair"
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 10), f"LSH recall too low: missed {missed}"


def test_runtime_confs_contract(spark):
    """ensure_runtime_confs: pins UTC + Arrow + AQE, right-sizes the
    shuffle width ONLY when the conf was never set on the session, and
    never clobbers an explicit setting — including an explicit 200, which
    is indistinguishable from the default by value but not by
    ``conf.get(key, None)`` (None iff unset)."""
    from fits2db_spark.session import ensure_runtime_confs

    key = "spark.sql.shuffle.partitions"
    original = spark.conf.get(key)
    try:
        # never-set conf -> resized to the core count (clamped to [8,32])
        spark.conf.unset(key)
        if spark.conf.get(key, None) is None:  # unset survives builder confs
            ensure_runtime_confs(spark)
            cores = spark.sparkContext.defaultParallelism
            assert int(spark.conf.get(key)) == min(max(cores, 8), 32)
        # explicit settings -> preserved, even the default-valued 200
        for explicit in ("200", "7"):
            spark.conf.set(key, explicit)
            ensure_runtime_confs(spark)
            assert spark.conf.get(key) == explicit
        # timezone + arrow + AQE pinned unconditionally
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    finally:
        spark.conf.set(key, original)
