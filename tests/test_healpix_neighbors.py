"""Geometric validation of the nested-HEALPix neighbor walk
(operators/joins.py:_nest_neighbor_pix_df) and the cone-cover property it
gives join_xmatch_healpix (ADVICE r13 medium item).

The neighbor tables are validated against geometry, not against a second
implementation: for tens of thousands of random point pairs at an angular
separation far below the pixel width, the second point's pixel MUST be the
first point's pixel or one of its 8 neighbors.  Pairs are drawn uniformly
over the sphere (poles included via asin of a uniform z), so face seams,
polar corners, and the equatorial/polar transition are all crossed many
times; a single wrong facearray/swaparray entry fails hundreds of pairs.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fits2db_spark.operators.joins import (
    _HPX_NSIDE,
    _nest_fxy_cols,
    _nest_neighbor_pix_df,
    _nest_pix_col,
)

N_PAIRS = 20_000  # ~20% cross a pixel boundary at this step/nside
# Step well below the minimum pixel width (~1.8 deg at nside=16) but large
# enough that many pairs cross a pixel boundary.
STEP_DEG = 0.35


def _pairs_df(spark):
    rng = np.random.default_rng(20260816)
    ra1 = rng.uniform(0.0, 360.0, N_PAIRS)
    dec1 = np.degrees(np.arcsin(rng.uniform(-1.0, 1.0, N_PAIRS)))
    theta = rng.uniform(0.0, 2 * math.pi, N_PAIRS)
    # Small-step offset on the tangent plane; clamp dec, wrap ra.
    dec2 = np.clip(dec1 + STEP_DEG * np.sin(theta), -89.9999, 89.9999)
    ra2 = np.mod(
        ra1 + STEP_DEG * np.cos(theta) / np.cos(np.radians(np.clip(dec1, -89.0, 89.0))),
        360.0,
    )
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {"i": np.arange(N_PAIRS), "ra1": ra1, "dec1": dec1, "ra2": ra2, "dec2": dec2}
        )
    )


def _pix(ra, dec, nside):
    z = F.sin(F.radians(dec))
    tt = (((ra % 360.0) + 360.0) % 360.0) / 90.0
    return _nest_pix_col(z, tt, nside)


def _with_fxy(df, ra, dec, nside):
    z = F.sin(F.radians(dec))
    tt = (((ra % 360.0) + 360.0) % 360.0) / 90.0
    f, x, y = _nest_fxy_cols(z, tt, nside)
    return df.select(
        *df.columns, f.alias("_f"), x.alias("_x"), y.alias("_y")
    )


def _covers(spark, nside):
    """One row per pair: p1's 9-pixel cover as `nb`, plus p1/p2."""
    df = _pairs_df(spark).select(
        "i",
        "ra1",
        "dec1",
        _pix(F.col("ra1"), F.col("dec1"), nside).alias("p1"),
        _pix(F.col("ra2"), F.col("dec2"), nside).alias("p2"),
    )
    fxy = _with_fxy(df, F.col("ra1"), F.col("dec1"), nside)
    exploded = _nest_neighbor_pix_df(fxy, "_f", "_x", "_y", nside, out="nb_pix")
    return exploded.groupBy("i").agg(
        F.first("p1").alias("p1"),
        F.first("p2").alias("p2"),
        F.collect_list("nb_pix").alias("nb"),
    )


@pytest.mark.parametrize("nside", [16, 64])
def test_nearby_point_is_always_in_neighbor_cover(spark, nside):
    agg = (
        _covers(spark, nside)
        .select(
            F.sum((~F.array_contains("nb", F.col("p2"))).cast("long")).alias(
                "misses"
            ),
            F.sum((F.col("p1") != F.col("p2")).cast("long")).alias("crossers"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert agg["n"] == N_PAIRS
    # the step must actually cross boundaries often, else the test is vacuous
    assert agg["crossers"] > N_PAIRS // 20, agg
    assert agg["misses"] == 0, f"{agg['misses']} nearby points not covered"


def test_neighbor_set_shape(spark):
    """9 (interior/edge) or 8 (polar corner) DISTINCT cover pixels — a
    duplicate would double-emit candidate pairs in the sharded join — the
    pixel itself always among them (collect_list order after groupBy is
    nondeterministic, so containment, not position), all ids valid, on a
    sweep that touches every face."""
    npix = 12 * _HPX_NSIDE * _HPX_NSIDE
    agg = (
        _covers(spark, _HPX_NSIDE)
        .select(
            F.size(F.array_distinct("nb")).alias("nd"),
            F.size("nb").alias("n"),
            (~F.array_contains("nb", F.col("p1"))).cast("long").alias("no_self"),
            F.exists("nb", lambda v: (v < 0) | (v >= npix)).cast("long").alias("oor"),
        )
        .select(
            F.min("nd").alias("lo"),
            F.max("nd").alias("hi"),
            F.sum((F.col("nd") != F.col("n")).cast("long")).alias("dupes"),
            F.sum("no_self").alias("no_self"),
            F.sum("oor").alias("out_of_range"),
        )
        .collect()[0]
    )
    assert 8 <= agg["lo"] <= agg["hi"] <= 9, agg
    assert agg["dupes"] == 0, "a pixel appeared twice in one cover"
    assert agg["no_self"] == 0
    assert agg["out_of_range"] == 0


def test_neighborhood_is_symmetric(spark):
    """If q is in cover(p) then p is in cover(q) — a strong consistency
    check on the cross-face coordinate transforms (a wrong swap bit breaks
    symmetry even when the face mapping is right)."""
    covers = _covers(spark, _HPX_NSIDE).select("p1", "nb")
    edges = covers.select(
        "p1", F.explode("nb").alias("p2")
    ).filter(F.col("p1") != F.col("p2")).distinct()
    rev = edges.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    p1s = covers.select("p1").distinct().withColumnRenamed("p1", "p2")
    # only pixels we sampled as a p1 have a computed cover to check against
    missing = edges.join(p1s, "p2").exceptAll(rev).count()
    assert missing == 0


def test_healpix_xmatch_matches_zone_xmatch(spark):
    """End-to-end: the sharded cross-match must produce exactly the pairs
    the independently-implemented dec-zone cross-match produces on the
    same fixture (both verify with the exact haversine)."""
    from fits2db_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    hp = {
        (r["a_id"], r["b_id"])
        for r in qs["join_xmatch_healpix"](spark, sf).collect()
    }
    zone = {
        (r["a_id"], r["b_id"]) for r in qs["join_xmatch_zone"](spark, sf).collect()
    }
    assert hp == zone
