"""spatial_nest (pure-Catalyst HEALPix nest4096) cross-validation.

Three-way agreement: the Catalyst-expression pixel id must equal the numpy
reference (functions/spatial.py:ang2pix_nest) on the identical golden-angle
pseudo-sky, and the pandas-UDF spatial_cols nest4096 column must agree too
(it IS the numpy path, via a different ra/dec derivation that the fixture's
asin/sin cancellation makes numerically equivalent).
"""

import numpy as np

from fits2db_spark.functions.spatial import ang2pix_nest
from fits2db_spark.operators.etl import spatial_cols, spatial_nest

from tests.conftest import SF_SMOKE


def test_nest_matches_numpy_reference(spark):
    rows = spatial_nest(spark, SF_SMOKE).collect()
    keys = np.array([r["c_custkey"] for r in rows], dtype="f8")
    got = np.array([r["nest4096"] for r in rows])
    ra = (keys * 137.50776405) % 360.0
    dec = np.degrees(np.arcsin(((keys * 0.6180339887) % 1.0) * 2 - 1))
    want = ang2pix_nest(4096, ra, dec)
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{len(rows)} pixels differ from numpy"
    assert got.min() >= 0 and got.max() < 12 * 4096 * 4096


def test_nest_matches_spatial_cols_udf(spark):
    catalyst = {
        r["c_custkey"]: r["nest4096"] for r in spatial_nest(spark, SF_SMOKE).collect()
    }
    udf = {
        r["c_custkey"]: r["nest4096"] for r in spatial_cols(spark, SF_SMOKE).collect()
    }
    assert catalyst == udf


def test_point_in_polygon_matches_matplotlib_free_reference(spark):
    """Ray-casting parity vs an independent pure-python winding check."""
    from fits2db_spark.operators.etl import _PIP_POLY, spatial_point_in_polygon

    rows = spatial_point_in_polygon(spark, SF_SMOKE).collect()
    assert rows

    def inside_ref(x, y):
        n, c = len(_PIP_POLY), False
        for i in range(n):
            x1, y1 = _PIP_POLY[i]
            x2, y2 = _PIP_POLY[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < x1 + (x2 - x1) * (y - y1) / (y2 - y1):
                c = not c
        return c

    mism = [r for r in rows if r["inside"] != inside_ref(r["lon"], r["lat"])]
    assert not mism, mism[:3]
    # the hexagon covers a nontrivial fraction of the plane
    frac = sum(r["inside"] for r in rows) / len(rows)
    assert 0.05 < frac < 0.8, frac


def test_spatial_ring_matches_numpy_and_udf(spark):
    """r7: the ring-scheme Catalyst twin — three-way agreement like nest."""
    from fits2db_spark.functions.spatial import ang2pix_ring
    from fits2db_spark.operators.etl import spatial_ring

    rows = spatial_ring(spark, SF_SMOKE).collect()
    keys = np.array([r["c_custkey"] for r in rows], dtype="f8")
    got = np.array([r["ring256"] for r in rows])
    ra = (keys * 137.50776405) % 360.0
    dec = np.degrees(np.arcsin(((keys * 0.6180339887) % 1.0) * 2 - 1))
    want = ang2pix_ring(256, ra, dec)
    mismatch = int((got != want).sum())
    assert mismatch == 0, f"{mismatch}/{len(rows)} pixels differ from numpy"
    assert got.min() >= 0 and got.max() < 12 * 256 * 256
    udf = {r["c_custkey"]: r["ring256"] for r in spatial_cols(spark, SF_SMOKE).collect()}
    assert {r["c_custkey"]: r["ring256"] for r in rows} == udf


def test_spatial_htm_matches_numpy_and_udf(spark):
    """r8: the LAST spatial_cols index column gets its Catalyst twin —
    three-way numpy/UDF/SQL-expression agreement like nest and ring."""
    from fits2db_spark.functions.spatial import radec_to_htm
    from fits2db_spark.operators.etl import spatial_htm

    rows = spatial_htm(spark, SF_SMOKE).collect()
    keys = np.array([r["c_custkey"] for r in rows], dtype="f8")
    got = np.array([r["htm9"] for r in rows])
    ra = (keys * 137.50776405) % 360.0
    dec = np.degrees(np.arcsin(((keys * 0.6180339887) % 1.0) * 2 - 1))
    want = radec_to_htm(9, ra, dec)
    assert int((got != want).sum()) == 0
    # level-9 id range: [8*4^9, 16*4^9)
    assert got.min() >= 8 * 4**9 and got.max() < 16 * 4**9
    udf = {
        r["c_custkey"]: r["htm9"] for r in spatial_cols(spark, SF_SMOKE).collect()
    }
    assert {r["c_custkey"]: r["htm9"] for r in rows} == udf


def test_spatial_twins_dense_key_sweep(spark, tmp_path):
    """r8 hardening: the three Catalyst index twins agree with numpy over a
    DENSE key range (1..20000 — 133x the smoke fixture's 150 customers),
    hunting floor/mod/edge-plane boundary flips the fixture can't reach."""
    import pandas as pd

    from fits2db_spark.functions.spatial import (
        ang2pix_nest,
        ang2pix_ring,
        radec_to_htm,
    )
    from fits2db_spark.operators.etl import spatial_htm, spatial_nest, spatial_ring

    n = 20000
    pd.DataFrame(
        {
            "c_custkey": range(1, n + 1),
            "c_name": "x",
            "c_nationkey": pd.array([0] * n, dtype="int32"),
            "c_acctbal": 0.0,
            "c_mktsegment": "y",
        }
    ).to_parquet(tmp_path / "customer.parquet")
    keys = np.arange(1, n + 1, dtype="f8")
    ra = (keys * 137.50776405) % 360.0
    dec = np.degrees(np.arcsin(((keys * 0.6180339887) % 1.0) * 2 - 1))
    sf = str(tmp_path)
    for op, col, ref, nside in (
        (spatial_ring, "ring256", ang2pix_ring, 256),
        (spatial_htm, "htm9", None, None),
    ):
        rows = {r["c_custkey"]: r[col] for r in op(spark, sf).collect()}
        got = np.array([rows[int(k)] for k in keys])
        want = ref(nside, ra, dec) if ref else radec_to_htm(9, ra, dec)
        mism = int((got != want).sum())
        assert mism == 0, f"{col}: {mism}/{n} mismatches"
    nest = {r["c_custkey"]: r["nest4096"] for r in spatial_nest(spark, sf).collect()}
    got = np.array([nest[int(k)] for k in keys])
    want = ang2pix_nest(4096, ra, dec)
    assert int((got != want).sum()) == 0
