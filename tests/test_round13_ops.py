"""Round-13 regression tests: the two r12 ADVICE code fixes.

* ``_spark_round`` must pass non-finite values through unchanged (Spark's
  ROUND returns nan/inf as-is; ``Decimal('Infinity').quantize`` raises
  ``decimal.InvalidOperation`` and would kill the whole Arrow task).
* ``fits_datasource_pushdown`` must reuse ONE localCheckpoint per
  (session, sf_dir) instead of accumulating a new checkpointed RDD in the
  block manager on every invocation (bench runs call it repeatedly).
"""

import math

from tests.conftest import SF_SMOKE


def test_spark_round_passes_non_finite_through():
    from fits2db_spark.operators.joins import _spark_round

    out = _spark_round(
        [1.2345, float("nan"), float("inf"), float("-inf"), 2.675, -2.675], 2
    )
    assert list(out[:1]) == [1.23]
    assert math.isnan(out[1])
    assert out[2] == float("inf") and out[3] == float("-inf")
    # HALF_UP on the repr-shortest decimal, unlike np.round's half-even.
    assert list(out[4:]) == [2.68, -2.68]


def test_spark_round_matches_spark_on_halfway_reprs(spark):
    """Spot-check the decimal-string HALF_UP path against the engine."""
    from pyspark.sql import functions as F

    from fits2db_spark.operators.joins import _spark_round

    vals = [2.675, 2.665, -2.675, 0.125, 1.005, 3.14159, 1e15 + 0.5]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(F.round("x", 2)).collect()]
    assert got == list(_spark_round(vals, 2))


def test_fits_datasource_pushdown_checkpoint_is_memoized(spark):
    from fits2db_spark.operators import scans

    scans._PUSHDOWN_CKPT_CACHE.clear()
    a = scans.fits_datasource_pushdown(spark, SF_SMOKE)
    b = scans.fits_datasource_pushdown(spark, SF_SMOKE)
    assert a is b, "repeated invocations must reuse the cached checkpoint"
    assert len(scans._PUSHDOWN_CKPT_CACHE) == 1
    assert a.count() == b.count()


def test_write_fits_dataset_roundtrip_nulls_scale_multifile(spark, tmp_path):
    """write_fits_dataset: N partitions -> N files, TNULL sentinels stand in
    for SQL NULLs on disk and come back as NULLs, TSCAL decodes physically."""
    import glob
    import os

    from pyspark.sql import functions as F

    from fits2db_spark.sources.fits import read_fits, write_fits_dataset

    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("id") * 3).cast("int"))
        .alias("maybe"),
        (F.col("id") * 25).cast("int").alias("cents"),
    ).repartitionByRange(3, "k")

    out = str(tmp_path / "ds")
    n = write_fits_dataset(
        df,
        out,
        tforms={"k": "K", "label": "A16", "maybe": "J", "cents": "J"},
        extname="RT",
        extra_cards=[("TSCAL4", 0.01), ("TUNIT4", "usd")],
        tnulls={"maybe": -1},
    )
    assert n == 40
    files = sorted(glob.glob(os.path.join(out, "part-*.fits")))
    assert len(files) == 3, "one file per non-empty partition"

    back = read_fits(spark, out, hdu="RT")
    rows = {r.k: r for r in back.collect()}
    assert len(rows) == 40
    assert rows[10].maybe is None and rows[11].maybe == 33
    assert rows[7].cents == 0.01 * (7 * 25)
    assert rows[3].label == "row-3"
    # unit card survives into column metadata
    meta = {f.name: (f.metadata or {}) for f in back.schema.fields}
    assert meta["cents"].get("fits.tunit") == "usd"


def test_write_fits_dataset_task_commit_is_atomic_and_tmp_invisible(
    spark, tmp_path
):
    """ADVICE r13: tasks must never open the final part path directly.
    After a successful write no temp files remain; a leftover dot-prefixed
    temp from a (simulated) killed attempt is hidden from the read-back
    binaryFile scan, so a retry that re-wrote the real part is unaffected."""
    import glob
    import os

    from pyspark.sql import functions as F

    from fits2db_spark.sources.fits import read_fits, write_fits_dataset

    df = spark.range(0, 12).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("int").alias("v")
    ).repartitionByRange(2, "k")
    out = str(tmp_path / "ds")
    write_fits_dataset(df, out, tforms={"k": "K", "v": "J"}, extname="RT")
    assert not glob.glob(os.path.join(out, "*.tmp")), "temp files left behind"
    assert not glob.glob(os.path.join(out, ".*.tmp")), "temp files left behind"
    # simulate a killed attempt's orphan: truncated garbage under a hidden name
    with open(os.path.join(out, ".part-00099.attempt-7.tmp"), "wb") as f:
        f.write(b"SIMPLE  =      T / truncated torso")
    back = read_fits(spark, out, hdu="RT")
    assert back.count() == 12, "hidden temp file leaked into the scan"


def test_write_fits_dataset_requires_tform_for_every_column(spark, tmp_path):
    import pytest

    from fits2db_spark.sources.fits import FitsFormatError, write_fits_dataset

    df = spark.range(3).selectExpr("id AS a", "id AS b")
    with pytest.raises(FitsFormatError, match="b"):
        write_fits_dataset(df, str(tmp_path / "x"), tforms={"a": "K"})


def test_xmatch_healpix_agrees_with_zone_join(spark):
    """The pixel-sharded cross-match and the dec-zone cross-match are two
    blocking schemes over the same exact-verification predicate — their
    (a_id, b_id, sep) result sets must be identical, and every healpix
    match must carry the A-side shard pixel spatial-nest-style blocking
    would put that object in."""
    from fits2db_spark.operators.joins import join_xmatch_healpix, join_xmatch_zone

    sf = "/root/testdata/sf0.001"
    zone = {
        (r.a_id, r.b_id, r.sep_arcsec) for r in join_xmatch_zone(spark, sf).collect()
    }
    hp_rows = join_xmatch_healpix(spark, sf).collect()
    hp = {(r.a_id, r.b_id, r.sep_arcsec) for r in hp_rows}
    assert hp == zone
    assert len(hp_rows) == len(hp), "pixel probes must not duplicate pairs"
    assert all(0 <= r.shard_pix < 12 * 16 * 16 for r in hp_rows)


def test_image_blank_masks_before_scaling(spark, tmp_path):
    """BLANK is matched on RAW stored values (pre-BSCALE/BZERO); non-blank
    pixels scale normally; float images ignore BLANK by the standard."""
    import numpy as np
    import pytest

    from fits2db_spark.sources.fits import (
        FitsFormatError,
        read_fits_image,
        write_fits_image,
    )

    img = np.array([[1, 2], [-99, 4]], dtype="i2")
    p = tmp_path / "b.fits"
    p.write_bytes(
        write_fits_image(img, bscale=2.0, bzero=10.0, extname="X", blank=-99)
    )
    rows = {(r.x, r.y): r.val for r in read_fits_image(spark, str(p), hdu="X").collect()}
    assert rows[(0, 1)] is None, "BLANK pixel must decode to NULL"
    assert rows[(0, 0)] == 12.0 and rows[(1, 1)] == 18.0
    with pytest.raises(FitsFormatError, match="BLANK"):
        write_fits_image(np.zeros((2, 2), dtype="f4"), blank=0)


def test_cube_blank_masks_voxels(spark, tmp_path):
    import numpy as np

    from fits2db_spark.sources.fits import read_fits_cube, write_fits_cube

    cube = np.arange(2 * 2 * 3, dtype="i4").reshape(2, 2, 3)
    cube[1, 0, 2] = -7
    p = tmp_path / "c.fits"
    p.write_bytes(write_fits_cube(cube, bscale=2.0, extname="C", blank=-7))
    rows = {
        (r.x, r.y, r.z): r.val
        for r in read_fits_cube(spark, str(p), hdu="C").collect()
    }
    assert rows[(2, 0, 1)] is None
    assert rows[(0, 0, 0)] == 0.0 and rows[(2, 1, 1)] == 22.0


def test_global_shuffle_is_deterministic_and_balanced(spark):
    """pipeline_global_shuffle: same result across invocations (no RNG
    state), every doc appears exactly once, shards are load-balanced, and
    positions are a contiguous 1..n_shard sequence."""
    from fits2db_spark.operators.pipeline import _GS_SHARDS, pipeline_global_shuffle

    sf = "/root/testdata/sf0.001"
    a = pipeline_global_shuffle(spark, sf).collect()
    b = pipeline_global_shuffle(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    docs = [r.doc_id for r in a]
    assert len(docs) == len(set(docs))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(_GS_SHARDS))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * min(sizes), f"shard skew: {sizes}"
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_votable_tabledata_reader_escaping_and_nulls(spark, tmp_path):
    """read_votable_tabledata inverts the writer's escaping and the
    empty-TD null convention, including XML-special characters."""
    from fits2db_spark.sinks.votable import (
        read_votable_tabledata,
        write_votable_fragments,
    )

    df = spark.createDataFrame(
        [(1, "a<b&c>d", "x"), (2, 'q"u\'o', None), (3, "", "y")],
        "k int, s string, maybe string",
    ).coalesce(1)
    out = str(tmp_path / "vot")
    write_votable_fragments(df, out)
    back = read_votable_tabledata(
        spark, f"{out}/rows/part-*", ["k", "s", "maybe"]
    )
    rows = {int(r.k): r for r in back.collect()}
    assert rows[1].s == "a<b&c>d" and rows[1].maybe == "x"
    assert rows[2].s == 'q"u\'o' and rows[2].maybe is None
    # VOTable cannot distinguish empty string from NULL — documented
    assert rows[3].s is None
