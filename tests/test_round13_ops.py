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
