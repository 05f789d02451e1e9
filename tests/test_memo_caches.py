"""Boundedness of the per-session memoized localCheckpoint caches
(VERDICT r13 item 6 / ADVICE r13): the evict hook frees block-manager
storage, and inserting a new sf_dir displaces entries of old ones, so a
session never accumulates checkpoint blocks across scale factors or tiers.
"""

import pytest

from fits2db_spark.operators import joins, scans
from fits2db_spark.registry import all_queries
from fits2db_spark.session import free_memo_checkpoints

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


@pytest.fixture(autouse=True)
def _force_ladder(monkeypatch):
    """These tests exercise the phase-1 memo cache, which only populates on
    the radius-ladder path; r14 skips the ladder below _XM_LADDER_MIN_ROWS
    catalog rows, so at fixture scale the cache would stay empty. Force the
    ladder on so the cache lifecycle under test actually runs."""
    monkeypatch.setattr(joins, "_XM_LADDER_MIN_ROWS", 0)


def _storage_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_free_memo_checkpoints_empties_caches_and_storage(spark):
    free_memo_checkpoints()
    base = _storage_count(spark)
    qs = all_queries()
    qs["join_xmatch_nearest"](spark, SF_A).count()
    scans.fits_datasource_pushdown(spark, SF_A).count()
    assert joins._XM_P1_CACHE and scans._PUSHDOWN_CKPT_CACHE
    assert _storage_count(spark) > base
    free_memo_checkpoints()
    assert not joins._XM_P1_CACHE and not scans._PUSHDOWN_CKPT_CACHE
    assert _storage_count(spark) <= base, "checkpoint blocks not freed"
    # caches rebuild transparently on the next invocation
    assert qs["join_xmatch_nearest"](spark, SF_A).count() > 0
    assert len(joins._XM_P1_CACHE) == len(joins._XM_LADDER)


def test_new_sf_dir_displaces_old_checkpoints(spark):
    free_memo_checkpoints()
    qs = all_queries()
    qs["join_xmatch_nearest"](spark, SF_A).count()
    assert {k[1] for k in joins._XM_P1_CACHE} == {SF_A}
    qs["join_xmatch_nearest"](spark, SF_B).count()
    assert {k[1] for k in joins._XM_P1_CACHE} == {SF_B}, (
        "old sf_dir's checkpoints must be evicted on displacement"
    )
    scans.fits_datasource_pushdown(spark, SF_A).count()
    scans.fits_datasource_pushdown(spark, SF_B).count()
    assert {k[1] for k in scans._PUSHDOWN_CKPT_CACHE} == {SF_B}
    free_memo_checkpoints()


def test_same_sf_dir_keeps_multiple_ops(spark):
    """Displacement is by sf_dir, not total size: nearest + knn at one
    sf_dir coexist (both are consumed by the same bench tier)."""
    free_memo_checkpoints()
    qs = all_queries()
    qs["join_xmatch_nearest"](spark, SF_A).count()
    qs["join_xmatch_knn"](spark, SF_A).count()
    prefixes = {k[2].rsplit("_r", 1)[0] for k in joins._XM_P1_CACHE}
    assert prefixes == {"nearest", "knn"}, prefixes
    assert len(joins._XM_P1_CACHE) == 2 * len(joins._XM_LADDER)
    free_memo_checkpoints()
