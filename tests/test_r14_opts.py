"""Round-14 optimization-round internals: the data-volume-adaptive xmatch
ladder and the k-core convergence early-exit must not change what any query
computes (the oracle pins end-to-end equality; these pin the specific
invariants the optimizations rely on)."""

from tests.conftest import SF_SMOKE


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_xm_singlepass_at_fixture_scale(spark):
    """Below _XM_LADDER_MIN_ROWS objects the ladder is skipped: no rung
    checkpoint is memoized, so the whole match is the one full-radius
    pass (the plan-shape claim in OPTIMIZATION_r14.md)."""
    from fits2db_spark.operators import joins as J

    assert J._catalog_rows(SF_SMOKE) < J._XM_LADDER_MIN_ROWS
    J.clear_xm_p1_cache()
    J.join_xmatch_knn(spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()
    assert J._XM_P1_CACHE == {}, "single-pass path must not build rung memos"


def test_xm_ladder_and_singlepass_agree(spark, monkeypatch):
    """The ladder is a pure plan optimization: forcing it on at fixture
    scale must return row-identical results to the single pass."""
    from fits2db_spark.operators import joins as J

    J.clear_xm_p1_cache()
    single = _rows(
        J.join_xmatch_knn(spark, SF_SMOKE), "b_id", "a_id", "rk", "sep_arcsec_floor"
    )
    monkeypatch.setattr(J, "_XM_LADDER_MIN_ROWS", 0)
    J.clear_xm_p1_cache()
    laddered = _rows(
        J.join_xmatch_knn(spark, SF_SMOKE), "b_id", "a_id", "rk", "sep_arcsec_floor"
    )
    J.clear_xm_p1_cache()
    assert single == laddered
    assert len(single) > 0


def test_xm_catalog_rows_unreadable_falls_back_to_ladder(tmp_path):
    """Unknown catalog size must take the scale-safe (ladder) branch."""
    from fits2db_spark.operators import joins as J

    assert J._catalog_rows(str(tmp_path)) >= J._XM_LADDER_MIN_ROWS


def test_kcore_unroll_invariance(spark, monkeypatch):
    """The early-exit's correctness argument: once a peel round removes no
    edge, every further round is the identity — so raising the unroll
    bound must not change the result."""
    from fits2db_spark.operators import advanced as A

    def run():
        A._TRI_EDGE_CACHE.clear()
        return _rows(A.graph_kcore(spark, SF_SMOKE), "node", "core_degree")

    base = run()
    monkeypatch.setattr(A, "_KCORE_ROUNDS", A._KCORE_ROUNDS + 3)
    more = run()
    A._TRI_EDGE_CACHE.clear()
    assert base == more


def test_probe_keys_cold_flag_importable():
    """tools/probe_keys.py is part of the round's measurement evidence —
    keep it importable (syntax/name errors surface here, not mid-probe)."""
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parents[1] / "tools" / "probe_keys.py"
    spec = importlib.util.spec_from_file_location("probe_keys", p)
    mod = importlib.util.module_from_spec(spec)
    assert spec and spec.loader
    # import only (main() guarded); no Spark session is built
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main")
