"""Query + oracle registry backing ``__spark_entry__``.

Operator modules register callables with :func:`register`; the driver-facing
``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` are thin wrappers
over :func:`all_queries` / :func:`all_oracles`.

Contract (SURVEY.md §3.3, __spark_entry__.py docstring):
* every callable takes ``(spark, sf_dir)`` and returns an *unexecuted*
  DataFrame;
* every computed column is aliased identically in the Spark query and the
  oracle SQL (the driver sorts columns by name before hashing);
* queries whose results are not SQL-reproducible (RNG, Spark-specific hashes,
  approximate aggregates, live streaming semantics) register with
  ``oracle=None`` → the driver records a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Operator modules to import for registration side effects.
_OPERATOR_MODULES = (
    "fits2db_spark.operators.scans",
    "fits2db_spark.operators.etl",
    "fits2db_spark.operators.joins",
    "fits2db_spark.operators.aggregates",
    "fits2db_spark.operators.windows",
    "fits2db_spark.operators.sorts_sets",
    "fits2db_spark.operators.scalar_functions",
    "fits2db_spark.operators.llm_text",
    "fits2db_spark.operators.llm_vectors",
    "fits2db_spark.operators.multimodal",
    "fits2db_spark.operators.streaming_batch",
    "fits2db_spark.operators.udfs",
    "fits2db_spark.operators.advanced",
    "fits2db_spark.operators.pipeline",
    "fits2db_spark.operators.stats",
    "fits2db_spark.operators.inference",
    "fits2db_spark.operators.warehouse",
    "fits2db_spark.operators.sql_api",
    "fits2db_spark.operators.retrieval",
)

_loaded = False

# The external driver verifies queries in dict-iteration order and may stop
# after a fixed budget (~50 keys per round). Round-7 window, computed from
# CORRECTNESS_r01∪…∪r06 (r06 covered the first 50 of the r6 queue, 50/50
# green):
# (a) keys whose ORACLE changed in round 7 (the two vacuous 0-row oracles
#     were de-vacuated, text_bigram_kn gained a 1-token guard) — their old
#     driver rows no longer attest the current check, so they lead;
# (b) the 49 remaining oracled-but-never-driver-checked keys (retrieval/
#     graph/stats/privacy families + TPC-H q2..q22) — positions 4-50;
#     7 low-risk keys spill to round 8;
# (c) keys whose code changed in r6/r7 without a post-change driver row;
# (d) the stalest-green rotation backlog (r01 rows first).
_PRIORITY_QUERIES = (
    # (a) oracle changed in round 7
    "subquery_scalar",
    "sql_tpch_q11",
    "text_bigram_kn",
    # (b) never driver-checked — heavyweight composites first
    "text_bm25",
    "join_bloom_filter",
    "sim_ann_binary",
    "sim_rrf_fusion",
    "sim_mmr_rerank",
    "dedup_incremental_minhash",
    "bpe_train_merges",
    "text_keyphrase_rake",
    "text_importance_dsir",
    "vec_power_iteration",
    "graph_kcore",
    "graph_node_similarity",
    "cms_heavy_hitters",
    "privacy_k_anonymity",
    "agg_hll_deterministic",
    "agg_theilsen",
    "agg_bootstrap_ci",
    "events_sax",
    "events_periodogram",
    "events_forecast_backtest",
    "orders_cohort_ltv",
    "join_xmatch_nearest",
    "join_geohash_prefix",
    "spatial_nest",
    "spatial_geohash",
    "spatial_point_in_polygon",
    "stream_live_enrich",
    "sync_merkle_buckets",
    "sql_recursive_hierarchy",
    "ml_feature_hash",
    "sql_tpch_q2",
    "sql_tpch_q4",
    "sql_tpch_q5",
    "sql_tpch_q7",
    "sql_tpch_q8",
    "sql_tpch_q9",
    "sql_tpch_q10",
    "sql_tpch_q12",
    "sql_tpch_q13",
    "sql_tpch_q14",
    "sql_tpch_q15",
    "sql_tpch_q16",
    "sql_tpch_q17",
    "sql_tpch_q19",
    "sql_tpch_q20",
    "sql_tpch_q21",
    "sql_tpch_q22",
    # (b) spill to round 8 (positions 51-57)
    "sql_pivot",
    "sql_unpivot",
    "fn_mask",
    "fn_geo",
    "scan_fixed_width",
    "scan_csv_corrupt",
    "stream_live_sliding",
    # (c) code changed in r6/r7 without a post-change driver row
    # (text_bigram_lm's r7 guard is provably a no-op on the fixtures —
    # pytest-pinned — but re-verify anyway)
    "orders_rfm",
    "join_star_q5",
    "spatial_cols",
    "text_bigram_lm",
    "spatial_ring",
    "dedup_substring_windows",
    "scan_xml",
    "events_holt_trend",
    "mm_audio_segments",
    "fn_astro",
    "privacy_dp_counts",
    "mm_patch_grid",
    "events_haar_wavelet",
    "sim_maxsim_late_interaction",
    "spatial_region_assign",
    "agg_kmv_intersection",
    "win_cumulative_distinct",
    "events_peak_detection",
    "pipeline_fits_catalog_e2e",
    "mm_scene_cuts",
    # (d) stalest-green rotation backlog
    "join_sortmerge",
    "agg_groupby",
    "win_topk_per_group",
    "topk_global",
    "join_asof",
    "fits_ingest",
    # loader / scan surface (r01-stale)
    "scan_parquet",
    "scan_csv",
    "scan_json",
    "multi_file_union",
    # joins family (r01-stale)
    "join_inner_hash",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_range",
    "join_self_pairs",
    # windows family (r01-stale)
    "win_row_number",
    "win_rank",
    "win_lag_lead",
    "win_running_sum",
    "win_moving_avg",
    "win_first_last",
    # aggregates family (r01-stale)
    "agg_global",
    "agg_having",
    "agg_count_distinct",
    "agg_stats",
    "agg_percentile",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_conditional",
)
_PRIORITY_MODULE_ORDER = (
    "fits2db_spark.operators.llm_text",
    "fits2db_spark.operators.llm_vectors",
    "fits2db_spark.operators.multimodal",
    "fits2db_spark.operators.streaming_batch",
    "fits2db_spark.operators.udfs",
    "fits2db_spark.operators.scalar_functions",
    "fits2db_spark.operators.advanced",
)

# Queries forced to the END of the ordering regardless of module: round-2+
# additions that must not displace the curated first-50 verification window
# (they are oracle-verified locally via tools/check_oracle.py either way).
_DEPRIORITIZED: set[str] = set()


def deprioritize(*names: str) -> None:
    _DEPRIORITIZED.update(names)


def _ordered_names() -> list[str]:
    by_module: dict[str, list[str]] = {}
    for name, fn in _QUERIES.items():
        by_module.setdefault(getattr(fn, "__wrapped__", fn).__module__, []).append(name)
    out = [n for n in _PRIORITY_QUERIES if n in _QUERIES]
    for mod in _PRIORITY_MODULE_ORDER:
        out.extend(
            n for n in by_module.get(mod, []) if n not in out and n not in _DEPRIORITIZED
        )
    out.extend(n for n in _QUERIES if n not in out and n not in _DEPRIORITIZED)
    out.extend(n for n in _QUERIES if n in _DEPRIORITIZED and n not in out)
    return out


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # every entry point guarantees runtime confs + package shipping
            # (the external harness provides a bare session from any cwd)
            from .session import ensure_runtime_confs

            return fn(ensure_runtime_confs(spark), sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all_modules() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {n: _QUERIES[n] for n in _ordered_names()}


def all_oracles() -> dict[str, str]:
    _load_all_modules()
    return {n: _ORACLES[n] for n in _ordered_names() if n in _ORACLES}
