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
# WITNESS RECENCY. The round-11 slate (VERDICT r10 #1 ask) = the 5
# proven-green SENTINELS (canaries for environment drift like round
# 2's events.ts break — one per major subsystem: agg/window/
# streaming/json/asof), then the round-11 queue staged at 51+ last
# round (the remaining r1/r2-era re-witnesses: filters, outer
# joins, set ops, windows, TPC-H q8/q18, scan/DPP plans), topped up
# with the next-stalest r2-era rows. Proposal computed mechanically
# by scripts/rotate_slate.py from CORRECTNESS_r*.json history.
# Positions 51+ pre-queue round 12 (r2-era functions/windows tail).
_PRIORITY: list[str] = [
    # sentinels (driver-PASS every round r1-r11; re-run each round)
    "agg_groupby", "win_frame_range", "stream_tumbling",
    "fn_json", "join_asof",
    # round-12 slate: the r2-era functions/windows tail plus the
    # r3-era streaming ops T2/T3/T5/T6/T7 (VERDICT r11 ask #1) —
    # stalest-driver-witness-first per scripts/rotate_slate.py
    "agg_collect", "llm_text_stats", "llm_lang_id", "llm_fingerprint",
    "llm_simhash", "ml_tokenize_tf", "scan_projected", "limit_topk",
    "sql_recursive_cte", "udtf_grouped_map", "udtf_python",
    "win_topk_per_group", "win_percent", "fn_array", "fn_explode", "fn_map",
    "fn_struct", "fn_date", "fn_math", "fn_cast_null", "fn_string", "fn_hash",
    "stream_join", "agg_stats_higher", "agg_pivot", "etl_scd2",
    "llm_repetition_score", "llm_contamination", "llm_quota_sample",
    "llm_mix_rebalance", "llm_prefix_dedup", "llm_unigram_logprob",
    "ml_tfidf", "ml_ngram_stopwords", "ml_word_count", "ml_sentiment_lexicon",
    "ml_linreg", "mm_binary_metadata", "mm_decode_wav_ppm",
    "stream_sliding", "stream_session", "stream_dedup",
    "stream_stateful_custom", "stream_stream_join", "stream_foreach_batch",
    # ---- position 51+: round-13 queue (not in this round's slate) --
    "win_sessionize", "events_funnel", "events_retention", "tpch_q5",
    "tpch_q10", "tpch_q7", "tpch_q17", "fn_variant", "graph_bfs",
    "llm_multimodal_join", "llm_quality_filter", "llm_incremental_dedup",
    "llm_quality_scorecard", "ml_eval", "ml_scaler_pca", "scan_parquet",
    "scan_csv", "scan_json_lines", "sink_parquet", "sink_bucketed",
    "sink_csv_roundtrip", "etl_compact_small_files", "sink_zorder",
    "scan_schema_evolution", "etl_partition_overwrite", "scan_orc",
    "scan_text", "sql_scalar_subquery", "sql_exists_in", "sql_cte",
    "sql_lateral_view", "sql_lateral_join",
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
