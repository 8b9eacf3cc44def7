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
    # sentinels (driver-PASS every round r1-r13; re-run each round)
    "agg_groupby", "win_frame_range", "stream_tumbling",
    "fn_json", "join_asof",
    # round-14 slate (VERDICT r13 ask #1). Never-witnessed first:
    # the r14 newcomer (portable sketch-union twin) and the r13
    # newcomer agg_hll_distinct_portable (the only query of 276
    # without a driver row); then ml_fpgrowth (latest driver row is
    # r10 `no_oracle`, BEFORE its r13 SQL-oracle graduation — this
    # row makes the graduation real in the driver record); then the
    # verdict-named staleness/changed-form cohort — the r9 trio
    # (stream_watermark_late; minhash/knn, which also changed form
    # in the r13 SRP vectorization), the r10 block (J1-J3/J9, A1/
    # A6/A8, L1/L3/L4, sample_hash_deterministic), and the three
    # iterative graph ops whose build-side hints became guarded
    # this round (ADVICE r13: bfs/sssp/lpa now share pagerank's
    # _fact_in_broadcast_range pick).
    "agg_hll_sketch_union_portable", "agg_hll_distinct_portable",
    "ml_fpgrowth",
    "stream_watermark_late", "llm_minhash_lsh_dedup", "llm_knn_join",
    "join_inner_hash", "join_broadcast", "join_sortmerge",
    "join_range_interval", "agg_hash_global", "agg_percentile",
    "agg_grouping_sets", "llm_exact_dedup", "llm_dedup_components",
    "llm_cosine_topk", "sample_hash_deterministic",
    "graph_bfs", "graph_sssp_weighted", "graph_label_propagation",
    # remaining slots: the stalest-witness-first queue computed by
    # scripts/rotate_slate.py (the r4 tpch tail + r5 curation
    # cohort pre-queued by r13)
    "tpch_q13", "tpch_q15", "tpch_q2", "tpch_q11", "tpch_q16",
    "tpch_q20", "tpch_q22", "fn_url", "fn_fuzzy_match", "fn_pseudonymize",
    "agg_mode", "dq_expectations", "etl_incremental_agg",
    "dq_referential_integrity", "etl_snapshot_diff",
    "llm_token_count", "llm_ngram_jaccard", "llm_simhash_pairs",
    "llm_embedding_neardup", "llm_doc_pack", "llm_pii_scrub",
    "llm_chunk_sliding", "llm_ngram_containment", "llm_bigram_logprob",
    "llm_vocab_coverage",
    # ---- position 51+: round-15 queue (not in this round's slate) --
    # the rest of the r4/r5-era cohort, then the next-stalest r9
    # block per scripts/rotate_slate.py
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
    "llm_dedup_url",
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
