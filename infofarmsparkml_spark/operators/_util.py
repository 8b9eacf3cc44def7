"""Shared helpers for operator implementations."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Column, functions as F

from infofarmsparkml_spark.catalog import load_table  # noqa: F401  (re-export)


def r(col: Column | str, scale: int = 2) -> Column:
    """Round a double — applied to every computed aggregate on BOTH
    the Spark and oracle side because float summation order differs
    between engines (SURVEY.md §7 risks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)


def net_price() -> Column:
    """l_extendedprice * (1 - l_discount) — the TPC-H revenue expr."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def ts_lit(s: str) -> Column:
    """Timestamp literal; fixtures store dates as timestamps."""
    return F.lit(s).cast("timestamp")


def scratch_dir(tag: str, sf_dir: str = "") -> str:
    """Deterministic-content scratch dir for sink round-trips,
    scoped per scale factor so concurrent/interleaved runs at
    different sf_dirs never read each other's output."""
    base = os.path.join(tempfile.gettempdir(), "infofarmsparkml_scratch")
    os.makedirs(base, exist_ok=True)
    suffix = os.path.basename(os.path.normpath(sf_dir)) if sf_dir else ""
    return os.path.join(base, f"{tag}_{suffix}" if suffix else tag)
