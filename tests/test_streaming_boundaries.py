"""Watermark boundary-convention pins (ADVICE r5): fixtures never
put an event exactly ON a watermark or gap boundary, so the oracle
comparisons (<= vs <) were latent. These tests plant
boundary-sitting timestamps and assert the EXACT eviction semantics
Spark 4.1.2 exhibits — the conventions the committed oracles encode:

- windowed aggregation (append): a window whose end == watermark IS
  emitted (`stream_watermark_late` oracle: end <= wm);
- session windows: an event exactly gap-duration after its
  predecessor MERGES into the same session (`stream_session_append`
  oracle splits on gap > 30min, not >=);
- session eviction (append): a session whose end == watermark IS
  emitted (`stream_session_append` oracle: end <= wm — r6 fix, the
  r5 oracle used strict <);
- stream-stream outer joins: null rows emit only STRICTLY after the
  horizon — an unmatched left row whose join horizon == watermark
  and an unmatched right row whose ts == watermark are both
  withheld (`stream_stream_leftouter`/`_fullouter` oracles: < wm).

Each test drives a real two-batch file-source stream: batch 1 lands
before start and advances the watermark exactly onto the boundary
(processAllAvailable twice so the no-data batch runs); the mid-run
snapshot pins the boundary behavior, then batch 2 pushes the
watermark far past and the final snapshot proves the withheld rows
were withheld (not lost).
"""

from __future__ import annotations

import shutil
import tempfile
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

TS = pd.Timestamp

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("u", T.LongType()),
        T.StructField("et", T.StringType()),
        T.StructField("eid", T.LongType()),
    ]
)
_COLS = ["ts", "u", "et", "eid"]


def _run_batches(spark, name, batches, build, mode="append"):
    """Start a file-source stream on batch 1, snapshot the memory
    sink after each subsequent batch lands (double
    processAllAvailable so the watermark-advancing no-data batch
    runs before each snapshot)."""
    src = tempfile.mkdtemp(prefix="wm_boundary_")
    spark.createDataFrame(
        pd.DataFrame(batches[0], columns=_COLS), _SCHEMA
    ).coalesce(1).write.parquet(f"{src}/b1")
    df = build(lambda: spark.readStream.schema(_SCHEMA).parquet(src + "/b*"))
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    snaps = []
    try:
        q.processAllAvailable()
        time.sleep(0.5)
        q.processAllAvailable()
        snaps.append(spark.table(name).collect())
        for i, rows in enumerate(batches[1:], 2):
            spark.createDataFrame(
                pd.DataFrame(rows, columns=_COLS), _SCHEMA
            ).coalesce(1).write.parquet(f"{src}/b{i}")
            q.processAllAvailable()
            time.sleep(0.5)
            q.processAllAvailable()
            snaps.append(spark.table(name).collect())
    finally:
        q.stop()
        shutil.rmtree(src, ignore_errors=True)
    return snaps


@pytest.fixture(autouse=True)
def _few_state_partitions(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_window_end_on_watermark_is_emitted(spark):
    """Tumbling window [01:00, 02:00) with watermark landing exactly
    at 02:00 (event 02:10, delay 10 min): emitted at the boundary
    — eviction is end <= wm, the `stream_watermark_late` oracle."""

    def agg(mk):
        return (
            mk()
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("ws"), "n")
        )

    b1 = [(TS("2024-01-01 01:30:00"), 1, "e", 1),
          (TS("2024-01-01 02:10:00"), 1, "e", 2)]
    b2 = [(TS("2024-01-01 09:00:00"), 1, "e", 3)]
    at_boundary, final = _run_batches(spark, "wmb_window", [b1, b2], agg)
    assert sorted(str(r.ws) for r in at_boundary) == [
        "2024-01-01 01:00:00"
    ], "window with end == watermark must be emitted (<= eviction)"
    # the 02:00 window emits once the wm passes on; nothing is lost
    assert sorted(str(r.ws) for r in final) == [
        "2024-01-01 01:00:00",
        "2024-01-01 02:00:00",
    ]


def test_session_gap_exactly_at_duration_merges(spark):
    """Events exactly 30 minutes apart with a 30-minute session gap
    form ONE session [01:00, 02:00) — adjacent ranges merge, so the
    oracle's split rule is gap > 30min, not >=."""

    def agg(mk):
        return (
            mk()
            .withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes"), "u")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("session_window.start").alias("ss"),
                F.col("session_window.end").alias("se"),
                "n",
            )
        )

    b1 = [(TS("2024-01-01 01:00:00"), 1, "e", 1),
          (TS("2024-01-01 01:30:00"), 1, "e", 2)]
    b2 = [(TS("2024-01-01 09:00:00"), 2, "e", 3)]
    snaps = _run_batches(spark, "wmb_gap", [b1, b2], agg)
    sessions = sorted(
        (str(r.ss), str(r.se), r.n) for r in snaps[-1] if r.n > 0
    )
    assert ("2024-01-01 01:00:00", "2024-01-01 02:00:00", 2) in sessions
    assert not any(s[2] == 1 and s[0].startswith("2024-01-01 01") for s in sessions)


def test_session_end_on_watermark_is_emitted(spark):
    """A session ending exactly AT the watermark (event 01:00, gap
    30min -> end 01:30; wm driver 02:30 - 1h = 01:30) IS evicted and
    emitted — end <= wm, the r6 `stream_session_append` oracle fix
    (the r5 oracle's strict < was wrong at this boundary)."""

    def agg(mk):
        return (
            mk()
            .withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "30 minutes"), "u")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("session_window.start").alias("ss"),
                F.col("session_window.end").alias("se"),
                "n",
            )
        )

    b1 = [(TS("2024-01-01 01:00:00"), 1, "e", 1),
          (TS("2024-01-01 02:30:00"), 2, "e", 2)]
    b2 = [(TS("2024-01-01 09:00:00"), 3, "e", 3)]
    at_boundary, _final = _run_batches(spark, "wmb_sess", [b1, b2], agg)
    assert sorted((str(r.ss), str(r.se)) for r in at_boundary) == [
        ("2024-01-01 01:00:00", "2024-01-01 01:30:00")
    ], "session with end == watermark must be emitted (<= eviction)"


def _interval_join(kind):
    def build(mk):
        views = (
            mk()
            .filter(F.col("et") == "view")
            .withWatermark("ts", "1 hour")
            .select(
                F.col("eid").alias("view_id"),
                F.col("u").alias("user_id"),
                F.col("ts").alias("view_ts"),
            )
        )
        purch = (
            mk()
            .filter(F.col("et") == "purchase")
            .withWatermark("ts", "1 hour")
            .select(
                F.col("eid").alias("purchase_id"),
                F.col("u").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"),
            )
        )
        return views.join(
            purch,
            F.expr(
                "user_id = p_user_id AND purchase_ts >= view_ts "
                "AND purchase_ts <= view_ts + INTERVAL 30 MINUTES"
            ),
            kind,
        ).select("view_id", "purchase_id", "view_ts", "purchase_ts")

    return build


def test_leftouter_null_withheld_when_horizon_equals_watermark(spark):
    """Unmatched view at 01:00 (horizon 01:30) with the global
    watermark landing exactly at 01:30: the null row is WITHHELD —
    join eviction is strictly horizon < wm, the
    `stream_stream_leftouter` oracle — and emits later, unlost."""
    b1 = [
        (TS("2024-01-01 01:00:00"), 1, "view", 10),
        (TS("2024-01-01 02:30:00"), 9, "view", 11),
        (TS("2024-01-01 02:30:00"), 8, "purchase", 20),
    ]
    b2 = [
        (TS("2024-01-01 09:00:00"), 7, "view", 12),
        (TS("2024-01-01 09:00:00"), 7, "purchase", 21),
    ]
    at_boundary, final = _run_batches(
        spark, "wmb_lo", [b1, b2], _interval_join("left_outer")
    )
    assert at_boundary == [], (
        "null row must be withheld while horizon == watermark "
        "(strict < eviction)"
    )
    assert (10, None) in {(r.view_id, r.purchase_id) for r in final}


def test_fullouter_right_null_withheld_when_ts_equals_watermark(spark):
    """Unmatched purchase exactly AT the watermark (01:30): its null
    row is WITHHELD at the boundary — strictly purchase_ts < wm, the
    `stream_stream_fullouter` oracle — and emits later, unlost."""
    b1 = [
        (TS("2024-01-01 01:30:00"), 2, "purchase", 30),
        (TS("2024-01-01 02:30:00"), 9, "view", 31),
        (TS("2024-01-01 02:30:00"), 8, "purchase", 32),
    ]
    b2 = [
        (TS("2024-01-01 09:00:00"), 7, "view", 33),
        (TS("2024-01-01 09:00:00"), 7, "purchase", 34),
    ]
    at_boundary, final = _run_batches(
        spark, "wmb_fo", [b1, b2], _interval_join("full_outer")
    )
    assert at_boundary == []
    assert (None, 30) in {(r.view_id, r.purchase_id) for r in final}
