"""Multi-micro-batch streaming witnesses (r16, VERDICT r15 #3/#5).

The registered streaming ops run `availableNow` over the events
fixture, which a single parquet file turns into ONE micro-batch —
correctness there never exercises state-store survival across
trigger boundaries, the property a continuous production stream
relies on at every trigger. These tests split the SAME fixture rows
into 3 ts-ordered files, force one file per micro-batch
(`source_options(maxFilesPerTrigger="1")` — availableNow respects
the file-source rate limit and plans multiple batches), prove via a
StreamingQueryListener that >= 3 batches actually ran, and assert
the result is row-identical to the single-batch run: windowed
aggregation state, session-merge state, dedup state and watermark
eviction all survive the trigger boundaries.

The splits are ts-ordered (the realistic arrival order). That is
load-bearing for the watermarked append ops: an out-of-order split
would make rows arrive below the already-advanced watermark and be
dropped — a semantic (and correct) difference from the single-batch
run, pinned separately in test_streaming_boundaries.py.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql.streaming import StreamingQueryListener

from infofarmsparkml_spark import registry
from infofarmsparkml_spark.streaming.ops import source_options

from conftest import SF_DIR


def _q(name):
    fn, _ = registry.get(name)
    return fn

_SINKS = {
    "stream_tumbling": "ifsml_stream_tumbling",
    "stream_session": "ifsml_stream_session",
    "stream_dedup": "ifsml_stream_dedup",
    "stream_session_append": "ifsml_stream_session_append",
}


class _BatchCounter(StreamingQueryListener):
    def __init__(self):
        self.batches: dict[str, set] = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        if p.name:
            self.batches.setdefault(p.name, set()).add(p.batchId)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def _split_events(sf_dir: str, tmp, n: int = 3) -> None:
    df = (
        pd.read_parquet(f"{sf_dir}/events.parquet")
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    bounds = np.linspace(0, len(df), n + 1, dtype=int)
    for i in range(n):
        df.iloc[bounds[i] : bounds[i + 1]].to_parquet(
            tmp / f"events{i}.parquet", index=False
        )


def _rows(df) -> list:
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("opname", sorted(_SINKS))
def test_multibatch_state_survives_triggers(spark, tmp_path, opname):
    canonical = _rows(_q(opname)(spark, SF_DIR))
    _split_events(SF_DIR, tmp_path)
    counter = _BatchCounter()
    spark.streams.addListener(counter)
    try:
        with source_options(maxFilesPerTrigger="1"):
            multi = _rows(_q(opname)(spark, str(tmp_path)))
    finally:
        # progress events are delivered asynchronously; give the
        # listener bus a moment before detaching and asserting
        deadline = time.time() + 10
        while (
            len(counter.batches.get(_SINKS[opname], ())) < 3
            and time.time() < deadline
        ):
            time.sleep(0.2)
        spark.streams.removeListener(counter)
    n_batches = len(counter.batches.get(_SINKS[opname], ()))
    assert n_batches >= 3, (
        f"{opname}: expected >= 3 micro-batches with "
        f"maxFilesPerTrigger=1 over 3 files, saw {n_batches}"
    )
    assert multi == canonical, (
        f"{opname}: multi-batch result diverged from single-batch "
        f"({len(multi)} vs {len(canonical)} rows)"
    )
