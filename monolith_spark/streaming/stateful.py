"""Custom stateful streaming operator via applyInPandasWithState.

The reference delegates all computation over samples (rate(),
increase(), counters) to the Prometheus client — its server only
stores and returns raw points (/root/reference/src/server.rs:133-169,
ReadHints parsed but unread, /root/reference/src/proto/remote.rs:1248-1257).
This operator moves the canonical client-side computation — per-series
running stats with counter-reset-aware increase — into the engine as a
keyed stateful streaming transform.

Scale shape: state is partitioned by series_id (the stream's natural
key), each group's state is O(1) floats, and micro-batch work is
Arrow-batched pandas per key group. State lives in the state store
(checkpointed, recoverable) — no driver-side accumulation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATS_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("sum", T.DoubleType(), False),
        T.StructField("min", T.DoubleType(), False),
        T.StructField("max", T.DoubleType(), False),
        T.StructField("last_ts", T.LongType(), False),
        T.StructField("last_value", T.DoubleType(), False),
        T.StructField("increase", T.DoubleType(), False),
    ]
)

# (n, sum, min, max, last_ts, last_value, increase)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum", T.DoubleType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("increase", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, s, mn, mx, last_ts, last_v, inc = state.get
    else:
        n, s, mn, mx, last_ts, last_v, inc = 0, 0.0, float("inf"), float("-inf"), -1, 0.0, 0.0
    # A big group arrives as SEVERAL Arrow chunks with no cross-chunk
    # ordering guarantee — sorting each chunk alone would fire spurious
    # counter resets at chunk boundaries. Concat first, sort once.
    chunks = [pdf for pdf in pdfs]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("timestamp")
        for ts, v in zip(pdf["timestamp"], pdf["value"]):
            ts, v = int(ts), float(v)
            if n > 0:
                # Prometheus counter semantics: a drop is a reset —
                # the counter restarted from 0 and climbed to v.
                inc += (v - last_v) if v >= last_v else v
            n += 1
            s += v
            mn = min(mn, v)
            mx = max(mx, v)
            last_ts, last_v = ts, v
    state.update((n, s, mn, mx, last_ts, last_v, inc))
    yield pd.DataFrame(
        {
            "series_id": [key[0]],
            "n": [n],
            "sum": [s],
            "min": [mn],
            "max": [mx],
            "last_ts": [last_ts],
            "last_value": [last_v],
            "increase": [inc],
        }
    )


def running_series_stats(samples_stream: DataFrame) -> DataFrame:
    """Keyed stateful transform: one updated stats row per series per
    micro-batch, state carried across batches (and restarts, via the
    checkpointed state store).

    Input: streaming DataFrame with (series_id long, timestamp long,
    value double). Output: STATS_SCHEMA rows in update mode.
    """
    return (
        samples_stream.groupBy("series_id")
        .applyInPandasWithState(
            _update,
            outputStructType=STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
