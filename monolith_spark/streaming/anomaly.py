"""Online anomaly detection over a sample stream.

The batch operator (operators/timeseries.py:anomaly_zscore) scores each
point against its own series' trailing window. Online, the natural
equivalent is PREQUENTIAL scoring: each arriving point is scored
against the running statistics of everything the series has seen
BEFORE it, then folded into the state. That gives one-step-ahead
detection with O(1) state per series — no window buffer at all.

Scale shape mirrors streaming/stateful.py: state partitioned by
series_id, three floats per group in the checkpointed state store,
Arrow-batched pandas per key group, update-mode emission of only the
flagged points (the stream stays sparse — anomalies, not samples).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("zscore", T.DoubleType(), False),
    ]
)

# (n, sum, sum_sq)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s1", T.DoubleType()),
        T.StructField("s2", T.DoubleType()),
    ]
)


def streaming_anomalies(
    samples_stream: DataFrame,
    min_points: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Keyed stateful transform emitting only anomalous points:
    |value − running_mean| > threshold·running_σ, scored BEFORE the
    point updates the state (prequential), once the series has seen
    ``min_points`` priors with positive variance.

    Input: streaming DataFrame (series_id long, timestamp long,
    value double). Output: ANOMALY_SCHEMA rows, update mode.
    """

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s1, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out: list[tuple[int, float, float]] = []
        chunks = list(pdfs)
        if chunks:
            # Concat then sort once — per-chunk sorting would score
            # points against state that skips their in-batch priors
            # (same pitfall as stateful.py's counter resets). Ties
            # break by value for cross-run determinism.
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["timestamp", "value"]
            )
            for ts, v in zip(pdf["timestamp"], pdf["value"]):
                ts, v = int(ts), float(v)
                if n >= min_points:
                    var = (s2 - s1 * s1 / n) / n
                    if var > 0:
                        z = (v - s1 / n) / math.sqrt(var)
                        if abs(z) > threshold:
                            out.append((ts, v, z))
                n += 1
                s1 += v
                s2 += v * v
        state.update((n, s1, s2))
        yield pd.DataFrame(
            {
                "series_id": [key[0]] * len(out),
                "timestamp": [t for t, _, _ in out],
                "value": [v for _, v, _ in out],
                "zscore": [z for _, _, z in out],
            }
        )

    return samples_stream.groupBy("series_id").applyInPandasWithState(
        _update,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def prequential_anomalies_batch(
    rows: list[tuple[int, int, float]],
    min_points: int = 5,
    threshold: float = 3.0,
) -> list[tuple[int, int, float, float]]:
    """Pure-python twin of streaming_anomalies for tests/oracles: the
    same float ops in the same (series, ts, value) order over an
    already-collected batch. Returns [(series_id, ts, value, z)]."""
    state: dict[int, tuple[int, float, float]] = {}
    out = []
    for sid, ts, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        n, s1, s2 = state.get(sid, (0, 0.0, 0.0))
        if n >= min_points:
            var = (s2 - s1 * s1 / n) / n
            if var > 0:
                z = (v - s1 / n) / math.sqrt(var)
                if abs(z) > threshold:
                    out.append((sid, ts, v, z))
        state[sid] = (n + 1, s1 + v, s2 + v * v)
    return out
