"""Stateful streaming alert-rule evaluation: Prometheus pending→firing.

The batch twin (workload.py:ts_alert_firing) reports every maximal run
of >= min_pts consecutive threshold breaches per series via the
gaps-and-islands device. Live, the same rule is a keyed stateful
transform: each series carries an O(1) open-run state (count, start,
last breach, peak); a breach extends it, a clear point below the
threshold closes it — emitting one FIRING row if the run reached
min_pts (a shorter run was only ever pending and resolves silently,
Prometheus `for:` semantics) — and every micro-batch also reports the
series' current open run so dashboards can show pending/firing-now.

Streamed ≡ batch by construction: closed firing rows plus the final
open runs (at >= min_pts) equal the batch island set on the same
points IN PROCESSED ORDER, asserted in tests/test_streaming.py. Points
are sorted within a micro-batch; ACROSS batches, a sample arriving
with timestamp <= the series' last processed point is dropped (state
carries `last_seen`) — the same late-data policy as the ingest path —
so out-of-order arrival can never extend or close a run retroactively.
State is partitioned on the series key, checkpointed in the state
store, O(1) per series.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERTS_SCHEMA = T.StructType(
    [
        T.StructField("signature", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # 'firing' | 'open'
        T.StructField("alert_start_ms", T.LongType(), False),
        T.StructField("alert_end_ms", T.LongType(), False),
        T.StructField("n_breaches", T.LongType(), False),
        T.StructField("peak_value", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("run_n", T.LongType()),
        T.StructField("run_start", T.LongType()),
        T.StructField("last_breach", T.LongType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("last_seen", T.LongType()),
    ]
)


def _make_update(tau: float, min_pts: int):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sig = key[0]
        if state.exists:
            run_n, run_start, last_breach, peak, last_seen = state.get
        else:
            run_n, run_start, last_breach, peak, last_seen = 0, -1, -1, 0.0, -1
        out: list[tuple] = []
        chunks = list(pdfs)
        if chunks:
            # several Arrow chunks per group, no cross-chunk order —
            # concat then one sort (ties on (ts, value) are identical
            # rows, same invariance argument as the batch islands)
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["timestamp", "value"]
            )
            for ts, v in zip(pdf["timestamp"], pdf["value"]):
                ts, v = int(ts), float(v)
                if ts <= last_seen:
                    # cross-batch ordering guard (ADVICE r6): a sample
                    # landing in a later micro-batch with ts <= the
                    # last processed point would extend/close runs out
                    # of order and break streamed ≡ batch. Drop it —
                    # the same late-data policy as the engine's ingest
                    # window (streaming/ingest.py late-data drop).
                    continue
                last_seen = ts
                if v >= tau:
                    if run_n == 0:
                        run_start, peak = ts, v
                    else:
                        peak = max(peak, v)
                    run_n += 1
                    last_breach = ts
                else:
                    if run_n >= min_pts:
                        out.append(
                            (sig, "firing", run_start, last_breach, run_n, peak)
                        )
                    run_n, run_start, last_breach, peak = 0, -1, -1, 0.0
        state.update((run_n, run_start, last_breach, peak, last_seen))
        if run_n >= 1:
            out.append((sig, "open", run_start, last_breach, run_n, peak))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "signature", "kind", "alert_start_ms", "alert_end_ms",
                    "n_breaches", "peak_value",
                ],
            )

    return _update


def streaming_alerts(
    samples_stream: DataFrame, tau: float = 30.0, min_pts: int = 2
) -> DataFrame:
    """Keyed stateful alert evaluation over a stream of (signature,
    timestamp, value): emits 'firing' rows when a >= min_pts breach run
    closes, plus the current 'open' run per series per micro-batch."""
    return samples_stream.groupBy("signature").applyInPandasWithState(
        _make_update(tau, min_pts),
        outputStructType=ALERTS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
