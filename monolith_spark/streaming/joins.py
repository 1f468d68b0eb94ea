"""Stream-stream interval joins over the event feed.

The reference has no query-level joins at all (SURVEY §2.3 — its
"join" is posting-list intersection, /root/reference/src/common/mod.rs:20-44),
so this is a beyond-reference capability from the training-pipeline
north star: correlating two live event streams (ad views and
purchases) within a bounded event-time horizon.

Spark-first design: a watermarked inner interval join. Both sides
carry event-time watermarks and the join condition bounds
``purchase_time`` to ``[view_time, view_time + horizon]``, which is
exactly what Structured Streaming needs to compute each side's state
retention: view rows are evicted once the purchase watermark passes
``view_time + horizon``, purchase rows once the view watermark passes
``purchase_time``. State is bounded by stream *rate × horizon*, never
by stream history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_stream(
    events_stream: DataFrame,
    view_type: str = "view",
    purchase_type: str = "purchase",
    horizon_minutes: int = 60,
    watermark_delay: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join a purchase stream to every qualifying prior view by the
    same user within ``horizon_minutes``.

    ``events_stream`` is one streaming DataFrame with the events
    schema [event_id, ts, user_id, event_type, value, ...]; both join
    sides are event-type filters of it (Spark supports self-joins of
    a stream). Output: one row per (view, purchase) pair —
    [user_id, view_id, purchase_id, view_ms, purchase_ms, lag_ms,
    purchase_value].

    ``how="left_outer"`` additionally emits unattributed views (with
    NULL purchase columns) once the watermark proves no purchase can
    arrive for them anymore — Spark only allows the outer side to be
    emitted at watermark expiry, which is why the time bound and both
    watermarks are mandatory here.
    """
    views = (
        events_stream.filter(F.col("event_type") == view_type)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            # Watermarks require TIMESTAMP (not the fixture's
            # TIMESTAMP_NTZ); the session runs UTC so the cast is 1:1.
            F.col("ts").cast("timestamp").alias("view_time"),
        )
        .withWatermark("view_time", watermark_delay)
    )
    purchases = (
        events_stream.filter(F.col("event_type") == purchase_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").cast("timestamp").alias("purchase_time"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_time", watermark_delay)
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_time") >= F.col("view_time"))
        & (
            F.col("purchase_time")
            <= F.col("view_time") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond, how).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.unix_millis(F.col("view_time").cast("timestamp")).alias("view_ms"),
        F.unix_millis(F.col("purchase_time").cast("timestamp")).alias(
            "purchase_ms"
        ),
        (
            F.unix_millis(F.col("purchase_time").cast("timestamp"))
            - F.unix_millis(F.col("view_time").cast("timestamp"))
        ).alias("lag_ms"),
        "purchase_value",
    )


def attribution_batch(
    events: DataFrame,
    view_type: str = "view",
    purchase_type: str = "purchase",
    horizon_minutes: int = 60,
) -> DataFrame:
    """Batch twin of :func:`attribution_stream` (same plan, static
    input) — the equality target for streaming tests and the base of
    the oracle-backed ``events_attribution`` workload query."""
    return attribution_stream(
        events,
        view_type=view_type,
        purchase_type=purchase_type,
        horizon_minutes=horizon_minutes,
        how="inner",
    )
