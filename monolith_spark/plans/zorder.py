"""Z-order (Morton-curve) file clustering for the samples fact table.

The reference keeps per-series blobs, so a series lookup is one key
get but a time-range scan touches every series
(/root/reference/src/storage/sled_storage.rs:39-56). Our default
compaction sorts files by (series_id, timestamp): narrow series
ranges per file, but every file spans the whole chunk's time range —
a time-slice query can't skip any file. Z-ordering interleaves the
bits of both dimensions so each Parquet file (and row group) covers a
small rectangle in (series, time) space; footer min/max statistics
then prune files for BOTH matcher-driven series lookups and time
trims. At 100 TB this is the difference between "scan the chunk" and
"scan the files whose rectangle intersects the query" — the same
layout decision Delta/Iceberg OPTIMIZE ZORDER makes, computed here
with pure JVM-side bit arithmetic (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # per-dimension resolution; z-value fits in 32 bits


def _spread_bits(col: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of a 32-bit
    value (classic Morton interleave, all long arithmetic)."""
    x = col.cast("long")
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def zvalue_expr(
    series_col: str,
    ts_col: str,
    ts_min: int,
    ts_max: int,
) -> Column:
    """Morton z-value of (series_id, timestamp).

    series_id is a content hash (uniform over the full signed-64
    range), so its top ZBITS bits are already a uniform rank; the
    timestamp is ranked by linear scaling over the chunk's [ts_min,
    ts_max] span. Both ranks interleave bit-by-bit, timestamp in the
    odd (higher) positions so equal-width time slices map to
    contiguous z runs slightly tighter — the choice only rotates the
    rectangles, it doesn't change their area.
    """
    series_rank = F.shiftrightunsigned(F.col(series_col), 64 - ZBITS)
    span = max(1, ts_max - ts_min + 1)
    ts_rank = F.floor(
        (F.col(ts_col) - F.lit(ts_min)).cast("double")
        * F.lit(float(1 << ZBITS) / span)
    ).cast("long")
    # Clamp BOTH sides: ts == ts_max lands exactly on 2^ZBITS, and with
    # caller-passed bounds (the at-scale path) a late/early straggler
    # below ts_min would otherwise produce a negative rank whose masked
    # bit-spread yields an arbitrary non-monotone z-value.
    ts_rank = F.greatest(F.lit(0), F.least(ts_rank, F.lit((1 << ZBITS) - 1)))
    return F.shiftleft(_spread_bits(ts_rank), 1).bitwiseOR(
        _spread_bits(series_rank)
    )


def cluster_zorder(
    df: DataFrame,
    n_files: int,
    series_col: str = "series_id",
    ts_col: str = "timestamp",
    ts_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Lay ``df`` out along the Morton curve: range-partition into
    ``n_files`` output files by z-value and sort rows inside each, so
    file AND row-group min/max stats are tight in both dimensions.

    ``ts_bounds`` defaults to the actual min/max of ``ts_col`` (one
    cheap agg — at scale pass the chunk's known bounds instead).
    """
    if ts_bounds is None:
        lo, hi = df.agg(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).first()
        ts_bounds = (int(lo), int(hi))
    z = zvalue_expr(series_col, ts_col, *ts_bounds)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
