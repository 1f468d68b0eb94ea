"""Bucketed table layout: shuffle-free co-located joins at scale.

The reference co-locates nothing — every lookup is a KV get against
sled/tikv (/root/reference/src/storage/sled_storage.rs:39-56). At
100 TB the analog decision is physical layout: writing both sides of
a recurring fact-fact join bucketed (CLUSTERED BY) on the join key
lets every future join run as a zero-Exchange sort-merge join —
Spark's scan reports the bucket spec as the output partitioning, so
Catalyst drops both shuffles. Bucket count is fixed at write time;
pick it for the TARGET scale (buckets ≈ total_bytes / 1 GiB), not the
test scale — too few buckets caps join parallelism forever.

Broadcast-able dims should NOT be bucketed — a broadcast join is
already shuffle-free and bucketing would only constrain layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally sorted) by ``bucket_cols``. Joins/aggregations keyed on
    a prefix of ``bucket_cols`` between tables with the SAME bucket
    count then need no Exchange; sorting within buckets additionally
    drops the SMJ's per-task Sort.
    """
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_cols) of a saved table, or None."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    num, cols = None, None
    for r in rows:
        if r["col_name"] == "Num Buckets":
            num = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = [c.strip(" `") for c in r["data_type"].strip("[]").split(",")]
    return (num, cols) if num is not None and cols else None
