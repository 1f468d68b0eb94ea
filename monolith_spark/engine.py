"""MonolithDB — the engine facade: two-table layout + query plans.

Layout (SURVEY.md §7.1):
- ``series`` dim:  [series_id long, signature string, labels map<string,string>]
- ``samples`` fact: [series_id long, timestamp long(ms), value double],
  Parquet partitioned by ``chunk_id = floor(timestamp / chunk_size_ms)``
  — the Spark mapping of the reference's Chunk
  (/root/reference/src/chunk/chunk.rs:68-96); partition pruning replaces
  chunk selection (/root/reference/src/db.rs:225-252).

Scale notes (100 TB):
- The dim is tiny relative to the fact (≤ millions of series vs
  trillions of samples) → matcher evaluation is a broadcast join; the
  fact table is never shuffled on the query path.
- Facts are appended time-sorted within partitions so Parquet row-group
  min/max stats give the reference's per-series binary search (F3) for
  free.
- Content-hash series ids make ingest idempotent and lock-free — the
  reference serializes every insert behind a chunk RwLock
  (/root/reference/src/chunk/chunk.rs:110-114); here concurrent
  writers can only produce duplicate dim rows, which reads drop.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monolith_spark.labels import (
    LabelMatcher,
    exact_signature_predicate,
    matcher_predicate,
    series_id_expr,
    signature_expr,
    superset_predicate,
)
from monolith_spark.operators.timeseries import (
    chunk_pred,
    detect_skewed_key,
    time_trim,
    to_timeseries,
    to_timeseries_salted,
    valid_points,
)

# Reference default chunk size: 12000 seconds (/root/reference/src/lib.rs:44,
# converted at /root/reference/src/common/option.rs:25-31). We use ms
# uniformly (the reference's ms/s confusion is documented in SURVEY §2.6 ST3).
DEFAULT_CHUNK_MS = 12_000 * 1000

QueryMatcher = LabelMatcher


@dataclass
class MonolithDB:
    """One engine instance rooted at ``path`` (≈ MonolithDb,
    /root/reference/src/db.rs:22-32)."""

    spark: SparkSession
    path: str
    chunk_size_ms: int = DEFAULT_CHUNK_MS
    # Force-broadcast the matched series dim only while its on-disk
    # size stays under this bound; above it (high-cardinality labels at
    # 100 TB — a match-all query would ship the whole dim to every
    # executor) drop the hint and let AQE pick the join strategy from
    # runtime sizes. The bound is compared against on-disk Parquet
    # bytes × DIM_DECOMPRESS_FACTOR: broadcast ships decompressed rows,
    # and dictionary/RLE-encoded label dims commonly expand 5-10×, so
    # gating on raw file size alone would force multi-GB broadcasts
    # past executor memory.
    dim_broadcast_bytes: int = 256 * 1024 * 1024
    DIM_DECOMPRESS_FACTOR: int = 8

    def __post_init__(self) -> None:
        self.samples_path = os.path.join(self.path, "samples")
        self.series_path = os.path.join(self.path, "series")
        meta_path = os.path.join(self.path, "metadata.json")
        # S4 db-level metadata (/root/reference/src/db.rs:107-124): reject
        # reopening with a different chunk size, like the reference rejects
        # mismatched indexer/storage types.
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("chunk_size_ms") != self.chunk_size_ms:
                raise ValueError(
                    f"existing db at {self.path} has chunk_size_ms="
                    f"{meta.get('chunk_size_ms')}, requested {self.chunk_size_ms}"
                )
        else:
            os.makedirs(self.path, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump(
                    {
                        "engine": "monolith-spark",
                        "version": 1,
                        "chunk_size_ms": self.chunk_size_ms,
                        "created_ms": int(time.time() * 1000),
                    },
                    f,
                )

    # ------------------------------------------------------------------ write

    def write(self, df: DataFrame, window: tuple[int, int] | None = None) -> None:
        """Ingest a batch of [labels, timestamp, value] rows.

        The reference's write path (/root/reference/src/db.rs:176-194 →
        chunk.rs:110-137): range/zero filter (F1) → get-or-create series
        (J5) → append points (S5). Here: filter → dim anti-join append →
        fact append, all set-at-a-time.
        """
        df = valid_points(df, window=window)
        df = df.withColumn("signature", signature_expr("labels")).withColumn(
            "series_id", F.xxhash64(F.col("signature"))
        )
        df = df.withColumn(
            "chunk_id", F.floor(F.col("timestamp") / F.lit(self.chunk_size_ms)).cast("long")
        )
        df.persist()
        try:
            # A batch can be empty after the F1 filter (e.g. all ts==0 —
            # the reference errors per-point, we drop set-at-a-time). A
            # zero-row write would leave a FIRST-write parquet dir with
            # no footers, poisoning later reads — but appending nothing
            # to existing tables is harmless, so the emptiness probe
            # (one Spark job) only runs until both tables exist. On a
            # streaming ingest that's one saved job per micro-batch.
            if (
                not os.path.exists(self.samples_path)
                or not os.path.exists(self.series_path)
            ) and df.isEmpty():
                return
            # J5 get-or-create as a left_anti against the existing dim —
            # content-hash ids make this idempotent (no critical section).
            new_series = df.select("series_id", "signature", "labels").dropDuplicates(["series_id"])
            existing = self._series_raw()
            if existing is not None:
                # Same size gate as the query path: force-broadcasting
                # a high-cardinality dim on every micro-batch would be
                # the write path's scaling cliff.
                new_series = new_series.join(
                    self._dim_hint(existing.select("series_id")),
                    "series_id",
                    "left_anti",
                )
            new_series.write.mode("append").parquet(self.series_path)
            # Time-sorted within partitions → Parquet row-group min/max
            # stats implement F3's binary search.
            (
                df.select("series_id", "timestamp", "value", "chunk_id")
                .repartition("chunk_id")
                .sortWithinPartitions("series_id", "timestamp")
                .write.mode("append")
                .partitionBy("chunk_id")
                .parquet(self.samples_path)
            )
        finally:
            df.unpersist()

    # ------------------------------------------------------------------- read

    def _series_raw(self) -> DataFrame | None:
        # Self-heal first: a delete_series crash between its dim renames
        # leaves the live dim staged as _compact/series.old — without
        # this, every dim consumer (queries AND a replayed delete)
        # would see an empty dim and silently act on it.
        self._recover_compaction()
        # Existence check first: letting spark.read throw prints a JVM
        # stack trace to stderr even when caught.
        if not os.path.exists(self.series_path):
            return None
        return self.spark.read.parquet(self.series_path)

    def series(self) -> DataFrame:
        """The series dimension; duplicate dim rows from concurrent
        writers collapse here (last-write-wins is irrelevant: rows with
        equal series_id are identical by construction). Empty before
        the first write — queries on an empty db return empty results,
        like the reference's fresh chunk."""
        raw = self._series_raw()
        if raw is None:
            return self.spark.createDataFrame(
                [], "series_id long, signature string, labels map<string,string>"
            )
        return raw.dropDuplicates(["series_id"])

    def _recover_compaction(self) -> None:
        """Self-healing read path: if a compaction crashed between its
        two renames, the live partition is the staged ``.old`` — restore
        it before planning a scan so a reader never sees missing rows.
        One listdir when staging exists, zero cost otherwise; races
        between concurrent readers are benign (first rename wins).

        The dim swap is additionally guarded by a pid lock file
        (``_compact/series.lock``, written by delete_series): a LIVE
        writer mid-swap looks identical to a crashed one from the
        staging layout alone, and restoring ``series.old`` under a
        live delete makes the writer's second rename fail (the
        VERDICT r4/ADVICE-low race). If the lock names a process that
        is still running, recovery leaves the dim swap alone — the
        writer will complete it; a lock naming a dead pid is stale
        (crashed delete) and is removed before the normal restore.
        Standard single-machine caveat: a recycled pid can make a
        stale lock look live until that unrelated process exits."""
        staging = os.path.join(self.path, "_compact")
        if not os.path.isdir(staging):
            return
        live_delete = False
        marker = os.path.join(staging, "series.lock")
        if os.path.exists(marker):
            pid = 0
            try:
                with open(marker) as f:
                    pid = int(f.read().strip() or "0")
            except (OSError, ValueError):
                pid = 0
            if pid > 0:
                try:
                    os.kill(pid, 0)
                    live_delete = True  # writer alive — don't interfere
                except ProcessLookupError:
                    pass  # dead: stale lock from a crashed delete
                except PermissionError:
                    live_delete = True  # exists under another uid
                except OSError:
                    pass
            if not live_delete:
                try:
                    os.remove(marker)
                except OSError:
                    pass
        for name in os.listdir(staging):
            if not name.endswith(".old"):
                continue
            if name == "series.old":
                # delete_series crashed between its two dim renames: the
                # live dim is the staged .old — restore it, never treat
                # it as a chunk (parsing it as one would rename dim rows
                # into samples/"chunk_id=" and lose the series table).
                # A LIVE delete (lock pid running) is mid-swap, not
                # crashed — leave its staging alone.
                if live_delete:
                    continue
                if not os.path.isdir(self.series_path):
                    src = os.path.join(staging, name)
                    try:
                        os.rename(src, self.series_path)
                    except OSError:
                        # Benign only if another reader won the race
                        # (source consumed or destination restored). A
                        # still-staged source means the rename REALLY
                        # failed (EACCES/EXDEV...) and swallowing it
                        # would leave the db with no visible series
                        # table and no diagnostic.
                        if os.path.exists(src) and not os.path.isdir(
                            self.series_path
                        ):
                            raise
                continue
            if not name.startswith("chunk_"):
                continue
            chunk = name[len("chunk_"):-len(".old")]
            part = os.path.join(self.samples_path, f"chunk_id={chunk}")
            if not os.path.isdir(part):
                src = os.path.join(staging, name)
                try:
                    os.rename(src, part)
                except OSError:
                    # see the series.old branch: re-raise unless a
                    # concurrent reader/compactor demonstrably won
                    if os.path.exists(src) and not os.path.isdir(part):
                        raise

    def samples(self) -> DataFrame:
        self._recover_compaction()
        if not os.path.exists(self.samples_path):
            return self.spark.createDataFrame(
                [], "series_id long, timestamp long, value double, chunk_id long"
            )
        return self.spark.read.parquet(self.samples_path)

    def _query_samples(self, start_ms: int, end_ms: int) -> DataFrame:
        return time_trim(
            self.samples().filter(chunk_pred(start_ms, end_ms, self.chunk_size_ms)),
            start_ms,
            end_ms,
        )

    def _matched_series(self, matchers) -> DataFrame:
        series = self.series()
        if isinstance(matchers, dict):
            pred = superset_predicate("labels", matchers)
        else:
            pred = matcher_predicate("labels", list(matchers))
        return series.filter(pred)

    def _dim_hint(self, sel: DataFrame) -> DataFrame:
        """Broadcast hint for the matched dim, gated on the dim's
        on-disk size (an O(#files) driver-side stat, no job): a
        Parquet dim under the bound decompresses well within executor
        memory; past it the hint would force shipping a
        high-cardinality dim everywhere, so AQE decides instead."""
        if not os.path.isdir(self.series_path):
            return F.broadcast(sel)  # empty dim
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(self.series_path)
            for f in files
            if f.endswith(".parquet")
        )
        return (
            F.broadcast(sel)
            if total * self.DIM_DECOMPRESS_FACTOR < self.dim_broadcast_bytes
            else sel
        )

    def query_flat(self, matchers, start_ms: int, end_ms: int) -> DataFrame:
        """Matching samples as flat rows [series_id, signature, labels,
        timestamp, value] — the pre-assembly dataflow of Chunk::query
        (/root/reference/src/chunk/chunk.rs:139-162).

        ``matchers``: dict (EQ superset semantics, J4) or a list of
        LabelMatcher for the full EQ/NEQ/RE/NRE surface.
        """
        sel = self._matched_series(matchers)
        return self._query_samples(start_ms, end_ms).join(
            self._dim_hint(sel), "series_id"
        )  # J6 metadata hydration; broadcast while the dim is small

    def query(
        self,
        matchers,
        start_ms: int,
        end_ms: int,
        salted: bool | str = False,
    ) -> DataFrame:
        """Remote-read evaluation: [series_id, signature, labels, points]
        with points time-ascending (/root/reference/src/db.rs:202-267).
        Series order is unspecified in the reference; sort by signature
        for determinism.

        ``salted``: False → single-stage collect (cheapest when no
        series is hot); True → two-stage salted assembly
        (to_timeseries_salted); "auto" → pay one small sampled job to
        detect a hot series first. AQE splits skewed JOIN partitions
        but not a skewed aggregation key, so a ≥10%-of-points series
        needs the salted path to avoid a single straggler reducer.
        """
        flat = self.query_flat(matchers, start_ms, end_ms)
        use_salt = bool(salted)
        if salted == "auto":
            use_salt = detect_skewed_key(flat, key_cols=["series_id"])
        assemble = to_timeseries_salted if use_salt else to_timeseries
        return assemble(flat, key_cols=["series_id", "signature"]).orderBy("signature")

    def query_exact(self, full_labels: dict[str, str], start_ms: int, end_ms: int) -> DataFrame:
        """J5 exact-signature point lookup
        (/root/reference/src/indexer/sled_indexer.rs:98-107)."""
        sel = self.series().filter(exact_signature_predicate("labels", full_labels))
        flat = self._query_samples(start_ms, end_ms).join(self._dim_hint(sel), "series_id")
        return to_timeseries(flat, key_cols=["series_id", "signature"])

    # ----------------------------------------------------------- maintenance

    def compact_chunk(
        self,
        chunk_id: int,
        target_bytes: int = 128 * 1024 * 1024,
        layout: str = "series",
    ) -> bool:
        """Rewrite one sealed chunk partition: merge the small files
        micro-batch appends accumulate into ~target_bytes files sorted
        by (series_id, timestamp) (``layout="series"``) or clustered
        along the Morton curve over (series_id, timestamp)
        (``layout="zorder"``, plans/zorder.py) so file/row-group
        min/max stats prune in BOTH dimensions.

        The reference's unchecked TODO "Compression on swap chunk"
        (/root/reference/README.md:60; dormant Gorilla codec, SURVEY
        §4.4) realized the Spark way — a Parquet rewrite. Sorting
        restores row-group min/max locality (F3's binary-search analog)
        that interleaved appends erode, and the file-count cap is the
        real 100 TB concern: a streaming ingest appending every 30 s
        creates ~3k files/day/chunk without this.

        Not safe concurrently with writers to the SAME chunk — run on
        sealed chunks only (the reference compacts on swap for the same
        reason). Readers that PLANNED a scan before the swap hold the
        old file paths and will fail (not silently lose data) if they
        execute after it; new reads self-heal via _recover_compaction.
        True snapshot isolation across a rewrite needs a manifest table
        format (Delta/Iceberg) — at cluster scale run compaction in a
        read-quiesced maintenance window, exactly like the reference's
        swap lock. Returns False if the partition doesn't exist.
        """
        import shutil

        part = os.path.join(self.samples_path, f"chunk_id={chunk_id}")
        # crash recovery: a previous run died between the two renames —
        # the live data is the staged .old; restore it (shared with the
        # self-healing read path).
        self._recover_compaction()
        if not os.path.isdir(part):
            return False
        in_bytes = sum(
            os.path.getsize(os.path.join(part, f))
            for f in os.listdir(part)
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-in_bytes // target_bytes))
        # Staging dirs live OUTSIDE samples_path: a crash mid-swap must
        # never leave a non-integer "chunk_id=..." dir that partition
        # discovery would misparse, and concurrent readers must never
        # see tmp data alongside the live partition.
        staging = os.path.join(self.path, "_compact")
        os.makedirs(staging, exist_ok=True)
        tmp = os.path.join(staging, f"chunk_{chunk_id}.tmp")
        old = os.path.join(staging, f"chunk_{chunk_id}.old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        src = self.spark.read.parquet(part)
        if layout == "zorder":
            from monolith_spark.plans.zorder import cluster_zorder

            laid_out = cluster_zorder(src, int(n_files))
        elif layout == "series":
            laid_out = src.repartition(n_files, "series_id").sortWithinPartitions(
                "series_id", "timestamp"
            )
        else:
            raise ValueError(f"unknown compaction layout: {layout!r}")
        laid_out.write.mode("overwrite").parquet(tmp)
        os.rename(part, old)
        os.rename(tmp, part)
        shutil.rmtree(old)
        return True

    def compact(
        self,
        exclude_chunk_ids: set[int] | None = None,
        layout: str = "series",
    ) -> int:
        """Compact every chunk partition (optionally excluding e.g. the
        chunk currently receiving appends). Returns chunks rewritten."""
        exclude = exclude_chunk_ids or set()
        done = 0
        if not os.path.isdir(self.samples_path):
            return 0
        for name in sorted(os.listdir(self.samples_path)):
            if not name.startswith("chunk_id="):
                continue
            try:
                cid = int(name.split("=", 1)[1])
            except ValueError:
                continue  # not a partition dir — never wedge maintenance
            if cid in exclude:
                continue
            done += int(self.compact_chunk(cid, layout=layout))
        return done

    def label_values(self, key: str) -> DataFrame:
        """Distinct values of one label key (Prometheus label_values API
        analog; the reference exposes this only as the LR index keyspace,
        /root/reference/src/indexer/sled_indexer.rs:23-25)."""
        return (
            self.series()
            .select(F.try_element_at("labels", F.lit(key)).alias("value"))
            .filter(F.col("value").isNotNull())
            .distinct()
        )

    def label_names(self) -> DataFrame:
        """Distinct label keys across all series (Prometheus labels API
        analog) — an explode over the megabyte-scale dim, never the
        fact table."""
        return (
            self.series()
            .select(F.explode(F.map_keys("labels")).alias("name"))
            .distinct()
        )

    def drop_chunks_before(self, cutoff_ms: int) -> int:
        """Retention: delete whole chunk partitions whose time range
        ends before cutoff_ms. Partition-level file deletion — no
        rewrite, no scan of surviving data (the operational piece the
        reference's sealed-chunk list implies but never implements;
        chunks accumulate forever in /root/reference/src/db.rs:22-32).
        Returns the number of chunks dropped.
        """
        import shutil

        if not os.path.isdir(self.samples_path):
            return 0
        dropped = 0
        for name in sorted(os.listdir(self.samples_path)):
            if not name.startswith("chunk_id="):
                continue
            try:
                cid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            chunk_end_ms = (cid + 1) * self.chunk_size_ms - 1
            if chunk_end_ms < cutoff_ms:
                shutil.rmtree(os.path.join(self.samples_path, name))
                dropped += 1
        return dropped

    def _rollup(
        self, raw: DataFrame, step_ms: int, extra_keys: tuple[str, ...] = ()
    ) -> DataFrame:
        """The tiering aggregate shared by write-time rollups and the
        on-the-fly path in query_downsampled — using ONE construction
        on both sides makes rolled and raw chunks bit-identical under
        every served aggregate: [series_id, bucket_ms, n_points,
        sum_value (DECIMAL — order-free), min/max_value, last struct
        (max by (ts, value) — deterministic under duplicate ts)].
        Every stored stat is MERGEABLE (sum/sum/min/max/struct-max), so
        partials split across chunk boundaries re-merge losslessly —
        query_downsampled relies on this. ``extra_keys`` prepends group
        keys (the batched retention pass groups by chunk_id too, so a
        bucket straddling two chunks stays a per-chunk partial and each
        partial lands in its own rollup partition)."""
        bucket = (
            (F.floor(F.col("timestamp") / F.lit(step_ms)) * F.lit(step_ms))
            .cast("long")
            .alias("bucket_ms")
        )
        return raw.groupBy(*extra_keys, "series_id", bucket).agg(
            F.count("*").alias("n_points"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max(F.struct(F.col("timestamp"), F.col("value"))).alias("last"),
        )

    def _rollup_dir(self, step_ms: int) -> str:
        return os.path.join(self.path, "rollups", f"step_ms={step_ms}")

    def downsample_retention(
        self, cutoff_ms: int, step_ms: int
    ) -> tuple[int, int]:
        """Resolution-tiering retention (the Thanos/Prometheus
        downsampling story — keep raw data hot, keep only step-grain
        aggregates beyond the horizon): ONE filtered scan of every
        chunk whose range ends before ``cutoff_ms`` → one grouped
        rollup keyed by (chunk_id, series, bucket) → one
        dynamic-partition-overwrite write into
        ``rollups/step_ms=<s>/chunk_id=<cid>`` — then delete the raw
        partitions. Job count is O(1) per pass, independent of the
        number of expired chunks (a years-deep backlog of 2-day chunks
        is one Spark job, not thousands of serialized read→write
        jobs); dynamic overwrite replaces exactly the partitions
        present in this pass's data, so replays are idempotent and
        previously rolled chunks are never touched. Grouping includes
        chunk_id, so a step bucket straddling a chunk boundary stays a
        per-chunk PARTIAL in its own partition — query_downsampled
        re-merges partials (every stored stat is mergeable). A crash
        between write and delete leaves BOTH tiers for a chunk;
        query_downsampled prefers the rollup for any rolled chunk, so
        the window never double-counts, and a retried pass converges
        (fully tiered chunks are absent from the raw listing → absent
        from the scan → their rollup partitions untouched). Lossy by
        design — raw points are gone; use export_chunk_gorilla for the
        lossless cold archive. Returns (chunks_rolled, chunks_dropped).
        """
        import shutil

        if not os.path.isdir(self.samples_path):
            return (0, 0)
        expired = []
        for name in sorted(os.listdir(self.samples_path)):
            if not name.startswith("chunk_id="):
                continue
            try:
                cid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if (cid + 1) * self.chunk_size_ms - 1 < cutoff_ms:
                expired.append(cid)
        if not expired:
            return (0, 0)
        raw = self.samples().filter(F.col("chunk_id").isin(expired))
        (
            self._rollup(raw, step_ms, extra_keys=("chunk_id",))
            .repartition("chunk_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("chunk_id")
            .parquet(self._rollup_dir(step_ms))
        )
        for cid in expired:
            shutil.rmtree(
                os.path.join(self.samples_path, f"chunk_id={cid}"),
                ignore_errors=True,
            )
        return (len(expired), len(expired))

    def _rolled_chunk_ids(self, step_ms: int) -> list[int]:
        base = self._rollup_dir(step_ms)
        if not os.path.isdir(base):
            return []
        out = []
        for name in os.listdir(base):
            if name.startswith("chunk_id="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def query_downsampled(
        self,
        matchers,
        start_ms: int,
        end_ms: int,
        step_ms: int,
        agg: str = "avg",
    ) -> DataFrame:
        """Step-grain query across BOTH retention tiers: rolled chunks
        served from their stored aggregates, still-raw chunks
        downsampled on the fly with the identical construction, one
        union + semi-join against the matched dim, then a partial
        MERGE on (series_id, bucket_ms). ``agg`` ∈ {avg, sum, min,
        max, last, count}. Rolled buckets are whole-bucket aggregates,
        so the query range snaps outward to the step grid on rolled
        data (the standard tiered-TSDB caveat); raw chunks honor the
        SAME outward snap at both ends (timestamp bounds cover every
        bucket whose start lands in [lo, end_ms]) so a chunk serves
        identical values whichever tier it is in. The merge step is
        load-bearing, not belt-and-braces: when step_ms does not
        divide chunk_size_ms, a bucket straddling a chunk boundary
        arrives as per-chunk partials (one per rolled partition, plus
        possibly a raw-tier partial) — every stored stat is mergeable
        (sum/sum/min/max/struct-max), so the grouped merge
        reconstructs the exact whole-bucket aggregate. Returns
        [series_id, bucket_ms, n_points, value] ordered within series
        time-ascending by the caller's choice."""
        rolled = self._rolled_chunk_ids(step_ms)
        lo = (start_ms // step_ms) * step_ms
        hi = (end_ms // step_ms + 1) * step_ms - 1  # end of end_ms's bucket
        parts = []
        if rolled:
            # chunk_id pruning on the rollup tier too: a bucket partial
            # stored in chunk c only aggregates points inside c's range,
            # so partials for buckets starting in [lo, end_ms] (points
            # in [lo, hi]) live only in chunk partitions overlapping
            # [lo, hi]. Without this the rolled tier — which grows
            # unboundedly with retention age — scans every historical
            # rollup partition per query.
            ro = (
                self.spark.read.parquet(self._rollup_dir(step_ms))
                .filter(
                    chunk_pred(lo, hi, self.chunk_size_ms)
                    & (F.col("bucket_ms") >= lo)
                    & (F.col("bucket_ms") <= end_ms)
                )
                .drop("chunk_id")
            )
            parts.append(ro)
        raw = self.samples().filter(
            chunk_pred(lo, hi, self.chunk_size_ms)
            & (F.col("timestamp") >= lo)
            & (F.col("timestamp") <= hi)
        )
        if rolled:
            raw = raw.filter(~F.col("chunk_id").isin(rolled))
        parts.append(self._rollup(raw, step_ms))
        tiers = parts[0]
        for p in parts[1:]:
            tiers = tiers.unionByName(p, allowMissingColumns=False)
        sel = self._matched_series(matchers).select("series_id")
        tiers = tiers.join(self._dim_hint(sel), "series_id", "left_semi")
        # Merge partials: map-combinable, runs AFTER the semi-join
        # prunes to matched series. sum over DECIMAL(28,6) partials
        # widens to (38,6) — exact; struct-max of struct-max picks the
        # same deterministic last point.
        tiers = tiers.groupBy("series_id", "bucket_ms").agg(
            F.sum("n_points").alias("n_points"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.max("last").alias("last"),
        )
        value = {
            "avg": F.col("sum_value").cast("double") / F.col("n_points"),
            "sum": F.col("sum_value").cast("double"),
            "min": F.col("min_value"),
            "max": F.col("max_value"),
            "last": F.col("last.value"),
            "count": F.col("n_points").cast("double"),
        }[agg]
        return tiers.select(
            "series_id", "bucket_ms", "n_points", value.alias("value")
        )

    def delete_series(self, matchers) -> int:
        """Selective series deletion (GDPR / tombstone analog): remove
        every series matching ``matchers`` — dict superset semantics or
        a LabelMatcher list, same surface as query() — from BOTH
        tables. Returns the number of series deleted.

        The reference has no delete at all (chunks accumulate forever,
        /root/reference/src/db.rs:22-32); this is the operational
        companion to drop_chunks_before: retention deletes by TIME at
        partition granularity, this deletes by IDENTITY and therefore
        must rewrite fact partitions. Each chunk partition is rewritten
        through the same staged-rename protocol as compact_chunk
        (write tmp → swap → drop old; crash recovery via
        _recover_compaction), anti-joined against the matched id set
        under the usual dim-size broadcast gate; the dim is swapped
        last, so a crash mid-delete can leave already-rewritten chunks
        (points gone — deletes replay idempotently) but never a dim row
        pointing at deleted points' series without its metadata.

        At 100 TB: cost is one read+write of the fact table — the
        honest price of identity-grain deletion on immutable storage;
        a manifest format with per-file series-id stats would let
        untouched files be skipped. Run in the same read-quiesced
        window as compaction (same swap caveat). Not safe concurrently
        with writers. Concurrent READERS are safe against the dim
        swap: a pid lock file (_compact/series.lock) staged around the
        two renames lets a reader's _recover_compaction distinguish a
        LIVE delete mid-swap (lock pid running → leave staging alone)
        from a crashed one (dead pid → stale lock removed, series.old
        restored). The known residual is pid recycling: a reused pid
        can defer recovery until that unrelated process exits.
        """
        import shutil

        sel = self._matched_series(matchers).select("series_id").persist()
        try:
            n = sel.count()
            if n == 0:
                return 0
            self._recover_compaction()
            staging = os.path.join(self.path, "_compact")
            os.makedirs(staging, exist_ok=True)
            if os.path.isdir(self.samples_path):
                for name in sorted(os.listdir(self.samples_path)):
                    if not name.startswith("chunk_id="):
                        continue
                    part = os.path.join(self.samples_path, name)
                    cid = name.split("=", 1)[1]
                    tmp = os.path.join(staging, f"chunk_{cid}.tmp")
                    old = os.path.join(staging, f"chunk_{cid}.old")
                    shutil.rmtree(tmp, ignore_errors=True)
                    shutil.rmtree(old, ignore_errors=True)
                    kept = self.spark.read.parquet(part).join(
                        self._dim_hint(sel), "series_id", "left_anti"
                    )
                    kept.write.mode("overwrite").parquet(tmp)
                    os.rename(part, old)
                    os.rename(tmp, part)
                    shutil.rmtree(old)
            if os.path.exists(self.series_path):
                dim_tmp = os.path.join(staging, "series.tmp")
                dim_old = os.path.join(staging, "series.old")
                shutil.rmtree(dim_tmp, ignore_errors=True)
                shutil.rmtree(dim_old, ignore_errors=True)
                self.series().join(sel, "series_id", "left_anti").write.mode(
                    "overwrite"
                ).parquet(dim_tmp)
                # pid lock around the swap: tells a concurrent reader's
                # _recover_compaction that series.old belongs to a LIVE
                # delete (skip restore) vs a crashed one (restore). A
                # real crash leaves the lock with a dead pid → stale →
                # recovery proceeds exactly as before the lock existed.
                marker = os.path.join(staging, "series.lock")
                with open(marker, "w") as f:
                    f.write(str(os.getpid()))
                try:
                    os.rename(self.series_path, dim_old)
                    os.rename(dim_tmp, self.series_path)
                except BaseException:
                    # process still alive: undo a half-done swap so an
                    # aborted (not crashed) delete never strands the dim
                    if not os.path.isdir(self.series_path) and os.path.isdir(
                        dim_old
                    ):
                        os.rename(dim_old, self.series_path)
                    raise
                finally:
                    try:
                        os.remove(marker)
                    except OSError:
                        pass
                shutil.rmtree(dim_old)
            return n
        finally:
            sel.unpersist()

    def chunks(self) -> DataFrame:
        """Chunk inventory: [chunk_id, start_ms, end_ms, n_files,
        bytes] per sealed/live partition — the observability view of
        the reference's sealed-chunk list + chunk metadata
        (/root/reference/src/db.rs:22-32, chunk.rs:22-56). Reads the
        partition directory listing only — no data scan."""
        rows = []
        if os.path.isdir(self.samples_path):
            for name in sorted(os.listdir(self.samples_path)):
                if not name.startswith("chunk_id="):
                    continue
                try:
                    cid = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                d = os.path.join(self.samples_path, name)
                files = [
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                ]
                rows.append(
                    (
                        cid,
                        cid * self.chunk_size_ms,
                        (cid + 1) * self.chunk_size_ms - 1,
                        len(files),
                        sum(os.path.getsize(f) for f in files),
                    )
                )
        return self.spark.createDataFrame(
            rows, "chunk_id long, start_ms long, end_ms long, n_files long, bytes long"
        )
