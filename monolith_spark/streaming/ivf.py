"""Online maintenance of the persisted IVF index.

`operators/similarity.py:write_ivf_index` materializes a static
cell-partitioned ANN index; an ingest pipeline needs the online form:
embeddings arriving on a stream become probe-able without rebuilding
or rescanning the index. Centroids stay FIXED (the FAISS operating
model — retrain offline when drift warrants, then rebuild), so cell
assignment is a narrow map over each micro-batch with no coordination.

Layout: ``path/epoch_id=<n>/cell=<k>/*.parquet`` plus the
``_ivf_centroids.json`` sidecar. Every batch writes ONLY its own
epoch directory with mode=overwrite, so a crash-and-replay of an
epoch clobbers its own half-written output instead of duplicating
rows (same replay contract as StreamingNearDupIndex); the ``.done``
epoch ledger is the fast-path skip. Probes via
`similarity.ivf_topk_indexed` work unchanged: ``cell`` is still a
partition column (second level), so the driver-resolved IN-filter
prunes to probed cells across every epoch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from monolith_spark.operators.similarity import _cell_sims, _dbl, norm_expr


@dataclass
class StreamingIVFIndex:
    """foreachBatch sink appending cell-assigned vectors to a
    persisted IVF index under fixed centroids."""

    spark: SparkSession
    path: str
    centroids: list[list[float]] | None = None
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    _meta: str = field(init=False, repr=False, default="")

    def __post_init__(self) -> None:
        os.makedirs(self.path, exist_ok=True)
        self._meta = os.path.join(self.path, "_ivf_centroids.json")
        if self.centroids is None:
            with open(self._meta) as fh:  # pre-trained index required
                self.centroids = json.load(fh)
        elif not os.path.exists(self._meta):
            with open(self._meta, "w") as fh:
                json.dump(self.centroids, fh)
        self._epochs_dir = os.path.join(self.path, "_epochs")
        os.makedirs(self._epochs_dir, exist_ok=True)

    def _epoch_done(self, epoch_id: int) -> bool:
        return os.path.exists(os.path.join(self._epochs_dir, f"{epoch_id}.done"))

    def _mark_epoch(self, epoch_id: int) -> None:
        with open(os.path.join(self._epochs_dir, f"{epoch_id}.done"), "w") as f:
            f.write("")

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self._epoch_done(epoch_id):
            return
        assigned = batch_df.select(
            F.col(self.id_col).alias("neighbor_id"),
            _dbl(self.vec_col).alias("c_vec"),
            norm_expr(_dbl(self.vec_col)).alias("cn"),
        ).withColumn(
            "cell", F.array_max(_cell_sims("c_vec", self.centroids))["cid"]
        )
        (
            assigned.write.partitionBy("cell")
            .mode("overwrite")
            .parquet(os.path.join(self.path, f"epoch_id={int(epoch_id)}"))
        )
        self._mark_epoch(epoch_id)

    def start(
        self, stream: DataFrame, checkpoint: str, trigger_seconds: float | None = None
    ) -> StreamingQuery:
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
        if trigger_seconds is not None:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return writer.start()
