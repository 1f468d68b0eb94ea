"""Online near-duplicate detection over a document stream.

The batch dedup operators (operators/dedup.py) answer "which docs in
this corpus are near-dups of each other"; a training-data ingest
pipeline needs the online form: *is this incoming document a near-dup
of anything already ingested?* — without rescanning the corpus per
batch.

Design (MinHash-LSH, same construction as dedup.minhash_lsh_pairs):
a persistent parquet index of band signatures [doc_id, band, band_sig]
plus the shingle sets needed for exact verification. Per micro-batch:

1. signatures + shingles for the incoming docs — narrow maps over the
   batch only;
2. within-batch pairs via the regular LSH path;
3. cross-batch candidates via an equi-join of the batch's signatures
   against the persisted index on (band, band_sig) — shuffle volume is
   O(batch × bands) probes against a bucketed key, never a scan of the
   historical corpus;
4. exact shingle-Jaccard verification of candidates only (old-side
   shingles are fetched by candidate id, a keyed semi-join);
5. append the batch's signatures and shingles to the index.

Replay safety follows StreamingIngest's epoch ledger: every output and
index append happens once per epoch, so checkpoint recovery cannot
double-ingest a batch or double-report matches.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from monolith_spark.operators.dedup import (
    doc_shingles,
    minhash_band_signatures,
    minhash_lsh_pairs,
    minhash_signatures,
)

_MATCH_SCHEMA = "new_doc_id long, old_doc_id long, jaccard double, epoch_id long"


@dataclass
class StreamingNearDupIndex:
    """foreachBatch sink maintaining an incremental near-dup index.

    Matches surface as [new_doc_id, old_doc_id, jaccard, epoch_id]
    where old_doc_id was ingested in an earlier batch (or, for
    within-batch pairs, is the lower doc_id).
    """

    spark: SparkSession
    path: str
    n: int = 3
    num_hashes: int = 16
    bands: int = 4
    threshold: float = 0.5

    def __post_init__(self) -> None:
        self.sig_path = os.path.join(self.path, "band_sigs")
        self.shingle_path = os.path.join(self.path, "shingles")
        self.match_path = os.path.join(self.path, "matches")
        self._epochs_dir = os.path.join(self.path, "_epochs")
        os.makedirs(self._epochs_dir, exist_ok=True)

    def _epoch_done(self, epoch_id: int) -> bool:
        return os.path.exists(os.path.join(self._epochs_dir, f"{epoch_id}.done"))

    def _mark_epoch(self, epoch_id: int) -> None:
        with open(os.path.join(self._epochs_dir, f"{epoch_id}.done"), "w") as f:
            f.write("")

    def _cross_batch_matches(self, sigs: DataFrame, sh_new: DataFrame) -> DataFrame:
        old_sigs = self.spark.read.parquet(self.sig_path)
        cands = (
            sigs.join(
                old_sigs.select(
                    F.col("doc_id").alias("old_doc_id"),
                    "band",
                    "band_sig",
                ),
                ["band", "band_sig"],
            )
            .select(F.col("doc_id").alias("new_doc_id"), "old_doc_id")
            .distinct()
        )
        old_sh = (
            self.spark.read.parquet(self.shingle_path)
            .withColumnRenamed("doc_id", "old_doc_id")
            .join(cands.select("old_doc_id").distinct(), "old_doc_id", "semi")
        )
        inter = (
            cands.join(sh_new.withColumnRenamed("doc_id", "new_doc_id"), "new_doc_id")
            .join(old_sh, ["old_doc_id", "shingle"])
            .groupBy("new_doc_id", "old_doc_id")
            .agg(F.count("*").alias("n_inter"))
        )
        n_new = sh_new.groupBy("doc_id").agg(F.count("*").alias("n_new"))
        n_old = old_sh.groupBy("old_doc_id").agg(F.count("*").alias("n_old"))
        return (
            inter.join(F.broadcast(n_new), inter.new_doc_id == n_new.doc_id)
            .join(F.broadcast(n_old), "old_doc_id")
            .withColumn(
                "jaccard",
                F.col("n_inter").cast("double")
                / (F.col("n_new") + F.col("n_old") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select("new_doc_id", "old_doc_id", "jaccard")
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        if self._epoch_done(epoch_id):
            return
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            self._mark_epoch(epoch_id)
            return
        batch = batch.localCheckpoint(eager=True)
        sigs = minhash_band_signatures(
            minhash_signatures(batch, n=self.n, num_hashes=self.num_hashes),
            self.num_hashes,
            self.bands,
        ).localCheckpoint(eager=True)
        sh_new = doc_shingles(batch, n=self.n).localCheckpoint(eager=True)

        # Within-batch pairs: the later id is the "new" doc.
        matches = minhash_lsh_pairs(
            batch, n=self.n, num_hashes=self.num_hashes,
            bands=self.bands, threshold=self.threshold,
        ).select(
            F.col("doc_b").alias("new_doc_id"),
            F.col("doc_a").alias("old_doc_id"),
            "jaccard",
        )
        if os.path.exists(self.sig_path):
            matches = matches.unionByName(self._cross_batch_matches(sigs, sh_new))
        matches = matches.withColumn("epoch_id", F.lit(epoch_id).cast("long"))
        if not matches.isEmpty():
            matches.write.mode("append").parquet(self.match_path)
        sigs.write.mode("append").parquet(self.sig_path)
        sh_new.write.mode("append").parquet(self.shingle_path)
        self._mark_epoch(epoch_id)

    def start(self, docs_stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        return (
            docs_stream.writeStream.outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(self.process_batch)
            .start()
        )

    def matches(self) -> DataFrame:
        if not os.path.exists(self.match_path):
            return self.spark.createDataFrame([], _MATCH_SCHEMA)
        return self.spark.read.parquet(self.match_path)
