"""Cross-micro-batch exact dedup for Structured Streaming pipelines.

A continuous ingest (monthly crawl slices, a tailing receiver) must not
re-emit a document it already shipped in an earlier micro-batch.
:class:`StreamingDeduper` runs :func:`~..operators.dedup.dedup_incremental`
inside ``foreachBatch`` against a digest snapshot persisted with the same
epoch-idempotent two-step as every sink (data, then commit marker):

- batch N dedupes against the digests of committed epochs **< N** only,
  then idempotently writes its own survivors' digests as epoch N;
- a REPLAYED micro-batch (crash between snapshot commit and checkpoint
  commit) therefore sees exactly the snapshot state it saw originally —
  its own epoch's digests are excluded from the read and its write is
  skipped by the marker — so the survivor set is bit-identical on
  replay: exactly-once end to end, same argument as
  ``IdempotentParquetSink.write_epoch``.

State is bounded by DISTINCT content, not stream length, and lives in
parquet (maps 1:1 onto an Iceberg digest table at cluster scale), not in
executor memory — unlike ``dropDuplicates`` over an unbounded stream,
whose state store must hold every key with no watermark to expire exact
digests. Membership stays a keyed anti join on the 32-byte digest.

Reference analog: the collector's persistent-queue WAL dedup guarantee
(exporter/exporterhelper/internal/persistent_storage.go:283-349 replay
semantics), lifted from queue items to document content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import dedup_incremental
from .sinks import IdempotentParquetSink


class StreamingDeduper:
    """Epoch-snapshot exact dedup for ``foreachBatch`` loops."""

    def __init__(self, snapshot_root: str, id_col: str = "doc_id", text_col: str = "text"):
        self.sink = IdempotentParquetSink(snapshot_root, name="digest_snapshot")
        self.id_col = id_col
        self.text_col = text_col

    def _seen_before(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        """Digests of committed epochs strictly before ``epoch_id`` —
        excluding the current epoch keeps a replayed batch's view
        identical to its original run."""
        epochs = [e for e in self.sink.committed_epochs() if e < epoch_id]
        if not epochs:
            return spark.createDataFrame([], "digest string")
        paths = [os.path.join(self.sink.data_dir, f"epoch={e}") for e in epochs]
        return spark.read.parquet(*paths).select("digest")

    def dedupe_batch(self, df: DataFrame, epoch_id: int) -> DataFrame:
        """Survivors of this micro-batch: first occurrence within the
        batch, minus anything a PRIOR committed epoch already shipped.
        Persists the survivors' digests as this epoch's snapshot slice
        (idempotent; a replay skips the write). Returns the survivor
        frame in ``dedup_exact`` shape ``(digest, id, n_copies)`` —
        CACHED, because it feeds both the snapshot write (already run)
        and the caller's downstream sinks; call ``.unpersist()`` when
        the epoch's writes are done (the foreachBatch persist pattern,
        stream.py process_batch)."""
        spark = df.sparkSession
        survivors, _ = dedup_incremental(
            df, self._seen_before(spark, int(epoch_id)),
            id_col=self.id_col, text_col=self.text_col,
        )
        survivors = survivors.persist()
        self.sink.write_epoch(survivors.select("digest"), int(epoch_id))
        return survivors

    def dedupe_batch_rows(self, df: DataFrame, epoch_id: int) -> DataFrame:
        """Like :meth:`dedupe_batch` but returns the surviving ROWS with
        every original column intact — the shape a pipeline's processor
        chain needs (the digest-summary shape drops the record).
        First occurrence within the batch = lowest ``id_col`` per digest
        (one window shuffle on the same 32-byte key the anti join uses);
        the snapshot slice written is the survivors' distinct digests.
        Returns a CACHED frame — caller unpersists after its writes."""
        spark = df.sparkSession
        hashed = df.withColumn("__digest", F.md5(F.col(self.text_col)))
        seen = self._seen_before(spark, int(epoch_id))
        fresh = hashed.join(
            seen.withColumnRenamed("digest", "__digest"), "__digest", "left_anti"
        )
        w = Window.partitionBy("__digest").orderBy(self.id_col)
        survivors = (
            fresh.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .drop("__rk", "__digest")
            .persist()
        )
        # survivors carry unique digests by construction (rk=1 per
        # digest), so the snapshot slice is a map-side re-hash of the
        # persisted rows — no distinct pass, and the RETURNED frame is
        # the persisted one (unpersist() works on it directly)
        self.sink.write_epoch(
            survivors.select(F.md5(F.col(self.text_col)).alias("digest")),
            int(epoch_id),
        )
        return survivors
