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

from ..operators.dedup import (
    bloom_build,
    bloom_might_contain,
    bloom_union,
    dedup_incremental,
    dedup_incremental_bloom,
)
from .sinks import IdempotentParquetSink


class StreamingDeduper:
    """Epoch-snapshot exact dedup for ``foreachBatch`` loops.

    ``bloom_m_bits`` (optional) enables the Bloom-gated membership path:
    each epoch additionally persists the Bloom filter of ITS OWN
    survivors' digests (one m/8-byte row, same idempotent two-step
    under ``<root>/bloom``), and each batch gates the corpus-sized
    anti join behind the OR of the committed per-epoch filters
    (:func:`~..operators.dedup.bloom_union` — filters are closed under
    union, so the accumulated filter is maintained in epoch-count work,
    never a corpus re-scan). Definite-new rows bypass the join
    map-side; results are bit-identical to the ungated path for every
    filter size (no false negatives). A digest epoch whose bloom slice
    is missing (legacy snapshot, or a crash between the digest commit
    and the bloom commit) is rebuilt on the fly from its digests —
    correctness never depends on the bloom artifact being present.
    """

    def __init__(
        self,
        snapshot_root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        bloom_m_bits: int | None = None,
        bloom_k: int = 5,
    ):
        self.sink = IdempotentParquetSink(snapshot_root, name="digest_snapshot")
        self.id_col = id_col
        self.text_col = text_col
        self.bloom_m_bits = bloom_m_bits
        self.bloom_k = bloom_k
        self.bloom_sink = (
            IdempotentParquetSink(
                os.path.join(snapshot_root, "bloom"), name="bloom_snapshot"
            )
            if bloom_m_bits
            else None
        )

    def _seen_before(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        """Digests of committed epochs strictly before ``epoch_id`` —
        excluding the current epoch keeps a replayed batch's view
        identical to its original run."""
        epochs = [e for e in self.sink.committed_epochs() if e < epoch_id]
        if not epochs:
            return spark.createDataFrame([], "digest string")
        paths = [os.path.join(self.sink.data_dir, f"epoch={e}") for e in epochs]
        return spark.read.parquet(*paths).select("digest")

    def _bloom_before(self, spark: SparkSession, epoch_id: int) -> DataFrame | None:
        """OR of the per-epoch blooms covering every committed DIGEST
        epoch < epoch_id; epochs missing their bloom slice are rebuilt
        from their digests (exactness requires the accumulated filter to
        cover the whole seen set — extra bits are harmless, missing bits
        are not). Returns None when there is no prior epoch."""
        epochs = [e for e in self.sink.committed_epochs() if e < epoch_id]
        if not epochs:
            return None
        have = set(self.bloom_sink.committed_epochs())
        parts = []
        with_bloom = [e for e in epochs if e in have]
        if with_bloom:
            parts.append(
                spark.read.parquet(
                    *[
                        os.path.join(self.bloom_sink.data_dir, f"epoch={e}")
                        for e in with_bloom
                    ]
                ).select("m_bits", "k", "words")
            )
        missing = [e for e in epochs if e not in have]
        if missing:
            digests = spark.read.parquet(
                *[os.path.join(self.sink.data_dir, f"epoch={e}") for e in missing]
            ).select("digest")
            parts.append(
                bloom_build(
                    digests, "digest", m_bits=self.bloom_m_bits, k=self.bloom_k
                )
            )
        rows = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        # ALWAYS reduce to one row — the per-epoch read yields one row
        # per epoch, and a multi-row frame would fan out the gate's
        # cross join. One tiny row consumed by the gate's broadcast —
        # pin it so the union/build runs once.
        return bloom_union(rows).localCheckpoint(eager=True)

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
        seen = self._seen_before(spark, int(epoch_id))
        if self.bloom_m_bits:
            survivors, _ = dedup_incremental_bloom(
                df, seen,
                id_col=self.id_col, text_col=self.text_col,
                m_bits=self.bloom_m_bits, k=self.bloom_k,
                bloom=self._bloom_before(spark, int(epoch_id)),
            )
        else:
            survivors, _ = dedup_incremental(
                df, seen, id_col=self.id_col, text_col=self.text_col
            )
        survivors = survivors.persist()
        self.sink.write_epoch(survivors.select("digest"), int(epoch_id))
        if self.bloom_sink is not None:
            self.bloom_sink.write_epoch(
                bloom_build(
                    survivors.select("digest"),
                    "digest",
                    m_bits=self.bloom_m_bits,
                    k=self.bloom_k,
                ),
                int(epoch_id),
            )
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
        bloom = (
            self._bloom_before(spark, int(epoch_id))
            if self.bloom_m_bits
            else None
        )
        seen_k = seen.withColumnRenamed("digest", "__digest")
        if bloom is not None:
            # gate the anti join: definite-new rows bypass it map-side
            gated = hashed.crossJoin(F.broadcast(bloom)).withColumn(
                "__maybe",
                bloom_might_contain(
                    F.col("__digest"), self.bloom_m_bits, self.bloom_k
                ),
            )
            gate_cols = ["m_bits", "k", "words", "__maybe"]
            fresh = gated.where(~F.col("__maybe")).drop(*gate_cols).unionByName(
                gated.where(F.col("__maybe"))
                .drop(*gate_cols)
                .join(seen_k, "__digest", "left_anti")
            )
        else:
            fresh = hashed.join(seen_k, "__digest", "left_anti")
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
        if self.bloom_sink is not None:
            self.bloom_sink.write_epoch(
                bloom_build(
                    survivors.select(
                        F.md5(F.col(self.text_col)).alias("digest")
                    ),
                    "digest",
                    m_bits=self.bloom_m_bits,
                    k=self.bloom_k,
                ),
                int(epoch_id),
            )
        return survivors


class StreamingNearDeduper:
    """Epoch-snapshot NEAR-dup filter for ``foreachBatch`` loops — the
    MinHash-strength sibling of :class:`StreamingDeduper` (an exact
    digest misses a one-word edit; this doesn't).

    Persistent state per survivor is its FIXED-WIDTH MinHash signature
    (``num_hashes`` longs — bytes per doc are constant regardless of
    document size, unlike a shingle set), written with the same
    epoch-idempotent two-step, so the replay argument is identical to
    the exact deduper's: a replayed micro-batch reads only epochs < N
    and its snapshot write is marker-skipped → bit-identical survivors.

    Filter semantics: band collision against the accumulated signatures
    proposes candidates (ONE band equi-join — LSH bounds the matched
    set); a candidate is dropped when the signature-agreement estimate
    of Jaccard — mean(h_i equal), the unbiased MinHash estimator, σ ≈
    √(j(1−j)/num_hashes) — reaches ``threshold``. Estimator, not exact:
    the snapshot deliberately does not retain document text, so this is
    the ingestion-filter contract (tune num_hashes for tighter σ; the
    batch operator ``minhash_filter_new`` is the exact-verified form
    when both corpora are at hand).
    """

    def __init__(
        self,
        snapshot_root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 16,
        bands: int = 8,
        threshold: float = 0.8,
    ):
        self.sink = IdempotentParquetSink(snapshot_root, name="sig_snapshot")
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold

    def _sig_cols(self) -> list[str]:
        return [f"h{i}" for i in range(self.num_hashes)]

    def _seen_sigs(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        epochs = [e for e in self.sink.committed_epochs() if e < epoch_id]
        schema = ", ".join([f"{self.id_col} long"] + [f"{c} long" for c in self._sig_cols()])
        if not epochs:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.sink.data_dir, f"epoch={e}") for e in epochs]
        return spark.read.parquet(*paths)

    def dedupe_batch_rows(self, df: DataFrame, epoch_id: int) -> DataFrame:
        """Surviving ROWS of this micro-batch (every original column
        intact), minus docs whose estimated Jaccard vs any prior
        survivor reaches the threshold. Persists the survivors'
        signatures as this epoch's snapshot slice. Returns a CACHED
        frame — caller unpersists after its writes."""
        from ..operators.dedup import banded_keys, minhash_signatures

        spark = df.sparkSession
        sigs = minhash_signatures(
            df, self.id_col, self.text_col, self.n, self.num_hashes
        ).persist()
        try:
            seen = self._seen_sigs(spark, int(epoch_id))
            cand = (
                banded_keys(sigs, self.id_col, self.num_hashes, self.bands)
                .alias("nb")
                .join(
                    banded_keys(seen, self.id_col, self.num_hashes, self.bands).alias("sn"),
                    ["band", "key"],
                )
                .select(
                    F.col(f"nb.{self.id_col}").alias("__new_id"),
                    F.col(f"sn.{self.id_col}").alias("__seen_id"),
                )
                .distinct()
            )
            sig_arr = F.array(*[F.col(c) for c in self._sig_cols()])
            new_sigs = sigs.select(
                F.col(self.id_col).alias("__new_id"), sig_arr.alias("__s1")
            )
            seen_sigs = seen.select(
                F.col(self.id_col).alias("__seen_id"), sig_arr.alias("__s2")
            )
            agree = F.aggregate(
                F.zip_with(
                    F.col("__s1"),
                    F.col("__s2"),
                    lambda a, b: F.when(a == b, F.lit(1)).otherwise(F.lit(0)),
                ),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            dup_ids = (
                cand.join(new_sigs, "__new_id")
                .join(seen_sigs, "__seen_id")
                .where(agree / F.lit(float(self.num_hashes)) >= F.lit(self.threshold))
                .select(F.col("__new_id").alias(self.id_col))
                .distinct()
            )
            survivors = df.join(dup_ids, self.id_col, "left_anti").persist()
            self.sink.write_epoch(
                sigs.join(survivors.select(self.id_col), self.id_col),
                int(epoch_id),
            )
            return survivors
        finally:
            sigs.unpersist()
