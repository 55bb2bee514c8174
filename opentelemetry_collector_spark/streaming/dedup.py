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
from ..pins import free as pins_free
from .sinks import IdempotentParquetSink


# -- compaction bookkeeping (WAL-truncation analog, shared by both
# dedupers) -----------------------------------------------------------
# a compaction artifact is <root>/data/compact=<C> (the merged content of
# every slice ≤ C at compact time) published by the atomic marker
# <root>/_compactions/<C>.json; readers take the LARGEST marker and read
# only epoch dirs ABOVE it, so thousands of micro-batch slices collapse
# into one merged file set. Reference analog: the persistent queue
# deletes exported items instead of replaying the whole WAL forever
# (persistent_storage.go item cleanup).


def _compactions_dir(sink: IdempotentParquetSink) -> str:
    return os.path.join(sink.root, "_compactions")


def _latest_compaction(sink: IdempotentParquetSink) -> int | None:
    d = _compactions_dir(sink)
    if not os.path.isdir(d):
        return None
    ids = sorted(int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json"))
    return ids[-1] if ids else None


def _publish_compaction(sink: IdempotentParquetSink, cid: int, meta: dict) -> None:
    import json

    d = _compactions_dir(sink)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"{cid}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, os.path.join(d, f"{cid}.json"))  # atomic publish


def _paths_before(sink: IdempotentParquetSink, epoch_id: int) -> tuple[list[str], list[int]]:
    """(paths, live_epochs) covering every slice committed in epochs
    strictly before ``epoch_id`` — the newest compaction artifact stands
    in for everything at or below its id."""
    comp = _latest_compaction(sink)
    paths = []
    if comp is not None:
        if comp >= epoch_id:
            # a compaction may never absorb an epoch that could still
            # replay — compact() enforces it; a marker violating it
            # means the state dir was corrupted out-of-band
            raise ValueError(
                f"compaction {comp} covers epoch {epoch_id} whose "
                "replay view it would change"
            )
        paths.append(os.path.join(sink.data_dir, f"compact={comp}"))
    live = [
        e
        for e in sink.committed_epochs()
        if e < epoch_id and (comp is None or e > comp)
    ]
    paths.extend(os.path.join(sink.data_dir, f"epoch={e}") for e in live)
    return paths, live


def _gc_below(
    sinks: list[IdempotentParquetSink], bound: int, keep_compaction: int | None = None
) -> None:
    """Remove epoch slices and compaction artifacts with id < bound
    (except ``keep_compaction``) — only ever called for ids already
    absorbed by a published compaction; idempotent and self-healing."""
    import shutil

    for sink in sinks:
        for e in [x for x in sink.committed_epochs() if x < bound]:
            shutil.rmtree(
                os.path.join(sink.data_dir, f"epoch={e}"), ignore_errors=True
            )
            try:
                os.remove(sink._marker(e))
            except OSError:
                pass
        cdir = _compactions_dir(sink)
        if os.path.isdir(cdir):
            for f in os.listdir(cdir):
                if not f.endswith(".json"):
                    continue
                cid = int(f.split(".")[0])
                if cid < bound and cid != keep_compaction:
                    shutil.rmtree(
                        os.path.join(sink.data_dir, f"compact={cid}"),
                        ignore_errors=True,
                    )
                    try:
                        os.remove(os.path.join(cdir, f))
                    except OSError:
                        pass


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
        # the previous micro-batch's accumulated-bloom checkpoint,
        # freed on the next _bloom_before call (see there)
        self._bloom_pin: DataFrame | None = None

    def _digest_paths_before(self, epoch_id: int) -> tuple[list[str], list[int]]:
        return _paths_before(self.sink, epoch_id)

    def _seen_before(self, spark: SparkSession, epoch_id: int) -> DataFrame:
        """Digests of committed epochs strictly before ``epoch_id`` —
        excluding the current epoch keeps a replayed batch's view
        identical to its original run. Compaction preserves the view:
        survivor computation depends only on the digest SET (anti join +
        within-batch groupBy), and the merged artifact carries exactly
        the union of the epochs it absorbed."""
        paths, _ = self._digest_paths_before(epoch_id)
        if not paths:
            return spark.createDataFrame([], "digest string")
        return spark.read.parquet(*paths).select("digest")

    def _bloom_before(self, spark: SparkSession, epoch_id: int) -> DataFrame | None:
        """OR of the per-epoch blooms covering every committed DIGEST
        epoch < epoch_id; epochs missing their bloom slice are rebuilt
        from their digests (exactness requires the accumulated filter to
        cover the whole seen set — extra bits are harmless, missing bits
        are not). A bloom compaction artifact stands in for the slices
        at or below its id. Returns None when there is no prior epoch."""
        digest_paths, live = self._digest_paths_before(epoch_id)
        if not digest_paths:
            return None
        have = set(self.bloom_sink.committed_epochs())
        bcomp = _latest_compaction(self.bloom_sink)
        dcomp = _latest_compaction(self.sink)
        bloom_paths = []
        missing_paths = []
        if dcomp is not None:
            if bcomp == dcomp:
                bloom_paths.append(
                    os.path.join(self.bloom_sink.data_dir, f"compact={bcomp}")
                )
            else:  # digest state compacted but bloom artifact absent —
                # rebuild that span from the merged digests
                missing_paths.append(
                    os.path.join(self.sink.data_dir, f"compact={dcomp}")
                )
        bloom_paths.extend(
            os.path.join(self.bloom_sink.data_dir, f"epoch={e}")
            for e in live
            if e in have
        )
        missing_paths.extend(
            os.path.join(self.sink.data_dir, f"epoch={e}")
            for e in live
            if e not in have
        )
        parts = []
        if bloom_paths:
            parts.append(
                spark.read.parquet(*bloom_paths).select("m_bits", "k", "words")
            )
        if missing_paths:
            digests = spark.read.parquet(*missing_paths).select("digest")
            parts.append(
                bloom_build(
                    digests, "digest", m_bits=self.bloom_m_bits, k=self.bloom_k
                )
            )
        rows = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        # ALWAYS reduce to one row — the per-epoch read yields one row
        # per epoch, and a multi-row frame would fan out the gate's
        # cross join. One tiny row consumed by the gate's broadcast —
        # pin it so the union/build runs once. The PREVIOUS call's pin is
        # dead by now (its epoch's consuming action committed before this
        # one started), so free it here — a long-running stream would
        # otherwise accumulate one ~m_bits/64-word checkpoint row per
        # micro-batch for the session lifetime.
        if self._bloom_pin is not None:
            pins_free(self._bloom_pin)
        self._bloom_pin = bloom_union(rows).localCheckpoint(eager=True)
        return self._bloom_pin

    def _sinks(self) -> list:
        return [x for x in (self.sink, self.bloom_sink) if x is not None]

    def compact(self, spark: SparkSession, upto_epoch: int) -> int:
        """Merge every committed snapshot slice at or below ``upto_epoch``
        (including a prior compaction artifact) into ONE artifact, then
        delete the absorbed slices — the WAL-truncation analog that keeps
        per-batch state reads epoch-count-bounded over months of
        micro-batches. Returns the number of slices absorbed (0 = nothing
        to do).

        Safety contract: ``upto_epoch`` must be strictly below the
        NEWEST committed epoch — the newest epoch is the only one a
        crash-replay can re-run, and its replay view must not change
        (enforced here; the read side re-checks). Everything older is
        final: its digests are a pure set union, so the merged artifact
        reproduces every later batch's view bit-for-bit. Crash points:
        before the marker → orphan data directory, readers unaffected;
        after the marker → absorbed-slice deletion re-runs harmlessly
        (readers already prefer the marker)."""
        committed = self.sink.committed_epochs()
        if not committed:
            return 0
        if upto_epoch >= max(committed):
            raise ValueError(
                f"compact(upto_epoch={upto_epoch}) must stay below the "
                f"newest committed epoch {max(committed)} (replay safety)"
            )
        prev = _latest_compaction(self.sink)
        targets = [
            e for e in committed if e <= upto_epoch and (prev is None or e > prev)
        ]
        n_slices = len(targets) + (1 if prev is not None else 0)
        if n_slices < 2:
            if prev is not None:
                _gc_below(self._sinks(), prev + 1)  # heal a crashed earlier deletion
            return 0
        cid = max(targets) if targets else prev
        # bloom artifact FIRST (derived state; resolver tolerates its
        # absence but not a digest/bloom id mismatch in the other order)
        if self.bloom_sink is not None:
            merged_bloom = self._bloom_before(spark, upto_epoch + 1)
            merged_bloom.write.mode("overwrite").parquet(
                os.path.join(self.bloom_sink.data_dir, f"compact={cid}")
            )
        paths = [os.path.join(self.sink.data_dir, f"epoch={e}") for e in targets]
        if prev is not None:
            paths.append(os.path.join(self.sink.data_dir, f"compact={prev}"))
        merged = spark.read.parquet(*paths).select("digest")
        out = os.path.join(self.sink.data_dir, f"compact={cid}")
        merged.write.mode("overwrite").parquet(out)
        if self.bloom_sink is not None:
            _publish_compaction(
                self.bloom_sink, cid, {"absorbed": targets, "prior": prev}
            )
        _publish_compaction(
            self.sink, cid, {"absorbed": targets, "prior": prev}
        )
        # garbage-collect EVERYTHING at or below the new artifact except
        # the artifact itself — sweeping by id (not by this run's target
        # list) makes a crash mid-delete self-healing: a re-run or the
        # next compact() removes whatever an interrupted one left behind
        _gc_below(self._sinks(), cid + 1, keep_compaction=cid)
        return n_slices

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
            # gate the anti join: definite-new rows bypass it map-side.
            # The bloom row rides the cross join PREFIXED — the record
            # frame keeps every user column, which may legitimately be
            # named m_bits/k/words
            gated = hashed.crossJoin(
                F.broadcast(bloom.select(F.col("words").alias("__bloom_words")))
            ).withColumn(
                "__maybe",
                bloom_might_contain(
                    F.col("__digest"),
                    self.bloom_m_bits,
                    self.bloom_k,
                    words_col="__bloom_words",
                ),
            )
            gate_cols = ["__bloom_words", "__maybe"]
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

    def _seen_sigs(
        self, spark: SparkSession, epoch_id: int, like: DataFrame | None = None
    ) -> DataFrame:
        paths, _ = _paths_before(self.sink, epoch_id)
        if not paths:
            # derive the id column's type from the live batch frame — the
            # streaming default id_col is 'url' (string), and a hardcoded
            # 'long' would type-mismatch any union/write/schema-compare
            # against the real parquet slices
            id_type = (
                like.schema[self.id_col].dataType.simpleString()
                if like is not None and self.id_col in like.columns
                else "long"
            )
            schema = ", ".join(
                [f"{self.id_col} {id_type}"]
                + [f"{c} long" for c in self._sig_cols()]
            )
            return spark.createDataFrame([], schema)
        return spark.read.parquet(*paths)

    def compact(self, spark: SparkSession, upto_epoch: int) -> int:
        """Merge every committed signature slice at or below
        ``upto_epoch`` into one artifact — identical protocol and replay
        contract as :meth:`StreamingDeduper.compact` (survivor
        signatures are disjoint across epochs, so the artifact is a pure
        row union and every later batch's candidate set is unchanged)."""
        committed = self.sink.committed_epochs()
        if not committed:
            return 0
        if upto_epoch >= max(committed):
            raise ValueError(
                f"compact(upto_epoch={upto_epoch}) must stay below the "
                f"newest committed epoch {max(committed)} (replay safety)"
            )
        prev = _latest_compaction(self.sink)
        targets = [
            e for e in committed if e <= upto_epoch and (prev is None or e > prev)
        ]
        n_slices = len(targets) + (1 if prev is not None else 0)
        if n_slices < 2:
            if prev is not None:
                _gc_below([self.sink], prev + 1)  # heal a crashed deletion
            return 0
        cid = max(targets)
        paths = [os.path.join(self.sink.data_dir, f"epoch={e}") for e in targets]
        if prev is not None:
            paths.append(os.path.join(self.sink.data_dir, f"compact={prev}"))
        spark.read.parquet(*paths).write.mode("overwrite").parquet(
            os.path.join(self.sink.data_dir, f"compact={cid}")
        )
        _publish_compaction(self.sink, cid, {"absorbed": targets, "prior": prev})
        _gc_below([self.sink], cid + 1, keep_compaction=cid)
        return n_slices

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
            seen = self._seen_sigs(spark, int(epoch_id), like=sigs)
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
