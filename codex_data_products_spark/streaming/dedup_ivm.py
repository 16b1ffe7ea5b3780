"""Incrementally-maintained MinHash-LSH duplicate-pair set — the fifth
IVM class next to the aggregate / HLL / join-view / top-k maintainers
in ``streaming.merge``.

The maintained view is EXACTLY the output of the batch
``dedup_minhash_lsh`` query over all documents ingested so far:
verified pairs ``(doc_a, doc_b, jaccard)`` with band-sharing MinHash
signatures and set Jaccard >= threshold. Each batch costs O(|delta|),
not O(|corpus|): new documents hash only themselves, and candidate
generation joins the (tiny, broadcast) delta signatures against the
persisted band table so the persisted side never shuffles.

The one global dependency in the batch pipeline is the stop-shingle
document-frequency cap: ingesting new docs can push a shingle's DF over
the cap, which removes it from the shingle sets of EVERY doc containing
it — changing those docs' signatures and Jaccards. The maintainer
handles this exactly instead of approximately: DF counts are themselves
an incrementally-maintained additive aggregate (the ``combine_agg_state``
shape), a batch that caps shingles triggers a RE-SIGN of just the docs
containing a newly-capped shingle, and the pair set is repaired only
where an endpoint was re-signed. A shingle crossing the cap has DF just
above it, so the re-sign set is bounded by ~cap docs per newly-capped
shingle — the refresh stays delta-proportional.

State layout under ``state_dir`` (versioned snapshots, same
``v=<batch_id>`` anchoring contract as every maintainer in
``streaming.merge``; batch k reads v=k and overwrites v=k+1, so a
foreachBatch replay re-derives the same snapshots):

  * ``shingles/batch=<k>/`` — APPEND-ONLY uncapped (doc_id, shingle)
    rows per ingest batch. O(|delta|) write; a replay overwrites only
    its own ``batch=`` dir. At 100 TB this is the "persist signatures
    bucketed, hash only the delta" table from SCALE.md — stored
    bucketed by shingle so the affected-doc probe is a pruned scan.
  * ``df/v=<k>`` — (shingle, df) corpus document frequencies (the one
    remaining VERSIONED snapshot: an additive aggregate whose fold
    anchors the replay contract; vocab-grain, not doc-grain).
  * ``bands/batch=<k>`` — APPEND-ONLY (doc_id, b0, b1) MinHash band
    signatures written by batch k-1: the batch's delta docs plus the
    DF-cap re-sign set. Re-signed docs' OLD rows die through the same
    ``pairs_removed`` tombstones that repair the pair log (strict
    rule: a tombstone kills rows from strictly earlier batches, so the
    same-batch re-sign survives). O(delta) write — the doc-grain
    snapshot rewrite is gone (VERDICT r8 #2).
  * ``pairs/batch=<k>`` — APPEND-ONLY (doc_a, doc_b, jaccard) pairs
    first verified by batch k, with ``pairs_removed/batch=<k>`` doc
    tombstones for the DF-cap re-sign repair: a re-signed doc's
    pre-repair pairs die (tombstone batch > pair batch), its same-
    batch re-verified pairs survive. The maintained view is the
    tombstone-filtered union (``_tombstoned_pairs``) — the ONE table
    that grows with corpus x duplicate density is never rewritten, so
    a batch's pair-state write is O(delta).

Invariants (property-tested in tests/test_streaming.py): after any
sequence of insert batches with fresh doc_ids, ``pairs`` equals the
from-scratch ``dedup_minhash_lsh`` over the union of all batches, and
``bands``/``df`` equal their from-scratch counterparts.

Reference parity: the reference has no incremental path at all (it
recomputes products from scratch per run — e.g. the full pipeline in
main.py); this maintainer is the Spark-native answer to running that
recompute daily over an append-heavy 100 TB corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.queries.dedup import (
    JACCARD_THRESHOLD,
    SHINGLE_DF_CAP,
    _jaccard_for_pairs,
    minhash_bands,
    shingle_table,
)
from codex_data_products_spark.streaming.merge import read_table

_SHINGLE_SCHEMA = "doc_id long, shingle string"
_DF_SCHEMA = "shingle string, df long"
_BANDS_SCHEMA = "doc_id long, b0 string, b1 string"
_PAIRS_SCHEMA = "doc_a long, doc_b long, jaccard double"


@dataclass(frozen=True)
class DedupStateDirs:
    root: str

    @property
    def shingles(self) -> str:
        return f"{self.root}/shingles"

    @property
    def df(self) -> str:
        return f"{self.root}/df"

    @property
    def bands(self) -> str:
        return f"{self.root}/bands"

    @property
    def pairs(self) -> str:
        return f"{self.root}/pairs"


def _empty(spark: SparkSession, schema: str) -> DataFrame:
    """JVM-native empty frame, ONE empty partition (round 11, guide
    §4). ``createDataFrame([], schema)`` builds a defaultParallelism-
    partition Python RDD, so every downstream action pays a Python
    worker round-trip per partition — the per-batch
    ``rem_df.coalesce(1).write`` of an EMPTY tombstone frame (all six
    maintainers) measured 6-7 s of pure fixed cost per batch, serial
    through one task. A ``range(0)`` projection is pure JVM."""
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    return spark.range(0, 0, 1, 1).select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
    )


def _write_tombstones(
    spark: SparkSession, rem: DataFrame, has_removes: bool, path: str
) -> None:
    """Write one batch's removal-tombstone dir — or, for the common
    insert-only batch, write NOTHING (round 11): every tombstone log is
    read through ``_log_union``, which treats an absent ``batch=<k>``
    dir as empty, so skipping the write saves a job per batch and keeps
    every later log union one scan node narrower. Deleting a leftover
    dir keeps replay over a crashed older attempt idempotent."""
    if has_removes:
        rem.coalesce(1).write.mode("overwrite").parquet(path)
        return
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jvm_path):
        fs.delete(jvm_path, True)


COMBINED_BATCH_CONTRACT = """Shared combined add+remove batch contract
(all six remove-capable IVM maintainers: apply_cluster_batch,
apply_emb_batch, apply_substring_batch, apply_vocab_batch,
apply_ann_batch, apply_pq_batch) — ATOMIC REPLACE:

1. Removes apply to the state strictly BEFORE the batch: tombstones
   written at batch k kill only strictly-earlier rows, and every
   retraction/repair slice reads the pre-batch snapshot.
2. Adds land at batch k and SURVIVE the batch's own tombstones (the
   strictly-older rule), so an id in both adds and removes is replaced
   atomically — old rows and all state derived from them retract, new
   rows and their derived state land, in one batch.
3. Corollary (the cross-family parity gate,
   tests/test_streaming.py::test_combined_batch_equals_remove_then_add):
   a combined batch at k yields the same head snapshot as a
   remove-only batch at k followed by an add-only batch at k+1.
"""


def _remove_frame(
    spark: SparkSession,
    remove,
    col: str = "doc_id",
) -> tuple[DataFrame, bool]:
    """Normalize a maintainer's ``remove`` argument — ``None``, an id
    list/tuple, or a one-column DataFrame — into a distinct
    ``(col long)`` frame plus a cheap known-nonempty flag. A DataFrame
    input is localCheckpointed so the emptiness probe and every
    downstream broadcast read one materialization; the ids never visit
    the driver (10⁵+ retractions stay distributed)."""
    if remove is None:
        return _empty(spark, f"{col} long"), False
    if isinstance(remove, DataFrame):
        if col in remove.columns:
            src = col
        elif len(remove.columns) == 1:
            src = remove.columns[0]
        else:
            raise ValueError(
                f"remove frame has no '{col}' column and is ambiguous "
                f"(columns={remove.columns}); pass a one-column id "
                f"frame or one carrying '{col}'"
            )
        rem = (
            remove.select(F.col(src).cast("long").alias(col))
            .distinct()
            .localCheckpoint()
        )
        return rem, not rem.isEmpty()
    ids = list(dict.fromkeys(int(d) for d in remove))
    if not ids:
        return _empty(spark, f"{col} long"), False
    # Arrow-backed local relation: one JVM-side batch, no Python-RDD
    # partitions (a coalesce(1) over those serializes a worker
    # round-trip per partition — see _empty) and no py4j per-element
    # literal conversion (an exploded lit(ids) measured 65 s at 10⁵ ids)
    import pandas as pd

    return (
        spark.createDataFrame(
            pd.DataFrame({col: pd.array(ids, dtype="int64")})
        ),
        True,
    )


def bootstrap_dedup_state(spark: SparkSession, state_dir: str) -> DedupStateDirs:
    """Write the v=0 snapshots (empty corpus — every document then
    arrives through the change feed; an existing corpus is just a big
    first batch)."""
    dirs = DedupStateDirs(state_dir)
    _empty(spark, _DF_SCHEMA).write.mode("overwrite").parquet(f"{dirs.df}/v=0")
    _empty(spark, _BANDS_SCHEMA).write.mode("overwrite").parquet(
        f"{dirs.bands}/batch=0"
    )
    _empty(spark, _PAIRS_SCHEMA).write.mode("overwrite").parquet(
        f"{dirs.pairs}/batch=0"
    )
    return dirs


def _prior_shingles(
    spark: SparkSession, dirs: DedupStateDirs, batch_id: int
) -> DataFrame:
    """Uncapped shingle rows of every batch BEFORE this one. The
    current batch's own dir is excluded explicitly so a crashed
    attempt's leftover partition can never double-count on replay."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(dirs.shingles)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        return _empty(spark, _SHINGLE_SCHEMA)
    paths = []
    for status in fs.listStatus(jvm_path):
        name = status.getPath().getName()
        if name.startswith("batch=") and int(name[6:]) < batch_id:
            paths.append(f"{dirs.shingles}/{name}")
    if not paths:
        return _empty(spark, _SHINGLE_SCHEMA)
    return spark.read.schema(_SHINGLE_SCHEMA).parquet(*paths)


def apply_dedup_batch(
    batch_docs: DataFrame, state_dir: str, batch_id: int
) -> None:
    """Fold one batch of NEW documents (fresh doc_ids — the corpus is
    append-only) into the maintained dedup state: read the anchored
    v=batch_id snapshots, write v=batch_id+1.

    Scale shape (plan-guarded in tests/test_plans.py): everything
    derived from the delta (new shingles, newly-capped shingles,
    re-sign doc set, delta band signatures, candidate docs) is tiny and
    broadcast; the persisted band table and the persisted shingle log
    are only ever scanned + broadcast-joined, never shuffled.
    """
    spark = batch_docs.sparkSession
    dirs = DedupStateDirs(state_dir)
    cap = F.lit(SHINGLE_DF_CAP)

    df_state = read_table(spark, dirs.df, version=batch_id)
    bands_state = bands_snapshot(spark, state_dir, version=batch_id)
    old_sh = _prior_shingles(spark, dirs, batch_id)

    # -- 1. shingle the delta; append (idempotently) to the shingle log
    delta_sh = shingle_table(batch_docs).persist()
    delta_sh.write.mode("overwrite").parquet(
        f"{dirs.shingles}/batch={batch_id}"
    )

    # -- 2. fold DF counts (additive agg state, same algebra as
    #       combine_agg_state) and find shingles the delta pushed over
    #       the cap
    delta_df = delta_sh.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("_ddf")
    )
    folded = df_state.join(delta_df, "shingle", "full_outer").select(
        "shingle",
        (
            F.coalesce(F.col("df"), F.lit(0))
            + F.coalesce(F.col("_ddf"), F.lit(0))
        ).cast("long").alias("df_new"),
        F.coalesce(F.col("df"), F.lit(0)).alias("df_old"),
    ).persist()
    new_df = folded.select("shingle", F.col("df_new").alias("df"))
    newly_capped = folded.filter(
        (F.col("df_old") <= cap) & (F.col("df_new") > cap)
    ).select("shingle")
    frequent = folded.filter(F.col("df_new") > cap).select("shingle")

    # -- 3. docs needing (re-)signing: the delta itself, plus every OLD
    #       doc containing a newly-capped shingle (their capped shingle
    #       sets shrank). newly_capped is tiny by construction (a
    #       shingle crosses the cap once), so the probe into the
    #       persisted shingle log is a broadcast semi-join.
    affected = (
        old_sh.join(F.broadcast(newly_capped), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .persist()
    )
    resign = (
        delta_sh.select("doc_id")
        .distinct()
        .unionByName(affected)
        .distinct()
        .persist()
    )

    # -- 4. capped shingle sets + band signatures for the re-sign set
    all_sh = old_sh.unionByName(delta_sh)
    sh_r = all_sh.join(F.broadcast(resign), "doc_id", "left_semi").join(
        F.broadcast(frequent), "shingle", "left_anti"
    )
    bands_r = minhash_bands(sh_r).persist()

    # -- 5. new band state: replace the re-signed docs' rows
    new_bands = bands_state.join(
        F.broadcast(resign), "doc_id", "left_anti"
    ).unionByName(bands_r)

    # -- 6. candidate pairs touching the re-sign set, under the NEW
    #       signatures: broadcast(delta bands) x persisted bands.
    #       Within-resign pairs surface from both sides, so normalize
    #       doc order and dedup — the distinct is over the (small)
    #       delta-proportional candidate set, never the corpus.
    r, s = bands_r.alias("r"), new_bands.alias("s")
    ne = F.col("r.doc_id") != F.col("s.doc_id")
    norm = [
        F.least(F.col("r.doc_id"), F.col("s.doc_id")).alias("doc_a"),
        F.greatest(F.col("r.doc_id"), F.col("s.doc_id")).alias("doc_b"),
    ]
    cand = (
        s.join(F.broadcast(r), (F.col("r.b0") == F.col("s.b0")) & ne)
        .select(*norm)
        .unionByName(
            s.join(
                F.broadcast(r),
                (F.col("r.b1") == F.col("s.b1"))
                & (F.col("r.b0") != F.col("s.b0"))
                & ne,
            ).select(*norm)
        )
        .distinct()
        .persist()
    )

    # -- 7. verify ONLY those candidates: exact Jaccard over the capped
    #       shingle sets of the candidate docs (a broadcast-pruned slice
    #       of the shingle log)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_v = all_sh.join(F.broadcast(cand_docs), "doc_id", "left_semi").join(
        F.broadcast(frequent), "shingle", "left_anti"
    )
    verified = _jaccard_for_pairs(cand, sh_v).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )

    # -- 8. repair the pair set only where an endpoint was re-signed:
    #       the pair log appends this batch's verified pairs and
    #       tombstones ONLY the DF-cap-affected OLD docs (delta docs
    #       have no prior pairs to retract, keeping the accumulated
    #       tombstone set release-grain — it must stay broadcastable
    #       forever). A re-signed doc's pre-repair pairs die (tombstone
    #       batch > pair batch); its re-verified pairs, written in the
    #       SAME batch, survive the strict rule. The corpus-scale pair
    #       set is never rewritten — the write is O(delta).
    new_df.write.mode("overwrite").parquet(f"{dirs.df}/v={batch_id + 1}")
    # band state is an append-only log too (VERDICT r8 #2): write ONLY
    # the re-sign set's new signatures — re-signed OLD docs' previous
    # band rows die via the same pairs_removed tombstones below (their
    # SAME-batch replacements survive the strict rule), so no doc-grain
    # snapshot rewrite
    bands_r.write.mode("overwrite").parquet(
        f"{dirs.bands}/batch={batch_id + 1}"
    )
    verified.write.mode("overwrite").parquet(
        f"{dirs.pairs}/batch={batch_id + 1}"
    )
    affected.select("doc_id").write.mode("overwrite").parquet(
        f"{dirs.root}/pairs_removed/batch={batch_id + 1}"
    )
    for frame in (delta_sh, folded, affected, resign, bands_r, cand):
        frame.unpersist()


def run_dedup_maintenance(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    auto_compact_ratio: float | None = 1.0,
) -> None:
    """availableNow foreachBatch drain of a document stream onto the
    maintained duplicate-pair view — the streaming twin of calling
    ``apply_dedup_batch`` per batch, with the standard replay contract:
    a batch anchored to v=batch_id overwrites v=batch_id+1 (and its own
    ``shingles/batch=`` dir), so a crash between state write and
    checkpoint commit re-derives identical snapshots. Pair/band-log
    compaction is ratio-triggered per batch (``compaction_due``; None
    disables)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        apply_dedup_batch(batch, state_dir, batch_id)
        if auto_compact_ratio is not None and compaction_due(
            batch.sparkSession,
            state_dir,
            ("pairs", "bands"),
            auto_compact_ratio,
        ):
            compact_dedup_pairs(
                batch.sparkSession, state_dir, upto=batch_id + 1
            )
            expire_dedup_state(state_dir, keep_last=2)

    (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def dedup_pairs_snapshot(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """The maintained view: (doc_a, doc_b, jaccard) — equal to
    ``dedup_minhash_lsh`` recomputed from scratch over every document
    ingested up to ``version``. Assembled from the append-only pair
    log minus the DF-cap re-sign tombstones (``_tombstoned_pairs``)."""
    dirs = DedupStateDirs(state_dir)
    return _tombstoned_pairs(
        spark,
        dirs.pairs,
        f"{dirs.root}/pairs_removed",
        _PAIRS_SCHEMA,
        version,
    )


# --- SimHash incremental maintenance (VERDICT r6 #7) --------------------------
# The SimHash family's signatures are ROW-LOCAL — a document's simhash
# is a pure function of its own tokens, with no cross-corpus dependency
# like the MinHash stop-shingle DF cap above. That makes the maintainer
# strictly simpler: signatures never change once computed (no re-sign
# path), the pair set only ever GROWS on an append-only corpus, and a
# batch costs O(|delta| + |delta x band-collisions|):
#
#   * delta signatures: simhash_frame over the batch (one codegen
#     stage, no shuffle);
#   * candidates: the tiny delta broadcast against the persisted
#     signature table on the SAME two 16-bit band keys as the batch
#     query (band 1 requires the band-0 halves to differ — the
#     first-match-band discipline, so the incremental set is set-equal
#     to the from-scratch output with no wide distinct);
#   * verification is free: the signature IS the state, hamming =
#     bit_count(xor) on the joined row.
#
# State under ``state_dir``: an APPEND-ONLY signature log
# ``sim/batch=<k>`` (doc_id, simhash) — each batch writes only its
# delta's signatures; removed docs' rows die via the same
# ``sim_removed`` tombstones that repair the pair log (VERDICT r8 #2:
# the per-batch doc-grain snapshot rewrite is gone) — and
# an APPEND-STRUCTURED pair log: ``sim_pairs/batch=<k>`` holds ONLY the
# pairs batch k added and ``sim_removed/batch=<k>`` only the doc_ids it
# removed. The pair-grain state — the one table that grows with
# corpus x duplicate density, 28M rows at the sf1.0 stress corpus — is
# therefore never rewritten: a batch's pair-state write is O(delta),
# closing the honest-accounting gap SCALE.md recorded for round 8's
# cluster maintainer (snapshot writes dominated the delta wall time).
# Snapshot reads are by explicit batch-dir listing pinned to
# <= version (a crashed future attempt's partition can never leak in —
# the _prior_shingles discipline), with removals applied as tombstones:
# a pair dies iff an endpoint has a removal at batch >= the pair's own
# batch, which keeps remove-then-re-add (the documented two-batch
# replace protocol) correct: the re-added doc's new pairs postdate the
# tombstone. The removal set is release-grain, so the anti-join
# broadcasts it and never shuffles the pair log. Long-lived logs trade
# write amplification for read fan-in (one parquet scan per batch dir);
# compacting ranges of batch dirs into one is an offline concern the
# replay contract already permits (rewrite dirs 0..k as one, keep ids).

_SIM_SCHEMA = "doc_id long, simhash long"
_SIM_PAIRS_SCHEMA = "doc_a long, doc_b long, hamming long"
_SIM_REMOVED_SCHEMA = "doc_id long"


def bootstrap_simhash_state(spark: SparkSession, state_dir: str) -> None:
    """batch=0 state (empty corpus; an existing corpus is just a big
    first batch)."""
    _empty(spark, _SIM_SCHEMA).write.mode("overwrite").parquet(
        f"{state_dir}/sim/batch=0"
    )
    _empty(spark, _SIM_PAIRS_SCHEMA).write.mode("overwrite").parquet(
        f"{state_dir}/sim_pairs/batch=0"
    )


def _log_union(
    spark: SparkSession,
    root: str,
    schema: str,
    upto: int | None = None,
) -> DataFrame:
    """Union of an append-only log's ``batch=<k>`` partitions with
    k <= ``upto`` (all when None), read by EXPLICIT path with an
    explicit schema — a torn partition from a crashed future attempt
    is never listed, let alone schema-probed. Adds ``log_batch`` so
    readers can order additions against tombstones.

    Compaction-aware: if ``compact=<c>`` consolidated dirs exist (see
    ``compact_pair_log``), the reader takes the HIGHEST complete one
    with c <= upto as the floor — it already holds the
    tombstone-filtered union of everything through batch c, labeled
    log_batch=c — and layers only the batch dirs ABOVE the floor on
    top. A compact dir is trusted only if its ``_SUCCESS`` marker
    exists (Spark writes it last), so a crashed compaction attempt is
    invisible and compaction needs no coordination with readers:
    superseded batch dirs are pure garbage whose presence or absence
    never changes a snapshot."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(root)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    full = schema + ", log_batch long"
    if not fs.exists(jvm_path):
        return _empty(spark, full)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    batch_dirs: list[int] = []
    floor = -1
    for status in fs.listStatus(jvm_path):
        name = status.getPath().getName()
        if name.startswith("batch="):
            batch_dirs.append(int(name[6:]))
        elif name.startswith("compact="):
            c = int(name[8:])
            if (upto is None or c <= upto) and fs.exists(
                Path(f"{root}/{name}/_SUCCESS")
            ):
                floor = max(floor, c)
    frames = []
    if floor >= 0:
        frames.append(
            spark.read.schema(schema)
            .parquet(f"{root}/compact={floor}")
            .withColumn("log_batch", F.lit(floor).cast("long"))
        )
    for k in sorted(batch_dirs):
        if k <= floor or (upto is not None and k > upto):
            continue
        frames.append(
            spark.read.schema(schema)
            .parquet(f"{root}/batch={k}")
            .withColumn("log_batch", F.lit(k).cast("long"))
        )
    if not frames:
        return _empty(spark, full)
    out = frames[0]
    for frame in frames[1:]:
        out = out.unionByName(frame)
    return out


def compact_pair_log(
    spark: SparkSession,
    pairs_root: str,
    removed_root: str,
    schema: str,
    upto: int,
    gc: bool = True,
) -> None:
    """Collapse a pair log's history through batch ``upto`` into one
    consolidated ``compact=<upto>`` dir (the tombstone-filtered union —
    tombstones <= upto are fully applied, so they can be dropped: under
    the strict rule they only ever killed pairs with batch < their own,
    and every surviving pair is re-labeled to batch=upto, which no
    tombstone <= upto can reach). Crash-safe without coordination: the
    consolidated dir is trusted by readers only once its ``_SUCCESS``
    marker exists, so a torn attempt is invisible and a restart simply
    overwrites it; the superseded batch dirs (and older compact dirs)
    are garbage whose presence never changes a snapshot — ``gc=True``
    removes them after the compact dir is complete. Run between
    maintenance batches (upto <= the committed head); snapshots pinned
    to versions inside the compacted range are collapsed into it, reads
    at versions >= upto are exact and unchanged."""
    # localCheckpoint BEFORE the write: a re-compaction at the same
    # upto reads the existing compact dir as its own floor, and
    # overwrite deletes the target first — the eager checkpoint cuts
    # the write's lineage from the files it is about to replace
    snap = _tombstoned_pairs(
        spark, pairs_root, removed_root, schema, upto
    ).localCheckpoint()
    snap.write.mode("overwrite").parquet(f"{pairs_root}/compact={upto}")
    snap.unpersist()
    if gc:
        _gc_log_dirs(spark, (pairs_root, removed_root), upto)


def _gc_log_dirs(
    spark: SparkSession, roots: tuple[str, ...], upto: int
) -> None:
    """Delete batch dirs <= upto and compact dirs < upto — garbage
    superseded by a completed ``compact=<upto>`` consolidation (shared
    by every append-log compactor: pairs, coverage, grams)."""
    Path = spark._jvm.org.apache.hadoop.fs.Path
    for root in roots:
        jvm_path = Path(root)
        fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jvm_path):
            continue
        for status in fs.listStatus(jvm_path):
            name = status.getPath().getName()
            dead = (
                name.startswith("batch=") and int(name[6:]) <= upto
            ) or (
                name.startswith("compact=") and int(name[8:]) < upto
            )
            if dead:
                fs.delete(status.getPath(), True)


def _log_dir_bytes(spark: SparkSession, root: str) -> tuple[int, int]:
    """(uncompacted_batch_bytes, compact_floor_bytes) of one log root —
    driver-side metadata listing only (one FS listStatus + a content
    summary per first-level dir), never a data read."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(root)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        return 0, 0
    logs = floor = 0
    for status in fs.listStatus(jvm_path):
        name = status.getPath().getName()
        size = fs.getContentSummary(status.getPath()).getLength()
        if name.startswith("batch="):
            logs += size
        elif name.startswith("compact="):
            floor += size
    return logs, floor


def log_floor_ratio(
    spark: SparkSession, state_dir: str, tables: tuple[str, ...]
) -> float:
    """Un-compacted log bytes over compact-floor bytes, summed across
    the named log tables under ``state_dir`` — the self-managing
    compaction trigger (VERDICT r10 #3). 0.0 when nothing is
    un-compacted; inf when batch dirs exist with no floor yet (the
    first compaction establishes the floor)."""
    logs = floor = 0
    for t in tables:
        l, f = _log_dir_bytes(spark, f"{state_dir}/{t}")
        logs += l
        floor += f
    if logs == 0:
        return 0.0
    if floor == 0:
        return float("inf")
    return logs / floor


def compaction_due(
    spark: SparkSession,
    state_dir: str,
    tables: tuple[str, ...],
    threshold: float = 1.0,
) -> bool:
    """True when the maintainer should fold its logs: the un-compacted
    history has grown past ``threshold`` × the compact floor. At the
    default 1.0 the total state stays within ~2× of a fresh snapshot
    (floor + at-most-floor of logs + the triggering batch), without
    any operator-invoked compaction."""
    return log_floor_ratio(spark, state_dir, tables) >= threshold


def expire_dedup_state(state_dir: str, keep_last: int = 2) -> list[str]:
    """Retention-based GC for a maintainer's VERSIONED state tables —
    after the round-9 log conversion that is only ``df/v=`` (the
    MinHash DF aggregate); every doc-, pair- and cluster-grain table is
    an append log reclaimed by its compactor instead, and their
    ``batch=``/``compact=`` dirs are never touched here. Keeps the
    newest ``keep_last`` versions per table and deletes the rest.
    Single-writer: call between batches. ``keep_last=2`` (head and
    head-1) always covers the standard replay window — a crashed batch
    k re-reads v=k, the previous head. Returns what was deleted."""
    import os
    import shutil

    removed: list[str] = []
    if not os.path.isdir(state_dir):
        return removed
    for name in sorted(os.listdir(state_dir)):
        tdir = os.path.join(state_dir, name)
        if not os.path.isdir(tdir):
            continue
        versions = sorted(
            int(d[2:]) for d in os.listdir(tdir) if d.startswith("v=")
        )
        for v in versions[: -max(keep_last, 1)]:
            shutil.rmtree(os.path.join(tdir, f"v={v}"), ignore_errors=True)
            removed.append(f"{name}/v={v}")
    return removed


def _root_exists(spark: SparkSession, root: str) -> bool:
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(root)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jvm_path))


def _compact_doc_log(
    spark: SparkSession,
    rows_root: str,
    removed_root: str,
    schema: str,
    upto: int,
) -> None:
    """Consolidate a doc-tombstoned row log through ``upto`` into one
    ``compact=<upto>`` dir (same crash-safe _SUCCESS-gated protocol as
    ``compact_pair_log``; applied tombstones drop — surviving rows are
    re-labeled log_batch=upto, out of reach of any tombstone <= upto
    under the strict rule). GC of the superseded dirs is the caller's
    job: the tombstone root may be SHARED with a pair log, so deletion
    must happen once, after every log reading it is consolidated."""
    snap = _doc_tombstoned_log(
        spark, rows_root, removed_root, schema, upto
    ).localCheckpoint()
    snap.write.mode("overwrite").parquet(f"{rows_root}/compact={upto}")
    snap.unpersist()


def compact_simhash_pairs(
    spark: SparkSession, state_dir: str, upto: int, gc: bool = True
) -> None:
    """Consolidate the SimHash/cluster maintainers' ENTIRE log-
    structured state through batch ``upto``: the pair log, the
    signature log (which shares the ``sim_removed`` tombstone root with
    the pairs — so both must fold before those tombstones can be
    GC'd), and, when present, the cluster row log (its remap log is
    folded INTO the compacted rows, so remap dirs <= upto become
    garbage; the floor's rows carry log_batch=upto, which the
    strictly-earlier guard already keeps any surviving stale map away
    from)."""
    compact_pair_log(
        spark,
        f"{state_dir}/sim_pairs",
        f"{state_dir}/sim_removed",
        _SIM_PAIRS_SCHEMA,
        upto,
        gc=False,
    )
    _compact_doc_log(
        spark,
        f"{state_dir}/sim",
        f"{state_dir}/sim_removed",
        _SIM_SCHEMA,
        upto,
    )
    has_clusters = _root_exists(spark, f"{state_dir}/clusters")
    if has_clusters:
        snap = cluster_snapshot(spark, state_dir, version=upto).select(
            "doc_id", "component_id"
        ).localCheckpoint()
        snap.write.mode("overwrite").parquet(
            f"{state_dir}/clusters/compact={upto}"
        )
        snap.unpersist()
    if gc:
        roots = [
            f"{state_dir}/sim_pairs",
            f"{state_dir}/sim_removed",
            f"{state_dir}/sim",
        ]
        if has_clusters:
            roots += [
                f"{state_dir}/clusters",
                f"{state_dir}/clusters_removed",
                f"{state_dir}/clusters_remap",
            ]
        _gc_log_dirs(spark, tuple(roots), upto)


def compact_dedup_pairs(
    spark: SparkSession, state_dir: str, upto: int, gc: bool = True
) -> None:
    """Consolidate the MinHash maintainer's pair log AND band-signature
    log through ``upto`` (they share the ``pairs_removed`` tombstone
    root, so both fold before its dirs are GC'd)."""
    dirs = DedupStateDirs(state_dir)
    compact_pair_log(
        spark,
        dirs.pairs,
        f"{dirs.root}/pairs_removed",
        _PAIRS_SCHEMA,
        upto,
        gc=False,
    )
    _compact_doc_log(
        spark,
        dirs.bands,
        f"{dirs.root}/pairs_removed",
        _BANDS_SCHEMA,
        upto,
    )
    if gc:
        _gc_log_dirs(
            spark,
            (dirs.pairs, f"{dirs.root}/pairs_removed", dirs.bands),
            upto,
        )


def _tombstoned_pairs(
    spark: SparkSession,
    pairs_root: str,
    removed_root: str,
    schema: str,
    version: int | None = None,
) -> DataFrame:
    """Assemble a pair snapshot from an append-only pair log minus doc
    tombstones: a pair is dead iff an endpoint has a tombstone at a
    batch STRICTLY AFTER the pair's own batch — so a batch that
    re-signs a doc (MinHash DF-cap repair) or re-adds a removed one
    (the two-batch replace protocol) keeps its own batch's pairs while
    killing every earlier one. The tombstone set is release-grain by
    construction (removed docs / DF-cap-affected docs, never the
    delta), so it broadcasts; the pair log itself is never shuffled."""
    pairs = _log_union(spark, pairs_root, schema, version)
    rem = _log_union(spark, removed_root, _SIM_REMOVED_SCHEMA, version)
    rmax = rem.groupBy("doc_id").agg(F.max("log_batch").alias("rb"))
    for side in ("doc_a", "doc_b"):
        pairs = (
            pairs.join(
                F.broadcast(rmax.withColumnRenamed("doc_id", side)),
                side,
                "left",
            )
            .filter(F.col("rb").isNull() | (F.col("rb") <= F.col("log_batch")))
            .drop("rb")
        )
    return pairs.drop("log_batch")


def _doc_tombstoned_log(
    spark: SparkSession,
    rows_root: str,
    removed_root: str,
    schema: str,
    version: int | None = None,
    keep_log_batch: bool = False,
) -> DataFrame:
    """Assemble a DOC-GRAIN snapshot from an append-only row log minus
    doc tombstones — the single-endpoint sibling of
    ``_tombstoned_pairs`` (same strict rule: a tombstone kills rows
    from strictly earlier batches, so a batch that re-signs or re-adds
    a doc keeps its own batch's row while killing every older one).
    The tombstone set is release-grain, so it broadcasts; the row log
    streams through one broadcast join, never shuffles."""
    rows = _log_union(spark, rows_root, schema, version)
    rem = _log_union(spark, removed_root, _SIM_REMOVED_SCHEMA, version)
    rmax = rem.groupBy("doc_id").agg(F.max("log_batch").alias("rb"))
    out = (
        rows.join(F.broadcast(rmax), "doc_id", "left")
        .filter(F.col("rb").isNull() | (F.col("rb") <= F.col("log_batch")))
        .drop("rb")
    )
    return out if keep_log_batch else out.drop("log_batch")


def bands_snapshot(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """The MinHash band-signature table (doc_id, b0, b1) at ``version``,
    assembled from the append-only ``bands`` log minus the DF-cap
    re-sign tombstones (shared with the pair log)."""
    dirs = DedupStateDirs(state_dir)
    return _doc_tombstoned_log(
        spark,
        dirs.bands,
        f"{dirs.root}/pairs_removed",
        _BANDS_SCHEMA,
        version,
    )


def sim_snapshot(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """The SimHash signature table (doc_id, simhash) at ``version``,
    assembled from the append-only ``sim`` log minus removal
    tombstones (shared with the pair log: a removed doc's signature
    and its pairs die through the same ``sim_removed`` entry)."""
    return _doc_tombstoned_log(
        spark,
        f"{state_dir}/sim",
        f"{state_dir}/sim_removed",
        _SIM_SCHEMA,
        version,
    )


def _sim_band_keys(side: str, banding: str) -> list:
    """Band-key columns for one aliased side. '2x16' = dedup_simhash's
    two 16-bit halves; '4x8' = dedup_simhash_wide's four 8-bit bands
    (the production setting — pigeonhole recall 1.0 up to Hamming 3)."""
    col = F.col(f"{side}.simhash")
    if banding == "2x16":
        return [F.shiftrightunsigned(col, 16), col % 65536]
    if banding == "4x8":
        return [F.shiftrightunsigned(col, 8 * i) % 256 for i in range(4)]
    raise ValueError(f"unknown banding {banding!r}")


def _fresh_sim_pairs(
    delta: DataFrame, corpus_sim: DataFrame, banding: str
) -> DataFrame:
    """The delta's new pairs: band-join the (broadcast) delta signatures
    against the corpus signature table. Candidates touch at least one
    delta doc (r = delta side), so they are disjoint from the persisted
    pair state by construction; within-delta pairs surface from both
    directions -> normalize + distinct over the delta-proportional
    candidate set only. Band i's join requires all earlier bands to
    differ (first-match-band, same discipline as the batch queries), so
    the union below has no cross-band duplicates. Plan shape (guarded in
    tests/test_plans.py): the persisted side is scanned and broadcast-
    joined against the delta — never shuffled."""
    from codex_data_products_spark.queries.dedup import SIMHASH_MAX_HAMMING

    r, s = delta.alias("r"), corpus_sim.alias("s")
    rk, sk = _sim_band_keys("r", banding), _sim_band_keys("s", banding)
    ne = F.col("r.doc_id") != F.col("s.doc_id")
    ham = F.bit_count(
        F.col("r.simhash").bitwiseXOR(F.col("s.simhash"))
    ).cast("long")
    sel = [
        F.least(F.col("r.doc_id"), F.col("s.doc_id")).alias("doc_a"),
        F.greatest(F.col("r.doc_id"), F.col("s.doc_id")).alias("doc_b"),
        ham.alias("hamming"),
    ]
    fresh = None
    for i in range(len(rk)):
        cond = (rk[i] == sk[i]) & ne
        for j in range(i):
            cond = cond & (rk[j] != sk[j])
        piece = s.join(F.broadcast(r), cond).select(*sel)
        fresh = piece if fresh is None else fresh.unionByName(piece)
    return fresh.filter(F.col("hamming") <= SIMHASH_MAX_HAMMING).distinct()


def apply_simhash_batch(
    batch_docs: DataFrame,
    state_dir: str,
    batch_id: int,
    banding: str = "2x16",
) -> None:
    """Fold one batch of NEW documents into the maintained SimHash pair
    view: read the signature snapshot at version=batch_id, APPEND the
    delta's signatures as ``sim/batch=<batch_id+1>`` and the batch's
    fresh pairs as ``sim_pairs/batch=<batch_id+1>`` — both doc-grain
    AND pair-grain state are logs, so every write is O(delta), never
    O(corpus). ``banding`` selects the batch query being maintained:
    '2x16' (dedup_simhash) or '4x8' (dedup_simhash_wide, the
    production width)."""
    from codex_data_products_spark.queries.dedup import simhash_frame

    spark = batch_docs.sparkSession
    sim_state = sim_snapshot(spark, state_dir, version=batch_id)

    delta = simhash_frame(batch_docs).persist()
    new_sim = sim_state.unionByName(delta)
    fresh = _fresh_sim_pairs(delta, new_sim, banding)

    v = batch_id + 1
    delta.write.mode("overwrite").parquet(f"{state_dir}/sim/batch={v}")
    fresh.write.mode("overwrite").parquet(
        f"{state_dir}/sim_pairs/batch={v}"
    )
    delta.unpersist()


def run_simhash_maintenance(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    banding: str = "2x16",
    auto_compact_ratio: float | None = 1.0,
) -> None:
    """availableNow foreachBatch drain onto the maintained SimHash pair
    view — same replay contract as run_dedup_maintenance: batch k reads
    v=k, overwrites v=k+1, so a crash between state write and
    checkpoint commit re-derives identical snapshots. Compaction is
    ratio-triggered per batch (``compaction_due``; None disables)."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        apply_simhash_batch(batch, state_dir, batch_id, banding=banding)
        if auto_compact_ratio is not None and compaction_due(
            batch.sparkSession,
            state_dir,
            ("sim", "sim_pairs"),
            auto_compact_ratio,
        ):
            compact_simhash_pairs(
                batch.sparkSession, state_dir, upto=batch_id + 1
            )

    (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def simhash_pairs_snapshot(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """The maintained view: (doc_a, doc_b, hamming) — equal to
    ``dedup_simhash`` recomputed from scratch over every LIVE document
    ingested up to ``version`` (modulo the batch query's asymmetric
    doc_a < doc_b orientation, which the maintainer preserves via
    least/greatest normalization). Assembled from the append-only pair
    log minus removal tombstones (``_tombstoned_pairs``; removals
    precede additions inside a batch, so the strict tombstone rule is
    exact here too)."""
    return _tombstoned_pairs(
        spark,
        f"{state_dir}/sim_pairs",
        f"{state_dir}/sim_removed",
        _SIM_PAIRS_SCHEMA,
        version,
    )


# ---------------------------------------------------------------------------
# Incremental CLUSTER-grain dedup (VERDICT r7 #4): the production
# terminals — connected components / keep-best — maintained per batch
# instead of recomputed from scratch. The eleventh IVM class.
#
# Why this decomposes: component labels are the min doc_id of each
# component, so
#   * ADDITIONS are monotone — a new pair can only MERGE components
#     (never split one), and a merge is a label-grain contraction: run
#     connected components on the tiny graph whose nodes are the
#     CURRENT labels touched by the delta's fresh pairs, then relabel.
#     The corpus-scale cluster table is scanned once and broadcast-
#     joined against the delta-grain merge map — untouched components'
#     rows stream through without a shuffle (plan-guarded).
#   * REMOVALS can split — but only the components that contained a
#     removed doc. Those (and only those) are recomputed from the
#     pruned pair set restricted to their members; every other
#     component's rows pass through untouched. Bounded by the affected
#     components' sizes, never the corpus.
# ---------------------------------------------------------------------------

_CLUSTER_SCHEMA = "doc_id long, component_id long"
_REMAP_SCHEMA = "component_id long, new_component_id long"

# label-edge count above which the merge contraction escalates from
# the driver-side union-find (first over the raw label edges; past the
# cap, retried over the star-contracted graph) to the distributed
# min-label loop. Bounds driver memory explicitly: 2M edges is ~32MB
# of longs plus dict overhead — trivial for any driver — while a merge
# wave past even the CONTRACTED cap is corpus-scale work that belongs
# on the executors.
CLUSTER_MERGE_DRIVER_CAP = 2_000_000


def bootstrap_cluster_state(spark: SparkSession, state_dir: str) -> None:
    """v=0 snapshots for the cluster maintainer: the SimHash signature +
    pair state (shared with apply_simhash_batch) plus the cluster
    table — one row per ingested doc, component_id = min doc_id of its
    component (singletons carry their own id, matching the batch
    ``dedup_connected_components`` view)."""
    bootstrap_simhash_state(spark, state_dir)
    _empty(spark, _CLUSTER_SCHEMA).write.mode("overwrite").parquet(
        f"{state_dir}/clusters/batch=0"
    )


def _cc_labels(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Distributed min-label propagation to fixpoint — the shared
    bulk-synchronous loop (operators/graphs.min_label_components:
    edges shuffled once, frontier propagation, scan-based convergence
    test), over an arbitrary seed: ``nodes`` (col ``node``), ``edges``
    (cols ``a``, ``b``, both directions supplied by the caller).
    Returns (node, label) with label = min node of the component."""
    from codex_data_products_spark.operators.graphs import (
        min_label_components,
    )

    return min_label_components(nodes.select("node"), edges)


def merge_map_for_fresh_pairs(
    clusters: DataFrame, fresh: DataFrame
) -> DataFrame:
    """The label-grain contraction for a batch's fresh pairs:
    (component_id, new_component_id) for every existing label that a
    merge relabels. Delta-proportional end to end — endpoint labels are
    looked up by broadcasting the (small) endpoint set against the
    cluster table (scan, no shuffle of the corpus side), and the CC
    runs on the contracted label graph, whose size is bounded by
    2 x |fresh pairs|, not by any component's member count."""
    ends = (
        fresh.select(F.col("doc_a").alias("doc_id"))
        .unionByName(fresh.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .persist()
    )
    known = clusters.join(F.broadcast(ends), "doc_id", "left_semi")
    id_lbl = ends.join(known, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", F.col("doc_id")).alias("lbl"),
    )
    # the endpoint-label map is derived (no stats), so without the
    # explicit hint both lookups sort-merge the fresh-pair frame — two
    # full sorts of the delta's pair set; broadcast keeps the pairs
    # streaming with zero shuffles, and the map is endpoint-grain by
    # construction (same bound the ends broadcast above already relies
    # on)
    la = F.broadcast(
        id_lbl.select(F.col("doc_id").alias("doc_a"), F.col("lbl").alias("la"))
    )
    lb = F.broadcast(
        id_lbl.select(F.col("doc_id").alias("doc_b"), F.col("lbl").alias("lb"))
    )
    label_edges = (
        fresh.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.col("la") != F.col("lb"))
        .select("la", "lb")
        .distinct()
    )
    label_edges = label_edges.persist()
    n_edges = label_edges.count()
    ends.unpersist()
    spark = clusters.sparkSession

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    def union_all(edge_iter) -> DataFrame:
        for na, nb in edge_iter:
            ra, rb = find(na), find(nb)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # min label is always the root
        mapping = [(x, find(x)) for x in list(parent) if find(x) != x]
        if not mapping:
            return _empty(
                spark, "component_id long, new_component_id long"
            )
        # Arrow-backed local relation — one JVM batch, no Python-RDD
        # partitions (see _empty)
        import pandas as pd

        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "component_id": pd.array(
                        [m[0] for m in mapping], dtype="int64"
                    ),
                    "new_component_id": pd.array(
                        [m[1] for m in mapping], dtype="int64"
                    ),
                }
            ),
            schema="component_id long, new_component_id long",
        )

    if n_edges <= CLUSTER_MERGE_DRIVER_CAP:
        # the common case: a release-grain delta touches a bounded set
        # of labels — a driver-side union-find over the CONTRACTED
        # label graph (never the member docs) beats 2 Spark jobs per
        # propagation round by orders of magnitude in fixed cost. The
        # collect is delta-grain by construction, capped explicitly.
        rows = label_edges.collect()
        label_edges.unpersist()
        return union_all((r["la"], r["lb"]) for r in rows)

    # Past the cap, star-contract once before giving up on the driver:
    # a batch whose new docs form a near-dup group among THEMSELVES is
    # a clique of singleton labels — edge-quadratic in the group size
    # (a 250-doc group alone is 31k label edges). One min-neighbor pass
    # (m(x) = min over x's label neighborhood) collapses every clique
    # to a star; the star map is label-NODE-grain and the cross-star
    # edge set drops by the clique density, which usually brings the
    # graph back under the cap. Connectivity is preserved (each star is
    # a connected subset contracted to its min). Only when even the
    # contracted graph exceeds the cap — a genuinely huge merge wave —
    # does the bulk-synchronous distributed loop take over.
    und = label_edges.select(
        F.col("la").alias("a"), F.col("lb").alias("b")
    ).unionByName(
        label_edges.select(F.col("lb").alias("a"), F.col("la").alias("b"))
    )
    star = (
        und.groupBy("a")
        .agg(F.min("b").alias("mb"))
        .select(F.col("a").alias("node"), F.least("a", "mb").alias("parent"))
        .persist()
    )
    contracted = (
        label_edges.join(
            F.broadcast(
                star.select(
                    F.col("node").alias("la"), F.col("parent").alias("pa")
                )
            ),
            "la",
        )
        .join(
            F.broadcast(
                star.select(
                    F.col("node").alias("lb"), F.col("parent").alias("pb")
                )
            ),
            "lb",
        )
        .filter(F.col("pa") != F.col("pb"))
        .select("pa", "pb")
        .distinct()
        .persist()
    )
    n_driver = star.count() + contracted.count()
    if n_driver <= CLUSTER_MERGE_DRIVER_CAP:
        star_rows = star.filter(F.col("node") != F.col("parent")).collect()
        contracted_rows = contracted.collect()
        label_edges.unpersist()
        star.unpersist()
        contracted.unpersist()
        return union_all(
            [(r["node"], r["parent"]) for r in star_rows]
            + [(r["pa"], r["pb"]) for r in contracted_rows]
        )
    star.unpersist()
    contracted.unpersist()
    lab_nodes = (
        label_edges.select(F.col("la").alias("node"))
        .unionByName(label_edges.select(F.col("lb").alias("node")))
        .distinct()
    )
    both = label_edges.select(
        F.col("la").alias("a"), F.col("lb").alias("b")
    ).unionByName(
        label_edges.select(F.col("lb").alias("a"), F.col("la").alias("b"))
    )
    cc = _cc_labels(lab_nodes, both)
    label_edges.unpersist()
    return cc.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("component_id"),
        F.col("label").alias("new_component_id"),
    )


def apply_cluster_batch(
    batch_docs: DataFrame,
    state_dir: str,
    batch_id: int,
    *,
    remove: list[int] | tuple[int, ...] | DataFrame = (),
    banding: str = "2x16",
) -> None:
    """Fold one batch (NEW documents and/or removed doc_ids — an id
    list or a one-column DataFrame; the DataFrame form keeps bulk
    retractions fully distributed) into the maintained signature +
    pair + CLUSTER state: read v=batch_id, write v=batch_id+1
    (standard replay anchoring — a crashed batch re-runs to identical
    snapshots).

    Order inside a batch: removals first (prune signatures and pairs,
    recompute ONLY the components that contained a removed doc from the
    pruned member-local pair set), then additions (delta signatures,
    fresh pairs, label-grain merge). A fresh pair attaching to a
    just-split component therefore merges against the post-split
    labels. A doc in both this batch's adds and removes is an atomic
    replace per the shared contract (``COMBINED_BATCH_CONTRACT``): the
    pruned state predates the delta, and the batch's tombstones kill
    only strictly-earlier rows. The affected-label set
    never leaves the executors — every removal-side prune is a
    broadcast semi/anti join against release-grain frames.

    EVERY state write is O(delta) (VERDICT r8 #2): signatures append to
    the ``sim`` log (removals die via ``sim_removed`` tombstones), and
    the cluster table is an append log too — this batch writes only its
    new/recomputed rows (``clusters/batch=``), doc tombstones for the
    split-affected components (``clusters_removed/batch=``), and the
    label-grain merge map (``clusters_remap/batch=``). Merged old
    components' member rows are NEVER rewritten: ``cluster_snapshot``
    folds the remap log into the row log at read time (one broadcast
    join per un-compacted remap batch — bounded by the compaction
    cadence)."""
    from codex_data_products_spark.queries.dedup import simhash_frame

    spark = batch_docs.sparkSession
    sim_state = sim_snapshot(spark, state_dir, version=batch_id)
    pairs_state = simhash_pairs_snapshot(spark, state_dir, batch_id)
    clusters = cluster_snapshot(spark, state_dir, batch_id)
    rem_df, has_removes = _remove_frame(spark, remove)

    recomputed = None
    tomb = _empty(spark, _SIM_REMOVED_SCHEMA)
    if has_removes:
        # the affected-component label set stays a DataFrame (one
        # materialization feeding three broadcast joins) — no doc- or
        # label-grain driver collect even for 10^5-id retractions
        dead = (
            clusters.join(F.broadcast(rem_df), "doc_id", "left_semi")
            .select("component_id")
            .distinct()
            .localCheckpoint()
        )
        sim_state = sim_state.join(
            F.broadcast(rem_df), "doc_id", "left_anti"
        )
        pairs_state = pairs_state.join(
            F.broadcast(rem_df.select(F.col("doc_id").alias("doc_a"))),
            "doc_a",
            "left_anti",
        ).join(
            F.broadcast(rem_df.select(F.col("doc_id").alias("doc_b"))),
            "doc_b",
            "left_anti",
        )
        # tombstone EVERY doc of an affected component: the removed docs
        # die outright, the surviving members are re-emitted (with their
        # post-split labels) in this batch's own add log — the strict
        # tombstone rule keeps the same-batch re-emit
        tomb = clusters.join(
            F.broadcast(dead), "component_id", "left_semi"
        ).select("doc_id")
        # recompute the affected components from their members' pruned
        # pairs (pairs never cross components, so the doc_a semi-join
        # captures exactly the member-local subgraph)
        members = clusters.join(
            F.broadcast(dead), "component_id", "left_semi"
        ).join(F.broadcast(rem_df), "doc_id", "left_anti")
        sub = pairs_state.join(
            F.broadcast(members.select(F.col("doc_id").alias("doc_a"))),
            "doc_a",
            "left_semi",
        )
        both = sub.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        ).unionByName(
            sub.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        recomputed = _cc_labels(
            members.select(F.col("doc_id").alias("node")), both
        ).select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("component_id"),
        ).persist()
        clusters = clusters.join(
            F.broadcast(dead), "component_id", "left_anti"
        ).unionByName(recomputed)

    # additions: delta signatures + fresh pairs (broadcast against the
    # persisted state — same no-shuffle candidate plan as
    # apply_simhash_batch), then the label-grain merge
    delta = simhash_frame(batch_docs).persist()
    new_sim = sim_state.unionByName(delta)
    fresh = _fresh_sim_pairs(delta, new_sim, banding).persist()

    merge_map = merge_map_for_fresh_pairs(clusters, fresh).persist()
    delta_rows = (
        delta.select("doc_id")
        .join(
            F.broadcast(
                merge_map.select(
                    F.col("component_id").alias("doc_id"),
                    "new_component_id",
                )
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("new_component_id", F.col("doc_id")).alias(
                "component_id"
            ),
        )
    )
    adds = delta_rows
    if recomputed is not None:
        # re-emitted post-split rows are written post-MERGE too, so the
        # batch's own remap entry (which applies only to STRICTLY
        # earlier rows) never needs to touch them
        adds = recomputed.join(
            F.broadcast(merge_map), "component_id", "left"
        ).select(
            "doc_id",
            F.coalesce("new_component_id", F.col("component_id")).alias(
                "component_id"
            ),
        ).unionByName(delta_rows)

    v = batch_id + 1
    # every write below is delta-/release-grain: the corpus-scale sim,
    # pair and cluster tables are logs that only ever gain a batch dir
    delta.write.mode("overwrite").parquet(f"{state_dir}/sim/batch={v}")
    fresh.write.mode("overwrite").parquet(
        f"{state_dir}/sim_pairs/batch={v}"
    )
    _write_tombstones(
        spark, rem_df, has_removes, f"{state_dir}/sim_removed/batch={v}"
    )
    adds.write.mode("overwrite").parquet(f"{state_dir}/clusters/batch={v}")
    tomb.write.mode("overwrite").parquet(
        f"{state_dir}/clusters_removed/batch={v}"
    )
    merge_map.write.mode("overwrite").parquet(
        f"{state_dir}/clusters_remap/batch={v}"
    )
    delta.unpersist()
    fresh.unpersist()
    merge_map.unpersist()
    rem_df.unpersist()  # localCheckpoint blocks (DataFrame removes)
    if recomputed is not None:
        recomputed.unpersist()
        dead.unpersist()


def run_cluster_maintenance(
    docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    banding: str = "2x16",
    compact_every: int | None = None,
    auto_compact_ratio: float | None = 1.0,
) -> None:
    """availableNow foreachBatch drain of an insert stream onto the
    maintained cluster view (same replay contract as the other
    maintainers). Removals are release-grain control operations —
    apply them directly via ``apply_cluster_batch(remove=...)``.

    ``compact_every=N`` folds the between-batch maintenance pass into
    the drain itself: after every Nth batch commits its state, the
    pair log is compacted through it and superseded state versions are
    expired (keep_last=2 — the replay window). Both steps are
    idempotent overwrites/deletes, so a foreachBatch replay that
    re-runs them converges to the same layout.

    ``auto_compact_ratio`` (VERDICT r10 #3, default 1.0) makes the
    cadence self-managing when ``compact_every`` is not given: after
    each batch the drain measures the un-compacted log bytes against
    the compact floor (``compaction_due``) and folds when the ratio
    crosses the threshold — total state stays within ~2× of a fresh
    snapshot with no operator-invoked compaction. ``None`` disables."""

    def fold(batch: DataFrame, batch_id: int) -> None:
        apply_cluster_batch(batch, state_dir, batch_id, banding=banding)
        due = (
            compact_every and (batch_id + 1) % compact_every == 0
        ) or (
            not compact_every
            and auto_compact_ratio is not None
            and compaction_due(
                batch.sparkSession,
                state_dir,
                ("sim", "sim_pairs", "clusters"),
                auto_compact_ratio,
            )
        )
        if due:
            compact_simhash_pairs(
                batch.sparkSession, state_dir, upto=batch_id + 1
            )
            expire_dedup_state(state_dir, keep_last=2)

    (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def _remap_batch_ids(
    spark: SparkSession, root: str, version: int | None
) -> list[int]:
    """Sorted batch ids of the remap log's ``batch=<k>`` dirs with
    k <= version (all when None)."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(root)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        return []
    out = []
    for status in fs.listStatus(jvm_path):
        name = status.getPath().getName()
        if name.startswith("batch="):
            k = int(name[6:])
            if version is None or k <= version:
                out.append(k)
    return sorted(out)


def cluster_snapshot(
    spark: SparkSession, state_dir: str, version: int | None = None
) -> DataFrame:
    """The maintained view: (doc_id, component_id) for every live doc —
    equal to ``dedup_connected_components`` recomputed from scratch
    over the surviving corpus (singletons carry their own id).

    Assembled from the append-only row log minus split/removal doc
    tombstones, then the remap log folded on top: batch k's label-grain
    merge map relabels rows written STRICTLY BEFORE batch k (rows
    emitted at k — the batch's delta and post-split re-emits — are
    already post-merge), applied sequentially in batch order so chained
    merges compose. Each application is one broadcast join the row log
    streams through; the number of applications is the un-compacted
    remap count, bounded by the compaction cadence. A label freed by a
    merge can later be reborn by a split — the strictly-earlier guard
    is what keeps a stale map from re-capturing it."""
    live = _doc_tombstoned_log(
        spark,
        f"{state_dir}/clusters",
        f"{state_dir}/clusters_removed",
        _CLUSTER_SCHEMA,
        version,
        keep_log_batch=True,
    )
    remap_root = f"{state_dir}/clusters_remap"
    for k in _remap_batch_ids(spark, remap_root, version):
        m = (
            spark.read.schema(_REMAP_SCHEMA)
            .parquet(f"{remap_root}/batch={k}")
            .withColumnRenamed("component_id", "_from")
            .withColumnRenamed("new_component_id", "_to")
        )
        live = live.join(
            F.broadcast(m), live["component_id"] == m["_from"], "left"
        ).select(
            "doc_id",
            F.when(
                (F.col("log_batch") < k) & F.col("_to").isNotNull(),
                F.col("_to"),
            )
            .otherwise(F.col("component_id"))
            .alias("component_id"),
            "log_batch",
        )
    return live.drop("log_batch")
