"""Composed training-data curation pipeline over a document corpus.

The LLM-data-pipeline counterpart of the CODEX plan: one lazy DAG that
takes a raw ``documents``-shaped corpus through the standard curation
stages and writes a partitioned parquet product plus a JSON manifest.

Stages (each reuses the oracle-checked operator cores):

  1. exact dedup        — md5 groupBy, keep min doc_id (one shuffle);
  2. near-dup dedup     — simhash banding (row-local signatures, first-
                          match-band candidates); drops the higher
                          doc_id of every <= max_hamming pair;
  2b. substring gate     — optional ExactSubstr-style trim-or-drop:
                          docs whose duplicated-span coverage
                          (queries/dedup.dedup_substring semantics)
                          exceeds max_dup_span_frac are dropped, or —
                          with trim_dup_spans — keep the doc and CUT
                          the spans (Lee et al. 2022), one row-local
                          higher-order filter reusing the gate's gram
                          aggregate;
  3. quality filter     — stopword ratio / type-token ratio / length
                          bounds, pure column expressions;
  4. language ID        — marker-list argmax heuristic, keeps a
                          configurable language set;
  5. token accounting   — per-doc token/char counts carried to the sink
                          for downstream mixture weighting.

Scale design: stages 3-5 are row-local (no shuffle); stage 1 shuffles
once on the hash; stage 2's joins shuffle on band values. The surviving
corpus is written partitioned by (lang, length_bucket) so mixture
sampling prunes partitions at read time. Nothing collects to the
driver except the manifest counts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codex_data_products_spark.queries.dedup import simhash_frame

_STOPWORDS = ["the", "a", "of", "and", "to"]
_LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "das"],
}


@dataclass
class CurationConfig:
    min_tokens: int = 10
    max_tokens: int = 100_000
    max_stopword_ratio: float = 0.6
    min_type_token_ratio: float = 0.2
    keep_langs: tuple[str, ...] = ("en",)
    # Gopher-style repetition gate: fraction of the doc covered by its
    # most frequent bigram (row-local, see queries/text.text_repetition)
    max_top_bigram_frac: float = 0.5
    # 4 bands over the 32-bit simhash guarantee (pigeonhole) a candidate
    # for every pair within hamming 3
    max_hamming: int = 3
    # Drop docs whose duplicated-span token coverage (8-token windows
    # occurring >= 2 times corpus-wide) exceeds this fraction; None
    # disables the stage (the gate needs a corpus-wide gram aggregate,
    # so it is pay-for-what-you-use)
    max_dup_span_frac: float | None = None
    # Trim instead of drop (Lee et al. 2022's production ExactSubstr
    # operator removes the repeated span, not the document): gated docs
    # have their duplicated spans CUT from the text — one row-local
    # higher-order filter over token positions, reusing the gate's own
    # gram aggregate — and continue through the quality stages. Only
    # meaningful with max_dup_span_frac set.
    trim_dup_spans: bool = False


def _toks():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


def _top_bigram_frac(toks, bgs) -> F.Column:
    """Fraction of bigram slots taken by the most frequent bigram —
    row-local array math (no explode), same shape as
    queries/text.text_repetition. ``toks``/``bgs`` must be MATERIALIZED
    columns (not expressions): the occurrence count references ``bgs``
    inside a per-element lambda, where loop-invariant subexpressions
    are re-evaluated per element."""
    top = F.array_max(
        F.transform(
            F.array_distinct(bgs),
            lambda x: F.size(F.filter(bgs, lambda y: y == x)),
        )
    )
    return F.when(
        F.size(toks) > 1,
        F.round(top.cast("double") / (F.size(toks) - 1), 6),
    ).otherwise(F.lit(0.0))


def exact_dedup_keepers(docs: DataFrame) -> DataFrame:
    """Stage 1: one survivor per exact text hash."""
    keep = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi")


N_BANDS = 4  # 8-bit bands over the 32-bit simhash


def neardup_losers(docs: DataFrame, max_hamming: int) -> DataFrame:
    """Stage 2: the higher doc_id of every near-dup pair (to drop).

    4 bands of 8 bits: the pigeonhole principle guarantees any pair
    within hamming ``N_BANDS - 1`` collides in at least one band (at
    production scale you would widen to a 64-bit simhash with 16-bit
    bands for the same guarantee and far fewer accidental collisions).
    First-match-band emission keeps every pair single-counted without a
    distinct over pair rows; a doc dropped by several pairs dedups on a
    single id column — cheap.
    """
    sim = simhash_frame(docs)

    def band(side: str, k: int):
        return F.shiftright(F.col(f"{side}.simhash"), 8 * k) % 256

    a, b = sim.alias("a"), sim.alias("b")
    lt = F.col("a.doc_id") < F.col("b.doc_id")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    losers = []
    for k in range(N_BANDS):
        cond = band("a", k) == band("b", k)
        for prev in range(k):
            cond = cond & (band("a", prev) != band("b", prev))
        losers.append(
            a.join(b, cond & lt)
            .filter(hamming <= max_hamming)
            .select(F.col("b.doc_id").alias("doc_id"))
        )
    out = losers[0]
    for frame in losers[1:]:
        out = out.unionByName(frame)
    return out.distinct()


def _substring_gate(surviving: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 2b: the ExactSubstr coverage gate — and, with
    ``trim_dup_spans``, the trim terminal (queries/dedup.
    dedup_substring_trim's row-local cut-list filter) instead of the
    drop.

    ONE positional-gram aggregate feeds both the gate and the trim: the
    gram table is persisted, the duplicated-gram set (the aggregate's
    survivors) is persisted, and both the per-doc coverage and the
    span/cut-list derivations re-scan those caches — never the corpus.
    The gate's verdict (heavy doc_ids, or their cut lists) is
    eagerly materialized via localCheckpoint so the caches can be
    RELEASED here instead of lingering in executor storage for the
    application lifetime (a reusable pipeline must not leak its
    intermediates)."""
    from codex_data_products_spark.queries.dedup import (
        SUBSTR_K,
        _coverage_per_doc,
        _tokens,
        positional_grams,
    )

    pos = positional_grams(surviving).persist()
    dup = (
        pos.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("g")
        .persist()
    )
    try:
        cov = pos.join(dup, "g", "left_semi")
        heavy = (
            _coverage_per_doc(cov)
            .filter(F.col("dup_fraction") > cfg.max_dup_span_frac)
            .select("doc_id")
        )
        if not cfg.trim_dup_spans:
            return surviving.join(
                heavy.localCheckpoint(), "doc_id", "left_anti"
            )

        # cut lists for the gated docs only — same island/span collapse
        # as dedup_substring_trim, restricted by the heavy semi-join
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy("pos")
        brk = F.when(
            F.coalesce(
                F.col("pos") - F.lag("pos", 1, None).over(w),
                F.lit(SUBSTR_K + 1),
            )
            > SUBSTR_K,
            F.lit(1),
        ).otherwise(F.lit(0))
        cuts = (
            cov.join(F.broadcast(heavy), "doc_id", "left_semi")
            .select("doc_id", "pos", brk.alias("brk"))
            .select("doc_id", "pos", F.sum("brk").over(w).alias("island"))
            .groupBy("doc_id", "island")
            .agg(
                F.min("pos").alias("s"),
                (F.max("pos") + (SUBSTR_K - 1)).alias("e"),
            )
            .groupBy("doc_id")
            .agg(F.collect_list(F.struct("s", "e")).alias("cuts"))
            .localCheckpoint()
        )
        toks = _tokens()
        in_cut = lambda i: F.exists(  # noqa: E731
            F.col("cuts"), lambda c: (i >= c["s"]) & (i <= c["e"])
        )
        kept = F.filter(
            F.transform(F.sequence(F.lit(1), F.size(toks)), lambda i: i),
            lambda i: ~in_cut(i),
        )
        trimmed_text = F.concat_ws(
            " ",
            F.transform(kept, lambda i: F.element_at(toks, i.cast("int"))),
        )
        return (
            surviving.join(F.broadcast(cuts), "doc_id", "left")
            .withColumn(
                "text",
                F.when(F.col("cuts").isNull(), F.col("text")).otherwise(
                    trimmed_text
                ),
            )
            .drop("cuts")
        )
    finally:
        pos.unpersist()
        dup.unpersist()


def curate(docs: DataFrame, cfg: CurationConfig | None = None) -> DataFrame:
    """The full curation DAG → surviving docs with curation columns."""
    cfg = cfg or CurationConfig()

    surviving = exact_dedup_keepers(docs)
    surviving = surviving.join(
        neardup_losers(surviving, cfg.max_hamming), "doc_id", "left_anti"
    )

    if cfg.max_dup_span_frac is not None:
        surviving = _substring_gate(surviving, cfg)

    # Materialize token/bigram arrays behind an exchange so the
    # per-element lambdas below read plain columns instead of
    # re-running the regex split per element (CollapseProject would
    # otherwise inline the expressions straight back into the lambdas).
    from codex_data_products_spark.tables import spread

    toks0 = _toks()
    bgs0 = F.zip_with(
        F.slice(toks0, 1, F.size(toks0) - 1),
        F.slice(toks0, 2, F.size(toks0) - 1),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    surviving = spread(
        surviving.select("*", toks0.alias("_toks"), bgs0.alias("_bgs")),
        "doc_id",
    )
    toks = F.col("_toks")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n = F.size(toks)
    scored = surviving.select(
        "*",
        n.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.round(
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
            .cast("double")
            / n,
            6,
        ).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6).alias(
            "type_token_ratio"
        ),
        _top_bigram_frac(toks, F.col("_bgs")).alias("top_bigram_frac"),
    )

    def lang_score(lang: str):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    s_en, s_es, s_de = (lang_score(lg) for lg in ("en", "es", "de"))
    scored = scored.withColumn(
        "lang_predicted",
        F.when((s_en >= s_es) & (s_en >= s_de), "en")
        .when(s_es >= s_de, "es")
        .otherwise("de"),
    ).withColumn(
        "length_bucket",
        F.when(F.col("n_tokens") < 30, "short")
        .when(F.col("n_tokens") < 80, "medium")
        .otherwise("long"),
    )

    return scored.filter(
        (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("n_tokens") <= cfg.max_tokens)
        & (F.col("stopword_ratio") <= cfg.max_stopword_ratio)
        & (F.col("type_token_ratio") >= cfg.min_type_token_ratio)
        & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac)
        & F.col("lang_predicted").isin(*cfg.keep_langs)
    ).drop("_toks", "_bgs")


def write_curated(
    docs: DataFrame, out_dir: str, cfg: CurationConfig | None = None
) -> dict:
    """Run curation, write the product, return the manifest.

    Layout: parquet partitioned by (lang_predicted, length_bucket) for
    partition-pruned mixture sampling; manifest with per-stage counts.
    """
    from pyspark.sql import Observation

    cfg = cfg or CurationConfig()
    # Observation metrics ride the write job itself: kept-doc and token
    # totals come from the SAME pass that writes the corpus, instead of
    # re-running the dedup joins twice more for count() + agg(). At
    # 100 TB that is one full pipeline execution, not three.
    obs = Observation("curation")
    curated = curate(docs, cfg).observe(
        obs,
        F.count(F.lit(1)).alias("kept_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
    )
    curated.write.mode("overwrite").partitionBy(
        "lang_predicted", "length_bucket"
    ).parquet(f"{out_dir}/corpus")

    metrics = obs.get
    manifest = {
        "input_docs": docs.count(),
        "kept_docs": metrics["kept_docs"],
        "total_tokens_kept": int(metrics["total_tokens"]),
        "config": {
            "min_tokens": cfg.min_tokens,
            "max_tokens": cfg.max_tokens,
            "max_stopword_ratio": cfg.max_stopword_ratio,
            "min_type_token_ratio": cfg.min_type_token_ratio,
            "keep_langs": list(cfg.keep_langs),
            "max_hamming": cfg.max_hamming,
        },
    }
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def write_training_shards(
    docs: DataFrame, out_dir: str, n_shards: int = 16
) -> dict:
    """Export a corpus as N hash-balanced shards + a shard manifest —
    the last step of training-data prep (downstream loaders stripe one
    worker per shard directory).

    Shard membership uses the same deterministic Knuth hash as
    split_train_test / the ``shard_plan`` query, so assignment is
    stable across runs, engines, and re-shards of supersets. The write
    repartitions BY THE SHARD COLUMN first, so each output directory
    is produced by the tasks owning that shard (no 1-file-per-task ×
    N-dirs fragmentation), then ``partitionBy`` lays out
    ``shard=K/part-*.parquet``. The manifest is an N-row aggregate —
    nothing per-doc ever reaches the driver.
    """
    from codex_data_products_spark.queries.sampling import _doc_hash

    sharded = docs.withColumn(
        "shard", (_doc_hash() % n_shards).cast("long")
    )
    sharded.repartition(n_shards, "shard").write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(f"{out_dir}/shards")

    stats = (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "shards": [
            {
                "shard": r["shard"],
                "n_docs": r["n_docs"],
                "n_chars": r["n_chars"],
            }
            for r in stats
        ],
        "total_docs": int(sum(r["n_docs"] for r in stats)),
    }
    with open(f"{out_dir}/shard_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest
