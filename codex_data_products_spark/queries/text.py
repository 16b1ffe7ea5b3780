"""Text-analysis operators over the ``documents`` table.

Green-field LLM-data-pipeline surface (BASELINE.json north star): token
counting, quality scoring, language-ID heuristic, document fingerprinting.
Everything is built-in column expressions (split / transform / filter /
md5) — JVM-side, whole-stage codegen, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from codex_data_products_spark.functions.compat import sql_dratio
from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

# Tokens: lowercase, whitespace-split. Both engines split with the same
# regex so token arrays are identical.
def _tokens():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")
_SQL_TOKENS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

# ---------------------------------------------------------------------------
# text_tokens — token & character accounting (whitespace + regex
# tokenizer; the BPE-ish pass lives in text_quality's word stats).
# ---------------------------------------------------------------------------

_TOKENS_SQL = f"""
SELECT
  doc_id,
  CAST(len({_SQL_TOKENS}) AS BIGINT)          AS n_tokens,
  CAST(length(text) AS BIGINT)                AS n_chars_actual,
  n_chars                                     AS n_chars_declared,
  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / len({_SQL_TOKENS}), 6)              AS avg_token_len
FROM documents
"""


@register("text_tokens", sql=_TOKENS_SQL)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    n_tokens = F.size(_tokens())
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.col("n_chars").alias("n_chars_declared"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens,
            6,
        ).alias("avg_token_len"),
    )


# ---------------------------------------------------------------------------
# text_pretokenize — BPE-style pre-tokenization accounting: word pieces
# (\w+) and punctuation pieces ([^\w\s]) counted separately, the way a
# GPT-ish tokenizer splits before merges. The piece count is the
# standard cheap token-budget estimator for corpus mixture planning.
# ---------------------------------------------------------------------------

_PRETOK_SQL = r"""
SELECT
  doc_id,
  CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT)      AS n_word_pieces,
  CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT)  AS n_punct_pieces,
  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_pieces,
  round(CAST(length(text) AS DOUBLE)
        / len(regexp_extract_all(text, '\w+|[^\w\s]')), 6)  AS chars_per_piece
FROM documents
"""


@register("text_pretokenize", sql=_PRETOK_SQL)
def text_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    words = F.regexp_extract_all("text", F.lit(r"\w+"), 0)
    punct = F.regexp_extract_all("text", F.lit(r"[^\w\s]"), 0)
    pieces = F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_word_pieces"),
        F.size(punct).cast("long").alias("n_punct_pieces"),
        F.size(pieces).cast("long").alias("n_pieces"),
        F.round(
            F.length("text").cast("double") / F.size(pieces), 6
        ).alias("chars_per_piece"),
    )


# ---------------------------------------------------------------------------
# text_quality — heuristic quality scores: stopword ratio, type-token
# ratio, length bucket. Set-based array expressions, no UDF.
# ---------------------------------------------------------------------------

_STOPWORDS = ["the", "a", "of", "and", "to"]
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
)
SELECT
  doc_id,
  round(CAST(len(list_filter(toks, x -> list_contains({_SQL_STOPLIST}, x))) AS DOUBLE)
        / len(toks), 6)                                   AS stopword_ratio,
  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS type_token_ratio,
  CASE WHEN len(toks) < 30 THEN 'short'
       WHEN len(toks) < 80 THEN 'medium'
       ELSE 'long' END                                    AS length_bucket
FROM t
"""


@register("text_quality", sql=_QUALITY_SQL)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.round(n_stop.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(n_distinct.cast("double") / n, 6).alias("type_token_ratio"),
        F.when(n < 30, "short")
        .when(n < 80, "medium")
        .otherwise("long")
        .alias("length_bucket"),
    )


# ---------------------------------------------------------------------------
# text_langid — n-gram/stopword-list language heuristic with a
# deterministic arg-max (ties broken by fixed language order).
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "das"],
}


def _sql_lang_score(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(toks, x -> list_contains({lst}, x)))"


_LANGID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang AS lang_declared, {_SQL_TOKENS} AS toks FROM documents
),
s AS (
  SELECT doc_id, lang_declared,
         {_sql_lang_score('en')} AS s_en,
         {_sql_lang_score('es')} AS s_es,
         {_sql_lang_score('de')} AS s_de
  FROM t
)
SELECT doc_id, lang_declared,
       CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
            WHEN s_es >= s_de THEN 'es'
            ELSE 'de' END AS lang_predicted,
       CAST(s_en AS BIGINT) AS score_en
FROM s
"""


@register("text_langid", sql=_LANGID_SQL)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    toks = _tokens()

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    s_en, s_es, s_de = score("en"), score("es"), score("de")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        F.when((s_en >= s_es) & (s_en >= s_de), "en")
        .when(s_es >= s_de, "es")
        .otherwise("de")
        .alias("lang_predicted"),
        s_en.cast("long").alias("score_en"),
    )


# ---------------------------------------------------------------------------
# text_fingerprint — canonical-form document fingerprint (sorted distinct
# tokens → md5), the standard "fingerprint method" for clustering near-
# identical records; md5 is bit-identical across engines.
# ---------------------------------------------------------------------------

_FPRINT_SQL = f"""
SELECT
  doc_id,
  md5(array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' ')) AS fingerprint,
  md5(text)                                                          AS exact_hash
FROM documents
"""


@register("text_fingerprint", sql=_FPRINT_SQL)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(_tokens())), " ")
        ).alias("fingerprint"),
        F.md5(F.col("text")).alias("exact_hash"),
    )


# ---------------------------------------------------------------------------
# text_repetition — Gopher-style repetition filters: fraction of the doc
# covered by its most frequent token and most frequent bigram. Entirely
# row-local array math (no explode → no per-token shuffle): the token
# list is ~1e2 per doc, so the O(distinct × n) in-row count is cheap and
# the whole query is one codegen stage + final projection.
# ---------------------------------------------------------------------------

_REPETITION_SQL = r"""
SELECT doc_id, n_tokens,
       round(CAST(top_tok AS DOUBLE) / n_tokens, 6) AS top_token_frac,
       round(CAST(top_bg AS DOUBLE) / (n_tokens - 1), 6) AS top_bigram_frac,
       (CAST(top_tok AS DOUBLE) / n_tokens > 0.20
        OR CAST(top_bg AS DOUBLE) / (n_tokens - 1) > 0.15) AS repetitive
FROM (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         list_max(list_transform(list_distinct(toks),
                  x -> len(list_filter(toks, y -> y = x)))) AS top_tok,
         list_max(list_transform(list_distinct(bgs),
                  x -> len(list_filter(bgs, y -> y = x)))) AS top_bg
  FROM (
    SELECT doc_id, toks,
           list_transform(generate_series(1, len(toks) - 1),
                          i -> toks[i] || ' ' || toks[i + 1]) AS bgs
    FROM (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      FROM documents
    )
  )
)
WHERE n_tokens > 1
"""


@register("text_repetition", sql=_REPETITION_SQL)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    toks = _tokens()
    # Materialize token/bigram arrays behind an exchange: the occurrence
    # count references the array inside a per-element lambda, where
    # loop-invariant subexpressions are re-evaluated per element — the
    # regex split must already be a plain column there.
    arrays = spread(
        docs.select(
            "doc_id",
            toks.alias("toks"),
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ).alias("bgs"),
        ),
        "doc_id",
    )

    def top_count(arr):
        return F.array_max(
            F.transform(
                F.array_distinct(arr),
                lambda x: F.size(F.filter(arr, lambda y: y == x)),
            )
        )

    staged = arrays.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        top_count(F.col("toks")).alias("top_tok"),
        top_count(F.col("bgs")).alias("top_bg"),
    ).filter(F.col("n_tokens") > 1)
    top_token_frac = F.col("top_tok").cast("double") / F.col("n_tokens")
    top_bigram_frac = F.col("top_bg").cast("double") / (F.col("n_tokens") - 1)
    return staged.select(
        "doc_id",
        "n_tokens",
        F.round(top_token_frac, 6).alias("top_token_frac"),
        F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        ((top_token_frac > 0.20) | (top_bigram_frac > 0.15)).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# explode_positions — the generator/UDTF family: posexplode of token
# arrays (1 row per token with its position). The explode is the
# deliberate scale-out: rows × avg_tokens output, aggregated back down
# in the same stage pipeline. (Internal pipelines explode shingles the
# same way, queries/dedup.shingle_table.)
# ---------------------------------------------------------------------------

_EXPLODE_SQL = r"""
SELECT token,
       count(*)                   AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(min(pos) AS BIGINT)   AS min_pos
FROM (
  SELECT doc_id, i - 1 AS pos, toks[i] AS token
  FROM (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
    FROM documents
  ), unnest(generate_series(1, len(toks))) AS u(i)
)
WHERE length(token) > 4
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
"""


@register("explode_positions", sql=_EXPLODE_SQL)
def explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos", "token")
    ).filter(F.length("token") > 4)
    return (
        exploded.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("pos").cast("long").alias("min_pos"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# vocab_top_terms — vocabulary induction: top-5 terms per language by
# term frequency, with corpus-wide document frequency attached. The
# (tf DESC, df ASC, term) rank is integer-only, so it is deterministic
# across engines — a float tf-idf would rank identically here but ties
# could flip on last-ulp ln() differences. At 100 TB: the per-(lang,
# term) agg map-side combines; the df table keyed by term is the only
# re-shuffle, and the top-5 filter is a WindowGroupLimit pushed below
# the final sort, so no executor materializes a full vocabulary.
# ---------------------------------------------------------------------------

_VOCAB_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_SQL_TOKENS}) AS term FROM documents
),
tf AS (
  SELECT lang, term, count(*) AS tf
  FROM tok WHERE length(term) > 3
  GROUP BY lang, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM tok WHERE length(term) > 3
  GROUP BY term
)
SELECT lang, term, tf, df, rank FROM (
  SELECT tf.lang, tf.term, tf.tf, df.df,
         CAST(row_number() OVER (PARTITION BY tf.lang
                                 ORDER BY tf.tf DESC, df.df ASC, tf.term)
              AS BIGINT) AS rank
  FROM tf JOIN df USING (term)
)
WHERE rank <= 5
"""


@register("vocab_top_terms", sql=_VOCAB_SQL)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(_tokens()).alias("term")
    ).filter(F.length("term") > 3)
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term")
    )
    return (
        tf.join(df, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("lang", "term", "tf", "df", "rank")
    )


# ---------------------------------------------------------------------------
# heavy_hitters_cms — frequent-token mining with a Count-Min prefilter:
# pass 1 folds the token stream into a 3×1024-cell sketch (map-side
# combine; the shuffle is <= 3072 rows per task no matter how many
# distinct tokens exist), pass 2 streams tokens again, keeps only
# occurrences whose sketch estimate clears the threshold (broadcast
# map-side lookups, no shuffle), and recounts the survivors exactly.
# CMS only over-counts, so no true heavy hitter is lost, and the exact
# recount kills false positives — the oracle is the plain exact
# GROUP BY ... HAVING, which is exactly the full-shuffle plan the
# sketch path replaces at 100 TB.
# ---------------------------------------------------------------------------

_HH_THRESHOLD = 200

_HH_SQL = f"""
SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
GROUP BY token
HAVING count(*) >= {_HH_THRESHOLD}
"""


@register("heavy_hitters_cms", sql=_HH_SQL)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    toks = T(spark, sf_dir, "documents").select(
        F.explode(_tokens()).alias("token")
    )
    sketch = cms_build(toks, "token")
    survivors = (
        cms_estimate(toks, sketch, "token")
        .filter(F.col("cms_est") >= _HH_THRESHOLD)
        .drop("cms_est")
    )
    return (
        survivors.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= _HH_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# text_normalize — canonical text cleanup before hashing/dedup:
# collapse whitespace runs, trim, casefold. Emitting the cleaned text
# plus before/after lengths makes the operator self-auditing (the
# length delta is the cheap "how dirty was this corpus" metric).
# Row-local string expressions — whole-stage codegen, no shuffle at
# all; at 100 TB this runs fused into whatever scan feeds it.
# ---------------------------------------------------------------------------

_NORMALIZE_SQL = r"""
SELECT doc_id,
       lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS clean_text,
       CAST(length(text) AS BIGINT)  AS n_chars_raw,
       CAST(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
            AS BIGINT)               AS n_chars_clean
FROM documents
"""


@register("text_normalize", sql=_NORMALIZE_SQL)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    clean = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.length(clean).cast("long").alias("n_chars_clean"),
    )


# ---------------------------------------------------------------------------
# text_tfidf_top_terms — per-document top-3 terms by tf-idf (plain
# ln(N/df), no smoothing). The workhorse relevance feature of corpus
# curation. Plan shape at scale: one explode + one (doc, term) hash agg
# for tf; the df table aggregates to |vocab| rows and BROADCASTS back;
# N is a broadcast scalar; the per-doc top-3 is a WindowGroupLimit
# (per-partition top-k, no global sort). Ranking is over the ROUNDED
# score with a term tie-break so both engines cut identical sets.
# ---------------------------------------------------------------------------

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, CAST(rnk AS BIGINT) AS rnk, tfidf
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term
  ) AS rnk
  FROM scored WHERE tfidf > 0
) WHERE rnk <= 3
"""


@register("text_tfidf_top_terms", sql=_TFIDF_SQL)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    toks = spread(
        docs.select("doc_id", _tokens().alias("toks")), "doc_id"
    ).select("doc_id", F.explode("toks").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
        .filter(F.col("tfidf") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "rnk", "tfidf")
    )


# ---------------------------------------------------------------------------
# text_zipf — least-squares fit of log(freq) against log(rank) over the
# top-100 terms: the Zipf-law diagnostic a corpus health check runs
# (natural text ≈ -1 slope; synthetic/templated text is flatter). The
# explode/agg shrinks to |vocab| rows before the single-partition rank
# window — the window input is vocabulary-sized, never corpus-sized —
# and the regression is one 100-row aggregate: slope = cov/var,
# intercept from the means, r² = corr². Deterministic tie-break
# (freq DESC, term) pins identical ranks across engines.
# ---------------------------------------------------------------------------

_ZIPF_SQL = f"""
WITH toks AS (
  SELECT unnest({_SQL_TOKENS}) AS term FROM documents
),
freq AS (SELECT term, count(*) AS f FROM toks GROUP BY term),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, term) AS r FROM freq
),
pts AS (
  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
  FROM ranked WHERE r <= 100
)
SELECT
  round(regr_slope(y, x), 6)     AS slope,
  round(regr_intercept(y, x), 6) AS intercept,
  round(corr(y, x) * corr(y, x), 6) AS r2,
  CAST(count(*) AS BIGINT)       AS n_terms
FROM pts
"""


@register("text_zipf", sql=_ZIPF_SQL)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    toks = spread(
        docs.select("doc_id", _tokens().alias("toks")), "doc_id"
    ).select(F.explode("toks").alias("term"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("term"))
    pts = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 100)
        .select(
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    slope = F.covar_pop("y", "x") / F.var_pop("x")
    return pts.agg(
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(F.corr("y", "x") * F.corr("y", "x"), 6).alias("r2"),
        F.count(F.lit(1)).alias("n_terms"),
    )


# ---------------------------------------------------------------------------
# text_bpe_pairs — the counting step of BPE-style tokenizer training:
# frequency of every ADJACENT token pair across the corpus, top 50.
# This is the statistic a merge rule is picked from on each BPE round
# (the actual loop re-counts after each merge; one round is the
# representative distributed kernel). JVM-only: the pair list is built
# with transform+element_at over the token array (no posexplode
# self-join — the classic shape that shuffles the corpus twice), then
# one explode → hash-agg → TakeOrdered. At 100 TB the agg key space is
# |vocab|², but map-side combine collapses per-partition repeats and
# the top-k never materializes a global sort.
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS = 50

_BPE_PAIRS_SQL = f"""
WITH toks AS (
  SELECT {_SQL_TOKENS} AS t FROM documents
),
pairs AS (
  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
  FROM toks WHERE len(t) >= 2
)
SELECT p[1] AS left_tok, p[2] AS right_tok, CAST(count(*) AS BIGINT) AS n
FROM pairs
GROUP BY left_tok, right_tok
ORDER BY n DESC, left_tok, right_tok
LIMIT {BPE_TOP_PAIRS}
"""


@register("text_bpe_pairs", sql=_BPE_PAIRS_SQL)
def text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    toks = F.col("toks")
    pairs = F.transform(
        F.slice(toks, 1, F.size(toks) - 1),
        lambda x, i: F.struct(
            x.alias("left_tok"),
            F.element_at(toks, i + 2).alias("right_tok"),
        ),
    )
    return (
        docs.select(_tokens().alias("toks"))
        .filter(F.size(toks) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select("p.left_tok", "p.right_tok")
        .groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "left_tok", "right_tok")
        .limit(BPE_TOP_PAIRS)
    )


# ---------------------------------------------------------------------------
# text_boilerplate — cross-document boilerplate detection: 4-grams whose
# DOCUMENT frequency crosses a threshold (headers, footers, license
# blurbs — the spans an LLM-data pipeline strips before training).
# Same skew-safe shape as split_contamination: (gram, doc_id) pairs are
# deduped with a composite key FIRST, so a gram shared by half the
# corpus spreads across tasks via map-side combine instead of
# concentrating in one collect_set array. Document frequency is then a
# plain count per gram — no arrays, no hot single task.
# ---------------------------------------------------------------------------

BOILERPLATE_NGRAM = 4
BOILERPLATE_MIN_DF = 3

_BOILERPLATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {BOILERPLATE_NGRAM - 1}), ' ') AS gram
  FROM toks,
       unnest(generate_series(1, greatest(len(t) - {BOILERPLATE_NGRAM - 1}, 0))) AS u(i)
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks)
SELECT gram,
       CAST(count(*) AS BIGINT) AS df,
       round(CAST(count(*) AS DOUBLE) / any_value(n_docs), 6) AS doc_share
FROM sh CROSS JOIN n
GROUP BY gram
HAVING count(*) >= {BOILERPLATE_MIN_DF}
"""


@register("text_boilerplate", sql=_BOILERPLATE_SQL)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    # tokenize once behind an exchange (CollapseProject would re-run the
    # regex split per slice otherwise — same fix as split_contamination).
    # Docs shorter than the n-gram are filtered BEFORE gram generation:
    # with a greatest(..., 0) clamp F.sequence(1, 0) defaults to step -1
    # and yields [1, 0], whose i=0 element makes F.slice throw
    # INVALID_PARAMETER_VALUE.START — the short-doc guard (same as
    # shingle_table's) keeps the sequence bound >= 1 always, matching
    # the oracle's generate_series(1, 0) → no grams.
    tokenized = spread(
        docs.select("doc_id", _tokens().alias("toks")).filter(
            F.size("toks") >= BOILERPLATE_NGRAM
        )
    )
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (BOILERPLATE_NGRAM - 1)),
        lambda i: F.array_join(F.slice(toks, i, BOILERPLATE_NGRAM), " "),
    )
    pairs = (
        tokenized.select("doc_id", F.explode(grams).alias("gram")).distinct()
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    return (
        pairs.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILERPLATE_MIN_DF)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "gram",
            "df",
            F.round(
                F.col("df").cast("double") / F.col("n_docs"), 6
            ).alias("doc_share"),
        )
    )


# ---------------------------------------------------------------------------
# text_entropy — character-level Shannon entropy per document, a
# quality signal that separates natural text from key-mash and
# base64-ish blobs. Float hazard: entropy is a SUM of per-char float
# terms, and hash-agg order would make the low bits partition-
# dependent — so the per-char counts (exact integers) are collected
# into a char-SORTED list and folded left-to-right with the same IEEE
# ops in both engines (the events_ewma recipe). The char explode is
# O(total text) rows but purely parallel; the fold is row-local over
# ≤|alphabet| terms per doc.
# ---------------------------------------------------------------------------

_ENTROPY_SQL = r"""
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
  FROM documents
),
counts AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
  FROM chars GROUP BY doc_id, ch
),
packed AS (
  SELECT doc_id,
         list(CAST(c AS DOUBLE) ORDER BY ch) AS cs,
         CAST(sum(c) AS BIGINT) AS n_chars,
         CAST(count(*) AS BIGINT) AS distinct_chars
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_chars, distinct_chars,
       round(list_reduce(
         list_prepend(CAST(0.0 AS DOUBLE), cs),
         (acc, c) -> acc + (-(c / n_chars) * ln(c / n_chars))
       ), 6) AS entropy
FROM packed
"""


@register("text_entropy", sql=_ENTROPY_SQL)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit(r"[\s\S]"), 0)
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    packed = counts.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ch", "c"))),
            lambda s: s["c"].cast("double"),
        ).alias("cs"),
        F.sum("c").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("distinct_chars"),
    )
    n = F.col("n_chars")
    entropy = F.aggregate(
        F.col("cs"),
        F.lit(0.0),
        lambda acc, c: acc + (-(c / n) * F.log(c / n)),
    )
    return packed.select(
        "doc_id",
        "n_chars",
        "distinct_chars",
        F.round(entropy, 6).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# text_pii_scan — PII detection sweep (emails / IPv4s / phone numbers)
# with a BUILT-IN ground truth: a deterministic 30% of documents get a
# synthetic PII token injected (derived from doc_id, identically in
# both engines), so the scan reports not just per-source hit counts but
# its own recall — missed = injected − detected must be 0, the gate a
# redaction pipeline alarms on. The patterns are ASCII-only and
# backreference-free so Java regex (Spark) and RE2 (DuckDB) agree.
# Plan: one scan, all regexes evaluated row-local in codegen, one hash
# aggregation to the |sources| grain. At 100 TB this is the cheapest
# possible shape — no shuffle except the final tiny agg.
# ---------------------------------------------------------------------------

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d-\d{3}-\d{4}"

_PII_SQL = f"""
WITH h AS (
  SELECT source, text, ((doc_id * 2654435761) % 4294967296) % 10 AS slot,
         doc_id
  FROM documents
),
inj AS (
  SELECT source,
         CASE slot
           WHEN 0 THEN text || ' contact user' || CAST(doc_id % 1000 AS VARCHAR)
                        || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.org'
           WHEN 1 THEN text || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 254 AS VARCHAR) || '.7'
           WHEN 2 THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE text
         END AS text,
         CAST(slot = 0 AS INT) AS inj_email,
         CAST(slot = 1 AS INT) AS inj_ip,
         CAST(slot = 2 AS INT) AS inj_phone
  FROM h
)
SELECT source,
       CAST(count(*) AS BIGINT)                            AS n_docs,
       CAST(sum(inj_email) AS BIGINT)                      AS injected_emails,
       CAST(sum(len(regexp_extract_all(text, '{_PII_EMAIL}'))) AS BIGINT)
                                                           AS detected_emails,
       CAST(sum(inj_ip) AS BIGINT)                         AS injected_ips,
       CAST(sum(len(regexp_extract_all(text, '{_PII_IPV4}'))) AS BIGINT)
                                                           AS detected_ips,
       CAST(sum(inj_phone) AS BIGINT)                      AS injected_phones,
       CAST(sum(len(regexp_extract_all(text, '{_PII_PHONE}'))) AS BIGINT)
                                                           AS detected_phones,
       CAST(sum(CAST(regexp_matches(text, '{_PII_EMAIL}') OR
                     regexp_matches(text, '{_PII_IPV4}') OR
                     regexp_matches(text, '{_PII_PHONE}') AS INT)) AS BIGINT)
                                                           AS docs_flagged
FROM inj
GROUP BY source
"""


@register("text_pii_scan", sql=_PII_SQL)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    slot = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) % 10
    did = F.col("doc_id")
    injected = (
        F.when(
            slot == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                (did % 1000).cast("string"),
                F.lit("@example"),
                (did % 7).cast("string"),
                F.lit(".org"),
            ),
        )
        .when(
            slot == 1,
            F.concat(
                F.col("text"),
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 254).cast("string"),
                F.lit(".7"),
            ),
        )
        .when(
            slot == 2,
            F.concat(
                F.col("text"),
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
    )
    inj = docs.select(
        "source",
        injected.alias("text"),
        (slot == 0).cast("int").alias("inj_email"),
        (slot == 1).cast("int").alias("inj_ip"),
        (slot == 2).cast("int").alias("inj_phone"),
    )

    def n_hits(pat: str):
        return F.size(
            F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))
        )

    flagged = (
        F.col("text").rlike(_PII_EMAIL)
        | F.col("text").rlike(_PII_IPV4)
        | F.col("text").rlike(_PII_PHONE)
    )
    return inj.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("inj_email").cast("long").alias("injected_emails"),
        F.sum(n_hits(_PII_EMAIL)).cast("long").alias("detected_emails"),
        F.sum("inj_ip").cast("long").alias("injected_ips"),
        F.sum(n_hits(_PII_IPV4)).cast("long").alias("detected_ips"),
        F.sum("inj_phone").cast("long").alias("injected_phones"),
        F.sum(n_hits(_PII_PHONE)).cast("long").alias("detected_phones"),
        F.sum(flagged.cast("int")).cast("long").alias("docs_flagged"),
    )


# ---------------------------------------------------------------------------
# text_length_percentiles — exact p50/p90/p99 of document length per
# language: the length profile a curation pipeline reads before setting
# truncation / min-length thresholds. Percentiles are EXACT discrete
# quantiles with zero interpolation ambiguity, computed scale-safely
# with the distinct-value cumulative trick (same as
# events_funnel_timing): aggregate to the (lang, distinct n_chars)
# grain, one cumulative window over that bounded frame, pick the
# smallest value whose cumulative count reaches ceil(q·n) = n − ⌊(1−q)n⌋
# in pure integer arithmetic. Never a per-document window.
# ---------------------------------------------------------------------------

_LEN_PCT_SQL = """
WITH buckets AS (
  SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY lang, n_chars
),
cum AS (
  SELECT lang, n_chars, c,
         sum(c) OVER (PARTITION BY lang ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_c,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM buckets
)
SELECT lang,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(min(CASE WHEN cum_c >= n - n // 2   THEN n_chars END) AS BIGINT)
         AS p50_chars,
       CAST(min(CASE WHEN cum_c >= n - n // 10  THEN n_chars END) AS BIGINT)
         AS p90_chars,
       CAST(min(CASE WHEN cum_c >= n - n // 100 THEN n_chars END) AS BIGINT)
         AS p99_chars,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM cum
GROUP BY lang
"""


@register("text_length_percentiles", sql=_LEN_PCT_SQL)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    buckets = (
        T(spark, sf_dir, "documents")
        .groupBy("lang", "n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wl = Window.partitionBy("lang")
    cum = buckets.select(
        "lang",
        "n_chars",
        F.sum("c")
        .over(wl.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_c"),
        F.sum("c").over(wl).alias("n"),
    )

    def pick(div: int):
        t = F.col("n") - F.expr(f"n div {div}")
        return F.min(F.when(F.col("cum_c") >= t, F.col("n_chars"))).cast(
            "long"
        )

    return cum.groupBy("lang").agg(
        F.max("n").cast("long").alias("n_docs"),
        pick(2).alias("p50_chars"),
        pick(10).alias("p90_chars"),
        pick(100).alias("p99_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# text_langid_eval — the language-ID heuristic measured against the
# declared labels: confusion-matrix cells plus each cell's share of its
# declared language. Like dedup_minhash_eval / knn_*_recall, this is
# the self-measuring gate a curation pipeline tunes marker lists
# against (zh/fr have no markers, so the matrix shows exactly where
# the heuristic's coverage ends). One scan, row-local scoring, one
# hash agg to the |langs|² grain, shares via a window over that tiny
# frame.
# ---------------------------------------------------------------------------

_LANGID_EVAL_SQL = f"""
WITH t AS (
  SELECT lang AS lang_declared, {_SQL_TOKENS} AS toks FROM documents
),
s AS (
  SELECT lang_declared,
         {_sql_lang_score('en')} AS s_en,
         {_sql_lang_score('es')} AS s_es,
         {_sql_lang_score('de')} AS s_de
  FROM t
),
pred AS (
  SELECT lang_declared,
         CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
              WHEN s_es >= s_de THEN 'es'
              ELSE 'de' END AS lang_predicted
  FROM s
),
cells AS (
  SELECT lang_declared, lang_predicted, count(*) AS n
  FROM pred GROUP BY lang_declared, lang_predicted
)
SELECT lang_declared, lang_predicted, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY lang_declared), 6)
         AS share_of_declared
FROM cells
"""


@register("text_langid_eval", sql=_LANGID_EVAL_SQL)
def text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    toks = _tokens()

    def score(lang: str):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    s_en, s_es, s_de = score("en"), score("es"), score("de")
    pred = docs.select(
        F.col("lang").alias("lang_declared"),
        F.when((s_en >= s_es) & (s_en >= s_de), "en")
        .when(s_es >= s_de, "es")
        .otherwise("de")
        .alias("lang_predicted"),
    )
    cells = pred.groupBy("lang_declared", "lang_predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    return cells.select(
        "lang_declared",
        "lang_predicted",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("lang_declared")),
            6,
        ).alias("share_of_declared"),
    )


# ---------------------------------------------------------------------------
# text_unigram_surprisal — unigram-LM quality scoring, the CCNet-style
# corpus filter: train term frequencies on the corpus itself, score
# each document by its mean token surprisal -1/n Σ ln(tf_t/N) (high =
# rare-token gibberish, low = stopword soup; the middle is keepable
# text). Plan: one token explode → (doc, term) counts → corpus term
# frequencies (map-side combinable) joined back on term — at 100 TB
# the LM side is vocabulary-sized, so the join shuffles vocab rows,
# never the corpus twice. Float hazard: the per-doc sum is folded over
# a term-SORTED list (the text_entropy recipe) so hash-agg order can't
# touch the low bits; ln() on identical doubles agrees across engines.
# ---------------------------------------------------------------------------

_SURPRISAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
),
dt AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, term
),
lm AS (
  SELECT term, CAST(sum(c) AS BIGINT) AS tf FROM dt GROUP BY term
),
n_total AS (SELECT CAST(sum(tf) AS BIGINT) AS n FROM lm),
packed AS (
  SELECT d.doc_id,
         list(CAST(d.c AS DOUBLE) ORDER BY d.term)  AS cs,
         list(CAST(l.tf AS DOUBLE) ORDER BY d.term) AS tfs,
         CAST(sum(d.c) AS BIGINT) AS n_tokens
  FROM dt d JOIN lm l ON l.term = d.term
  GROUP BY d.doc_id
)
SELECT doc_id, n_tokens,
       round(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(generate_series(1, len(cs)),
                            i -> -cs[i] * ln(tfs[i] / t.n))),
           (acc, x) -> acc + x
         ) / n_tokens, 6) AS mean_surprisal
FROM packed, n_total t
"""


@register("text_unigram_surprisal", sql=_SURPRISAL_SQL)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    # dt feeds the LM side AND the per-doc pack; one cut = one corpus
    # tokenize instead of three (at 100 TB dt is the persisted
    # token-count table every downstream LM query shares)
    dt = (
        spread(docs.select("doc_id", _tokens().alias("toks")), "doc_id")
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    lm = dt.groupBy("term").agg(F.sum("c").cast("long").alias("tf"))
    n_total = lm.agg(F.sum("tf").cast("long").alias("n"))
    packed = (
        dt.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("term", "c", "tf"))
            ).alias("rows"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    n = F.col("n")
    # fold term-sorted (c, tf) pairs: acc + (-c * ln(tf / N))
    surprisal_sum = F.aggregate(
        F.col("rows"),
        F.lit(0.0),
        lambda acc, r: acc
        + (
            -r["c"].cast("double")
            * F.log(r["tf"].cast("double") / n)
        ),
    )
    return packed.crossJoin(F.broadcast(n_total)).select(
        "doc_id",
        "n_tokens",
        F.round(surprisal_sum / F.col("n_tokens"), 6).alias(
            "mean_surprisal"
        ),
    )


# ---------------------------------------------------------------------------
# text_hash_embedding — feature-hashing document vectors (the hashing
# trick): each term routes to one of 8 buckets by md5, with a +/-1 sign
# from an independent md5 bit, and the doc's vector component is the
# signed sum of term counts. Model-free text -> vector featurization
# for clustering / near-dup blocking when no trained embedder is in
# the loop. All arithmetic is EXACT integers on bit-identical md5
# values, so the oracle comparison is trivial. Plan: token explode ->
# (doc, term) counts -> row-local bucket/sign -> one pivot-free
# conditional aggregation per doc; scales as one shuffle on doc_id.
# ---------------------------------------------------------------------------

_HASH_DIMS = 8

_HASH_EMB_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
),
dt AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY doc_id, term
),
routed AS (
  SELECT doc_id, c,
         CAST(concat('0x', substring(md5(term), 1, 8)) AS BIGINT)
           % {_HASH_DIMS} AS bucket,
         CASE WHEN CAST(concat('0x', substring(md5(concat('sign|', term)), 1, 8))
                        AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS sgn
  FROM dt
)
SELECT doc_id,
       {", ".join(
           f"CAST(coalesce(sum(CASE WHEN bucket = {d} THEN sgn * c END), 0)"
           f" AS BIGINT) AS h{d}" for d in range(_HASH_DIMS)
       )}
FROM routed GROUP BY doc_id
"""


@register("text_hash_embedding", sql=_HASH_EMB_SQL)
def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    dt = (
        spread(docs.select("doc_id", _tokens().alias("toks")), "doc_id")
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def h32(col, salt=""):
        src = (
            F.concat(F.lit(salt), col) if salt else col
        )
        return F.conv(F.substring(F.md5(src), 1, 8), 16, 10).cast("long")

    routed = dt.select(
        "doc_id",
        "c",
        (h32(F.col("term")) % _HASH_DIMS).alias("bucket"),
        F.when(h32(F.col("term"), "sign|") % 2 == 0, 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    return routed.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("bucket") == d, F.col("sgn") * F.col("c")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"h{d}")
            for d in range(_HASH_DIMS)
        ]
    )


# ---------------------------------------------------------------------------
# text_bigram_surprisal — bigram-LM quality scoring, the second-order
# companion to text_unigram_surprisal (KenLM-style corpus filters score
# with n-gram context; unigram alone can't see scrambled word salad).
# The LM is add-one (Laplace) smoothed: p(w2|w1) = (c(w1 w2) + 1) /
# (c1(w1) + V), trained on the corpus itself; each doc scores the mean
# surprisal -1/nb Σ ln p over its bigrams. Plan: bigrams are generated
# ROW-LOCALLY (slice+concat over the token array — no self-join, no
# window over token positions), counted per (doc, bigram), the LM side
# collapses to bigram/left-word grains (vocabulary-sized, map-side
# combinable), and the per-doc sum folds over a bigram-SORTED list so
# hash-agg order never touches the low bits. At 100 TB the joins
# shuffle vocab rows, never the corpus twice.
# ---------------------------------------------------------------------------

_SQL_BIGRAMS = (
    "list_transform(generate_series(1, len(t) - 1),"
    " i -> t[i] || ' ' || t[i + 1])"
)

_BIGRAM_SURPRISAL_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
),
bg AS (
  SELECT doc_id, unnest({_SQL_BIGRAMS}) AS bigram
  FROM toks WHERE len(t) >= 2
),
db AS (
  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS c
  FROM bg GROUP BY doc_id, bigram
),
lm AS (
  SELECT bigram, CAST(sum(c) AS BIGINT) AS cb,
         split_part(bigram, ' ', 1) AS w1
  FROM db GROUP BY bigram
),
lefts AS (
  SELECT w1, CAST(sum(cb) AS BIGINT) AS c1 FROM lm GROUP BY w1
),
vocab AS (
  SELECT CAST(count(DISTINCT split_part(bigram, ' ', 2)) AS BIGINT) AS v
  FROM lm
),
packed AS (
  SELECT d.doc_id,
         list(CAST(d.c AS DOUBLE) ORDER BY d.bigram)  AS cs,
         list(CAST(l.cb AS DOUBLE) ORDER BY d.bigram) AS cbs,
         list(CAST(f.c1 AS DOUBLE) ORDER BY d.bigram) AS c1s,
         CAST(sum(d.c) AS BIGINT) AS n_bigrams
  FROM db d
  JOIN lm l ON l.bigram = d.bigram
  JOIN lefts f ON f.w1 = l.w1
  GROUP BY d.doc_id
)
SELECT doc_id, n_bigrams,
       round(list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(generate_series(1, len(cs)),
               i -> -cs[i] * ln((cbs[i] + 1) / (c1s[i] + vb.v)))),
           (acc, x) -> acc + x
         ) / n_bigrams, 6) AS mean_surprisal
FROM packed, vocab vb
"""


@register("text_bigram_surprisal", sql=_BIGRAM_SURPRISAL_SQL)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    # short-doc guard BEFORE gram generation (text_boilerplate contract:
    # F.sequence(1, 0) would step -1 and emit [1, 0])
    toks = spread(
        docs.select("doc_id", _tokens().alias("t")).filter(
            F.size("t") >= 2
        )
    )
    t = F.col("t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat(
            F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
        ),
    )
    # same cut as text_unigram_surprisal: db feeds the bigram LM, the
    # left-word counts, the vocab size AND the per-doc pack
    db = (
        toks.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    lm = db.groupBy("bigram").agg(F.sum("c").cast("long").alias("cb")).select(
        "bigram", "cb", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1")
    )
    lefts = lm.groupBy("w1").agg(F.sum("cb").cast("long").alias("c1"))
    vocab = lm.select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2")
    ).agg(F.countDistinct("w2").cast("long").alias("v"))
    packed = (
        db.join(lm, "bigram")
        .join(lefts, "w1")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("bigram", "c", "cb", "c1"))
            ).alias("rows"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    v = F.col("v")
    surprisal_sum = F.aggregate(
        F.col("rows"),
        F.lit(0.0),
        lambda acc, r: acc
        + (
            -r["c"].cast("double")
            * F.log(
                (r["cb"].cast("double") + 1)
                / (r["c1"].cast("double") + v)
            )
        ),
    )
    return packed.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "n_bigrams",
        F.round(surprisal_sum / F.col("n_bigrams"), 6).alias(
            "mean_surprisal"
        ),
    )


# ---------------------------------------------------------------------------
# text_readability — Flesch reading-ease over integer text statistics:
# words (whitespace tokens), sentences (runs of [.!?]), and a syllable
# ESTIMATE (runs of vowels incl. y — the standard regex proxy; exact
# syllabification needs a dictionary). Corpus filters band on this to
# drop both unreadable boilerplate and trivially-short fragments. All
# three counts are exact integers from the same regex semantics on both
# engines (character classes only — no engine-specific syntax), so the
# only float math is the final closed-form score. Row-local, one scan,
# zero shuffle.
# ---------------------------------------------------------------------------

_READABILITY_SQL = f"""
WITH stats AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
           AS n_sentences,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (CAST(n_words AS DOUBLE)
                        / greatest(n_sentences, 1))
             - 84.6 * (CAST(n_syllables AS DOUBLE)
                       / greatest(n_words, 1)), 4) AS flesch
FROM stats
"""


@register("text_readability", sql=_READABILITY_SQL)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    n_words = F.size(_tokens()).cast("long")
    n_sentences = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))
    ).cast("long")
    n_syllables = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0)
        )
    ).cast("long")
    stats = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sentences.alias("n_sentences"),
        n_syllables.alias("n_syllables"),
    )
    return stats.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.lit(206.835)
            - F.lit(1.015)
            * (
                F.col("n_words").cast("double")
                / F.greatest(F.col("n_sentences"), F.lit(1))
            )
            - F.lit(84.6)
            * (
                F.col("n_syllables").cast("double")
                / F.greatest(F.col("n_words"), F.lit(1))
            ),
            4,
        ).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# text_bpe_train — REAL BPE tokenizer training (the iterative merge
# loop, not just pair counting like text_bpe_pairs): start from the
# word-frequency table with words split into characters, then T=4
# rounds of: count adjacent symbol pairs weighted by word frequency →
# pick the most frequent pair (lexicographic tie-break) → merge it
# corpus-wide. Classic BPE trains exactly this way on the vocab-grain
# word-frequency table (never raw text), so at 100 TB the loop runs on
# a vocabulary-sized frame after ONE corpus pass — each round is a
# hash agg + a 1-row broadcast of the winning pair.
#
# Determinism / parity: symbols live in a space-joined string with
# space sentinels; the merge is a literal left-to-right non-overlapping
# replace(' a b ' -> ' ab '), which Spark and DuckDB implement
# identically (consecutive overlapping occurrences under-merge the
# same way on both engines — the known quirk of string-replace BPE).
# Counts are exact integers; no floats anywhere. DuckDB replays the
# whole T-round chain from generated CTEs (the embedding_pca_power
# recipe for iterative algorithms).
# ---------------------------------------------------------------------------

BPE_MERGES = 4


def _bpe_chain_sql() -> str:
    """The shared WITH-chain: word-frequency table -> s0 (char split)
    -> T rounds of (pair count p{{t}}, winner b{{t}}, merged frame
    s{{t}}). text_bpe_train reads the b{{t}} winners; text_bpe_apply
    reads the final s{{T}} frame."""
    parts = [
        f"""
WITH words AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest({_SQL_TOKENS}) AS word FROM documents
  ) GROUP BY word
),
s0 AS (
  SELECT cnt,
         ' ' || array_to_string(
           list_transform(generate_series(1, length(word)),
                          i -> substring(word, i, 1)), ' ') || ' ' AS sym
  FROM words
)"""
    ]
    for t in range(1, BPE_MERGES + 1):
        parts.append(
            f""",
p{t} AS (
  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
    SELECT cnt,
           unnest(list_transform(generate_series(1, len(a) - 1),
                                 i -> a[i] || ' ' || a[i + 1])) AS pr
    FROM (
      SELECT cnt, list_filter(string_split(sym, ' '), x -> x <> '') AS a
      FROM s{t - 1}
    ) WHERE len(a) >= 2
  ) GROUP BY pr
),
b{t} AS (SELECT pair, n FROM p{t} ORDER BY n DESC, pair LIMIT 1),
s{t} AS (
  SELECT cnt,
         replace(sym, ' ' || b.pair || ' ',
                 ' ' || replace(b.pair, ' ', '') || ' ') AS sym
  FROM s{t - 1}, b{t} b
)"""
        )
    return "".join(parts)


def _bpe_sql() -> str:
    steps = "\nUNION ALL\n".join(
        f"SELECT CAST({t} AS BIGINT) AS step, pair,"
        f" replace(pair, ' ', '') AS merged, n FROM b{t}"
        for t in range(1, BPE_MERGES + 1)
    )
    return f"{_bpe_chain_sql()}\n{steps}"


def _bpe_train_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Run the T-round merge loop; return (per-round winner frames,
    final merged symbol frame). Shared by text_bpe_train (reads the
    winners) and text_bpe_apply (reads the final frame)."""
    from codex_data_products_spark.tables import spread

    docs = T(spark, sf_dir, "documents")
    # ONE corpus pass builds the vocab-grain frequency table; the cut
    # matters because every iteration's best-pair chain re-references
    # it — without it the lazy 4-round loop compiled to THIRTY corpus
    # scans (EXPLAIN_r6 audit). After the checkpoint everything
    # downstream is vocabulary-sized.
    words = (
        spread(docs.select(F.explode(_tokens()).alias("word")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substr(F.col("word"), i, F.lit(1)),
    )
    frame = words.select(
        "cnt",
        F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias(
            "sym"
        ),
    )
    bests = []
    for t in range(1, BPE_MERGES + 1):
        a = F.filter(F.split("sym", " "), lambda x: x != "")
        staged = frame.select("cnt", a.alias("a")).filter(F.size("a") >= 2)
        pair_arr = F.transform(
            F.sequence(F.lit(1), F.size("a") - 1),
            lambda i: F.concat(
                F.element_at("a", i), F.lit(" "), F.element_at("a", i + 1)
            ),
        )
        pairs = (
            staged.select("cnt", F.explode(pair_arr).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("pair")).limit(1)
        bests.append(
            best.select(
                F.lit(t).cast("long").alias("step"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias(
                    "merged"
                ),
                "n",
            )
        )
        frame = frame.crossJoin(F.broadcast(best)).select(
            "cnt",
            F.replace(
                F.col("sym"),
                F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                F.concat(
                    F.lit(" "),
                    F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                    F.lit(" "),
                ),
            ).alias("sym"),
        )
    return bests, frame


@register("text_bpe_train", sql=_bpe_sql())
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    bests, _ = _bpe_train_frames(spark, sf_dir)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out


# ---------------------------------------------------------------------------
# text_bpe_apply — APPLY the trained tokenizer: the symbol-unit
# frequency table after all BPE_MERGES merges, i.e. the vocabulary
# file a text_bpe_train run ships (character units plus the merged
# units, each with its corpus occurrence count weighted by word
# frequency). This closes the train->apply loop: train picks the
# merges, apply reports what the tokenizer actually emits — the
# bytes-per-token / fertility numbers a tokenizer owner reads before
# freezing a vocab. Scale shape: identical to training (ONE corpus
# pass to the vocab-grain word table, then everything is
# vocabulary-sized); the unit explosion fans out by symbols-per-word,
# bounded by word length, and collapses in one hash agg.
# ---------------------------------------------------------------------------

_BPE_APPLY_SQL = f"""{_bpe_chain_sql()}
SELECT u AS symbol,
       CAST(sum(cnt) AS BIGINT)   AS n,
       CAST(length(u) AS BIGINT)  AS sym_len
FROM (
  SELECT cnt,
         unnest(list_filter(string_split(sym, ' '), x -> x <> '')) AS u
  FROM s{BPE_MERGES}
)
GROUP BY u
"""


@register("text_bpe_apply", sql=_BPE_APPLY_SQL)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, frame = _bpe_train_frames(spark, sf_dir)
    units = F.filter(F.split("sym", " "), lambda x: x != "")
    return (
        frame.select("cnt", F.explode(units).alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("cnt").cast("long").alias("n"))
        .select(
            "symbol", "n", F.length("symbol").cast("long").alias("sym_len")
        )
    )


# ---------------------------------------------------------------------------
# text_inverted_index — IR index construction (the posting-list build
# every retrieval corpus ships alongside its embeddings; Zobel &
# Moffat, "Inverted files for text search engines", CSUR 2006): per
# term, document frequency, total term frequency, and the HEAD of the
# doc_id-sorted posting list ("doc:tf,doc:tf,...", first 8). The full
# posting list for a stopword is corpus-sized, so the head is capped
# BEFORE any collection: the rank<=8 filter compiles to
# WindowGroupLimit (per-partition top-k state, never a full posting
# materialization), and df/tf totals come from a plain hash agg on the
# (term, doc) grain — the two vocab-grain frames join at the end.
# ---------------------------------------------------------------------------

_INVIDX_MIN_DF = 5
_INVIDX_HEAD = 8

_INVIDX_SQL = f"""
WITH g AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
  ) GROUP BY term, doc_id
),
stats AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT)  AS total_tf
  FROM g GROUP BY term
  HAVING count(*) >= {_INVIDX_MIN_DF}
),
head AS (
  SELECT term, doc_id, tf
  FROM g
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY doc_id)
          <= {_INVIDX_HEAD}
),
postings AS (
  SELECT term,
         array_to_string(
           list(doc_id || ':' || tf ORDER BY doc_id), ',') AS head_postings
  FROM head GROUP BY term
)
SELECT s.term, s.df, s.total_tf, p.head_postings
FROM stats s JOIN postings p ON s.term = p.term
"""


@register("text_inverted_index", sql=_INVIDX_SQL)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    # g is referenced by BOTH vocab-grain branches (stats and the
    # capped posting heads); materialize it once so the corpus is
    # scanned+exploded once, not per branch — the (term, doc) grain is
    # the index's own size, the thing an index build materializes
    # anyway.
    g = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    stats = (
        g.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .filter(F.col("df") >= _INVIDX_MIN_DF)
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    head = (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _INVIDX_HEAD)
    )
    postings = head.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "tf"))),
                lambda r: F.concat_ws(":", r["doc_id"], r["tf"]),
            ),
            ",",
        ).alias("head_postings")
    )
    return stats.join(postings, "term").select(
        "term", "df", "total_tf", "head_postings"
    )


# ---------------------------------------------------------------------------
# text_pii_redact — the TRANSFORM twin of text_pii_scan: actually
# rewrite the text, replacing every email / IPv4 / phone match with a
# typed placeholder token, and prove the rewrite cross-engine. The
# same deterministic injection gives ground truth; the redacted
# CONTENT itself is checked, not just counts — each row contributes an
# order-independent 32-bit checksum of its redacted text (md5 prefix
# as integer, summed exactly), so a single wrong byte in any rewritten
# document flips the per-source checksum and fails the oracle.
#
# Scale shape: three chained regexp_replace calls, all row-local in
# whole-stage codegen, then one |sources|-grain hash aggregate. The
# redaction pass at 100 TB is a pure map stage — exactly this plan.
# ---------------------------------------------------------------------------

_REDACT_SQL = f"""
WITH h AS (
  SELECT source, text, ((doc_id * 2654435761) % 4294967296) % 10 AS slot,
         doc_id
  FROM documents
),
inj AS (
  SELECT source,
         CASE slot
           WHEN 0 THEN text || ' contact user' || CAST(doc_id % 1000 AS VARCHAR)
                        || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.org'
           WHEN 1 THEN text || ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST(doc_id % 254 AS VARCHAR) || '.7'
           WHEN 2 THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE text
         END AS text
  FROM h
),
red AS (
  SELECT source, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
  FROM inj
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(redacted <> text AS INT)) AS BIGINT) AS docs_redacted,
       CAST(sum(len(regexp_extract_all(redacted, '<EMAIL>|<IP>|<PHONE>'))) AS BIGINT)
         AS n_redactions,
       CAST(sum(length(text) - length(redacted)) AS BIGINT) AS chars_delta,
       CAST(sum(CAST(concat('0x', substring(md5(redacted), 1, 8)) AS BIGINT)) AS BIGINT)
         AS content_checksum
FROM red
GROUP BY source
"""


@register("text_pii_redact", sql=_REDACT_SQL)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    slot = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)) % 10
    did = F.col("doc_id")
    injected = (
        F.when(
            slot == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                (did % 1000).cast("string"),
                F.lit("@example"),
                (did % 7).cast("string"),
                F.lit(".org"),
            ),
        )
        .when(
            slot == 1,
            F.concat(
                F.col("text"),
                F.lit(" host 10."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 254).cast("string"),
                F.lit(".7"),
            ),
        )
        .when(
            slot == 2,
            F.concat(
                F.col("text"),
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(injected, _PII_EMAIL, "<EMAIL>"),
            _PII_IPV4,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    red = docs.select(
        "source", injected.alias("text"), redacted.alias("redacted")
    )
    checksum = F.conv(F.substring(F.md5("redacted"), 1, 8), 16, 10).cast(
        "long"
    )
    return red.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("redacted") != F.col("text")).cast("int"))
        .cast("long")
        .alias("docs_redacted"),
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.col("redacted"), F.lit("<EMAIL>|<IP>|<PHONE>"), F.lit(0)
                )
            )
        )
        .cast("long")
        .alias("n_redactions"),
        F.sum(F.length("text") - F.length("redacted"))
        .cast("long")
        .alias("chars_delta"),
        F.sum(checksum).cast("long").alias("content_checksum"),
    )


# ---------------------------------------------------------------------------
# text_pmi_cooccur — pointwise mutual information over token
# co-occurrence (Church & Hanks 1990), the collocation signal a
# pipeline uses to find multiword expressions and topic structure.
# Restricted to a deterministic top-V document-frequency vocabulary
# (V = 40, ties broken lexicographically) so the pair space is bounded
# by V(V-1)/2 REGARDLESS of corpus size — the discipline that makes
# co-occurrence tractable at 100 TB: the vocabulary is a broadcast-side
# table, each document contributes at most C(V,2) row-local pairs, and
# the final aggregate has at most 780 groups.
#
# Plan: doc-distinct tokens → DF counts (hash agg) → top-V via ONE
# window over the |vocab-candidates| grain — then the corpus is
# re-scanned once, semi-joined against the broadcast vocabulary, and
# self-joined on doc_id (co-located, each side ≤ V rows per doc).
# PMI itself is per-row float math on exact integer counts, round 6.
# ---------------------------------------------------------------------------

_PMI_SQL = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, unnest(list_distinct({_SQL_TOKENS})) AS tok
  FROM documents
),
df AS (
  SELECT tok, count(*) AS c FROM dt GROUP BY tok
),
vocab AS (
  SELECT tok, c FROM df ORDER BY c DESC, tok LIMIT 40
),
dv AS (
  SELECT dt.doc_id, dt.tok, v.c
  FROM dt JOIN vocab v ON v.tok = dt.tok
),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b,
         min(a.c) AS c_a, min(b.c) AS c_b, count(*) AS c_ab
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tok_a, tok_b,
       CAST(c_ab AS BIGINT) AS c_ab,
       CAST(c_a AS BIGINT)  AS c_a,
       CAST(c_b AS BIGINT)  AS c_b,
       round(ln(CAST(c_ab AS DOUBLE) * n_docs / (CAST(c_a AS BIGINT) * c_b)), 6)
         AS pmi
FROM pairs, n
WHERE c_ab >= 3
"""


@register("text_pmi_cooccur", sql=_PMI_SQL)
def text_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens())).alias("tok")
    ).distinct()
    df = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    # orderBy+limit compiles to TakeOrderedAndProject: each task keeps
    # its local top-40, the driver merges — never a single-partition
    # window over the full vocabulary candidate set. Total order
    # (c DESC, tok) is unique, so the cut is deterministic.
    vocab = df.orderBy(F.desc("c"), F.asc("tok")).limit(40)
    dv = dt.join(F.broadcast(vocab), "tok").select("doc_id", "tok", "c")
    a, b = dv.alias("a"), dv.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(
            F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b")
        )
        .agg(
            F.min("a.c").alias("c_a"),
            F.min("b.c").alias("c_b"),
            F.count(F.lit(1)).alias("c_ab"),
        )
    )
    n_docs = docs.count()
    pmi = F.log(
        F.col("c_ab").cast("double")
        * F.lit(n_docs)
        / (F.col("c_a").cast("long") * F.col("c_b"))
    )
    return pairs.filter(F.col("c_ab") >= 3).select(
        "tok_a",
        "tok_b",
        F.col("c_ab").cast("long").alias("c_ab"),
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        F.round(pmi, 6).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# text_quality_logreg — a distributed, fixed-schedule logistic-
# regression quality classifier trained INSIDE the engine: 3 batch
# gradient-descent iterations on two row-local features (scaled length,
# digit ratio) against the declared-language label, then a training-
# accuracy readout — the "fastText-quality-filter" shape (Joulin 2017;
# CCNet's quality LM gate) reduced to its distributed-training core.
# Every iteration is ONE aggregate over the corpus; the weight vector
# is a 1-row broadcast frame, so training is 3 scan+agg rounds and the
# whole job is a static DAG — no collect, no driver loop state.
#
# Cross-engine determinism (the interesting part for an iterative
# float algorithm): the link is the RATIONAL sigmoid
# s(z) = 0.5 + (0.5·z)/(1+|z|) — only +,*,/,abs, all IEEE
# correctly-rounded, so per-row values are bit-identical on both
# engines (a libm exp() would not be). Gradient contributions are
# quantized per-row to DECIMAL(20,8) (the embedding_centroids recipe)
# so the SUM is exact and order-free; the weight update
# w' = w − 0.5·(Σ/n) stays bit-identical because decimal→double cast,
# division and subtraction are all correctly rounded. Weights are only
# display-rounded at the very end.
# ---------------------------------------------------------------------------


def _logreg_sql() -> str:
    feat = """
SELECT CAST(length(text) AS DOUBLE) / 1000 AS x1,
       coalesce(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                / nullif(length(text), 0), 0.0) AS x2,
       CAST(lang = 'en' AS INT) AS y
FROM documents
"""
    parts = [f"WITH f AS ({feat}),",
             "w0 AS (SELECT CAST(0.0 AS DOUBLE) AS w1,"
             " CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS wb)"]
    for k in range(1, 4):
        z = "(w1 * x1 + w2 * x2 + wb)"
        s = f"(0.5 + (0.5 * {z}) / (1 + abs({z})))"
        r = f"({s} - y)"
        parts.append(f""",
g{k} AS (
  SELECT sum(CAST(round({r} * x1, 8) AS DECIMAL(20,8))) AS s1,
         sum(CAST(round({r} * x2, 8) AS DECIMAL(20,8))) AS s2,
         sum(CAST(round({r}, 8) AS DECIMAL(20,8)))      AS sb,
         count(*) AS n
  FROM f, w{k - 1}
),
w{k} AS (
  SELECT w1 - 0.5 * (CAST(s1 AS DOUBLE) / n) AS w1,
         w2 - 0.5 * (CAST(s2 AS DOUBLE) / n) AS w2,
         wb - 0.5 * (CAST(sb AS DOUBLE) / n) AS wb
  FROM g{k}, w{k - 1}
)""")
    z = "(w1 * x1 + w2 * x2 + wb)"
    s = f"(0.5 + (0.5 * {z}) / (1 + abs({z})))"
    parts.append(f""",
acc AS (
  SELECT sum(CAST(CAST({s} >= 0.5 AS INT) = y AS INT)) AS n_correct,
         sum(y) AS n_pos, count(*) AS n
  FROM f, w3
)
SELECT CAST(n AS BIGINT)          AS n_docs,
       CAST(n_pos AS BIGINT)      AS n_pos,
       round(w1, 6)               AS w_len,
       round(w2, 6)               AS w_digit,
       round(wb, 6)               AS w_bias,
       round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy
FROM acc, w3
""")
    return "".join(parts)


_LOGREG_SQL = _logreg_sql()


@register("text_quality_logreg", sql=_LOGREG_SQL)
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    f = docs.select(
        (F.length("text").cast("double") / 1000).alias("x1"),
        F.coalesce(
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit("[0-9]"), F.lit(0))
            ).cast("double")
            / F.nullif(F.length("text"), F.lit(0)),
            F.lit(0.0),
        ).alias("x2"),
        (F.col("lang") == "en").cast("int").alias("y"),
    ).localCheckpoint()

    def z_of(w1, w2, wb):
        return w1 * F.col("x1") + w2 * F.col("x2") + wb

    def sig(z):
        return F.lit(0.5) + (F.lit(0.5) * z) / (F.lit(1) + F.abs(z))

    q = lambda e: F.round(e, 8).cast("decimal(20,8)")  # noqa: E731

    w = spark.range(1).select(
        F.lit(0.0).alias("w1"), F.lit(0.0).alias("w2"), F.lit(0.0).alias("wb")
    )
    for _ in range(3):
        j = f.crossJoin(F.broadcast(w))
        resid = sig(z_of(F.col("w1"), F.col("w2"), F.col("wb"))) - F.col("y")
        g = j.agg(
            F.sum(q(resid * F.col("x1"))).alias("s1"),
            F.sum(q(resid * F.col("x2"))).alias("s2"),
            F.sum(q(resid)).alias("sb"),
            F.count(F.lit(1)).alias("n"),
        )
        w = g.crossJoin(F.broadcast(w)).select(
            (
                F.col("w1") - 0.5 * (F.col("s1").cast("double") / F.col("n"))
            ).alias("w1"),
            (
                F.col("w2") - 0.5 * (F.col("s2").cast("double") / F.col("n"))
            ).alias("w2"),
            (
                F.col("wb") - 0.5 * (F.col("sb").cast("double") / F.col("n"))
            ).alias("wb"),
        )

    j = f.crossJoin(F.broadcast(w))
    pred = (
        sig(z_of(F.col("w1"), F.col("w2"), F.col("wb"))) >= 0.5
    ).cast("int")
    acc = j.agg(
        F.sum((pred == F.col("y")).cast("int")).alias("n_correct"),
        F.sum("y").alias("n_pos"),
        F.count(F.lit(1)).alias("n"),
    )
    return acc.crossJoin(F.broadcast(w)).select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round("w1", 6).alias("w_len"),
        F.round("w2", 6).alias("w_digit"),
        F.round("wb", 6).alias("w_bias"),
        F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias(
            "accuracy"
        ),
    )


# ---------------------------------------------------------------------------
# text_keyphrase_rake — RAKE keyphrase extraction (Rose et al. 2010):
# candidate phrases are maximal stopword-free token runs (capped at 3
# tokens), each word scores degree/frequency where freq counts the
# word's phrase occurrences and degree sums the lengths of the phrases
# it appears in, and a phrase scores the sum of its words' scores.
# Output: the corpus top-10 phrases — the zero-model keyword extractor
# run over crawl corpora before anything learned exists.
#
# Scale shape: tokens explode once; the phrase-run windows partition
# per DOCUMENT (bounded by doc length, never corpus-grain); word stats
# and phrase counts are vocabulary/phrase-grain hash aggs; the final
# phrase score joins the DISTINCT-phrase grain to word stats and folds
# each phrase's <=3 member scores in position order (0.0 + s1 == s1
# exactly, so Spark's explicit-seed fold equals DuckDB's first-element
# list_reduce), making the float sum order-deterministic on both
# engines. Top-10 is a TakeOrdered, never a global sort.
# ---------------------------------------------------------------------------

_RAKE_MAX_LEN = 3

_RAKE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS w
  FROM (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
    FROM documents
  ), unnest(generate_series(1, len(toks))) AS u(i)
),
content AS (
  SELECT doc_id, pos, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rnk
  FROM toks
  WHERE w <> '' AND NOT list_contains({_SQL_STOPLIST}, w)
),
sub AS (
  SELECT doc_id, pos, w, pos - rnk AS isl,
         (row_number() OVER (PARTITION BY doc_id, pos - rnk ORDER BY pos)
          - 1) // {_RAKE_MAX_LEN} AS subisl
  FROM content
),
sub2 AS (
  SELECT doc_id, isl, subisl, w, pos,
         count(*) OVER (PARTITION BY doc_id, isl, subisl) AS plen
  FROM sub
),
wordstats AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM sub2 GROUP BY w
),
phrase_inst AS (
  SELECT doc_id, isl, subisl, string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM sub2 GROUP BY doc_id, isl, subisl
),
phrase_counts AS (
  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM phrase_inst GROUP BY phrase
),
pw AS (
  SELECT phrase, i, pwtoks[i] AS w
  FROM (
    SELECT phrase, regexp_split_to_array(phrase, ' ') AS pwtoks
    FROM phrase_counts
  ), unnest(generate_series(1, len(pwtoks))) AS u(i)
),
scored AS (
  SELECT pw.phrase,
         CAST(len(list(pw.i)) AS BIGINT) AS n_words,
         list_reduce(
           [CAST(0.0 AS DOUBLE)]
             || list(CAST(ws.deg AS DOUBLE) / ws.freq ORDER BY pw.i),
           (a, b) -> a + b
         ) AS score
  FROM pw JOIN wordstats ws ON pw.w = ws.w
  GROUP BY pw.phrase
)
SELECT s.phrase, c.n_occurrences, s.n_words,
       round(s.score, 6) AS score
FROM scored s JOIN phrase_counts c ON s.phrase = c.phrase
ORDER BY s.score DESC, s.phrase
LIMIT 10
"""


@register("text_keyphrase_rake", sql=_RAKE_SQL)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim("text")), r"\s+")
        ).alias("pos", "w"),
    )
    content = (
        toks.filter(
            (F.col("w") != "") & (~F.col("w").isin(_STOPWORDS))
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
        .withColumn("isl", F.col("pos") - F.col("rnk"))
    )
    sub = content.withColumn(
        "subisl",
        F.expr(
            "(row_number() OVER (PARTITION BY doc_id, isl ORDER BY pos)"
            f" - 1) div {_RAKE_MAX_LEN}"
        ),
    )
    sub2 = sub.withColumn(
        "plen",
        F.count(F.lit(1)).over(
            Window.partitionBy("doc_id", "isl", "subisl")
        ),
    )
    wordstats = sub2.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    phrase_inst = sub2.groupBy("doc_id", "isl", "subisl").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda r: r["w"],
            ),
            " ",
        ).alias("phrase")
    )
    phrase_counts = phrase_inst.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    pw = phrase_counts.select(
        "phrase",
        F.posexplode(F.split("phrase", " ")).alias("i", "w"),
    )
    scored = (
        pw.join(wordstats, "w")
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "i",
                                (
                                    F.col("deg").cast("double")
                                    / F.col("freq")
                                ).alias("s"),
                            )
                        )
                    ),
                    lambda r: r["s"],
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("score"),
        )
    )
    return (
        scored.join(phrase_counts, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            "n_words",
            F.round("score", 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# vocab_coverage — tokenizer/vocabulary OOV audit: induce a top-V
# vocabulary from the TRAIN split (doc_id % 5 != 0), then measure each
# TEST doc's out-of-vocabulary token rate. The question every fixed-
# vocab training run asks of new data ("how much of this corpus does my
# vocabulary even cover?"), as one DataFrame.
#
# Determinism: vocabulary selection ranks (count DESC, term ASC) —
# integer-only, so the induced vocab is identical across engines; the
# OOV rate uses the exact-integer dratio.
#
# Scale: the train term count map-side combines to the distinct-term
# grain; the top-V cut is a single-partition window over DISTINCT TERM
# COUNTS (vocabulary-sized input — millions of rows at worst, not the
# corpus; same WindowGroupLimit shape as vocab_top_terms). The V
# survivors broadcast into the test-token scan, so the per-doc OOV agg
# is the only corpus-grain shuffle (by doc_id, map-side combined).
# ---------------------------------------------------------------------------

VOCAB_V = 16  # top-V induced vocabulary


_VOCAB_COVERAGE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
),
train AS (
  SELECT term, count(*) AS c FROM tok WHERE doc_id % 5 <> 0 GROUP BY term
),
vocab AS (
  SELECT term FROM (
    SELECT term, row_number() OVER (ORDER BY c DESC, term) AS rn FROM train
  ) WHERE rn <= {VOCAB_V}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       {sql_dratio('sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)',
                   'count(*)')} AS oov_rate
FROM (SELECT doc_id, term FROM tok WHERE doc_id % 5 = 0) t
LEFT JOIN vocab v USING (term)
GROUP BY t.doc_id
"""


@register("vocab_coverage", sql=_VOCAB_COVERAGE_SQL)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from codex_data_products_spark.functions.compat import dratio

    docs = T(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    train = tok.filter(F.col("doc_id") % 5 != 0).groupBy("term").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy(F.col("c").desc(), "term")
    vocab = (
        train.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= VOCAB_V)
        .select("term")
    )
    test = tok.filter(F.col("doc_id") % 5 == 0)
    oov = F.sum(
        F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    )
    return (
        test.join(
            F.broadcast(vocab.withColumn("in_vocab", F.lit(1))),
            "term",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            oov.cast("long").alias("oov_tokens"),
            dratio(oov, F.count(F.lit(1))).alias("oov_rate"),
        )
    )


@register("vocab_incremental", sql=_VOCAB_SQL)
def vocab_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained-view twin of vocab_top_terms (streaming/text_ivm.py):
    three modulo batches through the vocabulary maintainer (tf and df
    fold additively under append-only fresh doc_ids — two
    delta-vocabulary-sized appends per batch, the corpus text is never
    re-read), snapshot checked against the SAME from-scratch SQL."""
    from codex_data_products_spark.queries.dedup import _ivm_state_dir
    from codex_data_products_spark.streaming.text_ivm import (
        apply_vocab_batch,
        vocab_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("vocab_ivm")
    for k in range(3):
        apply_vocab_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    return vocab_snapshot(spark, state)


def _vocab_sql_where(where: str) -> str:
    """vocab_top_terms oracle over a restricted corpus (removal twin)."""
    return _VOCAB_SQL.replace(
        "FROM documents", f"FROM documents {where}", 1
    )


@register("vocab_removal_incremental", sql=_vocab_sql_where("WHERE doc_id % 7 <> 3"))
def vocab_removal_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary maintainer's REMOVAL path: three insert batches
    then a pure removal batch retracting every doc_id % 7 == 3 — the
    retracted per-term counts are re-derived from the doc-grain token
    log (negative tf/df deltas), so remove == never-ingested under the
    same from-scratch SQL restricted to survivors."""
    from codex_data_products_spark.queries.dedup import _ivm_state_dir
    from codex_data_products_spark.streaming.text_ivm import (
        apply_vocab_batch,
        vocab_snapshot,
    )

    docs = T(spark, sf_dir, "documents")
    state = _ivm_state_dir("vocab_ivm_rm")
    for k in range(3):
        apply_vocab_batch(docs.filter(F.col("doc_id") % 3 == k), state, k)
    victims = [
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 7 == 3)
        .select("doc_id")
        .collect()
    ]
    apply_vocab_batch(docs.limit(0), state, 3, remove=victims)
    return vocab_snapshot(spark, state)
