"""Hashed-key vs exact-string-key agreement (VERDICT r11 #4, HASH_KEYS.md).

Round 11 moved several equality-only key domains from strings/md5 to
``xxhash64`` longs. Where the hash is only a candidate key, collisions
cost a wasted verification; where the hash IS the answer (positional
gram occurrence counts, packed-set jaccard, the stop-shingle DF cap,
split_contamination gram matches), a collision silently changes
results. These tests lock the hashed path against an exact
string-keyed reference on an ADVERSARIAL fixture: a tiny alphabet with
boundary-shift tokens, permutations, repeated tokens and shared
prefixes, maximizing near-miss key density so any keying error that
conflates distinct windows (not just a literal 64-bit collision, which
no fixture can produce on purpose) shows up as an output diff.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codex_data_products_spark.queries.dedup import (
    SHINGLE_DF_CAP,
    _coverage_per_doc,
    _frequent_shingles_removed,
    _jaccard_for_pairs,
    duplicated_positions,
    positional_grams,
)

# Deterministic adversarial corpus: every doc is a whitespace-joined
# token stream over {a, b, aa, ab, ba, "a b"-style boundary traps}.
# Docs are built so that shifted windows, permuted windows, and
# windows whose CONCATENATION (without separators) would be equal all
# occur — the classic failure modes of a weak/ambiguous key.
_ALPHABET = ["a", "b", "aa", "ab", "ba", "aab", "abb", "bba"]


def _adversarial_docs(n_docs: int = 120, n_toks: int = 24) -> list[tuple]:
    rows = []
    for d in range(n_docs):
        toks = [
            _ALPHABET[(d * 7 + i * (1 + d % 3) + (i * i) % 5) % len(_ALPHABET)]
            for i in range(n_toks)
        ]
        # force cross-doc repeats: every 4th doc shares its first half
        # with doc d-4 (duplicated spans), every 6th reverses it
        # (permutation trap: same multiset, different order)
        if d % 4 == 0 and d >= 4:
            toks[: n_toks // 2] = [
                _ALPHABET[((d - 4) * 7 + i * (1 + (d - 4) % 3) + (i * i) % 5)
                          % len(_ALPHABET)]
                for i in range(n_toks // 2)
            ]
        if d % 6 == 0:
            toks = toks[::-1]
        rows.append((d, " ".join(toks)))
    # boundary traps: token streams whose space-free concatenations
    # collide pairwise ("ab a" vs "a ba") — a key that ignored token
    # boundaries would merge their windows
    trap_base = ["ab a ab a ab a ab a ab a", "a ba a ba a ba a ba a ba"]
    for i, t in enumerate(trap_base):
        rows.append((n_docs + i, " ".join([t] * 3)))
    return rows


@pytest.fixture(scope="module")
def adv_docs(spark):
    return spark.createDataFrame(
        _adversarial_docs(), "doc_id long, text string"
    ).localCheckpoint()


def _exact_positional_grams(docs, k):
    """positional_grams with the pre-r11 exact string key."""
    toks = F.col("toks")
    windows = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(toks, i, k)).alias("g"),
        ),
    )
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        docs.filter(F.size(t) >= k)
        .select("doc_id", t.alias("toks"))
        .select("doc_id", F.size(toks).alias("n"), F.explode(windows).alias("w"))
        .select("doc_id", "n", F.col("w.pos").alias("pos"), F.col("w.g").alias("g"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_positional_gram_coverage_matches_exact_key(spark, adv_docs):
    """The substring family's answer-bearing domain: coverage computed
    from xxhash64 gram keys == coverage from exact string keys."""
    k = 4  # small k => dense window overlap on the tiny alphabet
    hashed = _coverage_per_doc(
        duplicated_positions(positional_grams(adv_docs, k=k).persist()), k=k
    )
    exact = _coverage_per_doc(
        duplicated_positions(_exact_positional_grams(adv_docs, k=k).persist()),
        k=k,
    )
    assert _rows(hashed) == _rows(exact)
    # sanity: the fixture actually exercises duplication
    assert hashed.filter(F.col("dup_tokens") > 0).count() > 0
    # and the hashed key space is collision-free here: distinct hashed
    # grams == distinct string grams
    n_hashed = (
        positional_grams(adv_docs, k=k).select("g").distinct().count()
    )
    n_exact = (
        _exact_positional_grams(adv_docs, k=k).select("g").distinct().count()
    )
    assert n_hashed == n_exact


def _shingles(docs, k=3):
    """(doc_id, shingle) distinct string shingles (mirrors shingle_table
    at a smaller k for window density)."""
    t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    toks = F.col("toks")
    sh = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return (
        docs.filter(F.size(t) >= k)
        .select("doc_id", t.alias("toks"))
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def test_packed_set_jaccard_matches_exact_strings(spark, adv_docs):
    """_jaccard_for_pairs packs xxhash64(shingle) sets; the jaccard it
    computes must equal the exact string-set jaccard per pair."""
    sh = _shingles(adv_docs).persist()
    ids = sh.select("doc_id").distinct()
    cand = (
        ids.alias("x")
        .join(ids.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
    )
    hashed = _jaccard_for_pairs(cand, sh)

    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("_shs"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("_shs").alias("_sa"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("_shs").alias("_sb"))
    n_common = F.size(F.array_intersect("_sa", "_sb"))
    exact = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                n_common.cast("double")
                / (F.size("_sa") + F.size("_sb") - n_common),
                6,
            ).alias("jaccard"),
        )
    )
    assert _rows(hashed) == _rows(exact)
    assert hashed.filter(F.col("jaccard") > 0).count() > 0


def test_df_cap_removal_matches_exact_strings(spark, adv_docs):
    """The stop-shingle DF cap aggregates document frequency on the
    hashed key; the surviving (doc_id, shingle) set must equal the
    exact string-keyed cap."""
    # k=2 for density, plus one FORCED hot shingle present in every doc
    # so the cap (df > 100) demonstrably fires on the 122-doc fixture
    import codex_data_products_spark.queries.dedup as dd

    hot = adv_docs.select("doc_id", F.lit("hot tok").alias("shingle"))
    sh = _shingles(adv_docs, k=2).unionByName(hot).distinct().persist()

    hashed = _frequent_shingles_removed(sh)
    frequent = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("shingle")
    )
    exact = sh.join(F.broadcast(frequent), "shingle", "left_anti")
    assert _rows(hashed.select("doc_id", "shingle")) == _rows(
        exact.select("doc_id", "shingle")
    )
    # the fixture must actually trip the cap for the test to mean much
    assert frequent.count() > 0, (
        f"fixture too small to exceed SHINGLE_DF_CAP={dd.SHINGLE_DF_CAP}"
    )


def test_contamination_gram_matches_exact_strings(spark, adv_docs):
    """split_contamination's core: the set of (test_doc, train_doc,
    n_overlap) gram matches under hashed 8-gram keys == under exact
    string keys."""
    k = 4

    def grams(key_fn):
        t = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        toks = F.col("toks")
        sh = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: key_fn(toks, i),
        )
        return (
            adv_docs.filter(F.size(t) >= k)
            .select(
                "doc_id",
                F.when(F.col("doc_id") % 5 == 0, "test")
                .otherwise("train")
                .alias("split"),
                t.alias("toks"),
            )
            .select("doc_id", "split", F.explode(sh).alias("g"))
            .distinct()
        )

    def matches(g):
        te = g.filter(F.col("split") == "test").select(
            F.col("doc_id").alias("test_doc"), "g"
        )
        tr = g.filter(F.col("split") == "train").select(
            F.col("doc_id").alias("train_doc"), "g"
        )
        return (
            te.join(tr, "g")
            .groupBy("test_doc", "train_doc")
            .agg(F.count(F.lit(1)).alias("n_overlap"))
        )

    hashed = matches(grams(lambda toks, i: F.xxhash64(F.slice(toks, i, k))))
    exact = matches(
        grams(lambda toks, i: F.concat_ws(" ", F.slice(toks, i, k)))
    )
    assert _rows(hashed) == _rows(exact)
    assert hashed.count() > 0
