"""Text-analysis operator library — column-expression builders shared by
the registered text queries (``queries/text.py``) and the curation
pipeline. Everything stays JVM-side (split/filter/transform/md5), no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str = "text") -> Column:
    """Lowercased whitespace tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str = "text") -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_ratio(
    stopwords: list[str], col: Column | str = "text", scale: int = 6
) -> Column:
    toks = tokens(col)
    arr = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    return F.round(n_stop.cast("double") / F.size(toks), scale)


def type_token_ratio(col: Column | str = "text", scale: int = 6) -> Column:
    toks = tokens(col)
    return F.round(
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks), scale
    )


def fingerprint(col: Column | str = "text") -> Column:
    """Canonical-form fingerprint: md5 of sorted distinct tokens."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def lang_scores(
    markers: dict[str, list[str]], col: Column | str = "text"
) -> dict[str, Column]:
    """Per-language marker-token hit counts (argmax = predicted lang)."""
    toks = tokens(col)
    out = {}
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    return out
