"""Dedup operator library — the reusable cores behind the registered
dedup queries, importable for pipeline composition.

All operators take/return DataFrames and are corpus-agnostic (any frame
with an id column and a text column can be fed through ``selectExpr``
renames). The registered queries in ``queries/dedup.py`` bind them to
the ``documents`` table and carry the DuckDB oracles; the composed
curation pipeline (``plans/training_pipeline.py``) chains them.

  * ``shingle_table(docs, k)``          — distinct k-token shingles
  * ``simhash_frame(docs)``             — 32-bit row-local simhash
  * ``cosine_expr(a, b)``               — deterministic cosine column
  * ``exact_dedup_keepers(docs)``       — one survivor per exact hash
  * ``neardup_losers(docs, max_h)``     — banded simhash near-dup ids
"""

from __future__ import annotations

from codex_data_products_spark.plans.training_pipeline import (  # noqa: F401
    exact_dedup_keepers,
    neardup_losers,
)
from codex_data_products_spark.queries.dedup import (  # noqa: F401
    cosine_expr,
    shingle_table,
    simhash_frame,
)
