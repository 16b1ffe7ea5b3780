"""codex-data-products-spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of ``hubmapconsortium/codex-data-products`` (surveyed in
SURVEY.md), extended with the operators a large-scale training-data
pipeline needs: deduplication, similarity search, text analysis, and
multimodal-column plumbing.

Design principles (see SURVEY.md §4):
  * DataFrame/SQL API only — Catalyst plans, Tungsten executes.
  * Expression-first: built-in ``pyspark.sql.functions`` in the hot path;
    Arrow-batched pandas UDFs only at genuine boundaries (HDF5 decode,
    multimodal binary decode).
  * Broadcast small dimensions; shuffle only on true fact-fact joins.
  * Deterministic, oracle-checkable semantics (explicit rounding, explicit
    tie-breaks, portable md5-based hashing).
"""

__version__ = "0.1.0"
