"""Composed pipelines (the reference's CWL entry points, Spark-first)."""
