"""Reusable operator library: generic, column-parameterized building
blocks behind the named queries in ``codex_data_products_spark.queries``.

Modules:
  * ``multimodal`` — binary-payload (image/audio/video) decode /
    resize / frame-sample plumbing over ``mapInPandas``;
  * the dedup / similarity / text cores live in their query modules and
    are imported from there (they are already generic over DataFrames).
"""
