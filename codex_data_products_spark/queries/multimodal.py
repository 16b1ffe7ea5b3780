"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs (per the environment contract),
so the *decode* step is a deterministic fake — but the Spark-side
plumbing is real: a binary column flows through an Arrow-batched
``mapInPandas`` with a declared output schema, exactly how a production
decode/feature-extract stage runs (one file/payload per row, batch-wise
Python, no driver collect). See ``operators/multimodal.py`` for the
library version with the NotImplementedError-gated real-codec hook.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codex_data_products_spark.registry import register
from codex_data_products_spark.tables import table as T

_BINARY_SQL = """
SELECT
  doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text)                                  AS payload_md5
FROM documents
"""


@register("multimodal_binary_meta", sql=_BINARY_SQL)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat text as an opaque binary payload; extract metadata via an
    Arrow-batched pandas stage (the decode-stub pattern for images)."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def extract_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return docs.mapInPandas(
        extract_meta, schema="doc_id long, n_bytes long, payload_md5 string"
    )
