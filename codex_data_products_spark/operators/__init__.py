"""Reusable operator library: generic, column-parameterized building
blocks behind the named queries in ``codex_data_products_spark.queries``.

Modules:
  * ``multimodal`` — binary-payload (image/audio/video) decode /
    resize / frame-sample plumbing over ``mapInPandas``;
  * ``dedup`` — shingling, simhash, cosine, exact/near-dup cores;
  * ``text`` — tokenization, quality ratios, fingerprint, lang scores;
  * ``joins`` — bucketed co-located joins, salted skew joins, generic
    as-of join;
  * ``timeseries`` — resampling with gap fill.
"""
