"""SQL table functions (Python UDTFs): surface + parity with the JVM path."""

from __future__ import annotations

from pyspark.sql import functions as F

from codex_data_products_spark.functions.table_functions import register_udtfs


def test_ngrams_udtf_matches_jvm_transform_path(spark, sf_dir):
    register_udtfs(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("docs_tf")
    got = {
        (r["doc_id"], r["gram"], r["pos"])
        for r in spark.sql(
            "SELECT d.doc_id, g.gram, g.pos"
            " FROM docs_tf d, LATERAL ngrams(d.text, 3) g"
        ).collect()
    }
    # production path: JVM transform+explode (queries/dedup idiom)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.struct(
            F.array_join(F.slice(toks, i, 3), " ").alias("gram"),
            (i - 1).cast("int").alias("pos"),
        ),
    )
    want = {
        (r["doc_id"], r["g"]["gram"], r["g"]["pos"])
        for r in docs.select(
            "doc_id", F.explode(grams).alias("g")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_parse_props_udtf(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT p.field, p.value FROM (SELECT 'a=1;b= x ;bad;c=d=e' AS s) t,"
        " LATERAL parse_props(t.s) p"
    ).collect()
    assert {(r["field"], r["value"]) for r in rows} == {
        ("a", "1"),
        ("b", "x"),
        ("c", "d=e"),
    }
