"""Catalog builder — reference Entry A (`make_uuids_tsv.py main()`,
SURVEY.md §3.1) as one lazy Spark DAG over recorded search hits.

The reference POSTs an Elasticsearch bool query and flattens the hit
JSON row-at-a-time into parallel Python lists (make_uuids_tsv.py:63-156).
Here the network fetch is a driver-side boundary that yields raw hit
JSON strings (recorded-fixture mode in tests — no network); everything
after is declarative:

  * `from_json` with a declared schema (E12) instead of per-hit dict
    gets with defaults;
  * the ES predicates (F8: dataset_type, data_access_level,
    must_not-exists next_revision_uuid) become `.filter` expressions, so
    the same plan is correct whether or not the remote side already
    filtered;
  * donor metadata (P2) is explode → pivot over the seven grouping
    concepts — `Sex`/`Race`/`Cause of Death` take the concept's
    preferred term, the numeric concepts take `data_value`
    (make_uuids_tsv.py:119-150) — instead of a 50-line per-hit scan;
  * both `organ_donor_data` and `living_donor_data` feed the pivot
    (the reference scans whichever exists);
  * the TSV sink (K3) writes an explicit `row_id` column replicating
    the pandas index column the downstream join later drops
    (bin/concatenate.py:303).

At catalog scale (≤10k datasets per query — the reference's ES `size`
cap) this is all one narrow stage plus one tiny pivot shuffle; it exists
so catalog handling composes with the big pipeline, not for raw speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

# Declared hit schema (E12) — the fields the reference actually reads
# (make_uuids_tsv.py:77-102), everything else pruned at parse time.
DONOR_CONCEPT = Ty.StructType(
    [
        Ty.StructField("grouping_concept_preferred_term", Ty.StringType()),
        Ty.StructField("preferred_term", Ty.StringType()),
        Ty.StructField("data_value", Ty.StringType()),
    ]
)

HIT_SOURCE = Ty.StructType(
    [
        Ty.StructField("uuid", Ty.StringType()),
        Ty.StructField("hubmap_id", Ty.StringType()),
        Ty.StructField("dataset_type", Ty.StringType()),
        Ty.StructField("data_access_level", Ty.StringType()),
        Ty.StructField("next_revision_uuid", Ty.StringType()),
        Ty.StructField("origin_samples_unique_mapped_organs", Ty.ArrayType(Ty.StringType())),
        Ty.StructField("immediate_ancestor_ids", Ty.ArrayType(Ty.StringType())),
        Ty.StructField("immediate_descendant_ids", Ty.ArrayType(Ty.StringType())),
        Ty.StructField(
            "donor",
            Ty.StructType(
                [
                    Ty.StructField(
                        "metadata",
                        Ty.StructType(
                            [
                                Ty.StructField(
                                    "organ_donor_data", Ty.ArrayType(DONOR_CONCEPT)
                                ),
                                Ty.StructField(
                                    "living_donor_data", Ty.ArrayType(DONOR_CONCEPT)
                                ),
                            ]
                        ),
                    )
                ]
            ),
        ),
    ]
)

HIT_SCHEMA = Ty.StructType([Ty.StructField("_source", HIT_SOURCE)])

# The seven donor grouping concepts and their output columns
# (make_uuids_tsv.py:105-156). "term" concepts export the preferred
# term; "value" concepts export the numeric data value.
DONOR_CONCEPTS = {
    "Age": ("age", "value"),
    "Sex": ("sex", "term"),
    "Body Height": ("height", "value"),
    "Body Mass": ("weight", "value"),
    "Body Mass Index": ("bmi", "value"),
    "Cause of Death": ("cause_of_death", "term"),
    "Race": ("race", "term"),
}


def parse_hits(spark: SparkSession, hit_json: list[str] | DataFrame) -> DataFrame:
    """Raw hit JSON strings → typed hits frame (one row per dataset)."""
    if isinstance(hit_json, list):
        raw = spark.createDataFrame([(s,) for s in hit_json], "raw string")
    else:
        raw = hit_json
    return raw.select(
        F.from_json("raw", HIT_SCHEMA).alias("hit")
    ).select("hit._source.*")


def filter_catalog_predicates(
    hits: DataFrame, organ: str | None = None
) -> DataFrame:
    """F8: the ES bool-query predicates as post-ingest filters
    (make_uuids_tsv.py:15-34)."""
    out = hits.filter(
        (F.col("dataset_type") == "CODEX")
        & (F.col("data_access_level") == "public")
        & F.col("next_revision_uuid").isNull()
    )
    if organ is not None:
        out = out.filter(
            F.array_contains("origin_samples_unique_mapped_organs", organ)
        )
    return out


def _donor_pivot(hits: DataFrame) -> DataFrame:
    """P2: array-of-concept-structs → seven fixed donor columns."""
    concepts = F.concat(
        F.coalesce(
            F.col("donor.metadata.organ_donor_data"),
            F.array().cast(Ty.ArrayType(DONOR_CONCEPT)),
        ),
        F.coalesce(
            F.col("donor.metadata.living_donor_data"),
            F.array().cast(Ty.ArrayType(DONOR_CONCEPT)),
        ),
    )
    exploded = hits.select(
        "uuid", F.explode_outer(concepts).alias("c")
    ).select(
        "uuid",
        F.col("c.grouping_concept_preferred_term").alias("concept"),
        F.col("c.preferred_term").alias("term"),
        F.col("c.data_value").alias("value"),
    )
    picked = exploded.select(
        "uuid",
        "concept",
        F.when(
            F.col("concept").isin(
                *[k for k, (_, kind) in DONOR_CONCEPTS.items() if kind == "term"]
            ),
            F.col("term"),
        )
        .otherwise(F.col("value"))
        .alias("v"),
    )
    pivoted = (
        picked.groupBy("uuid")
        .pivot("concept", list(DONOR_CONCEPTS))
        .agg(F.first("v", ignorenulls=True))
    )
    renames = [F.col("uuid")] + [
        F.col(f"`{concept}`").alias(out_name)
        for concept, (out_name, _) in DONOR_CONCEPTS.items()
    ]
    return pivoted.select(*renames)


def _first_or_null(arr: Column) -> Column:
    return F.when(F.size(arr) > 0, F.element_at(arr, 1))


def build_catalog(
    spark: SparkSession,
    hit_json: list[str] | DataFrame,
    organ_map: dict[str, str] | None = None,
    organ: str | None = None,
) -> DataFrame:
    """The uuids catalog table: one row per dataset with lineage + donor
    metadata (the frame `bin/concatenate.py:347` consumes as uuids.tsv)."""
    hits = filter_catalog_predicates(parse_hits(spark, hit_json), organ=organ)
    base = hits.select(
        "uuid",
        "hubmap_id",
        # ancestor[0]; descendants list-or-null (empty list → null,
        # make_uuids_tsv.py:85-90) — F2 downstream tests isNull
        _first_or_null(F.col("immediate_ancestor_ids")).alias(
            "immediate_ancestor_ids"
        ),
        F.when(
            F.size("immediate_descendant_ids") > 0,
            F.concat_ws(",", "immediate_descendant_ids"),
        ).alias("immediate_descendant_ids"),
        _first_or_null(F.col("origin_samples_unique_mapped_organs")).alias(
            "organ"
        ),
        "donor",
    )
    donor = _donor_pivot(hits)
    out = (
        base.drop("donor")
        .join(donor, "uuid", "left")
        .withColumn("age", F.col("age").cast("double"))
    )
    if organ_map:
        organ_df = F.broadcast(
            spark.createDataFrame(
                list(organ_map.items()), "organ_code string, organ_description string"
            )
        )
        out = out.join(
            organ_df, out["organ"] == organ_df["organ_description"], "left"
        ).drop("organ_description")
    return out


def write_catalog_tsv(catalog: DataFrame, path: str) -> None:
    """K3: single TSV with the explicit row_id column standing in for the
    pandas index the reference serializes (make_uuids_tsv.py:176-182)."""
    from pyspark.sql import Window

    w = Window.orderBy("uuid")
    (
        catalog.withColumn("row_id", F.row_number().over(w) - 1)
        .select("row_id", *[c for c in catalog.columns])
        .coalesce(1)
        .write.mode("overwrite")
        .options(sep="\t", header=True)
        .csv(path)
    )
