"""Entry-A catalog builder: JSON flatten, predicate filters, donor pivot,
organ lookup, TSV sink — on recorded fixtures (no network)."""

from __future__ import annotations

import glob
import json

from codex_data_products_spark.plans.catalog import (
    build_catalog,
    write_catalog_tsv,
)


def _hit(uuid, *, organ_donor=None, living_donor=None, descendants=None,
         ancestors=None, dataset_type="CODEX", access="public",
         next_rev=None, organs=("Kidney (Left)",)):
    return json.dumps(
        {
            "_source": {
                "uuid": uuid,
                "hubmap_id": f"HBM-{uuid}",
                "dataset_type": dataset_type,
                "data_access_level": access,
                "next_revision_uuid": next_rev,
                "origin_samples_unique_mapped_organs": list(organs),
                "immediate_ancestor_ids": ancestors or [f"anc-{uuid}"],
                "immediate_descendant_ids": descendants or [],
                "donor": {
                    "metadata": {
                        "organ_donor_data": organ_donor,
                        "living_donor_data": living_donor,
                    }
                },
            }
        }
    )


def _concept(concept, term=None, value=None):
    return {
        "grouping_concept_preferred_term": concept,
        "preferred_term": term,
        "data_value": value,
    }


FIXTURE = [
    _hit(
        "d1",
        organ_donor=[
            _concept("Age", value="61"),
            _concept("Sex", term="Female"),
            _concept("Race", term="White"),
            _concept("Cause of Death", term="Anoxia"),
            _concept("Body Mass Index", value="27.4"),
        ],
    ),
    _hit(
        "d2",
        living_donor=[
            _concept("Age", value="38"),
            _concept("Sex", term="Male"),
            _concept("Body Height", value="180"),
            _concept("Body Mass", value="82"),
        ],
        descendants=["child-1"],
    ),
    _hit("d3"),  # no donor metadata at all
    _hit("d4", dataset_type="LC-MS"),  # filtered: wrong type
    _hit("d5", access="protected"),  # filtered: not public
    _hit("d6", next_rev="new-uuid"),  # filtered: superseded revision
]


def test_build_catalog_flatten_and_filters(spark):
    cat = build_catalog(
        spark, FIXTURE, organ_map={"LK": "Kidney (Left)"}
    ).orderBy("uuid")
    rows = {r["uuid"]: r for r in cat.collect()}
    # ES predicates dropped d4/d5/d6
    assert sorted(rows) == ["d1", "d2", "d3"]

    d1 = rows["d1"]
    assert d1["age"] == 61.0 and d1["sex"] == "Female"
    assert d1["race"] == "White" and d1["cause_of_death"] == "Anoxia"
    assert d1["bmi"] == "27.4" and d1["height"] is None
    assert d1["organ_code"] == "LK"
    # empty descendants list → null (F2's leaf test relies on this)
    assert d1["immediate_descendant_ids"] is None
    assert d1["immediate_ancestor_ids"] == "anc-d1"

    d2 = rows["d2"]  # living_donor_data feeds the same pivot
    assert d2["sex"] == "Male" and d2["height"] == "180"
    assert d2["immediate_descendant_ids"] == "child-1"

    d3 = rows["d3"]  # absent donor arrays → all-null donor columns
    assert d3["age"] is None and d3["race"] is None


def test_catalog_organ_filter(spark):
    mixed = FIXTURE + [_hit("d7", organs=("Heart",))]
    cat = build_catalog(spark, mixed, organ="Heart")
    assert [r["uuid"] for r in cat.collect()] == ["d7"]


def test_catalog_tsv_sink(spark, tmp_path):
    cat = build_catalog(spark, FIXTURE)
    out = str(tmp_path / "LK.tsv")
    write_catalog_tsv(cat, out)
    (part,) = glob.glob(f"{out}/part-*.csv")
    with open(part) as f:
        header = f.readline().strip().split("\t")
        body = [line.strip().split("\t") for line in f]
    assert header[0] == "row_id"
    assert [r[0] for r in body] == ["0", "1", "2"]
    assert {r[header.index("uuid")] for r in body} == {"d1", "d2", "d3"}
