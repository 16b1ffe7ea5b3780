"""Registry-wide output-schema gate.

The external correctness driver canonicalizes every query's output with a
pandas ``sort_values`` over all columns before hashing; a nested-typed
column (array/map/struct) makes that canonicalizer throw
``TypeError: unhashable type``.  Round 1 shipped exactly two such queries
(``array_functions``/``map_functions``) and both turned into red
CORRECTNESS rows.  This test pins the contract: every registered query's
output schema is scalar-only, so any future driver sample is
nested-type-safe by construction.  Nested types stay legal *inside* a
plan — only the output boundary must serialize (``F.array_join`` etc.,
pattern at queries/aggregates.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from codex_data_products_spark import registry

registry.load_all()

ALL_QUERIES = sorted(registry.QUERIES)

_NESTED = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_output_schema_is_scalar_only(spark, sf_dir, name):
    schema = registry.QUERIES[name](spark, sf_dir).schema
    nested = [f.name for f in schema.fields if isinstance(f.dataType, _NESTED)]
    assert not nested, (
        f"{name} outputs nested-typed columns {nested}; serialize them at "
        "the output boundary (F.array_join / to_json) so the driver's "
        "canonicalizer can hash rows"
    )
