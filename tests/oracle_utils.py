"""Local mirror of the driver's DuckDB-oracle comparison.

The comparison core now ships with the engine itself
(``codex_data_products_spark.oracle`` — also exposed as ``cli.py
verify``); this module re-exports it for the test suite. Stricter than
the driver: values are compared exactly (after sorting columns by name
and rows by value), so any cross-engine nondeterminism fails here
before it fails in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

from codex_data_products_spark.oracle import (  # noqa: F401
    canonical_rows,
    compare_frames,
    run_oracle,
)
