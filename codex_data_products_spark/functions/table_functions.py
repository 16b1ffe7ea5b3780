"""Python UDTFs — the SQL-surface table functions (Spark 4 ``udtf``).

These give SQL users ``LATERAL ngrams(text, 8)`` composition — the
surface a warehouse exposes as table functions. They are the UDF-TAX
path (per-row Python, like the explicitly-labeled ``*_pandas`` demos):
the production shingle/explode pipelines in queries/dedup.py and
queries/text.py stay on JVM ``transform``+``explode`` expressions.
Registered here so both the tax and the contract are pinned by tests
(tests/test_table_functions.py asserts UDTF output == the JVM
expression path, row for row).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="gram string, pos int")
class Ngrams:
    """Whitespace n-grams of ``text`` with their 0-based positions."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        toks = text.lower().strip().split()
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]), i)


@udtf(returnType="field string, value string")
class ParseProps:
    """Explode a ``k=v;k=v`` properties string into rows — the classic
    log-parsing table function."""

    def eval(self, props: str):
        if not props:
            return
        for part in props.split(";"):
            if "=" in part:
                k, v = part.split("=", 1)
                yield (k.strip(), v.strip())


def register_udtfs(spark) -> None:
    """Register the SQL table-function surface on a session."""
    spark.udtf.register("ngrams", Ngrams)
    spark.udtf.register("parse_props", ParseProps)
