"""Cross-engine verification: run a registered query on Spark AND its
ANSI-SQL oracle on DuckDB over the same parquet tables, and compare
exactly (columns sorted by name, rows sorted by value, floats by repr).

This ships as part of the engine — ``cli.py verify`` — so a user
switching from the reference can audit every query against an
independent engine on their own data directory. ``tests/oracle_utils``
re-exports these for the test suite; the external driver runs the same
comparison shape to produce CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from codex_data_products_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Execute oracle SQL on DuckDB with every table registered as a
    view over ``{sf_dir}/{table}.parquet``."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(
    spark_df: pd.DataFrame, oracle_df: pd.DataFrame
) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(
            f"row counts differ: spark={len(spark_df)} oracle={len(oracle_df)}"
        )
    s_rows = canonical_rows(spark_df)
    o_rows = canonical_rows(oracle_df)
    if s_rows != o_rows:
        o_set = set(o_rows)
        s_set = set(s_rows)
        only_spark = [r for r in s_rows if r not in o_set][:3]
        only_oracle = [r for r in o_rows if r not in s_set][:3]
        problems.append(
            f"values differ; sample spark-only={only_spark} "
            f"oracle-only={only_oracle}"
        )
    return problems


# ---------------------------------------------------------------------------
# Distributed fingerprint compare (VERDICT r6 #2): an order-insensitive
# digest computed INSIDE each engine — Spark aggregates executor-side,
# DuckDB aggregates over the oracle subquery — so a 250M-row result is
# verified without ever materializing onto the driver. The digest is
# (row count, sum of two independent 60-bit row hashes): multiplicity-
# sensitive, order-insensitive, collision odds ~2^-120 per query.
#
# The hard part is a row canonicalization BYTE-IDENTICAL across engines.
# Strings/ints/decimals/dates/booleans cast identically; timestamps are
# formatted to fixed 6-digit micros on both sides. Doubles are the trap:
# Java's Formatter pads the shortest repr with zeros while C's printf
# rounds the true binary expansion (0.1 -> ...0000e-01 vs ...0001e-01),
# so NO printf-style format is portable. Instead each engine decomposes
# the double into its exact IEEE-754 fields with exact float arithmetic:
# e = floor(log2(|x|)) (corrected ±1 against exact power-of-two
# comparison), mantissa52 = (|x| / 2^e - 1) * 2^52 — every step is a
# power-of-two scale, so the arithmetic is exact and the (sign, e, m52)
# triple is the bit pattern, engine-independently.
# ---------------------------------------------------------------------------

_NULL_MARK = "\x00N"
_CELL_SEP = "\x1f"
_ELEM_SEP = "\x1e"
_M52 = 4503599627370496.0  # 2^52


def _spark_ieee_canon(c):
    from pyspark.sql import functions as F

    ax = F.abs(c)
    e0 = F.floor(F.log2(ax)).cast("int")
    r0 = ax / F.pow(F.lit(2.0), e0.cast("double"))
    e = (
        F.when(r0 >= 2.0, e0 + F.lit(1))
        .when(r0 < 1.0, e0 - F.lit(1))
        .otherwise(e0)
    )
    m = ax / F.pow(F.lit(2.0), e.cast("double"))
    m52 = F.round((m - F.lit(1.0)) * F.lit(_M52)).cast("long")
    body = F.concat(
        F.when(c < 0, F.lit("-")).otherwise(F.lit("")),
        e.cast("string"),
        F.lit(":"),
        m52.cast("string"),
    )
    return (
        # NaN canonicalizes like NULL — mirrors the exact comparator's
        # _norm_cell, where both map to '∅' (pandas can't distinguish a
        # NULL double from NaN, so neither may the fingerprint)
        F.when(F.isnan(c), F.lit(_NULL_MARK))
        .when(c == F.lit(float("inf")), F.lit("inf"))
        .when(c == F.lit(float("-inf")), F.lit("-inf"))
        .when(c == F.lit(0.0), F.lit("0"))
        .otherwise(body)
    )


def _spark_canon(c, dtype, force_double=False):
    """Canonical string for one Spark column/element; never NULL."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if force_double or isinstance(dtype, (T.DoubleType, T.FloatType)):
        out = _spark_ieee_canon(c.cast("double"))
    elif isinstance(
        dtype, (T.TimestampType, T.TimestampNTZType)
    ):
        out = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(dtype, T.ArrayType):
        inner = _spark_canon_elem(dtype.elementType)
        out = F.concat(
            F.lit("["),
            F.array_join(F.transform(c, inner), _ELEM_SEP),
            F.lit("]"),
        )
    elif isinstance(
        dtype,
        (
            T.StringType, T.BooleanType, T.DateType, T.DecimalType,
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        ),
    ):
        out = c.cast("string")
    else:
        raise ValueError(f"fingerprint: unsupported Spark type {dtype}")
    return F.coalesce(out, F.lit(_NULL_MARK))


def _spark_canon_elem(elem_type):
    def fn(e):
        return _spark_canon(e, elem_type)

    return fn


def spark_digest(spark_df, force_double=frozenset()) -> tuple[int, int, int]:
    """(count, sum h1, sum h2) computed entirely executor-side."""
    from pyspark.sql import functions as F

    cols = sorted(spark_df.columns)
    canon = [
        _spark_canon(
            F.col(c), spark_df.schema[c].dataType, c in force_double
        )
        for c in cols
    ]
    h = F.md5(F.concat_ws(_CELL_SEP, *canon))
    row = spark_df.select(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("decimal(38,0)").alias("h1"),
        F.conv(F.substring(h, 17, 15), 16, 10).cast("decimal(38,0)").alias("h2"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("h1"), F.lit(0)).alias("s1"),
        F.coalesce(F.sum("h2"), F.lit(0)).alias("s2"),
    ).collect()[0]
    return int(row["n"]), int(row["s1"]), int(row["s2"])


def _duck_ieee_canon(x: str) -> str:
    ax = f"abs({x})"
    e0 = f"CAST(floor(log2({ax})) AS INT)"
    r0 = f"({ax} / power(2.0, CAST({e0} AS DOUBLE)))"
    e = (
        f"(CASE WHEN {r0} >= 2.0 THEN {e0} + 1 "
        f"WHEN {r0} < 1.0 THEN {e0} - 1 ELSE {e0} END)"
    )
    m = f"({ax} / power(2.0, CAST({e} AS DOUBLE)))"
    m52 = f"CAST(round(({m} - 1.0) * {_M52!r}) AS BIGINT)"
    body = (
        f"concat(CASE WHEN {x} < 0 THEN '-' ELSE '' END, "
        f"CAST({e} AS VARCHAR), ':', CAST({m52} AS VARCHAR))"
    )
    return (
        # NaN -> NULL-mark, mirroring the exact comparator (see the
        # Spark twin above). The explicit IS NULL arm matters: DuckDB's
        # concat SKIPS null arguments instead of nulling out, so a null
        # input would otherwise leak through the ELSE body as ':'.
        f"(CASE WHEN {x} IS NULL THEN NULL "
        f"WHEN isnan({x}) THEN chr(0) || 'N' "
        f"WHEN isinf({x}) AND {x} > 0 THEN 'inf' "
        f"WHEN isinf({x}) THEN '-inf' "
        f"WHEN {x} = 0.0 THEN '0' ELSE {body} END)"
    )


def _duck_canon(x: str, duck_type: str, force_double: bool = False) -> str:
    """Canonical-string SQL for one DuckDB column/element; never NULL."""
    t = duck_type.upper()
    if force_double or t in ("DOUBLE", "FLOAT", "REAL"):
        out = _duck_ieee_canon(f"CAST({x} AS DOUBLE)")
    elif t.startswith("TIMESTAMP"):
        out = f"strftime({x}, '%Y-%m-%d %H:%M:%S.%f')"
    elif t.endswith("[]"):
        inner = _duck_canon("__e", t[:-2])
        out = (
            f"('[' || array_to_string(list_transform({x}, __e -> {inner}), "
            f"chr(30)) || ']')"
        )
    elif (
        t.startswith("DECIMAL")
        or t in (
            "VARCHAR", "BOOLEAN", "DATE", "TINYINT", "SMALLINT", "INTEGER",
            "BIGINT", "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
            "UBIGINT",
        )
    ):
        out = f"CAST({x} AS VARCHAR)"
    else:
        raise ValueError(f"fingerprint: unsupported DuckDB type {duck_type}")
    return f"COALESCE({out}, chr(0) || 'N')"


def duckdb_digest(
    sql: str, sf_dir: str, force_double=frozenset()
) -> tuple[list[str], tuple[int, int, int]]:
    """(column names, (count, sum h1, sum h2)) computed entirely inside
    DuckDB."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql})").fetchall()
    cols = sorted((name, dtype) for name, dtype, *_ in desc)
    canon = ", ".join(
        _duck_canon(f'"{c}"', t, c in force_double) for c, t in cols
    )
    n, s1, s2 = con.execute(
        f"""
        WITH __q AS ({sql}),
        __rows AS (SELECT md5(concat_ws(chr(31), {canon})) AS __h FROM __q)
        SELECT count(*),
               COALESCE(sum(CAST(CAST('0x' || substr(__h, 1, 15) AS BIGINT)
                                 AS HUGEINT)), 0),
               COALESCE(sum(CAST(CAST('0x' || substr(__h, 17, 15) AS BIGINT)
                                 AS HUGEINT)), 0)
        FROM __rows
        """
    ).fetchone()
    return [c for c, _ in cols], (int(n), int(s1), int(s2))


def fingerprint_compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Digest-level compare: schema (column names), row count, and the
    order-insensitive value fingerprint — nothing reaches the driver but
    three integers per engine.

    Type-class reconciliation: the exact comparator goes through pandas,
    which silently converts DuckDB DECIMAL (and NULL-bearing integer)
    columns to float64 — so a query can be exact-equal while the two
    engines DECLARE different types for a column. Wherever either engine
    says floating, both sides canonicalize the column as double (the
    casts are exact for every value pandas would have accepted)."""
    from pyspark.sql import types as T

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    duck_types = {
        name: dtype
        for name, dtype, *_ in con.execute(
            f"DESCRIBE SELECT * FROM ({oracle_sql})"
        ).fetchall()
    }
    con.close()
    spark_float = {
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    }
    duck_float = {
        c
        for c, t in duck_types.items()
        if t.upper() in ("DOUBLE", "FLOAT", "REAL")
    }
    force = spark_float | duck_float

    o_cols, (o_n, o_h1, o_h2) = duckdb_digest(
        oracle_sql, sf_dir, force_double=force
    )
    if sorted(spark_df.columns) != o_cols:
        return [
            f"columns differ: spark={sorted(spark_df.columns)} "
            f"oracle={o_cols}"
        ]
    s_n, s_h1, s_h2 = spark_digest(spark_df, force_double=force)
    problems: list[str] = []
    if s_n != o_n:
        problems.append(f"row counts differ: spark={s_n} oracle={o_n}")
    if (s_h1, s_h2) != (o_h1, o_h2):
        problems.append(
            f"fingerprints differ: spark=({s_h1},{s_h2}) "
            f"oracle=({o_h1},{o_h2})"
        )
    return problems


def verify_queries(
    spark,
    sf_dir: str,
    names: list[str] | None = None,
    progress: bool = False,
    mode: str = "exact",
) -> dict[str, list[str]]:
    """Run each registered query and its oracle; map name → problems
    (empty list = match; queries without an oracle are skipped).
    ``progress`` streams one line per query as it finishes, so a long
    sweep that dies mid-run still attributes the failure.

    ``mode="fingerprint"`` compares order-insensitive digests computed
    inside each engine instead of materializing both result sets onto
    the driver — the stress-SF path where a result can be hundreds of
    millions of rows. Queries whose result types the fingerprint can't
    canonicalize fall back to the exact compare (and are small by
    construction — only scalar/array-typed wide results get huge)."""
    from codex_data_products_spark import registry

    registry.load_all()
    targets = names or sorted(registry.ORACLES)
    results: dict[str, list[str]] = {}
    for name in targets:
        if name not in registry.ORACLES:
            continue
        # a query that errors (e.g. a result set too large for the
        # driver-side comparison at an extreme stress SF) must record
        # its own failure, not abort the remaining sweep
        try:
            sdf = registry.QUERIES[name](spark, sf_dir)
            if mode == "fingerprint":
                try:
                    results[name] = fingerprint_compare(
                        sdf, registry.ORACLES[name], sf_dir
                    )
                except ValueError:
                    results[name] = compare_frames(
                        sdf.toPandas(),
                        run_oracle(registry.ORACLES[name], sf_dir),
                    )
            else:
                results[name] = compare_frames(
                    sdf.toPandas(), run_oracle(registry.ORACLES[name], sf_dir)
                )
        except Exception as exc:  # noqa: BLE001
            first = str(exc).splitlines()[0][:200] if str(exc) else repr(exc)
            results[name] = [f"error: {first}"]
        finally:
            # several registry terminals persist corpus-scale frames
            # that must stay cached while THEIR result is consumed
            # (ADVICE r8) — after this query's compare they are dead
            # weight for the remaining sweep, so drop them here
            spark.catalog.clearCache()
        if progress:
            status = "MATCH" if not results[name] else "MISMATCH"
            print(f"{status:8s} {name}", flush=True)
    return results
