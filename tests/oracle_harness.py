"""Local differential-oracle harness mirroring the driver's compare:
row count + column names + order-insensitive value hash between each
Spark query and its DuckDB oracle over the same parquet fixtures.

Values are normalized before hashing: floats rendered ROUND-TRIP
EXACT (%.17g — r10 review: the old 9-significant-digit form equated
doubles ~1e7 ulps apart, so it would have passed the exact 1-ulp
sqrt-vs-pow divergence class the driver's bit-exact hash fails on),
None/NaN unified, rows sorted by their full string form with columns
in name order. A pass here therefore predicts the driver's hash-match
for float kernels too; the repo's round-to-6 discipline means
correctly-written queries are already bit-identical across engines.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from pypgsync_spark.catalog import TABLES, table_path


def _norm_value(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.17g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_value(r[i]) for i in order) for r in rows)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def compare(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    # Driver-contract guard (r7 lesson, a18): the driver's pandas-based
    # canonicalizer cannot hash array/map-typed cells — a query that
    # ships one ERRORS its sweep row, which is worse than no row.
    # Oracle-checked queries must serialize nested shapes (array_join /
    # to_json) before returning; rows-only queries are exempt because
    # the driver only counts them.
    bad = [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    if bad:
        return False, (
            f"driver-unhashable column types (array/map/struct): {bad} — "
            "serialize with array_join/to_json or register rows-only"
        )
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    try:
        res = con.execute(oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    finally:
        con.close()
    if sorted(scols) != sorted(dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    sn = _norm_rows(scols, srows)
    dn = _norm_rows(dcols, drows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(srows)} rows)"
