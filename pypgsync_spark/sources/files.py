"""File-format sources/sinks beyond parquet.

The reference is JDBC-only (docker-compose Postgres, reference
docker-compose.yml:4-13); the Spark engine's primary substrate is
parquet (SURVEY §2.1 S7). This module rounds out the file-format
surface — ORC, CSV, JSON, line-text, XML — behind one pair of entry points
so every engine query can run over any of them.

Scale notes (the reason this is an explicit layer, not ad-hoc
``spark.read.format(...)`` calls):

- **Columnar stays columnar**: parquet/ORC get vectorized readers,
  predicate + column pushdown and row-group/stripe min-max skipping.
  They are the only formats the engine recommends for the 100 TB path.
- **Schema-explicit text formats**: CSV/JSON schema *inference* reads
  the whole input once before the real scan — at scale that doubles
  the IO. ``read_table`` therefore requires an explicit schema for
  csv/json unless ``infer=True`` is passed (fixture-scale
  convenience). With an explicit schema, both formats stream-split by
  line boundaries and parallelize like any other source.
- **Compression**: splittability dies with gzip (one task per file);
  the writer defaults keep parquet/ORC block-compressed (snappy/zstd)
  and leave text formats uncompressed so they stay splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json", "text", "xml")

# Formats whose reader performs full predicate/column pushdown and
# vectorized decode — the recommended substrate at scale.
COLUMNAR = ("parquet", "orc")

# Microsecond-precision text round-trips need BOTH format knobs: Spark
# routes TIMESTAMP (LTZ) through ``timestampFormat`` but TIMESTAMP_NTZ —
# what parquet isAdjustedToUTC=false columns (e.g. the events fixture)
# load as — through the separate ``timestampNTZFormat``; leaving the
# NTZ one at its default silently truncates to milliseconds on write.
_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}

_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", **_TS_OPTS},
    "json": {**_TS_OPTS},
    # Spark 4 ships the (former spark-xml) XML source built in; the
    # row/root tags must agree between writer and reader.
    "xml": {"rowTag": "row", **_TS_OPTS},
}

_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "parquet": {"compression": "snappy"},
    "orc": {"compression": "zstd"},
    "csv": {"header": "true", **_TS_OPTS},
    "json": {**_TS_OPTS},
    "xml": {"rootTag": "rows", "rowTag": "row", **_TS_OPTS},
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """Read ``path`` in any supported format.

    csv/json/xml demand an explicit ``schema`` (or ``infer=True`` to
    accept the extra full-input inference pass — fixture-scale only).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.options(**{**_READ_DEFAULTS.get(fmt, {}), **options})
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json", "xml"):
        if not infer:
            raise ValueError(
                f"{fmt} at scale needs an explicit schema "
                "(pass schema=..., or infer=True to scan the input twice)"
            )
        reader = reader.option("inferSchema", "true")
    return reader.format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    sort_within_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    """Write ``df`` in any supported format.

    ``partition_by`` lays out hive-style directories (the engine's
    partition-pruning lever — the Spark analogue of the reference's
    BRIN time-range reasoning, reference README.md:295-299);
    ``sort_within_by`` sorts rows within each output file so row-group
    min-max skipping works on those keys (Z-order-lite for one key).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    writer = df.write.options(**{**_WRITE_DEFAULTS.get(fmt, {}), **options}).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
