"""JDBC source/sink — the reference-faithful Postgres edges.

The reference reads each slice with
``SELECT * WHERE updated BETWEEN lo AND hi ORDER BY updated``
(reference session.py:127-133) and writes with batched
``INSERT ... ON CONFLICT (pk) DO UPDATE`` (reference session.py:135-151).

Spark-native mapping:
- read: ``spark.read.jdbc`` with either ``partitionColumn/lowerBound/
  upperBound/numPartitions`` (uniform ranges) or explicit
  ``predicates=`` rendered from a :class:`~pypgsync_spark.plans.SlicePlan`
  (the reference's EXPLAIN-estimated slices). Each predicate becomes one
  parallel executor-side cursor — the reference's chunked fetch
  (session.py:67-81) without the hand-rolled pagination.
- write: Spark's JDBC writer has no upsert mode, so the sink is a
  ``foreachPartition`` that issues multi-row ``INSERT ... ON CONFLICT``
  statements. Executors write in parallel; idempotent on PK, so retries
  are safe (the reference's crash-resume property, README.md:90).

No Postgres is available in the test container — these paths are
exercised only at the SQL-text level in tests; the pure-Spark merge
(:mod:`pypgsync_spark.operators.merge`) is the tested equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from pypgsync_spark.plans.intervals import SlicePlan


def read_range_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    lower: int,
    upper: int,
    num_partitions: int,
    properties: dict[str, str] | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Partitioned JDBC range scan: Spark's native form of the
    reference's slice machinery (uniform split of [lower, upper])."""
    props = {"fetchsize": str(fetchsize), **(properties or {})}
    return spark.read.jdbc(
        url=url,
        table=table,
        column=column,
        lowerBound=lower,
        upperBound=upper,
        numPartitions=num_partitions,
        properties=props,
    )


def read_with_slice_plan(
    spark: SparkSession,
    url: str,
    table: str,
    column: str,
    plan: SlicePlan,
    properties: dict[str, str] | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """JDBC scan partitioned by an explicit slice plan (one predicate
    per ~10M-row slice, reference session.py:236-240)."""
    props = {"fetchsize": str(fetchsize), **(properties or {})}
    return spark.read.jdbc(
        url=url, table=table, predicates=plan.jdbc_predicates(column), properties=props
    )


# Parameter placeholder style per DB-API driver family.
_PLACEHOLDER = {
    "postgresql": "%s",  # psycopg2 pyformat
    "mysql": "%s",  # mysqlclient / pymysql
    "sqlite": "?",  # qmark
    "duckdb": "?",  # qmark
}

UPSERT_DIALECTS = ("postgresql", "sqlite", "duckdb", "mysql", "merge")


def upsert_sql(
    table: str,
    columns: Sequence[str],
    keys: Sequence[str],
    dialect: str = "postgresql",
) -> str:
    """Render the reference's upsert statement (session.py:135-144) for
    a target dialect:

    - ``postgresql`` / ``sqlite`` / ``duckdb``:
      ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col = excluded.col``
      (the reference's literal Postgres form; SQLite and DuckDB share
      the ``excluded`` pseudo-table).
    - ``mysql``: ``INSERT ... AS excluded ON DUPLICATE KEY UPDATE
      col = excluded.col`` (8.0.19+ row alias; conflict target is the
      table's PK/unique key, not listable).
    - ``merge``: ANSI/SQL-Server/Oracle-style
      ``MERGE INTO ... USING (VALUES ...) WHEN (NOT) MATCHED`` —
      the portable fallback.

    When every column is a key the update clause degrades to the
    dialect's no-op form (``DO NOTHING`` / ``col = col``), keeping the
    statement idempotent.
    """
    if dialect not in UPSERT_DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {UPSERT_DIALECTS}")
    ph = _PLACEHOLDER.get(dialect, "?")
    collist = ", ".join(columns)
    placeholders = ", ".join([ph] * len(columns))
    keylist = ", ".join(keys)
    nonkey = [c for c in columns if c not in keys]
    if dialect in ("postgresql", "sqlite", "duckdb"):
        action = (
            "DO UPDATE SET " + ", ".join(f"{c} = excluded.{c}" for c in nonkey)
            if nonkey
            else "DO NOTHING"
        )
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT ({keylist}) {action}"
        )
    if dialect == "mysql":
        updates = ", ".join(
            f"{c} = excluded.{c}" for c in (nonkey or keys[:1])
        ) or f"{keys[0]} = {keys[0]}"
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"AS excluded ON DUPLICATE KEY UPDATE {updates}"
        )
    # ANSI MERGE
    src_cols = ", ".join(columns)
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in nonkey)
    ins_vals = ", ".join(f"s.{c}" for c in columns)
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if nonkey else ""
    return (
        f"MERGE INTO {table} t USING (VALUES ({placeholders})) AS s ({src_cols}) "
        f"ON {on} {matched}"
        f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({ins_vals})"
    )


def write_upsert(
    df: DataFrame,
    dsn: str,
    table: str,
    keys: Sequence[str],
    batch_size: int = 10_000,
    dialect: str = "postgresql",
) -> None:
    """Upsert ``df`` into Postgres from the executors.

    Each partition opens one connection and streams ``execute_batch``
    upserts — the distributed version of the reference's chunked writer
    (session.py:145-154, batch mode session.py:83-86). Requires
    psycopg2 on the executors; raises ImportError otherwise.
    """
    columns = df.columns
    sql = upsert_sql(table, columns, keys, dialect=dialect)

    def write_partition(rows) -> None:
        import psycopg2  # gated: not in the test container
        from psycopg2.extras import execute_batch

        conn = psycopg2.connect(dsn)
        try:
            with conn.cursor() as cur:
                batch: list[tuple] = []
                for row in rows:
                    batch.append(tuple(row[c] for c in columns))
                    if len(batch) >= batch_size:
                        execute_batch(cur, sql, batch)
                        batch.clear()
                if batch:
                    execute_batch(cur, sql, batch)
            conn.commit()
        finally:
            conn.close()

    df.foreachPartition(write_partition)


def attrs_to_jdbc_url(
    user: str, passwd: str, host: str, port: str | int, db: str
) -> tuple[str, dict[str, str]]:
    """Connection attributes → (JDBC url, properties) — the Spark form
    of the reference's ``attrs_to_uri`` (reference utils.py:5-13,
    including its all-arguments-present ValueError). Credentials ride
    in the properties dict, not the URL: ``spark.read.jdbc(url,
    properties=...)`` is the API shape, and URLs end up in logs/plans
    where passwords must not.
    """
    vals = {"user": user, "passwd": passwd, "host": host, "port": port, "db": db}
    if any(str(v) == "" for v in vals.values()):
        raise ValueError("All arguments must be present.")
    url = f"jdbc:postgresql://{host}:{port}/{db}"
    props = {"user": user, "password": passwd, "driver": "org.postgresql.Driver"}
    return url, props
