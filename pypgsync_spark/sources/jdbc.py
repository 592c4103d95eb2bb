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

No Postgres is available in the test container, but the statements
these paths render are EXECUTED against a live DuckDB database in
tests: the ON CONFLICT upsert sink in tests/test_upsert_exec.py
(rendered statement applied through a real connection, convergence
asserted) and the slice-scan/CDC source in tests/test_cdc_exec.py
(four micro-batches against a concurrently-upserted table — delta
exactness, checkpoint-restart resume). Only the Postgres wire
protocol itself is untested here; the pure-Spark merge
(:mod:`pypgsync_spark.operators.merge`) is the in-engine equivalent.
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
    conflict_constraint: str | None = None,
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

    ``conflict_constraint`` (postgresql only) switches the conflict
    target from the column list to ``ON CONFLICT ON CONSTRAINT <name>``
    — the exact rendering the reference's
    ``on_conflict_do_update(constraint=table.primary_key)`` produces
    for a reflected (named) PK constraint (reference session.py:140-144).
    """
    if dialect not in UPSERT_DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; one of {UPSERT_DIALECTS}")
    if conflict_constraint and dialect != "postgresql":
        # ADVICE r7: silently falling back to the key-list/implicit
        # target would give a caller pinning the reference's ON
        # CONSTRAINT semantics a DIFFERENT conflict target with no
        # error — refuse loudly, like the unknown-dialect guard.
        raise ValueError(
            f"conflict_constraint is postgresql-only (ON CONFLICT ON "
            f"CONSTRAINT); dialect {dialect!r} cannot render it — pass "
            f"keys instead"
        )
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
        target = (
            f"ON CONSTRAINT {conflict_constraint}"
            if conflict_constraint and dialect == "postgresql"
            else f"({keylist})"
        )
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT {target} {action}"
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


def slice_select_sql(
    table: str, columns: Sequence[str], column: str, dialect: str = "postgresql"
) -> str:
    """The reference's slice read, statement-for-statement (reference
    session.py:126-133): every column, an inclusive BETWEEN pair on the
    version column, ascending ORDER BY — in the psycopg2 pyformat
    paramstyle its SQLAlchemy compile would bind (``%(updated_1)s`` /
    ``%(updated_2)s``). One of these executes per slice, each on its
    own executor cursor under ``spark.read.jdbc(predicates=...)``.
    """
    ph = _PLACEHOLDER.get(dialect, "?")
    lo = f"%({column}_1)s" if ph == "%s" else ph
    hi = f"%({column}_2)s" if ph == "%s" else ph
    collist = ", ".join(f"{table}.{c}" for c in columns)
    return (
        f"SELECT {collist} FROM {table} "
        f"WHERE {table}.{column} >= {lo} AND {table}.{column} <= {hi} "
        f"ORDER BY {table}.{column} ASC"
    )


def window_boundaries_sql(
    table: str, column: str, windowsize: int, dialect: str = "postgresql"
) -> str:
    """The reference's chunk-boundary probe (reference
    session.py:243-292, its ``windowed_query``): global ROW_NUMBER over
    the version column, keep every ``windowsize``-th row — the servers'
    keyset boundaries that let the client fetch chunks without the
    server materializing the whole resultset. The Spark-native
    equivalent is :func:`pypgsync_spark.operators.windowed.
    row_number_boundaries`; this emitter exists for JDBC parity tests.
    """
    ph = _PLACEHOLDER.get(dialect, "?")
    lo = f"%({column}_1)s" if ph == "%s" else ph
    hi = f"%({column}_2)s" if ph == "%s" else ph
    q = (
        f"SELECT anon_1.{column} FROM "
        f"(SELECT {table}.{column} AS {column}, "
        f"row_number() OVER (ORDER BY {table}.{column}) AS rownum "
        f"FROM {table} "
        f"WHERE {table}.{column} >= {lo} AND {table}.{column} <= {hi}) AS anon_1"
    )
    if windowsize > 1:
        q += f" WHERE rownum % {int(windowsize)}=1"
    return q


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
