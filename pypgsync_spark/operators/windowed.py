"""Windowed range query — the reference's signature sub-windowing trick.

The reference numbers rows with ``ROW_NUMBER() OVER (ORDER BY col)``,
keeps rows where ``rownum % windowsize = 1``, and turns consecutive
boundary values into half-open range predicates so the server never
materializes the full result set (reference session.py:242-308, the
SQLAlchemy-wiki "WindowedRangeQuery" pattern).

Spark doesn't need this to bound memory — executors stream partitions —
but the operator is part of the reference's query surface, and the
boundary list is exactly what ``spark.read.jdbc(predicates=...)``
wants, so it earns its keep as a JDBC-partitioning planner.

Scale note: a global (unpartitioned) ``row_number`` collapses to a
single task. ``window_boundaries`` therefore offers an exact windowed
path for moderate data and an ``approx`` path using
``approxQuantile`` (Greenwald-Khanna, fully distributed) for the
100 TB case, where boundaries only need to be *about* every N rows —
the same tolerance the reference accepts from its EXPLAIN estimates
(reference session.py:219-234).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def row_number_boundaries(df: DataFrame, column: str, window_size: int) -> DataFrame:
    """Every-Nth-row boundary values of ``column`` (exact, global sort).

    Returns DataFrame(column, rownum) for rows where
    ``(rownum - 1) % window_size == 0`` — i.e. rows 1, N+1, 2N+1, ...
    (reference session.py:273-292 keeps ``rownum % N == 1``; same set
    for N > 1 and fixture-faithful for the oracle).
    """
    w = Window.orderBy(F.col(column))
    # (rownum - 1) % N == 0, not rownum % N == 1: identical for N > 1
    # but correct for window_size=1 (every row), where the reference
    # guards windowsize > 1 (session.py:290-292) and the modulo form
    # would silently return nothing.
    return (
        df.select(column)
        .withColumn("rownum", F.row_number().over(w))
        .filter((F.col("rownum") - 1) % window_size == 0)
    )


def window_boundaries(
    df: DataFrame, column: str, window_size: int, approx: bool = False
) -> list[int | float]:
    """Sorted boundary values of ``column``, one per ~``window_size`` rows.

    ``approx=True`` uses distributed quantile sketches instead of the
    single-task global sort — the scale path.
    """
    if approx:
        n = df.count()
        if n == 0:
            return []
        k = max(1, n // window_size)
        probs = [i / k for i in range(k)]
        return df.stat.approxQuantile(column, probs, 0.001)
    return [r[column] for r in row_number_boundaries(df, column, window_size).collect()]


def half_open_ranges(
    boundaries: list[int | float],
) -> list[tuple[int | float, int | float | None]]:
    """Boundary values → half-open ``[start, end)`` ranges, final range
    unbounded (reference session.py:264-271, ``interval_to_expr``)."""
    out: list[tuple[int | float, int | float | None]] = []
    for i, start in enumerate(boundaries):
        end = boundaries[i + 1] if i + 1 < len(boundaries) else None
        out.append((start, end))
    return out


def filter_half_open(df: DataFrame, column: str, start, end) -> DataFrame:
    """``column >= start AND (column < end OR end IS None)`` — P4."""
    cond = F.col(column) >= start
    if end is not None:
        cond = cond & (F.col(column) < end)
    return df.filter(cond)
