"""Epoch-millis time semantics.

The reference stores all event times as BIGINT epoch millis
(`created`/`updated`/`certified_by_user`, README.md:134-137) and stamps
watermarks with ``int(time.time()*1000)`` (reference pypgsync.py:13);
its SQL uses ``extract(epoch from now()) * 1000`` (README.md:148).

Spark mapping: ``unix_millis``/``timestamp_millis`` round-trip, with the
session pinned to UTC so results agree with DuckDB's UTC-naive
timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_millis(ts: Column | str) -> Column:
    """timestamp → BIGINT epoch millis (F1/F5).

    Casts TIMESTAMP_NTZ through TIMESTAMP first (``unix_millis`` only
    accepts the LTZ type); the session is pinned to UTC, so an NTZ
    wall-clock maps to the same instant DuckDB's UTC-naive timestamps
    produce.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_millis(c.cast("timestamp"))


def from_millis(ms: Column | str) -> Column:
    """BIGINT epoch millis → timestamp (F5)."""
    return F.timestamp_millis(F.col(ms) if isinstance(ms, str) else ms)


def now_millis_col() -> Column:
    """``extract(epoch from now()) * 1000`` (README.md:148)."""
    return F.unix_millis(F.current_timestamp())


def millis_age_seconds(later_ms: Column, earlier_ms: Column) -> Column:
    """``(later - earlier) / 1000`` seconds — the README Q3c interval
    arithmetic (README.md:299,306) done as integer math, which is the
    DuckDB-oracle-friendly normalization chosen in SURVEY §2.8/F4."""
    return (later_ms - earlier_ms) / F.lit(1000)
