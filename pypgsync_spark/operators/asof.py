"""As-of (temporal) join — the canonical operator Spark's join zoo
lacks.

For each left row, find the single right row with the greatest
``right_ts`` ≤ ``left_ts`` (backward; forward = smallest ≥) within the
same key group. The naive formulation — a range-predicate join +
per-left-row argmax — plans as BroadcastNestedLoopJoin + a second
aggregation shuffle: O(|L|·|R|) comparisons per key, unusable at scale.

This implementation is the union+window formulation (the same shape
MergeJoin-based ASOF executors use internally):

1. tag right rows (carrying only the requested payload columns) and
   left rows, union them into one stream;
2. ONE shuffle on the join keys, sort within each partition by
   ``(ts, side)`` — side ordered so that at equal timestamps the right
   row lands before the left for inclusive matches, after it for
   strict;
3. each left row picks ``last(payload, ignorenulls)`` over the
   running window — exactly the latest qualifying right row — then the
   right rows are dropped.

Cost: one hash exchange + one sort, identical to a plain windowed
aggregation on the key; no nested loop, no skew beyond what the key
distribution already has. ``tolerance`` bounds the lookback without
changing the plan (the match is nulled out afterwards, column-side).

Determinism: if several right rows share ``(key, ts)``, pre-collapse
them (e.g. ``latest_per_key``) — the window's tie order between them
is otherwise partition-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_LEFT = "__asof_left"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the payload of its closest
    qualifying right row (NULLs when none).

    - ``on``: equality keys (both sides).
    - ``left_ts`` / ``right_ts``: ordering columns (``right_ts``
      defaults to ``left_ts``'s name).
    - ``value_cols``: right columns to attach (default: all non-key,
      non-ts right columns). Names must not collide with left columns.
    - ``direction``: ``"backward"`` (right_ts ≤ left_ts, the default)
      or ``"forward"`` (right_ts ≥ left_ts).
    - ``strict``: exclude exact-timestamp matches (< / > instead of
      ≤ / ≥).
    - ``tolerance``: maximum allowed ``|left_ts − right_ts|``; farther
      matches come back as NULL (same units as the ts columns).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    right_ts = right_ts or left_ts
    keys = list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    # side ordering at equal ts: inclusive wants the right row BEFORE
    # the left (so last() sees it), strict wants it after.
    r_side, l_side = (0, 1) if not strict else (1, 0)
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    # SQL join semantics: NULL keys never match (NULL = NULL is not
    # true; DuckDB's ASOF oracle agrees). Window.partitionBy would
    # happily group NULL keys into one partition, so NULL-key right
    # rows (and NULL-ts ones, which have no position on the axis) are
    # dropped up front — left rows with NULL keys ride through and get
    # a NULL payload, exactly like an unmatched left-join row.
    non_null = F.lit(True)
    for k in [*keys, right_ts]:
        non_null = non_null & F.col(k).isNotNull()
    right = right.filter(non_null)
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.lit(r_side).alias(_SIDE),
        payload.alias(_PAYLOAD),
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias(_TS),
        F.lit(l_side).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LEFT),
    )
    unioned = r.withColumn(_LEFT, F.lit(None).cast(l.schema[_LEFT].dataType)).unionByName(l)

    # NULLS FIRST in BOTH directions (r10 review): a left row with a
    # NULL timestamp has no position on the axis and must match
    # nothing (SQL/DuckDB ASOF semantics). Ascending order defaults to
    # nulls-first, but descending defaults to nulls-LAST — which
    # placed NULL-ts left rows after every right row, and
    # last(ignorenulls) handed them the smallest-ts payload.
    order = [F.col(_TS).asc_nulls_first(), F.col(_SIDE).asc()]
    if direction == "forward":
        order = [F.col(_TS).desc_nulls_first(), F.col(_SIDE).asc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == l_side)

    if tolerance is not None:
        gap = F.abs(F.col(_TS) - F.col(_PAYLOAD)["__rts"])
        matched = matched.withColumn(
            _PAYLOAD, F.when(gap <= F.lit(tolerance), F.col(_PAYLOAD))
        )
    return matched.select(
        *[F.col(_LEFT)[c].alias(c) for c in left.columns],
        *[F.col(_PAYLOAD)[c].alias(c) for c in value_cols],
    )
