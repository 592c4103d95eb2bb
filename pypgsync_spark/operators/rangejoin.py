"""Range (interval-containment) join — equi-join only, never a nested
loop.

``range_join(points, intervals)`` matches every point row to every
interval row with ``lo ≤ point ≤ hi`` (closed bounds, the reference's
slice convention — reference utils.py:29-38). Spark plans a raw
``p BETWEEN lo AND hi`` join as BroadcastNestedLoopJoin: every point
compared against every interval. The scalable shape is axis bucketing:

1. pick a bucket width ≥ the widest interval (one metadata-scale
   aggregate over the interval table — intervals are planning output,
   points are the data);
2. each interval explodes to the ≤2 buckets it overlaps, each point
   maps to exactly ONE bucket;
3. equi-join on the bucket id + exact bounds filter. Because a point
   has a single bucket, each (point, interval) pair meets at most
   once — no dedup pass.

Shuffle volume: |points| + ≤2·|intervals| rows, hashed on the bucket
id. Bucket-id skew mirrors the point distribution's time skew;
``slice`` grids are near-uniform by construction. With a caller-chosen
``bucket_width`` the widest-interval aggregate is skipped entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "slice_lo",
    hi_col: str = "slice_hi",
    how: str = "inner",
    bucket_width: int | None = None,
) -> DataFrame:
    """Join ``points`` to the ``intervals`` rows containing them.

    Output columns: all point columns + all interval columns. ``how``
    is ``"inner"`` (drop unmatched points) or ``"left"`` (keep them,
    interval columns NULL). Column names must not overlap.
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"overlapping column names: {sorted(clash)}")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r}")
    if bucket_width is None:
        row = intervals.agg(
            F.max(F.col(hi_col) - F.col(lo_col)).alias("w")
        ).first()
        bucket_width = max(int(row["w"] or 0) + 1, 1)
    ivals = intervals.withColumn(
        _BKT,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    pts = points.withColumn(_BKT, F.floor(F.col(point_col) / bucket_width))
    cond = (
        F.col(point_col) >= F.col(lo_col)
    ) & (F.col(point_col) <= F.col(hi_col))
    joined = pts.join(ivals, on=[_BKT], how="inner").filter(cond).drop(_BKT)
    if how == "inner":
        return joined
    # Unmatched set via ANTI-join against the intervals on the same
    # (bucket, bounds) condition — i.e. "points whose bucket holds no
    # containing interval". Row-identity-exact: a matched point row
    # with NULLs in its payload columns can't sneak back in (the old
    # all-point-columns anti-join was null-UNSAFE and re-emitted such
    # rows as phantom unmatched copies), and duplicate point rows keep
    # their multiplicity. A NULL point value gets a NULL bucket, never
    # equi-matches, and is correctly kept as unmatched.
    p = pts.alias("__rj_p")
    iv = ivals.alias("__rj_i")
    anti_cond = (
        (p[_BKT] == iv[_BKT])
        & (p[point_col] >= iv[lo_col])
        & (p[point_col] <= iv[hi_col])
    )
    unmatched = p.join(iv, anti_cond, "left_anti").drop(_BKT)
    for c in intervals.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return joined.unionByName(unmatched)
