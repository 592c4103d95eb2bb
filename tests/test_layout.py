"""Z-order clustering (sources/layout.py): multi-dimension row-group
skipping measured from parquet footer stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.functions.time import to_millis
from pypgsync_spark.sources.layout import write_zordered, zorder_key_fixed


def _skip_fraction(path_glob: str, column: str, lo, hi) -> float:
    """Fraction of row groups a [lo, hi] predicate can SKIP from
    min/max stats alone — what the scan's row-group pruning does."""
    total = skipped = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skipped += 1
    assert total > 0
    return skipped / total


def _events(spark, sf_small):
    return (
        load_table(spark, sf_small, "events")
        .withColumn("updated_ms", to_millis("ts"))
        .select("event_id", "user_id", "updated_ms", "value")
    )


def test_zorder_skips_on_both_dimensions(spark, sf_small, tmp_path):
    df = _events(spark, sf_small)
    lo_ms, hi_ms = (
        df.agg(F.min("updated_ms"), F.max("updated_ms")).first()
    )
    n_users = df.agg(F.max("user_id")).first()[0]
    zpath = str(tmp_path / "zorder")
    write_zordered(
        df,
        zpath,
        cols=[("user_id", 0, float(n_users)), ("updated_ms", float(lo_ms), float(hi_ms))],
        n_files=32,
    )
    # baseline: time-sorted layout (the natural ingest order) — tight in
    # ts, useless for user_id predicates
    tpath = str(tmp_path / "tsorted")
    df.repartitionByRange(32, "updated_ms").sortWithinPartitions(
        "updated_ms"
    ).write.parquet(tpath)

    # a narrow user slice (one key of the ~15 in the fixture): z-order
    # must skip most groups, time-sort none
    u_lo, u_hi = 12, 12
    z_user = _skip_fraction(f"{zpath}/*.parquet", "user_id", u_lo, u_hi)
    t_user = _skip_fraction(f"{tpath}/*.parquet", "user_id", u_lo, u_hi)
    assert z_user >= 0.5, f"z-order should skip most groups on user_id, got {z_user}"
    assert t_user == 0.0, "time-sorted layout cannot skip on user_id"

    # and z-order still skips on TIME for a narrow window (it traded a
    # little ts-tightness for user-tightness, not all of it)
    span = hi_ms - lo_ms
    z_ts = _skip_fraction(
        f"{zpath}/*.parquet", "updated_ms", lo_ms, lo_ms + span // 20
    )
    assert z_ts >= 0.25, f"z-order lost too much time-locality: {z_ts}"

    # content is intact
    assert spark.read.parquet(zpath).count() == df.count()


def test_zorder_key_monotone_in_each_dim(spark):
    """Fixing all other dims, growing one dim never decreases the
    z-value (bit interleave is order-preserving per dimension)."""
    rows = [(x, 7) for x in range(0, 1000, 50)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = zorder_key_fixed([("a", 0, 1000), ("b", 0, 1000)], bits=8)
    got = [r[0] for r in df.select(z.alias("z")).orderBy(F.col("a")).collect()]
    assert got == sorted(got)


def test_zorder_many_columns_stays_in_sign_safe_range(spark):
    """r10 review: bits=16 with 4 columns put bit 15*4+3 = 63 — the
    SIGN bit — so upper-range rows went negative and sorted first;
    5+ columns wrapped shifts mod 64, aliasing high bits onto low
    positions. The interleave now auto-reduces per-column precision to
    63 // n_cols, keeping each grid's HIGH bits."""
    from pypgsync_spark.sources.layout import zorder_key_fixed

    for n_cols in (4, 5):
        cols = [(f"c{i}", 0.0, 100.0) for i in range(n_cols)]
        rows = [tuple([0.0] * n_cols), tuple([50.0] * n_cols), tuple([100.0] * n_cols)]
        df = spark.createDataFrame(rows, [c for c, _, _ in cols])
        z = [
            r["z"]
            for r in df.select(zorder_key_fixed(cols, bits=16).alias("z")).collect()
        ]
        assert all(v >= 0 for v in z), f"negative z at n_cols={n_cols}: {z}"
        # the curve still orders corner points coarsely: all-lo < all-mid < all-hi
        assert z[0] < z[1] < z[2]
