"""File-format source/sink round-trips (SURVEY §2.1 S7).

Every supported format must carry a fixture table through
write → read → identical rows; csv/json must refuse schema-less reads
(the at-scale footgun) and honor an explicit schema exactly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pypgsync_spark.catalog import load_table
from pypgsync_spark.sources.files import COLUMNAR, read_table, write_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json", "xml"])
def test_roundtrip_preserves_rows_and_schema(spark, sf_small, tmp_path, fmt):
    src = load_table(spark, sf_small, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_roundtrip_timestamps_and_decimals(spark, sf_small, tmp_path):
    """The lossy-prone types: TIMESTAMP and floats through text formats."""
    src = load_table(spark, sf_small, "events").select(
        "event_id", "ts", "value"
    )
    for fmt in ("csv", "json", "xml"):
        path = str(tmp_path / f"ev_{fmt}")
        write_table(src, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt, schema=src.schema)
        assert _rows(back) == _rows(src), fmt


def test_schemaless_text_formats_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path / "x"), fmt="csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path / "x"), fmt="xml")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path / "x"), fmt="avro")


def test_partitioned_layout_prunes(spark, sf_small, tmp_path):
    """partition_by writes hive-style dirs and a key predicate prunes
    to one directory (PartitionFilters in the scan)."""
    src = load_table(spark, sf_small, "orders").withColumn(
        "o_status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_table(src, path, fmt="parquet", partition_by=("o_status",))
    back = read_table(spark, path).filter(F.col("o_status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_status" in plan
    expected = src.filter(F.col("o_status") == "F").count()
    assert back.count() == expected


def test_columnar_formats_push_filters(spark, sf_small, tmp_path):
    for fmt in COLUMNAR:
        src = load_table(spark, sf_small, "orders")
        path = str(tmp_path / f"orders_{fmt}")
        write_table(src, path, fmt=fmt, sort_within_by=("o_orderkey",))
        back = read_table(spark, path, fmt=fmt).filter(F.col("o_orderkey") == 1)
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,1)" in plan, fmt
