"""pypgsync_spark — a PySpark-native analytics/sync engine.

A from-scratch re-expression of the query and data-processing
capabilities of gdmachado/pypgsync (an incremental Postgres→Postgres
table sync tool) as an idiomatic Spark DataFrame engine, plus the
large-scale data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB training-data pipeline needs.

Layout:
    session.py    SparkSession factory tuned for the workload
    catalog.py    fixture-table loading helpers
    plans/        interval math + slice planning (reference session.py:201-240)
    sources/      parquet + JDBC partitioned readers, upsert sink
    operators/    merge, windowed-range, top-k, dedup, similarity, multimodal
    functions/    time/json/text scalar function layers
    streaming/    continuous-mode sync + stateful aggregates
    sync.py       the watermark-merge pipeline (the reference's raison d'etre)
    queries.py    named query catalog + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
