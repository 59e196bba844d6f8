"""open_crime_etl_pipeline_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (Tryd3x/open-crime-etl-pipeline), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
columnar parquet storage, and distributed execution — plus the
large-scale training-data operators (dedup, similarity search,
multimodal columns, text analysis) the reference never had.

Layout:
    session       — SparkSession factory (UTC, AQE, tuned shuffle)
    schemas       — explicit StructType schemas (no inference in hot path)
    io            — readers/writers/catalog (partitioned lake layout)
    transform     — bronze→silver column mapping + date dimension
    operators     — merge/upsert, dedup, similarity, text analysis
    incremental   — watermark controller, run ledger, reconciliation
    queries       — the named query library (driver-checked inventory)
    streaming     — event-time windows (tumbling/sliding/session)
"""

__version__ = "0.1.0"
