"""etl_neptune_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing semantics of the reference
ETL/graph pipeline system (RadiumGu/ETL-Neptune) as an idiomatic Spark
DataFrame/SQL engine: declarative plans optimized by Catalyst, columnar
Parquet scans, broadcast dimension joins, MERGE-style keyed upserts, and
Structured Streaming micro-batches — plus first-class large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Package layout:
  session    SparkSession factory with scale-aware defaults
  sources    table loaders (parquet snapshot tables)
  functions  scalar/JSON/IP expression library (native exprs; UDF only
             where recursion genuinely requires it)
  operators  merge (upsert), GC, degrees, dedup, similarity, text
  plans      certified query definitions (SURVEY.md §2 q-ids)
  streaming  micro-batch pipeline wrappers (foreachBatch MERGE)
"""

__version__ = "0.1.0"
