"""mergeextractor_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference MergeExtractor pipeline
(BryanL43/MergeExtractor), re-expressed Spark-first.

Layout:
  session.py    — SparkSession factory tuned for local[32] testing / cluster posture
  schemas.py    — declared StructTypes for the reference's implicit data model
  functions/    — scalar/column function battery (strings, dates, vectors, text)
  operators/    — relational + text-analytics + dedup/similarity operators
  sources/      — fixture loaders, headerless CSV deals scan, sinks, rate-limited HTTP
  plans/        — composed end-to-end pipelines (extract / identify)
  streaming/    — Structured Streaming wrappers over the events table
  registry.py   — query registry feeding __spark_entry__ (queries + DuckDB oracles)
"""

__version__ = "0.1.0"
