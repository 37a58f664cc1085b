"""signaldb-spark: a PySpark-native observability analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
cedricziel/signaldb (an OTel signal database over Iceberg/Parquet with
LogQL/PromQL/TraceQL/IR/SQL query surfaces), re-expressed Spark-first:

- Storage: hour-partitioned Parquet tables (traces/logs/metrics/profiles),
  one directory tree per ``{tenant}/{dataset}/{table}``.
- Query frontends: pure-Python dialect parsers producing engine-neutral
  plan dataclasses, lowered onto ``pyspark.sql`` DataFrames so Catalyst
  handles pushdown/pruning/join-strategy.
- Everything the reference evaluates post-collect in native code
  (top-k per bucket, vector joins, histogram interpolation, label ops)
  stays IN the engine here, as Window functions / joins / higher-order
  array expressions — distributable at 100 TB, not driver-bound.
"""

__version__ = "0.1.0"
