"""delta_lake_play_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of the reference repo ``nagi49000/delta-lake-play`` (a Delta-Lake +
PySpark demo exposing versioned-table DML, time travel and serving;
see ``/root/reference/README.md:7-11``), re-expressed Spark-first:

- relational core (scan/filter/join/agg/window/sort/set ops) as
  declarative DataFrame/SQL plans optimized by Catalyst,
- a versioned-Parquet table layer re-implementing the Delta-style
  DML surface (merge/delete/update/history/time-travel/restore),
- LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal column plumbing) designed for 100 TB scale,
- a Structured Streaming layer for event-time windowing.

Everything here derives from public knowledge only: the Apache Spark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
