"""PySpark-native analytics engine with the query / data-processing
capabilities of the Cassandra PV Archiver (reference: pklaus/cassandra-pv-archiver).

Not a port: the reference's Cassandra storage + hand-rolled async state
machines are replaced by Spark DataFrames over partitioned Parquet, and the
sample-at-a-time decimation pipeline by declarative window/aggregation plans
that Catalyst optimizes (see SURVEY.md for the operator-by-operator mapping).

Layout:
  sources/    parquet readers, events->samples canonical mapping, archive store
  operators/  decimation (time-weighted agg), as-of probes, dedup, similarity,
              text analysis, multimodal plumbing
  functions/  scalar helpers (severity codes, glob compile, JSON V1 rendering)
  plans/      query planner: decimation-level selection, retention fallback
  streaming/  structured-streaming ingestion & incremental decimation
"""

__version__ = "0.1.0"
