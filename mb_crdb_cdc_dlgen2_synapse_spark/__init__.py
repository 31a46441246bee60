"""PySpark-native analytics engine with the capabilities of the reference
CDC -> lake -> serverless-SQL pipeline (mbookham7/mb-crdb-cdc-dlgen2-synapse).

The reference (see /root/reference/README.md) wires three managed systems:
CockroachDB changefeeds (CDC) -> ADLS Gen2 NDJSON lake -> Synapse serverless
SQL (`OPENROWSET` + `JSON_VALUE` analytics).  This package re-expresses those
capabilities Spark-first:

- ``sources``   : parquet/NDJSON/raw-line readers, CDC envelope schema, and a
                  seeded changefeed generator (the test-time analog of
                  ``cockroach workload run movr``, README.md:148-153).
- ``functions`` : JSON-path, text-analysis, and vector column expressions —
                  all built on ``pyspark.sql.functions`` (JVM/codegen side).
- ``operators`` : relational query builders, CDC merge/dedup semantics,
                  LLM-data-pipeline ops (dedup, similarity, text quality).
- ``streaming`` : Structured Streaming ingestion + windowed aggregation
                  (the ingestion half of the reference pipeline).
- ``plans``     : plan-inspection helpers (pushdown/broadcast assertions).

Everything is DataFrame-declarative so Catalyst supplies pushdown, pruning,
join planning, whole-stage codegen and AQE; no driver-side collects appear in
any operator path.
"""

__version__ = "0.1.0"
