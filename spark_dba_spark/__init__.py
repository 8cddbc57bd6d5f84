"""spark_dba_spark — a PySpark-native analytics & data-management engine.

A from-scratch engine providing the capabilities of the reference
``guptam/spark-dba`` (an Avro small-files compactor; see
``/root/reference/src/com/guptam/spark/dba``) re-expressed Spark-first, plus a
full relational query layer, structured-streaming layer, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing) —
everything declared through the DataFrame/SQL API so Catalyst/Tungsten/AQE own
the physical plan.

Layout:
  session    — SparkSession builder tuned for local[N] test + cluster posture
  catalog    — fixture-table loaders (schema-stable, pushdown-friendly)
  functions/ — column-expression helpers (exact decimal aggs, shingles, hashes)
  operators/ — relational, dedup, similarity, text, multimodal operator builders
  sources/   — format-generic readers + Hadoop FileSystem metadata ops
  plans/     — data-management jobs (compaction with atomic swap/trash/audit)
  streaming/ — Structured Streaming jobs + their batch-equivalent oracles
  registry   — the query registry consumed by __spark_entry__ and the bench
"""

__version__ = "0.1.0"
