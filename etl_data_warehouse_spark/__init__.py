"""etl_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL data warehouse
(Ch-Suharsha/etl-data-warehouse): star-schema construction, cleaning
transforms, analytics queries (CTEs + window functions), data-quality
checks, incremental extraction — plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for a 100 TB / 1000-executor posture.

Design stance (see SURVEY.md §7.0):
- DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
- Zero row-at-a-time Python UDFs in the core; Arrow/pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Exact DECIMAL aggregation for money (order-insensitive, engine-portable),
  explicit DOUBLE casts at the output boundary.
- Broadcast joins for dimensions, partition-pruned scans for facts.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
