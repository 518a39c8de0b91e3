"""Global-Superstore Data Warehouse — PySpark-native engine.

A from-scratch, Spark-first re-implementation of the query and
data-processing capabilities of the reference warehouse
(DurugyAdam/Global-Superstore-Data-Warehouse, a PostgreSQL/PL-pgSQL
4-layer ELT pipeline): staging ingestion with load-id bookkeeping,
cleansing/dedup map tables, 3NF dimensions (SCD1 + SCD2), a
partitioned fact table, a star-schema mart with a generated date
dimension, and the analytical views on top — plus the
beyond-reference large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is expressed through the DataFrame / Spark SQL API so
Catalyst + Tungsten own the physical plan; no RDDs, and Python UDFs
only where the built-ins genuinely cannot express the semantics.
"""

from global_superstore_data_warehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
