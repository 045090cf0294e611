"""lakehouse_tools_spark — a PySpark-native analytics engine.

Brand-new, idiomatic PySpark implementation of the capabilities of
``francopatano/lakehouse-tools`` (see SURVEY.md for the structural
analysis of the reference): catalog introspection, schema harvesting
into a queryable ``SchemaInformation`` table, per-column data
profiling into a ``profileData`` table, key-based MERGE upserts,
table maintenance (compaction + Z-order-style clustering), plus an
extension surface for large-scale training-data pipelines (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Everything is DataFrame/SQL-first so Catalyst/Tungsten/AQE do the
physical planning; Python UDFs appear only as Arrow-batched pandas
UDFs in operators whose semantics built-ins cannot express.
"""

__version__ = "0.1.0"

from lakehouse_tools_spark.session import DEFAULT_CONFS, configure, get_session

__all__ = ["DEFAULT_CONFS", "configure", "get_session", "__version__"]
