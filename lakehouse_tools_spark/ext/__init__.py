"""Extension surface: large-scale training-data pipeline operators.

Not present in the reference (SURVEY.md §2.9–2.10 document its absence
of streaming/UDF surface); these are the operators a 100 TB LLM-data
pipeline needs, built the same Spark-first way as the core: built-in
functions and joins wherever semantics allow, Arrow-batched pandas
UDFs only where they don't (multimodal decode).
"""

from lakehouse_tools_spark.ext import (  # noqa: F401
    chunking,
    dedup,
    redact,
    sampling,
    similarity,
    text,
)
