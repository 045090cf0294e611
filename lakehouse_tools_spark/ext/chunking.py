"""Document chunking: fixed-size sliding windows over text.

The standard pre-tokenization step of an LLM data pipeline: split
each document into overlapping windows (characters or whitespace
tokens) so downstream batching sees bounded-length pieces. Expressed
as ``posexplode(sequence(...))`` + a substring/slice projection —
pure codegen, the only data growth is the intended chunk overlap, and
the explode happens AFTER column pruning so only (id, text) widen.
No shuffle: chunking is per-row; whatever partitioning the corpus
arrived with is preserved (chunks of one doc stay in its partition).

Contract: chunk offsets are 0, stride, 2·stride, … while the offset
is inside the text; ``chunk_id`` = offset / stride; the last chunk
may be shorter than ``size``. Empty texts produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_tools_spark.ext.dedup import normalize_text


def chunk_chars(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 512,
    stride: int = 384,
) -> DataFrame:
    """Character-window chunks: ``(id, chunk_id, chunk, n_chars)``.

    ``stride < size`` gives overlapping windows (the usual training
    setup); ``stride == size`` tiles without overlap.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    t = F.col(text_col)
    offsets = F.sequence(
        F.lit(0).cast("long"),
        (((F.length(t) - 1) / stride).cast("long") * stride),
        F.lit(stride).cast("long"),
    )
    exploded = df.filter(F.length(t) > 0).select(
        F.col(id_col),
        t.alias("_t"),
        F.posexplode(offsets).alias("chunk_id", "_off"),
    )
    chunk = F.col("_t").substr(F.col("_off") + 1, F.lit(size))
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        chunk.alias("chunk"),
        F.length(chunk).cast("int").alias("n_chars"),
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Whitespace-token-window chunks over normalized text:
    ``(id, chunk_id, chunk, n_tokens)``. Same offset contract as
    :func:`chunk_chars`, counted in tokens; the chunk is re-joined
    with single spaces (normalization already collapsed runs)."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    words = F.split(normalize_text(F.col(text_col)), " ")
    offsets = F.sequence(
        F.lit(0).cast("long"),
        (((F.size(words) - 1) / stride).cast("long") * stride),
        F.lit(stride).cast("long"),
    )
    exploded = df.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col),
        words.alias("_w"),
        F.posexplode(offsets).alias("chunk_id", "_off"),
    )
    piece = F.slice(F.col("_w"), F.col("_off") + 1, F.lit(size))
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("int").alias("n_tokens"),
    )
