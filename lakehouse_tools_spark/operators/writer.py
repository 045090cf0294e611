"""Durable table persistence: the reference's Delta write path on a
plain-parquet backend (SURVEY.md §7.5).

The reference persists via ``CREATE OR REPLACE TABLE … USING DELTA``
(dbc cell@7.0/7.125), ``MERGE INTO`` (cell@8.5/8.75) and ``OPTIMIZE …
ZORDER BY`` (cell@9.0/10.0). Backend selection is runtime-detected
(:mod:`lakehouse_tools_spark.backend`): with delta-spark importable
every operator here routes to the native Delta implementation
(``DeltaTable.merge`` / ``optimize().executeZOrderBy``); without it —
this environment has no delta-spark and no PyPI route, see
``backend.py`` — the durable layer is managed parquet tables with the
same semantics:

- ``create_or_replace``: saveAsTable(overwrite) with an explicit
  schema — the C8 contract.
- ``upsert_into``: read target ⟗ merge (operators.merge) ⟗ atomic
  swap. Parquet has no ACID MERGE, so the rewrite goes through a
  staging table + two metastore-only renames — the classic
  blue/green swap; readers see either the old or the new table, never
  a partial write. (With delta-spark present, swap the body for
  ``DeltaTable.merge`` — the call signature is identical.)
- ``optimize_clustered``: rewrite the table in Z-order-style layout
  (maintenance.zorder_layout) + compaction — same data-skipping
  payoff OPTIMIZE ZORDER buys, applied at rewrite time.

All table names are backtick-quoted; nothing here interpolates user
data into SQL text (the reference's F6 injection weakness).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_tools_spark.backend import table_format
from lakehouse_tools_spark.operators.maintenance import zorder_layout
from lakehouse_tools_spark.operators.merge import (
    SourcePredicate,
    TargetPredicate,
    upsert,
)


def _q(name: str) -> str:
    return ".".join(f"`{p}`" for p in name.split("."))


def create_or_replace(
    spark: SparkSession, df: DataFrame, table: str, num_files: int | None = None
) -> None:
    """C8 — ``CREATE OR REPLACE TABLE`` as a managed table (Delta when
    delta-spark is present, else parquet — backend.table_format()).

    ``num_files`` caps output files (the OSS stand-in for Delta's
    optimizeWrite, dbc cell@1.5:1)."""
    out = df.coalesce(num_files) if num_files else df
    out.write.mode("overwrite").format(table_format()).saveAsTable(table)


def _delta_merge(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    keys: list[str],
    source_residual: SourcePredicate | None,
    full_sync: bool,
    delete_condition: TargetPredicate | None,
) -> None:
    """Native ``DeltaTable.merge`` path — semantically identical to
    :func:`operators.merge.upsert` + swap (residual in ON ⇒
    residual-failing source rows INSERT; null-safe key equality;
    full_sync ⇒ WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE).
    Only reachable when delta-spark is importable (backend.py)."""
    from delta.tables import DeltaTable

    s = source.alias("s")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.expr(f"t.`{k}` <=> s.`{k}`")
    if source_residual is not None:
        cond = cond & source_residual(s)
    builder = (
        DeltaTable.forName(spark, table)
        .alias("t")
        .merge(s, cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
    )
    if full_sync:
        t_view = spark.table(table).alias("t")
        builder = builder.whenNotMatchedBySourceDelete(
            condition=delete_condition(t_view) if delete_condition else None
        )
    builder.execute()


_VERSION_PROP = "lakehouse_tools.version"


def _current_version(spark: SparkSession, table: str) -> int:
    """The live table's version number.

    Authoritative source is the ``lakehouse_tools.version`` table
    property — a monotone counter advanced by every ``upsert_into``
    regardless of ``keep_versions``, so dropping archives (or never
    keeping any) can't re-bind a version number to a different state.
    Tables written before the counter existed fall back to the legacy
    rule (newest archive + 1)."""
    try:
        rows = (
            spark.sql(f"SHOW TBLPROPERTIES {_q(table)}")
            .where(F.col("key") == _VERSION_PROP)
            .collect()
        )
        if rows:
            return int(rows[0]["value"])
    except Exception:
        pass
    have = _archived_versions(spark, table)
    return (have[-1] + 1) if have else 1


def _set_version(spark: SparkSession, table: str, version: int) -> None:
    spark.sql(
        f"ALTER TABLE {_q(table)} SET TBLPROPERTIES "
        f"('{_VERSION_PROP}'='{int(version)}')"
    )


def _archived_versions(spark: SparkSession, table: str) -> list[int]:
    """Version numbers archived for ``table`` (``<table>__v<n>``
    metastore entries). Simple (un-databased) table names only — the
    durable layer's convention throughout."""
    import re

    pat = re.compile(re.escape(table) + r"__v(\d+)$")
    out = []
    for t in spark.catalog.listTables():
        m = pat.fullmatch(t.name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def upsert_into(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    keys: list[str],
    source_residual: SourcePredicate | None = None,
    full_sync: bool = False,
    delete_condition: TargetPredicate | None = None,
    keep_versions: int = 0,
) -> None:
    """J1 — MERGE INTO a stored table, atomically.

    Delta backend: one ACID ``DeltaTable.merge``. Parquet backend: the
    merged relation is materialized to a staging table first
    (computing it directly over the target while overwriting the
    target would read-after-delete the very files being replaced),
    then swapped in with metastore renames.

    ``keep_versions > 0`` retains the replaced generation as
    ``<table>__v<n>`` instead of dropping it, pruning archives beyond
    the newest ``keep_versions`` — Delta-style time travel on the
    parquet backend, readable via :func:`read_version` /
    :func:`table_history`. Retention is a metastore rename: zero data
    movement per version. (The Delta backend gets this natively via
    the transaction log.)

    Version numbers come from a monotone counter stored as a table
    property, advanced on EVERY upsert — including ``keep_versions=0``
    ones — so the live version number never re-binds to a different
    state when archives are dropped or never kept.
    """
    if table_format() == "delta":
        _delta_merge(
            spark, table, source, keys, source_residual, full_sync, delete_condition
        )
        return
    target = spark.table(table)
    merged = upsert(
        target,
        source,
        keys,
        source_residual,
        full_sync=full_sync,
        delete_condition=delete_condition,
    )
    # read the counter while the old generation is still the live table
    old_version = _current_version(spark, table)
    staging = f"{table}__stage_{uuid.uuid4().hex[:8]}"
    retired = f"{table}__old_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").format(table_format()).saveAsTable(staging)
    spark.sql(f"ALTER TABLE {_q(table)} RENAME TO {_q(retired)}")
    try:
        spark.sql(f"ALTER TABLE {_q(staging)} RENAME TO {_q(table)}")
    except Exception:
        # roll the old table back before propagating
        spark.sql(f"ALTER TABLE {_q(retired)} RENAME TO {_q(table)}")
        raise
    _set_version(spark, table, old_version + 1)
    if keep_versions > 0:
        # the retired generation IS version old_version
        spark.sql(
            f"ALTER TABLE {_q(retired)} RENAME TO {_q(f'{table}__v{old_version}')}"
        )
        for v in _archived_versions(spark, table)[:-keep_versions]:
            spark.sql(f"DROP TABLE {_q(f'{table}__v{v}')}")
    else:
        spark.sql(f"DROP TABLE {_q(retired)}")
    # drop any cached file listing for the old generation — readers in
    # other sessions sharing this catalog (e.g. a streaming micro-batch
    # clone) would otherwise resolve the name to deleted files
    spark.catalog.refreshTable(table)


def table_history(spark: SparkSession, table: str) -> DataFrame:
    """``(version, is_current, table_name)`` — archived generations
    plus the live table (version from the monotone counter, so gaps
    appear where ``keep_versions=0`` upserts dropped generations). The
    parquet stand-in for ``DESCRIBE HISTORY``."""
    have = _archived_versions(spark, table)
    rows = [(v, False, f"{table}__v{v}") for v in have]
    rows.append((_current_version(spark, table), True, table))
    return spark.createDataFrame(
        rows, "version int, is_current boolean, table_name string"
    )


def read_version(spark: SparkSession, table: str, version: int) -> DataFrame:
    """Time travel: the table as of archived ``version`` (or the live
    table for the current version) — ``VERSION AS OF`` on the parquet
    backend. Raises for pruned/unknown versions."""
    have = _archived_versions(spark, table)
    current = _current_version(spark, table)
    if version == current:
        return spark.table(table)
    if version in have:
        return spark.table(f"{table}__v{version}")
    raise ValueError(
        f"version {version} of {table!r} not retained "
        f"(have {have + [current]}; raise keep_versions)"
    )


def vacuum_versions(spark: SparkSession, table: str, keep_last: int = 1) -> list[int]:
    """Prune archived generations beyond the newest ``keep_last`` —
    the parquet stand-in for ``VACUUM`` retention. Never touches the
    live table (the current generation is not an archive), so pruning
    can't drop current state; version numbering is unaffected because
    the counter lives in a table property, not the archive list.
    Returns the version numbers dropped."""
    if keep_last < 0:
        raise ValueError("keep_last must be >= 0")
    have = _archived_versions(spark, table)
    drop = have[: len(have) - keep_last] if keep_last else have
    for v in drop:
        spark.sql(f"DROP TABLE {_q(f'{table}__v{v}')}")
    return drop


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on the
    join/agg key.

    Bucketing is the storage-side half of shuffle elimination: two
    tables bucketed on the same key with the same bucket count join
    with ZERO Exchange — each task zips bucket i with bucket i — and
    a groupBy on the bucket key skips its shuffle too. At 100 TB this
    converts every recurring fact⋈dim or fact⋈fact join on the key
    into a local join; the one-time cost is the bucketed write's own
    shuffle. ``sort_cols`` additionally pre-sorts within buckets so
    sort-merge joins skip the sort. (Delta/Iceberg expose the same
    idea as clustered/partition-transform writes; Delta has no
    ``bucketBy``, so this writer stays parquet on every backend.)
    """
    w = df.write.mode("overwrite").format("parquet")
    w = w.bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def optimize_clustered(
    spark: SparkSession,
    table: str,
    zorder_cols: list[str],
    num_partitions: int | None = None,
) -> None:
    """O1 — OPTIMIZE … ZORDER BY: rewrite the stored table clustered
    on ``zorder_cols`` (row set unchanged; parquet min/max row-group
    stats then skip-prune predicates on prefixes of the Z columns).
    Delta backend: the native ``optimize().executeZOrderBy``."""
    if table_format() == "delta":
        from delta.tables import DeltaTable

        DeltaTable.forName(spark, table).optimize().executeZOrderBy(*zorder_cols)
        return
    clustered = zorder_layout(spark.table(table), zorder_cols, num_partitions)
    staging = f"{table}__stage_{uuid.uuid4().hex[:8]}"
    retired = f"{table}__old_{uuid.uuid4().hex[:8]}"
    clustered.write.mode("overwrite").format(table_format()).saveAsTable(staging)
    spark.sql(f"ALTER TABLE {_q(table)} RENAME TO {_q(retired)}")
    spark.sql(f"ALTER TABLE {_q(staging)} RENAME TO {_q(table)}")
    spark.sql(f"DROP TABLE {_q(retired)}")
    spark.catalog.refreshTable(table)
