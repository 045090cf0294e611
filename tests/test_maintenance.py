"""Layout rewrites (reference O1: OPTIMIZE ZORDER, dbc cell@9.0/10.0)."""

from __future__ import annotations

from lakehouse_tools_spark.operators.maintenance import (
    compact,
    zorder_curve_layout,
    zorder_layout,
)


def test_zorder_preserves_rowset(spark, tables):
    li = tables["lineitem"]
    out = zorder_layout(li, ["l_returnflag", "l_shipdate"])
    assert out.count() == li.count()
    assert li.exceptAll(out.select(li.columns)).count() == 0


def test_zorder_curve_preserves_rowset(spark, tables):
    nat = tables["nation"]
    out = zorder_curve_layout(nat, ["n_regionkey", "n_name"], bits=6)
    assert sorted(r.n_nationkey for r in out.collect()) == sorted(
        r.n_nationkey for r in nat.collect()
    )
    assert out.columns == nat.columns  # _z helper column dropped


def test_zorder_clusters_leading_column(spark, tables):
    # Within every partition the leading Z column must be sorted —
    # that ordering is what gives parquet min/max file skipping.
    out = zorder_layout(tables["lineitem"], ["l_returnflag"], num_partitions=4)

    def check(it):
        vals = [r.l_returnflag for r in it]
        yield vals == sorted(vals)

    assert all(out.rdd.mapPartitions(check).collect())


def test_compact_sets_partition_count(spark, tables):
    assert compact(tables["lineitem"], 3).rdd.getNumPartitions() == 3
