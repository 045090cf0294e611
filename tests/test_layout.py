"""File-layout stats + the on-disk proof that zorder clustering buys
min/max skipping (operators/layout.py + maintenance.zorder_layout)."""

from __future__ import annotations

from lakehouse_tools_spark.operators.layout import (
    file_stats,
    skipping_effectiveness,
)
from lakehouse_tools_spark.operators.maintenance import zorder_layout


def test_zorder_write_enables_file_skipping(spark, tables, tmp_path):
    li = tables["lineitem"].select("l_orderkey", "l_shipdate", "l_quantity")

    random_path = str(tmp_path / "random")
    clustered_path = str(tmp_path / "clustered")
    # round-robin: every file sees the full key range
    li.repartition(8).write.parquet(random_path)
    # range-partition + sort on the predicate column
    zorder_layout(li, ["l_orderkey"], num_partitions=8).write.parquet(
        clustered_path
    )

    lo = li.agg({"l_orderkey": "min"}).collect()[0][0]
    hi = li.agg({"l_orderkey": "max"}).collect()[0][0]
    probe_lo = lo + (hi - lo) // 3
    probe_hi = probe_lo + (hi - lo) // 100

    s_rand = file_stats(spark, random_path, ["l_orderkey"])
    s_clus = file_stats(spark, clustered_path, ["l_orderkey"])
    eff_rand = skipping_effectiveness(s_rand, "l_orderkey", probe_lo, probe_hi)
    eff_clus = skipping_effectiveness(s_clus, "l_orderkey", probe_lo, probe_hi)

    assert eff_rand == 0.0            # every round-robin file overlaps
    assert eff_clus >= 0.5            # clustered: most files skipped
    # row counts survive both layouts
    assert s_rand.agg({"n_rows": "sum"}).collect()[0][0] == li.count()
    assert s_clus.agg({"n_rows": "sum"}).collect()[0][0] == li.count()


def test_file_stats_shape(spark, tables, tmp_path):
    path = str(tmp_path / "t")
    tables["nation"].write.parquet(path)
    st = file_stats(spark, path, ["n_nationkey", "n_name"])
    assert set(st.columns) == {
        "file", "n_rows", "min_n_nationkey", "max_n_nationkey",
        "min_n_name", "max_n_name",
    }
    assert st.count() >= 1


def test_skipping_effectiveness_empty(spark):
    from lakehouse_tools_spark.operators.layout import skipping_effectiveness

    empty = spark.createDataFrame([], "file string, n_rows long, min_x long, max_x long")
    assert skipping_effectiveness(empty, "x", 0, 1) == 0.0
