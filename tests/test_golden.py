"""Golden-record survivorship (operators/golden.py)."""

from __future__ import annotations

import pytest

from lakehouse_tools_spark.operators.golden import golden_records


def _df(spark):
    rows = [
        # cluster, recency, name, bal, seg
        (1, 10, "old-name", 5.0, "A"),
        (1, 20, None, 9.0, "B"),       # newest observation has null name
        (1, 15, "mid-name", 2.0, "B"),
        (2, 1, None, 1.0, "C"),        # cluster with NO non-null name
        (2, 2, None, 3.0, "C"),
    ]
    return spark.createDataFrame(rows, ["cl", "rec", "name", "bal", "seg"])


def test_latest_skips_null_observations(spark):
    out = {
        r.cl: r
        for r in golden_records(
            _df(spark),
            "cl",
            {"name": "latest", "bal": "max", "seg": "most_common"},
            recency_col="rec",
        ).collect()
    }
    # rec=20 has null name → survivor is the newest NON-null (rec=15)
    assert out[1].name_latest == "mid-name"
    assert out[1].bal_max == 9.0
    assert out[1].seg_most_common == "B"
    # all-null column in a cluster → null survivor, row still present
    assert out[2].name_latest is None
    assert out[2].seg_most_common == "C"


def test_mode_tie_breaks_to_smallest(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "c"), (1, "a"), (1, "b")], ["cl", "v"]
    )
    [r] = golden_records(df, "cl", {"v": "most_common"}).collect()
    assert r.v_most_common == "a"  # a and b both twice → smallest wins


def test_unknown_rule_raises(spark):
    with pytest.raises(ValueError):
        golden_records(_df(spark), "cl", {"name": "newest"})
    with pytest.raises(ValueError):
        golden_records(_df(spark), "cl", {"name": "latest"})  # no recency
