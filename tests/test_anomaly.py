"""Event-rate z-score anomaly detection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from lakehouse_tools_spark.operators.anomaly import rate_zscores


def _ev(i, h, etype="click"):
    return Row(
        event_id=i,
        ts=dt.datetime(2024, 1, 1, h, i % 60),
        event_type=etype,
    )


def test_rate_zscores_flags_spike(spark):
    # a lone spike's sample z-score is bounded by (n-1)/sqrt(n), so it
    # takes 10 quiet buckets for one outlier to clear 2 sigma:
    # hours 0-9 have 2 events each, hour 10 has 30 -> z ~3.0
    rows, i = [], 0
    for h in range(10):
        for _ in range(2):
            rows.append(_ev(i, h)); i += 1
    for _ in range(30):
        rows.append(_ev(i, 10)); i += 1
    out = {r.window_start: r for r in rate_zscores(spark.createDataFrame(rows)).collect()}
    assert len(out) == 11
    spike = out["2024-01-01 10:00:00"]
    assert spike.n_events == 30 and spike.is_anomaly
    import statistics

    counts = [2] * 10 + [30]
    z = (30 - statistics.mean(counts)) / statistics.stdev(counts)
    import math

    assert abs(spike.z - (math.floor(z * 1e6) / 1e6)) < 2e-6
    # quiet hours are far inside the band
    assert not out["2024-01-01 00:00:00"].is_anomaly


def test_rate_zscores_zero_variance_null_z(spark):
    rows = [_ev(i, h) for h in range(3) for i in (2 * h, 2 * h + 1)]
    out = rate_zscores(spark.createDataFrame(rows)).collect()
    # identical counts -> stddev 0 -> z NULL, is_anomaly NULL
    assert all(r.z is None and r.is_anomaly is None for r in out)


def test_rate_zscores_single_bucket_null_z(spark):
    out = rate_zscores(spark.createDataFrame([_ev(1, 0)])).collect()
    assert len(out) == 1 and out[0].z is None


def test_rolling_zscores_trailing_window(spark):
    from lakehouse_tools_spark.operators.anomaly import rolling_zscores

    # 8 quiet hours then a spike: the trailing window (previous 6,
    # current excluded) has zero variance -> quiet hours z NULL;
    # the spike's trailing window is all 2s -> z NULL too (sd=0)...
    # so vary the baseline slightly to give variance
    rows, i = [], 0
    base = [2, 3, 2, 3, 2, 3, 2, 3]
    for h, n in enumerate(base):
        for _ in range(n):
            rows.append(_ev(i, h)); i += 1
    for _ in range(30):
        rows.append(_ev(i, 8)); i += 1
    out = {r.window_start: r for r in rolling_zscores(
        spark.createDataFrame(rows), trailing=6, z_threshold=2.0
    ).collect()}
    spike = out["2024-01-01 08:00:00"]
    assert spike.n_events == 30 and spike.is_anomaly
    # first bucket has no trailing history -> z NULL
    assert out["2024-01-01 00:00:00"].z is None
    # mid-baseline buckets are within band
    assert not out["2024-01-01 05:00:00"].is_anomaly
