"""Host-sentinel grade bands and bracket logic (tools/host_sentinel).

The r08 measurement protocol hangs off these two functions: _grade
must distinguish the r07 0.99-vs-2.11 GB/s "both healthy" pair, and
brackets_agree is the accept/reject rule for every scale point and
closing bench. No Spark needed."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from host_sentinel import BRACKET_TOLERANCE, _grade, brackets_agree  # noqa: E402


def test_grade_distinguishes_the_r07_ambiguous_pair():
    # the exact pair that motivated the tightening: both used to
    # grade healthy at the 0.8 GB/s cold threshold
    assert _grade(1.3, 0.994, 3.0) == "marginal-io"
    assert _grade(1.3, 2.11, 3.0) == "healthy"


def test_grade_bands():
    assert _grade(1.0, 1.8, 2.5) == "healthy"
    assert _grade(1.0, 0.3, 0.5) == "degraded-io"
    assert _grade(2.2, 1.6, 2.5) == "marginal-cpu"
    assert _grade(3.0, 1.6, 2.5) == "degraded-cpu"
    assert _grade(3.0, 0.3, 0.2) == "degraded-both"
    assert _grade(2.2, 1.0, 2.5) == "marginal-both"
    # no fixture: CPU-only gate
    assert _grade(1.0, None, None) == "no-fixture"
    assert _grade(3.0, None, None) == "degraded-cpu"
    # warm-only degradation (throttled I/O with a full page cache)
    assert _grade(1.0, 1.6, 1.0) == "degraded-io"


def test_brackets_agree_rule():
    a = {"cpu_sec": 0.33, "read_gbps": 5.0}
    assert brackets_agree(a, {"cpu_sec": 0.35, "read_gbps": 4.2})
    # read throughput shifted beyond tolerance
    assert not brackets_agree(a, {"cpu_sec": 0.33, "read_gbps": 5.0 * (BRACKET_TOLERANCE + 0.05)})
    # cpu shifted beyond tolerance
    assert not brackets_agree(a, {"cpu_sec": 0.33 * 1.5, "read_gbps": 5.0})
    # disk probes must be comparable: one-sided None is a mismatch
    assert not brackets_agree(a, {"cpu_sec": 0.33, "read_gbps": None})
    assert brackets_agree(
        {"cpu_sec": 0.33, "read_gbps": None}, {"cpu_sec": 0.34, "read_gbps": None}
    )
    # malformed probes never pass
    assert not brackets_agree({}, a)
