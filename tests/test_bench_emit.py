"""The bench.py stdout-emit path, round-tripped over the REAL table.

Round-8 postmortem (VERDICT r08 item 1): the driver bench measured
all 186 queries in ~4 minutes and then crashed in the final stdout
emit — a dict comprehension indexed every exponent dict for every
flagship in ``scaling_evidence["sec"]``, and the 16th flagship
(corpus_budget_select) was missing two segment entries, so the
driver recorded ``rc: 1, parsed: null`` and the round had no
bench-of-record. Two structural guards here:

1. COMPLETENESS of the committed table — adding a flagship with a
   partial curve fails at commit time, not in the driver's window.
2. TOLERANCE of the emit path — even if completeness slips, a
   partial curve emits explicit ``null``s and the line still parses.

No SparkSession needed: ``build_stdout_line`` is pure.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

SEGMENTS = (
    "exponent_sf0.01_to_sf0.1",
    "exponent_sf0.1_to_sf1",
    "exponent_sf1_to_sf5",
    "exponent_sf5_to_sf10",
)
POINTS = ("sf0.01", "sf0.1", "sf1", "sf5", "sf10")


def _detail(timings: dict, scaling_evidence: dict) -> dict:
    """The shape main() hands to build_stdout_line, with the bulky
    narrative fields present so the pop-list is exercised too."""
    return {
        "metric": "e2e_profile_sec",
        "value": timings.get("profiler_e2e", 0.0),
        "unit": "sec",
        "queries": timings,
        "queries_fresh": timings,
        "queries_driver": {},
        "driver_snapshot": "BENCH_r08.json",
        "sf": 0.1,
        "total_sec": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "cpus": 32,
        "host_sentinel": {"grade": "healthy", "cold_gbps": 2.5},
        "bracket_pre": {"read_gbps": 2.5},
        "bracket_post": {"read_gbps": 2.4},
        "bracket_ok": True,
        "min_of_3": [],
        "noise_note": {"note": "x" * 500},
        "scaling_evidence": scaling_evidence,
        "r08_measurement_audits": {"pad": "y" * 500},
        "attribution": {"pad": "z" * 2000},
    }


def _fake_timings() -> dict:
    # the real 186-query registry's names at plausible magnitudes —
    # exercises the >1900-char trim loop exactly as the driver does
    import __spark_entry__ as E

    return {name: round(0.1 + (i % 50) / 10.0, 3)
            for i, name in enumerate(E.queries())}


def test_real_table_is_complete():
    """Every flagship in sec has every point and every segment —
    the exact invariant whose violation crashed the r08 driver."""
    ev = bench.SCALING_EVIDENCE
    flagships = set(ev["sec"])
    assert "corpus_budget_select" in flagships  # the r08 16th curve
    assert len(flagships) >= 16
    for q, curve in ev["sec"].items():
        missing_pts = [p for p in POINTS if p not in curve]
        assert not missing_pts, f"{q} curve missing points {missing_pts}"
    for seg in SEGMENTS:
        missing = flagships - set(ev[seg])
        assert not missing, f"{seg} missing flagships {missing}"


def test_emit_roundtrip_over_real_table():
    """The full emit path over the real 16-flagship table and the
    real 186-query name set: parses, fits the driver's stdout-tail
    capture, and self-labels its measurement window."""
    timings = _fake_timings()
    line = bench.build_stdout_line(
        _detail(timings, bench.SCALING_EVIDENCE), timings
    )
    assert len(line) <= 1900
    out = json.loads(line)
    assert out["metric"] == "e2e_profile_sec"
    # VERDICT r12 item 5: a STABLE top-10 queries map survives the
    # trim (the driver's per-query PERF comparison needs n_common>0
    # round-over-round), and it is exactly the slowest 10+
    ranked = sorted(timings, key=timings.get, reverse=True)
    assert len(out["queries"]) >= 10
    assert set(out["queries"]) == set(ranked[: len(out["queries"])])
    # the line points at the committed full record
    assert out["detail_file"] == "BENCH_DETAIL.json"
    # the flagships that still fit ride along with full 7-tuples; the
    # cut (if any) is counted — the full table stays in BENCH_DETAIL
    assert set(out["scaling"]) <= set(bench.SCALING_EVIDENCE["sec"])
    assert (
        len(out["scaling"]) + out.get("scaling_omitted", 0)
        == len(bench.SCALING_EVIDENCE["sec"])
    )
    for q, row in out["scaling"].items():
        assert len(row) == 7
        assert all(v is not None for v in row), f"{q}: {row}"
    # window provenance is readable from the parsed line alone
    assert out["sentinel_grade"] == "healthy"
    assert out["bracket_ok"] is True
    # bulky fields stayed in BENCH_DETAIL, not the line
    for bulky in ("scaling_evidence", "noise_note", "attribution",
                  "host_sentinel", "bracket_pre", "bracket_post",
                  "r08_measurement_audits"):
        assert bulky not in out
    # the trim loop kept the slowest queries, flagged the cut
    if "queries_omitted" in out:
        assert out["queries_omitted"] + len(out["queries"]) == len(timings)


def test_partial_curve_emits_nulls_not_crash():
    """A flagship with a partial curve (the r08 failure mode) must
    produce explicit nulls, never a KeyError after a measured run."""
    ev = json.loads(json.dumps(bench.SCALING_EVIDENCE))  # deep copy
    ev["sec"]["synthetic_partial"] = {"sf1": 1.0, "sf5": 2.0}
    ev["exponent_sf1_to_sf5"]["synthetic_partial"] = 0.43
    # deliberately absent from the other three segment dicts
    timings = {"profiler_e2e": 4.3, "synthetic_partial": 1.0}
    line = bench.build_stdout_line(_detail(timings, ev), timings)
    out = json.loads(line)
    row = out["scaling"]["synthetic_partial"]
    assert row == [None, 1.0, 2.0, None, None, 0.43, None]


def test_degraded_window_self_labels():
    """VERDICT r08 item 6: a degraded-window snapshot must say so in
    the parsed line itself."""
    timings = {"profiler_e2e": 4.3}
    detail = _detail(timings, bench.SCALING_EVIDENCE)
    detail["host_sentinel"] = {"grade": "degraded-io", "cold_gbps": 0.17}
    detail["bracket_ok"] = False
    out = json.loads(bench.build_stdout_line(detail, timings))
    assert out["sentinel_grade"] == "degraded-io"
    assert out["bracket_ok"] is False


def test_sentinel_probe_failure_still_parses():
    """host_sentinel.py erroring (timeout, missing fixture) must not
    take the bench line down with it."""
    timings = {"profiler_e2e": 4.3}
    detail = _detail(timings, bench.SCALING_EVIDENCE)
    detail["host_sentinel"] = {"error": "probe timeout"}
    out = json.loads(bench.build_stdout_line(detail, timings))
    assert out["sentinel_grade"] == "probe timeout"


def test_gated_sentinel_retries_until_healthy(monkeypatch):
    """VERDICT r10 item 4: the snapshot path must WAIT for a healthy
    window (bounded retries), not just label a degraded one."""
    grades = iter(
        [{"grade": "degraded-io"}, {"grade": "marginal-io"}, {"grade": "healthy"}]
    )
    monkeypatch.setattr(bench, "probe_host_sentinel", lambda: next(grades))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_SENTINEL_RETRIES", "6")
    monkeypatch.setenv("BENCH_SENTINEL_WAIT_SEC", "0")
    monkeypatch.delenv("BENCH_SUBSET", raising=False)
    final, attempts, exhausted, budget = bench.gated_host_sentinel()
    assert final["grade"] == "healthy"
    assert attempts == ["degraded-io", "marginal-io", "healthy"]
    assert exhausted is False
    assert budget == 6


def test_gated_sentinel_exhaustion_labels_and_proceeds(monkeypatch):
    """After N non-healthy probes the bench proceeds but the snapshot
    carries the explicit exhausted label."""
    monkeypatch.setattr(
        bench, "probe_host_sentinel", lambda: {"grade": "degraded-io"}
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_SENTINEL_RETRIES", "2")
    monkeypatch.setenv("BENCH_SENTINEL_WAIT_SEC", "0")
    monkeypatch.delenv("BENCH_SUBSET", raising=False)
    final, attempts, exhausted, budget = bench.gated_host_sentinel()
    assert final["grade"] == "degraded-io"
    assert attempts == ["degraded-io"] * 3
    assert exhausted is True
    assert budget == 2


def test_gated_sentinel_probe_error_does_not_retry(monkeypatch):
    """A probe ERROR (broken tool, missing fixture) is not a window
    problem retrying can fix — label it and proceed immediately."""
    calls = []
    monkeypatch.setattr(
        bench,
        "probe_host_sentinel",
        lambda: calls.append(1) or {"error": "probe timeout"},
    )
    monkeypatch.setenv("BENCH_SENTINEL_RETRIES", "5")
    monkeypatch.delenv("BENCH_SUBSET", raising=False)
    final, attempts, exhausted, budget = bench.gated_host_sentinel()
    assert final == {"error": "probe timeout"}
    assert len(calls) == 1 and exhausted is False


def test_gated_sentinel_subset_defaults_to_no_retry(monkeypatch):
    """BENCH_SUBSET is the fast plumbing smoke — it must not sit in a
    retry loop waiting for measurement-grade I/O."""
    monkeypatch.setattr(
        bench, "probe_host_sentinel", lambda: {"grade": "degraded-io"}
    )
    monkeypatch.setenv("BENCH_SUBSET", "tpch_q6")
    monkeypatch.delenv("BENCH_SENTINEL_RETRIES", raising=False)
    final, attempts, exhausted, budget = bench.gated_host_sentinel()
    assert attempts == ["degraded-io"] and exhausted is True
    # the retries=0-by-design budget is what downstream adjudication
    # reads to tell a smoke from an exhausted measurement gate
    assert budget == 0


def test_retry_evidence_survives_into_stdout_line():
    timings = {"profiler_e2e": 4.3}
    detail = _detail(timings, bench.SCALING_EVIDENCE)
    detail["sentinel_attempts"] = ["degraded-io", "healthy"]
    detail["sentinel_retries_exhausted"] = False
    out = json.loads(bench.build_stdout_line(detail, timings))
    assert out["sentinel_attempts"] == ["degraded-io", "healthy"]
    assert out["sentinel_retries_exhausted"] is False


def test_gated_sentinel_bad_env_falls_back_to_defaults(monkeypatch):
    """ADVICE r11: malformed retry/wait env vars must degrade to the
    defaults (the sentinel is advisory), never abort the bench."""
    monkeypatch.setattr(
        bench, "probe_host_sentinel", lambda: {"grade": "healthy"}
    )
    monkeypatch.setenv("BENCH_SENTINEL_RETRIES", "bogus")
    monkeypatch.setenv("BENCH_SENTINEL_WAIT_SEC", "not-a-float")
    monkeypatch.delenv("BENCH_SUBSET", raising=False)
    final, attempts, exhausted, budget = bench.gated_host_sentinel()
    assert final["grade"] == "healthy" and budget == 6
