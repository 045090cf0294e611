"""Multi-point scaling measurement for the 13 flagship queries.

Runs each flagship at sf0.01 and sf0.1 (driver fixtures), sf1 (10x
up-sample built by tools/scale_fixture.py), and — when the fixture
exists — sf5 (and sf10 for the three highest-exponent flagships),
all in ONE fresh warmed session, min-of-RUNS per point, cache
cleared between queries, and prints a JSON table with
the per-decade scaling exponent e = log10(t_hi / t_lo): e == 1 is
linear-in-data, e == 0 is pure fixed overhead, e > 1 is a
super-linear term that would not survive 100 TB. Local caveat
(SCALING.md "Known local-vs-cluster deltas"): small-SF points are
dominated by fixed per-job overhead, so the TOP decade (sf0.1 -> sf1)
is the informative one — overhead is amortized 10x further there.

Usage::  python tools/scale_bench.py [runs]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from lakehouse_tools_spark.session import get_session  # noqa: E402

FLAGSHIPS = [
    "profiler_e2e",
    "dedup_collapse",
    "sim_covariance",
    "corpus_dedup_e2e",
    # one measured curve per remaining family with a 100 TB claim:
    # ANN (bucketed cosine top-k), incremental dedup (index screen),
    # text scoring (TF persist + per-doc window), packing (FFD via
    # bucketed windowed cumsum)
    "sim_ann_lsh",
    "dedup_incremental",
    "text_keywords",
    "pack_bins",
    # stateful streaming (applyInPandasWithState sessionizer). Only
    # measurable in a shared session since run_to_memory releases
    # terminated drains (streams.resetTerminated) — before that the
    # manager-pinned runtime state of prior drains inflated the 8th
    # drain ~4x (125.8 s vs 31.9 s at sf5; SCALING.md attribution)
    "events_stream_sessionize",
    # both drift forms: exact-KS audit (shuffle carries distinct
    # values, not rows) and the binned-PSI scale path; multimodal
    # Arrow-batch featurizer
    "drift_ks",
    "profile_drift",
    "multimodal_features",
    # sub-document span dedup (C4/RefinedWeb boilerplate pass)
    "corpus_span_dedup",
]
POINTS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", ".scale_fixtures/sf1"),
    # optional half-decade extension: present iff
    # `python tools/scale_fixture.py 50 .scale_fixtures/sf5` was run
    ("sf5", ".scale_fixtures/sf5"),
    # full-decade extension, measured only for SF10_FLAGSHIPS (the
    # three curves whose e(1->5) was highest in r06 — the segments
    # most likely to reveal a hidden quadratic next); present iff
    # `python tools/scale_fixture.py 100 .scale_fixtures/sf10` was run
    ("sf10", ".scale_fixtures/sf10"),
]
SF10_FLAGSHIPS = {
    "corpus_span_dedup",      # e(1->5) 0.75 in r06
    "events_stream_sessionize",  # 0.51
    "corpus_dedup_e2e",       # 0.50
}


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # SCALE_FLAGSHIPS=a,b,c re-measures a subset (e.g. after a fix)
    # without paying for the full 13-curve session
    subset = os.environ.get("SCALE_FLAGSHIPS")
    flagships = subset.split(",") if subset else FLAGSHIPS
    spark = get_session(
        app_name="scale_bench",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = E.queries()
    points = [(lb, d) for lb, d in POINTS if os.path.isdir(d) or os.path.exists(d)]
    out: dict[str, dict] = {}
    for name in flagships:
        times = {}
        for label, sf_dir in points:
            if label == "sf10" and name not in SF10_FLAGSHIPS:
                continue
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            times[label] = round(best, 3)
        rec = {"sec": times}
        labels = [lb for lb, _ in points if lb in times]
        decades = {
            "sf0.01": -2.0,
            "sf0.1": -1.0,
            "sf1": 0.0,
            "sf5": math.log10(5),
            "sf10": 1.0,
        }
        for lo, hi in zip(labels, labels[1:]):
            e = math.log10(times[hi] / times[lo]) / (decades[hi] - decades[lo])
            rec[f"exponent_{lo}_to_{hi}"] = round(e, 3)
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr)
        # same per-query cache isolation as bench.py: per-call
        # persists must not accumulate into the next flagship's curve
        spark.catalog.clearCache()
    print(json.dumps({"runs": runs, "scaling": out}, indent=1))


if __name__ == "__main__":
    main()
