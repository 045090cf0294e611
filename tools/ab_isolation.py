"""A-B attribution run for the r06 cache-isolation methodology change.

VERDICT r06 item #1: bench.py started calling
``spark.catalog.clearCache()`` between queries in late r06
(methodology_r06_cache_isolation), and round-over-round comparisons
straddling that change need the shift itself *measured*, not argued.
This script runs the SAME query list twice, in two separate fresh
sessions with identical warm-up and run counts:

- **A (isolation ON)** — ``clearCache()`` after each query's timed
  runs, exactly bench.py's current loop;
- **B (isolation OFF)** — no cross-query cache shedding, exactly
  bench.py's pre-r06 loop.

The list deliberately contains the per-call persisters named in the
CACHE OWNERSHIP notes (tfidf via text_keywords, pagerank, the TPC-H
q15/q21 shared ``_ps_derived`` shapes, jaccard via dedup_jaccard)
interleaved with neutral queries positioned AFTER them, so the B run
reproduces the accumulated-cache session state the old methodology
measured. Output: one JSON line with per-query A/B minima and the
A/B ratio distribution — the committed attribution entry quotes it.

Usage::  python tools/ab_isolation.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from lakehouse_tools_spark.session import get_session  # noqa: E402

# per-call persisters + neutral queries sitting after them in
# bench order — the shapes the old methodology flattered
QUERIES = [
    "dedup_jaccard",        # persists the shingle relation per call
    "dedup_clusters",       # graph path, follows jaccard in bench order
    "text_keywords",        # tfidf_keywords persists the TF relation
    "text_bigrams",         # neutral neighbor
    "graph_pagerank",       # session-lifetime persist (documented)
    "dedup_graph_stats",    # neutral neighbor on the same tables
    "tpch_q15",             # persists _ps_derived
    "tpch_q17",             # rides the q15-warmed state in B
    "tpch_q21",             # second _ps_derived shape
    "tpch_q18",             # neutral TPC-H tail
]
RUNS = 2


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session(sf_dir: str):
    spark = get_session(
        extra_confs={"spark.ui.showConsoleProgress": "false"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _materialize(E.queries()["profiler_e2e"](spark, sf_dir))
    spark.catalog.clearCache()
    return spark


def _run(sf_dir: str, isolate: bool) -> dict[str, float]:
    spark = _session(sf_dir)
    qs = E.queries()
    out: dict[str, float] = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.time()
            _materialize(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        if isolate:
            spark.catalog.clearCache()
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    a = _run(sf_dir, isolate=True)
    b = _run(sf_dir, isolate=False)
    ratios = {q: round(a[q] / b[q], 3) for q in QUERIES if b[q] > 0}
    vals = sorted(ratios.values())
    print(json.dumps({
        "sf_dir": sf_dir,
        "runs_per_query": RUNS,
        "isolation_on": a,
        "isolation_off": b,
        "ratio_on_over_off": ratios,
        "median_ratio": round(statistics.median(vals), 3),
        "total_on": round(sum(a.values()), 3),
        "total_off": round(sum(b.values()), 3),
    }))


if __name__ == "__main__":
    main()
