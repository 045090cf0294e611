"""Capture ``.explain("formatted")`` output for declared queries.

Writes ``plans/$PLANS_ROUND/<query>_<tag>.txt`` (default round r13)
for each named query — the optimization round's plan evidence (the
judge checks plan claims in OPTIMIZATION_r13.md against these
files). Usage::

    python tools/explain_capture.py <tag> <query> [query ...]
    python tools/explain_capture.py <tag> --top   # the standing list

``tag`` is ``before`` / ``after``. Queries are built against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) but NOT
executed — ``_explain_string`` is plan-compile only. Streaming
queries (``events_stream_*``) drain their stream during *query
construction* (the callable returns a batch DataFrame of the drained
sink), so the captured plan for those describes the post-drain batch
relation; the streaming micro-batch plan itself is reported by the
harness logs instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from lakehouse_tools_spark.session import get_session  # noqa: E402

#: The optimization round's watch list: every query examined in
#: OPTIMIZATION_r12.md gets a before/after plan pair.
TOP = [
    "profile_clip",
    "profile_outliers",
    "quantile_error_report",
    "profile_quantiles_exact",
    "profile_summary",
    "sim_recall_report",
    "dedup_collapse",
    "corpus_dedup_e2e",
    "dedup_clusters_lsh",
    "profiler_e2e",
    "fuzzy_join",
]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    tag = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--top"]:
        names = TOP
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(
        extra_confs={"spark.ui.showConsoleProgress": "false"}
    )
    queries = E.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
