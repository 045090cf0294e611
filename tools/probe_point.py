"""One-point probe: time one flagship at one fixture dir, min-of-N,
in THIS process — used for knob A/Bs and bracketing re-measures.

Usage::

    python tools/probe_point.py <query> <sf_dir> [runs] [shuffle_partitions] [conf=value ...]

Prints one JSON line {"query":..., "sf_dir":..., "runs": [...],
"min": ..., "shuffle_partitions": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from lakehouse_tools_spark.session import get_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    extra = {"spark.ui.showConsoleProgress": "false"}
    sp = sys.argv[4] if len(sys.argv) > 4 else None
    if sp:
        extra["spark.sql.shuffle.partitions"] = sp
    for kv in sys.argv[5:]:
        k, _, v = kv.partition("=")
        extra[k] = v
    spark = get_session(app_name="probe_point", extra_confs=extra)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = E.queries()
    times = []
    for _ in range(runs):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": times,
                "min": min(times),
                "shuffle_partitions": sp or "32",
                "extra_confs": sys.argv[5:],
            }
        )
    )


if __name__ == "__main__":
    main()
