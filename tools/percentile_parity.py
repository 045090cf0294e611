"""Bit-parity proof for exact_quantile_cells vs F.percentile.

Compares the distributed melt/cumsum/rank-pick exact-percentile path
against Spark's own ``F.percentile`` aggregate on every numeric column
of the named fixture tables, over a probe set that includes the
endpoints, the production quartiles, the quantile_error_report ±eps
brackets, and awkward irrational probes. Equality is REPR equality of
the Python floats (bit-level for doubles modulo −0.0, which the data
cannot produce from interpolation of identical inputs).

Usage::  python tools/percentile_parity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from lakehouse_tools_spark.operators.profile import (  # noqa: E402
    exact_quantile_cells,
)
from lakehouse_tools_spark.session import get_session  # noqa: E402
from lakehouse_tools_spark.sources.tables import load_table  # noqa: E402

PROBES = (
    0.0,
    0.009,
    0.25,
    0.241,
    0.259,
    0.491,
    0.5,
    0.509,
    1.0 / 3.0,
    0.741,
    0.75,
    0.759,
    0.999,
    1.0,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session()
    failures = 0
    checked = 0
    for t in ("lineitem", "orders", "events", "part", "supplier"):
        df = load_table(spark, sf_dir, t)
        cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType)
        ]
        if not cols:
            continue
        qs = F.array(*[F.lit(float(p)) for p in PROBES])
        ref = df.agg(
            *[F.percentile(F.col(c), qs).alias(c) for c in cols]
        ).collect()[0]
        got = {
            r["columnName"]: r
            for r in exact_quantile_cells(df, cols, PROBES).collect()
        }
        for c in cols:
            for i, p in enumerate(PROBES):
                a = None if ref[c] is None else ref[c][i]
                b = got[c][f"q{i}"] if c in got else None
                checked += 1
                ra = "NULL" if a is None else repr(float(a))
                rb = "NULL" if b is None else repr(float(b))
                if ra != rb:
                    failures += 1
                    print(f"MISMATCH {t}.{c} p={p}: percentile={ra} cells={rb}")
        print(f"ok {t}: {len(cols)} cols x {len(PROBES)} probes")
    # all-null + single-value + tie-heavy synthetic columns
    syn = spark.createDataFrame(
        [(None, 7.0, 1), (None, 7.0, 1), (None, 7.0, 2)],
        "a double, b double, c int",
    )
    qs = F.array(*[F.lit(float(p)) for p in PROBES])
    ref = syn.agg(
        *[F.percentile(F.col(c), qs).alias(c) for c in ("a", "b", "c")]
    ).collect()[0]
    got = {
        r["columnName"]: r
        for r in exact_quantile_cells(syn, ["a", "b", "c"], PROBES).collect()
    }
    for c in ("a", "b", "c"):
        for i, p in enumerate(PROBES):
            a = None if ref[c] is None else ref[c][i]
            b = got[c][f"q{i}"] if c in got else None
            checked += 1
            ra = "NULL" if a is None else repr(float(a))
            rb = "NULL" if b is None else repr(float(b))
            if ra != rb:
                failures += 1
                print(f"MISMATCH syn.{c} p={p}: percentile={ra} cells={rb}")
    print(f"{'FAIL' if failures else 'PASS'}: {checked} cells, {failures} mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
