"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet fixtures, then
compares row count, column dtypes, and an order-insensitive value
multiset. Usage::

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from lakehouse_tools_spark.session import get_session  # noqa: E402
from lakehouse_tools_spark.sources.tables import TABLE_NAMES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == "f":
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        elif s.dtype.kind in "iu":
            df[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(int(v)))
        else:
            df[c] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            sk = {c: sdf[c].dtype.kind for c in sdf.columns}
            ok_ = {c: odf[c].dtype.kind for c in odf.columns}
            dt_mismatch = {c: (sk[c], ok_[c]) for c in sk if sk[c] != ok_[c]}
            if dt_mismatch:
                problems.append(f"dtypes {dt_mismatch}")
            cs, co = canon(sdf), canon(odf)
            if len(cs) == len(co) and not cs.equals(co):
                neq = (cs != co).any(axis=1)
                sample = pd.concat(
                    [cs[neq].head(3).add_suffix("_s"), co[neq].head(3).add_suffix("_o")], axis=1
                )
                problems.append(f"values differ on {int(neq.sum())} rows\n{sample}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(str(p) for p in problems))
        else:
            print(f"PASS  {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
