"""Generate an up-sampled scale fixture from an existing sf directory.

The sandbox ships sf0.001/0.01/0.1 (read-only); scale-evidence runs
(SCALING.md "Measured scaling") need one more decade. This builds
``sfX = N x sf0.1`` under the repo (gitignored) by unioning N
id-shifted copies of each table, preserving each query family's
workload SHAPE at N x the volume:

- every integer surrogate/primary key is shifted by ``copy * stride``
  (stride = a round power of ten above the base table's max id), so
  key cardinality scales with volume the way a real corpus's does —
  the profiler's distinct-value shuffle, the dedup id space, and
  groupBy key counts all grow linearly;
- ``documents.text`` gets a per-copy token suffix on EVERY word, so
  copies are not near-duplicates of each other: 3-gram shingles of
  copy k never collide with copy j's, keeping the corpus's dup RATE
  constant under scaling (naive copies would make every LSH bucket N x
  hotter and grow candidate pairs quadratically — a different
  workload, not a bigger one);
- small dims (region, nation) stay 1x, as at any real TPC-H scale;
- FK columns into unscaled dims (nationkey, regionkey) are untouched
  so referential queries keep their semantics.

Usage::

    python tools/scale_fixture.py [factor] [out_dir] [base_dir]

Defaults: factor 10, out .scale_fixtures/sf1, base /root/testdata/sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from lakehouse_tools_spark.session import get_session  # noqa: E402

#: integer id columns shifted per copy (FKs to the unscaled dims —
#: nationkey/regionkey — deliberately absent)
SHIFT_COLS = {
    "region": (),
    "nation": (),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
#: dims kept at 1x regardless of factor
UNSCALED = ("region", "nation")


def _stride(df: DataFrame, cols: tuple[str, ...]) -> int:
    if not cols:
        return 0
    mx = df.agg(*[F.max(c) for c in cols]).first()
    top = max(int(v) for v in mx if v is not None)
    s = 10
    while s <= top:
        s *= 10
    return s


def scale_table(df: DataFrame, name: str, factor: int) -> DataFrame:
    if name in UNSCALED or factor <= 1:
        return df
    cols = SHIFT_COLS.get(name, ())
    stride = _stride(df, cols)
    copies = []
    for k in range(factor):
        c = df
        for col in cols:
            c = c.withColumn(col, (F.col(col) + F.lit(k * stride)).cast("long"))
        if name == "documents" and k > 0:
            # suffix every word so copy k shares no shingles with any
            # other copy (see module docstring)
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"$1x{k}")
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scale_fixtures/sf1"
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_session(
        app_name="scale_fixture",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in SHIFT_COLS:
        src = os.path.join(base, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        df = spark.read.parquet(src)
        scaled = scale_table(df, name, factor)
        # a directory named <table>.parquet with multiple part files:
        # load_table reads it transparently, and multi-split inputs
        # are what real scale looks like (the point of the exercise —
        # a single giant file would serialize the scan and measure
        # the layout, not the pipeline)
        parts = 8 if name not in UNSCALED and factor > 1 else 1
        scaled.repartition(parts).write.mode("overwrite").parquet(dst)
        print(f"{name}: {df.count()} -> {spark.read.parquet(dst).count()} rows")


if __name__ == "__main__":
    main()
