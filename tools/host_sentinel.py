"""Host-condition sentinel: is this machine in a measurement-grade
window right now?

The sandbox host has documented slow windows (SCALING.md "sf10
extension and measurement isolation": a bracketed 97.4 s -> 19.9 s
profiler swing with GC/steal/JVM ruled out). Round 7 caught a second
kind — an I/O window where sequential parquet reads ran at
0.03 GB/s cold / 0.31 GB/s re-read vs 1.2 GB/s documented healthy —
which multiplies every scan-heavy measurement by up to ~40x and
produces exactly the super-linear-looking tails the scaling harness
exists to find. Scan-heavy evidence (scale_bench sweeps, closing
benches) is only comparable round-over-round when taken in a healthy
window, so: run this sentinel FIRST; if `grade` is not "healthy",
wait or re-run later rather than committing contaminated numbers.

Measures, in order:
- cpu_md5_sec: 2M hashlib.md5 hexdigests, single thread (healthy
  ~1.5-1.7 s on this host) — CPU/steal probe, no I/O.
- disk_cold_gbps: sequential read of the largest available fixture
  file set after best-effort cache drop (healthy >= 0.8 GB/s).
- disk_warm_gbps: immediate re-read (page cache; healthy >= 1.5 GB/s
  — a warm read far below memory bandwidth means I/O throttling at
  the virtualization layer, not disk).

Usage::  python tools/host_sentinel.py [path_to_read]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def _read_all(paths: list[str]) -> int:
    n = 0
    for p in paths:
        with open(p, "rb", buffering=0) as fh:
            while True:
                b = fh.read(1 << 22)
                if not b:
                    break
                n += len(b)
    return n


def main() -> None:
    target = (
        sys.argv[1]
        if len(sys.argv) > 1
        else next(
            (
                d
                for d in (
                    ".scale_fixtures/sf10/lineitem.parquet",
                    ".scale_fixtures/sf5/lineitem.parquet",
                    "/root/testdata/sf0.1/lineitem.parquet",
                )
                if os.path.exists(d)
            ),
        )
    )
    paths = (
        sorted(glob.glob(os.path.join(target, "*.parquet")))
        if os.path.isdir(target)
        else [target]
    )

    import hashlib

    t0 = time.time()
    for i in range(2_000_000):
        hashlib.md5(str(i).encode()).hexdigest()
    cpu = time.time() - t0

    # best-effort cold: drop_caches needs privileges; if unavailable
    # the "cold" number is really warm and will simply match the warm
    # probe (still detects throttled-I/O windows, where even warm
    # reads crawl)
    dropped = False
    try:
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        dropped = True
    except OSError:
        pass
    t0 = time.time()
    size = _read_all(paths)
    cold = size / 1e9 / max(time.time() - t0, 1e-9)
    t0 = time.time()
    _read_all(paths)
    warm = size / 1e9 / max(time.time() - t0, 1e-9)

    grade = "healthy"
    if cpu > 2.5:
        grade = "degraded-cpu"
    if cold < 0.8 or warm < 1.5:
        grade = "degraded-io" if grade == "healthy" else "degraded-both"
    print(
        json.dumps(
            {
                "cpu_md5_sec": round(cpu, 2),
                "disk_cold_gbps": round(cold, 3),
                "disk_warm_gbps": round(warm, 3),
                "cold_is_true_cold": dropped,
                "read_gb": round(size / 1e9, 2),
                "target": target,
                "grade": grade,
            }
        )
    )


if __name__ == "__main__":
    main()
