"""End-of-round closing gate: run BEFORE the snapshot, fail loudly.

Codifies the two rotation rules the verdicts enforce in prose:

1. **Freeze rule** (tools/freeze_gate.py): every operator def whose
   executing code changed this round has a carrier query inside the
   driver's ~window-entry correctness snapshot.
2. **Staleness floor**: after this round's window lands, no
   registered query's latest driver row may be older than
   (current_round - 3); the window (first N of ``queries()``) must
   consist of exactly the queries that need rows — any registered
   query whose latest row would violate the floor and is NOT in the
   window is an error, with displacements listed so they can be
   justified in prose.

Usage::

    python tools/closing_gate.py [--window N] [--allow-displaced q1,q2]

``--allow-displaced`` downgrades NAMED staleness violations to
warnings — the auditable escape hatch for the one legitimate
conflict: the freeze rule (changed operator ⇒ carrier in-window)
outranks the staleness floor when both cannot fit the window, and
the displaced queries must be NAMED here and justified in the round
notes (r08 precedent: profile_corr + profile_entropy displaced by
the two changed-operator carriers; their operator files' code paths
were covered by six in-window profiler-family carriers).

Exit 0 = both gates pass (displacements, if any, are printed as
warnings for the round notes); exit 1 = violation.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def latest_rows() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    last_round = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        last_round = max(last_round, rnd)
        try:
            data = json.load(open(f))
        except ValueError:
            continue
        for q in data:
            latest[q] = max(latest.get(q, 0), rnd)
    return latest, last_round


def main() -> None:
    args = sys.argv[1:]
    window = 50
    if "--window" in args:
        window = int(args[args.index("--window") + 1])
    allowed: set[str] = set()
    if "--allow-displaced" in args:
        allowed = set(
            args[args.index("--allow-displaced") + 1].split(",")
        )
    import freeze_gate as FG

    rc = FG.run(FG.default_base(), window)

    import __spark_entry__ as E

    order = list(E.queries())
    in_window = order[:window]
    latest, last_round = latest_rows()
    this_round = last_round + 1
    floor = this_round - 3
    print(
        f"closing-gate: staleness floor r{floor:02d} "
        f"(round r{this_round:02d}, window {window})"
    )
    violations, displaced = [], []
    for q in order:
        row = latest.get(q)
        if row is None:
            # brand-new query: freeze rule requires it in-window
            if q not in in_window:
                violations.append(f"{q}: NEW query outside the window")
            continue
        if row < floor and q not in in_window:
            if q in allowed:
                displaced.append(
                    f"{q} (r{row:02d}; DISPLACED this round, justify in notes)"
                )
            else:
                violations.append(
                    f"{q}: latest row r{row:02d} < floor r{floor:02d}, not in window"
                )
        elif row == floor and q not in in_window:
            # will sit exactly at the floor after this round — the
            # next round MUST rotate it; surface as a warning
            displaced.append(f"{q} (r{row:02d}; must rotate in r{this_round + 1:02d})")
    for v in violations:
        print(f"  FAIL  {v}")
    if displaced:
        print(
            f"  warn  {len(displaced)} queries will sit at the floor "
            f"after this round: {', '.join(displaced[:8])}"
            + (" ..." if len(displaced) > 8 else "")
        )
    if violations or rc != 0:
        print("closing-gate: FAIL")
        raise SystemExit(1)
    print("closing-gate: PASS")


if __name__ == "__main__":
    main()
