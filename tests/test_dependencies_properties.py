"""Property-based invariants for fd_candidates and pattern_match.

Example-based tests pin known cases; these pin the operators'
DEFINITIONS against independent pure-Python references over
arbitrary inputs:

- fd_candidates ≡ set arithmetic: n_det = |{a}|, n_pair = |{(a,b)}|
  over the null-excluded rows; fd_holds ⇔ no determinant value maps
  to two dependent values; strength = floor6(n_det / n_pair).
- pattern_match ≡ re.findall over the per-key token string built by
  an explicit (order, tiebreak) sort — Spark's sort_array + struct
  ordering and regexp_count must agree with CPython's sort + re for
  every input and pattern in the alphabet.

One shared Spark session; hypothesis drives small row sets (the laws
are size-independent; Spark correctness doesn't need volume).
"""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_tools_spark.operators.dependencies import fd_candidates
from lakehouse_tools_spark.operators.sequences import pattern_match

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (a, b) rows with nulls mixed in; tiny domains force collisions
AB_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),
        st.one_of(st.none(), st.integers(0, 2)),
    ),
    min_size=1,
    max_size=12,
)


@_settings
@given(rows=AB_ROWS)
def test_fd_matches_set_arithmetic(spark, rows):
    df = spark.createDataFrame(rows, "a int, b int")
    got = fd_candidates(df, [("a", "b")]).collect()[0]
    pairs = {(a, b) for a, b in rows if a is not None and b is not None}
    dets = {a for a, _ in pairs}
    assert got.n_det == len(dets)
    assert got.n_pair == len(pairs)
    holds = all(
        len({b for a2, b in pairs if a2 == a}) <= 1 for a in dets
    )
    assert got.fd_holds == holds
    assert got.fd_holds == (got.n_det == got.n_pair)
    assert got.n_det <= got.n_pair
    if pairs:
        assert got.strength == math.floor(
            len(dets) / len(pairs) * 1e6
        ) / 1e6
    else:
        assert got.strength is None


# events: (key, ts, state) with deliberately colliding timestamps;
# event_id (the list index) is the tiebreaker. ts may be NULL — the
# r10 contract excludes null order keys from the sequence AND the
# count (Spark sorts them first, ANSI last; exclusion is the one
# semantics both engines share), so the reference below drops them.
EV_ROWS = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.one_of(st.none(), st.integers(0, 3)),
        st.sampled_from(["v", "c", "p", "z"]),  # z is untokenized
    ),
    min_size=1,
    max_size=14,
)
PATTERNS = st.sampled_from(["v[cv]*p", "vp", "vc*p", "p+", "v.p"])


@_settings
@given(rows=EV_ROWS, pattern=PATTERNS)
def test_pattern_match_agrees_with_cpython_re(spark, rows, pattern):
    data = [(k, ts, i, s) for i, (k, ts, s) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "key_in int, ts int, event_id int, state string"
    )
    got = {
        r.key: (r.n_events, r.n_matches, r.matched)
        for r in pattern_match(
            df,
            "key_in",
            "state",
            ["ts", "event_id"],
            pattern,
            {"v": "v", "c": "c", "p": "p"},
        ).collect()
    }
    # independent reference: drop null order keys, explicit sort,
    # re.findall
    want = {}
    for k in {k for k, ts, _, s in data if s != "z" and ts is not None}:
        seq = "".join(
            s
            for _, ts, i, s in sorted(
                (
                    r
                    for r in data
                    if r[0] == k and r[3] != "z" and r[1] is not None
                ),
                key=lambda r: (r[1], r[2]),
            )
        )
        n = len(re.findall(pattern, seq))
        want[k] = (len(seq), n, n > 0)
    assert got == want
