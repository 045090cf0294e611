"""Property-based invariants for the MERGE family (hypothesis).

Example-based tests pin known cases; these pin ALGEBRAIC LAWS over
arbitrary inputs — the properties that make upsert/diff/SCD2 safe to
compose in pipelines:

- upsert idempotence: applying the same source twice changes nothing
- key conservation: result keys = target keys ∪ (residual-irrelevant)
  source keys; with full_sync, exactly the source keys
- source wins: every source row's values appear verbatim
- diff/upsert coherence: applying a snapshot_diff's post-images via
  upsert reproduces the new snapshot (full_sync for deletes)

One shared Spark session; hypothesis drives small row sets (the laws
are size-independent; Spark correctness doesn't need volume).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_tools_spark.operators.diff import snapshot_diff
from lakehouse_tools_spark.operators.merge import upsert

KEYS = st.integers(min_value=0, max_value=6)
VALS = st.one_of(st.none(), st.text(alphabet="abc", max_size=2))
ROWS = st.dictionaries(KEYS, VALS, max_size=6)  # key -> value, unique keys

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, d):
    rows = [(k, v) for k, v in sorted(d.items())]
    return spark.createDataFrame(rows or [(0, "")], "k long, v string").limit(
        len(rows)
    )


def _as_dict(df):
    return {r.k: r.v for r in df.collect()}


@_settings
@given(target=ROWS, source=ROWS)
def test_upsert_is_idempotent_and_source_wins(spark, target, source):
    t, s = _df(spark, target), _df(spark, source)
    once = upsert(t, s, ["k"])
    got = _as_dict(once)
    # source wins on every source key; target-only keys survive
    assert got == {**target, **source}
    twice = upsert(once.localCheckpoint(eager=True), s, ["k"])
    assert _as_dict(twice) == got


@_settings
@given(target=ROWS, source=ROWS)
def test_full_sync_result_is_exactly_the_source(spark, target, source):
    t, s = _df(spark, target), _df(spark, source)
    got = _as_dict(upsert(t, s, ["k"], full_sync=True))
    assert got == source


@_settings
@given(old=ROWS, new=ROWS)
def test_diff_postimages_plus_fullsync_reproduce_new(spark, old, new):
    o, n = _df(spark, old), _df(spark, new)
    diff = snapshot_diff(o, n, ["k"])
    events = [(r._change_type, r.k, r.v) for r in diff.collect()]
    # replay: apply inserts+postimages, delete the deleted keys
    replayed = dict(old)
    for kind, k, v in events:
        if kind in ("insert", "update_postimage"):
            replayed[k] = v
        elif kind == "delete":
            replayed.pop(k, None)
    assert replayed == new
    # and the diff is minimal: no events for unchanged keys
    touched = {k for _, k, _ in events}
    unchanged = {
        k for k in set(old) & set(new) if old[k] == new[k]
    }
    assert touched.isdisjoint(unchanged)
