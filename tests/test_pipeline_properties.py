"""Property-based invariants for chunking and sampling (hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakehouse_tools_spark.ext.chunking import chunk_chars
from lakehouse_tools_spark.ext.sampling import hash_sample

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

TEXTS = st.lists(
    st.text(alphabet="abc xyz.", min_size=0, max_size=40), min_size=1, max_size=5
)
SIZES = st.tuples(
    st.integers(min_value=1, max_value=7), st.integers(min_value=1, max_value=7)
)


@_settings
@given(texts=TEXTS, sz=SIZES)
def test_chunking_laws(spark, texts, sz):
    size, stride = sz
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    chunks = chunk_chars(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        rs = sorted(by_doc.get(i, []), key=lambda r: r.chunk_id)
        if not t:
            assert rs == []  # empty text -> no chunks
            continue
        # chunk k starts at offset k*stride; every chunk is a substring
        for r in rs:
            off = r.chunk_id * stride
            assert t[off : off + size] == r.chunk
            assert r.n_chars == len(r.chunk) > 0
        # coverage: chunk starts tile the whole text
        assert rs[0].chunk_id == 0
        last_off = rs[-1].chunk_id * stride
        assert last_off < len(t) <= last_off + max(size, stride)
        # when stride >= size there is no overlap and no gap smaller
        # than stride; reconstruction holds for exact tiling
        if stride == size:
            assert "".join(r.chunk for r in rs) == t


@_settings
@given(
    frac_pair=st.tuples(
        st.floats(min_value=0.0, max_value=1.0),
        st.floats(min_value=0.0, max_value=1.0),
    )
)
def test_hash_sample_nested_and_bounded(spark, frac_pair):
    lo, hi = sorted(frac_pair)
    df = spark.createDataFrame([(i,) for i in range(80)], "k long")
    small = {r.k for r in hash_sample(df, lo, "k").collect()}
    big = {r.k for r in hash_sample(df, hi, "k").collect()}
    assert small <= big          # samples are nested in the fraction
    assert len(big) <= 80
    full = {r.k for r in hash_sample(df, 1.0, "k").collect()}
    assert full == set(range(80))  # fraction 1.0 keeps everything


@_settings
@given(texts=TEXTS)
def test_containment_jaccard_laws(spark, texts):
    from lakehouse_tools_spark.ext.dedup import (
        containment_pairs,
        jaccard_pairs,
        word_shingles,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    sh = word_shingles(df, "text", "doc_id", k=2)
    cont = {
        (r.doc_id, r.doc_id2): r for r in containment_pairs(sh).collect()
    }
    jac = {
        (r.doc_id, r.doc_id2): r.jaccard for r in jaccard_pairs(sh).collect()
    }
    # identical pair sets (both enumerate pairs sharing >=1 shingle)
    assert set(cont) == set(jac)
    for pair, r in cont.items():
        # directions bounded and the max is the containment verdict
        assert 0 < r.c_1in2 <= 1.0 and 0 < r.c_2in1 <= 1.0
        assert abs(r.containment - max(r.c_1in2, r.c_2in1)) < 1e-9
        # containment dominates jaccard: |A∩B|/min-side >= |A∩B|/|A∪B|
        assert r.containment >= jac[pair] - 1e-9


TS_COUNTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=20),
              st.integers(min_value=0, max_value=4)),
    min_size=1, max_size=25,
)


@_settings
@given(events=TS_COUNTS)
def test_gap_fill_laws(spark, events):
    import datetime as dt

    from lakehouse_tools_spark.streaming.windows import gap_fill

    rows = [
        Row(ts=dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
            event_type=f"k{k}")
        for h, k in events
    ]
    df = spark.createDataFrame(rows)
    out = gap_fill(df, "1 hour").collect()
    by_key: dict[str, list] = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    # conservation: per key, filled counts sum to the raw event count
    raw = {}
    for h, k in events:
        raw[f"k{k}"] = raw.get(f"k{k}", 0) + 1
    for k, rs in by_key.items():
        assert sum(r.n_events for r in rs) == raw[k]
        # density: the spine is contiguous hours (no missing bucket)
        hours = sorted(r.window_start for r in rs)
        assert len(hours) == len(set(hours))
        first, last = hours[0], hours[-1]
        span_h = int((_parse(last) - _parse(first)).total_seconds() // 3600)
        assert len(hours) == span_h + 1


def _parse(s):
    import datetime as dt

    return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@_settings
@given(vals=st.lists(st.one_of(st.none(), st.floats(min_value=-100,
       max_value=100, allow_nan=False)), min_size=1, max_size=20))
def test_forward_fill_laws(spark, vals):
    from lakehouse_tools_spark.streaming.windows import forward_fill

    rows = [Row(k="a", i=i, v=v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {r.i: r.v for r in forward_fill(df, "i", "k", ["v"]).collect()}
    # reference LOCF
    held = None
    for i, v in enumerate(vals):
        if v is not None:
            held = v
        assert out[i] == held
    # idempotence: filling a filled relation is a no-op
    filled = forward_fill(df, "i", "k", ["v"])
    again = {r.i: r.v for r in forward_fill(filled, "i", "k", ["v"]).collect()}
    assert again == out
