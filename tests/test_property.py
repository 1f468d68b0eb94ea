"""Property-based tests (hypothesis) — the richer analog of the
reference's random-data Ingester (/root/reference/src/common/test_utils.rs:126-220),
which generates N series × M points × K random labels but only checks
counts. Here every generated workload is verified against a pure-Python
model of the engine's query semantics.

Label values deliberately include ``,``/``=``/unicode — the exact
inputs that silently corrupt the reference's signature encoding
(/root/reference/src/indexer/sled_indexer.rs:291-319, SURVEY §1.1);
the escaped signature must stay injective under them.

derandomize=True: the driver re-runs tests per-round — examples must
be reproducible, like the reference's seeded Ingester.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from monolith_spark.engine import MonolithDB
from monolith_spark.labels import SAMPLES_SCHEMA, python_signature, signature_expr

# Alphabet chosen to attack the signature codec: separators, escapes,
# unicode, empties.
_VAL = st.text(alphabet="ab,=\\é ", min_size=0, max_size=4)
_KEY = st.text(alphabet="xyz_", min_size=1, max_size=3)
_LABELS = st.dictionaries(_KEY, _VAL, min_size=1, max_size=4)

_SETTINGS = dict(
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(max_examples=20, **_SETTINGS)
@given(st.lists(_LABELS, min_size=1, max_size=6, unique_by=lambda d: tuple(sorted(d.items()))))
def test_signature_injective_and_matches_python_model(spark, label_sets):
    df = spark.createDataFrame(
        [(labels, 1, 1.0) for labels in label_sets], SAMPLES_SCHEMA
    ).select(signature_expr("labels").alias("sig"))
    got = [r["sig"] for r in df.collect()]
    want = [python_signature(labels) for labels in label_sets]
    assert got == want
    # distinct label sets → distinct signatures (injectivity, the
    # property the reference's encoding lacks)
    assert len(set(got)) == len(label_sets)


# regex-safe alphabet for RE/NRE values (no metacharacters)
_SAFE_VAL = st.text(alphabet="abc", min_size=0, max_size=3)
_SAFE_LABELS = st.dictionaries(_KEY, _SAFE_VAL, min_size=0, max_size=3)


@st.composite
def _matcher_case(draw):
    from monolith_spark.labels import EQ, NEQ, NRE, RE, LabelMatcher

    label_sets = draw(st.lists(_SAFE_LABELS, min_size=1, max_size=5))
    matchers = []
    for _ in range(draw(st.integers(0, 3))):
        mtype = draw(st.sampled_from([EQ, NEQ, RE, NRE]))
        name = draw(_KEY)
        if mtype in (RE, NRE) and draw(st.booleans()):
            value = f"{draw(_SAFE_VAL)}|{draw(_SAFE_VAL)}"  # alternation
        else:
            value = draw(_SAFE_VAL)
        matchers.append(LabelMatcher(name, value, mtype))
    return label_sets, matchers


@settings(max_examples=25, **_SETTINGS)
@given(_matcher_case())
def test_matcher_predicate_matches_python_model(spark, case):
    import re

    from monolith_spark.labels import EQ, NEQ, NRE, RE, matcher_predicate

    label_sets, matchers = case

    def model(labels):
        for m in matchers:
            v = labels.get(m.name, "")  # Prometheus: missing = ""
            if m.type == EQ:
                ok = v == m.value
            elif m.type == NEQ:
                ok = v != m.value
            elif m.type == RE:
                ok = re.fullmatch(f"(?:{m.value})", v) is not None
            else:
                assert m.type == NRE
                ok = re.fullmatch(f"(?:{m.value})", v) is None
            if not ok:
                return False
        return True

    df = spark.createDataFrame(
        [(i, labels) for i, labels in enumerate(label_sets)],
        "i long, labels map<string,string>",
    )
    got = {r["i"] for r in df.filter(matcher_predicate("labels", matchers)).collect()}
    want = {i for i, labels in enumerate(label_sets) if model(labels)}
    assert got == want


@settings(max_examples=200, **_SETTINGS)
@given(st.binary(min_size=0, max_size=4096))
def test_snappy_roundtrip_arbitrary_bytes(data):
    from monolith_spark.sources import remote as proto

    assert proto.snappy_decompress(proto.snappy_compress(data)) == data


_I64 = st.integers(min_value=0, max_value=2**62)
_F64 = st.floats(allow_nan=False, width=64)


@settings(max_examples=100, **_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.dictionaries(st.text(min_size=1, max_size=8), st.text(max_size=8),
                            min_size=0, max_size=4),
            st.lists(st.tuples(_F64, _I64), max_size=5),
        ),
        max_size=4,
    )
)
def test_write_request_proto_roundtrip(series):
    from monolith_spark.sources import remote as proto

    req = proto.WriteRequest(
        timeseries=[
            proto.TimeSeries(labels, [proto.Sample(v, t) for v, t in samples])
            for labels, samples in series
        ]
    )
    got = proto.decode_write_request(
        proto.snappy_decompress(proto.snappy_compress(proto.encode_write_request(req)))
    )
    assert got == req


@settings(max_examples=100, **_SETTINGS)
@given(
    st.lists(
        st.tuples(
            _I64, _I64,
            st.lists(
                st.tuples(st.sampled_from([0, 1, 2, 3]),
                          st.text(max_size=6), st.text(max_size=6)),
                max_size=3,
            ),
            st.none() | st.tuples(_I64, st.sampled_from(["", "avg", "max_over_time"])),
        ),
        max_size=3,
    )
)
def test_read_request_proto_roundtrip(queries):
    from monolith_spark.sources import remote as proto

    req = proto.ReadRequest(
        queries=[
            proto.Query(
                start, end,
                [proto.LabelMatcher(t, n, v) for t, n, v in ms],
                hints=None if h is None else proto.ReadHints(step_ms=h[0], func=h[1]),
            )
            for start, end, ms, h in queries
        ]
    )
    got = proto.decode_read_request(proto.encode_read_request(req))
    # message-typed fields keep presence on the wire: an all-default
    # ReadHints still encodes as an (empty) length-delimited field
    assert got == req


@st.composite
def _workload(draw):
    series = draw(
        st.lists(_LABELS, min_size=1, max_size=4,
                 unique_by=lambda d: tuple(sorted(d.items())))
    )
    points = {
        i: draw(
            st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=5000),
                    st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False, allow_infinity=False),
                ),
                min_size=1,
                max_size=6,
                unique_by=lambda p: p[0],
            )
        )
        for i in range(len(series))
    }
    # matcher: a subset of a generated series' labels (guarantees the
    # superset-vs-exact distinction is exercised), or empty (match all)
    src = draw(st.sampled_from(series))
    keys = draw(st.lists(st.sampled_from(sorted(src)), unique=True)) if src else []
    matchers = {k: src[k] for k in keys}
    t0 = draw(st.integers(min_value=0, max_value=5000))
    t1 = draw(st.integers(min_value=0, max_value=5000))
    start, end = min(t0, t1), max(t0, t1)
    return series, points, matchers, start, end


@settings(max_examples=10, **_SETTINGS)
@given(_workload())
@pytest.mark.slow
def test_write_query_matches_python_model(spark, tmp_path_factory, wl):
    series, points, matchers, start, end = wl
    rows = [
        (labels, ts, val)
        for i, labels in enumerate(series)
        for ts, val in points[i]
    ]
    db = MonolithDB(
        spark,
        str(tmp_path_factory.mktemp("propdb")),
        chunk_size_ms=1000,
    )
    db.write(spark.createDataFrame(rows, SAMPLES_SCHEMA))

    got = {
        r["signature"]: [(p["timestamp"], p["value"]) for p in r["points"]]
        for r in db.query(matchers, start, end).collect()
    }

    # Pure-Python model: superset match (J4), ts != 0 (F1), inclusive
    # trim (F3), time-ascending points (A1), empty series dropped (F6).
    want = {}
    for i, labels in enumerate(series):
        if not all(labels.get(k) == v for k, v in matchers.items()):
            continue
        pts = sorted(
            (ts, val) for ts, val in points[i] if ts != 0 and start <= ts <= end
        )
        if pts:
            want[python_signature(labels)] = pts
    assert got == want


# ------------------------- window/resample operators vs python models
# Values are exact quarters (2 decimal places) so DECIMAL(18,2)
# aggregation is exact and the python Fraction model is bit-comparable.

_TS_SMALL = st.integers(min_value=0, max_value=50)
_V_QUARTER = st.integers(min_value=-400, max_value=400).map(lambda i: i / 4)
_SERIES_PTS = st.lists(st.tuples(_TS_SMALL, _V_QUARTER), min_size=1, max_size=12)


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(_SERIES_PTS, min_size=1, max_size=3),
    st.integers(min_value=1, max_value=4).map(lambda s: s * 5),
)
def test_resample_ffill_matches_python_model(spark, series_pts, step):
    from monolith_spark.operators.timeseries import resample_ffill

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {
        (r["k"], r["bucket_ms"]): (r["value"], r["observed"])
        for r in resample_ffill(df, step_ms=step, key_cols=["k"]).collect()
    }
    want = {}
    for k, pts in enumerate(series_pts):
        buckets: dict[int, tuple[int, float]] = {}
        for ts, v in pts:
            b = (ts // step) * step
            if b not in buckets or (ts, v) > buckets[b]:
                buckets[b] = (ts, v)
        last = None
        for b in range(min(buckets), max(buckets) + 1, step):
            if b in buckets:
                last = buckets[b][1]
                want[(k, b)] = (last, True)
            else:
                want[(k, b)] = (last, False)
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(_SERIES_PTS, min_size=1, max_size=3),
    st.integers(min_value=1, max_value=20),
)
def test_moving_avg_matches_python_model(spark, series_pts, window):
    from fractions import Fraction

    from monolith_spark.operators.timeseries import moving_avg

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = sorted(
        (r["k"], r["timestamp"], r["value"], r["mavg"])
        for r in moving_avg(df, window_ms=window, key_cols=["k"]).collect()
    )
    want = []
    for k, pts in enumerate(series_pts):
        for ts, v in pts:
            frame = [v2 for t2, v2 in pts if ts - window <= t2 <= ts]
            mean = float(sum(Fraction(x) for x in frame)) / len(frame)
            want.append((k, ts, v, mean))
    assert got == sorted(want)


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(_SERIES_PTS, min_size=1, max_size=3))
def test_series_quantiles_matches_python_model(spark, series_pts):
    import math

    from monolith_spark.operators.timeseries import series_quantiles

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {
        r["k"]: (r["p50"], r["p90"], r["n_points"])
        for r in series_quantiles(df, qs=(0.5, 0.9), key_cols=["k"]).collect()
    }
    want = {}
    for k, pts in enumerate(series_pts):
        vals = sorted(v for _, v in pts)
        n = len(vals)
        want[k] = (
            vals[math.ceil(0.5 * n) - 1],
            vals[math.ceil(0.9 * n) - 1],
            n,
        )
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(_SERIES_PTS, min_size=1, max_size=3))
def test_changes_resets_matches_python_model(spark, series_pts):
    from monolith_spark.operators.timeseries import changes_resets

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {
        r["k"]: (r["n_changes"], r["n_resets"])
        for r in changes_resets(df, key_cols=["k"]).collect()
    }
    want = {}
    for k, pts in enumerate(series_pts):
        seq = [v for _, v in sorted(pts)]
        want[k] = (
            sum(1 for a, b in zip(seq, seq[1:]) if a != b),
            sum(1 for a, b in zip(seq, seq[1:]) if b < a),
        )
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(_SERIES_PTS, min_size=1, max_size=3))
def test_linreg_slope_matches_python_model(spark, series_pts):
    from fractions import Fraction

    from monolith_spark.operators.timeseries import linreg_slope

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {
        r["k"]: (r["n_points"], r["slope"])
        for r in linreg_slope(df, key_cols=["k"]).collect()
    }
    want = {}
    for k, pts in enumerate(series_pts):
        n = len(pts)
        # exact sums (ints/quarters), then the engine's double ops
        sx = float(sum(Fraction(t) for t, _ in pts))
        sy = float(sum(Fraction(v) for _, v in pts))
        sxx = float(sum(Fraction(t) ** 2 for t, _ in pts))
        sxy = float(sum(Fraction(t) * Fraction(v) for t, v in pts))
        denom = n * sxx - sx * sx
        if denom > 0:
            want[k] = (n, (n * sxy - sx * sy) / denom * 1000.0)
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(_SERIES_PTS, min_size=1, max_size=3))
def test_holt_winters_matches_python_model(spark, series_pts):
    from monolith_spark.operators.timeseries import holt_winters

    sf, tf = 0.25, 0.5
    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {
        r["k"]: (r["n_points"], r["smoothed"])
        for r in holt_winters(df, key_cols=["k"], sf=sf, tf=tf).collect()
    }
    want = {}
    for k, pts in enumerate(series_pts):
        vs = [v for _, v in sorted(pts)]
        if len(vs) < 2:
            continue
        s0, s1, b = 0.0, vs[0], vs[1] - vs[0]
        for i in range(1, len(vs)):
            if i - 1 != 0:
                b = tf * (s1 - s0) + (1 - tf) * b
            s0, s1 = s1, sf * vs[i] + (1 - sf) * (s1 + b)
        want[k] = (len(vs), s1)
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(_SERIES_PTS, min_size=1, max_size=3))
def test_predict_linear_matches_python_model(spark, series_pts):
    from fractions import Fraction

    from monolith_spark.operators.timeseries import predict_linear

    at_ms = 5_000
    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {
        r["k"]: (r["n_points"], r["predicted"])
        for r in predict_linear(df, key_cols=["k"], at_ms=at_ms).collect()
    }
    want = {}
    for k, pts in enumerate(series_pts):
        n = len(pts)
        sx = float(sum(Fraction(t) for t, _ in pts))
        sy = float(sum(Fraction(v) for _, v in pts))
        sxx = float(sum(Fraction(t) ** 2 for t, _ in pts))
        sxy = float(sum(Fraction(t) * Fraction(v) for t, v in pts))
        denom = n * sxx - sx * sx
        if denom > 0:
            slope = (n * sxy - sx * sy) / denom
            want[k] = (n, (sy - slope * sx) / n + slope * float(at_ms))
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(st.lists(_SERIES_PTS, min_size=1, max_size=3))
def test_irate_matches_python_model(spark, series_pts):
    from fractions import Fraction

    from monolith_spark.operators.timeseries import irate

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = {r["k"]: r["irate"] for r in irate(df, key_cols=["k"]).collect()}
    want = {}
    for k, pts in enumerate(series_pts):
        top = sorted(pts, reverse=True)[:2]
        if len(top) < 2 or top[0][0] <= top[1][0]:
            continue
        (t1, v1), (t2, v2) = top
        step = Fraction(v1) - Fraction(v2) if v1 >= v2 else Fraction(v1)
        want[k] = float(step) / (t1 - t2) * 1000.0
    assert got == want


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(_SERIES_PTS, min_size=1, max_size=3),
    st.integers(min_value=1, max_value=20),
)
def test_anomaly_zscore_matches_python_model(spark, series_pts, window):
    import math
    from fractions import Fraction

    from monolith_spark.operators.timeseries import anomaly_zscore

    rows = [(k, ts, v) for k, pts in enumerate(series_pts) for ts, v in pts]
    df = spark.createDataFrame(rows, "k long, timestamp long, value double")
    got = sorted(
        (r["k"], r["timestamp"], r["value"], r["zscore"])
        for r in anomaly_zscore(
            df, key_cols=["k"], window_ms=window, min_points=2, threshold=0.5
        ).collect()
    )
    want = []
    for k, pts in enumerate(series_pts):
        for ts, v in pts:
            frame = [v2 for t2, v2 in pts if ts - window <= t2 <= ts]
            n = len(frame)
            # exact DECIMAL sums (quarters are exact at scale 2), then
            # the engine's double ops in the same order
            s1 = float(sum(Fraction(x) for x in frame))
            s2 = float(sum(Fraction(x) ** 2 for x in frame))
            var = (s2 - s1 * s1 / n) / n
            if n >= 2 and var > 0:
                z = (v - s1 / n) / math.sqrt(var)
                if abs(z) > 0.5:
                    want.append((k, ts, v, z))
    assert got == sorted(want)


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=0, max_value=999_999),
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_zvalue_matches_python_morton_model(spark, pairs):
    """plans/zorder.py: the JVM bit-arithmetic z-value must equal a
    pure-Python Morton interleave of (top-16-bits-of-series, scaled
    time rank) — and in particular be injective per rank pair."""
    from monolith_spark.plans.zorder import ZBITS, zvalue_expr

    ts_min, ts_max = 0, 999_999
    span = ts_max - ts_min + 1

    def spread(x: int) -> int:
        out = 0
        for b in range(16):
            out |= ((x >> b) & 1) << (2 * b)
        return out

    def model(sid: int, ts: int) -> int:
        srank = (sid & (2**64 - 1)) >> (64 - ZBITS)
        trank = min(int((ts - ts_min) * (1 << ZBITS) / span), (1 << ZBITS) - 1)
        return (spread(trank) << 1) | spread(srank)

    df = spark.createDataFrame(
        [(s, t) for s, t in pairs], "series_id long, timestamp long"
    ).withColumn("z", zvalue_expr("series_id", "timestamp", ts_min, ts_max))
    for r in df.collect():
        assert r["z"] == model(r["series_id"], r["timestamp"]), (
            r["series_id"], r["timestamp"])


# ------------------------------------------------------- media codecs

@settings(max_examples=50, **_SETTINGS)
@given(
    data=st.data(),
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
)
def test_ppm_roundtrip_arbitrary_pixels(data, w, h):
    import numpy as np

    from monolith_spark.operators.multimodal import decode_image, encode_ppm

    raw = data.draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    img = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    assert decode_image(encode_ppm(img)).tolist() == img.tolist()


@settings(max_examples=50, **_SETTINGS)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_arbitrary_samples(samples, rate):
    import numpy as np

    from monolith_spark.operators.multimodal import _decode_wav, encode_wav

    arr = np.array(samples, dtype=np.int16)
    got_rate, ch, out = _decode_wav(encode_wav(arr, rate))
    assert got_rate == rate and ch == 1 and out.tolist() == samples


@settings(max_examples=30, **_SETTINGS)
@given(
    data=st.data(),
    w=st.sampled_from([2, 4, 6, 8]),
    h=st.sampled_from([2, 4, 6]),
    nf=st.integers(min_value=0, max_value=4),
)
def test_y4m_roundtrip_arbitrary_frames(data, w, h, nf):
    import numpy as np

    from monolith_spark.operators.multimodal import _decode_y4m, encode_y4m

    frames = [
        np.frombuffer(
            data.draw(st.binary(min_size=w * h, max_size=w * h)), dtype=np.uint8
        ).reshape(h, w)
        for _ in range(nf)
    ]
    got_w, got_h, out = _decode_y4m(encode_y4m(frames, w, h))
    assert (got_w, got_h) == (w, h) and len(out) == nf
    assert all(a.tolist() == b.tolist() for a, b in zip(out, frames))


@settings(max_examples=40, **_SETTINGS)
@given(
    w=st.integers(min_value=1, max_value=10),
    h=st.integers(min_value=1, max_value=10),
    ow=st.integers(min_value=1, max_value=16),
    oh=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=10**9),
)
def test_resize_matches_floor_sampling_model(w, h, ow, oh, seed):
    from monolith_spark.operators.multimodal import resize_image, synth_image

    img = synth_image(seed, w, h)
    out = resize_image(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    for j in (0, oh - 1):
        for i in (0, ow - 1):
            assert out[j, i].tolist() == img[(j * h) // oh, (i * w) // ow].tolist()


# ------------------------------------------------------------------
# Round-3 text operators vs pure-python models


def _py_bpe_train(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Reference BPE trainer (Sennrich alg. 1): pair counts weighted by
    word freq, argmax with (count desc, left, right) tie-break,
    leftmost-first merge application."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    rules = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return rules


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=30
    )
)
@pytest.mark.slow
def test_bpe_train_matches_python_model(spark, words):
    from collections import Counter

    from monolith_spark.operators.text import bpe_train_merges

    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    got = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=3).collect()
    ]
    assert got == _py_bpe_train(dict(Counter(words)), 3)


def _py_winnow(tokens: list[str], k: int = 3, w: int = 4) -> set[int]:
    import hashlib

    grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    if not hs:
        return set()
    return {min(hs[j:j + w]) for j in range(max(len(hs) - w + 1, 1))}


@settings(max_examples=15, **_SETTINGS)
@given(st.lists(st.text(alphabet="pq", min_size=1, max_size=2), min_size=0, max_size=24))
@pytest.mark.slow
def test_winnow_matches_python_model(spark, tokens):
    import pyspark.sql.functions as F

    from monolith_spark.operators.text import winnow_fingerprints_expr

    docs = spark.createDataFrame([(0, " ".join(tokens))], "doc_id long, text string")
    got = set(
        docs.select(winnow_fingerprints_expr(F.col("text")).alias("fp")).head()["fp"]
    )
    assert got == _py_winnow([t for t in " ".join(tokens).split()])


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(st.text(alphabet="mn", min_size=1, max_size=3), min_size=0, max_size=40),
    st.lists(st.text(alphabet="mn", min_size=1, max_size=3), min_size=0, max_size=40),
)
@pytest.mark.slow
def test_kmv_merge_equals_union_property(spark, keys_a, keys_b):
    from monolith_spark.operators.sketches import kmv_estimate, kmv_merge, kmv_sketch

    schema = "grp string, key string"
    a = spark.createDataFrame([("g", k) for k in keys_a] or [("__empty", "x")], schema)
    b = spark.createDataFrame([("g", k) for k in keys_b] or [("__empty", "x")], schema)
    merged = kmv_merge(
        kmv_sketch(a, "key", ["grp"], k=8),
        kmv_sketch(b, "key", ["grp"], k=8),
        group_cols=["grp"], k=8,
    )
    direct = kmv_sketch(a.unionByName(b), "key", ["grp"], k=8)
    assert sorted((r["grp"], r["h"]) for r in merged.collect()) == sorted(
        (r["grp"], r["h"]) for r in direct.collect()
    )
    # below-k exactness
    n_distinct = len(set(keys_a) | set(keys_b))
    if 0 < n_distinct < 8:
        est = {
            r["grp"]: r["kmv_est"]
            for r in kmv_estimate(direct, ["grp"], k=8).collect()
        }
        if "g" in est:
            assert est["g"] == float(n_distinct)


def _py_shingles(text: str, n: int = 3) -> list[str]:
    w = text.strip().split()
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(
        st.lists(st.text(alphabet="uv", min_size=1, max_size=2), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_tf_cosine_matches_python_model(spark, docs_tokens):
    import math
    from collections import Counter

    from monolith_spark.operators.dedup import shingle_tf_cosine_pairs

    docs = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["tf_cosine"]
        for r in shingle_tf_cosine_pairs(sdf, threshold=0.0, df_cap=50).collect()
    }
    # python model: df-capped shingle tf vectors, integer dot/norms
    tfs = {i: Counter(_py_shingles(t)) for i, t in docs}
    df_cnt = Counter(term for tf in tfs.values() for term in tf)
    kept = {i: {t: c for t, c in tf.items() if df_cnt[t] <= 50} for i, tf in tfs.items()}
    expect = {}
    for a in kept:
        for b in kept:
            if a < b and kept[a] and kept[b]:
                dot = sum(kept[a][t] * kept[b][t] for t in kept[a].keys() & kept[b].keys())
                if dot > 0:
                    na = math.sqrt(sum(c * c for c in kept[a].values()))
                    nb = math.sqrt(sum(c * c for c in kept[b].values()))
                    expect[(a, b)] = dot / (na * nb)
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-12


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(
        st.lists(st.text(alphabet="uv", min_size=1, max_size=2), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
@pytest.mark.slow
def test_containment_matches_python_model(spark, docs_tokens):
    from monolith_spark.operators.dedup import shingle_containment_pairs

    docs = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["inner_id"], r["outer_id"]): r["containment"]
        for r in shingle_containment_pairs(sdf, threshold=0.0).collect()
    }
    sets = {i: set(_py_shingles(t)) for i, t in docs}
    expect = {}
    for a in sets:
        for b in sets:
            if a != b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter > 0:
                    expect[(a, b)] = inter / len(sets[a])
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-12


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(
        st.lists(st.text(alphabet="pq", min_size=1, max_size=2), min_size=0, max_size=30),
        min_size=1,
        max_size=5,
    )
)
@pytest.mark.slow
def test_span_dup_stats_matches_python_model(spark, docs_tokens):
    from monolith_spark.operators.dedup import span_dup_stats

    W = 5  # small window so short random docs produce spans
    docs = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in span_dup_stats(sdf, window=W, stride=1).collect()
    }
    spans = {
        i: [" ".join(t.split()[j:j + W]) for j in range(len(t.split()) - W + 1)]
        for i, t in docs
    }
    by_span: dict[str, set[int]] = {}
    for i, ss in spans.items():
        for s_ in ss:
            by_span.setdefault(s_, set()).add(i)
    for i, ss in spans.items():
        n_dup = sum(1 for s_ in ss if len(by_span[s_]) >= 2)
        assert got[i] == (len(ss), n_dup)


@settings(max_examples=10, **_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["the", "of", "and", "zx", "qq", "blob", "w1", "w2"]),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
@pytest.mark.slow
def test_nb_quality_classifier_matches_python_model(spark, docs_tokens):
    from decimal import Decimal, ROUND_HALF_UP

    from monolith_spark.operators.text import STOPWORDS, nb_quality_classifier

    # gate band chosen inside the generated length range so examples
    # land on BOTH sides of it
    lo, hi, sw = 5, 20, 0.2
    docs = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in nb_quality_classifier(
        sdf, min_tokens=lo, max_tokens=hi, min_stopword_ratio=sw).collect()}

    toks = {i: t for (i, _), t in zip(docs, docs_tokens)}
    lab = {i: (lo <= len(t) <= hi)
           and sum(x in STOPWORDS for x in t) / len(t) >= sw
           for i, t in toks.items()}
    c_pos, c_neg = {}, {}
    for i, t in toks.items():
        for x in t:
            d = c_pos if lab[i] else c_neg
            d[x] = d.get(x, 0) + 1
    v = len(set(c_pos) | set(c_neg))
    n_pos, n_neg = sum(c_pos.values()), sum(c_neg.values())
    for i, t in toks.items():
        s = Decimal(0)
        for x in t:
            r = ((c_pos.get(x, 0) + 1) * float(n_neg + v)) / (
                (c_neg.get(x, 0) + 1) * float(n_pos + v))
            s += Decimal(repr(r)).quantize(
                Decimal("1.000000000"), rounding=ROUND_HALF_UP)
        mean = float(s) / len(t)
        assert got[i]["gate_pass"] == lab[i]
        assert got[i]["n_tokens"] == len(t)
        assert abs(got[i]["nb_odds_mean"] - mean) < 1e-12, (i, got[i], mean)
        assert got[i]["nb_pass"] == (mean > 1.0)


@settings(max_examples=12, **_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),   # key (dense: ties)
            st.integers(min_value=0, max_value=10**6),  # value (cents)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_exact_rank_device_matches_global_window_model(spark, rows):
    """operators/ranking.py drives three registry queries in place of
    global windows — its ranks, ntiles and DECIMAL running sums must
    equal the sorted-sequence definition on arbitrary (tied, skewed)
    keys, including the all-equal-keys single-bin degenerate case."""
    from decimal import Decimal

    from monolith_spark.operators.ranking import ntile_expr, with_exact_rank

    data = [(i, k, Decimal(v) / 100) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "rid long, key long, val decimal(18,2)"
    )
    out, n, total = with_exact_rank(
        df, "key", ["rid"], "rnk",
        value_col="val", cum_col="cum", nbins=7,  # small: force collisions
    )
    got = {
        r["rid"]: (r["rnk"], r["cum"], ntile)
        for r, ntile in (
            (r, r["t"])
            for r in out.withColumn("t", ntile_expr("rnk", n, 3)).collect()
        )
    }
    # pure-python model of row_number / running sum over (key desc, rid)
    order = sorted(data, key=lambda t: (-t[1], t[0]))
    run = Decimal(0)
    q, rmd = divmod(len(order), 3)
    for pos, (rid, _, val) in enumerate(order, start=1):
        run += val
        rnk, cum, tile = got[rid]
        assert rnk == pos
        assert cum == run
        if q == 0:
            want_tile = pos
        elif pos <= (q + 1) * rmd:
            want_tile = (pos - 1) // (q + 1) + 1
        else:
            want_tile = rmd + (pos - (q + 1) * rmd - 1) // q + 1
        assert tile == want_tile
    assert n == len(order)
    assert total == sum(v for _, _, v in data)
