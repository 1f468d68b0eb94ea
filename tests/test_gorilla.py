"""Gorilla cold-archive codec: bit-level vectors pinned to this
module's documented scheme, adversarial roundtrips, and the
distributed export→read path against the engine's own query output."""

from __future__ import annotations

import random
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from monolith_spark.sources.gorilla import decode_points, encode_points

_SETTINGS = dict(
    deadline=None, derandomize=True, suppress_health_check=[HealthCheck.too_slow]
)


def test_golden_bit_layout():
    """Pin the documented scheme with hand-derived vectors (this module
    is its own spec; vectors derived on paper, not from other code)."""
    # one point: 64-bit ts + 64-bit value bits, nothing else
    blob = encode_points([(5, 2.0)])
    assert len(blob) == 16
    assert blob[:8] == (5).to_bytes(8, "big")
    assert blob[8:] == struct.pack(">d", 2.0)
    # two points, same value: first delta 10 as dod-vs-0 →
    # '10' + 7 bits (10+63=73=0b1001001), then value '0':
    # bits 1010010010 → bytes 0xA4, 0x80; total 138 bits → 18 bytes
    blob2 = encode_points([(5, 2.0), (15, 2.0)])
    assert len(blob2) == 18
    assert blob2[16] == 0xA4 and blob2[17] == 0x80
    # three points, constant delta + value: two more '0' bits → still 18
    blob3 = encode_points([(5, 2.0), (15, 2.0), (25, 2.0)])
    assert len(blob3) == 18
    assert blob3[16] == 0xA4 and blob3[17] == 0x80  # 10 1001001 0 0 0 + pad
    # dod +1 on the third gap → '10' + 7 bits (1+63=64=0b1000000):
    # 10 1001001 0 10 1000000 0 → 0xA4 0xA8 0x00 → 21 bits, 19 bytes
    blob4 = encode_points([(5, 2.0), (15, 2.0), (26, 2.0)])
    assert len(blob4) == 19
    assert blob4[16] == 0xA4 and blob4[17] == 0xA8 and blob4[18] == 0x00


def test_roundtrip_adversarial_cases():
    rng = random.Random(1)
    cases = [
        [],
        [(1000, 1.5)],
        [(-5000, float("nan"))],
        [(0x7FFFFFFFFF, -0.0), (0x7FFFFFFFFF + 1, 0.0)],
        [(1000 + i * 15000, 42.0) for i in range(500)],
        [(1000, 1.0), (1001, 1.0000001), (10**8, -12345.678), (10**8 + 1, 1e-300)],
    ]
    for _ in range(30):
        n = rng.randrange(0, 100)
        t = rng.randrange(-(10**12), 10**12)
        pts = []
        for _ in range(n):
            t += rng.randrange(1, 10**7)
            pts.append((t, rng.choice([0.0, -0.0, rng.uniform(-1e12, 1e12)])))
        cases.append(pts)
    for pts in cases:
        back = decode_points(encode_points(pts), len(pts))
        assert len(back) == len(pts)
        for (t, v), (bt, bv) in zip(pts, back):
            assert bt == t
            assert struct.pack("<d", bv) == struct.pack("<d", v)  # NaN/-0.0 exact


@settings(max_examples=60, **_SETTINGS)
@given(
    deltas=st.lists(st.integers(min_value=1, max_value=2**40), min_size=0, max_size=40),
    t0=st.integers(min_value=-(2**50), max_value=2**50),
    data=st.data(),
)
def test_roundtrip_property(deltas, t0, data):
    t, pts = t0, []
    for d in deltas:
        t += d
        v = data.draw(
            st.one_of(
                st.floats(allow_nan=False),
                st.sampled_from([0.0, -0.0, 1.0, float("inf"), -1e308]),
            )
        )
        pts.append((t, v))
    back = decode_points(encode_points(pts), len(pts))
    assert [(t, struct.pack("<d", v)) for t, v in back] == [
        (t, struct.pack("<d", v)) for t, v in pts
    ]


def test_compression_beats_raw_on_regular_series():
    pts = [(1000 + i * 15000, 100.0 + (i % 7) * 0.5) for i in range(10_000)]
    blob = encode_points(pts)
    assert len(blob) / len(pts) < 2.0  # raw is 16 bytes/point


def test_export_chunk_and_read_back(spark, tmp_path):
    """Distributed archive path: export a sealed chunk, read it back,
    and match db.query on the same window exactly."""
    from monolith_spark.engine import MonolithDB
    from monolith_spark.labels import SAMPLES_SCHEMA
    from monolith_spark.sources.gorilla import export_chunk_gorilla, read_gorilla

    rng = random.Random(7)
    db = MonolithDB(spark, str(tmp_path / "db"), chunk_size_ms=60_000)
    rows = [
        ({"host": f"h{i}"}, 1_000 + k * 997 + rng.randrange(5), rng.uniform(-50, 50))
        for i in range(20)
        for k in range(40)
    ]
    db.write(spark.createDataFrame(rows, SAMPLES_SCHEMA))

    n_series = export_chunk_gorilla(db, 0, str(tmp_path / "arch"))
    assert n_series == 20
    decoded = read_gorilla(spark, str(tmp_path / "arch"))
    back = {
        (r["series_id"], r["timestamp"]): r["value"] for r in decoded.collect()
    }
    orig = {
        (r["series_id"], p["timestamp"]): p["value"]
        for r in db.query({}, 0, 60_000).collect()
        for p in r["points"]
    }
    assert back == orig
    # the archive is materially smaller than the raw 16 B/point
    import os

    arch_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, fs in os.walk(tmp_path / "arch")
        for f in fs
        if f.endswith(".parquet")
    )
    assert arch_bytes < 16 * len(rows)
