"""Codec round-trip fuzz tests (FIXTURES.md §3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from beamium_ray.stages.gorilla import (
    decode_block,
    decode_floats,
    decode_ints,
    encode_block,
    encode_floats,
    encode_ints,
)


def rt_ints(a, depth=2):
    out = decode_ints(encode_ints(np.asarray(a, dtype=np.int64), depth))
    assert out.tolist() == list(a)


def rt_floats(a):
    arr = np.asarray(a, dtype=np.float64)
    out = decode_floats(encode_floats(arr))
    assert out.view(np.uint64).tolist() == arr.view(np.uint64).tolist()


def test_ints_regular_spacing():
    rt_ints(np.arange(0, 600_000_000, 60_000_000))
    rt_ints([5])
    rt_ints([])
    rt_ints([7, 7, 7, 7])


def test_ints_jitter_and_negatives():
    rng = np.random.default_rng(42)
    base = np.cumsum(rng.integers(-1000, 100_000, 5000))
    rt_ints(base)
    rt_ints(rng.integers(-(2**62), 2**62, 2000), depth=1)
    rt_ints([0, -1, 2**62, -(2**62), 17], depth=2)


def test_int_extremes():
    rt_ints([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0], depth=1)


def test_floats_constant_and_random():
    rt_floats(np.full(100, 3.14159))
    rt_floats([])
    rt_floats([1.0])
    rng = np.random.default_rng(7)
    rt_floats(rng.normal(0, 1e6, 5000))
    rt_floats(np.round(rng.normal(100, 30, 5000), 2))
    # sign flips, denormals, inf, nan payloads
    special = np.array(
        [0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324, -5e-324, 1e308, -1e308]
    )
    rt_floats(special)


def test_compression_ratio_regular_series():
    ts = np.arange(0, 60_000_000 * 10_000, 60_000_000)
    enc = encode_ints(ts, depth=2)
    packed = len(enc["tags"]) + len(enc["payload"])
    assert packed < len(ts) * 8 / 12  # ≥12× on regular spacing

    vals = np.full(10_000, 42.5)
    encf = encode_floats(vals)
    assert len(encf["tags"]) + len(encf["payload"]) < 10_000 * 2


def test_block_roundtrip():
    rng = np.random.default_rng(3)
    nseries, nwin = 40, 30
    rows = []
    for s in range(nseries):
        for w in range(nwin):
            gap = (s + w) % 5 == 0
            rows.append(
                {
                    "series_key": f"seq.web.ntok{{shard={s}}}",
                    "window_start": 1_700_000_000_000_000 + w * 60_000_000,
                    "vmin": None if gap else round(rng.normal(50, 10), 2),
                    "vmax": None if gap else round(rng.normal(150, 10), 2),
                    "vsum": None if gap else round(rng.normal(1000, 100), 3),
                    "n": 0 if gap else int(rng.integers(1, 50)),
                    "last": None if gap else round(rng.normal(100, 10), 2),
                    "last_ts": None if gap else int(rng.integers(0, 2**50)),
                    "last_order": None if gap else int(rng.integers(0, 2**40)),
                }
            )
    t = pa.Table.from_pylist(rows)
    buf = encode_block(t)
    back = decode_block(buf)
    assert back.num_rows == t.num_rows
    for col in t.column_names:
        assert back[col].to_pylist() == t[col].to_pylist(), col
    # honest compression vs raw parquet-ish layout
    raw = t.nbytes
    assert len(buf) < raw


def test_bit_codec_roundtrip_fuzz():
    """Bit-granular float codec: exact round-trip (incl. NaN payloads,
    ±Inf, -0.0, repeats) and smaller-or-equal size on compressible data."""
    import numpy as np

    from beamium_ray.stages.gorilla import (
        decode_floats_bits,
        encode_floats,
        encode_floats_bits,
    )

    rng = np.random.default_rng(7)
    cases = [
        rng.normal(size=5000),
        np.repeat(rng.normal(size=50), 100),
        np.zeros(301),
        np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1.5, 1.5, -2.25]),
        rng.integers(0, 500, 4000).astype(float),
        np.array([]),
    ]
    for arr in cases:
        back = decode_floats_bits(encode_floats_bits(arr))
        assert (
            np.asarray(arr, float).view(np.uint64).tolist()
            == back.view(np.uint64).tolist()
        )
    # rollup-shaped data (integer-valued, repeated): bit codec wins
    arr = np.repeat(rng.integers(16, 512, 64).astype(float), 50)
    eb = encode_floats_bits(arr)
    eB = encode_floats(arr)
    sz_bits = sum(len(eb[k]) for k in ("payload", "lead", "mlen", "nz"))
    sz_bytes = len(eB["payload"]) + len(eB["tags"])
    assert sz_bits < sz_bytes


def test_int_bit_codec_roundtrip_fuzz():
    """Bit-granular int codec: exact delta^depth+zigzag round-trips and
    a ratio win on regular (timestamp-shaped) streams."""
    import numpy as np

    from beamium_ray.stages.gorilla import (
        decode_ints_bits,
        encode_ints,
        encode_ints_bits,
    )

    rng = np.random.default_rng(11)
    cases = [
        np.sort(rng.integers(0, 10**15, 5000)),
        1_700_000_000_000_000 + np.arange(10_000) * 60_000_000,
        rng.integers(-(2**62), 2**62, 3000),
        np.array([0, -1, 2**62, -(2**62), 7]),
        np.array([], dtype=np.int64),
    ]
    for arr in cases:
        for depth in (1, 2):
            back = decode_ints_bits(encode_ints_bits(arr, depth))
            assert back.tolist() == arr.astype(np.int64).tolist()
    regular = 1_700_000_000_000_000 + np.arange(10_000) * 60_000_000
    eb = encode_ints_bits(regular, 2)
    eB = encode_ints(regular, 2)
    sz_bits = sum(len(eb[k]) for k in ("payload", "lead", "mlen", "nz"))
    sz_bytes = len(eB["payload"]) + len(eB["tags"])
    assert sz_bits < sz_bytes / 2  # ≥2× win on regular windows


def test_block_roundtrip_with_bit_codec(ray_session):
    """encode_block(float_codec='bits') round-trips and self-describes
    (decoder needs no flag)."""
    import numpy as np
    import pyarrow as pa

    from beamium_ray.stages.gorilla import decode_block, encode_block

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table(
        {
            "series_key": pa.array(
                np.sort(rng.choice([f"s{i}" for i in range(5)], n)).tolist()
            ),
            "window_start": pa.array(np.sort(rng.integers(0, 10**6, n)), pa.int64()),
            "vmin": pa.array(rng.normal(size=n), pa.float64()),
            "vmax": pa.array(rng.normal(size=n), pa.float64()),
            "vsum": pa.array(rng.normal(size=n), pa.float64()),
            "n": pa.array(rng.integers(0, 50, n), pa.int64()),
            "last": pa.array(rng.normal(size=n), pa.float64()),
        }
    )
    for codec in ("bytes", "bits"):
        back = decode_block(
            encode_block(t, float_codec=codec, int_codec=codec)
        )
        assert back.num_rows == n
        for c in ["vmin", "vmax", "vsum", "last", "window_start", "n"]:
            assert back[c].to_pylist() == t[c].to_pylist(), (codec, c)
