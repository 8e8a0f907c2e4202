"""Sliding quantiles, spike/drop flags, broadcast interval join."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.stages.window import (
    sliding_quantiles_bucket,
    spike_flags_bucket,
)

US_1M = 60_000_000


def _mk(rng, n=500, n_series=4, span_us=40 * US_1M):
    keys = rng.choice([f"s{i}" for i in range(n_series)], n).tolist()
    ts = rng.integers(0, span_us, n).astype(np.int64)
    vals = rng.uniform(0, 100, n)
    return keys, ts, vals


def brute_sliding_quantiles(keys, ts, vals, window_us, slide_us, qs):
    k = window_us // slide_us
    groups: dict = {}
    for s, t, v in zip(keys, ts, vals):
        for j in range(k):
            ws = (t // slide_us - j) * slide_us
            groups.setdefault((s, ws), []).append(v)
    out = {}
    for key, vlist in groups.items():
        out[key] = tuple(
            int(np.round(np.quantile(np.array(vlist), q) * 1e6)) for q in qs
        ) + (len(vlist),)
    return out


def test_sliding_quantiles_bucket_matches_brute():
    rng = np.random.default_rng(3)
    keys, ts, vals = _mk(rng)
    W, S = 5 * US_1M, US_1M
    k = W // S
    n = len(keys)
    ws = np.concatenate(
        [(ts // S - j) * S for j in range(k)]
    )
    g = pa.table(
        {
            "series_key": pa.array(keys * k),
            "window_start": pa.array(ws, pa.int64()),
            "value": pa.array(np.tile(vals, k), pa.float64()),
        }
    )
    got = sliding_quantiles_bucket(g, (0.5, 0.95), ("p50", "p95"))
    want = brute_sliding_quantiles(keys, ts, vals, W, S, (0.5, 0.95))
    assert got.num_rows == len(want)
    for row in got.to_pylist():
        key = (row["series_key"], row["window_start"])
        assert want[key] == (row["p50"], row["p95"], row["n"]), key


def test_sliding_quantiles_dataset_split_invariance(ray_session):
    import ray.data

    from beamium_ray.stages.window import sliding_quantiles_dataset

    rng = np.random.default_rng(5)
    keys, ts, vals = _mk(rng, n=400)
    t = pa.table(
        {
            "series_key": pa.array(keys),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    W, S = 3 * US_1M, US_1M
    want = brute_sliding_quantiles(keys, ts, vals, W, S, (0.5, 0.99))
    for nblocks in (1, 6):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = sliding_quantiles_dataset(
            ds, W, S, qs=(0.5, 0.99), names=("p50", "p99"), num_buckets=3
        ).to_pandas()
        assert len(out) == len(want), nblocks
        for row in out.itertuples(index=False):
            key = (row.series_key, row.window_start)
            assert want[key] == (row.p50, row.p99, row.n), (nblocks, key)


def brute_spike(keys, ts, cents, window_us, lookback, min_baseline):
    agg: dict = {}
    for s, t, v in zip(keys, ts, cents):
        ws = t - t % window_us
        w, n = agg.get((s, ws), (0, 0))
        agg[(s, ws)] = (w + v, n + 1)
    out = {}
    per_series: dict = {}
    for (s, ws), (w, n) in sorted(agg.items()):
        per_series.setdefault(s, []).append((ws, w, n))
    for s, rows in per_series.items():
        for i, (ws, w, n) in enumerate(rows):
            base = [x[1] for x in rows[max(0, i - lookback):i]]
            cnt = len(base)
            tmax = max(base) if base else None
            tmin = min(base) if base else None
            up = (2 * w > 3 * tmax) if cnt >= min_baseline else None
            dn = (2 * w < tmin) if cnt >= min_baseline else None
            out[(s, ws)] = (w, n, cnt, tmax, tmin, up, dn)
    return out


def test_spike_flags_bucket_matches_brute():
    rng = np.random.default_rng(11)
    keys, ts, vals = _mk(rng, n=600)
    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    g = pa.table(
        {
            "series_key": pa.array(keys),
            "window_start": pa.array(ts - ts % US_1M, pa.int64()),
            "v": pa.array(cents, pa.int64()),
        }
    )
    got = spike_flags_bucket(g, lookback=10, min_baseline=3)
    want = brute_spike(keys, ts, cents, US_1M, 10, 3)
    assert got.num_rows == len(want)
    for row in got.to_pylist():
        key = (row["series_key"], row["window_start"])
        w, n, cnt, tmax, tmin, up, dn = want[key]
        assert (row["wsum"], row["n"], row["n_baseline"]) == (w, n, cnt), key
        assert (row["trailing_max"], row["trailing_min"]) == (tmax, tmin), key
        assert (row["spike_up"], row["spike_down"]) == (up, dn), key


def test_spike_flags_known_spike():
    """A flat series then a 2x jump flags spike_up only at the jump."""
    n = 8
    g = pa.table(
        {
            "series_key": pa.array(["a"] * n),
            "window_start": pa.array(
                np.arange(n, dtype=np.int64) * US_1M, pa.int64()
            ),
            "v": pa.array(
                np.array([100] * (n - 1) + [200], np.int64), pa.int64()
            ),
        }
    )
    rows = spike_flags_bucket(g, 10, 3).to_pylist()
    rows.sort(key=lambda r: r["window_start"])
    assert [r["spike_up"] for r in rows] == [
        None, None, None, False, False, False, False, True,
    ]
    assert not any(r["spike_down"] for r in rows if r["spike_down"] is not None)


def test_interval_join_broadcast(ray_session):
    import ray.data

    from beamium_ray.stages.window import interval_join_broadcast

    rng = np.random.default_rng(17)
    n = 300
    ts = rng.integers(0, 1000, n).astype(np.int64)
    rid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts), "rid": pa.array(rid)})
    ).repartition(5)
    # overlapping intervals: a row in the overlap matches BOTH
    intervals = pa.table(
        {
            "interval_id": pa.array(np.array([1, 2, 3], np.int64)),
            "lo": pa.array(np.array([100, 150, 900], np.int64)),
            "hi": pa.array(np.array([200, 300, 950], np.int64)),
        }
    )
    out = interval_join_broadcast(
        ds, intervals, ts_col="ts", out_cols=["rid", "ts"]
    ).to_pandas()
    want = []
    for i, (lo, hi) in enumerate([(100, 200), (150, 300), (900, 950)], 1):
        for r, t in zip(rid, ts):
            if lo <= t < hi:
                want.append((i, int(r)))
    got = sorted(zip(out["interval_id"], out["rid"]))
    assert got == sorted(want)
    # row in [150, 200) overlap carries both interval ids
    both = [r for r in rid if 150 <= ts[r] < 200]
    if both:
        sub = out[out["rid"] == both[0]]
        assert sorted(sub["interval_id"]) == [1, 2]


def test_interval_levels_sweep():
    """Sweep coloring: levels are non-overlapping within themselves and
    the level count equals the max overlap depth."""
    from beamium_ray.stages.window import _interval_levels

    rng = np.random.default_rng(23)
    lo = rng.integers(0, 900, 200).astype(np.int64)
    hi = lo + rng.integers(1, 200, 200).astype(np.int64)
    lvl, n_lvl = _interval_levels(lo, hi)
    # within a level: no two intervals overlap
    for v in range(n_lvl):
        idx = np.flatnonzero(lvl == v)
        o = np.argsort(lo[idx])
        assert (hi[idx][o][:-1] <= lo[idx][o][1:]).all()
    # level count == max stabbing depth (interval graphs are perfect)
    probes = np.unique(lo)
    depth = max(
        int(((lo <= p) & (p < hi)).sum()) for p in probes.tolist()
    )
    assert n_lvl == depth


def test_interval_join_sorted_equals_scan(ray_session):
    """The sorted-endpoint escalation (many overlapping intervals,
    several levels) matches the per-interval scan exactly."""
    import ray.data

    from beamium_ray.stages.window import (
        interval_join,
        interval_join_broadcast,
        interval_join_sorted,
    )

    rng = np.random.default_rng(41)
    n = 500
    ts = rng.integers(0, 2000, n).astype(np.int64)
    rid = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts), "rid": pa.array(rid)})
    ).repartition(4)
    m = 120  # > scan_threshold → auto route picks 'sorted'
    lo = rng.integers(0, 1900, m).astype(np.int64)
    hi = lo + rng.integers(1, 400, m).astype(np.int64)
    intervals = pa.table(
        {
            "interval_id": pa.array(np.arange(1, m + 1, dtype=np.int64)),
            "lo": pa.array(lo),
            "hi": pa.array(hi),
        }
    )

    def pairs(out):
        return sorted(zip(out["interval_id"], out["rid"]))

    scan = pairs(
        interval_join_broadcast(
            ds, intervals, ts_col="ts", out_cols=["rid"]
        ).to_pandas()
    )
    srt = pairs(
        interval_join_sorted(
            ds, intervals, ts_col="ts", out_cols=["rid"]
        ).to_pandas()
    )
    auto = pairs(
        interval_join(
            ds, intervals, ts_col="ts", out_cols=["rid"]
        ).to_pandas()
    )
    assert srt == scan and auto == scan and len(scan) > 0


def test_interval_join_sorted_empty_interval_shadow(ray_session):
    """An empty interval (hi == lo) sharing its lo with a real interval
    must not shadow the real one at the searchsorted stab (empty
    intervals match nothing under lo <= ts < hi, in both routes)."""
    import ray.data

    from beamium_ray.stages.window import (
        interval_join_broadcast,
        interval_join_sorted,
    )

    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(np.array([7, 5, 12], np.int64)),
                "rid": pa.array(np.array([0, 1, 2], np.int64)),
            }
        )
    )
    intervals = pa.table(
        {
            # real [5,10) listed BEFORE empty [5,5): stable lo-sort keeps
            # this order, so the stab lands on the empty one without the fix
            "interval_id": pa.array(np.array([1, 2, 3], np.int64)),
            "lo": pa.array(np.array([5, 5, 11], np.int64)),
            "hi": pa.array(np.array([10, 5, 13], np.int64)),
        }
    )

    def pairs(out):
        return sorted(zip(out["interval_id"], out["rid"]))

    scan = pairs(
        interval_join_broadcast(
            ds, intervals, ts_col="ts", out_cols=["rid"]
        ).to_pandas()
    )
    srt = pairs(
        interval_join_sorted(
            ds, intervals, ts_col="ts", out_cols=["rid"]
        ).to_pandas()
    )
    assert srt == scan == [(1, 0), (1, 1), (3, 2)]

    # all-empty interval table: both routes return zero rows, no crash
    empt = pa.table(
        {
            "interval_id": pa.array(np.array([9], np.int64)),
            "lo": pa.array(np.array([5], np.int64)),
            "hi": pa.array(np.array([5], np.int64)),
        }
    )
    assert (
        interval_join_sorted(ds, empt, ts_col="ts", out_cols=["rid"])
        .to_pandas()
        .shape[0]
        == 0
    )
