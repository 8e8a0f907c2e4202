"""Rollup correctness: hand fixtures + brute-force oracle (duckdb) + Ray e2e."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from beamium_ray.stages.rollup import (
    cascade_tier,
    gapfill_tier,
    merge_cascade_gapfill,
    merge_partials,
    partial_rollup_batch,
    rollup_dataset,
)

TIERS = {"1m": 60, "1h": 3600}  # seconds-as-µs toy tiers for readable fixtures


def mk(ts, key, val, order=None):
    n = len(ts)
    return pa.table(
        {
            "series_key": pa.array(key, pa.string()),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array(val, pa.float64()),
            "order": pa.array(order if order else list(range(n)), pa.int64()),
        }
    )


def full_rollup(t, tiers, gapfill=False, num_buckets=1, batches=None):
    """Drive the kernels directly (no Ray): split into batches → partial →
    merge/cascade/gapfill, as the Dataset pipeline does."""
    base = min(tiers.values())
    if batches is None:
        batches = [t]
    partials = pa.concat_tables(
        [
            partial_rollup_batch(b, base, order_col="order", num_buckets=num_buckets)
            for b in batches
        ]
    )
    return merge_cascade_gapfill(partials, tiers, gapfill)


def test_hand_fixture():
    # 2 series, windows of 60: s1 has pts at 10,50 (w0) and 70 (w60);
    # s2 one pt at 130 (w120)
    t = mk(
        ts=[10, 50, 70, 130],
        key=["s1", "s1", "s1", "s2"],
        val=[5.0, 3.0, 7.0, 2.0],
    )
    out = full_rollup(t, {"1m": 60})
    rows = {
        (r["series_key"], r["window_start"]): r for r in out.to_pylist()
    }
    r = rows[("s1", 0)]
    assert (r["vmin"], r["vmax"], r["vsum"], r["n"], r["last"]) == (3, 5, 8, 2, 3)
    r = rows[("s1", 60)]
    assert (r["vmin"], r["vmax"], r["vsum"], r["n"], r["last"]) == (7, 7, 7, 1, 7)
    r = rows[("s2", 120)]
    assert r["last_ts"] == 130


def test_last_tiebreak_on_order():
    # equal ts → greater order wins, across batch splits too
    t1 = mk(ts=[100], key=["s"], val=[1.0], order=[5])
    t2 = mk(ts=[100], key=["s"], val=[2.0], order=[9])
    out = full_rollup(
        pa.concat_tables([t1, t2]), {"1m": 60}, batches=[t1, t2]
    )
    assert out.to_pylist()[0]["last"] == 2.0
    out = full_rollup(
        pa.concat_tables([t2, t1]), {"1m": 60}, batches=[t2, t1]
    )
    assert out.to_pylist()[0]["last"] == 2.0


def test_cascade_matches_direct():
    rng = np.random.default_rng(42)
    n = 5000
    t = mk(
        ts=rng.integers(0, 100_000, n).tolist(),
        key=rng.choice(["a", "b", "c"], n).tolist(),
        val=np.round(rng.normal(0, 10, n), 2).tolist(),
        order=list(range(n)),
    )
    # batched partial → cascade 1h from 1m
    out = full_rollup(t, TIERS, batches=[t.slice(0, 1700), t.slice(1700, 1700), t.slice(3400)])
    got_1h = out.filter(pa.compute.equal(out["tier"], "1h")).drop_columns(["tier"])
    # direct rollup at 1h only
    direct = full_rollup(t, {"1h": 3600}).drop_columns(["tier"])
    got_1h = got_1h.sort_by([("series_key", "ascending"), ("window_start", "ascending")])
    direct = direct.sort_by([("series_key", "ascending"), ("window_start", "ascending")])
    assert got_1h.num_rows == direct.num_rows
    for col in got_1h.column_names:
        if col == "vsum":  # float addition order differs between paths
            assert np.allclose(
                got_1h[col].to_numpy(), direct[col].to_numpy(), rtol=1e-12
            )
        else:
            assert got_1h[col].to_pylist() == direct[col].to_pylist(), col


def test_rollup_vs_duckdb_oracle():
    import duckdb

    rng = np.random.default_rng(7)
    n = 20000
    keys = rng.choice([f"s{i}" for i in range(50)], n).tolist()
    ts = rng.integers(0, 10_000_000, n)
    # unique (ts, order): order = row idx
    vals = np.round(rng.normal(100, 30, n), 2)
    t = mk(ts=ts.tolist(), key=keys, val=vals.tolist(), order=list(range(n)))

    out = full_rollup(t, {"1m": 60_000_000 // 1000}, batches=[t.slice(i, 3000) for i in range(0, n, 3000)])
    out = out.drop_columns(["tier", "last_ts", "last_order"])

    con = duckdb.connect()
    con.register("pts", t.to_pandas())
    tier = 60_000
    oracle = con.execute(
        f"""
        WITH w AS (
          SELECT series_key, ts - (ts % {tier}) AS window_start, value, ts, "order",
                 row_number() OVER (PARTITION BY series_key, ts - (ts % {tier})
                                    ORDER BY ts DESC, "order" DESC) AS rn
          FROM pts)
        SELECT series_key, window_start,
               min(value) AS vmin, max(value) AS vmax, sum(value) AS vsum,
               count(*) AS n,
               max(CASE WHEN rn = 1 THEN value END) AS last
        FROM w GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).arrow()
    got = out.sort_by([("series_key", "ascending"), ("window_start", "ascending")])
    assert got.num_rows == oracle.num_rows
    for col in ["series_key", "window_start", "vmin", "vmax", "n", "last"]:
        assert got[col].to_pylist() == oracle[col].to_pylist(), col
    assert np.allclose(got["vsum"].to_numpy(), oracle["vsum"].to_numpy(), rtol=1e-12)


def test_gapfill():
    t = mk(ts=[0, 130, 250], key=["s", "s", "s"], val=[1.0, 2.0, 3.0])
    out = full_rollup(t, {"1m": 60}, gapfill=True)
    rows = out.to_pylist()
    wins = [r["window_start"] for r in rows]
    assert wins == [0, 60, 120, 180, 240]
    gap = rows[1]
    assert gap["n"] == 0 and gap["vmin"] is None and gap["last"] is None
    assert rows[3]["n"] == 0
    # two series, independent ranges
    t2 = mk(ts=[0, 120, 60], key=["a", "a", "b"], val=[1.0, 2.0, 3.0])
    out2 = full_rollup(t2, {"1m": 60}, gapfill=True)
    got = [(r["series_key"], r["window_start"], r["n"]) for r in out2.to_pylist()]
    assert got == [("a", 0, 1), ("a", 60, 0), ("a", 120, 1), ("b", 60, 1)]


def test_null_values_excluded():
    t = pa.table(
        {
            "series_key": pa.array(["s", "s"]),
            "ts": pa.array([10, 20], pa.int64()),
            "value": pa.array([1.0, None], pa.float64()),
            "order": pa.array([0, 1], pa.int64()),
        }
    )
    out = full_rollup(t, {"1m": 60})
    r = out.to_pylist()[0]
    assert r["n"] == 1 and r["last"] == 1.0 and r["last_ts"] == 10


def test_rollup_dataset_e2e(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 30000
    t = mk(
        ts=rng.integers(0, 3_000_000, n).tolist(),
        key=rng.choice([f"s{i}" for i in range(20)], n).tolist(),
        val=np.round(rng.normal(0, 5, n), 2).tolist(),
        order=list(range(n)),
    )
    ds = ray.data.from_arrow(t).repartition(8)
    out = rollup_dataset(
        ds, {"1m": 60_000, "1h": 3_600_000}, order_col="order", num_buckets=8
    )
    got = out.take_all()
    want = full_rollup(
        t,
        {"1m": 60_000, "1h": 3_600_000},
        gapfill=True,
        batches=[t.slice(i, 5000) for i in range(0, n, 5000)],
    )
    want_rows = sorted(
        want.to_pylist(), key=lambda r: (r["tier"], r["series_key"], r["window_start"])
    )
    got_rows = sorted(
        got, key=lambda r: (r["tier"], r["series_key"], r["window_start"])
    )
    assert len(got_rows) == len(want_rows)
    for g, w in zip(got_rows, want_rows):
        gs, ws = g.pop("vsum"), w.pop("vsum")
        assert g == w
        if gs is None:
            assert ws is None
        else:  # float addition order differs with batching
            assert abs(gs - ws) <= 1e-9 * max(1.0, abs(ws))


def test_gapfill_max_gap_cap():
    # hole of 4 windows between 0 and 300; cap 3 leaves it unfilled,
    # cap 4 fills it (scale-safety valve)
    t = mk(ts=[0, 300, 360], key=["s", "s", "s"], val=[1.0, 2.0, 3.0])
    base = min({"1m": 60}.values())
    p = partial_rollup_batch(t, base, order_col="order", num_buckets=1)
    capped = merge_cascade_gapfill(p, {"1m": 60}, True, gapfill_max_gap=3)
    assert [r["window_start"] for r in capped.to_pylist()] == [0, 300, 360]
    filled = merge_cascade_gapfill(p, {"1m": 60}, True, gapfill_max_gap=4)
    assert [r["window_start"] for r in filled.to_pylist()] == [0, 60, 120, 180, 240, 300, 360]
    uncapped = merge_cascade_gapfill(p, {"1m": 60}, True)
    assert uncapped.num_rows == 7


def test_non_nested_tiers_rejected():
    # 45m is a multiple of 1m but NOT of nothing-coarser; 2h is not a
    # multiple of 45m → cascade would floor straddling windows wrongly
    t = mk(ts=[10], key=["s"], val=[1.0])
    p = partial_rollup_batch(t, 60, order_col="order", num_buckets=1)
    with pytest.raises(ValueError, match="not a multiple of the previous"):
        merge_cascade_gapfill(p, {"1m": 60, "45m": 2700, "2h": 7200}, False)
    # properly nested tiers still fine
    merge_cascade_gapfill(p, {"1m": 60, "45m": 2700, "2h15": 8100}, False)


# ---------------------------------------------------------------------------
# include_first (M4 mode: min/max/first/last per window)
# ---------------------------------------------------------------------------


def full_rollup_m4(t, tiers, gapfill=False, batches=None):
    base = min(tiers.values())
    if batches is None:
        batches = [t]
    partials = pa.concat_tables(
        [
            partial_rollup_batch(
                b, base, order_col="order", num_buckets=1, include_first=True
            )
            for b in batches
        ]
    )
    return merge_cascade_gapfill(partials, tiers, gapfill)


def test_first_tiebreak_on_order():
    # equal ts → LEAST order wins for first (mirror of last), across splits
    t1 = mk(ts=[100], key=["s"], val=[1.0], order=[5])
    t2 = mk(ts=[100], key=["s"], val=[2.0], order=[9])
    for batches in ([t1, t2], [t2, t1]):
        out = full_rollup_m4(
            pa.concat_tables(batches), {"1m": 60}, batches=batches
        )
        row = out.to_pylist()[0]
        assert row["first"] == 1.0 and row["last"] == 2.0


def test_merge_first_and_last_need_different_partials():
    """The counterexample that forces the second merge pass: partial A
    holds both the group's earliest first AND latest last; partial B
    sits between. Sorting by last alone would pick B's first."""
    a = mk(ts=[10, 90], key=["s", "s"], val=[1.0, 9.0], order=[0, 3])
    b = mk(ts=[40], key=["s"], val=[5.0], order=[1])
    for batches in ([a, b], [b, a]):
        out = full_rollup_m4(
            pa.concat_tables(batches), {"1m": 100}, batches=batches
        )
        row = out.to_pylist()[0]
        assert row["first"] == 1.0, batches
        assert row["last"] == 9.0, batches


def test_cascade_first_matches_direct():
    rng = np.random.default_rng(99)
    n = 4000
    t = mk(
        ts=rng.integers(0, 100_000, n).tolist(),
        key=rng.choice(["a", "b"], n).tolist(),
        val=np.round(rng.normal(0, 10, n), 2).tolist(),
        order=list(range(n)),
    )
    out = full_rollup_m4(
        t, TIERS, batches=[t.slice(0, 1500), t.slice(1500, 1500), t.slice(3000)]
    )
    got_1h = out.filter(pa.compute.equal(out["tier"], "1h"))
    direct = full_rollup_m4(t, {"1h": 3600})
    key = lambda tbl: sorted(
        zip(
            tbl["series_key"].to_pylist(),
            tbl["window_start"].to_pylist(),
            tbl["first"].to_pylist(),
            tbl["last"].to_pylist(),
        )
    )
    assert key(got_1h) == key(direct)


def test_gapfill_first_null_on_gap_rows():
    t = mk(ts=[10, 130], key=["s", "s"], val=[1.0, 2.0])
    out = full_rollup_m4(t, {"1m": 60}, gapfill=True)
    rows = {r["window_start"]: r for r in out.to_pylist()}
    assert rows[0]["first"] == 1.0
    assert rows[60]["first"] is None and rows[60]["n"] == 0
    assert rows[120]["first"] == 2.0


def _sorted_tiers(t: pa.Table) -> pa.Table:
    keys = [
        ("tier", "ascending"),
        ("series_key", "ascending"),
        ("window_start", "ascending"),
    ]
    return t.sort_by([k for k in keys if k[0] in t.column_names])


def _assert_tier_tables_equal(got: pa.Table, want: pa.Table, ctx: str):
    got, want = _sorted_tiers(got), _sorted_tiers(want)
    assert got.num_rows == want.num_rows, ctx
    assert got.column_names == want.column_names, ctx
    for col in got.column_names:
        if col == "vsum":  # float addition order differs between paths
            g = got[col].to_numpy(zero_copy_only=False)
            w = want[col].to_numpy(zero_copy_only=False)
            assert np.allclose(g, w, rtol=1e-12, equal_nan=True), (ctx, col)
        else:
            assert got[col].to_pylist() == want[col].to_pylist(), (ctx, col)


def test_merge_tiers_with_prior_equals_cascade_on_untruncated_prior():
    """The incremental-append claim (persist.py): folding new partials
    into EACH tier's own stored rows is exactly the cascade over
    (prior partials ∪ new partials) when no tier was truncated —
    seeded battery over random splits, with and without gap-fill and
    the first/M4 columns."""
    import pyarrow.compute as pc

    from beamium_ray.stages.rollup import merge_tiers_with_prior

    tiers = {"1m": 60, "1h": 3600}
    for seed in range(6):
        rng = np.random.default_rng(seed)
        n = 2500
        t = mk(
            ts=rng.integers(0, 90_000, n).tolist(),
            key=rng.choice(["a", "b", "c", "d"], n).tolist(),
            val=np.round(rng.normal(0, 10, n), 2).tolist(),
            order=list(range(n)),
        )
        s = n * (seed + 1) // 8
        gapfill = seed % 2 == 0
        first = seed % 3 == 0
        P, N = t.slice(0, s), t.slice(s)
        pP = partial_rollup_batch(
            P, 60, order_col="order", num_buckets=1, include_first=first
        )
        pN = partial_rollup_batch(
            N, 60, order_col="order", num_buckets=1, include_first=first
        )
        want = merge_cascade_gapfill(
            pa.concat_tables([pP, pN]), tiers, gapfill
        )
        # prior per tier = a previous run's stored rows: the cascade
        # output split by tier, gap rows dropped (n=0), as persist does
        prior_full = merge_cascade_gapfill(pP, tiers, gapfill)
        prior = {}
        for name in tiers:
            pt = prior_full.filter(
                pc.equal(prior_full["tier"], name)
            ).drop_columns(["tier"])
            prior[name] = pt.filter(pc.greater(pt["n"], 0))
        got = merge_tiers_with_prior(pN.drop_columns(["bucket"]), tiers, prior, gapfill)
        _assert_tier_tables_equal(got, want, f"seed={seed}")


def test_merge_tiers_with_prior_non_nested_tiers_vs_direct():
    """merge_tiers_with_prior only needs each tier to be a multiple of
    the BASE (weaker than the cascade's pairwise nesting): 180s is not
    a multiple of 120s, so the cascade rejects this tier set — the
    per-tier merge must still match a direct rollup of ALL datapoints
    at each tier."""
    import pyarrow.compute as pc

    from beamium_ray.stages.rollup import merge_tiers_with_prior

    tiers = {"1m": 60, "2m": 120, "3m": 180}
    with pytest.raises(ValueError):
        merge_cascade_gapfill(
            partial_rollup_batch(
                mk(ts=[10], key=["s"], val=[1.0]), 60, order_col="order"
            ),
            tiers,
        )
    rng = np.random.default_rng(99)
    n = 2000
    t = mk(
        ts=rng.integers(0, 50_000, n).tolist(),
        key=rng.choice(["a", "b"], n).tolist(),
        val=np.round(rng.normal(0, 10, n), 2).tolist(),
        order=list(range(n)),
    )
    P, N = t.slice(0, 900), t.slice(900)
    pP = partial_rollup_batch(P, 60, order_col="order", num_buckets=1)
    pN = partial_rollup_batch(N, 60, order_col="order", num_buckets=1)
    # stored tier state = prior partials re-floored to the tier and
    # merged (what a previous run's blocks hold for that tier)
    prior = {}
    for name, us in tiers.items():
        pt = merge_tiers_with_prior(
            pP, {"base": 60, name: us} if us != 60 else {name: us},
            {}, gapfill=False,
        )
        pt = pt.filter(pa.compute.equal(pt["tier"], name))
        prior[name] = pt.drop_columns(["tier"])
    got = merge_tiers_with_prior(pN, tiers, prior, gapfill=True)
    for name, us in tiers.items():
        want = full_rollup(t, {name: us}, gapfill=True).drop_columns(["tier"])
        g = got.filter(pc.equal(got["tier"], name)).drop_columns(["tier"])
        _assert_tier_tables_equal(g, want, name)


def test_merge_tiers_with_prior_rejects_misaligned_prior():
    """Stored rows passed under the wrong tier name (finer-granularity
    windows) must fail loudly at the boundary, not corrupt gap-fill."""
    from beamium_ray.stages.rollup import merge_tiers_with_prior

    pN = partial_rollup_batch(
        mk(ts=[10, 200], key=["s", "s"], val=[1.0, 2.0]),
        60, order_col="order", num_buckets=1,
    )
    base_rows = merge_tiers_with_prior(
        pN, {"1m": 60}, {}, gapfill=False
    ).drop_columns(["tier"])
    with pytest.raises(ValueError, match="not aligned"):
        merge_tiers_with_prior(
            pN, {"1m": 60, "1h": 3600}, {"1h": base_rows}, gapfill=False
        )
