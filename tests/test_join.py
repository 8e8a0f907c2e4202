"""hash_join / broadcast_lookup vs pandas-merge brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from beamium_ray.datapipe.join import broadcast_lookup, hash_join


def _mk_tables(rng, n_left=300, n_right=80, key_space=60, strings=False):
    lk = rng.integers(0, key_space, n_left).astype(np.int64)
    rk = rng.integers(0, key_space, n_right).astype(np.int64)  # dup keys
    if strings:
        left = pa.table(
            {
                "k": pa.array([f"k{v}" for v in lk]),
                "lv": pa.array(np.arange(n_left, dtype=np.int64)),
            }
        )
        right = pa.table(
            {
                "k": pa.array([f"k{v}" for v in rk]),
                "rv": pa.array(np.arange(n_right, dtype=np.int64) * 10),
            }
        )
    else:
        left = pa.table(
            {
                "k": pa.array(lk),
                "lv": pa.array(np.arange(n_left, dtype=np.int64)),
            }
        )
        right = pa.table(
            {
                "k": pa.array(rk),
                "rv": pa.array(np.arange(n_right, dtype=np.int64) * 10),
            }
        )
    return left, right


def _want(left, right, how):
    lp = left.to_pandas()
    rp = right.to_pandas()
    m = lp.merge(rp, on="k", how=how)
    return sorted(
        (r.k, r.lv, None if pd.isna(r.rv) else int(r.rv))
        for r in m.itertuples(index=False)
    )


def _got(ds):
    df = ds.to_pandas()
    return sorted(
        (r.k, r.lv, None if pd.isna(r.rv) else int(r.rv))
        for r in df.itertuples(index=False)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("strings", [False, True])
def test_hash_join_matches_pandas(ray_session, how, strings):
    import ray.data

    rng = np.random.default_rng(23)
    left, right = _mk_tables(rng, strings=strings)
    want = _want(left, right, how)
    for nblocks in (1, 5):
        out = hash_join(
            ray.data.from_arrow(left).repartition(nblocks),
            ray.data.from_arrow(right).repartition(nblocks),
            on="k",
            how=how,
            num_buckets=4,
        )
        assert _got(out) == want, (how, strings, nblocks)


def test_hash_join_null_keys_never_match(ray_session):
    import ray.data

    left = pa.table(
        {
            "k": pa.array([1, None, 2, None], pa.int64()),
            "lv": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, None], pa.int64()),
            "rv": pa.array([10, 99], pa.int64()),
        }
    )
    inner = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", how="inner", num_buckets=2,
    ).to_pandas()
    assert sorted(zip(inner["lv"], inner["rv"])) == [(0, 10)]
    lj = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", how="left", num_buckets=2,
    ).to_pandas()
    assert len(lj) == 4
    null_rows = lj[lj["lv"].isin([1, 3])]
    assert null_rows["rv"].isna().all()


def test_hash_join_collision_suffix(ray_session):
    import ray.data

    left = pa.table(
        {"k": pa.array([1], pa.int64()), "v": pa.array([5], pa.int64())}
    )
    right = pa.table(
        {"k": pa.array([1], pa.int64()), "v": pa.array([7], pa.int64())}
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", num_buckets=2,
    ).to_pandas()
    assert out.loc[0, "v"] == 5 and out.loc[0, "v_r"] == 7


def test_hash_join_collision_chain(ray_session):
    """Right carries BOTH v and v_r against a left v: the rename must
    chain (v→v_r_r) instead of silently dropping a column."""
    import ray.data

    left = pa.table(
        {"k": pa.array([1], pa.int64()), "v": pa.array([5], pa.int64())}
    )
    right = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "v": pa.array([7], pa.int64()),
            "v_r": pa.array([9], pa.int64()),
        }
    )
    out = hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", num_buckets=2,
    ).to_pandas()
    assert sorted(out.columns) == ["k", "v", "v_r", "v_r_r"]
    # sequential rename rule: right's v takes v_r first, so right's
    # real v_r chains to v_r_r — no column is ever silently dropped
    assert (
        out.loc[0, "v"],
        out.loc[0, "v_r"],
        out.loc[0, "v_r_r"],
    ) == (5, 7, 9)
    bl = broadcast_lookup(
        ray.data.from_arrow(left), right, on="k"
    ).to_pandas()
    assert sorted(bl.columns) == ["k", "v", "v_r", "v_r_r"]
    assert (bl.loc[0, "v"], bl.loc[0, "v_r"], bl.loc[0, "v_r_r"]) == (5, 7, 9)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_lookup_equals_hash_join(ray_session, how):
    import ray.data

    rng = np.random.default_rng(29)
    left, right = _mk_tables(rng, n_left=200, n_right=40)
    want = _want(left, right, how)
    got = broadcast_lookup(
        ray.data.from_arrow(left).repartition(4), right, on="k", how=how
    )
    assert _got(got) == want


def test_broadcast_lookup_null_right_keys(ray_session):
    import ray.data

    left = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "lv": pa.array([0, 1], pa.int64())}
    )
    right = pa.table(
        {
            "k": pa.array([1, None], pa.int64()),
            "rv": pa.array([10, 99], pa.int64()),
        }
    )
    out = broadcast_lookup(
        ray.data.from_arrow(left), right, on="k", how="left"
    ).to_pandas()
    got = sorted(
        (r.lv, None if pd.isna(r.rv) else int(r.rv))
        for r in out.itertuples(index=False)
    )
    assert got == [(0, 10), (1, None)]
