"""Driver-contract smoke + hot-key skew behavior."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    rows = res.take_all()
    assert len(rows) > 0
    cols = set(rows[0])
    assert {"series_key", "window_start", "vmin", "vmax", "vsum", "n"} <= cols

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls) <= set(qs)  # every oracle has a query
    assert len(qs) >= 20 and len(sqls) >= 13


def test_combiner_bounds_hot_series():
    """Skew story (SURVEY §4.1): a series with 90% of a batch's rows
    still emits at most one partial row per window — hot keys are
    neutralized before the shuffle, no salting needed downstream."""
    from beamium_ray.stages.rollup import partial_rollup_batch

    n = 100_000
    rng = np.random.default_rng(1)
    hot = rng.random(n) < 0.9
    keys = np.where(hot, "hot", "cold")
    ts = rng.integers(0, 600_000, n)  # 10 windows of 60_000
    t = pa.table(
        {
            "series_key": pa.array(keys.tolist(), pa.string()),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array(rng.normal(0, 1, n), pa.float64()),
            "order": pa.array(np.arange(n), pa.int64()),
        }
    )
    p = partial_rollup_batch(t, 60_000, order_col="order", num_buckets=8)
    assert p.num_rows <= 2 * 10  # 2 series × 10 windows
    hot_rows = p.filter(pa.compute.equal(p["series_key"], "hot"))
    assert hot_rows.num_rows == 10
    assert pa.compute.sum(hot_rows["n"]).as_py() == int(hot.sum())


def test_multi_source_union(ray_session, tmp_path):
    """Multiple scrape sources = multiple input dirs in one read (S1)."""
    from beamium_ray.sources.tokens import generate_dataset, read_sequences

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate_dataset(d1, 2000, rows_per_file=1000)
    generate_dataset(d2, 2000, rows_per_file=1000)
    paths = [f"{d1}/sequences-00000.parquet", f"{d1}/sequences-00001.parquet",
             f"{d2}/sequences-00000.parquet"]
    ds = read_sequences(paths, columns=["doc_id", "n_tok"])
    assert ds.count() == 3000
