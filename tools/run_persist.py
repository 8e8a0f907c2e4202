"""Standalone persisting-rollup driver (used by the crash-resume test).

Usage: python tools/run_persist.py <out_dir> [n_rows] [num_cpus]

Generates a deterministic datapoint table, runs rollup_to_blocks, and
prints the run manifest as one JSON line. Safe to SIGKILL at any point;
a rerun resumes from committed bucket manifests.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def make_points(n: int) -> pa.Table:
    rng = np.random.default_rng(11)
    return pa.table(
        {
            "series_key": pa.array(
                rng.choice([f"s{i}" for i in range(40)], n).tolist(), pa.string()
            ),
            "ts": pa.array(rng.integers(0, 200_000_000, n), pa.int64()),
            "value": pa.array(np.round(rng.normal(0, 5, n), 2), pa.float64()),
            "order": pa.array(np.arange(n), pa.int64()),
        }
    )


def main():
    out_dir = sys.argv[1]
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from beamium_ray.config import EngineConfig
    from beamium_ray.pipelines.persist import rollup_to_blocks

    cfg = EngineConfig(
        tiers={"1m": 60_000, "1h": 3_600_000},
        num_buckets=16,
        output_dir=out_dir,
    )
    ds = ray.data.from_arrow(make_points(n_rows)).repartition(8)
    run, _rows = rollup_to_blocks(ds, cfg, [f"synthetic://{n_rows}"], out_dir)
    print(json.dumps(run))
    ray.shutdown()


if __name__ == "__main__":
    main()
