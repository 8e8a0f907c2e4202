"""Stable vectorized 64-bit hashing for partitioning / bucketing keys.

Used for: series_key → shuffle bucket (SURVEY.md §4.1 skew handling),
exact-dedup content hashes, and deterministic synthetic data generation.
Stability requirement is within-run / within-environment (every worker
process computes the same bucket for the same key); polars' xxhash64 and
pandas' hash_array both satisfy that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # polars ships vectorized xxhash64 — the fast path
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _HAVE_POLARS = False


def hash64(
    arr: pa.Array | pa.ChunkedArray | np.ndarray | list, seed: int = 42
) -> np.ndarray:
    """Deterministic uint64 hash per element (strings or ints).

    Different ``seed`` values give INDEPENDENT hash functions (xxhash
    seeding) — required when two hashes must jointly provide more than
    64 bits of collision resistance (a post-hoc mix of one hash is a
    bijection and adds zero entropy)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if _HAVE_POLARS:
        s = pl.from_arrow(arr) if isinstance(arr, pa.Array) else pl.Series(arr)
        return s.hash(seed=seed).to_numpy().astype(np.uint64)
    import os  # pragma: no cover - fallback path

    if not os.environ.get("BEAMIUM_ALLOW_PANDAS_HASH"):
        # the fallback produces DIFFERENT hashes than polars' xxhash64 —
        # a cluster where only some workers have polars would bucket the
        # same key differently and silently corrupt aggregates. Opt in
        # explicitly only on a homogeneous polars-free environment.
        raise RuntimeError(
            "polars is unavailable; refusing the pandas hash fallback "
            "(set BEAMIUM_ALLOW_PANDAS_HASH=1 on a homogeneous cluster)"
        )
    import pandas as pd

    vals = arr.to_numpy(zero_copy_only=False) if isinstance(arr, pa.Array) else np.asarray(arr)
    key = (f"{seed:016x}" * 2)[:16]
    return pd.util.hash_array(vals, categorize=False, hash_key=key).astype(
        np.uint64
    )


def bucket_of(arr, num_buckets: int) -> np.ndarray:
    """bucket = hash64(key) % B, as int32 (the shuffle key column)."""
    return (hash64(arr) % np.uint64(num_buckets)).astype(np.int32)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Pure-numpy stable integer mixer (for synthetic data / salts)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z
