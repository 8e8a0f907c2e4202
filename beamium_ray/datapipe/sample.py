"""Deterministic hash-based corpus sampling (data mixing).

The subsampling step of a training-data pipeline: keep each record
with a per-stratum probability, decided by a salted hash of a stable
key — NOT an RNG — so the sample is

- reproducible (same salt → byte-identical sample on every run and
  every cluster size; resumable runs re-derive the same decisions),
- coordinated-free (a pure map stage: no shuffle, no driver state;
  at 100 TB each block decides its own rows), and
- oracle-checkable (the DuckDB gate recomputes the same splitmix64
  threshold test row by row).

Rates are integer parts-per-million so the comparison is exact
integer math — no float boundary can flip a row between the engine
and the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.functions.hashing import splitmix64

SAMPLE_SALT = 0x452821E638D01377  # pi hex digits, < 2^63 (SQL literal)
PPM = 1_000_000


def sample_mask(
    keys: np.ndarray,
    rate_ppm: np.ndarray | int,
    salt: int = SAMPLE_SALT,
) -> np.ndarray:
    """keep[i] = splitmix64(key ^ salt) % 1e6 < rate_ppm[i] — the
    uniform-in-[0,1e6) hash draw every stratum shares."""
    h = splitmix64(keys.astype(np.uint64) ^ np.uint64(salt))
    return (h % np.uint64(PPM)).astype(np.int64) < rate_ppm


def hash_sample(
    ds,
    key_col: str,
    rate_ppm: int = PPM // 2,
    strat_col: str | None = None,
    rates_ppm: dict[str, int] | None = None,
    salt: int = SAMPLE_SALT,
):
    """Filter ``ds`` down to a deterministic sample.

    Flat mode: every row kept with probability ``rate_ppm``/1e6.
    Stratified mode (``strat_col`` + ``rates_ppm``): each stratum value
    gets its own rate (missing strata fall back to ``rate_ppm``) — the
    data-mixing knob (e.g. upsample books, downsample crawl).

    Pure map stage, pyarrow batches, no shuffle."""
    rates = rates_ppm or {}

    def f(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        k = batch[key_col].to_numpy(zero_copy_only=False)
        if strat_col is None:
            r = rate_ppm
        else:
            s = batch[strat_col]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            r = np.full(batch.num_rows, rate_ppm, np.int64)
            for val, ppm in rates.items():  # small dict: strata, not rows
                hit = pc.equal(s, val).to_numpy(zero_copy_only=False)
                r[hit] = ppm
        return batch.filter(pa.array(sample_mask(k, r, salt)))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)
