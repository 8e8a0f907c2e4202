"""The engine's ONE canonical continuous-quantile interpolation.

One-sided lerp ``v[lo] + frac * (v[hi] - v[lo])`` at group-relative
position ``pos = q * (len - 1)`` — DuckDB ``quantile_cont``'s formula,
which every quantile kernel AND the SQL oracle must share bit-for-bit
(value hashes compare int64 micro-units). Deliberately NOT
``np.quantile``: numpy's ``_lerp`` switches to ``b - (b-a)*(1-t)`` for
``t >= 0.5`` and differs at ulp boundaries that survive micro-unit
rounding (1840625 vs 1840626 measured on a 2-value group, ADVICE r4).
Defined once here so a future ulp-level fix lands in every caller.
"""

from __future__ import annotations

import numpy as np


def grouped_quantile_sorted(
    v: np.ndarray, starts: np.ndarray, lens: np.ndarray, q: float
) -> np.ndarray:
    """One quantile per group over ``v``, where group g occupies the
    SORTED slice ``v[starts[g] : starts[g] + lens[g]]``. Vectorized
    across groups; position arithmetic stays group-RELATIVE (an
    absolute ``pos`` would grow float64 ulp error with the group's
    offset in the buffer and break micro-unit hashes at scale)."""
    pos = q * (lens - 1)
    lo_rel = np.floor(pos).astype(np.int64)
    frac = pos - lo_rel
    lo = starts + lo_rel
    hi = np.minimum(lo + 1, starts + lens - 1)
    return v[lo] + frac * (v[hi] - v[lo])


def quantile_sorted(v: np.ndarray, q: float) -> float:
    """Single-group convenience over an already-sorted 1-D array."""
    one = np.array([0], np.int64)
    return float(
        grouped_quantile_sorted(v, one, np.array([len(v)], np.int64), q)[0]
    )
