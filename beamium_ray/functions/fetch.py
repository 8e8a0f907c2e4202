"""Shared 'fetch rows by id' primitive: ONE filtered streaming pass
over a Dataset, yielding only rows whose id is in the requested set.

Used by the dedup/similarity verification steps (shingle sets,
signatures, vectors) — the requested set is the SMALL side (candidate
ids), broadcast into the filter via ``pc.is_in``; only matching rows
ever reach the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def iter_rows_by_ids(ds, id_col: str, ids: np.ndarray, columns=None):
    """Yield pyarrow batches of the rows whose ``id_col`` ∈ ``ids``
    (whole-block batches; empty batches skipped)."""
    need = pa.array(np.unique(np.asarray(ids)))

    def grab(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b[id_col], value_set=need))
        return t.select(columns) if columns else t

    for b in ds.map_batches(
        grab, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            yield b
