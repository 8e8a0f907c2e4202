"""Vectorized relabel stages: add_labels (P6) and remove_labels (P7).

Reference behavior: ``src/lib/mod.rs:26-52`` (add: static labels are
PREPENDED, comma only when existing labels non-empty) and
``src/lib/mod.rs:55-101`` (remove: items split on ',' then '='; key is
the 2nd-from-last '='-part, value the last — so ``a=b=c`` re-emits as
``b=c``; items with no '=' vanish). These operate on the parsed
``labels`` string column (the text between '{' and '}'), which is
equivalent to the reference's whole-line string surgery because class
and value are carried in their own columns.

The scraper pipeline skips relabeling for '='-continuation lines
(ref ``src/scraper.rs:210``); callers pass a ``skip_mask`` for those.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.functions.encoding import (
    slice_rows,
    string_bytes,
    strings_from_bytes,
)

_EQ = 0x3D


def add_labels_column(
    labels: pa.Array | pa.ChunkedArray,
    static_labels: str,
    skip_mask: np.ndarray | None = None,
) -> pa.Array:
    """Prepend a static ``k=v,k=v`` string to every labels value."""
    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()
    if not static_labels:
        return labels
    empty = pc.equal(labels, "")
    out = pc.if_else(
        empty,
        pa.scalar(static_labels),
        pc.binary_join_element_wise(
            pa.scalar(static_labels + ","), labels, pa.scalar("")
        ),
    )
    if skip_mask is not None and skip_mask.any():
        out = pc.if_else(pa.array(skip_mask), labels, out)
    return out


def _eq_positions(data: np.ndarray, offsets: np.ndarray):
    """Per row: (last '=' local index or -1, 2nd-last or -1, count)."""
    n = len(offsets) - 1
    last = np.full(n, -1, dtype=np.int64)
    second = np.full(n, -1, dtype=np.int64)
    counts = np.zeros(n, dtype=np.int64)
    hits = np.flatnonzero(data == _EQ)
    if len(hits):
        rid = np.searchsorted(offsets, hits, side="right") - 1
        local = hits - offsets[rid]
        np.add.at(counts, rid, 1)
        last[rid] = local  # ascending: final assignment per row = last hit
        is_last = local == last[rid]
        rem_rid, rem_local = rid[~is_last], local[~is_last]
        second[rem_rid] = rem_local  # last of the remaining = 2nd-last
    return last, second, counts


def remove_labels_column(
    labels: pa.Array | pa.ChunkedArray,
    drop_keys: list[str],
    skip_mask: np.ndarray | None = None,
) -> pa.Array:
    """Drop label items whose key is in ``drop_keys`` (reference semantics)."""
    if isinstance(labels, pa.ChunkedArray):
        labels = labels.combine_chunks()
    if not drop_keys:
        return labels

    items_list = pc.split_pattern(labels, ",")
    list_off = items_list.offsets.to_numpy().astype(np.int64)
    items = items_list.values
    if len(items) == 0:
        return labels
    data, offsets = string_bytes(items)
    last, second, counts = _eq_positions(data, offsets)

    has_eq = counts >= 1
    keep_start = np.where(counts >= 2, second + 1, 0)
    # key = [keep_start, last)
    key_b, key_off = slice_rows(data, offsets, keep_start, np.where(has_eq, last, 0))
    keys = strings_from_bytes(key_b, key_off)
    dropped = pc.is_in(keys, value_set=pa.array(drop_keys)).to_numpy(
        zero_copy_only=False
    )
    keep_item = has_eq & ~dropped

    # surviving item text = item[keep_start:]
    lens = np.diff(offsets)
    surv_b, surv_off = slice_rows(data, offsets, keep_start, lens)
    surv = strings_from_bytes(surv_b, surv_off).filter(pa.array(keep_item))

    # regroup surviving items into per-row lists, join with ','
    item_rid = np.repeat(
        np.arange(len(list_off) - 1, dtype=np.int64), np.diff(list_off)
    )
    kept_per_row = np.bincount(item_rid[keep_item], minlength=len(list_off) - 1)
    new_off = np.concatenate(([0], np.cumsum(kept_per_row, dtype=np.int64)))
    relisted = pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), surv)
    out = pc.binary_join(relisted, ",")
    if skip_mask is not None and skip_mask.any():
        out = pc.if_else(pa.array(skip_mask), labels, out)
    return out


def relabel_batch(
    batch: pa.Table,
    add: str = "",
    drop: list[str] | None = None,
    labels_col: str = "labels",
    continuation_guard: bool = True,
) -> pa.Table:
    """Fused scraper relabel (P8 order: add then remove, ref scraper.rs:210-216).

    ``continuation_guard`` skips rows whose formatted line starts with '='
    (Warp10 continuation lines, ref ``src/scraper.rs:210``).
    """
    labels = batch[labels_col]
    skip = None
    if continuation_guard and "line" in batch.column_names:
        skip = pc.starts_with(batch["line"], "=").to_numpy(zero_copy_only=False)
        if not skip.any():
            skip = None
    if add:
        labels = add_labels_column(labels, add, skip)
    if drop:
        labels = remove_labels_column(labels, drop, skip)
    i = batch.column_names.index(labels_col)
    batch = batch.set_column(i, labels_col, labels)
    if "line" in batch.column_names and (add or drop):
        from beamium_ray.stages.parse import _compose_line

        new_line = _compose_line(
            batch["ts"], batch["class"], batch[labels_col], batch["value_str"]
        )
        if skip is not None:
            new_line = pc.if_else(pa.array(skip), batch["line"], new_line)
        batch = batch.set_column(
            batch.column_names.index("line"), "line", new_line
        )
    return batch
