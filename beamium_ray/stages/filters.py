"""Vectorized filter stages: metric whitelist (P5) and sink selector (P10).

Reference behavior:

- Metric whitelist: keep a line if it matches ANY configured regex,
  matched UNANCHORED against the WHOLE formatted line
  (``RegexSet::is_match``, ref ``src/scraper.rs:204-208``,
  ``src/conf.rs:228-233``).
- Sink selector: regex anchored as ``^pattern`` matched against the 2nd
  whitespace token (``class{labels}``); sinks with no selector receive
  everything; a line may match multiple sinks (multicast)
  (ref ``src/router.rs:179-197``, ``src/conf.rs:329-336``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def whitelist_mask(lines: pa.Array | pa.ChunkedArray, patterns: list[str]) -> pa.Array:
    """OR of unanchored regex matches against the formatted line."""
    if not patterns:
        import numpy as np

        return pa.array(np.ones(len(lines), dtype=bool))
    mask = None
    for p in patterns:
        m = pc.match_substring_regex(lines, p)
        mask = m if mask is None else pc.or_(mask, m)
    return mask


def whitelist_batch(batch: pa.Table, patterns: list[str], line_col: str = "line") -> pa.Table:
    if not patterns:
        return batch
    return batch.filter(whitelist_mask(batch[line_col], patterns))


def class_token(batch: pa.Table) -> pa.Array:
    """``class{labels}`` — the 2nd whitespace token of the formatted line.

    Valid because URL-encoding removes all whitespace from class/labels.
    """
    return pc.binary_join_element_wise(
        batch["class"], "{", batch["labels"], "}", ""
    )


def selector_mask(batch: pa.Table, selector: str | None) -> pa.Array:
    """Routing predicate for one sink/tier; None selector → all rows."""
    if selector is None:
        return pa.array([True] * batch.num_rows)
    # the reference literally prepends '^' to the user pattern
    return pc.match_substring_regex(class_token(batch), "^" + selector)


def route_batch(batch: pa.Table, selector: str | None) -> pa.Table:
    """One sink branch of the router's multicast (ref router.rs:179-197)."""
    if selector is None:
        return batch
    return batch.filter(selector_mask(batch, selector))
