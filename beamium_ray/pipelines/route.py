"""Router multicast + per-sink partitioned output (S5, P9, P10).

The reference router re-adds global labels to every line, then fans
each line out to EVERY sink whose selector matches, writing one
file-set per sink (ref ``src/router.rs:148-231``). Here each sink is a
filtered view of ONE upstream datapoint Dataset (multicast = N lazy
branches, no data duplication until write), and the write is
partitioned Parquet under ``out_dir/sink=<name>/`` — resumable layout:
a rerun can skip sinks whose directory is complete.
"""

from __future__ import annotations

import pyarrow as pa

from beamium_ray.stages.filters import route_batch
from beamium_ray.stages.relabel import relabel_batch


def route_sinks(
    dp_ds,
    sinks: dict[str, str | None],
    global_labels: str = "",
):
    """Multicast: {sink_name: selector_or_None} → {sink_name: Dataset}.

    ``global_labels`` are re-added before routing (router P9 semantics,
    ref ``src/router.rs:148-169`` — applied unconditionally, unlike the
    scraper's '='-continuation guard)."""
    if global_labels:
        dp_ds = dp_ds.map_batches(
            lambda b: relabel_batch(
                b, add=global_labels, continuation_guard=False
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    out = {}
    for name, selector in sinks.items():
        out[name] = dp_ds.map_batches(
            lambda b, s=selector: route_batch(b, s),
            batch_format="pyarrow",
            batch_size=None,
        )
    return out


def write_routed(
    dp_ds,
    out_dir: str,
    sinks: dict[str, str | None],
    global_labels: str = "",
    min_rows_per_file: int = 500_000,
    materialize: bool = False,
) -> dict[str, str]:
    """Write each sink branch as partitioned Parquet (S5 analog).

    One directory per sink (never one giant file); Ray writes one file
    per block, so a failed run leaves per-sink directories that a rerun
    can check and skip.

    Multicast cost trade-off: each sink write executes the shared
    upstream independently (N sinks = N parse passes). Pass
    ``materialize=True`` to pin the upstream once in the object store
    instead — right when it fits (dimension-table-sized or
    column-pruned inputs), wrong for payload-heavy datasets at scale
    (it forces the full payload through the store before any write).
    """
    if materialize:
        dp_ds = dp_ds.materialize()
    paths = {}
    for name, ds in route_sinks(dp_ds, sinks, global_labels).items():
        path = f"{out_dir}/sink={name}"
        ds.write_parquet(path, min_rows_per_file=min_rows_per_file)
        paths[name] = path
    return paths
