"""Persisting rollup: blocks + lineage manifests + resume.

``rollup_to_blocks`` is the durable variant of the rollup: the
per-bucket merge task also ENCODES (Gorilla/DoD blocks) and COMMITS
(manifest, written after blocks via tmp+rename) — so one Ray task =
one recoverable unit of work, mirroring the reference's
file-is-the-checkpoint design (SURVEY.md §3.4). A rerun with the same
input fingerprint + config hash prunes committed buckets at the
PARTIAL stage (before the shuffle), so resumed runs do no redundant
shuffle or merge work.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.config import EngineConfig
from beamium_ray.stages.gorilla import encode_block
from beamium_ray.stages.rollup import (
    merge_cascade_gapfill,
    merge_tiers_with_prior,
    partial_rollup_batch,
    validate_tiers,
)
from beamium_ray.state.manifest import (
    atomic_write_bytes,
    commit_bucket_manifest,
    input_fingerprint,
    load_committed,
    manifest_path,
    merge_run_manifest,
)

MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("tier", pa.string()),
        ("path", pa.string()),
        ("bytes", pa.int64()),
        ("sha256", pa.string()),
        ("rows", pa.int64()),
        ("points", pa.int64()),
        ("min_window", pa.int64()),
        ("max_window", pa.int64()),
    ]
)


def combine_fp(applied: list[str]) -> str:
    """Deterministic combined fingerprint of an append history."""
    import hashlib

    return hashlib.sha256("|".join(applied).encode()).hexdigest()[:16]


def _encode_and_commit(
    group: pa.Table,
    out_dir: str,
    tiers: dict[str, int],
    gapfill: bool,
    fingerprint: str,
    config_hash: str,
    incremental: bool = False,
    gapfill_max_gap: int | None = None,
    float_codec: str = "bytes",
    int_codec: str = "bytes",
) -> pa.Table:
    """Per-bucket merge → encode per tier → atomic block write → manifest.

    ``incremental`` (continuous-aggregate mode): merge the NEW partials
    with the bucket's existing blocks instead of replacing them — the
    persisted block rows carry full merge state (vmin/vmax/vsum/n/
    last/last_ts/last_order), so appending is just another
    merge_partials pass. EACH tier folds the increment into its OWN
    prior block (merge_tiers_with_prior), so per-tier retention that
    evicted base-tier blocks but kept coarse ones cannot lose coarse
    history to a base-only re-derive; gap-fill is regenerated per
    tier. Completed windows are never re-rolled from raw input.
    """
    if group.num_rows == 0:
        return MANIFEST_ROW_SCHEMA.empty_table()
    delay = float(os.environ.get("BEAMIUM_TEST_COMMIT_DELAY", "0") or 0)
    if delay:  # test hook: widen the kill window for crash-resume tests
        import time

        time.sleep(delay)
    bucket = int(group["bucket"][0].as_py())

    applied = [fingerprint]
    prior_tier_rows: dict[str, pa.Table] = {}
    if incremental:
        import json

        mpath = manifest_path(out_dir, bucket)
        prior = None
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    prior = json.load(f)
            except (json.JSONDecodeError, OSError):
                prior = None
        if prior and prior.get("config_hash") != config_hash:
            raise ValueError(
                f"append refused for bucket {bucket}: existing state was "
                f"rolled with config_hash={prior.get('config_hash')} but "
                f"this run has {config_hash} — appending would silently "
                "discard prior history; re-roll from scratch (or to a new "
                "output dir) after a semantic config change"
            )
        if prior and prior.get("config_hash") == config_hash:
            prior_applied = prior.get("applied") or [prior.get("fingerprint")]
            if fingerprint in prior_applied:
                return MANIFEST_ROW_SCHEMA.empty_table()  # idempotent rerun
            applied = prior_applied + [fingerprint]
            for b in prior.get("blocks") or []:
                from beamium_ray.stages.gorilla import decode_block

                with open(os.path.join(out_dir, b["path"]), "rb") as f:
                    old = decode_block(f.read())
                # stored rows ARE merge state; drop gap-filled (n=0)
                # rows, they are regenerated after the merge
                old = old.filter(pc.greater(old["n"], 0))
                t = b.get("tier", "")
                prior_tier_rows[t] = (
                    pa.concat_tables(
                        [prior_tier_rows[t], old], promote_options="default"
                    )
                    if t in prior_tier_rows
                    else old
                )
        fingerprint = combine_fp(applied)

    if "bucket" in group.column_names:
        group = group.drop_columns(["bucket"])
    if prior_tier_rows:
        # per-tier merge: each tier folds the new partials into ITS
        # OWN prior state, so per-tier retention (base evicted, coarse
        # kept) never loses coarse history to a base-only re-derive;
        # exactly equal to the cascade when nothing was evicted
        # (decomposable aggregates)
        rolled = merge_tiers_with_prior(
            group, tiers, prior_tier_rows, gapfill, gapfill_max_gap
        )
    else:
        rolled = merge_cascade_gapfill(group, tiers, gapfill, gapfill_max_gap)

    blocks: list[dict] = []
    rows_out: list[dict] = []
    watermark = None
    counters = {"points_rolled": 0, "windows": 0, "gap_windows": 0}
    for tier in tiers:
        tt = rolled.filter(pc.equal(rolled["tier"], tier)).drop_columns(["tier"])
        if tt.num_rows == 0:
            continue
        buf = encode_block(tt, float_codec=float_codec, int_codec=int_codec)
        # VERSIONED block path: the manifest commit is the only pointer
        # switch. A crash after the block write but before the manifest
        # rename leaves an orphan file the old manifest never references,
        # so an append rerun re-reads the OLD block and cannot
        # double-count (crash-window fix; old versions GC'd post-commit).
        rel = os.path.join(
            f"tier={tier}", f"bucket={bucket:05d}", f"block-{fingerprint}.bin"
        )
        atomic_write_bytes(os.path.join(out_dir, rel), buf)
        ws = tt["window_start"].to_numpy()
        lt_max = pc.max(tt["last_ts"]).as_py()  # None when all-null
        base = min(tiers, key=tiers.get)
        import hashlib

        info = {
            "tier": tier,
            "path": rel,
            "bytes": len(buf),
            # content hash: lets fsck verify block BYTES against the
            # lineage (a bit-flip that still decodes would otherwise
            # only be caught if it moved a row/point/window count)
            "sha256": hashlib.sha256(buf).hexdigest()[:16],
            "rows": tt.num_rows,
            "points": int(pc.sum(tt["n"]).as_py() or 0),
            "min_window": int(ws.min()),
            "max_window": int(ws.max()),
        }
        blocks.append(info)
        rows_out.append({"bucket": bucket, **info})
        if tier == base:
            counters["points_rolled"] += info["points"]
            counters["windows"] += tt.num_rows
            counters["gap_windows"] += int(
                pc.sum(pc.cast(pc.equal(tt["n"], 0), pa.int64())).as_py() or 0
            )
        if lt_max is not None:
            watermark = lt_max if watermark is None else max(watermark, lt_max)

    commit_bucket_manifest(
        out_dir, bucket, fingerprint, config_hash, blocks, counters, watermark,
        applied=applied,
    )
    # post-commit GC: older block versions are no longer referenced
    live = {b["path"] for b in blocks}
    for tier in tiers:
        bdir = os.path.join(out_dir, f"tier={tier}", f"bucket={bucket:05d}")
        if not os.path.isdir(bdir):
            continue
        for name in os.listdir(bdir):
            rel = os.path.join(f"tier={tier}", f"bucket={bucket:05d}", name)
            if name.startswith("block") and rel not in live:
                try:
                    os.remove(os.path.join(bdir, name))
                except OSError:
                    pass
    return pa.Table.from_pylist(rows_out, schema=MANIFEST_ROW_SCHEMA)


def rollup_to_blocks(
    dp_ds,
    cfg: EngineConfig,
    input_paths: list[str],
    out_dir: str | None = None,
    key_col: str = "series_key",
    order_col: str | None = "order",
):
    """Datapoint Dataset → committed compressed blocks; returns (run
    manifest dict, manifest-rows Dataset result as pa.Table)."""
    out_dir = out_dir or cfg.output_dir
    validate_tiers(cfg.tiers)  # fail fast, before any compute launches
    fp = input_fingerprint(input_paths)
    ch = cfg.config_hash()
    committed = load_committed(out_dir, fp, ch)
    skip = frozenset(committed)
    base_us = min(cfg.tiers.values())
    tiers, gapfill, nb = dict(cfg.tiers), cfg.gapfill, cfg.num_buckets
    max_gap = cfg.gapfill_max_gap
    codec = getattr(cfg, "float_codec", "bytes")
    icodec = getattr(cfg, "int_codec", "bytes")

    def _partial(batch: pa.Table) -> pa.Table:
        t = partial_rollup_batch(
            batch, base_us, key_col=key_col, order_col=order_col, num_buckets=nb
        )
        if skip:  # resume: committed buckets never enter the shuffle
            t = t.filter(
                pc.invert(
                    pc.is_in(
                        t["bucket"], value_set=pa.array(sorted(skip), pa.int32())
                    )
                )
            )
        return t

    def _merge(group: pa.Table) -> pa.Table:
        return _encode_and_commit(
            group, out_dir, tiers, gapfill, fp, ch, gapfill_max_gap=max_gap,
            float_codec=codec, int_codec=icodec,
        )

    narrow = dp_ds.select_columns(
        [c for c in [key_col, "ts", "value", order_col] if c]
    )
    partials = narrow.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    if cfg.shuffle_blocks:
        partials = partials.repartition(cfg.shuffle_blocks)
    result = partials.groupby("bucket").map_groups(
        _merge, batch_format="pyarrow"
    )
    manifest_rows = pa.concat_tables(
        list(result.iter_batches(batch_format="pyarrow"))
        or [MANIFEST_ROW_SCHEMA.empty_table()]
    )
    run = merge_run_manifest(out_dir, fp, ch)
    return run, manifest_rows


def append_rollup(
    dp_ds,
    cfg: EngineConfig,
    new_paths: list[str],
    out_dir: str | None = None,
    key_col: str = "series_key",
    order_col: str | None = "order",
):
    """Continuous aggregate: fold NEW input into existing rollup blocks.

    Only the new datapoints are read and combiner-reduced; each bucket
    merge pulls its existing blocks (already merge-state, per tier —
    so per-tier retention horizons are respected) and re-commits. Idempotent per (bucket, new-input fingerprint): a rerun
    after a crash skips buckets that already applied this append — the
    north rule's "resumes without re-rolling completed windows".
    """
    import json

    out_dir = out_dir or cfg.output_dir
    validate_tiers(cfg.tiers)
    new_fp = input_fingerprint(new_paths)
    ch = cfg.config_hash()

    # buckets that already applied this exact append (crash rerun)
    from beamium_ray.state.manifest import iter_bucket_manifests

    skip = frozenset(
        int(m["bucket"])
        for _, m in iter_bucket_manifests(out_dir)
        if m.get("config_hash") == ch and new_fp in (m.get("applied") or [])
    )

    base_us = min(cfg.tiers.values())
    tiers, gapfill, nb = dict(cfg.tiers), cfg.gapfill, cfg.num_buckets
    max_gap = cfg.gapfill_max_gap
    codec = getattr(cfg, "float_codec", "bytes")
    icodec = getattr(cfg, "int_codec", "bytes")

    def _partial(batch: pa.Table) -> pa.Table:
        t = partial_rollup_batch(
            batch, base_us, key_col=key_col, order_col=order_col, num_buckets=nb
        )
        if skip:
            t = t.filter(
                pc.invert(
                    pc.is_in(
                        t["bucket"], value_set=pa.array(sorted(skip), pa.int32())
                    )
                )
            )
        return t

    def _merge(group: pa.Table) -> pa.Table:
        return _encode_and_commit(
            group, out_dir, tiers, gapfill, new_fp, ch, incremental=True,
            gapfill_max_gap=max_gap, float_codec=codec, int_codec=icodec,
        )

    narrow = dp_ds.select_columns(
        [c for c in [key_col, "ts", "value", order_col] if c]
    )
    partials = narrow.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    if cfg.shuffle_blocks:
        partials = partials.repartition(cfg.shuffle_blocks)
    result = partials.groupby("bucket").map_groups(_merge, batch_format="pyarrow")
    manifest_rows = pa.concat_tables(
        list(result.iter_batches(batch_format="pyarrow"))
        or [MANIFEST_ROW_SCHEMA.empty_table()]
    )
    run = merge_run_manifest_any(out_dir, ch)
    return run, manifest_rows


def merge_run_manifest_any(out_dir: str, config_hash: str) -> dict:
    """Run-manifest merge across buckets regardless of append history
    (used by the incremental path, where per-bucket combined
    fingerprints are equal only once every bucket caught up)."""
    import json

    from beamium_ray.state.manifest import iter_bucket_manifests

    counters: dict[str, int] = {}
    blocks: list[dict] = []
    buckets = []
    watermark = None
    for _, m in iter_bucket_manifests(out_dir):
        if m.get("config_hash") != config_hash:
            continue
        buckets.append(int(m["bucket"]))
        for k, v in (m.get("counters") or {}).items():
            counters[k] = counters.get(k, 0) + v
        blocks.extend(m.get("blocks") or [])
        w = m.get("watermark")
        if w is not None:
            watermark = w if watermark is None else max(watermark, w)
    run = {
        "config_hash": config_hash,
        "buckets_committed": sorted(buckets),
        "n_blocks": len(blocks),
        "total_block_bytes": sum(b.get("bytes", 0) for b in blocks),
        "counters": counters,
        "watermark": watermark,
    }
    atomic_write_bytes(
        os.path.join(out_dir, "_run", "manifest.json"),
        json.dumps(run, sort_keys=True, indent=1).encode(),
    )
    return run


def read_blocks_dataset(
    out_dir: str,
    tier: str,
    min_window: int | None = None,
    max_window: int | None = None,
):
    """Query path over persisted blocks: a Ray Dataset of decoded rolled
    rows, with BLOCK-LEVEL pruning from the manifests — blocks whose
    [min_window, max_window] range misses the predicate are never read
    or decoded (the retention engine's read side; window predicates are
    additionally applied row-level after decode).
    """
    import ray.data

    from beamium_ray.stages.gorilla import decode_block

    from beamium_ray.state.manifest import committed_bucket_manifests

    keep_paths = []
    # only manifests consistent with the committed _run manifest are
    # visible (stale buckets from a prior run over other input/config
    # must not leak into query results — ADVICE r1)
    for _, m in committed_bucket_manifests(out_dir):
        for b in m.get("blocks") or []:
            if b.get("tier") != tier:
                continue
            if min_window is not None and b["max_window"] < min_window:
                continue  # pruned: entirely before the range
            if max_window is not None and b["min_window"] > max_window:
                continue  # pruned: entirely after
            keep_paths.append(os.path.join(out_dir, b["path"]))

    def decode(batch: pa.Table) -> pa.Table:
        parts = []
        for path in batch["path"].to_pylist():
            with open(path, "rb") as f:
                t = decode_block(f.read())
            if min_window is not None:
                t = t.filter(pc.greater_equal(t["window_start"], min_window))
            if max_window is not None:
                t = t.filter(pc.less_equal(t["window_start"], max_window))
            parts.append(t)
        if not parts:
            import pyarrow as _pa

            return _pa.table({})
        return pa.concat_tables(parts)

    paths_ds = ray.data.from_items([{"path": p} for p in keep_paths])
    return paths_ds.map_batches(decode, batch_format="pyarrow", batch_size=1)


def read_blocks(out_dir: str, tier: str) -> pa.Table:
    """Decode all COMMITTED blocks of one tier (manifest-driven: only
    files the manifests reference are read — orphans from a crash
    window are invisible)."""
    from beamium_ray.stages.gorilla import decode_block
    from beamium_ray.state.manifest import committed_bucket_manifests

    parts = []
    for _, m in committed_bucket_manifests(out_dir):
        for b in m.get("blocks") or []:
            if b.get("tier") == tier:
                with open(os.path.join(out_dir, b["path"]), "rb") as f:
                    parts.append(decode_block(f.read()))
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts)
