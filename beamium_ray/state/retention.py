"""Retention over persisted rollup blocks: TTL horizon + size cap.

The engine analog of beamium's bounded-loss DFO eviction
(ref ``src/sink.rs:102-221``): files older than ``ttl`` are deleted
(counted in ``skip_ttl``), and while the directory exceeds ``size`` the
OLDEST entries are evicted first (``skip_max_size``). Here "oldest" is
data time (a block's max window_start), not mtime — deterministic for a
batch engine — and eviction operates on the manifest + block files.
"""

from __future__ import annotations

import json
import os


def apply_retention(
    out_dir: str,
    ttl_us: dict[str, int] | None = None,
    max_bytes: int | None = None,
    now_us: int | None = None,
) -> dict:
    """Prune committed blocks. Returns counters
    {windows_expired, blocks_ttl_evicted, blocks_size_evicted, bytes_after}.

    ttl_us: per-tier horizon — blocks whose max_window < now - ttl[tier]
    are dropped (TTL analog, ref sink.rs:102-146). max_bytes: total cap,
    oldest-by-data-time evicted first (ref sink.rs:172-222).
    """
    mdir = os.path.join(out_dir, "_manifests")
    counters = {
        "windows_expired": 0,
        "blocks_ttl_evicted": 0,
        "blocks_size_evicted": 0,
    }
    if not os.path.isdir(mdir):
        counters["bytes_after"] = 0
        return counters

    manifests = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            path = os.path.join(mdir, name)
            with open(path) as f:
                manifests.append((path, json.load(f)))

    def drop_block(b: dict):
        try:
            os.remove(os.path.join(out_dir, b["path"]))
        except OSError:
            pass

    # TTL pass
    if ttl_us and now_us is not None:
        for path, m in manifests:
            kept = []
            for b in m.get("blocks") or []:
                horizon = ttl_us.get(b.get("tier", ""), None)
                if horizon is not None and b.get("max_window") is not None and (
                    b["max_window"] < now_us - horizon
                ):
                    drop_block(b)
                    counters["blocks_ttl_evicted"] += 1
                    counters["windows_expired"] += b.get("rows", 0)
                else:
                    kept.append(b)
            if len(kept) != len(m.get("blocks") or []):
                m["blocks"] = kept
                from beamium_ray.state.manifest import atomic_write_bytes

                atomic_write_bytes(path, json.dumps(m, sort_keys=True).encode())

    # size-cap pass: evict oldest (min max_window) first
    if max_bytes is not None:
        all_blocks = []
        for path, m in manifests:
            for b in m.get("blocks") or []:
                all_blocks.append((path, m, b))
        total = sum(b.get("bytes", 0) for _, _, b in all_blocks)
        all_blocks.sort(key=lambda x: (x[2].get("max_window") or 0))
        changed = set()
        i = 0
        while total > max_bytes and i < len(all_blocks):
            path, m, b = all_blocks[i]
            drop_block(b)
            m["blocks"] = [x for x in m["blocks"] if x is not b]
            total -= b.get("bytes", 0)
            counters["blocks_size_evicted"] += 1
            changed.add(path)
            i += 1
        from beamium_ray.state.manifest import atomic_write_bytes

        for path, m in manifests:
            if path in changed:
                atomic_write_bytes(path, json.dumps(m, sort_keys=True).encode())
        counters["bytes_after"] = total
    else:
        counters["bytes_after"] = sum(
            b.get("bytes", 0)
            for _, m in manifests
            for b in (m.get("blocks") or [])
        )
    return counters
