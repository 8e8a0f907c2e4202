"""Retention + compaction for the incremental dedup/rate stores.

The reference daemon bounds every sink directory with a TTL (delete
files whose mtime age exceeds ``ttl``) and a size cap (delete OLDEST
files until the directory fits) — ``/root/reference/src/sink.rs:102-221``.
The incremental stores here (``bands/ docs/ hashes/ cells/ windows/``
under a store dir, one ``tick-<n>.parquet`` per (partition, tick)) grow
O(ever-seen corpus) without the same bound; this module re-expresses
that retention at store-partition granularity:

- **TTL** — either reference-parity wall-clock (``ttl_seconds`` vs file
  mtime) or deterministic **tick-age** (``max_ticks`` vs the tick number
  embedded in the file name — the testable form: a daemon that ticks on
  a fixed cadence gets the same semantics without clock dependence).
- **Size cap** — oldest surviving ticks dropped until the store's total
  bytes fit ``max_bytes`` (the reference's pop-oldest loop).
- Expiry is decided per TICK, not per file: one tick's files span
  several subdirs (band index + doc payload), and dropping an index row
  while keeping its payload (or vice versa) would let a candidate pair
  form that cannot be verified. A tick's age is its newest evidence
  (max mtime / its tick number), so retention never drops more than
  promised.

**Compaction** merges every parquet file of one partition directory
into a single ``compact-<lo>-<hi>.parquet`` (full-row distinct, so a
crash between the atomic rename and the input deletions — which would
leave duplicate rows — heals on the next compaction instead of
compounding). For tick-age purposes a compacted file is as YOUNG as its
newest merged tick (``hi``): retention of a compacted store is coarser,
never shorter, than promised.

Deletions happen strictly BEFORE any assignment-table rewrite the
caller does: a crash mid-retention leaves index rows gone but
assignment rows present (harmless — nothing can collide with a dropped
index row; the next sweep re-prunes), never the reverse.
"""

from __future__ import annotations

import os
import re
import time

_TICK_RE = re.compile(r"^tick-(\d+)\.parquet$")
_COMPACT_RE = re.compile(r"^compact-(\d+)-(\d+)\.parquet$")


def parse_ticks(filename: str) -> tuple[int, int] | None:
    """(lo, hi) tick range a store file covers, or None if not a store
    file (manifests, centroids, tmp leftovers)."""
    m = _TICK_RE.match(filename)
    if m:
        n = int(m.group(1))
        return n, n
    m = _COMPACT_RE.match(filename)
    if m:
        return int(m.group(1)), int(m.group(2))
    return None


def scan(roots: list[str]) -> list[dict]:
    """Every store file under the given subdir roots (each holding
    ``bkt=*/`` / ``cell=*/`` partition dirs):
    {path, lo, hi, mtime, size}."""
    out: list[dict] = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        for part in sorted(os.listdir(root)):
            d = os.path.join(root, part)
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                rng = parse_ticks(f)
                if rng is None:
                    continue
                p = os.path.join(d, f)
                st = os.stat(p)
                out.append(
                    {
                        "path": p,
                        "lo": rng[0],
                        "hi": rng[1],
                        "mtime": st.st_mtime,
                        "size": st.st_size,
                    }
                )
    return out


def select_expired(
    files: list[dict],
    current_tick: int,
    max_ticks: int | None = None,
    ttl_seconds: float | None = None,
    max_bytes: int | None = None,
    now: float | None = None,
) -> list[dict]:
    """The files retention must delete, per the module-docstring rules.
    Tick-granular: if any of a tick's files expires, all of them do."""
    if not files:
        return []
    now = time.time() if now is None else now
    # per-tick evidence: newest mtime, total size
    ticks: dict[int, dict] = {}
    for f in files:
        t = ticks.setdefault(f["hi"], {"mtime": 0.0, "size": 0})
        t["mtime"] = max(t["mtime"], f["mtime"])
        t["size"] += f["size"]
    dead: set[int] = set()
    for hi, ev in ticks.items():
        if max_ticks is not None and current_tick - hi >= max_ticks:
            dead.add(hi)
        elif ttl_seconds is not None and now - ev["mtime"] > ttl_seconds:
            dead.add(hi)
    if max_bytes is not None:
        alive = sorted(t for t in ticks if t not in dead)
        total = sum(ticks[t]["size"] for t in alive)
        for t in alive:  # oldest first, the reference's pop-back loop
            if total <= max_bytes:
                break
            dead.add(t)
            total -= ticks[t]["size"]
    return [f for f in files if f["hi"] in dead]


def compact_dir(d: str, key_cols: list[str] | None = None) -> int:
    """Merge every store file in one partition dir into a single
    ``compact-<lo>-<hi>.parquet``, distinct rows. Returns the number of
    input files merged away (0 = nothing to do).

    Distinctness heals duplicate rows a crashed prior compaction left
    behind: full-row by default (group_by over every column ==
    DISTINCT *); pass ``key_cols`` (first copy kept) for tables whose
    payload columns Arrow can't group by (the cells store's vector
    column)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    inputs: list[tuple[str, int, int]] = []
    for f in sorted(os.listdir(d)):
        rng = parse_ticks(f)
        if rng is not None:
            inputs.append((os.path.join(d, f), rng[0], rng[1]))
    if len(inputs) < 2:
        return 0
    t = pa.concat_tables([pq.read_table(p) for p, _, _ in inputs])
    if key_cols:
        keys = np.stack(
            [t[c].to_numpy(zero_copy_only=False) for c in key_cols], axis=1
        )
        _, first_idx = np.unique(keys, axis=0, return_index=True)
        t = t.take(pa.array(np.sort(first_idx)))
    else:
        t = t.group_by(t.column_names, use_threads=False).aggregate([])
    lo = min(x[1] for x in inputs)
    hi = max(x[2] for x in inputs)
    final = os.path.join(d, f"compact-{lo:05d}-{hi:05d}.parquet")
    tmp = f"{final}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, final)
    n = 0
    for p, _, _ in inputs:
        if p != final:
            os.remove(p)
            n += 1
    return n
