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
- Expiry is decided per TICK-RANGE GROUP, not per file: one tick's
  files span several subdirs (band index + doc payload), and dropping
  an index row while keeping its payload (or vice versa) would let a
  candidate pair form that cannot be verified. Files whose tick ranges
  intersect are expired or kept TOGETHER (a maximal chain of
  intersecting ranges forms one group) — after compaction different
  partitions cover different (lo, hi) ranges, and per-``hi`` expiry
  would drop a docs compact while the same ticks' band rows survive
  inside a younger bands compact. A group's age is its newest evidence
  (max mtime / max tick), so retention never drops more than promised;
  for an uncompacted store every range is [n, n] and this reduces to
  exact per-tick expiry.

**Compaction** merges every parquet file of one partition directory
into a single ``compact-<lo>-<hi>.parquet`` (full-row distinct, so a
crash between the atomic rename and the input deletions — which would
leave duplicate rows — heals on the next compaction instead of
compounding). For tick-age purposes a compacted file is as YOUNG as its
newest merged tick (``hi``): retention of a compacted store is coarser,
never shorter, than promised. Callers MUST bound compaction to
committed ticks (``max_hi``): folding an uncommitted crashed tick's
file into a compact file would put rows beyond the reach of the
name-based crashed-tick sweep, and folding the CURRENT committed tick
breaks any reader that must exclude that tick's own rows on replay
(IncrementalSpanDedup reads strictly-before-tick windows, so it
compacts with ``max_hi = tick - 1``).

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
    Group-granular: files whose tick ranges intersect expire together
    (for an uncompacted store — all ranges [n, n] — this is exact
    per-tick expiry; for misaligned compact files it keeps the
    index/payload coupling by expiring coarser, never shorter)."""
    if not files:
        return []
    now = time.time() if now is None else now
    # merge intersecting (lo, hi) ranges into groups; a group's age key
    # is its newest tick, its evidence the newest mtime / summed size
    ordered = sorted(files, key=lambda f: (f["lo"], f["hi"]))
    groups: list[dict] = []
    for f in ordered:
        if groups and f["lo"] <= groups[-1]["hi"]:
            g = groups[-1]
            g["hi"] = max(g["hi"], f["hi"])
            g["mtime"] = max(g["mtime"], f["mtime"])
            g["size"] += f["size"]
            g["files"].append(f)
        else:
            groups.append(
                {
                    "hi": f["hi"],
                    "mtime": f["mtime"],
                    "size": f["size"],
                    "files": [f],
                }
            )
    dead: list[dict] = []
    alive: list[dict] = []
    for g in groups:
        if max_ticks is not None and current_tick - g["hi"] >= max_ticks:
            dead.append(g)
        elif ttl_seconds is not None and now - g["mtime"] > ttl_seconds:
            dead.append(g)
        else:
            alive.append(g)
    if max_bytes is not None:
        total = sum(g["size"] for g in alive)
        # oldest group first, the reference's pop-back loop
        for g in sorted(alive, key=lambda g: g["hi"]):
            if total <= max_bytes:
                break
            dead.append(g)
            total -= g["size"]
    return [f for g in dead for f in g["files"]]


def compact_dir(
    d: str, key_cols: list[str] | None = None, max_hi: int | None = None
) -> int:
    """Merge every store file in one partition dir into a single
    ``compact-<lo>-<hi>.parquet``, distinct rows. Returns the number of
    input files merged away (0 = nothing to do).

    ``max_hi`` bounds the merge to files whose newest tick is
    ``<= max_hi`` — callers pass their committed manifest tick (or
    ``tick - 1`` when replays must re-read strictly-before-tick rows,
    see the module docstring) so a crashed uncommitted tick's files
    stay under their sweepable ``tick-<n>`` names.

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
        # a crash between write_table and os.replace leaves a
        # .tmp.<pid> orphan that parse_ticks ignores — nothing else
        # ever sweeps it and it can be partition-sized, silently
        # blowing the size cap; one compactor per store (the module
        # contract), so any tmp here is dead
        if ".parquet.tmp." in f:
            try:
                os.remove(os.path.join(d, f))
            except OSError:
                pass
            continue
        rng = parse_ticks(f)
        if rng is not None and (max_hi is None or rng[1] <= max_hi):
            inputs.append((os.path.join(d, f), rng[0], rng[1]))
    if len(inputs) < 2:
        return 0
    t = pa.concat_tables([pq.read_table(p) for p, _, _ in inputs])
    if key_cols:
        import pyarrow.compute as pc

        # factorize each key column to integer codes first: np.unique
        # (axis=0) rejects object arrays, so raw string keys would
        # crash — dictionary codes make any Arrow key type uniquable
        codes = [
            pc.fill_null(
                t[c].combine_chunks().dictionary_encode().indices, -1
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for c in key_cols
        ]
        _, first_idx = np.unique(
            np.stack(codes, axis=1), axis=0, return_index=True
        )
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
