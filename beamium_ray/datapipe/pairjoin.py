"""Distributed pair verification: keep candidate pairs AND their
payload lookups Dataset-resident end-to-end.

Round-2's verified near-dup family (minhash / simhash / embedding)
collected candidate pairs to the driver and fetched shingle sets /
signatures / vectors driver-side under a ``max_broadcast_pairs`` cap —
bounded and loud, but a hard scale ceiling: a 100 TB corpus with a
legitimately large verified-pair load could not run verified at all
(VERDICT r2 "What's wrong" item 1).

This module is the distributed path. Two bucket shuffles, zero driver
collection (the engine's own `_lookup` pattern from
``connected_components``, dedup.py):

1. **doc-keyed lookup**: each pair (a, b) emits two request rows keyed
   by its endpoints; payload rows (doc_id, payload) are tagged into the
   same hash buckets; one groupby answers every request with its
   endpoint's payload (vectorized searchsorted merge per bucket).
   Payload rows for un-requested docs die inside the groupby.
2. **pair-keyed combine**: the answered (a, b, side, payload) rows are
   bucketed by hash(a, b); within a bucket the two sides of each pair
   are adjacent after one lexsort, and a vectorized metric kernel
   (signature agreement / exact k-gram Jaccard / cosine) scores all
   pairs of the bucket in one pass.

Memory: nothing scales with the total pair count on any single node —
pairs, requests and answers are all narrow rows spread across hash
buckets; the object store spills oversized buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.functions.hashing import splitmix64


def _pair_bucket(a: np.ndarray, b: np.ndarray, P: int) -> np.ndarray:
    """Stable hash bucket of an (a, b) pair — same pair, same bucket."""
    with np.errstate(over="ignore"):
        h = splitmix64(splitmix64(a.astype(np.uint64)) ^ b.astype(np.uint64))
    return (h % np.uint64(P)).astype(np.int32)


def _key_bucket(k: np.ndarray, P: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = splitmix64(k.astype(np.uint64))
    return (h % np.uint64(P)).astype(np.int32)


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def dedupe_pairs_ds(raw_pairs, num_partitions: int):
    """Distinct (a, b) pairs WITHOUT driver collection: one
    hash(a, b)-bucketed groupby; all copies of a pair land in the same
    bucket, so within-bucket ``np.unique`` is globally exact.

    ``star`` is folded with AND — a pair is only flagged star if every
    emission of it came from a capped bucket (one real all-pairs
    emission means the pair was properly covered). Payload columns
    (``pa``/``pb``) keep the first copy (payload is a pure function of
    the doc, so any copy is identical)."""

    def ptag(t: pa.Table) -> pa.Table:
        bkt = _pair_bucket(t["a"].to_numpy(), t["b"].to_numpy(), num_partitions)
        return t.append_column("pbkt", pa.array(bkt, pa.int32()))

    def pdedupe(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        if len(a) == 0:
            return g.drop_columns(["pbkt"])
        ab = np.stack([a, b], axis=1)
        uniq, first_idx, inv = np.unique(
            ab, axis=0, return_index=True, return_inverse=True
        )
        star = g["star"].to_numpy(zero_copy_only=False).astype(bool)
        star_out = np.ones(len(uniq), dtype=bool)
        np.logical_and.at(star_out, inv, star)
        cols = {
            "a": pa.array(uniq[:, 0], pa.int64()),
            "b": pa.array(uniq[:, 1], pa.int64()),
            "star": pa.array(star_out, pa.bool_()),
        }
        take = pa.array(first_idx.astype(np.int64))
        for extra in g.column_names:
            if extra in ("a", "b", "star", "pbkt"):
                continue
            cols[extra] = _as_array(g[extra]).take(take)
        return pa.table(cols)

    return (
        raw_pairs.map_batches(ptag, batch_format="pyarrow", batch_size=None)
        .groupby("pbkt")
        .map_groups(pdedupe, batch_format="pyarrow")
    )


def _bloom_hashes(k: np.ndarray, mask: np.uint64):
    """Two independent bit positions per uint64 key (splitmix chain)."""
    with np.errstate(over="ignore"):
        h1 = splitmix64(k.astype(np.uint64))
        h2 = splitmix64(h1)
    return (h1 & mask), (h2 & mask)


def build_pair_endpoint_bloom(pair_ds, n_keys_hint: int):
    """Bloom bitmap (packed uint64 numpy array) over every endpoint id
    of an (a, b) pair Dataset — the broadcast small side of the
    payload-pruned join below.

    The bitmap is FIXED-SIZE (sized from ``n_keys_hint`` ≈ 2x pair
    count, capped at 128 MiB), so driver memory stays bounded no
    matter the pair count — per-block bitmaps stream to the driver and
    fold with OR. False positives only ship a few extra payload rows."""
    bits = 1 << 20
    while bits < 8 * max(1, n_keys_hint) and bits < (1 << 30):
        bits <<= 1
    mask = np.uint64(bits - 1)
    nwords = bits // 64

    def block_bloom(t: pa.Table) -> pa.Table:
        bm = np.zeros(nwords, dtype=np.uint64)
        if t.num_rows:
            k = np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()])
            for idx in _bloom_hashes(k, mask):
                np.bitwise_or.at(
                    bm, (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )
        return pa.table({"bm": pa.array([bm.view(np.int64)])})

    out = np.zeros(nwords, dtype=np.uint64)
    parts = pair_ds.map_batches(
        block_bloom, batch_format="pyarrow", batch_size=None
    )
    for b in parts.iter_batches(batch_format="pyarrow"):
        for row in b["bm"]:
            out |= np.asarray(row.values).view(np.uint64)
    return out, mask


def bloom_probe(bm: np.ndarray, mask: np.uint64, k: np.ndarray) -> np.ndarray:
    """Vectorized membership test; True may be a false positive."""
    hit = np.ones(len(k), dtype=bool)
    for idx in _bloom_hashes(k, mask):
        w = bm[(idx >> np.uint64(6)).astype(np.int64)]
        hit &= ((w >> (idx & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit


def pair_metric_join(
    pair_ds,
    payload_ds,
    id_col: str,
    payload_col: str,
    metric_fn,
    num_partitions: int,
    metric_name: str = "metric",
    prune_hint: int | None = None,
):
    """(a, b) pairs × (id, payload) table → (a, b, metric) Dataset via
    two bucket shuffles and NO driver collection (module docstring).

    ``metric_fn(payload_a: pa.Array, payload_b: pa.Array) -> np.ndarray``
    must be vectorized over aligned rows (one row per pair).

    ``prune_hint`` (approximate pair count, if the caller knows it)
    enables BLOOM PRUNING of the payload side: a fixed-size bitmap over
    the pairs' endpoint ids is broadcast via ``ray.put`` and each
    payload block drops its un-requested rows BEFORE the shuffle. The
    payload shuffle volume then scales with the touched-id count, not
    the corpus — decisive for the exact-verify join, whose payload side
    is the full corpus text table."""
    import ray

    P = num_partitions
    sch = payload_ds.schema()
    payload_type = dict(zip(sch.names, sch.types))[payload_col]

    bloom_ref = None
    if prune_hint is not None:
        bm, mask = build_pair_endpoint_bloom(pair_ds, 2 * prune_hint)
        bloom_ref = ray.put((bm, mask))

    def reqs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        n = len(a)
        k = np.concatenate([a, b])
        return pa.table(
            {
                "bkt": pa.array(_key_bucket(k, P), pa.int32()),
                "k": pa.array(k, pa.int64()),
                "a": pa.array(np.concatenate([a, a]), pa.int64()),
                "b": pa.array(np.concatenate([b, b]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    ),
                    pa.int8(),
                ),
                "pl": pa.nulls(2 * n, payload_type),
            }
        )

    def pays(t: pa.Table) -> pa.Table:
        if bloom_ref is not None and t.num_rows:
            bm, mask = ray.get(bloom_ref)
            keep = bloom_probe(
                bm, mask, t[id_col].to_numpy().astype(np.uint64)
            )
            t = t.filter(pa.array(keep))
        k = t[id_col].to_numpy()
        n = len(k)
        return pa.table(
            {
                "bkt": pa.array(_key_bucket(k, P), pa.int32()),
                "k": pa.array(k.astype(np.int64), pa.int64()),
                "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                "b": pa.array(np.zeros(n, np.int64), pa.int64()),
                "side": pa.array(np.full(n, -1, np.int8), pa.int8()),
                "pl": _as_array(t[payload_col]),
            }
        )

    # coalesce the union to ~2x CPUs blocks before the groupby: Ray's
    # sort-shuffle cost grows with INPUT BLOCK COUNT (sample + sort-map
    # per block, #blocks x #partitions intermediate objects), and the
    # payload side arrives with one block per upstream read/map task.
    # Measured on a 2.4M-row x 1 KB-payload union at 32 cpus: 240
    # blocks -> 38 s, 64 blocks -> 9 s for the identical sort.
    from beamium_ray.functions.cluster import default_partitions

    tagged = (
        pair_ds.map_batches(reqs, batch_format="pyarrow", batch_size=None)
        .union(
            payload_ds.map_batches(
                pays, batch_format="pyarrow", batch_size=None
            )
        )
        .repartition(default_partitions())
    )

    def resolve(g: pa.Table) -> pa.Table:
        """Answer every request row with its key's payload; compute the
        pair bucket of the answers in the same pass."""
        side = g["side"].to_numpy(zero_copy_only=False)
        k = g["k"].to_numpy(zero_copy_only=False)
        is_pay = side == -1
        pay_idx = np.flatnonzero(is_pay)
        req_idx = np.flatnonzero(~is_pay)
        empty = pa.table(
            {
                "pbkt": pa.array([], pa.int32()),
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
                "pl": pa.nulls(0, payload_type),
            }
        )
        if len(pay_idx) == 0 or len(req_idx) == 0:
            return empty
        pk = k[pay_idx]
        o = np.argsort(pk)
        pk_s = pk[o]
        rk = k[req_idx]
        pos = np.clip(np.searchsorted(pk_s, rk), 0, len(pk_s) - 1)
        hit = pk_s[pos] == rk
        if not hit.any():
            return empty
        hit_req = req_idx[hit]
        take_pl = pa.array(pay_idx[o[pos[hit]]].astype(np.int64))
        a = g["a"].to_numpy(zero_copy_only=False)[hit_req]
        b = g["b"].to_numpy(zero_copy_only=False)[hit_req]
        return pa.table(
            {
                "pbkt": pa.array(_pair_bucket(a, b, P), pa.int32()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "side": pa.array(side[hit_req], pa.int8()),
                "pl": _as_array(g["pl"]).take(take_pl),
            }
        )

    answered = tagged.groupby("bkt").map_groups(
        resolve, batch_format="pyarrow"
    )

    def combine(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                metric_name: pa.array([], pa.float64()),
            }
        )
        if len(a) == 0:
            return empty
        order = np.lexsort((side, b, a))
        a_s, b_s, s_s = a[order], b[order], side[order]
        # a pair has exactly one side-0 and one side-1 row (pairs are
        # deduped upstream; endpoints exist in the corpus) — adjacent
        # after the lexsort. Pairs missing a side are dropped, matching
        # the driver path's "missing doc → no verified edge".
        both = (
            (a_s[:-1] == a_s[1:])
            & (b_s[:-1] == b_s[1:])
            & (s_s[:-1] == 0)
            & (s_s[1:] == 1)
        )
        i0 = np.flatnonzero(both)
        if len(i0) == 0:
            return empty
        i1 = i0 + 1
        pl = _as_array(g["pl"])
        pl0 = pl.take(pa.array(order[i0].astype(np.int64)))
        pl1 = pl.take(pa.array(order[i1].astype(np.int64)))
        m = metric_fn(pl0, pl1)
        return pa.table(
            {
                "a": pa.array(a_s[i0], pa.int64()),
                "b": pa.array(b_s[i0], pa.int64()),
                metric_name: pa.array(np.asarray(m, np.float64), pa.float64()),
            }
        )

    return answered.groupby("pbkt").map_groups(
        combine, batch_format="pyarrow"
    )


# ---------------- vectorized per-pair metric kernels ----------------


def sig_agreement_metric(num_perm: int):
    """MinHash signature agreement (unbiased Jaccard estimate) over
    aligned fixed-length list<int64> signature rows."""

    def f(x: pa.Array, y: pa.Array) -> np.ndarray:
        n = len(x)
        if n == 0:
            return np.zeros(0)
        X = np.asarray(x.flatten()).reshape(n, num_perm)
        Y = np.asarray(y.flatten()).reshape(n, num_perm)
        return (X == Y).mean(axis=1)

    return f


def jaccard_text_metric(k: int = 5):
    """Exact k-gram-set Jaccard over aligned TEXT rows (shingling
    happens inside the kernel — the shuffle ships the text once per
    pair side, not the ~8× larger shingle sets)."""
    from beamium_ray.datapipe.dedup import _char_shingle_hashes

    return _jaccard_metric(lambda arr: _char_shingle_hashes(arr, k))


def jaccard_tokens_metric(k: int = 8):
    """Exact k-TOKEN-gram-set Jaccard over aligned list<int> token
    rows — the tokens-native sibling (the shuffle ships the 4 B/token
    payload once per pair side; gram hashing happens here)."""
    from beamium_ray.datapipe.dedup import _token_shingle_hashes

    return _jaccard_metric(lambda arr: _token_shingle_hashes(arr, k))


def _jaccard_metric(shingle_fn):
    """Shared vectorized |A∩B|/|A∪B| over per-row unique shingle-hash
    sets produced by ``shingle_fn(arr) -> (hashes, row offsets)``."""

    def _sets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """Per-row UNIQUE shingle hashes: (values, row lengths)."""
        h, off = shingle_fn(arr)
        n = len(off) - 1
        if len(h) == 0:
            return h, np.zeros(n, np.int64)
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        o = np.lexsort((h, row))
        hs, rs = h[o], row[o]
        keep = np.concatenate(
            ([True], (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1]))
        )
        return hs[keep], np.bincount(rs[keep], minlength=n)

    def f(x: pa.Array, y: pa.Array) -> np.ndarray:
        n = len(x)
        if n == 0:
            return np.zeros(0)
        vx, lx = _sets(x)
        vy, ly = _sets(y)
        pidx = np.concatenate(
            [
                np.repeat(np.arange(n, dtype=np.int64), lx),
                np.repeat(np.arange(n, dtype=np.int64), ly),
            ]
        )
        vals = np.concatenate([vx, vy])
        o = np.lexsort((vals, pidx))
        pv, vv = pidx[o], vals[o]
        if len(pv) == 0:
            return np.zeros(n)
        dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
        inter = np.bincount(pv[1:][dup], minlength=n)
        union = lx + ly - inter
        return inter / np.maximum(1, union)

    return f


def cosine_metric():
    """Exact float64 cosine over aligned fixed-length vector rows."""

    def f(x: pa.Array, y: pa.Array) -> np.ndarray:
        n = len(x)
        if n == 0:
            return np.zeros(0)
        X = np.asarray(x.flatten(), dtype=np.float64).reshape(n, -1)
        Y = np.asarray(y.flatten(), dtype=np.float64).reshape(n, -1)
        nx = np.maximum(np.linalg.norm(X, axis=1), 1e-30)
        ny = np.maximum(np.linalg.norm(Y, axis=1), 1e-30)
        return (X * Y).sum(axis=1) / (nx * ny)

    return f
