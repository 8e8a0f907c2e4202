"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale patterns (ray_guide "Aggregation at scale"): content is hashed in
a vectorized ``map_batches`` pass; shuffles move only narrow
(hash, id) projections; per-batch combiners reduce before every
groupby; candidate verification happens inside bucket groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.functions.encoding import string_bytes
from beamium_ray.functions.hashing import bucket_of, hash64, splitmix64

# ---------------- exact dedup ----------------


def exact_partial_batch(
    batch: pa.Table, text_col: str, id_col: str, num_buckets: int
) -> pa.Table:
    """Within-batch combiner: one row per distinct text."""
    t = pa.table({"text": batch[text_col], "doc_id": batch[id_col]})
    g = t.group_by(["text"], use_threads=False).aggregate(
        [("doc_id", "min"), ("doc_id", "count")]
    )
    g = g.rename_columns(["text", "doc_id", "n"])
    g = g.set_column(g.column_names.index("n"), "n", pc.cast(g["n"], pa.int64()))
    return g.append_column(
        "bucket", pa.array(bucket_of(g["text"].combine_chunks(), num_buckets), pa.int32())
    )


def exact_merge_group(group: pa.Table) -> pa.Table:
    """Per-bucket final merge: group by FULL text (hash only routes, so
    hash collisions cannot merge distinct texts)."""
    g = group.group_by(["text"], use_threads=False).aggregate(
        [("doc_id", "min"), ("n", "sum")]
    )
    return g.rename_columns(["text", "doc_id", "n"]).select(["doc_id", "n", "text"])


def exact_dedup(
    ds, text_col: str = "text", id_col: str = "doc_id", num_buckets: int = 64,
    keep_text: bool = False, mode: str = "text",
):
    """Dataset of (doc_id=min id per distinct text, n=duplicate count).

    mode="text": groups by the FULL text end-to-end — zero collision
    risk, but document bodies travel through the shuffle (fine at the
    gate scales; the oracle query uses this mode).
    mode="hash128": the 100 TB path — only (two INDEPENDENTLY-seeded
    64-bit hashes, id, count) move; distinct texts colliding on both
    (~2^-128 per pair) is the accepted risk. Same (doc_id, n) output;
    ``keep_text`` is incompatible (the text never leaves the mappers).
    """
    if mode == "hash128":
        if keep_text:
            raise ValueError(
                "keep_text=True is incompatible with mode='hash128' — "
                "the text column never travels past the map stage"
            )

        def partial128(b: pa.Table) -> pa.Table:
            t = pa.table({"text": b[text_col], "doc_id": b[id_col]})
            # two independent SEEDS: deriving h2 from h1 would be a
            # bijection and give only 64-bit protection
            h1 = hash64(t["text"].combine_chunks(), seed=42)
            h2 = hash64(t["text"].combine_chunks(), seed=1337)
            t = pa.table(
                {
                    "h1": pa.array(h1.astype(np.int64), pa.int64()),
                    "h2": pa.array(h2.astype(np.int64), pa.int64()),
                    "doc_id": t["doc_id"],
                }
            )
            g = t.group_by(["h1", "h2"], use_threads=False).aggregate(
                [("doc_id", "min"), ("doc_id", "count")]
            )
            g = g.rename_columns(["h1", "h2", "doc_id", "n"])
            g = g.set_column(
                g.column_names.index("n"), "n", pc.cast(g["n"], pa.int64())
            )
            bucket = (
                g["h1"].to_numpy().astype(np.uint64) % np.uint64(num_buckets)
            ).astype(np.int32)
            return g.append_column("bucket", pa.array(bucket, pa.int32()))

        def merge128(group: pa.Table) -> pa.Table:
            g = group.group_by(["h1", "h2"], use_threads=False).aggregate(
                [("doc_id", "min"), ("n", "sum")]
            )
            return g.rename_columns(["h1", "h2", "doc_id", "n"]).select(
                ["doc_id", "n"]
            )

        return (
            ds.map_batches(partial128, batch_format="pyarrow", batch_size=None)
            .groupby("bucket")
            .map_groups(merge128, batch_format="pyarrow")
        )

    out = (
        ds.map_batches(
            lambda b: exact_partial_batch(b, text_col, id_col, num_buckets),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("bucket")
        .map_groups(exact_merge_group, batch_format="pyarrow")
    )
    if not keep_text:
        out = out.select_columns(["doc_id", "n"])
    return out


# ---------------- shingling + MinHash ----------------


def _char_shingle_hashes(
    text: pa.Array, k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Per row: uint64 hashes of all k-byte shingles (ragged).

    Returns (hashes, row offsets into hashes)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    data, offsets = string_bytes(pc.fill_null(text, ""))
    lens = np.diff(offsets)
    n_grams = np.maximum(lens - k + 1, 0)
    new_off = np.concatenate(([0], np.cumsum(n_grams)))
    if len(data) < k or n_grams.sum() == 0:
        return np.zeros(0, np.uint64), new_off
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        P = np.uint64(1099511628211)
        powk = np.array([P ** np.uint64(k - 1 - i) for i in range(k)], np.uint64)
        wh = (win * powk[None, :]).sum(axis=1, dtype=np.uint64)
    starts = offsets[:-1]
    rid = np.repeat(np.arange(len(lens), dtype=np.int64), n_grams)
    pos = (
        np.arange(int(n_grams.sum()), dtype=np.int64)
        - new_off[rid]
        + starts[rid]
    )
    return splitmix64(wh[pos]), new_off


_MINHASH_A = splitmix64(np.arange(1, 4097, dtype=np.uint64) * np.uint64(0x9E37))
_MINHASH_B = splitmix64(np.arange(1, 4097, dtype=np.uint64) * np.uint64(0x85EB))


def minhash_signatures(
    text: pa.Array, num_perm: int = 128, k: int = 5
) -> np.ndarray:
    """(n_rows, num_perm) uint64 MinHash signatures; empty rows → max."""
    h, off = _char_shingle_hashes(text, k)
    n = len(off) - 1
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(h) == 0:
        return sigs
    counts = np.diff(off)
    nonempty = counts > 0
    starts = off[:-1][nonempty]
    # chunk the permutation axis so the (n_shingles, chunk) temp stays
    # bounded (~64 MiB) regardless of batch size
    chunk = max(1, min(num_perm, (64 << 20) // max(1, len(h) * 8)))
    for c0 in range(0, num_perm, chunk):
        a = _MINHASH_A[c0 : c0 + chunk]
        b = _MINHASH_B[c0 : c0 + chunk]
        with np.errstate(over="ignore"):
            perm = h[:, None] * a[None, :] + b[None, :]
        sigs[nonempty, c0 : c0 + chunk] = np.minimum.reduceat(
            perm, starts, axis=0
        )
    return sigs


def minhash_bands_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    k: int = 5,
) -> pa.Table:
    """Emit (band, band_hash, doc_id) rows — the LSH index entries."""
    sigs = minhash_signatures(batch[text_col], num_perm, k)
    n, p = sigs.shape
    r = p // bands
    # hash each band of r signature values into one uint64
    band_vals = sigs.reshape(n, bands, r)
    bh = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(r):  # loop over r (4), not rows
            bh = splitmix64(bh ^ band_vals[:, :, i])
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            "band": pa.array(
                np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()
            ),
            "band_hash": pa.array(bh.ravel().astype(np.int64), pa.int64()),
            "doc_id": ids.take(pa.array(np.repeat(np.arange(n), bands), pa.int64())),
        }
    )


def lsh_star_edges(group: pa.Table) -> pa.Table:
    """Per (band, band_hash) bucket: star edges doc→min_doc (the classic
    min-label trick; avoids quadratic pair emission in hot buckets)."""
    ids = group["doc_id"]
    m = pc.min(ids).as_py()
    return pa.table(
        {
            "doc_id": ids,
            "label": pa.array([m] * group.num_rows, type=ids.type),
        }
    )


def minhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    k: int = 5,
    max_iters: int = 2,
):
    """Near-dup clusters via MinHash-LSH + distributed min-label propagation.

    Returns a Dataset of (doc_id, cluster) where cluster is the min
    doc_id of the connected component (over LSH-candidate edges).
    Propagation runs ``max_iters`` rounds of groupby-min — components
    from banding are near-cliques, so 2 rounds usually converge; each
    extra round is one small shuffle over (doc, label) pairs only.
    """
    edges = (
        ds.map_batches(
            lambda b: minhash_bands_batch(b, text_col, id_col, num_perm, bands, k),
            batch_format="pyarrow",
            batch_size=None,
        )
        .groupby(["band", "band_hash"])
        .map_groups(lsh_star_edges, batch_format="pyarrow")
    )
    # min-label propagation: label(doc) ← label(label(doc)), iterated.
    # Fully distributed: each round is one hash-partitioned self-join on
    # the narrow (doc_id, cluster) table (labels of LSH-bucket minima
    # are themselves labelled, and label(m) ≤ m, so inner join suffices
    # and the sequence converges monotonically).
    labels = edges.groupby("doc_id").min("label")
    labels = labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster"]), batch_format="pyarrow"
    )
    labels = labels.materialize()

    # Hybrid propagation. The label table is the narrow (doc, cluster)
    # projection. When it fits comfortably on the driver (< ~10M rows),
    # iterate the min-label fixpoint there — a dict walk beats paying a
    # hash-shuffle join's actor startup per round by 10-100×. Above the
    # threshold, run the distributed join path.
    SMALL = 10_000_000
    if labels.count() <= SMALL:
        t = pa.concat_tables(list(labels.iter_batches(batch_format="pyarrow")))
        doc = t["doc_id"].to_pylist()
        lab = t["cluster"].to_pylist()
        m = dict(zip(doc, lab))
        changed = True
        while changed:  # full fixpoint (label(m) ≤ m ⇒ terminates)
            changed = False
            for d, l in m.items():
                r = m.get(l, l)
                while r in m and m[r] < r:
                    r = m[r]
                if r < l:
                    m[d] = r
                    changed = True
        import ray.data

        out = pa.table(
            {
                "doc_id": pa.array(list(m.keys()), t["doc_id"].type),
                "cluster": pa.array(list(m.values()), t["cluster"].type),
            }
        )
        return ray.data.from_arrow(out)

    num_partitions = 8
    for _ in range(max_iters - 1):
        # materialize between rounds: labels are the SMALL (doc, cluster)
        # projection, and without pinning, each lazy join would replay the
        # whole LSH pipeline once per side per iteration
        labels = labels.materialize()
        j = labels.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("cluster",),
            right_on=("doc_id",),
            left_suffix="_l",
            right_suffix="_r",
        )

        def _pick(t: pa.Table) -> pa.Table:
            cols = t.column_names
            # join output: doc_id (left), cluster_l (= join key), cluster_r
            # (label of the label); label(m) ≤ m so the min is cluster_r
            left = t["cluster_l"] if "cluster_l" in cols else t["cluster"]
            new = pc.min_element_wise(left, t["cluster_r"])
            did = t["doc_id_l"] if "doc_id_l" in cols else t["doc_id"]
            return pa.table({"doc_id": did, "cluster": new})

        labels = j.map_batches(_pick, batch_format="pyarrow", batch_size=None)
    return labels


# ---------------- SimHash ----------------


def simhash_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> pa.Table:
    """64-bit SimHash per doc + 4×16-bit band keys for hamming-LSH."""
    h, off = _char_shingle_hashes(batch[text_col], k)
    n = len(off) - 1
    sim = np.zeros(n, dtype=np.uint64)
    if len(h):
        counts = np.diff(off)
        nonempty = counts > 0
        starts = off[:-1][nonempty]
        half = (counts[nonempty] / 2.0)
        sim_ne = np.zeros(int(nonempty.sum()), dtype=np.uint64)
        for b in range(64):  # 64 fixed rounds, each vectorized over shingles
            bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
            ones = np.add.reduceat(bit, starts)
            sim_ne |= (ones > half).astype(np.uint64) << np.uint64(b)
        sim[nonempty] = sim_ne
    cols = {"doc_id": batch[id_col], "simhash": pa.array(sim.astype(np.int64), pa.int64())}
    for b in range(4):
        cols[f"band{b}"] = pa.array(
            ((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32),
            pa.int32(),
        )
    return pa.table(cols)


def simhash_candidates(ds, text_col="text", id_col="doc_id", k: int = 5):
    """Candidate near-dup pairs: docs sharing any 16-bit simhash band
    (hamming distance ≤ 3 guaranteed found by pigeonhole over 4 bands)."""
    sigs = ds.map_batches(
        lambda b: simhash_batch(b, text_col, id_col, k), batch_format="pyarrow"
    )

    def band_edges(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "dist": pa.array([], pa.int64())}
            )
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy().astype(np.uint64)
        o = np.argsort(ids)
        ids, sh = ids[o], sh[o]
        a_idx, b_idx = np.triu_indices(len(ids), 1)
        x = sh[a_idx] ^ sh[b_idx]
        # popcount via bit tricks (vectorized)
        dist = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        while True:
            nz = v != 0
            if not nz.any():
                break
            dist[nz] += 1
            v[nz] &= v[nz] - np.uint64(1)
        return pa.table(
            {
                "a": pa.array(ids[a_idx], pa.int64()),
                "b": pa.array(ids[b_idx], pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )

    pairs = None
    for b in range(4):
        cand = sigs.groupby(f"band{b}").map_groups(
            band_edges, batch_format="pyarrow"
        )
        pairs = cand if pairs is None else pairs.union(cand)
    return pairs.groupby(["a", "b"]).min("dist")


# ---------------- n-gram Jaccard verification ----------------


def jaccard_pairs(
    ds, pairs: list[tuple], text_col: str = "text", id_col: str = "doc_id",
    k: int = 5,
):
    """Exact k-gram Jaccard for given candidate id pairs.

    The pair list is a SMALL side (output of LSH) — broadcast it, fetch
    the needed docs via a filtered scan, compute per pair.
    """
    import ray

    need = sorted({i for p in pairs for i in p})
    need_set = pa.array(need)

    def grab(b: pa.Table) -> pa.Table:
        m = pc.is_in(b[id_col], value_set=need_set)
        t = b.filter(m)
        return pa.table({"doc_id": t[id_col], "text": t[text_col]})

    docs = pa.concat_tables(
        list(
            ds.map_batches(grab, batch_format="pyarrow", batch_size=None).iter_batches(
                batch_format="pyarrow"
            )
        )
    )
    h, off = _char_shingle_hashes(docs["text"].combine_chunks(), k)
    by_id = {}
    ids = docs["doc_id"].to_pylist()
    for i, d in enumerate(ids):
        by_id[d] = np.unique(h[off[i] : off[i + 1]])
    rows = []
    for a, b in pairs:
        sa, sb = by_id.get(a), by_id.get(b)
        if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
            j = 0.0
        else:
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
        rows.append({"a": a, "b": b, "jaccard": j})
    return pa.Table.from_pylist(rows)


# ---------------- embedding cosine near-dup ----------------


def embedding_neardup(
    ds,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
):
    """Near-dup pairs by cosine ≥ threshold, LSH-bucketed by random
    hyperplane signs (one groupby on the 12-bit sketch), verified
    exactly (float64) within buckets."""
    planes_ref = {"planes": None}

    def sketch(b: pa.Table) -> pa.Table:
        mat = np.stack(b[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        if planes_ref["planes"] is None:
            d = mat.shape[1]
            planes_ref["planes"] = np.random.default_rng(seed).normal(
                size=(d, num_planes)
            )
        signs = (mat @ planes_ref["planes"]) > 0
        key = np.zeros(len(mat), dtype=np.int64)
        for i in range(num_planes):
            key |= signs[:, i].astype(np.int64) << i
        norm = np.linalg.norm(mat, axis=1)
        return pa.table(
            {
                "vec_id": b[id_col],
                "key": pa.array(key, pa.int64()),
                "vec": b[vec_col],
                "norm": pa.array(norm, pa.float64()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        mat = np.stack(group["vec"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        norms = group["norm"].to_numpy()
        o = np.argsort(ids)
        ids, mat, norms = ids[o], mat[o], norms[o]
        sims = (mat @ mat.T) / np.maximum(norms[:, None] * norms[None, :], 1e-30)
        ai, bi = np.triu_indices(len(ids), 1)
        m = sims[ai, bi] >= threshold
        return pa.table(
            {
                "a": pa.array(ids[ai[m]], pa.int64()),
                "b": pa.array(ids[bi[m]], pa.int64()),
                "cosine": pa.array(sims[ai[m], bi[m]], pa.float64()),
            }
        )

    return (
        ds.map_batches(sketch, batch_format="pyarrow", batch_size=None)
        .groupby("key")
        .map_groups(verify, batch_format="pyarrow")
    )
