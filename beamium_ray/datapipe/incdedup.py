"""Incremental MinHash-LSH dedup: a DURABLE band index + doc store +
cluster assignment that new document batches dedup against without
re-shingling the committed corpus (the watch-mode companion of
:func:`dedup.minhash_dedup` — reference daemons ingest forever, so the
index must outlive a tick).

Store layout under ``store_dir`` (every file tmp+renamed; the manifest
rename is the ONLY pointer switch, matching the engine's block/manifest
invariant):

- ``bands/bkt=<band_hash % B>/tick-<n>.parquet`` — (band, band_hash,
  doc_id) LSH index rows, hash-bucketed so a tick reads only the
  partitions its new band hashes touch;
- ``docs/bkt=<doc_id % B>/tick-<n>.parquet`` — (doc_id, text) payload,
  read back ONLY for the committed docs that collide with a new batch
  (exact-Jaccard verification needs both texts);
- ``assign/assign-<n>/`` — the full (doc_id, cluster) table, rewritten
  per tick as a Ray pass (cluster merges relabel via a tiny broadcast
  root-remap, never per-row Python);
- ``assign/MANIFEST.json`` — {tick, assign dir}; promoted LAST, so a
  crashed tick is invisible and a replay overwrites the same
  deterministic tick-<n> files idempotently.

Per-tick cost ∝ new docs (shingling, distributed) + the stored index
rows in TOUCHED partitions (narrow 20-byte rows, filtered parquet
read) + one narrow pass over the assignment table. The committed
corpus text is only read for collision partners.

Semantics match the one-shot verified ``minhash_dedup`` (the gate
unions both under the same exact-Jaccard SQL oracle): candidate pairs
from band collisions, exact k-gram Jaccard ≥ τ verification, clusters
labeled by component-min doc_id. Cross-tick merges relabel the
committed members of every absorbed cluster.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from beamium_ray.functions.hashing import splitmix64


def _atomic_write_table(t: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


class IncrementalMinHashDedup:
    def __init__(
        self,
        store_dir: str,
        *,
        num_perm: int = 128,
        bands: int = 32,
        k: int = 5,
        threshold: float = 0.8,
        num_buckets: int = 64,
        bucket_cap: int = 256,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        self.dir = store_dir
        self.num_perm = num_perm
        self.bands = bands
        self.k = k
        self.threshold = threshold
        self.B = num_buckets
        self.bucket_cap = bucket_cap
        self.text_col = text_col
        self.id_col = id_col
        os.makedirs(os.path.join(store_dir, "assign"), exist_ok=True)

    # -- manifest ---------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "assign", "MANIFEST.json")

    def _manifest(self) -> dict:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"tick": 0, "assign": None}

    def assignments(self):
        """Current full (doc_id, cluster) Dataset (None before tick 1)."""
        import ray.data

        man = self._manifest()
        if man["assign"] is None:
            return None
        return ray.data.read_parquet(
            os.path.join(self.dir, "assign", man["assign"])
        )

    # -- stored-index access ----------------------------------------------
    def _read_band_rows(self, buckets: set[int]) -> pa.Table:
        """Committed band rows in the touched hash buckets (narrow)."""
        empty = pa.table(
            {
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64()),
                self.id_col: pa.array([], pa.int64()),
            }
        )
        tables = [empty]
        for b in sorted(buckets):
            d = os.path.join(self.dir, "bands", f"bkt={b}")
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(d, f)))
        return pa.concat_tables(tables)

    def _read_docs(self, ids: np.ndarray) -> pa.Table:
        """(doc_id, text) of the requested COMMITTED docs — reads only
        the doc partitions those ids hash to, filtered."""
        empty = pa.table(
            {
                self.id_col: pa.array([], pa.int64()),
                self.text_col: pa.array([], pa.string()),
            }
        )
        if len(ids) == 0:
            return empty
        want = pa.array(np.unique(ids), pa.int64())
        tables = [empty]
        for b in sorted({int(i) % self.B for i in np.unique(ids)}):
            d = os.path.join(self.dir, "docs", f"bkt={b}")
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(d, f))
                    tables.append(
                        t.filter(pc.is_in(t[self.id_col], value_set=want))
                    )
        return pa.concat_tables(tables)

    # -- one tick ----------------------------------------------------------
    def tick(self, new_ds, batch_key: str | None = None):
        """Fold one batch of new documents in; returns the updated full
        (doc_id, cluster) assignment Dataset.

        ``batch_key`` (e.g. a fingerprint of the input file list) makes
        a replayed tick a NO-OP once its manifest committed — required
        when a watcher's two-phase pending protocol may re-run the same
        batch after a crash that happened between this manifest's
        promotion and the watcher's own seen-promotion.

        Steps: shingle+band the NEW docs (distributed map — the only
        text-heavy work), collide them against the stored index rows of
        the touched hash buckets, verify candidate pairs with exact
        k-gram Jaccard (new texts from this batch, committed partner
        texts via a filtered doc-store read), then merge components —
        committed clusters absorbed by a cross-tick edge are relabeled
        through a broadcast root-remap pass over the assignment table."""
        import ray.data

        from beamium_ray.datapipe.dedup import (
            _jaccard_for_pairs,
            _numpy_components,
            _segment_pair_indices,
            minhash_bands_batch,
            shingle_sets_for,
        )

        man = self._manifest()
        if batch_key is not None and man.get("last_batch") == batch_key:
            return self.assignments()  # committed replay → no-op
        tick = man["tick"] + 1
        mat = new_ds.materialize()

        # 1. band rows for the new docs (distributed; narrow result)
        band_ds = mat.map_batches(
            lambda b: minhash_bands_batch(
                b, self.text_col, self.id_col, self.num_perm,
                self.bands, self.k,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        new_rows = pa.concat_tables(
            list(band_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
        )
        nb = new_rows["band"].to_numpy().astype(np.uint64)
        nh = new_rows["band_hash"].to_numpy().astype(np.uint64)
        n_ids = new_rows[self.id_col].to_numpy()
        new_id_set = set(
            pa.concat_tables(
                list(
                    mat.select_columns([self.id_col]).iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                )
            )[self.id_col].to_pylist()
        )

        # 2. stored rows in touched partitions only
        touched = {int(h) % self.B for h in nh.tolist()}
        old_rows = self._read_band_rows(touched)
        ob = old_rows["band"].to_numpy().astype(np.uint64)
        oh = old_rows["band_hash"].to_numpy().astype(np.uint64)
        o_ids = old_rows[self.id_col].to_numpy()

        # 3. candidate pairs within (band, band_hash) buckets, vectorized
        key = splitmix64(
            np.concatenate([nh, oh]) ^ splitmix64(np.concatenate([nb, ob]))
        )
        ids = np.concatenate([n_ids, o_ids]).astype(np.int64)
        order, ai, bi, _star = _segment_pair_indices(
            key, ids, self.bucket_cap
        )
        sa, sb = ids[order][ai], ids[order][bi]
        # only pairs touching a new doc are NEW information (old-old
        # pairs were found in their own tick)
        new_arr = np.array(sorted(new_id_set), np.int64)
        m = np.isin(sa, new_arr) | np.isin(sb, new_arr)
        pairs = np.unique(np.stack([sa[m], sb[m]], axis=1), axis=0) \
            if m.any() else np.zeros((0, 2), np.int64)

        # 4. exact-Jaccard verification
        edges_a: list[int] = []
        edges_b: list[int] = []
        if len(pairs):
            need_old = np.unique(pairs[~np.isin(pairs, new_arr)])
            sets = shingle_sets_for(
                mat,
                pairs.ravel(),
                text_col=self.text_col,
                id_col=self.id_col,
                k=self.k,
            )
            old_docs = self._read_docs(need_old)
            if old_docs.num_rows:
                import ray.data as _rd

                sets.update(
                    shingle_sets_for(
                        _rd.from_arrow(old_docs),
                        need_old,
                        text_col=self.text_col,
                        id_col=self.id_col,
                        k=self.k,
                    )
                )
            jac = _jaccard_for_pairs(
                [tuple(p) for p in pairs.tolist()], sets
            )
            ok = jac >= self.threshold
            edges_a = pairs[ok, 0].tolist()
            edges_b = pairs[ok, 1].tolist()

        # 5. components over new edges + committed-root binding edges
        prev = self.assignments()
        remap: dict[int, int] = {}
        new_labels: dict[int, int] = {}
        graph_a = np.array(edges_a, np.int64)
        graph_b = np.array(edges_b, np.int64)
        if prev is not None and len(graph_a):
            # bind each committed partner to its current cluster root
            part = np.unique(np.concatenate([graph_a, graph_b]))
            part = part[~np.isin(part, list(new_id_set))]
            if len(part):
                rows = [
                    b
                    for b in prev.map_batches(
                        lambda t, _w=pa.array(part, pa.int64()): t.filter(
                            pc.is_in(t[self.id_col], value_set=_w)
                        ),
                        batch_format="pyarrow",
                        batch_size=None,
                    ).iter_batches(batch_format="pyarrow", batch_size=None)
                ]
                if rows:
                    bt = pa.concat_tables(rows)
                    graph_a = np.concatenate(
                        [graph_a, bt[self.id_col].to_numpy()]
                    )
                    graph_b = np.concatenate(
                        [graph_b, bt["cluster"].to_numpy()]
                    )
        if len(graph_a):
            nodes, labels = _numpy_components(graph_a, graph_b)
            lab_of = dict(zip(nodes.tolist(), labels.tolist()))
            for n, lb in lab_of.items():
                if n in new_id_set:
                    new_labels[n] = lb
                elif n != lb:
                    # a committed node relabeled; if it was a cluster
                    # ROOT, its whole cluster follows via the remap
                    remap[n] = lb
        assign_new = pa.table(
            {
                self.id_col: pa.array(sorted(new_id_set), pa.int64()),
                "cluster": pa.array(
                    [
                        new_labels.get(d, d)
                        for d in sorted(new_id_set)
                    ],
                    pa.int64(),
                ),
            }
        )

        # 6. rewrite the assignment table (broadcast remap) + append new
        assign_name = f"assign-{tick:05d}"
        assign_dir = os.path.join(self.dir, "assign", assign_name)
        if os.path.isdir(assign_dir):  # crashed-tick replay
            shutil.rmtree(assign_dir)
        if prev is not None:
            import ray

            rref = ray.put(remap)

            def relabel(t: pa.Table, _r=rref) -> pa.Table:
                import ray as _ray

                rm = _ray.get(_r)
                if not rm or t.num_rows == 0:
                    return t
                cl = t["cluster"].to_numpy(zero_copy_only=False).copy()
                ks = np.array(sorted(rm), np.int64)
                vs = np.array([rm[k] for k in ks.tolist()], np.int64)
                pos = np.clip(np.searchsorted(ks, cl), 0, len(ks) - 1)
                hit = ks[pos] == cl
                cl[hit] = vs[pos[hit]]
                return t.set_column(
                    t.column_names.index("cluster"),
                    "cluster",
                    pa.array(cl, pa.int64()),
                )

            full = prev.map_batches(
                relabel, batch_format="pyarrow", batch_size=None
            ).union(ray.data.from_arrow(assign_new))
        else:
            import ray.data as _rd

            full = _rd.from_arrow(assign_new)
        full.write_parquet(assign_dir)

        # 7. append the new batch's band + doc rows, bucketed
        for b in sorted({int(h) % self.B for h in nh.tolist()}):
            sel = (nh.astype(np.int64) % self.B) == b
            _atomic_write_table(
                pa.table(
                    {
                        "band": new_rows["band"].filter(pa.array(sel)),
                        "band_hash": new_rows["band_hash"].filter(
                            pa.array(sel)
                        ),
                        self.id_col: new_rows[self.id_col].filter(
                            pa.array(sel)
                        ),
                    }
                ),
                os.path.join(
                    self.dir, "bands", f"bkt={b}",
                    f"tick-{tick:05d}.parquet",
                ),
            )
        doc_t = pa.concat_tables(
            list(
                mat.select_columns([self.id_col, self.text_col])
                .iter_batches(batch_format="pyarrow", batch_size=None)
            )
        )
        d_ids = doc_t[self.id_col].to_numpy()
        for b in sorted({int(i) % self.B for i in d_ids.tolist()}):
            sel = (d_ids % self.B) == b
            _atomic_write_table(
                doc_t.filter(pa.array(sel)),
                os.path.join(
                    self.dir, "docs", f"bkt={b}",
                    f"tick-{tick:05d}.parquet",
                ),
            )

        # 8. pointer switch LAST
        from beamium_ray.state.manifest import atomic_write_bytes

        atomic_write_bytes(
            self._manifest_path,
            json.dumps(
                {
                    "tick": tick,
                    "assign": assign_name,
                    "last_batch": batch_key,
                },
                sort_keys=True,
            ).encode(),
        )
        import ray.data as _rd

        return _rd.read_parquet(assign_dir)
