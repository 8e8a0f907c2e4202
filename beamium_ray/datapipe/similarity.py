"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k. The query matrix is the
  SMALL side: ``ray.put`` once, each actor reads it in ``__init__``
  (never re-shipped per batch); per batch one numpy matmul emits ≤k
  candidates per query, merged in a tiny final reduction.
- ``ivf_topk``: the scale path — a coarse k-means-ish quantizer
  (deterministic seeded centroids from a sample) assigns each vector to
  a list; queries probe only ``nprobe`` lists → the matmul touches a
  fraction of the data. Same output contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mat(col) -> np.ndarray:
    arrs = col.to_numpy(zero_copy_only=False)
    return np.stack(arrs).astype(np.float64)


class BruteForceTopK:
    """Actor-pool stage: per batch, cosine of all rows vs Q; emit local
    top-k candidates (vec_id, query_idx, cosine)."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.Q = np.asarray(q, dtype=np.float64)  # (nq, d)
        self.Qn = self.Q / np.maximum(
            np.linalg.norm(self.Q, axis=1, keepdims=True), 1e-30
        )
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "query": pa.array([], pa.int32()),
                "cosine": pa.array([], pa.float64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty blocks crash np.stack/argpartition
            return self._empty()
        M = _mat(batch[self.vec_col])
        # dot / (|m|·|q|): same formula shape as DuckDB's
        # list_cosine_similarity, so oracle comparisons agree bit-for-bit
        # on well-separated ranks
        norms = np.maximum(np.linalg.norm(M, axis=1), 1e-30)
        qn = np.maximum(np.linalg.norm(self.Q, axis=1), 1e-30)
        sims = (M @ self.Q.T) / (norms[:, None] * qn[None, :])  # (n, nq)
        n, nq = sims.shape
        k = min(self.k, n)
        idx = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, nq)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        out_ids = ids[idx.ravel(order="F")]
        out_q = np.repeat(np.arange(nq, dtype=np.int32), k)
        out_sim = sims[idx.ravel(order="F"), np.repeat(np.arange(nq), k)]
        return pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "query": pa.array(out_q, pa.int32()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int | None = None,
) -> pa.Table:
    """Exact top-k per query. Returns a SMALL pa.Table
    (query, vec_id, cosine) sorted by (query, -cosine, vec_id)."""
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)
    cand = ds.map_batches(
        BruteForceTopK,
        fn_constructor_args=(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency or 2,  # callable class → actor pool
    )
    t = pa.concat_tables(list(cand.iter_batches(batch_format="pyarrow")))
    # final tiny reduction on the driver: candidates ≤ k × nblocks
    import pyarrow.compute as pc

    t = t.sort_by(
        [("query", "ascending"), ("cosine", "descending"), ("vec_id", "ascending")]
    )
    qcol = t["query"].to_numpy()
    keep = np.zeros(len(qcol), dtype=bool)
    for qi in np.unique(qcol):
        pos = np.flatnonzero(qcol == qi)[:k]
        keep[pos] = True
    return t.filter(pa.array(keep))


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_size: int = 4096,
) -> pa.Table:
    """Approximate top-k: IVF coarse quantization.

    Centroids are trained on a driver-side SAMPLE (bounded), broadcast
    once; assignment + probed search are vectorized per batch. At scale
    the probe prunes (n_lists - nprobe)/n_lists of the matmul work.
    """
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    sample = ds.limit(sample_size)
    S = _mat(
        pa.concat_tables(list(sample.iter_batches(batch_format="pyarrow")))[
            vec_col
        ]
    )
    # spherical k-means: cosine search needs centroids fitted and vectors
    # assigned in UNIT-NORM space, or mixed-magnitude embeddings land the
    # true neighbors in unprobed lists
    S = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(seed)
    cent = S[rng.choice(len(S), size=min(n_lists, len(S)), replace=False)]
    for _ in range(5):  # few Lloyd rounds on the sample
        d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = S[m].mean(0)
    cref = ray.put(cent)

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    qd2 = ((qn[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probed = np.argsort(qd2, axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(row.tolist()) for row in probed]

    class ProbedSearch(BruteForceTopK):
        def __init__(self, queries_ref, k, vec_col, id_col, cent_ref, probe_sets):
            super().__init__(queries_ref, k, vec_col, id_col)
            import ray as _ray

            self.cent = _ray.get(cent_ref)
            self.probe_sets = probe_sets

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return self._empty()
            M = _mat(batch[self.vec_col])
            Mu = M / np.maximum(
                np.linalg.norm(M, axis=1, keepdims=True), 1e-30
            )
            d2 = ((Mu[:, None, :] - self.cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            parts = []
            ids = batch[self.id_col]
            for qi, pset in enumerate(self.probe_sets):
                mask = np.isin(assign, list(pset))
                if not mask.any():
                    continue
                sub = batch.filter(pa.array(mask))
                Msub = M[mask]
                Mn = Msub / np.maximum(
                    np.linalg.norm(Msub, axis=1, keepdims=True), 1e-30
                )
                sims = Mn @ self.Qn[qi]
                kk = min(self.k, len(sims))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                parts.append(
                    pa.table(
                        {
                            "vec_id": sub[self.id_col].take(pa.array(idx)),
                            "query": pa.array(
                                np.full(kk, qi, dtype=np.int32), pa.int32()
                            ),
                            "cosine": pa.array(sims[idx], pa.float64()),
                        }
                    )
                )
            if not parts:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "query": pa.array([], pa.int32()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            return pa.concat_tables(parts)

    qref = ray.put(q)
    cand = ds.map_batches(
        ProbedSearch,
        fn_constructor_args=(qref, k, vec_col, id_col, cref, probe_sets),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    )
    t = pa.concat_tables(list(cand.iter_batches(batch_format="pyarrow")))
    t = t.sort_by(
        [("query", "ascending"), ("cosine", "descending"), ("vec_id", "ascending")]
    )
    qcol = t["query"].to_numpy()
    keep = np.zeros(len(qcol), dtype=bool)
    for qi in np.unique(qcol):
        keep[np.flatnonzero(qcol == qi)[:k]] = True
    return t.filter(pa.array(keep))
