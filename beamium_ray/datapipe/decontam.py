"""Train/test decontamination: flag corpus documents that share any
word n-gram with a benchmark (evaluation) set.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM-style
13-gram overlap, here word 8-grams by default): any document whose
text contains an n-gram that also appears in the held-out benchmark
suite is marked contaminated so the trainer can drop it.

Scale shape — broadcast, not shuffle: benchmark suites are small by
definition (eval sets, not corpora), so their distinct gram-hash set
is collected once, ``ray.put`` once, and each corpus batch probes it
with one sorted-array ``searchsorted`` — a pure map stage over the
100 TB side. Contract: the benchmark gram set must fit in one object
(~8 bytes/distinct gram; a 100k-doc suite ≈ tens of MB). A benchmark
too large for that isn't a benchmark — split it or use the dedup
family instead.

Gram identity is the splitmix-mixed polynomial combination of the
per-word hashes (textstats.word_hashes); the oracle groups by the
gram STRINGS — the ~2^-64 collision risk is the accepted exactness
gap, as everywhere else in this engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.functions.hashing import splitmix64

GRAM_Q = np.uint64(0x9E3779B97F4A7C15)


def gram_hashes_batch(
    batch: pa.Table, text_col: str = "text", g: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(gram hash, row index) for every within-row word ``g``-gram in
    the batch — a sliding polynomial combination of the per-word
    hashes (g vectorized rounds, no per-row Python). Rows with fewer
    than ``g`` words emit nothing."""
    from beamium_ray.functions.encoding import string_bytes
    from beamium_ray.datapipe.textstats import word_hashes

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    data, offsets = string_bytes(pc.fill_null(text, ""))
    if len(offsets) <= 1:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    h, word_row, _ = word_hashes(data, offsets)
    nw = len(h)
    if nw < g:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    n = nw - g + 1
    acc = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(g):  # g rounds, each fully vectorized
            acc = acc * GRAM_Q + h[k:k + n]
    valid = word_row[:n] == word_row[g - 1:]  # gram stays in one row
    return splitmix64(acc[valid]), word_row[:n][valid]


def benchmark_gram_set(
    bench_ds, text_col: str = "text", g: int = 8
) -> np.ndarray:
    """Sorted distinct gram hashes of the benchmark set. Distributed
    map (per-batch distinct) → small driver concat + final unique —
    bounded by the broadcast contract above."""

    def grams(batch: pa.Table) -> pa.Table:
        gh, _ = gram_hashes_batch(batch, text_col=text_col, g=g)
        return pa.table(
            {"gram": pa.array(np.unique(gh).astype(np.int64), pa.int64())}
        )

    parts = [
        b["gram"].to_numpy(zero_copy_only=False)
        for b in bench_ds.map_batches(
            grams, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts).astype(np.uint64))


def _distinct_hit_counts(
    gh: np.ndarray, rows: np.ndarray, bench: np.ndarray, nrows: int
) -> np.ndarray:
    """Per-row count of DISTINCT benchmark grams among (gh, rows) —
    one searchsorted probe + one lexsort over the hits (a gram
    repeated inside one doc counts once, matching the oracle's
    count(DISTINCT g8) per doc). Shared by the text and token probes."""
    cnt = np.zeros(nrows, np.int64)
    if len(gh) and len(bench):
        pos = np.searchsorted(bench, gh)
        pos[pos == len(bench)] = 0
        hit = bench[pos] == gh
        r, gg = rows[hit], gh[hit]
        if len(r):
            order = np.lexsort((gg, r))
            r, gg = r[order], gg[order]
            first = np.ones(len(r), bool)
            first[1:] = (r[1:] != r[:-1]) | (gg[1:] != gg[:-1])
            cnt = np.bincount(r[first], minlength=nrows).astype(np.int64)
    return cnt


def contamination_counts(
    batch: pa.Table, bench: np.ndarray, text_col: str, g: int
) -> np.ndarray:
    """Per-row distinct-benchmark-gram counts for a TEXT column."""
    if batch.num_rows == 0 or not len(bench):
        return np.zeros(batch.num_rows, np.int64)
    gh, rows = gram_hashes_batch(batch, text_col=text_col, g=g)
    return _distinct_hit_counts(gh, rows, bench, batch.num_rows)


class _Decontaminate:
    """Actor-pool stage: fetch the broadcast benchmark gram set once
    per actor (__init__), probe per batch with searchsorted."""

    def __init__(self, bench_ref, text_col: str, id_col: str, g: int):
        import ray

        self.bench = ray.get(bench_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.g = g

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        cnt = contamination_counts(batch, self.bench, self.text_col, self.g)
        return pa.table(
            {
                "doc_id": ids,
                "contaminated": pa.array(
                    (cnt > 0).astype(np.int64), pa.int64()
                ),
                "n_bench_grams": pa.array(cnt, pa.int64()),
            }
        )


class _DropContaminated:
    """Actor-pool stage: same broadcast probe, but FILTERS the batch to
    its clean rows (all original columns pass through) — the composable
    in-pipeline form of decontamination."""

    def __init__(self, bench_ref, text_col: str, g: int):
        import ray

        self.bench = ray.get(bench_ref)
        self.text_col = text_col
        self.g = g

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        cnt = contamination_counts(batch, self.bench, self.text_col, self.g)
        return batch.filter(pa.array(cnt == 0))


def drop_contaminated(
    corpus_ds,
    bench_ds,
    text_col: str = "text",
    g: int = 8,
    concurrency=None,
):
    """Filter ``corpus_ds`` down to rows sharing NO word ``g``-gram
    with the benchmark set — the in-pipeline (row-filtering) form of
    :func:`decontaminate`, for composing into a cleaning pipeline.
    Same broadcast contract; pure actor-pool map, no shuffle."""
    import ray

    from beamium_ray.functions.cluster import cached_stage

    bench_ref = ray.put(benchmark_gram_set(bench_ds, text_col, g))
    return corpus_ds.map_batches(
        cached_stage(_DropContaminated, bench_ref, text_col, g),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


def decontaminate(
    corpus_ds,
    bench_ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    g: int = 8,
    concurrency=None,
):
    """Dataset of (doc_id, contaminated 0/1, n_bench_grams) for every
    corpus doc: contaminated = shares ≥1 word ``g``-gram with any
    benchmark doc; n_bench_grams = how many DISTINCT benchmark grams
    the doc contains (the severity signal used to pick a drop
    threshold instead of the binary flag). Benchmark grams are
    broadcast once; the corpus side is a pure actor-pool map — no
    shuffle, no driver pass over the corpus."""
    import ray

    from beamium_ray.functions.cluster import cached_stage

    bench_ref = ray.put(benchmark_gram_set(bench_ds, text_col, g))
    return corpus_ds.map_batches(
        cached_stage(_Decontaminate, bench_ref, text_col, id_col, g),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )


# ---------------- token-level decontamination ----------------


def token_gram_hashes_batch(
    batch: pa.Table, list_col: str = "tokens", g: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(gram hash, row index) for every within-row ``g``-gram of an
    ``array<int32>`` token column — the tokenized-benchmark analogue of
    :func:`gram_hashes_batch` (same sliding polynomial combination, per
    -token splitmix hashes instead of word hashes)."""
    col = batch[list_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(
        np.uint64
    )
    # a NULL list emits nothing from list_flatten; its length must be
    # 0, not NaN (gram_hashes_batch fill_nulls its text the same way)
    lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    if len(vals) < g:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    h = splitmix64(vals)
    n = len(h) - g + 1
    acc = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for k in range(g):  # g rounds, each fully vectorized
            acc = acc * GRAM_Q + h[k:k + n]
    valid = rows[:n] == rows[g - 1:]  # gram stays in one row
    return splitmix64(acc[valid]), rows[:n][valid]


def token_benchmark_gram_set(
    bench_ds, list_col: str = "tokens", g: int = 8
) -> np.ndarray:
    """Sorted distinct token-gram hashes of a TOKENIZED benchmark set
    (same broadcast contract as :func:`benchmark_gram_set`)."""

    def grams(batch: pa.Table) -> pa.Table:
        gh, _ = token_gram_hashes_batch(batch, list_col=list_col, g=g)
        return pa.table(
            {"gram": pa.array(np.unique(gh).astype(np.int64), pa.int64())}
        )

    parts = [
        b["gram"].to_numpy(zero_copy_only=False)
        for b in bench_ds.map_batches(
            grams, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
    ]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts).astype(np.uint64))


class _DecontaminateTokens:
    """Actor-pool stage: broadcast token-gram set fetched once per
    actor; per batch one probe + distinct-per-row count."""

    def __init__(self, bench_ref, list_col: str, id_col: str, g: int):
        import ray

        self.bench = ray.get(bench_ref)
        self.list_col = list_col
        self.id_col = id_col
        self.g = g

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        nrows = batch.num_rows
        cnt = np.zeros(nrows, np.int64)
        if nrows and len(self.bench):
            gh, rows = token_gram_hashes_batch(
                batch, list_col=self.list_col, g=self.g
            )
            cnt = _distinct_hit_counts(gh, rows, self.bench, nrows)
        return pa.table(
            {
                self.id_col: ids,
                "contaminated": pa.array(
                    (cnt > 0).astype(np.int64), pa.int64()
                ),
                "n_bench_grams": pa.array(cnt, pa.int64()),
            }
        )


def decontaminate_tokens(
    corpus_ds,
    bench_ds,
    list_col: str = "tokens",
    id_col: str = "ord",
    g: int = 8,
    concurrency=None,
):
    """Train/test decontamination over TOKEN arrays (decontamination is
    usually run on the tokenized benchmark, not its text): flag every
    corpus sequence sharing a ``g``-token gram with the benchmark set,
    plus the distinct-shared-gram count. Same shape as the text form:
    benchmark gram hashes broadcast once, corpus side a pure actor-pool
    map — the token payload never shuffles."""
    import ray

    from beamium_ray.functions.cluster import cached_stage

    bench_ref = ray.put(token_benchmark_gram_set(bench_ds, list_col, g))
    return corpus_ds.map_batches(
        cached_stage(_DecontaminateTokens, bench_ref, list_col, id_col, g),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
    )
