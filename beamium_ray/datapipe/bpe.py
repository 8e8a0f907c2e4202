"""Byte-pair-encoding tokenizer: training, exact encoding, and exact
per-document token counting over a Dataset.

The published BPE algorithm (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units"): training
repeatedly merges the most frequent adjacent symbol pair of a
word-frequency table; encoding greedily applies the learned merges by
rank. Large-scale training runs on the word HISTOGRAM, not the corpus
(the same shape HuggingFace tokenizers / SentencePiece train on): the
distributed part is one vocabulary-bounded word count, the merge loop
itself is driver-side over the tiny histogram.

Pre-tokenization is whitespace (SentencePiece-style). Encoding is
rank-greedy with deterministic tie-breaks: at each step merge the
LOWEST-RANK pair present in the word, leftmost occurrence first — the
exact loop the SQL oracle replays with a recursive CTE, so counts are
value-hash-verifiable end to end.

Ray shape: the merges table is broadcast once (``ray.put``); encoding
is a cached-stage ``map_batches`` that encodes each DISTINCT word once
per block (memoized across batches per worker) and scatters counts
back with numpy — the per-word merge loop runs ~|vocab| times, not
~|corpus| times.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# A deterministic shipped tokenizer artifact (every real pipeline loads
# a pretrained merges.txt; this is ours): the Sennrich et al. teaching
# set plus frequent data-engine words so merges actually fire on the
# synthetic documents corpus. Training on it is reproduced by the unit
# tests and by the oracle generator.
SEED_WORD_FREQS: dict[str, int] = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3,
    "table": 40, "value": 35, "query": 30, "window": 28, "column": 26,
    "stream": 24, "filter": 22, "vector": 20, "customer": 18, "order": 16,
    "group": 14, "batch": 12, "scan": 10, "sort": 9, "merge": 8, "hash": 7,
    "join": 6, "data": 5, "line": 4, "part": 4, "row": 3, "key": 3,
    "fast": 3, "slow": 2, "small": 2, "big": 2, "agg": 2, "spark": 2,
    "the": 2, "a": 1,
}
DEFAULT_N_MERGES = 48


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word→frequency table (the
    published algorithm). Deterministic tie-break: highest pair count,
    then lexicographically smallest pair. Stops early when no pair
    occurs twice."""
    segs: list[tuple[list[str], int]] = [
        (list(w), f) for w, f in sorted(word_freqs.items()) if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in segs:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for k, (syms, f) in enumerate(segs):
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[k] = (out, f)
    return merges


def default_merges(n_merges: int = DEFAULT_N_MERGES) -> list[tuple[str, str]]:
    """The shipped tokenizer artifact: merges trained on
    :data:`SEED_WORD_FREQS`."""
    return train_bpe(SEED_WORD_FREQS, n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly merge the lowest-rank pair present,
    leftmost occurrence first (one occurrence per step — the loop the
    SQL oracle replays; for rank-monotone trained tables it lands on
    the same segmentation as the merge-all-occurrences GPT-2 loop,
    and for arbitrary tables it is itself the spec)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def build_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """symbol → id table: ids 0..255 are reserved for single characters
    by codepoint (chars ≥ U+0100 fall back to id 255), merged symbols
    take 256+rank — so any text encodes without an UNK."""
    vocab = {chr(c): c for c in range(256)}
    for rank, (left, right) in enumerate(merges):
        vocab[left + right] = 256 + rank
    return vocab


class _BpeCounter:
    """Cached stage: merges table from the object store once per
    worker; per-block distinct-word encode (memoized across batches),
    numpy scatter back to per-document counts."""

    def __init__(self, merges_ref, text_col: str, id_col: str):
        import ray

        merges = (
            ray.get(merges_ref)
            if not isinstance(merges_ref, (list, tuple))
            else merges_ref
        )
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[self.text_col], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(text, r"\s+")
        lens = pc.fill_null(pc.list_value_length(words), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        # dictionary-encode the flattened words: the merge loop runs
        # once per DISTINCT word, counts scatter back vectorized
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq = d.dictionary.to_pylist()
        per_word = np.fromiter(
            (0 if w == "" else self._n_tokens(w) for w in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tok = per_word[idx] if len(idx) else np.zeros(0, np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))
        sums = np.add.reduceat(
            np.concatenate((tok, [0])), starts[:-1]
        ) * (lens > 0)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tok_bpe": pa.array(sums, pa.int64()),
            }
        )


def bpe_token_count(
    ds,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact BPE token count per document under ``merges`` (default:
    the shipped artifact). Pure map — no shuffle; the merges broadcast
    once via ``ray.put``."""
    import ray

    from beamium_ray.functions.cluster import cached_stage

    merges_ref = ray.put(merges if merges is not None else default_merges())
    return ds.map_batches(
        cached_stage(_BpeCounter, merges_ref, text_col, id_col),
        batch_format="pyarrow",
        batch_size=None,
    )


def word_histogram(ds, text_col: str = "text"):
    """Distributed word-frequency table (the training input): per-block
    partial counts (≤ distinct-words rows leave a block) → one tiny
    groupby-sum merge. The corpus payload never shuffles."""

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = pc.list_flatten(pc.split_pattern_regex(text, r"\s+"))
        flat = flat.filter(pc.not_equal(flat, ""))
        g = (
            pa.table({"word": flat})
            .group_by(["word"], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["word", "freq"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .sum("freq")
    )


def train_bpe_from_dataset(
    ds, n_merges: int = DEFAULT_N_MERGES, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Corpus-trained tokenizer: distributed word histogram → driver
    merge loop (the histogram is vocabulary-sized, the standard scale
    split for BPE training)."""
    freqs = {
        r["word"]: int(r["sum(freq)"])
        for b in word_histogram(ds, text_col).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        for r in b.to_pylist()
    }
    return train_bpe(freqs, n_merges)


class _BpeEncoder:
    """Cached stage: text → list<int32> token ids under a merges/vocab
    table. Same memoized per-distinct-word loop as the counter; the
    per-doc id lists are assembled with one numpy gather over the
    block's dictionary-encoded words."""

    def __init__(self, merges_ref, text_col: str, id_col: str):
        import ray

        merges = (
            ray.get(merges_ref)
            if not isinstance(merges_ref, (list, tuple))
            else merges_ref
        )
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.vocab = build_vocab(list(merges))
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, np.ndarray] = {}

    def _ids(self, word: str) -> np.ndarray:
        got = self.cache.get(word)
        if got is None:
            got = np.array(
                [
                    self.vocab.get(s, min(ord(s[0]), 255))
                    for s in encode_word(word, self.ranks)
                ],
                np.int32,
            )
            self.cache[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[self.text_col], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(text, r"\s+")
        lens = pc.fill_null(pc.list_value_length(words), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        flat = pc.list_flatten(words)
        d = flat.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq = d.dictionary.to_pylist()
        per_word = [
            np.zeros(0, np.int32) if w == "" else self._ids(w) for w in uniq
        ]
        w_len = np.array([len(p) for p in per_word], np.int64)
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # flat token stream: gather each word's ids in order
        tok_per_word = w_len[idx] if len(idx) else np.zeros(0, np.int64)
        total = int(tok_per_word.sum())
        if total:
            cat = np.concatenate(per_word) if per_word else np.zeros(
                0, np.int32
            )
            w_start = np.concatenate(([0], np.cumsum(w_len)))[:-1]
            starts = w_start[idx]
            pos = np.arange(total, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(tok_per_word)))[:-1],
                tok_per_word,
            )
            vals = cat[np.repeat(starts, tok_per_word) + pos]
        else:
            vals = np.zeros(0, np.int32)
        # per-doc offsets: sum of word token counts per row
        starts_row = np.concatenate(([0], np.cumsum(lens)))
        doc_tok = np.add.reduceat(
            np.concatenate((tok_per_word, [0])), starts_row[:-1]
        ) * (lens > 0) if len(lens) else np.zeros(0, np.int64)
        if total > (1 << 31) - 1:  # int32 list offsets per block
            raise ValueError(
                f"tokenized block of {total} tokens exceeds the 2 GiB "
                "int32 list-offset limit; reduce the input block size"
            )
        off = np.concatenate(([0], np.cumsum(doc_tok))).astype(np.int32)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "tokens": pa.ListArray.from_arrays(
                    pa.array(off, pa.int32()),
                    pa.array(vals, pa.int32()),
                ),
                "n_tok": pa.array(doc_tok.astype(np.int32), pa.int32()),
            }
        )


def bpe_encode(
    ds,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Tokenize a text Dataset into ``(id, tokens list<int32>, n_tok)``
    — the bridge from the text ops to the packing/stats family (the
    output shape is the canonical tokenized-sequence table). Pure map;
    merges broadcast once."""
    import ray

    from beamium_ray.functions.cluster import cached_stage

    merges_ref = ray.put(merges if merges is not None else default_merges())
    return ds.map_batches(
        cached_stage(_BpeEncoder, merges_ref, text_col, id_col),
        batch_format="pyarrow",
        batch_size=None,
    )
