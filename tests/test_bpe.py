"""BPE tokenizer: published-example trainer parity, encoder semantics,
distributed histogram training, and exact per-doc counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from beamium_ray.datapipe.bpe import (
    build_vocab,
    default_merges,
    encode_word,
    train_bpe,
    train_bpe_from_dataset,
    bpe_token_count,
    word_histogram,
)


def test_train_bpe_published_example():
    """Sennrich et al. (2016) teaching set: 'es' then 'est' first (the
    9-frequency pair), then the 'low'/'ewest' assemblies."""
    m = train_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert m[:2] == [("e", "s"), ("es", "t")]
    assert ("l", "o") in m and ("lo", "w") in m
    assert ("ew", "est") in m


def test_train_bpe_deterministic_and_early_stop():
    assert train_bpe({"ab": 1}, 10) == []  # no pair occurs twice
    a = train_bpe({"abc": 3, "abd": 2}, 10)
    b = train_bpe({"abd": 2, "abc": 3}, 10)
    assert a == b == [("a", "b")] + a[1:]


def _encode_all_at_once(word: str, ranks) -> list[str]:
    """GPT-2-style loop: per round merge ALL occurrences of the best
    pair left-to-right. Must agree with the engine's one-occurrence
    loop on rank-monotone (trained) tables."""
    syms = list(word)
    while len(syms) > 1:
        present = [
            (ranks[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in ranks
        ]
        if not present:
            break
        _, best = min(present)
        out, i = [], 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and (syms[i], syms[i + 1]) == best
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_encode_matches_all_at_once_on_trained_tables():
    rng = np.random.default_rng(7)
    alpha = list("abcdefg")
    words = {
        "".join(rng.choice(alpha, size=rng.integers(1, 12)).tolist()): int(
            rng.integers(1, 9)
        )
        for _ in range(200)
    }
    merges = train_bpe(words, 60)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(words) + ["aaaa", "aaaaa", "abcabcabc", ""]:
        assert encode_word(w, ranks) == _encode_all_at_once(w, ranks), w
    # round-trip: concatenating the symbols reproduces the word
    for w in words:
        assert "".join(encode_word(w, ranks)) == w


def test_default_merges_fire_on_engine_words():
    ranks = {p: i for i, p in enumerate(default_merges())}
    assert encode_word("table", ranks) == ["table"]
    assert encode_word("value", ranks) == ["value"]
    assert len(encode_word("customer", ranks)) <= 3
    # unseen word falls back toward characters, never errors
    assert "".join(encode_word("zzqxj", ranks)) == "zzqxj"


def test_build_vocab_ids():
    m = [("a", "b"), ("ab", "c")]
    v = build_vocab(m)
    assert v["a"] == ord("a") and v["ab"] == 256 and v["abc"] == 257


def test_word_histogram_and_dataset_training(ray_session):
    import ray.data

    docs = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(6)]),
            "text": pa.array(
                [
                    "low low low low low",
                    "newest newest newest",
                    "newest newest newest",
                    "widest widest widest",
                    "lower lower",
                    None,
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    hist = {
        r["word"]: r["sum(freq)"]
        for b in word_histogram(ds).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert hist == {"low": 5, "newest": 6, "widest": 3, "lower": 2}
    merges = train_bpe_from_dataset(ds, n_merges=6)
    assert merges[:2] == [("e", "s"), ("es", "t")]

    counts = pa.concat_tables(
        list(
            bpe_token_count(ds, merges).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    got = dict(
        zip(counts["doc_id"].to_pylist(), counts["n_tok_bpe"].to_pylist())
    )
    ranks = {p: i for i, p in enumerate(merges)}
    assert got["d0"] == 5 * len(encode_word("low", ranks))
    assert got["d4"] == 2 * len(encode_word("lower", ranks))
    assert got["d5"] == 0  # null text


def test_bpe_encode_ids_roundtrip(ray_session):
    import pyarrow.compute as pc
    import ray.data

    from beamium_ray.datapipe.bpe import bpe_encode, default_merges

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["table value", "value  table zz", None]),
        }
    )
    merges = default_merges()
    out = pa.concat_tables(
        list(
            bpe_encode(ray.data.from_arrow(docs), merges).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    ).sort_by("doc_id")
    vocab = build_vocab(merges)
    ranks = {p: i for i, p in enumerate(merges)}

    def ids_of(text):
        out_ids = []
        for w in text.split():
            out_ids.extend(vocab[s] for s in encode_word(w, ranks))
        return out_ids

    toks = out["tokens"].to_pylist()
    assert toks[0] == ids_of("table value")
    assert toks[1] == ids_of("value table zz")
    assert toks[2] == []
    assert out["n_tok"].to_pylist() == [len(toks[0]), len(toks[1]), 0]
    # n_tok agrees with the counting stage
    from beamium_ray.datapipe.bpe import bpe_token_count

    cnt = pa.concat_tables(
        list(
            bpe_token_count(
                ray.data.from_arrow(docs), merges
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        )
    ).sort_by("doc_id")
    assert cnt["n_tok_bpe"].to_pylist() == [
        int(x) for x in out["n_tok"].to_pylist()
    ]
