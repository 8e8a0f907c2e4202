"""Descriptive-statistics operators: exact group quantiles + HLL."""

import numpy as np
import pyarrow as pa

from beamium_ray.datapipe.stats import (
    HLL_P,
    group_quantiles,
    hll_estimate,
    hll_register_rows,
    hll_sketch,
)


def test_group_quantiles_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    keys = rng.choice(["a", "b", "c"], 5_000)
    vals = rng.normal(100, 25, 5_000)
    vals[::97] = np.inf  # non-finite must be dropped
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = group_quantiles(
        ray.data.from_arrow(t).repartition(4), "k", "v"
    )
    got = {r["k"]: (r["p50"], r["p95"], r["p99"]) for r in out.take_all()}
    for k in "abc":
        v = vals[(keys == k) & np.isfinite(vals)]
        want = tuple(
            int(np.round(q * 1e6)) for q in np.quantile(v, [0.5, 0.95, 0.99])
        )
        assert got[k] == want, (k, got[k], want)


def test_hll_registers_merge_invariance(ray_session):
    """The sketch state must be independent of how rows are split into
    blocks (register max is associative/commutative)."""
    import ray.data

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 1 << 50, 20_000)
    t = pa.table({"user_id": pa.array(ids, pa.int64())})

    def state(nblocks):
        out = hll_sketch(
            ray.data.from_arrow(t).repartition(nblocks), "user_id"
        )
        return sorted((r["reg"], r["rank"]) for r in out.take_all())

    assert state(1) == state(7)


def test_hll_estimate_accuracy():
    rng = np.random.default_rng(3)
    n = 100_000
    keys = rng.integers(0, 1 << 60, n)
    t = pa.table(
        {"user_id": pa.array(np.concatenate([keys, keys[: n // 2]]))}
    )
    rr = hll_register_rows(t, "user_id")
    est = hll_estimate(rr["reg"].to_numpy(), rr["rank"].to_numpy())
    assert abs(est - n) / n < 0.05


def test_hll_empty_batch():
    rr = hll_register_rows(
        pa.table({"user_id": pa.array([], pa.int64())}), "user_id"
    )
    assert rr.num_rows == 0


def test_cms_cells_merge_invariance_and_total(ray_session):
    """Cell state must be independent of block splits (cell addition is
    associative/commutative), and each hash row's cells must sum to the
    total row count."""
    import ray.data

    from beamium_ray.datapipe.stats import CMS_D, cms_cell_rows, cms_sketch

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 500, 20_000).astype(np.int64)
    t = pa.table({"user_id": pa.array(keys, pa.int64())})

    def state(ds):
        df = cms_sketch(ds, "user_id").to_pandas()
        return sorted(map(tuple, df.itertuples(index=False)))

    a = state(ray.data.from_arrow(t).repartition(1))
    b = state(ray.data.from_arrow(t).repartition(7))
    assert a == b
    df = cms_cell_rows(t, "user_id").to_pandas()
    for r in range(CMS_D):
        assert df[df["row"] == r]["cnt"].sum() == len(keys)


def test_cms_estimate_upper_bound_and_heavy_hitters():
    """Point estimates never undercount; on a skewed stream the top-10
    keys by estimate are exactly the true top-10 (heavy hitters clear
    the eps·N noise floor by construction)."""
    from beamium_ray.datapipe.stats import cms_cell_rows, cms_estimate

    rng = np.random.default_rng(13)
    # zipf-ish skew: 10 heavy keys at ~3k each + 5k light keys at ~4
    heavy = np.repeat(np.arange(10), 3_000)
    light = rng.integers(100, 5_100, 20_000)
    keys = np.concatenate([heavy, light]).astype(np.int64)
    t = pa.table({"k": pa.array(keys, pa.int64())})
    df = cms_cell_rows(t, "k").to_pandas()
    uniq, true_n = np.unique(keys, return_counts=True)
    est = cms_estimate(
        df["row"].to_numpy(), df["col"].to_numpy(), df["cnt"].to_numpy(),
        uniq,
    )
    assert (est >= true_n).all()
    top_true = set(uniq[np.argsort(-true_n)[:10]])
    top_est = set(uniq[np.argsort(-est)[:10]])
    assert top_est == top_true


def test_hll_by_group_merge_invariance_and_exactness(ray_session):
    """Per-group register state is split-invariant and each group's
    state equals the single-group sketch of just that group's keys."""
    import ray.data

    from beamium_ray.datapipe.stats import (
        hll_register_rows,
        hll_sketch_by_group,
    )

    rng = np.random.default_rng(17)
    g = rng.choice(["a", "b", "c"], 30_000)
    k = rng.integers(0, 4_000, 30_000).astype(np.int64)
    t = pa.table({"g": pa.array(g), "k": pa.array(k, pa.int64())})

    def state(ds):
        df = hll_sketch_by_group(ds, "g", "k").to_pandas()
        return sorted(map(tuple, df.itertuples(index=False)))

    a = state(ray.data.from_arrow(t).repartition(1))
    b = state(ray.data.from_arrow(t).repartition(13))
    assert a == b
    for grp in "abc":
        sub = pa.table({"k": pa.array(np.unique(k[g == grp]), pa.int64())})
        single = sorted(
            (grp, r["reg"], r["rank"])
            for r in hll_register_rows(sub, "k").to_pylist()
        )
        assert [x for x in a if x[0] == grp] == single


def test_token_histogram_counts_and_split_invariance(ray_session):
    """The histogram equals a direct numpy bincount of all tokens, is
    independent of block splits, survives empty/zero-length lists, and
    each block's partial is bounded by the vocabulary size."""
    import ray.data

    from beamium_ray.datapipe.stats import token_histogram, token_histogram_rows

    rng = np.random.default_rng(7)
    lens = rng.integers(0, 30, size=400)
    vals = [rng.integers(0, 50, size=n).astype(np.int32) for n in lens]
    t = pa.table({
        "doc_id": pa.array(np.arange(400, dtype=np.int64)),
        "tokens": pa.array([v.tolist() for v in vals],
                           pa.list_(pa.int32())),
    })
    flat = np.concatenate(vals) if vals else np.array([], np.int32)
    want = {int(k): int(v) for k, v in zip(*np.unique(flat, return_counts=True))}
    for parts in (1, 7):
        got = (
            token_histogram(ray.data.from_arrow(t).repartition(parts))
            .to_pandas().set_index("token")["n"].to_dict()
        )
        assert got == want
    # partial combiner: bounded rows, exact counts, empty-block safe
    p = token_histogram_rows(t, "tokens")
    assert p.num_rows <= 50
    assert p.num_rows == len(want)
    assert token_histogram_rows(t.slice(0, 0), "tokens").num_rows == 0


def test_token_rarity_sums(ray_session):
    """freq_sum equals the hand-computed sum of corpus counts per row,
    across block splits; empty lists score 0; a supplied histogram is
    honored."""
    import ray.data

    from beamium_ray.datapipe.stats import token_rarity

    lists = [[1, 1, 2], [2], [], [3, 1]]
    # corpus counts: 1 -> 3, 2 -> 2, 3 -> 1
    want = {0: 3 + 3 + 2, 1: 2, 2: 0, 3: 1 + 3}
    t = pa.table({
        "ord": pa.array(range(4), pa.int64()),
        "tokens": pa.array(lists, pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got = token_rarity(ds).to_pandas().set_index("ord")
    assert got["freq_sum"].to_dict() == want
    assert got["n_tok"].to_dict() == {0: 3, 1: 1, 2: 0, 3: 2}


def test_doc_frequency_distinct_per_doc(ray_session):
    """df counts each token once per doc (repeats inside a doc don't
    inflate it), merges across blocks, ignores empty lists."""
    import ray.data

    from beamium_ray.datapipe.stats import doc_frequency

    lists = [[1, 1, 2], [1], [], [2, 3, 2]]
    want = {1: 2, 2: 2, 3: 1}
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "tokens": pa.array(lists, pa.list_(pa.int32())),
    })
    for parts in (1, 3):
        got = (
            doc_frequency(ray.data.from_arrow(t).repartition(parts))
            .to_pandas().set_index("token")["n_docs"].to_dict()
        )
        assert got == want


def test_bigram_topk_exact(ray_session):
    """Top-k bigrams match a hand-computed ranking with deterministic
    (count DESC, pair ASC) ties, across block splits; k larger than the
    distinct-bigram count returns them all; pairs never span rows."""
    import ray.data

    from beamium_ray.datapipe.stats import bigram_topk

    lists = [
        [1, 2, 1, 2, 9],   # (1,2)x2, (2,1), (2,9)
        [1, 2],            # (1,2)
        [9],               # no pair
        [3, 4],            # (3,4)
        [4, 3],            # row boundary: no (4, ...) from prev row's 4
    ]
    t = pa.table({
        "ord": pa.array(range(5), pa.int64()),
        "tokens": pa.array(lists, pa.list_(pa.int32())),
    })
    want = [(1, 2, 3), (2, 1, 1), (2, 9, 1), (3, 4, 1), (4, 3, 1)]
    for parts in (1, 4):
        got = bigram_topk(
            ray.data.from_arrow(t).repartition(parts), k=10, vocab=16
        )
        assert [
            (a, b, n) for a, b, n in
            zip(got["tok_a"].to_pylist(), got["tok_b"].to_pylist(),
                got["n"].to_pylist())
        ] == want
    top1 = bigram_topk(ray.data.from_arrow(t), k=1, vocab=16)
    assert top1["n"].to_pylist() == [3]


def test_dataset_report_sums(ray_session):
    """Per-source sums equal hand-computed values and merge across
    block splits (integer partials)."""
    import ray.data

    from beamium_ray.datapipe.textstats import dataset_report

    good = " ".join(f"word{i}" for i in range(25))
    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([good, "tiny", good + " extra", "also small"]),
        "source": pa.array(["a", "a", "b", "b"]),
    })
    for parts in (1, 3):
        got = (
            dataset_report(ray.data.from_arrow(t).repartition(parts))
            .to_pandas().set_index("source").sort_index()
        )
        assert got.loc["a"].to_dict() == {
            "n_docs": 2, "n_tok_ws": 26,
            "n_chars": len(good) + 4, "n_keep": 1,
        }
        assert got.loc["b"]["n_docs"] == 2
        assert got.loc["b"]["n_keep"] == 1


def test_binned_quantiles_bounded_error_and_split_invariance(ray_session):
    """The sketch's estimate is the rank's bin lower edge: within one
    bin width below the exact rank value, and byte-identical across
    block splits (exact count merge — no order dependence)."""
    import ray.data

    from beamium_ray.datapipe.stats import binned_quantiles

    rng = np.random.default_rng(41)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(rng.choice(["a", "b", "c"], n)),
            "v": pa.array(rng.uniform(0, 500, n), pa.float64()),
        }
    )
    lo, hi, bins = 0.0, 512.0, 4096
    width = (hi - lo) / bins
    results = []
    for nblocks in (1, 7):
        out = binned_quantiles(
            ray.data.from_arrow(t).repartition(nblocks),
            "k", "v", lo=lo, hi=hi, n_bins=bins,
        ).to_pandas()
        results.append(
            sorted(map(tuple, out[["k", "p50", "p95", "p99", "n"]].values))
        )
    assert results[0] == results[1]  # split invariance

    vals = {k: [] for k in "abc"}
    for k, v in zip(t["k"].to_pylist(), t["v"].to_pylist()):
        vals[k].append(v)
    for k, p50, p95, p99, cnt in results[0]:
        arr = np.sort(np.array(vals[k]))
        assert cnt == len(arr)
        for q, est_micro in ((0.5, p50), (0.95, p95), (0.99, p99)):
            exact = arr[int(np.floor(q * (len(arr) - 1)))]
            est = est_micro / 1e6
            assert est <= exact < est + width + 1e-9, (k, q)
