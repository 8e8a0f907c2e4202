"""Counter-rate / increase with reset detection + series-churn stats.

Two classic time-series-engine operators the rollup family lacked:

**counter_increase_dataset** — PromQL-style ``increase``/``rate`` over
cumulative counters (reference scope: beamium ships Prometheus counter
samples; computing the per-window increase with counter-reset handling
is the canonical consumer-side rollup of that data, prometheus.io
query-basics semantics). Exact engine semantics (documented, simpler
than PromQL's extrapolation, and SQL-expressible):

- per series, order points by ``(ts, order)``;
- each point i (except a series' first) yields an **adjusted delta**
  vs its predecessor: ``v[i] - v[i-1]`` if ``v[i] >= v[i-1]``, else
  ``v[i]`` (a drop means the counter reset and recounted from 0 —
  Prometheus's reset rule);
- the delta is credited to the window containing ``ts[i]``;
- per (series, window): ``increase`` = Σ adjusted deltas, ``resets`` =
  #(drops), ``n_deltas`` = #deltas, ``rate`` = increase / window-secs.

Scale shape: the per-series adjacency needs the *previous point*,
which may live in another block — so the narrow point rows (4 int64s +
key; the tokens payload is never involved) take ONE hash(series)->
bucket shuffle, then each bucket runs one fully vectorized pass
(lexsort + diff + reduceat). Same pattern and cost model as
session_windows / asof (queries.py). All tiers are emitted from that
single shuffle — window flooring is per-tier arithmetic on the same
sorted arrays, no second exchange (the rollup cascade's trick).

**series_churn_dataset** — per (series-class, window): how many
distinct sub-series were ACTIVE, and how many appeared for the FIRST
time ever (cardinality growth / churn — the TSDB-ops staple for
catching label-cardinality explosions). Scale shape: per-block
distinct (class, uid, window) partial (bounded by distinct combos per
block, not rows), hash(uid) bucket shuffle of those narrow partials —
a uid's rows all land in one bucket, so per-bucket distinct-counts and
first-window counts sum globally without double-counting — then a
tiny final sum over B × classes × windows partial rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from beamium_ray.functions.hashing import bucket_of, hash64


def _empty_increase_table() -> pa.Table:
    return pa.schema(
        [
            ("tier", pa.string()),
            ("series_key", pa.string()),
            ("window_start", pa.int64()),
            ("increase", pa.int64()),
            ("resets", pa.int64()),
            ("n_deltas", pa.int64()),
            ("rate", pa.float64()),
        ]
    ).empty_table()


def increase_bucket(
    g: pa.Table, tiers: dict[str, int]
) -> pa.Table:
    """One vectorized pass per bucket: lexsort by (series, ts, order),
    adjacent diffs with reset adjustment, then per-tier window
    aggregation via reduceat on the already-sorted arrays."""
    if g.num_rows < 1:
        return _empty_increase_table()
    keys = g["series_key"].combine_chunks()
    codes = keys.dictionary_encode().indices.to_numpy().astype(np.int64)
    ts = g["ts"].to_numpy(zero_copy_only=False)
    v = g["value"].to_numpy(zero_copy_only=False)
    order = g["order"].to_numpy(zero_copy_only=False)

    o = np.lexsort((order, ts, codes))
    codes, ts, v = codes[o], ts[o], v[o]

    # deltas exist at sorted positions 1..n-1 whose predecessor is the
    # same series
    same_prev = np.empty(len(codes), dtype=bool)
    same_prev[0] = False
    same_prev[1:] = codes[1:] == codes[:-1]
    sel = np.flatnonzero(same_prev)
    if len(sel) == 0:
        return _empty_increase_table()
    dv = v[sel] - v[sel - 1]
    reset = dv < 0
    adj = np.where(reset, v[sel], dv)
    reset_i = reset.astype(np.int64)
    scodes = codes[sel]
    sts = ts[sel]

    pieces = []
    for name, tier_us in sorted(tiers.items(), key=lambda kv: kv[1]):
        ws = sts - np.mod(sts, tier_us)
        # (scodes, ws) is non-decreasing lexicographically: scodes is
        # sorted, and within a series sts (hence ws) ascends
        brk = np.empty(len(sel), dtype=bool)
        brk[0] = True
        brk[1:] = (scodes[1:] != scodes[:-1]) | (ws[1:] != ws[:-1])
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(sel))
        inc = np.add.reduceat(adj, starts)
        rst = np.add.reduceat(reset_i, starts)
        nd = (ends - starts).astype(np.int64)
        # original row index (pre-sort) of each group's first delta row
        first_src = o[sel[starts]]
        secs = float(tier_us) / 1e6
        pieces.append(
            pa.table(
                {
                    "tier": pa.array(
                        np.repeat(name, len(starts)), pa.string()
                    ),
                    "series_key": keys.take(pa.array(first_src, pa.int64())),
                    "window_start": pa.array(ws[starts], pa.int64()),
                    "increase": pa.array(inc, pa.int64()),
                    "resets": pa.array(rst, pa.int64()),
                    "n_deltas": pa.array(nd, pa.int64()),
                    "rate": pa.array(
                        inc.astype(np.float64) / secs, pa.float64()
                    ),
                }
            )
        )
    return pa.concat_tables(pieces)


def counter_increase_dataset(
    ds,
    tiers: dict[str, int],
    key_col: str = "series_key",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
    num_buckets: int = 64,
    shuffle_blocks: int | None = None,
):
    """Ray Data pipeline: narrow points → ONE bucket shuffle → per-bucket
    vectorized increase/resets/rate for every tier. Returns rows of
    (tier, series_key, window_start, increase, resets, n_deltas, rate).
    """

    def prep(b: pa.Table) -> pa.Table:
        n = b.num_rows
        order = (
            b[order_col]
            if order_col is not None
            else pa.array(np.arange(n, dtype=np.int64))
        )
        t = pa.table(
            {
                "series_key": b[key_col],
                "ts": pc.cast(b[ts_col], pa.int64()),
                "value": b[value_col],
                "order": order,
            }
        )
        t = t.filter(pc.is_valid(t["value"]))
        bkt = bucket_of(t["series_key"].combine_chunks(), num_buckets)
        return t.append_column("bucket", pa.array(bkt, pa.int32()))

    def merge(g: pa.Table) -> pa.Table:
        return increase_bucket(g, tiers)

    prepped = ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
    if shuffle_blocks:
        prepped = prepped.repartition(shuffle_blocks)
    return prepped.groupby("bucket").map_groups(
        merge, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# series churn
# ---------------------------------------------------------------------------


def _churn_partial(
    b: pa.Table,
    window_us: int,
    class_col: str,
    uid_col: str,
    ts_col: str,
    num_buckets: int,
) -> pa.Table:
    """Per-block distinct (class, uid, window) rows — ≤ the block's
    distinct-combo count leaves, never the raw rows."""
    ts = pc.cast(b[ts_col], pa.int64()).to_numpy()
    ws = ts - np.mod(ts, window_us)
    t = pa.table(
        {
            "cls": b[class_col],
            "uid": b[uid_col],
            "window_start": pa.array(ws, pa.int64()),
        }
    )
    d = t.group_by(["cls", "uid", "window_start"], use_threads=False).aggregate([])
    bkt = (hash64(d["uid"].combine_chunks()) % np.uint64(num_buckets)).astype(
        np.int32
    )
    return d.append_column("bucket", pa.array(bkt, pa.int32()))


_CHURN_SCHEMA = pa.schema(
    [
        ("cls", pa.string()),
        ("window_start", pa.int64()),
        ("active_users", pa.int64()),
        ("new_users", pa.int64()),
    ]
)


def _churn_bucket(g: pa.Table) -> pa.Table:
    """Per-bucket partial counts. Every uid lives wholly in one bucket,
    so distinct-uid counts per (cls, window) and first-window counts
    sum exactly across buckets."""
    if g.num_rows == 0:  # hash-shuffle groupby emits empty per-key blocks
        return _CHURN_SCHEMA.empty_table()
    d = g.group_by(["cls", "uid", "window_start"], use_threads=False).aggregate(
        []
    )  # re-distinct across blocks
    act = d.group_by(["cls", "window_start"], use_threads=False).aggregate(
        [("uid", "count")]
    ).rename_columns(["cls", "window_start", "active_users"])
    first = d.group_by(["cls", "uid"], use_threads=False).aggregate(
        [("window_start", "min")]
    ).rename_columns(["cls", "uid", "window_start"])
    new = first.group_by(["cls", "window_start"], use_threads=False).aggregate(
        [("uid", "count")]
    ).rename_columns(["cls", "window_start", "new_users"])
    j = act.join(new, keys=["cls", "window_start"], join_type="full outer")
    return pa.table(
        {
            "cls": j["cls"],
            "window_start": j["window_start"],
            "active_users": pc.cast(
                pc.fill_null(j["active_users"], 0), pa.int64()
            ),
            "new_users": pc.cast(pc.fill_null(j["new_users"], 0), pa.int64()),
        }
    )


def series_churn_dataset(
    ds,
    window_us: int,
    class_col: str,
    uid_col: str,
    ts_col: str = "ts",
    num_buckets: int = 64,
):
    """Per (class, window): distinct active sub-series + first-ever
    appearances. Two-level: per-block distinct partials → hash(uid)
    bucket merge → tiny (cls, window) sum."""

    def prep(b: pa.Table) -> pa.Table:
        return _churn_partial(
            b, window_us, class_col, uid_col, ts_col, num_buckets
        )

    partials = (
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(_churn_bucket, batch_format="pyarrow")
    )

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _CHURN_SCHEMA.empty_table()
        out = g.group_by(["cls", "window_start"], use_threads=False).aggregate(
            [("active_users", "sum"), ("new_users", "sum")]
        )
        return out.rename_columns(
            ["cls", "window_start", "active_users", "new_users"]
        ).select(_CHURN_SCHEMA.names)

    # final merge: ≤ B rows per (cls, window); group on cls (handful of
    # classes — each group's row count is bounded by windows × B)
    return partials.groupby("cls").map_groups(final, batch_format="pyarrow")
