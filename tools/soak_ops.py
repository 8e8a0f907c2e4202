"""sf1-scale soak of the round-4 heavy operators at two parallelism
levels (VERDICT r4 item 6): ``span_dedup``, ``hash_join``,
``counter_rate``, ``pack_emit`` — the four most expensive gate entries
— each run end-to-end in TWO fresh Ray sessions (``--cpus-lo`` and
``--cpus-hi``) over the same deterministic synthesized input,
reporting throughput at both plus the scaling efficiency (the
north-rule two-cluster-size criterion, evidenced via the CPU-count
proxy — same protocol as ``bench.py --scaling`` and
``tools/soak_minhash.py``).

    python tools/soak_ops.py [--op all|span_dedup|hash_join|
                              counter_rate|pack_emit]
                             [--scale 1.0] [--cpus-lo 8] [--cpus-hi 32]

``--scale 1.0`` sizes inputs at the sf1-soak posture (~40M tokens for
the token ops, 8M rows for the events ops); smaller values shrink
proportionally for smoke runs. Prints one JSON line per op plus a
combined summary line. A host probe (bench.host_probe) brackets each
leg — on this 10-20x-throttling host the efficiency RATIO is the
comparable artifact, not the absolute seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = "/tmp/beamium_bench"

# sf1-posture base sizes at --scale 1.0
BASE_DOCS = 150_000  # × ~264 tok/doc ≈ 40M tokens
BASE_POINTS = 24_000_000
BASE_JOIN_LEFT = 24_000_000
BASE_USERS = 600_000
N_SERIES = 64


# ---------------------------------------------------------------------------
# deterministic fixtures (content is a pure function of row index)
# ---------------------------------------------------------------------------


def synth_doc_ids(out_dir: str, n_docs: int) -> None:
    """doc_id-only documents table: the token ops derive the canonical
    token arrays in-pipeline (sequence_tokens_batch), so the fixture is
    just the id range. Small row groups so override_num_blocks can
    actually split files into enough scan tasks for the 32-cpu leg."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    per_file = 50_000
    for fidx, start in enumerate(range(0, n_docs, per_file)):
        path = os.path.join(out_dir, f"docs-{fidx:05d}.parquet")
        if os.path.exists(path):
            continue
        n = min(per_file, n_docs - start)
        ids = np.arange(start, start + n, dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64())}),
            path,
            row_group_size=1_250,
        )


def synth_points(out_dir: str, n_rows: int) -> None:
    """Counter-shaped points (series_key, ts, value, order): N_SERIES
    interleaved series at a 7 s cadence; value is a sawtooth cumulative
    counter (resets every 5000 steps) so reset detection does real
    work. Pure function of the global row index."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    base = 1_700_000_000_000_000
    per_file = 1_000_000
    keys = np.array([f"t{j:02d}" for j in range(N_SERIES)])
    for fidx, start in enumerate(range(0, n_rows, per_file)):
        path = os.path.join(out_dir, f"points-{fidx:05d}.parquet")
        if os.path.exists(path):
            continue
        n = min(per_file, n_rows - start)
        i = np.arange(start, start + n, dtype=np.int64)
        s = i % N_SERIES
        k = i // N_SERIES
        pq.write_table(
            pa.table(
                {
                    "series_key": pa.array(keys[s]),
                    "ts": pa.array(base + k * 7_000_000, pa.int64()),
                    "value": pa.array((k % 5_000) * 20, pa.int64()),
                    "order": pa.array(i, pa.int64()),
                }
            ),
            path,
            row_group_size=25_000,
        )


def synth_join(left_dir: str, right_dir: str, n_left: int,
               n_users: int) -> None:
    """Equi-join fixture: left (event_id, user_id) with splitmix-hashed
    user ids; right per-user profile (user_id, total_cents, n_events).
    user_id % 3 == 0 is absent from the right so the left-join leg
    exercises null-fill."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from beamium_ray.functions.hashing import splitmix64

    os.makedirs(left_dir, exist_ok=True)
    os.makedirs(right_dir, exist_ok=True)
    per_file = 1_000_000
    for fidx, start in enumerate(range(0, n_left, per_file)):
        path = os.path.join(left_dir, f"left-{fidx:05d}.parquet")
        if os.path.exists(path):
            continue
        n = min(per_file, n_left - start)
        i = np.arange(start, start + n, dtype=np.int64)
        uid = (splitmix64(i.astype(np.uint64)) % np.uint64(n_users)).astype(
            np.int64
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(i, pa.int64()),
                    "user_id": pa.array(uid, pa.int64()),
                }
            ),
            path,
            row_group_size=25_000,
        )
    path = os.path.join(right_dir, "profile.parquet")
    if not os.path.exists(path):
        u = np.arange(n_users, dtype=np.int64)
        keep = u % 3 != 0
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(u[keep], pa.int64()),
                    "total_cents": pa.array(u[keep] * 7 + 13, pa.int64()),
                    "n_events": pa.array(u[keep] % 97 + 1, pa.int64()),
                }
            ),
            path,
            row_group_size=25_000,
        )


# ---------------------------------------------------------------------------
# per-op legs (each runs in a fresh process / fresh Ray session)
# ---------------------------------------------------------------------------


def _init(ncpu: int):
    import ray
    import ray.data

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False


def _plant_spans(b):
    """Gate-shaped span planting (queries.span_dedup_docs): rows with
    ord % 5 == 2 copy the first min(40, n_self, n_src) tokens of row
    ord-2 — a real shared substring for ExactSubstr to find."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from beamium_ray.pipelines.rollup_pipeline import sequence_tokens_batch

    i = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    seq = sequence_tokens_batch(pa.table({"doc_id": pa.array(i, pa.int64())}))
    toks = seq["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    vals = pc.list_flatten(toks).to_numpy(zero_copy_only=False).astype(
        np.int32
    ).copy()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    m = np.flatnonzero(i % 5 == 2)
    if len(m):
        src = i[m] - 2
        sseq = sequence_tokens_batch(
            pa.table({"doc_id": pa.array(src, pa.int64())})
        )
        stoks = sseq["tokens"]
        if isinstance(stoks, pa.ChunkedArray):
            stoks = stoks.combine_chunks()
        svals = pc.list_flatten(stoks).to_numpy(
            zero_copy_only=False
        ).astype(np.int32)
        slens = pc.list_value_length(stoks).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        sstarts = np.concatenate(([0], np.cumsum(slens)))[:-1]
        L = np.minimum(40, np.minimum(lens[m], slens))
        total = int(L.sum())
        rep = np.repeat(np.arange(len(m), dtype=np.int64), L)
        cum = np.concatenate(([0], np.cumsum(L)))[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, L)
        vals[starts[m][rep] + within] = svals[sstarts[rep] + within]
    off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    arr = pa.ListArray.from_arrays(
        pa.array(off, pa.int32()), pa.array(vals, pa.int32())
    )
    return pa.table(
        {
            "ord": pa.array(i, pa.int64()),
            "tokens": arr,
            "n_tok": pa.array(lens.astype(np.int32), pa.int32()),
        }
    )


def leg_span_dedup(docs_dir: str, ncpu: int) -> dict:
    import pyarrow.compute as pc
    import ray
    import ray.data

    from beamium_ray.datapipe.spandedup import remove_duplicate_spans

    _init(ncpu)
    ds = ray.data.read_parquet(docs_dir, override_num_blocks=ncpu * 3)
    seq = ds.map_batches(
        _plant_spans, batch_format="pyarrow", batch_size=None
    )
    # warm-up: worker spawn + imports. materialize(): the op executes
    # its input twice, and limit() on a racing read is nondeterministic
    # across executions
    remove_duplicate_spans(
        seq.limit(2_000).materialize(), list_col="tokens", id_col="ord",
        window=8,
    ).count()
    metrics: dict = {}
    t0 = time.perf_counter()
    out = remove_duplicate_spans(
        seq, list_col="tokens", id_col="ord", window=8, metrics=metrics
    )
    agg = out.sum(["n_tok", "n_removed"])
    sec = time.perf_counter() - t0
    tokens = int(agg["sum(n_tok)"] + agg["sum(n_removed)"])
    ray.shutdown()
    return {
        "sec": round(sec, 3),
        "tokens": tokens,
        "removed": int(agg["sum(n_removed)"]),
        "tokens_per_sec": int(tokens / sec),
        "num_cpus": ncpu,
        "path": metrics.get("span_route"),
        "marks": metrics.get("span_marks"),
    }


def leg_pack_emit(docs_dir: str, ncpu: int) -> dict:
    import ray
    import ray.data

    from beamium_ray.datapipe.packing import emit_packed_rows
    from beamium_ray.pipelines.rollup_pipeline import sequence_tokens_batch

    _init(ncpu)
    ds = ray.data.read_parquet(docs_dir, override_num_blocks=ncpu * 3)
    seq = ds.map_batches(
        sequence_tokens_batch, batch_format="pyarrow", batch_size=None
    )
    # materialize(): emit_packed_rows executes its input twice; a raw
    # limit() sample differs between executions (see the guard in
    # packing.tag)
    emit_packed_rows(
        seq.limit(2_000).materialize(), id_col="ord", seq_len=2048
    ).count()
    t0 = time.perf_counter()
    n_tokens = emit_packed_rows(seq, id_col="ord", seq_len=2048).count()
    sec = time.perf_counter() - t0
    ray.shutdown()
    return {
        "sec": round(sec, 3),
        "tokens": int(n_tokens),
        "tokens_per_sec": int(n_tokens / sec),
        "num_cpus": ncpu,
    }


def leg_counter_rate(
    points_dir: str, ncpu: int, combine: str | None = None
) -> dict:
    import ray
    import ray.data

    from beamium_ray.stages.rate import counter_increase_dataset

    _init(ncpu)
    tiers = {"1m": 60_000_000, "1h": 3_600_000_000}
    # buckets scale with the session size (the multi-node posture: a
    # bigger cluster gets more shuffle partitions) — a fixed small
    # bucket count would cap merge parallelism below the hi leg's CPUs.
    # shuffle_blocks stays None: that knob coalesces POST-COMBINER tiny
    # partials, but this op shuffles the full point stream — squeezing
    # 100M rows into ~CPUs/4 blocks caps the sort+merge at 8-way.
    nb = max(16, ncpu * 2)
    # combine='runs' is valid on this fixture: synth_points emits the
    # interleaved series in global ts order, so a row-range block holds
    # a time-contiguous run per series (and merge_runs_bucket PROVES it
    # per run, raising on violation)
    ds = ray.data.read_parquet(points_dir, override_num_blocks=ncpu * 3)
    n_rows = ds.count()
    counter_increase_dataset(
        ds.limit(20_000), tiers, order_col="order", num_buckets=nb,
        combine=combine,
    ).count()
    t0 = time.perf_counter()
    n_out = counter_increase_dataset(
        ds, tiers, order_col="order", num_buckets=nb, combine=combine,
    ).count()
    sec = time.perf_counter() - t0
    ray.shutdown()
    return {
        "sec": round(sec, 3),
        "points": int(n_rows),
        "windows_out": int(n_out),
        "points_per_sec": int(n_rows / sec),
        "num_cpus": ncpu,
        "combine": combine,
    }


def leg_hash_join(left_dir: str, right_dir: str, ncpu: int) -> dict:
    import ray
    import ray.data

    from beamium_ray.datapipe.join import hash_join

    _init(ncpu)
    # shuffle_blocks=None — full-payload co-shuffle, see counter_rate
    nb = max(16, ncpu * 2)
    left = ray.data.read_parquet(left_dir, override_num_blocks=ncpu * 3)
    right = ray.data.read_parquet(right_dir)
    n_left = left.count()
    hash_join(
        left.limit(20_000), right, on="user_id", how="left",
        num_buckets=nb,
    ).count()
    t0 = time.perf_counter()
    n_out = hash_join(
        left, right, on="user_id", how="left",
        num_buckets=nb,
    ).count()
    sec = time.perf_counter() - t0
    ray.shutdown()
    return {
        "sec": round(sec, 3),
        "rows_left": int(n_left),
        "rows_out": int(n_out),
        "rows_per_sec": int(n_left / sec),
        "num_cpus": ncpu,
    }


OPS = (
    "span_dedup", "pack_emit", "counter_rate", "counter_rate_runs",
    "hash_join",
)


def run_leg(op: str, dirs: dict, ncpu: int) -> dict:
    if op == "span_dedup":
        return leg_span_dedup(dirs["docs"], ncpu)
    if op == "pack_emit":
        return leg_pack_emit(dirs["docs"], ncpu)
    if op == "counter_rate":
        return leg_counter_rate(dirs["points"], ncpu)
    if op == "counter_rate_runs":
        return leg_counter_rate(dirs["points"], ncpu, combine="runs")
    if op == "hash_join":
        return leg_hash_join(dirs["left"], dirs["right"], ncpu)
    raise ValueError(op)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="all", choices=("all",) + OPS)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--cpus-lo", type=int, default=8)
    ap.add_argument("--cpus-hi", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2,
                    help="interleaved lo/hi pairs; per-level MINIMUM is "
                         "reported (the paired-minimum protocol from "
                         "BASELINE.md — this host throttles 10-20x in "
                         "windows, so the min is the clean signal)")
    ap.add_argument("--_leg", default=None, help="internal: op:ncpu")
    args = ap.parse_args()

    n_docs = max(2_000, int(BASE_DOCS * args.scale))
    n_points = max(100_000, int(BASE_POINTS * args.scale))
    n_left = max(100_000, int(BASE_JOIN_LEFT * args.scale))
    n_users = max(10_000, int(BASE_USERS * args.scale))
    dirs = {
        "docs": os.path.join(DATA_ROOT, f"soak_docids_{n_docs}"),
        "points": os.path.join(DATA_ROOT, f"soak_points_{n_points}"),
        "left": os.path.join(DATA_ROOT, f"soak_joinL_{n_left}"),
        "right": os.path.join(DATA_ROOT, f"soak_joinR_{n_users}"),
    }

    def ensure(op: str) -> None:
        if op in ("span_dedup", "pack_emit"):
            synth_doc_ids(dirs["docs"], n_docs)
        elif op in ("counter_rate", "counter_rate_runs"):
            synth_points(dirs["points"], n_points)
        elif op == "hash_join":
            synth_join(dirs["left"], dirs["right"], n_left, n_users)

    if args._leg is not None:
        op, ncpu = args._leg.rsplit(":", 1)
        ensure(op)
        print(json.dumps(run_leg(op, dirs, int(ncpu))))
        return

    from bench import host_probe

    ops = OPS if args.op == "all" else (args.op,)
    summary = {}
    for op in ops:
        ensure(op)

        def leg(ncpu: int) -> dict:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--scale", str(args.scale), "--_leg", f"{op}:{ncpu}"]
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True,
            ).stdout
            return json.loads(out.strip().splitlines()[-1])

        probes = [host_probe()["membw_gbps"]]
        lo_runs, hi_runs = [], []
        for _ in range(max(1, args.repeats)):
            lo_runs.append(leg(args.cpus_lo))
            probes.append(host_probe()["membw_gbps"])
            hi_runs.append(leg(args.cpus_hi))
            probes.append(host_probe()["membw_gbps"])
        lo = min(lo_runs, key=lambda r: r["sec"])
        hi = min(hi_runs, key=lambda r: r["sec"])
        speedup = lo["sec"] / hi["sec"]
        eff = speedup / (args.cpus_hi / args.cpus_lo)
        thr_key = next(
            k for k in ("tokens_per_sec", "points_per_sec", "rows_per_sec")
            if k in hi
        )
        rec = {
            "metric": f"{op}_scaling",
            "sec_lo": lo["sec"], "sec_hi": hi["sec"],
            "sec_lo_runs": [r["sec"] for r in lo_runs],
            "sec_hi_runs": [r["sec"] for r in hi_runs],
            f"{thr_key}_lo": lo[thr_key], f"{thr_key}_hi": hi[thr_key],
            "cpus_lo": args.cpus_lo, "cpus_hi": args.cpus_hi,
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
            "probes_gbps": probes,
            "leg_lo": lo, "leg_hi": hi,
        }
        print(json.dumps(rec))
        sys.stdout.flush()
        summary[op] = {
            "speedup": rec["speedup"],
            "scaling_efficiency": rec["scaling_efficiency"],
            "sec_hi": hi["sec"],
        }
    print(json.dumps({"metric": "soak_ops_summary", "scale": args.scale,
                      "ops": summary}))


if __name__ == "__main__":
    main()
