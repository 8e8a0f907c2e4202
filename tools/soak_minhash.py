"""sf1-scale soak of verified MinHash dedup at two parallelism levels.

Synthesizes a documents-shaped table (deterministic: content is a pure
function of doc_id; ~`--docs` rows with planted near-duplicate groups)
then runs ``minhash_dedup(verify_threshold=0.8)`` end-to-end in TWO
fresh Ray sessions (``--cpus-lo`` and ``--cpus-hi``) over the same
parquet input, reporting docs/sec at both plus the scaling efficiency
(the north-rule two-cluster-size criterion, evidenced via the
CPU-count proxy — same protocol as ``bench.py --scaling``).

    python tools/soak_minhash.py [--docs 200000] [--cpus-lo 8]
                                 [--cpus-hi 32]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# words are 5 pseudo-random LETTERS (26^5 ≈ 11.8M vocab): digit-heavy
# tokens ("w12345") share so many character shingles that LSH banding
# emits ~2M false candidate pairs at 200k docs — an artifact of the
# fixture, not the engine; alphabetic tokens give realistic shingle
# diversity so only the PLANTED near-dups collide
WORD_LEN = 5

DATA_ROOT = "/tmp/beamium_bench"


def synth_docs(out_dir: str, n_docs: int, dup_every: int = 10) -> None:
    """Deterministic corpus: every ``dup_every``-th doc gets a planted
    near-duplicate (one word substituted) so verified dedup does real
    work. Content is a pure function of doc_id — idempotent, and any
    two runs (or processes) agree byte-for-byte."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def words_for(did: int) -> list[str]:
        # splitmix64-style mix per (doc, position): uncorrelated draws
        x = (np.uint64(did) * np.uint64(0x9E3779B97F4A7C15)
             + np.arange(60, dtype=np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
        x = (x ^ (x >> np.uint64(31))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(29))
        out = []
        for v in x:
            v = int(v)
            out.append("".join(chr(97 + (v // 26**j) % 26)
                               for j in range(WORD_LEN)))
        return out

    per_file = 50_000
    for fidx, start in enumerate(range(0, n_docs, per_file)):
        path = os.path.join(out_dir, f"documents-{fidx:05d}.parquet")
        if os.path.exists(path):
            continue
        n = min(per_file, n_docs - start)
        ids = np.arange(start, start + n, dtype=np.int64)
        texts = []
        for did in ids:
            did = int(did)
            if did % dup_every == 1 and did > 0:
                words = words_for(did - 1)  # near-dup: one substitution
                words[7] = "mutant"
            else:
                words = words_for(did)
            texts.append(" ".join(words))
        # small row groups so read_parquet(override_num_blocks=...) can
        # split a file into many scan tasks — with one row group per
        # file the whole soak caps at 4-way parallelism and the 32-cpu
        # leg measures the INPUT layout, not the engine (profiled:
        # sig stage 50 s of 58 s, 4 tasks on 32 cpus)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids),
                      "text": pa.array(texts, pa.string())}),
            path,
            row_group_size=5_000,
        )


def run_once(data_dir: str, ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from beamium_ray.datapipe.dedup import minhash_dedup

    ds = ray.data.read_parquet(data_dir, override_num_blocks=ncpu * 3)
    # warm-up: worker spawn + imports on a slice
    minhash_dedup(ds.limit(2_000), verify_threshold=0.8).count()

    t0 = time.perf_counter()
    out = minhash_dedup(ds, verify_threshold=0.8)
    n_docs = out.count()
    clusters = out.groupby("cluster").count().count()
    sec = time.perf_counter() - t0
    ray.shutdown()
    return {"sec": round(sec, 3), "docs": n_docs, "clusters": clusters,
            "docs_per_sec": int(n_docs / sec), "num_cpus": ncpu}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus-lo", type=int, default=8)
    ap.add_argument("--cpus-hi", type=int, default=32)
    ap.add_argument("--_leg", type=int, default=None, help="internal")
    args = ap.parse_args()

    data_dir = os.path.join(DATA_ROOT, f"docs_{args.docs}")
    if args._leg is not None:
        synth_docs(data_dir, args.docs)
        print(json.dumps(run_once(data_dir, args._leg)))
        return

    synth_docs(data_dir, args.docs)

    def leg(ncpu: int) -> dict:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--docs", str(args.docs), "--_leg", str(ncpu)],
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = leg(args.cpus_lo), leg(args.cpus_hi)
    speedup = lo["sec"] / hi["sec"]
    eff = speedup / (args.cpus_hi / args.cpus_lo)
    print(json.dumps({
        "metric": "minhash_verified_scaling",
        "docs": args.docs,
        "clusters": hi["clusters"],
        "sec_lo": lo["sec"], "sec_hi": hi["sec"],
        "docs_per_sec_lo": lo["docs_per_sec"],
        "docs_per_sec_hi": hi["docs_per_sec"],
        "cpus_lo": args.cpus_lo, "cpus_hi": args.cpus_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
