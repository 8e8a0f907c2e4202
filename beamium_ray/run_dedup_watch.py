"""Watch-mode incremental dedup daemon over a parquet landing dir.

    python -m beamium_ray.run_dedup_watch --input landing/ --store st/ \
        --mode exact|minhash|semantic|span [--scan-period S] \
        [--max-ticks N] [--idle-exit K] [--num-cpus N] \
        [--store-ttl-ticks T] [--compact-every K] [--output out/]

The training-data sibling of ``run_watch``: the same scan-period
directory loop, durable seen-set, and two-phase pending/seen
exactly-once protocol (the reference daemon's shape,
``src/lib/asynch/fs.rs:29-145``), but each tick folds the new parquet
files into one of the durable incremental dedup stores
(``datapipe/incdedup.py``) instead of the rollup block store. The
tick's ``batch_key`` is the file batch's fingerprint, so a crash
between the store's manifest promotion and the watcher's own
seen-promotion replays as a NO-OP (the stores' committed-replay
contract) — exactly-once end to end.

Per tick it prints one JSON line; ``--store-ttl-ticks`` /
``--compact-every`` run the store lifecycle (``state/storegc.py``
semantics) inside the loop like ``run_watch`` does for block
retention.

Modes: ``exact`` (128-bit content hash), ``minhash`` (near-dup,
``--threshold``), ``semantic`` (embedding SemDeDup, ``--vec-col``),
``span`` (ExactSubstr duplicate-window removal over a tokens column —
the one mode with a REWRITTEN payload, landed per tick under
``--output/shard=<fp>/``, swept + rewritten on replay).
"""

from __future__ import annotations

import argparse
import json
import sys


def _semantic_params(args) -> dict:
    """The store-committed dedup parameters: a restart with DIFFERENT
    values would silently mix incompatible semantics into one durable
    store (a span store with mixed window widths stops matching; a
    threshold change can't un-merge committed clusters), so they are
    recorded at first run and verified on every restart — the same
    refusal the watcher's hot reload and run_clean --shards apply."""
    keep = {
        "exact": ("mode", "text_col", "id_col"),
        "minhash": ("mode", "text_col", "id_col", "threshold"),
        "semantic": ("mode", "vec_col", "id_col", "threshold"),
        "span": ("mode", "tokens_col", "id_col", "window"),
    }[args.mode]
    return {k: getattr(args, k) for k in keep}


def _check_store_params(args) -> None:
    import os

    from beamium_ray.state.manifest import atomic_write_bytes

    want = _semantic_params(args)
    p = os.path.join(args.store, "_cli.json")
    if os.path.exists(p):
        try:
            have = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            have = None
        if have != want:
            raise SystemExit(
                f"config error: store {args.store!r} was committed with "
                f"{have} but this run has {want} — restarting with "
                "different dedup semantics would corrupt the durable "
                "store; use a fresh --store (or restore the original "
                "parameters)"
            )
    else:
        atomic_write_bytes(p, json.dumps(want, sort_keys=True).encode())


def _build(args):
    from beamium_ray.datapipe.incdedup import (
        IncrementalExactDedup,
        IncrementalMinHashDedup,
        IncrementalSemanticDedup,
        IncrementalSpanDedup,
    )

    if args.mode == "exact":
        return IncrementalExactDedup(
            args.store, text_col=args.text_col, id_col=args.id_col
        )
    if args.mode == "minhash":
        return IncrementalMinHashDedup(
            args.store,
            threshold=args.threshold,
            text_col=args.text_col,
            id_col=args.id_col,
        )
    if args.mode == "semantic":
        return IncrementalSemanticDedup(
            args.store,
            threshold=args.threshold,
            vec_col=args.vec_col,
            id_col=args.id_col,
        )
    return IncrementalSpanDedup(
        args.store, list_col=args.tokens_col, id_col=args.id_col,
        window=args.window,
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="beamium_ray.run_dedup_watch")
    ap.add_argument("--input", required=True,
                    help="landing dir of *.parquet document batches")
    ap.add_argument("--store", required=True,
                    help="durable incremental store dir (also holds the "
                         "watcher state under _run/)")
    ap.add_argument("--mode", required=True,
                    choices=["exact", "minhash", "semantic", "span"])
    ap.add_argument("--output", default=None,
                    help="span mode: dir for the cleaned per-tick output "
                         "(shard=<batch fp>/ parquet)")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--tokens-col", default="tokens")
    # None = the mode's own library default (minhash 0.8, semantic
    # 0.95) — one shared CLI default would silently override SemDeDup's
    # 0.95 contract and bake the wrong threshold into the store forever
    ap.add_argument("--threshold", type=float, default=None)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--scan-period", type=float, default=10.0)
    ap.add_argument("--max-ticks", type=int, default=None)
    ap.add_argument("--idle-exit", type=int, default=None,
                    help="exit 0 after K consecutive empty scans")
    ap.add_argument("--seen-prune", action="store_true",
                    help="bound the durable seen-set by the live landing "
                         "dir (consumed files tombstoned)")
    ap.add_argument("--store-ttl-ticks", type=int, default=None,
                    help="expire store partitions older than T ticks")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="compact the store every K committed ticks")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--metrics-addr", default=None,
                    help="host:port for a live /metrics endpoint "
                         "(Prometheus text, like run_watch)")
    args = ap.parse_args(argv)
    if args.threshold is None:
        args.threshold = {"minhash": 0.8, "semantic": 0.95}.get(
            args.mode, 0.8
        )
    if args.mode == "span" and not args.output:
        print("config error: span mode needs --output for the cleaned "
              "batches", file=sys.stderr)
        return 2
    # the scan is a recursive *.parquet glob: a store/output nested
    # under --input would be re-ingested as fresh batches every tick —
    # a self-ingestion feedback loop
    import os

    inp_real = os.path.realpath(args.input)
    for name, path in (("--store", args.store), ("--output", args.output)):
        if path and os.path.commonpath(
            [os.path.realpath(path), inp_real]
        ) == inp_real:
            print(f"config error: {name} {path!r} is inside --input "
                  f"{args.input!r}; the daemon would re-ingest its own "
                  "files — point it outside the landing dir",
                  file=sys.stderr)
            return 2
    try:
        _check_store_params(args)
    except SystemExit as ex:
        print(ex, file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from beamium_ray.config import EngineConfig
    from beamium_ray.pipelines.watch import DirectoryWatcher
    from beamium_ray.state.manifest import input_fingerprint

    dd = _build(args)

    def appender(ds, files):
        # the INTENT-TIME fingerprint from the watcher's pending record
        # (FileBatch) — recomputing from the files could diverge if a
        # producer touched one in the intent→append window, and a crash
        # replay would then re-ingest the committed batch
        key = getattr(files, "fingerprint", None) or input_fingerprint(
            files
        )
        out = dd.tick(ds, batch_key=key)
        run = {"batch_key": key}
        if args.mode == "span":
            import shutil

            sdir = os.path.join(args.output, f"shard={key}")
            if os.path.isdir(sdir):  # crash residue: deterministic redo
                shutil.rmtree(sdir)
            out.write_parquet(sdir)
            run["rows_out"] = (
                ray.data.read_parquet(sdir).count()
                if os.path.isdir(sdir) and os.listdir(sdir)
                else 0
            )
            run["output"] = sdir
        else:
            # assignments() is None before the first manifest commit
            # (e.g. a zero-row first batch): 0, not a crash that would
            # wedge the pending record permanently
            run["assignments"] = 0 if out is None else out.count()
        run["store_tick"] = dd._manifest().get("tick")
        return run

    w = DirectoryWatcher(
        args.input,
        EngineConfig(),
        args.store,
        file_extension="parquet",
        loader=lambda files: ray.data.read_parquet(files),
        appender=appender,
        seen_prune=args.seen_prune,
    )

    skip_totals = {"files_ttl_evicted": 0, "compacted": 0}
    live = {"ticks": 0, "files_applied": 0}

    server = None
    if args.metrics_addr:
        import glob as _glob

        from beamium_ray.state.metrics_server import (
            MetricsServer,
            with_reference_aliases,
        )

        def provider():
            vals = {"watch_ticks": live["ticks"],
                    "dedup_files_applied": live["files_applied"],
                    "store_files_ttl_evicted":
                        skip_totals["files_ttl_evicted"],
                    "store_files_compacted": skip_totals["compacted"]}
            # the reference's beamium_directory_files{directory} gauge
            n = len(_glob.glob(
                os.path.join(args.input, "**", "*.parquet"),
                recursive=True,
            ))
            vals[f'directory_files{{directory="{args.input}"}}'] = n
            return with_reference_aliases(vals)

        host, _, port = args.metrics_addr.partition(":")
        server = MetricsServer(provider, host or "127.0.0.1",
                               int(port or 0)).start()
        print(json.dumps({"metrics_url":
                          f"http://{server.host}:{server.port}/metrics"}))
        sys.stdout.flush()

    def on_tick(res, ticks):
        # store lifecycle + per-tick reporting ride DirectoryWatcher's
        # own loop (one loop, not a CLI clone of it)
        live["ticks"] = ticks
        if not (res["applied"] or res["replayed"]):
            return
        live["files_applied"] += len(res["applied"]) + len(res["replayed"])
        if args.store_ttl_ticks is not None:
            gc = dd.retention(max_ticks=args.store_ttl_ticks)
            skip_totals["files_ttl_evicted"] += gc.get("files_deleted", 0)
        tick_no = dd._manifest().get("tick") or 0
        if args.compact_every and tick_no and (
            tick_no % args.compact_every == 0
        ):
            skip_totals["compacted"] += dd.compact()
        print(json.dumps({"tick": ticks, **res["run"],
                          "applied_files": len(res["applied"]),
                          "replayed_files": len(res["replayed"])}))
        sys.stdout.flush()

    summary = w.run(
        scan_period_s=args.scan_period,
        max_ticks=args.max_ticks,
        idle_exit=args.idle_exit,
        on_tick=on_tick,
    )
    print(json.dumps({"ticks": summary["ticks"], "mode": args.mode,
                      **skip_totals}))
    if server is not None:
        server.close()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
