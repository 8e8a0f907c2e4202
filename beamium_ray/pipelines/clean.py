"""Config-driven training-data CLEANING pipeline: compose the
gate-verified datapipe stages into one streaming Ray Data job.

The product surface for the training-data op set (the rollup engine's
sibling): a user describes stages in YAML/JSON and `run_clean`
executes them as ONE lazy Dataset pipeline — quality filtering,
boilerplate removal, decontamination, exact dedup, sampling/mixing and
split assignment, ending in partitioned Parquet.

Stage registry (each maps to a gate-verified operator):

  quality_filter    drop docs failing the Gopher composite rules
                    (textstats.quality_filter_batch; params: min_words)
  drop_boilerplate  delete corpus-frequent chunks from every doc
                    (dedup.drop_frequent_chunks; words_per_chunk,
                    max_occurrences) — rewrites text in place
  decontaminate     drop docs sharing a word n-gram with a benchmark
                    parquet (decontam.drop_contaminated; benchmark, g)
  dedup_exact       keep one doc per distinct text
                    (dedup.exact_dedup mode=hash128 keys a broadcast
                    keep-set — see _apply_dedup_exact for the contract)
  sample            deterministic (stratified) hash sampling
                    (sample.hash_sample; rate_ppm, strat_col, rates_ppm)
  mixture_sample    temperature rebalance (sample.mixture_sample;
                    strat_col, temperature)
  assign_splits     add a disjoint train/val/test column
                    (sample.assign_splits; fractions_ppm)
  redact_pii        scrub emails/IPs/phone-shaped spans in place
                    (textstats.redact_pii; optional custom rules)
  dedup_semantic    SemDeDup keep-one-per-semantic-group over an
                    embedding column (dedup.semantic_dedup; vec_col,
                    n_clusters, threshold, train)
  tokenize          BPE-tokenize the text column into tokens
                    (list<int32>) + n_tok, the canonical sequence-table
                    shape for the packing ops (bpe.bpe_encode;
                    n_merges, keep_text)
  truncate          context-length shaping over the tokens column
                    (packing.truncate_sequences; min_len, max_len)
  cap_per_key       keep at most `cap` docs per key value (domain
                    caps — sample.cap_per_key; key_col, cap)
  token_budget      keep docs per key, in salted-hash order, while
                    the cumulative count column stays ≤ budget
                    (sample.token_budget_per_key; key_col, budget,
                    count_col — run AFTER tokenize for n_tok budgets)
  shuffle           deterministic global training-order shuffle:
                    sort by splitmix64(id ^ salt) — reproducible on
                    any cluster size, unlike random_shuffle()
                    (sample.SHUFFLE_SALT default; params: salt)
  pack              TERMINAL stage: concat tokens in id order and cut
                    into seq_len-token training sequences
                    (packing.emit_packed_rows; seq_len) — output rows
                    are (seq_id, pos_in_seq, token), so it must be the
                    LAST stage and is incompatible with split
                    partitioning

Scale notes: every stage is a pure map / broadcast probe except
drop_boilerplate's narrow hash-count groupby and dedup_exact (see its
contract). Output is written as partitioned Parquet (by `split` when
present) so a failed run can be re-executed per partition.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace


VALID_STAGES = {
    "quality_filter", "drop_boilerplate", "decontaminate",
    "dedup_exact", "dedup_minhash", "dedup_semantic", "sample",
    "mixture_sample", "assign_splits", "redact_pii", "tokenize",
    "truncate", "pack", "cap_per_key", "shuffle", "token_budget",
    "span_dedup",
}

# Stages whose per-row output depends ONLY on that row (plus broadcast
# constants like the decontamination benchmark or salted hashes): a
# sharded run over these is row-for-row identical to the one-shot run.
# Everything else holds cross-document state (dedup keep-sets, global
# frequency tables, global caps/budgets/orderings) and, under sharding,
# applies WITHIN each shard only — a deliberate locality trade the
# caller must opt into (the standard posture at 10^12 docs: global
# dedup runs as its own dedicated job; within-shard dedup is the
# common cheap pre-pass).
SHARD_SAFE_STAGES = {
    "quality_filter", "decontaminate", "sample", "assign_splits",
    "redact_pii", "tokenize", "truncate",
}


class _TokenizeStage:
    """Cached stage for the `tokenize` clean step: BPE-encode the text
    column, PRESERVING every other column (split partitioning and
    stratification columns must survive), optionally dropping the raw
    text afterwards (the normal end-state of a tokenize step)."""

    def __init__(self, merges: tuple, text_col: str, id_col: str,
                 keep_text: bool):
        from beamium_ray.datapipe.bpe import _BpeEncoder

        self.enc = _BpeEncoder(merges, text_col, id_col)
        self.text_col = text_col
        self.keep_text = keep_text

    def __call__(self, batch):
        out = self.enc(batch)
        if not self.keep_text:
            batch = batch.drop_columns([self.text_col])
        return batch.append_column(
            "tokens", out["tokens"]
        ).append_column("n_tok", out["n_tok"])


@dataclass
class CleanConfig:
    input: str
    output: str
    stages: list[dict] = field(default_factory=list)
    text_col: str = "text"
    id_col: str = "doc_id"

    @classmethod
    def from_file(cls, path: str) -> "CleanConfig":
        if path.endswith((".yaml", ".yml")):
            import yaml

            with open(path) as f:
                raw = yaml.safe_load(f)
        else:
            with open(path) as f:
                raw = json.load(f)
        return cls(**raw)

    def validate(self) -> None:
        if not self.input:
            raise ValueError("clean config needs an 'input' parquet path")
        if not self.output:
            raise ValueError("clean config needs an 'output' dir")
        if not self.stages:
            raise ValueError("clean config needs a non-empty 'stages' list")
        for st in self.stages:
            if not isinstance(st, dict) or len(st) != 1:
                raise ValueError(
                    f"each stage must be a one-key mapping, got {st!r}"
                )
            (name, params), = st.items()
            if name not in VALID_STAGES:
                raise ValueError(
                    f"unknown stage {name!r}; valid: {sorted(VALID_STAGES)}"
                )
            if params is not None and not isinstance(params, dict):
                raise ValueError(f"stage {name!r} params must be a mapping")
            if name == "decontaminate" and not (params or {}).get(
                "benchmark"
            ):
                raise ValueError(
                    "decontaminate stage needs a 'benchmark' parquet path"
                )
            if name == "token_budget" and not (params or {}).get("budget"):
                raise ValueError(
                    "token_budget stage needs a positive 'budget'"
                )
        names = [next(iter(st)) for st in self.stages]
        if "pack" in names:
            if names[-1] != "pack" or names.count("pack") > 1:
                raise ValueError(
                    "pack emits (seq_id, pos_in_seq, token) rows — it "
                    "must be the single LAST stage"
                )
            if "assign_splits" in names:
                raise ValueError(
                    "pack and assign_splits are incompatible: packed "
                    "rows carry no split column (split BEFORE packing "
                    "by running one clean job per split)"
                )


def _broadcast_keep_filter(ds, keep_ds, id_out_col: str, id_col: str,
                           max_reps: int, stage: str, pred=None):
    """Shared keep-set filter for the dedup stages: stream the
    representative ids off ``keep_ds`` (column ``id_out_col``; optional
    row predicate ``pred``), broadcast them sorted, keep exactly those
    rows of ``ds`` per block.

    Contract: the keep-set is 8 B per SURVIVOR; above ``max_reps``
    this fails loudly — at that scale write the dedup labels and join
    offline instead. For a cleaning pipeline over a shard, the
    broadcast form is the pragmatic one."""
    import numpy as np
    import pyarrow as pa
    import ray

    ids_parts = []
    total = 0
    for b in keep_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if pred is not None:
            b = pred(b)
        ids_parts.append(b[id_out_col].to_numpy(zero_copy_only=False))
        total += b.num_rows
        if total > max_reps:
            raise RuntimeError(
                f"{stage} keep-set exceeds max_broadcast_reps="
                f"{max_reps}; raise it or dedup offline via the "
                "label table + a join"
            )
    keep = np.sort(np.concatenate(ids_parts)) if ids_parts else (
        np.zeros(0, np.int64)
    )
    keep_ref = ray.put(keep)

    def f(batch: pa.Table, _ref=keep_ref) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        k = ray.get(_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if not len(k):
            return batch.filter(pa.array(np.zeros(len(ids), bool)))
        pos = np.searchsorted(k, ids)
        pos[pos == len(k)] = 0
        return batch.filter(pa.array(k[pos] == ids))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def _apply_dedup_exact(ds, cfg: CleanConfig, params: dict):
    """Exact dedup as a row FILTER: run exact_dedup(mode="hash128") —
    only (h1, h2, id, n) rows shuffle — then the shared broadcast
    keep-set filter."""
    from beamium_ray.datapipe.dedup import exact_dedup

    # the keep-set pass AND the final write both read ds — materialize
    # so the upstream stages don't re-execute per dedup stage
    ds = ds.materialize()
    reps = exact_dedup(
        ds, text_col=cfg.text_col, id_col=cfg.id_col, mode="hash128"
    )
    return _broadcast_keep_filter(
        ds, reps, "doc_id", cfg.id_col,
        int(params.get("max_broadcast_reps", 50_000_000)), "dedup_exact",
    )


def _apply_dedup_minhash(ds, cfg: CleanConfig, params: dict):
    """Near-dup dedup as a row FILTER: minhash_dedup labels every doc
    with its cluster min; representatives (doc_id == cluster) form the
    keep-set, applied via the shared broadcast filter. Pass
    ``verify_threshold`` for exact-Jaccard-verified clusters (the
    distributed verify route engages automatically above the pair
    cap)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from beamium_ray.datapipe.dedup import minhash_dedup

    ds = ds.materialize()  # labels pass + final write both read ds
    shingles = params.get("shingles", "chars")
    labels = minhash_dedup(
        ds,
        # shingles='tokens' dedups the PRE-TOKENIZED payload (after a
        # tokenize stage): the shingled column is the token list, and
        # k defaults to 8-token grams instead of 5-byte windows
        text_col=params.get(
            "text_col",
            "tokens" if shingles == "tokens" else cfg.text_col,
        ),
        id_col=cfg.id_col,
        k=int(params.get("k", 8 if shingles == "tokens" else 5)),
        verify_threshold=params.get("verify_threshold"),
        shingles=shingles,
    )

    def reps_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["doc_id"], b["cluster"]))

    return _broadcast_keep_filter(
        ds, labels, "doc_id", cfg.id_col,
        int(params.get("max_broadcast_reps", 50_000_000)), "dedup_minhash",
        pred=reps_only,
    )


def _apply_dedup_semantic(ds, cfg: CleanConfig, params: dict):
    """SemDeDup as a row FILTER: semantic_dedup labels every doc with
    its verified cosine-component min over k-means cells; the
    representatives form the keep-set (shared broadcast filter).
    Requires an embedding column (params: vec_col, n_clusters,
    threshold, train)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from beamium_ray.datapipe.dedup import semantic_dedup

    ds = ds.materialize()  # labels pass + final write both read ds
    labels = semantic_dedup(
        ds,
        n_clusters=int(params.get("n_clusters", 64)),
        vec_col=params.get("vec_col", "embedding"),
        id_col=cfg.id_col,
        threshold=float(params.get("threshold", 0.95)),
        train=params.get("train", "sample"),
    )

    def reps_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["doc_id"], b["cluster"]))

    return _broadcast_keep_filter(
        ds, labels, "doc_id", cfg.id_col,
        int(params.get("max_broadcast_reps", 50_000_000)),
        "dedup_semantic", pred=reps_only,
    )


def _apply_drop_boilerplate(ds, cfg: CleanConfig, params: dict):
    import pyarrow as pa

    from beamium_ray.datapipe.dedup import drop_frequent_chunks

    # output="replace": the text column is rewritten IN PLACE and every
    # other column (source, split, …) passes through — downstream
    # stages and the partitioned writer depend on them
    return drop_frequent_chunks(
        ds,
        text_col=cfg.text_col,
        id_col=cfg.id_col,
        words_per_chunk=int(params.get("words_per_chunk", 10)),
        max_occurrences=int(params.get("max_occurrences", 1)),
        output="replace",
    )


def build_clean_pipeline(cfg: CleanConfig):
    """Compose the configured stages into one lazy Dataset. Ray must
    already be initialised."""
    import ray.data

    from beamium_ray.datapipe.decontam import drop_contaminated
    from beamium_ray.datapipe.sample import (
        assign_splits, hash_sample, mixture_sample,
    )
    from beamium_ray.datapipe.textstats import quality_filter_batch

    from beamium_ray.datapipe.sample import SAMPLE_SALT
    from beamium_ray.functions.hashing import splitmix64 as _smx

    import numpy as np

    def _stage_salt(idx: int) -> int:
        # each sampling stage draws INDEPENDENTLY: a shared salt
        # correlates the draws (stage-2 rates apply only to stage-1
        # survivors, all of whom satisfy draw < rate_1 — the same bug
        # class fixed for assign_splits). Deterministic in stage order.
        return int(
            _smx(np.uint64(SAMPLE_SALT) ^ np.uint64(idx + 1))
            & np.uint64((1 << 63) - 1)
        )

    ds = ray.data.read_parquet(cfg.input)
    for idx, st in enumerate(cfg.stages):
        (name, params), = st.items()
        params = params or {}
        if name == "quality_filter":
            import pyarrow as pa

            min_words = int(params.get("min_words", 20))

            def qf(b, _mw=min_words):
                if b.num_rows == 0:
                    return b
                q = quality_filter_batch(
                    b, text_col=cfg.text_col, id_col=cfg.id_col,
                    min_words=_mw,
                )
                keep = q["keep"].to_numpy(zero_copy_only=False) == 1
                return b.filter(pa.array(keep))

            ds = ds.map_batches(qf, batch_format="pyarrow", batch_size=None)
        elif name == "drop_boilerplate":
            ds = _apply_drop_boilerplate(ds, cfg, params)
        elif name == "decontaminate":
            import ray.data as rd

            bench = rd.read_parquet(params["benchmark"])
            ds = drop_contaminated(
                ds, bench, text_col=cfg.text_col,
                g=int(params.get("g", 8)),
            )
        elif name == "dedup_exact":
            ds = _apply_dedup_exact(ds, cfg, params)
        elif name == "dedup_minhash":
            ds = _apply_dedup_minhash(ds, cfg, params)
        elif name == "dedup_semantic":
            ds = _apply_dedup_semantic(ds, cfg, params)
        elif name == "sample":
            ds = hash_sample(
                ds,
                key_col=cfg.id_col,
                rate_ppm=int(params.get("rate_ppm", 500_000)),
                strat_col=params.get("strat_col"),
                rates_ppm=params.get("rates_ppm"),
                salt=_stage_salt(idx),
            )
        elif name == "mixture_sample":
            ds = mixture_sample(
                ds,
                key_col=cfg.id_col,
                strat_col=params["strat_col"],
                temperature=float(params.get("temperature", 2.0)),
                salt=_stage_salt(idx),
            )
        elif name == "redact_pii":
            from beamium_ray.datapipe.textstats import redact_pii

            kw = {}
            if params.get("rules"):
                kw["rules"] = tuple(
                    (r["pattern"], r["replacement"])
                    for r in params["rules"]
                )
            ds = redact_pii(ds, text_col=cfg.text_col, **kw)
        elif name == "assign_splits":
            ds = assign_splits(
                ds, key_col=cfg.id_col,
                fractions_ppm=params.get("fractions_ppm"),
            )
        elif name == "tokenize":
            from beamium_ray.datapipe.bpe import default_merges
            from beamium_ray.functions.cluster import cached_stage

            merges = tuple(
                default_merges(int(params.get("n_merges", 48)))
            )
            ds = ds.map_batches(
                cached_stage(
                    _TokenizeStage, merges, cfg.text_col, cfg.id_col,
                    bool(params.get("keep_text", False)),
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        elif name == "cap_per_key":
            from beamium_ray.datapipe.sample import cap_per_key

            ds = cap_per_key(
                ds,
                key_col=params.get("key_col", "source"),
                cap=int(params.get("cap", 100)),
                id_col=cfg.id_col,
            )
        elif name == "token_budget":
            from beamium_ray.datapipe.sample import token_budget_per_key

            ds = token_budget_per_key(
                ds,
                key_col=params.get("key_col", "source"),
                budget=int(params["budget"]),
                count_col=params.get("count_col", "n_tok"),
                id_col=cfg.id_col,
            )
        elif name == "shuffle":
            import pyarrow as pa

            from beamium_ray.datapipe.sample import SHUFFLE_SALT

            salt = int(params.get("salt", SHUFFLE_SALT))

            def add_key(b: pa.Table, _s=salt) -> pa.Table:
                ids = b[cfg.id_col].to_numpy(zero_copy_only=False)
                h = _smx(ids.astype(np.uint64) ^ np.uint64(_s))
                # sign-bit flip keeps the UNSIGNED hash order in int64
                # space, so this order equals sample.shuffle_order's
                return b.append_column(
                    "_sk",
                    pa.array(
                        (h ^ np.uint64(1 << 63)).astype(np.int64),
                        pa.int64(),
                    ),
                )

            # the one deliberate all-to-all: a training corpus ships
            # globally shuffled; the salted-hash key keeps the order
            # deterministic and resumable (sample.shuffle_order is the
            # narrow rank-only variant when payloads must not move)
            ds = ds.map_batches(
                add_key, batch_format="pyarrow", batch_size=None
            ).sort(["_sk", cfg.id_col]).drop_columns(["_sk"])
        elif name == "truncate":
            from beamium_ray.datapipe.packing import truncate_sequences

            ds = truncate_sequences(
                ds,
                list_col=params.get("tokens_col", "tokens"),
                len_col=params.get("len_col", "n_tok"),
                max_len=int(params.get("max_len", 2048)),
                min_len=int(params.get("min_len", 0)),
            )
        elif name == "span_dedup":
            from beamium_ray.datapipe.spandedup import (
                remove_duplicate_spans,
            )

            # runs AFTER tokenize; same integer-id contract as `pack`
            # (marks are keyed by int64 ids). Materialize: the op
            # consumes its input twice (occurrence pass + apply pass)
            # and must not re-execute upstream stages — same contract
            # as the pack stage.
            ds = remove_duplicate_spans(
                ds.materialize(),
                list_col=params.get("tokens_col", "tokens"),
                id_col=params.get("id_col", cfg.id_col),
                window=int(params.get("window", 50)),
                keep=params.get("keep", "first"),
            )
        elif name == "pack":
            from beamium_ray.datapipe.packing import emit_packed_rows

            # pack consumes integer ids; docs keyed by string doc_id
            # gain a derived dense `ord` from the id hash order — a
            # deterministic pure map (the documents fixture already
            # carries int ids in tests; keep the contract simple: the
            # id column must be integer-typed)
            ds = emit_packed_rows(
                ds.materialize(),  # counts + emit passes share one exec
                id_col=params.get("id_col", cfg.id_col),
                tokens_col=params.get("tokens_col", "tokens"),
                seq_len=int(params.get("seq_len", 2048)),
            )
    return ds


def run_clean(cfg: CleanConfig) -> dict:
    """Execute the pipeline and write partitioned Parquet (by `split`
    when an assign_splits stage ran). Returns a one-line summary."""
    import os

    import ray.data

    cfg.validate()
    if os.path.isdir(cfg.output) and os.listdir(cfg.output):
        # mixing runs silently inflates the output (observed live:
        # rows_out 2608 of rows_in 2000 after a re-run) — refuse
        raise RuntimeError(
            f"output dir {cfg.output!r} is not empty; clean runs write "
            "a fresh directory (delete it or point elsewhere)"
        )
    rows_in = ray.data.read_parquet(cfg.input).count()  # footers only
    ds = build_clean_pipeline(cfg)
    has_split = any("assign_splits" in st for st in cfg.stages)
    if has_split:
        ds.write_parquet(cfg.output, partition_cols=["split"])
    else:
        ds.write_parquet(cfg.output)
    # an all-filtered pipeline writes no files at all — report 0, not
    # a FileNotFoundError from the count-back
    rows_out = (
        ray.data.read_parquet(cfg.output).count()
        if os.path.isdir(cfg.output) and os.listdir(cfg.output)
        else 0
    )
    return {
        "input": cfg.input,
        "output": cfg.output,
        "stages": [next(iter(st)) for st in cfg.stages],
        "rows_in": int(rows_in),
        "rows_out": int(rows_out),
        "partitioned_by_split": has_split,
    }


def _clean_config_sig(cfg: CleanConfig) -> str:
    """Semantic signature of the pipeline: a shard committed under a
    DIFFERENT stage list / column config must not be skipped."""
    import hashlib

    return hashlib.sha256(
        json.dumps(
            {
                "stages": cfg.stages,
                "text_col": cfg.text_col,
                "id_col": cfg.id_col,
            },
            sort_keys=True,
            default=str,
        ).encode()
    ).hexdigest()[:16]


def _input_files(input_path: str) -> list[str]:
    import glob as _glob
    import os

    if os.path.isdir(input_path):
        files = sorted(
            _glob.glob(
                os.path.join(input_path, "**", "*.parquet"), recursive=True
            )
        )
    else:
        files = sorted(_glob.glob(input_path)) or [input_path]
    if not files or not os.path.exists(files[0]):
        raise ValueError(f"no parquet input found at {input_path!r}")
    return files


def run_clean_sharded(
    cfg: CleanConfig,
    files_per_shard: int = 64,
    allow_within_shard: bool = False,
) -> dict:
    """Resumable clean run: input files → shards → one pipeline run and
    one output directory (``shard=<fp>/``) per shard, committed by an
    atomic per-shard manifest (``_shards/<fp>.json``). A rerun skips
    committed shards and sweeps+redoes half-written ones, so a killed
    100 TB job resumes at shard granularity — the same
    blocks-then-manifest protocol as the rollup store.

    Shard fingerprints fold in the input files (path+size+mtime) AND
    the pipeline signature; a semantic config change over a partially
    committed output dir is refused (mirrors the watch daemon's reload
    rule) rather than silently mixing two pipelines' shards. Committed
    shards whose fingerprint is no longer in the CURRENT input grouping
    (a file added/modified, ``files_per_shard`` changed) are swept
    before the run — any reader of the output dir sees exactly the
    current input's rows, never a stale grouping's duplicates. A
    non-empty output dir that is not a sharded-run output is refused.

    Stages outside :data:`SHARD_SAFE_STAGES` see only their own shard;
    pass ``allow_within_shard=True`` to accept that semantic (refused
    loudly otherwise).
    """
    import os

    import ray.data

    from beamium_ray.state.manifest import (
        atomic_write_bytes,
        input_fingerprint,
    )

    cfg.validate()
    names = [next(iter(st)) for st in cfg.stages]
    cross = [n for n in names if n not in SHARD_SAFE_STAGES]
    if cross and not allow_within_shard:
        raise ValueError(
            f"stages {cross} hold cross-document state and would apply "
            "WITHIN each shard under sharded execution; pass "
            "allow_within_shard=True (CLI: --allow-within-shard) to "
            "accept per-shard semantics, or run them as a dedicated "
            "unsharded job"
        )
    if files_per_shard < 1:
        raise ValueError("files_per_shard must be >= 1")

    sig = _clean_config_sig(cfg)
    sdir = os.path.join(cfg.output, "_shards")
    sig_path = os.path.join(sdir, "_config.json")
    if (
        os.path.isdir(cfg.output)
        and os.listdir(cfg.output)
        and not os.path.exists(sig_path)
    ):
        # same rationale as run_clean's refusal: writing shards next to
        # a previous one-shot run's parquet silently doubles every row
        # for any reader of the output dir
        raise RuntimeError(
            f"output dir {cfg.output!r} is non-empty and not a sharded-"
            "run output (no _shards/_config.json); refusing to mix — "
            "use a fresh output dir"
        )
    if os.path.exists(sig_path):
        try:
            prev = json.load(open(sig_path)).get("config_sig")
        except (json.JSONDecodeError, OSError):
            prev = None
        if prev != sig:
            raise RuntimeError(
                f"output dir {cfg.output!r} holds shards committed under "
                f"a different pipeline (config_sig {prev} != {sig}); "
                "resuming would mix two pipelines' outputs — use a fresh "
                "output dir (or delete this one) after a config change"
            )
    else:
        atomic_write_bytes(
            sig_path, json.dumps({"config_sig": sig}).encode()
        )

    files = _input_files(cfg.input)
    shards = [
        files[i : i + files_per_shard]
        for i in range(0, len(files), files_per_shard)
    ]
    expected = {
        input_fingerprint(s, extra=sig): s for s in shards
    }
    # reconcile: shards committed under a DIFFERENT input grouping (a
    # file added/modified, files_per_shard changed) are stale — their
    # rows would appear TWICE to any reader of the output dir next to
    # the regrouped shards. Manifest first, dir second: a crash between
    # the two leaves a manifest-less dir the dir sweep removes on the
    # next run.
    import shutil

    swept = 0
    for f in os.listdir(sdir):
        if f.startswith("_") or not f.endswith(".json"):
            continue
        if f[:-5] not in expected:
            os.remove(os.path.join(sdir, f))
            swept += 1
    for d in os.listdir(cfg.output):
        if d.startswith("shard=") and d.split("=", 1)[1] not in expected:
            shutil.rmtree(os.path.join(cfg.output, d))
            swept += 1
    has_split = "assign_splits" in names
    done = skipped = rows_in = rows_out = 0
    for fp, shard_files in expected.items():
        mpath = os.path.join(sdir, f"{fp}.json")
        out = os.path.join(cfg.output, f"shard={fp}")
        if os.path.exists(mpath):
            try:
                m = json.load(open(mpath))
                rows_in += m["rows_in"]
                rows_out += m["rows_out"]
                skipped += 1
                continue
            except (json.JSONDecodeError, KeyError, OSError):
                pass  # torn manifest: uncommitted, redo the shard
        if os.path.isdir(out):  # crash residue: output without manifest
            shutil.rmtree(out)
        n_in = ray.data.read_parquet(shard_files).count()  # footers only
        sc = replace(cfg, input=shard_files, output=out)
        ds = build_clean_pipeline(sc)
        if has_split:
            ds.write_parquet(out, partition_cols=["split"])
        else:
            ds.write_parquet(out)
        n_out = (
            ray.data.read_parquet(out).count()
            if os.path.isdir(out) and os.listdir(out)
            else 0
        )
        atomic_write_bytes(
            mpath,
            json.dumps(
                {
                    "files": shard_files,
                    "config_sig": sig,
                    "rows_in": int(n_in),
                    "rows_out": int(n_out),
                },
                sort_keys=True,
            ).encode(),
        )
        rows_in += n_in
        rows_out += n_out
        done += 1
    return {
        "input": cfg.input,
        "output": cfg.output,
        "stages": names,
        "shards": len(shards),
        "shards_run": done,
        "shards_skipped": skipped,
        "shards_swept": swept,
        "rows_in": int(rows_in),
        "rows_out": int(rows_out),
        "partitioned_by_split": has_split,
    }
