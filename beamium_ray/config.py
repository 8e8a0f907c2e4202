"""Typed engine configuration (the reference's YAML config surface,
re-expressed for batch jobs — SURVEY.md §2.6).

The reference merges scraper/sink/parameters config from YAML/JSON/TOML
(ref ``src/conf.rs:101-184``); hot-reload is out of scope for a batch
engine — the config is stamped (hashed) into every run manifest instead.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field

# retention tiers: name → window width in µs (the engine's analog of
# beamium's sink routing; SURVEY.md §2.4)
DEFAULT_TIERS: dict[str, int] = {
    "1m": 60_000_000,
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
}


@dataclass
class EngineConfig:
    # parse / relabel (reference scraper config, src/conf.rs:209-265)
    format: str = "prometheus"  # or "sensision"
    metrics_whitelist: list[str] = field(default_factory=list)  # P5 patterns
    labels: str = ""  # static labels to add, "k=v,k=v" (P6)
    filtered_labels: list[str] = field(default_factory=list)  # keys to drop (P7)

    # routing (reference sink selectors, src/conf.rs:329-336)
    selector: str | None = None  # anchored-^ class-token regex, None = all

    # rollup
    tiers: dict[str, int] = field(default_factory=lambda: dict(DEFAULT_TIERS))
    num_buckets: int = 64  # series_key hash buckets (the one shuffle)
    shuffle_blocks: int | None = None  # coalesce partials pre-shuffle (~CPUs)
    gapfill: bool = True

    # retention (reference DFO bounds, src/sink.rs:102-221)
    ttl_us: dict[str, int] = field(default_factory=dict)  # per-tier horizon
    max_bytes: int | None = None  # size cap across blocks (oldest evicted)

    # io
    output_dir: str = "/tmp/beamium_ray_out"
    target_rows_per_block: int = 500_000

    def config_hash(self) -> str:
        blob = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(blob).hexdigest()[:16]
