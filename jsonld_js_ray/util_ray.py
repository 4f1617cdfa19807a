"""Shared Ray-side sizing helpers."""

from __future__ import annotations


def cluster_cpus() -> int:
    import ray
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def default_concurrency(requested=None) -> int:
    """Actor-pool size leaving headroom for read/shuffle/write stages.

    A pool that reserves every CPU starves the rest of the pipeline and
    can deadlock an all-to-all shuffle (observed: pool == num_cpus)."""
    cap = max(1, cluster_cpus() - 2)
    return min(requested, cap) if requested else cap


def pool_share(fraction: float, cap=None) -> int:
    """Size one of SEVERAL actor pools in the same pipeline: pools must
    split the headroom budget or together they reserve every CPU and the
    plan deadlocks (observed: two pools summing to num_cpus starve the
    interleaved shuffle)."""
    budget = max(1, cluster_cpus() - 2)
    n = max(1, int(budget * fraction))
    return min(n, cap) if cap else n
