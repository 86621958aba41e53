"""Small shared utilities."""

from __future__ import annotations


def pool_concurrency(want: int = 2, reserve: int = 1) -> int:
    """Actor-pool size clamped below the Ray session's CPU count.

    A pool of full-CPU actors equal to the session's CPUs starves the
    Dataset task stages feeding it (observed hang at num_cpus=2); pair
    this with fractional (0.5) actor num_cpus so at least ``reserve``
    whole CPUs stay schedulable for tasks."""
    import ray

    return max(1, min(want, int(ray.cluster_resources().get("CPU", 2)) - reserve))
