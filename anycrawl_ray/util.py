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


def init_local_ray(num_cpus: int | None = None, *,
                   log_to_driver: bool = False) -> None:
    """Shared entry-point session init (guarded): local Ray with quiet
    logging and no progress bars. ``log_to_driver=False`` is the default
    because every machine-readable entry point in this repo prints ONE
    JSON line on stdout — streamed raylet/worker warnings would corrupt
    it (see bench.py's one-line contract). Library code never calls this;
    only CLIs, bench and scripts own a session."""
    import logging

    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR", "log_to_driver": log_to_driver}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def join_parts(cap: int = 8) -> int:
    """Hash-join partition count: min(cap, CPUs), floor 2. Joins spawn
    one aggregator ACTOR per partition (fresh processes — cold spawn
    dominates small-scale joins), so the cap stays low; raise it here,
    once, for clusters where join fan-in is the bottleneck."""
    import ray

    return max(2, min(cap, int(ray.cluster_resources().get("CPU", 8))))
