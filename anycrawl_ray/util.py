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


def auto_blocks(paths) -> int | None:
    """Size-aware read parallelism for SMALL inputs. Ray Data's default
    splits every read into ~2x-CPU blocks regardless of size, so a 2 MB
    table becomes 64 ~300-row blocks and per-task fixed cost dominates
    the whole pipeline. Measured at sf0.1/32cpu (min of interleaved
    trials, block-count sweep 4/8/16/32/64): events running-total
    3.49 s @ 64 -> 1.21 s @ 8; decontaminate 2.33 s @ 64 -> 0.88 s @ 8;
    q1 1.21 s @ 64 -> 0.50 s @ 8; even the per-row-CPU-heavy minhash
    prefers 4-32 blocks over 64 (9.1 s @ 64 -> ~4 s). Rule: leave Ray's
    sizing alone once the input can feed every core an 8 MiB block (the
    100-TB regime); below that target ~1 MiB of file per block with a
    floor of 8 blocks (so per-row-heavy stages keep parallelism), and
    for near-empty inputs (< 256 KiB — dimension tables) 32 KiB per
    block with no floor. Returns None for "don't override"."""
    import os

    import ray

    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    total = 0
    try:
        for p in paths:
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    total += sum(os.path.getsize(os.path.join(root, f))
                                 for f in files)
            else:
                total += os.path.getsize(p)
    except OSError:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if total >= cpus * (8 << 20):
        return None
    if total < 256 << 10:
        return max(1, min(8, -(-total // (32 << 10))))
    return max(min(8, 2 * cpus), min(2 * cpus, -(-total // (1 << 20))))


def sized_read_parquet(paths, **kw):
    """``ray.data.read_parquet`` with :func:`auto_blocks` small-input
    block sizing; an explicit ``override_num_blocks`` always wins."""
    import ray.data as rd

    if "override_num_blocks" not in kw:
        nb = auto_blocks(paths)
        if nb is not None:
            kw["override_num_blocks"] = nb
    return rd.read_parquet(paths, **kw)


def gather_table(ds):
    """Materialize a (small, guard-bounded) Dataset to ONE pyarrow
    Table on the driver — the driver-fold gather. Empty datasets yield
    a typed empty table (pa.concat_tables([]) raises), so fold code
    never special-cases zero batches."""
    import pyarrow as pa

    batches = list(ds.iter_batches(batch_size=None,
                                   batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    sch = ds.schema()
    return pa.table({n: pa.array([], t)
                     for n, t in zip(sch.names, sch.types)})
