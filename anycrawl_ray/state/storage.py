"""Pluggable table-storage backend for the document sinks.

The north rule's storage format is Lance (interleaved text+media documents
in Lance tables); this sandbox cannot install ``lance``/``pylance``
(verified: ``import lance`` fails), so the default backend is partitioned
parquet with the same epoch-dir atomic-rename layout, and the Lance
backend sits behind an import guard — on a real cluster the format is a
config flip (``run_crawl(..., storage_format="lance")``), nothing else in
the pipeline changes.

Dispatch is by path extension so worker-side writers (FetchParsePool
workers persist their own part files; the driver never sees page bodies)
need only the pre-built path, not a format flag.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FORMATS = ("parquet", "lance")
_EXT = {"parquet": ".parquet", "lance": ".lance"}


def _lance():
    try:
        import lance  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - exercised via guard test
        raise RuntimeError(
            "storage_format='lance' requires the `lance` (pylance) package, "
            "which is not installed in this environment; use "
            "storage_format='parquet' (same epoch-dir layout)") from e
    return lance


def lance_available() -> bool:
    try:
        import lance  # noqa: F401,PLC0415

        return True
    except ImportError:
        return False


def require_format(fmt: str) -> str:
    """Validate a storage format up front (fail at job submit, not after
    the first epoch of fetching)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown storage_format {fmt!r}; one of {FORMATS}")
    if fmt == "lance":
        _lance()
    return fmt


def part_extension(fmt: str) -> str:
    return _EXT[fmt]


def is_part(name: str) -> bool:
    return name.endswith(".parquet") or name.endswith(".lance")


def write_table(table: pa.Table, path: str) -> None:
    """Write one part; format from the extension. ``.lance`` parts are
    Lance datasets (directories); ``.parquet`` parts are files. Both land
    inside the epoch tmp dir, so the epoch rename stays atomic either way."""
    if path.endswith(".lance"):
        _lance().write_dataset(table, path, mode="create")
    else:
        pq.write_table(table, path)


def read_table(path: str) -> pa.Table:
    if path.endswith(".lance"):
        return _lance().dataset(path).to_table()
    return pq.read_table(path)


def read_dataset(paths: list[str]):
    """Ray Data reader over part files of either format (streaming scan —
    the sink's scale-side read path)."""
    import ray.data as rd

    lance_paths = [p for p in paths if p.endswith(".lance")]
    pq_paths = [p for p in paths if not p.endswith(".lance")]
    parts = []
    if pq_paths:
        from ..util import sized_read_parquet

        parts.append(sized_read_parquet(pq_paths))
    for lp in lance_paths:  # pragma: no cover - needs lance
        parts.append(rd.read_lance(lp))
    if not parts:
        return rd.from_arrow(pa.table({}))
    ds = parts[0]
    for p in parts[1:]:  # pragma: no cover - mixed formats
        ds = ds.union(p)
    return ds


def latest_format(job_out: str | None) -> str:
    """Detect the part format of an existing job dir (resume must keep
    writing what the first run wrote)."""
    if not job_out or not os.path.isdir(job_out):
        return "parquet"
    for name in sorted(os.listdir(job_out)):
        if not name.startswith("epoch="):
            continue
        edir = os.path.join(job_out, name)
        for f in os.listdir(edir):
            if f.endswith(".lance"):
                return "lance"
            if f.endswith(".parquet"):
                return "parquet"
    return "parquet"


def write_dataset_partitioned(ds, out_dir: str, by: str,
                              fmt: str = "parquet",
                              skip_finished: bool = True) -> dict:
    """Resumable partitioned sink: one directory per distinct ``by``
    value, each written to a temp path and atomically renamed when its
    partition is COMPLETE — a re-run after a crash skips finished
    partitions (present = complete, the crawl epoch-sink invariant) and
    rewrites only the missing ones. Returns {partition: n_rows}.

    Scale shape: ONE hash shuffle co-locates each partition
    (groupby(by).map_groups), every partition file writes WORKER-side
    inside the group kernel (the driver never sees rows), and the
    skip-set is just a directory listing. Keys should be
    bounded-cardinality (split names, date buckets, shard ids) — this
    is the job-output sink, not a general repartitioner."""
    import json

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    ext = part_extension(require_format(fmt))
    done = set()
    if skip_finished:
        done = {d[len("part="):] for d in os.listdir(out_dir)
                if d.startswith("part=")}
    if done:
        import pyarrow.compute as pc

        done_arr = pa.array(sorted(done), pa.string())

        def drop_done(batch: pa.Table) -> pa.Table:
            keys = pc.cast(batch.column(by), pa.string())
            return batch.filter(pc.invert(pc.is_in(keys,
                                                   value_set=done_arr)))

        # finished partitions drop BEFORE the shuffle (vectorized)
        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"part": pd.Series([], dtype=object),
                                 "n_rows": pd.Series([], dtype="int64")})
        key = str(df[by].iloc[0])
        final = os.path.join(out_dir, f"part={key}")
        tmp = final + f".tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        write_table(pa.Table.from_pandas(df, preserve_index=False),
                    os.path.join(tmp, f"data{ext}"))
        try:
            os.rename(tmp, final)  # atomic: partition appears complete
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)  # concurrent winner
        return pd.DataFrame({"part": [key], "n_rows": [len(df)]})

    out = (ds.groupby(by).map_groups(write_group, batch_format="pandas")
           .to_pandas())
    counts = {} if len(out) == 0 else dict(zip(out["part"], out["n_rows"]))
    manifest = os.path.join(out_dir, "MANIFEST.json")
    existing = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            existing = json.load(f)
    existing.update({k: int(v) for k, v in counts.items()})
    with open(manifest + ".tmp", "w") as f:
        json.dump(existing, f, sort_keys=True)
    os.rename(manifest + ".tmp", manifest)
    return counts
