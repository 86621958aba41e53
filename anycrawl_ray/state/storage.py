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
        parts.append(rd.read_parquet(pq_paths))
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
