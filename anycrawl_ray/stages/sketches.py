"""Distributed sketches over event streams.

KMV (k-minimum-values) distinct-count sketch — the classic bottom-k
estimator (Bar-Yossef et al. 2002): hash every value with a fixed 64-bit
bijection, keep the k smallest hashes; with U(k) the k-th smallest hash
normalized into (0, 1], E[distinct] ≈ (k-1)/U(k). mix64 is a BIJECTION on
uint64, so distinct values map to distinct hashes — below k observed
hashes the sketch IS the exact distinct count, and the estimator needs no
collision correction.

Scale shape: each block reduces to its own bottom-k (numpy partition —
O(rows) per block, O(k) output), the driver merges O(k × blocks) hashes
once. No shuffle at all; the corpus never leaves the map side. Integer
arithmetic end-to-end ((k-1) * 2^64 // kth via Python bigints) so the
DuckDB oracle (same mix64 macro kernel) matches exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text_analysis import _mix64_np


def kmv_distinct(ds, col: str, k: int = 256) -> pa.Table:
    """Dataset -> 1-row table (est_distinct:int64): KMV distinct-count of
    ``col`` (int64). Exact below k distinct values, (k-1)/U(k) above."""

    def bottom_k(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        h = _mix64_np(np.asarray(v.cast(pa.int64()), dtype=np.int64)
                      .view(np.uint64))
        h = np.unique(h)  # sorted ascending
        return pa.table({"h": pa.array(h[:k], pa.uint64())})

    parts = list(ds.map_batches(bottom_k, batch_format="pyarrow")
                 .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        return pa.table({"est_distinct": pa.array([0], pa.int64())})
    merged = np.unique(np.concatenate(
        [np.asarray(p.column("h").combine_chunks()
                    if isinstance(p.column("h"), pa.ChunkedArray)
                    else p.column("h"), dtype=np.uint64) for p in parts]))
    if merged.size < k:
        est = int(merged.size)
    else:
        kth = int(merged[k - 1])  # k-th smallest over the whole stream
        est = (k - 1) * (1 << 64) // kth
    return pa.table({"est_distinct": pa.array([est], pa.int64())})
