"""Iterative graph algorithms as Ray Data dataflows.

``pagerank_int`` runs PageRank in EXACT integer fixed-point arithmetic:
ranks are int64 scaled by ``scale``, per-edge contributions are floor
divisions, and the damping update is one integer expression

    r_{t+1}(v) = (15 * (scale // N) + 85 * sum_in(r_t(u) // deg(u))) // 100

so every iteration is order-free integer math — bit-identical between the
Ray pipeline and a DuckDB unrolled-CTE replay (no float summation-order
drift to hide behind). Rank mass lost to dangling nodes and to floor
rounding simply leaks (a standard, well-defined variant — both sides
compute the same thing).

Scale shape per iteration: ONE map_batches over the rank table emits
(dst, contribution) rows plus a (node, 0) presence row per node, ONE
``groupby(node).Sum`` shuffles contributions, ONE map_batches applies the
damping update. No joins when edges are derivable from the node id (the
synthetic site graph); for explicit edge tables, pre-join ``deg`` onto
edges once and substitute an edges-join emitter. Each iteration
materializes so the DAG stays one-iteration deep (the lineage of 10 lazy
iterations would otherwise re-execute everything per consumer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def synthetic_degrees(ids: np.ndarray, n: int) -> np.ndarray:
    """Out-degree of each node under the synthetic-site link rule
    (sources/synthetic_site.page_links — keep in sync)."""
    ids = ids.astype(np.int64)
    deg = ((2 * ids + 1 < n).astype(np.int64)
           + (2 * ids + 2 < n).astype(np.int64)
           + (ids % 3 == 0).astype(np.int64))
    return deg


def pagerank_int(n_nodes: int, iters: int = 10,
                 scale: int = 10 ** 12) -> pa.Table:
    """Integer fixed-point PageRank over the synthetic site graph.
    Returns (doc_id, rank_scaled) sorted by doc_id."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    scale0 = scale // n_nodes
    base = 15 * scale0

    def emit(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch.column("node"), dtype=np.int64)
        r = np.asarray(batch.column("r"), dtype=np.int64)
        deg = synthetic_degrees(node, n_nodes)
        # contribution rides the edge: r(src) // deg(src), fully vectorized
        cvals = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        dsts = [node]  # presence rows keep zero-in-degree nodes present
        contribs = [np.zeros(node.size, np.int64)]
        c1 = 2 * node + 1
        m = c1 < n_nodes
        dsts.append(c1[m]); contribs.append(cvals[m])
        c2 = 2 * node + 2
        m = c2 < n_nodes
        dsts.append(c2[m]); contribs.append(cvals[m])
        m = node % 3 == 0
        dsts.append((7 * node[m] + 3) % n_nodes); contribs.append(cvals[m])
        return pa.table({"node": pa.array(np.concatenate(dsts), pa.int64()),
                         "c": pa.array(np.concatenate(contribs), pa.int64())})

    def update(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("s"), dtype=np.int64)
        r = (base + 85 * s) // 100
        return pa.table({"node": batch.column("node"),
                         "r": pa.array(r, pa.int64())})

    ranks = rd.range(n_nodes).map_batches(
        lambda b: pa.table({"node": pa.array(np.asarray(b.column("id"),
                                                        dtype=np.int64)),
                            "r": pa.array(np.full(len(b), scale0,
                                                  dtype=np.int64))}),
        batch_format="pyarrow")
    for _ in range(iters):
        sums = (ranks.map_batches(emit, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="s")))
        ranks = sums.map_batches(update, batch_format="pyarrow").materialize()

    out = ranks.to_pandas().sort_values("node")
    return pa.table({"doc_id": pa.array(out["node"].to_numpy(), pa.int64()),
                     "rank_scaled": pa.array(out["r"].to_numpy(np.int64),
                                             pa.int64())})
