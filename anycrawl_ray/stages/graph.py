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

from ..util import gather_table as _gather
import pyarrow.compute as pc


def synthetic_degrees(ids: np.ndarray, n: int) -> np.ndarray:
    """Out-degree of each node under the synthetic-site link rule
    (sources/synthetic_site.page_links — keep in sync)."""
    ids = ids.astype(np.int64)
    deg = ((2 * ids + 1 < n).astype(np.int64)
           + (2 * ids + 2 < n).astype(np.int64)
           + (ids % 3 == 0).astype(np.int64))
    return deg


def pagerank_int(n_nodes: int, iters: int = 10,
                 scale: int = 10 ** 12,
                 broadcast_limit: int = 10_000_000) -> pa.Table:
    """Integer fixed-point PageRank over the synthetic site graph.
    Returns (doc_id, rank_scaled) sorted by doc_id.

    Scale shape (the hits_int/triangle_counts dense duality): under
    ``broadcast_limit`` nodes the score vector is node-bounded — the
    same size as this function's own output — so the whole iteration is
    a dense numpy fold on the driver (10 Ray groupby-Sum shuffles of a
    tiny table measured ~4.7 s of pure fixed cost; the dense fold is
    milliseconds). Above the limit, one groupby-Sum per iteration over
    the emitted contribution rows; both paths pinned equal in pytest."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    scale0 = scale // n_nodes
    base = 15 * scale0

    if n_nodes <= broadcast_limit:
        node = np.arange(n_nodes, dtype=np.int64)
        deg = synthetic_degrees(node, n_nodes)
        c1 = 2 * node + 1
        m1 = c1 < n_nodes
        c2 = 2 * node + 2
        m2 = c2 < n_nodes
        m3 = node % 3 == 0
        ch = (7 * node[m3] + 3) % n_nodes
        r = np.full(n_nodes, scale0, dtype=np.int64)
        for _ in range(iters):
            cvals = np.where(deg > 0, r // np.maximum(deg, 1), 0)
            s = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(s, c1[m1], cvals[m1])
            np.add.at(s, c2[m2], cvals[m2])
            np.add.at(s, ch, cvals[m3])
            r = (base + 85 * s) // 100
        return pa.table({"doc_id": pa.array(node, pa.int64()),
                         "rank_scaled": pa.array(r, pa.int64())})

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


def site_edges(ds, n_nodes: int):
    """Deterministic undirected link graph over doc ids (0..n-1), as
    canonical (a < b) edge rows: the binary-tree edges, the sibling edge
    closing each (parent, child, child) triangle, and a (i, (7i+3) mod n)
    chord for irregularity. SQL-replicable (see _TRIANGLES_SQL)."""

    def emit(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch.column("doc_id"), dtype=np.int64)
        a_parts, b_parts = [], []
        c1, c2 = 2 * i + 1, 2 * i + 2
        m = c1 < n_nodes
        a_parts.append(i[m]); b_parts.append(c1[m])
        m = c2 < n_nodes
        a_parts.append(i[m]); b_parts.append(c2[m])
        a_parts.append(c1[m]); b_parts.append(c2[m])  # sibling closure
        ch = (7 * i + 3) % n_nodes
        m = ch != i
        a_parts.append(np.minimum(i[m], ch[m]))
        b_parts.append(np.maximum(i[m], ch[m]))
        return pa.table({"a": pa.array(np.concatenate(a_parts), pa.int64()),
                         "b": pa.array(np.concatenate(b_parts), pa.int64())})

    return ds.map_batches(emit, batch_format="pyarrow")


def _wedge_core_np(u: np.ndarray, rv: np.ndarray, vid: np.ndarray,
                   n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rank-ordered per-source neighbor pairs via pure index arithmetic
    over (u, rv, v) arrays SORTED by (u, rv); returns (closing-key =
    v_i*n + v_j, center = u) candidate arrays — the degree-oriented
    wedge kernel shared by triangle_counts' bucketed and dense paths."""
    m = u.size
    if m == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    boundary = np.concatenate(([True], u[1:] != u[:-1]))
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, m))
    seg_id = np.cumsum(boundary) - 1
    local = np.arange(m) - starts[seg_id]
    counts = sizes[seg_id] - 1 - local
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ai = np.repeat(np.arange(m), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                        counts)
    bj = ai + 1 + offs
    return vid[ai] * n + vid[bj], u[ai]


def triangle_counts(edges_ds, n_nodes: int,
                    num_partitions: int | None = None,
                    broadcast_limit: int = 2_000_000,
                    wedge_driver_limit: int = 1 << 21) -> pa.Table:
    """Per-node triangle counts over an undirected edge Dataset — the
    degree-oriented node-iterator (Schank & Wagner 2005 / Cohen's
    MapReduce formulation): orient every edge from its lower
    (degree, id) endpoint, generate wedges at each source, close them
    with a hash join against the oriented edge set. Degree orientation
    bounds per-source out-degree by O(sqrt(m)), so wedge volume is
    O(m^1.5) worst case and per-node work is skew-proof — a raw a<b
    orientation would square the hubs.

    Dataflow: (1) exact edge dedup on the packed a*n+b key (one
    shuffle); (2) degrees via endpoint-count partials + groupby-Sum;
    (3) two hash joins attach endpoint degrees; (4) fat-bucket wedge
    generation — per-source neighbor pairs in rank order via pure index
    arithmetic, no per-source Python loop; (5) inner hash join of wedge
    candidates against oriented edge keys closes triangles; (6) 3
    count-partial rows per triangle -> groupby-Sum. Input ``edges_ds``
    rows are (a, b) int64 with a != b in any order/multiplicity.

    When the degree table fits under ``broadcast_limit`` rows it is
    broadcast once (ray.put) and read as a dense gather inside the
    orient pass — two hash joins disappear (measured: each join spawn
    costs ~1 s of fixed aggregator-actor time at small scale). The same
    guard (on the deduped edge count) broadcasts the sorted oriented
    edge-key array so wedges close in-map with searchsorted — the
    O(m^1.5) candidate shuffle + closing hash join never run, and each
    bucket emits per-node count partials directly. Above the limit both
    join paths run unchanged; pass 0 to force them.

    Returns (doc_id, n_tri) for nodes in >= 1 triangle, sorted."""
    import ray
    from ray.data.aggregate import Sum

    from .text_analysis import _mix64_np
    from .window import _default_buckets

    n = n_nodes
    if n >= 1 << 31:
        # lo*n+hi packing needs n^2 < 2^63 and (deg<<32)|id needs dense
        # ids < 2^32; past that, switch the packed keys to two columns
        raise ValueError(f"n_nodes={n} exceeds the 2^31 packing bound")
    from ..util import join_parts

    n_parts = num_partitions or join_parts()

    nb = _default_buckets()

    def pack(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        e = np.unique(lo * n + hi)  # per-batch pre-dedup
        kb = (_mix64_np(e.view(np.uint64)) % np.uint64(nb)
              ).astype(np.int64)
        return pa.table({"e": pa.array(e, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    empty_out = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tri": pa.array([], pa.int64())})

    if n <= broadcast_limit:
        # ---- dense driver-fold fast path (node count under the guard,
        # so the distinct edge / degree arrays are node-bounded driver
        # state — the kcore/hits dense-gather duality): edge distinct,
        # degrees, orientation and the closing-key sort fold on the
        # driver in numpy; the O(m^1.5) wedge generation — the only
        # real compute — distributes over contiguous source ranges
        # balanced by per-source wedge volume, closing in-map against
        # the broadcast sorted oriented keys. ZERO shuffles; the
        # bucketed paths below pay 3-4 groupby rounds of fixed actor
        # cost, which dominates wall time on small-to-medium graphs.
        import ray as _ray
        import ray.data as rd

        from .dedup import _cached_get

        parts = []
        for bt in edges_ds.map_batches(pack, batch_format="pyarrow") \
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            parts.append(np.asarray(bt.column("e"), dtype=np.int64))
        if not parts:
            return empty_out
        e = np.unique(np.concatenate(parts))
        if e.size == 0:
            return empty_out
        a, b = e // n, e % n
        deg_np = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
        ra, rb = (deg_np[a] << 32) | a, (deg_np[b] << 32) | b
        a_first = ra < rb
        u = np.where(a_first, a, b)
        vid = np.where(a_first, b, a)
        rv = np.where(a_first, rb, ra)
        order = np.lexsort((rv, u))
        u, vid, rv = u[order], vid[order], rv[order]
        ekeys = np.sort(u * n + vid)
        seg_starts = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        sizes = np.diff(np.append(seg_starts, u.size))
        wvol = sizes * (sizes - 1) // 2
        cw = np.cumsum(wvol)
        total_w = int(cw[-1]) if cw.size else 0
        if total_w == 0:
            return empty_out
        if total_w <= wedge_driver_limit:
            # tiny wedge volume: closing is microseconds of numpy, and
            # a second Dataset execution costs >1 s of fixed scheduler
            # time — fold it here (same guard family as the dense path
            # itself; the distributed generation below is the scale
            # shape and is exercised by the guard-crossing test)
            c, ctr = _wedge_core_np(u, rv, vid, n)
            idx = np.minimum(np.searchsorted(ekeys, c), ekeys.size - 1)
            hit = ekeys[idx] == c
            c, ctr = c[hit], ctr[hit]
            if c.size == 0:
                return empty_out
            tri = np.bincount(
                np.concatenate([c // n, c % n, ctr]), minlength=n)
            ids = np.flatnonzero(tri).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_tri": pa.array(tri[ids].astype(np.int64), pa.int64())})
        n_tasks = max(1, min(64, int(
            ray.cluster_resources().get("CPU", 8)) * 2))
        targets = (np.arange(1, n_tasks) * total_w) // n_tasks
        seg_cuts = np.minimum(
            np.searchsorted(cw, targets, side="left") + 1, sizes.size)
        seg_bounds = np.unique(np.concatenate(
            ([0], seg_cuts, [sizes.size])))
        row_bounds = np.append(seg_starts[seg_bounds[:-1]], u.size)
        ref = _ray.put((u, rv, vid, ekeys, row_bounds))

        def gen(batch: pa.Table) -> pa.Table:
            u_, rv_, vid_, keys, rb_ = _cached_get(ref)
            outs_n, outs_c = [], []
            for bi in np.asarray(batch.column("id"), dtype=np.int64):
                s, t = int(rb_[bi]), int(rb_[bi + 1])
                c, ctr = _wedge_core_np(u_[s:t], rv_[s:t], vid_[s:t], n)
                if c.size == 0:
                    continue
                idx = np.minimum(np.searchsorted(keys, c), keys.size - 1)
                hit = keys[idx] == c
                c, ctr = c[hit], ctr[hit]
                if c.size == 0:
                    continue
                nodes = np.concatenate([c // n, c % n, ctr])
                un, cnt = np.unique(nodes, return_counts=True)
                outs_n.append(un)
                outs_c.append(cnt.astype(np.int64))
            if not outs_n:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({
                "node": pa.array(np.concatenate(outs_n), pa.int64()),
                "cnt": pa.array(np.concatenate(outs_c), pa.int64())})

        tri = np.zeros(n, dtype=np.int64)
        for bt in rd.range(row_bounds.size - 1) \
                .map_batches(gen, batch_format="pyarrow") \
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            np.add.at(tri, np.asarray(bt.column("node"), dtype=np.int64),
                      np.asarray(bt.column("cnt"), dtype=np.int64))
        ids = np.flatnonzero(tri).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tri": pa.array(tri[ids], pa.int64())})

    def uniq_bucket(df):
        import pandas as pd

        return pd.DataFrame({"e": np.unique(df["e"].to_numpy(np.int64))})

    # (1) exact dedup inside mix64 fat buckets (every copy of an edge
    # key lands in one bucket) — measurably cheaper than a natural-key
    # groupby-aggregate over the edge set (the repo-wide rebucket rule)
    edges = (edges_ds.map_batches(pack, batch_format="pyarrow")
             .groupby("_kb").map_groups(uniq_bucket,
                                        batch_format="pandas")
             .materialize())
    n_edges = edges.count()
    if n_edges == 0:  # wedge map_groups would lose its schema
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tri": pa.array([], pa.int64())})

    # (2) degrees: endpoint count partials -> one groupby-Sum
    def deg_partial(batch: pa.Table) -> pa.Table:
        e = np.asarray(batch.column("e"), dtype=np.int64)
        nodes = np.concatenate([e // n, e % n])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64))})

    deg = (edges.map_batches(deg_partial, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("deg", alias_name="deg"))
           .materialize())

    def _orient_arrays(e, da, db):
        a, b = e // n, e % n
        ra, rb = (da << 32) | a, (db << 32) | b  # ids dense < 2^32
        a_first = ra < rb
        u = np.where(a_first, a, b)
        v = np.where(a_first, b, a)
        rv = np.where(a_first, rb, ra)
        kb = (_mix64_np(u.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "rv": pa.array(rv, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    if deg.count() <= broadcast_limit:
        # (3a) degrees broadcast once; orient straight off the edge rows
        dd = deg.to_pandas()
        deg_np = np.zeros(n, dtype=np.int64)
        deg_np[dd["node"].to_numpy(np.int64)] = dd["deg"].to_numpy(np.int64)
        deg_ref = ray.put(deg_np)

        from .dedup import _cached_get

        def orient_bcast(batch: pa.Table) -> pa.Table:
            dnp = _cached_get(deg_ref)
            e = np.asarray(batch.column("e"), dtype=np.int64)
            return _orient_arrays(e, dnp[e // n], dnp[e % n])

        oriented = edges.map_batches(orient_bcast, batch_format="pyarrow"
                                     ).materialize()
    else:
        # (3b) attach endpoint degrees with two hash joins
        def unpack_a(batch: pa.Table) -> pa.Table:
            e = np.asarray(batch.column("e"), dtype=np.int64)
            return pa.table({"e": batch.column("e"),
                             "node": pa.array(e // n, pa.int64())})

        with_a = edges.map_batches(unpack_a, batch_format="pyarrow").join(
            deg, "inner", n_parts, on=("node",))

        def key_b(batch: pa.Table) -> pa.Table:
            e = np.asarray(batch.column("e"), dtype=np.int64)
            return pa.table({"e": batch.column("e"),
                             "deg_a": batch.column("deg"),
                             "node": pa.array(e % n, pa.int64())})

        with_ab = with_a.map_batches(key_b, batch_format="pyarrow").join(
            deg, "inner", n_parts, on=("node",))

        def orient(batch: pa.Table) -> pa.Table:
            e = np.asarray(batch.column("e"), dtype=np.int64)
            da = np.asarray(batch.column("deg_a"), dtype=np.int64)
            db = np.asarray(batch.column("deg"), dtype=np.int64)
            return _orient_arrays(e, da, db)

        oriented = with_ab.map_batches(orient, batch_format="pyarrow"
                                       ).materialize()

    def _wedge_arrays(df):
        """Per-source candidate (closing-key, center) arrays from one
        oriented fat bucket."""
        u = df["u"].to_numpy(np.int64)
        if u.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        rv = df["rv"].to_numpy(np.int64)
        vid = df["v"].to_numpy(np.int64)
        order = np.lexsort((rv, u))
        return _wedge_core_np(u[order], rv[order], vid[order], n)

    def edge_keys(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("u"), dtype=np.int64)
        v = np.asarray(batch.column("v"), dtype=np.int64)
        return pa.table({"c": pa.array(u * n + v, pa.int64())})

    if n_edges <= broadcast_limit:
        # (5a) broadcast closing: the deduped oriented edge-key set fits
        # under the guard (it IS the deduped edge set), so ship it once
        # as a sorted array and close wedges in-map with searchsorted —
        # the candidate shuffle + hash join (the O(m^1.5) wedge volume
        # moving through the object store) never happens. Each bucket
        # emits per-node count PARTIALS directly.
        from .dedup import _cached_get

        ekeys = np.sort(oriented.map_batches(
            edge_keys, batch_format="pyarrow")
            .to_pandas()["c"].to_numpy(np.int64))
        ekeys_ref = ray.put(ekeys)

        def wedges_close(df):
            import pandas as pd

            c, ctr = _wedge_arrays(df)
            if c.size:
                keys = _cached_get(ekeys_ref)
                idx = np.minimum(np.searchsorted(keys, c),
                                 keys.size - 1)
                hit = keys[idx] == c
                c, ctr = c[hit], ctr[hit]
            if c.size == 0:
                return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                     "n_tri": np.empty(0, np.int64)})
            nodes = np.concatenate([c // n, c % n, ctr])
            un, cnt = np.unique(nodes, return_counts=True)
            return pd.DataFrame({"doc_id": un,
                                 "n_tri": cnt.astype(np.int64)})

        partials = oriented.groupby("_kb").map_groups(
            wedges_close, batch_format="pandas").materialize()
        if partials.count() == 0:  # all-empty map_groups drops schema
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tri": pa.array([], pa.int64())})
        out = (partials.groupby("doc_id")
               .aggregate(Sum("n_tri", alias_name="n_tri")).to_pandas())
    else:
        def wedges(df: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd

            c, ctr = _wedge_arrays(df)
            return pd.DataFrame({"c": c, "ctr": ctr})

        cands = oriented.groupby("_kb").map_groups(
            wedges, batch_format="pandas").materialize()
        if cands.count() == 0:  # all-empty map_groups drops the schema
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tri": pa.array([], pa.int64())})

        closing = oriented.map_batches(edge_keys, batch_format="pyarrow")
        tris = cands.join(closing, "inner", n_parts, on=("c",))

        # (6) per-node count partials; each triangle contributes 3 nodes
        def node_partial(batch: pa.Table) -> pa.Table:
            c = np.asarray(batch.column("c"), dtype=np.int64)
            ctr = np.asarray(batch.column("ctr"), dtype=np.int64)
            nodes = np.concatenate([c // n, c % n, ctr])
            un, cnt = np.unique(nodes, return_counts=True)
            return pa.table({"doc_id": pa.array(un, pa.int64()),
                             "n_tri": pa.array(cnt.astype(np.int64))})

        out = (tris.map_batches(node_partial, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Sum("n_tri", alias_name="n_tri"))
               .to_pandas())
    if len(out) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tri": pa.array([], pa.int64())})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["doc_id"].astype("int64"),
                                        pa.int64()),
                     "n_tri": pa.array(out["n_tri"].astype("int64"),
                                       pa.int64())})


def common_neighbor_pairs(edges_ds, n_nodes: int, adjacent_fn,
                          min_common: int = 2,
                          n_buckets: int | None = None,
                          max_degree: int | None = None,
                          ra_scale: int | None = None) -> pa.Table:
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003's
    baseline score): for every NON-adjacent pair with >= ``min_common``
    shared neighbors, the shared-neighbor count. Candidate edges for a
    growing graph, ranked by n_common.

    Dataflow: (1) exact edge dedup in fat hash buckets; (2) both-direction
    (center, neighbor) rows bucket by center, so each bucket holds every
    center's full neighbor list — per-center sorted pairs expand with
    index arithmetic (no per-center Python) and collapse to in-bucket
    pair-count PARTIALS; (3) partials rebucket by pair key and sum with a
    reduceat kernel (the repo-wide natural-key-groupby avoidance rule);
    (4) adjacency is a map-side RULE predicate (``adjacent_fn(a, b) ->
    bool mask``) — rule-derivable graphs need no anti-join shuffle.
    Per-center expansion is O(deg^2): pass ``max_degree`` to drop hub
    centers (logged), the standard wedge cap; None keeps it exact.

    ``ra_scale`` adds the resource-allocation index (Zhou et al. 2009)
    as integer fixed-point: each wedge at center z contributes
    ``ra_scale // deg(z)`` (deg = the center's neighbor-list length in
    its bucket — the true degree when no cap is set), summed per pair
    into an ``ra`` column. Rare shared neighbors count more than hubs."""
    import logging

    import pandas as pd

    from .text_analysis import _mix64_np
    from .window import _default_buckets

    n = n_nodes
    if n >= 1 << 31:
        raise ValueError(f"n_nodes={n} exceeds the 2^31 packing bound")
    nb = n_buckets or _default_buckets()

    def pack(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # drop self-loops: a (v, v) row would duplicate v's center rows
        # in both_dirs and inflate every pair count at that center
        keep = lo != hi
        e = np.unique(lo[keep] * n + hi[keep])
        kb = (_mix64_np(e.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table({"e": pa.array(e, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def uniq_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"e": np.unique(df["e"].to_numpy(np.int64))})

    edges = (edges_ds.map_batches(pack, batch_format="pyarrow")
             .groupby("_kb").map_groups(uniq_bucket, batch_format="pandas")
             .materialize())
    empty_cols = {"a": pa.array([], pa.int64()),
                  "b": pa.array([], pa.int64()),
                  "n_common": pa.array([], pa.int64())}
    if ra_scale is not None:
        empty_cols["ra"] = pa.array([], pa.int64())
    empty = pa.table(empty_cols)
    if edges.count() == 0:
        return empty

    def both_dirs(batch: pa.Table) -> pa.Table:
        e = np.asarray(batch.column("e"), dtype=np.int64)
        ctr = np.concatenate([e // n, e % n])
        nbr = np.concatenate([e % n, e // n])
        kb = (_mix64_np(ctr.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table({"ctr": pa.array(ctr, pa.int64()),
                         "nbr": pa.array(nbr, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def _empty_partial() -> pd.DataFrame:
        out = {"p": np.empty(0, np.int64), "c": np.empty(0, np.int64)}
        if ra_scale is not None:
            out["w"] = np.empty(0, np.int64)
        return pd.DataFrame(out)

    def wedge_partials(df: pd.DataFrame) -> pd.DataFrame:
        ctr = df["ctr"].to_numpy(np.int64)
        nbr = df["nbr"].to_numpy(np.int64)
        if ctr.size == 0:
            return _empty_partial()
        order = np.lexsort((nbr, ctr))
        ctr, nbr = ctr[order], nbr[order]
        boundary = np.concatenate(([True], ctr[1:] != ctr[:-1]))
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, ctr.size))
        if max_degree is not None and np.any(sizes > max_degree):
            logging.getLogger(__name__).warning(
                "common_neighbor_pairs: %d hub centers over max_degree=%d "
                "dropped", int((sizes > max_degree).sum()), max_degree)
            keep = np.repeat(sizes <= max_degree, sizes)
            ctr, nbr = ctr[keep], nbr[keep]
            boundary = np.concatenate(([True], ctr[1:] != ctr[:-1]))
            starts = np.flatnonzero(boundary)
            sizes = np.diff(np.append(starts, ctr.size))
        if ctr.size == 0:
            return _empty_partial()
        seg_id = np.cumsum(boundary) - 1
        local = np.arange(ctr.size) - starts[seg_id]
        counts = sizes[seg_id] - 1 - local
        total = int(counts.sum())
        if total == 0:
            return _empty_partial()
        ai = np.repeat(np.arange(ctr.size), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                            counts)
        bj = ai + 1 + offs
        # neighbors sorted ascending inside the segment -> nbr[ai] < nbr[bj]
        p = nbr[ai] * n + nbr[bj]
        up, inv, cnt = np.unique(p, return_inverse=True,
                                 return_counts=True)
        out = {"p": up, "c": cnt.astype(np.int64)}
        if ra_scale is not None:
            w = ra_scale // sizes[seg_id[ai]]  # deg of the wedge CENTER
            ws = np.zeros(up.size, dtype=np.int64)
            np.add.at(ws, inv, w)
            out["w"] = ws
        return pd.DataFrame(out)

    def rebucket(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch.column("p"), dtype=np.int64)
        pb = (_mix64_np(p.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return batch.append_column("_pb", pa.array(pb, pa.int64()))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        p = df["p"].to_numpy(np.int64)
        c = df["c"].to_numpy(np.int64)
        order = np.argsort(p, kind="stable")
        p, c = p[order], c[order]
        start = np.concatenate(([True], p[1:] != p[:-1]))
        idx = np.flatnonzero(start)
        up = p[idx]
        total = np.add.reduceat(c, idx).astype(np.int64)
        a, b = up // n, up % n
        keep = (total >= min_common) & ~np.asarray(adjacent_fn(a, b),
                                                   dtype=bool)
        out = {"a": a[keep], "b": b[keep], "n_common": total[keep]}
        if ra_scale is not None:
            w = df["w"].to_numpy(np.int64)[order]
            out["ra"] = np.add.reduceat(w, idx).astype(np.int64)[keep]
        return pd.DataFrame(out)

    out = (edges.map_batches(both_dirs, batch_format="pyarrow")
           .groupby("_kb").map_groups(wedge_partials, batch_format="pandas")
           .map_batches(rebucket, batch_format="pyarrow")
           .groupby("_pb").map_groups(finish, batch_format="pandas")
           .to_pandas())
    if len(out) == 0:
        return empty
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    cols = {"a": pa.array(out["a"].astype("int64"), pa.int64()),
            "b": pa.array(out["b"].astype("int64"), pa.int64()),
            "n_common": pa.array(out["n_common"].astype("int64"),
                                 pa.int64())}
    if ra_scale is not None:
        cols["ra"] = pa.array(out["ra"].astype("int64"), pa.int64())
    return pa.table(cols)


def hits_int(n_nodes: int, iters: int = 4,
             scale: int = 10 ** 9,
             num_partitions: int | None = None,
             broadcast_limit: int = 10_000_000,
             driver_limit: int = 1 << 22) -> pa.Table:
    """Integer fixed-point HITS (Kleinberg hubs & authorities) over the
    synthetic site graph — the OTHER classic link-analysis score next to
    pagerank_int, and the one that needs BOTH gather directions.

    Exact arithmetic contract: scores are int64 scaled to ``scale``;
    each half-iteration gathers neighbor scores (authority(v) = sum of
    in-neighbor hubs, hub(u) = sum of out-neighbor authorities) and
    sum-normalizes back to ``scale`` with the overflow-free decomposition
    ``s*scale//A == (s//A)*scale + ((s%A)*scale)//A`` (A = global sum
    <= out_deg_max*scale, so every intermediate fits int64; the DuckDB
    oracle uses one HUGEINT cast instead). Identical edge multiset as
    _pagerank_sql (duplicate chord/child arms stay duplicated).

    Scale shape (broadcast/join duality, the cooccurrence_pmi guard):
    when ``n_nodes <= broadcast_limit`` the per-iteration score vector —
    node-bounded, the same size as this function's own OUTPUT — rides as
    a broadcast dense array and each half-iteration is ONE shuffle-free
    map over the edge table (per-block bincount partials, driver folds
    O(n) ints; 8 Ray joins of a tiny table measured ~29 s of pure
    actor-spawn fixed cost, the dense path ~4 s). Above the limit, the
    canonical edge-partitioned gather: the edge table materializes ONCE
    and each half-iteration is one vertex-id hash join + one
    groupby-Sum; zero-score vertices drop out mid-iteration (they
    contribute nothing) and re-attach as zeros in the final assembly.
    Hot vertices skew the join the usual way; the synthetic graph's
    in/out degrees are <= ~5. Both paths are pinned equal in pytest."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..util import join_parts

    # 2*iters joins of a 3n-row edge table: at small n the join
    # aggregator-actor spawn IS the wall time, so shrink the fan-in
    n_parts = num_partitions or (2 if n_nodes < 100_000
                                 else join_parts())

    if n_nodes <= driver_limit:
        # full driver fold (the pagerank_int dense duality): the edge
        # table is formula-derived and node-bounded, so all 2*iters
        # gathers are np.add.at passes — zero Dataset executions (the
        # broadcast path below still pays one map per half-iteration)
        i = np.arange(n_nodes, dtype=np.int64)
        srcs, dsts = [], []
        for child in (2 * i + 1, 2 * i + 2):
            m = child < n_nodes
            srcs.append(i[m]); dsts.append(child[m])
        m = i % 3 == 0
        srcs.append(i[m]); dsts.append((7 * i[m] + 3) % n_nodes)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)

        def _vn(s: np.ndarray, total: int) -> np.ndarray:
            q, rem = s // total, s % total
            return q * scale + (rem * scale) // total

        def _zero() -> pa.Table:
            z = np.zeros(n_nodes, dtype=np.int64)
            return pa.table({"doc_id": pa.array(i, pa.int64()),
                             "hub_scaled": pa.array(z, pa.int64()),
                             "auth_scaled": pa.array(z, pa.int64())})

        h_vec = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
        a_vec = np.zeros(n_nodes, dtype=np.int64)
        for _ in range(iters):
            ar = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(ar, dst, h_vec[src])
            total = int(ar.sum())
            if total == 0:
                return _zero()
            a_vec = _vn(ar, total)
            hr = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(hr, src, a_vec[dst])
            total = int(hr.sum())
            if total == 0:
                return _zero()
            h_vec = _vn(hr, total)
        return pa.table({"doc_id": pa.array(i, pa.int64()),
                         "hub_scaled": pa.array(h_vec, pa.int64()),
                         "auth_scaled": pa.array(a_vec, pa.int64())})

    def emit_edges(batch: pa.Table) -> pa.Table:
        i = np.asarray(batch.column("id"), dtype=np.int64)
        srcs, dsts = [], []
        for child in (2 * i + 1, 2 * i + 2):
            m = child < n_nodes
            srcs.append(i[m]); dsts.append(child[m])
        m = i % 3 == 0
        srcs.append(i[m]); dsts.append((7 * i[m] + 3) % n_nodes)
        return pa.table({"src": pa.array(np.concatenate(srcs), pa.int64()),
                         "dst": pa.array(np.concatenate(dsts), pa.int64())})

    edges = (rd.range(n_nodes).map_batches(emit_edges,
                                           batch_format="pyarrow")
             .materialize())

    def empty_scores() -> pa.Table:
        ids = np.arange(n_nodes, dtype=np.int64)
        z = np.zeros(n_nodes, dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "hub_scaled": pa.array(z, pa.int64()),
                         "auth_scaled": pa.array(z, pa.int64())})

    if n_nodes <= broadcast_limit:
        import ray as _ray

        from .dedup import _cached_get

        def vec_norm(s: np.ndarray, total: int) -> np.ndarray:
            q, rem = s // total, s % total
            return q * scale + (rem * scale) // total

        def fold_gather(score_vec: np.ndarray, from_col: str,
                        to_col: str) -> np.ndarray:
            ref = _ray.put(score_vec)

            def gather(batch: pa.Table) -> pa.Table:
                sv = _cached_get(ref)
                f = np.asarray(batch.column(from_col), dtype=np.int64)
                t = np.asarray(batch.column(to_col), dtype=np.int64)
                acc = np.zeros(n_nodes, dtype=np.int64)
                np.add.at(acc, t, sv[f])  # int64-exact, no float weights
                nz = np.flatnonzero(acc)
                return pa.table({"node": pa.array(nz, pa.int64()),
                                 "c": pa.array(acc[nz], pa.int64())})

            out = np.zeros(n_nodes, dtype=np.int64)
            for b in edges.map_batches(gather, batch_format="pyarrow") \
                    .iter_batches(batch_size=1 << 20,
                                  batch_format="pyarrow"):
                np.add.at(out, np.asarray(b.column("node"),
                                          dtype=np.int64),
                          np.asarray(b.column("c"), dtype=np.int64))
            return out

        h_vec = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
        a_vec = np.zeros(n_nodes, dtype=np.int64)
        for _ in range(iters):
            ar = fold_gather(h_vec, "src", "dst")
            total = int(ar.sum())
            if total == 0:
                return empty_scores()
            a_vec = vec_norm(ar, total)
            hr = fold_gather(a_vec, "dst", "src")
            total = int(hr.sum())
            if total == 0:
                return empty_scores()
            h_vec = vec_norm(hr, total)
        ids = np.arange(n_nodes, dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "hub_scaled": pa.array(h_vec, pa.int64()),
                         "auth_scaled": pa.array(a_vec, pa.int64())})

    def normalize(total: int, in_col: str, out_name: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            s = np.asarray(batch.column(in_col), dtype=np.int64)
            q, rem = s // total, s % total
            v = q * scale + (rem * scale) // total
            return pa.table({key: batch.column(key),
                             out_name: pa.array(v, pa.int64())})
        return fn

    # h0: every node starts at scale // n (the SQL oracle's h0)
    h = rd.range(n_nodes).map_batches(
        lambda b: pa.table({
            "src": pa.array(np.asarray(b.column("id"), dtype=np.int64),
                            pa.int64()),
            "h": pa.array(np.full(len(b), scale // n_nodes, np.int64),
                          pa.int64())}),
        batch_format="pyarrow")
    a = None
    for _ in range(iters):
        # materialize BEFORE the scalar sum: ar/hr are lazy, and an
        # unmaterialized sum() + normalize() would run the join+groupby
        # lineage twice per half-iteration
        ar = (edges.join(h, "inner", n_parts, on=("src",))
              .groupby("dst").aggregate(Sum("h", alias_name="s"))
              .materialize())
        total = ar.sum("s")
        if not total:
            return empty_scores()
        a = ar.map_batches(normalize(int(total), "s", "a", "dst"),
                           batch_format="pyarrow").materialize()
        hr = (edges.join(a, "inner", n_parts, on=("dst",))
              .groupby("src").aggregate(Sum("a", alias_name="s"))
              .materialize())
        total = hr.sum("s")
        if not total:
            return empty_scores()
        h = hr.map_batches(normalize(int(total), "s", "h", "src"),
                           batch_format="pyarrow").materialize()

    hub = h.to_pandas().set_index("src")["h"]
    auth = a.to_pandas().set_index("dst")["a"]
    ids = np.arange(n_nodes, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "hub_scaled": pa.array(
            hub.reindex(ids, fill_value=0).to_numpy(np.int64), pa.int64()),
        "auth_scaled": pa.array(
            auth.reindex(ids, fill_value=0).to_numpy(np.int64), pa.int64()),
    })


def _kcore_join(n_nodes: int, k: int, rounds: int,
                num_partitions: int | None = None) -> pa.Table:
    """kcore_rounds above ``broadcast_limit``: the hits_int edge-join
    gather shape. The edge table is distinct-ed ONCE distributedly
    (per-block np.unique partials on packed a*n+b, then one groupby —
    never a driver-side concat); each round keeps both-endpoints-active
    edges via two vertex-id hash semi-joins against the (node-bounded)
    active set, pre-aggregates degree partials per block, and one
    groupby-Sum yields the round's degree table. The active set stays a
    Dataset between rounds. Round 1 skips the semi-joins (everyone is
    active). Requires ``k >= 1`` (with k<=0 the dense path keeps
    zero-degree nodes, which never appear in an edge-derived degree
    table). Output == dense path: post-round active nodes with their
    last-round in-core degree, ascending doc_id."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..util import join_parts

    if k < 1:
        raise ValueError("_kcore_join needs k >= 1 (zero-degree nodes "
                         "are invisible to the edge-derived degree "
                         "table; the dense path keeps them when k<=0)")
    n_parts = num_partitions or join_parts()

    def to_doc_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("id").cast(pa.int64())})

    raw = site_edges(rd.range(n_nodes).map_batches(
        to_doc_ids, batch_format="pyarrow"), n_nodes)

    # global edge distinct, distributed: pack (a,b) -> a*n+b (fits
    # int64 for n_nodes < ~3e9), block-local unique partial, one
    # groupby-Sum dedup shuffle keyed on the packed id
    def pack(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        p = np.unique(a * n_nodes
                      + np.asarray(batch.column("b"), dtype=np.int64))
        return pa.table({"p": pa.array(p, pa.int64()),
                         "one": pa.array(np.ones(p.size, np.int64),
                                         pa.int64())})

    def unpack(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch.column("p"), dtype=np.int64)
        return pa.table({"a": pa.array(p // n_nodes, pa.int64()),
                         "b": pa.array(p % n_nodes, pa.int64())})

    edges = (raw.map_batches(pack, batch_format="pyarrow")
             .groupby("p").aggregate(Sum("one", alias_name="c"))
             .map_batches(unpack, batch_format="pyarrow")
             .materialize())

    def partial_deg(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            np.asarray(batch.column("a"), dtype=np.int64),
            np.asarray(batch.column("b"), dtype=np.int64)])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "d": pa.array(c.astype(np.int64), pa.int64())})

    def to_active(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("d"), dtype=np.int64)
        m = d >= k
        return pa.table({"a": pa.array(
            np.asarray(batch.column("node"), dtype=np.int64)[m],
            pa.int64())})

    active = None  # None == all nodes (round-1 semi-joins are no-ops)
    deg = None
    for _ in range(rounds):
        e = edges
        if active is not None:
            e = e.join(active, "inner", n_parts, on=("a",))
            act_b = active.map_batches(
                lambda t: pa.table({"b": t.column("a")}),
                batch_format="pyarrow")
            e = e.join(act_b, "inner", n_parts, on=("b",))
        deg = (e.map_batches(partial_deg, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("d", alias_name="d"))
               .materialize())
        active = deg.map_batches(to_active,
                                 batch_format="pyarrow").materialize()

    parts = [pa.table({"doc_id": b.column("node"), "deg": b.column("d")})
             for b in deg.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow")]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})
    out = pa.concat_tables(parts) if parts else empty
    m = pc.greater_equal(out.column("deg"), pa.scalar(k, pa.int64()))
    return out.filter(m).sort_by("doc_id")


def kcore_rounds(n_nodes: int, k: int = 3, rounds: int = 4,
                 broadcast_limit: int = 10_000_000) -> pa.Table:
    """Fixed-round k-core peeling over the undirected site graph
    (site_edges rule): each round computes degrees among ACTIVE nodes
    (an edge counts only when both endpoints are active) and drops
    nodes with degree < k. ``rounds`` is FIXED — not run-to-fixpoint —
    so the SQL unroll and this dataflow are bit-identical whether or
    not the peel has converged. Returns the post-round active nodes
    with their in-core degree.

    Scale shape: the active set is node-bounded (the same size as the
    output), so under ``broadcast_limit`` it rides as a broadcast bool
    mask and each round is ONE shuffle-free map over the materialized
    edge table (per-block degree bincount partials, driver folds O(n)
    ints — the hits_int dense-gather duality). Above the limit each
    round is the canonical distributed shape (hits_int's edge-join
    gather): two vertex-id hash semi-joins keep only both-endpoints-
    active edges, per-block bincount partials pre-aggregate, and one
    groupby-Sum yields the degree table; the next round's active set IS
    that table filtered to ``d >= k`` (never driver-materialized). Both
    paths are pinned equal in pytest across the guard."""
    import ray as _ray
    import ray.data as rd

    from .dedup import _cached_get

    if rounds < 1:
        # _kcore_sql(k, 0) would reference a non-existent d0 CTE; pin
        # the shared contract instead of diverging on it
        raise ValueError("kcore_rounds needs rounds >= 1")
    if n_nodes > broadcast_limit:
        return _kcore_join(n_nodes, k, rounds)

    def to_doc_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("id").cast(pa.int64())})

    # the ONE site-graph rule lives in site_edges — do not re-derive it
    edges = site_edges(rd.range(n_nodes).map_batches(
        to_doc_ids, batch_format="pyarrow"), n_nodes).materialize()
    # block-level arms are not globally distinct (chord arms can
    # duplicate tree edges across blocks) — fold ONE global dedup
    packed_parts = []
    for bt in edges.iter_batches(batch_size=1 << 20,
                                 batch_format="pyarrow"):
        packed_parts.append(
            np.asarray(bt.column("a"), dtype=np.int64) * n_nodes
            + np.asarray(bt.column("b"), dtype=np.int64))
    packed = (np.unique(np.concatenate(packed_parts)) if packed_parts
              else np.zeros(0, dtype=np.int64))
    edges = rd.from_arrow(pa.table({
        "a": pa.array(packed // n_nodes, pa.int64()),
        "b": pa.array(packed % n_nodes, pa.int64())})).materialize()

    active = np.ones(n_nodes, dtype=bool)
    for _ in range(rounds):
        ref = _ray.put(active)

        def degrees(batch: pa.Table) -> pa.Table:
            act = _cached_get(ref)
            a = np.asarray(batch.column("a"), dtype=np.int64)
            b = np.asarray(batch.column("b"), dtype=np.int64)
            m = act[a] & act[b]
            d = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(d, a[m], 1)
            np.add.at(d, b[m], 1)
            nz = np.flatnonzero(d)
            return pa.table({"node": pa.array(nz, pa.int64()),
                             "d": pa.array(d[nz], pa.int64())})

        deg = np.zeros(n_nodes, dtype=np.int64)
        for bt in edges.map_batches(degrees, batch_format="pyarrow") \
                .iter_batches(batch_size=1 << 20,
                              batch_format="pyarrow"):
            np.add.at(deg, np.asarray(bt.column("node"), dtype=np.int64),
                      np.asarray(bt.column("d"), dtype=np.int64))
        active = active & (deg >= k)

    ids = np.flatnonzero(active).astype(np.int64)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "deg": pa.array(deg[ids], pa.int64())})


def ppr_int(n_nodes: int, seed_mod: int = 50, iters: int = 8,
            scale: int = 10 ** 12,
            broadcast_limit: int = 10_000_000) -> pa.Table:
    """Personalized (topic-sensitive) PageRank: teleport mass
    concentrates on the SEED set (nodes with ``doc_id % seed_mod == 0``)
    instead of spreading uniformly — the crawl-prioritization variant
    (score pages by proximity to the seeds you care about). Same exact
    integer recurrence as pagerank_int with the base term gated on seed
    membership:

        r'(v) = (15 * (scale // n_seeds) * [v in S] + 85 * s(v)) // 100

    One formula-edge map + one groupby-Sum per iteration, no joins;
    bit-replayable in the unrolled-CTE oracle. Under ``broadcast_limit``
    nodes the whole iteration is a dense numpy fold on the driver (the
    pagerank_int dense duality — the score vector is output-sized);
    both paths pinned equal in pytest."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    n_seeds = max(1, (n_nodes + seed_mod - 1) // seed_mod)
    seed0 = scale // n_seeds

    if n_nodes <= broadcast_limit:
        node = np.arange(n_nodes, dtype=np.int64)
        deg = synthetic_degrees(node, n_nodes)
        c1 = 2 * node + 1
        m1 = c1 < n_nodes
        c2 = 2 * node + 2
        m2 = c2 < n_nodes
        m3 = node % 3 == 0
        ch = (7 * node[m3] + 3) % n_nodes
        is_seed = node % seed_mod == 0
        base = np.where(is_seed, 15 * seed0, 0).astype(np.int64)
        r = np.where(is_seed, seed0, 0).astype(np.int64)
        for _ in range(iters):
            cvals = np.where(deg > 0, r // np.maximum(deg, 1), 0)
            s = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(s, c1[m1], cvals[m1])
            np.add.at(s, c2[m2], cvals[m2])
            np.add.at(s, ch, cvals[m3])
            r = (base + 85 * s) // 100
        return pa.table({"doc_id": pa.array(node, pa.int64()),
                         "rank_scaled": pa.array(r, pa.int64())})

    def emit(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch.column("node"), dtype=np.int64)
        r = np.asarray(batch.column("r"), dtype=np.int64)
        deg = synthetic_degrees(node, n_nodes)
        cvals = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        dsts = [node]  # presence rows keep every node in the table
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
        node = np.asarray(batch.column("node"), dtype=np.int64)
        s = np.asarray(batch.column("s"), dtype=np.int64)
        base = np.where(node % seed_mod == 0, 15 * seed0, 0)
        r = (base + 85 * s) // 100
        return pa.table({"node": pa.array(node, pa.int64()),
                         "r": pa.array(r, pa.int64())})

    ranks = rd.range(n_nodes).map_batches(
        lambda b: pa.table({
            "node": pa.array(np.asarray(b.column("id"), dtype=np.int64)),
            "r": pa.array(np.where(
                np.asarray(b.column("id"), dtype=np.int64)
                % seed_mod == 0, seed0, 0).astype(np.int64))}),
        batch_format="pyarrow")
    for _ in range(iters):
        sums = (ranks.map_batches(emit, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("c", alias_name="s")))
        ranks = sums.map_batches(update,
                                 batch_format="pyarrow").materialize()

    out = ranks.to_pandas().sort_values("node")
    return pa.table({"doc_id": pa.array(out["node"].to_numpy(), pa.int64()),
                     "rank_scaled": pa.array(out["r"].to_numpy(np.int64),
                                             pa.int64())})


def graph_walks(edges_ds, n_nodes: int, walk_len: int = 4,
                golden: int = 0x9E3779B97F4A7C15,
                broadcast_limit: int = 2_000_000) -> pa.Table:
    """Deterministic DeepWalk-style random walks (Perozzi et al. 2014
    corpus sampling) over the undirected ``site_edges`` graph: one walk
    of ``walk_len`` steps per node; at step t the walk at node u (seed
    s) moves to the sorted-unique neighbor with index
    ``mix64(u * GOLDEN + s * walk_len + t) % deg(u)`` — a hash-derived
    choice both engines replay exactly (no RNG state). Returns
    (doc_id, visits): how many times each node is visited across all
    walks at steps 1..walk_len (starts excluded).

    Scale shape: under ``broadcast_limit`` nodes the edge table is
    node-bounded (<= 4 edges/node on this graph), so adjacency (CSR:
    offsets + sorted-unique flat neighbors) and all walk steps fold
    densely on the driver — zero joins. Above it, adjacency builds with
    ONE groupby (sorted-unique neighbor index + degree riding each
    row); each step is one slim hash join of the walk frontier
    (O(#walks) rows) against adjacency — walk state never touches the
    driver. At 10^9 nodes the frontier is a constant-width Dataset per
    step; walk_len bounds the join count. Both paths pinned equal."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..util import join_parts
    from .text_analysis import _mix64_np

    import pandas as pd

    if n_nodes <= broadcast_limit:
        et = _gather(edges_ds)
        a = et.column("a").to_numpy(zero_copy_only=False)
        b = et.column("b").to_numpy(zero_copy_only=False)
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        order = np.lexsort((nbr, node))
        node, nbr = node[order], nbr[order]
        keep = np.concatenate(([True], (node[1:] != node[:-1])
                               | (nbr[1:] != nbr[:-1])))
        node, nbr = node[keep], nbr[keep]
        deg = np.bincount(node, minlength=n_nodes).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(deg)[:-1]))
        s = np.arange(n_nodes, dtype=np.int64)
        u = s.copy()
        alive = deg[u] > 0  # inner-join contract: no adjacency row drops
        visits = np.zeros(n_nodes, dtype=np.int64)
        for t in range(walk_len):
            su, uu = s[alive], u[alive]
            with np.errstate(over="ignore"):
                key = (uu.view(np.uint64) * np.uint64(golden)
                       + su.view(np.uint64) * np.uint64(walk_len)
                       + np.uint64(t))
            choice = (_mix64_np(key)
                      % deg[uu].view(np.uint64)).astype(np.int64)
            nxt = nbr[starts[uu] + choice]
            u = u.copy()
            u[alive] = nxt
            visits += np.bincount(nxt, minlength=n_nodes)
            alive = alive & (deg[u] > 0)
        nz = np.flatnonzero(visits)
        return pa.table({"doc_id": pa.array(nz, pa.int64()),
                         "visits": pa.array(visits[nz], pa.int64())})

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        return pa.table({"node": pa.array(np.concatenate([a, b]), pa.int64()),
                         "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def index_nbrs(group: pd.DataFrame) -> pd.DataFrame:
        node = int(group["node"].iloc[0])
        nbrs = np.unique(group["nbr"].to_numpy(dtype=np.int64))
        return pd.DataFrame({
            "node": np.full(nbrs.size, node, dtype=np.int64),
            "nbr": nbrs,
            "idx": np.arange(nbrs.size, dtype=np.int64),
            "deg": np.full(nbrs.size, nbrs.size, dtype=np.int64)})

    adj = (edges_ds.map_batches(both_dirs, batch_format="pyarrow")
           .groupby("node").map_groups(index_nbrs, batch_format="pandas")
           .materialize())
    n_parts = join_parts(8)

    walks = rd.range(n_nodes).map_batches(
        lambda b: pa.table({
            "s": pa.array(np.asarray(b.column("id"), dtype=np.int64)),
            "node": pa.array(np.asarray(b.column("id"), dtype=np.int64))}),
        batch_format="pyarrow")
    visit_parts = []
    for t in range(walk_len):
        def pick(batch: pa.Table, _t=t) -> pa.Table:
            s = np.asarray(batch.column("s"), dtype=np.int64)
            u = np.asarray(batch.column("node"), dtype=np.int64)
            idx = np.asarray(batch.column("idx"), dtype=np.int64)
            deg = np.asarray(batch.column("deg"), dtype=np.int64)
            nbr = np.asarray(batch.column("nbr"), dtype=np.int64)
            with np.errstate(over="ignore"):
                key = (u.view(np.uint64) * np.uint64(golden)
                       + s.view(np.uint64) * np.uint64(walk_len)
                       + np.uint64(_t))
            choice = (_mix64_np(key) % deg.view(np.uint64)).astype(np.int64)
            m = idx == choice
            return pa.table({"s": pa.array(s[m], pa.int64()),
                             "node": pa.array(nbr[m], pa.int64())})

        walks = (walks.join(adj, "inner", n_parts, on=("node",))
                 .map_batches(pick, batch_format="pyarrow")
                 .materialize())
        visit_parts.append(walks)

    def count_part(batch: pa.Table) -> pa.Table:
        node, cnt = np.unique(
            np.asarray(batch.column("node"), dtype=np.int64),
            return_counts=True)
        return pa.table({"doc_id": pa.array(node, pa.int64()),
                         "visits": pa.array(cnt.astype(np.int64))})

    allv = visit_parts[0]
    for vp in visit_parts[1:]:
        allv = allv.union(vp)
    out = (allv.map_batches(count_part, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Sum("visits", alias_name="visits"))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return pa.table({"doc_id": pa.array(out["doc_id"].astype("int64")),
                     "visits": pa.array(out["visits"].astype("int64"))})


def textrank_keywords(docs_ds, iters: int = 10, scale: int = 10 ** 12,
                      topk: int = 20) -> pa.Table:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004):
    integer PageRank over the word co-occurrence graph — an undirected
    edge for every pair of ADJACENT whitespace tokens (the window-2
    variant), ranks via the house fixed-point recurrence
    ``r' = (15 * (scale // n) + 85 * sum(r_src // deg_src)) // 100``
    from the uniform start, top-k terms by (rank desc, term asc).

    Scale shape: the corpus-sized work is the edge extraction — one
    map pass emits per-block DISTINCT (a, b) pairs and distinct tokens
    (tagged kinds on one stream), one groupby folds them to the global
    edge/vocab sets, both vocabulary-bounded (corpus-sublinear), never
    row-count-bounded. The 10-iteration PageRank then runs on the
    vocab graph driver-side in vectorized int64 — the k-means-centroid
    /pca_power shape: corpus-size-free state, one numpy add.at kernel
    per iteration (exact integer, no float bincount weights)."""
    from ray.data.aggregate import Count

    def extract(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pairs: set = set()
        toks: set = set()
        for t in col.to_pylist():
            ws = t.split()
            toks.update(ws)
            for x, y in zip(ws, ws[1:]):
                if x != y:
                    pairs.add((x, y) if x < y else (y, x))
        a = [p[0] for p in pairs] + sorted(toks)
        b = [p[1] for p in pairs] + [""] * len(toks)
        kind = [0] * len(pairs) + [1] * len(toks)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "kind": pa.array(kind, pa.int8())})

    folded = (docs_ds.map_batches(extract, batch_format="pyarrow")
              .groupby(["a", "b", "kind"])
              .aggregate(Count(alias_name="_n"))
              .to_pandas())
    nodes = sorted(folded.loc[folded["kind"] == 1, "a"])
    n = len(nodes)
    if n == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "rank_scaled": pa.array([], pa.int64())})
    idx = {t: i for i, t in enumerate(nodes)}
    ed = folded[folded["kind"] == 0]
    ea = np.asarray([idx[t] for t in ed["a"]], dtype=np.int64)
    eb = np.asarray([idx[t] for t in ed["b"]], dtype=np.int64)
    src = np.concatenate([ea, eb])
    dst = np.concatenate([eb, ea])
    deg = np.bincount(src, minlength=n).astype(np.int64)
    base = scale // n
    r = np.full(n, base, dtype=np.int64)
    safe_deg = np.maximum(deg, 1)
    for _ in range(iters):
        contrib = r[src] // safe_deg[src]
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, contrib)
        r = (15 * base + 85 * s) // 100
    order = np.lexsort((np.asarray(nodes, dtype=object), -r))[:topk]
    return pa.table({"term": pa.array([nodes[i] for i in order],
                                      pa.string()),
                     "rank_scaled": pa.array(r[order], pa.int64())})


def degree_assortativity(edges_ds, n_parts: int | None = None,
                         driver_limit: int = 1 << 21) -> pa.Table:
    """Degree assortativity of an undirected graph as EXACT sufficient
    statistics (the autocorr convention — no float Pearson): over the
    2|E| directed edge endpoints, sx = sum deg(src), sxx = sum
    deg(src)^2, sxy = sum deg(src) * deg(dst) (sy/syy equal sx/sxx by
    symmetry), plus the assembled r_ppm = (m2 * sxy - sx^2) * 1e6 //
    (m2 * sxx - sx^2), trunc-toward-zero to match DuckDB.

    Scale shape: distinct-ify the raw edge stream (one bounded
    groupby), fold degrees (one groupby), then the ONLY pair-level
    term (sxy) comes from one hash join dir x deg + a groupby-Sum —
    sum_v deg(v) * s(v) where s(v) is the neighbor-degree sum; sx/sxx
    fold straight off the degree table as sum deg^2 / deg^3. No
    broadcast, nothing corpus-sized on the driver. Under
    ``driver_limit`` raw edge rows all four statistics fold densely on
    the driver (one np.unique + bincounts — the three groupbys and the
    hash join above measured ~3.2 s of fixed cost on a 20k-edge graph);
    both paths pinned equal in pytest."""
    from ray.data.aggregate import Count, Sum

    from ..util import join_parts

    edges_m = edges_ds.materialize()
    if edges_m.count() <= driver_limit:
        et = _gather(edges_m)
        a = et.column("a").to_numpy(zero_copy_only=False)
        b = et.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if a.size:
            keep = np.concatenate(([True], (a[1:] != a[:-1])
                                   | (b[1:] != b[:-1])))
            a, b = a[keep], b[keep]
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        hi = int(src.max()) + 1 if src.size else 1
        deg = np.bincount(src, minlength=hi).astype(np.int64)
        m2 = int(deg.sum())
        sx = int((deg * deg).sum())
        sxx = int((deg * deg * deg).sum())
        sxy = int((deg[src] * deg[dst]).sum())
        num = m2 * sxy - sx * sx
        den = m2 * sxx - sx * sx
        if den == 0:
            r_ppm = 0
        elif num < 0:
            r_ppm = -((-num) * 1_000_000 // den)
        else:
            r_ppm = num * 1_000_000 // den
        return pa.table({"m2": pa.array([m2], pa.int64()),
                         "sx": pa.array([sx], pa.int64()),
                         "sxx": pa.array([sxx], pa.int64()),
                         "sxy": pa.array([sxy], pa.int64()),
                         "r_ppm": pa.array([r_ppm], pa.int64())})

    n_parts = n_parts or join_parts()
    edges = (edges_m.groupby(["a", "b"]).aggregate(Count())
             .select_columns(["a", "b"]).materialize())

    def both(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    def _compact(ds):
        # Ray 2.49's hash join crashes when a partition receives only
        # EMPTY blocks (column-less table reaches acero) — compact
        # every join input to ceil(rows / 4096) blocks, the
        # dedup-incremental fix
        n = ds.count()
        return ds.repartition(max(1, min(n_parts, (n + 4095) // 4096)))

    dir_ds = _compact(
        edges.map_batches(both, batch_format="pyarrow").materialize())
    deg = _compact(dir_ds.groupby("src")
                   .aggregate(Count(alias_name="deg")).materialize())

    def deg_folds(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch.column("deg"), dtype=np.int64)
        return pa.table({"m2": pa.array([int(d.sum())], pa.int64()),
                         "sx": pa.array([int((d * d).sum())], pa.int64()),
                         "sxx": pa.array([int((d * d * d).sum())],
                                         pa.int64())})

    base = deg.map_batches(deg_folds, batch_format="pyarrow").to_pandas()
    m2, sx, sxx = (int(base["m2"].sum()), int(base["sx"].sum()),
                   int(base["sxx"].sum()))

    nbr = _compact(
        dir_ds.join(deg, "inner", n_parts, on=("src",))
        .map_batches(lambda b: pa.table(
            {"node": b.column("dst"), "s": b.column("deg")}),
            batch_format="pyarrow")
        .groupby("node").aggregate(Sum("s", alias_name="s"))
        .materialize())
    joined = nbr.join(
        deg.map_batches(lambda b: pa.table(
            {"node": b.column("src"), "deg": b.column("deg")}),
            batch_format="pyarrow"),
        "inner", n_parts, on=("node",))

    def xy_fold(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch.column("s"), dtype=np.int64)
        d = np.asarray(batch.column("deg"), dtype=np.int64)
        return pa.table({"sxy": pa.array([int((s * d).sum())],
                                         pa.int64())})

    sxy = int(joined.map_batches(xy_fold, batch_format="pyarrow")
              .to_pandas()["sxy"].sum())
    num = m2 * sxy - sx * sx
    den = m2 * sxx - sx * sx
    if den == 0:
        r_ppm = 0
    elif num < 0:
        r_ppm = -((-num) * 1_000_000 // den)
    else:
        r_ppm = num * 1_000_000 // den
    return pa.table({"m2": pa.array([m2], pa.int64()),
                     "sx": pa.array([sx], pa.int64()),
                     "sxx": pa.array([sxx], pa.int64()),
                     "sxy": pa.array([sxy], pa.int64()),
                     "r_ppm": pa.array([r_ppm], pa.int64())})
