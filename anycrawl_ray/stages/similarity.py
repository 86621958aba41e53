"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: baseline exact top-k cosine — per-batch numpy matmul of
  the batch's vectors against a **broadcast** query matrix, emitting each
  batch's local top-k; a driver-side merge of the tiny per-batch top-k
  tables yields the global top-k (classic map-side top-k + small reduce —
  never an all-pairs shuffle).
- ``ivf_knn``: the scale path — a seeded numpy k-means (few iterations on a
  sample) builds centroids once, vectors get a cluster id via
  ``map_batches``, and each query probes only the ``nprobe`` nearest
  clusters. Recall vs the brute-force baseline is pinned in tests.

Scores are computed in float64 so results are comparable with the DuckDB
``list_cosine_similarity`` oracle to ~1e-15.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text_analysis import _mix64_np  # shared splitmix64 kernel


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_embeddings(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def knn_brute(ds, queries: np.ndarray, query_ids: list[int], k: int = 10):
    """-> pa.Table (query_id, neighbor_id, rank, cosine), rank 1..k by
    descending cosine (ties broken by neighbor_id, deterministic)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))

    def local_topk(batch: pa.Table) -> pa.Table:
        emb = _normalize(_batch_embeddings(batch))
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sims = qn @ emb.T  # (Q, n)
        kk = min(k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([query_ids[qi]] * kk)
            out_n.extend(ids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)


def _merge_topk(partials, k: int) -> pa.Table:
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.table({
        "query_id": pa.array(top["query_id"].tolist(), pa.int64()),
        "neighbor_id": pa.array(top["neighbor_id"].tolist(), pa.int64()),
        "rank": pa.array(top["rank"].tolist(), pa.int32()),
        "cosine": pa.array(top["cosine"].tolist(), pa.float64()),
    })


def kmeans_fit(sample: np.ndarray, n_clusters: int = 16, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Seeded lightweight k-means on normalized vectors (spherical-ish)."""
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_clusters, len(sample)),
                                  replace=False)]
    for _ in range(iters):
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def hash_centroids(ds, n_clusters: int) -> np.ndarray:
    """Deterministic, SQL-replicable centroid choice: the ``n_clusters``
    vectors whose ``(mix64(vec_id), vec_id)`` ranks lowest (a uniform
    pseudo-random pick with no RNG state — ``ORDER BY mix64(vec_id),
    vec_id LIMIT n`` in SQL). Distributed as map-side local top-n over
    (rank, vec_id, embedding) partials + a tiny driver merge — one
    streaming pass, no shuffle, no full materialization.

    k-means centroids cluster tighter, but their PCG64 init + iterative
    float means are not oracle-expressible; this variant makes the whole
    IVF pipeline value-hash-checkable (the kmeans path stays available
    via ``kmeans_fit`` and is recall-pinned in tests)."""

    def local_top(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        rank = _mix64_np(ids.astype(np.uint64))
        order = np.lexsort((ids, rank))[:n_clusters]
        emb = _batch_embeddings(batch)[order]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "rank": pa.array(rank[order].astype(np.int64), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        })

    partials = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    rank_u64 = partials["rank"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.lexsort((partials["vec_id"].to_numpy(), rank_u64))[:n_clusters]
    return np.asarray(partials["embedding"].iloc[order].tolist(),
                      dtype=np.float64)


def ivf_knn(ds, queries: np.ndarray, query_ids: list[int], k: int = 10,
            n_clusters: int = 16, nprobe: int = 4, sample_size: int = 2048,
            seed: int = 42, centroids: np.ndarray | None = None):
    """IVF-style ANN: centroids from a seeded sample (driver, once,
    broadcast), cluster assignment via map_batches, queries probe their
    nprobe nearest centroids only. Pass ``centroids`` (e.g. from
    ``hash_centroids``) to skip the k-means fit."""
    if centroids is None:
        sample = ds.limit(sample_size).to_pandas()["embedding"].tolist()
        centroids = kmeans_fit(np.asarray(sample), n_clusters, seed=seed)
    else:
        centroids = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    return _probed_topk(ds, centroids, qn, query_ids, probe, k)


def _probed_topk(ds, centroids: np.ndarray, qn: np.ndarray,
                 query_ids: list[int], probe: np.ndarray, k: int):
    """Per-query masked local top-k over an assigned corpus: each batch
    assigns its vectors to the nearest centroid and each query only scores
    vectors inside ITS probed clusters (shared by ivf_knn and
    IVFIndex.search so both paths have identical semantics)."""
    probe_sets = [set(p.tolist()) for p in probe]

    def local_topk(batch: pa.Table) -> pa.Table:
        emb = _normalize(_batch_embeddings(batch))
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        assign = (emb @ centroids.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(qn.shape[0]):
            mask = np.isin(assign, list(probe_sets[qi]))
            if not mask.any():
                continue
            row = qn[qi] @ emb[mask].T
            sub_ids = ids[mask]
            kk = min(k, row.size)
            idx = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([query_ids[qi]] * kk)
            out_n.extend(sub_ids[idx].tolist())
            out_s.extend(row[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)


class IVFIndex:
    """Persistent IVF index with REAL partition pruning (the v2 of
    ``ivf_knn``, whose one-shot form still scans every row to assign
    clusters at query time).

    ``build`` fits seeded k-means on a sample (driver, once), assigns a
    cluster id per row in ``map_batches`` (broadcast centroids) and writes
    hive-partitioned parquet ``cluster=K/...`` — the resumable layout the
    100-TB brief asks for. ``search`` reads ONLY the probed clusters'
    directories (column- and partition-pruned ``read_parquet``), so query
    cost scales with nprobe/n_clusters of the corpus, not the corpus.
    """

    def __init__(self, index_dir: str, centroids: np.ndarray) -> None:
        self.index_dir = index_dir
        self.centroids = centroids

    @classmethod
    def build(cls, ds, index_dir: str, n_clusters: int = 16,
              sample_size: int = 2048, seed: int = 42,
              centroids: np.ndarray | None = None) -> "IVFIndex":
        import os

        import ray

        if centroids is None:
            sample = ds.limit(sample_size).to_pandas()["embedding"].tolist()
            centroids = kmeans_fit(np.asarray(sample), n_clusters, seed=seed)
        else:
            centroids = _normalize(np.asarray(centroids, dtype=np.float64))
        cent_ref = ray.put(centroids)

        def assign(batch: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            emb = _normalize(_batch_embeddings(batch))
            cluster = (emb @ cents.T).argmax(axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cluster))

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            index_dir, partition_cols=["cluster"])
        np.save(os.path.join(index_dir, "centroids.npy"), centroids)
        return cls(index_dir, centroids)

    @classmethod
    def load(cls, index_dir: str) -> "IVFIndex":
        import os

        return cls(index_dir,
                   np.load(os.path.join(index_dir, "centroids.npy")))

    def search(self, queries: np.ndarray, query_ids: list[int], k: int = 10,
               nprobe: int = 4):
        import os

        import ray.data as rd

        qn = _normalize(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-(qn @ self.centroids.T), axis=1)[:, :nprobe]
        needed = sorted({int(c) for p in probe for c in p})
        paths = []
        for c in needed:
            cdir = os.path.join(self.index_dir, f"cluster={c}")
            if os.path.isdir(cdir):
                paths.extend(os.path.join(cdir, f)
                             for f in sorted(os.listdir(cdir))
                             if f.endswith(".parquet"))
        if not paths:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int32()),
                             "cosine": pa.array([], pa.float64())})
        # partition-pruned read: only probed clusters leave storage; each
        # query then scores ONLY its own probed clusters (same semantics
        # as ivf_knn — re-assignment over the pruned subset is exact, so
        # no cross-query candidate bleed from the union of paths)
        from ..util import sized_read_parquet

        sub = sized_read_parquet(paths, columns=["vec_id", "embedding"])
        return _probed_topk(sub, self.centroids, qn, query_ids, probe, k)


def knn_graph(ds, k: int = 5, chunk_rows: int = 4096, collect: bool = True):
    """EXACT k-nearest-neighbor graph: for every vector, its top-k cosine
    neighbors over the whole corpus (self excluded) — the building block
    for embedding-space near-dup clustering and kNN-graph curation.

    Shape: ONE materialization pins the corpus blocks in plasma (workers
    wrote them; the driver holds only the block refs); a second streaming
    pass maps each query batch against every block ref — zero-copy reads
    from the object store, one (batch x chunk) matmul at a time, per-task
    memory = one batch + one chunk — keeping a per-query running top-k;
    per-batch local top-k tables fold in a tiny driver merge. Compute is
    inherently O(N^2/cluster); the object store spills chunks instead of
    any worker (or the driver) ever holding the corpus. For billion-row
    corpora the IVF-partitioned index bounds the candidate set
    (``IVFIndex.search``); this exact graph is the recall oracle and the
    small/medium-N path.

    Every top-k selection (per chunk, running-set re-prune, final) uses
    the SAME lexicographic (cosine DESC, neighbor_id ASC) order — an
    argpartition prune would drop an arbitrary subset of TIED neighbors
    (exact-duplicate embeddings, this operator's target case) and diverge
    from the SQL oracle's deterministic tie-break."""
    import ray

    mat = ds.materialize()
    chunk_refs = list(mat.to_arrow_refs())
    if mat.count() == 0:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int32()),
                          "neighbor_id": pa.array([], pa.int64())})
        return empty

    def _chunk(ref):
        tbl = ray.get(ref)
        ids = np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64)
        return ids, _normalize(_batch_embeddings(tbl))

    def _prune(sims, nids, kk):
        # deterministic composite order: cosine DESC then neighbor ASC
        order = np.lexsort((nids, -sims), axis=1)[:, :kk]
        return (np.take_along_axis(sims, order, axis=1),
                np.take_along_axis(nids, order, axis=1))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        q = _normalize(_batch_embeddings(batch))
        best_s = np.full((q.shape[0], 0), 0.0)
        best_n = np.full((q.shape[0], 0), 0, dtype=np.int64)
        for ref in chunk_refs:
            ids, emb = _chunk(ref)
            if ids.size == 0:
                continue
            sims = q @ emb.T                       # (B, C)
            sims[qids[:, None] == ids[None, :]] = -np.inf  # self
            kk = min(k, sims.shape[1])
            cs, cn = _prune(sims, np.broadcast_to(ids, sims.shape), kk)
            best_s = np.concatenate([best_s, cs], axis=1)
            best_n = np.concatenate([best_n, cn], axis=1)
            if best_s.shape[1] > 4 * k:            # re-prune the running set
                best_s, best_n = _prune(best_s, best_n, k)
        # final exact per-query top-k, ties by neighbor_id ascending
        order = np.lexsort((best_n, -best_s), axis=1)[:, :k]
        out_q = np.repeat(qids, order.shape[1])
        out_n = np.take_along_axis(best_n, order, axis=1).ravel()
        out_s = np.take_along_axis(best_s, order, axis=1).ravel()
        rank = np.tile(np.arange(1, order.shape[1] + 1), qids.size)
        ok = np.isfinite(out_s)
        return pa.table({"vec_id": pa.array(out_q[ok], pa.int64()),
                         "rank": pa.array(rank[ok].astype(np.int32),
                                          pa.int32()),
                         "neighbor_id": pa.array(out_n[ok], pa.int64())})

    edges = mat.map_batches(local_topk, batch_format="pyarrow",
                            batch_size=chunk_rows)
    # each batch's rows are FINAL (its running top-k saw every chunk), so
    # the streaming Dataset form costs nothing extra — at corpus scale the
    # N*k edge list belongs in parquet, not on the driver
    if not collect:
        return edges
    out = edges.to_pandas()
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    return tbl.cast(pa.schema([("vec_id", pa.int64()),
                               ("rank", pa.int32()),
                               ("neighbor_id", pa.int64())])) \
        .sort_by([("vec_id", "ascending"), ("rank", "ascending")])


def kmeans_int(ds, n_clusters: int = 8, iters: int = 3, scale: int = 100,
               offset: int = 1000, dim_lo: int | None = None,
               dim_hi: int | None = None,
               seeds_full: np.ndarray | None = None):
    """Distributed Lloyd's k-means in EXACT integer fixed-point — every
    arithmetic step is order-free int64, so the whole iteration history
    is bit-identical between this pipeline and a DuckDB unrolled-CTE
    replay (the pagerank_int convention; float centroid means would
    drift by summation order and poison later assignments).

    Coordinates quantize as rint(x * scale) + offset; the offset keeps
    every value (hence every cluster sum) non-negative so the centroid
    update ``sum // count`` means the same thing in numpy (floor) and
    DuckDB (``//`` truncates toward zero — they differ on negatives).
    Distances are integer squared-L2 (shift-invariant, so the offset
    cancels); assignment tie-breaks to the lowest cluster index; empty
    clusters keep their previous centroid.

    Scale shape per iteration: centroids (k x d ints) broadcast into ONE
    assignment map_batches that emits k partial-sum rows per batch
    (cluster, elementwise sums, count), then a k-group map_groups merge;
    the corpus is never collected and the shuffle carries
    O(k * d * blocks) ints. Seeds = hash_centroids (lowest
    (mix64(vec_id), vec_id) ranks). Returns (vec_id, cluster) sorted."""
    ds = ds.materialize()  # iters+2 passes read plasma, not the source
    sl = slice(dim_lo, dim_hi)  # optional subspace (PQ codebooks)
    c_final, quantize = _kmeans_fit(ds, n_clusters, iters, scale, offset,
                                    sl, seeds_full)

    def assign_out(batch: pa.Table) -> pa.Table:
        ids, q = quantize(batch)
        d2 = ((q[:, None, :] - c_final[None, :, :]) ** 2).sum(axis=2)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(d2.argmin(axis=1)
                                             .astype(np.int64))})

    out = (ds.map_batches(assign_out, batch_format="pyarrow")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return pa.table({"vec_id": pa.array(out["vec_id"].astype("int64"),
                                        pa.int64()),
                     "cluster": pa.array(out["cluster"].astype("int64"),
                                         pa.int64())})


def _kmeans_fit(ds, n_clusters: int, iters: int, scale: int, offset: int,
                sl: slice, seeds_full: np.ndarray | None = None):
    """The kmeans_int fit loop (shared with semdedup): runs ``iters``
    exact integer Lloyd iterations over an already-materialized dataset
    and returns ``(final centroids int64 (k, d), quantize(batch) ->
    (ids, q))``. See kmeans_int for the arithmetic contract."""
    import pandas as pd

    if seeds_full is None:
        seeds_full = hash_centroids(ds, n_clusters)
    seeds = np.asarray(seeds_full, dtype=np.float64)[:, sl]
    cents = (np.rint(seeds * scale) + offset).astype(np.int64)
    k = cents.shape[0]

    def quantize(batch: pa.Table):
        q = (np.rint(_batch_embeddings(batch)[:, sl] * scale) + offset
             ).astype(np.int64)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        return ids, q

    for _ in range(iters):
        c = cents  # bind current value into the closure

        def partial_sums(batch: pa.Table) -> pa.Table:
            _, q = quantize(batch)
            d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # first occurrence = lowest idx
            sums = np.zeros((k, q.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, q)
            cnt = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "s": pa.array(list(sums), pa.list_(pa.int64())),
                "m": pa.array(cnt),
            })

        def merge(df: pd.DataFrame) -> pd.DataFrame:
            s = np.stack(df["s"].to_numpy()).astype(np.int64).sum(axis=0)
            return pd.DataFrame({
                "cluster": df["cluster"].iloc[:1].astype(np.int64),
                "s": [s.tolist()],
                "m": [np.int64(df["m"].sum())],
            })

        got = (ds.map_batches(partial_sums, batch_format="pyarrow")
               .groupby("cluster").map_groups(merge, batch_format="pandas")
               .to_pandas())
        new_cents = cents.copy()  # empty clusters keep their centroid
        for _, row in got.iterrows():
            m = int(row["m"])
            if m > 0:
                s = np.asarray(row["s"], dtype=np.int64)
                new_cents[int(row["cluster"])] = s // m
        cents = new_cents

    return cents, quantize


def semdedup(ds, n_clusters: int = 8, iters: int = 3, tau_num: int = 4,
             tau_den: int = 5, scale: int = 100,
             offset: int = 1000, fit=None) -> pa.Table:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    embedding space (the exact kmeans_int recurrence), then inside each
    cluster drop all but one member of every semantic-duplicate component
    (cosine similarity >= tau_num/tau_den). EXACT integer end to end: the
    cosine test cos(a, b) >= t runs on centered quantized coordinates
    (rint(x*scale); the kmeans offset cancels) as

        dot > 0  AND  tau_den^2 * dot^2 >= tau_num^2 * |a|^2 * |b|^2

    — all int64 (|q| <= ~60 at scale=100 over unit-ish 64-dim vectors
    keeps every product < 2^51), so the keep-set is bit-replayable in SQL.
    Zero-norm vectors never match anything (dot > 0 is strict).

    Scale shape: the fit broadcasts k*d ints per iteration (kmeans_int);
    the dedup pass is ONE assignment map_batches emitting (vec_id,
    cluster, centered vec) and ONE groupby(cluster) shuffle; the
    in-cluster kernel is an O(m^2 d) integer matmul plus a local
    union-find where m ~ N/k. SemDeDup's operating contract is that k
    grows with the corpus so m stays bounded (the paper runs ~50k
    clusters over LAION); a pathological hot cluster would get the same
    cap treatment as the LSH buckets. Pairs never cross clusters, so
    components are cluster-local — no global label propagation round.

    Returns (vec_id, cluster, rep, keep) sorted by vec_id; rep = min
    vec_id of the duplicate component (rep = vec_id for singletons),
    keep = 1 iff vec_id == rep."""
    import pandas as pd

    ds = ds.materialize()  # fit passes + the dedup pass read plasma
    # ``fit``: a precomputed (c_final, quantize) from _kmeans_fit with
    # the SAME params — lets composites (embeddings_curation) share one
    # fit across gates instead of re-running it
    c_final, quantize = fit or _kmeans_fit(ds, n_clusters, iters, scale,
                                           offset, slice(None, None))
    num2 = tau_num * tau_num
    den2 = tau_den * tau_den

    def assign_vec(batch: pa.Table) -> pa.Table:
        ids, q = quantize(batch)
        d2 = ((q[:, None, :] - c_final[None, :, :]) ** 2).sum(axis=2)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(d2.argmin(axis=1).astype(np.int64)),
            "q": pa.array([r.tolist() for r in (q - offset)],
                          pa.list_(pa.int64())),
        })

    def in_cluster(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vec_id").reset_index(drop=True)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        q = np.stack(df["q"].to_numpy()).astype(np.int64)
        dot = q @ q.T
        n2 = np.einsum("ij,ij->i", q, q)
        hit = (dot > 0) & (den2 * dot * dot >= num2 * np.outer(n2, n2))
        ai, bi = np.nonzero(np.triu(hit, k=1))
        parent = np.arange(ids.size)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ai.tolist(), bi.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.fromiter((find(i) for i in range(ids.size)),
                            count=ids.size, dtype=np.int64)
        rep = ids[roots]  # ids ascending => root index carries min id
        return pd.DataFrame({"vec_id": ids,
                             "cluster": df["cluster"].to_numpy(np.int64),
                             "rep": rep,
                             "keep": (rep == ids).astype(np.int64)})

    out = (ds.map_batches(assign_vec, batch_format="pyarrow")
           .groupby("cluster").map_groups(in_cluster,
                                          batch_format="pandas")
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    return pa.table({c: pa.array(out[c].astype("int64"), pa.int64())
                     for c in ("vec_id", "cluster", "rep", "keep")})


def pq_codes(ds, n_sub: int = 2, n_clusters: int = 4, iters: int = 2,
             dim: int = 64) -> pa.Table:
    """Product-quantization codes (Jegou et al. 2011): the embedding
    splits into ``n_sub`` contiguous subspaces, each trained with the
    EXACT integer k-means recurrence (``kmeans_int`` on a dim slice) so
    every codebook — and therefore every code — is bit-replayable in
    SQL. Returns (vec_id, code_0..code_{n_sub-1}); at corpus scale the
    codes would stream to a parquet sink instead of the driver, but
    training cost is the same either way: n_sub independent kmeans_int
    runs, each one assignment pass + a k-group merge per iteration."""
    import pandas as pd

    width = dim // n_sub
    ds = ds.materialize()  # one source read feeds every subspace pass
    seeds_full = hash_centroids(ds, n_clusters)  # rank order is
    # vec_id-only, so one seed scan serves all subspace slices
    merged: pd.DataFrame | None = None
    for si in range(n_sub):
        a = kmeans_int(ds, n_clusters=n_clusters, iters=iters,
                       dim_lo=si * width, dim_hi=(si + 1) * width,
                       seeds_full=seeds_full
                       ).to_pandas().rename(columns={"cluster":
                                                     f"code_{si}"})
        merged = a if merged is None else merged.merge(a, on="vec_id")
    cols = {"vec_id": pa.array(merged["vec_id"].astype("int64"),
                               pa.int64())}
    for si in range(n_sub):
        cols[f"code_{si}"] = pa.array(merged[f"code_{si}"].astype("int64"),
                                      pa.int64())
    return pa.table(cols)


def cluster_purity(ds, n_clusters: int = 8, iters: int = 3,
                   scale: int = 100, offset: int = 1000,
                   label_col: str = "label") -> pa.Table:
    """Clustering-evaluation row (the embedding mirror of the lang-ID
    confusion matrix): run the exact-integer kmeans_int recurrence, then
    score each cluster against the ground-truth ``label`` column —
    majority label (ties -> smallest label), majority count, and purity
    in ppm (``maj * 10^6 // n``). One extra map_batches pass emits
    (cluster, label) count partials, so the only thing folded at the
    driver is the k x |labels| contingency table, never assignments."""
    import pandas as pd

    ds = ds.materialize()
    c_final, quantize = _kmeans_fit(ds, n_clusters, iters, scale, offset,
                                    slice(None))

    def contingency(batch: pa.Table) -> pa.Table:
        _, q = quantize(batch)
        d2 = ((q[:, None, :] - c_final[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1).astype(np.int64)
        lab = np.asarray(batch.column(label_col), dtype=np.int64)
        t = pa.table({"cluster": pa.array(assign, pa.int64()),
                      "label": pa.array(lab, pa.int64())})
        return (t.group_by(["cluster", "label"])
                .aggregate([([], "count_all")])
                .rename_columns(["cluster", "label", "n"]))

    parts = pa.concat_tables(
        ds.map_batches(contingency, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if parts.num_rows == 0:
        return pa.table({"cluster": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "maj_label": pa.array([], pa.int64()),
                         "maj_n": pa.array([], pa.int64()),
                         "purity_ppm": pa.array([], pa.int64())})
    df = (parts.group_by(["cluster", "label"]).aggregate([("n", "sum")])
          .rename_columns(["cluster", "label", "n"]).to_pandas())
    df = df.sort_values(["cluster", "n", "label"],
                        ascending=[True, False, True])
    top = df.groupby("cluster", as_index=False).first() \
        .rename(columns={"label": "maj_label", "n": "maj_n"})
    tot = (df.groupby("cluster", as_index=False)["n"].sum()
           .rename(columns={"n": "n_total"}))
    fin = top.merge(tot, on="cluster").sort_values("cluster")
    purity = (fin["maj_n"].astype("int64") * 1_000_000
              // fin["n_total"].astype("int64"))
    return pa.table({
        "cluster": pa.array(fin["cluster"].astype("int64"), pa.int64()),
        "n": pa.array(fin["n_total"].astype("int64"), pa.int64()),
        "maj_label": pa.array(fin["maj_label"].astype("int64"),
                              pa.int64()),
        "maj_n": pa.array(fin["maj_n"].astype("int64"), pa.int64()),
        "purity_ppm": pa.array(purity.astype("int64"), pa.int64()),
    })


def mmr_topk(ds, query: np.ndarray, k: int = 5, pool: int = 50,
             lam_num: int = 1, lam_den: int = 2, scale: int = 100,
             exclude_ids: tuple = ()) -> pa.Table:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998)
    diversified top-k: greedily pick the item maximizing
    ``lam*rel(c) - (1-lam)*max_{s in selected} sim(c, s)`` — the
    standard diversity re-ranker over a similarity search result.

    Exact integer contract: vectors quantize as rint(x*scale) (no
    offset — only products/sums, no floor division on negatives);
    rel/sim are integer dot products; lambda is the rational
    ``lam_num/lam_den`` so the greedy comparison is the int64
    ``lam_num*rel - (lam_den-lam_num)*maxsim`` with ties to the smaller
    vec_id. Step 1 scores ``lam_num*rel`` (empty selected set).

    Scale shape (the standard two-stage MMR): stage 1 is a distributed
    relevance scan — the query vector broadcasts into map_batches, each
    block emits its local top-``pool`` rows by (rel desc, vec_id), and
    the driver merges O(pool x blocks) rows once; stage 2 runs the
    O(k * pool * d) greedy on the pool matrix driver-side (pool is a
    caller constant, never corpus-sized)."""
    qq = np.rint(np.asarray(query, dtype=np.float64) * scale) \
        .astype(np.int64)
    excl = np.asarray(sorted(exclude_ids), dtype=np.int64)

    def local_top(batch: pa.Table) -> pa.Table:
        q = np.rint(_batch_embeddings(batch) * scale).astype(np.int64)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        if excl.size:
            keep = ~np.isin(ids, excl)
            q, ids = q[keep], ids[keep]
        rel = q @ qq
        order = np.lexsort((ids, -rel))[:pool]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "rel": pa.array(rel[order], pa.int64()),
            "q": pa.array(list(q[order]), pa.list_(pa.int64()))})

    parts = list(ds.map_batches(local_top, batch_format="pyarrow")
                 .iter_batches(batch_size=1 << 20,
                               batch_format="pyarrow"))
    empty = pa.table({"rank": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
    if not parts:
        return empty
    merged = pa.concat_tables(parts)
    ids = np.asarray(merged.column("vec_id"), dtype=np.int64)
    rel = np.asarray(merged.column("rel"), dtype=np.int64)
    qm = np.asarray(merged.column("q").to_pylist(), dtype=np.int64)
    order = np.lexsort((ids, -rel))[:pool]
    ids, rel, qm = ids[order], rel[order], qm[order]

    lam_gap = lam_den - lam_num
    selected: list[int] = []
    scores: list[int] = []
    ms = None  # max sim to selected — NO zero clamp (sims can be < 0)
    taken = np.zeros(ids.size, dtype=bool)
    for _ in range(min(k, ids.size)):
        sc = (lam_num * rel if ms is None
              else lam_num * rel - lam_gap * ms)
        sc_m = np.where(taken, np.iinfo(np.int64).min, sc)
        # rows are rel-ordered, not id-ordered — break score ties to the
        # smallest vec_id explicitly
        cand = np.flatnonzero(sc_m == sc_m.max())
        best = int(cand[np.argmin(ids[cand])])
        taken[best] = True
        selected.append(int(ids[best]))
        scores.append(int(sc[best]))
        d = qm @ qm[best]
        ms = d if ms is None else np.maximum(ms, d)
    return pa.table({
        "rank": pa.array(np.arange(1, len(selected) + 1, dtype=np.int64),
                         pa.int64()),
        "vec_id": pa.array(selected, pa.int64()),
        "score": pa.array(scores, pa.int64())})


def kmeans_outliers(ds, k_out: int = 20, n_clusters: int = 8,
                    iters: int = 3, scale: int = 100,
                    offset: int = 1000, fit=None) -> pa.Table:
    """Embedding-space anomaly detection: fit the exact-integer kmeans
    recurrence, then rank every vector by its integer squared-L2
    distance to its OWN centroid — the classic distance-to-centroid
    outlier score — and keep the global top ``k_out`` (ties to the
    smaller vec_id). One extra map_batches pass; each block emits only
    its local top-``k_out`` rows, the driver merges O(k_out x blocks)."""
    ds = ds.materialize()
    c_final, quantize = fit or _kmeans_fit(ds, n_clusters, iters, scale,
                                           offset, slice(None))

    def local_top(batch: pa.Table) -> pa.Table:
        ids, q = quantize(batch)
        d2 = ((q[:, None, :] - c_final[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        dist = d2[np.arange(ids.size), assign]
        order = np.lexsort((ids, -dist))[:k_out]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "cluster": pa.array(assign[order].astype(np.int64),
                                pa.int64()),
            "d2": pa.array(dist[order], pa.int64())})

    parts = list(ds.map_batches(local_top, batch_format="pyarrow")
                 .iter_batches(batch_size=1 << 20,
                               batch_format="pyarrow"))
    if not parts:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64()),
                         "d2": pa.array([], pa.int64())})
    m = pa.concat_tables(parts)
    ids = np.asarray(m.column("vec_id"), dtype=np.int64)
    cl = np.asarray(m.column("cluster"), dtype=np.int64)
    d2 = np.asarray(m.column("d2"), dtype=np.int64)
    order = np.lexsort((ids, -d2))[:k_out]
    return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                     "cluster": pa.array(cl[order], pa.int64()),
                     "d2": pa.array(d2[order], pa.int64())})


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (numpy 1.26 has no
    bit_count ufunc)."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return (x * h01) >> np.uint64(56)


def bq_codes(batch: pa.Table, scale: int = 100) -> np.ndarray:
    """Embedding batch -> 64-bit binary-quantization codes: bit d set
    iff rint(v_d * scale) > 0 (exact integer sign rule, replayable as
    SUM(1 << (dim-1)) in SQL). Requires dim <= 64."""
    q = np.rint(_batch_embeddings(batch) * scale).astype(np.int64)
    if q.shape[1] > 64:
        raise ValueError("bq_codes packs at most 64 dims per word")
    bits = (q > 0).astype(np.uint64)
    shifts = np.arange(q.shape[1], dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def bq_recall(ds, queries: np.ndarray, query_ids: list[int],
              k: int = 10, scale: int = 100) -> pa.Table:
    """Vector-compression evaluation: recall@k of 64x-compressed
    binary-quantization Hamming search against the exact float-cosine
    top-k (the quality gate before shipping BQ to a 100-TB vector
    store). BQ ranking = (hamming asc, neighbor_id asc); recall in
    exact integer ppm.

    Scale shape: codes are one uint64 per vector computed map-side;
    each block emits its local Hamming top-k per query against the
    broadcast query codes (SWAR popcount, no shuffle), the driver
    merges O(k x blocks x queries); the cosine side is the registered
    knn_brute operator."""
    qcodes = bq_codes(pa.table({
        "embedding": pa.array([list(map(float, q)) for q in queries],
                              pa.list_(pa.float64()))}), scale)

    def local_top(batch: pa.Table) -> pa.Table:
        codes = bq_codes(batch, scale)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        out_q, out_n, out_h = [], [], []
        for qi, qw in enumerate(qcodes):
            ham = _popcount64(codes ^ qw).astype(np.int64)
            order = np.lexsort((ids, ham))[:k]
            out_q.extend([query_ids[qi]] * order.size)
            out_n.extend(ids[order].tolist())
            out_h.extend(ham[order].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "ham": pa.array(out_h, pa.int64())})

    partials = (ds.map_batches(local_top, batch_format="pyarrow")
                .to_pandas())
    brute = knn_brute(ds, queries, query_ids, k=k).to_pandas()
    rows = []
    for q in query_ids:
        sub = partials[partials["query_id"] == q].sort_values(
            ["ham", "neighbor_id"]).head(k)
        got = set(sub["neighbor_id"])
        want = set(brute[brute["query_id"] == q]["neighbor_id"])
        rows.append((q, len(want & got) * 1_000_000 // k))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "recall_ppm": pa.array([r[1] for r in rows], pa.int64())})


def mrl_recall(ds, queries: np.ndarray, query_ids: list[int],
               k: int = 10, dims: int = 16) -> pa.Table:
    """Matryoshka truncated-dimension evaluation (Kusupati et al. 2022
    MRL): recall@k of cosine search over only the FIRST ``dims``
    coordinates against the exact full-dim top-k — the quality gate
    before shipping truncated vectors to a 100-TB index (4x smaller at
    dims=16/64). Both searches are the map-side-top-k knn_brute shape
    (broadcast queries, no shuffle); recall in exact integer ppm.

    Deterministic tie handling: both rankings break ties by
    neighbor_id, mirroring the SQL oracle's (sim DESC, neighbor_id)."""
    queries = np.asarray(queries, dtype=np.float64)

    def truncate(batch: pa.Table) -> pa.Table:
        emb = _batch_embeddings(batch)[:, :dims]
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "embedding": pa.array(list(emb), pa.list_(pa.float64()))})

    tds = ds.map_batches(truncate, batch_format="pyarrow")
    trunc = knn_brute(tds, queries[:, :dims], query_ids, k=k).to_pandas()
    brute = knn_brute(ds, queries, query_ids, k=k).to_pandas()
    rows = []
    for q in query_ids:
        got = set(trunc[trunc["query_id"] == q]["neighbor_id"])
        want = set(brute[brute["query_id"] == q]["neighbor_id"])
        rows.append((q, len(want & got) * 1_000_000 // k))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "recall_ppm": pa.array([r[1] for r in rows], pa.int64())})


def lsh_multiprobe_knn(ds, queries: np.ndarray, query_ids: list[int],
                       k: int = 10, num_planes: int = 16, probes: int = 3,
                       seed: int = 7) -> pa.Table:
    """Multi-probe LSH ANN (Lv et al. 2007): one sign-plane hash table
    (``num_planes`` random hyperplanes -> a 16-bit bucket code); each
    query probes its own bucket PLUS the ``probes`` single-bit flips of
    the planes with the smallest |dot| margin — the buckets a near
    neighbor most likely fell into — then exact-cosine reranks the
    candidate union. Returns (query_id, neighbor_id, rank); queries with
    fewer than k candidates return short lists (the oracle mirrors).

    Scale shape: corpus codes are computed map-side from the broadcast
    plane matrix; candidate selection is an ``isin`` against <=
    Q*(probes+1) broadcast codes; each block emits its local top-k and
    the driver merges O(k x blocks x Q) rows — no shuffle, no index
    build (the one-table counterpart of the IVF path)."""
    queries = np.asarray(queries, dtype=np.float64)
    dim = queries.shape[1]
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))
    shifts = np.arange(num_planes, dtype=np.int64)

    qdots = queries @ planes.T  # raw-vector margins (oracle parity)
    qcodes = ((qdots > 0).astype(np.int64) << shifts).sum(axis=1)
    probe_sets = []
    for qi in range(len(query_ids)):
        order = np.lexsort((shifts, np.abs(qdots[qi])))[:probes]
        probe_sets.append(np.concatenate(
            ([qcodes[qi]], qcodes[qi] ^ (np.int64(1) << order))))
    qn = _normalize(queries)

    def local_topk(batch: pa.Table) -> pa.Table:
        emb_raw = _batch_embeddings(batch)
        codes = ((emb_raw @ planes.T > 0).astype(np.int64)
                 << shifts).sum(axis=1)
        emb = _normalize(emb_raw)
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(query_ids):
            m = np.isin(codes, probe_sets[qi])
            if not m.any():
                continue
            sims = emb[m] @ qn[qi]
            cids = ids[m]
            kk = min(k, sims.size)
            idx = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([qid] * kk)
            out_n.extend(cids[idx].tolist())
            out_s.extend(sims[idx].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if len(partials) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int32())})
    return _merge_topk(partials, k).select(
        ["query_id", "neighbor_id", "rank"])


def dense_topk_int(ds, query: np.ndarray, k: int = 50, scale: int = 100,
                   exclude_ids: tuple = ()) -> pa.Table:
    """Exact-integer dense retrieval pool: top-``k`` vectors by the
    integer dot product against ``query`` (vectors quantized as
    rint(x*scale), the mmr_topk contract), ties to the smaller vec_id.
    -> pa.Table (vec_id, rel, rank) with rank 1..k.

    Scale shape: the query broadcasts into ``map_batches`` closures; each
    block emits its local top-k (rel desc, vec_id) and the driver merges
    O(k x blocks) rows once — the knn_brute/mmr stage-1 idiom, no shuffle,
    no corpus materialization."""
    qq = np.rint(np.asarray(query, dtype=np.float64) * scale) \
        .astype(np.int64)
    excl = np.asarray(sorted(exclude_ids), dtype=np.int64)

    def local_top(batch: pa.Table) -> pa.Table:
        q = np.rint(_batch_embeddings(batch) * scale).astype(np.int64)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        if excl.size:
            keep = ~np.isin(ids, excl)
            q, ids = q[keep], ids[keep]
        rel = q @ qq
        order = np.lexsort((ids, -rel))[:k]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "rel": pa.array(rel[order], pa.int64())})

    parts = list(ds.map_batches(local_top, batch_format="pyarrow")
                 .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "rel": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts)
    ids = np.asarray(merged.column("vec_id"), dtype=np.int64)
    rel = np.asarray(merged.column("rel"), dtype=np.int64)
    order = np.lexsort((ids, -rel))[:k]
    ids, rel = ids[order], rel[order]
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "rel": pa.array(rel, pa.int64()),
        "rank": pa.array(np.arange(1, ids.size + 1, dtype=np.int64),
                         pa.int64())})


def hard_negatives(ds, anchors: np.ndarray, anchor_ids: list[int],
                   anchor_labels: list[int], scale: int = 100) -> pa.Table:
    """Triplet mining for metric-learning data curation: for each anchor
    vector, the HARDEST NEGATIVE (different-label vector with the maximum
    integer dot — the most confusable impostor) and the HARDEST POSITIVE
    (same-label vector, excluding the anchor itself, with the MINIMUM dot
    — the most dissimilar true match). The (anchor, hard-positive,
    hard-negative) triple is the standard batch-mining unit for
    triplet/contrastive losses (FaceNet, Schroff et al. 2015).

    Exact integer contract: rint(x*scale) quantization, int64 dots, ties
    to the smaller vec_id on both sides. Anchors missing either a
    positive or a negative candidate are dropped (inner-join contract,
    mirrored in the SQL oracle).

    Scale shape: the anchor matrix broadcasts into map_batches closures
    (Q is a caller constant); each block emits at most 2 candidate rows
    per anchor (its local argmax-negative and argmin-positive), and the
    driver merges O(Q x blocks) rows — one streaming pass, no shuffle."""
    qa = np.rint(np.asarray(anchors, dtype=np.float64) * scale) \
        .astype(np.int64)                      # (Q, d)
    aid = np.asarray(anchor_ids, dtype=np.int64)
    alab = np.asarray(anchor_labels, dtype=np.int64)

    def local_best(batch: pa.Table) -> pa.Table:
        q = np.rint(_batch_embeddings(batch) * scale).astype(np.int64)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        labs = np.asarray(batch.column("label").to_pylist(),
                          dtype=np.int64)
        dots = qa @ q.T                        # (Q, n)
        out_a, out_k, out_c, out_d = [], [], [], []
        for qi in range(aid.size):
            row = dots[qi]
            neg = labs != alab[qi]
            if neg.any():
                cand = np.flatnonzero(neg)
                best = cand[np.lexsort((ids[cand], -row[cand]))[0]]
                out_a.append(int(aid[qi])); out_k.append(0)
                out_c.append(int(ids[best])); out_d.append(int(row[best]))
            pos = (labs == alab[qi]) & (ids != aid[qi])
            if pos.any():
                cand = np.flatnonzero(pos)
                best = cand[np.lexsort((ids[cand], row[cand]))[0]]
                out_a.append(int(aid[qi])); out_k.append(1)
                out_c.append(int(ids[best])); out_d.append(int(row[best]))
        return pa.table({"anchor_id": pa.array(out_a, pa.int64()),
                         "kind": pa.array(out_k, pa.int64()),
                         "cand_id": pa.array(out_c, pa.int64()),
                         "dot": pa.array(out_d, pa.int64())})

    parts = ds.map_batches(local_best, batch_format="pyarrow").to_pandas()
    cols = {"anchor_id": [], "hn_id": [], "hn_dot": [],
            "hp_id": [], "hp_dot": []}
    if len(parts):
        for a in sorted(parts["anchor_id"].unique().tolist()):
            sub = parts[parts["anchor_id"] == a]
            hn = sub[sub["kind"] == 0]
            hp = sub[sub["kind"] == 1]
            if hn.empty or hp.empty:
                continue
            hn = hn.sort_values(["dot", "cand_id"],
                                ascending=[False, True]).iloc[0]
            hp = hp.sort_values(["dot", "cand_id"],
                                ascending=[True, True]).iloc[0]
            cols["anchor_id"].append(int(a))
            cols["hn_id"].append(int(hn["cand_id"]))
            cols["hn_dot"].append(int(hn["dot"]))
            cols["hp_id"].append(int(hp["cand_id"]))
            cols["hp_dot"].append(int(hp["dot"]))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})


def pca_power(ds, iters: int = 8, scale: int = 100,
              v_scale: int = 10_000) -> pa.Table:
    """Top principal direction of the (uncentered) embedding
    second-moment matrix by deterministic integer power iteration —
    the whitening/compression primitive (PCA without the float seams).

    Coordinates quantize as rint(float64(x) * scale) — the repo-wide
    embedding convention, mirrored in SQL as round_even(CAST(x AS
    DOUBLE) * scale) (a bare FLOAT multiply rounds ~1e-7 of elements
    differently; observed at sf0.1). NO offset — a shift would
    plant a rank-1 constant component that wins the iteration). One
    corpus pass folds per-block second-moment partials M_b = Q_b^T Q_b
    (d x d, exact int64); the driver sums them into arbitrary-precision
    Python ints and runs ``w = M v; v = sign(w) * (|w| * v_scale //
    max|w|)`` for ``iters`` rounds from the all-ones start — trunc-
    toward-zero normalization so DuckDB's truncating ``//`` replays it
    verbatim on HUGEINTs (the oracle uses the algebraically identical
    w = Q^T (Q v) form, exact in integers). d x d stays driver-side by
    design: it is the k-means-centroid shape, corpus-size-free.

    Returns (dim 1-based, v) — the final scaled iterate."""

    def partial(batch: pa.Table) -> pa.Table:
        q = np.rint(_batch_embeddings(batch) * scale).astype(np.int64)
        m = q.T @ q  # d x d block partial, exact in int64
        return pa.table({"m": pa.array([m.reshape(-1).tolist()],
                                       pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64())})
    flats = [np.asarray(x, dtype=np.int64) for x in parts["m"]]
    d = int(round(len(flats[0]) ** 0.5))
    acc = [0] * (d * d)
    for f in flats:  # Python-int accumulation: no overflow at any n
        for idx in range(d * d):
            acc[idx] += int(f[idx])
    v = [v_scale] * d
    for _ in range(iters):
        w = [sum(acc[i * d + j] * v[j] for j in range(d))
             for i in range(d)]
        mx = max(max(abs(x) for x in w), 1)
        v = [(-((-x) * v_scale // mx) if x < 0 else x * v_scale // mx)
             for x in w]
    return pa.table({"dim": pa.array(range(1, d + 1), pa.int64()),
                     "v": pa.array(v, pa.int64())})


def knn_label(ds, probes: np.ndarray, probe_ids: list[int],
              k: int = 10, scale: int = 100) -> pa.Table:
    """kNN majority-vote label propagation — the weak-supervision
    primitive: each probe vector takes the majority label of its k
    nearest candidates (exact integer dots, rint(float64(x) * scale)
    quantization per the repo convention; candidate ties by smaller
    vec_id, vote ties by smaller label). Probes are excluded from the
    candidate pool.

    Scale shape: the probe matrix broadcasts into map_batches closures
    (Q is a caller constant); each block emits its local top-k
    (cand_id, label, dot) rows per probe and the driver merges
    O(Q x k x blocks) rows then votes — one streaming pass, no
    shuffle (the knn_brute idiom with labels riding along)."""
    qp = np.rint(np.asarray(probes, dtype=np.float64) * scale) \
        .astype(np.int64)
    pid = np.asarray(probe_ids, dtype=np.int64)
    excl = np.sort(pid)

    def local_top(batch: pa.Table) -> pa.Table:
        q = np.rint(_batch_embeddings(batch) * scale).astype(np.int64)
        ids = np.asarray(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        labs = np.asarray(batch.column("label").to_pylist(),
                          dtype=np.int64)
        keep = ~np.isin(ids, excl)
        q, ids, labs = q[keep], ids[keep], labs[keep]
        cols = {"pid": [], "cid": [], "lab": [], "dot": []}
        if ids.size:
            dots = qp @ q.T  # (Q, n) exact int64
            kk = min(k, ids.size)
            for i in range(pid.size):
                row = dots[i]
                top = np.lexsort((ids, -row))[:kk]
                cols["pid"].extend([int(pid[i])] * kk)
                cols["cid"].extend(ids[top].tolist())
                cols["lab"].extend(labs[top].tolist())
                cols["dot"].extend(row[top].tolist())
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in cols.items()})

    parts = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    out = {"vec_id": [], "pred_label": [], "votes": []}
    for p in sorted(pid.tolist()):
        g = parts[parts["pid"] == p]
        if len(g) == 0:
            continue
        g = g.sort_values(["dot", "cid"], ascending=[False, True]) \
            .head(k)
        counts = g.groupby("lab").size().reset_index(name="v") \
            .sort_values(["v", "lab"], ascending=[False, True])
        out["vec_id"].append(p)
        out["pred_label"].append(int(counts.iloc[0]["lab"]))
        out["votes"].append(int(counts.iloc[0]["v"]))
    return pa.table({c: pa.array(v, pa.int64())
                     for c, v in out.items()})
