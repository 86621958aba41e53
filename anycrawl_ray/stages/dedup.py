"""Deduplication operators over the ``documents`` table.

First-class training-data additions (build brief): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup. The reference itself
has only exact URL dedup (SURVEY.md §2.7); these extend the engine for
corpus curation at scale.

Scale design:
- **exact**: vectorized content-hash per batch; a Count aggregate finds
  duplicated hashes, unique rows fast-path through in pure Arrow and only
  true duplicate groups pay the per-group reduce.
- **MinHash+LSH**: per batch, w-shingle token hashes -> 64-perm signature
  (numpy, one xor-multiply per perm — no per-shingle Python) -> explode to
  band rows -> collision-count pre-filter -> bucket ``map_groups`` emits
  candidate pairs -> exact Jaccard verification worker-side. The all-pairs
  O(n^2) never materializes.
- **SimHash**: 64-bit signature per doc; blocking on 4x16-bit bands finds
  all pairs within Hamming distance 3 (pigeonhole), verified in-bucket.
- **embedding near-dup**: random-hyperplane signatures bucket candidates,
  exact cosine verifies (same LSH-then-verify shape); plus an exact
  all-pairs blocked-matmul baseline (``embedding_brute_pairs``) that the
  DuckDB ``list_cosine_similarity`` oracle checks.
- **n-gram Jaccard**: exact via distributed inverted index + integer
  threshold arithmetic — the SQL-oracle-checkable counterpart of MinHash.

All stages are ``map_batches`` + ``groupby`` shuffles over candidate-sized
data; verification never streams the corpus through the driver:

- SimHash carries its 8-byte signature through the band explode and
  verifies Hamming distance INSIDE the bucket ``map_groups``.
- MinHash / embedding broadcast only the candidate-id set (O(pairs) ids,
  << corpus), semi-join-filter the corpus worker-side, hash-``join`` the
  payloads onto both pair sides, and verify per pair in ``map_batches``.
  The driver holds pair ids and the final (small) result table only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urls import xxh64
from ..util import gather_table as _gather
from .text_analysis import _mix64_np, token_hashes

# ---------------------------------------------------------------- exact


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    # int64 bit-view of xxh64: pandas-backed grouped blocks pickle uint64
    # values above 2^63 (hash identity is all that matters here)
    hashes = np.array([xxh64(t) for t in batch.column(text_col).to_pylist()],
                      dtype=np.uint64).view(np.int64)
    return batch.append_column("text_hash", pa.array(hashes))


def _dedup_first_wins(group):
    """Vectorized first-wins inside a fat hash bucket: one stable sort on
    (text_hash, doc_id), then boundary arithmetic yields the min-doc_id
    survivor and group size per distinct hash — no per-hash Python."""
    group = group.sort_values(["text_hash", "doc_id"], kind="mergesort")
    h = group["text_hash"].to_numpy()
    if h.size == 0:
        out = group.head(0).copy()
        out["n_copies"] = np.array([], dtype=np.int64)
        return out.drop(columns="_bucket")
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    sizes = np.diff(np.r_[starts, h.size])
    out = group.iloc[starts].copy()
    out["n_copies"] = sizes.astype(np.int64)
    return out.drop(columns="_bucket")


def exact_dedup(ds, text_col: str = "text", broadcast_limit: int = 1_000_000):
    """Dataset -> Dataset of survivors (min doc_id per identical text) with
    an ``n_copies`` column. First-occurrence-wins like the frontier's
    seen-set (§2.7).

    Two plans behind an explicit size guard on the number of duplicated
    hashes (computed distributed; only the scalar count reaches the
    driver):

    - **broadcast fast path** (dup-groups <= ``broadcast_limit``): the
      duplicated-hash list is small, so unique-text rows pass straight
      through in pure Arrow (``is_in`` against the broadcast value set —
      no shuffle for the singleton majority) and only true duplicate
      groups pay the per-group reduce.
    - **distributed first-wins** (web-scale corpora where the dup-group
      list would be O(billions)): one hash shuffle of the full rows into
      ``mix64(text_hash) % n_buckets`` fat buckets, then a vectorized
      sort + boundary-diff kernel per bucket. Nothing corpus- or
      dup-group-sized ever transits the driver — the shape
      ``dedup_incremental`` uses for its anti-join."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    from .window import _default_buckets

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow"
    ).materialize()
    counts = hashed.groupby("text_hash").aggregate(Count(alias_name="n"))
    # materialize: count() and the fast path's to_pandas() both consume it
    dup = counts.filter(expr="n >= 2").materialize()
    n_dup_groups = dup.count()

    def all_unique(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_copies", pa.array([1] * batch.num_rows, pa.int64()))

    if n_dup_groups == 0:
        return hashed.map_batches(all_unique, batch_format="pyarrow")

    if n_dup_groups > broadcast_limit:
        # distributed first-wins: full-row hash shuffle into fat buckets
        nb = _default_buckets()

        def add_bucket(batch: pa.Table) -> pa.Table:
            h = np.asarray(batch.column("text_hash").combine_chunks()
                           if isinstance(batch.column("text_hash"), pa.ChunkedArray)
                           else batch.column("text_hash"), dtype=np.int64)
            b = (_mix64_np(h.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
            return batch.append_column("_bucket", pa.array(b, pa.int64()))

        return (hashed.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(_dedup_first_wins, batch_format="pandas"))

    # broadcast fast path: singleton rows never shuffle
    dup_pd = dup.to_pandas()
    dup_ref = ray.put(pa.array(dup_pd["text_hash"], pa.int64()))

    def singleton_pass(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("text_hash"),
                        value_set=_cached_get(dup_ref))
        kept = batch.filter(pc.invert(mask))
        return kept.append_column(
            "n_copies", pa.array([1] * kept.num_rows, pa.int64()))

    def dup_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("text_hash"),
                                     value_set=_cached_get(dup_ref)))

    def keep_first(group):
        group = group.sort_values("doc_id")
        first = group.head(1).copy()
        first["n_copies"] = len(group)
        return first

    singles = hashed.map_batches(singleton_pass, batch_format="pyarrow")
    dups = hashed.map_batches(dup_only, batch_format="pyarrow").groupby(
        "text_hash").map_groups(keep_first, batch_format="pandas")
    return singles.union(dups)


# ------------------------------------------------------------- minhash/LSH

_PERM_SALTS = _mix64_np(np.arange(1, 129, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """w-shingles (k consecutive tokens) -> uint64 hashes, vectorized:
    polynomial combine of the token-hash array via stride tricks."""
    th = token_hashes(text)
    if th.size < k:
        return np.unique(th)
    with np.errstate(over="ignore"):
        acc = th[: th.size - k + 1].copy()
        for i in range(1, k):
            acc = acc * np.uint64(1099511628211) + th[i : th.size - k + 1 + i]
    return np.unique(acc)


def minhash_signature(shingles: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """num_perm x uint64 signature: min over (shingle ^ salt_i) * mult."""
    if shingles.size == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (P, S) matrix via broadcasting; min over shingle axis
        mixed = (shingles[None, :] ^ _PERM_SALTS[:num_perm, None]) * np.uint64(
            0xFF51AFD7ED558CCD
        )
    return mixed.min(axis=1)


def minhash_signatures_batch(shingle_arrays: list[np.ndarray],
                             num_perm: int = 64,
                             max_chunk_shingles: int = 1 << 16) -> np.ndarray:
    """Stack of per-doc shingle arrays -> (D, num_perm) uint64 signatures
    in ONE numpy pass per chunk: shingles concatenate with offsets, the
    (P, total) salt-mix matrix reduces per doc via np.minimum.reduceat.
    Chunked along docs so the working matrix stays <= ~num_perm *
    max_chunk_shingles * 8 bytes (32 MB at defaults) regardless of batch
    size. Empty-shingle docs keep the all-zeros signature
    (minhash_signature parity, pinned by tests)."""
    D = len(shingle_arrays)
    sigs = np.zeros((D, num_perm), dtype=np.uint64)
    salts = _PERM_SALTS[:num_perm, None]
    mult = np.uint64(0xFF51AFD7ED558CCD)
    lens = np.fromiter((s.size for s in shingle_arrays), count=D,
                       dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    start = 0
    while start < nonempty.size:
        # grow the doc chunk until its shingle total would cross the cap
        # (always >= 1 doc, so a pathological single doc still processes)
        stop, total = start, 0
        while stop < nonempty.size and (
                stop == start or total + lens[nonempty[stop]] <= max_chunk_shingles):
            total += lens[nonempty[stop]]
            stop += 1
        idx = nonempty[start:stop]
        concat = np.concatenate([shingle_arrays[i] for i in idx])
        offsets = np.concatenate(([0], np.cumsum(lens[idx])[:-1]))
        with np.errstate(over="ignore"):
            mixed = (concat[None, :] ^ salts) * mult
        sigs[idx] = np.minimum.reduceat(mixed, offsets, axis=1).T
        start = stop
    return sigs


def minhash_bands_batch(batch: pa.Table, num_perm: int = 64, bands: int = 16,
                        k: int = 3, text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, band_id, band_key) rows (exploded),
    signatures + band keys computed batch-vectorized (no per-doc Python
    beyond shingling)."""
    rows_per_band = num_perm // bands
    doc_ids = batch.column("doc_id")
    texts = batch.column(text_col).to_pylist()
    D = len(texts)
    sigs = minhash_signatures_batch(
        [shingle_hashes(t, k) for t in texts], num_perm)
    # band key = sum of mix64 over the band's signature slice (mod 2^64) —
    # bit-identical to the per-doc loop this replaces
    keys = _mix64_np(sigs.reshape(-1)).reshape(
        D, bands, rows_per_band).sum(axis=2, dtype=np.uint64)
    idx = np.repeat(np.arange(D, dtype=np.int64), bands)
    t = pa.table(
        {
            "doc_id": doc_ids.take(pa.array(idx)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), D)),
            # int64 bit-reinterpretation of the uint64 key: pandas-backed
            # groupby blocks pickle uint64 values above 2^63
            "band_key": pa.array(keys.reshape(-1).view(np.int64)),
        }
    )
    return _append_bucket(t)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def _combined_bucket_key(batch: pa.Table) -> np.ndarray:
    """(band_id, band_key) -> one uint64 per row: mix64(band_id) ^ band_key.
    Collisions only cause spurious collision-filter passes (harmless — the
    downstream groupby still groups on the true key pair)."""
    bk = (batch.column("band_key").to_numpy(zero_copy_only=False)
          .astype(np.int64).view(np.uint64))
    bi = batch.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    return _mix64_np(bi) ^ bk


def _append_bucket(t: pa.Table) -> pa.Table:
    """Append the single int64 ``bucket`` key. Grouping on ONE int column
    is ~3x cheaper than on (band_id, band_key) in Ray's sort-based
    aggregate (measured); a 64-bit collision merging two true buckets only
    adds candidates that downstream exact verification discards (and for
    SimHash, any within-distance pair is guaranteed to surface via its
    true shared band anyway — pigeonhole)."""
    return t.append_column(
        "bucket", pa.array(_combined_bucket_key(t).view(np.int64)))


def _collision_rows(bands_m, max_bucket: int):
    """Keep only band rows whose bucket holds 2..max_bucket docs.

    Scale shape: a VECTORIZED Count aggregate finds collision buckets; their
    keys (O(candidates), << corpus) broadcast back as a semi-join filter.
    Running ``map_groups`` straight over every bucket was the round-1
    bottleneck — millions of singleton buckets each paid per-group pandas
    overhead. Returns None when no bucket collides.

    ``bands_m`` must be materialized (it is consumed twice)."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count

    counts = bands_m.groupby("bucket").aggregate(Count(alias_name="n"))
    hot = counts.filter(expr=f"n >= 2 and n <= {max_bucket}").to_pandas()
    if len(hot) == 0:
        return None
    ref = ray.put(pa.array(hot["bucket"], pa.int64()))

    def collision_filter(batch: pa.Table) -> pa.Table:
        value_set = _cached_get(ref)
        return batch.filter(pc.is_in(batch.column("bucket"),
                                     value_set=value_set))

    return bands_m.map_batches(collision_filter, batch_format="pyarrow")


def _empty_pairs_ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                   "b": pa.array([], pa.int64())}))


def _bucket_pairs_np(bucket: np.ndarray, doc: np.ndarray,
                     max_bucket: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized within-bucket all-pairs: dedup (bucket, doc) rows, drop
    segments outside [2, max_bucket] distinct docs, then the
    ``_segment_all_pairs`` index kernel emits (a < b) doc-id pairs — no
    per-bucket Python. Rows of one bucket must all be present (the caller
    co-locates them)."""
    from .text_analysis import _segment_all_pairs

    if bucket.size == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    order = np.lexsort((doc, bucket))
    b, d = bucket[order], doc[order]
    # the _collision_rows contract first: bucket ROW count in
    # [2, max_bucket] (idempotent when the caller pre-filtered)
    boundary = np.concatenate(([True], b[1:] != b[:-1]))
    starts = np.flatnonzero(boundary)
    rows = np.diff(np.append(starts, b.size))
    seg_id = np.cumsum(boundary) - 1
    m = ((rows >= 2) & (rows <= max_bucket))[seg_id]
    b, d = b[m], d[m]
    if b.size == 0:
        return (np.empty(0, dtype=np.int64),) * 2
    keep = np.concatenate(([True], (b[1:] != b[:-1]) | (d[1:] != d[:-1])))
    b, d = b[keep], d[keep]
    boundary = np.concatenate(([True], b[1:] != b[:-1]))
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, b.size))
    seg_id = np.cumsum(boundary) - 1
    # distinct-doc gate — oversized segment = degenerate band (e.g.
    # all-empty docs); skip (matches the old per-bucket unique() gate)
    m = ((sizes >= 2) & (sizes <= max_bucket))[seg_id]
    b, d = b[m], d[m]
    a_idx, b_idx = _segment_all_pairs(b)
    return d[a_idx], d[b_idx]


def _pairs_from_buckets(ds_bands, max_bucket: int = 200,
                        driver_limit: int = 1 << 21,
                        n_buckets: int | None = None):
    """band rows -> candidate (a, b) pairs (a < b), possibly duplicated
    across buckets. Under ``driver_limit`` TOTAL band rows the whole
    (bucket, doc_id) table folds on the driver — row-count gate, dedup
    and pair emission are one vectorized index kernel, zero shuffles.
    Above it, the collision Count pre-filter keeps only colliding rows
    (O(candidates), << corpus x bands), one fat-bucket shuffle
    co-locates each true bucket, and the same kernel runs per fat group
    (n_buckets groups, each fully vectorized — never per-true-bucket
    pandas)."""
    import pandas as pd
    import ray.data as rd

    bands_m = ds_bands.materialize()
    if bands_m.count() <= driver_limit:
        tbl = _gather(bands_m.select_columns(["bucket", "doc_id"]))
        a, b = _bucket_pairs_np(
            tbl.column("bucket").to_numpy(zero_copy_only=False),
            tbl.column("doc_id").to_numpy(zero_copy_only=False),
            max_bucket)
        if a.size == 0:
            return _empty_pairs_ds()
        # split the pair feed so downstream per-pair verification
        # parallelizes (a single from_arrow block would serialize it —
        # degenerate few-bit bands can emit 10^6+ candidates)
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        nb = max(1, min(2 * cpus, -(-a.size // 8192)))
        return rd.from_arrow(pa.table({"a": pa.array(a, pa.int64()),
                                       "b": pa.array(b, pa.int64())}),
                             override_num_blocks=nb)

    hot_rows = _collision_rows(bands_m, max_bucket)
    if hot_rows is None:
        return _empty_pairs_ds()
    hot_m = hot_rows.materialize()

    from .window import _default_buckets

    nb = n_buckets or _default_buckets()

    def to_fat(batch: pa.Table) -> pa.Table:
        fat = (_mix64_np(batch.column("bucket")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.int64).view(np.uint64))
               % np.uint64(nb)).astype(np.int64)
        return batch.append_column("fat", pa.array(fat))

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        a, b = _bucket_pairs_np(group["bucket"].to_numpy(np.int64),
                                group["doc_id"].to_numpy(np.int64),
                                max_bucket)
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64")})

    return (hot_m.map_batches(to_fat, batch_format="pyarrow")
            .groupby("fat").map_groups(emit_pairs, batch_format="pandas")
            .select_columns(["a", "b"]))


def _dedup_pairs(cand_ds, agg=None):
    """Distributed (a, b) pair dedup: one VECTORIZED groupby-aggregate over
    pair-sized data (no per-group Python). ``agg`` carries extra aggregate
    columns through (e.g. Min of an identical-per-duplicate score)."""
    aggs = list(agg) if agg else []
    if not aggs:
        from ray.data.aggregate import Count

        aggs = [Count(alias_name="_n")]
        return cand_ds.groupby(["a", "b"]).aggregate(*aggs).drop_columns(["_n"])
    return cand_ds.groupby(["a", "b"]).aggregate(*aggs)


# per-worker-process cache of deserialized broadcast objects (map_batches
# tasks reuse worker processes, so each candidate-id set deserializes once
# per worker, not once per batch); LRU-bounded so back-to-back jobs don't
# leak AND an in-use broadcast is never evicted mid-job by a wholesale
# clear (eviction drops only the least-recently-touched entry)
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 8


def _bcast_put(key, value):
    _BCAST_CACHE[key] = value
    while len(_BCAST_CACHE) > _BCAST_CACHE_MAX:
        _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))  # oldest-inserted/touched


def _bcast_touch(key):
    # dicts preserve insertion order: re-inserting marks as most recent
    _BCAST_CACHE[key] = _BCAST_CACHE.pop(key)
    return _BCAST_CACHE[key]


def _cached_get(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key in _BCAST_CACHE:
        return _bcast_touch(key)
    value = ray.get(ref)
    _bcast_put(key, value)
    return value


def _cached_payload_lookup(ref_keys, block_refs, id_col, payload_col):
    """Assemble (or LRU-fetch) an id->payload dict from broadcast blocks.

    Module-level on purpose: nested closures are cloudpickled BY VALUE with
    a snapshot of their referenced globals, so a closure that both writes
    via a module function and reads _BCAST_CACHE itself would see two
    different dicts in the worker. All cache access lives here, pickled by
    reference, one dict per worker process."""
    import ray

    if ref_keys in _BCAST_CACHE:
        return _bcast_touch(ref_keys)
    table = pa.concat_tables([ray.get(r) for r in block_refs])
    lookup = dict(zip(table.column(id_col).to_pylist(),
                      table.column(payload_col).to_pylist()))
    _bcast_put(ref_keys, lookup)
    return lookup


def _verified_pairs(source_ds, cand_ds, id_col: str, payload_col: str,
                    verify_fn, score_col: str, threshold: float,
                    score_type=pa.float64(), payload_encoder=None,
                    broadcast_limit: int = 100_000,
                    verify_batch_fn=None):
    """Verify candidate (a, b) pairs against per-id payloads, worker-side.

    1. dedup pairs (vectorized groupby-aggregate), materialize (small);
    2. broadcast the candidate-id set (O(pairs) ids) via ``ray.put``;
    3. semi-join filter ``source_ds`` in ``map_batches`` — only candidate
       rows survive, the corpus itself never leaves the workers;
    4. attach payloads to both pair sides:
       - <= ``broadcast_limit`` candidate ids: broadcast the (small)
         filtered payload BLOCKS by ObjectRef (never copied through the
         driver) and look both sides up inside one ``map_batches`` over
         the pairs — no shuffle;
       - above the limit: two hash-``join``s (the all-scale path);
    5. per-pair ``verify_fn(payload_a, payload_b)`` in the same stage,
       keep score >= threshold. An optional ``verify_batch_fn(payloads_a,
       payloads_b) -> scores ndarray`` replaces the per-pair loop with
       one vectorized kernel per batch (the embedding-cosine path —
       degenerate few-bit bands can emit 10^6+ candidates).

    Returns the (small) verified pa.Table sorted by (a, b).
    """
    import pyarrow.compute as pc
    import ray

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      score_col: pa.array([], score_type)})
    # raw candidates (duplicates across buckets retained): the broadcast
    # path verifies them redundantly (bounded by the band count) and
    # dedups the SMALL final result instead of paying a pair-dedup shuffle;
    # the join path dedups first so the hash join doesn't multiply rows
    cand = cand_ds.materialize()
    if cand.count() == 0:
        return empty
    # distinct candidate ids: when 2 x pairs already fits the broadcast
    # guard, the pair table is driver-held anyway — one pc.unique, no
    # shuffle. Otherwise a groupby-distinct DATASET over the pairs-sized
    # data (Dataset.unique's set-aggregate chokes on many tiny blocks);
    # only its COUNT reaches the driver, so the path choice never
    # materializes an O(pairs) Python set above the guard.
    ids_ds, need_list = None, None
    if 2 * cand.count() <= broadcast_limit:
        tbl = _gather(cand)
        need_list = sorted(pc.unique(pa.chunked_array(
            [tbl.column("a"), tbl.column("b")])).to_pylist())
        n_need = len(need_list)
    else:
        from ray.data.aggregate import Count

        def ids_of(batch: pa.Table) -> pa.Table:
            return pa.concat_tables([pa.table({id_col: batch.column("a")}),
                                     pa.table({id_col: batch.column("b")})])

        ids_ds = (cand.map_batches(ids_of, batch_format="pyarrow")
                  .groupby(id_col).aggregate(Count(alias_name="_n"))
                  .select_columns([id_col]).materialize())
        n_need = ids_ds.count()

    def encode_payloads(batch: pa.Table) -> pa.Table:
        kept = batch.select([id_col, payload_col])
        if payload_encoder is not None:
            # Arrow's hash join rejects nested non-key fields (list<float>
            # embeddings) — carry them as binary instead
            enc = pa.array([payload_encoder(v) for v in
                            kept.column(payload_col).to_pylist()],
                           pa.binary())
            kept = kept.set_column(1, payload_col, enc)
        return kept

    def _emit(ids_a, ids_b, pay_a, pay_b) -> pa.Table:
        if verify_batch_fn is not None and ids_a:
            scores = np.asarray(verify_batch_fn(pay_a, pay_b))
            keep = scores >= threshold
            ia = np.asarray(ids_a, np.int64)[keep]
            ib = np.asarray(ids_b, np.int64)[keep]
            return pa.table({"a": pa.array(ia, pa.int64()),
                             "b": pa.array(ib, pa.int64()),
                             score_col: pa.array(scores[keep])
                             .cast(score_type)})
        out_a, out_b, out_s = [], [], []
        for a, b, qa, qb in zip(ids_a, ids_b, pay_a, pay_b):
            s = verify_fn(qa, qb)
            if s >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_s.append(s)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         score_col: pa.array(out_s, score_type)})

    def emit_verified(batch: pa.Table, lookup) -> pa.Table:
        ids_a = batch.column("a").to_pylist()
        ids_b = batch.column("b").to_pylist()
        return _emit(ids_a, ids_b,
                     [lookup(a) for a in ids_a],
                     [lookup(b) for b in ids_b])

    if n_need <= broadcast_limit:
        # broadcast path: pull the (guard-bounded) id list driver-side,
        # is_in-filter the corpus MAP-SIDE (no corpus shuffle); payload
        # blocks stay in the object store and each worker assembles the
        # id->payload dict once (cached on the ref key)
        if need_list is None:
            need_list = []
            for b in ids_ds.iter_batches(batch_size=65536,
                                         batch_format="pyarrow"):
                need_list.extend(b.column(id_col).to_pylist())
            need_list = sorted(need_list)
        need_ref = ray.put(pa.array(need_list))

        def semi_join_filter(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(id_col),
                            value_set=_cached_get(need_ref))
            return encode_payloads(batch.filter(mask))

        cand_payloads = source_ds.map_batches(semi_join_filter,
                                              batch_format="pyarrow")
        block_refs = cand_payloads.materialize().to_arrow_refs()
        ref_keys = tuple(r.hex() for r in block_refs)

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            lookup = _cached_payload_lookup(ref_keys, block_refs,
                                            id_col, payload_col)
            return emit_verified(batch, lookup.__getitem__)

        verified = cand.map_batches(verify_broadcast, batch_format="pyarrow")
    else:
        cand = _dedup_pairs(cand).materialize()
        from ..util import join_parts

        n_parts = join_parts(16)
        # above the guard an is_in value set would not fit a worker either:
        # semi-join the corpus against the DISTRIBUTED id set instead (one
        # slim hash join — ids and encoded payloads shuffle, never the
        # driver); materialized so both pair sides reuse one corpus scan
        cand_payloads = (source_ds
                         .map_batches(encode_payloads,
                                      batch_format="pyarrow")
                         .join(ids_ds, "inner", n_parts, on=(id_col,))
                         .materialize())
        side_a = cand_payloads.map_batches(
            lambda b: b.rename_columns(["a", "payload_a"]),
            batch_format="pyarrow")
        side_b = cand_payloads.map_batches(
            lambda b: b.rename_columns(["b", "payload_b"]),
            batch_format="pyarrow")
        joined = cand.join(side_a, "inner", n_parts, on=("a",)).join(
            side_b, "inner", n_parts, on=("b",))

        def verify_joined(batch: pa.Table) -> pa.Table:
            return _emit(batch.column("a").to_pylist(),
                         batch.column("b").to_pylist(),
                         batch.column("payload_a").to_pylist(),
                         batch.column("payload_b").to_pylist())

        verified = joined.map_batches(verify_joined, batch_format="pyarrow")

    res = verified.to_pandas()
    if len(res) == 0:
        return empty
    res = (res.drop_duplicates(["a", "b"])
           .sort_values(["a", "b"]).reset_index(drop=True))
    return pa.table({"a": pa.array(res["a"], pa.int64()),
                     "b": pa.array(res["b"], pa.int64()),
                     score_col: pa.array(res[score_col], score_type)})


def minhash_lsh_pairs(ds, threshold: float = 0.5, num_perm: int = 64,
                      bands: int = 16, k: int = 3,
                      broadcast_limit: int = 100_000):
    """documents Dataset -> pa.Table (a, b, jaccard) of verified near-dup
    pairs with exact Jaccard >= threshold. Candidate generation AND
    verification are distributed (see ``_verified_pairs``)."""
    band_ds = ds.map_batches(
        lambda b: minhash_bands_batch(b, num_perm, bands, k),
        batch_format="pyarrow",
    )
    cand = _pairs_from_buckets(band_ds)
    return _verified_pairs(
        ds, cand, id_col="doc_id", payload_col="text",
        verify_fn=lambda ta, tb: jaccard(ta, tb, k),
        score_col="jaccard", threshold=threshold,
        broadcast_limit=broadcast_limit)


# ------------------------------------------------- one-permutation hashing

_OPH_OFFSET = np.uint64(0x9E3779B97F4A7C15)


def oph_signature(shingles: np.ndarray, nbins: int = 32) -> np.ndarray:
    """One-permutation MinHash signature (Li, Owen & Zhang 2012): ONE
    hash pass bins the shingle hashes by ``s % nbins`` and keeps the min
    per bin — k times cheaper than k independent permutations. Empty bins
    densify by borrowing the cyclically nearest filled bin to the RIGHT,
    offset by ``t * GOLDEN`` for rotation distance t (Shrivastava & Li
    2014 rotation scheme — the offset keeps borrowed values from
    colliding across distances). Docs with no shingles keep the all-zeros
    signature (minhash_signature parity)."""
    sig = np.zeros(nbins, dtype=np.uint64)
    if shingles.size == 0:
        return sig
    bins = (shingles % np.uint64(nbins)).astype(np.int64)
    base = np.zeros(nbins, dtype=np.uint64)
    filled = np.zeros(nbins, dtype=bool)
    order = np.lexsort((shingles, bins))
    b_s, s_s = bins[order], shingles[order]
    first = np.concatenate(([True], b_s[1:] != b_s[:-1]))
    base[b_s[first]] = s_s[first]
    filled[b_s[first]] = True
    sig[filled] = base[filled]
    done = filled.copy()
    idx = np.arange(nbins)
    for t in range(1, nbins):
        if done.all():
            break
        src = (idx + t) % nbins
        take = ~done & filled[src]
        if take.any():
            with np.errstate(over="ignore"):
                sig[take] = base[src[take]] + np.uint64(t) * _OPH_OFFSET
            done[take] = True
    return sig


def oph_bands_batch(batch: pa.Table, nbins: int = 32, bands: int = 8,
                    k: int = 3, text_col: str = "text") -> pa.Table:
    """documents batch -> exploded (doc_id, band_id, band_key, bucket)
    rows over OPH signatures — same band-key recipe as
    minhash_bands_batch (sum of mix64 over the band slice mod 2^64)."""
    rows_per_band = nbins // bands
    doc_ids = batch.column("doc_id")
    texts = batch.column(text_col).to_pylist()
    D = len(texts)
    sigs = np.stack([oph_signature(shingle_hashes(t, k), nbins)
                     for t in texts]) if D else np.zeros((0, nbins),
                                                         np.uint64)
    keys = _mix64_np(sigs.reshape(-1)).reshape(
        D, bands, rows_per_band).sum(axis=2, dtype=np.uint64)
    idx = np.repeat(np.arange(D, dtype=np.int64), bands)
    t = pa.table({
        "doc_id": doc_ids.take(pa.array(idx)),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), D)),
        "band_key": pa.array(keys.reshape(-1).view(np.int64)),
    })
    return _append_bucket(t)


def oph_pairs(ds, nbins: int = 32, bands: int = 8, k: int = 3,
              min_matched: int | None = None,
              broadcast_limit: int = 100_000) -> pa.Table:
    """documents Dataset -> pa.Table (a, b, matched) of near-dup pairs
    whose densified OPH signatures agree on >= ``min_matched`` bins
    (default nbins/2 — est. Jaccard >= 0.5). Candidates come from band
    collisions (the minhash LSH machinery verbatim); verification
    recomputes both signatures worker-side and counts equal bins, so the
    reported score is a signature property, not a text re-scan."""
    if min_matched is None:
        min_matched = (nbins + 1) // 2
    band_ds = ds.map_batches(
        lambda b: oph_bands_batch(b, nbins, bands, k),
        batch_format="pyarrow")
    cand = _pairs_from_buckets(band_ds)

    def matched_bins(ta: str, tb: str) -> int:
        sa = oph_signature(shingle_hashes(ta, k), nbins)
        sb = oph_signature(shingle_hashes(tb, k), nbins)
        return int((sa == sb).sum())

    return _verified_pairs(
        ds, cand, id_col="doc_id", payload_col="text",
        verify_fn=matched_bins, score_col="matched",
        threshold=min_matched, score_type=pa.int64(),
        broadcast_limit=broadcast_limit)


# ---------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    th = token_hashes(text)
    if th.size == 0:
        return 0
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    # signed arithmetic: uint64 would wrap when negative votes dominate
    counts = bits.sum(axis=0).astype(np.int64) * 2 - np.int64(th.size)
    sig = np.uint64(0)
    for i in np.nonzero(counts > 0)[0]:
        sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  max_chunk_tokens: int = 1 << 16) -> pa.Table:
    """Batch-vectorized simhash: token hashes concatenate with offsets,
    bit votes tally per doc via np.add.reduceat over the (T, 64) bit
    matrix, chunked along docs so the matrix stays <= ~64 *
    max_chunk_tokens * 8 bytes. Bit-identical to simhash64 per doc
    (pinned by test)."""
    texts = batch.column(text_col).to_pylist()
    D = len(texts)
    th = [token_hashes(t) for t in texts]
    lens = np.fromiter((a.size for a in th), count=D, dtype=np.int64)
    sigs = np.zeros(D, dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    nonempty = np.flatnonzero(lens)
    start = 0
    while start < nonempty.size:
        stop, total = start, 0
        while stop < nonempty.size and (
                stop == start or total + lens[nonempty[stop]] <= max_chunk_tokens):
            total += lens[nonempty[stop]]
            stop += 1
        idx = nonempty[start:stop]
        concat = np.concatenate([th[i] for i in idx])
        offsets = np.concatenate(([0], np.cumsum(lens[idx])[:-1]))
        bits = ((concat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        counts = np.add.reduceat(bits, offsets, axis=0)  # (chunk_docs, 64)
        votes = counts * 2 - lens[idx][:, None]
        sigs[idx] = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64)
        start = stop
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(sigs, pa.uint64())})


def _band_explode(ids: pa.ChunkedArray | pa.Array,
                  sigs: np.ndarray) -> pa.Table:
    """(ids, u64 sigs) -> bucketed (doc_id, band_id, band_key, simhash)
    rows, 4x16-bit pigeonhole layout — THE one place the band geometry
    lives (text simhash and media phash must stay bit-identical)."""
    sigs = sigs.astype(np.uint64)
    D = len(sigs)
    idx = np.repeat(np.arange(D, dtype=np.int64), 4)
    band_shift = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), D)
    rep = np.repeat(sigs, 4)
    return _append_bucket(
        pa.table({"doc_id": ids.take(pa.array(idx)),
                  "band_id": pa.array(np.tile(
                      np.arange(4, dtype=np.int32), D)),
                  "band_key": pa.array(
                      ((rep >> band_shift) & np.uint64(0xFFFF)
                       ).astype(np.int64)),
                  "simhash": pa.array(rep, pa.uint64())}))


def simhash_bands_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, band_id, band_key, simhash) rows,
    4x16-bit bands.

    The 8-byte signature rides along with each band row so buckets can
    verify Hamming distance in-place — no second corpus pass needed."""
    sig_tbl = simhash_batch(batch, text_col)
    return _band_explode(sig_tbl.column("doc_id"),
                         sig_tbl.column("simhash")
                         .to_numpy(zero_copy_only=False))


def simhash_pairs(ds, max_hamming: int = 3, max_bucket: int = 200):
    """Near-dup pairs within Hamming distance <= max_hamming via 4x16-bit
    band blocking (pigeonhole: <=3 differing bits leave >=1 band equal).

    Fully distributed: band explode (signatures ride along) -> collision
    pre-filter -> bucket ``map_groups`` verifies Hamming in-place ->
    vectorized pair-dedup aggregate. The driver only collects the final
    (small) pair table. The generic blocking/verify machinery lives in
    ``hamming_pairs_from_sigs`` (shared with media perceptual hashes);
    this wrapper just computes the text simhash signatures."""
    band_ds = ds.map_batches(simhash_bands_batch, batch_format="pyarrow")
    return _hamming_pairs_from_bands(band_ds, max_hamming, max_bucket)


def hamming_pairs_from_sigs(sig_ds, max_hamming: int = 3,
                            max_bucket: int = 200):
    """Generic 64-bit-signature near-dup pairs: Dataset of (doc_id,
    simhash uint64) -> verified pairs within ``max_hamming`` via the
    same 4x16-bit pigeonhole blocking simhash_pairs uses — any
    signature family (text simhash, image perceptual hash, audio
    fingerprint) routes here once it is a u64 per item."""

    def bands(batch: pa.Table) -> pa.Table:
        return _band_explode(batch.column("doc_id"),
                             batch.column("simhash")
                             .to_numpy(zero_copy_only=False))

    band_ds = sig_ds.map_batches(bands, batch_format="pyarrow")
    return _hamming_pairs_from_bands(band_ds, max_hamming, max_bucket)


def _sig_bucket_pairs_np(bucket: np.ndarray, doc: np.ndarray,
                         sig: np.ndarray, max_bucket: int,
                         max_hamming: int):
    """Vectorized in-bucket Hamming verify: the ``_bucket_pairs_np``
    gates (raw row count then distinct docs, both [2, max_bucket]) +
    ``_segment_all_pairs`` emission, with the 8-byte signature carried
    through so the pair distances are ONE SWAR popcount over the xor —
    no per-bucket Python, no dict. A doc's signature is globally unique
    so carrying the first row per (bucket, doc) is exact."""
    from .similarity import _popcount64
    from .text_analysis import _segment_all_pairs

    e = (np.empty(0, dtype=np.int64),) * 3
    if bucket.size == 0:
        return e
    order = np.lexsort((doc, bucket))
    b, d, s = bucket[order], doc[order], sig[order]
    boundary = np.concatenate(([True], b[1:] != b[:-1]))
    starts = np.flatnonzero(boundary)
    rows = np.diff(np.append(starts, b.size))
    seg_id = np.cumsum(boundary) - 1
    m = ((rows >= 2) & (rows <= max_bucket))[seg_id]
    b, d, s = b[m], d[m], s[m]
    if b.size == 0:
        return e
    keep = np.concatenate(([True], (b[1:] != b[:-1]) | (d[1:] != d[:-1])))
    b, d, s = b[keep], d[keep], s[keep]
    boundary = np.concatenate(([True], b[1:] != b[:-1]))
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, b.size))
    seg_id = np.cumsum(boundary) - 1
    m = ((sizes >= 2) & (sizes <= max_bucket))[seg_id]
    b, d, s = b[m], d[m], s[m]
    a_idx, b_idx = _segment_all_pairs(b)
    h = _popcount64(s[a_idx] ^ s[b_idx]).astype(np.int64)
    keep = h <= max_hamming
    return d[a_idx][keep], d[b_idx][keep], h[keep]


def _hamming_pairs_from_bands(band_ds, max_hamming: int, max_bucket: int,
                              driver_limit: int = 1 << 21):
    import pandas as pd
    from ray.data.aggregate import Min

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int32())})

    def finish(df: "pd.DataFrame") -> pa.Table:
        if len(df) == 0:
            return empty
        df = df.sort_values(["a", "b"]).reset_index(drop=True)
        return pa.table({"a": pa.array(df["a"], pa.int64()),
                         "b": pa.array(df["b"], pa.int64()),
                         "hamming": pa.array(df["hamming"], pa.int32())})

    bands_m = band_ds.materialize()
    if bands_m.count() <= driver_limit:
        # driver fold: one vectorized kernel over the whole band table,
        # pair dedup (min hamming — identical wherever a pair recurs)
        # in pandas; zero shuffles
        tbl = _gather(bands_m.select_columns(["bucket", "doc_id", "simhash"]))
        a, b, h = _sig_bucket_pairs_np(
            tbl.column("bucket").to_numpy(zero_copy_only=False),
            tbl.column("doc_id").to_numpy(zero_copy_only=False),
            tbl.column("simhash").to_numpy(zero_copy_only=False)
            .astype(np.uint64),
            max_bucket, max_hamming)
        if a.size == 0:
            return empty
        df = (pd.DataFrame({"a": a, "b": b, "hamming": h})
              .groupby(["a", "b"], as_index=False)["hamming"].min())
        return finish(df)

    hot_rows = _collision_rows(bands_m, max_bucket)
    if hot_rows is None:
        return empty
    from .window import _default_buckets

    nb = _default_buckets()

    def to_fat(batch: pa.Table) -> pa.Table:
        fat = (_mix64_np(batch.column("bucket")
                         .to_numpy(zero_copy_only=False)
                         .astype(np.int64).view(np.uint64))
               % np.uint64(nb)).astype(np.int64)
        return batch.append_column("fat", pa.array(fat))

    def emit_verified(group: pd.DataFrame) -> pd.DataFrame:
        a, b, h = _sig_bucket_pairs_np(
            group["bucket"].to_numpy(np.int64),
            group["doc_id"].to_numpy(np.int64),
            group["simhash"].to_numpy().astype(np.uint64),
            max_bucket, max_hamming)
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64"),
                             "hamming": pd.Series(h, dtype="int64")})

    pairs = (hot_rows.map_batches(to_fat, batch_format="pyarrow")
             .groupby("fat").map_groups(emit_verified,
                                        batch_format="pandas"))
    # dedup (a Hamming distance is identical wherever the pair recurs)
    res = _dedup_pairs(pairs, agg=[Min("hamming", alias_name="hamming")]
                       ).to_pandas()
    return finish(res)


# ----------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(ds_embeddings, threshold: float = 0.95,
                            num_planes: int = 16, bands: int = 4, seed: int = 7,
                            broadcast_limit: int = 100_000):
    """embeddings Dataset (vec_id, embedding) -> verified cosine>=threshold
    pairs via random-hyperplane LSH bucketing + exact verification."""
    first = ds_embeddings.take_batch(1, batch_format="pyarrow")
    dim = len(first.column("embedding")[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    def sig_batch(batch: pa.Table) -> pa.Table:
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        bits = (emb @ planes.T) > 0  # (n, P)
        rows_per = num_planes // bands
        out_id, out_band, out_key = [], [], []
        ids = batch.column("vec_id").to_pylist()
        for i, vid in enumerate(ids):
            for b in range(bands):
                chunk = bits[i, b * rows_per : (b + 1) * rows_per]
                key = int.from_bytes(np.packbits(chunk, bitorder="little").tobytes(), "little")
                out_id.append(vid)
                out_band.append(b)
                out_key.append(key)
        return _append_bucket(
            pa.table({"doc_id": pa.array(out_id),
                      "band_id": pa.array(out_band, pa.int32()),
                      "band_key": pa.array(out_key, pa.int64())}))

    band_ds = ds_embeddings.map_batches(sig_batch, batch_format="pyarrow")
    cand = _pairs_from_buckets(band_ds, max_bucket=500)

    def encode_vec(v) -> bytes:
        return np.asarray(v, dtype=np.float64).tobytes()

    def cosine(ea: bytes, eb: bytes) -> float:
        va = np.frombuffer(ea, dtype=np.float64)
        vb = np.frombuffer(eb, dtype=np.float64)
        denom = np.linalg.norm(va) * np.linalg.norm(vb)
        return float(va @ vb / denom) if denom else 0.0

    def cosine_batch(pay_a: list, pay_b: list) -> np.ndarray:
        """Row-wise cosine over the whole candidate batch in one numpy
        pass (frombuffer on the joined byte payloads — zero per-pair
        Python). Summation-order drift vs the scalar path is ~1e-16,
        far inside every consumer's threshold margin (>= 3.5e-5)."""
        va = np.frombuffer(b"".join(pay_a), np.float64).reshape(len(pay_a), -1)
        vb = np.frombuffer(b"".join(pay_b), np.float64).reshape(len(pay_b), -1)
        den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
        num = np.einsum("ij,ij->i", va, vb)
        return np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)

    return _verified_pairs(
        ds_embeddings, cand, id_col="vec_id", payload_col="embedding",
        verify_fn=cosine, score_col="cosine", threshold=threshold,
        payload_encoder=encode_vec, broadcast_limit=broadcast_limit,
        verify_batch_fn=cosine_batch)


def embedding_brute_pairs(ds_embeddings, threshold: float = 0.4):
    """EXACT all-pairs cosine >= threshold — the oracle-checkable baseline
    for the LSH near-dup path (SQL: list_cosine_similarity self-join).

    Shape: one streamed pass builds the normalized (N, d) matrix, which is
    broadcast once via ``ray.put``; each worker batch then does ONE blocked
    matmul against it (rows x N) and emits its qualifying (a < b) pairs.
    The matrix is O(N*d) — fine for verification corpora; at web scale the
    LSH variant (embedding_neardup_pairs) is the path, with this as the
    recall oracle on samples."""
    import ray

    ids: list[int] = []
    vecs: list = []
    for batch in ds_embeddings.iter_batches(batch_size=8192,
                                            batch_format="pyarrow"):
        ids.extend(batch.column("vec_id").to_pylist())
        vecs.extend(batch.column("embedding").to_pylist())
    if not ids:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    mat = np.asarray(vecs, dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    all_ids = np.asarray(ids, dtype=np.int64)
    ref = ray.put((all_ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        bid, bmat = _cached_get(ref)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        v = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
        sims = v @ bmat.T
        ii, jj = np.nonzero(sims >= threshold)
        a = vids[ii]
        b = bid[jj]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})

    res = ds_embeddings.map_batches(block, batch_format="pyarrow").to_pandas()
    res = res.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table({"a": pa.array(res["a"], pa.int64()),
                     "b": pa.array(res["b"], pa.int64())})


# ------------------------------------------------------ exact n-gram jaccard



def _word_ngrams(text: str, n: int) -> set:
    """DISTINCT word n-grams of a text — THE pinned tokenization kernel
    shared by ngram_jaccard_pairs / decontaminate (``str.split()`` ==
    DuckDB ``list_filter(regexp_split_to_array(text,'\\s+'), x->x<>'')``;
    grams joined with a single space). Every SQL oracle that replays
    word grams assumes exactly this; change it in ONE place only."""
    words = text.split()
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def _segment_pair_counts(keys: np.ndarray, docs: np.ndarray,
                         extras: dict | None = None,
                         weights: np.ndarray | None = None) -> dict:
    """THE shared bucket pair kernel (ngram_jaccard_pairs + winnow_pairs):
    rows pre-sorted by (keys, docs) -> per-DISTINCT (a, b) partial
    co-occurrence counts via pure index arithmetic (np.repeat + within-row
    arange + boundary counting), no per-segment Python. ``extras`` maps
    column name -> per-row array; each comes back as ``<name>_a`` /
    ``<name>_b`` taken from the pair's two source rows. ``weights`` (a
    per-row int64 array, constant within a key segment — e.g. a term's
    squared idf) adds a ``wsum`` output: the sum over the pair's shared
    keys of that weight — the dot-product partial tfidf_cosine_pairs
    rides on. Empty- and no-pair-safe (returns zero-length int64
    arrays)."""
    extras = extras or {}

    def _empty() -> dict:
        out = {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
               "cnt": np.empty(0, np.int64)}
        if weights is not None:
            out["wsum"] = np.empty(0, np.int64)
        for name, col in extras.items():
            out[name + "_a"] = np.empty(0, col.dtype)
            out[name + "_b"] = np.empty(0, col.dtype)
        return out

    m = keys.size
    if m == 0:
        return _empty()
    boundary = np.concatenate(([True], keys[1:] != keys[:-1]))
    seg_id = np.cumsum(boundary) - 1
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, m))
    local = np.arange(m) - starts[seg_id]
    counts = sizes[seg_id] - 1 - local  # pairs where this row is 'a'
    total = int(counts.sum())
    if total == 0:  # all segments are singletons
        return _empty()
    left = np.repeat(np.arange(m), counts)
    offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                        counts) + 1
    right = left + offs
    a, b = docs[left], docs[right]
    po = np.lexsort((b, a))
    a, b = a[po], b[po]
    pb = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    ps = np.flatnonzero(pb)
    out = {"a": a[ps].astype(np.int64), "b": b[ps].astype(np.int64),
           "cnt": np.diff(np.append(ps, a.size))}
    if weights is not None:
        pseg = np.cumsum(pb) - 1
        wsum = np.zeros(ps.size, dtype=np.int64)
        # the weight is the KEY's (identical on both rows of the pair)
        np.add.at(wsum, pseg, weights[left][po])
        out["wsum"] = wsum
    for name, col in extras.items():
        picked = col[left][po][ps]
        out[name + "_a"] = picked
        out[name + "_b"] = col[right][po][ps]
    return out


def ngram_jaccard_pairs(ds, threshold_pct: int = 25, n: int = 2,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_df: int | None = None,
                        mode: str = "jaccard"):
    """EXACT word n-gram Jaccard near-dup pairs via a distributed inverted
    index — the SQL-oracle-checkable counterpart of the MinHash estimate.
    Admission is the integer threshold test ``inter * 100 >= pct * union``
    (no float boundary risk on either engine).

    Stop-gram cap: grams with document frequency > ``max_df`` are dropped
    from the inverted index before any pair arithmetic (same cap shape as
    ``winnow_pairs``) — a universal bigram would otherwise emit O(df^2)
    partial rows and make one bucket quadratic. Semantics with the cap:
    ``inter`` counts only shared grams with df <= max_df while ``na``/
    ``nb`` stay the FULL per-doc distinct-gram totals, so the admitted
    Jaccard is a lower bound of the uncapped value (capped grams can only
    lose pairs, never invent them) and the SQL oracle replays the exact
    same filter. The DEFAULT is ``max_df=None`` — exact mode, preserving
    this function's contract as the exact SQL-checkable counterpart of
    MinHash; pass a cap for any corpus that could contain a stop-gram.

    Scale note: even capped, exact inverted-index Jaccard emits O(df^2)
    rows per gram — use it for verification corpora / samples;
    MinHash+LSH is the web-scale estimator (its candidate path caps
    degenerate buckets).

    Shuffle shape (reworked after measurement — the original per-gram
    ``map_groups`` + two-key pair groupby + two hash joins ran PAST 550 s
    at sf0.1): grams hash into ~2x-CPUs FAT buckets (a bucket holds EVERY
    row of its grams — segments compare the gram STRINGS, the hash only
    routes, so hash collisions cannot merge distinct grams); each bucket
    emits partial pair counts with pure index arithmetic, carrying the
    per-doc gram totals it learned at explode time; a SECOND pair-hash
    bucket shuffle sums the partials and applies the integer threshold —
    ``inter * 100 >= pct * union`` (``mode="jaccard"``, default) or
    ``inter * 100 >= pct * min(na, nb)`` (``mode="containment"``,
    Broder's asymmetric excerpt-inclusion test) — INSIDE the bucket;
    only qualifying
    pairs ever reach the driver (no sizes join, no O(corpus) broadcast,
    no driver-side 35M-row merge: that merge alone measured ~30 s)."""
    import ray

    import pandas as pd

    from .text_analysis import _explode_distinct_grams

    if mode not in ("jaccard", "containment"):
        raise ValueError(f"unknown mode {mode!r}: "
                         "expected 'jaccard' or 'containment'")

    nb = max(16, min(256,
                     int(ray.cluster_resources().get("CPU", 8)) * 2))

    def explode(batch: pa.Table) -> pa.Table:
        # Arrow-native distinct-gram kernel; bucket id rides from the
        # same pass (dictionary-level FNV), so no second hashing stage
        out = _explode_distinct_grams(batch, id_col, text_col, n)
        return pa.table({
            "doc": out["doc"],
            "gram": out["gram"],
            "ng": pa.array(out["n_grams"], pa.int64()),
            "_kb": pa.array((out["hash"] % np.uint64(nb)).astype(np.int64),
                            pa.int64()),
            # full gram hash rides along so the driver can estimate the
            # pair-partial volume without a string sort
            "_gh": pa.array(out["hash"].view(np.int64), pa.int64())})

    def emit_pair_counts_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["gram", "doc"], kind="mergesort")
        gram = g["gram"].to_numpy()
        doc = g["doc"].to_numpy()
        ng = g["ng"].to_numpy(dtype=np.int64)
        if max_df is not None and gram.size:
            # global df is computable in-bucket (a bucket holds EVERY row
            # of its grams); stop-grams drop before any pair arithmetic
            boundary = np.concatenate(([True], gram[1:] != gram[:-1]))
            seg_id = np.cumsum(boundary) - 1
            starts = np.flatnonzero(boundary)
            sizes = np.diff(np.append(starts, gram.size))
            keep = sizes[seg_id] <= max_df
            gram, doc, ng = gram[keep], doc[keep], ng[keep]
        pc = _segment_pair_counts(gram, doc, extras={"ng": ng})
        return pd.DataFrame({"a": pc["a"], "b": pc["b"], "inter": pc["cnt"],
                             "na": pc["ng_a"], "nb": pc["ng_b"]})

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64).view(np.uint64)
        b = np.asarray(batch.column("b"), dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            pk = _mix64_np(a) + _mix64_np(b) * np.uint64(0x9E3779B97F4A7C15)
        return batch.append_column(
            "_pb", pa.array((pk % np.uint64(nb)).astype(np.int64), pa.int64()))

    def finish_bucket(group: pd.DataFrame) -> pd.DataFrame:
        a = group["a"].to_numpy(dtype=np.int64)
        if a.size == 0:  # driver fold may hand an empty pair table
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        b = group["b"].to_numpy(dtype=np.int64)
        iv = group["inter"].to_numpy(dtype=np.int64)
        na = group["na"].to_numpy(dtype=np.int64)
        nbg = group["nb"].to_numpy(dtype=np.int64)
        po = np.lexsort((b, a))
        a, b, iv, na, nbg = a[po], b[po], iv[po], na[po], nbg[po]
        pb = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        ps = np.flatnonzero(pb)
        seg_id = np.cumsum(pb) - 1
        tot = np.zeros(ps.size, dtype=np.int64)
        np.add.at(tot, seg_id, iv)
        a, b, na, nbg = a[ps], b[ps], na[ps], nbg[ps]
        if mode == "containment":
            # Broder containment of the smaller gram set in the larger:
            # |A n B| / min(|A|, |B|) -- catches quote/excerpt inclusion
            # Jaccard dilutes away when the two sizes are lopsided
            denom = np.minimum(na, nbg)
        else:
            denom = na + nbg - tot  # union
        keep = tot * 100 >= threshold_pct * denom
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()
    fold = None
    if exploded.count() <= (1 << 21):
        g = _gather(exploded).to_pandas()
        # pair-partial volume estimate (sum df^2 per gram, by int hash —
        # no string sort): the driver fold serializes the pair kernel,
        # so it must only run when that work is small; heavy-df corpora
        # (e.g. no max_df) keep the 64-way bucket parallelism
        _, c = np.unique(g["_gh"].to_numpy(np.int64), return_counts=True)
        if int((c * (c - 1) // 2).sum()) <= (1 << 22):
            # driver fold: the whole distinct-gram table runs through
            # the SAME two bucket kernels once (all rows of every gram
            # present, so partials are already final) — zero shuffles
            fold = finish_bucket(emit_pair_counts_bucket(g))
    if fold is not None:
        res = fold
    else:
        qual = (exploded
                .groupby("_kb").map_groups(emit_pair_counts_bucket,
                                           batch_format="pandas")
                .map_batches(add_pair_bucket, batch_format="pyarrow")
                .groupby("_pb").map_groups(finish_bucket,
                                           batch_format="pandas"))
        res = qual.to_pandas()
    if len(res) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    res = res.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table({"a": pa.array(res["a"], pa.int64()),
                     "b": pa.array(res["b"], pa.int64())})


# ----------------------------------------------------- winnowing (MOSS)

def winnow_fingerprints(text: str, k: int = 3, w: int = 4) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS kernel): ordered k-token gram hashes, then per
    window of ``w`` consecutive grams select the RIGHTMOST minimum; the
    distinct selected hashes are the document's fingerprints. Guarantee:
    any shared token run of >= w+k-1 tokens shares a fingerprint.

    Vectorized: Horner gram hashes (same arithmetic as shingle_hashes,
    order kept), sliding_window_view min + rightmost argmin. Docs with
    fewer than ``w`` grams winnow a single window over all grams;
    token-less docs have no fingerprints."""
    th = token_hashes(text)
    if th.size == 0:
        return np.empty(0, dtype=np.uint64)
    if th.size < k:
        grams = th
    else:
        with np.errstate(over="ignore"):
            acc = th[: th.size - k + 1].copy()
            for i in range(1, k):
                acc = acc * np.uint64(1099511628211) + th[i: th.size - k + 1 + i]
        grams = acc
    if grams.size <= w:
        flipped = grams[::-1]
        return np.unique(grams[grams.size - 1 - int(np.argmin(flipped))][None])
    win = np.lib.stride_tricks.sliding_window_view(grams, w)
    # rightmost argmin = w-1 - argmin over the reversed window
    idx = w - 1 - np.argmin(win[:, ::-1], axis=1)
    pos = np.unique(np.arange(win.shape[0], dtype=np.int64) + idx)
    return np.unique(grams[pos])


def winnow_pairs(ds, k: int = 3, w: int = 4, min_shared: int = 2,
                 max_bucket: int = 200, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    the near-duplicate/plagiarism detector built on local fingerprint
    sampling instead of MinHash's global permutations.

    Scale shape: fingerprints are a ~2/(w+1) sample of the grams, so the
    exploded index is a fraction of the ngram_jaccard one; grams with
    document frequency > ``max_bucket`` are dropped as stop-grams (the
    standard winnowing-index cap — replicated by the SQL oracle). ONE
    shuffle total: fingerprints hash into ~2x-CPUs FAT buckets (a bucket
    holds EVERY row of its fingerprints, so the df cap is globally
    correct inside the bucket — no separate Count shuffle), and the
    bucket kernel computes df, drops singletons/stop-grams and emits
    partial pair counts with pure index arithmetic (np.repeat +
    within-row arange). Per-fp map_groups measured 74 s at sf0.1
    (~300k singleton groups of per-group pandas overhead); a distributed
    two-key groupby over the raw pair rows measured another 66 s — both
    shapes are avoided by construction."""
    import pandas as pd
    import ray

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_fp = [], []
        for d, t in zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            fps = winnow_fingerprints(t, k, w)
            out_id.extend([d] * fps.size)
            out_fp.extend(fps.view(np.int64).tolist())
        return pa.table({"doc": pa.array(out_id),
                         "fp": pa.array(out_fp, pa.int64())})

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "shared": pa.array([], pa.int64())})
    nb = max(16, min(256,
                     int(ray.cluster_resources().get("CPU", 8)) * 2))

    def add_bucket(batch: pa.Table) -> pa.Table:
        f = batch.column("fp")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        kb = (_mix64_np(np.asarray(f, dtype=np.int64).view(np.uint64))
              % np.uint64(nb)).astype(np.int64)
        return batch.append_column("_kb", pa.array(kb, pa.int64()))

    def emit_pair_counts_bucket(group: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((group["doc"].to_numpy(), group["fp"].to_numpy()))
        fp = group["fp"].to_numpy()[order]
        doc = group["doc"].to_numpy()[order]
        boundary = np.concatenate(([True], fp[1:] != fp[:-1]))
        seg_id = np.cumsum(boundary) - 1
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, fp.size))
        # df cap INSIDE the bucket (all rows of an fp share its bucket):
        # singletons and stop-grams drop before any pair arithmetic
        keep = (sizes[seg_id] >= 2) & (sizes[seg_id] <= max_bucket)
        pc = _segment_pair_counts(fp[keep], doc[keep])
        return pd.DataFrame({"a": pc["a"], "b": pc["b"],
                             "shared": pc["cnt"]})

    partials = (ds.map_batches(explode, batch_format="pyarrow")
                .map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_kb").map_groups(emit_pair_counts_bucket,
                                           batch_format="pandas"))
    # final merge: one Arrow group_by over the pair-bounded partials (a
    # pair appears in at most #buckets partial rows; pairs << corpus by
    # the collision cap) — milliseconds where Ray's two-key sort-agg is
    # pathological at this shape
    pbatches = list(partials.iter_batches(batch_size=1 << 20,
                                          batch_format="pyarrow"))
    if not pbatches:  # no collisions anywhere -> Ray yields zero batches
        return empty
    merged = pa.concat_tables(pbatches) \
        .group_by(["a", "b"]).aggregate([("shared", "sum")]) \
        .rename_columns(["a", "b", "shared"])
    res = merged.to_pandas()
    res = res[res["shared"] >= min_shared].sort_values(["a", "b"])
    if len(res) == 0:
        return empty
    return pa.table({"a": pa.array(res["a"], pa.int64()),
                     "b": pa.array(res["b"], pa.int64()),
                     "shared": pa.array(res["shared"].astype("int64"),
                                        pa.int64())})


# ------------------------------------------------- benchmark decontamination

def decontaminate(ds, benchmark_ds, n: int = 5, min_shared: int = 1,
                  id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Training-data decontamination: flag corpus docs sharing >=
    ``min_shared`` DISTINCT word n-grams with ANY benchmark document.
    Returns ``(doc_id, n_shared)`` sorted by doc_id — the standard
    pre-training hygiene step (exact n-gram overlap against held-out
    eval sets, the GPT-3/PaLM-style 'dirty document' test).

    Scale shape: the benchmark side is SMALL at every corpus scale
    (eval suites are 10^3-10^5 docs), so its distinct-gram set is built
    once and broadcast via ``ray.put``; the corpus streams through ONE
    ``map_batches`` membership pass — no shuffle, no join, no second
    corpus scan. Tokenization matches ``ngram_jaccard_pairs`` (''.split
    == DuckDB ``regexp_split_to_array(text,'\\s+')`` sans empties), so
    the op is exactly SQL-oracle-checkable."""
    import pyarrow.compute as pc
    import ray

    from .text_analysis import _explode_distinct_grams, _ws_explode
    from .text_analysis import _join_word_grams

    # benchmark distinct-gram set, built with the same Arrow kernel and
    # broadcast as ONE Arrow StringArray (zero-copy via plasma)
    bench_parts: list[pa.Array] = []
    for b in benchmark_ds.iter_batches(batch_size=4096,
                                       batch_format="pyarrow"):
        par, toks = _ws_explode(b.column(text_col))
        _par, grams = _join_word_grams(par, toks, n)
        if len(grams):
            bench_parts.append(grams.unique())
    bench_arr = (pa.concat_arrays(bench_parts).unique() if bench_parts
                 else pa.array([], pa.string()))
    ref = ray.put(bench_arr)

    def score(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_shared": pa.array([], pa.int64())})
        vs = _cached_get(ref)
        if len(vs) == 0:
            return empty
        out = _explode_distinct_grams(batch, id_col, text_col, n)
        if len(out["gram"]) == 0:
            return empty
        hit = pc.is_in(out["gram"], value_set=vs).to_numpy(
            zero_copy_only=False)
        k = np.bincount(out["parent"][hit], minlength=batch.num_rows)
        keep = np.flatnonzero(k >= min_shared)
        if keep.size == 0:
            return empty
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids.take(pa.array(keep)),
                         "n_shared": pa.array(k[keep], pa.int64())})

    res = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if len(res) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_shared": pa.array([], pa.int64())})
    res = res.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(res["doc_id"], pa.int64()),
                     "n_shared": pa.array(res["n_shared"], pa.int64())})


# ------------------------------------------------- near-dup clustering

def neardup_components(pairs: pa.Table, num_partitions: int = 4,
                       driver_limit: int = 1 << 21) -> pa.Table:
    """Verified near-dup pairs -> ``(doc_id, cluster_rep)`` where
    cluster_rep is the MIN doc id of each connected component — the
    canonicalization step that turns pairwise dedup output into
    "keep one per duplicate cluster".

    Distributed iterative min-label propagation over Datasets: each node
    starts labeled with itself; every round, labels flow across edges
    (hash join) and each node keeps the minimum seen (vectorized groupby
    Min); converged when the label-sum stops decreasing. Round count =
    component diameter — near-dup components are short chains, so a
    handful of rounds even at web scale, and every step is a standard
    shuffle (no driver-side graph). The per-round convergence probe
    (``labels.sum``) scans only the materialized LABELS table —
    O(nodes-in-pairs), not the corpus — and fixpoint detection costs one
    extra (no-change) round by construction. A driver union-find pins
    equivalence in tests."""
    import ray.data as rd
    from ray.data.aggregate import Min

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "cluster_rep": pa.array([], pa.int64())})
    if pairs.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    a = pc.cast(pairs.column("a"), pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(pairs.column("b"), pa.int64()).to_numpy(zero_copy_only=False)

    if pairs.num_rows <= driver_limit:
        # driver fold: the pair table is already driver-held (it IS this
        # function's argument), so min-label propagation with pointer
        # jumping runs as a few vectorized passes — no per-round joins
        nodes_np = np.unique(np.concatenate([a, b]))
        ai = np.searchsorted(nodes_np, a)
        bi = np.searchsorted(nodes_np, b)
        lbl = np.arange(nodes_np.size, dtype=np.int64)
        while True:
            old = lbl.copy()
            m = np.minimum(lbl[ai], lbl[bi])
            np.minimum.at(lbl, ai, m)
            np.minimum.at(lbl, bi, m)
            lbl = np.minimum(lbl, lbl[lbl])  # pointer jumping
            if np.array_equal(lbl, old):
                break
        return pa.table({"doc_id": pa.array(nodes_np, pa.int64()),
                         "cluster_rep": pa.array(nodes_np[lbl],
                                                 pa.int64())})

    sym = pa.table({"x": np.concatenate([a, b]),
                    "y": np.concatenate([b, a])})
    edges = rd.from_arrow(sym)
    nodes = pa.array(np.unique(np.concatenate([a, b])), pa.int64())
    labels = rd.from_arrow(pa.table({"y": nodes, "label": nodes})
                           ).materialize()
    prev = int(labels.sum("label"))
    while True:
        # neighbor labels: edge (x, y) carries label(y) to x
        prop = edges.join(labels, "inner", num_partitions, on=("y",))
        prop = prop.map_batches(
            lambda t: pa.table({"y": t.column("x"),
                                "label": t.column("label")}),
            batch_format="pyarrow")
        labels = prop.union(labels).groupby("y").aggregate(
            Min("label", alias_name="label")).materialize()
        cur = int(labels.sum("label"))
        if cur == prev:  # min-labels are monotone non-increasing
            break
        prev = cur
    out = labels.to_pandas().sort_values("y").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["y"].astype("int64")),
                     "cluster_rep": pa.array(out["label"].astype("int64"))})


# ------------------------------------------------- incremental (delta) dedup

def dedup_incremental(new_ds, prior_ds, id_col: str = "doc_id",
                      text_col: str = "text",
                      bloom_bits: int | None = None):
    """Incremental (delta) dedup — the daily-increment workflow at corpus
    scale: keep only NEW documents whose content does not appear in a
    PRIOR snapshot. Both sides hash their text worker-side (xxh64 int64
    bit-view, the exact_dedup convention) and a distributed LEFT ANTI
    hash join drops seen content — the hash shuffle co-locates keys, so
    neither the prior corpus nor its hash set is ever broadcast or
    driver-materialized. Returns the surviving new-side rows
    (id, text_hash).

    ``bloom_bits`` (power of two, e.g. 1 << 23) turns on a Bloom
    prefilter over the prior hashes: blocks of the prior side each
    build a partial bitmap (two mix64-derived probes per key), the
    driver ORs the fixed-size bitmaps streaming (O(bits) memory however
    large the snapshot), and new-side rows that MISS the filter are
    provably absent from the prior corpus — they bypass the join
    entirely, so only the bloom-hit slice (true dups + the ~n/2^bits
    false-positive trickle) pays the anti-join shuffle. Output is
    byte-identical to the plain path (pinned by test): misses are exact
    by the no-false-negative property, hits are verified by the join."""
    import ray

    def hash_slim(batch: pa.Table) -> pa.Table:
        hashed = add_text_hash(batch, text_col)
        return pa.table({id_col: hashed.column(id_col),
                         "text_hash": hashed.column("text_hash")})

    def hash_keys(batch: pa.Table) -> pa.Table:
        hashed = add_text_hash(batch, text_col)
        return pa.table({"text_hash": hashed.column("text_hash")})

    from ..util import join_parts

    n_parts = join_parts(16)
    new_h = new_ds.map_batches(hash_slim, batch_format="pyarrow")
    prior_h = prior_ds.map_batches(hash_keys, batch_format="pyarrow")
    if bloom_bits is None:
        return new_h.join(prior_h, "left_anti", n_parts,
                          on=("text_hash",))

    if bloom_bits < 64 or bloom_bits & (bloom_bits - 1) != 0:
        raise ValueError(f"bloom_bits={bloom_bits}: need a power of two"
                         " >= 64")
    mask = np.uint64(bloom_bits - 1)
    nbytes = bloom_bits // 8

    def probes(h: np.ndarray):
        h = h.view(np.uint64)
        p1 = _mix64_np(h) & mask
        p2 = _mix64_np(h ^ np.uint64(0x9E3779B97F4A7C15)) & mask
        return p1, p2

    def block_bitmap(batch: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        h = batch.column("text_hash").to_numpy(zero_copy_only=False)
        for p in probes(h.astype(np.int64)):
            np.bitwise_or.at(bm, (p >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (p & np.uint64(7))
                                           .astype(np.uint8)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    prior_h = prior_h.materialize()  # bloom build + join share one pass
    bloom = np.zeros(nbytes, dtype=np.uint8)
    for b in (prior_h.map_batches(block_bitmap, batch_format="pyarrow")
              .iter_batches(batch_size=64, batch_format="pyarrow")):
        for buf in b.column("bm").to_pylist():
            bloom |= np.frombuffer(buf, dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    def split(batch: pa.Table, want_hit: bool) -> pa.Table:
        bm = _cached_get(bloom_ref)
        h = batch.column("text_hash").to_numpy(zero_copy_only=False)
        p1, p2 = probes(h.astype(np.int64))
        hit = ((bm[(p1 >> np.uint64(3)).astype(np.int64)]
                >> (p1 & np.uint64(7)).astype(np.uint8)) & 1).astype(bool)
        hit &= ((bm[(p2 >> np.uint64(3)).astype(np.int64)]
                 >> (p2 & np.uint64(7)).astype(np.uint8)) & 1
                ).astype(bool)
        return batch.filter(pa.array(hit if want_hit else ~hit))

    new_m = new_h.materialize()  # both split sides branch off one pass
    misses = new_m.map_batches(lambda b: split(b, False),
                               batch_format="pyarrow")
    maybe = new_m.map_batches(lambda b: split(b, True),
                              batch_format="pyarrow").materialize()
    n_maybe = maybe.count()
    if n_maybe == 0:  # all-empty side would drop the join schema
        return misses
    # compact the sparse hit slice: Ray 2.49's hash join crashes when a
    # partition receives only EMPTY blocks (column-less table reaches
    # acero) — exactly the shape a low-dup-rate bloom filter produces
    maybe = maybe.repartition(
        max(1, min(n_parts, (n_maybe + 4095) // 4096)))
    survivors = maybe.join(prior_h, "left_anti", n_parts,
                           on=("text_hash",))
    return misses.union(survivors)


# ------------------------------------- exact duplicated-substring spans

def _gram_hash_rows(batch: pa.Table, k: int, id_col: str, text_col: str):
    """Per-doc dual polynomial rolling hashes of every k-token gram.

    Two INDEPENDENT Horner accumulations (different odd bases) give an
    effective 128-bit gram identity, so in-bucket equality of the
    (gh1, gh2) pair stands in for string equality of the k-gram — the
    occurrence rows ship 16 bytes instead of the ~100-byte gram text.
    Returns (gh1, gh2, doc, pos) numpy columns for the batch."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    g1, g2, dd, pp = [], [], [], []
    for d, t in zip(ids, texts):
        th = token_hashes(t)
        n = th.size
        if n < k:
            continue
        m = n - k + 1
        with np.errstate(over="ignore"):
            a1 = th[:m].copy()
            a2 = th[:m] * np.uint64(0x9E3779B97F4A7C15)
            for i in range(1, k):
                a1 = a1 * np.uint64(1099511628211) + th[i: m + i]
                a2 = a2 * np.uint64(0xC2B2AE3D27D4EB4F) + \
                    th[i: m + i] * np.uint64(0x9E3779B97F4A7C15)
        g1.append(a1.view(np.int64))
        g2.append(a2.view(np.int64))
        dd.append(np.full(m, d, dtype=np.int64))
        pp.append(np.arange(m, dtype=np.int64))
    if not g1:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    return (np.concatenate(g1), np.concatenate(g2),
            np.concatenate(dd), np.concatenate(pp))


def substring_dup_coverage(ds, k: int = 8, id_col: str = "doc_id",
                           text_col: str = "text",
                           n_buckets: int | None = None) -> pa.Table:
    """Exact duplicated-substring coverage, the span-level dedup signal of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"): a k-token gram is *duplicated* if it occurs >= 2 times in
    the corpus (any doc, including the same one); per doc, report how many
    token positions are covered by at least one duplicated-gram occurrence
    (the union of the [pos, pos+k) intervals) as an exact ppm fraction.

    The reference paper builds a monolithic suffix array; the Ray-native
    shape is two fat-bucket shuffles over hash rows instead — no global
    index, no driver materialization of anything corpus-sized:

    1. gram-hash rows (16-byte dual identity per occurrence) bucket by
       ``gh1 % nb``; a bucket holds EVERY occurrence of its grams, so
       "count >= 2" is decided in-bucket with one lexsort + boundary diff
       and only duplicated occurrences (doc, pos) leave the bucket.
    2. duplicated occurrences union a slim per-doc length side (second
       pruned scan) and bucket by doc hash; the per-bucket kernel computes
       each doc's interval union vectorized (sorted-position diffs clipped
       at k, reduceat per doc segment).

    Output: one row per non-empty doc (doc_id, n_tokens, dup_tokens,
    frac_ppm = dup_tokens * 1_000_000 // n_tokens), sorted by doc."""
    import pandas as pd
    import ray

    nb = n_buckets or max(16, min(256,
                                  int(ray.cluster_resources().get("CPU", 8)) * 2))

    def explode(batch: pa.Table) -> pa.Table:
        g1, g2, dd, pp = _gram_hash_rows(batch, k, id_col, text_col)
        kb = (g1.view(np.uint64) % np.uint64(nb)).astype(np.int64)
        return pa.table({"g1": pa.array(g1, pa.int64()),
                         "g2": pa.array(g2, pa.int64()),
                         "doc": pa.array(dd, pa.int64()),
                         "pos": pa.array(pp, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def dup_occurrences(group: pd.DataFrame) -> pd.DataFrame:
        g1 = group["g1"].to_numpy(dtype=np.int64)
        g2 = group["g2"].to_numpy(dtype=np.int64)
        order = np.lexsort((g2, g1))
        g1s, g2s = g1[order], g2[order]
        boundary = np.concatenate(
            ([True], (g1s[1:] != g1s[:-1]) | (g2s[1:] != g2s[:-1])))
        seg_id = np.cumsum(boundary) - 1
        sizes = np.diff(np.append(np.flatnonzero(boundary), g1s.size))
        keep = sizes[seg_id] >= 2
        kept = order[keep]
        return pd.DataFrame({"doc": group["doc"].to_numpy()[kept],
                             "pos": group["pos"].to_numpy()[kept]})

    occ = (ds.map_batches(explode, batch_format="pyarrow")
           .groupby("_kb").map_groups(dup_occurrences, batch_format="pandas"))

    def occ_tag(batch: pa.Table) -> pa.Table:
        t = pa.table({"doc": batch.column("doc"), "pos": batch.column("pos"),
                      "_side": pa.array(np.ones(len(batch), dtype=np.int8),
                                        pa.int8())})
        from ..stages.window import _bucket_col
        return _bucket_col(t, "doc", nb)

    def len_tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_tok = pc.count_substring_regex(batch.column(text_col), r"\S+")
        n = np.asarray(pc.cast(n_tok, pa.int64()))
        ids = np.asarray(batch.column(id_col).cast(pa.int64()))
        m = n > 0
        t = pa.table({"doc": pa.array(ids[m], pa.int64()),
                      "pos": pa.array(n[m], pa.int64()),  # length rides pos
                      "_side": pa.array(np.zeros(int(m.sum()), dtype=np.int8),
                                        pa.int8())})
        from ..stages.window import _bucket_col
        return _bucket_col(t, "doc", nb)

    lengths = ds.map_batches(len_tag, batch_format="pyarrow")
    tagged = occ.map_batches(occ_tag, batch_format="pyarrow").union(lengths)

    def coverage(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        docs_l = group["doc"].to_numpy()[side == 0]
        lens_l = group["pos"].to_numpy()[side == 0]
        od = group["doc"].to_numpy()[side == 1]
        op = group["pos"].to_numpy()[side == 1]
        cov = np.zeros(docs_l.size, dtype=np.int64)
        if od.size:
            order = np.lexsort((op, od))
            od, op = od[order], op[order]
            boundary = np.concatenate(([True], od[1:] != od[:-1]))
            starts = np.flatnonzero(boundary)
            # interval union of [pos, pos+k): k per segment start + the
            # clipped diffs for every following occurrence in the segment
            d = np.minimum(op[1:] - op[:-1], k)
            d = np.concatenate(([np.int64(k)], d))
            d[starts] = k
            per_doc = np.add.reduceat(d, starts)
            # align to the length side (docs sorted there too)
            lorder = np.argsort(docs_l, kind="stable")
            docs_l, lens_l = docs_l[lorder], lens_l[lorder]
            cov = np.zeros(docs_l.size, dtype=np.int64)
            ix = np.searchsorted(docs_l, od[starts])
            ok = (ix < docs_l.size)
            ok &= docs_l[np.minimum(ix, docs_l.size - 1)] == od[starts]
            cov[ix[ok]] = per_doc[ok]
        return pd.DataFrame({
            "doc_id": docs_l, "n_tokens": lens_l, "dup_tokens": cov,
            "frac_ppm": cov * 1_000_000 // np.maximum(lens_l, 1)})

    out = tagged.groupby("_kb").map_groups(coverage, batch_format="pandas") \
        .to_pandas()
    if len(out) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64()),
                         "dup_tokens": pa.array([], pa.int64()),
                         "frac_ppm": pa.array([], pa.int64())})
    tbl = pa.Table.from_pandas(out, preserve_index=False)
    return tbl.cast(pa.schema([("doc_id", pa.int64()),
                               ("n_tokens", pa.int64()),
                               ("dup_tokens", pa.int64()),
                               ("frac_ppm", pa.int64())])) \
        .sort_by([("doc_id", "ascending")])


def tfidf_cosine_pairs(ds, threshold_ppm: int = 250_000,
                       min_shared: int = 2, max_df: int | None = None,
                       idf_scale: int = 1000, gram_n: int = 1,
                       idf_clip: int = 1_000_000,
                       id_col: str = "doc_id", text_col: str = "text",
                       broadcast_limit: int = 2_000_000) -> pa.Table:
    """EXACT all-pairs tf-idf cosine similarity join over the corpus — the
    sparse-vector counterpart of embedding_brute_pairs, built as a
    term-partitioned inverted index (Elsayed et al. 2008 / Vernica et
    al. 2010 shape: the ONLY pairs ever materialized are those sharing a
    vocabulary term).

    Vector model (integer-exact on both engines): per doc, the DISTINCT
    whitespace tokens (``gram_n`` > 1 switches the term space to word
    n-grams — the right space when the unigram vocabulary is small);
    per term, presence weight ``w = (n_docs * idf_scale) // df``; the reported score is squared cosine in ppm —
    ``cos2_ppm = num^2 * 10^6 // (normsq_a * normsq_b)`` with ``num =
    sum of w^2 over shared terms`` — so no sqrt/float leaves either
    engine (the final ratio runs in arbitrary-precision Python ints /
    DuckDB HUGEINT). Weights CLIP at ``idf_clip`` (standard idf
    clipping, LEAST() in the oracle): the int64 partials sum w^2 over a
    doc's terms, so the clip — not idf_scale alone — is what bounds
    them (w <= 1e6 -> w^2 <= 1e12 -> a doc needs ~9e6 distinct vocab
    terms before nsq could wrap; unclipped, a df=1 term at n_docs=2e6
    would already overflow a 3-term doc). Pairs need ``>= min_shared``
    shared terms and ``cos2_ppm >= threshold_ppm``.

    Stop-term cap (the scale guard, same shape as ngram_jaccard_pairs):
    terms with df > ``max_df`` leave the VOCABULARY entirely — they feed
    neither dot products nor norms, so capped cosine is the true cosine
    of the capped vector space, oracle-replayable. Default None = exact
    full vocabulary.

    Shuffle shape: postings hash into term FAT buckets (a bucket holds
    every posting of its terms, so df and w are bucket-computable); the
    shared index-arithmetic pair kernel emits per-pair dot partials
    (weights ride as w^2) and per-doc norm partials from the SAME pass;
    a second pair-hash bucket shuffle folds dot partials and applies the
    min_shared gate; norms attach via broadcast dict under
    ``broadcast_limit`` or two hash joins above it (the
    cooccurrence_pmi duality); only gated candidates reach the
    arbitrary-precision finish."""
    import ray

    import pandas as pd

    from .text_analysis import _explode_distinct_grams

    n_docs = ds.count()
    if n_docs * idf_scale >= 1 << 62:  # raw w must stay int64 pre-clip
        raise ValueError("n_docs * idf_scale exceeds int64 headroom; "
                         "lower idf_scale")
    nb = max(16, min(256,
                     int(ray.cluster_resources().get("CPU", 8)) * 2))

    def explode(batch: pa.Table) -> pa.Table:
        out = _explode_distinct_grams(batch, id_col, text_col, gram_n)
        return pa.table({
            "doc": out["doc"],
            "tok": out["gram"],
            "_kb": pa.array((out["hash"] % np.uint64(nb)).astype(np.int64),
                            pa.int64())})

    def per_term_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["tok", "doc"], kind="mergesort")
        tok = g["tok"].to_numpy()
        doc = g["doc"].to_numpy(dtype=np.int64)
        if tok.size == 0:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64),
                                 "wsum": pd.Series([], dtype=np.int64),
                                 "is_pair": pd.Series([], dtype=np.int8)})
        boundary = np.concatenate(([True], tok[1:] != tok[:-1]))
        seg_id = np.cumsum(boundary) - 1
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, tok.size))
        df_row = sizes[seg_id]
        if max_df is not None:
            keep = df_row <= max_df
            tok, doc, df_row = tok[keep], doc[keep], df_row[keep]
        w_row = np.minimum((n_docs * idf_scale) // df_row, idf_clip)
        w2_row = w_row * w_row
        pc = _segment_pair_counts(tok, doc, weights=w2_row)
        # per-doc norm partials from the SAME postings pass
        ud, inv = np.unique(doc, return_inverse=True)
        nsq = np.zeros(ud.size, dtype=np.int64)
        np.add.at(nsq, inv, w2_row)
        return pd.DataFrame({
            "a": np.concatenate([pc["a"], ud]),
            "b": np.concatenate([pc["b"],
                                 np.zeros(ud.size, np.int64)]),
            "cnt": np.concatenate([pc["cnt"],
                                   np.zeros(ud.size, np.int64)]),
            "wsum": np.concatenate([pc["wsum"], nsq]),
            "is_pair": np.concatenate([np.ones(pc["a"].size, np.int8),
                                       np.zeros(ud.size, np.int8)]),
        })

    tagged = (ds.map_batches(explode, batch_format="pyarrow")
              .groupby("_kb").map_groups(per_term_bucket,
                                         batch_format="pandas")
              .materialize())

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64).view(np.uint64)
        b = np.asarray(batch.column("b"), dtype=np.int64).view(np.uint64)
        from .text_analysis import _mix64_np
        with np.errstate(over="ignore"):
            pk = _mix64_np(a) + _mix64_np(b) * np.uint64(0x9E3779B97F4A7C15)
        return batch.append_column(
            "_pb", pa.array((pk % np.uint64(nb)).astype(np.int64),
                            pa.int64()))

    def fold_pairs(group: pd.DataFrame) -> pd.DataFrame:
        a = group["a"].to_numpy(dtype=np.int64)
        b = group["b"].to_numpy(dtype=np.int64)
        cnt = group["cnt"].to_numpy(dtype=np.int64)
        ws = group["wsum"].to_numpy(dtype=np.int64)
        po = np.lexsort((b, a))
        a, b, cnt, ws = a[po], b[po], cnt[po], ws[po]
        pb = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        ps = np.flatnonzero(pb)
        seg = np.cumsum(pb) - 1
        shared = np.zeros(ps.size, dtype=np.int64)
        num = np.zeros(ps.size, dtype=np.int64)
        np.add.at(shared, seg, cnt)
        np.add.at(num, seg, ws)
        keep = shared >= min_shared
        return pd.DataFrame({"a": a[ps][keep], "b": b[ps][keep],
                             "shared": shared[keep], "num": num[keep]})

    pairs = (tagged.filter(expr="is_pair == 1")
             .map_batches(add_pair_bucket, batch_format="pyarrow")
             .groupby("_pb").map_groups(fold_pairs, batch_format="pandas"))
    norm_rows = tagged.filter(expr="is_pair == 0")

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "shared": pa.array([], pa.int64()),
                      "cos2_ppm": pa.array([], pa.int64())})

    def score_rows(a, b, shared, num, na, nbv) -> pa.Table:
        # arbitrary-precision finish: num^2 overflows int64 by design
        # (the threshold gate runs HERE, distributed, so only survivors
        # ever reach the driver)
        cos2 = [n_ * n_ * 1_000_000 // (x * y)
                for n_, x, y in zip(num, na, nbv)]
        keep = [i for i, c in enumerate(cos2) if c >= threshold_ppm]
        return pa.table({
            "a": pa.array([a[i] for i in keep], pa.int64()),
            "b": pa.array([b[i] for i in keep], pa.int64()),
            "shared": pa.array([shared[i] for i in keep], pa.int64()),
            "cos2_ppm": pa.array([cos2[i] for i in keep], pa.int64())})

    if n_docs <= broadcast_limit:
        nsq_map: dict = {}
        for b in norm_rows.iter_batches(batch_size=1 << 18,
                                        batch_format="pyarrow"):
            aa = np.asarray(b.column("a"), dtype=np.int64)
            ww = np.asarray(b.column("wsum"), dtype=np.int64)
            for d_, v_ in zip(aa.tolist(), ww.tolist()):
                nsq_map[d_] = nsq_map.get(d_, 0) + v_
        nsq_ref = ray.put(nsq_map)

        def score_bcast(batch: pa.Table) -> pa.Table:
            lut = _cached_get(nsq_ref)
            a = batch.column("a").to_pylist()
            b = batch.column("b").to_pylist()
            return score_rows(a, b, batch.column("shared").to_pylist(),
                              batch.column("num").to_pylist(),
                              [lut[d] for d in a], [lut[d] for d in b])

        scored = pairs.map_batches(score_bcast, batch_format="pyarrow")
    else:
        from ray.data.aggregate import Sum

        from ..util import join_parts

        n_parts = join_parts()
        norms = (norm_rows.groupby("a")
                 .aggregate(Sum("wsum", alias_name="nsq")).materialize())

        def key_a(batch: pa.Table) -> pa.Table:
            return pa.table({"a": batch.column("a"),
                             "na": batch.column("nsq")})

        def key_b(batch: pa.Table) -> pa.Table:
            return pa.table({"b": batch.column("a"),
                             "nb": batch.column("nsq")})

        with_n = (pairs.join(norms.map_batches(key_a,
                                               batch_format="pyarrow"),
                             "inner", n_parts, on=("a",))
                  .join(norms.map_batches(key_b, batch_format="pyarrow"),
                        "inner", n_parts, on=("b",)))

        def score_joined(batch: pa.Table) -> pa.Table:
            return score_rows(batch.column("a").to_pylist(),
                              batch.column("b").to_pylist(),
                              batch.column("shared").to_pylist(),
                              batch.column("num").to_pylist(),
                              batch.column("na").to_pylist(),
                              batch.column("nb").to_pylist())

        scored = with_n.map_batches(score_joined, batch_format="pyarrow")

    out = scored.to_pandas()
    if len(out) == 0:
        return empty
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table({
        "a": pa.array(out["a"].astype("int64"), pa.int64()),
        "b": pa.array(out["b"].astype("int64"), pa.int64()),
        "shared": pa.array(out["shared"].astype("int64"), pa.int64()),
        "cos2_ppm": pa.array(out["cos2_ppm"].astype("int64"),
                             pa.int64())})


def ngram_novelty(ds, k: int = 3, id_col: str = "doc_id",
                  text_col: str = "text",
                  driver_limit: int = 1 << 22) -> pa.Table:
    """Per-document n-gram NOVELTY — the data-pruning signal used by
    RefinedWeb/FineWeb-style curation: how much of a doc's shingle set
    appears for the FIRST time in the corpus (corpus order = doc_id).
    For every doc: its distinct k-shingle count, the number of those
    shingles whose global first owner (MIN doc_id over the corpus) is
    this doc, and ``novelty_ppm = novel * 10^6 // n_shingles``. Late
    boilerplate scores near 0; the first copy of a template scores high.

    Shingle space = ``shingle_hashes`` (token-fnv1a -> mix64 -> Horner
    k-gram, np.unique per doc) — bit-identical to the oracle's
    ``_shingle_ctes`` chain, so 64-bit collisions (which conflate two
    grams) are mirrored on both engines and the match stays exact.

    Scale shape: ONE tokenizing pass emits (shingle, doc) postings plus
    a per-doc sentinel row carrying the distinct-shingle count (the bm25
    sentinel idiom); first owners reduce via ``groupby(s).Min`` (the
    only gram-sized shuffle); per-doc novel counts come from a map-side
    ``np.unique`` fold over the owners table plus a doc-keyed
    ``groupby-Sum`` that the sentinel totals UNION into — so totals
    attach without a join and nothing corpus-sized transits the
    driver."""
    from ray.data.aggregate import Min, Sum

    def explode(batch: pa.Table) -> pa.Table:
        # numpy assembly (no Python list building): shingle rows first,
        # then one sentinel row per doc carrying its distinct count
        d_arr = np.asarray(batch.column(id_col), dtype=np.int64)
        shs = [shingle_hashes(t, k).view(np.int64)
               for t in batch.column(text_col).to_pylist()]
        lens = np.fromiter((x.size for x in shs), np.int64, len(shs))
        s_all = (np.concatenate(shs) if shs
                 else np.empty(0, dtype=np.int64))
        n = len(shs)
        return pa.table({
            "s": pa.array(np.concatenate(
                [s_all, np.zeros(n, np.int64)]), pa.int64()),
            "doc": pa.array(np.concatenate(
                [np.repeat(d_arr, lens), d_arr]), pa.int64()),
            "total": pa.array(np.concatenate(
                [np.zeros(s_all.size, np.int64), lens]), pa.int64()),
            "kind": pa.array(np.concatenate(
                [np.zeros(s_all.size, np.int64),
                 np.ones(n, np.int64)]), pa.int64())})

    posts = ds.map_batches(explode, batch_format="pyarrow").materialize()

    if posts.count() <= driver_limit:
        # driver fold: first owners + novel counts are one lexsort +
        # boundary pass over the gathered postings — zero shuffles
        t = _gather(posts)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        doc = t.column("doc").to_numpy(zero_copy_only=False)
        total = t.column("total").to_numpy(zero_copy_only=False)
        m0 = kind == 0
        s0, d0 = s[m0], doc[m0]
        order = np.lexsort((d0, s0))
        s0, d0 = s0[order], d0[order]
        first = (np.concatenate(([True], s0[1:] != s0[:-1]))
                 if s0.size else np.empty(0, bool))
        ud, novel = np.unique(d0[first], return_counts=True)
        docs_all = doc[~m0]
        tot_all = total[~m0]
        do = np.argsort(docs_all, kind="stable")
        docs_all, tot_all = docs_all[do], tot_all[do]
        nov_all = np.zeros(docs_all.size, dtype=np.int64)
        nov_all[np.searchsorted(docs_all, ud)] = novel
        ppm = np.where(tot_all > 0,
                       nov_all * 1_000_000 // np.maximum(tot_all, 1), 0)
        return pa.table({
            "doc_id": pa.array(docs_all, pa.int64()),
            "n_shingles": pa.array(tot_all, pa.int64()),
            "n_novel": pa.array(nov_all, pa.int64()),
            "novelty_ppm": pa.array(ppm, pa.int64())})

    def novel_partial(batch: pa.Table) -> pa.Table:
        o = np.asarray(batch.column("owner"), dtype=np.int64)
        ud, cnt = np.unique(o, return_counts=True)
        return pa.table({"doc": pa.array(ud, pa.int64()),
                         "novel": pa.array(cnt, pa.int64()),
                         "total": pa.array(np.zeros(ud.size, np.int64),
                                           pa.int64())})

    novel = (posts.filter(expr="kind == 0")
             .groupby("s").aggregate(Min("doc", alias_name="owner"))
             .map_batches(novel_partial, batch_format="pyarrow"))

    def total_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"doc": batch.column("doc"),
                         "novel": pa.array(
                             np.zeros(batch.num_rows, np.int64),
                             pa.int64()),
                         "total": batch.column("total")})

    totals = posts.filter(expr="kind == 1") \
        .map_batches(total_rows, batch_format="pyarrow")
    folded = (novel.union(totals)
              .groupby("doc")
              .aggregate(Sum("novel", alias_name="n_novel"),
                         Sum("total", alias_name="n_shingles"))
              .to_pandas().sort_values("doc").reset_index(drop=True))
    tot = folded["n_shingles"].to_numpy(dtype=np.int64)
    nov = folded["n_novel"].to_numpy(dtype=np.int64)
    ppm = np.where(tot > 0, nov * 1_000_000 // np.maximum(tot, 1), 0)
    return pa.table({
        "doc_id": pa.array(folded["doc"].astype("int64"), pa.int64()),
        "n_shingles": pa.array(tot, pa.int64()),
        "n_novel": pa.array(nov, pa.int64()),
        "novelty_ppm": pa.array(ppm, pa.int64())})
