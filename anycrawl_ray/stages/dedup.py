"""Deduplication operators over the ``documents`` table.

First-class training-data additions (build brief): exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup. The reference itself
has only exact URL dedup (SURVEY.md §2.7); these extend the engine for
corpus curation at scale.

Scale design:
- **exact**: vectorized content-hash per batch -> ``groupby(hash)`` keeps
  the min doc_id per group. Only (hash, doc_id, text) shuffles.
- **MinHash+LSH**: per batch, w-shingle token hashes -> 64-perm signature
  (numpy, one xor-multiply per perm — no per-shingle Python) -> explode to
  (band_id, band_key, doc_id) rows -> ``groupby(band)`` emits candidate
  pairs -> exact Jaccard verification on the pair set. The all-pairs
  O(n^2) never materializes.
- **SimHash**: 64-bit signature per doc; blocking on 4x16-bit bands finds
  all pairs within Hamming distance 3 (pigeonhole) which are then verified.
- **embedding near-dup**: random-hyperplane signatures bucket candidates,
  exact cosine verifies (same LSH-then-verify shape).

All stages are ``map_batches`` + one ``groupby`` each; candidate
verification re-reads only candidate docs via a broadcast lookup (pairs
are << corpus by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urls import xxh64
from .text_analysis import _mix64_np, token_hashes

# ---------------------------------------------------------------- exact


def add_text_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [xxh64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.uint64()))


def exact_dedup(ds, text_col: str = "text"):
    """Dataset -> Dataset of survivors (min doc_id per identical text) with
    an ``n_copies`` column. First-occurrence-wins like the frontier's
    seen-set (§2.7)."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda b: add_text_hash(b, text_col), batch_format="pyarrow"
    )

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("doc_id")
        first = group.head(1).copy()
        first["n_copies"] = len(group)
        return first

    return hashed.groupby("text_hash").map_groups(keep_first, batch_format="pandas")


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


def minhash_bands_batch(batch: pa.Table, num_perm: int = 64, bands: int = 16,
                        k: int = 3, text_col: str = "text") -> pa.Table:
    """documents batch -> (doc_id, band_id, band_key) rows (exploded)."""
    rows_per_band = num_perm // bands
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_doc, out_band, out_key = [], [], []
    for doc_id, text in zip(doc_ids, texts):
        sig = minhash_signature(shingle_hashes(text, k), num_perm)
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            key = int(_mix64_np(chunk).sum(dtype=np.uint64))
            out_doc.append(doc_id)
            out_band.append(b)
            out_key.append(key)
    return pa.table(
        {
            "doc_id": pa.array(out_doc),
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.uint64()),
        }
    )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def _pairs_from_buckets(ds_bands, max_bucket: int = 200):
    """grouped band rows -> unique candidate (a, b) pairs (a < b)."""
    import pandas as pd

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        if len(ids) < 2 or len(ids) > max_bucket:
            # oversized bucket = degenerate band (e.g. all-empty docs); skip
            return pd.DataFrame({"a": [], "b": []})
        pairs = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        return pd.DataFrame(pairs, columns=["a", "b"])

    return ds_bands.groupby(["band_id", "band_key"]).map_groups(
        emit_pairs, batch_format="pandas"
    )


def minhash_lsh_pairs(ds, threshold: float = 0.5, num_perm: int = 64,
                      bands: int = 16, k: int = 3):
    """documents Dataset -> pa.Table (a, b, jaccard) of verified near-dup
    pairs with exact Jaccard >= threshold. Candidate generation is fully
    distributed; verification broadcasts only candidate docs' texts."""
    import ray

    band_ds = ds.map_batches(
        lambda b: minhash_bands_batch(b, num_perm, bands, k),
        batch_format="pyarrow",
    )
    cand = _pairs_from_buckets(band_ds)
    pair_rows = cand.to_pandas()
    if len(pair_rows) == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    pair_rows = pair_rows.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    # verify: fetch texts of candidate docs only
    need = sorted(set(pair_rows["a"]) | set(pair_rows["b"]))
    need_set = set(need)
    texts: dict = {}
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if d in need_set:
                texts[d] = t
    out_a, out_b, out_j = [], [], []
    for a, b in zip(pair_rows["a"], pair_rows["b"]):
        j = jaccard(texts[a], texts[b], k)
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_j.append(j)
    return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


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


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    sigs = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    out = pa.table({"doc_id": batch.column("doc_id"),
                    "simhash": pa.array(sigs, pa.uint64())})
    return out


def simhash_pairs(ds, max_hamming: int = 3):
    """Near-dup pairs within Hamming distance <= max_hamming via 4x16-bit
    band blocking (pigeonhole: <=3 differing bits leave >=1 band equal)."""
    import pandas as pd

    sig_ds = ds.map_batches(simhash_batch, batch_format="pyarrow")
    sig_tbl = sig_ds.to_pandas()
    sigs = dict(zip(sig_tbl["doc_id"], sig_tbl["simhash"]))
    # explode to 4 bands — small table (doc_id, band, key), groupby in pandas
    # at this scale; the band explode + groupby maps 1:1 onto the
    # minhash_bands pattern for the distributed path
    rows = []
    for d, s in sigs.items():
        s = int(s)
        for b in range(4):
            rows.append((d, b, (s >> (16 * b)) & 0xFFFF))
    df = pd.DataFrame(rows, columns=["doc_id", "band", "key"])
    seen_pairs = set()
    out_a, out_b, out_h = [], [], []
    for (_b, _k), g in df.groupby(["band", "key"]):
        ids = sorted(g["doc_id"].unique())
        if len(ids) < 2 or len(ids) > 200:
            continue
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pair = (ids[i], ids[j])
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                h = bin(int(sigs[pair[0]]) ^ int(sigs[pair[1]])).count("1")
                if h <= max_hamming:
                    out_a.append(pair[0])
                    out_b.append(pair[1])
                    out_h.append(h)
    order = np.lexsort((out_b, out_a))
    return pa.table({"a": pa.array([out_a[i] for i in order], pa.int64()),
                     "b": pa.array([out_b[i] for i in order], pa.int64()),
                     "hamming": pa.array([out_h[i] for i in order], pa.int32())})


# ----------------------------------------------------- embedding near-dup


def embedding_neardup_pairs(ds_embeddings, threshold: float = 0.95,
                            num_planes: int = 16, bands: int = 4, seed: int = 7):
    """embeddings Dataset (vec_id, embedding) -> verified cosine>=threshold
    pairs via random-hyperplane LSH bucketing + exact verification."""
    import pandas as pd

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
        return pa.table({"doc_id": pa.array(out_id), "band_id": pa.array(out_band, pa.int32()),
                         "band_key": pa.array(out_key, pa.uint64())})

    band_ds = ds_embeddings.map_batches(sig_batch, batch_format="pyarrow")
    cand = _pairs_from_buckets(band_ds, max_bucket=500).to_pandas()
    if len(cand) == 0:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    cand = cand.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    need = set(cand["a"]) | set(cand["b"])
    vecs: dict = {}
    for batch in ds_embeddings.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for vid, e in zip(batch.column("vec_id").to_pylist(),
                          batch.column("embedding").to_pylist()):
            if vid in need:
                vecs[vid] = np.asarray(e, dtype=np.float64)
    out_a, out_b, out_c = [], [], []
    for a, b in zip(cand["a"], cand["b"]):
        va, vb = vecs[a], vecs[b]
        denom = np.linalg.norm(va) * np.linalg.norm(vb)
        c = float(va @ vb / denom) if denom else 0.0
        if c >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_c.append(c)
    return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64()),
                     "cosine": pa.array(out_c, pa.float64())})
