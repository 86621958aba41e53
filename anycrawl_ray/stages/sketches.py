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


def heavy_hitters(ds, col: str, k: int = 200, prune_factor: int = 4,
                  n_rows: int | None = None) -> pa.Table:
    """EXACT distributed heavy hitters: items of int64 ``col`` whose
    frequency strictly exceeds n/k (Misra-Gries '82 pruning + exact
    verify — the standard two-pass shape at corpus scale).

    Pass 1 (candidates): each block keeps items with local count >
    local_n / (prune_factor*k) — the MG deficit bound: an item pruned in
    every block has true count <= sum_b n_b/(p*k) = n/(p*k) < n/k, so the
    survivor union is a SUPERSET of every true heavy hitter, while each
    block emits < p*k rows (tiny shuffle). A groupby-Sum merges the
    partial counts into lower bounds; merged candidates that cannot reach
    the threshold even with the global deficit added are dropped, which
    caps the candidate list at ~k*p/(p-1) items regardless of corpus
    size.

    Pass 2 (verify): the candidate list broadcasts (O(k) by the bound
    above) and exact counts accumulate map-side; the final filter is the
    integer cross-multiply ``cnt * k > n`` — no division, no sketch error
    in the output. Returns (col, cnt) sorted by cnt desc, item asc."""
    from ray.data.aggregate import Sum

    pk = prune_factor * k
    if n_rows is None:
        n_rows = ds.count()  # parquet metadata for source reads
    if n_rows == 0:
        return pa.table({col: pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})


    def local_freq(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        items, cnt = np.unique(v, return_counts=True)
        keep = cnt * pk > v.size
        return pa.table({col: pa.array(items[keep], pa.int64()),
                         "cnt": pa.array(cnt[keep].astype(np.int64))})

    empty = pa.table({col: pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    merged = (ds.map_batches(local_freq, batch_format="pyarrow")
              .groupby(col).aggregate(Sum("cnt", alias_name="cnt"))
              .to_pandas())
    if len(merged) == 0:  # Ray drops schema when every partial is empty
        return empty
    deficit = n_rows // pk
    cand = merged[(merged["cnt"] + deficit) * k > n_rows][col]
    cand_arr = np.sort(cand.to_numpy(np.int64))
    if cand_arr.size == 0:
        return empty

    def exact_counts(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = v[np.isin(v, cand_arr)]
        items, cnt = np.unique(v, return_counts=True)
        return pa.table({col: pa.array(items, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64))})

    exact = (ds.map_batches(exact_counts, batch_format="pyarrow")
             .groupby(col).aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    if len(exact) == 0:
        return empty
    out = exact[exact["cnt"] * k > n_rows].sort_values(
        ["cnt", col], ascending=[False, True]).reset_index(drop=True)
    return pa.table({col: pa.array(out[col].astype("int64"), pa.int64()),
                     "cnt": pa.array(out["cnt"].astype("int64"),
                                     pa.int64())})


def count_min(ds, col: str, depth: int = 4, width: int = 64) -> pa.Table:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for ``col`` (int64): ``depth`` hash rows x ``width``
    counters, row r hashing a value v to ``mix64(mix64(v) ^ mix64(r+1))
    % width``; the point estimate is the min counter across rows, an
    OVERESTIMATE by construction (``n_est >= n_exact`` always). Output:
    one row per distinct value with both the exact count and the sketch
    estimate, so the row doubles as the sketch's own error report.

    Scale shape: the sketch is a depth x width int64 matrix built from
    map-side per-block partials folded at the driver (O(depth*width) per
    block, ZERO shuffle — the KMV idiom); exact counts take the one slim
    groupby-Sum of per-block (value, cnt) partials, and estimates attach
    map-side from the broadcast matrix. At real scale the probe set
    would be a fixed key list instead of every distinct value; the
    sketch build is unchanged."""
    import ray
    from ray.data.aggregate import Sum

    salts = _mix64_np(np.arange(1, depth + 1, dtype=np.uint64))

    def local_sketch(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        iv = np.asarray(v.cast(pa.int64()), dtype=np.int64)
        if iv.size and iv.min() < 0:
            # numpy would wrap to uint64 silently while the oracle's
            # CAST(... AS UBIGINT) errors — fail loudly on BOTH engines
            raise ValueError(f"count_min requires non-negative {col}")
        uh = _mix64_np(iv.view(np.uint64))
        mats = np.zeros((depth, width), dtype=np.int64)
        for r in range(depth):
            c = (_mix64_np(uh ^ salts[r]) % np.uint64(width)).astype(
                np.int64)
            mats[r] = np.bincount(c, minlength=width)
        rr, cc = np.divmod(np.arange(depth * width), width)
        return pa.table({"r": pa.array(rr.astype(np.int64), pa.int64()),
                         "c": pa.array(cc.astype(np.int64), pa.int64()),
                         "n": pa.array(mats.ravel(), pa.int64())})

    sketch = np.zeros((depth, width), dtype=np.int64)
    for p in ds.map_batches(local_sketch, batch_format="pyarrow") \
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        rr = np.asarray(p.column("r"), dtype=np.int64)
        cc = np.asarray(p.column("c"), dtype=np.int64)
        nn = np.asarray(p.column("n"), dtype=np.int64)
        np.add.at(sketch, (rr, cc), nn)
    sketch_ref = ray.put(sketch)

    def local_counts(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        items, cnt = np.unique(
            np.asarray(v.cast(pa.int64()), dtype=np.int64),
            return_counts=True)
        return pa.table({col: pa.array(items, pa.int64()),
                         "n_exact": pa.array(cnt.astype(np.int64))})

    def attach_est(batch: pa.Table) -> pa.Table:
        from .dedup import _cached_get

        m = _cached_get(sketch_ref)
        items = np.asarray(batch.column(col), dtype=np.int64)
        uh = _mix64_np(items.view(np.uint64))
        est = np.full(items.size, np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(depth):
            c = (_mix64_np(uh ^ salts[r]) % np.uint64(width)).astype(
                np.int64)
            est = np.minimum(est, m[r][c])
        return batch.append_column("n_est", pa.array(est, pa.int64()))

    out = (ds.map_batches(local_counts, batch_format="pyarrow")
           .groupby(col).aggregate(Sum("n_exact", alias_name="n_exact"))
           .map_batches(attach_est, batch_format="pyarrow")
           .to_pandas())
    if len(out) == 0:
        return pa.table({col: pa.array([], pa.int64()),
                         "n_exact": pa.array([], pa.int64()),
                         "n_est": pa.array([], pa.int64())})
    out = out.sort_values(col).reset_index(drop=True)
    return pa.table({col: pa.array(out[col].astype("int64"), pa.int64()),
                     "n_exact": pa.array(out["n_exact"].astype("int64"),
                                         pa.int64()),
                     "n_est": pa.array(out["n_est"].astype("int64"),
                                       pa.int64())})


def hll_distinct(ds, col: str, p: int = 8) -> pa.Table:
    """HyperLogLog (Flajolet et al. 2007) distinct count of int64 ``col``
    in EXACT integer arithmetic: hash ``h = mix64(v)``; register index =
    top ``p`` bits, rank ``rho`` = position of the first 1-bit in the low
    ``64-p`` bits (``65-p`` when they are all zero); each of the ``m =
    2^p`` registers keeps the max rho. The raw estimate
    ``alpha_m * m^2 / sum_j 2^-M_j`` is evaluated denominators-cleared:
    with ``q = 64 - p`` and ``S = sum_j 2^(q + 1 - M_j)`` (empty
    registers contribute ``2^(q+1)``; rho <= q+1 so every term is a
    non-negative shift),
    ``est_raw = 7213 * m^3 * 2^(q+1) // (10 * (1000*m + 1079) * S)``
    using the published closed-form ``alpha_m = 0.7213/(1 + 1.079/m)`` as
    the exact rational 7213*m / (10*(1000m+1079)) — Python bigints here,
    HUGEINT in the oracle, so both engines agree bit-for-bit. No float,
    no low/high-range correction (the raw estimator is the contract; the
    row reports ``filled`` so consumers can apply corrections).

    Scale shape: map-side per-block register maxima (<= m tiny rows per
    block), ONE groupby-Max over at most m keys, a driver finish over
    <= m rows. The corpus itself never shuffles."""
    from ray.data.aggregate import Max

    m = 1 << p
    q = 64 - p
    mask = np.uint64((1 << q) - 1)

    def local_regs(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        iv = np.asarray(v.cast(pa.int64()), dtype=np.int64)
        if iv.size and iv.min() < 0:
            raise ValueError(f"hll_distinct requires non-negative {col}")
        h = _mix64_np(iv.view(np.uint64))
        reg = (h >> np.uint64(q)).astype(np.int64)
        w = h & mask
        # floor(log2(w)) without floats (exact for full 64-bit range)
        bl = np.zeros(w.size, dtype=np.int64)
        vv = w.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = vv >= (np.uint64(1) << np.uint64(s))
            bl[big] += s
            vv[big] >>= np.uint64(s)
        rho = np.where(w > 0, q - bl, q + 1).astype(np.int64)
        # per-block register maxima: sort (reg, rho) and keep the last of
        # each reg run — O(n log n) in the block, <= m output rows
        order = np.lexsort((rho, reg))
        reg_s, rho_s = reg[order], rho[order]
        last = np.concatenate((reg_s[1:] != reg_s[:-1], [True])) \
            if reg_s.size else np.zeros(0, dtype=bool)
        return pa.table({"reg": pa.array(reg_s[last], pa.int64()),
                         "rho": pa.array(rho_s[last], pa.int64())})

    regs = (ds.map_batches(local_regs, batch_format="pyarrow")
            .groupby("reg").aggregate(Max("rho", alias_name="rho"))
            .to_pandas())
    filled = len(regs)
    s_val = (m - filled) * (1 << (q + 1)) + sum(
        1 << (q + 1 - int(r)) for r in regs["rho"])
    est = 7213 * m ** 3 * (1 << (q + 1)) // (10 * (1000 * m + 1079) * s_val)
    return pa.table({"m": pa.array([m], pa.int64()),
                     "filled": pa.array([filled], pa.int64()),
                     "est_raw": pa.array([int(est)], pa.int64())})


def _bit_length_np(v: np.ndarray) -> np.ndarray:
    """Exact integer bit length of non-negative int64 values (the
    hll_distinct shift cascade, factored): 0 -> 0, 1 -> 1, 255 -> 8."""
    bl = np.zeros(v.size, dtype=np.int64)
    vv = v.astype(np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        big = vv >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        vv[big] >>= np.uint64(s)
    bl[v > 0] += 1
    return bl


def hdr_quantiles(ds, key: str, value_col: str, sub_bits: int = 3,
                  ps_ppm: tuple = (500_000, 950_000, 990_000),
                  scale: int = 100,
                  driver_limit: int = 1 << 22) -> pa.Table:
    """HDR-histogram quantile sketch (Tene's HdrHistogram bucketing) per
    ``key`` over strictly-positive ``value_col``: cents quantize via the
    house round_even convention, then each value collapses to its
    bucket LOWER BOUND — the top ``sub_bits + 1`` significant bits kept,
    the rest zeroed — giving a fixed relative error <= 2^-sub_bits with
    at most ``63 * 2^sub_bits`` buckets per key regardless of row count.
    Estimate for quantile p = smallest bucket lower bound whose
    cumulative count covers ceil(p * n) (integer rule cum * 1e6 >=
    p_ppm * n). Cents below 1 (zero or negative values) pass through
    exactly — the HDR zero-bucket convention — so the sketch accepts
    any input, with the relative-error bound applying to the positive
    range. The exact quantile (same rank rule over exact cents) rides
    along so every row reports its own error: err_ppm =
    (exact - est) * 1e6 // greatest(exact, 1), >= 0 for positive
    quantiles.

    Scale shape: one map pass emits per-block (key, bucket_lo, cnt)
    partials — value-range-bounded, NOT row-count-bounded — plus exact
    (key, cents, cnt) partials (cents cardinality is range-bounded
    too). The partials are materialized (tiny — the histogram, never
    the rows); under ``driver_limit`` total partial rows the driver
    folds them with one pyarrow group_by (no all-to-all at all),
    above it one slim distributed groupby-Sum folds them first. The
    driver reads off quantiles from the two tiny histograms either
    way. No sort, no all-to-all of raw rows.
    """
    from ray.data.aggregate import Sum

    def bucketize(batch: pa.Table) -> pa.Table:
        """ONE pass emits BOTH histograms as tagged kinds (ex=0 sketch
        buckets, ex=1 exact cents) so the input is read once."""
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        cents = np.rint(np.asarray(v, dtype=np.float64) * scale) \
            .astype(np.int64)
        m = _bit_length_np(np.maximum(cents, 0)) - 1       # msb position
        sh = np.maximum(m - sub_bits, 0)
        lo = np.where(cents >= 1, (cents >> sh) << sh, cents)
        k = batch.column(key)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        both = pa.table({
            key: pa.concat_arrays([k, k]),
            "ex": pa.array(np.repeat(np.array([0, 1], np.int64),
                                     cents.size), pa.int64()),
            "lo": pa.array(np.concatenate([lo, cents]), pa.int64())})
        g = (both.group_by([key, "ex", "lo"])
             .aggregate([([], "count_all")])
             .rename_columns([key, "ex", "lo", "cnt"]))
        return g

    def readoff(hist, name: str) -> dict:
        """(key, lo, cnt) pandas -> {(key, p_ppm): quantile}."""
        out = {}
        for kv, g in hist.groupby(key, sort=True):
            g = g.sort_values("lo")
            lo = g["lo"].to_numpy(np.int64)
            cum = g["cnt"].to_numpy(np.int64).cumsum()
            n = int(cum[-1])
            for p in ps_ppm:
                idx = int(np.searchsorted(cum * 1_000_000, p * n))
                out[(kv, p)] = int(lo[idx])
            out[(kv, "n")] = n
        return out

    parts = ds.map_batches(bucketize, batch_format="pyarrow").materialize()
    if parts.count() <= driver_limit:
        raw = pa.concat_tables(
            [pa.Table.from_pandas(b) if not isinstance(b, pa.Table) else b
             for b in parts.iter_batches(batch_size=None,
                                         batch_format="pyarrow")]) \
            if parts.count() else pa.table(
                {key: pa.array([], pa.string()),
                 "ex": pa.array([], pa.int64()),
                 "lo": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())})
        hist = (raw.group_by([key, "ex", "lo"])
                .aggregate([("cnt", "sum")])
                .rename_columns([key, "ex", "lo", "cnt"])
                .to_pandas())
    else:
        hist = (parts.groupby([key, "ex", "lo"])
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas())
    sketch = hist[hist["ex"] == 0]
    exact = hist[hist["ex"] == 1]
    cols = {key: [], "p_ppm": [], "n": [], "est_cents": [],
            "exact_cents": [], "err_ppm": []}
    if len(sketch):
        est_map, ex_map = readoff(sketch, "est"), readoff(exact, "exact")
        for kv in sorted(set(sketch[key])):
            for p in ps_ppm:
                e, x = est_map[(kv, p)], ex_map[(kv, p)]
                cols[key].append(kv)
                cols["p_ppm"].append(p)
                cols["n"].append(est_map[(kv, "n")])
                cols["est_cents"].append(e)
                cols["exact_cents"].append(x)
                cols["err_ppm"].append((x - e) * 1_000_000 // max(x, 1))
    return pa.table({key: pa.array(cols[key], pa.string()),
                     "p_ppm": pa.array(cols["p_ppm"], pa.int64()),
                     "n": pa.array(cols["n"], pa.int64()),
                     "est_cents": pa.array(cols["est_cents"], pa.int64()),
                     "exact_cents": pa.array(cols["exact_cents"],
                                             pa.int64()),
                     "err_ppm": pa.array(cols["err_ppm"], pa.int64())})


def kmv_set_ops(ds, col: str, filter_col: str, val_a: str, val_b: str,
                k: int = 256) -> pa.Table:
    """KMV set-operation estimates (Beyer et al., SIGMOD'07) between two
    sub-populations: the distinct-``col`` sets A (rows where
    ``filter_col == val_a``) and B (``== val_b``) each keep a bottom-k
    mix64 sketch; bottom-k of the UNION of two bottom-k sets IS the
    union's bottom-k, and the intersection estimate is the Jaccard
    read-off ``|K_U ∩ K_A ∩ K_B| * est_union // |K_U|`` — below k
    distinct the sketches are exact and every estimate collapses to the
    true value. The exact intersection rides along as the error report.

    Scale shape: sketches build map-side (per-block bottom-k per tag,
    O(k) output, ZERO shuffle — the kmv_distinct idiom) with one tiny
    driver merge; only the exact-intersection report takes a shuffle,
    one groupby over DISTINCT values (drop it at true scale and the
    sketch path is shuffle-free). Integer arithmetic end-to-end."""
    from ray.data.aggregate import Max

    def local(batch: pa.Table) -> pa.Table:
        """ONE pass emits both the bottom-k sketch partials (kind 0,
        value = hash) and the distinct-value presence partials
        (kind 1, value = raw id, in_a/in_b bits) so the input is read
        once — the tagged-kind idiom."""
        import pyarrow.compute as pc

        parts = []
        for tag, val in ((0, val_a), (1, val_b)):
            v = batch.filter(pc.equal(batch.column(filter_col), val)) \
                .column(col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            iv = np.unique(np.asarray(v.cast(pa.int64()), dtype=np.int64))
            h = np.unique(_mix64_np(iv.view(np.uint64)))
            h = h[:k] if h.size > k else h
            parts.append(pa.table({
                "kind": pa.array(np.zeros(h.size, np.int8), pa.int8()),
                "tag": pa.array(np.full(h.size, tag, np.int8), pa.int8()),
                "v": pa.array(h.astype(np.int64), pa.int64()),
                "in_a": pa.array(np.zeros(h.size, np.int64)),
                "in_b": pa.array(np.zeros(h.size, np.int64))}))
            parts.append(pa.table({
                "kind": pa.array(np.ones(iv.size, np.int8), pa.int8()),
                "tag": pa.array(np.zeros(iv.size, np.int8), pa.int8()),
                "v": pa.array(iv, pa.int64()),
                "in_a": pa.array(np.full(iv.size, 1 - tag, np.int64)),
                "in_b": pa.array(np.full(iv.size, tag, np.int64))}))
        return pa.concat_tables(parts)

    stream = ds.map_batches(local, batch_format="pyarrow").materialize()
    merged: dict = {0: set(), 1: set()}
    sk = stream.filter(expr="kind == 0")
    for b in sk.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        for t, h in zip(b.column("tag").to_pylist(),
                        b.column("v").to_pylist()):
            merged[t].add(h if h >= 0 else h + (1 << 64))
    ka = sorted(merged[0])[:k]
    kb = sorted(merged[1])[:k]
    ku = sorted(set(ka) | set(kb))[:k]

    def est(bk: list) -> int:
        if len(bk) < k:
            return len(bk)
        return (k - 1) * (1 << 64) // bk[-1]

    sa, sb = set(ka), set(kb)
    both = sum(1 for h in ku if h in sa and h in sb)
    est_union = est(ku)
    est_inter = both * est_union // max(len(ku), 1)

    # exact intersection (the error report): one groupby over the same
    # stream's DISTINCT-value presence rows, max-folding per-tag bits
    pres = (stream.filter(expr="kind == 1")
            .groupby("v").aggregate(Max("in_a", alias_name="in_a"),
                                    Max("in_b", alias_name="in_b")))

    def cnt_both(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("in_a"), dtype=np.int64)
        b = np.asarray(batch.column("in_b"), dtype=np.int64)
        return pa.table({"c": pa.array([int((a & b).sum())], pa.int64())})

    exact_inter = int(pres.map_batches(cnt_both, batch_format="pyarrow")
                      .to_pandas()["c"].sum())

    return pa.table({
        "est_a": pa.array([est(ka)], pa.int64()),
        "est_b": pa.array([est(kb)], pa.int64()),
        "est_union": pa.array([est_union], pa.int64()),
        "est_inter": pa.array([est_inter], pa.int64()),
        "exact_inter": pa.array([exact_inter], pa.int64()),
    })


_PROFILE_KINDS = ("int", "cents", "ts", "str")


def profile_table(ds, spec: dict, p: int = 8) -> pa.Table:
    """Data-quality column profiler — the first pass of any large-scale
    ingest: for every column, row count, null count, HLL distinct-count
    estimate (p=8, the hll_distinct integer estimator) and integer
    min/max over the column's canonical integer view (``spec`` maps
    column -> 'int' | 'cents' (round_even x100) | 'ts' (epoch us) |
    'str' (byte length for min/max; fnv1a for hashing)).

    Scale shape: ONE map pass emits, per block and column, <= 2^p
    register partials plus four scalar partials (tagged kinds on one
    stream); ONE bounded groupby (|cols| x (2^p + 4) keys) folds them
    with kind-appropriate aggregates (Max for registers/max, Sum for
    counts, Min for min); the driver assembles |cols| rows and runs
    the rational-alpha HLL estimator in Python bigints. Nothing
    row-count-sized moves or lands on the driver."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    from .text_analysis import _fnv1a_bulk

    bad = {c: k for c, k in spec.items() if k not in _PROFILE_KINDS}
    if bad:
        raise ValueError(f"unknown profile kinds: {bad}")
    m = 1 << p
    q = 64 - p
    mask = np.uint64((1 << q) - 1)
    cols = sorted(spec)
    I64MAX = np.iinfo(np.int64).max
    I64MIN = np.iinfo(np.int64).min

    def int_view(arr: pa.ChunkedArray, kind: str) -> np.ndarray:
        """Null-free canonical int64 view of a column."""
        from .window import _epoch_us

        arr = arr.drop_null()
        if kind == "cents":
            return np.rint(np.asarray(arr, dtype=np.float64) * 100) \
                .astype(np.int64)
        if kind == "str":
            # CHARACTER length (pc.utf8_length), matching DuckDB's
            # length() — binary_length would diverge on non-ASCII
            return np.asarray(pc.utf8_length(arr).cast(pa.int64()),
                              dtype=np.int64)
        if kind == "ts":
            return _epoch_us(arr)  # unit-aware, matches SQL epoch_us
        return np.asarray(arr.cast(pa.int64()), dtype=np.int64)

    def hashes(arr: pa.ChunkedArray, kind: str,
               iv: np.ndarray) -> np.ndarray:
        if kind == "str":
            # registers only need DISTINCT hashes — dedupe in C first
            # (low-cardinality string columns hash a handful of values
            # per block instead of every row)
            uniq = pc.unique(arr.drop_null())
            f = np.asarray(_fnv1a_bulk(uniq.to_pylist()),
                           dtype=np.uint64)
            return _mix64_np(f)
        if iv.size and iv.min() < 0:
            raise ValueError("profile_table requires a non-negative "
                             "integer view for HLL hashing")
        return _mix64_np(iv.view(np.uint64))

    def partials(batch: pa.Table) -> pa.Table:
        out_c, out_k, out_r = [], [], []
        out_s, out_mx, out_mn = [], [], []

        def emit(c, k, r, s=0, mx=I64MIN, mn=I64MAX):
            out_c.append(c); out_k.append(k); out_r.append(r)
            out_s.append(s); out_mx.append(mx); out_mn.append(mn)

        for c in cols:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            kind = spec[c]
            iv = int_view(col, kind)
            emit(c, 1, 0, s=len(col))
            emit(c, 2, 0, s=col.null_count)
            if iv.size:
                emit(c, 3, 0, mn=int(iv.min()))
                emit(c, 4, 0, mx=int(iv.max()))
                h = hashes(col, kind, iv)
                reg = (h >> np.uint64(q)).astype(np.int64)
                w = h & mask
                rho = np.where(w > 0,
                               q - (_bit_length_np(
                                   w.astype(np.int64)) - 1),
                               q + 1).astype(np.int64)
                order = np.lexsort((-rho, reg))
                first = np.concatenate(
                    ([True], reg[order][1:] != reg[order][:-1]))
                for r, rh in zip(reg[order][first],
                                 rho[order][first]):
                    emit(c, 0, int(r), mx=int(rh))
        return pa.table({"col": pa.array(out_c, pa.string()),
                         "kind": pa.array(out_k, pa.int8()),
                         "reg": pa.array(out_r, pa.int64()),
                         "vs": pa.array(out_s, pa.int64()),
                         "vmax": pa.array(out_mx, pa.int64()),
                         "vmin": pa.array(out_mn, pa.int64())})

    folded = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["col", "kind", "reg"])
              .aggregate(Sum("vs", alias_name="vs"),
                         Max("vmax", alias_name="vmax"),
                         Min("vmin", alias_name="vmin"))
              .to_pandas())
    rows = {"column": [], "n": [], "n_null": [], "n_distinct_est": [],
            "min_i": [], "max_i": []}
    for c in cols:
        g = folded[folded["col"] == c]
        sc = {int(k): r for k, r in
              g[g["kind"] > 0].set_index("kind").iterrows()}
        regs = g[g["kind"] == 0]
        filled = len(regs)
        s_val = ((m - filled) * (1 << (q + 1))
                 + sum(1 << (q + 1 - int(r)) for r in regs["vmax"]))
        est = (7213 * m ** 3 * (1 << (q + 1))
               // (10 * (1000 * m + 1079) * s_val))
        rows["column"].append(c)
        rows["n"].append(int(sc[1]["vs"]))
        rows["n_null"].append(int(sc[2]["vs"]))
        rows["n_distinct_est"].append(est if filled else 0)
        rows["min_i"].append(int(sc[3]["vmin"]) if 3 in sc else 0)
        rows["max_i"].append(int(sc[4]["vmax"]) if 4 in sc else 0)
    return pa.table({k: pa.array(v, pa.string() if k == "column"
                                 else pa.int64())
                     for k, v in rows.items()})
