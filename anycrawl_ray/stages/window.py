"""Per-key ordered window operators: as-of join, range join, running
totals, exact group quantiles.

These are the operator classes Ray Data has no built-in for (the brief's
"as-of join, range join, windowed aggregate" list). All follow the same
scale shape:

- ``asof_join`` / ``range_join_count`` / ``running_total``: ONE hash
  shuffle co-locates rows, but NOT one group per key — per-key groups are
  tiny and ``map_groups`` pays per-group pandas overhead (measured ~4 ms/
  group: 1,500 user keys cost ~5 s). Keys are bucketed by ``mix64(key) %
  n_buckets`` so the shuffle produces a few hundred FAT groups, and the
  per-bucket kernel is numpy over key segments (one lexsort, one pandas
  copy per bucket, vectorized searchsorted/cumsum per segment). The
  partitioning assumption is the usual one for keyed windows: a single
  key's history fits in a worker; for hotter keys,
  ``running_total_salted`` implements the salting escape hatch (shuffle
  on (key, coarse chunk) + exact carry-in offsets).
- ``group_quantiles``: EXACT quantiles without a global sort. Values are
  fixed-point (cents) so a map-side ``(key, cents) -> count`` partial
  collapses each block to the value histogram; the merged histogram is
  tiny (bounded by value-range x 100 per key, independent of row count),
  and the quantile is read off the cumulative counts with
  ``percentile_disc`` semantics (element at ceil(p*n), 1-indexed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .text_analysis import _mix64_np


def _default_buckets() -> int:
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    return max(16, min(512, cpus * 4))


def _bucket_col(batch: pa.Table, key: str, n_buckets: int) -> pa.Table:
    kv = batch.column(key)
    if isinstance(kv, pa.ChunkedArray):
        kv = kv.combine_chunks()
    arr = np.asarray(kv.cast(pa.int64()), dtype=np.int64)
    kb = (_mix64_np(arr.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int64)
    return batch.append_column("_kb", pa.array(kb, pa.int64()))


def tag_sides(ds, side_fn, key: str, n_buckets: int | None = None,
              keep_cols: list[str] | None = None):
    """Single-pass side tagging for co-keyed joins whose two sides come
    from the SAME source: ``side_fn(batch) -> int8 array`` (0 = left, 1 =
    right, negative = drop). One scan replaces the two filtered re-reads
    the two-dataset form costs (both sides of an events self-join were
    scanning the parquet twice). ``keep_cols`` prunes the rows BEFORE the
    shuffle (e.g. drop the event_type strings the side decision consumed)
    — pass out_cols + [key, ts]. Pass the result as ``tagged_ds``."""
    nb = n_buckets or _default_buckets()

    def fn(batch: pa.Table) -> pa.Table:
        side = np.asarray(side_fn(batch), dtype=np.int8)
        t = batch.append_column("_side", pa.array(side, pa.int8()))
        t = t.filter(pa.array(side >= 0))
        if keep_cols is not None:
            t = t.select(list(dict.fromkeys(keep_cols)) + ["_side"])
        return _bucket_col(t, key, nb)

    return ds.map_batches(fn, batch_format="pyarrow")


def _cokeyed_buckets(left_ds, right_ds, key: str, ts_col: str,
                     out_cols: list[str], bucket_fn, n_buckets: int | None,
                     tagged_ds=None):
    """Shared co-keyed two-sided shuffle: tag + union both inputs (or take
    a pre-tagged single-scan dataset from ``tag_sides``), bucket keys by
    hash, ONE ``groupby(_kb)`` co-locates every key's rows from both sides
    into a few hundred fat groups, then ``bucket_fn(left_df, lkeys, lts,
    rkeys_sorted, rts_sorted) -> result column`` runs numpy over per-key
    segments inside each bucket."""
    nb = n_buckets or _default_buckets()

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "_side", pa.array([side] * len(batch), pa.int8()))
        return fn

    if tagged_ds is not None:
        unioned = tagged_ds
    else:
        cols = sorted(set(out_cols) | {key, ts_col})
        left_types = {f.name: f.type for f in left_ds.schema().base_schema}
        left_t = left_ds.map_batches(tag(0), batch_format="pyarrow")
        right_t = right_ds.select_columns([key, ts_col]).map_batches(
            tag(1), batch_format="pyarrow")
        # align schemas for union: right side pads left-only cols with
        # typed zero values, NOT nulls — pandas would promote a nullable
        # int64 group column to float64 inside map_groups (the pad rows
        # are dropped there)
        def widen(batch: pa.Table) -> pa.Table:
            out = {}
            for c in cols:
                if c in batch.schema.names:
                    out[c] = batch.column(c)
                else:
                    t = left_types[c]
                    zero = pa.scalar(0, t) if pa.types.is_integer(t) else None
                    out[c] = pa.array(
                        [zero.as_py() if zero is not None else None]
                        * len(batch), t)
            out["_side"] = batch.column("_side")
            return _bucket_col(pa.table(out), key, nb)

        unioned = left_t.map_batches(widen, batch_format="pyarrow").union(
            right_t.map_batches(widen, batch_format="pyarrow"))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        lmask = side == 0
        # empty-left buckets still flow through bucket_fn so every block
        # carries the full output schema incl. the result column
        left = group[lmask]
        lorder = np.argsort(left[key].to_numpy(), kind="stable")
        left = left.iloc[lorder]
        right = group[~lmask]
        rorder = np.lexsort((right[ts_col].to_numpy(),
                             right[key].to_numpy()))
        rkeys = right[key].to_numpy()[rorder]
        rts = right[ts_col].to_numpy()[rorder]
        return bucket_fn(left, left[key].to_numpy(),
                         left[ts_col].to_numpy(), rkeys, rts)

    return unioned.groupby("_kb").map_groups(per_bucket)


def _key_segments(lkeys: np.ndarray, rkeys: np.ndarray):
    """Per-unique-left-key index bounds into the (key-sorted) left rows
    and the (key,ts)-sorted right rows."""
    uk, starts = np.unique(lkeys, return_index=True)
    lbounds = np.append(starts, lkeys.size)
    rs = np.searchsorted(rkeys, uk, side="left")
    re = np.searchsorted(rkeys, uk, side="right")
    return uk, lbounds, rs, re


def asof_join(left_ds, right_ds, key: str, ts_col: str,
              out_cols: list[str], prior_col: str = "prior_ts",
              n_buckets: int | None = None, tagged_ds=None):
    """For every left row, attach the greatest right ``ts_col`` <= the left
    row's ts within the same ``key`` (NULL when none) — the classic as-of
    join. Per-segment kernel: one vectorized ``np.searchsorted`` of left
    timestamps into the key's sorted right timestamps."""

    def bucket_fn(left: pd.DataFrame, lkeys, lts, rkeys, rts) -> pd.DataFrame:
        out = left[out_cols].copy()
        is_dt = np.issubdtype(lts.dtype, np.datetime64)
        is_int = np.issubdtype(lts.dtype, np.integer)
        prior = np.zeros(lts.size, dtype=lts.dtype if (is_dt or is_int)
                         else np.float64)
        missing = np.ones(lts.size, dtype=bool)
        if rts.size:
            uk, lb, rs, re = _key_segments(lkeys, rkeys)
            for i in range(uk.size):
                ls, le = lb[i], lb[i + 1]
                seg = rts[rs[i]:re[i]]
                if seg.size == 0:
                    continue
                pos = np.searchsorted(seg, lts[ls:le], side="right") - 1
                prior[ls:le] = seg[np.maximum(pos, 0)]
                missing[ls:le] = pos < 0
        if is_dt:
            prior = prior.copy()
            prior[missing] = np.datetime64("NaT")
            out[prior_col] = prior
        elif is_int:
            # nullable Int64 keeps exact int values (a float64 column
            # would silently round ts values above 2^53)
            out[prior_col] = pd.arrays.IntegerArray(
                prior.astype(np.int64), mask=missing)
        else:
            out[prior_col] = np.where(missing, np.nan,
                                      prior.astype(np.float64))
        return out

    return _cokeyed_buckets(left_ds, right_ds, key, ts_col, out_cols,
                            bucket_fn, n_buckets, tagged_ds=tagged_ds)


def range_join_count(left_ds, right_ds, key: str, ts_col: str,
                     out_cols: list[str], low, high,
                     count_col: str = "n_in_range",
                     n_buckets: int | None = None, tagged_ds=None):
    """Keyed RANGE join (count form): for every left row, the number of
    right rows with ``l.ts + low < r.ts <= l.ts + high`` in the same key —
    a band/interval join, the non-equi class Ray Data has no built-in
    for. Two vectorized binary searches per key segment (half-open
    interval, so low=0 means strictly-after)."""

    def bucket_fn(left: pd.DataFrame, lkeys, lts, rkeys, rts) -> pd.DataFrame:
        out = left[out_cols].copy()
        counts = np.zeros(lts.size, dtype=np.int64)
        if rts.size:
            uk, lb, rs, re = _key_segments(lkeys, rkeys)
            for i in range(uk.size):
                ls, le = lb[i], lb[i + 1]
                seg = rts[rs[i]:re[i]]
                if seg.size == 0:
                    continue
                lo = np.searchsorted(seg, lts[ls:le] + low, side="right")
                hi = np.searchsorted(seg, lts[ls:le] + high, side="right")
                counts[ls:le] = hi - lo
        out[count_col] = counts
        return out

    return _cokeyed_buckets(left_ds, right_ds, key, ts_col, out_cols,
                            bucket_fn, n_buckets, tagged_ds=tagged_ds)


def running_total(ds, key: str, order_cols: list[str], cents_col: str,
                  out_cols: list[str], total_col: str = "running_cents",
                  n_buckets: int | None = None):
    """Per-key ordered cumulative sum (the SUM() OVER (PARTITION BY key
    ORDER BY ...) window): keys hash into buckets (fat groups), one
    lexsort per bucket orders (key, *order_cols), and the per-key
    cumulative is a single vectorized cumsum with segment-start rebasing —
    no per-key Python at all. ``cents_col`` must be integer (fixed-point)
    so the cumulative is exact."""
    nb = n_buckets or _default_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        return _bucket_col(batch, key, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        keys = group[key].to_numpy()
        order = np.lexsort(tuple(group[c].to_numpy()
                                 for c in reversed(order_cols)) + (keys,))
        g = group.iloc[order]
        gk = keys[order]
        c = g[cents_col].to_numpy(dtype=np.int64)
        out = g[out_cols].copy()
        out[total_col] = _segment_cumsum(
            np.concatenate(([True], gk[1:] != gk[:-1])), c)
        return out

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("_kb").map_groups(per_bucket)


def _segment_cumsum(boundary: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Cumulative sum rebased at each segment start (boundary[i] True
    marks a start). The base is indexed per segment id — values may be
    negative, so no accumulate tricks over the running sum itself.
    Empty-safe. Shared by running_total, running_total_salted's carry
    offsets and its per-bucket kernel."""
    s = np.cumsum(values)
    if values.size == 0:
        return s.astype(np.int64)
    starts = np.flatnonzero(boundary)
    seg_id = np.cumsum(boundary) - 1
    seg_base = np.concatenate(([0], s[starts[1:] - 1])) \
        if starts.size > 1 else np.zeros(1, dtype=np.int64)
    return s - seg_base[seg_id]


def group_quantiles(ds, key: str, value_col: str, ps: list[float],
                    scale: int = 100):
    """Exact per-key quantiles of a float value via fixed-point histogram:
    map-side (key, cents)->count partials (Arrow group_by per batch), a
    tiny merge (histogram cardinality is value-range-bounded, not
    row-count-bounded), then percentile_disc(p) = smallest cents whose
    cumulative count >= ceil(p * n). Returns one row per key:
    (key, n, q<p> for each p)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        cents = np.rint(np.asarray(vals, dtype=np.float64) * scale).astype(np.int64)
        t = pa.table({key: batch.column(key),
                      "cents": pa.array(cents, pa.int64())})
        return t.group_by([key, "cents"]).aggregate([("cents", "count")]) \
            .rename_columns([key, "cents", "n"])

    hist = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    # merge partial histograms (tiny: one row per distinct (key, cents))
    hist = hist.group_by([key, "cents"]).aggregate([("n", "sum")]) \
        .rename_columns([key, "cents", "n"])
    df = hist.to_pandas().sort_values([key, "cents"])
    rows = []
    for k, g in df.groupby(key, sort=True):
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {key: k, "n": n}
        for p in ps:
            pos = int(np.ceil(p * n))
            idx = int(np.searchsorted(cum, pos, side="left"))
            row[f"q{int(p * 100)}_cents"] = int(g["cents"].iloc[idx])
        rows.append(row)
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out, preserve_index=False)


def running_total_salted(ds, key: str, order_cols: list[str],
                         cents_col: str, out_cols: list[str],
                         chunk_col: str, total_col: str = "running_cents",
                         n_buckets: int | None = None):
    """Hot-key-salted per-key running total — the documented salting seam
    of ``running_total``, implemented: when a single key's history is too
    hot for one worker, shuffle on (key, chunk) instead of key alone and
    stitch chunks back with carry-in offsets.

    ``chunk_col`` must be monotone non-decreasing in ``order_cols`` within
    a key (e.g. the day of a timestamp when ordering by timestamp) — that
    makes per-chunk local cumsums + an exclusive prefix over per-chunk
    totals equal the global per-key cumulative, exactly (integer cents).

    Stages: (1) one narrow Arrow group_by pass collects per-(key, chunk)
    cent totals (tiny: keys x chunks rows), merged once and turned into
    exclusive carry-in offsets; (2) the salted shuffle buckets
    mix64(key) ^ mix64(chunk)*GOLDEN so a hot key spreads across chunk
    buckets; per-bucket kernels cumsum locally; (3) a vectorized
    pandas-merge adds each row's carry-in. Equality with the unsalted
    operator is pinned by test."""
    import ray

    nb = n_buckets or _default_buckets()
    golden = np.uint64(0x9E3779B97F4A7C15)
    # stage 2 re-consumes the input after stage 1's totals pass —
    # materialize ONCE so the lineage doesn't execute twice (and offsets
    # from pass 1 can never meet differently-computed rows in pass 2)
    ds = ds.materialize()

    # ---- stage 1: per-(key, chunk) totals -> exclusive carry-in offsets
    def totals_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key),
                      chunk_col: batch.column(chunk_col),
                      cents_col: batch.column(cents_col)})
        return t.group_by([key, chunk_col]).aggregate([(cents_col, "sum")]) \
            .rename_columns([key, chunk_col, "tot"])

    parts = list(ds.map_batches(totals_partial, batch_format="pyarrow")
                 .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        # empty input: a typed empty result (the lazy pipeline would lose
        # its schema entirely in Ray's empty-dataset representation)
        import ray.data as rd

        types = {f.name: f.type for f in ds.schema().base_schema}
        cols = {c: pa.array([], types[c]) for c in out_cols}
        cols[total_col] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(cols))
    totals = pa.concat_tables(parts).group_by([key, chunk_col]) \
        .aggregate([("tot", "sum")]).rename_columns([key, chunk_col, "tot"]) \
        .to_pandas().sort_values([key, chunk_col])
    tk = totals[key].to_numpy()
    tt = totals["tot"].to_numpy(dtype=np.int64)
    # carry-in for a chunk = running total of all EARLIER chunks of its key
    inclusive = _segment_cumsum(
        np.concatenate(([True], tk[1:] != tk[:-1])), tt)
    totals["carry"] = inclusive - tt
    offsets = totals[[key, chunk_col, "carry"]]
    off_ref = ray.put(offsets)

    # ---- stage 2: salted shuffle + local cumsum per (key, chunk)
    def add_salted_bucket(batch: pa.Table) -> pa.Table:
        kv = np.asarray(batch.column(key).cast(pa.int64()), dtype=np.int64)
        cv = np.asarray(batch.column(chunk_col).cast(pa.int64()),
                        dtype=np.int64)
        with np.errstate(over="ignore"):
            h = _mix64_np(kv.view(np.uint64)) ^ (
                _mix64_np(cv.view(np.uint64)) * golden)
        return batch.append_column(
            "_kb", pa.array((h % np.uint64(nb)).astype(np.int64), pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        keys = group[key].to_numpy()
        chunks = group[chunk_col].to_numpy()
        order = np.lexsort(tuple(group[c].to_numpy()
                                 for c in reversed(order_cols))
                           + (chunks, keys))
        g = group.iloc[order]
        gk, gc = keys[order], chunks[order]
        c = g[cents_col].to_numpy(dtype=np.int64)
        boundary = np.concatenate(
            ([True], (gk[1:] != gk[:-1]) | (gc[1:] != gc[:-1])))
        # dedup in case key/chunk_col are themselves requested outputs
        out = g[list(dict.fromkeys(out_cols + [key, chunk_col]))].copy()
        out["_local"] = _segment_cumsum(boundary, c)
        return out

    # ---- stage 3: vectorized carry-in merge
    def add_carry(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        off = ray.get(off_ref)
        merged = df.merge(off, on=[key, chunk_col], how="left")
        carry = merged["carry"].fillna(0).to_numpy(dtype=np.int64)
        out = {c: pa.array(merged[c]) for c in out_cols}
        out[total_col] = pa.array(merged["_local"].to_numpy(np.int64)
                                  + carry, pa.int64())
        return pa.table(out)

    return (ds.map_batches(add_salted_bucket, batch_format="pyarrow")
            .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
            .map_batches(add_carry, batch_format="pyarrow"))


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts",
                      week_us: int = 604_800_000_000,
                      n_buckets: int | None = None) -> pa.Table:
    """Cohort retention: cohort = a user's FIRST active week; for every
    (cohort_week, week_offset) count the users active in that week — the
    standard product-analytics retention triangle.

    ONE shuffle total: per-batch Arrow group_by first shrinks rows to
    distinct (user, week) pairs, users hash into fat mix64 buckets, and
    the bucket kernel (all rows of a user share its bucket) derives each
    user's cohort and emits per-(cohort, offset) partial counts with one
    lexsort + boundary arithmetic — users are PARTITIONED across buckets,
    so the partials are disjoint and the final merge is a tiny driver-side
    Arrow group_by sum (cohorts × offsets rows, not users)."""
    import pyarrow.compute as pc

    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        # divisor in the column's NATIVE tick unit — cast(int64) yields
        # ns/ms/us/s ticks depending on the parquet writer, while week_us
        # is specified in us (the SQL oracle's epoch_us)
        if isinstance(ts.type, pa.TimestampType):
            per_us = {"s": 1 / 1_000_000, "ms": 1 / 1_000,
                      "us": 1, "ns": 1_000}[ts.type.unit]
            div = int(week_us * per_us) if per_us >= 1 else \
                int(week_us // round(1 / per_us))
        else:
            div = week_us
        w = np.asarray(ts.cast(pa.int64()), dtype=np.int64) // div
        t = pa.table({user_col: batch.column(user_col),
                      "week": pa.array(w, pa.int64())})
        # distinct-per-batch before the shuffle: events >> (user, week)
        t = (t.group_by([user_col, "week"]).aggregate([([], "count_all")])
             .select([user_col, "week"]))
        return _bucket_col(t, user_col, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[user_col].to_numpy()
        w = group["week"].to_numpy()
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        # global distinct (user, week): batch partials can overlap
        keep = np.concatenate(([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        u, w = u[keep], w[keep]
        starts = np.concatenate(([True], u[1:] != u[:-1]))
        seg_id = np.cumsum(starts) - 1
        cohort = w[np.flatnonzero(starts)][seg_id]  # min week per user
        out = pd.DataFrame({"cohort_week": cohort, "week_offset": w - cohort})
        return (out.groupby(["cohort_week", "week_offset"], sort=False)
                .size().reset_index(name="n_users"))

    parts = list(ds.map_batches(prep, batch_format="pyarrow")
                 .groupby("_kb").map_groups(per_bucket,
                                            batch_format="pandas")
                 .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        return pa.table({"cohort_week": pa.array([], pa.int64()),
                         "week_offset": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    merged = (pa.concat_tables(parts)
              .group_by(["cohort_week", "week_offset"])
              .aggregate([("n_users", "sum")])
              .rename_columns(["cohort_week", "week_offset", "n_users"]))
    return merged.sort_by([("cohort_week", "ascending"),
                           ("week_offset", "ascending")]).select(
        ["cohort_week", "week_offset", "n_users"]).cast(
        pa.schema([("cohort_week", pa.int64()),
                   ("week_offset", pa.int64()),
                   ("n_users", pa.int64())]))


def running_total_auto(ds, key: str, order_cols: list[str], cents_col: str,
                       out_cols: list[str], chunk_col: str,
                       total_col: str = "running_cents",
                       hot_threshold: int = 1_000_000,
                       n_buckets: int | None = None):
    """Running total with AUTOMATIC hot-key salting: detect keys whose row
    count exceeds ``hot_threshold`` (map-side Arrow count partials + one
    slim distributed groupby-Sum — the only thing the driver sees is the
    hot-key list, bounded by total_rows/hot_threshold by construction) and
    route ONLY those through the salted (key, chunk) path; everything else
    takes the plain one-shuffle keyed path. No hot keys -> the plain plan,
    byte-for-byte. Callers no longer choose: skew routing is data-driven."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        return (pa.table({key: batch.column(key)})
                .group_by([key]).aggregate([([], "count_all")])
                .rename_columns([key, "n"]))

    # NOT materialized: the cold (no-hot-keys) path is the common case,
    # and it needs only TWO executions — counts+filter fused into one,
    # then the plain keyed plan over the original (cheap-to-replay)
    # lineage.  Materializing up front cost a third full execution that
    # only pays off when hot keys exist, so it moves into that branch.
    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby(key).aggregate(Sum("n", alias_name="n")))
    hot = counts.filter(expr=f"n >= {int(hot_threshold)}").to_pandas()
    if len(hot) == 0:
        return running_total(ds, key, order_cols, cents_col, out_cols,
                             total_col, n_buckets)
    # hot branch: the salted path's two stages re-read their input, so one
    # materialization here is shared by the hot/cold splits.  total_rows
    # comes from the materialized blocks' metadata — summing `counts`
    # would replay its whole lineage (scan + groupby) for a scalar.
    ds = ds.materialize()
    total_rows = int(ds.count())
    hot_rows = int(hot["n"].sum())
    hot_ref = ray.put(pa.array(hot[key]))

    from ..stages.dedup import _cached_get  # shared per-worker LRU

    def hot_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column(key),
                                     value_set=_cached_get(hot_ref)))

    def cold_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.is_in(
            batch.column(key), value_set=_cached_get(hot_ref))))

    salted = running_total_salted(
        ds.map_batches(hot_only, batch_format="pyarrow"), key, order_cols,
        cents_col, out_cols, chunk_col, total_col, n_buckets)
    if hot_rows == total_rows:  # every key hot: no cold branch to union
        return salted
    plain = running_total(ds.map_batches(cold_only, batch_format="pyarrow"),
                          key, order_cols, cents_col, out_cols, total_col,
                          n_buckets)
    return plain.union(salted)


def funnel(ds, key: str, ts_col: str, type_col: str, stages: list[str],
           within, n_buckets: int | None = None) -> pa.Table:
    """Funnel analysis — sequential per-key pattern matching: a key
    "reaches" stage i when it has a ``stages[i]`` event strictly after its
    stage i-1 time and within ``within`` of it (stage 0 = the key's first
    ``stages[0]`` event). Returns (stage_idx, stage, n_keys) — how many
    keys reach each stage.

    Scale shape: one scan keeps only funnel-stage events; keys hash into
    fat buckets (the usual keyed-window co-location); the per-bucket
    kernel walks each key segment ONCE over its (stage-major, ts-minor)
    sorted events with a searchsorted per stage — no joins, no repeated
    scans; per-bucket reach counts sum to a k-row table."""

    nb = n_buckets or _default_buckets()
    stage_of = {s: i for i, s in enumerate(stages)}
    n_stages = len(stages)

    def prep(batch: pa.Table) -> pa.Table:
        types = batch.column(type_col).to_pylist()
        sidx = np.fromiter((stage_of.get(t, -1) for t in types),
                           count=len(types), dtype=np.int8)
        t = pa.table({key: batch.column(key), ts_col: batch.column(ts_col),
                      "_stage": pa.array(sidx, pa.int8())})
        t = t.filter(pa.array(sidx >= 0))
        return _bucket_col(t, key, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized ACROSS keys: one lexsort, then per STAGE a single
        batched searchsorted over a (key_id, ts-rank) composite finds every
        surviving key's first strictly-later event at once — the per-key
        Python loop of the original kernel is gone (it dominated wall time
        on 100k-key buckets)."""
        keys = group[key].to_numpy()
        sidx = group["_stage"].to_numpy()
        ts = group[ts_col].to_numpy()
        order = np.lexsort((ts, sidx, keys))  # key -> stage -> ts
        keys, sidx, ts = keys[order], sidx[order], ts[order]
        reached = np.zeros(n_stages, dtype=np.int64)
        _, key_id = np.unique(keys, return_inverse=True)
        key_id = key_id.astype(np.int64)
        # stage 0: the first stage-0 event per key enters the funnel
        m0 = sidx == 0
        k0, t0 = key_id[m0], ts[m0]
        if k0.size == 0:
            return pd.DataFrame(
                {"stage_idx": np.arange(n_stages, dtype=np.int64),
                 "n": reached})
        first = np.concatenate(([True], k0[1:] != k0[:-1]))
        alive = k0[first]           # key ids still in the funnel, sorted
        t_prev = t0[first]          # their funnel clock
        reached[0] = alive.size
        for i in range(1, n_stages):
            if alive.size == 0:
                break
            mi = sidx == i
            ki, ti = key_id[mi], ts[mi]
            if ti.size == 0:
                # no stage-i events anywhere in the bucket: nobody advances
                # (guard needed — the batched indexing below is eager and
                # would index the empty array)
                break
            # rank space makes (key, ts) composable into ONE sorted int64
            # key: rank equality <=> value equality, so composite order ==
            # (key, ts) lexicographic order and one batched searchsorted
            # answers "first event of MY key strictly after MY clock"
            uniq, inv = np.unique(np.concatenate((ti, t_prev)),
                                  return_inverse=True)
            r_ti, r_q = inv[:ti.size], inv[ti.size:]
            m = np.int64(uniq.size + 2)
            comp_data = ki * m + r_ti
            comp_q = alive * m + r_q
            j = np.searchsorted(comp_data, comp_q, side="right")
            jc = np.minimum(j, max(comp_data.size - 1, 0))
            ok = (j < comp_data.size) & (ki[jc] == alive) \
                & (ti[jc] <= t_prev + within)
            alive = alive[ok]
            t_prev = ti[jc[ok]]
            reached[i] = alive.size
        return pd.DataFrame({"stage_idx": np.arange(n_stages, dtype=np.int64),
                             "n": reached})

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        totals = np.zeros(n_stages, dtype=np.int64)
    else:
        totals = parts.groupby("stage_idx")["n"].sum() \
            .reindex(range(n_stages), fill_value=0).to_numpy(dtype=np.int64)
    return pa.table({
        "stage_idx": pa.array(np.arange(n_stages, dtype=np.int32), pa.int32()),
        "stage": pa.array(stages, pa.string()),
        "n_keys": pa.array(totals, pa.int64()),
    })


def interarrival_stats(ds, key: str = "user_id", ts_col: str = "ts",
                       n_buckets: int | None = None) -> pa.Table:
    """Per-key inter-event gap statistics (count / sum / max of the
    consecutive time deltas) — the LAG() OVER (PARTITION BY key ORDER BY
    ts) window class, reference-free training-pipeline telemetry.

    Scale shape is the standard fat-bucket one-shuffle plan: keys hash
    into ``mix64 % n_buckets`` groups, ONE lexsort per bucket orders
    (key, ts), and every per-key aggregate falls out of vectorized
    ``np.diff`` + ``reduceat`` over segment starts — no per-key Python.
    Gaps are computed on the sorted-multiset timestamps, so ties need no
    tie-break: count/sum/max of consecutive diffs are tie-order-free.
    Output is one row per key with >= 2 events (keys are PARTITIONED
    across buckets, so bucket outputs are disjoint and the driver only
    concatenates + sorts the per-key result, not the events)."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        out = pa.table({key: batch.column(key),
                        "t_us": pa.array(_epoch_us(batch.column(ts_col)),
                                         pa.int64())})
        return _bucket_col(out, key, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy()
        t = group["t_us"].to_numpy(dtype=np.int64)
        if u.size == 0:
            return pd.DataFrame({key: np.empty(0, dtype=u.dtype),
                                 "n_gaps": np.empty(0, dtype=np.int64),
                                 "sum_gap_us": np.empty(0, dtype=np.int64),
                                 "max_gap_us": np.empty(0, dtype=np.int64)})
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        same = u[1:] == u[:-1]          # gap rows: same key as previous
        gaps = (t[1:] - t[:-1])[same]
        gu = u[1:][same]
        if gu.size == 0:
            return pd.DataFrame({key: np.empty(0, dtype=u.dtype),
                                 "n_gaps": np.empty(0, dtype=np.int64),
                                 "sum_gap_us": np.empty(0, dtype=np.int64),
                                 "max_gap_us": np.empty(0, dtype=np.int64)})
        starts = np.concatenate(([True], gu[1:] != gu[:-1]))
        idx = np.flatnonzero(starts)
        return pd.DataFrame({
            key: gu[idx],
            "n_gaps": np.diff(np.append(idx, gu.size)).astype(np.int64),
            "sum_gap_us": np.add.reduceat(gaps, idx).astype(np.int64),
            "max_gap_us": np.maximum.reduceat(gaps, idx).astype(np.int64),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    tbl = pa.Table.from_pandas(out, preserve_index=False) if len(out) else \
        pa.table({key: pa.array([], pa.int64()),
                  "n_gaps": pa.array([], pa.int64()),
                  "sum_gap_us": pa.array([], pa.int64()),
                  "max_gap_us": pa.array([], pa.int64())})
    return tbl.cast(pa.schema([(key, pa.int64()), ("n_gaps", pa.int64()),
                               ("sum_gap_us", pa.int64()),
                               ("max_gap_us", pa.int64())])) \
        .sort_by([(key, "ascending")])


def transition_matrix(ds, key: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      order_col: str = "event_id",
                      n_buckets: int | None = None) -> pa.Table:
    """Per-key event-type transition counts — for every key's event
    stream ordered by (ts, order_col), count each consecutive
    (prev_type -> next_type) bigram: the Markov-chain / user-path
    aggregate (LAG() OVER (PARTITION BY key ORDER BY ts, order_col)).

    Scale shape: the interarrival_stats fat-bucket plan — keys hash into
    mix64 buckets (ONE shuffle), one lexsort per bucket orders every
    key's events, the adjacency mask + a coded np.unique count the
    bigrams vectorized; each bucket emits at most |types|^2 partial rows
    and the driver merges a types^2-sized table, never the events."""
    import pyarrow.compute as pc

    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = np.asarray(ts.cast(pa.int64()), dtype=np.int64)
        out = pa.table({key: batch.column(key),
                        "t": pa.array(t, pa.int64()),
                        "o": pc.cast(batch.column(order_col), pa.int64()),
                        type_col: batch.column(type_col)})
        return _bucket_col(out, key, nb)

    empty = pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                          "next_type": pd.Series([], dtype=object),
                          "cnt": pd.Series([], dtype=np.int64)})

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy(np.int64)
        if u.size < 2:
            return empty.copy()
        t = group["t"].to_numpy(np.int64)
        o = group["o"].to_numpy(np.int64)
        types, code = np.unique(group[type_col].to_numpy(), return_inverse=True)
        order = np.lexsort((o, t, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        prev, nxt = code[:-1][same], code[1:][same]
        if prev.size == 0:
            return empty.copy()
        m = len(types)
        pair, cnt = np.unique(prev * m + nxt, return_counts=True)
        return pd.DataFrame({"prev_type": types[pair // m],
                             "next_type": types[pair % m],
                             "cnt": cnt.astype(np.int64)})

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb")
             .map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"prev_type": pa.array([], pa.string()),
                         "next_type": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    fin = (parts.groupby(["prev_type", "next_type"], as_index=False)["cnt"]
           .sum().sort_values(["prev_type", "next_type"])
           .reset_index(drop=True))
    return pa.table({"prev_type": pa.array(fin["prev_type"], pa.string()),
                     "next_type": pa.array(fin["next_type"], pa.string()),
                     "cnt": pa.array(fin["cnt"].astype("int64"),
                                     pa.int64())})


def _epoch_us(ts) -> np.ndarray:
    """Timestamp column -> int64 epoch microseconds, honoring the column's
    native tick unit (plain int64 columns pass through unchanged)."""
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    t = np.asarray(ts.cast(pa.int64()), dtype=np.int64)
    if isinstance(ts.type, pa.TimestampType):
        unit = ts.type.unit
        if unit == "ns":
            t = t // 1_000
        elif unit == "ms":
            t = t * 1_000
        elif unit == "s":
            t = t * 1_000_000
    return t


def _session_spans(u: np.ndarray, t: np.ndarray, gap_us: int):
    """(key, t_us) arrays -> per-session (key, start, end, n_events):
    lexsort by (key, t), break a session on key change or gap > gap_us
    (the strict-30-min house rule). Shared by session_window_overlap
    and peak_concurrency so both sessionize identically."""
    order = np.lexsort((t, u))
    u, t = u[order], t[order]
    new_key = np.concatenate(([True], u[1:] != u[:-1]))
    gap_brk = np.concatenate(([False], (t[1:] - t[:-1]) > gap_us))
    idx = np.flatnonzero(new_key | gap_brk)
    ends = np.append(idx[1:], u.size) - 1
    sn = np.diff(np.append(idx, u.size)).astype(np.int64)
    return u[idx], t[idx], t[ends], sn


def session_window_overlap(ds, windows: pa.Table, key: str = "user_id",
                           ts_col: str = "ts",
                           gap_us: int = 1_800_000_000,
                           n_buckets: int | None = None) -> pa.Table:
    """Interval OVERLAP join: gap-based per-key session intervals
    (closed [first_ts, last_ts]) against a small table of analysis
    windows (closed [ws_us, we_us]) — sessions and windows overlap iff
    ``s <= we AND e >= ws``. The reference class is campaign/window
    attribution over sessionized streams; Ray Data has no interval
    join, so this composes the engine's keyed-window machinery with a
    broadcast small side.

    Scale shape: ONE fat-bucket shuffle sessionizes every key (keys hash
    into ``mix64 % nb`` groups, sessions fall out of one lexsort + gap
    boundaries per bucket, all-numpy); the window table is tiny BY
    CONSTRUCTION (an analyst's window list), so the overlap test is a
    map-side broadcast — each bucket emits one partial row per window
    (n_sessions / n_events / n_users). Keys are partitioned across
    buckets, so bucket-local distinct users are globally distinct and
    the driver folds nb x |windows| partial rows, never sessions.
    Windows with no overlapping sessions still appear (zero counts)."""
    nb = n_buckets or _default_buckets()
    wid = np.asarray(windows.column("window_id"), dtype=np.int64)
    ws = np.asarray(windows.column("ws_us"), dtype=np.int64)
    we = np.asarray(windows.column("we_us"), dtype=np.int64)

    def prep(batch: pa.Table) -> pa.Table:
        out = pa.table({key: batch.column(key),
                        "t_us": pa.array(_epoch_us(batch.column(ts_col)),
                                         pa.int64())})
        return _bucket_col(out, key, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy(dtype=np.int64)
        t = group["t_us"].to_numpy(dtype=np.int64)
        if u.size == 0:
            return pd.DataFrame({"window_id": np.empty(0, np.int64),
                                 "n_sessions": np.empty(0, np.int64),
                                 "n_users": np.empty(0, np.int64),
                                 "n_events": np.empty(0, np.int64)})
        su, ss, se, sn = _session_spans(u, t, gap_us)
        n_sess = np.empty(wid.size, np.int64)
        n_ev = np.empty(wid.size, np.int64)
        n_usr = np.empty(wid.size, np.int64)
        for k in range(wid.size):  # |windows| is tiny by construction
            m = (ss <= we[k]) & (se >= ws[k])
            n_sess[k] = int(np.count_nonzero(m))
            n_ev[k] = int(sn[m].sum())
            n_usr[k] = int(np.unique(su[m]).size)
        return pd.DataFrame({"window_id": wid, "n_sessions": n_sess,
                             "n_users": n_usr, "n_events": n_ev})

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        fin = pd.DataFrame({"window_id": wid,
                            "n_sessions": np.zeros(wid.size, np.int64),
                            "n_users": np.zeros(wid.size, np.int64),
                            "n_events": np.zeros(wid.size, np.int64)})
    else:
        fin = (parts.groupby("window_id", as_index=False).sum()
               .set_index("window_id")
               .reindex(wid, fill_value=0).reset_index())
    fin = fin.sort_values("window_id").reset_index(drop=True)
    wo = np.argsort(wid)  # fin is reindexed over wid then id-sorted,
    # so its rows align with wid[wo] / ws[wo] / we[wo]
    return pa.table({
        "window_id": pa.array(fin["window_id"].astype("int64"), pa.int64()),
        "ws_us": pa.array(ws[wo], pa.int64()),
        "we_us": pa.array(we[wo], pa.int64()),
        "n_sessions": pa.array(fin["n_sessions"].astype("int64"), pa.int64()),
        "n_users": pa.array(fin["n_users"].astype("int64"), pa.int64()),
        "n_events": pa.array(fin["n_events"].astype("int64"), pa.int64()),
    })


def locf_hourly(ds, key: str = "user_id", ts_col: str = "ts",
                val_col: str = "value", id_col: str = "event_id",
                scale: int = 10_000,
                n_buckets: int | None = None) -> pa.Table:
    """Dense-grid gap fill with last-observation-carried-forward: every
    key gets an hourly grid spanning [first event hour, last event hour],
    each grid hour takes the value of the key's most recent event in an
    hour <= it (ties inside an hour break by (ts, id) — the latest wins),
    and the operator returns the per-key fold (n_hours, locf_sum in
    fixed-point) rather than the materialized grid. This is the sparse ->
    dense time-series regularization step (feature backfill ahead of
    windowed training data), a class Ray Data has no primitive for.

    Scale shape: ONE fat-bucket shuffle (``mix64(key) % nb``). Inside a
    bucket one lexsort orders (key, t, id); per-(key, hour) last values
    are segment ends, and the LOCF fold needs NO grid materialization —
    an entry at hour h carries weight (next entry's hour - h), the last
    entry weight 1, so ``locf_sum = sum(v * weight)`` per key via
    reduceat. Values are scaled to integers per row (round_even parity
    with the SQL oracle) before any sum, so the fold is order-free and
    exact at any scale; nothing grid-sized or key-sized ever leaves the
    buckets except one row per key."""
    nb = n_buckets or _default_buckets()
    us_per_hour = 3_600_000_000

    def prep(batch: pa.Table) -> pa.Table:
        vals = batch.column(val_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = np.rint(np.asarray(vals, dtype=np.float64) * scale).astype(
            np.int64)
        out = pa.table({key: batch.column(key),
                        "t_us": pa.array(_epoch_us(batch.column(ts_col)),
                                         pa.int64()),
                        "v": pa.array(v, pa.int64()),
                        "o": batch.column(id_col)})
        return _bucket_col(out, key, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: np.empty(0, np.int64),
                              "n_hours": np.empty(0, np.int64),
                              "locf_sum": np.empty(0, np.int64)})
        u = group[key].to_numpy(dtype=np.int64)
        if u.size == 0:
            return empty
        t = group["t_us"].to_numpy(dtype=np.int64)
        v = group["v"].to_numpy(dtype=np.int64)
        o = group["o"].to_numpy(dtype=np.int64)
        order = np.lexsort((o, t, u))
        u, v = u[order], v[order]
        h = t[order] // us_per_hour
        # per-(key, hour) last value = segment END under the total order
        seg_last = np.concatenate((
            (u[1:] != u[:-1]) | (h[1:] != h[:-1]), [True]))
        u2, h2, v2 = u[seg_last], h[seg_last], v[seg_last]
        key_end = np.concatenate((u2[1:] != u2[:-1], [True]))
        next_h = np.empty_like(h2)
        next_h[:-1] = h2[1:]
        next_h[key_end] = h2[key_end] + 1  # last entry covers its own hour
        w = next_h - h2
        starts = np.flatnonzero(np.concatenate(([True], u2[1:] != u2[:-1])))
        ends = np.append(starts[1:], u2.size) - 1
        return pd.DataFrame({
            key: u2[starts],
            "n_hours": (h2[ends] - h2[starts] + 1).astype(np.int64),
            "locf_sum": np.add.reduceat(v2 * w, starts).astype(np.int64)})

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({key: pa.array([], pa.int64()),
                         "n_hours": pa.array([], pa.int64()),
                         "locf_sum": pa.array([], pa.int64())})
    parts = parts.sort_values(key).reset_index(drop=True)
    return pa.table({key: pa.array(parts[key].astype("int64"), pa.int64()),
                     "n_hours": pa.array(parts["n_hours"].astype("int64"),
                                         pa.int64()),
                     "locf_sum": pa.array(parts["locf_sum"].astype("int64"),
                                          pa.int64())})


def late_arrivals(ds, key: str = "event_type", order_col: str = "event_id",
                  ts_col: str = "ts", threshold_us: int = 3_600_000_000,
                  n_chunks: int | None = None) -> pa.Table:
    """Watermark late-data detection over a GLOBAL arrival order: an
    event is late when the watermark — the max event time seen over all
    PRIOR arrivals (``order_col`` ascending) — is more than
    ``threshold_us`` ahead of it. The streaming-ingestion audit: how
    much data would a tumbling window with this allowed-lateness drop.

    This is a global running-max prefix scan, the order-partitioned
    cousin of the salted running total: arrivals split into CONTIGUOUS
    order-range chunks; a narrow first pass reduces each chunk to its
    max event time (map-side partials, one tiny groupby); the driver
    prefix-maxes the per-chunk maxima into exclusive carry-ins (one
    scalar per chunk — the only driver-side state); the second pass
    re-shuffles on the chunk id and counts late rows per (chunk, key)
    with a vectorized local prefix max seeded by the carry-in. Output
    is one row per key: (n_late, n_events)."""
    import ray
    from ray.data.aggregate import Max

    from .dedup import _cached_get

    nc = n_chunks or _default_buckets()

    def order_bounds(batch: pa.Table) -> pa.Table:
        o = np.asarray(batch.column(order_col), dtype=np.int64)
        if o.size == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(o.min())], pa.int64()),
                         "hi": pa.array([int(o.max())], pa.int64())})

    empty_out = pa.table({key: pa.array([], pa.string()),
                          "n_late": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64())})
    bounds = ds.map_batches(order_bounds, batch_format="pyarrow")
    lo_v = bounds.min("lo")
    if lo_v is None:
        return empty_out
    lo = int(lo_v)
    hi = int(bounds.max("hi"))
    width = max(1, (hi - lo) // nc + 1)

    def chunk_partials(batch: pa.Table) -> pa.Table:
        o = np.asarray(batch.column(order_col), dtype=np.int64)
        t = _epoch_us(batch.column(ts_col))
        ck = (o - lo) // width
        order = np.argsort(ck, kind="stable")
        ck, t = ck[order], t[order]
        start = np.concatenate(([True], ck[1:] != ck[:-1]))
        idx = np.flatnonzero(start)
        return pa.table({"ck": pa.array(ck[idx], pa.int64()),
                         "mx": pa.array(np.maximum.reduceat(t, idx)
                                        .astype(np.int64), pa.int64())})

    cmax = (ds.map_batches(chunk_partials, batch_format="pyarrow")
            .groupby("ck").aggregate(Max("mx", alias_name="mx"))
            .to_pandas().sort_values("ck"))
    # exclusive prefix max over ordered chunks -> per-chunk carry-in
    carry = np.full(nc + 1, np.iinfo(np.int64).min, dtype=np.int64)
    cks = cmax["ck"].to_numpy(np.int64)
    mxs = cmax["mx"].to_numpy(np.int64)
    dense = np.full(nc + 1, np.iinfo(np.int64).min, dtype=np.int64)
    dense[cks] = mxs
    carry[1:] = np.maximum.accumulate(dense[:-1])
    carry_ref = ray.put(carry)

    def tag_chunk(batch: pa.Table) -> pa.Table:
        o = np.asarray(batch.column(order_col), dtype=np.int64)
        ck = (o - lo) // width
        return pa.table({key: batch.column(key),
                         "o": pa.array(o, pa.int64()),
                         "t": pa.array(_epoch_us(batch.column(ts_col)),
                                       pa.int64()),
                         "_ck": pa.array(ck, pa.int64())})

    def per_chunk(group: pd.DataFrame) -> pd.DataFrame:
        k = group[key].to_numpy()
        if k.size == 0:
            return pd.DataFrame({key: pd.Series([], dtype=object),
                                 "n_late": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64)})
        o = group["o"].to_numpy(np.int64)
        t = group["t"].to_numpy(np.int64)
        order = np.argsort(o, kind="stable")
        k, t = k[order], t[order]
        ck = int(group["_ck"].iloc[0])
        seed = _cached_get(carry_ref)[ck]
        # watermark BEFORE each row = exclusive prefix max seeded by the
        # carry-in from all prior chunks
        wm = np.empty(t.size, dtype=np.int64)
        wm[0] = seed
        if t.size > 1:
            wm[1:] = np.maximum.accumulate(
                np.maximum(t[:-1], seed))
        # compare as wm > t + threshold: the first global chunk's seed is
        # int64 min, so (wm - t) would wrap
        late = wm > (t + threshold_us)
        types, code = np.unique(k, return_inverse=True)
        n_late = np.bincount(code, weights=late, minlength=types.size)
        n_all = np.bincount(code, minlength=types.size)
        return pd.DataFrame({key: types,
                             "n_late": n_late.astype(np.int64),
                             "n_events": n_all.astype(np.int64)})

    parts = (ds.map_batches(tag_chunk, batch_format="pyarrow")
             .groupby("_ck").map_groups(per_chunk, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return empty_out
    fin = (parts.groupby(key, as_index=False)[["n_late", "n_events"]].sum()
           .sort_values(key).reset_index(drop=True))
    return pa.table({key: pa.array(fin[key], pa.string()),
                     "n_late": pa.array(fin["n_late"].astype("int64"),
                                        pa.int64()),
                     "n_events": pa.array(fin["n_events"].astype("int64"),
                                          pa.int64())})


def first_touch_attribution(ds, user_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            type_col: str = "event_type",
                            conv_type: str = "purchase",
                            n_buckets: int | None = None) -> pa.Table:
    """First-touch attribution: credit every conversion (``conv_type``
    event) to the event type of the user's FIRST event ever (ordered by
    ``(ts, event_id)`` — the tie-break makes the argmin total). Output is
    one row per first-touch type: how many users entered through it and
    how many conversions those users produced.

    Scale shape (one shuffle, partial-argmin): each block reduces to at
    most one candidate row per user — the block-local argmin (first
    event) plus the block-local conversion count — so the shuffle carries
    O(users x blocks-touched) slim rows, never events. Users hash into
    fat mix64 buckets; the bucket kernel re-runs the same lexsort argmin
    over the candidates and emits per-type partials. Users are
    partitioned across buckets, so the driver merge folds
    (buckets x types) rows, not users.

    Reference class: the attribution joins the reference runs over its
    request-log events (AnyCrawl keys jobs to their seed/origin the same
    first-wins way, packages/scrape/src/Utils.ts uniqueKey semantics);
    here it is the standard product-analytics first-touch report."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column(user_col).combine_chunks()
                       if isinstance(batch.column(user_col), pa.ChunkedArray)
                       else batch.column(user_col), dtype=np.int64)
        t = _epoch_us(batch.column(ts_col))
        eid = np.asarray(batch.column(id_col), dtype=np.int64)
        typ = np.asarray(batch.column(type_col).to_pandas())
        order = np.lexsort((eid, t, u))
        us, ts_s, eid_s, typ_s = u[order], t[order], eid[order], typ[order]
        first = np.concatenate(([True], us[1:] != us[:-1]))
        fidx = np.flatnonzero(first)
        uu = us[fidx]
        conv = np.bincount(
            np.searchsorted(uu, us), weights=(typ_s == conv_type),
            minlength=uu.size).astype(np.int64)
        out = pa.table({user_col: pa.array(uu, pa.int64()),
                        "_ts": pa.array(ts_s[fidx], pa.int64()),
                        "_eid": pa.array(eid_s[fidx], pa.int64()),
                        "_typ": pa.array(typ_s[fidx], pa.string()),
                        "_conv": pa.array(conv, pa.int64())})
        return _bucket_col(out, user_col, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[user_col].to_numpy()
        t = group["_ts"].to_numpy()
        eid = group["_eid"].to_numpy()
        typ = group["_typ"].to_numpy()
        conv = group["_conv"].to_numpy()
        order = np.lexsort((eid, t, u))
        us = u[order]
        first = np.concatenate(([True], us[1:] != us[:-1]))
        fidx = np.flatnonzero(first)
        ftyp = typ[order][fidx]
        # per-user conversion totals across block partials
        seg = np.cumsum(first) - 1
        conv_tot = np.bincount(seg, weights=conv[order],
                               minlength=fidx.size).astype(np.int64)
        out = pd.DataFrame({"first_touch": ftyp, "conv": conv_tot})
        agg = (out.groupby("first_touch", sort=False)
               .agg(users=("conv", "size"), conversions=("conv", "sum"))
               .reset_index())
        return agg

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"first_touch": pa.array([], pa.string()),
                         "users": pa.array([], pa.int64()),
                         "conversions": pa.array([], pa.int64())})
    fin = (parts.groupby("first_touch", as_index=False)
           [["users", "conversions"]].sum()
           .sort_values("first_touch").reset_index(drop=True))
    return pa.table({
        "first_touch": pa.array(fin["first_touch"], pa.string()),
        "users": pa.array(fin["users"].astype("int64"), pa.int64()),
        "conversions": pa.array(fin["conversions"].astype("int64"),
                                pa.int64())})


def rfm_segments(ds, user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value",
                 day_us: int = 86_400_000_000) -> pa.Table:
    """RFM segmentation: per user, recency (whole days between the
    corpus max timestamp and the user's last event), frequency (event
    count) and monetary (exact cents sum); each metric is quartile-scored
    1..4 by ``1 + (v > q25) + (v > q50) + (v > q75)`` with
    ``percentile_disc`` cut values (an actual element — smallest value
    whose cumulative count reaches ceil(p*n)), so ties merge buckets
    deterministically on both engines. Scores ascend with the raw metric
    (recency score 4 = LONGEST-dormant users). Output: one row per
    (r_score, f_score, m_score) cell with its user count.

    Scale shape: blocks fold to per-user Arrow partials before the ONE
    user shuffle (Ray groupby Max/Sum/Sum), so the exchange carries
    O(users x blocks-touched) slim rows. The quartile cuts come from
    fixed-point value histograms (map-side (metric, value) -> count
    partials; the merged histogram is value-distinctness-bounded, not
    user-bounded — same contract as group_quantiles), and the final
    scoring pass is map-side against 9 broadcast scalars folding into at
    most 64 cells."""
    from ray.data.aggregate import Max, Sum

    def prep(batch: pa.Table) -> pa.Table:
        t_us = _epoch_us(batch.column(ts_col))
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        cents = np.rint(np.asarray(vals, dtype=np.float64) * 100) \
            .astype(np.int64)
        t = pa.table({user_col: batch.column(user_col),
                      "_t": pa.array(t_us, pa.int64()),
                      "_c": pa.array(cents, pa.int64())})
        return (t.group_by(user_col)
                .aggregate([("_t", "max"), ("_c", "sum"), ([], "count_all")])
                .rename_columns([user_col, "_t", "_c", "_n"]))

    peru = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby(user_col)
            .aggregate(Max("_t", alias_name="umax"),
                       Sum("_n", alias_name="f"),
                       Sum("_c", alias_name="m"))
            .materialize())
    gmax = peru.max("umax")
    if gmax is None:
        return pa.table({"r_score": pa.array([], pa.int64()),
                         "f_score": pa.array([], pa.int64()),
                         "m_score": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    gmax = int(gmax)

    def metrics(batch: pa.Table) -> pa.Table:
        r = (gmax - np.asarray(batch.column("umax"), dtype=np.int64)) \
            // day_us
        return pa.table({"r": pa.array(r, pa.int64()),
                         "f": batch.column("f").cast(pa.int64()),
                         "m": batch.column("m").cast(pa.int64())})

    def hist_partial(batch: pa.Table) -> pa.Table:
        m = metrics(batch)
        parts = []
        for code, col in enumerate(("r", "f", "m")):
            t = pa.table({"metric": pa.array(
                np.full(m.num_rows, code, np.int64), pa.int64()),
                "v": m.column(col)})
            parts.append(t.group_by(["metric", "v"])
                         .aggregate([([], "count_all")])
                         .rename_columns(["metric", "v", "n"]))
        return pa.concat_tables(parts)

    hist = pa.concat_tables(
        peru.map_batches(hist_partial, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    hist = (hist.group_by(["metric", "v"]).aggregate([("n", "sum")])
            .rename_columns(["metric", "v", "n"]).to_pandas()
            .sort_values(["metric", "v"]))
    cuts = {}
    for code, col in enumerate(("r", "f", "m")):
        g = hist[hist["metric"] == code]
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        cs = []
        for p in (0.25, 0.50, 0.75):
            pos = int(np.ceil(p * n))
            cs.append(int(g["v"].iloc[int(np.searchsorted(cum, pos,
                                                          side="left"))]))
        cuts[col] = cs

    def score(batch: pa.Table) -> pa.Table:
        m = metrics(batch)
        out = {}
        for col in ("r", "f", "m"):
            v = np.asarray(m.column(col), dtype=np.int64)
            c1, c2, c3 = cuts[col]
            out[f"{col}_score"] = pa.array(
                1 + (v > c1).astype(np.int64) + (v > c2) + (v > c3),
                pa.int64())
        t = pa.table(out)
        return (t.group_by(["r_score", "f_score", "m_score"])
                .aggregate([([], "count_all")])
                .rename_columns(["r_score", "f_score", "m_score",
                                 "n_users"]))

    cells = pa.concat_tables(
        peru.map_batches(score, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    cells = (cells.group_by(["r_score", "f_score", "m_score"])
             .aggregate([("n_users", "sum")])
             .rename_columns(["r_score", "f_score", "m_score", "n_users"])
             .sort_by([("r_score", "ascending"), ("f_score", "ascending"),
                       ("m_score", "ascending")]))
    return cells.cast(pa.schema([("r_score", pa.int64()),
                                 ("f_score", pa.int64()),
                                 ("m_score", pa.int64()),
                                 ("n_users", pa.int64())]))


def revenue_cohorts(ds, key: str = "o_custkey", ts_col: str = "o_orderdate",
                    value_col: str = "o_totalprice",
                    period_us: int = 2_592_000_000_000,
                    n_buckets: int | None = None) -> pa.Table:
    """Cohort LTV triangle — the revenue-weighted sibling of
    retention_cohorts: cohort = a customer's FIRST active period (fixed
    30-day periods, integer epoch division — calendar months are not
    fixed-width and would need a locale-free mirror anyway); for every
    (cohort, period_offset), the exact cents revenue booked by that
    cohort in that period.

    Same one-shuffle shape as retention_cohorts: blocks fold to
    (customer, period) -> cents partials before customers hash into fat
    buckets; each bucket derives its customers' cohorts with one lexsort
    and emits disjoint (cohort, offset) -> cents partials; the driver
    folds cohorts x offsets rows, never customers."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        t_us = _epoch_us(batch.column(ts_col))
        vals = batch.column(value_col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        cents = np.rint(np.asarray(vals, dtype=np.float64) * 100) \
            .astype(np.int64)
        t = pa.table({key: batch.column(key),
                      "period": pa.array(t_us // period_us, pa.int64()),
                      "cents": pa.array(cents, pa.int64())})
        t = (t.group_by([key, "period"]).aggregate([("cents", "sum")])
             .rename_columns([key, "period", "cents"]))
        return _bucket_col(t, key, nb)

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy()
        w = group["period"].to_numpy()
        c = group["cents"].to_numpy()
        order = np.lexsort((w, u))
        u, w, c = u[order], w[order], c[order]
        starts = np.concatenate(([True], u[1:] != u[:-1]))
        seg_id = np.cumsum(starts) - 1
        cohort = w[np.flatnonzero(starts)][seg_id]  # min period per key
        out = pd.DataFrame({"cohort_period": cohort,
                            "period_offset": w - cohort, "cents": c})
        return (out.groupby(["cohort_period", "period_offset"],
                            sort=False)["cents"].sum().reset_index())

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"cohort_period": pa.array([], pa.int64()),
                         "period_offset": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64())})
    fin = (parts.groupby(["cohort_period", "period_offset"],
                         as_index=False)["cents"].sum()
           .sort_values(["cohort_period", "period_offset"])
           .reset_index(drop=True))
    return pa.table({
        "cohort_period": pa.array(fin["cohort_period"].astype("int64"),
                                  pa.int64()),
        "period_offset": pa.array(fin["period_offset"].astype("int64"),
                                  pa.int64()),
        "cents": pa.array(fin["cents"].astype("int64"), pa.int64())})


def top_paths(ds, k: int = 10, key: str = "user_id", ts_col: str = "ts",
              type_col: str = "event_type", order_col: str = "event_id",
              n_buckets: int | None = None) -> pa.Table:
    """Top-k user paths: count every consecutive event-type TRIGRAM in
    each key's (ts, order_col)-ordered stream — the order-2 extension of
    transition_matrix (the sequences product analytics calls "top
    paths"). Ties rank lexicographically.

    Same fat-bucket plan: ONE key shuffle, one lexsort per bucket, the
    trigram window is two shifted adjacency masks + a coded 3-tuple
    np.unique; each bucket emits at most |types|^3 partial rows and the
    driver merge + top-k folds a types^3-sized table, never events."""
    import pyarrow.compute as pc

    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        t = _epoch_us(batch.column(ts_col))
        out = pa.table({key: batch.column(key),
                        "t": pa.array(t, pa.int64()),
                        "o": pc.cast(batch.column(order_col), pa.int64()),
                        type_col: batch.column(type_col)})
        return _bucket_col(out, key, nb)

    empty = pd.DataFrame({"t1": pd.Series([], dtype=object),
                          "t2": pd.Series([], dtype=object),
                          "t3": pd.Series([], dtype=object),
                          "cnt": pd.Series([], dtype=np.int64)})

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy(np.int64)
        if u.size < 3:
            return empty.copy()
        t = group["t"].to_numpy(np.int64)
        o = group["o"].to_numpy(np.int64)
        types, code = np.unique(group[type_col].to_numpy(),
                                return_inverse=True)
        order = np.lexsort((o, t, u))
        u, code = u[order], code[order]
        same3 = (u[2:] == u[:-2])  # trigram stays within one key
        c1, c2, c3 = code[:-2][same3], code[1:-1][same3], code[2:][same3]
        if c1.size == 0:
            return empty.copy()
        nt = types.size
        packed = (c1 * nt + c2) * nt + c3
        vals, cnt = np.unique(packed, return_counts=True)
        i3 = vals % nt
        i2 = (vals // nt) % nt
        i1 = vals // (nt * nt)
        return pd.DataFrame({"t1": types[i1], "t2": types[i2],
                             "t3": types[i3],
                             "cnt": cnt.astype(np.int64)})

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"t1": pa.array([], pa.string()),
                         "t2": pa.array([], pa.string()),
                         "t3": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    fin = (parts.groupby(["t1", "t2", "t3"], as_index=False)["cnt"].sum()
           .sort_values(["cnt", "t1", "t2", "t3"],
                        ascending=[False, True, True, True])
           .head(k).reset_index(drop=True))
    return pa.table({
        "t1": pa.array(fin["t1"], pa.string()),
        "t2": pa.array(fin["t2"], pa.string()),
        "t3": pa.array(fin["t3"], pa.string()),
        "cnt": pa.array(fin["cnt"].astype("int64"), pa.int64())})


def user_streaks(ds, user_col: str = "user_id", ts_col: str = "ts",
                 n_buckets: int | None = None) -> "pd.DataFrame":
    """Longest consecutive-day activity streak per user (the classic
    gaps-and-islands window shape): for every user, the count of
    distinct active UTC days and the length of the longest run of
    consecutive days. -> DataFrame (user_id, n_active_days, max_streak).

    Scale shape: map-side the batch reduces to LOCALLY-DISTINCT
    (user, day) pairs (np.unique on the composite — the shuffle carries
    day-grain rows, never events); ONE mix64 fat-bucket shuffle
    co-locates each user's days; the in-bucket kernel is fully
    vectorized ACROSS users (lexsort -> global dedup -> run boundaries
    via diff != 1 -> np.maximum/add.reduceat per user segment) — no
    per-user Python loop, the events_funnel r4 lesson applied from the
    start."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        per = {"s": 1, "ms": 10**3, "us": 10**6,
               "ns": 10**9}[ts.type.unit]
        day = np.asarray(ts.cast(pa.int64()), dtype=np.int64) \
            // (86400 * per)
        uv = batch.column(user_col)
        if isinstance(uv, pa.ChunkedArray):
            uv = uv.combine_chunks()
        u = np.asarray(uv.cast(pa.int64()), dtype=np.int64)
        pairs = np.unique(np.stack([u, day], axis=1), axis=0)
        u, day = pairs[:, 0], pairs[:, 1]
        kb = (_mix64_np(u.view(np.uint64))
              % np.uint64(nb)).astype(np.int64)
        return pa.table({user_col: pa.array(u, pa.int64()),
                         "day": pa.array(day, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        u = g[user_col].to_numpy(dtype=np.int64)
        d = g["day"].to_numpy(dtype=np.int64)
        if u.size == 0:
            return pd.DataFrame({user_col: pd.Series([], dtype="int64"),
                                 "n_active_days": pd.Series([], dtype="int64"),
                                 "max_streak": pd.Series([], dtype="int64")})
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.ones(u.size, dtype=bool)        # cross-block dedup
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        new_run = np.ones(u.size, dtype=bool)
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
        rs = np.flatnonzero(new_run)
        run_len = np.diff(np.append(rs, u.size))
        run_user = u[rs]
        nu = np.ones(run_user.size, dtype=bool)
        nu[1:] = run_user[1:] != run_user[:-1]
        us = np.flatnonzero(nu)
        return pd.DataFrame({
            user_col: run_user[us],
            "n_active_days": np.add.reduceat(run_len, us),
            "max_streak": np.maximum.reduceat(run_len, us)})

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values(user_col).reset_index(drop=True)


def scd2_intervals(ds, key_col: str = "user_id", dim_col: str = "event_type",
                   ts_col: str = "ts", order_col: str = "event_id",
                   n_buckets: int | None = None) -> "pd.DataFrame":
    """Slowly-Changing-Dimension Type-2 history build: per key, collapse
    the ordered event stream into validity intervals — one row per run of
    consecutive identical ``dim_col`` values, carrying ``valid_from_us``
    (first event ts of the run, microseconds), ``valid_to_us`` (the next
    run's first ts, or -1 for the open current interval) and ``n_events``.
    The classic lakehouse dimension-history operator (LAG change detection
    + islands in SQL).

    Scale shape: ONE mix64 fat-bucket shuffle on the key (same partition
    contract as ``user_streaks``: one key's history fits a worker); the
    in-bucket kernel is vectorized ACROSS keys — one lexsort on
    (key, ts, order), run boundaries via neighbor compare, reduceat
    counts. No per-key Python loop, nothing corpus-sized on the driver."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        per = {"s": 10**6, "ms": 10**3, "us": 1, "ns": 1}[ts.type.unit]
        t = np.asarray(ts.cast(pa.int64()), dtype=np.int64)
        t = t * per if per != 1 else (t // 1000 if ts.type.unit == "ns" else t)
        k = np.asarray(batch.column(key_col), dtype=np.int64)
        kb = (_mix64_np(k.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table({key_col: pa.array(k, pa.int64()),
                         dim_col: batch.column(dim_col),
                         "_ts": pa.array(t, pa.int64()),
                         "_ord": batch.column(order_col).cast(pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        if len(g) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 dim_col: pd.Series([], dtype="object"),
                                 "valid_from_us": pd.Series([], dtype="int64"),
                                 "valid_to_us": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64")})
        k = g[key_col].to_numpy(dtype=np.int64)
        t = g["_ts"].to_numpy(dtype=np.int64)
        o = g["_ord"].to_numpy(dtype=np.int64)
        dims = g[dim_col].to_numpy()
        order = np.lexsort((o, t, k))
        k, t, dims = k[order], t[order], dims[order]
        new_run = np.ones(k.size, dtype=bool)
        new_run[1:] = (k[1:] != k[:-1]) | (dims[1:] != dims[:-1])
        rs = np.flatnonzero(new_run)
        n_events = np.diff(np.append(rs, k.size))
        rk, rd, rf = k[rs], dims[rs], t[rs]
        # valid_to = next run's valid_from within the same key, else -1
        vt = np.full(rk.size, -1, dtype=np.int64)
        same_key = rk[1:] == rk[:-1]
        vt[:-1][same_key] = rf[1:][same_key]
        return pd.DataFrame({key_col: rk, dim_col: rd,
                             "valid_from_us": rf, "valid_to_us": vt,
                             "n_events": n_events.astype(np.int64)})

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values([key_col, "valid_from_us"]).reset_index(drop=True)


def time_weighted_avg(ds, key_col: str = "user_id", ts_col: str = "ts",
                      val_col: str = "value",
                      n_buckets: int | None = None) -> "pd.DataFrame":
    """Per-key time-weighted average with LOCF weighting: each observation
    holds until the next one, so ``twa = sum(v_i * (t_{i+1} - t_i)) /
    (t_last - t_first)`` over seconds. Keys whose events all share one
    second are dropped (zero span). Values are fixed-point cents and the
    result is ``twa_cents = weighted_sum // span_sec`` — exact integer
    arithmetic on both engines (int64-safe: cents ~1e5 x span-sec <=3e7
    x events — the dot product stays < 2^63 for any realistic key).

    Scale shape: identical fat-bucket contract as ``scd2_intervals``; the
    kernel is one lexsort + vectorized diff/cumsum-per-segment via
    np.add.reduceat. Tie-break inside one second: ties collapse because
    dt=0 terms contribute nothing."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        per = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        sec = np.asarray(ts.cast(pa.int64()), dtype=np.int64) // per
        k = np.asarray(batch.column(key_col), dtype=np.int64)
        v = np.asarray(batch.column(val_col), dtype=np.float64)
        cents = np.round(v * 100).astype(np.int64)
        kb = (_mix64_np(k.view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return pa.table({key_col: pa.array(k, pa.int64()),
                         "_sec": pa.array(sec, pa.int64()),
                         "_cents": pa.array(cents, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def per_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        if len(g) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype="int64"),
                                 "span_sec": pd.Series([], dtype="int64"),
                                 "twa_cents": pd.Series([], dtype="int64")})
        k = g[key_col].to_numpy(dtype=np.int64)
        t = g["_sec"].to_numpy(dtype=np.int64)
        c = g["_cents"].to_numpy(dtype=np.int64)
        order = np.lexsort((c, t, k))  # deterministic within equal ts
        k, t, c = k[order], t[order], c[order]
        seg = np.ones(k.size, dtype=bool)
        seg[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(seg)
        ends = np.append(starts[1:], k.size) - 1
        # per-row dt to next row within segment (last row of segment: 0)
        dt = np.zeros(k.size, dtype=np.int64)
        dt[:-1] = t[1:] - t[:-1]
        dt[ends] = 0
        wsum = np.add.reduceat(c * dt, starts)
        span = t[ends] - t[starts]
        keep = span > 0
        return pd.DataFrame({key_col: k[starts][keep],
                             "span_sec": span[keep],
                             "twa_cents": wsum[keep] // span[keep]})

    out = (ds.map_batches(prep, batch_format="pyarrow")
           .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    return out.sort_values(key_col).reset_index(drop=True)


def skyline_2d(ds, max_col: str, min_col: str, id_col: str) -> "pd.DataFrame":
    """2-D skyline (pareto-optimal set): rows not dominated by any other,
    where q dominates p iff ``q.max_col >= p.max_col AND q.min_col <=
    p.min_col`` with at least one strict. The classic multi-criteria
    short-list operator (Borzsony/Kossmann/Stocker, ICDE'01). Both
    columns must already be integers (fixed-point upstream).

    Scale shape: the skyline is ANTI-MONOTONE under union — skyline(A
    union B) is a subset of skyline(A) union skyline(B) — so each block
    reduces map-side to its local skyline (vectorized: sort by max-col
    desc / min-col asc, survivors = rows strictly under the running min
    of min-col over strictly-greater max-col, plus min-col ties within a
    max-col group); the union of local skylines (tiny for correlated
    dims) takes one final exact pass. Nothing corpus-sized leaves the
    workers."""
    def local_skyline(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column(max_col), dtype=np.int64)
        b = np.asarray(batch.column(min_col), dtype=np.int64)
        i = np.asarray(batch.column(id_col), dtype=np.int64)
        keep = _skyline_mask(a, b)
        return pa.table({id_col: pa.array(i[keep], pa.int64()),
                         max_col: pa.array(a[keep], pa.int64()),
                         min_col: pa.array(b[keep], pa.int64())})

    cand = ds.map_batches(local_skyline, batch_format="pyarrow").to_pandas()
    a = cand[max_col].to_numpy(dtype=np.int64)
    b = cand[min_col].to_numpy(dtype=np.int64)
    keep = _skyline_mask(a, b)
    out = cand[keep]
    return out.sort_values(id_col).reset_index(drop=True)


def _skyline_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact 2-D skyline survivors (a: larger-better,
    b: smaller-better). Survivor iff b == min(b | same a) AND
    b < min(b | strictly larger a)."""
    if a.size == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((b, -a))  # a desc, b asc
    a_s, b_s = a[order], b[order]
    grp = np.ones(a_s.size, dtype=bool)
    grp[1:] = a_s[1:] != a_s[:-1]
    starts = np.flatnonzero(grp)
    gmin = b_s[starts]  # min b per a-group (b ascending inside group)
    # running min of gmin over STRICTLY larger a = exclusive prefix min
    prefix = np.minimum.accumulate(gmin)
    excl = np.empty_like(prefix)
    excl[0] = np.iinfo(np.int64).max
    excl[1:] = prefix[:-1]
    gid = np.cumsum(grp) - 1
    keep_sorted = (b_s == gmin[gid]) & (gmin[gid] < excl[gid])
    keep = np.zeros(a.size, dtype=bool)
    keep[order] = keep_sorted
    return keep


def zorder_layout(ds, x_col: str, y_col: str, bits: int = 16,
                  n_ranges: int = 16):
    """Z-order (Morton) locality layout audit — the Delta/Iceberg-style
    multi-dimensional clustering primitive: interleave the low ``bits``
    bits of two integer dimensions into a z-value, split the z-space into
    ``n_ranges`` equal code ranges (the file/partition boundaries a
    z-ordered writer would use), and report per range the row count and
    the min/max of BOTH dimensions — the numbers that prove every range
    prunes on either dimension. -> pa.Table (zrange, n_rows, x_min,
    x_max, y_min, y_max).

    Scale shape: the interleave is a vectorized shift-or per batch; the
    audit is a ``groupby(zrange)`` over n_ranges cells with map-side
    Min/Max partials — one tiny shuffle, no sort (a real z-order WRITE
    would hand ``zval`` to sort/repartition; the audit row checks the
    math that layout relies on)."""
    from ray.data.aggregate import Count, Max, Min

    mask = (1 << bits) - 1
    shift = 2 * bits - int(np.log2(n_ranges))

    def add_z(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column(x_col), dtype=np.int64) & mask
        y = np.asarray(batch.column(y_col), dtype=np.int64) & mask
        z = np.zeros(x.size, dtype=np.int64)
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table({"zrange": pa.array(z >> shift, pa.int64()),
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64())})

    res = (ds.map_batches(add_z, batch_format="pyarrow")
           .groupby("zrange")
           .aggregate(Count(alias_name="n_rows"),
                      Min("x", alias_name="x_min"),
                      Max("x", alias_name="x_max"),
                      Min("y", alias_name="y_min"),
                      Max("y", alias_name="y_max"))
           .to_pandas().sort_values("zrange").reset_index(drop=True))
    return pa.table({
        "zrange": pa.array(res["zrange"].astype("int64"), pa.int64()),
        "n_rows": pa.array(res["n_rows"].astype("int64"), pa.int64()),
        "x_min": pa.array(res["x_min"].astype("int64"), pa.int64()),
        "x_max": pa.array(res["x_max"].astype("int64"), pa.int64()),
        "y_min": pa.array(res["y_min"].astype("int64"), pa.int64()),
        "y_max": pa.array(res["y_max"].astype("int64"), pa.int64())})


def cusum_drift(ds, group_col: str = "event_type", ts_col: str = "ts"):
    """Per-group CUSUM drift detection over daily counts: for each group,
    the cumulative sum of (daily count - group mean) is the classic
    change-point statistic; report the day where |S_d| peaks, its value,
    and the day/observation counts. Mean is integer floor(total/n_days)
    so both engines agree exactly; the scan runs over OBSERVED days
    (gaps contribute no row — documented, mirrored in the oracle).

    Scale shape: the corpus reduces map-side to (group, day) -> count
    partials; the merged histogram is tiny (groups x days), so the final
    per-group scan is a vectorized kernel over that reduced table."""
    from ray.data.aggregate import Count

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        per = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        day = np.asarray(ts.cast(pa.int64()), dtype=np.int64) // (86400 * per)
        return pa.table({group_col: batch.column(group_col),
                         "day": pa.array(day, pa.int64())})

    daily = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby([group_col, "day"])
             .aggregate(Count(alias_name="n"))
             .to_pandas())
    daily = daily.sort_values([group_col, "day"]).reset_index(drop=True)
    out_g, out_day, out_s, out_days, out_n = [], [], [], [], []
    for grp, sub in daily.groupby(group_col, sort=True):
        n = sub["n"].to_numpy(dtype=np.int64)
        d = sub["day"].to_numpy(dtype=np.int64)
        mean = int(n.sum()) // n.size
        s = np.cumsum(n - mean)
        j = int(np.argmax(np.abs(s)))
        out_g.append(grp)
        out_day.append(int(d[j]))
        out_s.append(int(s[j]))
        out_days.append(n.size)
        out_n.append(int(n.sum()))
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "peak_day": pa.array(out_day, pa.int64()),
        "peak_cusum": pa.array(out_s, pa.int64()),
        "n_days": pa.array(out_days, pa.int64()),
        "n_events": pa.array(out_n, pa.int64())})


def _daily_counts(ds, group_col: str, ts_col: str):
    """(group, epoch-day) -> count: the shared reduction under
    ewma_daily / holt_daily (map-side day derivation honoring the
    column's tick unit, one groupby-Count shuffle, sorted tiny table).
    Day = floor division, numpy semantics — oracles replay it with the
    locf floor idiom."""
    from ray.data.aggregate import Count

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        per = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        day = np.asarray(ts.cast(pa.int64()), dtype=np.int64) \
            // (86400 * per)
        return pa.table({group_col: batch.column(group_col),
                         "day": pa.array(day, pa.int64())})

    daily = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby([group_col, "day"])
             .aggregate(Count(alias_name="n"))
             .to_pandas())
    return daily.sort_values([group_col, "day"]).reset_index(drop=True)


def ewma_daily(ds, group_col: str = "event_type", ts_col: str = "ts",
               alpha_denom: int = 8, scale: int = 10**6) -> pa.Table:
    """Per-group exponentially-weighted moving average over observed
    daily counts — the classic smoothing/trend statistic (alpha =
    1/alpha_denom). The recurrence is exact integer fixed-point:
    ``s_1 = n_1*scale; s_t = ((alpha_denom-1)*s_{t-1} + n_t*scale)
    // alpha_denom`` — the numerator is always nonnegative, so Python
    floor division and DuckDB's truncating ``//`` agree (the repo-wide
    negative-division parity rule). Gaps contribute no row (observed
    days only — documented, mirrored in the oracle's recursive CTE).

    Scale shape: the corpus reduces map-side to (group, day) -> count
    partials (one groupby-Count shuffle); the merged histogram is tiny
    (groups x days), so the sequential per-group recurrence runs over
    that reduced table — the cusum_drift pattern."""
    daily = _daily_counts(ds, group_col, ts_col)
    out_g, out_day, out_n, out_s = [], [], [], []
    a1 = alpha_denom - 1
    for grp, sub in daily.groupby(group_col, sort=True):
        n = sub["n"].to_numpy(dtype=np.int64)
        d = sub["day"].to_numpy(dtype=np.int64)
        s = int(n[0]) * scale
        for i in range(n.size):
            if i:
                s = (a1 * s + int(n[i]) * scale) // alpha_denom
            out_g.append(grp)
            out_day.append(int(d[i]))
            out_n.append(int(n[i]))
            out_s.append(s)
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "day": pa.array(out_day, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
        "ewma": pa.array(out_s, pa.int64())})


def benford_digits(ds, value_col: str = "value") -> pa.Table:
    """First-significant-digit distribution of a positive value column
    vs the Benford expectation — the standard fraud/aberration screen.
    Values quantize to integer cents with round-half-even (the repo
    cents convention); rows with cents <= 0 are excluded (mirrored in
    the oracle). share_ppm = n * 10^6 // total (nonnegative, so floor
    == truncate). Pure map-side 9-bucket partials; no shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch.column(value_col), dtype=np.float64)
        c = np.rint(v * 100).astype(np.int64)
        c = c[c > 0]
        # strip trailing digits: <= 19 decimal digits in an int64
        for _ in range(19):
            big = c >= 10
            if not big.any():
                break
            c = np.where(big, c // 10, c)
        cnt = np.bincount(c, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10), pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.groupby("digit", sort=True)["n"].sum()
    counts = tot.to_numpy(dtype=np.int64)
    total = int(counts.sum())
    share = (counts * 1_000_000) // max(total, 1)
    return pa.table({"digit": pa.array(tot.index.to_numpy(np.int64)),
                     "n": pa.array(counts),
                     "share_ppm": pa.array(share.astype(np.int64))})


def autocorr_hourly(ds, group_col: str = "event_type", ts_col: str = "ts",
                    lags: tuple = (1, 2, 24)) -> pa.Table:
    """Per-group autocorrelation sufficient statistics of the DENSE
    hourly count series (gap hours count 0) at the given lags — the
    seasonality probe (lag 24 = daily cycle). To stay float-free the
    output is the exact integer Pearson pieces per (group, lag):
    ``n_pairs``, ``cov_n = n*Sxy - Sx*Sy``, ``varx_n = n*Sxx - Sx^2``,
    ``vary_n = n*Syy - Sy^2`` (r = cov_n / sqrt(varx_n*vary_n) is the
    caller's one float op). No division happens, so there is no
    floor/trunc parity surface at all.

    Scale shape: one (group, hour) groupby-Count reduce; the dense
    series (groups x span-hours) is tiny, the lag arithmetic runs
    vectorized over it."""
    from ray.data.aggregate import Count

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        per = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        hr = np.asarray(ts.cast(pa.int64()), dtype=np.int64) // (3600 * per)
        return pa.table({group_col: batch.column(group_col),
                         "hr": pa.array(hr, pa.int64())})

    hourly = (ds.map_batches(prep, batch_format="pyarrow")
              .groupby([group_col, "hr"])
              .aggregate(Count(alias_name="n"))
              .to_pandas())
    out_g, out_lag, out_np, out_cov, out_vx, out_vy = ([], [], [], [],
                                                       [], [])
    for grp, sub in hourly.groupby(group_col, sort=True):
        hr = sub["hr"].to_numpy(dtype=np.int64)
        n = sub["n"].to_numpy(dtype=np.int64)
        lo, hi = int(hr.min()), int(hr.max())
        dense = np.zeros(hi - lo + 1, dtype=np.int64)
        dense[hr - lo] = n
        for lag in lags:
            if lag >= dense.size:
                continue
            x, y = dense[:-lag], dense[lag:]
            m = int(x.size)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx = int((x * x).sum())
            syy = int((y * y).sum())
            out_g.append(grp)
            out_lag.append(lag)
            out_np.append(m)
            out_cov.append(m * sxy - sx * sy)
            out_vx.append(m * sxx - sx * sx)
            out_vy.append(m * syy - sy * sy)
    return pa.table({
        group_col: pa.array(out_g, pa.string()),
        "lag": pa.array(out_lag, pa.int64()),
        "n_pairs": pa.array(out_np, pa.int64()),
        "cov_n": pa.array(out_cov, pa.int64()),
        "varx_n": pa.array(out_vx, pa.int64()),
        "vary_n": pa.array(out_vy, pa.int64())})


def markov_stationary(ds, iters: int = 8, v_scale: int = 10_000,
                      **tm_kwargs) -> pa.Table:
    """Stationary distribution of the per-key event-type Markov chain
    by deterministic integer power iteration: transition counts come
    from ``transition_matrix`` (the one fat-bucket shuffle — the only
    corpus-sized work), then the |types| x |types| chain iterates
    driver-side in Python bigints:

        w(b) = sum_a  v(a) * cnt(a, b) // rowsum(a)
        v    = w * v_scale // max(w)     (trunc division, all >= 0)

    from the all-``v_scale`` start. Dangling states (no outgoing
    transitions) contribute nothing and keep whatever inbound mass the
    normalization assigns. The |types|^2 matrix is corpus-size-free —
    the k-means-centroid / pca_power shape — and the whole recurrence
    replays verbatim as unrolled HUGEINT CTEs in the oracle.

    Returns (state, v) over every state seen on either side of a
    transition, ordered by state."""
    tm = transition_matrix(ds, **tm_kwargs).to_pandas()
    states = sorted(set(tm["prev_type"]) | set(tm["next_type"]))
    if not states:
        return pa.table({"state": pa.array([], pa.string()),
                         "v": pa.array([], pa.int64())})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    cnt = [[0] * n for _ in range(n)]
    rowsum = [0] * n
    for p, q, c in zip(tm["prev_type"], tm["next_type"], tm["cnt"]):
        cnt[idx[p]][idx[q]] = int(c)
        rowsum[idx[p]] += int(c)
    v = [v_scale] * n
    for _ in range(iters):
        w = [0] * n
        for a in range(n):
            if rowsum[a] == 0:
                continue
            va = v[a]
            row = cnt[a]
            for b in range(n):
                if row[b]:
                    w[b] += va * row[b] // rowsum[a]
        mx = max(max(w), 1)
        v = [x * v_scale // mx for x in w]
    return pa.table({"state": pa.array(states, pa.string()),
                     "v": pa.array(v, pa.int64())})


def peak_concurrency(ds, key: str = "user_id", ts_col: str = "ts",
                     gap_us: int = 1_800_000_000,
                     n_buckets: int | None = None) -> pa.Table:
    """Per-day PEAK CONCURRENT SESSIONS — the capacity-planning /
    occupancy statistic: sessionize every key (the strict-30-min house
    rule, closed [first, last] intervals), sweep +1/-1 boundaries
    (+1 at start, -1 at end + 1us), and report, for each UTC day with
    at least one session start, the maximum of the running active
    count at start instants. Concurrency only rises at a start, so the
    per-day max over start instants IS the day's peak (carry-in from
    sessions spanning midnight is exact via cross-day offsets;
    carry-only days without a start don't emit a row).

    Scale shape: shuffle 1 is the fat-bucket sessionize (per-key
    lexsort, all-numpy); the boundary stream (2 rows per session) then
    day-buckets — shuffle 2 — and each day folds to FOUR scalars (net
    delta, max prefix at starts, start flag); the driver stitches the
    tiny per-day table with one cumulative-sum pass, exactly the
    running_total carry-in idiom. No global sort, nothing
    row-count-sized on the driver."""
    nb = n_buckets or _default_buckets()
    day_us = 86_400_000_000

    def prep(batch: pa.Table) -> pa.Table:
        out = pa.table({key: batch.column(key),
                        "t_us": pa.array(_epoch_us(batch.column(ts_col)),
                                         pa.int64())})
        return _bucket_col(out, key, nb)

    def bucket_bounds(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy(dtype=np.int64)
        t = group["t_us"].to_numpy(dtype=np.int64)
        if u.size == 0:
            return pd.DataFrame({"t": np.empty(0, np.int64),
                                 "d": np.empty(0, np.int64),
                                 "day": np.empty(0, np.int64)})
        _, ss, se, _ = _session_spans(u, t, gap_us)
        bt = np.concatenate([ss, se + 1])
        bd = np.concatenate([np.ones(ss.size, np.int64),
                             np.full(se.size, -1, np.int64)])
        return pd.DataFrame({"t": bt, "d": bd, "day": bt // day_us})

    def per_day(group: pd.DataFrame) -> pd.DataFrame:
        day = int(group["day"].iloc[0])
        g = group.groupby("t", as_index=False).agg(
            nd=("d", "sum"), st=("d", "max"))
        g = g.sort_values("t")
        cum = g["nd"].to_numpy(np.int64).cumsum()
        starts = g["st"].to_numpy(np.int64) == 1
        maxp = int(cum[starts].max()) if starts.any() else 0
        return pd.DataFrame({"day": [day],
                             "net": [int(cum[-1])],
                             "maxp": [maxp],
                             "has_start": [bool(starts.any())]})

    days = (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("_kb").map_groups(bucket_bounds,
                                       batch_format="pandas")
            .groupby("day").map_groups(per_day, batch_format="pandas")
            .to_pandas())
    if len(days) == 0:
        return pa.table({"day": pa.array([], pa.int64()),
                         "peak": pa.array([], pa.int64())})
    days = days.sort_values("day").reset_index(drop=True)
    carry = np.concatenate(([0], days["net"].to_numpy(np.int64)
                            .cumsum()[:-1]))
    peak = carry + days["maxp"].to_numpy(np.int64)
    keep = days["has_start"].to_numpy(bool)
    return pa.table({"day": pa.array(days["day"].to_numpy(np.int64)[keep],
                                     pa.int64()),
                     "peak": pa.array(peak[keep], pa.int64())})


def pit_join(ds, key: str = "user_id", ts_col: str = "ts",
             type_col: str = "event_type", order_col: str = "event_id",
             value_col: str = "value", fact_type: str = "purchase",
             n_buckets: int | None = None) -> pa.Table:
    """POINT-IN-TIME-correct fact-to-dimension join — the
    label-leakage-safe feature join every ML feature store needs: the
    dimension is the SCD2 run-history of each key's NON-fact activity
    (runs of consecutive identical types, valid [run_start, next_run_
    start)), and each fact row (``fact_type`` events) joins the
    dimension version valid AT ITS TIMESTAMP — never a later one.
    Facts before any dimension row drop (inner-join contract). Output:
    per dimension state, fact count + exact cents sum.

    Scale shape: ONE key-hash fat-bucket shuffle co-locates each key's
    facts AND dimension events, so the interval build and the as-of
    probe are both bucket-local: one lexsort, vectorized run
    boundaries, then a merge-order forward-fill (no per-key loop —
    the interval index propagates with np.maximum.accumulate and a
    same-key validity check). Each bucket emits |types|-bounded
    partials; the driver folds a tiny table."""
    nb = n_buckets or _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = np.rint(np.asarray(batch.column(value_col),
                                   dtype=np.float64) * 100) \
            .astype(np.int64)
        out = pa.table({key: batch.column(key),
                        "t": pa.array(_epoch_us(batch.column(ts_col)),
                                      pa.int64()),
                        "o": pc.cast(batch.column(order_col), pa.int64()),
                        type_col: batch.column(type_col),
                        "cents": pa.array(cents, pa.int64())})
        return _bucket_col(out, key, nb)

    empty = pd.DataFrame({"state": pd.Series([], dtype=object),
                          "n_facts": pd.Series([], dtype=np.int64),
                          "sum_cents": pd.Series([], dtype=np.int64)})

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        u = group[key].to_numpy(np.int64)
        t = group["t"].to_numpy(np.int64)
        o = group["o"].to_numpy(np.int64)
        typ = group[type_col].to_numpy()
        cents = group["cents"].to_numpy(np.int64)
        if u.size == 0:
            return empty.copy()
        order = np.lexsort((o, t, u))
        u, t, typ, cents = u[order], t[order], typ[order], cents[order]
        is_fact = typ == fact_type
        # dimension: runs over the NON-fact stream, per key
        du, dt, dtyp = u[~is_fact], t[~is_fact], typ[~is_fact]
        if du.size == 0 or not is_fact.any():
            return empty.copy()
        new = np.concatenate(([True], (du[1:] != du[:-1])
                              | (dtyp[1:] != dtyp[:-1])))
        starts = np.flatnonzero(new)
        iu, ivf, ityp = du[starts], dt[starts], dtyp[starts]
        # merge-order forward fill: at equal (key, time) the interval
        # start sorts BEFORE the fact (kind 0 < 1), so a fact at the
        # exact run-start instant sees that run — the t >= vf rule
        fu, ft, fc = u[is_fact], t[is_fact], cents[is_fact]
        mk = np.concatenate([np.zeros(iu.size, np.int64),
                             np.ones(fu.size, np.int64)])
        mu = np.concatenate([iu, fu])
        mt = np.concatenate([ivf, ft])
        morder = np.lexsort((mk, mt, mu))
        marker = np.where(mk[morder] == 0,
                          np.concatenate([np.arange(iu.size),
                                          np.zeros(fu.size,
                                                   np.int64)])[morder],
                          -1)
        ff = np.maximum.accumulate(marker)
        fact_pos = mk[morder] == 1
        fidx = ff[fact_pos]
        fu_s, fc_s = mu[morder][fact_pos], np.concatenate(
            [np.zeros(iu.size, np.int64), fc])[morder][fact_pos]
        ok = (fidx >= 0) & (iu[np.maximum(fidx, 0)] == fu_s)
        if not ok.any():
            return empty.copy()
        st = ityp[fidx[ok]]
        g = pd.DataFrame({"state": st, "c": fc_s[ok]}) \
            .groupby("state", as_index=False).agg(
                n_facts=("c", "size"), sum_cents=("c", "sum"))
        return pd.DataFrame({"state": g["state"],
                             "n_facts": g["n_facts"].astype(np.int64),
                             "sum_cents": g["sum_cents"]
                             .astype(np.int64)})

    parts = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"state": pa.array([], pa.string()),
                         "n_facts": pa.array([], pa.int64()),
                         "sum_cents": pa.array([], pa.int64())})
    fin = (parts.groupby("state", as_index=False).sum()
           .sort_values("state").reset_index(drop=True))
    return pa.table({"state": pa.array(fin["state"], pa.string()),
                     "n_facts": pa.array(fin["n_facts"].astype("int64"),
                                         pa.int64()),
                     "sum_cents": pa.array(fin["sum_cents"]
                                           .astype("int64"), pa.int64())})


def holt_daily(ds, group_col: str = "event_type", ts_col: str = "ts",
               denom: int = 8, scale: int = 10**6) -> pa.Table:
    """Per-group Holt double-exponential smoothing (level + trend,
    alpha = beta = 1/denom) over observed daily counts — EWMA's
    trend-aware sibling, the standard short-horizon forecaster. Exact
    integer fixed point; the trend term goes NEGATIVE on declines, so
    every division is explicit trunc-toward-zero (``-((-x) // d)`` for
    negative numerators), matching DuckDB's truncating ``//`` bit for
    bit:

        l_1 = n_1 * scale;  b_1 = 0
        l_t = trunc((n_t * scale + (denom-1) * (l + b)) / denom)
        b_t = trunc(((l_t - l) + (denom-1) * b) / denom)

    Output rows also carry forecast = l + b (the one-step-ahead).
    Scale shape: identical to ewma_daily — one (group, day) groupby-
    Count shuffle reduces the corpus; the sequential recurrence runs
    over the tiny groups x days table."""
    def tdiv(a: int, b: int) -> int:
        return -((-a) // b) if a < 0 else a // b

    daily = _daily_counts(ds, group_col, ts_col)
    d1 = denom - 1
    out = {"g": [], "day": [], "n": [], "level": [], "trend": [],
           "forecast": []}
    for grp, sub in daily.groupby(group_col, sort=True):
        n = sub["n"].to_numpy(dtype=np.int64)
        d = sub["day"].to_numpy(dtype=np.int64)
        lv, tr = int(n[0]) * scale, 0
        for i in range(n.size):
            if i:
                p = lv + tr
                nl = tdiv(int(n[i]) * scale + d1 * p, denom)
                tr = tdiv((nl - lv) + d1 * tr, denom)
                lv = nl
            out["g"].append(grp)
            out["day"].append(int(d[i]))
            out["n"].append(int(n[i]))
            out["level"].append(lv)
            out["trend"].append(tr)
            out["forecast"].append(lv + tr)
    return pa.table({
        group_col: pa.array(out["g"], pa.string()),
        "day": pa.array(out["day"], pa.int64()),
        "n": pa.array(out["n"], pa.int64()),
        "level": pa.array(out["level"], pa.int64()),
        "trend": pa.array(out["trend"], pa.int64()),
        "forecast": pa.array(out["forecast"], pa.int64())})
