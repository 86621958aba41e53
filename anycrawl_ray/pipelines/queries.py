"""Driver-facing query registry: Ray pipelines + DuckDB oracle SQL.

Every operator family from SURVEY.md §2 plus the training-data additions
is exposed here as ``QUERIES[name](sf_dir)``; ``ORACLE_SQL[name]`` holds
the ANSI-SQL equivalent the driver runs through DuckDB on the same parquet
views (``documents events lineitem orders customer part nation region
supplier embeddings``). Names of computed columns match exactly — the
driver hash-compares sorted columns.

Float policy: float aggregates are emitted as scaled BIGINT on both sides
(see ``_scaled`` — rounded floats can differ by 1 ulp between engines);
similarity queries return integer (id, rank) columns only — float64 cosine
on both sides makes rank flips require |delta| < 1e-12, which the random
embeddings never produce.

Crawl/SERP queries run over synthetic fixtures **derived from the
documents table by SQL-replicable rules** (sources/synthetic_site.py graph
rule, sources/serp_fixtures.py field rules), so even the crawler's
reachable-set and the SERP parsers get exact relational oracles; ordering
and span-level invariants (not SQL-expressible) are pinned by pytest
instead (tests/test_crawl.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from . import oracle_kernels as _oracle_kernels
from ..util import gather_table as _gather
from ..util import join_parts as _join_parts
from .control_queries import CONTROL_ORACLE_SQL, CONTROL_QUERIES

_HOSTS = 4  # keep in sync with sources/synthetic_site.py

# THE directed synthetic-site edge rule as a CTE body (assumes a CTE
# ``n AS (SELECT COUNT(*) AS c FROM documents)`` is in scope). Every
# oracle that replays the crawl graph interpolates THIS string —
# sources/synthetic_site.page_links is the Python twin; change both.
_EDGES_CTE_BODY = """  SELECT d.doc_id AS src, 2 * d.doc_id + 1 AS dst FROM documents d, n
  WHERE 2 * d.doc_id + 1 < n.c
  UNION ALL
  SELECT d.doc_id, 2 * d.doc_id + 2 FROM documents d, n
  WHERE 2 * d.doc_id + 2 < n.c
  UNION ALL
  SELECT d.doc_id, (7 * d.doc_id + 3) % n.c FROM documents d, n
  WHERE d.doc_id % 3 = 0"""




class _SizedData:
    """``ray.data`` proxy returned by :func:`_rd`: ``read_parquet``
    gains the ``util.auto_blocks`` small-input block sizing (explicit
    ``override_num_blocks`` from a caller always wins); everything else
    delegates to the real module."""

    def __getattr__(self, name):
        import ray.data as rd

        return getattr(rd, name)

    @staticmethod
    def read_parquet(paths, **kw):
        from ..util import sized_read_parquet

        return sized_read_parquet(paths, **kw)


_SIZED_DATA = _SizedData()


def _rd():
    return _SIZED_DATA


def _conc(want: int = 2) -> int:
    from ..util import pool_concurrency

    return pool_concurrency(want)


def _scaled(table: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Float -> scaled BIGINT for driver-hash-stable comparison.

    Rounded floats are unsafe across engines (two correct round(x, n)
    implementations can emit doubles 1 ulp apart — observed between
    pyarrow and DuckDB); ``rint(x * scale)`` with error << 0.5 is exact on
    both sides. The matching SQL is CAST(ROUND(x * scale) AS BIGINT)."""
    for col, scale in cols.items():
        idx = table.schema.get_field_index(col)
        vals = np.rint(
            table.column(col).to_numpy(zero_copy_only=False).astype("float64") * scale
        ).astype("int64")
        table = table.set_column(idx, col, pa.array(vals, pa.int64()))
    return table


# ===================================================================
# Relational / aggregate operators (engine fundamentals)
# ===================================================================


def q1_pricing_summary(sf_dir: str):
    """Grouped aggregate with pre-projection (Q1-style): demonstrates
    column-pruned read -> vectorized derived column -> groupby.aggregate.

    Fixed-point arithmetic: quantity/price/discount are 2-decimal values,
    so each row scales to EXACT integers BEFORE summation (qty*100,
    price*100 cents, disc_price = cents*(100-disc_pct) in 1e-4 dollars).
    Scaling after a float SUM held at sf0.01 but hit the rounding
    boundary at sf0.1 (600k-term sums differ by 1 ulp between numpy's
    pairwise and DuckDB's sequential accumulation) — integer sums are
    order-free, so the oracle is exact at every scale."""
    rd = _rd()
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        # map-side combine: shuffle carries one row per (flag,status) per
        # batch instead of every lineitem row; per-row fixed-point scaling
        # is vectorized numpy
        qty_c = np.rint(np.asarray(b.column("l_quantity"),
                                   dtype=np.float64) * 100).astype(np.int64)
        price_c = np.rint(np.asarray(b.column("l_extendedprice"),
                                     dtype=np.float64) * 100).astype(np.int64)
        disc_pct = np.rint(np.asarray(b.column("l_discount"),
                                      dtype=np.float64) * 100).astype(np.int64)
        t = pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty_c": pa.array(qty_c, pa.int64()),
            "price_c": pa.array(price_c, pa.int64()),
            "disc_price_4": pa.array(price_c * (100 - disc_pct), pa.int64()),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("qty_c", "sum"), ("price_c", "sum"),
            ("disc_price_4", "sum"), ("qty_c", "count"),
        ])
        return g.rename_columns([
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "count_order"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
    )
    pdf = out.to_pandas()
    # avg scaled 1e6: one f64 division over exact integers (both engines
    # perform the identical single rounding)
    pdf["avg_qty"] = np.rint(pdf["sum_qty"].to_numpy(dtype=np.float64)
                             * 10_000
                             / pdf["count_order"].to_numpy(dtype=np.float64)
                             ).astype(np.int64)
    # base price reported at the 1e-4 scale like disc price
    pdf["sum_base_price"] = pdf["sum_base_price"].astype("int64") * 100
    pdf["sum_qty"] = pdf["sum_qty"].astype("int64")
    pdf["sum_disc_price"] = pdf["sum_disc_price"].astype("int64")
    pdf["count_order"] = pdf["count_order"].astype("int64")
    return pa.Table.from_pandas(pdf, preserve_index=False)


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round_even(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)) * 100 AS BIGINT) AS sum_base_price,
       CAST(SUM(CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round_even(l_discount * 100, 0) AS BIGINT))) AS BIGINT) AS sum_disc_price,
       CAST(round_even(CAST(SUM(CAST(round_even(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                       * 10000 / COUNT(*), 0) AS BIGINT) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_brand(sf_dir: str):
    """Broadcast hash join (small dimension) + map-side partial aggregation
    before the shuffle (SURVEY.md J1 pattern at data scale)."""
    rd = _rd()
    from ray.data.aggregate import Sum

    import numpy as np

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    # dense broadcast lookup: partkeys are 1..N, so brand resolution is one
    # numpy gather (no per-row dict/map); brands stay integer codes until
    # the tiny final table
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    brand_names, brand_code = np.unique(
        part.column("p_brand").to_numpy(zero_copy_only=False), return_inverse=True)
    code_of = np.zeros(int(pk.max()) + 1, dtype=np.int32)
    code_of[pk] = brand_code
    n_brands = len(brand_names)

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        codes = code_of[keys]
        # exact fixed-point: cents * (100 - disc_pct) at the 1e-4 scale —
        # order-free integer sums (the scale-before-sum convention; a
        # float bincount sum sits on the same 1-ulp boundary q1 hit at
        # 10x scale). bincount weights are float64 but each weight is an
        # exact integer < 2^53, so the accumulation stays exact.
        w4 = (np.rint(price * 100) * (100 - np.rint(disc * 100)))
        rev4 = np.bincount(codes, weights=w4, minlength=n_brands)
        n = np.bincount(codes, minlength=n_brands)
        return pa.table({
            "brand_code": pa.array(np.arange(n_brands, dtype=np.int32)),
            "revenue": pa.array(rev4.astype(np.int64), pa.int64()),
            "n_items": pa.array(n.astype(np.int64)),
        })

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby("brand_code").aggregate(
        Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items")
    )
    pdf = out.to_pandas()
    pdf["p_brand"] = brand_names[pdf["brand_code"]]
    pdf = pdf[pdf["n_items"] > 0]  # brands with no lineitems don't appear in SQL
    pdf["revenue"] = pdf["revenue"].astype("int64")
    table = pa.Table.from_pandas(pdf[["p_brand", "revenue", "n_items"]],
                                 preserve_index=False)
    return table


_REVENUE_BRAND_SQL = """
SELECT p.p_brand,
       CAST(SUM(CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round_even(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


def orders_by_nation(sf_dir: str):
    """Two-hop broadcast join (customer -> nation chain) onto the fact."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    import numpy as np

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    # two-hop broadcast collapsed into one dense gather: custkey -> nation
    # code (custkeys are 1..N); per-batch bincount partials mean the shuffle
    # carries 25 rows per batch, not every order
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    names = nation.column("n_name").to_numpy(zero_copy_only=False)
    name_of_nk = np.empty(int(nk.max()) + 1, dtype=object)
    name_of_nk[nk] = names
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    code_of_cust = np.zeros(int(ck.max()) + 1, dtype=np.int32)
    code_of_cust[ck] = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
    n_nations = int(nk.max()) + 1

    def partial(b: pa.Table) -> pa.Table:
        codes = code_of_cust[b.column("o_custkey").to_numpy(zero_copy_only=False)]
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        total = np.bincount(codes, weights=price, minlength=n_nations)
        n = np.bincount(codes, minlength=n_nations)
        return pa.table({
            "nation_code": pa.array(np.arange(n_nations, dtype=np.int32)),
            "n_orders": pa.array(n.astype(np.int64)),
            "total_price": pa.array(total, pa.float64()),
        })

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_custkey", "o_totalprice"])
    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "nation_code").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_price", alias_name="total_price"),
    )
    pdf = out.to_pandas()
    pdf["n_name"] = name_of_nk[pdf["nation_code"]]
    pdf = pdf[pdf["n_orders"] > 0]
    table = pa.Table.from_pandas(pdf[["n_name", "n_orders", "total_price"]],
                                 preserve_index=False)
    return _scaled(table, {"total_price": 10_000})


_ORDERS_NATION_SQL = """
SELECT n.n_name, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(o.o_totalprice) * 10000) AS BIGINT) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q3_shipping_priority(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q3 shape: segment gate (broadcast dense custkey mask) +
    date-filtered orders ⋈ date-filtered lineitem — the big-big join
    class. Under ``driver_limit`` lineitem rows both map-side outputs
    (revenue partials per orderkey; the date+segment-filtered slim
    orders) are guard-bounded small, so the driver folds them with one
    pyarrow group_by + join — zero shuffles. Above the guard, ONE
    all-to-all for the whole query: the PARTIALS feed the distributed
    hash join (whose partitioning co-locates every row of a key), and
    the final per-key sum + top-k happen per joined block. Verified Ray
    2.49 invariant the join path relies on (probed incl. forced-tiny
    target_max_block_size): the hash-shuffle join emits each partition
    as one block, so no key spans blocks — and any regression would land
    as an oracle value mismatch, not silent skew. Top-10 = per-block
    local top-k + a tiny driver merge, never a full sort."""
    rd = _rd()
    import numpy as np
    import ray

    from ..stages.dedup import _cached_get

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg = cust.filter(pc.equal(cust.column("c_mktsegment"), "BUILDING"))
    ck = seg.column("c_custkey").to_numpy(zero_copy_only=False)
    all_ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    mask = np.zeros(int(all_ck.max()) + 1, dtype=bool)
    mask[ck] = True
    mask_ref = ray.put(mask)

    cut = np.datetime64("1998-06-01")

    def _epoch_cut(unit: str) -> int:
        per = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        return int(cut.astype("datetime64[s]").astype(np.int64)) * per

    def orders_filter(b: pa.Table) -> pa.Table:
        m = _cached_get(mask_ref)
        keys = b.column("o_custkey").to_numpy(zero_copy_only=False)
        od = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy()
        keep = m[keys] & (od < _epoch_cut(b.column("o_orderdate").type.unit))
        kept = b.filter(pa.array(keep))
        per = {"s": 1, "ms": 10**3, "us": 10**6,
               "ns": 10**9}[b.column("o_orderdate").type.unit]
        epoch = pc.divide(pc.cast(kept.column("o_orderdate"), pa.int64()),
                          per)
        return pa.table({
            # key named like the lineitem side: Dataset.join joins on
            # same-named columns
            "l_orderkey": pc.cast(kept.column("o_orderkey"), pa.int64()),
            "order_epoch": epoch,
            "o_orderpriority": kept.column("o_orderpriority"),
        })

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"],
    ).map_batches(orders_filter, batch_format="pyarrow")

    def lineitem_partial(b: pa.Table) -> pa.Table:
        sd = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy()
        keep = sd > _epoch_cut(b.column("l_shipdate").type.unit)
        kept = b.filter(pa.array(keep))
        rev = pc.multiply(
            kept.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), kept.column("l_discount")))
        t = pa.table({"l_orderkey": pc.cast(kept.column("l_orderkey"),
                                            pa.int64()),
                      "rev": rev})
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    # rev PARTIALS go straight into the join: its hash partitioning
    # already co-locates every row of a key in one output partition, so
    # the final per-key sum is a per-block vectorized group_by — ONE
    # all-to-all for the whole query instead of groupby-then-join (the
    # separate Sum groupby measured 10.9 s vs the join's 2.3 s at sf0.1)
    rev = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(lineitem_partial, batch_format="pyarrow")

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        parts = _gather(rev)
        tot = (parts.group_by("l_orderkey").aggregate([("rev", "sum")])
               .rename_columns(["l_orderkey", "rev"]))
        ords = _gather(orders_f)
        df = tot.join(ords, keys=["l_orderkey"],
                      join_type="inner").to_pandas()
        if len(df) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "revenue": pa.array([], pa.int64()),
                             "order_epoch": pa.array([], pa.int64()),
                             "o_orderpriority": pa.array([], pa.string())})
        df["revenue"] = (df["rev"] * 10_000).round().astype("int64")
        final = df.sort_values(["revenue", "order_epoch", "l_orderkey"],
                               ascending=[False, True, True]).head(10)
        return pa.Table.from_pandas(
            final[["l_orderkey", "revenue", "order_epoch",
                   "o_orderpriority"]].reset_index(drop=True),
            preserve_index=False)

    # each partition = one hash-shuffle aggregator ACTOR (a fresh worker
    # process): cap low — spawn cost dominates at bench scale, and at
    # real scale partition count should track data size, not CPU count
    n_parts = _join_parts()
    joined = rev.join(orders_f, "inner", n_parts, on=("l_orderkey",))

    def local_top(b: pa.Table):
        # complete per-key aggregation: this block holds ALL partials of
        # its keys (join hash partitioning), so sum-then-rank is exact
        g = b.group_by(["l_orderkey", "order_epoch",
                        "o_orderpriority"]).aggregate([("rev", "sum")])
        df = g.rename_columns(["l_orderkey", "order_epoch",
                               "o_orderpriority", "rev"]).to_pandas()
        # scale BEFORE ranking so ties order exactly like the oracle's
        # ORDER BY on the rounded value
        df["revenue"] = (df["rev"] * 10_000).round().astype("int64")
        df = df.sort_values(["revenue", "order_epoch", "l_orderkey"],
                            ascending=[False, True, True]).head(10)
        return pa.Table.from_pandas(
            df[["l_orderkey", "revenue", "order_epoch",
                "o_orderpriority"]], preserve_index=False)

    tops = joined.map_batches(local_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if len(tops) == 0:
        return pa.table({"l_orderkey": pa.array([], pa.int64()),
                         "revenue": pa.array([], pa.int64()),
                         "order_epoch": pa.array([], pa.int64()),
                         "o_orderpriority": pa.array([], pa.string())})
    final = tops.sort_values(["revenue", "order_epoch", "l_orderkey"],
                             ascending=[False, True, True]).head(10)
    return pa.Table.from_pandas(final.reset_index(drop=True),
                                preserve_index=False)


_Q3_SQL = """
SELECT l.l_orderkey,
       CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)) * 10000)
            AS BIGINT) AS revenue,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS order_epoch,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY 1, 3, 4
ORDER BY revenue DESC, order_epoch, l_orderkey
LIMIT 10
"""


def top_users_by_value(sf_dir: str):
    """Aggregate + top-k WITHOUT a global sort: the groupby output has
    unbounded key cardinality at scale, so the top-10 is a map-side
    per-block local top-k (one Arrow sort_indices + take per block)
    followed by a driver merge of <= 10*n_blocks rows — the knn_graph /
    docs_textrank shape. The all-to-all ``sort().limit(10)`` this
    replaces moved every aggregated row for a 10-row answer."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    def partial(b: pa.Table) -> pa.Table:
        # map-side combine — value scales to exact integer cents BEFORE
        # summation (scale-before-sum convention: order-free at any scale)
        cents = np.rint(np.asarray(b.column("value"),
                                   dtype=np.float64) * 100).astype(np.int64)
        t = pa.table({"user_id": b.column("user_id"),
                      "cents": pa.array(cents, pa.int64())})
        g = t.group_by(["user_id"]).aggregate(
            [("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["user_id", "total_value", "n_events"])

    keys = [("total_value", "descending"), ("user_id", "ascending")]

    def local_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= 10:
            return b
        return b.take(pc.sort_indices(b, sort_keys=keys)[:10])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("total_value", alias_name="total_value"),
                   Sum("n_events", alias_name="n_events"))
        .map_batches(local_topk, batch_format="pyarrow")
    )
    tops = pa.concat_tables([b for b in cand.iter_batches(
        batch_size=None, batch_format="pyarrow")])
    out = tops.take(pc.sort_indices(tops, sort_keys=keys)[:10])
    pdf = out.to_pandas()
    pdf["n_events"] = pdf["n_events"].astype("int64")
    # report at the 1e-4 scale (cents * 100 == ROUND(SUM(value)*1e4) exactly)
    pdf["total_value"] = pdf["total_value"].astype("int64") * 100
    return pa.Table.from_pandas(pdf, preserve_index=False)


_TOP_USERS_SQL = """
SELECT user_id,
       CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT)) * 100 AS BIGINT) AS total_value,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT 10
"""


# ===================================================================
# Streaming-shaped: windows + sessionization over the events log
# ===================================================================


def events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type (map-side partial, then groupby)."""
    rd = _rd()
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        # pure-Arrow partial: floor("h") = truncating int64 divide on the
        # epoch ticks (ts is a positive post-1970 timestamp, so truncation
        # == floor), then one Arrow group_by per batch
        ts = b.column("ts")
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        hour_epoch = pc.multiply(
            pc.divide(pc.cast(ts, pa.int64()), 3600 * per_sec),
            pa.scalar(3600, pa.int64()))
        t = pa.table({"event_type": b.column("event_type"),
                      "hour_epoch": hour_epoch,
                      "value": b.column("value")})
        g = t.group_by(["event_type", "hour_epoch"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "hour_epoch", "n", "sum_value"])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "hour_epoch"]
    ).aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    table = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    table = table.set_column(table.schema.get_field_index("n"), "n",
                             pc.cast(table.column("n"), pa.int64()))
    return _scaled(table, {"sum_value": 10_000})


_EVENTS_HOURLY_SQL = """
SELECT event_type,
       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n, CAST(ROUND(SUM(value) * 10000) AS BIGINT) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def sessionize(sf_dir: str):
    """Gap-based sessionization (30 min) per user — ``groupby(user).
    map_groups`` over ts-sorted groups, the engine's window pattern for
    stream-shaped data.

    A map-side segment-partial variant (emit per-slab session segments,
    merge at the reduce) was measured here and REVERTED: this corpus is
    gap-dominated (median session ~1 event), so segments ~= events and the
    extra stage only added overhead (2.5-3.5 s vs 1.5-1.8 s at sf0.1).
    Partial sessionization only pays when sessions are dense relative to
    the batch slab width."""
    rd = _rd()

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff() > pd.Timedelta(minutes=30)
        sid = gaps.cumsum()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(sid.iloc[-1]) + 1 if len(g) else 0],
                "n_events": [len(g)],
                "max_session_events": [int(sid.value_counts().max())],
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), per_session AS (
  SELECT user_id, sid, COUNT(*) AS n FROM numbered GROUP BY user_id, sid
)
SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n) AS BIGINT) AS n_events,
       MAX(n) AS max_session_events
FROM per_session GROUP BY user_id
"""


def orderkey_union_count(sf_dir: str):
    """Set ops: union of two sources + DISTRIBUTED distinct count.

    Map-side per-batch dedup (``pc.unique``) shrinks the shuffle; keys
    then hash into ~CPUs*4 FAT buckets so the distinct count is one
    ``np.unique`` per bucket plus a tiny sum — each key lands in exactly
    one bucket, so per-bucket uniques are global uniques. (A single-key
    ``groupby(k).Count`` over the ~1.1M post-dedup rows paid Ray's
    sort-based aggregate: 12.4 s vs ~2 s for the bucket shape at sf0.1.)
    Only the COUNT crosses to the driver — ``Dataset.unique`` would
    return the full distinct key list driver-side."""
    rd = _rd()

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]).map_batches(
        lambda b: b.rename_columns(["k"]), batch_format="pyarrow"
    )
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"]).map_batches(
        lambda b: b.rename_columns(["k"]), batch_format="pyarrow"
    )

    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    nb = _default_buckets()

    def batch_distinct(b: pa.Table) -> pa.Table:
        k = pc.unique(b.column("k").combine_chunks())
        kb = (_mix64_np(np.asarray(k, dtype=np.int64).view(np.uint64))
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"k": k, "_kb": pa.array(kb, pa.int64())})

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": pd.Series([int(np.unique(g["k"].to_numpy()).size)],
                            dtype="int64")})

    per_bucket = (li.union(od)
                  .map_batches(batch_distinct, batch_format="pyarrow")
                  .groupby("_kb").map_groups(bucket_distinct,
                                             batch_format="pandas"))
    total = sum(int(b.column("n")[i].as_py())
                for b in per_bucket.iter_batches(batch_size=4096,
                                                 batch_format="pyarrow")
                for i in range(b.num_rows))
    return pa.table({"n_distinct_keys": pa.array([total], pa.int64())})


_UNION_COUNT_SQL = """
SELECT COUNT(*) AS n_distinct_keys FROM (
  SELECT DISTINCT k FROM (
    SELECT l_orderkey AS k FROM lineitem
    UNION ALL SELECT o_orderkey FROM orders
  )
)
"""


_LLM_EXTRACT_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\s+'),
                            x -> x <> '')) AS tok
  FROM documents
), counts AS (
  SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY doc_id, tok
), ranked AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tok ASC) AS r
  FROM counts
), top3 AS (
  SELECT doc_id, list(tok ORDER BY r) AS top_words
  FROM ranked WHERE r <= 3 GROUP BY doc_id
)
SELECT d.doc_id,
       1 AS n_chunks,
       '{"n_tokens": ' ||
       CAST(CAST(ceil(len(d.text) / 4.0) AS BIGINT) AS VARCHAR) ||
       ', "top_words": ["' ||
       list_aggregate(t.top_words, 'string_agg', '", "') || '"]}'
       AS extracted_json
FROM documents d JOIN top3 t ON t.doc_id = d.doc_id
"""


def docs_llm_extract(sf_dir: str):
    """Chunk -> stub-extract -> merge over documents (the LLM actor-pool
    stage T4/T5 end to end). The deterministic stub IS SQL-expressible on
    this corpus: the line-based chunker emits exactly one chunk for
    newline-free texts (the oracle's constant n_chunks=1 asserts that),
    top-3 words = ORDER BY count DESC, word ASC, n_tokens = ceil(len/4),
    and the merged JSON string is reconstructed byte-exactly."""
    from ..stages.llm_extract import StubExtractor

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(StubExtractor, batch_format="pyarrow",
                         concurrency=_conc(), batch_size=128, num_cpus=0.5,
                         max_restarts=0)
    return pa.concat_tables(
        out.iter_batches(batch_size=8192, batch_format="pyarrow")
    ).select(["doc_id", "n_chunks", "extracted_json"])


_LLM_EXTRACT_SCHEMA_SQL = r"""
WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                      x -> x <> '') AS w FROM documents)
SELECT doc_id, 1 AS n_chunks,
  '{"keywords": ["' || w[1] || ' ' || w[2] || '", "' || w[2] || ' ' || w[3]
  || '"], "meta": {"ok": ' ||
  CASE WHEN len(w) % 2 = 0 THEN 'true' ELSE 'false' END ||
  '}, "n_words": ' || CAST(len(w) AS VARCHAR) || ', "summary": "'
  || w[1] || ' ' || w[2] || '"}' AS extracted_json,
  TRUE AS schema_valid
FROM w
"""


def docs_llm_extract_schema(sf_dir: str):
    """json_options extraction: user JSON-Schema -> normalize_schema
    (LLMExtract.ts:21-70) -> chunk -> schema-conforming stub extraction ->
    merge -> validate. The deterministic stub is SQL-replicable on this
    corpus (single-line texts => one chunk, asserted by n_chunks; stub
    field rules per type; byte-exact sort_keys JSON reconstruction)."""
    from ..stages.llm_extract import SchemaStubExtractor

    json_options = {
        "prompt": "Extract the company profile",
        "schema": {
            "type": "object",
            "properties": {
                "summary": {"type": "string", "default": "n/a"},
                "n_words": {"type": "integer"},
                "keywords": {"type": "array", "items": {"type": "string"}},
                "meta": {"type": "object",
                         "properties": {"ok": {"type": "boolean"}}},
            },
            "required": ["summary"],
        },
    }
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(SchemaStubExtractor, batch_format="pyarrow",
                         fn_constructor_kwargs={"json_options": json_options},
                         concurrency=_conc(), batch_size=128, num_cpus=0.5,
                         max_restarts=0)
    return pa.concat_tables(
        out.iter_batches(batch_size=8192, batch_format="pyarrow")
    ).select(["doc_id", "n_chunks", "extracted_json", "schema_valid"])


def events_sliding(sf_dir: str):
    """Sliding window (1 h length, 30 min slide) per event_type: each event
    contributes to the two windows covering it — emitted as two partial
    rows map-side, then one small groupby (no per-window re-scan)."""
    rd = _rd()
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        # pure-Arrow partial: half-hour bucket via truncating int64 divide
        # (positive epochs), each event emitted into its two covering
        # windows, one Arrow group_by over the doubled batch
        ts = b.column("ts")
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        half = pc.divide(pc.cast(ts, pa.int64()), 1800 * per_sec)
        parts = []
        for shift in (0, 1):
            ws = pc.multiply(
                pc.subtract(half, pa.scalar(shift, pa.int64())),
                pa.scalar(1800, pa.int64()))
            parts.append(pa.table({"event_type": b.column("event_type"),
                                   "window_start": ws,
                                   "value": b.column("value")}))
        g = pa.concat_tables(parts).group_by(
            ["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return g.rename_columns(["event_type", "window_start", "n", "sum_value"])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    out = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "window_start"]
    ).aggregate(Sum("n", alias_name="n"), Sum("sum_value", alias_name="sum_value"))
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    pdf["window_start"] = pdf["window_start"].astype("int64")
    return _scaled(pa.Table.from_pandas(pdf, preserve_index=False),
                   {"sum_value": 10_000})


_EVENTS_SLIDING_SQL = """
WITH halves AS (
  SELECT event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) // 1800 AS half  -- floor, not
         -- DuckDB's rounding double->bigint cast
  FROM events
), expanded AS (
  SELECT event_type, value, half * 1800 AS window_start FROM halves
  UNION ALL
  SELECT event_type, value, (half - 1) * 1800 FROM halves
)
SELECT event_type, window_start, COUNT(*) AS n,
       CAST(ROUND(SUM(value) * 10000) AS BIGINT) AS sum_value
FROM expanded GROUP BY event_type, window_start
"""


def top_events_per_type(sf_dir: str):
    """Per-group top-k (groupby.map_groups over value-sorted groups)."""
    rd = _rd()

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value", "event_id"], ascending=[False, True]).head(3)[
            ["event_type", "event_id"]
        ]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "event_id", "value"])
    out = ds.groupby("event_type").map_groups(top3, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_TOP_EVENTS_SQL = """
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


def events_distinct_users(sf_dir: str):
    """Distinct-count via mergeable per-batch sets (map-side partial sets,
    set-union reduce in map_groups — the exact-sketch pattern; an HLL slots
    into the same shape at scale)."""
    rd = _rd()

    def partial_sets(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("event_type")["user_id"].agg(lambda s: list(set(s)))
        return pa.table({"event_type": list(g.index),
                         "users": pa.array([sorted(v) for v in g.values],
                                           pa.list_(pa.int64()))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        all_users = set()
        for lst in g["users"]:
            all_users.update(lst)
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_users": [len(all_users)]})

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    out = ds.map_batches(partial_sets, batch_format="pyarrow").groupby(
        "event_type"
    ).map_groups(merge, batch_format="pandas")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def lineitem_recent(sf_dir: str):
    """Predicate pushdown at the read: row-group filter + column pruning,
    then a tiny aggregate — the prune-at-the-read pattern."""
    rd = _rd()
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_returnflag"],
        filter=(pc.field("l_shipdate") >= pa.scalar(pd.Timestamp("1997-01-01"))),
    )
    out = ds.groupby("l_returnflag").aggregate(
        Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty")
    )
    pdf = out.to_pandas()
    pdf["n"] = pdf["n"].astype("int64")
    return _scaled(pa.Table.from_pandas(pdf, preserve_index=False), {"sum_qty": 100})


_LINEITEM_RECENT_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(ROUND(SUM(l_quantity) * 100) AS BIGINT) AS sum_qty
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


# ===================================================================
# Text analysis over documents
# ===================================================================


def docs_text_stats(sf_dir: str):
    rd = _rd()
    from ..stages.text_analysis import text_stats_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(text_stats_batch, batch_format="pyarrow")
    table = pa.concat_tables(
        [b for b in out.iter_batches(batch_size=8192, batch_format="pyarrow")]
    ).select(["doc_id", "n_chars_calc", "n_tokens", "stop_hits", "punct_hits", "quality"])
    return _scaled(table, {"quality": 1_000_000})


_TEXT_STATS_SQL = """
WITH t AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> x IN ('the','a','and','of','to','in'))) AS stop_hits,
       length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct_hits,
       CAST(ROUND(LEAST(1.0, len(toks) / 64.0) *
             (1.0 - CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, x -> x IN ('the','a','and','of','to','in')))
                         * 1.0 / len(toks) END) * 1000000) AS BIGINT) AS quality
FROM t
"""


def docs_vocab(sf_dir: str):
    """Distinct-word count per doc (tokenizer parity check)."""
    rd = _rd()
    import re

    tok = re.compile(r"\S+")

    def vocab(b: pa.Table) -> pa.Table:
        counts = [len(set(tok.findall(t))) for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_distinct_words": pa.array(counts, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pa.concat_tables(
        ds.map_batches(vocab, batch_format="pyarrow").iter_batches(
            batch_size=8192, batch_format="pyarrow"
        )
    )


_VOCAB_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
       END AS n_distinct_words
FROM documents
"""


def docs_bpe_tokens(sf_dir: str):
    """BPE-ish token counts (letter runs / digit runs / single symbols) —
    the tokenizer the chunker family uses, oracle-checked."""
    rd = _rd()
    from ..functions.credits import bpe_ish_tokens

    def count(b: pa.Table) -> pa.Table:
        counts = [len(bpe_ish_tokens(t)) for t in b.column("text").to_pylist()]
        return pa.table({"doc_id": b.column("doc_id"),
                         "n_bpe_tokens": pa.array(counts, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pa.concat_tables(
        ds.map_batches(count, batch_format="pyarrow").iter_batches(
            batch_size=8192, batch_format="pyarrow"
        )
    )


_BPE_TOKENS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^ \\t\\r\\n\\f\\x0bA-Za-z0-9]'))
           AS n_bpe_tokens
FROM documents
"""


def docs_by_lang(sf_dir: str):
    rd = _rd()
    from ray.data.aggregate import Count, Mean, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
    out = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"),
        Mean("n_chars", alias_name="avg_chars"),
    )
    table = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    return _scaled(table, {"avg_chars": 1_000_000})


_BY_LANG_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(ROUND(AVG(n_chars) * 1000000) AS BIGINT) AS avg_chars
FROM documents GROUP BY lang
"""


def docs_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()[["doc_id", "text", "n_copies"]]
    return pa.Table.from_pandas(out, preserve_index=False)


_EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS doc_id, text, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


_LANG_GUESS_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, text,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '')[1:200]) AS t
  FROM documents
), hits AS (
  SELECT doc_id, lang, text,
    len(list_intersect(t, ['the','and','of','is','with'])) AS en,
    len(list_intersect(t, ['der','die','und','ist','mit'])) AS de,
    len(list_intersect(t, ['le','la','et','est','avec'])) AS fr,
    len(list_intersect(t, ['el','la','y','es','con'])) AS es
  FROM toks
)
SELECT doc_id, lang, CASE
  WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
  WHEN de > en AND de >= fr AND de >= es THEN 'de'
  WHEN fr > en AND fr > de AND fr >= es THEN 'fr'
  WHEN es > en AND es > de AND es > fr THEN 'es'
  ELSE 'en' END AS lang_guess
FROM hits
"""


def docs_lang_guess(sf_dir: str):
    """Language-ID heuristic. Exact SQL oracle: the marker-word argmax
    (first-200 distinct tokens, strict-> sequential tie-break => earliest
    language in en/de/fr/es order wins ties) and the Han-script gate are
    both relationally expressible."""
    from ..stages.text_analysis import LangId

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow", concurrency=_conc(),
                         num_cpus=0.5, max_restarts=0)
    return pa.concat_tables(
        out.iter_batches(batch_size=8192, batch_format="pyarrow")
    ).select(["doc_id", "lang", "lang_guess"])


def docs_fingerprint(sf_dir: str):
    """Rolling-hash fingerprints — full SQL oracle (the uint64 polynomial
    replays in DuckDB via the u64 macro kernel, oracle_kernels.py)."""
    from ..stages.text_analysis import Fingerprinter

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(Fingerprinter, batch_format="pyarrow",
                         concurrency=_conc(), num_cpus=0.5, max_restarts=0)
    return pa.concat_tables(
        out.iter_batches(batch_size=8192, batch_format="pyarrow")
    ).select(["doc_id", "fingerprint"])


def docs_minhash_pairs(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    rd = _rd()
    # 32 blocks: signature compute parallelizes across the session's CPUs
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                         override_num_blocks=32)
    out = minhash_lsh_pairs(ds, threshold=0.5)
    return _scaled(out, {"jaccard": 1_000_000})


def docs_minhash_oph(sf_dir: str):
    """One-permutation MinHash near-dup pairs (Li et al. 2012 OPH +
    Shrivastava & Li 2014 rotation densification): one hash pass over the
    shingles instead of 64 permutations, banded exactly like classic
    MinHash, exact matched-bin gate at nbins/2. Full value-hash oracle
    (signatures, densification offsets and band collisions all replay in
    SQL)."""
    from ..stages.dedup import oph_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=32)
    return oph_pairs(ds, nbins=32, bands=8, k=3)


def docs_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                         override_num_blocks=32)
    return simhash_pairs(ds, max_hamming=3)


def embeddings_neardup(sf_dir: str):
    from ..stages.dedup import embedding_neardup_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_neardup_pairs(ds, threshold=0.95)
    return out.select(["a", "b"])  # ints only for stability


def docs_pack_sequences(sf_dir: str):
    """Greedy sequence packing manifest (budget 512 whitespace tokens,
    doc_id order) via the distributed prefix-sum in
    ``stages.text_analysis.pack_sequences`` — window-function oracle."""
    from ..stages.text_analysis import pack_sequences

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return pack_sequences(ds, budget=512)


_PACK_SEQUENCES_SQL = """
WITH t AS (SELECT doc_id,
        len(list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '')) AS n_tokens
        FROM documents),
c AS (SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS before
      FROM t)
SELECT CAST(COALESCE(before, 0) // 512 AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


def corpus_build(sf_dir: str):
    """END-TO-END training-corpus build — the composition row tying the
    crawl engine to the LLM-data stages in ONE pipeline: (1) crawl the
    synthetic site from a non-root seed through the real frontier /
    fetch / parse engine (markdown format, ``include_tags=['p']`` so
    extraction keeps only the article paragraphs — the reference's
    include_tags semantics, HTMLTransformer.ts); (2) reassemble each
    page's markdown spans and quality-gate on whitespace-token count
    (>= 40); (3) pack survivors into 512-token training sequences with
    the distributed prefix-sum packer (stages/text_analysis.py
    ``pack_sequences``). Returns the packing manifest (bin, n_docs,
    sum_tokens).

    Oracle exactness: paragraph-only extraction is TOKEN-exact against
    ``documents.text`` (the page body is the source text split into two
    <p> halves — splitting at a space and markdown escaping both
    preserve whitespace tokenization; pinned empirically 499/499 and by
    the equality of this row's hash to the SQL replay), so the DuckDB
    twin is a recursive-CTE reachability pass over the shared graph
    rule + token arithmetic + the pack window formula. Span assembly is
    Arrow kernels (flatten / parent-indices / binary_join) — no
    per-row Python."""
    import ray

    from ..sources.synthetic_site import build_site_table, page_url
    from ..stages.text_analysis import pack_sequences
    from .crawl import CrawlJob, run_crawl

    rd = _rd()
    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="corpus", seed_urls=[page_url(1)], strategy="all",
                   max_depth=20, limit=50_000, formats=["markdown"],
                   include_tags=["p"])
    res = run_crawl(job, pages, use_ray=ray.is_initialized(),
                    ray_wave_threshold=64)

    kept = rd.from_arrow(
        res.documents,
        override_num_blocks=max(8, min(64, res.documents.num_rows // 256)),
    ).map_batches(_assemble_md_paragraphs, batch_format="pyarrow")
    return pack_sequences(kept, budget=512)


def _assemble_md_paragraphs(b: pa.Table, min_tokens: int = 40) -> pa.Table:
    """Crawl span documents -> (doc_id = page index, text = joined
    markdown paragraphs) rows passing the whitespace-token quality gate.
    Pure Arrow kernels: struct-list flatten + parent-index counts rebuild
    the per-doc list, ``binary_join`` concatenates, and the token count is
    one vectorized regex. Shared by the corpus composition rows."""
    spans = b.column("spans").combine_chunks()
    flat = spans.flatten()
    m = pc.equal(flat.field("kind"), "markdown")
    par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    texts_md = flat.field("text").filter(m)
    counts = np.bincount(par[m.to_numpy(zero_copy_only=False)],
                         minlength=b.num_rows)
    joined = pc.binary_join(pa.ListArray.from_arrays(
        pa.array(np.concatenate(([0], np.cumsum(counts))), pa.int32()),
        texts_md), " ")
    idx = pc.cast(pc.list_element(
        pc.split_pattern(b.column("url"), "/p/"), 1), pa.int64())
    keep = pc.and_(
        pc.equal(b.column("status"), "completed"),
        pc.greater_equal(pc.cast(pc.count_substring_regex(
            joined, r"\S+"), pa.int64()),
            pa.scalar(min_tokens, pa.int64())))
    return pa.table({"doc_id": idx, "text": joined}).filter(keep)


def corpus_dedup_build(sf_dir: str):
    """corpus_build with a REAL dedup stage: the site doubles its page
    count by cycling texts (``build_site_table(total_pages=2n)`` — page
    ``i`` carries ``documents.text[i %% n]``), so the crawl yields exact
    duplicate pages; crawl -> paragraph extraction -> token gate ->
    EXACT first-wins dedup (stages/dedup.exact_dedup: min page index per
    identical text survives) -> 512-token packing. Gate and dedup
    commute here (identical texts have identical token counts), so the
    oracle replays: reachability over the DOUBLED graph (ids =
    documents twice, shifted), survivor = min reachable id per DISTINCT
    TEXT (not per id%%n class — the source corpus itself carries a few
    naturally duplicated texts at sf0.1, and exact dedup merges those
    too; caught by the oracle at sf0.1), token arithmetic, pack
    window."""
    import ray

    from ..sources.synthetic_site import build_site_table, page_url
    from ..stages.dedup import exact_dedup
    from ..stages.text_analysis import pack_sequences
    from .crawl import CrawlJob, run_crawl

    rd = _rd()
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    pages = build_site_table(f"{sf_dir}/documents.parquet",
                             total_pages=2 * n_docs)
    job = CrawlJob(job_id="corpusd", seed_urls=[page_url(1)],
                   strategy="all", max_depth=20, limit=50_000,
                   formats=["markdown"], include_tags=["p"])
    res = run_crawl(job, pages, use_ray=ray.is_initialized(),
                    ray_wave_threshold=64)
    kept = rd.from_arrow(
        res.documents,
        override_num_blocks=max(8, min(64, res.documents.num_rows // 256)),
    ).map_batches(_assemble_md_paragraphs, batch_format="pyarrow")
    survivors = exact_dedup(kept).drop_columns(["text_hash", "n_copies"])
    return pack_sequences(survivors, budget=512)


_CORPUS_DEDUP_SQL = """
WITH RECURSIVE nn AS (SELECT 2 * COUNT(*) AS c, COUNT(*) AS nd
                      FROM documents),
ids AS (SELECT doc_id AS i FROM documents
        UNION ALL SELECT d.doc_id + nn.nd FROM documents d, nn),
edges AS (
  SELECT i AS src, 2 * i + 1 AS dst FROM ids, nn WHERE 2 * i + 1 < nn.c
  UNION ALL
  SELECT i, 2 * i + 2 FROM ids, nn WHERE 2 * i + 2 < nn.c
  UNION ALL
  SELECT i, (7 * i + 3) % nn.c FROM ids, nn WHERE i % 3 = 0
),
reach(id, depth) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
),
surv AS (SELECT MIN(r.id) AS keep_id,
                len(list_filter(regexp_split_to_array(d.text, '\\s+'),
                                x -> x <> '')) AS n_tokens
         FROM (SELECT DISTINCT id FROM reach) r
         CROSS JOIN nn
         JOIN documents d ON d.doc_id = r.id % nn.nd
         GROUP BY d.text),
t AS (SELECT keep_id AS doc_id, n_tokens FROM surv),
q AS (SELECT * FROM t WHERE n_tokens >= 40),
c AS (SELECT doc_id, n_tokens,
        SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before
      FROM q)
SELECT CAST(COALESCE(before, 0) // 512 AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


_CORPUS_BUILD_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
),
t AS (SELECT d.doc_id,
        len(list_filter(regexp_split_to_array(d.text, '\\s+'),
                        x -> x <> '')) AS n_tokens
      FROM documents d
      JOIN (SELECT DISTINCT id FROM reach) r ON d.doc_id = r.id),
q AS (SELECT * FROM t WHERE n_tokens >= 40),
c AS (SELECT doc_id, n_tokens,
        SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before
      FROM q)
SELECT CAST(COALESCE(before, 0) // 512 AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


def docs_neardup_clusters(sf_dir: str):
    """Near-dup cluster canonicalization: MinHash-LSH verified pairs
    (Jaccard >= 0.5, same parameters as docs_minhash_pairs) -> connected
    components via distributed min-label propagation -> (doc_id,
    cluster_rep = min id in component). Recursive-CTE oracle over the
    same pinned u64 MinHash SQL chain."""
    from ..stages.dedup import minhash_lsh_pairs, neardup_components

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    return neardup_components(pairs)


def _neardup_clusters_sql() -> str:
    from . import oracle_kernels as _ok

    # the minhash chain ends in scored(a, b, i, u); admitted edges feed a
    # recursive transitive closure whose per-node min reachable id is the
    # component representative
    return f"""{_ok.U64_PRELUDE}
WITH RECURSIVE {_ok._minhash_ctes()},
edges AS (SELECT a, b FROM scored WHERE (u = 0) OR (2 * i >= u)),
sym AS (SELECT a AS x, b AS y FROM edges
        UNION ALL SELECT b, a FROM edges),
reach(x, y) AS (
    SELECT x, y FROM sym
    UNION
    SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
)
SELECT x AS doc_id, least(x, min(y)) AS cluster_rep
FROM reach GROUP BY x ORDER BY doc_id
"""


_SAMPLE_QUOTAS = {"en": 250, "zh": 800, "es": 800, "de": 800, "fr": 800}


def docs_sample_stratified(sf_dir: str):
    """Deterministic stratified sampling for training-data mixing:
    keep doc iff ``splitmix64(doc_id) % 1000 < quota_permille[lang]``
    (downsample the dominant language, keep most of the tail). Pure
    map-side — no shuffle, no RNG state, identical at any parallelism;
    the mix64 kernel is the oracle-pinned one from oracle_kernels."""
    import numpy as np

    from ..stages.text_analysis import _mix64_np

    rd = _rd()

    def sample(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_pylist()
        quota = np.fromiter((_SAMPLE_QUOTAS.get(l, 0) for l in langs),
                            count=len(langs), dtype=np.uint64)
        hv = _mix64_np(ids.astype(np.uint64)) % np.uint64(1000)
        kept = b.filter(pa.array(hv < quota))
        return pa.table({"doc_id": pc.cast(kept.column("doc_id"),
                                           pa.int64()),
                         "lang": kept.column("lang")})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    out = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["doc_id"].astype("int64")),
                     "lang": pa.array(out["lang"], pa.string())})


def _sample_stratified_sql() -> str:
    from . import oracle_kernels as _ok

    quotas = ", ".join(f"('{l}', {q})" for l, q in _SAMPLE_QUOTAS.items())
    return f"""{_ok.U64_PRELUDE}
WITH q(lang, quota) AS (VALUES {quotas}),
h AS (SELECT doc_id, lang, mix64(CAST(doc_id AS UBIGINT)) AS hv
      FROM documents)
SELECT h.doc_id, h.lang
FROM h JOIN q USING (lang)
WHERE hv % 1000 < quota
ORDER BY doc_id
"""


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: corpus docs (doc_id % 20 != 0) sharing
    >= 1 distinct word 4-gram with the planted 'benchmark' subset
    (doc_id % 20 == 0) — broadcast small side, one streaming corpus
    pass, full SQL oracle."""
    from ..stages.dedup import decontaminate

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _mod_filter(keep_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 20 == 0) if keep_bench else (ids % 20 != 0)
            return b.filter(pa.array(mask))

        return f

    bench = docs.map_batches(_mod_filter(True), batch_format="pyarrow")
    corpus = docs.map_batches(_mod_filter(False), batch_format="pyarrow")
    return decontaminate(corpus, bench, n=4, min_shared=1)


_DECONTAMINATE_SQL = """
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS w
     FROM documents),
g AS (SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
             w[i+3] AS g
      FROM w, UNNEST(range(1, len(w) - 2)) AS t(i)),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 20 = 0)
SELECT g.doc_id, count(DISTINCT g.g) AS n_shared
FROM g JOIN bench USING (g)
WHERE g.doc_id % 20 <> 0
GROUP BY 1
HAVING count(DISTINCT g.g) >= 1
ORDER BY doc_id
"""


_NGRAM_MAX_DF = 200  # stop-gram cap — ONE constant, mirrored into the SQL


def docs_ngram_jaccard(sf_dir: str):
    """Exact word-bigram Jaccard >= 25% via distributed inverted index —
    full SQL oracle (integer threshold arithmetic on both sides). The
    df > _NGRAM_MAX_DF stop-gram cap is ACTIVE and mirrored by the
    oracle's ``df`` CTE (capped grams leave the index on both engines)."""
    from ..stages.dedup import ngram_jaccard_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold_pct=25, n=2,
                               max_df=_NGRAM_MAX_DF)


_NGRAM_JACCARD_SQL = f"""
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\\s+'),
                        x -> x <> '') AS w
     FROM documents),
bg AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bg
       FROM w, UNNEST(range(1, len(w))) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
df AS (SELECT bg FROM bg GROUP BY bg HAVING count(*) <= {_NGRAM_MAX_DF}),
bgk AS (SELECT bg.doc_id, bg.bg FROM bg JOIN df USING (bg)),
inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
          FROM bgk a JOIN bgk b ON a.bg = b.bg AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT inter.a AS a, inter.b AS b
FROM inter JOIN sizes sa ON sa.doc_id = inter.a
           JOIN sizes sb ON sb.doc_id = inter.b
WHERE i * 100 >= 25 * (sa.n + sb.n - i)
ORDER BY a, b
"""


def embeddings_neardup_lsh40(sf_dir: str):
    """LSH near-dup at a threshold the random corpus actually reaches
    (0.4 -> nonzero pairs), so the banded path is exercised end-to-end.
    FULL SQL oracle: the hyperplane matrix is a deterministic constant, so
    oracle_kernels.embedding_lsh_pairs_sql replays the banded pipeline
    (sign-bit margins measured >= 3.5e-5, far above float drift); the
    brute-force query below pins the exact no-recall-assumption set."""
    from ..stages.dedup import embedding_neardup_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = embedding_neardup_pairs(ds, threshold=0.4, num_planes=16, bands=8)
    return out.select(["a", "b"])


def embeddings_neardup_brute(sf_dir: str):
    """Exact all-pairs cosine>=0.4 via blocked matmul against a broadcast
    normalized matrix — full DuckDB oracle (list_cosine_similarity
    self-join). Margin to the threshold is >=1e-4 on this corpus, so
    float32-vs-float64 summation order cannot flip membership."""
    from ..stages.dedup import embedding_brute_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return embedding_brute_pairs(ds, threshold=0.4)


_EMB_NEARDUP_BRUTE_SQL = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
ORDER BY a, b
"""


# ===================================================================
# Similarity search
# ===================================================================

_KNN_QUERIES = 5
_KNN_K = 10


def _load_queries(sf_dir: str) -> tuple[np.ndarray, list[int]]:
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl.column("vec_id").to_pylist()))[: _KNN_QUERIES]
    ids = [int(tbl.column("vec_id")[int(i)].as_py()) for i in order]
    qs = np.asarray([tbl.column("embedding")[int(i)].as_py() for i in order],
                    dtype=np.float64)
    return qs, ids


def embeddings_knn(sf_dir: str):
    """Brute-force cosine top-k for the first 5 vectors as queries."""
    from ..stages.similarity import knn_brute

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qs, ids = _load_queries(sf_dir)
    out = knn_brute(ds, qs, ids, k=_KNN_K)
    return out.select(["query_id", "neighbor_id", "rank"])


_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {_KNN_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_KNN_K}
"""


def embeddings_knn_ivf(sf_dir: str):
    """IVF ANN variant with deterministic hash-selected centroids
    (``hash_centroids``: lowest (mix64(vec_id), vec_id) ranks) — every
    step (centroid pick, argmax assignment, nprobe probe, in-cluster
    top-k) replays relationally, so this is a full value-hash oracle row.
    The k-means centroid path stays available and recall-pinned in tests."""
    from ..stages.similarity import hash_centroids, ivf_knn

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qs, ids = _load_queries(sf_dir)
    cents = hash_centroids(ds, n_clusters=16)
    out = ivf_knn(ds, qs, ids, k=_KNN_K, nprobe=6, centroids=cents)
    return out.select(["query_id", "neighbor_id", "rank"])


def _ivf_knn_sql(n_clusters: int, nprobe: int, k: int = _KNN_K,
                 n_queries: int = _KNN_QUERIES) -> str:
    """SQL replay of the hash-centroid IVF pipeline. Orderings compare raw
    float64 cosines on both sides; the corpus has no cross-centroid or
    cross-neighbor ties within f64 noise (same margin argument the green
    _KNN_SQL oracle already relies on), and only integer rank is output."""
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH ranked_c AS (
  SELECT vec_id AS cid, embedding AS ce,
         row_number() OVER (ORDER BY mix64(CAST(vec_id AS UBIGINT)), vec_id) AS rn
  FROM embeddings),
cents AS MATERIALIZED (
  SELECT cid, ce, rn - 1 AS cidx FROM ranked_c WHERE rn <= {n_clusters}),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT {n_queries}),
assign AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, c.cidx AS cluster
  FROM embeddings e CROSS JOIN cents c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cidx) = 1),
probe AS (
  SELECT q.query_id, c.cidx AS cluster
  FROM q CROSS JOIN cents c
  QUALIFY row_number() OVER (PARTITION BY q.query_id
            ORDER BY list_cosine_similarity(q.qe, c.ce) DESC, c.cidx) <= {nprobe}),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, a.embedding) AS sim
  FROM probe p
  JOIN assign a ON a.cluster = p.cluster
  JOIN q ON q.query_id = p.query_id)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored)
WHERE rank <= {k}
"""


# ===================================================================
# Crawl / scrape / SERP over SQL-replicable synthetic fixtures
# ===================================================================


def crawl_reachable(sf_dir: str):
    """Full crawl of the synthetic graph; output = distinct fetched URL +
    BFS depth. Oracle = recursive CTE over the same graph rule."""
    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="cr", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000)
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized(), ray_wave_threshold=64)
    df = res.order.to_pandas()[["canonical_url", "depth"]]
    out = df.groupby("canonical_url", as_index=False)["depth"].min()
    out = out.rename(columns={"canonical_url": "url"})
    return pa.Table.from_pandas(out, preserve_index=False)


_CRAWL_REACHABLE_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
)
SELECT 'http://site' || CAST(id % {_HOSTS} AS VARCHAR) || '.test/p/' ||
       lpad(CAST(id AS VARCHAR), 6, '0') AS url,
       CAST(MIN(depth) AS INT) AS depth
FROM reach GROUP BY id
"""


def crawl_frontier_shards(sf_dir: str):
    """Frontier partitioning audit over the crawled seen set: seen-set
    shard = ``url_key % 8`` (uniform key sharding) and queue shard =
    ``xxh64(host) % 8`` (host-locality sharding) — the exact routing
    rules the shard actors apply (state/frontier.py:953-961 and the
    insert_seen key sharding). The url_key values come from the REAL
    frontier actors (res.seen), so the oracle's bit-exact SQL XXH64
    replica independently verifies the engine's keys AND the per-shard
    balance the north-rule's host-hash partitioning relies on."""
    from ..functions.urls import host_of, xxh64
    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl

    n_shards = 8
    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="cs", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000)
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized(),
                    ray_wave_threshold=64)
    from ..functions.urls import url_key

    # the full fetched set (seeds bypass the seen-set dedup insert, so
    # res.seen lacks them); keys recomputed via the library rule, then
    # PINNED against the frontier actors' own stored keys on the overlap
    fetched = (res.order.to_pandas()
               .drop_duplicates("canonical_url")[["canonical_url"]])
    fetched["key"] = fetched["canonical_url"].map(
        lambda u: np.uint64(url_key(u)))
    actor_keys = res.seen.to_pandas().drop_duplicates("canonical_url")
    merged = fetched.merge(actor_keys, on="canonical_url", how="inner")
    if not (merged["key"].to_numpy(dtype=np.uint64)
            == merged["url_key"].to_numpy(dtype=np.uint64)).all():
        raise AssertionError("frontier actor url_key diverged from "
                             "functions.urls.url_key")
    keys = fetched["key"].to_numpy(dtype=np.uint64)
    seen_shard = (keys % np.uint64(n_shards)).astype(np.int64)
    hosts = fetched["canonical_url"].map(host_of)
    host_shard = {h: xxh64(h) % n_shards for h in hosts.unique()}
    queue_shard = hosts.map(host_shard).to_numpy(dtype=np.int64)
    return pa.table({
        "shard": pa.array(np.arange(n_shards, dtype=np.int64)),
        "seen_urls": pa.array(
            np.bincount(seen_shard, minlength=n_shards).astype(np.int64)),
        "queue_urls": pa.array(
            np.bincount(queue_shard, minlength=n_shards).astype(np.int64)),
    })


def _crawl_frontier_shards_sql(n_shards: int = 8) -> str:
    return f"""{_oracle_kernels.U64_PRELUDE}{_oracle_kernels.XXH_MACROS}
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
),
urls AS (
  SELECT DISTINCT 'http://site' || CAST(id % {_HOSTS} AS VARCHAR) ||
         '.test/p/' || lpad(CAST(id AS VARCHAR), 6, '0') AS url,
         id % {_HOSTS} AS hid
  FROM reach),
{_oracle_kernels.xxh64_ctes('urls', 'url', 'u')},
hosts AS (
  SELECT DISTINCT 'site' || CAST(hid AS VARCHAR) || '.test' AS host, hid
  FROM urls),
{_oracle_kernels.xxh64_ctes('hosts', 'host', 'h')},
seen AS (SELECT CAST(xh % {n_shards} AS BIGINT) AS shard,
                COUNT(*) AS seen_urls
         FROM udone GROUP BY 1),
queue AS (SELECT CAST(hd.xh % {n_shards} AS BIGINT) AS shard,
                 COUNT(*) AS queue_urls
          FROM udone u JOIN hdone hd ON hd.hid = u.hid GROUP BY 1),
grid AS (SELECT CAST(g.s AS BIGINT) AS shard
         FROM UNNEST(range(0, {n_shards})) AS g(s))
SELECT g.shard, CAST(coalesce(s.seen_urls, 0) AS BIGINT) AS seen_urls,
       CAST(coalesce(q.queue_urls, 0) AS BIGINT) AS queue_urls
FROM grid g
LEFT JOIN seen s USING (shard) LEFT JOIN queue q USING (shard)
ORDER BY g.shard
"""


def crawl_browser_screenshots(sf_dir: str):
    """Crawl through the registry-resolved browser engine
    (``get_engine('browser-sim')``): wait_until/wait_for_selector honored
    per page, screenshot format captured -> one ``screenshot://{md5_8}``
    span per page. Oracle = reachable set x the md5-8 key rule
    (ScreenshotTransformer.ts:104-110)."""
    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="cb", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000, engine="browser-sim",
                   formats=["markdown", "screenshot"],
                   wait_until="domcontentloaded",
                   wait_for_selector=["h1", {"selector": ".nope",
                                             "timeout": 5, "state": "hidden"}])
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized(), ray_wave_threshold=64)
    docs = res.documents.to_pandas()
    refs = []
    for url, spans in zip(docs["url"], docs["spans"]):
        shot = next((s["media_ref"] for s in spans
                     if s["kind"] == "screenshot"), "")
        refs.append((url, shot))
    out = pd.DataFrame(refs, columns=["url", "screenshot_ref"])
    out = out.drop_duplicates("url").sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


_CRAWL_BROWSER_SCREENSHOTS_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
),
urls AS (
  SELECT DISTINCT 'http://site' || CAST(id % {_HOSTS} AS VARCHAR) ||
         '.test/p/' || lpad(CAST(id AS VARCHAR), 6, '0') AS url
  FROM reach
)
SELECT url, 'screenshot://' || substr(md5(url), 1, 8) AS screenshot_ref
FROM urls ORDER BY url
"""


def crawl_lineage(sf_dir: str):
    """Lineage counter totals for the same crawl (counters vs graph size)."""
    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="cl", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000)
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized(), ray_wave_threshold=64)
    lin = res.lineage.to_pandas()
    return pa.table(
        {
            "done": pa.array([int(lin["done"].sum())], pa.int64()),
            "succeeded": pa.array([int(lin["succeeded"].sum())], pa.int64()),
            "failed": pa.array([int(lin["failed"].sum())], pa.int64()),
        }
    )


_CRAWL_LINEAGE_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
)
-- done = distinct reachable pages + 1 (the seed is re-admitted once when
-- rediscovered, EngineQueue.ts:122-127 bypass) iff some page links to it
SELECT (SELECT COUNT(DISTINCT id) FROM reach)
       + (SELECT CASE WHEN EXISTS (SELECT 1 FROM edges WHERE dst = 0) THEN 1 ELSE 0 END)
       AS done,
       (SELECT COUNT(DISTINCT id) FROM reach)
       + (SELECT CASE WHEN EXISTS (SELECT 1 FROM edges WHERE dst = 0) THEN 1 ELSE 0 END)
       AS succeeded,
       0 AS failed
"""


def scrape_titles(sf_dir: str):
    """Batched scrape of every synthetic page; titles are SQL-derivable."""
    from ..pipelines.scrape import run_scrape_many
    from ..sources.synthetic_site import build_site_table

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    urls = pages.column("url").to_pylist()
    import ray

    docs = run_scrape_many(urls, pages, formats=["markdown"],
                           use_ray=ray.is_initialized())
    titles = []
    for spans in docs.column("spans").to_pylist():
        titles.append(next((s["text"] for s in spans if s["kind"] == "title"), ""))
    return pa.table({"url": docs.column("url"),
                     "title": pa.array(titles, pa.string()),
                     "status": docs.column("status")})


_SCRAPE_TITLES_SQL = f"""
SELECT 'http://site' || CAST(doc_id % {_HOSTS} AS VARCHAR) || '.test/p/' ||
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'completed' AS status
FROM documents
"""


def _serp_query(engine: str, limit: int = 100):
    def run(sf_dir: str):
        from ..pipelines.search import run_search
        from ..sources.serp_fixtures import build_serp_pages

        pages = build_serp_pages(f"{sf_dir}/documents.parquet", engine, limit=limit)
        import ray

        return run_search(pages, limit=limit, use_ray=ray.is_initialized())

    return run


_SERP_COMMON = """
WITH d AS (
  SELECT doc_id, n_chars FROM documents ORDER BY doc_id LIMIT {limit}
)
SELECT '{engine}' AS engine, 'q' AS query,
       {page_expr} AS page,
       {pos_expr} AS position,
       {category_expr} AS category,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' result' AS title,
       'http://result.test/d/' || CAST(doc_id AS VARCHAR) AS url,
       'about doc ' || CAST(doc_id AS VARCHAR) || ' (' || CAST(n_chars AS VARCHAR)
           || ' chars)' AS description,
       {source_expr} AS source
FROM d
"""


def _serp_sql(engine: str, limit: int = 100) -> str:
    if engine == "google":
        return _SERP_COMMON.format(
            limit=limit, engine=engine,
            page_expr="CAST(doc_id // 10 + 1 AS INT)",
            pos_expr="CAST(doc_id % 10 AS INT)",
            category_expr="'web'",
            source_expr="'Google Search Result'",
        )
    if engine == "searxng":
        return _SERP_COMMON.format(
            limit=limit, engine=engine,
            page_expr="CAST(doc_id // 10 + 1 AS INT)",
            pos_expr="CAST(doc_id % 10 AS INT)",
            category_expr="CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'images' ELSE 'news' END",
            source_expr="'SearXNG (fixture)'",
        )
    return _SERP_COMMON.format(
        limit=limit, engine=engine,
        page_expr="1",
        pos_expr="CAST(doc_id AS INT)",
        category_expr="CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'images' ELSE 'news' END",
        source_expr="'AC-Engine'",
    )


def crawl_span_stats(sf_dir: str):
    """Span-level structural check with a relational oracle: per crawled
    page, the title span text, metadata-span count and media-span count
    must match what the SQL-replicable page generator emitted."""
    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="ss", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000, formats=["markdown"])
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized(), ray_wave_threshold=64)
    docs = res.documents
    urls, titles, n_meta, n_media = [], [], [], []
    seen_urls = set()
    for url, spans in zip(docs.column("url").to_pylist(),
                          docs.column("spans").to_pylist()):
        if url in seen_urls:  # seed re-admission duplicate
            continue
        seen_urls.add(url)
        urls.append(url)
        titles.append(next((s["text"] for s in spans if s["kind"] == "title"), ""))
        n_meta.append(sum(1 for s in spans if s["kind"] == "metadata"))
        n_media.append(sum(1 for s in spans if s["kind"] == "media"))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "title": pa.array(titles, pa.string()),
        "n_metadata": pa.array(n_meta, pa.int64()),
        "n_media": pa.array(n_media, pa.int64()),
    })


_CRAWL_SPAN_STATS_SQL = f"""
SELECT 'http://site' || CAST(doc_id % {_HOSTS} AS VARCHAR) || '.test/p/' ||
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       2 AS n_metadata,
       CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END AS n_media
FROM documents
"""


def training_pipeline(sf_dir: str):
    """Flagship composition — FULL SQL oracle (oracle_kernels.py
    training_pipeline_sql: unrolled-BFS admission order + markdown template
    reconstruction + quality/lang/dedup/minhash replay): crawl the
    synthetic site, flatten
    markdown spans to document text, score quality, drop low-quality docs,
    language-ID (actor pool), exact-dedup by text, then minhash near-dup
    removal (later pair member dropped) — the end-to-end training-data
    curation chain over crawl output."""
    import ray
    import ray.data as rd

    from ..sources.synthetic_site import build_site_table, page_url
    from ..stages.dedup import exact_dedup
    from ..stages.text_analysis import text_stats_batch
    from .crawl import CrawlJob, run_crawl

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="tp", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000, formats=["markdown"])
    res = run_crawl(job, pages, use_ray=ray.is_initialized(), ray_wave_threshold=64)

    def spans_to_text(batch: pa.Table) -> pa.Table:
        texts = []
        for spans in batch.column("spans").to_pylist():
            texts.append(
                "\n\n".join(s["text"] for s in spans if s["kind"] == "markdown")
            )
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    ds = rd.from_arrow(
        res.documents,
        override_num_blocks=max(8, min(64, res.documents.num_rows // 256)),
    ).map_batches(spans_to_text, batch_format="pyarrow").map_batches(
        text_stats_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: b.filter(pc.greater(b.column("quality"), 0.3)),
        batch_format="pyarrow",
    )
    # language ID (actor pool) rides along for the curation record
    from ..stages.text_analysis import LangId

    ds = ds.map_batches(LangId, batch_format="pyarrow", concurrency=_conc(),
                        num_cpus=0.5, max_restarts=0)
    deduped_ds = exact_dedup(ds)

    # near-dup removal: minhash pairs over the exact-dedup survivors; the
    # LATER member of each verified pair is dropped (first-sight-wins,
    # consistent with the frontier's dedup semantics). doc ids map to the
    # integer crawl seq for the pair machinery.
    from ..stages.dedup import minhash_lsh_pairs

    def with_num(b: pa.Table) -> pa.Table:
        nums = [int(d.rsplit("_", 1)[1]) for d in b.column("doc_id").to_pylist()]
        return b.append_column("doc_num", pa.array(nums, pa.int64()))

    numbered = deduped_ds.map_batches(with_num, batch_format="pyarrow"
                                      ).materialize()
    pair_input = numbered.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_num"),
                            "text": b.column("text")}),
        batch_format="pyarrow")
    pairs = minhash_lsh_pairs(pair_input, threshold=0.5)
    drop = set(pairs.column("b").to_pylist())
    import ray as _ray

    drop_ref = _ray.put(pa.array(sorted(drop), pa.int64()))

    def drop_neardups(b: pa.Table) -> pa.Table:
        from ..stages.dedup import _cached_get

        mask = pc.is_in(b.column("doc_num"), value_set=_cached_get(drop_ref))
        return b.filter(pc.invert(mask))

    kept = numbered.map_batches(drop_neardups, batch_format="pyarrow")
    out = kept.to_pandas()[["doc_id", "lang_guess", "n_tokens", "quality",
                            "n_copies"]].sort_values("doc_id")
    table = pa.Table.from_pandas(out, preserve_index=False)
    return _scaled(table, {"quality": 1_000_000})


# ===================================================================
# Keyed window operators: as-of join / running total / exact quantiles
# ===================================================================


def events_asof_join(sf_dir: str):
    """As-of join WITHIN the events stream: every purchase gets the ts of
    the latest click at-or-before it by the same user (classic trade/quote
    as-of). One shuffle co-locates both sides per user; per-group kernel is
    vectorized searchsorted (stages/window.py). Oracle: DuckDB ASOF JOIN."""
    from ..stages.window import asof_join, tag_sides

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    # single-scan tagging: purchases = left, clicks = right, rest dropped
    tagged = tag_sides(ev, _purchase_click_sides, key="user_id",
                       keep_cols=["event_id", "user_id", "ts"])
    out = asof_join(None, None, key="user_id", ts_col="ts",
                    out_cols=["event_id", "user_id", "ts"],
                    prior_col="prior_click_ts", tagged_ds=tagged)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _purchase_click_sides(batch: pa.Table) -> np.ndarray:
    t = batch.column("event_type").to_numpy(zero_copy_only=False)
    return np.where(t == "purchase", 0, np.where(t == "click", 1, -1))


_EVENTS_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts, r.ts AS prior_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND r.ts <= l.ts
"""


def events_running_total(sf_dir: str):
    """Per-user ordered cumulative purchase value — the SUM() OVER
    (PARTITION BY ... ORDER BY ...) window class. Fixed-point cents keep
    the cumulative exact; one shuffle, vectorized lexsort+cumsum per
    group. Routed through the AUTO hot-key path: keys above the row-count
    threshold are detected from a slim distributed count and take the
    salted (user, day) shuffle; everything else the plain keyed plan —
    same window-function oracle either way."""
    from ..stages.window import running_total_auto

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type",
                                  "value"])

    ds = ev.filter(expr="event_type == 'purchase'").map_batches(
        _prep_purchase_days, batch_format="pyarrow")
    out = running_total_auto(ds, key="user_id",
                             order_cols=["ts", "event_id"],
                             cents_col="cents", chunk_col="day",
                             out_cols=["event_id", "user_id", "ts"],
                             hot_threshold=10_000)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def _prep_purchase_days(b: pa.Table) -> pa.Table:
    """Shared by events_running_total and events_running_total_salted:
    exact fixed-point cents + the coarse day chunk column (derived in the
    timestamp column's native tick unit)."""
    b = _add_cents(b)
    ts = b.column("ts")
    per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
    day = pc.divide(pc.cast(ts, pa.int64()),
                    pa.scalar(86_400 * per_sec, pa.int64()))
    return b.append_column("day", day)


def _add_cents(b: pa.Table) -> pa.Table:
    vals = b.column("value")
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    cents = np.rint(np.asarray(vals, dtype=np.float64) * 100).astype(np.int64)
    return b.append_column("cents", pa.array(cents, pa.int64()))


_EVENTS_RUNNING_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events WHERE event_type = 'purchase'
"""


def events_range_join(sf_dir: str):
    """Keyed RANGE join (band join): for each purchase, the number of
    clicks by the same user strictly within the following hour. Same
    one-shuffle co-partitioning as the as-of join; two binary searches per
    group (stages/window.py). Oracle: plain non-equi LEFT JOIN + count."""
    from ..stages.window import range_join_count, tag_sides

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    tagged = tag_sides(ev, _purchase_click_sides, key="user_id",
                       keep_cols=["event_id", "user_id", "ts"])
    out = range_join_count(None, None, key="user_id", ts_col="ts",
                           out_cols=["event_id", "user_id"],
                           low=np.timedelta64(0, "ms"),
                           high=np.timedelta64(3_600_000, "ms"),
                           count_col="clicks_next_hour", tagged_ds=tagged)
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_EVENTS_RANGE_JOIN_SQL = """
SELECT l.event_id, l.user_id, CAST(COUNT(r.ts) AS BIGINT) AS clicks_next_hour
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON r.user_id = l.user_id AND r.ts > l.ts
 AND r.ts <= l.ts + INTERVAL 1 HOUR
GROUP BY l.event_id, l.user_id
"""


_KEYWORD_TERMS = ["the", "and", "of", "with", "data"]
_KEYWORD_K = 10


def docs_keyword_topk(sf_dir: str):
    """IR keyword-relevance top-k (tf-idf shape) with an integer-quantized
    IDF — score = sum tf * (N // df), all int64, so the ranking replays
    exactly in SQL (float-log idf would drift between libm
    implementations). One corpus pass builds the term-restricted inverted
    index; df is aggregated from it; top-k = local top-k + tiny merge."""
    from ..stages.text_analysis import keyword_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return keyword_topk(ds, _KEYWORD_TERMS, k=_KEYWORD_K)


def _keyword_topk_sql(terms: list[str] = _KEYWORD_TERMS,
                      k: int = _KEYWORD_K) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH n AS (SELECT COUNT(*) AS c FROM documents),
toks AS (
  SELECT doc_id, UNNEST(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> '')) AS tok
  FROM documents),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({tlist}) GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
w AS (SELECT tok, n.c // df AS w FROM df, n),
sc AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf * w.w) AS BIGINT) AS score
  FROM tf JOIN w USING (tok) GROUP BY tf.doc_id)
SELECT doc_id, score FROM sc
ORDER BY score DESC, doc_id LIMIT {k}
"""


def docs_dedup_incremental(sf_dir: str):
    """Incremental (delta) dedup: docs with even ids play yesterday's
    snapshot, odd ids today's increment; today's docs whose content
    already exists in the snapshot drop via a distributed LEFT ANTI hash
    join on worker-computed content hashes (stages/dedup.py::
    dedup_incremental — no broadcast of the prior corpus)."""
    from ..stages.dedup import dedup_incremental

    rd = _rd()
    # materialize once: both join inputs branch off this read (the lazy
    # lineage would otherwise scan the parquet twice, once per side)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()

    def parity(par: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"), dtype=np.int64)
            return b.filter(pa.array(ids % 2 == par))
        return fn

    prior = docs.map_batches(parity(0), batch_format="pyarrow")
    new = docs.map_batches(parity(1), batch_format="pyarrow")
    out = dedup_incremental(new, prior)
    res = out.to_pandas().sort_values("doc_id")
    return pa.table({"doc_id": pa.array(res["doc_id"], pa.int64())})


_DEDUP_INCREMENTAL_SQL = """
SELECT n.doc_id FROM documents n
WHERE n.doc_id % 2 = 1
  AND NOT EXISTS (SELECT 1 FROM documents p
                  WHERE p.doc_id % 2 = 0 AND p.text = n.text)
ORDER BY n.doc_id
"""


def docs_pagerank(sf_dir: str):
    """Iterative distributed algorithm class: 10 PageRank iterations over
    the synthetic site graph in EXACT integer fixed-point arithmetic
    (rank = int64 scaled 1e12; per-edge contribution = floor division;
    damping = one integer expression), so the whole iteration chain is
    value-hash oracle-checked — no float summation-order escape hatch.
    One map_batches + one groupby-Sum shuffle per iteration."""
    from ..stages.graph import pagerank_int

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return pagerank_int(n, iters=_PAGERANK_ITERS, scale=_PAGERANK_SCALE)


_PAGERANK_ITERS = 10
_PAGERANK_SCALE = 10 ** 12


def _pagerank_sql(iters: int = _PAGERANK_ITERS,
                  scale: int = _PAGERANK_SCALE) -> str:
    """Unrolled-CTE replay of pagerank_int: same edges arms as the crawl
    oracle, same integer update r' = (15*s0 + 85*sum(r//deg)) // 100."""
    parts = [f"""
WITH n AS (SELECT COUNT(*) AS c FROM documents),
edges AS MATERIALIZED (
{_EDGES_CTE_BODY}),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS node, CAST({scale} // n.c AS BIGINT) AS r
       FROM documents, n)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
s{k} AS (
  SELECT e.dst AS node, SUM(r.r // d.deg) AS s
  FROM edges e JOIN r{k - 1} r ON r.node = e.src
  JOIN deg d ON d.src = e.src GROUP BY e.dst),
r{k} AS MATERIALIZED (
  SELECT p.node,
         CAST((15 * ({scale} // n.c) + 85 * coalesce(s.s, 0)) // 100
              AS BIGINT) AS r
  FROM r0 p CROSS JOIN n LEFT JOIN s{k} s ON s.node = p.node)""")
    parts.append(f"""
SELECT node AS doc_id, r AS rank_scaled FROM r{iters} ORDER BY doc_id
""")
    return "".join(parts)


def docs_winnow_pairs(sf_dir: str):
    """Winnowing fingerprint near-dup pairs (Schleimer et al., SIGMOD'03
    — the MOSS kernel): local rightmost-minimum gram sampling instead of
    MinHash's global permutations; pairs sharing >= 2 fingerprints, exact
    SQL replay (Horner grams + window argmin + stop-gram cap)."""
    from ..stages.dedup import winnow_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return winnow_pairs(ds, k=3, w=4, min_shared=2)


def events_running_total_salted(sf_dir: str):
    """The SAME per-user running total computed through the hot-key
    salting path: shuffle on (user, day-of-ts) so one user's history can
    spread across workers, then carry-in offsets stitch the chunks —
    checked against the identical window-function oracle as the unsalted
    operator (both must equal SUM() OVER (...))."""
    from ..stages.window import running_total_salted

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type",
                                  "value"])

    ds = ev.filter(expr="event_type == 'purchase'").map_batches(
        _prep_purchase_days, batch_format="pyarrow")
    out = running_total_salted(ds, key="user_id",
                               order_cols=["ts", "event_id"],
                               cents_col="cents", chunk_col="day",
                               out_cols=["event_id", "user_id", "ts"])
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def events_funnel(sf_dir: str):
    """Funnel analysis (sequential per-key pattern matching): users who
    signed up, then clicked within 7 days of the signup, then purchased
    within 7 days of that click — n reaching each stage. Per-bucket kernel
    walks each user's (stage, ts)-sorted events once (stages/window.py)."""
    from ..stages.window import funnel

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    return funnel(ev, key="user_id", ts_col="ts", type_col="event_type",
                  stages=["signup", "click", "purchase"],
                  within=np.timedelta64(7, "D"))


_EVENTS_FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s1 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s0 ON s0.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t
    AND e.ts <= s0.t + INTERVAL 7 DAY
  GROUP BY e.user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t
    AND e.ts <= s1.t + INTERVAL 7 DAY
  GROUP BY e.user_id)
SELECT CAST(0 AS INT) AS stage_idx, 'signup' AS stage,
       CAST((SELECT COUNT(*) FROM s0) AS BIGINT) AS n_keys
UNION ALL
SELECT CAST(1 AS INT), 'click', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
UNION ALL
SELECT CAST(2 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
"""


def events_quantiles(sf_dir: str):
    """EXACT per-type value quantiles (p50/p95) without a global sort:
    fixed-point histogram partials + tiny merge (histogram cardinality is
    value-range-bounded, not row-count-bounded) + percentile_disc read-off.
    """
    from ..stages.window import group_quantiles

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return group_quantiles(ev, key="event_type", value_col="value",
                           ps=[0.5, 0.95])


_EVENTS_QUANTILES_SQL = """
SELECT event_type, COUNT(*) AS n,
       quantile_disc(CAST(round_even(value * 100, 0) AS BIGINT), 0.5) AS q50_cents,
       quantile_disc(CAST(round_even(value * 100, 0) AS BIGINT), 0.95) AS q95_cents
FROM events GROUP BY event_type
"""


def media_features(sf_dir: str):
    """Multimodal plumbing: binary payload table -> actor-pool feature
    extraction (stub codec, FNV/mix64-seeded so the whole stage replays in
    SQL — full value-hash oracle). Output: payload_hash + the 8 feature
    components as round_even-scaled BIGINTs."""
    from ..stages.media import extract_media_features, media_table_from_documents

    rd = _rd()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = media_table_from_documents(docs)
    conc = _conc()
    # from_arrow yields ONE block; split it so every actor in the pool gets
    # fed (Ray warns and runs at concurrency 1 otherwise)
    ds = rd.from_arrow(media, override_num_blocks=max(conc * 2, 4))
    out = extract_media_features(ds, concurrency=conc, batch_size=64)

    def flatten(batch: pa.Table) -> pa.Table:
        feat = batch.column("feature")
        if isinstance(feat, pa.ChunkedArray):
            feat = feat.combine_chunks()
        f32 = np.asarray(feat.values, dtype=np.float32).reshape(len(batch), -1)
        scaled = np.rint(f32.astype(np.float64) * 1_000_000).astype(np.int64)
        cols = {"media_id": batch.column("media_id"),
                "payload_hash": batch.column("payload_hash")}
        for j in range(scaled.shape[1]):
            cols[f"f{j}"] = pa.array(scaled[:, j], pa.int64())
        return pa.table(cols)

    table = pa.concat_tables(
        out.map_batches(flatten, batch_format="pyarrow")
        .iter_batches(batch_size=8192, batch_format="pyarrow"))
    return table


def embeddings_knn_ivf_index(sf_dir: str):
    """Persistent IVF index path: build (hash-selected centroids +
    cluster-partitioned parquet under /tmp) then search with REAL
    partition pruning — only the probed cluster directories are read.
    Same relational semantics as embeddings_knn_ivf (different mechanism,
    shared oracle shape) — full value-hash oracle row."""
    import hashlib
    import shutil

    from ..stages.similarity import IVFIndex, hash_centroids

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    queries, q_ids = _load_queries(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = f"/tmp/ivf_index_{tag}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cents = hash_centroids(ds, n_clusters=8)
    index = IVFIndex.build(ds, idx_dir, n_clusters=8, centroids=cents)
    out = index.search(queries, q_ids, k=10, nprobe=3)
    shutil.rmtree(idx_dir, ignore_errors=True)
    return out.select(["query_id", "neighbor_id", "rank"])


def media_resize(sf_dir: str):
    """Multimodal resize stage (actor pool, stub codec): binary payloads ->
    4x4 resampled payloads, fingerprinted (FNV over the 16 output bytes)
    so the NEAREST resample kernel is value-hash oracle-checked."""
    from ..stages.media import (fnv1a_bytes_bulk, media_table_from_documents,
                                resize_images)

    rd = _rd()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = media_table_from_documents(docs)
    conc = _conc()
    ds = rd.from_arrow(media, override_num_blocks=max(conc * 2, 4))
    out = resize_images(ds, target_w=4, target_h=4, concurrency=conc)

    def fingerprint(batch: pa.Table) -> pa.Table:
        fps = fnv1a_bytes_bulk([p or b"" for p in
                                batch.column("payload").to_pylist()])
        return pa.table({
            "media_id": batch.column("media_id"),
            "width": batch.column("width"),
            "height": batch.column("height"),
            "resize_fp": pa.array(fps, pa.uint64()),
        })

    table = pa.concat_tables(
        out.map_batches(fingerprint, batch_format="pyarrow")
        .iter_batches(batch_size=8192, batch_format="pyarrow"))
    return table


def media_frames(sf_dir: str):
    """Multimodal frame sampling (flat-map row explosion in an actor
    pool): durations derived from doc_id so rows explode non-trivially;
    each sampled frame fingerprinted (FNV over its 64 grid bytes) — full
    value-hash oracle via the SQL stub-codec replay."""
    from ..stages.media import (fnv1a_bytes_bulk, media_table_from_documents,
                                sample_frames)

    rd = _rd()
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = media_table_from_documents(docs)
    # deterministic per-row durations keyed by doc_id (SQL-derivable)
    doc_ids = docs.column("doc_id").to_pylist()
    dur = pa.array([(int(d) % 5) * 1000 for d in doc_ids], pa.int32())
    media = media.set_column(media.schema.get_field_index("duration_ms"),
                             "duration_ms", dur)
    conc = _conc()
    ds = rd.from_arrow(media, override_num_blocks=max(conc * 2, 4))
    out = sample_frames(ds, every_ms=1000, concurrency=conc)

    def fingerprint(batch: pa.Table) -> pa.Table:
        fps = fnv1a_bytes_bulk([p or b"" for p in
                                batch.column("frame_payload").to_pylist()])
        return pa.table({
            "media_id": batch.column("media_id"),
            "frame_idx": batch.column("frame_idx"),
            "ts_ms": batch.column("ts_ms"),
            "frame_fp": pa.array(fps, pa.uint64()),
        })

    table = pa.concat_tables(
        out.map_batches(fingerprint, batch_format="pyarrow")
        .iter_batches(batch_size=8192, batch_format="pyarrow"))
    return table


# ===================================================================
# Registry
# ===================================================================

def events_retention_cohorts(sf_dir: str):
    """Cohort retention triangle: cohort = first active week per user,
    count users per (cohort_week, week_offset). One user-bucketed shuffle
    (stages/window.py retention_cohorts); exact SQL oracle."""
    from ..stages.window import retention_cohorts

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return retention_cohorts(ev)


_RETENTION_SQL = """
WITH w AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 604800000000 AS week FROM events),
fw AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id)
SELECT fw.cohort_week AS cohort_week,
       w.week - fw.cohort_week AS week_offset,
       COUNT(*) AS n_users
FROM w JOIN fw USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def docs_repetition_scores(sf_dir: str):
    """Gopher-style within-doc repeated-trigram fraction (integer
    fixed-point), pure map-side — the quality-filter signal dedup can't
    see (a doc that repeats ITSELF). Exact SQL oracle."""
    from ..stages.text_analysis import repetition_scores_batch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(repetition_scores_batch, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_REPETITION_SQL = r"""
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '') AS w
     FROM documents),
g AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)),
c AS (SELECT doc_id, COUNT(*) AS n, COUNT(DISTINCT g) AS nd
      FROM g GROUP BY doc_id)
SELECT doc_id, (n - nd) * 1000000 // n AS rep_scaled
FROM c ORDER BY doc_id
"""


def events_distinct_kmv(sf_dir: str):
    """KMV (bottom-k) distinct-user sketch: map-side per-block bottom-256
    mix64 hashes, one tiny driver merge, integer estimator — no shuffle.
    Exact SQL oracle via the shared u64 macro kernel (mix64 is a
    bijection, so both engines see identical hash order)."""
    from ..stages.sketches import kmv_distinct

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return kmv_distinct(ev, "user_id", k=256)


def _kmv_sql(k: int = 256) -> str:
    from . import oracle_kernels as _ok

    return f"""{_ok.U64_PRELUDE}
WITH u AS (SELECT DISTINCT user_id FROM events),
h AS (SELECT mix64(CAST(user_id AS UBIGINT)) AS h FROM u),
bk AS (SELECT h FROM h ORDER BY h LIMIT {k})
SELECT CASE WHEN (SELECT COUNT(*) FROM bk) < {k}
            THEN (SELECT COUNT(*) FROM bk)
            ELSE CAST(({k} - 1) * 18446744073709551616::HUGEINT
                      // CAST((SELECT MAX(h) FROM bk) AS HUGEINT) AS BIGINT)
       END AS est_distinct
"""


def events_hll(sf_dir: str):
    """HyperLogLog distinct-user sketch (p=8, 256 registers) in exact
    integer arithmetic — per-block register maxima, one <=256-key
    groupby-Max, denominators-cleared rational-alpha estimator. The
    register state AND the raw estimate are both pinned by the oracle
    (same mix64 kernel; rho replayed via length(bin(w)))."""
    from ..stages.sketches import hll_distinct

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return hll_distinct(ev, "user_id", p=8)


def _hll_sql(p: int = 8) -> str:
    from . import oracle_kernels as _ok

    m = 1 << p
    q = 64 - p
    mask = (1 << q) - 1
    return f"""{_ok.U64_PRELUDE}
WITH h AS (SELECT mix64(CAST(user_id AS UBIGINT)) AS h FROM events),
r AS (SELECT CAST(h >> {q} AS BIGINT) AS reg0, h & {mask}::UBIGINT AS w
      FROM h),
rr AS (SELECT reg0, CASE WHEN w > 0 THEN {q} - (length(bin(w)) - 1)
                         ELSE {q} + 1 END AS rho FROM r),
regs AS (SELECT reg0, MAX(rho) AS rho FROM rr GROUP BY reg0),
s AS (SELECT COUNT(*) AS filled,
             ({m} - COUNT(*)) * (1::HUGEINT << {q + 1})
             + SUM(1::HUGEINT << ({q + 1} - rho)) AS s_val
      FROM regs)
SELECT {m}::BIGINT AS m, CAST(filled AS BIGINT) AS filled,
       CAST(7213::HUGEINT * {m ** 3} * (1::HUGEINT << {q + 1})
            // (10::HUGEINT * {1000 * m + 1079} * s_val) AS BIGINT)
       AS est_raw
FROM s
"""


def docs_bm25_topk(sf_dir: str):
    """Full BM25 ranking (k1=1.2, b=0.75) in exact integer arithmetic —
    denominators cleared instead of float-evaluated, so the HUGEINT
    DuckDB oracle matches bit-for-bit at every corpus size."""
    from ..stages.text_analysis import bm25_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bm25_topk(ds, _KEYWORD_TERMS, k=_KEYWORD_K)


def _bm25_topk_sql(terms: list[str] | None = None, k: int = _KEYWORD_K,
                   scale: int = 1_000_000) -> str:
    tlist = ", ".join(f"'{t}'" for t in (terms or _KEYWORD_TERMS))
    return f"""
WITH lists AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS t
  FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM lists),
g AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl),
toks AS (SELECT doc_id, UNNEST(t) AS tok FROM lists),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       WHERE tok IN ({tlist}) GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
sc AS (
  SELECT tf.doc_id,
         CAST(SUM( (g.n // df.df)
                   * (22::HUGEINT * tf.tf * g.tl * {scale})
                   // (10::HUGEINT * g.tl * tf.tf + 3::HUGEINT * g.tl
                       + 9::HUGEINT * dl.dl * g.n) ) AS BIGINT) AS score
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), g
  GROUP BY tf.doc_id)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT {k}
"""


def docs_redact_pii(sf_dir: str):
    """Email redaction with per-doc counts — RE2-safe pattern, exact
    regexp_replace oracle."""
    from ..stages.text_analysis import redact_pii_batch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(redact_pii_batch, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_REDACT_SQL = r"""
SELECT doc_id,
       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '[EMAIL]', 'g') AS clean_text,
       len(regexp_extract_all(
           text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           AS n_redactions
FROM documents ORDER BY doc_id
"""


def docs_chunk_overlap(sf_dir: str):
    """Overlapping 64-token chunks every 48 tokens (RAG prep explode) —
    list-slicing SQL oracle on the pinned tokenizer."""
    from ..stages.text_analysis import chunk_overlap_batch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(chunk_overlap_batch, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


_CHUNK_OVERLAP_SQL = r"""
WITH toks AS (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '') AS t
      FROM documents)
SELECT doc_id,
       s // 48 AS chunk_idx,
       len(t[s + 1 : s + 64]) AS n_tokens,
       array_to_string(t[s + 1 : s + 64], ' ') AS chunk_text
FROM toks, UNNEST(range(0, greatest(len(t), 1), 48)) AS u(s)
WHERE len(t) > 0
ORDER BY doc_id, chunk_idx
"""


def events_interarrival(sf_dir: str):
    """Per-user inter-event gap stats (count/sum/max of consecutive
    deltas) — the LAG() window class, one fat-bucket shuffle + reduceat
    kernel (stages/window.py::interarrival_stats). Exact SQL oracle."""
    from ..stages.window import interarrival_stats

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return interarrival_stats(ev, key="user_id", ts_col="ts")


_INTERARRIVAL_SQL = """
WITH o AS (SELECT user_id, epoch_us(ts) AS t FROM events),
d AS (SELECT user_id,
             t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
      FROM o)
SELECT user_id, COUNT(gap) AS n_gaps,
       CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
       MAX(gap) AS max_gap_us
FROM d WHERE gap IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def docs_substring_dedup(sf_dir: str):
    """Exact duplicated-substring (k=8 token span) coverage per doc —
    Lee et al. 2022's span-level dedup signal, two fat-bucket shuffles,
    no suffix array, nothing corpus-sized on the driver
    (stages/dedup.py::substring_dup_coverage). Exact SQL oracle via
    string-gram self-join + DISTINCT covered positions."""
    from ..stages.dedup import substring_dup_coverage

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return substring_dup_coverage(ds, k=8)


_SUBSTRING_DEDUP_SQL = r"""
WITH toks AS (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '') AS t
      FROM documents),
l AS (SELECT doc_id, len(t) AS n_tokens FROM toks WHERE len(t) > 0),
g AS (SELECT doc_id, i AS pos, array_to_string(t[i + 1 : i + 8], ' ') AS gram
      FROM toks, UNNEST(range(0, greatest(len(t) - 7, 0))) AS u(i)),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
occ AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
cov AS (SELECT doc_id, COUNT(DISTINCT j) AS dup_tokens
        FROM occ, UNNEST(range(pos, pos + 8)) AS v(j) GROUP BY doc_id)
SELECT l.doc_id AS doc_id, l.n_tokens AS n_tokens,
       COALESCE(cov.dup_tokens, 0) AS dup_tokens,
       COALESCE(cov.dup_tokens, 0) * 1000000 // l.n_tokens AS frac_ppm
FROM l LEFT JOIN cov USING (doc_id) ORDER BY doc_id
"""


_BPE_MERGES = 3


def docs_bpe_merge_train(sf_dir: str):
    """BPE merge training (Sennrich et al. 2016): 3 rounds of corpus-wide
    top-adjacent-pair selection + greedy non-overlapping rewrite over the
    token-hash symbol stream (stages/text_analysis.py::bpe_merges). The
    oracle unrolls each round as CTEs: pair counts with (c DESC, p1, p2)
    argmax, then the greedy rewrite via the run-parity closed form
    ((i - run_start) % 2 = 0 over consecutive match positions)."""
    from ..stages.text_analysis import bpe_merges

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bpe_merges(ds, n_merges=_BPE_MERGES)


def docs_bpe_token_counts(sf_dir: str):
    """BPE compression view: apply the 3 learned merges to the corpus
    itself and report per-doc token counts before/after
    (stages/text_analysis.py::bpe_token_counts — shared training loop
    with docs_bpe_merge_train). Oracle = the same unrolled CTE chain,
    reading lengths off seq0 / seq3."""
    from ..stages.text_analysis import bpe_token_counts

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bpe_token_counts(ds, n_merges=_BPE_MERGES)


def _bpe_counts_sql(n_merges: int = _BPE_MERGES) -> str:
    from . import oracle_kernels as _ok

    chain = _bpe_round_ctes(n_merges)
    return f"""{_ok.U64_PRELUDE}
WITH {_ok._token_hash_ctes()},
{chain}
SELECT d.doc_id,
       CAST(COALESCE(len(s0.hs), 0) AS BIGINT) AS n_before,
       CAST(COALESCE(len(sk.hs), 0) AS BIGINT) AS n_after
FROM documents d
LEFT JOIN seq0 s0 USING (doc_id)
LEFT JOIN seq{n_merges} sk USING (doc_id)
ORDER BY d.doc_id
"""


def _bpe_train_sql(n_merges: int = _BPE_MERGES) -> str:
    from . import oracle_kernels as _ok

    chain = _bpe_round_ctes(n_merges)
    sel = "\nUNION ALL ".join(
        f"SELECT {r} AS round, p1, p2, m AS merged, "
        f"CAST(c AS BIGINT) AS cnt FROM best{r} WHERE c > 0"
        for r in range(1, n_merges + 1))
    return f"""{_ok.U64_PRELUDE}
WITH {_ok._token_hash_ctes()},
{chain}
SELECT * FROM ({sel}) ORDER BY round
"""


def _bpe_round_ctes(n_merges: int = _BPE_MERGES) -> str:
    prime = "1099511628211"
    ctes = [f"""seq0 AS MATERIALIZED (
  SELECT doc_id, list(h ORDER BY pos) AS hs FROM hm GROUP BY doc_id)"""]
    for r in range(1, n_merges + 1):
        prev = f"seq{r - 1}"
        ctes.append(f"""pc{r} AS (
  SELECT hs[i] AS p1, hs[i+1] AS p2, COUNT(*) AS c
  FROM {prev}, UNNEST(range(1, len(hs))) AS t(i)
  GROUP BY 1, 2),
top{r} AS (
  SELECT p1, p2, c FROM pc{r} ORDER BY c DESC, p1, p2 LIMIT 1),
best{r} AS MATERIALIZED (
  -- always exactly ONE row: when no adjacent pair exists anywhere the
  -- (0, 0, c=0) sentinel makes the round's rewrite a no-op, matching
  -- the implementation's loop break (a real pair always has c >= 1, and
  -- mt{r} can only match the sentinel if symbol hash 0 occurs adjacent
  -- to itself — not reachable for mix64 token hashes)
  SELECT COALESCE(MAX(p1), 0::UBIGINT) AS p1,
         COALESCE(MAX(p2), 0::UBIGINT) AS p2,
         COALESCE(MAX(c), 0) AS c,
         u64add(u64mul(COALESCE(MAX(p1), 0::UBIGINT), {prime}::UBIGINT),
                COALESCE(MAX(p2), 0::UBIGINT)) AS m
  FROM top{r}),
mt{r} AS (
  SELECT s.doc_id, i
  FROM {prev} s, best{r} b, UNNEST(range(1, len(s.hs))) AS t(i)
  WHERE s.hs[i] = b.p1 AND s.hs[i+1] = b.p2),
kp{r} AS MATERIALIZED (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           MIN(i) OVER (PARTITION BY doc_id, i - rn) AS run_start
    FROM (SELECT doc_id, i,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY i) AS rn
          FROM mt{r}))
  WHERE (i - run_start) % 2 = 0),
exp{r} AS (
  SELECT s.doc_id, u.j, s.hs[u.j] AS sym
  FROM {prev} s, UNNEST(range(1, len(s.hs) + 1)) AS u(j)),
seq{r} AS MATERIALIZED (
  SELECT e.doc_id,
         list(CASE WHEN k.i IS NOT NULL THEN b.m ELSE e.sym END
              ORDER BY e.j) AS hs
  FROM exp{r} e
  CROSS JOIN best{r} b
  LEFT JOIN kp{r} k ON k.doc_id = e.doc_id AND k.i = e.j
  LEFT JOIN kp{r} k2 ON k2.doc_id = e.doc_id AND k2.i = e.j - 1
  WHERE k2.i IS NULL
  GROUP BY e.doc_id)""")
    return ",\n".join(ctes)


def docs_dsir_weights(sf_dir: str):
    """DSIR data-selection importance weights (Xie et al. 2023) over the
    documents table: hashed-bigram likelihood ratio of the lang='en'
    target slice vs the raw corpus, Laplace-smoothed, integer-exact
    (stages/text_analysis.py::dsir_weights). The oracle replays the same
    token-hash chain, Horner bigram combine, 4096-bucket counts, and
    HUGEINT ratio arithmetic."""
    from ..stages.text_analysis import dsir_weights

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return dsir_weights(ds)


def _dsir_sql(nb: int = 4096, scale: int = 1_000_000,
              target: str = "en") -> str:
    from . import oracle_kernels as _ok

    prime = "1099511628211"
    return f"""{_ok.U64_PRELUDE}
WITH {_ok._token_hash_ctes()},
harr AS (SELECT doc_id, list(h ORDER BY pos) AS hs
         FROM hm GROUP BY doc_id),
bg AS MATERIALIZED (
  SELECT doc_id,
         CAST(u64add(u64mul(hs[i], {prime}::UBIGINT), hs[i+1])
              % {nb} AS BIGINT) AS b
  FROM harr, UNNEST(range(1, len(hs))) AS t(i)),
cr AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
ctg AS (SELECT b, COUNT(*) AS c FROM bg JOIN documents USING (doc_id)
        WHERE lang = '{target}' GROUP BY b),
tr AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cr),
tt AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t FROM ctg),
lut AS (SELECT cr.b,
        CAST(CAST({scale} AS HUGEINT) * (COALESCE(ctg.c, 0) + 1)
             * (tr.t + {nb})
             // ((cr.c + 1) * (tt.t + {nb})) AS BIGINT) AS s
        FROM cr LEFT JOIN ctg USING (b), tr, tt),
dw AS (SELECT doc_id, SUM(s) AS ssum, COUNT(*) AS n
       FROM bg JOIN lut USING (b) GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(n, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(ssum // n, 0) AS BIGINT) AS weight_ppm
FROM documents d LEFT JOIN dw USING (doc_id)
ORDER BY doc_id
"""


def docs_unigram_surprise(sf_dir: str):
    """Corpus-trained unigram LM score per doc (CCNet perplexity-bucket
    shape, integer-exact) — no vocab broadcast: token counts are decided
    inside hash buckets that hold every occurrence of their tokens
    (stages/text_analysis.py::unigram_surprise). Exact SQL oracle."""
    from ..stages.text_analysis import unigram_surprise

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return unigram_surprise(ds)


_UNIGRAM_SURPRISE_SQL = r"""
WITH toks AS (SELECT doc_id,
               UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS tok
      FROM documents),
c AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c),
s AS (SELECT doc_id, CAST(SUM(total // c) AS BIGINT) AS ssum,
             COUNT(*) AS n_tokens
      FROM toks JOIN c USING (tok), t GROUP BY doc_id)
SELECT doc_id, n_tokens, ssum // n_tokens AS mean_surprise
FROM s ORDER BY doc_id
"""


def docs_quality_rules(sf_dir: str):
    """Gopher-style rule-table quality filter (length / mean word length /
    symbol ratio / stopword rules, scaled-integer), pure map-side
    (stages/text_analysis.py::quality_rules_batch). Exact SQL oracle."""
    from ..stages.text_analysis import quality_rules_batch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(quality_rules_batch, batch_format="pyarrow")
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False) \
        .sort_by([("doc_id", "ascending")])


_QUALITY_RULES_SQL = r"""
WITH s AS (SELECT doc_id,
    len(regexp_extract_all(text, '\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\S')) AS n_sym_chars,
    len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
    len(regexp_extract_all(text, '\b(?:the|a|and|of|to|in)\b')) AS stop_hits
  FROM documents),
r AS (SELECT doc_id, n_tokens,
    n_sym_chars * 10 // greatest(n_tokens, 1) AS mean_wlen_x10,
    CASE WHEN n_tokens >= 30 THEN 1 ELSE 0 END AS rule_len,
    CASE WHEN n_sym_chars * 10 // greatest(n_tokens, 1) BETWEEN 40 AND 100
         THEN 1 ELSE 0 END AS rule_wordlen,
    CASE WHEN n_punct * 10 <= n_tokens THEN 1 ELSE 0 END AS rule_symbol,
    CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS rule_stop
  FROM s)
SELECT doc_id, n_tokens, mean_wlen_x10, rule_len, rule_wordlen,
       rule_symbol, rule_stop,
       rule_len * rule_wordlen * rule_symbol * rule_stop AS keep
FROM r ORDER BY doc_id
"""


def q5_local_supplier(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q5 shape (local supplier volume): revenue by nation for
    ASIA-region nations where the supplying supplier and the ordering
    customer share the nation, orders in [1995, 1997).

    Plan: region→nation (driver-tiny) gates two broadcast dim lookups —
    suppkey→nation and custkey→nation as int8 arrays (-1 = out of
    region), the q3 customer-mask precedent; orders prune to (orderkey,
    c_nat) map-side; lineitem prunes to in-region suppliers and
    pre-aggregates exact fixed-point revenue per (orderkey, s_nat).
    Under ``driver_limit`` lineitem rows both guard-bounded map outputs
    fold on the driver (one pyarrow join + group_by, zero shuffles —
    integer arithmetic, so the fold order is immaterial); above it ONE
    all-to-all (the hash join on orderkey) co-locates them, the
    same-nation filter and per-nation partials finish per joined block,
    and the driver folds ≤ |nations| rows. Revenue is scaled to integer
    PER ROW (cents x (100 - disc_cents), 1e-4 units) before any sum —
    order-free arithmetic, exact at every scale (the q1 lesson)."""
    import ray

    from ..stages.dedup import _cached_get

    rd = _rd()
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    rk = region.filter(pc.equal(region.column("r_name"), "ASIA")) \
        .column("r_regionkey").to_numpy(zero_copy_only=False)
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=pa.array(rk)))
    nat_keys = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    nat_names = dict(zip(nat_keys.tolist(),
                         nat.column("n_name").to_pylist()))
    in_region = np.zeros(int(nation.column("n_nationkey")
                             .to_numpy(zero_copy_only=False).max()) + 1,
                         dtype=bool)
    in_region[nat_keys] = True

    def _dim_lookup(path: str, key_col: str, nat_col: str) -> np.ndarray:
        t = pq.read_table(path, columns=[key_col, nat_col])
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        nats = t.column(nat_col).to_numpy(zero_copy_only=False)
        lut = np.full(int(keys.max()) + 1, -1, dtype=np.int8)
        ok = in_region[nats]
        lut[keys[ok]] = nats[ok].astype(np.int8)
        return lut

    supp_ref = ray.put(_dim_lookup(f"{sf_dir}/supplier.parquet",
                                   "s_suppkey", "s_nationkey"))
    cust_ref = ray.put(_dim_lookup(f"{sf_dir}/customer.parquet",
                                   "c_custkey", "c_nationkey"))

    lo = np.datetime64("1995-01-01").astype("datetime64[s]").astype(np.int64)
    hi = np.datetime64("1997-01-01").astype("datetime64[s]").astype(np.int64)

    def orders_slim(b: pa.Table) -> pa.Table:
        lut = _cached_get(cust_ref)
        per = {"s": 1, "ms": 10**3, "us": 10**6,
               "ns": 10**9}[b.column("o_orderdate").type.unit]
        od = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy()
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        c_nat = lut[ck]
        keep = (od >= lo * per) & (od < hi * per) & (c_nat >= 0)
        kept = b.filter(pa.array(keep))
        return pa.table({
            "l_orderkey": pc.cast(kept.column("o_orderkey"), pa.int64()),
            "c_nat": pa.array(c_nat[keep].astype(np.int64), pa.int64()),
        })

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_slim, batch_format="pyarrow")

    def lineitem_partial(b: pa.Table) -> pa.Table:
        lut = _cached_get(supp_ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        s_nat = lut[sk]
        keep = s_nat >= 0
        kept = b.filter(pa.array(keep))
        ep = np.rint(kept.column("l_extendedprice")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        dc = np.rint(kept.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({
            "l_orderkey": pc.cast(kept.column("l_orderkey"), pa.int64()),
            "s_nat": pa.array(s_nat[keep].astype(np.int64), pa.int64()),
            "rev": pa.array(ep * (100 - dc), pa.int64()),
        })
        g = t.group_by(["l_orderkey", "s_nat"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "s_nat", "rev"])

    rev = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    ).map_batches(lineitem_partial, batch_format="pyarrow")

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        parts_t = _gather(rev)
        ords = _gather(orders_f)
        j = parts_t.join(ords, keys=["l_orderkey"], join_type="inner")
        j = j.filter(pc.equal(j.column("s_nat"), j.column("c_nat")))
        fin = (j.group_by("s_nat").aggregate([("rev", "sum")])
               .rename_columns(["nat", "rev"]).to_pandas())
        fin["n_name"] = [nat_names[int(n)] for n in fin["nat"]]
        fin = fin.sort_values(["rev", "n_name"],
                              ascending=[False, True]).reset_index(drop=True)
        return pa.table({"n_name": pa.array(fin["n_name"], pa.string()),
                         "revenue_scaled": pa.array(
                             fin["rev"].astype("int64"), pa.int64())})

    n_parts = _join_parts()
    joined = rev.join(orders_f, "inner", n_parts, on=("l_orderkey",))

    def nation_partial(b: pa.Table) -> pa.Table:
        same = pc.equal(b.column("s_nat"), b.column("c_nat"))
        kept = b.filter(same)
        g = pa.table({"nat": kept.column("s_nat"),
                      "rev": kept.column("rev")}) \
            .group_by("nat").aggregate([("rev", "sum")])
        return g.rename_columns(["nat", "rev"])

    parts = joined.map_batches(nation_partial, batch_format="pyarrow") \
        .to_pandas()
    if len(parts) == 0:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue_scaled": pa.array([], pa.int64())})
    fin = parts.groupby("nat", sort=False)["rev"].sum().reset_index()
    fin["n_name"] = [nat_names[int(n)] for n in fin["nat"]]
    fin = fin.sort_values(["rev", "n_name"],
                          ascending=[False, True]).reset_index(drop=True)
    return pa.table({"n_name": pa.array(fin["n_name"], pa.string()),
                     "revenue_scaled": pa.array(
                         fin["rev"].astype("int64"), pa.int64())})


_Q5_SQL = """
SELECT n.n_name AS n_name,
       CAST(SUM(CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round_even(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS revenue_scaled
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
             AND s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue_scaled DESC, n_name
"""


def embeddings_knn_graph(sf_dir: str):
    """Exact kNN graph (top-5 cosine neighbors for EVERY vector, self
    excluded) — chunked-plasma blocked matmul, per-task memory = one
    batch x one chunk (stages/similarity.py::knn_graph). Integer
    (vec_id, rank, neighbor_id) output; exact SQL oracle."""
    from ..stages.similarity import knn_graph

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return knn_graph(ds, k=5)


_KNN_GRAPH_SQL = """
WITH scored AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.embedding, b.embedding) AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored)
SELECT vec_id, CAST(rank AS INTEGER) AS rank, neighbor_id
FROM ranked WHERE rank <= 5 ORDER BY vec_id, rank
"""


def docs_curation_span(sf_dir: str):
    """Round-4 curation composite over the documents table: Gopher rule
    filter (keep) -> exact first-wins dedup -> duplicated-span coverage
    gate (frac_ppm < 200_000). Each stage is the registered distributed
    operator — the composite exists to pin that they CHAIN as Datasets
    (filter stays map-side, dedup's shuffle feeds coverage's shuffles)
    with one exact end-to-end SQL oracle. Output: kept (doc_id,
    n_tokens), sorted."""
    from ..stages.dedup import exact_dedup, substring_dup_coverage
    from ..stages.text_analysis import quality_rules_batch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def keep_quality(batch: pa.Table) -> pa.Table:
        keep = quality_rules_batch(batch).column("keep")
        return batch.filter(pc.equal(keep, 1))

    survivors = exact_dedup(
        ds.map_batches(keep_quality, batch_format="pyarrow"))
    cov = substring_dup_coverage(survivors, k=8)
    kept = cov.filter(pc.less(cov.column("frac_ppm"), 200_000))
    return kept.select(["doc_id", "n_tokens"]) \
        .sort_by([("doc_id", "ascending")])


_CURATION_SPAN_SQL = r"""
WITH s AS (SELECT doc_id, text,
    len(regexp_extract_all(text, '\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\S')) AS nsc,
    len(regexp_extract_all(text, '[^\w\s]')) AS npunct,
    len(regexp_extract_all(text, '\b(?:the|a|and|of|to|in)\b')) AS sh
  FROM documents),
q AS (SELECT doc_id, text, n_tokens FROM s
      WHERE n_tokens >= 30
        AND nsc * 10 // greatest(n_tokens, 1) BETWEEN 40 AND 100
        AND npunct * 10 <= n_tokens AND sh >= 1),
dd AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
kept AS (SELECT q.doc_id, q.text, q.n_tokens FROM q JOIN dd USING (doc_id)),
toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                    x -> x <> '') AS t
         FROM kept),
g AS (SELECT doc_id, i AS pos, array_to_string(t[i + 1 : i + 8], ' ') AS gram
      FROM toks, UNNEST(range(0, greatest(len(t) - 7, 0))) AS u(i)),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
occ AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
cov AS (SELECT doc_id, COUNT(DISTINCT j) AS c
        FROM occ, UNNEST(range(pos, pos + 8)) AS v(j) GROUP BY doc_id)
SELECT k.doc_id AS doc_id, k.n_tokens AS n_tokens
FROM kept k LEFT JOIN cov USING (doc_id)
WHERE COALESCE(cov.c, 0) * 1000000 // k.n_tokens < 200000
ORDER BY doc_id
"""


def q18_large_orders(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q18 shape (large-volume orders): orders whose total lineitem
    quantity exceeds 200, with customer name, top 10 by total price.

    Plan: lineitem pre-aggregates integer qty partials per orderkey
    map-side; under ``driver_limit`` lineitem rows the driver folds the
    partials with one pyarrow group_by, gates HAVING > 200 (a handful
    of orderkeys) and attaches order/customer attributes from the
    driver-read dimension tables — zero shuffles. Above the guard, ONE
    hash join against slim orders co-locates every partial of a key
    (join partitioning doubles as the final aggregation, the q3 shape),
    so the HAVING gate and the per-block top-10 run inside each joined
    block; customer names attach from a broadcast dim LUT and the
    driver merges <= 10 rows per block."""
    import ray

    from ..stages.dedup import _cached_get

    rd = _rd()
    qty_threshold = 200

    def lineitem_partial(b: pa.Table) -> pa.Table:
        qty = np.rint(b.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"l_orderkey": pc.cast(b.column("l_orderkey"),
                                            pa.int64()),
                      "qty": pa.array(qty, pa.int64())})
        g = t.group_by("l_orderkey").aggregate([("qty", "sum")])
        return g.rename_columns(["l_orderkey", "qty"])

    qtys = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"],
    ).map_batches(lineitem_partial, batch_format="pyarrow")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    names = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_name").to_pylist()))

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        # driver fold: partial rows are bounded by lineitem rows (and in
        # practice by blocks x |orders|); the HAVING gate leaves a
        # handful of keys, so the dimension attach is a driver is_in
        parts = _gather(qtys)
        tot = (parts.group_by("l_orderkey").aggregate([("qty", "sum")])
               .rename_columns(["l_orderkey", "sum_qty"]))
        tot = tot.filter(pc.greater(tot.column("sum_qty"),
                                    pa.scalar(qty_threshold, pa.int64())))
        od = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_totalprice"])
        od = od.filter(pc.is_in(pc.cast(od.column("o_orderkey"), pa.int64()),
                                value_set=pc.cast(tot.column("l_orderkey"),
                                                  pa.int64())))
        per = {"s": 1, "ms": 10**3, "us": 10**6,
               "ns": 10**9}[od.column("o_orderdate").type.unit]
        fin = (tot.join(pa.table({
            "l_orderkey": pc.cast(od.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(od.column("o_custkey"), pa.int64()),
            "order_epoch": pc.divide(pc.cast(od.column("o_orderdate"),
                                             pa.int64()), per),
            "totalprice_cents": pa.array(
                np.rint(od.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100)
                .astype(np.int64), pa.int64()),
        }), keys=["l_orderkey"], join_type="inner").to_pandas()
            .sort_values(["totalprice_cents", "l_orderkey"],
                         ascending=[False, True]).head(10)
            .reset_index(drop=True))
        return pa.table({
            "c_name": pa.array([names[int(c)] for c in fin["o_custkey"]],
                               pa.string()),
            "o_custkey": pa.array(fin["o_custkey"].astype("int64"),
                                  pa.int64()),
            "l_orderkey": pa.array(fin["l_orderkey"].astype("int64"),
                                   pa.int64()),
            "order_epoch": pa.array(fin["order_epoch"].astype("int64"),
                                    pa.int64()),
            "totalprice_cents": pa.array(
                fin["totalprice_cents"].astype("int64"), pa.int64()),
            "sum_qty": pa.array(fin["sum_qty"].astype("int64"), pa.int64()),
        })

    names_ref = ray.put(names)

    def orders_slim(b: pa.Table) -> pa.Table:
        per = {"s": 1, "ms": 10**3, "us": 10**6,
               "ns": 10**9}[b.column("o_orderdate").type.unit]
        epoch = pc.divide(pc.cast(b.column("o_orderdate"), pa.int64()), per)
        tp = np.rint(b.column("o_totalprice")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "order_epoch": epoch,
            "totalprice_cents": pa.array(tp, pa.int64()),
        })

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(orders_slim, batch_format="pyarrow")

    n_parts = _join_parts()
    joined = qtys.join(orders_f, "inner", n_parts, on=("l_orderkey",))

    def local_top(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey", "o_custkey", "order_epoch",
                        "totalprice_cents"]).aggregate([("qty", "sum")])
        df = g.rename_columns(["l_orderkey", "o_custkey", "order_epoch",
                               "totalprice_cents", "sum_qty"]).to_pandas()
        df = df[df["sum_qty"] > qty_threshold]
        df = df.sort_values(["totalprice_cents", "l_orderkey"],
                            ascending=[False, True]).head(10)
        return pa.Table.from_pandas(df, preserve_index=False)

    tops = joined.map_batches(local_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if len(tops) == 0:
        return pa.table({"c_name": pa.array([], pa.string()),
                         "o_custkey": pa.array([], pa.int64()),
                         "l_orderkey": pa.array([], pa.int64()),
                         "order_epoch": pa.array([], pa.int64()),
                         "totalprice_cents": pa.array([], pa.int64()),
                         "sum_qty": pa.array([], pa.int64())})
    fin = tops.sort_values(["totalprice_cents", "l_orderkey"],
                           ascending=[False, True]).head(10)
    lut = _cached_get(names_ref)
    fin = fin.reset_index(drop=True)
    return pa.table({
        "c_name": pa.array([lut[int(c)] for c in fin["o_custkey"]],
                           pa.string()),
        "o_custkey": pa.array(fin["o_custkey"].astype("int64"), pa.int64()),
        "l_orderkey": pa.array(fin["l_orderkey"].astype("int64"), pa.int64()),
        "order_epoch": pa.array(fin["order_epoch"].astype("int64"),
                                pa.int64()),
        "totalprice_cents": pa.array(fin["totalprice_cents"].astype("int64"),
                                     pa.int64()),
        "sum_qty": pa.array(fin["sum_qty"].astype("int64"), pa.int64()),
    })


_Q18_SQL = """
SELECT c.c_name AS c_name, o.o_custkey AS o_custkey,
       l.l_orderkey AS l_orderkey,
       CAST(epoch(o.o_orderdate) AS BIGINT) AS order_epoch,
       CAST(round_even(o.o_totalprice * 100, 0) AS BIGINT)
           AS totalprice_cents,
       CAST(SUM(CAST(round_even(l.l_quantity, 0) AS BIGINT)) AS BIGINT)
           AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4, 5
HAVING SUM(CAST(round_even(l.l_quantity, 0) AS BIGINT)) > 200
ORDER BY totalprice_cents DESC, l_orderkey
LIMIT 10
"""


def docs_neardup_keep(sf_dir: str):
    """The dedup family's actual OUTPUT: the kept corpus after MinHash
    near-dup clustering — drop every doc whose cluster representative
    (min id in its connected component) is another doc. Non-reps are
    O(verified pairs) << corpus, so they broadcast and the corpus is
    anti-filtered map-side (one slim pass, no extra shuffle)."""
    import ray

    from ..stages.dedup import (_cached_get, minhash_lsh_pairs,
                                neardup_components)

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    comps = neardup_components(minhash_lsh_pairs(ds, threshold=0.5))
    drop = comps.filter(pc.not_equal(comps.column("cluster_rep"),
                                     comps.column("doc_id")))
    drop_ref = ray.put(drop.column("doc_id").combine_chunks())

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("doc_id"),
                                  value_set=_cached_get(drop_ref)))
        return pa.table({"doc_id": pc.cast(
            batch.filter(mask).column("doc_id"), pa.int64())})

    slim = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])
    out = slim.map_batches(keep, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["doc_id"].astype("int64"),
                                        pa.int64())})


def _neardup_keep_sql() -> str:
    from . import oracle_kernels as _ok

    return f"""{_ok.U64_PRELUDE}
WITH RECURSIVE {_ok._minhash_ctes()},
edges AS (SELECT a, b FROM scored WHERE (u = 0) OR (2 * i >= u)),
sym AS (SELECT a AS x, b AS y FROM edges
        UNION ALL SELECT b, a FROM edges),
reach(x, y) AS (
    SELECT x, y FROM sym
    UNION
    SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
),
nonrep AS (SELECT x AS doc_id FROM reach GROUP BY x
           HAVING least(x, min(y)) <> x)
SELECT d.doc_id AS doc_id FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM nonrep)
ORDER BY doc_id
"""


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape (promotion effect): promo revenue as an exact ppm
    share of total revenue for shipments in 1995-06 — broadcast
    part-type bitmask, ONE lineitem pass folding two fixed-point scalars
    per block, no shuffle at all."""
    import ray

    from ..stages.dedup import _cached_get

    rd = _rd()
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    promo = np.zeros(int(pk.max()) + 1, dtype=bool)
    is_promo = pc.equal(part.column("p_type"), "PROMO") \
        .to_numpy(zero_copy_only=False)
    promo[pk[is_promo]] = True
    promo_ref = ray.put(promo)

    lo = np.datetime64("1995-06-01").astype("datetime64[s]").astype(np.int64)
    hi = np.datetime64("1995-07-01").astype("datetime64[s]").astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        lut = _cached_get(promo_ref)
        per = {"s": 1, "ms": 10**3, "us": 10**6,
               "ns": 10**9}[b.column("l_shipdate").type.unit]
        sd = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy()
        keep = (sd >= lo * per) & (sd < hi * per)
        kept = b.filter(pa.array(keep))
        ep = np.rint(kept.column("l_extendedprice")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        dc = np.rint(kept.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        rev = ep * (100 - dc)
        pm = lut[kept.column("l_partkey").to_numpy(zero_copy_only=False)]
        return pa.table({"promo": pa.array([int(rev[pm].sum())], pa.int64()),
                         "total": pa.array([int(rev.sum())], pa.int64())})

    parts = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow").to_pandas()
    promo_rev = int(parts["promo"].sum())
    total_rev = int(parts["total"].sum())
    ppm = promo_rev * 1_000_000 // total_rev if total_rev else 0
    return pa.table({"promo_ppm": pa.array([ppm], pa.int64()),
                     "promo_rev_scaled": pa.array([promo_rev], pa.int64()),
                     "total_rev_scaled": pa.array([total_rev], pa.int64())})


_Q14_SQL = """
WITH f AS (
  SELECT CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(round_even(l.l_discount * 100, 0) AS BIGINT)) AS rev,
         p.p_type = 'PROMO' AS is_promo
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1995-06-01'
    AND l.l_shipdate < TIMESTAMP '1995-07-01')
SELECT CAST(COALESCE(SUM(rev) FILTER (WHERE is_promo), 0) * 1000000
            // SUM(rev) AS BIGINT) AS promo_ppm,
       CAST(COALESCE(SUM(rev) FILTER (WHERE is_promo), 0) AS BIGINT)
           AS promo_rev_scaled,
       CAST(SUM(rev) AS BIGINT) AS total_rev_scaled
FROM f
"""


def events_anomaly_hours(sf_dir: str):
    """Traffic-spike detection: hours whose event count exceeds 3x the
    trailing-24h hourly average (integer cross-multiplication: n * 24 >
    3 * trailing_sum, gap-hours count 0 via a true RANGE window). The
    corpus reduces DISTRIBUTED to the tiny hourly table (map-side Arrow
    partials + one groupby-Sum, the events_hourly shape); the window
    finish runs on that hours-sized result via prefix-sum searchsorted —
    a small-result driver finish, not a corpus materialization."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts")
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6,
                   "ns": 10**9}[ts.type.unit]
        hour = pc.divide(pc.cast(ts, pa.int64()), 3600 * per_sec)
        g = pa.table({"hour": hour}).group_by("hour").aggregate(
            [([], "count_all")])
        return g.rename_columns(["hour", "n"])

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    hours = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("hour").aggregate(Sum("n", alias_name="n"))
             .to_pandas().sort_values("hour"))
    h = hours["hour"].to_numpy(dtype=np.int64)
    n = hours["n"].to_numpy(dtype=np.int64)
    csum = np.concatenate(([0], np.cumsum(n)))
    lo = np.searchsorted(h, h - 24, side="left")
    hi = np.searchsorted(h, h, side="left")
    trailing = csum[hi] - csum[lo]
    flag = (trailing > 0) & (n * 24 > 3 * trailing)
    return pa.table({
        "hour_epoch": pa.array(h[flag] * 3600, pa.int64()),
        "n": pa.array(n[flag], pa.int64()),
        "trailing_24h": pa.array(trailing[flag], pa.int64()),
    })


_ANOMALY_SQL = """
WITH hrs AS (SELECT epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n
             FROM events GROUP BY 1),
w AS (SELECT hour, n,
             COALESCE(SUM(n) OVER (ORDER BY hour
                 RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS t24
      FROM hrs)
SELECT hour * 3600 AS hour_epoch, n, CAST(t24 AS BIGINT) AS trailing_24h
FROM w WHERE t24 > 0 AND n * 24 > 3 * t24
ORDER BY hour_epoch
"""


def q4_order_priority(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q4 shape (order-priority checking): orders placed in 1996
    counted per priority when at least one of their lineitems shipped
    AFTER the order date (EXISTS semi-join; the reference predicate uses
    commitdate/receiptdate which this dataset lacks — shipdate >
    orderdate keeps the same correlated-EXISTS shape).

    Plan: lineitem pre-reduces to one (orderkey, max ship epoch) partial
    per batch map-side, ONE hash join against the slim filtered orders
    co-locates every partial of a key (join partitioning doubles as the
    final aggregation — the q3/q18 shape), so the EXISTS test and the
    per-priority count both finish inside each joined block; the driver
    merges ~5 rows per block."""
    import ray

    rd = _rd()
    lo = pd.Timestamp("1996-01-01").value // 1000  # epoch micros
    hi = pd.Timestamp("1997-01-01").value // 1000

    def ship_partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
            "ship_us": pc.cast(pc.cast(b.column("l_shipdate"),
                                       pa.timestamp("us")), pa.int64()),
        })
        g = t.group_by("l_orderkey").aggregate([("ship_us", "max")])
        return g.rename_columns(["l_orderkey", "ship_us"])

    ships = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"],
    ).map_batches(ship_partial, batch_format="pyarrow")

    def orders_slim(b: pa.Table) -> pa.Table:
        ep = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64())
        t = pa.table({
            "l_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "order_us": ep,
            "o_orderpriority": b.column("o_orderpriority"),
        })
        mask = pc.and_(pc.greater_equal(t.column("order_us"), lo),
                       pc.less(t.column("order_us"), hi))
        return t.filter(mask)

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_slim, batch_format="pyarrow")

    def block_counts(b: pa.Table) -> pa.Table:
        # all ship partials of a key are co-located here: finish the
        # per-order max, apply the EXISTS predicate, count per priority
        g = b.group_by(["l_orderkey", "order_us", "o_orderpriority"]
                       ).aggregate([("ship_us", "max")])
        g = g.rename_columns(["l_orderkey", "order_us", "o_orderpriority",
                              "max_ship"])
        hit = g.filter(pc.greater(g.column("max_ship"),
                                  g.column("order_us")))
        c = hit.group_by("o_orderpriority").aggregate([("l_orderkey",
                                                        "count")])
        return c.rename_columns(["o_orderpriority", "order_count"])

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        # driver fold (guard-bounded map outputs): pyarrow join + the
        # same block_counts kernel over the single joined table
        sh = _gather(ships)
        of = _gather(orders_f)
        parts = block_counts(sh.join(of, keys=["l_orderkey"],
                                     join_type="inner")).to_pandas()
    else:
        n_parts = _join_parts()
        joined = ships.join(orders_f, "inner", n_parts, on=("l_orderkey",))
        parts = joined.map_batches(block_counts, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
    if len(parts) == 0:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "order_count": pa.array([], pa.int64())})
    fin = (parts.groupby("o_orderpriority", as_index=False)["order_count"]
           .sum().sort_values("o_orderpriority").reset_index(drop=True))
    return pa.table({
        "o_orderpriority": pa.array(fin["o_orderpriority"], pa.string()),
        "order_count": pa.array(fin["order_count"].astype("int64"),
                                pa.int64()),
    })


_Q4_SQL = """
SELECT o.o_orderpriority AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1
ORDER BY 1
"""


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape (customer distribution): histogram of customers
    by how many orders they placed, INCLUDING the zero-order bucket of
    the left join.

    Plan: orders pre-count per custkey map-side (one partial row per
    custkey per batch), fat-bucket shuffle on mix64(custkey) — never a
    natural-key groupby — then each bucket finishes its custkeys with a
    bincount and emits its local (c_count, custdist) histogram; the
    driver merges tiny histograms. The zero bucket is arithmetic:
    total customers (parquet metadata) minus customers seen in orders —
    no customer-side scan, no join."""
    from ray.data.aggregate import Sum

    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()
    total_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet"
                                ).metadata.num_rows

    def count_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"c": pc.cast(b.column("o_custkey"), pa.int64())}
                     ).group_by("c").aggregate([("c", "count")])
        g = g.rename_columns(["c_custkey", "cnt"])
        bucket = _mix64_np(np.asarray(g.column("c_custkey"),
                                      dtype=np.int64)) % nb
        return g.append_column("bucket",
                               pa.array(bucket.astype(np.int64)))

    def bucket_hist(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["c_custkey"].to_numpy(np.int64)
        cnt = df["cnt"].to_numpy(np.int64)
        _, inv = np.unique(keys, return_inverse=True)
        per_cust = np.bincount(inv, weights=cnt).astype(np.int64)
        c_count, custdist = np.unique(per_cust, return_counts=True)
        return pd.DataFrame({"c_count": c_count.astype(np.int64),
                             "custdist": custdist.astype(np.int64)})

    hist = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey"])
            .map_batches(count_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_hist, batch_format="pandas")
            .groupby("c_count")
            .aggregate(Sum("custdist", alias_name="custdist"))
            .to_pandas())
    seen = int(hist["custdist"].sum()) if len(hist) else 0
    zero = total_cust - seen
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame({"c_count": [0],
                                              "custdist": [zero]})])
    hist = hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]).reset_index(drop=True)
    return pa.table({
        "c_count": pa.array(hist["c_count"].astype("int64"), pa.int64()),
        "custdist": pa.array(hist["custdist"].astype("int64"), pa.int64()),
    })


_Q13_SQL = """
WITH per_cust AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (top supplier): supplier(s) with the maximum
    lineitem revenue over a 3-month ship window — the argmax-over-an-
    aggregate (correlated MAX subquery) shape.

    Plan: map-side fixed-point revenue partials per suppkey (the
    revenue_by_brand 1e-4 integer convention), ONE groupby-Sum shuffle
    at supplier-dim cardinality, then the max + tie filter runs on the
    dim-sized result; names attach from the supplier dim read."""
    from ray.data.aggregate import Sum

    rd = _rd()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1996-04-01").value // 1000

    def rev_partial(b: pa.Table) -> pa.Table:
        ep = pc.cast(pc.cast(b.column("l_shipdate"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        m = (ep >= lo) & (ep < hi)
        keys = b.column("l_suppkey").to_numpy(zero_copy_only=False)[m]
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)[m]
        rev4 = (np.rint(price * 100)
                * (100 - np.rint(disc * 100))).astype(np.int64)
        t = pa.table({"l_suppkey": pa.array(keys.astype(np.int64)),
                      "total_revenue": pa.array(rev4)})
        g = t.group_by("l_suppkey").aggregate([("total_revenue", "sum")])
        return g.rename_columns(["l_suppkey", "total_revenue"])

    rev = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
        .map_batches(rev_partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("total_revenue", alias_name="total_revenue"))
        .to_pandas())
    if len(rev) == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue": pa.array([], pa.int64())})
    best = int(rev["total_revenue"].max())
    win = rev[rev["total_revenue"] == best]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    names = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_name").to_pylist()))
    win = win.sort_values("l_suppkey").reset_index(drop=True)
    return pa.table({
        "s_suppkey": pa.array(win["l_suppkey"].astype("int64"), pa.int64()),
        "s_name": pa.array([names[int(k)] for k in win["l_suppkey"]],
                           pa.string()),
        "total_revenue": pa.array(win["total_revenue"].astype("int64"),
                                  pa.int64()),
    })


_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round_even(l_discount * 100, 0)
                                  AS BIGINT))) AS BIGINT) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       r.total_revenue AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q22_sales_opportunity(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q22 shape (global sales opportunity): per-nation count and
    balance of above-average-balance customers with NO urgent orders —
    the scalar-subquery broadcast + NOT EXISTS anti-join shape. (The
    reference groups by phone country code and anti-joins all orders;
    this dataset has no phone and no order-less customers, so nationkey
    and '1-URGENT' keep both shapes non-degenerate.)

    Plan: the positive-balance average reduces to two integer scalar
    partials map-side (the comparison is the exact integer
    cross-multiply cents * n > total_cents — no division on either
    side); urgent custkeys stay distributed and drop candidates via
    Ray's native LEFT ANTI hash join (the dedup_incremental shape);
    per-nation partials finish map-side."""
    import ray

    rd = _rd()

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(b.column("c_acctbal").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table({"tot": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([int(pos.size)], pa.int64())})

    bal = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_acctbal"]
                          ).map_batches(bal_partial,
                                        batch_format="pyarrow").to_pandas()
    tot, n = int(bal["tot"].sum()), int(bal["n"].sum())

    def cand(b: pa.Table) -> pa.Table:
        cents = np.rint(b.column("c_acctbal").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        m = cents * n > tot
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"),
                                 pa.int64()).filter(pa.array(m)),
            "c_nationkey": pc.cast(b.column("c_nationkey"),
                                   pa.int64()).filter(pa.array(m)),
            "cents": pa.array(cents[m], pa.int64()),
        })

    cands = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(cand, batch_format="pyarrow")

    def urgent(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("o_orderpriority"), "1-URGENT")
        return pa.table({"c_custkey": pc.cast(
            b.filter(m).column("o_custkey"), pa.int64())})

    urgent_keys = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(urgent, batch_format="pyarrow")

    def nation_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("c_nationkey").aggregate([("c_custkey", "count"),
                                                 ("cents", "sum")])
        return g.rename_columns(["c_nationkey", "numcust",
                                 "totacctbal_cents"])

    if pq.ParquetFile(
            f"{sf_dir}/orders.parquet").metadata.num_rows <= driver_limit:
        # driver fold: the anti-join is one sorted-membership probe
        # (np.isin) over the guard-bounded candidate/urgent key sets
        ct = _gather(cands)
        uk = np.unique(_gather(urgent_keys)
            .column("c_custkey").to_numpy(zero_copy_only=False))
        keep = ~np.isin(ct.column("c_custkey")
                        .to_numpy(zero_copy_only=False), uk)
        parts = nation_partial(ct.filter(pa.array(keep))).to_pandas()
    else:
        n_parts = _join_parts()
        kept = cands.join(urgent_keys, "left_anti", n_parts,
                          on=("c_custkey",))
        parts = kept.map_batches(nation_partial, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
    if len(parts) == 0:
        return pa.table({"c_nationkey": pa.array([], pa.int64()),
                         "numcust": pa.array([], pa.int64()),
                         "totacctbal_cents": pa.array([], pa.int64())})
    fin = (parts.groupby("c_nationkey", as_index=False)
           .sum().sort_values("c_nationkey").reset_index(drop=True))
    return pa.table({
        "c_nationkey": pa.array(fin["c_nationkey"].astype("int64"),
                                pa.int64()),
        "numcust": pa.array(fin["numcust"].astype("int64"), pa.int64()),
        "totacctbal_cents": pa.array(
            fin["totacctbal_cents"].astype("int64"), pa.int64()),
    })


_Q22_SQL = """
WITH avg_bal AS (
    SELECT CAST(SUM(CAST(round_even(c_acctbal * 100, 0) AS BIGINT))
                AS BIGINT) AS tot,
           COUNT(*) AS n
    FROM customer WHERE round_even(c_acctbal * 100, 0) > 0)
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(round_even(c.c_acctbal * 100, 0) AS BIGINT))
            AS BIGINT) AS totacctbal_cents
FROM customer c, avg_bal
WHERE CAST(round_even(c.c_acctbal * 100, 0) AS BIGINT) * avg_bal.n
      > avg_bal.tot
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
ORDER BY 1
"""


def events_heavy_hitters(sf_dir: str):
    """Frequent-items over the event stream: users emitting more than
    n/k of all events (k=200), found with Misra-Gries-pruned candidate
    partials + an exact verify pass (stages/sketches.heavy_hitters) —
    the output is EXACT, so the plain HAVING-threshold SQL is its
    oracle."""
    rd = _rd()
    from ..stages.sketches import heavy_hitters

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = heavy_hitters(ds, "user_id", k=200)
    return out.rename_columns(["user_id", "cnt"])


_HEAVY_HITTERS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
FROM events
GROUP BY 1
HAVING COUNT(*) * 200 > (SELECT COUNT(*) FROM events)
ORDER BY cnt DESC, user_id
"""


def events_transition_matrix(sf_dir: str):
    """Per-user event-type Markov transitions: counts of consecutive
    (prev -> next) event-type bigrams in each user's (ts, event_id)-
    ordered stream (stages/window.transition_matrix fat-bucket plan)."""
    rd = _rd()
    from ..stages.window import transition_matrix

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    return transition_matrix(ds)


_TRANSITION_SQL = """
WITH s AS (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events)
SELECT prev AS prev_type, event_type AS next_type,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM s WHERE prev IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
"""


def docs_graph_walks(sf_dir: str):
    """Deterministic DeepWalk corpus sampling (Perozzi et al. 2014) over
    the site link graph: one 4-step walk per node, neighbor choice =
    ``mix64(node * GOLDEN + seed * 4 + t) % deg`` over the sorted-unique
    adjacency — RNG-free, so the unrolled SQL oracle replays every step.
    Output = per-node visit counts (graph-sampling weight table)."""
    rd = _rd()
    from ..stages.graph import graph_walks, site_edges

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    return graph_walks(site_edges(ids, n), n, walk_len=4)


def _graph_walks_sql(walk_len: int = 4) -> str:
    golden = "11400714819323198485"  # 0x9E3779B97F4A7C15
    steps = []
    for t in range(walk_len):
        steps.append(f"""
k{t} AS MATERIALIZED (
  SELECT s, node,
         u64add(u64mul(CAST(node AS UBIGINT), {golden}::UBIGINT),
                CAST(s * {walk_len} + {t} AS UBIGINT)) AS key
  FROM w{t}),
m{t} AS MATERIALIZED (SELECT s, node, mix64(key) AS mx FROM k{t}),
w{t + 1} AS (
  SELECT m.s, a.nbr AS node
  FROM m{t} m JOIN adj a
    ON a.node = m.node
   AND a.idx = CAST(m.mx % CAST(a.deg AS UBIGINT) AS BIGINT))""")
    vis = " UNION ALL ".join(
        f"SELECT node FROM w{t + 1}" for t in range(walk_len))
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH n AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
    SELECT d.doc_id AS a, 2 * d.doc_id + 1 AS b
    FROM documents d, n WHERE 2 * d.doc_id + 1 < n.n
    UNION ALL
    SELECT d.doc_id, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT 2 * d.doc_id + 1, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT least(d.doc_id, (7 * d.doc_id + 3) % n.n),
           greatest(d.doc_id, (7 * d.doc_id + 3) % n.n)
    FROM documents d, n WHERE (7 * d.doc_id + 3) % n.n <> d.doc_id
),
edges AS (SELECT DISTINCT a, b FROM raw),
adj AS MATERIALIZED (
  SELECT node, nbr,
         row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS idx,
         COUNT(*) OVER (PARTITION BY node) AS deg
  FROM (SELECT DISTINCT node, nbr FROM (
          SELECT a AS node, b AS nbr FROM edges
          UNION ALL SELECT b, a FROM edges))),
w0 AS (SELECT doc_id AS s, doc_id AS node FROM documents),{",".join(steps)}
SELECT node AS doc_id, CAST(COUNT(*) AS BIGINT) AS visits
FROM ({vis}) GROUP BY node ORDER BY node
"""


def docs_link_triangles(sf_dir: str):
    """Per-document triangle counts over the deterministic site link
    graph (stages/graph.site_edges rule) — degree-oriented distributed
    triangle counting (stages/graph.triangle_counts). The oracle
    recomputes the same edge rule in SQL and counts each a<b<c triangle
    once with a 3-way self-join (orientation-free, so it checks the
    RESULT, not the plan)."""
    rd = _rd()
    from ..stages.graph import site_edges, triangle_counts

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    return triangle_counts(site_edges(ids, n), n)


_TRIANGLES_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
    SELECT d.doc_id AS a, 2 * d.doc_id + 1 AS b
    FROM documents d, n WHERE 2 * d.doc_id + 1 < n.n
    UNION ALL
    SELECT d.doc_id, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT 2 * d.doc_id + 1, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT least(d.doc_id, (7 * d.doc_id + 3) % n.n),
           greatest(d.doc_id, (7 * d.doc_id + 3) % n.n)
    FROM documents d, n WHERE (7 * d.doc_id + 3) % n.n <> d.doc_id
),
edges AS (SELECT DISTINCT a, b FROM raw),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT v AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri
FROM (SELECT x AS v FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
GROUP BY 1
ORDER BY 1
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape (forecasting revenue change): one pruned scan,
    map-side predicate + fixed-point partial sums, a 1-row result — the
    pure filter-aggregate baseline every engine must not add overhead
    to. Revenue = extendedprice * discount summed exactly in 1e-4
    units; the discount band compares quantized integers so both sides
    make the identical float-boundary decision."""
    rd = _rd()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1997-01-01").value // 1000

    def partial(b: pa.Table) -> pa.Table:
        ep = pc.cast(pc.cast(b.column("l_shipdate"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        disc = np.rint(b.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100)
        m = ((ep >= lo) & (ep < hi) & (qty < 24.0)
             & (disc >= 5) & (disc <= 7))
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        rev4 = int((np.rint(price * 100).astype(np.int64)
                    * disc[m].astype(np.int64)).sum())
        return pa.table({"revenue": pa.array([rev4], pa.int64())})

    parts = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_discount",
                 "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table({"revenue": pa.array([int(parts["revenue"].sum())],
                                         pa.int64())})


_Q6_SQL = """
SELECT CAST(COALESCE(SUM(
           CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
           * CAST(round_even(l_discount * 100, 0) AS BIGINT)), 0)
       AS BIGINT) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 24.0
  AND round_even(l_discount * 100, 0) BETWEEN 5 AND 7
"""


def q10_returned_items(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q10 shape (returned-item reporting): top 20 customers by
    revenue lost to returned lineitems for orders placed in a quarter.

    Plan: returned-lineitem revenue partials pre-aggregate per orderkey
    map-side, ONE hash join against the slim window-filtered orders
    (the q18 shape — join partitioning co-locates all partials of a
    key), per-block partials re-key to custkey, a custkey groupby-Sum
    finishes revenue, and per-block top-20 + a driver merge of <= 20
    rows per block bound the result; names/balances attach from a
    broadcast customer LUT at the very end (20 rows)."""
    import ray

    from ray.data.aggregate import Sum

    rd = _rd()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1996-04-01").value // 1000

    def li_partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("l_returnflag"), "R")
        t = b.filter(m)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = np.rint(t.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100)
        rev4 = (np.rint(price * 100).astype(np.int64)
                * (100 - disc.astype(np.int64)))
        g = pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "revenue": pa.array(rev4, pa.int64()),
        }).group_by("l_orderkey").aggregate([("revenue", "sum")])
        return g.rename_columns(["l_orderkey", "revenue"])

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")

    def orders_slim(b: pa.Table) -> pa.Table:
        ep = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64())
        t = pa.table({"l_orderkey": pc.cast(b.column("o_orderkey"),
                                            pa.int64()),
                      "c_custkey": pc.cast(b.column("o_custkey"),
                                           pa.int64()),
                      "order_us": ep})
        mask = pc.and_(pc.greater_equal(t.column("order_us"), lo),
                       pc.less(t.column("order_us"), hi))
        return t.filter(mask).select(["l_orderkey", "c_custkey"])

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_slim, batch_format="pyarrow")

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        # driver fold (guard-bounded integer partials): pyarrow join +
        # one group_by — zero shuffles, exact integer revenue
        li_t = _gather(li)
        of = _gather(orders_f)
        tops = (li_t.join(of, keys=["l_orderkey"], join_type="inner")
                .group_by("c_custkey").aggregate([("revenue", "sum")])
                .rename_columns(["c_custkey", "revenue"]).to_pandas())
    else:
        n_parts = _join_parts()
        joined = li.join(orders_f, "inner", n_parts, on=("l_orderkey",))

        def rekey(b: pa.Table) -> pa.Table:
            g = b.group_by("c_custkey").aggregate([("revenue", "sum")])
            return g.rename_columns(["c_custkey", "revenue"])

        per_cust = (joined.map_batches(rekey, batch_format="pyarrow",
                                       batch_size=None)
                    .groupby("c_custkey")
                    .aggregate(Sum("revenue", alias_name="revenue")))

        def local_top(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            return pa.Table.from_pandas(
                df.sort_values(["revenue", "c_custkey"],
                               ascending=[False, True]).head(20),
                preserve_index=False)

        tops = per_cust.map_batches(local_top, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    if len(tops) == 0:
        return pa.table({"c_custkey": pa.array([], pa.int64()),
                         "c_name": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.int64()),
                         "acctbal_cents": pa.array([], pa.int64())})
    fin = tops.sort_values(["revenue", "c_custkey"],
                           ascending=[False, True]).head(20)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal"])
    names = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_name").to_pylist()))
    bals = dict(zip(cust.column("c_custkey").to_pylist(),
                    cust.column("c_acctbal").to_pylist()))
    keys = fin["c_custkey"].astype("int64")
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([names[int(k)] for k in keys], pa.string()),
        "revenue": pa.array(fin["revenue"].astype("int64"), pa.int64()),
        "acctbal_cents": pa.array(
            [int(np.rint(bals[int(k)] * 100)) for k in keys], pa.int64()),
    })


_Q10_SQL = """
SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
       CAST(SUM(CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round_even(l.l_discount * 100, 0)
                              AS BIGINT))) AS BIGINT) AS revenue,
       CAST(round_even(c.c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q7_volume_shipping(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q7 shape (volume shipping): revenue between two nations by
    (supplier nation, customer nation, ship year) for 1996-1997, the
    directional nation-pair filter. Supplier and customer nations are
    broadcast dim LUTs (dense numpy gathers); the only all-to-all is
    the lineitem x orders hash join, and revenue partials complete per
    joined block (at most 2 pair-years per block reach the driver)."""
    import ray

    rd = _rd()
    lo = pd.Timestamp("1996-01-01").value // 1000
    hi = pd.Timestamp("1998-01-01").value // 1000
    nation_a, nation_b = 3, 8  # both nations have suppliers at every sf

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    snat = np.zeros(int(sk.max()) + 1, dtype=np.int32)
    snat[sk] = supp.column("s_nationkey").to_numpy(zero_copy_only=False)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    cnat = np.zeros(int(ck.max()) + 1, dtype=np.int32)
    cnat[ck] = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nname = dict(zip(nation.column("n_nationkey").to_pylist(),
                     nation.column("n_name").to_pylist()))

    def li_slim(b: pa.Table) -> pa.Table:
        ep = pc.cast(pc.cast(b.column("l_shipdate"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        sn = snat[b.column("l_suppkey").to_numpy(zero_copy_only=False)]
        m = ((ep >= lo) & (ep < hi)
             & ((sn == nation_a) | (sn == nation_b)))
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        disc = np.rint(b.column("l_discount")
                       .to_numpy(zero_copy_only=False)[m] * 100)
        rev4 = (np.rint(price * 100).astype(np.int64)
                * (100 - disc.astype(np.int64)))
        # epoch-us -> calendar year: integer days then numpy datetime math
        yrs = (ep[m].astype("datetime64[us]").astype("datetime64[Y]")
               .astype(np.int64) + 1970)
        return pa.table({
            "l_orderkey": pc.cast(b.column("l_orderkey"),
                                  pa.int64()).filter(pa.array(m)),
            "supp_nation": pa.array(sn[m].astype(np.int64), pa.int64()),
            "l_year": pa.array(yrs, pa.int64()),
            "revenue": pa.array(rev4, pa.int64()),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_slim, batch_format="pyarrow")

    def orders_slim(b: pa.Table) -> pa.Table:
        cn = cnat[b.column("o_custkey").to_numpy(zero_copy_only=False)]
        m = (cn == nation_a) | (cn == nation_b)
        return pa.table({
            "l_orderkey": pc.cast(b.column("o_orderkey"),
                                  pa.int64()).filter(pa.array(m)),
            "cust_nation": pa.array(cn[m].astype(np.int64), pa.int64()),
        })

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
    ).map_batches(orders_slim, batch_format="pyarrow")

    li = li.materialize()
    empty = pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.int64())})
    if li.count() == 0:  # all-empty map output drops the join schema
        return empty

    def block_agg(b: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(b.column("supp_nation"),
                               b.column("cust_nation")))
        t = b.filter(m)
        g = t.group_by(["supp_nation", "cust_nation", "l_year"]
                       ).aggregate([("revenue", "sum")])
        return g.rename_columns(["supp_nation", "cust_nation", "l_year",
                                 "revenue"])

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        # driver fold (guard-bounded nation-filtered map outputs):
        # pyarrow join + the same block kernel — zero shuffles, exact
        # integer revenue
        li_t = _gather(li)
        of = _gather(orders_f)
        parts = block_agg(li_t.join(of, keys=["l_orderkey"],
                                    join_type="inner")).to_pandas()
    else:
        n_parts = _join_parts()
        joined = li.join(orders_f, "inner", n_parts, on=("l_orderkey",))
        parts = joined.map_batches(block_agg, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
    if len(parts) == 0:
        return empty
    fin = (parts.groupby(["supp_nation", "cust_nation", "l_year"],
                         as_index=False)["revenue"].sum()
           .sort_values(["supp_nation", "cust_nation", "l_year"])
           .reset_index(drop=True))
    return pa.table({
        "supp_nation": pa.array([nname[int(x)] for x in
                                 fin["supp_nation"]], pa.string()),
        "cust_nation": pa.array([nname[int(x)] for x in
                                 fin["cust_nation"]], pa.string()),
        "l_year": pa.array(fin["l_year"].astype("int64"), pa.int64()),
        "revenue": pa.array(fin["revenue"].astype("int64"), pa.int64()),
    })


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round_even(l.l_discount * 100, 0)
                              AS BIGINT))) AS BIGINT) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_nationkey = 3 AND n2.n_nationkey = 8)
       OR (n1.n_nationkey = 8 AND n2.n_nationkey = 3))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def docs_containment_pairs(sf_dir: str):
    """Broder containment near-dup pairs: |A n B| / min(|A|,|B|) >= 50%
    over distinct word bigrams — the asymmetric excerpt/quote-inclusion
    detector Jaccard dilutes away on lopsided sizes. Same two-shuffle
    fat-bucket machinery as docs_ngram_jaccard (stages/dedup) with the
    containment denominator."""
    rd = _rd()
    from ..stages.dedup import ngram_jaccard_pairs

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, threshold_pct=50, n=2,
                               mode="containment")


_CONTAINMENT_SQL = r"""
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '') AS w
     FROM documents),
bg AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] AS bg
       FROM w, UNNEST(range(1, len(w))) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
          FROM bg a JOIN bg b ON a.bg = b.bg AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT inter.a AS a, inter.b AS b
FROM inter JOIN sizes sa ON sa.doc_id = inter.a
           JOIN sizes sb ON sb.doc_id = inter.b
WHERE i * 100 >= 50 * least(sa.n, sb.n)
ORDER BY a, b
"""


def docs_cooccurrence_pmi(sf_dir: str):
    """Token co-occurrence with integer PMI-ratio scoring over the
    first-32-distinct-token sets of each document
    (stages/text_analysis.cooccurrence_pmi): within-block pair
    explosion, pair-hash bucket counting with the min-cooc gate inside
    the bucket, df hash joins, integer (cooc*N*1000)//(df_a*df_b)
    score — no float log on either engine."""
    rd = _rd()
    from ..stages.text_analysis import cooccurrence_pmi

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return cooccurrence_pmi(ds, max_tokens=32, min_cooc=3, top_k=50)


_COOC_PMI_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS tok,
           generate_subscripts(list_filter(
               regexp_split_to_array(text, '\s+'), x -> x <> ''), 1)
               AS pos
    FROM documents),
firsts AS (SELECT doc_id, tok, MIN(pos) AS fp FROM toks GROUP BY 1, 2),
capped AS (
    SELECT doc_id, tok FROM firsts
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY fp) <= 32),
df AS (SELECT tok, COUNT(*) AS df FROM capped GROUP BY 1),
n AS (SELECT COUNT(*) AS nd FROM documents),
pairs AS (
    SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS cooc
    FROM capped a JOIN capped b
      ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3)
SELECT tok_a, tok_b, CAST(cooc AS BIGINT) AS cooc,
       CAST((cooc * n.nd * 1000) // (da.df * db.df) AS BIGINT) AS score
FROM pairs, n
JOIN df da ON da.tok = pairs.tok_a
JOIN df db ON db.tok = pairs.tok_b
ORDER BY score DESC, tok_a, tok_b
LIMIT 50
"""


def q8_market_share(sf_dir: str, driver_limit: int = 1 << 22):
    """TPC-H Q8 shape (national market share): per order-year, the ppm
    share of PROMO-part revenue to region-1 customers that was supplied
    by nation 3. All dimension hops (part type, supplier nation,
    customer nation -> region) collapse into dense broadcast numpy
    gathers. Under ``driver_limit`` lineitem rows the two filtered map
    outputs fold on the driver (pyarrow join + integer year bincount,
    zero shuffles); above it the ONLY all-to-all is the lineitem x
    orders hash join, and each joined block emits (year, total,
    national) integer partials — the share is the exact integer
    num * 1e6 // den at the driver (the q14 ppm convention)."""
    import ray

    rd = _rd()
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    is_promo = np.zeros(int(pk.max()) + 1, dtype=bool)
    is_promo[pk] = np.asarray(part.column("p_type").to_numpy(
        zero_copy_only=False) == "PROMO")
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    snat = np.full(int(sk.max()) + 1, -1, dtype=np.int32)
    snat[sk] = supp.column("s_nationkey").to_numpy(zero_copy_only=False)
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False)
    region_of = np.full(int(nk.max()) + 1, -1, dtype=np.int32)
    region_of[nk] = nation.column("n_regionkey").to_numpy(
        zero_copy_only=False)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    cust_region = np.full(int(ck.max()) + 1, -1, dtype=np.int32)
    cust_region[ck] = region_of[cust.column("c_nationkey").to_numpy(
        zero_copy_only=False)]

    def li_slim(b: pa.Table) -> pa.Table:
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False)
        m = is_promo[keys]
        t = b.filter(pa.array(m))
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = np.rint(t.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100)
        rev4 = (np.rint(price * 100).astype(np.int64)
                * (100 - disc.astype(np.int64)))
        nat = snat[t.column("l_suppkey").to_numpy(zero_copy_only=False)]
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "revenue": pa.array(rev4, pa.int64()),
            "is_nation": pa.array((nat == 3).astype(np.int64), pa.int64()),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_slim, batch_format="pyarrow")

    def orders_slim(b: pa.Table) -> pa.Table:
        reg = cust_region[b.column("o_custkey").to_numpy(
            zero_copy_only=False)]
        m = reg == 1
        ep = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)[m]
        yrs = (ep.astype("datetime64[us]").astype("datetime64[Y]")
               .astype(np.int64) + 1970)
        return pa.table({
            "l_orderkey": pc.cast(b.column("o_orderkey"),
                                  pa.int64()).filter(pa.array(m)),
            "o_year": pa.array(yrs, pa.int64()),
        })

    orders_f = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_slim, batch_format="pyarrow")

    def block_agg(b: pa.Table) -> pa.Table:
        rev = b.column("revenue").to_numpy(zero_copy_only=False)
        isn = b.column("is_nation").to_numpy(zero_copy_only=False)
        yr = b.column("o_year").to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        # join-output blocks are unbounded: accumulate in int64 (a
        # float64 bincount sum would shed low bits past 2^53 and break
        # the exact ppm-share contract at large sf)
        tot = np.zeros(uy.size, dtype=np.int64)
        nat = np.zeros(uy.size, dtype=np.int64)
        np.add.at(tot, inv, rev.astype(np.int64))
        np.add.at(nat, inv, (rev * isn).astype(np.int64))
        return pa.table({
            "o_year": pa.array(uy, pa.int64()),
            "total": pa.array(tot, pa.int64()),
            "national": pa.array(nat, pa.int64()),
        })

    if pq.ParquetFile(
            f"{sf_dir}/lineitem.parquet").metadata.num_rows <= driver_limit:
        li_t = _gather(li)
        ords = _gather(orders_f)
        parts = block_agg(li_t.join(ords, keys=["l_orderkey"],
                                    join_type="inner")).to_pandas()
    else:
        n_parts = _join_parts()
        joined = li.join(orders_f, "inner", n_parts, on=("l_orderkey",))
        parts = joined.map_batches(block_agg, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
    if len(parts) == 0:
        return pa.table({"o_year": pa.array([], pa.int64()),
                         "mkt_share_ppm": pa.array([], pa.int64())})
    fin = (parts.groupby("o_year", as_index=False)[["total", "national"]]
           .sum().sort_values("o_year").reset_index(drop=True))
    share = (fin["national"].astype("int64") * 1_000_000
             // fin["total"].astype("int64"))
    return pa.table({
        "o_year": pa.array(fin["o_year"].astype("int64"), pa.int64()),
        "mkt_share_ppm": pa.array(share.astype("int64"), pa.int64()),
    })


_Q8_SQL = """
WITH base AS (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round_even(l.l_discount * 100, 0) AS BIGINT))
               AS rev,
           CASE WHEN s.s_nationkey = 3 THEN 1 ELSE 0 END AS isn
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO' AND n.n_regionkey = 1)
SELECT o_year,
       CAST(CAST(SUM(rev * isn) AS BIGINT) * 1000000
            // CAST(SUM(rev) AS BIGINT) AS BIGINT) AS mkt_share_ppm
FROM base
GROUP BY 1
ORDER BY 1
"""


def q17_small_quantity(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    Brand#11 lineitems whose quantity is below 20% of that part's
    average quantity — the correlated per-key average subquery.

    Plan: pass 1 builds (sum_q100, cnt) per brand part from quantity
    partials (the per-part stats side is bounded by the brand's part
    count — a dim-scale table — so it broadcasts); pass 2 re-scans the
    pruned lineitem columns and applies the EXACT integer cross-multiply
    ``q100 * 5 * cnt < sum_q100`` (qty < avg/5 with no division) and
    sums price cents map-side. Output also reports avg_yearly_cents =
    total // 7 (integer floor of the reference's /7.0, same on both sides)."""
    rd = _rd()
    brand = "Brand#11"
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    in_brand = np.zeros(int(pk.max()) + 1, dtype=bool)
    in_brand[pk] = np.asarray(part.column("p_brand").to_numpy(
        zero_copy_only=False) == brand)

    def qty_partial(b: pa.Table) -> pa.Table:
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False)
        m = in_brand[keys]
        q100 = np.rint(b.column("l_quantity").to_numpy(
            zero_copy_only=False)[m] * 100).astype(np.int64)
        t = pa.table({"p": pa.array(keys[m].astype(np.int64)),
                      "s": pa.array(q100), "c": pa.array(
                          np.ones(q100.size, np.int64))})
        g = t.group_by("p").aggregate([("s", "sum"), ("c", "sum")])
        return g.rename_columns(["p", "s", "c"])

    from ray.data.aggregate import Sum

    stats = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_quantity"])
             .map_batches(qty_partial, batch_format="pyarrow")
             .groupby("p").aggregate(Sum("s", alias_name="s"),
                                     Sum("c", alias_name="c"))
             .to_pandas())  # bounded by the brand's part count
    if len(stats) == 0:
        return pa.table({"total_cents": pa.array([0], pa.int64()),
                         "n_items": pa.array([0], pa.int64()),
                         "avg_yearly_cents": pa.array([0], pa.int64())})
    sum_of = np.zeros(int(pk.max()) + 1, dtype=np.int64)
    cnt_of = np.zeros(int(pk.max()) + 1, dtype=np.int64)
    sum_of[stats["p"]] = stats["s"]
    cnt_of[stats["p"]] = stats["c"]

    def rev_partial(b: pa.Table) -> pa.Table:
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q100 = np.rint(b.column("l_quantity").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        m = in_brand[keys] & (q100 * 5 * cnt_of[keys] < sum_of[keys])
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        cents = int(np.rint(price * 100).astype(np.int64).sum())
        return pa.table({"total_cents": pa.array([cents], pa.int64()),
                         "n_items": pa.array([int(m.sum())], pa.int64())})

    parts = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(rev_partial, batch_format="pyarrow").to_pandas())
    total = int(parts["total_cents"].sum())
    n_items = int(parts["n_items"].sum())
    return pa.table({"total_cents": pa.array([total], pa.int64()),
                     "n_items": pa.array([n_items], pa.int64()),
                     "avg_yearly_cents": pa.array([total // 7],
                                                  pa.int64())})


_Q17_SQL = """
WITH pstats AS (
    SELECT l_partkey,
           CAST(SUM(CAST(round_even(l_quantity * 100, 0) AS BIGINT))
                AS BIGINT) AS s,
           COUNT(*) AS c
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
    GROUP BY 1),
hits AS (
    SELECT CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
               AS cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pstats ps ON ps.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND CAST(round_even(l.l_quantity * 100, 0) AS BIGINT) * 5 * ps.c
          < ps.s)
SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COALESCE(SUM(cents), 0) // 7 AS BIGINT) AS avg_yearly_cents
FROM hits
"""


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    revenue over an OR of three (brand, size range, quantity band)
    conjunctions — the predicate-pushdown stress shape. Entirely
    map-side: part attributes collapse to dense broadcast gathers, the
    three-way disjunction evaluates vectorized per batch, fixed-point
    partials sum to one row."""
    rd = _rd()
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    brands = part.column("p_brand").to_numpy(zero_copy_only=False)
    sizes = part.column("p_size").to_numpy(zero_copy_only=False)
    brand_of = np.empty(int(pk.max()) + 1, dtype=object)
    brand_of[pk] = brands
    size_of = np.zeros(int(pk.max()) + 1, dtype=np.int64)
    size_of[pk] = sizes

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q = np.rint(b.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        br, sz = brand_of[keys], size_of[keys]
        m = (((br == "Brand#12") & (sz >= 1) & (sz <= 5)
              & (q >= 1) & (q <= 11))
             | ((br == "Brand#23") & (sz >= 1) & (sz <= 10)
                & (q >= 10) & (q <= 20))
             | ((br == "Brand#3") & (sz >= 1) & (sz <= 15)
                & (q >= 20) & (q <= 30)))
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[m]
        disc = np.rint(b.column("l_discount").to_numpy(
            zero_copy_only=False)[m] * 100)
        rev4 = int((np.rint(price * 100).astype(np.int64)
                    * (100 - disc.astype(np.int64))).sum())
        return pa.table({"revenue": pa.array([rev4], pa.int64()),
                         "n_items": pa.array([int(m.sum())], pa.int64())})

    parts = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
        .map_batches(partial, batch_format="pyarrow").to_pandas())
    return pa.table({
        "revenue": pa.array([int(parts["revenue"].sum())], pa.int64()),
        "n_items": pa.array([int(parts["n_items"].sum())], pa.int64()),
    })


_Q19_SQL = """
SELECT CAST(COALESCE(SUM(
           CAST(round_even(l.l_extendedprice * 100, 0) AS BIGINT)
           * (100 - CAST(round_even(l.l_discount * 100, 0) AS BIGINT))),
           0) AS BIGINT) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND round_even(l.l_quantity, 0) BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND round_even(l.l_quantity, 0) BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND round_even(l.l_quantity, 0) BETWEEN 20 AND 30)
"""


def docs_dedup_bloom(sf_dir: str):
    """The dedup_incremental Bloom-prefilter path as a first-class row:
    same snapshot/increment split as docs_dedup_incremental, but
    new-side rows that miss the prior-corpus Bloom filter (built
    distributed, OR-merged streaming, no-false-negative) bypass the
    anti-join shuffle entirely — at low dup rates the all-to-all
    shrinks to the dup slice + the ~n/2^bits FP trickle. Identical
    output contract, same exact SQL oracle."""
    from ..stages.dedup import dedup_incremental

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()

    def parity(par: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"), dtype=np.int64)
            return b.filter(pa.array(ids % 2 == par))
        return fn

    prior = docs.map_batches(parity(0), batch_format="pyarrow")
    new = docs.map_batches(parity(1), batch_format="pyarrow")
    out = dedup_incremental(new, prior, bloom_bits=1 << 22)
    res = out.to_pandas().sort_values("doc_id")
    return pa.table({"doc_id": pa.array(res["doc_id"], pa.int64())})


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted to
    this dataset's columns): in orders served by >= 2 distinct
    suppliers, find the supplier who UNIQUELY shipped last (their
    per-order max shipdate equals the order max and nobody ties) and
    count offending orders per supplier, top 10 — the
    EXISTS / NOT-EXISTS double self-join collapsed into per-order
    aggregates.

    Plan: map-side (orderkey, suppkey, max ship) partials, ONE
    mix64(orderkey) fat-bucket shuffle co-locates each order entirely;
    inside the bucket a vectorized pandas groupby finishes per-supplier
    maxima, order maxima, supplier counts, and the uniqueness gate;
    buckets emit per-supplier partial counts (disjoint orders, so the
    driver merges supplier-dim-sized partials and takes the top 10)."""
    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "o": pc.cast(b.column("l_orderkey"), pa.int64()),
            "s": pc.cast(b.column("l_suppkey"), pa.int64()),
            "ms": pc.cast(pc.cast(b.column("l_shipdate"),
                                  pa.timestamp("us")), pa.int64()),
        })
        g = t.group_by(["o", "s"]).aggregate([("ms", "max")])
        g = g.rename_columns(["o", "s", "ms"])
        kb = (_mix64_np(np.asarray(g.column("o"), dtype=np.int64)
                        .view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return g.append_column("_kb", pa.array(kb, pa.int64()))

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        per = (df.groupby(["o", "s"], as_index=False)["ms"].max())
        ost = per.groupby("o").agg(omax=("ms", "max"),
                                   nsupp=("s", "size")).reset_index()
        m = per.merge(ost, on="o")
        late = m[(m["nsupp"] >= 2) & (m["ms"] == m["omax"])]
        uniq = late.groupby("o", as_index=False).size()
        uniq = uniq[uniq["size"] == 1][["o"]]
        hits = late.merge(uniq, on="o")
        out = hits.groupby("s", as_index=False).size().rename(
            columns={"s": "s_suppkey", "size": "numwait"})
        return pd.DataFrame({
            "s_suppkey": out["s_suppkey"].astype(np.int64),
            "numwait": out["numwait"].astype(np.int64)})

    parts = (rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_kb").map_groups(bucket_kernel, batch_format="pandas")
        .to_pandas())
    if len(parts) == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "numwait": pa.array([], pa.int64())})
    fin = (parts.groupby("s_suppkey", as_index=False)["numwait"].sum()
           .sort_values(["numwait", "s_suppkey"],
                        ascending=[False, True]).head(10)
           .reset_index(drop=True))
    return pa.table({
        "s_suppkey": pa.array(fin["s_suppkey"].astype("int64"),
                              pa.int64()),
        "numwait": pa.array(fin["numwait"].astype("int64"), pa.int64()),
    })


_Q21_SQL = """
WITH per AS (
    SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS ms
    FROM lineitem GROUP BY 1, 2),
ostats AS (
    SELECT l_orderkey, MAX(ms) AS omax, COUNT(*) AS nsupp
    FROM per GROUP BY 1),
late AS (
    SELECT p.l_orderkey, p.l_suppkey
    FROM per p JOIN ostats o USING (l_orderkey)
    WHERE o.nsupp >= 2 AND p.ms = o.omax),
uniq AS (SELECT l_orderkey FROM late GROUP BY 1 HAVING COUNT(*) = 1)
SELECT late.l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late JOIN uniq USING (l_orderkey)
GROUP BY 1
ORDER BY numwait DESC, s_suppkey
LIMIT 10
"""


def docs_split_assign(sf_dir: str):
    """Deterministic train/valid/test split assignment — the first op of
    every training pipeline: split = mix64(doc_id) % 1000 thresholded
    at 800/900 (stable under corpus growth, no RNG state, one map-side
    pass). Output is the per-split count table; the per-doc labels
    stream to the sink at scale."""
    rd = _rd()
    from ..stages.text_analysis import _mix64_np

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False
                                          ).astype(np.int64)
        h = (_mix64_np(ids.view(np.uint64))
             % np.uint64(1000)).astype(np.int64)
        split = np.where(h < 800, "train",
                         np.where(h < 900, "valid", "test"))
        t = pa.table({"split": pa.array(split, pa.string()),
                      "n": pa.array(np.ones(len(b), np.int64))})
        g = t.group_by("split").aggregate([("n", "sum")])
        return g.rename_columns(["split", "n_docs"])

    parts = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
             .map_batches(assign, batch_format="pyarrow").to_pandas())
    fin = (parts.groupby("split", as_index=False)["n_docs"].sum()
           .sort_values("split").reset_index(drop=True))
    return pa.table({"split": pa.array(fin["split"], pa.string()),
                     "n_docs": pa.array(fin["n_docs"].astype("int64"),
                                        pa.int64())})


def _split_assign_sql() -> str:
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH h AS (
    SELECT CAST(mix64(CAST(doc_id AS UBIGINT)) % 1000 AS BIGINT) AS r
    FROM documents)
SELECT CASE WHEN r < 800 THEN 'train'
            WHEN r < 900 THEN 'valid' ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM h GROUP BY 1 ORDER BY 1
"""


def events_histogram(sf_dir: str):
    """Fixed-bin value histogram over the event stream: quantized cents
    bucketed at width 50.00 into 20 clamped bins — map-side bincount
    partials, one tiny merge, zero shuffles."""
    rd = _rd()

    def partial(b: pa.Table) -> pa.Table:
        v100 = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        bins = np.clip(v100 // 5000, 0, 19)
        cnt = np.bincount(bins, minlength=20).astype(np.int64)
        return pa.table({"bin": pa.array(np.arange(20, dtype=np.int64)),
                         "n": pa.array(cnt)})

    parts = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["value"])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    fin = (parts.groupby("bin", as_index=False)["n"].sum()
           .sort_values("bin").reset_index(drop=True))
    fin = fin[fin["n"] > 0]
    return pa.table({"bin": pa.array(fin["bin"].astype("int64"),
                                     pa.int64()),
                     "n": pa.array(fin["n"].astype("int64"), pa.int64())})


_EVENTS_HISTOGRAM_SQL = """
WITH b AS (
    SELECT least(greatest(
               CAST(round_even(value * 100, 0) AS BIGINT) // 5000,
               0), 19) AS bin
    FROM events)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY 1 ORDER BY 1
"""


def orders_rollup(sf_dir: str):
    """ROLLUP aggregate (nation, year) -> nation subtotals -> grand
    total in ONE pass: every map batch emits partials for all three
    grouping levels at once (sentinel -1 marks the rolled-up column —
    hash-compare-safe where NULL keys are not), so the multi-level
    aggregate costs exactly one tiny merge, not three scans."""
    rd = _rd()

    import ray

    from ..stages.dedup import _cached_get

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    _nat = np.full(int(ck.max()) + 1, -1, dtype=np.int64)  # -1 = absent
    _nat[ck] = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
    nat_ref = ray.put(_nat)  # object store, not per-task pickling

    def partial(b: pa.Table) -> pa.Table:
        nat_of = _cached_get(nat_ref)
        keys = b.column("o_custkey").to_numpy(zero_copy_only=False)
        # inner-join semantics: orders with unknown custkeys drop, as
        # in the oracle's JOIN (out-of-range or unmapped keys alike)
        ok = keys <= (len(nat_of) - 1)
        nat = np.where(ok, nat_of[np.minimum(keys, len(nat_of) - 1)], -1)
        m = nat >= 0
        b = b.filter(pa.array(m))
        nat = nat[m]
        ep = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        yr = (ep.astype("datetime64[us]").astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        cents = np.rint(b.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        lvl0 = pa.table({"n": pa.array(nat), "y": pa.array(yr),
                         "cents": pa.array(cents),
                         "cnt": pa.array(np.ones(len(b), np.int64))})
        g0 = lvl0.group_by(["n", "y"]).aggregate([("cents", "sum"),
                                                  ("cnt", "sum")])
        g0 = g0.rename_columns(["n", "y", "cents", "cnt"])
        n0 = g0.column("n").to_numpy(zero_copy_only=False)
        c0 = g0.column("cents").to_numpy(zero_copy_only=False)
        k0 = g0.column("cnt").to_numpy(zero_copy_only=False)
        # nation subtotal partials + grand total, derived from g0 rows
        un, inv = np.unique(n0, return_inverse=True)
        sub_c = np.zeros(un.size, np.int64)
        sub_k = np.zeros(un.size, np.int64)
        np.add.at(sub_c, inv, c0)
        np.add.at(sub_k, inv, k0)
        return pa.table({
            "c_nationkey": pa.array(np.concatenate(
                [n0, un, [-1]]).astype(np.int64)),
            "o_year": pa.array(np.concatenate(
                [g0.column("y").to_numpy(zero_copy_only=False),
                 np.full(un.size, -1), [-1]]).astype(np.int64)),
            "total_cents": pa.array(np.concatenate(
                [c0, sub_c, [c0.sum()]]).astype(np.int64)),
            "n_orders": pa.array(np.concatenate(
                [k0, sub_k, [k0.sum()]]).astype(np.int64)),
        })

    parts = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    fin = (parts.groupby(["c_nationkey", "o_year"], as_index=False)
           [["total_cents", "n_orders"]].sum()
           .sort_values(["c_nationkey", "o_year"]).reset_index(drop=True))
    return pa.table({
        "c_nationkey": pa.array(fin["c_nationkey"].astype("int64"),
                                pa.int64()),
        "o_year": pa.array(fin["o_year"].astype("int64"), pa.int64()),
        "total_cents": pa.array(fin["total_cents"].astype("int64"),
                                pa.int64()),
        "n_orders": pa.array(fin["n_orders"].astype("int64"), pa.int64()),
    })


_ORDERS_ROLLUP_SQL = """
SELECT COALESCE(CAST(c.c_nationkey AS BIGINT), -1) AS c_nationkey,
       COALESCE(CAST(year(o.o_orderdate) AS BIGINT), -1) AS o_year,
       CAST(SUM(CAST(round_even(o.o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY ROLLUP (c.c_nationkey, year(o.o_orderdate))
ORDER BY 1, 2
"""


def events_cumulative_users(sf_dir: str):
    """Cumulative-distinct-users-per-day growth curve: each user's
    first-seen day via a fat-bucket min reduction, then per-day
    new-user counts accumulate into the running total (tiny day-indexed
    table at the driver; the events never leave the map side twice)."""
    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "u": pc.cast(b.column("user_id"), pa.int64()),
            "d": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
        })
        # corrupt pre-epoch rows drop BEFORE the per-user min (the
        # oracle's WHERE runs before MIN; a user's valid events count)
        t = t.filter(pc.greater_equal(t.column("d"), 0))
        g = t.group_by("u").aggregate([("d", "min")])
        g = g.rename_columns(["u", "d"])
        kb = (_mix64_np(np.asarray(g.column("u"), dtype=np.int64)
                        .view(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return g.append_column("_kb", pa.array(kb, pa.int64()))

    def bucket_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("u", as_index=False)["d"].min()
        g = g[g["d"] >= 0]  # pre-epoch ts: floor/trunc divergence guard
        day = g["d"].to_numpy(np.int64) // 86_400_000_000
        du, cnt = np.unique(day, return_counts=True)
        return pd.DataFrame({"day": du.astype(np.int64),
                             "new_users": cnt.astype(np.int64)})

    parts = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("_kb").map_groups(bucket_min,
                                        batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"day_epoch": pa.array([], pa.int64()),
                         "new_users": pa.array([], pa.int64()),
                         "cumulative_users": pa.array([], pa.int64())})
    fin = (parts.groupby("day", as_index=False)["new_users"].sum()
           .sort_values("day").reset_index(drop=True))
    return pa.table({
        "day_epoch": pa.array(fin["day"].astype("int64") * 86_400,
                              pa.int64()),
        "new_users": pa.array(fin["new_users"].astype("int64"),
                              pa.int64()),
        "cumulative_users": pa.array(
            fin["new_users"].astype("int64").cumsum(), pa.int64()),
    })


_CUMULATIVE_USERS_SQL = """
WITH firsts AS (
    SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS day
    FROM events WHERE epoch_us(ts) >= 0 GROUP BY 1),
per_day AS (
    SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY 1)
SELECT day * 86400 AS day_epoch, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
           AS cumulative_users
FROM per_day
ORDER BY day_epoch
"""


def docs_sample_weighted(sf_dir: str):
    """Deterministic size-weighted bottom-k sample: priority =
    mix64(doc_id) // n_chars (longer docs get proportionally smaller
    priorities — the integer-arithmetic cousin of bottom-k weighted
    sampling), keep the 20 lowest. Map-side local top-k partials + a
    tiny driver merge; no RNG state, no shuffle, SQL-exact."""
    rd = _rd()
    from ..stages.text_analysis import _mix64_np

    k = 20

    def local_top(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False
                                          ).astype(np.int64)
        chars = np.maximum(
            b.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64), 1)
        prio = (_mix64_np(ids.view(np.uint64)) // chars.view(np.uint64)
                ).view(np.int64)
        order = np.lexsort((ids, prio.view(np.uint64)))[:k]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "prio": pa.array(prio[order], pa.int64())})

    parts = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])
             .map_batches(local_top, batch_format="pyarrow").to_pandas())
    pr = parts["prio"].to_numpy(np.int64).view(np.uint64)
    order = np.lexsort((parts["doc_id"].to_numpy(np.int64), pr))[:k]
    fin = parts.iloc[order]
    out = fin.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["doc_id"].astype("int64"),
                                        pa.int64())})


def _sample_weighted_sql() -> str:
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH pr AS (
    SELECT doc_id,
           mix64(CAST(doc_id AS UBIGINT))
               // CAST(greatest(n_chars, 1) AS UBIGINT) AS prio
    FROM documents)
SELECT doc_id FROM (
    SELECT doc_id FROM pr ORDER BY prio, doc_id LIMIT 20)
ORDER BY doc_id
"""


def media_phash_pairs(sf_dir: str):
    """Image near-duplicate pairs by perceptual hash: aHash over the
    media decode grid (stages/media.phash64_from_payloads), then the
    SAME 4x16-bit pigeonhole blocking + in-bucket Hamming verify the
    text simhash uses (stages/dedup.hamming_pairs_from_sigs) — one
    signature pass over the binary payload column, one band shuffle.

    The synthetic page->image rule makes every 3 consecutive docs embed
    the SAME asset (anchor = doc_id - doc_id % 3 — site-wide banner
    reuse, the dominant image-dup pattern in crawls), so the expected
    output is each triple's 3 pairs at Hamming 0; the near-zero-Hamming
    verify path is pinned by a handcrafted-signature test (the stub
    grids are avalanche-random, so real images are the only source of
    1-3-bit neighbors)."""
    rd = _rd()
    from ..stages.dedup import hamming_pairs_from_sigs
    from ..stages.media import phash64_from_payloads

    # the phash of a page's image IS its anchor doc's payload hash, so
    # only anchor docs decode: one streaming sig pass over the anchors
    # + a hash join assigns each member its triple's signature (docs
    # whose anchor is missing drop, matching the oracle's inner join);
    # nothing driver-materializes
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()

    def anchor_sigs(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        m = ids % 3 == 0
        t = b.filter(pa.array(m))
        ph = phash64_from_payloads(
            [x.encode() for x in t.column("text").to_pylist()])
        return pa.table({"anchor": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "simhash": pa.array(ph.view(np.int64),
                                             pa.int64())})

    def members(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "anchor": pa.array(ids - ids % 3, pa.int64())})

    sigs = docs.map_batches(anchor_sigs, batch_format="pyarrow")
    if docs.count() <= (1 << 22):
        # driver fold: the sig table is anchor-count-bounded; assigning
        # each member its triple's signature is one searchsorted against
        # the sorted anchor ids — no hash join, no shuffle
        st = _gather(sigs)
        anchors = st.column("anchor").to_numpy(zero_copy_only=False)
        sv = (st.column("simhash").to_numpy(zero_copy_only=False)
              .astype(np.int64))
        order = np.argsort(anchors, kind="stable")
        anchors, sv = anchors[order], sv[order]
        ids = _gather(docs.select_columns(["doc_id"])) \
            .column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        want = ids - ids % 3
        pos = np.searchsorted(anchors, want)
        ok = (pos < anchors.size)
        ok[ok] = anchors[pos[ok]] == want[ok]  # inner-join contract
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        sig_rows = _rd().from_arrow(pa.table({
            "doc_id": pa.array(ids[ok], pa.int64()),
            "simhash": pa.array(sv[pos[ok]].view(np.uint64), pa.uint64()),
        }), override_num_blocks=max(1, min(2 * cpus,
                                           int(ok.sum()) // 8192 or 1)))
        pairs = hamming_pairs_from_sigs(sig_rows, max_hamming=3)
    else:
        mem = docs.map_batches(members, batch_format="pyarrow")
        joined = mem.join(sigs, "inner", _join_parts(), on=("anchor",))

        def as_sig_rows(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "simhash": pa.array(
                    np.asarray(b.column("simhash"), dtype=np.int64)
                    .view(np.uint64), pa.uint64()),
            })

        pairs = hamming_pairs_from_sigs(
            joined.map_batches(as_sig_rows, batch_format="pyarrow"),
            max_hamming=3)
    return pa.table({
        "a": pairs.column("a"),
        "b": pairs.column("b"),
        "hamming": pc.cast(pairs.column("hamming"), pa.int64()),
    })


def _media_phash_sql() -> str:
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH m AS (
    SELECT d.doc_id AS media_id, d.doc_id,
           fnv1a(a.text) AS h
    FROM documents d
    JOIN documents a ON a.doc_id = d.doc_id - d.doc_id % 3),
seed AS MATERIALIZED (SELECT media_id, doc_id, h FROM m),
idx(i) AS (SELECT UNNEST(range(0, 64))),
cellseed AS MATERIALIZED (
    SELECT media_id, i,
           xor(h, u64mul(CAST(i + 1 AS UBIGINT),
                         {_oracle_kernels._GOLDEN}::UBIGINT)) AS s
    FROM seed CROSS JOIN idx),
cells AS MATERIALIZED (
    SELECT media_id, i, CAST(mix64(s) & 255::UBIGINT AS INTEGER) AS v
    FROM cellseed),
tot AS (SELECT media_id, SUM(v) AS tot FROM cells GROUP BY 1),
ph AS MATERIALIZED (
    SELECT s.doc_id,
           CAST(CAST(SUM(CASE WHEN CAST(c.v AS BIGINT) * 64 > t.tot
                              THEN CAST(1 AS HUGEINT) << c.i
                              ELSE CAST(0 AS HUGEINT) END)
                AS HUGEINT) AS UBIGINT) AS ph
    FROM cells c JOIN tot t USING (media_id) JOIN seed s USING (media_id)
    GROUP BY s.doc_id),
bands AS (
    SELECT doc_id, b, CAST((ph >> CAST(b * 16 AS UBIGINT))
                           & 65535::UBIGINT AS BIGINT) AS key, ph
    FROM ph CROSS JOIN (SELECT UNNEST(range(0, 4)) AS b)),
cand AS (
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
           l.ph AS pa, r.ph AS pb
    FROM bands l JOIN bands r
      ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id)
SELECT a, b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(pa, pb)) <= 3
ORDER BY a, b
"""


def events_sliding_distinct(sf_dir: str):
    """Trailing-7-day DISTINCT active users per day — the windowed
    count-distinct shape (plain window SUMs can't express it; engines
    resort to self-joins). ONE user-hash fat-bucket shuffle does all of
    it: users are partitioned across buckets, so per-bucket distinct
    users are globally distinct — inside each bucket, per-user active
    days explode into the 7 window days they cover, dedup per (user,
    wday) vectorized, and the bucket emits (wday, users, active) count
    partials; the driver merges a days-sized table and keeps observed
    days (active > 0)."""
    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()

    def prep(b: pa.Table) -> pa.Table:
        t = pa.table({
            "u": pc.cast(b.column("user_id"), pa.int64()),
            "d": pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                         pa.int64()),
        })
        u = t.column("u").to_numpy(zero_copy_only=False)
        us = t.column("d").to_numpy(zero_copy_only=False)
        ok = us >= 0  # pre-epoch ts = corrupt data; // floor vs DuckDB
        u, us = u[ok], us[ok]  # trunc also diverge below zero
        day = us // 86_400_000_000
        key = np.unique(u * 1_000_000 + day)  # per-batch (user,day) dedup
        uu = key // 1_000_000
        kb = (_mix64_np(uu.view(np.uint64)) % np.uint64(nb)
              ).astype(np.int64)
        return pa.table({"k": pa.array(key, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_window(df: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(df["k"].to_numpy(np.int64))
        u, day = k // 1_000_000, k % 1_000_000
        # explode each active day into the 7 trailing windows it feeds
        off = np.arange(7, dtype=np.int64)
        wk = np.unique((u[:, None] * 1_000_000
                        + (day[:, None] + off[None, :])).ravel())
        wday = wk % 1_000_000
        wdays, wcnt = np.unique(wday, return_counts=True)
        adays, acnt = np.unique(day, return_counts=True)
        out = pd.DataFrame({"day": wdays.astype(np.int64),
                            "users": wcnt.astype(np.int64),
                            "active": np.zeros(wdays.size, np.int64)})
        act = pd.DataFrame({"day": adays.astype(np.int64),
                            "users": np.zeros(adays.size, np.int64),
                            "active": acnt.astype(np.int64)})
        return pd.concat([out, act], ignore_index=True)

    parts = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
             .map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(bucket_window,
                                        batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"day_epoch": pa.array([], pa.int64()),
                         "users_7d": pa.array([], pa.int64())})
    fin = (parts.groupby("day", as_index=False)[["users", "active"]]
           .sum())
    fin = (fin[fin["active"] > 0].sort_values("day")
           .reset_index(drop=True))
    return pa.table({
        "day_epoch": pa.array(fin["day"].astype("int64") * 86_400,
                              pa.int64()),
        "users_7d": pa.array(fin["users"].astype("int64"), pa.int64()),
    })


_SLIDING_DISTINCT_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
    FROM events WHERE epoch_us(ts) >= 0),
days AS (SELECT DISTINCT day FROM ud)
SELECT d.day * 86400 AS day_epoch,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d
FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
ORDER BY 1
"""


def docs_top_bigrams(sf_dir: str):
    """Corpus-wide top-20 word bigrams — the canonical distributed
    word-count: per-batch partial counts (one pandas groupby per
    batch), gram-hash fat-bucket merge (every copy of a gram string
    lands in one bucket, so the bucket emits final counts), per-bucket
    top-k, driver merges <= 20 rows per bucket. Counts TOTAL
    occurrences (not per-doc distinct — the decontaminate/jaccard ops
    own that convention)."""
    from ..stages.text_analysis import _fnv1a_bulk
    from ..stages.window import _default_buckets

    rd = _rd()
    k = 20
    nb = _default_buckets()

    def partial(b: pa.Table) -> pa.Table:
        grams: dict = {}
        for t in b.column("text").to_pylist():
            w = t.split()
            for i in range(len(w) - 1):
                g = w[i] + " " + w[i + 1]
                grams[g] = grams.get(g, 0) + 1
        keys = list(grams)
        kb = (np.asarray(_fnv1a_bulk(keys), dtype=np.uint64)
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"bigram": pa.array(keys, pa.string()),
                         "cnt": pa.array([grams[g] for g in keys],
                                         pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bigram", as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "bigram"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({"bigram": g["bigram"],
                             "cnt": g["cnt"].astype(np.int64)})

    parts = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["text"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("_kb").map_groups(bucket_top,
                                        batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    fin = (parts.sort_values(["cnt", "bigram"],
                             ascending=[False, True]).head(k)
           .reset_index(drop=True))
    return pa.table({"bigram": pa.array(fin["bigram"], pa.string()),
                     "cnt": pa.array(fin["cnt"].astype("int64"),
                                     pa.int64())})


_TOP_BIGRAMS_SQL = r"""
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '') AS w
     FROM documents),
bg AS (SELECT w[i] || ' ' || w[i+1] AS bigram
       FROM w, UNNEST(range(1, len(w))) AS t(i))
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
FROM bg GROUP BY 1
ORDER BY cnt DESC, bigram
LIMIT 20
"""


def docs_top_terms(sf_dir: str):
    """Per-document top-3 tf-idf terms — the standard auto-labeling op:
    tf counts are per-doc local (no shuffle), document frequencies
    come from one token-hash bucket reduction and broadcast (vocab is
    corpus-sublinear; the join path of cooccurrence_pmi is the
    above-limit fallback shape), idf is the integer N // df (float log
    would drift between libm builds — the keyword_topk convention),
    score = tf * idf with ties broken by term."""
    import ray

    from ..stages.dedup import _cached_get
    from ..stages.text_analysis import _fnv1a_bulk
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet"
                            ).metadata.num_rows

    def df_partial(b: pa.Table) -> pa.Table:
        counts: dict = {}
        for t in b.column("text").to_pylist():
            for tok in set(t.split()):
                counts[tok] = counts.get(tok, 0) + 1
        keys = list(counts)
        kb = (np.asarray(_fnv1a_bulk(keys), dtype=np.uint64)
              % np.uint64(nb)).astype(np.int64)
        return pa.table({"tok": pa.array(keys, pa.string()),
                         "df": pa.array([counts[t] for t in keys],
                                        pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)["df"].sum()
        return pd.DataFrame({"tok": g["tok"],
                             "df": g["df"].astype(np.int64)})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    df_tbl = (docs.select_columns(["text"])
              .map_batches(df_partial, batch_format="pyarrow")
              .groupby("_kb").map_groups(bucket_sum,
                                         batch_format="pandas"))
    df_map: dict = {}
    for b in df_tbl.iter_batches(batch_size=1 << 18,
                                 batch_format="pyarrow"):
        df_map.update(zip(b.column("tok").to_pylist(),
                          b.column("df").to_pylist()))
    ref = ray.put(df_map)

    def top3(b: pa.Table) -> pa.Table:
        lut = _cached_get(ref)
        out_id, out_tok, out_rank = [], [], []
        for d, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            tf: dict = {}
            for tok in t.split():
                tf[tok] = tf.get(tok, 0) + 1
            scored = sorted(
                ((-(c * (n_docs // lut[tok])), tok)
                 for tok, c in tf.items()))[:3]
            for r, (_, tok) in enumerate(scored, 1):
                out_id.append(d)
                out_tok.append(tok)
                out_rank.append(r)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "term": pa.array(out_tok, pa.string()),
                         "rank": pa.array(out_rank, pa.int64())})

    res = docs.map_batches(top3, batch_format="pyarrow").to_pandas()
    res = res.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    return pa.table({"doc_id": pa.array(res["doc_id"], pa.int64()),
                     "term": pa.array(res["term"], pa.string()),
                     "rank": pa.array(res["rank"], pa.int64())})


_TOP_TERMS_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS tok
    FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS nd FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok, tf.tf * (n.nd // df.df) AS score
    FROM tf JOIN df USING (tok), n)
SELECT doc_id, tok AS term,
       CAST(row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, tok) AS BIGINT)
           AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, tok) <= 3
ORDER BY doc_id, rank
"""


def events_mad(sf_dir: str):
    """Median absolute deviation of event values per type — the robust
    dispersion statistic, exactly: per-type integer-cents medians via
    the group_quantiles fixed-point machinery run twice (median, then
    median of |v - median|). Deviations recompute map-side against the
    broadcast per-type medians; medians are quantile_disc (element at
    ceil(p*n)) so every value is an actual data point."""
    import ray

    from ..stages.dedup import _cached_get
    from ..stages.window import group_quantiles

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"]).materialize()
    med = group_quantiles(ds, key="event_type", value_col="value",
                          ps=[0.5]).to_pandas()
    med_map = dict(zip(med["event_type"], med["q50_cents"]))
    ref = ray.put(med_map)

    def dev(b: pa.Table) -> pa.Table:
        lut = _cached_get(ref)
        types = b.column("event_type").to_pylist()
        cents = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        meds = np.asarray([lut[t] for t in types], dtype=np.int64)
        return pa.table({
            "event_type": b.column("event_type"),
            "value": pa.array(np.abs(cents - meds) / 100.0,
                              pa.float64()),
        })

    mad = group_quantiles(ds.map_batches(dev, batch_format="pyarrow"),
                          key="event_type", value_col="value",
                          ps=[0.5]).to_pandas()
    mad = mad.sort_values("event_type").reset_index(drop=True)
    out = med.sort_values("event_type").reset_index(drop=True)
    return pa.table({
        "event_type": pa.array(out["event_type"], pa.string()),
        "median_cents": pa.array(out["q50_cents"].astype("int64"),
                                 pa.int64()),
        "mad_cents": pa.array(mad["q50_cents"].astype("int64"),
                              pa.int64()),
    })


_EVENTS_MAD_SQL = """
WITH med AS (
    SELECT event_type,
           quantile_disc(CAST(round_even(value * 100, 0) AS BIGINT),
                         0.5) AS m
    FROM events GROUP BY 1),
dev AS (
    SELECT e.event_type,
           abs(CAST(round_even(e.value * 100, 0) AS BIGINT) - med.m)
               AS d
    FROM events e JOIN med USING (event_type))
SELECT d.event_type AS event_type,
       CAST(med.m AS BIGINT) AS median_cents,
       CAST(quantile_disc(d.d, 0.5) AS BIGINT) AS mad_cents
FROM dev d JOIN med USING (event_type)
GROUP BY 1, 2
ORDER BY 1
"""


def events_user_overlap(sf_dir: str):
    """Exact distinct-set algebra: |weekday users|, |weekend users|,
    |intersection|, |union| in ONE user-bucket pass — users are
    partitioned by the hash bucket, so per-bucket set sizes add up to
    the global answer (the KMV sketch covers the approximate path;
    this is its exact verifier shape). Weekday/weekend flags OR-reduce
    per user inside the bucket."""
    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()

    def prep(b: pa.Table) -> pa.Table:
        u = pc.cast(b.column("user_id"), pa.int64()).to_numpy(
            zero_copy_only=False)
        us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        dow = (day + 3) % 7  # Monday=0; 1970-01-01 (day 0) = Thursday = 3
        wk = (dow >= 5).astype(np.int64)
        key = np.unique(u * 2 + wk)  # (user, is_weekend) dedup per batch
        uu = key // 2
        kb = (_mix64_np(uu.view(np.uint64)) % np.uint64(nb)
              ).astype(np.int64)
        return pa.table({"k": pa.array(key, pa.int64()),
                         "_kb": pa.array(kb, pa.int64())})

    def bucket_sets(df: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(df["k"].to_numpy(np.int64))
        u, wk = k // 2, k % 2
        uu, inv = np.unique(u, return_inverse=True)
        has_wd = np.zeros(uu.size, bool)
        has_we = np.zeros(uu.size, bool)
        has_wd[inv[wk == 0]] = True
        has_we[inv[wk == 1]] = True
        return pd.DataFrame({
            "weekday_users": [np.int64(has_wd.sum())],
            "weekend_users": [np.int64(has_we.sum())],
            "both": [np.int64((has_wd & has_we).sum())],
            "either": [np.int64(uu.size)],
        })

    parts = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])
             .map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(bucket_sets,
                                        batch_format="pandas")
             .to_pandas())
    if len(parts) == 0:
        zero = pa.array([0], pa.int64())
        return pa.table({"weekday_users": zero, "weekend_users": zero,
                         "both": zero, "either": zero})
    tot = parts.sum()
    return pa.table({
        "weekday_users": pa.array([int(tot["weekday_users"])], pa.int64()),
        "weekend_users": pa.array([int(tot["weekend_users"])], pa.int64()),
        "both": pa.array([int(tot["both"])], pa.int64()),
        "either": pa.array([int(tot["either"])], pa.int64()),
    })


_USER_OVERLAP_SQL = """
WITH f AS (
    SELECT user_id,
           MAX(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1 END)
               AS wd,
           MAX(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
               AS we
    FROM events GROUP BY 1)
SELECT CAST(SUM(wd) AS BIGINT) AS weekday_users,
       CAST(SUM(we) AS BIGINT) AS weekend_users,
       CAST(SUM(wd * we) AS BIGINT) AS both,
       CAST(COUNT(*) AS BIGINT) AS either
FROM f
"""


def events_dow_pivot(sf_dir: str):
    """Pivot to a wide matrix: event counts per (event_type x
    day-of-week) as seven columns — the report-table shape. Map-side
    partials carry all 7 columns per type, the driver merges a
    types-sized frame; no shuffle."""
    rd = _rd()

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86_400_000_000 + 3) % 7).astype(np.int64)
        types = b.column("event_type").to_numpy(zero_copy_only=False)
        ut, inv = np.unique(types, return_inverse=True)
        mat = np.zeros((ut.size, 7), np.int64)
        np.add.at(mat, (inv, dow), 1)
        cols = {"event_type": pa.array(ut, pa.string())}
        for d in range(7):
            cols[f"dow{d}"] = pa.array(mat[:, d], pa.int64())
        return pa.table(cols)

    parts = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "ts"])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    fin = (parts.groupby("event_type", as_index=False).sum()
           .sort_values("event_type").reset_index(drop=True))
    cols = {"event_type": pa.array(fin["event_type"], pa.string())}
    for d in range(7):
        cols[f"dow{d}"] = pa.array(fin[f"dow{d}"].astype("int64"),
                                   pa.int64())
    return pa.table(cols)


def _dow_pivot_sql() -> str:
    # dow here is days-since-epoch mod 7 with Monday=0 (epoch+4);
    # DuckDB dayofweek() is Sunday=0, so map: ours = (dayofweek+6)%7
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN (dayofweek(ts) + 6) % 7 = {d} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS dow{d}" for d in range(7))
    return f"""
SELECT event_type,
       {cols}
FROM events
GROUP BY 1
ORDER BY 1
"""


def docs_curation_train(sf_dir: str):
    """The full training-set curation DAG as ONE chained Dataset
    pipeline: deterministic split gate (train = mix64(doc_id)%1000 <
    800, map-side) -> Gopher quality rules (map-side) -> exact
    first-wins dedup (hash shuffle) -> greedy sequence packing
    (distributed prefix-sum). Returns the packing manifest of the
    curated train split — the artifact a trainer consumes. One exact
    end-to-end SQL oracle covers the whole chain."""
    from ..stages.dedup import exact_dedup
    from ..stages.text_analysis import _mix64_np, pack_sequences, \
        quality_rules_batch

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def train_quality(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False
                                              ).astype(np.int64)
        in_train = (_mix64_np(ids.view(np.uint64))
                    % np.uint64(1000)) < 800
        batch = batch.filter(pa.array(in_train))
        keep = quality_rules_batch(batch).column("keep")
        return batch.filter(pc.equal(keep, 1))

    survivors = exact_dedup(
        ds.map_batches(train_quality, batch_format="pyarrow"))
    return pack_sequences(survivors, budget=512)


def _curation_train_sql() -> str:
    return rf"""{_oracle_kernels.U64_PRELUDE}
WITH tr AS (
    SELECT doc_id, text FROM documents
    WHERE mix64(CAST(doc_id AS UBIGINT)) % 1000 < 800),
s AS (SELECT doc_id, text,
    len(regexp_extract_all(text, '\S+')) AS n_tokens,
    len(regexp_extract_all(text, '\S')) AS nsc,
    len(regexp_extract_all(text, '[^\w\s]')) AS npunct,
    len(regexp_extract_all(text, '\b(?:the|a|and|of|to|in)\b')) AS sh
  FROM tr),
q AS (SELECT doc_id, text, n_tokens FROM s
      WHERE n_tokens >= 30
        AND nsc * 10 // greatest(n_tokens, 1) BETWEEN 40 AND 100
        AND npunct * 10 <= n_tokens AND sh >= 1),
dd AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY text),
kept AS (SELECT q.doc_id, q.n_tokens FROM q JOIN dd USING (doc_id)),
c AS (SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS before
      FROM kept)
SELECT CAST(COALESCE(before, 0) // 512 AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


def docs_lang_confusion(sf_dir: str):
    """Evaluation row: the language-ID confusion matrix (true lang x
    guessed lang, counts) — classifier quality as a first-class
    pipeline output. The guess runs on the same LangId actor pool as
    docs_lang_guess; the confusion cells reduce map-side (per-batch
    pair counts, a languages^2-sized merge)."""
    from ..stages.text_analysis import LangId

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = ds.map_batches(LangId, batch_format="pyarrow",
                         concurrency=_conc(), num_cpus=0.5,
                         max_restarts=0)

    def cells(b: pa.Table) -> pa.Table:
        g = (pa.table({"lang": b.column("lang"),
                       "lang_guess": b.column("lang_guess"),
                       "n": pa.array(np.ones(len(b), np.int64))})
             .group_by(["lang", "lang_guess"]).aggregate([("n", "sum")]))
        return g.rename_columns(["lang", "lang_guess", "n_docs"])

    parts = out.map_batches(cells, batch_format="pyarrow").to_pandas()
    fin = (parts.groupby(["lang", "lang_guess"], as_index=False)
           ["n_docs"].sum().sort_values(["lang", "lang_guess"])
           .reset_index(drop=True))
    return pa.table({
        "lang": pa.array(fin["lang"], pa.string()),
        "lang_guess": pa.array(fin["lang_guess"], pa.string()),
        "n_docs": pa.array(fin["n_docs"].astype("int64"), pa.int64()),
    })


_LANG_CONFUSION_SQL = r"""
WITH toks AS (
  SELECT doc_id, lang, text,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '')[1:200]) AS t
  FROM documents
), hits AS (
  SELECT doc_id, lang, text,
    len(list_intersect(t, ['the','and','of','is','with'])) AS en,
    len(list_intersect(t, ['der','die','und','ist','mit'])) AS de,
    len(list_intersect(t, ['le','la','et','est','avec'])) AS fr,
    len(list_intersect(t, ['el','la','y','es','con'])) AS es
  FROM toks
), g AS (
  SELECT lang, CASE
    WHEN regexp_matches(text, '[\x{4E00}-\x{9FFF}]') THEN 'zh'
    WHEN de > en AND de >= fr AND de >= es THEN 'de'
    WHEN fr > en AND fr > de AND fr >= es THEN 'fr'
    WHEN es > en AND es > de AND es > fr THEN 'es'
    ELSE 'en' END AS lang_guess
  FROM hits
)
SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM g GROUP BY 1, 2 ORDER BY 1, 2
"""


def embeddings_ivf_recall(sf_dir: str):
    """Evaluation row: recall@k of the IVF probe path against the
    exact brute-force top-k, per query, as exact ppm — the ANN quality
    gate a 100-TB embedding pipeline runs before trusting its index.
    Both sides are the registered operators (embeddings_knn /
    embeddings_knn_ivf share parameters); the overlap divides in
    integer ppm so the oracle replays bit-exact."""
    from ..stages.similarity import hash_centroids, ivf_knn, knn_brute

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    queries, qids = _load_queries(sf_dir)
    brute = knn_brute(ds, queries, qids, k=_KNN_K).to_pandas()
    cents = hash_centroids(ds, n_clusters=16)
    ivf = ivf_knn(ds, queries, qids, k=_KNN_K, nprobe=6,
                  centroids=cents).to_pandas()
    rows = []
    for q in qids:
        want = set(brute[brute["query_id"] == q]["neighbor_id"])
        got = set(ivf[ivf["query_id"] == q]["neighbor_id"])
        rows.append((q, len(want & got) * 1_000_000 // _KNN_K))
    rows.sort()
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "recall_ppm": pa.array([r[1] for r in rows], pa.int64()),
    })


def _ivf_recall_sql() -> str:
    brute = _KNN_SQL.strip()
    # _ivf_knn_sql carries its own macro prelude; hoist it to the top
    # and nest the remaining WITH...SELECT as a parenthesized CTE body
    ivf = _ivf_knn_sql(16, 6).replace(
        _oracle_kernels.U64_PRELUDE, "").strip()
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH brute AS ({brute}),
ivf AS ({ivf}),
hits AS (
    SELECT b.query_id, COUNT(*) AS inter
    FROM brute b JOIN ivf i
      ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
    GROUP BY 1)
SELECT b.query_id AS query_id,
       CAST(COALESCE(h.inter, 0) * 1000000 // {_KNN_K} AS BIGINT)
           AS recall_ppm
FROM (SELECT DISTINCT query_id FROM brute) b
LEFT JOIN hits h USING (query_id)
ORDER BY query_id
"""


def docs_minhash_recall(sf_dir: str):
    """Evaluation row: recall of the MinHash-LSH candidate machinery
    against the EXACT trigram-Jaccard >= 0.5 pair set (same shingle
    definition) — verified LSH pairs are exact-Jaccard-checked, so any
    miss is purely banding recall, which is the quantity a dedup
    operator owner must monitor at scale. Output: one row
    (n_exact, n_detected, recall_ppm), all exact integers."""
    from ..stages.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).materialize()
    exact = ngram_jaccard_pairs(ds, threshold_pct=50, n=3)
    det = minhash_lsh_pairs(ds, threshold=0.5)
    exact_set = set(zip(exact.column("a").to_pylist(),
                        exact.column("b").to_pylist()))
    det_set = set(zip(det.column("a").to_pylist(),
                      det.column("b").to_pylist()))
    n_exact = len(exact_set)
    n_det = len(det_set & exact_set)
    recall = 1_000_000 if n_exact == 0 else n_det * 1_000_000 // n_exact
    return pa.table({
        "n_exact": pa.array([n_exact], pa.int64()),
        "n_detected": pa.array([n_det], pa.int64()),
        "recall_ppm": pa.array([recall], pa.int64()),
    })


def _minhash_recall_sql() -> str:
    det = _oracle_kernels.minhash_pairs_sql().replace(
        _oracle_kernels.U64_PRELUDE, "").strip()
    return rf"""{_oracle_kernels.U64_PRELUDE}
WITH det AS ({det}),
w AS (SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\s+'),
                    x -> x <> '') AS w
      FROM documents),
g AS (SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
      FROM w, UNNEST(range(1, greatest(len(w) - 1, 1))) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
          FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
exact AS (SELECT inter.a, inter.b
          FROM inter JOIN sizes sa ON sa.doc_id = inter.a
                     JOIN sizes sb ON sb.doc_id = inter.b
          WHERE 2 * i >= (sa.n + sb.n - i)),
hit AS (SELECT COUNT(*) AS n FROM exact
        JOIN det ON det.a = exact.a AND det.b = exact.b),
tot AS (SELECT COUNT(*) AS n FROM exact)
SELECT CAST(tot.n AS BIGINT) AS n_exact,
       CAST(hit.n AS BIGINT) AS n_detected,
       CAST(CASE WHEN tot.n = 0 THEN 1000000
                 ELSE hit.n * 1000000 // tot.n END AS BIGINT)
           AS recall_ppm
FROM tot, hit
"""


_KMEANS_K, _KMEANS_ITERS = 8, 3


def embeddings_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means over the embedding column in EXACT
    integer fixed-point (stages/similarity.kmeans_int): hash-seeded
    centroids, 3 iterations, squared-L2 assignment with lowest-index
    tie-break. Integer arithmetic makes the full iteration history
    bit-replayable in SQL — the oracle unrolls the same 3 iterations as
    CTEs (the pagerank_int convention)."""
    rd = _rd()
    from ..stages.similarity import kmeans_int

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kmeans_int(ds, n_clusters=_KMEANS_K, iters=_KMEANS_ITERS)


def _kmeans_ctes(k: int, iters: int, scale: int, offset: int,
                 sfx: str = "", dim_lo: int | None = None,
                 dim_hi: int | None = None) -> str:
    """CTE chain replaying the kmeans_int recurrence; ``sfx`` namespaces
    the CTEs so several chains (PQ subspaces) coexist in one query.
    dim_lo/dim_hi are 0-based python slice bounds (DuckDB lists are
    1-based inclusive)."""
    emb = ("embedding" if dim_lo is None
           else f"embedding[{dim_lo + 1}:{dim_hi}]")
    dist = (f"list_sum(list_transform(list_zip(v.q, c.q), "
            f"s -> (s[1]-s[2])*(s[1]-s[2])))")
    ctes = [f"""qv{sfx} AS MATERIALIZED (
  SELECT vec_id, list_transform({emb},
      x -> CAST(round_even(CAST(x AS DOUBLE) * {scale}, 0) AS BIGINT)
           + {offset}) AS q
  FROM embeddings),
cent0{sfx} AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY mix64(CAST(vec_id AS UBIGINT)),
                            vec_id) - 1 AS cluster, q
  FROM qv{sfx}
  QUALIFY row_number() OVER (ORDER BY mix64(CAST(vec_id AS UBIGINT)),
                             vec_id) <= {k})"""]
    for i in range(1, iters + 1):
        prev = f"cent{i - 1}f{sfx}" if i > 1 else f"cent0{sfx}"
        ctes.append(f"""assign{i}{sfx} AS MATERIALIZED (
  SELECT v.vec_id, v.q, c.cluster
  FROM qv{sfx} v CROSS JOIN {prev} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
            ORDER BY {dist}, c.cluster) = 1),
cent{i}{sfx} AS (
  SELECT cluster, list(s // m ORDER BY dim) AS q
  FROM (SELECT cluster, dim, SUM(val) AS s, COUNT(*) AS m
        FROM (SELECT cluster, generate_subscripts(q, 1) AS dim,
                     unnest(q) AS val FROM assign{i}{sfx})
        GROUP BY 1, 2)
  GROUP BY cluster),
cent{i}f{sfx} AS MATERIALIZED (
  SELECT c0.cluster, COALESCE(c1.q, c0.q) AS q
  FROM {prev} c0 LEFT JOIN cent{i}{sfx} c1 USING (cluster))""")
    ctes.append(f"""out{sfx} AS (
  SELECT v.vec_id, c.cluster
  FROM qv{sfx} v CROSS JOIN cent{iters}f{sfx} c
  QUALIFY row_number() OVER (PARTITION BY v.vec_id
            ORDER BY {dist}, c.cluster) = 1)""")
    return ",\n".join(ctes)


def _kmeans_sql(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS,
                scale: int = 100, offset: int = 1000) -> str:
    chain = _kmeans_ctes(k, iters, scale, offset)
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH {chain}
SELECT vec_id, cluster FROM out ORDER BY vec_id
"""


# tau = 7/20: the synthetic embeddings carry no planted >=0.8 twins (max
# pairwise cosine ~0.51), so the dedup threshold sits where the corpus
# actually has semantic neighbors — the machinery is threshold-agnostic
_SEMDEDUP_NUM, _SEMDEDUP_DEN = 7, 20


def embeddings_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means over the embedding column
    (exact integer kmeans_int recurrence, same k/iters as
    embeddings_kmeans), then in-cluster semantic-duplicate removal at
    integer cosine >= _SEMDEDUP_NUM/_SEMDEDUP_DEN (7/20 here — see the
    constant's comment; stages/similarity.semdedup). Output (vec_id,
    cluster, rep, keep) is bit-replayable: the oracle unrolls the same
    kmeans CTEs, re-runs the integer cosine test pairwise within each
    cluster, and closes components with a recursive min-label CTE."""
    rd = _rd()
    from ..stages.similarity import semdedup

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return semdedup(ds, n_clusters=_KMEANS_K, iters=_KMEANS_ITERS,
                    tau_num=_SEMDEDUP_NUM, tau_den=_SEMDEDUP_DEN)


def _semdedup_closure_ctes(offset: int, num: int, den: int) -> str:
    """The SemDeDup component-closure CTE chain (centered coords,
    integer cosine test, recursive min-label) — shared by _semdedup_sql
    and _curation_emb_sql so the algebra lives in ONE place. Expects
    the kmeans chain's ``out``/``qv`` CTEs in scope; emits ``rep``."""
    dot = ("list_sum(list_transform(list_zip(a.c, b.c), "
           "s -> s[1]*s[2]))")
    return f"""cv AS MATERIALIZED (
  SELECT o.vec_id, o.cluster,
         list_transform(v.q, x -> x - {offset}) AS c
  FROM out o JOIN qv v USING (vec_id)),
nn AS MATERIALIZED (
  SELECT vec_id, cluster, c,
         list_sum(list_transform(c, x -> x * x)) AS n2
  FROM cv),
sdedges AS (
  SELECT x, y FROM (
    SELECT a.vec_id AS x, b.vec_id AS y, {dot} AS dot,
           a.n2 * b.n2 AS n2p
    FROM nn a JOIN nn b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
  WHERE dot > 0 AND {den * den} * dot * dot >= {num * num} * n2p),
sym AS (SELECT x, y FROM sdedges UNION ALL SELECT y, x FROM sdedges),
reach(x, y) AS (
    SELECT x, y FROM sym
    UNION
    SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x),
rep AS (SELECT x AS vec_id, least(x, min(y)) AS rep
        FROM reach GROUP BY x)"""


def _semdedup_sql(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS,
                  scale: int = 100, offset: int = 1000,
                  num: int = _SEMDEDUP_NUM,
                  den: int = _SEMDEDUP_DEN) -> str:
    chain = _kmeans_ctes(k, iters, scale, offset)
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH RECURSIVE {chain},
{_semdedup_closure_ctes(offset, num, den)}
SELECT o.vec_id, o.cluster, COALESCE(r.rep, o.vec_id) AS rep,
       CAST(CASE WHEN COALESCE(r.rep, o.vec_id) = o.vec_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM out o LEFT JOIN rep r USING (vec_id)
ORDER BY vec_id
"""


_PQ_SUB, _PQ_K, _PQ_ITERS = 2, 4, 2


def embeddings_pq(sf_dir: str):
    """Product-quantization codes over the embedding column
    (stages/similarity.pq_codes): 2 contiguous 32-dim subspaces, each
    trained with the exact integer k-means recurrence (k=4, 2
    iterations) — codebooks and codes bit-replayable in SQL (two
    namespaced kmeans CTE chains joined on vec_id)."""
    rd = _rd()
    from ..stages.similarity import pq_codes

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return pq_codes(ds, n_sub=_PQ_SUB, n_clusters=_PQ_K, iters=_PQ_ITERS,
                    dim=64)


def _pq_sql(n_sub: int = _PQ_SUB, k: int = _PQ_K, iters: int = _PQ_ITERS,
            dim: int = 64) -> str:
    width = dim // n_sub
    chains = [_kmeans_ctes(k, iters, 100, 1000, sfx=f"_s{i}",
                           dim_lo=i * width, dim_hi=(i + 1) * width)
              for i in range(n_sub)]
    joined = ",\n".join(chains)
    sel = ", ".join(f"o{i}.cluster AS code_{i}" for i in range(n_sub))
    frm = " ".join(
        ["FROM out_s0 o0"] + [f"JOIN out_s{i} o{i} USING (vec_id)"
                              for i in range(1, n_sub)])
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH {joined}
SELECT o0.vec_id AS vec_id, {sel}
{frm}
ORDER BY vec_id
"""



_N_SESSION_WINDOWS = 12


def _ts_minmax_from_stats(path: str, col: str) -> tuple[int, int]:
    """Exact (min, max) of a timestamp column in epoch microseconds, read
    from parquet row-group statistics — a driver-side metadata scan
    replaces a full distributed pass for a 2-value scalar. Falls back to
    a Ray aggregate when any row group lacks statistics."""
    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index(col)
    los, his = [], []
    ok = True
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            ok = False
            break
        los.append(st.min)
        his.append(st.max)
    if ok and los:
        to_us = lambda v: int(pa.scalar(v).cast(  # noqa: E731
            pa.timestamp("us")).cast(pa.int64()).as_py())
        return min(map(to_us, los)), max(map(to_us, his))
    from ray.data.aggregate import Max, Min

    mm = _rd().read_parquet(path, columns=[col]).map_batches(
        lambda b: pa.table({"t": pc.cast(pc.cast(b.column(col),
                                                 pa.timestamp("us")),
                                         pa.int64())}),
        batch_format="pyarrow").aggregate(Min("t"), Max("t"))
    return int(mm["min(t)"]), int(mm["max(t)"])


def events_session_windows(sf_dir: str):
    """Interval OVERLAP join: 30-min gap sessions (closed [first, last]
    ts intervals) against 12 deterministic analysis windows derived from
    the event-time span — per window: overlapping sessions, distinct
    users, covered events (stages/window.py::session_window_overlap; one
    fat-bucket shuffle, windows broadcast map-side). Exact SQL oracle
    (window functions + non-equi LEFT JOIN)."""
    from ..stages.window import session_window_overlap

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    tmin, tmax = _ts_minmax_from_stats(f"{sf_dir}/events.parquet", "ts")
    span = tmax - tmin
    k = _N_SESSION_WINDOWS
    i = np.arange(k, dtype=np.int64)
    windows = pa.table({"window_id": pa.array(i, pa.int64()),
                        "ws_us": pa.array(tmin + i * span // k, pa.int64()),
                        "we_us": pa.array(tmin + i * span // k + span // 8,
                                          pa.int64())})
    return session_window_overlap(ev, windows)


_SESSION_WINDOWS_SQL = f"""
WITH b AS (SELECT epoch_us(MIN(ts)) AS tmin,
                  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span FROM events),
w AS (SELECT i AS window_id,
             tmin + i * span // {_N_SESSION_WINDOWS} AS ws_us,
             tmin + i * span // {_N_SESSION_WINDOWS} + span // 8 AS we_us
      FROM b, UNNEST(range(0, {_N_SESSION_WINDOWS})) AS u(i)),
marked AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER win > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts)),
numbered AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
sess AS (SELECT user_id, sid, MIN(t) AS s, MAX(t) AS e, COUNT(*) AS n
         FROM numbered GROUP BY user_id, sid)
SELECT w.window_id, w.ws_us, w.we_us,
       CAST(COUNT(sess.user_id) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT sess.user_id) AS BIGINT) AS n_users,
       CAST(COALESCE(SUM(sess.n), 0) AS BIGINT) AS n_events
FROM w LEFT JOIN sess ON sess.s <= w.we_us AND sess.e >= w.ws_us
GROUP BY 1, 2, 3 ORDER BY 1
"""


def events_gap_fill(sf_dir: str):
    """Sparse -> dense time-series regularization: per-user hourly grid
    over [first, last] event hour, last-observation-carried-forward
    values, folded to (n_hours, locf_sum) per user WITHOUT materializing
    the grid (entry weight = hours until the next observation;
    stages/window.py::locf_hourly). Oracle materializes the grid with
    generate_series + ASOF JOIN — same fold, independent plan."""
    from ..stages.window import locf_hourly

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    return locf_hourly(ev)


_GAP_FILL_SQL = """
WITH e AS (SELECT user_id,
                  -- FLOOR division (numpy semantics): DuckDB's // truncates
                  -- toward zero, which would shift pre-1970 hours by one
                  (epoch_us(ts)
                   - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000)
                  // 3600000000 AS h,
                  CAST(round_even(value * 10000, 0) AS BIGINT) AS v,
                  epoch_us(ts) AS t, event_id
           FROM events),
hv AS (SELECT user_id, h, v FROM e
       QUALIFY row_number() OVER (PARTITION BY user_id, h
                                  ORDER BY t DESC, event_id DESC) = 1),
bounds AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM e
           GROUP BY user_id),
grid AS (SELECT user_id, UNNEST(range(h0, h1 + 1)) AS h FROM bounds),
filled AS (SELECT g.user_id AS user_id, hv.v AS v
           FROM grid g ASOF JOIN hv
           ON g.user_id = hv.user_id AND g.h >= hv.h)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(v) AS BIGINT) AS locf_sum
FROM filled GROUP BY user_id ORDER BY user_id
"""



def docs_bigram_surprise(sf_dir: str):
    """Corpus-trained bigram conditional-LM score per doc (the KenLM-
    filter shape, integer-exact): transition surprise = context count //
    pair count, decided inside context-hash buckets that hold every
    transition of their contexts — the LM is co-located with its
    occurrences, never broadcast or materialized
    (stages/text_analysis.py::bigram_surprise). Exact SQL oracle."""
    from ..stages.text_analysis import bigram_surprise

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return bigram_surprise(ds)


_BIGRAM_SURPRISE_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(arr) AS tok, unnest(range(1, len(arr) + 1)) AS pos
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '') AS arr
        FROM documents)),
big AS (
  SELECT doc_id, tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL),
ctx AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
pr AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
s AS (SELECT doc_id, CAST(SUM(c1 // c2) AS BIGINT) AS ssum,
             COUNT(*) AS n_transitions
      FROM big JOIN ctx USING (w1) JOIN pr USING (w1, w2)
      GROUP BY doc_id)
SELECT doc_id, n_transitions, ssum // n_transitions AS mean_surprise
FROM s ORDER BY doc_id
"""



def docs_typo_pairs(sf_dir: str):
    """Edit-distance-1 pair discovery over the corpus vocabulary —
    SymSpell symmetric-delete blocking (candidates share a {word} ∪
    {delete-1} variant key; one equality shuffle + exact verify instead
    of all-pairs; stages/text_analysis.py::edit1_pairs). The corpus's
    base vocabulary has no natural typos, so the vocabulary is anchored
    with deterministic per-doc mutations of the doc's first token (one
    deletion at doc_id %% len, one 'z'-substitution at (doc_id*7+1) %%
    len) — the media_phash_pairs precedent for planting the phenomenon
    an op targets. Oracle replays the variant join + levenshtein."""
    from ..stages.text_analysis import edit1_pairs

    rd = _rd()

    def planted_vocab(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        ws = []
        for d, t in zip(ids, texts):
            toks = t.split()
            ws.extend(toks)
            if toks and len(toks[0]) >= 4:
                ft = toks[0]
                L = len(ft)
                p = d % L
                ws.append(ft[:p] + ft[p + 1:])
                q = (d * 7 + 1) % L
                ws.append(ft[:q] + "z" + ft[q + 1:])
        # per-batch pre-dedup shrinks the first shuffle (Zipf: the block
        # repeats its vocabulary constantly)
        uniq = list(dict.fromkeys(ws))
        return pa.table({"w": pa.array(uniq, pa.string())})

    words = rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .map_batches(planted_vocab, batch_format="pyarrow")
    return edit1_pairs(words)


_TYPO_PAIRS_SQL = r"""
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'),
                                          x -> x <> '') AS arr
              FROM documents),
base AS (SELECT DISTINCT unnest(arr) AS w FROM toks),
ft AS (SELECT doc_id, arr[1] AS t FROM toks
       WHERE len(arr) > 0 AND length(arr[1]) >= 4),
delv AS (SELECT substr(t, 1, doc_id % length(t))
                || substr(t, doc_id % length(t) + 2) AS w FROM ft),
subv AS (SELECT substr(t, 1, (doc_id * 7 + 1) % length(t)) || 'z'
                || substr(t, (doc_id * 7 + 1) % length(t) + 2) AS w FROM ft),
vocab AS (SELECT DISTINCT w FROM (SELECT w FROM base
                                  UNION ALL SELECT w FROM delv
                                  UNION ALL SELECT w FROM subv)),
vars AS (SELECT w, w AS var FROM vocab
         UNION ALL
         SELECT w, substr(w, 1, i - 1) || substr(w, i + 1) AS var
         FROM vocab, UNNEST(range(1, length(w) + 1)) AS u(i)),
cand AS (SELECT DISTINCT v1.w AS w1, v2.w AS w2
         FROM vars v1 JOIN vars v2 ON v1.var = v2.var AND v1.w < v2.w)
SELECT w1, w2 FROM cand WHERE levenshtein(w1, w2) <= 1 ORDER BY w1, w2
"""



def docs_link_prediction(sf_dir: str):
    """Common-neighbor link prediction over the deterministic site link
    graph: every NON-adjacent doc pair sharing >= 2 neighbors, scored by
    the shared-neighbor count (stages/graph.py::common_neighbor_pairs;
    wedge expansion in center buckets + pair-key rebucket, adjacency is
    a map-side rule predicate so no anti-join shuffle). The oracle
    recomputes the edge rule and counts wedges with a self-join."""
    from ..stages.graph import common_neighbor_pairs, site_edges

    rd = _rd()
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def site_adjacent(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # canonical a < b pairs against the site_edges rule
        child = (b == 2 * a + 1) | (b == 2 * a + 2)
        sibling = (a % 2 == 1) & (b == a + 1)
        chord = ((7 * a + 3) % n == b) | ((7 * b + 3) % n == a)
        return child | sibling | chord

    return common_neighbor_pairs(site_edges(ids, n), n,
                                 adjacent_fn=site_adjacent, min_common=2)


_LINK_PREDICTION_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
    SELECT d.doc_id AS a, 2 * d.doc_id + 1 AS b
    FROM documents d, n WHERE 2 * d.doc_id + 1 < n.n
    UNION ALL
    SELECT d.doc_id, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT 2 * d.doc_id + 1, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT least(d.doc_id, (7 * d.doc_id + 3) % n.n),
           greatest(d.doc_id, (7 * d.doc_id + 3) % n.n)
    FROM documents d, n WHERE (7 * d.doc_id + 3) % n.n <> d.doc_id
),
edges AS (SELECT DISTINCT a, b FROM raw),
adj AS (SELECT a AS x, b AS y FROM edges UNION ALL SELECT b, a FROM edges),
wed AS (SELECT a1.y AS u, a2.y AS w
        FROM adj a1 JOIN adj a2 ON a1.x = a2.x AND a1.y < a2.y),
cn AS (SELECT u, w, COUNT(*) AS n_common FROM wed GROUP BY u, w)
SELECT cn.u AS a, cn.w AS b, CAST(cn.n_common AS BIGINT) AS n_common
FROM cn LEFT JOIN edges e ON e.a = cn.u AND e.b = cn.w
WHERE e.a IS NULL AND cn.n_common >= 2
ORDER BY a, b
"""



def events_late_arrivals(sf_dir: str):
    """Watermark late-data audit: an event is late when the max event
    time over all PRIOR arrivals exceeds its own by a threshold (16
    average gaps, derived from parquet statistics). Events arrive
    ts-ordered in the synthetic table, so the arrival order is anchored
    with a deterministic 64-block reversal of event_id (the planted-
    phenomenon precedent). The kernel is a distributed global prefix-max:
    contiguous order chunks, a narrow per-chunk max pass, driver-side
    exclusive prefix over ONE scalar per chunk, then per-chunk vectorized
    watermark counts (stages/window.py::late_arrivals). Exact SQL oracle
    (MAX OVER ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)."""
    from ..stages.window import late_arrivals

    rd = _rd()
    path = f"{sf_dir}/events.parquet"
    tmin, tmax = _ts_minmax_from_stats(path, "ts")
    n = pq.ParquetFile(path).metadata.num_rows
    thr = (tmax - tmin) * 16 // n

    def with_arrival(batch: pa.Table) -> pa.Table:
        e = np.asarray(batch.column("event_id"), dtype=np.int64)
        arr = (e // 64) * 64 + (63 - e % 64)
        return batch.append_column("arr", pa.array(arr, pa.int64()))

    ev = rd.read_parquet(path, columns=["event_id", "event_type", "ts"]) \
        .map_batches(with_arrival, batch_format="pyarrow")
    return late_arrivals(ev, key="event_type", order_col="arr",
                         threshold_us=thr)


_LATE_ARRIVALS_SQL = """
WITH b AS (SELECT (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) * 16 // COUNT(*)
                  AS thr FROM events),
o AS (SELECT (event_id // 64) * 64 + (63 - event_id % 64) AS arr,
             event_type, epoch_us(ts) AS t
      FROM events),
m AS (SELECT event_type, t,
             MAX(t) OVER (ORDER BY arr ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS wm
      FROM o)
SELECT event_type,
       CAST(COUNT(*) FILTER (wm > t + (SELECT thr FROM b)) AS BIGINT)
           AS n_late,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM m GROUP BY event_type ORDER BY event_type
"""



def docs_link_resource_alloc(sf_dir: str):
    """Resource-allocation link-prediction index (Zhou et al. 2009) over
    the site graph: non-adjacent pairs scored by sum(1/deg(z)) over the
    shared neighbors z, integer fixed-point (1e6 // deg) so the replay
    is exact — rare shared neighbors outweigh hubs. Same wedge plan as
    docs_link_prediction with weight partials riding the pair rows."""
    from ..stages.graph import common_neighbor_pairs, site_edges

    rd = _rd()
    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])

    def site_adjacent(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        child = (b == 2 * a + 1) | (b == 2 * a + 2)
        sibling = (a % 2 == 1) & (b == a + 1)
        chord = ((7 * a + 3) % n == b) | ((7 * b + 3) % n == a)
        return child | sibling | chord

    return common_neighbor_pairs(site_edges(ids, n), n,
                                 adjacent_fn=site_adjacent, min_common=2,
                                 ra_scale=1_000_000)


_LINK_RESOURCE_ALLOC_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
    SELECT d.doc_id AS a, 2 * d.doc_id + 1 AS b
    FROM documents d, n WHERE 2 * d.doc_id + 1 < n.n
    UNION ALL
    SELECT d.doc_id, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT 2 * d.doc_id + 1, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT least(d.doc_id, (7 * d.doc_id + 3) % n.n),
           greatest(d.doc_id, (7 * d.doc_id + 3) % n.n)
    FROM documents d, n WHERE (7 * d.doc_id + 3) % n.n <> d.doc_id
),
edges AS (SELECT DISTINCT a, b FROM raw),
adj AS (SELECT a AS x, b AS y FROM edges UNION ALL SELECT b, a FROM edges),
deg AS (SELECT x, COUNT(*) AS d FROM adj GROUP BY x),
wed AS (SELECT a1.y AS u, a2.y AS w, 1000000 // deg.d AS ra
        FROM adj a1 JOIN adj a2 ON a1.x = a2.x AND a1.y < a2.y
        JOIN deg ON deg.x = a1.x),
cn AS (SELECT u, w, COUNT(*) AS n_common, CAST(SUM(ra) AS BIGINT) AS ra
       FROM wed GROUP BY u, w)
SELECT cn.u AS a, cn.w AS b, CAST(cn.n_common AS BIGINT) AS n_common,
       cn.ra AS ra
FROM cn LEFT JOIN edges e ON e.a = cn.u AND e.b = cn.w
WHERE e.a IS NULL AND cn.n_common >= 2
ORDER BY a, b
"""



_SHUFFLE_SHARDS = 32
_SHUFFLE_SEED = 3


def docs_shuffle_shards(sf_dir: str):
    """Deterministic epoch shuffle (training read order): shard =
    mix64(doc_id XOR seed) % S, pos = unsigned key rank inside the shard
    — a fresh permutation per seed with no random_shuffle all-to-all
    (stages/text_analysis.py::shuffle_shards). Exact SQL oracle via the
    shared mix64 macro."""
    from ..stages.text_analysis import shuffle_shards

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    return shuffle_shards(ds, n_shards=_SHUFFLE_SHARDS, seed=_SHUFFLE_SEED)


def _shuffle_shards_sql() -> str:
    from . import oracle_kernels as _ok

    return f"""{_ok.U64_PRELUDE}
WITH k AS (SELECT doc_id,
                  mix64(xor(CAST(doc_id AS UBIGINT),
                            {_SHUFFLE_SEED}::UBIGINT)) AS h
           FROM documents)
SELECT doc_id, CAST(h % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY h % {_SHUFFLE_SHARDS}
                               ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM k ORDER BY doc_id
"""



def docs_perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail corpus split on the integer unigram-
    surprise score (x1000 fixed-point for tercile resolution): exact
    tercile thresholds (rank (k*n+2)//3, 1-indexed)
    read off a score HISTOGRAM whose size is value-range-bounded, never
    corpus-sized (stages/text_analysis.py::perplexity_buckets). Exact
    SQL oracle."""
    from ..stages.text_analysis import perplexity_buckets

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return perplexity_buckets(ds)


_PERPLEXITY_BUCKETS_SQL = r"""
WITH toks AS (SELECT doc_id,
               UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS tok
      FROM documents),
c AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM c),
s AS (SELECT doc_id, CAST(SUM(total // c) AS BIGINT) AS ssum,
             COUNT(*) AS n_tokens
      FROM toks JOIN c USING (tok), t GROUP BY doc_id),
sc AS (SELECT n_tokens, ssum * 1000 // n_tokens AS v FROM s),
r AS (SELECT v, n_tokens, row_number() OVER (ORDER BY v) AS rk FROM sc),
nn AS (SELECT COUNT(*) AS n FROM sc),
th AS (SELECT MAX(CASE WHEN rk = (n + 2) // 3 THEN v END) AS t1,
              MAX(CASE WHEN rk = (2 * n + 2) // 3 THEN v END) AS t2
       FROM r, nn),
b AS (SELECT CASE WHEN v <= t1 THEN 0 WHEN v <= t2 THEN 1 ELSE 2 END
             AS bucket, v, n_tokens
      FROM r, th)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(v) AS min_score, MAX(v) AS max_score
FROM b GROUP BY bucket ORDER BY bucket
"""



_TEXT_INDEX_TERMS = ["stream", "vector", "window"]


def docs_text_index_topk(sf_dir: str):
    """Persistent inverted-index path (the text mirror of the IVF index
    row): build hive-partitioned postings under /tmp (bucket = term hash
    % 32), then a partition-PRUNED lookup — only the query terms' bucket
    directories are read — scoring sum(tf * (N // df)) integer-exact
    with a per-bucket local top-k (stages/text_analysis.py::TextIndex).
    Oracle scores the same terms straight off the documents table."""
    import hashlib
    import shutil

    from ..stages.text_analysis import TextIndex

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = f"/tmp/text_index_{tag}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    index = TextIndex.build(ds, idx_dir, n_buckets=32)
    out = index.lookup(_TEXT_INDEX_TERMS, k=10)
    shutil.rmtree(idx_dir, ignore_errors=True)
    return out


def _text_index_sql() -> str:
    vals = ", ".join(f"('{t}')" for t in _TEXT_INDEX_TERMS)
    return rf"""
WITH toks AS (SELECT doc_id,
               UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS tok
      FROM documents),
q AS (SELECT * FROM (VALUES {vals}) AS t(term)),
nn AS (SELECT COUNT(*) AS n FROM documents),
tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
       FROM toks JOIN q ON tok = term GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
sc AS (SELECT doc_id, CAST(SUM(tf * (n // df)) AS BIGINT) AS score
       FROM tf JOIN df USING (term), nn GROUP BY doc_id)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
FROM sc QUALIFY rank <= 10 ORDER BY rank
"""


def events_attribution(sf_dir: str):
    """First-touch attribution: per first-touch event type, the number
    of users who entered through it and the conversions (purchases)
    those users produced. One slim shuffle — blocks reduce to one
    candidate row per user before users hash into fat buckets
    (stages/window.py::first_touch_attribution). Exact SQL oracle
    (row_number tie-broken by event_id)."""
    from ..stages.window import first_touch_attribution

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    return first_touch_attribution(ev)


_ATTRIBUTION_SQL = """
WITH f AS (
    SELECT user_id, event_type FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) = 1),
c AS (SELECT user_id, COUNT(*) AS conv FROM events
      WHERE event_type = 'purchase' GROUP BY 1)
SELECT f.event_type AS first_touch,
       CAST(COUNT(*) AS BIGINT) AS users,
       CAST(COALESCE(SUM(c.conv), 0) AS BIGINT) AS conversions
FROM f LEFT JOIN c USING (user_id)
GROUP BY 1 ORDER BY 1
"""


def events_rfm(sf_dir: str):
    """RFM segmentation: per-user recency/frequency/monetary quartile
    scores (percentile_disc cuts, ascending 1..4), counted per
    (r,f,m) cell (stages/window.py::rfm_segments). One user shuffle of
    map-side partials + value-histogram cuts; exact SQL oracle."""
    from ..stages.window import rfm_segments

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    return rfm_segments(ev)


_RFM_SQL = """
WITH g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events),
peru AS (
    SELECT user_id, MAX(epoch_us(ts)) AS umax, COUNT(*) AS f,
           CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT))
                AS BIGINT) AS m
    FROM events GROUP BY user_id),
base AS (SELECT (g.gmax - umax) // 86400000000 AS r, f, m FROM peru, g),
cuts AS (SELECT
    percentile_disc(0.25) WITHIN GROUP (ORDER BY r) AS r1,
    percentile_disc(0.50) WITHIN GROUP (ORDER BY r) AS r2,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY r) AS r3,
    percentile_disc(0.25) WITHIN GROUP (ORDER BY f) AS f1,
    percentile_disc(0.50) WITHIN GROUP (ORDER BY f) AS f2,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY f) AS f3,
    percentile_disc(0.25) WITHIN GROUP (ORDER BY m) AS m1,
    percentile_disc(0.50) WITHIN GROUP (ORDER BY m) AS m2,
    percentile_disc(0.75) WITHIN GROUP (ORDER BY m) AS m3
  FROM base)
SELECT CAST(1 + (b.r > c.r1)::INT + (b.r > c.r2)::INT + (b.r > c.r3)::INT
            AS BIGINT) AS r_score,
       CAST(1 + (b.f > c.f1)::INT + (b.f > c.f2)::INT + (b.f > c.f3)::INT
            AS BIGINT) AS f_score,
       CAST(1 + (b.m > c.m1)::INT + (b.m > c.m2)::INT + (b.m > c.m3)::INT
            AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM base b, cuts c
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


_HITS_ITERS = 4
_HITS_SCALE = 10 ** 9


def docs_hits(sf_dir: str):
    """HITS hubs/authorities over the synthetic site graph in exact
    integer fixed-point (stages/graph.py::hits_int): per half-iteration
    one edge-table hash join + one groupby-Sum, sum-normalized to 1e9
    with an overflow-free floor decomposition. Unrolled-CTE oracle
    (the pagerank_int convention, HUGEINT normalization)."""
    from ..stages.graph import hits_int

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return hits_int(n, iters=_HITS_ITERS, scale=_HITS_SCALE)


def _hits_sql(iters: int = _HITS_ITERS, scale: int = _HITS_SCALE) -> str:
    parts = [f"""
WITH n AS (SELECT COUNT(*) AS c FROM documents),
edges AS MATERIALIZED (
{_EDGES_CTE_BODY}),
h0 AS (SELECT doc_id AS node, CAST({scale} // n.c AS BIGINT) AS h
       FROM documents, n)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
ar{k} AS (SELECT e.dst AS node, SUM(h.h) AS s
  FROM edges e JOIN h{k - 1} h ON h.node = e.src GROUP BY e.dst),
a{k} AS MATERIALIZED (
  SELECT node, CAST(CAST(s AS HUGEINT) * {scale}
                    // (SELECT SUM(s) FROM ar{k}) AS BIGINT) AS a
  FROM ar{k}),
hr{k} AS (SELECT e.src AS node, SUM(a.a) AS s
  FROM edges e JOIN a{k} a ON a.node = e.dst GROUP BY e.src),
h{k} AS MATERIALIZED (
  SELECT node, CAST(CAST(s AS HUGEINT) * {scale}
                    // (SELECT SUM(s) FROM hr{k}) AS BIGINT) AS h
  FROM hr{k})""")
    parts.append(f"""
SELECT d.doc_id, COALESCE(h.h, 0) AS hub_scaled,
       COALESCE(a.a, 0) AS auth_scaled
FROM documents d
LEFT JOIN h{iters} h ON h.node = d.doc_id
LEFT JOIN a{iters} a ON a.node = d.doc_id
ORDER BY d.doc_id
""")
    return "".join(parts)


def docs_tfidf_cosine(sf_dir: str):
    """All-pairs sparse tf-idf cosine similarity join (Elsayed/Vernica
    inverted-index shape, stages/dedup.py::tfidf_cosine_pairs): word
    TRIGRAM terms (the corpus's unigram vocabulary is ~31 words — zero
    discrimination), df cap 100 active, squared-cosine scores in exact
    integer/HUGEINT arithmetic. Exact SQL oracle."""
    from ..stages.dedup import tfidf_cosine_pairs

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return tfidf_cosine_pairs(ds, threshold_ppm=250_000, min_shared=2,
                              max_df=100, gram_n=3)


_TFIDF_COSINE_SQL = r"""
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '') AS w
     FROM documents),
toks AS (SELECT DISTINCT doc_id,
            w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tok
     FROM w, UNNEST(range(1, len(w) - 1)) AS t(i)),
n AS (SELECT COUNT(*) AS nd FROM documents),
df AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1),
vocab AS (SELECT tok, df FROM df WHERE df <= 100),
wt AS (SELECT tok, LEAST((n.nd * 1000) // df, 1000000) AS w
       FROM vocab, n),
posts AS (SELECT t.doc_id, t.tok, wt.w FROM toks t JOIN wt USING (tok)),
norms AS (SELECT doc_id, SUM(w * w) AS nsq FROM posts GROUP BY 1),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS shared,
                 SUM(a.w * a.w) AS num
          FROM posts a JOIN posts b
            ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
scored AS (
  SELECT p.a, p.b, CAST(p.shared AS BIGINT) AS shared,
         CAST(CAST(num AS HUGEINT) * num * 1000000
              // (CAST(na.nsq AS HUGEINT) * nb.nsq) AS BIGINT) AS cos2_ppm
  FROM pairs p JOIN norms na ON na.doc_id = p.a
               JOIN norms nb ON nb.doc_id = p.b)
SELECT a, b, shared, cos2_ppm FROM scored
WHERE cos2_ppm >= 250000 ORDER BY a, b
"""


def embeddings_cluster_purity(sf_dir: str):
    """Clustering evaluation: kmeans_int assignments scored against the
    ground-truth label column — per-cluster majority label and purity
    ppm (stages/similarity.py::cluster_purity). The contingency fold is
    k x |labels|; assignments never reach the driver. Oracle = the
    kmeans CTE chain + a QUALIFY majority pick."""
    rd = _rd()
    from ..stages.similarity import cluster_purity

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    return cluster_purity(ds, n_clusters=_KMEANS_K, iters=_KMEANS_ITERS)


def _cluster_purity_sql(k: int = 8, iters: int = 3, scale: int = 100,
                        offset: int = 1000) -> str:
    chain = _kmeans_ctes(k, iters, scale, offset)
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH {chain},
cl AS (SELECT o.cluster, e.label FROM out o
       JOIN embeddings e USING (vec_id)),
cnt AS (SELECT cluster, label, COUNT(*) AS n FROM cl GROUP BY 1, 2),
top AS (SELECT cluster, CAST(label AS BIGINT) AS maj_label,
               n AS maj_n FROM cnt
        QUALIFY row_number() OVER (PARTITION BY cluster
                                   ORDER BY n DESC, label) = 1),
tot AS (SELECT cluster, SUM(n) AS n FROM cnt GROUP BY 1)
SELECT t.cluster, CAST(tot.n AS BIGINT) AS n, t.maj_label,
       CAST(t.maj_n AS BIGINT) AS maj_n,
       CAST(t.maj_n * 1000000 // tot.n AS BIGINT) AS purity_ppm
FROM top t JOIN tot USING (cluster) ORDER BY t.cluster
"""


def events_count_min(sf_dir: str):
    """Count-min sketch per-user frequency estimates next to the exact
    counts (stages/sketches.py::count_min): 4x64 counter matrix from
    zero-shuffle map-side partials, estimates attached map-side from the
    broadcast matrix. Oracle replays the sketch bit-for-bit via the
    shared mix64 macro kernel (n_est >= n_exact by construction)."""
    from ..stages.sketches import count_min

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    return count_min(ev, "user_id", depth=4, width=64)


def _count_min_sql(depth: int = 4, width: int = 64) -> str:
    # mix64 textually expands its argument ~32x (oracle_kernels.py), so
    # every mix64 input lands in a MATERIALIZED column first
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH rws AS MATERIALIZED (
    SELECT CAST(r AS BIGINT) AS r,
           mix64(CAST(r + 1 AS UBIGINT)) AS salt
    FROM range({depth}) t(r)),
ev AS MATERIALIZED (
    SELECT user_id, mix64(CAST(user_id AS UBIGINT)) AS uh FROM events),
evx AS MATERIALIZED (
    SELECT e.user_id, w.r, xor(e.uh, w.salt) AS x
    FROM ev e CROSS JOIN rws w),
evc AS MATERIALIZED (
    SELECT user_id, r, CAST(mix64(x) % {width} AS BIGINT) AS c
    FROM evx),
cells AS (SELECT r, c, COUNT(*) AS n FROM evc GROUP BY 1, 2),
probes AS (SELECT user_id, r, ANY_VALUE(c) AS c, COUNT(*) AS n_exact
           FROM evc GROUP BY 1, 2)
SELECT p.user_id, CAST(ANY_VALUE(p.n_exact) AS BIGINT) AS n_exact,
       CAST(MIN(cl.n) AS BIGINT) AS n_est
FROM probes p JOIN cells cl ON cl.r = p.r AND cl.c = p.c
GROUP BY 1 ORDER BY p.user_id
"""


_MMR_K, _MMR_POOL = 5, 50


def embeddings_mmr(sf_dir: str):
    """Maximal-marginal-relevance diversified top-k over the embedding
    column (stages/similarity.py::mmr_topk): query = vector 0, lambda =
    1/2, exact integer dot-product arithmetic, relevance pool top-50
    from a distributed scan, greedy on the pool. Oracle unrolls the k
    greedy steps as CTEs (argmax + NOT IN per step)."""
    rd = _rd()
    from ..stages.similarity import mmr_topk

    qs, ids = _load_queries(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return mmr_topk(ds, qs[0], k=_MMR_K, pool=_MMR_POOL,
                    exclude_ids=(int(ids[0]),))


def _mmr_sql(k: int = _MMR_K, pool: int = _MMR_POOL,
             scale: int = 100) -> str:
    dot = ("list_sum(list_transform(list_zip(p.q, s.q), "
           "z -> z[1]*z[2]))")
    parts = [f"""
WITH qv AS (SELECT vec_id, list_transform(embedding,
        x -> CAST(round_even(CAST(x AS DOUBLE) * {scale}, 0) AS BIGINT))
        AS q FROM embeddings),
q0 AS (SELECT q FROM qv ORDER BY vec_id LIMIT 1),
qid AS (SELECT vec_id FROM qv ORDER BY vec_id LIMIT 1),
scored AS (SELECT v.vec_id,
        list_sum(list_transform(list_zip(v.q, q0.q),
                                z -> z[1]*z[2])) AS rel, v.q
    FROM qv v, q0 WHERE v.vec_id <> (SELECT vec_id FROM qid)),
pool AS MATERIALIZED (SELECT vec_id, rel, q FROM scored
    QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= {pool}),
s1 AS (SELECT vec_id, q, rel AS score FROM pool
    QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) = 1),
sel1 AS (SELECT vec_id, q FROM s1)"""]
    for t in range(2, k + 1):
        parts.append(f""",
ms{t} AS (SELECT p.vec_id, MAX({dot}) AS ms
    FROM pool p, sel{t - 1} s GROUP BY p.vec_id),
s{t} AS (SELECT p.vec_id, p.q, p.rel - m.ms AS score
    FROM pool p JOIN ms{t} m USING (vec_id)
    WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
    QUALIFY row_number() OVER (ORDER BY p.rel - m.ms DESC,
                               p.vec_id) = 1),
sel{t} AS (SELECT vec_id, q FROM sel{t - 1}
           UNION ALL SELECT vec_id, q FROM s{t})""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {t} AS rank, vec_id, score FROM s{t}"
        for t in range(1, k + 1))
    parts.append(f"""
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       CAST(score AS BIGINT) AS score
FROM ({sel}) ORDER BY rank
""")
    return "".join(parts)


_BASKET_MIN_SUPPORT = 5


def orders_market_basket(sf_dir: str):
    """Association-rule mining (Apriori level 2) over order baskets:
    for every part-brand pair co-bought in >= _BASKET_MIN_SUPPORT
    orders, the co-occurrence count and the integer lift in ppm
    (``cooc * n_orders * 10^6 // (s_a * s_b)``, arbitrary-precision at
    the tiny finish). The frequent-itemset operator family — distinct
    from similarity joins (no weights) and from PMI (basket = order,
    not document).

    Scale shape: the brand dimension broadcasts as a dense numpy gather
    (the q8 idiom); baskets co-locate via ONE orderkey fat-bucket
    shuffle; the in-bucket pair arithmetic is the shared index kernel
    (dedup._segment_pair_counts), and per-brand supports + the order
    count ride out of the same pass as disjoint partials (orderkeys are
    partitioned across buckets). The driver folds brand-pair rows
    (bounded by |brands|^2), never baskets."""
    import ray

    from ..stages.dedup import _segment_pair_counts
    from ..stages.text_analysis import _mix64_np

    rd = _rd()
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    brands = part.column("p_brand").to_pylist()
    uniq = sorted(set(brands))
    code_of = {b: i for i, b in enumerate(uniq)}
    part_code = np.full(int(pk.max()) + 1, -1, dtype=np.int64)
    part_code[pk] = np.asarray([code_of[b] for b in brands],
                               dtype=np.int64)

    nb = max(16, min(256,
                     int(ray.cluster_resources().get("CPU", 8)) * 2))

    def prep(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch.column("l_orderkey"), dtype=np.int64)
        lpk = np.asarray(batch.column("l_partkey"), dtype=np.int64)
        # partkeys missing from part (sentinel -1 or out of LUT range)
        # drop, mirroring the oracle's inner join
        in_range = (lpk >= 0) & (lpk < part_code.size)
        code = np.where(in_range, part_code[np.clip(lpk, 0,
                                                    part_code.size - 1)],
                        -1)
        keep = code >= 0
        t = pa.table({"ok": pa.array(ok[keep], pa.int64()),
                      "code": pa.array(code[keep], pa.int64())})
        t = (t.group_by(["ok", "code"]).aggregate([([], "count_all")])
             .select(["ok", "code"]))
        okv = np.asarray(t.column("ok"), dtype=np.int64)
        kb = (_mix64_np(okv.view(np.uint64)) % np.uint64(nb)) \
            .astype(np.int64)
        return t.append_column("_kb", pa.array(kb, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ok = group["ok"].to_numpy(dtype=np.int64)
        code = group["code"].to_numpy(dtype=np.int64)
        order = np.lexsort((code, ok))
        ok, code = ok[order], code[order]
        # global distinct (order, brand): block partials can overlap
        keep = np.concatenate(([True], (ok[1:] != ok[:-1])
                               | (code[1:] != code[:-1])))
        ok, code = ok[keep], code[keep]
        pc = _segment_pair_counts(ok, code)
        ub, bcnt = np.unique(code, return_counts=True)
        n_orders = np.unique(ok).size
        return pd.DataFrame({
            "a": np.concatenate([pc["a"], ub, [-1]]),
            "b": np.concatenate([pc["b"], np.zeros(ub.size, np.int64),
                                 [-1]]),
            "cnt": np.concatenate([pc["cnt"],
                                   bcnt.astype(np.int64), [n_orders]]),
            "kind": np.concatenate([np.full(pc["a"].size, 2, np.int8),
                                    np.ones(ub.size, np.int8), [0]]),
        })

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    rows = (li.map_batches(prep, batch_format="pyarrow")
            .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
            .to_pandas())
    empty = pa.table({"brand_a": pa.array([], pa.string()),
                      "brand_b": pa.array([], pa.string()),
                      "cooc": pa.array([], pa.int64()),
                      "lift_ppm": pa.array([], pa.int64())})
    if len(rows) == 0:
        return empty
    n_orders = int(rows.loc[rows["kind"] == 0, "cnt"].sum())
    sup = (rows[rows["kind"] == 1].groupby("a")["cnt"].sum())
    pairs = (rows[rows["kind"] == 2].groupby(["a", "b"], as_index=False)
             ["cnt"].sum())
    pairs = pairs[pairs["cnt"] >= _BASKET_MIN_SUPPORT]
    if len(pairs) == 0:
        return empty
    lift = [int(c) * n_orders * 1_000_000 // (int(sup[a]) * int(sup[b]))
            for a, b, c in zip(pairs["a"], pairs["b"], pairs["cnt"])]
    out = pd.DataFrame({
        "brand_a": [uniq[int(a)] for a in pairs["a"]],
        "brand_b": [uniq[int(b)] for b in pairs["b"]],
        "cooc": pairs["cnt"].astype("int64").to_numpy(),
        "lift_ppm": np.asarray(lift, dtype=np.int64),
    }).sort_values(["brand_a", "brand_b"]).reset_index(drop=True)
    return pa.table({
        "brand_a": pa.array(out["brand_a"], pa.string()),
        "brand_b": pa.array(out["brand_b"], pa.string()),
        "cooc": pa.array(out["cooc"], pa.int64()),
        "lift_ppm": pa.array(out["lift_ppm"], pa.int64())})


_MARKET_BASKET_SQL = f"""
WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON p_partkey = l_partkey),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS no FROM ob),
s AS (SELECT p_brand, COUNT(*) AS s FROM ob GROUP BY 1),
pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                 COUNT(*) AS cooc
          FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                             AND a.p_brand < b.p_brand
          GROUP BY 1, 2 HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT})
SELECT brand_a, brand_b, CAST(cooc AS BIGINT) AS cooc,
       CAST(CAST(cooc AS HUGEINT) * n.no * 1000000
            // (CAST(sa.s AS HUGEINT) * sb.s) AS BIGINT) AS lift_ppm
FROM pairs, n
JOIN s sa ON sa.p_brand = pairs.brand_a
JOIN s sb ON sb.p_brand = pairs.brand_b
ORDER BY brand_a, brand_b
"""


def events_chi2_ab(sf_dir: str):
    """A/B significance row: split users into variants by ``user_id %
    2``, conversion = any purchase event, and report the 2x2
    contingency cells plus the chi-square statistic in ppm — the exact
    integer ``N * (ad-bc)^2 * 10^6 // (n_a * n_b * conv * nonconv)``
    (Python bigints here, HUGEINT in the oracle; exact to ~10^9 users
    per cell before the oracle's HUGEINT would saturate). Scale shape:
    per-block user partials -> ONE groupby-Max shuffle -> map-side cell
    partials; the driver folds 4 integers."""
    from ray.data.aggregate import Max

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        conv = (np.asarray(batch.column("event_type").to_pandas())
                == "purchase").astype(np.int64)
        t = pa.table({"user_id": pa.array(u, pa.int64()),
                      "conv": pa.array(conv, pa.int64())})
        return (t.group_by("user_id").aggregate([("conv", "max")])
                .rename_columns(["user_id", "conv"]))

    def cells(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        cv = np.asarray(batch.column("conv"), dtype=np.int64)
        b_side = (u % 2).astype(bool)
        return pa.table({
            "n_a": pa.array([int((~b_side).sum())], pa.int64()),
            "conv_a": pa.array([int(cv[~b_side].sum())], pa.int64()),
            "n_b": pa.array([int(b_side.sum())], pa.int64()),
            "conv_b": pa.array([int(cv[b_side].sum())], pa.int64())})

    parts = (ev.map_batches(prep, batch_format="pyarrow")
             .groupby("user_id").aggregate(Max("conv", alias_name="conv"))
             .map_batches(cells, batch_format="pyarrow").to_pandas())
    n_a = int(parts["n_a"].sum())
    conv_a = int(parts["conv_a"].sum())
    n_b = int(parts["n_b"].sum())
    conv_b = int(parts["conv_b"].sum())
    n = n_a + n_b
    conv = conv_a + conv_b
    den = n_a * n_b * conv * (n - conv)
    if den == 0:
        chi2 = 0
    else:
        diff = conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b
        chi2 = n * diff * diff * 1_000_000 // den
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "conv_a": pa.array([conv_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "conv_b": pa.array([conv_b], pa.int64()),
        "chi2_ppm": pa.array([chi2], pa.int64())})


_CHI2_AB_SQL = """
WITH u AS (SELECT user_id,
                  MAX(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS conv
           FROM events GROUP BY 1),
c AS (SELECT
    SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
    SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS conv_a,
    SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS n_b,
    SUM(CASE WHEN user_id % 2 <> 0 THEN conv ELSE 0 END) AS conv_b
  FROM u)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
       CASE WHEN n_a * n_b * (conv_a + conv_b)
                 * (n_a + n_b - conv_a - conv_b) = 0 THEN 0
            ELSE CAST(CAST(n_a + n_b AS HUGEINT)
                 * (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b)
                 * (conv_a * (n_b - conv_b) - (n_a - conv_a) * conv_b)
                 * 1000000
                 // (CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
                     * (n_a + n_b - conv_a - conv_b)) AS BIGINT)
       END AS chi2_ppm
FROM c
"""


def crawl_robots_gate(sf_dir: str):
    """Robots-gated crawl (north_rule's robots component as a driver
    row, not just pytest): every host serves a robots.txt disallowing
    the /p/0001 path prefix (doc_ids 100-199), the crawl runs with
    ``obey_robots=True``, and the output is the fetched URL set + BFS
    depth. Blocked pages are rejected at ADMISSION (crawl.py robots
    gate), so their subtrees are reachable only around them — the
    oracle replays that as a recursive CTE whose edge step skips
    blocked destinations."""
    from ..sources.synthetic_site import NUM_HOSTS, build_site_table, \
        page_url
    from .crawl import CrawlJob, run_crawl

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    body = "User-agent: *\nDisallow: /p/0001\n"
    robots_rows = pa.table({
        "url": [f"http://site{h}.test/robots.txt"
                for h in range(NUM_HOSTS)],
        "host": [f"site{h}.test" for h in range(NUM_HOSTS)],
        "status_code": pa.array([200] * NUM_HOSTS, pa.int32()),
        "html": [body] * NUM_HOSTS,
        "links": pa.array([[]] * NUM_HOSTS, pa.list_(pa.string())),
        "content_bytes": pa.array([len(body)] * NUM_HOSTS, pa.int64()),
    })
    pages = pa.concat_tables([pages, robots_rows])
    job = CrawlJob(job_id="rg", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000, obey_robots=True)
    import ray

    res = run_crawl(job, pages, use_ray=ray.is_initialized(),
                    ray_wave_threshold=64)
    df = res.order.to_pandas()[["canonical_url", "depth"]]
    out = df.groupby("canonical_url", as_index=False)["depth"].min()
    out = out.rename(columns={"canonical_url": "url"})
    return pa.Table.from_pandas(out, preserve_index=False)


_CRAWL_ROBOTS_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20 AND e.dst NOT BETWEEN 100 AND 199
)
SELECT 'http://site' || CAST(id % {_HOSTS} AS VARCHAR) || '.test/p/' ||
       lpad(CAST(id AS VARCHAR), 6, '0') AS url,
       CAST(MIN(depth) AS INT) AS depth
FROM reach GROUP BY id
"""


def embeddings_outliers(sf_dir: str):
    """Embedding-space anomaly detection: integer squared-L2 distance
    to the vector's own kmeans centroid, global top-20 (ties to the
    smaller vec_id) — stages/similarity.py::kmeans_outliers. Map-side
    local top-k + tiny driver merge; oracle = the kmeans CTE chain +
    distance ORDER BY."""
    rd = _rd()
    from ..stages.similarity import kmeans_outliers

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return kmeans_outliers(ds, k_out=20, n_clusters=_KMEANS_K,
                           iters=_KMEANS_ITERS)


def _outliers_sql(k_out: int = 20, k: int = 8, iters: int = 3,
                  scale: int = 100, offset: int = 1000) -> str:
    chain = _kmeans_ctes(k, iters, scale, offset)
    dist = ("list_sum(list_transform(list_zip(v.q, c.q), "
            "s -> (s[1]-s[2])*(s[1]-s[2])))")
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH {chain},
d AS (SELECT o.vec_id, o.cluster, {dist} AS d2
      FROM out o JOIN qv v USING (vec_id)
      JOIN cent{iters}f c ON c.cluster = o.cluster)
SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS d2 FROM d
ORDER BY d2 DESC, vec_id LIMIT {k_out}
"""


def orders_ltv_cohorts(sf_dir: str):
    """Cohort LTV triangle over orders: cohort = customer's first
    30-day period, exact cents revenue per (cohort, offset) —
    stages/window.py::revenue_cohorts (one customer-bucketed shuffle of
    block partials). Exact SQL oracle."""
    from ..stages.window import revenue_cohorts

    rd = _rd()
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])
    return revenue_cohorts(orders)


_LTV_COHORTS_SQL = """
WITH p AS (SELECT o_custkey,
                  epoch_us(o_orderdate) // 2592000000000 AS period,
                  CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
                      AS cents
           FROM orders),
fw AS (SELECT o_custkey, MIN(period) AS cohort_period
       FROM p GROUP BY o_custkey)
SELECT fw.cohort_period,
       p.period - fw.cohort_period AS period_offset,
       CAST(SUM(p.cents) AS BIGINT) AS cents
FROM p JOIN fw USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""


_PHRASE = ("table", "scan")


def docs_phrase_search(sf_dir: str):
    """Positional phrase search (the proximity-query IR op the scoring
    index can't answer): docs where token "table" is IMMEDIATELY
    followed by "scan", with the exact occurrence count. Positions
    filter at tokenize time (only the two query terms' postings ever
    leave the map side), adjacency is one shifted-equality numpy mask
    per doc — no shuffle at all, the driver folds per-block (doc, hits)
    partials bounded by matching docs. Exact SQL oracle (positional
    self-join)."""
    rd = _rd()
    w1, w2 = _PHRASE

    def find(batch: pa.Table) -> pa.Table:
        ids_out, hits_out = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            words = np.asarray(t.split(), dtype=object)
            if words.size < 2:
                continue
            n = int(((words[:-1] == w1) & (words[1:] == w2)).sum())
            if n:
                ids_out.append(d)
                hits_out.append(n)
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "hits": pa.array(hits_out, pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(find, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "hits": pa.array([], pa.int64())})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(out["doc_id"].astype("int64"),
                                        pa.int64()),
                     "hits": pa.array(out["hits"].astype("int64"),
                                      pa.int64())})


_PHRASE_SQL = rf"""
WITH w AS (SELECT doc_id,
            list_filter(regexp_split_to_array(text, '\s+'),
                        x -> x <> '') AS w
     FROM documents),
hits AS (SELECT doc_id, COUNT(*) AS hits
         FROM (SELECT doc_id, i FROM w, UNNEST(range(1, len(w))) AS t(i)
               WHERE w[i] = '{_PHRASE[0]}' AND w[i+1] = '{_PHRASE[1]}')
         GROUP BY doc_id)
SELECT doc_id, CAST(hits AS BIGINT) AS hits FROM hits ORDER BY doc_id
"""


def events_top_paths(sf_dir: str):
    """Top-10 consecutive event-type trigrams per user stream (order-2
    user paths, stages/window.py::top_paths): one fat-bucket shuffle,
    coded 3-tuple np.unique per bucket, |types|^3-bounded driver fold.
    Oracle: two LEAD() windows."""
    from ..stages.window import top_paths

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])
    return top_paths(ev, k=10)


_TOP_PATHS_SQL = """
WITH seq AS (
  SELECT event_type AS t1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t3
  FROM events),
paths AS (SELECT t1, t2, t3, COUNT(*) AS cnt FROM seq
          WHERE t3 IS NOT NULL GROUP BY 1, 2, 3)
SELECT t1, t2, t3, CAST(cnt AS BIGINT) AS cnt FROM paths
QUALIFY row_number() OVER (ORDER BY cnt DESC, t1, t2, t3) <= 10
ORDER BY cnt DESC, t1, t2, t3
"""


def docs_postings_size(sf_dir: str):
    """Index-storage estimation: top-10 terms by the varint byte cost
    of their delta-gap postings lists (Zobel/Moffat index-compression
    model; stages/text_analysis.py::postings_size_topk). Term
    fat-bucket shuffle, local top-k out. Exact SQL oracle (LAG gaps +
    CASE varint widths)."""
    from ..stages.text_analysis import postings_size_topk

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return postings_size_topk(ds, k=10)


def _postings_size_sql(k: int = 10) -> str:
    case = " ".join(
        f"WHEN gap < {1 << (7 * (i + 1))} THEN {i + 1}"
        for i in range(8))
    return rf"""
WITH toks AS (SELECT DISTINCT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS tok
      FROM documents),
g AS (SELECT tok, doc_id - LAG(doc_id, 1, -1)
                 OVER (PARTITION BY tok ORDER BY doc_id) AS gap
      FROM toks),
b AS (SELECT tok AS term, COUNT(*) AS df,
             SUM(CASE {case} ELSE 9 END) AS bytes
      FROM g GROUP BY tok)
SELECT term, CAST(df AS BIGINT) AS df, CAST(bytes AS BIGINT) AS bytes
FROM b
QUALIFY row_number() OVER (ORDER BY bytes DESC, term) <= {k}
ORDER BY bytes DESC, term
"""


def docs_neardup_survivor(sf_dir: str):
    """Survivorship rules (the entity-resolution counterpart of
    first-wins dedup): per MinHash near-dup cluster, keep the member
    with the MOST content (max n_chars, ties to the smaller doc_id) —
    what curation pipelines actually do ("keep the longest"), vs
    docs_neardup_keep's min-id rule. Cluster members are O(verified
    pairs) << corpus, so their quality column is fetched with one
    broadcast-filtered slim pass; the per-cluster argmax folds a
    pair-bounded table."""
    import ray

    from ..stages.dedup import (_cached_get, minhash_lsh_pairs,
                                neardup_components)

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    comps = neardup_components(minhash_lsh_pairs(ds, threshold=0.5)) \
        .to_pandas()
    empty = pa.table({"cluster_rep": pa.array([], pa.int64()),
                      "survivor_id": pa.array([], pa.int64()),
                      "n_members": pa.array([], pa.int64()),
                      "survivor_chars": pa.array([], pa.int64())})
    if len(comps) == 0:
        return empty
    member_ref = ray.put(pa.array(comps["doc_id"].astype("int64"),
                                  pa.int64()))

    def member_chars(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"),
                        value_set=_cached_get(member_ref))
        t = batch.filter(mask)
        return pa.table({"doc_id": pc.cast(t.column("doc_id"),
                                           pa.int64()),
                         "n_chars": pc.cast(t.column("n_chars"),
                                            pa.int64())})

    slim = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    chars = (slim.map_batches(member_chars, batch_format="pyarrow")
             .to_pandas())
    m = comps.merge(chars, on="doc_id")
    m = m.sort_values(["cluster_rep", "n_chars", "doc_id"],
                      ascending=[True, False, True])
    surv = m.groupby("cluster_rep", as_index=False).first()
    cnt = (m.groupby("cluster_rep", as_index=False)
           .size().rename(columns={"size": "n_members"}))
    fin = surv.merge(cnt, on="cluster_rep").sort_values("cluster_rep")
    return pa.table({
        "cluster_rep": pa.array(fin["cluster_rep"].astype("int64"),
                                pa.int64()),
        "survivor_id": pa.array(fin["doc_id"].astype("int64"),
                                pa.int64()),
        "n_members": pa.array(fin["n_members"].astype("int64"),
                              pa.int64()),
        "survivor_chars": pa.array(fin["n_chars"].astype("int64"),
                                   pa.int64())})


def _neardup_survivor_sql() -> str:
    from . import oracle_kernels as _ok

    return f"""{_ok.U64_PRELUDE}
WITH RECURSIVE {_ok._minhash_ctes()},
edges AS (SELECT a, b FROM scored WHERE (u = 0) OR (2 * i >= u)),
sym AS (SELECT a AS x, b AS y FROM edges
        UNION ALL SELECT b, a FROM edges),
reach(x, y) AS (
    SELECT x, y FROM sym
    UNION
    SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
),
comp AS (SELECT x AS doc_id, least(x, min(y)) AS rep
         FROM reach GROUP BY x),
members AS (SELECT c.doc_id, c.rep, d.n_chars
            FROM comp c JOIN documents d USING (doc_id)),
surv AS (SELECT rep, doc_id, n_chars FROM members
         QUALIFY row_number() OVER (PARTITION BY rep
                 ORDER BY n_chars DESC, doc_id) = 1),
cnt AS (SELECT rep, COUNT(*) AS n_members FROM comp GROUP BY rep)
SELECT s.rep AS cluster_rep, s.doc_id AS survivor_id,
       CAST(c.n_members AS BIGINT) AS n_members,
       CAST(s.n_chars AS BIGINT) AS survivor_chars
FROM surv s JOIN cnt c USING (rep) ORDER BY cluster_rep
"""


_SLO_THRESHOLD_PPM = 400_000


def events_slo_breach(sf_dir: str):
    """Observability row: hourly error-budget burn — hours whose
    integer error rate exceeds the SLO threshold
    (``errors * 10^6 // total > 400000`` ppm), with the exact cells.
    Map-side per-block (hour, total, errors) Arrow partials; the merge
    folds a timespan-bounded hours table, never events."""
    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        from ..stages.window import _epoch_us

        hour = _epoch_us(batch.column("ts")) // 3_600_000_000
        err = (np.asarray(batch.column("event_type").to_pandas())
               == "error").astype(np.int64)
        t = pa.table({"hour": pa.array(hour, pa.int64()),
                      "err": pa.array(err, pa.int64())})
        return (t.group_by("hour")
                .aggregate([([], "count_all"), ("err", "sum")])
                .rename_columns(["hour", "total", "errors"]))

    parts = pa.concat_tables(
        ev.map_batches(prep, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    empty = pa.table({"hour": pa.array([], pa.int64()),
                      "total": pa.array([], pa.int64()),
                      "errors": pa.array([], pa.int64()),
                      "err_ppm": pa.array([], pa.int64())})
    if parts.num_rows == 0:
        return empty
    df = (parts.group_by("hour")
          .aggregate([("total", "sum"), ("errors", "sum")])
          .rename_columns(["hour", "total", "errors"]).to_pandas()
          .sort_values("hour"))
    ppm = (df["errors"].astype("int64") * 1_000_000
           // df["total"].astype("int64"))
    df = df.assign(err_ppm=ppm)
    df = df[df["err_ppm"] > _SLO_THRESHOLD_PPM].reset_index(drop=True)
    return pa.table({
        "hour": pa.array(df["hour"].astype("int64"), pa.int64()),
        "total": pa.array(df["total"].astype("int64"), pa.int64()),
        "errors": pa.array(df["errors"].astype("int64"), pa.int64()),
        "err_ppm": pa.array(df["err_ppm"].astype("int64"), pa.int64())})


_SLO_BREACH_SQL = f"""
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour,
                  COUNT(*) AS total,
                  SUM(CASE WHEN event_type = 'error'
                           THEN 1 ELSE 0 END) AS errors
           FROM events GROUP BY 1)
SELECT hour, CAST(total AS BIGINT) AS total,
       CAST(errors AS BIGINT) AS errors,
       CAST(errors * 1000000 // total AS BIGINT) AS err_ppm
FROM h WHERE errors * 1000000 // total > {_SLO_THRESHOLD_PPM}
ORDER BY hour
"""


def orders_pareto_share(sf_dir: str):
    """Pareto concentration: the exact revenue share (ppm) of the top
    20% of customers — distributed ORDER STATISTICS with NO global
    sort: per-customer cents via one groupby, then the k-th largest
    value read off the merged value histogram (the group_quantiles
    contract: histogram size is value-distinctness-bounded), and the
    top-k sum reconstructed as ``sum(v > cut) + (k - n_gt) * cut`` —
    tie-invariant, so the oracle's row_number() ranking sums to the
    identical total."""
    from ray.data.aggregate import Sum

    rd = _rd()
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch.column("o_totalprice"),
                                   dtype=np.float64) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "cents": pa.array(cents, pa.int64())})
        return (t.group_by("o_custkey").aggregate([("cents", "sum")])
                .rename_columns(["o_custkey", "cents"]))

    peru = (orders.map_batches(prep, batch_format="pyarrow")
            .groupby("o_custkey")
            .aggregate(Sum("cents", alias_name="cents")).materialize())

    def hist(batch: pa.Table) -> pa.Table:
        return (batch.select(["cents"]).group_by("cents")
                .aggregate([([], "count_all")])
                .rename_columns(["cents", "n"]))

    parts = pa.concat_tables(
        peru.map_batches(hist, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    empty = pa.table({c: pa.array([], pa.int64()) for c in
                      ("n_customers", "k", "cut_cents", "top_cents",
                       "total_cents", "share_ppm")})
    if parts.num_rows == 0:
        return empty
    h = (parts.group_by("cents").aggregate([("n", "sum")])
         .rename_columns(["cents", "n"]).to_pandas()
         .sort_values("cents", ascending=False))
    v = h["cents"].to_numpy(np.int64)
    c = h["n"].to_numpy(np.int64)
    n_cust = int(c.sum())
    k = (n_cust + 4) // 5  # integer ceil(n / 5)
    cum = c.cumsum()
    idx = int(np.searchsorted(cum, k, side="left"))
    cut = int(v[idx])
    n_gt = int(cum[idx - 1]) if idx > 0 else 0
    top = int((v[:idx] * c[:idx]).sum()) + (k - n_gt) * cut
    total = int((v * c).sum())
    return pa.table({
        "n_customers": pa.array([n_cust], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "cut_cents": pa.array([cut], pa.int64()),
        "top_cents": pa.array([top], pa.int64()),
        "total_cents": pa.array([total], pa.int64()),
        "share_ppm": pa.array([top * 1_000_000 // total], pa.int64())})


_PARETO_SQL = """
WITH c AS (SELECT o_custkey,
                  CAST(SUM(CAST(round_even(o_totalprice * 100, 0)
                                AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
n AS (SELECT COUNT(*) AS n, (COUNT(*) + 4) // 5 AS k FROM c),
r AS (SELECT cents,
             row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn
      FROM c),
t AS (SELECT SUM(r.cents) AS top, MIN(r.cents) AS cut
      FROM r, n WHERE r.rn <= n.k),
tot AS (SELECT SUM(cents) AS total FROM c)
SELECT CAST(n.n AS BIGINT) AS n_customers, CAST(n.k AS BIGINT) AS k,
       CAST(t.cut AS BIGINT) AS cut_cents,
       CAST(t.top AS BIGINT) AS top_cents,
       CAST(tot.total AS BIGINT) AS total_cents,
       CAST(t.top * 1000000 // tot.total AS BIGINT) AS share_ppm
FROM n, t, tot
WHERE n.n > 0
"""


def docs_term_drift(sf_dir: str):
    """Data-drift monitoring: per-term presence chi-square between the
    two corpus halves (doc_id parity = the two 'snapshots'), top-10
    most drifted terms. Exact integer chi2 ppm per term (Python
    bigints / HUGEINT — the events_chi2_ab cell formula applied
    per term). Map-side distinct-(term, split) Arrow partials; the
    driver folds a vocabulary-sized table."""
    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def prep(batch: pa.Table) -> pa.Table:
        rows_t, rows_s = [], []
        d_ids = batch.column("doc_id").to_pylist()
        for d, t in zip(d_ids, batch.column("text").to_pylist()):
            toks = set(t.split())
            rows_t.extend(toks)
            rows_s.extend([d % 2] * len(toks))
        t = pa.table({"term": pa.array(rows_t, pa.string()),
                      "split": pa.array(rows_s, pa.int64()),
                      "kind": pa.array([1] * len(rows_t), pa.int8())})
        t = (t.group_by(["term", "split", "kind"])
             .aggregate([([], "count_all")])
             .rename_columns(["term", "split", "kind", "n"]))
        # per-split DOC counts ride the same pass (kind 0) — empty-text
        # docs count here even though they emit no term rows
        sp = np.asarray(d_ids, dtype=np.int64) % 2
        docrows = pa.table({
            "term": pa.array(["", ""], pa.string()),
            "split": pa.array([0, 1], pa.int64()),
            "kind": pa.array([0, 0], pa.int8()),
            "n": pa.array([int((sp == 0).sum()), int((sp == 1).sum())],
                          pa.int64())})
        return pa.concat_tables([t, docrows])

    parts = pa.concat_tables(
        ds.map_batches(prep, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    empty = pa.table({"term": pa.array([], pa.string()),
                      "df_a": pa.array([], pa.int64()),
                      "df_b": pa.array([], pa.int64()),
                      "chi2_ppm": pa.array([], pa.int64())})
    if parts.num_rows == 0:
        return empty
    folded = (parts.group_by(["term", "split", "kind"])
              .aggregate([("n", "sum")])
              .rename_columns(["term", "split", "kind", "n"])
              .to_pandas())
    docs = folded[folded["kind"] == 0]
    n_a = int(docs.loc[docs["split"] == 0, "n"].sum())
    n_b = int(docs.loc[docs["split"] == 1, "n"].sum())
    df = folded[folded["kind"] == 1]
    piv = df.pivot_table(index="term", columns="split", values="n",
                         aggfunc="sum", fill_value=0)
    terms = piv.index.tolist()
    a = piv.get(0, pd.Series(0, index=piv.index)).astype(int).tolist()
    b = piv.get(1, pd.Series(0, index=piv.index)).astype(int).tolist()
    rows = []
    for t_, da, db_ in zip(terms, a, b):
        n = n_a + n_b
        den = n_a * n_b * (da + db_) * (n - da - db_)
        if den == 0:
            chi2 = 0
        else:
            diff = da * (n_b - db_) - (n_a - da) * db_
            chi2 = n * diff * diff * 1_000_000 // den
        rows.append((t_, da, db_, chi2))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:10]
    return pa.table({
        "term": pa.array([r[0] for r in rows], pa.string()),
        "df_a": pa.array([r[1] for r in rows], pa.int64()),
        "df_b": pa.array([r[2] for r in rows], pa.int64()),
        "chi2_ppm": pa.array([r[3] for r in rows], pa.int64())})


_TERM_DRIFT_SQL = r"""
WITH toks AS (SELECT DISTINCT doc_id,
               unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS term
      FROM documents),
nn AS (SELECT SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
              SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS nb
       FROM documents),
cells AS (SELECT term,
        SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS da,
        SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS db
    FROM toks GROUP BY 1),
scored AS (SELECT term, da, db,
    CASE WHEN na * nb * (da + db) * (na + nb - da - db) = 0 THEN 0
         ELSE CAST(CAST(na + nb AS HUGEINT)
              * (da * (nb - db) - (na - da) * db)
              * (da * (nb - db) - (na - da) * db) * 1000000
              // (CAST(na AS HUGEINT) * nb * (da + db)
                  * (na + nb - da - db)) AS BIGINT)
    END AS chi2_ppm
  FROM cells, nn)
SELECT term, CAST(da AS BIGINT) AS df_a, CAST(db AS BIGINT) AS df_b,
       chi2_ppm
FROM scored
QUALIFY row_number() OVER (ORDER BY chi2_ppm DESC, term) <= 10
ORDER BY chi2_ppm DESC, term
"""


_KCORE_K, _KCORE_ROUNDS = 4, 4


def docs_kcore(sf_dir: str):
    """Fixed-round k-core peeling of the undirected site graph
    (stages/graph.py::kcore_rounds): 4 peel rounds at k=4 (the graph's
    3-core is the whole graph — k=4 actually peels), output =
    surviving nodes with their final-round in-core degree. Dense
    broadcast mask under the node-count guard (hits_int duality);
    unrolled-CTE oracle."""
    from ..stages.graph import kcore_rounds

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return kcore_rounds(n, k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    parts = [f"""
WITH n AS (SELECT COUNT(*) AS c FROM documents),
edges AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT doc_id AS a, 2 * doc_id + 1 AS b FROM documents, n
    WHERE 2 * doc_id + 1 < n.c
    UNION ALL
    SELECT doc_id, 2 * doc_id + 2 FROM documents, n
    WHERE 2 * doc_id + 2 < n.c
    UNION ALL
    SELECT 2 * doc_id + 1, 2 * doc_id + 2 FROM documents, n
    WHERE 2 * doc_id + 2 < n.c
    UNION ALL
    SELECT least(doc_id, (7 * doc_id + 3) % n.c),
           greatest(doc_id, (7 * doc_id + 3) % n.c) FROM documents, n
    WHERE (7 * doc_id + 3) % n.c <> doc_id)),
a0 AS (SELECT doc_id AS node FROM documents)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
d{r} AS (SELECT node, COUNT(*) AS d FROM (
    SELECT e.a AS node FROM edges e
    JOIN a{r - 1} x ON x.node = e.a JOIN a{r - 1} y ON y.node = e.b
    UNION ALL
    SELECT e.b FROM edges e
    JOIN a{r - 1} x ON x.node = e.a JOIN a{r - 1} y ON y.node = e.b)
  GROUP BY 1),
a{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {k})""")
    parts.append(f"""
SELECT a.node AS doc_id, CAST(d.d AS BIGINT) AS deg
FROM a{rounds} a JOIN d{rounds} d USING (node) ORDER BY doc_id
""")
    return "".join(parts)


_PPR_SEED_MOD, _PPR_ITERS = 50, 8


def docs_ppr(sf_dir: str):
    """Personalized PageRank from the deterministic seed set
    (doc_id % 50 == 0) — the crawl-prioritization score (proximity to
    seeds), stages/graph.py::ppr_int. Same one-map + one-groupby-Sum
    iteration shape as pagerank_int; unrolled-CTE oracle with the base
    term gated on seed membership."""
    from ..stages.graph import ppr_int

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return ppr_int(n, seed_mod=_PPR_SEED_MOD, iters=_PPR_ITERS,
                   scale=_PAGERANK_SCALE)


def _ppr_sql(seed_mod: int = _PPR_SEED_MOD, iters: int = _PPR_ITERS,
             scale: int = _PAGERANK_SCALE) -> str:
    parts = [f"""
WITH n AS (SELECT COUNT(*) AS c,
                  (COUNT(*) + {seed_mod} - 1) // {seed_mod} AS ns
           FROM documents),
edges AS MATERIALIZED (
{_EDGES_CTE_BODY}),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT doc_id AS node,
              CAST(CASE WHEN doc_id % {seed_mod} = 0
                        THEN {scale} // n.ns ELSE 0 END AS BIGINT) AS r
       FROM documents, n)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
s{k} AS (
  SELECT e.dst AS node, SUM(r.r // d.deg) AS s
  FROM edges e JOIN r{k - 1} r ON r.node = e.src
  JOIN deg d ON d.src = e.src GROUP BY e.dst),
r{k} AS MATERIALIZED (
  SELECT p.node,
         CAST((CASE WHEN p.node % {seed_mod} = 0
                    THEN 15 * ({scale} // n.ns) ELSE 0 END
               + 85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
  FROM (SELECT doc_id AS node FROM documents) p CROSS JOIN n
  LEFT JOIN s{k} s ON s.node = p.node)""")
    parts.append(f"""
SELECT node AS doc_id, r AS rank_scaled FROM r{iters} ORDER BY doc_id
""")
    return "".join(parts)


def crawl_recrawl_delta(sf_dir: str):
    """Incremental re-crawl change detection (the delta pass every
    production crawler runs): crawl the site twice — the second run
    serves MUTATED content for doc_id % 13 == 0 (uppercased text) —
    and diff the two document sets by span-content hash. Output: one
    row per reachable URL with ``changed`` 0/1. The oracle replays the
    reachability CTE x the mutation rule, so a hash that misses a real
    content change (or flags a spurious one) fails the row."""
    import hashlib
    import os
    import tempfile

    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl
    import ray

    def span_hash(docs: pa.Table) -> dict:
        out = {}
        for url, spans in zip(docs.column("url").to_pylist(),
                              docs.column("spans").to_pylist()):
            if url in out:
                continue
            blob = "\x1f".join(s["text"] or "" for s in spans)
            out[url] = hashlib.md5(blob.encode()).hexdigest()
        return out

    def run(pages) -> dict:
        job = CrawlJob(job_id="rd", seed_urls=[page_url(0)],
                       strategy="all", max_depth=20, limit=50_000)
        res = run_crawl(job, pages, use_ray=ray.is_initialized(),
                        ray_wave_threshold=64)
        return span_hash(res.documents)

    h1 = run(build_site_table(f"{sf_dir}/documents.parquet"))
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = docs.column("text").to_pylist()
    ids = docs.column("doc_id").to_pylist()
    mutated = [t.upper() if d % 13 == 0 else t
               for d, t in zip(ids, texts)]
    docs = docs.set_column(docs.schema.get_field_index("text"), "text",
                           pa.array(mutated, pa.string()))
    with tempfile.TemporaryDirectory() as tmp:
        p2 = os.path.join(tmp, "documents.parquet")
        pq.write_table(docs, p2)
        h2 = run(build_site_table(p2))
    urls = sorted(h1)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "changed": pa.array([int(h1[u] != h2.get(u, "")) for u in urls],
                            pa.int64())})


_RECRAWL_DELTA_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
),
ids AS (SELECT DISTINCT id FROM reach)
SELECT 'http://site' || CAST(ids.id % {_HOSTS} AS VARCHAR) || '.test/p/'
       || lpad(CAST(ids.id AS VARCHAR), 6, '0') AS url,
       CAST(CASE WHEN ids.id % 13 = 0
                 AND d.text <> upper(d.text) THEN 1 ELSE 0 END
            AS BIGINT) AS changed
FROM ids JOIN documents d ON d.doc_id = ids.id
ORDER BY url
"""


def embeddings_bq_recall(sf_dir: str):
    """Binary-quantization evaluation: recall@10 of 64x-compressed
    sign-bit Hamming search vs the exact cosine top-10
    (stages/similarity.py::bq_recall). Map-side SWAR-popcount local
    top-k, zero shuffle; the oracle packs the same codes with
    SUM(1 << (dim-1)) and ranks by bit_count(xor(...))."""
    rd = _rd()
    from ..stages.similarity import bq_recall

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    queries, qids = _load_queries(sf_dir)
    return bq_recall(ds, queries, qids, k=_KNN_K)


def _bq_recall_sql(k: int = 10, scale: int = 100,
                   n_queries: int = 5) -> str:
    brute = _KNN_SQL.strip()
    return f"""
WITH qv AS (SELECT vec_id, list_transform(embedding,
        x -> CAST(round_even(CAST(x AS DOUBLE) * {scale}, 0) AS BIGINT))
        AS q FROM embeddings),
codes AS MATERIALIZED (
  SELECT vec_id,
         CAST(SUM(CASE WHEN val > 0
                       THEN CAST(1 AS HUGEINT) << (dim - 1)
                       ELSE 0 END) AS UBIGINT) AS w
  FROM (SELECT vec_id, generate_subscripts(q, 1) AS dim,
               unnest(q) AS val FROM qv)
  GROUP BY vec_id),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id
         LIMIT {n_queries}),
bq AS (SELECT qc.vec_id AS query_id, c.vec_id AS neighbor_id,
              bit_count(xor(qc.w, c.w)) AS ham
       FROM codes qc JOIN qids USING (vec_id) CROSS JOIN codes c),
bqtop AS (SELECT query_id, neighbor_id FROM bq
          QUALIFY row_number() OVER (PARTITION BY query_id
                  ORDER BY ham, neighbor_id) <= {k}),
brute AS ({brute}),
hits AS (SELECT b.query_id, COUNT(*) AS inter
         FROM brute b JOIN bqtop t
           ON t.query_id = b.query_id
          AND t.neighbor_id = b.neighbor_id
         GROUP BY 1)
SELECT q.vec_id AS query_id,
       CAST(COALESCE(h.inter, 0) * 1000000 // {k} AS BIGINT)
           AS recall_ppm
FROM qids q LEFT JOIN hits h ON h.query_id = q.vec_id
ORDER BY query_id
"""


def embeddings_lsh_multiprobe(sf_dir: str):
    """Multi-probe LSH ANN (Lv et al. 2007): 16 sign planes -> one
    bucket table; each query probes its bucket + the 3 lowest-|margin|
    single-bit flips, exact-cosine reranks. Map-side codes + isin
    candidate gate + local top-k, no shuffle
    (stages/similarity.py::lsh_multiprobe_knn). The oracle replays
    planes as literals, margins, probe sets and the rerank."""
    rd = _rd()
    from ..stages.similarity import lsh_multiprobe_knn

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    queries, qids = _load_queries(sf_dir)
    return lsh_multiprobe_knn(ds, queries, qids, k=_KNN_K)


def _lsh_multiprobe_sql(k: int = _KNN_K, num_planes: int = 16,
                        probes: int = 3, seed: int = 7, dim: int = 64,
                        n_queries: int = _KNN_QUERIES) -> str:
    planes = np.random.default_rng(seed).standard_normal((num_planes, dim))
    vals = ", ".join(
        f"({p}, {j}, {planes[p, j]!r})"
        for p in range(num_planes) for j in range(dim))
    return f"""
WITH planes(p, j, w) AS (VALUES {vals}),
ev AS (
  SELECT vec_id, i - 1 AS j, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
dots AS MATERIALIZED (
  SELECT e.vec_id, pl.p, SUM(e.x * pl.w) AS dot
  FROM ev e JOIN planes pl ON pl.j = e.j GROUP BY e.vec_id, pl.p),
codes AS MATERIALIZED (
  SELECT vec_id,
         SUM(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS code
  FROM dots GROUP BY vec_id),
qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id
         LIMIT {n_queries}),
flips AS (
  SELECT d.vec_id AS query_id, d.p FROM dots d JOIN qids q USING (vec_id)
  QUALIFY row_number() OVER (PARTITION BY d.vec_id
                             ORDER BY abs(d.dot), d.p) <= {probes}),
probeset AS (
  SELECT c.vec_id AS query_id, c.code FROM codes c JOIN qids USING (vec_id)
  UNION ALL
  SELECT f.query_id, xor(c.code, (1::BIGINT << f.p))
  FROM flips f JOIN codes c ON c.vec_id = f.query_id),
cand AS (
  SELECT DISTINCT ps.query_id, c.vec_id AS neighbor_id
  FROM probeset ps JOIN codes c ON c.code = ps.code),
scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         list_cosine_similarity(qe.embedding, ne.embedding) AS sim
  FROM cand cd
  JOIN embeddings qe ON qe.vec_id = cd.query_id
  JOIN embeddings ne ON ne.vec_id = cd.neighbor_id)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank
FROM (SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS rank
      FROM scored)
WHERE rank <= {k}
ORDER BY query_id, rank
"""


def embeddings_mrl_recall(sf_dir: str):
    """Matryoshka truncation evaluation: recall@10 of cosine search on
    the first 16 of 64 dims vs the exact full-dim top-10
    (stages/similarity.py::mrl_recall) — map-side top-k both sides, no
    shuffle; oracle slices with embedding[1:16] and the shared brute
    CTE."""
    rd = _rd()
    from ..stages.similarity import mrl_recall

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    queries, qids = _load_queries(sf_dir)
    return mrl_recall(ds, queries, qids, k=_KNN_K, dims=16)


def _mrl_recall_sql(k: int = _KNN_K, dims: int = 16,
                    n_queries: int = _KNN_QUERIES) -> str:
    brute = _KNN_SQL.strip()
    return f"""
WITH qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id
              LIMIT {n_queries}),
tq AS (SELECT e.vec_id AS query_id, e.embedding[1:{dims}] AS qe
       FROM embeddings e JOIN qids USING (vec_id)),
tscored AS (
  SELECT t.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(t.qe, e.embedding[1:{dims}]) AS sim
  FROM tq t CROSS JOIN embeddings e),
ttop AS (SELECT query_id, neighbor_id FROM tscored
         QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY sim DESC, neighbor_id) <= {k}),
brute AS ({brute}),
hits AS (SELECT b.query_id, COUNT(*) AS inter
         FROM brute b JOIN ttop t
           ON t.query_id = b.query_id
          AND t.neighbor_id = b.neighbor_id
         GROUP BY 1)
SELECT q.vec_id AS query_id,
       CAST(COALESCE(h.inter, 0) * 1000000 // {k} AS BIGINT) AS recall_ppm
FROM qids q LEFT JOIN hits h ON h.query_id = q.vec_id
ORDER BY query_id
"""


def docs_merge_upsert(sf_dir: str):
    """Lakehouse MERGE (the Lance/Delta upsert shape the input_hint's
    storage implies): apply a deterministic delta to the documents
    base — DELETE doc_id % 17 == 0, UPSERT (uppercase text) doc_id %
    13 == 0 (delete wins on overlap), INSERT 10 new ids past max —
    and emit the merged (doc_id, n_chars, op). Delta keys are small
    BY CONSTRUCTION (a delta batch), so the merge is one map-side
    pass: broadcast key sets gate delete/replace, inserts union in;
    at delta >> broadcast scale the same plan is the
    dedup_incremental LEFT ANTI + hash-join shape."""
    rd = _rd()
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def merge(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        t = batch.filter(pa.array(ids % 17 != 0))
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        ups = pa.array(ids % 13 == 0)
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = pc.if_else(ups,
                       pc.utf8_length(pc.utf8_upper(text)),
                       pc.utf8_length(text))
        op = pc.if_else(ups, pa.scalar("upsert"), pa.scalar("keep"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": n.cast(pa.int64()),
                         "op": op})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    base = ds.map_batches(merge, batch_format="pyarrow").to_pandas()
    # doc ids are contiguous 0..n-1 (every graph/URL oracle relies on
    # it), so max_id comes from row-count metadata, not a column read
    max_id = n - 1
    ins = pd.DataFrame({
        "doc_id": [max_id + 1 + i for i in range(10)],
        "n_chars": [len(f"new doc {max_id + 1 + i}") for i in range(10)],
        "op": ["insert"] * 10})
    out = (pd.concat([base, ins], ignore_index=True)
           .sort_values("doc_id").reset_index(drop=True))
    return pa.table({
        "doc_id": pa.array(out["doc_id"].astype("int64"), pa.int64()),
        "n_chars": pa.array(out["n_chars"].astype("int64"), pa.int64()),
        "op": pa.array(out["op"], pa.string())})


_MERGE_UPSERT_SQL = """
WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN length(upper(text))
              ELSE length(text) END AS n_chars,
         CASE WHEN doc_id % 13 = 0 THEN 'upsert' ELSE 'keep' END AS op
  FROM documents WHERE doc_id % 17 <> 0),
ins AS (SELECT mx.m + i AS doc_id,
               length('new doc ' || CAST(mx.m + i AS VARCHAR)) AS n_chars,
               'insert' AS op
        FROM mx, UNNEST(range(1, 11)) AS t(i))
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, op FROM base
UNION ALL
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, op FROM ins
ORDER BY doc_id
"""


def events_forecast_backtest(sf_dir: str):
    """Time-series backtest row: the seasonal-naive forecast (value of
    the same hour one week earlier, lag 168h) evaluated against the
    actual hourly cents totals — per-day MAE in exact cents (the
    baseline every forecasting pipeline must beat, and the backtest
    harness shape itself). Map-side hourly partials fold to a
    timespan-bounded hours table; the lag join is driver arithmetic on
    that small table (at real scale: the asof machinery)."""
    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        from ..stages.window import _epoch_us

        hour = _epoch_us(batch.column("ts")) // 3_600_000_000
        cents = np.rint(np.asarray(batch.column("value"),
                                   dtype=np.float64) * 100) \
            .astype(np.int64)
        t = pa.table({"hour": pa.array(hour, pa.int64()),
                      "c": pa.array(cents, pa.int64())})
        return (t.group_by("hour").aggregate([("c", "sum")])
                .rename_columns(["hour", "c"]))

    batches = list(ev.map_batches(prep, batch_format="pyarrow")
                   .iter_batches(batch_size=1 << 20,
                                 batch_format="pyarrow"))
    empty = pa.table({"day": pa.array([], pa.int64()),
                      "n_hours": pa.array([], pa.int64()),
                      "mae_cents": pa.array([], pa.int64())})
    if not batches:  # zero batches: concat_tables would raise
        return empty
    parts = pa.concat_tables(batches)
    if parts.num_rows == 0:
        return empty
    h = (parts.group_by("hour").aggregate([("c", "sum")])
         .rename_columns(["hour", "c"]).to_pandas()
         .sort_values("hour").reset_index(drop=True))
    lut = dict(zip(h["hour"].astype("int64"), h["c"].astype("int64")))
    rows = []
    for hour, c in lut.items():
        prev = lut.get(hour - 168)
        if prev is None:
            continue  # no seasonal history -> excluded from the eval
        rows.append((hour // 24, abs(int(c) - int(prev))))
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=["day", "ae"])
    fin = (df.groupby("day", as_index=False)
           .agg(n_hours=("ae", "size"), ae_sum=("ae", "sum"))
           .sort_values("day"))
    mae = fin["ae_sum"].astype("int64") // fin["n_hours"].astype("int64")
    return pa.table({
        "day": pa.array(fin["day"].astype("int64"), pa.int64()),
        "n_hours": pa.array(fin["n_hours"].astype("int64"), pa.int64()),
        "mae_cents": pa.array(mae.astype("int64"), pa.int64())})


_FORECAST_BACKTEST_SQL = """
WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour,
                  CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT))
                       AS BIGINT) AS c
           FROM events GROUP BY 1),
j AS (SELECT a.hour, a.c AS actual, b.c AS forecast
      FROM h a JOIN h b ON b.hour = a.hour - 168)
SELECT hour // 24 AS day, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(abs(actual - forecast)) // COUNT(*) AS BIGINT)
           AS mae_cents
FROM j GROUP BY 1 ORDER BY 1
"""


def embeddings_curation(sf_dir: str):
    """End-to-end embedding-corpus curation composite (the embedding
    mirror of docs_curation_train): ONE kmeans fit drives BOTH gates —
    SemDeDup semantic-duplicate removal (keep = component rep) AND
    distance-to-centroid outlier removal (drop the global top-20) —
    and the output is the curated (vec_id, cluster) set. One oracle
    checks the whole chain, so a drift in any stage (fit, closure,
    distance ranking) fails the row."""
    rd = _rd()
    from ..stages.similarity import (_kmeans_fit, kmeans_outliers,
                                     semdedup)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"]).materialize()
    fit = _kmeans_fit(ds, _KMEANS_K, _KMEANS_ITERS, 100, 1000,
                      slice(None))
    sem = semdedup(ds, n_clusters=_KMEANS_K, iters=_KMEANS_ITERS,
                   tau_num=_SEMDEDUP_NUM, tau_den=_SEMDEDUP_DEN,
                   fit=fit).to_pandas()
    outl = set(kmeans_outliers(ds, k_out=20, n_clusters=_KMEANS_K,
                               iters=_KMEANS_ITERS, fit=fit)
               .column("vec_id").to_pylist())
    kept = sem[(sem["keep"] == 1) & ~sem["vec_id"].isin(outl)]
    kept = kept.sort_values("vec_id").reset_index(drop=True)
    return pa.table({
        "vec_id": pa.array(kept["vec_id"].astype("int64"), pa.int64()),
        "cluster": pa.array(kept["cluster"].astype("int64"),
                            pa.int64())})


def _curation_emb_sql(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS,
                      scale: int = 100, offset: int = 1000,
                      num: int = _SEMDEDUP_NUM, den: int = _SEMDEDUP_DEN,
                      k_out: int = 20) -> str:
    chain = _kmeans_ctes(k, iters, scale, offset)
    dist = ("list_sum(list_transform(list_zip(v.q, c.q), "
            "s -> (s[1]-s[2])*(s[1]-s[2])))")
    return f"""{_oracle_kernels.U64_PRELUDE}
WITH RECURSIVE {chain},
{_semdedup_closure_ctes(offset, num, den)},
outl AS (
  SELECT o.vec_id FROM out o JOIN qv v USING (vec_id)
  JOIN cent{iters}f c ON c.cluster = o.cluster
  QUALIFY row_number() OVER (ORDER BY {dist} DESC, o.vec_id)
          <= {k_out})
SELECT o.vec_id, o.cluster FROM out o
LEFT JOIN rep r USING (vec_id)
WHERE COALESCE(r.rep, o.vec_id) = o.vec_id
  AND o.vec_id NOT IN (SELECT vec_id FROM outl)
ORDER BY o.vec_id
"""


def docs_uncertain_lang(sf_dir: str):
    """Active-learning uncertainty sampling: the 20 docs whose lang-ID
    decision is most ambiguous — margin = top marker-hit count minus
    the runner-up (ties to the smaller doc_id; Han-script docs are
    rule-decided, so they are excluded). The op every
    human-in-the-loop labeling pipeline runs to pick what to annotate
    next. Map-side local bottom-k over the same marker sets the LangId
    stage uses; exact SQL oracle (list_sort desc margins)."""
    rd = _rd()
    from ..stages.text_analysis import _HAN, _LANG_MARKERS, _TOKEN_RE

    langs = [lang for lang, m in _LANG_MARKERS.items() if m]
    marker_sets = [frozenset(_LANG_MARKERS[lg]) for lg in langs]
    k = 20

    def local_bottom(batch: pa.Table) -> pa.Table:
        ids_out, margins = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if _HAN.search(t):
                continue
            toks = set(_TOKEN_RE.findall(t.lower())[:200])
            hits = sorted((len(toks & m) for m in marker_sets),
                          reverse=True)
            ids_out.append(d)
            margins.append(hits[0] - hits[1])
        ids_a = np.asarray(ids_out, dtype=np.int64)
        mg = np.asarray(margins, dtype=np.int64)
        order = np.lexsort((ids_a, mg))[:k]
        return pa.table({"doc_id": pa.array(ids_a[order], pa.int64()),
                         "margin": pa.array(mg[order], pa.int64())})

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    parts = (ds.map_batches(local_bottom, batch_format="pyarrow")
             .to_pandas())
    if len(parts) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "margin": pa.array([], pa.int64())})
    fin = (parts.sort_values(["margin", "doc_id"]).head(k)
           .reset_index(drop=True))
    return pa.table({
        "doc_id": pa.array(fin["doc_id"].astype("int64"), pa.int64()),
        "margin": pa.array(fin["margin"].astype("int64"), pa.int64())})


_UNCERTAIN_LANG_SQL = r"""
WITH toks AS (
  SELECT doc_id, text,
         list_distinct(list_filter(regexp_split_to_array(lower(text),
                                                         '\s+'),
                                   x -> x <> '')[1:200]) AS t
  FROM documents
  WHERE NOT regexp_matches(text, '[\x{4E00}-\x{9FFF}]')
), hits AS (
  SELECT doc_id,
    len(list_intersect(t, ['the','and','of','is','with'])) AS en,
    len(list_intersect(t, ['der','die','und','ist','mit'])) AS de,
    len(list_intersect(t, ['le','la','et','est','avec'])) AS fr,
    len(list_intersect(t, ['el','la','y','es','con'])) AS es
  FROM toks
), m AS (
  SELECT doc_id,
         list_sort([en, de, fr, es], 'DESC')[1]
         - list_sort([en, de, fr, es], 'DESC')[2] AS margin
  FROM hits)
SELECT doc_id, CAST(margin AS BIGINT) AS margin FROM m
QUALIFY row_number() OVER (ORDER BY margin, doc_id) <= 20
ORDER BY margin, doc_id
"""


def events_bot_scores(sf_dir: str):
    """Abuse/bot-traffic scoring (the traffic-analysis cousin of the
    crawler's own politeness counters): per user, events per active
    hour divided by behavioral diversity — ``(n_events * 10^6 //
    active_hours) // n_types`` — top-5 most bot-like. High-rate,
    low-variety actors rank first; all-integer, exact oracle.

    Scale shape: one user fat-bucket shuffle of block-distinct
    (user, hour) / (user, type) rows plus per-user count partials
    (tagged kinds on one stream); users are partitioned across
    buckets, so each bucket finishes its users exactly and emits only
    its local top-5."""
    import ray

    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets, _epoch_us

    rd = _rd()
    nb = _default_buckets()
    k = 5

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch.column("user_id"), dtype=np.int64)
        hour = _epoch_us(batch.column("ts")) // 3_600_000_000
        typ = batch.column("event_type")
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        t0 = pa.table({"u": pa.array(u, pa.int64()),
                       "v": pa.array(hour, pa.int64()),
                       "s": pa.array([""] * u.size, pa.string()),
                       "kind": pa.array(np.zeros(u.size, np.int8),
                                        pa.int8())})
        t0 = (t0.group_by(["u", "v", "s", "kind"])
              .aggregate([([], "count_all")])
              .rename_columns(["u", "v", "s", "kind", "n"]))
        t1 = pa.table({"u": pa.array(u, pa.int64()),
                       "v": pa.array(np.zeros(u.size, np.int64),
                                     pa.int64()),
                       "s": typ,
                       "kind": pa.array(np.ones(u.size, np.int8),
                                        pa.int8())})
        t1 = (t1.group_by(["u", "v", "s", "kind"])
              .aggregate([([], "count_all")])
              .rename_columns(["u", "v", "s", "kind", "n"]))
        uu, cnt = np.unique(u, return_counts=True)
        t2 = pa.table({"u": pa.array(uu, pa.int64()),
                       "v": pa.array(np.zeros(uu.size, np.int64),
                                     pa.int64()),
                       "s": pa.array([""] * uu.size, pa.string()),
                       "kind": pa.array(np.full(uu.size, 2, np.int8),
                                        pa.int8()),
                       "n": pa.array(cnt.astype(np.int64), pa.int64())})
        t = pa.concat_tables([t0, t1, t2])
        uv = np.asarray(t.column("u"), dtype=np.int64)
        kb = (_mix64_np(uv.view(np.uint64)) % np.uint64(nb)) \
            .astype(np.int64)
        return t.append_column("_kb", pa.array(kb, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        stats = {}
        g0 = group[group["kind"] == 0].drop_duplicates(["u", "v"])
        hours = g0.groupby("u").size()
        g1 = group[group["kind"] == 1].drop_duplicates(["u", "s"])
        types = g1.groupby("u").size()
        g2 = group[group["kind"] == 2].groupby("u")["n"].sum()
        df = pd.DataFrame({"active_hours": hours, "n_types": types,
                           "n_events": g2}).dropna().astype("int64")
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype="int64")
                                 for c in ("user_id", "n_events",
                                           "active_hours", "n_types",
                                           "bot_score")})
        score = (df["n_events"] * 1_000_000
                 // df["active_hours"]) // df["n_types"]
        df = df.assign(bot_score=score).reset_index(names="user_id")
        df = df.sort_values(["bot_score", "user_id"],
                            ascending=[False, True]).head(k)
        return df[["user_id", "n_events", "active_hours", "n_types",
                   "bot_score"]]

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    parts = (ev.map_batches(prep, batch_format="pyarrow")
             .groupby("_kb").map_groups(per_bucket,
                                        batch_format="pandas")
             .to_pandas())
    cols = ("user_id", "n_events", "active_hours", "n_types",
            "bot_score")
    if len(parts) == 0:
        return pa.table({c: pa.array([], pa.int64()) for c in cols})
    fin = (parts.sort_values(["bot_score", "user_id"],
                             ascending=[False, True]).head(k)
           .reset_index(drop=True))
    return pa.table({c: pa.array(fin[c].astype("int64"), pa.int64())
                     for c in cols})


_BOT_SCORES_SQL = """
WITH peru AS (SELECT user_id, COUNT(*) AS n_events,
        COUNT(DISTINCT epoch_us(ts) // 3600000000) AS active_hours,
        COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY 1)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(active_hours AS BIGINT) AS active_hours,
       CAST(n_types AS BIGINT) AS n_types,
       CAST((n_events * 1000000 // active_hours) // n_types AS BIGINT)
           AS bot_score
FROM peru
QUALIFY row_number() OVER (
    ORDER BY (n_events * 1000000 // active_hours) // n_types DESC,
             user_id) <= 5
ORDER BY bot_score DESC, user_id
"""


def crawl_resume_equivalence(sf_dir: str):
    """Checkpoint-resume as a DRIVER-CHECKED row (north_rule: a killed
    run resumes without re-fetching or duplicating): crash the crawl
    after epoch 2 (simulated kill), resume from the frontier
    checkpoint, and emit the final per-URL (url, title) set — which
    must equal the full-reachability oracle exactly. A duplicate or a
    missing page from the crash/resume seam fails the row."""
    import shutil
    import tempfile

    from ..sources.synthetic_site import build_site_table, page_url
    from .crawl import CrawlJob, run_crawl
    import ray

    pages = build_site_table(f"{sf_dir}/documents.parquet")
    job = CrawlJob(job_id="rz", seed_urls=[page_url(0)], strategy="all",
                   max_depth=20, limit=50_000)
    tmp = tempfile.mkdtemp(prefix="resume_eq_")
    try:
        out_dir, ck = f"{tmp}/out", f"{tmp}/ck"
        use_ray = ray.is_initialized()
        try:
            run_crawl(job, pages, use_ray=use_ray, out_dir=out_dir,
                      checkpoint_dir=ck, ray_wave_threshold=64,
                      crash_after_epoch=2)
        except RuntimeError:
            pass  # the simulated kill
        res = run_crawl(job, pages, use_ray=use_ray, out_dir=out_dir,
                        checkpoint_dir=ck, resume=True,
                        ray_wave_threshold=64)
        docs = res.documents
        rows = {}
        for url, spans in zip(docs.column("url").to_pylist(),
                              docs.column("spans").to_pylist()):
            title = next((s["text"] for s in spans
                          if s["kind"] == "title"), "")
            if url in rows:  # a duplicate would poison the row count
                rows[url] = "<DUPLICATE>"
            else:
                rows[url] = title
        urls = sorted(rows)
        return pa.table({"url": pa.array(urls, pa.string()),
                         "title": pa.array([rows[u] for u in urls],
                                           pa.string())})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_RESUME_EQ_SQL = f"""
WITH RECURSIVE n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
{_EDGES_CTE_BODY}
),
reach(id, depth) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.id
  WHERE r.depth < 20
)
SELECT 'http://site' || CAST(id % {{hosts}} AS VARCHAR) || '.test/p/' ||
       lpad(CAST(id AS VARCHAR), 6, '0') AS url,
       'Doc ' || CAST(id AS VARCHAR) AS title
FROM (SELECT DISTINCT id FROM reach)
ORDER BY url
""".replace("{hosts}", str(_HOSTS))


_RRF_POOL, _RRF_K, _RRF_C = 50, 10, 60


def docs_rrf_fusion(sf_dir: str):
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009)
    — the standard way modern RAG/training-data pipelines combine a
    lexical and a dense ranker without score calibration: each ranker
    contributes ``1/(C + rank)`` (here the exact integer
    ``10^9 // (60 + rank)``) for its top-50, summed per doc, fused
    top-10 returned. Lexical = the exact-integer BM25 ranking
    (text_analysis.bm25_topk); dense = exact-integer dot-product
    retrieval against the first embedding vector (vec_id aligns 1:1
    with doc_id in this corpus). Both rankers are DISTRIBUTED scans
    (map-side local top-k + tiny driver merges); the fusion itself
    folds two <= 50-row lists — never corpus-sized."""
    from ..stages.similarity import dense_topk_int
    from ..stages.text_analysis import bm25_topk

    rd = _rd()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    bm = bm25_topk(docs, _KEYWORD_TERMS, k=_RRF_POOL)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    qs, ids = _load_queries(sf_dir)
    dn = dense_topk_int(emb, qs[0], k=_RRF_POOL,
                        exclude_ids=(int(ids[0]),))
    fused: dict[int, list[int]] = {}
    for r, d in enumerate(bm.column("doc_id").to_pylist(), 1):
        e = fused.setdefault(int(d), [0, 0, 0])
        e[0] += 10**9 // (_RRF_C + r)
        e[1] = r
    for r, d in zip(dn.column("rank").to_pylist(),
                    dn.column("vec_id").to_pylist()):
        e = fused.setdefault(int(d), [0, 0, 0])
        e[0] += 10**9 // (_RRF_C + int(r))
        e[2] = int(r)
    top = sorted(fused.items(), key=lambda kv: (-kv[1][0], kv[0]))[:_RRF_K]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf_score": pa.array([e[0] for _, e in top], pa.int64()),
        "bm25_rank": pa.array([e[1] for _, e in top], pa.int64()),
        "dense_rank": pa.array([e[2] for _, e in top], pa.int64())})


def _rrf_fusion_sql(terms: list[str] | None = None, pool: int = _RRF_POOL,
                    k: int = _RRF_K, c: int = _RRF_C,
                    scale: int = 1_000_000, vscale: int = 100) -> str:
    tlist = ", ".join(f"'{t}'" for t in (terms or _KEYWORD_TERMS))
    return f"""
WITH lists AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> '') AS t
  FROM documents),
dl AS (SELECT doc_id, len(t) AS dl FROM lists),
g AS (SELECT COUNT(*) AS n, SUM(dl) AS tl FROM dl),
toks AS (SELECT doc_id, UNNEST(t) AS tok FROM lists),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       WHERE tok IN ({tlist}) GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
sc AS (
  SELECT tf.doc_id,
         CAST(SUM( (g.n // df.df)
                   * (22::HUGEINT * tf.tf * g.tl * {scale})
                   // (10::HUGEINT * g.tl * tf.tf + 3::HUGEINT * g.tl
                       + 9::HUGEINT * dl.dl * g.n) ) AS BIGINT) AS score
  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), g
  GROUP BY tf.doc_id),
bm AS (SELECT doc_id,
              row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM sc QUALIFY r <= {pool}),
qv AS (SELECT vec_id, list_transform(embedding,
        x -> CAST(round_even(CAST(x AS DOUBLE) * {vscale}, 0) AS BIGINT))
        AS q FROM embeddings),
q0 AS (SELECT q FROM qv ORDER BY vec_id LIMIT 1),
qid AS (SELECT vec_id AS id0 FROM qv ORDER BY vec_id LIMIT 1),
dn AS (SELECT v.vec_id AS doc_id,
              row_number() OVER (
                ORDER BY list_sum(list_transform(list_zip(v.q, q0.q),
                                                 z -> z[1]*z[2])) DESC,
                         v.vec_id) AS r
       FROM qv v, q0 WHERE v.vec_id <> (SELECT id0 FROM qid)
       QUALIFY r <= {pool})
SELECT COALESCE(bm.doc_id, dn.doc_id) AS doc_id,
       CAST(COALESCE(1000000000 // ({c} + bm.r), 0)
            + COALESCE(1000000000 // ({c} + dn.r), 0) AS BIGINT)
           AS rrf_score,
       CAST(COALESCE(bm.r, 0) AS BIGINT) AS bm25_rank,
       CAST(COALESCE(dn.r, 0) AS BIGINT) AS dense_rank
FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id
ORDER BY rrf_score DESC, doc_id LIMIT {k}
"""


_HARDNEG_Q = 10


def embeddings_hard_negatives(sf_dir: str):
    """Triplet mining for metric-learning curation
    (similarity.hard_negatives): for the first 10 anchors, the hardest
    different-label negative (max integer dot) and hardest same-label
    positive (min dot). Broadcast anchor matrix, <= 2 candidate rows per
    anchor per block, tiny driver merge. Exact cross-join oracle."""
    from ..stages.similarity import hard_negatives

    rd = _rd()
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding", "label"])
    order = np.argsort(np.asarray(tbl.column("vec_id").to_pylist()))
    order = order[:_HARDNEG_Q]
    aid = [int(tbl.column("vec_id")[int(i)].as_py()) for i in order]
    alab = [int(tbl.column("label")[int(i)].as_py()) for i in order]
    anchors = np.asarray(
        [tbl.column("embedding")[int(i)].as_py() for i in order],
        dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    return hard_negatives(ds, anchors, aid, alab)


_HARD_NEGATIVES_SQL = f"""
WITH qv AS (SELECT vec_id, label, list_transform(embedding,
        x -> CAST(round_even(CAST(x AS DOUBLE) * 100, 0) AS BIGINT))
        AS q FROM embeddings),
a AS (SELECT vec_id AS anchor_id, label AS alab, q AS aq FROM qv
      ORDER BY vec_id LIMIT {_HARDNEG_Q}),
d AS (SELECT a.anchor_id, a.alab, v.vec_id, v.label,
             list_sum(list_transform(list_zip(a.aq, v.q),
                                     z -> z[1]*z[2])) AS dot
      FROM a CROSS JOIN qv v),
hn AS (SELECT anchor_id, vec_id AS hn_id, dot AS hn_dot FROM d
       WHERE label <> alab
       QUALIFY row_number() OVER (PARTITION BY anchor_id
                                  ORDER BY dot DESC, vec_id) = 1),
hp AS (SELECT anchor_id, vec_id AS hp_id, dot AS hp_dot FROM d
       WHERE label = alab AND vec_id <> anchor_id
       QUALIFY row_number() OVER (PARTITION BY anchor_id
                                  ORDER BY dot ASC, vec_id) = 1)
SELECT anchor_id, hn_id, CAST(hn_dot AS BIGINT) AS hn_dot,
       hp_id, CAST(hp_dot AS BIGINT) AS hp_dot
FROM hn JOIN hp USING (anchor_id) ORDER BY anchor_id
"""


def events_user_streaks(sf_dir: str):
    """Longest consecutive-day activity streak per user
    (window.user_streaks) — the gaps-and-islands engagement metric.
    Locally-distinct (user, day) partials, ONE fat-bucket shuffle,
    vectorized cross-user run kernel. Oracle = the classic
    day - row_number() islands SQL."""
    from ..stages.window import user_streaks

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    df = user_streaks(ev)
    return pa.table({
        "user_id": pa.array(df["user_id"].astype("int64"), pa.int64()),
        "n_active_days": pa.array(df["n_active_days"].astype("int64"),
                                  pa.int64()),
        "max_streak": pa.array(df["max_streak"].astype("int64"),
                               pa.int64())})


_USER_STREAKS_SQL = """
WITH d AS (SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day FROM events),
i AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day) AS grp FROM d),
s AS (SELECT user_id, COUNT(*) AS len FROM i GROUP BY user_id, grp)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS max_streak
FROM s GROUP BY user_id ORDER BY user_id
"""


def docs_heaps_law(sf_dir: str):
    """Vocabulary-growth curve (Heaps' law measurement — the standard
    corpus-statistics diagnostic for tokenizer/vocab sizing): at each
    decile checkpoint ``c_i = i*N//10`` over doc_id, the number of
    distinct tokens first seen in docs with doc_id < c_i and the
    cumulative token count.

    Scale shape: ONE tokenizing corpus pass emits (token, local-min
    doc_id) rows plus 10 sentinel rows carrying the block's per-decile
    token-count partials (the bm25 sentinel idiom); first occurrences
    reduce via groupby-Min (the only vocab-sized shuffle), bucketize to
    <= 10 cells map-side, and the driver folds two 10-row tables — the
    corpus and the vocabulary never reach the driver."""
    from ray.data.aggregate import Min, Sum

    rd = _rd()
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet") \
        .metadata.num_rows
    cps = np.array([(i * n_docs) // 10 for i in range(1, 11)],
                   dtype=np.int64)

    def index_rows(batch: pa.Table) -> pa.Table:
        local: dict[str, int] = {}
        dl_sums = np.zeros(10, dtype=np.int64)
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = t.split()
            j = int(np.searchsorted(cps, d, side="right"))
            if j < 10:
                dl_sums[j] += len(toks)
            for tok in set(toks):
                m = local.get(tok)
                if m is None or d < m:
                    local[tok] = d
        out_t = list(local.keys()) + [""] * 10
        out_a = list(local.values()) + list(range(10))
        out_b = [0] * len(local) + dl_sums.tolist()
        return pa.table({"tok": pa.array(out_t, pa.string()),
                         "a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    idx = docs.map_batches(index_rows,
                           batch_format="pyarrow").materialize()

    def vocab_buckets(batch: pa.Table) -> pa.Table:
        fd = np.asarray(batch.column("fd"), dtype=np.int64)
        j = np.searchsorted(cps, fd, side="right")
        cnt = np.bincount(j[j < 10], minlength=10)
        return pa.table({"bucket": pa.array(np.arange(10), pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    vb = (idx.filter(expr="tok != ''")
          .groupby("tok").aggregate(Min("a", alias_name="fd"))
          .map_batches(vocab_buckets, batch_format="pyarrow")
          .groupby("bucket").aggregate(Sum("n", alias_name="n"))
          .to_pandas())
    db = (idx.filter(expr="tok == ''")
          .groupby("a").aggregate(Sum("b", alias_name="dl"))
          .to_pandas())
    vocab = np.zeros(10, dtype=np.int64)
    vocab[vb["bucket"].to_numpy(dtype=np.int64)] = \
        vb["n"].to_numpy(dtype=np.int64)
    toks = np.zeros(10, dtype=np.int64)
    toks[db["a"].to_numpy(dtype=np.int64)] = \
        db["dl"].to_numpy(dtype=np.int64)
    return pa.table({
        "decile": pa.array(np.arange(1, 11, dtype=np.int64), pa.int64()),
        "n_docs": pa.array(cps, pa.int64()),
        "vocab_size": pa.array(np.cumsum(vocab), pa.int64()),
        "cum_tokens": pa.array(np.cumsum(toks), pa.int64())})


_HEAPS_LAW_SQL = r"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
cps AS (SELECT i, (i * n.n) // 10 AS c FROM range(1, 11) t(i), n),
lists AS (SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\s+'),
                             x -> x <> '') AS t
          FROM documents),
toks AS (SELECT doc_id, UNNEST(t) AS tok FROM lists),
fo AS (SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok),
dl AS (SELECT doc_id, len(t) AS dl FROM lists)
SELECT CAST(i AS BIGINT) AS decile, CAST(c AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(*) FROM fo WHERE fd < cps.c) AS BIGINT)
           AS vocab_size,
       CAST((SELECT COALESCE(SUM(dl), 0) FROM dl WHERE doc_id < cps.c)
            AS BIGINT) AS cum_tokens
FROM cps ORDER BY i
"""


def docs_ngram_novelty(sf_dir: str):
    """Per-doc first-occurrence shingle novelty (dedup.ngram_novelty) —
    the RefinedWeb-style pruning signal. One tokenizing pass with
    sentinel totals, groupby-Min first owners, union-fold finish; the
    oracle replays the identical shingle-hash space via _shingle_ctes."""
    from ..stages.dedup import ngram_novelty

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return ngram_novelty(ds, k=3)


_NGRAM_NOVELTY_SQL = f"""{_oracle_kernels.U64_PRELUDE}
WITH {_oracle_kernels._shingle_ctes()},
own AS (SELECT s, MIN(doc_id) AS owner FROM sh GROUP BY s),
nv AS (SELECT owner AS doc_id, COUNT(*) AS n_novel FROM own
       GROUP BY owner),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(t.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN COALESCE(t.n_shingles, 0) = 0 THEN 0
            ELSE COALESCE(nv.n_novel, 0) * 1000000 // t.n_shingles END
            AS BIGINT) AS novelty_ppm
FROM documents d LEFT JOIN tot t USING (doc_id)
                 LEFT JOIN nv USING (doc_id)
ORDER BY d.doc_id
"""


def docs_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink coverage: export the documents table to line-
    delimited JSON with ``Dataset.write_json`` (partitioned — one file
    per block, the resumable-output contract), re-ingest it with
    ``ray.data.read_json``, and aggregate per-lang stats from the
    re-read dataset. The aggregate is order-free, so the roundtrip is
    deterministic regardless of block layout; the oracle computes the
    same stats straight from the parquet view — any field the JSON
    writer or reader mangled (type, encoding, row loss) breaks the
    value hash."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Max, Sum

    rd = _rd()
    out = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    try:
        (rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
         .write_json(out))
        back = rd.read_json(out)
        res = (back.groupby("lang")
               .aggregate(Count(alias_name="n_docs"),
                          Sum("n_chars", alias_name="sum_chars"),
                          Max("doc_id", alias_name="max_doc"))
               .to_pandas().sort_values("lang").reset_index(drop=True))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "lang": pa.array(res["lang"].astype(str), pa.string()),
        "n_docs": pa.array(res["n_docs"].astype("int64"), pa.int64()),
        "sum_chars": pa.array(res["sum_chars"].astype("int64"),
                              pa.int64()),
        "max_doc": pa.array(res["max_doc"].astype("int64"), pa.int64())})


_JSONL_ROUNDTRIP_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents GROUP BY lang ORDER BY lang
"""


def events_csv_roundtrip(sf_dir: str):
    """CSV source/sink coverage: export (user_id, event_type) to CSV
    with ``Dataset.write_csv``, re-ingest with ``ray.data.read_csv``,
    and compute per-type totals + exact distinct-user counts from the
    re-read dataset (two-level groupby — no driver-side distinct).
    Oracle = the same aggregate over the parquet view."""
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Sum

    rd = _rd()
    out = tempfile.mkdtemp(prefix="csv_rt_", dir="/tmp")
    try:
        (rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
         .write_csv(out))
        back = rd.read_csv(out)
        per_pair = (back.groupby(["event_type", "user_id"])
                    .aggregate(Count(alias_name="n")))
        res = (per_pair.groupby("event_type")
               .aggregate(Sum("n", alias_name="n_events"),
                          Count(alias_name="n_users"))
               .to_pandas().sort_values("event_type")
               .reset_index(drop=True))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "event_type": pa.array(res["event_type"].astype(str),
                               pa.string()),
        "n_events": pa.array(res["n_events"].astype("int64"),
                             pa.int64()),
        "n_users": pa.array(res["n_users"].astype("int64"), pa.int64())})


_CSV_ROUNDTRIP_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""




def events_scd2(sf_dir: str):
    """SCD Type-2 dimension-history build (window.scd2_intervals): per
    user, validity intervals for runs of consecutive identical
    event_type, ordered by (ts, event_id). valid_to_us = next interval's
    valid_from_us, -1 for the open interval. Oracle = LAG change flags +
    islands + LEAD."""
    from ..stages.window import scd2_intervals

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts", "event_id"])
    df = scd2_intervals(ev)
    return pa.table({
        "user_id": pa.array(df["user_id"].astype("int64"), pa.int64()),
        "event_type": pa.array(df["event_type"].astype(str), pa.string()),
        "valid_from_us": pa.array(df["valid_from_us"].astype("int64"),
                                  pa.int64()),
        "valid_to_us": pa.array(df["valid_to_us"].astype("int64"),
                                pa.int64()),
        "n_events": pa.array(df["n_events"].astype("int64"), pa.int64())})


_SCD2_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
           FROM events),
c AS (SELECT *, CASE WHEN LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY tus, event_id)
          IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg FROM e),
r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
          ROWS UNBOUNDED PRECEDING) AS run FROM c),
g AS (SELECT user_id, event_type, run, MIN(tus) AS vf, COUNT(*) AS n
      FROM r GROUP BY user_id, event_type, run)
SELECT user_id, event_type, CAST(vf AS BIGINT) AS valid_from_us,
       CAST(COALESCE(LEAD(vf) OVER (PARTITION BY user_id ORDER BY vf), -1)
            AS BIGINT) AS valid_to_us,
       CAST(n AS BIGINT) AS n_events
FROM g ORDER BY user_id, valid_from_us
"""


def events_twa(sf_dir: str):
    """Per-user time-weighted average of value (LOCF weighting) at
    second grain, exact integer cents (window.time_weighted_avg).
    Single-second users drop (zero span). Values are nonnegative in this
    schema, so DuckDB's truncating // equals the kernel's floor //."""
    from ..stages.window import time_weighted_avg

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    df = time_weighted_avg(ev)
    return pa.table({
        "user_id": pa.array(df["user_id"].astype("int64"), pa.int64()),
        "span_sec": pa.array(df["span_sec"].astype("int64"), pa.int64()),
        "twa_cents": pa.array(df["twa_cents"].astype("int64"), pa.int64())})


_TWA_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
                  CAST(round_even(value * 100, 0) AS BIGINT) AS cents
           FROM events),
o AS (SELECT user_id, sec, cents,
             LEAD(sec) OVER (PARTITION BY user_id ORDER BY sec, cents)
               AS nxt FROM e),
a AS (SELECT user_id, SUM(cents * (COALESCE(nxt, sec) - sec)) AS wsum,
             MAX(sec) - MIN(sec) AS span FROM o GROUP BY user_id)
SELECT user_id, CAST(span AS BIGINT) AS span_sec,
       CAST(wsum // span AS BIGINT) AS twa_cents
FROM a WHERE span > 0 ORDER BY user_id
"""


def parts_skyline(sf_dir: str):
    """2-D skyline over part: pareto-optimal (p_size maximize,
    retail-price cents minimize) — the multi-criteria short-list operator
    (window.skyline_2d; local block skylines union then one exact pass).
    Oracle = the classic NOT EXISTS dominance anti-join."""
    from ..stages.window import skyline_2d

    rd = _rd()

    def to_cents(batch: pa.Table) -> pa.Table:
        price = np.asarray(batch.column("p_retailprice"), dtype=np.float64)
        return pa.table({
            "p_partkey": batch.column("p_partkey"),
            "p_size": batch.column("p_size").cast(pa.int64()),
            "price_cents": pa.array(np.rint(price * 100).astype(np.int64),
                                    pa.int64())})

    parts = (rd.read_parquet(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_size", "p_retailprice"])
             .map_batches(to_cents, batch_format="pyarrow"))
    df = skyline_2d(parts, max_col="p_size", min_col="price_cents",
                    id_col="p_partkey")
    return pa.table({
        "p_partkey": pa.array(df["p_partkey"].astype("int64"), pa.int64()),
        "p_size": pa.array(df["p_size"].astype("int64"), pa.int64()),
        "price_cents": pa.array(df["price_cents"].astype("int64"),
                                pa.int64())})


_SKYLINE_SQL = """
WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                  CAST(round_even(p_retailprice * 100, 0) AS BIGINT)
                    AS price_cents FROM part)
SELECT s.p_partkey, s.p_size, s.price_cents FROM p s
WHERE NOT EXISTS (SELECT 1 FROM p q
                  WHERE q.p_size >= s.p_size
                    AND q.price_cents <= s.price_cents
                    AND (q.p_size > s.p_size
                         OR q.price_cents < s.price_cents))
ORDER BY s.p_partkey
"""


def events_zorder(sf_dir: str):
    """Z-order (Morton) clustering layout audit over (user_id, day):
    16-bit interleave, 16 z-ranges, per-range count + both dimensions'
    min/max — the range-pruning numbers a z-ordered writer relies on
    (window.zorder_layout). Oracle replays the interleave bit-by-bit in
    SQL integer arithmetic."""
    from ..stages.window import zorder_layout

    rd = _rd()

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = np.asarray(ts.cast(pa.int64()), dtype=np.int64) // 86400000000
        return pa.table({"user_id": batch.column("user_id"),
                         "day": pa.array(day, pa.int64())})

    ev = (rd.read_parquet(f"{sf_dir}/events.parquet",
                          columns=["user_id", "ts"])
          .map_batches(prep, batch_format="pyarrow"))
    # 8-bit dims: at test scale the 16-bit high bits are constant (few
    # users, one epoch month) and the audit would collapse to one range
    return zorder_layout(ev, x_col="user_id", y_col="day", bits=8)


def _zorder_sql() -> str:
    interleave = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(8))
    return f"""
WITH b AS (SELECT user_id & 255 AS x,
                  (epoch_us(ts) // 86400000000) & 255 AS y FROM events),
z AS (SELECT x, y, ({interleave}) >> 12 AS zrange FROM b)
SELECT CAST(zrange AS BIGINT) AS zrange,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
       CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
FROM z GROUP BY zrange ORDER BY zrange
"""


def events_cusum(sf_dir: str):
    """Per-event-type CUSUM drift peak over daily counts
    (window.cusum_drift): day where |cumsum(count - floor-mean)| peaks
    (earliest on ties). The change-point detection statistic as a
    distributed reduce + tiny scan."""
    from ..stages.window import cusum_drift

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    return cusum_drift(ev)


_CUSUM_SQL = """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS n FROM events GROUP BY 1, 2),
m AS (SELECT event_type, SUM(n) // COUNT(*) AS mean, SUM(n) AS tot,
             COUNT(*) AS n_days FROM d GROUP BY 1),
s AS (SELECT d.event_type, d.day,
             SUM(d.n - m.mean) OVER (PARTITION BY d.event_type
                 ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS cus
      FROM d JOIN m USING (event_type)),
p AS (SELECT event_type, day, cus,
             ROW_NUMBER() OVER (PARTITION BY event_type
                 ORDER BY ABS(cus) DESC, day) AS rn FROM s)
SELECT p.event_type, CAST(p.day AS BIGINT) AS peak_day,
       CAST(p.cus AS BIGINT) AS peak_cusum,
       CAST(m.n_days AS BIGINT) AS n_days,
       CAST(m.tot AS BIGINT) AS n_events
FROM p JOIN m USING (event_type) WHERE rn = 1 ORDER BY event_type
"""


def docs_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather v2) source/sink coverage: write the documents
    table as one IPC file per block via a worker-side map_batches sink
    (the same partitioned-output contract as the parquet epoch sink),
    re-ingest with ``ray.data.read_binary_files`` + a vectorized IPC
    decode stage, and aggregate per-source stats from the re-read
    dataset. Any row loss or type mangling in the IPC writer/reader
    breaks the value hash against the parquet-direct oracle."""
    import os
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Min, Sum

    rd = _rd()
    out = tempfile.mkdtemp(prefix="ipc_rt_", dir="/tmp")
    try:
        def write_part(batch: pa.Table) -> pa.Table:
            import hashlib

            # content-derived name: retry-idempotent (see the ORC row)
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            tag = hashlib.md5(ids.tobytes()).hexdigest()[:16]
            path = os.path.join(out, f"part-{tag}.arrow")
            with pa.OSFile(path, "wb") as f:
                with pa.ipc.new_file(f, batch.schema) as w:
                    w.write_table(batch)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        (rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])
         .map_batches(write_part, batch_format="pyarrow").materialize())

        def decode(batch: pa.Table) -> pa.Table:
            tables = [pa.ipc.open_file(pa.BufferReader(b)).read_all()
                      for b in batch.column("bytes").to_pylist()]
            return pa.concat_tables(tables) if tables else pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "source": pa.array([], pa.string()),
                 "n_chars": pa.array([], pa.int64())})

        back = rd.read_binary_files(out).map_batches(
            decode, batch_format="pyarrow")
        res = (back.groupby("source")
               .aggregate(Count(alias_name="n_docs"),
                          Sum("n_chars", alias_name="sum_chars"),
                          Min("doc_id", alias_name="min_doc"))
               .to_pandas().sort_values("source").reset_index(drop=True))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "source": pa.array(res["source"].astype(str), pa.string()),
        "n_docs": pa.array(res["n_docs"].astype("int64"), pa.int64()),
        "sum_chars": pa.array(res["sum_chars"].astype("int64"), pa.int64()),
        "min_doc": pa.array(res["min_doc"].astype("int64"), pa.int64())})


_IPC_ROUNDTRIP_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM documents GROUP BY source ORDER BY source
"""


def events_ewma(sf_dir: str):
    """Per-event-type EWMA trend over observed daily counts
    (window.ewma_daily, alpha = 1/8, 1e6 fixed point): the smoothing
    statistic behind rate dashboards and drift alerts. The oracle
    replays the exact integer recurrence with a recursive CTE over the
    per-type day ranks."""
    from ..stages.window import ewma_daily

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    return ewma_daily(ev)


_EWMA_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn FROM d),
rec(event_type, rn, day, n, s) AS (
  SELECT event_type, rn, day, n, n * 1000000 FROM r WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.rn, r.day, r.n,
         (7 * rec.s + r.n * 1000000) // 8
  FROM rec JOIN r ON r.event_type = rec.event_type
               AND r.rn = rec.rn + 1)
SELECT event_type, CAST(day AS BIGINT) AS day, n,
       CAST(s AS BIGINT) AS ewma
FROM rec ORDER BY event_type, day
"""


def events_benford(sf_dir: str):
    """First-significant-digit distribution of event values vs the
    Benford screen (window.benford_digits): cents-quantized, positive
    rows only, counts + ppm shares — the classic aberration audit as a
    zero-shuffle map-side fold."""
    from ..stages.window import benford_digits

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return benford_digits(ev)


_BENFORD_SQL = """
WITH c AS (
  SELECT CAST(round_even(value * 100, 0) AS BIGINT) AS cents
  FROM events
  WHERE CAST(round_even(value * 100, 0) AS BIGINT) > 0),
d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
          AS digit, CAST(COUNT(*) AS BIGINT) AS n
      FROM c GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM d)
SELECT d.digit, d.n,
       CAST(d.n * 1000000 // greatest(t.total, 1) AS BIGINT)
           AS share_ppm
FROM d, t ORDER BY d.digit
"""


def events_autocorr(sf_dir: str):
    """Per-event-type autocorrelation sufficient statistics of the
    dense hourly count series at lags 1, 2 and 24 (window.
    autocorr_hourly) — the seasonality probe, float-free: the exact
    integer Pearson pieces (n_pairs, cov_n, varx_n, vary_n) so the
    oracle compares pure BIGINTs."""
    from ..stages.window import autocorr_hourly

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    return autocorr_hourly(ev)


_AUTOCORR_SQL = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT event_type, MIN(hr) AS mn, MAX(hr) AS mx
      FROM h GROUP BY 1),
grid AS (SELECT b.event_type, unnest(generate_series(b.mn, b.mx)) AS hr
         FROM b),
dense AS (SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
          FROM grid g LEFT JOIN h USING (event_type, hr)),
lags AS (SELECT unnest([1, 2, 24]) AS lag),
pairs AS (
  SELECT d1.event_type, l.lag, d1.n AS x, d2.n AS y
  FROM dense d1
  JOIN lags l ON true
  JOIN dense d2 ON d2.event_type = d1.event_type
               AND d2.hr = d1.hr + l.lag)
SELECT event_type, CAST(lag AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) AS cov_n,
       CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS BIGINT) AS varx_n,
       CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS BIGINT) AS vary_n
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


def embeddings_pca_power(sf_dir: str):
    """Top principal direction of the embedding second-moment matrix
    by integer power iteration (similarity.pca_power): ONE corpus pass
    folds d x d second-moment partials, the tiny matrix iterates
    driver-side in arbitrary-precision ints. The oracle replays the
    identical recurrence as unrolled HUGEINT CTEs in the algebraically
    equal w = Q^T (Q v) form."""
    rd = _rd()
    from ..stages.similarity import pca_power

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    return pca_power(ds, iters=_PCA_ITERS, scale=100,
                     v_scale=_PCA_VSCALE)


_PCA_ITERS = 8
_PCA_VSCALE = 10_000


def _pca_power_sql(iters: int = _PCA_ITERS, scale: int = 100,
                   v_scale: int = _PCA_VSCALE,
                   final: str | None = None) -> str:
    ctes = [f"""qv AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(round_even(CAST(x AS DOUBLE) * {scale}, 0)
                   AS BIGINT)) AS q
  FROM embeddings),
qd AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(q, 1) AS dim, unnest(q) AS x
  FROM qv),
v0 AS (SELECT DISTINCT dim, CAST({v_scale} AS HUGEINT) AS val
       FROM qd)"""]
    for k in range(1, iters + 1):
        # w{k} is referenced by both mx{k} and v{k}: without
        # MATERIALIZED DuckDB inlines the whole chain twice per round
        # (2^iters plan blowup — measured: iters=8 never finishes)
        ctes.append(f"""vl{k} AS (
  SELECT list(val ORDER BY dim) AS vl FROM v{k - 1}),
s{k} AS (
  SELECT q.vec_id,
         list_sum(list_transform(list_zip(q.q, vl.vl),
                  s -> CAST(s[1] AS HUGEINT) * s[2])) AS sv
  FROM qv q, vl{k} vl),
w{k} AS MATERIALIZED (
  SELECT t.dim, SUM(CAST(t.x AS HUGEINT) * s.sv) AS wv
  FROM qd t JOIN s{k} s USING (vec_id) GROUP BY 1),
mx{k} AS (SELECT greatest(MAX(ABS(wv)), 1) AS m FROM w{k}),
v{k} AS MATERIALIZED (
  SELECT dim,
         CASE WHEN wv < 0 THEN -((-wv) * {v_scale} // mx.m)
              ELSE wv * {v_scale} // mx.m END AS val
  FROM w{k}, mx{k} mx)""")
    chain = ",\n".join(ctes)
    if final is None:
        final = (f"SELECT CAST(dim AS BIGINT) AS dim, "
                 f"CAST(val AS BIGINT) AS v\n"
                 f"FROM v{iters} ORDER BY dim")
    return f"""WITH {chain}
{final}
"""


def events_hdr_quantiles(sf_dir: str):
    """HDR-histogram quantile sketch per event type (sketches.
    hdr_quantiles): values collapse to power-of-two buckets keeping 4
    significant bits (relative error <= 1/8), p50/p95/p99 read off the
    value-range-bounded histogram — no sort, no raw-row shuffle. The
    exact quantile (identical integer rank rule) rides along so each
    row reports its own err_ppm, and the oracle replays bucketing via
    length(printf('%b', cents)) bit arithmetic."""
    rd = _rd()
    from ..stages.sketches import hdr_quantiles

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return hdr_quantiles(ev, key="event_type", value_col="value",
                         sub_bits=_HDR_SUB_BITS)


_HDR_SUB_BITS = 3


def _hdr_quantiles_sql(sub_bits: int = _HDR_SUB_BITS) -> str:
    return f"""
WITH c AS (
  SELECT event_type,
         CAST(round_even(value * 100, 0) AS BIGINT) AS cents
  FROM events),
b AS (
  SELECT event_type, cents,
         length(printf('%b', greatest(cents, 0))) - 1 AS m
  FROM c),
q AS (
  SELECT event_type, cents,
         CASE WHEN cents < 1 OR m <= {sub_bits} THEN cents
              ELSE (cents >> (m - {sub_bits})) << (m - {sub_bits})
         END AS lo
  FROM b),
hs AS (SELECT event_type, lo, COUNT(*) AS cnt FROM q GROUP BY 1, 2),
hx AS (SELECT event_type, cents AS lo, COUNT(*) AS cnt
       FROM q GROUP BY 1, 2),
n AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM hs
      GROUP BY 1),
ps AS (SELECT unnest([500000, 950000, 990000]) AS p_ppm),
cs AS (SELECT event_type, lo,
              SUM(cnt) OVER (PARTITION BY event_type ORDER BY lo)
                  AS cum
       FROM hs),
cx AS (SELECT event_type, lo,
              SUM(cnt) OVER (PARTITION BY event_type ORDER BY lo)
                  AS cum
       FROM hx),
est AS (
  SELECT c.event_type, p.p_ppm, MIN(c.lo) AS est_cents
  FROM cs c JOIN n USING (event_type) CROSS JOIN ps p
  WHERE CAST(c.cum AS HUGEINT) * 1000000 >= CAST(p.p_ppm AS HUGEINT) * n.n
  GROUP BY 1, 2),
ext AS (
  SELECT c.event_type, p.p_ppm, MIN(c.lo) AS exact_cents
  FROM cx c JOIN n USING (event_type) CROSS JOIN ps p
  WHERE CAST(c.cum AS HUGEINT) * 1000000 >= CAST(p.p_ppm AS HUGEINT) * n.n
  GROUP BY 1, 2)
SELECT e.event_type, CAST(e.p_ppm AS BIGINT) AS p_ppm, n.n,
       e.est_cents, x.exact_cents,
       (x.exact_cents - e.est_cents) * 1000000
           // greatest(x.exact_cents, 1) AS err_ppm
FROM est e JOIN ext x USING (event_type, p_ppm) JOIN n USING (event_type)
ORDER BY 1, 2
"""


_GINI_MIN_N, _GINI_K = 20, 20


def events_gini(sf_dir: str):
    """Per-user behavioral-diversity Gini impurity — the exact integer
    segmentation statistic (1 - sum p_i^2 as ``(n^2 - sum c_i^2) * 1e6
    // n^2``, no float probabilities): users with >= 20 events ranked
    by most-diverse-first. The entropy cousin without the libm seam.

    Scale shape: ONE user-hash fat-bucket shuffle of per-block
    (user, type, cnt) partials; each bucket owns its users outright,
    folds counts, computes gini in Python bigints (overflow-free at
    any per-user volume, mirroring the oracle's HUGEINT), and emits
    only its local top-20 — the driver merges #buckets x 20 rows."""
    from ..stages.text_analysis import _mix64_np
    from ..stages.window import _default_buckets

    rd = _rd()
    nb = _default_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        t = (pa.table({"u": batch.column("user_id"),
                       "s": batch.column("event_type")})
             .group_by(["u", "s"]).aggregate([([], "count_all")])
             .rename_columns(["u", "s", "cnt"]))
        uv = np.asarray(t.column("u"), dtype=np.int64)
        kb = (_mix64_np(uv.view(np.uint64)) % np.uint64(nb)) \
            .astype(np.int64)
        return t.append_column("_kb", pa.array(kb, pa.int64()))

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        c = group.groupby(["u", "s"], as_index=False)["cnt"].sum()
        rows = []
        for u, g in c.groupby("u"):
            cs = [int(x) for x in g["cnt"]]
            n = sum(cs)
            if n < _GINI_MIN_N:
                continue
            c2 = sum(x * x for x in cs)
            rows.append((int(u), n,
                         (n * n - c2) * 1_000_000 // (n * n)))
        rows.sort(key=lambda r: (-r[2], r[0]))
        rows = rows[:_GINI_K]
        return pd.DataFrame({"user_id": [r[0] for r in rows],
                             "n": [r[1] for r in rows],
                             "gini_ppm": [r[2] for r in rows]})

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    out = (ev.map_batches(prep, batch_format="pyarrow")
           .groupby("_kb").map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    out = out.sort_values(["gini_ppm", "user_id"],
                          ascending=[False, True]).head(_GINI_K)
    return pa.table({"user_id": pa.array(out["user_id"].astype("int64"),
                                         pa.int64()),
                     "n": pa.array(out["n"].astype("int64"), pa.int64()),
                     "gini_ppm": pa.array(out["gini_ppm"].astype("int64"),
                                          pa.int64())})


_EVENTS_GINI_SQL = f"""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY 1, 2),
u AS (
  SELECT user_id, SUM(c) AS n, SUM(c * c) AS c2
  FROM c GROUP BY 1)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST((n * n - c2) * 1000000 // (n * n) AS BIGINT) AS gini_ppm
FROM u WHERE n >= {_GINI_MIN_N}
ORDER BY gini_ppm DESC, user_id LIMIT {_GINI_K}
"""


def docs_textrank(sf_dir: str):
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — integer
    PageRank over the adjacent-token co-occurrence graph, top-20 terms
    (graph.textrank_keywords). The corpus-sized work is the distributed
    edge extraction (per-block distinct pairs, one vocab-bounded
    groupby); the 10-round rank iteration runs on the vocab graph in
    the corpus-size-free centroid shape. Oracle = positional-token
    adjacency replay + the unrolled-CTE integer recurrence."""
    rd = _rd()
    from ..stages.graph import textrank_keywords

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])
    return textrank_keywords(docs, iters=_TEXTRANK_ITERS,
                             scale=_PAGERANK_SCALE, topk=20)


_TEXTRANK_ITERS = 10


def _textrank_sql(iters: int = _TEXTRANK_ITERS,
                  scale: int = _PAGERANK_SCALE) -> str:
    parts = [rf"""
WITH tl AS (
  SELECT doc_id, regexp_split_to_array(text, '\s+') AS arr
  FROM documents),
tok AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS i
  FROM tl),
tf AS (SELECT doc_id, tok, i FROM tok WHERE tok <> ''),
seq AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
  FROM tf),
edges AS MATERIALIZED (
  SELECT DISTINCT least(x.tok, y.tok) AS a, greatest(x.tok, y.tok) AS b
  FROM seq x JOIN seq y
    ON x.doc_id = y.doc_id AND y.j = x.j + 1 AND x.tok <> y.tok),
dir AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM edges
  UNION ALL SELECT b, a FROM edges),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM dir GROUP BY 1),
nodes AS MATERIALIZED (SELECT DISTINCT tok AS node FROM tf),
n AS (SELECT COUNT(*) AS c FROM nodes),
r0 AS (SELECT node, CAST({scale} // n.c AS BIGINT) AS r FROM nodes, n)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
s{k} AS (
  SELECT d.dst AS node, SUM(r.r // g.deg) AS s
  FROM dir d JOIN r{k - 1} r ON r.node = d.src
  JOIN deg g ON g.src = d.src GROUP BY 1),
r{k} AS MATERIALIZED (
  SELECT p.node,
         CAST((15 * ({scale} // n.c) + 85 * coalesce(s.s, 0)) // 100
              AS BIGINT) AS r
  FROM r0 p CROSS JOIN n LEFT JOIN s{k} s ON s.node = p.node)""")
    parts.append(f"""
SELECT node AS term, r AS rank_scaled FROM r{iters}
ORDER BY r DESC, term LIMIT 20
""")
    return "".join(parts)


_MARKOV_ITERS, _MARKOV_VSCALE = 8, 10_000


def events_markov_stationary(sf_dir: str):
    """Stationary distribution of the user event-type Markov chain
    (window.markov_stationary): transition counts via the proven
    fat-bucket bigram kernel (the only corpus-sized pass), then integer
    power iteration on the |types|^2 chain driver-side — behavioral
    steady-state weights per event type. Oracle = the LAG transition
    replay + unrolled HUGEINT recurrence CTEs."""
    rd = _rd()
    from ..stages.window import markov_stationary

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id"])
    return markov_stationary(ds, iters=_MARKOV_ITERS,
                             v_scale=_MARKOV_VSCALE)


def _markov_stationary_sql(iters: int = _MARKOV_ITERS,
                           v_scale: int = _MARKOV_VSCALE) -> str:
    parts = [f"""
WITH s AS (
    SELECT event_type,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events),
c AS MATERIALIZED (
    SELECT prev AS a, event_type AS b, CAST(COUNT(*) AS HUGEINT) AS cnt
    FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
rs AS MATERIALIZED (SELECT a, SUM(cnt) AS rs FROM c GROUP BY 1),
st AS MATERIALIZED (
    SELECT a AS t FROM c UNION SELECT b FROM c),
v0 AS (SELECT t, CAST({v_scale} AS HUGEINT) AS v FROM st)"""]
    for k in range(1, iters + 1):
        parts.append(f""",
w{k} AS MATERIALIZED (
  SELECT c.b AS t, SUM(v.v * c.cnt // rs.rs) AS wv
  FROM c JOIN v{k - 1} v ON v.t = c.a JOIN rs ON rs.a = c.a
  GROUP BY 1),
mx{k} AS (SELECT greatest(MAX(wv), 1) AS m FROM w{k}),
v{k} AS MATERIALIZED (
  SELECT st.t, coalesce(w.wv, 0) * {v_scale} // mx.m AS v
  FROM st LEFT JOIN w{k} w ON w.t = st.t, mx{k} mx)""")
    parts.append(f"""
SELECT t AS state, CAST(v AS BIGINT) AS v FROM v{iters} ORDER BY state
""")
    return "".join(parts)


_KMVOPS_K = 256


def events_kmv_setops(sf_dir: str):
    """KMV set-operation sketch (Beyer et al. 2007): distinct-user
    union/intersection estimates between the click and purchase
    audiences from two bottom-256 mix64 sketches (sketches.kmv_set_ops)
    — audience-overlap estimation without co-locating the sets. The
    exact intersection rides along as the error report; the oracle
    replays sketches, estimators and the Jaccard read-off with the
    shared u64 macro kernel."""
    from ..stages.sketches import kmv_set_ops

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    return kmv_set_ops(ev, "user_id", "event_type", "click", "purchase",
                       k=_KMVOPS_K)


def _kmv_setops_sql(k: int = _KMVOPS_K) -> str:
    from . import oracle_kernels as _ok

    est = ("CASE WHEN (SELECT COUNT(*) FROM {t}) < {k} "
           "THEN (SELECT COUNT(*) FROM {t}) "
           "ELSE CAST(({k} - 1) * 18446744073709551616::HUGEINT "
           "// CAST((SELECT MAX(h) FROM {t}) AS HUGEINT) AS BIGINT) END")
    return f"""{_ok.U64_PRELUDE}
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'click'),
b AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'),
ka AS (SELECT mix64(CAST(user_id AS UBIGINT)) AS h FROM a
       ORDER BY 1 LIMIT {k}),
kb AS (SELECT mix64(CAST(user_id AS UBIGINT)) AS h FROM b
       ORDER BY 1 LIMIT {k}),
ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
       ORDER BY h LIMIT {k}),
stats AS (
  SELECT {est.format(t="ka", k=k)} AS est_a,
         {est.format(t="kb", k=k)} AS est_b,
         {est.format(t="ku", k=k)} AS est_union,
         (SELECT COUNT(*) FROM ku
          WHERE h IN (SELECT h FROM ka)
            AND h IN (SELECT h FROM kb)) AS n_both,
         (SELECT COUNT(*) FROM ku) AS ku_n,
         (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS exact_inter)
SELECT est_a, est_b, est_union,
       CAST(n_both * est_union // greatest(ku_n, 1) AS BIGINT)
           AS est_inter,
       CAST(exact_inter AS BIGINT) AS exact_inter
FROM stats
"""


def events_peak_concurrency(sf_dir: str):
    """Per-day peak concurrent sessions (window.peak_concurrency) —
    the capacity-planning occupancy statistic: +1/-1 session-boundary
    sweep with exact cross-midnight carry, peaks read at start
    instants. Oracle = the house sessionization replay + a global
    window-SUM sweep (independent plan, same semantics)."""
    rd = _rd()
    from ..stages.window import peak_concurrency

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    return peak_concurrency(ev)


_PEAK_CONCURRENCY_SQL = """
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER win > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts)),
numbered AS (
  SELECT user_id, t,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
sess AS (SELECT user_id, sid, MIN(t) AS s, MAX(t) AS e
         FROM numbered GROUP BY user_id, sid),
bounds AS (
  SELECT s AS t, 1 AS d FROM sess
  UNION ALL SELECT e + 1, -1 FROM sess),
inst AS (SELECT t, SUM(d) AS nd,
                MAX(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS st
         FROM bounds GROUP BY t),
cum AS (SELECT t, st, SUM(nd) OVER (ORDER BY t) AS c FROM inst)
SELECT -- FLOOR division (numpy semantics, the locf idiom)
       ((t) - (((t) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
       CAST(MAX(c) AS BIGINT) AS peak
FROM cum WHERE st = 1 GROUP BY 1 ORDER BY 1
"""


_PROFILE_SPEC = {
    "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
    "l_quantity": "cents", "l_extendedprice": "cents",
    "l_discount": "cents", "l_returnflag": "str", "l_linestatus": "str",
    "l_shipdate": "ts",
}


def lineitem_profile(sf_dir: str):
    """Data-quality column profiler over lineitem (sketches.
    profile_table): per column, rows / nulls / HLL-256 distinct
    estimate / integer-view min-max — the standard first pass of a
    100-TB ingest, one map + one bounded groupby. The oracle replays
    the integer views, the mix64/fnv1a hashing and the rational-alpha
    HLL estimator per column."""
    from ..stages.sketches import profile_table

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=sorted(_PROFILE_SPEC))
    return profile_table(ds, _PROFILE_SPEC)


def _profile_sql(p: int = 8) -> str:
    from . import oracle_kernels as _ok

    m, q = 1 << p, 64 - p
    iv_expr = {
        "int": "CAST({c} AS BIGINT)",
        "cents": "CAST(round_even({c} * 100, 0) AS BIGINT)",
        "ts": "epoch_us({c})",
        "str": "CAST(length({c}) AS BIGINT)",
    }
    sels = []
    for c, kind in sorted(_PROFILE_SPEC.items()):
        iv = iv_expr[kind].format(c=c)
        h = (f"mix64(fnv1a({c}))" if kind == "str"
             else f"mix64(CAST({iv} AS UBIGINT))")
        sels.append(f"""SELECT '{c}' AS col, {iv} AS iv, {h} AS h
  FROM lineitem WHERE {c} IS NOT NULL""")
        sels.append(f"""SELECT '{c}' AS col, NULL AS iv, NULL AS h
  FROM lineitem WHERE {c} IS NULL""")
    unioned = "\n  UNION ALL ".join(sels)
    return f"""{_ok.U64_PRELUDE}
WITH v AS ({unioned}),
base AS (
  SELECT col, COUNT(*) AS n, COUNT(*) - COUNT(iv) AS n_null,
         COALESCE(MIN(iv), 0) AS min_i, COALESCE(MAX(iv), 0) AS max_i
  FROM v GROUP BY col),
r AS (SELECT col, CAST(h >> {q} AS BIGINT) AS reg0,
             h & {(1 << q) - 1}::UBIGINT AS w
      FROM v WHERE h IS NOT NULL),
rr AS (SELECT col, reg0,
              CASE WHEN w > 0 THEN {q} - (length(bin(w)) - 1)
                   ELSE {q} + 1 END AS rho
       FROM r),
regs AS (SELECT col, reg0, MAX(rho) AS rho FROM rr GROUP BY 1, 2),
sk AS (SELECT col, COUNT(*) AS filled,
              ({m} - COUNT(*)) * (1::HUGEINT << {q + 1})
              + SUM(1::HUGEINT << ({q + 1} - rho)) AS s_val
       FROM regs GROUP BY col)
SELECT b.col AS "column", CAST(b.n AS BIGINT) AS n,
       CAST(b.n_null AS BIGINT) AS n_null,
       CAST(COALESCE(
           7213::HUGEINT * {m ** 3} * (1::HUGEINT << {q + 1})
           // (10::HUGEINT * {1000 * m + 1079} * sk.s_val), 0)
           AS BIGINT) AS n_distinct_est,
       b.min_i, b.max_i
FROM base b LEFT JOIN sk ON sk.col = b.col
ORDER BY 1
"""


def events_orc_roundtrip(sf_dir: str):
    """ORC source/sink coverage (this Ray build has no read_orc, so the
    reader is read_binary_files + a vectorized pyarrow.orc decode stage
    — the docs_ipc_roundtrip contract with a columnar-warehouse
    format): write events as one ORC file per block worker-side,
    re-ingest, and aggregate per-type stats from the re-read dataset;
    any row loss, type mangling or timestamp-unit drift in the ORC
    writer/reader breaks the value hash against the parquet-direct
    oracle."""
    import os
    import shutil
    import tempfile

    from ray.data.aggregate import Count, Min, Sum

    rd = _rd()
    out = tempfile.mkdtemp(prefix="orc_rt_", dir="/tmp")
    try:
        def write_part(batch: pa.Table) -> pa.Table:
            import hashlib

            from pyarrow import orc

            # content-derived name: a retried block overwrites its own
            # file instead of double-counting under a fresh uuid
            ids = np.asarray(batch.column("event_id"), dtype=np.int64)
            tag = hashlib.md5(ids.tobytes()).hexdigest()[:16]
            path = os.path.join(out, f"part-{tag}.orc")
            orc.write_table(batch, path)
            return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

        def prep(batch: pa.Table) -> pa.Table:
            cents = np.rint(np.asarray(batch.column("value"),
                                       dtype=np.float64) * 100) \
                .astype(np.int64)
            return pa.table({"event_id": batch.column("event_id"),
                             "event_type": batch.column("event_type"),
                             "cents": pa.array(cents, pa.int64())})

        (rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
         .map_batches(prep, batch_format="pyarrow")
         .map_batches(write_part, batch_format="pyarrow").materialize())

        def decode(batch: pa.Table) -> pa.Table:
            from pyarrow import orc

            tables = [orc.read_table(pa.BufferReader(b))
                      for b in batch.column("bytes").to_pylist()]
            return pa.concat_tables(tables) if tables else pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "event_type": pa.array([], pa.string()),
                 "cents": pa.array([], pa.int64())})

        back = rd.read_binary_files(out).map_batches(
            decode, batch_format="pyarrow")
        res = (back.groupby("event_type")
               .aggregate(Count(alias_name="n"),
                          Sum("cents", alias_name="sum_cents"),
                          Min("event_id", alias_name="min_event"))
               .to_pandas().sort_values("event_type")
               .reset_index(drop=True))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return pa.table({
        "event_type": pa.array(res["event_type"].astype(str), pa.string()),
        "n": pa.array(res["n"].astype("int64"), pa.int64()),
        "sum_cents": pa.array(res["sum_cents"].astype("int64"), pa.int64()),
        "min_event": pa.array(res["min_event"].astype("int64"),
                              pa.int64())})


_ORC_ROUNDTRIP_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(MIN(event_id) AS BIGINT) AS min_event
FROM events GROUP BY event_type ORDER BY event_type
"""


_HAAR_PAD, _HAAR_LEVELS, _HAAR_K = 64, 6, 10


def events_haar(sf_dir: str):
    """Integer Haar wavelet energy audit of the daily event-count
    series — which time scales (daily vs weekly vs monthly) carry the
    signal, the seasonality-detection primitive without any float
    normalization: unnormalized Haar (sum / difference pairs, exact in
    integers) over the zero-padded 64-day grid, top-10 coefficients by
    |value|. The corpus-sized work is the daily-count fold (map-side
    partials + one tiny groupby); the 64-point transform is
    corpus-size-free driver arithmetic, and the oracle unrolls all 6
    levels as CTEs."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def day_partial(batch: pa.Table) -> pa.Table:
        from ..stages.window import _epoch_us

        day = _epoch_us(batch.column("ts")) // 86_400_000_000
        d, c = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = (rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
             .map_batches(day_partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    if len(daily) == 0:
        return pa.table({"level": pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "coef": pa.array([], pa.int64())})
    d0 = int(daily["day"].min())
    idx = daily["day"].to_numpy(np.int64) - d0
    series = [0] * _HAAR_PAD
    for i, n in zip(idx, daily["n"].to_numpy(np.int64)):
        if i < _HAAR_PAD:  # beyond-grid days drop, like the oracle's
            series[int(i)] = int(n)  # grid LEFT JOIN
    
    coefs = []  # (level, pos, coef)
    cur = series
    for lvl in range(1, _HAAR_LEVELS + 1):
        nxt, diffs = [], []
        for j in range(len(cur) // 2):
            nxt.append(cur[2 * j] + cur[2 * j + 1])
            diffs.append(cur[2 * j] - cur[2 * j + 1])
        coefs.extend((lvl, j, c) for j, c in enumerate(diffs))
        cur = nxt
    coefs.append((_HAAR_LEVELS + 1, 0, cur[0]))  # the final smooth
    coefs.sort(key=lambda r: (-abs(r[2]), r[0], r[1]))
    top = coefs[:_HAAR_K]
    return pa.table({"level": pa.array([r[0] for r in top], pa.int64()),
                     "pos": pa.array([r[1] for r in top], pa.int64()),
                     "coef": pa.array([r[2] for r in top], pa.int64())})


def _haar_sql(pad: int = _HAAR_PAD, levels: int = _HAAR_LEVELS,
              k: int = _HAAR_K) -> str:
    parts = [f"""
WITH d AS (
  SELECT -- FLOOR division (numpy semantics, the locf idiom)
         ((epoch_us(ts)) - (((epoch_us(ts)) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
m AS (SELECT MIN(day) AS d0 FROM d),
grid AS (SELECT unnest(range(0, {pad})) AS i),
s0 AS (
  SELECT g.i, COALESCE(x.n, 0) AS v
  FROM grid g LEFT JOIN (SELECT day - m.d0 AS i, n FROM d, m) x
    USING (i))"""]
    for lv in range(1, levels + 1):
        parts.append(f""",
s{lv} AS (SELECT i // 2 AS i, SUM(v) AS v FROM s{lv - 1} GROUP BY 1),
d{lv} AS (SELECT i // 2 AS pos,
                 SUM(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS coef
          FROM s{lv - 1} GROUP BY 1)""")
    coefs = " UNION ALL ".join(
        [f"SELECT {lv} AS level, pos, coef FROM d{lv}"
         for lv in range(1, levels + 1)]
        + [f"SELECT {levels + 1}, 0, v FROM s{levels}"])
    parts.append(f"""
SELECT CAST(level AS BIGINT) AS level, CAST(pos AS BIGINT) AS pos,
       CAST(coef AS BIGINT) AS coef
FROM ({coefs}) ORDER BY ABS(coef) DESC, level, pos LIMIT {k}
""")
    return "".join(parts)


def events_pit_join(sf_dir: str):
    """Point-in-time-correct feature join (window.pit_join) — the
    label-leakage guard every feature store needs: each purchase joins
    the SCD2 run-state of the user's NON-purchase activity valid AT the
    purchase timestamp (never a later version), one key-hash fat-bucket
    shuffle co-locating facts and dimension, merge-order forward-fill
    probe. Oracle = islands SCD2 + interval non-equi join."""
    rd = _rd()
    from ..stages.window import pit_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type",
                                  "event_id", "value"])
    return pit_join(ev)


_PIT_JOIN_SQL = """
WITH np AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id
  FROM events WHERE event_type <> 'purchase'),
c AS (SELECT *, CASE WHEN LAG(event_type) OVER
          (PARTITION BY user_id ORDER BY t, event_id)
          IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg FROM np),
r AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
          ROWS UNBOUNDED PRECEDING) AS run FROM c),
g AS (SELECT user_id, event_type, run, MIN(t) AS vf
      FROM r GROUP BY user_id, event_type, run),
iv AS (SELECT user_id, event_type, vf,
              COALESCE(LEAD(vf) OVER (PARTITION BY user_id
                                      ORDER BY vf, run),
                       9223372036854775807) AS vt
       FROM g),
p AS (SELECT user_id, epoch_us(ts) AS t,
             CAST(round_even(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase')
SELECT iv.event_type AS state, CAST(COUNT(*) AS BIGINT) AS n_facts,
       CAST(SUM(p.cents) AS BIGINT) AS sum_cents
FROM p JOIN iv ON iv.user_id = p.user_id
               AND p.t >= iv.vf AND p.t < iv.vt
GROUP BY 1 ORDER BY 1
"""


def events_holt(sf_dir: str):
    """Holt double-exponential smoothing per event type (window.
    holt_daily, alpha = beta = 1/8, 1e6 fixed point): level + trend +
    one-step forecast over daily counts — EWMA's trend-aware sibling.
    Negative trends divide trunc-toward-zero on both engines; the
    oracle replays the two-state recurrence in one recursive CTE."""
    rd = _rd()
    from ..stages.window import holt_daily

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    return holt_daily(ev)


_HOLT_SQL = """
WITH RECURSIVE d AS (
  SELECT event_type,
         -- FLOOR division (numpy semantics, the locf idiom)
         ((epoch_us(ts)) - (((epoch_us(ts)) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn FROM d),
rec(event_type, rn, day, n, l, b) AS (
  SELECT event_type, rn, day, n, n * 1000000, CAST(0 AS BIGINT)
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.rn, r.day, r.n,
         (r.n * 1000000 + 7 * (rec.l + rec.b)) // 8,
         (((r.n * 1000000 + 7 * (rec.l + rec.b)) // 8 - rec.l)
          + 7 * rec.b) // 8
  FROM rec JOIN r ON r.event_type = rec.event_type
               AND r.rn = rec.rn + 1)
SELECT event_type, CAST(day AS BIGINT) AS day, n,
       CAST(l AS BIGINT) AS level, CAST(b AS BIGINT) AS trend,
       CAST(l + b AS BIGINT) AS forecast
FROM rec ORDER BY event_type, day
"""


def events_winsorize(sf_dir: str):
    """Winsorized robust preprocessing per event type: EXACT p1/p99
    cents bounds from the fixed-point histogram machinery (no sort, no
    sampling — window.group_quantiles), then one clipping pass with the
    tiny per-type bounds broadcast map-side: rows clipped low/high and
    the winsorized sum. The standard outlier-taming step before any
    mean-based statistic; oracle = quantile_disc + LEAST/GREATEST."""
    import ray

    from ..stages.window import group_quantiles

    rd = _rd()
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    q = group_quantiles(ev, key="event_type", value_col="value",
                        ps=[0.01, 0.99]).to_pandas()
    bounds = {r["event_type"]: (int(r["q1_cents"]), int(r["q99_cents"]))
              for _, r in q.iterrows()}
    ref = ray.put(bounds)

    def clip(batch: pa.Table) -> pa.Table:
        from ..stages.dedup import _cached_get

        b = _cached_get(ref)
        typ = batch.column("event_type")
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        # dictionary-encode once per batch: the per-row lookup is two
        # numpy gathers over |types|-sized bound arrays, not a Python
        # dict probe per row
        enc = typ.dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        lo_v = np.asarray([b[t][0] for t in vocab], dtype=np.int64)
        hi_v = np.asarray([b[t][1] for t in vocab], dtype=np.int64)
        idx = np.asarray(enc.indices, dtype=np.int64)
        cents = np.rint(np.asarray(batch.column("value"),
                                   dtype=np.float64) * 100) \
            .astype(np.int64)
        lo = lo_v[idx]
        hi = hi_v[idx]
        w = np.clip(cents, lo, hi)
        part = pa.table({
            "event_type": typ,
            "n": pa.array(np.ones(cents.size, np.int64)),
            "n_lo": pa.array((cents < lo).astype(np.int64)),
            "n_hi": pa.array((cents > hi).astype(np.int64)),
            "wsum_cents": pa.array(w, pa.int64())})
        return (part.group_by(["event_type"])
                .aggregate([("n", "sum"), ("n_lo", "sum"),
                            ("n_hi", "sum"), ("wsum_cents", "sum")])
                .rename_columns(["event_type", "n", "n_lo", "n_hi",
                                 "wsum_cents"]))

    from ray.data.aggregate import Sum

    out = (ev.map_batches(clip, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_lo", alias_name="n_lo"),
                      Sum("n_hi", alias_name="n_hi"),
                      Sum("wsum_cents", alias_name="wsum_cents"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    return pa.table({
        "event_type": pa.array(out["event_type"].astype(str), pa.string()),
        "n": pa.array(out["n"].astype("int64"), pa.int64()),
        "n_lo": pa.array(out["n_lo"].astype("int64"), pa.int64()),
        "n_hi": pa.array(out["n_hi"].astype("int64"), pa.int64()),
        "wsum_cents": pa.array(out["wsum_cents"].astype("int64"),
                               pa.int64())})


_WINSORIZE_SQL = """
WITH c AS (
  SELECT event_type,
         CAST(round_even(value * 100, 0) AS BIGINT) AS cents
  FROM events),
b AS (
  SELECT event_type,
         quantile_disc(cents, 0.01) AS lo,
         quantile_disc(cents, 0.99) AS hi
  FROM c GROUP BY 1)
SELECT c.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (c.cents < b.lo) AS BIGINT) AS n_lo,
       CAST(COUNT(*) FILTER (c.cents > b.hi) AS BIGINT) AS n_hi,
       CAST(SUM(LEAST(GREATEST(c.cents, b.lo), b.hi)) AS BIGINT)
           AS wsum_cents
FROM c JOIN b USING (event_type)
GROUP BY 1 ORDER BY 1
"""


_KNNLAB_Q, _KNNLAB_K = 20, 10


def embeddings_knn_label(sf_dir: str):
    """kNN majority-vote label propagation (similarity.knn_label) —
    classify the first 20 vectors by the majority label of their 10
    nearest candidates (exact integer dots, probes excluded from the
    pool): the weak-supervision primitive. Broadcast probe matrix,
    map-side local top-k, tiny driver vote; exact window-function
    oracle."""
    from ..stages.similarity import knn_label

    rd = _rd()
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    order = np.argsort(np.asarray(tbl.column("vec_id").to_pylist()))
    order = order[:_KNNLAB_Q]
    ids = [int(tbl.column("vec_id")[int(i)].as_py()) for i in order]
    probes = np.asarray(
        [tbl.column("embedding")[int(i)].as_py() for i in order],
        dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    return knn_label(ds, probes, ids, k=_KNNLAB_K)


_KNN_LABEL_SQL = f"""
WITH qv AS (
  SELECT vec_id, label, list_transform(embedding,
         x -> CAST(round_even(CAST(x AS DOUBLE) * 100, 0) AS BIGINT))
      AS q
  FROM embeddings),
probes AS (SELECT * FROM qv ORDER BY vec_id LIMIT {_KNNLAB_Q}),
cands AS (SELECT * FROM qv
          WHERE vec_id NOT IN (SELECT vec_id FROM probes)),
dots AS (
  SELECT p.vec_id AS pid, c.vec_id AS cid, c.label,
         list_sum(list_transform(list_zip(p.q, c.q),
                  s -> s[1] * s[2])) AS dot
  FROM probes p, cands c),
top AS (
  SELECT * FROM (
    SELECT pid, cid, label, dot,
           row_number() OVER (PARTITION BY pid
                              ORDER BY dot DESC, cid) AS rn
    FROM dots) WHERE rn <= {_KNNLAB_K}),
votes AS (SELECT pid, label, COUNT(*) AS v FROM top GROUP BY 1, 2)
SELECT pid AS vec_id,
       CAST(label AS BIGINT) AS pred_label,
       CAST(v AS BIGINT) AS votes
FROM (SELECT pid, label, v,
             row_number() OVER (PARTITION BY pid
                                ORDER BY v DESC, label) AS rn
      FROM votes)
WHERE rn = 1 ORDER BY vec_id
"""


def events_props_extract(sf_dir: str):
    """Semi-structured ETL: extract the integer ``k`` property from the
    JSON ``props`` column with a VECTORIZED Arrow regex kernel
    (pc.extract_regex — no per-row json.loads) and fold per-type stats.
    The oracle parses the same column through DuckDB's real JSON
    extension (json_extract_string) — two independent parsers must
    agree on every value."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    rd = _rd()

    def extract(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        valid = pc.is_valid(k).to_numpy(zero_copy_only=False)
        kv = np.asarray(k.fill_null(0), dtype=np.int64)[valid]
        typ = batch.column("event_type")
        if isinstance(typ, pa.ChunkedArray):
            typ = typ.combine_chunks()
        # unparsed rows DROP before grouping: a type with zero parsed
        # values emits no row on either engine (no NULL/sentinel seam)
        t = pa.table({"event_type": typ.filter(pa.array(valid)),
                      "k": pa.array(kv, pa.int64()),
                      "kmin": pa.array(kv, pa.int64()),
                      "kmax": pa.array(kv, pa.int64())})
        return (t.group_by(["event_type"])
                .aggregate([([], "count_all"), ("k", "sum"),
                            ("kmin", "min"), ("kmax", "max")])
                .rename_columns(["event_type", "n_parsed", "sum_k",
                                 "min_k", "max_k"]))

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    out = (ev.map_batches(extract, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n_parsed", alias_name="n_parsed"),
                      Sum("sum_k", alias_name="sum_k"),
                      Min("min_k", alias_name="min_k"),
                      Max("max_k", alias_name="max_k"))
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    return pa.table({
        "event_type": pa.array(out["event_type"].astype(str), pa.string()),
        "n_parsed": pa.array(out["n_parsed"].astype("int64"), pa.int64()),
        "sum_k": pa.array(out["sum_k"].astype("int64"), pa.int64()),
        "min_k": pa.array(out["min_k"].astype("int64"), pa.int64()),
        "max_k": pa.array(out["max_k"].astype("int64"), pa.int64())})


_PROPS_EXTRACT_SQL = """
WITH j AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_parsed,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM j WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1
"""


_KS_A, _KS_B = "click", "purchase"


def _ab_cents_hist(sf_dir: str):
    """Shared two-sample fold for the drift rows (KS + Mann-Whitney):
    one map pass emits per-block (cents, a, b) count partials for the
    click/purchase populations, one value-range-bounded groupby folds
    them; returns the tiny sorted histogram DataFrame."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        typ = batch.column("event_type")
        cents = np.rint(np.asarray(batch.column("value"),
                                   dtype=np.float64) * 100) \
            .astype(np.int64)
        is_a = pc.equal(typ, _KS_A).to_numpy(zero_copy_only=False)
        is_b = pc.equal(typ, _KS_B).to_numpy(zero_copy_only=False)
        keep = is_a | is_b
        t = pa.table({"cents": pa.array(cents[keep], pa.int64()),
                      "a": pa.array(is_a[keep].astype(np.int64)),
                      "b": pa.array(is_b[keep].astype(np.int64))})
        return (t.group_by(["cents"])
                .aggregate([("a", "sum"), ("b", "sum")])
                .rename_columns(["cents", "a", "b"]))

    return (rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("cents").aggregate(Sum("a", alias_name="a"),
                                        Sum("b", alias_name="b"))
            .to_pandas().sort_values("cents").reset_index(drop=True))


def events_ks_drift(sf_dir: str):
    """EXACT two-sample Kolmogorov-Smirnov distance between the click
    and purchase value distributions — the standard dataset-drift
    detector, computed in pure integers on the value-range-bounded
    cents histogram (no sort of raw rows, no float CDFs):
    D_ppm = max_x |cumA(x) * nB - cumB(x) * nA| * 1e6 // (nA * nB),
    reported with the smallest cents attaining the max. One map pass
    emits per-block (cents, a, b) partials; one bounded groupby folds
    them; the driver scans the tiny histogram."""
    hist = _ab_cents_hist(sf_dir)
    na = int(hist["a"].sum())
    nb = int(hist["b"].sum())
    if na == 0 or nb == 0:
        return pa.table({"n_a": pa.array([na], pa.int64()),
                         "n_b": pa.array([nb], pa.int64()),
                         "d_ppm": pa.array([0], pa.int64()),
                         "at_cents": pa.array([0], pa.int64())})
    ca = cb = 0
    best, at = -1, 0
    for cents, a, b in zip(hist["cents"], hist["a"], hist["b"]):
        ca += int(a)
        cb += int(b)
        num = abs(ca * nb - cb * na)
        if num > best:
            best, at = num, int(cents)
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "d_ppm": pa.array([best * 1_000_000 // (na * nb)], pa.int64()),
        "at_cents": pa.array([at], pa.int64())})


_KS_DRIFT_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round_even(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
h AS (
  SELECT cents,
         CAST(COUNT(*) FILTER (event_type = '{_KS_A}') AS HUGEINT) AS a,
         CAST(COUNT(*) FILTER (event_type = '{_KS_B}') AS HUGEINT) AS b
  FROM c GROUP BY 1),
n AS (SELECT COALESCE(SUM(a), 0) AS na, COALESCE(SUM(b), 0) AS nb
      FROM h),
cum AS (
  SELECT cents, SUM(a) OVER w AS ca, SUM(b) OVER w AS cb
  FROM h WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)),
d AS (SELECT cents, ABS(ca * n.nb - cb * n.na) AS num FROM cum, n),
mx AS (SELECT MAX(num) AS m FROM d)
SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
       CAST(CASE WHEN n.na = 0 OR n.nb = 0 THEN 0
                 ELSE mx.m * 1000000 // (n.na * n.nb) END AS BIGINT)
           AS d_ppm,
       CASE WHEN n.na = 0 OR n.nb = 0 THEN 0
            ELSE (SELECT MIN(cents) FROM d, mx WHERE d.num = mx.m)
       END AS at_cents
FROM n, mx
"""


def events_rank_drift(sf_dir: str):
    """EXACT Mann-Whitney rank-sum drift between the click and purchase
    value distributions — KS's effect-size sibling: U counts
    cross-pairs where a click value beats a purchase value (ties worth
    a half, so everything carries a 2x scale to stay integer):
    U2 = sum_x a(x) * (2 * cumB(x-1) + b(x)). The common-language
    effect size cles_ppm = U2 * 1e6 // (2 * nA * nB) (500000 = no
    drift). Same value-range-bounded histogram fold as the KS row —
    one map pass, one bounded groupby, driver scan in Python bigints.
    """
    hist = _ab_cents_hist(sf_dir)
    na, nb = int(hist["a"].sum()), int(hist["b"].sum())
    if na == 0 or nb == 0:
        return pa.table({"n_a": pa.array([na], pa.int64()),
                         "n_b": pa.array([nb], pa.int64()),
                         "u2": pa.array([0], pa.int64()),
                         "cles_ppm": pa.array([0], pa.int64())})
    cb = 0
    u2 = 0
    for a, b in zip(hist["a"], hist["b"]):
        u2 += int(a) * (2 * cb + int(b))
        cb += int(b)
    return pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "cles_ppm": pa.array([u2 * 1_000_000 // (2 * na * nb)],
                             pa.int64())})


_RANK_DRIFT_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round_even(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
h AS (
  SELECT cents,
         CAST(COUNT(*) FILTER (event_type = '{_KS_A}') AS HUGEINT) AS a,
         CAST(COUNT(*) FILTER (event_type = '{_KS_B}') AS HUGEINT) AS b
  FROM c GROUP BY 1),
n AS (SELECT COALESCE(SUM(a), 0) AS na, COALESCE(SUM(b), 0) AS nb
      FROM h),
cum AS (
  SELECT a, b,
         COALESCE(SUM(b) OVER (ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cb
  FROM h),
u AS (SELECT COALESCE(SUM(a * (2 * cb + b)), 0) AS u2 FROM cum)
SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
       CAST(CASE WHEN n.na = 0 OR n.nb = 0 THEN 0 ELSE u.u2 END
            AS BIGINT) AS u2,
       CAST(CASE WHEN n.na = 0 OR n.nb = 0 THEN 0
                 ELSE u.u2 * 1000000 // (2 * n.na * n.nb) END
            AS BIGINT) AS cles_ppm
FROM n, u
"""


def _pk_dup_rows(ds, keys: list, driver_limit: int = 1 << 22) -> int:
    """Rows beyond the first per key (sum of max(c-1, 0)): map-side
    per-block (key, cnt) partials; under ``driver_limit`` input rows
    the key-bounded partials fold on the driver with one pyarrow
    group_by (zero shuffles), above it one groupby-Sum + map-side
    fold."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.select(keys).group_by(keys)
                .aggregate([([], "count_all")])
                .rename_columns(keys + ["c"]))

    def excess(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch.column("c"), dtype=np.int64)
        return pa.table({"v": pa.array([int((c - 1).clip(0).sum())],
                                       pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    if ds.count() <= driver_limit:
        t = _gather(parts)
        tot = t.group_by(keys).aggregate([("c", "sum")])
        c = np.asarray(tot.column("c_sum"), dtype=np.int64)
        return int((c - 1).clip(0).sum())
    return int(parts.groupby(keys).aggregate(Sum("c", alias_name="c"))
               .map_batches(excess, batch_format="pyarrow")
               .to_pandas()["v"].sum())


def _fk_orphan_rows(child, key_c: str, parent, key_p: str,
                    driver_limit: int = 1 << 22) -> int:
    """Child rows whose key has no parent: both sides reduce to
    per-block (key, child_rows, parent_hits) partials on ONE tagged
    stream. Under ``driver_limit`` total input rows the key-bounded
    partials fold on the driver (one pyarrow group_by, zero shuffles);
    above it one groupby-Sum co-locates them and orphans fold map-side
    — the distributed anti-join count (no broadcast, no driver set)."""
    from ray.data.aggregate import Sum

    def side(keys_col: str, is_child: bool):
        def f(batch: pa.Table) -> pa.Table:
            k, c = np.unique(np.asarray(batch.column(keys_col),
                                        dtype=np.int64),
                             return_counts=True)
            return pa.table({
                "k": pa.array(k, pa.int64()),
                "child_rows": pa.array(
                    c.astype(np.int64) if is_child
                    else np.zeros(k.size, np.int64)),
                "parent_hits": pa.array(
                    np.zeros(k.size, np.int64) if is_child
                    else np.ones(k.size, np.int64))})
        return f

    stream = (child.map_batches(side(key_c, True),
                                batch_format="pyarrow")
              .union(parent.map_batches(side(key_p, False),
                                        batch_format="pyarrow")))

    def orphans(batch: pa.Table) -> pa.Table:
        cr = np.asarray(batch.column("child_rows"), dtype=np.int64)
        ph = np.asarray(batch.column("parent_hits"), dtype=np.int64)
        return pa.table({"v": pa.array([int(cr[ph == 0].sum())],
                                       pa.int64())})

    if child.count() + parent.count() <= driver_limit:
        t = _gather(stream)
        tot = t.group_by("k").aggregate([("child_rows", "sum"),
                                         ("parent_hits", "sum")])
        cr = np.asarray(tot.column("child_rows_sum"), dtype=np.int64)
        ph = np.asarray(tot.column("parent_hits_sum"), dtype=np.int64)
        return int(cr[ph == 0].sum())
    return int(stream.groupby("k")
               .aggregate(Sum("child_rows", alias_name="child_rows"),
                          Sum("parent_hits", alias_name="parent_hits"))
               .map_batches(orphans, batch_format="pyarrow")
               .to_pandas()["v"].sum())


def integrity_checks(sf_dir: str):
    """Referential-integrity audit — the constraint-validation pass a
    100-TB ingest runs before anything else: primary-key uniqueness
    (duplicate rows beyond the first) for orders and lineitem, and
    foreign-key orphan rows for lineitem -> orders and orders ->
    customer. Each check is one bounded shuffle (count partials or the
    tagged-stream distributed anti-join); nothing corpus-sized touches
    the driver. All-zero on clean TPC-H data — the oracle proves the
    CHECKS compute the right thing, the pytest proves they FIRE."""
    rd = _rd()
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    checks = [
        ("pk_orders", _pk_dup_rows(orders, ["o_orderkey"])),
        ("pk_lineitem", _pk_dup_rows(li, ["l_orderkey",
                                          "l_linenumber"])),
        ("fk_lineitem_orders", _fk_orphan_rows(
            li, "l_orderkey", orders, "o_orderkey")),
        ("fk_orders_customer", _fk_orphan_rows(
            orders, "o_custkey", cust, "c_custkey")),
    ]
    return pa.table({
        "check": pa.array([c[0] for c in checks], pa.string()),
        "n_violations": pa.array([c[1] for c in checks], pa.int64())})


_INTEGRITY_SQL = """
SELECT 'fk_lineitem_orders' AS check,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT) AS n_violations
UNION ALL
SELECT 'fk_orders_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT)
UNION ALL
SELECT 'pk_lineitem',
       CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
           SELECT COUNT(*) AS c FROM lineitem
           GROUP BY l_orderkey, l_linenumber) WHERE c > 1) AS BIGINT)
UNION ALL
SELECT 'pk_orders',
       CAST((SELECT COALESCE(SUM(c - 1), 0) FROM (
           SELECT COUNT(*) AS c FROM orders
           GROUP BY o_orderkey) WHERE c > 1) AS BIGINT)
ORDER BY 1
"""


def embeddings_pca_scores(sf_dir: str):
    """Linear-probe readout composing the PCA row: every embedding
    projects onto the top principal direction (similarity.pca_power's
    integer iterate, broadcast into one map pass — NOT recomputed per
    batch), folded to per-label (n, sum of integer projections) — do
    the class labels separate along the corpus's top direction? The
    oracle re-derives the identical direction through the unrolled
    HUGEINT CTE chain and replays the projection join."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.similarity import pca_power

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])
    direction = np.asarray(
        pca_power(ds, iters=_PCA_ITERS, scale=100,
                  v_scale=_PCA_VSCALE).column("v"), dtype=np.int64)
    ref = ray.put(direction)

    def project(batch: pa.Table) -> pa.Table:
        from ..stages.dedup import _cached_get
        from ..stages.similarity import _batch_embeddings

        v = _cached_get(ref)
        q = np.rint(_batch_embeddings(batch) * 100).astype(np.int64)
        proj = q @ v  # exact int64 (|q| <= ~4e2, |v| <= 1e4, d = 64)
        labs = np.asarray(batch.column("label").to_pylist(),
                          dtype=np.int64)
        return pa.table({"label": pa.array(labs, pa.int64()),
                         "proj": pa.array(proj, pa.int64())})

    full = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["embedding", "label"])
    out = (full.map_batches(project, batch_format="pyarrow")
           .groupby("label").aggregate(Count(alias_name="n"),
                                       Sum("proj", alias_name="sum_proj"))
           .to_pandas().sort_values("label").reset_index(drop=True))
    return pa.table({
        "label": pa.array(out["label"].astype("int64"), pa.int64()),
        "n": pa.array(out["n"].astype("int64"), pa.int64()),
        "sum_proj": pa.array(out["sum_proj"].astype("int64"),
                             pa.int64())})


def _pca_scores_sql() -> str:
    """The pca_power CTE chain with a projection tail: two extra CTEs
    (final iterate as a list, per-vector HUGEINT dot) and the per-label
    fold, spliced in through _pca_power_sql's final-SELECT hook."""
    tail = f"""lv AS (SELECT list(val ORDER BY dim) AS vl
      FROM v{_PCA_ITERS}),
pr AS (
  SELECT e.label,
         list_sum(list_transform(list_zip(q.q, lv.vl),
                  s -> CAST(s[1] AS HUGEINT) * s[2])) AS proj
  FROM qv q JOIN embeddings e USING (vec_id), lv)
SELECT CAST(label AS BIGINT) AS label, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(proj) AS BIGINT) AS sum_proj
FROM pr GROUP BY 1 ORDER BY 1"""
    return _pca_power_sql(final=", " + tail)


def docs_assortativity(sf_dir: str):
    """Degree assortativity of the site link graph as exact integer
    sufficient statistics + assembled r_ppm (graph.degree_
    assortativity): do high-degree pages link to high-degree pages?
    The only pair-level term (sxy) takes one hash join + groupby-Sum
    (neighbor-degree sums); sx/sxx fold straight off the degree
    table. Oracle replays the 4-arm edge rule, degrees and the
    trunc-division assembly."""
    rd = _rd()
    from ..stages.graph import degree_assortativity, site_edges

    n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    ids = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id"])
    return degree_assortativity(site_edges(ids, n))


_ASSORTATIVITY_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
raw AS (
    SELECT d.doc_id AS a, 2 * d.doc_id + 1 AS b
    FROM documents d, n WHERE 2 * d.doc_id + 1 < n.n
    UNION ALL
    SELECT d.doc_id, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT 2 * d.doc_id + 1, 2 * d.doc_id + 2
    FROM documents d, n WHERE 2 * d.doc_id + 2 < n.n
    UNION ALL
    SELECT least(d.doc_id, (7 * d.doc_id + 3) % n.n),
           greatest(d.doc_id, (7 * d.doc_id + 3) % n.n)
    FROM documents d, n WHERE (7 * d.doc_id + 3) % n.n <> d.doc_id
),
edges AS (SELECT DISTINCT a, b FROM raw),
dir AS (SELECT a AS s, b AS d FROM edges UNION ALL SELECT b, a FROM edges),
deg AS (SELECT s AS node, CAST(COUNT(*) AS HUGEINT) AS deg
        FROM dir GROUP BY 1),
sv AS (SELECT d.d AS node, SUM(g.deg) AS sn
       FROM dir d JOIN deg g ON g.node = d.s GROUP BY 1),
agg AS (SELECT SUM(deg) AS m2, SUM(deg * deg) AS sx,
               SUM(deg * deg * deg) AS sxx FROM deg),
xy AS (SELECT SUM(g.deg * s.sn) AS sxy
       FROM deg g JOIN sv s USING (node))
SELECT CAST(agg.m2 AS BIGINT) AS m2, CAST(agg.sx AS BIGINT) AS sx,
       CAST(agg.sxx AS BIGINT) AS sxx, CAST(xy.sxy AS BIGINT) AS sxy,
       CAST(CASE WHEN agg.m2 * agg.sxx - agg.sx * agg.sx = 0 THEN 0
                 ELSE (agg.m2 * xy.sxy - agg.sx * agg.sx) * 1000000
                      // (agg.m2 * agg.sxx - agg.sx * agg.sx)
            END AS BIGINT) AS r_ppm
FROM agg, xy
"""


def events_best_streak(sf_dir: str):
    """Maximum-sum contiguous streak (Kadane / max-subarray) of daily
    purchase revenue ABOVE the period average, division-free: each
    observed day's value is ``day_cents * n_days - total_cents`` (the
    mean-deviation scaled by n_days, exact in integers), and the best
    above-average run is ``max_j (cum_j - min_{i<j} cum_i)`` — the
    classic hot-period detector. One (day -> cents) groupby fold is the
    corpus work; the day-ordered scan is driver arithmetic. Oracle =
    cumulative window + prefix-MIN window + earliest-day argmax."""
    from ray.data.aggregate import Sum

    rd = _rd()

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.window import _epoch_us

        keep = pc.equal(batch.column("event_type"),
                        "purchase").to_numpy(zero_copy_only=False)
        day = (_epoch_us(batch.column("ts")) // 86_400_000_000)[keep]
        cents = np.rint(np.asarray(batch.column("value"),
                                   dtype=np.float64) * 100) \
            .astype(np.int64)[keep]
        d, inv = np.unique(day, return_inverse=True)
        csum = np.zeros(d.size, np.int64)
        np.add.at(csum, inv, cents)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "cents": pa.array(csum, pa.int64())})

    daily = (rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_type", "ts", "value"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("day").aggregate(Sum("cents", alias_name="cents"))
             .to_pandas().sort_values("day").reset_index(drop=True))
    if len(daily) == 0:
        return pa.table({"best_scaled": pa.array([0], pa.int64()),
                         "end_day": pa.array([0], pa.int64()),
                         "n_days": pa.array([0], pa.int64())})
    nd = len(daily)
    total = int(daily["cents"].sum())
    best, end_day = None, 0
    cum, minpre = 0, 0
    for day, cents in zip(daily["day"], daily["cents"]):
        v = int(cents) * nd - total
        cum += v
        cand = cum - minpre
        if best is None or cand > best:
            best, end_day = cand, int(day)
        minpre = min(minpre, cum)
    return pa.table({"best_scaled": pa.array([best], pa.int64()),
                     "end_day": pa.array([end_day], pa.int64()),
                     "n_days": pa.array([nd], pa.int64())})


_BEST_STREAK_SQL = """
WITH d AS (
  SELECT -- FLOOR division (numpy semantics, the locf idiom)
         (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000)
          % 86400000000) // 86400000000 AS day,
         CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT))
              AS HUGEINT) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
n AS (SELECT COUNT(*) AS nd, SUM(cents) AS total FROM d),
v AS (SELECT day, cents * n.nd - n.total AS v FROM d, n),
c AS (SELECT day, SUM(v) OVER (ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM v),
k AS (SELECT day, cum,
             COALESCE(MIN(cum) OVER (ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS minpre
      FROM c),
best AS (SELECT MAX(cum - LEAST(minpre, 0)) AS b
         FROM k)
SELECT CAST(best.b AS BIGINT) AS best_scaled,
       CAST((SELECT MIN(day) FROM k, best
             WHERE cum - LEAST(minpre, 0) = best.b) AS BIGINT)
           AS end_day,
       CAST(n.nd AS BIGINT) AS n_days
FROM best, n
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "revenue_by_brand": revenue_by_brand,
    "orders_by_nation": orders_by_nation,
    "q3_shipping_priority": q3_shipping_priority,
    "top_users_by_value": top_users_by_value,
    "events_hourly": events_hourly,
    "events_sliding": events_sliding,
    "events_session_windows": events_session_windows,
    "docs_bigram_surprise": docs_bigram_surprise,
    "docs_typo_pairs": docs_typo_pairs,
    "docs_link_prediction": docs_link_prediction,
    "docs_link_resource_alloc": docs_link_resource_alloc,
    "docs_shuffle_shards": docs_shuffle_shards,
    "docs_perplexity_buckets": docs_perplexity_buckets,
    "docs_text_index_topk": docs_text_index_topk,
    "events_gap_fill": events_gap_fill,
    "events_late_arrivals": events_late_arrivals,
    "orderkey_union_count": orderkey_union_count,
    "docs_llm_extract": docs_llm_extract,
    "docs_llm_extract_schema": docs_llm_extract_schema,
    "top_events_per_type": top_events_per_type,
    "events_distinct_users": events_distinct_users,
    "lineitem_recent": lineitem_recent,
    "sessionize": sessionize,
    "docs_text_stats": docs_text_stats,
    "docs_bpe_tokens": docs_bpe_tokens,
    "docs_vocab": docs_vocab,
    "docs_by_lang": docs_by_lang,
    "docs_exact_dedup": docs_exact_dedup,
    "docs_lang_guess": docs_lang_guess,
    "docs_fingerprint": docs_fingerprint,
    "docs_minhash_pairs": docs_minhash_pairs,
    "docs_minhash_oph": docs_minhash_oph,
    "docs_simhash_pairs": docs_simhash_pairs,
    "docs_ngram_jaccard": docs_ngram_jaccard,
    "docs_decontaminate": docs_decontaminate,
    "docs_pack_sequences": docs_pack_sequences,
    "corpus_build": corpus_build,
    "corpus_dedup_build": corpus_dedup_build,
    "docs_sample_stratified": docs_sample_stratified,
    "docs_neardup_clusters": docs_neardup_clusters,
    "embeddings_neardup": embeddings_neardup,
    "embeddings_neardup_lsh40": embeddings_neardup_lsh40,
    "embeddings_neardup_brute": embeddings_neardup_brute,
    "embeddings_knn": embeddings_knn,
    "embeddings_knn_ivf": embeddings_knn_ivf,
    "embeddings_knn_ivf_index": embeddings_knn_ivf_index,
    "crawl_reachable": crawl_reachable,
    "crawl_frontier_shards": crawl_frontier_shards,
    "crawl_browser_screenshots": crawl_browser_screenshots,
    "crawl_lineage": crawl_lineage,
    "scrape_titles": scrape_titles,
    "serp_google": _serp_query("google"),
    "serp_searxng": _serp_query("searxng"),
    "serp_ac_engine": _serp_query("ac-engine"),
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "events_running_total": events_running_total,
    "events_running_total_salted": events_running_total_salted,
    "events_quantiles": events_quantiles,
    "events_funnel": events_funnel,
    "docs_winnow_pairs": docs_winnow_pairs,
    "docs_pagerank": docs_pagerank,
    "docs_keyword_topk": docs_keyword_topk,
    "docs_dedup_incremental": docs_dedup_incremental,
    "media_features": media_features,
    "media_resize": media_resize,
    "media_frames": media_frames,
    "training_pipeline": training_pipeline,
    "crawl_span_stats": crawl_span_stats,
    "events_retention_cohorts": events_retention_cohorts,
    "docs_repetition_scores": docs_repetition_scores,
    "events_distinct_kmv": events_distinct_kmv,
    "events_hll": events_hll,
    "docs_bm25_topk": docs_bm25_topk,
    "docs_redact_pii": docs_redact_pii,
    "docs_chunk_overlap": docs_chunk_overlap,
    "events_interarrival": events_interarrival,
    "docs_substring_dedup": docs_substring_dedup,
    "docs_unigram_surprise": docs_unigram_surprise,
    "docs_dsir_weights": docs_dsir_weights,
    "docs_bpe_merge_train": docs_bpe_merge_train,
    "docs_bpe_token_counts": docs_bpe_token_counts,
    "docs_quality_rules": docs_quality_rules,
    "q5_local_supplier": q5_local_supplier,
    "embeddings_knn_graph": embeddings_knn_graph,
    "docs_curation_span": docs_curation_span,
    "q18_large_orders": q18_large_orders,
    "docs_neardup_keep": docs_neardup_keep,
    "q14_promo_revenue": q14_promo_revenue,
    "events_anomaly_hours": events_anomaly_hours,
    "q4_order_priority": q4_order_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q22_sales_opportunity": q22_sales_opportunity,
    "events_heavy_hitters": events_heavy_hitters,
    "events_transition_matrix": events_transition_matrix,
    "docs_link_triangles": docs_link_triangles,
    "docs_graph_walks": docs_graph_walks,
    "embeddings_kmeans": embeddings_kmeans,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q7_volume_shipping": q7_volume_shipping,
    "docs_containment_pairs": docs_containment_pairs,
    "docs_cooccurrence_pmi": docs_cooccurrence_pmi,
    "q8_market_share": q8_market_share,
    "embeddings_pq": embeddings_pq,
    "embeddings_semdedup": embeddings_semdedup,
    "q17_small_quantity": q17_small_quantity,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "docs_split_assign": docs_split_assign,
    "events_histogram": events_histogram,
    "orders_rollup": orders_rollup,
    "events_cumulative_users": events_cumulative_users,
    "docs_sample_weighted": docs_sample_weighted,
    "media_phash_pairs": media_phash_pairs,
    "events_sliding_distinct": events_sliding_distinct,
    "docs_dedup_bloom": docs_dedup_bloom,
    "docs_top_bigrams": docs_top_bigrams,
    "docs_top_terms": docs_top_terms,
    "events_mad": events_mad,
    "events_user_overlap": events_user_overlap,
    "events_dow_pivot": events_dow_pivot,
    "docs_curation_train": docs_curation_train,
    "docs_lang_confusion": docs_lang_confusion,
    "embeddings_ivf_recall": embeddings_ivf_recall,
    "docs_minhash_recall": docs_minhash_recall,
    "events_attribution": events_attribution,
    "events_rfm": events_rfm,
    "docs_hits": docs_hits,
    "docs_tfidf_cosine": docs_tfidf_cosine,
    "embeddings_cluster_purity": embeddings_cluster_purity,
    "events_count_min": events_count_min,
    "embeddings_mmr": embeddings_mmr,
    "orders_market_basket": orders_market_basket,
    "events_chi2_ab": events_chi2_ab,
    "crawl_robots_gate": crawl_robots_gate,
    "embeddings_outliers": embeddings_outliers,
    "orders_ltv_cohorts": orders_ltv_cohorts,
    "docs_phrase_search": docs_phrase_search,
    "events_top_paths": events_top_paths,
    "docs_postings_size": docs_postings_size,
    "docs_neardup_survivor": docs_neardup_survivor,
    "events_slo_breach": events_slo_breach,
    "orders_pareto_share": orders_pareto_share,
    "docs_term_drift": docs_term_drift,
    "docs_kcore": docs_kcore,
    "docs_ppr": docs_ppr,
    "crawl_recrawl_delta": crawl_recrawl_delta,
    "embeddings_bq_recall": embeddings_bq_recall,
    "embeddings_mrl_recall": embeddings_mrl_recall,
    "embeddings_lsh_multiprobe": embeddings_lsh_multiprobe,
    "docs_merge_upsert": docs_merge_upsert,
    "events_forecast_backtest": events_forecast_backtest,
    "embeddings_curation": embeddings_curation,
    "docs_uncertain_lang": docs_uncertain_lang,
    "events_bot_scores": events_bot_scores,
    "crawl_resume_equivalence": crawl_resume_equivalence,
    "docs_rrf_fusion": docs_rrf_fusion,
    "embeddings_hard_negatives": embeddings_hard_negatives,
    "events_user_streaks": events_user_streaks,
    "docs_heaps_law": docs_heaps_law,
    "docs_ngram_novelty": docs_ngram_novelty,
    "docs_jsonl_roundtrip": docs_jsonl_roundtrip,
    "events_csv_roundtrip": events_csv_roundtrip,
    "events_scd2": events_scd2,
    "events_twa": events_twa,
    "parts_skyline": parts_skyline,
    "events_zorder": events_zorder,
    "events_cusum": events_cusum,
    "docs_ipc_roundtrip": docs_ipc_roundtrip,
    "events_ewma": events_ewma,
    "events_benford": events_benford,
    "events_autocorr": events_autocorr,
    "embeddings_pca_power": embeddings_pca_power,
    "events_hdr_quantiles": events_hdr_quantiles,
    "events_gini": events_gini,
    "docs_textrank": docs_textrank,
    "events_markov_stationary": events_markov_stationary,
    "events_kmv_setops": events_kmv_setops,
    "events_peak_concurrency": events_peak_concurrency,
    "lineitem_profile": lineitem_profile,
    "events_orc_roundtrip": events_orc_roundtrip,
    "events_haar": events_haar,
    "events_pit_join": events_pit_join,
    "events_holt": events_holt,
    "events_winsorize": events_winsorize,
    "embeddings_knn_label": embeddings_knn_label,
    "events_props_extract": events_props_extract,
    "events_ks_drift": events_ks_drift,
    "events_rank_drift": events_rank_drift,
    "integrity_checks": integrity_checks,
    "embeddings_pca_scores": embeddings_pca_scores,
    "docs_assortativity": docs_assortativity,
    "events_best_streak": events_best_streak,
}

ORACLE_SQL = {
    "crawl_resume_equivalence": _RESUME_EQ_SQL,
    "events_bot_scores": _BOT_SCORES_SQL,
    "docs_uncertain_lang": _UNCERTAIN_LANG_SQL,
    "embeddings_curation": _curation_emb_sql(),
    "events_forecast_backtest": _FORECAST_BACKTEST_SQL,
    "docs_merge_upsert": _MERGE_UPSERT_SQL,
    "embeddings_bq_recall": _bq_recall_sql(),
    "embeddings_mrl_recall": _mrl_recall_sql(),
    "embeddings_lsh_multiprobe": _lsh_multiprobe_sql(),
    "crawl_recrawl_delta": _RECRAWL_DELTA_SQL,
    "docs_ppr": _ppr_sql(),
    "docs_kcore": _kcore_sql(),
    "docs_term_drift": _TERM_DRIFT_SQL,
    "orders_pareto_share": _PARETO_SQL,
    "events_slo_breach": _SLO_BREACH_SQL,
    "docs_neardup_survivor": _neardup_survivor_sql(),
    "docs_postings_size": _postings_size_sql(),
    "events_top_paths": _TOP_PATHS_SQL,
    "docs_phrase_search": _PHRASE_SQL,
    "orders_ltv_cohorts": _LTV_COHORTS_SQL,
    "embeddings_outliers": _outliers_sql(),
    "crawl_robots_gate": _CRAWL_ROBOTS_SQL,
    "events_chi2_ab": _CHI2_AB_SQL,
    "orders_market_basket": _MARKET_BASKET_SQL,
    "events_count_min": _count_min_sql(),
    "embeddings_mmr": _mmr_sql(),
    "embeddings_cluster_purity": _cluster_purity_sql(
        _KMEANS_K, _KMEANS_ITERS),
    "docs_hits": _hits_sql(),
    "docs_tfidf_cosine": _TFIDF_COSINE_SQL,
    "events_attribution": _ATTRIBUTION_SQL,
    "events_rfm": _RFM_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "revenue_by_brand": _REVENUE_BRAND_SQL,
    "orders_by_nation": _ORDERS_NATION_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "top_users_by_value": _TOP_USERS_SQL,
    "events_hourly": _EVENTS_HOURLY_SQL,
    "events_sliding": _EVENTS_SLIDING_SQL,
    "events_session_windows": _SESSION_WINDOWS_SQL,
    "docs_bigram_surprise": _BIGRAM_SURPRISE_SQL,
    "docs_typo_pairs": _TYPO_PAIRS_SQL,
    "docs_link_prediction": _LINK_PREDICTION_SQL,
    "docs_link_resource_alloc": _LINK_RESOURCE_ALLOC_SQL,
    "docs_shuffle_shards": _shuffle_shards_sql(),
    "docs_perplexity_buckets": _PERPLEXITY_BUCKETS_SQL,
    "docs_text_index_topk": _text_index_sql(),
    "events_gap_fill": _GAP_FILL_SQL,
    "events_late_arrivals": _LATE_ARRIVALS_SQL,
    "orderkey_union_count": _UNION_COUNT_SQL,
    "top_events_per_type": _TOP_EVENTS_SQL,
    "events_distinct_users": _DISTINCT_USERS_SQL,
    "lineitem_recent": _LINEITEM_RECENT_SQL,
    "sessionize": _SESSIONIZE_SQL,
    "docs_text_stats": _TEXT_STATS_SQL,
    "docs_bpe_tokens": _BPE_TOKENS_SQL,
    "docs_vocab": _VOCAB_SQL,
    "docs_by_lang": _BY_LANG_SQL,
    "docs_lang_guess": _LANG_GUESS_SQL,
    "docs_llm_extract": _LLM_EXTRACT_SQL,
    "docs_llm_extract_schema": _LLM_EXTRACT_SCHEMA_SQL,
    "docs_exact_dedup": _EXACT_DEDUP_SQL,
    "embeddings_knn": _KNN_SQL,
    "embeddings_neardup_brute": _EMB_NEARDUP_BRUTE_SQL,
    "docs_ngram_jaccard": _NGRAM_JACCARD_SQL,
    "docs_decontaminate": _DECONTAMINATE_SQL,
    "docs_pack_sequences": _PACK_SEQUENCES_SQL,
    "corpus_build": _CORPUS_BUILD_SQL,
    "corpus_dedup_build": _CORPUS_DEDUP_SQL,
    "docs_sample_stratified": _sample_stratified_sql(),
    "docs_neardup_clusters": _neardup_clusters_sql(),
    "crawl_reachable": _CRAWL_REACHABLE_SQL,
    "crawl_frontier_shards": _crawl_frontier_shards_sql(),
    "crawl_browser_screenshots": _CRAWL_BROWSER_SCREENSHOTS_SQL,
    "crawl_lineage": _CRAWL_LINEAGE_SQL,
    "scrape_titles": _SCRAPE_TITLES_SQL,
    "serp_google": _serp_sql("google"),
    "serp_searxng": _serp_sql("searxng"),
    "serp_ac_engine": _serp_sql("ac-engine"),
    "crawl_span_stats": _CRAWL_SPAN_STATS_SQL,
    # uint64 hash-kernel oracles (oracle_kernels.py): the SQL recomputes
    # FNV-1a/splitmix64/MinHash/SimHash bit-identically via u64 macros
    "docs_fingerprint": _oracle_kernels.fingerprint_sql(),
    "docs_minhash_pairs": _oracle_kernels.minhash_pairs_sql(),
    "docs_minhash_oph": _oracle_kernels.oph_pairs_sql(),
    "docs_simhash_pairs": _oracle_kernels.simhash_pairs_sql(),
    "training_pipeline": _oracle_kernels.training_pipeline_sql(),
    # hyperplane LSH: the plane matrix is a deterministic constant, so the
    # banded pipeline replays exactly (sign margins measured; kernels doc)
    "embeddings_neardup": _oracle_kernels.embedding_lsh_pairs_sql(
        threshold=0.95, bands=4),
    "embeddings_neardup_lsh40": _oracle_kernels.embedding_lsh_pairs_sql(
        threshold=0.4, bands=8),
    # keyed window operators
    "events_asof_join": _EVENTS_ASOF_SQL,
    "events_range_join": _EVENTS_RANGE_JOIN_SQL,
    "events_running_total": _EVENTS_RUNNING_SQL,
    # the salted path must equal the SAME window-function oracle
    "events_running_total_salted": _EVENTS_RUNNING_SQL,
    "events_quantiles": _EVENTS_QUANTILES_SQL,
    "events_funnel": _EVENTS_FUNNEL_SQL,
    # winnowing (MOSS) fingerprint pairs — full u64 kernel replay
    "docs_winnow_pairs": _oracle_kernels.winnow_pairs_sql(
        k=3, w=4, min_shared=2),
    # iterative integer-fixed-point PageRank — unrolled CTE replay
    "docs_pagerank": _pagerank_sql(),
    # integer-quantized-idf keyword relevance (IR top-k without float logs)
    "docs_keyword_topk": _keyword_topk_sql(),
    # delta dedup vs a prior snapshot — NOT EXISTS anti-join oracle
    "docs_dedup_incremental": _DEDUP_INCREMENTAL_SQL,
    # IVF ANN with hash-selected centroids: centroid pick, argmax
    # assignment, probe and in-cluster top-k all replay relationally
    "embeddings_knn_ivf": _ivf_knn_sql(n_clusters=16, nprobe=6),
    "embeddings_knn_ivf_index": _ivf_knn_sql(n_clusters=8, nprobe=3),
    # stub-codec replay: the media fakes run on FNV/mix64 arithmetic, so
    # feature means (exact-op-order f64/f32 rounding), NEAREST resample
    # and frame sampling all replay bit-identically in SQL
    "media_features": _oracle_kernels.media_features_sql(),
    "media_resize": _oracle_kernels.media_resize_sql(),
    "media_frames": _oracle_kernels.media_frames_sql(),
    # cohort retention triangle — distinct (user, week) + min-week join
    "events_retention_cohorts": _RETENTION_SQL,
    # Gopher repeated-trigram fraction (integer fixed-point)
    "docs_repetition_scores": _REPETITION_SQL,
    # KMV bottom-k distinct sketch — mix64 bijection replays exactly
    "events_distinct_kmv": _kmv_sql(),
    "events_hll": _hll_sql(),
    # full BM25 with cleared denominators — HUGEINT replay, no floats
    "docs_bm25_topk": _bm25_topk_sql(),
    # RE2-safe email scrub — regexp_replace replay
    "docs_redact_pii": _REDACT_SQL,
    # RAG overlap chunking — list-slicing replay on the pinned tokenizer
    "docs_chunk_overlap": _CHUNK_OVERLAP_SQL,
    "events_interarrival": _INTERARRIVAL_SQL,
    "docs_substring_dedup": _SUBSTRING_DEDUP_SQL,
    "docs_unigram_surprise": _UNIGRAM_SURPRISE_SQL,
    "docs_dsir_weights": _dsir_sql(),
    "docs_bpe_merge_train": _bpe_train_sql(),
    "docs_bpe_token_counts": _bpe_counts_sql(),
    "docs_quality_rules": _QUALITY_RULES_SQL,
    "q5_local_supplier": _Q5_SQL,
    "embeddings_knn_graph": _KNN_GRAPH_SQL,
    "docs_curation_span": _CURATION_SPAN_SQL,
    "q18_large_orders": _Q18_SQL,
    "docs_neardup_keep": _neardup_keep_sql(),
    "q14_promo_revenue": _Q14_SQL,
    "events_anomaly_hours": _ANOMALY_SQL,
    "q4_order_priority": _Q4_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q22_sales_opportunity": _Q22_SQL,
    "events_heavy_hitters": _HEAVY_HITTERS_SQL,
    "events_transition_matrix": _TRANSITION_SQL,
    "docs_link_triangles": _TRIANGLES_SQL,
    "docs_graph_walks": _graph_walks_sql(),
    "embeddings_kmeans": _kmeans_sql(),
    "q6_forecast_revenue": _Q6_SQL,
    "q10_returned_items": _Q10_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "docs_containment_pairs": _CONTAINMENT_SQL,
    "docs_cooccurrence_pmi": _COOC_PMI_SQL,
    "q8_market_share": _Q8_SQL,
    "embeddings_pq": _pq_sql(),
    "embeddings_semdedup": _semdedup_sql(),
    "q17_small_quantity": _Q17_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q21_waiting_suppliers": _Q21_SQL,
    "docs_split_assign": _split_assign_sql(),
    "events_histogram": _EVENTS_HISTOGRAM_SQL,
    "orders_rollup": _ORDERS_ROLLUP_SQL,
    "events_cumulative_users": _CUMULATIVE_USERS_SQL,
    "docs_sample_weighted": _sample_weighted_sql(),
    "media_phash_pairs": _media_phash_sql(),
    "events_sliding_distinct": _SLIDING_DISTINCT_SQL,
    "docs_dedup_bloom": _DEDUP_INCREMENTAL_SQL,
    "docs_top_bigrams": _TOP_BIGRAMS_SQL,
    "docs_top_terms": _TOP_TERMS_SQL,
    "events_mad": _EVENTS_MAD_SQL,
    "events_user_overlap": _USER_OVERLAP_SQL,
    "events_dow_pivot": _dow_pivot_sql(),
    "docs_curation_train": _curation_train_sql(),
    "docs_lang_confusion": _LANG_CONFUSION_SQL,
    "embeddings_ivf_recall": _ivf_recall_sql(),
    "docs_minhash_recall": _minhash_recall_sql(),
    "docs_rrf_fusion": _rrf_fusion_sql(),
    "embeddings_hard_negatives": _HARD_NEGATIVES_SQL,
    "events_user_streaks": _USER_STREAKS_SQL,
    "docs_heaps_law": _HEAPS_LAW_SQL,
    "docs_ngram_novelty": _NGRAM_NOVELTY_SQL,
    "docs_jsonl_roundtrip": _JSONL_ROUNDTRIP_SQL,
    "events_csv_roundtrip": _CSV_ROUNDTRIP_SQL,
    "events_scd2": _SCD2_SQL,
    "events_twa": _TWA_SQL,
    "parts_skyline": _SKYLINE_SQL,
    "events_zorder": _zorder_sql(),
    "events_cusum": _CUSUM_SQL,
    "docs_ipc_roundtrip": _IPC_ROUNDTRIP_SQL,
    "events_ewma": _EWMA_SQL,
    "events_benford": _BENFORD_SQL,
    "events_autocorr": _AUTOCORR_SQL,
    "embeddings_pca_power": _pca_power_sql(),
    "events_hdr_quantiles": _hdr_quantiles_sql(),
    "events_gini": _EVENTS_GINI_SQL,
    "docs_textrank": _textrank_sql(),
    "events_markov_stationary": _markov_stationary_sql(),
    "events_kmv_setops": _kmv_setops_sql(),
    "events_peak_concurrency": _PEAK_CONCURRENCY_SQL,
    "lineitem_profile": _profile_sql(),
    "events_orc_roundtrip": _ORC_ROUNDTRIP_SQL,
    "events_haar": _haar_sql(),
    "events_pit_join": _PIT_JOIN_SQL,
    "events_holt": _HOLT_SQL,
    "events_winsorize": _WINSORIZE_SQL,
    "embeddings_knn_label": _KNN_LABEL_SQL,
    "events_props_extract": _PROPS_EXTRACT_SQL,
    "events_ks_drift": _KS_DRIFT_SQL,
    "events_rank_drift": _RANK_DRIFT_SQL,
    "integrity_checks": _INTEGRITY_SQL,
    "embeddings_pca_scores": _pca_scores_sql(),
    "docs_assortativity": _ASSORTATIVITY_SQL,
    "events_best_streak": _BEST_STREAK_SQL,
}

# Control-plane driver rows (T7-T9, M21-M23): real scheduler/webhook/
# template/proxy policies over sf-derived fixtures with exact SQL oracles.
QUERIES.update(CONTROL_QUERIES)
ORACLE_SQL.update(CONTROL_ORACLE_SQL)
