"""Unit/property tests for the round-4 sixth-continuation window
operators: skyline mask vs brute-force dominance, SCD2 intervals and
time-weighted average vs straightforward pandas references, z-order
interleave vs per-bit reference, CUSUM kernel edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from anycrawl_ray.stages.window import _skyline_mask


def _brute_skyline(a, b):
    keep = np.ones(a.size, dtype=bool)
    for i in range(a.size):
        for j in range(a.size):
            if (a[j] >= a[i] and b[j] <= b[i]
                    and (a[j] > a[i] or b[j] < b[i])):
                keep[i] = False
                break
    return keep


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                max_size=40))
def test_skyline_mask_matches_brute_force(points):
    a = np.array([p[0] for p in points], dtype=np.int64)
    b = np.array([p[1] for p in points], dtype=np.int64)
    assert np.array_equal(_skyline_mask(a, b), _brute_skyline(a, b))


def test_skyline_union_antimonotone():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 50, 300).astype(np.int64)
    b = rng.randint(0, 50, 300).astype(np.int64)
    full = set(zip(a[_skyline_mask(a, b)], b[_skyline_mask(a, b)]))
    # block-local skylines union must contain the global skyline
    mid = 150
    m1 = _skyline_mask(a[:mid], b[:mid])
    m2 = _skyline_mask(a[mid:], b[mid:])
    union = set(zip(a[:mid][m1], b[:mid][m1])) | set(
        zip(a[mid:][m2], b[mid:][m2]))
    assert full <= union


def _scd2_pandas(df):
    rows = []
    for uid, sub in df.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id"):
        runs = []
        for _, r in sub.iterrows():
            if runs and runs[-1]["event_type"] == r.event_type:
                runs[-1]["n"] += 1
            else:
                runs.append({"event_type": r.event_type, "vf": r.ts, "n": 1})
        for i, run in enumerate(runs):
            rows.append({
                "user_id": uid, "event_type": run["event_type"],
                "valid_from_us": run["vf"],
                "valid_to_us": runs[i + 1]["vf"] if i + 1 < len(runs) else -1,
                "n_events": run["n"]})
    return pd.DataFrame(rows)


def test_scd2_intervals_matches_reference(ray_session):
    import ray

    from anycrawl_ray.stages.window import scd2_intervals

    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": rng.randint(0, 50, n).astype(np.int64),  # many ties
        "event_id": np.arange(n, dtype=np.int64)})
    tbl = pa.table({"user_id": df.user_id, "event_type": df.event_type,
                    "ts": pa.array(df.ts, pa.timestamp("us")),
                    "event_id": df.event_id})
    got = scd2_intervals(ray.data.from_arrow(tbl), n_buckets=4)
    want = _scd2_pandas(df).sort_values(
        ["user_id", "valid_from_us"]).reset_index(drop=True)
    got = got[["user_id", "event_type", "valid_from_us", "valid_to_us",
               "n_events"]].astype(
        {"valid_from_us": "int64", "valid_to_us": "int64"})
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_time_weighted_avg_exact(ray_session):
    import ray

    from anycrawl_ray.stages.window import time_weighted_avg

    # hand-computed: user 1 holds 100c for 10s then 300c for 30s ->
    # (1000 + 9000) / 40 = 250c; user 2 single-second -> dropped
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10_000_000, 40_000_000, 5_000_000],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 3.0, 9.0, 7.0], pa.float64())})
    df = time_weighted_avg(ray.data.from_arrow(tbl), n_buckets=2)
    assert df["user_id"].tolist() == [1]
    assert df["span_sec"].tolist() == [40]
    assert df["twa_cents"].tolist() == [(100 * 10 + 300 * 30) // 40]


def test_zorder_interleave_reference(ray_session):
    import ray

    from anycrawl_ray.stages.window import zorder_layout

    rng = np.random.RandomState(5)
    x = rng.randint(0, 256, 500).astype(np.int64)
    y = rng.randint(0, 256, 500).astype(np.int64)
    tbl = pa.table({"x": pa.array(x), "y": pa.array(y)})
    res = zorder_layout(ray.data.from_arrow(tbl), "x", "y", bits=8,
                        n_ranges=16).to_pandas()

    def morton(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    zr = np.array([morton(a, b) >> 12 for a, b in zip(x, y)])
    for _, row in res.iterrows():
        m = zr == row.zrange
        assert row.n_rows == int(m.sum())
        assert row.x_min == int(x[m].min()) and row.x_max == int(x[m].max())
        assert row.y_min == int(y[m].min()) and row.y_max == int(y[m].max())
    assert int(res.n_rows.sum()) == 500


def test_cusum_drift_peak(ray_session):
    import ray

    from anycrawl_ray.stages.window import cusum_drift

    # one type: days 0,0,0,1,2 -> counts [3,1,1], mean=1, cusum=[2,2,2]
    # peak = first max -> day 0, value 2
    tbl = pa.table({
        "event_type": pa.array(["x"] * 5, pa.string()),
        "ts": pa.array([0, 1, 2, 86_400_000_000, 2 * 86_400_000_000],
                       pa.timestamp("us"))})
    res = cusum_drift(ray.data.from_arrow(tbl)).to_pandas()
    assert res.peak_day.tolist() == [0]
    assert res.peak_cusum.tolist() == [2]
    assert res.n_days.tolist() == [3]
    assert res.n_events.tolist() == [5]


def test_ewma_daily_recurrence(ray_session):
    import ray

    from anycrawl_ray.stages.window import ewma_daily

    # counts by day: [4, 1, 2] -> s = [4e6, (7*4e6+1e6)//8, ...]
    day = 86_400_000_000
    ts = [0, 1, 2, 3, day, 2 * day, 2 * day + 5]
    tbl = pa.table({"event_type": pa.array(["a"] * 7, pa.string()),
                    "ts": pa.array(ts, pa.timestamp("us"))})
    res = ewma_daily(ray.data.from_arrow(tbl)).to_pandas()
    s0 = 4_000_000
    s1 = (7 * s0 + 1_000_000) // 8
    s2 = (7 * s1 + 2_000_000) // 8
    assert res.day.tolist() == [0, 1, 2]
    assert res.n.tolist() == [4, 1, 2]
    assert res.ewma.tolist() == [s0, s1, s2]


def test_benford_digits_counts(ray_session):
    import ray

    from anycrawl_ray.stages.window import benford_digits

    # cents: 100,2,2,999,-5 (dropped), 0.004 -> 0 (dropped)
    vals = [1.00, 0.02, 0.02, 9.99, -0.05, 0.00004]
    tbl = pa.table({"value": pa.array(vals, pa.float64())})
    res = benford_digits(ray.data.from_arrow(tbl)).to_pandas()
    got = dict(zip(res.digit, res.n))
    assert got == {1: 1, 2: 2, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    assert dict(zip(res.digit, res.share_ppm))[2] == 2_000_000 // 4


def test_autocorr_hourly_exact(ray_session):
    import ray

    from anycrawl_ray.stages.window import autocorr_hourly

    # dense hourly series [2, 0, 1, 3] (hour 1 is a gap -> 0)
    hour = 3_600_000_000
    ts = ([0, 1] + [2 * hour] + [3 * hour] * 3)
    tbl = pa.table({"event_type": pa.array(["t"] * 6, pa.string()),
                    "ts": pa.array(ts, pa.timestamp("us"))})
    res = autocorr_hourly(ray.data.from_arrow(tbl),
                          lags=(1, 2)).to_pandas()
    dense = np.array([2, 0, 1, 3], dtype=np.int64)
    for _, row in res.iterrows():
        lag = int(row.lag)
        x, y = dense[:-lag], dense[lag:]
        m = x.size
        assert row.n_pairs == m
        assert row.cov_n == m * (x * y).sum() - x.sum() * y.sum()
        assert row.varx_n == m * (x * x).sum() - x.sum() ** 2
        assert row.vary_n == m * (y * y).sum() - y.sum() ** 2
    assert set(res.lag) == {1, 2}


def test_markov_stationary_two_state_chain(ray_session):
    """Hand-checkable chain: a->b always, b->a always — the stationary
    distribution is uniform, so both states converge to v_scale; a
    dangling state (only inbound) keeps only normalized inbound mass;
    block layout never changes the result."""
    import ray.data as rd

    from anycrawl_ray.stages.window import markov_stationary

    rows = []
    eid = 0
    for u in range(10):
        for i, t in enumerate(["a", "b"] * 6):
            rows.append((eid, u, 1_000_000 * (i + 1), t))
            eid += 1
    # one user ends on a dangling state c (b -> c transition, c emits none)
    rows.append((eid, 99, 1_000_000, "a"))
    rows.append((eid + 1, 99, 2_000_000, "b"))
    rows.append((eid + 2, 99, 3_000_000, "c"))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    out = markov_stationary(rd.from_arrow(t).repartition(4),
                            iters=8).to_pandas().set_index("state")["v"]
    assert out["a"] == out["b"] == 10_000  # symmetric max -> both at scale
    assert 0 <= out["c"] < out["a"]
    out2 = markov_stationary(rd.from_arrow(t).repartition(9),
                             iters=8).to_pandas().set_index("state")["v"]
    assert out.equals(out2)


def test_peak_concurrency_cross_midnight_carry(ray_session):
    """Hand-built schedule: 3 users overlap within day 0 (peak 3); one
    session spans midnight so day 1's single-session start counts the
    carried-over session too (peak 2); a day with only session ENDS
    emits no row; partition-invariant."""
    import ray.data as rd

    from anycrawl_ray.stages.window import peak_concurrency

    day = 86_400_000_000
    rows = [
        (1, 1_000_000), (1, 10_000_000),           # u1: short session
        (2, 2_000_000), (2, 11_000_000),           # u2 overlaps u1
        (3, 3_000_000),                            # u3 point session
        # u4 spans midnight: events 10 min apart across the boundary
        (4, day - 300_000_000), (4, day + 300_000_000),
        (5, day + 100_000_000),                    # u5 starts day 1
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array([r[1] for r in rows],
                                 pa.timestamp("us"))})
    out = peak_concurrency(rd.from_arrow(t).repartition(3)) \
        .to_pandas().set_index("day")["peak"]
    assert out[0] == 3  # u1+u2+u3 overlap at t=3s; u4 starts after they end
    assert out[1] == 2  # u5 starts while u4's session is still open
    out2 = peak_concurrency(rd.from_arrow(t).repartition(7)) \
        .to_pandas().set_index("day")["peak"]
    assert out.equals(out2)


def test_pit_join_never_sees_future_dimension(ray_session):
    """The leakage guard itself: a purchase BETWEEN two dimension runs
    must join the EARLIER run even though the later one is closer in
    time; a purchase before any dimension row drops; a purchase at the
    exact run-start instant sees that run; partition-invariant."""
    import ray.data as rd

    from anycrawl_ray.stages.window import pit_join

    rows = [
        # (event_id, user, t_us, type, value)
        (1, 7, 1_000, "purchase", 5.00),    # before any state -> drops
        (2, 7, 2_000, "click", 0.0),        # state click @2ms
        (3, 7, 9_000, "view", 0.0),         # state view @9ms
        (4, 7, 8_000, "purchase", 1.00),    # closer to view(9ms) but
                                            # must join click (no future)
        (5, 7, 9_000, "purchase", 2.00),    # exact run-start -> view
        (6, 7, 20_000, "purchase", 4.00),   # open interval -> view
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    out = pit_join(rd.from_arrow(t).repartition(3)).to_pandas() \
        .set_index("state")
    assert out.loc["click", "n_facts"] == 1
    assert out.loc["click", "sum_cents"] == 100
    assert out.loc["view", "n_facts"] == 2
    assert out.loc["view", "sum_cents"] == 600
    assert out["n_facts"].sum() == 3  # the pre-state purchase dropped
    out2 = pit_join(rd.from_arrow(t).repartition(6)).to_pandas() \
        .set_index("state")
    assert out.equals(out2)


def test_holt_negative_trend_trunc_parity(ray_session):
    """A steep decline drives the trend state negative — the exact seam
    where Python floor division and DuckDB's truncating // diverge.
    Pin the kernel against a direct DuckDB replay of the recurrence on
    the same synthetic series."""
    import duckdb
    import ray.data as rd

    from anycrawl_ray.stages.window import holt_daily

    # one event on day d repeated n(d) times: 100, 80, 10, 5, 5, 60
    counts = [100, 80, 10, 5, 5, 60]
    ts, us_day = [], 86_400_000_000
    for d, n in enumerate(counts):
        ts.extend([d * us_day + i for i in range(n)])
    t = pa.table({"event_type": pa.array(["x"] * len(ts)),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    out = holt_daily(rd.from_arrow(t).repartition(4)).to_pandas()
    assert (out["trend"] < 0).any()  # the decline really goes negative

    con = duckdb.connect()
    con.register("events", t.to_pandas())
    from anycrawl_ray.pipelines.queries import _HOLT_SQL
    exp = con.execute(_HOLT_SQL).fetch_df()
    assert out["level"].tolist() == exp["level"].tolist()
    assert out["trend"].tolist() == exp["trend"].tolist()
    assert out["forecast"].tolist() == exp["forecast"].tolist()
