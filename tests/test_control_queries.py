"""Control-plane driver rows (pipelines/control_queries.py): each query
must agree with its DuckDB oracle at sf0.001 — the same comparison the
external driver runs — plus targeted policy probes the SQL can't show
failing in isolation (disable ordering, backoff schedule)."""

from __future__ import annotations

import duckdb
import pandas as pd

from anycrawl_ray.pipelines.control_queries import (
    CONTROL_ORACLE_SQL,
    CONTROL_QUERIES,
    scheduler_fires,
    webhook_deliveries,
)

SF = "/root/testdata/sf0.001"
TABLES = ("nation", "region", "part", "customer", "documents")


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con.execute(CONTROL_ORACLE_SQL[name]).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_every_control_query_matches_its_oracle(ray_session):
    for name, fn in CONTROL_QUERIES.items():
        got = _norm(fn(SF).to_pandas())
        want = _norm(_oracle(name))
        assert len(got) == len(want), name
        for c in got.columns:
            assert (got[c].astype(str).values
                    == want[c].astype(str).values).all(), (name, c)


def test_scheduler_day_cap_limits_capped_variant():
    t = scheduler_fires(SF).to_pandas()
    # variant 4 tasks (n%5==4) fire at 0:00/6:00/12:00/18:00 but are
    # capped at (n%3)+1 per UTC day
    for n in (4, 9, 14, 19, 24):
        per_day = (t[t.task_name == f"task{n}"]
                   .groupby((t.fire_epoch - 1767571200) // 86400).size())
        assert (per_day <= (n % 3) + 1).all()
        assert (per_day == (n % 3) + 1).any()


def test_webhook_auto_disable_stops_later_events():
    t = webhook_deliveries(SF).to_pandas()
    # n=21: maxr=2, needed=(21+e)%5+1 = [2,3,4,5,1] -> exhausted at
    # e=1,2,3 -> third consecutive failure at e=3 disables the sub
    sub21 = t[t.sub_key == 21]
    assert sorted(sub21.event_idx) == [0, 1, 2, 3]
    assert list(sub21.sort_values("event_idx").status) == [
        "delivered", "failed", "failed", "failed"]
    # private-IP subs are blocked on every event and never disabled
    sub0 = t[t.sub_key == 0]
    assert len(sub0) == 5
    assert set(sub0.status) == {"failed"}
    assert set(sub0.error_code) == {"PRIVATE_IP_BLOCKED"}
    assert set(sub0.attempts) == {1}
