"""Driver rows for the control plane (SURVEY.md T7-T9, M21-M23).

Each query runs the REAL control-plane code — SchedulerManager ticks,
WebhookManager delivery/backoff/auto-disable, URL/text template rendering,
proxy rule matching + tier resolution, template option merge + access +
domain validation — over fixtures derived from the sf tables by
SQL-replicable rules, so every policy gets an exact DuckDB oracle next to
its pytest conformance matrix.

Row-wise operators (render / proxy / merge) run distributed via
``map_batches`` over the parquet tables (the shape they'd have inside a
fetch/parse stage at scale); the schedulers/webhook managers are driver
state machines driven by fake clocks (control plane, O(tasks) not O(data)).

Reference: apps/api/src/utils/urlTemplate.ts, packages/scrape/src/managers/
Proxy.ts, Scheduler.ts, Webhook.ts, packages/libs template option merger +
domainValidator (file:line cites in the underlying modules).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pyarrow as pa

# 2026-01-05 00:00 UTC is a Monday (cron dow 1); epoch pinned for the SQL
_SCHED_START = datetime(2026, 1, 5, tzinfo=timezone.utc)
_SCHED_EPOCH = 1767571200
_SCHED_MINUTES = 7 * 24 * 60  # one week: every dow value occurs


def _rd():
    import logging

    import ray.data as rd
    from ray.data import DataContext

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    DataContext.get_current().enable_progress_bars = False
    return rd


def _conc() -> int:
    from ..util import pool_concurrency

    return pool_concurrency()


# ----------------------------------------------------------- T8 scheduler


def _sched_cron(n: int) -> tuple[str, int | None]:
    """Deterministic cron variant per nation key; all five syntax families
    (fixed, step+range, daily, weekly dow, hour-step with a day cap)."""
    v = n % 5
    if v == 0:
        return f"{(n * 7) % 60} * * * *", None
    if v == 1:
        return f"*/{5 * (n % 3 + 1)} 9-17 * * *", None
    if v == 2:
        return f"{n} {(n * 3) % 24} * * *", None
    if v == 3:
        return f"30 12 * * {n % 7}", None
    return "0 */6 * * *", (n % 3) + 1  # capped at 1..3 fires/day


def scheduler_fires(sf_dir: str):
    """One week of SchedulerManager ticks over 25 nation-derived cron
    tasks with a fake minute clock; executions complete instantly so the
    cron matcher + catch-up + max-per-day gates decide every fire."""
    import pyarrow.parquet as pq

    from ..state.scheduler import ScheduledTask, SchedulerManager

    nations = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey"])
    keys = sorted(nations.column("n_nationkey").to_pylist())

    now = {"t": _SCHED_START}
    mgr = SchedulerManager(trigger_job=lambda task, ex: f"job-{ex.uuid}",
                           clock=lambda: now["t"])
    names = {}
    for n in keys:
        cron, cap = _sched_cron(n)
        task = ScheduledTask(name=f"task{n}", cron_expression=cron,
                             max_executions_per_day=cap)
        mgr.add_task(task)
        names[task.uuid] = task.name

    out_name, out_epoch = [], []
    for m in range(1, _SCHED_MINUTES + 1):
        now["t"] = _SCHED_START + timedelta(minutes=m)
        for exec_id in mgr.tick():
            ex = mgr.executions[exec_id]
            out_name.append(names[ex.scheduled_task_uuid])
            out_epoch.append(int(ex.scheduled_for.timestamp()))
            mgr.complete_execution(exec_id)
    return pa.table({"task_name": pa.array(out_name, pa.string()),
                     "fire_epoch": pa.array(out_epoch, pa.int64())})


_SCHEDULER_FIRES_SQL = f"""
WITH mins AS (SELECT unnest(range(1, {_SCHED_MINUTES + 1})) AS m),
t AS (
  SELECT m, m % 60 AS minute, (m // 60) % 24 AS hour,
         (1 + m // 1440) % 7 AS dow, m // 1440 AS day_idx
  FROM mins),
fires AS (
  SELECT nn.n_nationkey AS n, t.m, t.day_idx
  FROM nation nn CROSS JOIN t
  WHERE CASE nn.n_nationkey % 5
    WHEN 0 THEN t.minute = (nn.n_nationkey * 7) % 60
    WHEN 1 THEN t.minute % (5 * (nn.n_nationkey % 3 + 1)) = 0
                AND t.hour BETWEEN 9 AND 17
    WHEN 2 THEN t.minute = nn.n_nationkey
                AND t.hour = (nn.n_nationkey * 3) % 24
    WHEN 3 THEN t.minute = 30 AND t.hour = 12
                AND t.dow = nn.n_nationkey % 7
    ELSE t.minute = 0 AND t.hour % 6 = 0 END),
capped AS (
  SELECT n, m FROM fires
  QUALIFY n % 5 <> 4
       OR row_number() OVER (PARTITION BY n, day_idx ORDER BY m)
          <= (n % 3) + 1)
SELECT 'task' || n AS task_name,
       {_SCHED_EPOCH} + 60 * m AS fire_epoch
FROM capped
ORDER BY task_name, fire_epoch
"""


# ------------------------------------------------------------ T9 webhooks


def webhook_deliveries(sf_dir: str):
    """Five region-derived events fanned out to 25 nation-derived
    subscriptions through the REAL WebhookManager: a deterministic
    transport fails each (sub, event) until attempt == (n+e)%5+1, the
    fake clock advances through the exponential backoff schedule, private
    IPs are blocked, and subs with auto_disable_after_failures=3 (n%7==0)
    stop receiving events after three consecutive exhausted deliveries."""
    import pyarrow.parquet as pq

    from ..state.webhooks import WebhookManager, WebhookSubscription

    nations = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey"])
    keys = sorted(nations.column("n_nationkey").to_pylist())
    regions = pq.read_table(f"{sf_dir}/region.parquet",
                            columns=["r_regionkey"])
    events = sorted(regions.column("r_regionkey").to_pylist())

    clock = {"t": 1_700_000_000.0}
    attempts: dict[tuple[str, str], int] = {}

    def transport(method, url, headers, body, timeout):
        n = int(url.rsplit("/", 1)[1])
        key = (url, headers["X-Webhook-Event-Source"])
        attempts[key] = attempts.get(key, 0) + 1
        e = int(headers["X-Webhook-Event-Source"][3:])
        needed = (n + e) % 5 + 1
        if attempts[key] < needed:
            return 500, {}, None
        return 200, {}, {"ok": True}

    mgr = WebhookManager(transport=transport, clock=lambda: clock["t"])
    sub_key = {}
    for n in keys:
        private = n % 5 == 0
        sub = WebhookSubscription(
            webhook_url=(f"http://10.0.0.{n}/hook/{n}" if private
                         else f"https://hooks.example.test/hook/{n}"),
            event_types=("crawl.completed",),
            max_retries=n % 4 + 1,
            auto_disable_after_failures=3 if n % 7 == 0 else 10,
            custom_headers={},
        )
        mgr.subscribe(sub)
        sub_key[sub.uuid] = n

    for e in events:
        created = mgr.trigger_event(
            "crawl.completed", {"event": e}, "crawl", f"job{e}")
        # the fake transport needs the event id; ride it on a header
        for did in created:
            mgr.deliveries[did].request_headers[
                "X-Webhook-Event-Source"] = f"job{e}"
        mgr.process_queue()
        while any(d.status == "retrying" for d in mgr.deliveries.values()):
            clock["t"] += 600.0  # past any 2^a * 60s backoff slot
            mgr.process_retries()

    rows = sorted(
        (sub_key[d.subscription_uuid], int(d.event_source_id[3:]),
         d.status, d.attempt_number, d.error_code or "")
        for d in mgr.deliveries.values())
    return pa.table({
        "sub_key": pa.array([r[0] for r in rows], pa.int64()),
        "event_idx": pa.array([r[1] for r in rows], pa.int64()),
        "status": pa.array([r[2] for r in rows], pa.string()),
        "attempts": pa.array([r[3] for r in rows], pa.int64()),
        "error_code": pa.array([r[4] for r in rows], pa.string()),
    })


_WEBHOOK_DELIVERIES_SQL = """
WITH f AS (
  SELECT nn.n_nationkey AS n, r.r_regionkey AS e,
         nn.n_nationkey % 5 = 0 AS blocked,
         (nn.n_nationkey + r.r_regionkey) % 5 + 1 AS needed,
         nn.n_nationkey % 4 + 1 AS maxr
  FROM nation nn CROSS JOIN region r),
g AS (SELECT *, (NOT blocked AND needed > maxr) AS fail FROM f),
-- consecutive exhausted failures (success resets; blocked never counts)
h AS (
  SELECT *,
    CASE WHEN fail THEN
      e - coalesce(MAX(CASE WHEN NOT fail THEN e END)
                   OVER (PARTITION BY n ORDER BY e
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   -1)
    ELSE 0 END AS consec
  FROM g),
dis AS (
  SELECT n, MIN(e) AS dis_e FROM h
  WHERE n % 7 = 0 AND consec >= 3 GROUP BY n)
SELECT h.n AS sub_key, h.e AS event_idx,
       CASE WHEN h.blocked OR h.fail THEN 'failed' ELSE 'delivered' END
         AS status,
       CASE WHEN h.blocked THEN 1 ELSE LEAST(h.needed, h.maxr) END
         AS attempts,
       CASE WHEN h.blocked THEN 'PRIVATE_IP_BLOCKED' ELSE '' END
         AS error_code
FROM h LEFT JOIN dis ON dis.n = h.n
WHERE dis.dis_e IS NULL OR h.e <= dis.dis_e
ORDER BY sub_key, event_idx
"""


# ------------------------------------------------- M21 template rendering

_URL_TEMPLATE = ("https://shop.example/{{meta.brand|host}}/item/{{name|path}}"
                 "?q={{name|query}}&sz={{size}}&m={{missing}}&lit=\\{{x}}")
_TEXT_TEMPLATE = "find {{name|query}} at {{meta.brand}}"


def template_render(sf_dir: str):
    """URL + text template rendering over the part table (host/path/query
    filters, dotted paths, missing-variable passthrough, escaped braces);
    distributed as a map_batches stage."""
    from ..functions.templates import render_text_template, render_url_template

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_brand", "p_size"])

    def render_batch(batch: pa.Table) -> pa.Table:
        urls, texts = [], []
        for name, brand, size in zip(batch.column("p_name").to_pylist(),
                                     batch.column("p_brand").to_pylist(),
                                     batch.column("p_size").to_pylist()):
            variables = {"meta": {"brand": brand}, "name": name,
                         "size": int(size)}
            urls.append(render_url_template(_URL_TEMPLATE, variables))
            texts.append(render_text_template(_TEXT_TEMPLATE, variables))
        return pa.table({"p_partkey": batch.column("p_partkey"),
                         "url": pa.array(urls, pa.string()),
                         "text": pa.array(texts, pa.string())})

    out = ds.map_batches(render_batch, batch_format="pyarrow")
    return pa.concat_tables(out.iter_batches(batch_size=8192,
                                             batch_format="pyarrow"))


# p_name is [a-z ]+ (validated), so encodeURIComponent == space -> %20;
# host filter drops everything outside [a-z0-9.-] from the lowered brand
_TEMPLATE_RENDER_SQL = """
SELECT p_partkey,
       'https://shop.example/' ||
       regexp_replace(lower(p_brand), '[^a-z0-9.-]', '', 'g') ||
       '/item/' || replace(p_name, ' ', '%20') ||
       '?q=' || replace(p_name, ' ', '%20') ||
       '&sz=' || CAST(p_size AS VARCHAR) ||
       '&m={{missing}}&lit={{x}}' AS url,
       'find ' || p_name || ' at ' || p_brand AS text
FROM part
ORDER BY p_partkey
"""


# ------------------------------------------- M22/M23 proxy rules + tiers


def proxy_rules(sf_dir: str):
    """Rule-priority proxy matching (exact > wildcard URL > wildcard
    domain, first rule wins within a pass) + mode -> tier resolution over
    synthetic-site URLs; distributed as a map_batches stage with the
    ProxyConfig captured in the stage closure (broadcast once)."""
    from ..functions.proxy import ProxyConfig, ProxyRule
    from ..sources.synthetic_site import page_url

    rd = _rd()
    config = ProxyConfig(
        rules=[
            ProxyRule(proxy="px-exact", url=page_url(1)),
            ProxyRule(proxy="px-site2", pattern="http://site2.test/p/*"),
            ProxyRule(proxy="px-short", pattern="http://site?.test/p/00000*"),
            ProxyRule(proxy="px-dom3", domain="site3.*"),
        ],
        base_url="http://base:1",
        stealth_url="http://stealth:1",
    )
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def match_batch(batch: pa.Table) -> pa.Table:
        proxies, tiers = [], []
        for did in batch.column("doc_id").to_pylist():
            url = page_url(int(did))
            proxies.append(config.find_proxy_for_url(url) or "")
            mode = ["auto", "base", "stealth",
                    f"http://custom:{did % 7}"][did % 4]
            tiers.append("|".join(config.resolve_tiers(mode)))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "proxy": pa.array(proxies, pa.string()),
                         "tiers": pa.array(tiers, pa.string())})

    out = ds.map_batches(match_batch, batch_format="pyarrow")
    return pa.concat_tables(out.iter_batches(batch_size=8192,
                                             batch_format="pyarrow"))


_PROXY_RULES_SQL = """
SELECT doc_id,
       CASE WHEN doc_id = 1 THEN 'px-exact'
            WHEN doc_id % 4 = 2 THEN 'px-site2'
            WHEN doc_id < 10 THEN 'px-short'
            WHEN doc_id % 4 = 3 THEN 'px-dom3'
            ELSE '' END AS proxy,
       CASE doc_id % 4
            WHEN 0 THEN 'http://base:1|http://stealth:1'
            WHEN 1 THEN 'http://base:1'
            WHEN 2 THEN 'http://stealth:1|http://base:1'
            ELSE 'http://custom:' || CAST(doc_id % 7 AS VARCHAR) END AS tiers
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------- T7/J4 template merge + access


_MERGE_RESTRICTION = {"type": "glob",
                      "patterns": ["https://*.example.com/*",
                                   "http://shop.example/*"]}


def template_merge(sf_dir: str):
    """Deep option merge (request wins, None skipped, nested recursion) +
    template access control + glob domain validation over customer-derived
    requests; distributed as a map_batches stage."""
    from ..functions.template_system import (
        deep_merge_options_with_template,
        has_template_access,
        parse_domain_restriction,
        validate_domain,
    )

    rd = _rd()
    restriction = parse_domain_restriction(_MERGE_RESTRICTION)
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def merge_batch(batch: pa.Table) -> pa.Table:
        cols = {"c_custkey": [], "m_timeout": [], "m_nested_a": [],
                "m_nested_c": [], "m_flag": [], "access_ok": [],
                "domain_ok": []}
        for c in batch.column("c_custkey").to_pylist():
            c = int(c)
            template = {"created_by": "u1",
                        "status": "published" if c % 3 else "draft",
                        "review_status": "approved",
                        "options": {"timeout": 30000,
                                    "nested": {"a": -1, "c": 9},
                                    "flag": True}}
            request = {"timeout": c % 90000 + 1,
                       "nested": {"a": c % 5, "b": None},
                       "formats": None}
            merged = deep_merge_options_with_template(
                request, template["options"])
            user = "u1" if c % 2 else "u2"
            url = [f"https://c{c % 7}.example.com/x",
                   "http://shop.example/q",
                   "http://other.net/r"][c % 3]
            cols["c_custkey"].append(c)
            cols["m_timeout"].append(merged["timeout"])
            cols["m_nested_a"].append(merged["nested"]["a"])
            cols["m_nested_c"].append(merged["nested"]["c"])
            cols["m_flag"].append(bool(merged["flag"]))
            cols["access_ok"].append(
                1 if has_template_access(template, user) else 0)
            cols["domain_ok"].append(
                1 if validate_domain(url, restriction)[0] else 0)
        return pa.table({
            "c_custkey": pa.array(cols["c_custkey"], pa.int64()),
            "m_timeout": pa.array(cols["m_timeout"], pa.int64()),
            "m_nested_a": pa.array(cols["m_nested_a"], pa.int64()),
            "m_nested_c": pa.array(cols["m_nested_c"], pa.int64()),
            "m_flag": pa.array(cols["m_flag"], pa.bool_()),
            "access_ok": pa.array(cols["access_ok"], pa.int64()),
            "domain_ok": pa.array(cols["domain_ok"], pa.int64()),
        })

    out = ds.map_batches(merge_batch, batch_format="pyarrow")
    return pa.concat_tables(out.iter_batches(batch_size=8192,
                                             batch_format="pyarrow"))


_TEMPLATE_MERGE_SQL = """
SELECT c_custkey,
       c_custkey % 90000 + 1 AS m_timeout,
       c_custkey % 5 AS m_nested_a,
       9 AS m_nested_c,
       TRUE AS m_flag,
       CASE WHEN c_custkey % 2 = 1 OR c_custkey % 3 <> 0
            THEN 1 ELSE 0 END AS access_ok,
       CASE WHEN c_custkey % 3 IN (0, 1) THEN 1 ELSE 0 END AS domain_ok
FROM customer
ORDER BY c_custkey
"""


CONTROL_QUERIES = {
    "scheduler_fires": scheduler_fires,
    "webhook_deliveries": webhook_deliveries,
    "template_render": template_render,
    "proxy_rules": proxy_rules,
    "template_merge": template_merge,
}

CONTROL_ORACLE_SQL = {
    "scheduler_fires": _SCHEDULER_FIRES_SQL,
    "webhook_deliveries": _WEBHOOK_DELIVERIES_SQL,
    "template_render": _TEMPLATE_RENDER_SQL,
    "proxy_rules": _PROXY_RULES_SQL,
    "template_merge": _TEMPLATE_MERGE_SQL,
}
