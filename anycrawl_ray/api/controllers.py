"""v1 controllers: the Express controller layer re-expressed over the
rebuild's pipelines and managers.

Reference: apps/api/src/controllers/v1/{Scrape,Search,Crawl,
ScheduledTasks,Webhooks,File}Controller.ts and routers/v1/index.ts.
Response envelopes, status codes and validation-error shapes mirror the
controllers line for line; execution goes through the same public
functions the CLI uses (run_scrape / run_crawl / run_search), so the API
adds no second code path over the engine.
"""

from __future__ import annotations

import uuid as _uuid

from ..functions.credits import (calculate_crawl_initial_credits,
                                 estimate_task_credits, per_page_cost)
from ..functions.templates import render_url_template
from ..state.scheduler import Cron, ScheduledTask
from ..state.webhooks import WEBHOOK_EVENT_TYPES, WebhookSubscription
from .store import FINISHED_STATUSES, ApiState, JobRecord


class ApiError(Exception):
    """Carries the exact (status, json-payload) the controller sends."""

    def __init__(self, status: int, payload: dict) -> None:
        super().__init__(payload.get("error", "error"))
        self.status = status
        self.payload = payload


def _zod_issue(fieldname: str, message: str, code: str = "custom") -> dict:
    return {"field": fieldname, "message": message, "code": code}


def validation_error(issues: list[dict], details_key: str = "data") -> ApiError:
    """The ZodError envelope (each controller's catch branch). Scrape /
    crawl / search wrap issues under ``data``; the CRUD controllers use
    ``details`` — callers pick via ``details_key``."""
    message = ", ".join(i["message"] for i in issues)
    if details_key == "details":
        payload = {"success": False, "error": "Validation error",
                   "message": message, "details": issues}
    else:
        payload = {"success": False, "error": "Validation error",
                   "message": message,
                   "data": {"type": "VALIDATION_ERROR", "issues": issues,
                            "message": message, "status": "failed"}}
    return ApiError(400, payload)


def internal_error(message: str) -> ApiError:
    return ApiError(500, {"success": False, "error": "Internal server error",
                          "message": message,
                          "data": {"type": "INTERNAL_ERROR",
                                   "message": message, "status": "failed"}})


# ------------------------------------------------------------ templates

_TEMPLATE_ALLOWED = {
    "scrape": ("template_id", "url", "variables"),
    "crawl": ("template_id", "url", "variables"),
    "search": ("template_id", "query", "variables"),
}


def _check_template_only_fields(body: dict, template_type: str) -> None:
    """templateValidator.ts: with template_id, only id/url|query/variables."""
    allowed = _TEMPLATE_ALLOWED[template_type]
    invalid = [k for k in body if k not in allowed]
    if invalid:
        allowed_list = ", ".join(allowed)
        message = (f"When using template_id, only {allowed_list} are "
                   f"allowed. Invalid fields: {', '.join(invalid)}")
        issues = [_zod_issue(
            k, f"Field '{k}' is not allowed when using template_id",
            "invalid_field") for k in invalid]
        raise ApiError(400, {
            "success": False, "error": "Validation error",
            "message": message,
            "data": {"type": "VALIDATION_ERROR", "issues": issues,
                     "message": (f"When using template_id, only "
                                 f"{allowed_list} are allowed"),
                     "status": "failed"}})


def _merge_template(state: ApiState, body: dict, template_type: str,
                    user_id: str | None) -> tuple[dict, int]:
    """TemplateHandler.mergeRequestWithTemplate + reslovePrice: returns
    (merged request data, per-call template price). Missing template /
    access / domain violations surface as the generic 500 path (the
    reference lets TemplateHandler throw into the catch-all)."""
    from ..functions.template_system import process_template

    template = state.templates.get(str(body["template_id"]))
    if template is None:
        raise internal_error("Template not found")
    url_or_query = body.get("url") or body.get("query") or ""
    url = render_url_template(str(url_or_query), body.get("variables"))
    res = process_template(template, url, {}, template_type, user_id)
    if not res.get("success"):
        raise internal_error(res.get("error", "Template processing failed"))
    merged = dict(res["merged_options"])
    merged["url" if template_type != "search" else "query"] = url
    price = ((template.get("pricing") or {}).get("perCall")) or 0
    return merged, price


# ------------------------------------------------------------ scrape

def _scrape_options(body: dict) -> dict:
    opts = dict(body.get("options") or {})
    # tolerate flat bodies (SDK sends nested; CLI users often flatten)
    for k in ("formats", "include_tags", "exclude_tags", "timeout",
              "json_options", "extract_source", "proxy"):
        if k in body and k not in opts:
            opts[k] = body[k]
    return opts


def scrape_handle(state: ApiState, req) -> tuple[int, dict]:
    """POST /v1/scrape (ScrapeController.ts:11-154): template merge,
    URL-template render, validate, run, per-format envelope; failed
    scrapes return 200 with success=false and zero credits."""
    body = dict(req.body or {})
    default_price = 0
    if body.get("template_id"):
        _check_template_only_fields(body, "scrape")
        user = req.auth.user if req.auth else None
        body, default_price = _merge_template(state, body, "scrape", user)
    try:
        if isinstance(body.get("url"), str):
            body["url"] = render_url_template(body["url"],
                                              body.get("variables"))
    except Exception:
        pass  # schema validates below (controller swallows render errors)

    url = body.get("url")
    if not isinstance(url, str) or not url:
        raise validation_error([_zod_issue("url", "Required",
                                           "invalid_type")])
    if not _valid_url(url):
        # z.string().url() (BaseSchema.ts:50)
        raise validation_error([_zod_issue("url", "Invalid url",
                                           "invalid_string")])
    engine = body.get("engine", "cheerio")
    from ..registry import available_engines

    if engine not in available_engines():
        raise validation_error([_zod_issue(
            "engine", f"Invalid enum value. Expected one of "
            f"{sorted(available_engines())}, received '{engine}'",
            "invalid_enum_value")])
    opts = _scrape_options(body)

    job_id = str(_uuid.uuid4())
    rec = JobRecord(job_id=job_id, job_type="scrape",
                    job_queue_name=f"scrape-{engine}", url=url,
                    created_at=state.now_iso())
    state.jobs[job_id] = rec
    req.job_id = job_id
    try:
        from ..pipelines.scrape import run_scrape

        doc = run_scrape(
            url, state.pages, formats=opts.get("formats"),
            job_id=job_id, use_ray=state.use_ray, engine=engine,
            include_tags=opts.get("include_tags"),
            exclude_tags=opts.get("exclude_tags"))
    except ValueError as exc:
        raise validation_error([_zod_issue("options", str(exc))])
    except Exception as exc:  # controller catch-all
        rec.status = "failed"
        req.credits_used = 0
        raise internal_error(str(exc))

    if doc.get("status") == "failed":
        rec.status = "failed"
        rec.failed = 1
        rec.total = 1
        req.credits_used = 0
        return 200, {"success": False, "error": "Scrape task failed",
                     "message": doc.get("error")
                     or "The scraping task could not be completed",
                     "data": doc}
    rec.status = "completed"
    rec.total = rec.completed = 1
    req.credits_used = default_price + per_page_cost(
        proxy_mode=opts.get("proxy"),
        formats=opts.get("formats") or ["markdown"],
        json_options=bool(opts.get("json_options")),
        extract_source=opts.get("extract_source", "markdown"))
    rec.credits_used = req.credits_used
    base = state.domain or req.base_url
    for k in ("screenshot", "screenshot@fullPage"):
        if doc.get(k):
            doc[k] = f"{base}/v1/public/storage/file/{doc[k]}"
    return 200, {"success": True, "data": doc}


# ------------------------------------------------------------ search

def _int_field(body: dict, name: str, default: int) -> int:
    """Zod z.number() discipline for numeric body fields: ints pass,
    None/absent takes the default, anything else is a 400 validation
    error (the reference rejects '50'-the-string; without this a str>int
    comparison would 500)."""
    v = body.get(name)
    if v is None:
        return default
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise validation_error([_zod_issue(
            name, f"Expected number, received {type(v).__name__}",
            "invalid_type")])
    return int(v)


def _run_search(state: ApiState, body: dict) -> list:
    """The search execution core, shared by the HTTP handler and
    scheduled search tasks."""
    query = body.get("query")
    engine = body.get("engine", "google")
    limit = _int_field(body, "limit", 10)
    pages_n = _int_field(body, "pages", 1)
    if state.documents_path is None:
        raise internal_error("search corpus not configured")
    try:
        from ..pipelines.search import run_search
        from ..sources.serp_fixtures import build_serp_pages

        serp_pages = build_serp_pages(state.documents_path, engine,
                                      query=query, limit=limit)
        out = run_search(serp_pages[:pages_n] if engine != "ac-engine"
                         else serp_pages, limit=limit,
                         use_ray=state.use_ray)
    except KeyError:
        raise validation_error([_zod_issue(
            "engine", f"Invalid search engine '{engine}'",
            "invalid_enum_value")])
    except ApiError:
        raise
    except Exception as exc:
        raise internal_error(str(exc))
    return out.to_pylist()


def search_handle(state: ApiState, req) -> tuple[int, dict]:
    """POST /v1/search (SearchController.ts): fixture-backed SERP run,
    `{success, data: results}` envelope."""
    body = dict(req.body or {})
    if body.get("template_id"):
        _check_template_only_fields(body, "search")
        user = req.auth.user if req.auth else None
        body, _price = _merge_template(state, body, "search", user)
    query = body.get("query")
    if not isinstance(query, str) or not query:
        raise validation_error([_zod_issue("query", "Required",
                                           "invalid_type")])
    data = _run_search(state, body)
    req.credits_used = _int_field(body, "pages", 1)
    return 200, {"success": True, "data": data}


# ------------------------------------------------------------ crawl

def run_task_payload(state: ApiState, task_type: str, payload: dict) -> str:
    """Scheduler trigger seam: launch a task's underlying job through the
    same execution path as the HTTP handlers; returns the job uuid.
    Invalid payloads raise (the scheduler records the execution as
    failed); scrape/search actually execute, not just log a row."""
    payload = dict(payload or {})
    if task_type == "template":
        template = state.templates.get(str(payload.get("template_id") or ""))
        actual = (template or {}).get("templateType") or "scrape"
        merged = {**((template or {}).get("reqOptions") or {}), **payload}
        merged.pop("template_id", None)
        return run_task_payload(state, actual, merged)
    if task_type == "crawl":
        return _start_crawl_job(state, payload)

    engine = payload.get("engine", "cheerio")
    job_id = str(_uuid.uuid4())
    rec = JobRecord(
        job_id=job_id, job_type=task_type,
        job_queue_name=f"{task_type}-{engine}",
        url=str(payload.get("url") or payload.get("query") or ""),
        created_at=state.now_iso(), payload=payload)

    if task_type == "scrape":
        url = payload.get("url")
        if not isinstance(url, str) or not url:
            raise validation_error([_zod_issue("url", "Required",
                                               "invalid_type")])
        state.jobs[job_id] = rec
        from ..pipelines.scrape import run_scrape

        try:
            doc = run_scrape(url, state.pages,
                             formats=payload.get("formats"),
                             job_id=job_id, use_ray=state.use_ray,
                             engine=engine)
        except Exception:
            rec.status = "failed"
            rec.failed = rec.total = 1
            return job_id
        rec.total = 1
        if doc.get("status") == "failed":
            rec.status = "failed"
            rec.failed = 1
        else:
            rec.status = "completed"
            rec.completed = 1
            rec.credits_used = per_page_cost(
                proxy_mode=payload.get("proxy"),
                formats=payload.get("formats") or ["markdown"],
                json_options=bool(payload.get("json_options")),
                extract_source=payload.get("extract_source", "markdown"))
        return job_id

    if task_type == "search":
        query = payload.get("query")
        if not isinstance(query, str) or not query:
            raise validation_error([_zod_issue("query", "Required",
                                               "invalid_type")])
        state.jobs[job_id] = rec
        try:
            out = _run_search(state, payload)
        except ApiError:
            rec.status = "failed"
            rec.failed = rec.total = 1
            return job_id
        rec.status = "completed"
        rec.total = rec.completed = len(out)
        rec.credits_used = _int_field(payload, "pages", 1)
        return job_id

    raise validation_error([_zod_issue("task_type",
                                       f"Unknown task type '{task_type}'",
                                       "invalid_enum_value")])


def _job_from_body(body: dict) -> tuple[str, dict]:
    url = body.get("url")
    if not isinstance(url, str) or not url:
        raise validation_error([_zod_issue("url", "Required",
                                           "invalid_type")])
    if not _valid_url(url):
        # z.string().url() (BaseSchema.ts:50)
        raise validation_error([_zod_issue("url", "Invalid url",
                                           "invalid_string")])
    opts = dict(body.get("options") or {})
    for k in ("limit", "max_depth", "strategy", "include_paths",
              "exclude_paths", "scrape_paths", "formats"):
        if k in body and k not in opts:
            opts[k] = body[k]
    scrape_opts = opts.get("scrape_options") or {}
    for k in ("formats", "include_tags", "exclude_tags"):
        if k in scrape_opts and k not in opts:
            opts[k] = scrape_opts[k]
    return url, opts


def _start_crawl_job(state: ApiState, body: dict) -> str:
    from ..pipelines.crawl import CrawlJob

    url, opts = _job_from_body(body)
    job_id = str(_uuid.uuid4())
    engine = body.get("engine", "cheerio")
    known = {"limit", "max_depth", "strategy", "include_paths",
             "exclude_paths", "scrape_paths", "formats", "include_tags",
             "exclude_tags", "wait_for", "wait_until", "wait_for_selector"}
    try:
        job = CrawlJob(job_id=job_id, seed_urls=[url], engine=engine,
                       **{k: v for k, v in opts.items() if k in known})
    except (ValueError, TypeError) as exc:
        # TypeError: non-numeric limit/max_depth from the client — Zod
        # rejects these as 400, not 500
        raise validation_error([_zod_issue("options", str(exc))])
    rec = JobRecord(job_id=job_id, job_type="crawl",
                    job_queue_name=f"crawl-{engine}", url=url,
                    created_at=state.now_iso(),
                    payload={"job": job, "body": body})
    state.jobs[job_id] = rec
    if state.run_mode == "sync":
        _execute_crawl(state, rec)
    else:
        state._pending.append(job_id)
    return job_id


def _execute_crawl(state: ApiState, rec: JobRecord) -> None:
    from ..pipelines.crawl import run_crawl

    job = rec.payload["job"]
    rec.status = "running"
    try:
        res = run_crawl(job, state.pages, out_dir=state.out_dir,
                        checkpoint_dir=state.checkpoint_dir,
                        use_ray=state.use_ray,
                        cancel_check=lambda: rec.status == "cancelled",
                        webhooks=state.webhook_manager)
    except Exception as exc:
        rec.status = "failed"
        state.webhook_manager.trigger_event(
            "crawl.failed", {"job_id": rec.job_id, "error": str(exc)},
            "crawl", rec.job_id)
        state.webhook_manager.process_queue()
        return
    if rec.status != "cancelled":
        rec.status = "completed"
    rec.total = res.stats.get("enqueued", 0)
    rec.completed = res.stats.get("succeeded", 0)
    rec.failed = res.stats.get("failed", 0)
    rec.credits_used = res.stats.get("credits_used", 0)
    state.webhook_manager.process_queue()


def run_pending_jobs(state: ApiState) -> int:
    """Manual-mode worker drain (the BullMQ worker's stand-in)."""
    n = 0
    while state._pending:
        job_id = state._pending.pop(0)
        rec = state.jobs.get(job_id)
        if rec and rec.status == "pending":
            _execute_crawl(state, rec)
            n += 1
    return n


def crawl_start(state: ApiState, req) -> tuple[int, dict]:
    """POST /v1/crawl (CrawlController.ts:15-130)."""
    body = dict(req.body or {})
    default_price = 0
    if body.get("template_id"):
        _check_template_only_fields(body, "crawl")
        user = req.auth.user if req.auth else None
        body, default_price = _merge_template(state, body, "crawl", user)
    try:
        if isinstance(body.get("url"), str):
            body["url"] = render_url_template(body["url"],
                                              body.get("variables"))
    except Exception:
        pass

    # credits precheck: requested limit vs available credits (402)
    if (req.auth and state.auth_enabled and state.credits_enabled):
        opts_body = body.get("options") or {}
        limit = (_int_field(opts_body, "limit", 0)
                 or _int_field(body, "limit", 0) or 100)
        if limit > req.auth.credits:
            return 402, {
                "success": False, "error": "Insufficient credits",
                "message": (f"Desired requested limit ({limit}) exceeds "
                            f"available credits ({req.auth.credits})."),
                "current_credits": req.auth.credits}
    job_id = _start_crawl_job(state, body)
    req.job_id = job_id
    req.credits_used = default_price + calculate_crawl_initial_credits(
        (body.get("options") or {}).get("scrape_options"))
    return 200, {"success": True, "data": {
        "job_id": job_id, "status": "created",
        "message": "Crawl job has been queued for processing"}}


def _get_job_or_error(state: ApiState, job_id: str) -> JobRecord:
    try:
        _uuid.UUID(job_id)
    except (ValueError, AttributeError, TypeError):
        raise ApiError(400, {"success": False, "error": "Invalid job ID",
                             "message": "Job ID must be a valid UUID"})
    job = state.jobs.get(job_id)
    if job is None:
        raise ApiError(400, {"success": False, "error": "Not found",
                             "message": "Job not found"})
    return job


def crawl_status(state: ApiState, req) -> tuple[int, dict]:
    """GET /v1/crawl/:jobId/status (CrawlController.ts:131-196)."""
    job = _get_job_or_error(state, req.params["jobId"])
    return 200, {"success": True,
                 "message": "Job status retrieved successfully",
                 "data": {"job_id": job.job_id, "status": job.status,
                          "start_time": state.now_iso(),
                          "expires_at": state.now_iso(),
                          "credits_used": job.credits_used,
                          "total": job.total, "completed": job.completed,
                          "failed": job.failed}}


def crawl_results(state: ApiState, req) -> tuple[int, dict]:
    """GET /v1/crawl/:jobId[/results]?skip=N (CrawlController.ts:198-266)
    via the paginated parquet reader."""
    job = _get_job_or_error(state, req.params["jobId"])
    from ..sources.results import results_response

    raw_skip = req.query.get("skip", ["0"])[0]
    base = state.domain or req.base_url
    resp = results_response(
        state.out_dir, job.job_id, skip=raw_skip, base=base,
        status=job.status,
        stats={"total": job.total, "completed": job.completed,
               "credits_used": job.credits_used})
    return 200, resp


def crawl_cancel(state: ApiState, req) -> tuple[int, dict]:
    """DELETE /v1/crawl/:jobId (CrawlController.ts:273-356)."""
    job_id = req.params["jobId"]
    try:
        _uuid.UUID(job_id)
    except (ValueError, TypeError):
        raise ApiError(400, {"success": False, "error": "Invalid job ID",
                             "message": "Job ID must be a valid UUID"})
    job = state.jobs.get(job_id)
    if job is None:
        raise ApiError(404, {"success": False, "error": "Not found",
                             "message": "Job not found"})
    if job.status in FINISHED_STATUSES:
        raise ApiError(409, {"success": False,
                             "error": "Job already finished",
                             "message": "Finished jobs cannot be cancelled"})
    job.status = "cancelled"
    if job.job_id in state._pending:
        state._pending.remove(job.job_id)
    return 200, {"success": True, "message": "Job cancelled successfully",
                 "data": {"job_id": job.job_id, "status": "cancelled"}}


# ---------------------------------------------------- scheduled tasks

_TASK_TYPES = ("scrape", "crawl", "search", "template")
_CONCURRENCY_MODES = ("skip", "queue")


def _owner_ids(req) -> tuple[str | None, str | None]:
    if req.auth is None:
        return None, None
    return req.auth.uuid, req.auth.user


def _owned(row: dict, api_key_id: str | None, user_id: str | None) -> bool:
    """The controllers' three-way where-clause: by userId if present,
    else by apiKey, else unrestricted."""
    if user_id:
        return row.get("user_id") == user_id
    if api_key_id:
        return row.get("api_key") == api_key_id
    return True


def _validate_task_body(body: dict, partial: bool) -> dict:
    issues = []
    out = {}

    def need(k):
        return (k in body) if partial else True

    if need("name"):
        v = body.get("name")
        if not isinstance(v, str) or not 1 <= len(v) <= 255:
            issues.append(_zod_issue("name",
                                     "String must contain at least 1 "
                                     "character(s)", "too_small"))
        else:
            out["name"] = v
    if "description" in body:
        out["description"] = body["description"]
    if need("cron_expression"):
        v = body.get("cron_expression")
        ok = isinstance(v, str)
        if ok:
            try:
                Cron(v)
            except Exception:
                ok = False
        if not ok:
            issues.append(_zod_issue("cron_expression",
                                     "Invalid cron expression"))
        else:
            out["cron_expression"] = v
    if "timezone" in body or not partial:
        out["timezone"] = body.get("timezone", "UTC")
    if need("task_type"):
        v = body.get("task_type")
        if v not in _TASK_TYPES:
            issues.append(_zod_issue("task_type",
                                     f"Invalid enum value. Expected "
                                     f"{' | '.join(_TASK_TYPES)}",
                                     "invalid_enum_value"))
        else:
            out["task_type"] = v
    if need("task_payload"):
        v = body.get("task_payload")
        if not isinstance(v, dict):
            issues.append(_zod_issue("task_payload", "Required",
                                     "invalid_type"))
        else:
            out["task_payload"] = v
    if "concurrency_mode" in body or not partial:
        v = body.get("concurrency_mode", "skip")
        if v not in _CONCURRENCY_MODES:
            issues.append(_zod_issue("concurrency_mode",
                                     "Invalid enum value",
                                     "invalid_enum_value"))
        else:
            out["concurrency_mode"] = v
    if "max_executions_per_day" in body:
        v = body["max_executions_per_day"]
        if v is not None and (not isinstance(v, int) or v <= 0):
            issues.append(_zod_issue("max_executions_per_day",
                                     "Number must be greater than 0",
                                     "too_small"))
        else:
            out["max_executions_per_day"] = v
    for k in ("tags", "metadata", "webhook_ids", "webhook_url"):
        if k in body:
            out[k] = body[k]
    if issues:
        raise validation_error(issues, details_key="details")
    return out


def _task_next_execution(state: ApiState, cron_expression: str):
    try:
        return Cron(cron_expression).next_after(state.clock())
    except Exception:
        return None


def _register_task_with_scheduler(state: ApiState, row: dict) -> None:
    if not state.scheduler_running:
        return
    state.scheduler.remove_task(row["uuid"])
    state.scheduler.add_task(ScheduledTask(
        uuid=row["uuid"], name=row["name"],
        cron_expression=row["cron_expression"],
        task_type=row["task_type"], task_payload=row["task_payload"],
        is_active=row["is_active"], is_paused=row["is_paused"],
        concurrency_mode=row["concurrency_mode"],
        max_executions_per_day=row.get("max_executions_per_day"),
        min_credits_required=row.get("min_credits_required", 0)))


def _handle_webhook_associations(state: ApiState, task_id: str,
                                 webhook_ids, webhook_url,
                                 api_key_id, user_id) -> None:
    """ScheduledTasksController.ts:558-641 — auto-create a task-scoped
    webhook for webhook_url; attach the task to owned webhook_ids."""
    if webhook_url:
        row = _insert_webhook_row(state, {
            "name": f"Webhook for task: {task_id}",
            "description": "Auto-created webhook for scheduled task",
            "webhook_url": webhook_url,
            "event_types": ["task.executed", "task.failed",
                            "task.paused", "task.resumed"],
            "scope": "specific", "specific_task_ids": [task_id],
            "custom_headers": {}, "timeout_seconds": 10,
            "max_retries": 3, "retry_backoff_multiplier": 2,
        }, api_key_id, user_id)
        del row  # secret is not surfaced on auto-create
    for webhook_id in webhook_ids or []:
        row = state.webhooks.get(webhook_id)
        if row is None or not _owned(row, api_key_id, user_id):
            continue  # log-and-skip in the reference
        ids = list(row.get("specific_task_ids") or [])
        if task_id not in ids:
            ids.append(task_id)
            row["specific_task_ids"] = ids
            row["scope"] = "specific"
            row["updated_at"] = state.now_iso()
            sub = state.webhook_manager.subscriptions.get(webhook_id)
            if sub is not None:
                sub.specific_task_ids = tuple(ids)
                sub.scope = "specific"


def tasks_create(state: ApiState, req) -> tuple[int, dict]:
    data = _validate_task_body(dict(req.body or {}), partial=False)
    api_key_id, user_id = _owner_ids(req)
    template = None
    if data["task_payload"].get("template_id"):
        template = state.templates.get(
            str(data["task_payload"]["template_id"]))
    min_credits = estimate_task_credits(data["task_type"],
                                        data["task_payload"], template)
    next_exec = _task_next_execution(state, data["cron_expression"])
    task_uuid = str(_uuid.uuid4())
    row = {
        "uuid": task_uuid, "api_key": api_key_id, "user_id": user_id,
        "name": data["name"], "description": data.get("description"),
        "cron_expression": data["cron_expression"],
        "timezone": data["timezone"], "task_type": data["task_type"],
        "task_payload": data["task_payload"],
        "concurrency_mode": data["concurrency_mode"],
        "max_executions_per_day": data.get("max_executions_per_day"),
        "min_credits_required": min_credits,
        "is_active": True, "is_paused": False, "pause_reason": None,
        "consecutive_failures": 0,
        "next_execution_at": next_exec.isoformat() if next_exec else None,
        "tags": data.get("tags"), "metadata": data.get("metadata"),
        "created_at": state.now_iso(), "updated_at": state.now_iso(),
        "_seq": state.next_seq(),
    }
    state.scheduled_tasks[task_uuid] = row
    _handle_webhook_associations(state, task_uuid, data.get("webhook_ids"),
                                 data.get("webhook_url"), api_key_id,
                                 user_id)
    _register_task_with_scheduler(state, row)
    return 201, {"success": True, "data": {
        "task_id": task_uuid,
        "next_execution_at": row["next_execution_at"]}}


def _serialize_task(row: dict) -> dict:
    return {k: v for k, v in row.items() if not k.startswith("_")}


def tasks_list(state: ApiState, req) -> tuple[int, dict]:
    api_key_id, user_id = _owner_ids(req)
    rows = [r for r in state.scheduled_tasks.values()
            if _owned(r, api_key_id, user_id)]
    rows.sort(key=lambda r: -r["_seq"])  # createdAt DESC
    return 200, {"success": True,
                 "data": [_serialize_task(r) for r in rows]}


def _get_owned_task(state: ApiState, req) -> dict:
    api_key_id, user_id = _owner_ids(req)
    row = state.scheduled_tasks.get(req.params["taskId"])
    if row is None or not _owned(row, api_key_id, user_id):
        raise ApiError(404, {"success": False, "error": "Task not found"})
    return row


def tasks_get(state: ApiState, req) -> tuple[int, dict]:
    return 200, {"success": True,
                 "data": _serialize_task(_get_owned_task(state, req))}


def tasks_update(state: ApiState, req) -> tuple[int, dict]:
    # NOTE deliberate reference parity: min_credits_required is computed
    # only at create time (estimateTaskCredits,
    # ScheduledTasksController.ts:64); the reference's update
    # (ts:270-300) never recomputes it, so a task_type/payload change
    # leaves the scheduler's credit gate on the original estimate.
    data = _validate_task_body(dict(req.body or {}), partial=True)
    row = _get_owned_task(state, req)
    api_key_id, user_id = _owner_ids(req)
    if "cron_expression" in data:
        next_exec = _task_next_execution(state, data["cron_expression"])
        row["next_execution_at"] = (next_exec.isoformat()
                                    if next_exec else None)
    for k in ("name", "description", "cron_expression", "timezone",
              "task_type", "task_payload", "concurrency_mode",
              "max_executions_per_day", "tags", "metadata"):
        if k in data:
            row[k] = data[k]
    row["updated_at"] = state.now_iso()
    if data.get("webhook_ids") or data.get("webhook_url"):
        _handle_webhook_associations(state, row["uuid"],
                                     data.get("webhook_ids"),
                                     data.get("webhook_url"),
                                     api_key_id, user_id)
    _register_task_with_scheduler(state, row)
    return 200, {"success": True, "message": "Task updated successfully"}


def tasks_pause(state: ApiState, req) -> tuple[int, dict]:
    api_key_id, user_id = _owner_ids(req)
    row = state.scheduled_tasks.get(req.params["taskId"])
    # reference issues a blind UPDATE ... WHERE: missing/unowned is a no-op
    if row is not None and _owned(row, api_key_id, user_id):
        row["is_paused"] = True
        row["pause_reason"] = ((req.body or {}).get("reason")
                               or "Paused by user")
        row["updated_at"] = state.now_iso()
        if row["uuid"] in state.scheduler.tasks:
            state.scheduler.pause_task(row["uuid"], row["pause_reason"])
    return 200, {"success": True, "message": "Task paused successfully"}


def tasks_resume(state: ApiState, req) -> tuple[int, dict]:
    api_key_id, user_id = _owner_ids(req)
    row = state.scheduled_tasks.get(req.params["taskId"])
    if row is not None and _owned(row, api_key_id, user_id):
        row["is_paused"] = False
        row["pause_reason"] = None
        row["consecutive_failures"] = 0
        row["updated_at"] = state.now_iso()
        if state.scheduler_running:
            if row["uuid"] in state.scheduler.tasks:
                state.scheduler.resume_task(row["uuid"])
            else:
                _register_task_with_scheduler(state, row)
    return 200, {"success": True, "message": "Task resumed successfully"}


def tasks_delete(state: ApiState, req) -> tuple[int, dict]:
    # NOTE deliberate reference parity (ScheduledTasksController.ts:
    # 441-477): only the row delete is ownership-filtered; the webhook
    # disassociation and scheduler removal below run unconditionally on
    # the requested id, exactly like the reference's
    # removeWebhookAssociations(taskId) + removeScheduledTask(taskId)
    # after its filtered DB delete.
    task_id = req.params["taskId"]
    api_key_id, user_id = _owner_ids(req)
    row = state.scheduled_tasks.get(task_id)
    if row is not None and _owned(row, api_key_id, user_id):
        del state.scheduled_tasks[task_id]
    # remove from every webhook's specific_task_ids (removeWebhookAssociations)
    for wrow in state.webhooks.values():
        ids = list(wrow.get("specific_task_ids") or [])
        if task_id in ids:
            ids.remove(task_id)
            wrow["specific_task_ids"] = ids
            wrow["updated_at"] = state.now_iso()
            sub = state.webhook_manager.subscriptions.get(wrow["uuid"])
            if sub is not None:
                sub.specific_task_ids = tuple(ids)
    state.scheduler.remove_task(task_id)
    return 200, {"success": True, "message": "Task deleted successfully"}


def tasks_executions(state: ApiState, req) -> tuple[int, dict]:
    _get_owned_task(state, req)
    task_id = req.params["taskId"]
    limit = _int_query(req, "limit", 100)
    offset = _int_query(req, "offset", 0)
    execs = [e for e in state.scheduler.executions.values()
             if e.scheduled_task_uuid == task_id]
    execs.sort(key=lambda e: e.execution_number, reverse=True)
    page = execs[offset:offset + limit]
    data = [{
        "uuid": e.uuid, "scheduled_task_uuid": e.scheduled_task_uuid,
        "execution_number": e.execution_number, "status": e.status,
        "idempotency_key": e.idempotency_key,
        "scheduled_for": getattr(e.scheduled_for, "isoformat",
                                 lambda: e.scheduled_for)(),
        "triggered_by": e.triggered_by, "job_uuid": e.job_uuid,
    } for e in page]
    return 200, {"success": True, "data": data}


def _int_query(req, name: str, default: int) -> int:
    try:
        return int(req.query.get(name, [default])[0])
    except (TypeError, ValueError):
        return default


# ------------------------------------------------------------ webhooks

def _valid_url(v) -> bool:
    return isinstance(v, str) and (v.startswith("http://")
                                   or v.startswith("https://"))


def _validate_webhook_body(body: dict, partial: bool) -> dict:
    issues = []
    out = {}

    def need(k):
        return (k in body) if partial else True

    if need("name"):
        v = body.get("name")
        if not isinstance(v, str) or not 1 <= len(v) <= 255:
            issues.append(_zod_issue("name", "String must contain at "
                                     "least 1 character(s)", "too_small"))
        else:
            out["name"] = v
    if "description" in body:
        out["description"] = body["description"]
    if need("webhook_url"):
        v = body.get("webhook_url")
        if not _valid_url(v):
            issues.append(_zod_issue("webhook_url", "Invalid url",
                                     "invalid_string"))
        else:
            out["webhook_url"] = v
    if need("event_types"):
        v = body.get("event_types")
        if (not isinstance(v, list) or not v
                or any(t not in WEBHOOK_EVENT_TYPES for t in v)):
            issues.append(_zod_issue("event_types", "Invalid event type"))
        else:
            out["event_types"] = v
    if "scope" in body or not partial:
        v = body.get("scope", "all")
        if v not in ("all", "specific"):
            issues.append(_zod_issue("scope", "Invalid enum value",
                                     "invalid_enum_value"))
        else:
            out["scope"] = v
    if "specific_task_ids" in body:
        out["specific_task_ids"] = body["specific_task_ids"]
    if "custom_headers" in body:
        out["custom_headers"] = body["custom_headers"]
    if "timeout_seconds" in body or not partial:
        v = body.get("timeout_seconds", 10)
        if not isinstance(v, int) or not 1 <= v <= 60:
            issues.append(_zod_issue("timeout_seconds",
                                     "Number must be between 1 and 60",
                                     "too_small"))
        else:
            out["timeout_seconds"] = v
    if "max_retries" in body or not partial:
        v = body.get("max_retries", 3)
        if not isinstance(v, int) or not 0 <= v <= 10:
            issues.append(_zod_issue("max_retries",
                                     "Number must be between 0 and 10"))
        else:
            out["max_retries"] = v
    if "retry_backoff_multiplier" in body or not partial:
        v = body.get("retry_backoff_multiplier", 2)
        if not isinstance(v, (int, float)) or not 1 <= v <= 10:
            issues.append(_zod_issue("retry_backoff_multiplier",
                                     "Number must be between 1 and 10"))
        else:
            out["retry_backoff_multiplier"] = v
    for k in ("tags", "metadata"):
        if k in body:
            out[k] = body[k]
    if issues:
        raise validation_error(issues, details_key="details")
    return out


def _insert_webhook_row(state: ApiState, data: dict, api_key_id,
                        user_id) -> dict:
    webhook_uuid = str(_uuid.uuid4())
    secret = state.new_secret()
    row = {
        "uuid": webhook_uuid, "api_key": api_key_id, "user_id": user_id,
        "name": data["name"], "description": data.get("description"),
        "webhook_url": data["webhook_url"], "webhook_secret": secret,
        "scope": data.get("scope", "all"),
        "specific_task_ids": data.get("specific_task_ids"),
        "event_types": data["event_types"],
        "custom_headers": data.get("custom_headers"),
        "timeout_seconds": data.get("timeout_seconds", 10),
        "max_retries": data.get("max_retries", 3),
        "retry_backoff_multiplier": data.get("retry_backoff_multiplier", 2),
        "is_active": True, "consecutive_failures": 0,
        "tags": data.get("tags"), "metadata": data.get("metadata"),
        "created_at": state.now_iso(), "updated_at": state.now_iso(),
        "_seq": state.next_seq(),
    }
    state.webhooks[webhook_uuid] = row
    state.webhook_manager.subscribe(WebhookSubscription(
        uuid=webhook_uuid, webhook_url=row["webhook_url"], secret=secret,
        event_types=tuple(row["event_types"]),
        user_id=user_id or api_key_id,
        scope=row["scope"],
        specific_task_ids=tuple(row.get("specific_task_ids") or ()),
        max_retries=row["max_retries"],
        retry_backoff_multiplier=row["retry_backoff_multiplier"],
        timeout_seconds=row["timeout_seconds"],
        custom_headers=dict(row.get("custom_headers") or {})))
    return row


def webhooks_create(state: ApiState, req) -> tuple[int, dict]:
    data = _validate_webhook_body(dict(req.body or {}), partial=False)
    if data.get("scope") == "specific" and not data.get("specific_task_ids"):
        raise ApiError(400, {
            "success": False,
            "error": "specific_task_ids is required when scope is "
                     "'specific'"})
    api_key_id, user_id = _owner_ids(req)
    row = _insert_webhook_row(state, data, api_key_id, user_id)
    return 201, {"success": True, "data": {
        "webhook_id": row["uuid"], "secret": row["webhook_secret"],
        "message": "Webhook created successfully. Save the secret - it "
                   "won't be shown again."}}


def _sanitize_webhook(row: dict) -> dict:
    out = {k: v for k, v in row.items() if not k.startswith("_")}
    out["webhook_secret"] = "***hidden***"
    return out


def webhooks_list(state: ApiState, req) -> tuple[int, dict]:
    api_key_id, user_id = _owner_ids(req)
    rows = [r for r in state.webhooks.values()
            if _owned(r, api_key_id, user_id)]
    rows.sort(key=lambda r: -r["_seq"])
    return 200, {"success": True,
                 "data": [_sanitize_webhook(r) for r in rows]}


def _get_owned_webhook(state: ApiState, req) -> dict:
    api_key_id, user_id = _owner_ids(req)
    row = state.webhooks.get(req.params["webhookId"])
    if row is None or not _owned(row, api_key_id, user_id):
        raise ApiError(404, {"success": False,
                             "error": "Webhook not found"})
    return row


def webhooks_get(state: ApiState, req) -> tuple[int, dict]:
    return 200, {"success": True,
                 "data": _sanitize_webhook(_get_owned_webhook(state, req))}


def webhooks_update(state: ApiState, req) -> tuple[int, dict]:
    data = _validate_webhook_body(dict(req.body or {}), partial=True)
    row = _get_owned_webhook(state, req)
    for k in ("name", "description", "webhook_url", "event_types",
              "scope", "specific_task_ids", "custom_headers",
              "timeout_seconds", "max_retries",
              "retry_backoff_multiplier", "tags", "metadata"):
        if k in data:
            row[k] = data[k]
    row["updated_at"] = state.now_iso()
    sub = state.webhook_manager.subscriptions.get(row["uuid"])
    if sub is not None:
        sub.webhook_url = row["webhook_url"]
        sub.event_types = tuple(row["event_types"])
        sub.scope = row["scope"]
        sub.specific_task_ids = tuple(row.get("specific_task_ids") or ())
        sub.max_retries = row["max_retries"]
        sub.retry_backoff_multiplier = row["retry_backoff_multiplier"]
        sub.timeout_seconds = row["timeout_seconds"]
        sub.custom_headers = dict(row.get("custom_headers") or {})
    return 200, {"success": True,
                 "message": "Webhook updated successfully"}


def webhooks_delete(state: ApiState, req) -> tuple[int, dict]:
    webhook_id = req.params["webhookId"]
    api_key_id, user_id = _owner_ids(req)
    row = state.webhooks.get(webhook_id)
    if row is not None and _owned(row, api_key_id, user_id):
        del state.webhooks[webhook_id]
        state.webhook_manager.subscriptions.pop(webhook_id, None)
    return 200, {"success": True,
                 "message": "Webhook deleted successfully"}


def webhooks_deliveries(state: ApiState, req) -> tuple[int, dict]:
    row = _get_owned_webhook(state, req)
    limit = _int_query(req, "limit", 100)
    offset = _int_query(req, "offset", 0)
    status = req.query.get("status", [None])[0]
    frm = req.query.get("from", [None])[0]
    to = req.query.get("to", [None])[0]

    def _ts(s):
        from datetime import datetime as _dt

        return _dt.fromisoformat(s.replace("Z", "+00:00")).timestamp()

    rows = [d for d in state.webhook_manager.deliveries.values()
            if d.subscription_uuid == row["uuid"]]
    if status:
        rows = [d for d in rows if d.status == status]
    if frm:
        rows = [d for d in rows if (d.created_at or 0) >= _ts(frm)]
    if to:
        rows = [d for d in rows if (d.created_at or 0) <= _ts(to)]
    rows.sort(key=lambda d: (d.created_at or 0), reverse=True)
    page = rows[offset:offset + limit]
    data = [{
        "uuid": d.uuid, "webhook_subscription_uuid": d.subscription_uuid,
        "event_type": d.event_type, "event_source": d.event_source,
        "event_source_id": d.event_source_id, "status": d.status,
        "attempt_number": d.attempt_number,
        "response_status": d.response_status,
        "error_message": d.error_message, "created_at": d.created_at,
        "delivered_at": d.delivered_at,
    } for d in page]
    return 200, {"success": True, "data": data,
                 "meta": {"limit": limit, "offset": offset,
                          "filters": {"status": status, "from": frm,
                                      "to": to}}}


def webhooks_test(state: ApiState, req) -> tuple[int, dict]:
    row = _get_owned_webhook(state, req)
    api_key_id, user_id = _owner_ids(req)
    try:
        state.webhook_manager.trigger_event(
            "webhook.test",
            {"message": "This is a test webhook from AnyCrawl",
             "timestamp": state.now_iso(), "webhook_id": row["uuid"]},
            "webhook", row["uuid"], user_id or api_key_id)
        state.webhook_manager.process_queue()
    except Exception as exc:
        return 500, {"success": False, "error": "Failed to trigger webhook",
                     "message": str(exc)}
    return 200, {"success": True,
                 "message": "Test webhook triggered successfully"}


def _set_webhook_active(state: ApiState, req, active: bool) -> None:
    webhook_id = req.params["webhookId"]
    api_key_id, user_id = _owner_ids(req)
    row = state.webhooks.get(webhook_id)
    if row is not None and _owned(row, api_key_id, user_id):
        row["is_active"] = active
        if active:
            row["consecutive_failures"] = 0
        row["updated_at"] = state.now_iso()
        sub = state.webhook_manager.subscriptions.get(webhook_id)
        if sub is not None:
            sub.is_active = active
            if active:
                sub.consecutive_failures = 0


def webhooks_activate(state: ApiState, req) -> tuple[int, dict]:
    _set_webhook_active(state, req, True)
    return 200, {"success": True,
                 "message": "Webhook activated successfully"}


def webhooks_deactivate(state: ApiState, req) -> tuple[int, dict]:
    _set_webhook_active(state, req, False)
    return 200, {"success": True,
                 "message": "Webhook deactivated successfully"}


def webhooks_replay(state: ApiState, req) -> tuple[int, dict]:
    row = _get_owned_webhook(state, req)
    delivery = state.webhook_manager.deliveries.get(
        req.params["deliveryId"])
    if delivery is None or delivery.subscription_uuid != row["uuid"]:
        raise ApiError(404, {"success": False,
                             "error": "Delivery not found"})
    delivery.status = "pending"
    delivery.attempt_number = 1
    delivery.error_message = None
    delivery.next_retry_at = None
    state.webhook_manager.deliver(delivery.uuid)
    return 200, {"success": True,
                 "message": "Webhook delivery replayed successfully"}


def webhooks_events(state: ApiState, req) -> tuple[int, dict]:
    ets = list(WEBHOOK_EVENT_TYPES)
    return 200, {"success": True, "data": {
        "event_types": ets,
        "categories": {
            "scrape": [e for e in ets if e.startswith("scrape.")],
            "crawl": [e for e in ets if e.startswith("crawl.")],
            "search": [e for e in ets if e.startswith("search.")],
            "scheduled_tasks": [e for e in ets if e.startswith("task.")],
            "webhook": [e for e in ets if e.startswith("webhook.")],
        }}}


# ------------------------------------------------------------ files

def file_get(state: ApiState, req):
    """GET /v1/public/storage/file/:path (FileController.ts) over the
    storage seam: local dir read (or an S3 redirect when the state's
    storage exposes temporary URLs)."""
    path = req.params["path"]
    if not path:
        raise ApiError(400, {"error": "Invalid path",
                             "details": [_zod_issue("path",
                                                    "Path is required")]})
    if state.storage_dir is None:
        raise ApiError(500, {"error": "Error sending file",
                             "message": "storage not configured"})
    try:
        # through the storage selector, so --storage-dir "s3" reaches the
        # S3 adapter instead of a local directory literally named "s3";
        # ValueError covers traversal-rejected keys (LocalDirStorage
        # raises it for paths escaping the root)
        body = state.storage.get(path)
    except (FileNotFoundError, KeyError, OSError, ValueError) as exc:
        raise ApiError(500, {"error": "Error sending file",
                             "message": str(exc)})
    return body  # raw bytes; app.py serves as octet-stream
