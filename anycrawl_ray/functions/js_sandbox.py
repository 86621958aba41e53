"""Template sandbox: validated, resource-bounded execution of customHandlers.

Port of the reference's template-client security surface onto the JS
interpreter in js_interp.py:

- ``DANGEROUS_PATTERNS`` / ``DEFAULT_ALLOWED_PAGE_METHODS``:
  packages/template-client/src/constants/security.ts (the timer patterns
  are commented out there but the validator test matrix expects them to
  reject — they live in ``VALIDATOR_ONLY_PATTERNS`` so ``page.evaluate``
  strings keep the reference's runtime behavior);
- ``TemplateCodeValidator``: validator/index.ts:20-120 — syntax (the code
  is parsed wrapped in an async function, matching the vm compile), then
  security (first matching pattern wins), then complexity (length,
  bracket-nesting depth, loop count), with the per-template
  updatedAt-keyed success cache;
- ``SecurePageProxy``: sandbox/index.ts:196-258 — method whitelist, call
  budget, dangerous-pattern screening of string arguments to the evaluate
  family, set/delete blocked;
- ``QuickJSSandbox``: sandbox/index.ts:259-470 — the executeWithVM global
  surface (context/template/variables/page/console + standard objects, no
  timers), html resolution order (scrapeResult.rawHtml -> response.body ->
  page.content()), the preNav host API (wait/get/has, wait -> undefined on
  timeout), wall-clock timeout, and the ``{success, result, context}``
  envelope with every failure wrapped as
  ``Template {id} execution failed: {msg}``.

Both reference trust paths (AsyncFunction+Proxy, vm) collapse onto the one
interpreter here; the page proxy is applied in both, which is strictly
tighter than the reference's trusted path and identical for untrusted.
"""

from __future__ import annotations

import os
import re

from .js_interp import (
    UNDEFINED,
    HostObject,
    Interpreter,
    JSSyntaxError,
    JSThrow,
    JSTimeout,
    Parser,
    js_error_message,
    standard_globals,
    to_js_string,
)


class SandboxError(Exception):
    pass


class TemplateValidationError(Exception):
    pass


# constants/security.ts DANGEROUS_PATTERNS, order preserved (validation
# throws on the FIRST match, so order is observable)
DANGEROUS_PATTERNS = [
    (re.compile(r"require\s*\(", re.I), "require() is not allowed"),
    (re.compile(r"import\s+", re.I), "import statements are not allowed"),
    (re.compile(r"process\.", re.I), "process object is not allowed"),
    (re.compile(r"child_process", re.I), "child_process module is not allowed"),
    (re.compile(r"fs\.", re.I), "fs module is not allowed"),
    (re.compile(r"__dirname", re.I), "__dirname is not allowed"),
    (re.compile(r"__filename", re.I), "__filename is not allowed"),
    (re.compile(r"global\.", re.I), "global object is not allowed"),
    (re.compile(r"globalThis\.", re.I), "globalThis is not allowed"),
    (re.compile(r"\bFunction\s*\("), "Function constructor is not allowed"),
    (re.compile(r"eval\s*\(", re.I), "eval() is not allowed"),
    (re.compile(r"new\s+Function", re.I), "new Function is not allowed"),
    (re.compile(r"AsyncFunction", re.I), "AsyncFunction constructor is not allowed"),
    (re.compile(r"GeneratorFunction", re.I), "GeneratorFunction is not allowed"),
    (re.compile(r"__proto__\s*=", re.I), "__proto__ assignment is not allowed"),
    (re.compile(r"Object\.setPrototypeOf", re.I),
     "Object.setPrototypeOf is not allowed"),
    (re.compile(r"Object\.defineProperty", re.I),
     "Object.defineProperty is not allowed"),
    (re.compile(r"Object\.defineProperties", re.I),
     "Object.defineProperties is not allowed"),
    (re.compile(r"Reflect\.construct", re.I), "Reflect.construct is not allowed"),
    (re.compile(r"Reflect\.apply", re.I), "Reflect.apply is not allowed"),
    (re.compile(r"new\s+Proxy", re.I), "new Proxy is not allowed"),
    (re.compile(r"Symbol\.for", re.I), "Symbol.for is not allowed"),
    (re.compile(r"\.constructor\.constructor", re.I),
     "constructor chain is not allowed"),
]

# security.ts keeps these commented out of the shared table, but
# validator.test.ts pins that the validator rejects them — so they apply
# only on the validateCode path, not to page.evaluate string screening
VALIDATOR_ONLY_PATTERNS = [
    (re.compile(r"setTimeout\s*\("),
     "setTimeout is not allowed (use sandbox-provided timers)"),
    (re.compile(r"setInterval\s*\("), "setInterval is not allowed"),
]

DEFAULT_ALLOWED_PAGE_METHODS = [
    # Navigation & waiting
    "goto", "reload", "waitForSelector", "waitForTimeout", "waitForLoadState",
    "waitForNavigation", "waitForEvent", "waitForRequest", "waitForResponse",
    # Interaction
    "click", "fill", "type", "press", "hover", "focus", "blur", "check",
    "uncheck", "selectOption",
    # Evaluation
    "evaluate", "evaluateHandle", "$eval", "$$eval",
    # Queries
    "$", "$$", "locator", "getByRole", "getByText", "getByLabel",
    "getByPlaceholder", "getByTestId",
    # Content
    "content", "title", "url", "textContent", "innerHTML", "innerText",
    # Screenshots & PDF
    "screenshot", "pdf",
    # Frames
    "frame", "frames", "mainFrame",
    # Attributes
    "getAttribute", "isVisible", "isHidden", "isEnabled", "isDisabled",
    "isChecked", "addScriptTag",
    # Window management & events
    "bringToFront", "on",
    # Misc / Safe utilities
    "toJSON", "isClosed",
]


def analyze_code_safety(code: str) -> tuple[bool, list[str]]:
    """sandbox/index.ts analyzeCodeSafety: every violation, not just the
    first (the runtime path reports them all joined)."""
    violations = [msg for rx, msg in DANGEROUS_PATTERNS if rx.search(code)]
    return (not violations, violations)


class TemplateCodeValidator:
    """validator/index.ts TemplateCodeValidator."""

    MAX_CODE_LENGTH = 10_000
    MAX_NESTING_DEPTH = 20
    MAX_LOOPS = 10

    def __init__(self) -> None:
        self._validated: dict[str, float] = {}

    def validate_code(self, code: str, template: dict) -> bool:
        raw_id = (template or {}).get("templateId") or \
            (template or {}).get("template_id")
        template_id = raw_id or "unknown"
        updated_at = (template or {}).get("updatedAt") \
            or (template or {}).get("createdAt") or 0
        # id-less templates all default to "unknown" — never share a
        # success-cache slot between them (distinct code would skip the
        # security screen); identified templates keep the reference's
        # (templateId, updatedAt) cache contract
        if raw_id and self._validated.get(template_id) == updated_at \
                and updated_at:
            return True
        self._validate_syntax(code, template_id)
        self._validate_security(code)
        self._validate_complexity(code)
        if raw_id:
            self._validated[template_id] = updated_at
        return True

    def _validate_syntax(self, code: str, template_id: str | None) -> None:
        # the reference compiles `(async function() { code })` in an empty
        # vm; parsing the same wrapped form catches the same class of
        # errors (incl. `import` statements, which are module-only syntax)
        try:
            Parser(code).parse_program()
        except JSSyntaxError as exc:
            where = f" in template {template_id}" if template_id else ""
            raise TemplateValidationError(f"Invalid syntax{where}: {exc}")

    def _validate_security(self, code: str) -> None:
        for rx, message in (*DANGEROUS_PATTERNS, *VALIDATOR_ONLY_PATTERNS):
            if rx.search(code):
                raise TemplateValidationError(
                    f"Security violation: {message}")

    def _validate_complexity(self, code: str) -> None:
        if len(code) > self.MAX_CODE_LENGTH:
            raise TemplateValidationError(
                f"Code too long (max {self.MAX_CODE_LENGTH} characters)")
        depth = max_depth = 0
        for ch in code:
            if ch in "{([":
                depth += 1
                max_depth = max(max_depth, depth)
            elif ch in "})]":
                depth -= 1
        if max_depth > self.MAX_NESTING_DEPTH:
            raise TemplateValidationError(
                f"Code nesting too deep (max {self.MAX_NESTING_DEPTH} levels)")
        loops = sum(len(re.findall(rx, code))
                    for rx in (r"for\s*\(", r"while\s*\(", r"do\s*{"))
        if loops > self.MAX_LOOPS:
            raise TemplateValidationError("Too many loops (max 10)")


class SecurePageProxy:
    """sandbox/index.ts:196-258 — whitelist + call budget around a host
    page object. The host page exposes plain Python methods; the proxy is
    the only path template JS has to them."""

    _EVAL_METHODS = ("evaluate", "evaluateHandle", "$eval", "$$eval")

    def __init__(self, page, stats: dict, allowed: list[str],
                 max_calls: int) -> None:
        self._page = page
        self._stats = stats
        self._allowed = allowed
        self._max_calls = max_calls

    def js_get(self, name: str):
        if name not in self._allowed:
            raise SandboxError(
                f"Access to page.{name} is not allowed. Allowed methods: "
                + ", ".join(self._allowed))
        if self._stats["pageMethodCalls"] >= self._max_calls:
            raise SandboxError(
                f"Maximum page method calls ({self._max_calls}) exceeded "
                "for security")
        value = getattr(self._page, name, None)
        if value is None and isinstance(self._page, dict):
            value = self._page.get(name)
        if not callable(value):
            return UNDEFINED if value is None else value

        def wrapped(*args):
            self._stats["pageMethodCalls"] += 1
            if name in self._EVAL_METHODS and args \
                    and isinstance(args[0], str):
                safe, violations = analyze_code_safety(args[0])
                if not safe:
                    raise SandboxError(
                        f"page.{name} contains forbidden patterns:\n"
                        + "\n".join(violations))
            return value(*args)
        return wrapped

    def js_set(self, name, value):
        raise SandboxError("Modifying page object is not allowed")

    def js_delete(self, name):
        raise SandboxError("Deleting page properties is not allowed")


class SandboxConsole:
    """sandbox/index.ts createSandboxConsole: log/error/warn collect
    formatted lines (the reference forwards to its logger); info/debug/
    trace throw."""

    def __init__(self) -> None:
        self.lines: list[tuple[str, str]] = []

    def _format(self, args) -> str:
        out = []
        for a in args:
            if isinstance(a, str):
                out.append(a)
            elif isinstance(a, dict) and a.get("__error__"):
                out.append(f"{a.get('name', 'Error')}: {a.get('message', '')}")
            else:
                from .js_interp import json_stringify
                s = json_stringify(a)
                out.append(to_js_string(a) if s is UNDEFINED else s)
        return " ".join(out)

    def js_get(self, name: str):
        if name in ("log", "error", "warn"):
            def emit(*args):
                self.lines.append((name, self._format(args)))
                return UNDEFINED
            return emit
        if name in ("info", "debug", "trace"):
            def blocked(*args):
                raise SandboxError(f"console.{name} is not allowed")
            return blocked
        return UNDEFINED


def _make_prenav_api(execution_context: dict):
    """sandbox/index.ts:39-97 createPreNavApi over the injected host."""
    host = (execution_context or {}).get("preNavHost")

    def ensure(fn_name: str):
        fn = getattr(host, fn_name, None) if host is not None else None
        if fn is None and isinstance(host, dict):
            fn = host.get(fn_name)
        if not callable(fn):
            raise SandboxError(
                f"preNav host is not available: missing {fn_name}()")
        return fn

    def _wrap_missing(v):
        return UNDEFINED if v is None else v

    return HostObject({
        "wait": lambda key, opts=UNDEFINED: _wrap_missing(
            ensure("wait")(to_js_string(key),
                           (opts or {}).get("timeoutMs")
                           if isinstance(opts, dict) else None)),
        "get": lambda key: _wrap_missing(ensure("get")(to_js_string(key))),
        "has": lambda key: bool(ensure("has")(to_js_string(key))),
    })


def _resolve_full_html(context: dict, page) -> str | None:
    """sandbox/index.ts resolveFullHtml: scrapeResult.rawHtml ->
    scrapeResult.html -> response.body -> page.content()."""
    ec = (context or {}).get("executionContext") or {}
    scrape = ec.get("scrapeResult") or {}
    html = scrape.get("rawHtml") or scrape.get("html") or None
    if not html:
        body = (ec.get("response") or {}).get("body")
        if body is not None:
            html = body.decode("utf-8", "replace") \
                if isinstance(body, (bytes, bytearray)) else str(body)
    if not html and page is not None:
        content = getattr(page, "content", None)
        if content is None and isinstance(page, dict):
            content = page.get("content")
        if callable(content):
            closed = getattr(page, "is_closed", None)
            if not (callable(closed) and closed()):
                try:
                    html = content()
                except Exception:
                    html = None
    return html


class QuickJSSandbox:
    """sandbox/index.ts QuickJSSandbox (both trust paths -> interpreter)."""

    def __init__(self, timeout: float | None = None,
                 max_page_calls: int = 1000,
                 allowed_page_methods: list[str] | None = None,
                 now_ms: float | None = None) -> None:
        env_timeout = os.environ.get("ANYCRAWL_TEMPLATE_EXECUTION_TIMEOUT")
        self.timeout = float(timeout if timeout is not None
                             else (env_timeout or 60_000))
        self.max_page_calls = max_page_calls
        self.allowed_page_methods = (allowed_page_methods
                                     or list(DEFAULT_ALLOWED_PAGE_METHODS))
        self.now_ms = now_ms

    def execute_code(self, code: str, context: dict) -> dict:
        """context: {template, variables, page, executionContext} (the
        reference's SandboxContext). Returns the reference envelope
        {"success": True, "result", "context"}; every failure raises
        SandboxError("Template {id} execution failed: {msg}")."""
        template = (context or {}).get("template") or {}
        template_id = template.get("templateId") \
            or template.get("template_id") or "unknown"
        execution_context = (context or {}).get("executionContext") or {}
        variables = (context or {}).get("variables") or {}
        raw_page = (context or {}).get("page")

        stats = {"pageMethodCalls": 0}
        html = _resolve_full_html(context, raw_page)
        secure_page = (SecurePageProxy(raw_page, stats,
                                       self.allowed_page_methods,
                                       self.max_page_calls)
                       if raw_page is not None else UNDEFINED)
        console = SandboxConsole()

        def cookies():
            # safe helper: never exposes page.context()
            try:
                ctx_fn = getattr(raw_page, "context", None)
                if not callable(ctx_fn):
                    return []
                browser_ctx = ctx_fn()
                cookies_fn = getattr(browser_ctx, "cookies", None)
                return cookies_fn() if callable(cookies_fn) else []
            except Exception:
                return []

        unified_context = {
            "data": execution_context,
            "template": template,
            "variables": variables,
            "html": html if html is not None else UNDEFINED,
            "page": secure_page,
            "userData": execution_context.get("userData", UNDEFINED),
            "preNav": _make_prenav_api(execution_context),
            "cookies": cookies,
        }
        sandbox_globals = {
            **standard_globals(now_ms=self.now_ms),
            "context": unified_context,
            "template": template,
            "variables": variables,
            "page": secure_page,
            "console": console,
            # NOTE: no setTimeout/setInterval — timers are deliberately
            # absent from the vm sandbox (security.ts)
        }

        interp = Interpreter(sandbox_globals, max_ms=self.timeout)
        try:
            result = interp.run(code)
        except JSTimeout as exc:
            raise SandboxError(
                f"Template {template_id} execution failed: {exc}")
        except JSThrow as exc:
            raise SandboxError(
                f"Template {template_id} execution failed: "
                f"{js_error_message(exc.value)}")
        except SandboxError as exc:
            raise SandboxError(
                f"Template {template_id} execution failed: {exc}")
        except (JSSyntaxError, RecursionError) as exc:
            raise SandboxError(
                f"Template {template_id} execution failed: {exc}")
        except Exception as exc:
            # interpreter-internal faults must not escape the envelope
            # (the reference's vm catches every host error the same way)
            raise SandboxError(
                f"Template {template_id} execution failed: "
                f"{type(exc).__name__}: {exc}")
        return {
            "success": True,
            "result": None if result is UNDEFINED else result,
            "context": execution_context,
            "console": console.lines,
            "stats": {"pageMethodCalls": stats["pageMethodCalls"]},
        }
