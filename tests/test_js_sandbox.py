"""Template JS sandbox conformance (T7): the reference validator test
matrix (packages/template-client/src/__tests__/validator.test.ts) ported
line for line, plus the sandbox execution semantics of
sandbox/index.ts (page proxy whitelist/budget, console policy, preNav API,
html resolution order, result envelope, timeout)."""

from __future__ import annotations

import pytest

from anycrawl_ray.functions.js_interp import (
    UNDEFINED,
    Interpreter,
    JSThrow,
    JSTimeout,
    standard_globals,
)
from anycrawl_ray.functions.js_sandbox import (
    QuickJSSandbox,
    SandboxError,
    SecurePageProxy,
    TemplateCodeValidator,
    TemplateValidationError,
    analyze_code_safety,
)


def run_js(src, extra=None, max_ms=5000):
    g = standard_globals(now_ms=1_700_000_000_000)
    if extra:
        g.update(extra)
    return Interpreter(g, max_ms=max_ms).run(src)


MOCK_TEMPLATE = {"templateId": "test-template", "updatedAt": 1111}


# ------------------------------------------------ validator.test.ts port

class TestTemplateCodeValidator:
    def setup_method(self):
        self.v = TemplateCodeValidator()

    def test_valid_javascript(self):
        code = """
            const title = document.querySelector('h1')?.textContent;
            const price = document.querySelector('.price')?.textContent;
            return { title, price };
        """
        assert self.v.validate_code(code, MOCK_TEMPLATE) is True

    def test_syntax_error(self):
        with pytest.raises(TemplateValidationError, match="Invalid syntax"):
            self.v.validate_code("const invalid = {", MOCK_TEMPLATE)

    @pytest.mark.parametrize("code,msg", [
        ("eval('alert(1)')", "eval\\(\\) is not allowed"),
        ("new Function('return 1')()", "Function constructor is not allowed"),
        ("setTimeout(() => {}, 1000)", "setTimeout is not allowed"),
        ("setInterval(() => {}, 1000)", "setInterval is not allowed"),
        ("process.exit(1)", "process object is not allowed"),
        ("require('fs')", "require\\(\\) is not allowed"),
        ("fs.readFileSync('/etc/passwd')", "fs module is not allowed"),
        # child_process matches the earlier `process.` pattern first
        ("child_process.exec('rm -rf /')",
         "Security violation: process object is not allowed"),
    ])
    def test_dangerous_patterns(self, code, msg):
        with pytest.raises(TemplateValidationError, match=msg):
            self.v.validate_code(code, MOCK_TEMPLATE)

    def test_import_is_syntax_error(self):
        # syntax validation runs before security: `import` is module-only
        # syntax inside a function body -> "Invalid syntax"
        with pytest.raises(TemplateValidationError, match="Invalid syntax"):
            self.v.validate_code("import fs from 'fs'", MOCK_TEMPLATE)

    def test_code_too_long(self):
        with pytest.raises(TemplateValidationError, match="Code too long"):
            self.v.validate_code("a" * 10_001, MOCK_TEMPLATE)

    def test_nesting_too_deep(self):
        with pytest.raises(TemplateValidationError,
                           match="Code nesting too deep"):
            self.v.validate_code("{" * 25 + "}" * 25, MOCK_TEMPLATE)

    def test_too_many_loops(self):
        code = "\n".join(["for(let i=0;i<10;i++){}"] * 12)
        with pytest.raises(TemplateValidationError, match="Too many loops"):
            self.v.validate_code(code, MOCK_TEMPLATE)

    def test_reasonable_complexity_accepted(self):
        code = """
            function extractData() {
                const results = [];
                for (let i = 0; i < 5; i++) {
                    const element = document.querySelector(`#item-${i}`);
                    if (element) {
                        results.push({
                            title: element.querySelector('.title')?.textContent,
                            price: element.querySelector('.price')?.textContent,
                        });
                    }
                }
                return results;
            }
            return extractData();
        """
        assert self.v.validate_code(code, MOCK_TEMPLATE) is True

    def test_success_cache_keyed_by_updated_at(self):
        tpl = {"templateId": "t-cache", "updatedAt": 5}
        assert self.v.validate_code("return 1;", tpl)
        # same version: cached (even a now-invalid code string passes
        # because validation is skipped — mirrors the reference cache)
        assert self.v.validate_code("eval('x')", tpl)
        # bumped version: re-validated -> rejected
        with pytest.raises(TemplateValidationError):
            self.v.validate_code("eval('x')",
                                 {"templateId": "t-cache", "updatedAt": 6})


# ------------------------------------------------- interpreter semantics

class TestInterpreterSemantics:
    def test_handler_shaped_program(self):
        out = run_js("""
            function extractData() {
                const items = ['a', 'b', 'c'];
                return {
                    count: items.length,
                    upper: items.map(x => x.toUpperCase()).join(','),
                    ok: items.includes('b') && !items.includes('z'),
                };
            }
            return extractData();
        """)
        assert out == {"count": 3.0, "upper": "A,B,C", "ok": True}

    def test_optional_chaining_and_nullish(self):
        assert run_js("const o={a:{b:null}}; return o?.a?.b ?? 'x';") == "x"
        assert run_js("const o=null; return o?.a?.b ?? 'x';") == "x"
        assert run_js("return ({a:0}).a ?? 5;") == 0.0

    def test_try_catch_error_shape(self):
        out = run_js("""
            try { throw new TypeError('bad input'); }
            catch (e) { return e.name + '|' + e.message; }
        """)
        assert out == "TypeError|bad input"

    def test_regex_literal_and_methods(self):
        assert run_js(
            "return 'rev 2024-01-02'.match(/\\d{4}-\\d{2}-\\d{2}/)?.[0];"
        ) == "2024-01-02"
        assert run_js("return /ab+c/i.test('xABBC!');") is True
        assert run_js("return 'a1b2'.replace(/\\d/g, '#');") == "a#b#"

    def test_json_round_trip(self):
        assert run_js(
            "return JSON.stringify(JSON.parse('{\"a\":[1,2]}'));"
        ) == '{"a":[1,2]}'
        # undefined values are omitted from objects (JS semantics)
        assert run_js(
            "return JSON.stringify({a: undefined, b: 1});") == '{"b":1}'

    def test_spread_and_shorthand(self):
        out = run_js("""
            const base = {a: 1};
            const title = 'T';
            return {...base, title, xs: [...[1,2], 3]};
        """)
        assert out == {"a": 1.0, "title": "T", "xs": [1.0, 2.0, 3.0]}

    def test_closures(self):
        assert run_js("""
            function counter() { let n = 0; return () => { n++; return n; }; }
            const c = counter(); c(); c();
            return c();
        """) == 3.0

    def test_undeclared_reference_throws(self):
        with pytest.raises(JSThrow, match="nope is not defined"):
            run_js("return nope + 1;")

    def test_timeout_terminates_infinite_loop(self):
        with pytest.raises(JSTimeout, match="Execution timeout"):
            run_js("while (true) {}", max_ms=100)

    def test_await_is_transparent(self):
        assert run_js("""
            const x = await Promise.resolve(5);
            const xs = await Promise.all([1, 2]);
            return x + xs.length;
        """) == 7.0


# --------------------------------------------------- sandbox execution

class FakePage:
    """Host page object with plain Python methods."""

    def __init__(self):
        self.clicks = []
        self._title = "Fake Title"

    def title(self):
        return self._title

    def click(self, selector):
        self.clicks.append(selector)
        return UNDEFINED

    def evaluate(self, code):
        return "evaluated"

    def content(self):
        return "<html>from-page</html>"

    def screenshot(self, *a):
        return "shot"

    def secret(self):  # not whitelisted
        return "leak"


def make_ctx(page=None, **execution):
    return {
        "template": {"templateId": "tpl-x", "trusted": False},
        "variables": {"q": "v"},
        "page": page,
        "executionContext": execution,
    }


class TestQuickJSSandbox:
    def test_envelope_and_result(self):
        sb = QuickJSSandbox(timeout=2000)
        out = sb.execute_code(
            "return {t: variables.q, id: template.templateId};",
            make_ctx())
        assert out["success"] is True
        assert out["result"] == {"t": "v", "id": "tpl-x"}
        assert out["context"] == {}

    def test_page_whitelisted_call(self):
        page = FakePage()
        sb = QuickJSSandbox(timeout=2000)
        out = sb.execute_code("""
            await page.click('#go');
            return await page.title();
        """, make_ctx(page=page))
        assert out["result"] == "Fake Title"
        assert page.clicks == ["#go"]
        assert out["stats"]["pageMethodCalls"] == 2

    def test_page_non_whitelisted_rejected(self):
        sb = QuickJSSandbox(timeout=2000)
        with pytest.raises(SandboxError,
                           match="Access to page.secret is not allowed"):
            sb.execute_code("return page.secret();",
                            make_ctx(page=FakePage()))

    def test_page_call_budget(self):
        sb = QuickJSSandbox(timeout=2000, max_page_calls=3)
        with pytest.raises(SandboxError,
                           match="Maximum page method calls \\(3\\)"):
            sb.execute_code(
                "for (let i=0;i<10;i++) { await page.title(); } return 1;",
                make_ctx(page=FakePage()))

    def test_evaluate_string_screened(self):
        sb = QuickJSSandbox(timeout=2000)
        with pytest.raises(SandboxError, match="forbidden patterns"):
            sb.execute_code("return page.evaluate('process.exit(1)');",
                            make_ctx(page=FakePage()))
        out = sb.execute_code("return page.evaluate('1+1');",
                              make_ctx(page=FakePage()))
        assert out["result"] == "evaluated"

    def test_page_mutation_blocked(self):
        sb = QuickJSSandbox(timeout=2000)
        with pytest.raises(SandboxError, match="Modifying page object"):
            sb.execute_code("page.title = 1; return 1;",
                            make_ctx(page=FakePage()))

    def test_console_policy(self):
        sb = QuickJSSandbox(timeout=2000)
        out = sb.execute_code("""
            console.log('hello', {a: 1});
            console.warn('careful');
            return 1;
        """, make_ctx())
        assert ("log", 'hello {"a":1}') in out["console"]
        assert ("warn", "careful") in out["console"]
        with pytest.raises(SandboxError, match="console.info is not allowed"):
            sb.execute_code("console.info('x'); return 1;", make_ctx())

    def test_prenav_api(self):
        from anycrawl_ray.state.prenav import PreNavCapture

        store = PreNavCapture([{"key": "k",
                                "rules": [{"type": "exact",
                                           "pattern": "http://a/x"}]}])
        store.offer_response("http://a/x", {"v": 42})
        sb = QuickJSSandbox(timeout=2000)
        out = sb.execute_code("""
            const hit = await preNavHas('k');
        """ if False else """
            const has = await context.preNav.has('k');
            const got = await context.preNav.get('k');
            const waited = await context.preNav.wait('k', {timeoutMs: 10});
            const missing = await context.preNav.wait('zzz');
            return {has, v: got.v, w: waited.v,
                    missing: missing === undefined};
        """, make_ctx(preNavHost=store))
        assert out["result"] == {"has": True, "v": 42.0, "w": 42.0,
                                 "missing": True}

    def test_prenav_host_missing(self):
        sb = QuickJSSandbox(timeout=2000)
        with pytest.raises(SandboxError,
                           match="preNav host is not available"):
            sb.execute_code("return await context.preNav.get('k');",
                            make_ctx())

    def test_html_resolution_order(self):
        sb = QuickJSSandbox(timeout=2000)
        # 1) scrapeResult.rawHtml wins
        out = sb.execute_code("return context.html;", make_ctx(
            scrapeResult={"rawHtml": "<raw>"},
            response={"body": b"<body>"}))
        assert out["result"] == "<raw>"
        # 2) falls back to response.body
        out = sb.execute_code("return context.html;", make_ctx(
            response={"body": b"<body>"}))
        assert out["result"] == "<body>"
        # 3) last resort: page.content()
        out = sb.execute_code("return context.html;",
                              make_ctx(page=FakePage()))
        assert out["result"] == "<html>from-page</html>"

    def test_error_wrapping(self):
        sb = QuickJSSandbox(timeout=2000)
        with pytest.raises(
                SandboxError,
                match="Template tpl-x execution failed: Error: boom"):
            sb.execute_code("throw new Error('boom');", make_ctx())

    def test_timeout_wrapped(self):
        sb = QuickJSSandbox(timeout=100)
        with pytest.raises(SandboxError, match="Execution timeout"):
            sb.execute_code("while (true) {}", make_ctx())

    def test_no_timers_in_scope(self):
        sb = QuickJSSandbox(timeout=2000)
        with pytest.raises(SandboxError, match="setTimeout is not defined"):
            sb.execute_code("setTimeout(() => {}, 10); return 1;",
                            make_ctx())


# ----------------------------------------- template_system integration

class TestExecuteCustomHandler:
    def test_js_handler_end_to_end(self):
        from anycrawl_ray.functions.template_system import (
            execute_custom_handler,
        )

        template = {
            "templateId": "jsh", "updatedAt": 1,
            "customHandlers": {
                "requestHandler": {
                    "enabled": True,
                    "code": {"language": "javascript", "source": """
                        const words = context.html.split(' ');
                        return {n: words.length,
                                first: words[0].toUpperCase()};
                    """},
                },
            },
        }
        out = execute_custom_handler(
            template, "requestHandler",
            {"variables": {}, "page": None,
             "executionContext": {"scrapeResult": {"rawHtml": "hello big world"}}})
        assert out["success"] is True
        assert out["result"] == {"n": 3.0, "first": "HELLO"}

    def test_disabled_handler_skipped(self):
        from anycrawl_ray.functions.template_system import (
            execute_custom_handler,
        )

        template = {"customHandlers": {"requestHandler": {
            "enabled": False,
            "code": {"source": "return 1;"}}}}
        assert execute_custom_handler(template, "requestHandler", {}) is None

    def test_python_callable_seam_kept(self):
        from anycrawl_ray.functions.template_system import (
            execute_custom_handler,
        )

        template = {"customHandlers": {
            "requestHandler": lambda ctx: {"via": "python"}}}
        assert execute_custom_handler(
            template, "requestHandler", {}) == {"via": "python"}

    def test_dangerous_js_rejected_before_execution(self):
        from anycrawl_ray.functions.template_system import (
            execute_custom_handler,
        )

        template = {"templateId": "bad", "updatedAt": 2,
                    "customHandlers": {"requestHandler": {
                        "enabled": True,
                        "code": {"source": "require('fs'); return 1;"}}}}
        with pytest.raises(TemplateValidationError,
                           match="require\\(\\) is not allowed"):
            execute_custom_handler(template, "requestHandler", {})


def test_analyze_code_safety_reports_all():
    safe, violations = analyze_code_safety("eval('x'); process.exit()")
    assert not safe
    assert "eval() is not allowed" in violations
    assert "process object is not allowed" in violations
    assert analyze_code_safety("const a = 1;") == (True, [])


def test_secure_page_proxy_direct():
    stats = {"pageMethodCalls": 0}
    proxy = SecurePageProxy(FakePage(), stats, ["title"], 10)
    assert proxy.js_get("title")() == "Fake Title"
    assert stats["pageMethodCalls"] == 1
    with pytest.raises(SandboxError, match="not allowed"):
        proxy.js_get("click")


# ------------------------------------------- round-3 review regressions

class TestReviewRegressions:
    """Pin the fixes from the round-3 code-review pass."""

    def test_try_finally_rethrows_without_catch(self):
        # finally without catch must run the block AND propagate
        with pytest.raises(JSThrow):
            run_js("try { throw new Error('boom'); } finally { 1; } "
                   "return 'after';")
        assert run_js(
            "let r=''; try { try { throw new Error('x'); } "
            "finally { r+='f'; } } catch(e) { r+='c'; } return r;") == "fc"

    def test_template_literal_braces_inside_strings(self):
        assert run_js("return `x${ true ? '}' : '' }y`;") == "x}y"
        assert run_js('return `a${ "{".length }b`;') == "a1b"

    def test_exponent_precedence_right_assoc(self):
        assert run_js("return 2*3**2;") == 18
        assert run_js("return 2**3**2;") == 512

    def test_parse_int_radix(self):
        assert run_js("return parseInt('ff', 16);") == 255
        assert run_js("return parseInt('0x1f', 16);") == 31
        assert run_js("return parseInt('0x1f');") == 31
        assert run_js("return parseInt('19', 8);") == 1  # stops at '9'
        assert run_js("return parseInt('-42');") == -42
        nan = run_js("return parseInt('zz');")
        assert nan != nan

    def test_match_global_returns_full_matches(self):
        assert run_js("return 'a1b2'.match(/a(\\d)/g);") == ["a1"]
        assert run_js("return 'q'.match(/x/g);") is None

    def test_instanceof_error_subtypes(self):
        assert run_js("try { throw new Error('x'); } "
                      "catch(e) { return e instanceof TypeError; }") is False
        assert run_js("try { throw new TypeError('x'); } "
                      "catch(e) { return e instanceof Error; }") is True
        assert run_js("try { throw new TypeError('x'); } catch(e) "
                      "{ return e instanceof TypeError; }") is True

    def test_stringify_keeps_dunder_keys(self):
        out = run_js("return JSON.stringify({__typename:'Q', a:1});")
        assert out == '{"__typename":"Q","a":1}'

    def test_idless_templates_never_share_cache(self):
        v = TemplateCodeValidator()
        assert v.validate_code("return 1;", {"updatedAt": 5})
        with pytest.raises(TemplateValidationError):
            v.validate_code("require('fs')", {"updatedAt": 5})

    def test_internal_fault_wrapped_in_envelope(self):
        sb = QuickJSSandbox()
        # Date.parse of a non-date used to escape as a raw Python error
        # in some paths; any interpreter-internal fault must surface as
        # SandboxError, never a bare Python exception
        with pytest.raises(SandboxError, match="execution failed"):
            sb.execute_code("null.x;", {"template": MOCK_TEMPLATE})
