"""Minimal JavaScript interpreter for template ``customHandlers``.

The reference runs user template JS inside Node's ``vm`` / QuickJS
(packages/template-client/src/sandbox/index.ts:22-95). This container has
no JS engine, so the rebuild interprets a JS subset directly — a real
tokenizer → Pratt parser → tree-walking evaluator over a safe value model
(no Python attribute access escapes: property lookup goes through typed
dispatch tables only). The subset covers what template handlers actually
use (see the reference's template-examples.ts):

- literals: numbers, strings, template literals with ``${}``, regex
  literals, arrays, objects (shorthand + spread), ``true/false/null/
  undefined``
- expressions: arithmetic, comparison, ``&& || ??``, ternary, ``typeof``,
  assignment (incl. ``+= -= *= /=``), ``++/--``, member/index access with
  optional chaining ``?.``, calls, ``new``, arrow functions, function
  expressions, ``await`` (synchronous hosts: evaluates its operand)
- statements: ``const/let/var``, ``if/else``, ``while``, ``do..while``,
  ``for(;;)``, ``for..of``, ``return``, ``throw``, ``try/catch/finally``,
  ``break``, ``continue``, function declarations, blocks
- built-in methods on strings/arrays/objects (trim, split, replace, map,
  filter, join, includes, slice, push, ...), ``JSON``, ``Math``, ``Date``,
  ``RegExp``, ``Error`` types, a degenerate synchronous ``Promise``

Host objects participate via the ``js_get(name)`` protocol (the page
proxy, console and preNav API in functions/js_sandbox.py). Execution is
budgeted: a step counter enforces the sandbox wall-clock timeout so
``while(true){}`` terminates deterministically.
"""

from __future__ import annotations

import json as _json
import math as _math
import re as _re
import time as _time


class JSSyntaxError(Exception):
    pass


class JSTimeout(Exception):
    pass


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


class JSThrow(Exception):
    """A JS ``throw`` in flight; ``value`` is the thrown JS value."""

    def __init__(self, value):
        super().__init__(js_error_message(value))
        self.value = value


def js_error_message(value) -> str:
    if isinstance(value, dict) and "message" in value:
        name = value.get("name", "Error")
        return f"{name}: {value['message']}"
    return to_js_string(value)


class _Ret(Exception):
    def __init__(self, value):
        self.value = value


class _Brk(Exception):
    pass


class _Cont(Exception):
    pass


# ------------------------------------------------------------- tokenizer

_KEYWORDS = {
    "const", "let", "var", "function", "return", "if", "else", "for", "of",
    "in", "while", "do", "new", "typeof", "true", "false", "null",
    "undefined", "throw", "try", "catch", "finally", "break", "continue",
    "await", "async", "instanceof", "delete", "void",
    # reserved (module/class syntax is outside the subset -> syntax error,
    # matching the reference's vm compile of function-body code)
    "import", "export", "class", "extends", "super", "yield",
}

_RESERVED = {"import", "export", "class", "extends", "super", "yield"}

_PUNCT = [
    "...", "===", "!==", "**=", ">>>", "=>", "==", "!=", "<=", ">=", "&&",
    "||", "??", "?.", "++", "--", "+=", "-=", "*=", "/=", "%=", "**",
    "&&=", "||=", "??=", "{", "}", "(", ")", "[", "]", ";", ",", ".", "?",
    ":", "=", "+", "-", "*", "/", "%", "<", ">", "!", "&", "|", "^", "~",
]
_PUNCT.sort(key=len, reverse=True)

_NUM_RE = _re.compile(r"0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?")
_IDENT_RE = _re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")

# tokens after which a `/` starts a regex literal, not division
_REGEX_PRECEDERS = {
    None, "(", "[", "{", ",", ";", ":", "=", "==", "===", "!=", "!==", "<",
    ">", "<=", ">=", "+", "-", "*", "/", "%", "&&", "||", "??", "!", "?",
    "return", "typeof", "new", "throw", "=>", "+=", "-=", "*=", "/=", "await",
}


def tokenize(src: str):
    toks = []  # (kind, value, line)
    i, n, line = 0, len(src), 1
    last_sig = None
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise JSSyntaxError(f"unterminated comment at line {line}")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            j, buf = i + 1, []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    buf.append(_unescape(src[j + 1]))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSSyntaxError(f"unterminated string at line {line}")
            toks.append(("str", "".join(buf), line))
            last_sig = "str"
            i = j + 1
            continue
        if c == "`":
            parts, j, buf = [], i + 1, []
            while j < n and src[j] != "`":
                if src[j] == "\\":
                    buf.append(_unescape(src[j + 1]))
                    j += 2
                elif src.startswith("${", j):
                    parts.append(("chunk", "".join(buf)))
                    buf = []
                    # brace-count to the interpolation's end, skipping
                    # string literals (nested template literals are
                    # skipped wholesale — no inner ${} awareness)
                    depth, k = 1, j + 2
                    while k < n and depth:
                        ch = src[k]
                        if ch == "\\":
                            k += 2
                            continue
                        if ch in "'\"`":
                            k2 = k + 1
                            while k2 < n and src[k2] != ch:
                                k2 += 2 if src[k2] == "\\" else 1
                            k = k2 + 1
                            continue
                        if ch == "{":
                            depth += 1
                        elif ch == "}":
                            depth -= 1
                        k += 1
                    if depth:
                        raise JSSyntaxError(f"unterminated ${{}} at line {line}")
                    parts.append(("expr", src[j + 2:k - 1]))
                    j = k
                else:
                    if src[j] == "\n":
                        line += 1
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSSyntaxError(f"unterminated template literal at line {line}")
            parts.append(("chunk", "".join(buf)))
            toks.append(("tpl", parts, line))
            last_sig = "str"
            i = j + 1
            continue
        if c == "/" and last_sig in _REGEX_PRECEDERS:
            j, in_cls = i + 1, False
            while j < n:
                ch = src[j]
                if ch == "\\":
                    j += 2
                    continue
                if ch == "[":
                    in_cls = True
                elif ch == "]":
                    in_cls = False
                elif ch == "/" and not in_cls:
                    break
                elif ch == "\n":
                    raise JSSyntaxError(f"unterminated regex at line {line}")
                j += 1
            if j >= n:
                raise JSSyntaxError(f"unterminated regex at line {line}")
            body = src[i + 1:j]
            k = j + 1
            while k < n and src[k] in "gimsuy":
                k += 1
            toks.append(("regex", (body, src[j + 1:k]), line))
            last_sig = "str"
            i = k
            continue
        m = _NUM_RE.match(src, i)
        if m and c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            m = _NUM_RE.match(src, i)
            text = m.group(0)
            if text.lower().startswith("0x"):
                toks.append(("num", float(int(text, 16)), line))
            else:
                toks.append(("num", float(text), line))
            last_sig = "num"
            i = m.end()
            continue
        m = _IDENT_RE.match(src, i)
        if m:
            word = m.group(0)
            kind = "kw" if word in _KEYWORDS else "ident"
            toks.append((kind, word, line))
            last_sig = word if kind == "kw" else "ident"
            i = m.end()
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(("punct", p, line))
                last_sig = p
                i += len(p)
                break
        else:
            raise JSSyntaxError(f"unexpected character {c!r} at line {line}")
    toks.append(("eof", None, line))
    return toks


def _unescape(ch: str) -> str:
    return {"n": "\n", "t": "\t", "r": "\r", "0": "\0", "b": "\b",
            "f": "\f", "v": "\v"}.get(ch, ch)


# ---------------------------------------------------------------- parser

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**=", "&&=", "||=", "??="}


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.pos = 0

    # token helpers
    def peek(self, k=0):
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def at(self, kind, value=None):
        t = self.peek()
        return t[0] == kind and (value is None or t[1] == value)

    def at_punct(self, *vals):
        t = self.peek()
        return t[0] == "punct" and t[1] in vals

    def at_kw(self, *vals):
        t = self.peek()
        return t[0] == "kw" and t[1] in vals

    def next(self):
        t = self.toks[self.pos]
        if t[0] != "eof":
            self.pos += 1
        return t

    def expect(self, kind, value=None):
        t = self.next()
        if t[0] != kind or (value is not None and t[1] != value):
            raise JSSyntaxError(
                f"expected {value or kind} but got {t[1]!r} at line {t[2]}")
        return t

    def eat_semis(self):
        while self.at_punct(";"):
            self.next()

    # entry
    def parse_program(self):
        stmts = []
        self.eat_semis()
        while not self.at("eof"):
            stmts.append(self.statement())
            self.eat_semis()
        return ("block", stmts)

    # statements
    def statement(self):
        t = self.peek()
        if t[0] == "kw" and t[1] in _RESERVED:
            raise JSSyntaxError(
                f"Unexpected reserved word {t[1]!r} at line {t[2]}")
        if self.at_punct("{"):
            return self.block()
        if self.at_kw("const", "let", "var"):
            kind = self.next()[1]
            decls = [self.declarator()]
            while self.at_punct(","):
                self.next()
                decls.append(self.declarator())
            return ("decl", kind, decls)
        if self.at_kw("async") and self.peek(1)[:2] == ("kw", "function"):
            self.next()
        if self.at_kw("function"):
            self.next()
            name = self.expect("ident")[1]
            params = self.param_list()
            body = self.block()
            return ("funcdecl", name, params, body)
        if self.at_kw("if"):
            self.next()
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            then = self.statement()
            other = None
            if self.at_kw("else"):
                self.next()
                other = self.statement()
            return ("if", cond, then, other)
        if self.at_kw("while"):
            self.next()
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            return ("while", cond, self.statement())
        if self.at_kw("do"):
            self.next()
            body = self.statement()
            self.expect("kw", "while")
            self.expect("punct", "(")
            cond = self.expression()
            self.expect("punct", ")")
            return ("dowhile", body, cond)
        if self.at_kw("for"):
            return self.for_statement()
        if self.at_kw("return"):
            self.next()
            if self.at_punct(";", "}") or self.at("eof"):
                return ("ret", None)
            return ("ret", self.expression())
        if self.at_kw("throw"):
            self.next()
            return ("throw", self.expression())
        if self.at_kw("break"):
            self.next()
            return ("break",)
        if self.at_kw("continue"):
            self.next()
            return ("continue",)
        if self.at_kw("try"):
            self.next()
            block = self.block()
            param = catch = final = None
            if self.at_kw("catch"):
                self.next()
                if self.at_punct("("):
                    self.next()
                    param = self.expect("ident")[1]
                    self.expect("punct", ")")
                catch = self.block()
            if self.at_kw("finally"):
                self.next()
                final = self.block()
            if catch is None and final is None:
                raise JSSyntaxError("try without catch/finally")
            return ("try", block, param, catch, final)
        if self.at_punct(";"):
            self.next()
            return ("empty",)
        return ("expr", self.expression())

    def block(self):
        self.expect("punct", "{")
        stmts = []
        self.eat_semis()
        while not self.at_punct("}"):
            stmts.append(self.statement())
            self.eat_semis()
        self.expect("punct", "}")
        return ("block", stmts)

    def declarator(self):
        name = self.expect("ident")[1]
        init = None
        if self.at_punct("="):
            self.next()
            init = self.assignment()
        return (name, init)

    def for_statement(self):
        self.expect("kw", "for")
        self.expect("punct", "(")
        # for..of
        if (self.at_kw("const", "let", "var")
                and self.peek(1)[0] == "ident"
                and self.peek(2)[:2] == ("kw", "of")):
            kind = self.next()[1]
            name = self.next()[1]
            self.next()  # of
            it = self.expression()
            self.expect("punct", ")")
            return ("forof", kind, name, it, self.statement())
        init = None
        if not self.at_punct(";"):
            if self.at_kw("const", "let", "var"):
                kind = self.next()[1]
                decls = [self.declarator()]
                while self.at_punct(","):
                    self.next()
                    decls.append(self.declarator())
                init = ("decl", kind, decls)
            else:
                init = ("expr", self.expression())
        self.expect("punct", ";")
        test = None if self.at_punct(";") else self.expression()
        self.expect("punct", ";")
        update = None if self.at_punct(")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, test, update, self.statement())

    def param_list(self):
        self.expect("punct", "(")
        params = []
        while not self.at_punct(")"):
            params.append(self.expect("ident")[1])
            if self.at_punct(","):
                self.next()
        self.expect("punct", ")")
        return params

    # expressions (precedence climbing)
    def expression(self):
        e = self.assignment()
        while self.at_punct(","):
            self.next()
            e = ("seq", e, self.assignment())
        return e

    def assignment(self):
        # arrow-function lookahead: ident => ...  |  ( params ) => ...
        if self.at("ident") and self.peek(1)[:2] == ("punct", "=>"):
            name = self.next()[1]
            self.next()
            return self.arrow_body([name])
        if self.at_punct("("):
            save = self.pos
            try:
                params = self.param_list()
                if self.at_punct("=>"):
                    self.next()
                    return self.arrow_body(params)
            except JSSyntaxError:
                pass
            self.pos = save
        if self.at_kw("async"):
            nxt = self.peek(1)
            if nxt[:2] == ("punct", "(") or (nxt[0] == "ident"
                                             and self.peek(2)[:2] == ("punct", "=>")):
                self.next()
                return self.assignment()
        target = self.conditional()
        if self.at("punct") and self.peek()[1] in _ASSIGN_OPS:
            op = self.next()[1]
            if target[0] not in ("ident", "member", "index"):
                raise JSSyntaxError("invalid assignment target")
            return ("assign", op, target, self.assignment())
        return target

    def arrow_body(self, params):
        if self.at_punct("{"):
            return ("arrow", params, self.block(), False)
        return ("arrow", params, self.assignment(), True)

    def conditional(self):
        cond = self.nullish()
        if self.at_punct("?"):
            self.next()
            then = self.assignment()
            self.expect("punct", ":")
            return ("cond", cond, then, self.assignment())
        return cond

    def nullish(self):
        e = self.logical_or()
        while self.at_punct("??"):
            self.next()
            e = ("logical", "??", e, self.logical_or())
        return e

    def logical_or(self):
        e = self.logical_and()
        while self.at_punct("||"):
            self.next()
            e = ("logical", "||", e, self.logical_and())
        return e

    def logical_and(self):
        e = self.equality()
        while self.at_punct("&&"):
            self.next()
            e = ("logical", "&&", e, self.equality())
        return e

    def equality(self):
        e = self.relational()
        while self.at_punct("==", "!=", "===", "!=="):
            op = self.next()[1]
            e = ("binary", op, e, self.relational())
        return e

    def relational(self):
        e = self.additive()
        while self.at_punct("<", ">", "<=", ">=") or self.at_kw("instanceof", "in"):
            op = self.next()[1]
            e = ("binary", op, e, self.additive())
        return e

    def additive(self):
        e = self.multiplicative()
        while self.at_punct("+", "-"):
            op = self.next()[1]
            e = ("binary", op, e, self.multiplicative())
        return e

    def multiplicative(self):
        e = self.exponent()
        while self.at_punct("*", "/", "%"):
            op = self.next()[1]
            e = ("binary", op, e, self.exponent())
        return e

    def exponent(self):
        # ** binds tighter than * and is right-associative
        e = self.unary()
        if self.at_punct("**"):
            self.next()
            return ("binary", "**", e, self.exponent())
        return e

    def unary(self):
        if self.at_punct("!", "-", "+", "~"):
            op = self.next()[1]
            return ("unary", op, self.unary())
        if self.at_kw("typeof", "void", "delete"):
            op = self.next()[1]
            return ("unary", op, self.unary())
        if self.at_kw("await"):
            self.next()
            return self.unary()  # synchronous hosts: await is transparent
        if self.at_punct("++", "--"):
            op = self.next()[1]
            return ("update", op, self.unary(), True)
        e = self.postfix()
        if self.at_punct("++", "--"):
            op = self.next()[1]
            return ("update", op, e, False)
        return e

    def postfix(self):
        if self.at_kw("new"):
            self.next()
            callee = self.member_chain(self.primary(), no_call=True)
            args = self.arg_list() if self.at_punct("(") else []
            return self.member_chain(("new", callee, args))
        return self.member_chain(self.primary())

    def member_chain(self, e, no_call=False):
        while True:
            if self.at_punct("."):
                self.next()
                t = self.next()
                if t[0] not in ("ident", "kw"):
                    raise JSSyntaxError(f"bad property at line {t[2]}")
                e = ("member", e, t[1], False)
            elif self.at_punct("?."):
                self.next()
                if self.at_punct("("):
                    if no_call:
                        return e
                    e = ("call", e, self.arg_list(), True)
                elif self.at_punct("["):
                    self.next()
                    idx = self.expression()
                    self.expect("punct", "]")
                    e = ("index", e, idx, True)
                else:
                    t = self.next()
                    if t[0] not in ("ident", "kw"):
                        raise JSSyntaxError(f"bad property at line {t[2]}")
                    e = ("member", e, t[1], True)
            elif self.at_punct("["):
                self.next()
                idx = self.expression()
                self.expect("punct", "]")
                e = ("index", e, idx, False)
            elif self.at_punct("(") and not no_call:
                e = ("call", e, self.arg_list(), False)
            else:
                return e

    def arg_list(self):
        self.expect("punct", "(")
        args = []
        while not self.at_punct(")"):
            if self.at_punct("..."):
                self.next()
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if self.at_punct(","):
                self.next()
        self.expect("punct", ")")
        return args

    def primary(self):
        t = self.peek()
        if t[0] == "num":
            self.next()
            return ("num", t[1])
        if t[0] == "str":
            self.next()
            return ("str", t[1])
        if t[0] == "regex":
            self.next()
            return ("regexlit", t[1][0], t[1][1])
        if t[0] == "tpl":
            self.next()
            parts = []
            for kind, val in t[1]:
                if kind == "chunk":
                    parts.append(("str", val))
                else:
                    parts.append(Parser(val).expression())
            return ("tpl", parts)
        if t[0] == "ident":
            self.next()
            return ("ident", t[1])
        if t[0] == "kw":
            if t[1] in ("true", "false"):
                self.next()
                return ("bool", t[1] == "true")
            if t[1] == "null":
                self.next()
                return ("null",)
            if t[1] == "undefined":
                self.next()
                return ("undef",)
            if t[1] == "function":
                self.next()
                name = self.next()[1] if self.at("ident") else None
                params = self.param_list()
                return ("funcexpr", name, params, self.block())
            if t[1] == "async":
                self.next()
                return self.primary()
            if t[1] == "new":
                return self.postfix()
        if self.at_punct("("):
            self.next()
            e = self.expression()
            self.expect("punct", ")")
            return e
        if self.at_punct("["):
            self.next()
            items = []
            while not self.at_punct("]"):
                if self.at_punct("..."):
                    self.next()
                    items.append(("spread", self.assignment()))
                else:
                    items.append(self.assignment())
                if self.at_punct(","):
                    self.next()
            self.expect("punct", "]")
            return ("arr", items)
        if self.at_punct("{"):
            self.next()
            props = []
            while not self.at_punct("}"):
                if self.at_punct("..."):
                    self.next()
                    props.append(("spread", self.assignment()))
                else:
                    kt = self.next()
                    if kt[0] in ("ident", "kw", "str"):
                        key = kt[1]
                    elif kt[0] == "num":
                        key = _num_to_key(kt[1])
                    else:
                        raise JSSyntaxError(f"bad object key at line {kt[2]}")
                    if self.at_punct(":"):
                        self.next()
                        props.append((key, self.assignment()))
                    elif self.at_punct("("):  # method shorthand
                        params = self.param_list()
                        props.append((key, ("funcexpr", key, params, self.block())))
                    else:  # shorthand {title}
                        props.append((key, ("ident", key)))
                if self.at_punct(","):
                    self.next()
            self.expect("punct", "}")
            return ("obj", props)
        raise JSSyntaxError(f"unexpected token {t[1]!r} at line {t[2]}")


def _num_to_key(v: float) -> str:
    return str(int(v)) if v == int(v) else str(v)


def parse(src: str):
    return Parser(src).parse_program()


# ------------------------------------------------------------- value model

class JSFunction:
    __slots__ = ("params", "body", "env", "name", "is_expr")

    def __init__(self, params, body, env, name=None, is_expr=False):
        self.params = params
        self.body = body
        self.env = env
        self.name = name or ""
        self.is_expr = is_expr


class JSRegExp:
    __slots__ = ("source", "flags", "rx")

    def __init__(self, source: str, flags: str = ""):
        self.source = source
        self.flags = flags
        f = 0
        if "i" in flags:
            f |= _re.I
        if "s" in flags:
            f |= _re.S
        if "m" in flags:
            f |= _re.M
        try:
            self.rx = _re.compile(_js_regex_to_py(source), f)
        except _re.error as exc:
            raise JSThrow(make_error("SyntaxError",
                                     f"Invalid regular expression: {exc}"))

    def __repr__(self):
        return f"/{self.source}/{self.flags}"


def _js_regex_to_py(src: str) -> str:
    # JS and Python regex syntax mostly agree for the template subset;
    # translate the JS-only escapes that appear in practice
    return src.replace(r"\d", r"\d").replace("(?<", "(?P<") \
        .replace("(?P<=", "(?<=").replace("(?P<!", "(?<!")


class JSDate:
    __slots__ = ("ms",)

    def __init__(self, ms: float):
        self.ms = float(ms)

    def js_get(self, name):
        if name == "getTime":
            return lambda *a: self.ms
        if name == "toISOString":
            return lambda *a: (_time.strftime(
                "%Y-%m-%dT%H:%M:%S", _time.gmtime(self.ms / 1000.0))
                + f".{int(self.ms % 1000):03d}Z")
        if name == "getFullYear":
            return lambda *a: float(_time.gmtime(self.ms / 1000.0).tm_year)
        if name == "toString":
            return lambda *a: self.js_get("toISOString")()
        return UNDEFINED


def make_error(name: str, message) -> dict:
    return {"name": name, "message": to_js_string(message), "__error__": True}


def truthy(v) -> bool:
    if v is UNDEFINED or v is None or v is False:
        return False
    if isinstance(v, (int, float)):
        return v != 0 and v == v
    if isinstance(v, str):
        return v != ""
    if isinstance(v, bool):
        return v
    return True


def to_js_string(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _fmt_num(float(v))
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x is None or x is UNDEFINED else to_js_string(x)
                        for x in v)
    if isinstance(v, dict):
        if v.get("__error__"):
            return f"{v.get('name', 'Error')}: {v.get('message', '')}"
        return "[object Object]"
    if isinstance(v, (JSFunction, JSRegExp)):
        return repr(v)
    return str(v)


def _fmt_num(x: float) -> str:
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "Infinity"
    if x == float("-inf"):
        return "-Infinity"
    if x == int(x) and abs(x) < 1e21:
        return str(int(x))
    return repr(x)


def to_number(v) -> float:
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if v is UNDEFINED:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(int(s, 16)) if s.lower().startswith("0x") else float(s)
        except ValueError:
            return float("nan")
    return float("nan")


def js_equals_strict(a, b) -> bool:
    if type(a) is bool or type(b) is bool:
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)  # NaN !== NaN falls out of IEEE comparison
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b  # objects/arrays/functions compare by identity


def js_equals_loose(a, b) -> bool:
    if (a is None or a is UNDEFINED) and (b is None or b is UNDEFINED):
        return True
    if a is None or a is UNDEFINED or b is None or b is UNDEFINED:
        return False
    if isinstance(a, str) and isinstance(b, (int, float)):
        return to_number(a) == float(b)
    if isinstance(a, (int, float)) and isinstance(b, str):
        return float(a) == to_number(b)
    if isinstance(a, bool) or isinstance(b, bool):
        return to_number(a) == to_number(b)
    return js_equals_strict(a, b)


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None, vars=None):
        self.vars = vars or {}
        self.parent = parent

    def lookup(self, name):
        env = self
        while env is not None:
            if name in env.vars:
                return env.vars[name]
            env = env.parent
        raise JSThrow(make_error("ReferenceError", f"{name} is not defined"))

    def assign(self, name, value):
        env = self
        while env is not None:
            if name in env.vars:
                env.vars[name] = value
                return
            env = env.parent
        raise JSThrow(make_error("ReferenceError", f"{name} is not defined"))

    def declare(self, name, value):
        self.vars[name] = value


# ------------------------------------------------------------ interpreter

class Interpreter:
    def __init__(self, globals: dict, max_ms: float = 60000.0,
                 max_steps: int = 5_000_000):
        self.genv = Env(vars=dict(globals))
        self.max_ms = max_ms
        self.max_steps = max_steps
        self.steps = 0
        self.t0 = _time.monotonic()

    def _tick(self):
        self.steps += 1
        if self.steps & 0x3FF == 0:
            if (_time.monotonic() - self.t0) * 1000.0 > self.max_ms:
                raise JSTimeout(f"Execution timeout ({int(self.max_ms)}ms)")
        if self.steps > self.max_steps:
            raise JSTimeout(f"Execution timeout ({int(self.max_ms)}ms)")

    def run(self, src: str):
        """Execute a program; a top-level ``return`` yields its value
        (the sandbox wraps handler code in an async function)."""
        ast = parse(src)
        self.t0 = _time.monotonic()
        try:
            self.exec_block(ast, Env(self.genv))
        except _Ret as r:
            return r.value
        return UNDEFINED

    # statements
    def exec_block(self, node, env):
        # hoist function declarations (templates call before declaring)
        for st in node[1]:
            if st[0] == "funcdecl":
                env.declare(st[1], JSFunction(st[2], st[3], env, st[1]))
        for st in node[1]:
            self.exec_stmt(st, env)

    def exec_stmt(self, st, env):
        self._tick()
        op = st[0]
        if op == "expr":
            self.eval(st[1], env)
        elif op == "decl":
            for name, init in st[2]:
                env.declare(name, UNDEFINED if init is None
                            else self.eval(init, env))
        elif op == "block":
            self.exec_block(st, Env(env))
        elif op == "if":
            if truthy(self.eval(st[1], env)):
                self.exec_stmt(st[2], env)
            elif st[3] is not None:
                self.exec_stmt(st[3], env)
        elif op == "while":
            while truthy(self.eval(st[1], env)):
                self._tick()
                try:
                    self.exec_stmt(st[2], env)
                except _Brk:
                    break
                except _Cont:
                    continue
        elif op == "dowhile":
            while True:
                self._tick()
                try:
                    self.exec_stmt(st[1], env)
                except _Brk:
                    break
                except _Cont:
                    pass
                if not truthy(self.eval(st[2], env)):
                    break
        elif op == "for":
            fenv = Env(env)
            if st[1] is not None:
                self.exec_stmt(st[1], fenv)
            while st[2] is None or truthy(self.eval(st[2], fenv)):
                self._tick()
                try:
                    self.exec_stmt(st[4], fenv)
                except _Brk:
                    break
                except _Cont:
                    pass
                if st[3] is not None:
                    self.eval(st[3], fenv)
        elif op == "forof":
            it = self.eval(st[3], env)
            if isinstance(it, str):
                seq = list(it)
            elif isinstance(it, list):
                seq = list(it)
            elif isinstance(it, dict):
                raise JSThrow(make_error("TypeError", "object is not iterable"))
            else:
                raise JSThrow(make_error("TypeError",
                                         f"{to_js_string(it)} is not iterable"))
            for item in seq:
                self._tick()
                benv = Env(env)
                benv.declare(st[2], item)
                try:
                    self.exec_stmt(st[4], benv)
                except _Brk:
                    break
                except _Cont:
                    continue
        elif op == "ret":
            raise _Ret(UNDEFINED if st[1] is None else self.eval(st[1], env))
        elif op == "throw":
            raise JSThrow(self.eval(st[1], env))
        elif op == "try":
            try:
                self.exec_stmt(st[1], env)
            except JSThrow as exc:
                if st[3] is not None:
                    cenv = Env(env)
                    if st[2]:
                        cenv.declare(st[2], exc.value)
                    self.exec_stmt(st[3], cenv)
                else:
                    raise
            finally:
                if st[4] is not None:
                    self.exec_stmt(st[4], env)
        elif op == "break":
            raise _Brk()
        elif op == "continue":
            raise _Cont()
        elif op == "funcdecl":
            if st[1] not in env.vars:
                env.declare(st[1], JSFunction(st[2], st[3], env, st[1]))
        elif op == "empty":
            pass
        else:  # pragma: no cover
            raise JSSyntaxError(f"unknown statement {op}")

    # expressions
    def eval(self, node, env):
        self._tick()
        op = node[0]
        if op == "num":
            return node[1]
        if op == "str":
            return node[1]
        if op == "bool":
            return node[1]
        if op == "null":
            return None
        if op == "undef":
            return UNDEFINED
        if op == "ident":
            return env.lookup(node[1])
        if op == "tpl":
            return "".join(to_js_string(self.eval(p, env)) for p in node[1])
        if op == "regexlit":
            return JSRegExp(node[1], node[2])
        if op == "arr":
            out = []
            for item in node[1]:
                if item[0] == "spread":
                    v = self.eval(item[1], env)
                    out.extend(v if isinstance(v, list) else list(v))
                else:
                    out.append(self.eval(item, env))
            return out
        if op == "obj":
            d = {}
            for prop in node[1]:
                if prop[0] == "spread":
                    v = self.eval(prop[1], env)
                    if isinstance(v, dict):
                        d.update(v)
                else:
                    d[prop[0]] = self.eval(prop[1], env)
            return d
        if op == "member":
            base = self.eval(node[1], env)
            if node[3] and (base is None or base is UNDEFINED):
                return UNDEFINED
            return self.get_prop(base, node[2])
        if op == "index":
            base = self.eval(node[1], env)
            if node[3] and (base is None or base is UNDEFINED):
                return UNDEFINED
            key = self.eval(node[2], env)
            return self.get_index(base, key)
        if op == "call":
            return self.eval_call(node, env)
        if op == "new":
            callee = self.eval(node[1], env)
            args = self._eval_args(node[2], env)
            return self.construct(callee, args)
        if op == "unary":
            return self.eval_unary(node[1], node[2], env)
        if op == "update":
            return self.eval_update(node, env)
        if op == "binary":
            return self.eval_binary(node[1],
                                    self.eval(node[2], env),
                                    self.eval(node[3], env))
        if op == "logical":
            left = self.eval(node[2], env)
            if node[1] == "&&":
                return self.eval(node[3], env) if truthy(left) else left
            if node[1] == "||":
                return left if truthy(left) else self.eval(node[3], env)
            # ??
            if left is None or left is UNDEFINED:
                return self.eval(node[3], env)
            return left
        if op == "cond":
            return (self.eval(node[2], env) if truthy(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if op == "assign":
            return self.eval_assign(node, env)
        if op == "seq":
            self.eval(node[1], env)
            return self.eval(node[2], env)
        if op == "arrow":
            return JSFunction(node[1], node[2], env, is_expr=node[3])
        if op == "funcexpr":
            return JSFunction(node[2], node[3], env, node[1], is_expr=False)
        raise JSSyntaxError(f"unknown expression {op}")  # pragma: no cover

    def _eval_args(self, arg_nodes, env):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                v = self.eval(a[1], env)
                args.extend(v if isinstance(v, list) else list(v))
            else:
                args.append(self.eval(a, env))
        return args

    def eval_call(self, node, env):
        callee_node = node[1]
        if callee_node[0] == "member":
            base = self.eval(callee_node[1], env)
            if callee_node[3] and (base is None or base is UNDEFINED):
                return UNDEFINED
            fn = self.get_prop(base, callee_node[2])
            if node[3] and (fn is None or fn is UNDEFINED):
                return UNDEFINED
            if fn is UNDEFINED or fn is None:
                raise JSThrow(make_error(
                    "TypeError",
                    f"{_describe(base)}.{callee_node[2]} is not a function"))
            return self.call(fn, self._eval_args(node[2], env))
        fn = self.eval(callee_node, env)
        if node[3] and (fn is None or fn is UNDEFINED):
            return UNDEFINED
        return self.call(fn, self._eval_args(node[2], env))

    def call(self, fn, args):
        self._tick()
        if isinstance(fn, JSFunction):
            fenv = Env(fn.env)
            for i, p in enumerate(fn.params):
                fenv.declare(p, args[i] if i < len(args) else UNDEFINED)
            if fn.is_expr:
                return self.eval(fn.body, fenv)
            try:
                self.exec_block(fn.body, fenv)
            except _Ret as r:
                return r.value
            return UNDEFINED
        if callable(fn):
            return fn(*args)
        raise JSThrow(make_error("TypeError",
                                 f"{to_js_string(fn)} is not a function"))

    def construct(self, callee, args):
        if callable(callee) and getattr(callee, "js_constructor", False):
            return callee(*args)
        if isinstance(callee, JSFunction):
            this = {}
            fenv = Env(callee.env)
            fenv.declare("this", this)
            for i, p in enumerate(callee.params):
                fenv.declare(p, args[i] if i < len(args) else UNDEFINED)
            try:
                self.exec_block(callee.body, fenv)
            except _Ret as r:
                if isinstance(r.value, dict):
                    return r.value
            return this
        raise JSThrow(make_error("TypeError",
                                 f"{to_js_string(callee)} is not a constructor"))

    def eval_unary(self, op, operand, env):
        if op == "typeof":
            try:
                v = self.eval(operand, env)
            except JSThrow:
                return "undefined"  # typeof undeclared
            if v is UNDEFINED:
                return "undefined"
            if v is None:
                return "object"
            if isinstance(v, bool):
                return "boolean"
            if isinstance(v, (int, float)):
                return "number"
            if isinstance(v, str):
                return "string"
            if isinstance(v, JSFunction) or callable(v):
                return "function"
            return "object"
        v = self.eval(operand, env)
        if op == "!":
            return not truthy(v)
        if op == "-":
            return -to_number(v)
        if op == "+":
            return to_number(v)
        if op == "~":
            return float(~int(to_number(v)))
        if op == "void":
            return UNDEFINED
        if op == "delete":
            if operand[0] == "member":
                base = self.eval(operand[1], env)
                self.delete_prop(base, operand[2])
                return True
            if operand[0] == "index":
                base = self.eval(operand[1], env)
                self.delete_prop(base, to_js_string(self.eval(operand[2], env)))
                return True
            return True
        raise JSSyntaxError(f"unknown unary {op}")  # pragma: no cover

    def eval_update(self, node, env):
        _, op, target, prefix = node
        old = to_number(self._read_target(target, env))
        new = old + (1.0 if op == "++" else -1.0)
        self._write_target(target, new, env)
        return new if prefix else old

    def eval_binary(self, op, left, right):
        if op == "+":
            if isinstance(left, str) or isinstance(right, str) \
                    or isinstance(left, (list, dict)) \
                    or isinstance(right, (list, dict)):
                return to_js_string(left) + to_js_string(right)
            return to_number(left) + to_number(right)
        if op == "-":
            return to_number(left) - to_number(right)
        if op == "*":
            return to_number(left) * to_number(right)
        if op == "/":
            l, r = to_number(left), to_number(right)
            if l != l or r != r:
                return float("nan")
            if r == 0:
                if l == 0:
                    return float("nan")
                sign = (1.0 if l > 0 else -1.0) * (-1.0 if _neg_zero(r)
                                                   else 1.0)
                return float("inf") * sign
            return l / r
        if op == "%":
            r = to_number(right)
            l = to_number(left)
            if r == 0 or l != l or r != r:
                return float("nan")
            return _math.fmod(l, r)
        if op == "**":
            return to_number(left) ** to_number(right)
        if op == "==":
            return js_equals_loose(left, right)
        if op == "!=":
            return not js_equals_loose(left, right)
        if op == "===":
            return js_equals_strict(left, right)
        if op == "!==":
            return not js_equals_strict(left, right)
        if op in ("<", ">", "<=", ">="):
            if isinstance(left, str) and isinstance(right, str):
                a, b = left, right
            else:
                a, b = to_number(left), to_number(right)
                if a != a or b != b:
                    return False
            return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
        if op == "instanceof":
            ctor_name = getattr(right, "js_error_name", None) \
                if callable(right) else None
            if ctor_name:
                if not (isinstance(left, dict)
                        and left.get("__error__", False)):
                    return False
                # every error is an Error; subtypes match by name
                return ctor_name == "Error" or left.get("name") == ctor_name
            return False
        if op == "in":
            if isinstance(right, dict):
                return to_js_string(left) in right
            if isinstance(right, list):
                n = to_number(left)
                return n == int(n) and 0 <= int(n) < len(right)
            raise JSThrow(make_error("TypeError",
                                     "'in' requires an object"))
        raise JSSyntaxError(f"unknown operator {op}")  # pragma: no cover

    def eval_assign(self, node, env):
        _, op, target, value_node = node
        if op == "=":
            value = self.eval(value_node, env)
        elif op in ("&&=", "||=", "??="):
            cur = self._read_target(target, env)
            if op == "&&=" and not truthy(cur):
                return cur
            if op == "||=" and truthy(cur):
                return cur
            if op == "??=" and cur is not None and cur is not UNDEFINED:
                return cur
            value = self.eval(value_node, env)
        else:
            cur = self._read_target(target, env)
            value = self.eval_binary(op[:-1], cur, self.eval(value_node, env))
        self._write_target(target, value, env)
        return value

    def _read_target(self, target, env):
        if target[0] == "ident":
            return env.lookup(target[1])
        if target[0] == "member":
            return self.get_prop(self.eval(target[1], env), target[2])
        if target[0] == "index":
            return self.get_index(self.eval(target[1], env),
                                  self.eval(target[2], env))
        raise JSSyntaxError("invalid assignment target")

    def _write_target(self, target, value, env):
        if target[0] == "ident":
            env.assign(target[1], value)
        elif target[0] == "member":
            base = self.eval(target[1], env)
            self.set_prop(base, target[2], value)
        elif target[0] == "index":
            base = self.eval(target[1], env)
            key = self.eval(target[2], env)
            if isinstance(base, list):
                i = int(to_number(key))
                while len(base) <= i:
                    base.append(UNDEFINED)
                base[i] = value
            else:
                self.set_prop(base, to_js_string(key), value)
        else:
            raise JSSyntaxError("invalid assignment target")

    # property model -------------------------------------------------
    def get_prop(self, base, name):
        if base is None or base is UNDEFINED:
            raise JSThrow(make_error(
                "TypeError",
                f"Cannot read properties of {to_js_string(base)} "
                f"(reading '{name}')"))
        getter = getattr(base, "js_get", None)
        if getter is not None:
            return getter(name)
        if isinstance(base, dict):
            return base.get(name, UNDEFINED)
        if isinstance(base, str):
            return _string_prop(base, name, self)
        if isinstance(base, list):
            return _array_prop(base, name, self)
        if isinstance(base, (int, float)):
            return _number_prop(float(base), name)
        if isinstance(base, bool):
            return UNDEFINED
        if isinstance(base, JSRegExp):
            return _regex_prop(base, name)
        return UNDEFINED

    def get_index(self, base, key):
        if isinstance(base, (list, str)):
            if isinstance(key, (int, float)) or (isinstance(key, str)
                                          and key.lstrip("-").isdigit()):
                i = int(to_number(key))
                if i < 0 or i >= len(base):
                    return UNDEFINED
                return base[i]
            return self.get_prop(base, to_js_string(key))
        return self.get_prop(base, to_js_string(key))

    def set_prop(self, base, name, value):
        setter = getattr(base, "js_set", None)
        if setter is not None:
            setter(name, value)
            return
        if isinstance(base, dict):
            base[name] = value
            return
        raise JSThrow(make_error(
            "TypeError", f"Cannot set property {name} on "
            f"{to_js_string(base)}"))

    def delete_prop(self, base, name):
        deleter = getattr(base, "js_delete", None)
        if deleter is not None:
            deleter(name)
            return
        if isinstance(base, dict):
            base.pop(name, None)


def _neg_zero(x: float) -> bool:
    return x == 0.0 and _math.copysign(1.0, x) < 0


def _describe(base) -> str:
    if isinstance(base, dict):
        return "object"
    return to_js_string(base)


# ------------------------------------------------- built-in method tables

def _string_prop(s: str, name: str, interp):
    if name == "length":
        return float(len(s))
    simple = {
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "toLowerCase": lambda: s.lower(),
        "toUpperCase": lambda: s.upper(),
        "toString": lambda: s,
    }
    if name in simple:
        f = simple[name]
        return lambda *a: f()
    if name == "split":
        def split(sep=UNDEFINED, limit=UNDEFINED):
            if sep is UNDEFINED:
                return [s]
            if isinstance(sep, JSRegExp):
                parts = sep.rx.split(s)
            elif sep == "":
                parts = list(s)
            else:
                parts = s.split(to_js_string(sep))
            if limit is not UNDEFINED:
                parts = parts[:int(to_number(limit))]
            return parts
        return split
    if name == "replace" or name == "replaceAll":
        all_mode = name == "replaceAll"

        def replace(pat, repl=""):
            if isinstance(pat, JSRegExp):
                count = 0 if ("g" in pat.flags or all_mode) else 1
                if isinstance(repl, (JSFunction,)) or callable(repl):
                    return pat.rx.sub(
                        lambda m: to_js_string(
                            interp.call(repl, [m.group(0),
                                               *[g if g is not None
                                                 else UNDEFINED
                                                 for g in m.groups()]])),
                        s, count=count)
                return pat.rx.sub(_js_repl_to_py(to_js_string(repl)), s,
                                  count=count)
            p = to_js_string(pat)
            r = to_js_string(repl)
            return s.replace(p, r) if all_mode else s.replace(p, r, 1)
        return replace
    if name == "match":
        def match(pat):
            rx = pat if isinstance(pat, JSRegExp) else JSRegExp(
                to_js_string(pat))
            if "g" in rx.flags:
                # full matches, not capture groups (findall returns groups)
                return [m.group(0) for m in rx.rx.finditer(s)] or None
            m = rx.rx.search(s)
            if m is None:
                return None
            return [m.group(0), *[g if g is not None else UNDEFINED
                                  for g in m.groups()]]
        return match
    if name == "includes":
        return lambda sub, *a: to_js_string(sub) in s
    if name == "startsWith":
        return lambda sub, *a: s.startswith(to_js_string(sub))
    if name == "endsWith":
        return lambda sub, *a: s.endswith(to_js_string(sub))
    if name == "indexOf":
        return lambda sub, *a: float(s.find(to_js_string(sub)))
    if name == "lastIndexOf":
        return lambda sub, *a: float(s.rfind(to_js_string(sub)))
    if name == "charAt":
        return lambda i=0.0, *a: (s[int(to_number(i))]
                                  if 0 <= int(to_number(i)) < len(s) else "")
    if name == "charCodeAt":
        return lambda i=0.0, *a: (float(ord(s[int(to_number(i))]))
                                  if 0 <= int(to_number(i)) < len(s)
                                  else float("nan"))
    if name == "slice":
        return lambda a=0.0, b=UNDEFINED: _slice(s, a, b)
    if name == "substring":
        def substring(a=0.0, b=UNDEFINED):
            x = max(0, int(to_number(a)))
            y = len(s) if b is UNDEFINED else max(0, int(to_number(b)))
            if x > y:
                x, y = y, x
            return s[x:y]
        return substring
    if name == "repeat":
        return lambda k: s * int(to_number(k))
    if name == "padStart":
        return lambda width, fill=" ": s.rjust(int(to_number(width)),
                                               to_js_string(fill)[0] or " ")
    if name == "padEnd":
        return lambda width, fill=" ": s.ljust(int(to_number(width)),
                                               to_js_string(fill)[0] or " ")
    if name == "concat":
        return lambda *parts: s + "".join(to_js_string(p) for p in parts)
    return UNDEFINED


def _js_repl_to_py(repl: str) -> str:
    # JS $1 group refs -> Python \1; $$ -> literal $
    return _re.sub(r"\$(\d+)", r"\\\1", repl.replace("\\", "\\\\")) \
        .replace("$$", "$")


def _slice(seq, a, b):
    n = len(seq)
    x = int(to_number(a)) if a is not UNDEFINED else 0
    y = int(to_number(b)) if b is not UNDEFINED else n
    if x < 0:
        x = max(0, n + x)
    if y < 0:
        y = max(0, n + y)
    return seq[x:min(y, n)]


def _array_prop(arr: list, name: str, interp):
    if name == "length":
        return float(len(arr))
    if name == "push":
        def push(*items):
            arr.extend(items)
            return float(len(arr))
        return push
    if name == "pop":
        return lambda: arr.pop() if arr else UNDEFINED
    if name == "shift":
        return lambda: arr.pop(0) if arr else UNDEFINED
    if name == "unshift":
        def unshift(*items):
            arr[:0] = items
            return float(len(arr))
        return unshift
    if name == "map":
        return lambda fn, *a: [interp.call(fn, [v, float(i), arr])
                               for i, v in enumerate(list(arr))]
    if name == "filter":
        return lambda fn, *a: [v for i, v in enumerate(list(arr))
                               if truthy(interp.call(fn, [v, float(i), arr]))]
    if name == "forEach":
        def for_each(fn, *a):
            for i, v in enumerate(list(arr)):
                interp.call(fn, [v, float(i), arr])
            return UNDEFINED
        return for_each
    if name == "find":
        def find(fn, *a):
            for i, v in enumerate(list(arr)):
                if truthy(interp.call(fn, [v, float(i), arr])):
                    return v
            return UNDEFINED
        return find
    if name == "findIndex":
        def find_index(fn, *a):
            for i, v in enumerate(list(arr)):
                if truthy(interp.call(fn, [v, float(i), arr])):
                    return float(i)
            return -1.0
        return find_index
    if name == "some":
        return lambda fn, *a: any(
            truthy(interp.call(fn, [v, float(i), arr]))
            for i, v in enumerate(list(arr)))
    if name == "every":
        return lambda fn, *a: all(
            truthy(interp.call(fn, [v, float(i), arr]))
            for i, v in enumerate(list(arr)))
    if name == "reduce":
        def reduce(fn, *init):
            items = list(arr)
            if init:
                acc = init[0]
                start = 0
            elif items:
                acc = items[0]
                start = 1
            else:
                raise JSThrow(make_error(
                    "TypeError", "Reduce of empty array with no initial value"))
            for i in range(start, len(items)):
                acc = interp.call(fn, [acc, items[i], float(i), arr])
            return acc
        return reduce
    if name == "join":
        def join(sep=","):
            return to_js_string(sep if sep is not UNDEFINED else ",").join(
                "" if v is None or v is UNDEFINED else to_js_string(v)
                for v in arr)
        return join
    if name == "includes":
        return lambda v, *a: any(js_equals_strict(v, x) for x in arr)
    if name == "indexOf":
        def index_of(v, *a):
            for i, x in enumerate(arr):
                if js_equals_strict(v, x):
                    return float(i)
            return -1.0
        return index_of
    if name == "slice":
        return lambda a=UNDEFINED, b=UNDEFINED: _slice(arr, a, b)
    if name == "splice":
        def splice(start=0.0, count=UNDEFINED, *items):
            i = int(to_number(start))
            if i < 0:
                i = max(0, len(arr) + i)
            k = len(arr) - i if count is UNDEFINED else int(to_number(count))
            removed = arr[i:i + k]
            arr[i:i + k] = list(items)
            return removed
        return splice
    if name == "concat":
        def concat(*others):
            out = list(arr)
            for o in others:
                out.extend(o) if isinstance(o, list) else out.append(o)
            return out
        return concat
    if name == "reverse":
        def reverse():
            arr.reverse()
            return arr
        return reverse
    if name == "sort":
        def sort(fn=UNDEFINED):
            if fn is UNDEFINED:
                arr.sort(key=to_js_string)
            else:
                import functools
                arr.sort(key=functools.cmp_to_key(
                    lambda a, b: (1 if to_number(interp.call(fn, [a, b])) > 0
                                  else -1 if to_number(
                                      interp.call(fn, [a, b])) < 0 else 0)))
            return arr
        return sort
    if name == "flat":
        def flat(depth=1.0):
            def go(xs, d):
                out = []
                for x in xs:
                    if isinstance(x, list) and d > 0:
                        out.extend(go(x, d - 1))
                    else:
                        out.append(x)
                return out
            return go(arr, int(to_number(depth)))
        return flat
    if name == "toString":
        return lambda: to_js_string(arr)
    return UNDEFINED


def _number_prop(x: float, name: str):
    if name == "toFixed":
        return lambda digits=0.0: f"{x:.{int(to_number(digits))}f}"
    if name == "toString":
        return lambda *a: _fmt_num(x)
    return UNDEFINED


def _regex_prop(rx: JSRegExp, name: str):
    if name == "test":
        return lambda s, *a: rx.rx.search(to_js_string(s)) is not None
    if name == "exec":
        def exec_(s, *a):
            m = rx.rx.search(to_js_string(s))
            if m is None:
                return None
            return [m.group(0), *[g if g is not None else UNDEFINED
                                  for g in m.groups()]]
        return exec_
    if name == "source":
        return rx.source
    if name == "flags":
        return rx.flags
    return UNDEFINED


# --------------------------------------------------------- global objects

def json_stringify(value, replacer=UNDEFINED, indent=UNDEFINED):
    def conv(v):
        if v is UNDEFINED or isinstance(v, (JSFunction,)) or callable(v):
            return _OMIT
        if v is None or isinstance(v, (bool, str)):
            return v
        if isinstance(v, (int, float)):
            v = float(v)
            if v != v or v in (float("inf"), float("-inf")):
                return None
            return int(v) if v == int(v) and abs(v) < 1e15 else v
        if isinstance(v, list):
            return [None if (c := conv(x)) is _OMIT else c for x in v]
        if isinstance(v, dict):
            return {k: c for k, x in v.items()
                    if k != "__error__" and (c := conv(x)) is not _OMIT}
        if isinstance(v, JSDate):
            return v.js_get("toISOString")()
        return _OMIT
    out = conv(value)
    if out is _OMIT:
        return UNDEFINED
    kw = {"separators": (",", ":")}
    if indent is not UNDEFINED and indent:
        kw = {"indent": int(to_number(indent))}
    return _json.dumps(out, ensure_ascii=False, **kw)


_OMIT = object()


def json_parse(text, *a):
    try:
        return _to_js_value(_json.loads(to_js_string(text)))
    except (ValueError, TypeError) as exc:
        raise JSThrow(make_error("SyntaxError", f"JSON.parse: {exc}"))


def _to_js_value(v):
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return [_to_js_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_js_value(x) for k, x in v.items()}
    return v


class HostObject:
    """Dict-backed host object exposed to JS via the js_get protocol."""

    def __init__(self, props: dict):
        self._props = props

    def js_get(self, name):
        return self._props.get(name, UNDEFINED)


def _js_round(x) -> float:
    # JS Math.round: halves toward +inf (Python round is banker's)
    v = to_number(x)
    return float(_math.floor(v + 0.5))


def make_error_ctor(name: str):
    def ctor(message=""):
        return make_error(name, message)
    ctor.js_constructor = True
    ctor.js_error_name = name
    return ctor


def standard_globals(now_ms=None) -> dict:
    """The executeWithVM global surface (sandbox/index.ts:414-436): JSON,
    Math, Date, RegExp, Error types, Promise — timers deliberately absent."""
    import random as _random

    def date_ctor(*args):
        if not args:
            return JSDate((_time.time() * 1000.0) if now_ms is None else now_ms)
        return JSDate(to_number(args[0]))
    date_ctor.js_constructor = True
    date_host = HostObject({
        "now": lambda *a: (_time.time() * 1000.0) if now_ms is None
        else float(now_ms),
    })
    date_ctor.js_get = date_host.js_get

    def regexp_ctor(pattern="", flags=""):
        return JSRegExp(to_js_string(pattern), to_js_string(flags))
    regexp_ctor.js_constructor = True

    math_obj = HostObject({
        "floor": lambda x, *a: float(_math.floor(to_number(x))),
        "ceil": lambda x, *a: float(_math.ceil(to_number(x))),
        "round": lambda x, *a: _js_round(x),
        "trunc": lambda x, *a: float(_math.trunc(to_number(x))),
        "abs": lambda x, *a: abs(to_number(x)),
        "min": lambda *xs: min((to_number(x) for x in xs),
                               default=float("inf")),
        "max": lambda *xs: max((to_number(x) for x in xs),
                               default=float("-inf")),
        "pow": lambda a, b, *r: to_number(a) ** to_number(b),
        "sqrt": lambda x, *a: _math.sqrt(to_number(x)),
        "random": lambda *a: _random.random(),
        "log": lambda x, *a: _math.log(to_number(x)),
        "exp": lambda x, *a: _math.exp(to_number(x)),
        "PI": _math.pi,
        "E": _math.e,
    })

    json_obj = HostObject({"parse": json_parse, "stringify": json_stringify})

    promise_obj = HostObject({
        # synchronous degenerate Promise: resolve is identity, all gathers
        "resolve": lambda v=UNDEFINED: v,
        "reject": lambda v=UNDEFINED: (_ for _ in ()).throw(JSThrow(v)),
        "all": lambda xs: list(xs),
    })

    object_obj = HostObject({
        "keys": lambda o: list(o.keys()) if isinstance(o, dict) else [],
        "values": lambda o: list(o.values()) if isinstance(o, dict) else [],
        "entries": lambda o: [[k, v] for k, v in o.items()]
        if isinstance(o, dict) else [],
        "assign": lambda t, *src: (t.update(
            {k: v for s in src if isinstance(s, dict)
             for k, v in s.items()}) or t) if isinstance(t, dict) else t,
        "fromEntries": lambda pairs: {to_js_string(p[0]): p[1]
                                      for p in pairs},
    })

    array_obj = HostObject({
        "isArray": lambda v=UNDEFINED: isinstance(v, list),
        "from": lambda v=UNDEFINED, *a: list(v)
        if isinstance(v, (list, str)) else [],
    })

    number_obj = HostObject({
        "isInteger": lambda v=UNDEFINED: isinstance(v, float)
        and v == int(v),
        "parseFloat": lambda v=UNDEFINED: to_number(v),
        "isNaN": lambda v=UNDEFINED: isinstance(v, float) and v != v,
    })

    def parse_int(v=UNDEFINED, base=UNDEFINED):
        s = to_js_string(v).strip()
        sign = 1
        if s[:1] in ("+", "-"):
            sign = -1 if s[0] == "-" else 1
            s = s[1:]
        try:
            r = int(to_number(base))
        except (ValueError, OverflowError):
            r = 0
        if r == 0:
            if s[:2].lower() == "0x":
                r, s = 16, s[2:]
            else:
                r = 10
        elif r == 16 and s[:2].lower() == "0x":
            s = s[2:]
        if not 2 <= r <= 36:
            return float("nan")
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:r]
        i = 0
        while i < len(s) and s[i].lower() in digits:
            i += 1
        if i == 0:
            return float("nan")
        return float(sign * int(s[:i], r))

    string_ctor = lambda v="": to_js_string(v)  # noqa: E731

    return {
        "JSON": json_obj,
        "Math": math_obj,
        "Date": date_ctor,
        "RegExp": regexp_ctor,
        "Error": make_error_ctor("Error"),
        "TypeError": make_error_ctor("TypeError"),
        "ReferenceError": make_error_ctor("ReferenceError"),
        "SyntaxError": make_error_ctor("SyntaxError"),
        "Promise": promise_obj,
        "Object": object_obj,
        "Array": array_obj,
        "Number": number_obj,
        "String": string_ctor,
        "parseInt": parse_int,
        "parseFloat": lambda v=UNDEFINED: to_number(v),
        "isNaN": lambda v=UNDEFINED: to_number(v) != to_number(v),
        "NaN": float("nan"),
        "Infinity": float("inf"),
        "undefined": UNDEFINED,
        "null": None,
    }
