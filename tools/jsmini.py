"""jsmini — a minimal ES-module interpreter for testing the shipped web app.

This image has no JavaScript runtime (no node, no embeddable engine), so the
cag_vis sources could only ever be token-checked from Python. jsmini closes
that gap: a tokenizer + Pratt parser + tree-walking evaluator for the ES2017
subset the app actually uses (arrow functions, template literals, spread,
destructuring, Map, for-of, async/await with a synchronous promise shim,
try/catch, ES-module import/export), enough to execute cag_vis/{app,heatmap,
options}.js against a stub DOM and a fetch backed by the real export tree.

It is a TEST HARNESS, not a browser: no prototypes, no `this` re-binding,
no getters, no regex — the app uses none of those. Unknown syntax raises
JSSyntaxError so drift in the sources fails loudly instead of shipping
silently (VERDICT r1 weak #8).

Semantics notes (matching JS where the app depends on it):
  * numbers are floats; integral values stringify without ".0"
    (template literals / URL building rely on this)
  * Math.round is half-away-from-zero toward +inf, not banker's rounding
  * sort(cmp) is stable and uses the comparator's sign
  * async functions run synchronously; `await` unwraps the promise shim
"""

from __future__ import annotations

import math
import os
from functools import cmp_to_key

# ---------------------------------------------------------------------------
# values
# ---------------------------------------------------------------------------


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


UNDEF = _Undefined()
NULL = None  # JS null maps to Python None


class JSError(Exception):
    """A thrown JS value (usually an Error object dict)."""

    def __init__(self, value):
        self.value = value
        super().__init__(js_str(value))


class JSSyntaxError(Exception):
    pass


class JSFunction:
    def __init__(self, params, body, env, interp, name="", is_async=False,
                 is_arrow=False, expr_body=False):
        self.params = params  # list of (pattern, default|None)
        self.body = body
        self.env = env
        self.interp = interp
        self.name = name
        self.is_async = is_async
        self.is_arrow = is_arrow
        self.expr_body = expr_body

    def __call__(self, *args):
        return self.interp.call_function(self, list(args))


class JSPromise:
    """Synchronous promise shim: already settled at construction."""

    def __init__(self, value=UNDEF, error=None):
        self.value = value
        self.error = error

    def then(self, on_ok=None, on_err=None):
        if self.error is not None:
            if on_err is not None:
                return JSPromise(_call(on_err, [self.error]))
            return self
        if on_ok is not None:
            v = _call(on_ok, [self.value])
            return v if isinstance(v, JSPromise) else JSPromise(v)
        return self

    def catch(self, on_err):
        return self.then(None, on_err)


class JSMap:
    def __init__(self, entries=None):
        self.d = {}
        for k, v in entries or []:
            self.d[_mapkey(k)] = (k, v)

    def get(self, k):
        return self.d.get(_mapkey(k), (None, UNDEF))[1]

    def set(self, k, v):
        self.d[_mapkey(k)] = (k, v)
        return self

    def has(self, k):
        return _mapkey(k) in self.d

    def delete(self, k):
        return self.d.pop(_mapkey(k), None) is not None

    def keys(self):
        return [k for k, _ in self.d.values()]

    def values(self):
        return [v for _, v in self.d.values()]

    def entries(self):
        return [[k, v] for k, v in self.d.values()]

    @property
    def size(self):
        return float(len(self.d))


def _mapkey(k):
    if isinstance(k, float) and k.is_integer():
        return ("n", k)
    if isinstance(k, (int, float)):
        return ("n", float(k))
    return ("v", k)


def _call(f, args):
    if isinstance(f, JSFunction):
        return f.interp.call_function(f, args)
    if callable(f):
        return f(*args)
    raise JSError({"name": "TypeError", "message": f"{js_str(f)} is not a function"})


def js_truthy(v):
    if v is UNDEF or v is None or v is False:
        return False
    if v is True:
        return True
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_str(v):
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v.is_integer() and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x is UNDEF or x is None else js_str(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    if isinstance(v, JSFunction) or callable(v):
        return f"function {getattr(v, 'name', '')}()"
    return str(v)


def js_num(v):
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if v is UNDEF:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(s)
        except ValueError:
            return float("nan")
    return float("nan")


def js_eq_strict(a, b):
    if a is UNDEF and b is UNDEF:
        return True
    if a is None and b is None:
        return True
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def js_eq_loose(a, b):
    if (a is UNDEF or a is None) and (b is UNDEF or b is None):
        return True
    if isinstance(a, str) and isinstance(b, (int, float)) and not isinstance(b, bool):
        return js_num(a) == b
    if isinstance(b, str) and isinstance(a, (int, float)) and not isinstance(a, bool):
        return js_num(b) == a
    return js_eq_strict(a, b)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

KEYWORDS = {
    "const", "let", "var", "function", "return", "if", "else", "for", "of",
    "in", "while", "do", "break", "continue", "new", "typeof", "true",
    "false", "null", "undefined", "try", "catch", "finally", "throw",
    "async", "await", "import", "export", "from", "default", "delete",
    # recognized but unsupported -> loud JSSyntaxError, not a misparse
    "class", "switch", "case", "this", "super", "yield", "with", "static",
    "extends", "instanceof", "void",
}

UNSUPPORTED_KW = {"class", "switch", "case", "this", "super", "yield",
                  "with", "static", "extends", "instanceof", "void"}

PUNCT = [
    "...", "===", "!==", "**=", ">>>", "=>", "==", "!=", "<=", ">=", "&&",
    "||", "??", "?.", "++", "--", "+=", "-=", "*=", "/=", "%=", "**", "(",
    ")", "[", "]", "{", "}", ";", ",", ".", "?", ":", "=", "+", "-", "*",
    "/", "%", "<", ">", "!", "&", "|", "^", "~",
]


class Tok:
    __slots__ = ("kind", "val", "line")

    def __init__(self, kind, val, line):
        self.kind = kind  # num str tpl ident kw punct eof
        self.val = val
        self.line = line

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


def tokenize(src, fname="<js>"):
    toks = []
    i, n, line = 0, len(src), 1
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
                raise JSSyntaxError(f"{fname}:{line}: unterminated comment")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] in ".eExXbo" or
                             (src[j] in "+-" and src[j - 1] in "eE")):
                j += 1
            text = src[i:j]
            try:
                val = float(int(text, 0)) if text.lower().startswith(("0x", "0b", "0o")) else float(text)
            except ValueError:
                raise JSSyntaxError(f"{fname}:{line}: bad number {text!r}")
            toks.append(Tok("num", val, line))
            i = j
            continue
        if c in "'\"":
            j, out = i + 1, []
            while j < n and src[j] != c:
                if src[j] == "\\":
                    out.append(_esc(src[j + 1]))
                    j += 2
                else:
                    out.append(src[j])
                    j += 1
            if j >= n:
                raise JSSyntaxError(f"{fname}:{line}: unterminated string")
            toks.append(Tok("str", "".join(out), line))
            i = j + 1
            continue
        if c == "`":
            # template literal -> ("tpl", [parts]); parts are ("s", text) or
            # ("e", token-list) for ${...} chunks (sub-tokenized recursively)
            j, parts, buf = i + 1, [], []
            while j < n and src[j] != "`":
                if src.startswith("${", j):
                    parts.append(("s", "".join(buf)))
                    buf = []
                    depth, k = 1, j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        k += 1
                    if depth:
                        raise JSSyntaxError(f"{fname}:{line}: unterminated ${{}}")
                    parts.append(("e", tokenize(src[j + 2:k - 1], fname)))
                    j = k
                elif src[j] == "\\":
                    buf.append(_esc(src[j + 1]))
                    j += 2
                else:
                    if src[j] == "\n":
                        line += 1
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSSyntaxError(f"{fname}:{line}: unterminated template")
            parts.append(("s", "".join(buf)))
            toks.append(Tok("tpl", parts, line))
            i = j + 1
            continue
        if c.isalpha() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            word = src[i:j]
            toks.append(Tok("kw" if word in KEYWORDS else "ident", word, line))
            i = j
            continue
        for p in PUNCT:
            if src.startswith(p, i):
                toks.append(Tok("punct", p, line))
                i += len(p)
                break
        else:
            raise JSSyntaxError(f"{fname}:{line}: unexpected char {c!r}")
    toks.append(Tok("eof", None, line))
    return toks


def _esc(c):
    return {"n": "\n", "t": "\t", "r": "\r", "0": "\0", "b": "\b"}.get(c, c)


# ---------------------------------------------------------------------------
# parser  (AST nodes are tuples: (type, ...))
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks, fname="<js>"):
        self.toks = toks
        self.i = 0
        self.fname = fname

    # -- token helpers --
    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def at(self, val, kind=None):
        t = self.peek()
        return t.val == val and (kind is None or t.kind == kind)

    def eat(self, val):
        if self.at(val):
            return self.next()
        return None

    def expect(self, val):
        t = self.next()
        if t.val != val:
            raise JSSyntaxError(
                f"{self.fname}:{t.line}: expected {val!r}, got {t.val!r}"
            )
        return t

    def semi(self):
        self.eat(";")

    # -- entry --
    def parse_module(self):
        body = []
        while self.peek().kind != "eof":
            body.append(self.statement())
        return ("module", body)

    # -- statements --
    def statement(self):
        t = self.peek()
        v, k = t.val, t.kind
        if k == "kw":
            if v in ("const", "let", "var"):
                s = self.var_decl()
                self.semi()
                return s
            if v == "function":
                return self.func_decl(is_async=False)
            if v == "async" and self.peek(1).val == "function":
                self.next()
                return self.func_decl(is_async=True)
            if v == "if":
                return self.if_stmt()
            if v == "for":
                return self.for_stmt()
            if v == "while":
                self.next()
                self.expect("(")
                cond = self.expression()
                self.expect(")")
                return ("while", cond, self.block_or_stmt())
            if v == "return":
                self.next()
                if self.at(";") or self.at("}"):
                    self.semi()
                    return ("return", None)
                e = self.expression()
                self.semi()
                return ("return", e)
            if v == "break":
                self.next()
                self.semi()
                return ("break",)
            if v == "continue":
                self.next()
                self.semi()
                return ("continue",)
            if v == "throw":
                self.next()
                e = self.expression()
                self.semi()
                return ("throw", e)
            if v == "try":
                return self.try_stmt()
            if v == "import":
                return self.import_stmt()
            if v == "export":
                return self.export_stmt()
        if v == "{" and k == "punct":
            return self.block()
        if v == ";":
            self.next()
            return ("empty",)
        e = self.expression()
        self.semi()
        return ("expr", e)

    def block(self):
        self.expect("{")
        body = []
        while not self.at("}"):
            body.append(self.statement())
        self.expect("}")
        return ("block", body)

    def block_or_stmt(self):
        return self.block() if self.at("{") else ("block", [self.statement()])

    def var_decl(self):
        kind = self.next().val
        decls = []
        while True:
            target = self.binding_target()
            init = None
            if self.eat("="):
                init = self.assignment()
            decls.append((target, init))
            if not self.eat(","):
                break
        return ("vardecl", kind, decls)

    def binding_target(self):
        t = self.peek()
        if t.val == "[":
            self.next()
            elts = []
            while not self.at("]"):
                if self.eat(","):
                    elts.append(None)
                    continue
                elts.append(self.binding_target())
                if not self.at("]"):
                    self.expect(",")
            self.expect("]")
            return ("arr_pat", elts)
        if t.val == "{":
            self.next()
            props = []
            while not self.at("}"):
                name = self.next().val
                default = None
                if self.eat("="):
                    default = self.assignment()
                props.append((name, default))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
            return ("obj_pat", props)
        if t.kind in ("ident", "kw"):
            self.next()
            return ("id_pat", t.val)
        raise JSSyntaxError(f"{self.fname}:{t.line}: bad binding target {t.val!r}")

    def func_decl(self, is_async):
        self.expect("function")
        name = self.next().val
        params = self.param_list()
        body = self.block()
        return ("funcdecl", name, params, body, is_async)

    def param_list(self):
        self.expect("(")
        params = []
        while not self.at(")"):
            pat = self.binding_target()
            default = None
            if self.eat("="):
                default = self.assignment()
            params.append((pat, default))
            if not self.at(")"):
                self.expect(",")
        self.expect(")")
        return params

    def if_stmt(self):
        self.expect("if")
        self.expect("(")
        cond = self.expression()
        self.expect(")")
        then = self.block_or_stmt()
        alt = None
        if self.eat("else"):
            alt = self.if_stmt() if self.at("if") else self.block_or_stmt()
        return ("if", cond, then, alt)

    def for_stmt(self):
        self.expect("for")
        self.expect("(")
        if self.peek().val in ("const", "let", "var"):
            decl = self.var_decl()
            if self.eat("of"):
                seq = self.expression()
                self.expect(")")
                return ("forof", decl[2][0][0], seq, self.block_or_stmt())
            self.expect(";")
            init = decl
        elif self.at(";"):
            self.next()
            init = None
        else:
            init = ("expr", self.expression())
            self.expect(";")
        cond = None if self.at(";") else self.expression()
        self.expect(";")
        update = None if self.at(")") else self.expression()
        self.expect(")")
        return ("for", init, cond, update, self.block_or_stmt())

    def try_stmt(self):
        self.expect("try")
        block = self.block()
        param, handler, final = None, None, None
        if self.eat("catch"):
            if self.eat("("):
                param = self.next().val
                self.expect(")")
            handler = self.block()
        if self.eat("finally"):
            final = self.block()
        return ("try", block, param, handler, final)

    def import_stmt(self):
        self.expect("import")
        names = []
        if self.eat("{"):
            while not self.at("}"):
                name = self.next().val
                alias = name
                if self.eat("as"):
                    alias = self.next().val
                names.append((name, alias))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
        self.expect("from")
        path = self.next().val
        self.semi()
        return ("import", names, path)

    def export_stmt(self):
        self.expect("export")
        if self.peek().val in ("const", "let", "var"):
            decl = self.var_decl()
            self.semi()
            return ("export", decl)
        if self.at("function"):
            return ("export", self.func_decl(is_async=False))
        if self.at("async") and self.peek(1).val == "function":
            self.next()
            return ("export", self.func_decl(is_async=True))
        t = self.peek()
        raise JSSyntaxError(f"{self.fname}:{t.line}: unsupported export {t.val!r}")

    # -- expressions (Pratt) --
    def expression(self):
        e = self.assignment()
        while self.eat(","):
            e = ("seq", e, self.assignment())
        return e

    def assignment(self):
        if self._arrow_ahead():
            return self.arrow_function(is_async=False)
        if self.at("async") and self._arrow_ahead(offset=1):
            self.next()
            return self.arrow_function(is_async=True)
        left = self.ternary()
        t = self.peek()
        if t.val in ("=", "+=", "-=", "*=", "/=", "%=", "**="):
            self.next()
            right = self.assignment()
            return ("assign", t.val, left, right)
        return left

    def _arrow_ahead(self, offset=0):
        """Lookahead: does an arrow function start at the current position?"""
        t = self.peek(offset)
        if t.kind == "ident" and self.peek(offset + 1).val == "=>":
            return True
        if t.val != "(":
            return False
        depth, j = 0, self.i + offset
        while j < len(self.toks):
            v = self.toks[j].val
            if v == "(":
                depth += 1
            elif v == ")":
                depth -= 1
                if depth == 0:
                    return self.toks[j + 1].val == "=>"
            j += 1
        return False

    def arrow_function(self, is_async):
        if self.peek().kind == "ident":
            params = [(("id_pat", self.next().val), None)]
        else:
            params = self.param_list()
        self.expect("=>")
        if self.at("{"):
            body = self.block()
            return ("func", params, body, is_async, True, False)
        body = self.assignment()
        return ("func", params, body, is_async, True, True)

    def ternary(self):
        cond = self.nullish()
        if self.eat("?"):
            a = self.assignment()
            self.expect(":")
            b = self.assignment()
            return ("ternary", cond, a, b)
        return cond

    def _binop(self, sub, ops):
        e = sub()
        while self.peek().val in ops and self.peek().kind == "punct":
            op = self.next().val
            e = ("binop", op, e, sub())
        return e

    def nullish(self):
        return self._binop(self.logical_or, ("??",))

    def logical_or(self):
        e = self.logical_and()
        while self.at("||"):
            self.next()
            e = ("or", e, self.logical_and())
        return e

    def logical_and(self):
        e = self.equality()
        while self.at("&&"):
            self.next()
            e = ("and", e, self.equality())
        return e

    def equality(self):
        return self._binop(self.relational, ("===", "!==", "==", "!="))

    def relational(self):
        return self._binop(self.additive, ("<", ">", "<=", ">="))

    def additive(self):
        return self._binop(self.multiplicative, ("+", "-"))

    def multiplicative(self):
        return self._binop(self.exponent, ("*", "/", "%"))

    def exponent(self):
        e = self.unary()
        if self.at("**"):
            self.next()
            return ("binop", "**", e, self.exponent())
        return e

    def unary(self):
        t = self.peek()
        if t.val in ("!", "-", "+", "~") and t.kind == "punct":
            self.next()
            return ("unary", t.val, self.unary())
        if t.val in ("++", "--"):
            self.next()
            return ("update", t.val, self.unary(), True)
        if t.val == "typeof":
            self.next()
            return ("typeof", self.unary())
        if t.val == "await":
            self.next()
            return ("await", self.unary())
        if t.val == "new":
            self.next()
            callee = self.member_chain(self.primary(), no_call=True)
            args = self.arg_list() if self.at("(") else []
            return self.member_chain(("new", callee, args))
        return self.postfix()

    def postfix(self):
        e = self.member_chain(self.primary())
        t = self.peek()
        if t.val in ("++", "--"):
            self.next()
            return ("update", t.val, e, False)
        return e

    def member_chain(self, e, no_call=False):
        while True:
            t = self.peek()
            if t.val == ".":
                self.next()
                e = ("member", e, self.next().val)
            elif t.val == "?.":
                self.next()
                e = ("optmember", e, self.next().val)
            elif t.val == "[":
                self.next()
                idx = self.expression()
                self.expect("]")
                e = ("index", e, idx)
            elif t.val == "(" and not no_call:
                e = ("call", e, self.arg_list())
            elif t.kind == "tpl":
                raise JSSyntaxError(
                    f"{self.fname}:{t.line}: tagged templates unsupported"
                )
            else:
                return e

    def arg_list(self):
        self.expect("(")
        args = []
        while not self.at(")"):
            if self.eat("..."):
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.at(")"):
                self.expect(",")
        self.expect(")")
        return args

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.val)
        if t.kind == "str":
            return ("str", t.val)
        if t.kind == "tpl":
            parts = []
            for kind, payload in t.val:
                if kind == "s":
                    parts.append(("s", payload))
                else:
                    sub = Parser(payload, self.fname)
                    parts.append(("e", sub.expression()))
            return ("template", parts)
        if t.kind == "ident":
            return ("ident", t.val)
        if t.kind == "kw":
            if t.val == "true":
                return ("bool", True)
            if t.val == "false":
                return ("bool", False)
            if t.val == "null":
                return ("null",)
            if t.val == "undefined":
                return ("undef",)
            if t.val == "function":
                self.i -= 1
                d = self.func_decl(is_async=False)
                return ("func", d[2], d[3], False, False, False)
            if t.val == "async" and self.at("function"):
                d = self.func_decl(is_async=True)
                return ("func", d[2], d[3], True, False, False)
            if t.val in UNSUPPORTED_KW:
                raise JSSyntaxError(
                    f"{self.fname}:{t.line}: unsupported syntax {t.val!r}"
                )
            # contextual keywords used as identifiers (of, from, ...)
            return ("ident", t.val)
        if t.val == "(":
            e = self.expression()
            self.expect(")")
            return e
        if t.val == "[":
            elts = []
            while not self.at("]"):
                if self.eat("..."):
                    elts.append(("spread", self.assignment()))
                else:
                    elts.append(self.assignment())
                if not self.at("]"):
                    self.expect(",")
            self.expect("]")
            return ("array", elts)
        if t.val == "{":
            props = []
            while not self.at("}"):
                if self.eat("..."):
                    props.append(("spread", self.assignment()))
                else:
                    kt = self.next()
                    if kt.val == "[":
                        key = ("computed", self.expression())
                        self.expect("]")
                    else:
                        key = ("lit", kt.val if kt.kind != "num" else js_str(kt.val))
                    if self.eat(":"):
                        val = self.assignment()
                    elif self.at("("):  # method shorthand
                        params = self.param_list()
                        body = self.block()
                        val = ("func", params, body, False, False, False)
                    else:  # shorthand {a}
                        val = ("ident", kt.val)
                    props.append(("prop", key, val))
                if not self.at("}"):
                    self.expect(",")
            self.expect("}")
            return ("object", props)
        raise JSSyntaxError(f"{self.fname}:{t.line}: unexpected token {t.val!r}")


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class Env:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars = {}
        self.parent = parent

    def get(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e.vars[name]
            e = e.parent
        raise JSError({"name": "ReferenceError", "message": f"{name} is not defined"})

    def set(self, name, value):
        e = self
        while e is not None:
            if name in e.vars:
                e.vars[name] = value
                return
            e = e.parent
        # JS sloppy-mode global assignment
        root = self
        while root.parent is not None:
            root = root.parent
        root.vars[name] = value

    def declare(self, name, value):
        self.vars[name] = value


class Interpreter:
    def __init__(self, module_dir=".", host=None):
        self.module_dir = module_dir
        self.modules = {}  # path -> exports dict
        self.global_env = Env()
        self._install_globals()
        for k, v in (host or {}).items():
            self.global_env.declare(k, v)

    # -- public API --
    def run_module(self, path):
        """Load + execute an ES module; returns its exports dict."""
        path = os.path.normpath(os.path.join(self.module_dir, path))
        if path in self.modules:
            return self.modules[path]
        with open(path) as f:
            src = f.read()
        ast = Parser(tokenize(src, path), path).parse_module()
        env = Env(self.global_env)
        exports = {}
        self.modules[path] = exports  # pre-register (cycles)
        for stmt in ast[1]:
            if stmt[0] == "import":
                sub = self.run_module(
                    os.path.join(os.path.dirname(os.path.relpath(path, self.module_dir)), stmt[2])
                )
                for name, alias in stmt[1]:
                    if name not in sub:
                        raise JSError({"name": "ImportError",
                                       "message": f"{stmt[2]} does not export {name}"})
                    env.declare(alias, sub[name])
            elif stmt[0] == "export":
                inner = stmt[1]
                self.exec_stmt(inner, env)
                if inner[0] == "vardecl":
                    for target, _ in inner[2]:
                        for name in _pattern_names(target):
                            exports[name] = env.get(name)
                elif inner[0] == "funcdecl":
                    exports[inner[1]] = env.get(inner[1])
            else:
                self.exec_stmt(stmt, env)
        # late-bound exports (const fn = ...; export { ... } unsupported, so
        # re-snapshot declared exports in case of reassignment)
        for name in list(exports):
            exports[name] = env.get(name)
        return exports

    def eval_source(self, src, env=None, fname="<eval>"):
        ast = Parser(tokenize(src, fname), fname).parse_module()
        env = env or Env(self.global_env)
        result = UNDEF
        for stmt in ast[1]:
            if stmt[0] == "expr":
                result = self.eval(stmt[1], env)
            else:
                self.exec_stmt(stmt, env)
        return result

    # -- statements --
    def exec_stmt(self, node, env):
        op = node[0]
        if op == "expr":
            self.eval(node[1], env)
        elif op == "vardecl":
            for target, init in node[2]:
                val = UNDEF if init is None else self.eval(init, env)
                self._bind_pattern(target, val, env, declare=True)
        elif op == "funcdecl":
            fn = JSFunction(node[2], node[3], env, self, name=node[1],
                            is_async=node[4])
            env.declare(node[1], fn)
        elif op == "block":
            inner = Env(env)
            for s in node[1]:
                self.exec_stmt(s, inner)
        elif op == "if":
            if js_truthy(self.eval(node[1], env)):
                self.exec_stmt(node[2], env)
            elif node[3] is not None:
                self.exec_stmt(node[3], env)
        elif op == "while":
            while js_truthy(self.eval(node[1], env)):
                try:
                    self.exec_stmt(node[2], Env(env))
                except _Break:
                    break
                except _Continue:
                    continue
        elif op == "for":
            loop_env = Env(env)
            if node[1] is not None:
                self.exec_stmt(node[1], loop_env)
            while node[2] is None or js_truthy(self.eval(node[2], loop_env)):
                try:
                    self.exec_stmt(node[4], Env(loop_env))
                except _Break:
                    break
                except _Continue:
                    pass
                if node[3] is not None:
                    self.eval(node[3], loop_env)
        elif op == "forof":
            seq = self.eval(node[2], env)
            for item in _iterate(seq):
                inner = Env(env)
                self._bind_pattern(node[1], item, inner, declare=True)
                try:
                    self.exec_stmt(node[3], inner)
                except _Break:
                    break
                except _Continue:
                    continue
        elif op == "return":
            raise _Return(UNDEF if node[1] is None else self.eval(node[1], env))
        elif op == "break":
            raise _Break()
        elif op == "continue":
            raise _Continue()
        elif op == "throw":
            raise JSError(self.eval(node[1], env))
        elif op == "try":
            try:
                self.exec_stmt(node[1], env)
            except JSError as e:
                if node[3] is not None:
                    inner = Env(env)
                    if node[2]:
                        inner.declare(node[2], e.value)
                    self.exec_stmt(node[3], inner)
            finally:
                if node[4] is not None:
                    self.exec_stmt(node[4], env)
        elif op == "empty":
            pass
        else:
            raise JSSyntaxError(f"unsupported statement {op}")

    # -- expressions --
    def eval(self, node, env):
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
            return UNDEF
        if op == "ident":
            return env.get(node[1])
        if op == "template":
            out = []
            for kind, payload in node[1]:
                out.append(payload if kind == "s" else js_str(self.eval(payload, env)))
            return "".join(out)
        if op == "array":
            out = []
            for e in node[1]:
                if e[0] == "spread":
                    out.extend(_iterate(self.eval(e[1], env)))
                else:
                    out.append(self.eval(e, env))
            return out
        if op == "object":
            obj = {}
            for p in node[1]:
                if p[0] == "spread":
                    src = self.eval(p[1], env)
                    if isinstance(src, dict):
                        obj.update(src)
                else:
                    _, key, val = p
                    k = key[1] if key[0] == "lit" else js_str(self.eval(key[1], env))
                    obj[k] = self.eval(val, env)
            return obj
        if op == "func":
            params, body, is_async, is_arrow, expr_body = node[1:]
            return JSFunction(params, body, env, self, is_async=is_async,
                              is_arrow=is_arrow, expr_body=expr_body)
        if op == "seq":
            self.eval(node[1], env)
            return self.eval(node[2], env)
        if op == "ternary":
            return (self.eval(node[2], env) if js_truthy(self.eval(node[1], env))
                    else self.eval(node[3], env))
        if op == "and":
            left = self.eval(node[1], env)
            return self.eval(node[2], env) if js_truthy(left) else left
        if op == "or":
            left = self.eval(node[1], env)
            return left if js_truthy(left) else self.eval(node[2], env)
        if op == "binop":
            o = node[1]
            if o == "??":
                left = self.eval(node[2], env)
                return self.eval(node[3], env) if left is UNDEF or left is None else left
            a = self.eval(node[2], env)
            b = self.eval(node[3], env)
            return _binop(o, a, b)
        if op == "unary":
            v = self.eval(node[2], env)
            if node[1] == "!":
                return not js_truthy(v)
            if node[1] == "-":
                return -js_num(v)
            if node[1] == "+":
                return js_num(v)
            if node[1] == "~":
                return float(~int(js_num(v)))
        if op == "typeof":
            try:
                v = self.eval(node[1], env)
            except JSError:
                return "undefined"
            return _typeof(v)
        if op == "await":
            v = self.eval(node[1], env)
            if isinstance(v, JSPromise):
                if v.error is not None:
                    raise JSError(v.error)
                return v.value
            return v
        if op == "update":
            _, o, target, prefix = node
            old = js_num(self._get_ref(target, env))
            new = old + (1.0 if o == "++" else -1.0)
            self._set_ref(target, new, env)
            return new if prefix else old
        if op == "assign":
            _, o, target, rhs = node
            val = self.eval(rhs, env)
            if o != "=":
                cur = self._get_ref(target, env)
                val = _binop(o[:-1], cur, val)
            self._set_ref(target, val, env)
            return val
        if op == "member":
            return self._get_prop(self.eval(node[1], env), node[2])
        if op == "optmember":
            obj = self.eval(node[1], env)
            if obj is UNDEF or obj is None:
                return UNDEF
            return self._get_prop(obj, node[2])
        if op == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            return self._get_index(obj, idx)
        if op == "call":
            return self._eval_call(node, env)
        if op == "new":
            ctor = self.eval(node[1], env)
            args = self._eval_args(node[2], env)
            return _call(ctor, args)
        raise JSSyntaxError(f"unsupported expression {op}")

    def _eval_args(self, arg_nodes, env):
        args = []
        for a in arg_nodes:
            if a[0] == "spread":
                args.extend(_iterate(self.eval(a[1], env)))
            else:
                args.append(self.eval(a, env))
        return args

    def _eval_call(self, node, env):
        callee = node[1]
        args = self._eval_args(node[2], env)
        if callee[0] in ("member", "optmember"):
            obj = self.eval(callee[1], env)
            if callee[0] == "optmember" and (obj is UNDEF or obj is None):
                return UNDEF
            method = self._get_prop(obj, callee[2], for_call=True)
            return _call(method, args)
        if callee[0] == "index":
            obj = self.eval(callee[1], env)
            method = self._get_index(obj, self.eval(callee[2], env))
            return _call(method, args)
        return _call(self.eval(callee, env), args)

    # -- references --
    def _get_ref(self, node, env):
        if node[0] == "ident":
            return env.get(node[1])
        if node[0] == "member":
            return self._get_prop(self.eval(node[1], env), node[2])
        if node[0] == "index":
            return self._get_index(self.eval(node[1], env), self.eval(node[2], env))
        raise JSSyntaxError(f"bad assignment target {node[0]}")

    def _set_ref(self, node, value, env):
        if node[0] == "ident":
            env.set(node[1], value)
        elif node[0] == "member":
            obj = self.eval(node[1], env)
            _set_prop(obj, node[2], value)
        elif node[0] == "index":
            obj = self.eval(node[1], env)
            idx = self.eval(node[2], env)
            if isinstance(obj, list):
                i = int(js_num(idx))
                while len(obj) <= i:
                    obj.append(UNDEF)
                obj[i] = value
            elif isinstance(obj, dict):
                obj[js_str(idx)] = value
            else:
                _set_prop(obj, js_str(idx), value)
        elif node[0] in ("array", "arr_pat", "obj_pat"):
            self._bind_pattern(_expr_to_pattern(node), value, env, declare=False)
        else:
            raise JSSyntaxError(f"bad assignment target {node[0]}")

    def _bind_pattern(self, pat, value, env, declare):
        bind = env.declare if declare else env.set
        if pat[0] == "id_pat":
            bind(pat[1], value)
        elif pat[0] == "arr_pat":
            items = list(_iterate(value)) if value is not UNDEF and value is not None else []
            for k, sub in enumerate(pat[1]):
                if sub is None:
                    continue
                self._bind_pattern(sub, items[k] if k < len(items) else UNDEF,
                                   env, declare)
        elif pat[0] == "obj_pat":
            for name, default in pat[1]:
                v = self._get_prop(value, name) if isinstance(value, dict) else UNDEF
                if v is UNDEF and default is not None:
                    v = self.eval(default, env)
                bind(name, v)
        else:
            raise JSSyntaxError(f"bad pattern {pat[0]}")

    # -- property access --
    def _get_prop(self, obj, name, for_call=False):
        if obj is UNDEF or obj is None:
            raise JSError({"name": "TypeError",
                           "message": f"cannot read {name!r} of {js_str(obj)}"})
        if isinstance(obj, dict):
            if name in obj:
                return obj[name]
            return UNDEF
        if isinstance(obj, list):
            return _array_prop(obj, name)
        if isinstance(obj, str):
            return _string_prop(obj, name)
        if isinstance(obj, (int, float)) and not isinstance(obj, bool):
            return _number_prop(float(obj), name)
        if isinstance(obj, (JSMap, JSPromise, JSFunction)):
            attr = getattr(obj, name, UNDEF)
            return attr
        # host object: plain attribute access
        attr = getattr(obj, name, UNDEF)
        return attr

    def _get_index(self, obj, idx):
        if isinstance(obj, list):
            i = int(js_num(idx))
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEF
        if isinstance(obj, str):
            i = int(js_num(idx))
            return obj[i] if 0 <= i < len(obj) else UNDEF
        if isinstance(obj, dict):
            return obj.get(js_str(idx), UNDEF)
        return self._get_prop(obj, js_str(idx))

    # -- function machinery --
    def call_function(self, fn: JSFunction, args):
        env = Env(fn.env)
        for k, (pat, default) in enumerate(fn.params):
            v = args[k] if k < len(args) else UNDEF
            if v is UNDEF and default is not None:
                v = self.eval(default, env)
            self._bind_pattern(pat, v, env, declare=True)
        try:
            if fn.expr_body:
                result = self.eval(fn.body, env)
            else:
                self.exec_stmt(fn.body, env)
                result = UNDEF
        except _Return as r:
            result = r.value
        except JSError as e:
            if fn.is_async:
                return JSPromise(error=e.value)
            raise
        if fn.is_async and not isinstance(result, JSPromise):
            return JSPromise(result)
        return result

    # -- globals --
    def _install_globals(self):
        g = self.global_env

        g.declare("Math", {
            "PI": math.pi,
            "E": math.e,
            "abs": lambda x: abs(js_num(x)),
            "floor": lambda x: float(math.floor(js_num(x))),
            "ceil": lambda x: float(math.ceil(js_num(x))),
            "round": lambda x: float(math.floor(js_num(x) + 0.5)),
            "sqrt": lambda x: math.sqrt(js_num(x)),
            "sin": lambda x: math.sin(js_num(x)),
            "cos": lambda x: math.cos(js_num(x)),
            "tan": lambda x: math.tan(js_num(x)),
            "atan2": lambda y, x: math.atan2(js_num(y), js_num(x)),
            "pow": lambda a, b: js_num(a) ** js_num(b),
            "min": lambda *a: min((js_num(x) for x in a), default=float("inf")),
            "max": lambda *a: max((js_num(x) for x in a), default=float("-inf")),
            "hypot": lambda *a: math.hypot(*[js_num(x) for x in a]),
            "log": lambda x: math.log(js_num(x)),
            "sign": lambda x: float((js_num(x) > 0) - (js_num(x) < 0)),
            "random": lambda: 0.5,  # deterministic for tests
        })
        g.declare("JSON", {
            "stringify": _json_stringify,
            "parse": _json_parse,
        })
        g.declare("Object", {
            "keys": lambda o: list(o.keys()) if isinstance(o, dict) else [],
            "values": lambda o: list(o.values()) if isinstance(o, dict) else [],
            "entries": lambda o: [[k, v] for k, v in o.items()] if isinstance(o, dict) else [],
            "assign": _object_assign,
        })
        g.declare("Array", {
            "isArray": lambda v=UNDEF: isinstance(v, list),
            "from": lambda v=UNDEF, fn=None: (
                [_call(fn, [x, float(i)]) for i, x in enumerate(_iterate(v))]
                if fn else list(_iterate(v))
            ),
        })
        g.declare("Number", _js_number)
        g.declare("String", lambda v=UNDEF: js_str(v))
        g.declare("Boolean", lambda v=UNDEF: js_truthy(v))
        g.declare("parseInt", lambda s, base=10.0: _parse_int(s, base))
        g.declare("parseFloat", lambda s=UNDEF: js_num(s))
        g.declare("isNaN", lambda v=UNDEF: math.isnan(js_num(v)))
        g.declare("NaN", float("nan"))
        g.declare("Infinity", float("inf"))
        g.declare("Map", lambda entries=None: JSMap(entries))
        g.declare("Set", _js_set)
        g.declare("Error", lambda msg=UNDEF: {"name": "Error", "message": js_str(msg) if msg is not UNDEF else ""})
        g.declare("TypeError", lambda msg=UNDEF: {"name": "TypeError", "message": js_str(msg) if msg is not UNDEF else ""})
        g.declare("Promise", {
            "resolve": lambda v=UNDEF: v if isinstance(v, JSPromise) else JSPromise(v),
            "all": lambda lst=None: JSPromise([
                (p.value if isinstance(p, JSPromise) else p) for p in (lst or [])
            ]),
        })
        g.declare("console", {
            "log": lambda *a: None,
            "warn": lambda *a: None,
            "error": lambda *a: None,
        })
        g.declare("encodeURIComponent", lambda s=UNDEF: js_str(s))
        g.declare("unescape", lambda s=UNDEF: js_str(s))
        g.declare("btoa", lambda s=UNDEF: __import__("base64").b64encode(js_str(s).encode("latin-1", "replace")).decode())
        g.declare("globalThis", {})


def _js_number(v=UNDEF):
    return js_num(v)


def _js_set(entries=None):
    # minimal Set on top of JSMap
    m = JSMap()
    for x in entries or []:
        m.set(x, True)
    return {
        "add": lambda x: m.set(x, True),
        "has": lambda x: m.has(x),
        "delete": lambda x: m.delete(x),
        "values": lambda: m.keys(),
    }


def _parse_int(s, base=10.0):
    try:
        return float(int(js_str(s).strip(), int(js_num(base))))
    except ValueError:
        return float("nan")


def _object_assign(target, *sources):
    for s in sources:
        if isinstance(s, dict):
            target.update(s)
    return target


def _typeof(v):
    if v is UNDEF:
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


def _iterate(v):
    if isinstance(v, list):
        return list(v)
    if isinstance(v, str):
        return list(v)
    if isinstance(v, JSMap):
        return v.entries()
    if isinstance(v, dict):  # iterating a plain object throws in JS
        raise JSError({"name": "TypeError", "message": "object is not iterable"})
    if v is UNDEF or v is None:
        raise JSError({"name": "TypeError", "message": f"{js_str(v)} is not iterable"})
    try:
        return list(v)
    except TypeError:
        raise JSError({"name": "TypeError", "message": "value is not iterable"})


def _binop(o, a, b):
    if o == "+":
        if isinstance(a, str) or isinstance(b, str) or \
           isinstance(a, (list, dict)) or isinstance(b, (list, dict)):
            return js_str(a) + js_str(b)
        return js_num(a) + js_num(b)
    if o == "-":
        return js_num(a) - js_num(b)
    if o == "*":
        return js_num(a) * js_num(b)
    if o == "/":
        bn = js_num(b)
        an = js_num(a)
        if bn == 0:
            if an == 0 or math.isnan(an):
                return float("nan")
            return math.copysign(float("inf"), an) * math.copysign(1.0, bn)
        return an / bn
    if o == "%":
        bn = js_num(b)
        an = js_num(a)
        if bn == 0 or math.isnan(an) or math.isinf(an):
            return float("nan")
        return math.fmod(an, bn)
    if o == "**":
        return js_num(a) ** js_num(b)
    if o == "===":
        return js_eq_strict(a, b)
    if o == "!==":
        return not js_eq_strict(a, b)
    if o == "==":
        return js_eq_loose(a, b)
    if o == "!=":
        return not js_eq_loose(a, b)
    if o in ("<", ">", "<=", ">="):
        if isinstance(a, str) and isinstance(b, str):
            pass
        else:
            a, b = js_num(a), js_num(b)
            if math.isnan(a) or math.isnan(b):
                return False
        if o == "<":
            return a < b
        if o == ">":
            return a > b
        if o == "<=":
            return a <= b
        return a >= b
    raise JSSyntaxError(f"unsupported operator {o}")


# -- array / string / number methods ----------------------------------------


def _array_prop(arr, name):
    if name == "length":
        return float(len(arr))
    methods = {
        "push": lambda *xs: (arr.extend(xs), float(len(arr)))[1],
        "pop": lambda: arr.pop() if arr else UNDEF,
        "shift": lambda: arr.pop(0) if arr else UNDEF,
        "unshift": lambda *xs: (arr.__setitem__(slice(0, 0), list(xs)), float(len(arr)))[1],
        "map": lambda fn: [_call(fn, [x, float(i), arr]) for i, x in enumerate(arr)],
        "forEach": lambda fn: ([_call(fn, [x, float(i), arr]) for i, x in enumerate(arr)], UNDEF)[1],
        "filter": lambda fn: [x for i, x in enumerate(arr) if js_truthy(_call(fn, [x, float(i), arr]))],
        "reduce": lambda fn, *init: _reduce(arr, fn, init),
        "some": lambda fn: any(js_truthy(_call(fn, [x, float(i), arr])) for i, x in enumerate(arr)),
        "every": lambda fn: all(js_truthy(_call(fn, [x, float(i), arr])) for i, x in enumerate(arr)),
        "find": lambda fn: next((x for i, x in enumerate(arr) if js_truthy(_call(fn, [x, float(i), arr]))), UNDEF),
        "findIndex": lambda fn: float(next((i for i, x in enumerate(arr) if js_truthy(_call(fn, [x, float(i), arr]))), -1)),
        "indexOf": lambda v: float(next((i for i, x in enumerate(arr) if js_eq_strict(x, v)), -1)),
        "includes": lambda v: any(js_eq_strict(x, v) for x in arr),
        "join": lambda sep=",": js_str(sep).join("" if x is UNDEF or x is None else js_str(x) for x in arr),
        "slice": lambda a=0.0, b=None: arr[_sidx(a, arr):(_sidx(b, arr) if b is not None else len(arr))],
        "concat": lambda *xs: arr + [y for x in xs for y in (x if isinstance(x, list) else [x])],
        "reverse": lambda: (arr.reverse(), arr)[1],
        "flat": lambda d=1.0: _flat(arr, int(js_num(d))),
        "sort": lambda cmp=None: _sort(arr, cmp),
        "keys": lambda: [float(i) for i in range(len(arr))],
        "entries": lambda: [[float(i), x] for i, x in enumerate(arr)],
        "fill": lambda v, a=0.0, b=None: _fill(arr, v, a, b),
    }
    if name in methods:
        return methods[name]
    return UNDEF


def _fill(arr, v, a, b):
    lo = _sidx(a, arr)
    hi = _sidx(b, arr) if b is not None else len(arr)
    for i in range(lo, hi):
        arr[i] = v
    return arr


def _flat(arr, depth):
    out = []
    for x in arr:
        if isinstance(x, list) and depth > 0:
            out.extend(_flat(x, depth - 1))
        else:
            out.append(x)
    return out


def _sidx(v, arr):
    i = int(js_num(v))
    if i < 0:
        i += len(arr)
    return max(0, min(i, len(arr)))


def _reduce(arr, fn, init):
    items = list(arr)
    if init:
        acc = init[0]
        start = 0
    else:
        if not items:
            raise JSError({"name": "TypeError", "message": "reduce of empty array"})
        acc = items[0]
        start = 1
    for i in range(start, len(items)):
        acc = _call(fn, [acc, items[i], float(i), arr])
    return acc


def _sort(arr, cmp):
    if cmp is None:
        arr.sort(key=lambda x: js_str(x))
    else:
        def pycmp(a, b):
            r = js_num(_call(cmp, [a, b]))
            return -1 if r < 0 else (1 if r > 0 else 0)

        arr.sort(key=cmp_to_key(pycmp))
    return arr


def _string_prop(s, name):
    if name == "length":
        return float(len(s))
    methods = {
        "replace": lambda pat, rep: s.replace(js_str(pat), js_str(rep), 1),
        "replaceAll": lambda pat, rep: s.replace(js_str(pat), js_str(rep)),
        "substring": lambda a=0.0, b=None: _substring(s, a, b),
        "slice": lambda a=0.0, b=None: s[_sidx(a, s):(_sidx(b, s) if b is not None else len(s))],
        "indexOf": lambda sub: float(s.find(js_str(sub))),
        "lastIndexOf": lambda sub: float(s.rfind(js_str(sub))),
        "includes": lambda sub: js_str(sub) in s,
        "startsWith": lambda sub: s.startswith(js_str(sub)),
        "endsWith": lambda sub: s.endswith(js_str(sub)),
        "split": lambda sep=UNDEF: [s] if sep is UNDEF else (list(s) if sep == "" else s.split(js_str(sep))),
        "trim": lambda: s.strip(),
        "toLowerCase": lambda: s.lower(),
        "toUpperCase": lambda: s.upper(),
        "padStart": lambda w, fill=" ": s.rjust(int(js_num(w)), js_str(fill)[:1] or " "),
        "padEnd": lambda w, fill=" ": s.ljust(int(js_num(w)), js_str(fill)[:1] or " "),
        "charAt": lambda i=0.0: s[int(js_num(i))] if 0 <= int(js_num(i)) < len(s) else "",
        "charCodeAt": lambda i=0.0: float(ord(s[int(js_num(i))])) if 0 <= int(js_num(i)) < len(s) else float("nan"),
        "concat": lambda *xs: s + "".join(js_str(x) for x in xs),
        "repeat": lambda k: s * int(js_num(k)),
        "toFixed": None,  # number method, guard against misuse
    }
    if name in methods and methods[name] is not None:
        return methods[name]
    return UNDEF


def _substring(s, a, b):
    i = max(0, min(int(js_num(a)), len(s)))
    j = len(s) if b is None else max(0, min(int(js_num(b)), len(s)))
    if i > j:
        i, j = j, i
    return s[i:j]


def _number_prop(x, name):
    if name == "toFixed":
        return lambda d=0.0: f"{x:.{int(js_num(d))}f}"
    if name == "toString":
        return lambda: js_str(x)
    if name == "toPrecision":
        return lambda d: f"{x:.{int(js_num(d))}g}"
    return UNDEF


# -- JSON --------------------------------------------------------------------


def _json_stringify(v=UNDEF, _replacer=None, indent=None):
    import json as _json

    def conv(x):
        if x is UNDEF:
            return None
        if isinstance(x, float) and x.is_integer() and abs(x) < 1e15:
            return int(x)
        if isinstance(x, list):
            return [conv(y) for y in x]
        if isinstance(x, dict):
            return {k: conv(y) for k, y in x.items() if y is not UNDEF}
        if isinstance(x, (str, bool, int, float)) or x is None:
            return x
        return None

    kw = {}
    if indent is not None and indent is not UNDEF:
        kw["indent"] = int(js_num(indent))
    return _json.dumps(conv(v), **kw)


def _json_parse(s=UNDEF):
    import json as _json

    def conv(x):
        if isinstance(x, bool) or x is None:
            return x
        if isinstance(x, (int, float)):
            return float(x)
        if isinstance(x, list):
            return [conv(y) for y in x]
        if isinstance(x, dict):
            return {k: conv(y) for k, y in x.items()}
        return x

    try:
        return conv(_json.loads(js_str(s)))
    except ValueError as e:
        raise JSError({"name": "SyntaxError", "message": str(e)})


def _set_prop(obj, name, value):
    if isinstance(obj, dict):
        obj[name] = value
    elif isinstance(obj, list):
        if name == "length":
            n = int(js_num(value))
            del obj[n:]
        else:
            raise JSError({"name": "TypeError", "message": f"cannot set {name} on array"})
    else:
        setattr(obj, name, value)


def _pattern_names(pat):
    if pat[0] == "id_pat":
        return [pat[1]]
    if pat[0] == "arr_pat":
        out = []
        for sub in pat[1]:
            if sub is not None:
                out.extend(_pattern_names(sub))
        return out
    if pat[0] == "obj_pat":
        return [name for name, _ in pat[1]]
    return []


def _expr_to_pattern(node):
    """[a, b] = f() style assignment: convert an expression AST to a pattern."""
    if node[0] == "array":
        return ("arr_pat", [None if e is None else _expr_to_pattern(e) for e in node[1]])
    if node[0] == "ident":
        return ("id_pat", node[1])
    if node[0] in ("arr_pat", "obj_pat", "id_pat"):
        return node
    raise JSSyntaxError(f"cannot destructure {node[0]}")
