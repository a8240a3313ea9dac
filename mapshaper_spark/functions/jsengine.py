"""A small JavaScript *expression* interpreter — the fallback expression
engine behind the SQL translator.

The reference compiles arbitrary JS with ``new Function`` and a feature
proxy (/root/reference/src/data/mapshaper-expressions.js:140-162). Our
primary surface machine-translates the corpus's JS idioms to Spark SQL
(functions/expressions.py) so expressions run JVM-side inside whole-stage
codegen. This module closes the long tail: when the translation does not
produce analyzable SQL (array higher-order chains, arrow functions,
multi-statement programs with locals, JS coercion corners), the CLI falls
back to interpreting the original JS per row inside Arrow batches
(operators/attributes.py:each_js / filter_js) — the documented slow path,
never the default.

Scope (the reference test corpus's expression grammar plus the statement
subset a ``new Function`` body accepts, not full ES):
  * literals: numbers (dec/hex/exponent), strings ('..', "..", template
    literals without interpolation), regex literals, arrays, objects,
    true/false/null/undefined/NaN/Infinity
  * operators: assignment (=, +=, -=, *=, /=, %=), ternary, ??, ||, &&,
    bitwise | ^ &, equality == != === !==, relational < <= > >= in,
    shifts, additive/multiplicative/**, unary ! ~ + - typeof,
    prefix/postfix ++ --
  * postfix: calls, member access, computed indexing, arrow functions
    (expression or block body), sequence (,) and statement (;) chains
  * statements: ``var``/``let``/``const`` declarations, ``if``/``else``,
    classic ``for``, ``for..of``, ``for..in``, ``while``, ``do..while``,
    ``function`` declarations/expressions, ``return``/``break``/
    ``continue``, ``{}`` blocks. Statements are ';'-separated (newline
    ASI is not implemented — the corpus always separates with ';').
  * library: Math.*, parseInt/parseFloat, isNaN/isFinite, Number/String/
    Boolean/Array.isArray/JSON/Object.keys|values, String and Array
    methods with JS semantics (0-based, negative slice, NaN contagion)
  * mapshaper context: bare identifiers resolve to the feature's data
    fields (assignment creates fields, mapshaper-expressions.js
    getAssignedVars), ``d`` is the record object, ``$``/``this`` the
    feature proxy; undefined variables throw, like the reference
    (expressions-test.js 'throws error on undefined variable').

Declaration semantics mirror the reference's ``with(env){with(record){..}}``
wrapper (mapshaper-expressions.js:26-33) byte-for-byte where observable:
the regex getAssignedVars (:115-123) matches ``name =`` even in ``var
name = v``, so the record is null-initialized for every such name BEFORE
the program runs. A top-level ``var x = 1`` then assigns through the
scope chain where the with(record) object shadows the hoisted var —
x becomes a DATA FIELD. A ``let``/``const`` binding is lexically inner
to the with object, so the field stays null while the local carries the
value. ``var`` inside a function body binds in that function's variable
environment (nearer than the with object) and stays local. assigned_vars
below reproduces the regex surface (declarations WITH initializers
count); the interpreter reproduces the runtime writes.

Also provides ``assigned_vars`` / ``assignment_objects`` — parity with the
reference's getAssignedVars/getAssignmentObjects (expressions-test.js) —
used by each_js to know the output schema before running the job.
"""

from __future__ import annotations

import math
import re as _re

__all__ = [
    "JSError", "JSSyntaxError", "JSReferenceError", "parse", "evaluate",
    "run_program", "assigned_vars", "assignment_objects",
    "mutated_scope_objects", "UNDEFINED",
]


class JSError(Exception):
    pass


class JSSyntaxError(JSError):
    pass


class JSReferenceError(JSError):
    pass


class _Undefined:
    """JS ``undefined`` (distinct from null/None)."""
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

NAN = float("nan")


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_PUNCT = [
    "===", "!==", "**=", ">>>", "=>", "==", "!=", "<=", ">=", "&&", "||",
    "??", "**", "++", "--", "+=", "-=", "*=", "/=", "%=", "<<", ">>",
    "+", "-", "*", "/", "%", "(", ")", "[", "]", "{", "}", ",", ";", ":",
    "?", ".", "<", ">", "=", "!", "&", "|", "^", "~",
]

_NUM_RE = _re.compile(r"0[xX][0-9a-fA-F]+|(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")
_ID_RE = _re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")


class _Tok:
    __slots__ = ("kind", "val")

    def __init__(self, kind, val):
        self.kind = kind  # num str regex id punct eof
        self.val = val

    def __repr__(self):
        return f"{self.kind}:{self.val!r}"


def _tokenize(src: str) -> list:
    toks = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i + 2)
            if j < 0:
                raise JSSyntaxError("unterminated comment")
            i = j + 2
            continue
        if c in "'\"`":
            j = i + 1
            buf = []
            parts = []  # template literal: ('str', s) / ('expr', src)
            while j < n and src[j] != c:
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    if esc == "u" and src[j + 2:j + 3] == "{":
                        k = src.find("}", j + 3)  # \u{1F600}
                        try:
                            buf.append(chr(int(src[j + 3:k], 16)))
                        except ValueError:
                            raise JSSyntaxError("bad unicode escape")
                        j = k + 1
                    elif esc == "u" and j + 6 <= n:  # \uXXXX
                        try:
                            buf.append(chr(int(src[j + 2:j + 6], 16)))
                        except ValueError:
                            raise JSSyntaxError("bad unicode escape")
                        j += 6
                    elif esc == "x" and j + 4 <= n:  # \xNN
                        try:
                            buf.append(chr(int(src[j + 2:j + 4], 16)))
                        except ValueError:
                            raise JSSyntaxError("bad hex escape")
                        j += 4
                    else:
                        buf.append({"n": "\n", "t": "\t", "r": "\r",
                                    "0": "\0", "b": "\b", "f": "\f",
                                    "v": "\v"}.get(esc, esc))
                        j += 2
                else:
                    if c == "`" and src.startswith("${", j):
                        # template interpolation: capture the raw
                        # expression source, brace-nesting aware
                        if buf:
                            parts.append(("str", "".join(buf)))
                            buf = []
                        depth = 1
                        k = j + 2
                        while k < n and depth:
                            if src[k] == "{":
                                depth += 1
                            elif src[k] == "}":
                                depth -= 1
                            k += 1
                        if depth:
                            raise JSSyntaxError(
                                "unterminated template expression")
                        parts.append(("expr", src[j + 2:k - 1]))
                        j = k
                        continue
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise JSSyntaxError("unterminated string")
            if c == "`" and parts:
                if buf:
                    parts.append(("str", "".join(buf)))
                toks.append(_Tok("template", parts))
            else:
                toks.append(_Tok("str", "".join(buf)))
            i = j + 1
            continue
        if c == "/" and _regex_allowed(toks):
            j = i + 1
            in_class = False
            body = []
            while j < n:
                ch = src[j]
                if ch == "\\" and j + 1 < n:
                    body.append(src[j:j + 2])
                    j += 2
                    continue
                if ch == "[":
                    in_class = True
                elif ch == "]":
                    in_class = False
                elif ch == "/" and not in_class:
                    break
                elif ch == "\n":
                    raise JSSyntaxError("unterminated regex")
                body.append(ch)
                j += 1
            if j >= n:
                raise JSSyntaxError("unterminated regex")
            k = j + 1
            while k < n and src[k] in "gimsuy":
                k += 1
            toks.append(_Tok("regex", ("".join(body), src[j + 1:k])))
            i = k
            continue
        m = _NUM_RE.match(src, i)
        if m and (c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit())):
            txt = m.group(0)
            toks.append(_Tok("num", float(int(txt, 16)) if txt[:2].lower() == "0x"
                             else float(txt)))
            i = m.end()
            continue
        m = _ID_RE.match(src, i)
        if m:
            toks.append(_Tok("id", m.group(0)))
            i = m.end()
            continue
        for p in _PUNCT:
            if src.startswith(p, i):
                toks.append(_Tok("punct", p))
                i += len(p)
                break
        else:
            raise JSSyntaxError(f"unexpected character {c!r}")
    toks.append(_Tok("eof", None))
    return toks


def _regex_allowed(toks: list) -> bool:
    """A ``/`` starts a regex literal only in prefix position (after an
    operator/open paren/start), never after a value — so ``a/b/c`` parses
    as division."""
    if not toks:
        return True
    t = toks[-1]
    if t.kind in ("num", "str", "regex"):
        return False
    if t.kind == "id":
        return t.val in ("return", "typeof", "in", "new")
    return t.val not in (")", "]", "}")


# ---------------------------------------------------------------------------
# parser (Pratt) — AST nodes are plain tuples: (type, ...)
# ---------------------------------------------------------------------------

_ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "**="}

# binding powers for binary operators
_BIN_BP = {
    "??": 10, "||": 11, "&&": 12,
    "|": 13, "^": 14, "&": 15,
    "==": 16, "!=": 16, "===": 16, "!==": 16,
    "<": 17, ">": 17, "<=": 17, ">=": 17,
    "<<": 18, ">>": 18, ">>>": 18,
    "+": 19, "-": 19,
    "*": 20, "/": 20, "%": 20,
    "**": 21,
}


class _Parser:
    def __init__(self, toks: list):
        self.toks = toks
        self.pos = 0

    def peek(self) -> _Tok:
        return self.toks[self.pos]

    def next(self) -> _Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def eat(self, val: str) -> bool:
        t = self.peek()
        if t.kind == "punct" and t.val == val:
            self.pos += 1
            return True
        return False

    def expect(self, val: str) -> None:
        if not self.eat(val):
            raise JSSyntaxError(f"expected {val!r}, got {self.peek()!r}")

    # program := statement*
    def program(self):
        return ("program", self.statements_until("eof"))

    def statements_until(self, end: str) -> list:
        """Parse statements until ``end`` ('eof' or '}'); consumes the
        closing brace."""
        stmts = []
        while True:
            t = self.peek()
            if t.kind == "eof":
                if end == "}":
                    raise JSSyntaxError("expected '}'")
                return stmts
            if end == "}" and t.kind == "punct" and t.val == "}":
                self.next()
                return stmts
            if self.eat(";"):
                continue
            stmts.append(self.statement())

    def statement(self):
        t = self.peek()
        if t.kind == "punct" and t.val == "{":
            self.next()
            return ("block", self.statements_until("}"))
        if t.kind == "id":
            kw = t.val
            if kw in ("var", "let", "const"):
                self.next()
                return self._var_decl(kw)
            if kw == "if":
                self.next()
                self.expect("(")
                cond = self.expression()
                self.expect(")")
                then = self.statement()
                self.eat(";")  # 'if (c) expr; else ...'
                els = None
                nxt = self.peek()
                if nxt.kind == "id" and nxt.val == "else":
                    self.next()
                    els = self.statement()
                return ("if", cond, then, els)
            if kw == "while":
                self.next()
                self.expect("(")
                cond = self.expression()
                self.expect(")")
                return ("while", cond, self.statement())
            if kw == "do":
                self.next()
                body = self.statement()
                w = self.next()
                if w.kind != "id" or w.val != "while":
                    raise JSSyntaxError("expected 'while' after do-body")
                self.expect("(")
                cond = self.expression()
                self.expect(")")
                self.eat(";")
                return ("dowhile", body, cond)
            if kw == "for":
                self.next()
                return self._for_stmt()
            if kw == "function":
                self.next()
                name_t = self.next()
                if name_t.kind != "id":
                    raise JSSyntaxError("expected function name")
                params, body = self._function_tail()
                return ("func", name_t.val, params, body)
            if kw == "return":
                self.next()
                nxt = self.peek()
                if nxt.kind == "eof" or (nxt.kind == "punct"
                                         and nxt.val in (";", "}")):
                    return ("return", None)
                return ("return", self.expression())
            if kw == "break":
                self.next()
                return ("break",)
            if kw == "continue":
                self.next()
                return ("continue",)
        return self.expression()

    def _var_decl(self, kind: str):
        decls = []
        while True:
            t = self.next()
            if t.kind != "id":
                raise JSSyntaxError("expected variable name")
            init = self.assignment() if self.eat("=") else None
            decls.append((t.val, init))
            if not self.eat(","):
                break
        return ("decl", kind, decls)

    def _for_stmt(self):
        self.expect("(")
        # for (x of e) / for (x in e), with optional var/let/const
        kind = None
        save = self.pos
        t = self.peek()
        if t.kind == "id" and t.val in ("var", "let", "const"):
            kind = t.val
            self.next()
            t = self.peek()
        if t.kind == "id":
            name = t.val
            nxt = self.toks[self.pos + 1]
            if nxt.kind == "id" and nxt.val in ("of", "in"):
                self.pos += 2
                obj = self.expression()
                self.expect(")")
                body = self.statement()
                return ("forof" if nxt.val == "of" else "forin",
                        kind, name, obj, body)
        self.pos = save
        # classic for(init; cond; update)
        if self.eat(";"):
            init = None
        else:
            t = self.peek()
            if t.kind == "id" and t.val in ("var", "let", "const"):
                self.next()
                init = self._var_decl(t.val)
            else:
                init = self.expression()
            self.expect(";")
        cond = None if self.eat(";") else self.expression()
        if cond is not None:
            self.expect(";")
        upd = None
        if not self.eat(")"):
            upd = self.expression()
            self.expect(")")
        return ("for", init, cond, upd, self.statement())

    def _function_tail(self):
        """Parse '(params) { body }' after the function keyword/name."""
        self.expect("(")
        params = []
        if not self.eat(")"):
            while True:
                t = self.next()
                if t.kind != "id":
                    raise JSSyntaxError("expected parameter name")
                params.append(t.val)
                if self.eat(")"):
                    break
                self.expect(",")
        self.expect("{")
        return params, self.statements_until("}")

    def _arrow(self, params):
        """After '=>': block-bodied or single-expression arrow node."""
        if self.peek().kind == "punct" and self.peek().val == "{":
            self.next()
            return ("arrowb", params, self.statements_until("}"))
        return ("arrow", params, self.assignment())

    # expression := assignment (',' assignment)*   (the sequence operator)
    def expression(self):
        e = self.assignment()
        if self.peek().kind == "punct" and self.peek().val == ",":
            seq = [e]
            while self.eat(","):
                seq.append(self.assignment())
            return ("seq", seq)
        return e

    def assignment(self):
        start = self.pos
        left = self.ternary()
        t = self.peek()
        if t.kind == "punct" and t.val in _ASSIGN_OPS:
            if left[0] not in ("id", "member", "index"):
                raise JSSyntaxError("invalid assignment target")
            op = self.next().val
            right = self.assignment()  # right-assoc: a = b = 1
            return ("assign", op, left, right)
        del start
        return left

    def ternary(self):
        cond = self.binary(0)
        if self.eat("?"):
            then = self.assignment()
            self.expect(":")
            other = self.assignment()
            return ("ternary", cond, then, other)
        return cond

    def binary(self, min_bp: int):
        left = self.unary()
        while True:
            t = self.peek()
            if t.kind == "id" and t.val == "in":
                if 17 < min_bp:
                    return left
                self.next()
                left = ("bin", "in", left, self.binary(18))
                continue
            if t.kind != "punct":
                return left
            bp = _BIN_BP.get(t.val)
            if bp is None or bp < min_bp:
                return left
            op = self.next().val
            # ** is right-associative; everything else left
            right = self.binary(bp if op == "**" else bp + 1)
            left = ("bin", op, left, right)

    def unary(self):
        t = self.peek()
        if t.kind == "punct" and t.val in ("!", "~", "+", "-", "++", "--"):
            self.next()
            operand = self.unary()
            if t.val in ("++", "--"):
                return ("update", t.val, operand, True)
            return ("unary", t.val, operand)
        if t.kind == "id" and t.val == "typeof":
            self.next()
            return ("unary", "typeof", self.unary())
        return self.postfix()

    def postfix(self):
        e = self.primary()
        while True:
            t = self.peek()
            if self.eat("."):
                name = self.next()
                if name.kind != "id":
                    raise JSSyntaxError("expected property name")
                e = ("member", e, name.val)
            elif t.kind == "punct" and t.val == "(":
                self.next()
                args = []
                if not self.eat(")"):
                    while True:
                        args.append(self.assignment())
                        if self.eat(")"):
                            break
                        self.expect(",")
                e = ("call", e, args)
            elif t.kind == "punct" and t.val == "[":
                self.next()
                idx = self.expression()
                self.expect("]")
                e = ("index", e, idx)
            elif t.kind == "punct" and t.val in ("++", "--"):
                self.next()
                e = ("update", t.val, e, False)
            else:
                return e

    def primary(self):
        t = self.next()
        if t.kind == "num":
            return ("num", t.val)
        if t.kind == "str":
            return ("str", t.val)
        if t.kind == "template":
            # desugar `a${x}b` into string concatenation with explicit
            # to-string coercion of each interpolated expression
            parts = []
            for kind, val in t.val:
                if kind == "str":
                    parts.append(("str", val))
                else:
                    sub = _Parser(_tokenize(val))
                    expr = sub.expression()
                    if sub.peek().kind != "eof":
                        raise JSSyntaxError(
                            "unexpected token in template expression")
                    parts.append(("tostr", expr))
            if not parts:
                return ("str", "")
            return ("template", parts)
        if t.kind == "regex":
            return ("regex", t.val[0], t.val[1])
        if t.kind == "id":
            kw = {"true": ("bool", True), "false": ("bool", False),
                  "null": ("null",), "undefined": ("undef",),
                  "NaN": ("num", NAN), "Infinity": ("num", math.inf)}
            if t.val in kw:
                return kw[t.val]
            # arrow function with a bare parameter: x => body
            if (self.peek().kind == "punct" and self.peek().val == "=>"):
                self.next()
                return self._arrow([t.val])
            if t.val == "function":  # function expression
                name = None
                if self.peek().kind == "id":
                    name = self.next().val
                params, body = self._function_tail()
                return ("funcexpr", name, params, body)
            return ("id", t.val)
        if t.kind == "punct" and t.val == "(":
            # '(a, b) => ...' or parenthesized expression
            save = self.pos
            params = self._try_arrow_params()
            if params is not None and self.peek().kind == "punct" \
                    and self.peek().val == "=>":
                self.next()
                return self._arrow(params)
            self.pos = save
            e = self.expression()
            self.expect(")")
            return e
        if t.kind == "punct" and t.val == "[":
            items = []
            if not self.eat("]"):
                while True:
                    items.append(self.assignment())
                    if self.eat("]"):
                        break
                    self.expect(",")
            return ("array", items)
        if t.kind == "punct" and t.val == "{":
            props = []
            if not self.eat("}"):
                while True:
                    k = self.next()
                    if k.kind not in ("id", "str", "num"):
                        raise JSSyntaxError("bad object key")
                    key = k.val if k.kind != "num" else _num_to_str(k.val)
                    self.expect(":")
                    props.append((key, self.assignment()))
                    if self.eat("}"):
                        break
                    self.expect(",")
            return ("object", props)
        raise JSSyntaxError(f"unexpected token {t!r}")

    def _try_arrow_params(self):
        params = []
        if self.eat(")"):
            return params
        while True:
            t = self.next()
            if t.kind != "id":
                return None
            params.append(t.val)
            if self.eat(")"):
                return params
            if not self.eat(","):
                return None


def parse(src: str):
    """Parse a JS expression program -> AST. Raises JSSyntaxError."""
    return _Parser(_tokenize(src)).program()


# ---------------------------------------------------------------------------
# JS value semantics
# ---------------------------------------------------------------------------

def _num_to_str(v: float) -> str:
    """ECMA-262 Number::toString(10): decimal form while the leading-digit
    exponent stays in (-7, 21), else 'd.ddde±N' with an UNPADDED exponent —
    repr() alone pads ('1e-07') and switches to scientific earlier than JS
    ('1e-05' where JS prints '0.00001')."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    r = repr(abs(v))
    if "e" not in r:
        return r if v > 0 else "-" + r
    mant, _, exp = r.partition("e")
    n = int(exp) + 1  # decimal-point position relative to the digit string
    digits = (mant.replace(".", "").rstrip("0") or "0")
    k = len(digits)
    sign = "-" if v < 0 else ""
    if k <= n <= 21:
        s = digits + "0" * (n - k)
    elif 0 < n <= 21:
        s = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        s = "0." + "0" * (-n) + digits
    else:
        e10 = n - 1
        mpart = digits[0] + ("." + digits[1:] if k > 1 else "")
        s = f"{mpart}e{'+' if e10 >= 0 else '-'}{abs(e10)}"
    return sign + s


def to_number(v) -> float:
    if v is UNDEFINED:
        return NAN
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0.0
        try:
            if s[:2].lower() == "0x":
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return NAN
    if isinstance(v, list):
        if not v:
            return 0.0
        if len(v) == 1:
            return to_number(v[0])
    return NAN


def to_string(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _num_to_str(float(v))
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if x is None or x is UNDEFINED else to_string(x)
                        for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def truthy(v) -> bool:
    if v is UNDEFINED or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or math.isnan(v))
    if isinstance(v, str):
        return v != ""
    return True


def js_typeof(v) -> str:
    if v is UNDEFINED:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if callable(v):
        return "function"
    return "object"  # null, arrays, objects, regexes


def strict_eq(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)  # NaN == NaN is False in Python too
    if type(a) is not type(b):
        return False
    if isinstance(a, (list, dict)):
        return a is b
    return a == b


def loose_eq(a, b) -> bool:
    nullish_a = a is None or a is UNDEFINED
    nullish_b = b is None or b is UNDEFINED
    if nullish_a or nullish_b:
        return nullish_a and nullish_b
    if isinstance(a, bool):
        return loose_eq(to_number(a), b)
    if isinstance(b, bool):
        return loose_eq(a, to_number(b))
    if isinstance(a, (int, float)) and isinstance(b, str):
        return float(a) == to_number(b)
    if isinstance(a, str) and isinstance(b, (int, float)):
        return to_number(a) == float(b)
    if isinstance(a, (list, dict)) and isinstance(b, (str, int, float)):
        return loose_eq(to_string(a), b)
    if isinstance(b, (list, dict)) and isinstance(a, (str, int, float)):
        return loose_eq(a, to_string(b))
    return strict_eq(a, b)


def _to_int32(v) -> int:
    n = to_number(v)
    if math.isnan(n) or math.isinf(n):
        return 0
    n = int(n)
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def _to_uint32(v) -> int:
    n = to_number(v)
    if math.isnan(n) or math.isinf(n):
        return 0
    return int(n) & 0xFFFFFFFF


class JSRegExp:
    def __init__(self, body: str, flags: str):
        self.source = body
        self.flags = flags
        py_flags = 0
        if "i" in flags:
            py_flags |= _re.IGNORECASE
        if "m" in flags:
            py_flags |= _re.MULTILINE
        if "s" in flags:
            py_flags |= _re.DOTALL
        self.re = _re.compile(self._translate(body), py_flags)

    @staticmethod
    def _translate(body: str) -> str:
        # JS and Python regex syntax agree on the corpus surface; the one
        # common incompatibility is JS's lone '/' escape artifact
        return body.replace("\\/", "/")

    def test(self, s) -> bool:
        return self.re.search(to_string(s)) is not None

    def exec(self, s):
        m = self.re.search(to_string(s))
        if m is None:
            return None
        return [m.group(0)] + [g if g is not None else UNDEFINED
                               for g in m.groups()]


# ---------------------------------------------------------------------------
# library: Math + globals + methods
# ---------------------------------------------------------------------------

def _js_round(x):
    n = to_number(x)
    if math.isnan(n) or math.isinf(n):
        return n
    return float(math.floor(n + 0.5))  # JS rounds half UP (-0.5 -> 0)


_MATH = {
    "PI": math.pi, "E": math.e, "LN2": math.log(2), "LN10": math.log(10),
    "SQRT2": math.sqrt(2),
    "abs": lambda x: abs(to_number(x)),
    "floor": lambda x: float(math.floor(to_number(x))) if math.isfinite(to_number(x)) else to_number(x),
    "ceil": lambda x: float(math.ceil(to_number(x))) if math.isfinite(to_number(x)) else to_number(x),
    "round": _js_round,
    "trunc": lambda x: float(math.trunc(to_number(x))) if math.isfinite(to_number(x)) else to_number(x),
    "sqrt": lambda x: math.sqrt(to_number(x)) if to_number(x) >= 0 else NAN,
    "cbrt": lambda x: math.copysign(abs(to_number(x)) ** (1 / 3), to_number(x)),
    "pow": lambda x, y: _js_pow(to_number(x), to_number(y)),
    "exp": lambda x: math.exp(to_number(x)),
    "log": lambda x: math.log(to_number(x)) if to_number(x) > 0 else (-math.inf if to_number(x) == 0 else NAN),
    "log2": lambda x: math.log2(to_number(x)) if to_number(x) > 0 else (-math.inf if to_number(x) == 0 else NAN),
    "log10": lambda x: math.log10(to_number(x)) if to_number(x) > 0 else (-math.inf if to_number(x) == 0 else NAN),
    "sin": lambda x: math.sin(to_number(x)),
    "cos": lambda x: math.cos(to_number(x)),
    "tan": lambda x: math.tan(to_number(x)),
    "asin": lambda x: math.asin(to_number(x)) if abs(to_number(x)) <= 1 else NAN,
    "acos": lambda x: math.acos(to_number(x)) if abs(to_number(x)) <= 1 else NAN,
    "atan": lambda x: math.atan(to_number(x)),
    "atan2": lambda y, x: math.atan2(to_number(y), to_number(x)),
    "hypot": lambda *a: math.hypot(*(to_number(x) for x in a)),
    "sign": lambda x: (NAN if math.isnan(to_number(x))
                       else float((to_number(x) > 0) - (to_number(x) < 0))),
    "min": lambda *a: min((to_number(x) for x in a), default=math.inf)
    if not any(math.isnan(to_number(x)) for x in a) else NAN,
    "max": lambda *a: max((to_number(x) for x in a), default=-math.inf)
    if not any(math.isnan(to_number(x)) for x in a) else NAN,
}


def _js_pow(x: float, y: float) -> float:
    try:
        v = x ** y
        return float(v.real) if isinstance(v, complex) else float(v)
    except (OverflowError, ZeroDivisionError):
        # sign of the JS result: negative base to an odd integer power
        # overflows to -Infinity ((-1e200)**3), (-0.0)**-1 is -Infinity
        neg = (x < 0 and y == int(y) and int(y) % 2 != 0) or \
            (math.copysign(1.0, x) < 0 and x == 0 and
             y == int(y) and int(y) % 2 != 0)
        return -math.inf if neg else math.inf


def _parse_int(s, radix=UNDEFINED):
    s = to_string(s).strip()
    try:
        base = 10 if radix is UNDEFINED or to_number(radix) == 0 \
            else int(to_number(radix))
    except (ValueError, OverflowError):  # parseInt('5', 'x') -> NaN
        return NAN
    if base < 2 or base > 36:  # JS: radix outside [2, 36] -> NaN
        return NAN
    sign = 1
    if s[:1] and s[:1] in "+-":  # '' in "+-" is True; guard the deref
        sign = -1 if s[0] == "-" else 1
        s = s[1:]
    if base == 16 and s[:2].lower() == "0x":
        s = s[2:]
    elif base == 10 and s[:2].lower() == "0x":
        base = 16
        s = s[2:]
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
    i = 0
    while i < len(s) and s[i].lower() in digits:
        i += 1
    if i == 0:
        return NAN
    return float(sign * int(s[:i], base))


def _parse_float(s):
    s = to_string(s).strip()
    m = _re.match(r"[+-]?(?:Infinity|\d+\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)", s)
    if not m:
        return NAN
    t = m.group(0)
    if t.endswith("Infinity"):
        return -math.inf if t.startswith("-") else math.inf
    return float(t)


def _json_stringify(v, indent=UNDEFINED):
    import json

    def conv(x):
        if x is UNDEFINED:
            return None
        if isinstance(x, float) and (math.isnan(x) or math.isinf(x)):
            return None
        if isinstance(x, float) and x == int(x) and abs(x) < 1e15:
            return int(x)
        if isinstance(x, list):
            return [conv(i) for i in x]
        if isinstance(x, dict):
            return {k: conv(val) for k, val in x.items() if val is not UNDEFINED}
        return x
    kw = {}
    if indent is not UNDEFINED and to_number(indent) > 0:
        kw["indent"] = int(to_number(indent))
    return json.dumps(conv(v), separators=(",", ":") if not kw else None, **kw)


def _json_parse(s):
    import json

    def conv(x):
        if isinstance(x, (int, float)) and not isinstance(x, bool):
            return float(x)
        if isinstance(x, list):
            return [conv(i) for i in x]
        if isinstance(x, dict):
            return {k: conv(v) for k, v in x.items()}
        return x
    return conv(json.loads(to_string(s)))


def _make_globals():
    return {
        "Math": dict(_MATH),
        "parseInt": _parse_int,
        "parseFloat": _parse_float,
        "isNaN": lambda x: math.isnan(to_number(x)),
        "isFinite": lambda x: math.isfinite(to_number(x)),
        "Number": _NumberCtor(),
        "String": _StringCtor(),
        "Boolean": lambda x=UNDEFINED: truthy(x),
        "Array": {"isArray": lambda x: isinstance(x, list),
                  "from": lambda x: list(x) if isinstance(x, (list, str)) else []},
        "Object": {"keys": lambda o: list(o.keys()) if isinstance(o, dict) else [],
                   "values": lambda o: list(o.values()) if isinstance(o, dict) else [],
                   "assign": _object_assign},
        "JSON": {"stringify": _json_stringify, "parse": _json_parse},
        "RegExp": lambda body, flags=UNDEFINED: JSRegExp(
            to_string(body), "" if flags is UNDEFINED else to_string(flags)),
        # expressionUtils: bare round/sprintf plus the `_` namespace
        # (mapshaper-expression-utils.js; defined at the end of this file)
        "round": _js_round_util,
        "sprintf": _js_sprintf,
        "_": dict(_EXPRESSION_UTILS),
    }


def _object_assign(target, *sources):
    if not isinstance(target, dict):
        raise JSError("Object.assign target must be an object")
    for s in sources:
        if isinstance(s, dict):
            target.update(s)
    return target


class _NumberCtor(dict):
    """Number is both callable (coercion) and a namespace."""

    def __init__(self):
        super().__init__({
            "isInteger": lambda x: isinstance(x, (int, float))
            and not isinstance(x, bool) and math.isfinite(x) and x == int(x),
            "isNaN": lambda x: isinstance(x, float) and math.isnan(x),
            "isFinite": lambda x: isinstance(x, (int, float))
            and not isinstance(x, bool) and math.isfinite(x),
            "parseFloat": _parse_float, "parseInt": _parse_int,
            "MAX_SAFE_INTEGER": float(2 ** 53 - 1),
            "MIN_SAFE_INTEGER": float(-(2 ** 53 - 1)),
            "EPSILON": 2.0 ** -52, "POSITIVE_INFINITY": math.inf,
            "NEGATIVE_INFINITY": -math.inf, "NaN": NAN,
        })

    def __call__(self, x=UNDEFINED):
        return 0.0 if x is UNDEFINED else to_number(x)


class _StringCtor(dict):
    def __init__(self):
        super().__init__({
            "fromCharCode": lambda *a: "".join(
                chr(int(to_number(x)) & 0xFFFF) for x in a),
        })

    def __call__(self, x=UNDEFINED):
        return "" if x is UNDEFINED else to_string(x)


# ---------------------------------------------------------------------------
# string / number / array methods
# ---------------------------------------------------------------------------

def _slice_index(n: float, length: int) -> int:
    if math.isnan(n):
        return 0
    i = int(n)
    if i < 0:
        return max(length + i, 0)
    return min(i, length)


def _string_member(s: str, name: str):
    if name == "length":
        return float(len(s))
    meths = {
        "charAt": lambda i=0.0: s[int(to_number(i))]
        if 0 <= int(to_number(i)) < len(s) else "",
        "charCodeAt": lambda i=0.0: float(ord(s[int(to_number(i))]))
        if 0 <= int(to_number(i)) < len(s) else NAN,
        "codePointAt": lambda i=0.0: float(ord(s[int(to_number(i))]))
        if 0 <= int(to_number(i)) < len(s) else UNDEFINED,
        "indexOf": lambda sub, start=0.0: float(
            s.find(to_string(sub), int(to_number(start)))),
        "lastIndexOf": lambda sub: float(s.rfind(to_string(sub))),
        "includes": lambda sub: to_string(sub) in s,
        "startsWith": lambda sub: s.startswith(to_string(sub)),
        "endsWith": lambda sub: s.endswith(to_string(sub)),
        "slice": lambda a=0.0, b=UNDEFINED: s[
            _slice_index(to_number(a), len(s)):
            len(s) if b is UNDEFINED else _slice_index(to_number(b), len(s))],
        "substring": lambda a=0.0, b=UNDEFINED: _substring(s, a, b),
        "substr": lambda a=0.0, ln=UNDEFINED: _substr(s, a, ln),
        "split": lambda sep=UNDEFINED, limit=UNDEFINED: _split(s, sep, limit),
        "replace": lambda pat, rep: _replace(s, pat, rep, False),
        "replaceAll": lambda pat, rep: _replace(s, pat, rep, True),
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "toUpperCase": lambda: s.upper(),
        "toLowerCase": lambda: s.lower(),
        "padStart": lambda ln, pad=" ": _pad(s, ln, pad, True),
        "padEnd": lambda ln, pad=" ": _pad(s, ln, pad, False),
        "repeat": lambda k: s * int(to_number(k)),
        "concat": lambda *a: s + "".join(to_string(x) for x in a),
        "match": lambda r: _match(s, r),
        "search": lambda r: _search(s, r),
        "localeCompare": lambda o: float((s > to_string(o)) - (s < to_string(o))),
        "toString": lambda: s,
    }
    if name in meths:
        return meths[name]
    return UNDEFINED


def _substring(s, a, b):
    i = _slice_index(max(to_number(a), 0), len(s))
    j = len(s) if b is UNDEFINED else _slice_index(max(to_number(b), 0), len(s))
    if i > j:
        i, j = j, i
    return s[i:j]


def _substr(s, a, ln):
    start = int(to_number(a))
    if start < 0:
        start = max(len(s) + start, 0)
    if ln is UNDEFINED:
        return s[start:]
    n = int(to_number(ln))
    return s[start:start + max(n, 0)]


def _split(s, sep, limit):
    if sep is UNDEFINED:
        out = [s]
    elif isinstance(sep, JSRegExp):
        out = sep.re.split(s)
    else:
        sp = to_string(sep)
        out = list(s) if sp == "" else s.split(sp)
    if limit is not UNDEFINED:
        out = out[:int(to_number(limit))]
    return out


def _replace(s, pat, rep, all_occ):
    if isinstance(pat, JSRegExp):
        count = 0 if "g" in pat.flags or all_occ else 1
        rep_s = to_string(rep).replace("\\", "\\\\")
        rep_s = _re.sub(r"\$(\d+)", r"\\\1", rep_s).replace("$&", r"\g<0>")
        return pat.re.sub(rep_s, s, count=count)
    p = to_string(pat)
    r = to_string(rep)
    return s.replace(p, r) if all_occ else s.replace(p, r, 1)


def _pad(s, ln, pad, start):
    n = int(to_number(ln))
    p = to_string(pad)
    if len(s) >= n or p == "":
        return s
    fill = (p * n)[:n - len(s)]
    return fill + s if start else s + fill


def _match(s, r):
    if not isinstance(r, JSRegExp):
        r = JSRegExp(to_string(r), "")
    if "g" in r.flags:
        out = [m.group(0) for m in r.re.finditer(s)]
        return out if out else None
    m = r.re.search(s)
    if m is None:
        return None
    return [m.group(0)] + [g if g is not None else UNDEFINED
                           for g in m.groups()]


def _search(s, r):
    if not isinstance(r, JSRegExp):
        r = JSRegExp(to_string(r), "")
    m = r.re.search(s)
    return float(m.start()) if m else -1.0


def _number_member(v: float, name: str):
    meths = {
        "toFixed": lambda d=0.0: f"%.{int(to_number(d))}f" % v,
        "toString": lambda radix=UNDEFINED: _num_to_str(v)
        if radix is UNDEFINED else _to_radix(v, int(to_number(radix))),
        "toPrecision": lambda p=UNDEFINED: _num_to_str(v)
        if p is UNDEFINED else f"%.{int(to_number(p))}g" % v,
    }
    if name in meths:
        return meths[name]
    return UNDEFINED


def _to_radix(v: float, radix: int) -> str:
    n = int(v)
    if n == 0:
        return "0"
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    sign = "-" if n < 0 else ""
    n = abs(n)
    out = []
    while n:
        out.append(digits[n % radix])
        n //= radix
    return sign + "".join(reversed(out))


def _call_fn(fn, args):
    """Call a JS-side callable (arrow closure or native) with JS
    missing-arg semantics."""
    if isinstance(fn, (_Arrow, _Func)):
        return fn(*args)
    try:
        return fn(*args)
    except TypeError:
        import inspect
        sig = inspect.signature(fn)
        n = len([p for p in sig.parameters.values()
                 if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)])
        return fn(*args[:n])


def _array_member(arr: list, name: str):
    if name == "length":
        return float(len(arr))
    meths = {
        "indexOf": lambda x: float(next(
            (i for i, v in enumerate(arr) if strict_eq(v, x)), -1)),
        "lastIndexOf": lambda x: float(next(
            (i for i in range(len(arr) - 1, -1, -1) if strict_eq(arr[i], x)), -1)),
        "includes": lambda x: any(strict_eq(v, x) for v in arr)
        or any(isinstance(v, float) and math.isnan(v) for v in arr)
        and isinstance(x, float) and math.isnan(x),
        "join": lambda sep=UNDEFINED: (
            "," if sep is UNDEFINED else to_string(sep)).join(
            "" if v is None or v is UNDEFINED else to_string(v) for v in arr),
        "slice": lambda a=0.0, b=UNDEFINED: arr[
            _slice_index(to_number(a), len(arr)):
            len(arr) if b is UNDEFINED else _slice_index(to_number(b), len(arr))],
        "concat": lambda *a: arr + [x for v in a
                                    for x in (v if isinstance(v, list) else [v])],
        "map": lambda fn: [_call_fn(fn, [v, float(i), arr])
                           for i, v in enumerate(arr)],
        "filter": lambda fn: [v for i, v in enumerate(arr)
                              if truthy(_call_fn(fn, [v, float(i), arr]))],
        "some": lambda fn: any(truthy(_call_fn(fn, [v, float(i), arr]))
                               for i, v in enumerate(arr)),
        "every": lambda fn: all(truthy(_call_fn(fn, [v, float(i), arr]))
                                for i, v in enumerate(arr)),
        "find": lambda fn: next((v for i, v in enumerate(arr)
                                 if truthy(_call_fn(fn, [v, float(i), arr]))),
                                UNDEFINED),
        "findIndex": lambda fn: float(next(
            (i for i, v in enumerate(arr)
             if truthy(_call_fn(fn, [v, float(i), arr]))), -1)),
        "forEach": lambda fn: ([_call_fn(fn, [v, float(i), arr])
                                for i, v in enumerate(arr)], UNDEFINED)[1],
        "reduce": lambda fn, init=UNDEFINED: _reduce(arr, fn, init),
        "reverse": lambda: (arr.reverse(), arr)[1],
        "sort": lambda fn=UNDEFINED: _sort(arr, fn),
        "push": lambda *a: (arr.extend(a), float(len(arr)))[1],
        "pop": lambda: arr.pop() if arr else UNDEFINED,
        "shift": lambda: arr.pop(0) if arr else UNDEFINED,
        "unshift": lambda *a: (arr.__setitem__(slice(0, 0), list(a)),
                               float(len(arr)))[1],
        "flat": lambda d=1.0: _flat(arr, int(to_number(d))),
        "fill": lambda v: ([arr.__setitem__(i, v) for i in range(len(arr))],
                           arr)[1],
        "toString": lambda: to_string(arr),
    }
    if name in meths:
        return meths[name]
    return UNDEFINED


def _reduce(arr, fn, init):
    it = iter(enumerate(arr))
    if init is UNDEFINED:
        try:
            _, acc = next(it)
        except StopIteration:
            raise JSError("reduce of empty array with no initial value")
    else:
        acc = init
    for i, v in it:
        acc = _call_fn(fn, [acc, v, float(i), arr])
    return acc


def _sort(arr, fn):
    import functools
    if fn is UNDEFINED:
        arr.sort(key=lambda v: to_string(v))
    else:
        arr.sort(key=functools.cmp_to_key(
            lambda a, b: (lambda r: (r > 0) - (r < 0))(to_number(_call_fn(fn, [a, b])))))
    return arr


def _flat(arr, depth):
    out = []
    for v in arr:
        if isinstance(v, list) and depth > 0:
            out.extend(_flat(v, depth - 1))
        else:
            out.append(v)
    return out


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

class _Scope:
    """Lexical scope chain. ``is_func`` marks a function boundary (where
    ``var`` declarations land). The outermost scope (parent None) models
    the reference's ``with(record)`` position: names not found in the
    chain resolve to — and bare/var assignments write — the record."""
    __slots__ = ("vars", "consts", "parent", "is_func")

    def __init__(self, parent=None, is_func=False):
        self.vars = {}
        self.consts = None  # lazily a set
        self.parent = parent
        self.is_func = is_func

    def find(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None

    def func_scope(self):
        s = self
        while s.parent is not None and not s.is_func:
            s = s.parent
        return s

    def declare(self, name, val, const=False):
        self.vars[name] = val
        if const:
            if self.consts is None:
                self.consts = set()
            self.consts.add(name)


class _BreakSig(Exception):
    pass


class _ContinueSig(Exception):
    pass


class _ReturnSig(Exception):
    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value


# runaway-loop guard: a while(true) in a -each expression would hang a
# Spark task forever; the reference (new Function) hangs too, but a
# bounded hard error is the right behavior inside an executor
_MAX_LOOP_ITER = 5_000_000


class _Arrow:
    __slots__ = ("params", "body", "interp", "scope")

    def __init__(self, params, body, interp, scope):
        self.params = params
        self.body = body
        self.interp = interp
        self.scope = scope

    def __call__(self, *args):
        local = _Scope(self.scope, is_func=True)
        for i, p in enumerate(self.params):
            local.vars[p] = args[i] if i < len(args) else UNDEFINED
        return self.interp._eval(self.body, local)


class _Func:
    """Block-bodied callable: function declaration/expression or a
    block-bodied arrow. Value is the thrown return, else undefined."""
    __slots__ = ("name", "params", "body", "interp", "scope", "is_arrow")

    def __init__(self, name, params, body, interp, scope, is_arrow=False):
        self.name = name
        self.params = params
        self.body = body
        self.interp = interp
        self.scope = scope
        self.is_arrow = is_arrow

    def __call__(self, *args):
        local = _Scope(self.scope, is_func=True)
        for i, p in enumerate(self.params):
            local.vars[p] = args[i] if i < len(args) else UNDEFINED
        if not self.is_arrow and "arguments" not in local.vars:
            local.vars["arguments"] = list(args)
        try:
            self.interp._exec_block(self.body, local)
        except _ReturnSig as r:
            return r.value
        return UNDEFINED


class _Interp:
    def __init__(self, record: dict, env: dict | None = None,
                 globals_: dict | None = None):
        self.record = record          # the feature's data fields (mutable)
        # callers looping over many rows pass a prebuilt ``globals_`` to
        # share one environment across the loop (the reference builds its
        # expression context ONCE per -each run, not per feature) — per-row
        # _make_globals() is ~20 dict builds per record on the slow path
        self.globals = _make_globals() if globals_ is None else globals_
        if env:
            self.globals.update(env)

    # -- name resolution: locals, then data fields, then globals (the
    # reference wraps the record in a `with` block over the proxy/record) --
    def _lookup(self, name: str, scope: _Scope):
        s = scope.find(name)
        if s is not None:
            return s.vars[name]
        if name == "d":
            return self.record
        if name in self.record:
            return self.record[name]
        if name in self.globals:
            return self.globals[name]
        raise JSReferenceError(f"{name} is not defined")

    def _eval(self, node, scope):
        t = node[0]
        if t == "num" or t == "str" or t == "bool":
            return node[1]
        if t == "null":
            return None
        if t == "undef":
            return UNDEFINED
        if t == "regex":
            return JSRegExp(node[1], node[2])
        if t == "template":
            return "".join(self._eval(p, scope) for p in node[1])
        if t == "tostr":
            return to_string(self._eval(node[1], scope))
        if t == "id":
            return self._lookup(node[1], scope)
        if t == "array":
            return [self._eval(x, scope) for x in node[1]]
        if t == "object":
            return {k: self._eval(v, scope) for k, v in node[1]}
        if t == "seq":
            v = UNDEFINED
            for e in node[1]:
                v = self._eval(e, scope)
            return v
        if t == "ternary":
            return self._eval(node[2] if truthy(self._eval(node[1], scope))
                              else node[3], scope)
        if t == "bin":
            return self._bin(node[1], node[2], node[3], scope)
        if t == "unary":
            return self._unary(node[1], node[2], scope)
        if t == "update":
            return self._update(node[1], node[2], node[3], scope)
        if t == "assign":
            return self._assign(node[1], node[2], node[3], scope)
        if t == "member":
            obj = self._eval(node[1], scope)
            return self._member(obj, node[2])
        if t == "index":
            obj = self._eval(node[1], scope)
            idx = self._eval(node[2], scope)
            return self._index(obj, idx)
        if t == "call":
            return self._call(node, scope)
        if t == "arrow":
            return _Arrow(node[1], node[2], self, scope)
        if t == "arrowb":
            return _Func(None, node[1], node[2], self, scope, is_arrow=True)
        if t == "funcexpr":
            if node[1]:  # named: visible to itself for recursion
                inner = _Scope(scope)
                fn = _Func(node[1], node[2], node[3], self, inner)
                inner.vars[node[1]] = fn
                return fn
            return _Func(None, node[2], node[3], self, scope)
        raise JSError(f"unhandled node {t}")

    # -- statements --
    def _exec_block(self, stmts, scope):
        """Execute a statement list; returns the residual value (the last
        statement's value, like the reference's eval-style fallthrough).
        Function declarations hoist to the top of their block."""
        for st in stmts:
            if st[0] == "func":
                scope.declare(st[1],
                              _Func(st[1], st[2], st[3], self, scope))
        v = UNDEFINED
        for st in stmts:
            v = self._exec(st, scope)
        return v

    def _exec(self, node, scope):
        t = node[0]
        if t == "block":
            return self._exec_block(node[1], _Scope(scope))
        if t == "decl":
            return self._decl(node[1], node[2], scope)
        if t == "if":
            if truthy(self._eval(node[1], scope)):
                return self._exec(node[2], scope)
            if node[3] is not None:
                return self._exec(node[3], scope)
            return UNDEFINED
        if t == "while":
            n = 0
            while truthy(self._eval(node[1], scope)):
                n += 1
                if n > _MAX_LOOP_ITER:
                    raise JSError("loop iteration limit exceeded")
                try:
                    self._exec(node[2], _Scope(scope))
                except _ContinueSig:
                    continue
                except _BreakSig:
                    break
            return UNDEFINED
        if t == "dowhile":
            n = 0
            while True:
                n += 1
                if n > _MAX_LOOP_ITER:
                    raise JSError("loop iteration limit exceeded")
                try:
                    self._exec(node[1], _Scope(scope))
                except _ContinueSig:
                    pass
                except _BreakSig:
                    break
                if not truthy(self._eval(node[2], scope)):
                    break
            return UNDEFINED
        if t == "for":
            init, cond, upd, body = node[1], node[2], node[3], node[4]
            ls = _Scope(scope)
            if init is not None:
                self._exec(init, ls)
            n = 0
            while cond is None or truthy(self._eval(cond, ls)):
                n += 1
                if n > _MAX_LOOP_ITER:
                    raise JSError("loop iteration limit exceeded")
                try:
                    self._exec(body, _Scope(ls))
                except _ContinueSig:
                    pass
                except _BreakSig:
                    break
                if upd is not None:
                    self._eval(upd, ls)
            return UNDEFINED
        if t in ("forof", "forin"):
            _, kind, name, obj_node, body = node
            obj = self._eval(obj_node, scope)
            if t == "forof":
                if isinstance(obj, (list, str)):
                    items = list(obj)
                else:
                    raise JSError("for..of target is not iterable")
            else:  # for..in: object keys / array+string indices
                if isinstance(obj, dict):
                    items = list(obj.keys())
                elif isinstance(obj, (list, str)):
                    items = [_num_to_str(float(i)) for i in range(len(obj))]
                else:
                    items = []
            for item in items:
                ls = _Scope(scope)
                ls.declare(name, item, const=(kind == "const"))
                try:
                    self._exec(body, ls)
                except _ContinueSig:
                    continue
                except _BreakSig:
                    break
            return UNDEFINED
        if t == "func":
            # hoisted by _exec_block; idempotent re-declare is harmless
            scope.declare(node[1], _Func(node[1], node[2], node[3],
                                         self, scope))
            return UNDEFINED
        if t == "return":
            raise _ReturnSig(UNDEFINED if node[1] is None
                             else self._eval(node[1], scope))
        if t == "break":
            raise _BreakSig()
        if t == "continue":
            raise _ContinueSig()
        return self._eval(node, scope)  # expression statement

    def _decl(self, kind, decls, scope):
        for name, init in decls:
            val = UNDEFINED if init is None else self._eval(init, scope)
            if kind == "var":
                fs = scope.func_scope()
                if fs.parent is None and not fs.is_func:
                    # top-level var under with(record): the regex-nullified
                    # record property shadows the hoisted binding, so the
                    # assignment lands on the record (see module docstring)
                    if init is not None:
                        self.record[name] = val
                    elif name not in self.record:
                        fs.declare(name, UNDEFINED)
                else:
                    fs.declare(name, val)
            else:
                scope.declare(name, val, const=(kind == "const"))
        return UNDEFINED

    def _member(self, obj, name):
        if obj is None or obj is UNDEFINED:
            raise JSError(f"cannot read property {name!r} of {to_string(obj)}")
        if isinstance(obj, str):
            return _string_member(obj, name)
        if isinstance(obj, bool):
            return UNDEFINED
        if isinstance(obj, (int, float)):
            return _number_member(float(obj), name)
        if isinstance(obj, list):
            return _array_member(obj, name)
        if isinstance(obj, JSRegExp):
            if name == "test":
                return obj.test
            if name == "exec":
                return obj.exec
            if name == "source":
                return obj.source
            return UNDEFINED
        if isinstance(obj, dict):
            return obj.get(name, UNDEFINED)
        return UNDEFINED

    def _index(self, obj, idx):
        if isinstance(obj, (list, str)):
            if isinstance(idx, str) and not idx.lstrip("-").isdigit():
                return self._member(obj, idx)
            i = int(to_number(idx))
            if 0 <= i < len(obj):
                return obj[i]
            return UNDEFINED
        if isinstance(obj, dict):
            return obj.get(to_string(idx), UNDEFINED)
        return self._member(obj, to_string(idx))

    def _call(self, node, scope):
        callee = node[1]
        args = [self._eval(a, scope) for a in node[2]]
        if callee[0] == "member":
            obj = self._eval(callee[1], scope)
            fn = self._member(obj, callee[2])
            if fn is UNDEFINED or not callable(fn):
                raise JSError(f"{callee[2]} is not a function")
            return _call_fn(fn, args)
        fn = self._eval(callee, scope)
        if not callable(fn):
            raise JSError("not a function")
        return _call_fn(fn, args)

    def _bin(self, op, ln, rn, scope):
        if op == "&&":
            lv = self._eval(ln, scope)
            return self._eval(rn, scope) if truthy(lv) else lv
        if op == "||":
            lv = self._eval(ln, scope)
            return lv if truthy(lv) else self._eval(rn, scope)
        if op == "??":
            lv = self._eval(ln, scope)
            return self._eval(rn, scope) if lv is None or lv is UNDEFINED else lv
        a = self._eval(ln, scope)
        b = self._eval(rn, scope)
        if op == "+":
            if isinstance(a, str) or isinstance(b, str) \
                    or isinstance(a, (list, dict)) or isinstance(b, (list, dict)):
                return to_string(a) + to_string(b)
            return to_number(a) + to_number(b)
        if op == "-":
            return to_number(a) - to_number(b)
        if op == "*":
            return to_number(a) * to_number(b)
        if op == "/":
            x, y = to_number(a), to_number(b)
            if y == 0:
                if x == 0 or math.isnan(x):
                    return NAN
                return math.copysign(math.inf, x) * math.copysign(1.0, y)
            return x / y
        if op == "%":
            x, y = to_number(a), to_number(b)
            if y == 0 or math.isnan(x) or math.isnan(y) or math.isinf(x):
                return NAN
            if math.isinf(y):
                return x
            return math.fmod(x, y)  # JS % truncates toward zero
        if op == "**":
            return _js_pow(to_number(a), to_number(b))
        if op == "==":
            return loose_eq(a, b)
        if op == "!=":
            return not loose_eq(a, b)
        if op == "===":
            return strict_eq(a, b)
        if op == "!==":
            return not strict_eq(a, b)
        if op in ("<", ">", "<=", ">="):
            if isinstance(a, str) and isinstance(b, str):
                return {"<": a < b, ">": a > b,
                        "<=": a <= b, ">=": a >= b}[op]
            x, y = to_number(a), to_number(b)
            if math.isnan(x) or math.isnan(y):
                return False
            return {"<": x < y, ">": x > y, "<=": x <= y, ">=": x >= y}[op]
        if op == "&":
            return float(_to_int32(a) & _to_int32(b))
        if op == "|":
            return float(_to_int32(a) | _to_int32(b))
        if op == "^":
            return float(_to_int32(a) ^ _to_int32(b))
        if op == "in":
            if isinstance(b, dict):
                return to_string(a) in b
            if isinstance(b, (list, str)):
                n = to_number(a)
                return (not math.isnan(n) and n == int(n)
                        and 0 <= int(n) < len(b)) or \
                    (isinstance(a, str) and a == "length")
            raise JSError("'in' operand is not an object")
        if op == "<<":
            return float(_to_int32(_to_int32(a) << (_to_uint32(b) & 31)))
        if op == ">>":
            return float(_to_int32(a) >> (_to_uint32(b) & 31))
        if op == ">>>":
            return float(_to_uint32(a) >> (_to_uint32(b) & 31))
        raise JSError(f"unhandled operator {op}")

    def _unary(self, op, operand, scope):
        if op == "typeof":
            # typeof tolerates undefined variables (JS semantics)
            if operand[0] == "id":
                try:
                    v = self._lookup(operand[1], scope)
                except JSReferenceError:
                    return "undefined"
            else:
                v = self._eval(operand, scope)
            return js_typeof(v)
        v = self._eval(operand, scope)
        if op == "!":
            return not truthy(v)
        if op == "-":
            return -to_number(v)
        if op == "+":
            return to_number(v)
        if op == "~":
            return float(~_to_int32(v))
        raise JSError(f"unhandled unary {op}")

    def _update(self, op, target, prefix, scope):
        old = to_number(self._eval(target, scope))
        new = old + (1.0 if op == "++" else -1.0)
        self._store(target, new, scope)
        return new if prefix else old

    def _assign(self, op, target, value_node, scope):
        if op == "=":
            val = self._eval(value_node, scope)
        else:
            cur = self._eval(target, scope)
            rhs = self._eval(value_node, scope)
            val = self._apply_compound(op[:-1], cur, rhs)
        self._store(target, val, scope)
        return val

    def _apply_compound(self, op, a, b):
        if op == "+":
            if isinstance(a, str) or isinstance(b, str):
                return to_string(a) + to_string(b)
            return to_number(a) + to_number(b)
        if op == "-":
            return to_number(a) - to_number(b)
        if op == "*":
            return to_number(a) * to_number(b)
        if op == "/":
            y = to_number(b)
            return to_number(a) / y if y != 0 else (
                NAN if to_number(a) == 0 else math.copysign(math.inf, to_number(a)))
        if op == "%":
            y = to_number(b)
            return math.fmod(to_number(a), y) if y != 0 else NAN
        if op == "**":
            return _js_pow(to_number(a), to_number(b))
        raise JSError(f"unhandled compound {op}")

    def _store(self, target, val, scope):
        t = target[0]
        if t == "id":
            name = target[1]
            # bare-name assignment writes a data field (the reference's
            # getAssignedVars contract: assigned vars become columns);
            # declared locals / params shadow and stay local
            s = scope.find(name)
            if s is not None:
                if s.consts and name in s.consts:
                    raise JSError(
                        f"Assignment to constant variable {name!r}")
                s.vars[name] = val
            else:
                self.record[name] = val
            return
        if t == "member":
            obj = self._eval(target[1], scope)
            if isinstance(obj, dict):
                obj[target[2]] = val
                return
            raise JSError(f"cannot set property {target[2]!r}")
        if t == "index":
            obj = self._eval(target[1], scope)
            idx = self._eval(target[2], scope)
            if isinstance(obj, list):
                i = int(to_number(idx))
                while len(obj) <= i:
                    obj.append(UNDEFINED)
                obj[i] = val
                return
            if isinstance(obj, dict):
                obj[to_string(idx)] = val
                return
        raise JSError("invalid assignment target")

    def run(self, ast):
        g = _Scope(None)
        try:
            return self._exec_block(ast[1], g)
        except _ReturnSig as r:  # top-level return: the reference's
            return r.value       # function body accepts it
        except RecursionError:
            raise JSError("maximum call stack size exceeded")


def evaluate(src_or_ast, record: dict | None = None,
             env: dict | None = None):
    """Evaluate a JS expression program against a feature record.
    Returns the residual value (the last statement's value, like the
    reference's compileValueExpression). ``record`` is mutated by
    assignments."""
    ast = parse(src_or_ast) if isinstance(src_or_ast, str) else src_or_ast
    return _Interp({} if record is None else record, env).run(ast)


def run_program(src_or_ast, record: dict, env: dict | None = None):
    """Evaluate and return (residual value, record) — each_js's entry."""
    ast = parse(src_or_ast) if isinstance(src_or_ast, str) else src_or_ast
    interp = _Interp(record, env)
    return interp.run(ast), record


# ---------------------------------------------------------------------------
# static analysis — getAssignedVars / getAssignmentObjects parity
# (/root/reference/src/data/mapshaper-expressions.js, expressions-test.js)
# ---------------------------------------------------------------------------

def _walk(node):
    yield node
    for child in node[1:]:
        if isinstance(child, tuple):
            yield from _walk(child)
        elif isinstance(child, list):
            for c in child:
                if isinstance(c, tuple):
                    yield from _walk(c)
                elif isinstance(c, (list, tuple)) and len(c) == 2 \
                        and isinstance(c[1], tuple):
                    yield from _walk(c[1])  # object property (key, value)


def assigned_vars(src: str, dot_assignments: bool = False) -> list:
    """Names assigned in the expression, in first-appearance order.
    dot_assignments=False -> bare identifiers ('foo=1' -> ['foo']);
    True -> dotted targets ('d.a = 1' -> ['d.a']). Chained assignments
    (foo=bar=1) report every target; repeats are deduped. Mirrors the
    reference's getAssignedVars (expressions-test.js cases)."""
    out: list = []
    for node in _walk(parse(src)):
        # all assignment FORMS count: plain '=', compound '+='/'-='/...,
        # and '++'/'--' updates. (The reference's regex only sees plain
        # '=', but its with(record) closure persists every write anyway —
        # our writeback copies exactly these names, so missing a form
        # would silently drop the mutation: 'total += x' must stick.)
        if node[0] == "assign":
            tgt = node[2]
        elif node[0] == "update":
            tgt = node[2]
        elif node[0] == "decl":
            # the reference regex matches 'name =' even in declarations
            # (var x = 1 -> x null-initialized as a column; see module
            # docstring); decls WITHOUT initializers don't match
            if not dot_assignments:
                for name, init in node[2]:
                    if init is not None and name not in out:
                        out.append(name)
            continue
        else:
            continue
        if not dot_assignments and tgt[0] == "id":
            if tgt[1] not in out:
                out.append(tgt[1])
        elif dot_assignments and tgt[0] == "member" and tgt[1][0] == "id":
            name = f"{tgt[1][1]}.{tgt[2]}"
            if name not in out:
                out.append(name)
    return out


def assignment_objects(src: str) -> list:
    """Base objects of dotted assignments, excluding ``this`` —
    getAssignmentObjects parity ('d.a=1, a.c=2' -> ['d', 'a'])."""
    out: list = []
    for node in _walk(parse(src)):
        if node[0] != "assign" or node[1] != "=":
            continue
        tgt = node[2]
        # walk down nested members to the base identifier
        base = tgt
        while base[0] in ("member", "index"):
            base = base[1]
        if tgt[0] in ("member", "index") and base[0] == "id" \
                and base[1] != "this":
            if base[1] not in out:
                out.append(base[1])
    return out


def mutated_scope_objects(src: str) -> list:
    """Base identifiers of EVERY mutation through a member/index target —
    plain '=', compound '+='/'-='/…, and '++'/'--' updates — excluding
    ``this``. Broader than ``assignment_objects`` (which mirrors the
    reference's plain-'=' regex): used to detect the include-accumulator
    idiom (include-test.js 'can be used as an accumulator'), where
    ``counts[type] = …`` / ``totals.n += 1`` mutate a shared include
    object across records."""
    out: list = []
    for node in _walk(parse(src)):
        if node[0] in ("assign", "update"):
            tgt = node[2]
        else:
            continue
        base = tgt
        while base[0] in ("member", "index"):
            base = base[1]
        if tgt[0] in ("member", "index") and base[0] == "id" \
                and base[1] != "this":
            if base[1] not in out:
                out.append(base[1])
    return out


# ---------------------------------------------------------------------------
# expressionUtils: round() and sprintf() (the reference injects
# internal.expressionUtils into every feature-expression scope, both bare
# and as `_` — src/expressions/mapshaper-expression-utils.js +
# lib/mbloch-utils.js Utils.formatter/formatValue/addThousandsSep)
# ---------------------------------------------------------------------------

_FMT_CODE_RXP = __import__("re").compile(
    r"%([',+0]*)([1-9]?)((?:\.[1-9])?)([sdifxX%])")


def _js_round_util(val=UNDEFINED, dig=UNDEFINED):
    """expressionUtils.round: Math.round(val * 10^dig) / 10^dig with the
    JS `dig | 0` coercion (undefined/NaN -> 0)."""
    v = to_number(val)
    d = to_number(dig) if dig is not UNDEFINED else 0.0
    d = 0 if math.isnan(d) or math.isinf(d) else int(d)
    k = 1
    while d > 0:
        k *= 10
        d -= 1
    return math.floor(v * k + 0.5) / k  # JS Math.round: half toward +inf


def _add_thousands_sep(s: str) -> str:
    """Utils.addThousandsSep (mbloch-utils.js:426-438)."""
    start = 1 if s[:1] == "-" else 0
    dec = s.find(".")
    end = len(s)
    ins = (end if dec == -1 else dec) - 3
    fmt = ""
    while ins > start:
        fmt = "," + s[ins:end] + fmt
        end = ins
        ins -= 3
    return s[:end] + fmt


def _format_value(val, flags: str, padding: str, dec: str, typ: str) -> str:
    """Utils.formatValue (mbloch-utils.js:1289-1351), including the U+2212
    minus sign and the documented sign-at-zero behavior."""
    decimals = int(dec[1:]) if dec else None
    sign = ""
    if typ == "s":
        s = to_string(val)
    elif typ in ("x", "X"):
        n = int(to_number(val))
        s = format(n, "x")
        if typ == "X":
            s = s.upper()
    else:
        n = to_number(val)
        if typ in ("d", "i"):
            s = f"%.0f" % n
        elif decimals is not None:
            s = f"%.{decimals}f" % n
        else:
            s = to_string(n)
        neg = s.startswith("-")
        if neg:
            s = s[1:]
        is_zero = float(s) == 0
        if "'" in flags or "," in flags:
            s = _add_thousands_sep(s)
        if not is_zero:
            if neg:
                sign = "−"
            elif "+" in flags:
                sign = "+"
    pad_str = ""
    pad_char = " "
    if padding:
        min_width = int(padding)
        str_len = len(s) + len(sign)
        if str_len < min_width:
            pad_char = "0" if "0" in flags else " "
            pad_str = pad_char * (min_width - str_len)
    if not pad_str:
        return sign + s
    if pad_char == "0":
        return sign + pad_str + s
    return pad_str + sign + s


def _js_sprintf(fmt=UNDEFINED, *args):
    """expressionUtils.sprintf = Utils.format (formatter at
    mbloch-utils.js:1354+): %[flags][width][.dec][sdifxX%] with ','/'''
    thousands flags; %% is a literal percent."""
    fmt = to_string(fmt)
    out = []
    last = 0
    ai = 0
    for m in _FMT_CODE_RXP.finditer(fmt):
        out.append(fmt[last:m.start()])
        last = m.end()
        if m.group(0) == "%%":
            out.append("%")
            continue
        val = args[ai] if ai < len(args) else UNDEFINED
        ai += 1
        out.append(_format_value(val, m.group(1), m.group(2),
                                 m.group(3), m.group(4)))
    out.append(fmt[last:])
    return "".join(out)


_EXPRESSION_UTILS = {"round": _js_round_util, "sprintf": _js_sprintf}
