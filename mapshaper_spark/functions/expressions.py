"""The reference's expression surface as registered Spark SQL functions.

mapshaper compiles arbitrary JS strings with a ``$`` feature proxy
(/root/reference/src/data/mapshaper-expressions.js:140-162; getters
/root/reference/src/data/mapshaper-feature-proxy.js:15-117: id, area,
planarArea, originalArea, centroidX/Y, innerX/Y, bounds, width, height,
partCount, isNull, x, y) plus tiny utils (round, sprintf —
mapshaper-expression-utils.js:3-11).

We do not embed a JS engine (documented API difference, SURVEY §7 risk
register): expressions are Spark SQL strings, and the ``$`` getters become
SQL functions over the geometry columns, registered once per session:

    ms_area(rings_x, rings_y)       signed planar shape area (sum of rings)
    ms_perimeter(rings_x, rings_y)  planar length of all rings
    ms_centroid_x / ms_centroid_y   largest-ring centroid
    ms_part_count(rings_x)          number of rings
    ms_width / ms_height            bbox extent
    ms_round(v, digits)             expression-utils round

``translate_proxy_expression`` rewrites the common ``$.getter`` spellings
into those calls so reference expressions port mechanically.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from mapshaper_spark.geom import kernels as K


@pandas_udf(T.DoubleType())
def _ms_area(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None:
            out.append(None)
            continue
        out.append(sum(K.planar_path_area(np.asarray(rx, dtype=np.float64),
                                          np.asarray(ry, dtype=np.float64))
                       for rx, ry in zip(rxs, rys)))
    return pd.Series(out, dtype="float64")


@pandas_udf(T.DoubleType())
def _ms_perimeter(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None:
            out.append(None)
            continue
        out.append(sum(K.path_length_planar(np.asarray(rx, dtype=np.float64),
                                            np.asarray(ry, dtype=np.float64))
                       for rx, ry in zip(rxs, rys)))
    return pd.Series(out, dtype="float64")


def _largest_ring_centroid(rings_x, rings_y, axis: int):
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None or len(rxs) == 0:
            out.append(None)
            continue
        best, best_area = None, -1.0
        for rx, ry in zip(rxs, rys):
            a = abs(K.planar_path_area(np.asarray(rx), np.asarray(ry)))
            if a > best_area:
                best_area = a
                best = (np.asarray(rx, dtype=np.float64),
                        np.asarray(ry, dtype=np.float64))
        c = K.path_centroid(*best)
        out.append(None if c is None else c[axis])
    return pd.Series(out, dtype="float64")


@pandas_udf(T.DoubleType())
def _ms_centroid_x(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    return _largest_ring_centroid(rings_x, rings_y, 0)


@pandas_udf(T.DoubleType())
def _ms_centroid_y(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    return _largest_ring_centroid(rings_x, rings_y, 1)


@pandas_udf(T.DoubleType())
def _ms_spherical_area(rings_x: pd.Series, rings_y: pd.Series) -> pd.Series:
    out = []
    for rxs, rys in zip(rings_x, rings_y):
        if rxs is None:
            out.append(None)
            continue
        out.append(sum(K.spherical_path_area(np.asarray(rx, dtype=np.float64),
                                             np.asarray(ry, dtype=np.float64))
                       for rx, ry in zip(rxs, rys)))
    return pd.Series(out, dtype="float64")


def register_geometry_functions(spark: SparkSession) -> None:
    spark.udf.register("ms_area", _ms_area)
    spark.udf.register("ms_spherical_area", _ms_spherical_area)
    spark.udf.register("ms_perimeter", _ms_perimeter)
    spark.udf.register("ms_centroid_x", _ms_centroid_x)
    spark.udf.register("ms_centroid_y", _ms_centroid_y)


_PROXY_MAP = {
    r"\$\.area": "ms_area(rings_x, rings_y)",
    r"\$\.planarArea": "ms_area(rings_x, rings_y)",
    r"\$\.centroidX": "ms_centroid_x(rings_x, rings_y)",
    r"\$\.centroidY": "ms_centroid_y(rings_x, rings_y)",
    r"\$\.partCount": "size(rings_x)",
    r"\$\.width": "(bbox.xmax - bbox.xmin)",
    r"\$\.height": "(bbox.ymax - bbox.ymin)",
    r"\$\.isNull": "(rings_x IS NULL OR size(rings_x) = 0)",
    r"\$\.x": "x",
    r"\$\.y": "y",
    r"\$\.id": "fid",
}


# JS method -> SQL function rewrites. The receiver pattern matches an
# identifier chain optionally ending in one call (arguments may nest calls
# three levels deep — enough for any chained rewrite, since each fixpoint
# pass wraps at most one more level) — applied to a FIXPOINT so chains like
# name.trim().toUpperCase().split('-')[0] rewrite inside-out. This is the
# documented expression-surface strategy (no JS engine; the translator
# covers the reference test corpus's JS idioms as SQL).
_ARGS1 = r"\((?:[^()]|\([^()]*\))*\)"            # calls nested <= 2 deep
_ARGS2 = r"\((?:[^()]|" + _ARGS1 + r")*\)"       # calls nested <= 3 deep
# the lookbehind stops a receiver from matching mid-chain (e.g. grabbing
# only "toUpperCase()" out of "s.trim().toUpperCase().split(...)")
_RECV = r"(?<![.\w])((?:\w+\.)*\w+(?:" + _ARGS2 + r")?)"
# a method-argument list: paren-balanced (nested calls allowed), so e.g.
# name.indexOf(substr(a, 1, 2)) captures the whole nested call
_ARG = r"((?:[^()]|" + _ARGS1 + r")+)"


def _first_arg(args: str) -> str:
    """First element of a TOP-LEVEL comma-separated argument list — a bare
    ``split(',')`` breaks on computed widths like ``padStart(Math.max(2,3),
    '0')``.  String literals are already \\x00-shielded, so only paren
    depth matters."""
    depth = 0
    for i, ch in enumerate(args):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            return args[:i]
    return args


_JS_METHODS = [
    # indexing a split: bar.split(",")[0] -> split_part(bar, ',', 1)
    # (string literals are shielded to \x00k\x00 placeholders by the time
    # these run; the placeholder restores to the original quoted literal)
    (re.compile(_RECV + r"\.split\((\x00\d+\x00)\)\[(\d+)\]"),
     lambda m: f"split_part({m.group(1)}, {m.group(2)}, {int(m.group(3)) + 1})"),
    # JS substr(start, len) is 0-based; SQL substr is 1-based
    (re.compile(_RECV + r"\.substr\(\s*(\d+)\s*,\s*(\d+)\s*\)"),
     lambda m: f"substr({m.group(1)}, {int(m.group(2)) + 1}, {m.group(3)})"),
    (re.compile(_RECV + r"\.substring\(\s*(\d+)\s*,\s*(\d+)\s*\)"),
     lambda m: f"substr({m.group(1)}, {int(m.group(2)) + 1}, "
               f"{int(m.group(3)) - int(m.group(2))})"),
    (re.compile(_RECV + r"\.charAt\(\s*(\d+)\s*\)"),
     lambda m: f"substr({m.group(1)}, {int(m.group(2)) + 1}, 1)"),
    (re.compile(_RECV + r"\.toUpperCase\(\)"), lambda m: f"upper({m.group(1)})"),
    (re.compile(_RECV + r"\.toLowerCase\(\)"), lambda m: f"lower({m.group(1)})"),
    (re.compile(_RECV + r"\.trim\(\)"), lambda m: f"trim({m.group(1)})"),
    (re.compile(_RECV + r"\.indexOf\(" + _ARG + r"\)"),
     lambda m: f"(instr({m.group(1)}, {m.group(2)}) - 1)"),
    (re.compile(_RECV + r"\.includes\(" + _ARG + r"\)"),
     lambda m: f"(instr({m.group(1)}, {m.group(2)}) > 0)"),
    (re.compile(_RECV + r"\.startsWith\(" + _ARG + r"\)"),
     lambda m: f"startswith({m.group(1)}, {m.group(2)})"),
    (re.compile(_RECV + r"\.endsWith\(" + _ARG + r"\)"),
     lambda m: f"endswith({m.group(1)}, {m.group(2)})"),
    # JS padStart/padEnd never TRUNCATE a string already >= the target
    # width (lpad/rpad do) — guard with IF
    (re.compile(_RECV + r"\.padStart\(" + _ARG + r"\)"),
     lambda m: (f"IF(length({m.group(1)}) >= ({_first_arg(m.group(2))}), "
                f"{m.group(1)}, lpad({m.group(1)}, {m.group(2)}))")),
    (re.compile(_RECV + r"\.padEnd\(" + _ARG + r"\)"),
     lambda m: (f"IF(length({m.group(1)}) >= ({_first_arg(m.group(2))}), "
                f"{m.group(1)}, rpad({m.group(1)}, {m.group(2)}))")),
    (re.compile(_RECV + r"\.concat\(" + _ARG + r"\)"),
     lambda m: f"concat({m.group(1)}, {m.group(2)})"),
    # toFixed returns a STRING in JS -> printf-style formatting
    (re.compile(_RECV + r"\.toFixed\(\s*(\d+)\s*\)"),
     lambda m: f"format_string('%.{m.group(2)}f', cast({m.group(1)} as double))"),
    # JS String.replace with STRING-literal find/replacement replaces the
    # FIRST occurrence only — spelled out via instr/substr (regex or
    # non-literal finds stay untranslated; documented surface edge)
    (re.compile(_RECV + r"\.replace\((\x00\d+\x00)\s*,\s*(\x00\d+\x00)\)"),
     lambda m: (f"IF(instr({m.group(1)}, {m.group(2)}) > 0, "
                f"concat(substr({m.group(1)}, 1, instr({m.group(1)}, {m.group(2)}) - 1), "
                f"{m.group(3)}, "
                f"substr({m.group(1)}, instr({m.group(1)}, {m.group(2)}) + length({m.group(2)}))), "
                f"{m.group(1)})")),
]

# JS regex literal: /body/flags (flags restricted to the real JS set so a
# division chain like a/b/c.test(x) can't false-positive as a regex)
_REGEX_LIT = r"/((?:[^/\\\r\n]|\\.)+)/([gimsuy]*)"


def _regex_to_sql_pattern(body: str, flags: str) -> str:
    """JS regex literal -> single-quoted Java-regex SQL string. i/m/s flags
    become inline (?i)(?m)(?s); g is positional (handled by the caller).
    Backslashes are doubled because Spark's SQL parser processes escape
    sequences inside string literals ('\\d' would otherwise reach the
    regex engine as plain 'd')."""
    body = body.replace("\\/", "/").replace("\\", "\\\\")
    pre = "".join(f"(?{f})" for f in "ims" if f in flags)
    return "'" + (pre + body).replace("'", "''") + "'"


def _rewrite_regex_methods(expr: str) -> str:
    """JS regex-method idioms -> SQL regexp functions. Runs on the RAW
    expression (before string shielding) so regex bodies containing quote
    characters survive; the generated single-quoted patterns are then
    shielded like any literal. Covered: X.match(/re/)[n], X.match(/re/),
    /re/.test(X), X.search(/re/), X.split(/re/)[n], X.split(/re/),
    X.replace(/re/g, r) global and X.replace(/re/, r) first-occurrence
    (via regexp_instr + the matched text's true position/length)."""

    def _p(m):  # pattern string from (body, flags) at groups 2,3
        return _regex_to_sql_pattern(m.group(2), m.group(3))

    def _replace_fn(m):
        recv, rep = m.group(1), m.group(4)
        p = _regex_to_sql_pattern(m.group(2), m.group(3))
        if "g" in m.group(3):
            return f"regexp_replace({recv}, {p}, {rep})"
        return (f"IF(regexp_instr({recv}, {p}) > 0, "
                f"concat(substr({recv}, 1, regexp_instr({recv}, {p}) - 1), "
                f"{rep}, substr({recv}, regexp_instr({recv}, {p}) + "
                f"length(regexp_extract({recv}, {p}, 0)))), {recv})")

    subs = [
        (re.compile(_RECV + r"\.match\(" + _REGEX_LIT + r"\)\[(\d+)\]"),
         lambda m: f"regexp_extract({m.group(1)}, {_p(m)}, {int(m.group(4))})"),
        # bare .match() is almost always a truthiness test in the corpus
        (re.compile(_RECV + r"\.match\(" + _REGEX_LIT + r"\)"),
         lambda m: f"regexp_like({m.group(1)}, {_p(m)})"),
        (re.compile(_REGEX_LIT + r"\.test\(" + _ARG + r"\)"),
         lambda m: (f"regexp_like({m.group(3)}, "
                    f"{_regex_to_sql_pattern(m.group(1), m.group(2))})")),
        # JS search: -1 when absent, 0-based position otherwise;
        # regexp_instr: 0 when absent, 1-based position otherwise
        (re.compile(_RECV + r"\.search\(" + _REGEX_LIT + r"\)"),
         lambda m: f"(regexp_instr({m.group(1)}, {_p(m)}) - 1)"),
        # Spark SQL's split() is regex-based and [] is 0-based, same as JS
        (re.compile(_RECV + r"\.split\(" + _REGEX_LIT + r"\)"),
         lambda m: f"split({m.group(1)}, {_p(m)})"),
        (re.compile(_RECV + r"\.replace\(" + _REGEX_LIT +
                    r"\s*,\s*" + _ARG + r"\)"), _replace_fn),
    ]
    for pat, fn in subs:
        expr = pat.sub(fn, expr)
    return expr


_MATH_MAP = {
    "Math.round": "round", "Math.floor": "floor", "Math.ceil": "ceil",
    "Math.abs": "abs", "Math.sqrt": "sqrt", "Math.pow": "power",
    "Math.min": "least", "Math.max": "greatest", "Math.log": "ln",
    "Math.exp": "exp", "Math.sin": "sin", "Math.cos": "cos",
    "Math.tan": "tan", "Math.atan2": "atan2", "Math.sign": "sign",
}


def _rewrite_ternary(s: str) -> str:
    """cond ? a : b -> IF(cond, a, b), right-associative, quote/paren-aware.
    Handles ternaries at the top level of the expression and (recursively)
    inside each branch; a ternary buried inside a function-call argument is
    out of scope (not present in the reference corpus)."""
    depth = 0
    quote = None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch == "?" and depth == 0:
            # find the matching top-level ':' (skip nested ternaries)
            nest = 0
            d2 = 0
            q2 = None
            for j in range(i + 1, len(s)):
                cj = s[j]
                if q2:
                    if cj == q2:
                        q2 = None
                    continue
                if cj in "'\"":
                    q2 = cj
                elif cj in "([{":
                    d2 += 1
                elif cj in ")]}":
                    d2 -= 1
                elif cj == "?" and d2 == 0:
                    nest += 1
                elif cj == ":" and d2 == 0:
                    if nest == 0:
                        cond = s[:i].strip()
                        then = _rewrite_ternary(s[i + 1:j].strip())
                        els = _rewrite_ternary(s[j + 1:].strip())
                        return f"IF({cond}, {then}, {els})"
                    nest -= 1
            break
    # no top-level ternary: a fully-parenthesized expression may hide one
    if s.startswith("(") and s.endswith(")"):
        d3 = 0
        q3 = None
        for k, ck in enumerate(s):
            if q3:
                if ck == q3:
                    q3 = None
                continue
            if ck in "'\"":
                q3 = ck
            elif ck in "([{":
                d3 += 1
            elif ck in ")]}":
                d3 -= 1
                if d3 == 0:
                    if k == len(s) - 1:
                        return "(" + _rewrite_ternary(s[1:-1]) + ")"
                    break
    return s


def _shield_strings(expr: str) -> tuple[str, list[str]]:
    """Replace quoted string literals with \\x00k\\x00 placeholders so the
    JS->SQL replace passes (&&, ||, null, Math.*, method rewrites) can't
    rewrite text INSIDE a literal like 'a && b'. Backslash escapes are
    honored; the placeholder restores to the original literal verbatim."""
    toks: list[str] = []
    out: list[str] = []
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch in "'\"":
            j = i + 1
            while j < n:
                if expr[j] == "\\":
                    j += 2
                    continue
                if expr[j] == ch:
                    break
                j += 1
            out.append(f"\x00{len(toks)}\x00")
            toks.append(expr[i:j + 1] if j < n else expr[i:])
            i = j + 1
        else:
            out.append(ch)
            i += 1
    return "".join(out), toks


def _restore_strings(expr: str, toks: list[str]) -> str:
    def _sql_literal(tok: str) -> str:
        # normalize JS double-quoted literals to SQL single-quoted form
        # (ANSI SQL treats double quotes as identifiers; content is kept
        # verbatim, single quotes inside escaped by doubling)
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            body = tok[1:-1].replace('\\"', '"').replace("'", "''")
            return f"'{body}'"
        return tok

    return re.sub(r"\x00(\d+)\x00",
                  lambda m: _sql_literal(toks[int(m.group(1))]), expr)


def translate_proxy_expression(expr: str) -> str:
    """Rewrite mapshaper ``$.getter`` spellings AND the JS idioms of the
    reference's expression corpus (string methods, Math.*, ternaries,
    ===/&&/||, null) to Spark SQL. Plain SQL passes through unchanged.
    String literals are shielded first so their contents are never
    rewritten.

    Known semantic edges (documented, not silently wrong): JS
    String.replace maps to a first-occurrence instr/substr form for
    string-LITERAL find/replacement (regex literals map to regexp_replace
    when /g, else a regexp_instr first-occurrence form; COMPUTED finds stay
    untranslated); Math.round(-0.5) differs (JS rounds toward +inf, SQL
    half-away-from-zero); a quoted string that itself contains regex-method
    syntax like '.match(/x/)' would be rewritten (the inverse trade keeps
    quotes inside real regex bodies working)."""
    expr = _rewrite_regex_methods(expr)
    expr, _strs = _shield_strings(expr)
    for pat, repl in _PROXY_MAP.items():
        expr = re.sub(pat, repl, expr)
        # `this` is the same feature proxy as `$` (the reference invokes
        # the compiled function with func.call(ctx.$, ...),
        # mapshaper-expressions.js:156), so this.area == $.area
        expr = re.sub(pat.replace(r"\$", r"\bthis"), repl, expr)
    # method rewrites to a fixpoint (chained calls resolve inside-out)
    changed = True
    while changed:
        changed = False
        for pat, fn in _JS_METHODS:
            new = pat.sub(fn, expr)
            if new != expr:
                expr = new
                changed = True
    for js, sql in _MATH_MAP.items():
        expr = expr.replace(js + "(", sql + "(")
    expr = expr.replace("Math.PI", "pi()")
    expr = expr.replace("===", "=").replace("!==", "<>")
    expr = expr.replace("&&", " AND ").replace("||", " OR ")
    expr = re.sub(r"\bundefined\b", "NULL", expr)
    expr = re.sub(r"\bnull\b", "NULL", expr)
    # JS loose/strict null comparisons are IS [NOT] NULL in SQL
    expr = re.sub(r"(?:<>|!=)\s*NULL", " IS NOT NULL", expr)
    expr = re.sub(r"(?<![!<>=])==?\s*NULL", " IS NULL", expr)
    return _restore_strings(_rewrite_ternary(expr), _strs)


def parse_assignments(expression: str):
    """Split a mapshaper-style -each expression string into ordered
    (name, rhs) assignment pairs (the reference's getAssignedVars,
    /root/reference/src/data/mapshaper-expressions.js:115-123): top-level
    commas and semicolons separate assignments; '=' not part of
    ==/!=/<=/>= binds a new or existing variable. Non-assignment segments
    are rejected."""
    out = []
    depth = 0
    quote = None
    seg = []
    segs = []
    for ch in expression:
        if quote:
            if ch == quote:
                quote = None
            seg.append(ch)
            continue
        if ch in "'\"":
            quote = ch
            seg.append(ch)
        elif ch in "([{":
            depth += 1
            seg.append(ch)
        elif ch in ")]}":
            depth -= 1
            seg.append(ch)
        elif ch in ",;" and depth == 0:
            segs.append("".join(seg))
            seg = []
        else:
            seg.append(ch)
    segs.append("".join(seg))
    assign_re = re.compile(
        r"^\s*([A-Za-z_][A-Za-z_0-9]*)\s*=(?![=])\s*(.+)$", re.S)
    for s in segs:
        if not s.strip():
            continue
        m = assign_re.match(s)
        if not m:
            raise ValueError(f"expected an assignment, got: {s.strip()!r}")
        out.append((m.group(1), m.group(2).strip()))
    return out


def each_expr(df, expression: str, where: str | None = None):
    """-each with a mapshaper-style assignment-string expression
    ('B = A*2, C = B+1'): assignments apply SEQUENTIALLY, so later ones see
    earlier results (the reference evaluates the whole JS expression per
    record — sequential withColumn is the same dataflow). $.getter
    spellings are translated; with where=, non-matching rows keep the old
    value (null for new columns)."""
    from mapshaper_spark.operators.attributes import each
    for name, rhs in parse_assignments(expression):
        df = each(df, {name: translate_proxy_expression(rhs)}, where=where)
    return df
