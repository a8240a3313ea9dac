"""Differential testing: the SQL expression translation and the JS
interpreter must AGREE on the shared expression surface.

The engine has two expression paths — translate-to-Spark-SQL (the default,
JVM codegen: functions/expressions.py) and interpret-the-JS-per-row (the
fallback: functions/jsengine.py). Any place they disagree on an expression
both claim to support is a wrong answer waiting for whichever path a user
lands on, so this test generates a few hundred seeded-random expressions
from the shared grammar, evaluates every one through BOTH engines over the
same rows (one Spark select for all SQL columns; the interpreter runs
driver-side on the same pandas frame), and requires value-for-value
equality.

Known, documented divergences are excluded from the grammar rather than
special-cased in the comparison: Math.round at negative exact halves (JS
rounds toward +inf, SQL away from zero), toFixed (formatter rounding
modes), split()[k] for out-of-range k (SQL split_part yields '', JS
yields undefined), '+' as string concatenation (JS-only), null-propagation
differences (JS throws on null.method()).
"""

import math
import random

import pytest


def _normalize(v):
    """NaN and None unify (the engines agree NaN has no JSON image);
    floats round for comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    return v


class _Gen:
    """Seeded-random expression generator over the shared surface.
    Fields: name/mkt (strings), age/qty (numbers)."""

    STR_FIELDS = ["name", "mkt"]
    NUM_FIELDS = ["age", "qty"]

    def __init__(self, seed):
        self.r = random.Random(seed)

    def str_lit(self):
        return repr(self.r.choice(["x", "Ab", "#", " ", "-", "0", "zz"]))

    def int_lit(self, lo=0, hi=4):
        return str(self.r.randint(lo, hi))

    def str_expr(self, depth=2):
        base = self.r.choice(self.STR_FIELDS)
        if depth <= 0:
            return base
        e = self.str_expr(depth - 1)
        return self.r.choice([
            lambda: f"{e}.toUpperCase()",
            lambda: f"{e}.toLowerCase()",
            lambda: f"{e}.trim()",
            lambda: f"{e}.charAt({self.int_lit()})",
            lambda: f"{e}.substr({self.int_lit()}, {self.int_lit(1, 5)})",
            lambda: f"{e}.concat({self.str_lit()})",
            lambda: f"{e}.replace({self.str_lit()}, {self.str_lit()})",
            lambda: f"{e}.padStart({self.int_lit(1, 12)})",
            lambda: f"{e}.padEnd({self.int_lit(1, 12)})",
            lambda: f"{base}.split(' ')[0]",
            lambda: base,
        ])()

    def num_expr(self, depth=2):
        if depth <= 0:
            return self.r.choice(self.NUM_FIELDS + [self.int_lit(1, 9)])
        a = self.num_expr(depth - 1)
        b = self.num_expr(depth - 1)
        s = self.str_expr(1)
        return self.r.choice([
            lambda: f"({a} + {b})",
            lambda: f"({a} - {b})",
            lambda: f"({a} * {b})",
            lambda: f"Math.abs({a})",
            lambda: f"Math.floor({a})",
            lambda: f"Math.ceil({a})",
            lambda: f"Math.round(Math.abs({a}))",
            lambda: f"Math.min({a}, {b})",
            lambda: f"Math.max({a}, {b})",
            lambda: f"Math.sqrt(Math.abs({a}))",
            lambda: f"{s}.indexOf({self.str_lit()})",
        ])()

    def bool_expr(self):
        a = self.num_expr(1)
        b = self.num_expr(1)
        s = self.str_expr(1)
        return self.r.choice([
            lambda: f"({a} < {b})",
            lambda: f"({a} >= {b})",
            lambda: f"{s}.includes({self.str_lit()})",
            lambda: f"{s}.startsWith({self.str_lit()})",
            lambda: f"{s}.endsWith({self.str_lit()})",
            lambda: f"({self.bool_sub()} && {self.bool_sub()})",
            lambda: f"({self.bool_sub()} || {self.bool_sub()})",
        ])()

    def bool_sub(self):
        return f"({self.num_expr(0)} < {self.num_expr(0)})"

    def expr(self):
        return self.r.choice([self.str_expr, self.num_expr,
                              self.bool_expr])()


ROWS = [
    (0, "Ada Lovelace", "BUILDING", 36.25, 3),
    (1, "alan turing  ", "auto", 41.0, 0),
    (2, "", "MACHINERY", 0.0, 7),
    (3, "X", "house#hold", -12.5, 2),
    (4, "a b c d", " FURNITURE ", 7.75, 9),
]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_sql_and_js_engines_agree(spark, seed):
    from pyspark.sql import functions as F

    from mapshaper_spark.functions.expressions import \
        translate_proxy_expression
    from mapshaper_spark.functions.jsengine import evaluate

    gen = _Gen(seed)
    exprs = [gen.expr() for _ in range(80)]
    df = spark.createDataFrame(
        ROWS, "fid int, name string, mkt string, age double, qty int")

    cols = [F.col("fid")]
    for i, e in enumerate(exprs):
        cols.append(F.expr(translate_proxy_expression(e)).alias(f"e{i}"))
    sql_rows = {r["fid"]: r.asDict() for r in df.select(*cols).collect()}

    mismatches = []
    for fid, name, mkt, age, qty in ROWS:
        record = {"fid": float(fid), "name": name, "mkt": mkt,
                  "age": age, "qty": float(qty)}
        for i, e in enumerate(exprs):
            js = _normalize(evaluate(e, dict(record)))
            sql = _normalize(sql_rows[fid][f"e{i}"])
            if isinstance(js, bool) or isinstance(sql, bool):
                ok = bool(js) == bool(sql)
            elif isinstance(js, float) and isinstance(sql, (int, float)):
                ok = abs(js - float(sql)) < 1e-6 * max(1.0, abs(js))
            else:
                ok = js == sql
            if not ok:
                mismatches.append((e, fid, js, sql))
    assert not mismatches, mismatches[:10]
