"""The JS interpreter fallback (functions/jsengine.py, operators/jseach.py).

Three layers:
  1. interpreter semantics — JS value/coercion/method behavior, golden
     values from the language spec;
  2. reference parity — expressions-test.js transcriptions
     (getAssignedVars / getAssignmentObjects / compileValueExpression);
  3. Spark integration — each_js / filter_js agree with the SQL
     translation on the shared surface and extend it beyond (arrow
     functions, multi-statement programs), plus the CLI fallback.
"""

import math

import pytest

from mapshaper_spark.functions.jsengine import (
    UNDEFINED, JSError, JSReferenceError, JSSyntaxError, assigned_vars,
    assignment_objects, evaluate, run_program,
)


def ev(src, record=None, env=None):
    return evaluate(src, {} if record is None else record, env)


class TestValueSemantics:
    @pytest.mark.parametrize("src,want", [
        ("1 + 2 * 3", 7.0),
        ("2 ** 10", 1024.0),
        ("-7 % 3", -1.0),           # JS % truncates toward zero
        ("7 % -3", 1.0),
        ("1 / 0", math.inf),
        ("-1 / 0", -math.inf),
        ("5 & 3", 1.0),
        ("5 | 2", 7.0),
        ("5 ^ 1", 4.0),
        ("~5", -6.0),
        ("1 << 4", 16.0),
        ("-8 >> 1", -4.0),
        ("-1 >>> 28", 15.0),
    ])
    def test_arithmetic(self, src, want):
        assert ev(src) == want

    @pytest.mark.parametrize("src,want", [
        ('"x" + 1', "x1"),
        ('1 + "x"', "1x"),
        ('"3" * "4"', 12.0),        # * coerces numerically, + concatenates
        ('"" + 1.5', "1.5"),
        ('"" + 3.0', "3"),          # integral doubles print without .0
        ('"" + true', "true"),
        ('"" + null', "null"),
        ('"" + undefined', "undefined"),
        ('"" + [1,2]', "1,2"),
        ('+"12px"', None),          # NaN — checked below
    ])
    def test_coercion(self, src, want):
        got = ev(src)
        if want is None:
            assert isinstance(got, float) and math.isnan(got)
        else:
            assert got == want

    @pytest.mark.parametrize("src,want", [
        ('1 == "1"', True),
        ('1 === "1"', False),
        ("null == undefined", True),
        ("null === undefined", False),
        ("NaN == NaN", False),
        ("NaN === NaN", False),
        ('0 == ""', True),
        ('0 === ""', False),
        ("false == 0", True),
        ('"abc" < "abd"', True),
        ("3 > NaN", False),
        ("3 <= NaN", False),
    ])
    def test_equality_relational(self, src, want):
        assert ev(src) is want

    @pytest.mark.parametrize("src,want", [
        ("!0", True), ("!1", False), ('!""', True), ("!null", True),
        ("!undefined", True), ("!NaN", True), ('!"0"', False),
        ("typeof 3", "number"), ('typeof "a"', "string"),
        ("typeof true", "boolean"), ("typeof undefined", "undefined"),
        ("typeof null", "object"), ("typeof [1]", "object"),
        ("typeof foo", "undefined"),  # typeof tolerates undeclared names
    ])
    def test_truthiness_typeof(self, src, want):
        assert ev(src) == want

    def test_short_circuit_and_nullish(self):
        assert ev('0 || "fallback"') == "fallback"
        assert ev('"a" || "b"') == "a"
        assert ev('0 ?? "fallback"') == 0.0     # ?? only skips null/undefined
        assert ev('null ?? "fallback"') == "fallback"
        assert ev("false && explodes") is False  # rhs never evaluated

    def test_ternary_and_sequence(self):
        assert ev('1 < 2 ? "y" : "n"') == "y"
        assert ev("(1, 2, 3)") == 3.0


class TestLibrary:
    def test_math(self):
        assert ev("Math.round(2.5)") == 3.0
        assert ev("Math.round(-0.5)") == 0.0    # JS rounds half toward +inf
        assert ev("Math.round(-1.5)") == -1.0
        assert ev("Math.floor(-1.5)") == -2.0
        assert ev("Math.sign(-3)") == -1.0
        assert ev("Math.max(1, 9, 4)") == 9.0
        assert math.isnan(ev("Math.sqrt(-1)"))
        assert abs(ev("Math.hypot(3, 4)") - 5.0) < 1e-12
        assert ev("Math.abs(Math.PI - 3.141592653589793) < 1e-15") is True

    def test_parse_functions(self):
        assert ev('parseInt("42px")') == 42.0
        assert ev('parseInt("ff", 16)') == 255.0
        assert ev('parseInt("0x1A")') == 26.0
        assert math.isnan(ev('parseInt("px")'))
        assert ev('parseFloat("3.5e2abc")') == 350.0
        assert ev('isNaN("abc")') is True
        assert ev('isFinite("12")') is True

    def test_number_string_namespaces(self):
        assert ev('Number("12.5")') == 12.5
        assert ev("Number.isInteger(4)") is True
        assert ev("Number.isInteger(4.5)") is False
        assert ev("String(12)") == "12"
        assert ev("String.fromCharCode(72, 105)") == "Hi"
        assert ev("Boolean(0)") is False
        assert ev("Array.isArray([1])") is True

    def test_json_object(self):
        assert ev('JSON.stringify({a: 1, b: [1, 2]})') == '{"a":1,"b":[1,2]}'
        assert ev('JSON.parse("[1, 2]")[1]') == 2.0
        assert ev('Object.keys({x: 1, y: 2}).join(",")') == "x,y"
        assert ev('Object.values({x: 1, y: 2})[1]') == 2.0


class TestStringMethods:
    @pytest.mark.parametrize("src,want", [
        ('"hello".length', 5.0),
        ('"hello".toUpperCase()', "HELLO"),
        ('"a,b,c".split(",")[1]', "b"),
        ('"abc".split("")[2]', "c"),
        ('"hello".slice(-3)', "llo"),
        ('"hello".slice(1, 3)', "el"),
        ('"hello".substring(3, 1)', "el"),   # substring swaps its args
        ('"hello".substr(1, 3)', "ell"),
        ('"abc".charAt(1)', "b"),
        ('"abc".charCodeAt(0)', 97.0),
        ('"ab".repeat(3)', "ababab"),
        ('"  x ".trim()', "x"),
        ('"5".padStart(3, "0")', "005"),
        ('"x-y-z".replace("-", "_")', "x_y-z"),      # first occurrence only
        ('"x-y-z".replaceAll("-", "_")', "x_y_z"),
        ('"a1b2".replace(/\\d/g, "#")', "a#b#"),
        ('"hello world".indexOf("o")', 4.0),
        ('"hello".indexOf("z")', -1.0),
        ('"hello".includes("ell")', True),
        ('"hello".startsWith("he")', True),
        ('"hello".endsWith("lo")', True),
        ('"abc123def".search(/\\d+/)', 3.0),
        ('"abc123".match(/\\d+/)[0]', "123"),
        ('"a-1 b-2".match(/\\d/g).length', 2.0),
        ('/^[A-Z]/.test("Foo")', True),
        ('/^[A-Z]/.test("foo")', False),
    ])
    def test_strings(self, src, want):
        got = ev(src)
        if isinstance(want, bool):
            assert got is want
        else:
            assert got == want

    def test_number_formatting(self):
        assert ev("(5).toFixed(2)") == "5.00"
        assert ev("(255).toString(16)") == "ff"
        assert ev("(1234.5678).toFixed(1)") == "1234.6"


class TestArrayMethods:
    @pytest.mark.parametrize("src,want", [
        ("[1,2,3].length", 3.0),
        ('[1,2,3].map(x => x * 2).join("|")', "2|4|6"),
        ("[1,2,3,4].filter(x => x % 2 == 0).length", 2.0),
        ("[1,2,3].reduce((a,b) => a + b, 0)", 6.0),
        ("[1,2,3].reduce((a,b) => a + b)", 6.0),
        ("[3,1,2].sort((a,b) => a - b)[0]", 1.0),
        ("[3,1,2].sort()[0]", 1.0),
        ("[1,2,3].indexOf(2)", 1.0),
        ("[1,2,3].includes(4)", False),
        ("[1,[2,[3]]].flat(2).length", 3.0),
        ("[1,2,3].slice(1).length", 2.0),
        ("[1,2].concat([3,4]).length", 4.0),
        ("[1,2,3].some(x => x > 2)", True),
        ("[1,2,3].every(x => x > 0)", True),
        ("[5,10,15].find(x => x > 7)", 10.0),
        ("[5,10,15].findIndex(x => x > 7)", 1.0),
        ("[1,2,3].reverse()[0]", 3.0),
    ])
    def test_arrays(self, src, want):
        got = ev(src)
        if isinstance(want, bool):
            assert got is want
        else:
            assert got == want

    def test_mutating_methods(self):
        assert ev("a = [1]; a.push(2, 3); a.length", {}) == 3.0
        assert ev("a = [1,2]; a.pop()", {}) == 2.0

    def test_arrow_closures_capture_fields(self):
        # arrow body sees the feature's fields (closure over the record)
        assert ev("xs.filter(x => x > lim).length",
                  {"xs": [1.0, 5.0, 9.0], "lim": 4.0}) == 2.0


class TestProgramsAndRecords:
    def test_assignment_creates_fields(self):
        _, rec = run_program("tmp = a * 2; out = tmp + 1", {"a": 10.0})
        assert rec["out"] == 21.0 and rec["tmp"] == 20.0

    def test_compound_assignment(self):
        _, rec = run_program("x += 5, x *= 2", {"x": 1.0})
        assert rec["x"] == 12.0

    def test_increment(self):
        _, rec = run_program("n++; n++", {"n": 0.0})
        assert rec["n"] == 2.0
        assert ev("i++ + i", {"i": 1.0}) == 3.0   # postfix yields old value

    def test_d_object_alias(self):
        _, rec = run_program('d.tag = name + "!"', {"name": "x"})
        assert rec["tag"] == "x!"

    def test_residual_value(self):
        # compileValueExpression parity: the last statement's value
        assert ev("1") == 1.0
        assert ev('"a"') == "a"

    def test_undefined_variable_throws(self):
        # expressions-test.js: 'throws error on undefined variable'
        with pytest.raises(JSReferenceError):
            ev("foo")
        with pytest.raises(JSReferenceError):
            ev("foo == true")

    def test_env_values_visible(self):
        assert ev("total * 2", env={"total": 21.0}) == 42.0

    def test_syntax_errors(self):
        with pytest.raises(JSSyntaxError):
            ev("1 +")
        with pytest.raises(JSSyntaxError):
            ev("`a${b")  # unterminated template expression

    def test_template_interpolation(self):
        assert ev("`a${1 + 1}b`") == "a2b"
        assert ev("`${name}!`", {"name": "x"}) == "x!"
        assert ev("`${null} ${undefined}`") == "null undefined"
        assert ev("`outer ${`in${2}ner`}`") == "outer in2ner"
        with pytest.raises(JSReferenceError):
            ev("`a${b}`")  # b is not defined

    def test_not_a_function(self):
        with pytest.raises(JSError):
            ev('"abc".noSuchMethod()')


class TestAssignedVarsParity:
    """expressions-test.js getAssignedVars()/getAssignmentObjects()."""

    def test_simple_assignment(self):
        assert assigned_vars("foo=1") == ["foo"]

    def test_multiple_assignment(self):
        assert assigned_vars("foo=bar = baz = 1") == ["foo", "bar", "baz"]

    def test_several_assignments(self):
        assert assigned_vars('foo = 1, bar = 3; baz = "a"') == \
            ["foo", "bar", "baz"]

    def test_other_operators_containing_eq(self):
        assert assigned_vars("foo== 0,bar >= 2") == []

    def test_no_dot_assignments(self):
        assert assigned_vars('d.a = "a"') == []

    def test_only_dot_assignments(self):
        assert assigned_vars('d.a = "a",ab.cd=3.0, ac = 8, bv = 8', True) == \
            ["d.a", "ab.cd"]

    def test_repeat_assignments_dedupe(self):
        assert assigned_vars("foo=1, foo=2") == ["foo"]

    def test_assignment_objects(self):
        assert assignment_objects('d.a = "a", d.b = "b", a.c = "c"') == \
            ["d", "a"]

    def test_assignment_objects_ignore_this(self):
        assert assignment_objects(
            'd.a = "a", this.coordinates = [[0, 0]], '
            'this.properties.a = "b"') == ["d"]


class TestStatements:
    """Statement-level programs — the reference accepts arbitrary JS via
    new Function (mapshaper-expressions.js:140-162); this pins our
    statement subset and the with(record) declaration quirks."""

    def test_if_else(self):
        assert ev("if (1 > 2) 'x'; else 'y'") == "y"
        assert ev("if (2 > 1) { 'a'; 'b'; }") == "b"
        assert ev("if (0) 'x'") is not None or True  # undefined residual

    def test_classic_for(self):
        assert ev("s = 0; for (var i = 0; i < 5; i++) { s += i; } s") == 10.0

    def test_for_of_and_in(self):
        assert ev("s = 0; for (let x of [1,2,3]) s += x; s") == 6.0
        assert ev("ks = []; for (k in {a:1,b:2}) ks.push(k); "
                  "ks.join(',')") == "a,b"
        assert ev("s = ''; for (const ch of 'abc') s += ch; s") == "abc"

    def test_while_and_dowhile(self):
        assert ev("n = 5; f = 1; while (n > 1) { f *= n; n--; } f") == 120.0
        assert ev("s = 0; do { s++; } while (s < 3); s") == 3.0

    def test_break_continue(self):
        assert ev("s = 0; for (i = 0; i < 10; i++) { if (i == 3) continue; "
                  "if (i > 5) break; s += i; } s") == 12.0

    def test_function_declaration_recursion(self):
        assert ev("function fib(n) { if (n < 2) return n; "
                  "return fib(n-1) + fib(n-2); } fib(10)") == 55.0

    def test_function_expression_and_block_arrow(self):
        assert ev("g = function(a, b) { return a + b; }; g(2, 3)") == 5.0
        assert ev("f = x => { let y = x * 2; return y + 1; }; f(5)") == 11.0

    def test_hoisted_function(self):
        assert ev("v = h(2); function h(x) { return x * 10; } v") == 20.0

    def test_const_reassignment_throws(self):
        with pytest.raises(JSError):
            ev("const c = 3; c = 4")

    def test_in_operator(self):
        assert ev("'a' in {a: 1}") is True
        assert ev("2 in [1,2,3]") is True
        assert ev("5 in [1,2]") is False

    def test_loop_limit_guard(self):
        with pytest.raises(JSError):
            ev("while (true) {}")

    def test_recursion_guard(self):
        with pytest.raises(JSError):
            ev("function f() { return f(); } f()")

    def test_var_becomes_field_with_quirk(self):
        """Reference: with(record) + regex getAssignedVars null-inits
        'tmp', so the top-level var assignment lands on the record."""
        rec = {"age": 41.0}
        run_program("var tmp = age * 2; score = tmp + 1", rec)
        assert rec == {"age": 41.0, "tmp": 82.0, "score": 83.0}

    def test_let_stays_lexical(self):
        """let binds inner to the with object: field stays unset while
        the local carries the value."""
        rec = {"age": 41.0}
        run_program("let tmp = age * 2; score = tmp + 1", rec)
        assert rec == {"age": 41.0, "score": 83.0}

    def test_var_inside_function_stays_local(self):
        rec = {}
        run_program("function f() { var loc = 9; return loc; } r = f()",
                    rec)
        assert rec == {"r": 9.0}

    def test_assigned_vars_include_initialized_decls(self):
        assert assigned_vars("var t = age * 2; score = t + 1") == \
            ["t", "score"]
        assert assigned_vars("let t = 1; var u; w = 2") == ["t", "w"]

    def test_return_at_top_level(self):
        assert ev("if (1) return 'early'; 'late'") == "early"


class TestSparkIntegration:
    @pytest.fixture
    def people(self, spark):
        return spark.createDataFrame(
            [(0, "Ada Lovelace King", 36.0), (1, "Alan Turing", 41.0),
             (2, "Grace Hopper", 85.0)],
            "fid int, name string, age double")

    def test_each_js_arrow_chain(self, people):
        from mapshaper_spark.operators.jseach import each_js
        out = each_js(
            people,
            'initials = name.split(" ").map(w => w.charAt(0)).join("")')
        rows = {r["fid"]: r["initials"] for r in out.collect()}
        assert rows == {0: "ALK", 1: "AT", 2: "GH"}

    def test_each_js_multi_statement_locals(self, people):
        from mapshaper_spark.operators.jseach import each_js
        out = each_js(people, "t = age * 2; score = t + fid")
        rows = {r["fid"]: r["score"] for r in out.collect()}
        assert rows == {0: 72.0, 1: 83.0, 2: 172.0}

    def test_each_js_statement_program(self, people):
        """-each with a full statement program: loops, locals, function
        declarations — the slow-path engine runs the original JS."""
        from mapshaper_spark.operators.jseach import each_js
        out = each_js(
            people,
            "function initials(s) { let r = ''; "
            "for (let w of s.split(' ')) r += w.charAt(0); return r; } "
            "ini = initials(name); "
            "var doubled = age * 2;")
        rows = {r["fid"]: (r["ini"], r["doubled"]) for r in out.collect()}
        assert rows == {0: ("ALK", 72.0), 1: ("AT", 82.0),
                        2: ("GH", 170.0)}

    def test_each_js_let_column_is_null(self, people):
        """Reference with(record) quirk: a let-declared name is regex-
        matched as an assigned var (null column) but the runtime write
        stays lexical — the column exists and is null."""
        from mapshaper_spark.operators.jseach import each_js
        out = each_js(people, "let t = age * 2; score = t + fid")
        rows = {r["fid"]: (r["t"], r["score"]) for r in out.collect()}
        assert rows == {0: (None, 72.0), 1: (None, 83.0), 2: (None, 172.0)}

    def test_cli_each_statement_fallback(self, people, spark):
        from mapshaper_spark.cli import run_commands
        cat = run_commands(
            spark,
            "-each 'if (age > 50) tier = \"senior\"; else tier = \"adult\"'",
            layers={"people": people})
        rows = {r["fid"]: r["tier"] for r in cat.df().collect()}
        assert rows == {0: "adult", 1: "adult", 2: "senior"}

    def test_each_js_where_keeps_old(self, people):
        from mapshaper_spark.operators.jseach import each_js
        out = each_js(people, 'flag = "old"')
        out = each_js(out, 'flag = "senior"', where="age > 50")
        rows = {r["fid"]: r["flag"] for r in out.collect()}
        assert rows == {0: "old", 1: "old", 2: "senior"}

    def test_filter_js(self, people):
        from mapshaper_spark.operators.jseach import filter_js
        out = filter_js(people, 'name.split(" ").length > 2')
        assert [r["fid"] for r in out.collect()] == [0]

    def test_matches_sql_path_on_shared_surface(self, people):
        """The two engines agree where both support the expression."""
        from mapshaper_spark.functions.expressions import (
            each_expr, translate_proxy_expression,
        )
        from mapshaper_spark.operators.jseach import each_js
        # '+' string concatenation is JS-only (SQL's + is numeric); the
        # shared surface is methods + arithmetic
        for expr in ('label = name.toUpperCase()',
                     'label = name.split(" ")[0]',
                     "label = age * 2 - 1"):
            sql_rows = {r["fid"]: r["label"]
                        for r in each_expr(people, translate_proxy_expression(
                            expr)).collect()}
            js_rows = {r["fid"]: r["label"]
                       for r in each_js(people, expr).collect()}
            assert js_rows == sql_rows, expr

    def test_proxy_area_getter(self, spark):
        from mapshaper_spark.operators.jseach import each_js
        df = spark.createDataFrame(
            [(0, [[0.0, 4.0, 4.0, 0.0, 0.0]], [[0.0, 0.0, 2.0, 2.0, 0.0]])],
            "fid int, rings_x array<array<double>>, "
            "rings_y array<array<double>>")
        out = each_js(df, "a = $.area")
        assert abs(abs(out.collect()[0]["a"]) - 8.0) < 1e-9

    def test_cli_fallback_engages(self, people, spark):
        """-each with an arrow function: the SQL path cannot express it,
        the catalog falls back to the interpreter transparently."""
        from mapshaper_spark.cli import run_commands
        cat = run_commands(
            spark,
            "-each 'initials = name.split(\" \").map(w => "
            'w.charAt(0)).join("")\'',
            layers={"people": people})
        rows = {r["fid"]: r["initials"] for r in cat.df().collect()}
        assert rows == {0: "ALK", 1: "AT", 2: "GH"}
