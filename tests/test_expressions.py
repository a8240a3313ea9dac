"""Expression translator unit tests: string-literal shielding, paren-aware
method args, JS-idiom rewrites (ADVICE r03 expressions.py findings)."""

import pytest

from mapshaper_spark.functions.expressions import (
    _shield_strings, _restore_strings, parse_assignments,
    translate_proxy_expression as t)


class TestStringShielding:
    def test_literals_never_rewritten(self):
        assert t("note = 'a && b'") == "note = 'a && b'"
        # JS double-quoted literals normalize to SQL single-quoted form
        assert t('s = "x || y"') == "s = 'x || y'"
        assert t("name.startsWith('Math.round(')") == \
            "startswith(name, 'Math.round(')"
        assert t("c === 'null'") == "c = 'null'"

    def test_outside_literals_still_rewritten(self):
        assert t("a && b || c") == "a  AND  b  OR  c"
        assert t("Math.max(a, Math.min(b, c))") == "greatest(a, least(b, c))"
        assert t("x === null") == "x  IS NULL"

    def test_escaped_quotes(self):
        src = r"m = 'it\'s && fine'"
        assert t(src) == src

    def test_shield_restore_roundtrip(self):
        # single-quoted sources restore verbatim; double-quoted literals
        # come back SQL-normalized (single quotes, inner quote doubling)
        for src, want in [("'a'", "'a'"),
                          ("x + 'y && z' + \"w\"", "x + 'y && z' + 'w'"),
                          ("no strings here", "no strings here"),
                          (r"'esc\'aped' || other", r"'esc\'aped' || other"),
                          ('"it\'s"', "'it''s'")]:
            shielded, toks = _shield_strings(src)
            assert "'" not in shielded and '"' not in shielded
            assert _restore_strings(shielded, toks) == want

    def test_ternary_with_literals(self):
        out = t("x === null ? 'n/a' : name.trim().toUpperCase()")
        assert out == "IF(x  IS NULL, 'n/a', upper(trim(name)))"


class TestParenAwareArgs:
    def test_nested_call_argument(self):
        assert t("name.indexOf(substr(a, 1, 2))") == \
            "(instr(name, substr(a, 1, 2)) - 1)"
        assert t("s.includes(concat(a, b))") == "(instr(s, concat(a, b)) > 0)"

    def test_split_index_keeps_literal(self):
        assert t('bar.split(",")[0]') == "split_part(bar, ',', 1)"
        assert t("bar.split('-')[2]") == "split_part(bar, '-', 3)"

    def test_pad_with_two_args(self):
        # JS padStart never truncates a string already >= the width,
        # unlike lpad — the translation guards with IF
        assert t("s.padStart(5, '0')") == \
            "IF(length(s) >= (5), s, lpad(s, 5, '0'))"


class TestParseAssignments:
    def test_semicolon_and_comma_split(self):
        assert parse_assignments("a = 1; b = 2, c = a + b") == \
            [("a", "1"), ("b", "2"), ("c", "a + b")]

    def test_commas_inside_calls_and_strings(self):
        out = parse_assignments("a = concat('x,y', z), b = least(1, 2)")
        assert out == [("a", "concat('x,y', z)"), ("b", "least(1, 2)")]

    def test_non_assignment_rejected(self):
        with pytest.raises(ValueError):
            parse_assignments("1 + 2")


class TestJsReplace:
    def test_first_occurrence_form(self):
        out = t("s.replace('a', 'b')")
        assert out == ("IF(instr(s, 'a') > 0, "
                       "concat(substr(s, 1, instr(s, 'a') - 1), 'b', "
                       "substr(s, instr(s, 'a') + length('a'))), s)")

    def test_sql_semantics_first_only(self):
        import duckdb
        sql = t("s.replace('a', 'X')")
        got = duckdb.sql(
            f"SELECT {sql} AS r FROM (SELECT 'banana' AS s)").fetchone()[0]
        assert got == "bXnana"  # JS 'banana'.replace('a','X')

    def test_no_match_returns_input(self):
        import duckdb
        sql = t("s.replace('zz', 'X')")
        got = duckdb.sql(
            f"SELECT {sql} AS r FROM (SELECT 'banana' AS s)").fetchone()[0]
        assert got == "banana"

    def test_non_literal_find_untouched(self):
        assert t("s.replace(f, 'x')") == "s.replace(f, 'x')"


class TestJsRegexMethods:
    """Regex-literal method idioms -> SQL regexp functions (round 4:
    narrows the documented JS-engine gap)."""

    def test_match_truthiness_and_group(self):
        assert t("name.match(/^A/i)") == "regexp_like(name, '(?i)^A')"
        # backslashes double in the emitted SQL literal: Spark's parser
        # processes escapes inside strings, so '\d' must ship as '\\d'
        assert t(r"code.match(/(\d+)-(\d+)/)[2]") == \
            r"regexp_extract(code, '(\\d+)-(\\d+)', 2)"
        assert t(r"code.match(/\d+/)[0]") == r"regexp_extract(code, '\\d+', 0)"

    def test_regex_test_and_search(self):
        assert t(r"/^\w+$/.test(name)") == r"regexp_like(name, '^\\w+$')"
        assert t("s.search(/b.n/)") == "(regexp_instr(s, 'b.n') - 1)"

    def test_backslash_pattern_through_spark(self):
        from mapshaper_spark.session import get_spark
        s = get_spark()
        row = s.sql("SELECT " + t(r"s.match(/(\d+)/)[1]") +
                    " AS d FROM (SELECT 'ab123cd' AS s)").collect()[0]
        assert row.d == "123"

    def test_split_regex(self):
        assert t("s.split(/[,;]/)[1]") == "split(s, '[,;]')[1]"

    def test_replace_global_vs_first(self):
        assert t("s.replace(/a+/g, 'X')") == "regexp_replace(s, 'a+', 'X')"
        out = t("s.replace(/a+/, 'X')")
        assert out.startswith("IF(regexp_instr(s, 'a+') > 0,")
        assert "regexp_extract(s, 'a+', 0)" in out

    def test_division_not_mangled(self):
        assert t("a / b / c") == "a / b / c"
        # [gimsuy]-restricted flags: 'c.test' after a division chain is not
        # a regex literal
        assert ".test(" in t("a/b/c.test(y)") or "c.test" in t("a/b/c.test(y)")

    def test_spark_semantics(self, spark=None):
        """End-to-end through Spark SQL: JS-equivalent results."""
        from mapshaper_spark.session import get_spark
        s = get_spark()
        row = s.sql(
            "SELECT " + t("s.replace(/an/, 'X')") + " AS first_only, " +
            t("s.replace(/an/g, 'X')") + " AS all_of_them, " +
            t("s.match(/b.n/)") + " AS matched, " +
            t("s.search(/zzz/)") + " AS missing " +
            "FROM (SELECT 'banana' AS s)").collect()[0]
        assert row.first_only == "bXana"      # JS 'banana'.replace(/an/,'X')
        assert row.all_of_them == "bXXa"      # /an/g
        assert row.matched is True
        assert row.missing == -1
