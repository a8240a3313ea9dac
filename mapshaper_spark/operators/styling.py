"""Styling + definition-loading commands: -colorizer, -svg-style, -include.

Spark-first re-expression of:
- api.colorizer (/root/reference/src/commands/mapshaper-colorizer.js:3-38):
  a named value->color function from sequential breaks or categories. Here
  the colorizer is a COLUMN GENERATOR (a F.when cascade — whole-stage
  codegen, no UDF) registered in a defs registry.
- -svg-style (/root/reference/src/svg/mapshaper-svg-style.js): set the
  reserved style fields (fill, stroke, stroke-width, opacity, r, class)
  from literals or expressions; here plain withColumn's.
- internal.include (/root/reference/src/commands/mapshaper-include.js:3-35):
  load named definitions into the expression context. The reference evals a
  JS object; the engine's expression surface is Python/Spark, so -include
  loads a Python file (or dict) of named callables/values into the same
  defs registry the colorizer uses.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESERVED_NAMES = re.compile(r"^(stroke|stroke-width|fill|opacity|r|class)$")

# session-level named definitions (the reference's getStateVar('defs'))
DEFS: dict[str, object] = {}


def colorizer(name: str, colors, breaks=None, categories=None,
              other: str | None = None, nodata: str = "white",
              precision: float | None = None):
    """Build + register a named colorizer. Returns a function mapping a
    value Column -> color Column (pure F.when cascade).

    Sequential: len(colors) == len(breaks) + 1, value < break[i] -> color[i]
    (getSequentialColorFunction). Categorical: exact match per category,
    ``other`` for non-null non-matches (getCategoricalColorFunction).
    Nulls / no match -> ``nodata``."""
    if not name:
        raise ValueError("Missing required name= parameter")
    if RESERVED_NAMES.match(name):
        raise ValueError(f'"{name}" is a reserved name')
    if not colors:
        raise ValueError("Missing colors= parameter")

    if breaks is not None:
        if len(colors) != len(breaks) + 1:
            raise ValueError("Number of colors should be one more than breaks")
        vals = [float(b) for b in breaks]
        if any(v != v for v in vals) or \
                any(a > b for a, b in zip(vals, vals[1:])):
            raise ValueError(f"Invalid class breaks: {breaks}")

        def fn(col: Column) -> Column:
            # classify on a tolerant double view so non-numeric values
            # never throw under ANSI casts (they become no-data below)
            v = col.try_cast("double")
            # precision= rounds values to increments before classification
            # (utils.getRoundingFunction, mapshaper-rounding.js)
            if precision is not None:
                v = F.round(v / F.lit(precision)) * F.lit(precision)
            expr = F.lit(colors[-1])
            for b, c in zip(reversed(breaks), reversed(colors[:-1])):
                expr = F.when(v < F.lit(float(b)), F.lit(c)).otherwise(expr)
            # null AND NaN are no-data (colorizer-test.js: {pct: NaN} ->
            # nodata; NaN comparisons would otherwise fall through to the
            # last color class)
            # (null, NaN and non-castable values are all no-data — the
            # reference refuses to coerce non-numeric values)
            v0 = col.try_cast("double")
            bad = v0.isNull() | F.isnan(v0)
            return F.when(bad, F.lit(nodata)).otherwise(expr)
    elif categories is not None:
        if len(colors) != len(categories):
            raise ValueError(
                "Number of colors should be equal to the number of categories")

        def fn(col: Column) -> Column:
            expr = F.lit(other) if other is not None else F.lit(nodata)
            for k, c in zip(reversed(categories), reversed(colors)):
                expr = F.when(col == F.lit(k), F.lit(c)).otherwise(expr)
            # null and '' are no-data (colorizer-test.js: f('') -> nodata,
            # while a non-matching non-empty value gets `other`)
            bad = col.isNull() | (col.cast("string") == F.lit(""))
            return F.when(bad, F.lit(nodata)).otherwise(expr)
    else:
        raise ValueError("Missing categories= or breaks= parameter")

    DEFS[name] = fn
    return fn


_STYLE_FIELDS = {"fill": "fill", "stroke": "stroke",
                 "stroke_width": "stroke-width", "opacity": "opacity",
                 "r": "r", "css_class": "class"}


def svg_style(df: DataFrame, **props) -> DataFrame:
    """-svg-style: set reserved style columns from literals or Columns.
    Python-identifier spellings map to the SVG names (stroke_width ->
    'stroke-width', css_class -> 'class')."""
    for k, v in props.items():
        if k not in _STYLE_FIELDS:
            raise ValueError(f"unknown svg style property '{k}'")
        col = v if isinstance(v, Column) else F.lit(v)
        df = df.withColumn(_STYLE_FIELDS[k], col)
    return df


def include_defs(source) -> dict:
    """-include: merge named definitions into the defs registry.

    ``source``: a dict, or a path to a Python file executed in an isolated
    namespace whose public (non-underscore) top-level names are imported —
    the engine's analog of the reference's isolated JS object eval."""
    if isinstance(source, dict):
        obj = source
    else:
        with open(source) as fh:
            content = fh.read()
        # single namespace so file-level names resolve inside defined
        # functions (separate globals/locals would break closures)
        ns: dict = {"F": F}
        exec(compile(content, str(source), "exec"), ns)
        obj = {k: v for k, v in ns.items()
               if not k.startswith("_") and k != "F"}
    DEFS.update(obj)
    return dict(DEFS)


def get_def(name: str):
    if name not in DEFS:
        raise KeyError(f"no definition named '{name}' (use include_defs/colorizer)")
    return DEFS[name]
