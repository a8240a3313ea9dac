"""-each / -filter via the JS interpreter — the expression-engine fallback.

The default expression path translates the reference's JS surface to Spark
SQL and stays JVM-side (functions/expressions.py). When a user expression
falls outside that surface (array higher-order chains, arrow functions,
multi-statement programs with intermediate locals, JS coercion corners),
the CLI falls back to THIS path: the original JS runs per row through
functions/jsengine.py inside ``mapInPandas`` Arrow batches — the
reference's actual execution model (mapshaper-expressions.js:140-162 runs
arbitrary JS per record), at Python speed.

This is the documented slow path: row-at-a-time interpretation, never the
default, engaged only after the SQL translation fails to parse/analyze.
At 100 TB you want the SQL path; this exists so every reference expression
RUNS, not so it runs fast. The plan stays fully distributed (one Arrow
stage, no shuffle, no driver collect beyond a schema-inference sample).

Schema contract: assigned bare variables become columns (getAssignedVars,
expressions-test.js). Output types are inferred by running the program
over a small driver-side sample, then enforced identically in the
distributed pass (numbers -> double, the JS number type).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from mapshaper_spark.functions import jsengine as J

# geometry/plumbing columns are not data fields (the reference exposes the
# data table to expressions, geometry via the $ proxy)
_GEOM_COLS = ("rings_x", "rings_y", "bbox", "xs", "ys", "n")


def _referenced_names(src: str) -> set:
    names = set()
    for node in J._walk(J.parse(src)):
        if node[0] == "id":
            names.add(node[1])
    return names


def _proxy_getters(src: str) -> set:
    """Which $./this. getters the program reads (so we only compute
    geometry per row when the expression actually uses it)."""
    getters = set()
    for node in J._walk(J.parse(src)):
        if node[0] == "member" and node[1][0] == "id" \
                and node[1][1] in ("$", "this"):
            getters.add(node[2])
    return getters


def _make_proxy(row: dict, getters: set) -> dict:
    """Feature proxy for one row (mapshaper-feature-proxy.js:15-117).
    Geometry getters compute from the frame's ring/point columns."""
    import numpy as np

    from mapshaper_spark.geom import kernels as K
    proxy: dict = {}
    rx, ry = row.get("rings_x"), row.get("rings_y")
    have_rings = rx is not None and len(rx) > 0
    for g in getters:
        if g == "id":
            proxy[g] = row.get("fid", J.UNDEFINED)
        elif g == "properties":
            # this.properties = the feature's data record
            # (feature-proxy.js exposes the data table row)
            proxy[g] = {c: _py_value(v) for c, v in row.items()
                        if c not in _GEOM_COLS and
                        c not in ("fid", "__ms_order")}
        elif g in ("x", "y"):
            proxy[g] = row.get(g, row.get("lon" if g == "x" else "lat",
                                          J.UNDEFINED))
        elif g in ("area", "planarArea", "originalArea") and have_rings:
            proxy[g] = float(sum(
                K.planar_path_area(np.asarray(x, dtype=np.float64),
                                   np.asarray(y, dtype=np.float64))
                for x, y in zip(rx, ry)))
        elif g == "partCount":
            proxy[g] = float(len(rx)) if have_rings else 0.0
        elif g == "isNull":
            proxy[g] = not have_rings
        elif g in ("centroidX", "centroidY") and have_rings:
            # getMaxPath: largest ring by BBOX area (shape-geom.js:28-38)
            best, best_bb = None, 0.0
            for x, y in zip(rx, ry):
                x = np.asarray(x, dtype=np.float64)
                y = np.asarray(y, dtype=np.float64)
                if len(x) == 0:
                    continue
                bb = (float(x.max()) - float(x.min())) * \
                    (float(y.max()) - float(y.min()))
                if bb > best_bb:
                    best_bb, best = bb, (x, y)
            c = K.path_centroid(*best) if best is not None else None
            proxy[g] = J.UNDEFINED if c is None else float(
                c[0 if g == "centroidX" else 1])
        elif g in ("width", "height"):
            bb = row.get("bbox")
            if bb is not None:
                xmin, ymin, xmax, ymax = (bb["xmin"], bb["ymin"],
                                          bb["xmax"], bb["ymax"]) \
                    if isinstance(bb, dict) else (bb[0], bb[1], bb[2], bb[3])
                proxy[g] = float(xmax - xmin if g == "width" else ymax - ymin)
        elif g not in proxy:
            proxy[g] = J.UNDEFINED
    return proxy


def _py_value(v):
    """numpy/pandas scalar -> plain-python JS value."""
    if v is None or v is J.UNDEFINED:
        return v
    if isinstance(v, float) and math.isnan(v):
        return J.NAN
    try:
        import numpy as np
        if isinstance(v, np.generic):
            v = v.item()
        elif isinstance(v, np.ndarray):
            v = v.tolist()
    except ImportError:
        pass
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v)
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _run_row(ast, row: dict, data_cols: list, getters: set,
             where_ast=None, extra_env: dict | None = None,
             globals_: dict | None = None):
    """Evaluate the program for one row. Returns (residual, record).
    ``globals_``: a shared environment from J._make_globals(), built once
    per batch by the caller (the reference builds its expression context
    once per -each run; rebuilding ~20 dicts per row is pure overhead)."""
    record = {c: _py_value(row.get(c)) for c in data_cols}
    env = dict(extra_env) if extra_env else {}
    if getters:
        proxy = _make_proxy(row, getters)
        if "properties" in getters:
            # this.properties IS the live data record (feature-proxy.js):
            # member assignments through it land in the record
            proxy["properties"] = record
        env["$"] = proxy
        env["this"] = proxy
    if where_ast is not None:
        keep = J.truthy(J._Interp(dict(record), env,
                                  globals_=globals_).run(where_ast))
        if not keep:
            return None, record
    interp = J._Interp(record, env, globals_=globals_)
    return interp.run(ast), record


def _spark_type(values: list) -> T.DataType:
    """Infer one column's Spark type from sampled JS values."""
    kinds = set()
    elem: T.DataType | None = None
    for v in values:
        if v is None or v is J.UNDEFINED:
            continue
        if isinstance(v, bool):
            kinds.add("bool")
        elif isinstance(v, (int, float)):
            kinds.add("num")
        elif isinstance(v, str):
            kinds.add("str")
        elif isinstance(v, list):
            kinds.add("list")
            for x in v:
                if isinstance(x, (int, float)) and not isinstance(x, bool):
                    elem = elem or T.DoubleType()
                elif x is not None and x is not J.UNDEFINED:
                    elem = T.StringType()
        else:
            kinds.add("other")
    if kinds == {"bool"}:
        return T.BooleanType()
    if kinds == {"num"}:
        return T.DoubleType()
    if kinds == {"list"}:
        return T.ArrayType(elem or T.StringType())
    return T.StringType()  # str / mixed / empty -> stringify


def _coerce(v, dt: T.DataType):
    if v is None or v is J.UNDEFINED:
        return None
    if isinstance(dt, T.BooleanType):
        return J.truthy(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        n = J.to_number(v)
        return None if math.isnan(n) else n
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        n = J.to_number(v)
        return None if math.isnan(n) or math.isinf(n) else int(n)
    if isinstance(dt, T.ArrayType):
        if not isinstance(v, list):
            return None
        return [_coerce(x, dt.elementType) for x in v]
    return J.to_string(v)


def each_js(df: DataFrame, expression: str, where: str | None = None,
            sample_rows: int = 100, env: dict | None = None) -> DataFrame:
    """-each running the original JS per row (fallback engine). Assigned
    bare variables become/overwrite columns; with ``where=``, non-matching
    rows keep their old values (null for new columns) — each.js:12-19."""
    import re as _re

    _reject_include_accumulator(expression, env)
    ast = J.parse(expression)
    where_ast = J.parse(where) if where else None
    targets = J.assigned_vars(expression)
    # `this.properties.X = ...` / `$.properties.X = ...` assigns a data
    # field through the feature proxy (the reference's records are live
    # objects); treat X as an assigned column
    targets = list(dict.fromkeys(
        list(targets) + _re.findall(
            r"(?:\$|this)\.properties\.([A-Za-z_$][\w$]*)\s*=(?!=)",
            expression)))
    if not targets:
        # a pure side-effect-free -each is a no-op on the frame
        return df
    getters = _proxy_getters(expression) | \
        (_proxy_getters(where) if where else set())
    if "id" in getters and "fid" not in df.columns:
        # this.id = the record index; tables imported without one get a
        # dense 0-based id in current row order (scale-safe ranking)
        from pyspark.sql import functions as F

        from mapshaper_spark.plans.scale import ranked_ids
        df = ranked_ids(df.withColumn("__ms_midx",
                                      F.monotonically_increasing_id()),
                        ["__ms_midx"], "fid").drop("__ms_midx")
        drop_fid = True
    else:
        drop_fid = False
    refs = _referenced_names(expression) | \
        (_referenced_names(where) if where else set())
    data_cols = [c for c in df.columns
                 if c not in _GEOM_COLS or c in refs]

    # --- driver-side sample -> output schema for the new columns ---
    sample = df.limit(sample_rows).toPandas()
    out_types: dict[str, T.DataType] = {}
    sampled: dict[str, list] = {t: [] for t in targets}
    for _, prow in sample.iterrows():
        row = prow.to_dict()
        _, record = _run_row(ast, row, data_cols, getters, where_ast, env)
        for t in targets:
            if t in record:
                sampled[t].append(record[t])
    existing = {f.name: f.dataType for f in df.schema.fields}
    for t in targets:
        if t in existing and not sampled[t]:
            # no sample evidence (e.g. where= matched nothing in the
            # sample): keep the existing type, coerce at runtime
            out_types[t] = existing[t]
        else:
            out_types[t] = _spark_type(sampled[t])

    fields = []
    for f in df.schema.fields:
        if f.name in out_types:
            fields.append(T.StructField(f.name, out_types[f.name]))
        else:
            fields.append(f)
    for t in targets:
        if t not in df.columns:
            fields.append(T.StructField(t, out_types[t]))
    out_schema = T.StructType(fields)
    changed = [t for t in targets]
    types_bc = {t: out_types.get(t) for t in targets}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shared_globals = J._make_globals()  # once per task, not per row
        for pdf in batches:
            rows_out = []
            for _, prow in pdf.iterrows():
                row = prow.to_dict()
                residual, record = _run_row(ast, row, data_cols, getters,
                                            where_ast, env,
                                            globals_=shared_globals)
                del residual
                for t in changed:
                    dt = types_bc[t]
                    if t in record:
                        row[t] = _coerce(record[t], dt)
                    elif t not in row:
                        row[t] = None
                    else:  # where miss on an existing column: keep value,
                        row[t] = _coerce(_py_value(row[t]), dt)
                rows_out.append(row)
            out = pd.DataFrame(rows_out,
                               columns=[f.name for f in out_schema.fields])
            yield out

    out_df = df.mapInPandas(gen, schema=out_schema)
    return out_df.drop("fid") if drop_fid else out_df


def _reject_include_accumulator(expression: str, env: dict | None) -> None:
    """The reference's ``-include`` object is a live singleton mutated
    across records (include-test.js 'can be used as an accumulator':
    ``counts[type] = type in counts ? counts[type] + 1 : 1``). A
    distributed -each gives each Arrow batch its own copy of the include
    scope, so cross-record accumulation would be silently LOST — a later
    read would see the initial values. Raise loudly instead of diverging
    silently; -calc / -join calc= are the supported distributed
    spellings."""
    if not env:
        return
    bare = set(J.assigned_vars(expression))  # locally re-bound names are
    mutated = [n for n in J.mutated_scope_objects(expression)  # columns
               if n not in ("$",) and n not in bare
               and isinstance(env.get(n), (dict, list))]
    if mutated:
        raise ValueError(
            "-each/-filter: expression mutates include-scope object(s) "
            f"{mutated}. Include objects are not shared across a "
            "distributed run, so cross-record accumulation (the "
            "include-test.js accumulator idiom) cannot work here — the "
            "mutation would be silently lost. Use -calc or "
            "-join calc= to aggregate across features instead.")


def filter_js(df: DataFrame, expression: str,
              env: dict | None = None) -> DataFrame:
    """-filter running the original JS per row; keeps truthy rows.
    Schema is unchanged (pure predicate)."""
    _reject_include_accumulator(expression, env)
    ast = J.parse(expression)
    getters = _proxy_getters(expression)
    refs = _referenced_names(expression)
    data_cols = [c for c in df.columns if c not in _GEOM_COLS or c in refs]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shared_globals = J._make_globals()  # once per task, not per row
        for pdf in batches:
            keep = []
            for _, prow in pdf.iterrows():
                row = prow.to_dict()
                record = {c: _py_value(row.get(c)) for c in data_cols}
                renv = dict(env) if env else {}
                if getters:
                    proxy = _make_proxy(row, getters)
                    renv["$"] = proxy
                    renv["this"] = proxy
                keep.append(J.truthy(J._Interp(
                    record, renv, globals_=shared_globals).run(ast)))
            yield pdf[pd.Series(keep, index=pdf.index)]

    return df.mapInPandas(gen, schema=df.schema)
