"""Attribute joins with mapshaper -join semantics.

The reference join (/root/reference/src/commands/mapshaper-join.js:54-158)
is always *left-outer on the target with first-match copy*:

- copy-fields come from the FIRST matching source row (source order);
- sum-fields are summed over ALL matches (null treated as 0 via joinBySum);
- ``joins`` = number of matches; targets with >1 match count as collisions;
- unmatched targets get null copy-fields / 0 sums (updateUnmatchedRecord);
- ``unjoined`` = source rows never matched (left_anti from source side);
- ``unmatched`` = target rows with no match (left_anti from target side);
- where= filters candidate source rows per target, with isMax/isMin/isMode
  evaluated over the candidate group first
  (/root/reference/src/data/mapshaper-join-filter.js:3-30);
- calc= runs count/sum/average/median/min/max/mode/collect/first/last over
  the matched source rows (/root/reference/src/data/mapshaper-join-calc.js).

Spark shape: dedupe-to-first via min(struct(order, fields)) — one shuffle on
the key for the source aggregation, then a plain (broadcastable) left join.
No Python.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapshaper_spark.operators.attributes import calc_exprs


def join_attributes(target: DataFrame, source: DataFrame, keys: tuple[str, str],
                    copy_fields: Sequence[str] = (),
                    sum_fields: Sequence[str] = (),
                    calc: Mapping[str, tuple[str, str]] | None = None,
                    source_order: str | None = None,
                    broadcast_source: bool = True) -> DataFrame:
    """-join keys=dest_key,src_key with fields/sum-fields/calc options.

    ``source_order``: column giving the reference's source-row order (first
    match = lowest). Defaults to the source key itself when omitted.
    """
    dest_key, src_key = keys
    order = F.col(source_order) if source_order else F.col(src_key)

    # internal name: a user calc= alias like 'JOINS' would collide with
    # 'joins' under Spark's case-insensitive resolution; renamed at the end
    aggs: list[Column] = [F.count(F.lit(1)).alias("__ms_joins")]
    if copy_fields:
        first = F.min(F.struct(order.alias("__o"),
                               *[F.col(f).alias(f) for f in copy_fields])).alias("__first")
        aggs.append(first)
    for f in sum_fields:
        aggs.append(F.sum(F.coalesce(F.col(f), F.lit(0))).alias(f"sum_{f}"))
    if calc:
        from mapshaper_spark.operators.attributes import mode_agg
        vocab = calc_exprs()
        for out, (fn, c) in calc.items():
            if fn == "mode" and source_order is not None:
                source, expr = mode_agg(source, F.col(c), out, source_order,
                                        group_cols=[src_key])
                aggs.append(expr)
            elif fn in ("first", "last") and source_order is not None:
                fn_ = F.min_by if fn == "first" else F.max_by
                aggs.append(fn_(F.col(c), F.col(source_order)).alias(out))
            else:
                aggs.append(vocab[fn](F.col(c)).alias(out))

    grouped = source.groupBy(F.col(src_key).alias(dest_key)).agg(*aggs)
    if copy_fields:
        grouped = grouped.select(
            dest_key, "__ms_joins",
            *[F.col(f"__first.{f}").alias(f) for f in copy_fields],
            *[f"sum_{f}" for f in sum_fields],
            *(list(calc.keys()) if calc else []),
        )
    if broadcast_source:
        grouped = F.broadcast(grouped)
    out = target.join(grouped, dest_key, "left")
    out = out.fillna({"__ms_joins": 0, **{f"sum_{f}": 0 for f in sum_fields}})
    return out.withColumnRenamed("__ms_joins", "joins")


def join_unjoined(target: DataFrame, source: DataFrame,
                  keys: tuple[str, str]) -> DataFrame:
    """Source rows that joined to no target (join.js:143-150)."""
    dest_key, src_key = keys
    return source.join(target.select(F.col(dest_key).alias(src_key)).distinct(),
                       src_key, "left_anti")


def join_unmatched(target: DataFrame, source: DataFrame,
                   keys: tuple[str, str]) -> DataFrame:
    """Target rows that matched no source (join.js:151-156)."""
    dest_key, src_key = keys
    return target.join(source.select(F.col(src_key).alias(dest_key)).distinct(),
                       dest_key, "left_anti")


def join_where_is_max(target: DataFrame, source: DataFrame, keys: tuple[str, str],
                      value_field: str, copy_fields: Sequence[str],
                      is_min: bool = False, source_order: str | None = None) -> DataFrame:
    """-join where='isMax(v)' — candidate source rows are filtered to those
    attaining the group max (min) before the first-match copy
    (mapshaper-join-filter.js isMax/isMin)."""
    dest_key, src_key = keys
    w = Window.partitionBy(src_key)
    extreme = (F.min if is_min else F.max)(F.col(value_field)).over(w)
    filtered = source.withColumn("__ext", extreme).filter(F.col(value_field) == F.col("__ext")).drop("__ext")
    return join_attributes(target, filtered, keys, copy_fields=copy_fields,
                           source_order=source_order)


def join_where_is_mode(target: DataFrame, source: DataFrame,
                       keys: tuple[str, str], value_field: str,
                       copy_fields: Sequence[str],
                       source_order: str | None = None) -> DataFrame:
    """-join where='isMode(v)' — candidate source rows are filtered to
    those carrying a MODAL value of ``value_field`` within the key group
    (ties keep every tied mode), before the first-match copy
    (mapshaper-join-filter.js:24-30 getModeValues). Both windows partition
    on the join key, so this is one shuffle and no Python."""
    dest_key, src_key = keys
    wv = Window.partitionBy(src_key, value_field)
    wk = Window.partitionBy(src_key)
    filtered = (source
                .withColumn("__vc", F.count(F.lit(1)).over(wv))
                .withColumn("__mx", F.max("__vc").over(wk))
                .filter(F.col("__vc") == F.col("__mx"))
                .drop("__vc", "__mx"))
    return join_attributes(target, filtered, keys, copy_fields=copy_fields,
                           source_order=source_order)
