"""Delimited-text source with mapshaper's import semantics.

The reference auto-detects the delimiter from the filename/content
(/root/reference/src/text/mapshaper-delim-import.js:9-46), imports every
column as string, then promotes columns that parse fully numeric
(adjustRecordTypes :109-134, tryNumericField :153-171 — empty/NA/NaN
tolerated), with explicit overrides via field-types=/string-fields=
(/root/reference/src/cli/mapshaper-options.js:131-132).

Spark's csv reader with inferSchema performs the same all-or-nothing
numeric promotion; overrides are applied as casts after the fact.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


SUPPORTED_DELIMITERS = ["|", "\t", ",", ";"]


def guess_delimiter(content: str) -> str:
    """internal.guessDelimiter (mapshaper-delim-import.js:55-74): the first
    of | \\t , ; that appears before the first line break (header line),
    falling back to comma."""
    import re
    first = re.split(r"[\n\r]", content, 1)[0]
    for d in SUPPORTED_DELIMITERS:
        if d in first and first.index(d) > 0:
            return d
    return ","


def detect_delimiter(path: str, encoding: str = "UTF-8") -> str:
    """Sniff the delimiter from the file's first 2000 chars (the reference
    reads the same window, mapshaper-delim-import.js:36)."""
    with open(path, "r", encoding=encoding, errors="replace") as f:
        return guess_delimiter(f.read(2000))


def import_delim(spark: SparkSession, path: str, delimiter: str | None = None,
                 string_fields: Sequence[str] = (),
                 field_types: Mapping[str, str] | None = None,
                 encoding: str = "UTF-8") -> DataFrame:
    if delimiter is None:
        delimiter = detect_delimiter(path, encoding)
    df = (spark.read
          .option("header", True)
          .option("delimiter", delimiter)
          .option("inferSchema", True)
          .option("encoding", encoding)
          .option("nanValue", "NaN")
          .option("nullValue", "")
          .csv(path))
    for f in string_fields:  # string-fields= override
        df = df.withColumn(f, F.col(f).cast("string"))
    for f, t in (field_types or {}).items():  # field-types= override
        df = df.withColumn(f, F.col(f).cast(
            {"num": "double", "str": "string"}.get(t, t)))
    return df


def export_delim(df: DataFrame, path: str, delimiter: str = ",",
                 single_file: bool = True) -> None:
    """CSV/TSV export. ``single_file`` (the CLI's ``-o name.csv`` contract —
    the reference writes one file) collects driver-side and writes one file
    with one header, preserving row order; pass False for the distributed
    directory sink at scale (each part file would otherwise carry its own
    header, so a naive part-concatenation is wrong)."""
    if single_file:
        with open(path, "w", newline="") as f:
            f.write(delim_payload(df, delimiter))
        return
    (df.write.mode("overwrite").option("header", True)
     .option("delimiter", delimiter).csv(path))


def delim_payload(df: DataFrame, delimiter: str = ",") -> str:
    """Driver-side CSV/TSV text for a (fixture-scale) layer. Nulls render
    as EMPTY fields, unquoted — the reference writes nothing for null
    (mapshaper-delim-export.js formatDelimRow); both pandas.to_csv and the
    Spark csv writer quote them as '""'."""
    import math

    def _cell(v) -> str:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ""
        if isinstance(v, (bool, np.bool_)):
            return "true" if v else "false"  # JS String(bool)
        if isinstance(v, float) and v.is_integer() and abs(v) < 1e16:
            # JS String(n) has no int/float split: 3.0 prints '3'
            s = str(int(v))
        else:
            s = str(v)
        if delimiter in s or '"' in s or "\n" in s or "\r" in s:
            s = '"' + s.replace('"', '""') + '"'
        return s

    pdf = df.toPandas()
    lines = [delimiter.join(str(c) for c in pdf.columns)]
    lines.extend(delimiter.join(_cell(v) for v in row)
                 for row in pdf.itertuples(index=False))
    return "\n".join(lines) + "\n"
