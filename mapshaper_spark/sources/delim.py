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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def import_delim(spark: SparkSession, path: str, delimiter: str | None = None,
                 string_fields: Sequence[str] = (),
                 field_types: Mapping[str, str] | None = None,
                 encoding: str = "UTF-8") -> DataFrame:
    if delimiter is None:
        delimiter = "\t" if path.endswith((".tsv", ".txt")) else ","
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


def export_delim(df: DataFrame, path: str, delimiter: str = ",") -> None:
    (df.write.mode("overwrite").option("header", True)
     .option("delimiter", delimiter).csv(path))
