"""One-time fixture builder: decode the synthetic image corpus once and
pin the per-image stats as a golden parquet, giving `image_decode_stats`
an exact DuckDB oracle (the codecs themselves can't be replayed in SQL;
their correctness is established separately by the libpng/libwebp
byte-interop and PSNR tests in tests/test_images*.py).

Usage: python tools/make_image_decode_golden.py
Writes tests/fixtures/image_decode_stats_golden.parquet (deterministic —
rerunning must be byte-stable because synth_images and every encoder are
seed-free deterministic functions of the row id).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as E
    from mapshaper_spark.session import get_spark

    spark = get_spark("image-golden")
    spark.sparkContext.setLogLevel("ERROR")
    df = E.queries()["image_decode_stats"](spark, "/root/testdata/sf0.01")
    pdf = df.toPandas().sort_values("image_id").reset_index(drop=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "image_decode_stats_golden.parquet")
    schema = pa.schema([
        ("image_id", pa.string()),
        ("dec_w", pa.int32()),
        ("dec_h", pa.int32()),
        ("mean_r", pa.float64()),
        ("mean_g", pa.float64()),
        ("mean_b", pa.float64()),
        ("ahash", pa.int64()),
    ])
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, out, compression="zstd")
    print(f"wrote {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
