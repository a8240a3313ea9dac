"""Shapefile (.shp/.dbf) fixture-scale reader.

Implements the record formats the reference parses
(/root/reference/src/shapefile/shp-import.js:10, shp-reader.js; type table
/root/reference/src/shapefile/shp-type.js:1-16: NULL=0, POINT=1,
POLYLINE=3, POLYGON=5, MULTIPOINT=8; Z/M variants unsupported here) and the
dBase reader (/root/reference/src/shapefile/dbf-reader.js:110-135 type
readers C/N/F/L/D).

Driver-side by design (SURVEY §2.1: "not needed at scale; small-fixture
loader in driver-side Python, then spark.createDataFrame") — production
scans are parquet/Iceberg. Writer intentionally omitted: exports go through
GeoJSON/TopoJSON/parquet sinks.
"""

from __future__ import annotations

import datetime
import struct

import numpy as np


SHP_NULL, SHP_POINT, SHP_POLYLINE, SHP_POLYGON, SHP_MULTIPOINT = 0, 1, 3, 5, 8


def read_shp(data: bytes):
    """Parse .shp bytes -> list of geometry dicts:
    {"type": int, "points": [(x, y)...]} for point/multipoint,
    {"type": int, "parts": [[(x, y)...], ...]} for polyline/polygon."""
    (file_code,) = struct.unpack(">i", data[0:4])
    if file_code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    (file_len_words,) = struct.unpack(">i", data[24:28])
    end = file_len_words * 2
    out = []
    pos = 100
    while pos < end:
        (_recno, content_words) = struct.unpack(">ii", data[pos:pos + 8])
        pos += 8
        rec = data[pos:pos + content_words * 2]
        pos += content_words * 2
        (shp_type,) = struct.unpack("<i", rec[0:4])
        if shp_type == SHP_NULL:
            out.append({"type": SHP_NULL, "points": []})
        elif shp_type == SHP_POINT:
            x, y = struct.unpack("<dd", rec[4:20])
            out.append({"type": SHP_POINT, "points": [(x, y)]})
        elif shp_type == SHP_MULTIPOINT:
            (n,) = struct.unpack("<i", rec[36:40])
            pts = np.frombuffer(rec, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
            out.append({"type": SHP_MULTIPOINT,
                        "points": [tuple(p) for p in pts.tolist()]})
        elif shp_type in (SHP_POLYLINE, SHP_POLYGON):
            n_parts, n_points = struct.unpack("<ii", rec[36:44])
            parts = struct.unpack(f"<{n_parts}i", rec[44:44 + 4 * n_parts])
            coords = np.frombuffer(rec, dtype="<f8", count=2 * n_points,
                                   offset=44 + 4 * n_parts).reshape(n_points, 2)
            bounds = list(parts) + [n_points]
            rings = [[tuple(p) for p in coords[a:b].tolist()]
                     for a, b in zip(bounds[:-1], bounds[1:])]
            out.append({"type": shp_type, "parts": rings})
        else:
            raise NotImplementedError(f"shp type {shp_type} (Z/M) not supported")
    return out


def read_dbf(data: bytes, encoding: str = "latin-1"):
    """Parse .dbf bytes -> list of dict records (types C/N/F/L/D, matching
    dbf-reader.js getNumberReader/readInt/readBool/readDate)."""
    n_records, header_size, record_size = struct.unpack("<ihh", data[4:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        fd = data[pos:pos + 32]
        name = fd[0:11].split(b"\x00")[0].decode(encoding)
        ftype = chr(fd[11])
        length = fd[16]
        decimals = fd[17]
        fields.append((name, ftype, length, decimals))
        pos += 32
    records = []
    for i in range(n_records):
        base = header_size + i * record_size
        if data[base:base + 1] == b"*":
            continue  # deleted
        rec = {}
        off = base + 1
        for name, ftype, length, decimals in fields:
            raw = data[off:off + length]
            off += length
            s = raw.decode(encoding).strip()
            if ftype == "C":
                rec[name] = s
            elif ftype in ("N", "F"):
                if s == "":
                    rec[name] = None
                elif ftype == "N" and decimals == 0 and "." not in s:
                    rec[name] = int(s)
                else:
                    rec[name] = float(s)
            elif ftype == "L":
                rec[name] = True if s in "YyTt" else (False if s in "NnFf" else None)
            elif ftype == "D":
                rec[name] = (datetime.date(int(s[0:4]), int(s[4:6]), int(s[6:8]))
                             if len(s) == 8 else None)
            else:
                rec[name] = s
        records.append(rec)
    return records


def import_shapefile(spark, shp_bytes: bytes, dbf_bytes: bytes | None = None):
    """shp (+ optional dbf) -> features DataFrame with rings_x/rings_y or
    x/y, plus dbf attribute columns (index-aligned, like the reference's
    shape/record pairing)."""
    import pandas as pd

    geoms = read_shp(shp_bytes)
    rows = []
    for i, g in enumerate(geoms):
        row = {"fid": i, "shp_type": g["type"], "x": None, "y": None,
               "rings_x": [], "rings_y": []}
        if g["type"] == SHP_POINT and g["points"]:
            row["x"], row["y"] = g["points"][0]
        elif g["type"] == SHP_MULTIPOINT:
            row["rings_x"] = [[p[0] for p in g["points"]]]
            row["rings_y"] = [[p[1] for p in g["points"]]]
        elif g["type"] in (SHP_POLYLINE, SHP_POLYGON):
            row["rings_x"] = [[p[0] for p in part] for part in g["parts"]]
            row["rings_y"] = [[p[1] for p in part] for part in g["parts"]]
        rows.append(row)
    if dbf_bytes is not None:
        for row, rec in zip(rows, read_dbf(dbf_bytes)):
            for k, v in rec.items():
                row[k] = v
    return spark.createDataFrame(pd.DataFrame(rows))
