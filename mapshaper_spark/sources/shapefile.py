"""Shapefile (.shp/.dbf) fixture-scale reader + writer.

Implements the record formats the reference parses
(/root/reference/src/shapefile/shp-import.js:10, shp-reader.js; type table
/root/reference/src/shapefile/shp-type.js:1-16: NULL=0, POINT=1,
POLYLINE=3, POLYGON=5, MULTIPOINT=8; Z/M variants unsupported here) and the
dBase reader (/root/reference/src/shapefile/dbf-reader.js:110-135 type
readers C/N/F/L/D), plus the export side: write_dbf mirrors
Dbf.exportRecords (/root/reference/src/shapefile/dbf-writer.js:29-100 —
type discovery N/C/L/D, 254-byte string cap, 10-char unique field names)
and write_shp mirrors the shp export record layout.

Driver-side by design (SURVEY §2.1: "not needed at scale; small-fixture
loader in driver-side Python, then spark.createDataFrame") — production
scans are parquet/Iceberg; shapefile is the interchange boundary.
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
    pdf = pd.DataFrame(rows)
    # polyline/polygon files carry no point coords: an all-None object
    # column breaks Spark's type inference — pin x/y to float64 (None->NaN)
    # and restore SQL nulls after conversion
    pdf["x"] = pd.to_numeric(pdf["x"])
    pdf["y"] = pd.to_numeric(pdf["y"])
    from pyspark.sql import functions as F
    df = spark.createDataFrame(pdf)
    for c in ("x", "y"):
        df = df.withColumn(c, F.when(F.isnan(F.col(c)), None)
                           .otherwise(F.col(c)))
    return df


# ---------------------------------------------------------------------------
# writers (dbf-writer.js / shp export)
# ---------------------------------------------------------------------------

MAX_STRING_LEN = 254  # Dbf.MAX_STRING_LEN, dbf-writer.js:3


def _uniq_field_names(names, maxlen=10):
    """10-char dBase field names, uniquified like getUniqFieldNames."""
    out = []
    seen = set()
    for name in names:
        base = name[:maxlen]
        cand = base
        i = 1
        while cand.upper() in seen:
            suffix = str(i)
            cand = base[:maxlen - len(suffix)] + suffix
            i += 1
        seen.add(cand.upper())
        out.append(cand)
    return out


def _discover_field_type(records, name):
    """First non-null value decides (Dbf.discoverFieldType,
    dbf-writer.js:226-237)."""
    for rec in records:
        v = rec.get(name)
        if v is None:
            continue
        if isinstance(v, bool):
            return "L"
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return "D"
        if isinstance(v, (int, float)):
            return "N"
        return "C"
    return "C"


def write_dbf(records, encoding: str = "latin-1", field_order=None) -> bytes:
    """records (list of dicts) -> .dbf bytes (Dbf.exportRecords,
    dbf-writer.js:29-100). Fields are typed by first non-null value; numeric
    fields are right-justified fixed-point; strings padded/truncated to the
    longest encoded value (capped at 254)."""
    if field_order is None:
        field_order = []
        seen = set()
        for rec in records:
            for k in rec:
                if k not in seen:
                    seen.add(k)
                    field_order.append(k)
    if not field_order:
        field_order = ["FID"]
        records = [{"FID": i} for i in range(len(records))]
    names = _uniq_field_names(field_order)

    field_specs = []  # (uniq_name, type, size, decimals, formatter)
    for orig, name in zip(field_order, names):
        ftype = _discover_field_type(records, orig)
        if ftype == "N":
            decimals = 0
            for rec in records:
                v = rec.get(orig)
                if isinstance(v, float) and not float(v).is_integer():
                    s = repr(v)
                    if "." in s and "e" not in s and "E" not in s:
                        decimals = max(decimals, min(len(s.split(".")[1]), 15))
                    else:
                        decimals = max(decimals, 15)
            size = 1
            for rec in records:
                v = rec.get(orig)
                if v is None:
                    continue
                size = max(size, len(_fmt_num(v, decimals)))
            size = min(size, 18 if decimals == 0 else 20)
            field_specs.append((name, orig, "N", size, decimals))
        elif ftype == "L":
            field_specs.append((name, orig, "L", 1, 0))
        elif ftype == "D":
            field_specs.append((name, orig, "D", 8, 0))
        else:
            size = 1
            for rec in records:
                v = rec.get(orig)
                if v is None:
                    continue
                size = max(size, min(len(str(v).encode(encoding, "replace")),
                                     MAX_STRING_LEN))
            field_specs.append((name, orig, "C", size, 0))

    n_fields = len(field_specs)
    header_size = 32 + 32 * n_fields + 1
    record_size = 1 + sum(s[3] for s in field_specs)
    n_records = len(records)
    out = bytearray(header_size + n_records * record_size + 1)
    # header: version 3, update date, counts
    today = datetime.date(1995, 7, 26)  # fixed date -> byte-deterministic
    struct.pack_into("<BBBBihh", out, 0, 3, today.year - 1900, today.month,
                     today.day, n_records, header_size, record_size)
    pos = 32
    for name, _orig, ftype, size, decimals in field_specs:
        nb = name.encode(encoding, "replace")[:11]
        out[pos:pos + len(nb)] = nb
        out[pos + 11] = ord(ftype)
        out[pos + 16] = size
        out[pos + 17] = decimals
        pos += 32
    out[pos] = 0x0D
    pos = header_size
    for rec in records:
        out[pos] = 0x20  # not deleted
        off = pos + 1
        for name, orig, ftype, size, decimals in field_specs:
            v = rec.get(orig)
            if ftype == "N":
                s = "" if v is None else _fmt_num(v, decimals)
                b = s.encode("ascii")[:size].rjust(size, b" ")
            elif ftype == "L":
                b = b"T" if v is True else (b"F" if v is False else b"?")
            elif ftype == "D":
                b = (v.strftime("%Y%m%d").encode("ascii") if v is not None
                     else b" " * 8)
            else:
                b = b"" if v is None else str(v).encode(encoding, "replace")
                b = b[:size].ljust(size, b" ")
            out[off:off + size] = b
            off += size
        pos += record_size
    out[pos] = 0x1A  # EOF marker
    return bytes(out)


def _fmt_num(v, decimals):
    if decimals == 0:
        return str(int(round(float(v))))
    return f"{float(v):.{decimals}f}"


def write_shp(geoms) -> tuple[bytes, bytes]:
    """Geometry dicts (the read_shp output format) -> (.shp bytes,
    .shx bytes). All features must share one shp type (shapefile spec)."""
    types = {g["type"] for g in geoms if g["type"] != SHP_NULL}
    if len(types) > 1:
        raise ValueError(f"mixed shp types {types}")
    shp_type = types.pop() if types else SHP_NULL

    def all_points(g):
        if "points" in g and g["points"]:
            return g["points"]
        return [p for part in g.get("parts", []) for p in part]

    pts = [p for g in geoms for p in all_points(g)]
    if pts:
        xmin = min(p[0] for p in pts); ymin = min(p[1] for p in pts)
        xmax = max(p[0] for p in pts); ymax = max(p[1] for p in pts)
    else:
        xmin = ymin = xmax = ymax = 0.0

    recs = []
    for g in geoms:
        if g["type"] == SHP_NULL or not all_points(g):
            recs.append(struct.pack("<i", SHP_NULL))
        elif g["type"] == SHP_POINT:
            x, y = g["points"][0]
            recs.append(struct.pack("<idd", SHP_POINT, x, y))
        elif g["type"] == SHP_MULTIPOINT:
            ps = g["points"]
            bx = [p[0] for p in ps]; by = [p[1] for p in ps]
            body = struct.pack("<i4di", SHP_MULTIPOINT, min(bx), min(by),
                              max(bx), max(by), len(ps))
            body += b"".join(struct.pack("<dd", x, y) for x, y in ps)
            recs.append(body)
        else:
            parts = g["parts"]
            ps = [p for part in parts for p in part]
            bx = [p[0] for p in ps]; by = [p[1] for p in ps]
            offsets = []
            acc = 0
            for part in parts:
                offsets.append(acc)
                acc += len(part)
            body = struct.pack("<i4dii", g["type"], min(bx), min(by),
                              max(bx), max(by), len(parts), len(ps))
            body += struct.pack(f"<{len(parts)}i", *offsets)
            body += b"".join(struct.pack("<dd", x, y) for x, y in ps)
            recs.append(body)

    content = b""
    shx_recs = b""
    offset_words = 50  # header = 100 bytes
    for i, body in enumerate(recs):
        content_words = len(body) // 2
        content += struct.pack(">ii", i + 1, content_words) + body
        shx_recs += struct.pack(">ii", offset_words, content_words)
        offset_words += 4 + content_words

    def header(total_bytes):
        h = bytearray(100)
        struct.pack_into(">i", h, 0, 9994)
        struct.pack_into(">i", h, 24, total_bytes // 2)
        struct.pack_into("<ii", h, 28, 1000, shp_type)
        struct.pack_into("<4d", h, 36, xmin, ymin, xmax, ymax)
        return bytes(h)

    shp = header(100 + len(content)) + content
    shx = header(100 + len(shx_recs)) + shx_recs
    return shp, shx


def export_shapefile(df, geometry: str = "auto"):
    """Features DataFrame (rings_x/rings_y or x/y + attribute columns) ->
    (.shp, .shx, .dbf) bytes. Fixture-scale sink: collects to the driver
    (like the GeoJSON/TopoJSON sinks — a shapefile is one file)."""
    rows = [r.asDict() for r in df.collect()]
    geom_cols = {"rings_x", "rings_y", "x", "y", "shp_type", "bbox"}
    geoms = []
    records = []
    for r in rows:
        if geometry == "point" or (geometry == "auto" and
                                   r.get("x") is not None and
                                   not r.get("rings_x")):
            geoms.append({"type": SHP_POINT, "points": [(r["x"], r["y"])]})
        else:
            parts = [list(zip(rx, ry))
                     for rx, ry in zip(r.get("rings_x") or [],
                                       r.get("rings_y") or [])]
            geoms.append({"type": int(r.get("shp_type") or SHP_POLYGON),
                          "parts": parts})
        records.append({k: v for k, v in r.items() if k not in geom_cols})
    shp, shx = write_shp(geoms)
    dbf = write_dbf(records)
    return shp, shx, dbf
