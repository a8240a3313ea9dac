"""Shapefile .prj (ESRI WKT) -> '+proj=' definition strings.

The reference delegates WKT parsing to mproj's wkt module
(/root/reference/src/shapefile/shp-export.js:21-28 export side;
mapshaper-projections.js parse side). This is a from-scratch minimal WKT1
reader covering the projection families geom/projections.py implements:
a recursive bracket parser, the ESRI PROJECTION name index, and the
PARAMETER -> proj-param mapping. Anything unrecognized raises ValueError
so callers can fall back to treating the layer as unprojected.
"""

from __future__ import annotations


def _tokenize(s: str):
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in '[],()':
            # some WKT dialects use () instead of []
            yield {'[': '[', ']': ']', '(': '[', ')': ']', ',': ','}[c]
            i += 1
        elif c == '"':
            j = s.index('"', i + 1)
            yield ('str', s[i + 1:j])
            i = j + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and s[j] not in '[](),"' and not s[j].isspace():
                j += 1
            tok = s[i:j]
            try:
                yield ('num', float(tok))
            except ValueError:
                yield ('word', tok)
            i = j


def parse_wkt(s: str):
    """WKT text -> nested (name, [items]) tuples; leaves are strings or
    floats."""
    toks = list(_tokenize(s))
    pos = 0

    def node():
        nonlocal pos
        kind, val = toks[pos]
        pos += 1
        if kind == 'word' and pos < len(toks) and toks[pos] == '[':
            pos += 1  # consume '['
            items = []
            while toks[pos] != ']':
                if toks[pos] == ',':
                    pos += 1
                    continue
                items.append(node())
            pos += 1  # consume ']'
            return (val, items)
        return val

    return node()


# ESRI PROJECTION["..."] names -> +proj= (families implemented in
# geom/projections.py)
_PROJECTION_NAMES = {
    "mercator": "merc",
    "mercator_auxiliary_sphere": "merc",
    "lambert_conformal_conic": "lcc",
    "lambert_conformal_conic_2sp": "lcc",
    "albers": "aea",
    "albers_conic_equal_area": "aea",
    "transverse_mercator": "tmerc",
    "gauss_kruger": "tmerc",
    "sinusoidal": "sinu",
    "mollweide": "moll",
    "azimuthal_equidistant": "aeqd",
    "orthographic": "ortho",
    "gnomonic": "gnom",
    "stereographic": "stere",
    "polar_stereographic": "stere",
    "stereographic_north_pole": "stere",
    "stereographic_south_pole": "stere",
    "lambert_azimuthal_equal_area": "laea",
    "cylindrical_equal_area": "cea",
    "miller_cylindrical": "mill",
    "equidistant_conic": "eqdc",
    "equidistant_cylindrical": "eqc",
    "plate_carree": "eqc",
    "equirectangular": "eqc",
    "robinson": "robin",
    "van_der_grinten_i": "vandg",
    "vandergrinten": "vandg",
    "winkel_tripel": "wintri",
    "eckert_iv": "eck4",
    "gall_stereographic": "gall",
    "cassini": "cass",
    "natural_earth": "natearth",
    "equal_earth": "eqearth",
    "hammer_aitoff": "hammer",
    # national grids added round 4
    "bonne": "bonne",
    "polyconic": "poly",
    "aitoff": "aitoff",
    "eckert_i": "eck1",
    "eckert_ii": "eck2",
    "eckert_iii": "eck3",
    "eckert_v": "eck5",
    "eckert_vi": "eck6",
    "goode_homolosine": "goode",
    "krovak": "krovak",
    "hotine_oblique_mercator_azimuth_natural_origin": "omerc",
    "hotine_oblique_mercator_azimuth_center": "omerc",
    "rectified_skew_orthomorphic_natural_origin": "omerc",
    # Swiss CH1903 (ESRI spells it as a Hotine variant with azimuth 90 +
    # center lat; the swisstopo formulas are the somerc method)
    "hotine_oblique_mercator_two_point_center": "somerc",
    "swiss_oblique_cylindrical": "somerc",
    "double_stereographic": "sterea",
    "oblique_stereographic": "sterea",
}

_PARAM_NAMES = {
    "central_meridian": "lon_0",
    "longitude_of_center": "lon_0",
    "latitude_of_origin": "lat_0",
    "latitude_of_center": "lat_0",
    "standard_parallel_1": "lat_1",
    "standard_parallel_2": "lat_2",
    "false_easting": "x_0",
    "false_northing": "y_0",
    "scale_factor": "k_0",
    "azimuth": "alpha",
}


# canonical ESRI spelling per +proj= family (first hit wins for writing)
_PROJ_TO_ESRI = {}
for _wkt_name, _p in _PROJECTION_NAMES.items():
    _PROJ_TO_ESRI.setdefault(_p, _wkt_name.title())

_PARAM_TO_ESRI = {
    "lon_0": "Central_Meridian",
    "lat_0": "Latitude_Of_Origin",
    "lat_1": "Standard_Parallel_1",
    "lat_2": "Standard_Parallel_2",
    "x_0": "False_Easting",
    "y_0": "False_Northing",
    "k_0": "Scale_Factor",
    "k": "Scale_Factor",
    "alpha": "Azimuth",
    "lat_ts": "Standard_Parallel_1",
}

_WGS84_GEOGCS = ('GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
                 'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
                 'PRIMEM["Greenwich",0.0],'
                 'UNIT["Degree",0.0174532925199433]]')


def proj4_to_wkt(p4: str) -> str:
    """'+proj=...' -> minimal ESRI WKT for .prj export (the reference
    delegates to mproj's wkt_from_proj4, shp-export.js:21-28; this covers
    the families geom/projections.py implements). Raises ValueError for
    families with no ESRI spelling here."""
    if p4 == "albersusa":
        # the composite has no single CRS; the reference exports the
        # conus Albers component's WKT (shapefile-test.js 'Albers WKT is
        # exported if data is reprojected to "albersusa"')
        return ('PROJCS["USA_Contiguous_Albers_Equal_Area_Conic",'
                + _WGS84_GEOGCS +
                ',PROJECTION["Albers"],'
                'PARAMETER["Central_Meridian",-96.0],'
                'PARAMETER["Latitude_Of_Origin",23.0],'
                'PARAMETER["Standard_Parallel_1",29.5],'
                'PARAMETER["Standard_Parallel_2",45.5],'
                'PARAMETER["False_Easting",0.0],'
                'PARAMETER["False_Northing",0.0],'
                'UNIT["Meter",1.0]]')
    if not p4.startswith("+") and p4 not in ("wgs84",):
        # alias spellings ('webmercator', 'robinson', ...) resolve to their
        # proj4 definition first (proj-test.js '-proj <alias>' cases)
        from mapshaper_spark.geom.projections import ALIASES
        p4 = ALIASES.get(p4, p4)
    params = {}
    for tok in p4.split():
        if tok.startswith("+"):
            k, _, v = tok[1:].partition("=")
            params[k] = v
    name = params.get("proj", "")
    if name in ("longlat", "latlong", "lonlat") or p4 in ("wgs84",):
        return _WGS84_GEOGCS
    esri = _PROJ_TO_ESRI.get(name)
    if esri is None:
        raise ValueError(f"no WKT spelling for +proj={name}")
    if name == "merc" and params.get("a") == params.get("b") and \
            "a" in params:
        # spherical web mercator gets its ESRI spelling (shapefile-test.js
        # greps /Pseudo-Mercator/ for '-proj webmercator')
        return ('PROJCS["WGS_84_Pseudo-Mercator",' + _WGS84_GEOGCS +
                ',PROJECTION["Mercator_Auxiliary_Sphere"],'
                'PARAMETER["Central_Meridian",0.0],'
                'PARAMETER["Standard_Parallel_1",0.0],'
                'PARAMETER["Auxiliary_Sphere_Type",0.0],'
                'PARAMETER["False_Easting",0.0],'
                'PARAMETER["False_Northing",0.0],'
                'UNIT["Meter",1.0]]')
    if "a" in params:
        a = float(params["a"])
        rf = float(params["rf"]) if "rf" in params else (
            0.0 if params.get("b") == params.get("a") else 298.257223563)
        geogcs = ('GEOGCS["GCS_Custom",DATUM["D_Custom",'
                  f'SPHEROID["Custom",{a},{rf}]],'
                  'PRIMEM["Greenwich",0.0],'
                  'UNIT["Degree",0.0174532925199433]]')
    else:
        geogcs = _WGS84_GEOGCS
    parts = [f'PROJCS["{esri}",{geogcs},PROJECTION["{esri}"]']
    for k, v in params.items():
        if k in _PARAM_TO_ESRI:
            parts.append(f',PARAMETER["{_PARAM_TO_ESRI[k]}",{float(v)}]')
    parts.append(',UNIT["Meter",1.0]]')
    return "".join(parts)


def _find(items, name):
    for it in items:
        if isinstance(it, tuple) and it[0].upper() == name:
            return it
    return None


def _spheroid_params(geogcs) -> str:
    datum = _find(geogcs[1], "DATUM")
    sph = _find(datum[1], "SPHEROID") if datum else None
    if sph is None:
        return "+datum=WGS84"
    a = float(sph[1][1])
    rf = float(sph[1][2])
    if rf == 0:
        return f"+a={a} +b={a}"
    return f"+a={a} +rf={rf}"


def wkt_to_proj4(wkt: str) -> str:
    """ESRI WKT (.prj content) -> '+proj=...' string usable by
    geom.projections.get_projection. GEOGCS-only -> +proj=longlat."""
    root = parse_wkt(wkt)
    if not isinstance(root, tuple):
        raise ValueError("not WKT")
    kind, items = root[0].upper(), root[1]
    if kind == "GEOGCS":
        return "+proj=longlat +datum=WGS84"
    if kind != "PROJCS":
        raise ValueError(f"unsupported WKT root {kind}")
    projection = _find(items, "PROJECTION")
    if projection is None:
        raise ValueError("PROJCS without PROJECTION")
    pname = str(projection[1][0]).lower()
    proj = _PROJECTION_NAMES.get(pname)
    if proj is None:
        raise ValueError(f"unsupported PROJECTION '{projection[1][0]}'")
    geogcs = _find(items, "GEOGCS")
    parts = [f"+proj={proj}"]
    if geogcs is not None:
        parts.append(_spheroid_params(geogcs))
    for it in items:
        if isinstance(it, tuple) and it[0].upper() == "PARAMETER":
            key = str(it[1][0]).lower()
            if proj in ("merc", "eqc", "cea") and key == "standard_parallel_1":
                # cylindricals spell the standard parallel as lat_ts
                parts.append(f"+lat_ts={float(it[1][1])}")
            elif key in _PARAM_NAMES:
                parts.append(f"+{_PARAM_NAMES[key]}={float(it[1][1])}")
    return " ".join(parts)
